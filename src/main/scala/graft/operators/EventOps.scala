package graft.operators

import graft.{QueryDef, Tables}
import graft.functions.Exact
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/** Event-log operators (§2.D, event-time family): JSON extraction,
  * sessionization, as-of join, range join, and the batch-equivalent of the
  * streaming window aggregation (the streaming implementation itself lives
  * in [[graft.streaming.EventStreams]]).
  *
  * All event-time arithmetic is on epoch-nanos bigints (see
  * [[Tables.events]]) — exact and identical across engines.
  */
object EventOps {

  private val NsPerMinute = 60L * 1000 * 1000 * 1000
  private val UsPerMinute = 60L * 1000 * 1000
  private val SessionGapUs = 30L * UsPerMinute
  private val HourNs = 60L * NsPerMinute

  /** JSON field extraction from the `props` payload column — the
    * reference parses nested JSON metadata per row (api.py paper_info).
    */
  def eventsJsonExtract(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(
        col("event_id"),
        col("user_id"),
        get_json_object(col("props"), "$.k").cast("bigint").as("k"))

  val eventsJsonExtractOracle: String = """
    SELECT event_id, user_id,
      CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT) AS k
    FROM events"""

  /** Gap-based sessionization: a new session starts after a >30 min gap.
    * lag + running sum over a per-user window — one shuffle on user_id.
    * The streaming twin uses mapGroupsWithState (see EventStreams).
    *
    * Gap arithmetic and ordering run on µs-truncated event time (ts div
    * 1000): the parquet timestamps carry sub-µs ns components that DuckDB
    * drops at read, so comparing raw ns against the oracle's µs values
    * flips gap comparisons near the 30-min boundary and tie ordering.
    */
  /** Events with their session assignment — the ONE place the gap rule
    * lives: µs-truncated time, (t, event_id) tie order, 30-min gap, lag +
    * running sum. Both sessionize and sessionStats derive from this
    * frame (columns: events ∪ {t_us, session_id}).
    */
  private[graft] def sessionAssigned(spark: SparkSession, dir: String): DataFrame = {
    val order = Window.partitionBy(col("user_id"))
      .orderBy(col("t_us").asc, col("event_id").asc)
    Tables.events(spark, dir)
      .withColumn("t_us", expr("ts div 1000"))
      .withColumn("prev_t", lag(col("t_us"), 1).over(order))
      .withColumn("new_session",
        when(col("prev_t").isNull
          || col("t_us") - col("prev_t") > SessionGapUs, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("new_session")).over(
        order.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** SQL twin of [[sessionAssigned]] (relation:
    * s(user_id, event_id, value, t, session_id)).
    */
  private[operators] val sqlSessionAssigned: String = s"""
      SELECT user_id, event_id, event_type, value, t,
        CAST(SUM(new_session) OVER (PARTITION BY user_id
          ORDER BY t ASC, event_id ASC ROWS UNBOUNDED PRECEDING) AS BIGINT)
          AS session_id
      FROM (
        SELECT user_id, event_id, event_type, value, t,
          CASE WHEN prev_t IS NULL OR t - prev_t > ${SessionGapUs}
            THEN 1 ELSE 0 END AS new_session
        FROM (
          SELECT user_id, event_id, event_type, value, EPOCH_US(ts) AS t,
            LAG(EPOCH_US(ts)) OVER (PARTITION BY user_id
              ORDER BY EPOCH_US(ts) ASC, event_id ASC) AS prev_t
          FROM events))"""

  def sessionize(spark: SparkSession, dir: String): DataFrame =
    sessionAssigned(spark, dir)
      .select(col("event_id"), col("user_id"), col("session_id"))

  val sessionizeOracle: String = s"""
    SELECT event_id, user_id, session_id
    FROM ($sqlSessionAssigned)"""

  /** As-of join: each event picks the most recent order (same user ≘
    * custkey) with order time ≤ event time; ties broken by max orderkey.
    *
    * Implemented the scale-safe way: tag + union both inputs, ONE shuffle
    * on the user key, then `last(..., ignoreNulls)` over an ordered
    * running window — no per-row range probe, no join blowup. This is the
    * classic sort-merge as-of pattern; DuckDB's native ASOF JOIN is the
    * same algorithm. The oracle mirrors it in portable window SQL so tie
    * semantics are pinned down exactly.
    */
  def asofJoin(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir).select(
      col("user_id").as("u"),
      col("ts").as("t"),
      lit(0).as("is_order"),
      col("event_id"),
      lit(null).cast("bigint").as("okey"),
      lit(null).cast("bigint").as("odate_ns"))
    val o = Tables.orders(spark, dir).select(
      col("o_custkey").as("u"),
      (unix_micros(col("o_orderdate").cast(TimestampType)) * 1000L).as("t"),
      lit(1).as("is_order"),
      lit(null).cast("bigint").as("event_id"),
      col("o_orderkey").as("okey"),
      (unix_micros(col("o_orderdate").cast(TimestampType)) * 1000L).as("odate_ns"))
    val w = Window.partitionBy(col("u"))
      .orderBy(col("t").asc, col("is_order").desc,
        col("okey").asc_nulls_last, col("event_id").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    e.unionByName(o)
      .withColumn("last_order_key", last(col("okey"), ignoreNulls = true).over(w))
      .withColumn("last_order_date_ns", last(col("odate_ns"), ignoreNulls = true).over(w))
      .filter(col("is_order") === 0)
      .select(
        col("event_id"),
        col("u").as("user_id"),
        col("last_order_key"),
        col("last_order_date_ns"))
  }

  val asofJoinOracle: String = """
    WITH u AS (
      SELECT user_id AS u, EPOCH_NS(ts) AS t, 0 AS is_order, event_id,
        CAST(NULL AS BIGINT) AS okey, CAST(NULL AS BIGINT) AS odate_ns
      FROM events
      UNION ALL
      SELECT o_custkey, EPOCH_NS(o_orderdate), 1, CAST(NULL AS BIGINT),
        o_orderkey, EPOCH_NS(o_orderdate)
      FROM orders)
    SELECT event_id, u AS user_id,
      LAST_VALUE(okey IGNORE NULLS) OVER w AS last_order_key,
      LAST_VALUE(odate_ns IGNORE NULLS) OVER w AS last_order_date_ns
    FROM u
    WINDOW w AS (PARTITION BY u
      ORDER BY t ASC, is_order DESC, okey ASC NULLS LAST, event_id ASC NULLS LAST
      ROWS UNBOUNDED PRECEDING)
    QUALIFY is_order = 0"""

  /** Range join: bucket each event's value into static tiers via a
    * broadcast non-equi join ([lo, hi) semantics). With a tiny tier table
    * this plans as a broadcast nested-loop join — no shuffle.
    */
  private val tiers = Seq((0.0, 50.0, "micro"), (50.0, 150.0, "small"),
    (150.0, 300.0, "medium"), (300.0, 1000.0, "large"))

  def rangeJoin(spark: SparkSession, dir: String): DataFrame = {
    val t = spark.createDataFrame(tiers).toDF("lo", "hi", "tier")
    Tables.events(spark, dir)
      .join(broadcast(t), col("value") >= col("lo") && col("value") < col("hi"))
      .select(col("event_id"), col("value"), col("tier"))
  }

  val rangeJoinOracle: String = {
    val values = tiers.map { case (lo, hi, n) => s"($lo, $hi, '$n')" }.mkString(", ")
    s"""
    SELECT event_id, value, tier
    FROM events
    JOIN (VALUES $values) AS t(lo, hi, tier)
      ON value >= lo AND value < hi"""
  }

  /** Batch equivalent of the streaming tumbling-window aggregation:
    * 1-hour windows × event_type, count + exact value sum. The streaming
    * implementation (readStream + watermark + window) is in
    * [[graft.streaming.EventStreams]]; this is the verifiable batch twin.
    */
  def streamWindowAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(
        (col("ts") - pmod(col("ts"), lit(HourNs))).as("window_start_ns"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        Exact.dsum(col("value")).as("total_value"))

  val streamWindowAggOracle: String = s"""
    SELECT EPOCH_NS(ts) - EPOCH_NS(ts) % ${HourNs} AS window_start_ns,
      event_type,
      COUNT(*) AS n_events,
      ${Exact.sqlDsum("value")} AS total_value
    FROM events
    GROUP BY 1, 2"""

  /** Exact distinct-user counts per event type (shuffle-heavy twin of
    * [[approxDistinct]] — at 100 TB you run the approx variant first and
    * the exact one only where it matters).
    */
  def distinctUsers(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(
        countDistinct(col("user_id")).as("n_users"),
        count(lit(1)).as("n_events"))

  val distinctUsersOracle: String = """
    SELECT event_type, COUNT(DISTINCT user_id) AS n_users, COUNT(*) AS n_events
    FROM events GROUP BY 1"""

  /** HyperLogLog++ approximate distinct counts. The scale path for
    * cardinality: mergeable sketches, no distinct shuffle. The sketch
    * value itself is engine-specific, so it can't be hash-compared;
    * instead the output carries the exact count plus `within_bounds` —
    * the sketch's relative error checked against 5× its configured rsd
    * (0.01) — and the oracle recomputes the exact columns expecting
    * `within_bounds = true`. The exact twin exists only for this gate;
    * the production path at corpus scale is the sketch alone.
    */
  def approxDistinct(spark: SparkSession, dir: String): DataFrame =
    // Two-stage shape, NOT one mixed agg: `approx_count_distinct(0.01)
    // + countDistinct` in a single aggregate makes Spark's
    // one-distinct plan evaluate the HLL partially per
    // (event_type, user_id) group — |users| 12 KB HLL++ buffers
    // (p=14 at rsd 0.01), gigabytes of aggregation state at sf10 where
    // the answer needs five. Found by the r16 decade sweep: 10 MINUTES
    // at sf10 vs seconds for this form. Stage 1 collapses to distinct
    // (type, user) pairs with plain long counters (map-side
    // combinable); stage 2 runs the HLL over the pre-distinct users —
    // identical sketch, since HLL is duplicate-insensitive — with one
    // buffer per event type.
    Tables.events(spark, dir)
      .groupBy(col("event_type"), col("user_id"))
      .agg(count(lit(1)).as("__n"))
      .groupBy(col("event_type"))
      .agg(
        approx_count_distinct(col("user_id"), 0.01).as("approx"),
        // count(col), not count(*): a NULL user_id forms its own stage-1
        // group, which COUNT(DISTINCT user_id) — the old form and the
        // oracle — would exclude; n_events still counts its rows
        count(col("user_id")).as("n_users"),
        sum(col("__n")).as("n_events"))
      .select(col("event_type"), col("n_users"), col("n_events"),
        (abs(col("approx") - col("n_users")).cast("double")
          <= col("n_users").cast("double") * lit(0.05)).as("within_bounds"))

  val approxDistinctOracle: String = """
    SELECT event_type, COUNT(DISTINCT user_id) AS n_users,
      COUNT(*) AS n_events, TRUE AS within_bounds
    FROM events GROUP BY 1"""

  /** Purchase attribution: for each purchase, the clicks by the same
    * user in the preceding 30 minutes (interval join). Batch twin of the
    * stream-stream join in EventStreams.attribution — same predicate, an
    * unbounded source just adds watermarks to bound the join state.
    *
    * ALL event-time comparisons run on µs-truncated values (ts div 1000)
    * — not just the outputs: DuckDB reads the ns parquet timestamps
    * µs-truncated, so a raw-ns boundary comparison (click in the same
    * microsecond as the purchase, or exactly at the 30-minute edge)
    * would flip between engines. Same rule that fixed sessionize.
    */
  def purchaseAttribution(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        expr("ts div 1000").as("purchase_ts_us"), col("value"))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), expr("ts div 1000").as("click_ts_us"))
    purchases
      .join(clicks,
        col("user_id") === col("c_user")
          && col("click_ts_us") <= col("purchase_ts_us")
          && col("click_ts_us") > col("purchase_ts_us") - lit(30L * UsPerMinute),
        "left")
      .groupBy(col("purchase_id"), col("user_id"), col("purchase_ts_us"), col("value"))
      .agg(
        count(col("click_ts_us")).as("n_clicks_30m"),
        max(col("click_ts_us")).as("last_click_ts_us"))
      .select(col("purchase_id"), col("user_id"),
        col("purchase_ts_us"), col("value"),
        col("n_clicks_30m"), col("last_click_ts_us"))
  }

  val purchaseAttributionOracle: String = s"""
    SELECT p.event_id AS purchase_id, p.user_id,
      EPOCH_US(p.ts) AS purchase_ts_us, p.value,
      COUNT(EPOCH_US(c.ts)) AS n_clicks_30m,
      MAX(EPOCH_US(c.ts)) AS last_click_ts_us
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id
      AND EPOCH_US(c.ts) <= EPOCH_US(p.ts)
      AND EPOCH_US(c.ts) > EPOCH_US(p.ts) - ${30L * UsPerMinute}
    GROUP BY 1, 2, 3, 4"""

  /** Per-group z-score standardization (feature engineering): each
    * event's value standardized against its event_type's mean/std,
    * derived from exact integer-scaled moment sums (the same portability
    * construction as stats_agg — built-in stddev accumulation differs
    * across engines).
    */
  def zscoreNormalize(spark: SparkSession, dir: String): DataFrame = {
    val cents = floor(col("value") * 100.0 + 0.5)
    val stats = Tables.events(spark, dir)
      .select(col("event_type"), cents.as("vc"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).cast("double").as("n"),
        sum(col("vc")).cast("double").as("s"),
        sum((col("vc") * col("vc")).cast(org.apache.spark.sql.types.DecimalType(38, 0)))
          .cast("double").as("ss"))
      .select(col("event_type"),
        (col("s") / col("n") / 100.0).as("mean"),
        (sqrt((col("ss") - col("s") * col("s") / col("n")) / (col("n") - 1.0)) / 100.0)
          .as("std"))
    Tables.events(spark, dir)
      .join(broadcast(stats), Seq("event_type"))
      .select(
        col("event_id"), col("event_type"), col("value"),
        ((col("value") - col("mean")) / col("std")).as("zscore"))
  }

  val zscoreNormalizeOracle: String = """
    WITH stats AS (
      SELECT event_type,
        s / n / 100.0 AS mean,
        SQRT((ss - s * s / n) / (n - 1.0)) / 100.0 AS std
      FROM (
        SELECT event_type, CAST(COUNT(*) AS DOUBLE) AS n,
          CAST(SUM(vc) AS DOUBLE) AS s,
          CAST(SUM(CAST(vc * vc AS DECIMAL(38,0))) AS DOUBLE) AS ss
        FROM (SELECT event_type,
                CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT) AS vc FROM events)
        GROUP BY 1))
    SELECT event_id, e.event_type, value,
      (value - mean) / std AS zscore
    FROM events e JOIN stats ON e.event_type = stats.event_type"""

  /** Cohort retention: users grouped by first-activity day (their
    * cohort), counted per activity day — the classic retention matrix,
    * at daily grain (the events table spans ~30 days). Days are
    * formatted strings (UTC session ≡ DuckDB naive timestamps), so MIN
    * and grouping are engine-portable; the grain comes from the
    * µs-truncated event time like all event-time logic here.
    *
    * Scale: one user-keyed shuffle builds (user, day) distinct + the
    * per-user MIN; the final matrix is |cohorts|×|days| — tiny. The
    * cohort join is user-keyed, co-partitioned with the distinct.
    */
  def retentionCohorts(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .select(col("user_id"),
        date_format(timestamp_micros(expr("ts div 1000")), "yyyy-MM-dd").as("day"))
      .distinct()
    val cohort = daily.groupBy(col("user_id"))
      .agg(min(col("day")).as("cohort_day"))
    daily.join(cohort, Seq("user_id"))
      .groupBy(col("cohort_day"), col("day").as("activity_day"))
      .agg(count(lit(1)).as("users"))
  }

  val retentionCohortsOracle: String = """
    WITH m AS (
      SELECT DISTINCT user_id, STRFTIME(ts, '%Y-%m-%d') AS day FROM events),
    c AS (SELECT user_id, MIN(day) AS cohort_day FROM m GROUP BY 1)
    SELECT c.cohort_day, m.day AS activity_day, COUNT(*) AS users
    FROM m JOIN c USING (user_id)
    GROUP BY 1, 2"""

  /** Per-session summary built ON TOP of [[sessionize]] (operator
    * composition: the session assignment and its consumer share one
    * user-keyed shuffle): events per session, span in µs, and the
    * session's event-value total (exact decimal sum).
    */
  def sessionStats(spark: SparkSession, dir: String): DataFrame =
    sessionAssigned(spark, dir)
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        (max(col("t_us")) - min(col("t_us"))).as("span_us"),
        Exact.dsum(col("value")).as("total_value"))

  val sessionStatsOracle: String = s"""
    SELECT user_id, session_id,
      COUNT(*) AS n_events,
      MAX(t) - MIN(t) AS span_us,
      ${Exact.sqlDsum("value")} AS total_value
    FROM ($sqlSessionAssigned)
    GROUP BY 1, 2"""

  /** 7-day rolling distinct active users per day — the DAU/WAU-style
    * metric. Rolling DISTINCT doesn't decompose into a frame-sum, so
    * each (user, active-day) pair CONTRIBUTES itself to the 7 window
    * days it can appear in (a bounded explode), and the count is a
    * distinct aggregation per window day — the standard scale-out
    * formulation (state per (user, day), never a per-day rescan).
    */
  def rollingActives(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"),
        expr("(ts div 1000) div 86400000000").as("day"))
      .distinct()
    val contrib = ev.select(col("user_id"),
      explode(sequence(col("day"), col("day") + 6)).as("wday"))
    ev.select(col("day")).distinct()
      .join(contrib, col("day") === col("wday"))
      .groupBy(col("day"))
      .agg(countDistinct(col("user_id")).as("active_7d"))
  }

  val rollingActivesOracle: String = """
    WITH ev AS (
      SELECT DISTINCT user_id, EPOCH_US(ts) // 86400000000 AS day
      FROM events),
    contrib AS (
      SELECT user_id, UNNEST(RANGE(day, day + 7)) AS wday FROM ev)
    SELECT d.day, CAST(COUNT(DISTINCT c.user_id) AS BIGINT) AS active_7d
    FROM (SELECT DISTINCT day FROM ev) d
    JOIN contrib c ON c.wday = d.day
    GROUP BY 1"""

  /** 2× the exact median of an integer column per group, via the same
    * histogram formulation as Relational.percentiles: the doubled median
    * (lo + hi at the two straddling positions) stays an INTEGER, so
    * downstream threshold comparisons never touch floating point.
    */
  private def groupMedian2(df: DataFrame, key: String, x: String, out: String): DataFrame = {
    val byV = Window.partitionBy(col(key)).orderBy(col(x))
    val byK = Window.partitionBy(col(key))
    val hist = df.groupBy(col(key), col(x)).agg(count(lit(1)).as("cnt"))
      .withColumn("cum", sum(col("cnt")).over(byV))
      .withColumn("start", col("cum") - col("cnt"))
      .withColumn("n", sum(col("cnt")).over(byK))
    val p = lit(0.5) * (col("n") - 1).cast("double")
    def valAt(i: org.apache.spark.sql.Column) =
      max(when(col("start") <= i && i < col("cum"), col(x)))
    hist.groupBy(col(key))
      .agg((valAt(floor(p)) + valAt(ceil(p))).as(out))
  }

  /** Robust anomaly detection: events whose value deviates from their
    * type's median by more than 3× the median absolute deviation — the
    * outlier rule that survives skewed distributions where z-scores
    * don't. EXACT arithmetic throughout: values quantize to integer
    * cents, medians use the ×2 doubling trick (2·median of ints is an
    * int), MAD the ×4, and the 3×MAD cut compares integers
    * (2·dc2 > 3·mad4). FP appears only in the output projections.
    *
    * Scale: two histogram medians (shuffles carry (type, value, count)
    * histograms, not events) + two broadcast joins of per-type scalars.
    */
  def anomalyMad(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), col("event_type"), col("value"),
        floor(col("value") * 100.0 + 0.5).cast("long").as("vc"))
    val med = groupMedian2(ev.select(col("event_type"), col("vc")),
      "event_type", "vc", "medc2")
    val d = ev.join(broadcast(med), Seq("event_type"))
      .withColumn("dc2", abs(lit(2) * col("vc") - col("medc2")))
      .transform(graft.functions.PlanGuard.persist(_))
    val mad = groupMedian2(d.select(col("event_type"), col("dc2")),
      "event_type", "dc2", "mad4")
    d.join(broadcast(mad), Seq("event_type"))
      .filter(lit(2) * col("dc2") > lit(3) * col("mad4"))
      .select(col("event_id"), col("event_type"), col("value"),
        (col("dc2").cast("double") / lit(200.0)).as("deviation"),
        (col("mad4").cast("double") / lit(400.0)).as("mad"))
  }

  val anomalyMadOracle: String = """
    WITH h AS (
      SELECT event_id, event_type, value,
        CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT) AS vc
      FROM events),
    med AS (
      SELECT event_type, CAST(QUANTILE_CONT(vc, 0.5) * 2 AS BIGINT) AS medc2
      FROM h GROUP BY 1),
    d AS (
      SELECT h.*, ABS(2 * vc - medc2) AS dc2
      FROM h JOIN med USING (event_type)),
    mad AS (
      SELECT event_type, CAST(QUANTILE_CONT(dc2, 0.5) * 2 AS BIGINT) AS mad4
      FROM d GROUP BY 1)
    SELECT event_id, d.event_type, value,
      CAST(dc2 AS DOUBLE) / 200.0 AS deviation,
      CAST(mad4 AS DOUBLE) / 400.0 AS mad
    FROM d JOIN mad USING (event_type)
    WHERE 2 * dc2 > 3 * mad4"""

  /** Funnel completion window (view → purchase), µs. Shared with the
    * streaming twin ([[graft.streaming.EventStreams.funnelStream]]) —
    * the proven batch/stream equivalence requires one constant.
    */
  private[graft] val FunnelWindowUs = 7L * 24 * 3600 * 1000 * 1000

  /** Conversion funnel: earliest view → first click after it → first
    * purchase after that, within 7 days of the view. The correlated
    * "first step-k event after step-k−1" is decorrelated into three
    * user-keyed conditional MIN aggregations — each step is one shuffle
    * on user_id, all integer-µs arithmetic.
    */
  def windowFunnel(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), expr("ts div 1000").as("t"))
    val v = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("t")).as("t_view"))
    val c = ev.filter(col("event_type") === "click")
      .join(v, Seq("user_id"))
      .filter(col("t") > col("t_view"))
      .groupBy(col("user_id"), col("t_view"))
      .agg(min(col("t")).as("t_click"))
    val p = ev.filter(col("event_type") === "purchase")
      .join(c, Seq("user_id"))
      .filter(col("t") > col("t_click")
        && col("t") <= col("t_view") + lit(FunnelWindowUs))
      .groupBy(col("user_id"))
      .agg(min(col("t")).as("t_purchase"))
    ev.select(col("user_id")).distinct()
      .join(v, Seq("user_id"), "left")
      .join(c.select(col("user_id"), col("t_click")), Seq("user_id"), "left")
      .join(p, Seq("user_id"), "left")
      .select(col("user_id"), col("t_view"), col("t_click"), col("t_purchase"),
        when(col("t_purchase").isNotNull, 3)
          .when(col("t_click").isNotNull, 2)
          .when(col("t_view").isNotNull, 1)
          .otherwise(0).as("funnel_level"))
  }

  val windowFunnelOracle: String = s"""
    WITH ev AS (
      SELECT user_id, event_type, EPOCH_US(ts) AS t FROM events),
    v AS (
      SELECT user_id, MIN(t) AS t_view FROM ev
      WHERE event_type = 'view' GROUP BY 1),
    c AS (
      SELECT ev.user_id, MIN(t) AS t_click
      FROM ev JOIN v USING (user_id)
      WHERE event_type = 'click' AND t > t_view
      GROUP BY 1),
    p AS (
      SELECT ev.user_id, MIN(t) AS t_purchase
      FROM ev JOIN c USING (user_id) JOIN v USING (user_id)
      WHERE event_type = 'purchase' AND t > t_click
        AND t <= t_view + ${FunnelWindowUs}
      GROUP BY 1)
    SELECT u.user_id, v.t_view, c.t_click, p.t_purchase,
      CAST(CASE WHEN p.t_purchase IS NOT NULL THEN 3
           WHEN c.t_click IS NOT NULL THEN 2
           WHEN v.t_view IS NOT NULL THEN 1
           ELSE 0 END AS INT) AS funnel_level
    FROM (SELECT DISTINCT user_id FROM ev) u
    LEFT JOIN v USING (user_id)
    LEFT JOIN c USING (user_id)
    LEFT JOIN p USING (user_id)"""

  /** Heavy hitters via count-min sketch + exact recheck — the frequency
    * sketch's canonical job (finding the hot keys BEFORE deciding how to
    * handle them: skew salting, cache admission, abuse cutoffs). Two
    * stages, same discipline as the bloom decontamination path:
    *
    *  1. SKETCH (one corpus pass, no per-key state): a CMS of the
    *    user_id stream collapses to a few hundred KB of counters merged
    *    driver-side; each DISTINCT key then probes it locally via the
    *    codegen [[org.apache.spark.sql.graft.CmsEstimate]] expression.
    *    CMS errors are over-estimates only, so `estimate >= threshold`
    *    retains every true heavy hitter.
    *  2. RECHECK (candidate rows only): exact counts for the surviving
    *    keys via a broadcast semi join — output is deterministic and
    *    hash-checks against the plain GROUP BY oracle.
    *
    * Threshold is relative (1.1× the mean events-per-user) so the query
    * is SF-independent. At 100 TB the win is stage 2's shuffle shrinking
    * from all keys to candidates; with billions of cold keys that is the
    * difference between a full-corpus aggregation and a near-free one.
    */
  def heavyHitters(spark: SparkSession, dir: String): DataFrame =
    heavyHittersWithCms(spark, dir, eventUserCms(spark, dir))

  /** The user_id frequency sketch — built inline by [[heavyHitters]],
    * or ONCE by an index run and persisted through
    * [[graft.sources.SketchStore]] (the sketch-is-a-table production
    * shape; later probes read it from disk instead of re-scanning).
    * eps=1e-3 keeps the sketch ~50 KB on the task binary; a looser
    * sketch only admits more candidates for the recheck to trim —
    * correctness never depends on eps, only stage-2's input size does.
    */
  private[graft] def eventUserCms(spark: SparkSession, dir: String)
      : org.apache.spark.util.sketch.CountMinSketch =
    Tables.events(spark, dir).select(col("user_id"))
      .stat.countMinSketch("user_id", 0.001, 0.99, 42)

  /** [[heavyHitters]] against a PRE-BUILT sketch (possibly read from
    * disk) — the probe never depends on where the sketch came from.
    */
  private[graft] def heavyHittersWithCms(spark: SparkSession, dir: String,
      cms: org.apache.spark.util.sketch.CountMinSketch): DataFrame = {
    val events = Tables.events(spark, dir).select(col("user_id"))
    val thr = events.agg(
      (count(lit(1)).cast("double") / countDistinct(col("user_id")) * lit(1.1))
        .as("thr"))
    val est = org.apache.spark.sql.GraftBridge.column(
      org.apache.spark.sql.graft.CmsEstimate(
        org.apache.spark.sql.GraftBridge.expression(col("user_id")), cms))
    val candidates = events.distinct()
      .crossJoin(broadcast(thr))
      .filter(est.cast("double") >= col("thr"))
      .select(col("user_id"))
    events
      // candidate set = user-dimension state (all users above ~mean
      // activity in the worst case): Tables.stateHint bound applies.
      .join(graft.Tables.stateHint(candidates), Seq("user_id"), "left_semi")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .crossJoin(broadcast(thr))
      .filter(col("n_events").cast("double") >= col("thr"))
      .select(col("user_id"), col("n_events"))
  }

  val heavyHittersOracle: String = """
    WITH t AS (
      SELECT CAST(COUNT(*) AS DOUBLE) / COUNT(DISTINCT user_id) * 1.1 AS thr
      FROM events)
    SELECT user_id, COUNT(*) AS n_events
    FROM events
    GROUP BY user_id
    HAVING CAST(COUNT(*) AS DOUBLE) >= (SELECT thr FROM t)"""

  /** Trailing 1 hour in µs for the RANGE-frame window. */
  private val RangeFrameUs = 3_600_000_000L

  /** Time-RANGE-frame windowed aggregation: per event, the count and
    * exact sum of the SAME USER's events in the trailing hour — frame
    * bounds are VALUE offsets on event time (`RANGE BETWEEN 1h PRECEDING
    * AND CURRENT ROW`), not row counts, so sparse and bursty users get
    * the same time semantics (the ROWS-frame cousins are rolling_actives
    * and sessionize). Sum rides [[graft.functions.Exact.dsum]] — decimal
    * accumulation is associative, so the frame's evaluation order can't
    * drift from the oracle.
    *
    * Scale: one shuffle on user_id, then a linear two-pointer pass per
    * partition (Spark's RangeFrame slides monotonically) — no per-row
    * range join, no explode.
    */
  def windowRangeFrame(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("t_us"))
      .rangeBetween(-RangeFrameUs, Window.currentRow)
    Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), expr("ts div 1000").as("t_us"),
        col("value"))
      .select(col("event_id"), col("user_id"), col("t_us"),
        count(lit(1)).over(w).as("n_trailing_1h"),
        // Exact.dsum's construction, windowed: .over must attach to the
        // aggregate itself, so the decimal sum + final double cast are
        // spelled out here.
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(28, 6)))
          .over(w).cast("double").as("value_trailing_1h"))
  }

  val windowRangeFrameOracle: String = s"""
    SELECT event_id, user_id, EPOCH_US(ts) AS t_us,
      COUNT(*) OVER w AS n_trailing_1h,
      CAST(SUM(CAST(value AS DECIMAL(28,6))) OVER w AS DOUBLE) AS value_trailing_1h
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY EPOCH_US(ts)
      RANGE BETWEEN $RangeFrameUs PRECEDING AND CURRENT ROW)"""

  /** Time-series gap filling with LOCF: per event type, an hourly value
    * series over the GLOBAL [min, max] hour span — missing hours appear
    * with n_events = 0 and carry the last observed hourly total forward
    * (last-observation-carried-forward, the standard dashboard/feature
    * prep for sparse series; leading gaps before a type's first
    * observation stay NULL, which is LOCF's definition).
    *
    * Scale: the spine's HOURS explode from a broadcast 2-value scalar
    * frame, not from per-event rows — the span and distinct-type
    * aggregates are two cheap extra scans of (event_type, ts) only;
    * observed totals partial-aggregate before the spine join, and the
    * LOCF window partitions by type. Nothing re-scans events per hour.
    */
  def timeseriesFill(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_type"), expr(s"ts div $HourNs").as("hour"), col("value"))
    val observed = ev.groupBy(col("event_type"), col("hour"))
      .agg(count(lit(1)).as("n_events"),
        graft.functions.Exact.dsum(col("value")).as("hour_value"))
    val span = ev.agg(min(col("hour")).as("h0"), max(col("hour")).as("h1"))
    val spine = ev.select(col("event_type")).distinct()
      .crossJoin(broadcast(span))
      .select(col("event_type"), explode(sequence(col("h0"), col("h1"))).as("hour"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("hour"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(observed, Seq("event_type", "hour"), "left")
      .select(col("event_type"), col("hour"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        col("hour_value"))
      .withColumn("value_locf", last(col("hour_value"), ignoreNulls = true).over(w))
  }

  val timeseriesFillOracle: String = s"""
    WITH ev AS (
      SELECT event_type, EPOCH_NS(ts) // $HourNs AS hour, value FROM events),
    observed AS (
      SELECT event_type, hour,
        COUNT(*) AS n_events,
        ${graft.functions.Exact.sqlDsum("value")} AS hour_value
      FROM ev GROUP BY 1, 2),
    span AS (SELECT MIN(hour) AS h0, MAX(hour) AS h1 FROM ev),
    spine AS (
      SELECT t.event_type, UNNEST(RANGE(h0, h1 + 1)) AS hour
      FROM (SELECT DISTINCT event_type FROM ev) t CROSS JOIN span)
    SELECT s.event_type, s.hour,
      COALESCE(o.n_events, 0) AS n_events,
      o.hour_value,
      LAST_VALUE(o.hour_value IGNORE NULLS) OVER (
        PARTITION BY s.event_type ORDER BY s.hour
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_locf
    FROM spine s
    LEFT JOIN observed o ON s.event_type = o.event_type AND s.hour = o.hour"""

  /** Within-session event-type transition matrix (the Markov-chain view
    * of user behavior — "what follows a click?"): consecutive event
    * pairs INSIDE a session, counted per (from, to) type, each row with
    * its per-from transition probability in ppm (all-integer floor
    * division — no FP rates).
    *
    * Scale: rides [[sessionAssigned]]'s single user_id shuffle — the
    * successor lookup is a lead() on the SAME per-user window (session
    * boundaries handled by comparing the successor's session id, so no
    * second (user, session)-keyed exchange is introduced), and the
    * transition aggregate is |event_types|² rows — map-side combined to
    * almost nothing. The probability join is a broadcast of the
    * per-from totals.
    */
  def markovTransitions(spark: SparkSession, dir: String): DataFrame = {
    val order = Window.partitionBy(col("user_id"))
      .orderBy(col("t_us").asc, col("event_id").asc)
    val cm = sessionAssigned(spark, dir)
      .withColumn("next_type", lead(col("event_type"), 1).over(order))
      .withColumn("next_session", lead(col("session_id"), 1).over(order))
      .filter(col("next_session") === col("session_id"))
      .groupBy(col("event_type").as("from_type"),
        col("next_type").as("to_type"))
      .agg(count(lit(1)).as("n_transitions"))
    val tot = cm.groupBy(col("from_type"))
      .agg(sum(col("n_transitions")).as("n_from"))
    cm.join(broadcast(tot), Seq("from_type"))
      .select(col("from_type"), col("to_type"), col("n_transitions"),
        expr("(n_transitions * 1000000) div n_from").as("p_ppm"))
  }

  val markovTransitionsOracle: String = s"""
    WITH s AS ($sqlSessionAssigned),
    nxt AS (
      SELECT event_type, session_id,
        LEAD(event_type) OVER (PARTITION BY user_id
          ORDER BY t ASC, event_id ASC) AS next_type,
        LEAD(session_id) OVER (PARTITION BY user_id
          ORDER BY t ASC, event_id ASC) AS next_session
      FROM s),
    cm AS (
      SELECT event_type AS from_type, next_type AS to_type,
        COUNT(*) AS n_transitions
      FROM nxt WHERE next_session = session_id GROUP BY 1, 2),
    tot AS (
      SELECT from_type, SUM(n_transitions) AS n_from FROM cm GROUP BY 1)
    SELECT cm.from_type, cm.to_type,
      CAST(cm.n_transitions AS BIGINT) AS n_transitions,
      CAST((cm.n_transitions * 1000000) // t.n_from AS BIGINT) AS p_ppm
    FROM cm JOIN tot t USING (from_type)"""

  /** RFM customer segmentation — the classic recency/frequency/monetary
    * scoring over the purchase log, with every quintile computed by the
    * exact-cell histogram discipline (ccnet_buckets / percentiles): a
    * global NTILE over users is a single-reducer sort at 1e9 users,
    * while the histogram cumulative runs over AGGREGATED cells only —
    * and through the bucketed exclusive prefix
    * ([[graft.functions.Ranks.withExclusivePrefix]]), because the
    * monetary dimension's cell count grows with the spend RANGE, not a
    * calendar/count dimension. Dimensions are integer cells throughout — recency as the
    * max purchase DAY (epoch-nanos div), frequency as the purchase
    * count, monetary as floor of the exact-decimal value sum — so
    * thresholds and scores are engine-exact. Scores 1..5 (5 best in
    * every dimension: latest day / most purchases / highest spend);
    * segment labels from the standard R-F rule grid. One corpus
    * shuffle (the per-user aggregate); the three threshold frames are
    * one-row broadcasts.
    */
  def rfmSegmentation(spark: SparkSession, dir: String): DataFrame = {
    val users = graft.functions.Iterate.checkpoint(
      Tables.events(spark, dir)
        .filter(col("event_type") === "purchase")
        .groupBy(col("user_id"))
        .agg(max(expr("ts div 86400000000000")).as("r_cell"),
          count(lit(1)).as("f_cell"),
          floor(Exact.dsum(col("value"))).cast("bigint").as("m_cell")))
    val tot = users.agg(count(lit(1)).as("n_total"))
    // Quintile thresholds from the per-dimension cell histogram. r_cell
    // (days) and f_cell (order counts) are dimension-bounded, but m_cell
    // (floor-dollar lifetime spend) has RANGE-bounded cardinality —
    // ~1e5-1e6 cells at corpus scale — so the cumulative count runs
    // through the bucketed exclusive prefix (Ranks, cells from the
    // broadcast [min, max] span), never an unpartitioned window.
    def thresholds(dim: String): DataFrame = {
      val cells = users.groupBy(col(dim).as("cell")).agg(count(lit(1)).as("n"))
      val cum = graft.functions.Ranks.withBucketedExclusivePrefix(
          cells, col("cell"), ascending = true, 1024,
          Seq(col("n") -> "n_before"))
        .withColumn("cum", col("n_before") + col("n"))
      cum.crossJoin(broadcast(tot)).agg(
        min(when(col("cum") * 5 >= col("n_total"), col("cell"))).as(s"${dim}_t1"),
        min(when(col("cum") * 5 >= col("n_total") * 2, col("cell"))).as(s"${dim}_t2"),
        min(when(col("cum") * 5 >= col("n_total") * 3, col("cell"))).as(s"${dim}_t3"),
        min(when(col("cum") * 5 >= col("n_total") * 4, col("cell"))).as(s"${dim}_t4"))
    }
    def score(dim: String) =
      when(col(dim) <= col(s"${dim}_t1"), lit(1))
        .when(col(dim) <= col(s"${dim}_t2"), lit(2))
        .when(col(dim) <= col(s"${dim}_t3"), lit(3))
        .when(col(dim) <= col(s"${dim}_t4"), lit(4))
        .otherwise(lit(5))
    users
      .crossJoin(broadcast(thresholds("r_cell")))
      .crossJoin(broadcast(thresholds("f_cell")))
      .crossJoin(broadcast(thresholds("m_cell")))
      .withColumn("r_score", score("r_cell"))
      .withColumn("f_score", score("f_cell"))
      .withColumn("m_score", score("m_cell"))
      .select(col("user_id"), col("r_score"), col("f_score"), col("m_score"),
        when(col("r_score") >= 4 && col("f_score") >= 4 && col("m_score") >= 4,
          lit("champion"))
          .when(col("r_score") >= 3 && col("f_score") >= 3, lit("loyal"))
          .when(col("r_score") <= 2 && col("f_score") >= 3, lit("at_risk"))
          .when(col("r_score") <= 2 && col("f_score") <= 2, lit("hibernating"))
          .otherwise(lit("regular")).as("segment"))
  }

  val rfmSegmentationOracle: String = {
    def thCte(dim: String) = s"""${dim}_th AS (
      SELECT MIN(CASE WHEN cum * 5 >= n_total THEN cell END) AS ${dim}_t1,
             MIN(CASE WHEN cum * 5 >= 2 * n_total THEN cell END) AS ${dim}_t2,
             MIN(CASE WHEN cum * 5 >= 3 * n_total THEN cell END) AS ${dim}_t3,
             MIN(CASE WHEN cum * 5 >= 4 * n_total THEN cell END) AS ${dim}_t4
      FROM (
        SELECT cell, SUM(n) OVER (ORDER BY cell
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        FROM (SELECT $dim AS cell, COUNT(*) AS n FROM users GROUP BY 1))
      CROSS JOIN tot)"""
    def score(dim: String) = s"""CASE
        WHEN $dim <= ${dim}_t1 THEN 1 WHEN $dim <= ${dim}_t2 THEN 2
        WHEN $dim <= ${dim}_t3 THEN 3 WHEN $dim <= ${dim}_t4 THEN 4
        ELSE 5 END"""
    s"""
    WITH users AS MATERIALIZED (
      SELECT user_id,
        MAX(EPOCH_NS(ts) // 86400000000000) AS r_cell,
        COUNT(*) AS f_cell,
        CAST(FLOOR(${Exact.sqlDsum("value")}) AS BIGINT) AS m_cell
      FROM events WHERE event_type = 'purchase' GROUP BY 1),
    tot AS (SELECT COUNT(*) AS n_total FROM users),
    ${thCte("r_cell")},
    ${thCte("f_cell")},
    ${thCte("m_cell")}
    SELECT user_id,
      ${score("r_cell")} AS r_score,
      ${score("f_cell")} AS f_score,
      ${score("m_cell")} AS m_score,
      CASE
        WHEN ${score("r_cell")} >= 4 AND ${score("f_cell")} >= 4
          AND ${score("m_cell")} >= 4 THEN 'champion'
        WHEN ${score("r_cell")} >= 3 AND ${score("f_cell")} >= 3 THEN 'loyal'
        WHEN ${score("r_cell")} <= 2 AND ${score("f_cell")} >= 3 THEN 'at_risk'
        WHEN ${score("r_cell")} <= 2 AND ${score("f_cell")} <= 2 THEN 'hibernating'
        ELSE 'regular' END AS segment
    FROM users CROSS JOIN r_cell_th CROSS JOIN f_cell_th CROSS JOIN m_cell_th"""
  }

  /** Percentile winsorization — clip outlier metric values at the
    * per-event-type p1/p99 before they reach models or dashboards. The
    * thresholds come from the exact-cell histogram (cells =
    * floor(value·100) — deterministic on both engines), NEVER a global
    * per-type sort: at 100 TB the histogram aggregates to cell counts
    * and the cumulative window runs over those aggregated rows only.
    * Cell-resolution thresholds are the declared semantics (clip points
    * land on 0.01 boundaries) — the trade that keeps the operator
    * sort-free. Clipped value = clamp(value, lo_cell/100, hi_cell/100).
    */
  def winsorizeClip(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), col("event_type"), col("value"),
        floor(col("value") * lit(100.0)).cast("bigint").as("cell"))
    val wc = Window.partitionBy(col("event_type")).orderBy(col("cell"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val th = ev.groupBy(col("event_type"), col("cell")).agg(count(lit(1)).as("n"))
      .withColumn("cum", sum(col("n")).over(wc))
      .withColumn("n_total",
        sum(col("n")).over(Window.partitionBy(col("event_type"))))
      .groupBy(col("event_type"))
      .agg(
        min(when(col("cum") * 100 >= col("n_total"), col("cell"))).as("lo_cell"),
        min(when(col("cum") * 100 >= col("n_total") * 99, col("cell"))).as("hi_cell"))
    ev.join(broadcast(th.select(col("event_type"), col("lo_cell"), col("hi_cell"))),
        Seq("event_type"))
      .select(col("event_id"), col("event_type"), col("value"),
        least(greatest(col("value"), col("lo_cell").cast("double") / lit(100.0)),
          col("hi_cell").cast("double") / lit(100.0)).as("value_clipped"))
  }

  val winsorizeClipOracle: String = """
    WITH ev AS (
      SELECT event_id, event_type, value,
        CAST(FLOOR(value * 100.0) AS BIGINT) AS cell
      FROM events),
    cum AS (
      SELECT event_type, cell, n,
        SUM(n) OVER (PARTITION BY event_type ORDER BY cell
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        SUM(n) OVER (PARTITION BY event_type) AS n_total
      FROM (SELECT event_type, cell, COUNT(*) AS n FROM ev GROUP BY 1, 2)),
    th AS (
      SELECT event_type,
        MIN(CASE WHEN cum * 100 >= n_total THEN cell END) AS lo_cell,
        MIN(CASE WHEN cum * 100 >= n_total * 99 THEN cell END) AS hi_cell
      FROM cum GROUP BY 1)
    SELECT e.event_id, e.event_type, e.value,
      LEAST(GREATEST(e.value, CAST(t.lo_cell AS DOUBLE) / 100.0),
        CAST(t.hi_cell AS DOUBLE) / 100.0) AS value_clipped
    FROM ev e JOIN th t USING (event_type)"""

  /** A/B experiment read-out — deterministic hash-mod assignment (the
    * sample_stratified discipline: reproducible, shardable, no RNG
    * state) splits users 50/50; per variant and event_type, exposure
    * counts, converter counts, conversion ppm (all-integer) and the
    * exact-decimal mean purchase value. The assignment hash salts on
    * the experiment name so concurrent experiments are independent.
    * One corpus shuffle (the per-user/type aggregate); variant rollup
    * is tiny.
    */
  def abTestMetrics(spark: SparkSession, dir: String): DataFrame = {
    val variant = (graft.functions.TextOps.hash24(
      concat(lit("exp_checkout|"), col("user_id").cast("string"))) % 2)
      .cast("int").as("variant")
    val perUser = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), col("value"), variant)
      .groupBy(col("variant"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        count(when(col("event_type") === "purchase", lit(1))).as("n_purch"),
        Exact.dsum(when(col("event_type") === "purchase", col("value"))
          .otherwise(lit(0.0))).as("purch_value"))
    perUser.groupBy(col("variant"))
      .agg(count(lit(1)).as("n_users"),
        sum(col("n_events")).as("n_events"),
        count(when(col("n_purch") > 0, lit(1))).as("n_converters"),
        sum(col("n_purch")).as("n_purchases"),
        Exact.dsum(col("purch_value")).as("total_value"))
      .select(col("variant"), col("n_users"), col("n_events"),
        col("n_converters"), col("n_purchases"),
        expr("(n_converters * 1000000) div n_users").as("conversion_ppm"),
        (col("total_value") / col("n_purchases").cast("double"))
          .as("mean_purchase_value"))
  }

  val abTestMetricsOracle: String = {
    val assign = "CAST('0x' || SUBSTR(MD5('exp_checkout' || '|' " +
      "|| CAST(user_id AS VARCHAR)), 1, 6) AS BIGINT) % 2"
    s"""
    WITH per_user AS (
      SELECT CAST($assign AS INT) AS variant, user_id,
        COUNT(*) AS n_events,
        COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purch,
        ${Exact.sqlDsum("CASE WHEN event_type = 'purchase' THEN value ELSE 0.0 END")}
          AS purch_value
      FROM events GROUP BY 1, 2)
    SELECT variant,
      COUNT(*) AS n_users,
      CAST(SUM(n_events) AS BIGINT) AS n_events,
      CAST(COUNT(CASE WHEN n_purch > 0 THEN 1 END) AS BIGINT) AS n_converters,
      CAST(SUM(n_purch) AS BIGINT) AS n_purchases,
      (COUNT(CASE WHEN n_purch > 0 THEN 1 END) * 1000000) // COUNT(*)
        AS conversion_ppm,
      ${Exact.sqlDsum("purch_value")} / CAST(SUM(n_purch) AS DOUBLE)
        AS mean_purchase_value
    FROM per_user GROUP BY 1"""
  }

  /** EWMA smoothing of the daily event-count series, per event type —
    * the dashboard/anomaly-baseline smoother. α = 1/2 BY CONSTRUCTION:
    * the decay weights become exact powers of two, so the whole
    * smoother is INTEGER arithmetic (libm `pow` on an arbitrary α is
    * not FP-portable; 2^k is). The horizon truncates at
    * [[EwmaHorizon]] = 20 days back (weight ≤ 2⁻²⁰ ≈ 1e-6 of the
    * current day — below the output's own rounding), which also caps
    * the weight at 2¹⁹·count — safely inside int64.
    * Scale shape: the corpus aggregates to (type, day) counts FIRST;
    * the truncated-window self-join runs over that day-grid frame
    * (types × days, tiny at any corpus size). ewma = num/den in one
    * final exact division over existing-day weights only (gaps in the
    * grid self-renormalize).
    */
  private val EwmaHorizon = 20

  def ewmaSmooth(spark: SparkSession, dir: String): DataFrame = {
    val daily = graft.functions.Iterate.checkpoint(
      Tables.events(spark, dir)
        .groupBy(col("event_type"),
          expr("ts div 86400000000000").as("day"))
        .agg(count(lit(1)).as("cnt")))
    val t = daily.select(col("event_type"), col("day").as("t"))
    val k = daily.select(col("event_type"), col("day").as("k"), col("cnt"))
    t.join(k, Seq("event_type"))
      .filter(col("k") <= col("t") && col("k") > col("t") - EwmaHorizon)
      .select(col("event_type"), col("t"),
        expr(s"cnt * shiftleft(1L, cast(${EwmaHorizon - 1} - (t - k) as int))")
          .as("wx"),
        expr(s"shiftleft(1L, cast(${EwmaHorizon - 1} - (t - k) as int))")
          .as("w"))
      .groupBy(col("event_type"), col("t"))
      .agg(sum(col("wx")).as("num"), sum(col("w")).as("den"))
      .select(col("event_type"), col("t").as("day"),
        (col("num").cast("double") / col("den").cast("double")).as("ewma"))
  }

  val ewmaSmoothOracle: String = s"""
    WITH daily AS (
      SELECT event_type, EPOCH_NS(ts) // 86400000000000 AS day, COUNT(*) AS cnt
      FROM events GROUP BY 1, 2),
    pairs AS (
      SELECT t.event_type, t.day AS t,
        k.cnt * (CAST(1 AS BIGINT) << CAST(${EwmaHorizon - 1} - (t.day - k.day)
          AS INT)) AS wx,
        (CAST(1 AS BIGINT) << CAST(${EwmaHorizon - 1} - (t.day - k.day)
          AS INT)) AS w
      FROM daily t JOIN daily k
        ON t.event_type = k.event_type
        AND k.day <= t.day AND k.day > t.day - $EwmaHorizon)
    SELECT event_type, t AS day,
      CAST(SUM(wx) AS DOUBLE) / CAST(SUM(w) AS DOUBLE) AS ewma
    FROM pairs GROUP BY 1, 2"""

  /** Debounce suppression window (µs): a repeat of the same
    * (user, event_type) within 6 h of the previous RAW occurrence is
    * dropped as a near-duplicate firing.
    */
  private val DebounceGapUs = 21600000000L

  /** Event debounce: suppress repeated (user_id, event_type) firings
    * that arrive within [[DebounceGapUs]] of the previous raw
    * occurrence — the batch analog of a streaming dedup-within-
    * watermark stage (instrumentation double-fires, retry storms).
    * One lag over the per-(user, type) window — a single shuffle on
    * the composite key, no self-join. `gap_us` is the suppressed-
    * decision evidence (-1 for a key's first event — kept nullable-
    * free so the column stays BIGINT in both engines).
    *
    * The lag-against-RAW-predecessor rule (rather than against the
    * previous KEPT event) is deliberate: it is expressible as one
    * stateless window pass in any engine, while kept-chaining needs
    * a running fold — the streaming twin with real state lives in
    * EventStreams.
    */
  def eventDebounce(spark: SparkSession, dir: String): DataFrame = {
    val order = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("t_us").asc, col("event_id").asc)
    Tables.events(spark, dir)
      .withColumn("t_us", expr("ts div 1000"))
      .withColumn("prev_t", lag(col("t_us"), 1).over(order))
      .filter(col("prev_t").isNull
        || col("t_us") - col("prev_t") > DebounceGapUs)
      .select(col("user_id"), col("event_type"), col("event_id"),
        col("t_us").as("t"),
        coalesce(col("t_us") - col("prev_t"), lit(-1L)).as("gap_us"))
  }

  val eventDebounceOracle: String = s"""
    SELECT user_id, event_type, event_id, t,
      COALESCE(t - prev_t, -1) AS gap_us
    FROM (
      SELECT user_id, event_type, event_id, EPOCH_US(ts) AS t,
        LAG(EPOCH_US(ts)) OVER (PARTITION BY user_id, event_type
          ORDER BY EPOCH_US(ts) ASC, event_id ASC) AS prev_t
      FROM events)
    WHERE prev_t IS NULL OR t - prev_t > $DebounceGapUs"""

  /** Candidate watermark delays audited (µs): 0 s, 10 s, 60 s, 600 s. */
  private val LatenessDelaysUs = Seq(0L, 10000000L, 60000000L, 600000000L)

  /** Watermark-lateness audit: replay the stream in ARRIVAL order
    * (event_id — the generation sequence) tracking the per-type
    * high-water mark of event time, and for each candidate watermark
    * delay count the events that would have arrived too late (event
    * time below hwm − delay). This is the measurement that sizes
    * `withWatermark` before deploying the streaming jobs: too small
    * drops data, too large holds state — the audit gives the exact
    * loss curve per event type. One window shuffle on event_type; the
    * delay fan-out explodes AFTER lateness is computed (4 small rows
    * per event into a tiny fold, never a re-scan per delay).
    */
  def latenessAudit(spark: SparkSession, dir: String): DataFrame = {
    val order = Window.partitionBy(col("event_type")).orderBy(col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.events(spark, dir)
      .withColumn("t_us", expr("ts div 1000"))
      .withColumn("lateness",
        greatest(coalesce(max(col("t_us")).over(order) - col("t_us"),
          lit(0L)), lit(0L)))
      .select(col("event_type"), col("lateness"),
        explode(array(LatenessDelaysUs.map(lit): _*)).as("delay_us"))
      .groupBy(col("event_type"), col("delay_us"))
      .agg(
        sum(when(col("lateness") > col("delay_us"), 1L).otherwise(0L))
          .as("late_count"),
        count(lit(1)).as("n_events"))
      .withColumn("late_ppm", expr("late_count * 1000000L div n_events"))
  }

  val latenessAuditOracle: String = {
    val delays = LatenessDelaysUs.map(d => s"($d)").mkString(", ")
    s"""
    WITH base AS (
      SELECT event_type,
        GREATEST(COALESCE(MAX(EPOCH_US(ts)) OVER (PARTITION BY event_type
          ORDER BY event_id ROWS BETWEEN UNBOUNDED PRECEDING AND
          1 PRECEDING) - EPOCH_US(ts), 0), 0) AS lateness
      FROM events)
    SELECT event_type, CAST(delay_us AS BIGINT) AS delay_us,
      CAST(SUM(CASE WHEN lateness > delay_us THEN 1 ELSE 0 END) AS BIGINT)
        AS late_count,
      COUNT(*) AS n_events,
      CAST(SUM(CASE WHEN lateness > delay_us THEN 1 ELSE 0 END) AS BIGINT)
        * 1000000 // COUNT(*) AS late_ppm
    FROM base CROSS JOIN (VALUES $delays) AS d(delay_us)
    GROUP BY 1, 2"""
  }

  /** Trailing window (observed hours) and minimum history for a burst
    * verdict.
    */
  private val BurstTrailing = 24
  private val BurstMinN = 6

  /** Rate-burst detection: the event stream aggregates to the
    * (type, hour) grid ONCE (the only corpus shuffle), then each hour
    * compares against its trailing [[BurstTrailing]] OBSERVED hours.
    * The verdict is the integer ratio `burst_ppm = (cnt·trail_n·1e6)
    * div (3·trail_sum)` — above 1 000 000 ⇔ the hour runs >3× its
    * trailing mean (`cnt·n > 3·sum` in cross-multiplied form, no FP
    * division) — and `is_burst` requires that plus ≥ [[BurstMinN]]
    * hours of history. Output is the top-3 hours PER TYPE by that
    * ratio (hottest first, hour asc on ties), each carrying its
    * verdict — the "report the scored population with the flag, not
    * flags only" discipline: the original flags-only form returned 0
    * rows whenever the corpus held no 3× hour (true at sf0.001 AND
    * sf0.1), so its oracle match proved two empty sets equal. The
    * rate-based complement of anomaly_mad (which scores VALUES):
    * instrumentation storms move counts, not magnitudes. The windows
    * run on the aggregated grid — |types|·|hours| rows at any corpus
    * size; the product folds in DECIMAL(38,0)/HUGEINT (cnt·24·1e6
    * would wrap BIGINT past ~4e11 events/hour/type).
    */
  def burstDetect(spark: SparkSession, dir: String): DataFrame = {
    val grid = Tables.events(spark, dir)
      .groupBy(col("event_type"), expr("ts div 3600000000000").as("hour_id"))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("hour_id"))
      .rowsBetween(-BurstTrailing, -1)
    val rank = Window.partitionBy(col("event_type"))
      .orderBy(col("burst_ppm").desc, col("hour_id").asc)
    grid
      .withColumn("trail_n", count(col("cnt")).over(w))
      .withColumn("trail_sum", coalesce(sum(col("cnt")).over(w), lit(0L)))
      .filter(col("trail_n") >= 1)
      .withColumn("burst_ppm",
        expr("(CAST(cnt AS DECIMAL(38,0)) * trail_n * 1000000) "
          + "div (3 * trail_sum)"))
      .withColumn("is_burst",
        col("trail_n") >= BurstMinN && col("burst_ppm") > lit(1000000L))
      .withColumn("rn", row_number().over(rank))
      .filter(col("rn") <= 3)
      .select(col("event_type"), col("hour_id"), col("cnt"),
        col("trail_n"), col("trail_sum"), col("burst_ppm"), col("is_burst"))
  }

  val burstDetectOracle: String = s"""
    SELECT event_type, hour_id, cnt, trail_n, trail_sum, burst_ppm,
      (trail_n >= $BurstMinN AND burst_ppm > 1000000) AS is_burst
    FROM (
      SELECT event_type, hour_id, cnt, trail_n, trail_sum,
        CAST((CAST(cnt AS HUGEINT) * trail_n * 1000000)
          // (3 * trail_sum) AS BIGINT) AS burst_ppm,
        ROW_NUMBER() OVER (PARTITION BY event_type
          ORDER BY (CAST(cnt AS HUGEINT) * trail_n * 1000000)
            // (3 * trail_sum) DESC, hour_id ASC) AS rn
      FROM (
        SELECT event_type, hour_id, cnt,
          COUNT(cnt) OVER w AS trail_n,
          CAST(COALESCE(SUM(cnt) OVER w, 0) AS BIGINT) AS trail_sum
        FROM (
          SELECT event_type, EPOCH_US(ts) // 3600000000 AS hour_id,
            COUNT(*) AS cnt
          FROM events GROUP BY 1, 2)
        WINDOW w AS (PARTITION BY event_type ORDER BY hour_id
          ROWS BETWEEN $BurstTrailing PRECEDING AND 1 PRECEDING))
      WHERE trail_n >= 1)
    WHERE rn <= 3"""

  /** Time-weighted average event value per user — the feature-store
    * aggregation for irregular samples (left-constant interpolation:
    * each value holds until the next observation; the last one carries
    * no weight). All arithmetic is fixed-point integer: values to
    * milli-units via floor(v·1000 + 0.5), durations to ms, the mean as
    * one integer division — double products summed in shuffle order
    * would differ run-to-run AND engine-to-engine. Magnitude headroom:
    * v_fp ≤ ~10⁶ milli-units × span ≤ ~10⁹ ms keeps every per-user sum
    * under 2⁶³. One shuffle: the per-user window and the per-user fold
    * share their partitioning.
    */
  def timeWeightedAvg(spark: SparkSession, dir: String): DataFrame = {
    val order = Window.partitionBy(col("user_id"))
      .orderBy(col("t_us").asc, col("event_id").asc)
    Tables.events(spark, dir)
      .withColumn("t_us", expr("ts div 1000"))
      .withColumn("v_fp", floor(col("value") * lit(1000d) + lit(0.5d)))
      .withColumn("next_t", lead(col("t_us"), 1).over(order))
      .withColumn("wt",
        coalesce(col("v_fp") * expr("(next_t - t_us) div 1000"), lit(0L)))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        expr("(max(t_us) - min(t_us)) div 1000").as("span_ms"),
        sum(col("wt")).as("wt_sum"))
      .filter(col("span_ms") > 0L)
      .select(col("user_id"), col("n_events"), col("span_ms"),
        expr("wt_sum div span_ms").as("twa_milli"))
  }

  val timeWeightedAvgOracle: String = s"""
    WITH base AS (
      SELECT user_id, event_id, EPOCH_US(ts) AS t,
        CAST(FLOOR(value * 1000 + 0.5) AS BIGINT) AS v_fp,
        LEAD(EPOCH_US(ts)) OVER (PARTITION BY user_id
          ORDER BY EPOCH_US(ts) ASC, event_id ASC) AS next_t
      FROM events)
    SELECT user_id, n_events, span_ms, wt_sum // span_ms AS twa_milli
    FROM (
      SELECT user_id, COUNT(*) AS n_events,
        (MAX(t) - MIN(t)) // 1000 AS span_ms,
        CAST(SUM(COALESCE(v_fp * ((next_t - t) // 1000), 0)) AS BIGINT)
          AS wt_sum
      FROM base GROUP BY 1)
    WHERE span_ms > 0"""

  /** Mergeable-sketch distinct counts over time buckets: user_id HLL
    * sketches are built per DAY (the pre-aggregated state a 100 TB
    * pipeline lands incrementally), then any coarser window — here
    * weekly — is answered by UNIONING the daily sketches, never by
    * re-scanning raw events. This is the rollup companion to
    * approx_distinct (one-shot sketch): the state is day-count-sized,
    * the weekly union touches |days| sketch blobs, and the same state
    * serves monthly or any other window for free. Sketch bytes are
    * engine-specific, so the gate follows the approx_distinct
    * convention: exact twin columns + a `within_bounds` band flag the
    * oracle expects to be TRUE.
    */
  def hllWindowMerge(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val daily = e.groupBy(expr("ts div 86400000000000").as("day_id"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
    val weekly = daily.groupBy(expr("day_id div 7").as("week_id"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
    val exact = e.groupBy(expr("(ts div 86400000000000) div 7").as("wx"))
      .agg(countDistinct(col("user_id")).as("n_exact"),
        count(lit(1)).as("n_events"))
    weekly.join(exact, col("week_id") === col("wx"))
      .select(col("week_id"), col("n_exact"), col("n_events"),
        (abs(col("est") - col("n_exact")).cast("double")
          <= col("n_exact").cast("double") * lit(0.05)).as("within_bounds"))
  }

  val hllWindowMergeOracle: String = """
    SELECT (EPOCH_US(ts) // 86400000000) // 7 AS week_id,
      COUNT(DISTINCT user_id) AS n_exact, COUNT(*) AS n_events,
      TRUE AS within_bounds
    FROM events GROUP BY 1"""

  /** Paths reported by [[sessionPaths]]. */
  private val PathTopK = 20

  /** Top session paths: each session's ordered event-type sequence
    * joined into a `>`-path, counted corpus-wide, top [[PathTopK]] —
    * the clickstream mining view of the session frame ("what do users
    * actually DO in a session"). Ordering inside a session rides a
    * sort_array over collected (t, event_id, type) structs —
    * collect_list alone is partition-order-nondeterministic, which
    * both breaks reproducibility and the oracle; the struct sort pins
    * the same (time, id) tie order as every session operator. Shares
    * [[sessionAssigned]] (one user window) + a per-session fold that
    * reuses the user_id partitioning + a path-cardinality count; the
    * top-k is a bounded TakeOrdered heap.
    */
  def sessionPaths(spark: SparkSession, dir: String): DataFrame =
    sessionAssigned(spark, dir)
      .groupBy(col("user_id"), col("session_id"))
      .agg(sort_array(collect_list(
        struct(col("t_us"), col("event_id"), col("event_type")))).as("evs"))
      .select(array_join(transform(col("evs"), e => e.getField("event_type")),
        ">").as("path"))
      .groupBy(col("path")).agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path").asc)
      .limit(PathTopK)

  val sessionPathsOracle: String = s"""
    SELECT path, COUNT(*) AS n_sessions
    FROM (
      SELECT STRING_AGG(event_type, '>' ORDER BY t ASC, event_id ASC)
        AS path
      FROM ($sqlSessionAssigned)
      GROUP BY user_id, session_id)
    GROUP BY 1
    ORDER BY n_sessions DESC, path ASC LIMIT $PathTopK"""

  /** Conversion-latency histogram: per user, hours from FIRST view to
    * the first purchase at-or-after it (the funnel's time axis —
    * window_funnel counts who converts, this measures how fast),
    * bucketed to whole hours. Decorrelated to one per-user conditional
    * aggregate (min view time, min purchase time ≥ that) — never an
    * event self-join; the histogram is a second tiny fold.
    */
  def conversionLatency(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .withColumn("t_us", expr("ts div 1000"))
    val perUser = e.groupBy(col("user_id"))
      .agg(min(when(col("event_type") === "view", col("t_us")))
        .as("t_view"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("t_us").as("t_p"))
    perUser.filter(col("t_view").isNotNull)
      .join(purchases, col("user_id") === col("p_user")
        && col("t_p") >= col("t_view"))
      .groupBy(col("user_id"), col("t_view"))
      .agg(min(col("t_p")).as("t_purchase"))
      .select(expr("(t_purchase - t_view) div 3600000000")
        .as("latency_hours"))
      .groupBy(col("latency_hours"))
      .agg(count(lit(1)).as("n_users"))
  }

  val conversionLatencyOracle: String = """
    WITH per_user AS (
      SELECT user_id,
        MIN(CASE WHEN event_type = 'view' THEN EPOCH_US(ts) END) AS t_view
      FROM events GROUP BY 1),
    conv AS (
      SELECT u.user_id, u.t_view, MIN(p.t_p) AS t_purchase
      FROM per_user u
      JOIN (SELECT user_id, EPOCH_US(ts) AS t_p FROM events
            WHERE event_type = 'purchase') p
        ON p.user_id = u.user_id AND p.t_p >= u.t_view
      WHERE u.t_view IS NOT NULL
      GROUP BY 1, 2)
    SELECT (t_purchase - t_view) // 3600000000 AS latency_hours,
      COUNT(*) AS n_users
    FROM conv GROUP BY 1"""

  /** CUSUM change-point detection per event type — the structural-shift
    * complement to burst_detect's local spikes: on the (type, hour)
    * grid, the cumulative sum of deviations from the type's mean rate
    * peaks exactly where the level shifts (Page's CUSUM statistic).
    * Deviations are kept EXACT by cross-multiplying instead of
    * dividing: `dev_i = cnt_i·H − total` (the per-hour deviation
    * scaled by the hour count H), so the running sum is pure integer —
    * the float mean would smear the argmax across engines. The peak is
    * the earliest hour attaining max |cusum| (ties broken on hour).
    * Grid-sized windows only; the corpus shuffles once into the grid.
    */
  def cusumChangepoint(spark: SparkSession, dir: String): DataFrame = {
    val grid = Tables.events(spark, dir)
      .groupBy(col("event_type"), expr("ts div 3600000000000").as("hour_id"))
      .agg(count(lit(1)).as("cnt"))
    val byType = Window.partitionBy(col("event_type"))
    val run = byType.orderBy(col("hour_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val scored = grid
      .withColumn("h", count(lit(1)).over(byType))
      .withColumn("total", sum(col("cnt")).over(byType))
      .withColumn("cusum",
        sum(col("cnt") * col("h") - col("total")).over(run))
      .withColumn("rk", row_number().over(byType.orderBy(
        abs(col("cusum")).desc, col("hour_id").asc)))
    scored.filter(col("rk") === 1)
      .select(col("event_type"), col("h").as("n_hours"),
        col("hour_id").as("peak_hour_id"), col("cusum").as("peak_cusum"),
        signum(col("cusum")).cast("long").as("direction"))
  }

  val cusumChangepointOracle: String = """
    SELECT event_type, n_hours, hour_id AS peak_hour_id,
      cusum AS peak_cusum,
      CAST(SIGN(cusum) AS BIGINT) AS direction
    FROM (
      SELECT event_type, hour_id, n_hours, cusum,
        ROW_NUMBER() OVER (PARTITION BY event_type
          ORDER BY ABS(cusum) DESC, hour_id ASC) AS rk
      FROM (
        SELECT event_type, hour_id,
          COUNT(*) OVER w AS n_hours,
          CAST(SUM(cnt * h - total) OVER (PARTITION BY event_type
            ORDER BY hour_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cusum
        FROM (
          SELECT event_type, hour_id, cnt,
            COUNT(*) OVER (PARTITION BY event_type) AS h,
            CAST(SUM(cnt) OVER (PARTITION BY event_type) AS BIGINT)
              AS total
          FROM (
            SELECT event_type, EPOCH_US(ts) // 3600000000 AS hour_id,
              COUNT(*) AS cnt
            FROM events GROUP BY 1, 2))
        WINDOW w AS (PARTITION BY event_type)))
    WHERE rk = 1"""

  /** Peak session concurrency per day — the sweep-line (+1 at session
    * start, −1 just after session end) with its running sum peaking at
    * the day's maximum number of simultaneously-active sessions.
    *
    * The GLOBAL prefix sum is computed WITHOUT a global sort — the
    * pattern that makes sweep-lines work at 100 TB: boundaries
    * partition by day, each day computes its own ordered running sum
    * in parallel, the per-day NET totals (a days-count-sized frame)
    * prefix-sum into an opening balance, and
    * `concurrency = opening_balance + within_day_sum` equals the
    * single-sort global sweep exactly (associativity of addition) —
    * which is what the oracle computes the straightforward way, so the
    * equivalence itself is hash-verified. Tie order (t asc, +1 before
    * −1) makes intervals inclusive: a session ending the instant
    * another starts overlaps it; departures are stamped end+1 µs so a
    * single-event session never dips negative.
    */
  def concurrencyPeaks(spark: SparkSession, dir: String): DataFrame = {
    val sess = sessionAssigned(spark, dir)
      .groupBy(col("user_id"), col("session_id"))
      .agg(min(col("t_us")).as("s"), (max(col("t_us")) + 1L).as("e"))
    val bounds = sess.select(col("s").as("t"), lit(1L).as("delta"))
      .unionByName(sess.select(col("e").as("t"), lit(-1L).as("delta")))
      .withColumn("day_id", expr("t div 86400000000"))
    val byDay = Window.partitionBy(col("day_id"))
    val run = byDay.orderBy(col("t").asc, col("delta").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // checkpointed: the day-count frame's lineage is the full session
    // assignment — Ranks' documented triple read would re-sessionize
    // the events three times for a |days|-row frame.
    val dayNet = graft.functions.Iterate.checkpoint(
      bounds.groupBy(col("day_id").as("d"))
        .agg(sum(col("delta")).as("net")))
    // day-count frame, but the opening balance still rides the bucketed
    // exclusive prefix (cell = 32-day epoch block — already integer and
    // monotone, no span probe needed): registry-wide invariant.
    val opening = graft.functions.Ranks.withExclusivePrefix(
        dayNet, expr("d div 32"), Seq(col("d").asc),
        Seq(col("net") -> "opening"))
      .select(col("d"), col("opening"))
    bounds
      .withColumn("within", sum(col("delta")).over(run))
      .join(broadcast(opening), col("day_id") === col("d"))
      .withColumn("conc", col("opening") + col("within"))
      .withColumn("rk", row_number().over(byDay.orderBy(
        col("conc").desc, col("t").asc)))
      .filter(col("rk") === 1)
      .select(col("day_id"), col("conc").as("peak_concurrency"),
        col("t").as("peak_t_us"))
  }

  val concurrencyPeaksOracle: String = s"""
    WITH sess AS (
      SELECT user_id, session_id, MIN(t) AS s, MAX(t) + 1 AS e
      FROM ($sqlSessionAssigned)
      GROUP BY 1, 2),
    bounds AS (
      SELECT s AS t, 1 AS delta FROM sess
      UNION ALL SELECT e, -1 FROM sess),
    swept AS (
      SELECT t, t // 86400000000 AS day_id,
        CAST(SUM(delta) OVER (ORDER BY t ASC, delta DESC
          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS conc
      FROM bounds)
    SELECT day_id, conc AS peak_concurrency, t AS peak_t_us
    FROM (
      SELECT day_id, conc, t,
        ROW_NUMBER() OVER (PARTITION BY day_id
          ORDER BY conc DESC, t ASC) AS rk
      FROM swept)
    WHERE rk = 1"""

  def defs: Map[String, QueryDef] = Map(
    "concurrency_peaks" ->
      QueryDef.sql(concurrencyPeaks, concurrencyPeaksOracle),
    "cusum_changepoint" ->
      QueryDef.sql(cusumChangepoint, cusumChangepointOracle),
    "session_paths" -> QueryDef.sql(sessionPaths, sessionPathsOracle),
    "conversion_latency" ->
      QueryDef.sql(conversionLatency, conversionLatencyOracle),
    "lateness_audit" -> QueryDef.sql(latenessAudit, latenessAuditOracle),
    "burst_detect" -> QueryDef.sql(burstDetect, burstDetectOracle),
    "time_weighted_avg" -> QueryDef.sql(timeWeightedAvg, timeWeightedAvgOracle),
    "hll_window_merge" -> QueryDef.sql(hllWindowMerge, hllWindowMergeOracle),
    "event_debounce" -> QueryDef.sql(eventDebounce, eventDebounceOracle),
    "ewma_smooth" -> QueryDef.sql(ewmaSmooth, ewmaSmoothOracle),
    "winsorize_clip" -> QueryDef.sql(winsorizeClip, winsorizeClipOracle),
    "ab_test_metrics" -> QueryDef.sql(abTestMetrics, abTestMetricsOracle),
    "rfm_segmentation" -> QueryDef.sql(rfmSegmentation, rfmSegmentationOracle),
    "markov_transitions" -> QueryDef.sql(markovTransitions, markovTransitionsOracle),
    "timeseries_fill" -> QueryDef.sql(timeseriesFill, timeseriesFillOracle),
    "window_range_frame" -> QueryDef.sql(windowRangeFrame, windowRangeFrameOracle),
    "heavy_hitters" -> QueryDef.sql(heavyHitters, heavyHittersOracle),
    "session_stats" -> QueryDef.sql(sessionStats, sessionStatsOracle),
    "rolling_actives" -> QueryDef.sql(rollingActives, rollingActivesOracle),
    "anomaly_mad" -> QueryDef.sql(anomalyMad, anomalyMadOracle),
    "retention_cohorts" -> QueryDef.sql(retentionCohorts, retentionCohortsOracle),
    "window_funnel" -> QueryDef.sql(windowFunnel, windowFunnelOracle),
    "zscore_normalize" -> QueryDef.sql(zscoreNormalize, zscoreNormalizeOracle),
    "purchase_attribution" -> QueryDef.sql(purchaseAttribution, purchaseAttributionOracle),
    "distinct_users" -> QueryDef.sql(distinctUsers, distinctUsersOracle),
    "approx_distinct" -> QueryDef.sql(approxDistinct, approxDistinctOracle),
    "events_json_extract" -> QueryDef.sql(eventsJsonExtract, eventsJsonExtractOracle),
    "sessionize" -> QueryDef.sql(sessionize, sessionizeOracle),
    "asof_join" -> QueryDef.sql(asofJoin, asofJoinOracle),
    "range_join" -> QueryDef.sql(rangeJoin, rangeJoinOracle),
    "stream_window_agg" -> QueryDef.sql(streamWindowAgg, streamWindowAggOracle)
  )
}
