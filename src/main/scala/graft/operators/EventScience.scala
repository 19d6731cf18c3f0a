package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Behavioral / statistical analyses over the events stream (§2.D
  * events family): bot detection, day-of-week seasonality, and a
  * mergeable quantile sketch — the operational-analytics layer a
  * clickstream lake runs on top of the sessionize/funnel family.
  * Reference analogue: the logstash events path (stage-6 ingest) whose
  * rows the reference only counts; these give them semantics.
  *
  * Time discipline: every operator derives integer epoch quantities
  * (`ts div …`) from [[Tables.events]]' epoch-nanos BIGINT contract —
  * no date functions, so both engines bin identically. All cross-row
  * aggregates are exact BIGINT sums; doubles appear only in final
  * per-row closed forms (single division / IEEE sqrt — both
  * correctly-rounded, hence portable).
  */
object EventScience {

  private val NsPerDay = 86400L * 1000 * 1000 * 1000
  private val UsPerMinute = 60L * 1000 * 1000

  /** Per-user behavioral bot audit: inter-arrival regularity (a scripted
    * client's gap coefficient-of-variation is near zero), sustained rate
    * per ACTIVE minute (burst rate, robust to idle spans), and type
    * diversity. The release gate that keeps synthetic traffic out of a
    * training corpus — at 100 TB of clickstream, per-user state is one
    * row per user: one shuffle for the lag window, one aggregate.
    *
    * cv derivation keeps everything exact until the last step:
    * cv = σ/μ = sqrt(n·Σg² − (Σg)²) / Σg over integer second gaps —
    * two BIGINT moments, one sqrt, one division. Degenerate profiles
    * (fewer than 2 gaps, or all gaps zero) get cv sentinel −1.
    */
  def botDetect(spark: SparkSession, dir: String): DataFrame = {
    val order = Window.partitionBy(col("user_id"))
      .orderBy(col("t_us").asc, col("event_id").asc)
    val gaps = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        expr("ts div 1000").as("t_us"))
      .withColumn("gap_s",
        ((col("t_us") - lag(col("t_us"), 1).over(order)) / lit(1000000L))
          .cast("bigint"))
    val prof = gaps.groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("event_type")).as("n_types"),
        countDistinct(expr(s"t_us div $UsPerMinute")).as("active_minutes"),
        count(col("gap_s")).as("n_gaps"),
        coalesce(sum(col("gap_s")), lit(0L)).as("sg"),
        coalesce(sum(col("gap_s") * col("gap_s")), lit(0L)).as("sg2"))
    prof
      .withColumn("events_per_min_ppm",
        expr("(n_events * 1000000) div active_minutes"))
      .withColumn("gap_cv_ppm",
        when(col("n_gaps") < 2 || col("sg") === 0, lit(-1L))
          .otherwise(
            floor(sqrt((col("n_gaps") * col("sg2") - col("sg") * col("sg"))
              .cast("double"))
              / col("sg").cast("double") * lit(1.0e6)).cast("bigint")))
      .withColumn("is_bot",
        (col("n_events") >= 20) &&
          (col("events_per_min_ppm") >= 3000000L ||
            (col("gap_cv_ppm") >= 0L && col("gap_cv_ppm") < 200000L)))
      .select(col("user_id"), col("n_events"), col("n_types"),
        col("active_minutes"), col("events_per_min_ppm"),
        col("gap_cv_ppm"), col("is_bot"))
  }

  val botDetectOracle: String = s"""
    WITH g AS (
      SELECT user_id, event_id, event_type,
        EPOCH_US(ts) AS t_us,
        (EPOCH_US(ts) - LAG(EPOCH_US(ts)) OVER (PARTITION BY user_id
          ORDER BY EPOCH_US(ts) ASC, event_id ASC)) // 1000000 AS gap_s
      FROM events),
    prof AS (
      SELECT user_id,
        COUNT(*) AS n_events,
        COUNT(DISTINCT event_type) AS n_types,
        COUNT(DISTINCT t_us // $UsPerMinute) AS active_minutes,
        COUNT(gap_s) AS n_gaps,
        COALESCE(SUM(gap_s), 0) AS sg,
        COALESCE(SUM(gap_s * gap_s), 0) AS sg2
      FROM g GROUP BY 1),
    f AS (
      SELECT user_id, n_events, n_types, active_minutes,
        (n_events * 1000000) // active_minutes AS events_per_min_ppm,
        CASE WHEN n_gaps < 2 OR sg = 0 THEN -1
          ELSE CAST(FLOOR(SQRT(CAST(n_gaps * sg2 - sg * sg AS DOUBLE))
            / CAST(sg AS DOUBLE) * 1.0e6) AS BIGINT) END AS gap_cv_ppm
      FROM prof)
    SELECT user_id, n_events, n_types, active_minutes, events_per_min_ppm,
      gap_cv_ppm,
      (n_events >= 20 AND (events_per_min_ppm >= 3000000
        OR (gap_cv_ppm >= 0 AND gap_cv_ppm < 200000))) AS is_bot
    FROM f"""

  /** Day-of-week seasonality profile per event type: event share and
    * exact-cents value mass per weekday, with the seasonal index
    * (share·7, ppm — 1 000 000 ⇒ flat) a forecasting layer divides out
    * before trend fitting ([[EventOps]]' ewma/CUSUM operate on the
    * deseasonalized series this produces). Weekday from pure integer
    * epoch arithmetic ((epoch_day + 4) mod 7, 0 = Sunday) — no calendar
    * functions, so the engines cannot disagree on locale/week-start.
    * One map-side-combinable aggregate; the share window runs on the
    * 7·|types| profile frame.
    */
  def dowSeasonality(spark: SparkSession, dir: String): DataFrame = {
    val byDow = Tables.events(spark, dir)
      .select(col("event_type"),
        ((expr(s"ts div $NsPerDay") + 4) % 7).as("dow"),
        expr(s"ts div $NsPerDay").as("day_ord"),
        floor(col("value") * 100 + lit(0.5)).cast("bigint").as("cents"))
      .groupBy(col("event_type"), col("dow"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("cents")).as("value_cents"),
        countDistinct(col("day_ord")).as("n_days"))
    val wt = Window.partitionBy(col("event_type"))
    byDow
      .withColumn("type_total", sum(col("n_events")).over(wt))
      .withColumn("dow_share_ppm", expr("(n_events * 1000000) div type_total"))
      .withColumn("seasonal_idx_ppm", expr("(n_events * 7000000) div type_total"))
      .drop("type_total")
  }

  val dowSeasonalityOracle: String = s"""
    WITH b AS (
      SELECT event_type,
        (EPOCH_NS(ts) // $NsPerDay + 4) % 7 AS dow,
        EPOCH_NS(ts) // $NsPerDay AS day_ord,
        CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents
      FROM events),
    g AS (
      SELECT event_type, dow, COUNT(*) AS n_events,
        CAST(SUM(cents) AS BIGINT) AS value_cents,
        COUNT(DISTINCT day_ord) AS n_days
      FROM b GROUP BY 1, 2)
    SELECT event_type, dow, n_events, value_cents, n_days,
      (n_events * 1000000)
        // CAST(SUM(n_events) OVER (PARTITION BY event_type) AS BIGINT)
        AS dow_share_ppm,
      (n_events * 7000000)
        // CAST(SUM(n_events) OVER (PARTITION BY event_type) AS BIGINT)
        AS seasonal_idx_ppm
    FROM g"""

  /** Classical additive seasonal decomposition of the daily event-count
    * series: observed = trend + seasonal + residual, per calendar day —
    * the standard time-series triage BEFORE anomaly/changepoint work
    * ([[EventOps]]' cusum/anomaly_mad flag residual spikes far more
    * cleanly once the weekday wave and the slow trend are removed;
    * [[dowSeasonality]] reports the weekday SHARE, this removes it from
    * the series). Exactness: the series is the zero-filled calendar
    * grid (a day with no events is a 0, not a hole — the
    * timeseries_fill spine idiom); the centered 7-day moving-average
    * trend stays INTEGER in ×7 units (trend_x7 = Σ window counts, NULL
    * on the 3-day edges where the window is partial — never a
    * shortened-window fake); the per-weekday seasonal is the mean
    * detrended value in ×7e6 units via FLOOR division (negative
    * numerators are real here; both engines' integer division
    * truncates toward zero — verified, DuckDB −7 // 2 = −3, not a
    * floor — but truncation is the wrong semantics for a MEAN of
    * signed values, so the explicit a−((a%b+b)%b) remainder form
    * makes the numerator exactly divisible and both engines produce
    * the true floor); the residual is pure integer subtraction in the
    * same units. Scale: one corpus-scale shuffle into daily counts;
    * everything after runs on the calendar-bounded day grid
    * (checkpointed — the trend window, the seasonal fold, and the
    * final projection all read it), with the 7-row seasonal profile
    * broadcast back.
    */
  def seasonalDecompose(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(expr(s"ts div $NsPerDay").as("day_ord"))
    val observed = ev.groupBy(col("day_ord")).agg(count(lit(1)).as("n_events"))
    val span = ev.agg(min(col("day_ord")).as("d0"), max(col("day_ord")).as("d1"))
    val spine = span
      .select(explode(sequence(col("d0"), col("d1"))).as("day_ord"))
    val wMa = Window.orderBy(col("day_ord")).rangeBetween(-3, 3)
    val daily = graft.functions.Iterate.checkpoint(
      spine.join(observed, Seq("day_ord"), "left")
        .select(col("day_ord"),
          ((col("day_ord") + 4) % 7).as("dow"),
          coalesce(col("n_events"), lit(0L)).as("n_events"))
        .withColumn("trend_x7",
          when(count(lit(1)).over(wMa) === 7, sum(col("n_events")).over(wMa)))
        .withColumn("det_x7",
          when(col("trend_x7").isNotNull,
            lit(7L) * col("n_events") - col("trend_x7"))),
      Some("moving average over the calendar-bounded day grid"))
    val seas = daily.filter(col("det_x7").isNotNull)
      .groupBy(col("dow"))
      .agg(sum(col("det_x7")).as("sd"), count(lit(1)).as("cnt"))
      .withColumn("num", col("sd") * 1000000L)
      .withColumn("seasonal_x7e6",
        expr("(num - ((num % cnt + cnt) % cnt)) div cnt"))
      .select(col("dow"), col("seasonal_x7e6"))
    daily.join(broadcast(seas), Seq("dow"), "left")
      .select(col("day_ord"), col("dow"), col("n_events"), col("trend_x7"),
        col("seasonal_x7e6"),
        when(col("det_x7").isNotNull && col("seasonal_x7e6").isNotNull,
          col("det_x7") * 1000000L - col("seasonal_x7e6"))
          .as("resid_x7e6"))
  }

  val seasonalDecomposeOracle: String = s"""
    WITH ev AS (
      SELECT EPOCH_NS(ts) // $NsPerDay AS day_ord FROM events),
    observed AS (
      SELECT day_ord, COUNT(*) AS n_events FROM ev GROUP BY 1),
    span AS (SELECT MIN(day_ord) AS d0, MAX(day_ord) AS d1 FROM ev),
    spine AS (SELECT UNNEST(RANGE(d0, d1 + 1)) AS day_ord FROM span),
    daily0 AS (
      SELECT s.day_ord, (s.day_ord + 4) % 7 AS dow,
        COALESCE(o.n_events, 0) AS n_events
      FROM spine s LEFT JOIN observed o ON s.day_ord = o.day_ord),
    daily AS (
      SELECT day_ord, dow, n_events,
        CASE WHEN COUNT(*) OVER w = 7
          THEN CAST(SUM(n_events) OVER w AS BIGINT) END AS trend_x7
      FROM daily0
      WINDOW w AS (ORDER BY day_ord RANGE BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
    det AS (
      SELECT day_ord, dow, n_events, trend_x7,
        CASE WHEN trend_x7 IS NOT NULL
          THEN 7 * n_events - trend_x7 END AS det_x7
      FROM daily),
    seas AS (
      SELECT dow,
        (num - ((num % cnt + cnt) % cnt)) // cnt AS seasonal_x7e6
      FROM (
        SELECT dow, CAST(SUM(det_x7) * 1000000 AS BIGINT) AS num,
          COUNT(*) AS cnt
        FROM det WHERE det_x7 IS NOT NULL GROUP BY 1))
    SELECT d.day_ord, d.dow, d.n_events, d.trend_x7, s.seasonal_x7e6,
      CASE WHEN d.det_x7 IS NOT NULL AND s.seasonal_x7e6 IS NOT NULL
        THEN d.det_x7 * 1000000 - s.seasonal_x7e6 END AS resid_x7e6
    FROM det d LEFT JOIN seas s ON d.dow = s.dow"""

  /** Deseasonalized day-level anomaly detection — the MAD rule applied
    * to [[seasonalDecompose]]'s residuals (the reason the decomposition
    * exists: a Sunday dip is NOT an anomaly, a Tuesday that deviates
    * from trend+weekday-wave IS; [[EventOps]]' anomaly_mad flags raw
    * VALUES, this flags whole days after the calendar structure is
    * removed). Entirely INTEGER: residuals arrive in exact ×7e6 units,
    * both medians are nearest-rank LOWER medians (rank ⌊(n+1)/2⌋ of
    * the sorted frame — an actual data value, no interpolation), the
    * robust z is an integer floor division ×1e4, and the flag is
    * z > 2.5 as BIGINT 1/0 (NULL when MAD = 0 — a constant-residual
    * series has no scale to judge against). Scale: the corpus cost is
    * seasonalDecompose's one daily shuffle; the interior-day frame is
    * calendar-bounded, checkpointed (three reads: two median ranks +
    * the final projection), and its rank windows run at that bounded
    * scale (PlanSpec allowlist).
    */
  def seasonalAnomaly(spark: SparkSession, dir: String): DataFrame = {
    val interior = graft.functions.Iterate.checkpoint(
      seasonalDecompose(spark, dir)
        .filter(col("resid_x7e6").isNotNull)
        .select(col("day_ord"), col("n_events"), col("resid_x7e6")))
    val n = interior.agg(count(lit(1)).as("n_days"))
    def lowerMedian(df: DataFrame, c: String): DataFrame = {
      val w = Window.orderBy(col(c).asc, col("day_ord").asc)
      df.withColumn("rn", row_number().over(w))
        .crossJoin(broadcast(n))
        .filter(col("rn") === expr("(n_days + 1) div 2"))
        .select(col(c).as("med"))
    }
    val med = lowerMedian(interior, "resid_x7e6")
    val dev = interior.crossJoin(broadcast(med))
      .withColumn("abs_dev_x7e6", abs(col("resid_x7e6") - col("med")))
    val mad = lowerMedian(
      dev.select(col("day_ord"), col("abs_dev_x7e6")), "abs_dev_x7e6")
      .select(col("med").as("mad"))
    dev.crossJoin(broadcast(mad))
      .select(col("day_ord"), col("n_events"), col("resid_x7e6"),
        col("abs_dev_x7e6"),
        when(col("mad") > 0,
          expr("(abs_dev_x7e6 * 10000) div mad")).as("z_x1e4"),
        when(col("mad") > 0,
          when(expr("(abs_dev_x7e6 * 10000) div mad") > 25000L, 1L)
            .otherwise(0L)).as("anomaly"))
  }

  val seasonalAnomalyOracle: String = s"""
    WITH dec AS ($seasonalDecomposeOracle),
    interior AS (
      SELECT day_ord, n_events, resid_x7e6 FROM dec
      WHERE resid_x7e6 IS NOT NULL),
    nn AS (SELECT COUNT(*) AS n_days FROM interior),
    med AS (
      SELECT resid_x7e6 AS med FROM (
        SELECT resid_x7e6, ROW_NUMBER() OVER (
          ORDER BY resid_x7e6 ASC, day_ord ASC) AS rn
        FROM interior) CROSS JOIN nn
      WHERE rn = (n_days + 1) // 2),
    dev AS (
      SELECT day_ord, n_events, resid_x7e6,
        ABS(resid_x7e6 - med) AS abs_dev_x7e6
      FROM interior CROSS JOIN med),
    mad AS (
      SELECT abs_dev_x7e6 AS mad FROM (
        SELECT abs_dev_x7e6, day_ord, ROW_NUMBER() OVER (
          ORDER BY abs_dev_x7e6 ASC, day_ord ASC) AS rn
        FROM dev) CROSS JOIN nn
      WHERE rn = (n_days + 1) // 2)
    SELECT day_ord, n_events, resid_x7e6, abs_dev_x7e6,
      CASE WHEN mad > 0 THEN (abs_dev_x7e6 * 10000) // mad END AS z_x1e4,
      CASE WHEN mad > 0 THEN
        CASE WHEN (abs_dev_x7e6 * 10000) // mad > 25000 THEN 1 ELSE 0 END
        END AS anomaly
    FROM dev CROSS JOIN mad"""

  private val SketchBins = 32
  private val BinWidth = 16L // covers value ∈ [0, 512); overflow clamps to top bin

  /** Mergeable quantile sketch with a 7-day sliding merge — the
    * [[EventOps]] hll_window_merge discipline applied to QUANTILES: the
    * per-(type, day) state is a fixed 32-bin equi-width histogram
    * (mergeable by pure addition, 32 BIGINTs at any row count), the
    * window merge is a RANGE-framed sum per bin over the integer day
    * ordinal, and p50/p95 read the merged histogram at nearest-bin
    * resolution. This is the t-digest/KLL role with a deterministic
    * construction, so BOTH engines build bit-identical sketches and the
    * oracle hash covers even the approximation error (the
    * bloom_skipping_audit trick). The dense day×bin grid is
    * metadata-scale (|type-days|·32), never corpus-scale; the raw data
    * shuffles ONCE into the daily histograms.
    */
  def quantileSketchMerge(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .select(col("event_type"),
        expr(s"ts div $NsPerDay").as("day_ord"),
        when(col("value") < 0, lit(0L))
          .when(col("value") >= SketchBins * BinWidth, lit(SketchBins - 1L))
          .otherwise(floor(col("value") / BinWidth).cast("bigint")).as("bin"))
      .groupBy(col("event_type"), col("day_ord"), col("bin"))
      .agg(count(lit(1)).as("cnt"))
    val grid = daily.select(col("event_type"), col("day_ord")).distinct()
      .select(col("event_type"), col("day_ord"),
        explode(sequence(lit(0L), lit(SketchBins - 1L))).as("bin"))
    val dense = grid.join(daily, Seq("event_type", "day_ord", "bin"), "left")
      .select(col("event_type"), col("day_ord"), col("bin"),
        coalesce(col("cnt"), lit(0L)).as("cnt"))
    val merged = dense.withColumn("mcnt",
      sum(col("cnt")).over(Window.partitionBy(col("event_type"), col("bin"))
        .orderBy(col("day_ord")).rangeBetween(-6, 0)))
    val cum = merged.withColumn("cum",
      sum(col("mcnt")).over(Window.partitionBy(col("event_type"), col("day_ord"))
        .orderBy(col("bin")).rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("tot",
        sum(col("mcnt")).over(Window.partitionBy(col("event_type"), col("day_ord"))))
    cum.groupBy(col("event_type"), col("day_ord"))
      .agg(max(col("tot")).as("n_window"),
        min(when(col("cum") * 2 >= col("tot"), col("bin"))).as("p50_bin"),
        min(when(col("cum") * 20 >= col("tot") * 19, col("bin"))).as("p95_bin"))
      .select(col("event_type"), col("day_ord"), col("n_window"),
        col("p50_bin"), (col("p50_bin") * BinWidth).as("p50_lo"),
        col("p95_bin"), (col("p95_bin") * BinWidth).as("p95_lo"))
  }

  val quantileSketchMergeOracle: String = s"""
    WITH daily AS (
      SELECT event_type, EPOCH_NS(ts) // $NsPerDay AS day_ord,
        CASE WHEN value < 0 THEN 0
          WHEN value >= ${SketchBins * BinWidth} THEN ${SketchBins - 1}
          ELSE CAST(FLOOR(value / $BinWidth) AS BIGINT) END AS bin,
        COUNT(*) AS cnt
      FROM events GROUP BY 1, 2, 3),
    grid AS (
      SELECT td.event_type, td.day_ord, CAST(r.range AS BIGINT) AS bin
      FROM (SELECT DISTINCT event_type, day_ord FROM daily) td
      CROSS JOIN range(0, $SketchBins) r),
    dense AS (
      SELECT g.event_type, g.day_ord, g.bin, COALESCE(d.cnt, 0) AS cnt
      FROM grid g LEFT JOIN daily d
        ON g.event_type = d.event_type AND g.day_ord = d.day_ord AND g.bin = d.bin),
    merged AS (
      SELECT event_type, day_ord, bin,
        SUM(cnt) OVER (PARTITION BY event_type, bin ORDER BY day_ord
          RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS mcnt
      FROM dense),
    cum AS (
      SELECT event_type, day_ord, bin,
        SUM(mcnt) OVER (PARTITION BY event_type, day_ord ORDER BY bin
          ROWS UNBOUNDED PRECEDING) AS cum,
        SUM(mcnt) OVER (PARTITION BY event_type, day_ord) AS tot
      FROM merged)
    SELECT event_type, day_ord, CAST(MAX(tot) AS BIGINT) AS n_window,
      MIN(CASE WHEN cum * 2 >= tot THEN bin END) AS p50_bin,
      MIN(CASE WHEN cum * 2 >= tot THEN bin END) * $BinWidth AS p50_lo,
      MIN(CASE WHEN cum * 20 >= tot * 19 THEN bin END) AS p95_bin,
      MIN(CASE WHEN cum * 20 >= tot * 19 THEN bin END) * $BinWidth AS p95_lo
    FROM cum GROUP BY 1, 2"""

  /** Per-user Gini impurity of the event-type mix, 1 − Σp² — the
    * entropy-style behavioral-diversity score WITHOUT entropy's libm
    * log: with integer type counts it is exactly (n² − Σn_t²)·1e6 ÷ n²
    * in BIGINTs, so both engines agree to the last ppm. 0 = all one
    * type (scripted monotony — feeds the [[botDetect]] rule family),
    * max (T−1)/T = uniform mix. Two map-side-combinable aggregates.
    */
  def behaviorGini(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("nt"))
      .groupBy(col("user_id"))
      .agg(sum(col("nt")).as("n_events"),
        count(lit(1)).as("n_types"),
        sum(col("nt") * col("nt")).as("sum_sq"))
      .select(col("user_id"), col("n_events"), col("n_types"),
        expr("((n_events * n_events - sum_sq) * 1000000) div (n_events * n_events)")
          .as("gini_ppm"))

  val behaviorGiniOracle: String = """
    WITH t AS (
      SELECT user_id, event_type, COUNT(*) AS nt
      FROM events GROUP BY 1, 2),
    u AS (
      SELECT user_id, CAST(SUM(nt) AS BIGINT) AS n_events,
        COUNT(*) AS n_types, CAST(SUM(nt * nt) AS BIGINT) AS sum_sq
      FROM t GROUP BY 1)
    SELECT user_id, n_events, n_types,
      ((n_events * n_events - sum_sq) * 1000000) // (n_events * n_events)
        AS gini_ppm
    FROM u"""

  /** Value-distribution drift per event type between the first and
    * second halves of the observed span, as TOTAL-VARIATION distance —
    * the PSI role without PSI's logarithm: both halves histogram into
    * the [[quantileSketchMerge]] 32-bin grid, per-bin shares floor to
    * integer ppm (deterministic in both engines AND scale-safe — the
    * cross-multiplied exact form n1·N2 − n2·N1 overflows BIGINT once
    * half-counts pass ~3e9), and TVD_ppm = Σ|p1 − p2| ÷ 2 over ppm
    * ints. The split day is (min+max+1)÷2 of the integer day ordinal —
    * derived from the data, no wall-clock. Reports the worst bin per
    * type (tie → lowest bin). One corpus aggregate into the
    * (type, half, bin) grid; everything after runs on ≤ 2·32·|types|
    * rows.
    */
  def driftTvd(spark: SparkSession, dir: String): DataFrame = {
    val days = Tables.events(spark, dir)
      .select(expr(s"ts div $NsPerDay").as("day_ord"), col("event_type"),
        when(col("value") < 0, lit(0L))
          .when(col("value") >= SketchBins * BinWidth, lit(SketchBins - 1L))
          .otherwise(floor(col("value") / BinWidth).cast("bigint")).as("bin"))
    val split = days.agg(
      expr("(min(day_ord) + max(day_ord) + 1) div 2").as("split_day"))
    val halves = days.crossJoin(broadcast(split))
      .groupBy(col("event_type"), col("bin"))
      .agg(sum(when(col("day_ord") < col("split_day"), 1L).otherwise(0L)).as("n1"),
        sum(when(col("day_ord") >= col("split_day"), 1L).otherwise(0L)).as("n2"))
    // empty-half guard: a single-day observed span puts every row in the
    // second half (sum(n1) = 0) — Spark's div would yield NULL while
    // DuckDB's // errors, so both engines pin the share to 0 explicitly
    val ppm = halves
      .withColumn("p1_ppm", expr("case when sum(n1) over " +
        "(partition by event_type) = 0 then 0 else (n1 * 1000000) div " +
        "(sum(n1) over (partition by event_type)) end"))
      .withColumn("p2_ppm", expr("case when sum(n2) over " +
        "(partition by event_type) = 0 then 0 else (n2 * 1000000) div " +
        "(sum(n2) over (partition by event_type)) end"))
      .withColumn("adiff", abs(col("p1_ppm") - col("p2_ppm")))
    val agg = ppm.groupBy(col("event_type"))
      .agg(sum(col("n1")).as("n_first"), sum(col("n2")).as("n_second"),
        expr("sum(adiff) div 2").as("tvd_ppm"),
        max(col("adiff")).as("worst_bin_dppm"))
    // worst bin = lowest bin attaining the max |Δppm| — a join-back on
    // the |types|-row aggregate (identical formulation both engines;
    // struct-argmax is not portable to the oracle)
    agg.join(ppm.select(col("event_type"), col("bin"),
        col("adiff").as("worst_bin_dppm")), Seq("event_type", "worst_bin_dppm"))
      .groupBy(col("event_type"), col("n_first"), col("n_second"),
        col("tvd_ppm"), col("worst_bin_dppm"))
      .agg(min(col("bin")).as("worst_bin"))
      .select(col("event_type"), col("n_first"), col("n_second"),
        col("tvd_ppm"), col("worst_bin"), col("worst_bin_dppm"))
  }

  val driftTvdOracle: String = s"""
    WITH days AS (
      SELECT EPOCH_NS(ts) // $NsPerDay AS day_ord, event_type,
        CASE WHEN value < 0 THEN 0
          WHEN value >= ${SketchBins * BinWidth} THEN ${SketchBins - 1}
          ELSE CAST(FLOOR(value / $BinWidth) AS BIGINT) END AS bin
      FROM events),
    sp AS (SELECT (MIN(day_ord) + MAX(day_ord) + 1) // 2 AS split_day FROM days),
    halves AS (
      SELECT event_type, bin,
        CAST(SUM(CASE WHEN day_ord < split_day THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        CAST(SUM(CASE WHEN day_ord >= split_day THEN 1 ELSE 0 END) AS BIGINT) AS n2
      FROM days CROSS JOIN sp GROUP BY 1, 2),
    ppm AS (
      SELECT event_type, bin, n1, n2,
        CASE WHEN CAST(SUM(n1) OVER (PARTITION BY event_type) AS BIGINT) = 0
          THEN 0 ELSE (n1 * 1000000)
            // CAST(SUM(n1) OVER (PARTITION BY event_type) AS BIGINT) END
          AS p1_ppm,
        CASE WHEN CAST(SUM(n2) OVER (PARTITION BY event_type) AS BIGINT) = 0
          THEN 0 ELSE (n2 * 1000000)
            // CAST(SUM(n2) OVER (PARTITION BY event_type) AS BIGINT) END
          AS p2_ppm
      FROM halves),
    ad AS (
      SELECT event_type, bin, n1, n2, ABS(p1_ppm - p2_ppm) AS adiff FROM ppm),
    agg AS (
      SELECT event_type,
        CAST(SUM(n1) AS BIGINT) AS n_first,
        CAST(SUM(n2) AS BIGINT) AS n_second,
        CAST(SUM(adiff) AS BIGINT) // 2 AS tvd_ppm,
        MAX(adiff) AS worst_bin_dppm
      FROM ad GROUP BY 1)
    SELECT g.event_type, g.n_first, g.n_second, g.tvd_ppm,
      MIN(a.bin) AS worst_bin, g.worst_bin_dppm
    FROM agg g JOIN ad a
      ON a.event_type = g.event_type AND a.adiff = g.worst_bin_dppm
    GROUP BY 1, 2, 3, 4, 6"""

  /** Pairwise audience overlap between event types via 64-bit BITMAP
    * words — the roaring/bitmap-index mechanism for exact distinct-set
    * intersection WITHOUT re-shuffling raw ids per pair: each type's
    * user set compresses into (word_idx = id÷32, word = OR of 1<<id%32 — 32 bits per BIGINT word: bit 63 would trip DuckDB's checked shift)
    * rows — \|users\|/32 rows per type at any event volume — and every
    * pairwise intersection is a word_idx equi-join with
    * bit_count(wa & wb) popcounts. The raw corpus shuffles ONCE into
    * the bitmap; the T² pair sweep runs entirely on bitmap-scale rows
    * (vs the naive per-pair distinct-join that re-shuffles the corpus
    * C(T,2) times). Jaccard in exact integer ppm by
    * inclusion-exclusion. Words stay in the non-negative 32-bit range, so popcount
    * agrees across engines with no sign-bit caveat.
    */
  def bitmapOverlap(spark: SparkSession, dir: String): DataFrame = {
    val words = Tables.events(spark, dir)
      .select(col("event_type"), col("user_id")).distinct()
      .groupBy(col("event_type"), expr("user_id div 32").as("word_idx"))
      .agg(expr("bit_or(shiftleft(1L, cast(user_id % 32 as int)))").as("word"))
    val sizes = words.groupBy(col("event_type"))
      .agg(sum(bit_count(col("word")).cast("bigint")).as("n_users"))
    val a = words.select(col("event_type").as("type_a"), col("word_idx"),
      col("word").as("wa"))
    val b = words.select(col("event_type").as("type_b"), col("word_idx"),
      col("word").as("wb"))
    a.join(b, Seq("word_idx")).filter(col("type_a") < col("type_b"))
      .groupBy(col("type_a"), col("type_b"))
      .agg(sum(bit_count(col("wa").bitwiseAND(col("wb"))).cast("bigint"))
        .as("n_common"))
      .join(Tables.stateHint(sizes.select(col("event_type").as("type_a"),
        col("n_users").as("n_a"))), Seq("type_a"))
      .join(Tables.stateHint(sizes.select(col("event_type").as("type_b"),
        col("n_users").as("n_b"))), Seq("type_b"))
      .select(col("type_a"), col("type_b"), col("n_a"), col("n_b"), col("n_common"),
        expr("(n_common * 1000000) div (n_a + n_b - n_common)").as("jaccard_ppm"))
  }

  val bitmapOverlapOracle: String = """
    WITH du AS (SELECT DISTINCT event_type, user_id FROM events),
    words AS (
      SELECT event_type, user_id // 32 AS word_idx,
        BIT_OR(1::BIGINT << CAST(user_id % 32 AS INT)) AS word
      FROM du GROUP BY 1, 2),
    sizes AS (
      SELECT event_type, CAST(SUM(BIT_COUNT(word)) AS BIGINT) AS n_users
      FROM words GROUP BY 1),
    ov AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
        CAST(SUM(BIT_COUNT(a.word & b.word)) AS BIGINT) AS n_common
      FROM words a JOIN words b
        ON a.word_idx = b.word_idx AND a.event_type < b.event_type
      GROUP BY 1, 2)
    SELECT type_a, type_b, sa.n_users AS n_a, sb.n_users AS n_b, n_common,
      (n_common * 1000000) // (sa.n_users + sb.n_users - n_common) AS jaccard_ppm
    FROM ov JOIN sizes sa ON type_a = sa.event_type
    JOIN sizes sb ON type_b = sb.event_type"""

  /** Seasonal-naive forecast backtest per event type: forecast(day) =
    * count(day − 7) (the [[dowSeasonality]] profile's operational
    * consequence), scored as WAPE = Σ|actual − forecast| ÷ Σactual in
    * integer ppm against the lag-1 naive baseline — the accuracy-gate
    * evidence that weekly seasonality is real signal (lag-7 beats
    * lag-1) before a forecasting layer ships. Lag over the OBSERVED
    * day grid with an exact day-distance guard (a missing day must not
    * silently become "yesterday"). All-integer: counts, absolute
    * errors, and both WAPEs are BIGINT arithmetic. One corpus shuffle
    * into the (type, day) grid; lags and folds run on the grid.
    */
  def forecastBacktest(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("day_ord"))
    val daily = Tables.events(spark, dir)
      .groupBy(col("event_type"), expr(s"ts div $NsPerDay").as("day_ord"))
      .agg(count(lit(1)).as("n"))
    val lagged = daily
      .withColumn("d1", lag(col("day_ord"), 1).over(w))
      .withColumn("n1", lag(col("n"), 1).over(w))
      .withColumn("d7", lag(col("day_ord"), 7).over(w))
      .withColumn("n7", lag(col("n"), 7).over(w))
      .withColumn("f1", when(col("d1") === col("day_ord") - 1, col("n1")))
      .withColumn("f7", when(col("d7") === col("day_ord") - 7, col("n7")))
      .filter(col("f1").isNotNull && col("f7").isNotNull)
    lagged.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days_scored"),
        sum(col("n")).as("total_actual"),
        sum(abs(col("n") - col("f7"))).as("abs_err_lag7"),
        sum(abs(col("n") - col("f1"))).as("abs_err_lag1"))
      .select(col("event_type"), col("n_days_scored"), col("total_actual"),
        expr("(abs_err_lag7 * 1000000) div total_actual").as("wape_lag7_ppm"),
        expr("(abs_err_lag1 * 1000000) div total_actual").as("wape_lag1_ppm"))
  }

  val forecastBacktestOracle: String = s"""
    WITH daily AS (
      SELECT event_type, EPOCH_NS(ts) // $NsPerDay AS day_ord, COUNT(*) AS n
      FROM events GROUP BY 1, 2),
    lagged AS (
      SELECT event_type, day_ord, n,
        CASE WHEN LAG(day_ord, 1) OVER w = day_ord - 1
          THEN LAG(n, 1) OVER w END AS f1,
        CASE WHEN LAG(day_ord, 7) OVER w = day_ord - 7
          THEN LAG(n, 7) OVER w END AS f7
      FROM daily
      WINDOW w AS (PARTITION BY event_type ORDER BY day_ord))
    SELECT event_type, COUNT(*) AS n_days_scored,
      CAST(SUM(n) AS BIGINT) AS total_actual,
      (CAST(SUM(ABS(n - f7)) AS BIGINT) * 1000000)
        // CAST(SUM(n) AS BIGINT) AS wape_lag7_ppm,
      (CAST(SUM(ABS(n - f1)) AS BIGINT) * 1000000)
        // CAST(SUM(n) AS BIGINT) AS wape_lag1_ppm
    FROM lagged WHERE f1 IS NOT NULL AND f7 IS NOT NULL
    GROUP BY 1"""

  /** Weekly cohort LTV curve: signup cohort (first-touch week) × age in
    * weeks → active users, exact-cents value, and the cohort's
    * CUMULATIVE value per member (the lifetime-value curve finance
    * reads; [[graft.operators.EventOps]] retention_cohorts is the
    * count-only daily twin). Week = day_ord ÷ 7 — pure integer epoch
    * arithmetic. Cumulative cents via a running window over the ≤
    * (weeks²) cohort grid; per-member ppm-cents is one floor division
    * of exact BIGINTs. Two corpus-keyed shuffles (first-touch fold,
    * cohort-cell fold); everything after runs on the grid.
    */
  def cohortLtv(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), expr(s"ts div ($NsPerDay * 7)").as("week"),
        floor(col("value") * 100 + lit(0.5)).cast("bigint").as("cents"))
    val firstTouch = ev.groupBy(col("user_id")).agg(min(col("week")).as("cohort"))
    val sizes = firstTouch.groupBy(col("cohort")).agg(count(lit(1)).as("cohort_users"))
    val cells = ev.join(Tables.stateHint(firstTouch), Seq("user_id"))
      .groupBy(col("cohort"), (col("week") - col("cohort")).as("age_weeks"))
      .agg(countDistinct(col("user_id")).as("active_users"),
        sum(col("cents")).as("week_cents"))
    val wc = Window.partitionBy(col("cohort")).orderBy(col("age_weeks"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cells
      .withColumn("cum_cents", sum(col("week_cents")).over(wc))
      .join(Tables.stateHint(sizes), Seq("cohort"))
      .select(col("cohort"), col("age_weeks"), col("active_users"),
        col("week_cents"), col("cum_cents"), col("cohort_users"),
        expr("cum_cents div cohort_users").as("ltv_cents_per_user"))
  }

  val cohortLtvOracle: String = s"""
    WITH ev AS (
      SELECT user_id, EPOCH_NS(ts) // ($NsPerDay * 7) AS week,
        CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents
      FROM events),
    ft AS (SELECT user_id, MIN(week) AS cohort FROM ev GROUP BY 1),
    sizes AS (SELECT cohort, COUNT(*) AS cohort_users FROM ft GROUP BY 1),
    cells AS (
      SELECT ft.cohort, ev.week - ft.cohort AS age_weeks,
        COUNT(DISTINCT ev.user_id) AS active_users,
        CAST(SUM(ev.cents) AS BIGINT) AS week_cents
      FROM ev JOIN ft ON ev.user_id = ft.user_id
      GROUP BY 1, 2),
    cum AS (
      SELECT cohort, age_weeks, active_users, week_cents,
        CAST(SUM(week_cents) OVER (PARTITION BY cohort ORDER BY age_weeks
          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_cents
      FROM cells)
    SELECT c.cohort, c.age_weeks, c.active_users, c.week_cents, c.cum_cents,
      s.cohort_users, c.cum_cents // s.cohort_users AS ltv_cents_per_user
    FROM cum c JOIN sizes s ON c.cohort = s.cohort"""

  private val UsPerDay = 86400L * 1000 * 1000

  /** Linear multi-touch attribution over the click→purchase path — the
    * equal-credit complement of the last-touch purchase_attribution:
    * each purchase splits 1e6 ppm of credit equally over the user's
    * clicks in the PRECEDING 24 h (k clicks → 1e6 ÷ k each, exact floor
    * division), rolled up per purchase day with the floor loss made
    * explicit (k·(1e6÷k) ≤ 1e6 — auditable rounding, not silent).
    * Credited-click counts come from the mirror frame (clicks with a
    * purchase in the FOLLOWING 24 h).
    *
    * Scale: NO event self-join — both directions are RANGE-framed
    * window counts over the (user, µs-time) ordering (the
    * conversion_latency decorrelation discipline): the corpus shuffles
    * once on user_id, every frame is time-bounded state.
    */
  def attributionLinear(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("t_us"))
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), expr("ts div 1000").as("t_us"),
        expr(s"ts div $NsPerDay").as("day_ord"))
      .withColumn("is_click", when(col("event_type") === "click", 1L).otherwise(0L))
      .withColumn("is_purchase",
        when(col("event_type") === "purchase", 1L).otherwise(0L))
    val framed = ev
      .withColumn("k_clicks_before",
        sum(col("is_click")).over(byUser.rangeBetween(-UsPerDay, 0)))
      .withColumn("purchases_after",
        sum(col("is_purchase")).over(byUser.rangeBetween(0, UsPerDay)))
    val purchases = framed.filter(col("is_purchase") === 1)
      .groupBy(col("day_ord"))
      .agg(count(lit(1)).as("n_purchases"),
        sum(when(col("k_clicks_before") > 0, 1L).otherwise(0L)).as("n_attributed"),
        sum(when(col("k_clicks_before") > 0,
          col("k_clicks_before") * expr("1000000 div k_clicks_before"))
          .otherwise(0L)).as("credit_recovered_ppm"))
    val clicks = framed.filter(col("is_click") === 1)
      .groupBy(col("day_ord"))
      .agg(sum(when(col("purchases_after") > 0, 1L).otherwise(0L))
        .as("n_clicks_credited"))
    purchases.join(clicks, Seq("day_ord"), "left")
      .select(col("day_ord"), col("n_purchases"), col("n_attributed"),
        col("credit_recovered_ppm"),
        (col("n_attributed") * 1000000L - col("credit_recovered_ppm"))
          .as("floor_loss_ppm"),
        coalesce(col("n_clicks_credited"), lit(0L)).as("n_clicks_credited"))
  }

  val attributionLinearOracle: String = s"""
    WITH ev AS (
      SELECT user_id, event_type, EPOCH_US(ts) AS t_us,
        EPOCH_NS(ts) // $NsPerDay AS day_ord,
        CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS is_click,
        CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_purchase
      FROM events),
    framed AS (
      SELECT *,
        CAST(SUM(is_click) OVER (PARTITION BY user_id ORDER BY t_us
          RANGE BETWEEN $UsPerDay PRECEDING AND CURRENT ROW) AS BIGINT)
          AS k_clicks_before,
        CAST(SUM(is_purchase) OVER (PARTITION BY user_id ORDER BY t_us
          RANGE BETWEEN CURRENT ROW AND $UsPerDay FOLLOWING) AS BIGINT)
          AS purchases_after
      FROM ev),
    p AS (
      SELECT day_ord, COUNT(*) AS n_purchases,
        CAST(SUM(CASE WHEN k_clicks_before > 0 THEN 1 ELSE 0 END) AS BIGINT)
          AS n_attributed,
        CAST(SUM(CASE WHEN k_clicks_before > 0
          THEN k_clicks_before * (1000000 // k_clicks_before) ELSE 0 END)
          AS BIGINT) AS credit_recovered_ppm
      FROM framed WHERE is_purchase = 1 GROUP BY 1),
    c AS (
      SELECT day_ord,
        CAST(SUM(CASE WHEN purchases_after > 0 THEN 1 ELSE 0 END) AS BIGINT)
          AS n_clicks_credited
      FROM framed WHERE is_click = 1 GROUP BY 1)
    SELECT p.day_ord, p.n_purchases, p.n_attributed, p.credit_recovered_ppm,
      p.n_attributed * 1000000 - p.credit_recovered_ppm AS floor_loss_ppm,
      COALESCE(c.n_clicks_credited, 0) AS n_clicks_credited
    FROM p LEFT JOIN c ON p.day_ord = c.day_ord"""

  /** Daily-count autocorrelation function per event type, lags 1-7 —
    * the seasonality DETECTOR feeding [[dowSeasonality]] (which assumes
    * weekly structure) and [[forecastBacktest]] (which exploits it): a
    * lag-7 spike is the measured evidence the weekly model is right.
    * Exact integers end to end: with S = Σx and n days, the centered
    * cross-product Σ(n·x_t − S)(n·x_{t−k} − S) over the OBSERVED
    * contiguous pairs is BIGINT (never a float mean), and
    * acf_ppm = num·1e6 ÷ den uses the lag-0 denominator of the same
    * scaled form. Gaps guard by exact day distance (a missing day
    * never silently pairs). One corpus shuffle into the daily grid;
    * the 7 lag windows share its type partitioning.
    */
  def acfDaily(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .groupBy(col("event_type"), expr(s"ts div $NsPerDay").as("day_ord"))
      .agg(count(lit(1)).as("x"))
    val stats = daily.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("s"),
        sum(col("x") * col("x")).as("sx2"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day_ord"))
    var lagged = daily
    for (k <- 1 to 7) {
      lagged = lagged
        .withColumn(s"d$k", lag(col("day_ord"), k).over(w))
        .withColumn(s"x$k",
          when(col(s"d$k") === col("day_ord") - k, lag(col("x"), k).over(w)))
    }
    val aggCols = (1 to 7).map(k =>
      sum(col("x") * col(s"x$k")).as(s"sxy$k")) ++
      (1 to 7).map(k => sum(when(col(s"x$k").isNotNull, col("x"))).as(s"sa$k")) ++
      (1 to 7).map(k => sum(col(s"x$k")).as(s"sb$k")) ++
      (1 to 7).map(k => count(col(s"x$k")).as(s"m$k"))
    val nums = lagged.groupBy(col("event_type"))
      .agg(aggCols.head, aggCols.tail: _*)
    // centered num over observed pairs: m·Σxy − Σa·Σb (the two-sample
    // centering — robust to gaps); den: n·Σx² − S² (lag-0, full series)
    val perLag = (1 to 7).map { k =>
      nums.select(col("event_type"), lit(k.toLong).as("lag"),
        (col(s"m$k") * col(s"sxy$k") - col(s"sa$k") * col(s"sb$k")).as("num"),
        col(s"m$k").as("n_pairs"))
    }.reduce(_ unionByName _)
    perLag.join(Tables.stateHint(stats), Seq("event_type"))
      .select(col("event_type"), col("lag"), col("n_pairs"),
        when(col("n") * col("sx2") - col("s") * col("s") === 0, lit(0L))
          .otherwise(expr("(num * 1000000) div (n * sx2 - s * s)"))
          .as("acf_ppm"))
  }

  val acfDailyOracle: String = {
    val lagCols = (1 to 7).map { k =>
      s"""CASE WHEN LAG(day_ord, $k) OVER w = day_ord - $k
        THEN LAG(x, $k) OVER w END AS x$k"""
    }.mkString(",\n        ")
    val branches = (1 to 7).map { k =>
      s"""SELECT event_type, $k AS lag,
        CAST(COUNT(x$k) AS BIGINT) AS n_pairs,
        CAST(COUNT(x$k) AS BIGINT) * CAST(SUM(x * x$k) AS BIGINT)
          - CAST(SUM(CASE WHEN x$k IS NOT NULL THEN x END) AS BIGINT)
            * CAST(SUM(x$k) AS BIGINT) AS num
      FROM lagged GROUP BY 1"""
    }.mkString("\n      UNION ALL ")
    s"""
    WITH daily AS (
      SELECT event_type, EPOCH_NS(ts) // $NsPerDay AS day_ord, COUNT(*) AS x
      FROM events GROUP BY 1, 2),
    stats AS (
      SELECT event_type, COUNT(*) AS n, CAST(SUM(x) AS BIGINT) AS s,
        CAST(SUM(x * x) AS BIGINT) AS sx2
      FROM daily GROUP BY 1),
    lagged AS (
      SELECT event_type, day_ord, x,
        $lagCols
      FROM daily WINDOW w AS (PARTITION BY event_type ORDER BY day_ord)),
    perlag AS (
      $branches)
    SELECT p.event_type, p.lag, p.n_pairs,
      CASE WHEN st.n * st.sx2 - st.s * st.s = 0 THEN 0
        ELSE (p.num * 1000000) // (st.n * st.sx2 - st.s * st.s) END AS acf_ppm
    FROM perlag p JOIN stats st ON p.event_type = st.event_type"""
  }

  /** Fano factor (index of dispersion, σ²/μ) of the daily count series
    * per event type — the overdispersion audit that decides which
    * anomaly model applies: ≈1e6 ⇒ Poisson-like traffic (count
    * thresholds work), ≫1e6 ⇒ bursty/clumped ([[EventOps]]'
    * burst_detect's regime). Exact: population variance via the moment
    * identity, the two floor divisions chained identically in both
    * engines — fano_ppm = ((n·Σx² − S²) ÷ n) · 1e6 ÷ S with all
    * quantities BIGINT. One corpus shuffle into the daily grid.
    */
  def fanoFactor(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"), expr(s"ts div $NsPerDay").as("day_ord"))
      .agg(count(lit(1)).as("x"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"), sum(col("x")).as("s"),
        sum(col("x") * col("x")).as("sx2"))
      .select(col("event_type"), col("n_days"), col("s").as("n_events"),
        expr("(((n_days * sx2 - s * s) div n_days) * 1000000) div s")
          .as("fano_ppm"))

  val fanoFactorOracle: String = s"""
    WITH daily AS (
      SELECT event_type, EPOCH_NS(ts) // $NsPerDay AS day_ord, COUNT(*) AS x
      FROM events GROUP BY 1, 2),
    m AS (
      SELECT event_type, COUNT(*) AS n_days, CAST(SUM(x) AS BIGINT) AS s,
        CAST(SUM(x * x) AS BIGINT) AS sx2
      FROM daily GROUP BY 1)
    SELECT event_type, n_days, s AS n_events,
      (((n_days * sx2 - s * s) // n_days) * 1000000) // s AS fano_ppm
    FROM m"""

  /** Daily novelty: new-vs-returning user split per day — the growth
    * metric behind "is traffic new demand or the same cohort?": a
    * user's FIRST day (min day over their events, the first-touch fold
    * retention_cohorts/cohort_ltv share) marks them new exactly once;
    * every day reports events, active users, new users, and the new
    * share in exact ppm. Two corpus-keyed shuffles (first-touch, daily
    * fold); the join back rides the broadcast state hint.
    */
  def dailyNovelty(spark: SparkSession, dir: String): DataFrame = {
    val withDay = Tables.events(spark, dir)
      .select(col("user_id"), expr(s"ts div $NsPerDay").as("day_ord"))
    val firstTouch = withDay.groupBy(col("user_id"))
      .agg(min(col("day_ord")).as("first_day"))
    withDay.join(Tables.stateHint(firstTouch), Seq("user_id"))
      .groupBy(col("day_ord"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_active"),
        countDistinct(when(col("first_day") === col("day_ord"),
          col("user_id"))).as("n_new"))
      .withColumn("new_share_ppm", expr("(n_new * 1000000) div n_active"))
  }

  val dailyNoveltyOracle: String = s"""
    WITH wd AS (
      SELECT user_id, EPOCH_NS(ts) // $NsPerDay AS day_ord FROM events),
    ft AS (SELECT user_id, MIN(day_ord) AS first_day FROM wd GROUP BY 1)
    SELECT day_ord, COUNT(*) AS n_events,
      COUNT(DISTINCT wd.user_id) AS n_active,
      COUNT(DISTINCT CASE WHEN ft.first_day = wd.day_ord
        THEN wd.user_id END) AS n_new,
      (COUNT(DISTINCT CASE WHEN ft.first_day = wd.day_ord
        THEN wd.user_id END) * 1000000)
        // COUNT(DISTINCT wd.user_id) AS new_share_ppm
    FROM wd JOIN ft ON wd.user_id = ft.user_id
    GROUP BY 1"""

  /** User-activity concentration deciles — the 1/9/90 audit: users
    * NTILE'd into 10 activity deciles (by event count, user-id
    * tiebreak — identical NTILE semantics both engines), each decile
    * reporting its user count, event mass, and share in exact ppm; the
    * top decile's share is the "do power users carry the corpus?"
    * number ([[graft.operators.StatTests]] gini_concentration is the
    * scalar twin on revenue). The decile assignment is the exact
    * two-level NTILE ([[graft.functions.Ranks]], cells = 1024
    * activity-count ranges from the broadcast [min, max] span, DESC by
    * construction — bounded even when per-user counts are near-unique),
    * so even the user-scale frame (10⁹ users at corpus scale) never
    * funnels through a single-reducer window; the only global window
    * left runs on the 10-row decile profile.
    */
  def userConcentration(spark: SparkSession, dir: String): DataFrame = {
    // checkpointed (the rfm_segmentation treatment): the per-user frame
    // is user-scale, and both the span probe and Ranks' documented
    // triple read consume it — without materialization the events
    // aggregate would run four times.
    val perUser = graft.functions.Iterate.checkpoint(
      Tables.events(spark, dir)
        .groupBy(col("user_id")).agg(count(lit(1)).as("n")))
    val tot = perUser.agg(count(lit(1)).as("__n_total"),
      min(col("n")).as("__nmin"), max(col("n")).as("__nmax"))
    graft.functions.Ranks.withNtile(
        graft.functions.Ranks.withGlobalRank(
          perUser.crossJoin(broadcast(tot)), "__grank",
          expr("((__nmax - n) * 1024) div (__nmax - __nmin + 1)"),
          Seq(col("n").desc, col("user_id").asc)),
        "decile_raw", "__grank", "__n_total", 10)
      .withColumn("decile", col("decile_raw").cast("long"))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n_users"), sum(col("n")).as("n_events"))
      .withColumn("events_share_ppm",
        expr("(n_events * 1000000) div (sum(n_events) over ())"))
  }

  val userConcentrationOracle: String = """
    WITH pu AS (
      SELECT user_id, COUNT(*) AS n FROM events GROUP BY 1),
    d AS (
      SELECT user_id, n,
        CAST(NTILE(10) OVER (ORDER BY n DESC, user_id ASC) AS BIGINT)
          AS decile
      FROM pu),
    g AS (
      SELECT decile, COUNT(*) AS n_users, CAST(SUM(n) AS BIGINT) AS n_events
      FROM d GROUP BY 1)
    SELECT decile, n_users, n_events,
      (n_events * 1000000) // CAST(SUM(n_events) OVER () AS BIGINT)
        AS events_share_ppm
    FROM g"""

  /** DAU/MAU stickiness per day — the engagement ratio product teams
    * steer by — with the trailing-28-day MAU computed from the
    * [[bitmapOverlap]] 32-bit WORD encoding instead of a sliding
    * distinct (a windowed COUNT DISTINCT re-scans its whole frame per
    * day; OR-words make the trailing union a per-word bit_or window
    * over \|users\|/32-scale rows, then MAU = Σ popcount). DAU is the
    * exact per-day distinct from the same words. Exact integers; one
    * corpus shuffle into the (day, word) bitmap.
    */
  /** Daily growth accounting — every active user classified NEW /
    * RETAINED / RESURRECTED per day, plus the CHURNED count (active
    * yesterday, silent today), the standard growth ledger
    * ([[retentionCohorts]] follows a cohort forward; this reads one
    * day across all cohorts — the DAU delta decomposed into the four
    * flows a growth chart is made of, with n_active ≡ new + retained
    * + resurrected as a built-in reconciliation). All-integer: the
    * per-(user, day) active frame takes one distinct aggregate, then
    * LAG of the previous active day per user classifies each user-day
    * locally (prev = d−1 → retained; no prev → new; prev < d−1 →
    * resurrected); CHURN needs no second corpus pass at all — it is
    * the ledger identity churn(d) = active(d−1) − retained(d), read
    * off the zero-filled calendar spine via a day−1 self-join (the
    * first day churns nobody by construction, and the censored
    * last-plus-one day is simply not on the spine). A fully-silent
    * day reports explicit zeros. Scale: one shuffle of the distinct
    * user-days onto user_id for the lag window (partitioned BY USER —
    * never global) feeding one day-keyed aggregate; everything after
    * is calendar-scale.
    */
  def growthAccounting(spark: SparkSession, dir: String): DataFrame = {
    val ud = Tables.events(spark, dir)
      .select(expr(s"ts div $NsPerDay").as("day_ord"), col("user_id"))
      .distinct()
    val wu = Window.partitionBy(col("user_id")).orderBy(col("day_ord").asc)
    val flows = ud
      .withColumn("prev_d", lag(col("day_ord"), 1).over(wu))
      .groupBy(col("day_ord"))
      .agg(count(lit(1)).as("n_active"),
        sum(when(col("prev_d").isNull, 1L).otherwise(0L)).as("n_new"),
        sum(when(col("prev_d") === col("day_ord") - 1, 1L).otherwise(0L))
          .as("n_retained"),
        sum(when(col("prev_d").isNotNull && col("prev_d") < col("day_ord") - 1,
          1L).otherwise(0L)).as("n_resurrected"))
    val span = flows.agg(min(col("day_ord")).as("d0"),
      max(col("day_ord")).as("d1"))
    val spine = span
      .select(explode(sequence(col("d0"), col("d1"))).as("day_ord"))
    val filled = spine.join(flows, Seq("day_ord"), "left")
      .select(col("day_ord"),
        coalesce(col("n_active"), lit(0L)).as("n_active"),
        coalesce(col("n_new"), lit(0L)).as("n_new"),
        coalesce(col("n_retained"), lit(0L)).as("n_retained"),
        coalesce(col("n_resurrected"), lit(0L)).as("n_resurrected"))
    filled.join(
        filled.select((col("day_ord") + 1).as("day_ord"),
          col("n_active").as("prev_active")),
        Seq("day_ord"), "left")
      .select(col("day_ord"), col("n_active"), col("n_new"),
        col("n_retained"), col("n_resurrected"),
        (coalesce(col("prev_active"), lit(0L)) - col("n_retained"))
          .as("n_churned"))
  }

  val growthAccountingOracle: String = s"""
    WITH ud AS (
      SELECT DISTINCT EPOCH_NS(ts) // $NsPerDay AS day_ord, user_id
      FROM events),
    flows AS (
      SELECT day_ord, COUNT(*) AS n_active,
        CAST(SUM(CASE WHEN prev_d IS NULL THEN 1 ELSE 0 END) AS BIGINT)
          AS n_new,
        CAST(SUM(CASE WHEN prev_d = day_ord - 1 THEN 1 ELSE 0 END) AS BIGINT)
          AS n_retained,
        CAST(SUM(CASE WHEN prev_d IS NOT NULL AND prev_d < day_ord - 1
          THEN 1 ELSE 0 END) AS BIGINT) AS n_resurrected
      FROM (
        SELECT day_ord, user_id,
          LAG(day_ord) OVER (PARTITION BY user_id ORDER BY day_ord ASC)
            AS prev_d
        FROM ud)
      GROUP BY 1),
    span AS (SELECT MIN(day_ord) AS d0, MAX(day_ord) AS d1 FROM flows),
    spine AS (SELECT UNNEST(RANGE(d0, d1 + 1)) AS day_ord FROM span),
    filled AS (
      SELECT s.day_ord,
        COALESCE(f.n_active, 0) AS n_active,
        COALESCE(f.n_new, 0) AS n_new,
        COALESCE(f.n_retained, 0) AS n_retained,
        COALESCE(f.n_resurrected, 0) AS n_resurrected
      FROM spine s LEFT JOIN flows f ON s.day_ord = f.day_ord)
    SELECT a.day_ord, a.n_active, a.n_new, a.n_retained, a.n_resurrected,
      COALESCE(p.n_active, 0) - a.n_retained AS n_churned
    FROM filled a
    LEFT JOIN filled p ON a.day_ord = p.day_ord + 1"""

  def stickinessDauMau(spark: SparkSession, dir: String): DataFrame = {
    val words = Tables.events(spark, dir)
      .select(expr(s"ts div $NsPerDay").as("day_ord"), col("user_id")).distinct()
      .groupBy(col("day_ord"), expr("user_id div 32").as("word_idx"))
      .agg(expr("bit_or(shiftleft(1L, cast(user_id % 32 as int)))").as("word"))
    // dense (day × observed word) grid so the trailing OR window sees a
    // row per day even when a word has no new users that day
    val days = words.select(col("day_ord")).distinct()
    val idxs = words.select(col("word_idx")).distinct()
    val dense = days.crossJoin(idxs)
      .join(words, Seq("day_ord", "word_idx"), "left")
      .select(col("day_ord"), col("word_idx"),
        coalesce(col("word"), lit(0L)).as("word"))
    val merged = dense.withColumn("mword",
      expr("bit_or(word) over (partition by word_idx order by day_ord " +
        "range between 27 preceding and current row)"))
    merged.groupBy(col("day_ord"))
      .agg(sum(bit_count(col("word")).cast("bigint")).as("dau"),
        sum(bit_count(col("mword")).cast("bigint")).as("mau_28d"))
      .withColumn("stickiness_ppm", expr("(dau * 1000000) div mau_28d"))
  }

  val stickinessDauMauOracle: String = s"""
    WITH du AS (
      SELECT DISTINCT EPOCH_NS(ts) // $NsPerDay AS day_ord, user_id FROM events),
    words AS (
      SELECT day_ord, user_id // 32 AS word_idx,
        BIT_OR(1::BIGINT << CAST(user_id % 32 AS INT)) AS word
      FROM du GROUP BY 1, 2),
    dense AS (
      SELECT d.day_ord, i.word_idx, COALESCE(w.word, 0) AS word
      FROM (SELECT DISTINCT day_ord FROM words) d
      CROSS JOIN (SELECT DISTINCT word_idx FROM words) i
      LEFT JOIN words w ON w.day_ord = d.day_ord AND w.word_idx = i.word_idx),
    merged AS (
      SELECT day_ord, word,
        BIT_OR(word) OVER (PARTITION BY word_idx ORDER BY day_ord
          RANGE BETWEEN 27 PRECEDING AND CURRENT ROW) AS mword
      FROM dense)
    SELECT day_ord,
      CAST(SUM(BIT_COUNT(word)) AS BIGINT) AS dau,
      CAST(SUM(BIT_COUNT(mword)) AS BIGINT) AS mau_28d,
      (CAST(SUM(BIT_COUNT(word)) AS BIGINT) * 1000000)
        // CAST(SUM(BIT_COUNT(mword)) AS BIGINT) AS stickiness_ppm
    FROM merged GROUP BY 1"""

  /** Session bounce rate per day: the share of sessions that contain a
    * single event — the engagement-quality number next to
    * [[stickinessDauMau]]'s reach ratio. Derives from the CANONICAL
    * session frame ([[EventOps.sessionAssigned]] — the one place the
    * 30-min gap rule lives; re-deriving the rule here would fork the
    * session semantics), rolled up per session then per first-event
    * day. Exact ppm.
    */
  def bounceRate(spark: SparkSession, dir: String): DataFrame =
    EventOps.sessionAssigned(spark, dir)
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_ev"),
        expr(s"min(t_us) div ${NsPerDay / 1000}").as("day_ord"))
      .groupBy(col("day_ord"))
      .agg(count(lit(1)).as("n_sessions"),
        sum(when(col("n_ev") === 1, 1L).otherwise(0L)).as("n_bounces"))
      .withColumn("bounce_ppm", expr("(n_bounces * 1000000) div n_sessions"))

  val bounceRateOracle: String = s"""
    WITH s AS (${EventOps.sqlSessionAssigned}),
    per_session AS (
      SELECT user_id, session_id, COUNT(*) AS n_ev,
        MIN(t) // ${NsPerDay / 1000} AS day_ord
      FROM s GROUP BY 1, 2)
    SELECT day_ord, COUNT(*) AS n_sessions,
      CAST(SUM(CASE WHEN n_ev = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_bounces,
      (CAST(SUM(CASE WHEN n_ev = 1 THEN 1 ELSE 0 END) AS BIGINT) * 1000000)
        // COUNT(*) AS bounce_ppm
    FROM per_session GROUP BY 1"""

  /** Holt's linear-trend exponential smoothing of the daily event
    * series (α = 0.2, β = 0.1) — the level+trend step up from
    * [[graft.operators.EventOps]]' level-only EWMA, with the one-step-
    * ahead SSE carried through the fold so the fit is priced on the
    * same pass ([[forecastBacktest]] prices naive/seasonal-naive; this
    * adds the first real smoother to beat). Portability: exponential
    * smoothing is an inherently SEQUENTIAL recursion, so it runs as an
    * explicit left fold over the zero-filled calendar grid
    * (`aggregate` here, LIST_REDUCE in the oracle) with the SAME
    * expression tree per step in both engines — IEEE doubles in a
    * fixed evaluation order are bit-portable where a parallel float
    * reduction is not; literals are written in e-notation because
    * DuckDB parses bare decimals as DECIMAL and decimal arithmetic
    * would diverge. Scale: one corpus-keyed daily aggregate; the fold
    * runs over the calendar-bounded array (≤ span days at any corpus
    * size) in a single bounded-size aggregate — the corpus never
    * sorts, never collects.
    */
  def holtForecast(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(expr(s"ts div $NsPerDay").as("day_ord"))
    val obs = ev.groupBy(col("day_ord")).agg(count(lit(1)).as("n"))
    val daily = ev.agg(min(col("day_ord")).as("d0"), max(col("day_ord")).as("d1"))
      .select(explode(sequence(col("d0"), col("d1"))).as("day_ord"))
      .join(obs, Seq("day_ord"), "left")
      .select(col("day_ord"), coalesce(col("n"), lit(0L)).cast("double").as("v"))
    daily
      .agg(sort_array(collect_list(struct(col("day_ord"), col("v")))).as("dv"))
      .select(size(col("dv")).cast("bigint").as("n_days"),
        expr("transform(dv, p -> p.v)").as("vals"))
      .select(col("n_days"), expr("""
        aggregate(slice(vals, 2, size(vals) - 1),
          named_struct('l', element_at(vals, 1),
            't', cast(0 as double), 'sse', cast(0 as double)),
          (acc, x) -> named_struct(
            'l', 2e-1 * x + 8e-1 * (acc.l + acc.t),
            't', 1e-1 * ((2e-1 * x + 8e-1 * (acc.l + acc.t)) - acc.l)
              + 9e-1 * acc.t,
            'sse', acc.sse + (x - (acc.l + acc.t)) * (x - (acc.l + acc.t))))
        """).as("st"))
      .select(col("n_days"), col("st.l").as("level"), col("st.t").as("trend"),
        expr("st.l + 7e0 * st.t").as("forecast_7"),
        col("st.sse").as("sse_one_step"))
  }

  /** The oracle folds the same recursion through a RECURSIVE CTE
    * rather than LIST_REDUCE: DuckDB 1.0.0's LIST_REDUCE corrupts a
    * STRUCT accumulator whose fields share subexpressions across steps
    * (verified: the identical lambda applied once outside the reduce is
    * correct, the second reduce step is not) — the recursive CTE
    * carries the state as plain columns and evaluates the identical
    * expression tree per step, so the IEEE sequence matches Spark's
    * `aggregate` bit for bit.
    */
  val holtForecastOracle: String = s"""
    WITH RECURSIVE ev AS (
      SELECT EPOCH_NS(ts) // $NsPerDay AS day_ord FROM events),
    obs AS (SELECT day_ord, COUNT(*) AS n FROM ev GROUP BY 1),
    span AS (SELECT MIN(day_ord) AS d0, MAX(day_ord) AS d1 FROM ev),
    spine AS (SELECT UNNEST(RANGE(d0, d1 + 1)) AS day_ord FROM span),
    daily AS (
      SELECT s.day_ord, CAST(COALESCE(o.n, 0) AS DOUBLE) AS v
      FROM spine s LEFT JOIN obs o ON s.day_ord = o.day_ord),
    arr AS (
      SELECT LIST(v ORDER BY day_ord) AS vals,
        CAST(COUNT(*) AS BIGINT) AS n_days
      FROM daily),
    rec AS (
      SELECT 1 AS i, vals[1] AS l, CAST(0 AS DOUBLE) AS t,
        CAST(0 AS DOUBLE) AS sse
      FROM arr
      UNION ALL
      SELECT i + 1,
        2e-1 * vals[i + 1] + 8e-1 * (l + t),
        1e-1 * ((2e-1 * vals[i + 1] + 8e-1 * (l + t)) - l) + 9e-1 * t,
        sse + (vals[i + 1] - (l + t)) * (vals[i + 1] - (l + t))
      FROM rec, arr WHERE i < n_days)
    SELECT n_days, l AS level, t AS trend,
      l + 7e0 * t AS forecast_7, sse AS sse_one_step
    FROM rec, arr WHERE i = n_days"""

  /** [[holtForecast]] per event type — the grouped form whose PLAN is
    * the point: a million independent series smooth in ONE key-parallel
    * pass (groupBy key → per-key bounded array → per-key fold), no
    * window, no cross-key coordination, because each fold is sealed
    * inside its group's aggregate. Each series is zero-filled over its
    * OWN [first, last] day span (a type absent for a day counts 0; a
    * type that starts late is not charged for days before it existed).
    * Same α/β, same IEEE fold, same recursive-CTE oracle treatment —
    * per key.
    */
  def holtByType(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_type"), expr(s"ts div $NsPerDay").as("day_ord"))
    val obs = ev.groupBy(col("event_type"), col("day_ord"))
      .agg(count(lit(1)).as("n"))
    val daily = ev.groupBy(col("event_type"))
      .agg(min(col("day_ord")).as("d0"), max(col("day_ord")).as("d1"))
      .select(col("event_type"),
        explode(sequence(col("d0"), col("d1"))).as("day_ord"))
      .join(obs, Seq("event_type", "day_ord"), "left")
      .select(col("event_type"), col("day_ord"),
        coalesce(col("n"), lit(0L)).cast("double").as("v"))
    daily.groupBy(col("event_type"))
      .agg(sort_array(collect_list(struct(col("day_ord"), col("v"))))
        .as("dv"))
      .select(col("event_type"),
        size(col("dv")).cast("bigint").as("n_days"),
        expr("transform(dv, p -> p.v)").as("vals"))
      .select(col("event_type"), col("n_days"), expr("""
        aggregate(slice(vals, 2, size(vals) - 1),
          named_struct('l', element_at(vals, 1),
            't', cast(0 as double), 'sse', cast(0 as double)),
          (acc, x) -> named_struct(
            'l', 2e-1 * x + 8e-1 * (acc.l + acc.t),
            't', 1e-1 * ((2e-1 * x + 8e-1 * (acc.l + acc.t)) - acc.l)
              + 9e-1 * acc.t,
            'sse', acc.sse + (x - (acc.l + acc.t)) * (x - (acc.l + acc.t))))
        """).as("st"))
      .select(col("event_type"), col("n_days"),
        col("st.l").as("level"), col("st.t").as("trend"),
        expr("st.l + 7e0 * st.t").as("forecast_7"),
        col("st.sse").as("sse_one_step"))
  }

  val holtByTypeOracle: String = s"""
    WITH RECURSIVE ev AS (
      SELECT event_type, EPOCH_NS(ts) // $NsPerDay AS day_ord FROM events),
    obs AS (
      SELECT event_type, day_ord, COUNT(*) AS n FROM ev GROUP BY 1, 2),
    span AS (
      SELECT event_type, MIN(day_ord) AS d0, MAX(day_ord) AS d1
      FROM ev GROUP BY 1),
    spine AS (
      SELECT event_type, UNNEST(RANGE(d0, d1 + 1)) AS day_ord FROM span),
    daily AS (
      SELECT s.event_type, s.day_ord, CAST(COALESCE(o.n, 0) AS DOUBLE) AS v
      FROM spine s LEFT JOIN obs o
        ON s.event_type = o.event_type AND s.day_ord = o.day_ord),
    arr AS (
      SELECT event_type, LIST(v ORDER BY day_ord) AS vals,
        CAST(COUNT(*) AS BIGINT) AS n_days
      FROM daily GROUP BY 1),
    rec AS (
      SELECT event_type, 1 AS i, vals[1] AS l, CAST(0 AS DOUBLE) AS t,
        CAST(0 AS DOUBLE) AS sse
      FROM arr
      UNION ALL
      SELECT r.event_type, r.i + 1,
        2e-1 * a.vals[r.i + 1] + 8e-1 * (r.l + r.t),
        1e-1 * ((2e-1 * a.vals[r.i + 1] + 8e-1 * (r.l + r.t)) - r.l)
          + 9e-1 * r.t,
        r.sse + (a.vals[r.i + 1] - (r.l + r.t))
          * (a.vals[r.i + 1] - (r.l + r.t))
      FROM rec r JOIN arr a ON r.event_type = a.event_type
      WHERE r.i < a.n_days)
    SELECT r.event_type, a.n_days, r.l AS level, r.t AS trend,
      r.l + 7e0 * r.t AS forecast_7, r.sse AS sse_one_step
    FROM rec r JOIN arr a ON r.event_type = a.event_type
    WHERE r.i = a.n_days"""

  /** Holt–Winters additive triple smoothing of the daily event series
    * (α = 0.2, β = 0.1, γ = 0.3, weekly seasonality) — the top of the
    * smoothing ladder (EWMA: level; [[holtForecast]]: +trend; this:
    * +the weekday wave [[seasonalDecompose]] showed is real), with the
    * one-step-ahead SSE carried through the fold so the three models'
    * fits compare on the same number. Same portability discipline as
    * Holt: a sequential fold over the calendar-bounded (value, dow)
    * struct array with the identical IEEE expression tree per step in
    * both engines — the seasonal state is an in-fold 7-slot array on
    * the Spark side and seven recursive-CTE columns in the oracle
    * (values identical; LIST_REDUCE is unusable for struct state on
    * DuckDB 1.0). Lambdas touch only lambda variables — the inlining
    * trap the chunker hit cannot bite. Scale: one corpus-keyed daily
    * aggregate; the fold runs over ≤ span days.
    */
  def holtWinters(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(expr(s"ts div $NsPerDay").as("day_ord"))
    val obs = ev.groupBy(col("day_ord")).agg(count(lit(1)).as("n"))
    val daily = ev.agg(min(col("day_ord")).as("d0"), max(col("day_ord")).as("d1"))
      .select(explode(sequence(col("d0"), col("d1"))).as("day_ord"))
      .join(obs, Seq("day_ord"), "left")
      .select(col("day_ord"), coalesce(col("n"), lit(0L)).cast("double").as("v"))
    daily
      .agg(sort_array(collect_list(struct(col("day_ord"), col("v")))).as("dv"))
      .select(size(col("dv")).cast("bigint").as("n_days"),
        expr("transform(dv, p -> named_struct(" +
          "'v', p.v, 'dw', cast((p.day_ord + 4) % 7 as int)))").as("vals"),
        expr("cast((element_at(dv, size(dv)).day_ord + 7 + 4) % 7 as int)")
          .as("f_dw"))
      .select(col("n_days"), col("f_dw"), expr("""
        aggregate(slice(vals, 2, size(vals) - 1),
          named_struct('l', element_at(vals, 1).v, 't', cast(0 as double),
            's', array_repeat(cast(0 as double), 7),
            'sse', cast(0 as double)),
          (acc, p) -> named_struct(
            'l', 2e-1 * (p.v - element_at(acc.s, p.dw + 1))
              + 8e-1 * (acc.l + acc.t),
            't', 1e-1 * ((2e-1 * (p.v - element_at(acc.s, p.dw + 1))
              + 8e-1 * (acc.l + acc.t)) - acc.l) + 9e-1 * acc.t,
            's', transform(sequence(0, 6), k -> if(k = p.dw,
              3e-1 * (p.v - (2e-1 * (p.v - element_at(acc.s, p.dw + 1))
                + 8e-1 * (acc.l + acc.t)))
                + 7e-1 * element_at(acc.s, p.dw + 1),
              element_at(acc.s, k + 1))),
            'sse', acc.sse
              + (p.v - (acc.l + acc.t + element_at(acc.s, p.dw + 1)))
              * (p.v - (acc.l + acc.t + element_at(acc.s, p.dw + 1)))))
        """).as("st"))
      .select(col("n_days"), col("st.l").as("level"), col("st.t").as("trend"),
        expr("element_at(st.s, f_dw + 1)").as("seasonal_f7"),
        expr("st.l + 7e0 * st.t + element_at(st.s, f_dw + 1)")
          .as("forecast_7"),
        col("st.sse").as("sse_one_step"))
  }

  val holtWintersOracle: String = {
    def sdw(pfx: String) =
      s"CASE (d0 + $pfx.i + 4) % 7 WHEN 0 THEN $pfx.s0 WHEN 1 THEN $pfx.s1" +
        s" WHEN 2 THEN $pfx.s2 WHEN 3 THEN $pfx.s3 WHEN 4 THEN $pfx.s4" +
        s" WHEN 5 THEN $pfx.s5 ELSE $pfx.s6 END"
    val x = "a.vals[r.i + 1]"
    val lNew = s"2e-1 * ($x - (${sdw("r")})) + 8e-1 * (r.l + r.t)"
    def sUpd(k: Int) =
      s"CASE WHEN (d0 + r.i + 4) % 7 = $k THEN 3e-1 * ($x - ($lNew))" +
        s" + 7e-1 * (${sdw("r")}) ELSE r.s$k END"
    s"""
    WITH RECURSIVE ev AS (
      SELECT EPOCH_NS(ts) // $NsPerDay AS day_ord FROM events),
    obs AS (SELECT day_ord, COUNT(*) AS n FROM ev GROUP BY 1),
    span AS (SELECT MIN(day_ord) AS d0, MAX(day_ord) AS d1 FROM ev),
    spine AS (SELECT UNNEST(RANGE(d0, d1 + 1)) AS day_ord FROM span),
    daily AS (
      SELECT s.day_ord, CAST(COALESCE(o.n, 0) AS DOUBLE) AS v
      FROM spine s LEFT JOIN obs o ON s.day_ord = o.day_ord),
    arr AS (
      SELECT LIST(v ORDER BY day_ord) AS vals,
        CAST(COUNT(*) AS BIGINT) AS n_days
      FROM daily),
    rec AS (
      SELECT 1 AS i, vals[1] AS l, CAST(0 AS DOUBLE) AS t,
        CAST(0 AS DOUBLE) AS s0, CAST(0 AS DOUBLE) AS s1,
        CAST(0 AS DOUBLE) AS s2, CAST(0 AS DOUBLE) AS s3,
        CAST(0 AS DOUBLE) AS s4, CAST(0 AS DOUBLE) AS s5,
        CAST(0 AS DOUBLE) AS s6, CAST(0 AS DOUBLE) AS sse
      FROM arr
      UNION ALL
      SELECT r.i + 1,
        $lNew,
        1e-1 * (($lNew) - r.l) + 9e-1 * r.t,
        ${(0 to 6).map(sUpd).mkString(",\n        ")},
        r.sse + ($x - (r.l + r.t + (${sdw("r")})))
          * ($x - (r.l + r.t + (${sdw("r")})))
      FROM rec r, arr a, span WHERE r.i < a.n_days)
    SELECT a.n_days, r.l AS level, r.t AS trend,
      CASE (d0 + a.n_days - 1 + 7 + 4) % 7
        WHEN 0 THEN r.s0 WHEN 1 THEN r.s1 WHEN 2 THEN r.s2
        WHEN 3 THEN r.s3 WHEN 4 THEN r.s4 WHEN 5 THEN r.s5
        ELSE r.s6 END AS seasonal_f7,
      r.l + 7e0 * r.t + (CASE (d0 + a.n_days - 1 + 7 + 4) % 7
        WHEN 0 THEN r.s0 WHEN 1 THEN r.s1 WHEN 2 THEN r.s2
        WHEN 3 THEN r.s3 WHEN 4 THEN r.s4 WHEN 5 THEN r.s5
        ELSE r.s6 END) AS forecast_7,
      r.sse AS sse_one_step
    FROM rec r, arr a, span WHERE r.i = a.n_days"""
  }

  def defs: Map[String, QueryDef] = Map(
    "holt_winters" -> QueryDef.sql(holtWinters, holtWintersOracle),
    "holt_by_type" -> QueryDef.sql(holtByType, holtByTypeOracle),
    "stickiness_dau_mau" -> QueryDef.sql(stickinessDauMau, stickinessDauMauOracle),
    "growth_accounting" ->
      QueryDef.sql(growthAccounting, growthAccountingOracle),
    "bounce_rate" -> QueryDef.sql(bounceRate, bounceRateOracle),
    "fano_factor" -> QueryDef.sql(fanoFactor, fanoFactorOracle),
    "daily_novelty" -> QueryDef.sql(dailyNovelty, dailyNoveltyOracle),
    "user_concentration" -> QueryDef.sql(userConcentration, userConcentrationOracle),
    "acf_daily" -> QueryDef.sql(acfDaily, acfDailyOracle),
    "attribution_linear" -> QueryDef.sql(attributionLinear, attributionLinearOracle),
    "forecast_backtest" -> QueryDef.sql(forecastBacktest, forecastBacktestOracle),
    "holt_forecast" -> QueryDef.sql(holtForecast, holtForecastOracle),
    "cohort_ltv" -> QueryDef.sql(cohortLtv, cohortLtvOracle),
    "bitmap_overlap" -> QueryDef.sql(bitmapOverlap, bitmapOverlapOracle),
    "bot_detect" -> QueryDef.sql(botDetect, botDetectOracle),
    "dow_seasonality" -> QueryDef.sql(dowSeasonality, dowSeasonalityOracle),
    "seasonal_decompose" ->
      QueryDef.sql(seasonalDecompose, seasonalDecomposeOracle),
    "seasonal_anomaly" -> QueryDef.sql(seasonalAnomaly, seasonalAnomalyOracle),
    "quantile_sketch_merge" -> QueryDef.sql(quantileSketchMerge, quantileSketchMergeOracle),
    "behavior_gini" -> QueryDef.sql(behaviorGini, behaviorGiniOracle),
    "drift_tvd" -> QueryDef.sql(driftTvd, driftTvdOracle)
  )
}
