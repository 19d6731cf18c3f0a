package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-13 event-stream additions: inter-arrival timing distributions
  * (the cadence facts capacity planning and bot thresholds read) and
  * the CDC write-conflict audit (the ingestion-correctness check a
  * changelog consumer runs before trusting last-writer-wins).
  */
object EventExt {

  /** Inter-arrival gap distribution per event type — for each user the
    * gap to their NEXT event (attributed to the earlier event's type:
    * "after a click, how long until the user acts again?"). Gaps
    * aggregate into minute-valued cells (bounded domain — the
    * percentiles/ks discipline), so the exact nearest-rank p50/p90
    * come from a cell window partitioned by type, never a row sort;
    * the mean stays exact in integer milliseconds. Scale: one
    * user-partitioned lag window (identity-partitioned, the sessionize
    * class), one (type, minute)-keyed aggregate, cell-frame windows.
    */
  def interarrivalStats(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts").asc,
      col("event_id").asc)
    val gaps = Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type").as("t"))
      .withColumn("gap_ns", lead(col("ts"), 1).over(byUser) - col("ts"))
      .filter(col("gap_ns").isNotNull)
      .select(col("t"), col("gap_ns"),
        expr("gap_ns div 60000000000").as("gap_min"))
    val cells = graft.functions.Iterate.checkpoint(
      gaps.groupBy(col("t"), col("gap_min"))
        .agg(count(lit(1)).as("cnt"), sum(col("gap_ns")).as("ns")),
      Some("(type, minute) gap cells — bounded by the time horizon"))
    val byV = Window.partitionBy(col("t")).orderBy(col("gap_min").asc)
    val byT = Window.partitionBy(col("t"))
    val ranked = cells
      .withColumn("cum", sum(col("cnt")).over(byV))
      .withColumn("start", col("cum") - col("cnt"))
      .withColumn("n", sum(col("cnt")).over(byT))
      .withColumn("ns_total", sum(col("ns")).over(byT))
    def rankPos(q: Double): Column =
      ceil(lit(q) * col("n").cast("double")).cast("bigint")
    def valAt(pos: Column): Column =
      max(when(col("start") < pos && pos <= col("cum"), col("gap_min")))
    ranked.groupBy(col("t"))
      .agg(first(col("n")).as("n_gaps"),
        expr("(first(ns_total) div 1000000) div first(n)")
          .as("mean_gap_ms"),
        valAt(rankPos(0.5)).as("p50_gap_min"),
        valAt(rankPos(0.9)).as("p90_gap_min"))
      .withColumnRenamed("t", "event_type")
  }

  val interarrivalStatsOracle: String = """
    WITH g AS (
      SELECT event_type AS t,
        LEAD(EPOCH_NS(ts)) OVER (PARTITION BY user_id
          ORDER BY EPOCH_NS(ts) ASC, event_id ASC) - EPOCH_NS(ts) AS gap_ns
      FROM events),
    gg AS (
      SELECT t, gap_ns, gap_ns // 60000000000 AS gap_min
      FROM g WHERE gap_ns IS NOT NULL),
    cells AS (
      SELECT t, gap_min, COUNT(*) AS cnt, CAST(SUM(gap_ns) AS BIGINT) AS ns
      FROM gg GROUP BY 1, 2),
    r AS (
      SELECT t, gap_min, cnt, ns,
        CAST(SUM(cnt) OVER (PARTITION BY t ORDER BY gap_min ASC
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
        CAST(SUM(cnt) OVER (PARTITION BY t) AS BIGINT) AS n,
        CAST(SUM(ns) OVER (PARTITION BY t) AS BIGINT) AS ns_total
      FROM cells),
    rr AS (SELECT *, cum - cnt AS start FROM r)
    SELECT t AS event_type,
      ANY_VALUE(n) AS n_gaps,
      (ANY_VALUE(ns_total) // 1000000) // ANY_VALUE(n) AS mean_gap_ms,
      MAX(CASE WHEN start < CAST(CEIL(0.5 * CAST(n AS DOUBLE)) AS BIGINT)
        AND CAST(CEIL(0.5 * CAST(n AS DOUBLE)) AS BIGINT) <= cum
        THEN gap_min END) AS p50_gap_min,
      MAX(CASE WHEN start < CAST(CEIL(0.9 * CAST(n AS DOUBLE)) AS BIGINT)
        AND CAST(CEIL(0.9 * CAST(n AS DOUBLE)) AS BIGINT) <= cum
        THEN gap_min END) AS p90_gap_min
    FROM rr GROUP BY t"""

  /** CDC write-conflict audit over the changelog (the events feed under
    * cdc_apply's key/op/payload mapping): cells are (key, timestamp);
    * a cell written by MULTIPLE lsns is concurrent, and concurrent
    * writes with DIFFERENT payloads are true conflicts — the rows
    * last-writer-wins silently drops, which an upsert pipeline must
    * count (and alert on) rather than absorb. One (key, ts)-keyed
    * aggregate then one global fold; both map-side combinable.
    */
  def cdcConflictAudit(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("user_id"), col("ts"),
        expr("CAST(FLOOR(value * 100 + 0.5) AS BIGINT)").as("cents"))
      .groupBy(col("user_id"), col("ts"))
      .agg(count(lit(1)).as("writers"),
        countDistinct(col("cents")).as("payloads"))
      .agg(
        count(lit(1)).as("n_cells"),
        sum(when(col("writers") > 1, 1L).otherwise(0L))
          .as("concurrent_cells"),
        sum(when(col("payloads") > 1, 1L).otherwise(0L))
          .as("conflict_cells"),
        sum(when(col("payloads") > 1, col("writers") - 1).otherwise(0L))
          .as("rows_dropped_by_lww"),
        max(col("writers")).as("max_writers"))
      .withColumn("conflict_ppm",
        expr("(conflict_cells * 1000000) div n_cells"))

  val cdcConflictAuditOracle: String = """
    WITH cells AS (
      SELECT user_id, ts, COUNT(*) AS writers,
        COUNT(DISTINCT CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS payloads
      FROM events GROUP BY 1, 2)
    SELECT COUNT(*) AS n_cells,
      CAST(SUM(CASE WHEN writers > 1 THEN 1 ELSE 0 END) AS BIGINT)
        AS concurrent_cells,
      CAST(SUM(CASE WHEN payloads > 1 THEN 1 ELSE 0 END) AS BIGINT)
        AS conflict_cells,
      CAST(SUM(CASE WHEN payloads > 1 THEN writers - 1 ELSE 0 END) AS BIGINT)
        AS rows_dropped_by_lww,
      CAST(MAX(writers) AS BIGINT) AS max_writers,
      (CAST(SUM(CASE WHEN payloads > 1 THEN 1 ELSE 0 END) AS BIGINT)
        * 1000000) // COUNT(*) AS conflict_ppm
    FROM cells"""

  /** Page–Hinkley drift detector over the daily event-count series —
    * the SEQUENTIAL changepoint monitor beside cusum_changepoint's
    * retrospective split: mₜ = Σᵢ≤ₜ (xᵢ − x̄ᵢ) accumulates deviation
    * from the RUNNING mean (each term against the mean as of its own
    * step — the online form), and the PH statistic mₜ − min(m₁..ₜ)
    * alarms when the series drifts up by more than λ = one average
    * day's volume. All arithmetic exact in ×1e6 BIGINT units (running
    * means are integer-floored ppm; both engines floor identically).
    * Scale: the day frame is calendar-bounded (the declared window
    * class); one scan aggregates to it.
    */
  def pageHinkley(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = Tables.events(spark, dir)
      .select(expr("ts div 86400000000000").as("day_ord"))
      .groupBy(col("day_ord")).agg(count(lit(1)).as("cnt"))
    val lam = daily.agg(
      expr("(sum(cnt) * 1000000) div count(*)").as("lambda_x1e6"))
    val byDay = Window.orderBy(col("day_ord").asc)
    val cum = byDay.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily.crossJoin(broadcast(lam))
      .withColumn("i", row_number().over(byDay).cast("long"))
      .withColumn("cum_cnt", sum(col("cnt")).over(cum))
      .withColumn("dev_x1e6",
        col("cnt") * lit(1000000L)
          - expr("(cum_cnt * 1000000) div i"))
      .withColumn("m_x1e6", sum(col("dev_x1e6")).over(cum))
      .withColumn("ph_x1e6",
        col("m_x1e6") - min(col("m_x1e6")).over(cum))
      .select(col("day_ord"), col("cnt"), col("m_x1e6"), col("ph_x1e6"),
        (col("ph_x1e6") > col("lambda_x1e6")).as("alarm"))
  }

  val pageHinkleyOracle: String = """
    WITH daily AS (
      SELECT EPOCH_NS(ts) // 86400000000000 AS day_ord, COUNT(*) AS cnt
      FROM events GROUP BY 1),
    lam AS (
      SELECT (CAST(SUM(cnt) AS BIGINT) * 1000000) // COUNT(*) AS lambda_x1e6
      FROM daily),
    seq AS (
      SELECT day_ord, cnt,
        CAST(ROW_NUMBER() OVER (ORDER BY day_ord ASC) AS BIGINT) AS i,
        CAST(SUM(cnt) OVER (ORDER BY day_ord ASC
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
          AS cum_cnt
      FROM daily),
    dev AS (
      SELECT day_ord, cnt,
        cnt * 1000000 - (cum_cnt * 1000000) // i AS dev_x1e6
      FROM seq),
    m AS (
      SELECT day_ord, cnt,
        CAST(SUM(dev_x1e6) OVER (ORDER BY day_ord ASC
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
          AS m_x1e6
      FROM dev),
    ph AS (
      SELECT day_ord, cnt, m_x1e6,
        m_x1e6 - CAST(MIN(m_x1e6) OVER (ORDER BY day_ord ASC
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
          AS ph_x1e6
      FROM m)
    SELECT day_ord, cnt, m_x1e6, ph_x1e6,
      ph_x1e6 > (SELECT lambda_x1e6 FROM lam) AS alarm
    FROM ph"""

  /** Tail risk (VaR + CVaR) of the event value per type — the
    * alert-threshold table read beside anomaly_mad: VaR₉₅ is the exact
    * nearest-rank p95 over unit-value cells (the bounded-cell CDF
    * discipline — the value domain caps the cell count regardless of
    * event volume), and CVaR is the exact-cents mean of everything in
    * the selected tail (tail membership defined on the integer bucket,
    * so both engines pick the identical set). An ops team pages on
    * CVaR, not max: the mean of the bad tail is stable where the
    * maximum is one outlier. One scan into cells; per-type windows run
    * over the bounded cell frame.
    */
  def valueCvar(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(spark, dir)
      .select(col("event_type").as("t"),
        floor(col("value")).cast("bigint").as("v"),
        expr("CAST(FLOOR(value * 100 + 0.5) AS BIGINT)").as("cents"))
    val cells = graft.functions.Iterate.checkpoint(
      ev.groupBy(col("t"), col("v"))
        .agg(count(lit(1)).as("cnt"), sum(col("cents")).as("cell_cents")),
      Some("(type, unit-value) cells — the value domain bounds them"))
    val byV = Window.partitionBy(col("t")).orderBy(col("v").asc)
    val byT = Window.partitionBy(col("t"))
    val pos = ceil(lit(0.95) * col("n").cast("double")).cast("bigint")
    cells
      .withColumn("cum", sum(col("cnt")).over(byV))
      .withColumn("start", col("cum") - col("cnt"))
      .withColumn("n", sum(col("cnt")).over(byT))
      .withColumn("var_bucket",
        max(when(col("start") < pos && pos <= col("cum"), col("v")))
          .over(byT))
      .groupBy(col("t"))
      .agg(first(col("n")).as("n_events"),
        first(col("var_bucket")).as("var95_bucket"),
        sum(when(col("v") >= col("var_bucket"), col("cnt")).otherwise(0L))
          .as("tail_n"),
        sum(when(col("v") >= col("var_bucket"), col("cell_cents"))
          .otherwise(0L)).as("tail_cents"))
      .select(col("t").as("event_type"), col("n_events"),
        col("var95_bucket"), col("tail_n"),
        expr("tail_cents div tail_n").as("cvar_mean_cents"))
  }

  val valueCvarOracle: String = """
    WITH ev AS (
      SELECT event_type AS t,
        CAST(FLOOR(value) AS BIGINT) AS v,
        CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents
      FROM events),
    cells AS (
      SELECT t, v, COUNT(*) AS cnt, CAST(SUM(cents) AS BIGINT) AS cell_cents
      FROM ev GROUP BY 1, 2),
    r AS (
      SELECT t, v, cnt, cell_cents,
        CAST(SUM(cnt) OVER (PARTITION BY t ORDER BY v ASC
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
          AS cum,
        CAST(SUM(cnt) OVER (PARTITION BY t) AS BIGINT) AS n
      FROM cells),
    rr AS (
      SELECT *, cum - cnt AS start,
        CAST(CEIL(0.95 * CAST(n AS DOUBLE)) AS BIGINT) AS pos
      FROM r),
    vb AS (
      SELECT *,
        MAX(CASE WHEN start < pos AND pos <= cum THEN v END)
          OVER (PARTITION BY t) AS var_bucket
      FROM rr)
    SELECT t AS event_type,
      ANY_VALUE(n) AS n_events,
      ANY_VALUE(var_bucket) AS var95_bucket,
      CAST(SUM(CASE WHEN v >= var_bucket THEN cnt ELSE 0 END) AS BIGINT)
        AS tail_n,
      CAST(SUM(CASE WHEN v >= var_bucket THEN cell_cents ELSE 0 END)
        AS BIGINT)
        // CAST(SUM(CASE WHEN v >= var_bucket THEN cnt ELSE 0 END) AS BIGINT)
        AS cvar_mean_cents
    FROM vb GROUP BY t"""

  def defs: Map[String, QueryDef] = Map(
    "value_cvar" -> QueryDef.sql(valueCvar, valueCvarOracle),
    "page_hinkley" -> QueryDef.sql(pageHinkley, pageHinkleyOracle),
    "interarrival_stats" ->
      QueryDef.sql(interarrivalStats, interarrivalStatsOracle),
    "cdc_conflict_audit" ->
      QueryDef.sql(cdcConflictAudit, cdcConflictAuditOracle)
  )
}
