package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The data-side face of the scheduling surface
  * ([[graft.pipeline.Scheduler]] is the execution side): given the
  * events lake and daily-interval Airflow semantics, the catchup plan a
  * fresh deploy would materialize — every closed data interval with its
  * actual event volume, so an operator prices the backfill before
  * triggering it. Mirrors the reference's `schedule_interval=
  * timedelta(days=1)` DAG declarations (download_dataset_stage_1.py's
  * DAG block) the way check_DWH mirrors its warehouse.
  */
object Scheduling {

  /** Daily catchup plan over the events table: one row per CLOSED data
    * interval `[d, d+1)` between the first event day and the horizon
    * (`now` = the last event's day — that interval is still open and
    * produces no run, the Airflow interval-must-close rule). Each run
    * reports its logical date (= interval start, the Airflow
    * convention), exclusive interval end, 1-based run sequence, the
    * interval's actual event count (0 for gap days — the calendar is a
    * generated grid, not the observed day set, so silent ingestion
    * holes surface as countable empty runs), and `is_backfill` against
    * a deploy anchor 7 days before the horizon: a run whose interval
    * closed before the anchor exists only because catchup=true replays
    * history.
    *
    * Scale shape: ONE events scan into the (day → count) aggregate
    * (map-side combinable, |days| cells), checkpointed because two
    * consumers read it (the [min, max] span row and the calendar join);
    * the calendar is `sequence()` over the broadcast span row —
    * metadata-scale however large the lake — and `run_seq` is
    * arithmetic off the span (no unpartitioned window). The volume
    * join is |days| × |days| on equal keys with the day-count side
    * broadcast.
    */
  def scheduleBackfillPlan(spark: SparkSession, dir: String): DataFrame = {
    val daily = graft.functions.Iterate.checkpoint(
      Tables.events(spark, dir)
        .select(expr("ts div 86400000000000").as("day_id"))
        .groupBy(col("day_id")).agg(count(lit(1)).as("n_events")),
      Some("per-day event counts — bounded by the time horizon"))
    val span = daily.agg(min(col("day_id")).as("__dmin"),
      max(col("day_id")).as("__dmax"))
    def dayStr(day: org.apache.spark.sql.Column) =
      date_format(timestamp_seconds(day * 86400L), "yyyy-MM-dd")
    // Guard the calendar: Spark's sequence(a, b) DESCENDS when b < a
    // (sequence(1, 0) = [1, 0]), so a single-day lake (dmin == dmax,
    // only an OPEN interval) would emit two spurious runs where the
    // interval-must-close contract — and the oracle's RANGE(dmin, dmax),
    // which is empty for dmin == dmax — requires zero.
    span
      .select(explode(expr(
          """CASE WHEN __dmax > __dmin THEN sequence(__dmin, __dmax - 1)
             ELSE CAST(array() AS array<bigint>) END""")).as("day_id"),
        col("__dmin"), col("__dmax"))
      .join(broadcast(daily), Seq("day_id"), "left")
      .select(
        dayStr(col("day_id")).as("logical_date"),
        dayStr(col("day_id") + 1).as("interval_end"),
        (col("day_id") - col("__dmin") + 1).as("run_seq"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        (col("day_id") + 1 <= col("__dmax") - 7).as("is_backfill"))
  }

  val scheduleBackfillPlanOracle: String = """
    WITH daily AS (
      SELECT EPOCH_NS(ts) // 86400000000000 AS day_id,
        CAST(COUNT(*) AS BIGINT) AS n_events
      FROM events GROUP BY 1),
    span AS (
      SELECT MIN(day_id) AS dmin, MAX(day_id) AS dmax FROM daily),
    cal AS (
      SELECT UNNEST(RANGE(dmin, dmax)) AS day_id, dmin, dmax FROM span)
    SELECT
      STRFTIME(make_timestamp(c.day_id * 86400000000), '%Y-%m-%d')
        AS logical_date,
      STRFTIME(make_timestamp((c.day_id + 1) * 86400000000), '%Y-%m-%d')
        AS interval_end,
      CAST(c.day_id - c.dmin + 1 AS BIGINT) AS run_seq,
      COALESCE(d.n_events, 0) AS n_events,
      c.day_id + 1 <= c.dmax - 7 AS is_backfill
    FROM cal c LEFT JOIN daily d ON c.day_id = d.day_id"""

  def defs: Map[String, QueryDef] = Map(
    "schedule_backfill_plan" ->
      QueryDef.sql(scheduleBackfillPlan, scheduleBackfillPlanOracle))
}
