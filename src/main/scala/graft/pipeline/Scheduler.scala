package graft.pipeline

/** Clock-injected schedule/catchup semantics over [[Orchestrator]] — the
  * time-based scheduling surface the reference's Airflow layer carries
  * and the DAG module deliberately did not (every reference DAG declares
  * `schedule_interval=timedelta(days=1), catchup=False` —
  * download_dataset_stage_1.py's DAG block and its stage-2/3 siblings —
  * while [[Orchestrator]] covered only topology/retries/resume; the r14
  * verdict listed this as the one conscious scope cut worth closing).
  *
  * Airflow's public data-interval model, re-expressed without a wall
  * clock (the clock is an argument, so specs are deterministic and a
  * production caller passes "today"):
  *
  *   - a run owns the data interval `[start, start + interval)` and is
  *     created only once that interval has CLOSED (`now >= end`) — the
  *     run's `logicalDay` is the interval START (Airflow's
  *     execution_date / logical_date convention);
  *   - `catchup = true` materializes every missed interval since
  *     `startDay` in logical order (the backfill storm a fresh deploy
  *     of an old start_date triggers); `catchup = false` materializes
  *     only the LATEST closed interval (the reference's own setting);
  *   - a run ledger (the state database) makes ticks idempotent: a
  *     logical day already attempted is never re-created, so arbitrary
  *     re-ticks at the same or later clock add only newly closed
  *     intervals. The ledger records ATTEMPTED runs, success or not —
  *     Airflow marks a failed run failed and does not auto-recreate it;
  *     recovery is an explicit operator action (clear + re-tick).
  *
  * Scale note: like [[Orchestrator]], this layer is driver metadata —
  * |due runs| per tick — and every heavy operation lives in the task
  * bodies the factory returns (Spark jobs over the run's interval).
  * The planning-side twin of this logic over the events lake is the
  * registered query `schedule_backfill_plan`
  * ([[graft.operators.Scheduling]]).
  */
object Scheduler {

  /** One materialized run: owns `[intervalStartDay, intervalEndDay)` in
    * epoch-days; `logicalDay == intervalStartDay` (the Airflow naming
    * kept explicit so task factories read the intent). `backfill` marks
    * a run created with at least one YOUNGER closed interval also due —
    * i.e. the scheduler is catching up, not running on time.
    */
  final case class ScheduledRun(
      logicalDay: Long,
      intervalStartDay: Long,
      intervalEndDay: Long,
      backfill: Boolean)

  /** The intervals due at `nowDay`, oldest first — pure planning, no
    * execution. `ledger` holds logical days already attempted.
    */
  def dueRuns(
      startDay: Long,
      intervalDays: Long,
      nowDay: Long,
      catchup: Boolean,
      ledger: Set[Long] = Set.empty): Seq[ScheduledRun] = {
    require(intervalDays >= 1, s"intervalDays must be >= 1: $intervalDays")
    // closed intervals: start s with s + interval <= now, aligned to the
    // startDay grid (Airflow aligns data intervals to start_date)
    val closed = Iterator.iterate(startDay)(_ + intervalDays)
      .takeWhile(_ + intervalDays <= nowDay)
      .toSeq
    val wanted = if (catchup || closed.isEmpty) closed else Seq(closed.last)
    val latest = if (closed.isEmpty) Long.MinValue else closed.last
    wanted.filterNot(ledger.contains).map(s =>
      ScheduledRun(s, s, s + intervalDays, backfill = s < latest))
  }

  /** One scheduler heartbeat: plan the due runs, execute each through
    * [[Orchestrator.run]] in logical order (`tasksFor` builds the run's
    * DAG — the TriggerDagRunOperator analog is simply listing the
    * downstream stages in the same task set), and return the reports
    * plus the advanced ledger. A failed run is still ledgered (see
    * class doc) and does NOT stop younger runs — Airflow runs dag-runs
    * independently unless the caller encodes a dependency.
    */
  def tick(
      startDay: Long,
      intervalDays: Long,
      nowDay: Long,
      catchup: Boolean,
      ledger: Set[Long],
      tasksFor: ScheduledRun => Seq[Orchestrator.TaskDef],
      onRetry: (String, Int) => Unit = (_, _) => ())
      : (Seq[(ScheduledRun, Orchestrator.RunReport)], Set[Long]) = {
    val due = dueRuns(startDay, intervalDays, nowDay, catchup, ledger)
    val reports = due.map(r => r -> Orchestrator.run(tasksFor(r), onRetry))
    (reports, ledger ++ due.map(_.logicalDay))
  }
}
