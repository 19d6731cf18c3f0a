package graft.pipeline

/** Minimal deterministic DAG orchestrator — the scheduler-semantics
  * analog of the reference's Airflow layer, which the staged pipeline
  * runners ([[PublicationsPipeline.runAll]]) deliberately did not carry:
  * every reference DAG declares `retries: 1, retry_delay: 5 min`
  * (download_dataset_stage_1.py:13-14, clean_and_validate_stage_2.py:13-14,
  * check_DWH.py:119-120) and chains stages with `>>` edges plus
  * TriggerDagRunOperator handoffs (download_dataset_stage_1.py:53,
  * clean_and_validate_stage_2.py:44). This module re-expresses exactly
  * that contract in-process:
  *
  *   - tasks with upstream edges, run in deterministic topological order
  *     (name-ordered among ready tasks — reproducible run reports);
  *   - bounded per-task retries with a caller-injectable backoff hook
  *     (default no sleep, so specs stay instant; production passes a
  *     real sleeper for the 5-minute Airflow delay);
  *   - Airflow trigger rules: ALL_SUCCESS (the default — any failed or
  *     skipped upstream propagates a skip, Airflow's upstream_failed)
  *     and ALL_DONE (the cleanup idiom — runs once upstreams are
  *     terminal regardless of outcome, the rule a `delete` closer like
  *     stage 1's archive cleanup wants);
  *   - a per-task run report (state, attempts, error message) — the
  *     scheduler-facing evidence an operator reads before re-triggering.
  *
  * Resume composes with the staging discipline instead of duplicating
  * it: a task whose `skipIf` probe returns true (e.g. "staged parquet
  * already written") records Resumed without running — the re-run
  * semantics the reference gets from Airflow's state database, derived
  * here from the data itself.
  *
  * Scale note: orchestration state is |tasks|-sized driver metadata;
  * every heavy operation stays inside the task bodies (Spark jobs),
  * so the layer adds nothing to the data path.
  */
object Orchestrator {

  sealed trait TriggerRule
  /** Run only if every upstream succeeded (Airflow default). */
  case object AllSuccess extends TriggerRule
  /** Run once every upstream is terminal, success or not (cleanup). */
  case object AllDone extends TriggerRule

  final case class TaskDef(
      name: String,
      upstream: Seq[String] = Nil,
      retries: Int = 1,
      rule: TriggerRule = AllSuccess,
      skipIf: () => Boolean = () => false)(val body: () => Unit)

  sealed trait TaskState { def terminal: Boolean = true }
  final case class Succeeded(attempts: Int) extends TaskState
  final case class Failed(attempts: Int, error: String) extends TaskState
  /** Upstream failed/skipped under ALL_SUCCESS — never attempted. */
  case object UpstreamFailed extends TaskState
  /** skipIf probe said the work is already done (staged resume). */
  case object Resumed extends TaskState

  final case class RunReport(states: Map[String, TaskState],
      order: Seq[String]) {
    def allSucceeded: Boolean = states.values.forall {
      case Succeeded(_) | Resumed => true
      case _ => false
    }
    def failed: Seq[String] = order.filter(n => states(n) match {
      case Failed(_, _) => true; case _ => false
    })
  }

  /** Execute the DAG. Throws on unknown upstream names or cycles (a
    * mis-declared DAG is a programming error, not a runtime state).
    * `onRetry(task, attempt)` is the backoff hook — production sleeps
    * the Airflow retry_delay here.
    */
  def run(tasks: Seq[TaskDef],
      onRetry: (String, Int) => Unit = (_, _) => ()): RunReport = {
    val byName = tasks.map(t => t.name -> t).toMap
    require(byName.size == tasks.size, "duplicate task names")
    tasks.foreach(t => t.upstream.foreach(u =>
      require(byName.contains(u), s"task ${t.name}: unknown upstream $u")))

    val states = scala.collection.mutable.LinkedHashMap[String, TaskState]()
    val ran = scala.collection.mutable.ArrayBuffer[String]()
    var remaining = tasks.sortBy(_.name)
    while (remaining.nonEmpty) {
      val ready = remaining.filter(_.upstream.forall(states.contains))
      require(ready.nonEmpty,
        s"cycle among tasks: ${remaining.map(_.name).mkString(", ")}")
      // deterministic: among ready tasks, run in name order
      val t = ready.head
      val upStates = t.upstream.map(states(_))
      val eligible = t.rule match {
        case AllSuccess => upStates.forall {
          case Succeeded(_) | Resumed => true
          case _ => false
        }
        case AllDone => true // upstreams are terminal by construction
      }
      val state: TaskState =
        if (!eligible) UpstreamFailed
        else if (t.skipIf()) Resumed
        else {
          var attempt = 0
          var result: Option[TaskState] = None
          while (result.isEmpty) {
            attempt += 1
            try { t.body(); result = Some(Succeeded(attempt)) }
            catch {
              case e: Exception if attempt <= t.retries =>
                onRetry(t.name, attempt)
              case e: Exception =>
                result = Some(Failed(attempt,
                  Option(e.getMessage).getOrElse(e.getClass.getName)))
            }
          }
          result.get
        }
      states += t.name -> state
      ran += t.name
      remaining = remaining.filterNot(_.name == t.name)
    }
    RunReport(states.toMap, ran.toSeq)
  }
}
