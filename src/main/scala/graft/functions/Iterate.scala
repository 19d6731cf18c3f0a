package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Lineage control for iterative DataFrame algorithms (pagerank,
  * connected components): each round's plan would otherwise re-embed the
  * whole upstream pipeline, growing planning cost per iteration.
  *
  * `localCheckpoint` truncates lineage into executor block-manager memory
  * — right for local mode, but NOT fault-tolerant: on a real cluster an
  * executor loss makes the checkpointed partitions unrecoverable mid-loop.
  * So: when the session has a reliable checkpoint dir configured
  * (`sparkContext.setCheckpointDir`, HDFS/S3 in production), use reliable
  * `checkpoint` instead. Same plan-truncation semantics, cluster-safe.
  */
object Iterate {

  /** Eagerly checkpoint: reliable if a checkpoint dir is set, local
    * otherwise. Scans the pre-materialization plan for unpartitioned
    * Windows ([[PlanGuard]]) — a checkpoint boundary would otherwise
    * hide a single-reducer sort from the registry-wide PlanSpec scan;
    * sites whose window input is provably bounded declare it via the
    * two-arg overload.
    */
  def checkpoint(df: DataFrame): DataFrame = checkpoint(df, None)

  /** [[checkpoint]] with a declared-bounded unpartitioned window —
    * `allowWindow` is the greppable justification (see [[PlanGuard]]).
    */
  def checkpoint(df: DataFrame, allowWindow: Option[String]): DataFrame = {
    PlanGuard.assertNoUnpartitionedWindow(df, "Iterate.checkpoint", allowWindow)
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined)
      df.checkpoint(eager = true)
    else df.localCheckpoint(eager = true)
  }

  /** Partition count for per-round loop STATE (edge lists, label/rank
    * vectors) — derived from the session's shuffle parallelism, never a
    * literal. Rule: state frames are much smaller than the corpus, so a
    * full-width shuffle is pure scheduler overhead locally, but a small
    * constant would serialize every iteration on a real cluster (a
    * 1000-executor session sets shuffle.partitions in the thousands and
    * its "small" graph state is still billions of rows). 1/4 of the
    * session width scales with the deployment in both directions; the
    * floor keeps tiny local sessions from collapsing to 1 partition.
    */
  def statePartitions(spark: SparkSession): Int =
    math.max(spark.sessionState.conf.numShufflePartitions / 4, 8)
}
