package graft.functions

import org.apache.spark.sql.DataFrame

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
    * otherwise.
    */
  def checkpoint(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined)
      df.checkpoint(eager = true)
    else df.localCheckpoint(eager = true)
}
