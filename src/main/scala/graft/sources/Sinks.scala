package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Sink surface (§2 sources/sinks): the reference lands its results in
  * Postgres (populate_DWH.py, per-row INSERTs) and Neo4j (databases.py,
  * per-batch Cypher CREATE). Spark-first, both become bulk writers:
  * partitioned columnar output for the lakehouse path, JDBC batch writes
  * for the warehouse path, and the graph lands as plain edge/node tables
  * (collab_pairs / graph_degree outputs) that any graph store can bulk
  * load.
  */
object Sinks {

  /** Partitioned parquet — the lake path. Partition columns become
    * directories, so downstream reads prune partitions for free.
    */
  def writePartitionedParquet(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(partitionCols: _*).parquet(path)

  /** CSV with header — interchange path. */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", "true").csv(path)

  /** JSON-lines — the reference's staging format (arxiv_preprocessed
    * parts, utils.py:177 to_json(orient='records', lines=True)).
    */
  def writeJsonLines(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  /** Warehouse path — bulk JDBC append, replacing the reference's
    * row-at-a-time PostgresOperator INSERTs (populate_DWH.py:60). Not
    * exercised in tests (no database in the container); the call shape is
    * the standard Spark JDBC batch writer.
    */
  def writeJdbc(df: DataFrame, url: String, table: String,
      props: java.util.Properties): Unit =
    df.write.mode(SaveMode.Append).jdbc(url, table, props)

  /** Round-trip helper used by specs. */
  def readParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
