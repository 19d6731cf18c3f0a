package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch diagnostics main (not part of the driver contract): drives the
  * streaming jobs against the real events parquet via a file source.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // FileStreamSource needs a directory; stage the single parquet file.
    val dir = "/tmp/graft_stream_events"
    val d = new java.io.File(dir); d.mkdirs()
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    val stream = Tables.normalizeEventTs(
        streaming.EventStreams.fromParquetDir(spark, dir))
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    val q = streaming.EventStreams.windowedAgg(stream)
      .writeStream.format("memory").queryName("probe_win")
      .outputMode("complete").start()
    q.processAllAvailable()
    q.stop()
    val out = spark.table("probe_win").orderBy(col("window_start"), col("event_type"))
    println(s"STREAM_ROWS=${out.count()}")
    out.show(6, false)

    // Batch twin for cross-check.
    val batch = operators.EventOps.streamWindowAgg(spark, "/root/testdata/sf0.001")
    println(s"BATCH_ROWS=${batch.count()}")

    // Full pipeline run (the six-stage Airflow analog).
    val manifest = pipeline.PublicationsPipeline.runAll(
      spark, "/root/testdata/sf0.001", "/tmp/graft_pipeline_probe")
    manifest.toSeq.sortBy(_._1).foreach { case (k, v) => println(s"PIPE $k=$v") }

    // Streaming sessionization (flatMapGroupsWithState) vs batch
    // sessionize (lag + running sum): independent algorithms, must agree.
    import spark.implicits._
    val evStream = Tables.normalizeEventTs(
        streaming.EventStreams.fromParquetDir(spark, dir))
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[streaming.EventStreams.Event]
    val sq = streaming.EventStreams.sessionized(evStream)
      .writeStream.format("memory").queryName("probe_sessions")
      .outputMode("append").start()
    sq.processAllAvailable()
    sq.stop()
    val streamSessions = spark.table("probe_sessions")
    val batchSessions = operators.EventOps.sessionize(spark, "/root/testdata/sf0.001")
      .withColumnRenamed("session_id", "batch_session_id")
    val joined = streamSessions.join(batchSessions, Seq("event_id", "user_id"))
    val total = joined.count()
    val agree = joined.filter(col("session_id") === col("batch_session_id")).count()
    println(s"SESSION_AGREE=$agree/$total")
    spark.stop()
  }
}
