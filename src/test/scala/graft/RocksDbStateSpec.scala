package graft

import graft.streaming.{EventStreams, StateBackend}
import org.apache.spark.sql.DataFrame

/** Backend-swap proofs for the stateful standing jobs: each job runs
  * twice on the same sf0.001 events — once under the default
  * heap-backed provider and once under RocksDB
  * ([[StateBackend.useRocksDb]]) — and must emit the IDENTICAL row
  * multiset. The provider is a storage layer; any output difference
  * would mean job logic leaked into state-store iteration order, which
  * is exactly the kind of dependency a cluster migration to RocksDB
  * (the 100 TB deployment posture — see StateBackend's cardinality
  * table) would surface in production. cdcToTable is covered through
  * its parquet table, the others through memory sinks.
  */
class RocksDbStateSpec extends SparkSpec {

  import spark.implicits._

  private var n = 0
  private def run(build: DataFrame => DataFrame, mode: String): Seq[String] = {
    n += 1
    val view = s"rocks_spec_$n"
    val q = build(EventStreams.eventsStream(spark, sfDir))
      .writeStream.format("memory").queryName(view)
      .outputMode(mode).start()
    try q.processAllAvailable() finally q.stop()
    val rows = spark.table(view).collect().map(_.toString).sorted.toSeq
    spark.catalog.dropTempView(view)
    rows
  }

  private def underBoth(name: String, mode: String)
      (build: DataFrame => DataFrame): Unit =
    test(s"$name emits identical rows under heap and RocksDB state stores") {
      val heap = run(build, mode)
      StateBackend.useRocksDb(spark)
      val rocks = try run(build, mode)
      finally StateBackend.useDefault(spark)
      assert(heap.nonEmpty, s"$name produced no rows — vacuous swap proof")
      assert(heap == rocks, s"$name drifted across state backends: " +
        s"${heap.diff(rocks).take(3)} vs ${rocks.diff(heap).take(3)}")
    }

  underBoth("windowedAgg", "complete")(EventStreams.windowedAgg)
  underBoth("dedupedStream", "append")(EventStreams.dedupedStream)
  underBoth("noveltyStream", "complete")(df =>
    EventStreams.noveltyStream(df.as[EventStreams.Event]).toDF())
  underBoth("heavyHittersStream", "update")(df =>
    EventStreams.heavyHittersStream(df.as[EventStreams.Event]).toDF())
  underBoth("funnelStream", "update")(df =>
    EventStreams.funnelStream(df.as[EventStreams.Event]).toDF())
  underBoth("debounced", "append")(df =>
    EventStreams.debounced(df.as[EventStreams.Event]).toDF())

  test("cdcToTable lands the identical upsert table under RocksDB") {
    def landed(dirTag: String): Seq[String] = {
      val out = java.nio.file.Files.createTempDirectory(s"rocks_cdc_$dirTag")
      val q = EventStreams.cdcToTable(
        EventStreams.eventsStream(spark, sfDir).as[EventStreams.Event],
        out.resolve("state").toString)
      try q.processAllAvailable() finally q.stop()
      val rows = spark.read.parquet(out.resolve("state").toString)
        .collect().map(_.toString).sorted.toSeq
      import scala.jdk.CollectionConverters._
      val walk = java.nio.file.Files.walk(out)
      try walk.iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
      finally walk.close()
      rows
    }
    val heap = landed("heap")
    StateBackend.useRocksDb(spark)
    val rocks = try landed("rocks") finally StateBackend.useDefault(spark)
    assert(heap.nonEmpty && heap == rocks)
  }
}
