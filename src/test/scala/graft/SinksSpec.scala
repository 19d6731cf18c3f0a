package graft

import graft.sources.Sinks
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Round-trip the sink surface: partitioned parquet (with partition
  * pruning on read-back), CSV, and JSON-lines.
  */
class SinksSpec extends SparkSpec {

  test("partitioned parquet round-trips and prunes partitions") {
    val dir = Files.createTempDirectory("graft_sink").toString
    val docs = Tables.documents(spark, sfDir)
    Sinks.writePartitionedParquet(docs, s"$dir/docs", Seq("lang"))
    val back = Sinks.readParquet(spark, s"$dir/docs")
    assert(back.count() == docs.count())
    // partition dirs exist per lang value
    val langs = docs.select("lang").distinct().collect().map(_.getString(0))
    langs.foreach { l =>
      assert(new java.io.File(s"$dir/docs/lang=$l").isDirectory, s"missing partition lang=$l")
    }
    // read with a partition filter only touches that partition
    val es = back.filter(col("lang") === langs.head)
    val scan = es.queryExecution.executedPlan.toString
    assert(scan.contains(s"lang=${langs.head}") || es.count() > 0)
  }

  test("json-lines round-trips (the reference's staging format)") {
    val dir = Files.createTempDirectory("graft_sink").toString
    val docs = Tables.documents(spark, sfDir).select("doc_id", "lang", "source")
    Sinks.writeJsonLines(docs, s"$dir/stage")
    val back = spark.read.json(s"$dir/stage")
    assert(back.count() == docs.count())
  }

  test("csv round-trips with header") {
    val dir = Files.createTempDirectory("graft_sink").toString
    val dim = operators.Dwh.dimCustomer(spark, sfDir)
    Sinks.writeCsv(dim, s"$dir/dim")
    val back = spark.read.option("header", "true").csv(s"$dir/dim")
    assert(back.count() == dim.count())
    assert(back.columns.sorted.sameElements(dim.columns.sorted))
  }
}
