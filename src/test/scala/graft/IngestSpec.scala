package graft

import graft.sources.Ingest
import org.apache.spark.sql.functions._

/** JSONL ingestion: schema'd read, corrupt-record routing, and lossless
  * round-trip against the parquet path (the full-value check is the
  * ingest_jsonl oracle row in Verify).
  */
class IngestSpec extends SparkSpec {

  test("ingest_jsonl round-trips the documents table losslessly") {
    val viaJsonl = Ingest.ingestJsonl(spark, sfDir)
    val viaParquet = Tables.documents(spark, sfDir)
      .select("doc_id", "text", "lang", "source", "n_chars")
    assert(viaJsonl.count() == viaParquet.count())
    assert(viaJsonl.exceptAll(viaParquet).count() == 0)
    assert(viaParquet.exceptAll(viaJsonl).count() == 0)
  }

  test("ORC round-trip is lossless against the parquet path") {
    val viaParquet = Tables.documents(spark, sfDir)
      .select("doc_id", "text", "lang", "source", "n_chars")
    val viaOrc = Ingest.ingestOrc(spark, sfDir)
    assert(viaOrc.count() == viaParquet.count())
    assert(viaParquet.exceptAll(viaOrc).count() == 0)
  }

  test("partitioned lake read prunes to the filtered partition") {
    val df = Ingest.partitionedLake(spark, sfDir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // the event_type filter must act as a PartitionFilter on the scan,
    // not a post-scan data filter. FileScan prints all metadata on ONE
    // line, so the filter must appear INSIDE the PartitionFilters
    // brackets — substring checks alone are vacuous (ReadSchema also
    // mentions event_type).
    assert("PartitionFilters: \\[[^\\]]*event_type".r.findFirstIn(p).isDefined,
      s"no partition pruning:\n$p")
  }

  test("zorder layout lands files with disjoint z ranges (skippable rectangles)") {
    val ub = pmod(col("user_id"), lit(256L))
    val db = pmod(expr("ts div 86400000000000"), lit(256L))
    val dir = java.nio.file.Files.createTempDirectory("graft_zspec").toString
    Tables.events(spark, sfDir)
      .select(col("event_id"), Ingest.zValue(ub, db).as("z"))
      .repartitionByRange(4, col("z"))
      .sortWithinPartitions(col("z"))
      .write.mode("overwrite").parquet(dir)
    val ranges = spark.read.parquet(dir)
      .groupBy(input_file_name().as("f"))
      .agg(min(col("z")).as("zmin"), max(col("z")).as("zmax"))
      .orderBy(col("zmin"))
      .collect()
    assert(ranges.length > 1, "range partitioning produced a single file; nothing to skip")
    // 16-bit z domain
    assert(ranges.forall(r => r.getAs[Long]("zmin") >= 0 && r.getAs[Long]("zmax") < 65536))
    // Equal z values land in one range partition, so file intervals must
    // be strictly disjoint — the property parquet min/max skipping needs.
    ranges.sliding(2).foreach {
      case Array(a, b) =>
        assert(b.getAs[Long]("zmin") > a.getAs[Long]("zmax"),
          s"overlapping z ranges: ${a} vs ${b}")
      case _ =>
    }
  }

  test("zValue is an exact, invertible Morton interleave on 8-bit pairs") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val pairs = Seq.fill(500)((rnd.nextInt(256).toLong, rnd.nextInt(256).toLong))
    def ref(x: Long, y: Long): Long =
      (0 until 8).map(i => (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))).sum
    pairs.toDF("x", "y")
      .select(col("x"), col("y"), Ingest.zValue(col("x"), col("y")).as("z"))
      .collect()
      .foreach { r =>
        val (x, y, z) = (r.getLong(0), r.getLong(1), r.getLong(2))
        assert(z == ref(x, y), s"interleave mismatch for ($x, $y)")
        val xi = (0 until 8).map(i => ((z >> (2 * i)) & 1L) << i).sum
        val yi = (0 until 8).map(i => ((z >> (2 * i + 1)) & 1L) << i).sum
        assert(xi == x && yi == y, s"Morton code not invertible at ($x, $y) -> $z")
      }
  }

  test("malformed JSONL lines route to _corrupt_record, clean rows survive") {
    val dirPath = java.nio.file.Files.createTempDirectory("graft_jsonl_corrupt")
    val f = dirPath.resolve("part-0.json")
    java.nio.file.Files.writeString(f,
      """{"doc_id": 1, "text": "ok", "lang": "en", "source": "s", "n_chars": 2}
        |this is not json at all
        |{"doc_id": "NOT_A_NUMBER", "text": "bad type", "lang": "en", "source": "s", "n_chars": 8}
        |{"doc_id": 2, "text": "also ok", "lang": "de", "source": "s", "n_chars": 7}
        |""".stripMargin)
    val df = Ingest.readDocumentsJsonl(spark, dirPath.toString).cache()
    val clean = df.filter(col("_corrupt_record").isNull)
    val corrupt = df.filter(col("_corrupt_record").isNotNull)
    assert(clean.count() == 2)
    assert(corrupt.count() == 2)
    assert(clean.select("doc_id").collect().map(_.getLong(0)).toSet == Set(1L, 2L))
  }
}
