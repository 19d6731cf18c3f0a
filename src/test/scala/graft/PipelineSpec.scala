package graft

import graft.pipeline.PublicationsPipeline
import java.nio.file.Files

/** Drives the full six-stage pipeline end-to-end on sf0.001 with real
  * staged parquet handoffs.
  */
class PipelineSpec extends SparkSpec {

  test("runAll stages every output and the DWH check passes") {
    val out = Files.createTempDirectory("graft_pipeline").toString
    val manifest = PublicationsPipeline.runAll(spark, sfDir, out)

    val expectedStages = Seq(
      "stage1_documents", "stage1_orders", "stage2_cleaned_documents",
      "stage3_enriched_orders", "stage4_fact_sales", "stage4_dim_customer",
      "stage4_bridge_author", "stage4_dim_references",
      "stage5_collab_graph", "stage6_trends", "stage6_topic_popularity",
      "stage6_graph_degree", "stage6_author_specialization",
      "stage6_institution_collab")
    expectedStages.foreach { s =>
      assert(manifest.contains(s), s"missing stage $s")
      assert(manifest(s) > 0, s"stage $s is empty")
      assert(new java.io.File(s"$out/$s").isDirectory, s"stage $s not staged")
    }
    // cleaning drops the rows whose identifiers are all null
    assert(manifest("stage2_cleaned_documents") <= manifest("stage1_documents"))
    // every fact row must resolve its customer dimension
    assert(manifest("check_orphan_fact_rows") == 0)
  }

  test("stage 2 is resumable from staged output alone") {
    val out = Files.createTempDirectory("graft_pipeline").toString
    Tables.documents(spark, sfDir).write.parquet(s"$out/stage1_documents")
    val staged = spark.read.parquet(s"$out/stage1_documents")
    val cleaned = PublicationsPipeline.clean(staged)
    assert(cleaned.count() > 0)
    assert(cleaned.columns.contains("surrogate_id"))
  }

  test("upsertWarehouse: re-run is a no-op, backfill slice merges without clobbering") {
    import org.apache.spark.sql.functions.col
    val out = Files.createTempDirectory("graft_wh").toString
    val full = PublicationsPipeline.upsertWarehouse(spark, sfDir, out)
    assert(full.values.forall(_ > 0), s"empty warehouse table in $full")

    // Re-running the identical load must not grow any table (the
    // reference's Postgres loader would double every row here).
    val rerun = PublicationsPipeline.upsertWarehouse(spark, sfDir, out)
    assert(rerun == full, s"re-run changed counts: $full -> $rerun")

    // A backfill batch restricted to a key slice only merges that slice;
    // every row outside the slice survives untouched.
    val slice = PublicationsPipeline.upsertWarehouse(spark, sfDir, out,
      df => if (df.columns.contains("customer_key"))
        df.filter(col("customer_key") % 10 === 0) else df.limit(5))
    assert(slice == full, s"backfill slice changed counts: $full -> $slice")
  }
}
