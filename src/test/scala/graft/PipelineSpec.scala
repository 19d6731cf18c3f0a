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

  test("stage-1 fetch analog: archive lands, unpacks, is deleted; pipeline ingests the landing") {
    import java.nio.file.Paths
    // A tiny "remote" dataset: 20 documents as gzipped JSONL (the
    // arxiv-snapshot shape; transport is file: per the declared stub).
    val tmp = Files.createTempDirectory("graft_fetch")
    val rows = Tables.documents(spark, sfDir).limit(20).toJSON.collect()
    val gz = tmp.resolve("arxiv_docs.jsonl.gz")
    val os = new java.util.zip.GZIPOutputStream(Files.newOutputStream(gz))
    try os.write(rows.mkString("\n").getBytes("UTF-8")) finally os.close()

    val out = Files.createTempDirectory("graft_fetch_out").toString
    val m = PublicationsPipeline.runAll(spark, sfDir, out, Some(gz.toString))
    // ingest read the fetched landing, not the parquet source
    assert(m("stage1_documents") == 20, s"fetched ingest wrong count: $m")
    // unpacked file staged; archive deleted after extraction
    assert(Paths.get(s"$out/stage0_landing/arxiv_docs.jsonl").toFile.exists,
      "unpacked landing file missing")
    assert(!Paths.get(s"$out/stage0_landing/arxiv_docs.jsonl.gz").toFile.exists,
      "archive survived extraction")
    // downstream stages resume from the STAGED fetch output
    assert(m("stage2_cleaned_documents") > 0
      && m("stage2_cleaned_documents") <= 20, s"stage 2 not fed by fetch: $m")
  }

  test("stage 2 is resumable from staged output alone") {
    val out = Files.createTempDirectory("graft_pipeline").toString
    Tables.documents(spark, sfDir).write.parquet(s"$out/stage1_documents")
    val staged = spark.read.parquet(s"$out/stage1_documents")
    val cleaned = PublicationsPipeline.clean(staged)
    assert(cleaned.count() > 0)
    assert(cleaned.columns.contains("surrogate_id"))
  }

  test("curation pipeline: staged stages, monotone filtering, reconciliation checks pass") {
    import graft.pipeline.CurationPipeline
    val out = Files.createTempDirectory("graft_curation").toString
    val m = CurationPipeline.runAll(spark, sfDir, out)

    val stages = Seq("stage0_documents", "stage1_quality", "stage2_exact_dedup",
      "stage3_near_dedup", "stage3b_substring_scrub", "stage4_decontaminated",
      "stage5_selected", "stage6_mixed", "stage7_packed")
    stages.foreach { s =>
      assert(m.contains(s) && m(s) > 0, s"stage $s missing or empty: $m")
      assert(new java.io.File(s"$out/$s").isDirectory, s"stage $s not staged")
    }
    // every stage up to the mix filters — counts can only shrink
    val order = stages.take(8).map(m)
    assert(order.zip(order.tail).forall { case (a, b) => b <= a },
      s"stage counts grew: $m")
    // the scrub stage erases duplicated spans but keeps the schema: the
    // staged table reads back with the documents columns, text rewritten
    val scrubbed = spark.read.parquet(s"$out/stage3b_substring_scrub")
    assert(scrubbed.columns.toSeq ==
      Seq("doc_id", "text", "lang", "source", "n_chars"))
    assert(scrubbed.filter(
      org.apache.spark.sql.functions.expr("length(text) != n_chars")).count() == 0)
    assert(m("check_packed_rows_match") == 0, "packing dropped or invented docs")
    assert(m("check_token_reconciliation") == 0, "packed token stream lost tokens")
    // stage 8: the exemplar pool exists, is center-budget bounded, and
    // every exemplar survived the full filter chain
    assert(m.contains("stage8_exemplars") && m("stage8_exemplars") >= 1
      && m("stage8_exemplars") <= 8, s"exemplar pool out of bounds: $m")
    assert(m("check_exemplars_in_corpus") == 0,
      "an exemplar was drawn from a filtered-out document")
    val ex = spark.read.parquet(s"$out/stage8_exemplars")
    assert(ex.columns.toSeq == Seq("sel_round", "vec_id", "label", "d2"))
  }

  test("curation pack stage is resumable from staged output alone") {
    import graft.pipeline.CurationPipeline
    val out = Files.createTempDirectory("graft_curation").toString
    CurationPipeline.runAll(spark, sfDir, out)
    // Re-running the LAST stage from its staged upstream (no earlier
    // stage recomputed) reproduces the staged stage-7 rows exactly —
    // deterministic decisions make resume bit-stable.
    val mixed = spark.read.parquet(s"$out/stage6_mixed")
    val repacked = operators.Sampling.sequencePackDf(mixed)
    val staged = spark.read.parquet(s"$out/stage7_packed")
    assert(repacked.exceptAll(staged).isEmpty && staged.exceptAll(repacked).isEmpty,
      "pack-stage resume diverged from the staged output")
  }

  test("curation DSIR stage: sample_importance composes with mix_rebalance") {
    import org.apache.spark.sql.functions.col
    val docs = Tables.documents(spark, sfDir)
    val selected = docs.join(
      operators.Sampling.sampleImportanceDf(docs).select(col("doc_id")),
      Seq("doc_id"), "left_semi")
    val nSel = selected.count()
    assert(nSel > 0 && nSel < docs.count(),
      "DSIR selection must keep a non-empty strict subset")
    // The downstream mix stage consumes the selected slice directly —
    // its hash-mod decisions are doc_id-keyed, so composition yields a
    // subset of the selected ids with every kept source represented.
    val mixed = docs.join(
      operators.Sampling.mixRebalanceDf(spark, selected).select(col("doc_id")),
      Seq("doc_id"), "left_semi")
    assert(mixed.count() > 0, "rebalance over the selected slice is empty")
    assert(mixed.select("doc_id").exceptAll(selected.select("doc_id")).isEmpty,
      "mix stage emitted ids outside the selected slice")
  }

  test("materialized LSH index: probe-from-disk equals probe-from-recompute") {
    import graft.pipeline.CurationPipeline
    import org.apache.spark.sql.functions.col
    val out = Files.createTempDirectory("graft_lshidx").toString
    val docs = Tables.documents(spark, sfDir)
    val corpus = docs.filter(col("doc_id") % 10 =!= 7)
    val batch = docs.filter(col("doc_id") % 10 === 7)
    CurationPipeline.materializeLshIndex(spark, corpus, s"$out/lsh_index")
    val fromDisk = CurationPipeline
      .probeLshIndex(spark, s"$out/lsh_index", corpus, batch)
    // dedup_incremental IS the probe-from-recompute path over the same
    // 90/10 split — the materialized variant must agree exactly.
    val recompute = operators.Dedup.dedupIncremental(spark, sfDir)
    assert(fromDisk.exceptAll(recompute).isEmpty
      && recompute.exceptAll(fromDisk).isEmpty,
      "disk-probed index diverged from recompute")
  }

  test("materialized ANN index: disk probe equals ann_refine and prunes partitions") {
    import org.apache.spark.sql.functions.col
    val out = Files.createTempDirectory("graft_annidx").toString
    val e = Tables.embeddings(spark, sfDir)
    sources.AnnIndex.materialize(e, s"$out/ann_index")
    val queries = e.filter(col("vec_id") < 10)
    val fromDisk = sources.AnnIndex.probe(spark, s"$out/ann_index", queries, 5)
    // ann_refine IS the probe-from-recompute path: same multi-probe set,
    // same re-rank, same k — the on-disk index must agree exactly.
    val recompute = operators.Similarity.annRefine(spark, sfDir)
    assert(fromDisk.exceptAll(recompute).isEmpty
      && recompute.exceptAll(fromDisk).isEmpty,
      "disk-probed ANN index diverged from ann_refine")
    // The scan must read ONLY probed bucket partitions — partition
    // pruning is the point of the bucket-partitioned layout. Walk the
    // executed plan (through AQE query stages — the plan STRING
    // truncates before the leaves) and inspect the index scan's
    // partitionFilters directly.
    fromDisk.collect()
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case q: QueryStageExec => scans(q.plan)
      case f: FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(scans)
    }
    val indexScan = scans(fromDisk.queryExecution.executedPlan)
      .filter(_.relation.location.rootPaths.exists(_.toString.contains("ann_index")))
    assert(indexScan.nonEmpty, "no FileSourceScan over the index found")
    assert(indexScan.forall(s => s.partitionFilters.exists(
        _.references.exists(_.name == "bucket"))),
      s"index scan carries no bucket partition filter: " +
        indexScan.map(_.partitionFilters).mkString("; "))
  }

  test("materialized CMS sketch: heavy-hitter probe from disk equals probe-from-recompute") {
    val out = Files.createTempDirectory("graft_cms").toString
    val cms = operators.EventOps.eventUserCms(spark, sfDir)
    sources.SketchStore.writeCms(spark, cms, s"$out/user_cms")
    val fromDisk = operators.EventOps.heavyHittersWithCms(spark, sfDir,
      sources.SketchStore.readCms(spark, s"$out/user_cms"))
    val recompute = operators.EventOps.heavyHitters(spark, sfDir)
    assert(fromDisk.exceptAll(recompute).isEmpty
      && recompute.exceptAll(fromDisk).isEmpty,
      "disk-probed CMS diverged from recompute")
  }

  test("materialized bloom sketch: decontamination probe from disk equals probe-from-recompute") {
    val out = Files.createTempDirectory("graft_bloom").toString
    sources.SketchStore.writeBloom(spark,
      operators.Dedup.benchBloom(spark, sfDir), s"$out/bench_bloom")
    val fromDisk = operators.Dedup.decontaminateBloomWithFilter(spark, sfDir,
      sources.SketchStore.readBloom(spark, s"$out/bench_bloom"))
    val recompute = operators.Dedup.decontaminateBloom(spark, sfDir)
    assert(fromDisk.exceptAll(recompute).isEmpty
      && recompute.exceptAll(fromDisk).isEmpty,
      "disk-probed bloom diverged from recompute")
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

  test("orchestrator: bounded retries, deterministic order, run report") {
    import graft.pipeline.Orchestrator
    import graft.pipeline.Orchestrator._
    var attempts = 0
    var retriedAt = Seq.empty[Int]
    val report = Orchestrator.run(Seq(
      TaskDef("a")(() => ()),
      TaskDef("b_flaky", Seq("a"), retries = 2) { () =>
        attempts += 1
        if (attempts < 3) sys.error(s"transient #$attempts")
      },
      TaskDef("c", Seq("b_flaky"))(() => ())),
      onRetry = (_, n) => retriedAt :+= n)
    assert(report.allSucceeded, s"states: ${report.states}")
    assert(report.states("b_flaky") == Succeeded(3),
      "two retries then success must record attempts = 3")
    assert(retriedAt == Seq(1, 2), "backoff hook fires per failed attempt")
    assert(report.order == Seq("a", "b_flaky", "c"), "deterministic order")
  }

  test("orchestrator: ALL_SUCCESS skips downstream of a failure, " +
      "ALL_DONE closer still runs") {
    import graft.pipeline.Orchestrator
    import graft.pipeline.Orchestrator._
    var closerRan = false
    val report = Orchestrator.run(Seq(
      TaskDef("a")(() => ()),
      TaskDef("b_fails", Seq("a"), retries = 1)(() => sys.error("boom")),
      TaskDef("c_skipped", Seq("b_fails"))(() =>
        fail("ALL_SUCCESS task must not run after an upstream failure")),
      TaskDef("d_closer", Seq("b_fails", "a"), rule = AllDone) { () =>
        closerRan = true
      }))
    assert(report.states("b_fails") == Failed(2, "boom"),
      "retries = 1 means exactly two attempts")
    assert(report.states("c_skipped") == UpstreamFailed)
    assert(closerRan && report.states("d_closer") == Succeeded(1),
      "ALL_DONE runs regardless of upstream outcome")
    assert(report.failed == Seq("b_fails"))
  }

  test("orchestrator: cycles and unknown upstreams are declaration errors") {
    import graft.pipeline.Orchestrator
    import graft.pipeline.Orchestrator._
    intercept[IllegalArgumentException] {
      Orchestrator.run(Seq(
        TaskDef("a", Seq("b"))(() => ()), TaskDef("b", Seq("a"))(() => ())))
    }
    intercept[IllegalArgumentException] {
      Orchestrator.run(Seq(TaskDef("a", Seq("ghost"))(() => ())))
    }
  }

  test("runAllDag: staged DAG run matches runAll's manifest and resumes") {
    val out = Files.createTempDirectory("graft_dag").toString
    val (report, manifest) = PublicationsPipeline.runAllDag(spark, sfDir, out)
    assert(report.allSucceeded, s"states: ${report.states}")
    // same staged truths as the sequential runner
    val plain = PublicationsPipeline.runAll(spark, sfDir,
      Files.createTempDirectory("graft_dag_ref").toString)
    Seq("stage1_documents", "stage2_cleaned_documents", "stage4_fact_sales",
      "stage5_collab_graph", "check_orphan_fact_rows").foreach { k =>
      assert(manifest(k) == plain(k), s"$k: dag=${manifest(k)} seq=${plain(k)}")
    }
    // resume: a second run skips every staged task (Airflow state derived
    // from the data); only the cheap ALL_DONE check re-executes
    val (resumed, _) = PublicationsPipeline.runAllDag(spark, sfDir, out,
      resume = true)
    import graft.pipeline.Orchestrator.{Resumed, Succeeded}
    resumed.states.foreach { case (name, st) =>
      if (name == "check_orphan_fact_rows") assert(st == Succeeded(1))
      else assert(st == Resumed, s"$name should resume from staging, was $st")
    }
  }

  test("runAllDag stage7: GraphSink payloads replay the collaboration " +
      "graph, identically across a resumed DAG") {
    val out = Files.createTempDirectory("graft_dag_graph").toString
    val (report, manifest) = PublicationsPipeline.runAllDag(spark, sfDir, out)
    assert(report.allSucceeded, s"states: ${report.states}")
    assert(new java.io.File(s"$out/stage7_graph_load/statements.cypher").isFile,
      "the staged load must carry its statement manifest")
    def replay(): Seq[(String, Seq[String])] = {
      val calls = scala.collection.mutable.ArrayBuffer.empty[(String, Seq[String])]
      graft.sources.GraphSink.applyLoad(s"$out/stage7_graph_load",
        PublicationsPipeline.collabGraphUnits,
        (stmt, batch) => calls += ((stmt, batch)))
      calls.toSeq
    }
    val first = replay()
    // every staged row reaches the transport exactly once, and the
    // manifest count is that same total
    val nEdges = spark.read.parquet(s"$out/stage5_collab_graph").count()
    val nNodes = Tables.supplier(spark, sfDir).count()
    assert(first.map(_._2.size.toLong).sum == nNodes + nEdges,
      s"transport rows ${first.map(_._2.size).sum} != $nNodes + $nEdges")
    assert(manifest("stage7_graph_load") == nNodes + nEdges)
    // MERGE statements only (replay-idempotent load), endpoints before edges
    assert(first.forall { case (stmt, _) => stmt.contains("MERGE") })
    val firstEdge = first.indexWhere(_._1.contains("COLLABORATED_WITH"))
    val lastNode = first.lastIndexWhere(_._1.contains("MERGE (n:Supplier"))
    assert(lastNode >= 0 && firstEdge > lastNode,
      "edges must not replay before their endpoint nodes")
    // a RESUMED DAG leaves the staging intact, recounts it into the
    // manifest, and replays batch-identically
    val (resumed, manifest2) =
      PublicationsPipeline.runAllDag(spark, sfDir, out, resume = true)
    assert(resumed.states("stage7_graph_load") ==
      graft.pipeline.Orchestrator.Resumed)
    assert(manifest2("stage7_graph_load") == nNodes + nEdges,
      "resumed manifest must recount the staged payload lines")
    assert(replay() == first, "replay after resume must be batch-identical")
  }
}
