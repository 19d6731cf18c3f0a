package graft

import org.apache.spark.sql.functions._

/** Invariants for the round-16 additions. Value-level parity with
  * DuckDB is the driver gate's job; these pin what the oracles can't
  * see — that the large-star/small-star components are label-for-label
  * identical to min-label propagation AND converge on a path graph
  * whose diameter exceeds every linear round budget (the O(log) claim,
  * exercised rather than asserted), that the min-label past-cap
  * dispatch actually fires, that the validated-PII detectors accept
  * exactly the injection census and reject every decoy (the
  * scd2_conformance disjoint-defect-class pattern), that the badwords
  * gate's tiers reconcile with the deterministic injection, and the two
  * r16 advice regressions (single-day scheduling calendar, the
  * quantile-normalize fallback bucket floor).
  */
class R16OpsSpec extends SparkSpec {

  private val specDir = "/root/testdata/sf0.01"

  // ---- connected components: star form vs min-label ----

  private def pathPairs(n: Int) = {
    val sp = spark
    import sp.implicits._
    (0L until (n - 1).toLong).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
  }

  test("dedup_components_star: label-for-label equal to min-label " +
      "propagation on the lake pair graph") {
    val pairs = operators.Dedup.dedupMinhashLsh(spark, specDir)
      .select(col("doc_a"), col("doc_b"))
      .transform(graft.functions.Iterate.checkpoint)
    def asSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("component"),
        r.getAs[Boolean]("is_canonical"))).toSet
    val minLabel = asSet(operators.Dedup.minLabelComponents(spark, pairs))
    val star = asSet(operators.Dedup.starComponents(spark, pairs))
    assert(star.nonEmpty)
    assert(star === minLabel)
  }

  test("dedup_components_star: converges on a 1024-node path — a " +
      "diameter min-label propagation could never cover inside the " +
      "60-round backstop, so success IS the logarithmic-round proof") {
    // min-label needs eccentricity rounds (1023 here); starComponents
    // fail-louds past 60 rounds, so completing at all demonstrates the
    // O(log n) behavior on the worst (deepest) shape per edge count.
    val out = operators.Dedup.starComponents(spark, pathPairs(1024))
      .collect()
    assert(out.length === 1024)
    assert(out.forall(_.getAs[Long]("component") === 0L))
    assert(out.count(_.getAs[Boolean]("is_canonical")) === 1)
  }

  test("min-label components: past-cap dispatch to the star form " +
      "ENGAGES (no fail-loud) and yields the exact labels") {
    spark.conf.set("spark.graft.ccMaxRounds", "3")
    try {
      // a 64-node path cannot converge in 3 min-label rounds; the old
      // behavior was require-fail — now it must dispatch and be exact
      val out = operators.Dedup.minLabelComponents(spark, pathPairs(64))
        .collect()
      assert(out.length === 64)
      assert(out.forall(_.getAs[Long]("component") === 0L))
    } finally spark.conf.unset("spark.graft.ccMaxRounds")
  }

  test("dedup_components: spark.graft.ccAlgorithm=star routes the " +
      "registered face through the star form with identical output") {
    val default = operators.Dedup.dedupComponents(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    spark.conf.set("spark.graft.ccAlgorithm", "star")
    try {
      val star = operators.Dedup.dedupComponents(spark, sfDir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
      assert(star === default)
      assert(star.nonEmpty)
    } finally spark.conf.unset("spark.graft.ccAlgorithm")
  }

  // ---- multi-level Louvain (r15 directive 3) ----

  test("louvain_multilevel: whole-community moves on a constructed " +
      "two-clique graph — exact hand-computed gain accounting across " +
      "levels") {
    val sp = spark
    import sp.implicits._
    // two w=10 triangles bridged by one w=1 edge; initial labeling
    // splits each triangle ({0,1}+{2}, {3,4}+{5}) so reaching the
    // two-clique optimum REQUIRES moving whole communities (a node-local
    // sweep from this labeling cannot merge {0,1} into {2} atomically)
    val pairs = Seq(
      (0L, 1L, 10L), (0L, 2L, 10L), (1L, 2L, 10L),
      (3L, 4L, 10L), (3L, 5L, 10L), (4L, 5L, 10L),
      (2L, 3L, 1L)).toDF("supp_a", "supp_b", "w")
    val comm = Seq((0L, 0L), (1L, 0L), (2L, 2L), (3L, 3L), (4L, 3L),
      (5L, 5L)).toDF("supp_key", "community")
    val row = operators.GraphExt
      .louvainMultilevelCore(spark, pairs, comm, comm).collect().head
    // hand computation: m = 61. Level-1 super graph {01, 2, 34, 5}:
    // k = 40/21/41/20, accepted moves 01→2 (gain 4·61·20−2·40·21 = 3200)
    // and 34→5 (4·61·20−2·41·20 = 3240); levels 2-3 have only the
    // bridge edge with negative gain → converged with zero moves.
    assert(row.getAs[Long]("n_moves_l1") === 2L)
    assert(row.getAs[Long]("n_moves_l2") === 0L)
    assert(row.getAs[Long]("n_moves_l3") === 0L)
    assert(row.getAs[Boolean]("converged"))
    assert(row.getAs[Long]("n_communities_final") === 2L)
    // q_l0 = (2440−1600) + (0−441) + (2440−1681) + (0−400) = 758
    assert(row.getAs[Long]("q_l0_num") === 758L)
    assert(row.getAs[Long]("sum_gain_levels") === 6440L)
    // exact cross-level accounting: q_final = q_l0 + Σ accepted gains,
    // and independently q(two-clique partition) = 2·(4·61·30 − 61²)
    assert(row.getAs[Long]("q_final_num") === 7198L)
    assert(row.getAs[Long]("q_final_num")
      === row.getAs[Long]("q_l0_num") + row.getAs[Long]("sum_gain_levels"))
    assert(row.getAs[Long]("q_den") === 14884L)
    assert(row.getAs[Long]("q_final_num") >= row.getAs[Long]("q_l0_num"))
  }

  // ---- validated PII classes (r15 directive 8) ----

  /** Driver-side Luhn reference (ISO/IEC 7812-1): position i from the
    * left of a 16-digit string doubles when i is odd.
    */
  private def luhnOk(s: String): Boolean =
    s.zipWithIndex.map { case (ch, i0) =>
      val d = ch - '0'
      if ((i0 + 1) % 2 == 1) { val t = 2 * d; if (t > 9) t - 9 else t }
      else d
    }.sum % 10 == 0

  test("pii_inventory: valid counts equal the injection census and " +
      "every decoy lands in the rejected column") {
    val nDocs = Tables.documents(spark, specDir).count()
    def census(m: Long) = (0L until nDocs).count(_ % m == 0).toLong
    val row = operators.CorpusExt.piiInventory(spark, specDir)
      .agg(sum("cards").as("cards"),
        sum("cards_rejected").as("cards_rejected"),
        sum("nids").as("nids"), sum("nids_rejected").as("nids_rejected"))
      .collect().head
    assert(row.getAs[Long]("cards") === census(7))
    assert(row.getAs[Long]("cards_rejected") === census(11))
    assert(row.getAs[Long]("nids") === census(13))
    assert(row.getAs[Long]("nids_rejected") === census(17))
    // each class must be non-empty or the detector was never exercised
    Seq(7L, 11L, 13L, 17L).foreach(m => assert(census(m) > 0))
  }

  test("pii_scrub: validator gates redaction — valid specimens redact, " +
      "checksum/rule-broken decoys pass through untouched") {
    // doc_id 0 carries all four specimens (0 ≡ 0 mod everything)
    val s = operators.TextAnalysis.piiScrub(spark, specDir)
      .filter(col("doc_id") === 0L).collect().head.getAs[String]("scrubbed")
    assert(s.contains("[CARD]"))
    assert(s.contains("[NID]"))
    assert(s.contains("[EMAIL]"))
    assert(s.contains("[URL]"))
    // the Luhn-broken card (prefix 5, shifted check digit) survives
    assert(s.contains("card: 5000000000000004"))
    assert(!luhnOk("5000000000000004"))
    // the area-666 national id survives
    assert(s.contains("id: 666-10-0001"))
    // and the redacted valid card really was Luhn-valid
    assert(luhnOk("4000000000000002"))
  }

  // ---- badwords gate (r15 directive 4) ----

  test("badwords_flag: tiers reconcile exactly with the deterministic " +
      "injection (every 4th doc flagged, every 16th dense)") {
    val nDocs = Tables.documents(spark, specDir).count()
    val rows = operators.Toxicity.badwordsFlag(spark, specDir).collect()
    assert(rows.length.toLong === nDocs)
    val blocked = rows.count(_.getAs[Boolean]("blocked")).toLong
    val dense = rows.count(_.getAs[String]("tier") == "dense").toLong
    assert(blocked === (0L until nDocs).count(_ % 4 == 0).toLong)
    assert(dense === (0L until nDocs).count(_ % 16 == 0).toLong)
    // clean docs have zero hits; dense docs exactly three
    assert(rows.filter(_.getAs[String]("tier") == "clean")
      .forall(_.getAs[Long]("bad_count") == 0L))
    assert(rows.filter(_.getAs[String]("tier") == "dense")
      .forall(_.getAs[Long]("bad_count") == 3L))
  }

  test("badwords_source_report: composes the lexicon gate with the " +
      "gopher gate (keep <= pass, keep <= docs - blocked, totals " +
      "reconcile with the flag table)") {
    val rep = operators.Toxicity.badwordsSourceReport(spark, specDir)
      .collect()
    assert(rep.nonEmpty)
    rep.foreach { r =>
      val n = r.getAs[Long]("n_docs")
      val blocked = r.getAs[Long]("n_blocked")
      val pass = r.getAs[Long]("n_gopher_pass")
      val keep = r.getAs[Long]("n_keep")
      assert(keep <= pass)
      assert(keep <= n - blocked)
      assert(blocked <= n)
    }
    val totBlocked = rep.map(_.getAs[Long]("n_blocked")).sum
    val flagBlocked = operators.Toxicity.badwordsFlag(spark, specDir)
      .filter(col("blocked")).count()
    assert(totBlocked === flagBlocked)
  }

  // ---- r16 advice regressions ----

  test("schedule_backfill_plan: a single-day lake has only an OPEN " +
      "interval — zero runs, not the sequence(1,0) descent") {
    val sp = spark
    import sp.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_oneday")
    try {
      // one day of events (nanos within 2024-01-01)
      val day0 = 1704067200L * 1000000000L
      Seq((0L, day0 + 1L), (1L, day0 + 7200L * 1000000000L))
        .toDF("event_id", "ts")
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      val out = operators.Scheduling.scheduleBackfillPlan(spark, dir.toString)
      assert(out.count() === 0L)
    } finally {
      import scala.jdk.CollectionConverters._
      val walk = java.nio.file.Files.walk(dir)
      try walk.iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
      finally walk.close()
    }
  }

  test("quantile_normalize: a degenerate rank-cell cap is floored to " +
      "the minimum fallback bucket count instead of collapsing the " +
      "calibration") {
    def run() = operators.Retrieval.quantileNormalize(spark, specDir)
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("norm_chars"))
      .toMap
    spark.conf.set("spark.graft.maxRankCells", "4")
    val at4 =
      try run() finally spark.conf.unset("spark.graft.maxRankCells")
    spark.conf.set("spark.graft.maxRankCells", "16")
    val at16 =
      try run() finally spark.conf.unset("spark.graft.maxRankCells")
    assert(at4 === at16)
    // floored ≠ degenerate: the 16-bucket calibration still spreads
    assert(at4.values.toSet.size >= 8)
  }
}
