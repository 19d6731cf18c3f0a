package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextOps

/** Pre-bench amplification smoke (r12 lesson): the content-chunker's
  * first cut hid an O(words²·chunks) md5 blowup that only the FULL
  * sf0.1 bench caught (349 s → 1.9 s after the fix, 184×) — sf0.001
  * correctness runs were too small to feel it. This harness amplifies
  * the sf0.001 tables in memory (explode + salt — TESTDATA.md forbids
  * regenerating the parquet) along the two axes a complexity bug can
  * hide behind:
  *
  *   - LENGTH axis (documents.text repeated k× with per-repeat salt
  *     words): catches per-row superlinearity — the chunker class.
  *   - ROW axis (k salted copies of every document/event row):
  *     catches cross-row superlinearity — unbounded candidate pairs,
  *     accidental O(n²) self-joins.
  *
  * Each checked operator runs at a low and a high amplification
  * (4× apart) and its min-of-two wall times must scale
  * SUB-QUADRATICALLY: quadratic work grows ~16× across a 4× step, so
  * the gate is ratio ≤ 8 against a noise-clamped low time, with a
  * 1-second absolute floor (an operator whose high-amplification run
  * stays under a second cannot hide a blowup that matters). The
  * harness PROVES its own teeth below by reconstructing the first-cut
  * chunker shape (an array column's md5-pass defining expression
  * referenced inside a per-chunk lambda — re-evaluated per iteration
  * after ProjectCollapse inlines it) and asserting it IS flagged
  * while the shipped boundary-index chunker passes. (The intermediate
  * fold-based chunker ALSO passed nominally but with zero margin —
  * 8.3× under suite load, r13 — because its accumulator copied the
  * done-array per boundary; the boundary-index form is linear.)
  *
  * Round discipline: every NEWLY-REGISTERED operator joins
  * `lengthChecked` or `rowChecked` (whichever axis its cost rides) in
  * the round that adds it.
  */
class AmplificationSpec extends SparkSpec {

  private val FlagRatio = 8.0 // 4x amplification: linear ~4, quadratic ~16
  private val FloorSec = 1.0  // high-amp runs under this cannot matter
  private val ClampSec = 0.15 // low-amp noise clamp (scheduler jitter)

  /** documents with text length amplified k× (distinct salt word per
    * repeat so dedup/fingerprint ops see non-repetitive content).
    */
  private def docsLen(k: Int): DataFrame =
    Tables.documents(spark, sfDir)
      .withColumn("text",
        array_join(transform(sequence(lit(1), lit(k)),
          i => concat(col("text"), lit(" s"), i.cast("string"))), " "))
      .withColumn("n_chars", length(col("text")))

  /** documents with k salted row copies (unique doc_id, salted text so
    * copies are near- but not exact-duplicates).
    */
  private def docsRows(k: Int): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("*"), explode(sequence(lit(0), lit(k - 1))).as("amp"))
      .withColumn("doc_id", col("doc_id") * k + col("amp"))
      .withColumn("text",
        concat(col("text"), lit(" r"), col("amp").cast("string")))
      .withColumn("n_chars", length(col("text")))
      .drop("amp")

  /** lineitem with k salted row copies: order, supplier, AND part keys
    * all salted per copy, so the collaboration/co-purchase graphs become
    * k DISCONNECTED copies of the base graph — node count, edge count,
    * and BFS state all scale k× while per-copy structure (cofreq
    * counts, degrees, seeds' reach) is preserved. An accidental
    * all-pairs or cross-copy join blows up quadratically; the graph
    * family's declared cost (rounds × one edge scan) stays linear.
    */
  private def lineitemRows(k: Int): DataFrame =
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("*"), explode(sequence(lit(0), lit(k - 1))).as("amp"))
      .withColumn("l_orderkey", col("l_orderkey") * k + col("amp"))
      .withColumn("l_suppkey", col("l_suppkey") * k + col("amp"))
      .withColumn("l_partkey", col("l_partkey") * k + col("amp"))
      .drop("amp")

  /** events with k salted row copies (unique event_id, distinct users
    * per copy so session/user machinery scales in population).
    */
  private def eventsRows(k: Int): DataFrame =
    spark.read.parquet(s"$sfDir/events.parquet")
      .select(col("*"), explode(sequence(lit(0), lit(k - 1))).as("amp"))
      .withColumn("event_id", col("event_id") * k + col("amp"))
      .withColumn("user_id", col("user_id") * k + col("amp"))
      .drop("amp")

  /** Materialize a full amplified table dir: symlinks for the
    * untouched tables, parquet writes for the amplified ones — so
    * REGISTERED operators (which read by dir) run unmodified.
    */
  private def amplifiedDir(tag: String,
      replaced: Map[String, DataFrame]): String = {
    val out = java.nio.file.Files.createTempDirectory(s"graft_amp_$tag")
    val all = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    all.foreach { t =>
      replaced.get(t) match {
        case Some(df) =>
          df.write.mode("overwrite").parquet(s"$out/$t.parquet")
        case None =>
          java.nio.file.Files.createSymbolicLink(
            out.resolve(s"$t.parquet"),
            java.nio.file.Paths.get(s"$sfDir/$t.parquet"))
      }
    }
    out.toString
  }

  /** min-of-two wall time of a full materialization. */
  private def time(run: () => Unit): Double = {
    def once(): Double = {
      val t0 = System.nanoTime(); run(); (System.nanoTime() - t0) / 1e9
    }
    math.min(once(), once())
  }

  private def assertSubQuadratic(name: String, tLo: Double, tHi: Double): Unit = {
    val ratio = tHi / math.max(tLo, ClampSec)
    info(f"$name: $tLo%.2fs -> $tHi%.2fs ($ratio%.1fx across the 4x step)")
    assert(tHi < FloorSec || ratio <= FlagRatio,
      s"$name amplification blowup: ${tLo}s -> ${tHi}s " +
        f"($ratio%.1fx across a 4x amplification step; quadratic ~16x)")
  }

  // ---------------------------------------------------------------
  // Teeth: the r12 first-cut chunker MUST be flagged; the shipped
  // fold-based chunker MUST pass, on the same frames.
  // ---------------------------------------------------------------

  /** The first-cut shape, reconstructed: `bounds` (whose defining
    * expression contains a full per-word md5 pass) is referenced
    * inside the per-chunk transform lambda, so after ProjectCollapse
    * inlines it the md5 pass re-runs PER CHUNK — O(words²/4) md5s per
    * document. See the engine-portability note at Dedup.contentChunks.
    */
  private def firstCutChunker(df: DataFrame): DataFrame = {
    val hs = TextOps.hashesFold(col("w"))
    df.withColumn("bounds",
        concat(array(lit(0)),
          filter(sequence(lit(1), size(col("w"))),
            i => element_at(hs, i) % 4 === 0),
          array(size(col("w")))))
      .withColumn("chunks",
        filter(transform(sequence(lit(1), size(col("bounds")) - 1),
          j => array_join(slice(col("w"),
            element_at(col("bounds"), j) + 1,
            element_at(col("bounds"), j + 1)
              - element_at(col("bounds"), j)), " ")),
          s => s =!= ""))
      .select(explode(col("chunks")).as("chunk"))
  }

  // 100 docs: enough quadratic mass that the ~0.5 s fixed job overhead
  // cannot dilute the hi/lo ratio below the flag line (at 50 docs the
  // reconstructed bug measured 7.4x — past the linear ~4x but under the
  // 8x gate purely from overhead).
  private def chunkProbe(k: Int): DataFrame =
    docsLen(k).limit(100)
      .select(col("doc_id"), TextOps.words(col("text")).as("w"))

  test("harness teeth: the first-cut O(words^2) chunker IS flagged on " +
      "the length axis") {
    val tLo = time(() => firstCutChunker(chunkProbe(2)).count())
    val tHi = time(() => firstCutChunker(chunkProbe(8)).count())
    val ratio = tHi / math.max(tLo, ClampSec)
    assert(tHi >= FloorSec && ratio > FlagRatio,
      f"the reconstructed first-cut chunker should blow up (~16x) across " +
        f"the 4x length step but measured $tLo%.2fs -> $tHi%.2fs " +
        f"($ratio%.1fx) — the harness would NOT have caught r12's bug")
  }

  test("harness teeth: the shipped boundary-index chunker passes the " +
      "same length step") {
    val tLo = time(() =>
      operators.Dedup.contentChunkRows(chunkProbe(2), "w")
        .select(col("chunk")).count())
    val tHi = time(() =>
      operators.Dedup.contentChunkRows(chunkProbe(8), "w")
        .select(col("chunk")).count())
    assertSubQuadratic("contentChunkRows", tLo, tHi)
  }

  // ---------------------------------------------------------------
  // Registered-operator smoke: run each checked op at 4x and 16x
  // amplification of its cost axis via a materialized dir.
  // ---------------------------------------------------------------

  private lazy val lenDirLo = amplifiedDir("len4", Map("documents" -> docsLen(4)))
  private lazy val lenDirHi = amplifiedDir("len16", Map("documents" -> docsLen(16)))
  private lazy val rowDirLo = amplifiedDir("row4",
    Map("documents" -> docsRows(4), "events" -> eventsRows(4),
      "lineitem" -> lineitemRows(4)))
  private lazy val rowDirHi = amplifiedDir("row16",
    Map("documents" -> docsRows(16), "events" -> eventsRows(16),
      "lineitem" -> lineitemRows(16)))

  /** text-cost operators: per-document length is the axis.
    * r13 additions: the trigram-tail pair (hapax_ratio /
    * rare_ngram_mass — whose shingle lambda is exactly the shape the
    * r12 trap bites if the word array is ever inlined), ttr_diversity,
    * the BPE curve (per-word folds × 4 merge levels), and the byte-rate
    * audio clip scan.
    */
  private val lengthChecked = Seq(
    "content_chunk_dedup", "boilerplate_detect", "ngram_novelty",
    "collocations_dice",
    "hapax_ratio", "rare_ngram_mass", "ttr_diversity",
    "bpe_compression_curve", "multimodal_audio_clip")

  /** population-cost operators: row count is the axis.
    * r13 additions: the phash sweep (banded candidate volume must stay
    * banding-bounded), interarrival (user-partitioned lag), the CDC
    * conflict cells, and the inference trio whose moment folds must
    * stay single-pass.
    */
  private val rowChecked = Seq(
    "dedup_threshold_sweep", "dedup_minhash_lsh", "sessionize",
    "burst_detect",
    "multimodal_phash_sweep", "interarrival_stats", "cdc_conflict_audit",
    "friedman_test", "pii_inventory", "value_cvar",
    // r14: the Brandes loop over k disconnected graph copies — state
    // and edges scale k×, the per-round edge scan must stay linear.
    // (The residual-PQ pair is NOT enrolled, like the rest of the ann
    // family: the coarse quantizer's k = corpus/100 scales assignment
    // cost superlinearly BY DECLARED DESIGN — its scale story is the
    // probe-IO shape, pinned in the plan/shuffle-budget specs.)
    "betweenness_sampled", "closeness_sampled",
    // r14: per-row canonicalization + one canonical-keyed fold — must
    // stay linear as the doc population scales.
    "url_canonical_dedup")

  private def smoke(names: Seq[String], lo: String, hi: String): Unit =
    names.foreach { name =>
      test(s"$name scales sub-quadratically across a 4x amplification step") {
        val q = SparkEntry.queries(name)
        val tLo = time(() => q(spark, lo).count())
        val tHi = time(() => q(spark, hi).count())
        assertSubQuadratic(name, tLo, tHi)
      }
    }

  smoke(lengthChecked, lenDirLo, lenDirHi)
  smoke(rowChecked, rowDirLo, rowDirHi)
}
