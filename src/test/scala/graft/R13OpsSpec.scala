package graft

import org.apache.spark.sql.functions._

/** Semantic properties of the round-13 operators — each test pins an
  * invariant the DuckDB hash-compare cannot see (conservation laws,
  * monotonicity, cross-operator reconciliation, real-codec branches).
  */
class R13OpsSpec extends SparkSpec {

  test("jarque_bera: moments cover every order, JB >= 0, stat is " +
      "non-vacuous on this corpus") {
    val r = operators.Inference.jarqueBera(spark, sfDir).collect()(0)
    assert(r.getAs[Long]("n_orders") == Tables.orders(spark, sfDir).count())
    assert(r.getAs[Long]("jb_x1e6") >= 0L)
    assert(r.getAs[Long]("skew_x1e6") != 0L,
      "order totals are visibly skewed; a zero skew means a vacuous fold")
  }

  test("levene_bf: covers all docs, F >= 0, medians are real group members") {
    val r = operators.Inference.leveneBf(spark, sfDir).collect()(0)
    assert(r.getAs[Long]("n_total") ==
      Tables.documents(spark, sfDir).count())
    assert(r.getAs[Long]("k_groups") > 1)
    assert(r.getAs[Long]("ssb_fx") >= 0L && r.getAs[Long]("ssw_fx") > 0L)
  }

  test("friedman_test: doubled tie-averaged ranks hold the per-block " +
      "k(k+1) conservation") {
    val r = operators.Inference.friedmanTest(spark, sfDir).collect()(0)
    val k = r.getAs[Long]("k_treatments")
    val n = r.getAs[Long]("n_blocks")
    assert(k > 1 && n > 0)
    // conservation: sum over types of r2_sum = n * k(k+1); with the
    // Cauchy-Schwarz floor that bounds sum_r2_sq from below
    val sumSq = r.getAs[Long]("sum_r2_sq")
    val total = n * k * (k + 1)
    assert(sumSq >= total * total / k,
      "sum of squares cannot undershoot the equal-ranks floor")
    assert(r.getAs[Long]("chi2_x1e6") >= 0L)
  }

  test("mrr_eval: reciprocal-rank arithmetic reconciles with the first " +
      "relevant rank") {
    val r = operators.Retrieval.mrrEval(spark, sfDir).collect()(0)
    val rank = r.getAs[Long]("first_rel_rank")
    assert(rank >= 1 && rank <= 10)
    assert(r.getAs[Long]("rr_x2520") == 2520L / rank)
    assert(r.getAs[Long]("mrr_ppm") == (2520L / rank) * 1000000L / 2520L)
  }

  test("ttr_diversity: ratios bounded, weighted form reconciles with a " +
      "direct recount for one source") {
    val rows = operators.CorpusExt.ttrDiversity(spark, sfDir).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("weighted_ttr_ppm") <= 1000000L)
      assert(r.getAs[Long]("mean_doc_ttr_ppm") <= 1000000L)
    }
    val src = rows.head.getAs[String]("source")
    val d = Tables.documents(spark, sfDir).filter(col("source") === src)
      .select(size(split(col("text"), "\\s+")).cast("long").as("t"),
        size(array_distinct(split(col("text"), "\\s+"))).cast("long").as("y"))
      .agg(sum(col("t")), sum(col("y"))).collect()(0)
    assert(rows.head.getAs[Long]("weighted_ttr_ppm")
      == d.getLong(1) * 1000000L / d.getLong(0))
  }

  test("hapax_ratio: hapax bounded by vocab, mass share never exceeds " +
      "vocab share, non-vacuous on trigrams") {
    val rows = operators.CorpusExt.hapaxRatio(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("hapax") <= r.getAs[Long]("vocab"))
      assert(r.getAs[Long]("hapax_mass_ppm")
        <= r.getAs[Long]("hapax_vocab_ppm"))
      assert(r.getAs[Long]("hapax") > 0,
        "the trigram unit exists BECAUSE this corpus has a shingle " +
          "tail; zero hapax would mean the unit regressed to vacuous")
    }
  }

  test("rare_ngram_mass: rare mass is the sub-threshold tail of the " +
      "corpus shingle counts") {
    val rows = operators.CorpusExt.rareNgramMass(spark, sfDir).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("rare_occurrences")
        <= r.getAs[Long]("occurrences"))
      assert(r.getAs[Long]("rare_occurrences") > 0,
        "this corpus's trigram tail is rich; zero means a vacuous count")
    }
    // global conservation: every rare occurrence anywhere belongs to a
    // trigram with corpus frequency < 5, counted once per occurrence
    val w = Tables.documents(spark, sfDir)
      .select(split(col("text"), "\\s+").as("w"))
    val tris = w.select(explode(expr(
      "CASE WHEN size(w) >= 3 THEN transform(sequence(1, size(w) - 2), " +
        "i -> concat_ws(' ', w[i-1], w[i], w[i+1])) " +
        "ELSE array() END")).as("t"))
      .groupBy(col("t")).agg(count(lit(1)).as("c"))
    val rareTotal = tris.filter(col("c") < 5)
      .agg(sum(col("c"))).collect()(0).getLong(0)
    assert(rows.map(_.getAs[Long]("rare_occurrences")).sum == rareTotal)
  }

  test("pii_inventory: the injected PII is found at exactly the injected " +
      "rates") {
    val rows = operators.CorpusExt.piiInventory(spark, sfDir).collect()
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source")).collect()
    val bySrc = docs.groupBy(_.getAs[String]("source"))
    rows.foreach { r =>
      val ids = bySrc(r.getAs[String]("source")).map(_.getAs[Long]("doc_id"))
      assert(r.getAs[Long]("emails") >= ids.length,
        "one injected email per doc is the floor")
      assert(r.getAs[Long]("phones") == ids.count(_ % 3 == 0))
      assert(r.getAs[Long]("ips") == ids.count(_ % 5 == 0))
    }
  }

  test("bpe_compression_curve: k = 0 is the char baseline and every merge " +
      "is non-expanding") {
    val rows = operators.Tokenizer.bpeCompressionCurve(spark, sfDir)
      .collect().sortBy(_.getAs[Long]("merges_applied"))
    assert(rows.length == 4)
    assert(rows.head.getAs[Long]("compression_ppm") == 1000000L)
    val toks = rows.map(_.getAs[Long]("corpus_tokens"))
    assert(toks.zip(toks.tail).forall { case (a, b) => b <= a },
      "a BPE merge can only shrink the corpus token count")
    assert(toks.last < toks.head,
      "three learned merges must actually compress this corpus")
  }

  test("hubness_audit: list slots conserve exactly (40 probes x k = 5) " +
      "and hubness actually varies") {
    val rows = operators.Similarity.hubnessAudit(spark, sfDir).collect()
    assert(rows.length == 40)
    assert(rows.map(_.getAs[Long]("k_occurrences")).sum == 200L)
    assert(rows.map(_.getAs[Long]("k_occurrences")).distinct.length > 1)
  }

  test("knn_margin_audit: rank-1 dominates rank-k for every probe") {
    val rows = operators.Similarity.knnMarginAudit(spark, sfDir).collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      assert(r.getAs[Double]("cos_at_1") >= r.getAs[Double]("cos_at_k"))
      assert(r.getAs[Long]("margin_x1e6") >= 0L)
    }
  }

  test("multimodal_phash_sweep: monotone in the ceiling and reconciles " +
      "with the shipped <= 10 verdict") {
    val rows = operators.Multimodal.phashHammingSweep(spark, sfDir)
      .collect().sortBy(_.getAs[Long]("hamming_max"))
    val counts = rows.map(_.getAs[Long]("n_pairs"))
    assert(counts.zip(counts.tail).forall { case (a, b) => a <= b })
    val at10 = rows.find(_.getAs[Long]("hamming_max") == 10L).get
      .getAs[Long]("n_pairs")
    val shipped = operators.Multimodal.multimodalPhash(spark, sfDir).count()
    assert(at10 == shipped,
      "the sweep's h = 10 column IS the shipped operator's pair count")
  }

  test("multimodal_audio_clip: real branch equals stub on this text " +
      "corpus, clipping bounded") {
    val stub = operators.Multimodal.multimodalAudioClip(spark, sfDir)
      .collect().map(_.toString).sorted.toSeq
    val real = operators.Multimodal.multimodalAudioClipReal(spark, sfDir)
      .collect().map(_.toString).sorted.toSeq
    assert(stub == real, "every text payload must fall back to the stub rule")
    operators.Multimodal.multimodalAudioClip(spark, sfDir).collect()
      .foreach(r => assert(r.getAs[Long]("clipped") <= r.getAs[Long]("n_samples")))
  }

  test("clipStats: hand-built PCM counts its clipped samples exactly") {
    // 8 samples at 8 kHz: 3 past the +/-32760 threshold
    val samples: Array[Short] =
      Array(0, 1000, 32760, -32768, 20000, 32767, -5, -32759)
    val bos = new java.io.ByteArrayOutputStream()
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val data = java.nio.ByteBuffer.allocate(samples.length * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    samples.foreach(data.putShort)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data.array()), fmt, samples.length)
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val Some((n, clipped)) = operators.Multimodal.clipStats(bos.toByteArray)
    assert(n == 8L && clipped == 3L)
  }

  test("interarrival_stats: gap count conserves (events minus users) and " +
      "p50 <= p90") {
    val rows = operators.EventExt.interarrivalStats(spark, sfDir).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("p50_gap_min") <= r.getAs[Long]("p90_gap_min"))
      assert(r.getAs[Long]("mean_gap_ms") >= 0L)
    }
    val ev = Tables.events(spark, sfDir)
    val expected = ev.count() -
      ev.select(col("user_id")).distinct().count()
    assert(rows.map(_.getAs[Long]("n_gaps")).sum == expected,
      "every user contributes exactly (their events - 1) gaps")
  }

  test("value_cvar: the tail holds ~5% of events and its mean dominates " +
      "the distribution mean") {
    val rows = operators.EventExt.valueCvar(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_events")
      val tail = r.getAs[Long]("tail_n")
      assert(tail >= 1 && tail <= n,
        "nearest-rank p95 always selects a non-empty tail")
      assert(tail * 100 <= n * 6 + 100,
        s"the >= VaR bucket tail should stay near 5% (got $tail of $n)")
      // CVaR >= VaR's bucket floor in cents
      assert(r.getAs[Long]("cvar_mean_cents")
        >= r.getAs[Long]("var95_bucket") * 100)
    }
    assert(rows.map(_.getAs[Long]("cvar_mean_cents")).distinct.length > 1,
      "tails must differ across event types or the fold is vacuous")
  }

  test("cdc_conflict_audit: cell hierarchy holds (conflicts within " +
      "concurrent within all)") {
    val r = operators.EventExt.cdcConflictAudit(spark, sfDir).collect()(0)
    val (cells, conc, conf) = (r.getAs[Long]("n_cells"),
      r.getAs[Long]("concurrent_cells"), r.getAs[Long]("conflict_cells"))
    assert(conf <= conc && conc <= cells)
    assert(r.getAs[Long]("max_writers") >= 1L)
  }

  test("simpson_diversity: bounded in ppm, complements TTR (varies " +
      "across sources)") {
    val rows = operators.CorpusExt.simpsonDiversity(spark, sfDir).collect()
    rows.foreach { r =>
      val s = r.getAs[Long]("simpson_ppm")
      assert(s >= 0L && s <= 1000000L)
      assert(r.getAs[Long]("diversity_ppm") == 1000000L - s)
    }
    assert(rows.map(_.getAs[Long]("simpson_ppm")).distinct.length > 1,
      "sources hammer the closed vocabulary unevenly; a constant " +
        "Simpson index means a vacuous fold")
  }

  test("skipgram_pairs: 20 rows, ordered, pairs canonical, top count " +
      "reconciles with a direct recount") {
    val rows = operators.CorpusExt.skipgramPairs(spark, sfDir).collect()
    assert(rows.length == 20)
    val cnts = rows.map(_.getAs[Long]("cnt"))
    assert(cnts.zip(cnts.tail).forall { case (a, b) => a >= b })
    rows.foreach { r =>
      val Array(a, b) = r.getAs[String]("pair").split(" ")
      assert(a <= b, "pairs must be canonically ordered")
    }
    val top = rows.head
    val Array(x, y) = top.getAs[String]("pair").split(" ")
    val w = Tables.documents(spark, sfDir)
      .select(split(col("text"), "\\s+").as("w"))
    val recount = w.select(explode(expr(
      "concat(" +
        "CASE WHEN size(w) >= 2 THEN transform(sequence(1, size(w) - 1), " +
        "i -> concat_ws(' ', least(w[i-1], w[i]), greatest(w[i-1], w[i]))) " +
        "ELSE array() END, " +
        "CASE WHEN size(w) >= 3 THEN transform(sequence(1, size(w) - 2), " +
        "i -> concat_ws(' ', least(w[i-1], w[i+1]), greatest(w[i-1], w[i+1]))) " +
        "ELSE array() END)")).as("p"))
      .filter(col("p") === top.getAs[String]("pair")).count()
    assert(top.getAs[Long]("cnt") == recount)
    assert(x.nonEmpty && y.nonEmpty)
  }

  test("generalization_ladder: coarser rungs never shrink min_k, exactly " +
      "one recommendation, suppress rung is k-anonymous") {
    val rows = operators.Quality.generalizationLadder(spark, sfDir)
      .collect().sortBy(_.getAs[Long]("rung"))
    assert(rows.length == 6)
    // bands nest (floor(x/10^(g+1)) == floor(floor(x/10^g)/10)), so
    // widening can only merge groups: min_k monotone up, group count
    // monotone down
    val minKs = rows.map(_.getAs[Long]("min_k"))
    assert(minKs.zip(minKs.tail).forall { case (a, b) => b >= a })
    val groups = rows.map(_.getAs[Long]("n_groups"))
    assert(groups.zip(groups.tail).forall { case (a, b) => b <= a })
    // at most one rung carries the flag — the smallest k-clearing one
    assert(rows.count(_.getAs[Boolean]("recommended")) <= 1)
    assert(rows.map(_.getAs[Long]("anon_share_ppm")).distinct.length > 1,
      "the ladder must actually move residual risk on this corpus")
  }

  test("page_hinkley: PH statistic is non-negative, zero at the first " +
      "day, and the running-mean fold reconciles") {
    val rows = operators.EventExt.pageHinkley(spark, sfDir)
      .collect().sortBy(_.getAs[Long]("day_ord"))
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Long]("ph_x1e6") >= 0L))
    assert(rows.head.getAs[Long]("ph_x1e6") == 0L)
    // driver-side recompute of the m fold
    var cum = 0L; var m = 0L
    rows.zipWithIndex.foreach { case (r, idx) =>
      cum += r.getAs[Long]("cnt")
      m += r.getAs[Long]("cnt") * 1000000L - cum * 1000000L / (idx + 1)
      assert(r.getAs[Long]("m_x1e6") == m,
        s"m fold diverged at day index $idx")
    }
  }

  test("broadcast_plan_advisor: bytes model reconciles, verdict follows " +
      "the threshold, savings only on broadcast rows") {
    val rows = operators.Lakehouse.broadcastPlanAdvisor(spark, sfDir)
      .collect()
    assert(rows.length == 4)
    rows.foreach { r =>
      val bc = r.getAs[String]("decision") == "broadcast"
      assert(bc == (r.getAs[Long]("build_bytes_est") <= 10L * 1024 * 1024))
      assert(r.getAs[Long]("shuffle_bytes_avoided") ==
        (if (bc) r.getAs[Long]("build_bytes_est")
          + r.getAs[Long]("probe_bytes_est") else 0L))
    }
    // bytes model recount for the smallest build side (supplier):
    // 3 numeric cols x 8 + (len(s_name) + 4) per row
    val sup = rows.find(_.getAs[String]("build_side") == "supplier").get
    val d = Tables.supplier(spark, sfDir)
      .agg(count(lit(1)), sum(length(col("s_name")) + 4)).collect()(0)
    assert(sup.getAs[Long]("build_rows") == d.getLong(0))
    assert(sup.getAs[Long]("build_bytes_est")
      == d.getLong(0) * 24 + d.getLong(1))
  }

  test("selectivity_qerror: q >= 1, actuals strictly shrink as the " +
      "threshold climbs the domain") {
    val rows = operators.Lakehouse.selectivityQerror(spark, sfDir)
      .collect().sortBy(_.getAs[Long]("decile_threshold"))
    assert(rows.length == 5)
    val acts = rows.map(_.getAs[Long]("actual_rows"))
    assert(acts.zip(acts.tail).forall { case (a, b) => b <= a })
    rows.foreach { r =>
      val q = r.getAs[Long]("q_ppm")
      assert(q >= 1000000L, s"q-error is >= 1 by definition, got $q")
      assert(q < 3000000L,
        "a 32-bucket histogram on this distribution should estimate " +
          "within 3x; worse means the estimator is broken")
    }
  }
}
