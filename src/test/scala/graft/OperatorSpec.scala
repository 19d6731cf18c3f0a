package graft

import org.apache.spark.sql.functions._

/** One test per registered operator (SURVEY.md §2): every query must run
  * on sf0.001 and return a well-formed result. Value-level correctness is
  * enforced by the DuckDB oracle gate (Verify + tools/check.py); these
  * specs pin invariants the oracle can't see (non-emptiness where
  * guaranteed, bounds, key uniqueness).
  */
class OperatorSpec extends SparkSpec {

  // Every registered query runs and yields a schema + rows.
  SparkEntry.registry.foreach { case (name, d) =>
    test(s"$name runs on sf0.001") {
      val df = d.fn(spark, sfDir)
      assert(df.columns.nonEmpty)
      assert(df.count() >= 0)
    }
  }

  test("entry flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql covers exactly the SQL-checked queries") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("q1_agg: six return-flag/status groups, positive sums") {
    val rows = operators.Relational.q1Agg(spark, sfDir).collect()
    assert(rows.length >= 4)
    rows.foreach { r =>
      assert(r.getAs[Double]("sum_qty") > 0)
      assert(r.getAs[Long]("count_order") > 0)
    }
  }

  test("window_rank: at most 3 rows per customer, ranks 1..3") {
    val df = operators.Relational.windowRank(spark, sfDir)
    val maxPerCustomer = df.groupBy("customer_key").count()
      .agg(max("count")).first().getLong(0)
    assert(maxPerCustomer <= 3)
    assert(df.agg(max("rank_in_customer")).first().getInt(0) <= 3)
  }

  test("collab_pairs: pairs are ordered and counted") {
    val df = operators.Analytics.collabPairs(spark, sfDir)
    assert(df.filter(col("supp_a") >= col("supp_b")).count() == 0)
    assert(df.filter(col("collab_count") < 1).count() == 0)
  }

  test("sessionize: session ids start at 1 and are monotone per user") {
    val df = operators.EventOps.sessionize(spark, sfDir)
    assert(df.agg(min("session_id")).first().getLong(0) == 1L)
  }

  test("asof_join: matched order date never exceeds event time") {
    val e = Tables.events(spark, sfDir).select(col("event_id"), col("ts"))
    val joined = operators.EventOps.asofJoin(spark, sfDir)
      .join(e, "event_id")
      .filter(col("last_order_date_ns").isNotNull)
    assert(joined.filter(col("last_order_date_ns") > col("ts")).count() == 0)
  }

  test("pagerank: probability-like scores, deterministic top-20") {
    val pr = operators.Analytics.pagerank(spark, sfDir).collect()
    assert(pr.length <= 20 && pr.nonEmpty)
    pr.foreach(r => assert(r.getAs[Double]("pagerank") > 0
      && r.getAs[Double]("pagerank") < 1))
    // descending with tiebreak
    val scores = pr.map(r => (-r.getAs[Double]("pagerank"), r.getAs[Long]("supp_key")))
    assert(scores.sameElements(scores.sorted))
  }

  test("salted join: all-hot, none-hot, and sampled regimes agree with the plain join") {
    val l = Tables.lineitem(spark, sfDir)
    val o = Tables.orders(spark, sfDir)
    def total(threshold: Long): (Long, java.math.BigDecimal) = {
      val r = operators.Relational.saltedJoin(l, o, threshold)
        .agg(count(lit(1)).as("n"),
          sum(col("l_extendedprice").cast("decimal(28,6)")).as("s"))
        .first()
      (r.getLong(0), r.getDecimal(1))
    }
    val plain = l.join(o, col("l_orderkey") === col("o_orderkey"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_extendedprice").cast("decimal(28,6)")).as("s"))
      .first()
    val expected = (plain.getLong(0), plain.getDecimal(1))
    assert(total(0L) === expected)             // every key salted
    assert(total(Long.MaxValue) === expected)  // no key salted
    assert(total(64L) === expected)            // production sampled threshold
  }

  test("dedup: jaccard bounded in [0,1]; minhash finds the near-dup pairs") {
    val mh = operators.Dedup.dedupMinhashLsh(spark, sfDir)
    assert(mh.filter(col("jaccard") < 0.5 || col("jaccard") > 1.0).count() == 0)
  }

  test("dedup_lines: one row per doc, clean docs round-trip, boilerplate found and removed") {
    val docs = Tables.documents(spark, sfDir)
    val out = operators.Dedup.dedupLines(spark, sfDir).persist()
    assert(out.count() == docs.count(), "line dedup must keep every document row")
    assert(out.filter(col("n_boiler") > col("n_lines")).count() == 0)
    assert(out.agg(sum(col("n_boiler"))).first().getLong(0) > 0,
      "the corpus has repeated 8-word lines; none flagged means the doc-freq count broke")
    // Untouched docs reassemble to the whitespace-normalized original.
    val roundTrip = out.filter(col("n_boiler") === 0)
      .join(docs, Seq("doc_id"))
      .filter(col("text_clean") =!= regexp_replace(trim(col("text")), "\\s+", " "))
    assert(roundTrip.count() == 0, "reassembly must preserve original line order and content")
    // Scrubbed docs lost exactly their boilerplate lines' words: each
    // boiler line is 8 words, except at most one trailing partial line
    // of 1..7 words — so kept ∈ [orig − 8·n_boiler, orig − 8·n_boiler + 7].
    val offBudget = out.filter(col("n_boiler") > 0)
      .join(docs, Seq("doc_id"))
      .select(
        size(split(col("text"), "\\s+")).cast("long").as("orig"),
        when(col("text_clean") === "", lit(0L))
          .otherwise(size(split(col("text_clean"), " ")).cast("long")).as("kept"),
        col("n_boiler"))
      .filter(col("kept") < col("orig") - col("n_boiler") * 8 ||
        col("kept") > col("orig") - col("n_boiler") * 8 + 7)
    assert(offBudget.count() == 0, "removed word volume must match flagged boilerplate lines")
    out.unpersist()
  }

  test("sequence_pack: offsets are exact prefix sums and sequences respect the boundary rule") {
    val out = operators.Sampling.sequencePack(spark, sfDir).persist()
    // Prefix consistency: per source, the last doc's offset + tokens
    // equals the source's total token volume.
    val byLast = out.groupBy(col("source"))
      .agg(max(col("stream_offset") + col("n_tokens")).as("stream_end"),
        sum(col("n_tokens")).as("total"))
      .filter(col("stream_end") =!= col("total"))
    assert(byLast.count() == 0, "running offset must be the exact per-source prefix sum")
    // Boundary rule: a sequence accumulates whole docs until one STARTS
    // past the cut, so its token total stays under budget + its own
    // largest member.
    val bySeq = out.groupBy(col("source"), col("seq_id"))
      .agg(sum(col("n_tokens")).as("seq_tokens"), max(col("n_tokens")).as("biggest"))
      .filter(col("seq_tokens") >= lit(1024L) + col("biggest"))
    assert(bySeq.count() == 0, "a packed sequence overflowed the concat-then-chunk rule")
    assert(out.select(col("source"), col("seq_id")).distinct().count() >
      out.select(col("source")).distinct().count(),
      "packing should produce multiple sequences per source at this corpus size")
    out.unpersist()
  }

  test("unpivot_melt: melting the pivot reproduces the plain long aggregation") {
    val melted = operators.Relational.unpivotMelt(spark, sfDir)
    val long = Tables.events(spark, sfDir)
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    // pivot zero-fills, so the melt is the long agg plus explicit zeros
    assert(melted.filter(col("n") > 0).exceptAll(long).count() == 0)
    assert(long.exceptAll(melted).count() == 0)
    val users = Tables.events(spark, sfDir).select(col("user_id")).distinct().count()
    assert(melted.count() == users * 5, "one melted row per (user, type) cell")
  }

  test("timeseries_fill: dense spine, zeros on gaps, LOCF carries observed values") {
    val df = operators.EventOps.timeseriesFill(spark, sfDir).persist()
    val perType = df.groupBy(col("event_type")).agg(count(lit(1)).as("n"),
      (max(col("hour")) - min(col("hour")) + 1).as("span"))
    assert(perType.filter(col("n") =!= col("span")).count() == 0,
      "every type must cover every hour of the global span exactly once")
    assert(df.filter(col("n_events") === 0).count() > 0,
      "this sparse series has gaps; none found means the spine join broke")
    assert(df.filter(col("n_events") > 0 && col("value_locf") =!= col("hour_value"))
      .count() == 0, "observed hours must carry their own value")
    assert(df.filter(col("n_events") === 0 && col("value_locf").isNull).join(
        df.filter(col("n_events") > 0)
          .groupBy(col("event_type")).agg(min(col("hour")).as("first_obs")),
        Seq("event_type"))
      .filter(col("hour") > col("first_obs")).count() == 0,
      "a gap after a type's first observation must carry a value forward")
    df.unpersist()
  }

  test("gopher_rules: pass is exactly the conjunction; the suite actually filters") {
    val df = operators.TextAnalysis.gopherRules(spark, sfDir).persist()
    val mismatch = df.filter(col("pass") =!=
      (col("r_word_count") && col("r_mean_word_len") && col("r_symbol_ratio")
        && col("r_stopwords") && col("r_diversity")))
    assert(mismatch.count() == 0)
    assert(df.filter(col("pass")).count() > 0, "a suite rejecting everything is miscalibrated")
    assert(df.filter(!col("pass")).count() > 0, "a suite passing everything filters nothing")
    df.unpersist()
  }

  test("importance_weights: one score per doc, and the target source scores highest on average") {
    val docs = Tables.documents(spark, sfDir)
    val out = operators.Sampling.importanceWeights(spark, sfDir)
      .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
      .persist()
    assert(out.count() == docs.count(), "every document needs a score")
    assert(out.filter(col("importance") <= 0).count() == 0,
      "every doc shares at least its own tokens with the raw distribution")
    // The ratio distribution must actually separate the target: src0's
    // own documents lean toward src0's unigram distribution by
    // construction, so their mean importance exceeds the others'.
    val Seq(tgt, rest) = Seq(col("source") === "src0", col("source") =!= "src0")
      .map(p => out.filter(p).agg(avg(col("importance"))).collect()(0).getDouble(0))
    assert(tgt > rest,
      s"target-source mean importance $tgt not above non-target mean $rest")
    out.unpersist()
  }

  test("mix_rebalance: kept rows are a subset; over-allocated sources keep more than squeezed ones") {
    val docs = Tables.documents(spark, sfDir)
    val kept = operators.Sampling.mixRebalance(spark, sfDir).persist()
    assert(kept.join(docs, Seq("doc_id"), "left_anti").count() == 0)
    val bySource = kept.groupBy(col("source")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val src0 = bySource.getOrElse("src0", 0L)
    val maxDefault = bySource.collect {
      case (s, n) if s != "src0" && s != "src1" => n
    }.foldLeft(0L)(math.max)
    assert(src0 > maxDefault,
      s"src0 (target 4%) kept $src0 docs, but a default-rate source kept $maxDefault")
    kept.unpersist()
  }

  test("skew_diagnose: three profiles with consistent integer stats") {
    val out = operators.Relational.skewDiagnose(spark, sfDir).collect()
    assert(out.length == 3, s"expected 3 profiles, got ${out.length}")
    val l = Tables.lineitem(spark, sfDir).count()
    val lRow = out.find(_.getString(0) == "lineitem.l_partkey").get
    assert(lRow.getAs[Long]("n_rows") == l, "profile row count drifted from the table")
    out.foreach { r =>
      assert(r.getAs[Long]("max_count") <= r.getAs[Long]("n_rows"))
      assert(r.getAs[Long]("max_share_ppm") <= 1000000L)
      // max ≥ mean per key ⇒ max·n_keys ≥ n_rows ⇒ the floor is ≥ 1.
      assert(r.getAs[Long]("skew_x") >= 1L, s"skew_x < 1 in $r")
    }
  }

  test("sample_temperature: smallest lang keeps all; dominant lang downsampled; mix flattens") {
    val docs = Tables.documents(spark, sfDir)
    val kept = operators.Sampling.sampleTemperature(spark, sfDir).persist()
    assert(kept.join(docs, Seq("doc_id"), "left_anti").count() == 0)
    val raw = docs.groupBy(col("lang")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val after = kept.groupBy(col("lang")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val minLang = raw.minBy(_._2)._1
    val maxLang = raw.maxBy(_._2)._1
    // √(n_min/n_s) = 1 for the smallest stratum — it survives intact.
    assert(after(minLang) == raw(minLang),
      s"smallest lang $minLang lost rows: ${raw(minLang)} -> ${after(minLang)}")
    assert(after(maxLang) < raw(maxLang),
      s"dominant lang $maxLang was not downsampled")
    // The whole point of temperature: the surviving mix is flatter than
    // the raw one (max/min count ratio strictly shrinks).
    val rawRatio = raw(maxLang).toDouble / raw(minLang)
    val afterRatio = after(maxLang).toDouble / after(minLang)
    assert(afterRatio < rawRatio,
      s"mix did not flatten: $rawRatio -> $afterRatio")
    kept.unpersist()
  }

  test("token_budget_plan: scarcest source pins the epoch cap, epochs follow " +
      "the temperature law, shares sum to one") {
    val out = operators.Sampling.tokenBudgetPlan(spark, sfDir).collect()
    assert(out.nonEmpty)
    val minTok = out.map(_.getAs[Long]("n_tokens")).min
    out.foreach { r =>
      val epochs = r.getAs[Double]("epochs")
      assert(epochs > 0.0 && epochs <= 4.0, s"epochs out of range in $r")
      // the cap flag marks exactly the scarcest source(s) — whose two
      // equal sqrt operands divide to EXACTLY 1.0
      assert(r.getAs[Boolean]("at_epoch_cap")
        == (r.getAs[Long]("n_tokens") == minTok), s"cap flag drifted in $r")
      if (r.getAs[Long]("n_tokens") == minTok)
        assert(epochs == 4.0, s"scarcest source must train exactly 4 epochs: $r")
      // target = floor(epochs · n_tokens): planned tokens ∝ √n_s
      assert(r.getAs[Long]("target_tokens")
        == math.floor(epochs * r.getAs[Long]("n_tokens").toDouble).toLong)
    }
    // exact-ppm shares of the implied budget sum to 1e6 up to the
    // per-row floor loss
    val ppm = out.map(_.getAs[Long]("share_ppm")).sum
    assert(ppm <= 1000000L && ppm > 1000000L - out.length,
      s"shares sum to $ppm ppm over ${out.length} sources")
    // temperature monotonicity: more raw tokens never plans FEWER tokens
    val byTok = out.sortBy(_.getAs[Long]("n_tokens"))
    byTok.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("target_tokens") <= b.getAs[Long]("target_tokens"),
          s"planned tokens not monotone in corpus size: $a vs $b")
      case _ => ()
    }
  }

  test("token_budget_plan: a zero-token source plans zero instead of " +
      "NaN-poisoning the budget") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta", "srcA"),
      (2L, "one two three four five six", "srcA"),
      (3L, "", "srcB"),
      (4L, "   ", "srcB")
    ).toDF("doc_id", "text", "source")
    val out = operators.Sampling.tokenBudgetPlanDf(docs).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    val b = out("srcB")
    assert(b.getAs[Long]("n_tokens") == 0L)
    assert(b.getAs[Double]("epochs") == 0.0
      && b.getAs[Long]("target_tokens") == 0L
      && b.getAs[Long]("share_ppm") == 0L
      && !b.getAs[Boolean]("at_epoch_cap"),
      s"zero-token source must plan zero: $b")
    // the positive source is now the scarcest: exactly the cap, whole
    // budget
    val a = out("srcA")
    assert(a.getAs[Double]("epochs") == 4.0 && a.getAs[Boolean]("at_epoch_cap"))
    assert(a.getAs[Long]("share_ppm") == 1000000L)
  }

  test("dedup_keep_best: the keeper is its cluster's quality argmax, one " +
      "row per multi-member cluster") {
    val best = operators.Dedup.dedupKeepBest(spark, sfDir).collect()
    val comp = operators.Dedup.dedupComponents(spark, sfDir)
      .select(col("doc_id"), col("component")).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val quality = operators.TextAnalysis.qualityScore(spark, sfDir)
      .select(col("doc_id"), col("quality_score")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val members = comp.groupBy(_._2).view.mapValues(_.map(_._1).sorted).toMap
    assert(best.map(_.getAs[Long]("component")).sorted.toSeq
      == members.keys.toSeq.sorted, "one output row per component")
    best.foreach { r =>
      val ms = members(r.getAs[Long]("component"))
      assert(r.getAs[Long]("n_members") == ms.length.toLong)
      assert(ms.length >= 2, "pair-graph components have >= 2 members")
      val keeper = r.getAs[Long]("keeper_doc_id")
      assert(ms.contains(keeper), "keeper must be a member")
      // argmax with deterministic lower-id tie-break
      val want = ms.map(id => (quality(id), -id)).max
      assert((r.getAs[Double]("keeper_quality"), -keeper) == want,
        s"keeper is not the quality argmax for component ${r}")
    }
    // the refinement must matter on real data: at least one cluster's
    // best-quality copy is NOT its min-id copy (else this operator is
    // indistinguishable from dedup_apply's rule and the test is vacuous)
    assert(best.exists(r => r.getAs[Long]("keeper_doc_id")
      != members(r.getAs[Long]("component")).min),
      "corpus exercises only the min-id tie-break path")
  }

  test("dedup_mix_shift: drops reconcile with dedup_apply, shares balance, " +
      "and the shift is non-vacuous") {
    val out = operators.Dedup.dedupMixShift(spark, sfDir).collect()
    out.foreach { r =>
      assert(r.getAs[Long]("n_after") <= r.getAs[Long]("n_before"))
      assert(r.getAs[Long]("share_before_ppm") <= 1000000L
        && r.getAs[Long]("share_after_ppm") <= 1000000L)
      assert(r.getAs[Long]("shift_ppm")
        == r.getAs[Long]("share_after_ppm") - r.getAs[Long]("share_before_ppm"))
    }
    // survivors reconcile exactly with the applied dedup
    assert(out.map(_.getAs[Long]("n_after")).sum
      == operators.Dedup.dedupApply(spark, sfDir).count())
    assert(out.map(_.getAs[Long]("n_before")).sum
      == Tables.documents(spark, sfDir).count())
    // floor-ppm shares sum to 1e6 up to per-source rounding, each side
    Seq("share_before_ppm", "share_after_ppm").foreach { c =>
      val s = out.map(_.getAs[Long](c)).sum
      assert(s <= 1000000L && s > 1000000L - out.length, s"$c sums to $s")
    }
    // the audit must have something to report on real data: dedup drops
    // docs from at least one source, so the mixture genuinely moves
    assert(out.exists(r => r.getAs[Long]("n_after") < r.getAs[Long]("n_before")),
      "corpus has no near-dup drops — shift audit is vacuous")
    assert(out.exists(_.getAs[Long]("shift_ppm") != 0L),
      "every source shifted by exactly zero ppm")
  }

  test("boilerplate_detect: reported groups equal a direct prefix recount") {
    val out = operators.TextAnalysis.boilerplateDetect(spark, sfDir).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[String]("prefix_md5"))
        -> (r.getAs[Long]("n_docs"), r.getAs[Long]("share_ppm"))).toMap
    assert(out.nonEmpty, "corpus has no template families — detector vacuous")
    // independent recount: group the collected corpus by (source,
    // 32-codepoint prefix) in plain Scala
    val docs = Tables.documents(spark, sfDir)
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val srcTotals = docs.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val want = docs.groupBy { case (s, t) =>
      val cps = t.codePoints().toArray
      (s, new String(cps, 0, math.min(32, cps.length)))
    }.filter(_._2.length >= 2)
    assert(out.size == want.size, s"group count ${out.size} != ${want.size}")
    want.foreach { case ((s, _), ms) =>
      val hits = out.filter(_._1._1 == s)
        .filter(_._2._1 == ms.length.toLong)
      assert(hits.nonEmpty, s"missing template group for source $s")
      hits.foreach { case (_, (n, ppm)) =>
        assert(ppm == n * 1000000L / srcTotals(s), "share_ppm drifted")
      }
    }
  }

  test("t_closeness_audit: t equals an independent exact TVD recount per group") {
    val out = operators.Quality.tClosenessAudit(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("nationkey"), r.getAs[Long]("bal_band"))
        -> (r.getAs[Long]("n_members"), r.getAs[Long]("t_ppm"),
          r.getAs[Boolean]("breach_02"))).toMap
    assert(out.nonEmpty)
    val rows = Tables.customer(spark, sfDir)
      .select(col("c_nationkey").cast("long"),
        floor(col("c_acctbal") / lit(1000d)).cast("long"), col("c_mktsegment"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val n = rows.length.toLong
    val segTotals = rows.groupBy(_._3).view.mapValues(_.length.toLong).toMap
    val groups = rows.groupBy(t => (t._1, t._2))
    assert(out.keySet == groups.keySet, "one row per quasi-identifier group")
    groups.foreach { case (k, ms) =>
      val nG = ms.length.toLong
      // exact integer TVD numerator: sum over ALL segments of
      // |c_gs*N - C_s*n_g|
      val num = segTotals.map { case (s, cS) =>
        math.abs(ms.count(_._3 == s).toLong * n - cS * nG)
      }.sum
      val tPpm = num * 1000000L / (2L * nG * n)
      val (gotN, gotT, gotB) = out(k)
      assert(gotN == nG && gotT == tPpm, s"group $k: got ($gotN,$gotT) want ($nG,$tPpm)")
      assert(gotB == (tPpm > 200000L), s"breach flag drifted for $k")
      assert(gotT <= 1000000L)
    }
    // the audit must discriminate on real data: both flag values occur
    assert(out.values.exists(_._3) && out.values.exists(!_._3),
      "t-closeness flag is constant across all groups — vacuous audit")
  }

  test("ndcg_eval: reconciles with an independent float DCG over the " +
      "engine's own top-k") {
    val r = operators.Retrieval.ndcgEval(spark, sfDir).collect()
    assert(r.length == 1)
    val row = r.head
    val dcg = row.getAs[Long]("dcg_x1e6") / 1e6
    val idcg = row.getAs[Long]("idcg_x1e6") / 1e6
    val ndcg = row.getAs[Long]("ndcg_ppm")
    assert(dcg > 0.0 && idcg >= dcg, s"DCG $dcg must not exceed ideal $idcg")
    assert(ndcg >= 0L && ndcg <= 1000000L)
    // independent recompute: rel from raw text, ranking from the
    // oracle-green bm25_topk output, discounts via runtime math.log
    val terms = Seq("spark", "hash", "merge")
    val rel = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
      .collect().map { d =>
        val toks = d.getString(1).split("\\s+").toSet
        d.getLong(0) -> terms.count(toks.contains).toLong
      }.toMap
    val top = operators.Retrieval.bm25Topk(spark, sfDir).collect()
      .map(_.getLong(0)).take(10)
    def w(rank: Int) = 1.0 / (math.log(rank + 1.0) / math.log(2.0))
    val wantDcg = top.zipWithIndex.map { case (id, i) =>
      ((1L << rel(id)) - 1L).toDouble * w(i + 1)
    }.sum
    val idealGains = rel.values.filter(_ > 0).toSeq.sortBy(-_).take(10)
    val wantIdcg = idealGains.zipWithIndex.map { case (g, i) =>
      ((1L << g) - 1L).toDouble * w(i + 1)
    }.sum
    assert(math.abs(dcg - wantDcg) < 1e-4, s"DCG $dcg vs recount $wantDcg")
    assert(math.abs(idcg - wantIdcg) < 1e-4, s"IDCG $idcg vs recount $wantIdcg")
    assert(math.abs(ndcg / 1e6 - wantDcg / wantIdcg) < 1e-4)
  }

  test("contamination_report: one row per benchmark doc; threshold and count invariants hold") {
    val out = operators.Dedup.contaminationReport(spark, sfDir).persist()
    val rows = out.collect()
    assert(rows.length == 5, s"expected 5 benchmark rows, got ${rows.length}")
    rows.foreach { r =>
      val (cand, cont, mx) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(cont <= cand, s"bench ${r.getLong(0)}: contaminated $cont > candidates $cand")
      // contaminated > 0 ⇔ some pair shares ≥ 3 shingles ⇔ max_shared ≥ 3
      assert((cont > 0) == (mx >= 3), s"bench ${r.getLong(0)}: cont=$cont but max=$mx")
      assert((cand > 0) == (mx >= 1), s"bench ${r.getLong(0)}: cand=$cand but max=$mx")
    }
    out.unpersist()
  }

  test("ann_ivf_trained: ranks well-formed; each query probes at most 2 trained cells") {
    val out = operators.Similarity.annIvfTrained(spark, sfDir).persist()
    val perQuery = out.groupBy(col("query_id"))
      .agg(count(lit(1)).as("n"), max(col("rank")).as("mx"), min(col("rank")).as("mn"),
        countDistinct(col("cid")).as("cells"))
      .collect()
    assert(perQuery.nonEmpty, "no probe results")
    perQuery.foreach { r =>
      assert(r.getAs[Int]("mn") == 1 && r.getAs[Int]("mx").toLong == r.getAs[Long]("n")
        && r.getAs[Long]("n") <= 3, s"rank sequence broken: $r")
      assert(r.getAs[Long]("cells") <= 2, s"probed more than nprobe=2 cells: $r")
    }
    out.unpersist()
  }

  test("ann_refine: ranks well-formed; multi-probe never worse than single-bucket at rank 1") {
    val refine = operators.Similarity.annRefine(spark, sfDir).persist()
    val lsh = operators.Similarity.annLsh(spark, sfDir)
    // per query: contiguous ranks starting at 1, at most 5
    val badRanks = refine.groupBy(col("query_id"))
      .agg(count(lit(1)).as("n"), max(col("rank")).as("mx"), min(col("rank")).as("mn"))
      .filter(col("mn") =!= 1 || col("mx") =!= col("n") || col("n") > 5)
    assert(badRanks.count() == 0, "rank sequence broken")
    // The probe union is a superset of the query's own bucket, so the
    // best refined candidate is at least as close as the best
    // single-bucket candidate, for every query.
    val worse = refine.filter(col("rank") === 1)
      .select(col("query_id"), col("cosine").as("refine_cos"))
      .join(lsh.filter(col("rank") === 1)
        .select(col("query_id"), col("cosine").as("lsh_cos")), Seq("query_id"))
      .filter(col("refine_cos") < col("lsh_cos"))
    assert(worse.count() == 0, "multi-probe rank-1 fell below single-bucket rank-1")
    refine.unpersist()
  }

  test("semdedup: one verdict per vector; cluster minima survive; both classes present") {
    val e = Tables.embeddings(spark, sfDir)
    val out = operators.Clustering.semdedup(spark, sfDir).persist()
    assert(out.count() == e.count(), "every vector needs a verdict")
    // Domination anchors on the minimum id, so a cluster's lowest vec_id
    // can never itself be a duplicate.
    val minima = out.groupBy(col("cluster")).agg(min(col("vec_id")).as("vec_id"))
      .select("vec_id")
    assert(out.join(minima, Seq("vec_id")).filter(col("is_dup")).count() == 0)
    assert(out.filter(col("is_dup")).count() > 0, "tau miscalibrated: nothing deduped")
    assert(out.filter(!col("is_dup")).count() > 0, "tau miscalibrated: everything deduped")
    out.unpersist()
  }

  test("window_range_frame: trailing-hour counts match a brute-force range self-join") {
    val out = operators.EventOps.windowRangeFrame(spark, sfDir).persist()
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), expr("ts div 1000").as("t_us"))
    assert(out.count() == ev.count())
    assert(out.filter(col("n_trailing_1h") < 1).count() == 0,
      "the current row is always inside its own trailing frame")
    val brute = ev.as("a")
      .join(ev.as("b"), col("a.user_id") === col("b.user_id")
        && col("b.t_us") >= col("a.t_us") - 3600000000L
        && col("b.t_us") <= col("a.t_us"))
      .groupBy(col("a.event_id").as("event_id"))
      .agg(count(lit(1)).as("n_brute"))
    val diff = out.join(brute, Seq("event_id"))
      .filter(col("n_trailing_1h") =!= col("n_brute"))
    assert(diff.count() == 0, "RANGE frame population must equal the brute-force window")
    out.unpersist()
  }

  test("grouping_sets_agg: layer totals reconcile and gid separates the layers") {
    val df = operators.Relational.groupingSetsAgg(spark, sfDir).persist()
    val total = Tables.orders(spark, sfDir).count()
    assert(df.select(col("gid")).distinct().collect().map(_.getLong(0)).toSet
      == Set(0L, 1L, 3L))
    Seq(0L, 1L).foreach { gid =>
      val layer = df.filter(col("gid") === gid)
        .agg(sum(col("n_orders"))).first().getLong(0)
      assert(layer == total, s"gid=$gid layer must partition all orders, saw $layer/$total")
    }
    val grand = df.filter(col("gid") === 3L)
    assert(grand.count() == 1 && grand.first().getAs[Long]("n_orders") == total)
    df.unpersist()
  }

  test("cluster_topics: every kmeans cluster gets 1..3 ranked keywords") {
    val perCluster = operators.Clustering.clusterTopics(spark, sfDir)
      .groupBy(col("cluster")).agg(count(lit(1)).as("n"), max(col("rank")).as("maxr"))
      .persist()
    val clusters = operators.Clustering.clusterKmeans(spark, sfDir)
      .select(col("cluster")).distinct().count()
    assert(perCluster.count() == clusters, "every populated cluster needs keywords")
    assert(perCluster.filter(col("n") < 1 || col("n") > 3).count() == 0)
    assert(perCluster.filter(col("maxr") > 3).count() == 0)
    perCluster.unpersist()
  }

  test("clustering sweep leaves no session-lifetime cache entries") {
    // The shared Lloyd assignment / tf frames ride eager checkpoints,
    // whose blocks release via GC — a persist() here would pin a
    // CacheManager entry for the rest of the session (the round-7 leak).
    spark.catalog.clearCache()
    operators.Clustering.clusterKmeans(spark, sfDir).count()
    operators.Clustering.semdedup(spark, sfDir).count()
    operators.Clustering.clusterTopics(spark, sfDir).count()
    assert(spark.sharedState.cacheManager.isEmpty,
      "a clustering query registered a CacheManager entry it never released")
  }

  test("ann_topk: 5 neighbors per query, self excluded, cosine in [-1,1]") {
    val df = operators.Similarity.annTopk(spark, sfDir)
    assert(df.filter(col("query_id") === col("neighbor_id")).count() == 0)
    assert(df.filter(abs(col("cosine")) > 1.0 + 1e-9).count() == 0)
    val perQuery = df.groupBy("query_id").count().collect()
    assert(perQuery.forall(_.getLong(1) == 5))
  }

  test("ann_lsh: bucket-restricted results are a subset of brute-force ranking domain") {
    val lsh = operators.Similarity.annLsh(spark, sfDir)
    assert(lsh.filter(col("rank") > 3).count() == 0)
  }

  test("dedup_embedding: LSH pairs are a subset of the exact label-blocked pairs, decent recall") {
    val e = Tables.embeddings(spark, sfDir)
    val a = e.select(col("vec_id").as("vec_a"), col("label"), col("embedding").as("ea"))
    val b = e.select(col("vec_id").as("vec_b"), col("label"), col("embedding").as("eb"))
    val exact = a.join(b, Seq("label"))
      .filter(col("vec_a") < col("vec_b"))
      .filter(graft.functions.VectorOps.cosine(col("ea"), col("eb")) >= 0.3)
      .select("vec_a", "vec_b")
    val lsh = operators.Similarity.dedupEmbedding(spark, sfDir).select("vec_a", "vec_b")
    assert(lsh.join(exact, Seq("vec_a", "vec_b"), "left_anti").count() == 0,
      "LSH must never invent a pair the exact formulation lacks")
    val recall = lsh.count().toDouble / exact.count().toDouble
    assert(recall > 0.2, s"banded-LSH recall collapsed: $recall")
  }

  test("explode_authors_struct: typed array<struct<name>> intermediate, positions dense") {
    val typed = operators.Cleaning.authorsStructTyped(spark, sfDir)
    val authorsField = typed.schema("authors").dataType
    authorsField match {
      case org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.StructType(fields), _) =>
        assert(fields.map(_.name).toSeq == Seq("name"))
        assert(fields.head.dataType == org.apache.spark.sql.types.StringType)
      case other => fail(s"authors should be array<struct<name:string>>, was $other")
    }
    val exploded = operators.Cleaning.explodeAuthorsStruct(spark, sfDir)
    assert(exploded.agg(min("author_pos")).first().getLong(0) == 0L)
    assert(exploded.filter(col("author_name") === "").count() == 0)
  }

  test("dwh_bridge_author: weights sum to 1 per publication") {
    val bad = operators.Dwh.bridgeAuthor(spark, sfDir)
      .groupBy("publication_key")
      .agg(sum("allocation_weight").as("w"))
      .filter(abs(col("w") - 1.0) > 1e-9)
    assert(bad.count() == 0)
  }

  test("dataset_split: every doc gets exactly one split, ratios near 80/10/10") {
    val df = operators.Sampling.datasetSplit(spark, sfDir).cache()
    val total = Tables.documents(spark, sfDir).count()
    assert(df.count() == total)
    val byShare = df.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1).toDouble / total).toMap
    assert(math.abs(byShare("train") - 0.8) < 0.1, s"train share: $byShare")
    assert(byShare.keySet == Set("train", "val", "test"))
  }

  test("sample_stratified: deterministic across runs, en downsampled below default strata") {
    val a = operators.Sampling.sampleStratified(spark, sfDir)
    val b = operators.Sampling.sampleStratified(spark, sfDir)
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
    val docs = Tables.documents(spark, sfDir)
    val enRate = a.filter(col("lang") === "en").count().toDouble /
      docs.filter(col("lang") === "en").count()
    assert(enRate < 0.25, s"en sampled at $enRate, expected ~0.10")
  }

  test("sample_weighted: favors heavier docs, plans as bounded top-k") {
    // sf0.01: at sf0.001 the corpus (~50 docs) is no larger than k=50,
    // so every doc is selected and the weighting is unobservable.
    val dir = "/root/testdata/sf0.01"
    val s = operators.Sampling.sampleWeighted(spark, dir)
    val selAvg = s.agg(avg(col("n_chars"))).head.getDouble(0)
    val allAvg = Tables.documents(spark, dir).filter(col("n_chars") > 0)
      .agg(avg(col("n_chars"))).head.getDouble(0)
    assert(selAvg > allAvg,
      s"weighted sample mean $selAvg should exceed corpus mean $allAvg")
    // Bounded per-partition heaps, never a global sort of the corpus.
    assert(s.queryExecution.executedPlan.toString.contains("TakeOrderedAndProject"),
      "top-k should plan as TakeOrderedAndProject")
  }

  test("repetition_score: bounded in [0,1), repeated text scores near 1") {
    val df = operators.TextAnalysis.repetitionScore(spark, sfDir)
    assert(df.filter(col("repetition") < 0 || col("repetition") >= 1).count() == 0)
    import spark.implicits._
    val loop = Seq((1L, ("spam ham " * 50).trim)).toDF("doc_id", "text")
      .createOrReplaceTempView("rep_probe")
    val bg = org.apache.spark.sql.GraftBridge.column(
      org.apache.spark.sql.graft.Bigrams(
        org.apache.spark.sql.GraftBridge.expression(col("text"))))
    val rep = spark.table("rep_probe")
      .select((lit(1.0) - size(array_distinct(bg)).cast("double")
        / size(bg).cast("double")).as("r")).first().getDouble(0)
    assert(rep > 0.9, s"looped text should be highly repetitive: $rep")
  }

  test("approx_percentiles: every group's sketch values sit in the exact band") {
    // The query computes the sketch-vs-exact comparison itself (within_bounds
    // = all three percentile_approx values inside exact q ± 0.01), so the
    // test only asserts the flag holds for every group — strictly stronger
    // than the old ±1 spot check on p50 alone.
    val df = operators.Relational.approxPercentiles(spark, sfDir)
    assert(df.count() > 0)
    assert(df.filter(!col("within_bounds")).count() == 0)
  }

  test("doc_chunk: chunks cover every word with 16-word overlap") {
    val df = operators.TextAnalysis.docChunk(spark, sfDir).cache()
    assert(df.filter(col("n_tokens") < 1 || col("n_tokens") > 64).count() == 0)
    // sum of tokens ≥ total words (overlap duplicates), and every doc appears
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), size(split(col("text"), "\\s+")).as("n_words"))
    val perDoc = df.groupBy("doc_id").agg(sum("n_tokens").as("chunked"))
      .join(docs, "doc_id")
    assert(perDoc.filter(col("chunked") < col("n_words")).count() == 0)
    assert(perDoc.count() == docs.count())
  }

  test("pii_scrub: no emails or URLs survive") {
    val df = operators.TextAnalysis.piiScrub(spark, sfDir)
    assert(df.filter(col("scrubbed").rlike("@")).count() == 0)
    assert(df.filter(col("scrubbed").rlike("https?://")).count() == 0)
    assert(df.filter(col("scrubbed").contains("[EMAIL]")).count() == df.count())
  }

  test("dwh_dim_references: (pid, doi) is a primary key") {
    val dups = operators.Dwh.dimReferences(spark, sfDir)
      .groupBy("pid", "doi").count().filter(col("count") > 1)
    assert(dups.count() == 0)
  }

  test("dedup_substring: untouched docs reassemble exactly; erased counts reconcile") {
    val df = operators.Dedup.dedupSubstring(spark, sfDir).cache()
    // the pass must bite on this corpus (cross-doc duplicated spans exist)
    assert(df.filter(col("n_dup_tokens") > 0).count() > 0)
    assert(df.filter(col("n_dup_tokens") > col("n_tokens")).count() == 0)
    // docs with no duplicated span keep their whitespace-normalized text
    val norm = Tables.documents(spark, sfDir).select(col("doc_id"),
      array_join(split(col("text"), "\\s+"), " ").as("norm_text"))
    assert(df.filter(col("n_dup_tokens") === 0).join(norm, "doc_id")
      .filter(col("text_clean") =!= col("norm_text")).count() == 0)
    // surviving token count is exactly n_tokens − n_dup_tokens
    assert(df.filter(length(col("text_clean")) > 0)
      .filter(size(split(col("text_clean"), " "))
        =!= col("n_tokens") - col("n_dup_tokens")).count() == 0)
    df.unpersist()
  }

  test("winnow_fingerprint: the winnowing window guarantee holds for every doc") {
    import org.apache.spark.sql.expressions.Window
    val ww = 4
    val fps = operators.TextAnalysis.winnowFingerprint(spark, sfDir).cache()
    // no duplicate (doc, pos, hash) rows survive the adjacent-run dedup
    assert(fps.groupBy("doc_id", "pos", "fp_hash").count()
      .filter(col("count") > 1).count() == 0)
    // every window of ww consecutive gram positions contains a selection:
    // consecutive selected positions can differ by at most ww, the first
    // must fall inside the first window and the last inside the last.
    val gaps = fps.withColumn("gap",
      col("pos") - lag("pos", 1).over(Window.partitionBy("doc_id").orderBy("pos")))
    assert(gaps.filter(col("gap") > ww).count() == 0)
    val grams = Tables.documents(spark, sfDir)
      .select(col("doc_id"), (size(split(col("text"), "\\s+")) - 2).as("m"))
      .filter(col("m") >= ww)
    val span = fps.groupBy("doc_id").agg(min("pos").as("first"), max("pos").as("last"))
      .join(grams, "doc_id")
    assert(span.filter(col("first") > ww).count() == 0)
    assert(span.filter(col("last") < col("m") - ww + 1).count() == 0)
    assert(span.count() == grams.count(), "a doc with >= ww grams emitted nothing")
    // and the selection genuinely compresses the gram stream
    val total = fps.count()
    assert(total < grams.agg(sum(col("m"))).first().getLong(0))
    fps.unpersist()
  }

  test("gopher_dup_ngrams: coverage fractions are true fractions and the signals fire") {
    val df = operators.TextAnalysis.gopherDupNgrams(spark, sfDir).cache()
    assert(df.count() == Tables.documents(spark, sfDir).count())
    // overlap-safe coverage: both fractions live in [0,1] even where
    // occurrences overlap (the naive count·len product exceeds 1 there)
    assert(df.filter(col("top_bigram_frac") < 0 || col("top_bigram_frac") > 1)
      .count() == 0)
    assert(df.filter(col("dup_trigram_frac") < 0 || col("dup_trigram_frac") > 1)
      .count() == 0)
    // the corpus genuinely contains repeated bigrams and trigram runs
    assert(df.filter(col("top_bigram_n") >= 2).count() > 0)
    assert(df.filter(col("dup_trigram_frac") > 0).count() > 0)
    df.unpersist()
  }

  test("ngram_containment: catches the asymmetric quoted-document case Jaccard misses") {
    import spark.implicits._
    // B quotes A whole inside much longer text: containment(A in B) = 1
    // but Jaccard is far below the 0.5 near-dup threshold — the exact
    // case dedup_minhash_lsh/ngram_jaccard structurally cannot flag.
    val quoted = (1 to 20).map(i => s"alpha$i").mkString(" ")
    val filler = (1 to 80).map(i => s"beta$i").mkString(" ")
    val unrelated = (1 to 50).map(i => s"gamma$i").mkString(" ")
    val docs = Seq(
      (1L, quoted), (2L, s"$quoted $filler"), (3L, unrelated))
      .toDF("doc_id", "text")
    val c = operators.Dedup.ngramContainmentDf(docs).collect()
    assert(c.length == 1)
    val r = c.head
    assert(r.getAs[Long]("doc_a") == 1L && r.getAs[Long]("doc_b") == 2L)
    assert(r.getAs[Double]("containment") == 1.0)
    // and the pair's Jaccard is indeed sub-threshold: |A|=18 3-shingles,
    // |B|=98, intersection 18 ⇒ jaccard ≈ 0.18
    assert(r.getAs[Long]("common") * 2 < 98)
    // on the lake corpus: every detected pair is a true containment at
    // the all-integer threshold, direction always smaller-into-larger
    val lake = operators.Dedup.ngramContainment(spark, sfDir).cache()
    assert(lake.count() > 0)
    assert(lake.filter(col("containment") < 0.8 || col("containment") > 1.0)
      .count() == 0)
    val sz = Tables.documents(spark, sfDir).select(col("doc_id"),
      size(graft.functions.TextOps.sortedShingles3(col("text"))).as("sz"))
    assert(lake
      .join(sz.select(col("doc_id").as("doc_a"), col("sz").as("sza")), "doc_a")
      .join(sz.select(col("doc_id").as("doc_b"), col("sz").as("szb")), "doc_b")
      .filter(col("sza") > col("szb")).count() == 0)
    lake.unpersist()
  }

  test("bpe_merges: greedy non-overlapping merges, hand-checkable on a toy corpus") {
    import spark.implicits._
    // The word "aaa" has TWO (a,a) symbol pairs but greedy leftmost
    // merges only the first — round 1 must count freq 2 yet produce
    // "aa a", and round 2 then merges (aa, a). Round 3 has no pairs
    // left and must emit no row (identically to the oracle's empty
    // winner).
    val rows = operators.Tokenizer.bpeMergesDf(Seq((1L, "aaa")).toDF("doc_id", "text"))
      .orderBy("merge_rank").collect()
    assert(rows.map(r => (r.getInt(0), r.getString(1), r.getString(2),
      r.getString(3), r.getLong(4))).toSeq ==
      Seq((1, "a", "a", "aa", 2L), (2, "aa", "a", "aaa", 1L)))
    // lake corpus: all three rounds fire; winner frequencies can only
    // fall round over round (a pair created by merge i occurs at most
    // freq(i) times, and every older pair already lost to winner i)
    val lake = operators.Tokenizer.bpeMerges(spark, sfDir)
      .orderBy("merge_rank").collect()
    assert(lake.length == 3)
    assert(lake.map(_.getAs[Long]("freq")).sliding(2).forall(p => p(0) >= p(1)))
    assert(lake.map(_.getAs[String]("merged")).distinct.length == 3)
  }

  test("split_leakage_audit: accounts for every near-dup pair; leakage flags are exact") {
    val audit = operators.Sampling.splitLeakageAudit(spark, sfDir).cache()
    val totalPairs = operators.Dedup.dedupMinhashLsh(spark, sfDir).count()
    assert(audit.agg(sum(col("n_pairs"))).first().getLong(0) == totalPairs,
      "audit must partition the full pair set across split-pair groups")
    assert(audit.filter(col("leaking") =!= (col("split_lo") =!= col("split_hi")))
      .count() == 0)
    // the hash split is independent of content, so on a corpus with
    // near-dups some pair straddles splits — the finding that makes the
    // audit worth running (dedup must precede dataset_split)
    assert(audit.filter(col("leaking")).count() > 0)
    audit.unpersist()
  }

  test("bpe_encode: learned merges compress, never across words, never below zero") {
    val enc = operators.Tokenizer.bpeEncode(spark, sfDir).cache()
    assert(enc.count() == Tables.documents(spark, sfDir).count())
    // merges only ever shrink the symbol stream, and cannot cross word
    // boundaries — so chars >= bpe tokens >= words
    assert(enc.filter(col("n_bpe_tokens") > col("n_char_syms")).count() == 0)
    val words = Tables.documents(spark, sfDir).select(col("doc_id"),
      size(split(col("text"), "\\s+")).cast("bigint").as("n_words"))
    assert(enc.join(words, "doc_id")
      .filter(col("n_bpe_tokens") < col("n_words")).count() == 0)
    // and the 3 learned merges genuinely bite corpus-wide
    assert(enc.filter(col("n_bpe_tokens") < col("n_char_syms")).count() > 0)
    enc.unpersist()
  }

  test("lm_score: every doc with a bigram scores, positively, over all its bigrams") {
    val df = operators.TextAnalysis.lmScore(spark, sfDir).cache()
    assert(df.filter(col("lm_score") <= 0 || col("lm_score").isNull).count() == 0)
    val toks = Tables.documents(spark, sfDir).select(col("doc_id"),
      (size(split(col("text"), "\\s+")) - 1).cast("bigint").as("nb"))
    assert(df.join(toks, "doc_id").filter(col("n_bigrams") =!= col("nb")).count() == 0)
    assert(df.count() == toks.filter(col("nb") >= 1).count())
    df.unpersist()
  }

  test("markov_transitions: transitions reconcile with session sizes and ppm sums hold") {
    val cm = operators.EventOps.markovTransitions(spark, sfDir).cache()
    // per-session transition count = session size - 1, summed corpus-wide
    val expected = operators.EventOps.sessionStats(spark, sfDir)
      .agg(sum(col("n_events") - 1)).collect()(0).getLong(0)
    assert(cm.agg(sum(col("n_transitions"))).collect()(0).getLong(0) == expected)
    // per-from probabilities sum to ~1e6 (floor loss < one ppm per cell)
    val byFrom = cm.groupBy(col("from_type"))
      .agg(sum(col("p_ppm")).as("s"), count(lit(1)).as("k")).collect()
    byFrom.foreach { r =>
      val (s, k) = (r.getAs[Long]("s"), r.getAs[Long]("k"))
      assert(s <= 1000000L && s > 1000000L - k, s"ppm sum $s over $k cells")
    }
    cm.unpersist()
  }

  test("label_propagation: every strong-graph node labeled once, labels are node ids") {
    val lab = operators.Analytics.labelPropagation(spark, sfDir).collect()
    val nodes = lab.map(_.getAs[Long]("supp_key"))
    assert(nodes.distinct.length == nodes.length, "a node was labeled twice")
    val nodeSet = nodes.toSet
    assert(lab.forall(r => nodeSet.contains(r.getAs[Long]("community"))),
      "a community label is not a graph node")
    // propagation actually coalesced labels: fewer communities than nodes
    val nComm = lab.map(_.getAs[Long]("community")).distinct.length
    assert(nComm < nodes.length || nodes.length <= 2,
      s"$nComm communities over ${nodes.length} nodes — nothing propagated")
  }

  test("span_corruption: masked spans reconstruct and sentinels pair up") {
    val rows = operators.Objectives.spanCorruption(spark, sfDir).collect()
    assert(rows.length == Tables.documents(spark, sfDir).count())
    rows.take(200).foreach { r =>
      val (n, m) = (r.getAs[Long]("n_tokens"), r.getAs[Long]("n_masked"))
      assert(m <= n)
      def words(s: String) = if (s.isEmpty) Array.empty[String] else s.split(" ")
      val inp = words(r.getAs[String]("input_text"))
      val tgt = words(r.getAs[String]("target_text"))
      val sentRe = "<extra_id_\\d+>"
      val inpSent = inp.count(_.matches(sentRe))
      val tgtSent = tgt.count(_.matches(sentRe))
      assert(inpSent == tgtSent, s"doc ${r.get(0)}: sentinel mismatch")
      // non-sentinel words across input+target reconstruct the doc exactly
      assert((inp.length - inpSent) + (tgt.length - tgtSent) == n,
        s"doc ${r.get(0)}: token accounting broke")
      assert(tgt.length - tgtSent == m)
    }
  }

  test("prefix_lm_split: the cut is ceil(3n/4) and the halves round-trip") {
    val rows = operators.Objectives.prefixLmSplit(spark, sfDir).collect()
    rows.take(200).foreach { r =>
      val (n, p) = (r.getAs[Long]("n_tokens"), r.getAs[Long]("n_prefix"))
      assert(p == (3 * n + 3) / 4)
      def words(s: String) = if (s.isEmpty) Array.empty[String] else s.split(" ")
      val pre = words(r.getAs[String]("prefix_text"))
      val tgt = words(r.getAs[String]("target_text"))
      assert(pre.length == p && pre.length + tgt.length == n)
    }
  }

  test("fim_split: thirds reconstruct the document and sentinels sit at the cuts") {
    val rows = operators.Objectives.fimSplit(spark, sfDir).collect()
    rows.take(200).foreach { r =>
      val n = r.getAs[Long]("n_tokens")
      assert(r.getAs[Long]("n_prefix") == n / 3)
      assert(r.getAs[Long]("n_middle") == 2 * n / 3 - n / 3)
      val psm = r.getAs[String]("psm_text")
      assert(psm.contains("<fim_suffix>") && psm.contains("<fim_middle>"))
      val nonSentinel = psm.split("\\s+").filterNot(w =>
        w == "<fim_suffix>" || w == "<fim_middle>").count(_.nonEmpty)
      assert(nonSentinel == n, s"doc ${r.get(0)}: $nonSentinel words vs $n")
    }
  }

  test("dataset_card: composition reconciles with the corpus and split shares sum") {
    val card = operators.Sampling.datasetCard(spark, sfDir).collect()
    val docs = Tables.documents(spark, sfDir)
    assert(card.map(_.getAs[Long]("n_docs")).sum == docs.count())
    val totalTokens = docs.agg(
      sum(size(split(col("text"), "\\s+")).cast("bigint"))).collect()(0).getLong(0)
    assert(card.map(_.getAs[Long]("n_tokens")).sum == totalTokens)
    card.groupBy(_.getAs[String]("split")).foreach { case (s, rs) =>
      val share = rs.map(_.getAs[Long]("share_ppm")).sum
      assert(share <= 1000000L && share > 1000000L - rs.length,
        s"split $s shares sum to $share")
    }
  }

  test("community_stats: members and edge weight fully accounted for") {
    val cs = operators.Analytics.communityStats(spark, sfDir).collect()
    val lab = operators.Analytics.labelPropagation(spark, sfDir).count()
    assert(cs.map(_.getAs[Long]("n_nodes")).sum == lab)
    // every strong edge is internal to one community or external to two:
    // W = sum(internal) + sum(external)/2
    val strongW = operators.Analytics.collabPairs(spark, sfDir)
      .filter(col("collab_count") >= 5)
      .agg(sum(col("collab_count"))).collect()(0).getLong(0)
    val internal = cs.map(_.getAs[Long]("internal_w")).sum
    val external = cs.map(_.getAs[Long]("external_w")).sum
    assert(external % 2 == 0, "crossing weight must double-count evenly")
    assert(internal + external / 2 == strongW,
      s"edge weight unaccounted: $internal + $external/2 != $strongW")
    cs.foreach(r => assert(r.getAs[Long]("cut_ppm") <= 1000000L))
  }

  test("pack_efficiency: totals reconcile with sequence_pack and fill math is exact") {
    val eff = operators.Sampling.packEfficiency(spark, sfDir).collect()
    val pack = operators.Sampling.sequencePack(spark, sfDir)
    val nDocs = pack.count()
    assert(eff.map(_.getAs[Long]("n_docs")).sum == nDocs)
    eff.foreach { r =>
      assert(r.getAs[Long]("max_docs_per_seq") >= 1)
      assert(r.getAs[Long]("n_seqs") <= r.getAs[Long]("n_docs"))
      val expected = r.getAs[Long]("total_tokens") * 1000000L /
        (r.getAs[Long]("n_seqs") * 1024L)
      assert(r.getAs[Long]("fill_ppm") == expected)
    }
  }

  test("dup_cluster_sizes: sizes >= 2, totals reconcile with components and dedup_apply") {
    val hist = operators.Dedup.dupClusterSizes(spark, sfDir).collect()
    assert(hist.nonEmpty)
    assert(hist.forall(_.getAs[Long]("cluster_size") >= 2))
    hist.foreach { r =>
      assert(r.getAs[Long]("n_docs") ==
        r.getAs[Long]("cluster_size") * r.getAs[Long]("n_clusters"))
    }
    val compDocs = operators.Dedup.dedupComponents(spark, sfDir).count()
    assert(hist.map(_.getAs[Long]("n_docs")).sum == compDocs)
  }

  test("source_quality_matrix: per-source counts reconcile and pass is the rule conjunction") {
    val m = operators.TextAnalysis.sourceQualityMatrix(spark, sfDir).collect()
    val n = Tables.documents(spark, sfDir).count()
    assert(m.map(_.getAs[Long]("n_docs")).sum == n)
    m.foreach { r =>
      val pass = r.getAs[Long]("n_pass")
      // the conjunction can pass at most as often as its weakest rule
      val ruleMins = Seq("n_word_count", "n_mean_word_len", "n_symbol_ratio",
        "n_stopwords", "n_diversity").map(r.getAs[Long](_)).min
      assert(pass <= ruleMins)
      assert(r.getAs[Long]("pass_ppm") == pass * 1000000L / r.getAs[Long]("n_docs"))
    }
  }

  test("lsh_band_stats: six bands, per-band docs reconcile, pair math is consistent") {
    val rows = operators.Dedup.lshBandStats(spark, sfDir).collect()
    assert(rows.map(_.getAs[Int]("band")).sorted.sameElements(0 until 6))
    val nDocs = rows.map(_.getAs[Long]("n_docs")).distinct
    assert(nDocs.length == 1, s"bands disagree on doc count: ${nDocs.toList}")
    rows.foreach { r =>
      val (buckets, docs) = (r.getAs[Long]("n_buckets"), r.getAs[Long]("n_docs"))
      assert(buckets <= docs && buckets >= 1)
      assert(r.getAs[Long]("max_bucket") <= docs)
      val colliding = r.getAs[Long]("n_colliding_docs")
      // every colliding doc contributes at least (sz-1)/2 >= 1/2 pair;
      // exact lower bound: pairs >= colliding / 2
      assert(r.getAs[Long]("n_cand_pairs") * 2 >= colliding)
      assert(colliding <= docs)
    }
  }

  test("langid_confusion: matrix reconciles with lang_id rows and shares are exact") {
    val cm = operators.TextAnalysis.langidConfusion(spark, sfDir).cache()
    val n = Tables.documents(spark, sfDir).count()
    assert(cm.agg(sum(col("n_docs"))).collect()(0).getLong(0) == n)
    // diagonal exists for the dominant declared language
    assert(cm.filter(col("declared_lang") === col("predicted_lang")).count() > 0)
    val byLang = cm.groupBy(col("declared_lang"))
      .agg(sum(col("share_ppm")).as("s"), count(lit(1)).as("k")).collect()
    byLang.foreach { r =>
      val (s, k) = (r.getAs[Long]("s"), r.getAs[Long]("k"))
      assert(s <= 1000000L && s > 1000000L - k, s"share sum $s over $k cells")
    }
    cm.unpersist()
  }

  test("html_strip: no tags survive, plain length reconciles, one row per doc") {
    val df = operators.Cleaning.htmlStrip(spark, sfDir).cache()
    assert(df.count() == Tables.documents(spark, sfDir).count())
    assert(df.filter(col("text_plain").rlike("<[^>]*>")).count() == 0)
    assert(df.filter(length(col("text_plain")) =!= col("n_chars_plain")).count() == 0)
    // double-decode guard: stripping an already-plain text is a no-op
    val fixpoint = df.select(col("doc_id"),
      trim(regexp_replace(regexp_replace(col("text_plain"), "<[^>]*>", " "),
        "\\s+", " ")).as("again"), col("text_plain"))
    assert(fixpoint.filter(col("again") =!= col("text_plain")).count() == 0)
    df.unpersist()
  }

  test("sentence_split: 1-based dense index per doc, non-empty trimmed sentences") {
    val df = operators.TextAnalysis.sentenceSplit(spark, sfDir).cache()
    assert(df.filter(col("sentence") === "" ||
      col("sentence") =!= trim(col("sentence"))).count() == 0)
    val perDoc = df.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n"), min(col("sent_idx")).as("mn"),
        max(col("sent_idx")).as("mx"))
    assert(perDoc.filter(col("mn") =!= 1L || col("mx") =!= col("n")).count() == 0)
    df.unpersist()
  }

  test("char_class_stats: classes partition the text exactly, ppm bounded") {
    val df = operators.TextAnalysis.charClassStats(spark, sfDir).cache()
    assert(df.count() == Tables.documents(spark, sfDir).count())
    assert(df.filter(col("n_other") < 0).count() == 0)
    assert(df.filter(
      col("n_lower") + col("n_upper") + col("n_digit") + col("n_space")
        + col("n_other") =!= col("n_chars")).count() == 0)
    assert(df.filter(col("alpha_ppm") < 0 || col("alpha_ppm") > 1000000L).count() == 0)
    df.unpersist()
  }

  test("embedding_norm_audit: per-label rows, norm ordering holds") {
    val rows = operators.Similarity.embeddingNormAudit(spark, sfDir).collect()
    val labels = Tables.embeddings(spark, sfDir).select(col("label")).distinct().count()
    assert(rows.length == labels)
    rows.foreach { r =>
      val (mn, mx, mean) = (r.getAs[Double]("min_norm"),
        r.getAs[Double]("max_norm"), r.getAs[Double]("mean_norm"))
      assert(mn > 0 && mn <= mx, s"norm bounds broken: $mn..$mx")
      assert(mean >= mn - 1e-6 && mean <= mx + 1e-6, s"mean $mean outside [$mn,$mx]")
    }
  }

  test("ann_nprobe_sweep: recall monotone in nprobe, np=2 reconciles with " +
      "ann_ivf_trained") {
    val rows = operators.Similarity.annNprobeSweep(spark, sfDir).collect()
      .map(r => r.getAs[Long]("np") -> r).toMap
    assert(rows.keySet == Set(1L, 2L, 3L, 4L))
    (1L to 4L).foreach { np =>
      val r = rows(np)
      assert(r.getAs[Long]("n_returned") == r.getAs[Long]("n_queries") * 3,
        "every probe level must fill its top-3")
      assert(r.getAs[Long]("n_hits") <= r.getAs[Long]("n_returned"))
    }
    (1L to 3L).foreach { np =>
      assert(rows(np).getAs[Long]("n_hits") <= rows(np + 1).getAs[Long]("n_hits"),
        "probing more cells can only add candidates — recall is monotone")
    }
    // cross-check: the shipped nprobe=2 index (ann_ivf_trained) must
    // score exactly the sweep's np=2 hit count against the same truth
    val truth = operators.Similarity.annTopk(spark, sfDir)
      .filter(col("rank") <= 3).select(col("query_id"), col("neighbor_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivfHits = operators.Similarity.annIvfTrained(spark, sfDir)
      .select(col("query_id"), col("neighbor_id")).collect()
      .count(r => truth((r.getLong(0), r.getLong(1)))).toLong
    assert(rows(2L).getAs[Long]("n_hits") == ivfHits,
      "sweep np=2 must equal the shipped index's recall")
    // non-vacuous: the curve must not be flat at zero
    assert(rows(4L).getAs[Long]("n_hits") > 0)
  }

  test("ann_recall_audit: one row per query, hits bounded by truth") {
    val rows = operators.Similarity.annRecallAudit(spark, sfDir).collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_truth") == 3L)
      val hits = r.getAs[Long]("n_hits")
      assert(hits >= 0 && hits <= 3)
      assert(r.getAs[Long]("recall_ppm") == hits * 1000000L / 3)
    }
  }

  test("dedup_sentences: boiler counts bounded, clean text loses exactly the boiler") {
    val df = operators.Dedup.dedupSentences(spark, sfDir).cache()
    assert(df.filter(col("n_boiler") > col("n_sents")).count() == 0)
    // surviving sentence count = n_sents - n_boiler (split text_clean back)
    val chk = df.select(col("doc_id"), (col("n_sents") - col("n_boiler")).as("kept"),
      col("text_clean"))
    val reSplit = chk.select(col("doc_id"), col("kept"),
      when(col("text_clean") === "", lit(0L))
        .otherwise(size(filter(
          transform(split(col("text_clean"), "[.!?]+"), s => trim(s)),
          s => s =!= "")).cast("long")).as("got"))
    // reassembly joins with spaces (no terminal punct), so the re-split
    // yields one segment per doc unless empty — check emptiness agreement
    assert(reSplit.filter(col("kept") === 0 && col("got") =!= 0).count() == 0)
    assert(reSplit.filter(col("kept") > 0 && col("got") === 0).count() == 0)
    df.unpersist()
  }

  test("snapshot_diff: change classes reconcile with the derivation rules") {
    val df = sources.Ingest.snapshotDiff(spark, sfDir).cache()
    val docs = Tables.documents(spark, sfDir).cache()
    val removed = docs.filter(col("doc_id") % 17 === 3).count()
    val changed = docs.filter(col("doc_id") % 17 === 5).count()
    val added = docs.filter(col("doc_id") % 17 === 7).count()
    assert(df.filter(col("change_type") === "removed").count() == removed)
    assert(df.filter(col("change_type") === "changed").count() == changed)
    assert(df.filter(col("change_type") === "added").count() == added)
    assert(df.count() == removed + changed + added)
    df.unpersist(); docs.unpersist()
  }

  test("dataset_manifest: digests are order-independent and change-sensitive") {
    val df = operators.Sampling.datasetManifest(spark, sfDir).cache()
    val docs = Tables.documents(spark, sfDir)
    assert(df.agg(sum(col("n_docs"))).collect()(0).getLong(0) == docs.count())
    // order independence: recompute from a reversed-order frame
    val again = operators.Sampling.datasetManifest(spark, sfDir)
    assert(df.exceptAll(again).count() == 0)
    // change sensitivity: xor with one extra hash differs
    val one = df.limit(1).collect()(0)
    assert(one.getAs[Long]("content_digest") !=
      (one.getAs[Long]("content_digest") ^ 0x123456L))
    df.unpersist()
  }

  test("bloom_join_prune: identical to the unpruned join (sketch is plan-only)") {
    val pruned = operators.RelationalExt.bloomJoinPrune(spark, sfDir)
    val plain = Tables.lineitem(spark, sfDir)
      .join(Tables.orders(spark, sfDir)
        .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n_items"))
    val cmp = pruned.select(col("o_orderpriority"), col("n_items"))
      .exceptAll(plain.select(col("o_orderpriority"), col("n_items")))
    assert(cmp.count() == 0)
    assert(pruned.count() == 2)
  }

  test("minhash_recall_audit: one summary row, hits bounded by both sides") {
    val r = operators.Dedup.minhashRecallAudit(spark, sfDir).collect()
    assert(r.length == 1)
    val (truth, hits, lsh) = (r(0).getAs[Long]("n_truth"),
      r(0).getAs[Long]("n_hits"), r(0).getAs[Long]("n_lsh"))
    assert(hits <= truth && hits <= lsh)
    assert(r(0).getAs[Long]("recall_ppm") ==
      hits * 1000000L / math.max(truth, 1L))
  }

  test("bootstrap_diff_ci: CI brackets the point difference, point diff " +
      "recomputes from the raw sides") {
    val r = operators.StatTests.bootstrapDiffCi(spark, sfDir).collect()(0)
    assert(r.getAs[Long]("n_resamples") == 64)
    val (lo, pt, hi) = (r.getAs[Long]("ci_lo_millichars"),
      r.getAs[Long]("diff_millichars"), r.getAs[Long]("ci_hi_millichars"))
    assert(lo < hi)
    assert(lo <= pt && pt <= hi)
    // recompute the point estimate from the raw top-2 sides
    val bySource = Tables.documents(spark, sfDir)
      .select(col("source"), col("n_chars")).collect()
      .groupBy(_.getAs[String]("source"))
    val top2 = bySource.toSeq
      .sortBy { case (s, rs) => (-rs.length, s) }.take(2)
    def meanMilli(rs: Array[org.apache.spark.sql.Row]) =
      rs.map(_.getAs[Long]("n_chars")).sum * 1000L / rs.length
    assert(r.getAs[Long]("n_docs_a") == top2(0)._2.length)
    assert(r.getAs[Long]("n_docs_b") == top2(1)._2.length)
    assert(pt == meanMilli(top2(0)._2) - meanMilli(top2(1)._2))
  }

  test("chunk_sharing_matrix: symmetric-complete pairs, shared bounded by " +
      "both sides, one cell recounted") {
    val rows = operators.Dedup.chunkSharingMatrix(spark, sfDir).collect()
    val nSources = Tables.documents(spark, sfDir)
      .select(col("source")).distinct().count().toInt
    assert(rows.length == nSources * (nSources - 1) / 2,
      "on this corpus every source pair shares at least one chunk, so " +
        "the matrix is complete")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_shared") <=
        math.min(r.getAs[Long]("n_a"), r.getAs[Long]("n_b")))
      assert(r.getAs[Long]("jaccard_ppm") ==
        r.getAs[Long]("n_shared") * 1000000L /
          (r.getAs[Long]("n_a") + r.getAs[Long]("n_b") -
            r.getAs[Long]("n_shared")))
    }
    // recount one cell with independent set arithmetic over the chunker
    val bySource = operators.Dedup.contentChunks(
        Tables.documents(spark, sfDir)
          .select(col("source"), split(col("text"), "\\s+").as("w")), "w")
      .select(col("source"), explode(col("chunks")).as("c"))
      .collect().groupBy(_.getAs[String]("source"))
      .map { case (s, rs) => s -> rs.map(_.getAs[String]("c")).toSet }
    val (sa, sb) = (rows.head.getAs[String]("source_a"),
      rows.head.getAs[String]("source_b"))
    assert(rows.head.getAs[Long]("n_shared") ==
      bySource(sa).intersect(bySource(sb)).size.toLong)
    assert(rows.head.getAs[Long]("n_a") == bySource(sa).size.toLong)
  }

  test("cdc_history_scd2: one window per change, gapless chains, current " +
      "rows reconcile with cdc_apply") {
    val hist = sources.Ingest.cdcHistoryScd2(spark, sfDir).collect()
    assert(hist.length == Tables.events(spark, sfDir).count(),
      "every change event owns exactly one validity window")
    // chains are gapless and boundary-shared by construction — verify
    hist.groupBy(_.getAs[Long]("user_id")).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getAs[Long]("lsn"))
      sorted.init.zip(sorted.tail).foreach { case (a, b) =>
        assert(a.getAs[Long]("valid_to_us") == b.getAs[Long]("valid_from_us"),
          "consecutive windows must share their boundary")
      }
      assert(sorted.last.isNullAt(sorted.last.fieldIndex("valid_to_us")))
      assert(sorted.init.forall(!_.getAs[Boolean]("is_current")),
        "only a key's last window may be current")
    }
    // the history's current rows ARE cdc_apply's table
    val current = hist.filter(_.getAs[Boolean]("is_current"))
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("lsn"), r.getAs[Long]("value_cents"))).toMap
    val applied = sources.Ingest.cdcApply(spark, sfDir).collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("last_lsn"), r.getAs[Long]("value_cents"))).toMap
    assert(current == applied,
      "current-flagged history rows must equal the collapsed state")
  }

  test("holt_winters: fold matches a driver-side recursion bit for bit, " +
      "seasonality improves on Holt's fit") {
    val r = operators.EventScience.holtWinters(spark, sfDir).collect()(0)
    val nsDay = 86400L * 1000 * 1000 * 1000
    val counts = Tables.events(spark, sfDir)
      .select(expr(s"ts div $nsDay").as("d")).groupBy(col("d")).count()
      .collect().map(row => row.getAs[Long]("d") -> row.getAs[Long]("count"))
      .toMap
    val d0 = counts.keys.min
    val d1 = counts.keys.max
    val days = (d0 to d1).toSeq
    val vals = days.map(d => counts.getOrElse(d, 0L).toDouble)
    var l = vals.head; var t = 0.0; var sse = 0.0
    val s = Array.fill(7)(0.0)
    days.tail.zip(vals.tail).foreach { case (d, x) =>
      val dw = ((d + 4) % 7).toInt
      val nl = 2e-1 * (x - s(dw)) + 8e-1 * (l + t)
      val nt = 1e-1 * ((2e-1 * (x - s(dw)) + 8e-1 * (l + t)) - l) + 9e-1 * t
      val ns = 3e-1 * (x - (2e-1 * (x - s(dw)) + 8e-1 * (l + t))) +
        7e-1 * s(dw)
      sse = sse + (x - (l + t + s(dw))) * (x - (l + t + s(dw)))
      l = nl; t = nt; s(dw) = ns
    }
    val fDw = ((d1 + 7 + 4) % 7).toInt
    assert(r.getAs[Long]("n_days") == vals.length)
    assert(r.getAs[Double]("level") == l, "level bit-exact")
    assert(r.getAs[Double]("trend") == t, "trend bit-exact")
    assert(r.getAs[Double]("seasonal_f7") == s(fDw))
    assert(r.getAs[Double]("forecast_7") == l + 7e0 * t + s(fDw))
    assert(r.getAs[Double]("sse_one_step") == sse, "sse bit-exact")
    // NOT asserted: HW-beats-Holt on fit — it holds at sf0.01+ (8963 vs
    // 9340) where the weekly wave has enough cycles, but reverses on
    // the short sf0.001 series; a cross-model fit claim is data-sized,
    // not an invariant. What IS invariant: the seasonal state must be
    // non-trivial (the fold actually learned a wave) and the fit is a
    // real accumulation.
    assert(r.getAs[Double]("seasonal_f7") != 0.0,
      "seasonal state never updated — the dow plumbing is broken")
    assert(sse > 0.0)
  }

  test("fleiss_kappa: exact agreement with a driver-side recount over the " +
      "three public gates") {
    val r = operators.TextAnalysis.fleissKappa(spark, sfDir).collect()(0)
    val g = operators.TextAnalysis.gopherRules(spark, sfDir)
      .select(col("doc_id"), col("pass")).collect()
      .map(x => x.getAs[Long]("doc_id") -> x.getAs[Boolean]("pass")).toMap
    val q = operators.TextAnalysis.qualityScore(spark, sfDir)
      .select(col("doc_id"), col("quality_score")).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        (x.getAs[Double]("quality_score") > 0.8)).toMap
    val rep = operators.TextAnalysis.repetitionScore(spark, sfDir)
      .select(col("doc_id"), col("n_bigrams"), col("n_distinct")).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        (x.getAs[Long]("n_distinct") * 5 >= x.getAs[Long]("n_bigrams") * 4))
      .toMap
    val xs = g.keys.toSeq.map { id =>
      Seq(g(id), q(id), rep(id)).count(identity).toLong
    }
    val n = xs.length.toLong
    val t = xs.sum
    val s1 = xs.map(x => x * (x - 1) + (3 - x) * (2 - x)).sum
    assert(r.getAs[Long]("n_docs") == n)
    assert(r.getAs[Long]("votes_pos") == t)
    assert(r.getAs[Long]("pbar_ppm") == s1 * 1000000L / (6 * n))
    val peNum = t * t + (3 * n - t) * (3 * n - t)
    assert(r.getAs[Long]("pe_ppm") == peNum * 1000000L / (9 * n * n))
    val den = 2 * (9 * n * n - peNum)
    assert(den != 0 && r.getAs[Long]("kappa_ppm") ==
      (3 * s1 * n - 2 * peNum) * 1000000L / den)
    // non-vacuous: votes must actually split (not all-0 or all-3)
    assert(xs.distinct.length > 1)
  }

  test("jl_projection_audit: all probe pairs, unbiased-estimator ratios " +
      "concentrate, distances recompute") {
    val rows = operators.Similarity.jlProjectionAudit(spark, sfDir).collect()
    assert(rows.length == 45, "C(10,2) probe pairs")
    rows.foreach { r =>
      assert(r.getAs[Long]("d_orig_sq") > 0 && r.getAs[Long]("d_proj_sq") > 0)
    }
    // the estimator is unbiased, so the MEAN ratio over 45 pairs must
    // sit near 1e6 even though single pairs scatter (JL concentration)
    val mean = rows.map(_.getAs[Long]("ratio_ppm")).sum / rows.length
    assert(mean > 700000L && mean < 1400000L,
      s"mean distortion ratio $mean ppm is too far from the unbiased 1e6")
    // recompute one pair's original distance straight off the vectors
    val vecs = Tables.embeddings(spark, sfDir).filter(col("vec_id") < 2)
      .orderBy(col("vec_id")).collect()
      .map(_.getAs[scala.collection.Seq[Float]]("embedding"))
    val expected = vecs(0).zip(vecs(1)).map { case (x, y) =>
      val d = math.floor(x.toDouble * 1000 + 0.5).toLong -
        math.floor(y.toDouble * 1000 + 0.5).toLong
      d * d
    }.sum
    val pair01 = rows.find(r =>
      r.getAs[Long]("a") == 0 && r.getAs[Long]("b") == 1).get
    assert(pair01.getAs[Long]("d_orig_sq") == expected)
  }

  test("holt_by_type: every per-key fold matches its driver-side recursion") {
    val rows = operators.EventScience.holtByType(spark, sfDir).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    val nsDay = 86400L * 1000 * 1000 * 1000
    val byType = Tables.events(spark, sfDir)
      .select(col("event_type"), expr(s"ts div $nsDay").as("d"))
      .groupBy(col("event_type"), col("d")).count().collect()
      .groupBy(_.getAs[String]("event_type"))
    assert(rows.keySet == byType.keySet, "one smoothed row per series")
    byType.foreach { case (tpe, days) =>
      val m = days.map(r => r.getAs[Long]("d") -> r.getAs[Long]("count")).toMap
      val vals = (m.keys.min to m.keys.max).map(d => m.getOrElse(d, 0L).toDouble)
      var l = vals.head; var t = 0.0; var sse = 0.0
      vals.tail.foreach { x =>
        val nl = 2e-1 * x + 8e-1 * (l + t)
        val nt = 1e-1 * ((2e-1 * x + 8e-1 * (l + t)) - l) + 9e-1 * t
        sse = sse + (x - (l + t)) * (x - (l + t))
        l = nl; t = nt
      }
      val r = rows(tpe)
      assert(r.getAs[Long]("n_days") == vals.length, s"$tpe day span")
      assert(r.getAs[Double]("level") == l, s"$tpe level bit-exact")
      assert(r.getAs[Double]("trend") == t, s"$tpe trend bit-exact")
      assert(r.getAs[Double]("sse_one_step") == sse, s"$tpe sse bit-exact")
    }
  }

  test("content_chunk_dedup: word mass conserved, savings formula exact, " +
      "chunks are content-anchored") {
    val r = operators.Dedup.contentChunkDedup(spark, sfDir).collect()(0)
    val totalWords = Tables.documents(spark, sfDir)
      .agg(sum(size(split(col("text"), "\\s+")).cast("bigint")))
      .collect()(0).getLong(0)
    assert(r.getAs[Long]("chunk_words_total") == totalWords,
      "chunk spans partition every document's word list exactly")
    assert(r.getAs[Long]("chunk_words_distinct") <=
      r.getAs[Long]("chunk_words_total"))
    assert(r.getAs[Long]("savings_ppm") ==
      (r.getAs[Long]("chunk_words_total") -
        r.getAs[Long]("chunk_words_distinct")) * 1000000L /
        r.getAs[Long]("chunk_words_total"))
    assert(r.getAs[Long]("savings_ppm") > 0,
      "this corpus must actually share chunks or the measure is vacuous")
    // THE content-defined property: perturbing a document's head does
    // not change chunks past the first boundary — fixed-size blocks
    // would shift every block after the insertion
    import spark.implicits._
    val doc = Tables.documents(spark, sfDir).select(col("text"))
      .head().getString(0)
    val shifted = "zzzinserted " + doc
    def chunksOf(s: String): Seq[String] =
      operators.Dedup.contentChunks(
          Seq(s).toDF("text").select(split(col("text"), "\\s+").as("w")), "w")
        .select(col("chunks")).collect()(0).getSeq[String](0)
    val a = chunksOf(doc)
    val b = chunksOf(shifted)
    assert(a.drop(1).toSet.subsetOf(b.toSet),
      "all chunks after the first boundary must survive a head insertion")
  }

  test("scd2_conformance: every injected defect class detected exactly, " +
      "classes partition the keys") {
    val r = operators.Quality.scd2Conformance(spark, sfDir).collect()(0)
    val c = Tables.customer(spark, sfDir)
      .select(col("c_custkey"), col("c_acctbal")).collect()
    val nOverlap = c.count(_.getAs[Long]("c_custkey") % 13 == 4).toLong
    val nGap = c.count(x => x.getAs[Double]("c_acctbal") < 0
      && x.getAs[Long]("c_custkey") % 13 == 9).toLong
    val nUnclosed = c.count(x => x.getAs[Double]("c_acctbal") >= 0
      && x.getAs[Long]("c_custkey") % 13 == 2).toLong
    assert(r.getAs[Long]("n_keys") == c.length)
    assert(r.getAs[Long]("n_overlap_keys") == nOverlap)
    assert(r.getAs[Long]("n_gap_keys") == nGap)
    assert(r.getAs[Long]("n_unclosed_keys") == nUnclosed)
    assert(r.getAs[Long]("n_clean_keys") ==
      c.length - nOverlap - nGap - nUnclosed,
      "defect classes are disjoint by construction, so they partition")
    Seq("n_overlap_keys", "n_gap_keys", "n_unclosed_keys").foreach { k =>
      assert(r.getAs[Long](k) > 0, s"$k: every detector must be exercised")
    }
  }

  test("holt_forecast: fold matches a driver-side recursion bit for bit") {
    val r = operators.EventScience.holtForecast(spark, sfDir).collect()(0)
    // rebuild the zero-filled daily series and run the recursion in
    // plain Scala — same IEEE ops in the same order must agree exactly
    val nsDay = 86400L * 1000 * 1000 * 1000
    val counts = Tables.events(spark, sfDir)
      .select(expr(s"ts div $nsDay").as("d")).groupBy(col("d")).count()
      .collect().map(row => row.getAs[Long]("d") -> row.getAs[Long]("count"))
      .toMap
    val d0 = counts.keys.min
    val d1 = counts.keys.max
    val vals = (d0 to d1).map(d => counts.getOrElse(d, 0L).toDouble)
    var l = vals.head; var t = 0.0; var sse = 0.0
    vals.tail.foreach { x =>
      val nl = 2e-1 * x + 8e-1 * (l + t)
      val nt = 1e-1 * ((2e-1 * x + 8e-1 * (l + t)) - l) + 9e-1 * t
      sse = sse + (x - (l + t)) * (x - (l + t))
      l = nl; t = nt
    }
    assert(r.getAs[Long]("n_days") == vals.length)
    assert(r.getAs[Double]("level") == l, "level must match bit for bit")
    assert(r.getAs[Double]("trend") == t)
    assert(r.getAs[Double]("sse_one_step") == sse)
    assert(r.getAs[Double]("forecast_7") == l + 7e0 * t)
    // non-vacuous: a flat series would have zero one-step error
    assert(sse > 0.0)
  }

  test("centroid_confusion: matrix conserves the corpus, diagonal beats " +
      "chance, row shares telescope") {
    val rows = operators.Similarity.centroidConfusion(spark, sfDir).collect()
    val nVecs = Tables.embeddings(spark, sfDir).count()
    assert(rows.map(_.getAs[Long]("n_vecs")).sum == nVecs,
      "every vector classifies to exactly one centroid")
    val labels = rows.map(_.getAs[Long]("true_label")).distinct
    val diag = rows.filter(r =>
        r.getAs[Long]("true_label") == r.getAs[Long]("pred_label"))
      .map(_.getAs[Long]("n_vecs")).sum
    assert(diag * labels.length > nVecs,
      "nearest-centroid accuracy must beat uniform chance — otherwise " +
        "the labels carry no geometry and the audit is vacuous")
    labels.foreach { l =>
      val row = rows.filter(_.getAs[Long]("true_label") == l)
      val shareSum = row.map(_.getAs[Long]("share_ppm")).sum
      assert(shareSum <= 1000000L && shareSum > 1000000L - row.length,
        s"label $l: floor-divided shares must telescope to 1e6 within " +
          s"one ulp per cell, got $shareSum over ${row.length} cells")
    }
  }

  test("cdc_apply: latest-LSN-wins, tombstones drop keys, change mass " +
      "conserved") {
    val out = sources.Ingest.cdcApply(spark, sfDir).collect()
    // independent recompute: per-user latest event via a driver-side sort
    val byUser = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("event_type"), col("value"))
      .collect().groupBy(_.getAs[Long]("user_id"))
    val expectSurvivors = byUser.filter { case (_, evs) =>
      evs.maxBy(_.getAs[Long]("event_id")).getAs[String]("event_type") != "error"
    }
    assert(out.length == expectSurvivors.size)
    out.foreach { r =>
      val evs = byUser(r.getAs[Long]("user_id"))
      val last = evs.maxBy(_.getAs[Long]("event_id"))
      assert(r.getAs[Long]("last_lsn") == last.getAs[Long]("event_id"))
      assert(r.getAs[Long]("value_cents") ==
        math.floor(last.getAs[Double]("value") * 100 + 0.5).toLong)
      assert(r.getAs[Long]("n_changes") == evs.length,
        "n_changes counts the FULL changelog depth for the key")
      assert(r.getAs[String]("last_op") != "D")
    }
    // non-vacuous: some keys must actually be tombstoned at this SF
    assert(out.length < byUser.size)
  }

  test("scd2_point_in_time: validity windows tile time — every order lands " +
      "in exactly one segment") {
    val rows = operators.Relational.scd2PointInTime(spark, sfDir).collect()
    val nOrders = Tables.orders(spark, sfDir).count()
    assert(rows.map(_.getAs[Long]("n_orders")).sum == nOrders,
      "as-of windows must partition the fact table: no drops, no fan-out")
    val totalCents = Tables.orders(spark, sfDir)
      .agg(sum(expr("CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)")))
      .collect()(0).getLong(0)
    assert(rows.map(_.getAs[Long]("revenue_cents")).sum == totalCents)
    assert(rows.exists(_.getAs[String]("c_mktsegment") == "DELINQUENT"),
      "the cut sits inside the order span, so the new window carries orders")
  }

  test("bootstrap_mean_ci: CI brackets the point estimate, resample b=1 " +
      "recomputes exactly") {
    val r = operators.StatTests.bootstrapMeanCi(spark, sfDir).collect()
    assert(r.length == 1)
    val row = r(0)
    val (lo, pt, hi) = (row.getAs[Long]("ci_lo_millicents"),
      row.getAs[Long]("mean_millicents"), row.getAs[Long]("ci_hi_millicents"))
    assert(row.getAs[Long]("n_resamples") == 64)
    assert(lo < hi, "a 90% interval over varying resamples cannot be a point")
    assert(lo <= pt && pt <= hi,
      "at this SF the point estimate sits inside its own 90% CI")
    // independent recompute of resample b=1: same salt-keyed hash ladder
    val ths = Seq(6171992L, 12343985L, 15429982L, 16458647L, 16715813L,
      16767247L, 16775819L)
    val (nW, sW) = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"),
        expr("CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)").as("cents"))
      .collect()
      .foldLeft((0L, 0L)) { case ((n, s), o) =>
        val key = s"${o.getAs[Long]("o_orderkey")}:1"
        val u = java.lang.Long.parseLong(
          java.security.MessageDigest.getInstance("MD5").digest(
            key.getBytes("UTF-8")).take(3).map("%02x".format(_)).mkString, 16)
        val w = ths.indexWhere(u < _) match { case -1 => 7L; case k => k.toLong }
        (n + w, s + w * o.getAs[Long]("cents"))
      }
    val b1 = operators.StatTests.bootstrapResampleMeans(spark, sfDir)
      .filter(col("b") === 1).collect()(0)
    assert(b1.getAs[Long]("n_w") == nW && b1.getAs[Long]("s_w") == sW,
      "resample 1's Poisson weights must match a driver-side md5 recount")
  }

  test("ngram_novelty: first doc fully novel, novel mass equals distinct " +
      "trigram types") {
    val rows = operators.TextAnalysis.ngramNovelty(spark, sfDir).collect()
    val nDocs = Tables.documents(spark, sfDir).count()
    assert(rows.length == nDocs, "one row per document")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_novel") <= r.getAs[Long]("n_shingles"),
        "a doc cannot introduce more types than it contains")
    }
    // the minimum doc_id is first-toucher for ALL of its trigrams
    val first = rows.minBy(_.getAs[Long]("doc_id"))
    assert(first.getAs[Long]("novelty_ppm") == 1000000L)
    // conservation: every distinct trigram type is novel in exactly one doc
    val totalTypes = Tables.documents(spark, sfDir)
      .select(explode(graft.functions.TextOps.shingles3(
        graft.functions.TextOps.words(col("text")))).as("t"))
      .select(col("t")).distinct().count()
    assert(rows.map(_.getAs[Long]("n_novel")).sum == totalTypes)
    // non-vacuous: novelty must actually vary on this corpus
    assert(rows.map(_.getAs[Long]("novelty_ppm")).distinct.length > 1)
  }

  test("collocations_dice: ordered top-20, counts reconcile with a direct " +
      "recount") {
    val rows = operators.TextAnalysis.collocationsDice(spark, sfDir).collect()
    assert(rows.length == 20)
    val dice = rows.map(_.getAs[Long]("dice_ppm"))
    assert(dice.zip(dice.tail).forall { case (a, b) => a >= b },
      "rows must arrive ranked by dice_ppm desc")
    rows.foreach { r =>
      assert(r.getAs[Long]("c_xy") >= 5, "min-count floor")
      assert(r.getAs[Long]("dice_ppm") <= 1000000L,
        "dice is bounded by 1: c(xy) <= min(c_x, c_y)")
      assert(r.getAs[Long]("dice_ppm") ==
        2L * r.getAs[Long]("c_xy") * 1000000L /
          (r.getAs[Long]("c_x") + r.getAs[Long]("c_y")))
    }
    // recount the top bigram's three frequencies straight off the corpus
    val top = rows.head
    val Array(x, y) = top.getAs[String]("bigram").split(" ")
    val words = Tables.documents(spark, sfDir)
      .select(split(col("text"), "\\s+").as("w"))
    val cXy = words.select(explode(expr(
      "transform(sequence(1, greatest(size(w) - 1, 1)), " +
        "i -> concat_ws(' ', element_at(w, i), element_at(w, i + 1)))"))
      .as("b")).filter(col("b") === top.getAs[String]("bigram")).count()
    val uni = words.select(explode(col("w")).as("u"))
    assert(cXy == top.getAs[Long]("c_xy"))
    assert(uni.filter(col("u") === x).count() == top.getAs[Long]("c_x"))
    assert(uni.filter(col("u") === y).count() == top.getAs[Long]("c_y"))
  }

  test("vocab_growth: both curves monotone, final milestone covers the corpus") {
    val rows = operators.TextAnalysis.vocabGrowth(spark, sfDir)
      .orderBy(col("milestone")).collect()
    assert(rows.map(_.getAs[Int]("milestone")).sameElements(1 to 5))
    val vocab = rows.map(_.getAs[Long]("vocab_size"))
    val toks = rows.map(_.getAs[Long]("cum_tokens"))
    assert(vocab.zip(vocab.tail).forall { case (a, b) => a <= b })
    assert(toks.zip(toks.tail).forall { case (a, b) => a <= b })
    // milestone 5 boundary is max_id → the full corpus
    val allVocab = Tables.documents(spark, sfDir)
      .select(explode(split(col("text"), "\\s+")).as("w"))
      .select(col("w")).distinct().count()
    assert(vocab.last == allVocab)
  }

  test("zipf_coverage: coverage grows with k and stays under 1e6 ppm") {
    val rows = operators.TextAnalysis.zipfCoverage(spark, sfDir)
      .orderBy(col("k")).collect()
    assert(rows.map(_.getAs[Int]("k")).sameElements(Array(10, 100, 1000)))
    val cov = rows.map(_.getAs[Long]("coverage_ppm"))
    assert(cov.zip(cov.tail).forall { case (a, b) => a <= b })
    assert(cov.forall(c => c > 0 && c <= 1000000L))
    rows.foreach(r => assert(r.getAs[Long]("n_words") <= r.getAs[Int]("k")))
  }

  test("ewma_smooth: one row per (type, day), ewma inside the window's count range") {
    val df = operators.EventOps.ewmaSmooth(spark, sfDir).cache()
    val daily = Tables.events(spark, sfDir)
      .groupBy(col("event_type"), expr("ts div 86400000000000").as("day"))
      .agg(count(lit(1)).as("cnt")).cache()
    assert(df.count() == daily.count())
    // a weighted mean of counts lies within [min, max] of the window;
    // globally: within the type's overall count range
    val bounds = daily.groupBy(col("event_type"))
      .agg(min(col("cnt")).as("lo"), max(col("cnt")).as("hi"))
    val joined = df.join(bounds, Seq("event_type"))
    assert(joined.filter(col("ewma") < col("lo").cast("double") - 1e-9 ||
      col("ewma") > col("hi").cast("double") + 1e-9).count() == 0)
    // a day with no history inside the horizon equals its own count
    val first = daily.groupBy(col("event_type")).agg(min(col("day")).as("day"))
      .join(daily, Seq("event_type", "day"))
    val firstEwma = first.join(df, Seq("event_type", "day"))
    assert(firstEwma.filter(
      abs(col("ewma") - col("cnt").cast("double")) > 1e-9).count() == 0)
    df.unpersist(); daily.unpersist()
  }

  test("winsorize_clip: clipped values inside bounds, bulk untouched") {
    val df = operators.EventOps.winsorizeClip(spark, sfDir).cache()
    assert(df.count() == Tables.events(spark, sfDir).count())
    // clip is idempotent and order-preserving: clipped <= original on the
    // high side, >= on the low side, and at most 2% of rows move per type
    val moved = df.filter(col("value_clipped") =!= col("value"))
      .groupBy(col("event_type")).agg(count(lit(1)).as("m"))
    val totals = df.groupBy(col("event_type")).agg(count(lit(1)).as("t"))
    val joined = totals.join(moved, Seq("event_type"), "left")
      .select(col("event_type"), coalesce(col("m"), lit(0L)).as("m"), col("t"))
    // cell-resolution thresholds clip at MOST ~p1+p99 tails (+cell slack)
    assert(joined.filter(col("m") * 100 > col("t") * 3).count() == 0)
    df.unpersist()
  }

  test("ab_test_metrics: two variants partition the users, counters reconcile") {
    val rows = operators.EventOps.abTestMetrics(spark, sfDir).collect()
    assert(rows.map(_.getAs[Int]("variant")).sorted.sameElements(Array(0, 1)))
    val allUsers = Tables.events(spark, sfDir).select(col("user_id")).distinct().count()
    assert(rows.map(_.getAs[Long]("n_users")).sum == allUsers)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_converters") <= r.getAs[Long]("n_users"))
      assert(r.getAs[Long]("conversion_ppm") <= 1000000L)
      assert(r.getAs[Double]("mean_purchase_value") > 0)
    }
  }

  test("rfm_segmentation: one row per purchaser, scores 1..5, segments consistent") {
    val df = operators.EventOps.rfmSegmentation(spark, sfDir).cache()
    val purchasers = Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id")).distinct().count()
    assert(df.count() == purchasers)
    Seq("r_score", "f_score", "m_score").foreach { c =>
      assert(df.filter(col(c) < 1 || col(c) > 5).count() == 0, s"$c out of range")
    }
    // segment labels must follow the rule grid
    assert(df.filter(col("segment") === "champion" &&
      (col("r_score") < 4 || col("f_score") < 4 || col("m_score") < 4)).count() == 0)
    assert(df.filter(col("segment") === "hibernating" &&
      (col("r_score") > 2 || col("f_score") > 2)).count() == 0)
    df.unpersist()
  }

  test("mmr_rerank: 5 rounds per query, no repeats, round-1 is the top candidate") {
    val df = operators.Similarity.mmrRerank(spark, sfDir).cache()
    val perQuery = df.groupBy(col("query_id"))
      .agg(count(lit(1)).as("n"), countDistinct(col("neighbor_id")).as("d"),
        countDistinct(col("round")).as("r"))
    assert(perQuery.filter(col("n") =!= 5 || col("d") =!= 5 || col("r") =!= 5)
      .count() == 0)
    // round 1 must agree with brute-force rank 1 (mmr is a monotone
    // transform of cosine when nothing is selected yet)
    val top1 = operators.Similarity.annTopk(spark, sfDir)
      .filter(col("rank") === 1).select(col("query_id"), col("neighbor_id"))
    val r1 = df.filter(col("round") === 1).select(col("query_id"), col("neighbor_id"))
    assert(r1.except(top1).count() == 0)
    // diversity: later rounds never beat earlier rounds' mmr within a query
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("round"))
    assert(df.withColumn("prev", lag(col("mmr_score"), 1).over(w))
      .filter(col("prev").isNotNull && col("mmr_score") > col("prev") + 1e-8)
      .count() == 0)
    df.unpersist()
  }

  test("curriculum_order: positions are a dense permutation, phases ordered thirds") {
    val df = operators.Sampling.curriculumOrder(spark, sfDir).cache()
    val n = df.count()
    assert(n == Tables.documents(spark, sfDir).count())
    // dense 1..n permutation
    assert(df.select(col("curriculum_pos")).distinct().count() == n)
    assert(df.agg(min(col("curriculum_pos")), max(col("curriculum_pos")))
      .collect()(0) == org.apache.spark.sql.Row(1L, n))
    // quality is non-increasing along the curriculum: cell monotone in pos
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("curriculum_pos"))
    assert(df.withColumn("prev_cell", lag(col("cell"), 1).over(w))
      .filter(col("prev_cell").isNotNull && col("cell") > col("prev_cell"))
      .count() == 0)
    // phases are 1..3 and non-decreasing in position
    assert(df.filter(col("phase") < 1 || col("phase") > 3).count() == 0)
    assert(df.withColumn("prev_ph", lag(col("phase"), 1).over(w))
      .filter(col("prev_ph").isNotNull && col("phase") < col("prev_ph"))
      .count() == 0)
    df.unpersist()
  }

  test("graph_reach: histogram covers every node exactly once, 5 seeds at dist 0") {
    val rows = operators.Analytics.graphReach(spark, sfDir).collect()
    val dists = rows.map(_.getAs[Int]("dist"))
    assert(dists.distinct.length == dists.length)
    assert(dists.forall(d => d == -1 || (d >= 0 && d <= 4)))
    assert(rows.find(_.getAs[Int]("dist") == 0)
      .exists(_.getAs[Long]("n_nodes") == 5L))
    val totalNodes = operators.Analytics.collabPairs(spark, sfDir)
      .select(explode(array(col("supp_a"), col("supp_b"))).as("n"))
      .distinct().count()
    assert(rows.map(_.getAs[Long]("n_nodes")).sum == totalNodes)
  }

  test("ppr_seeds: rank mass concentrates on seeds, scores in [0,1], top-20 sorted") {
    val rows = operators.Analytics.pprSeeds(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach { r =>
      val p = r.getAs[Double]("ppr")
      assert(p >= 0.0 && p <= 1.0, s"ppr out of range: $p")
    }
    val scores = rows.map(_.getAs[Double]("ppr"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    // personalization: the top ppr node must beat the uniform-pagerank
    // floor 0.15/n (teleport mass is concentrated, not spread)
    assert(scores.head > 0.0)
  }

  test("corpus_divergence: TV in [0,1], one row per source, word counts reconcile") {
    val rows = operators.TextAnalysis.corpusDivergence(spark, sfDir).collect()
    val srcs = Tables.documents(spark, sfDir).select(col("source")).distinct().count()
    assert(rows.length == srcs)
    val totalWords = Tables.documents(spark, sfDir)
      .agg(sum(size(split(col("text"), "\\s+")))).collect()(0).getLong(0)
    assert(rows.map(_.getAs[Long]("n_words")).sum == totalWords)
    rows.foreach { r =>
      val tv = r.getAs[Double]("tv_divergence")
      assert(tv >= 0.0 && tv <= 1.0, s"TV out of range: $tv")
      assert(r.getAs[Long]("vocab_size") > 0)
    }
  }

  test("source_signature_terms: 5 ranked terms per source, all over-represented") {
    val df = operators.TextAnalysis.sourceSignatureTerms(spark, sfDir).cache()
    val srcs = Tables.documents(spark, sfDir).select(col("source")).distinct().count()
    assert(df.count() == srcs * 5)
    val perSrc = df.groupBy(col("source"))
      .agg(count(lit(1)).as("n"), min(col("rank")).as("mn"), max(col("rank")).as("mx"))
    assert(perSrc.filter(col("n") =!= 5 || col("mn") =!= 1 || col("mx") =!= 5)
      .count() == 0)
    // top terms must actually be over-represented: lift > 1
    assert(df.filter(col("rank") === 1 && col("lift") <= 1.0).count() == 0)
    df.unpersist()
  }

  test("quality_calibration: corr in [-1,1], n_docs reconcile with scorable docs") {
    val rows = operators.TextAnalysis.qualityCalibration(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val c = r.getAs[Double]("corr_quality_lm")
      assert(c >= -1.0 && c <= 1.0, s"corr out of range: $c")
      assert(r.getAs[Long]("n_docs") >= 2)
    }
    // every doc with >= 2 words is scorable by both signals
    val scorable = Tables.documents(spark, sfDir)
      .filter(size(split(col("text"), "\\s+")) >= 2).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == scorable)
  }

  test("tokenizer_fertility: one row per lang, ratios positive and reconciled") {
    val rows = operators.TextAnalysis.tokenizerFertility(spark, sfDir).collect()
    val langs = Tables.documents(spark, sfDir)
      .select(col("lang")).distinct().count()
    assert(rows.length == langs)
    rows.foreach { r =>
      val (ws, bpe) = (r.getAs[Long]("ws_tokens"), r.getAs[Long]("bpe_tokens"))
      assert(ws > 0 && bpe > 0)
      assert(math.abs(r.getAs[Double]("fertility") - bpe.toDouble / ws) < 1e-12)
      assert(r.getAs[Double]("chars_per_token") > 0)
    }
  }

  test("event_debounce: keeps every key's first event, gaps clear the window") {
    val kept = operators.EventOps.eventDebounce(spark, sfDir)
    val total = Tables.events(spark, sfDir).count()
    val firsts = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type")).distinct().count()
    val n = kept.count()
    assert(n >= firsts && n <= total)
    kept.collect().foreach { r =>
      val g = r.getAs[Long]("gap_us")
      assert(g == -1L || g > 21600000000L,
        s"kept event must be a first (-1) or clear the 6 h window: $g")
    }
  }

  test("readability_score: one row per doc, score bounded above") {
    val rows = operators.TextAnalysis.readabilityScore(spark, sfDir).collect()
    assert(rows.length == Tables.documents(spark, sfDir).count())
    rows.foreach { r =>
      assert(r.getAs[Long]("n_words") >= 1 && r.getAs[Long]("n_sents") >= 1)
      assert(r.getAs[Long]("flesch_milli") <= 206835L)
    }
  }

  test("lateness_audit: loss curve is monotone non-increasing in the delay") {
    val rows = operators.EventOps.latenessAudit(spark, sfDir).collect()
    val byType = rows.groupBy(_.getAs[String]("event_type"))
    byType.values.foreach { rs =>
      assert(rs.length == 4, "four candidate delays per type")
      val curve = rs.sortBy(_.getAs[Long]("delay_us"))
        .map(_.getAs[Long]("late_count"))
      curve.sliding(2).foreach {
        case Array(a, b) => assert(a >= b,
          "a larger watermark delay can only admit MORE events")
        case _ =>
      }
      rs.foreach(r =>
        assert(r.getAs[Long]("late_count") <= r.getAs[Long]("n_events")))
    }
  }

  test("burst_detect: top-3 hottest hours per type, ratio and verdict " +
      "self-consistent") {
    val rows = operators.EventOps.burstDetect(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("event_type")).foreach { case (_, rs) =>
      assert(rs.length <= 3)
      val ppms = rs.sortBy(_.getAs[Long]("hour_id"))
        .map(_.getAs[Long]("burst_ppm"))
      assert(rs.map(_.getAs[Long]("burst_ppm")).max == ppms.max)
    }
    rows.foreach { r =>
      val (n, s, c) = (r.getAs[Long]("trail_n"), r.getAs[Long]("trail_sum"),
        r.getAs[Long]("cnt"))
      assert(n >= 1L && s >= n)
      val ppm = r.getAs[Long]("burst_ppm")
      assert(ppm == c * n * 1000000L / (3L * s),
        s"burst_ppm $ppm != floor($c*$n*1e6/(3*$s))")
      assert(r.getAs[Boolean]("is_burst") == (n >= 6L && ppm > 1000000L))
      // the flag still encodes the original detector: >3x trailing mean
      if (r.getAs[Boolean]("is_burst")) assert(c * n > 3L * s)
    }
  }

  test("time_weighted_avg: one row per spanning user, mean inside value range") {
    val rows = operators.EventOps.timeWeightedAvg(spark, sfDir).collect()
    val users = Tables.events(spark, sfDir)
      .groupBy(col("user_id"))
      .agg((expr("(max(ts div 1000) - min(ts div 1000)) div 1000") > 0)
        .as("spans"))
      .filter(col("spans")).count()
    assert(rows.length == users)
    val vmax = Tables.events(spark, sfDir).agg(max(col("value")))
      .head().getDouble(0)
    rows.foreach { r =>
      val twa = r.getAs[Long]("twa_milli")
      assert(twa >= 0L && twa <= math.ceil((vmax + 1) * 1000).toLong,
        "left-constant mean is bounded by the observed value range")
    }
  }

  test("hll_window_merge: daily-sketch rollup stays inside the error band") {
    val rows = operators.EventOps.hllWindowMerge(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Boolean]("within_bounds")))
  }

  test("k_anonymity_audit: the 20 smallest quasi-groups report with " +
      "the sub-threshold flag exact") {
    val rows = operators.Quality.kAnonymityAudit(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val sizes = rows.map(_.getAs[Long]("group_size"))
    sizes.sliding(2).foreach {
      case Array(a, b) => assert(a <= b, "ascending by group size")
      case _ =>
    }
    rows.foreach { r =>
      assert(r.getAs[Long]("group_size") >= 1L)
      assert(r.getAs[Boolean]("is_risky")
        === (r.getAs[Long]("group_size") < 5L))
    }
  }

  test("session_paths: bounded top-k, counts cover only real sessions") {
    val rows = operators.EventOps.sessionPaths(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val counts = rows.map(_.getAs[Long]("n_sessions"))
    counts.sliding(2).foreach {
      case Array(a, b) => assert(a >= b, "descending by count")
      case _ =>
    }
    val totalSessions = operators.EventOps.sessionize(spark, sfDir)
      .select("user_id", "session_id").distinct().count()
    assert(counts.sum <= totalSessions)
    rows.foreach { r =>
      val path = r.getAs[String]("path")
      assert(path.nonEmpty)
      assert(path.split(">").forall(
        Set("view", "click", "purchase", "signup", "error").contains))
    }
  }

  test("conversion_latency: non-negative hour buckets over converted users") {
    val rows = operators.EventOps.conversionLatency(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Long]("latency_hours") >= 0L))
    val users = Tables.events(spark, sfDir)
      .select("user_id").distinct().count()
    assert(rows.map(_.getAs[Long]("n_users")).sum <= users)
  }

  test("embedding_drift: one row per label, cohorts partition the vectors") {
    val rows = operators.Similarity.embeddingDrift(spark, sfDir).collect()
    val labels = Tables.embeddings(spark, sfDir)
      .select("label").distinct().count()
    assert(rows.length == labels)
    val total = Tables.embeddings(spark, sfDir).count()
    assert(rows.map(r =>
      r.getAs[Long]("n_even") + r.getAs[Long]("n_odd")).sum == total)
    rows.foreach(r =>
      assert(r.getAs[Long]("drift_sq_microunits") >= 0L))
  }

  test("concurrency_peaks: one peak per active day, concurrency positive") {
    val rows = operators.EventOps.concurrencyPeaks(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Long]("day_id")).distinct.length == rows.length)
    rows.foreach { r =>
      assert(r.getAs[Long]("peak_concurrency") >= 1L,
        "a day with boundaries has at least one active session at its peak")
    }
    // concurrency can never exceed the number of users
    val users = Tables.events(spark, sfDir).select("user_id").distinct().count()
    rows.foreach(r => assert(r.getAs[Long]("peak_concurrency") <= users))
  }

  test("cusum_changepoint: one interior peak per type, sign consistent") {
    val rows = operators.EventOps.cusumChangepoint(spark, sfDir).collect()
    val types = Tables.events(spark, sfDir)
      .select("event_type").distinct().count()
    assert(rows.length == types)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_hours") > 0L)
      val c = r.getAs[Long]("peak_cusum")
      assert(r.getAs[Long]("direction") == c.sign)
    }
  }

  test("right_to_erasure: cascade bounded, exact subject counts") {
    val rows = operators.Quality.rightToErasure(spark, sfDir).collect()
      .map(r => r.getAs[String]("table_name") -> r).toMap
    assert(rows.keySet == Set("customer", "orders", "events", "lineitem"))
    rows.values.foreach(r =>
      assert(r.getAs[Long]("n_to_erase") <= r.getAs[Long]("n_rows")))
    val evExact = Tables.events(spark, sfDir)
      .filter(col("user_id").isin(3L, 17L, 42L)).count()
    assert(rows("events").getAs[Long]("n_to_erase") == evExact)
    assert(rows("customer").getAs[Long]("n_to_erase") == 3L)
    // the cascade actually fires: erased customers have orders with lines
    assert(rows("orders").getAs[Long]("n_to_erase") > 0L)
    assert(rows("lineitem").getAs[Long]("n_to_erase") > 0L)
  }

  test("longest_dup_span: islands reconcile with dedup_substring coverage") {
    val spans = operators.Dedup.longestDupSpan(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    val scrub = operators.Dedup.dedupSubstring(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_dup_tokens")).toMap
    assert(spans.keySet == scrub.keySet, "one row per document in both")
    spans.foreach { case (id, r) =>
      val (isl, longest) =
        (r.getAs[Long]("n_islands"), r.getAs[Long]("longest_span"))
      assert((isl == 0L) == (longest == 0L))
      assert(longest <= r.getAs[Long]("n_tokens"))
      // a maximal duplicated island can never cover more tokens than
      // the scrubber counts as duplicated in that document
      assert((isl > 0L) == (scrub(id) > 0L),
        s"doc $id: islands=$isl but scrubbed dup tokens=${scrub(id)}")
      assert(longest <= scrub(id) || isl == 0L)
    }
  }

  test("entity_resolution: canonical labels are consistent with fuzzy pairs") {
    val rows = operators.RelationalExt.entityResolution(spark, sfDir).collect()
    val entity = rows.map(r =>
      r.getAs[String]("name") -> r.getAs[String]("entity")).toMap
    rows.foreach { r =>
      assert(r.getAs[String]("entity") <= r.getAs[String]("name"),
        "label is the lexicographic min of the component")
      assert(r.getAs[Boolean]("is_canonical")
        == (r.getAs[String]("name") == r.getAs[String]("entity")))
    }
    // every entity's canonical name is itself a member with that label
    entity.values.toSet.foreach { e: String => assert(entity(e) == e) }
    // matched pairs always land in the same entity
    operators.RelationalExt.fuzzyJoin(spark, sfDir).collect().foreach { p =>
      assert(entity(p.getAs[String]("name_a")) == entity(p.getAs[String]("name_b")))
    }
    val nParts = Tables.part(spark, sfDir).count()
    assert(rows.map(_.getAs[Long]("cnt")).sum == nParts)
  }

  test("fuzzy_join: ordered pairs, same block, edit distance in [1,2]") {
    val rows = operators.RelationalExt.fuzzyJoin(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (a, b) = (r.getAs[String]("name_a"), r.getAs[String]("name_b"))
      assert(a < b)
      assert(a.split(" ").last == b.split(" ").last, "block key matches")
      val lev = r.getAs[Long]("lev")
      assert(lev >= 1L && lev <= 2L)
      assert(r.getAs[Long]("cnt_a") > 0 && r.getAs[Long]("cnt_b") > 0)
    }
  }

  test("retrieval_eval_pk: reconciles with rel labels from raw text and " +
      "the oracle-green bm25 ranking") {
    val r = operators.Retrieval.retrievalEvalPk(spark, sfDir).collect().head
    val terms = Seq("spark", "hash", "merge")
    val rel = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
      .collect().map { d =>
        val toks = d.getString(1).split("\\s+").toSet
        d.getLong(0) -> terms.count(toks.contains)
      }.toMap
    val top10 = operators.Retrieval.bm25Topk(spark, sfDir).collect()
      .map(_.getLong(0)).take(10)
    val nRelevant = rel.values.count(_ >= 2).toLong
    val hits = top10.count(id => rel(id) >= 2).toLong
    val firstRank = top10.zipWithIndex.collectFirst {
      case (id, i) if rel(id) >= 2 => (i + 1).toLong
    }
    assert(r.getAs[Long]("n_relevant") == nRelevant)
    assert(r.getAs[Long]("hits_at_10") == hits)
    assert(r.getAs[Long]("p_at_10_ppm") == hits * 100000L)
    assert(r.getAs[Long]("r_at_10_ppm") ==
      hits * 1000000L / math.max(nRelevant, 1L))
    assert(r.getAs[Long]("rr_ppm") == firstRank.map(1000000L / _).getOrElse(0L))
  }

  test("market_hhi: matches an exact driver-side share recount") {
    val rows = operators.RelationalExt.marketHhi(spark, sfDir).collect()
      .map(r => r.getAs[Long]("nationkey") -> r).toMap
    val perSupp = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_suppkey"))
      .agg(sum(floor(col("l_extendedprice") * 100 + lit(0.5)).cast("bigint"))
        .as("cents")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val nation = Tables.supplier(spark, sfDir)
      .select(col("s_suppkey"), col("s_nationkey").cast("long")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val byNation = perSupp.toSeq.flatMap { case (s, c) =>
      nation.get(s).map(n => (n, c))
    }.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    assert(rows.keySet == byNation.keySet)
    byNation.foreach { case (n, cs) =>
      val r = rows(n)
      val total = cs.map(BigInt(_)).sum
      assert(r.getAs[Long]("n_suppliers") == cs.length.toLong)
      assert(r.getAs[Long]("total_cents") == total.toLong)
      val sumsq = cs.map(c => BigInt(c) * c).sum
      assert(r.getAs[Long]("hhi_ppm") == (sumsq * 1000000 / (total * total)).toLong)
      assert(r.getAs[Long]("top_share_ppm") ==
        BigInt(cs.max) * 1000000 / total)
      // HHI is bounded below by the equal-share floor 1/n and above by 1e6
      assert(r.getAs[Long]("hhi_ppm") >= 1000000L / cs.length)
      assert(r.getAs[Long]("hhi_ppm") <= 1000000L)
    }
  }

  test("shipping_lag_percentiles: matches a driver-side sorted recount") {
    val rows = operators.RelationalExt.shippingLagPercentiles(spark, sfDir)
      .collect().map(r => r.getAs[String]("priority") -> r).toMap
    val lags = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey").as("o_orderkey"), col("l_shipdate"))
      .join(Tables.orders(spark, sfDir)
        .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority")),
        Seq("o_orderkey"))
      .select(col("o_orderpriority"),
        datediff(col("l_shipdate"), col("o_orderdate")).cast("bigint"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    assert(rows.keySet == lags.keySet)
    def q(xs: Array[Long], p: Long) = xs(((p * xs.length + 99) / 100 - 1).toInt)
    lags.foreach { case (prio, xs) =>
      val r = rows(prio)
      assert(r.getAs[Long]("n_items") == xs.length.toLong)
      assert(r.getAs[Long]("p50_days") == q(xs, 50), s"p50 for $prio")
      assert(r.getAs[Long]("p90_days") == q(xs, 90), s"p90 for $prio")
      assert(r.getAs[Long]("p99_days") == q(xs, 99), s"p99 for $prio")
      assert(r.getAs[Long]("max_days") == xs.last)
      assert(r.getAs[Long]("p50_days") <= r.getAs[Long]("p90_days")
        && r.getAs[Long]("p90_days") <= r.getAs[Long]("p99_days")
        && r.getAs[Long]("p99_days") <= r.getAs[Long]("max_days"))
    }
  }

  test("mix_quality_frontier: reconciles with per-source recounts and is " +
      "monotone") {
    val rows = operators.Sampling.mixQualityFrontier(spark, sfDir).collect()
      .sortBy(_.getAs[Long]("rank"))
    val docs = Tables.documents(spark, sfDir)
    val qs = operators.TextAnalysis.qualityScoreDf(docs)
      .select(col("doc_id"), col("quality_score")).collect()
      .map(r => r.getLong(0) -> BigDecimal(r.getDouble(1))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)).toMap
    val perSrc = docs.select(col("doc_id"), col("source"),
        size(split(col("text"), "\\s+")).cast("bigint").as("toks")).collect()
      .map(r => (r.getString(1), r.getLong(0), r.getLong(2)))
      .groupBy(_._1)
    assert(rows.length == perSrc.size)
    rows.foreach { r =>
      val g = perSrc(r.getAs[String]("source"))
      assert(r.getAs[Long]("n_docs") == g.length.toLong)
      assert(r.getAs[Long]("tokens") == g.map(_._3).sum)
      val qsum = g.map(x => qs(x._2)).sum
      assert(r.getAs[Long]("mean_q_x1e6") ==
        math.floor(qsum.toDouble / g.length * 1.0e6 + 0.5).toLong)
    }
    // ranking is by mean quality desc; the running mean can then never
    // rise (within the ±1µ of independent half-up roundings)
    rows.zip(rows.tail).foreach { case (a, b) =>
      assert(a.getAs[Long]("mean_q_x1e6") >= b.getAs[Long]("mean_q_x1e6"))
      assert(a.getAs[Long]("cum_mean_q_x1e6") + 1 >=
        b.getAs[Long]("cum_mean_q_x1e6"))
      assert(a.getAs[Long]("cum_tokens") + b.getAs[Long]("tokens") ==
        b.getAs[Long]("cum_tokens"))
    }
    assert(rows.last.getAs[Long]("cum_docs") == docs.count())
  }

  test("map_eval: AP@10 matches a full driver-side truncated-query BM25 " +
      "recompute") {
    val r = operators.Retrieval.mapEval(spark, sfDir).collect().head
    val terms = Seq("spark", "hash", "merge")
    val evalTerms = terms.take(2)
    val (k1, b) = (1.2, 0.75)
    val docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
      .collect().map(d => d.getLong(0) -> d.getString(1).split("\\s+"))
    val nDocs = docs.length.toLong
    val sumDl = docs.map(_._2.length.toLong).sum
    val tf = docs.map { case (id, toks) =>
      id -> terms.map(t => t -> toks.count(_ == t).toLong).toMap
    }.toMap
    val df = terms.map(t => t -> tf.values.count(_(t) > 0).toLong).toMap
    def score(id: Long, qs: Seq[String]) = qs.map { t =>
      val tfi = tf(id)(t)
      if (tfi == 0) 0.0
      else {
        val idf = (nDocs.toDouble - df(t).toDouble + 0.5) / (df(t).toDouble + 0.5)
        val dl = docs.find(_._1 == id).get._2.length.toDouble
        idf * (tfi.toDouble * (k1 + 1.0)) /
          (tfi.toDouble + k1 * ((1.0 - b) + b * dl / (sumDl.toDouble / nDocs.toDouble)))
      }
    }.sum
    val kept = docs.map(_._1)
      .filter(id => score(id, terms) > 0.0 && score(id, evalTerms) > 0.0)
      .map(id => (id, math.floor(score(id, evalTerms) * 1.0e6 + 0.5) / 1.0e6,
        terms.count(t => tf(id)(t) > 0)))
    val nRel = kept.count(_._3 == 3).toLong
    assert(r.getAs[Long]("n_relevant") == nRel)
    val top = kept.sortBy { case (id, s, _) => (-s, id) }.take(10)
    val hs = top.map(_._3 == 3)
    assert(r.getAs[Long]("hits_at_10") == hs.count(identity).toLong)
    var cumHits = 0L; var apNum = 0L
    hs.zipWithIndex.foreach { case (h, i) =>
      if (h) { cumHits += 1; apNum += cumHits * (2520 / (i + 1)) }
    }
    assert(r.getAs[Long]("ap_num_x2520") == apNum,
      s"AP numerator $apNum vs ${r.getAs[Long]("ap_num_x2520")}")
    assert(r.getAs[Long]("ap_at_10_ppm") ==
      apNum * 1000000L / (2520L * math.min(nRel, 10L)))
    // the truncated-query design must stay non-vacuous: the label is
    // strictly harder than the query, so a perfect score means the
    // oracle stopped measuring ordering at all
    assert(r.getAs[Long]("ap_at_10_ppm") < 1000000L)
  }

  test("filter_agreement_kappa: counts and kappa reconcile with the two " +
      "production gates") {
    val r = operators.TextAnalysis.filterAgreementKappa(spark, sfDir)
      .collect().head
    val docs = Tables.documents(spark, sfDir)
    val g = operators.TextAnalysis.gopherRulesDf(docs)
      .select(col("doc_id"), col("pass")).collect()
      .map(x => x.getLong(0) -> x.getBoolean(1)).toMap
    val q = operators.TextAnalysis.qualityScoreDf(docs)
      .select(col("doc_id"), col("quality_score")).collect()
      .map(x => x.getLong(0) -> (x.getDouble(1) > 0.8)).toMap
    val a = g.count { case (id, ap) => ap && q(id) }.toLong
    val b = g.count { case (id, ap) => ap && !q(id) }.toLong
    val c = g.count { case (id, ap) => !ap && q(id) }.toLong
    val d = g.count { case (id, ap) => !ap && !q(id) }.toLong
    val n = a + b + c + d
    assert(r.getAs[Long]("n_docs") == n && n == g.size.toLong)
    assert(r.getAs[Long]("n_both_pass") == a)
    assert(r.getAs[Long]("n_gopher_only") == b)
    assert(r.getAs[Long]("n_quality_only") == c)
    assert(r.getAs[Long]("n_both_fail") == d)
    val peNum = BigInt(a + b) * BigInt(a + c) + BigInt(c + d) * BigInt(b + d)
    val num = BigInt(a + d) * n - peNum
    val den = BigInt(n) * n - peNum
    val want = if (den == 0) None
      else Some(((num * 1000000) / den).toLong) // BigInt / truncates to zero
    assert(Option(r.getAs[Long]("kappa_ppm")).filter(_ => !r.isNullAt(5)) ==
      want, s"kappa recount: want $want")
    // the audit must discriminate: not everything lands in one cell
    assert(Seq(a, b, c, d).count(_ > 0) >= 2, "degenerate agreement grid")
  }

  test("decontaminate_semantic: flags exactly the corpus vectors a " +
      "driver-side cosine recount puts at or above the floor") {
    val rows = operators.Similarity.decontaminateSemantic(spark, sfDir)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val all = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val bench = all.filter(_._1 < 5)
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val dot = a.indices.map(i => a(i).toDouble * b(i).toDouble).sum
      val na = math.sqrt(a.map(x => x.toDouble * x.toDouble).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x.toDouble).sum)
      dot / (na * nb)
    }
    val want = all.filter(_._1 >= 5).flatMap { case (id, v) =>
      val scored = bench.toSeq.map { case (bid, bv) => (bid, cos(bv, v)) }
        .filter(_._2 >= 0.3 - 1e-9)
      if (scored.isEmpty) None
      else Some(id -> scored.minBy { case (bid, c) => (-c, bid) })
    }
    // the engine's fused float-dot cosine and this double recount can
    // disagree only within float rounding — compare sets at a tolerance
    // wide enough for that and tight enough to catch a wrong pair
    val borderline = want.values.exists(c => math.abs(c._2 - 0.3) < 1e-6)
    if (!borderline) {
      assert(rows.keySet == want.keySet, "flagged-vector set recount")
      rows.foreach { case (id, (bid, c)) =>
        assert(bid == want(id)._1, s"closest bench for $id")
        assert(math.abs(c - want(id)._2) < 1e-6, s"cosine for $id")
        assert(c >= 0.3 && id >= 5 && bid < 5)
      }
    }
    assert(rows.nonEmpty, "threshold must flag something at this SF")
  }

  test("cochran_armitage: Z² matches an exact integer-moment recount") {
    val r = operators.StatTests.cochranArmitage(spark, sfDir).collect().head
    val nsPerDay = 86400L * 1000 * 1000 * 1000
    val pts = Tables.events(spark, sfDir)
      .select(col("ts").cast("long"), col("event_type")).collect()
      .map { x =>
        // Tables.events normalizes ts to LONG NANOS (nanosAsLong)
        val w = (x.getLong(0) / nsPerDay + 4) % 7 + 1
        (w, if (x.getString(1) == "purchase") 1L else 0L)
      }
    val nn = pts.length.toLong
    val rr = pts.map(_._2).sum
    val swr = pts.map(p => p._1 * p._2).sum
    val swn = pts.map(_._1).sum
    val sw2n = pts.map(p => p._1 * p._1).sum
    assert(r.getAs[Long]("n_total") == nn && r.getAs[Long]("n_success") == rr)
    assert(r.getAs[Long]("trend_num") == nn * swr - rr * swn)
    val num = (nn * swr - rr * swn).toDouble
    val varD = nn.toDouble * sw2n - swn.toDouble * swn
    val z2x = math.floor(nn.toDouble * num * num /
      (rr.toDouble * (nn - rr).toDouble * varD) * 1.0e6).toLong
    assert(r.getAs[Long]("z2_x1e6") == z2x, "Z² recount")
    assert(r.getAs[Boolean]("reject_h0_5pct") == (z2x > 3841459L))
  }

  test("mcnemar_test: reads the same grid as kappa and the chi2 " +
      "formulas recount exactly") {
    val k = operators.TextAnalysis.filterAgreementKappa(spark, sfDir)
      .collect().head
    val m = operators.TextAnalysis.mcnemarTest(spark, sfDir).collect().head
    val b = k.getAs[Long]("n_gopher_only")
    val c = k.getAs[Long]("n_quality_only")
    assert(m.getAs[Long]("n_gopher_only") == b &&
      m.getAs[Long]("n_quality_only") == c, "both audits read one grid")
    assert(b + c > 0, "gates never disagree — vacuous McNemar")
    assert(m.getAs[Long]("chi2_x1e6") == (b - c) * (b - c) * 1000000L / (b + c))
    val cc = (math.abs(b - c) - 1) * (math.abs(b - c) - 1)
    assert(m.getAs[Long]("chi2_cc_x1e6") == cc * 1000000L / (b + c))
    assert(m.getAs[Boolean]("reject_symmetry_5pct") ==
      (m.getAs[Long]("chi2_x1e6") > 3841459L))
  }

  test("mann_kendall: S, ties, and Z recount from driver-side day pairs") {
    val r = operators.StatTests.mannKendall(spark, sfDir).collect().head
    val nsPerDay = 86400L * 1000 * 1000 * 1000
    val daily = Tables.events(spark, sfDir)
      .select(col("ts").cast("long")).collect()
      .map(_.getLong(0) / nsPerDay)
      .groupBy(identity).view.mapValues(_.length.toLong).toSeq
      .sortBy(_._1).map(_._2)
    val n = daily.length.toLong
    assert(r.getAs[Long]("n_days") == n)
    val s = (for (i <- daily.indices; j <- daily.indices if i < j)
      yield java.lang.Long.signum(daily(j) - daily(i)).toLong).sum
    assert(r.getAs[Long]("s_stat") == s, "S recount")
    val tieNum = daily.groupBy(identity).values
      .map(g => g.size.toLong).map(t => t * (t - 1) * (2 * t + 5)).sum
    assert(r.getAs[Long]("tie_num") == tieNum, "tie numerator recount")
    val varNum = n * (n - 1) * (2 * n + 5) - tieNum
    if (varNum > 0) {
      val z = (if (s > 0) (s - 1).toDouble else if (s < 0) (s + 1).toDouble
        else 0.0) / math.sqrt(varNum.toDouble / 18.0)
      assert(r.getAs[Long]("z_x1e6") == math.floor(z * 1.0e6).toLong,
        "Z recount")
      assert(r.getAs[Boolean]("reject_h0_5pct") ==
        (z > 1.959964 || z < -1.959964))
    }
  }

  test("dedup_threshold_sweep: per-threshold counts recount from the " +
      "exact pair set and are monotone") {
    val pairs = operators.Dedup.ngramJaccard(spark, sfDir).collect()
      .map(p => (p.getLong(0), p.getLong(1), p.getDouble(2)))
    val rows = operators.Dedup.dedupThresholdSweep(spark, sfDir).collect()
      .map(r => r.getDouble(0) ->
        (r.getAs[Long]("n_pairs"), r.getAs[Long]("n_docs_touched"))).toMap
    val thresholds = Seq(0.5, 0.6, 0.7, 0.8, 0.9)
    val want = thresholds.map { t =>
      val kept = pairs.filter(_._3 >= t)
      t -> (kept.length.toLong,
        kept.flatMap(p => Seq(p._1, p._2)).distinct.length.toLong)
    }.filter(_._2._1 > 0).toMap
    assert(rows == want, s"sweep recount: got $rows want $want")
    // pair volume can only shrink as the threshold rises
    val present = thresholds.filter(want.contains)
    present.sliding(2).foreach {
      case Seq(lo, hi) =>
        assert(want(lo)._1 >= want(hi)._1 && want(lo)._2 >= want(hi)._2)
      case _ =>
    }
    assert(want.nonEmpty && want(0.5)._1 == pairs.length.toLong,
      "0.5 row must carry the full exact pair set")
  }
}
