package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Invariants for the round-15 additions. Value-level parity with
  * DuckDB is the driver gate's job; these pin what the oracles can't
  * see — that the bucketed-midrank Spearman equals an independent
  * driver-side recomputation of the same formula, that it tracks the
  * exact statistic at full resolution, and that `spearman_corr`'s
  * declared past-the-cap fallback actually ENGAGES (r14 verdict: the
  * fallback was a documented claim while the code could only fail
  * loud at the Ranks cell cap).
  */
class R15OpsSpec extends SparkSpec {

  /** sf0.01, not the spec default: 1024 value buckets over sf0.001's
    * ~1.5k orders leaves most buckets at one row — the midrank
    * machinery would be near-unexercised (the kcore-spec rule).
    */
  private val specDir = "/root/testdata/sf0.01"

  /** The (cents, n_lines) base collected once per suite run. */
  private lazy val baseRows: Seq[(Long, Long)] = {
    val width = Tables.lineitem(spark, specDir)
      .groupBy(col("l_orderkey")).agg(count(lit(1)).as("n_lines"))
    Tables.orders(spark, specDir)
      .select(col("o_orderkey").as("l_orderkey"),
        floor(col("o_totalprice") * 100 + lit(0.5)).cast("bigint").as("cents"))
      .join(width, Seq("l_orderkey"))
      .collect().map(r =>
        (r.getAs[Long]("cents"), r.getAs[Long]("n_lines"))).toSeq
  }

  /** Independent driver-side bucketed-midrank Spearman: plain Scala
    * BigInt, same bucket formula, same half-unit midranks, same single
    * terminal double rounding. Returns (n, value_cells, width_cells,
    * rho_ppm).
    */
  private def midrankRho(rows: Seq[(Long, Long)], buckets: Int)
      : (Long, Long, Long, Option[Long]) = {
    val n = rows.size
    val cmin = rows.map(_._1).min
    val cmax = rows.map(_._1).max
    val xs = rows.map { case (c, w) =>
      (((c - cmin) * buckets) / (cmax - cmin + 1), w)
    }
    def mid(h: Seq[(Long, Long)]): Map[Long, BigInt] = {
      var b = BigInt(0)
      h.sortBy(_._1).map { case (k, c) =>
        val m = 2 * b + c + 1; b += c; k -> m
      }.toMap
    }
    val hv = xs.groupBy(_._1).toSeq.map { case (k, g) => k -> g.size.toLong }
    val hw = xs.groupBy(_._2).toSeq.map { case (k, g) => k -> g.size.toLong }
    val mv = mid(hv)
    val mw = mid(hw)
    var (sx, sy, sxx, syy, sxy) =
      (BigInt(0), BigInt(0), BigInt(0), BigInt(0), BigInt(0))
    xs.foreach { case (v, w) =>
      val x = mv(v); val y = mw(w)
      sx += x; sy += y; sxx += x * x; syy += y * y; sxy += x * y
    }
    val num = BigInt(n) * sxy - sx * sy
    val dx = BigInt(n) * sxx - sx * sx
    val dy = BigInt(n) * syy - sy * sy
    val rho =
      if (n < 2 || dx <= 0 || dy <= 0) None
      else Some(math.floor(num.toDouble / math.sqrt(dx.toDouble)
        / math.sqrt(dy.toDouble) * 1e6).toLong)
    (n.toLong, mv.size.toLong, mw.size.toLong, rho)
  }

  private def rhoOf(r: Row): Option[Long] = {
    val i = r.fieldIndex("rho_ppm")
    if (r.isNullAt(i)) None else Some(r.getLong(i))
  }

  test("spearman_corr_bucketed: equals the driver-side midrank " +
      "recomputation at 1024 buckets") {
    val row = operators.StatTests
      .spearmanCorrBucketed(spark, specDir).collect().head
    val (n, vc, wc, rho) = midrankRho(baseRows, 1024)
    assert(row.getAs[Long]("n") === n)
    assert(row.getAs[Long]("value_cells") === vc)
    assert(row.getAs[Long]("width_cells") === wc)
    assert(rhoOf(row) === rho)
    // resolution sanity: the realized cells actually spread (a
    // single-cell axis would make the approximation vacuous here)
    assert(vc > 100 && wc >= 2)
  }

  test("spearman_corr_bucketed: tracks the exact statistic at full " +
      "resolution") {
    val exact = rhoOf(operators.StatTests
      .spearmanCorr(spark, specDir).collect().head).get
    val bucketed = rhoOf(operators.StatTests
      .spearmanCorrBucketed(spark, specDir).collect().head).get
    // same sign, same magnitude up to the quantization of ~15 rows per
    // value bucket (measured drift is well inside 0.05; the bound
    // leaves noise headroom without ever letting the two diverge as
    // statistics)
    assert(math.signum(exact.toDouble) === math.signum(bucketed.toDouble))
    assert(math.abs(exact - bucketed) <= 50000L,
      s"bucketed rho_ppm $bucketed drifted from exact $exact")
  }

  test("spearman_corr: bucketed fallback ENGAGES past the rank-cell " +
      "budget (no fail-loud), with NULL sum_d2 and the budget's rho") {
    spark.conf.set("spark.graft.maxRankCells", "256")
    try {
      val row = operators.StatTests
        .spearmanCorr(spark, specDir).collect().head
      // the d² decomposition is undefined under midrank ties — the
      // fallback must say so, not fabricate a number
      assert(row.isNullAt(row.fieldIndex("sum_d2")))
      val (n, _, _, rho) = midrankRho(baseRows, 256)
      assert(row.getAs[Long]("n") === n)
      assert(rhoOf(row) === rho)
    } finally spark.conf.unset("spark.graft.maxRankCells")
  }

  test("semdedup_incremental: probe-from-disk (the materialized " +
      "AnnIndex) equals probe-from-recompute, and the batch verdicts " +
      "agree") {
    val e = Tables.embeddings(spark, specDir)
    val path = java.nio.file.Files
      .createTempDirectory("graft-annidx-r15").toString
    sources.AnnIndex.materialize(e.filter(col("vec_id") % 10 =!= 7), path)
    // top-1 disk probe of the batch == the operator's best-neighbor
    // column, value-exact (same plane constants, same multi-probe set,
    // same cosine arithmetic — parquet roundtrip is bit-exact)
    val disk = sources.AnnIndex
      .probe(spark, path, e.filter(col("vec_id") % 10 === 7), 1)
      .select(col("query_id"), col("neighbor_id"), col("cosine"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    val mem = operators.Similarity.semdedupIncremental(spark, specDir)
      .filter(col("best_indexed").isNotNull)
      .select(col("vec_id"), col("best_indexed"), col("best_cosine"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    assert(mem.nonEmpty)
    assert(disk === mem)
  }

  test("semdedup_incremental: verdicts match a brute-force recompute " +
      "restricted to the probed candidate set") {
    // independent driver-side recompute: bucket every vector with the
    // same sign-bit formula is the operator's own code path, so instead
    // verify the VERDICT logic against the exact cosines of the pairs
    // the output names — is_dup ⟺ best_cosine ≥ 0.3, and the named
    // best neighbor is never from the batch slice
    val rows = operators.Similarity.semdedupIncremental(spark, specDir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("vec_id") % 10 === 7L)
      val dup = r.getAs[Boolean]("is_dup")
      if (r.isNullAt(r.fieldIndex("best_cosine"))) assert(!dup)
      else {
        assert(dup === (r.getAs[Double]("best_cosine") >= 0.3))
        assert(r.getAs[Long]("best_indexed") % 10 !== 7L)
      }
    }
  }

  // ---- unigram-LM tokenizer: independent driver-side reference ----

  /** Plain-Scala reference of the whole unigram training loop (seed →
    * hard-EM rounds → prune), same integer surrogate mechanics.
    */
  private def refUnigram(words: Map[String, Long])
      : Seq[(String, Long)] = {
    val P = 4; val Keep = 512; val Rounds = 2
    val TfBits = 40; val TfSat = (1L << TfBits) - 1
    def pruned(pieces: Map[String, Long], chars: Set[String])
        : Map[String, Long] = {
      val cs = chars.map(c => c -> pieces.getOrElse(c, 0L)).toMap
      val multi = pieces.iterator.filter(_._1.length >= 2).toSeq
        .sortBy { case (p, f) => (-f, p) }.take(Keep).toMap
      cs ++ multi
    }
    val seedAll = words.toSeq.flatMap { case (w, c) =>
      for (i <- w.indices; l <- 1 to P if i + l <= w.length)
        yield w.substring(i, i + l) -> c
    }.groupBy(_._1).map { case (p, xs) => p -> xs.map(_._2).sum }
    val chars = seedAll.keySet.filter(_.length == 1)
    def viterbi(w: String, vm: Map[String, Long]): Seq[String] = {
      val dp = new Array[Long](w.length + 1)
      dp(0) = TfSat * 8L
      for (i <- 1 to w.length) {
        val cands = (1 to math.min(P, i)).flatMap { l =>
          vm.get(w.substring(i - l, i)).map { f =>
            val core = dp(i - l) >> 3
            val pnp = core >> TfBits
            val ptf = TfSat - (core & TfSat)
            (((pnp + 1) << TfBits) + (TfSat - math.min(ptf + f, TfSat))) * 8 + l
          }
        }
        dp(i) = cands.min
      }
      var pos = w.length
      val out = Seq.newBuilder[String]
      while (pos > 0) {
        val l = (dp(pos) & 7L).toInt
        out += w.substring(pos - l, pos); pos -= l
      }
      out.result()
    }
    var vocab = pruned(seedAll, chars)
    for (_ <- 1 to Rounds) {
      val counts = words.toSeq.flatMap { case (w, c) =>
        viterbi(w, vocab).map(_ -> c)
      }.groupBy(_._1).map { case (p, xs) => p -> xs.map(_._2).sum }
      vocab = pruned(counts, vocab.keySet.filter(_.length == 1))
    }
    vocab.toSeq.sortBy { case (p, f) => (-f, p) }.take(20)
  }

  test("unigram_train: equals a driver-side recomputation of the full " +
      "seed → hard-EM → prune loop") {
    val words = Tables.documents(spark, specDir)
      .select(explode(split(col("text"), "\\s+")).as("word"))
      .filter(length(col("word")) >= 1)
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val expected = refUnigram(words)
    val got = operators.Tokenizer.unigramTrain(spark, specDir)
      .orderBy(col("rank")).collect()
      .map(r => (r.getAs[String]("piece"), r.getAs[Long]("freq"))).toSeq
    assert(got === expected)
  }

  test("tokenizer_compare: the 512-piece unigram vocabulary compresses " +
      "strictly better than 3 BPE merges, and both are sane") {
    val row = operators.Tokenizer.tokenizerCompare(spark, specDir)
      .collect().head
    val chars = row.getAs[Long]("n_char_syms")
    val bpe = row.getAs[Long]("n_bpe_tokens")
    val uni = row.getAs[Long]("n_unigram_tokens")
    assert(chars > 0 && bpe > 0 && uni > 0)
    // every tokenization is between ceil(chars/4) (all 4-char pieces)
    // and chars (all singles)
    assert(uni <= chars && uni >= (chars + 3) / 4)
    assert(bpe <= chars)
    assert(row.getAs[Long]("unigram_ppm") < row.getAs[Long]("bpe_ppm"))
  }

  test("louvain_refine: exact gain identity, modularity non-decrease, " +
      "and the conflict-free move rule (sf0.1)") {
    // sf0.1, not the spec default: the smaller strong graphs collapse
    // to ONE LPA community, leaving no legal target to move to (the
    // betweenness-spec rule) — at sf0.1 the partition has 2 communities
    // and the refinement accepts a real move.
    val dir = "/root/testdata/sf0.1"
    val (pairs, comm, comm2, accepted) =
      operators.GraphExt.louvainParts(spark, dir)
    val es = pairs.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val c1 = comm.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val c2 = comm2.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val acc = accepted.collect().map(r => (r.getAs[Long]("node"),
      r.getAs[Long]("a"), r.getAs[Long]("t"), r.getAs[Long]("gain_x4m2")))
    assert(acc.nonEmpty, "sf0.1 must exercise a real accepted move")
    // independent driver-side modularity numerator (Σ 4m·in_c − deg_c²)
    def qnum(lab: Map[Long, Long]): BigInt = {
      val m = es.map(_._3).sum
      val in: Map[Long, Long] = es.filter(e => lab(e._1) == lab(e._2))
        .groupBy(e => lab(e._1))
        .map { case (c, g) => c -> g.map(_._3).sum }.toMap
      val k: Map[Long, Long] = es
        .flatMap(e => Seq(e._1 -> e._3, e._2 -> e._3))
        .groupBy(_._1).map { case (n, xs) => n -> xs.map(_._2).sum }.toMap
      val deg: Map[Long, Long] = k.toSeq.groupBy { case (n, _) => lab(n) }
        .map { case (c, xs) => c -> xs.map(_._2).sum }.toMap
      // NOTE the explicit vals: a block-position expression continued on
      // a line STARTING with `-` is two statements under Scala semicolon
      // inference (the block silently returns the unary-minus tail) —
      // this exact bug shipped here once and made qnum ≡ −Σdeg²
      deg.toSeq.map { case (c, d) =>
        val gain = BigInt(4) * BigInt(m) * BigInt(in.getOrElse(c, 0L))
        gain - BigInt(d) * BigInt(d)
      }.sum
    }
    val q1 = qnum(c1); val q2 = qnum(c2)
    val row = operators.GraphExt.louvainRefine(spark, dir).collect().head
    assert(BigInt(row.getAs[Long]("q_lpa_num")) === q1)
    assert(BigInt(row.getAs[Long]("q_refined_num")) === q2)
    // THE theorem: disjoint movers ⇒ ΔQ·4m² ≡ Σ accepted gains, so
    // strict-positive gains make non-decrease arithmetic, not luck
    assert(q2 === q1 + acc.map(a => BigInt(a._4)).sum)
    assert(acc.forall(_._4 > 0L))
    assert(row.getAs[Long]("q_refined_ppm") >= row.getAs[Long]("q_lpa_ppm"))
    // conflict-freedom the theorem rests on: accepted movers pairwise
    // non-adjacent and community-disjoint
    val accSet = acc.map(_._1).toSet
    assert(!es.exists(e => accSet(e._1) && accSet(e._2)))
    for (x <- acc; y <- acc if x._1 < y._1)
      assert(Set(x._2, x._3).intersect(Set(y._2, y._3)).isEmpty)
    // refined labels are the LPA labels with EXACTLY the accepted moves
    assert(c1.keySet === c2.keySet)
    acc.foreach { case (n, a, t, _) => assert(c1(n) === a && c2(n) === t) }
    assert(c1.filter(kv => !accSet(kv._1)) === c2.filter(kv => !accSet(kv._1)))
  }

  test("spearman_corr: default budget keeps the exact path (sum_d2 " +
      "defined)") {
    val row = operators.StatTests
      .spearmanCorr(spark, specDir).collect().head
    assert(!row.isNullAt(row.fieldIndex("sum_d2")))
    assert(row.getAs[Long]("sum_d2") > 0L)
  }

  // ---- quantile_normalize_bucketed: the last withGlobalRank rider ----

  /** (doc_id, source, n_chars) collected once per suite run. */
  private lazy val docRows: Seq[(Long, String, Long)] =
    Tables.documents(spark, specDir)
      .select(col("doc_id"), col("source"), col("n_chars"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSeq

  /** Independent driver-side recomputation of the bucketed
    * histogram-CDF map: same bucket formula, same half-unit midranks,
    * same single double expression, same bucket-minimum inverse CDF.
    * Returns doc_id -> (norm_chars, norm_bucket).
    */
  private def refQuantileNormalizeBucketed(
      rows: Seq[(Long, String, Long)], buckets: Int)
      : Map[Long, (Long, Long)] = {
    val gmin = rows.map(_._3).min
    val gmax = rows.map(_._3).max
    def vb(x: Long): Long = ((x - gmin) * buckets) / (gmax - gmin + 1)
    val n = rows.size.toLong
    val gpre = {
      var acc = 0L
      rows.groupBy(r => vb(r._3)).toSeq.sortBy(_._1).map { case (b, g) =>
        val e = (b, g.size.toLong, g.map(_._3).min, acc)
        acc += g.size; e
      }
    }
    val srcMid = rows.groupBy(_._2).flatMap { case (src, g) =>
      val ns = g.size.toLong
      var acc = 0L
      g.groupBy(r => vb(r._3)).toSeq.sortBy(_._1).map { case (b, gg) =>
        val c = gg.size.toLong
        val m2 = 2 * acc + c + 1
        acc += c
        (src, b) -> (m2, ns)
      }
    }
    rows.map { case (id, src, x) =>
      val (m2, ns) = srcMid((src, vb(x)))
      val pr = if (ns == 1) 0.5
        else (m2 - 2).toDouble / (2 * (ns - 1)).toDouble
      val gt = math.floor(pr * (n - 1).toDouble + 0.5).toLong + 1
      val (b, _, vmin, _) = gpre
        .find { case (_, c, _, base) => base < gt && gt <= base + c }
        .getOrElse(sys.error(s"no global bucket covers target rank $gt"))
      id -> (vmin, b)
    }.toMap
  }

  test("quantile_normalize_bucketed: equals the driver-side " +
      "recomputation at 1024 buckets") {
    val got = operators.Retrieval.quantileNormalizeBucketed(spark, specDir)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("norm_chars"), r.getAs[Long]("norm_bucket"))))
      .toMap
    val want = refQuantileNormalizeBucketed(docRows, 1024)
    assert(got.size == docRows.size, "one output row per doc")
    assert(got == want)
    // resolution sanity: the target buckets actually spread (the
    // within-source percent-rank grid is |source|-coarse, so the
    // realized target set is far smaller than the corpus)
    assert(got.values.map(_._2).toSet.size > 20)
  }

  test("quantile_normalize_bucketed: tracks the exact map in " +
      "global-CDF terms") {
    val exact = operators.Retrieval.quantileNormalize(spark, specDir)
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("norm_chars"))
      .toMap
    val bucketed = operators.Retrieval
      .quantileNormalizeBucketed(spark, specDir)
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("norm_chars"))
      .toMap
    val sortedVals = docRows.map(_._3).sorted
    def cdf(v: Long): Double =
      sortedVals.count(_ <= v).toDouble / sortedVals.size
    val drifts = docRows.map(r =>
      math.abs(cdf(bucketed(r._1)) - cdf(exact(r._1)))).sorted
    // midrank-vs-row_number tie splitting plus within-bucket
    // quantization; measured p95 = 0.018, max = 0.042 at sf0.01 — the
    // pins leave margin without letting the two maps diverge as
    // calibrators
    assert(drifts(drifts.size * 95 / 100) <= 0.03,
      s"p95 CDF drift ${drifts(drifts.size * 95 / 100)}")
    assert(drifts.last <= 0.10, s"max CDF drift ${drifts.last}")
  }

  test("quantile_normalize: bucketed fallback ENGAGES past the " +
      "rank-cell budget (no fail-loud), exact schema, budget's values") {
    spark.conf.set("spark.graft.maxRankCells", "256")
    try {
      val out = operators.Retrieval.quantileNormalize(spark, specDir)
      assert(out.columns.toSeq ==
        Seq("doc_id", "source", "n_chars", "norm_chars"),
        "the fallback must keep the exact path's schema")
      val got = out.collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("norm_chars"))
        .toMap
      val want = refQuantileNormalizeBucketed(docRows, 256)
        .map { case (id, (v, _)) => id -> v }
      assert(got == want)
    } finally spark.conf.unset("spark.graft.maxRankCells")
  }

  // ---- wordpiece_encode: greedy longest-match vs Viterbi ----

  test("wordpiece_encode: equals a driver-side greedy recomputation " +
      "over the engine's trained vocabulary, and greedy never beats " +
      "Viterbi per document") {
    val pieces = operators.Tokenizer
      .unigramVocab(Tables.documents(spark, specDir))
      .collect().map(_.getAs[String]("piece")).toSet
    def greedyNpIn(vocab: Set[String])(word: String): Long = {
      var pos = 0; var n = 0L
      while (pos < word.length) {
        val step = (4 to 2 by -1).find(l => pos + l <= word.length
          && vocab.contains(word.substring(pos, pos + l))).getOrElse(1)
        pos += step; n += 1
      }
      n
    }
    def greedyNp(word: String): Long = greedyNpIn(pieces)(word)
    val docs = Tables.documents(spark, specDir)
      .select(col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1))
    val want = docs.map { case (id, text) =>
      id -> text.split("\\s+").filter(_.nonEmpty).map(greedyNp).sum
    }.toMap
    val got = operators.Tokenizer.wordpieceEncode(spark, specDir)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Long]("n_wordpiece_tokens")).toMap
    assert(got.size == docs.length)
    assert(got == want)
    // Viterbi minimizes piece count by construction -- greedy can tie
    // but never win, document by document
    val viterbi = operators.Tokenizer.unigramEncode(spark, specDir)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Long]("n_unigram_tokens")).toMap
    docs.foreach { case (id, _) =>
      assert(got(id) >= viterbi(id),
        s"doc $id: greedy ${got(id)} beat Viterbi ${viterbi(id)}")
    }
    // On this corpus the two rules happen to TIE on every document
    // (greedy longest-match is optimal under this trained vocabulary) —
    // so pin that the RULES genuinely differ with the classic
    // counterexample instead of demanding a corpus gap that is not a
    // theorem: greedy eats "ab" and strands the tail, Viterbi takes
    // "a" + "bcc".
    val adversarial = Set("a", "b", "c", "ab", "bcc")
    assert(greedyNpIn(adversarial)("abcc") === 3L)
    def minPieces(vocab: Set[String], word: String): Long = {
      val dp = Array.fill(word.length + 1)(Long.MaxValue / 2)
      dp(0) = 0
      for (i <- 1 to word.length; l <- 1 to math.min(4, i))
        if (vocab.contains(word.substring(i - l, i)))
          dp(i) = math.min(dp(i), dp(i - l) + 1)
      dp(word.length)
    }
    assert(minPieces(adversarial, "abcc") === 2L)
  }
}
