package graft

import org.apache.spark.sql.functions._

/** Invariant tests for the round-9 DQ/retrieval additions (Benford,
  * l-diversity, BM25, quantile normalization, Theil–Sen). Value-level
  * correctness is the DuckDB oracle gate's job.
  */
class RetrievalSpec extends SparkSpec {

  test("benford_audit: 9 digits per column, shares sum to ~1e6, counts reconcile") {
    val rows = operators.Quality.benfordAudit(spark, sfDir).collect()
    val byCol = rows.groupBy(_.getAs[String]("col_name"))
    assert(byCol.keySet == Set("l_extendedprice", "o_totalprice"))
    byCol.foreach { case (name, rs) =>
      rs.foreach { r =>
        val d = r.getAs[Long]("digit"); assert(d >= 1 && d <= 9)
        assert(r.getAs[Long]("dev_ppm") ==
          r.getAs[Long]("observed_ppm") - r.getAs[Long]("expected_ppm"))
      }
      val share = rs.map(_.getAs[Long]("observed_ppm")).sum
      assert(share <= 1000000L && share > 1000000L - rs.length)
      val n = rs.map(_.getAs[Long]("n")).sum
      val want =
        if (name == "l_extendedprice") Tables.lineitem(spark, sfDir).count()
        else Tables.orders(spark, sfDir).count()
      assert(n == want, s"$name digit counts must cover every row")
    }
  }

  test("l_diversity_audit: partitions the quasi groups and the customers") {
    val rows = operators.Quality.lDiversityAudit(spark, sfDir).collect()
    rows.foreach { r =>
      val l = r.getAs[Long]("l_distinct"); assert(l >= 1 && l <= 5)
    }
    val groups = Tables.customer(spark, sfDir)
      .select(col("c_nationkey"), floor(col("c_acctbal") / 1000).as("b"))
      .distinct().count()
    assert(rows.map(_.getAs[Long]("n_groups")).sum == groups)
    assert(rows.map(_.getAs[Long]("n_customers")).sum ==
      Tables.customer(spark, sfDir).count())
  }

  test("bm25_topk: positive descending scores, every hit contains a query term") {
    val rows = operators.Retrieval.bm25Topk(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val scores = rows.map(_.getAs[Double]("score"))
    assert(scores.forall(_ > 0))
    assert(scores.sameElements(scores.sorted.reverse))
    val hitIds = rows.map(_.getAs[Long]("doc_id")).toSet
    val withTerm = Tables.documents(spark, sfDir)
      .filter(col("text").rlike("(^|\\s)(spark|hash|merge)(\\s|$)"))
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(hitIds.subsetOf(withTerm), "a scored doc must contain a query term")
  }

  test("rrf_fusion: fused scores decompose into the two rank terms") {
    val rows = operators.Retrieval.rrfFusion(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 40)
    rows.foreach { r =>
      val rl = r.getAs[Long]("rank_lex"); val rs = r.getAs[Long]("rank_sem")
      assert(rl >= -1 && rl != 0 && rl <= 20)
      assert(rs >= -1 && rs != 0 && rs <= 20)
      assert(rl != -1 || rs != -1, "a fused row must appear in some list")
      val want = (if (rl > 0) 1000000 / (60 + rl) else 0L) +
        (if (rs > 0) 1000000 / (60 + rs) else 0L)
      assert(r.getAs[Long]("rrf_ppm") == want)
    }
    val scores = rows.map(_.getAs[Long]("rrf_ppm"))
    assert(scores.sameElements(scores.sorted.reverse))
  }

  test("contrastive_pairs: labels verified, margin matches the cosines") {
    val rows = operators.Retrieval.contrastivePairs(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val labels = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("label")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    rows.foreach { r =>
      val q = r.getAs[Long]("query_id")
      assert(labels(r.getAs[Long]("pos_id")) == labels(q),
        "positive must share the query label")
      assert(labels(r.getAs[Long]("neg_id")) != labels(q),
        "negative must differ in label")
      assert(r.getAs[Long]("pos_id") != q)
      // rounded margin within 1 ulp-of-ppm of the rounded cosine difference
      val approx = math.round((r.getAs[Double]("pos_cos")
        - r.getAs[Double]("neg_cos")) * 1e6)
      assert(math.abs(r.getAs[Long]("margin_ppm") - approx) <= 2)
    }
  }

  test("random_walks: every step follows a real edge, walks are complete") {
    val rows = operators.GraphExt.randomWalks(spark, sfDir).collect()
    val byWalk = rows.groupBy(r =>
      (r.getAs[Long]("seed"), r.getAs[Long]("walk_id")))
    assert(byWalk.nonEmpty)
    // rebuild the undirected edge set independently
    val items = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val pairCounts = scala.collection.mutable.Map.empty[(Long, Long), Int]
    items.groupBy(_._1).values.foreach { os =>
      val ps = os.map(_._2).distinct.sorted
      for (a <- ps; b <- ps if a < b)
        pairCounts((a, b)) = pairCounts.getOrElse((a, b), 0) + 1
    }
    // NOTE: Map.collect with a tuple-returning function resolves to the
    // MAP-building overload and silently collapses pairs by first
    // element — filter + keySet keeps the full edge set.
    val edges = pairCounts.filter(_._2 >= 2).keySet.toSet
    def connected(a: Long, b: Long) =
      edges.contains(if (a < b) (a, b) else (b, a))
    byWalk.foreach { case ((seed, _), steps) =>
      val path = steps.sortBy(_.getAs[Long]("step")).map(_.getAs[Long]("node"))
      assert(path.length == 6, "5 steps + seed")
      assert(path.head == seed)
      path.sliding(2).foreach { case Array(a, b) =>
        assert(connected(a, b),
          s"walk traversed a non-edge $a -> $b (path ${path.mkString(",")}; " +
            s"pc=${pairCounts.get(if (a < b) (a, b) else (b, a))})")
      }
    }
  }

  test("snippet_extract: every snippet window really contains its hit count") {
    val rows = operators.Retrieval.snippetExtract(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val terms = Set("spark", "hash", "merge")
    rows.foreach { r =>
      val snippet = r.getAs[String]("snippet").split("\\s+")
      assert(snippet.length <= 8)
      val inWindow = snippet.count(terms)
      assert(inWindow == r.getAs[Long]("window_hits"),
        s"claimed ${r.getAs[Long]("window_hits")} hits, snippet has $inWindow")
      assert(r.getAs[Long]("window_hits") >= 1,
        "a bm25 hit must contain at least one query term")
      assert(r.getAs[Long]("best_start") >= 0)
    }
  }

  test("decayed_popularity: newer activity dominates, totals bound the score") {
    val rows = operators.GraphExt.decayedPopularity(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val scores = rows.map(_.getAs[Long]("score_micro"))
    assert(scores.sameElements(scores.sorted.reverse))
    rows.foreach { r =>
      // every bucket weight ≤ 2^20 ⇒ score ≤ total · 2^20
      assert(r.getAs[Long]("score_micro") <= r.getAs[Long]("n_total") * (1L << 20))
      assert(r.getAs[Long]("score_micro") >= 0)
    }
  }

  test("clustering_coefficient: lcc identity holds against per-node recounts") {
    val rows = operators.GraphExt.clusteringCoefficient(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach { r =>
      val deg = r.getAs[Long]("deg"); val tri = r.getAs[Long]("n_tri")
      assert(deg >= 3)
      // tri(v) bounded by C(deg, 2) possible closed wedges
      assert(tri <= deg * (deg - 1) / 2)
      assert(r.getAs[Long]("lcc_ppm") ==
        tri * 2000000L / (deg * (deg - 1)))
      assert(r.getAs[Long]("lcc_ppm") <= 1000000L)
    }
  }

  test("dp_noisy_counts: noise is bounded, deterministic, and clamped") {
    val a = operators.Quality.dpNoisyCounts(spark, sfDir).collect()
    val b = operators.Quality.dpNoisyCounts(spark, sfDir).collect()
    // deterministic release: identical on re-run (the mechanism's point)
    assert(a.map(_.toString).sorted.sameElements(b.map(_.toString).sorted))
    val exact = Tables.customer(spark, sfDir)
      .groupBy(col("c_nationkey").cast("long"), col("c_mktsegment"))
      .count().collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(a.length == exact.size)
    a.foreach { r =>
      val key = (r.getAs[Long]("nationkey"), r.getAs[String]("mktsegment"))
      val noisy = r.getAs[Long]("noisy_count")
      assert(noisy >= 0, "clamped at zero")
      // |binomial(48, ½) − 24| ≤ 24
      assert(math.abs(noisy - exact(key)) <= 24,
        s"noise outside the binomial support at $key")
    }
  }

  test("ks_statistic: bounds and cross-multiplied decision agree") {
    val r = operators.StatTests.ksStatistic(spark, sfDir).collect().head
    val n1 = r.getAs[Long]("n1"); val n2 = r.getAs[Long]("n2")
    assert(n1 > 0 && n2 > 0)
    val d = r.getAs[Long]("d_cross")
    assert(d >= 0 && d <= n1 * n2, "D is a CDF gap: 0 ≤ D ≤ 1")
    assert(r.getAs[Long]("d_ppm") == d * 1000000L / (n1 * n2))
    // the decision multiplies in double (BIGINT wraps past d ≈ 3e7)
    assert(r.getAs[Boolean]("reject_h0_5pct") ==
      (d.toDouble * d.toDouble * 10000.0 >
        18496.0 * n1.toDouble * n2.toDouble * (n1 + n2).toDouble))
  }

  test("gini_concentration: matches a brute-force pairwise recomputation") {
    val r = operators.StatTests.giniConcentration(spark, sfDir).collect().head
    val spends = Tables.orders(spark, sfDir)
      .groupBy(col("o_custkey"))
      .agg(sum(floor(col("o_totalprice") * 100 + lit(0.5)).cast("bigint"))
        .as("c")).collect().map(_.getAs[Long]("c"))
    assert(r.getAs[Long]("n_customers") == spends.length)
    val total = spends.sum
    assert(r.getAs[Long]("total_cents") == total)
    val hmd = (for (a <- spends; b <- spends if a > b) yield a - b).map(BigInt(_)).sum
    val want = (BigInt(2) * hmd * 1000000 /
      (BigInt(2) * spends.length * total)).toLong
    // the op divides the denominator first (overflow treatment): ≤2 ppm drift
    assert(math.abs(r.getAs[Long]("gini_ppm") - want) <= 2,
      s"gini ${r.getAs[Long]("gini_ppm")} vs exact $want")
    assert(r.getAs[Long]("gini_ppm") >= 0 && r.getAs[Long]("gini_ppm") < 1000000L)
  }

  test("neyman_allocation: budget exact, allocations near-proportional to weight") {
    val rows = operators.StatTests.neymanAllocation(spark, sfDir).collect()
    assert(rows.map(_.getAs[Long]("n_alloc")).sum == 1000L,
      "largest-remainder must hit the budget exactly")
    val wTot = rows.map(_.getAs[Long]("sigma_scaled_x100")).sum
    rows.foreach { r =>
      val ideal = r.getAs[Long]("sigma_scaled_x100").toDouble * 1000.0 / wTot
      assert(math.abs(r.getAs[Long]("n_alloc") - ideal) < 1.0 + 1e-9,
        "largest-remainder apportionment stays within 1 of the ideal share")
    }
  }

  test("mann_whitney_auc: U identities hold and AUC matches brute force") {
    val r = operators.StatTests.mannWhitneyAuc(spark, sfDir).collect().head
    val n1 = r.getAs[Long]("n1"); val n2 = r.getAs[Long]("n2")
    assert(r.getAs[Long]("u1_x2") + r.getAs[Long]("u2_x2") == 2 * n1 * n2,
      "U1 + U2 must equal n1·n2")
    // brute-force AUC over the two largest sources
    val bySource = Tables.documents(spark, sfDir)
      .select(col("source"), col("n_chars")).collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(1))).toMap
    val top2 = bySource.toSeq.sortBy { case (s, v) => (-v.length, s) }.take(2)
    val (a, b) = (top2(0)._2, top2(1)._2)
    assert(n1 == a.length && n2 == b.length)
    val wins = (for (x <- a; y <- b) yield
      if (x > y) 2L else if (x == y) 1L else 0L).sum
    assert(r.getAs[Long]("u1_x2") == wins,
      "doubled U1 must equal 2·wins + ties from brute force")
    val auc = r.getAs[Long]("auc_ppm")
    assert(auc >= 0 && auc <= 1000000L)
  }

  test("chi_square_independence: statistic nonnegative, dof from the real grid") {
    val r = operators.StatTests.chiSquareIndependence(spark, sfDir).collect().head
    assert(r.getAs[Long]("chi2_x10000") >= 0)
    val grid = Tables.customer(spark, sfDir)
      .select(col("c_nationkey"), col("c_mktsegment")).collect()
    val nr = grid.map(_.get(0)).distinct.length
    val nc = grid.map(_.getString(1)).distinct.length
    assert(r.getAs[Long]("dof") == (nr - 1).toLong * (nc - 1))
    assert(r.getAs[Boolean]("reject_independence_5pct") ==
      (r.getAs[Long]("chi2_x10000") > 1198710L))
    // Cramér's V in [0, 1]
    val v = r.getAs[Long]("cramers_v_x10000")
    assert(v >= 0 && v <= 10000L, s"Cramér's V $v out of [0,1]")
  }

  test("spearman_corr: matches a driver-side exact recomputation") {
    val r = operators.StatTests.spearmanCorr(spark, sfDir).collect().head
    val joined = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"),
        floor(col("o_totalprice") * 100 + lit(0.5)).cast("bigint").as("cents"))
      .join(Tables.lineitem(spark, sfDir).groupBy(col("l_orderkey"))
        .agg(count(lit(1)).as("nl")),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_orderkey"), col("cents"), col("nl")).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    val n = joined.length.toLong
    assert(r.getAs[Long]("n") == n)
    val rv = joined.sortBy(t => (t._2, t._1)).zipWithIndex
      .map { case (t, i) => t._1 -> (i + 1L) }.toMap
    val rw = joined.sortBy(t => (t._3, t._1)).zipWithIndex
      .map { case (t, i) => t._1 -> (i + 1L) }.toMap
    val sumD2 = joined.map(t => { val d = rv(t._1) - rw(t._1); d * d }).sum
    assert(r.getAs[Long]("sum_d2") == sumD2)
    val rho = r.getAs[Long]("rho_ppm")
    assert(rho >= -1000000L && rho <= 1000000L)
  }

  test("acf_daily: full lag grid, pair accounting, bounded coefficients") {
    val rows = operators.EventScience.acfDaily(spark, sfDir).collect()
    val types = Tables.events(spark, sfDir)
      .select(col("event_type")).distinct().count()
    assert(rows.length.toLong == types * 7, "7 lags per type")
    val days = Tables.events(spark, sfDir)
      .select(col("event_type"), expr("ts div 86400000000000")).distinct()
      .collect().groupBy(_.getString(0)).view.mapValues(_.length.toLong).toMap
    rows.foreach { r =>
      val lag = r.getAs[Long]("lag"); assert(lag >= 1 && lag <= 7)
      // a contiguous series has exactly n−k lag-k pairs
      assert(r.getAs[Long]("n_pairs") <= days(r.getAs[String]("event_type")) - lag + 1)
      val a = r.getAs[Long]("acf_ppm")
      assert(math.abs(a) <= 1200000L, s"acf $a far outside [-1, 1]")
    }
  }

  test("skyline_2d: returned frontier is exactly the non-dominated set") {
    val got = operators.RelationalExt.skyline2d(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("part_key"), r.getAs[Long]("price_cents"),
        r.getAs[Long]("size"))).toSet
    val all = Tables.part(spark, sfDir)
      .select(col("p_partkey").cast("long"),
        floor(col("p_retailprice") * 100 + lit(0.5)).cast("bigint"),
        col("p_size").cast("long")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    def dominated(x: (Long, Long, Long)) = all.exists(o =>
      o._2 <= x._2 && o._3 >= x._3 && (o._2 < x._2 || o._3 > x._3))
    val want = all.filterNot(dominated).toSet
    assert(got == want, s"skyline mismatch: got ${got.size}, want ${want.size}")
  }

  test("repurchase_curve: gaps account for every non-first order, cum ppm monotone") {
    val rows = operators.RelationalExt.repurchaseCurve(spark, sfDir).collect()
      .sortBy(_.getAs[Long]("gap_w"))
    assert(rows.nonEmpty)
    val orders = Tables.orders(spark, sfDir)
      .select(col("o_custkey")).collect().map(_.getLong(0))
    val expectGaps = orders.length - orders.distinct.length
    assert(rows.map(_.getAs[Long]("n_gaps")).sum == expectGaps,
      "one gap per non-first order of each customer")
    val cums = rows.map(_.getAs[Long]("cum_ppm"))
    assert(cums.sameElements(cums.sorted), "cumulative share must be monotone")
    assert(cums.last <= 1000000L && cums.last > 1000000L - rows.length)
    rows.foreach(r => assert(r.getAs[Long]("gap_w") >= 0))
  }

  test("quantile_normalize: bijection on ranks, monotone within source") {
    val rows = operators.Retrieval.quantileNormalize(spark, sfDir).collect()
    val n = Tables.documents(spark, sfDir).count()
    assert(rows.length.toLong == n, "every document must map")
    val globalChars = Tables.documents(spark, sfDir)
      .select(col("n_chars")).collect().map(_.getLong(0)).toSet
    rows.foreach(r => assert(globalChars(r.getAs[Long]("norm_chars")),
      "normalized value must come from the global distribution"))
    rows.groupBy(_.getAs[String]("source")).foreach { case (_, rs) =>
      val sorted = rs.sortBy(r =>
        (r.getAs[Long]("n_chars"), r.getAs[Long]("doc_id")))
      val normed = sorted.map(_.getAs[Long]("norm_chars"))
      assert(normed.sameElements(normed.sorted),
        "normalization must preserve within-source order")
    }
  }

  test("theilsen_trend: one row per nation, pair counts are C(months, 2)") {
    val rows = operators.Retrieval.theilsenTrend(spark, sfDir).collect()
    val monthly = Tables.orders(spark, sfDir)
      .join(Tables.customer(spark, sfDir),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_nationkey").cast("long").as("nk"),
        (year(col("o_orderdate")) * 12 + month(col("o_orderdate"))).as("m"))
      .distinct().collect()
      .groupBy(_.getAs[Long]("nk")).view.mapValues(_.length.toLong).toMap
    assert(rows.map(_.getAs[Long]("nationkey")).toSet == monthly.keySet)
    rows.foreach { r =>
      val k = monthly(r.getAs[Long]("nationkey"))
      assert(r.getAs[Long]("n_pairs") == k * (k - 1) / 2)
    }
  }

  test("ols_trend: matches a driver-side exact OLS over the same monthly frame") {
    val rows = operators.Retrieval.olsTrend(spark, sfDir).collect()
      .map(r => r.getAs[Long]("nationkey") -> r).toMap
    val monthly = Tables.orders(spark, sfDir)
      .join(Tables.customer(spark, sfDir),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey").cast("long").as("nk"),
        (year(col("o_orderdate")) * 12 + month(col("o_orderdate")) - 1)
          .cast("long").as("m"))
      .agg(sum(floor(col("o_totalprice") * 100 + lit(0.5)).cast("bigint"))
        .as("cents"))
      .collect()
      .map(r => (r.getAs[Long]("nk"), r.getAs[Long]("m"), r.getAs[Long]("cents")))
      .groupBy(_._1)
    assert(rows.keySet == monthly.keySet)
    monthly.foreach { case (nk, pts) =>
      val r = rows(nk)
      val n = pts.length
      assert(r.getAs[Long]("n_months") == n.toLong)
      if (n >= 2) {
        // Exact integer moments mirror the operator's BIGINT/DECIMAL path.
        val sx = pts.map(p => BigInt(p._2)).sum
        val sx2 = pts.map(p => BigInt(p._2) * BigInt(p._2)).sum
        val sy = pts.map(p => BigInt(p._3)).sum
        val sxy = pts.map(p => BigInt(p._2) * BigInt(p._3)).sum
        val sy2 = pts.map(p => BigInt(p._3) * BigInt(p._3)).sum
        val denx = (BigInt(n) * sx2 - sx * sx).toDouble
        val deny = (BigInt(n) * sy2 - sy * sy).toDouble
        val num = (BigInt(n) * sxy - sx * sy).toDouble
        val slope = num / denx
        assert(r.getAs[Double]("slope_cents") ==
          math.floor(slope * 1.0e4 + 0.5) / 1.0e4)
        assert(r.getAs[Long]("intercept_cents") ==
          math.floor((sy.toDouble - slope * sx.toDouble) / n + 0.5).toLong)
        if (deny != 0.0) {
          val ppm = r.getAs[Long]("r2_ppm")
          assert(ppm == math.floor(num * num / (denx * deny) * 1.0e6).toLong)
          assert(ppm >= 0L && ppm <= 1000000L)
        } else assert(r.isNullAt(r.fieldIndex("r2_ppm")))
      } else {
        assert(r.isNullAt(r.fieldIndex("slope_cents")))
        assert(r.isNullAt(r.fieldIndex("intercept_cents")))
      }
    }
  }

  test("kendall_tau_b: matches a brute-force O(n²) pair recount") {
    val r = operators.StatTests.kendallTauB(spark, sfDir).collect().head
    val pts = Tables.orders(spark, sfDir)
      .select(floor(col("o_totalprice") * 100 + lit(0.5)).cast("bigint"),
        substring(col("o_orderpriority"), 1, 1).cast("int"))
      .collect().map(x => (x.getLong(0), x.getInt(1)))
    var conc = 0L; var disc = 0L; var tx2 = 0L; var ty2 = 0L
    for (i <- pts.indices; j <- pts.indices if i != j) {
      val ((xi, yi), (xj, yj)) = (pts(i), pts(j))
      if (xi == xj) tx2 += 1
      if (yi == yj) ty2 += 1
      if (xi < xj && yi < yj) conc += 1
      else if (xi < xj && yi > yj) disc += 1
    }
    val n = pts.length.toLong
    assert(r.getAs[Long]("n") == n)
    assert(r.getAs[Long]("n_concordant") == conc, "concordant recount")
    assert(r.getAs[Long]("n_discordant") == disc, "discordant recount")
    assert(r.getAs[Long]("tied_x_x2") == tx2 && r.getAs[Long]("tied_y_x2") == ty2)
    val want = math.floor(2.0 * (conc - disc).toDouble * 1000000.0 /
      (math.sqrt((n * (n - 1) - tx2).toDouble)
        * math.sqrt((n * (n - 1) - ty2).toDouble))).toLong
    assert(r.getAs[Long]("tau_b_ppm") == want, "tau-b formula recount")
    assert(math.abs(r.getAs[Long]("tau_b_ppm")) <= 1000000L)
  }

  test("chi2_residuals: every cell matches an exact driver recompute") {
    val rows = operators.StatTests.chi2Residuals(spark, sfDir).collect()
    val cells = Tables.customer(spark, sfDir)
      .groupBy(col("c_nationkey").cast("long").as("nk"), col("c_mktsegment").as("seg"))
      .agg(count(lit(1)).as("o")).collect()
      .map(r => (r.getAs[Long]("nk"), r.getAs[String]("seg")) -> r.getAs[Long]("o"))
      .toMap
    assert(rows.length == cells.size)
    val rowM = cells.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val colM = cells.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
    val n = cells.values.sum
    assert(rows.map(_.getAs[Long]("o")).sum == n)
    rows.foreach { rr =>
      val k = (rr.getAs[Long]("nationkey"), rr.getAs[String]("seg"))
      val (o, r, c) = (cells(k), rowM(k._1), colM(k._2))
      val e = r.toDouble * c.toDouble / n.toDouble
      assert(rr.getAs[Long]("expected_x100") == math.floor(e * 100.0 + 0.5).toLong)
      val resid = (o.toDouble - e) /
        math.sqrt(e * (1.0 - r.toDouble / n.toDouble) * (1.0 - c.toDouble / n.toDouble))
      assert(rr.getAs[Long]("adj_resid_x1e4") ==
        math.floor(resid * 1.0e4 + 0.5).toLong, s"residual at $k")
      assert((rr.getAs[Long]("driver_5pct") == 1L) == (math.abs(resid) > 1.959964))
    }
  }

  test("qq_compare: nearest-rank quantiles match a driver-side sort") {
    val rows = operators.StatTests.qqCompare(spark, sfDir).collect()
      .map(r => r.getAs[Long]("p") -> r).toMap
    assert(rows.keySet == (1 to 19).map(_ * 5L).toSet)
    val bySrc = Tables.documents(spark, sfDir)
      .select(col("source"), col("n_chars")).collect()
      .map(x => (x.getString(0), x.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val Seq(x1, x2) = bySrc.toSeq.sortBy { case (s, v) => (-v.length, s) }
      .take(2).map(_._2)
    def q(xs: Array[Long], p: Long) = xs(((p * xs.length + 99) / 100 - 1).toInt)
    rows.foreach { case (p, r) =>
      assert(r.getAs[Long]("q1_chars") == q(x1, p), s"q1 at p=$p")
      assert(r.getAs[Long]("q2_chars") == q(x2, p), s"q2 at p=$p")
      assert(r.getAs[Long]("qq_gap") ==
        r.getAs[Long]("q1_chars") - r.getAs[Long]("q2_chars"))
    }
    // monotone in p: nearest-rank quantiles never decrease
    val ps = (1 to 19).map(_ * 5L)
    ps.zip(ps.tail).foreach { case (a, b) =>
      assert(rows(a).getAs[Long]("q1_chars") <= rows(b).getAs[Long]("q1_chars"))
      assert(rows(a).getAs[Long]("q2_chars") <= rows(b).getAs[Long]("q2_chars"))
    }
  }

  test("welch_ttest: t and df match an exact-moment driver recomputation") {
    val r = operators.StatTests.welchTtest(spark, sfDir).collect().head
    val bySrc = Tables.documents(spark, sfDir)
      .select(col("source"), col("n_chars")).collect()
      .map(x => (x.getString(0), x.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val top2 = bySrc.toSeq.sortBy { case (s, v) => (-v.length, s) }.take(2)
    val Seq((_, x1), (_, x2)) = top2.map(identity)
    assert(r.getAs[Long]("n1") == x1.length.toLong)
    assert(r.getAs[Long]("n2") == x2.length.toLong)
    def mom(xs: Array[Long]) =
      (xs.length.toLong, xs.map(BigInt(_)).sum, xs.map(x => BigInt(x) * x).sum)
    val (n1, s1, q1) = mom(x1); val (n2, s2, q2) = mom(x2)
    // same fixed order as the operator: each step correctly rounded
    val m1 = s1.toDouble / n1.toDouble
    val m2 = s2.toDouble / n2.toDouble
    val a = (q1.toDouble - s1.toDouble * s1.toDouble / n1.toDouble) /
      (n1 - 1).toDouble / n1.toDouble
    val b = (q2.toDouble - s2.toDouble * s2.toDouble / n2.toDouble) /
      (n2 - 1).toDouble / n2.toDouble
    assert(r.getAs[Long]("mean1_x100") == math.floor(m1 * 100.0 + 0.5).toLong)
    assert(r.getAs[Long]("mean2_x100") == math.floor(m2 * 100.0 + 0.5).toLong)
    val t = (m1 - m2) / math.sqrt(a + b)
    val dfDen = a * a / (n1 - 1).toDouble + b * b / (n2 - 1).toDouble
    val df = (a + b) * (a + b) / dfDen
    assert(r.getAs[Long]("t_x1e6") == math.floor(t * 1.0e6).toLong)
    assert(r.getAs[Long]("df_x1e6") == math.floor(df * 1.0e6).toLong)
    if (df >= 30.0)
      assert((r.getAs[Long]("reject_h0_5pct") == 1L) == (math.abs(t) > 1.959964))
    else assert(r.isNullAt(r.fieldIndex("reject_h0_5pct")))
  }

  test("anova_oneway: F and eta2 match a classical SS recomputation within floor bias") {
    val r = operators.StatTests.anovaOneway(spark, sfDir).collect().head
    val pts = Tables.documents(spark, sfDir)
      .select(col("source"), col("n_chars")).collect()
      .map(x => (x.getString(0), x.getLong(1)))
    val n = pts.length.toLong
    val k = pts.map(_._1).distinct.length.toLong
    assert(r.getAs[Long]("n_total") == n)
    assert(r.getAs[Long]("k_groups") == k)
    val grand = pts.map(_._2.toDouble).sum / n
    val bySrc = pts.groupBy(_._1).values
    val ssb = bySrc.map { g =>
      val m = g.map(_._2.toDouble).sum / g.length
      g.length * (m - grand) * (m - grand)
    }.sum
    val ssw = bySrc.map { g =>
      val m = g.map(_._2.toDouble).sum / g.length
      g.map(x => (x._2 - m) * (x._2 - m)).sum
    }.sum
    // per-source fixed-point floors bias each µ-unit sum by ≤ 1 per
    // group (two fixed-pointed columns + the grand term); the driver
    // recount itself carries relative double error, hence the 1e-9 term
    val tol = (2 * k + 2) / 1e6 + 1e-9 * (ssb + ssw)
    assert(math.abs(r.getAs[Long]("ssb_fx") / 1e6 - ssb) <= tol,
      s"SSB ${r.getAs[Long]("ssb_fx") / 1e6} vs recount $ssb")
    assert(math.abs(r.getAs[Long]("ssw_fx") / 1e6 - ssw) <= tol,
      s"SSW ${r.getAs[Long]("ssw_fx") / 1e6} vs recount $ssw")
    val f = (ssb / (k - 1)) / (ssw / (n - k))
    assert(math.abs(r.getAs[Long]("f_x1e6") / 1e6 - f) < 1e-3,
      s"F ${r.getAs[Long]("f_x1e6") / 1e6} vs recount $f")
    val eta2 = ssb / (ssb + ssw)
    assert(math.abs(r.getAs[Long]("eta2_ppm") / 1e6 - eta2) < 1e-4)
    if (n - k >= 1000 && k - 1 <= 20)
      assert(!r.isNullAt(r.fieldIndex("reject_h0_5pct")))
  }

  test("kruskal_wallis: H matches a midrank recomputation within floor bias") {
    val r = operators.StatTests.kruskalWallis(spark, sfDir).collect().head
    val pts = Tables.documents(spark, sfDir)
      .select(col("source"), col("n_chars")).collect()
      .map(x => (x.getString(0), x.getLong(1)))
    val n = pts.length.toLong
    assert(r.getAs[Long]("n_total") == n)
    val k = pts.map(_._1).distinct.length.toLong
    assert(r.getAs[Long]("k_groups") == k)
    // midranks via sort: rank of a tie cell = mean of its positions
    val sorted = pts.map(_._2).sorted
    val rankOf = sorted.zipWithIndex.groupBy(_._1).view
      .mapValues(v => v.map(_._2 + 1).sum.toDouble / v.length).toMap
    val bySrc = pts.groupBy(_._1)
    val sumTerm = bySrc.values.map { docs =>
      val ri = docs.map(x => rankOf(x._2)).sum
      12.0 * ri * ri / docs.length / (n * (n + 1))
    }.sum
    val h = sumTerm - 3.0 * (n + 1)
    // per-source fixed-point floors bias the engine sum by ≤ k µ-units
    assert(math.abs(r.getAs[Long]("h_x1e6") / 1e6 - h) <= (k + 1) / 1e6,
      s"H ${r.getAs[Long]("h_x1e6") / 1e6} vs recount $h")
    val tieNum = sorted.groupBy(identity).values
      .map(g => g.length.toLong).map(t => t * t * t - t).sum
    assert(r.getAs[Long]("tie_num") == tieNum, "tie numerator recount")
    val corr = 1.0 - tieNum.toDouble / (n.toDouble * n * n - n)
    assert(math.abs(r.getAs[Long]("h_corrected_x1e6") / 1e6 - h / corr)
      <= (k + 2) / 1e6, "tie-corrected H recount")
  }
}
