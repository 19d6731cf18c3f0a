package graft

import org.apache.spark.sql.functions._

/** Invariant tests for the round-3 additions: TPC-H completion patterns,
  * event cohort/funnel analytics, source-overlap matrix, and k-means.
  * (Value-level correctness is the DuckDB oracle gate's job.)
  */
class AnalyticsExtSpec extends SparkSpec {

  test("q2_min_cost: one row per part, cost positive") {
    val rows = operators.RelationalExt.q2MinCost(spark, sfDir).collect()
    val parts = rows.map(_.getAs[Long]("part_key"))
    assert(parts.distinct.length === parts.length)
    rows.foreach(r => assert(r.getAs[Double]("unit_cost") > 0))
  }

  test("q11_important_stock: top-20 by value, shares and the per-mille " +
      "flag agree with an independent total") {
    val rows = operators.RelationalExt.q11ImportantStock(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    // recompute the nation total independently from raw lineitem
    val total = Tables.lineitem(spark, sfDir)
      .join(Tables.supplier(spark, sfDir)
          .join(Tables.nation(spark, sfDir).filter(col("n_name") === "NATION_19"),
            col("s_nationkey") === col("n_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .agg(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
      .collect()(0).getDouble(0)
    val values = rows.map(_.getAs[Double]("value"))
    assert(values.zip(values.tail).forall { case (a, b) => a >= b },
      "top-20 must be ordered by value descending")
    rows.foreach { r =>
      val v = r.getAs[Double]("value")
      val ppm = r.getAs[Long]("share_ppm")
      assert(math.abs(ppm - v * 1e6 / total) <= 1.0,
        s"share_ppm $ppm vs recomputed ${v * 1e6 / total}")
      assert(r.getAs[Boolean]("above_mille") == (v * 1000 > total * (1 - 1e-9))
        || math.abs(v * 1000 - total) < 1e-3 * total,
        "per-mille verdict must match the recomputed total")
    }
  }

  test("q16_supplier_cnt: counts bounded by total suppliers, filters hold") {
    val rows = operators.RelationalExt.q16SupplierCnt(spark, sfDir).collect()
    val nSupp = Tables.supplier(spark, sfDir).count()
    rows.foreach { r =>
      assert(r.getAs[Long]("supplier_cnt") <= nSupp)
      assert(r.getAs[String]("p_brand") != "Brand#15")
      assert(!r.getAs[String]("p_type").startsWith("PROMO"))
    }
  }

  test("q20_part_promo: ranked shares and the 18% flag equal an " +
      "independent recomputation") {
    // Recompute every supplier's promo share from raw tables with plain
    // double sums (quantities are integer-valued, so sums < 2^53 are
    // exact) — a flipped comparison or swapped factors in the operator
    // would make the rankings or flags diverge.
    val rows = operators.RelationalExt.q20PartPromo(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 10)
    val promoParts = Tables.part(spark, sfDir)
      .filter(col("p_type").like("PROMO%")).select(col("p_partkey"))
    val want = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp")
        && col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .join(Tables.supplier(spark, sfDir)
          .join(Tables.nation(spark, sfDir).filter(col("n_name") === "NATION_3"),
            col("s_nationkey") === col("n_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .join(promoParts, col("l_partkey") === col("p_partkey"), "left")
      .groupBy(col("s_suppkey"))
      .agg(
        sum(when(col("p_partkey").isNotNull, col("l_quantity")).otherwise(0.0)).as("promo"),
        sum(col("l_quantity")).as("tot"))
      .collect()
      .map(r => r.getAs[Long]("s_suppkey") ->
        (r.getAs[Double]("promo"), r.getAs[Double]("tot"))).toMap
    // top-10 by exact ppm desc, key asc — recomputed independently
    val wantTop = want.toSeq
      .map { case (k, (p, t)) => (k, math.floor(p * 1e6 / t).toLong, p, t) }
      .sortBy { case (k, ppm, _, _) => (-ppm, k) }.take(10)
    assert(rows.map(_.getAs[Long]("supp_key")).toSeq ==
      wantTop.map(_._1), "ranked supplier order must match")
    rows.foreach { r =>
      val (p, t) = want(r.getAs[Long]("supp_key"))
      assert(math.abs(r.getAs[Long]("promo_share_ppm") - p * 1e6 / t) <= 1.0)
      assert(r.getAs[Boolean]("above_18pct") == (p * 100 > t * 18))
    }
  }

  test("retention_cohorts: activity day never precedes cohort day") {
    val rows = operators.EventOps.retentionCohorts(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[String]("activity_day") >= r.getAs[String]("cohort_day"))
      assert(r.getAs[Long]("users") > 0)
    }
  }

  test("window_funnel: step times are ordered and levels consistent") {
    val rows = operators.EventOps.windowFunnel(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val level = r.getAs[Int]("funnel_level")
      val tv = Option(r.getAs[java.lang.Long]("t_view"))
      val tc = Option(r.getAs[java.lang.Long]("t_click"))
      val tp = Option(r.getAs[java.lang.Long]("t_purchase"))
      assert((level >= 1) === tv.isDefined)
      assert((level >= 2) === tc.isDefined)
      assert((level >= 3) === tp.isDefined)
      for (v <- tv; c <- tc) assert(c > v)
      for (c <- tc; p <- tp) { assert(p > c); assert(p <= tv.get + 7L * 24 * 3600 * 1000000L) }
    }
  }

  test("cross_source_overlap: jaccard in (0,1], pairs ordered and unique") {
    val rows = operators.Dedup.crossSourceOverlap(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val pairs = rows.map(r => (r.getAs[String]("source_a"), r.getAs[String]("source_b")))
    assert(pairs.distinct.length === pairs.length)
    rows.foreach { r =>
      assert(r.getAs[String]("source_a") < r.getAs[String]("source_b"))
      val j = r.getAs[Double]("jaccard")
      assert(j > 0 && j <= 1.0)
      assert(r.getAs[Long]("common") > 0)
    }
  }

  test("anomaly_mad: flagged deviations exceed 3x the reported MAD") {
    val rows = operators.EventOps.anomalyMad(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val n = Tables.events(spark, sfDir).count()
    // robust cut: outliers exist but are a minority
    assert(rows.length < n / 2)
    rows.foreach { r =>
      assert(r.getAs[Double]("deviation") > 3 * r.getAs[Double]("mad"))
      assert(r.getAs[Double]("mad") >= 0)
    }
  }

  test("item_cofreq: affinity bounded by cosine, reconciles with raw co-occurrence") {
    val rows = operators.Analytics.itemCofreq(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("part_a") < r.getAs[Long]("part_b"))
      val a = r.getAs[Double]("affinity")
      assert(a > 0 && a <= 1.0 + 1e-12)
    }
    // total pair-occurrences equals sum over orders of C(k,2)
    val want = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .groupBy(col("l_orderkey")).count()
      .collect().map { r => val k = r.getAs[Long]("count"); k * (k - 1) / 2 }.sum
    assert(rows.map(_.getAs[Long]("cofreq")).sum === want)
  }

  test("kcore: peeling agrees with a driver-side reference on the co-purchase graph") {
    // sf0.01, NOT the spec default: the sf0.001 graph is min-degree 5,
    // where peeling is the identity and a broken semi join would pass —
    // at sf0.01 the peel removes ~half the nodes (1880 -> 965), so the
    // per-round removal logic is actually exercised.
    val kcoreDir = "/root/testdata/sf0.01"
    // Independent reference: build the cofreq>=2 graph in plain Scala
    // and peel it the same fixed number of rounds.
    val cofreq = scala.collection.mutable.Map.empty[(Long, Long), Int]
    Tables.lineitem(spark, kcoreDir)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).values.foreach { g =>
        val ps = g.map(_._2).distinct.sorted
        for (i <- ps.indices; j <- (i + 1) until ps.length) {
          val p = (ps(i), ps(j))
          cofreq(p) = cofreq.getOrElse(p, 0) + 1
        }
      }
    // NB: Map#collect with a tuple-valued function would rebuild a MAP
    // (collapsing pairs by their first element) — filter + keys keeps
    // the edge set an actual set of pairs.
    val pairs: Set[(Long, Long)] = cofreq.filter(_._2 >= 2).keys.toSet
    var edges = pairs
    for (_ <- 1 to operators.Analytics.KCoreRounds) {
      val deg = edges.toSeq.flatMap(e => Seq(e._1, e._2))
        .groupBy(identity).map { case (n, xs) => n -> xs.size }
      val keep = deg.collect { case (n, d) if d >= operators.Analytics.KCoreK => n }.toSet
      edges = edges.filter(e => keep(e._1) && keep(e._2))
    }
    val wantDeg = edges.toSeq.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).map { case (n, xs) => n -> xs.size.toLong }
    val rows = operators.Analytics.kcore(spark, kcoreDir).collect()
    val gotCore = rows.filter(_.getAs[Boolean]("in_core"))
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("core_deg")).toMap
    assert(gotCore == wantDeg, "kcore must equal the reference peeling exactly")
    // the population report covers EVERY base-graph node with its
    // initial degree, and peeled nodes carry (in_core=false, core_deg=0)
    val wantDeg0 = pairs.toSeq.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).map { case (n, xs) => n -> xs.size.toLong }
    val gotDeg0 = rows.map(r =>
      r.getAs[Long]("node") -> r.getAs[Long]("initial_deg")).toMap
    assert(gotDeg0 == wantDeg0, "population must be the full base graph")
    rows.filterNot(_.getAs[Boolean]("in_core"))
      .foreach(r => assert(r.getAs[Long]("core_deg") == 0L))
    assert(gotCore.nonEmpty && gotCore.size < gotDeg0.size,
      "the sf0.01 graph must actually peel — an identity run proves nothing")
  }

  /** Independent recomputation of the strong collaboration graph
    * (threshold + hub cap) as an adjacency map — driver-side Scala over
    * the raw sf0.001 lineitem, no Spark operators under test involved.
    */
  private lazy val strongAdjacency: Map[Long, Set[Long]] = {
    val pairCounts = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_suppkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).values.flatMap { g =>
        val ss = g.map(_._2).distinct.sorted
        for (i <- ss.indices; j <- (i + 1) until ss.length) yield (ss(i), ss(j))
      }.groupBy(identity).map { case (k, v) => (k, v.size) }
    // NB: .iterator first — .collect on a Map yielding (Long, Long) tuples
    // would rebuild a Map and silently collapse edges sharing a supp_a
    val strong = pairCounts.iterator.collect {
      case (e, c) if c >= operators.Analytics.StrongEdgeThreshold => e
    }.toSeq
    val adj0 = (strong.map { case (a, b) => (a, b) } ++ strong.map { case (a, b) => (b, a) })
      .groupBy(_._1).map { case (n, es) => (n, es.map(_._2).toSet) }
    val hubs = adj0.collect {
      case (n, nbrs) if nbrs.size > operators.Analytics.MaxWedgeDegree => n
    }.toSet
    adj0.collect { case (n, nbrs) if !hubs(n) => (n, nbrs -- hubs) }
      .filter(_._2.nonEmpty)
  }

  test("node_similarity: exactly matches an independent adjacency recomputation") {
    val rows = operators.Analytics.nodeSimilarity(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val got = rows.map(r => ((r.getAs[Long]("node_a"), r.getAs[Long]("node_b")),
      (r.getAs[Long]("common"), r.getAs[Double]("jaccard")))).toMap
    assert(got.keys.forall { case (a, b) => a < b })
    val adj = strongAdjacency
    val want = (for {
      a <- adj.keys; b <- adj.keys if a < b
      common = (adj(a) intersect adj(b)).size if common >= 1
    } yield ((a, b),
      (common.toLong,
        common.toDouble / (adj(a).size + adj(b).size - common)))).toMap
    assert(got === want)
  }

  test("cluster_kmeans: every vector assigned once, clusters within k") {
    val rows = operators.Clustering.clusterKmeans(spark, sfDir).collect()
    val n = Tables.embeddings(spark, sfDir).count()
    assert(rows.length === n)
    val ids = rows.map(_.getAs[Long]("vec_id"))
    assert(ids.distinct.length === ids.length)
    val clusters = rows.map(_.getAs[Int]("cluster")).distinct
    val k = operators.Clustering.deriveK(
      Tables.embeddings(spark, sfDir).select(col("vec_id"), col("embedding")))
    assert(clusters.forall(c => c >= 0 && c < k))
    assert(clusters.length > 1, "k-means degenerated to one cluster")
    rows.foreach(r => assert(r.getAs[Double]("d2") >= -1e-9))
  }

  test("cluster_label_purity: reconciles exactly with cluster_kmeans + labels") {
    val rows = operators.Clustering.clusterLabelPurity(spark, sfDir).collect()
      .map(r => r.getAs[Int]("cid") -> r).toMap
    val labels = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("label")).collect()
      .map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    val byCell = operators.Clustering.clusterKmeans(spark, sfDir)
      .select(col("vec_id"), col("cluster")).collect()
      .map(r => (r.getAs[Int]("cluster"), labels(r.getAs[Long]("vec_id"))))
      .groupBy(_._1)
    assert(rows.keySet == byCell.keySet)
    byCell.foreach { case (cid, members) =>
      val r = rows(cid)
      val n = members.length.toLong
      val cnts = members.groupBy(_._2).view.mapValues(_.length.toLong).toMap
      assert(r.getAs[Long]("n_vecs") == n)
      assert(r.getAs[Long]("n_labels") == cnts.size.toLong)
      val (mLabel, mCnt) = cnts.toSeq.sortBy { case (l, c) => (-c, l) }.head
      assert(r.getAs[Long]("majority_label") == mLabel)
      assert(r.getAs[Long]("n_majority") == mCnt)
      assert(r.getAs[Long]("purity_ppm") == mCnt * 1000000L / n)
      val sumsq = cnts.values.map(c => c * c).sum
      assert(r.getAs[Long]("gini_impurity_ppm") ==
        1000000L - sumsq * 1000000L / (n * n))
    }
    // non-vacuous on this corpus: purity must actually vary by cell
    assert(rows.values.map(_.getAs[Long]("purity_ppm")).toSet.size > 1)
  }

  test("cluster_outliers: MAD z per cell matches a driver-side recount") {
    val rows = operators.Clustering.clusterOutliers(spark, sfDir).collect()
      .map(r => r.getAs[Long]("vec_id") -> r).toMap
    val assigned = operators.Clustering.clusterKmeans(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("cluster"),
        r.getAs[Double]("d2")))
    assert(rows.keySet == assigned.map(_._1).toSet)
    var flagged = 0
    assigned.groupBy(_._2).foreach { case (_, members) =>
      def lowerMedian(xs: Seq[(Double, Long)]): Double = {
        val s = xs.sortBy(identity)
        s((s.length + 1) / 2 - 1)._1
      }
      val med = lowerMedian(members.map(m => (m._3, m._1)).toSeq)
      val mad = lowerMedian(members.map(m => (math.abs(m._3 - med), m._1)).toSeq)
      members.foreach { case (id, _, d2) =>
        val r = rows(id)
        assert(r.getAs[Long]("d2_x1e6") == math.floor(d2 * 1.0e6 + 0.5).toLong)
        if (mad > 0.0) {
          val z = (d2 - med) / mad
          assert(r.getAs[Long]("z_x1e4") == math.floor(z * 1.0e4).toLong,
            s"z for vec $id")
          assert(r.getAs[Long]("outlier") == (if (z > 3.0) 1L else 0L))
          if (z > 3.0) flagged += 1
        } else assert(r.isNullAt(r.fieldIndex("z_x1e4")))
      }
    }
    assert(flagged > 0, "no outliers at this SF — vacuous flag column")
  }

  test("class_separability: matches an exact-moment driver recompute") {
    val rows = operators.Coreset.classSeparability(spark, sfDir).collect()
      .map(r => r.getAs[Long]("label") -> r).toMap
    val vecs = Tables.embeddings(spark, sfDir)
      .select(col("label").cast("long"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray
        .map(x => math.floor(x.toDouble * 1.0e7 + 0.5).toLong)))
    val dim = vecs.head._2.length
    val nTot = vecs.length.toLong
    val byLabel = vecs.groupBy(_._1)
    assert(rows.keySet == byLabel.keySet)
    val gD = Array.tabulate(dim)(d => vecs.map(v => BigInt(v._2(d))).sum)
    byLabel.foreach { case (l, vs) =>
      val r = rows(l)
      val nL = vs.length.toLong
      assert(r.getAs[Long]("n_vecs") == nL)
      val sLd = Array.tabulate(dim)(d => vs.map(v => BigInt(v._2(d))).sum)
      val qL = vs.flatMap(_._2).map(x => BigInt(x) * x).sum
      val ssqL = sLd.map(s => s * s).sum
      val bnumL = (0 until dim).map { d =>
        val diff = sLd(d) * nTot - gD(d) * nL
        diff * diff
      }.sum
      val wl = qL.toDouble - ssqL.toDouble / nL.toDouble
      val bl = bnumL.toDouble / (nL.toDouble * nTot.toDouble * nTot.toDouble)
      assert(r.getAs[Long]("within_ms_x1e6") ==
        math.floor(wl / nL.toDouble / 1.0e7 / 1.0e7 * 1.0e6).toLong)
      assert(r.getAs[Long]("between_ms_x1e6") ==
        math.floor(bl / nL.toDouble / 1.0e7 / 1.0e7 * 1.0e6).toLong)
      if (wl > 0.0)
        assert(r.getAs[Long]("fisher_ppm") ==
          math.floor(bl / wl * 1.0e6).toLong)
    }
  }

  test("triangle_count: exactly matches an independent adjacency recomputation") {
    val rows = operators.Analytics.triangleCount(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // each triangle credits exactly 3 corners
    val total = rows.map(_.getAs[Long]("triangles")).sum
    assert(total % 3 === 0)
    val adj = strongAdjacency
    // population-with-verdict contract: EVERY capped-graph node reports,
    // zero-triangle nodes included (the sf1 de-vacuation)
    val want = adj.map { case (n, nbrs) =>
      val ns = nbrs.toSeq.sorted
      (n, (nbrs.size.toLong,
        (for (i <- ns.indices; j <- (i + 1) until ns.length
              if adj(ns(i)).contains(ns(j))) yield 1).size.toLong))
    }
    val got = rows.map(r => (r.getAs[Long]("supp_key"),
      (r.getAs[Long]("strong_degree"), r.getAs[Long]("triangles")))).toMap
    assert(got === want)
  }

  test("dropHubs: edges touching an over-cap hub vanish, the rest survive") {
    import spark.implicits._
    // node 1 has degree 4; nodes 2..5 have degree ≤ 2
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L), (2L, 3L))
      .toDF("lo", "hi")
    val capped = operators.Analytics.dropHubs(edges, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped === Set((2L, 3L)))
    // a cap at/above the max degree keeps everything
    val all = operators.Analytics.dropHubs(edges, 4).count()
    assert(all === 5L)
  }

  test("session_stats: totals reconcile with raw events") {
    val stats = operators.EventOps.sessionStats(spark, sfDir).collect()
    assert(stats.nonEmpty)
    val nEvents = Tables.events(spark, sfDir).count()
    assert(stats.map(_.getAs[Long]("n_events")).sum === nEvents)
    stats.foreach { r =>
      assert(r.getAs[Long]("span_us") >= 0)
      // a session's span cannot exceed (n−1) gaps of ≤ 30 min each
      assert(r.getAs[Long]("span_us")
        <= (r.getAs[Long]("n_events") - 1) * 30L * 60 * 1000000)
    }
  }

  test("dataset_interleave: positions are a permutation of 0..n-1 and round-robin") {
    val rows = operators.Sampling.datasetInterleave(spark, sfDir).collect()
    val n = rows.length
    val pos = rows.map(_.getAs[Long]("position")).sorted
    assert(pos.head === 0L)
    // positions are collision-free and round-robin: position mod n_sources
    // identifies the source
    assert(pos.distinct.length === n)
    val nSrc = rows.map(_.getAs[String]("source")).distinct.length
    val bySrc = rows.groupBy(_.getAs[String]("source"))
    bySrc.values.foreach { rs =>
      val mods = rs.map(r => r.getAs[Long]("position") % nSrc).distinct
      assert(mods.length === 1)
    }
  }

  test("cluster_kmeans: iterations reduce total within-cluster distance") {
    // Lloyd's algorithm is monotone: the final assignment's total d2 must
    // not exceed the init-assignment total (iteration 0 = the operator's
    // own seed centroids + assignment, reused rather than re-implemented).
    val e = Tables.embeddings(spark, sfDir).select(col("vec_id"), col("embedding"))
    val init = operators.Clustering.assign(e,
      operators.Clustering.seedCentroids(e, operators.Clustering.deriveK(e)))
      .agg(sum(col("d2"))).collect()(0).getDouble(0)
    val fin = operators.Clustering.clusterKmeans(spark, sfDir)
      .agg(sum(col("d2"))).collect()(0).getDouble(0)
    assert(fin <= init + 1e-6)
  }
}
