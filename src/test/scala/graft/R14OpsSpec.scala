package graft

import org.apache.spark.sql.functions._

/** Invariants for the round-14 additions: sampled betweenness
  * centrality and the residual IVF-PQ family. Value-level parity with
  * DuckDB is the driver gate's job; these pin the algorithmic
  * guarantees the oracles can't see — here, that the distributed
  * fixed-point Brandes accumulation equals an independent driver-side
  * implementation exactly (same truncation, same seeds, same caps).
  */
class R14OpsSpec extends SparkSpec {

  private val Scale = 1000000000L

  test("betweenness_sampled: equals an exact driver-side Brandes " +
      "(depth-4, 1e9 fixed point) on the strong hub-capped graph") {
    // sf0.1, NOT the spec default: the sf0.001/sf0.01 strong graphs are
    // near-cliques where every shortest path is one hop and every
    // dependency is 0 — the backward pass would be unexercised and the
    // comparison would prove nothing (the kcore-spec rule). At sf0.1
    // all 20 reported nodes carry nonzero brokerage mass.
    val betDir = "/root/testdata/sf0.1"
    // Independent reference: build the strong graph in plain Scala from
    // raw lineitem, peel hubs, pick the same deterministic seeds, run
    // bounded Brandes with the identical truncating integer arithmetic.
    val pairCounts = Tables.lineitem(spark, betDir)
      .select(col("l_orderkey"), col("l_suppkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).values.flatMap { g =>
        val ss = g.map(_._2).distinct.sorted
        for (i <- ss.indices; j <- (i + 1) until ss.length)
          yield (ss(i), ss(j))
      }.groupBy(identity).map { case (p, xs) => p -> xs.size.toLong }
      .filter(_._2 >= operators.Analytics.StrongEdgeThreshold)
    val deg = pairCounts.keys.toSeq.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).map { case (n, xs) => n -> xs.size }
    val hubs = deg.collect {
      case (n, d) if d > operators.Analytics.MaxWedgeDegree => n
    }.toSet
    val capped = pairCounts.filter { case ((a, b), _) =>
      !hubs(a) && !hubs(b)
    }
    val adj = scala.collection.mutable.Map
      .empty[Long, List[(Long, Long)]].withDefaultValue(Nil)
    capped.foreach { case ((a, b), c) =>
      adj(a) = (b, c) :: adj(a); adj(b) = (a, c) :: adj(b)
    }
    val wdeg = adj.map { case (n, ns) => n -> ns.map(_._2).sum }
    val seeds = wdeg.toSeq.sortBy { case (n, w) => (-w, n) }.take(5).map(_._1)
    val bc = scala.collection.mutable.Map.empty[Long, BigInt]
      .withDefaultValue(BigInt(0))
    val nSeeds = scala.collection.mutable.Map.empty[Long, Int]
      .withDefaultValue(0)
    for (s <- seeds) {
      val dist = scala.collection.mutable.Map(s -> 0)
      val sigma = scala.collection.mutable.Map(s -> BigInt(1))
      var frontier = Set(s)
      for (d <- 1 to 4) {
        val next = scala.collection.mutable.Map.empty[Long, BigInt]
          .withDefaultValue(BigInt(0))
        frontier.foreach { v =>
          adj(v).foreach { case (w, _) =>
            if (!dist.contains(w)) next(w) += sigma(v)
          }
        }
        next.keys.foreach(dist(_) = d)
        next.foreach { case (w, sg) => sigma(w) = sg }
        frontier = next.keys.toSet
      }
      val delta = scala.collection.mutable.Map.empty[Long, BigInt]
        .withDefaultValue(BigInt(0))
      for (d <- 3 to 1 by -1) {
        dist.collect { case (v, dd) if dd == d => v }.foreach { v =>
          var acc = BigInt(0)
          adj(v).foreach { case (w, _) =>
            if (dist.get(w).contains(d + 1))
              acc += (sigma(v) * (BigInt(Scale) + delta(w))) / sigma(w)
          }
          delta(v) = acc
        }
      }
      dist.foreach { case (v, dd) =>
        if (dd >= 1) { bc(v) += delta(v); nSeeds(v) += 1 }
      }
    }
    val want = bc.toSeq
      .map { case (n, b) => (n, b.toLong, nSeeds(n).toLong) }
      .sortBy { case (n, b, _) => (-b, n) }.take(20)
    val got = operators.GraphExt.betweennessSampled(spark, betDir)
      .collect().map(r => (r.getAs[Long]("supp_key"),
        r.getAs[Long]("bc_x1e9"), r.getAs[Long]("n_seeds"))).toSeq
    assert(got == want,
      s"Brandes mismatch:\n got=${got.take(5)}\nwant=${want.take(5)}")
    // non-vacuity of the invariant itself: brokerage mass must exist
    // (a clique-only graph would make every delta 0 and the comparison
    // would prove nothing about the backward pass)
    assert(want.exists(_._2 > 0),
      "no nonzero dependency at this SF — backward pass unexercised")
  }

  test("closeness_sampled: equals a driver-side seeded harmonic-" +
      "closeness BFS, and distance-1 mass dominates") {
    // Same independent substrate as the Brandes test (sf0.1 — smaller
    // SFs are near-cliques where every distance is 1 and the multi-hop
    // harmonic arithmetic would be unexercised).
    val dir = "/root/testdata/sf0.1"
    val pairCounts = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_suppkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).values.flatMap { g =>
        val ss = g.map(_._2).distinct.sorted
        for (i <- ss.indices; j <- (i + 1) until ss.length)
          yield (ss(i), ss(j))
      }.groupBy(identity).map { case (p, xs) => p -> xs.size.toLong }
      .filter(_._2 >= operators.Analytics.StrongEdgeThreshold)
    val deg = pairCounts.keys.toSeq.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).map { case (n, xs) => n -> xs.size }
    val hubs = deg.collect {
      case (n, d) if d > operators.Analytics.MaxWedgeDegree => n
    }.toSet
    val adj = scala.collection.mutable.Map
      .empty[Long, List[(Long, Long)]].withDefaultValue(Nil)
    pairCounts.filter { case ((a, b), _) => !hubs(a) && !hubs(b) }
      .foreach { case ((a, b), c) =>
        adj(a) = (b, c) :: adj(a); adj(b) = (a, c) :: adj(b)
      }
    val wdeg = adj.map { case (n, ns) => n -> ns.map(_._2).sum }
    val seeds = wdeg.toSeq.sortBy { case (n, w) => (-w, n) }.take(5).map(_._1)
    val acc = scala.collection.mutable.Map
      .empty[Long, (Long, Long, Long)].withDefaultValue((0L, 0L, 0L))
    for (s <- seeds) {
      val dist = scala.collection.mutable.Map(s -> 0)
      var frontier = Set(s)
      for (d <- 1 to 4) {
        val next = frontier.flatMap(adj(_).map(_._1))
          .filterNot(dist.contains)
        next.foreach(dist(_) = d)
        frontier = next
      }
      dist.foreach { case (v, dd) =>
        if (dd >= 1) {
          val (n, sd, h) = acc(v)
          acc(v) = (n + 1, sd + dd, h + 1000000L / dd)
        }
      }
    }
    val want = acc.toSeq.map { case (n, (ns, sd, h)) => (n, ns, sd, h) }
      .sortBy { case (n, _, _, h) => (-h, n) }.take(20)
    val got = operators.GraphExt.closenessSampled(spark, dir)
      .collect().map(r => (r.getAs[Long]("supp_key"),
        r.getAs[Long]("n_seeds"), r.getAs[Long]("sum_dist"),
        r.getAs[Long]("harmonic_x1e6"))).toSeq
    assert(got == want,
      s"closeness mismatch:\n got=${got.take(5)}\nwant=${want.take(5)}")
    // multi-hop arithmetic exercised: some reported node sits past hop 1
    assert(want.exists { case (_, ns, sd, _) => sd > ns },
      "every reported node at distance 1 — multi-hop path unexercised")
  }

  test("url_canonical_dedup: equals a driver-side recomputation of the " +
      "injection formula and genuinely collapses raw variants") {
    val ids = Tables.documents(spark, sfDir).select(col("doc_id"))
      .collect().map(_.getLong(0))
    def raw(id: Long): String =
      (if (id % 2 == 0) "https" else "http") + "://" +
        (if (id % 3 == 0) "Ex.IO" else "ex.io") + "/p/" + (id % 50) +
        (if (id % 4 == 0) "/" else "") +
        (if (id % 2 == 0) s"?utm_source=s${id % 5}" else "") +
        (if (id % 7 == 0) "#sec" else "")
    val want = ids.groupBy(_ % 50).toSeq.map { case (g, ds) =>
      (s"ex.io/p/$g", ds.length.toLong,
        ds.map(raw).distinct.length.toLong, ds.min)
    }.sortBy { case (c, n, _, _) => (-n, c) }.take(20)
    val got = operators.CorpusExt.urlCanonicalDedup(spark, sfDir)
      .collect().map(r => (r.getAs[String]("canonical_url"),
        r.getAs[Long]("n_docs"), r.getAs[Long]("n_raw_forms"),
        r.getAs[Long]("keep_doc_id"))).toSeq
    assert(got == want,
      s"canonical-dedup mismatch:\n got=${got.take(3)}\nwant=${want.take(3)}")
    // the canonicalizer must be doing real work: multiple raw forms
    // collapse into one target (scheme x case x slash x utm x fragment)
    assert(got.exists(_._3 >= 4),
      "no group collapses >= 4 raw variants — canonicalization vacuous")
    got.foreach { case (c, _, _, _) =>
      assert(c.matches("^ex\\.io/p/[0-9]+$"), s"non-canonical output: $c")
    }
  }

  test("betweenness_sampled: seeds never appear and n_seeds is bounded") {
    val rows = operators.GraphExt.betweennessSampled(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val seedSet = operators.GraphExt.strongSeededGraph(spark, sfDir)._2
      .collect().map(_.getAs[Long]("seed")).toSet
    rows.foreach { r =>
      assert(!seedSet.contains(r.getAs[Long]("supp_key")),
        s"seed ${r.getAs[Long]("supp_key")} leaked into the non-seed output")
      assert(r.getAs[Long]("bc_x1e9") >= 0L)
      val ns = r.getAs[Long]("n_seeds")
      assert(ns >= 1L && ns <= 5L)
    }
    val bcs = rows.map(_.getAs[Long]("bc_x1e9"))
    assert(bcs.zip(bcs.tail).forall { case (a, b) => a >= b },
      "output must be ordered by dependency mass descending")
  }
}
