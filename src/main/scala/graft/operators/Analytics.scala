package graft.operators

import graft.{QueryDef, Tables}
import graft.functions.Exact
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph / analytical views (§2.C) — the reference's Neo4j analytics
  * (`create_collaboration_graph.cql`, `docs/neo4j_analytical_ideas.md`)
  * re-expressed as relational co-occurrence / degree / trend aggregations.
  * Graph MERGE-with-counter semantics become a single self-join + groupBy:
  * embarrassingly parallel, one shuffle on the co-occurrence key, versus
  * the reference's per-row Cypher MERGE (driver-side, serial).
  */
object Analytics {

  /** All unordered pairs (a < b) from a SORTED array column, generated
    * locally — the C(k,2) per-group expansion shared by collabPairs and
    * itemCofreq. 1-based `slice(arr, i + 2, …)` pairs element i with
    * every LATER element (element_at is 1-based in SQL).
    */
  private def localPairs(arrCol: String, aName: String, bName: String) =
    explode(expr(
      s"""flatten(transform($arrCol, (x, i) ->
         |  transform(slice($arrCol, i + 2, size($arrCol)), y ->
         |    struct(x AS $aName, y AS $bName))))""".stripMargin))

  /** Collaboration graph: pairs of suppliers co-occurring in the same
    * order, with collaboration counts — create_collaboration_graph.cql:1-6
    * (authors co-authoring a publication, COLLABORATED_WITH.count).
    *
    * Scale: ONE shuffle on orderkey collects each order's distinct
    * supplier set (collect_set partial-aggregates map-side), pairs are
    * generated locally from the sorted set (C(k,2) per order, k small),
    * then one shuffle counts pairs. No self-join: the older
    * distinct + self-equi-join formulation shuffled the edge list twice
    * more and paid a sort-merge join for an expansion that is purely
    * per-order-local.
    */
  def collabPairs(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_set(col("l_suppkey"))).as("ss"))
      .select(localPairs("ss", "supp_a", "supp_b").as("p"))
      .groupBy(col("p.supp_a").as("supp_a"), col("p.supp_b").as("supp_b"))
      .agg(count(lit(1)).as("collab_count"))

  val collabPairsOracle: String = """
    WITH edges AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem)
    SELECT a.l_suppkey AS supp_a, b.l_suppkey AS supp_b, COUNT(*) AS collab_count
    FROM edges a JOIN edges b
      ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
    GROUP BY 1, 2"""

  /** Most influential entities: top-k most-referenced parts — "Most
    * Influential Publications" (neo4j_analytical_ideas.md §2). Total order
    * with unique tiebreak for determinism under ties.
    */
  def topInfluential(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_partkey").as("part_key"))
      .agg(count(lit(1)).as("reference_count"))
      .orderBy(col("reference_count").desc, col("part_key").asc)
      .limit(10)

  val topInfluentialOracle: String = """
    SELECT l_partkey AS part_key, COUNT(*) AS reference_count
    FROM lineitem GROUP BY 1
    ORDER BY reference_count DESC, part_key ASC LIMIT 10"""

  /** Trends over time: monthly volume + revenue — "Publication Trends
    * Over Time" (neo4j_analytical_ideas.md §2).
    */
  def trendsOverTime(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"))
      .agg(
        count(lit(1)).as("n_orders"),
        Exact.dsum(col("o_totalprice")).as("total_value"))

  val trendsOverTimeOracle: String = s"""
    SELECT STRFTIME(o_orderdate, '%Y-%m') AS month,
      COUNT(*) AS n_orders,
      ${Exact.sqlDsum("o_totalprice")} AS total_value
    FROM orders GROUP BY 1"""

  /** Most prolific entities: top-k customers by order count — "Most
    * Prolific Authors" (neo4j_analytical_ideas.md §3).
    */
  def prolificAuthors(spark: SparkSession, dir: String): DataFrame = {
    val counts = Tables.orders(spark, dir)
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_orders"))
      .orderBy(col("n_orders").desc, col("o_custkey").asc)
      .limit(20)
    counts.join(Tables.dimHint(Tables.customer(spark, dir)),
        col("o_custkey") === col("c_custkey"))
      .select(
        col("o_custkey").as("customer_key"),
        col("c_name").as("name"),
        col("n_orders"))
  }

  val prolificAuthorsOracle: String = """
    WITH top AS (
      SELECT o_custkey, COUNT(*) AS n_orders FROM orders GROUP BY 1
      ORDER BY n_orders DESC, o_custkey ASC LIMIT 20)
    SELECT o_custkey AS customer_key, c_name AS name, n_orders
    FROM top JOIN customer ON o_custkey = c_custkey"""

  /** Topic popularity: usage-weighted category counts — "Popular Research
    * Topics" (neo4j_analytical_ideas.md §4). Part dim is SF-proportional,
    * so the broadcast rides the [[Tables.dimHint]] size guard.
    */
  def topicPopularity(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .join(Tables.dimHint(Tables.part(spark, dir)), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_type").as("topic"))
      .agg(count(lit(1)).as("popularity"))

  val topicPopularityOracle: String = """
    SELECT p_type AS topic, COUNT(*) AS popularity
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY 1"""

  /** Topic evolution: category × year counts — "Topic Evolution Over
    * Time" (neo4j_analytical_ideas.md §4).
    */
  def topicEvolution(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .join(Tables.dimHint(Tables.part(spark, dir)), col("l_partkey") === col("p_partkey"))
      .groupBy(
        col("p_type").as("topic"),
        year(col("l_shipdate")).as("ship_year"))
      .agg(count(lit(1)).as("n_shipments"))

  val topicEvolutionOracle: String = """
    SELECT p_type AS topic, CAST(YEAR(l_shipdate) AS INTEGER) AS ship_year,
      COUNT(*) AS n_shipments
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY 1, 2"""

  /** Citation-network degree: distinct neighbor count per node in the
    * customer→supplier bipartite graph — "Citation Networks" degree
    * analysis (neo4j_analytical_ideas.md §5).
    */
  def graphDegree(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey").as("customer_key"))
      .agg(countDistinct(col("l_suppkey")).as("degree"))

  val graphDegreeOracle: String = """
    SELECT o_custkey AS customer_key, COUNT(DISTINCT l_suppkey) AS degree
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY 1"""

  /** Author specializations — neo4j_analytical_ideas.md §3: each author's
    * dominant general_category with its share of their output. Author =
    * supplier, category = part type; dominant category by count with a
    * deterministic tiebreak, share from the same single aggregation (two
    * windows over the SAME partition key — one shuffle).
    */
  def authorSpecialization(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = Tables.lineitem(spark, dir)
      .join(Tables.dimHint(Tables.part(spark, dir)), col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_suppkey").as("author_key"), col("p_type").as("category"))
      .agg(count(lit(1)).as("n_pubs"))
    val total = Window.partitionBy(col("author_key"))
    val rank = Window.partitionBy(col("author_key"))
      .orderBy(col("n_pubs").desc, col("category").asc)
    counts
      .withColumn("share",
        col("n_pubs").cast("double") / sum(col("n_pubs")).over(total).cast("double"))
      .withColumn("rk", row_number().over(rank))
      .filter(col("rk") === 1)
      .select(col("author_key"), col("category").as("specialization"),
        col("n_pubs"), col("share"))
  }

  val authorSpecializationOracle: String = """
    SELECT author_key, category AS specialization, n_pubs, share FROM (
      SELECT author_key, category, n_pubs,
        CAST(n_pubs AS DOUBLE)
          / CAST(SUM(n_pubs) OVER (PARTITION BY author_key) AS DOUBLE) AS share,
        ROW_NUMBER() OVER (PARTITION BY author_key
          ORDER BY n_pubs DESC, category ASC) AS rk
      FROM (
        SELECT l_suppkey AS author_key, p_type AS category, COUNT(*) AS n_pubs
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY 1, 2))
    WHERE rk = 1"""

  /** Institutional collaboration — neo4j_analytical_ideas.md §1: the
    * collaboration graph rolled up to institutions (nations standing in
    * for affiliations), unordered institution pairs, weights summed.
    * Supplier→nation dims broadcast; the only shuffle is the final
    * institution-pair groupBy.
    */
  def institutionCollab(spark: SparkSession, dir: String): DataFrame = {
    def instOf(side: String) =
      Tables.supplier(spark, dir)
        .join(broadcast(Tables.nation(spark, dir)),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey").as(s"supp_$side"), col("n_name").as(s"inst_$side"))
    collabPairs(spark, dir)
      .join(Tables.dimHint(instOf("a")), Seq("supp_a"))
      .join(Tables.dimHint(instOf("b")), Seq("supp_b"))
      .groupBy(
        least(col("inst_a"), col("inst_b")).as("institution_a"),
        greatest(col("inst_a"), col("inst_b")).as("institution_b"))
      .agg(
        sum(col("collab_count")).as("collab_count"),
        count(lit(1)).as("n_author_pairs"))
  }

  val institutionCollabOracle: String = """
    WITH edges AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
    pairs AS (
      SELECT a.l_suppkey AS sa, b.l_suppkey AS sb, COUNT(*) AS c
      FROM edges a JOIN edges b
        ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
      GROUP BY 1, 2),
    named AS (
      SELECT LEAST(na.n_name, nb.n_name) AS institution_a,
        GREATEST(na.n_name, nb.n_name) AS institution_b, c
      FROM pairs
      JOIN supplier s1 ON sa = s1.s_suppkey
      JOIN nation na ON s1.s_nationkey = na.n_nationkey
      JOIN supplier s2 ON sb = s2.s_suppkey
      JOIN nation nb ON s2.s_nationkey = nb.n_nationkey)
    SELECT institution_a, institution_b,
      CAST(SUM(c) AS BIGINT) AS collab_count, COUNT(*) AS n_author_pairs
    FROM named GROUP BY 1, 2"""

  /** Weighted PageRank over the supplier collaboration graph — the
    * principled version of "most influential" (neo4j_analytical_ideas.md
    * §2/§5): influence flows through collaboration strength rather than
    * raw degree.
    *
    * Same iteration discipline as dedup_components: tiny graph state,
    * repartitioned small, lineage truncated every other round. The
    * normalized edge weights (w / out-weight) are loop-INVARIANT, so they
    * are joined once before the loop, not once per iteration.
    *
    * Determinism (this is oracle-hash-checked): edge weights are
    * integer-valued doubles (exact sums in any order); per-node inflow is
    * summed in 1e-14 fixed point — each contribution quantized to a
    * BIGINT via floor(x·1e14 + 0.5), summed exactly (integer addition is
    * associative ⇒ partition-order independent), divided back. Everything
    * else is single IEEE ops, so every iteration is bit-identical to the
    * DuckDB oracle, which unrolls the same 10 iterations as CTEs with the
    * same fixed-point sums. Output is quantized to 8dp the same way.
    */
  /** Per-round GRAPH STATE (rank vectors, keep-sets, degree/frequency
    * tables, hub sets) is one row per NODE while the edge list is one
    * row per PAIR — broadcasting it keeps every iteration
    * edge-shuffle-free. Bound and escape hatch: [[Tables.stateHint]]
    * (~10⁸-node ceiling; `spark.graft.broadcastState=false` flips each
    * round to a shuffle semi-join with the edge side staying on its
    * [[graft.functions.Iterate.statePartitions]] layout).
    */
  private def stateHint(df: DataFrame): DataFrame = Tables.stateHint(df)

  /** Shared prelude for the rank family ([[pagerank]], [[pprSeeds]]):
    * the symmetrized, weight-normalized collaboration graph. Returns
    * (norm edges src/dst/nw, node set, per-node out-weight) — the first
    * two checkpointed, since both loops re-read them every round.
    */
  private def normalizedCollabGraph(
      spark: SparkSession, dir: String): (DataFrame, DataFrame, DataFrame) = {
    val pairs = collabPairs(spark, dir)
      .repartition(graft.functions.Iterate.statePartitions(spark))
      .transform(graft.functions.Iterate.checkpoint)
    val edges = pairs.select(col("supp_a").as("src"), col("supp_b").as("dst"),
        col("collab_count").cast("double").as("w"))
      .unionByName(pairs.select(col("supp_b").as("src"), col("supp_a").as("dst"),
        col("collab_count").cast("double").as("w")))
    val outW = edges.groupBy(col("src")).agg(sum(col("w")).as("out_w"))
    val norm = edges.join(outW, Seq("src"))
      .select(col("src"), col("dst"), (col("w") / col("out_w")).as("nw"))
      .transform(graft.functions.Iterate.checkpoint)
    val nodes = norm.select(col("src").as("node")).distinct()
      .transform(graft.functions.Iterate.checkpoint)
    (norm, nodes, outW)
  }

  def pagerank(spark: SparkSession, dir: String): DataFrame = {
    val d = 0.85
    val (norm, nodes, _) = normalizedCollabGraph(spark, dir)
    val n = nodes.count().toDouble
    var pr = nodes.withColumn("pr", lit(1.0 / n)).transform(graft.functions.Iterate.checkpoint)
    // The rank vector is one row per NODE (the supplier dimension) while
    // the edge list is one row per collaboration pair — the state is
    // orders of magnitude smaller than the edges at any scale, so each
    // iteration broadcasts the vector and streams the edges: no edge
    // shuffle per round, only the ~|nodes|-row inflow groupBy moves.
    // (broadcast viability bound + the shuffle fallback: [[stateHint]])
    for (i <- 1 to 10) {
      val contrib = norm
        .join(stateHint(pr.withColumnRenamed("node", "src")), Seq("src"))
        .select(col("dst").as("node"),
          floor(col("pr") * col("nw") * lit(1.0e14) + lit(0.5))
            .cast("bigint").as("c"))
        .groupBy(col("node"))
        .agg((sum(col("c")).cast("double") / lit(1.0e14)).as("inflow"))
      pr = nodes
        .join(stateHint(contrib), Seq("node"), "left")
        .select(col("node"),
          (lit(0.15 / n) + lit(d) * coalesce(col("inflow"), lit(0.0))).as("pr"))
      // Truncate lineage every other round, but NOT after the final
      // iteration: a trailing checkpoint would materialize `pr` to an RDD
      // and the returned plan would be a bare `Scan ExistingRDD` — hiding
      // the iteration joins from plan inspection (PlanSpec's broadcast
      // gate) while buying nothing, since the result is consumed once.
      // Cadence 2 measured best at sf0.1 (5.5s vs 5.8s every-round vs
      // 6.1s every-third): fewer checkpoints deepen the per-job plan
      // faster than they save job-submission overhead.
      if (i % 2 == 0 && i < 10) pr = pr.transform(graft.functions.Iterate.checkpoint)
    }
    pr.select(col("node").as("supp_key"),
        (floor(col("pr") * lit(1.0e8) + lit(0.5)).cast("double") / lit(1.0e8))
          .as("pagerank"))
      .orderBy(col("pagerank").desc, col("supp_key").asc)
      .limit(20)
  }

  /** Shared oracle CTE block for the rank family — the normalized
    * collaboration graph, mirroring [[normalizedCollabGraph]].
    */
  private val collabGraphCtes: String = """pairs AS (
      WITH edges0 AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem)
      SELECT a.l_suppkey AS supp_a, b.l_suppkey AS supp_b, COUNT(*) AS collab_count
      FROM edges0 a JOIN edges0 b
        ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
      GROUP BY 1, 2),
    edges AS (
      SELECT supp_a AS src, supp_b AS dst, CAST(collab_count AS DOUBLE) AS w FROM pairs
      UNION ALL
      SELECT supp_b, supp_a, CAST(collab_count AS DOUBLE) FROM pairs),
    outw AS (SELECT src, SUM(w) AS out_w FROM edges GROUP BY 1),
    norm AS (
      SELECT e.src, e.dst, e.w / o.out_w AS nw
      FROM edges e JOIN outw o ON e.src = o.src),
    nodes AS (SELECT DISTINCT src AS node FROM norm)"""

  val pagerankOracle: String = {
    val iters = (1 to 10).map { i =>
      s"""pr$i AS (
      SELECT nd.node,
        CAST(0.15 AS DOUBLE) / nn.n
          + CAST(0.85 AS DOUBLE) * COALESCE(s.inflow, CAST(0 AS DOUBLE)) AS pr
      FROM nodes nd CROSS JOIN nn
      LEFT JOIN (
        SELECT dst AS node,
          CAST(SUM(CAST(FLOOR(pr * nw * 1.0e14 + 0.5) AS BIGINT)) AS DOUBLE)
            / 1.0e14 AS inflow
        FROM norm JOIN pr${i - 1} p ON norm.src = p.node
        GROUP BY 1) s ON nd.node = s.node)"""
    }.mkString(",\n    ")
    s"""
    WITH $collabGraphCtes,
    nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
    pr0 AS (SELECT node, CAST(1.0 AS DOUBLE) / nn.n AS pr FROM nodes CROSS JOIN nn),
    $iters
    SELECT node AS supp_key,
      CAST(FLOOR(pr * 1.0e8 + 0.5) AS DOUBLE) / 1.0e8 AS pagerank
    FROM pr10
    ORDER BY pagerank DESC, supp_key ASC LIMIT 20"""
  }

  /** Personalized PageRank from quality seeds — the graph-expansion
    * curation idiom (seed a trusted set, let rank mass propagate, keep
    * the high-mass neighborhood; the WebText/RefinedWeb "quality
    * radiates from curated nodes" shape re-expressed on the supplier
    * collaboration graph). Same loop skeleton as [[pagerank]] — state
    * broadcast per round, edges never reshuffled, fixed-point inflow —
    * but the teleport vector is concentrated on the top-[[PprSeedCount]]
    * nodes by total collaboration weight (deterministic: weight DESC,
    * key ASC) instead of uniform, and the initial mass sits entirely on
    * the seeds. Nodes outside the seeds' reach legitimately hold rank 0.
    */
  private val PprSeedCount = 5

  def pprSeeds(spark: SparkSession, dir: String): DataFrame = {
    val (norm, nodes, outW) = normalizedCollabGraph(spark, dir)
    val seeds = outW
      .orderBy(col("out_w").desc, col("src").asc).limit(PprSeedCount)
      .select(col("src").as("node"), lit(1.0 / PprSeedCount).as("seed"))
    // The teleport vector is loop-INVARIANT: materialize (node, seed)
    // once and read it per round, instead of re-broadcasting the 5-row
    // seed frame inside every iteration (10 BroadcastExchange builds
    // whose payload never changes — guide §2.4's loop-invariant rule,
    // the same reason norm joins outW before the loop). coalesce is
    // folded in here, so the per-round expression 0.15·seed is
    // bit-identical to the old 0.15·coalesce(seed, 0).
    val nodesSeed = nodes.join(broadcast(seeds), Seq("node"), "left")
      .select(col("node"), coalesce(col("seed"), lit(0.0)).as("seed"))
      .transform(graft.functions.Iterate.checkpoint)
    var pr = nodesSeed.select(col("node"), col("seed").as("pr"))
    for (i <- 1 to 10) {
      val contrib = norm
        .join(stateHint(pr.withColumnRenamed("node", "src")), Seq("src"))
        .select(col("dst").as("node"),
          floor(col("pr") * col("nw") * lit(1.0e14) + lit(0.5))
            .cast("bigint").as("c"))
        .groupBy(col("node"))
        .agg((sum(col("c")).cast("double") / lit(1.0e14)).as("inflow"))
      pr = nodesSeed
        .join(stateHint(contrib), Seq("node"), "left")
        .select(col("node"),
          (lit(0.15) * col("seed")
            + lit(0.85) * coalesce(col("inflow"), lit(0.0))).as("pr"))
      // pagerank's cadence-2 checkpoint rule, same rationale.
      if (i % 2 == 0 && i < 10) pr = pr.transform(graft.functions.Iterate.checkpoint)
    }
    pr.select(col("node").as("supp_key"),
        (floor(col("pr") * lit(1.0e8) + lit(0.5)).cast("double") / lit(1.0e8))
          .as("ppr"))
      .orderBy(col("ppr").desc, col("supp_key").asc)
      .limit(20)
  }

  val pprSeedsOracle: String = {
    val iters = (1 to 10).map { i =>
      s"""pr$i AS (
      SELECT nd.node,
        CAST(0.15 AS DOUBLE) * COALESCE(sd.seed, CAST(0 AS DOUBLE))
          + CAST(0.85 AS DOUBLE) * COALESCE(s.inflow, CAST(0 AS DOUBLE)) AS pr
      FROM nodes nd
      LEFT JOIN seeds sd ON nd.node = sd.node
      LEFT JOIN (
        SELECT dst AS node,
          CAST(SUM(CAST(FLOOR(pr * nw * 1.0e14 + 0.5) AS BIGINT)) AS DOUBLE)
            / 1.0e14 AS inflow
        FROM norm JOIN pr${i - 1} p ON norm.src = p.node
        GROUP BY 1) s ON nd.node = s.node)"""
    }.mkString(",\n    ")
    s"""
    WITH $collabGraphCtes,
    seeds AS (
      SELECT src AS node, CAST(1.0 AS DOUBLE) / $PprSeedCount AS seed
      FROM outw ORDER BY out_w DESC, src ASC LIMIT $PprSeedCount),
    pr0 AS (
      SELECT nd.node, COALESCE(sd.seed, CAST(0 AS DOUBLE)) AS pr
      FROM nodes nd LEFT JOIN seeds sd ON nd.node = sd.node),
    $iters
    SELECT node AS supp_key,
      CAST(FLOOR(pr * 1.0e8 + 0.5) AS DOUBLE) / 1.0e8 AS ppr
    FROM pr10
    ORDER BY ppr DESC, supp_key ASC LIMIT 20"""
  }

  /** Edge-weight cut defining the STRONG collaboration graph — the scale
    * knob bounding wedge volume for triangle_count / node_similarity
    * (raise it and Σ C(deg,2) shrinks). Interpolated into the oracles so
    * Spark and DuckDB can never disagree on the graph.
    */
  private[graft] val StrongEdgeThreshold = 5

  /** Degree cap for the wedge-join family: nodes whose STRONG-graph degree
    * exceeds this are excluded before wedge generation. Wedge volume is
    * Σ C(deg, 2), so one un-capped hub (deg 10⁶) alone creates a 5·10¹¹-row
    * straggler task at corpus scale; with the cap every node contributes
    * ≤ C(cap, 2) ≈ 8k wedges. Part of the declared graph semantics —
    * interpolated into both oracles, so Spark and DuckDB always agree on
    * which nodes are dropped. 128 keeps every node at the test SFs (the
    * sf0.01 strong graph is ~100 near-fully-connected suppliers).
    */
  private[graft] val MaxWedgeDegree = 128

  /** Drop every edge touching a node with degree > cap. The hub set is
    * tiny by construction (heavy hitters), so both classification joins
    * broadcast — the edge list is never shuffled just to be capped.
    */
  private[graft] def dropHubs(edges: DataFrame, cap: Int): DataFrame = {
    // hub set = node-sized graph state: stateHint bound applies.
    val hubs = stateHint(
      edges.select(explode(array(col("lo"), col("hi"))).as("node"))
        .groupBy(col("node")).agg(count(lit(1)).as("deg"))
        .filter(col("deg") > cap)
        .select(col("node")))
    edges.join(hubs, col("lo") === col("node"), "left_anti")
      .join(hubs, col("hi") === col("node"), "left_anti")
  }

  /** Strong-graph edges as (lo < hi) pairs, hub-capped
    * ([[MaxWedgeDegree]]) and persisted (both graph operators read the
    * edge list from several branches of one job). The PRE-cap edges are
    * persisted too: the hub set is a broadcast subtree over the same
    * edges the anti-joins probe, and without the persist the whole
    * collabPairs pipeline (the expensive wedge groupBy) would run once
    * for the broadcast and again for the probe side. The raw cache is
    * only needed during that single capping pass, so the capped frame is
    * materialized eagerly (count) and the raw edges unpersisted — the
    * two caches are near-identical in size and keeping both would double
    * the strong graph's cached footprint for the whole downstream job.
    */
  private def strongEdges(spark: SparkSession, dir: String): DataFrame = {
    val raw = collabPairs(spark, dir)
      .filter(col("collab_count") >= StrongEdgeThreshold)
      .select(col("supp_a").as("lo"), col("supp_b").as("hi"))
      .transform(graft.functions.PlanGuard.persist(_))
    val capped = dropHubs(raw, MaxWedgeDegree).transform(graft.functions.PlanGuard.persist(_))
    capped.count()
    raw.unpersist()
    capped
  }

  /** Shared oracle CTE text for [[strongEdges]] (relation: edges(lo, hi)). */
  private val sqlStrongEdges: String = s"""
      WITH e0 AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
      p0 AS (
        SELECT a.l_suppkey AS supp_a, b.l_suppkey AS supp_b, COUNT(*) AS c
        FROM e0 a JOIN e0 b
          ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
        GROUP BY 1, 2),
      s AS (SELECT supp_a AS lo, supp_b AS hi FROM p0 WHERE c >= $StrongEdgeThreshold),
      sdeg AS (
        SELECT node, COUNT(*) AS deg
        FROM (SELECT lo AS node FROM s UNION ALL SELECT hi FROM s)
        GROUP BY 1),
      hubs AS (SELECT node FROM sdeg WHERE deg > $MaxWedgeDegree)
      SELECT lo, hi FROM s
      WHERE lo NOT IN (SELECT node FROM hubs)
        AND hi NOT IN (SELECT node FROM hubs)"""

  /** Per-node triangle counts over the STRONG collaboration graph
    * ([[StrongEdgeThreshold]] — the raw co-occurrence graph is
    * near-complete, so thresholding is what makes triangle counting
    * meaningful AND sparse). Classic ordered-wedge algorithm: edges are
    * kept as (lo, hi) pairs, wedges join on the shared middle node, a
    * semi join closes them — each triangle (a<b<c) is found exactly
    * once, then credited to all three corners.
    *
    * Scale: wedge count is Σ C(deg, 2) — bounded by the threshold, and
    * the standard mitigation (degree-ordered orientation) is exactly the
    * a<b<c ordering used here. No all-pairs anywhere.
    */
  def triangleCount(spark: SparkSession, dir: String): DataFrame = {
    val edges = strongEdges(spark, dir)
    // Wedge shape MEASURED, kept as the self-equi-join (r16): the
    // per-middle collect+explode form was tried and was ~1.3× slower —
    // see nodeSimilarity's note (interpreted HOF array copies at the
    // 128-neighbor hub cap lose to the codegen'd streaming join).
    val wedges = edges.as("e1")
      .join(edges.as("e2"), col("e1.hi") === col("e2.lo"))
      .select(col("e1.lo").as("a"), col("e1.hi").as("b"), col("e2.hi").as("c"))
    val tris = wedges.join(edges,
        col("a") === col("lo") && col("c") === col("hi"), "left_semi")
    val corners = tris
      .select(explode(array(col("a"), col("b"), col("c"))).as("supp_key"))
      .groupBy(col("supp_key"))
      .agg(count(lit(1)).as("tri0"))
    // report the POPULATION with the verdict (the kcore/burst_detect
    // de-vacuation rule): every capped-strong-graph node with its
    // degree and triangle credit, zeros included — at sf1 the
    // co-occurrence graph thins until NO triangle survives the
    // threshold, and a corners-only output hash-matched two empty sets
    // (the q7_volume class, one decade later)
    edges.select(col("lo").as("supp_key"))
      .unionByName(edges.select(col("hi").as("supp_key")))
      .groupBy(col("supp_key")).agg(count(lit(1)).as("strong_degree"))
      .join(corners, Seq("supp_key"), "left")
      .select(col("supp_key"), col("strong_degree"),
        coalesce(col("tri0"), lit(0L)).as("triangles"))
  }

  lazy val triangleCountOracle: String = s"""
    WITH edges AS MATERIALIZED ($sqlStrongEdges),
    tris AS (
      SELECT e1.lo AS a, e1.hi AS b, e2.hi AS c
      FROM edges e1 JOIN edges e2 ON e1.hi = e2.lo
      WHERE EXISTS (SELECT 1 FROM edges e3
                    WHERE e3.lo = e1.lo AND e3.hi = e2.hi)),
    tcnt AS (
      SELECT supp_key, CAST(COUNT(*) AS BIGINT) AS tri0
      FROM (SELECT UNNEST([a, b, c]) AS supp_key FROM tris)
      GROUP BY 1),
    deg AS (
      SELECT node AS supp_key, CAST(COUNT(*) AS BIGINT) AS strong_degree
      FROM (SELECT lo AS node FROM edges UNION ALL SELECT hi FROM edges)
      GROUP BY 1)
    SELECT d.supp_key, d.strong_degree, COALESCE(t.tri0, 0) AS triangles
    FROM deg d LEFT JOIN tcnt t ON d.supp_key = t.supp_key"""

  /** Neighbor-set Jaccard similarity for node pairs sharing at least one
    * neighbor in the strong collab graph — the Neo4j GDS nodeSimilarity
    * analog ("authors with similar collaborator circles"). Common
    * neighbors come from a wedge join on the CENTER node (a<b generates
    * each unordered pair once); degrees join in broadcast. All-integer
    * counts, one IEEE division.
    *
    * Scale: pair candidates = Σ C(deg_x, 2) over centers, the same bound
    * as triangle_count and tunable by the same edge threshold; the
    * degree table is |nodes| — broadcastable at any corpus size.
    */
  def nodeSimilarity(spark: SparkSession, dir: String): DataFrame = {
    // strongEdges is persisted: both union branches read it, and an
    // unpersisted frame would evaluate the whole collabPairs pipeline
    // twice inside one job.
    val edges = strongEdges(spark, dir)
    val und = edges.select(col("lo").as("u"), col("hi").as("v"))
      .unionByName(edges.select(col("hi").as("u"), col("lo").as("v")))
    val deg = und.groupBy(col("u")).agg(count(lit(1)).as("deg"))
    // Wedge shape MEASURED, kept as the self-equi-join (r16): the
    // collabPairs collect+explode form was tried and was 1.5× SLOWER
    // here — at the hub cap's ≤ 128 neighbors per center the nested
    // transform/slice local-pairs expression does O(deg²) interpreted
    // array copies per grouped row (HOFs don't whole-stage-codegen),
    // while the join streams the same wedge rows through codegen.
    // Local pairs only win at small per-group cardinality (orders' k≤7).
    und.as("l").join(und.as("r"),
        col("l.v") === col("r.v") && col("l.u") < col("r.u"))
      .groupBy(col("l.u").as("node_a"), col("r.u").as("node_b"))
      .agg(count(lit(1)).as("common"))
      .join(stateHint(deg.select(col("u").as("node_a"), col("deg").as("deg_a"))),
        Seq("node_a"))
      .join(stateHint(deg.select(col("u").as("node_b"), col("deg").as("deg_b"))),
        Seq("node_b"))
      .select(col("node_a"), col("node_b"), col("common"),
        (col("common").cast("double")
          / (col("deg_a") + col("deg_b") - col("common")).cast("double"))
          .as("jaccard"))
  }

  lazy val nodeSimilarityOracle: String = s"""
    WITH edges AS ($sqlStrongEdges),
    und AS (
      SELECT lo AS u, hi AS v FROM edges
      UNION ALL
      SELECT hi, lo FROM edges),
    deg AS (SELECT u, COUNT(*) AS deg FROM und GROUP BY 1),
    common AS (
      SELECT l.u AS node_a, r.u AS node_b, COUNT(*) AS common
      FROM und l JOIN und r ON l.v = r.v AND l.u < r.u
      GROUP BY 1, 2)
    SELECT node_a, node_b, common,
      CAST(common AS DOUBLE)
        / CAST(da.deg + db.deg - common AS DOUBLE) AS jaccard
    FROM common
    JOIN deg da ON common.node_a = da.u
    JOIN deg db ON common.node_b = db.u"""

  /** Item-item co-purchase affinity — the bipartite (order × part)
    * graph projected to part-part edges with cosine normalization:
    * cofreq / √(freq_a · freq_b), the classic item-item collaborative
    * filter ("parts bought together", "papers cited together").
    *
    * Scale: pair generation is the same per-order-local collect_set
    * explode as collab_pairs (C(k,2) per order, k small ⇒ linear);
    * per-part frequencies broadcast onto the pair counts. Integer
    * counts; √ and ÷ are single IEEE ops — cross-engine exact.
    */
  def itemCofreq(spark: SparkSession, dir: String): DataFrame = {
    val pairs = Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
      .select(localPairs("ps", "part_a", "part_b").as("p"))
      .groupBy(col("p.part_a").as("part_a"), col("p.part_b").as("part_b"))
      .agg(count(lit(1)).as("cofreq"))
    val freq = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .groupBy(col("l_partkey")).agg(count(lit(1)).as("freq"))
    pairs
      .join(stateHint(freq.select(col("l_partkey").as("part_a"), col("freq").as("freq_a"))),
        Seq("part_a"))
      .join(stateHint(freq.select(col("l_partkey").as("part_b"), col("freq").as("freq_b"))),
        Seq("part_b"))
      .select(col("part_a"), col("part_b"), col("cofreq"),
        (col("cofreq").cast("double")
          / sqrt((col("freq_a") * col("freq_b")).cast("double"))).as("affinity"))
  }

  val itemCofreqOracle: String = """
    WITH e0 AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    pairs AS (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, COUNT(*) AS cofreq
      FROM e0 a JOIN e0 b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2),
    freq AS (SELECT l_partkey, COUNT(*) AS freq FROM e0 GROUP BY 1)
    SELECT part_a, part_b, cofreq,
      CAST(cofreq AS DOUBLE) / SQRT(CAST(fa.freq * fb.freq AS DOUBLE)) AS affinity
    FROM pairs
    JOIN freq fa ON pairs.part_a = fa.l_partkey
    JOIN freq fb ON pairs.part_b = fb.l_partkey"""

  /** k-core degree threshold, the co-purchase edge weight floor, and the
    * FIXED number of peeling rounds. Fixed rounds make the result
    * deterministic and SQL-unrollable (pagerank's 10-iteration
    * discipline — the declared semantics is "[[KCoreRounds]] rounds of
    * peeling", which converges toward the true core as rounds grow).
    * The substrate is the part co-purchase graph (cofreq ≥
    * [[KCoreMinCofreq]]), whose degrees genuinely vary — the strong
    * COLLAB graph is near-complete, so every node trivially survives
    * there and peeling would be vacuous.
    */
  private[graft] val KCoreK = 3
  private[graft] val KCoreRounds = 5
  private[graft] val KCoreMinCofreq = 2

  /** Iterative k-core peeling over the part co-purchase graph: drop
    * nodes with degree < [[KCoreK]] for [[KCoreRounds]] rounds (removing
    * a weak node lowers its neighbors' degrees, hence iterating), then
    * report EVERY base-graph node with its initial degree, whether it
    * survived into the core, and its in-core degree — the "dense
    * co-purchase core" view that raw degree overstates (a degree-3 part
    * whose partners all peel away is not core). The full-population
    * report (not survivors-only) is deliberate: at sf0.1 the peel
    * empties the core entirely — more orders spread pairs across 10×
    * the parts, thinning every neighborhood below k — and a
    * survivors-only frame would return 0 rows there, reducing the
    * oracle match to two empty sets (the q7_volume vacuity class).
    * "Core is empty" is itself a finding, and it's only checkable when
    * the scored population ships with the verdict.
    *
    * Scale: pair generation is the linear per-order collect_set explode
    * (itemCofreq's prep); each round is then one map-side-combinable
    * degree count plus two semi joins against the BROADCAST
    * surviving-node set (nodes ≪ edges, pagerank's small-state shape) —
    * the edge list is never shuffled per round, and lineage truncates
    * through `Iterate.checkpoint`.
    */
  def kcore(spark: SparkSession, dir: String): DataFrame = {
    def degrees(edges: DataFrame): DataFrame =
      edges.select(explode(array(col("lo"), col("hi"))).as("node"))
        .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    val base = Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
      .select(localPairs("ps", "lo", "hi").as("p"))
      .groupBy(col("p.lo").as("lo"), col("p.hi").as("hi"))
      .agg(count(lit(1)).as("cofreq"))
      .filter(col("cofreq") >= KCoreMinCofreq)
      .select(col("lo"), col("hi"))
      .transform(graft.functions.Iterate.checkpoint)
    var edges = base
    for (r <- 1 to KCoreRounds) {
      // keep-set = state: broadcast under the [[stateHint]] node bound.
      val keep = stateHint(degrees(edges).filter(col("deg") >= KCoreK)
        .select(col("node")))
      edges = edges
        .join(keep, col("lo") === col("node"), "left_semi")
        .join(keep, col("hi") === col("node"), "left_semi")
      // Same cadence-2 rule as pagerank's loop. Measured at sf0.1
      // (local[32], min-of-2 sweeps, repeated): every-round 2.0-2.4 s,
      // cadence-2 2.3-2.6 s — no difference above the noise floor, so
      // the tiebreak is the cluster argument: half the materializations
      // is half the checkpoint I/O under a reliable checkpoint dir,
      // while the plan only deepens by two broadcast semi-joins per
      // skipped round. Fixed-round semantics keep the result
      // checkpoint-invariant (hash-verified).
      if (r % 2 == 0) edges = edges.transform(graft.functions.Iterate.checkpoint)
    }
    degrees(base)
      .select(col("node"), col("deg").as("initial_deg"))
      .join(stateHint(degrees(edges)
        .select(col("node"), col("deg").as("core_deg0"))), Seq("node"), "left")
      .select(col("node"), col("initial_deg"),
        col("core_deg0").isNotNull.as("in_core"),
        coalesce(col("core_deg0"), lit(0L)).as("core_deg"))
  }

  lazy val kcoreOracle: String = {
    // MATERIALIZED is load-bearing: each round references the previous
    // edge set twice, and without it DuckDB re-inlines the whole chain
    // (2^rounds re-evaluations of the pair join).
    val rounds = (1 to KCoreRounds).map { i =>
      s"""d$i AS MATERIALIZED (
        SELECT node, COUNT(*) AS deg
        FROM (SELECT lo AS node FROM g${i - 1} UNION ALL SELECT hi FROM g${i - 1})
        GROUP BY 1),
      k$i AS MATERIALIZED (SELECT node FROM d$i WHERE deg >= $KCoreK),
      g$i AS MATERIALIZED (
        SELECT lo, hi FROM g${i - 1}
        WHERE lo IN (SELECT node FROM k$i) AND hi IN (SELECT node FROM k$i))"""
    }.mkString(",\n      ")
    s"""
    WITH ee AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      g0 AS MATERIALIZED (
        SELECT lo, hi FROM (
          SELECT a.l_partkey AS lo, b.l_partkey AS hi, COUNT(*) AS cofreq
          FROM ee a JOIN ee b
            ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
          GROUP BY 1, 2)
        WHERE cofreq >= $KCoreMinCofreq),
      $rounds,
      d0 AS (
        SELECT node, COUNT(*) AS deg
        FROM (SELECT lo AS node FROM g0 UNION ALL SELECT hi FROM g0)
        GROUP BY 1),
      dcore AS (
        SELECT node, COUNT(*) AS deg
        FROM (SELECT lo AS node FROM g$KCoreRounds
              UNION ALL SELECT hi FROM g$KCoreRounds)
        GROUP BY 1)
    SELECT d0.node, d0.deg AS initial_deg,
      (dcore.node IS NOT NULL) AS in_core,
      CAST(COALESCE(dcore.deg, 0) AS BIGINT) AS core_deg
    FROM d0 LEFT JOIN dcore ON d0.node = dcore.node"""
  }

  /** Synchronous label-propagation rounds for [[labelPropagation]]. */
  private val LpaRounds = 4

  /** Community detection by synchronous label propagation (Raghavan et
    * al. 2007) over the STRONG collaboration graph (co-occurrence ≥
    * [[StrongEdgeThreshold]] — the raw graph is near-complete and would
    * collapse to one community): every node starts as its own label,
    * and each of [[LpaRounds]] rounds reassigns it the label carrying
    * the largest edge-weight mass among its neighbors (ties → smaller
    * label). The missing member of the graph family — pagerank ranks,
    * kcore peels, triangle_count measures closure; this PARTITIONS.
    *
    * Fully integer-deterministic: weights are collaboration COUNTS, so
    * neighbor-label masses are integer sums (no FP anywhere), and the
    * argmax breaks ties through a total order — bit-identical to the
    * unrolled-CTE oracle by construction, synchronous (not the paper's
    * asynchronous sweep) precisely so both engines see the same
    * neighbor snapshot each round.
    *
    * Scale: the label vector is one row per node — [[stateHint]]
    * broadcast per round, edges stream map-side; each round shuffles
    * only the (node, label) mass aggregate (≤ |nodes|·distinct-labels,
    * shrinking as labels coalesce), with the kcore checkpoint cadence.
    */
  /** Shared LPA core: the checkpointed strong pair list plus the final
    * label vector — so [[communityStats]] reuses the pair materialization
    * [[labelPropagation]] already paid for instead of re-scanning
    * lineitem for a second collabPairs build.
    */
  private[operators] def lpaCore(spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val pairs = collabPairs(spark, dir)
      .filter(col("collab_count") >= StrongEdgeThreshold)
      .repartition(graft.functions.Iterate.statePartitions(spark))
      .transform(graft.functions.Iterate.checkpoint)
    val edges = pairs.select(col("supp_a").as("src"), col("supp_b").as("dst"),
        col("collab_count").as("w"))
      .unionByName(pairs.select(col("supp_b").as("src"),
        col("supp_a").as("dst"), col("collab_count").as("w")))
    val nodes = edges.select(col("dst").as("node")).distinct()
      .transform(graft.functions.Iterate.checkpoint)
    var lab = nodes.withColumn("label", col("node"))
    for (i <- 1 to LpaRounds) {
      // argmax as a struct-MIN aggregate instead of a row_number window
      // (the Lloyd-assignment r16 shape): min(struct(−s, label)) orders
      // by (s DESC, label ASC) — the window's exact total order, so the
      // chosen label is identical — but the per-(node,label) candidates
      // collapse map-side before the exchange and the per-node sort
      // disappears (weights are integer counts, so −s is exact).
      lab = edges
        .join(stateHint(lab.withColumnRenamed("node", "src")), Seq("src"))
        .groupBy(col("dst"), col("label"))
        .agg(sum(col("w")).as("s"))
        .groupBy(col("dst").as("node"))
        .agg(min(struct((-col("s")).as("ns"), col("label"))).as("__m"))
        .select(col("node"), col("__m.label").as("label"))
      if (i % 2 == 0 && i < LpaRounds)
        lab = lab.transform(graft.functions.Iterate.checkpoint)
    }
    (pairs, lab.select(col("node").as("supp_key"), col("label").as("community")))
  }

  def labelPropagation(spark: SparkSession, dir: String): DataFrame =
    lpaCore(spark, dir)._2

  val labelPropagationOracle: String = {
    val rounds = (1 to LpaRounds).map { i =>
      s"""lab$i AS (
      SELECT node, label FROM (
        SELECT e.dst AS node, l.label, SUM(e.w) AS s,
          ROW_NUMBER() OVER (PARTITION BY e.dst
            ORDER BY SUM(e.w) DESC, l.label ASC) AS rn
        FROM edges e JOIN lab${i - 1} l ON e.src = l.node
        GROUP BY e.dst, l.label)
      WHERE rn = 1)"""
    }.mkString(",\n    ")
    s"""
    WITH p0 AS (
      WITH e0 AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem)
      SELECT a.l_suppkey AS supp_a, b.l_suppkey AS supp_b, COUNT(*) AS c
      FROM e0 a JOIN e0 b
        ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
      GROUP BY 1, 2),
    strong AS (SELECT supp_a, supp_b, c FROM p0 WHERE c >= $StrongEdgeThreshold),
    edges AS (
      SELECT supp_a AS src, supp_b AS dst, c AS w FROM strong
      UNION ALL
      SELECT supp_b, supp_a, c FROM strong),
    nodes AS (SELECT DISTINCT dst AS node FROM edges),
    lab0 AS (SELECT node, node AS label FROM nodes),
    $rounds
    SELECT node AS supp_key, CAST(label AS BIGINT) AS community
    FROM lab$LpaRounds"""
  }

  /** Per-community quality report on [[labelPropagation]]'s partition:
    * member count, internal edge weight (both endpoints inside, each
    * undirected edge once), external edge weight (crossing edges,
    * counted for each side they touch), and `cut_ppm` — the community's
    * cut fraction external/(2·internal + external) in ppm, the
    * conductance-style number that says whether a community is a real
    * module or an artifact. All-integer (weights are counts; ppm by
    * floor division, zero-denominator guarded identically in both
    * engines).
    *
    * Scale: the label vector joins the strong pair list via
    * [[stateHint]] twice (per endpoint); aggregates are ≤ |communities|
    * rows.
    */
  def communityStats(spark: SparkSession, dir: String): DataFrame = {
    val (strongPairs, labels) = lpaCore(spark, dir)
    val comm = labels.transform(graft.functions.Iterate.checkpoint)
    val pairs = strongPairs
      .select(col("supp_a"), col("supp_b"), col("collab_count").as("w"))
    val j = pairs
      .join(stateHint(comm.select(col("supp_key").as("supp_a"),
        col("community").as("ca"))), Seq("supp_a"))
      .join(stateHint(comm.select(col("supp_key").as("supp_b"),
        col("community").as("cb"))), Seq("supp_b"))
      .transform(graft.functions.Iterate.checkpoint)
    val internal = j.filter(col("ca") === col("cb"))
      .groupBy(col("ca").as("community")).agg(sum(col("w")).as("internal_w"))
    val ext = j.filter(col("ca") =!= col("cb"))
      .select(explode(array(col("ca"), col("cb"))).as("community"), col("w"))
      .groupBy(col("community")).agg(sum(col("w")).as("external_w"))
    val sizes = comm.groupBy(col("community")).agg(count(lit(1)).as("n_nodes"))
    sizes
      .join(internal, Seq("community"), "left")
      .join(ext, Seq("community"), "left")
      .select(col("community"), col("n_nodes"),
        coalesce(col("internal_w"), lit(0L)).as("internal_w"),
        coalesce(col("external_w"), lit(0L)).as("external_w"))
      .withColumn("cut_ppm",
        when(col("internal_w") * 2 + col("external_w") === 0, lit(0L))
          .otherwise(expr(
            "(external_w * 1000000) div (internal_w * 2 + external_w)")))
  }

  val communityStatsOracle: String = s"""
    WITH comm AS ($labelPropagationOracle),
    cp0 AS (
      WITH e0 AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem)
      SELECT a.l_suppkey AS supp_a, b.l_suppkey AS supp_b, COUNT(*) AS c
      FROM e0 a JOIN e0 b
        ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
      GROUP BY 1, 2),
    cstrong AS (SELECT supp_a, supp_b, c AS w FROM cp0
      WHERE c >= $StrongEdgeThreshold),
    cj AS (
      SELECT s.w, a.community AS ca, b.community AS cb
      FROM cstrong s
      JOIN comm a ON s.supp_a = a.supp_key
      JOIN comm b ON s.supp_b = b.supp_key),
    cinternal AS (
      SELECT ca AS community, SUM(w) AS iw FROM cj WHERE ca = cb GROUP BY 1),
    cext AS (
      SELECT community, SUM(w) AS ew FROM (
        SELECT ca AS community, w FROM cj WHERE ca <> cb
        UNION ALL SELECT cb, w FROM cj WHERE ca <> cb)
      GROUP BY 1),
    csizes AS (
      SELECT community, COUNT(*) AS n_nodes FROM comm GROUP BY 1)
    SELECT s.community,
      CAST(s.n_nodes AS BIGINT) AS n_nodes,
      CAST(COALESCE(i.iw, 0) AS BIGINT) AS internal_w,
      CAST(COALESCE(e.ew, 0) AS BIGINT) AS external_w,
      CAST(CASE WHEN COALESCE(i.iw, 0) * 2 + COALESCE(e.ew, 0) = 0 THEN 0
        ELSE (COALESCE(e.ew, 0) * 1000000)
          // (COALESCE(i.iw, 0) * 2 + COALESCE(e.ew, 0)) END AS BIGINT)
        AS cut_ppm
    FROM csizes s
    LEFT JOIN cinternal i ON s.community = i.community
    LEFT JOIN cext e ON s.community = e.community"""

  /** Seeded reachability — the BFS member of the graph family: minimum
    * hop distance (≤ 4) from the top-[[PprSeedCount]] seed nodes, as a
    * distance histogram with the unreached remainder at dist = −1.
    * Answers "how much of the graph do the hubs reach, how fast" — the
    * connectivity audit behind seed-based curation (ppr_seeds' mass
    * only spreads where hops exist). Four unrolled frontier rounds
    * (pagerank's broadcast-state loop: the dist vector is node-sized,
    * the edge list never reshuffles); min-dist union-aggregate per
    * round keeps the state one row per reached node.
    */
  def graphReach(spark: SparkSession, dir: String): DataFrame = {
    val (norm, nodes, outW) = normalizedCollabGraph(spark, dir)
    val edges = norm.select(col("src"), col("dst"))
    val seeds = outW.orderBy(col("out_w").desc, col("src").asc)
      .limit(PprSeedCount)
      .select(col("src").as("node"), lit(0).as("dist"))
    // Frontier BFS instead of re-aggregating the full min-dist state
    // every round: a node's min hop distance IS the level at which BFS
    // first reaches it, so each round only expands the LAST level and
    // anti-joins the (lazy) union of checkpointed levels — the old form
    // re-shuffled the whole accumulated dist table per round to recompute
    // mins it already knew (guide §2.3/§2.4: shuffle only the new rows).
    // Levels are disjoint by the anti-join; their union is exactly the
    // old min-dist table, so the histogram is bit-identical.
    val levels = scala.collection.mutable.ArrayBuffer(
      seeds.transform(graft.functions.Iterate.checkpoint))
    for (i <- 1 to 4) {
      val vis = levels.reduce(_ unionByName _).select(col("node"))
      val fresh = edges
        .join(stateHint(levels.last.select(col("node").as("src"))), Seq("src"))
        .select(col("dst").as("node")).distinct()
        .join(stateHint(vis), Seq("node"), "left_anti")
        .withColumn("dist", lit(i))
      levels += fresh.transform(graft.functions.Iterate.checkpoint)
    }
    val dist = levels.reduce(_ unionByName _)
    val reached = dist.groupBy(col("dist")).agg(count(lit(1)).as("n_nodes"))
    val unreached = nodes.join(dist.select(col("node")), Seq("node"), "left_anti")
      .agg(count(lit(1)).as("n_nodes"))
      .select(lit(-1).as("dist"), col("n_nodes"))
      .filter(col("n_nodes") > 0)
    reached.unionByName(unreached)
  }

  val graphReachOracle: String = {
    val rounds = (1 to 4).map { i =>
      s"""d$i AS (
      SELECT node, MIN(dist) AS dist FROM (
        SELECT node, dist FROM d${i - 1}
        UNION ALL
        SELECT e.dst AS node, d.dist + 1 AS dist
        FROM norm e JOIN d${i - 1} d ON e.src = d.node)
      GROUP BY 1)"""
    }.mkString(",\n    ")
    s"""
    WITH $collabGraphCtes,
    d0 AS (
      SELECT src AS node, 0 AS dist
      FROM outw ORDER BY out_w DESC, src ASC LIMIT $PprSeedCount),
    $rounds,
    reached AS (SELECT dist, COUNT(*) AS n_nodes FROM d4 GROUP BY 1),
    unreached AS (
      SELECT -1 AS dist, COUNT(*) AS n_nodes
      FROM nodes n LEFT JOIN d4 d ON n.node = d.node
      WHERE d.node IS NULL
      HAVING COUNT(*) > 0)
    SELECT dist, n_nodes FROM reached
    UNION ALL
    SELECT dist, n_nodes FROM unreached"""
  }

  def defs: Map[String, QueryDef] = Map(
    "graph_reach" -> QueryDef.sql(graphReach, graphReachOracle),
    "label_propagation" -> QueryDef.sql(labelPropagation, labelPropagationOracle),
    "community_stats" -> QueryDef.sql(communityStats, communityStatsOracle),
    "kcore" -> QueryDef.sql(kcore, kcoreOracle),
    "item_cofreq" -> QueryDef.sql(itemCofreq, itemCofreqOracle),
    "node_similarity" -> QueryDef.sql(nodeSimilarity, nodeSimilarityOracle),
    "triangle_count" -> QueryDef.sql(triangleCount, triangleCountOracle),
    "pagerank" -> QueryDef.sql(pagerank, pagerankOracle),
    "ppr_seeds" -> QueryDef.sql(pprSeeds, pprSeedsOracle),
    "collab_pairs" -> QueryDef.sql(collabPairs, collabPairsOracle),
    "top_influential" -> QueryDef.sql(topInfluential, topInfluentialOracle),
    "trends_over_time" -> QueryDef.sql(trendsOverTime, trendsOverTimeOracle),
    "prolific_authors" -> QueryDef.sql(prolificAuthors, prolificAuthorsOracle),
    "topic_popularity" -> QueryDef.sql(topicPopularity, topicPopularityOracle),
    "topic_evolution" -> QueryDef.sql(topicEvolution, topicEvolutionOracle),
    "graph_degree" -> QueryDef.sql(graphDegree, graphDegreeOracle),
    "author_specialization" -> QueryDef.sql(authorSpecialization, authorSpecializationOracle),
    "institution_collab" -> QueryDef.sql(institutionCollab, institutionCollabOracle)
  )
}
