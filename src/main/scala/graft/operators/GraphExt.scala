package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph analytics beyond the rank/community family in [[Analytics]]
  * (§2.C): HITS hubs/authorities on the bipartite purchase graph,
  * degree assortativity, and Newman modularity of the label-propagation
  * partition. Reference analogue: the "influence" and "community
  * quality" idea groups in docs/neo4j_analytical_ideas.md §2/§4 — the
  * reference scores influence with per-row Cypher aggregates; here each
  * algorithm is a broadcast-state loop or a single exact-integer pass.
  *
  * All three follow the graph family's scale contract: edge lists
  * shuffle ONCE at construction and never again (per-round state is one
  * row per node, broadcast via [[Tables.stateHint]]); every iterative
  * quantity is fixed-point BIGINT before any cross-row sum, so both
  * engines agree bit-for-bit regardless of aggregation order.
  */
object GraphExt {

  private val Fx = 1.0e14
  private val HitsRounds = 5

  private def stateHint(df: DataFrame): DataFrame = Tables.stateHint(df)
  private def checkpoint(df: DataFrame): DataFrame =
    graft.functions.Iterate.checkpoint(df)

  /** Bipartite purchase edges customer → supplier with lineitem-count
    * weight. One orderkey join + one (cust, supp) aggregate; the result
    * is checkpointed because the HITS loop re-reads it twice per round.
    */
  private def purchaseEdges(spark: SparkSession, dir: String): DataFrame =
    checkpoint(
      Tables.lineitem(spark, dir)
        .select(col("l_orderkey"), col("l_suppkey"))
        .join(Tables.orders(spark, dir)
          .select(col("o_orderkey").as("l_orderkey"), col("o_custkey")),
          Seq("l_orderkey"))
        .groupBy(col("o_custkey").as("cust"), col("l_suppkey").as("supp"))
        .agg(count(lit(1)).as("w"))
        .repartition(graft.functions.Iterate.statePartitions(spark)))

  private val purchaseEdgesCte: String = """pe AS (
      SELECT o_custkey AS cust, l_suppkey AS supp, COUNT(*) AS w
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY 1, 2)"""

  /** HITS hubs/authorities (Kleinberg 1999) on the bipartite purchase
    * graph: a good HUB is a customer buying from good suppliers, a good
    * AUTHORITY a supplier bought by good hubs — the directed-influence
    * complement of [[Analytics.pagerank]]'s undirected rank
    * (neo4j_analytical_ideas.md §2 "Most Influential").
    *
    * Determinism: each half-step floors `score·w·1e14` to BIGINT before
    * the inflow sum (order-independent exact addition), L1-normalizes by
    * the exact BIGINT total with a single double division, and the next
    * half-step re-floors — the pagerank fixed-point discipline, so the
    * unrolled-CTE oracle is bit-identical. Init hub = 1/|customers|
    * keeps the first un-normalized inflow at ~avg-degree·1e14, overflow
    * -safe at any corpus size (BIGINT headroom ≥ 1e18 / Σhub = 1).
    *
    * Scale: the edge list never reshuffles after construction; per-round
    * state is one row per customer or supplier, broadcast both ways.
    */
  def hitsAuthority(spark: SparkSession, dir: String): DataFrame = {
    val edges = purchaseEdges(spark, dir)
    val nc = edges.select(col("cust")).distinct().count()
    var hub = edges.select(col("cust")).distinct()
      .withColumn("score", lit(1.0) / lit(nc.toDouble))
    var auth: DataFrame = null
    // Each half-step materializes its node-scale fx vector (checkpoint =
    // cheap at state size) so the L1 total's crossJoin re-reads the
    // materialized rows instead of re-running the edge join — 10 edge
    // scans per run, not 20 — and lineage stays one half-step deep.
    def normalize(fx: DataFrame, key: String): DataFrame = {
      val mat = checkpoint(fx)
      mat.crossJoin(broadcast(mat.agg(sum(col("fx")).cast("double").as("tot"))))
        .select(col(key), (col("fx").cast("double") / col("tot")).as("score"))
    }
    for (i <- 1 to HitsRounds) {
      auth = normalize(edges
        .join(stateHint(hub), Seq("cust"))
        .select(col("supp"),
          floor(col("score") * col("w").cast("double") * lit(Fx) + lit(0.5))
            .cast("bigint").as("fx"))
        .groupBy(col("supp")).agg(sum(col("fx")).as("fx")), "supp")
      hub = normalize(edges
        .join(stateHint(auth), Seq("supp"))
        .select(col("cust"),
          floor(col("score") * col("w").cast("double") * lit(Fx) + lit(0.5))
            .cast("bigint").as("fx"))
        .groupBy(col("cust")).agg(sum(col("fx")).as("fx")), "cust")
    }
    val top = (df: DataFrame, side: String, key: String) =>
      df.select(lit(side).as("side"), col(key).as("node_key"),
          (floor(col("score") * lit(1.0e8) + lit(0.5)).cast("double") / lit(1.0e8))
            .as("score"))
        .orderBy(col("score").desc, col("node_key").asc)
        .limit(15)
    top(auth, "authority", "supp").unionByName(top(hub, "hub", "cust"))
  }

  val hitsAuthorityOracle: String = {
    // MATERIALIZED is load-bearing (the kcore-oracle rule): each fx CTE
    // is referenced twice (rows + L1 total) and each round references the
    // previous — DuckDB inlines plain CTEs, which goes exponential here.
    def half(iter: Int, outKey: String, inKey: String, prev: String, name: String) =
      s"""${name}fx$iter AS MATERIALIZED (
      SELECT $outKey, SUM(CAST(FLOOR(p.score * CAST(w AS DOUBLE) * 1.0e14 + 0.5)
        AS BIGINT)) AS fx
      FROM pe JOIN $prev p USING ($inKey) GROUP BY 1),
    $name$iter AS MATERIALIZED (
      SELECT $outKey, CAST(fx AS DOUBLE)
        / (SELECT CAST(SUM(fx) AS DOUBLE) FROM ${name}fx$iter) AS score
      FROM ${name}fx$iter)"""
    val rounds = (1 to HitsRounds).map { i =>
      val prevHub = if (i == 1) "h0" else s"h${i - 1}"
      half(i, "supp", "cust", prevHub, "a") + ",\n    " +
        half(i, "cust", "supp", s"a$i", "h")
    }.mkString(",\n    ")
    s"""
    WITH $purchaseEdgesCte,
    h0 AS (
      SELECT cust, CAST(1.0 AS DOUBLE)
        / (SELECT CAST(COUNT(DISTINCT cust) AS DOUBLE) FROM pe) AS score
      FROM (SELECT DISTINCT cust FROM pe)),
    $rounds
    SELECT * FROM (
      (SELECT 'authority' AS side, supp AS node_key,
        CAST(FLOOR(score * 1.0e8 + 0.5) AS DOUBLE) / 1.0e8 AS score
      FROM a$HitsRounds ORDER BY score DESC, node_key ASC LIMIT 15)
      UNION ALL
      (SELECT 'hub', cust,
        CAST(FLOOR(score * 1.0e8 + 0.5) AS DOUBLE) / 1.0e8
      FROM h$HitsRounds ORDER BY 3 DESC, 2 ASC LIMIT 15))"""
  }

  /** Degree assortativity (Newman 2002) of the part co-purchase graph
    * ([[Analytics.kcore]]'s cofreq ≥ 2 base — the supplier collab graph
    * is near-complete at every SF, so its degree variance collapses):
    * the Pearson correlation of endpoint degrees over the symmetrized
    * edge list — positive means popular parts co-sell with popular
    * parts (a rich-club catalogue), negative a hub-and-spoke one; the
    * one-number topology audit behind the §4 community-structure ideas.
    *
    * Exactness: degrees and all moments (M, Σx, Σxy, Σx²; Σy = Σx by
    * symmetry) are exact BIGINTs, so even the ZERO-VARIANCE degenerate
    * case is decided exactly (den = M·Σx² − (Σx)² = 0 ⇒ coefficient 0
    * by convention, branched on the integer, never on a double). The
    * only doubles are the final closed-form division, identical
    * expression shape in both engines.
    *
    * Scale: distinct-neighbor degree is one aggregate over the edge
    * list; the moment fold is a single map-side-combinable pass. No
    * iteration, no state. BIGINT headroom: M·Σx² stays under 9.2e18
    * while M·maxdeg² does — a 1e8-edge graph with 1e5-degree hubs;
    * beyond that the moments (not the data) need DECIMAL(38).
    */
  def graphAssortativity(spark: SparkSession, dir: String): DataFrame = {
    val pairs = Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
      .select(localPartPairs("ps").as("p"))
      .groupBy(col("p.pa").as("pa"), col("p.pb").as("pb"))
      .agg(count(lit(1)).as("c"))
      .filter(col("c") >= 2)
    val edges = checkpoint(
      pairs.select(col("pa").as("src"), col("pb").as("dst"))
        .unionByName(pairs.select(col("pb").as("src"), col("pa").as("dst"))))
    val deg = edges.groupBy(col("src").as("node")).agg(count(lit(1)).as("deg"))
    val m = edges
      .join(stateHint(deg.select(col("node").as("src"), col("deg").as("dx"))), Seq("src"))
      .join(stateHint(deg.select(col("node").as("dst"), col("deg").as("dy"))), Seq("dst"))
      .agg(
        count(lit(1)).as("m_edges"),
        sum(col("dx")).as("sum_x"),
        sum(col("dx") * col("dy")).as("sum_xy"),
        sum(col("dx") * col("dx")).as("sum_x2"))
    m.select(
      col("m_edges"), col("sum_x"), col("sum_xy"), col("sum_x2"),
      (col("m_edges") * col("sum_x2") - col("sum_x") * col("sum_x")).as("den"))
      .withColumn("assortativity",
        when(col("den") === 0L, lit(0.0))
          .otherwise(
            floor(
              ((col("m_edges").cast("double") * col("sum_xy").cast("double"))
                - (col("sum_x").cast("double") * col("sum_x").cast("double")))
                / col("den").cast("double")
                * lit(1.0e8) + lit(0.5)).cast("double") / lit(1.0e8)))
  }

  /** [[Analytics.localPairs]] twin for the part key pair (kept local to
    * avoid widening Analytics' private helper).
    */
  private def localPartPairs(arrCol: String) =
    explode(expr(
      s"""flatten(transform($arrCol, (x, i) ->
         |  transform(slice($arrCol, i + 2, size($arrCol)), y ->
         |    struct(x AS pa, y AS pb))))""".stripMargin))

  val graphAssortativityOracle: String = """
    WITH pairs AS (
      WITH e0 AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
      SELECT a.l_partkey AS pa, b.l_partkey AS pb
      FROM e0 a JOIN e0 b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING COUNT(*) >= 2),
    edges AS (
      SELECT pa AS src, pb AS dst FROM pairs
      UNION ALL SELECT pb, pa FROM pairs),
    deg AS (SELECT src AS node, COUNT(*) AS deg FROM edges GROUP BY 1),
    mo AS (
      SELECT COUNT(*) AS m_edges, CAST(SUM(x.deg) AS BIGINT) AS sum_x,
        CAST(SUM(x.deg * y.deg) AS BIGINT) AS sum_xy,
        CAST(SUM(x.deg * x.deg) AS BIGINT) AS sum_x2
      FROM edges e JOIN deg x ON e.src = x.node JOIN deg y ON e.dst = y.node)
    SELECT m_edges, sum_x, sum_xy, sum_x2,
      m_edges * sum_x2 - sum_x * sum_x AS den,
      CASE WHEN m_edges * sum_x2 - sum_x * sum_x = 0 THEN CAST(0.0 AS DOUBLE)
        ELSE CAST(FLOOR(
          ((CAST(m_edges AS DOUBLE) * CAST(sum_xy AS DOUBLE))
            - (CAST(sum_x AS DOUBLE) * CAST(sum_x AS DOUBLE)))
          / CAST(m_edges * sum_x2 - sum_x * sum_x AS DOUBLE)
          * 1.0e8 + 0.5) AS DOUBLE) / 1.0e8 END AS assortativity
    FROM mo"""

  /** Newman modularity of the [[Analytics.labelPropagation]] partition
    * over the strong collaboration graph — the quality score for the
    * communities the LP pass produces (is the partition better than
    * chance?), composing lpaCore exactly as community_stats does but
    * answering the GLOBAL question its per-community cut ratios don't.
    *
    * Fully exact integers: with integer edge weights, m (total weight),
    * in_c (internal weight) and deg_c (community strength) are BIGINTs,
    * so each community's modularity numerator 4·m·in_c − deg_c² and the
    * shared denominator 4m² are exact — q_ppm is the only rounding, one
    * FLOOR over a single double division (well-defined for negative
    * numerators in both engines). Σ num_c / den = Q.
    *
    * Scale: the label vector (one row per node) broadcast-joins the
    * already-checkpointed strong pair list twice; every aggregate is ≤
    * |communities| rows.
    */
  def graphModularity(spark: SparkSession, dir: String): DataFrame = {
    val (strongPairs, labels) = Analytics.lpaCore(spark, dir)
    val comm = checkpoint(labels)
    val j = checkpoint(strongPairs
      .select(col("supp_a"), col("supp_b"), col("collab_count").as("w"))
      .join(stateHint(comm.select(col("supp_key").as("supp_a"),
        col("community").as("ca"))), Seq("supp_a"))
      .join(stateHint(comm.select(col("supp_key").as("supp_b"),
        col("community").as("cb"))), Seq("supp_b")))
    val mTot = j.agg(sum(col("w")).as("m")) // total undirected weight
    val inW = j.filter(col("ca") === col("cb"))
      .groupBy(col("ca").as("community")).agg(sum(col("w")).as("in_w"))
    // node strength k_i = sum of incident weight; deg_c = sum over members
    val strength = j.select(col("supp_a").as("node"), col("w"))
      .unionByName(j.select(col("supp_b").as("node"), col("w")))
      .groupBy(col("node")).agg(sum(col("w")).as("k"))
    val degC = strength
      .join(stateHint(comm.select(col("supp_key").as("node"), col("community"))),
        Seq("node"))
      .groupBy(col("community")).agg(sum(col("k")).as("deg_w"))
    degC
      .join(inW, Seq("community"), "left")
      .crossJoin(broadcast(mTot))
      .select(col("community"),
        coalesce(col("in_w"), lit(0L)).as("in_w"),
        col("deg_w"),
        (lit(4L) * col("m") * coalesce(col("in_w"), lit(0L))
          - col("deg_w") * col("deg_w")).as("q_num"),
        (lit(4L) * col("m") * col("m")).as("q_den"))
      .withColumn("q_ppm",
        floor(col("q_num").cast("double") * lit(1.0e6)
          / col("q_den").cast("double")).cast("bigint"))
  }

  // comm/sp/j MATERIALIZED: comm is the whole 4-round LPA chain and j is
  // referenced three times — un-materialized, DuckDB re-inlines the
  // chain multiplicatively (at sf1 the spill filled the temp dir before
  // the 21-minute mark; with MATERIALIZED the oracle is seconds)
  val graphModularityOracle: String = s"""
    WITH comm AS MATERIALIZED (${Analytics.labelPropagationOracle}),
    sp AS MATERIALIZED (
      WITH e0 AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem)
      SELECT a.l_suppkey AS supp_a, b.l_suppkey AS supp_b, COUNT(*) AS w
      FROM e0 a JOIN e0 b
        ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
      GROUP BY 1, 2
      HAVING COUNT(*) >= ${Analytics.StrongEdgeThreshold}),
    j AS MATERIALIZED (
      SELECT sp.supp_a, sp.supp_b, sp.w, x.community AS ca, y.community AS cb
      FROM sp JOIN comm x ON sp.supp_a = x.supp_key
        JOIN comm y ON sp.supp_b = y.supp_key),
    mt AS (SELECT CAST(SUM(w) AS BIGINT) AS m FROM j),
    inw AS (SELECT ca AS community, CAST(SUM(w) AS BIGINT) AS in_w
      FROM j WHERE ca = cb GROUP BY 1),
    strength AS (
      SELECT node, CAST(SUM(w) AS BIGINT) AS k FROM (
        SELECT supp_a AS node, w FROM j UNION ALL SELECT supp_b, w FROM j)
      GROUP BY 1),
    degc AS (
      SELECT c.community, CAST(SUM(s.k) AS BIGINT) AS deg_w
      FROM strength s JOIN comm c ON s.node = c.supp_key GROUP BY 1)
    SELECT d.community, COALESCE(i.in_w, 0) AS in_w, d.deg_w,
      4 * mt.m * COALESCE(i.in_w, 0) - d.deg_w * d.deg_w AS q_num,
      4 * mt.m * mt.m AS q_den,
      CAST(FLOOR(CAST(4 * mt.m * COALESCE(i.in_w, 0) - d.deg_w * d.deg_w AS DOUBLE)
        * 1.0e6 / CAST(4 * mt.m * mt.m AS DOUBLE)) AS BIGINT) AS q_ppm
    FROM degc d LEFT JOIN inw i ON d.community = i.community
    CROSS JOIN mt"""

  /** Association rules over order baskets (Agrawal-Srikant market-basket
    * analysis, the recommendation layer on [[Analytics.itemCofreq]]'s
    * raw pair counts): support, directional confidence, and lift for
    * every part pair co-purchased ≥ 2 times, top-25 by lift. All three
    * metrics are exact integer ppm — lift = cofreq·N·1e6 ÷ (n_a·n_b)
    * cross-multiplied in BIGINT, never a float ratio (headroom: safe
    * while cofreq·N·1e6 < 9.2e18, i.e. a 1e9-order lake with 1e3-deep
    * co-occurrence).
    *
    * Scale: pairs expand locally from per-order sorted item sets (the
    * collabPairs discipline), item supports are one aggregate broadcast
    * back via [[Tables.stateHint]], the N scalar broadcasts; top-25 is
    * a TakeOrdered.
    */
  def assocRules(spark: SparkSession, dir: String): DataFrame = {
    // ONE corpus shuffle: the per-order sorted basket is the shared base
    // for N, item supports (explode), and pair counts (local C(k,2)) —
    // a separate DISTINCT scan for supports would re-shuffle lineitem.
    val baskets = checkpoint(Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_set(col("l_partkey"))).as("ps")))
    val nOrders = baskets.agg(count(lit(1)).as("n_orders"))
    val support = baskets.select(explode(col("ps")).as("pk"))
      .groupBy(col("pk")).agg(count(lit(1)).as("n_item"))
    val pairs = baskets
      .select(localPartPairs("ps").as("p"))
      .groupBy(col("p.pa").as("pa"), col("p.pb").as("pb"))
      .agg(count(lit(1)).as("cofreq"))
      .filter(col("cofreq") >= 2)
    pairs
      .join(stateHint(support.select(col("pk").as("pa"), col("n_item").as("n_a"))),
        Seq("pa"))
      .join(stateHint(support.select(col("pk").as("pb"), col("n_item").as("n_b"))),
        Seq("pb"))
      .crossJoin(broadcast(nOrders))
      .select(col("pa"), col("pb"), col("cofreq"), col("n_a"), col("n_b"),
        expr("(cofreq * 1000000) div n_orders").as("support_ppm"),
        expr("(cofreq * 1000000) div n_a").as("conf_a_to_b_ppm"),
        expr("(cofreq * 1000000) div n_b").as("conf_b_to_a_ppm"),
        expr("(cofreq * n_orders * 1000000) div (n_a * n_b)").as("lift_ppm"))
      .orderBy(col("lift_ppm").desc, col("pa").asc, col("pb").asc)
      .limit(25)
  }

  val assocRulesOracle: String = """
    WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    n AS (SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM items),
    support AS (SELECT l_partkey AS pk, COUNT(*) AS n_item FROM items GROUP BY 1),
    pairs AS (
      SELECT a.l_partkey AS pa, b.l_partkey AS pb, COUNT(*) AS cofreq
      FROM items a JOIN items b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING COUNT(*) >= 2)
    SELECT pa, pb, cofreq, sa.n_item AS n_a, sb.n_item AS n_b,
      (cofreq * 1000000) // n_orders AS support_ppm,
      (cofreq * 1000000) // sa.n_item AS conf_a_to_b_ppm,
      (cofreq * 1000000) // sb.n_item AS conf_b_to_a_ppm,
      (cofreq * n_orders * 1000000) // (sa.n_item * sb.n_item) AS lift_ppm
    FROM pairs JOIN support sa ON pa = sa.pk JOIN support sb ON pb = sb.pk
    CROSS JOIN n
    ORDER BY lift_ppm DESC, pa ASC, pb ASC LIMIT 25"""

  private val WalkSteps = 5
  private val WalksPerSeed = 4

  /** Deterministic random walks over the co-purchase graph — the
    * DeepWalk/node2vec corpus generator (walks ARE the training
    * sentences for graph embeddings), made reproducible: at each step
    * the walker picks neighbor rank hash24(node|step|walk) mod degree
    * from the id-ordered adjacency — the salted-hash-mod discipline the
    * sampling family uses, so the same graph always yields the same
    * walks and the unrolled oracle is bit-identical. 5 steps × 4 walks
    * from each of the top-5 degree seeds.
    *
    * Scale: the ranked adjacency builds once (one pair shuffle + a
    * per-node rank window) and is checkpointed; each step joins the
    * ≤ seeds·walks-row frontier against it (frontier broadcasts). Walk
    * count scales embarrassingly — frontier rows stay
    * walks-set-bounded, never graph-bounded.
    */
  def randomWalks(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pairs = Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
      .select(localPartPairs("ps").as("p"))
      .groupBy(col("p.pa").as("pa"), col("p.pb").as("pb"))
      .agg(count(lit(1)).as("c"))
      .filter(col("c") >= 2)
    val adjRanked = checkpoint(
      pairs.select(col("pa").as("node"), col("pb").as("nbr"))
        .unionByName(pairs.select(col("pb").as("node"), col("pa").as("nbr")))
        .withColumn("rank", row_number().over(
          Window.partitionBy(col("node")).orderBy(col("nbr").asc)).cast("long")))
    val deg = adjRanked.groupBy(col("node")).agg(max(col("rank")).as("deg"))
    val seeds = deg.orderBy(col("deg").desc, col("node").asc).limit(5)
      .select(col("node").as("seed"))
      .crossJoin(spark.range(WalksPerSeed).select(col("id").as("walk_id")))
    // each step's frontier is checkpointed (walks·seeds-bounded rows):
    // un-materialized, step t's plan chains t broadcast joins and the
    // final union re-evaluates every prefix — O(steps²) tiny joins in
    // one job (guide §2.4's loop-lineage rule at walk scale)
    var frontier = checkpoint(seeds.select(col("seed"), col("walk_id"),
      lit(0L).as("step"), col("seed").as("node")))
    var walks = frontier
    for (t <- 1 to WalkSteps) {
      val withDeg = frontier.join(stateHint(deg), Seq("node"))
        .withColumn("pick",
          graft.functions.TextOps.hash24(concat(
            col("node").cast("string"), lit("|"), lit(t), lit("|"),
            col("walk_id").cast("string"), lit("|"), col("seed").cast("string")))
            % col("deg") + 1)
      frontier = checkpoint(adjRanked
        .join(stateHint(withDeg.select(col("node"), col("seed"), col("walk_id"),
          col("pick"))), Seq("node"))
        .filter(col("rank") === col("pick"))
        .select(col("seed"), col("walk_id"), lit(t.toLong).as("step"),
          col("nbr").as("node")))
      walks = walks.unionByName(frontier)
    }
    walks
  }

  val randomWalksOracle: String = {
    def hash(t: Int) =
      s"""CAST('0x' || SUBSTR(MD5(CAST(f.node AS VARCHAR) || '|' || '$t' || '|'
        || CAST(f.walk_id AS VARCHAR) || '|' || CAST(f.seed AS VARCHAR)), 1, 6)
        AS BIGINT)"""
    val steps = (1 to WalkSteps).map { t =>
      s"""f$t AS MATERIALIZED (
      SELECT f.seed, f.walk_id, $t AS step, a.nbr AS node
      FROM f${t - 1} f
      JOIN deg d ON f.node = d.node
      JOIN adj a ON a.node = f.node AND a.rank = ${hash(t)} % d.deg + 1)"""
    }.mkString(",\n    ")
    val out = (0 to WalkSteps).map(t =>
      s"SELECT seed, walk_id, CAST(step AS BIGINT) AS step, node FROM f$t")
      .mkString("\n      UNION ALL ")
    s"""
    WITH pairs AS MATERIALIZED (
      WITH e0 AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
      SELECT a.l_partkey AS pa, b.l_partkey AS pb
      FROM e0 a JOIN e0 b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING COUNT(*) >= 2),
    adj AS MATERIALIZED (
      SELECT node, nbr, CAST(ROW_NUMBER() OVER (PARTITION BY node
        ORDER BY nbr ASC) AS BIGINT) AS rank
      FROM (SELECT pa AS node, pb AS nbr FROM pairs
        UNION ALL SELECT pb, pa FROM pairs)),
    deg AS MATERIALIZED (SELECT node, MAX(rank) AS deg FROM adj GROUP BY 1),
    seeds AS (
      SELECT node AS seed FROM deg ORDER BY deg DESC, node ASC LIMIT 5),
    f0 AS MATERIALIZED (
      SELECT s.seed, w.range AS walk_id, 0 AS step, s.seed AS node
      FROM seeds s CROSS JOIN range(0, $WalksPerSeed) w),
    $steps
    SELECT * FROM (
      $out)"""
  }

  /** Time-decayed item popularity with an EXACT half-life counter —
    * trending items for the recommendation layer (top_influential is
    * the all-time static twin): weekly buckets decay by 2^−(age÷13)
    * (quarterly half-life), and because the decay weights are powers of
    * two the whole score is INTEGER arithmetic — score_micro =
    * Σ cnt_w · 2^(20 − age÷13), with buckets older than 20 half-lives
    * contributing exactly 0 (a documented truncation, < 1e-6 of the
    * weight) — never a float sum, never libm pow (the ewma_smooth
    * discipline on a per-item axis). One corpus shuffle into the
    * (item, week) grid; the decayed fold and TakeOrdered run on the
    * grid.
    */
  def decayedPopularity(spark: SparkSession, dir: String): DataFrame = {
    val weekly = Tables.lineitem(spark, dir)
      .groupBy(col("l_partkey").as("part_key"),
        expr("cast(datediff(to_date(l_shipdate), '1970-01-01') as bigint) div 7")
          .as("week"))
      .agg(count(lit(1)).as("cnt"))
    val maxW = weekly.agg(max(col("week")).as("max_week"))
    weekly.crossJoin(broadcast(maxW))
      .withColumn("hl", expr("(max_week - week) div 13"))
      .withColumn("contrib",
        when(col("hl") <= 20, col("cnt") * expr("shiftleft(1L, cast(20 - hl as int))"))
          .otherwise(0L))
      .groupBy(col("part_key"))
      .agg(sum(col("contrib")).as("score_micro"), sum(col("cnt")).as("n_total"))
      .orderBy(col("score_micro").desc, col("part_key").asc)
      .limit(20)
  }

  val decayedPopularityOracle: String = """
    WITH weekly AS (
      SELECT l_partkey AS part_key,
        CAST(DATEDIFF('day', DATE '1970-01-01', CAST(l_shipdate AS DATE)) AS BIGINT)
          // 7 AS week,
        COUNT(*) AS cnt
      FROM lineitem GROUP BY 1, 2),
    mw AS (SELECT MAX(week) AS max_week FROM weekly),
    scored AS (
      SELECT part_key, cnt,
        (max_week - week) // 13 AS hl
      FROM weekly CROSS JOIN mw)
    SELECT part_key,
      CAST(SUM(CASE WHEN hl <= 20 THEN cnt * (1::BIGINT << CAST(20 - hl AS INT))
        ELSE 0 END) AS BIGINT) AS score_micro,
      CAST(SUM(cnt) AS BIGINT) AS n_total
    FROM scored GROUP BY 1
    ORDER BY score_micro DESC, part_key ASC LIMIT 20"""

  /** Per-node local clustering coefficient over the co-purchase graph —
    * triangle_count's GLOBAL closure measured per vertex: lcc =
    * 2·tri(v) ÷ (deg(v)·(deg(v)−1)) in exact integer ppm, top-20 among
    * nodes with deg ≥ 3 (the neighborhoods where closure is
    * meaningful). Triangles enumerate once via the oriented wedge join
    * (a<b<c — each triangle exactly once), then explode to the three
    * member vertices; degree is one aggregate over the symmetric
    * adjacency.
    *
    * Scale: the wedge join is the intrinsic triangle cost (the
    * triangle_count operator documents the hub-cap treatment for skewed
    * degree at 100 TB; this graph is cofreq-thresholded the same way);
    * per-node rollups are node-scale.
    */
  def clusteringCoefficient(spark: SparkSession, dir: String): DataFrame = {
    val pairs = checkpoint(Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
      .select(localPartPairs("ps").as("p"))
      .groupBy(col("p.pa").as("a"), col("p.pb").as("b"))
      .agg(count(lit(1)).as("c"))
      .filter(col("c") >= 2)
      .select(col("a"), col("b")))
    val deg = pairs.select(col("a").as("node"))
      .unionByName(pairs.select(col("b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    val wedges = pairs.as("e1")
      .join(pairs.as("e2"), col("e1.b") === col("e2.a"))
      .select(col("e1.a").as("x"), col("e1.b").as("y"), col("e2.b").as("z"))
    val triangles = wedges
      .join(pairs.select(col("a").as("x"), col("b").as("z")), Seq("x", "z"))
    val triPerNode = triangles
      .select(explode(array(col("x"), col("y"), col("z"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("n_tri"))
    deg.join(triPerNode, Seq("node"), "left")
      .select(col("node"), col("deg"),
        coalesce(col("n_tri"), lit(0L)).as("n_tri"))
      .filter(col("deg") >= 3)
      .withColumn("lcc_ppm", expr("(n_tri * 2000000) div (deg * (deg - 1))"))
      .orderBy(col("lcc_ppm").desc, col("node").asc)
      .limit(20)
  }

  val clusteringCoefficientOracle: String = """
    WITH pairs AS MATERIALIZED (
      WITH e0 AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
      SELECT a.l_partkey AS a, b.l_partkey AS b
      FROM e0 a JOIN e0 b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING COUNT(*) >= 2),
    deg AS (
      SELECT node, COUNT(*) AS deg FROM (
        SELECT a AS node FROM pairs UNION ALL SELECT b FROM pairs)
      GROUP BY 1),
    tri AS (
      SELECT e1.a AS x, e1.b AS y, e2.b AS z
      FROM pairs e1 JOIN pairs e2 ON e1.b = e2.a
      JOIN pairs e3 ON e3.a = e1.a AND e3.b = e2.b),
    tpn AS (
      SELECT node, COUNT(*) AS n_tri FROM (
        SELECT x AS node FROM tri UNION ALL SELECT y FROM tri
        UNION ALL SELECT z FROM tri)
      GROUP BY 1)
    SELECT d.node, d.deg, COALESCE(t.n_tri, 0) AS n_tri,
      (COALESCE(t.n_tri, 0) * 2000000) // (d.deg * (d.deg - 1)) AS lcc_ppm
    FROM deg d LEFT JOIN tpn t ON d.node = t.node
    WHERE d.deg >= 3
    ORDER BY lcc_ppm DESC, d.node ASC LIMIT 20"""

  /** Sampled betweenness centrality — Brandes' dependency accumulation
    * (Brandes 2001, "A faster algorithm for betweenness centrality")
    * from [[BetweennessSeeds]] deterministic source seeds over the
    * STRONG collaboration graph, shortest paths bounded at
    * [[BetweennessDepth]] hops. The one classic influence metric in the
    * reference's ideas list (docs/neo4j_analytical_ideas.md §1/§5 —
    * "key papers that have influenced a field", GDS ships betweenness
    * beside nodeSimilarity) not covered by the endpoint measures:
    * degree/pagerank/HITS score where influence LANDS, betweenness
    * scores who BROKERS it (how much shortest-path traffic transits a
    * node).
    *
    * Exact-on-seeds contract: this is not an approximation of the
    * per-seed computation — each sampled source's dependency δₛ(v) is
    * computed exactly (in 1e-9 fixed point) and the estimate is the sum
    * over the seed sample, the standard Brandes–Pich sampling estimator
    * left UN-rescaled so the output is a pure function of the declared
    * seeds. Seeds are the top-[[BetweennessSeeds]] nodes by strong-edge
    * weighted degree (weight DESC, key ASC — [[Analytics.pprSeeds]]'
    * determinism rule).
    *
    * Algorithm, forward: level-synchronous BFS carrying σ (number of
    * shortest paths from the seed — exact BIGINT, bounded by
    * maxdeg^depth ≤ 128⁴ ≈ 2.7e8 under [[Analytics.MaxWedgeDegree]],
    * which is what makes the hub cap part of this operator's declared
    * semantics and not just a performance knob). Backward: δ(v) =
    * Σ_{w: succ} (σᵥ/σ_w)(1+δ_w), folded per level in 1e9 fixed point —
    * the ratio is materialized as (σᵥ·(1e9+δ_w)) div σ_w with the
    * product in DECIMAL(38,0)/HUGEINT (BIGINT would wrap at
    * σ·δ ≈ 2.7e20), so every cross-row sum is an integer and both
    * engines agree bit-for-bit at any partitioning. Truncating div at
    * each level makes δ a deterministic 1e-9-granular lower bound —
    * identical truncation on both sides, so hash-comparable.
    *
    * Scale: the graph family's contract — edges shuffle once at
    * construction, every per-round frame is (seeds × nodes)-sized state
    * broadcast via [[Tables.stateHint]], 4 forward + 3 backward
    * aggregates; the depth cap bounds the work per seed by |E| per
    * round independent of graph size. Output: top-20 reached non-seed
    * nodes by accumulated dependency (ties broken by key), with the
    * count of seeds reaching each.
    */
  private val BetweennessSeeds = 5
  private val BetweennessDepth = 4
  private val BetweennessScale = 1000000000L

  /** Shared substrate of the seeded-centrality family
    * ([[betweennessSampled]], [[closenessSampled]]): the symmetrized
    * strong hub-capped collab edges (checkpointed — the loops re-read
    * them every round) and the top-[[BetweennessSeeds]] seeds by
    * weighted degree (weight DESC, key ASC — [[Analytics.pprSeeds]]'
    * determinism rule).
    */
  private[graft] def strongSeededGraph(
      spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    // strongEdges' persist discipline (Analytics.scala): cache the raw
    // strong pairs only while the hub cap's broadcast + probe both read
    // them, then keep just the capped frame for the loop rounds.
    val raw = Analytics.collabPairs(spark, dir)
      .filter(col("collab_count") >= Analytics.StrongEdgeThreshold)
      .select(col("supp_a").as("lo"), col("supp_b").as("hi"),
        col("collab_count").as("c"))
      .transform(graft.functions.PlanGuard.persist(_))
    val capped = Analytics.dropHubs(raw, Analytics.MaxWedgeDegree)
      .transform(graft.functions.PlanGuard.persist(_))
    capped.count()
    raw.unpersist()
    val edges = checkpoint(
      capped.select(col("lo").as("src"), col("hi").as("dst"), col("c"))
        .unionByName(
          capped.select(col("hi").as("src"), col("lo").as("dst"), col("c"))))
    capped.unpersist()
    val seeds = edges
      .groupBy(col("src").as("seed")).agg(sum(col("c")).as("w"))
      .orderBy(col("w").desc, col("seed").asc).limit(BetweennessSeeds)
      .select(col("seed"))
    (edges, seeds)
  }

  /** Shared oracle prelude for the seeded-centrality family: the CTE
    * chain ending at `edges(src, dst, c)` + `seeds(seed)` (every stage
    * MATERIALIZED — each is referenced by several downstream CTEs and a
    * plain CTE would inline the whole chain per reference).
    */
  private def strongSeededGraphSql: String = s"""e0 AS MATERIALIZED (
      SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
    p0 AS MATERIALIZED (
      SELECT a.l_suppkey AS lo, b.l_suppkey AS hi, COUNT(*) AS c
      FROM e0 a JOIN e0 b
        ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
      GROUP BY 1, 2
      HAVING COUNT(*) >= ${Analytics.StrongEdgeThreshold}),
    sdeg AS MATERIALIZED (
      SELECT node, COUNT(*) AS deg
      FROM (SELECT lo AS node FROM p0 UNION ALL SELECT hi FROM p0)
      GROUP BY 1),
    hubs AS MATERIALIZED (
      SELECT node FROM sdeg WHERE deg > ${Analytics.MaxWedgeDegree}),
    s AS MATERIALIZED (
      SELECT lo, hi, c FROM p0
      WHERE lo NOT IN (SELECT node FROM hubs)
        AND hi NOT IN (SELECT node FROM hubs)),
    edges AS MATERIALIZED (
      SELECT lo AS src, hi AS dst, c FROM s
      UNION ALL SELECT hi, lo, c FROM s),
    seeds AS MATERIALIZED (
      SELECT src AS seed FROM edges GROUP BY 1
      ORDER BY CAST(SUM(c) AS BIGINT) DESC, src ASC
      LIMIT $BetweennessSeeds)"""

  def betweennessSampled(spark: SparkSession, dir: String): DataFrame = {
    val (edges, seeds) = strongSeededGraph(spark, dir)
    // forward: one checkpointed frame PER LEVEL; the visited set is a
    // lazy union of those (each a truncated-lineage scan), never
    // re-materialized — the old per-round checkpoint(vis ∪ frontier)
    // paid an extra eager job per level to rewrite rows already
    // checkpointed in the levels themselves (guide §2.4: the union
    // carries no new data, so materializing it buys nothing)
    val levels = scala.collection.mutable.ArrayBuffer(
      checkpoint(seeds.select(col("seed"), col("seed").as("node"),
        lit(0).as("dist"), lit(1L).as("sigma"))))
    for (i <- 1 to BetweennessDepth) {
      val vis = levels.reduce(_ unionByName _)
      val fresh = edges
        .join(stateHint(levels.last
          .select(col("seed"), col("node").as("src"), col("sigma"))),
          Seq("src"))
        .groupBy(col("seed"), col("dst").as("node"))
        .agg(sum(col("sigma")).as("sigma"))
        .join(stateHint(vis.select(col("seed"), col("node"))),
          Seq("seed", "node"), "left_anti")
        .select(col("seed"), col("node"), lit(i).as("dist"), col("sigma"))
      levels += checkpoint(fresh)
    }
    // level(d) IS the round-d frontier (levels are disjoint by the
    // anti-join), so the backward pass reads each level's own frame
    // instead of filtering the full visited union
    def level(d: Int): DataFrame = levels(d)
    // backward: δ per level, deepest first; dist-Depth nodes are leaves
    // of the bounded DAG, δ = 0 by the cap's contract
    var delta = level(BetweennessDepth)
      .select(col("seed"), col("node"), lit(0L).as("delta"))
    val perLevel = scala.collection.mutable.ArrayBuffer(delta)
    for (d <- (BetweennessDepth - 1) to 1 by -1) {
      val up = level(d + 1)
        .join(delta, Seq("seed", "node"))
        .select(col("seed"), col("node").as("dst"),
          col("sigma").as("sigma_w"), col("delta").as("delta_w"))
      val contrib = edges.select(col("src"), col("dst"))
        .join(stateHint(up), Seq("dst"))
        .join(stateHint(level(d).select(col("seed"), col("node").as("src"),
          col("sigma").as("sigma_v"))), Seq("seed", "src"))
        .select(col("seed"), col("src").as("node"),
          expr(s"(CAST(sigma_v AS DECIMAL(38,0)) * ($BetweennessScale + "
            + "delta_w)) div sigma_w").as("dc"))
        .groupBy(col("seed"), col("node")).agg(sum(col("dc")).as("delta"))
      delta = level(d).select(col("seed"), col("node"))
        .join(stateHint(contrib), Seq("seed", "node"), "left")
        .select(col("seed"), col("node"),
          coalesce(col("delta"), lit(0L)).as("delta"))
      delta = checkpoint(delta)
      perLevel += delta
    }
    perLevel.reduce(_ unionByName _)
      // the declared contract is NON-SEED nodes: a seed can enter
      // another seed's BFS at dist>=1 (the per-seed anti-join only
      // excludes it from its own), so the seed set is anti-joined out
      // here — 5 rows, broadcast, mirrored in the oracle's NOT IN
      .join(stateHint(seeds.select(col("seed").as("node"))),
        Seq("node"), "left_anti")
      .groupBy(col("node").as("supp_key"))
      .agg(sum(col("delta")).as("bc_x1e9"), count(lit(1)).as("n_seeds"))
      .orderBy(col("bc_x1e9").desc, col("supp_key").asc)
      .limit(20)
  }

  val betweennessSampledOracle: String = {
    // MATERIALIZED is load-bearing (the kcore/hits oracle rule): f_i
    // references v_{i-1} twice (frontier join + NOT EXISTS) and v_i
    // unions it again — plain CTEs inline, so v4 would expand to ~3⁴
    // copies of the whole chain and the del CTEs multiply that by 7;
    // DuckDB then re-opens lineitem.parquet hundreds of times and dies
    // on fd exhaustion before it even mis-plans.
    val forward = (1 to BetweennessDepth).map { i =>
      s"""f$i AS MATERIALIZED (
      SELECT v.seed, e.dst AS node, $i AS dist,
        CAST(SUM(v.sigma) AS BIGINT) AS sigma
      FROM edges e JOIN v${i - 1} v ON e.src = v.node AND v.dist = ${i - 1}
      WHERE NOT EXISTS (SELECT 1 FROM v${i - 1} x
                        WHERE x.seed = v.seed AND x.node = e.dst)
      GROUP BY 1, 2),
    v$i AS MATERIALIZED (SELECT * FROM v${i - 1} UNION ALL SELECT * FROM f$i)"""
    }.mkString(",\n    ")
    val vAll = s"v$BetweennessDepth"
    val backward = ((BetweennessDepth - 1) to 1 by -1).map { d =>
      s"""del$d AS MATERIALIZED (
      SELECT v.seed, v.node,
        CAST(COALESCE(SUM((CAST(v.sigma AS HUGEINT)
          * ($BetweennessScale + dd.delta)) // w.sigma), 0) AS BIGINT)
          AS delta
      FROM (SELECT * FROM $vAll WHERE dist = $d) v
      LEFT JOIN edges e ON e.src = v.node
      LEFT JOIN (SELECT * FROM $vAll WHERE dist = ${d + 1}) w
        ON w.seed = v.seed AND w.node = e.dst
      LEFT JOIN del${d + 1} dd ON dd.seed = w.seed AND dd.node = w.node
      GROUP BY 1, 2)"""
    }.mkString(",\n    ")
    val unions = ((BetweennessDepth - 1) to 1 by -1)
      .map(d => s"SELECT seed, node, delta FROM del$d")
      .mkString("\n      UNION ALL ")
    s"""
    WITH $strongSeededGraphSql,
    v0 AS MATERIALIZED (
      SELECT seed, seed AS node, 0 AS dist, CAST(1 AS BIGINT) AS sigma
      FROM seeds),
    $forward,
    del$BetweennessDepth AS MATERIALIZED (
      SELECT seed, node, CAST(0 AS BIGINT) AS delta
      FROM $vAll WHERE dist = $BetweennessDepth),
    $backward,
    alldel AS (
      SELECT seed, node, delta FROM del$BetweennessDepth
      UNION ALL $unions)
    SELECT node AS supp_key,
      CAST(SUM(delta) AS BIGINT) AS bc_x1e9,
      CAST(COUNT(*) AS BIGINT) AS n_seeds
    FROM alldel WHERE node NOT IN (SELECT seed FROM seeds)
    GROUP BY 1
    ORDER BY bc_x1e9 DESC, supp_key ASC LIMIT 20"""
  }

  /** Sampled harmonic closeness — the ACCESS member of the seeded
    * centrality family ([[betweennessSampled]] measures brokerage,
    * degree/pagerank/HITS endpoint influence; closeness measures how
    * quickly a node can be REACHED — neo4j GDS ships it beside
    * betweenness, ideas §2's influence panel). Harmonic form (Marchiori
    * & Latora 2000) because it is the one that stays well-defined under
    * both the depth cap and disconnection: H(v) = Σ_{s: d(s,v) ≤ 4}
    * 1/d(s,v) over the seed sample, folded as exact integer ppm
    * (1 000 000 div d — order-free BIGINT sums, no FP anywhere).
    *
    * Rides [[strongSeededGraph]] and the same level-synchronous BFS as
    * betweenness's forward pass, WITHOUT the σ bookkeeping (min-hop
    * distance is all closeness needs): 4 rounds, edges never
    * reshuffled, per-round state broadcast. Output: top-20 reached
    * non-seed nodes by harmonic mass (ties → key asc) with the seed
    * count and total distance — non-vacuous wherever the strong graph
    * has one edge.
    */
  def closenessSampled(spark: SparkSession, dir: String): DataFrame = {
    val (edges, seeds) = strongSeededGraph(spark, dir)
    // betweennessSampled's per-level checkpoint discipline: the visited
    // set stays a lazy union of the checkpointed levels
    val levels = scala.collection.mutable.ArrayBuffer(
      checkpoint(seeds.select(col("seed"), col("seed").as("node"),
        lit(0).as("dist"))))
    for (i <- 1 to BetweennessDepth) {
      val vis = levels.reduce(_ unionByName _)
      val fresh = edges.select(col("src"), col("dst"))
        .join(stateHint(levels.last
          .select(col("seed"), col("node").as("src"))), Seq("src"))
        .select(col("seed"), col("dst").as("node")).distinct()
        .join(stateHint(vis.select(col("seed"), col("node"))),
          Seq("seed", "node"), "left_anti")
        .withColumn("dist", lit(i))
      levels += checkpoint(fresh)
    }
    levels.reduce(_ unionByName _).filter(col("dist") >= 1)
      // same non-seed contract as betweennessSampled: seeds reached by
      // OTHER seeds' BFS are anti-joined out (broadcast, 5 rows)
      .join(stateHint(seeds.select(col("seed").as("node"))),
        Seq("node"), "left_anti")
      .groupBy(col("node").as("supp_key"))
      .agg(count(lit(1)).as("n_seeds"),
        sum(col("dist").cast("bigint")).as("sum_dist"),
        sum(expr("1000000 div CAST(dist AS BIGINT)")).as("harmonic_x1e6"))
      .orderBy(col("harmonic_x1e6").desc, col("supp_key").asc)
      .limit(20)
  }

  val closenessSampledOracle: String = {
    val rounds = (1 to BetweennessDepth).map { i =>
      s"""c$i AS MATERIALIZED (
      SELECT * FROM c${i - 1}
      UNION ALL
      SELECT seed, node, $i AS dist FROM (
        SELECT DISTINCT v.seed, e.dst AS node
        FROM edges e JOIN c${i - 1} v
          ON e.src = v.node AND v.dist = ${i - 1}) f
      WHERE NOT EXISTS (SELECT 1 FROM c${i - 1} x
                        WHERE x.seed = f.seed AND x.node = f.node))"""
    }.mkString(",\n    ")
    s"""
    WITH $strongSeededGraphSql,
    c0 AS MATERIALIZED (SELECT seed, seed AS node, 0 AS dist FROM seeds),
    $rounds
    SELECT node AS supp_key,
      COUNT(*) AS n_seeds,
      CAST(SUM(dist) AS BIGINT) AS sum_dist,
      CAST(SUM(1000000 // CAST(dist AS BIGINT)) AS BIGINT) AS harmonic_x1e6
    FROM c$BetweennessDepth
    WHERE dist >= 1 AND node NOT IN (SELECT seed FROM seeds)
    GROUP BY 1
    ORDER BY harmonic_x1e6 DESC, supp_key ASC LIMIT 20"""
  }

  /** One-level Louvain refinement (Blondel et al. 2008 phase 1, one
    * sweep) over [[Analytics.labelPropagation]]'s partition — the
    * modularity-GAIN move pass LPA itself never makes (LPA chases
    * neighbor-label mass, which optimizes nothing; Louvain moves a node
    * only when Newman modularity strictly increases). Internals shared
    * with [[louvainRefine]]; returns (LPA labels, refined labels,
    * accepted moves) for the spec.
    *
    * The move rule is PARALLEL yet exactly non-decreasing — the usual
    * distributed-Louvain hazard (two simultaneous movers interfering
    * can LOWER Q) is excluded by construction rather than by damping:
    * each node takes its best strictly-positive-gain target
    * (gain DESC, target ASC), and a candidate is accepted only if it
    * beats — under the total order (gain DESC, node ASC) — every
    * conflicting candidate, where candidates conflict when they are
    * ADJACENT or touch a COMMON community (source or target). Accepted
    * movers are therefore pairwise non-adjacent and community-disjoint,
    * so their ΔQ terms edit disjoint {in_c, deg_c} entries and the
    * total modularity change is EXACTLY Σ gain_x4m2 / 4m² — an integer
    * identity R15OpsSpec asserts, which is what makes the non-decrease
    * a theorem instead of an empirical pin. Rejected-by-rejected
    * candidates are dropped too (conservative, still non-decreasing).
    *
    * All gains are exact BIGINTs: gain·4m² = 4m(w_iT − w_iA) −
    * 2k_i(Σ_T − Σ_A + k_i) with integer edge weights (headroom: |gain|
    * ≤ 8m², exact to m ≈ 1e9 — the strong graph's total weight, tiny
    * next to the corpus).
    *
    * Scale: one edge-list shuffle builds the labeled pair list (then
    * checkpointed); strengths/community weights/candidates are
    * node-scale aggregates with the label vector broadcast
    * ([[stateHint]]); conflicts join candidates on shared-community
    * keys and the strong edge list — never an unkeyed pair join.
    */
  private[graft] def louvainParts(spark: SparkSession, dir: String)
      : (DataFrame, DataFrame, DataFrame, DataFrame) = {
    val (strongPairs, labels0) = Analytics.lpaCore(spark, dir)
    val comm = checkpoint(labels0)
    val pairs = strongPairs
      .select(col("supp_a"), col("supp_b"), col("collab_count").as("w"))
    val jj = checkpoint(pairs
      .join(stateHint(comm.select(col("supp_key").as("supp_a"),
        col("community").as("ca"))), Seq("supp_a"))
      .join(stateHint(comm.select(col("supp_key").as("supp_b"),
        col("community").as("cb"))), Seq("supp_b")))
    val mTot = jj.agg(sum(col("w")).as("m"))
    val ed = jj.select(col("supp_a").as("node"), col("ca").as("a"),
        col("cb").as("cnbr"), col("w"))
      .unionByName(jj.select(col("supp_b").as("node"), col("cb").as("a"),
        col("ca").as("cnbr"), col("w")))
    // node strength k_i and own community (label-INDEPENDENT strength —
    // reused by both modularity sums below)
    val strength = checkpoint(ed.groupBy(col("node"))
      .agg(sum(col("w")).as("k"), max(col("a")).as("a")))
    val degC = checkpoint(strength.groupBy(col("a"))
      .agg(sum(col("k")).as("deg_w")).select(col("a").as("c"), col("deg_w")))
    val wnc = checkpoint(ed.groupBy(col("node"), col("cnbr"))
      .agg(sum(col("w")).as("w_nc")))
    val base = strength
      .join(wnc.join(stateHint(strength.select(col("node"),
          col("a").as("cnbr"))), Seq("node", "cnbr"))
        .select(col("node"), col("w_nc").as("w_own")), Seq("node"), "left")
      .select(col("node"), col("a"), col("k"),
        coalesce(col("w_own"), lit(0L)).as("w_own"))
    // best positive-gain target as a struct-MIN aggregate, not a
    // row_number window (the Lloyd/LPA r16 shape): min(struct(−gain,
    // cnbr, …)) is the window's (gain DESC, cnbr ASC) total order —
    // (node, cnbr) is unique by wnc's grouping, so the riding fields
    // (a, k, gain) never decide — and the candidates collapse map-side
    // instead of sorting per node behind an extra exchange.
    val cand = checkpoint(base
      .join(wnc, Seq("node"))
      .filter(col("cnbr") =!= col("a"))
      .join(stateHint(degC.select(col("c").as("cnbr"),
        col("deg_w").as("deg_t"))), Seq("cnbr"))
      .join(stateHint(degC.select(col("c").as("a"),
        col("deg_w").as("deg_a"))), Seq("a"))
      .crossJoin(broadcast(mTot))
      .withColumn("gain_x4m2",
        lit(4L) * col("m") * (col("w_nc") - col("w_own"))
          - lit(2L) * col("k") * (col("deg_t") - col("deg_a") + col("k")))
      .filter(col("gain_x4m2") > 0)
      .groupBy(col("node"))
      .agg(min(struct((-col("gain_x4m2")).as("ng"), col("cnbr"), col("a"),
        col("k"), col("gain_x4m2").as("g"))).as("__m"))
      .select(col("node"), col("__m.a").as("a"), col("__m.cnbr").as("t"),
        col("__m.k").as("k"), col("__m.g").as("gain_x4m2")))
    val byComm = cand.select(col("node"), col("gain_x4m2"),
      explode(array(col("a"), col("t"))).as("cc"))
    val commConf = byComm
      .join(byComm.select(col("cc"), col("node").as("o_node"),
        col("gain_x4m2").as("o_gain")), Seq("cc"))
      .filter(col("o_node") =!= col("node"))
      .select(col("node"), col("gain_x4m2"), col("o_node"), col("o_gain"))
    val adjConf = pairs
      .select(col("supp_a").as("node"), col("supp_b").as("o_node"))
      .unionByName(pairs.select(col("supp_b").as("node"),
        col("supp_a").as("o_node")))
      .join(cand.select(col("node"), col("gain_x4m2")), Seq("node"))
      .join(cand.select(col("node").as("o_node"),
        col("gain_x4m2").as("o_gain")), Seq("o_node"))
      .select(col("node"), col("gain_x4m2"), col("o_node"), col("o_gain"))
    val rejected = commConf.unionByName(adjConf)
      .filter(col("o_gain") > col("gain_x4m2")
        || (col("o_gain") === col("gain_x4m2") && col("o_node") < col("node")))
      .select(col("node")).distinct()
    val accepted = checkpoint(cand.join(rejected, Seq("node"), "left_anti"))
    val comm2 = checkpoint(comm
      .join(stateHint(accepted.select(col("node").as("supp_key"), col("t"))),
        Seq("supp_key"), "left")
      .select(col("supp_key"),
        coalesce(col("t"), col("community")).as("community")))
    (pairs, comm, comm2, accepted)
  }

  /** The refinement verdict in one row: population and candidate/move
    * counts, the exact summed gain, and both partitions' modularity —
    * numerators in the shared 4m² units plus the floor'd ppm. With the
    * strong graph near-locally-optimal under LPA, n_moves can
    * legitimately be 0 (the row still reports the full scoreboard —
    * never an empty result). See [[louvainParts]] for the move rule and
    * the exactness argument; q_refined_num − q_lpa_num ≡ sum_gain_x4m2.
    */
  def louvainRefine(spark: SparkSession, dir: String): DataFrame = {
    val (pairs, comm, comm2, accepted) = louvainParts(spark, dir)
    val mTot = pairs.agg(sum(col("w")).as("m"))
    val strength = pairs
      .select(col("supp_a").as("node"), col("w"))
      .unionByName(pairs.select(col("supp_b").as("node"), col("w")))
      .groupBy(col("node")).agg(sum(col("w")).as("k"))
      .transform(checkpoint)
    def qOf(labels: DataFrame): DataFrame = {
      val jq = pairs
        .join(stateHint(labels.select(col("supp_key").as("supp_a"),
          col("community").as("ca"))), Seq("supp_a"))
        .join(stateHint(labels.select(col("supp_key").as("supp_b"),
          col("community").as("cb"))), Seq("supp_b"))
      val inW = jq.filter(col("ca") === col("cb"))
        .groupBy(col("ca").as("c")).agg(sum(col("w")).as("in_w"))
      val dC = strength
        .join(stateHint(labels.select(col("supp_key").as("node"),
          col("community").as("c"))), Seq("node"))
        .groupBy(col("c")).agg(sum(col("k")).as("deg_w"))
      dC.join(inW, Seq("c"), "left").crossJoin(broadcast(mTot))
        .agg(count(lit(1)).as("n_comm"),
          sum(lit(4L) * col("m") * coalesce(col("in_w"), lit(0L))
            - col("deg_w") * col("deg_w")).as("q_num"))
    }
    comm.agg(count(lit(1)).as("n_nodes"))
      .crossJoin(broadcast(qOf(comm)
        .select(col("n_comm").as("n_communities_lpa"),
          col("q_num").as("q_lpa_num"))))
      .crossJoin(broadcast(qOf(comm2)
        .select(col("n_comm").as("n_communities_refined"),
          col("q_num").as("q_refined_num"))))
      .crossJoin(broadcast(accepted
        .agg(count(lit(1)).as("n_moves"),
          coalesce(sum(col("gain_x4m2")), lit(0L)).as("sum_gain_x4m2"))))
      .crossJoin(broadcast(mTot
        .select((lit(4L) * col("m") * col("m")).as("q_den"))))
      .select(col("n_nodes"), col("n_communities_lpa"),
        col("n_communities_refined"), col("n_moves"), col("sum_gain_x4m2"),
        col("q_lpa_num"), col("q_refined_num"), col("q_den"),
        floor(col("q_lpa_num").cast("double") * lit(1.0e6)
          / col("q_den").cast("double")).cast("bigint").as("q_lpa_ppm"),
        floor(col("q_refined_num").cast("double") * lit(1.0e6)
          / col("q_den").cast("double")).cast("bigint").as("q_refined_ppm"))
  }

  /** Number of super-graph contraction levels [[louvainMultilevel]]
    * runs after the one-level sweep — FIXED (not until-converged) so
    * the DuckDB oracle can unroll the identical computation; a level
    * past convergence is a no-op in both engines (no positive-gain
    * candidate exists), and the output's `converged` flag (last level
    * accepted zero moves) makes an under-provisioned unroll VISIBLE in
    * the hash-compared row rather than silently truncating — the spec
    * pins converged=true at every SF.
    */
  private val LouvainLevels = 3

  /** Exact modularity numerator (4m² units) + community count of a
    * labeling over the strong pair graph — the qOf pattern from
    * [[louvainRefine]] shared with the multilevel form. `strength` is
    * the node-strength frame (node, k) computed once from the pairs.
    */
  private def qNumOf(pairs: DataFrame, strength: DataFrame,
      labels: DataFrame, mTot: DataFrame): DataFrame = {
    val jq = pairs
      .join(stateHint(labels.select(col("supp_key").as("supp_a"),
        col("community").as("ca"))), Seq("supp_a"))
      .join(stateHint(labels.select(col("supp_key").as("supp_b"),
        col("community").as("cb"))), Seq("supp_b"))
    val inW = jq.filter(col("ca") === col("cb"))
      .groupBy(col("ca").as("c")).agg(sum(col("w")).as("in_w"))
    val dC = strength
      .join(stateHint(labels.select(col("supp_key").as("node"),
        col("community").as("c"))), Seq("node"))
      .groupBy(col("c")).agg(sum(col("k")).as("deg_w"))
    dC.join(inW, Seq("c"), "left").crossJoin(broadcast(mTot))
      .agg(count(lit(1)).as("n_comm"),
        sum(lit(4L) * col("m") * coalesce(col("in_w"), lit(0L))
          - col("deg_w") * col("deg_w")).as("q_num"))
  }

  /** Full multi-level Louvain (Blondel et al. 2008, both phases):
    * [[louvainParts]]' conflict-free one-level sweep, then
    * [[LouvainLevels]] rounds of phase 2 — aggregate the current
    * communities into a SUPER-GRAPH (inter-community edge weights +
    * intra-community self-weights) and re-run the same parallel
    * positive-gain move pass over super-nodes, which moves WHOLE
    * communities at once (the escape hatch node-local sweeps lack).
    *
    * The super-level gain algebra collapses beautifully because each
    * super-node starts in its own singleton community: moving super-node
    * u into neighbor v's community changes modularity by exactly
    * gain·4m² = 4m·w_uv − 2·k_u·k_v, with k the super-strength
    * (incident inter weight + 2× self weight — intra edges count twice
    * in a community's degree mass) and m the ORIGINAL graph's total
    * weight, invariant across levels. The gain is symmetric in (u, v),
    * so a u↔v swap pair always conflicts via their shared edge and the
    * (gain DESC, node ASC) total order keeps exactly one — the same
    * conflict-freedom construction as level 0, hence the same theorem:
    * accepted movers edit disjoint {in_c, deg_c} entries and
    * q_final_num − q_l0_num ≡ Σ accepted gain_x4m2 over all levels, an
    * exact BIGINT identity the spec asserts.
    *
    * Scale: each contraction SHRINKS the graph (nodes = communities),
    * so level cost is monotonically decreasing; every join is on the
    * community-keyed state frames with [[stateHint]] broadcasts, the
    * original pair list shuffles once per level for the re-labeling
    * aggregate, and the per-level move tally is a one-row aggregate.
    */
  def louvainMultilevel(spark: SparkSession, dir: String): DataFrame = {
    val (pairs0, comm, comm2, _) = louvainParts(spark, dir)
    louvainMultilevelCore(spark, pairs0, comm, comm2)
  }

  /** [[louvainMultilevel]] over an arbitrary weighted pair graph
    * (supp_a, supp_b, w) and initial labelings — the form the spec
    * drives with a constructed graph whose optimum NEEDS whole-community
    * moves (the lake's strong graph is already LPA-optimal, so the
    * registered face legitimately reports zero moves there; the spec is
    * where the contraction machinery is proven live).
    */
  private[graft] def louvainMultilevelCore(spark: SparkSession,
      pairs0: DataFrame, comm: DataFrame, comm2: DataFrame): DataFrame = {
    val pairs = checkpoint(pairs0)
    val mTot = pairs.agg(sum(col("w")).as("m"))
    val strength = pairs
      .select(col("supp_a").as("node"), col("w"))
      .unionByName(pairs.select(col("supp_b").as("node"), col("w")))
      .groupBy(col("node")).agg(sum(col("w")).as("k"))
      .transform(checkpoint)
    var labels = comm2
    val perLevel = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    for (_ <- 1 to LouvainLevels) {
      val j = pairs
        .join(stateHint(labels.select(col("supp_key").as("supp_a"),
          col("community").as("ca"))), Seq("supp_a"))
        .join(stateHint(labels.select(col("supp_key").as("supp_b"),
          col("community").as("cb"))), Seq("supp_b"))
      val inter = checkpoint(j.filter(col("ca") =!= col("cb"))
        .select(least(col("ca"), col("cb")).as("cu"),
          greatest(col("ca"), col("cb")).as("cv"), col("w"))
        .groupBy(col("cu"), col("cv")).agg(sum(col("w")).as("w")))
      val selfW = j.filter(col("ca") === col("cb"))
        .groupBy(col("ca").as("c")).agg(sum(col("w")).as("s"))
      val kk = checkpoint(inter.select(col("cu").as("c"), col("w"))
        .unionByName(inter.select(col("cv").as("c"), col("w")))
        .unionByName(selfW.select(col("c"), (col("s") * 2).as("w")))
        .groupBy(col("c")).agg(sum(col("w")).as("k")))
      val cd = inter
        .join(stateHint(kk.select(col("c").as("cu"), col("k").as("ku"))),
          Seq("cu"))
        .join(stateHint(kk.select(col("c").as("cv"), col("k").as("kv"))),
          Seq("cv"))
        .crossJoin(broadcast(mTot))
        .withColumn("gain_x4m2",
          lit(4L) * col("m") * col("w") - lit(2L) * col("ku") * col("kv"))
        .filter(col("gain_x4m2") > 0)
      val candBoth = cd
        .select(col("cu").as("node"), col("cv").as("t"), col("gain_x4m2"))
        .unionByName(
          cd.select(col("cv").as("node"), col("cu").as("t"), col("gain_x4m2")))
      // struct-MIN argmax (louvainParts' r16 shape): same (gain DESC,
      // t ASC) total order, map-side collapse instead of a window sort;
      // (node, t) is unique by inter's (cu, cv) grouping.
      val cand = checkpoint(candBoth
        .groupBy(col("node"))
        .agg(min(struct((-col("gain_x4m2")).as("ng"), col("t"),
          col("gain_x4m2").as("g"))).as("__m"))
        .select(col("node"), col("__m.t").as("t"),
          col("__m.g").as("gain_x4m2")))
      val byComm = cand.select(col("node"), col("gain_x4m2"),
        explode(array(col("node"), col("t"))).as("cc"))
      val commConf = byComm
        .join(byComm.select(col("cc"), col("node").as("o_node"),
          col("gain_x4m2").as("o_gain")), Seq("cc"))
        .filter(col("o_node") =!= col("node"))
        .select(col("node"), col("gain_x4m2"), col("o_node"), col("o_gain"))
      val adjConf = inter
        .select(col("cu").as("node"), col("cv").as("o_node"))
        .unionByName(inter.select(col("cv").as("node"), col("cu").as("o_node")))
        .join(cand.select(col("node"), col("gain_x4m2")), Seq("node"))
        .join(cand.select(col("node").as("o_node"),
          col("gain_x4m2").as("o_gain")), Seq("o_node"))
        .select(col("node"), col("gain_x4m2"), col("o_node"), col("o_gain"))
      val rejected = commConf.unionByName(adjConf)
        .filter(col("o_gain") > col("gain_x4m2")
          || (col("o_gain") === col("gain_x4m2")
            && col("o_node") < col("node")))
        .select(col("node")).distinct()
      val accepted = checkpoint(cand.join(rejected, Seq("node"), "left_anti"))
      val st = accepted.agg(count(lit(1)).as("n"),
        coalesce(sum(col("gain_x4m2")), lit(0L)).as("g")).head()
      perLevel += ((st.getAs[Long]("n"), st.getAs[Long]("g")))
      labels = checkpoint(labels
        .join(stateHint(accepted.select(col("node").as("community"),
          col("t"))), Seq("community"), "left")
        .select(col("supp_key"),
          coalesce(col("t"), col("community")).as("community")))
    }
    val moveCols = perLevel.zipWithIndex.map { case ((n, _), i) =>
      lit(n).as(s"n_moves_l${i + 1}")
    }
    val sumGain = perLevel.map(_._2).sum
    comm.agg(count(lit(1)).as("n_nodes"))
      .select(col("n_nodes") +: moveCols.toSeq: _*)
      .withColumn("sum_gain_levels", lit(sumGain))
      .withColumn("converged", lit(perLevel.last._1 == 0L))
      .crossJoin(broadcast(qNumOf(pairs, strength, comm2, mTot)
        .select(col("q_num").as("q_l0_num"))))
      .crossJoin(broadcast(qNumOf(pairs, strength, labels, mTot)
        .select(col("n_comm").as("n_communities_final"),
          col("q_num").as("q_final_num"))))
      .crossJoin(broadcast(mTot
        .select((lit(4L) * col("m") * col("m")).as("q_den"))))
      .select(col("n_nodes"), col("n_moves_l1"), col("n_moves_l2"),
        col("n_moves_l3"), col("sum_gain_levels"), col("converged"),
        col("n_communities_final"), col("q_l0_num"), col("q_final_num"),
        col("q_den"),
        floor(col("q_final_num").cast("double") * lit(1.0e6)
          / col("q_den").cast("double")).cast("bigint").as("q_final_ppm"))
  }

  /** Modularity CTE triple (in-weight, community degree, q numerator)
    * over labeling CTE `rel` — shared by [[louvainRefineOracle]] and
    * [[louvainMultilevelOracle]]; requires the base CTEs `sp`, `lvstr`,
    * `mt` in scope.
    */
  private def louvainQCtes(rel: String, s: String): String = s"""
    inw$s AS (
      SELECT x.community AS c, CAST(SUM(sp.w) AS BIGINT) AS in_w
      FROM sp JOIN $rel x ON sp.supp_a = x.supp_key
        JOIN $rel y ON sp.supp_b = y.supp_key
      WHERE x.community = y.community GROUP BY 1),
    degq$s AS (
      SELECT l.community AS c, CAST(SUM(s.k) AS BIGINT) AS deg_w
      FROM lvstr s JOIN $rel l ON s.node = l.supp_key GROUP BY 1),
    q$s AS (
      SELECT COUNT(*) AS n_comm,
        CAST(SUM(4 * mt.m * COALESCE(i.in_w, 0) - d.deg_w * d.deg_w)
          AS BIGINT) AS q_num
      FROM degq$s d LEFT JOIN inw$s i ON d.c = i.c CROSS JOIN mt)"""

  val louvainRefineOracle: String = {
    def qCtes(rel: String, s: String): String = louvainQCtes(rel, s)
    val gain = "4 * mt.m * (wn.w_nc - b.w_own) " +
      "- 2 * b.k * (dt.deg_w - da.deg_w + b.k)"
    s"""
    WITH comm AS MATERIALIZED (${Analytics.labelPropagationOracle}),
    sp AS MATERIALIZED (
      WITH e0 AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem)
      SELECT a.l_suppkey AS supp_a, b.l_suppkey AS supp_b, COUNT(*) AS w
      FROM e0 a JOIN e0 b
        ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
      GROUP BY 1, 2
      HAVING COUNT(*) >= ${Analytics.StrongEdgeThreshold}),
    jj AS MATERIALIZED (
      SELECT sp.supp_a, sp.supp_b, sp.w, x.community AS ca, y.community AS cb
      FROM sp JOIN comm x ON sp.supp_a = x.supp_key
        JOIN comm y ON sp.supp_b = y.supp_key),
    mt AS (SELECT CAST(SUM(w) AS BIGINT) AS m FROM jj),
    ed AS MATERIALIZED (
      SELECT supp_a AS node, ca AS a, cb AS cnbr, w FROM jj
      UNION ALL SELECT supp_b, cb, ca, w FROM jj),
    lvstr AS MATERIALIZED (
      SELECT node, CAST(SUM(w) AS BIGINT) AS k, MAX(a) AS a
      FROM ed GROUP BY 1),
    degc AS MATERIALIZED (
      SELECT a AS c, CAST(SUM(k) AS BIGINT) AS deg_w FROM lvstr GROUP BY 1),
    wnc AS MATERIALIZED (
      SELECT node, cnbr, CAST(SUM(w) AS BIGINT) AS w_nc
      FROM ed GROUP BY 1, 2),
    base AS MATERIALIZED (
      SELECT s.node, s.a, s.k, COALESCE(o.w_nc, 0) AS w_own
      FROM lvstr s LEFT JOIN wnc o ON o.node = s.node AND o.cnbr = s.a),
    cand AS MATERIALIZED (
      SELECT node, a, t, k, gain_x4m2 FROM (
        SELECT b.node, b.a, wn.cnbr AS t, b.k, $gain AS gain_x4m2,
          ROW_NUMBER() OVER (PARTITION BY b.node
            ORDER BY ($gain) DESC, wn.cnbr ASC) AS rn
        FROM base b
        JOIN wnc wn ON wn.node = b.node AND wn.cnbr <> b.a
        JOIN degc dt ON dt.c = wn.cnbr
        JOIN degc da ON da.c = b.a
        CROSS JOIN mt
        WHERE $gain > 0)
      WHERE rn = 1),
    conf AS (
      SELECT x.node, x.gain_x4m2, y.node AS o_node, y.gain_x4m2 AS o_gain
      FROM (SELECT node, gain_x4m2, UNNEST([a, t]) AS cc FROM cand) x
      JOIN (SELECT node, gain_x4m2, UNNEST([a, t]) AS cc FROM cand) y
        ON x.cc = y.cc AND x.node <> y.node
      UNION ALL
      SELECT c1.node, c1.gain_x4m2, c2.node, c2.gain_x4m2
      FROM (SELECT supp_a AS u, supp_b AS v FROM sp
            UNION ALL SELECT supp_b, supp_a FROM sp) e
      JOIN cand c1 ON c1.node = e.u JOIN cand c2 ON c2.node = e.v),
    rejected AS (
      SELECT DISTINCT node FROM conf
      WHERE o_gain > gain_x4m2
        OR (o_gain = gain_x4m2 AND o_node < node)),
    accepted AS MATERIALIZED (
      SELECT * FROM cand WHERE node NOT IN (SELECT node FROM rejected)),
    comm2 AS MATERIALIZED (
      SELECT c.supp_key, COALESCE(a.t, c.community) AS community
      FROM comm c LEFT JOIN accepted a ON a.node = c.supp_key),
    ${qCtes("comm", "1")},
    ${qCtes("comm2", "2")},
    mv AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_moves,
        CAST(COALESCE(SUM(gain_x4m2), 0) AS BIGINT) AS sum_gain_x4m2
      FROM accepted)
    SELECT (SELECT COUNT(*) FROM comm) AS n_nodes,
      q1.n_comm AS n_communities_lpa,
      q2.n_comm AS n_communities_refined,
      mv.n_moves, mv.sum_gain_x4m2,
      q1.q_num AS q_lpa_num, q2.q_num AS q_refined_num,
      4 * mt.m * mt.m AS q_den,
      CAST(FLOOR(CAST(q1.q_num AS DOUBLE) * 1.0e6
        / CAST(4 * mt.m * mt.m AS DOUBLE)) AS BIGINT) AS q_lpa_ppm,
      CAST(FLOOR(CAST(q2.q_num AS DOUBLE) * 1.0e6
        / CAST(4 * mt.m * mt.m AS DOUBLE)) AS BIGINT) AS q_refined_ppm
    FROM q1 CROSS JOIN q2 CROSS JOIN mv CROSS JOIN mt"""
  }

  /** One super-graph contraction + conflict-free singleton-community
    * move pass, DuckDB spelling — level `l` reads labeling CTE
    * `lab{l-1}` (level 1 reads `comm2`) and emits `lab$l`. Mirrors
    * [[louvainMultilevel]]'s loop body term for term.
    */
  private def louvainLevelCtes(l: Int): String = {
    val prev = if (l == 1) "comm2" else s"lab${l - 1}"
    s"""inter$l AS MATERIALIZED (
      SELECT LEAST(x.community, y.community) AS cu,
        GREATEST(x.community, y.community) AS cv,
        CAST(SUM(sp.w) AS BIGINT) AS w
      FROM sp JOIN $prev x ON sp.supp_a = x.supp_key
        JOIN $prev y ON sp.supp_b = y.supp_key
      WHERE x.community <> y.community GROUP BY 1, 2),
    selfw$l AS (
      SELECT x.community AS c, CAST(SUM(sp.w) AS BIGINT) AS s
      FROM sp JOIN $prev x ON sp.supp_a = x.supp_key
        JOIN $prev y ON sp.supp_b = y.supp_key
      WHERE x.community = y.community GROUP BY 1),
    kk$l AS MATERIALIZED (
      SELECT c, CAST(SUM(w) AS BIGINT) AS k FROM (
        SELECT cu AS c, w FROM inter$l
        UNION ALL SELECT cv, w FROM inter$l
        UNION ALL SELECT c, 2 * s FROM selfw$l) u
      GROUP BY 1),
    cd$l AS MATERIALIZED (
      SELECT i.cu, i.cv,
        4 * mt.m * i.w - 2 * ku.k * kv.k AS gain_x4m2
      FROM inter$l i JOIN kk$l ku ON ku.c = i.cu
        JOIN kk$l kv ON kv.c = i.cv CROSS JOIN mt
      WHERE 4 * mt.m * i.w - 2 * ku.k * kv.k > 0),
    cand$l AS MATERIALIZED (
      SELECT node, t, gain_x4m2 FROM (
        SELECT node, t, gain_x4m2, ROW_NUMBER() OVER (
          PARTITION BY node ORDER BY gain_x4m2 DESC, t ASC) AS rn
        FROM (SELECT cu AS node, cv AS t, gain_x4m2 FROM cd$l
              UNION ALL SELECT cv, cu, gain_x4m2 FROM cd$l) cb) rk
      WHERE rn = 1),
    conf$l AS (
      SELECT x.node, x.gain_x4m2, y.node AS o_node, y.gain_x4m2 AS o_gain
      FROM (SELECT node, gain_x4m2, UNNEST([node, t]) AS cc FROM cand$l) x
      JOIN (SELECT node, gain_x4m2, UNNEST([node, t]) AS cc FROM cand$l) y
        ON x.cc = y.cc AND x.node <> y.node
      UNION ALL
      SELECT c1.node, c1.gain_x4m2, c2.node, c2.gain_x4m2
      FROM (SELECT cu AS u, cv AS v FROM inter$l
            UNION ALL SELECT cv, cu FROM inter$l) e
      JOIN cand$l c1 ON c1.node = e.u JOIN cand$l c2 ON c2.node = e.v),
    acc$l AS MATERIALIZED (
      SELECT * FROM cand$l WHERE node NOT IN (
        SELECT node FROM conf$l
        WHERE o_gain > gain_x4m2
          OR (o_gain = gain_x4m2 AND o_node < node))),
    lab$l AS MATERIALIZED (
      SELECT p.supp_key, COALESCE(a.t, p.community) AS community
      FROM $prev p LEFT JOIN acc$l a ON a.node = p.community)"""
  }

  lazy val louvainMultilevelOracle: String = {
    // louvainRefineOracle's base CTE chain (comm .. comm2), then the
    // unrolled levels and the two modularity passes
    val qStart = louvainRefineOracle.indexOf(louvainQCtes("comm", "1"))
    require(qStart > 0, "louvainMultilevelOracle: base-CTE marker missing")
    val base = louvainRefineOracle
      .substring(louvainRefineOracle.indexOf("WITH ") + 5, qStart)
      .trim.stripSuffix(",")
    val levels = (1 to LouvainLevels).map(louvainLevelCtes).mkString(",\n    ")
    val moveSums = (1 to LouvainLevels)
      .map(l => s"(SELECT CAST(COALESCE(SUM(gain_x4m2), 0) AS BIGINT) " +
        s"FROM acc$l)").mkString(" + ")
    s"""
    WITH $base,
    $levels,
    ${louvainQCtes("comm2", "0")},
    ${louvainQCtes(s"lab$LouvainLevels", "f")}
    SELECT (SELECT COUNT(*) FROM comm) AS n_nodes,
      ${(1 to LouvainLevels).map(l =>
        s"(SELECT CAST(COUNT(*) AS BIGINT) FROM acc$l) AS n_moves_l$l")
        .mkString(",\n      ")},
      $moveSums AS sum_gain_levels,
      (SELECT COUNT(*) FROM acc$LouvainLevels) = 0 AS converged,
      qf.n_comm AS n_communities_final,
      q0.q_num AS q_l0_num,
      qf.q_num AS q_final_num,
      4 * mt.m * mt.m AS q_den,
      CAST(FLOOR(CAST(qf.q_num AS DOUBLE) * 1.0e6
        / CAST(4 * mt.m * mt.m AS DOUBLE)) AS BIGINT) AS q_final_ppm
    FROM q0 CROSS JOIN qf CROSS JOIN mt"""
  }

  def defs: Map[String, QueryDef] = Map(
    "louvain_refine" -> QueryDef.sql(louvainRefine, louvainRefineOracle),
    "louvain_multilevel" ->
      QueryDef.sql(louvainMultilevel, louvainMultilevelOracle),
    "betweenness_sampled" ->
      QueryDef.sql(betweennessSampled, betweennessSampledOracle),
    "closeness_sampled" ->
      QueryDef.sql(closenessSampled, closenessSampledOracle),
    "clustering_coefficient" ->
      QueryDef.sql(clusteringCoefficient, clusteringCoefficientOracle),
    "decayed_popularity" -> QueryDef.sql(decayedPopularity, decayedPopularityOracle),
    "random_walks" -> QueryDef.sql(randomWalks, randomWalksOracle),
    "hits_authority" -> QueryDef.sql(hitsAuthority, hitsAuthorityOracle),
    "graph_assortativity" -> QueryDef.sql(graphAssortativity, graphAssortativityOracle),
    "graph_modularity" -> QueryDef.sql(graphModularity, graphModularityOracle),
    "assoc_rules" -> QueryDef.sql(assocRules, assocRulesOracle)
  )
}
