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

  /** Collaboration graph: pairs of suppliers co-occurring in the same
    * order, with collaboration counts — create_collaboration_graph.cql:1-6
    * (authors co-authoring a publication, COLLABORATED_WITH.count).
    *
    * Scale: distinct (order, supplier) FIRST (collapses multi-lineitem
    * pairs, bounds the per-order set), then a self-equi-join on orderkey —
    * both sides hash-partitioned on the same key, so the pair expansion is
    * local within each partition. Pair blowup is C(k,2) per order, k small.
    */
  def collabPairs(spark: SparkSession, dir: String): DataFrame = {
    val edges = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_suppkey")).distinct()
    val a = edges.as("a")
    val b = edges.as("b")
    a.join(b, col("a.l_orderkey") === col("b.l_orderkey")
        && col("a.l_suppkey") < col("b.l_suppkey"))
      .groupBy(
        col("a.l_suppkey").as("supp_a"),
        col("b.l_suppkey").as("supp_b"))
      .agg(count(lit(1)).as("collab_count"))
  }

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
    counts.join(broadcast(Tables.customer(spark, dir)),
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
    * Topics" (neo4j_analytical_ideas.md §4). Part dim broadcast.
    */
  def topicPopularity(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .join(broadcast(Tables.part(spark, dir)), col("l_partkey") === col("p_partkey"))
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
      .join(broadcast(Tables.part(spark, dir)), col("l_partkey") === col("p_partkey"))
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

  /** Weighted PageRank over the supplier collaboration graph (rows-only:
    * iterative FP accumulation is partition-order dependent, so scores
    * are rounded for stability and checked structurally in specs) — the
    * principled version of "most influential" (neo4j_analytical_ideas.md
    * §2/§5): influence flows through collaboration strength rather than
    * raw degree.
    *
    * Same iteration discipline as dedup_components: tiny graph state,
    * repartitioned small, lineage truncated per round.
    */
  def pagerank(spark: SparkSession, dir: String): DataFrame = {
    val d = 0.85
    val pairs = collabPairs(spark, dir).repartition(4).localCheckpoint(true)
    val edges = pairs.select(col("supp_a").as("src"), col("supp_b").as("dst"),
        col("collab_count").cast("double").as("w"))
      .unionByName(pairs.select(col("supp_b").as("src"), col("supp_a").as("dst"),
        col("collab_count").cast("double").as("w")))
      .localCheckpoint(true)
    val outW = edges.groupBy(col("src")).agg(sum(col("w")).as("out_w"))
      .localCheckpoint(true)
    val nodes = edges.select(col("src").as("node")).distinct().localCheckpoint(true)
    val n = nodes.count().toDouble
    var pr = nodes.withColumn("pr", lit(1.0 / n)).localCheckpoint(true)
    for (_ <- 1 to 10) {
      val contrib = edges
        .join(outW, Seq("src"))
        .join(pr.withColumnRenamed("node", "src"), Seq("src"))
        .select(col("dst").as("node"), (col("pr") * col("w") / col("out_w")).as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("inflow"))
      pr = nodes
        .join(contrib, Seq("node"), "left")
        .select(col("node"),
          (lit((1.0 - d) / n) + lit(d) * coalesce(col("inflow"), lit(0.0))).as("pr"))
        .localCheckpoint(true)
    }
    pr.select(col("node").as("supp_key"), round(col("pr"), 8).as("pagerank"))
      .orderBy(col("pagerank").desc, col("supp_key").asc)
      .limit(20)
  }

  def defs: Map[String, QueryDef] = Map(
    "pagerank" -> QueryDef.rowsOnly(pagerank),
    "collab_pairs" -> QueryDef.sql(collabPairs, collabPairsOracle),
    "top_influential" -> QueryDef.sql(topInfluential, topInfluentialOracle),
    "trends_over_time" -> QueryDef.sql(trendsOverTime, trendsOverTimeOracle),
    "prolific_authors" -> QueryDef.sql(prolificAuthors, prolificAuthorsOracle),
    "topic_popularity" -> QueryDef.sql(topicPopularity, topicPopularityOracle),
    "topic_evolution" -> QueryDef.sql(topicEvolution, topicEvolutionOracle),
    "graph_degree" -> QueryDef.sql(graphDegree, graphDegreeOracle)
  )
}
