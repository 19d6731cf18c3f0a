package graft.operators

import graft.{QueryDef, Tables}
import graft.functions.VectorOps
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding clustering (§2.E): Lloyd's k-means over the embeddings
  * table — the corpus-curation primitive behind topic bucketing,
  * diversity sampling, and IVF coarse quantizers (ann_ivf uses exactly
  * such centroids).
  *
  * Determinism (hash-checked against an unrolled-CTE DuckDB oracle, the
  * same discipline as pagerank):
  *  - distances are dot-product compositions (‖v‖² − 2·v·c + ‖c‖²) of
  *    explicit left folds — bit-identical across engines;
  *  - centroid updates are per-dimension FIXED-POINT means (1e-7 grid):
  *    integer sums are associative, so partition order can't change the
  *    result; the mean is two IEEE divisions;
  *  - centroids are stored as float32 (like any real ANN system), so
  *    each iteration starts from exactly representable values;
  *  - argmin ties break on centroid id through a total-order window.
  *
  * Scale: the classic small-state/big-data shape — k centroids broadcast
  * each round, the corpus is scanned map-side; the only shuffles are the
  * per-vector argmin window and the k×dim partial-aggregated mean. At
  * 100 TB the argmin window would fold into the same one-pass
  * min-by-struct aggregation; the window form is kept because it is
  * portably mirrorable in SQL.
  */
object Clustering {

  private val K = 8
  private val Iters = 3
  /** Fixed-point grid for centroid means: 1e-7 (embeddings are O(1)). */
  private val Fp = 1.0e7

  private def d2(v: Column, c: Column): Column =
    VectorOps.dot(v, v) - lit(2.0) * VectorOps.dot(v, c) + VectorOps.dot(c, c)

  private def sqlD2(v: String, c: String): String =
    s"${VectorOps.sqlDot(v, v)} - CAST(2 AS DOUBLE) * ${VectorOps.sqlDot(v, c)}" +
      s" + ${VectorOps.sqlDot(c, c)}"

  /** Assign each vector to its nearest centroid (ties → smaller cid).
    * Package-private so specs exercise the operator's own assignment
    * rather than re-implementing it.
    */
  private[graft] def assign(e: DataFrame, cents: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("d2").asc, col("cid").asc)
    e.crossJoin(broadcast(cents))
      .withColumn("d2", d2(col("embedding"), col("cv")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("embedding"), col("cid"), col("d2"))
  }

  /** Recompute float32 centroids as fixed-point per-dimension means. */
  private def update(assigned: DataFrame): DataFrame =
    assigned
      .select(col("cid"), posexplode(col("embedding")).as(Seq("pos", "x")))
      .groupBy(col("cid"), col("pos"))
      .agg(
        sum(floor(col("x").cast("double") * lit(Fp) + lit(0.5)).cast("long")).as("sfx"),
        count(lit(1)).as("n"))
      .withColumn("mean",
        ((col("sfx").cast("double") / lit(Fp)) / col("n").cast("double")).cast("float"))
      .groupBy(col("cid"))
      .agg(transform(
        array_sort(collect_list(struct(col("pos"), col("mean")))),
        s => s.getField("mean")).as("cv"))

  /** The k seed centroids: the K smallest vec_ids, cid 0..K−1. */
  private[graft] def seedCentroids(e: DataFrame): DataFrame =
    e.orderBy(col("vec_id")).limit(K)
      .withColumn("cid",
        (row_number().over(Window.orderBy(col("vec_id"))) - 1).cast("int"))
      .select(col("cid"), col("embedding").as("cv"))

  def clusterKmeans(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    var cents = seedCentroids(e).transform(graft.functions.Iterate.checkpoint)
    for (_ <- 1 until Iters)
      cents = update(assign(e, cents)).transform(graft.functions.Iterate.checkpoint)
    assign(e, cents)
      .select(col("vec_id"), col("cid").as("cluster"), col("d2"))
  }

  lazy val clusterKmeansOracle: String = {
    def assignSql(cent: String): String = s"""
      SELECT vec_id, embedding, cid, d2 FROM (
        SELECT e.vec_id, e.embedding, c.cid,
          ${sqlD2("e.embedding", "c.cv")} AS d2,
          ROW_NUMBER() OVER (PARTITION BY e.vec_id
            ORDER BY ${sqlD2("e.embedding", "c.cv")} ASC, c.cid ASC) AS rn
        FROM embeddings e CROSS JOIN $cent c)
      WHERE rn = 1"""
    def centSql(assignRel: String): String = s"""
      SELECT cid,
        ARRAY_AGG(CAST((CAST(sfx AS DOUBLE) / 1.0e7) / CAST(n AS DOUBLE) AS FLOAT)
          ORDER BY pos) AS cv
      FROM (
        SELECT cid, pos, SUM(fx) AS sfx, COUNT(*) AS n FROM (
          SELECT cid,
            UNNEST(RANGE(1, LEN(embedding) + 1)) AS pos,
            UNNEST(LIST_TRANSFORM(embedding,
              x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1.0e7 + 0.5) AS BIGINT))) AS fx
          FROM $assignRel)
        GROUP BY 1, 2)
      GROUP BY 1"""
    val iterCtes = (1 until Iters).map { i =>
      s"""assign$i AS (${assignSql(s"cent${i - 1}")}),
    cent$i AS (${centSql(s"assign$i")})"""
    }.mkString(",\n    ")
    s"""
    WITH cent0 AS (
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT) AS cid,
        embedding AS cv
      FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT $K)),
    $iterCtes
    SELECT vec_id, cid AS cluster, d2
    FROM (${assignSql(s"cent${Iters - 1}")})"""
  }

  def defs: Map[String, QueryDef] = Map(
    "cluster_kmeans" -> QueryDef.sql(clusterKmeans, clusterKmeansOracle)
  )
}
