package graft.operators

import graft.{QueryDef, Tables}
import graft.functions.VectorOps
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the embeddings table (§2.E).
  *
  * Scale design: the brute-force top-k baseline broadcasts the (small)
  * query set against the full corpus — a map-side cross product, no
  * shuffle of the corpus, then a per-query top-k window. The LSH variant
  * buckets vectors by random-hyperplane sign bits so each query probes
  * only its bucket — the 100 TB path (candidates shrink by ~2^planes).
  * Embedding near-dup uses label blocking to bound the pair count.
  */
object Similarity {

  /** Embedding-cosine near-duplicate pairs (threshold 0.3), blocked by
    * label so the pair space is linear-ish per block.
    */
  def dedupEmbedding(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val a = e.select(col("vec_id").as("vec_a"), col("label"), col("embedding").as("ea"))
    val b = e.select(col("vec_id").as("vec_b"), col("label"), col("embedding").as("eb"))
    a.join(b, Seq("label"))
      .filter(col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"), col("label"),
        VectorOps.cosine(col("ea"), col("eb")).as("cosine"))
      .filter(col("cosine") >= 0.3)
  }

  val dedupEmbeddingOracle: String = s"""
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.label,
      ${VectorOps.sqlCosine("a.embedding", "b.embedding")} AS cosine
    FROM embeddings a JOIN embeddings b
      ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE ${VectorOps.sqlCosine("a.embedding", "b.embedding")} >= 0.3"""

  /** Brute-force cosine top-k: for each query vector (vec_id < 10), the
    * 5 nearest neighbors over the whole corpus (excluding self), ranked
    * with a deterministic tiebreak. The correctness baseline for ANN.
    */
  def annTopk(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    val cand = e.select(col("vec_id").as("neighbor_id"), col("embedding").as("ce"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    broadcast(q).join(cand, col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        VectorOps.cosine(col("qe"), col("ce")).as("cosine"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
  }

  val annTopkOracle: String = s"""
    SELECT query_id, neighbor_id, cosine, rank FROM (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        ${VectorOps.sqlCosine("q.embedding", "c.embedding")} AS cosine,
        ROW_NUMBER() OVER (PARTITION BY q.vec_id
          ORDER BY ${VectorOps.sqlCosine("q.embedding", "c.embedding")} DESC,
            c.vec_id ASC) AS rank
      FROM (SELECT * FROM embeddings WHERE vec_id < 10) q
      JOIN embeddings c ON q.vec_id <> c.vec_id)
    WHERE rank <= 5"""

  /** Random-hyperplane LSH ANN (rows-only oracle): 6 fixed pseudo-random
    * hyperplanes → 6 sign bits → bucket id. Queries probe only their own
    * bucket; top-3 within bucket by exact cosine. The scale path: bucket
    * fan-out divides candidate volume by ~2^6 with high recall on near
    * vectors (sign agreement probability 1 − θ/π per plane).
    */
  private val Dim = 64
  private val NPlanes = 6

  /** Deterministic "random" hyperplanes: component (p,d) derives from a
    * fixed LCG — reproducible across runs and executors.
    */
  private def plane(p: Int): Array[Double] = {
    var state = 0x9E3779B97F4A7C15L * (p + 1)
    Array.fill(Dim) {
      state = state * 6364136223846793005L + 1442695040888963407L
      ((state >>> 11).toDouble / (1L << 53).toDouble) - 0.5
    }
  }

  private def planeCol(p: Int): Column =
    array(plane(p).map(lit(_)): _*)

  private def bucketOf(v: Column): Column =
    (0 until NPlanes).map { p =>
      when(VectorOps.dot(v, planeCol(p)) > 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)

  def annLsh(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
      .withColumn("bucket", bucketOf(col("embedding")))
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"), col("bucket"))
    val cand = e.select(col("vec_id").as("neighbor_id"), col("embedding").as("ce"),
      col("bucket"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    broadcast(q).join(cand, Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), col("bucket"),
        VectorOps.cosine(col("qe"), col("ce")).as("cosine"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
  }

  /** IVF-style ANN (rows-only oracle): a deterministic coarse quantizer
    * (every 50th vector serves as a centroid — at scale: k-means fitted
    * offline and broadcast), vectors assigned to their nearest centroid
    * (inverted lists), queries probe the 2 nearest lists only. The other
    * 100 TB path besides LSH: probe cost scales with corpus/k · nprobe.
    */
  def annIvf(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val cents = e.filter(pmod(col("vec_id"), lit(50)) === 0)
      .select(col("vec_id").as("cent_id"), col("embedding").as("ce"))
    def nearestCentroids(vecs: DataFrame, idCol: String, vecCol: String, n: Int) = {
      val w = Window.partitionBy(col(idCol))
        .orderBy(col("cent_cos").desc, col("cent_id").asc)
      vecs.crossJoin(broadcast(cents))
        .withColumn("cent_cos", VectorOps.cosine(col(vecCol), col("ce")))
        .withColumn("cent_rank", row_number().over(w))
        .filter(col("cent_rank") <= n)
        .drop("ce", "cent_cos", "cent_rank")
    }
    val assigned = nearestCentroids(
      e.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv")),
      "neighbor_id", "cv", 1)
    val probes = nearestCentroids(
      e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("embedding").as("qe")),
      "query_id", "qe", 2)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    probes.join(assigned, Seq("cent_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), col("cent_id"),
        VectorOps.cosine(col("qe"), col("cv")).as("cosine"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
  }

  /** Embedding int8 quantization quality: per-vector symmetric scale
    * (max|x|/127), round-to-nearest quantize, and the reconstruction
    * error a storage layer would accept. All arithmetic is explicit
    * left folds over the vector (identical association order to the
    * oracle's LIST_REDUCE) — deterministic doubles.
    */
  def embeddingQuantize(spark: SparkSession, dir: String): DataFrame = {
    val e = col("embedding")
    val maxAbs = aggregate(e, lit(0.0), (acc, x) =>
      greatest(acc, abs(x.cast("double"))))
    val scale = maxAbs / lit(127.0)
    def quant(x: org.apache.spark.sql.Column) =
      floor(x.cast("double") / scale + lit(0.5))
    val sqErr = aggregate(e, lit(0.0), (acc, x) =>
      acc + pow(x.cast("double") - quant(x) * scale, 2))
    Tables.embeddings(spark, dir)
      .select(
        col("vec_id"),
        scale.as("scale"),
        (sqErr / size(e).cast("double")).as("mse"))
  }

  val embeddingQuantizeOracle: String = {
    val maxAbs = "LIST_REDUCE(LIST_PREPEND(CAST(0 AS DOUBLE), " +
      "LIST_TRANSFORM(embedding, x -> ABS(CAST(x AS DOUBLE)))), (a, b) -> GREATEST(a, b))"
    val scale = s"($maxAbs / 127.0)"
    val sqErr = "LIST_REDUCE(LIST_PREPEND(CAST(0 AS DOUBLE), " +
      s"LIST_TRANSFORM(embedding, x -> POW(CAST(x AS DOUBLE) - " +
      s"FLOOR(CAST(x AS DOUBLE) / $scale + 0.5) * $scale, 2))), (a, b) -> a + b)"
    s"""
    SELECT vec_id, $scale AS scale,
      $sqErr / CAST(LEN(embedding) AS DOUBLE) AS mse
    FROM embeddings"""
  }

  def defs: Map[String, QueryDef] = Map(
    "embedding_quantize" -> QueryDef.sql(embeddingQuantize, embeddingQuantizeOracle),
    "dedup_embedding" -> QueryDef.sql(dedupEmbedding, dedupEmbeddingOracle),
    "ann_topk" -> QueryDef.sql(annTopk, annTopkOracle),
    "ann_lsh" -> QueryDef.rowsOnly(annLsh),
    "ann_ivf" -> QueryDef.rowsOnly(annIvf)
  )
}
