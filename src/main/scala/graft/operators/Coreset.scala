package graft.operators

import graft.{QueryDef, Tables}
import graft.functions.VectorOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Coreset selection over the embedding corpus (§2.E adjunct): greedy
  * k-center (Gonzalez 1985 farthest-point traversal) — the 2-approx
  * cover that picks maximally-SPREAD exemplars, the diversity complement
  * of [[Clustering.clusterKmeans]]'s density centroids (a curation
  * pipeline seeds human review / few-shot pools from exactly this).
  */
object Coreset {

  private val Rounds = 7 // 8 centers incl. the seed

  /** Greedy k-center: seed at the max-norm vector, then 7 rounds of
    * "add the point farthest from its nearest chosen center". Squared
    * L2 via the precomputed-norm identity d² = ‖v‖² − 2·v·c + ‖c‖²
    * (one [[VectorOps.dot]] per candidate-center pair, norms computed
    * once); the running min-distance is a COLUMN updated by
    * `least(dist, d²(v, c_new))` each round — so a round is ONE
    * scan-projection plus a TakeOrdered argmax: zero shuffles, and the
    * per-round driver state is exactly one row (the new center — the
    * AnnIndex bounded-collect discipline, k rows total). Lineage is
    * checkpoint-truncated per round.
    *
    * Determinism: each d² is the same fixed-order array fold in both
    * engines ([[VectorOps]]' proven FloatDot ≡ LIST_REDUCE equivalence),
    * the min/argmax are comparisons (no cross-row float sums), ties
    * break on vec_id. The selection distances are the cover-radius
    * sequence — non-increasing, which the spec pins. Seed reports
    * dist = −1 (it is chosen by norm, not distance).
    */
  def kcenterCoreset(spark: SparkSession, dir: String): DataFrame = {
    var cur = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label").cast("long").as("label"), col("embedding"))
      .withColumn("n2", VectorOps.dot(col("embedding"), col("embedding")))
    val seed = cur.orderBy(col("n2").desc, col("vec_id").asc).limit(1)
      .select(col("vec_id"), col("label"), col("embedding"), col("n2"))
      .collect()(0)
    val picked = scala.collection.mutable.ArrayBuffer(
      (0L, seed.getAs[Long]("vec_id"), seed.getAs[Long]("label"), -1.0))
    var cEmb = seed.getAs[scala.collection.Seq[Float]]("embedding")
    var cN2 = seed.getAs[Double]("n2")
    cur = cur.withColumn("dist",
      col("n2") - lit(2.0) * VectorOps.dot(col("embedding"), typedLit(cEmb)) + lit(cN2))
    for (r <- 1 to Rounds) {
      cur = graft.functions.Iterate.checkpoint(cur)
      val next = cur.orderBy(col("dist").desc, col("vec_id").asc).limit(1)
        .collect()(0)
      picked += ((r.toLong, next.getAs[Long]("vec_id"),
        next.getAs[Long]("label"), next.getAs[Double]("dist")))
      if (r < Rounds) {
        cEmb = next.getAs[scala.collection.Seq[Float]]("embedding")
        cN2 = next.getAs[Double]("n2")
        cur = cur.withColumn("dist",
          least(col("dist"),
            col("n2") - lit(2.0) * VectorOps.dot(col("embedding"), typedLit(cEmb))
              + lit(cN2)))
      }
    }
    import spark.implicits._
    picked.toSeq.toDF("sel_round", "vec_id", "label", "d2")
      .select(col("sel_round"), col("vec_id"), col("label"),
        (floor(col("d2") * lit(1.0e6) + lit(0.5)).cast("double") / lit(1.0e6))
          .as("d2"))
  }

  val kcenterCoresetOracle: String = {
    def d2(v: String, c: String) =
      s"$v.n2 - 2.0 * ${VectorOps.sqlDot(s"$v.embedding", s"$c.embedding")} + $c.n2"
    val rounds = (1 to Rounds).map { r =>
      val prev = s"d${r - 1}"
      s"""c$r AS MATERIALIZED (
      SELECT vec_id, label, embedding, n2, dist
      FROM $prev ORDER BY dist DESC, vec_id ASC LIMIT 1),
    d$r AS MATERIALIZED (
      SELECT v.vec_id, v.label, v.embedding, v.n2,
        LEAST(v.dist, ${d2("v", "c")}) AS dist
      FROM $prev v CROSS JOIN c$r c)"""
    }.mkString(",\n    ")
    val out = (1 to Rounds).map(r =>
      s"SELECT $r AS sel_round, vec_id, label, dist FROM c$r").mkString("\n      UNION ALL ")
    s"""
    WITH e2 AS MATERIALIZED (
      SELECT vec_id, CAST(label AS BIGINT) AS label, embedding,
        ${VectorOps.sqlDot("embedding", "embedding")} AS n2
      FROM embeddings),
    c0 AS MATERIALIZED (
      SELECT vec_id, label, embedding, n2
      FROM e2 ORDER BY n2 DESC, vec_id ASC LIMIT 1),
    d0 AS MATERIALIZED (
      SELECT v.vec_id, v.label, v.embedding, v.n2,
        ${d2("v", "c")} AS dist
      FROM e2 v CROSS JOIN c0 c),
    $rounds
    SELECT sel_round, vec_id, label,
      CAST(FLOOR(dist * 1.0e6 + 0.5) AS DOUBLE) / 1.0e6 AS d2
    FROM (
      SELECT 0 AS sel_round, vec_id, label, CAST(-1.0 AS DOUBLE) AS dist FROM c0
      UNION ALL $out)"""
  }

  def defs: Map[String, QueryDef] = Map(
    "kcenter_coreset" -> QueryDef.sql(kcenterCoreset, kcenterCoresetOracle)
  )
}
