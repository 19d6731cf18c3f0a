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
  def kcenterCoreset(spark: SparkSession, dir: String): DataFrame =
    kcenterCoresetDf(Tables.embeddings(spark, dir))

  /** Frame-parametric k-center (pipeline composition form — the
    * `...Df` convention): same traversal over any (vec_id, label,
    * embedding) frame; corpora smaller than the target center count
    * yield one center per vector and stop (the stage-8 exemplar pool
    * must not throw on a tiny surviving corpus).
    */
  def kcenterCoresetDf(embFrame: DataFrame): DataFrame = {
    val spark = embFrame.sparkSession
    var cur = embFrame
      .select(col("vec_id"), col("label").cast("long").as("label"), col("embedding"))
      .withColumn("n2", VectorOps.dot(col("embedding"), col("embedding")))
    val seedRows = cur.orderBy(col("n2").desc, col("vec_id").asc).limit(1)
      .select(col("vec_id"), col("label"), col("embedding"), col("n2"))
      .collect()
    if (seedRows.isEmpty) {
      import spark.implicits._
      return Seq.empty[(Long, Long, Long, Double)]
        .toDF("sel_round", "vec_id", "label", "d2")
    }
    val seed = seedRows(0)
    val picked = scala.collection.mutable.ArrayBuffer(
      (0L, seed.getAs[Long]("vec_id"), seed.getAs[Long]("label"), -1.0))
    var cEmb = seed.getAs[scala.collection.Seq[Float]]("embedding")
    var cN2 = seed.getAs[Double]("n2")
    cur = cur.withColumn("dist",
      col("n2") - lit(2.0) * VectorOps.dot(col("embedding"), typedLit(cEmb)) + lit(cN2))
    val pickedIds = scala.collection.mutable.Set(picked.head._2)
    var r = 1
    var exhausted = false
    while (r <= Rounds && !exhausted) {
      cur = graft.functions.Iterate.checkpoint(cur)
      val nextRows = cur.orderBy(col("dist").desc, col("vec_id").asc).limit(1)
        .collect()
      // a corpus smaller than the center budget re-offers an already
      // chosen vector (its min-distance is 0 and so is everyone else's)
      exhausted = nextRows.isEmpty ||
        pickedIds.contains(nextRows(0).getAs[Long]("vec_id"))
      if (!exhausted) {
        val next = nextRows(0)
        picked += ((r.toLong, next.getAs[Long]("vec_id"),
          next.getAs[Long]("label"), next.getAs[Double]("dist")))
        pickedIds += next.getAs[Long]("vec_id")
        if (r < Rounds) {
          cEmb = next.getAs[scala.collection.Seq[Float]]("embedding")
          cN2 = next.getAs[Double]("n2")
          cur = cur.withColumn("dist",
            least(col("dist"),
              col("n2") - lit(2.0) * VectorOps.dot(col("embedding"), typedLit(cEmb))
                + lit(cN2)))
        }
        r += 1
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

  private val Dim = 64
  private val PowerRounds = 12
  private val GramFx = 1.0e8 // per-row outer-product fixed point
  private val MatFx = 1.0e4 // mat-vec fixed point (headroom: |G|·1e4·64 < 2^63)

  /** Top principal component of the embedding corpus by power iteration
    * — the PCA direction a whitening/projection step needs, computed
    * with ONE corpus pass: the d² Gram matrix accumulates as exact
    * BIGINTs (each row's outer product floors to 1e8 fixed point before
    * the cross-row sum, so partition order cannot perturb it), then 12
    * mat-vec rounds run on the 4096-row Gram frame with the 64-row
    * vector broadcast — the pagerank discipline at d² scale. Each
    * mat-vec term re-floors (G·v·1e4 → BIGINT) so round k is
    * bit-identical to the unrolled MATERIALIZED-CTE oracle;
    * normalization divides by the SIGNED max-|component| entry (tie →
    * lowest index), which also fixes the eigenvector's sign
    * deterministically (that component becomes +1). λ is read off the
    * final normalization scalar (v had +1 at the pivot).
    *
    * Scale: the d²-row explode is the honest Gram cost (64× row
    * amplification, one shuffle); iterations never touch the corpus.
    *
    * NOTE (r16 ADVICE): the mat-vec rounds run driver-side on the
    * collected Dim²-bounded Gram, so constructing this DataFrame
    * EXECUTES the corpus-side Gram job eagerly — plan-only tooling
    * (explain, PlanDump) pays that execution; the returned plan is the
    * final LocalTableScan.
    */
  def pcaPowerIteration(spark: SparkSession, dir: String): DataFrame = {
    val gram = Tables.embeddings(spark, dir)
      .select(explode(expr(
        s"""flatten(transform(embedding, (x, i) ->
           |  transform(embedding, (y, j) -> struct(i AS i, j AS j,
           |    cast(floor(cast(x as double) * cast(y as double) * $GramFx)
           |      as bigint) AS c))))""".stripMargin)).as("p"))
      .groupBy(col("p.i").as("i"), col("p.j").as("j"))
      .agg(sum(col("p.c")).as("g"))
    // The Gram is Dim² = 4096 BIGINT cells at ANY corpus size —
    // dimension-bounded state, not data-bounded — so the mat-vec rounds
    // run driver-side on the collected matrix (the AnnIndex/Coreset
    // bounded-collect discipline). The distributed form spent ~20
    // job submissions iterating a 4096-row frame (guide §1.2: fix the
    // algorithm's pass count before anything else); the corpus-scale
    // work — the one explode-aggregate pass — is unchanged. Every
    // arithmetic step below mirrors the former Spark expressions op for
    // op (same IEEE order: (g.toDouble · vj) · MatFx, floor, exact
    // BIGINT row sums; pivot by |wd| DESC, i ASC; one division), so the
    // result is bit-identical to the unrolled-CTE oracle.
    val cells = gram.collect() // bounded: Dim × Dim rows
    import spark.implicits._
    if (cells.isEmpty)
      return Seq.empty[(Long, Double, Double)]
        .toDF("dim_idx", "component", "lambda_est")
    val G = Array.ofDim[Long](Dim, Dim)
    cells.foreach(r => G(r.getAs[Int]("i"))(r.getAs[Int]("j")) = r.getAs[Long]("g"))
    var v = Array.fill(Dim)(1.0)
    var piv = 0.0
    for (_ <- 1 to PowerRounds) {
      val wd = Array.tabulate(Dim) { i =>
        var s = 0L
        var j = 0
        while (j < Dim) {
          s += math.floor(G(i)(j).toDouble * v(j) * MatFx).toLong
          j += 1
        }
        s.toDouble
      }
      var best = 0
      for (i <- 1 until Dim) if (math.abs(wd(i)) > math.abs(wd(best))) best = i
      piv = wd(best)
      v = wd.map(_ / piv)
    }
    spark.createDataFrame(v.zipWithIndex.map { case (vj, j) =>
      (j.toLong,
        math.floor(vj * 1.0e6 + 0.5) / 1.0e6,
        math.floor(piv / MatFx / GramFx * 1.0e4 + 0.5) / 1.0e4)
    }.toSeq).toDF("dim_idx", "component", "lambda_est")
  }

  /** Per-element fixed point for the scatter moments (the [[GramFx]]
    * discipline at first power: |x| < 1 in this corpus, so x·1e7 sits
    * comfortably in BIGINT and the squared sums in DECIMAL(38)).
    */
  private val SepFx = 1.0e7

  /** Fisher class-separability of the labeled embedding space —
    * between-class vs within-class scatter per label (the LDA
    * criterion read as a DATA audit: a label whose between/within
    * ratio sits near zero is not linearly separable from the rest in
    * this embedding — either the labels are noisy or the embedding
    * doesn't encode the class; [[Clustering.clusterLabelPurity]] asks
    * the same question from geometry's side, this asks it from the
    * labels' side). All moments are EXACT integers in one pass over
    * the exploded (label, dim) grid: per-element fixed point
    * fx = ⌊x·1e7 + ½⌋ (BIGINT), per-(label,dim) Σfx (BIGINT) and Σfx²
    * (DECIMAL(38,0)/HUGEINT), then within W_l = Σfx² − Σ_d S_ld²/n_l
    * and between B_l = Σ_d (S_ld·N − G_d·n_l)² / (n_l·N²) as
    * fixed-order doubles over those integers — the cross-dim folds sum
    * INTEGER terms, never doubles, so shuffle order cannot perturb a
    * bit. Reported as mean within/between scatter in original units²
    * ×1e6 and the Fisher ratio in ppm (NULL when within-scatter is
    * zero). Scale: the explode is scan-speed and map-side combines
    * into |labels|·dim cells; everything after is metadata-scale.
    */
  def classSeparability(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    def dec(c: org.apache.spark.sql.Column) = c.cast(DecimalType(38, 0))
    val ex = Tables.embeddings(spark, dir)
      .select(col("label").cast("long").as("label"),
        posexplode(col("embedding")).as(Seq("d", "x")))
      .select(col("label"), col("d"),
        floor(col("x").cast("double") * lit(SepFx) + lit(0.5))
          .cast("bigint").as("fx"))
    // checkpointed: both the global-dim fold and the term join read the
    // (label, dim) moments — without materialization each re-runs the
    // corpus explode-aggregate, the only corpus-scale stage here
    val ld = graft.functions.Iterate.checkpoint(
      ex.groupBy(col("label"), col("d"))
        .agg(count(lit(1)).as("n_l"), sum(col("fx")).as("s_ld"),
          sum(dec(col("fx")) * dec(col("fx"))).as("q_ld")))
    val gd = ld.groupBy(col("d"))
      .agg(sum(col("s_ld")).as("g_d"), sum(col("n_l")).as("n_tot"))
    val bdiff = dec(col("s_ld")) * dec(col("n_tot")) -
      dec(col("g_d")) * dec(col("n_l"))
    val terms = ld.join(broadcast(gd), Seq("d"))
      .withColumn("ssq_term", dec(col("s_ld")) * dec(col("s_ld")))
      .withColumn("b_term", bdiff * bdiff)
    val per = terms.groupBy(col("label"))
      .agg(max(col("n_l")).as("n_vecs"), max(col("n_tot")).as("n_tot"),
        sum(col("q_ld")).as("q_l"), sum(col("ssq_term")).as("ssq_l"),
        sum(col("b_term")).as("bnum_l"))
    def d8(name: String) = col(name).cast("double")
    val wl = d8("q_l") - d8("ssq_l") / d8("n_vecs")
    val bl = d8("bnum_l") / (d8("n_vecs") * d8("n_tot") * d8("n_tot"))
    per.select(col("label"), col("n_vecs"),
      floor(wl / d8("n_vecs") / lit(SepFx) / lit(SepFx) * lit(1.0e6))
        .cast("bigint").as("within_ms_x1e6"),
      floor(bl / d8("n_vecs") / lit(SepFx) / lit(SepFx) * lit(1.0e6))
        .cast("bigint").as("between_ms_x1e6"),
      when(wl > 0.0, floor(bl / wl * lit(1.0e6)).cast("bigint"))
        .as("fisher_ppm"))
  }

  val classSeparabilityOracle: String = s"""
    WITH ex AS (
      SELECT CAST(label AS BIGINT) AS label, dd.range AS d,
        CAST(FLOOR(CAST(embedding[dd.range + 1] AS DOUBLE) * $SepFx + 0.5)
          AS BIGINT) AS fx
      FROM embeddings CROSS JOIN range(0, $Dim) dd),
    ld AS (
      SELECT label, d, COUNT(*) AS n_l, CAST(SUM(fx) AS BIGINT) AS s_ld,
        SUM(CAST(fx AS HUGEINT) * CAST(fx AS HUGEINT)) AS q_ld
      FROM ex GROUP BY 1, 2),
    gd AS (
      SELECT d, CAST(SUM(s_ld) AS BIGINT) AS g_d,
        CAST(SUM(n_l) AS BIGINT) AS n_tot
      FROM ld GROUP BY 1),
    terms AS (
      SELECT label, n_l, n_tot, q_ld,
        CAST(s_ld AS HUGEINT) * CAST(s_ld AS HUGEINT) AS ssq_term,
        (CAST(s_ld AS HUGEINT) * n_tot - CAST(g_d AS HUGEINT) * n_l)
          * (CAST(s_ld AS HUGEINT) * n_tot - CAST(g_d AS HUGEINT) * n_l)
          AS b_term
      FROM ld JOIN gd USING (d)),
    per AS (
      SELECT label, MAX(n_l) AS n_vecs, MAX(n_tot) AS n_tot,
        SUM(q_ld) AS q_l, SUM(ssq_term) AS ssq_l, SUM(b_term) AS bnum_l
      FROM terms GROUP BY 1),
    f AS (
      SELECT label, n_vecs,
        CAST(q_l AS DOUBLE) - CAST(ssq_l AS DOUBLE) / CAST(n_vecs AS DOUBLE)
          AS wl,
        CAST(bnum_l AS DOUBLE) / (CAST(n_vecs AS DOUBLE)
          * CAST(n_tot AS DOUBLE) * CAST(n_tot AS DOUBLE)) AS bl
      FROM per)
    SELECT label, n_vecs,
      CAST(FLOOR(wl / CAST(n_vecs AS DOUBLE) / $SepFx / $SepFx * 1.0e6)
        AS BIGINT) AS within_ms_x1e6,
      CAST(FLOOR(bl / CAST(n_vecs AS DOUBLE) / $SepFx / $SepFx * 1.0e6)
        AS BIGINT) AS between_ms_x1e6,
      CASE WHEN wl > 0.0 THEN CAST(FLOOR(bl / wl * 1.0e6) AS BIGINT) END
        AS fisher_ppm
    FROM f"""

  val pcaPowerIterationOracle: String = {
    val rounds = (1 to PowerRounds).map { r =>
      s"""w$r AS MATERIALIZED (
      SELECT g.i, CAST(SUM(CAST(FLOOR(CAST(g.g AS DOUBLE) * p.vj * $MatFx)
        AS BIGINT)) AS DOUBLE) AS wd
      FROM gram g JOIN v${r - 1} p ON g.j = p.j GROUP BY 1),
    s$r AS MATERIALIZED (
      SELECT wd AS piv FROM w$r ORDER BY ABS(wd) DESC, i ASC LIMIT 1),
    v$r AS MATERIALIZED (
      SELECT w$r.i AS j, w$r.wd / s$r.piv AS vj FROM w$r CROSS JOIN s$r)"""
    }.mkString(",\n    ")
    s"""
    WITH gram AS MATERIALIZED (
      SELECT ii.range AS i, jj.range AS j,
        CAST(SUM(CAST(FLOOR(CAST(embedding[ii.range + 1] AS DOUBLE)
          * CAST(embedding[jj.range + 1] AS DOUBLE) * $GramFx) AS BIGINT))
          AS BIGINT) AS g
      FROM embeddings
      CROSS JOIN range(0, $Dim) ii CROSS JOIN range(0, $Dim) jj
      GROUP BY 1, 2),
    v0 AS (SELECT range AS j, CAST(1.0 AS DOUBLE) AS vj FROM range(0, $Dim)),
    $rounds
    SELECT CAST(v.j AS BIGINT) AS dim_idx,
      CAST(FLOOR(v.vj * 1.0e6 + 0.5) AS DOUBLE) / 1.0e6 AS component,
      CAST(FLOOR(s.piv / $MatFx / $GramFx * 1.0e4 + 0.5) AS DOUBLE) / 1.0e4
        AS lambda_est
    FROM v$PowerRounds v CROSS JOIN s$PowerRounds s"""
  }

  def defs: Map[String, QueryDef] = Map(
    "kcenter_coreset" -> QueryDef.sql(kcenterCoreset, kcenterCoresetOracle),
    "pca_power_iteration" -> QueryDef.sql(pcaPowerIteration, pcaPowerIterationOracle),
    "class_separability" ->
      QueryDef.sql(classSeparability, classSeparabilityOracle)
  )
}
