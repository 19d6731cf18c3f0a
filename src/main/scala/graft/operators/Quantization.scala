package graft.operators

import graft.{QueryDef, Tables}
import graft.functions.{Exact, VectorOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization and the IVF-PQ serving path (§2.E) — the
  * vector-compression half of a production ANN index (Jégou et al.
  * 2011, "Product Quantization for Nearest Neighbor Search"): split
  * each embedding into [[NSub]] contiguous [[SubDim]]-wide subvectors,
  * train an independent [[KSub]]-centroid codebook per subspace (Lloyd
  * rounds under exactly [[Clustering]]'s fixed-point discipline), and
  * store each vector as [[NSub]] small codes — 8 codes for a 64-dim
  * float vector, a 32× compression of the payload an ANN index keeps
  * hot.
  *
  * Scale: the codebook is NSub·KSub = 128 rows — broadcast state at any
  * corpus size ([[Tables.stateHint]]-guarded). Training touches the
  * corpus once per Lloyd round as narrow (vec_id, sub, subvector) rows;
  * encoding is one scan + a broadcast join; the ADC query path scores
  * candidates from codes + the broadcast codebook without reading
  * candidate vectors (the exact re-rank reads only the top-[[AdcTopK]]
  * per query). Reference-free by design: the reference has no vector
  * ops; this extends the training-data engine along SURVEY §2.E.
  */
object Quantization {

  private val Dim = 64
  private val NSub = 8
  private val SubDim = Dim / NSub
  private val KSub = 16
  /** Lloyd rounds per sub-codebook (seed + one update): PQ codebooks
    * converge fast at KSub=16, and every extra unrolled round doubles
    * the oracle's CTE chain — two rounds already prove the training
    * loop end to end (the [[Clustering]] reasoning at smaller k).
    */
  private val PqIters = 2
  /** Lloyd rounds for the RESIDUAL codebooks ([[pqEncodeResidual]] /
    * [[annIvfPqResidual]]): the residual field is near-zero-centered
    * (the coarse quantizer absorbed the between-cell structure), so its
    * 16 seed centroids start clumped and need more update rounds to
    * spread than the raw corpus' do — undertrained residual codebooks
    * are how IVFADC loses to raw-code ADC despite better MSE.
    */
  private val PqResIters = 3
  /** Fixed-point grid for centroid means (embeddings are O(1)). */
  private val Fp = 1.0e7
  /** ADC candidates kept per query before the exact re-rank. */
  private val AdcTopK = 10
  /** Final exact-cosine neighbors reported per query. */
  private val TopK = 3
  /** Coarse cells probed per query (mirrors ann_ivf_trained). */
  private val NProbe = 2
  /** Queries = the vec_id < 10 slice (the ann family's probe set). */
  private val NQueries = 10

  /** (vec_id, sub, sv): each vector split into [[NSub]] contiguous
    * [[SubDim]]-wide subvectors — a codegen'd slice on the scan.
    */
  private def subvectors(e: DataFrame): DataFrame =
    e.select(col("vec_id"), col("embedding"),
        explode(sequence(lit(0), lit(NSub - 1))).as("sub"))
      .select(col("vec_id"), col("sub"),
        slice(col("embedding"), col("sub") * lit(SubDim) + lit(1),
          lit(SubDim)).as("sv"))

  /** Seed codebooks: the [[KSub]] lowest vec_ids' subvectors seed every
    * subspace (code 0..KSub−1 in vec_id order) —
    * [[Clustering.seedCentroids]]'s rule applied per subspace; plans as
    * TakeOrdered + a KSub-row window, never a global sort.
    */
  private def seedCodebook(e: DataFrame): DataFrame =
    e.orderBy(col("vec_id")).limit(KSub)
      .withColumn("code",
        (row_number().over(Window.orderBy(col("vec_id"))) - 1).cast("int"))
      .select(col("code"), col("embedding"),
        explode(sequence(lit(0), lit(NSub - 1))).as("sub"))
      .select(col("sub"), col("code"),
        slice(col("embedding"), col("sub") * lit(SubDim) + lit(1),
          lit(SubDim)).as("cv"))

  /** Assign every (vec, sub) to its nearest sub-centroid (ties → smaller
    * code). The codebook is broadcast; the argmin is a struct-min
    * aggregate (same (d2 ASC, code ASC) order as the old row_number
    * window, sv riding behind the deciding fields) so the per-(vec,sub)
    * candidate fan-out collapses map-side before any exchange — the
    * [[Clustering.assign]] scale shape.
    */
  private def assign(subv: DataFrame, cb: DataFrame): DataFrame =
    subv.join(Tables.stateHint(cb), Seq("sub"))
      .withColumn("d2", Clustering.d2(col("sv"), col("cv")))
      .groupBy(col("vec_id"), col("sub"))
      .agg(min(struct(col("d2"), col("code"), col("sv"))).as("__m"))
      .select(col("vec_id"), col("sub"), col("__m.sv").as("sv"),
        col("__m.code").as("code"), col("__m.d2").as("d2"))

  /** Recompute float32 sub-centroids as fixed-point per-dimension means
    * ([[Clustering]]'s update, keyed (sub, code)).
    */
  private def update(assigned: DataFrame): DataFrame =
    assigned
      .select(col("sub"), col("code"), posexplode(col("sv")).as(Seq("pos", "x")))
      .groupBy(col("sub"), col("code"), col("pos"))
      .agg(
        sum(floor(col("x").cast("double") * lit(Fp) + lit(0.5)).cast("long")).as("sfx"),
        count(lit(1)).as("n"))
      .withColumn("mean",
        ((col("sfx").cast("double") / lit(Fp)) / col("n").cast("double")).cast("float"))
      .groupBy(col("sub"), col("code"))
      .agg(transform(
        array_sort(collect_list(struct(col("pos"), col("mean")))),
        s => s.getField("mean")).as("cv"))

  /** The trained per-subspace codebooks after [[PqIters]] Lloyd rounds —
    * shared by [[pqEncode]] and [[annIvfPq]].
    */
  private[graft] def finalCodebook(e: DataFrame): DataFrame =
    finalCodebook(e, PqIters)

  private[graft] def finalCodebook(e: DataFrame, iters: Int): DataFrame = {
    val subv = subvectors(e)
    var cb = seedCodebook(e).transform(
      graft.functions.Iterate.checkpoint(_,
        Some("seed rank over the KSub-row post-LIMIT TakeOrdered frame")))
    for (_ <- 1 until iters)
      cb = update(assign(subv, cb)).transform(graft.functions.Iterate.checkpoint)
    cb
  }

  /** PQ-encode the corpus: per vector, the [[NSub]] trained codes (a
    * '-'-joined string in subspace order) and the reconstruction MSE
    * this compression costs — the report a storage layer reads before
    * committing to a codebook. Exact.dsum keeps the per-subspace error
    * total order-independent.
    */
  def pqEncode(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    val coded = assign(subvectors(e), finalCodebook(e))
    coded.groupBy(col("vec_id"))
      .agg(
        concat_ws("-",
          transform(array_sort(collect_list(struct(col("sub"), col("code")))),
            s => s.getField("code").cast("string"))).as("codes"),
        Exact.dsum(col("d2")).as("sq_err"))
      .select(col("vec_id"), col("codes"),
        (col("sq_err") / lit(Dim.toDouble)).as("recon_mse"))
  }

  private def pqAssignSql(cb: String, subRel: String = "pqsub"): String = s"""
      SELECT vec_id, sub, sv, code, d2 FROM (
        SELECT p.vec_id, p.sub, p.sv, c.code,
          ${Clustering.sqlD2("p.sv", "c.cv")} AS d2,
          ROW_NUMBER() OVER (PARTITION BY p.vec_id, p.sub
            ORDER BY ${Clustering.sqlD2("p.sv", "c.cv")} ASC, c.code ASC) AS rn
        FROM $subRel p JOIN $cb c ON p.sub = c.sub)
      WHERE rn = 1"""

  private def pqCentSql(assignRel: String): String = s"""
      SELECT sub, code,
        ARRAY_AGG(CAST((CAST(sfx AS DOUBLE) / 1.0e7) / CAST(n AS DOUBLE) AS FLOAT)
          ORDER BY pos) AS cv
      FROM (
        SELECT sub, code, pos, SUM(fx) AS sfx, COUNT(*) AS n FROM (
          SELECT sub, code,
            UNNEST(RANGE(1, LEN(sv) + 1)) AS pos,
            UNNEST(LIST_TRANSFORM(sv,
              x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1.0e7 + 0.5) AS BIGINT))) AS fx
          FROM $assignRel)
        GROUP BY 1, 2, 3)
      GROUP BY 1, 2"""

  /** The unrolled PQ training as WITH-clause CTEs ending at
    * [[pqFinalRelFor]] (names `$prefix`-prefixed so two trainings — raw
    * and residual — compose with [[Clustering.kmeansCtes]] inside one
    * WITH), trained on `srcRel(vec_id, embedding)`.
    */
  private[graft] def pqCtesFor(prefix: String, srcRel: String,
      nIters: Int = PqIters): String = {
    val iters = (1 until nIters).map { i =>
      s"""${prefix}as$i AS (${pqAssignSql(s"${prefix}cb${i - 1}", s"${prefix}sub")}),
    ${prefix}cb$i AS (${pqCentSql(s"${prefix}as$i")})"""
    }.mkString(",\n    ")
    s"""${prefix}sub AS MATERIALIZED (
      SELECT vec_id, s AS sub,
        embedding[s * $SubDim + 1 : s * $SubDim + $SubDim] AS sv
      FROM (SELECT vec_id, embedding, UNNEST(RANGE(0, $NSub)) AS s
            FROM $srcRel)),
    ${prefix}cb0 AS (
      SELECT sub, CAST(rn - 1 AS INT) AS code, sv AS cv FROM (
        SELECT sub, sv, ROW_NUMBER() OVER (PARTITION BY sub ORDER BY vec_id) AS rn
        FROM ${prefix}sub) WHERE rn <= $KSub),
    $iters"""
  }

  private[graft] def pqFinalRelFor(prefix: String,
      nIters: Int = PqIters): String =
    s"${prefix}cb${nIters - 1}"

  private[graft] def pqCtes: String = pqCtesFor("pq", "embeddings")

  private[graft] def pqFinalRel: String = pqFinalRelFor("pq")

  lazy val pqEncodeOracle: String = s"""
    WITH $pqCtes,
    pqfinal AS (${pqAssignSql(pqFinalRel)})
    SELECT vec_id,
      STRING_AGG(CAST(code AS VARCHAR), '-' ORDER BY sub) AS codes,
      ${Exact.sqlDsum("d2")} / CAST($Dim AS DOUBLE) AS recon_mse
    FROM pqfinal GROUP BY vec_id"""

  /** The full IVF-PQ query path: coarse cells from the engine's own
    * trained IVF quantizer ([[Clustering.finalCentroids]] — the
    * ann_ivf_trained inverted lists), candidates scored by ASYMMETRIC
    * DISTANCE COMPUTATION (the query's exact subvectors against each
    * candidate's PQ codes via the broadcast codebook — candidate
    * vectors are never read at this stage), ADC top-[[AdcTopK]] per
    * query, then an exact cosine re-rank of just those to top-[[TopK]].
    * Codes are trained on raw vectors (not cell residuals) so the
    * codebook CTEs stay shared with [[pqEncode]]; the residual variant
    * — IVFADC as Jégou et al. 2011 actually ship it — is
    * [[annIvfPqResidual]].
    *
    * Scale: probes read [[NProbe]] of k cells (k grows with the corpus
    * at fixed cell size); ADC joins narrow (neighbor, sub, code) rows
    * against two broadcast tables; only [[AdcTopK]] full vectors per
    * query are read back for the re-rank — the IO shape a 100 TB
    * serving index needs.
    */
  def annIvfPq(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    val cents = Clustering.finalCentroids(spark, dir)
    val cells = Clustering.assign(e, cents)
      .select(col("vec_id").as("neighbor_id"), col("cid"))
    val cb = finalCodebook(e)
    val codes = assign(subvectors(e), cb)
      .select(col("vec_id").as("neighbor_id"), col("sub"), col("code"))
    val wProbe = Window.partitionBy(col("query_id"))
      .orderBy(col("cd2").asc, col("cid").asc)
    val probes = e.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
      .crossJoin(Tables.stateHint(cents))
      .withColumn("cd2", Clustering.d2(col("qe"), col("cv")))
      .withColumn("rn", row_number().over(wProbe))
      .filter(col("rn") <= NProbe)
      .select(col("query_id"), col("cid"))
    val qsub = subvectors(e.filter(col("vec_id") < NQueries))
      .select(col("vec_id").as("query_id"), col("sub"), col("sv").as("qsv"))
    val adc = broadcast(probes).join(cells, Seq("cid"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"))
      .join(codes, Seq("neighbor_id"))
      .join(Tables.stateHint(cb), Seq("sub", "code"))
      .join(broadcast(qsub), Seq("query_id", "sub"))
      .withColumn("d2", Clustering.d2(col("qsv"), col("cv")))
      .groupBy(col("query_id"), col("neighbor_id"))
      .agg(Exact.dsum(col("d2")).as("adc"))
    val wAdc = Window.partitionBy(col("query_id"))
      .orderBy(col("adc").asc, col("neighbor_id").asc)
    val cand = adc.withColumn("arn", row_number().over(wAdc))
      .filter(col("arn") <= AdcTopK)
      .select(col("query_id"), col("neighbor_id"), col("adc"))
    val qe = e.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    val ne = e.select(col("vec_id").as("neighbor_id"), col("embedding").as("nv"))
    val wCos = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    broadcast(cand.join(broadcast(qe), Seq("query_id")))
      .join(ne, Seq("neighbor_id"))
      .withColumn("cosine", VectorOps.cosine(col("qe"), col("nv")))
      .withColumn("rank", row_number().over(wCos))
      .filter(col("rank") <= TopK)
      .select(col("query_id"), col("neighbor_id"), col("adc"),
        col("cosine"), col("rank"))
  }

  lazy val annIvfPqOracle: String = s"""
    WITH ${Clustering.kmeansCtes},
    cents AS MATERIALIZED (
      SELECT cid, cv FROM ${Clustering.kmeansFinalRel}),
    cells AS (
      SELECT vec_id AS neighbor_id, cid FROM (${Clustering.assignSql("cents")})),
    $pqCtes,
    codes AS (
      SELECT vec_id AS neighbor_id, sub, code FROM (${pqAssignSql(pqFinalRel)})),
    probes AS (
      SELECT query_id, cid FROM (
        SELECT e.vec_id AS query_id, c.cid,
          ROW_NUMBER() OVER (PARTITION BY e.vec_id
            ORDER BY ${Clustering.sqlD2("e.embedding", "c.cv")} ASC,
              c.cid ASC) AS rn
        FROM (SELECT * FROM embeddings WHERE vec_id < $NQueries) e
        CROSS JOIN cents c)
      WHERE rn <= $NProbe),
    qsub AS (
      SELECT vec_id AS query_id, sub, sv AS qsv FROM pqsub
      WHERE vec_id < $NQueries),
    adc AS (
      SELECT p.query_id, cl.neighbor_id,
        ${Exact.sqlDsum(Clustering.sqlD2("q.qsv", "cb.cv"))} AS adc
      FROM probes p
      JOIN cells cl USING (cid)
      JOIN codes co ON co.neighbor_id = cl.neighbor_id
      JOIN ${pqFinalRel} cb ON cb.sub = co.sub AND cb.code = co.code
      JOIN qsub q ON q.query_id = p.query_id AND q.sub = co.sub
      WHERE cl.neighbor_id <> p.query_id
      GROUP BY 1, 2),
    cand AS (
      SELECT query_id, neighbor_id, adc FROM (
        SELECT query_id, neighbor_id, adc,
          ROW_NUMBER() OVER (PARTITION BY query_id
            ORDER BY adc ASC, neighbor_id ASC) AS arn
        FROM adc)
      WHERE arn <= $AdcTopK)
    SELECT query_id, neighbor_id, adc, cosine, rank FROM (
      SELECT c.query_id, c.neighbor_id, c.adc,
        ${VectorOps.sqlCosine("qe.embedding", "ne.embedding")} AS cosine,
        ROW_NUMBER() OVER (PARTITION BY c.query_id
          ORDER BY ${VectorOps.sqlCosine("qe.embedding", "ne.embedding")} DESC,
            c.neighbor_id ASC) AS rank
      FROM cand c
      JOIN embeddings qe ON qe.vec_id = c.query_id
      JOIN embeddings ne ON ne.vec_id = c.neighbor_id)
    WHERE rank <= $TopK"""

  /** Per-vector residuals against the trained coarse quantizer:
    * r = v − centroid(cell(v)), each element computed as one double
    * subtraction rounded back to float32 — a single IEEE op per
    * dimension, bit-identical in both engines (the [[VectorOps]]
    * determinism rule). The residual field has far less variance than
    * the raw corpus (the coarse quantizer has already absorbed the
    * between-cell spread), which is why codebooks trained on it spend
    * their 38-bit code budget on what the cell id doesn't already say.
    */
  private def residualVectors(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    residualVectorsWith(e, Clustering.finalCentroids(spark, dir))
  }

  /** [[residualVectors]] against already-trained coarse centroids —
    * [[annIvfPqResidual]] passes the cents it already trained for its
    * cell lists instead of re-running the Lloyd checkpoint chain (the
    * training is deterministic, so the residuals are identical; the old
    * double call trained the SAME quantizer twice per query).
    */
  private def residualVectorsWith(e: DataFrame, cents: DataFrame): DataFrame =
    Clustering.assign(e, cents)
      .join(Tables.stateHint(cents), Seq("cid"))
      .select(col("vec_id"),
        zip_with(col("embedding"), col("cv"),
          (x, y) => (x.cast("double") - y.cast("double")).cast("float"))
          .as("embedding"))

  /** Shared oracle prelude for the residual family: trained coarse
    * centroids + the residual corpus as `rvec(vec_id, embedding)`.
    */
  private def residualCtes: String = s"""${Clustering.kmeansCtes},
    cents AS MATERIALIZED (
      SELECT cid, cv FROM ${Clustering.kmeansFinalRel}),
    rvec AS MATERIALIZED (
      SELECT a.vec_id,
        LIST_TRANSFORM(RANGE(1, LEN(a.embedding) + 1),
          i -> CAST(CAST(a.embedding[i] AS DOUBLE)
            - CAST(c.cv[i] AS DOUBLE) AS FLOAT)) AS embedding
      FROM (${Clustering.assignSql("cents")}) a
      JOIN cents c USING (cid))"""

  /** Residual PQ encode — IVFADC's storage layout (Jégou et al. 2011
    * §III: quantize r = v − q_coarse(v), not v): the same [[NSub]]×
    * [[KSub]] training loop as [[pqEncode]] but run on
    * [[residualVectors]], so `recon_mse` here is the error of
    * centroid + decode(code) against the ORIGINAL vector —
    * ‖v − (c + r̂)‖² = ‖r − r̂‖² — directly comparable with
    * [[pqEncode]]'s raw-codebook MSE at the identical code budget
    * (QuantizationSpec pins residual strictly below raw). One extra
    * broadcast join (cell → centroid) over the raw path; everything
    * downstream is the same scan shape.
    */
  def pqEncodeResidual(spark: SparkSession, dir: String): DataFrame = {
    val r = graft.functions.Iterate.checkpoint(residualVectors(spark, dir))
    val coded = assign(subvectors(r), finalCodebook(r, PqResIters))
    coded.groupBy(col("vec_id"))
      .agg(
        concat_ws("-",
          transform(array_sort(collect_list(struct(col("sub"), col("code")))),
            s => s.getField("code").cast("string"))).as("codes"),
        Exact.dsum(col("d2")).as("sq_err"))
      .select(col("vec_id"), col("codes"),
        (col("sq_err") / lit(Dim.toDouble)).as("recon_mse"))
  }

  lazy val pqEncodeResidualOracle: String = s"""
    WITH $residualCtes,
    ${pqCtesFor("rq", "rvec", PqResIters)},
    rqfinal AS (${pqAssignSql(pqFinalRelFor("rq", PqResIters), "rqsub")})
    SELECT vec_id,
      STRING_AGG(CAST(code AS VARCHAR), '-' ORDER BY sub) AS codes,
      ${Exact.sqlDsum("d2")} / CAST($Dim AS DOUBLE) AS recon_mse
    FROM rqfinal GROUP BY vec_id"""

  /** IVFADC proper — the residual-coded query path: coarse probes as in
    * [[annIvfPq]], but candidates carry RESIDUAL codes and the query is
    * residualized PER PROBED CELL (q − centroid(cell)) before its
    * subvectors meet the codebook, so ADC approximates
    * ‖(q − c) − r̂‖² = ‖q − (c + r̂)‖² — the true distance to the
    * candidate's reconstruction, where the raw-code path's ADC ignores
    * which cell a candidate sits in. Same IO shape: the only new work
    * is [[NProbe]] residualizations per query (state-sized), and the
    * exact re-rank is unchanged — so recall can only move through ADC
    * ordering quality (QuantizationSpec pins it not-worse than
    * [[annIvfPq]]'s against the brute-force truth).
    */
  def annIvfPqResidual(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    val cents = Clustering.finalCentroids(spark, dir)
    val cells = Clustering.assign(e, cents)
      .select(col("vec_id").as("neighbor_id"), col("cid"))
    val r = graft.functions.Iterate.checkpoint(residualVectorsWith(e, cents))
    val cb = finalCodebook(r, PqResIters)
    val codes = assign(subvectors(r), cb)
      .select(col("vec_id").as("neighbor_id"), col("sub"), col("code"))
    val wProbe = Window.partitionBy(col("query_id"))
      .orderBy(col("cd2").asc, col("cid").asc)
    val probes = e.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
      .crossJoin(Tables.stateHint(cents))
      .withColumn("cd2", Clustering.d2(col("qe"), col("cv")))
      .withColumn("rn", row_number().over(wProbe))
      .filter(col("rn") <= NProbe)
      .select(col("query_id"), col("cid"),
        zip_with(col("qe"), col("cv"),
          (x, y) => (x.cast("double") - y.cast("double")).cast("float"))
          .as("qr"))
    val qsub = probes
      .select(col("query_id"), col("cid"),
        explode(sequence(lit(0), lit(NSub - 1))).as("sub"), col("qr"))
      .select(col("query_id"), col("cid"), col("sub"),
        slice(col("qr"), col("sub") * lit(SubDim) + lit(1), lit(SubDim))
          .as("qsv"))
    val adc = broadcast(probes.select(col("query_id"), col("cid")))
      .join(cells, Seq("cid"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("cid"), col("neighbor_id"))
      .join(codes, Seq("neighbor_id"))
      .join(Tables.stateHint(cb), Seq("sub", "code"))
      .join(broadcast(qsub), Seq("query_id", "cid", "sub"))
      .withColumn("d2", Clustering.d2(col("qsv"), col("cv")))
      .groupBy(col("query_id"), col("neighbor_id"))
      .agg(Exact.dsum(col("d2")).as("adc"))
    val wAdc = Window.partitionBy(col("query_id"))
      .orderBy(col("adc").asc, col("neighbor_id").asc)
    val cand = adc.withColumn("arn", row_number().over(wAdc))
      .filter(col("arn") <= AdcTopK)
      .select(col("query_id"), col("neighbor_id"), col("adc"))
    val qe = e.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    val ne = e.select(col("vec_id").as("neighbor_id"), col("embedding").as("nv"))
    val wCos = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    broadcast(cand.join(broadcast(qe), Seq("query_id")))
      .join(ne, Seq("neighbor_id"))
      .withColumn("cosine", VectorOps.cosine(col("qe"), col("nv")))
      .withColumn("rank", row_number().over(wCos))
      .filter(col("rank") <= TopK)
      .select(col("query_id"), col("neighbor_id"), col("adc"),
        col("cosine"), col("rank"))
  }

  lazy val annIvfPqResidualOracle: String = s"""
    WITH $residualCtes,
    cells AS (
      SELECT vec_id AS neighbor_id, cid FROM (${Clustering.assignSql("cents")})),
    ${pqCtesFor("rq", "rvec", PqResIters)},
    codes AS (
      SELECT vec_id AS neighbor_id, sub, code
      FROM (${pqAssignSql(pqFinalRelFor("rq", PqResIters), "rqsub")})),
    probes AS MATERIALIZED (
      SELECT query_id, cid, qr FROM (
        SELECT e.vec_id AS query_id, c.cid,
          LIST_TRANSFORM(RANGE(1, LEN(e.embedding) + 1),
            i -> CAST(CAST(e.embedding[i] AS DOUBLE)
              - CAST(c.cv[i] AS DOUBLE) AS FLOAT)) AS qr,
          ROW_NUMBER() OVER (PARTITION BY e.vec_id
            ORDER BY ${Clustering.sqlD2("e.embedding", "c.cv")} ASC,
              c.cid ASC) AS rn
        FROM (SELECT * FROM embeddings WHERE vec_id < $NQueries) e
        CROSS JOIN cents c)
      WHERE rn <= $NProbe),
    qsub AS (
      SELECT query_id, cid, s AS sub,
        qr[s * $SubDim + 1 : s * $SubDim + $SubDim] AS qsv
      FROM (SELECT query_id, cid, qr, UNNEST(RANGE(0, $NSub)) AS s
            FROM probes)),
    adc AS (
      SELECT p.query_id, cl.neighbor_id,
        ${Exact.sqlDsum(Clustering.sqlD2("q.qsv", "cb.cv"))} AS adc
      FROM (SELECT query_id, cid FROM probes) p
      JOIN cells cl USING (cid)
      JOIN codes co ON co.neighbor_id = cl.neighbor_id
      JOIN ${pqFinalRelFor("rq", PqResIters)} cb
        ON cb.sub = co.sub AND cb.code = co.code
      JOIN qsub q ON q.query_id = p.query_id AND q.cid = cl.cid
        AND q.sub = co.sub
      WHERE cl.neighbor_id <> p.query_id
      GROUP BY 1, 2),
    cand AS (
      SELECT query_id, neighbor_id, adc FROM (
        SELECT query_id, neighbor_id, adc,
          ROW_NUMBER() OVER (PARTITION BY query_id
            ORDER BY adc ASC, neighbor_id ASC) AS arn
        FROM adc)
      WHERE arn <= $AdcTopK)
    SELECT query_id, neighbor_id, adc, cosine, rank FROM (
      SELECT c.query_id, c.neighbor_id, c.adc,
        ${VectorOps.sqlCosine("qe.embedding", "ne.embedding")} AS cosine,
        ROW_NUMBER() OVER (PARTITION BY c.query_id
          ORDER BY ${VectorOps.sqlCosine("qe.embedding", "ne.embedding")} DESC,
            c.neighbor_id ASC) AS rank
      FROM cand c
      JOIN embeddings qe ON qe.vec_id = c.query_id
      JOIN embeddings ne ON ne.vec_id = c.neighbor_id)
    WHERE rank <= $TopK"""

  /** IVF serving-load audit: per-cell inverted-list population, its
    * corpus share, and `load_ppm` — the cell's load relative to a
    * perfectly balanced codebook (1 000 000 = balanced; a cell at
    * 3 000 000 makes every probe that lands on it read 3× the expected
    * IO). The probe-cost twin of skew_diagnose: hot cells are to an ANN
    * index what hot join keys are to a shuffle — this report is what
    * decides a re-train or a split before latency SLOs notice.
    * All-integer division; the totals fold over the k-row count frame.
    */
  def ivfCellStats(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    val counts = Clustering.assign(e, Clustering.finalCentroids(spark, dir))
      .groupBy(col("cid")).agg(count(lit(1)).as("n_vecs"))
    val tot = counts.agg(sum(col("n_vecs")).as("n_total"),
      count(lit(1)).as("n_cells"))
    counts.crossJoin(broadcast(tot))
      .select(col("cid"), col("n_vecs"),
        expr("(n_vecs * 1000000L) div n_total").as("share_ppm"),
        expr("(n_vecs * n_cells * 1000000L) div n_total").as("load_ppm"))
  }

  lazy val ivfCellStatsOracle: String = s"""
    WITH ${Clustering.kmeansCtes},
    cents AS MATERIALIZED (
      SELECT cid, cv FROM ${Clustering.kmeansFinalRel}),
    counts AS (
      SELECT cid, COUNT(*) AS n_vecs
      FROM (${Clustering.assignSql("cents")}) GROUP BY 1),
    tot AS (
      SELECT SUM(n_vecs) AS n_total, COUNT(*) AS n_cells FROM counts)
    SELECT cid, CAST(n_vecs AS BIGINT) AS n_vecs,
      CAST((n_vecs * 1000000) // n_total AS BIGINT) AS share_ppm,
      CAST((n_vecs * n_cells * 1000000) // n_total AS BIGINT) AS load_ppm
    FROM counts CROSS JOIN tot"""

  def defs: Map[String, QueryDef] = Map(
    "pq_encode" -> QueryDef.sql(pqEncode, pqEncodeOracle),
    "pq_encode_residual" ->
      QueryDef.sql(pqEncodeResidual, pqEncodeResidualOracle),
    "ann_ivfpq" -> QueryDef.sql(annIvfPq, annIvfPqOracle),
    "ann_ivfpq_residual" ->
      QueryDef.sql(annIvfPqResidual, annIvfPqResidualOracle),
    "ivf_cell_stats" -> QueryDef.sql(ivfCellStats, ivfCellStatsOracle)
  )
}
