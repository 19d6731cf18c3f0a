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

  /** Embedding-cosine near-duplicate pairs via banded hyperplane LSH —
    * the same candidate-generation discipline as dedup_minhash_lsh:
    * 16 sign bits per vector (4 bands × 4 planes), candidates are pairs
    * sharing a label AND at least one band bucket, verified with exact
    * cosine ≥ 0.3. The bucketing is part of the declared semantics and
    * is mirrored bit-for-bit in the DuckDB oracle (the planes are
    * deterministic LCG constants, emitted as SQL literals), so the whole
    * LSH pipeline — not just the verify step — is hash-checked.
    *
    * Scale: the banded self-join shuffles only (vec_id, label, bucket)
    * tuples; embeddings are re-joined for the (small) candidate set only.
    * Recall is the standard OR-amplified banding curve: ≈95% at cosine
    * 0.9, dropping toward the 0.3 boundary — the knob is bands × bits,
    * same trade a 100 TB near-dup pass tunes. A full all-pairs-per-label
    * formulation is quadratic per label and was rejected (labels are
    * few, so each block grows linearly with the corpus).
    */
  private val DedupBands = 4
  private val DedupBandBits = 4

  private def bandBucket(v: Column, band: Int): Column =
    (0 until DedupBandBits).map { i =>
      when(VectorOps.dot(v, planeCol(band * DedupBandBits + i)) > 0,
        lit((1L << i))).otherwise(lit(0L))
    }.reduce(_ + _) + lit(band * 16L)

  def dedupEmbedding(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val bands = e.select(col("vec_id"), col("label"),
        explode(array((0 until DedupBands).map(b =>
          bandBucket(col("embedding"), b)): _*)).as("bucket"))
      .transform(graft.functions.PlanGuard.persist(_))
    val cand = bands.as("a")
      .join(bands.as("b"),
        col("a.label") === col("b.label") && col("a.bucket") === col("b.bucket")
          && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        col("a.label").as("label"))
      .distinct()
    cand
      .join(e.select(col("vec_id").as("vec_a"), col("embedding").as("ea")), Seq("vec_a"))
      .join(e.select(col("vec_id").as("vec_b"), col("embedding").as("eb")), Seq("vec_b"))
      .select(col("vec_a"), col("vec_b"), col("label"),
        VectorOps.cosine(col("ea"), col("eb")).as("cosine"))
      .filter(col("cosine") >= 0.3)
  }

  // lazy: references plane()/Dim declared further down the object body —
  // a strict val would capture Dim while still 0 (init order) and emit
  // empty plane literals.
  lazy val dedupEmbeddingOracle: String = {
    val planeRows = (0 until DedupBands * DedupBandBits).map { p =>
      val vals = plane(p).map(d => s"CAST($d AS DOUBLE)").mkString(", ")
      s"($p, [$vals])"
    }.mkString(",\n      ")
    s"""
    WITH planes AS (
      SELECT * FROM (VALUES
      $planeRows) AS t(p, pv)),
    bits AS (
      SELECT e.vec_id, e.label, pl.p,
        CASE WHEN ${VectorOps.sqlDot("e.embedding", "pl.pv")} > 0
          THEN 1 ELSE 0 END AS bit
      FROM embeddings e CROSS JOIN planes pl),
    bands AS (
      SELECT vec_id, label,
        CAST((p // $DedupBandBits) * 16
          + SUM(bit * (1 << (p % $DedupBandBits))) AS BIGINT) AS bucket
      FROM bits GROUP BY vec_id, label, p // $DedupBandBits),
    cand AS (
      SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b, a.label
      FROM bands a JOIN bands b
        ON a.label = b.label AND a.bucket = b.bucket AND a.vec_id < b.vec_id)
    SELECT vec_a, vec_b, c.label,
      ${VectorOps.sqlCosine("ea.embedding", "eb.embedding")} AS cosine
    FROM cand c
    JOIN embeddings ea ON ea.vec_id = vec_a
    JOIN embeddings eb ON eb.vec_id = vec_b
    WHERE ${VectorOps.sqlCosine("ea.embedding", "eb.embedding")} >= 0.3"""
  }

  /** The cosine floor above which a corpus vector counts as
    * semantically contaminated by a benchmark vector — the same 0.3
    * verify floor as [[dedupEmbedding]] (this embedding space plants
    * its near-duplicate structure there), one literal shared by query
    * and oracle.
    */
  private[graft] val SemDecontamThreshold = 0.3

  /** Semantic benchmark decontamination — the paraphrase-robust
    * companion to the shingle-based `decontaminate` (an eval item
    * reworded shares no 3-shingle but still lands next to its source
    * in embedding space; n-gram screens miss exactly the leakage this
    * catches). Benchmark = vectors 0–4 (the decontaminate convention
    * transposed to the embeddings table); every corpus vector whose
    * exact cosine against ANY benchmark vector reaches the floor is
    * flagged with its closest benchmark (max cosine, smallest-id
    * tiebreak) — the review queue an eval owner walks before a
    * training run freezes its corpus.
    *
    * Scale: the benchmark side is tiny and BROADCAST — a map-side
    * nested-loop against the corpus scan, no corpus shuffle (the
    * annTopk shape); the argmax window partitions by the flagged
    * vector id over ≤|bench| rows each. At a real benchmark's size the
    * broadcast still holds (thousands of rows); past that the banded
    * LSH path (dedupEmbedding's bucketing) generates the candidates
    * instead.
    */
  def decontaminateSemantic(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val bench = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("bench_id"), col("embedding").as("be"))
    val corpus = e.filter(col("vec_id") >= 5)
      .select(col("vec_id"), col("embedding"))
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("cosine").desc, col("bench_id").asc)
    corpus.crossJoin(broadcast(bench))
      .select(col("vec_id"), col("bench_id"),
        VectorOps.cosine(col("embedding"), col("be")).as("cosine"))
      .filter(col("cosine") >= SemDecontamThreshold)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") === 1)
      .select(col("vec_id"), col("bench_id").as("closest_bench"), col("cosine"))
  }

  val decontaminateSemanticOracle: String = s"""
    WITH b AS (
      SELECT vec_id AS bench_id, embedding AS be
      FROM embeddings WHERE vec_id < 5),
    c AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id >= 5),
    p AS (
      SELECT vec_id, bench_id,
        ${VectorOps.sqlCosine("c.embedding", "b.be")} AS cosine
      FROM c CROSS JOIN b),
    hit AS (
      SELECT vec_id, bench_id, cosine,
        ROW_NUMBER() OVER (PARTITION BY vec_id
          ORDER BY cosine DESC, bench_id ASC) AS rank
      FROM p WHERE cosine >= $SemDecontamThreshold)
    SELECT vec_id, bench_id AS closest_bench, cosine
    FROM hit WHERE rank = 1"""

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

  /** Random-hyperplane LSH ANN: 6 fixed pseudo-random hyperplanes → 6
    * sign bits → bucket id. Queries probe only their own bucket; top-3
    * within bucket by exact cosine. The scale path: bucket fan-out
    * divides candidate volume by ~2^6 with high recall on near vectors
    * (sign agreement probability 1 − θ/π per plane). Hash-checked: the
    * bucketing is mirrored in SQL via plane literals.
    *
    * Sizing note: the plane COUNT tracks the corpus at fixed target
    * bucket population (p ≈ log2(n / bucket_size)) — unlike kmeans' k,
    * it is not derived at runtime here, because each plane is an
    * expression TERM (the oracle's structure would have to vary, not
    * just a value) and because p only moves logarithmically: one added
    * plane absorbs a 2× corpus. A probe query's candidate set is a
    * single bucket either way, so a conservative p degrades cost, never
    * recall.
    */
  private val Dim = 64
  private val NPlanes = 6

  /** Deterministic "random" hyperplanes: component (p,d) derives from a
    * fixed LCG — reproducible across runs and executors.
    *
    * Components are rounded to FLOAT precision (then widened back):
    * FloatDot implicit-casts its array<double> plane literal operand to
    * array<float>, so a full-mantissa double component would lose bits
    * on the Spark side while the DuckDB oracle kept them — flipping the
    * sign of near-zero dots and desyncing buckets. Float-representable
    * components make the cast exact, so both engines multiply the SAME
    * doubles and the sign bits agree bit-for-bit.
    */
  private def plane(p: Int): Array[Double] = {
    var state = 0x9E3779B97F4A7C15L * (p + 1)
    Array.fill(Dim) {
      state = state * 6364136223846793005L + 1442695040888963407L
      (((state >>> 11).toDouble / (1L << 53).toDouble) - 0.5).toFloat.toDouble
    }
  }

  private def planeCol(p: Int): Column =
    array(plane(p).map(lit(_)): _*)

  private def bucketOf(v: Column): Column =
    (0 until NPlanes).map { p =>
      when(VectorOps.dot(v, planeCol(p)) > 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** SQL mirror of [[bucketOf]]: the 6 sign bits recomposed as a bigint,
    * planes emitted as literals (same technique as the dedup_embedding
    * oracle) — so the bucketed ANN path is hash-checked end to end.
    */
  private def sqlBucketOf(vec: String): String = {
    val terms = (0 until NPlanes).map { p =>
      val vals = plane(p).map(d => s"CAST($d AS DOUBLE)").mkString(", ")
      s"(CASE WHEN ${VectorOps.sqlDot(vec, s"[$vals]")} > 0 THEN ${1L << p} ELSE 0 END)"
    }
    s"CAST(${terms.mkString(" + ")} AS BIGINT)"
  }

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

  lazy val annLshOracle: String = s"""
    WITH e AS (
      SELECT vec_id, embedding, ${sqlBucketOf("embedding")} AS bucket
      FROM embeddings)
    SELECT query_id, neighbor_id, bucket, cosine, rank FROM (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, q.bucket,
        ${VectorOps.sqlCosine("q.embedding", "c.embedding")} AS cosine,
        ROW_NUMBER() OVER (PARTITION BY q.vec_id
          ORDER BY ${VectorOps.sqlCosine("q.embedding", "c.embedding")} DESC,
            c.vec_id ASC) AS rank
      FROM (SELECT * FROM e WHERE vec_id < 10) q
      JOIN e c ON q.bucket = c.bucket AND q.vec_id <> c.vec_id)
    WHERE rank <= 3"""

  /** Multi-probe LSH ANN (Lv et al. 2007): the recall/cost knob between
    * [[annLsh]] (one bucket, cheapest) and [[annTopk]] (all buckets,
    * exact). Each query probes its OWN bucket plus every bucket at
    * Hamming distance 1 in sign-bit space — the [[NPlanes]] single-bit
    * flips — because a true near neighbor that landed elsewhere most
    * likely disagrees on exactly one near-zero hyperplane dot. 7 probes
    * recover most of the recall a second independent hash table would,
    * WITHOUT a second index build or another corpus-wide pass; exact
    * cosine then re-ranks the union to top-5. This two-stage
    * candidates→refine shape is the standard production retrieval plan.
    *
    * Scale: probe fan-out multiplies only the (tiny, broadcast) query
    * side — the corpus is bucketed once and never shuffled; per-query
    * candidate volume is ~(NPlanes+1)/2^NPlanes of the corpus. Each
    * candidate pairs with a query through at most ONE probe (a vector
    * has one bucket; a query's probe buckets are distinct), so the join
    * needs no dedup.
    */
  /** The multi-probe bucket array for a query whose own bucket is
    * `bucket`: itself plus every Hamming-1 sign-flip. Shared with the
    * on-disk index probe ([[graft.sources.AnnIndex]]).
    */
  private[graft] def probeBucketsOf(bucket: Column): Column =
    array(bucket +: (0 until NPlanes).map(p =>
      bucket.bitwiseXOR(lit(1L << p))): _*)

  /** Bucket assignment for an embedding column — exposed for the
    * on-disk index build ([[graft.sources.AnnIndex]]).
    */
  private[graft] def bucketColumn(v: Column): Column = bucketOf(v)

  def annRefine(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
      .withColumn("bucket", bucketOf(col("embedding")))
    val probes = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
        explode(probeBucketsOf(col("bucket"))).as("bucket"))
    val cand = e.select(col("vec_id").as("neighbor_id"), col("embedding").as("ce"),
      col("bucket"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    broadcast(probes).join(cand, Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        VectorOps.cosine(col("qe"), col("ce")).as("cosine"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
  }

  lazy val annRefineOracle: String = {
    val probeList = ("bucket" +: (0 until NPlanes).map(p =>
      s"xor(bucket, ${1L << p})")).mkString(", ")
    s"""
    WITH e AS (
      SELECT vec_id, embedding, ${sqlBucketOf("embedding")} AS bucket
      FROM embeddings),
    probes AS (
      SELECT vec_id AS query_id, embedding AS qe,
        UNNEST([$probeList]) AS bucket
      FROM e WHERE vec_id < 10)
    SELECT query_id, neighbor_id, cosine, rank FROM (
      SELECT p.query_id, c.vec_id AS neighbor_id,
        ${VectorOps.sqlCosine("p.qe", "c.embedding")} AS cosine,
        ROW_NUMBER() OVER (PARTITION BY p.query_id
          ORDER BY ${VectorOps.sqlCosine("p.qe", "c.embedding")} DESC,
            c.vec_id ASC) AS rank
      FROM probes p JOIN e c ON p.bucket = c.bucket AND p.query_id <> c.vec_id)
    WHERE rank <= 5"""
  }

  /** Incremental SEMANTIC dedup — the rolling-corpus mode of semdedup/
    * dedup_embedding, mirroring `dedup_incremental`'s operational
    * contract at the embedding layer: the corpus is already bucketed
    * (its (vec_id, bucket) rows are the materialized
    * [[graft.sources.AnnIndex]] lake table in production; recomputed
    * here from the same [[bucketColumn]] pipeline — R15OpsSpec pins
    * probe-from-disk ≡ probe-from-recompute), and each arriving BATCH
    * probes that index instead of re-clustering the world. Batch
    * membership is the dedup_incremental hash slice (vec_id % 10 = 7 ≈
    * 10% of vectors) so the query is SF-independent and
    * oracle-mirrorable.
    *
    * Probing is [[annRefine]]'s multi-probe discipline (own bucket ∪
    * the [[NPlanes]] Hamming-1 sign flips) with exact-cosine verify at
    * the [[SemDecontamThreshold]] floor (this embedding space's
    * near-duplicate band, shared with dedup_embedding /
    * decontaminate_semantic). Output follows the report-the-population
    * rule: EVERY batch vector with its verdict, closest indexed
    * neighbor (max cosine, smallest-id tiebreak) and that cosine —
    * NULL neighbor when no probed bucket held a candidate, never a
    * dropped row.
    *
    * Scale shape: the corpus side is bucketed map-side and NEVER
    * shuffles — the (small, broadcast) probe batch fans out ×(planes+1)
    * and meets the index on the bucket key, so per-batch cost is
    * O(batch × 2^-planes · corpus) regardless of corpus size, and
    * against the on-disk index the probe set prunes to
    * ~(planes+1)/2^planes of the partitions (AnnIndex's static
    * partition filter). In-batch near-dups are the NEXT index build's
    * problem — exactly how a rolling semantic-dedup service works.
    */
  def semdedupIncremental(spark: SparkSession, dir: String): DataFrame = {
    val bucketed = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"),
        bucketOf(col("embedding")).as("bucket"))
      .transform(graft.functions.PlanGuard.persist(_))
    val index = bucketed.filter(col("vec_id") % 10 =!= 7)
      .select(col("vec_id").as("indexed_id"), col("embedding").as("ce"),
        col("bucket"))
    val probes = bucketed.filter(col("vec_id") % 10 === 7)
      .select(col("vec_id"), col("embedding").as("qe"),
        explode(probeBucketsOf(col("bucket"))).as("bucket"))
    // a candidate meets a probe through at most ONE bucket (a vector
    // has one bucket; a query's probe buckets are distinct) — no dedup
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("cosine").desc, col("indexed_id").asc)
    val best = broadcast(probes).join(index, Seq("bucket"))
      .select(col("vec_id"), col("indexed_id"),
        VectorOps.cosine(col("qe"), col("ce")).as("cosine"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") === 1)
      .select(col("vec_id"), col("indexed_id").as("best_indexed"),
        col("cosine").as("best_cosine"))
    bucketed.filter(col("vec_id") % 10 === 7).select(col("vec_id"))
      .join(best, Seq("vec_id"), "left")
      .select(col("vec_id"),
        coalesce(col("best_cosine") >= SemDecontamThreshold, lit(false))
          .as("is_dup"),
        col("best_indexed"), col("best_cosine"))
  }

  lazy val semdedupIncrementalOracle: String = {
    val probeList = ("bucket" +: (0 until NPlanes).map(p =>
      s"xor(bucket, ${1L << p})")).mkString(", ")
    s"""
    WITH e AS MATERIALIZED (
      SELECT vec_id, embedding, ${sqlBucketOf("embedding")} AS bucket
      FROM embeddings),
    probes AS (
      SELECT vec_id, embedding AS qe, UNNEST([$probeList]) AS bucket
      FROM e WHERE vec_id % 10 = 7),
    best AS (
      SELECT vec_id, indexed_id AS best_indexed, cosine AS best_cosine
      FROM (
        SELECT p.vec_id, c.vec_id AS indexed_id,
          ${VectorOps.sqlCosine("p.qe", "c.embedding")} AS cosine,
          ROW_NUMBER() OVER (PARTITION BY p.vec_id
            ORDER BY ${VectorOps.sqlCosine("p.qe", "c.embedding")} DESC,
              c.vec_id ASC) AS rn
        FROM probes p JOIN e c
          ON p.bucket = c.bucket AND c.vec_id % 10 <> 7)
      WHERE rn = 1)
    SELECT b.vec_id,
      COALESCE(best_cosine >= $SemDecontamThreshold, FALSE) AS is_dup,
      best_indexed, best_cosine
    FROM (SELECT vec_id FROM e WHERE vec_id % 10 = 7) b
    LEFT JOIN best USING (vec_id)"""
  }

  /** IVF-style ANN: a deterministic coarse quantizer
    * (every 50th vector serves as a centroid — at scale: k-means fitted
    * offline and broadcast), vectors assigned to their nearest centroid
    * (inverted lists), queries probe the 2 nearest lists only. The other
    * 100 TB path besides LSH: probe cost scales with corpus/k · nprobe.
    * Hash-checked end to end (assignment + probing mirrored in SQL).
    */
  def annIvf(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val cents = e.filter(pmod(col("vec_id"), lit(50)) === 0)
      .select(col("vec_id").as("cent_id"), col("embedding").as("ce"))
    def nearestCentroids(vecs: DataFrame, idCol: String, vecCol: String, n: Int) = {
      val w = Window.partitionBy(col(idCol))
        .orderBy(col("cent_cos").desc, col("cent_id").asc)
      // Quantizer table = centroid-dimension state (corpus/50 rows here;
      // k-means-sized offline at scale). Vector rows are ~8·dim B, so the
      // stateHint ceiling is ~10⁶-10⁷ centroids; the conf flips to a
      // shuffle join past it.
      vecs.crossJoin(Tables.stateHint(cents))
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

  lazy val annIvfOracle: String = {
    def nearest(src: String, idAlias: String, vecAlias: String, n: Int) = s"""
      SELECT $idAlias, $vecAlias, cent_id FROM (
        SELECT v.vec_id AS $idAlias, v.embedding AS $vecAlias, c.cent_id,
          ROW_NUMBER() OVER (PARTITION BY v.vec_id
            ORDER BY ${VectorOps.sqlCosine("v.embedding", "c.ce")} DESC,
              c.cent_id ASC) AS cent_rank
        FROM ($src) v CROSS JOIN cents c)
      WHERE cent_rank <= $n"""
    s"""
    WITH cents AS (
      SELECT vec_id AS cent_id, embedding AS ce
      FROM embeddings WHERE vec_id % 50 = 0),
    assigned AS (${nearest("SELECT * FROM embeddings", "neighbor_id", "cv", 1)}),
    probes AS (${nearest("SELECT * FROM embeddings WHERE vec_id < 10", "query_id", "qe", 2)})
    SELECT query_id, neighbor_id, cent_id, cosine, rank FROM (
      SELECT p.query_id, a.neighbor_id, p.cent_id,
        ${VectorOps.sqlCosine("p.qe", "a.cv")} AS cosine,
        ROW_NUMBER() OVER (PARTITION BY p.query_id
          ORDER BY ${VectorOps.sqlCosine("p.qe", "a.cv")} DESC,
            a.neighbor_id ASC) AS rank
      FROM probes p JOIN assigned a ON p.cent_id = a.cent_id
      WHERE p.query_id <> a.neighbor_id)
    WHERE rank <= 3"""
  }

  /** IVF over the TRAINED quantizer — closes [[annIvf]]'s "at scale the
    * codebook is k-means fitted offline" note with the repo's own Lloyd
    * training ([[Clustering.finalCentroids]]: corpus-derived k,
    * fixed-point float32 centroids). Inverted lists use the SAME
    * nearest-centroid assignment as cluster_kmeans (L2 argmin, smaller-
    * cid ties); queries probe their 2 nearest cells by the same metric;
    * exact cosine re-ranks the probed lists to top-3. Hash-checked end
    * to end: the oracle chains the unrolled Lloyd CTEs into the probe
    * SQL, so training + assignment + probing all verify.
    *
    * Scale: training cost amortizes over every probe (the centroid
    * table is the [[graft.Tables.stateHint]]-guarded k-row frame);
    * per-probe cost is corpus/k · nprobe, and k GROWS with the corpus
    * at fixed cell size, so probe cost stays ~constant per query as the
    * index scales — the property modular sampling (ann_ivf's stand-in
    * quantizer) only approximates.
    */
  def annIvfTrained(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    val cents = Clustering.finalCentroids(spark, dir)
    val assigned = Clustering.assign(e, cents)
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"),
        col("cid"))
    val wProbe = Window.partitionBy(col("query_id"))
      .orderBy(col("cd2").asc, col("cid").asc)
    val probes = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
      .crossJoin(graft.Tables.stateHint(cents))
      .withColumn("cd2", Clustering.d2(col("qe"), col("cv")))
      .withColumn("rn", row_number().over(wProbe))
      .filter(col("rn") <= 2)
      .select(col("query_id"), col("qe"), col("cid"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    broadcast(probes).join(assigned, Seq("cid"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), col("cid"),
        VectorOps.cosine(col("qe"), col("cv")).as("cosine"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
  }

  lazy val annIvfTrainedOracle: String = s"""
    WITH ${Clustering.kmeansCtes},
    cents AS MATERIALIZED (
      SELECT cid, cv FROM ${Clustering.kmeansFinalRel}),
    assigned AS (${Clustering.assignSql("cents")}),
    probes AS (
      SELECT query_id, qe, cid FROM (
        SELECT e.vec_id AS query_id, e.embedding AS qe, c.cid,
          ROW_NUMBER() OVER (PARTITION BY e.vec_id
            ORDER BY ${Clustering.sqlD2("e.embedding", "c.cv")} ASC,
              c.cid ASC) AS rn
        FROM (SELECT * FROM embeddings WHERE vec_id < 10) e
        CROSS JOIN cents c)
      WHERE rn <= 2)
    SELECT query_id, neighbor_id, cid, cosine, rank FROM (
      SELECT p.query_id, a.vec_id AS neighbor_id, p.cid,
        ${VectorOps.sqlCosine("p.qe", "a.embedding")} AS cosine,
        ROW_NUMBER() OVER (PARTITION BY p.query_id
          ORDER BY ${VectorOps.sqlCosine("p.qe", "a.embedding")} DESC,
            a.vec_id ASC) AS rank
      FROM probes p JOIN assigned a ON p.cid = a.cid
      WHERE p.query_id <> a.vec_id)
    WHERE rank <= 3"""

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
    // err·err, never pow(err, 2): libm pow is not FP-portable (it cost a
    // 1-ulp oracle drift at sf0.1); a plain IEEE multiply is exact-same
    // everywhere.
    def err(x: org.apache.spark.sql.Column) =
      x.cast("double") - quant(x) * scale
    val sqErr = aggregate(e, lit(0.0), (acc, x) =>
      acc + err(x) * err(x))
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
    val err = s"(CAST(x AS DOUBLE) - FLOOR(CAST(x AS DOUBLE) / $scale + 0.5) * $scale)"
    val sqErr = "LIST_REDUCE(LIST_PREPEND(CAST(0 AS DOUBLE), " +
      s"LIST_TRANSFORM(embedding, x -> $err * $err)), (a, b) -> a + b)"
    s"""
    SELECT vec_id, $scale AS scale,
      $sqErr / CAST(LEN(embedding) AS DOUBLE) AS mse
    FROM embeddings"""
  }

  /** MMR diversity re-ranking — the serving-side step after ANN
    * retrieval (Carbonell & Goldstein 1998): from each query's top-
    * [[MmrPool]] brute-force candidates, greedily select [[MmrK]]
    * results maximizing `λ·cos(q,d) − (1−λ)·max_{s∈S} cos(d,s)`, so
    * near-duplicate neighbors don't crowd the result list — the
    * redundancy problem exact top-k has on a deduplicated-but-clustered
    * corpus. λ and 1−λ are SEPARATE double literals (0.7 / 0.3): the
    * engines would disagree on `1 − 0.7` rounding.
    *
    * Scale shape: the candidate pool is top-k-bounded per query, so the
    * pairwise-similarity frame is k² rows PER QUERY — linear in query
    * count, never corpus-quadratic; pool and pairs are checkpointed
    * once and the [[MmrK]] greedy rounds (unrolled, like kmeans) touch
    * only those bounded frames. Ties broken (mmr DESC, cand ASC) in
    * both engines; round-1 mmr is λ·cos with an empty penalty term.
    *
    * NOTE (r16 ADVICE): the greedy rounds run driver-side on bounded
    * collects, so constructing this DataFrame EXECUTES the pool/pairs
    * Spark jobs eagerly — plan-only tooling (explain, PlanDump) pays
    * that execution; the returned plan is the final LocalRelation.
    */
  private val MmrLambda = 0.7
  private val MmrGamma = 0.3
  private val MmrPool = 20
  private val MmrK = 5

  def mmrRerank(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.Iterate.checkpoint
    val e = Tables.embeddings(spark, dir)
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    val cand = e.select(col("vec_id").as("cand_id"), col("embedding").as("ce"))
    val wPool = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_q").desc, col("cand_id").asc)
    val pool = checkpoint(
      broadcast(q).join(cand, col("query_id") =!= col("cand_id"))
        .select(col("query_id"), col("cand_id"), col("ce"),
          VectorOps.cosine(col("qe"), col("ce")).as("cos_q"))
        .withColumn("prank", row_number().over(wPool))
        .filter(col("prank") <= MmrPool)
        .select(col("query_id"), col("cand_id"), col("ce"), col("cos_q")))
    // The greedy state is CONSTANT-bounded: 10 probe queries ×
    // [[MmrPool]] candidates (≤ 200 pool rows, ≤ 10·20·19 pair rows) at
    // any corpus size — only the pool construction above touches the
    // corpus. The [[MmrK]] selection rounds therefore run driver-side
    // on the collected Spark-computed cosines (the kcenter/AnnIndex
    // bounded-collect discipline): the old unrolled-DataFrame loop paid
    // ~4 stages per round iterating ≤ 200-row frames (guide §1.2 —
    // remove passes before tuning them). Cosines come from the SAME
    // [[VectorOps.cosine]] fold, and the greedy update is the same
    // λ·cos_q − γ·max_sim double arithmetic with the same (mmr DESC,
    // cand ASC) tie order, so the selection is bit-identical.
    val pairRows = pool
      .select(col("query_id"), col("cand_id").as("a_id"), col("ce").as("ae"))
      .join(pool.select(col("query_id"), col("cand_id").as("b_id"),
        col("ce").as("be")), Seq("query_id"))
      .filter(col("a_id") =!= col("b_id"))
      .select(col("query_id"), col("a_id"), col("b_id"),
        VectorOps.cosine(col("ae"), col("be")).as("cos_ab"))
      .collect() // bounded: queries × MmrPool × (MmrPool − 1)
    val baseRows = pool.select(col("query_id"), col("cand_id"), col("cos_q"))
      .collect() // bounded: queries × MmrPool
    val simAb = pairRows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))
      -> r.getDouble(3)).toMap
    val byQuery = baseRows.groupBy(_.getLong(0))
    val out = byQuery.keys.toSeq.sorted.flatMap { qid =>
      val cands = byQuery(qid)
        .map(r => r.getLong(1) -> r.getDouble(2)).sortBy(_._1)
      val selected = scala.collection.mutable.ArrayBuffer[Long]()
      (1 to MmrK).flatMap { round =>
        val rem = cands.filterNot(c => selected.contains(c._1))
        if (rem.isEmpty) None
        else {
          val scored = rem.map { case (cid, cosQ) =>
            val mmr =
              if (round == 1) MmrLambda * cosQ
              else {
                val maxSim = selected
                  .map(b => simAb.getOrElse((qid, cid, b), 0.0)).max
                MmrLambda * cosQ - MmrGamma * maxSim
              }
            (cid, mmr)
          }
          // (mmr DESC, cand ASC) under SPARK's ordering, not Scala's
          // tuple order (r16 ADVICE): normalize −0.0 to +0.0 (Spark and
          // DuckDB treat signed zeros equal; Scala's TotalOrdering does
          // not) and compare with java.lang.Double.compare, whose
          // NaN-greatest rule matches both engines' DESC-first-NaN —
          // zero-norm embeddings yield NaN cosines, and the old negated
          // minBy sorted those LAST instead of first. Identical to the
          // previous selection for every finite non-±0-tied score.
          def norm(d: Double): Double = if (d == 0.0) 0.0 else d
          val (cid, mmr) = scored.reduceLeft { (best, c) =>
            val cmp = java.lang.Double.compare(norm(c._2), norm(best._2))
            if (cmp > 0 || (cmp == 0 && c._1 < best._1)) c else best
          }
          selected += cid
          Some((qid, round, cid,
            math.floor(mmr * 1.0e8 + 0.5) / 1.0e8))
        }
      }
    }
    import spark.implicits._
    out.toDF("query_id", "round", "neighbor_id", "mmr_score")
  }

  lazy val mmrRerankOracle: String = {
    val cos = VectorOps.sqlCosine("q.qe", "c.embedding")
    val rounds = (2 to MmrK).map { k =>
      s"""selu${k - 1} AS (${(1 to k - 1).map(i => s"SELECT * FROM sel$i")
        .mkString(" UNION ALL ")}),
    sel$k AS (
      SELECT query_id, cand_id, mmr, $k AS round FROM (
        SELECT r.query_id, r.cand_id,
          CAST($MmrLambda AS DOUBLE) * r.cos_q
            - CAST($MmrGamma AS DOUBLE) * COALESCE(m.max_sim, CAST(0 AS DOUBLE))
            AS mmr,
          ROW_NUMBER() OVER (PARTITION BY r.query_id ORDER BY
            CAST($MmrLambda AS DOUBLE) * r.cos_q
              - CAST($MmrGamma AS DOUBLE) * COALESCE(m.max_sim, CAST(0 AS DOUBLE))
              DESC, r.cand_id ASC) AS rk
        FROM (SELECT p.* FROM pool p LEFT JOIN selu${k - 1} s
                ON p.query_id = s.query_id AND p.cand_id = s.cand_id
              WHERE s.cand_id IS NULL) r
        LEFT JOIN (
          SELECT pr.query_id, pr.a_id, MAX(pr.cos_ab) AS max_sim
          FROM pairs pr JOIN selu${k - 1} s
            ON pr.query_id = s.query_id AND pr.b_id = s.cand_id
          GROUP BY 1, 2) m
          ON r.query_id = m.query_id AND r.cand_id = m.a_id)
      WHERE rk = 1)"""
    }.mkString(",\n    ")
    s"""
    WITH q AS (
      SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 10),
    pool AS MATERIALIZED (
      SELECT query_id, cand_id, ce, cos_q FROM (
        SELECT q.query_id, c.vec_id AS cand_id, c.embedding AS ce,
          $cos AS cos_q,
          ROW_NUMBER() OVER (PARTITION BY q.query_id
            ORDER BY $cos DESC, c.vec_id ASC) AS prank
        FROM q JOIN embeddings c ON q.query_id <> c.vec_id)
      WHERE prank <= $MmrPool),
    pairs AS MATERIALIZED (
      SELECT a.query_id, a.cand_id AS a_id, b.cand_id AS b_id,
        ${VectorOps.sqlCosine("a.ce", "b.ce")} AS cos_ab
      FROM pool a JOIN pool b
        ON a.query_id = b.query_id AND a.cand_id <> b.cand_id),
    sel1 AS (
      SELECT query_id, cand_id, mmr, 1 AS round FROM (
        SELECT query_id, cand_id, CAST($MmrLambda AS DOUBLE) * cos_q AS mmr,
          ROW_NUMBER() OVER (PARTITION BY query_id
            ORDER BY CAST($MmrLambda AS DOUBLE) * cos_q DESC, cand_id ASC) AS rk
        FROM pool)
      WHERE rk = 1),
    $rounds
    SELECT query_id, round, cand_id AS neighbor_id,
      CAST(FLOOR(mmr * 1.0e8 + 0.5) AS DOUBLE) / 1.0e8 AS mmr_score
    FROM (${(1 to MmrK).map(i => s"SELECT * FROM sel$i").mkString(" UNION ALL ")})"""
  }

  /** Embedding-space health audit — per label: vector count, norm
    * spread (min/max/mean L2). Run before trusting cosine anywhere: a
    * label with near-zero or wildly spread norms signals broken
    * embeddings (cosine of a ~0 vector is noise; unnormalized mixtures
    * skew dot-product ANN). One label-keyed aggregate over per-row
    * norms; the mean rides the fixed-point integer sum (the
    * quality_calibration discipline), min/max are exact double folds.
    */
  def embeddingNormAudit(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val n = VectorOps.norm(col("embedding"))
    Tables.embeddings(spark, dir)
      .select(col("label"), n.as("nm"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_vecs"),
        min(col("nm")).as("min_norm"),
        max(col("nm")).as("max_norm"),
        (sum(floor(col("nm") * lit(1.0e6) + lit(0.5)).cast(DecimalType(38, 0)))
          .cast("double") / lit(1.0e6) / count(lit(1)).cast("double"))
          .as("mean_norm"))
  }

  val embeddingNormAuditOracle: String = {
    val nm = VectorOps.sqlNorm("embedding")
    s"""
    SELECT label,
      COUNT(*) AS n_vecs,
      MIN(nm) AS min_norm,
      MAX(nm) AS max_norm,
      CAST(SUM(CAST(FLOOR(nm * 1.0e6 + 0.5) AS HUGEINT)) AS DOUBLE) / 1.0e6
        / CAST(COUNT(*) AS DOUBLE) AS mean_norm
    FROM (SELECT label, $nm AS nm FROM embeddings)
    GROUP BY label"""
  }

  /** ANN recall audit — the eval loop for the index family: per query,
    * how much of the BRUTE-FORCE top-3 ([[annTopk]], the ground truth)
    * does the LSH index ([[annLsh]]) recover? All-integer recall ppm.
    * The audit is pure composition of two hash-verified operators, so
    * at 100 TB it costs one extra |queries|-sized join — the index scan
    * dominates. Low recall here is the signal to add planes/probes
    * (ann_refine) before trusting the index path.
    */
  def annRecallAudit(spark: SparkSession, dir: String): DataFrame = {
    val truth = annTopk(spark, dir).filter(col("rank") <= 3)
      .select(col("query_id"), col("neighbor_id"))
    val got = annLsh(spark, dir)
      .select(col("query_id"), col("neighbor_id"), lit(true).as("hit"))
    truth.join(got, Seq("query_id", "neighbor_id"), "left")
      .groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_truth"),
        count(col("hit")).as("n_hits"))
      .withColumn("recall_ppm", expr("(n_hits * 1000000) div n_truth"))
  }

  lazy val annRecallAuditOracle: String = s"""
    WITH truth AS (
      SELECT query_id, neighbor_id FROM ($annTopkOracle) t WHERE rank <= 3),
    got AS (
      SELECT query_id, neighbor_id FROM ($annLshOracle) g)
    SELECT t.query_id,
      COUNT(*) AS n_truth,
      CAST(COUNT(g.neighbor_id) AS BIGINT) AS n_hits,
      (CAST(COUNT(g.neighbor_id) AS BIGINT) * 1000000) // COUNT(*) AS recall_ppm
    FROM truth t LEFT JOIN got g
      ON t.query_id = g.query_id AND t.neighbor_id = g.neighbor_id
    GROUP BY t.query_id"""

  /** IVF nprobe tuning curve — recall@3 of the TRAINED-quantizer index
    * at nprobe = 1..4, against the exact cosine top-3 ([[annIvfTrained]]
    * ships nprobe = 2 as policy; this table is the evidence the policy
    * is read off — the dedup_threshold_sweep discipline applied to the
    * ANN index: one pass, every candidate setting priced, and "does
    * probing a third cell buy anything?" answered with a number).
    * Mechanics: queries rank ALL cells by the same L2-argmin metric as
    * the index assignment (smaller-cid ties), the probe set at level
    * np is cells ranked ≤ np, per-(query, np) exact-cosine re-rank to
    * top-3, hits counted against the brute-force truth. All-integer
    * reporting (hits, truth size, recall ppm via floor division) per
    * nprobe level. Scale: the assignment is the shared broadcast-state
    * pass (checkpointed — all four probe levels read it); the per-level
    * candidate volume is nprobe·corpus/k per query, the windows
    * partition by (query, level), and the 10-query truth join is the
    * audit's documented brute-force cost (the same 10-probe frame every
    * ANN audit here uses).
    */
  def annNprobeSweep(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    val cents = Clustering.finalCentroids(spark, dir)
    val assigned = graft.functions.Iterate.checkpoint(
      Clustering.assign(e, cents)
        .select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"),
          col("cid")))
    val wProbe = Window.partitionBy(col("query_id"))
      .orderBy(col("cd2").asc, col("cid").asc)
    val probes = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
      .crossJoin(graft.Tables.stateHint(cents))
      .withColumn("cd2", Clustering.d2(col("qe"), col("cv")))
      .withColumn("cell_rank", row_number().over(wProbe))
      .filter(col("cell_rank") <= 4)
      .select(col("query_id"), col("qe"), col("cid"), col("cell_rank"))
    val levels = spark.range(1, 5).select(col("id").as("np"))
    val wTop = Window.partitionBy(col("query_id"), col("np"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    val approx = broadcast(probes).join(assigned, Seq("cid"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .crossJoin(broadcast(levels))
      .filter(col("cell_rank") <= col("np"))
      .select(col("np"), col("query_id"), col("neighbor_id"),
        VectorOps.cosine(col("qe"), col("cv")).as("cosine"))
      .withColumn("rn", row_number().over(wTop))
      .filter(col("rn") <= 3)
    val truth = annTopk(spark, dir).filter(col("rank") <= 3)
      .select(col("query_id"), col("neighbor_id"), lit(true).as("in_truth"))
    approx.join(truth, Seq("query_id", "neighbor_id"), "left")
      .groupBy(col("np"))
      .agg(countDistinct(col("query_id")).as("n_queries"),
        count(lit(1)).as("n_returned"),
        count(col("in_truth")).as("n_hits"))
      .withColumn("recall_ppm",
        expr("(n_hits * 1000000) div (n_queries * 3)"))
  }

  lazy val annNprobeSweepOracle: String = s"""
    WITH ${Clustering.kmeansCtes},
    cents AS MATERIALIZED (
      SELECT cid, cv FROM ${Clustering.kmeansFinalRel}),
    assigned AS (${Clustering.assignSql("cents")}),
    probes AS (
      SELECT query_id, qe, cid, cell_rank FROM (
        SELECT e.vec_id AS query_id, e.embedding AS qe, c.cid,
          ROW_NUMBER() OVER (PARTITION BY e.vec_id
            ORDER BY ${Clustering.sqlD2("e.embedding", "c.cv")} ASC,
              c.cid ASC) AS cell_rank
        FROM (SELECT * FROM embeddings WHERE vec_id < 10) e
        CROSS JOIN cents c)
      WHERE cell_rank <= 4),
    approx AS (
      SELECT np, query_id, neighbor_id FROM (
        SELECT l.np, p.query_id, a.vec_id AS neighbor_id,
          ROW_NUMBER() OVER (PARTITION BY p.query_id, l.np
            ORDER BY ${VectorOps.sqlCosine("p.qe", "a.embedding")} DESC,
              a.vec_id ASC) AS rn
        FROM probes p JOIN assigned a ON p.cid = a.cid
        CROSS JOIN (SELECT UNNEST(RANGE(1, 5)) AS np) l
        WHERE p.query_id <> a.vec_id AND p.cell_rank <= l.np)
      WHERE rn <= 3),
    truth AS (
      SELECT query_id, neighbor_id FROM ($annTopkOracle) t WHERE rank <= 3)
    SELECT np, COUNT(DISTINCT a.query_id) AS n_queries,
      COUNT(*) AS n_returned,
      CAST(COUNT(t.neighbor_id) AS BIGINT) AS n_hits,
      (CAST(COUNT(t.neighbor_id) AS BIGINT) * 1000000)
        // (COUNT(DISTINCT a.query_id) * 3) AS recall_ppm
    FROM approx a LEFT JOIN truth t
      ON a.query_id = t.query_id AND a.neighbor_id = t.neighbor_id
    GROUP BY np"""

  /** Embedding-distribution drift audit — the training/serving-skew
    * check an ML platform runs between two cohorts of the same
    * embedding column (here: even vs odd vec_ids as the two "windows";
    * production swaps in yesterday/today): per label, the squared L2
    * distance between the cohort CENTROIDS. All arithmetic is exact
    * fixed-point: every coordinate quantizes to integer µ-units
    * (floor(v·1e6 + 0.5) — float sums in shuffle order would make the
    * centroid itself nondeterministic), per-(label, cohort, dim) sums
    * are integer, the centroid cell is one integer division, and the
    * drift is an integer sum of squared cell differences. One
    * posexplode scan + two label-keyed folds; 64-dim cells keep every
    * sum far under 2⁶³.
    */
  def embeddingDrift(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("label").cast("long").as("label"),
        (col("vec_id") % 2 === 0).as("h0"),
        posexplode(col("embedding")).as(Seq("dim", "v")))
      .withColumn("v_fp",
        floor(col("v").cast("double") * lit(1000000d) + lit(0.5d)))
      .groupBy(col("label"), col("dim"))
      .agg(
        sum(when(col("h0"), col("v_fp")).otherwise(0L)).as("s0"),
        sum(when(col("h0"), 1L).otherwise(0L)).as("c0"),
        sum(when(!col("h0"), col("v_fp")).otherwise(0L)).as("s1"),
        sum(when(!col("h0"), 1L).otherwise(0L)).as("c1"))
      .filter(col("c0") > 0 && col("c1") > 0)
      .withColumn("m0", expr("s0 div c0"))
      .withColumn("m1", expr("s1 div c1"))
      .groupBy(col("label"))
      .agg(
        max(col("c0")).as("n_even"),
        max(col("c1")).as("n_odd"),
        sum((col("m0") - col("m1")) * (col("m0") - col("m1")))
          .as("drift_sq_microunits"))

  val embeddingDriftOracle: String = """
    SELECT label, MAX(c0) AS n_even, MAX(c1) AS n_odd,
      CAST(SUM((s0 // c0 - s1 // c1) * (s0 // c0 - s1 // c1)) AS BIGINT)
        AS drift_sq_microunits
    FROM (
      SELECT CAST(label AS BIGINT) AS label, dim,
        CAST(SUM(CASE WHEN vec_id % 2 = 0 THEN v_fp ELSE 0 END)
          AS BIGINT) AS s0,
        CAST(SUM(CASE WHEN vec_id % 2 = 0 THEN 1 ELSE 0 END)
          AS BIGINT) AS c0,
        CAST(SUM(CASE WHEN vec_id % 2 = 1 THEN v_fp ELSE 0 END)
          AS BIGINT) AS s1,
        CAST(SUM(CASE WHEN vec_id % 2 = 1 THEN 1 ELSE 0 END)
          AS BIGINT) AS c1
      FROM (
        SELECT label, vec_id, d.dim,
          CAST(FLOOR(CAST(embedding[d.dim + 1] AS DOUBLE) * 1000000
            + 0.5) AS BIGINT) AS v_fp
        FROM embeddings
        CROSS JOIN (SELECT UNNEST(RANGE(0, 64)) AS dim) d)
      GROUP BY 1, 2)
    WHERE c0 > 0 AND c1 > 0
    GROUP BY 1"""

  /** Nearest-centroid confusion matrix over the labeled embedding
    * space — the per-class companion to the scalar Fisher
    * separability (class_separability says HOW separable the space
    * is; this says WHICH classes collide and where the mass goes):
    * every vector is classified to its nearest class centroid
    * (exact µ-unit integer centroids via the [[embeddingDrift]]
    * quantization idiom — both engines' integer division truncates
    * toward zero, verified, so the centroid is bit-identical), and
    * the (true, predicted) matrix reports counts plus each row's
    * share in exact ppm. The audit behind "are these labels worth
    * conditioning a model on?". Scale: one corpus×dims explode feeds
    * both the (label, dim)-keyed centroid fold (tiny, checkpointed,
    * broadcast back) and the scoring pass; distance sums and the
    * argmin are map-side-combinable aggregates keyed by vec_id —
    * no window touches corpus-scale rows (the only window ranks the
    * ≤\|labels\|² confusion cells).
    */
  def centroidConfusion(spark: SparkSession, dir: String): DataFrame = {
    val dims = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label").cast("long").as("true_label"),
        posexplode(col("embedding")).as(Seq("dim", "v")))
      .withColumn("v_fp",
        floor(col("v").cast("double") * lit(1000000d) + lit(0.5d)))
    val cents = graft.functions.Iterate.checkpoint(
      dims.groupBy(col("true_label").as("cand"), col("dim"))
        .agg(expr("SUM(v_fp) div COUNT(*)").as("c_fp")))
    val wRow = Window.partitionBy(col("true_label"))
    dims.join(broadcast(cents), Seq("dim"))
      .withColumn("e", col("v_fp") - col("c_fp"))
      .groupBy(col("vec_id"), col("true_label"), col("cand"))
      .agg(sum(col("e") * col("e")).as("d2"))
      .groupBy(col("vec_id"), col("true_label"))
      .agg(min(struct(col("d2"), col("cand"))).as("best"))
      .groupBy(col("true_label"), col("best.cand").as("pred_label"))
      .agg(count(lit(1)).as("n_vecs"))
      .withColumn("row_total", sum(col("n_vecs")).over(wRow))
      .withColumn("share_ppm", expr("(n_vecs * 1000000) div row_total"))
      .drop("row_total")
  }

  val centroidConfusionOracle: String = """
    WITH dims AS (
      SELECT vec_id, CAST(label AS BIGINT) AS true_label, d.dim,
        CAST(FLOOR(CAST(embedding[d.dim + 1] AS DOUBLE) * 1000000
          + 0.5) AS BIGINT) AS v_fp
      FROM embeddings
      CROSS JOIN (SELECT UNNEST(RANGE(0, 64)) AS dim) d),
    cents AS (
      SELECT true_label AS cand, dim,
        CAST(SUM(v_fp) AS BIGINT) // COUNT(*) AS c_fp
      FROM dims GROUP BY 1, 2),
    d2 AS (
      SELECT x.vec_id, x.true_label, c.cand,
        CAST(SUM((x.v_fp - c.c_fp) * (x.v_fp - c.c_fp)) AS BIGINT) AS d2
      FROM dims x JOIN cents c ON x.dim = c.dim
      GROUP BY 1, 2, 3),
    pred AS (
      SELECT vec_id, true_label, cand AS pred_label FROM (
        SELECT vec_id, true_label, cand,
          ROW_NUMBER() OVER (PARTITION BY vec_id
            ORDER BY d2 ASC, cand ASC) AS rn
        FROM d2)
      WHERE rn = 1),
    conf AS (
      SELECT true_label, pred_label, COUNT(*) AS n_vecs
      FROM pred GROUP BY 1, 2)
    SELECT true_label, pred_label, n_vecs,
      (n_vecs * 1000000)
        // CAST(SUM(n_vecs) OVER (PARTITION BY true_label) AS BIGINT)
        AS share_ppm
    FROM conf"""

  /** Johnson–Lindenstrauss projection distortion audit — the check run
    * BEFORE committing an ANN index to a cheaper projected space: the
    * 10-probe set projects from 64 to k = 16 dimensions through a
    * deterministic ±1 sign matrix (the Achlioptas construction with
    * signs drawn from the salt-keyed hash — seedless, both engines
    * derive the identical matrix), and every probe pair reports its
    * projected-vs-original squared-distance ratio in exact ppm
    * (E[d̂²] = k·d², so ratio = d_proj²·10⁶ ÷ (k·d_orig²) concentrates
    * at 10⁶; coordinates quantize to integer milli-units so every
    * distance is exact BIGINT — µ-units would overflow the ratio's
    * cross-multiplication; identical probes — d_orig² = 0 — report a
    * NULL ratio, the repo's degenerate-frame convention). Scale:
    * everything is probe-set-sized (the documented brute-force frame
    * every ANN audit here shares); the corpus is never touched beyond
    * the 10-probe read.
    */
  def jlProjectionAudit(spark: SparkSession, dir: String): DataFrame = {
    val dims = Tables.embeddings(spark, dir)
      .filter(col("vec_id") < 10)
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("dim", "v")))
      .select(col("vec_id"), col("dim"),
        floor(col("v").cast("double") * lit(1000d) + lit(0.5d)).as("v_m"))
    val sign = when(graft.functions.TextOps.hash24(
        concat(lit("jl|"), col("dim").cast("string"),
          lit("|"), col("j").cast("string"))) % 2 === 0, lit(1L))
      .otherwise(lit(-1L))
    val proj = dims
      .crossJoin(broadcast(spark.range(0, 16).select(col("id").as("j"))))
      .withColumn("s", sign)
      .groupBy(col("vec_id"), col("j"))
      .agg(sum(col("s") * col("v_m")).as("p"))
    def pairs(df: DataFrame, key: String, value: String) = {
      val a = df.select(col("vec_id").as("a"), col(key).as("k"),
        col(value).as("va"))
      val b = df.select(col("vec_id").as("b"), col(key).as("k"),
        col(value).as("vb"))
      a.join(b, Seq("k")).filter(col("a") < col("b"))
        .groupBy(col("a"), col("b"))
        .agg(sum((col("va") - col("vb")) * (col("va") - col("vb")))
          .as(s"d_${value}_sq"))
    }
    pairs(dims, "dim", "v_m").join(pairs(proj, "j", "p"), Seq("a", "b"))
      .select(col("a"), col("b"),
        col("d_v_m_sq").as("d_orig_sq"), col("d_p_sq").as("d_proj_sq"))
      .withColumn("ratio_ppm",
        // degenerate-frame convention (t_closeness/HHI): two identical
        // probes have d_orig_sq = 0 — no distortion is defined, so the
        // ratio is NULL rather than a divide-by-zero engine edge
        expr("CASE WHEN d_orig_sq > 0 " +
          "THEN (d_proj_sq * 1000000) div (16 * d_orig_sq) END"))
  }

  val jlProjectionAuditOracle: String = """
    WITH dims AS (
      SELECT vec_id, d.dim,
        CAST(FLOOR(CAST(embedding[d.dim + 1] AS DOUBLE) * 1000 + 0.5)
          AS BIGINT) AS v_m
      FROM embeddings
      CROSS JOIN (SELECT UNNEST(RANGE(0, 64)) AS dim) d
      WHERE vec_id < 10),
    proj AS (
      SELECT vec_id, j.j,
        CAST(SUM(CASE WHEN CAST('0x' || SUBSTR(MD5('jl|' ||
            CAST(dim AS VARCHAR) || '|' || CAST(j.j AS VARCHAR)), 1, 6)
            AS BIGINT) % 2 = 0 THEN v_m ELSE -v_m END) AS BIGINT) AS p
      FROM dims CROSS JOIN (SELECT UNNEST(RANGE(0, 16)) AS j) j
      GROUP BY 1, 2),
    po AS (
      SELECT x.vec_id AS a, y.vec_id AS b,
        CAST(SUM((x.v_m - y.v_m) * (x.v_m - y.v_m)) AS BIGINT) AS d_orig_sq
      FROM dims x JOIN dims y ON x.dim = y.dim AND x.vec_id < y.vec_id
      GROUP BY 1, 2),
    pp AS (
      SELECT x.vec_id AS a, y.vec_id AS b,
        CAST(SUM((x.p - y.p) * (x.p - y.p)) AS BIGINT) AS d_proj_sq
      FROM proj x JOIN proj y ON x.j = y.j AND x.vec_id < y.vec_id
      GROUP BY 1, 2)
    SELECT po.a, po.b, po.d_orig_sq, pp.d_proj_sq,
      CASE WHEN po.d_orig_sq > 0
        THEN (pp.d_proj_sq * 1000000) // (16 * po.d_orig_sq)
      END AS ratio_ppm
    FROM po JOIN pp ON po.a = pp.a AND po.b = pp.b"""

  /** k-occurrence (hubness) audit over the 40-vector probe frame — the
    * intrinsic-dimensionality pathology check run BEFORE trusting any
    * ANN index: in high effective dimension a few "hub" vectors appear
    * in everyone's top-k (and "anti-hubs" in nobody's), which silently
    * skews dedup_embedding and retrieval evals. Each probe's exact
    * top-5 over the other probes (the shared brute-force audit frame);
    * every probe then reports how many LISTS it appears in — expected
    * occupancy is exactly k = 5 under uniformity, so hub_ratio_ppm =
    * occ·1e6 ÷ 5 reads directly as skew. Anti-hubs (occ = 0) are kept
    * via the left join — their count is half the signal. Scale:
    * probe-set-sized throughout.
    */
  def hubnessAudit(spark: SparkSession, dir: String): DataFrame = {
    val probes = Tables.embeddings(spark, dir).filter(col("vec_id") < 40)
    val q = probes.select(col("vec_id").as("query_id"),
      col("embedding").as("qe"))
    val c = probes.select(col("vec_id").as("neighbor_id"),
      col("embedding").as("ce"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    val occ = broadcast(q).join(c, col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        VectorOps.cosine(col("qe"), col("ce")).as("cosine"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .groupBy(col("neighbor_id"))
      .agg(count(lit(1)).as("k_occ"))
    probes.select(col("vec_id"))
      .join(occ, col("vec_id") === col("neighbor_id"), "left")
      .select(col("vec_id"),
        coalesce(col("k_occ"), lit(0L)).as("k_occurrences"))
      .withColumn("hub_ratio_ppm",
        expr("(k_occurrences * 1000000) div 5"))
  }

  val hubnessAuditOracle: String = s"""
    WITH p AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 40),
    ranked AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        ROW_NUMBER() OVER (PARTITION BY q.vec_id
          ORDER BY ${VectorOps.sqlCosine("q.embedding", "c.embedding")} DESC,
            c.vec_id ASC) AS rank
      FROM p q JOIN p c ON q.vec_id <> c.vec_id),
    occ AS (
      SELECT neighbor_id, COUNT(*) AS k_occ FROM ranked
      WHERE rank <= 5 GROUP BY 1)
    SELECT p.vec_id, COALESCE(o.k_occ, 0) AS k_occurrences,
      (COALESCE(o.k_occ, 0) * 1000000) // 5 AS hub_ratio_ppm
    FROM p LEFT JOIN occ o ON p.vec_id = o.neighbor_id"""

  /** Rank-1-to-rank-k margin per probe — the "is approximate search
    * safe here?" table: a wide cosine margin between the best and the
    * k-th neighbor means an ANN pass that perturbs ranks still returns
    * the same working set; margins near zero mean nprobe/banding knobs
    * must be conservative. Same exact brute-force frame as ann_topk;
    * the margin is floored to exact ×1e6 integers.
    */
  def knnMarginAudit(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    val c = e.select(col("vec_id").as("neighbor_id"),
      col("embedding").as("ce"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    broadcast(q).join(c, col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        VectorOps.cosine(col("qe"), col("ce")).as("cosine"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .groupBy(col("query_id"))
      .agg(
        max(when(col("rank") === 1, col("cosine"))).as("cos_at_1"),
        max(when(col("rank") === 5, col("cosine"))).as("cos_at_k"))
      .withColumn("margin_x1e6",
        floor((col("cos_at_1") - col("cos_at_k")) * lit(1.0e6))
          .cast("bigint"))
  }

  val knnMarginAuditOracle: String = s"""
    WITH ranked AS (
      SELECT q.vec_id AS query_id,
        ${VectorOps.sqlCosine("q.embedding", "c.embedding")} AS cosine,
        ROW_NUMBER() OVER (PARTITION BY q.vec_id
          ORDER BY ${VectorOps.sqlCosine("q.embedding", "c.embedding")} DESC,
            c.vec_id ASC) AS rank
      FROM (SELECT * FROM embeddings WHERE vec_id < 10) q
      JOIN embeddings c ON q.vec_id <> c.vec_id)
    SELECT query_id,
      MAX(CASE WHEN rank = 1 THEN cosine END) AS cos_at_1,
      MAX(CASE WHEN rank = 5 THEN cosine END) AS cos_at_k,
      CAST(FLOOR((MAX(CASE WHEN rank = 1 THEN cosine END)
        - MAX(CASE WHEN rank = 5 THEN cosine END)) * 1.0e6) AS BIGINT)
        AS margin_x1e6
    FROM ranked WHERE rank <= 5
    GROUP BY query_id"""

  def defs: Map[String, QueryDef] = Map(
    "hubness_audit" -> QueryDef.sql(hubnessAudit, hubnessAuditOracle),
    "knn_margin_audit" ->
      QueryDef.sql(knnMarginAudit, knnMarginAuditOracle),
    "jl_projection_audit" ->
      QueryDef.sql(jlProjectionAudit, jlProjectionAuditOracle),
    "centroid_confusion" ->
      QueryDef.sql(centroidConfusion, centroidConfusionOracle),
    "embedding_drift" -> QueryDef.sql(embeddingDrift, embeddingDriftOracle),
    "mmr_rerank" -> QueryDef.sql(mmrRerank, mmrRerankOracle),
    "embedding_norm_audit" -> QueryDef.sql(embeddingNormAudit, embeddingNormAuditOracle),
    "ann_recall_audit" -> QueryDef.sql(annRecallAudit, annRecallAuditOracle),
    "ann_nprobe_sweep" -> QueryDef.sql(annNprobeSweep, annNprobeSweepOracle),
    "embedding_quantize" -> QueryDef.sql(embeddingQuantize, embeddingQuantizeOracle),
    "dedup_embedding" -> QueryDef.sql(dedupEmbedding, dedupEmbeddingOracle),
    "decontaminate_semantic" ->
      QueryDef.sql(decontaminateSemantic, decontaminateSemanticOracle),
    "ann_topk" -> QueryDef.sql(annTopk, annTopkOracle),
    "ann_lsh" -> QueryDef.sql(annLsh, annLshOracle),
    "ann_refine" -> QueryDef.sql(annRefine, annRefineOracle),
    "semdedup_incremental" ->
      QueryDef.sql(semdedupIncremental, semdedupIncrementalOracle),
    "ann_ivf" -> QueryDef.sql(annIvf, annIvfOracle),
    "ann_ivf_trained" -> QueryDef.sql(annIvfTrained, annIvfTrainedOracle)
  )
}
