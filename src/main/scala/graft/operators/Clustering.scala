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

  /** Floor on k (tiny corpora still get a non-degenerate codebook). */
  private val KMin = 8L
  /** Target vectors per cluster: k grows with the corpus at fixed
    * cluster size, which is exactly what keeps [[semdedup]]'s
    * within-cluster pair stage bounded — with k frozen, per-cluster
    * populations (and the pair join) would grow quadratically with the
    * corpus. Same discipline as [[graft.functions.Iterate.statePartitions]],
    * applied to model size.
    */
  private val TargetClusterSize = 100L
  private val Iters = 3

  /** k for a given embeddings table: max(KMin, ceil(n / TargetClusterSize)),
    * all-integer. One cheap count parameterizes the plan — the same way an
    * IVF trainer sizes its coarse codebook from the corpus it indexes.
    * The oracle derives the identical k in SQL (see [[kmeansCtes]]), so
    * the parameterization is live: different SFs produce different k and
    * still hash-match.
    */
  private[graft] def deriveK(e: DataFrame): Int = {
    val n = e.count()
    math.max(KMin, (n + TargetClusterSize - 1L) / TargetClusterSize).toInt
  }
  /** Fixed-point grid for centroid means: 1e-7 (embeddings are O(1)). */
  private val Fp = 1.0e7

  private[graft] def d2(v: Column, c: Column): Column =
    VectorOps.dot(v, v) - lit(2.0) * VectorOps.dot(v, c) + VectorOps.dot(c, c)

  private[graft] def sqlD2(v: String, c: String): String =
    s"${VectorOps.sqlDot(v, v)} - CAST(2 AS DOUBLE) * ${VectorOps.sqlDot(v, c)}" +
      s" + ${VectorOps.sqlDot(c, c)}"

  /** Assign each vector to its nearest centroid (ties → smaller cid).
    * Package-private so specs exercise the operator's own assignment
    * rather than re-implementing it.
    */
  private[graft] def assign(e: DataFrame, cents: DataFrame): DataFrame =
    // The centroid table is k-dimension state (k = corpus/100 here), but
    // its rows carry a dim-wide vector (~8·dim B, not 32 B) — the
    // stateHint ceiling lands nearer 10⁶-10⁷ centroids on default
    // executors; past that, spark.graft.broadcastState=false flips the
    // assignment to a shuffle join.
    //
    // The argmin is a struct-MIN AGGREGATE, not a row_number window
    // (same (d2 ASC, cid ASC) total order — the struct compares d2
    // first, cid second; embedding rides behind the deciding fields):
    // the window form had to SHUFFLE all |vecs|·k candidate rows —
    // each ~0.5 KB with both vectors aboard, ~200 GB at sf10's
    // 200k vecs × 2000 derived centroids — to sort per vec, where the
    // aggregate's map-side partial combine collapses each vec's k
    // candidates to one row BEFORE the exchange, shuffling |vecs| rows
    // at any k. The r16 sf10 sweep measured the difference: ~50 min →
    // minutes for the Lloyd family.
    e.crossJoin(graft.Tables.stateHint(cents))
      .withColumn("d2", d2(col("embedding"), col("cv")))
      .groupBy(col("vec_id"))
      .agg(min(struct(col("d2"), col("cid"), col("embedding"))).as("__m"))
      .select(col("vec_id"), col("__m.embedding").as("embedding"),
        col("__m.cid").as("cid"), col("__m.d2").as("d2"))

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

  /** The k seed centroids: the k smallest vec_ids, cid 0..k−1 (plans as
    * TakeOrderedAndProject — bounded heaps, never a global sort).
    */
  private[graft] def seedCentroids(e: DataFrame, k: Int): DataFrame =
    e.orderBy(col("vec_id")).limit(k)
      .withColumn("cid",
        (row_number().over(Window.orderBy(col("vec_id"))) - 1).cast("int"))
      .select(col("cid"), col("embedding").as("cv"))

  /** Centroids after [[Iters]] Lloyd rounds with corpus-derived k — the
    * shared back end of [[clusterKmeans]] and [[semdedup]] (and the same
    * artifact an IVF index trains).
    */
  private[graft] def finalCentroids(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    var cents = seedCentroids(e, deriveK(e)).transform(
      graft.functions.Iterate.checkpoint(_,
        Some("seed rank over the k-row post-LIMIT TakeOrdered frame")))
    for (_ <- 1 until Iters)
      cents = update(assign(e, cents)).transform(graft.functions.Iterate.checkpoint)
    cents
  }

  def clusterKmeans(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    assign(e, finalCentroids(spark, dir))
      .select(col("vec_id"), col("cid").as("cluster"), col("d2"))
  }

  private[graft] def assignSql(cent: String): String = s"""
      SELECT vec_id, embedding, cid, d2 FROM (
        SELECT e.vec_id, e.embedding, c.cid,
          ${sqlD2("e.embedding", "c.cv")} AS d2,
          ROW_NUMBER() OVER (PARTITION BY e.vec_id
            ORDER BY ${sqlD2("e.embedding", "c.cv")} ASC, c.cid ASC) AS rn
        FROM embeddings e CROSS JOIN $cent c)
      WHERE rn = 1"""

  private def centSql(assignRel: String): String = s"""
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

  /** Name of the final-centroid relation [[kmeansCtes]] ends at. */
  private[graft] def kmeansFinalRel: String = s"cent${Iters - 1}"

  /** The unrolled Lloyd iteration as a WITH-clause body ending at
    * `cent{Iters−1}` — shared by the kmeans, semdedup, and
    * ann_ivf_trained oracles.
    */
  private[graft] def kmeansCtes: String = {
    val iterCtes = (1 until Iters).map { i =>
      s"""assign$i AS (${assignSql(s"cent${i - 1}")}),
    cent$i AS (${centSql(s"assign$i")})"""
    }.mkString(",\n    ")
    // kp mirrors deriveK: GREATEST(KMin, ceil-div by TargetClusterSize),
    // all-integer, so the oracle adapts its k to the same corpus count.
    s"""kp AS (
      SELECT GREATEST($KMin, (COUNT(*) + ${TargetClusterSize - 1}) // $TargetClusterSize) AS k
      FROM embeddings),
    cent0 AS (
      SELECT CAST(rn - 1 AS INT) AS cid, embedding AS cv
      FROM (SELECT embedding, ROW_NUMBER() OVER (ORDER BY vec_id) AS rn
            FROM embeddings)
      WHERE rn <= (SELECT k FROM kp)),
    $iterCtes"""
  }

  lazy val clusterKmeansOracle: String = s"""
    WITH $kmeansCtes
    SELECT vec_id, cid AS cluster, d2
    FROM (${assignSql(s"cent${Iters - 1}")})"""

  /** SemDeDup-style semantic deduplication: cluster the embedding space
    * (the [[finalCentroids]] Lloyd rounds), then mark a vector as a
    * semantic duplicate when a LOWER-id vector in the SAME cluster has
    * cosine ≥ [[SemTau]] — the keep-one-per-neighborhood rule, anchored
    * on the minimum id so survivorship is deterministic. Emits every
    * vector with its cluster and verdict (the training run reads
    * `is_dup = false`).
    *
    * Scale: clustering is what makes this tractable — candidate pairs
    * exist only WITHIN a cluster, and k grows with the corpus (fixed
    * target cluster size), so per-cluster pair counts stay bounded while
    * the total stays ~linear. The banded-LSH alternative for the same
    * job is dedup_embedding; this one trades a trained partition for
    * exact in-cluster recall. The pair join shuffles (cid, id, vector)
    * once on cid; the verdict join is on vec_id.
    */
  private val SemTau = 0.3

  def semdedup(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    // Checkpointed, not persist()ed: three branches read the assignment
    // (both pair-join sides + the verdict spine), so it must materialize
    // once — but a persist() registers a session-lifetime CacheManager
    // entry nothing here could release (the caller runs the returned
    // lazy frame long after this function returns). The eager checkpoint
    // materializes the same blocks WITHOUT a cache entry; they free via
    // GC when the frame is dropped, so a long-lived session doesn't leak.
    val assigned = graft.functions.Iterate.checkpoint(
      assign(e, finalCentroids(spark, dir)))
    val dominated = assigned.select(col("cid"), col("vec_id").as("keep_id"),
        col("embedding").as("ea"))
      .join(assigned.select(col("cid"), col("vec_id"), col("embedding").as("eb")),
        Seq("cid"))
      .filter(col("keep_id") < col("vec_id"))
      .filter(VectorOps.cosine(col("ea"), col("eb")) >= SemTau)
      .select(col("vec_id")).distinct()
    assigned.select(col("vec_id"), col("cid").as("cluster"))
      .join(dominated.withColumn("dup", lit(true)), Seq("vec_id"), "left")
      .select(col("vec_id"), col("cluster"),
        coalesce(col("dup"), lit(false)).as("is_dup"))
  }

  lazy val semdedupOracle: String = s"""
    WITH $kmeansCtes,
    assigned AS (${assignSql(s"cent${Iters - 1}")}),
    dominated AS (
      SELECT DISTINCT b.vec_id
      FROM assigned a JOIN assigned b
        ON a.cid = b.cid AND a.vec_id < b.vec_id
      WHERE ${VectorOps.sqlCosine("a.embedding", "b.embedding")} >= $SemTau)
    SELECT s.vec_id, s.cid AS cluster, (d.vec_id IS NOT NULL) AS is_dup
    FROM assigned s LEFT JOIN dominated d ON s.vec_id = d.vec_id"""

  /** Per-cluster topic keywords: top-3 terms per kmeans cluster by
    * linear TF-IDF, treating each CLUSTER as one pseudo-document (tf =
    * term count inside the cluster, idf = n_clusters / clusters-
    * containing-term — linear, like tfidf_top_terms, because libm log is
    * not FP-portable). Embeddings join their source documents on
    * `vec_id = doc_id` — the embedded subset of the corpus — which is
    * what turns an unlabeled geometric clustering into a human-readable
    * topic report (the "name the clusters" step after semdedup/IVF
    * bucketing).
    *
    * Scale: terms explode linearly; both aggregates are map-side
    * combinable; the per-cluster top-3 is a bounded window over k·|vocab|
    * rows at most. The n_clusters scalar broadcasts.
    */
  def clusterTopics(spark: SparkSession, dir: String): DataFrame = {
    val assigned = clusterKmeans(spark, dir).select(col("vec_id"), col("cluster"))
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id").as("vec_id"), col("text"))
    val terms = assigned.join(docs, Seq("vec_id"))
      .select(col("cluster"), explode(split(col("text"), "\\s+")).as("term"))
    // Checkpointed (same discipline as semdedup's assignment): three
    // branches (cdf, n_clusters, the score join) read tf — without
    // materialization each re-runs the kmeans assignment + doc join +
    // term explode, the costliest subtree of the query; checkpoint
    // blocks release via GC instead of leaking a CacheManager entry.
    val tf = graft.functions.Iterate.checkpoint(
      terms.groupBy(col("cluster"), col("term")).agg(count(lit(1)).as("tf")))
    val cdf = tf.groupBy(col("term")).agg(count(lit(1)).as("cluster_df"))
    val n = tf.select(countDistinct(col("cluster")).as("n_clusters"))
    val scored = tf.join(cdf, Seq("term"))
      .crossJoin(broadcast(n))
      .withColumn("score", col("tf").cast("double")
        * (col("n_clusters").cast("double") / col("cluster_df").cast("double")))
    // Per-cluster top-3 via the heap operator (same routing as
    // tfidf_top_terms): no partition sort over the k·|vocab| scored
    // rows; the rank window runs over ≤3 survivors per cluster.
    val top = Relational.topKPerKey(scored,
      keys = Seq(col("cluster")),
      order = Seq(col("score").desc, col("term").asc),
      k = 3)
    val w = Window.partitionBy(col("cluster"))
      .orderBy(col("score").desc, col("term").asc)
    top.withColumn("rank", row_number().over(w))
      .select(col("cluster"), col("term"), col("tf"), col("cluster_df"),
        col("score"), col("rank"))
  }

  lazy val clusterTopicsOracle: String = s"""
    WITH $kmeansCtes,
    assigned AS (${assignSql(s"cent${Iters - 1}")}),
    terms AS (
      SELECT a.cid AS cluster, UNNEST(STRING_SPLIT_REGEX(d.text, '\\s+')) AS term
      FROM assigned a JOIN documents d ON d.doc_id = a.vec_id),
    tf AS (SELECT cluster, term, COUNT(*) AS tf FROM terms GROUP BY 1, 2),
    cdf AS (SELECT term, COUNT(*) AS cluster_df FROM tf GROUP BY 1),
    n AS (SELECT COUNT(DISTINCT cluster) AS n_clusters FROM tf)
    SELECT cluster, term, tf, cluster_df, score, rank FROM (
      SELECT tf.cluster, tf.term,
        CAST(tf.tf AS BIGINT) AS tf, CAST(cdf.cluster_df AS BIGINT) AS cluster_df,
        CAST(tf.tf AS DOUBLE)
          * (CAST(n.n_clusters AS DOUBLE) / CAST(cdf.cluster_df AS DOUBLE)) AS score,
        ROW_NUMBER() OVER (PARTITION BY tf.cluster
          ORDER BY CAST(tf.tf AS DOUBLE)
            * (CAST(n.n_clusters AS DOUBLE) / CAST(cdf.cluster_df AS DOUBLE)) DESC,
            tf.term ASC) AS rank
      FROM tf JOIN cdf ON tf.term = cdf.term CROSS JOIN n)
    WHERE rank <= 3"""

  /** Label purity of the trained k-means cells — the classifier-free
    * LABEL-NOISE audit over the embedding space (Confident-Learning's
    * cheap cousin: if geometry clusters cleanly but a cell's labels
    * don't agree, either the labels are noisy or the classes genuinely
    * overlap — both are exactly what a training-data owner wants
    * surfaced per REGION, not as one global accuracy number; semdedup
    * prunes within these same cells, so low-purity cells also flag
    * where near-dup pruning crosses class lines). Per cell: size,
    * distinct labels, majority label (count DESC, label ASC ties —
    * deterministic both engines), purity and Gini impurity
    * 1 − Σp² — both EXACT integer ppm (Σcnt²·1e6 div n², no float
    * fold). Scale: rides the same broadcast-state assignment as
    * cluster_kmeans (one corpus pass); everything after is a
    * (cell, label)-keyed aggregate — ≤ k·|labels| rows — and the
    * majority window partitions by cell.
    */
  def clusterLabelPurity(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val assigned = assign(e.select(col("vec_id"), col("embedding")),
      finalCentroids(spark, dir))
    val lc = assigned.select(col("vec_id"), col("cid"))
      .join(e.select(col("vec_id"), col("label").cast("long").as("label")),
        Seq("vec_id"))
      .groupBy(col("cid"), col("label")).agg(count(lit(1)).as("cnt"))
    val per = lc.groupBy(col("cid"))
      .agg(sum(col("cnt")).as("n_vecs"),
        count(lit(1)).as("n_labels"),
        sum(col("cnt") * col("cnt")).as("sumsq"))
    val major = lc.withColumn("rn", row_number().over(
        Window.partitionBy(col("cid"))
          .orderBy(col("cnt").desc, col("label").asc)))
      .filter(col("rn") === 1)
      .select(col("cid"), col("label").as("majority_label"),
        col("cnt").as("n_majority"))
    per.join(major, Seq("cid"))
      .select(col("cid"), col("n_vecs"), col("n_labels"),
        col("majority_label"), col("n_majority"),
        expr("(n_majority * 1000000) div n_vecs").as("purity_ppm"),
        (lit(1000000L) - expr("(sumsq * 1000000) div (n_vecs * n_vecs)"))
          .as("gini_impurity_ppm"))
  }

  lazy val clusterLabelPurityOracle: String = s"""
    WITH $kmeansCtes,
    cents AS MATERIALIZED (
      SELECT cid, cv FROM $kmeansFinalRel),
    assigned AS (${assignSql("cents")}),
    lc AS (
      SELECT a.cid, CAST(e.label AS BIGINT) AS label, COUNT(*) AS cnt
      FROM assigned a JOIN embeddings e ON a.vec_id = e.vec_id
      GROUP BY 1, 2),
    per AS (
      SELECT cid, CAST(SUM(cnt) AS BIGINT) AS n_vecs,
        COUNT(*) AS n_labels,
        CAST(SUM(cnt * cnt) AS BIGINT) AS sumsq
      FROM lc GROUP BY 1),
    major AS (
      SELECT cid, label, cnt,
        ROW_NUMBER() OVER (PARTITION BY cid
          ORDER BY cnt DESC, label ASC) AS rn
      FROM lc)
    SELECT p.cid, p.n_vecs, p.n_labels,
      m.label AS majority_label, m.cnt AS n_majority,
      (m.cnt * 1000000) // p.n_vecs AS purity_ppm,
      1000000 - (p.sumsq * 1000000) // (p.n_vecs * p.n_vecs)
        AS gini_impurity_ppm
    FROM per p JOIN (SELECT * FROM major WHERE rn = 1) m ON p.cid = m.cid"""

  /** Within-cell distance outliers — every vector's centroid distance
    * judged against ITS OWN cell's robust scale (the data-cleaning
    * read of the k-means geometry: a vector 3 MADs beyond its cell's
    * median distance is a corrupt embedding, a mislabeled modality, or
    * a genuinely novel point — exactly what gets hand-reviewed before
    * training; [[semdedup]] prunes the over-DENSE side of a cell, this
    * flags the over-SPARSE side). The per-cell median and MAD are
    * nearest-rank LOWER medians (rank ⌊(n+1)/2⌋ — actual d² values, so
    * both engines pick the identical double; d² itself is the
    * hash-checked [[clusterKmeans]] quantity), the robust z is one
    * fixed-order double division reported floor'd ×1e4, and the flag
    * is z > 3 as BIGINT 1/0 (NULL when MAD = 0). Scale: rides the one
    * broadcast-state assignment (checkpointed — the two median ranks
    * and the final projection all read it); every window partitions BY
    * CELL.
    */
  def clusterOutliers(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    val assigned = graft.functions.Iterate.checkpoint(
      assign(e, finalCentroids(spark, dir))
        .select(col("vec_id"), col("cid"), col("d2")))
    val nPer = assigned.groupBy(col("cid")).agg(count(lit(1)).as("n_c"))
    def cellMedian(df: DataFrame, c: String, out: String): DataFrame = {
      val w = Window.partitionBy(col("cid")).orderBy(col(c).asc, col("vec_id").asc)
      df.withColumn("rn", row_number().over(w))
        .join(Tables.stateHint(nPer), Seq("cid"))
        .filter(col("rn") === expr("(n_c + 1) div 2"))
        .select(col("cid"), col(c).as(out))
    }
    val med = cellMedian(assigned, "d2", "med_d2")
    val dev = assigned.join(Tables.stateHint(med), Seq("cid"))
      .withColumn("abs_dev", abs(col("d2") - col("med_d2")))
    val mad = cellMedian(
      dev.select(col("cid"), col("vec_id"), col("abs_dev")), "abs_dev", "mad_d2")
    dev.join(Tables.stateHint(mad), Seq("cid"))
      .select(col("vec_id"), col("cid"),
        floor(col("d2") * lit(1.0e6) + lit(0.5)).cast("bigint").as("d2_x1e6"),
        when(col("mad_d2") > 0.0,
          floor((col("d2") - col("med_d2")) / col("mad_d2") * lit(1.0e4))
            .cast("bigint")).as("z_x1e4"),
        when(col("mad_d2") > 0.0,
          when((col("d2") - col("med_d2")) / col("mad_d2") > lit(3.0), 1L)
            .otherwise(0L)).as("outlier"))
  }

  lazy val clusterOutliersOracle: String = s"""
    WITH $kmeansCtes,
    cents AS MATERIALIZED (
      SELECT cid, cv FROM $kmeansFinalRel),
    assigned AS (${assignSql("cents")}),
    np AS (SELECT cid, COUNT(*) AS n_c FROM assigned GROUP BY 1),
    med AS (
      SELECT cid, d2 AS med_d2 FROM (
        SELECT a.cid, a.d2, ROW_NUMBER() OVER (PARTITION BY a.cid
          ORDER BY a.d2 ASC, a.vec_id ASC) AS rn, np.n_c
        FROM assigned a JOIN np ON a.cid = np.cid)
      WHERE rn = (n_c + 1) // 2),
    dev AS (
      SELECT a.vec_id, a.cid, a.d2, ABS(a.d2 - m.med_d2) AS abs_dev,
        m.med_d2
      FROM assigned a JOIN med m ON a.cid = m.cid),
    mad AS (
      SELECT cid, abs_dev AS mad_d2 FROM (
        SELECT d.cid, d.abs_dev, ROW_NUMBER() OVER (PARTITION BY d.cid
          ORDER BY d.abs_dev ASC, d.vec_id ASC) AS rn, np.n_c
        FROM dev d JOIN np ON d.cid = np.cid)
      WHERE rn = (n_c + 1) // 2)
    SELECT d.vec_id, d.cid,
      CAST(FLOOR(d.d2 * 1.0e6 + 0.5) AS BIGINT) AS d2_x1e6,
      CASE WHEN m.mad_d2 > 0.0
        THEN CAST(FLOOR((d.d2 - d.med_d2) / m.mad_d2 * 1.0e4) AS BIGINT)
        END AS z_x1e4,
      CASE WHEN m.mad_d2 > 0.0 THEN
        CASE WHEN (d.d2 - d.med_d2) / m.mad_d2 > 3.0 THEN 1 ELSE 0 END
        END AS outlier
    FROM dev d JOIN mad m ON d.cid = m.cid"""

  def defs: Map[String, QueryDef] = Map(
    "cluster_kmeans" -> QueryDef.sql(clusterKmeans, clusterKmeansOracle),
    "semdedup" -> QueryDef.sql(semdedup, semdedupOracle),
    "cluster_label_purity" ->
      QueryDef.sql(clusterLabelPurity, clusterLabelPurityOracle),
    "cluster_outliers" -> QueryDef.sql(clusterOutliers, clusterOutliersOracle),
    "cluster_topics" -> QueryDef.sql(clusterTopics, clusterTopicsOracle)
  )
}
