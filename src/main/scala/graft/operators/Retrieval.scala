package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Retrieval-grade ranking and cross-source distribution calibration
  * over the documents corpus (§2.E adjunct), plus robust trend
  * estimation over the sales series — the query-side complement of the
  * curation operators: the same index statistics that drive
  * decontamination (df, dl) power search-style scoring.
  */
object Retrieval {

  private val QueryTerms = Seq("spark", "hash", "merge")
  private val K1 = 1.2
  private val B = 0.75

  /** BM25 top-k retrieval for a fixed query over the documents corpus
    * (Robertson-Spärck Jones, the ranking function behind Lucene/ES) —
    * with the RATIONAL idf variant (N − df + 0.5)/(df + 0.5), no
    * logarithm: the [[TextAnalysis.tfidfTopTerms]] linear-idf treatment
    * (libm log differs across engines in last bits; a rational idf is
    * division-only and portable). All inputs exact integers (tf, df, dl,
    * N); avgdl is one double division of two exact sums.
    *
    * Per-term partial scores are summed in FIXED order (one conditional
    * aggregate per query term, added left-to-right) — never a float SUM
    * across rows, whose order the shuffle would randomize.
    *
    * Scale: the corpus is tokenized ONCE (per-doc tf columns are
    * conditional counts inside the dl aggregate, not a per-term row
    * explosion); the (N, Σdl, df_t) stats row broadcasts back; top-20
    * is a TakeOrdered (per-partition heads, never a global sort).
    */
  def bm25Topk(spark: SparkSession, dir: String): DataFrame = {
    // ONE tokenize pass: per-doc row carries dl + one tf column per query
    // term (a 3-term query is 3 conditional counts, not a per-term row
    // explosion), so the corpus is scanned and tokenized exactly once.
    val perDoc = Tables.documents(spark, dir)
      .select(col("doc_id"),
        explode(split(col("text"), "\\s+")).as("term"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("dl"),
        QueryTerms.map(t =>
          sum(when(col("term") === t, 1L).otherwise(0L)).as(s"tf_$t")): _*)
    val statCols = sum(col("dl")).as("sum_dl") +:
      QueryTerms.map(t =>
        sum(when(col(s"tf_$t") > 0, 1L).otherwise(0L)).as(s"df_$t"))
    val stats = perDoc.agg(count(lit(1)).as("n_docs"), statCols: _*)
    def partial(t: String) = {
      val idf = (col("n_docs").cast("double") - col(s"df_$t").cast("double") + lit(0.5)) /
        (col(s"df_$t").cast("double") + lit(0.5))
      when(col(s"tf_$t") > 0,
        idf * (col(s"tf_$t").cast("double") * lit(K1 + 1.0))
          / (col(s"tf_$t").cast("double")
            + lit(K1) * (lit(1.0 - B) + lit(B) * col("dl").cast("double")
              / (col("sum_dl").cast("double") / col("n_docs").cast("double")))))
        .otherwise(lit(0.0))
    }
    perDoc.crossJoin(broadcast(stats))
      .withColumn("score",
        QueryTerms.map(partial).reduceLeft(_ + _))
      .filter(col("score") > 0.0)
      .withColumn("score",
        floor(col("score") * lit(1.0e6) + lit(0.5)).cast("double") / lit(1.0e6))
      .select(col("doc_id"), col("score"))
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(20)
  }

  val bm25TopkOracle: String = {
    val tfCols = QueryTerms.map(t =>
      s"SUM(CASE WHEN term = '$t' THEN 1 ELSE 0 END) AS tf_$t").mkString(",\n        ")
    val dfCols = QueryTerms.map(t =>
      s"CAST(SUM(CASE WHEN tf_$t > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_$t")
      .mkString(",\n        ")
    def partial(t: String) =
      s"""CASE WHEN tf_$t > 0 THEN
        ((CAST(n_docs AS DOUBLE) - CAST(df_$t AS DOUBLE) + 0.5)
          / (CAST(df_$t AS DOUBLE) + 0.5))
        * (CAST(tf_$t AS DOUBLE) * ${K1 + 1.0})
        / (CAST(tf_$t AS DOUBLE)
          + $K1 * ((1.0 - $B) + $B * CAST(dl AS DOUBLE)
            / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))))
        ELSE CAST(0.0 AS DOUBLE) END"""
    s"""
    WITH terms AS (
      SELECT doc_id, UNNEST(STRING_SPLIT_REGEX(text, '\\s+')) AS term FROM documents),
    perdoc AS (
      SELECT doc_id, COUNT(*) AS dl,
        $tfCols
      FROM terms GROUP BY 1),
    stats AS (
      SELECT COUNT(*) AS n_docs, CAST(SUM(dl) AS BIGINT) AS sum_dl,
        $dfCols
      FROM perdoc),
    scored AS (
      SELECT doc_id,
        ${QueryTerms.map(partial).mkString("\n        + ")} AS score
      FROM perdoc CROSS JOIN stats)
    SELECT doc_id,
      CAST(FLOOR(score * 1.0e6 + 0.5) AS DOUBLE) / 1.0e6 AS score
    FROM scored WHERE score > 0.0
    ORDER BY score DESC, doc_id ASC LIMIT 20"""
  }

  /** Quantile normalization of per-source document-length distributions
    * onto the GLOBAL distribution — the cross-source calibration step a
    * mixing pipeline applies before length-based quality cuts (a 90th-
    * percentile "long" doc from a short-doc source must not be judged by
    * another source's absolute scale; genomics' between-array
    * normalization applied to corpus curation). Each doc maps to the
    * global value at its within-source percent rank (nearest-rank,
    * row_number total order with doc_id tiebreak — identical rank
    * semantics in both engines; singleton sources pin pr = 0.5).
    *
    * Scale: two rank windows (per-source, global) and one equi-join on
    * the computed integer rank — three shuffles of narrow rank rows.
    * The global window is the intrinsic cost of an exact global
    * quantile map; an approximate variant would bucket into a
    * broadcastable grid (the quantile_sketch_merge shape).
    */
  def quantileNormalize(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("n_chars"))
    val n = docs.count()
    val src = docs
      .withColumn("r", row_number().over(Window.partitionBy(col("source"))
        .orderBy(col("n_chars").asc, col("doc_id").asc)))
      .withColumn("n_s", count(lit(1)).over(Window.partitionBy(col("source"))))
      .withColumn("pr",
        when(col("n_s") === 1, lit(0.5))
          .otherwise((col("r") - 1).cast("double") / (col("n_s") - 1).cast("double")))
      .withColumn("g_target",
        (floor(col("pr") * lit((n - 1).toDouble) + lit(0.5)) + lit(1L)).cast("bigint"))
    val global = docs
      .select(col("n_chars").as("g_chars"), col("doc_id").as("g_tie"))
      .withColumn("gr", row_number().over(
        Window.orderBy(col("g_chars").asc, col("g_tie").asc)).cast("bigint"))
      .select(col("gr"), col("g_chars"))
    src.join(global, col("g_target") === col("gr"))
      .select(col("doc_id"), col("source"), col("n_chars"),
        col("g_chars").as("norm_chars"))
  }

  val quantileNormalizeOracle: String = """
    WITH d AS (SELECT doc_id, source, n_chars FROM documents),
    n AS (SELECT COUNT(*) AS n FROM d),
    src AS (
      SELECT doc_id, source, n_chars,
        ROW_NUMBER() OVER (PARTITION BY source
          ORDER BY n_chars ASC, doc_id ASC) AS r,
        COUNT(*) OVER (PARTITION BY source) AS n_s
      FROM d),
    tgt AS (
      SELECT doc_id, source, n_chars,
        CAST(FLOOR(
          (CASE WHEN n_s = 1 THEN CAST(0.5 AS DOUBLE)
            ELSE CAST(r - 1 AS DOUBLE) / CAST(n_s - 1 AS DOUBLE) END)
          * CAST(n.n - 1 AS DOUBLE) + 0.5) + 1 AS BIGINT) AS g_target
      FROM src CROSS JOIN n),
    global AS (
      SELECT n_chars AS g_chars,
        CAST(ROW_NUMBER() OVER (ORDER BY n_chars ASC, doc_id ASC) AS BIGINT) AS gr
      FROM d)
    SELECT t.doc_id, t.source, t.n_chars, g.g_chars AS norm_chars
    FROM tgt t JOIN global g ON t.g_target = g.gr"""

  /** Theil–Sen robust trend per nation over the monthly revenue series —
    * the median of pairwise slopes (up to 29% outlier breakdown vs OLS's
    * zero; the trend audit trends_over_time's raw sums feed): monthly
    * exact-cents totals, all C(n,2) pairwise slopes per nation, LOWER
    * median by row_number over the (slope, m1, m2) total order — no
    * interpolation, so no engine-specific median semantics. Slopes are
    * single divisions of exact integers.
    *
    * Scale: the pair expansion runs on the MONTHLY aggregate (per-nation
    * C(#months, 2) ≈ 3.5k rows for a 7-year series — metadata-scale at
    * any corpus size); the corpus shuffles once into the monthly grid.
    */
  def theilsenTrend(spark: SparkSession, dir: String): DataFrame = {
    val monthly = Tables.orders(spark, dir)
      .join(broadcast(Tables.customer(spark, dir)
        .select(col("c_custkey").as("o_custkey"), col("c_nationkey"))
        .transform(Tables.dimHint)), Seq("o_custkey"))
      .groupBy(col("c_nationkey").cast("long").as("nationkey"),
        (year(col("o_orderdate")) * 12 + month(col("o_orderdate")) - 1)
          .cast("long").as("mon"))
      .agg(sum(floor(col("o_totalprice") * 100 + lit(0.5)).cast("bigint"))
        .as("cents"))
    val a = monthly.select(col("nationkey"), col("mon").as("m1"), col("cents").as("c1"))
    val b = monthly.select(col("nationkey"), col("mon").as("m2"), col("cents").as("c2"))
    val slopes = a.join(b, Seq("nationkey")).filter(col("m1") < col("m2"))
      .withColumn("slope",
        (col("c2") - col("c1")).cast("double") / (col("m2") - col("m1")).cast("double"))
    val w = Window.partitionBy(col("nationkey"))
      .orderBy(col("slope").asc, col("m1").asc, col("m2").asc)
    slopes
      .withColumn("rn", row_number().over(w))
      .withColumn("n_pairs", count(lit(1)).over(Window.partitionBy(col("nationkey"))))
      .filter(col("rn") === expr("(n_pairs + 1) div 2"))
      .select(col("nationkey"), col("n_pairs"),
        (floor(col("slope") * lit(1.0e4) + lit(0.5)).cast("double") / lit(1.0e4))
          .as("median_slope_cents"))
  }

  val theilsenTrendOracle: String = """
    WITH monthly AS (
      SELECT CAST(c_nationkey AS BIGINT) AS nationkey,
        CAST(EXTRACT(YEAR FROM o_orderdate) * 12
          + EXTRACT(MONTH FROM o_orderdate) - 1 AS BIGINT) AS mon,
        CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY 1, 2),
    slopes AS (
      SELECT a.nationkey,
        CAST(b.cents - a.cents AS DOUBLE) / CAST(b.mon - a.mon AS DOUBLE) AS slope,
        a.mon AS m1, b.mon AS m2
      FROM monthly a JOIN monthly b
        ON a.nationkey = b.nationkey AND a.mon < b.mon),
    ranked AS (
      SELECT nationkey, slope,
        ROW_NUMBER() OVER (PARTITION BY nationkey
          ORDER BY slope ASC, m1 ASC, m2 ASC) AS rn,
        COUNT(*) OVER (PARTITION BY nationkey) AS n_pairs
      FROM slopes)
    SELECT nationkey, n_pairs,
      CAST(FLOOR(slope * 1.0e4 + 0.5) AS DOUBLE) / 1.0e4 AS median_slope_cents
    FROM ranked WHERE rn = (n_pairs + 1) // 2"""

  def defs: Map[String, QueryDef] = Map(
    "bm25_topk" -> QueryDef.sql(bm25Topk, bm25TopkOracle),
    "quantile_normalize" -> QueryDef.sql(quantileNormalize, quantileNormalizeOracle),
    "theilsen_trend" -> QueryDef.sql(theilsenTrend, theilsenTrendOracle)
  )
}
