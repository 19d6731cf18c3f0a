package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Round-13 additions to the inferential battery — the assumption
  * AUDITS the existing tests lean on: welch_ttest and anova_oneway
  * assume approximate normality ([[Inference.jarqueBera]] tests it) and
  * ANOVA additionally assumes homogeneous variances
  * ([[Inference.leveneBf]], the Brown–Forsythe form, tests that);
  * [[Inference.friedmanTest]] is the nonparametric repeated-measures
  * member the battery lacked (blocked ranks over the event calendar —
  * Kruskal–Wallis answers "do groups differ?", Friedman answers "do
  * treatments differ CONTROLLING for the day?"). Same discipline as
  * StatTests: exact DECIMAL(38)/HUGEINT moment folds, fixed-order
  * double expressions whose only libm call is the correctly-rounded
  * sqrt, scaled-BIGINT statistics, literal critical-value ladders
  * (no p-value libm), NULL decisions on guard failure.
  */
object Inference {

  private def dec(c: Column) = c.cast(DecimalType(38, 0))

  /** Jarque–Bera normality test on exact-cents order totals — run this
    * BEFORE believing welch_ttest/bootstrap agreement means normality:
    * JB = n/6 · (skew² + (excess_kurtosis)²/4) from the four raw moment
    * sums, each folded exactly in DECIMAL(38,0) (HUGEINT in the
    * oracle), then combined in ONE fixed-order double expression whose
    * only non-arithmetic call is sqrt (IEEE correctly rounded — both
    * engines bit-agree). Rejection compares floor(JB·1e6) against the
    * χ²₂ 5% literal (5991465). BIGINT/decimal headroom: cents⁴ ≈ 6e30
    * per row holds the Σ under 1e38 to ~1e7 orders; past that the
    * moment fold (not the data) moves to per-group partials. Scale:
    * one scan, one 5-column aggregate, no shuffle beyond the final
    * combine.
    */
  def jarqueBera(spark: SparkSession, dir: String): DataFrame = {
    val c = expr("CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)")
    val o = Tables.orders(spark, dir).select(c.as("c"))
    val agg = o.agg(
      count(lit(1)).as("n"),
      sum(dec(col("c"))).as("s1"),
      sum(dec(col("c")) * dec(col("c"))).as("s2"),
      sum(dec(col("c")) * dec(col("c")) * dec(col("c"))).as("s3"),
      sum(dec(col("c")) * dec(col("c")) * dec(col("c")) * dec(col("c")))
        .as("s4"))
    val nD = col("n").cast("double")
    val m = col("s1").cast("double") / nD
    val r2 = col("s2").cast("double") / nD
    val r3 = col("s3").cast("double") / nD
    val r4 = col("s4").cast("double") / nD
    val v = r2 - m * m
    val m3 = r3 - lit(3.0) * m * r2 + lit(2.0) * m * m * m
    val m4 = r4 - lit(4.0) * m * r3 + lit(6.0) * m * m * r2 -
      lit(3.0) * m * m * m * m
    val skew = m3 / (v * sqrt(v))
    val exKurt = m4 / (v * v) - lit(3.0)
    val jb = nD / lit(6.0) * (skew * skew + exKurt * exKurt / lit(4.0))
    val ok = col("n") >= 8 && v > 0.0
    agg.select(
      col("n").as("n_orders"),
      when(ok, floor(skew * lit(1.0e6)).cast("bigint")).as("skew_x1e6"),
      when(ok, floor(exKurt * lit(1.0e6)).cast("bigint")).as("ex_kurt_x1e6"),
      when(ok, floor(jb * lit(1.0e6)).cast("bigint")).as("jb_x1e6"),
      when(ok && col("n") >= 1000,
        when(floor(jb * lit(1.0e6)).cast("bigint")
          > lit(StatTests.Chi2Crit5PctX1e6(1)), 1L).otherwise(0L))
        .otherwise(lit(null).cast("bigint")).as("reject_normality_5pct"))
  }

  val jarqueBeraOracle: String = {
    val chi2crit2 = StatTests.Chi2Crit5PctX1e6(1)
    s"""
    WITH o AS (
      SELECT CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS c
      FROM orders),
    a AS (
      SELECT COUNT(*) AS n,
        SUM(CAST(c AS HUGEINT)) AS s1,
        SUM(CAST(c AS HUGEINT) * CAST(c AS HUGEINT)) AS s2,
        SUM(CAST(c AS HUGEINT) * CAST(c AS HUGEINT) * CAST(c AS HUGEINT))
          AS s3,
        SUM(CAST(c AS HUGEINT) * CAST(c AS HUGEINT) * CAST(c AS HUGEINT)
          * CAST(c AS HUGEINT)) AS s4
      FROM o),
    d AS (
      SELECT n,
        CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS m,
        CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) AS r2,
        CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE) AS r3,
        CAST(s4 AS DOUBLE) / CAST(n AS DOUBLE) AS r4
      FROM a),
    mom AS (
      SELECT n, r2 - m * m AS v,
        r3 - 3.0 * m * r2 + 2.0 * m * m * m AS m3,
        r4 - 4.0 * m * r3 + 6.0 * m * m * r2 - 3.0 * m * m * m * m AS m4
      FROM d),
    st AS (
      SELECT n, v,
        m3 / (v * SQRT(v)) AS skew,
        m4 / (v * v) - 3.0 AS ex_kurt
      FROM mom),
    jbt AS (
      SELECT n, v, skew, ex_kurt,
        CAST(n AS DOUBLE) / 6.0
          * (skew * skew + ex_kurt * ex_kurt / 4.0) AS jb,
        (n >= 8 AND v > 0.0) AS ok
      FROM st)
    SELECT n AS n_orders,
      CASE WHEN ok THEN CAST(FLOOR(skew * 1.0e6) AS BIGINT) END AS skew_x1e6,
      CASE WHEN ok THEN CAST(FLOOR(ex_kurt * 1.0e6) AS BIGINT) END
        AS ex_kurt_x1e6,
      CASE WHEN ok THEN CAST(FLOOR(jb * 1.0e6) AS BIGINT) END AS jb_x1e6,
      CASE WHEN ok AND n >= 1000 THEN
        CASE WHEN CAST(FLOOR(jb * 1.0e6) AS BIGINT) > $chi2crit2
          THEN 1 ELSE 0 END END AS reject_normality_5pct
    FROM jbt"""
  }

  /** Brown–Forsythe homogeneity-of-variance test (Levene's test with
    * the MEDIAN center — the robust form every ANOVA should be read
    * beside): per-source lower medians of document length are exact
    * nearest-rank picks (rank ⌈n/2⌉ under the total (n_chars, doc_id)
    * order — a PARTITIONED window, k groups, never a global sort),
    * absolute deviations z = |n_chars − med| stay BIGINT, and the
    * one-way ANOVA F on z reuses anova_oneway's exact-moment formula
    * and its large-df χ² rejection ladder. Scale: one scan + one
    * group-partitioned rank + one broadcast of k medians + the
    * 5-column exact aggregate.
    */
  def leveneBf(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("n_chars"))
    val w = Window.partitionBy(col("source"))
      .orderBy(col("n_chars").asc, col("doc_id").asc)
    val med = docs
      .withColumn("rk", row_number().over(w))
      .withColumn("n_g", count(lit(1)).over(Window.partitionBy(col("source"))))
      .filter(col("rk") === expr("(n_g + 1) div 2"))
      .select(col("source"), col("n_chars").as("med"))
    val z = docs.join(broadcast(med), Seq("source"))
      .select(col("source"), abs(col("n_chars") - col("med")).as("z"))
    val grp = z.groupBy(col("source"))
      .agg(count(lit(1)).as("n_i"), sum(col("z")).as("s_i"),
        sum(dec(col("z")) * dec(col("z"))).as("q_i"))
    val terms = grp.select(
      col("n_i"),
      floor(lit(1.0e6) * col("s_i").cast("double") * col("s_i").cast("double")
        / col("n_i").cast("double")).cast("bigint").as("term_fx"),
      floor(lit(1.0e6) * col("q_i").cast("double")).cast("bigint").as("q_fx"),
      dec(col("s_i")).as("s_dec"))
    val f = terms.agg(count(lit(1)).as("k_groups"),
      sum(col("n_i")).as("n_total"), sum(col("s_dec")).as("s_all"),
      sum(col("term_fx")).as("sum_term_fx"), sum(col("q_fx")).as("sum_q_fx"))
      .withColumn("gfx", floor(lit(1.0e6)
        * col("s_all").cast("double") * col("s_all").cast("double")
        / col("n_total").cast("double")).cast("bigint"))
      .withColumn("ssb_fx", col("sum_term_fx") - col("gfx"))
      .withColumn("ssw_fx", col("sum_q_fx") - col("sum_term_fx"))
    val ok = col("k_groups") > 1 && col("n_total") > col("k_groups") &&
      col("ssw_fx") > 0
    val fStat = col("ssb_fx").cast("double") /
      (col("k_groups") - 1).cast("double") /
      (col("ssw_fx").cast("double") /
        (col("n_total") - col("k_groups")).cast("double"))
    val crit = StatTests.Chi2Crit5PctX1e6.zipWithIndex.foldLeft(
      lit(null).cast("bigint")) { case (acc, (v, i)) =>
      when(col("k_groups") - 1 === (i + 1), lit(v)).otherwise(acc)
    }
    f.select(col("n_total"), col("k_groups"), col("ssb_fx"), col("ssw_fx"),
      when(ok, floor(fStat * lit(1.0e6)).cast("bigint")).as("f_x1e6"),
      when(ok && crit.isNotNull && col("n_total") - col("k_groups") >= 1000,
        when((col("k_groups") - 1)
          * floor(fStat * lit(1.0e6)).cast("bigint") > crit, 1L)
          .otherwise(0L))
        .otherwise(lit(null).cast("bigint"))
        .as("reject_equal_var_5pct"))
  }

  val leveneBfOracle: String = {
    val critCase = StatTests.Chi2Crit5PctX1e6.zipWithIndex
      .map { case (v, i) => s"WHEN k_groups - 1 = ${i + 1} THEN $v" }
      .mkString("\n        ")
    s"""
    WITH ranked AS (
      SELECT source, n_chars,
        ROW_NUMBER() OVER (PARTITION BY source
          ORDER BY n_chars ASC, doc_id ASC) AS rk,
        COUNT(*) OVER (PARTITION BY source) AS n_g
      FROM documents),
    med AS (
      SELECT source, n_chars AS med FROM ranked WHERE rk = (n_g + 1) // 2),
    zt AS (
      SELECT d.source, ABS(d.n_chars - m.med) AS z
      FROM documents d JOIN med m ON d.source = m.source),
    grp AS (
      SELECT source, COUNT(*) AS n_i, CAST(SUM(z) AS BIGINT) AS s_i,
        SUM(CAST(z AS HUGEINT) * CAST(z AS HUGEINT)) AS q_i
      FROM zt GROUP BY 1),
    terms AS (
      SELECT n_i,
        CAST(FLOOR(1.0e6 * CAST(s_i AS DOUBLE) * CAST(s_i AS DOUBLE)
          / CAST(n_i AS DOUBLE)) AS BIGINT) AS term_fx,
        CAST(FLOOR(1.0e6 * CAST(q_i AS DOUBLE)) AS BIGINT) AS q_fx,
        CAST(s_i AS HUGEINT) AS s_dec
      FROM grp),
    f AS (
      SELECT COUNT(*) AS k_groups, CAST(SUM(n_i) AS BIGINT) AS n_total,
        SUM(s_dec) AS s_all,
        CAST(SUM(term_fx) AS BIGINT) AS sum_term_fx,
        CAST(SUM(q_fx) AS BIGINT) AS sum_q_fx
      FROM terms),
    h AS (
      SELECT k_groups, n_total,
        sum_term_fx - CAST(FLOOR(1.0e6 * CAST(s_all AS DOUBLE)
          * CAST(s_all AS DOUBLE) / CAST(n_total AS DOUBLE)) AS BIGINT)
          AS ssb_fx,
        sum_q_fx - sum_term_fx AS ssw_fx,
        (k_groups > 1 AND n_total > k_groups
          AND sum_q_fx - sum_term_fx > 0) AS ok
      FROM f),
    fx AS (
      SELECT *,
        CAST(ssb_fx AS DOUBLE) / CAST(k_groups - 1 AS DOUBLE)
          / (CAST(ssw_fx AS DOUBLE) / CAST(n_total - k_groups AS DOUBLE))
          AS fstat
      FROM h)
    SELECT n_total, k_groups, ssb_fx, ssw_fx,
      CASE WHEN ok THEN CAST(FLOOR(fstat * 1.0e6) AS BIGINT) END AS f_x1e6,
      CASE WHEN ok AND n_total - k_groups >= 1000 AND (CASE
        $critCase
        ELSE NULL END) IS NOT NULL
        THEN CASE WHEN (k_groups - 1) * CAST(FLOOR(fstat * 1.0e6) AS BIGINT)
          > (CASE
        $critCase
        ELSE NULL END) THEN 1 ELSE 0 END END AS reject_equal_var_5pct
    FROM fx"""
  }

  /** Friedman rank test over the event calendar — treatments =
    * event_type, blocks = day: does any event type systematically
    * out-rank the others ACROSS days (controlling for per-day volume
    * shifts the way kruskal_wallis cannot)? The design is completed
    * explicitly (day × type grid, absent cells count 0), per-block
    * tie-AVERAGED ranks stay integer in DOUBLED units
    * (r2 = 2·RANK() + ties − 1), and χ²_F = (3·ΣR2ⱼ² − 3n²k(k+1)²) ÷
    * (n·k·(k+1)) is exact BIGINT-scaled arithmetic end to end —
    * without the tie-correction divisor, which only makes the test
    * conservative (documented, matches the repo's integer-exact bias
    * rules). Rejection at the χ²(k−1) 5% literal needs n ≥ 10 blocks.
    * Scale: the grid is |days|·|types| rows; every window is
    * partitioned by day over k rows (PlanSpec class: calendar grids).
    */
  def friedmanTest(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(spark, dir)
      .select(expr("ts div 86400000000000").as("d"),
        col("event_type").as("t"))
    val counts = ev.groupBy(col("d"), col("t")).agg(count(lit(1)).as("cnt"))
    val grid = graft.functions.Iterate.checkpoint(
      ev.select(col("d")).distinct()
        .crossJoin(broadcast(ev.select(col("t")).distinct()))
        .join(counts, Seq("d", "t"), "left")
        .withColumn("cnt", coalesce(col("cnt"), lit(0L))),
      Some("day x type grid completed with zero cells"))
    val byBlock = Window.partitionBy(col("d")).orderBy(col("cnt").asc)
    val ties = Window.partitionBy(col("d"), col("cnt"))
    // 2·avgrank = 2·minrank + (ties − 1); RANK() is the min rank of a
    // tie group, so per-block r2 sums hold the k(k+1) invariant exactly
    val r2 = grid
      .withColumn("r2",
        lit(2) * rank().over(byBlock) + count(lit(1)).over(ties) - 1)
    val perType = r2.groupBy(col("t"))
      .agg(sum(col("r2")).cast("bigint").as("r2_sum"))
    val stat = perType.agg(
        count(lit(1)).as("k_treatments"),
        sum(col("r2_sum") * col("r2_sum")).as("sum_r2_sq"))
      .crossJoin(broadcast(
        grid.agg(countDistinct(col("d")).as("n_blocks"))))
    val k = col("k_treatments")
    val n = col("n_blocks")
    val crit = StatTests.Chi2Crit5PctX1e6.zipWithIndex.foldLeft(
      lit(null).cast("bigint")) { case (acc, (v, i)) =>
      when(k - 1 === (i + 1), lit(v)).otherwise(acc)
    }
    val ok = k > 1 && n > 0
    // the statistic is built ONCE and referenced in both outputs —
    // duplicating the div expression inline would let the two copies
    // silently drift apart on a future edit
    val chi2 = expr("(3 * sum_r2_sq * 1000000 "
      + "- 3 * n_blocks * n_blocks * k_treatments * (k_treatments + 1) "
      + "* (k_treatments + 1) * 1000000) "
      + "div (n_blocks * k_treatments * (k_treatments + 1))")
    stat.select(n.as("n_blocks"), k.as("k_treatments"), col("sum_r2_sq"),
      when(ok, chi2).as("chi2_x1e6"),
      when(ok && crit.isNotNull && n >= 10,
        when(chi2 > crit, 1L).otherwise(0L))
        .otherwise(lit(null).cast("bigint")).as("reject_h0_5pct"))
  }

  val friedmanTestOracle: String = {
    val critCase = StatTests.Chi2Crit5PctX1e6.zipWithIndex
      .map { case (v, i) => s"WHEN k_treatments - 1 = ${i + 1} THEN $v" }
      .mkString("\n        ")
    s"""
    WITH ev AS (
      SELECT EPOCH_NS(ts) // 86400000000000 AS d, event_type AS t
      FROM events),
    counts AS (SELECT d, t, COUNT(*) AS cnt FROM ev GROUP BY 1, 2),
    grid AS (
      SELECT dd.d, tt.t, COALESCE(c.cnt, 0) AS cnt
      FROM (SELECT DISTINCT d FROM ev) dd
      CROSS JOIN (SELECT DISTINCT t FROM ev) tt
      LEFT JOIN counts c ON c.d = dd.d AND c.t = tt.t),
    r AS (
      SELECT d, t,
        2 * RANK() OVER (PARTITION BY d ORDER BY cnt ASC)
          + COUNT(*) OVER (PARTITION BY d, cnt) - 1 AS r2
      FROM grid),
    pt AS (
      SELECT t, CAST(SUM(r2) AS BIGINT) AS r2_sum FROM r GROUP BY 1),
    st AS (
      SELECT COUNT(*) AS k_treatments,
        CAST(SUM(r2_sum * r2_sum) AS BIGINT) AS sum_r2_sq,
        (SELECT COUNT(DISTINCT d) FROM ev) AS n_blocks
      FROM pt)
    SELECT n_blocks, k_treatments, sum_r2_sq,
      CASE WHEN k_treatments > 1 AND n_blocks > 0 THEN
        (3 * sum_r2_sq * 1000000
          - 3 * n_blocks * n_blocks * k_treatments * (k_treatments + 1)
          * (k_treatments + 1) * 1000000)
        // (n_blocks * k_treatments * (k_treatments + 1)) END AS chi2_x1e6,
      CASE WHEN k_treatments > 1 AND n_blocks >= 10 AND (CASE
        $critCase
        ELSE NULL END) IS NOT NULL
        THEN CASE WHEN (3 * sum_r2_sq * 1000000
          - 3 * n_blocks * n_blocks * k_treatments * (k_treatments + 1)
          * (k_treatments + 1) * 1000000)
        // (n_blocks * k_treatments * (k_treatments + 1)) > (CASE
        $critCase
        ELSE NULL END) THEN 1 ELSE 0 END END AS reject_h0_5pct
    FROM st"""
  }

  def defs: Map[String, QueryDef] = Map(
    "jarque_bera" -> QueryDef.sql(jarqueBera, jarqueBeraOracle),
    "levene_bf" -> QueryDef.sql(leveneBf, leveneBfOracle),
    "friedman_test" -> QueryDef.sql(friedmanTest, friedmanTestOracle)
  )
}
