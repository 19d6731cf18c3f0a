package graft

import org.apache.spark.sql.functions._

/** Invariant tests for the round-9 DQ/retrieval additions (Benford,
  * l-diversity, BM25, quantile normalization, Theil–Sen). Value-level
  * correctness is the DuckDB oracle gate's job.
  */
class RetrievalSpec extends SparkSpec {

  test("benford_audit: 9 digits per column, shares sum to ~1e6, counts reconcile") {
    val rows = operators.Quality.benfordAudit(spark, sfDir).collect()
    val byCol = rows.groupBy(_.getAs[String]("col_name"))
    assert(byCol.keySet == Set("l_extendedprice", "o_totalprice"))
    byCol.foreach { case (name, rs) =>
      rs.foreach { r =>
        val d = r.getAs[Long]("digit"); assert(d >= 1 && d <= 9)
        assert(r.getAs[Long]("dev_ppm") ==
          r.getAs[Long]("observed_ppm") - r.getAs[Long]("expected_ppm"))
      }
      val share = rs.map(_.getAs[Long]("observed_ppm")).sum
      assert(share <= 1000000L && share > 1000000L - rs.length)
      val n = rs.map(_.getAs[Long]("n")).sum
      val want =
        if (name == "l_extendedprice") Tables.lineitem(spark, sfDir).count()
        else Tables.orders(spark, sfDir).count()
      assert(n == want, s"$name digit counts must cover every row")
    }
  }

  test("l_diversity_audit: partitions the quasi groups and the customers") {
    val rows = operators.Quality.lDiversityAudit(spark, sfDir).collect()
    rows.foreach { r =>
      val l = r.getAs[Long]("l_distinct"); assert(l >= 1 && l <= 5)
    }
    val groups = Tables.customer(spark, sfDir)
      .select(col("c_nationkey"), floor(col("c_acctbal") / 1000).as("b"))
      .distinct().count()
    assert(rows.map(_.getAs[Long]("n_groups")).sum == groups)
    assert(rows.map(_.getAs[Long]("n_customers")).sum ==
      Tables.customer(spark, sfDir).count())
  }

  test("bm25_topk: positive descending scores, every hit contains a query term") {
    val rows = operators.Retrieval.bm25Topk(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val scores = rows.map(_.getAs[Double]("score"))
    assert(scores.forall(_ > 0))
    assert(scores.sameElements(scores.sorted.reverse))
    val hitIds = rows.map(_.getAs[Long]("doc_id")).toSet
    val withTerm = Tables.documents(spark, sfDir)
      .filter(col("text").rlike("(^|\\s)(spark|hash|merge)(\\s|$)"))
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(hitIds.subsetOf(withTerm), "a scored doc must contain a query term")
  }

  test("quantile_normalize: bijection on ranks, monotone within source") {
    val rows = operators.Retrieval.quantileNormalize(spark, sfDir).collect()
    val n = Tables.documents(spark, sfDir).count()
    assert(rows.length.toLong == n, "every document must map")
    val globalChars = Tables.documents(spark, sfDir)
      .select(col("n_chars")).collect().map(_.getLong(0)).toSet
    rows.foreach(r => assert(globalChars(r.getAs[Long]("norm_chars")),
      "normalized value must come from the global distribution"))
    rows.groupBy(_.getAs[String]("source")).foreach { case (_, rs) =>
      val sorted = rs.sortBy(r =>
        (r.getAs[Long]("n_chars"), r.getAs[Long]("doc_id")))
      val normed = sorted.map(_.getAs[Long]("norm_chars"))
      assert(normed.sameElements(normed.sorted),
        "normalization must preserve within-source order")
    }
  }

  test("theilsen_trend: one row per nation, pair counts are C(months, 2)") {
    val rows = operators.Retrieval.theilsenTrend(spark, sfDir).collect()
    val monthly = Tables.orders(spark, sfDir)
      .join(Tables.customer(spark, sfDir),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_nationkey").cast("long").as("nk"),
        (year(col("o_orderdate")) * 12 + month(col("o_orderdate"))).as("m"))
      .distinct().collect()
      .groupBy(_.getAs[Long]("nk")).view.mapValues(_.length.toLong).toMap
    assert(rows.map(_.getAs[Long]("nationkey")).toSet == monthly.keySet)
    rows.foreach { r =>
      val k = monthly(r.getAs[Long]("nationkey"))
      assert(r.getAs[Long]("n_pairs") == k * (k - 1) / 2)
    }
  }
}
