package graft

import graft.operators.Relational
import org.apache.spark.sql.functions._

/** The custom TopKPerKey physical operator: plan shape + exact agreement
  * with the window-function formulation.
  */
class TopKSpec extends SparkSpec {

  test("topKPerKey plans through TopKPerKeyExec without a partition sort") {
    val df = Relational.topKPerKey(
      Tables.orders(spark, sfDir),
      keys = Seq(col("o_custkey")),
      order = Seq(col("o_totalprice").desc, col("o_orderkey").asc),
      k = 3)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("TopKPerKey"), s"custom exec missing:\n$p")
    assert(!p.contains("Sort "), s"unexpected sort in plan:\n$p")
    assert(p.contains("Exchange hashpartitioning"), "keys must be clustered")
  }

  test("topKPerKey result set equals the window row_number formulation") {
    val native = Relational.topKPerKey(
      Tables.orders(spark, sfDir),
      keys = Seq(col("o_custkey")),
      order = Seq(col("o_totalprice").desc, col("o_orderkey").asc),
      k = 3)
      .select("o_custkey", "o_orderkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val window = Relational.windowRank(spark, sfDir)
      .select("customer_key", "order_key").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(native == window)
    assert(native.nonEmpty)
  }

  test("keys with fewer than k rows keep all their rows") {
    import spark.implicits._
    val df = Seq((1L, 10.0), (1L, 20.0), (2L, 5.0)).toDF("k", "v")
    val r = Relational.topKPerKey(df, Seq(col("k")), Seq(col("v").desc), 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(r == Set((1L, 10.0), (1L, 20.0), (2L, 5.0)))
  }
}
