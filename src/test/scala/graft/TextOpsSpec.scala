package graft

import graft.functions.TextOps
import org.apache.spark.sql.functions._

/** Edge cases for the text/hash building blocks. */
class TextOpsSpec extends SparkSpec {

  private def one(text: String) = {
    import spark.implicits._
    Seq(text).toDF("text")
  }

  test("shingles3: short texts produce empty shingle sets, not errors") {
    val r = one("two words")
      .select(TextOps.shingles3(TextOps.words(col("text"))).as("sh"))
      .first().getSeq[String](0)
    assert(r.isEmpty)
  }

  test("shingles3: produces n-2 shingles for n distinct words") {
    val r = one("a b c d e")
      .select(TextOps.shingles3(TextOps.words(col("text"))).as("sh"))
      .first().getSeq[String](0)
    assert(r == Seq("a b c", "b c d", "c d e"))
  }

  test("jaccard: identical sets → 1.0, disjoint → 0.0") {
    import spark.implicits._
    val df = Seq((Seq("x", "y"), Seq("x", "y"), Seq("z", "w")))
      .toDF("a", "b", "c")
    val r = df.select(
      TextOps.jaccard(col("a"), col("b")),
      TextOps.jaccard(col("a"), col("c"))).first()
    assert(r.getDouble(0) == 1.0 && r.getDouble(1) == 0.0)
  }

  test("rollingHash: order-sensitive (a b != b a), stable") {
    val h1 = one("a b").select(TextOps.rollingHash(
      TextOps.hashes(TextOps.words(col("text")))).as("h")).first().getLong(0)
    val h2 = one("b a").select(TextOps.rollingHash(
      TextOps.hashes(TextOps.words(col("text")))).as("h")).first().getLong(0)
    val h1again = one("a b").select(TextOps.rollingHash(
      TextOps.hashes(TextOps.words(col("text")))).as("h")).first().getLong(0)
    assert(h1 != h2)
    assert(h1 == h1again)
  }

  test("minhash: permutation of element order does not change the signature") {
    import spark.implicits._
    val df = Seq((Seq("p", "q", "r"), Seq("r", "q", "p"))).toDF("a", "b")
    val r = df.select(
      TextOps.minhash(TextOps.hashes(col("a")), 1000003L, 12345L),
      TextOps.minhash(TextOps.hashes(col("b")), 1000003L, 12345L)).first()
    assert(r.getLong(0) == r.getLong(1))
  }
}
