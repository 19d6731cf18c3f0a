package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns as pure Column
  * expressions (codegen'd higher-order functions — no UDFs).
  *
  * Determinism: elements are cast float→double (exact), products are
  * single IEEE ops, and sums are explicit LEFT FOLDS via `aggregate`, so
  * the association order is pinned. The DuckDB mirrors use
  * LIST_REDUCE(LIST_PREPEND(0.0, …)) — the same left fold — giving
  * bit-identical doubles instead of "close" ones.
  */
object VectorOps {

  /** Left-fold sum of an array<double> expression. */
  private def foldSum(arr: Column): Column =
    aggregate(arr, lit(0.0), (acc, x) => acc + x)

  /** Dot product of two float-array columns, computed in double via the
    * native codegen'd [[org.apache.spark.sql.graft.FloatDot]] (higher-order
    * function lambdas are interpreted per element — ~10× slower).
    */
  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      org.apache.spark.sql.graft.FloatDot(
        org.apache.spark.sql.GraftBridge.expression(a),
        org.apache.spark.sql.GraftBridge.expression(b)))

  /** Reference fold-based dot product (interpreted HOF path) — kept for
    * spec-level equivalence checks against [[dot]].
    */
  def dotFold(a: Column, b: Column): Column =
    foldSum(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")))

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity: dot / (‖a‖·‖b‖), fused into one array pass via
    * the native [[org.apache.spark.sql.graft.CosineSim]] — three separate
    * FloatDot walks (dot + both norms) become one loop with bit-identical
    * per-accumulator folds.
    */
  def cosine(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      org.apache.spark.sql.graft.CosineSim(
        org.apache.spark.sql.GraftBridge.expression(a),
        org.apache.spark.sql.GraftBridge.expression(b)))

  /** Reference three-pass cosine (dot/norm composition) — kept for
    * spec-level equivalence checks against [[cosine]].
    */
  def cosineComposed(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** DuckDB mirror of [[dot]]: index-based left fold, 1-based lists. */
  def sqlDot(a: String, b: String): String =
    s"LIST_REDUCE(LIST_PREPEND(CAST(0 AS DOUBLE), " +
      s"LIST_TRANSFORM(RANGE(1, LEN($a) + 1), " +
      s"i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE))), (acc, x) -> acc + x)"

  def sqlNorm(a: String): String = s"SQRT(${sqlDot(a, a)})"

  def sqlCosine(a: String, b: String): String =
    s"${sqlDot(a, b)} / (${sqlNorm(a)} * ${sqlNorm(b)})"
}
