package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Deterministic aggregation helpers.
  *
  * Double summation is order-dependent, and Spark's partition/merge order
  * differs from any other engine's — so a raw `sum(double)` can disagree
  * with an oracle in the last bits and fail a hash compare. We instead cast
  * each addend to an exact decimal (rounding a double to 6 fractional
  * digits is engine-independent: no double lies exactly on a decimal half
  * boundary), sum exactly in decimal (associative ⇒ order-independent),
  * and cast the final total back to double (IEEE-defined, deterministic).
  * The same construction is used verbatim in the DuckDB oracle SQL.
  *
  * At scale this costs one decimal column per measure during the agg —
  * still whole-stage-codegen'd, still map-side combinable.
  */
object Exact {

  /** Exact sum of a double expression, order-independent: decimal(28,6)
    * addends, decimal accumulator, final cast to double.
    * Oracle equivalent: `CAST(SUM(CAST(x AS DECIMAL(28,6))) AS DOUBLE)`.
    */
  def dsum(c: Column): Column =
    sum(c.cast(DecimalType(28, 6))).cast(DoubleType)

  /** Exact-sum average: dsum / count, deterministic double division.
    * Oracle: `CAST(SUM(CAST(x AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*)`.
    */
  def davg(c: Column): Column =
    dsum(c) / count(lit(1)).cast(DoubleType)

  /** Exact decimal sum kept IN decimal — for threshold comparisons that
    * must stay FP-free (compare scaled decimals, cast to double only on
    * output). Oracle: `SUM(CAST(x AS DECIMAL(28,6)))`.
    */
  def decSum(c: Column): Column =
    sum(c.cast(DecimalType(28, 6)))

  /** SQL fragment mirroring [[dsum]] for the DuckDB oracle.
    *
    * The decimal total goes to double THROUGH VARCHAR: DuckDB's direct
    * DECIMAL→DOUBLE cast is two-step (double(unscaled int) ÷ 10^scale —
    * two roundings), while Spark's BigDecimal.doubleValue is correctly
    * rounded in one step, so once a group total crosses 2^53 micros
    * (≈ 9.0e9 in value units) the two drift by one ulp — caught by the
    * r15 sf1 decade sweep on q1_agg (three groups, ±3.8e-6 at 2e10).
    * Decimal→varchar prints the exact digits and varchar→double parses
    * correctly rounded, which matches Spark bit-for-bit at any total;
    * the conversion runs once per GROUP, not per row.
    */
  def sqlDsum(expr: String): String =
    s"CAST(CAST(SUM(CAST(($expr) AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE)"

  /** Wide variant for sums of squares (32 integer digits). */
  def dsumWide(c: Column): Column =
    sum(c.cast(DecimalType(38, 6))).cast(DoubleType)

  def sqlDsumWide(expr: String): String =
    s"CAST(CAST(SUM(CAST(($expr) AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE)"

  /** SQL fragment mirroring [[davg]]. */
  def sqlDavg(expr: String): String =
    s"${sqlDsum(expr)} / CAST(COUNT(*) AS DOUBLE)"
}
