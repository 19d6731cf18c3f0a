package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the `private[sql]` Column⇄Expression converters so graft's
  * custom Catalyst expressions compose with the public DataFrame API.
  * Declared inside `org.apache.spark.sql` on purpose — the standard
  * technique for Spark-native libraries that ship their own expressions.
  */
object GraftBridge {
  /** Wrap a Catalyst expression as a user-facing Column. */
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)

  /** Extract the Catalyst expression backing a Column. */
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
