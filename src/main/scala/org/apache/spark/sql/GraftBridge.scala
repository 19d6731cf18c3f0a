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

  /** Convert a Column to a plain Catalyst expression EAGERLY. The lazy
    * `expression` wrapper (ColumnNodeExpression) is only unwrapped while
    * analyzing standard operators — inside a custom LogicalPlan node it
    * survives to execution and fails as Unevaluable, so custom plans must
    * use this converter instead.
    */
  def catalystExpression(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter(c.node)

  /** Wrap a custom LogicalPlan as a DataFrame. */
  def ofRows(spark: SparkSession, plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** The analyzed logical plan backing a DataFrame. */
  def logicalPlan(df: DataFrame): org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.asInstanceOf[classic.Dataset[Row]].logicalPlan
}
