package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered engine capability: the Spark implementation plus (when the
  * semantics are SQL-expressible) an equivalent DuckDB oracle query the
  * driver hash-compares against. `oracle = None` ⇒ rows-only check.
  */
final case class QueryDef(
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def sql(fn: (SparkSession, String) => DataFrame, oracle: String): QueryDef =
    QueryDef(fn, Some(oracle))
  def rowsOnly(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(fn, None)
}
