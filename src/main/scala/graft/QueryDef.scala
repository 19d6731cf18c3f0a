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

  /** Parse SPARK_GRAFT_ONLY (dev-loop subset filter, shared by Verify and
    * Bench): trims entries and FAILS FAST on names that match no
    * registered query — a typo'd subset would otherwise verify nothing
    * and still report success.
    */
  def subsetFilter(known: Set[String]): Option[Set[String]] =
    sys.env.get("SPARK_GRAFT_ONLY").map { raw =>
      val names = raw.split(",").map(_.trim).filter(_.nonEmpty).toSet
      val unknown = names.diff(known)
      require(unknown.isEmpty,
        s"SPARK_GRAFT_ONLY names no registered query: ${unknown.mkString(", ")}")
      require(names.nonEmpty, "SPARK_GRAFT_ONLY is set but names no queries")
      System.err.println(s"[graft] subset run: ${names.size} of ${known.size} queries")
      names
    }
}
