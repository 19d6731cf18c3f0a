package graft.operators

import graft.{QueryDef, Tables}
import graft.functions.Exact
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Relational core: headline scan/join/agg workload (§2.D).
  *
  * These are the bench-critical queries. Design notes for 100 TB:
  *  - single pass over lineitem for q1 (scan + hash agg, fully
  *    whole-stage-codegen'd, map-side partial aggregation);
  *  - filters applied before joins so parquet pushdown prunes row groups.
  */
object Relational {

  /** TPC-H Q1-style pricing summary: one scan, hash aggregate.
    * Reference analogue: the DWH fact rollups in check_DWH.py.
    */
  def q1Agg(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
    l.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(Exact.dsum(col("l_quantity")), 2).as("sum_qty"),
        round(Exact.dsum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(Exact.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
          .as("sum_disc_price"),
        round(Exact.dsum(
          col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))), 2)
          .as("sum_charge"),
        round(Exact.davg(col("l_quantity")), 6).as("avg_qty"),
        round(Exact.davg(col("l_extendedprice")), 6).as("avg_price"),
        round(Exact.davg(col("l_discount")), 6).as("avg_disc"),
        count(lit(1)).as("count_order"))
  }

  val q1AggOracle: String = s"""
    SELECT l_returnflag, l_linestatus,
      ROUND(${Exact.sqlDsum("l_quantity")}, 2) AS sum_qty,
      ROUND(${Exact.sqlDsum("l_extendedprice")}, 2) AS sum_base_price,
      ROUND(${Exact.sqlDsum("l_extendedprice * (1.0 - l_discount)")}, 2) AS sum_disc_price,
      ROUND(${Exact.sqlDsum("l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)")}, 2) AS sum_charge,
      ROUND(${Exact.sqlDavg("l_quantity")}, 6) AS avg_qty,
      ROUND(${Exact.sqlDavg("l_extendedprice")}, 6) AS avg_price,
      ROUND(${Exact.sqlDavg("l_discount")}, 6) AS avg_disc,
      COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus"""

  def defs: Map[String, QueryDef] = Map(
    "q1_agg" -> QueryDef.sql(q1Agg, q1AggOracle)
  )
}
