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
        Exact.dsum(col("l_quantity")).as("sum_qty"),
        Exact.dsum(col("l_extendedprice")).as("sum_base_price"),
        Exact.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
        Exact.dsum(
          col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))).as("sum_charge"),
        Exact.davg(col("l_quantity")).as("avg_qty"),
        Exact.davg(col("l_extendedprice")).as("avg_price"),
        Exact.davg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
  }

  val q1AggOracle: String = s"""
    SELECT l_returnflag, l_linestatus,
      ${Exact.sqlDsum("l_quantity")} AS sum_qty,
      ${Exact.sqlDsum("l_extendedprice")} AS sum_base_price,
      ${Exact.sqlDsum("l_extendedprice * (1.0 - l_discount)")} AS sum_disc_price,
      ${Exact.sqlDsum("l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)")} AS sum_charge,
      ${Exact.sqlDavg("l_quantity")} AS avg_qty,
      ${Exact.sqlDavg("l_extendedprice")} AS avg_price,
      ${Exact.sqlDavg("l_discount")} AS avg_disc,
      COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus"""

  def defs: Map[String, QueryDef] = Map(
    "q1_agg" -> QueryDef.sql(q1Agg, q1AggOracle)
  )
}
