package graft

import org.apache.spark.sql.SparkSession

/** Scratch diagnostics main (not part of the driver contract). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = Tables.events(spark, "/root/testdata/sf0.001")
    e.printSchema()
    e.show(3, false)
    val o = Tables.orders(spark, "/root/testdata/sf0.001")
    o.printSchema()
    spark.stop()
  }
}
