package graft

import org.apache.spark.sql.SparkSession

/** Driver benchmark main: runs every registered query against
  * SPARK_GRAFT_SF_DIR and prints one JSON line. Queries run in sorted key
  * order (stable run-to-run), timed individually via count().
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the JVM/codegen/file-source paths once so the first measured
    // query doesn't absorb session startup cost.
    spark.read.parquet(s"$sfDir/lineitem.parquet").limit(10).count()
    spark.range(1000).selectExpr("sum(id)").count()
    // A query that throws must not masquerade as a fast success: failures
    // are recorded as -1 in the queries map AND listed in "errors".
    // SPARK_GRAFT_ONLY=a,b,c restricts the run (dev loop: time one query).
    val only = QueryDef.subsetFilter(SparkEntry.queries.keySet)
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
      val t0 = System.nanoTime()
      val err = try { fn(spark, sfDir).count(); None } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          Some(name)
      }
      val elapsed = (System.nanoTime() - t0) / 1e9
      // Release per-operator persisted frames between queries (cache
      // accumulation would skew later queries' memory headroom).
      spark.catalog.clearCache()
      (name, if (err.isEmpty) elapsed else -1.0, err)
    }
    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errs = results.flatMap(_._3).map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
