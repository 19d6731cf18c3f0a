package graft

import graft.sources.Sinks
import org.apache.spark.sql.functions.col
import java.nio.file.Files

/** Model-based property tests for the MERGE writers: many rounds of
  * pseudo-random batches (fixed seed — reproducible failures) against an
  * in-memory reference model. This is the class of bug example-based
  * specs miss: interactions across REPEATED merges (a key updated, then
  * re-shipped unchanged, then updated back to an old value, keys
  * colliding inside one batch, ...).
  */
class UpsertModelSpec extends SparkSpec {

  test("upsertParquet agrees with a key-map model across 8 random batches") {
    import spark.implicits._
    val path = Files.createTempDirectory("graft_model").toString + "/t"
    val rnd = new scala.util.Random(42)
    var model = Map.empty[Int, Int]
    for (round <- 1 to 8) {
      val batch = Seq.fill(20)((rnd.nextInt(30), rnd.nextInt(1000)))
      // The writer collapses in-batch duplicate keys to the max struct;
      // with a single attribute that is the max value.
      model ++= batch.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).max }
      Sinks.upsertParquet(batch.toDF("k", "v"), path, Seq("k"))
      val disk = spark.read.parquet(path).as[(Int, Int)].collect().toMap
      assert(disk == model, s"diverged from model at round $round")
    }
  }

  test("upsertScd2 keeps one current version per key and mints versions only on change") {
    import spark.implicits._
    val path = Files.createTempDirectory("graft_model").toString + "/dim"
    val rnd = new scala.util.Random(7)
    var currents = Map.empty[Int, Int]
    var minted = 0
    for (round <- 1 to 8) {
      val batch = Seq.fill(12)((rnd.nextInt(15), rnd.nextInt(5)))
      val collapsed = batch.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).max }
      val changed = collapsed.filter { case (k, v) => !currents.get(k).contains(v) }
      minted += changed.size
      currents ++= changed
      Sinks.upsertScd2(batch.toDF("k", "v"), path, Seq("k"),
        f"2024-01-$round%02d 00:00:00")
      val disk = spark.read.parquet(path)
      assert(disk.count() == minted,
        s"round $round: expected $minted total versions, got ${disk.count()}")
      val cur = disk.filter(col("is_current"))
        .select("k", "v").as[(Int, Int)].collect().toMap
      assert(cur == currents, s"round $round: current slice diverged from model")
      // Exactly one current version per key, ever.
      assert(disk.filter(col("is_current")).groupBy("k").count()
        .filter(col("count") > 1).count() == 0)
    }
  }
}
