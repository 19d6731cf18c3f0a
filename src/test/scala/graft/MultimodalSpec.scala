package graft

import graft.operators.Multimodal

/** Exercises the multimodal binary-column pipeline: schema, determinism,
  * and batch shape of the (stubbed) decode stage.
  */
class MultimodalSpec extends SparkSpec {

  test("decodeStub yields typed features for every document") {
    val ds = Multimodal.decodeStub(spark, sfDir)
    val rows = ds.collect()
    val nDocs = Tables.documents(spark, sfDir).count()
    assert(rows.length.toLong == nDocs)
    rows.foreach { m =>
      assert(m.features.length == 8)
      assert(m.width >= 16 && m.width < 80)
      assert(m.height >= 16 && m.height < 80)
      assert(m.n_bytes > 0)
      assert(m.media_type == (if (m.doc_id % 2 == 0) "image/png" else "audio/wav"))
    }
  }

  test("decodeStub is deterministic across runs") {
    val a = Multimodal.decodeStub(spark, sfDir).collect()
      .map(m => (m.doc_id, m.width, m.height, m.features.toSeq)).sortBy(_._1)
    val b = Multimodal.decodeStub(spark, sfDir).collect()
      .map(m => (m.doc_id, m.width, m.height, m.features.toSeq)).sortBy(_._1)
    assert(a.sameElements(b))
  }

  test("frame sampling takes exactly every 4th frame, features normalized") {
    import org.apache.spark.sql.functions._
    val df = Multimodal.multimodalFrameSample(spark, sfDir).persist()
    assert(df.filter(pmod(col("frame_idx"), lit(4)) =!= 0).count() == 0,
      "only stride-aligned frames may be sampled")
    // per doc: sampled count == ceil(n_frames / stride)
    val bad = df.groupBy(col("doc_id"), col("n_frames"))
      .agg(count(lit(1)).as("sampled"))
      .filter(col("sampled") =!= expr("(n_frames + 3) div 4"))
    assert(bad.count() == 0, "sampled-frame count must be ceil(n_frames/4)")
    assert(df.filter(col("f0") < 0 || col("f0") > 1).count() == 0)
    df.unpersist()
  }

  test("resize dims agree with decodeStub's JVM dims per document (no geometry drift)") {
    import org.apache.spark.sql.functions._
    val jvm = Multimodal.decodeStub(spark, sfDir)
      .collect().map(m => m.doc_id -> (m.width.toLong, m.height.toLong)).toMap
    val sqlSide = Multimodal.multimodalResize(spark, sfDir)
      .collect().map(r => r.getAs[Long]("doc_id")
        -> (r.getAs[Long]("width"), r.getAs[Long]("height"))).toMap
    assert(sqlSide == jvm,
      "stubWidth/stubHeight Columns must reproduce decodeStub's dimensions exactly")
  }

  test("resize plan fits the 64-box, preserves orientation, floors at 1") {
    import org.apache.spark.sql.functions._
    val df = Multimodal.multimodalResize(spark, sfDir).persist()
    assert(df.filter(greatest(col("out_width"), col("out_height")) =!= 64).count() == 0,
      "the larger dimension must map exactly onto the box edge")
    assert(df.filter(col("out_width") < 1 || col("out_height") < 1).count() == 0)
    val flipped = df.filter(
      (col("width") > col("height") && col("out_width") < col("out_height")) ||
        (col("width") < col("height") && col("out_width") > col("out_height")))
    assert(flipped.count() == 0, "resize must not flip the aspect orientation")
    df.unpersist()
  }
}
