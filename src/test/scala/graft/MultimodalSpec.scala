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
}
