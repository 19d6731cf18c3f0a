package graft.streaming

import graft.operators.{Dedup, TextAnalysis}
import graft.pipeline.CurationPipeline
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Incremental corpus ingestion — the streaming twin of
  * [[graft.pipeline.CurationPipeline]]'s batch front half: documents
  * arrive continuously, each micro-batch is quality-gated and deduped
  * against the STANDING corpus, and the survivors append to both the
  * corpus table and the materialized LSH band index, so the index is
  * current for the very next batch. This is the rolling-ingestion shape
  * a 100 TB training-data lake actually runs: the full corpus is never
  * re-read — each batch pays |batch| work against broadcast-size batch
  * frames plus an index probe that touches only colliding band keys.
  *
  * Stages per micro-batch (all decisions deterministic):
  *   1. within-batch exact dedup (min-id per content hash);
  *   2. quality gate (gopher rules — same predicate as the batch
  *      pipeline's stage 1);
  *   3. exact dedup vs the corpus: drop docs whose content hash already
  *      landed (hashes join the batch side broadcast);
  *   4. near dedup: within-batch MinHash pair losers drop first, then
  *      survivors probe the on-disk band index
  *      ([[CurationPipeline.probeLshIndex]]);
  *   5. append survivors to the corpus table and their band keys to the
  *      index.
  *
  * Replay safety: foreachBatch is at-least-once — a replayed batch
  * re-enters stage 3, where every previously-appended doc now
  * content-hash-matches the corpus and drops out, so replays are
  * absorbed at the CONTENT level without a transactional sink (same
  * discipline as the MERGE writers, achieved by the dedup semantics
  * themselves).
  */
object StreamingCuration {

  private def exists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Curate ONE batch of documents against the standing corpus + index
    * at `corpusPath` / `indexPath` (created on first use). Returns the
    * number of surviving (appended) documents — the per-batch manifest
    * line.
    */
  def ingestBatch(spark: SparkSession, batch: DataFrame,
      corpusPath: String, indexPath: String): Long = {
    // 1. within-batch exact dedup: keep the min-id copy per hash.
    val keepers = Dedup.dedupExactDf(batch)
      .select(col("keeper_doc_id").as("doc_id"))
    val exact = batch.join(keepers, Seq("doc_id"), "left_semi")

    // 2. quality gate — identical predicate to the batch pipeline.
    val passing = TextAnalysis.gopherRulesDf(exact)
      .filter(col("pass")).select(col("doc_id"))
    val quality = exact.join(passing, Seq("doc_id"), "left_semi")

    val standing = exists(spark, corpusPath)

    // 3. exact dedup vs the standing corpus. The corpus side reduces to
    // distinct hashes; the join keys on the hash, so a replayed batch's
    // docs all match and drop — content-level idempotence.
    val fresh =
      if (!standing) quality
      else {
        val corpusHashes = spark.read.parquet(corpusPath)
          .select(md5(col("text")).as("content_hash")).distinct()
        quality.withColumn("content_hash", md5(col("text")))
          .join(corpusHashes, Seq("content_hash"), "left_anti")
          .drop("content_hash")
      }

    // 4. near dedup: within-batch pair losers first (lower id
    // dominates, the batch pipeline's stage-3 rule), then the standing
    // index probe — only band-key collisions are ever verified.
    val batchLosers = Dedup.minhashPairsDf(fresh)
      .select(col("doc_b").as("doc_id")).distinct()
    val batchClean = fresh.join(batchLosers, Seq("doc_id"), "left_anti")
    val survivors =
      if (!standing) batchClean
      else {
        val corpus = spark.read.parquet(corpusPath)
        val nearDups = CurationPipeline
          .probeLshIndex(spark, indexPath, corpus, batchClean)
          .select(col("new_doc").as("doc_id")).distinct()
        batchClean.join(nearDups, Seq("doc_id"), "left_anti")
      }

    // 5. append survivors + their band keys; the index is current for
    // the next micro-batch.
    val out = survivors.persist()
    val n = out.count()
    if (n > 0) {
      out.write.mode("append").parquet(corpusPath)
      Dedup.lshBandsDf(out).write.mode("append").parquet(indexPath)
    }
    out.unpersist()
    n
  }

  /** Wire [[ingestBatch]] behind a streaming documents source: each
    * micro-batch curates and appends transactionally-enough (see replay
    * note in the object doc).
    */
  def start(spark: SparkSession, docs: DataFrame,
      corpusPath: String, indexPath: String): StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        ingestBatch(spark, batch, corpusPath, indexPath); ()
      }
      .start()
}
