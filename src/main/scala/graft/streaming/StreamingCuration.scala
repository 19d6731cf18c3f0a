package graft.streaming

import graft.operators.{Dedup, TextAnalysis}
import graft.pipeline.CurationPipeline
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Incremental corpus ingestion — the streaming twin of
  * [[graft.pipeline.CurationPipeline]]'s batch front half: documents
  * arrive continuously, each micro-batch is quality-gated and deduped
  * against the STANDING corpus, and the survivors append to the corpus
  * table, the LSH band index, and a narrow content-hash table — so all
  * three are current for the very next batch. This is the rolling shape
  * a 100 TB training-data lake actually runs, and per-batch cost NEVER
  * scales with the corpus:
  *
  *   - exact dedup probes the content-HASH table (one 32-char column —
  *     not a re-hash of the corpus text);
  *   - near dedup first narrows to candidate indexed docs via the band
  *     index (collisions only), then reads the corpus doc_id-PRUNED to
  *     those candidates for the shingle verify;
  *   - the corpus text itself is read only for verify candidates.
  *
  * Stages per micro-batch (all decisions deterministic):
  *   1. within-batch exact dedup (min-id per content hash);
  *   2. quality gate (gopher rules — same predicate as the batch
  *      pipeline's stage 1);
  *   3. exact dedup vs the corpus: anti-join on the content-hash table;
  *   4. near dedup: within-batch MinHash pair losers drop first, then
  *      survivors probe the on-disk band index
  *      ([[CurationPipeline.probeLshIndex]] over the candidate-pruned
  *      corpus slice);
  *   5. append survivors' rows, band keys, and content hashes.
  *
  * Replay safety: foreachBatch is at-least-once — a replayed batch
  * re-enters stage 3, where every previously-appended doc now
  * hash-matches and drops out, so full-batch replays are absorbed at
  * the CONTENT level (spec-proven). The residue is the crash window
  * BETWEEN the three appends (corpus landed, hashes not): that batch
  * would re-append on replay. Production closes it by running the
  * appends as one transaction on an ACID table format; the engine-side
  * semantics here are the same either way.
  */
object StreamingCuration {

  private def exists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** The narrow exact-dedup probe table that rides along with the
    * corpus: one `content_hash` column, appended batch-by-batch.
    */
  private def hashesPath(corpusPath: String): String = corpusPath + "_hashes"

  /** Max candidate ids the near-dup probe may materialize on the driver
    * for the isin fast path. Under the cap, a literal id filter reaches
    * the corpus parquet scan as a pushed-down predicate — the cheapest
    * possible pruned read, and 10⁴ longs is ~80 KB of driver memory.
    * OVER the cap (one hot band key — a boilerplate template shared
    * corpus-wide — makes the candidate set corpus-proportional), the
    * probe falls back to [[candidateDocs]]' distributed semi-join, so
    * the hot-key case costs a join, never a driver OOM or a
    * megaliteral IN predicate. Tunable per workload via
    * `spark.graft.candidateIdCap`.
    */
  private def candidateIdCap(spark: SparkSession): Int =
    spark.conf.get("spark.graft.candidateIdCap", "10000").toInt

  /** Corpus slice holding the candidate indexed docs' text — a
    * DISTRIBUTED doc_id semi-join, the over-the-cap fallback exposed as
    * its own seam so the spec can pin the plan shape: past the cap the
    * candidate ids must never round-trip through the driver (no
    * collect → isin literal list). AQE picks the join strategy from
    * the runtime candidate count.
    */
  private[graft] def candidateDocs(spark: SparkSession,
      corpusPath: String, candIds: DataFrame): DataFrame =
    spark.read.parquet(corpusPath)
      .join(candIds, Seq("doc_id"), "left_semi")

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

    // Each probe table gates independently: after a crash inside the
    // step-5 append sequence a later table may be missing while an
    // earlier one landed — a missing table simply skips its check (the
    // at-least-once residue documented above), it never fails the batch.
    val hasHashes = exists(spark, hashesPath(corpusPath))
    val hasIndex = exists(spark, indexPath) && exists(spark, corpusPath)

    // 3. exact dedup vs the standing corpus — against the HASH table,
    // never a re-hash of the corpus text. A replayed batch's docs all
    // match here and drop: content-level idempotence.
    val fresh =
      if (!hasHashes) quality
      else
        quality.withColumn("content_hash", md5(col("text")))
          .join(spark.read.parquet(hashesPath(corpusPath)),
            Seq("content_hash"), "left_anti")
          .drop("content_hash")

    // 4. near dedup: within-batch pair losers first (lower id
    // dominates, the batch pipeline's stage-3 rule), then the standing
    // index probe. The verify step needs candidate INDEXED docs' text;
    // candidates come from band-key collisions only (index ⋈
    // broadcast(batchKeys) — the batch's distinct band keys are the
    // broadcast side, bounded by batch size), and the corpus read is
    // doc_id-PRUNED to them two ways by collision count: a SMALL
    // candidate set (≤ [[candidateIdCap]], the steady-state case) is
    // collected ONCE and pushed into the corpus scan as a literal id
    // predicate — one job, predicate-pushdown read; a LARGE one (a hot
    // band key making candidates corpus-proportional) is NEVER
    // materialized on the driver and prunes via [[candidateDocs]]'
    // distributed semi-join instead — AQE picks the join strategy from
    // runtime sizes. Slower in the hot case, never a driver OOM.
    val batchLosers = Dedup.minhashPairsDf(fresh)
      .select(col("doc_b").as("doc_id")).distinct()
    val batchClean = fresh.join(batchLosers, Seq("doc_id"), "left_anti")
      .transform(graft.functions.PlanGuard.persist(_))
    // the cleaned batch's band keys, computed AT MOST ONCE per
    // micro-batch (lazy eager-checkpoint): the key-collision probe, the
    // index probe, and the step-5 index append all read this frame —
    // re-banding at each site would re-run the shingle+minhash
    // expressions over the full batch text three times
    lazy val cleanBands = graft.functions.Iterate.checkpoint(
      Dedup.lshBandsDf(batchClean))
    val survivors =
      if (!hasIndex) batchClean
      else {
        val batchKeys = cleanBands.select(col("band_key")).distinct()
        val candIdFrame = spark.read.parquet(indexPath)
          .join(broadcast(batchKeys), Seq("band_key"))
          .select(col("doc_id")).distinct()
        val cap = candidateIdCap(spark)
        // One bounded job: ≤ cap+1 ids ever reach the driver. Empty →
        // skip the verify pipeline entirely (collision-free batch, the
        // common case once the corpus stabilizes).
        val capped = candIdFrame.limit(cap + 1).collect().map(_.getLong(0))
        if (capped.isEmpty) batchClean
        else {
          val candDocs =
            if (capped.length <= cap)
              spark.read.parquet(corpusPath)
                .filter(col("doc_id").isin(capped.toSeq: _*))
            else candidateDocs(spark, corpusPath, candIdFrame)
          val nearDups = CurationPipeline
            .probeLshIndex(spark, indexPath, candDocs, batchClean,
              Some(cleanBands))
            .select(col("new_doc").as("doc_id")).distinct()
          batchClean.join(nearDups, Seq("doc_id"), "left_anti")
        }
      }

    // 5. append survivors' rows, band keys, and content hashes; all
    // three side tables are current for the next micro-batch.
    val out = survivors.transform(graft.functions.PlanGuard.persist(_))
    val n = out.count()
    if (n > 0) {
      out.write.mode("append").parquet(corpusPath)
      // survivors ⊆ batchClean, so their band rows are a semi-join of
      // the already-banded frame — never a third banding pass
      cleanBands.join(out.select(col("doc_id")), Seq("doc_id"), "left_semi")
        .write.mode("append").parquet(indexPath)
      out.select(md5(col("text")).as("content_hash"))
        .write.mode("append").parquet(hashesPath(corpusPath))
    }
    out.unpersist()
    batchClean.unpersist()
    n
  }

  /** Wire [[ingestBatch]] behind a streaming documents source: each
    * micro-batch curates and appends (see replay note in the object
    * doc).
    */
  def start(spark: SparkSession, docs: DataFrame,
      corpusPath: String, indexPath: String): StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        ingestBatch(spark, batch, corpusPath, indexPath); ()
      }
      .start()
}
