package graft.operators

import graft.{QueryDef, Tables}
import graft.functions.TextOps
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication family for a training-data pipeline (§2.E): exact,
  * MinHash+LSH, SimHash, and n-gram Jaccard.
  *
  * Scale design: nothing here is O(n²). Exact dedup is a hash groupBy.
  * MinHash signatures are per-row Column folds (no explode of the corpus);
  * LSH banding emits 6 small (band, key) rows per doc and pairs are
  * generated only within buckets. n-gram Jaccard uses blocking (same
  * source + close length) so the candidate set stays linear-ish. SimHash
  * buckets by fingerprint prefix. At 100 TB the bucket joins shuffle only
  * (key, doc_id, signature) tuples — never the documents themselves.
  */
object Dedup {

  /** Exact dedup: group by content hash, keep the minimum doc_id as the
    * canonical representative (deterministic survivorship).
    */
  def dedupExact(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(md5(col("text")).as("content_hash"))
      .agg(
        min(col("doc_id")).as("keeper_doc_id"),
        count(lit(1)).as("n_copies"))

  val dedupExactOracle: String = """
    SELECT MD5(text) AS content_hash,
      MIN(doc_id) AS keeper_doc_id,
      COUNT(*) AS n_copies
    FROM documents GROUP BY 1"""

  /** Shingled document prep shared by the similarity dedups. */
  private def shingled(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(
        col("doc_id"), col("source"), col("n_chars"),
        TextOps.shingles3(TextOps.words(col("text"))).as("sh"))

  private val sqlShingled =
    s"""SELECT doc_id, source, n_chars,
      ${TextOps.sqlShingles3("STRING_SPLIT_REGEX(text, '\\s+')")} AS sh
    FROM documents"""

  /** n-gram (3-shingle) Jaccard near-dup pairs with blocking: candidates
    * share a source and have |Δn_chars| ≤ 32 (length blocking — a cheap
    * LSH on document size). Pairs at jaccard ≥ 0.5 are near-duplicates.
    */
  def ngramJaccard(spark: SparkSession, dir: String): DataFrame = {
    val s = shingled(spark, dir)
    val a = s.select(col("doc_id").as("doc_a"), col("source"),
      col("n_chars").as("ca"), col("sh").as("sha"))
    val b = s.select(col("doc_id").as("doc_b"), col("source"),
      col("n_chars").as("cb"), col("sh").as("shb"))
    a.join(b, Seq("source"))
      .filter(col("doc_a") < col("doc_b")
        && abs(col("ca") - col("cb")) <= 32)
      .select(col("doc_a"), col("doc_b"),
        TextOps.jaccard(col("sha"), col("shb")).as("jaccard"))
      .filter(col("jaccard") >= 0.5)
  }

  val ngramJaccardOracle: String = s"""
    WITH s AS ($sqlShingled)
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      ${TextOps.sqlJaccard("a.sh", "b.sh")} AS jaccard
    FROM s a JOIN s b
      ON a.source = b.source AND a.doc_id < b.doc_id
      AND ABS(a.n_chars - b.n_chars) <= 32
    WHERE ${TextOps.sqlJaccard("a.sh", "b.sh")} >= 0.5"""

  /** MinHash + LSH near-dup detection, the full pipeline:
    * 12 minhashes per doc (per-row fold, no corpus explode) → 6 bands of
    * r=2 → band-bucket self-join for candidates → exact Jaccard verify at
    * ≥ 0.5. Output: verified near-dup pairs found via LSH.
    */
  def dedupMinhashLsh(spark: SparkSession, dir: String): DataFrame = {
    val s = shingled(spark, dir)
      .withColumn("hs", TextOps.hashes(col("sh")))
    val withSig = TextOps.Perms.zipWithIndex.foldLeft(s) {
      case (df, ((a, b), i)) => df.withColumn(s"mh$i", TextOps.minhash(col("hs"), a, b))
    }
    // Buckets carry only (doc_id, band_key): the candidate join shuffles
    // ids, never shingle payloads. Shingles are re-joined only for the
    // (small) verified candidate set.
    val bands = withSig.select(
      col("doc_id"),
      explode(array((0 until 6).map(bnd =>
        concat_ws(":", lit(bnd.toString),
          col(s"mh${2 * bnd}").cast("string"),
          col(s"mh${2 * bnd + 1}").cast("string"))): _*))
        .as("band_key"))
    val cand = bands.as("a")
      .join(bands.as("b"), col("a.band_key") === col("b.band_key")
        && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    val docs = shingled(spark, dir).select(col("doc_id"), col("sh"))
    cand
      .join(docs.select(col("doc_id").as("doc_a"), col("sh").as("sha")), Seq("doc_a"))
      .join(docs.select(col("doc_id").as("doc_b"), col("sh").as("shb")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        TextOps.jaccard(col("sha"), col("shb")).as("jaccard"))
      .filter(col("jaccard") >= 0.5)
  }

  val dedupMinhashLshOracle: String = {
    val sigCols = TextOps.Perms.zipWithIndex.map { case ((a, b), i) =>
      s"${TextOps.sqlMinhash("hs", a, b)} AS mh$i"
    }.mkString(",\n        ")
    val bandKeys = (0 until 6).map(bnd =>
      s"CONCAT($bnd, ':', mh${2 * bnd}, ':', mh${2 * bnd + 1})").mkString(", ")
    s"""
    WITH s AS ($sqlShingled),
    sig AS (
      SELECT doc_id, sh,
        $sigCols
      FROM (SELECT doc_id, sh, ${TextOps.sqlHashes("sh")} AS hs FROM s)),
    bands AS (
      SELECT doc_id, UNNEST([$bandKeys]) AS band_key FROM sig),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band_key = b.band_key AND a.doc_id < b.doc_id)
    SELECT doc_a, doc_b, ${TextOps.sqlJaccard("sa.sh", "sb.sh")} AS jaccard
    FROM cand
    JOIN s sa ON sa.doc_id = doc_a
    JOIN s sb ON sb.doc_id = doc_b
    WHERE ${TextOps.sqlJaccard("sa.sh", "sb.sh")} >= 0.5"""
  }

  /** SimHash near-dup detection (rows-only oracle: the 64-bit bitwise
    * pipeline is not reasonably SQL-portable). 16-bit SimHash from
    * per-shingle hashes: each bit is the sign of Σ±1 over shingles; docs
    * bucket by the top byte, pairs verified by Hamming distance ≤ 3.
    */
  def dedupSimhash(spark: SparkSession, dir: String): DataFrame = {
    val s = shingled(spark, dir).withColumn("hs", TextOps.hashes(col("sh")))
    val simhash = (0 until 16).map { j =>
      val bitSum = aggregate(col("hs"), lit(0L),
        (acc, h) => acc + when(shiftright(h, j) % 2 === 1, 1L).otherwise(-1L))
      when(bitSum > 0, lit(1L) * lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
    val withFp = s.select(col("doc_id"), simhash.as("simhash"))
      .withColumn("bucket", shiftright(col("simhash"), 8))
    val a = withFp.select(col("doc_id").as("doc_a"),
      col("simhash").as("fa"), col("bucket"))
    val b = withFp.select(col("doc_id").as("doc_b"),
      col("simhash").as("fb"), col("bucket"))
    a.join(b, Seq("bucket"))
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("hamming", bit_count(expr("fa ^ fb")))
      .filter(col("hamming") <= 3)
      .select(col("doc_a"), col("doc_b"), col("fa").as("simhash_a"),
        col("fb").as("simhash_b"), col("hamming"))
  }

  def defs: Map[String, QueryDef] = Map(
    "dedup_exact" -> QueryDef.sql(dedupExact, dedupExactOracle),
    "ngram_jaccard" -> QueryDef.sql(ngramJaccard, ngramJaccardOracle),
    "dedup_minhash_lsh" -> QueryDef.sql(dedupMinhashLsh, dedupMinhashLshOracle),
    "dedup_simhash" -> QueryDef.rowsOnly(dedupSimhash)
  )
}
