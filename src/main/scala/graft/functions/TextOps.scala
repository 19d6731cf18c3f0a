package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared text/hash building blocks for the dedup + text-analysis
  * operators. Everything here is engine-portable: hashes derive from md5
  * hex (identical in Spark and DuckDB) and folds are explicit left folds
  * (identical association order), so oracle SQL can mirror each construct
  * exactly. All constructs are Column expressions — whole-stage codegen,
  * no UDFs, no shuffle.
  */
object TextOps {

  /** Modulus for modular hashing: prime just above 2^24. */
  val HashP = 16777259L
  /** Rolling-hash base. */
  val RollB = 1000003L

  /** 12 fixed (a, b) affine permutation constants for MinHash. */
  val Perms: Seq[(Long, Long)] = Seq(
    (1000003L, 12345L), (999983L, 54321L), (876543L, 11111L), (765431L, 99999L),
    (654323L, 77777L), (543217L, 33333L), (432109L, 88888L), (321017L, 22222L),
    (234567L, 66666L), (198491L, 44444L), (162947L, 55555L), (131071L, 13579L))

  /** Portable 24-bit hash of a string: first 6 hex chars of md5, parsed
    * base-16. DuckDB mirror: `CAST('0x' || SUBSTR(MD5(x),1,6) AS BIGINT)`.
    */
  def hash24(c: Column): Column =
    conv(substring(md5(c), 1, 6), 16, 10).cast("long")

  /** Whitespace word array. DuckDB mirror: `STRING_SPLIT_REGEX(x, '\s+')`. */
  def words(c: Column): Column = split(c, "\\s+")

  /** Distinct 3-word shingles (1-based indexing to mirror DuckDB's
    * `LIST_TRANSFORM(RANGE(1, LEN(w)-1), i -> w[i]||' '||w[i+1]||' '||w[i+2])`).
    */
  def shingles3(w: Column): Column =
    array_distinct(
      when(size(w) >= lit(3),
        transform(sequence(lit(1), size(w) - 2), i =>
          concat_ws(" ", element_at(w, i), element_at(w, i + 1), element_at(w, i + 2))))
        .otherwise(array().cast("array<string>")))

  /** SQL mirror of [[shingles3]] given a word-list expression. */
  def sqlShingles3(w: String): String =
    s"LIST_DISTINCT(LIST_TRANSFORM(RANGE(1, GREATEST(LEN($w)-1, 1)), " +
      s"i -> $w[i] || ' ' || $w[i+1] || ' ' || $w[i+2]))"

  /** Per-element 24-bit hashes of an array of strings, via the native
    * one-pass [[org.apache.spark.sql.graft.Hash24Array]] (the interpreted
    * `transform` + md5-per-element lambda dominates dedup cost at scale).
    */
  def hashes(arr: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      org.apache.spark.sql.graft.Hash24Array(
        org.apache.spark.sql.GraftBridge.expression(arr)))

  /** Reference fold-based hashes (interpreted) — for equivalence specs. */
  def hashesFold(arr: Column): Column = transform(arr, hash24 _)

  /** Compiled sorted-merge common-element count over two sorted distinct
    * string arrays (exact array_intersect-count semantics).
    */
  def sortedCommonCount(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      org.apache.spark.sql.graft.SortedCommonCount(
        org.apache.spark.sql.GraftBridge.expression(a),
        org.apache.spark.sql.GraftBridge.expression(b)))

  /** Fused text → distinct 3-shingle 24-bit hash array, one compiled
    * pass (≡ hashes ∘ shingles3 ∘ words, element order immaterial).
    */
  def shingleHash24(text: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      org.apache.spark.sql.graft.ShingleHash24(
        org.apache.spark.sql.GraftBridge.expression(text)))

  /** Fused text → distinct 3-shingle 60-bit hash array, one compiled
    * pass — the element hashes behind the 64-bit SimHash fingerprint.
    */
  def shingleHash60(text: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      org.apache.spark.sql.graft.ShingleHash60(
        org.apache.spark.sql.GraftBridge.expression(text)))

  /** Fused text → sorted distinct 3-shingle array, one compiled pass
    * (≡ array_sort ∘ shingles3 ∘ words).
    */
  def sortedShingles3(text: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      org.apache.spark.sql.graft.SortedShingles3(
        org.apache.spark.sql.GraftBridge.expression(text)))

  def sqlHashes(arr: String): String =
    s"LIST_TRANSFORM($arr, x -> CAST('0x' || SUBSTR(MD5(x),1,6) AS BIGINT))"

  /** 60-bit element hashes (15 md5 hex chars — 16 would overflow the
    * positive signed range); mirrors [[shingleHash60]]'s hash.
    */
  def sqlHashes60(arr: String): String =
    s"LIST_TRANSFORM($arr, x -> CAST('0x' || SUBSTR(MD5(x),1,15) AS BIGINT))"

  /** One MinHash value: min over hashed elements of (a·h + b) mod P. */
  def minhash(hs: Column, a: Long, b: Long): Column =
    array_min(transform(hs, h => (h * lit(a) + lit(b)) % lit(HashP)))

  /** Full 12-permutation MinHash signature in ONE compiled pass (native
    * codegen expression; identical values to 12 [[minhash]] columns).
    */
  def minhashSig(hs: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      org.apache.spark.sql.graft.MinHashSig(org.apache.spark.sql.GraftBridge.expression(hs)))

  /** 16-bit SimHash over hashed elements (native codegen expression). */
  def simhash16(hs: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      org.apache.spark.sql.graft.SimHash16(org.apache.spark.sql.GraftBridge.expression(hs)))

  /** 64-bit SimHash over hashed elements (native codegen expression). */
  def simhash64(hs: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      org.apache.spark.sql.graft.SimHash64(org.apache.spark.sql.GraftBridge.expression(hs)))

  def sqlMinhash(hs: String, a: Long, b: Long): String =
    s"LIST_MIN(LIST_TRANSFORM($hs, h -> (h * $a + $b) % $HashP))"

  /** Jaccard similarity of two string arrays (distinct-element sets),
    * computed as |A∩B| / |A∪B| with exact integer cardinalities and one
    * deterministic double division.
    */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      size(array_distinct(concat(a, b))).cast("double")

  def sqlJaccard(a: String, b: String): String =
    s"CAST(LEN(LIST_INTERSECT($a, $b)) AS DOUBLE) / " +
      s"CAST(LEN(LIST_DISTINCT($a || $b)) AS DOUBLE)"

  /** Rolling polynomial hash over hashed elements: explicit left fold
    * h ← (h·B + x) mod P starting at 0. DuckDB mirror prepends the 0 seed
    * because LIST_REDUCE seeds from the first element.
    */
  def rollingHash(hs: Column): Column =
    aggregate(hs, lit(0L), (acc, x) => (acc * lit(RollB) + x) % lit(HashP))

  def sqlRollingHash(hs: String): String =
    s"LIST_REDUCE(LIST_PREPEND(CAST(0 AS BIGINT), $hs), " +
      s"(acc, x) -> (acc * $RollB + x) % $HashP)"
}
