package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-13 corpus-quality statistics — the lexical-health panel a
  * training-data curator reads next to quality_score/gopher_rules:
  * type-token diversity, trigram hapax mass, and rare-n-gram
  * (memorization-tail) mass. All three are one- or two-shuffle count
  * aggregates (map-side combinable, BIGINT-exact ratios in ppm) —
  * scan-speed at 100 TB — plus a PII inventory that REPORTS what
  * pii_scrub would redact (counts per class per source; the governance
  * evidence that decides whether scrubbing is even needed).
  */
object CorpusExt {

  /** Type-token ratio per source — lexical diversity, the cheap
    * gibberish/boilerplate tell (template floods have low TTR; random
    * noise has TTR ≈ 1). Per-doc TTR is exact ppm over the whitespace
    * words; the source row reports the token-weighted corpus form
    * (Σ distinct ÷ Σ tokens, immune to doc-length mix) AND the mean of
    * per-doc ratios (the form quality gates threshold on). One scan,
    * one narrow aggregate.
    */
  def ttrDiversity(spark: SparkSession, dir: String): DataFrame = {
    val w = split(col("text"), "\\s+")
    Tables.documents(spark, dir)
      .select(col("source"),
        size(w).cast("bigint").as("toks"),
        size(array_distinct(w)).cast("bigint").as("types"))
      .withColumn("ttr_ppm", expr("(types * 1000000) div toks"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("toks")).as("tokens"),
        sum(col("types")).as("type_occurrences"),
        sum(col("ttr_ppm")).as("ttr_sum"))
      .select(col("source"), col("n_docs"), col("tokens"),
        expr("(type_occurrences * 1000000) div tokens")
          .as("weighted_ttr_ppm"),
        expr("ttr_sum div n_docs").as("mean_doc_ttr_ppm"))
  }

  val ttrDiversityOracle: String = """
    WITH d AS (
      SELECT source,
        CAST(LEN(STRING_SPLIT_REGEX(text, '\s+')) AS BIGINT) AS toks,
        CAST(LEN(LIST_DISTINCT(STRING_SPLIT_REGEX(text, '\s+'))) AS BIGINT)
          AS types
      FROM documents),
    p AS (SELECT source, toks, types,
        (types * 1000000) // toks AS ttr_ppm FROM d)
    SELECT source, COUNT(*) AS n_docs, CAST(SUM(toks) AS BIGINT) AS tokens,
      (CAST(SUM(types) AS BIGINT) * 1000000) // CAST(SUM(toks) AS BIGINT)
        AS weighted_ttr_ppm,
      CAST(SUM(ttr_ppm) AS BIGINT) // COUNT(*) AS mean_doc_ttr_ppm
    FROM p GROUP BY source"""

  /** Non-distinct 3-word shingles of a whitespace word array — the
    * occurrence stream (shingles3 is the distinct TYPE set; tail-mass
    * statistics need every occurrence). `w` MUST be a materialized
    * attribute, never an inline split(...) expression: the lambda body
    * references it, and an inlined defining expression re-evaluates
    * per shingle (the r12 chunker trap — see
    * engine-portability-traps / Dedup.contentChunks).
    */
  private def triOccurrences(w: Column): Column =
    when(size(w) >= 3,
      transform(sequence(lit(1), size(w) - 2), i =>
        concat_ws(" ", element_at(w, i), element_at(w, i + 1),
          element_at(w, i + 2))))
      .otherwise(array().cast("array<string>"))

  private val SqlTriOccurrences: String =
    "CASE WHEN LEN(w) >= 3 THEN LIST_TRANSFORM(RANGE(1, LEN(w) - 1), " +
      "i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) ELSE [] END"

  /** Hapax share per source over TRIGRAM shingles — the content-tail
    * audit: a high hapax share of the shingle mass means heavy-tailed
    * novel phrasing; a low one means templated text. The unit is the
    * 3-word shingle (the dedup/novelty unit), NOT single words — this
    * synthetic corpus has a closed 31-word vocabulary with zero word
    * hapax at every SF, so a word-level version would be the
    * constant-zero operator the repo's non-vacuity rule rejects.
    * One (source, shingle)-keyed aggregate; map-side combinable.
    */
  def hapaxRatio(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("source"), split(col("text"), "\\s+").as("w"))
      .select(col("source"), explode(triOccurrences(col("w"))).as("t"))
      .groupBy(col("source"), col("t"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("vocab"),
        sum(when(col("cnt") === 1, 1L).otherwise(0L)).as("hapax"),
        sum(col("cnt")).as("occurrences"))
      .select(col("source"), col("vocab"), col("hapax"), col("occurrences"),
        expr("(hapax * 1000000) div vocab").as("hapax_vocab_ppm"),
        expr("(hapax * 1000000) div occurrences").as("hapax_mass_ppm"))

  val hapaxRatioOracle: String = s"""
    WITH d AS (
      SELECT source, STRING_SPLIT_REGEX(text, '\\s+') AS w FROM documents),
    s AS (
      SELECT source, UNNEST($SqlTriOccurrences) AS t FROM d),
    c AS (SELECT source, t, COUNT(*) AS cnt FROM s GROUP BY 1, 2)
    SELECT source, COUNT(*) AS vocab,
      CAST(SUM(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax,
      CAST(SUM(cnt) AS BIGINT) AS occurrences,
      (CAST(SUM(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT) * 1000000)
        // COUNT(*) AS hapax_vocab_ppm,
      (CAST(SUM(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT) * 1000000)
        // CAST(SUM(cnt) AS BIGINT) AS hapax_mass_ppm
    FROM c GROUP BY source"""

  /** Minimum corpus frequency for a shingle to count as common. */
  private val RareMinFreq = 5

  /** Rare-n-gram mass per source — the memorization-risk tail: the
    * share of a source's trigram occurrences whose CORPUS frequency is
    * below 5. High rare mass means content the model can only learn by
    * memorizing (and that near-dup passes cannot protect); low rare
    * mass means the source is covered by common phrasing. The trigram
    * is the unit for the same non-vacuity reason as [[hapaxRatio]].
    * Two shingle-keyed aggregates (global counts checkpointed once —
    * corpus state, not per-source work) and one shingle-keyed join;
    * all counts map-side combinable.
    */
  def rareNgramMass(spark: SparkSession, dir: String): DataFrame = {
    val tris = Tables.documents(spark, dir)
      .select(col("source"), split(col("text"), "\\s+").as("w"))
      .select(col("source"), explode(triOccurrences(col("w"))).as("t"))
    val global = graft.functions.Iterate.checkpoint(
      tris.groupBy(col("t")).agg(count(lit(1)).as("gcnt")),
      Some("corpus shingle counts, read per source afterwards"))
    tris.groupBy(col("source"), col("t"))
      .agg(count(lit(1)).as("cnt"))
      .join(global, Seq("t"))
      .groupBy(col("source"))
      .agg(
        sum(col("cnt")).as("occurrences"),
        sum(when(col("gcnt") < RareMinFreq, col("cnt")).otherwise(0L))
          .as("rare_occurrences"),
        countDistinct(when(col("gcnt") < RareMinFreq, col("t")))
          .as("rare_types"))
      .select(col("source"), col("occurrences"), col("rare_occurrences"),
        col("rare_types"),
        expr("(rare_occurrences * 1000000) div occurrences")
          .as("rare_mass_ppm"))
  }

  val rareNgramMassOracle: String = s"""
    WITH d AS (
      SELECT source, STRING_SPLIT_REGEX(text, '\\s+') AS w FROM documents),
    s AS (
      SELECT source, UNNEST($SqlTriOccurrences) AS t FROM d),
    g AS (SELECT t, COUNT(*) AS gcnt FROM s GROUP BY 1),
    c AS (SELECT source, t, COUNT(*) AS cnt FROM s GROUP BY 1, 2)
    SELECT c.source, CAST(SUM(c.cnt) AS BIGINT) AS occurrences,
      CAST(SUM(CASE WHEN g.gcnt < $RareMinFreq THEN c.cnt ELSE 0 END)
        AS BIGINT) AS rare_occurrences,
      CAST(COUNT(DISTINCT CASE WHEN g.gcnt < $RareMinFreq THEN c.t END)
        AS BIGINT) AS rare_types,
      (CAST(SUM(CASE WHEN g.gcnt < $RareMinFreq THEN c.cnt ELSE 0 END)
        AS BIGINT) * 1000000) // CAST(SUM(c.cnt) AS BIGINT) AS rare_mass_ppm
    FROM c JOIN g ON c.t = g.t
    GROUP BY c.source"""

  /** PII inventory per source — the REPORT side of pii_scrub (scrub
    * redacts; this counts what WOULD be redacted, per class, which is
    * the governance table that decides whether a source needs the scrub
    * pass at all). The corpus is synthetic, so PII is INJECTED
    * deterministically (pii_scrub's email/URL on every doc, a phone on
    * doc_id % 3 = 0, an IPv4 on doc_id % 5 = 0, and — the r15 directive
    * 8 extension — [[PiiShapes]]' VALIDATED classes: Luhn-checked card
    * numbers on % 7 = 0 with checksum-broken decoys on % 11 = 0, and
    * structurally valid national-ID shapes on % 13 = 0 with rule-
    * breaking decoys on % 17 = 0) and then detected with the production
    * logic — the detectors are what is under test, and the `*_rejected`
    * columns prove the validators actually reject (a decoy surfacing in
    * a valid count is a detector bug this table would show at any SF).
    * Counts are per-row regexp/HOF folds: scan speed, one tiny
    * source-keyed aggregate.
    */
  def piiInventory(spark: SparkSession, dir: String): DataFrame = {
    val dirty = concat(col("text"),
      lit(" contact: user"), col("doc_id").cast("string"),
      lit("@example.com via https://ex.io/p/"), col("doc_id").cast("string"),
      when(col("doc_id") % 3 === 0,
        concat(lit(" tel: +1-555-"),
          lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
        .otherwise(lit("")),
      when(col("doc_id") % 5 === 0,
        concat(lit(" ip: 192.168."), (col("doc_id") % 256).cast("string"),
          lit("."), (col("doc_id") % 100).cast("string")))
        .otherwise(lit("")),
      PiiShapes.injection(col("doc_id")))
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), dirty.as("dirty"))
      .select(col("source"),
        regexp_count(col("dirty"),
          lit("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"))
          .cast("bigint").as("emails"),
        regexp_count(col("dirty"), lit("https?://[^ ]+"))
          .cast("bigint").as("urls"),
        regexp_count(col("dirty"), lit("\\+[0-9]{1,3}-[0-9]{3}-[0-9]{4}"))
          .cast("bigint").as("phones"),
        regexp_count(col("dirty"),
          lit("\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b"))
          .cast("bigint").as("ips"),
        size(PiiShapes.validCards(col("dirty"))).cast("bigint").as("cards"),
        (size(PiiShapes.cardShapes(col("dirty")))
          - size(PiiShapes.validCards(col("dirty")))).cast("bigint")
          .as("cards_rejected"),
        size(PiiShapes.validNids(col("dirty"))).cast("bigint").as("nids"),
        (size(PiiShapes.nidShapes(col("dirty")))
          - size(PiiShapes.validNids(col("dirty")))).cast("bigint")
          .as("nids_rejected"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("emails")).as("emails"), sum(col("urls")).as("urls"),
        sum(col("phones")).as("phones"), sum(col("ips")).as("ips"),
        sum(col("cards")).as("cards"),
        sum(col("cards_rejected")).as("cards_rejected"),
        sum(col("nids")).as("nids"),
        sum(col("nids_rejected")).as("nids_rejected"))
      .withColumn("pii_per_doc_ppm",
        expr("((emails + urls + phones + ips + cards + nids) * 1000000)"
          + " div n_docs"))
  }

  val piiInventoryOracle: String = s"""
    WITH d AS (
      SELECT source,
        text || ' contact: user' || CAST(doc_id AS VARCHAR)
          || '@example.com via https://ex.io/p/' || CAST(doc_id AS VARCHAR)
          || (CASE WHEN doc_id % 3 = 0
              THEN ' tel: +1-555-'
                || LPAD(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
              ELSE '' END)
          || (CASE WHEN doc_id % 5 = 0
              THEN ' ip: 192.168.' || CAST(doc_id % 256 AS VARCHAR)
                || '.' || CAST(doc_id % 100 AS VARCHAR)
              ELSE '' END)
          || ${PiiShapes.SqlInjection} AS dirty
      FROM documents),
    c AS (
      SELECT source,
        CAST(LEN(REGEXP_EXTRACT_ALL(dirty,
          '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS BIGINT)
          AS emails,
        CAST(LEN(REGEXP_EXTRACT_ALL(dirty, 'https?://[^ ]+')) AS BIGINT)
          AS urls,
        CAST(LEN(REGEXP_EXTRACT_ALL(dirty,
          '\\+[0-9]{1,3}-[0-9]{3}-[0-9]{4}')) AS BIGINT) AS phones,
        CAST(LEN(REGEXP_EXTRACT_ALL(dirty,
          '\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b')) AS BIGINT) AS ips,
        CAST(LEN(LIST_FILTER(REGEXP_EXTRACT_ALL(dirty,
          '${PiiShapes.SqlCardPattern}'),
          cc -> ${PiiShapes.sqlLuhnValid("cc", "ii")})) AS BIGINT) AS cards,
        CAST(LEN(REGEXP_EXTRACT_ALL(dirty, '${PiiShapes.SqlCardPattern}'))
          - LEN(LIST_FILTER(REGEXP_EXTRACT_ALL(dirty,
            '${PiiShapes.SqlCardPattern}'),
            cr -> ${PiiShapes.sqlLuhnValid("cr", "ir")})) AS BIGINT)
          AS cards_rejected,
        CAST(LEN(LIST_FILTER(REGEXP_EXTRACT_ALL(dirty,
          '${PiiShapes.SqlNidPattern}'),
          nn -> ${PiiShapes.sqlNidValid("nn")})) AS BIGINT) AS nids,
        CAST(LEN(REGEXP_EXTRACT_ALL(dirty, '${PiiShapes.SqlNidPattern}'))
          - LEN(LIST_FILTER(REGEXP_EXTRACT_ALL(dirty,
            '${PiiShapes.SqlNidPattern}'),
            nr -> ${PiiShapes.sqlNidValid("nr")})) AS BIGINT)
          AS nids_rejected
      FROM d)
    SELECT source, COUNT(*) AS n_docs,
      CAST(SUM(emails) AS BIGINT) AS emails,
      CAST(SUM(urls) AS BIGINT) AS urls,
      CAST(SUM(phones) AS BIGINT) AS phones,
      CAST(SUM(ips) AS BIGINT) AS ips,
      CAST(SUM(cards) AS BIGINT) AS cards,
      CAST(SUM(cards_rejected) AS BIGINT) AS cards_rejected,
      CAST(SUM(nids) AS BIGINT) AS nids,
      CAST(SUM(nids_rejected) AS BIGINT) AS nids_rejected,
      ((CAST(SUM(emails) AS BIGINT) + CAST(SUM(urls) AS BIGINT)
        + CAST(SUM(phones) AS BIGINT) + CAST(SUM(ips) AS BIGINT)
        + CAST(SUM(cards) AS BIGINT) + CAST(SUM(nids) AS BIGINT)) * 1000000)
        // COUNT(*) AS pii_per_doc_ppm
    FROM c GROUP BY source"""

  /** Simpson diversity per source — the collision-probability view of
    * lexical concentration (the chance two random tokens are the SAME
    * word), exactly computable where entropy would need libm: D =
    * Σ nᵢ(nᵢ−1) ÷ N(N−1) in exact BIGINT ppm, diversity = 1 − D.
    * Complements [[ttrDiversity]]: TTR counts the type inventory,
    * Simpson weighs its usage balance (a source can have all 31 types
    * and still hammer one of them). One word-keyed aggregate.
    *
    * Overflow headroom: Σn(n−1) grows as ≈T²/31 on the closed 31-word
    * vocab, so a BIGINT fold would wrap silently (Spark) while DuckDB
    * promotes to HUGEINT — a cross-engine divergence the small-SF
    * oracle cannot see — once a source holds ~1.7e7 tokens (~10× the
    * sf0.1 bench). The collision sum and the N(N−1) denominator are
    * therefore folded in DECIMAL(38,0) (like jarqueBera's moment sums),
    * good to T ≈ 1e16 tokens per source; `div` collapses the ratio
    * back to the BIGINT ppm the output schema declares.
    */
  def simpsonDiversity(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("source"), explode(split(col("text"), "\\s+")).as("word"))
      .groupBy(col("source"), col("word"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_types"),
        sum(col("n")).as("tokens"),
        sum((col("n") * (col("n") - 1)).cast("decimal(38,0)")).as("coll"))
      .select(col("source"), col("n_types"), col("tokens"),
        expr("(coll * 1000000) div "
          + "(CAST(tokens AS DECIMAL(38,0)) * (tokens - 1))")
          .as("simpson_ppm"))
      .withColumn("diversity_ppm", lit(1000000L) - col("simpson_ppm"))

  val simpsonDiversityOracle: String = """
    WITH w AS (
      SELECT source, UNNEST(STRING_SPLIT_REGEX(text, '\s+')) AS word
      FROM documents),
    c AS (SELECT source, word, COUNT(*) AS n FROM w GROUP BY 1, 2),
    s AS (
      SELECT source, COUNT(*) AS n_types, CAST(SUM(n) AS BIGINT) AS tokens,
        CAST(SUM(n * (n - 1)) AS HUGEINT) AS coll
      FROM c GROUP BY 1)
    SELECT source, n_types, tokens,
      CAST((coll * 1000000)
        // (CAST(tokens AS HUGEINT) * (tokens - 1)) AS BIGINT)
        AS simpson_ppm,
      CAST(1000000 - (coll * 1000000)
        // (CAST(tokens AS HUGEINT) * (tokens - 1)) AS BIGINT)
        AS diversity_ppm
    FROM s"""

  /** Skip-gram co-occurrence pairs (window ±2) — the word2vec-style
    * training-pair generator, run as a corpus statistic: unordered
    * word pairs within two positions, global counts, top-20 with a
    * total order (count desc, pair asc). Distance-2 pairs are what
    * separate this from collocations_dice's adjacent bigrams — the
    * context window is the embedding-training unit. Pair space is
    * bounded by vocab² so the aggregate is tiny; the explode is linear
    * in corpus length. The word array materializes as its own
    * projection before the pair lambdas (the inlining trap rule).
    */
  def skipgramPairs(spark: SparkSession, dir: String): DataFrame = {
    def pairsAt(d: Int): Column =
      when(size(col("w")) >= d + 1,
        transform(sequence(lit(1), size(col("w")) - d), i =>
          concat_ws(" ",
            least(element_at(col("w"), i), element_at(col("w"), i + d)),
            greatest(element_at(col("w"), i), element_at(col("w"), i + d)))))
        .otherwise(array().cast("array<string>"))
    Tables.documents(spark, dir)
      .select(split(col("text"), "\\s+").as("w"))
      .select(explode(concat(pairsAt(1), pairsAt(2))).as("pair"))
      .groupBy(col("pair"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("pair").asc)
      .limit(20)
  }

  val skipgramPairsOracle: String = """
    WITH d AS (
      SELECT STRING_SPLIT_REGEX(text, '\s+') AS w FROM documents),
    p AS (
      SELECT UNNEST(
        (CASE WHEN LEN(w) >= 2 THEN LIST_TRANSFORM(RANGE(1, LEN(w)),
          i -> LEAST(w[i], w[i+1]) || ' ' || GREATEST(w[i], w[i+1]))
          ELSE [] END)
        || (CASE WHEN LEN(w) >= 3 THEN LIST_TRANSFORM(RANGE(1, LEN(w) - 1),
          i -> LEAST(w[i], w[i+2]) || ' ' || GREATEST(w[i], w[i+2]))
          ELSE [] END)) AS pair
      FROM d)
    SELECT pair, COUNT(*) AS cnt FROM p
    GROUP BY pair ORDER BY cnt DESC, pair ASC LIMIT 20"""

  /** URL-level canonical dedup — the crawl-curation stage between exact
    * and near dedup (RefinedWeb/CCNet curate BY URL before touching
    * content: the same target fetched as http vs https, mixed-case
    * host, tracking query, fragment, or trailing slash is ONE
    * document). The corpus is synthetic, so URLs are INJECTED
    * deterministically in six orthogonal raw variants (scheme by
    * doc_id%2, host case by %3, trailing slash by %4, utm query by %2,
    * fragment by %7, path = doc_id%50) and then canonicalized with the
    * production rule chain — the canonicalizer is what is under test:
    * strip fragment, strip utm-tracking query, strip scheme, lowercase
    * the HOST ONLY (paths are case-significant per RFC 3986; the
    * host-vs-path split is string surgery on the first '/'), strip
    * trailing slashes. Per canonical target: doc count, distinct raw
    * forms collapsed, and the smallest doc id as the kept
    * representative (dedup_exact's keep-first rule). Top-20 by doc
    * count (canonical asc on ties — total order).
    *
    * Scale: extraction + canonicalization are per-row regex/codegen —
    * scan speed; the aggregate is keyed by canonical URL (cardinality ≈
    * distinct targets, far below corpus rows), one shuffle.
    */
  def urlCanonicalDedup(spark: SparkSession, dir: String): DataFrame = {
    val injected = concat(col("text"), lit(" see "),
      when(col("doc_id") % 2 === 0, lit("https")).otherwise(lit("http")),
      lit("://"),
      when(col("doc_id") % 3 === 0, lit("Ex.IO")).otherwise(lit("ex.io")),
      lit("/p/"), (col("doc_id") % 50).cast("string"),
      when(col("doc_id") % 4 === 0, lit("/")).otherwise(lit("")),
      when(col("doc_id") % 2 === 0,
        concat(lit("?utm_source=s"), (col("doc_id") % 5).cast("string")))
        .otherwise(lit("")),
      when(col("doc_id") % 7 === 0, lit("#sec")).otherwise(lit("")))
    Tables.documents(spark, dir)
      .select(col("doc_id"), injected.as("dirty"))
      .select(col("doc_id"),
        regexp_extract(col("dirty"), "https?://[^ ]+", 0).as("url"))
      .withColumn("no_scheme",
        regexp_replace(regexp_replace(regexp_replace(col("url"),
          "#.*$", ""), "\\?utm_.*$", ""), "^https?://", ""))
      .withColumn("host0", substring_index(col("no_scheme"), "/", 1))
      .withColumn("canon", regexp_replace(
        concat(lower(col("host0")),
          expr("substr(no_scheme, length(host0) + 1)")), "/+$", ""))
      .groupBy(col("canon").as("canonical_url"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("url")).as("n_raw_forms"),
        min(col("doc_id")).as("keep_doc_id"))
      .orderBy(col("n_docs").desc, col("canonical_url").asc)
      .limit(20)
  }

  val urlCanonicalDedupOracle: String = """
    WITH d AS (
      SELECT doc_id,
        text || ' see '
          || (CASE WHEN doc_id % 2 = 0 THEN 'https' ELSE 'http' END)
          || '://'
          || (CASE WHEN doc_id % 3 = 0 THEN 'Ex.IO' ELSE 'ex.io' END)
          || '/p/' || CAST(doc_id % 50 AS VARCHAR)
          || (CASE WHEN doc_id % 4 = 0 THEN '/' ELSE '' END)
          || (CASE WHEN doc_id % 2 = 0
              THEN '?utm_source=s' || CAST(doc_id % 5 AS VARCHAR)
              ELSE '' END)
          || (CASE WHEN doc_id % 7 = 0 THEN '#sec' ELSE '' END) AS dirty
      FROM documents),
    u AS (
      SELECT doc_id, REGEXP_EXTRACT(dirty, 'https?://[^ ]+') AS url
      FROM d),
    n AS (
      SELECT doc_id, url,
        REGEXP_REPLACE(REGEXP_REPLACE(REGEXP_REPLACE(url,
          '#.*$', ''), '\?utm_.*$', ''), '^https?://', '') AS no_scheme
      FROM u),
    c AS (
      SELECT doc_id, url,
        REGEXP_REPLACE(
          LOWER(SPLIT_PART(no_scheme, '/', 1))
            || SUBSTR(no_scheme, LEN(SPLIT_PART(no_scheme, '/', 1)) + 1),
          '/+$', '') AS canonical_url
      FROM n)
    SELECT canonical_url,
      COUNT(*) AS n_docs,
      CAST(COUNT(DISTINCT url) AS BIGINT) AS n_raw_forms,
      CAST(MIN(doc_id) AS BIGINT) AS keep_doc_id
    FROM c GROUP BY 1
    ORDER BY n_docs DESC, canonical_url ASC LIMIT 20"""

  def defs: Map[String, QueryDef] = Map(
    "url_canonical_dedup" ->
      QueryDef.sql(urlCanonicalDedup, urlCanonicalDedupOracle),
    "simpson_diversity" ->
      QueryDef.sql(simpsonDiversity, simpsonDiversityOracle),
    "skipgram_pairs" -> QueryDef.sql(skipgramPairs, skipgramPairsOracle),
    "ttr_diversity" -> QueryDef.sql(ttrDiversity, ttrDiversityOracle),
    "hapax_ratio" -> QueryDef.sql(hapaxRatio, hapaxRatioOracle),
    "rare_ngram_mass" -> QueryDef.sql(rareNgramMass, rareNgramMassOracle),
    "pii_inventory" -> QueryDef.sql(piiInventory, piiInventoryOracle)
  )
}
