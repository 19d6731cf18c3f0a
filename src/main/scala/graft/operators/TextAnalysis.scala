package graft.operators

import graft.{QueryDef, Tables}
import graft.functions.TextOps
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline (§2.E): token
  * counting, quality scoring, language ID, document fingerprinting. All
  * per-row Column expressions — narrow, codegen'd, shuffle-free; at 100 TB
  * these run at scan speed.
  */
object TextAnalysis {

  /** Token counting: whitespace tokens + a BPE-ish regex segmentation
    * (letter runs / digit runs / single punctuation) + char length.
    */
  def tokenCount(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        size(split(col("text"), "\\s+")).cast("bigint").as("ws_tokens"),
        regexp_count(col("text"), lit("[a-z]+|[0-9]+|[^a-z0-9 ]")).cast("bigint")
          .as("bpe_tokens"),
        length(col("text")).cast("bigint").as("n_chars"))

  val tokenCountOracle: String = """
    SELECT doc_id,
      CAST(LEN(STRING_SPLIT_REGEX(text, '\s+')) AS BIGINT) AS ws_tokens,
      CAST(LEN(REGEXP_EXTRACT_ALL(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS bpe_tokens,
      CAST(LENGTH(text) AS BIGINT) AS n_chars
    FROM documents"""

  /** Quality scoring: length, average word length, stopword ratio →
    * weighted score in [0,1]. Single deterministic double expression.
    */
  private val stopPattern = "\\b(the|a|of|and|to|in|is|it)\\b"

  def qualityScore(spark: SparkSession, dir: String): DataFrame = {
    val nWords = size(split(col("text"), "\\s+")).cast("double")
    val nStop = regexp_count(col("text"), lit(stopPattern)).cast("double")
    val avgLen = length(regexp_replace(col("text"), "\\s+", "")).cast("double") / nWords
    val stopRatio = nStop / nWords
    val score = lit(0.4) * least(nWords / lit(100.0), lit(1.0)) +
      lit(0.4) * (lit(1.0) - stopRatio) +
      lit(0.2) * least(avgLen / lit(8.0), lit(1.0))
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        nWords.as("n_words"),
        avgLen.as("avg_word_len"),
        stopRatio.as("stopword_ratio"),
        score.as("quality_score"))
  }

  val qualityScoreOracle: String = {
    val nWords = """CAST(LEN(STRING_SPLIT_REGEX(text, '\s+')) AS DOUBLE)"""
    // interpolated from stopPattern so query and oracle can't desync
    val nStop = s"CAST(LEN(REGEXP_EXTRACT_ALL(text, '$stopPattern')) AS DOUBLE)"
    val avgLen = s"""CAST(LENGTH(REGEXP_REPLACE(text, '\\s+', '', 'g')) AS DOUBLE) / $nWords"""
    s"""
    SELECT doc_id,
      $nWords AS n_words,
      $avgLen AS avg_word_len,
      $nStop / $nWords AS stopword_ratio,
      0.4 * LEAST($nWords / 100.0, 1.0)
        + 0.4 * (1.0 - $nStop / $nWords)
        + 0.2 * LEAST(($avgLen) / 8.0, 1.0) AS quality_score
    FROM documents"""
  }

  /** Language ID: stopword-marker hit counts per candidate language,
    * argmax with a fixed preference order on ties. The marker lists are
    * the classic n-gram-profile shortcut (Cavnar–Trenkle style) reduced
    * to portable regex counting.
    */
  private val markers: Seq[(String, String)] = Seq(
    "en" -> "\\b(the|a|of|and|is)\\b",
    "es" -> "\\b(el|la|de|que|y)\\b",
    "de" -> "\\b(der|die|und|das|ist)\\b",
    "fr" -> "\\b(le|la|et|les|des)\\b")

  def langId(spark: SparkSession, dir: String): DataFrame = {
    val hits: Seq[(String, Column)] = markers.map { case (l, p) =>
      l -> regexp_count(col("text"), lit(p)).cast("long")
    }
    val best = hits.foldLeft((lit("und"), lit(0L))) { case ((bl, bh), (l, h)) =>
      (when(h > bh, lit(l)).otherwise(bl), when(h > bh, h).otherwise(bh))
    }
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        col("lang").as("declared_lang"),
        best._1.as("predicted_lang"),
        best._2.as("marker_hits"))
  }

  val langIdOracle: String = {
    // Marker patterns pass through verbatim: DuckDB string literals do
    // not process backslash escapes, so '\b' reaches RE2 as-is.
    def h(p: String) = s"CAST(LEN(REGEXP_EXTRACT_ALL(text, '$p')) AS BIGINT)"
    val hs = markers.map { case (l, p) => l -> h(p) }
    // Fold ties exactly as the Scala side: strictly-greater replaces.
    val (langExpr, hitExpr) = hs.foldLeft(("'und'", "CAST(0 AS BIGINT)")) {
      case ((bl, bh), (l, hc)) =>
        (s"CASE WHEN $hc > $bh THEN '$l' ELSE $bl END",
          s"CASE WHEN $hc > $bh THEN $hc ELSE $bh END")
    }
    s"""
    SELECT doc_id, lang AS declared_lang,
      $langExpr AS predicted_lang,
      $hitExpr AS marker_hits
    FROM documents"""
  }

  /** Document fingerprinting: canonical md5 of whitespace-normalized
    * text + a rolling polynomial hash over portable word hashes (explicit
    * left fold — order-identical across engines).
    */
  def docFingerprint(spark: SparkSession, dir: String): DataFrame = {
    val canon = trim(regexp_replace(col("text"), "\\s+", " "))
    val hs = TextOps.hashes(TextOps.words(canon))
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        md5(canon).as("content_md5"),
        TextOps.rollingHash(hs).as("rolling_hash"))
  }

  val docFingerprintOracle: String = {
    val canon = """TRIM(REGEXP_REPLACE(text, '\s+', ' ', 'g'))"""
    val hs = TextOps.sqlHashes(s"STRING_SPLIT_REGEX($canon, '\\s+')")
    s"""
    SELECT doc_id,
      MD5($canon) AS content_md5,
      ${TextOps.sqlRollingHash(hs)} AS rolling_hash
    FROM documents"""
  }

  /** Corpus-wide n-gram frequency: top-20 word bigrams with counts —
    * explode is linear, the aggregation is map-side-combinable, top-k is
    * a total order with tiebreak.
    */
  def ngramFreq(spark: SparkSession, dir: String): DataFrame = {
    val bigrams = org.apache.spark.sql.GraftBridge.column(
      org.apache.spark.sql.graft.Bigrams(
        org.apache.spark.sql.GraftBridge.expression(col("text"))))
    Tables.documents(spark, dir)
      .select(explode(bigrams).as("bigram"))
      .groupBy(col("bigram"))
      .agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("bigram").asc)
      .limit(20)
  }

  val ngramFreqOracle: String = """
    SELECT bigram, COUNT(*) AS freq FROM (
      SELECT UNNEST(LIST_TRANSFORM(RANGE(1, GREATEST(LEN(w), 1)),
        i -> w[i] || ' ' || w[i+1])) AS bigram
      FROM (SELECT STRING_SPLIT_REGEX(text, '\s+') AS w FROM documents))
    GROUP BY 1
    ORDER BY freq DESC, bigram ASC LIMIT 20"""

  /** Within-document repetition score — the Gopher/C4-style repetition
    * filter: 1 − distinct bigrams / total bigrams. Boilerplate-heavy and
    * template-generated documents (the classic low-quality training-data
    * signature) score high. Per-row arithmetic only — scan speed at
    * scale; repetitive = score > 0.2 here.
    */
  def repetitionScore(spark: SparkSession, dir: String): DataFrame = {
    val bigrams = org.apache.spark.sql.GraftBridge.column(
      org.apache.spark.sql.graft.Bigrams(
        org.apache.spark.sql.GraftBridge.expression(col("text"))))
    Tables.documents(spark, dir)
      .select(col("doc_id"), bigrams.as("bg"))
      .select(
        col("doc_id"),
        size(col("bg")).cast("bigint").as("n_bigrams"),
        size(array_distinct(col("bg"))).cast("bigint").as("n_distinct"))
      .select(
        col("doc_id"), col("n_bigrams"), col("n_distinct"),
        when(col("n_bigrams") === 0, lit(0.0))
          .otherwise(lit(1.0) - col("n_distinct").cast("double")
            / col("n_bigrams").cast("double")).as("repetition"))
      .withColumn("is_repetitive", col("repetition") > 0.2)
  }

  val repetitionScoreOracle: String = """
    SELECT doc_id, n_bigrams, n_distinct,
      CASE WHEN n_bigrams = 0 THEN CAST(0 AS DOUBLE)
           ELSE 1.0 - CAST(n_distinct AS DOUBLE) / CAST(n_bigrams AS DOUBLE)
      END AS repetition,
      (CASE WHEN n_bigrams = 0 THEN CAST(0 AS DOUBLE)
            ELSE 1.0 - CAST(n_distinct AS DOUBLE) / CAST(n_bigrams AS DOUBLE)
       END) > 0.2 AS is_repetitive
    FROM (
      SELECT doc_id,
        CAST(LEN(bg) AS BIGINT) AS n_bigrams,
        CAST(LEN(LIST_DISTINCT(bg)) AS BIGINT) AS n_distinct
      FROM (
        SELECT doc_id,
          LIST_TRANSFORM(RANGE(1, GREATEST(LEN(w), 1)),
            i -> w[i] || ' ' || w[i+1]) AS bg
        FROM (SELECT doc_id, STRING_SPLIT_REGEX(text, '\s+') AS w
              FROM documents)))"""

  /** PII scrubbing — redact emails and URLs before training (the
    * compliance pass every corpus gets). The lake text is synthetic and
    * clean, so the operator first derives a PII-bearing column the way
    * a crawl would carry one (deterministic contact+link suffix), then
    * applies the redaction rules; the rules are the operator. Simple
    * character-class regexes keep Java and RE2 semantics aligned.
    */
  def piiScrub(spark: SparkSession, dir: String): DataFrame = {
    val dirty = concat(col("text"),
      lit(" contact: user"), col("doc_id").cast("string"),
      lit("@example.com via https://ex.io/p/"), col("doc_id").cast("string"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), dirty.as("dirty"))
      .select(
        col("doc_id"),
        regexp_replace(
          regexp_replace(col("dirty"),
            "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "[EMAIL]"),
          "https?://[^ ]+", "[URL]").as("scrubbed"))
  }

  val piiScrubOracle: String = """
    SELECT doc_id,
      REGEXP_REPLACE(
        REGEXP_REPLACE(
          text || ' contact: user' || CAST(doc_id AS VARCHAR)
               || '@example.com via https://ex.io/p/' || CAST(doc_id AS VARCHAR),
          '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
        'https?://[^ ]+', '[URL]', 'g') AS scrubbed
    FROM documents"""

  /** Fixed-window document chunking with overlap — the step that turns
    * documents into training/embedding units: 64-word windows every 48
    * words (16-word overlap), one output row per chunk. Explode is
    * linear in words; no shuffle.
    */
  def docChunk(spark: SparkSession, dir: String): DataFrame = {
    val w = split(col("text"), "\\s+")
    Tables.documents(spark, dir)
      .select(col("doc_id"), w.as("w"))
      .select(col("doc_id"), col("w"),
        explode(sequence(lit(0), size(col("w")) - 1, lit(48))).as("start"))
      .select(
        col("doc_id"),
        (col("start") / 48).cast("bigint").as("chunk_id"),
        array_join(slice(col("w"), col("start") + 1, lit(64)), " ").as("chunk_text"),
        size(slice(col("w"), col("start") + 1, lit(64))).cast("bigint").as("n_tokens"))
  }

  val docChunkOracle: String = """
    SELECT doc_id,
      CAST(start // 48 AS BIGINT) AS chunk_id,
      ARRAY_TO_STRING(w[start + 1 : start + 64], ' ') AS chunk_text,
      CAST(LEN(w[start + 1 : start + 64]) AS BIGINT) AS n_tokens
    FROM (
      SELECT doc_id, w, UNNEST(RANGE(0, LEN(w), 48)) AS start
      FROM (SELECT doc_id, STRING_SPLIT_REGEX(text, '\s+') AS w FROM documents))"""

  /** Stopword removal: filter stopword tokens (keeping duplicates and
    * order — unlike array_except, which dedups) and rejoin.
    */
  private val stopwords = Seq("the", "a", "of", "and", "to", "in", "is", "it")

  def stopwordFilter(spark: SparkSession, dir: String): DataFrame = {
    // One compiled pass (StopwordStats) instead of an interpreted
    // filter()/array_contains lambda per token; identical values — the
    // fold formulation is kept in ExpressionSpec as the reference.
    val st = org.apache.spark.sql.GraftBridge.column(
      org.apache.spark.sql.graft.StopwordStats(
        org.apache.spark.sql.GraftBridge.expression(col("text")), stopwords))
    Tables.documents(spark, dir)
      .select(col("doc_id"), st.as("s"))
      .select(
        col("doc_id"),
        col("s.n_tokens").as("n_tokens"),
        col("s.n_kept").as("n_kept"),
        col("s.text_filtered").as("text_filtered"))
  }

  /** Reference interpreted formulation of [[stopwordFilter]] — for
    * ExpressionSpec equivalence only.
    */
  def stopwordFilterFold(spark: SparkSession, dir: String): DataFrame = {
    val sw = array(stopwords.map(lit): _*)
    val w = split(col("text"), "\\s+")
    val kept = filter(w, t => !array_contains(sw, t))
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        size(w).cast("bigint").as("n_tokens"),
        size(kept).cast("bigint").as("n_kept"),
        array_join(kept, " ").as("text_filtered"))
  }

  val stopwordFilterOracle: String = {
    val list = stopwords.map(s => s"'$s'").mkString(", ")
    s"""
    WITH t AS (SELECT doc_id, STRING_SPLIT_REGEX(text, '\\s+') AS w FROM documents),
    f AS (SELECT doc_id, w, LIST_FILTER(w, x -> NOT LIST_CONTAINS([$list], x)) AS kept FROM t)
    SELECT doc_id,
      CAST(LEN(w) AS BIGINT) AS n_tokens,
      CAST(LEN(kept) AS BIGINT) AS n_kept,
      ARRAY_TO_STRING(kept, ' ') AS text_filtered
    FROM f"""
  }

  /** TF-IDF term weighting, linear-idf variant: score = tf · (N / df).
    * All inputs are exact integers (term counts, doc frequencies, corpus
    * size), so the single double division is engine-deterministic — the
    * log-idf variant is NOT portable (libm log differs in last bits
    * across engines). Top-5 terms per document with total-order tiebreak.
    */
  def tfidfTopTerms(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, dir)
    val terms = docs.select(col("doc_id"),
      explode(split(col("text"), "\\s+")).as("term"))
    val tf = terms.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term"))
      .agg(count(lit(1)).as("df"))
    val n = docs.select(countDistinct(col("doc_id")).as("n_docs"))
    val scored = tf.join(df, Seq("term"))
      .crossJoin(broadcast(n))
      .withColumn("tfidf",
        col("tf").cast("double") * (col("n_docs").cast("double") / col("df").cast("double")))
    // Per-doc top-5 rides the custom heap operator — the window form
    // SORTS every partition by (doc_id, score) over ALL doc×term rows;
    // the bounded heap is O(n log k) with no partition sort
    // (window_rank_native measures the heap plan ~2× the window plan).
    // The rank window then runs over ≤5 survivors per doc, already
    // clustered by doc_id — no further exchange.
    val top = Relational.topKPerKey(scored,
      keys = Seq(col("doc_id")),
      order = Seq(col("tfidf").desc, col("term").asc),
      k = 5)
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("tfidf").desc, col("term").asc)
    top.withColumn("rank", row_number().over(w))
      .select(col("doc_id"), col("term"), col("tf"), col("df"),
        col("tfidf"), col("rank"))
  }

  val tfidfTopTermsOracle: String = """
    WITH terms AS (
      SELECT doc_id, UNNEST(STRING_SPLIT_REGEX(text, '\s+')) AS term FROM documents),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM terms GROUP BY 1, 2),
    df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
    n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM documents)
    SELECT doc_id, term, tf, df, tfidf, rank FROM (
      SELECT tf.doc_id, tf.term,
        CAST(tf.tf AS BIGINT) AS tf, CAST(df.df AS BIGINT) AS df,
        CAST(tf.tf AS DOUBLE) * (CAST(n.n_docs AS DOUBLE) / CAST(df.df AS DOUBLE)) AS tfidf,
        ROW_NUMBER() OVER (PARTITION BY tf.doc_id
          ORDER BY CAST(tf.tf AS DOUBLE) * (CAST(n.n_docs AS DOUBLE) / CAST(df.df AS DOUBLE)) DESC,
            tf.term ASC) AS rank
      FROM tf JOIN df ON tf.term = df.term CROSS JOIN n)
    WHERE rank <= 5"""

  /** Gopher-style multi-rule quality filter — the per-document rule suite
    * crawl pipelines apply before training (word-count band, mean-word-
    * length band, symbol ratio, stopword presence, vocabulary diversity),
    * emitted as one flag PER RULE plus the conjunction, so curation can
    * report per-rule rejection rates — a single opaque score (the
    * quality_score operator) can't drive that report.
    *
    * All rule arithmetic is exact-integer comparisons or single IEEE
    * divisions of exact integers — engine-portable, hash-checkable.
    * Per-row, shuffle-free: scan speed at 100 TB.
    */
  def gopherRules(spark: SparkSession, dir: String): DataFrame =
    gopherRulesDf(Tables.documents(spark, dir))

  /** [[gopherRules]] over an arbitrary documents frame — the form the
    * curation pipeline applies to STAGED data.
    */
  def gopherRulesDf(documents: DataFrame): DataFrame = {
    val w = split(col("text"), "\\s+")
    val nWords = size(w).cast("bigint")
    val nDistinct = size(array_distinct(w)).cast("bigint")
    val nChars = length(col("text")).cast("bigint")
    // Case-insensitive classes: capitalized text must not count as
    // symbols, and sentence-initial stopwords must still match (the
    // other text ops keep lowercase classes because this corpus is
    // lowercase; a QUALITY gate has to be robust to real casing).
    val nAlnumSp = regexp_count(col("text"), lit("[a-zA-Z0-9 ]")).cast("bigint")
    val nStop = regexp_count(col("text"), lit("(?i)" + stopPattern)).cast("bigint")
    // mean word length ∈ [3, 10] ⟺ 3·n_words ≤ letter_chars ≤ 10·n_words
    val letterChars = length(regexp_replace(col("text"), "\\s+", "")).cast("bigint")
    val rWordCount = nWords.between(50, 10000)
    val rMeanWordLen =
      letterChars >= nWords * 3 && letterChars <= nWords * 10
    // symbol ratio < 10% ⟺ 10·symbols < chars (integer-exact)
    val rSymbolRatio = (nChars - nAlnumSp) * 10 < nChars
    val rStopwords = nStop >= 2
    // vocabulary diversity: 5·distinct > n_words (> 20% distinct)
    val rDiversity = nDistinct * 5 > nWords
    documents
      .select(
        col("doc_id"), nWords.as("n_words"),
        rWordCount.as("r_word_count"),
        rMeanWordLen.as("r_mean_word_len"),
        rSymbolRatio.as("r_symbol_ratio"),
        rStopwords.as("r_stopwords"),
        rDiversity.as("r_diversity"),
        (rWordCount && rMeanWordLen && rSymbolRatio && rStopwords && rDiversity)
          .as("pass"))
  }

  val gopherRulesOracle: String = {
    val nWords = """CAST(LEN(STRING_SPLIT_REGEX(text, '\s+')) AS BIGINT)"""
    val nDistinct = """CAST(LEN(LIST_DISTINCT(STRING_SPLIT_REGEX(text, '\s+'))) AS BIGINT)"""
    val nChars = "CAST(LENGTH(text) AS BIGINT)"
    val nAlnumSp = """CAST(LEN(REGEXP_EXTRACT_ALL(text, '[a-zA-Z0-9 ]')) AS BIGINT)"""
    // interpolated from stopPattern so query and oracle can't desync
    val nStop = s"CAST(LEN(REGEXP_EXTRACT_ALL(text, '(?i)$stopPattern')) AS BIGINT)"
    val letters = """CAST(LENGTH(REGEXP_REPLACE(text, '\s+', '', 'g')) AS BIGINT)"""
    val rWc = s"($nWords BETWEEN 50 AND 10000)"
    val rMwl = s"($letters >= $nWords * 3 AND $letters <= $nWords * 10)"
    val rSym = s"(($nChars - $nAlnumSp) * 10 < $nChars)"
    val rStop = s"($nStop >= 2)"
    val rDiv = s"($nDistinct * 5 > $nWords)"
    s"""
    SELECT doc_id, $nWords AS n_words,
      $rWc AS r_word_count,
      $rMwl AS r_mean_word_len,
      $rSym AS r_symbol_ratio,
      $rStop AS r_stopwords,
      $rDiv AS r_diversity,
      ($rWc AND $rMwl AND $rSym AND $rStop AND $rDiv) AS pass
    FROM documents"""
  }

  /** Corpus composition report per source — the summary every pipeline
    * run logs: document count, token volume, language mix, size profile.
    * One map-side-combinable aggregation.
    */
  def corpusStats(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("source"), col("lang"), col("n_chars"),
        size(split(col("text"), "\\s+")).cast("bigint").as("n_tokens"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        countDistinct(col("lang")).as("n_langs"),
        (sum(col("n_chars")).cast("double")
          / count(lit(1)).cast("double")).as("mean_chars"),
        min(col("n_chars")).as("min_chars"),
        max(col("n_chars")).as("max_chars"))

  val corpusStatsOracle: String = """
    SELECT source,
      COUNT(*) AS n_docs,
      CAST(SUM(LEN(STRING_SPLIT_REGEX(text, '\s+'))) AS BIGINT) AS total_tokens,
      COUNT(DISTINCT lang) AS n_langs,
      CAST(SUM(n_chars) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mean_chars,
      MIN(n_chars) AS min_chars,
      MAX(n_chars) AS max_chars
    FROM documents GROUP BY 1"""

  def defs: Map[String, QueryDef] = Map(
    "corpus_stats" -> QueryDef.sql(corpusStats, corpusStatsOracle),
    "tfidf_top_terms" -> QueryDef.sql(tfidfTopTerms, tfidfTopTermsOracle),
    "ngram_freq" -> QueryDef.sql(ngramFreq, ngramFreqOracle),
    "stopword_filter" -> QueryDef.sql(stopwordFilter, stopwordFilterOracle),
    "token_count" -> QueryDef.sql(tokenCount, tokenCountOracle),
    "quality_score" -> QueryDef.sql(qualityScore, qualityScoreOracle),
    "gopher_rules" -> QueryDef.sql(gopherRules, gopherRulesOracle),
    "lang_id" -> QueryDef.sql(langId, langIdOracle),
    "doc_fingerprint" -> QueryDef.sql(docFingerprint, docFingerprintOracle),
    "repetition_score" -> QueryDef.sql(repetitionScore, repetitionScoreOracle),
    "pii_scrub" -> QueryDef.sql(piiScrub, piiScrubOracle),
    "doc_chunk" -> QueryDef.sql(docChunk, docChunkOracle)
  )
}
