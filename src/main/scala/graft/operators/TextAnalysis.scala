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

  /** THE token rule (BPE-ish segmentation: letter runs / digit runs /
    * single punctuation) — the one unit every budget-shaped operator
    * counts in (token_count, tokenizer_fertility, token_budget_plan,
    * mix_quality_frontier), so their tokens/target_tokens columns
    * reconcile. Identical regex class in both engines.
    */
  val BpeTokenRegex = "[a-z]+|[0-9]+|[^a-z0-9 ]"

  /** [[BpeTokenRegex]] token count of a text column, as BIGINT. */
  def bpeTokens(text: Column): Column =
    regexp_count(text, lit(BpeTokenRegex)).cast("bigint")

  /** SQL mirror of [[bpeTokens]]. */
  def sqlBpeTokens(text: String): String =
    s"CAST(LEN(REGEXP_EXTRACT_ALL($text, '$BpeTokenRegex')) AS BIGINT)"

  /** Token counting: whitespace tokens + a BPE-ish regex segmentation
    * (letter runs / digit runs / single punctuation) + char length.
    */
  def tokenCount(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        size(split(col("text"), "\\s+")).cast("bigint").as("ws_tokens"),
        bpeTokens(col("text")).as("bpe_tokens"),
        length(col("text")).cast("bigint").as("n_chars"))

  val tokenCountOracle: String = s"""
    SELECT doc_id,
      CAST(LEN(STRING_SPLIT_REGEX(text, '\\s+')) AS BIGINT) AS ws_tokens,
      ${sqlBpeTokens("text")} AS bpe_tokens,
      CAST(LENGTH(text) AS BIGINT) AS n_chars
    FROM documents"""

  /** Quality scoring: length, average word length, stopword ratio →
    * weighted score in [0,1]. Single deterministic double expression.
    */
  private val stopPattern = "\\b(the|a|of|and|to|in|is|it)\\b"

  def qualityScore(spark: SparkSession, dir: String): DataFrame =
    qualityScoreDf(Tables.documents(spark, dir))

  /** [[qualityScore]] over an arbitrary documents frame — the df-form
    * composed by operators that score a PRUNED slice (dedup_keep_best
    * scores only the near-dup members) instead of paying the regex scan
    * over the whole corpus.
    */
  def qualityScoreDf(documents: DataFrame): DataFrame = {
    val nWords = size(split(col("text"), "\\s+")).cast("double")
    val nStop = regexp_count(col("text"), lit(stopPattern)).cast("double")
    val avgLen = length(regexp_replace(col("text"), "\\s+", "")).cast("double") / nWords
    val stopRatio = nStop / nWords
    documents
      .select(
        col("doc_id"),
        nWords.as("n_words"),
        avgLen.as("avg_word_len"),
        stopRatio.as("stopword_ratio"),
        qualityScoreExpr.as("quality_score"))
  }

  /** The [[qualityScoreDf]] score as a bare expression over `text` —
    * shared with [[filterAgreementKappa]] so the two can never desync
    * (the operand tree, hence the IEEE rounding, is identical).
    */
  private def qualityScoreExpr: Column = {
    val nWords = size(split(col("text"), "\\s+")).cast("double")
    val nStop = regexp_count(col("text"), lit(stopPattern)).cast("double")
    val avgLen = length(regexp_replace(col("text"), "\\s+", "")).cast("double") / nWords
    lit(0.4) * least(nWords / lit(100.0), lit(1.0)) +
      lit(0.4) * (lit(1.0) - nStop / nWords) +
      lit(0.2) * least(avgLen / lit(8.0), lit(1.0))
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

  /** Language-ID accuracy audit — [[langId]]'s confusion matrix against
    * the corpus's declared `lang` labels: per (declared, predicted)
    * pair, document count and the share of that declared language in
    * ppm (recall on the diagonal, the error profile off it — the report
    * that decides whether the cheap marker heuristic is good enough for
    * a mix decision, per language, before anyone trusts lang-keyed
    * sampling). All-integer shares; the per-language totals broadcast.
    *
    * Scale: langId itself is scan-speed; the matrix is ≤ |langs|² rows
    * after a map-side-combined aggregate.
    */
  def langidConfusion(spark: SparkSession, dir: String): DataFrame = {
    val cm = langId(spark, dir)
      .groupBy(col("declared_lang"), col("predicted_lang"))
      .agg(count(lit(1)).as("n_docs"))
    val tot = cm.groupBy(col("declared_lang"))
      .agg(sum(col("n_docs")).as("n_declared"))
    cm.join(broadcast(tot), Seq("declared_lang"))
      .select(col("declared_lang"), col("predicted_lang"), col("n_docs"),
        expr("(n_docs * 1000000) div n_declared").as("share_ppm"))
  }

  lazy val langidConfusionOracle: String = s"""
    WITH lid AS ($langIdOracle),
    cm AS (
      SELECT declared_lang, predicted_lang, COUNT(*) AS n_docs
      FROM lid GROUP BY 1, 2),
    tot AS (
      SELECT declared_lang, SUM(n_docs) AS n_declared FROM cm GROUP BY 1)
    SELECT cm.declared_lang, cm.predicted_lang,
      CAST(cm.n_docs AS BIGINT) AS n_docs,
      CAST((cm.n_docs * 1000000) // t.n_declared AS BIGINT) AS share_ppm
    FROM cm JOIN tot t USING (declared_lang)"""

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

  /** Boilerplate-template detection — the C4-style "same header stamped
    * across a source" audit: documents sharing an identical leading
    * 32-character prefix within one source are template families
    * (mirrors, footers, generated pages), reported per (source, prefix
    * fingerprint) with the doc count and its exact-ppm share of the
    * source. Downstream cleaning strips or collapses these before
    * training; this is the measurement that finds them.
    *
    * Scale shape: the prefix is HASHED at the scan (md5 of the 32-char
    * slice), so the group-by shuffles narrow (source, 32-hex) keys —
    * never prefix text; the per-source totals aggregate reads ONLY the
    * source column (column pruning) and broadcasts back. Share stays
    * BIGINT via the overflow-safe ppm treatment.
    */
  def boilerplateDetect(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val perSrc = graft.functions.Iterate.checkpoint(
      docs.groupBy(col("source")).agg(count(lit(1)).as("n_src")))
    docs
      .select(col("source"),
        md5(substring(col("text"), 1, 32).cast("binary")).as("prefix_md5"))
      .groupBy(col("source"), col("prefix_md5"))
      .agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") >= 2)
      .join(broadcast(perSrc), Seq("source"))
      .select(col("source"), col("prefix_md5"), col("n_docs"),
        when(col("n_src") <= lit(9000000000000L),
          expr("(n_docs * 1000000) div n_src"))
          .otherwise(expr("n_docs div (n_src div 1000000)"))
          .as("share_ppm"))
  }

  val boilerplateDetectOracle: String = """
    WITH per_src AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_src
      FROM documents GROUP BY 1),
    g AS (
      SELECT source, MD5(SUBSTR(text, 1, 32)) AS prefix_md5,
        CAST(COUNT(*) AS BIGINT) AS n_docs
      FROM documents GROUP BY 1, 2)
    SELECT source, prefix_md5, n_docs,
      CASE WHEN n_src <= 9000000000000
        THEN (n_docs * 1000000) // n_src
        ELSE n_docs // (n_src // 1000000) END AS share_ppm
    FROM g JOIN per_src USING (source)
    WHERE n_docs >= 2"""

  /** PII scrubbing — redact emails, URLs, and [[PiiShapes]]' VALIDATED
    * classes (Luhn-checked card numbers → `[CARD]`, structurally valid
    * national-ID shapes → `[NID]`) before training (the compliance pass
    * every corpus gets). The lake text is synthetic and clean, so the
    * operator first derives a PII-bearing column the way a crawl would
    * carry one (deterministic contact+link suffix plus PiiShapes'
    * valid-and-decoy injections), then applies the redaction rules; the
    * rules are the operator. The validated classes redact by
    * extract → validate → exact-string replace, so a checksum-broken
    * decoy passes through UNREDACTED — the validator, not the shape
    * regex, gates the redaction (over-redaction is itself a defect: it
    * destroys order ids and citation numerals). Simple character-class
    * regexes keep Java and RE2 semantics aligned; the folds are codegen
    * HOFs over the per-row candidate list (never a UDF).
    */
  def piiScrub(spark: SparkSession, dir: String): DataFrame = {
    val dirty = concat(col("text"),
      lit(" contact: user"), col("doc_id").cast("string"),
      lit("@example.com via https://ex.io/p/"), col("doc_id").cast("string"),
      PiiShapes.injection(col("doc_id")))
    Tables.documents(spark, dir)
      .select(col("doc_id"), dirty.as("dirty"))
      // validated-class redaction first (exact-string replace of each
      // validated candidate), then the shape-regex classes
      .withColumn("s1",
        aggregate(PiiShapes.validCards(col("dirty")), col("dirty"),
          (acc, c) => replace(acc, c, lit("[CARD]"))))
      .withColumn("s2",
        aggregate(PiiShapes.validNids(col("dirty")), col("s1"),
          (acc, c) => replace(acc, c, lit("[NID]"))))
      .select(
        col("doc_id"),
        regexp_replace(
          regexp_replace(col("s2"),
            lit("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"),
            lit("[EMAIL]")),
          lit("https?://[^ ]+"), lit("[URL]")).as("scrubbed"))
  }

  val piiScrubOracle: String = s"""
    WITH d AS (
      SELECT doc_id,
        text || ' contact: user' || CAST(doc_id AS VARCHAR)
             || '@example.com via https://ex.io/p/' || CAST(doc_id AS VARCHAR)
             || ${PiiShapes.SqlInjection} AS dirty
      FROM documents),
    v AS (
      SELECT doc_id, dirty,
        LIST_FILTER(REGEXP_EXTRACT_ALL(dirty, '${PiiShapes.SqlCardPattern}'),
          cc -> ${PiiShapes.sqlLuhnValid("cc", "ii")}) AS cards,
        LIST_FILTER(REGEXP_EXTRACT_ALL(dirty, '${PiiShapes.SqlNidPattern}'),
          nn -> ${PiiShapes.sqlNidValid("nn")}) AS nids
      FROM d),
    r AS (
      SELECT doc_id,
        LIST_REDUCE(LIST_PREPEND(
          LIST_REDUCE(LIST_PREPEND(dirty, cards),
            (acc, c) -> REPLACE(acc, c, '[CARD]')), nids),
          (acc2, c2) -> REPLACE(acc2, c2, '[NID]')) AS s2
      FROM v)
    SELECT doc_id,
      REGEXP_REPLACE(
        REGEXP_REPLACE(s2,
          '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
        'https?://[^ ]+', '[URL]', 'g') AS scrubbed
    FROM r"""

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
    val Seq(rWordCount, rMeanWordLen, rSymbolRatio, rStopwords, rDiversity) =
      gopherRuleExprs
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

  /** The five [[gopherRulesDf]] rule predicates as bare expressions over
    * `text`, in report order — shared with [[filterAgreementKappa]] so
    * the gate and its agreement audit can never desync.
    */
  private def gopherRuleExprs: Seq[Column] = {
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
    Seq(
      nWords.between(50, 10000),
      letterChars >= nWords * 3 && letterChars <= nWords * 10,
      // symbol ratio < 10% ⟺ 10·symbols < chars (integer-exact)
      (nChars - nAlnumSp) * 10 < nChars,
      nStop >= 2,
      // vocabulary diversity: 5·distinct > n_words (> 20% distinct)
      nDistinct * 5 > nWords)
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

  /** Cohen's κ between the corpus's two quality gates — gopher's
    * rule-conjunction pass and the weighted [[qualityScoreDf]] score at
    * the 0.8 cut: the inter-rater agreement audit every multi-filter
    * curation stack needs before it ANDs its gates (high κ ⇒ the
    * second gate is redundant; κ near 0 ⇒ the gates disagree beyond
    * chance and their intersection is a much sharper cut than either
    * documented alone). Both predicates are the SHARED expressions the
    * production gates compile ([[gopherRuleExprs]],
    * [[qualityScoreExpr]]) — one corpus scan, four conditional counts,
    * shuffle-free to a single row. κ = (po−pe)/(1−pe) in exact integer
    * cross-multiplication: ppm = ((a+d)·N − pe_num)·1e6 ÷ (N² −
    * pe_num), truncation-toward-zero spelled identically in both
    * engines (both `div` and DuckDB's `//` truncate toward zero —
    * verified, −7 // 2 = −3 — and the negative-κ branch still negates
    * an all-nonnegative quotient so the rounding DIRECTION of a
    * negative κ is pinned by construction, not by engine
    * coincidence), with the gini overflow treatment past
    * N² > 9e12 (divide the denominator by 1e6 first, ≤1 ppm bias).
    */
  /** The 2×2 agreement grid of the two quality gates (one corpus scan,
    * four conditional counts, one row) — shared by
    * [[filterAgreementKappa]] (symmetric agreement) and [[mcnemarTest]]
    * (disagreement DIRECTION), so the two audits always read the same
    * grid.
    */
  private def gateGrid(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
        gopherRuleExprs.reduce(_ && _).as("ap"),
        (qualityScoreExpr > lit(0.8)).as("bp"))
      .agg(
        sum(when(col("ap") && col("bp"), 1L).otherwise(0L)).as("a"),
        sum(when(col("ap") && !col("bp"), 1L).otherwise(0L)).as("b"),
        sum(when(!col("ap") && col("bp"), 1L).otherwise(0L)).as("cc"),
        sum(when(!col("ap") && !col("bp"), 1L).otherwise(0L)).as("d"))

  /** SQL twin of [[gateGrid]], shared by the kappa and McNemar oracles. */
  private lazy val gateGridSql: String = s"""
      SELECT
        CAST(SUM(CASE WHEN ap AND bp THEN 1 ELSE 0 END) AS BIGINT) AS a,
        CAST(SUM(CASE WHEN ap AND NOT bp THEN 1 ELSE 0 END) AS BIGINT) AS b,
        CAST(SUM(CASE WHEN NOT ap AND bp THEN 1 ELSE 0 END) AS BIGINT) AS cc,
        CAST(SUM(CASE WHEN NOT ap AND NOT bp THEN 1 ELSE 0 END) AS BIGINT) AS d
      FROM (
        SELECT g.pass AS ap, q.quality_score > 0.8 AS bp
        FROM ($gopherRulesOracle) g
        JOIN ($qualityScoreOracle) q ON g.doc_id = q.doc_id)"""

  def filterAgreementKappa(spark: SparkSession, dir: String): DataFrame = {
    gateGrid(spark, dir)
      .withColumn("nn", expr("a + b + cc + d"))
      .withColumn("po_num", expr("a + d"))
      .withColumn("pe_num",
        expr("(a + b) * (a + cc) + (cc + d) * (b + d)"))
      .select(col("nn").as("n_docs"), col("a").as("n_both_pass"),
        col("b").as("n_gopher_only"), col("cc").as("n_quality_only"),
        col("d").as("n_both_fail"),
        expr("""CASE
          WHEN nn * nn - pe_num = 0 THEN CAST(NULL AS BIGINT)
          WHEN nn * nn <= 9000000000000 THEN
            CASE WHEN po_num * nn - pe_num >= 0
              THEN ((po_num * nn - pe_num) * 1000000)
                div (nn * nn - pe_num)
              ELSE -(((pe_num - po_num * nn) * 1000000)
                div (nn * nn - pe_num)) END
          WHEN (nn * nn - pe_num) div 1000000 = 0 THEN CAST(NULL AS BIGINT)
          ELSE
            CASE WHEN po_num * nn - pe_num >= 0
              THEN (po_num * nn - pe_num)
                div ((nn * nn - pe_num) div 1000000)
              ELSE -((pe_num - po_num * nn)
                div ((nn * nn - pe_num) div 1000000)) END
          END""").as("kappa_ppm"))
  }

  lazy val filterAgreementKappaOracle: String = s"""
    WITH cnt AS ($gateGridSql),
    f AS (
      SELECT a, b, cc, d, a + b + cc + d AS nn, a + d AS po_num,
        (a + b) * (a + cc) + (cc + d) * (b + d) AS pe_num
      FROM cnt)
    SELECT nn AS n_docs, a AS n_both_pass, b AS n_gopher_only,
      cc AS n_quality_only, d AS n_both_fail,
      CASE
        WHEN nn * nn - pe_num = 0 THEN NULL
        WHEN nn * nn <= 9000000000000 THEN
          CASE WHEN po_num * nn - pe_num >= 0
            THEN ((po_num * nn - pe_num) * 1000000) // (nn * nn - pe_num)
            ELSE -(((pe_num - po_num * nn) * 1000000) // (nn * nn - pe_num))
            END
        WHEN (nn * nn - pe_num) // 1000000 = 0 THEN NULL
        ELSE
          CASE WHEN po_num * nn - pe_num >= 0
            THEN (po_num * nn - pe_num) // ((nn * nn - pe_num) // 1000000)
            ELSE -((pe_num - po_num * nn) // ((nn * nn - pe_num) // 1000000))
            END
        END AS kappa_ppm
    FROM f"""

  /** McNemar's test on the same gate grid — the DIRECTION audit
    * [[filterAgreementKappa]] cannot give: κ says how much the two
    * gates agree; McNemar says whether their DISAGREEMENT is
    * one-sided (gopher strictly stricter than the score cut, or vice
    * versa — the discordant cells b vs c), which decides whether
    * swapping gates would shift corpus volume. χ²_M = (b−c)²/(b+c)
    * with the continuity-corrected (|b−c|−1)²/(b+c) twin, both exact
    * integer cross-multiplication fixed-pointed ×1e6 (gini overflow
    * guard past (b−c)² > 9e12: divide the denominator by 1e6 first),
    * decided against the literal χ²(1) 5% value; NULL when the gates
    * never disagree. Same one-scan grid, single row.
    */
  def mcnemarTest(spark: SparkSession, dir: String): DataFrame =
    gateGrid(spark, dir)
      .select(col("b").as("n_gopher_only"), col("cc").as("n_quality_only"),
        expr("""CASE WHEN b + cc = 0 THEN CAST(NULL AS BIGINT)
          WHEN (b - cc) * (b - cc) <= 9000000000000 THEN
            ((b - cc) * (b - cc) * 1000000) div (b + cc)
          ELSE (b - cc) * (b - cc) div ((b + cc) div 1000000) END""")
          .as("chi2_x1e6"),
        expr("""CASE WHEN b + cc = 0 THEN CAST(NULL AS BIGINT)
          WHEN (abs(b - cc) - 1) * (abs(b - cc) - 1) <= 9000000000000 THEN
            ((abs(b - cc) - 1) * (abs(b - cc) - 1) * 1000000) div (b + cc)
          ELSE (abs(b - cc) - 1) * (abs(b - cc) - 1)
            div ((b + cc) div 1000000) END""").as("chi2_cc_x1e6"),
        expr(s"""CASE WHEN b + cc = 0 THEN CAST(NULL AS BOOLEAN)
          WHEN (b - cc) * (b - cc) <= 9000000000000 THEN
            ((b - cc) * (b - cc) * 1000000) div (b + cc) > 3841459
          ELSE (b - cc) * (b - cc) div ((b + cc) div 1000000) > 3841459
          END""").as("reject_symmetry_5pct"))

  lazy val mcnemarTestOracle: String = s"""
    WITH cnt AS ($gateGridSql)
    SELECT b AS n_gopher_only, cc AS n_quality_only,
      CASE WHEN b + cc = 0 THEN NULL
        WHEN (b - cc) * (b - cc) <= 9000000000000 THEN
          ((b - cc) * (b - cc) * 1000000) // (b + cc)
        ELSE (b - cc) * (b - cc) // ((b + cc) // 1000000) END AS chi2_x1e6,
      CASE WHEN b + cc = 0 THEN NULL
        WHEN (ABS(b - cc) - 1) * (ABS(b - cc) - 1) <= 9000000000000 THEN
          ((ABS(b - cc) - 1) * (ABS(b - cc) - 1) * 1000000) // (b + cc)
        ELSE (ABS(b - cc) - 1) * (ABS(b - cc) - 1)
          // ((b + cc) // 1000000) END AS chi2_cc_x1e6,
      CASE WHEN b + cc = 0 THEN NULL
        WHEN (b - cc) * (b - cc) <= 9000000000000 THEN
          ((b - cc) * (b - cc) * 1000000) // (b + cc) > 3841459
        ELSE (b - cc) * (b - cc) // ((b + cc) // 1000000) > 3841459
        END AS reject_symmetry_5pct
    FROM cnt"""

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

  /** Winnowing parameters (Schleimer, Wilkerson, Aiken 2003, "Winnowing:
    * Local Algorithms for Document Fingerprinting" — the MOSS
    * fingerprinting scheme): k-gram width shares the corpus-wide 3-word
    * shingle unit; the guarantee window w = 4 means any shared run of
    * k + w - 1 = 6+ words between two documents is caught by at least
    * one common fingerprint, while only ~2/(w+1) of gram hashes are
    * kept.
    */
  private val WinnowWindow = 4

  /** Winnowing document fingerprints: positional 3-word-gram hashes, and
    * from every window of [[WinnowWindow]] consecutive hashes the
    * minimum is selected (rightmost occurrence on ties — the paper's
    * rule, which makes the selection deterministic and position-stable).
    * Output is the distinct (position, hash) set per document — the
    * fingerprint index a plagiarism/overlap detector stores, ~4-5×
    * smaller than the full gram list yet with the window guarantee
    * above.
    *
    * Scale: pure per-row array expressions — no shuffle anywhere, the
    * pass runs at scan speed and the output explode is linear in the
    * selected density (≈ 2n/(w+1)). Docs with fewer than w grams emit
    * nothing (their whole-document hash already lives in
    * doc_fingerprint).
    */
  def winnowFingerprint(spark: SparkSession, dir: String): DataFrame = {
    val ww = WinnowWindow
    val w = col("w")
    val grams = when(size(w) >= lit(3),
      transform(sequence(lit(1), size(w) - 2), i =>
        concat_ws(" ", element_at(w, i), element_at(w, i + 1), element_at(w, i + 2))))
      .otherwise(array().cast("array<string>"))
    val hs = col("hs")
    val m = size(hs)
    // For window start p (1-based): min of hs[p..p+w-1], position of the
    // RIGHTMOST minimum. Under the rightmost-tie rule selections are
    // non-decreasing in p (window p+1 can only keep window p's pick or
    // move right), so duplicate selections always form ADJACENT runs —
    // an in-array neighbor compare dedupes completely without the
    // shuffle a row-level distinct would cost.
    val fps = when(m >= ww,
      transform(sequence(lit(1), m - (ww - 1)), p => {
        val win = slice(hs, p, lit(ww))
        val mn = array_min(win)
        val jRight = array_max(
          filter(sequence(lit(0), lit(ww - 1)), j => element_at(win, j + 1) === mn))
        array((p + jRight).cast("long"), mn)
      }))
      .otherwise(array().cast("array<array<bigint>>"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), TextOps.words(col("text")).as("w"))
      .select(col("doc_id"), TextOps.hashes(grams).as("hs"))
      .select(col("doc_id"), fps.as("sel"))
      .select(col("doc_id"),
        explode(filter(col("sel"),
          (x, i) => (i === lit(0)) || !(x === element_at(col("sel"), i)))).as("fp"))
      .select(col("doc_id"),
        element_at(col("fp"), 1).as("pos"),
        element_at(col("fp"), 2).as("fp_hash"))
  }

  val winnowFingerprintOracle: String = {
    val ww = WinnowWindow
    s"""
    WITH h AS (
      SELECT doc_id,
        ${TextOps.sqlHashes(
          "LIST_TRANSFORM(RANGE(1, GREATEST(LEN(ws)-1, 1)), " +
            "i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])")} AS hs
      FROM (SELECT doc_id, STRING_SPLIT_REGEX(text, '\\s+') AS ws
            FROM documents)),
    f AS (
      SELECT doc_id,
        LIST_TRANSFORM(RANGE(1, LEN(hs) - ${ww - 2}), p ->
          [CAST(p + LIST_MAX(LIST_FILTER(RANGE(0, $ww), j ->
              hs[CAST(p + j AS INTEGER)] = LIST_MIN(hs[p : p + ${ww - 1}])))
            AS BIGINT),
           LIST_MIN(hs[p : p + ${ww - 1}])]) AS sel
      FROM h WHERE LEN(hs) >= $ww)
    SELECT doc_id, fp[1] AS pos, fp[2] AS fp_hash
    FROM (SELECT doc_id,
            UNNEST(LIST_FILTER(sel, (x, i) -> i = 1 OR x != sel[i - 1])) AS fp
          FROM f)"""
  }

  /** Gopher's repeated-n-gram text-quality signals (Rae et al. 2022,
    * Gopher appendix A1.1): the character fraction covered by the most
    * frequent 2-gram, and the character fraction covered by ALL
    * duplicated 3-grams. Coverage counts each character once (positions
    * covered by any qualifying occurrence, then summed) so both
    * fractions live in [0,1] even when occurrences overlap. The top
    * 2-gram tie-breaks to the lexicographically smallest — fully
    * deterministic. Complements [[repetition_score]] (distinct/total
    * bigram ratio) with the character-mass view the Gopher thresholds
    * are defined over.
    *
    * Scale: gram streams aggregate on (doc_id, gram) — doc_id spreads
    * every hot gram so there is no Zipf-skewed key anywhere; the per-doc
    * winner is a bounded-group window; coverage start-lists ride
    * [[Tables.dimHint]] back onto the documents scan exactly like
    * dedup_substring. Per-doc cost is linear in document length.
    */
  def gopherDupNgrams(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = col("w")
    def gramStream(docs: DataFrame, n: Int): DataFrame = docs
      .select(col("doc_id"), w,
        explode(
          when(size(w) >= n, sequence(lit(1), size(w) - (n - 1)))
            .otherwise(array().cast("array<int>"))).as("s"))
      .select(col("doc_id"), col("s"),
        array_join(slice(w, col("s"), lit(n)), " ").as("gram"))
    def coveredChars(starts: Column, n: Int): Column = {
      val ds = coalesce(starts, array().cast("array<int>"))
      aggregate(
        filter(sequence(lit(1), size(w)),
          i => exists(ds, s => s <= i && i < s + n)),
        lit(0L), (acc, i) => acc + length(element_at(w, i)).cast("long"))
    }
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), TextOps.words(col("text")).as("w"),
        length(regexp_replace(col("text"), "\\s+", "")).cast("bigint").as("wchars"))
    val bi = gramStream(docs, 2)
      .groupBy(col("doc_id"), col("gram"))
      .agg(count(lit(1)).as("n_occ"), collect_list(col("s")).as("starts"))
    val topRank = Window.partitionBy(col("doc_id"))
      .orderBy(col("n_occ").desc, col("gram").asc)
    val top = bi
      .withColumn("rn", row_number().over(topRank))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("gram").as("top_bigram"),
        col("n_occ").as("top_bigram_n"), col("starts").as("top_starts"))
    val dupTri = gramStream(docs, 3)
      .groupBy(col("doc_id"), col("gram"))
      .agg(count(lit(1)).as("n_occ"), collect_list(col("s")).as("starts"))
      .filter(col("n_occ") >= 2)
      .groupBy(col("doc_id"))
      .agg(flatten(collect_list(col("starts"))).as("tri_starts"))
    docs
      .join(Tables.dimHint(top), Seq("doc_id"), "left")
      .join(Tables.dimHint(dupTri), Seq("doc_id"), "left")
      .select(
        col("doc_id"), col("top_bigram"),
        coalesce(col("top_bigram_n"), lit(0L)).as("top_bigram_n"),
        (coveredChars(col("top_starts"), 2).cast("double")
          / col("wchars").cast("double")).as("top_bigram_frac"),
        (coveredChars(col("tri_starts"), 3).cast("double")
          / col("wchars").cast("double")).as("dup_trigram_frac"))
  }

  val gopherDupNgramsOracle: String = """
    WITH w AS (
      SELECT doc_id, STRING_SPLIT_REGEX(text, '\s+') AS ws,
        CAST(LENGTH(REGEXP_REPLACE(text, '\s+', '', 'g')) AS BIGINT) AS wchars
      FROM documents),
    bi AS (
      SELECT doc_id, ARRAY_TO_STRING(ws[s : s + 1], ' ') AS gram,
        COUNT(*) AS n_occ, LIST(s) AS starts
      FROM (SELECT doc_id, ws, UNNEST(RANGE(1, GREATEST(LEN(ws), 1))) AS s
            FROM w)
      GROUP BY 1, 2),
    top AS (
      SELECT doc_id, gram AS top_bigram, n_occ AS top_bigram_n,
        starts AS top_starts
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
              ORDER BY n_occ DESC, gram ASC) AS rn FROM bi)
      WHERE rn = 1),
    tri AS (
      SELECT doc_id, ARRAY_TO_STRING(ws[s : s + 2], ' ') AS gram,
        COUNT(*) AS n_occ, LIST(s) AS starts
      FROM (SELECT doc_id, ws, UNNEST(RANGE(1, GREATEST(LEN(ws) - 1, 1))) AS s
            FROM w)
      GROUP BY 1, 2),
    duptri AS (
      SELECT doc_id, FLATTEN(LIST(starts)) AS tri_starts
      FROM tri WHERE n_occ >= 2 GROUP BY 1)
    SELECT w.doc_id, top.top_bigram,
      COALESCE(top.top_bigram_n, 0) AS top_bigram_n,
      CAST(COALESCE(LIST_SUM(LIST_TRANSFORM(
          LIST_FILTER(RANGE(1, LEN(ws) + 1), i ->
            LEN(LIST_FILTER(COALESCE(top.top_starts, []), s ->
              s <= i AND i < s + 2)) > 0),
          i -> LENGTH(ws[i]))), 0) AS DOUBLE)
        / CAST(wchars AS DOUBLE) AS top_bigram_frac,
      CAST(COALESCE(LIST_SUM(LIST_TRANSFORM(
          LIST_FILTER(RANGE(1, LEN(ws) + 1), i ->
            LEN(LIST_FILTER(COALESCE(duptri.tri_starts, []), s ->
              s <= i AND i < s + 3)) > 0),
          i -> LENGTH(ws[i]))), 0) AS DOUBLE)
        / CAST(wchars AS DOUBLE) AS dup_trigram_frac
    FROM w
    LEFT JOIN top USING (doc_id)
    LEFT JOIN duptri USING (doc_id)"""

  /** Per-source quality profile — the mix-planning view of
    * [[gopherRules]]: for each source, total docs, docs passing the
    * full gate (with the share in ppm), and per-rule pass counts — the
    * report that says WHICH rule is killing WHICH source before anyone
    * re-weights a mixture on gated counts. All-integer shares; the
    * matrix is |sources| rows after a map-side-combined aggregate.
    */
  def sourceQualityMatrix(spark: SparkSession, dir: String): DataFrame = {
    val g = gopherRules(spark, dir)
    val src = Tables.documents(spark, dir).select(col("doc_id"), col("source"))
    g.join(src, Seq("doc_id"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("pass").cast("long")).as("n_pass"),
        sum(col("r_word_count").cast("long")).as("n_word_count"),
        sum(col("r_mean_word_len").cast("long")).as("n_mean_word_len"),
        sum(col("r_symbol_ratio").cast("long")).as("n_symbol_ratio"),
        sum(col("r_stopwords").cast("long")).as("n_stopwords"),
        sum(col("r_diversity").cast("long")).as("n_diversity"))
      .select(col("source"), col("n_docs"), col("n_pass"),
        expr("(n_pass * 1000000) div n_docs").as("pass_ppm"),
        col("n_word_count"), col("n_mean_word_len"), col("n_symbol_ratio"),
        col("n_stopwords"), col("n_diversity"))
  }

  lazy val sourceQualityMatrixOracle: String = s"""
    WITH g AS ($gopherRulesOracle)
    SELECT d.source,
      CAST(COUNT(*) AS BIGINT) AS n_docs,
      CAST(SUM(CAST(g.pass AS INT)) AS BIGINT) AS n_pass,
      CAST((SUM(CAST(g.pass AS INT)) * 1000000) // COUNT(*) AS BIGINT)
        AS pass_ppm,
      CAST(SUM(CAST(g.r_word_count AS INT)) AS BIGINT) AS n_word_count,
      CAST(SUM(CAST(g.r_mean_word_len AS INT)) AS BIGINT) AS n_mean_word_len,
      CAST(SUM(CAST(g.r_symbol_ratio AS INT)) AS BIGINT) AS n_symbol_ratio,
      CAST(SUM(CAST(g.r_stopwords AS INT)) AS BIGINT) AS n_stopwords,
      CAST(SUM(CAST(g.r_diversity AS INT)) AS BIGINT) AS n_diversity
    FROM g JOIN documents d USING (doc_id)
    GROUP BY 1"""

  /** Fixed hashed-feature space for the LM stats — same constant-size
    * bucket discipline as importance_weights' DSIR stats, so the model
    * table BROADCASTS at any corpus size.
    */
  private val LmBuckets = 8192L

  /** Corpus-LM quality scoring (the CCNet signal, Wenzek et al. 2020:
    * score text by how surprising a language model finds it; low =
    * fluent/typical, high = noise). The model here is the corpus's own
    * hashed-BIGRAM distribution — bigrams hash into [[LmBuckets]] fixed
    * buckets, p(b) = (c(b)+α)/(N+1) with Laplace α = 1/B (exact 2⁻¹³),
    * and a document scores the token-weighted MEAN INVERSE probability
    * of its bigrams. CCNet's perplexity is a log-space geometric mean;
    * libm log is not FP-portable (the tfidf lesson), so the linearized
    * arithmetic-mean-of-1/p form keeps the same ordering signal —
    * boilerplate-heavy text scores low, character-noise scores high —
    * with every factor a deterministic double (per-factor casts, exact
    * decimal summation).
    *
    * Scale: identical shape to importance_weights — the corpus never
    * shuffles on a raw (Zipf-skewed) bigram key: stats fold map-side
    * into the B fixed buckets and broadcast; the one corpus shuffle is
    * per-(doc, bucket) tf rows, skew-free since doc_id spreads every
    * hot bucket.
    */
  def lmScore(spark: SparkSession, dir: String): DataFrame = {
    val w = col("w")
    val toks = Tables.documents(spark, dir)
      .select(col("doc_id"), TextOps.words(col("text")).as("w"))
      .select(col("doc_id"),
        explode(
          when(size(w) >= 2,
            transform(sequence(lit(1), size(w) - 1), i =>
              concat_ws(" ", element_at(w, i), element_at(w, i + 1))))
            .otherwise(array().cast("array<string>"))).as("bigram"))
      .select(col("doc_id"),
        (TextOps.hash24(concat(lit("lm|"), col("bigram"))) % LmBuckets).as("bucket"))
    val tf = toks.groupBy(col("doc_id"), col("bucket"))
      .agg(count(lit(1)).as("tf"))
    val stats = toks.groupBy(col("bucket")).agg(count(lit(1)).as("cb"))
    val totals = toks.agg(count(lit(1)).as("nb"))
    val alpha = lit(1.0 / LmBuckets)
    val inv = ((col("nb") + lit(1L)).cast("double")
      / (col("cb").cast("double") + alpha))
    tf.join(broadcast(stats), Seq("bucket"))
      .crossJoin(broadcast(totals))
      .select(col("doc_id"), col("tf"),
        (col("tf").cast("double") * inv).as("wi"))
      .groupBy(col("doc_id"))
      .agg(sum(col("tf")).as("n_bigrams"),
        graft.functions.Exact.dsum(col("wi")).as("sum_inv"))
      .select(col("doc_id"), col("n_bigrams"),
        (col("sum_inv") / col("n_bigrams").cast("double")).as("lm_score"))
  }

  /** The lm_score oracle's WITH body + final select, split so
    * [[ccnetBucketsOracle]] can chain the identical scoring as a CTE.
    */
  private val lmScoreCtes: String = s"""toks AS MATERIALIZED (
      SELECT doc_id,
        CAST('0x' || SUBSTR(MD5('lm|' || ws[i] || ' ' || ws[i+1]), 1, 6)
          AS BIGINT) % $LmBuckets AS bucket
      FROM (SELECT doc_id, STRING_SPLIT_REGEX(text, '\\s+') AS ws,
              UNNEST(RANGE(1, GREATEST(LEN(STRING_SPLIT_REGEX(text, '\\s+')), 1)))
                AS i
            FROM documents)),
    tf AS (SELECT doc_id, bucket, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
    stats AS (SELECT bucket, COUNT(*) AS cb FROM toks GROUP BY 1),
    totals AS (SELECT COUNT(*) AS nb FROM toks)"""

  private val lmScoreSelect: String = s"""SELECT doc_id,
      CAST(SUM(tf) AS BIGINT) AS n_bigrams,
      ${graft.functions.Exact.sqlDsum(
        "CAST(tf AS DOUBLE) * (CAST(nb + 1 AS DOUBLE)"
          + s" / (CAST(cb AS DOUBLE) + CAST(1 AS DOUBLE) / $LmBuckets))")}
        / CAST(SUM(tf) AS DOUBLE) AS lm_score
    FROM tf JOIN stats USING (bucket) CROSS JOIN totals
    GROUP BY doc_id"""

  val lmScoreOracle: String = s"""
    WITH $lmScoreCtes
    $lmScoreSelect"""

  /** Integer score grid for [[ccnetBuckets]]: 1024 cells per score unit.
    * A power of two BECAUSE IEEE multiplication by 2¹⁰ is exact (pure
    * exponent shift) — `floor(lm_score · 1024)` is deterministic given
    * the already-hash-verified lm_score doubles, with no decimal
    * rounding hazard at cell boundaries.
    */
  private val CcnetCellScale = 1024

  /** CCNet's head/middle/tail corpus split (Wenzek et al. 2020 §3.3):
    * rank documents by LM score ([[lmScore]] — low = fluent) and cut
    * the corpus into thirds; "head" feeds high-quality training mixes,
    * "tail" gets dropped or re-filtered. The tertile cut is computed
    * the way exact percentiles are computed in this repo — a HISTOGRAM
    * of integer score cells + one cumulative window over the aggregated
    * cells, never a global sort of the corpus: t1/t2 are the smallest
    * cells whose cumulative count reaches ⌈n/3⌉ and ⌈2n/3⌉ (all-integer
    * `cum·3 ≥ n` tests), and each document's bucket is then two integer
    * comparisons on a broadcast one-row threshold frame. Documents
    * sharing the boundary cell share a bucket — the grid (1/1024 of a
    * score unit) is the declared resolution of the cut, which is how
    * CCNet itself treats its percentile thresholds (computed once on a
    * sample, applied as constants).
    *
    * Scale: the histogram is bounded by distinct score cells (≤ corpus
    * docs, far fewer in practice); its window runs over aggregated
    * narrow rows. Everything corpus-sized is scan + broadcast join.
    */
  def ccnetBuckets(spark: SparkSession, dir: String): DataFrame = {
    // Three branches read the cells frame (histogram, total, verdict):
    // checkpoint materializes the lm scoring once, blocks free via GC
    // (the semdedup discipline).
    val cells = graft.functions.Iterate.checkpoint(
      lmScore(spark, dir).select(col("doc_id"),
        floor(col("lm_score") * lit(CcnetCellScale)).cast("long").as("cell")))
    val hist = cells.groupBy(col("cell")).agg(count(lit(1)).as("n"))
    // score cells are resolution-bounded (≤ CcnetCellScale+1), but the
    // cumulative still rides the bucketed exclusive prefix so the
    // no-unpartitioned-window invariant holds REGISTRY-WIDE, not just
    // where cardinality forces it (PlanSpec pins all 264 plans).
    val cum = graft.functions.Ranks.withBucketedExclusivePrefix(
        hist, col("cell"), ascending = true, 64,
        Seq(col("n") -> "n_before"))
      .withColumn("cum", col("n_before") + col("n"))
    val tot = cells.agg(count(lit(1)).as("n_total"))
    val th = cum.crossJoin(broadcast(tot))
      .agg(
        min(when(col("cum") * 3 >= col("n_total"), col("cell"))).as("t1"),
        min(when(col("cum") * 3 >= col("n_total") * 2, col("cell"))).as("t2"))
    cells.crossJoin(broadcast(th))
      .select(col("doc_id"), col("cell"),
        when(col("cell") <= col("t1"), lit("head"))
          .when(col("cell") <= col("t2"), lit("middle"))
          .otherwise(lit("tail")).as("bucket"))
  }

  lazy val ccnetBucketsOracle: String = s"""
    WITH $lmScoreCtes,
    lm AS ($lmScoreSelect),
    cells AS (
      SELECT doc_id,
        CAST(FLOOR(lm_score * $CcnetCellScale) AS BIGINT) AS cell FROM lm),
    hist AS (SELECT cell, COUNT(*) AS n FROM cells GROUP BY 1),
    cum AS (
      SELECT cell, SUM(n) OVER (ORDER BY cell
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM hist),
    tot AS (SELECT COUNT(*) AS n_total FROM cells),
    th AS (
      SELECT MIN(CASE WHEN cum * 3 >= n_total THEN cell END) AS t1,
             MIN(CASE WHEN cum * 3 >= 2 * n_total THEN cell END) AS t2
      FROM cum CROSS JOIN tot)
    SELECT c.doc_id, c.cell,
      CASE WHEN c.cell <= th.t1 THEN 'head'
           WHEN c.cell <= th.t2 THEN 'middle'
           ELSE 'tail' END AS bucket
    FROM cells c CROSS JOIN th"""

  /** Sentence segmentation — explode each document into trimmed,
    * non-empty sentences split on terminal-punctuation runs (`[.!?]+`),
    * with a 1-based per-document index. The heuristic is deliberately
    * simple and engine-portable (RE2-safe, no lookbehind) — it is the
    * granularity layer under sentence-level dedup and boilerplate
    * detection, not a linguistic segmenter. Narrow per-row explode, no
    * shuffle: scan-speed at 100 TB, output rows ∝ corpus sentences.
    */
  def sentenceSplit(spark: SparkSession, dir: String): DataFrame = {
    val sents = filter(
      transform(split(col("text"), "[.!?]+"), s => trim(s)),
      s => s =!= "")
    Tables.documents(spark, dir)
      .select(col("doc_id"), posexplode(sents).as(Seq("i", "sentence")))
      .select(col("doc_id"),
        (col("i") + 1).cast("bigint").as("sent_idx"),
        col("sentence"),
        length(col("sentence")).cast("bigint").as("n_chars"))
  }

  val sentenceSplitOracle: String = """
    SELECT doc_id, CAST(i AS BIGINT) AS sent_idx, sents[i] AS sentence,
      CAST(LENGTH(sents[i]) AS BIGINT) AS n_chars
    FROM (
      SELECT doc_id, sents, UNNEST(RANGE(1, LEN(sents) + 1)) AS i
      FROM (
        SELECT doc_id,
          LIST_FILTER(
            LIST_TRANSFORM(STRING_SPLIT_REGEX(text, '[.!?]+'), s -> TRIM(s)),
            s -> s != '') AS sents
        FROM documents))"""

  /** Tokenizer-fertility report — per language: BPE-ish tokens per
    * whitespace word (fertility — the classic multilingual-tokenizer
    * efficiency metric) and characters per token. High fertility on a
    * language means the tokenizer fragments it and the language pays
    * more sequence budget per word — the signal that drives vocab
    * re-balancing. All-integer sums (map-side combinable, one tiny
    * lang-keyed shuffle), two exact double divisions at the end.
    */
  def tokenizerFertility(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("lang"),
        size(split(col("text"), "\\s+")).cast("bigint").as("ws"),
        bpeTokens(col("text")).as("bpe"),
        length(col("text")).cast("bigint").as("nc"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("ws")).as("ws_tokens"),
        sum(col("bpe")).as("bpe_tokens"),
        sum(col("nc")).as("n_chars"))
      .select(col("lang"), col("n_docs"), col("ws_tokens"), col("bpe_tokens"),
        (col("bpe_tokens").cast("double") / col("ws_tokens").cast("double"))
          .as("fertility"),
        (col("n_chars").cast("double") / col("bpe_tokens").cast("double"))
          .as("chars_per_token"))

  val tokenizerFertilityOracle: String = """
    SELECT lang,
      COUNT(*) AS n_docs,
      CAST(SUM(ws) AS BIGINT) AS ws_tokens,
      CAST(SUM(bpe) AS BIGINT) AS bpe_tokens,
      CAST(SUM(bpe) AS DOUBLE) / CAST(SUM(ws) AS DOUBLE) AS fertility,
      CAST(SUM(nc) AS DOUBLE) / CAST(SUM(bpe) AS DOUBLE) AS chars_per_token
    FROM (
      SELECT lang,
        CAST(LEN(STRING_SPLIT_REGEX(text, '\s+')) AS BIGINT) AS ws,
        CAST(LEN(REGEXP_EXTRACT_ALL(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS bpe,
        CAST(LENGTH(text) AS BIGINT) AS nc
      FROM documents)
    GROUP BY lang"""

  /** Per-source distribution drift vs the whole corpus — the mixture
    * diagnostic behind temperature/weight tuning: total-variation
    * distance `TV(p_s, p_corpus) = ½ Σ_w |p_s(w) − p_c(w)|` over the
    * unigram distributions. TV instead of KL/JS BECAUSE it needs no
    * logarithm: libm `log` is not FP-portable across engines (the
    * tfidf/lm_score discipline), while TV reduces to EXACT integer
    * arithmetic on a common denominator —
    * `|c_sw·n − c_w·n_s| / (n_s·n)` — plus the closed form
    * `Σ_{w∉s} p_c(w) = 1 − Σ_{w∈s} p_c(w)` for corpus words the source
    * never uses, so only the source's own vocab is ever enumerated.
    * Decimal(38,0) products (HUGEINT in the oracle): at 100 TB,
    * `c_sw·n ≤ 1e11·1e13 = 1e24` and vocab-sized sums stay < 1e38.
    * Shuffle shape: ONE corpus-sized (source,word) aggregate; everything
    * after is vocab-sized (the ngram_freq scale discipline).
    */
  def corpusDivergence(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    def dec(c: Column) = c.cast(DecimalType(38, 0))
    val words = Tables.documents(spark, dir)
      .select(col("source"), explode(TextOps.words(col("text"))).as("w"))
    val sw = words.groupBy(col("source"), col("w")).agg(count(lit(1)).as("c_sw"))
    val cw = sw.groupBy(col("w")).agg(sum(col("c_sw")).as("c_w"))
    val ns = sw.groupBy(col("source")).agg(sum(col("c_sw")).as("n_s"))
    val tot = cw.agg(sum(col("c_w")).as("n"))
    val terms = sw.join(cw, Seq("w"))
      .join(broadcast(ns), Seq("source"))
      .crossJoin(broadcast(tot))
      .select(col("source"), col("n_s"), col("n"), col("c_w"),
        abs(dec(col("c_sw")) * dec(col("n")) - dec(col("c_w")) * dec(col("n_s")))
          .as("term"))
    terms.groupBy(col("source"))
      .agg(max(col("n_s")).as("n_s"), max(col("n")).as("n"),
        count(lit(1)).as("vocab_size"),
        sum(col("term")).as("s"),
        sum(dec(col("c_w"))).as("cws"))
      .select(col("source"), col("n_s").as("n_words"), col("vocab_size"),
        (floor(
          ((col("s") + dec(col("n")) * dec(col("n_s"))
            - dec(col("n_s")) * col("cws")).cast("double")
            / (dec(col("n")) * dec(col("n_s")) * lit(2).cast(DecimalType(38, 0)))
              .cast("double")) * lit(1.0e8) + lit(0.5)).cast("double") / lit(1.0e8))
          .as("tv_divergence"))
  }

  /** Shared oracle CTE block for the unigram-distribution family
    * ([[corpusDivergence]], [[sourceSignatureTerms]]): per-(source,
    * word) counts, corpus totals.
    */
  private val unigramCtes: String = """words AS (
      SELECT source, UNNEST(STRING_SPLIT_REGEX(text, '\s+')) AS w FROM documents),
    sw AS (SELECT source, w, COUNT(*) AS c_sw FROM words GROUP BY 1, 2),
    cw AS (SELECT w, CAST(SUM(c_sw) AS BIGINT) AS c_w FROM sw GROUP BY 1),
    ns AS (SELECT source, CAST(SUM(c_sw) AS BIGINT) AS n_s FROM sw GROUP BY 1),
    tot AS (SELECT CAST(SUM(c_w) AS BIGINT) AS n FROM cw)"""

  val corpusDivergenceOracle: String = s"""
    WITH $unigramCtes,
    terms AS (
      SELECT sw.source, ns.n_s, tot.n, c_w,
        ABS(CAST(c_sw AS HUGEINT) * CAST(n AS HUGEINT)
          - CAST(c_w AS HUGEINT) * CAST(n_s AS HUGEINT)) AS term
      FROM sw JOIN cw USING (w) JOIN ns ON sw.source = ns.source CROSS JOIN tot),
    agg AS (
      SELECT source, MAX(n_s) AS n_s, MAX(n) AS n, COUNT(*) AS vocab_size,
        SUM(term) AS s, SUM(CAST(c_w AS HUGEINT)) AS cws
      FROM terms GROUP BY 1)
    SELECT source, n_s AS n_words, vocab_size,
      CAST(FLOOR(
        (CAST(s + CAST(n AS HUGEINT) * CAST(n_s AS HUGEINT)
            - CAST(n_s AS HUGEINT) * cws AS DOUBLE)
          / CAST(2 * CAST(n AS HUGEINT) * CAST(n_s AS HUGEINT) AS DOUBLE))
        * 1.0e8 + 0.5) AS DOUBLE) / 1.0e8 AS tv_divergence
    FROM agg"""

  /** Per-source signature terms — the top-5 most OVER-represented words
    * per source, ranked by the exact mass-weighted excess
    * `c_sw·n − c_w·n_s` (the [[corpusDivergence]] TV numerator,
    * signed): robust where raw lift explodes on hapax words, log-free
    * where log-odds isn't FP-portable. Reported lift = p_s/p_c as a
    * 1e-6-rounded double for readability; the RANKING key is the exact
    * integer. Same shuffle shape as corpus_divergence + one per-source
    * top-5 window over vocab-sized rows.
    */
  def sourceSignatureTerms(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    def dec(c: Column) = c.cast(DecimalType(38, 0))
    val words = Tables.documents(spark, dir)
      .select(col("source"), explode(TextOps.words(col("text"))).as("w"))
    val sw = words.groupBy(col("source"), col("w")).agg(count(lit(1)).as("c_sw"))
    val cw = sw.groupBy(col("w")).agg(sum(col("c_sw")).as("c_w"))
    val ns = sw.groupBy(col("source")).agg(sum(col("c_sw")).as("n_s"))
    val tot = cw.agg(sum(col("c_w")).as("n"))
    val scored = sw.join(cw, Seq("w"))
      .join(broadcast(ns), Seq("source"))
      .crossJoin(broadcast(tot))
      .select(col("source"), col("w").as("term"), col("c_sw"),
        (dec(col("c_sw")) * dec(col("n")) - dec(col("c_w")) * dec(col("n_s")))
          .as("excess"),
        (floor((dec(col("c_sw")) * dec(col("n"))).cast("double")
          / (dec(col("c_w")) * dec(col("n_s"))).cast("double") * lit(1.0e6)
          + lit(0.5)).cast("double") / lit(1.0e6)).as("lift"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source"))
      .orderBy(col("excess").desc, col("term").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("source"), col("rank"), col("term"), col("c_sw"), col("lift"))
  }

  val sourceSignatureTermsOracle: String = s"""
    WITH $unigramCtes,
    scored AS (
      SELECT sw.source, sw.w AS term, sw.c_sw,
        CAST(c_sw AS HUGEINT) * CAST(n AS HUGEINT)
          - CAST(c_w AS HUGEINT) * CAST(n_s AS HUGEINT) AS excess,
        CAST(FLOOR(CAST(CAST(c_sw AS HUGEINT) * CAST(n AS HUGEINT) AS DOUBLE)
          / CAST(CAST(c_w AS HUGEINT) * CAST(n_s AS HUGEINT) AS DOUBLE) * 1.0e6
          + 0.5) AS DOUBLE) / 1.0e6 AS lift
      FROM sw JOIN cw USING (w) JOIN ns ON sw.source = ns.source CROSS JOIN tot)
    SELECT source, rank, term, c_sw, lift FROM (
      SELECT source, term, c_sw, lift,
        ROW_NUMBER() OVER (PARTITION BY source
          ORDER BY excess DESC, term ASC) AS rank
      FROM scored)
    WHERE rank <= 5"""

  /** Quality-signal calibration — per source, the Pearson correlation
    * between the heuristic [[qualityScore]] and the corpus-LM
    * [[lmScore]]. The audit a curation pipeline runs before trusting a
    * cheap filter as a proxy for an expensive one: low or negative
    * correlation on a source means the two signals disagree there and
    * thresholds tuned on one do not transfer. Computed from exact
    * decimal moments ([[graft.functions.Exact]]) so the five sums are
    * order-independent; the closing arithmetic (products, sqrt,
    * division) is single-value IEEE — deterministic — with a final
    * 1e-8 fixed-point round. Degenerate sources (zero variance in
    * either signal) are filtered on the pre-division variance product —
    * deterministic doubles derived from the exact moments, mirrored
    * verbatim in the oracle's WHERE. Shuffle shape: the lm_score
    * internals dominate; the
    * calibration itself adds doc-keyed joins and one tiny source agg.
    *
    * Moments use the FIXED-POINT sum (floor(v·1e6 + 0.5) in double —
    * identical IEEE on both engines — summed as exact integers), NOT
    * `Exact.dsum`: the decimal cast's half-up rounding runs on an exact
    * binary→decimal conversion in Spark but a double-multiply path in
    * DuckDB, and the y² addends here land close enough to .5·1e-6
    * boundaries to split the two (observed: one addend off by 1e-6 →
    * cancellation in k·sxy − sx·sy amplified it to 2e-8 in the corr).
    * floor keeps both engines on the same double the whole way.
    * Magnitude bound: the floor argument must stay inside double's
    * exact-integer range (9e15) — y² ≤ ~1e9 holds for any corpus since
    * lm_score is a mean inverse bucket-probability ≤ nb+1 ≈ 1e4·density.
    */
  def qualityCalibration(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    def fp6(c: Column) =
      (sum(floor(c * lit(1.0e6) + lit(0.5)).cast(DecimalType(38, 0)))
        .cast("double") / lit(1.0e6))
    val src = Tables.documents(spark, dir).select(col("doc_id"), col("source"))
    val q = qualityScore(spark, dir).select(col("doc_id"), col("quality_score").as("x"))
    val l = lmScore(spark, dir).select(col("doc_id"), col("lm_score").as("y"))
    val m = src.join(q, Seq("doc_id")).join(l, Seq("doc_id"))
      .groupBy(col("source"))
      .agg(count(lit(1)).cast("double").as("k"),
        fp6(col("x")).as("sx"),
        fp6(col("y")).as("sy"),
        fp6(col("x") * col("x")).as("sxx"),
        fp6(col("y") * col("y")).as("syy"),
        fp6(col("x") * col("y")).as("sxy"))
    val vx = col("k") * col("sxx") - col("sx") * col("sx")
    val vy = col("k") * col("syy") - col("sy") * col("sy")
    m.filter(vx * vy > 0)
      .select(col("source"), col("k").cast("bigint").as("n_docs"),
        (floor(((col("k") * col("sxy") - col("sx") * col("sy"))
          / sqrt(vx * vy)) * lit(1.0e8) + lit(0.5)).cast("double") / lit(1.0e8))
          .as("corr_quality_lm"))
  }

  val qualityCalibrationOracle: String = {
    def fp6(expr: String) =
      s"CAST(SUM(CAST(FLOOR(($expr) * 1.0e6 + 0.5) AS HUGEINT)) AS DOUBLE) / 1.0e6"
    s"""
    WITH $lmScoreCtes,
    lm AS ($lmScoreSelect),
    q AS (SELECT doc_id, quality_score FROM ($qualityScoreOracle) qq),
    m AS (
      SELECT d.source,
        CAST(COUNT(*) AS DOUBLE) AS k,
        ${fp6("q.quality_score")} AS sx,
        ${fp6("lm.lm_score")} AS sy,
        ${fp6("q.quality_score * q.quality_score")} AS sxx,
        ${fp6("lm.lm_score * lm.lm_score")} AS syy,
        ${fp6("q.quality_score * lm.lm_score")} AS sxy
      FROM documents d
      JOIN q ON d.doc_id = q.doc_id
      JOIN lm ON d.doc_id = lm.doc_id
      GROUP BY 1)
    SELECT source, CAST(k AS BIGINT) AS n_docs,
      CAST(FLOOR(((k * sxy - sx * sy)
          / SQRT((k * sxx - sx * sx) * (k * syy - sy * sy)))
        * 1.0e8 + 0.5) AS DOUBLE) / 1.0e8 AS corr_quality_lm
    FROM m
    WHERE (k * sxx - sx * sx) * (k * syy - sy * sy) > 0"""
  }

  /** Character-class profile — the C4/RefinedWeb symbol-ratio family of
    * quality filters needs these counts (too many digits/punct/uppercase
    * ⇒ tables, code, shouting): per-doc counts of lowercase / uppercase /
    * digit / whitespace / other, plus an all-integer alpha ppm. Zero
    * shuffles, no FP anywhere — and the five counts come from the fused
    * native [[org.apache.spark.sql.graft.CharClassCounts]] expression:
    * ONE byte-level pass instead of five regexp_count walks (each of
    * which re-runs the regex engine over the full text). The regex
    * formulation is kept in [[charClassStatsRegex]] as the reference
    * semantics; ExpressionSpec pins their equivalence.
    */
  def charClassStats(spark: SparkSession, dir: String): DataFrame = {
    val cc = org.apache.spark.sql.GraftBridge.column(
      org.apache.spark.sql.graft.CharClassCounts(
        org.apache.spark.sql.GraftBridge.expression(col("text"))))
    Tables.documents(spark, dir)
      .select(col("doc_id"), cc.as("cc"))
      .select(col("doc_id"),
        element_at(col("cc"), 1).as("n_chars"),
        element_at(col("cc"), 2).as("n_lower"),
        element_at(col("cc"), 3).as("n_upper"),
        element_at(col("cc"), 4).as("n_digit"),
        element_at(col("cc"), 5).as("n_space"))
      .withColumn("n_other",
        col("n_chars") - col("n_lower") - col("n_upper")
          - col("n_digit") - col("n_space"))
      .withColumn("alpha_ppm",
        expr("((n_lower + n_upper) * 1000000) div greatest(n_chars, 1)"))
  }

  /** Reference regex formulation of [[charClassStats]] — the declared
    * semantics the fused expression must reproduce bit-for-bit.
    */
  def charClassStatsRegex(spark: SparkSession, dir: String): DataFrame = {
    def cnt(pat: String) = regexp_count(col("text"), lit(pat)).cast("bigint")
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        length(col("text")).cast("bigint").as("n_chars"),
        cnt("[a-z]").as("n_lower"),
        cnt("[A-Z]").as("n_upper"),
        cnt("[0-9]").as("n_digit"),
        cnt("\\s").as("n_space"))
      .withColumn("n_other",
        col("n_chars") - col("n_lower") - col("n_upper")
          - col("n_digit") - col("n_space"))
      .withColumn("alpha_ppm",
        expr("((n_lower + n_upper) * 1000000) div greatest(n_chars, 1)"))
  }

  val charClassStatsOracle: String = """
    SELECT doc_id, n_chars, n_lower, n_upper, n_digit, n_space,
      n_chars - n_lower - n_upper - n_digit - n_space AS n_other,
      ((n_lower + n_upper) * 1000000) // GREATEST(n_chars, 1) AS alpha_ppm
    FROM (
      SELECT doc_id,
        CAST(LENGTH(text) AS BIGINT) AS n_chars,
        CAST(LEN(REGEXP_EXTRACT_ALL(text, '[a-z]')) AS BIGINT) AS n_lower,
        CAST(LEN(REGEXP_EXTRACT_ALL(text, '[A-Z]')) AS BIGINT) AS n_upper,
        CAST(LEN(REGEXP_EXTRACT_ALL(text, '[0-9]')) AS BIGINT) AS n_digit,
        CAST(LEN(REGEXP_EXTRACT_ALL(text, '\s')) AS BIGINT) AS n_space
      FROM documents)"""

  /** Heaps-law vocabulary growth — distinct-word count as the corpus
    * grows, sampled at 5 doc-id milestones: the curve tokenizer sizing
    * and dedup-rate forecasting both read. The naive formulation
    * (distinct-count per prefix) rescans the corpus per milestone; this
    * one uses the FIRST-OCCURRENCE trick — a word's contribution to
    * every prefix is decided by `min(doc_id)` alone — so the corpus
    * shuffles ONCE (per-word min/count), and the milestone curve is a
    * tiny histogram of first-seen values against the 5 boundaries.
    * All-integer.
    */
  def vocabGrowth(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val bounds = docs.agg(max(col("doc_id")).as("max_id"))
    val words = docs
      .select(col("doc_id"), explode(TextOps.words(col("text"))).as("w"))
    val firstSeen = words.groupBy(col("w"))
      .agg(min(col("doc_id")).as("first_doc"), count(lit(1)).as("cnt"))
    val withM = firstSeen.crossJoin(broadcast(bounds))
      .select(col("first_doc"), col("cnt"),
        explode(sequence(lit(1), lit(5))).as("milestone"),
        col("max_id"))
      .filter(col("first_doc") <= col("milestone") * col("max_id") / 5)
    // token mass per milestone from DOC-level counts (docs ≪ tokens):
    // the 5× milestone replication happens on the small frame.
    val tokens = docs
      .select(col("doc_id"),
        size(split(col("text"), "\\s+")).cast("bigint").as("nt"))
      .crossJoin(broadcast(bounds))
      .select(explode(sequence(lit(1), lit(5))).as("milestone"),
        col("doc_id"), col("nt"), col("max_id"))
      .filter(col("doc_id") <= col("milestone") * col("max_id") / 5)
      .groupBy(col("milestone")).agg(sum(col("nt")).as("cum_tokens"))
    withM.groupBy(col("milestone"))
      .agg(count(lit(1)).as("vocab_size"))
      .join(tokens, Seq("milestone"))
      .select(col("milestone"), col("cum_tokens"), col("vocab_size"))
  }

  val vocabGrowthOracle: String = """
    WITH bounds AS (SELECT MAX(doc_id) AS max_id FROM documents),
    words AS (
      SELECT doc_id, UNNEST(STRING_SPLIT_REGEX(text, '\s+')) AS w FROM documents),
    first_seen AS (
      SELECT w, MIN(doc_id) AS first_doc, COUNT(*) AS cnt FROM words GROUP BY 1),
    ms AS (SELECT UNNEST(RANGE(1, 6)) AS milestone),
    vocab AS (
      SELECT m.milestone, COUNT(*) AS vocab_size
      FROM first_seen f CROSS JOIN bounds b JOIN ms m
        ON f.first_doc <= m.milestone * b.max_id / 5
      GROUP BY 1),
    toks AS (
      SELECT m.milestone,
        CAST(SUM(LEN(STRING_SPLIT_REGEX(d.text, '\s+'))) AS BIGINT) AS cum_tokens
      FROM documents d CROSS JOIN bounds b JOIN ms m
        ON d.doc_id <= m.milestone * b.max_id / 5
      GROUP BY 1)
    SELECT v.milestone, t.cum_tokens, v.vocab_size
    FROM vocab v JOIN toks t USING (milestone)"""

  /** Zipf coverage — what fraction of all token instances the top-k
    * most frequent words account for (k = 10 / 100 / 1000): the
    * coverage curve a vocab budget is traded against. The top-1000 cut
    * is a BOUNDED TakeOrdered over the word-count frame (never a full
    * vocab sort); prefix mass at each k is a 1000-row fold. Ties break
    * (count DESC, word ASC) in both engines. All-integer ppm.
    */
  def zipfCoverage(spark: SparkSession, dir: String): DataFrame = {
    val counts = Tables.documents(spark, dir)
      .select(explode(TextOps.words(col("text"))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
    val total = counts.agg(sum(col("cnt")).as("n_total"))
    val top = counts.orderBy(col("cnt").desc, col("w").asc).limit(1000)
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("cnt").desc, col("w").asc)))
    top.crossJoin(broadcast(total))
      .select(explode(array(lit(10), lit(100), lit(1000))).as("k"),
        col("rk"), col("cnt"), col("n_total"))
      .filter(col("rk") <= col("k"))
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n_words"),
        sum(col("cnt")).as("covered"),
        max(col("n_total")).as("n_total"))
      .select(col("k"), col("n_words"), col("covered"),
        expr("(covered * 1000000) div n_total").as("coverage_ppm"))
  }

  val zipfCoverageOracle: String = """
    WITH counts AS (
      SELECT w, COUNT(*) AS cnt
      FROM (SELECT UNNEST(STRING_SPLIT_REGEX(text, '\s+')) AS w FROM documents)
      GROUP BY 1),
    total AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n_total FROM counts),
    top AS (
      SELECT cnt, ROW_NUMBER() OVER (ORDER BY cnt DESC, w ASC) AS rk
      FROM counts ORDER BY cnt DESC, w ASC LIMIT 1000),
    ks AS (SELECT UNNEST([10, 100, 1000]) AS k)
    SELECT ks.k,
      COUNT(*) AS n_words,
      CAST(SUM(t.cnt) AS BIGINT) AS covered,
      (CAST(SUM(t.cnt) AS BIGINT) * 1000000) // MAX(tot.n_total) AS coverage_ppm
    FROM top t CROSS JOIN total tot JOIN ks ON t.rk <= ks.k
    GROUP BY ks.k"""

  /** Readability scoring: a Flesch-reading-ease-shaped statistic per
    * document from three regex-countable proxies — whitespace words,
    * sentence terminators (`[.!?]+` runs), and vowel-group runs as the
    * syllable stand-in (the classic poor-man's syllabifier). The score
    * is computed in scaled INTEGER arithmetic
    * (`206835 − 1015·w/s − 84600·v/w`, milli-points, integer div) so
    * the result is bit-portable across engines — the float formula's
    * division order would not be. Pure per-row projection: zero
    * shuffles, scan speed at any corpus size, same family as
    * quality_score / gopher_rules but measuring sentence/word shape
    * rather than content rules.
    */
  def readabilityScore(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        greatest(size(split(col("text"), "\\s+")), lit(1)).cast("long")
          .as("n_words"),
        greatest(regexp_count(col("text"), lit("[.!?]+")), lit(1))
          .cast("long").as("n_sents"),
        regexp_count(lower(col("text")), lit("[aeiouy]+")).cast("long")
          .as("n_vowel_groups"))
      .withColumn("flesch_milli",
        lit(206835L) - expr("1015L * n_words div n_sents")
          - expr("84600L * n_vowel_groups div n_words"))

  val readabilityScoreOracle: String = s"""
    SELECT doc_id, n_words, n_sents, n_vowel_groups,
      206835 - (1015 * n_words) // n_sents
             - (84600 * n_vowel_groups) // n_words AS flesch_milli
    FROM (
      SELECT doc_id,
        GREATEST(CAST(LEN(STRING_SPLIT_REGEX(text, '\\s+')) AS BIGINT), 1)
          AS n_words,
        GREATEST(CAST(LEN(REGEXP_EXTRACT_ALL(text, '[.!?]+')) AS BIGINT), 1)
          AS n_sents,
        CAST(LEN(REGEXP_EXTRACT_ALL(LOWER(text), '[aeiouy]+')) AS BIGINT)
          AS n_vowel_groups
      FROM documents)"""

  /** Per-document marginal novelty — how much NEW content each document
    * adds to the corpus, in first-appearance order: the share of a
    * doc's distinct word trigrams whose global first occurrence (min
    * doc_id) is this doc. The curation metric behind "is this source
    * still contributing, or re-serving what we already have?" —
    * [[graft.operators.Dedup]]'s ngram_containment prices pairwise
    * overlap, this prices each doc's marginal value against the WHOLE
    * preceding corpus in one pass (production substitutes ingestion
    * order for doc_id). Exact integers throughout: type counts and a
    * ppm floor division. Scale: n_shingles is a per-row projection
    * (scan speed — the shingle set is never re-joined to the corpus);
    * the novel side is one trigram-keyed first-toucher aggregate
    * (map-side combinable) folded to a ≤|docs| frame, joined back
    * doc-keyed. The corpus text is exploded exactly once.
    */
  def ngramNovelty(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
      .select(col("doc_id"),
        TextOps.shingles3(TextOps.words(col("text"))).as("sh"))
    val perDoc = d.select(col("doc_id"),
      size(col("sh")).cast("bigint").as("n_shingles"))
    val novel = d.select(col("doc_id"), explode(col("sh")).as("t"))
      .groupBy(col("t")).agg(min(col("doc_id")).as("doc_id"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_novel"))
    perDoc.join(novel, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_shingles"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"))
      .withColumn("novelty_ppm",
        when(col("n_shingles") > 0,
          expr("(n_novel * 1000000) div n_shingles")))
  }

  val ngramNoveltyOracle: String = {
    val sh = TextOps.sqlShingles3("w")
    s"""
    WITH d AS (
      SELECT doc_id, $sh AS sh FROM (
        SELECT doc_id, STRING_SPLIT_REGEX(text, '\\s+') AS w
        FROM documents)),
    per AS (
      SELECT doc_id, CAST(LEN(sh) AS BIGINT) AS n_shingles FROM d),
    tg AS (SELECT doc_id, UNNEST(sh) AS t FROM d),
    firsts AS (SELECT t, MIN(doc_id) AS fd FROM tg GROUP BY 1),
    novel AS (SELECT fd AS doc_id, COUNT(*) AS n_novel FROM firsts
      GROUP BY 1)
    SELECT p.doc_id, p.n_shingles,
      COALESCE(n.n_novel, 0) AS n_novel,
      CASE WHEN p.n_shingles > 0
        THEN (COALESCE(n.n_novel, 0) * 1000000) // p.n_shingles
      END AS novelty_ppm
    FROM per p LEFT JOIN novel n ON p.doc_id = n.doc_id"""
  }

  /** Corpus collocations — the top-20 word bigrams whose components
    * co-occur far beyond chance, ranked by the DICE coefficient
    * 2·c(xy) / (c(x)+c(y)) in exact ppm (Smadja's collocation measure;
    * chosen over PMI because Dice's numerator 2·c(xy)·10⁶ stays inside
    * BIGINT at any corpus size, while PMI's cross-multiplied
    * c(xy)·N·10⁶ needs int128 — the unigram counts are reported so PMI
    * is derivable downstream). The tokenizer-curation companion to
    * [[ngramFreq]]: raw frequency surfaces "of the"; Dice surfaces the
    * pairs that behave as ONE unit — merge candidates for a BPE vocab
    * ([[graft.operators.Tokenizer]] learns merges from pair counts,
    * this audits which learned pairs are statistically real). A
    * min-count floor of 5 removes one-off flukes. Scale: two corpus
    * explodes (unigram, bigram — both map-side-combinable counts), the
    * vocab frame checkpointed once and joined twice word-keyed (never
    * broadcast — vocabulary grows with the corpus), top-k is
    * TakeOrdered with a total-order tiebreak.
    */
  def collocationsDice(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    val uni = graft.functions.Iterate.checkpoint(
      d.select(explode(TextOps.words(col("text"))).as("u"))
        .groupBy(col("u")).agg(count(lit(1)).as("c")))
    val bigrams = org.apache.spark.sql.GraftBridge.column(
      org.apache.spark.sql.graft.Bigrams(
        org.apache.spark.sql.GraftBridge.expression(col("text"))))
    d.select(explode(bigrams).as("bigram"))
      .groupBy(col("bigram")).agg(count(lit(1)).as("c_xy"))
      .filter(col("c_xy") >= 5)
      .withColumn("x", split(col("bigram"), " ").getItem(0))
      .withColumn("y", split(col("bigram"), " ").getItem(1))
      .join(uni.select(col("u").as("x"), col("c").as("c_x")), Seq("x"))
      .join(uni.select(col("u").as("y"), col("c").as("c_y")), Seq("y"))
      .select(col("bigram"), col("c_xy"), col("c_x"), col("c_y"),
        expr("(2 * c_xy * 1000000) div (c_x + c_y)").as("dice_ppm"))
      .orderBy(col("dice_ppm").desc, col("bigram").asc)
      .limit(20)
  }

  val collocationsDiceOracle: String = """
    WITH w AS (
      SELECT STRING_SPLIT_REGEX(text, '\s+') AS w FROM documents),
    cu AS (
      SELECT u, COUNT(*) AS c FROM (SELECT UNNEST(w) AS u FROM w)
      GROUP BY 1),
    cb AS (
      SELECT b, COUNT(*) AS c_xy FROM (
        SELECT UNNEST(LIST_TRANSFORM(RANGE(1, GREATEST(LEN(w), 1)),
          i -> w[i] || ' ' || w[i+1])) AS b FROM w)
      GROUP BY 1 HAVING COUNT(*) >= 5)
    SELECT cb.b AS bigram, cb.c_xy, cx.c AS c_x, cy.c AS c_y,
      (2 * cb.c_xy * 1000000) // (cx.c + cy.c) AS dice_ppm
    FROM cb
    JOIN cu cx ON cx.u = STRING_SPLIT(cb.b, ' ')[1]
    JOIN cu cy ON cy.u = STRING_SPLIT(cb.b, ' ')[2]
    ORDER BY dice_ppm DESC, bigram ASC LIMIT 20"""

  /** Fleiss' κ across the THREE quality raters (gopher rules, the
    * weighted quality score at 0.8, and the repetition gate at 0.2) —
    * the m-rater generalization of [[filterAgreementKappa]]'s 2×2:
    * when a curation pipeline stacks gates, pairwise κ misses
    * three-way structure (two gates can each disagree with the third
    * in opposite directions and still pairwise-agree), and Fleiss is
    * the standard multi-rater chance-corrected agreement. All exact
    * integer: per doc the positive-vote count x ∈ [0,3], P̄ from
    * S1 = Σ[x(x−1)+(3−x)(2−x)], Pe from the pooled vote share, κ by
    * BIGINT cross-multiplication in ppm (both engines' integer
    * division truncates toward zero — verified — so the negative-κ
    * branch needs no special casing; past ~7·10⁵ docs the
    * cross-products need the gini divide-the-denominator-first
    * treatment). The repetition vote is the integer form
    * 5·n_distinct ≥ 4·n_bigrams ⟺ repetition ≤ 0.2 — no float
    * threshold can drift. One corpus scan, one row.
    */
  def fleissKappa(spark: SparkSession, dir: String): DataFrame = {
    val bg = org.apache.spark.sql.GraftBridge.column(
      org.apache.spark.sql.graft.Bigrams(
        org.apache.spark.sql.GraftBridge.expression(col("text"))))
    val x = when(gopherRuleExprs.reduce(_ && _), 1L).otherwise(0L) +
      when(qualityScoreExpr > 0.8, 1L).otherwise(0L) +
      when(size(array_distinct(bg)).cast("bigint") * 5 >=
        size(bg).cast("bigint") * 4, 1L).otherwise(0L)
    Tables.documents(spark, dir).select(x.as("x"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("t"),
        sum(expr("x * (x - 1) + (3 - x) * (2 - x)")).as("s1"))
      .select(col("n").as("n_docs"), col("t").as("votes_pos"),
        expr("(s1 * 1000000) div (6 * n)").as("pbar_ppm"),
        expr("((t * t + (3 * n - t) * (3 * n - t)) * 1000000) " +
          "div (9 * n * n)").as("pe_ppm"),
        expr("""CASE
          WHEN 2 * (9 * n * n - t * t - (3 * n - t) * (3 * n - t)) = 0
            THEN CAST(NULL AS BIGINT)
          ELSE ((3 * s1 * n - 2 * (t * t + (3 * n - t) * (3 * n - t)))
            * 1000000)
            div (2 * (9 * n * n - t * t - (3 * n - t) * (3 * n - t)))
          END""").as("kappa_ppm"))
  }

  lazy val fleissKappaOracle: String = s"""
    WITH votes AS (
      SELECT (CASE WHEN g.pass THEN 1 ELSE 0 END
            + CASE WHEN q.quality_score > 0.8 THEN 1 ELSE 0 END
            + CASE WHEN r.n_distinct * 5 >= r.n_bigrams * 4
                THEN 1 ELSE 0 END) AS x
      FROM ($gopherRulesOracle) g
      JOIN ($qualityScoreOracle) q ON g.doc_id = q.doc_id
      JOIN ($repetitionScoreOracle) r ON g.doc_id = r.doc_id),
    agg AS (
      SELECT COUNT(*) AS n, CAST(SUM(x) AS BIGINT) AS t,
        CAST(SUM(x * (x - 1) + (3 - x) * (2 - x)) AS BIGINT) AS s1
      FROM votes)
    SELECT n AS n_docs, t AS votes_pos,
      (s1 * 1000000) // (6 * n) AS pbar_ppm,
      ((t * t + (3 * n - t) * (3 * n - t)) * 1000000)
        // (9 * n * n) AS pe_ppm,
      CASE
        WHEN 2 * (9 * n * n - t * t - (3 * n - t) * (3 * n - t)) = 0
          THEN NULL
        ELSE ((3 * s1 * n - 2 * (t * t + (3 * n - t) * (3 * n - t)))
          * 1000000)
          // (2 * (9 * n * n - t * t - (3 * n - t) * (3 * n - t)))
        END AS kappa_ppm
    FROM agg"""

  def defs: Map[String, QueryDef] = Map(
    "fleiss_kappa" -> QueryDef.sql(fleissKappa, fleissKappaOracle),
    "ngram_novelty" -> QueryDef.sql(ngramNovelty, ngramNoveltyOracle),
    "collocations_dice" ->
      QueryDef.sql(collocationsDice, collocationsDiceOracle),
    "readability_score" ->
      QueryDef.sql(readabilityScore, readabilityScoreOracle),
    "corpus_stats" -> QueryDef.sql(corpusStats, corpusStatsOracle),
    "char_class_stats" -> QueryDef.sql(charClassStats, charClassStatsOracle),
    "vocab_growth" -> QueryDef.sql(vocabGrowth, vocabGrowthOracle),
    "zipf_coverage" -> QueryDef.sql(zipfCoverage, zipfCoverageOracle),
    "sentence_split" -> QueryDef.sql(sentenceSplit, sentenceSplitOracle),
    "tokenizer_fertility" -> QueryDef.sql(tokenizerFertility, tokenizerFertilityOracle),
    "corpus_divergence" -> QueryDef.sql(corpusDivergence, corpusDivergenceOracle),
    "source_signature_terms" ->
      QueryDef.sql(sourceSignatureTerms, sourceSignatureTermsOracle),
    "quality_calibration" -> QueryDef.sql(qualityCalibration, qualityCalibrationOracle),
    "winnow_fingerprint" -> QueryDef.sql(winnowFingerprint, winnowFingerprintOracle),
    "gopher_dup_ngrams" -> QueryDef.sql(gopherDupNgrams, gopherDupNgramsOracle),
    "lm_score" -> QueryDef.sql(lmScore, lmScoreOracle),
    "ccnet_buckets" -> QueryDef.sql(ccnetBuckets, ccnetBucketsOracle),
    "tfidf_top_terms" -> QueryDef.sql(tfidfTopTerms, tfidfTopTermsOracle),
    "ngram_freq" -> QueryDef.sql(ngramFreq, ngramFreqOracle),
    "stopword_filter" -> QueryDef.sql(stopwordFilter, stopwordFilterOracle),
    "token_count" -> QueryDef.sql(tokenCount, tokenCountOracle),
    "quality_score" -> QueryDef.sql(qualityScore, qualityScoreOracle),
    "gopher_rules" -> QueryDef.sql(gopherRules, gopherRulesOracle),
    "filter_agreement_kappa" ->
      QueryDef.sql(filterAgreementKappa, filterAgreementKappaOracle),
    "mcnemar_test" -> QueryDef.sql(mcnemarTest, mcnemarTestOracle),
    "source_quality_matrix" ->
      QueryDef.sql(sourceQualityMatrix, sourceQualityMatrixOracle),
    "lang_id" -> QueryDef.sql(langId, langIdOracle),
    "langid_confusion" -> QueryDef.sql(langidConfusion, langidConfusionOracle),
    "doc_fingerprint" -> QueryDef.sql(docFingerprint, docFingerprintOracle),
    "repetition_score" -> QueryDef.sql(repetitionScore, repetitionScoreOracle),
    "pii_scrub" -> QueryDef.sql(piiScrub, piiScrubOracle),
    "boilerplate_detect" -> QueryDef.sql(boilerplateDetect, boilerplateDetectOracle),
    "doc_chunk" -> QueryDef.sql(docChunk, docChunkOracle)
  )
}
