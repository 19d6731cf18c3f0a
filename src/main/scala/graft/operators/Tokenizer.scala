package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Tokenizer training inside the engine (§2.E): learn the first BPE
  * merges from the corpus itself — the step every LLM data pipeline runs
  * before token counting means anything (reference analog: the corpus
  * prep in src/dags/, which stops at whitespace tokens).
  */
object Tokenizer {

  /** Number of unrolled BPE merge rounds (the kmeans-3-Lloyd-rounds
    * precedent: enough to prove the iteration live, bounded so the
    * oracle can chain one CTE block per round).
    */
  private val MergeRounds = 3

  /** Byte-pair-encoding merge learning (Sennrich, Haddow, Birch 2016,
    * "Neural Machine Translation of Rare Words with Subword Units" §3.2):
    * words split to character symbols; each round counts adjacent symbol
    * pairs weighted by word frequency, merges the most frequent pair
    * corpus-wide (ties break lexicographically — deterministic), and
    * rewrites the vocabulary by greedy leftmost non-overlapping
    * replacement. Output: the learned merge table (rank, pair, merged
    * symbol, pair frequency) — rows 1..[[MergeRounds]] of the merges.txt
    * every BPE tokenizer ships. The end-of-word marker variant is a
    * char-level suffix orthogonal to the merge mechanics and omitted.
    *
    * Scale: the corpus is touched ONCE — the word-count aggregate
    * (map-side combinable, one shuffle of (word, count) rows). Every
    * round after that iterates over the VOCABULARY (Heaps-law sublinear
    * in corpus size), not the corpus: pair stats shuffle |vocab|-bounded
    * narrow rows, the round's winner is a TakeOrdered single row that
    * broadcasts into the rewrite, and the rewritten vocab checkpoints
    * per round (the kmeans discipline — constant-depth plans, no
    * lineage blowup). The greedy rewrite itself is a per-row string
    * fold: scan speed, codegen'd, no UDF.
    */
  def bpeMerges(spark: SparkSession, dir: String): DataFrame =
    bpeMergesDf(Tables.documents(spark, dir))

  /** [[bpeMerges]] over an arbitrary documents frame (staged-data form).
    * On corpora small enough to run out of adjacent pairs before
    * [[MergeRounds]], later rounds emit no row — identically in both
    * engines (an empty winner cross-joins to an empty vocabulary).
    */
  private[graft] def bpeMergesDf(documents: DataFrame): DataFrame = {
    // Vocabulary: distinct words with corpus frequencies, as
    // space-separated character-symbol strings.
    val vocab0 = documents
      .select(explode(split(col("text"), "\\s+")).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .select(
        array_join(regexp_extract_all(col("word"), lit("."), lit(0)), " ").as("sym"),
        col("cnt"))

    // Greedy leftmost merge of the broadcast (lhs, rhs) pair: a string
    // fold over the symbol list — the accumulator's LAST symbol is lhs
    // exactly when acc == lhs or acc ends with ' '+lhs (symbols are
    // space-delimited, so the guard cannot fire mid-symbol).
    def rewrite: Column = aggregate(
      split(col("sym"), " "), lit(""), (acc, x) => {
        val a = col("lhs"); val b = col("rhs")
        when(acc === "", x)
          .when(x === b && acc === a, concat(a, b))
          .when(x === b && acc.endsWith(concat(lit(" "), a)),
            concat(acc.substr(lit(1), length(acc) - length(a) - 1),
              lit(" "), a, b))
          .otherwise(concat(acc, lit(" "), x))
      })

    def topPair(vocab: DataFrame): DataFrame = vocab
      .select(col("cnt"), split(col("sym"), " ").as("syms"))
      .select(col("cnt"),
        explode(
          when(size(col("syms")) >= 2,
            transform(sequence(lit(1), size(col("syms")) - 1), i =>
              array(element_at(col("syms"), i), element_at(col("syms"), i + 1))))
            .otherwise(array().cast("array<array<string>>"))).as("p"))
      .groupBy(
        element_at(col("p"), 1).as("lhs"),
        element_at(col("p"), 2).as("rhs"))
      .agg(sum(col("cnt")).as("freq"))
      .orderBy(col("freq").desc, col("lhs").asc, col("rhs").asc)
      .limit(1)

    val (_, merges) =
      (1 to MergeRounds).foldLeft((vocab0, Seq.empty[DataFrame])) {
        case ((vocab, acc), rank) =>
          val v = graft.functions.Iterate.checkpoint(vocab)
          val top = topPair(v)
          val next = v.crossJoin(broadcast(top))
            .select(rewrite.as("sym"), col("cnt"))
          (next, acc :+ top.select(lit(rank).as("merge_rank"),
            col("lhs"), col("rhs"), concat(col("lhs"), col("rhs")).as("merged"),
            col("freq")))
      }
    merges.reduce(_ unionAll _)
  }

  /** The shared oracle CTE chain — w0 (char-symbol vocab) then one
    * (pair stats, winner, rewritten vocab) block per round — ending
    * with winners t1..t[[MergeRounds]]. Reused by both oracles.
    */
  private val sqlTrainingCtes: String = {
    def round(i: Int): String = s"""
    p$i AS (
      SELECT syms[j] AS lhs, syms[j+1] AS rhs, CAST(SUM(cnt) AS BIGINT) AS freq
      FROM (SELECT STRING_SPLIT(sym, ' ') AS syms, cnt,
              UNNEST(RANGE(1, GREATEST(LEN(STRING_SPLIT(sym, ' ')), 1))) AS j
            FROM w${i - 1})
      GROUP BY 1, 2),
    t$i AS (SELECT lhs, rhs, freq FROM p$i
            ORDER BY freq DESC, lhs ASC, rhs ASC LIMIT 1),
    w$i AS (
      SELECT LIST_REDUCE(LIST_PREPEND('', STRING_SPLIT(sym, ' ')), (acc, x) ->
          CASE WHEN acc = '' THEN x
               WHEN x = rhs AND acc = lhs THEN lhs || rhs
               WHEN x = rhs AND ENDS_WITH(acc, ' ' || lhs)
                 THEN LEFT(acc, LEN(acc) - LEN(lhs) - 1) || ' ' || lhs || rhs
               ELSE acc || ' ' || x END) AS sym, cnt
      FROM w${i - 1} CROSS JOIN t$i)"""
    s"""w0 AS (
      SELECT ARRAY_TO_STRING(REGEXP_EXTRACT_ALL(word, '.'), ' ') AS sym,
        cnt
      FROM (SELECT word, COUNT(*) AS cnt
            FROM (SELECT UNNEST(STRING_SPLIT_REGEX(text, '\\s+')) AS word
                  FROM documents)
            GROUP BY 1)),""" + (1 to MergeRounds).map(round).mkString(",")
  }

  val bpeMergesOracle: String = {
    val out = (1 to MergeRounds).map(i =>
      s"SELECT $i AS merge_rank, lhs, rhs, lhs || rhs AS merged, freq FROM t$i")
      .mkString("\n    UNION ALL ")
    s"""
    WITH $sqlTrainingCtes
    $out"""
  }

  /** Apply the [[bpeMerges]] merge table to the corpus — the encode half
    * of the tokenizer loop (train on the corpus, then tokenize the
    * corpus with what was learned). Each word replays the merges in
    * rank order with the same greedy leftmost fold; the output is the
    * per-document BPE token count next to the character-symbol baseline,
    * and the compression the learned merges bought. This is the number
    * a token-budgeted pipeline (sequence_pack, sample_importance)
    * actually wants, where whitespace token_count is only a proxy.
    *
    * Scale: the learned table pivots to ONE row of six scalars
    * (max-aggregates, so rounds that never fired are nulls whose merge
    * branches simply cannot match) and cross-joins as a broadcast onto
    * a single corpus scan; the triple fold is per-row codegen string
    * work — scan speed, zero corpus shuffles beyond the training pass
    * itself.
    */
  def bpeEncode(spark: SparkSession, dir: String): DataFrame = {
    def mergeFold(sym: Column, a: Column, b: Column): Column = aggregate(
      split(sym, " "), lit(""), (acc, x) =>
        when(acc === "", x)
          .when(x === b && acc === a, concat(a, b))
          .when(x === b && acc.endsWith(concat(lit(" "), a)),
            concat(acc.substr(lit(1), length(acc) - length(a) - 1),
              lit(" "), a, b))
          .otherwise(concat(acc, lit(" "), x)))
    val pivots = (1 to MergeRounds).flatMap(i => Seq(
      max(when(col("merge_rank") === i, col("lhs"))).as(s"l$i"),
      max(when(col("merge_rank") === i, col("rhs"))).as(s"r$i")))
    val mrow = bpeMerges(spark, dir).agg(pivots.head, pivots.tail: _*)
    val encoded: Column => Column = word =>
      (1 to MergeRounds).foldLeft(
        array_join(regexp_extract_all(word, lit("."), lit(0)), " ")) {
        (sym, i) => mergeFold(sym, col(s"l$i"), col(s"r$i"))
      }
    Tables.documents(spark, dir)
      .crossJoin(broadcast(mrow))
      .select(
        col("doc_id"),
        length(regexp_replace(col("text"), "\\s+", "")).cast("bigint")
          .as("n_char_syms"),
        aggregate(split(col("text"), "\\s+"), lit(0L), (acc, word) =>
          acc + size(split(encoded(word), " ")).cast("long"))
          .as("n_bpe_tokens"))
      .withColumn("compression",
        col("n_bpe_tokens").cast("double") / col("n_char_syms").cast("double"))
  }

  val bpeEncodeOracle: String = {
    def sqlMergeFold(sym: String, i: Int): String = s"""
      LIST_REDUCE(LIST_PREPEND('', STRING_SPLIT($sym, ' ')), (acc$i, x$i) ->
        CASE WHEN acc$i = '' THEN x$i
             WHEN x$i = r$i AND acc$i = l$i THEN l$i || r$i
             WHEN x$i = r$i AND ENDS_WITH(acc$i, ' ' || l$i)
               THEN LEFT(acc$i, LEN(acc$i) - LEN(l$i) - 1) || ' ' || l$i || r$i
             ELSE acc$i || ' ' || x$i END)"""
    val enc = (1 to MergeRounds).foldLeft(
      "ARRAY_TO_STRING(REGEXP_EXTRACT_ALL(word, '.'), ' ')")(
      (sym, i) => sqlMergeFold(sym, i))
    // Reuse the training CTE chain, then pivot the winners to one row of
    // scalars — MAX over an empty round yields NULL, whose merge
    // branches can never match (the Spark agg behaves identically).
    val unionAll = (1 to MergeRounds).map(i =>
      s"SELECT $i AS merge_rank, lhs, rhs, freq FROM t$i").mkString(" UNION ALL ")
    val pivots = (1 to MergeRounds).map(i =>
      s"MAX(CASE WHEN merge_rank = $i THEN lhs END) AS l$i, " +
        s"MAX(CASE WHEN merge_rank = $i THEN rhs END) AS r$i").mkString(", ")
    s"""
    WITH $sqlTrainingCtes,
    m AS (SELECT $pivots FROM ($unionAll)),
    enc AS (
      SELECT doc_id,
        CAST(LENGTH(REGEXP_REPLACE(text, '\\s+', '', 'g')) AS BIGINT)
          AS n_char_syms,
        CAST(COALESCE(LIST_SUM(LIST_TRANSFORM(
          STRING_SPLIT_REGEX(text, '\\s+'), word ->
            LEN(STRING_SPLIT($enc, ' ')))), 0) AS BIGINT) AS n_bpe_tokens
      FROM documents CROSS JOIN m)
    SELECT doc_id, n_char_syms, n_bpe_tokens,
      CAST(n_bpe_tokens AS DOUBLE) / CAST(n_char_syms AS DOUBLE) AS compression
    FROM enc"""
  }

  /** Corpus token count after applying the first k merges, for every
    * k = 0..[[MergeRounds]] — the VOCAB-SIZE TUNING CURVE (each row is
    * "one more merge buys this much compression"); a tokenizer team
    * reads the flattening point to stop growing the vocabulary.
    * Monotone by construction (a merge can only shrink a word's symbol
    * count). One corpus scan computes all the counts as parallel
    * per-row folds against the broadcast merge row; `stack` unpivots
    * the single aggregate row. compression_ppm is tokens·1e6 ÷ the
    * k = 0 character-symbol baseline — exact BIGINT.
    */
  def bpeCompressionCurve(spark: SparkSession, dir: String): DataFrame = {
    def mergeFold(sym: Column, a: Column, b: Column): Column = aggregate(
      split(sym, " "), lit(""), (acc, x) =>
        when(acc === "", x)
          .when(x === b && acc === a, concat(a, b))
          .when(x === b && acc.endsWith(concat(lit(" "), a)),
            concat(acc.substr(lit(1), length(acc) - length(a) - 1),
              lit(" "), a, b))
          .otherwise(concat(acc, lit(" "), x)))
    val pivots = (1 to MergeRounds).flatMap(i => Seq(
      max(when(col("merge_rank") === i, col("lhs"))).as(s"l$i"),
      max(when(col("merge_rank") === i, col("rhs"))).as(s"r$i")))
    val mrow = bpeMerges(spark, dir).agg(pivots.head, pivots.tail: _*)
    def tokensAfter(k: Int): Column =
      aggregate(split(col("text"), "\\s+"), lit(0L), (acc, word) =>
        acc + size(split(
          (1 to k).foldLeft(
            array_join(regexp_extract_all(word, lit("."), lit(0)), " ")) {
            (sym, i) => mergeFold(sym, col(s"l$i"), col(s"r$i"))
          }, " ")).cast("long"))
    val row = Tables.documents(spark, dir)
      .crossJoin(broadcast(mrow))
      .agg(sum(tokensAfter(0)).as("n_0"),
        (1 to MergeRounds).map(k => sum(tokensAfter(k)).as(s"n_$k")): _*)
    val stackArgs = (0 to MergeRounds)
      .map(k => s"CAST($k AS BIGINT), n_$k").mkString(", ")
    row.select(
        expr(s"stack(${MergeRounds + 1}, $stackArgs) " +
          "AS (merges_applied, corpus_tokens)"),
        col("n_0").as("baseline_syms"))
      .withColumn("compression_ppm",
        expr("(corpus_tokens * 1000000) div baseline_syms"))
  }

  val bpeCompressionCurveOracle: String = {
    def sqlMergeFold(sym: String, i: Int): String = s"""
      LIST_REDUCE(LIST_PREPEND('', STRING_SPLIT($sym, ' ')), (acc$i, x$i) ->
        CASE WHEN acc$i = '' THEN x$i
             WHEN x$i = r$i AND acc$i = l$i THEN l$i || r$i
             WHEN x$i = r$i AND ENDS_WITH(acc$i, ' ' || l$i)
               THEN LEFT(acc$i, LEN(acc$i) - LEN(l$i) - 1) || ' ' || l$i || r$i
             ELSE acc$i || ' ' || x$i END)"""
    def enc(k: Int) = (1 to k).foldLeft(
      "ARRAY_TO_STRING(REGEXP_EXTRACT_ALL(word, '.'), ' ')")(
      (sym, i) => sqlMergeFold(sym, i))
    def nK(k: Int) =
      s"""CAST(COALESCE(SUM(LIST_SUM(LIST_TRANSFORM(
        STRING_SPLIT_REGEX(text, '\\s+'), word ->
          LEN(STRING_SPLIT(${enc(k)}, ' '))))), 0) AS BIGINT) AS n_$k"""
    val unionAll = (1 to MergeRounds).map(i =>
      s"SELECT $i AS merge_rank, lhs, rhs, freq FROM t$i").mkString(" UNION ALL ")
    val pivots = (1 to MergeRounds).map(i =>
      s"MAX(CASE WHEN merge_rank = $i THEN lhs END) AS l$i, " +
        s"MAX(CASE WHEN merge_rank = $i THEN rhs END) AS r$i").mkString(", ")
    val rows = (0 to MergeRounds).map(k =>
      s"SELECT CAST($k AS BIGINT) AS merges_applied, n_$k AS corpus_tokens, " +
        s"n_0 AS baseline_syms FROM agg").mkString("\n      UNION ALL ")
    s"""
    WITH $sqlTrainingCtes,
    m AS (SELECT $pivots FROM ($unionAll)),
    agg AS (
      SELECT ${(0 to MergeRounds).map(nK).mkString(",\n        ")}
      FROM documents CROSS JOIN m)
    SELECT merges_applied, corpus_tokens, baseline_syms,
      (corpus_tokens * 1000000) // baseline_syms AS compression_ppm
    FROM ($rows)"""
  }

  def defs: Map[String, QueryDef] = Map(
    "bpe_merges" -> QueryDef.sql(bpeMerges, bpeMergesOracle),
    "bpe_encode" -> QueryDef.sql(bpeEncode, bpeEncodeOracle),
    "bpe_compression_curve" ->
      QueryDef.sql(bpeCompressionCurve, bpeCompressionCurveOracle)
  )
}
