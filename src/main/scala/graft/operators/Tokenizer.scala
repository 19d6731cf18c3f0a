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
    // The curve's sums factor through the DISTINCT-word vocabulary:
    // n_k = Σ_words cnt(word) · |enc_k(word)|, and enc_k = fold(enc_{k-1})
    // — so each distinct word is folded ONCE per merge level (3 folds)
    // instead of the per-OCCURRENCE, per-PREFIX 0+1+2+3 = 6 folds the
    // doc-scan form paid (guide §1.2 / §2.3: aggregate to the small
    // domain before the expensive per-row work — the Heaps-law
    // vocabulary is sublinear in the corpus). Each intermediate symbol
    // column is referenced twice (its own count + the next level's
    // input), which keeps CollapseProject from inlining the fold into
    // the lambda (the lm_score/hapax materialization rule). All counts
    // are exact BIGINTs, so regrouping by word cannot move a bit.
    val vocab = Tables.documents(spark, dir)
      .select(explode(split(col("text"), "\\s+")).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
    val base = vocab.crossJoin(broadcast(mrow))
      .withColumn("sym0",
        array_join(regexp_extract_all(col("word"), lit("."), lit(0)), " "))
    val leveled = (1 to MergeRounds).foldLeft(base) { (df, i) =>
      df.withColumn(s"sym$i",
        mergeFold(col(s"sym${i - 1}"), col(s"l$i"), col(s"r$i")))
    }
    def nK(k: Int): Column =
      sum(col("cnt") * size(split(col(s"sym$k"), " ")).cast("long"))
    val row = leveled.agg(nK(0).as("n_0"),
      (1 to MergeRounds).map(k => nK(k).as(s"n_$k")): _*)
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

  // ------------------------------------------------------------------
  // Unigram-LM tokenizer (Kudo 2018, "Subword Regularization" §3 /
  // SentencePiece): the OTHER subword family next to BPE — instead of
  // greedily growing merges, hold a candidate piece vocabulary, segment
  // every word by Viterbi under the current piece scores, re-estimate
  // scores from the segmentation counts (hard EM), and PRUNE the
  // vocabulary, repeating for [[UnigramRounds]] deterministic rounds.
  //
  // Exactness discipline: Kudo's Viterbi maximizes Σ log p(piece) —
  // libm log is not FP-portable (the tfidf/lm_score rule), so the
  // objective here is the integer surrogate (fewest pieces, then
  // highest summed piece frequency, then shortest final piece): the
  // same "prefer big, frequent pieces" pressure, exactly comparable in
  // BIGINT in both engines. The EM structure (segment → recount →
  // re-score → prune, chars never pruned so every word stays
  // segmentable) is Kudo's; only the arithmetic is the surrogate.
  //
  // Each Viterbi DP value packs (pieces, saturated total freq,
  // backpointer length) into ONE BIGINT —
  //   cost = ((np << 40) + (2^40 − 1 − min(tf, 2^40 − 1))) << 3 + l —
  // so "better" is simply "smaller", LEAST folds candidates (engines
  // agree NULL-skipping semantics), and decode is exact shifts/masks.
  // Headroom: np < 2^20 and tf saturates at 2^40 − 1 ≈ 1.1e12 — a
  // piece would need ~1.1e12 corpus occurrences to saturate, and
  // saturation degrades only the TIE-BREAK, identically in both
  // engines.
  // ------------------------------------------------------------------

  /** Max candidate piece length (SentencePiece's
    * max_sentencepiece_length, scaled to the corpus' short words). */
  private val MaxPieceLen = 4

  /** Multi-char pieces kept at seeding and per prune round; single
    * chars are ALWAYS kept (Kudo: the vocabulary must keep every word
    * coverable). */
  private val VocabKeep = 512

  /** Hard-EM rounds (the kmeans-3-Lloyd / MergeRounds precedent:
    * enough to prove the iteration live, bounded so the oracle chains
    * one CTE block per round). */
  private val UnigramRounds = 2

  private val TfBits = 40
  private val TfSat = (1L << TfBits) - 1

  /** The packed-cost Viterbi DP over one word: returns the BIGINT dp
    * array (position p at index p+1), reading piece scores from the
    * broadcast one-row map column `vm`. Candidates at position i try
    * lengths 1..[[MaxPieceLen]]; a piece absent from the vocabulary
    * yields NULL and LEAST skips it; the length-1 candidate always
    * exists (chars are never pruned), so every position is reachable.
    */
  private def dpCol(word: Column): Column = {
    val start = lit(TfSat * 8L)
    aggregate(sequence(lit(1), length(word)), array(start), (acc, i) => {
      val cands = (1 to MaxPieceLen).map { l =>
        val prev = element_at(acc, (i - lit(l - 1)).cast("int"))
        val piece = word.substr(i - lit(l - 1), lit(l))
        val f = element_at(col("vm"), piece)
        val core = shiftright(prev, 3)
        val pnp = shiftright(core, TfBits)
        val ptf = lit(TfSat) - core.bitwiseAND(lit(TfSat))
        when(i >= l && f.isNotNull,
          (shiftleft(pnp + 1L, TfBits)
            + (lit(TfSat) - least(ptf + f, lit(TfSat)))) * 8L + lit(l.toLong))
      }
      concat(acc, array(least(cands: _*)))
    })
  }

  /** Token count of one word under the current vocabulary — the np
    * field of the final dp entry; 0 for the empty word (split() can
    * emit one; the DP fold must not run on it — Spark `sequence(1, 0)`
    * DESCENDS instead of emptying). */
  private def npCol(word: Column): Column =
    when(length(word) === 0, lit(0L))
      .otherwise(shiftright(shiftright(
        element_at(dpCol(word), length(word) + 1), 3), TfBits))

  /** The Viterbi segmentation's cut positions (ascending, 0..len) via
    * the dp backpointers — walked with a bounded fold (each step moves
    * one backpointer; ≤ len steps). Requires columns `word` and `dp`.
    */
  private def cutsCol: Column = {
    val wlen = length(col("word")).cast("int")
    aggregate(sequence(lit(1), length(col("word"))),
      struct(wlen.as("pos"), array(wlen).as("cs")),
      (acc, _) => {
        val pos = acc.getField("pos")
        val back = element_at(col("dp"), pos + 1).bitwiseAND(lit(7L)).cast("int")
        when(pos > 0,
          struct((pos - back).as("pos"),
            concat(array(pos - back), acc.getField("cs")).as("cs")))
          .otherwise(acc)
      },
      acc => acc.getField("cs"))
  }

  /** The pieces named by consecutive cut positions. */
  private def piecesCol: Column =
    transform(sequence(lit(1), size(col("cuts")) - 1), j =>
      col("word").substr(element_at(col("cuts"), j) + 1,
        element_at(col("cuts"), (j + 1).cast("int"))
          - element_at(col("cuts"), j)))

  /** One-row broadcastable piece→score map — the entire model state
    * (≤ [[VocabKeep]] + alphabet entries), the reason the corpus never
    * shuffles for this family. */
  private def vocabMap(vocab: DataFrame): DataFrame =
    vocab.agg(map_from_entries(
      collect_list(struct(col("piece"), col("freq")))).as("vm"))

  /** Distinct-word frequency aggregate — the ONE corpus pass the whole
    * unigram family trains on (the bpeMerges discipline). */
  private def wordCounts(documents: DataFrame): DataFrame = documents
    .select(explode(split(col("text"), "\\s+")).as("word"))
    .filter(length(col("word")) >= 1)
    .groupBy(col("word")).agg(count(lit(1)).as("cnt"))

  /** The trained vocabulary after seeding + [[UnigramRounds]] hard-EM
    * rounds, as (piece, freq). Seeding enumerates every ≤
    * [[MaxPieceLen]]-char substring of the DISTINCT words (weighted by
    * word frequency — SentencePiece seeds from frequent substrings the
    * same way, via suffix arrays) and keeps all single chars plus the
    * top [[VocabKeep]] multi-char pieces (freq DESC, piece ASC — total
    * order). Each EM round: Viterbi-segment the distinct words under
    * the current scores, recount pieces from the segmentations (hard
    * expected counts), then prune again — chars keep their (possibly
    * zero) new counts, multi-char pieces must have been USED to
    * survive.
    *
    * Scale: everything after the word-count aggregate is
    * VOCABULARY-scale (Heaps-law sublinear): the DP fold runs per
    * DISTINCT word against the broadcast piece map, counts shuffle
    * |pieces|-bounded rows, prune is a TakeOrdered. Per-round
    * checkpoints keep plans constant-depth (the kmeans discipline).
    */
  private[graft] def unigramVocab(documents: DataFrame): DataFrame = {
    val words = graft.functions.Iterate.checkpoint(wordCounts(documents))
    val sub = words
      .select(col("word"), col("cnt"),
        explode(sequence(lit(1), length(col("word")))).as("i"))
      .select(col("word"), col("cnt"), col("i"),
        explode(sequence(lit(1), lit(MaxPieceLen))).as("l"))
      .filter(col("i") + col("l") - 1 <= length(col("word")))
      .select(col("word").substr(col("i"), col("l")).as("piece"), col("cnt"))
      .groupBy(col("piece")).agg(sum(col("cnt")).as("freq"))
    val sub0 = graft.functions.Iterate.checkpoint(sub)
    val seed = sub0.filter(length(col("piece")) === 1)
      .unionByName(sub0.filter(length(col("piece")) >= 2)
        .orderBy(col("freq").desc, col("piece").asc).limit(VocabKeep))
    (1 to UnigramRounds).foldLeft(
        graft.functions.Iterate.checkpoint(seed)) { (vocab, _) =>
      val seg = words.crossJoin(broadcast(vocabMap(vocab)))
        .withColumn("dp", dpCol(col("word")))
        .withColumn("cuts", cutsCol)
        .select(col("cnt"), explode(piecesCol).as("piece"))
      val counts = graft.functions.Iterate.checkpoint(
        seg.groupBy(col("piece")).agg(sum(col("cnt")).as("freq")))
      val chars = vocab.filter(length(col("piece")) === 1)
        .select(col("piece"))
        .join(counts, Seq("piece"), "left")
        .select(col("piece"), coalesce(col("freq"), lit(0L)).as("freq"))
      val multi = counts.filter(length(col("piece")) >= 2)
        .orderBy(col("freq").desc, col("piece").asc).limit(VocabKeep)
      graft.functions.Iterate.checkpoint(chars.unionByName(multi))
    }
  }

  /** Unigram-LM tokenizer training ([[unigramVocab]]): the top-20
    * learned pieces by final hard-EM count (count DESC, piece ASC —
    * total order), with rank and length — the head of the piece table
    * a SentencePiece model ships, and the human-readable "what did it
    * learn" report next to [[bpeMerges]]' merge table.
    */
  def unigramTrain(spark: SparkSession, dir: String): DataFrame = {
    val top = unigramVocab(Tables.documents(spark, dir))
      .orderBy(col("freq").desc, col("piece").asc).limit(20)
    // post-LIMIT rank: the window rides a ≤20-row frame
    top.withColumn("rank",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("freq").desc, col("piece").asc)).cast("bigint"))
      .select(col("rank"), col("piece"),
        length(col("piece")).cast("bigint").as("piece_len"), col("freq"))
  }

  /** Encode the corpus with the trained unigram vocabulary — the
    * [[bpeEncode]] contract (per-document token count vs the
    * character-symbol baseline and the bought compression), with the
    * Viterbi np per word computed INLINE per row against the broadcast
    * piece map: one corpus scan, zero corpus shuffles (the oracle
    * instead joins per-distinct-word np — same values, the engine path
    * is the one that must scale).
    */
  def unigramEncode(spark: SparkSession, dir: String): DataFrame =
    unigramEncodeWith(Tables.documents(spark, dir),
      vocabMap(unigramVocab(Tables.documents(spark, dir))))

  /** [[unigramEncode]] against an already-trained piece map —
    * [[tokenizerCompare]] shares ONE training across the unigram and
    * wordpiece encodes instead of running the hard-EM chain twice.
    */
  private def unigramEncodeWith(documents: DataFrame, vm: DataFrame)
      : DataFrame =
    documents
      .crossJoin(broadcast(vm))
      .select(col("doc_id"),
        length(regexp_replace(col("text"), "\\s+", "")).cast("bigint")
          .as("n_char_syms"),
        aggregate(split(col("text"), "\\s+"), lit(0L), (acc, word) =>
          acc + npCol(word)).as("n_unigram_tokens"))
      .withColumn("compression",
        col("n_unigram_tokens").cast("double")
          / col("n_char_syms").cast("double"))

  /** Greedy step length at `pos` (0-based chars consumed): the LONGEST
    * vocabulary hit among the next 1..[[MaxPieceLen]] chars — the
    * WordPiece inference rule (Schuster & Nakajima 2012; BERT's
    * tokenizer), which never looks ahead. Single chars are always in
    * the vocabulary, so the step is ≥ 1 and every word encodes.
    */
  private def greedyStepCol(word: Column, pos: Column): Column =
    // ascending fold so the LONGEST candidate ends up outermost in the
    // nested conditional — a descending fold would nest l=2 outermost
    // and silently turn this into shortest-match
    (2 to MaxPieceLen).foldLeft(lit(1)) { (shorter, l) =>
      when(length(word) - pos >= l
          && element_at(col("vm"), word.substr(pos + 1, lit(l))).isNotNull,
        lit(l)).otherwise(shorter)
    }

  /** Token count of one word under greedy longest-match-first — the
    * [[npCol]] counterpart without the DP: a bounded fold advancing
    * (pos, n) one piece per step (≤ len steps; identity once consumed).
    */
  private def greedyNpCol(word: Column): Column =
    when(length(word) === 0, lit(0L))
      .otherwise(aggregate(sequence(lit(1), length(word)),
        struct(lit(0).as("pos"), lit(0L).as("n")),
        (acc, _) => {
          val pos = acc.getField("pos")
          when(pos >= length(word), acc)
            .otherwise(struct((pos + greedyStepCol(word, pos)).as("pos"),
              (acc.getField("n") + 1L).as("n")))
        },
        acc => acc.getField("n")))

  /** Encode the corpus with WordPiece GREEDY longest-match-first over
    * the SAME trained unigram vocabulary — the third tokenizer family's
    * inference rule beside BPE's merge replay and unigram's Viterbi,
    * sharing the vocabulary so the comparison isolates the SEGMENTER:
    * greedy never beats Viterbi on piece count (Viterbi minimizes it by
    * construction — R15OpsSpec pins ≥ per document) but runs without
    * backpointers, which is why serving-side tokenizers ship it. Same
    * scale shape as [[unigramEncode]]: one corpus scan against the
    * broadcast piece map, zero corpus shuffles.
    */
  def wordpieceEncode(spark: SparkSession, dir: String): DataFrame =
    wordpieceEncodeWith(Tables.documents(spark, dir),
      vocabMap(unigramVocab(Tables.documents(spark, dir))))

  /** [[wordpieceEncode]] against an already-trained piece map (see
    * [[unigramEncodeWith]]).
    */
  private def wordpieceEncodeWith(documents: DataFrame, vm: DataFrame)
      : DataFrame =
    documents
      .crossJoin(broadcast(vm))
      .select(col("doc_id"),
        length(regexp_replace(col("text"), "\\s+", "")).cast("bigint")
          .as("n_char_syms"),
        aggregate(split(col("text"), "\\s+"), lit(0L), (acc, word) =>
          acc + greedyNpCol(word)).as("n_wordpiece_tokens"))
      .withColumn("compression",
        col("n_wordpiece_tokens").cast("double")
          / col("n_char_syms").cast("double"))

  /** The greedy walk as a RECURSIVE CTE per distinct word (the uwk
    * pattern — greedy is exactly the early-exit iteration shape the
    * LIST_REDUCE hazard note forbids as a fold): (pos, n) advances one
    * piece per recursion level, np is the final n. Requires `uw` and
    * the trained vocabulary from [[sqlUnigramCtes]]; builds its own
    * one-row piece map (`gmf`) so the chain composes without
    * [[sqlEncodeCtes]]' per-word DP.
    */
  private def sqlGreedyCtes: String = {
    // ascending fold for the same longest-first nesting as the engine
    val step = (2 to MaxPieceLen).foldLeft("1") { (shorter, l) =>
      s"""CASE WHEN LEN(word) - pos >= $l AND
        map_extract(vm, SUBSTR(word, CAST(pos + 1 AS INT), $l))[1]
          IS NOT NULL THEN $l ELSE $shorter END"""
    }
    s"""
    gmf AS (SELECT MAP(LIST(piece ORDER BY piece), LIST(freq ORDER BY piece)) AS vm
            FROM uv${UnigramRounds + 1}),
    gwk AS (
      SELECT word, CAST(0 AS BIGINT) AS pos, CAST(0 AS BIGINT) AS n
      FROM uw
      UNION ALL
      SELECT word, pos + step, n + 1 FROM (
        SELECT word, pos, n, $step AS step
        FROM gwk CROSS JOIN gmf WHERE pos < LEN(word))),
    gnp AS MATERIALIZED (
      SELECT word, MAX(n) AS np FROM gwk GROUP BY 1),
    gtok AS (
      SELECT d.doc_id, CAST(SUM(COALESCE(n.np, 0)) AS BIGINT)
          AS n_wordpiece_tokens
      FROM (SELECT doc_id, UNNEST(STRING_SPLIT_REGEX(text, '\\s+')) AS word
            FROM documents) d
      LEFT JOIN gnp n ON d.word = n.word
      GROUP BY 1)"""
  }

  val wordpieceEncodeOracle: String = s"""
    WITH RECURSIVE $sqlUnigramCtes, $sqlGreedyCtes
    SELECT c.doc_id,
      CAST(LENGTH(REGEXP_REPLACE(c.text, '\\s+', '', 'g')) AS BIGINT)
        AS n_char_syms,
      t.n_wordpiece_tokens,
      CAST(t.n_wordpiece_tokens AS DOUBLE)
        / CAST(LENGTH(REGEXP_REPLACE(c.text, '\\s+', '', 'g')) AS DOUBLE)
        AS compression
    FROM documents c JOIN gtok t ON c.doc_id = t.doc_id"""

  /** The two tokenizer families side by side on the SAME corpus: total
    * character-symbol baseline, total BPE tokens (after the learned
    * [[MergeRounds]] merges) and total unigram tokens (under the
    * trained [[VocabKeep]]-piece vocabulary), with exact ppm
    * compressions — the table a tokenizer team reads before picking a
    * family (BPE's 3 merges barely dent the corpus; the 512-piece
    * unigram vocabulary roughly halves it — vocabulary SIZE, not
    * family, dominates at these scales, which is exactly what the
    * comparison is for).
    */
  def tokenizerCompare(spark: SparkSession, dir: String): DataFrame = {
    // ONE unigram training shared by the Viterbi and greedy encodes
    // (guide §1.2 — don't compute things twice): the hard-EM chain is
    // deterministic, so the shared vocab is the one each encode would
    // have trained itself.
    val docs = Tables.documents(spark, dir)
    val vm = vocabMap(unigramVocab(docs))
    val b = bpeEncode(spark, dir).agg(
      sum(col("n_char_syms")).as("n_char_syms"),
      sum(col("n_bpe_tokens")).as("n_bpe_tokens"))
    val u = unigramEncodeWith(docs, vm).agg(
      sum(col("n_unigram_tokens")).as("n_unigram_tokens"))
    val w = wordpieceEncodeWith(docs, vm).agg(
      sum(col("n_wordpiece_tokens")).as("n_wordpiece_tokens"))
    b.crossJoin(u).crossJoin(w)
      .select(col("n_char_syms"), col("n_bpe_tokens"),
        col("n_unigram_tokens"), col("n_wordpiece_tokens"),
        expr("(n_bpe_tokens * 1000000) div n_char_syms").as("bpe_ppm"),
        expr("(n_unigram_tokens * 1000000) div n_char_syms").as("unigram_ppm"),
        expr("(n_wordpiece_tokens * 1000000) div n_char_syms")
          .as("wordpiece_ppm"))
  }

  // --- Unigram oracle SQL (mirrors the Scala constants/mechanics;
  // the DP acc is a comma-joined VARCHAR because DuckDB's LIST_REDUCE
  // fixes the acc type to the element type — the LIST_PREPEND('', ...)
  // trick from the BPE oracles, applied to integer DP) ---

  private def sqlMinCand(acc: String, i: String): String = {
    val cands = (1 to MaxPieceLen).map { l =>
      val prev = s"CAST(STRING_SPLIT($acc, ',')[CAST($i - $l + 1 AS INT)] AS BIGINT)"
      val piece = s"SUBSTR(word, CAST($i - $l + 1 AS INT), $l)"
      val f = s"map_extract(vm, $piece)[1]"
      val core = s"($prev >> 3)"
      val pnp = s"($core >> $TfBits)"
      val ptf = s"($TfSat - ($core & $TfSat))"
      s"""CASE WHEN $i >= $l AND $f IS NOT NULL THEN
        ((($pnp + 1) << $TfBits) + ($TfSat - LEAST($ptf + $f, $TfSat))) * 8 + $l END"""
    }
    s"LEAST(${cands.mkString(", ")})"
  }

  private def sqlDp: String = {
    val start = TfSat * 8L
    s"""LIST_REDUCE(LIST_PREPEND('$start', LIST_TRANSFORM(RANGE(1, LEN(word) + 1),
      x -> CAST(x AS VARCHAR))), (acc, iv) -> acc || ',' ||
      CAST(${sqlMinCand("acc", "CAST(iv AS BIGINT)")} AS VARCHAR))"""
  }

  /** One hard-EM oracle round. The Viterbi WALK is a RECURSIVE CTE
    * stepping (pos → pos − backptr) per word — NOT a LIST_REDUCE fold:
    * DuckDB 1.0.0 mis-aligns rows in list_reduce when rows take a
    * conditional identity branch at differing iteration counts (the dp
    * fold is safe — its lambda appends unconditionally — but a
    * walk-style early-exit fold returns another row's value; pinned by
    * the r15 debug repro, 'abcde' walking 'ab''s dp). The recursion
    * emits each segment piece directly: the base row is the LAST piece
    * and each step the one before it.
    */
  private def sqlEmRound(r: Int): String = s"""
    um$r AS (SELECT MAP(LIST(piece ORDER BY piece), LIST(freq ORDER BY piece)) AS vm FROM uv$r),
    udp$r AS MATERIALIZED (
      SELECT word, cnt, $sqlDp AS dp FROM uw CROSS JOIN um$r),
    uwk$r AS (
      SELECT word, cnt, dp, CAST(LEN(word) AS BIGINT) AS pos,
        CAST(STRING_SPLIT(dp, ',')[CAST(LEN(word) + 1 AS INT)] AS BIGINT) & 7 AS l
      FROM udp$r
      UNION ALL
      SELECT word, cnt, dp, pos - l,
        CAST(STRING_SPLIT(dp, ',')[CAST(pos - l + 1 AS INT)] AS BIGINT) & 7
      FROM uwk$r WHERE pos - l > 0),
    ucnt$r AS MATERIALIZED (
      SELECT piece, CAST(SUM(cnt) AS BIGINT) AS freq
      FROM (SELECT cnt,
              SUBSTR(word, CAST(pos - l + 1 AS INT), CAST(l AS INT)) AS piece
            FROM uwk$r)
      GROUP BY 1),
    uv${r + 1} AS MATERIALIZED (
      SELECT v.piece, COALESCE(c.freq, 0) AS freq
      FROM (SELECT piece FROM uv$r WHERE LEN(piece) = 1) v
      LEFT JOIN ucnt$r c ON v.piece = c.piece
      UNION ALL
      SELECT piece, freq FROM (
        SELECT piece, freq FROM ucnt$r WHERE LEN(piece) >= 2
        ORDER BY freq DESC, piece ASC LIMIT $VocabKeep))"""

  /** The unigram training CTE chain, ending at the trained vocabulary
    * `uv${UnigramRounds + 1}`. Shared by the three unigram oracles. */
  private def sqlUnigramCtes: String = s"""uw AS MATERIALIZED (
      SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM (SELECT UNNEST(STRING_SPLIT_REGEX(text, '\\s+')) AS word
            FROM documents)
      WHERE LEN(word) >= 1 GROUP BY 1),
    usub AS MATERIALIZED (
      SELECT SUBSTR(word, CAST(i AS INT), CAST(l AS INT)) AS piece,
        CAST(SUM(cnt) AS BIGINT) AS freq
      FROM (SELECT word, cnt, UNNEST(RANGE(1, LEN(word) + 1)) AS i FROM uw),
        (SELECT UNNEST(RANGE(1, $MaxPieceLen + 1)) AS l)
      WHERE i + l - 1 <= LEN(word)
      GROUP BY 1),
    uv1 AS MATERIALIZED (
      SELECT piece, freq FROM usub WHERE LEN(piece) = 1
      UNION ALL
      SELECT piece, freq FROM (
        SELECT piece, freq FROM usub WHERE LEN(piece) >= 2
        ORDER BY freq DESC, piece ASC LIMIT $VocabKeep)),""" +
    (1 to UnigramRounds).map(sqlEmRound).mkString(",")

  val unigramTrainOracle: String = s"""
    WITH RECURSIVE $sqlUnigramCtes
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY freq DESC, piece ASC) AS BIGINT)
        AS rank,
      piece, CAST(LEN(piece) AS BIGINT) AS piece_len, freq
    FROM (SELECT piece, freq FROM uv${UnigramRounds + 1}
          ORDER BY freq DESC, piece ASC LIMIT 20)"""

  /** Per-distinct-word np under the trained vocabulary plus the
    * per-document join — the oracle's cheap equivalent of the engine's
    * inline per-row DP (same np per word either way). */
  private def sqlEncodeCtes: String = s"""
    umf AS (SELECT MAP(LIST(piece ORDER BY piece), LIST(freq ORDER BY piece)) AS vm
            FROM uv${UnigramRounds + 1}),
    unp AS MATERIALIZED (
      SELECT word,
        (CAST(STRING_SPLIT(dp, ',')[CAST(LEN(word) + 1 AS INT)] AS BIGINT) >> 3)
          >> $TfBits AS np
      FROM (SELECT word, $sqlDp AS dp FROM uw CROSS JOIN umf)),
    utok AS (
      SELECT d.doc_id, CAST(SUM(COALESCE(n.np, 0)) AS BIGINT) AS n_unigram_tokens
      FROM (SELECT doc_id, UNNEST(STRING_SPLIT_REGEX(text, '\\s+')) AS word
            FROM documents) d
      LEFT JOIN unp n ON d.word = n.word
      GROUP BY 1)"""

  val unigramEncodeOracle: String = s"""
    WITH RECURSIVE $sqlUnigramCtes, $sqlEncodeCtes
    SELECT c.doc_id,
      CAST(LENGTH(REGEXP_REPLACE(c.text, '\\s+', '', 'g')) AS BIGINT)
        AS n_char_syms,
      t.n_unigram_tokens,
      CAST(t.n_unigram_tokens AS DOUBLE)
        / CAST(LENGTH(REGEXP_REPLACE(c.text, '\\s+', '', 'g')) AS DOUBLE)
        AS compression
    FROM documents c JOIN utok t ON c.doc_id = t.doc_id"""

  val tokenizerCompareOracle: String = {
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
    val unionAll = (1 to MergeRounds).map(i =>
      s"SELECT $i AS merge_rank, lhs, rhs, freq FROM t$i").mkString(" UNION ALL ")
    val pivots = (1 to MergeRounds).map(i =>
      s"MAX(CASE WHEN merge_rank = $i THEN lhs END) AS l$i, " +
        s"MAX(CASE WHEN merge_rank = $i THEN rhs END) AS r$i").mkString(", ")
    s"""
    WITH RECURSIVE $sqlTrainingCtes,
    $sqlUnigramCtes, $sqlEncodeCtes, $sqlGreedyCtes,
    m AS (SELECT $pivots FROM ($unionAll)),
    bpe AS (
      SELECT CAST(SUM(LENGTH(REGEXP_REPLACE(text, '\\s+', '', 'g'))) AS BIGINT)
          AS n_char_syms,
        CAST(SUM(COALESCE(LIST_SUM(LIST_TRANSFORM(
          STRING_SPLIT_REGEX(text, '\\s+'), word ->
            LEN(STRING_SPLIT($enc, ' ')))), 0)) AS BIGINT) AS n_bpe_tokens
      FROM documents CROSS JOIN m),
    uni AS (
      SELECT CAST(SUM(n_unigram_tokens) AS BIGINT) AS n_unigram_tokens
      FROM utok),
    wp AS (
      SELECT CAST(SUM(n_wordpiece_tokens) AS BIGINT) AS n_wordpiece_tokens
      FROM gtok)
    SELECT n_char_syms, n_bpe_tokens, n_unigram_tokens, n_wordpiece_tokens,
      (n_bpe_tokens * 1000000) // n_char_syms AS bpe_ppm,
      (n_unigram_tokens * 1000000) // n_char_syms AS unigram_ppm,
      (n_wordpiece_tokens * 1000000) // n_char_syms AS wordpiece_ppm
    FROM bpe CROSS JOIN uni CROSS JOIN wp"""
  }


  def defs: Map[String, QueryDef] = Map(
    "bpe_merges" -> QueryDef.sql(bpeMerges, bpeMergesOracle),
    "bpe_encode" -> QueryDef.sql(bpeEncode, bpeEncodeOracle),
    "bpe_compression_curve" ->
      QueryDef.sql(bpeCompressionCurve, bpeCompressionCurveOracle),
    "unigram_train" -> QueryDef.sql(unigramTrain, unigramTrainOracle),
    "unigram_encode" -> QueryDef.sql(unigramEncode, unigramEncodeOracle),
    "wordpiece_encode" -> QueryDef.sql(wordpieceEncode, wordpieceEncodeOracle),
    "tokenizer_compare" ->
      QueryDef.sql(tokenizerCompare, tokenizerCompareOracle)
  )
}
