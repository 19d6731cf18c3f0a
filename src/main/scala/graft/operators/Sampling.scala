package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic sampling & dataset splitting (§2.E adjunct) — the two
  * selection operators every training-data pipeline runs before training.
  *
  * Both derive the decision from a salted md5 of the row's natural key
  * instead of `rand()`: reproducible across runs, retries and engines
  * (a re-run of a 100 TB sample yields the SAME rows — rand() cannot),
  * shardable (no RNG state coordination across executors), and
  * oracle-checkable. `TABLESAMPLE` / `rand() < p` are the
  * non-reproducible alternatives; hash-mod sampling is the production
  * idiom (same trick as A/B bucketing).
  */
object Sampling {

  /** hash-mod bucket in [0, 100): the portable 24-bit hash
    * ([[graft.functions.TextOps.hash24]]) of salt|key, mod 100.
    */
  private def pctBucket(salt: String, key: org.apache.spark.sql.Column) =
    graft.functions.TextOps.hash24(
      concat(lit(salt), lit("|"), key.cast("string"))) % 100

  private def sqlPctBucket(salt: String, key: String) =
    s"CAST('0x' || SUBSTR(MD5('$salt' || '|' || CAST($key AS VARCHAR)), 1, 6) AS BIGINT) % 100"

  /** Stratified sample: per-language sampling rates (the "rebalance the
    * corpus mix" step — downsample the dominant language, keep the rest).
    * Rates ride a broadcast map; selection is the hash-mod test.
    */
  private val strataRates: Seq[(String, Int)] =
    Seq("en" -> 10, "de" -> 25, "fr" -> 25)
  private val defaultRate = 50

  def sampleStratified(spark: SparkSession, dir: String): DataFrame = {
    val rates = spark.createDataFrame(strataRates).toDF("rate_lang", "rate_pct")
    Tables.documents(spark, dir)
      .join(broadcast(rates), col("lang") === col("rate_lang"), "left")
      .withColumn("rate", coalesce(col("rate_pct"), lit(defaultRate)))
      .filter(pctBucket("sample", col("doc_id")) < col("rate"))
      .select(col("doc_id"), col("lang"), col("rate"))
  }

  val sampleStratifiedOracle: String = {
    val values = strataRates.map { case (l, p) => s"('$l', $p)" }.mkString(", ")
    s"""
    SELECT doc_id, lang, rate FROM (
      SELECT doc_id, lang, COALESCE(r.rate_pct, $defaultRate) AS rate
      FROM documents
      LEFT JOIN (VALUES $values) AS r(rate_lang, rate_pct) ON lang = rate_lang)
    WHERE ${sqlPctBucket("sample", "doc_id")} < rate"""
  }

  /** Train/val/test split: 80/10/10 by a differently-salted hash (the
    * salt decorrelates the split from any sampling decision). Every row
    * gets exactly one deterministic assignment — re-running a backfill
    * cannot move a document across splits.
    */
  def datasetSplit(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("bucket", pctBucket("split", col("doc_id")))
      .select(col("doc_id"),
        when(col("bucket") < 80, lit("train"))
          .when(col("bucket") < 90, lit("val"))
          .otherwise(lit("test")).as("split"))

  val datasetSplitOracle: String = s"""
    SELECT doc_id,
      CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val' ELSE 'test' END AS split
    FROM (SELECT doc_id, ${sqlPctBucket("split", "doc_id")} AS b FROM documents)"""

  /** Reproducibility manifest — the attestation a released training set
    * ships with: per (split, source), doc count, token count, and an
    * ORDER-INDEPENDENT content digest (bit_xor of per-doc 24-bit text
    * hashes — xor is commutative/associative, so any partitioning or
    * row order yields the same digest, and a single changed/dropped doc
    * flips it). Re-run after any pipeline change: equal manifests ⇒
    * bit-identical corpus without comparing 100 TB row-by-row. One
    * corpus scan + one |splits|·|sources| aggregate.
    */
  def datasetManifest(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .withColumn("bucket", pctBucket("split", col("doc_id")))
      .select(
        when(col("bucket") < 80, lit("train"))
          .when(col("bucket") < 90, lit("val"))
          .otherwise(lit("test")).as("split"),
        col("source"),
        size(split(col("text"), "\\s+")).cast("bigint").as("n_tokens"),
        graft.functions.TextOps.hash24(col("text")).as("h"))
    docs.groupBy(col("split"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        expr("bit_xor(h)").as("content_digest"))
  }

  val datasetManifestOracle: String = s"""
    SELECT
      CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val' ELSE 'test' END AS split,
      source,
      COUNT(*) AS n_docs,
      CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
      BIT_XOR(h) AS content_digest
    FROM (
      SELECT ${sqlPctBucket("split", "doc_id")} AS b, source,
        CAST(LEN(STRING_SPLIT_REGEX(text, '\\s+')) AS BIGINT) AS n_tokens,
        CAST('0x' || SUBSTR(MD5(text), 1, 6) AS BIGINT) AS h
      FROM documents)
    GROUP BY 1, 2"""

  /** The dataset card's composition table — what every released corpus
    * documents: per (split × source), document count, whitespace-token
    * count, and the row's share of its split in ppm (all-integer).
    * Composes [[datasetSplit]]'s salted assignment with per-doc token
    * counts in ONE corpus scan + one |splits|·|sources| aggregate; the
    * per-split totals broadcast for the share division.
    */
  def datasetCard(spark: SparkSession, dir: String): DataFrame = {
    val cm = Tables.documents(spark, dir)
      .withColumn("bucket", pctBucket("split", col("doc_id")))
      .select(
        when(col("bucket") < 80, lit("train"))
          .when(col("bucket") < 90, lit("val"))
          .otherwise(lit("test")).as("split"),
        col("source"),
        size(split(col("text"), "\\s+")).cast("bigint").as("t"))
      .groupBy(col("split"), col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("t")).as("n_tokens"))
    val tot = cm.groupBy(col("split")).agg(sum(col("n_docs")).as("split_docs"))
    cm.join(broadcast(tot), Seq("split"))
      .select(col("split"), col("source"), col("n_docs"), col("n_tokens"),
        expr("(n_docs * 1000000) div split_docs").as("share_ppm"))
  }

  val datasetCardOracle: String = s"""
    WITH cm AS (
      SELECT
        CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val' ELSE 'test' END
          AS split,
        source,
        COUNT(*) AS n_docs,
        SUM(CAST(LEN(STRING_SPLIT_REGEX(text, '\\s+')) AS BIGINT)) AS n_tokens
      FROM (SELECT doc_id, source, text,
              ${sqlPctBucket("split", "doc_id")} AS b FROM documents)
      GROUP BY 1, 2),
    tot AS (SELECT split, SUM(n_docs) AS split_docs FROM cm GROUP BY 1)
    SELECT cm.split, cm.source,
      CAST(cm.n_docs AS BIGINT) AS n_docs,
      CAST(cm.n_tokens AS BIGINT) AS n_tokens,
      CAST((cm.n_docs * 1000000) // t.split_docs AS BIGINT) AS share_ppm
    FROM cm JOIN tot t USING (split)"""

  /** Split-leakage audit — the eval-integrity check a hash split alone
    * cannot give: a random assignment happily puts one member of a
    * near-duplicate pair in train and the other in test, and the model
    * then "generalizes" to text it has effectively seen. This reports
    * every verified near-dup pair (the MinHash+LSH detector's output)
    * grouped by the UNORDERED split pair it straddles; `leaking` rows
    * (split_lo ≠ split_hi) are the pairs an eval-safe pipeline must
    * break by re-assigning or dropping one side — the audit that
    * motivates running dedup BEFORE dataset_split.
    *
    * Scale: the pair set is the near-dup detector's output (duplication
    * density × corpus, far smaller than the corpus) and rides
    * [[graft.Tables.dimHint]] into the two split joins, so the
    * corpus-sized split frame streams map-side while duplication is
    * sparse; past the threshold AQE gets plain doc_id joins. The rollup
    * is a ≤9-group aggregate.
    */
  def splitLeakageAudit(spark: SparkSession, dir: String): DataFrame = {
    val pairs = graft.Tables.dimHint(
      Dedup.dedupMinhashLsh(spark, dir)
        .select(col("doc_a"), col("doc_b")))
    val splits = datasetSplit(spark, dir)
    pairs
      .join(splits.select(col("doc_id").as("doc_a"), col("split").as("split_a")),
        Seq("doc_a"))
      .join(splits.select(col("doc_id").as("doc_b"), col("split").as("split_b")),
        Seq("doc_b"))
      .groupBy(
        least(col("split_a"), col("split_b")).as("split_lo"),
        greatest(col("split_a"), col("split_b")).as("split_hi"))
      .agg(count(lit(1)).as("n_pairs"))
      .select(col("split_lo"), col("split_hi"), col("n_pairs"),
        (col("split_lo") =!= col("split_hi")).as("leaking"))
  }

  val splitLeakageAuditOracle: String = s"""
    WITH pairs AS (${Dedup.dedupMinhashLshOracle}),
    sp AS ($datasetSplitOracle)
    SELECT LEAST(sa.split, sb.split) AS split_lo,
      GREATEST(sa.split, sb.split) AS split_hi,
      COUNT(*) AS n_pairs,
      LEAST(sa.split, sb.split) != GREATEST(sa.split, sb.split) AS leaking
    FROM pairs p
    JOIN sp sa ON p.doc_a = sa.doc_id
    JOIN sp sb ON p.doc_b = sb.doc_id
    GROUP BY 1, 2"""

  /** Deterministic source interleave: a global training-read order that
    * round-robins across sources while shuffling WITHIN each source by
    * salted hash — the "mix the corpus so no batch is single-source"
    * step, without rand(). Each doc's position is
    * `(per-source hash rank − 1) · n_sources + source index`: collision
    * free, reproducible, and resumable from any offset.
    *
    * Scale: two window ranks (one per-source shuffle, one tiny
    * source-index rank over a broadcastable distinct-source list) — no
    * global sort of the corpus is ever materialized; a reader sorts by
    * position lazily/range-partitioned.
    */
  def datasetInterleave(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // persisted: read by the index join AND the source-count aggregate —
    // and the count stays IN the plan (a driver-side .count() here would
    // run an eager job at DataFrame-construction time and scan documents
    // twice).
    val srcIdx = Tables.documents(spark, dir)
      .select(col("source")).distinct()
      .withColumn("src_idx",
        row_number().over(Window.orderBy(col("source"))) - 1)
      .transform(graft.functions.PlanGuard.persist(_, allowWindow =
        Some("source-index rank over the ≤|sources| distinct-source frame")))
    val nSrc = srcIdx.agg(count(lit(1)).cast("bigint").as("n_src"))
    val perSource = Window.partitionBy(col("source"))
      .orderBy(graft.functions.TextOps.hash24(
        concat(lit("interleave|"), col("doc_id").cast("string"))).asc,
        col("doc_id").asc)
    Tables.documents(spark, dir)
      .withColumn("rk", row_number().over(perSource))
      .join(broadcast(srcIdx), Seq("source"))
      .crossJoin(broadcast(nSrc))
      .select(col("doc_id"), col("source"),
        ((col("rk") - 1) * col("n_src") + col("src_idx")).cast("bigint").as("position"))
  }

  val datasetInterleaveOracle: String = s"""
    WITH src AS (
      SELECT source,
        ROW_NUMBER() OVER (ORDER BY source) - 1 AS src_idx
      FROM (SELECT DISTINCT source FROM documents)),
    n AS (SELECT COUNT(*) AS n_src FROM src),
    ranked AS (
      SELECT doc_id, source,
        ROW_NUMBER() OVER (PARTITION BY source ORDER BY
          CAST('0x' || SUBSTR(MD5('interleave|' || CAST(doc_id AS VARCHAR)), 1, 6)
            AS BIGINT) ASC, doc_id ASC) AS rk
      FROM documents)
    SELECT doc_id, ranked.source,
      CAST((rk - 1) * n.n_src + src.src_idx AS BIGINT) AS position
    FROM ranked JOIN src ON ranked.source = src.source CROSS JOIN n"""

  /** Temperature-scaled language mixing (the mT5/multilingual-corpus
    * recipe, Xue et al. 2021 §3.1): resample so each stratum's share of
    * the surviving corpus follows p_s ∝ n_s^α with α = 1/2, boosting
    * low-resource languages against the dominant one. With no
    * upsampling (a batch engine cannot mint rows), the exact
    * without-replacement form is: the SMALLEST stratum keeps everything
    * and stratum s keeps rate √(n_min/n_s) — the surviving counts are
    * then √(n_min)·√(n_s) ∝ n_s^α, the temperature distribution
    * exactly. Strata here are `lang` (the only skewed stratum in the
    * corpus — `source` is uniform, and uniform strata make temperature
    * a no-op by construction).
    *
    * FP discipline: α = 1/2 specifically because IEEE-754 `sqrt` is
    * correctly rounded in BOTH engines (JVM Math.sqrt and DuckDB's
    * libm) — unlike `pow`/`log`, which already cost this repo a 1-ulp
    * oracle drift. The keep test multiplies each side once —
    * `h·√n_s < 2²⁴·√n_min` — same operand order both engines, so every
    * intermediate is the identical double and the decision is
    * bit-reproducible at any scale.
    *
    * Scale: ONE corpus scan — the per-lang count (map-side combined, a
    * handful of rows) is eagerly checkpointed so the min folds over the
    * checkpointed rows instead of re-planning the aggregate (exchange
    * reuse does not fire across chained aggregates — without the
    * checkpoint the min branch re-scans the corpus). Both tiny frames
    * broadcast back onto a scan-speed filter; the corpus never shuffles
    * ([[mixRebalance]]'s shape, minus its second corpus fold).
    */
  def sampleTemperature(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val counts = graft.functions.Iterate.checkpoint(
      docs.groupBy(col("lang")).agg(count(lit(1)).as("n_lang")))
    val mn = counts.agg(min(col("n_lang")).as("n_min"))
    docs.join(broadcast(counts), Seq("lang"))
      .crossJoin(broadcast(mn))
      .filter(
        graft.functions.TextOps.hash24(
            concat(lit("temp|"), col("doc_id").cast("string"))).cast("double")
          * sqrt(col("n_lang").cast("double"))
          < lit(16777216.0) * sqrt(col("n_min").cast("double")))
      .select(col("doc_id"), col("lang"), col("n_lang"), col("n_min"))
  }

  val sampleTemperatureOracle: String = """
    WITH counts AS (
      SELECT lang, COUNT(*) AS n_lang FROM documents GROUP BY lang),
    mn AS (SELECT MIN(n_lang) AS n_min FROM counts)
    SELECT doc_id, d.lang, n_lang, n_min
    FROM documents d JOIN counts USING (lang) CROSS JOIN mn
    WHERE CAST(CAST('0x' || SUBSTR(MD5('temp|' || CAST(doc_id AS VARCHAR)), 1, 6)
          AS BIGINT) AS DOUBLE)
        * SQRT(CAST(n_lang AS DOUBLE))
      < 16777216.0 * SQRT(CAST(n_min AS DOUBLE))"""

  /** Target corpus mixture, as percent of the TOTAL corpus each source
    * should contribute after rebalancing (unlisted sources share
    * [[mixDefaultPct]]). src0/src1 are deliberately over-allocated and
    * the rest squeezed — the "re-weight the web crawl against curated
    * sources" step.
    */
  private val mixTargetPct: Seq[(String, Long)] = Seq("src0" -> 4L, "src1" -> 3L)
  private val mixDefaultPct = 1L

  /** Corpus-mixture rebalancing: deterministically downsample each
    * source so its share of the surviving corpus approaches a declared
    * target mix. A document survives iff
    * `bucket · n_source < target_pct · n_total` with bucket ∈ [0,100) —
    * P(keep) = min(1, target_pct·n_total / (100·n_source)), i.e. each
    * source lands ≈ target_pct% of the ORIGINAL corpus volume (capped at
    * its own size). The decision is ALL-INTEGER — no rate division ever
    * happens, so there is no float rounding to disagree across engines,
    * retries, or partitionings; the same 100 TB rebalance reproduces
    * bit-for-bit anywhere (same discipline as [[sampleStratified]], but
    * with the rate derived from observed counts instead of declared
    * per-stratum constants).
    *
    * Scale: one map-side-combinable count per source (tiny — broadcast
    * back), then a scan-speed filter. Nothing shuffles the corpus.
    */
  /** Max epochs granted to the SCARCEST source — the upsampling cap of
    * the temperature plan below (the mT5 recipe caps how often the
    * rarest data may repeat before it memorizes).
    */
  private val BudgetEpochCap = 4.0

  /** Per-source token-budget planner — the "how many epochs of each
    * source does the training run read" table that turns the α = 1/2
    * temperature mix ([[sampleTemperature]]) into an actual token plan:
    * the scarcest source trains [[BudgetEpochCap]] epochs, every other
    * source scales by √(n_min/n_s) (so planned tokens ∝ √n_s — the
    * temperature distribution exactly), and each row reports planned
    * epochs, target tokens, and its exact-ppm share of the implied
    * total budget. Token counts are [[TextAnalysis.tokenCount]]'s
    * BPE-ish regex rule, summed per source.
    *
    * FP discipline: α = 1/2 via correctly-rounded `sqrt` only (the
    * sample_temperature rule); the epoch expression is spelled
    * IDENTICALLY in both engines (`cap·√n_min / √n_s` — the scarcest
    * source divides two equal doubles, so its epochs are EXACTLY the
    * cap), target tokens floor a same-operand-order product to BIGINT,
    * and the share avoids both float division and BIGINT overflow with
    * the gini ppm treatment (multiply-first ≤ 9e12, denominator/1e6
    * past it). No cross-row double sum anywhere — the only cross-source
    * folds are an exact BIGINT min and an exact BIGINT sum.
    *
    * Scale: one corpus scan into a per-source (count, token-sum)
    * aggregate — map-side combined, |sources| rows, checkpointed; the
    * min and budget folds run over the checkpointed frame and broadcast
    * back. Nothing shuffles the corpus.
    */
  def tokenBudgetPlan(spark: SparkSession, dir: String): DataFrame =
    tokenBudgetPlanDf(Tables.documents(spark, dir))

  /** Quality-ordered source frontier — the table a mix designer reads
    * BEFORE committing to a token budget: sources ranked by mean
    * production quality score, with cumulative tokens and cumulative
    * mean quality down the ranking ("taking the top-k sources buys T
    * tokens at average quality Q" — every row is one candidate
    * cutoff; [[tokenBudgetPlan]] then shapes the chosen prefix with
    * √-temperature epochs). The per-doc score is the SHARED
    * [[TextAnalysis.qualityScoreDf]] expression and the token count is
    * the SHARED [[TextAnalysis.BpeTokenRegex]] rule — the unit
    * [[tokenBudgetPlan]] targets, so the frontier's cum_tokens and the
    * plan's target_tokens reconcile row-for-row instead of mixing
    * whitespace and BPE units across a documented pipeline — and the
    * frontier cannot desync from the gates it summarizes. Quality
    * mass folds as
    * DECIMAL(28,6), cross-row AND through the cumulative window —
    * both engines window-sum decimals exactly, where a double cumsum
    * would expose DuckDB's segment-tree association order. Ranking is
    * by the ROUNDED integer mean (source ASC ties), never a raw
    * double. Scale: one scan into |sources| rows; the frontier window
    * runs over that aggregated frame (PlanSpec allowlist).
    */
  def mixQualityFrontier(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    val docs = Tables.documents(spark, dir)
    val scored = TextAnalysis.qualityScoreDf(docs)
      .select(col("doc_id"), col("quality_score"))
      .join(docs.select(col("doc_id"), col("source"),
        TextAnalysis.bpeTokens(col("text")).as("toks")),
        Seq("doc_id"))
    val per = scored.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("toks")).as("tokens"),
        sum(col("quality_score").cast(DecimalType(28, 6))).as("q_dec"))
      .withColumn("mean_q_x1e6",
        floor(col("q_dec").cast("double") / col("n_docs").cast("double")
          * lit(1.0e6) + lit(0.5)).cast("bigint"))
    val w = Window.orderBy(col("mean_q_x1e6").desc, col("source").asc)
    val wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    per
      .withColumn("rank", row_number().over(w).cast("bigint"))
      .withColumn("cum_tokens", sum(col("tokens")).over(wcum))
      .withColumn("cum_docs", sum(col("n_docs")).over(wcum))
      .withColumn("cum_mean_q_x1e6",
        floor(sum(col("q_dec")).over(wcum).cast("double")
          / col("cum_docs").cast("double") * lit(1.0e6) + lit(0.5))
          .cast("bigint"))
      .select(col("source"), col("rank"), col("n_docs"), col("tokens"),
        col("mean_q_x1e6"), col("cum_tokens"), col("cum_docs"),
        col("cum_mean_q_x1e6"))
  }

  lazy val mixQualityFrontierOracle: String = s"""
    WITH q AS (${TextAnalysis.qualityScoreOracle}),
    scored AS (
      SELECT d.source,
        ${TextAnalysis.sqlBpeTokens("d.text")} AS toks,
        q.quality_score
      FROM documents d JOIN q ON d.doc_id = q.doc_id),
    per AS (
      SELECT source, COUNT(*) AS n_docs, CAST(SUM(toks) AS BIGINT) AS tokens,
        SUM(CAST(quality_score AS DECIMAL(28, 6))) AS q_dec
      FROM scored GROUP BY 1),
    r AS (
      SELECT source, n_docs, tokens, q_dec,
        CAST(FLOOR(CAST(q_dec AS DOUBLE) / CAST(n_docs AS DOUBLE)
          * 1.0e6 + 0.5) AS BIGINT) AS mean_q_x1e6
      FROM per),
    f AS (
      SELECT source, n_docs, tokens, mean_q_x1e6,
        CAST(ROW_NUMBER() OVER (ORDER BY mean_q_x1e6 DESC, source ASC)
          AS BIGINT) AS rank,
        CAST(SUM(tokens) OVER w AS BIGINT) AS cum_tokens,
        CAST(SUM(n_docs) OVER w AS BIGINT) AS cum_docs,
        SUM(q_dec) OVER w AS cum_q
      FROM r
      WINDOW w AS (ORDER BY mean_q_x1e6 DESC, source ASC
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
    SELECT source, rank, n_docs, tokens, mean_q_x1e6, cum_tokens, cum_docs,
      CAST(FLOOR(CAST(cum_q AS DOUBLE) / CAST(cum_docs AS DOUBLE)
        * 1.0e6 + 0.5) AS BIGINT) AS cum_mean_q_x1e6
    FROM f"""

  /** [[tokenBudgetPlan]] over an arbitrary documents frame. Total on
    * degenerate corpora: a ZERO-token source would make the naive
    * sqrt ratio 0/0 = NaN (whose BIGINT cast is engine-divergent —
    * Spark nulls, DuckDB errors), so the floor folds over POSITIVE
    * token counts only and zero-token sources plan 0 epochs / 0 tokens
    * / not-at-cap, staying in the report instead of poisoning it.
    */
  def tokenBudgetPlanDf(documents: DataFrame): DataFrame = {
    val perSrc = graft.functions.Iterate.checkpoint(
      documents
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(TextAnalysis.bpeTokens(col("text"))).as("n_tokens")))
    val mn = perSrc.agg(
      min(when(col("n_tokens") > 0, col("n_tokens"))).as("n_tok_min"))
    val planned = perSrc.crossJoin(broadcast(mn))
      .withColumn("epochs",
        when(col("n_tokens") > 0,
          lit(BudgetEpochCap) * sqrt(col("n_tok_min").cast("double"))
            / sqrt(col("n_tokens").cast("double")))
          .otherwise(lit(0.0)))
      .withColumn("target_tokens",
        floor(col("epochs") * col("n_tokens").cast("double")).cast("bigint"))
    val tot = planned.agg(sum(col("target_tokens")).as("budget_tokens"))
    planned.crossJoin(broadcast(tot))
      .select(col("source"), col("n_docs"), col("n_tokens"), col("epochs"),
        col("target_tokens"),
        when(col("budget_tokens") <= lit(0L), lit(0L))
          .when(col("budget_tokens") <= lit(9000000000000L),
            expr("(target_tokens * 1000000) div budget_tokens"))
          .otherwise(expr("target_tokens div (budget_tokens div 1000000)"))
          .as("share_ppm"),
        (col("epochs") >= lit(BudgetEpochCap)).as("at_epoch_cap"))
  }

  val tokenBudgetPlanOracle: String = s"""
    WITH per_src AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        CAST(SUM(${TextAnalysis.sqlBpeTokens("text")}) AS BIGINT) AS n_tokens
      FROM documents GROUP BY 1),
    mn AS (SELECT MIN(CASE WHEN n_tokens > 0 THEN n_tokens END)
             AS n_tok_min FROM per_src),
    planned AS (
      SELECT source, n_docs, n_tokens,
        CASE WHEN n_tokens > 0 THEN
          $BudgetEpochCap * SQRT(CAST(n_tok_min AS DOUBLE))
            / SQRT(CAST(n_tokens AS DOUBLE))
        ELSE CAST(0.0 AS DOUBLE) END AS epochs
      FROM per_src CROSS JOIN mn),
    planned2 AS (
      SELECT *, CAST(FLOOR(epochs * CAST(n_tokens AS DOUBLE)) AS BIGINT)
        AS target_tokens
      FROM planned),
    tot AS (SELECT CAST(SUM(target_tokens) AS BIGINT) AS budget_tokens
            FROM planned2)
    SELECT source, n_docs, n_tokens, epochs, target_tokens,
      CASE WHEN budget_tokens <= 0 THEN 0
        WHEN budget_tokens <= 9000000000000
        THEN (target_tokens * 1000000) // budget_tokens
        ELSE target_tokens // (budget_tokens // 1000000) END AS share_ppm,
      (epochs >= $BudgetEpochCap) AS at_epoch_cap
    FROM planned2 CROSS JOIN tot"""

  def mixRebalance(spark: SparkSession, dir: String): DataFrame =
    mixRebalanceDf(spark, Tables.documents(spark, dir))

  /** [[mixRebalance]] over an arbitrary documents frame (staged-data
    * form — the pipeline rebalances the corpus that SURVIVED earlier
    * stages, so the observed counts are post-filter).
    */
  def mixRebalanceDf(spark: SparkSession, docs: DataFrame): DataFrame = {
    val targets = spark.createDataFrame(mixTargetPct).toDF("t_source", "t_pct")
    val counts = docs.groupBy(col("source")).agg(count(lit(1)).as("n_source"))
      .join(broadcast(targets), col("source") === col("t_source"), "left")
      .select(col("source"), col("n_source"),
        coalesce(col("t_pct"), lit(mixDefaultPct)).as("target_pct"))
    val total = docs.agg(count(lit(1)).as("n_total"))
    docs.join(broadcast(counts), Seq("source"))
      .crossJoin(broadcast(total))
      .filter(pctBucket("mix", col("doc_id")) * col("n_source")
        < col("target_pct") * col("n_total"))
      .select(col("doc_id"), col("source"), col("target_pct"))
  }

  val mixRebalanceOracle: String = {
    val values = mixTargetPct.map { case (s, p) => s"('$s', $p)" }.mkString(", ")
    s"""
    WITH counts AS (
      SELECT source, COUNT(*) AS n_source,
        COALESCE(t.t_pct, $mixDefaultPct) AS target_pct
      FROM documents
      LEFT JOIN (VALUES $values) AS t(t_source, t_pct) ON source = t_source
      GROUP BY source, t.t_pct),
    total AS (SELECT COUNT(*) AS n_total FROM documents)
    SELECT doc_id, d.source, CAST(target_pct AS BIGINT) AS target_pct
    FROM documents d
    JOIN counts c ON d.source = c.source
    CROSS JOIN total
    WHERE ${sqlPctBucket("mix", "doc_id")} * n_source < target_pct * n_total"""
  }

  /** Weighted sample without replacement, top-k by hash priority: each
    * row's priority is `hash24(salt|id) / weight` (weight = n_chars —
    * longer docs proportionally likelier), smallest k win. This is the
    * deterministic analog of Efraimidis-Spirakis exponential keys
    * (u^(1/w)) kept inside plain IEEE division — `pow`/`log` would make
    * selection hinge on libm rounding, which differs across engines and
    * platforms; a division-only priority is bit-identical everywhere,
    * so the same 100 TB sample reproduces on any cluster AND
    * hash-checks against the oracle.
    *
    * Scale: top-k over a total order with a unique tiebreak plans as
    * TakeOrderedAndProject — per-partition bounded heaps, k rows per
    * partition to the driver, never a global sort.
    */
  def sampleWeighted(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .filter(col("n_chars") > 0)
      .select(col("doc_id"), col("n_chars"),
        (graft.functions.TextOps.hash24(
          concat(lit("weighted|"), col("doc_id").cast("string"))).cast("double")
          / col("n_chars")).as("priority"))
      .orderBy(col("priority").asc, col("doc_id").asc)
      .limit(50)

  val sampleWeightedOracle: String = """
    SELECT doc_id, n_chars,
      CAST(CAST('0x' || SUBSTR(MD5('weighted|' || CAST(doc_id AS VARCHAR)), 1, 6)
        AS BIGINT) AS DOUBLE) / n_chars AS priority
    FROM documents
    WHERE n_chars > 0
    ORDER BY priority ASC, doc_id ASC
    LIMIT 50"""

  /** Token budget per packed training sequence. */
  private val SeqTokens = 1024L

  /** Documents per offset chunk: the two-level cumsum's parallel grain.
    * Chunk count grows with the corpus (ids are dense), so a source is
    * never one window task; the serial step is only the per-chunk totals.
    */
  private val ChunkDocs = 128L

  /** Sequence packing: concatenate each source's documents in
    * deterministic doc_id order and cut the token stream every
    * [[SeqTokens]] tokens — a document belongs to the sequence its START
    * offset falls in (the concat-then-chunk packing every pretraining
    * run does between curation and the trainer; sequences end once a
    * document starts past the boundary, so they vary around the budget
    * rather than splitting documents). Output: one row per document with
    * its source, token count, stream offset and assigned sequence.
    *
    * Scale: the running offset is a TWO-LEVEL cumsum. A single window
    * `PARTITION BY source` would serialize each source's entire token
    * stream through one task — with a handful of sources at 100 TB,
    * that's a straggler/OOM. Instead: (1) the doc_id space is cut into
    * [[ChunkDocs]]-wide chunks; (2) within-(source, chunk) cumsum runs
    * with parallelism = chunk count; (3) per-chunk token totals (tiny —
    * one row per chunk) get a per-source running base via a window over
    * the AGGREGATED rows only; (4) final offset = chunk base + local
    * cumsum, broadcast-joined back. Identical rows to the global cumsum
    * — partition boundaries cannot change a prefix sum — so the oracle
    * stays the direct one-window form. All arithmetic is bigint.
    */
  def sequencePack(spark: SparkSession, dir: String): DataFrame =
    sequencePackDf(Tables.documents(spark, dir))

  /** [[sequencePack]] over an arbitrary documents frame (staged-data
    * form — the last stage of the curation pipeline).
    */
  def sequencePackDf(documents: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = documents
      .select(col("source"), col("doc_id"),
        size(split(col("text"), "\\s+")).cast("bigint").as("n_tokens"),
        expr(s"doc_id div $ChunkDocs").as("chunk"))
    // Level 1: chunk token totals (map-side combinable), then the serial
    // per-source running base — over chunk-count rows, not corpus rows.
    val wBase = Window.partitionBy(col("source")).orderBy(col("chunk"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val bases = toks.groupBy(col("source"), col("chunk"))
      .agg(sum(col("n_tokens")).as("chunk_tokens"))
      .withColumn("base", coalesce(sum(col("chunk_tokens")).over(wBase), lit(0L)))
      .select(col("source"), col("chunk"), col("base"))
    // Level 2: within-chunk cumsum — parallelism scales with the corpus.
    val wLocal = Window.partitionBy(col("source"), col("chunk"))
      .orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    toks
      .withColumn("local_off", coalesce(sum(col("n_tokens")).over(wLocal), lit(0L)))
      // bases = chunk-level state (corpus/ChunkDocs rows): broadcast
      // under the Tables.stateHint bound, never by size estimate.
      .join(Tables.stateHint(bases), Seq("source", "chunk"))
      // "offset" is a reserved word in DuckDB — stream_offset keeps the
      // schema oracle-portable.
      .withColumn("stream_offset", col("base") + col("local_off"))
      .select(col("source"), col("doc_id"), col("n_tokens"), col("stream_offset"),
        expr(s"stream_offset div $SeqTokens").as("seq_id"))
  }

  val sequencePackOracle: String = s"""
    SELECT source, doc_id, n_tokens,
      CAST(so AS BIGINT) AS stream_offset,
      CAST(so // $SeqTokens AS BIGINT) AS seq_id
    FROM (
      SELECT source, doc_id, n_tokens,
        COALESCE(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS so
      FROM (SELECT source, doc_id,
              CAST(LEN(STRING_SPLIT_REGEX(text, '\\s+')) AS BIGINT) AS n_tokens
            FROM documents))"""

  /** Packing-density report — [[sequencePack]]'s trainer-facing audit:
    * per source, how many packed sequences the stream cut into, how
    * densely documents packed (max docs landing in one sequence — the
    * attention-mask fragmentation signal), and `fill_ppm` = tokens per
    * sequence-slot in ppm of the [[SeqTokens]] budget. Over 1e6 means
    * boundary overrun dominates (long docs spilling past their cut),
    * under it means trailing underfill — the two failure modes a
    * packing config is tuned between. All-integer; two narrow
    * aggregates over the pack assignment.
    */
  def packEfficiency(spark: SparkSession, dir: String): DataFrame =
    sequencePack(spark, dir)
      .groupBy(col("source"), col("seq_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("t"))
      .groupBy(col("source"))
      .agg(sum(col("n_docs")).as("n_docs"),
        count(lit(1)).as("n_seqs"),
        sum(col("t")).as("total_tokens"),
        max(col("n_docs")).as("max_docs_per_seq"))
      .select(col("source"), col("n_docs"), col("n_seqs"), col("total_tokens"),
        col("max_docs_per_seq"),
        expr(s"(total_tokens * 1000000) div (n_seqs * $SeqTokens)").as("fill_ppm"))

  val packEfficiencyOracle: String = s"""
    WITH p AS ($sequencePackOracle),
    per AS (
      SELECT source, seq_id, COUNT(*) AS n_docs, SUM(n_tokens) AS t
      FROM p GROUP BY 1, 2)
    SELECT source,
      CAST(SUM(n_docs) AS BIGINT) AS n_docs,
      CAST(COUNT(*) AS BIGINT) AS n_seqs,
      CAST(SUM(t) AS BIGINT) AS total_tokens,
      CAST(MAX(n_docs) AS BIGINT) AS max_docs_per_seq,
      CAST((SUM(t) * 1000000) // (COUNT(*) * $SeqTokens) AS BIGINT) AS fill_ppm
    FROM per GROUP BY 1"""

  /** The "high-quality target" source whose unigram distribution the
    * importance weights aim at (the curated-slice-as-target pattern).
    */
  private val TargetSource = "src0"

  /** Fixed hashed-feature space for the DSIR stats (the paper's own
    * trick: hash features into a CONSTANT-size bucket space so the
    * per-feature count table is bounded by this constant, not by the
    * corpus vocabulary — which is what lets it broadcast at any SF).
    */
  private val DsirBuckets = 8192L

  /** DSIR-style importance scores (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling" — hashed-ngram
    * importance weights, linearized): each document scores the
    * token-weighted MEAN of the target/raw probability ratio of its
    * hashed unigram features, `((ct+α)·(Nr+1)) / ((cr+α)·(Nt+1))` with
    * Laplace α = 1/B — above 1 means the doc's vocabulary leans toward
    * the target distribution. The smoothing keeps every ratio strictly
    * positive (an unsmoothed bucket the target never hits would zero
    * out, and at 100 TB unseen buckets are guaranteed) while α·B = 1
    * keeps it feather-light: α = 1 would deflate every ratio ~B/Nt-fold
    * whenever the target slice is smaller than the bucket count, which
    * is exactly the test-SF regime. α = 2^−13 is exactly representable,
    * so the smoothed factors are deterministic doubles in both engines.
    * Linear ratios instead of the paper's log-likelihood ratios: libm
    * log is not FP-portable (the tfidf/pow lessons); each factor is
    * cast to double BEFORE multiplying (a bigint product of two ~2^40
    * counts would silently wrap long arithmetic at cluster scale —
    * per-factor casts keep both engines in the same per-factor double
    * regime), and the per-doc sum rides
    * [[graft.functions.Exact.dsum]] — bit-identical to the oracle.
    *
    * Scale (the round-7 re-plan): terms hash into [[DsirBuckets]]
    * buckets, so the stats table is CONSTANT-size and BROADCASTS — the
    * corpus is never shuffled on a Zipf-skewed term key (the previous
    * plan joined one row per token INSTANCE against per-term stats;
    * "the" alone is ~5% of all instances, a guaranteed mega-partition).
    * The corpus-row path is now: explode → map-side partial count →
    * ONE shuffle of per-(doc, bucket) tf rows (≤ docs × B, no skew:
    * doc_id spreads every hot bucket) → broadcast stats join → per-doc
    * rollup of pre-aggregated rows.
    */
  def importanceWeights(spark: SparkSession, dir: String): DataFrame =
    importanceWeightsDf(Tables.documents(spark, dir))

  /** [[importanceWeights]] over an arbitrary documents frame (staged
    * form for pipeline composition).
    */
  def importanceWeightsDf(documents: DataFrame): DataFrame = {
    val toks = documents
      .select(col("doc_id"), col("source"),
        explode(split(col("text"), "\\s+")).as("term"))
      .select(col("doc_id"), col("source"),
        (graft.functions.TextOps.hash24(concat(lit("dsir|"), col("term")))
          % DsirBuckets).as("bucket"))
    // Three STREAMING passes over the corpus, nothing corpus-sized ever
    // materializes and only the tf pass shuffles corpus-derived rows:
    // stats folds token instances map-side into the B fixed buckets
    // (its shuffle is ≤ partitions × B tiny rows), totals folds to two
    // scalars the same way, tf is the one real corpus shuffle
    // (per-(doc, bucket) rows). Each aggregate deliberately reads
    // `toks` directly — chaining them (totals from stats, stats from
    // tf) re-evaluates the shared subtree per consumer anyway (exchange
    // reuse does not fire across these aggregates), and an extra
    // scan-speed fold is far cheaper at 100 TB than materializing a
    // corpus-sized tf just to share it.
    val tf = toks.groupBy(col("doc_id"), col("bucket"))
      .agg(count(lit(1)).as("tf"))
    val stats = toks.groupBy(col("bucket")).agg(
      count(lit(1)).as("cr"),
      count(when(col("source") === TargetSource, 1)).as("ct"))
    val totals = toks.agg(
      count(lit(1)).as("nr"),
      count(when(col("source") === TargetSource, 1)).as("nt"))
    // α = 1/B = 2^−13: exact in double, so ct + α is one deterministic
    // IEEE add in both engines.
    val alpha = lit(1.0 / DsirBuckets)
    val r = (((col("ct").cast("double") + alpha)
        * (col("nr") + lit(1L)).cast("double"))
      / ((col("cr").cast("double") + alpha)
        * (col("nt") + lit(1L)).cast("double")))
    tf.join(broadcast(stats), Seq("bucket"))
      .crossJoin(broadcast(totals))
      .select(col("doc_id"), col("tf"),
        (col("tf").cast("double") * r).as("wr"))
      .groupBy(col("doc_id"))
      .agg(sum(col("tf")).as("n_tokens"),
        graft.functions.Exact.dsum(col("wr")).as("sum_r"))
      .select(col("doc_id"), col("n_tokens"),
        (col("sum_r") / col("n_tokens").cast("double")).as("importance"))
  }

  /** Shared oracle CTE chain ending at `w(doc_id, n_tokens, importance)`
    * — the DSIR weight computation, reused by the selection oracle.
    */
  private val importanceCtes: String = s"""
    toks AS MATERIALIZED (
      SELECT doc_id, source,
        CAST('0x' || SUBSTR(MD5('dsir|' || term), 1, 6) AS BIGINT)
          % $DsirBuckets AS bucket
      FROM (SELECT doc_id, source,
              UNNEST(STRING_SPLIT_REGEX(text, '\\s+')) AS term
            FROM documents)),
    tf AS (SELECT doc_id, bucket, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
    stats AS (
      SELECT bucket, COUNT(*) AS cr,
        COUNT(*) FILTER (WHERE source = '$TargetSource') AS ct
      FROM toks GROUP BY 1),
    totals AS (
      SELECT COUNT(*) AS nr,
        COUNT(*) FILTER (WHERE source = '$TargetSource') AS nt
      FROM toks),
    w AS MATERIALIZED (
      SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_tokens,
        ${graft.functions.Exact.sqlDsum(
          "CAST(tf AS DOUBLE) * (((CAST(ct AS DOUBLE)"
            + s" + CAST(1 AS DOUBLE) / $DsirBuckets) * CAST(nr + 1 AS DOUBLE))"
            + s" / ((CAST(cr AS DOUBLE) + CAST(1 AS DOUBLE) / $DsirBuckets)"
            + s" * CAST(nt + 1 AS DOUBLE)))")}
          / CAST(SUM(tf) AS DOUBLE) AS importance
      FROM tf JOIN stats USING (bucket) CROSS JOIN totals
      GROUP BY doc_id)"""

  val importanceWeightsOracle: String = s"""
    WITH $importanceCtes
    SELECT doc_id, n_tokens, importance FROM w"""

  /** Token share of the WHOLE corpus the DSIR selection keeps. */
  private val SelectTokenPct = 25L

  /** DSIR selection (the paper's actual resampling step, consuming
    * [[importanceWeights]]): documents whose vocabulary leans toward
    * the target (importance > 1) form the candidate pool; the pool is
    * then hash-mod resampled down to a declared token budget —
    * [[SelectTokenPct]]% of the ORIGINAL corpus's tokens. A document
    * survives iff `bucket · pool_tokens < pct · total_tokens` with
    * bucket ∈ [0,100): P(keep) = min(1, budget/pool), so the surviving
    * token mass lands ≈ the budget. The decision is ALL-INTEGER after
    * the (engine-identical) importance threshold — the same
    * derived-rate discipline as [[mixRebalance]], so a 100 TB selection
    * reproduces bit-for-bit and needs no global sort: the paper's
    * top-k-by-weight becomes threshold + hash-mod, which selects in one
    * scan-speed filter instead of ranking the corpus.
    *
    * Scale: the weights frame is checkpointed once (three branches read
    * it: pool, corpus total, pool total — recomputing the DSIR pass per
    * branch would triple the corpus cost; checkpoint blocks release via
    * GC, leaving no session-lifetime cache entry); the two token totals
    * are single-row broadcasts; nothing else moves.
    */
  def sampleImportance(spark: SparkSession, dir: String): DataFrame =
    sampleImportanceDf(Tables.documents(spark, dir))

  /** [[sampleImportance]] over an arbitrary documents frame (staged
    * form — the pipeline selects from the corpus that survived earlier
    * stages).
    */
  def sampleImportanceDf(documents: DataFrame): DataFrame = {
    val w = graft.functions.Iterate.checkpoint(importanceWeightsDf(documents))
    val pool = w.filter(col("importance") > 1.0)
    val total = w.agg(sum(col("n_tokens")).as("n_total"))
    val poolTotal = pool.agg(sum(col("n_tokens")).as("n_pool"))
    pool.crossJoin(broadcast(total)).crossJoin(broadcast(poolTotal))
      .filter(pctBucket("dsir_select", col("doc_id")) * col("n_pool")
        < lit(SelectTokenPct) * col("n_total"))
      .select(col("doc_id"), col("n_tokens"), col("importance"))
  }

  val sampleImportanceOracle: String = s"""
    WITH $importanceCtes,
    pool AS MATERIALIZED (SELECT * FROM w WHERE importance > 1.0),
    tot AS (SELECT SUM(n_tokens) AS n_total FROM w),
    pt AS (SELECT SUM(n_tokens) AS n_pool FROM pool)
    SELECT doc_id, n_tokens, importance
    FROM pool CROSS JOIN tot CROSS JOIN pt
    WHERE ${sqlPctBucket("dsir_select", "doc_id")} * n_pool
      < $SelectTokenPct * n_total"""

  /** Curriculum ordering — a deterministic GLOBAL training order
    * (highest-quality docs first) without a global sort, which at 100 TB
    * would funnel the corpus through one reducer. The sequence_pack
    * two-level trick applied to ordering: (1) integer quality cells
    * (floor(score·1024) — power-of-two scaling is IEEE-exact, the ccnet
    * discipline); (2) a per-cell histogram (≤1025 rows) carries the
    * serial cumulative base via one tiny window; (3) within-cell
    * row_number partitions by cell — parallelism scales with the corpus
    * (a hot cell bounds one partition; quality scores spread over ~1k
    * cells in practice). Global position = base + local rank, identical
    * to the one-window oracle because partition boundaries cannot change
    * a prefix count. Phase = thirds of the position space, all-integer.
    */
  def curriculumOrder(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = TextAnalysis.qualityScore(spark, dir)
      .select(col("doc_id"),
        floor(col("quality_score") * lit(1024.0)).cast("bigint").as("cell"))
    // quality cells are resolution-bounded (≤1025), but the serial base
    // still rides the bucketed exclusive prefix (cells ordered DESC —
    // best first — so the bucket key counts down from the max) to keep
    // the no-unpartitioned-window invariant registry-wide.
    // checkpointed: the ≤1025-row histogram's lineage is the full
    // quality-score pass — Ranks' documented triple read would re-score
    // the corpus three times; the total row count then folds over the
    // materialized histogram instead of a fourth corpus pass.
    val hist = graft.functions.Iterate.checkpoint(
      scored.groupBy(col("cell")).agg(count(lit(1)).as("c")))
    val bases = graft.functions.Ranks.withBucketedExclusivePrefix(
        hist, col("cell"), ascending = false, 64, Seq(col("c") -> "base"))
      .select(col("cell"), col("base"))
    val tot = hist.agg(sum(col("c")).as("n_total"))
    val wCell = Window.partitionBy(col("cell")).orderBy(col("doc_id"))
    scored
      .withColumn("rn", row_number().over(wCell).cast("bigint"))
      .join(Tables.stateHint(bases), Seq("cell"))
      .crossJoin(broadcast(tot))
      .withColumn("curriculum_pos", col("base") + col("rn"))
      .select(col("doc_id"), col("cell"), col("curriculum_pos"),
        (lit(1L) + expr("((curriculum_pos - 1) * 3) div n_total")).as("phase"))
  }

  val curriculumOrderOracle: String = s"""
    WITH q AS (
      SELECT doc_id, quality_score
      FROM (${graft.operators.TextAnalysis.qualityScoreOracle}) qq),
    scored AS (
      SELECT doc_id, CAST(FLOOR(quality_score * 1024.0) AS BIGINT) AS cell FROM q),
    tot AS (SELECT COUNT(*) AS n_total FROM scored),
    pos AS (
      SELECT doc_id, cell,
        CAST(ROW_NUMBER() OVER (ORDER BY cell DESC, doc_id ASC) AS BIGINT)
          AS curriculum_pos
      FROM scored)
    SELECT doc_id, cell, curriculum_pos,
      CAST(1 + ((curriculum_pos - 1) * 3) // n_total AS BIGINT) AS phase
    FROM pos CROSS JOIN tot"""

  /** Group-leakage-safe k-fold assignment (sklearn GroupKFold's job,
    * hash-deterministic): every ORDER lands in the fold of its CUSTOMER
    * — the group key — via the portable salted hash-mod, so no
    * customer's behavior spans a train/eval boundary (the leakage class
    * [[splitLeakageAudit]] detects; this is the assignment-side fix).
    * Output is the per-fold balance audit: group/row counts, exact-cents
    * mass, and share ppm — the evidence that hash-mod folds are
    * size-balanced without a shuffle-heavy stratified assignment.
    * One broadcast of the salted-hash fold expression (computed inline
    * per row — no customer-table join needed, the group key is ON the
    * fact row) and one aggregate.
    */
  def groupKfold(spark: SparkSession, dir: String): DataFrame = {
    val folds = Tables.orders(spark, dir)
      .withColumn("fold",
        graft.functions.TextOps.hash24(
          concat(lit("kfold"), lit("|"), col("o_custkey").cast("string"))) % 5)
      .groupBy(col("fold"))
      .agg(countDistinct(col("o_custkey")).as("n_groups"),
        count(lit(1)).as("n_orders"),
        sum(floor(col("o_totalprice") * 100 + lit(0.5)).cast("bigint"))
          .as("order_cents"))
    folds.withColumn("orders_share_ppm",
      expr("(n_orders * 1000000) div (sum(n_orders) over ())"))
  }

  val groupKfoldOracle: String = s"""
    WITH f AS (
      SELECT CAST('0x' || SUBSTR(MD5('kfold' || '|' ||
          CAST(o_custkey AS VARCHAR)), 1, 6) AS BIGINT) % 5 AS fold,
        o_custkey, o_totalprice
      FROM orders),
    g AS (
      SELECT fold, COUNT(DISTINCT o_custkey) AS n_groups, COUNT(*) AS n_orders,
        CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
          AS order_cents
      FROM f GROUP BY 1)
    SELECT fold, n_groups, n_orders, order_cents,
      (n_orders * 1000000) // CAST(SUM(n_orders) OVER () AS BIGINT)
        AS orders_share_ppm
    FROM g"""

  def defs: Map[String, QueryDef] = Map(
    "group_kfold" -> QueryDef.sql(groupKfold, groupKfoldOracle),
    "curriculum_order" -> QueryDef.sql(curriculumOrder, curriculumOrderOracle),
    "importance_weights" -> QueryDef.sql(importanceWeights, importanceWeightsOracle),
    "sample_importance" -> QueryDef.sql(sampleImportance, sampleImportanceOracle),
    "sequence_pack" -> QueryDef.sql(sequencePack, sequencePackOracle),
    "pack_efficiency" -> QueryDef.sql(packEfficiency, packEfficiencyOracle),
    "sample_weighted" -> QueryDef.sql(sampleWeighted, sampleWeightedOracle),
    "mix_rebalance" -> QueryDef.sql(mixRebalance, mixRebalanceOracle),
    "sample_temperature" -> QueryDef.sql(sampleTemperature, sampleTemperatureOracle),
    "token_budget_plan" -> QueryDef.sql(tokenBudgetPlan, tokenBudgetPlanOracle),
    "mix_quality_frontier" ->
      QueryDef.sql(mixQualityFrontier, mixQualityFrontierOracle),
    "sample_stratified" -> QueryDef.sql(sampleStratified, sampleStratifiedOracle),
    "dataset_split" -> QueryDef.sql(datasetSplit, datasetSplitOracle),
    "dataset_card" -> QueryDef.sql(datasetCard, datasetCardOracle),
    "dataset_manifest" -> QueryDef.sql(datasetManifest, datasetManifestOracle),
    "split_leakage_audit" -> QueryDef.sql(splitLeakageAudit, splitLeakageAuditOracle),
    "dataset_interleave" -> QueryDef.sql(datasetInterleave, datasetInterleaveOracle)
  )
}
