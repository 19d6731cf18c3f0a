package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Toxicity / badwords gate — the one standard curation stage the
  * quality family lacked (r15 verdict directive 4): the C4-style
  * lexicon filter (Raffel et al. 2020 §2.2 drop any page containing a
  * term from a public blocklist; the reference's clean/validate stage
  * — utils.py:14-88 — is its structural analog). Two faces:
  * [[badwordsFlag]] is the per-doc population-with-verdict table (every
  * doc, its lexicon-hit count/density, and the gate verdict — never a
  * flags-only output, the q7_volume vacuity lesson), and
  * [[badwordsSourceReport]] composes the gate into the gopher-style
  * per-source quality matrix (which sources die to the lexicon vs to
  * the heuristic rules, and what a BOTH-gates mix would keep).
  *
  * The lexicon here is a deterministic PLACEHOLDER stand-in (six mild
  * terms) for a production blocklist like the public
  * "List-of-Dirty-Naughty-Obscene-and-Otherwise-Bad-Words" C4 uses —
  * the operator is the gate mechanics, not the list's content; a user
  * swaps [[Lexicon]]. The lake text is the closed 31-word synthetic
  * vocabulary (zero natural hits), so lexicon terms are INJECTED
  * deterministically by doc_id (the pii_inventory discipline): every
  * 4th doc gets one term, every 16th two more — so the clean /
  * flagged / dense verdict classes are each non-empty at every SF and
  * each threshold is provably exercised.
  *
  * Scale shape: detection is one `regexp_count` per row against a
  * CONSTANT alternation pattern — scan speed, zero shuffles for the
  * flag table; the source report is one map-side-combinable aggregate
  * over (source) plus the broadcast-sized gopher matrix join. No
  * corpus shuffle anywhere; the lexicon never becomes a join side
  * (a 100 TB corpus vs a ~400-term list must stay a compiled regex or
  * a broadcast, never a tokenize-and-join).
  */
object Toxicity {

  /** Placeholder public-lexicon terms (see class doc). Order is
    * load-bearing: injection rotates through it by doc_id.
    */
  private[graft] val Lexicon: Seq[String] =
    Seq("damn", "hell", "crap", "stupid", "idiot", "rubbish")

  /** Whole-word alternation over [[Lexicon]] — identical semantics in
    * Java regex (Spark) and RE2 (DuckDB).
    */
  private val Pattern = "\\b(" + Lexicon.mkString("|") + ")\\b"

  /** A doc with at least this many lexicon hits is 'dense' (the
    * repeated-offender tier a reviewer looks at first); >= 1 is
    * 'flagged' and blocked (the C4 rule: any hit drops the page).
    */
  private[graft] val DenseThreshold = 3L

  /** SQL CASE mapping a rotation index expression to its lexicon term;
    * `idx` must already be reduced mod |Lexicon|. Shared by both
    * engines' injection so they cannot desync.
    */
  private def termCase(idx: String): String =
    s"CASE $idx " + Lexicon.zipWithIndex
      .map { case (t, i) => s"WHEN $i THEN '$t'" }.mkString(" ") + " END"

  /** The moderated text: lake text plus the deterministic injections.
    * `div` is the integer-division spelling ("div" Spark, "//" DuckDB).
    */
  private def moderatedSql(div: String): String =
    "text" +
      s" || CASE WHEN doc_id % 4 = 0 THEN ' ' || ${termCase(s"(doc_id $div 4) % ${Lexicon.size}")} ELSE '' END" +
      s" || CASE WHEN doc_id % 16 = 0 THEN ' ' || ${termCase(s"(doc_id $div 16) % ${Lexicon.size}")}" +
      s" || ' ' || ${termCase(s"((doc_id $div 16) + 1) % ${Lexicon.size}")} ELSE '' END"

  /** Per-doc lexicon gate: every doc with its word count (of the
    * moderated text), lexicon-hit count, exact hit density in ppm, the
    * block verdict, and the tier label. Scan-speed projection — zero
    * shuffles at any SF.
    */
  def badwordsFlag(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        expr(moderatedSql("div")).as("moderated"))
      .select(col("doc_id"), col("source"),
        size(split(col("moderated"), "\\s+")).cast("bigint").as("n_words"),
        regexp_count(col("moderated"), lit(Pattern)).cast("bigint")
          .as("bad_count"))
      .select(col("doc_id"), col("source"), col("n_words"), col("bad_count"),
        expr("(bad_count * 1000000) div n_words").as("bad_ppm"),
        (col("bad_count") >= 1L).as("blocked"),
        when(col("bad_count") >= DenseThreshold, lit("dense"))
          .when(col("bad_count") >= 1L, lit("flagged"))
          .otherwise(lit("clean")).as("tier"))

  val badwordsFlagOracle: String = s"""
    WITH m AS (
      SELECT doc_id, source, ${moderatedSql("//")} AS moderated
      FROM documents),
    c AS (
      SELECT doc_id, source,
        CAST(LEN(STRING_SPLIT_REGEX(moderated, '\\s+')) AS BIGINT) AS n_words,
        CAST(LEN(REGEXP_EXTRACT_ALL(moderated, '$Pattern')) AS BIGINT)
          AS bad_count
      FROM m)
    SELECT doc_id, source, n_words, bad_count,
      (bad_count * 1000000) // n_words AS bad_ppm,
      bad_count >= 1 AS blocked,
      CASE WHEN bad_count >= $DenseThreshold THEN 'dense'
        WHEN bad_count >= 1 THEN 'flagged' ELSE 'clean' END AS tier
    FROM c"""

  /** Per-source lexicon density report, composed into the gopher-style
    * source-quality matrix: for each source, total docs, lexicon-blocked
    * docs (with the ppm share), total lexicon occurrences and their
    * per-doc density, the gopher heuristic-gate pass count — and the
    * BOTH-gates keep count (passes gopher AND not blocked), which is the
    * number a mix planner actually re-weights on. One (doc_id)-keyed
    * join of two scan-speed projections, then one map-side aggregate to
    * |sources| rows.
    */
  def badwordsSourceReport(spark: SparkSession, dir: String): DataFrame =
    badwordsFlag(spark, dir)
      .join(TextAnalysis.gopherRules(spark, dir)
        .select(col("doc_id"), col("pass")), Seq("doc_id"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("blocked").cast("long")).as("n_blocked"),
        sum(col("bad_count")).as("bad_occurrences"),
        sum(col("pass").cast("long")).as("n_gopher_pass"),
        sum((col("pass") && !col("blocked")).cast("long")).as("n_keep"))
      .select(col("source"), col("n_docs"), col("n_blocked"),
        expr("(n_blocked * 1000000) div n_docs").as("blocked_ppm"),
        col("bad_occurrences"),
        expr("(bad_occurrences * 1000000) div n_docs").as("bad_per_doc_ppm"),
        col("n_gopher_pass"), col("n_keep"),
        expr("(n_keep * 1000000) div n_docs").as("keep_ppm"))

  lazy val badwordsSourceReportOracle: String = s"""
    WITH bw AS ($badwordsFlagOracle),
    g AS (${TextAnalysis.gopherRulesOracle})
    SELECT bw.source,
      CAST(COUNT(*) AS BIGINT) AS n_docs,
      CAST(SUM(CASE WHEN bw.blocked THEN 1 ELSE 0 END) AS BIGINT)
        AS n_blocked,
      (CAST(SUM(CASE WHEN bw.blocked THEN 1 ELSE 0 END) AS BIGINT) * 1000000)
        // COUNT(*) AS blocked_ppm,
      CAST(SUM(bw.bad_count) AS BIGINT) AS bad_occurrences,
      (CAST(SUM(bw.bad_count) AS BIGINT) * 1000000) // COUNT(*)
        AS bad_per_doc_ppm,
      CAST(SUM(CASE WHEN g.pass THEN 1 ELSE 0 END) AS BIGINT)
        AS n_gopher_pass,
      CAST(SUM(CASE WHEN g.pass AND NOT bw.blocked THEN 1 ELSE 0 END)
        AS BIGINT) AS n_keep,
      (CAST(SUM(CASE WHEN g.pass AND NOT bw.blocked THEN 1 ELSE 0 END)
        AS BIGINT) * 1000000) // COUNT(*) AS keep_ppm
    FROM bw JOIN g ON bw.doc_id = g.doc_id
    GROUP BY bw.source"""

  def defs: Map[String, QueryDef] = Map(
    "badwords_flag" -> QueryDef.sql(badwordsFlag, badwordsFlagOracle),
    "badwords_source_report" ->
      QueryDef.sql(badwordsSourceReport, badwordsSourceReportOracle))
}
