package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Validated-PII shape machinery shared by [[CorpusExt.piiInventory]]
  * (count what WOULD be redacted, per class) and
  * [[TextAnalysis.piiScrub]] (redact it) — r15 verdict directive 8:
  * beyond the regex-shaped classes (email/URL/phone/IP), the two
  * classes every production scrubber VALIDATES rather than
  * pattern-matches:
  *
  *  - **payment-card numbers**, 16 digits gated by the Luhn mod-10
  *    checksum (ISO/IEC 7812-1) — a shape match alone would redact
  *    order ids and flood the inventory with false positives, so the
  *    detector computes the checksum and only a PASSING candidate
  *    counts/redacts;
  *  - **national-ID shapes** (the US SSN AAA-GG-SSSS layout as the
  *    concrete instance), gated by the published structural rules: area
  *    not 000/666/9xx, group not 00, serial not 0000 (SSA randomization
  *    rules, public since 2011).
  *
  * The lake text is synthetic and clean, so each class is INJECTED
  * deterministically by doc_id — valid AND deliberately-invalid
  * specimens (checksum broken by +5; area 666 / serial 0000) on
  * DISJOINT doc_id residues, the scd2_conformance disjoint-defect-class
  * pattern — so every detector arm is provably exercised: the valid
  * counts must equal the injection census and the invalid specimens
  * must surface as REJECTED, never as hits.
  *
  * Both engines compute the same integer arithmetic: Spark as codegen'd
  * HOF folds over `sequence` (no UDFs), DuckDB as LIST_SUM over RANGE.
  * Everything here is per-row scan work — no shuffle, no join; the
  * validation never leaves the row.
  */
private[graft] object PiiShapes {

  /** Candidate shapes (identical Java-regex / RE2 semantics). The card
    * pattern deliberately over-matches (any 16-digit run) — the Luhn
    * gate, not the regex, decides; same for the ID layout vs the
    * structural rules.
    */
  val CardPattern = "\\b[0-9]{16}\\b"
  val NidPattern = "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b"

  // ---------------------------------------------------------------
  // Spark side (Column DSL — stays inside whole-stage codegen)
  // ---------------------------------------------------------------

  private def doubled(d: Column): Column =
    when(d * 2 > 9, d * 2 - 9).otherwise(d * 2)

  /** Luhn sum of a full 16-digit candidate: position i from the LEFT is
    * doubled when i is odd (check digit at i = 16 never doubles).
    */
  private def luhnSum16(c: Column): Column =
    aggregate(sequence(lit(1), lit(16)), lit(0), (acc, i) => {
      val d = c.substr(i, lit(1)).cast("int")
      acc + when(i % 2 === 1, doubled(d)).otherwise(d)
    })

  /** Luhn-valid predicate for a 16-digit candidate. */
  def luhnValid(c: Column): Column = luhnSum16(c) % 10 === 0

  /** Luhn sum of a 15-digit PAYLOAD about to receive a check digit:
    * payload position j sits at full-number position j, so j odd
    * doubles (the check digit lands at 16).
    */
  private def luhnSum15(p: Column): Column =
    aggregate(sequence(lit(1), lit(15)), lit(0), (acc, j) => {
      val d = p.substr(j, lit(1)).cast("int")
      acc + when(j % 2 === 1, doubled(d)).otherwise(d)
    })

  private def checkDigit(p: Column): Column =
    (lit(10) - luhnSum15(p) % 10) % 10

  private def payload(id: Column, prefix: String): Column =
    concat(lit(prefix), lpad((id % 100000000000000L).cast("string"), 14, "0"))

  /** Structural-rules predicate for an AAA-GG-SSSS candidate. */
  def nidValid(s: Column): Column = {
    val area = s.substr(lit(1), lit(3)).cast("int")
    val group = s.substr(lit(5), lit(2)).cast("int")
    val serial = s.substr(lit(8), lit(4)).cast("int")
    area =!= 0 && area =!= 666 && area < 900 && group =!= 0 && serial =!= 0
  }

  private def nidArea(id: Column): Column = (id % 500 + 100).cast("string")
  private def nidGroup(id: Column): Column = (id % 89 + 10).cast("string")
  private def nidSerial(id: Column): Column =
    lpad((id % 9998 + 1).cast("string"), 4, "0")

  /** The deterministic injection suffix for a doc_id column: a
    * Luhn-VALID card every 7th doc, a checksum-BROKEN card-shaped
    * number every 11th (check digit shifted +5 — never ≡ 0 mod 10), a
    * structurally valid national ID every 13th, and an invalid one
    * every 17th (area 666 on even ids, serial 0000 on odd). Residues
    * 7/11/13/17 are pairwise coprime, so every combination class is
    * populated once the corpus passes ~4 digits of docs, and each
    * detector arm has specimens that ONLY it accepts/rejects.
    */
  def injection(id: Column): Column = {
    val p4 = payload(id, "4")
    val p5 = payload(id, "5")
    concat(
      when(id % 7 === 0,
        concat(lit(" card: "), p4, checkDigit(p4).cast("string")))
        .otherwise(lit("")),
      when(id % 11 === 0,
        concat(lit(" card: "), p5,
          ((checkDigit(p5) + 5) % 10).cast("string")))
        .otherwise(lit("")),
      when(id % 13 === 0,
        concat(lit(" id: "), nidArea(id), lit("-"), nidGroup(id), lit("-"),
          nidSerial(id)))
        .otherwise(lit("")),
      when(id % 17 === 0,
        when(id % 2 === 0,
          concat(lit(" id: 666-"), nidGroup(id), lit("-"), nidSerial(id)))
          .otherwise(
            concat(lit(" id: "), nidArea(id), lit("-"), nidGroup(id),
              lit("-0000"))))
        .otherwise(lit("")))
  }

  /** Luhn-valid candidates extracted from a text column. */
  def validCards(text: Column): Column =
    filter(regexp_extract_all(text, lit(CardPattern), lit(0)),
      c => luhnValid(c))

  /** Structurally valid national-ID candidates. */
  def validNids(text: Column): Column =
    filter(regexp_extract_all(text, lit(NidPattern), lit(0)),
      s => nidValid(s))

  /** All card-shaped candidates (valid or not) — the rejected count is
    * shapes minus valid.
    */
  def cardShapes(text: Column): Column =
    regexp_extract_all(text, lit(CardPattern), lit(0))

  def nidShapes(text: Column): Column =
    regexp_extract_all(text, lit(NidPattern), lit(0))

  // ---------------------------------------------------------------
  // DuckDB side (SQL fragments the oracles interpolate)
  // ---------------------------------------------------------------

  private def sqlDoubled(d: String): String =
    s"(CASE WHEN 2 * $d > 9 THEN 2 * $d - 9 ELSE 2 * $d END)"

  /** Luhn sum over positions 1..n of string expression `e`, doubling
    * odd positions; `v` names the lambda variable (unique per nesting
    * level — DuckDB lambdas shadow like Spark's).
    */
  private def sqlLuhnSum(e: String, n: Int, v: String): String = {
    val d = s"CAST(SUBSTR($e, CAST($v AS INT), 1) AS INT)"
    s"LIST_SUM(LIST_TRANSFORM(RANGE(1, ${n + 1}), $v -> " +
      s"CASE WHEN $v % 2 = 1 THEN ${sqlDoubled(d)} ELSE $d END))"
  }

  /** Luhn-valid predicate over a candidate expression (lambda var `v`). */
  def sqlLuhnValid(e: String, v: String): String =
    s"${sqlLuhnSum(e, 16, v)} % 10 = 0"

  def sqlNidValid(e: String): String =
    s"(CAST(SUBSTR($e, 1, 3) AS INT) NOT IN (0, 666)" +
      s" AND CAST(SUBSTR($e, 1, 3) AS INT) < 900" +
      s" AND CAST(SUBSTR($e, 5, 2) AS INT) <> 0" +
      s" AND CAST(SUBSTR($e, 8, 4) AS INT) <> 0)"

  private def sqlPayload(prefix: String): String =
    s"'$prefix' || LPAD(CAST(doc_id % 100000000000000 AS VARCHAR), 14, '0')"

  private def sqlCheckDigit(p: String, v: String): String =
    s"(10 - ${sqlLuhnSum(p, 15, v)} % 10) % 10"

  private val SqlArea = "CAST(doc_id % 500 + 100 AS VARCHAR)"
  private val SqlGroup = "CAST(doc_id % 89 + 10 AS VARCHAR)"
  private val SqlSerial = "LPAD(CAST(doc_id % 9998 + 1 AS VARCHAR), 4, '0')"

  /** The injection suffix, DuckDB spelling — term-for-term the mirror
    * of [[injection]]; distinct lambda vars per fold (j4/j5) keep the
    * nested folds unambiguous.
    */
  val SqlInjection: String =
    s"""(CASE WHEN doc_id % 7 = 0
        THEN ' card: ' || ${sqlPayload("4")}
          || CAST(${sqlCheckDigit(sqlPayload("4"), "j4")} AS VARCHAR)
        ELSE '' END)
      || (CASE WHEN doc_id % 11 = 0
        THEN ' card: ' || ${sqlPayload("5")}
          || CAST((${sqlCheckDigit(sqlPayload("5"), "j5")} + 5) % 10 AS VARCHAR)
        ELSE '' END)
      || (CASE WHEN doc_id % 13 = 0
        THEN ' id: ' || $SqlArea || '-' || $SqlGroup || '-' || $SqlSerial
        ELSE '' END)
      || (CASE WHEN doc_id % 17 = 0
        THEN (CASE WHEN doc_id % 2 = 0
          THEN ' id: 666-' || $SqlGroup || '-' || $SqlSerial
          ELSE ' id: ' || $SqlArea || '-' || $SqlGroup || '-0000' END)
        ELSE '' END)"""

  /** DuckDB escaped candidate patterns (SQL string literal spelling). */
  val SqlCardPattern = "\\b[0-9]{16}\\b"
  val SqlNidPattern = "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b"
}
