package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-quality checks (§2.B adjunct) — the reference's `check_DWH.py`
  * as a declarative rule evaluation: domain constraints, referential
  * integrity, and key uniqueness, each reported as a violation count.
  * Every rule is a scan-or-join aggregation — at 100 TB the whole suite
  * is a handful of map-side-combinable passes, not row-by-row assertions.
  */
object Quality {

  def dqChecks(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
    val o = Tables.orders(spark, dir)

    def rule(name: String, df: DataFrame): DataFrame =
      df.select(lit(name).as("rule"), count(lit(1)).as("n_violations"))

    // The three fact-table DOMAIN rules fuse into ONE conditional
    // aggregation — one scan of the (100 TB) fact table instead of
    // three; stack() pivots the counts back to one row per rule. A
    // zero-violation rule still yields its row (the aggregate always
    // returns one row), matching the oracle's per-rule COUNT(*) shape.
    val domains = l.agg(
        count(when(col("l_quantity") < 1 || col("l_quantity") > 50, 1))
          .as("c_qty"),
        count(when(col("l_discount") < 0 || col("l_discount") > 0.1, 1))
          .as("c_disc"),
        count(when(col("l_extendedprice") <= 0, 1)).as("c_price"))
      .selectExpr("""stack(3,
        'quantity_in_1_50', c_qty,
        'discount_in_0_0.1', c_disc,
        'extendedprice_positive', c_price) AS (rule, n_violations)""")
    // Four orphan rules anti-join the same orders key set — materialize
    // the (narrow) key frame once instead of re-scanning orders per rule.
    val okeys = o.select(col("o_orderkey")).transform(graft.functions.PlanGuard.persist(_))
    val orphans = rule("lineitem_orphans",
      l.join(okeys, col("l_orderkey") === col("o_orderkey"), "left_anti"))
    val dupKeys = rule("duplicate_line_keys",
      l.groupBy(col("l_orderkey"), col("l_linenumber"))
        .agg(count(lit(1)).as("n")).filter(col("n") > 1))
    // Referential rules over the DWH bridge/edge dims (check_DWH.py FK
    // constraints, evaluated as violation scans instead of per-row FKs).
    // The bridge feeds two rules — materialize it once. Orphan rules
    // count DISTINCT violating keys (not violating rows) so a
    // three-author orphaned publication is one violation, not three.
    val bridge = Dwh.bridgeAuthor(spark, dir).transform(graft.functions.PlanGuard.persist(_))
    val bridgeOrphans = rule("bridge_orphan_publications",
      bridge.select(col("publication_key")).distinct()
        .join(okeys, col("publication_key") === col("o_orderkey"), "left_anti"))
    val bridgeWeights = rule("bridge_weight_not_1",
      bridge
        .groupBy(col("publication_key"))
        .agg(sum(col("allocation_weight")).as("wsum"))
        .filter(abs(col("wsum") - 1.0) > 1e-6))
    // dimReferences ends in a groupBy(pid, doi), so a duplicate-PK check
    // on its output would be a tautology; the meaningful FK rule is that
    // every reference's publication exists.
    val refOrphans = rule("references_orphan_pids",
      Dwh.dimReferences(spark, dir)
        .select(col("pid")).distinct()
        .join(okeys, col("pid") === col("o_orderkey"), "left_anti"))
    // check_DWH.py:67-109 PK/FK constraints on the remaining dims,
    // evaluated the same way: PRIMARY KEY → duplicate-key scan, FK →
    // distinct-orphan anti join, CHECK-style domain rules inline.
    val snDupKeys = rule("publish_sn_duplicate_keys",
      Dwh.dimPublishSn(spark, dir)
        .groupBy(col("pid"), col("issn_number"))
        .agg(count(lit(1)).as("n")).filter(col("n") > 1))
    // Two rules read the version dim — derive it once (at 100 TB the dq
    // suite reads the STAGED dim tables the DWH pipeline already wrote;
    // re-deriving per rule is the operator-form concession, so at least
    // never derive the same dim twice).
    val pubVersion = Dwh.dimPubVersion(spark, dir).transform(graft.functions.PlanGuard.persist(_))
    val versionDupKeys = rule("pub_version_duplicate_keys",
      pubVersion
        .groupBy(col("pid"), col("vid"))
        .agg(count(lit(1)).as("n")).filter(col("n") > 1))
    val versionOrphans = rule("pub_version_orphan_pids",
      pubVersion
        .select(col("pid")).distinct()
        .join(okeys, col("pid") === col("o_orderkey"), "left_anti"))
    val licenseDelayDomain = rule("license_delay_nonnegative",
      Dwh.dimLicense(spark, dir).filter(col("license_delay") < 0))
    val publisherDupNames = rule("publisher_duplicate_names",
      Dwh.dimPublisher(spark, dir)
        .groupBy(col("publisher_name"))
        .agg(count(lit(1)).as("n")).filter(col("n") > 1))

    domains
      .unionByName(orphans)
      .unionByName(dupKeys)
      .unionByName(bridgeOrphans)
      .unionByName(bridgeWeights)
      .unionByName(refOrphans)
      .unionByName(snDupKeys)
      .unionByName(versionDupKeys)
      .unionByName(versionOrphans)
      .unionByName(licenseDelayDomain)
      .unionByName(publisherDupNames)
  }

  lazy val dqChecksOracle: String = s"""
    SELECT 'quantity_in_1_50' AS rule, COUNT(*) AS n_violations
    FROM lineitem WHERE l_quantity < 1 OR l_quantity > 50
    UNION ALL
    SELECT 'discount_in_0_0.1', COUNT(*)
    FROM lineitem WHERE l_discount < 0 OR l_discount > 0.1
    UNION ALL
    SELECT 'extendedprice_positive', COUNT(*)
    FROM lineitem WHERE l_extendedprice <= 0
    UNION ALL
    SELECT 'lineitem_orphans', COUNT(*)
    FROM lineitem WHERE NOT EXISTS
      (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey)
    UNION ALL
    SELECT 'duplicate_line_keys', COUNT(*)
    FROM (SELECT l_orderkey, l_linenumber FROM lineitem
          GROUP BY 1, 2 HAVING COUNT(*) > 1)
    UNION ALL
    SELECT 'bridge_orphan_publications', COUNT(*)
    FROM (SELECT DISTINCT l_orderkey AS publication_key FROM lineitem) b
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_orderkey = b.publication_key)
    UNION ALL
    SELECT 'bridge_weight_not_1', COUNT(*)
    FROM (
      SELECT publication_key, SUM(w) AS wsum
      FROM (
        SELECT publication_key,
          CAST(1.0 AS DOUBLE) / CAST(COUNT(*) OVER (PARTITION BY publication_key) AS DOUBLE) AS w
        FROM (SELECT DISTINCT l_orderkey AS publication_key, l_suppkey FROM lineitem))
      GROUP BY 1 HAVING ABS(SUM(w) - 1.0) > 1e-6)
    UNION ALL
    SELECT 'references_orphan_pids', COUNT(*)
    FROM (SELECT DISTINCT l_orderkey AS pid FROM lineitem) r
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_orderkey = r.pid)
    UNION ALL
    SELECT 'publish_sn_duplicate_keys', COUNT(*)
    FROM (SELECT pid, issn_number FROM (${Dwh.dimPublishSnOracle})
          GROUP BY 1, 2 HAVING COUNT(*) > 1)
    UNION ALL
    SELECT 'pub_version_duplicate_keys', COUNT(*)
    FROM (SELECT pid, vid FROM (${Dwh.dimPubVersionOracle})
          GROUP BY 1, 2 HAVING COUNT(*) > 1)
    UNION ALL
    SELECT 'pub_version_orphan_pids', COUNT(*)
    FROM (SELECT DISTINCT pid FROM (${Dwh.dimPubVersionOracle})) v
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_orderkey = v.pid)
    UNION ALL
    SELECT 'license_delay_nonnegative', COUNT(*)
    FROM (${Dwh.dimLicenseOracle}) WHERE license_delay < 0
    UNION ALL
    SELECT 'publisher_duplicate_names', COUNT(*)
    FROM (SELECT publisher_name FROM (${Dwh.dimPublisherOracle})
          GROUP BY 1 HAVING COUNT(*) > 1)"""

  /** Re-identification threshold: a quasi-identifier group smaller
    * than this is reportable.
    */
  private val KAnon = 5

  /** k-anonymity audit over the customer quasi-identifiers
    * (nation, market segment, account-balance band): any combination
    * shared by fewer than [[KAnon]] customers is a re-identification
    * risk — the governance check a released dataset runs before
    * publication (the privacy-side complement of pii_scrub, which
    * redacts direct identifiers; quasi-identifiers leak by COMBINATION
    * and only a group-size audit sees that). One aggregate over the
    * projected quasi columns — map-side combinable, the group frame is
    * quasi-cardinality-sized at any table size. The balance band
    * (floor(acctbal/1000)) is the generalization step of the
    * Sweeney-style anonymization loop: rerun the audit per
    * generalization level until no risky groups remain.
    *
    * Population-with-verdict form (the r15 sf1 de-vacuation): the 20
    * SMALLEST quasi-groups under a total order (size ASC then the
    * quasi columns), each flagged `is_risky = size < KAnon` — at sf1
    * the fixed-cardinality quasi space (25×5×11 cells) fills until no
    * group sits under 5 and the old risky-rows-only output
    * hash-matched two empty sets. The auditor reads the smallest
    * groups either way; the verdict is the flag.
    */
  def kAnonymityAudit(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .select(col("c_nationkey").cast("long").as("nationkey"),
        col("c_mktsegment").as("mktsegment"),
        floor(col("c_acctbal") / lit(1000d)).as("bal_band"))
      .groupBy(col("nationkey"), col("mktsegment"), col("bal_band"))
      .agg(count(lit(1)).as("group_size"))
      .orderBy(col("group_size").asc, col("nationkey").asc,
        col("mktsegment").asc, col("bal_band").asc)
      .limit(20)
      .withColumn("is_risky", col("group_size") < KAnon)

  val kAnonymityAuditOracle: String = s"""
    SELECT nationkey, mktsegment, bal_band, group_size,
      (group_size < $KAnon) AS is_risky
    FROM (
      SELECT CAST(c_nationkey AS BIGINT) AS nationkey,
        c_mktsegment AS mktsegment,
        CAST(FLOOR(c_acctbal / 1000) AS BIGINT) AS bal_band,
        CAST(COUNT(*) AS BIGINT) AS group_size
      FROM customer
      GROUP BY 1, 2, 3)
    ORDER BY group_size ASC, nationkey ASC, mktsegment ASC, bal_band ASC
    LIMIT 20"""

  /** The account-balance generalization rungs: band width 10^g dollars
    * for g = 0..4, then g = 5 suppresses the attribute entirely (one
    * whole-domain band).
    */
  private val LadderRungs = 0 to 5

  /** The k-anonymity PLANNER that turns [[kAnonymityAudit]]'s finding
    * into an action: for every generalization rung of the balance
    * quasi-identifier (band width 10^g, g = 5 = suppress), the
    * residual-risk profile — group count, minimum group size, groups
    * under k, and the share of customers already inside k-anonymous
    * groups — plus the recommendation flag on the SMALLEST rung whose
    * minimum group size clears k = 5. This is the table a data-release
    * review reads to pick the least-destructive generalization.
    * Scale: the quasi-id projection is checkpointed once and each of
    * the six rungs is one map-side-combinable aggregate over it; the
    * ladder output is 6 rows.
    */
  def generalizationLadder(spark: SparkSession, dir: String): DataFrame = {
    val base = graft.functions.Iterate.checkpoint(
      Tables.customer(spark, dir)
        .select(col("c_nationkey").cast("long").as("nationkey"),
          col("c_mktsegment").as("mktsegment"),
          col("c_acctbal")))
    val perRung = LadderRungs.map { g =>
      val band =
        if (g >= 5) lit(0L)
        else floor(col("c_acctbal") / lit(math.pow(10.0, g))).cast("long")
      base
        .groupBy(col("nationkey"), col("mktsegment"), band.as("band"))
        .agg(count(lit(1)).as("n"))
        .agg(
          lit(g.toLong).as("rung"),
          lit(if (g >= 5) 0L else math.pow(10.0, g).toLong)
            .as("band_width_dollars"),
          count(lit(1)).as("n_groups"),
          min(col("n")).as("min_k"),
          sum(when(col("n") < KAnon, 1L).otherwise(0L)).as("under_k_groups"),
          expr(s"(sum(CASE WHEN n >= $KAnon THEN n ELSE 0 END) * 1000000) " +
            "div sum(n)").as("anon_share_ppm"))
    }.reduce(_ unionByName _)
    import org.apache.spark.sql.expressions.Window
    perRung
      .withColumn("k_ok", when(col("min_k") >= KAnon, 1L).otherwise(0L))
      .withColumn("prior_ok",
        coalesce(sum(col("k_ok")).over(
          Window.orderBy(col("rung").asc)
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("recommended",
        col("k_ok") === 1L && col("prior_ok") === 0L)
      .select(col("rung"), col("band_width_dollars"), col("n_groups"),
        col("min_k"), col("under_k_groups"), col("anon_share_ppm"),
        col("recommended"))
  }

  val generalizationLadderOracle: String = {
    val rungs = LadderRungs.map { g =>
      val band = if (g >= 5) "CAST(0 AS BIGINT)"
        else s"CAST(FLOOR(c_acctbal / ${math.pow(10.0, g).toLong}) AS BIGINT)"
      s"""
      SELECT CAST($g AS BIGINT) AS rung,
        CAST(${if (g >= 5) 0L else math.pow(10.0, g).toLong} AS BIGINT)
          AS band_width_dollars,
        COUNT(*) AS n_groups,
        CAST(MIN(n) AS BIGINT) AS min_k,
        CAST(SUM(CASE WHEN n < $KAnon THEN 1 ELSE 0 END) AS BIGINT)
          AS under_k_groups,
        (CAST(SUM(CASE WHEN n >= $KAnon THEN n ELSE 0 END) AS BIGINT)
          * 1000000) // CAST(SUM(n) AS BIGINT) AS anon_share_ppm
      FROM (
        SELECT CAST(c_nationkey AS BIGINT) AS nationkey, c_mktsegment,
          $band AS band, COUNT(*) AS n
        FROM customer GROUP BY 1, 2, 3)"""
    }.mkString("\n      UNION ALL ")
    s"""
    WITH ladder AS ($rungs),
    flagged AS (
      SELECT *,
        CASE WHEN min_k >= $KAnon THEN 1 ELSE 0 END AS k_ok,
        COALESCE(CAST(SUM(CASE WHEN min_k >= $KAnon THEN 1 ELSE 0 END)
          OVER (ORDER BY rung ASC
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0)
          AS prior_ok
      FROM ladder)
    SELECT rung, band_width_dollars, n_groups, min_k, under_k_groups,
      anon_share_ppm,
      (k_ok = 1 AND prior_ok = 0) AS recommended
    FROM flagged"""
  }

  /** The erasure-request subject ids (user ≘ custkey, the identity the
    * as-of join already relies on).
    */
  private val ErasureSubjects = Seq(3L, 17L, 42L)

  /** Right-to-erasure impact audit (the GDPR Art. 17 dry run): for a
    * batch of subject ids, the exact row counts each table loses —
    * including the REFERENTIAL CASCADE (lineitem rows fall with their
    * parent orders, though lineitem itself carries no subject id).
    * This is the plan a deletion job executes and the evidence a
    * compliance log records; at 100 TB each count is one
    * broadcast-semi-joined scan (the subject list is tiny by
    * construction), and the cascade resolves through the orders
    * keys, never a three-way join of the fact tables.
    */
  def rightToErasure(spark: SparkSession, dir: String): DataFrame = {
    val subjects = broadcast(
      spark.createDataFrame(ErasureSubjects.map(Tuple1(_))).toDF("sid"))
    def audit(name: String, df: DataFrame, key: String): DataFrame = {
      val hits = df.join(subjects, col(key) === col("sid"), "left_semi")
      df.select(lit(name).as("table_name"), count(lit(1)).as("n_rows"))
        .crossJoin(broadcast(
          hits.select(count(lit(1)).as("n_to_erase"))))
    }
    val erasedOrders = Tables.orders(spark, dir)
      .join(subjects, col("o_custkey") === col("sid"), "left_semi")
      .select(col("o_orderkey"))
    val cascadeLineitem = Tables.lineitem(spark, dir)
      .join(Tables.dimHint(erasedOrders),
        col("l_orderkey") === col("o_orderkey"), "left_semi")
    audit("customer", Tables.customer(spark, dir), "c_custkey")
      .unionByName(audit("orders", Tables.orders(spark, dir), "o_custkey"))
      .unionByName(audit("events", Tables.events(spark, dir), "user_id"))
      .unionByName(
        Tables.lineitem(spark, dir)
          .select(lit("lineitem").as("table_name"),
            count(lit(1)).as("n_rows"))
          .crossJoin(broadcast(
            cascadeLineitem.select(count(lit(1)).as("n_to_erase")))))
  }

  val rightToErasureOracle: String = {
    val ids = ErasureSubjects.mkString(", ")
    s"""
    SELECT 'customer' AS table_name, COUNT(*) AS n_rows,
      (SELECT COUNT(*) FROM customer WHERE c_custkey IN ($ids))
        AS n_to_erase
    FROM customer
    UNION ALL
    SELECT 'orders', COUNT(*),
      (SELECT COUNT(*) FROM orders WHERE o_custkey IN ($ids))
    FROM orders
    UNION ALL
    SELECT 'events', COUNT(*),
      (SELECT COUNT(*) FROM events WHERE user_id IN ($ids))
    FROM events
    UNION ALL
    SELECT 'lineitem', COUNT(*),
      (SELECT COUNT(*) FROM lineitem
       WHERE l_orderkey IN
         (SELECT o_orderkey FROM orders WHERE o_custkey IN ($ids)))
    FROM lineitem"""
  }

  /** floor(log10(1 + 1/d) · 1e6) for d = 1..9 — Benford's first-digit
    * law as INTEGER ppm constants, identical literals in both engines
    * (computing log10 at runtime would reintroduce the libm
    * nondeterminism the tfidf linear-idf treatment exists to avoid).
    */
  private val BenfordPpm =
    Seq(301029L, 176091L, 124938L, 96910L, 79181L, 66946L, 57991L, 51152L, 45757L)

  /** Benford's-law conformance audit over the two money columns — the
    * fabricated-data / corrupted-feed detector for a financial fact
    * table (a synthetic or truncated feed shows a flat or spiked
    * first-digit profile long before row-level rules fire). First digit
    * from exact integer cents via string head — no logarithms anywhere:
    * observed shares are integer ppm and the expectation is a shared
    * literal table, so the deviation column is exact. Two
    * map-side-combinable 9-group aggregates, one per measure scan.
    */
  def benfordAudit(spark: SparkSession, dir: String): DataFrame = {
    val expected = element_at(
      array(BenfordPpm.map(lit): _*), col("digit").cast("int"))
    def digits(df: DataFrame, valueCol: String, name: String): DataFrame =
      df.select(substring(
          floor(col(valueCol) * 100 + lit(0.5)).cast("bigint").cast("string"),
          1, 1).cast("bigint").as("digit"))
        .groupBy(col("digit")).agg(count(lit(1)).as("n"))
        .select(lit(name).as("col_name"), col("digit"), col("n"))
    digits(Tables.lineitem(spark, dir), "l_extendedprice", "l_extendedprice")
      .unionByName(digits(Tables.orders(spark, dir), "o_totalprice", "o_totalprice"))
      .withColumn("total",
        sum(col("n")).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("col_name"))))
      .select(col("col_name"), col("digit"), col("n"),
        expr("(n * 1000000) div total").as("observed_ppm"),
        expected.as("expected_ppm"))
      .withColumn("dev_ppm", col("observed_ppm") - col("expected_ppm"))
  }

  val benfordAuditOracle: String = {
    val arr = BenfordPpm.mkString("[", ", ", "]")
    s"""
    WITH d AS (
      SELECT 'l_extendedprice' AS col_name,
        CAST(SUBSTRING(CAST(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)
          AS VARCHAR), 1, 1) AS BIGINT) AS digit
      FROM lineitem
      UNION ALL
      SELECT 'o_totalprice',
        CAST(SUBSTRING(CAST(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)
          AS VARCHAR), 1, 1) AS BIGINT)
      FROM orders),
    g AS (SELECT col_name, digit, COUNT(*) AS n FROM d GROUP BY 1, 2)
    SELECT col_name, digit, n,
      (n * 1000000) // CAST(SUM(n) OVER (PARTITION BY col_name) AS BIGINT)
        AS observed_ppm,
      LIST_EXTRACT($arr, CAST(digit AS INT)) AS expected_ppm,
      (n * 1000000) // CAST(SUM(n) OVER (PARTITION BY col_name) AS BIGINT)
        - LIST_EXTRACT($arr, CAST(digit AS INT)) AS dev_ppm
    FROM g"""
  }

  /** l-diversity audit — [[kAnonymityAudit]]'s companion gate: a
    * quasi-identifier group can be k-anonymous yet still leak when every
    * member shares the SAME sensitive value (homogeneity attack), so
    * this measures the number of DISTINCT sensitive values (market
    * segment) per quasi group (nation × balance band) and reports the
    * distribution of l — groups at l = 1 are disclosure risks no group
    * SIZE audit sees. Two map-side-combinable aggregates ending at
    * l-cardinality rows; the histogram share is exact integer ppm.
    */
  def lDiversityAudit(spark: SparkSession, dir: String): DataFrame = {
    // the |distinct l|-row summary materializes once (one corpus scan);
    // the share denominator is then a broadcast one-row total instead of
    // a SUM() OVER () — keeping the registry free of unpartitioned
    // window nodes entirely.
    val grouped = graft.functions.Iterate.checkpoint(
      Tables.customer(spark, dir)
        .select(col("c_nationkey").cast("long").as("nationkey"),
          floor(col("c_acctbal") / lit(1000d)).as("bal_band"),
          col("c_mktsegment"))
        .groupBy(col("nationkey"), col("bal_band"))
        .agg(countDistinct(col("c_mktsegment")).as("l_distinct"),
          count(lit(1)).as("n_members"))
        .groupBy(col("l_distinct"))
        .agg(count(lit(1)).as("n_groups"),
          sum(col("n_members")).as("n_customers")))
    val tot = grouped.agg(sum(col("n_groups")).as("__all_groups"))
    grouped.crossJoin(broadcast(tot))
      .withColumn("groups_share_ppm",
        expr("(n_groups * 1000000) div __all_groups"))
      .drop("__all_groups")
  }

  val lDiversityAuditOracle: String = """
    WITH g AS (
      SELECT CAST(c_nationkey AS BIGINT) AS nationkey,
        CAST(FLOOR(c_acctbal / 1000) AS BIGINT) AS bal_band,
        COUNT(DISTINCT c_mktsegment) AS l_distinct,
        COUNT(*) AS n_members
      FROM customer GROUP BY 1, 2)
    SELECT l_distinct, COUNT(*) AS n_groups,
      CAST(SUM(n_members) AS BIGINT) AS n_customers,
      (COUNT(*) * 1000000)
        // CAST(SUM(COUNT(*)) OVER () AS BIGINT) AS groups_share_ppm
    FROM g GROUP BY 1"""

  /** t-closeness audit — the third leg of the privacy-gate trio
    * ([[kAnonymityAudit]] bounds group size, [[lDiversityAudit]] bounds
    * sensitive-value variety, this bounds sensitive-value SKEW): per
    * quasi-identifier group (nation × balance band), the total
    * variation distance between the group's mktsegment distribution
    * and the GLOBAL one — a group can be k-anonymous and l-diverse yet
    * still leak via a segment mix far from baseline. Unordered
    * categories make TVD the canonical t-closeness distance
    * (equal-ground-distance EMD).
    *
    * Integer-exact via the ks cross-multiplication: |c_gs/n_g − C_s/N|
    * = |c_gs·N − C_s·n_g| / (n_g·N), so t·2·n_g·N = Σ_s |c_gs·N −
    * C_s·n_g| folds in BIGINT; t_ppm divides once with the gini
    * overflow treatment, and the classic 0.2 breach flag compares the
    * ALREADY-REDUCED t_ppm (same value both engines, so the flag is
    * deterministic; ≤1 ppm truncation at the exact boundary). BIGINT
    * headroom: c_gs·N < 9.2e18 to ~3e9 customers; past that the fold
    * (not the data) moves to DECIMAL(38).
    *
    * Scale: ONE corpus scan into the (group × segment) cell aggregate
    * — bounded by |nations|·|bands|·|segments|, checkpointed; the
    * group/segment/global margins all fold over the checkpointed cells
    * and broadcast back onto the complete grid (absent segments must
    * contribute |0 − C_s·n_g|, so the grid is groups ⨯ segments, both
    * dimension-scale).
    */
  def tClosenessAudit(spark: SparkSession, dir: String): DataFrame = {
    val cells = graft.functions.Iterate.checkpoint(
      Tables.customer(spark, dir)
        .select(col("c_nationkey").cast("long").as("nationkey"),
          floor(col("c_acctbal") / lit(1000d)).as("bal_band"),
          col("c_mktsegment").as("mktsegment"))
        .groupBy(col("nationkey"), col("bal_band"), col("mktsegment"))
        .agg(count(lit(1)).as("c")))
    val groups = cells.groupBy(col("nationkey"), col("bal_band"))
      .agg(sum(col("c")).as("n_g"))
    val segs = cells.groupBy(col("mktsegment")).agg(sum(col("c")).as("c_s"))
    val tot = segs.agg(sum(col("c_s")).as("n_tot"))
    groups.crossJoin(broadcast(segs))
      .join(cells, Seq("nationkey", "bal_band", "mktsegment"), "left")
      .crossJoin(broadcast(tot))
      .withColumn("term",
        abs(coalesce(col("c"), lit(0L)) * col("n_tot")
          - col("c_s") * col("n_g")))
      .groupBy(col("nationkey"), col("bal_band"), col("n_g"), col("n_tot"))
      .agg(sum(col("term")).as("num"))
      .select(col("nationkey"), col("bal_band"), col("n_g").as("n_members"),
        when(col("n_g") * col("n_tot") <= lit(4500000000000L),
          expr("(num * 1000000) div (2 * n_g * n_tot)"))
          .otherwise(expr("num div ((2 * n_g * n_tot) div 1000000)"))
          .as("t_ppm"))
      .withColumn("breach_02", col("t_ppm") > lit(200000L))
  }

  val tClosenessAuditOracle: String = """
    WITH cells AS (
      SELECT CAST(c_nationkey AS BIGINT) AS nationkey,
        CAST(FLOOR(c_acctbal / 1000) AS BIGINT) AS bal_band,
        c_mktsegment AS mktsegment, CAST(COUNT(*) AS BIGINT) AS c
      FROM customer GROUP BY 1, 2, 3),
    groups AS (
      SELECT nationkey, bal_band, CAST(SUM(c) AS BIGINT) AS n_g
      FROM cells GROUP BY 1, 2),
    segs AS (
      SELECT mktsegment, CAST(SUM(c) AS BIGINT) AS c_s
      FROM cells GROUP BY 1),
    tot AS (SELECT CAST(SUM(c_s) AS BIGINT) AS n_tot FROM segs),
    grid AS (
      SELECT g.nationkey, g.bal_band, g.n_g, s.mktsegment, s.c_s, t.n_tot,
        ABS(COALESCE(c.c, 0) * t.n_tot - s.c_s * g.n_g) AS term
      FROM groups g CROSS JOIN segs s CROSS JOIN tot t
      LEFT JOIN cells c ON c.nationkey = g.nationkey
        AND c.bal_band = g.bal_band AND c.mktsegment = s.mktsegment),
    folded AS (
      SELECT nationkey, bal_band, n_g, n_tot,
        CAST(SUM(term) AS BIGINT) AS num
      FROM grid GROUP BY 1, 2, 3, 4)
    SELECT nationkey, bal_band, n_g AS n_members,
      t_ppm, (t_ppm > 200000) AS breach_02
    FROM (
      SELECT nationkey, bal_band, n_g,
        CASE WHEN n_g * n_tot <= 4500000000000
          THEN (num * 1000000) // (2 * n_g * n_tot)
          ELSE num // ((2 * n_g * n_tot) // 1000000) END AS t_ppm
      FROM folded)"""

  /** Differentially-private-shaped release counts via the BINOMIAL
    * mechanism (Dwork et al. 2006's original noise — binomial(n, ½)
    * approximates the Gaussian mechanism): each (nation, segment) count
    * is perturbed by popcount(48 salted hash bits) − 24, i.e. a
    * centered Binomial(48, ½) draw (σ ≈ 3.46) that is DETERMINISTIC
    * given the release salt — so the privacy job is reproducible,
    * auditable, and hash-testable, unlike rand()-noised counts (the
    * repo-wide no-rand discipline applied to privacy). Clamped at 0.
    * One map-side-combinable aggregate; noise is per-group expression
    * arithmetic.
    *
    * (A production ε-calibrated release scales n_bits to the target σ;
    * the MECHANISM — deterministic salted binomial noise — is the
    * operator.)
    */
  def dpNoisyCounts(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .groupBy(col("c_nationkey").cast("long").as("nationkey"),
        col("c_mktsegment").as("mktsegment"))
      .agg(count(lit(1)).as("n"))
      .withColumn("noise",
        bit_count(graft.functions.TextOps.hash24(
          concat(lit("dpA|"), col("nationkey").cast("string"), lit("|"), col("mktsegment"))))
          .cast("long")
          + bit_count(graft.functions.TextOps.hash24(
            concat(lit("dpB|"), col("nationkey").cast("string"), lit("|"), col("mktsegment"))))
            .cast("long")
          - lit(24L))
      .select(col("nationkey"), col("mktsegment"),
        greatest(col("n") + col("noise"), lit(0L)).as("noisy_count"))

  val dpNoisyCountsOracle: String = """
    WITH g AS (
      SELECT CAST(c_nationkey AS BIGINT) AS nationkey,
        c_mktsegment AS mktsegment, COUNT(*) AS n
      FROM customer GROUP BY 1, 2)
    SELECT nationkey, mktsegment,
      GREATEST(n
        + BIT_COUNT(CAST('0x' || SUBSTR(MD5('dpA|' || CAST(nationkey AS VARCHAR)
          || '|' || mktsegment), 1, 6) AS BIGINT))
        + BIT_COUNT(CAST('0x' || SUBSTR(MD5('dpB|' || CAST(nationkey AS VARCHAR)
          || '|' || mktsegment), 1, 6) AS BIGINT))
        - 24, 0) AS noisy_count
    FROM g"""

  /** SCD2 validity-window conformance audit — the DQ gate for the one
    * dimension property point-in-time joins silently DEPEND on
    * ([[graft.operators.Relational]] scd2_point_in_time's tiling
    * invariant holds only if the dim is conformant): per key, sorted
    * validity windows must not OVERLAP (double-counted facts), must not
    * leave a GAP (dropped facts), and the chain must end OPEN at the
    * 9999 sentinel (future facts need a home). The audited dim is
    * derived from customer with DETERMINISTIC defect injection (the
    * snapshot_diff self-synthesis idiom — swap a real dim in for
    * production): every key ≡4 (mod 13) gains a duplicate window
    * (overlap), delinquent keys ≡9 re-open late (gap), non-delinquent
    * keys ≡2 truncate their only window (unclosed) — classes disjoint
    * and non-empty at every SF, so each detector is provably exercised.
    * Scale: one key-partitioned lag window over the DIM (dimension-
    * scale, never the facts) + two aggregates.
    */
  def scd2Conformance(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = Tables.customer(spark, dir)
    val delinquent = col("c_acctbal") < 0
    val hist = base.select(col("c_custkey"),
      lit("1970-01-01").as("valid_from"),
      when(delinquent, lit("1998-01-01"))
        .when(col("c_custkey") % 13 === 2, lit("1998-01-01"))
        .otherwise(lit("9999-12-31")).as("valid_to"))
    val fresh = base.filter(delinquent).select(col("c_custkey"),
      when(col("c_custkey") % 13 === 9, lit("1998-07-01"))
        .otherwise(lit("1998-01-01")).as("valid_from"),
      lit("9999-12-31").as("valid_to"))
    val dup = base.filter(col("c_custkey") % 13 === 4)
      .select(col("c_custkey"), lit("1997-06-01").as("valid_from"),
        lit("9999-12-31").as("valid_to"))
    val dim = hist.unionByName(fresh).unionByName(dup)
    val w = Window.partitionBy(col("c_custkey"))
      .orderBy(col("valid_from"), col("valid_to"))
    dim.withColumn("prev_to", lag(col("valid_to"), 1).over(w))
      .groupBy(col("c_custkey"))
      .agg(
        max(when(col("prev_to").isNotNull
          && col("valid_from") < col("prev_to"), 1L).otherwise(0L))
          .as("has_overlap"),
        max(when(col("prev_to").isNotNull
          && col("valid_from") > col("prev_to"), 1L).otherwise(0L))
          .as("has_gap"),
        max(when(col("valid_to") === "9999-12-31", 1L).otherwise(0L))
          .as("has_open"))
      .agg(count(lit(1)).as("n_keys"),
        sum(col("has_overlap")).as("n_overlap_keys"),
        sum(col("has_gap")).as("n_gap_keys"),
        sum(lit(1L) - col("has_open")).as("n_unclosed_keys"),
        sum(when(col("has_overlap") === 0 && col("has_gap") === 0
          && col("has_open") === 1, 1L).otherwise(0L)).as("n_clean_keys"))
  }

  val scd2ConformanceOracle: String = """
    WITH base AS (SELECT c_custkey, c_acctbal FROM customer),
    dim AS (
      SELECT c_custkey, '1970-01-01' AS valid_from,
        CASE WHEN c_acctbal < 0 THEN '1998-01-01'
             WHEN c_custkey % 13 = 2 THEN '1998-01-01'
             ELSE '9999-12-31' END AS valid_to
      FROM base
      UNION ALL
      SELECT c_custkey,
        CASE WHEN c_custkey % 13 = 9 THEN '1998-07-01'
             ELSE '1998-01-01' END,
        '9999-12-31'
      FROM base WHERE c_acctbal < 0
      UNION ALL
      SELECT c_custkey, '1997-06-01', '9999-12-31'
      FROM base WHERE c_custkey % 13 = 4),
    flagged AS (
      SELECT c_custkey, valid_from, valid_to,
        LAG(valid_to, 1) OVER (PARTITION BY c_custkey
          ORDER BY valid_from, valid_to) AS prev_to
      FROM dim),
    per_key AS (
      SELECT c_custkey,
        MAX(CASE WHEN prev_to IS NOT NULL AND valid_from < prev_to
          THEN 1 ELSE 0 END) AS has_overlap,
        MAX(CASE WHEN prev_to IS NOT NULL AND valid_from > prev_to
          THEN 1 ELSE 0 END) AS has_gap,
        MAX(CASE WHEN valid_to = '9999-12-31' THEN 1 ELSE 0 END) AS has_open
      FROM flagged GROUP BY 1)
    SELECT COUNT(*) AS n_keys,
      CAST(SUM(has_overlap) AS BIGINT) AS n_overlap_keys,
      CAST(SUM(has_gap) AS BIGINT) AS n_gap_keys,
      CAST(SUM(1 - has_open) AS BIGINT) AS n_unclosed_keys,
      CAST(SUM(CASE WHEN has_overlap = 0 AND has_gap = 0 AND has_open = 1
        THEN 1 ELSE 0 END) AS BIGINT) AS n_clean_keys
    FROM per_key"""

  def defs: Map[String, QueryDef] = Map(
    "scd2_conformance" ->
      QueryDef.sql(scd2Conformance, scd2ConformanceOracle),
    "dp_noisy_counts" -> QueryDef.sql(dpNoisyCounts, dpNoisyCountsOracle),
    "dq_checks" -> QueryDef.sql(dqChecks, dqChecksOracle),
    "k_anonymity_audit" -> QueryDef.sql(kAnonymityAudit, kAnonymityAuditOracle),
    "generalization_ladder" ->
      QueryDef.sql(generalizationLadder, generalizationLadderOracle),
    "right_to_erasure" -> QueryDef.sql(rightToErasure, rightToErasureOracle),
    "benford_audit" -> QueryDef.sql(benfordAudit, benfordAuditOracle),
    "l_diversity_audit" -> QueryDef.sql(lDiversityAudit, lDiversityAuditOracle),
    "t_closeness_audit" -> QueryDef.sql(tClosenessAudit, tClosenessAuditOracle)
  )
}
