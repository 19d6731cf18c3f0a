package graft.operators

import graft.{QueryDef, Tables}
import graft.functions.Exact
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Star-schema DWH builders (§2.B) — the reference's Kimball schema
  * (`check_DWH.py` table_creation_queries: publication_fact + 8 dims,
  * `populate_DWH.py` insert DAG) re-expressed as declarative fact/dim
  * builds over the lake.
  *
  * Scale notes: the fact build is a single fact-side scan joined to
  * `orders` on its key (both sides huge → shuffle hash join on the join
  * key, AQE-coalesced); every dimension is small relative to the fact and
  * joined with an explicit `broadcast()` hint so the star join never
  * shuffles the fact more than once.
  */
object Dwh {

  /** Fact table at lineitem grain: FK surrogate/date keys + measures —
    * reference `publication_fact` (check_DWH.py:18). Derived measures are
    * raw IEEE products (deterministic, unrounded); rounding happens only
    * at aggregate edges (see [[Exact]]).
    */
  def factSales(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
    val o = Tables.orders(spark, dir)
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .select(
        col("l_orderkey").as("order_key"),
        col("l_linenumber").as("line_number"),
        col("o_custkey").as("customer_key"),
        col("l_partkey").as("part_key"),
        col("l_suppkey").as("supplier_key"),
        date_format(col("o_orderdate"), "yyyyMMdd").cast("int").as("date_key"),
        col("l_quantity").as("quantity"),
        col("l_extendedprice").as("extended_price"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("net_price"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount"))
          * (lit(1.0) + col("l_tax"))).as("charge"))
  }

  val factSalesOracle: String = """
    SELECT l_orderkey AS order_key, l_linenumber AS line_number,
      o_custkey AS customer_key, l_partkey AS part_key, l_suppkey AS supplier_key,
      CAST(STRFTIME(o_orderdate, '%Y%m%d') AS INTEGER) AS date_key,
      l_quantity AS quantity, l_extendedprice AS extended_price,
      l_extendedprice * (1.0 - l_discount) AS net_price,
      l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS charge
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey"""

  /** Denormalized customer dimension with stable surrogate key + SCD2
    * bookkeeping columns — reference `dim_authors`/`dim_author_affiliation`
    * (check_DWH.py:26-44). Geography snowflake collapsed via broadcast.
    */
  def dimCustomer(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val n = Tables.nation(spark, dir)
    val r = Tables.region(spark, dir)
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .select(
        md5(col("c_custkey").cast("string")).as("customer_sk"),
        col("c_custkey").as("customer_key"),
        col("c_name").as("name"),
        col("n_name").as("nation"),
        col("r_name").as("region"),
        col("c_mktsegment").as("mktsegment"),
        lit(true).as("is_current"),
        lit("1970-01-01").as("valid_from"),
        lit("9999-12-31").as("valid_to"))
  }

  val dimCustomerOracle: String = """
    SELECT MD5(CAST(c_custkey AS VARCHAR)) AS customer_sk,
      c_custkey AS customer_key, c_name AS name, n_name AS nation,
      r_name AS region, c_mktsegment AS mktsegment,
      TRUE AS is_current, '1970-01-01' AS valid_from, '9999-12-31' AS valid_to
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey"""

  /** Star join rollup: fact ⋈ broadcast dims → revenue by region ×
    * mktsegment × order year — the reference's analytical DWH check.
    * One fact shuffle (lineitem⋈orders); nation/region broadcast hard
    * (fixed-size), customer under the [[Tables.dimHint]] size guard
    * (SF-proportional).
    */
  def starJoin(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    val n = Tables.nation(spark, dir)
    val r = Tables.region(spark, dir)
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(Tables.dimHint(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(
        col("r_name").as("region"),
        col("c_mktsegment").as("mktsegment"),
        year(col("o_orderdate")).as("order_year"))
      .agg(
        Exact.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
        count(lit(1)).as("n_items"))
  }

  val starJoinOracle: String = s"""
    SELECT r_name AS region, c_mktsegment AS mktsegment,
      CAST(YEAR(o_orderdate) AS INTEGER) AS order_year,
      ${Exact.sqlDsum("l_extendedprice * (1.0 - l_discount)")} AS revenue,
      COUNT(*) AS n_items
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY 1, 2, 3"""

  /** Left-outer enrichment join with null-defaulting for misses — the
    * reference's CrossRef/SemanticScholar DOI enrichment (api.py:5):
    * external metadata exists only for a subset; unmatched rows keep
    * flowing with 'Unknown' defaults (databases.py:137).
    */
  def enrichJoin(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    // "External API" source: metadata only available for a subset.
    val meta = Tables.customer(spark, dir)
      .filter(col("c_acctbal") > 0)
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
    o.join(Tables.dimHint(meta), col("o_custkey") === col("c_custkey"), "left")
      .select(
        col("o_orderkey"),
        col("o_custkey"),
        coalesce(col("c_name"), lit("Unknown")).as("customer_name"),
        coalesce(col("c_mktsegment"), lit("Unknown")).as("mktsegment"))
  }

  val enrichJoinOracle: String = """
    SELECT o_orderkey, o_custkey,
      COALESCE(c_name, 'Unknown') AS customer_name,
      COALESCE(c_mktsegment, 'Unknown') AS mktsegment
    FROM orders
    LEFT JOIN (SELECT c_custkey, c_name, c_mktsegment FROM customer WHERE c_acctbal > 0) c
      ON o_custkey = c_custkey"""

  /** Fact↔dim many-to-many bridge table with Kimball allocation weights —
    * reference fact↔dim_authors via the exploded authors array
    * (check_DWH.py:37-44 dim_authors, populated per publication author).
    * Here: publication (order) ↔ author (supplier) via lineitem, one
    * bridge row per distinct pair, weight = 1/#authors so weighted
    * rollups through the bridge don't double-count.
    *
    * Scale: distinct + one window over the SAME partitioning key — the
    * distinct's shuffle already clusters by publication, so the window
    * adds no second exchange.
    */
  def bridgeAuthor(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("publication_key"))
    Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("publication_key"), col("l_suppkey").as("author_key"))
      .distinct()
      .withColumn("allocation_weight",
        lit(1.0) / count(lit(1)).over(w).cast("double"))
  }

  val bridgeAuthorOracle: String = """
    SELECT publication_key, author_key,
      CAST(1.0 AS DOUBLE) / CAST(COUNT(*) OVER (PARTITION BY publication_key) AS DOUBLE)
        AS allocation_weight
    FROM (SELECT DISTINCT l_orderkey AS publication_key, l_suppkey AS author_key
          FROM lineitem)"""

  /** References edge dimension — reference `dim_references`
    * (check_DWH.py:92-99: pid ⋈ cited doi, PK (pid, doi)). Publication
    * (order) cites part (doi surrogate via md5); first citing line mints
    * the reference key, multiplicity kept as a measure.
    */
  def dimReferences(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("pid"),
        md5(col("l_partkey").cast("string")).as("doi"),
        col("l_linenumber"))
      .groupBy(col("pid"), col("doi"))
      .agg(min(col("l_linenumber")).as("first_line"),
        count(lit(1)).as("n_mentions"))
      .select(col("pid"), col("doi"),
        concat(lit("ref-"), col("first_line").cast("string")).as("ref_key"),
        col("n_mentions"))

  val dimReferencesOracle: String = """
    SELECT pid, doi, 'ref-' || CAST(first_line AS VARCHAR) AS ref_key, n_mentions
    FROM (
      SELECT l_orderkey AS pid, MD5(CAST(l_partkey AS VARCHAR)) AS doi,
        MIN(l_linenumber) AS first_line, COUNT(*) AS n_mentions
      FROM lineitem GROUP BY 1, 2)"""

  /** Affiliation dimension — reference `dim_author_affiliation`
    * (check_DWH.py:26-33: aff_id, affiliation, is_current, start/end).
    * Affiliations = the nations suppliers ("authors") belong to; one row
    * per affiliation with a deterministic md5 surrogate (SERIAL keys are
    * insert-order-dependent — useless on a distributed build) and SCD2
    * bookkeeping columns. Member count kept as a degenerate measure.
    * Snowflake collapse is a broadcast join; the groupBy key space is
    * the nation count, so the shuffle is trivially small at any SF.
    */
  def dimAuthorAffiliation(spark: SparkSession, dir: String): DataFrame = {
    val s = Tables.supplier(spark, dir)
    val n = Tables.nation(spark, dir)
    s.join(broadcast(n), s("s_nationkey") === n("n_nationkey"))
      .groupBy(col("n_name").as("affiliation"))
      .agg(count(lit(1)).as("n_authors"))
      .select(
        md5(col("affiliation")).as("aff_sk"),
        col("affiliation"),
        col("n_authors"),
        lit(true).as("is_current"),
        lit("1970-01-01").as("valid_from"),
        lit("9999-12-31").as("valid_to"))
  }

  val dimAuthorAffiliationOracle: String = """
    SELECT MD5(n_name) AS aff_sk, n_name AS affiliation,
      COUNT(*) AS n_authors, TRUE AS is_current,
      '1970-01-01' AS valid_from, '9999-12-31' AS valid_to
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    GROUP BY n_name"""

  /** Serial-number dimension — reference `dim_publish_sn`
    * (check_DWH.py:67-74: pid, issn_number, issn_type, PK (pid, issn)).
    * The "journal" identity is the ordering customer; its ISSN is an
    * md5-derived 9-char code (deterministic, format-shaped), the type
    * splits print/electronic on order status. Pure per-row projection —
    * no shuffle at all.
    */
  def dimPublishSn(spark: SparkSession, dir: String): DataFrame = {
    val issnMd5 = md5(col("o_custkey").cast("string"))
    Tables.orders(spark, dir).select(
      col("o_orderkey").as("pid"),
      concat(substring(issnMd5, 1, 4), lit("-"), substring(issnMd5, 5, 4))
        .as("issn_number"),
      when(col("o_orderstatus") === "F", lit("print"))
        .otherwise(lit("electronic")).as("issn_type"))
  }

  val dimPublishSnOracle: String = """
    SELECT o_orderkey AS pid,
      SUBSTR(MD5(CAST(o_custkey AS VARCHAR)), 1, 4) || '-' ||
        SUBSTR(MD5(CAST(o_custkey AS VARCHAR)), 5, 4) AS issn_number,
      CASE WHEN o_orderstatus = 'F' THEN 'print' ELSE 'electronic' END
        AS issn_type
    FROM orders"""

  /** License dimension — reference `dim_license` (check_DWH.py:76-84:
    * lid, license_start, license_url, license_content_version,
    * license_delay). License classes = order priorities; license_start =
    * earliest order under that class (a min-aggregate dim build),
    * license_delay derived from the class ordinal. Five-row dim; the
    * aggregation is map-side-combined to nothing.
    */
  def dimLicense(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_orderpriority").as("license_key"))
      .agg(date_format(min(col("o_orderdate")), "yyyy-MM-dd").as("license_start"))
      .select(
        md5(col("license_key")).as("lid"),
        col("license_start"),
        concat(lit("https://licenses.example.org/"),
          lower(regexp_replace(col("license_key"), "[^A-Za-z0-9]+", "-")))
          .as("license_url"),
        lit("vor").as("license_content_version"),
        (substring(col("license_key"), 1, 1).cast("int") * 30).as("license_delay"))

  val dimLicenseOracle: String = """
    SELECT MD5(license_key) AS lid, license_start,
      'https://licenses.example.org/' ||
        LOWER(REGEXP_REPLACE(license_key, '[^A-Za-z0-9]+', '-', 'g'))
        AS license_url,
      'vor' AS license_content_version,
      CAST(SUBSTR(license_key, 1, 1) AS INTEGER) * 30 AS license_delay
    FROM (
      SELECT o_orderpriority AS license_key,
        STRFTIME(MIN(o_orderdate), '%Y-%m-%d') AS license_start
      FROM orders GROUP BY 1)"""

  /** Publisher dimension — reference `dim_publisher` (check_DWH.py:86-90:
    * pub_id, publisher_name). Publishers = part brands; md5 surrogate
    * (see [[dimAuthorAffiliation]] on why not SERIAL). distinct on a
    * low-cardinality column → partial-aggregated scan.
    */
  def dimPublisher(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .select(col("p_brand").as("publisher_name")).distinct()
      .select(md5(col("publisher_name")).as("pub_id"), col("publisher_name"))

  val dimPublisherOracle: String = """
    SELECT MD5(publisher_name) AS pub_id, publisher_name
    FROM (SELECT DISTINCT p_brand AS publisher_name FROM part)"""

  /** Version dimension — reference `dim_pub_version` (check_DWH.py:102-109:
    * pid, vid, created_time, PK (pid, vid)) — built as an SCD2 history:
    * versions = a publication's lines ordered by event time, each
    * version's validity window closed by the NEXT version's
    * created_time (lead window), open-ended for the latest (is_current).
    * This is the scd2_merge pattern applied at dim-build time.
    *
    * Scale: one window over the publication key — a single shuffle by
    * pid, no self-join. Ordering ties broken by line number so the
    * window is a total order (deterministic lead).
    */
  def dimPubVersion(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("pid")).orderBy(col("created_time"), col("line"))
    Tables.lineitem(spark, dir)
      .select(
        col("l_orderkey").as("pid"),
        col("l_linenumber").as("line"),
        date_format(col("l_shipdate"), "yyyy-MM-dd HH:mm:ss").as("created_time"))
      .withColumn("vid", concat(lit("v"), col("line").cast("string")))
      .withColumn("valid_to",
        coalesce(lead(col("created_time"), 1).over(w), lit("9999-12-31 00:00:00")))
      .select(col("pid"), col("vid"), col("created_time"), col("valid_to"),
        (col("valid_to") === "9999-12-31 00:00:00").as("is_current"))
  }

  val dimPubVersionOracle: String = """
    SELECT pid, vid, created_time,
      COALESCE(
        LEAD(created_time) OVER (PARTITION BY pid ORDER BY created_time, line),
        '9999-12-31 00:00:00') AS valid_to,
      COALESCE(
        LEAD(created_time) OVER (PARTITION BY pid ORDER BY created_time, line),
        '9999-12-31 00:00:00') = '9999-12-31 00:00:00' AS is_current
    FROM (
      SELECT l_orderkey AS pid, l_linenumber AS line,
        'v' || CAST(l_linenumber AS VARCHAR) AS vid,
        STRFTIME(l_shipdate, '%Y-%m-%d %H:%M:%S') AS created_time
      FROM lineitem)"""

  /** Conformed DATE dimension generated from the fact table's own span
    * (the one dim every star schema needs and no source system ships):
    * one row per calendar day from min to max order date with the
    * standard role-playing attributes. Calendar parts come from DATE
    * functions (deterministic — no timezone on DATE); dow and epoch_day
    * from pure integer epoch arithmetic ((days+4) mod 7, the repo-wide
    * weekday rule); quarter from integer month arithmetic rather than
    * engine QUARTER(). Generation is a single sequence-explode of the
    * two-value bounds row — no source scan beyond the min/max fold; at
    * any fact scale the dim is ~tens of thousands of rows, the
    * broadcast side of every date join.
    */
  def dimDate(spark: SparkSession, dir: String): DataFrame = {
    val bounds = Tables.orders(spark, dir)
      .agg(min(to_date(col("o_orderdate"))).as("d0"),
        max(to_date(col("o_orderdate"))).as("d1"))
    bounds.select(explode(sequence(col("d0"), col("d1"))).as("d"))
      .select(
        date_format(col("d"), "yyyy-MM-dd").as("date_iso"),
        year(col("d")).cast("long").as("year"),
        month(col("d")).cast("long").as("month"),
        dayofmonth(col("d")).cast("long").as("day_of_month"),
        expr("cast((month(d) - 1) div 3 + 1 as bigint)").as("quarter"),
        datediff(col("d"), lit("1970-01-01")).cast("long").as("epoch_day"),
        ((datediff(col("d"), lit("1970-01-01")) + 4) % 7).cast("long").as("dow"),
        (month(date_add(col("d"), 1)) =!= month(col("d"))).as("is_month_end"))
  }

  val dimDateOracle: String = """
    WITH b AS (
      SELECT CAST(MIN(o_orderdate) AS DATE) AS d0,
        CAST(MAX(o_orderdate) AS DATE) AS d1
      FROM orders),
    days AS (SELECT UNNEST(GENERATE_SERIES(d0, d1, INTERVAL 1 DAY)) AS dts FROM b),
    d AS (SELECT CAST(dts AS DATE) AS d FROM days)
    SELECT STRFTIME(d, '%Y-%m-%d') AS date_iso,
      CAST(EXTRACT(YEAR FROM d) AS BIGINT) AS year,
      CAST(EXTRACT(MONTH FROM d) AS BIGINT) AS month,
      CAST(EXTRACT(DAY FROM d) AS BIGINT) AS day_of_month,
      CAST((EXTRACT(MONTH FROM d) - 1) // 3 + 1 AS BIGINT) AS quarter,
      CAST(DATEDIFF('day', DATE '1970-01-01', d) AS BIGINT) AS epoch_day,
      CAST((DATEDIFF('day', DATE '1970-01-01', d) + 4) % 7 AS BIGINT) AS dow,
      EXTRACT(MONTH FROM d + 1) <> EXTRACT(MONTH FROM d) AS is_month_end
    FROM d"""

  def defs: Map[String, QueryDef] = Map(
    "dwh_dim_date" -> QueryDef.sql(dimDate, dimDateOracle),
    "dwh_fact_sales" -> QueryDef.sql(factSales, factSalesOracle),
    "dwh_dim_customer" -> QueryDef.sql(dimCustomer, dimCustomerOracle),
    "dwh_star_join" -> QueryDef.sql(starJoin, starJoinOracle),
    "dwh_bridge_author" -> QueryDef.sql(bridgeAuthor, bridgeAuthorOracle),
    "dwh_dim_references" -> QueryDef.sql(dimReferences, dimReferencesOracle),
    "dwh_dim_author_affiliation" ->
      QueryDef.sql(dimAuthorAffiliation, dimAuthorAffiliationOracle),
    "dwh_dim_publish_sn" -> QueryDef.sql(dimPublishSn, dimPublishSnOracle),
    "dwh_dim_license" -> QueryDef.sql(dimLicense, dimLicenseOracle),
    "dwh_dim_publisher" -> QueryDef.sql(dimPublisher, dimPublisherOracle),
    "dwh_dim_pub_version" -> QueryDef.sql(dimPubVersion, dimPubVersionOracle),
    "enrich_join" -> QueryDef.sql(enrichJoin, enrichJoinOracle)
  )
}
