package graft.operators

import graft.{QueryDef, Tables}
import graft.functions.Exact
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational core, continued: the remaining TPC-H query patterns
  * (Q2/Q9/Q11/Q16/Q20 shapes), adapted to the available star schema —
  * there is no partsupp table, so supply-cost semantics are derived from
  * observed lineitem trades instead.
  *
  * With these, every one of the 22 TPC-H query patterns has a
  * representative in the engine (§2.D).
  *
  * Determinism notes (hash-checked against DuckDB): threshold
  * comparisons run in DECIMAL against integer-scaled decimal sums
  * (never `double > 0.3 * double`), and per-group argmin rows are picked
  * through a totally-ordered window so ties resolve identically in both
  * engines.
  */
object RelationalExt {

  /** TPC-H Q2 pattern: per-part minimum-cost supplier within a region,
    * via a correlated-min decorrelated to a windowed argmin. Supply cost
    * is the observed unit price (extendedprice / quantity — one IEEE
    * division, bit-identical cross-engine).
    *
    * Scale: dims (part slice, supplier⋈nation⋈region) broadcast; the one
    * shuffle is the per-part window. A 100 TB lineitem never self-joins.
    */
  def q2MinCost(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(spark, dir).filter(col("p_size") <= 15)
      .select(col("p_partkey"), col("p_type"))
    val s = Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir).filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_name"))
    val w = Window.partitionBy(col("p_partkey"))
      .orderBy(col("unit_cost").asc, col("s_suppkey").asc)
    Tables.lineitem(spark, dir)
      .join(Tables.dimHint(p), col("l_partkey") === col("p_partkey"))
      .join(Tables.dimHint(s), col("l_suppkey") === col("s_suppkey"))
      .withColumn("unit_cost", col("l_extendedprice") / col("l_quantity"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("p_partkey").as("part_key"), col("p_type"),
        col("s_suppkey").as("supp_key"), col("s_name"),
        col("n_name").as("nation"), col("unit_cost"))
  }

  val q2MinCostOracle: String = """
    SELECT part_key, p_type, supp_key, s_name, nation, unit_cost FROM (
      SELECT p.p_partkey AS part_key, p.p_type,
        s.s_suppkey AS supp_key, s.s_name, n.n_name AS nation,
        l.l_extendedprice / l.l_quantity AS unit_cost,
        ROW_NUMBER() OVER (PARTITION BY p.p_partkey
          ORDER BY l.l_extendedprice / l.l_quantity ASC, s.s_suppkey ASC) AS rn
      FROM lineitem l
      JOIN part p ON l.l_partkey = p.p_partkey AND p.p_size <= 15
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey AND r.r_name = 'ASIA')
    WHERE rn = 1"""

  /** TPC-H Q9 pattern: product-line profit by supplier nation × order
    * year. Cost side uses the part's retail price (no partsupp table).
    * One big-side shuffle (lineitem ⋈ orders on orderkey); everything
    * else broadcasts.
    */
  def q9Profit(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(spark, dir).filter(col("p_name").like("%red%"))
      .select(col("p_partkey"), col("p_retailprice"))
    val s = Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name"))
    Tables.lineitem(spark, dir)
      .join(Tables.dimHint(p), col("l_partkey") === col("p_partkey"))
      .join(Tables.dimHint(s), col("l_suppkey") === col("s_suppkey"))
      .join(Tables.orders(spark, dir).select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("n_name").as("nation"),
        year(col("o_orderdate")).as("o_year"))
      .agg(Exact.dsum(
          col("l_extendedprice") * (lit(1.0) - col("l_discount"))
            - col("p_retailprice") * col("l_quantity")).as("profit"))
  }

  val q9ProfitOracle: String = s"""
    SELECT n.n_name AS nation, CAST(YEAR(o.o_orderdate) AS INT) AS o_year,
      ${Exact.sqlDsum(
        "l.l_extendedprice * (1.0 - l.l_discount) - p.p_retailprice * l.l_quantity")} AS profit
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey AND p.p_name LIKE '%red%'
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY 1, 2"""

  /** TPC-H Q11 pattern: per-part traded value for one nation's
    * suppliers, reported as the top-20 by value with each part's exact
    * share of the nation total in ppm. Q11's own fixed-fraction HAVING
    * (`value·1000 > total`) is deliberately NOT the output gate: TPC-H
    * scales that fraction by 1/SF precisely because a fixed fraction
    * empties as data grows — and it did here (0 rows at sf0.1, where
    * 14k parts each hold <0.1% of the total; the oracle match was
    * proving two empty sets equal). Top-N + share is the SF-stable
    * form of the same question ("which stock is important, and how
    * important"), with the 1-per-mille verdict preserved as the
    * `above_mille` flag. Value totals and the share division run
    * entirely in DECIMAL/HUGEINT, never doubles; ties order by
    * part_key asc (total order).
    */
  def q11ImportantStock(spark: SparkSession, dir: String): DataFrame = {
    val s = Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir).filter(col("n_name") === "NATION_19")),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"))
    val perPart = Tables.lineitem(spark, dir)
      .join(Tables.dimHint(s), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("l_partkey").as("part_key"))
      .agg(Exact.decSum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .as("value_dec"))
    val total = perPart.agg(sum(col("value_dec")).as("total_dec"))
    perPart.crossJoin(broadcast(total))
      .withColumn("share_ppm",
        expr("(CAST(value_dec * 1000000 AS DECIMAL(38,6))) div total_dec"))
      .withColumn("above_mille", col("value_dec") * lit(1000) > col("total_dec"))
      .orderBy(col("value_dec").desc, col("part_key").asc)
      .limit(20)
      .select(col("part_key"), col("value_dec").cast("double").as("value"),
        col("share_ppm"), col("above_mille"))
  }

  val q11ImportantStockOracle: String = """
    WITH per_part AS (
      SELECT l_partkey AS part_key,
        SUM(CAST((l_extendedprice * (1.0 - l_discount)) AS DECIMAL(28,6))) AS value_dec
      FROM lineitem l
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey AND n.n_name = 'NATION_19'
      GROUP BY 1),
    tot AS (SELECT SUM(value_dec) AS total_dec FROM per_part)
    SELECT part_key, CAST(value_dec AS DOUBLE) AS value,
      -- scale-6 decimals ×1e6 are integer-valued, so both casts are
      -- EXACT and this is floor(v·1e6/t) — the same truncated rational
      -- Spark's decimal `div` computes
      CAST((CAST(value_dec * 1000000 AS HUGEINT) * 1000000)
        // CAST(total_dec * 1000000 AS HUGEINT) AS BIGINT) AS share_ppm,
      value_dec * 1000 > total_dec AS above_mille
    FROM per_part CROSS JOIN tot
    ORDER BY value_dec DESC, part_key ASC LIMIT 20"""

  /** TPC-H Q16 pattern: supplier variety per (brand, type, size) slice,
    * excluding one brand, one type prefix, and "complaint" suppliers
    * (negative balance stand-in) via an anti join on a broadcast list.
    * Pure integer counts — no FP anywhere.
    */
  def q16SupplierCnt(spark: SparkSession, dir: String): DataFrame = {
    val excluded = Tables.supplier(spark, dir)
      .filter(col("s_acctbal") < 0).select(col("s_suppkey"))
    val p = Tables.part(spark, dir)
      .filter(col("p_brand") =!= "Brand#15"
        && !col("p_type").like("PROMO%")
        && col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45))
    Tables.lineitem(spark, dir)
      .join(Tables.dimHint(excluded), col("l_suppkey") === col("s_suppkey"), "left_anti")
      .join(Tables.dimHint(p), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
  }

  val q16SupplierCntOracle: String = """
    SELECT p_brand, p_type, p_size,
      CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_brand <> 'Brand#15'
      AND p.p_type NOT LIKE 'PROMO%'
      AND p.p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
      AND NOT EXISTS (
        SELECT 1 FROM supplier s
        WHERE s.s_suppkey = l.l_suppkey AND s.s_acctbal < 0)
    GROUP BY 1, 2, 3"""

  /** TPC-H Q20 pattern: one nation's suppliers ranked by their
    * PROMO-part share of total shipped quantity in 1997 — the
    * correlated threshold decorrelated to one conditional aggregate per
    * supplier, reported top-10 by exact share ppm with Q20's 18%
    * verdict as a flag (integer-exact: promo·100 > total·18 in
    * DECIMAL; quantities are integer-valued).
    */
  def q20PartPromo(spark: SparkSession, dir: String): DataFrame = {
    val s = Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir).filter(col("n_name") === "NATION_3")),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"))
    val promoKeys = Tables.part(spark, dir)
      .filter(col("p_type").like("PROMO%")).select(col("p_partkey"))
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp")
        && col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .join(Tables.dimHint(s), col("l_suppkey") === col("s_suppkey"))
      .join(Tables.dimHint(promoKeys), col("l_partkey") === col("p_partkey"), "left_outer")
      .withColumn("is_promo", col("p_partkey").isNotNull)
      .groupBy(col("s_suppkey").as("supp_key"), col("s_name"))
      .agg(
        Exact.decSum(when(col("is_promo"), col("l_quantity")).otherwise(lit(0.0)))
          .as("promo_qty_dec"),
        Exact.decSum(col("l_quantity")).as("total_qty_dec"))
      // Q20's own `share > 18%` HAVING is kept as the verdict FLAG, not
      // the output gate: at sf0.001 the single qualifying supplier sat
      // under 18% and the query returned 0 rows (its oracle match was
      // proving two empty sets equal — the q7_volume class). Top-10 by
      // exact promo-share ppm (supp_key asc on ties) is the SF-stable
      // form of "which suppliers lean on promo parts, and how hard".
      .withColumn("promo_share_ppm",
        expr("(CAST(promo_qty_dec * 1000000 AS DECIMAL(38,6))) "
          + "div total_qty_dec"))
      .withColumn("above_18pct",
        col("promo_qty_dec") * lit(100) > col("total_qty_dec") * lit(18))
      .orderBy(col("promo_share_ppm").desc, col("supp_key").asc)
      .limit(10)
      .select(col("supp_key"), col("s_name"),
        col("promo_qty_dec").cast("double").as("promo_qty"),
        col("total_qty_dec").cast("double").as("total_qty"),
        col("promo_share_ppm"), col("above_18pct"))
  }

  val q20PartPromoOracle: String = """
    SELECT supp_key, s_name,
      CAST(promo_qty_dec AS DOUBLE) AS promo_qty,
      CAST(total_qty_dec AS DOUBLE) AS total_qty,
      -- scale-6 decimals ×1e6 are integer-valued: both casts exact,
      -- floor(p·1e6/t) — Spark's decimal `div` semantics
      CAST((CAST(promo_qty_dec * 1000000 AS HUGEINT) * 1000000)
        // CAST(total_qty_dec * 1000000 AS HUGEINT) AS BIGINT)
        AS promo_share_ppm,
      promo_qty_dec * 100 > total_qty_dec * 18 AS above_18pct
    FROM (
      SELECT s.s_suppkey AS supp_key, s.s_name,
        SUM(CAST((CASE WHEN p.p_partkey IS NOT NULL THEN l.l_quantity ELSE 0.0 END)
          AS DECIMAL(28,6))) AS promo_qty_dec,
        SUM(CAST(l.l_quantity AS DECIMAL(28,6))) AS total_qty_dec
      FROM lineitem l
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey AND n.n_name = 'NATION_3'
      LEFT JOIN (SELECT p_partkey FROM part WHERE p_type LIKE 'PROMO%') p
        ON l.l_partkey = p.p_partkey
      WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
        AND l.l_shipdate < TIMESTAMP '1998-01-01'
      GROUP BY 1, 2)
    ORDER BY promo_share_ppm DESC, supp_key ASC LIMIT 10"""

  /** Runtime bloom semi-join reduction — the 100 TB join-pruning
    * pattern made explicit: the FILTERED build side (urgent/high
    * orders) compresses its key set to KB of bloom bits that ride the
    * task binary and prune the probe scan with the codegen
    * [[org.apache.spark.sql.graft.BloomMightContainLong]] BEFORE any
    * shuffle — at scale the discarded ~60% of lineitem never enters
    * the exchange. Bloom errors are false positives only, and the
    * exact join downstream removes them, so the result is identical to
    * the plain join (the oracle IS the plain join — the sketch is pure
    * plan speed, never semantics). Same two-stage shape as
    * decontaminate_bloom, on relational keys.
    */
  def bloomJoinPrune(spark: SparkSession, dir: String): DataFrame = {
    val hi = Tables.orders(spark, dir)
      .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
      .select(col("o_orderkey"), col("o_orderpriority"))
    val bloom = hi.stat.bloomFilter("o_orderkey", 100000L, 0.01)
    val mightContain = org.apache.spark.sql.GraftBridge.column(
      org.apache.spark.sql.graft.BloomMightContainLong(
        org.apache.spark.sql.GraftBridge.expression(col("l_orderkey")), bloom))
    Tables.lineitem(spark, dir)
      .select(col("l_orderkey"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev"))
      .filter(mightContain)
      .join(hi, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        Exact.dsum(col("rev")).as("revenue"))
      .select(col("o_orderpriority"), col("n_items"), col("revenue"))
  }

  val bloomJoinPruneOracle: String = s"""
    SELECT o.o_orderpriority,
      COUNT(*) AS n_items,
      ${Exact.sqlDsum("l.l_extendedprice * (1.0 - l.l_discount)")} AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderpriority IN ('1-URGENT', '2-HIGH')
    GROUP BY 1"""

  /** Fuzzy record linkage on the part-name DICTIONARY: distinct names
    * pair up within a blocking key (the last word — the product noun)
    * and survive at Levenshtein distance 1-2 — near-miss name variants
    * ("cold ring" / "old ring"), with each side's row count carried so
    * the consumer can weigh the merge. The classic entity-resolution
    * shape done scale-correctly: (1) the row table collapses to its
    * name dictionary FIRST (name-cardinality, not row-cardinality —
    * at 100 TB the dictionary is the only thing that ever pairs up);
    * (2) candidate generation is a blocked equi-join, never a cross
    * join — the quadratic blow-up is bounded per block; (3) the
    * expensive edit-distance runs only on block-mates. Blocking
    * recall is the documented trade-off (a pair differing in the
    * noun is never compared); the oracle mirrors the same blocked
    * semantics.
    */
  def fuzzyJoin(spark: SparkSession, dir: String): DataFrame = {
    val names = Tables.part(spark, dir)
      .groupBy(col("p_name")).agg(count(lit(1)).as("cnt"))
      .withColumn("blk", element_at(split(col("p_name"), " "), -1))
    val a = names.select(col("p_name").as("name_a"), col("cnt").as("cnt_a"),
      col("blk"))
    val b = names.select(col("p_name").as("name_b"), col("cnt").as("cnt_b"),
      col("blk").as("blk_b"))
    // The threshold form runs the banded O(n·k) DP and returns -1 past
    // the bound — at dictionary scale it is identical, on long strings
    // it is the difference between O(n·2) and O(n²) per pair.
    a.join(b, col("blk") === col("blk_b") && col("name_a") < col("name_b"))
      .withColumn("lev",
        levenshtein(col("name_a"), col("name_b"), 2).cast("long"))
      .filter(col("lev").between(1L, 2L))
      .select(col("name_a"), col("name_b"), col("lev"),
        col("cnt_a"), col("cnt_b"))
  }

  val fuzzyJoinOracle: String = s"""
    WITH names AS (
      SELECT p_name, COUNT(*) AS cnt,
        STRING_SPLIT(p_name, ' ')[-1] AS blk
      FROM part GROUP BY 1)
    SELECT a.p_name AS name_a, b.p_name AS name_b,
      CAST(LEVENSHTEIN(a.p_name, b.p_name) AS BIGINT) AS lev,
      a.cnt AS cnt_a, b.cnt AS cnt_b
    FROM names a JOIN names b
      ON a.blk = b.blk AND a.p_name < b.p_name
    WHERE LEVENSHTEIN(a.p_name, b.p_name) BETWEEN 1 AND 2"""

  /** Entity resolution on top of [[fuzzyJoin]]: the pairwise fuzzy
    * matches chain into connected components (A~B, B~C ⇒ one entity
    * {A,B,C}) by iterative min-label propagation — the same distributed
    * components discipline as dedup_components, here with the
    * LEXICOGRAPHIC minimum name as the canonical entity label. Every
    * dictionary name appears: unmatched names are their own singleton
    * cluster. The loop runs on the name dictionary (checkpointed,
    * state-partition-sized) — rounds ≤ cluster diameter, which for
    * near-miss name variants is tiny; the row table is never touched
    * after the dictionary collapse.
    */
  def entityResolution(spark: SparkSession, dir: String): DataFrame = {
    val names = graft.functions.Iterate.checkpoint(
      Tables.part(spark, dir)
        .groupBy(col("p_name")).agg(count(lit(1)).as("cnt")))
    val pairs = graft.functions.Iterate.checkpoint(
      fuzzyJoin(spark, dir).select(col("name_a"), col("name_b")))
    val edges = pairs
      .unionByName(pairs.select(col("name_b").as("name_a"),
        col("name_a").as("name_b")))
      .transform(graft.functions.Iterate.checkpoint)
    var labels = names.select(col("p_name").as("node"))
      .withColumn("label", col("node"))
      .transform(graft.functions.Iterate.checkpoint)
    var changed = 1L
    var rounds = 0
    val maxRounds = 50
    while (changed > 0 && rounds < maxRounds) {
      val viaNeighbor = edges
        .join(labels, col("name_b") === col("node"))
        .select(col("name_a").as("node"), col("label"))
      val next = labels.select(col("node"), col("label"))
        .unionByName(viaNeighbor)
        .groupBy(col("node")).agg(min(col("label")).as("label"))
        .transform(graft.functions.Iterate.checkpoint)
      changed = next.join(labels.withColumnRenamed("label", "old"), Seq("node"))
        .filter(col("label") =!= col("old")).count()
      labels = next
      rounds += 1
    }
    require(changed == 0,
      s"entity resolution did not converge in $maxRounds rounds")
    labels
      .join(names, col("node") === col("p_name"))
      .select(col("node").as("name"), col("label").as("entity"),
        (col("node") === col("label")).as("is_canonical"), col("cnt"))
  }

  val entityResolutionOracle: String = s"""
    WITH RECURSIVE names AS (
      SELECT p_name, COUNT(*) AS cnt,
        STRING_SPLIT(p_name, ' ')[-1] AS blk
      FROM part GROUP BY 1),
    pairs AS (
      SELECT a.p_name AS na, b.p_name AS nb
      FROM names a JOIN names b
        ON a.blk = b.blk AND a.p_name < b.p_name
      WHERE LEVENSHTEIN(a.p_name, b.p_name) BETWEEN 1 AND 2),
    edges AS (
      SELECT na AS a, nb AS b FROM pairs
      UNION SELECT nb, na FROM pairs),
    reach(src, dst) AS (
      SELECT p_name, p_name FROM names
      UNION
      SELECT r.src, e.b FROM reach r JOIN edges e ON e.a = r.dst)
    SELECT l.src AS name, l.entity,
      l.src = l.entity AS is_canonical, n.cnt
    FROM (SELECT src, MIN(dst) AS entity FROM reach GROUP BY 1) l
    JOIN names n ON n.p_name = l.src"""

  /** 2-D skyline (Pareto frontier) over the part catalogue — the
    * multi-objective SELECT Spark has no native operator for: every
    * part not DOMINATED on (retail price ↓, size ↑), i.e. the
    * cheapest-for-its-size frontier. A row survives iff (a) its size
    * strictly exceeds the best size over all STRICTLY-cheaper rows and
    * (b) it carries the max size WITHIN its equal-price group — an
    * equal-price peer with strictly larger size dominates (equal price
    * + equal size rows tie and both survive). Exact integer cents.
    *
    * Scale — no corpus sort, no corpus-scale window, ONE aggregate
    * shuffle: the dominance test only needs the per-price max size, so
    * the corpus first folds to its price cells (map-side combined
    * groupBy, cardinality = the PRICE RANGE, not the row count). The
    * "best strictly-cheaper" frontier over those cells is an exclusive
    * prefix MAX — associative, so
    * [[graft.functions.Ranks.withExclusivePrefixMax]] computes it with
    * range-bucketed cells from the broadcast [min, max] span, never an
    * unpartitioned window. The surviving frontier cells number at most
    * |distinct sizes| (sizes strictly increase along the frontier — a
    * DIMENSION bound), so the join back to the corpus broadcasts.
    */
  def skyline2d(spark: SparkSession, dir: String): DataFrame = {
    val parts = Tables.part(spark, dir)
      .select(col("p_partkey").cast("long").as("part_key"),
        floor(col("p_retailprice") * 100 + lit(0.5)).cast("bigint").as("price_cents"),
        col("p_size").cast("long").as("size"))
    // checkpointed: the price-cell frame's lineage is a full part
    // aggregate — Ranks' documented triple read would re-scan part
    // three times for a |distinct prices|-row frame.
    val cells = graft.functions.Iterate.checkpoint(
      parts.groupBy(col("price_cents"))
        .agg(max(col("size")).as("best_at_price")))
    val frontier = graft.functions.Ranks.withBucketedExclusivePrefixMax(
        cells, col("price_cents"), ascending = true, 1024,
        Seq(col("best_at_price") -> "best_cheaper"))
      .filter(col("best_cheaper").isNull
        || col("best_at_price") > col("best_cheaper"))
      .select(col("price_cents"), col("best_at_price"))
    parts
      .join(broadcast(frontier), Seq("price_cents"))
      .filter(col("size") === col("best_at_price"))
      .select(col("part_key"), col("price_cents"), col("size"))
  }

  val skyline2dOracle: String = """
    WITH p AS (
      SELECT CAST(p_partkey AS BIGINT) AS part_key,
        CAST(FLOOR(p_retailprice * 100 + 0.5) AS BIGINT) AS price_cents,
        CAST(p_size AS BIGINT) AS size
      FROM part),
    fl AS (
      SELECT part_key, price_cents, size,
        MAX(size) OVER (ORDER BY price_cents ASC
          RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS best_cheaper,
        MAX(size) OVER (PARTITION BY price_cents) AS best_at_price
      FROM p)
    SELECT part_key, price_cents, size
    FROM fl WHERE (best_cheaper IS NULL OR size > best_cheaper)
      AND size = best_at_price"""

  /** Repurchase-gap curve: the distribution of WEEKS between a
    * customer's consecutive orders — the retention-economics histogram
    * behind reorder-window sizing and churn cutoffs (where does the
    * renewal mass sit, and what share of gaps exceed k weeks?). One lag
    * window over the (customer, date, key) ordering — the
    * bot_detect/forecast gap discipline on the purchase axis — then a
    * gap-week histogram with exact cumulative ppm. Date ties break on
    * order key, so both engines see identical gap sequences.
    */
  def repurchaseCurve(spark: SparkSession, dir: String): DataFrame = {
    val gaps = Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"),
        datediff(to_date(col("o_orderdate")), lit("1970-01-01")).cast("long").as("d"))
      .withColumn("gap_w", expr("(d - lag(d, 1) over (partition by o_custkey " +
        "order by d asc, o_orderkey asc)) div 7"))
      .filter(col("gap_w").isNotNull)
    // gap-week histogram (weeks-bounded) materialized once: the total
    // and the cumulative both read it without re-scanning orders, and
    // the cumulative rides the bucketed exclusive prefix (cell =
    // 8-week block — already integer and monotone) so the registry-wide
    // no-unpartitioned-window invariant holds.
    val hist = graft.functions.Iterate.checkpoint(
      gaps.groupBy(col("gap_w")).agg(count(lit(1)).as("n_gaps")))
    val tot = hist.agg(sum(col("n_gaps")).as("__n_all"))
    graft.functions.Ranks.withExclusivePrefix(hist,
        expr("gap_w div 8"), Seq(col("gap_w").asc),
        Seq(col("n_gaps") -> "__n_before"))
      .crossJoin(broadcast(tot))
      .select(col("gap_w"), col("n_gaps"),
        expr("((__n_before + n_gaps) * 1000000) div __n_all").as("cum_ppm"))
  }

  val repurchaseCurveOracle: String = """
    WITH g AS (
      SELECT o_custkey,
        (CAST(DATEDIFF('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
          AS BIGINT)
         - LAG(CAST(DATEDIFF('day', DATE '1970-01-01',
             CAST(o_orderdate AS DATE)) AS BIGINT)) OVER (
           PARTITION BY o_custkey
           ORDER BY CAST(o_orderdate AS DATE) ASC, o_orderkey ASC)) // 7
          AS gap_w
      FROM orders),
    h AS (
      SELECT gap_w, COUNT(*) AS n_gaps FROM g
      WHERE gap_w IS NOT NULL GROUP BY 1)
    SELECT gap_w, n_gaps,
      (CAST(SUM(n_gaps) OVER (ORDER BY gap_w ASC ROWS UNBOUNDED PRECEDING)
        AS BIGINT) * 1000000)
        // CAST(SUM(n_gaps) OVER () AS BIGINT) AS cum_ppm
    FROM h"""

  /** Order-to-ship lag percentiles per order priority — the fulfilment
    * SLA table (q4 counts LATE orders against a fixed cutoff; this
    * reports the whole lag DISTRIBUTION per priority as nearest-rank
    * p50/p90/p99, the numbers an SLA is actually written against —
    * and whether URGENT really ships faster than LOW is read straight
    * off the p90 column). Lag is integer days (datediff — both engines
    * truncate the timestamp to its date first); percentiles are
    * NEAREST-RANK (min lag with CDF ≥ ⌈p·n/100⌉, ceil as (p·n+99) div
    * 100 on positives — every reported value is an actual lag).
    * Scale: ONE corpus-scale shuffle (the orderkey join feeding the
    * (priority, lag) cells — the lag support is physically bounded,
    * ~weeks of days, so the cell frame is metadata at any SF,
    * checkpointed for its three readers); the CDF window partitions BY
    * PRIORITY and the quantile pick is a conditional MIN fold.
    */
  def shippingLagPercentiles(spark: SparkSession, dir: String): DataFrame = {
    val oi = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("o_orderkey"), col("l_shipdate"))
    val cells = graft.functions.Iterate.checkpoint(
      li.join(oi, Seq("o_orderkey"))
        .select(col("o_orderpriority").as("priority"),
          datediff(col("l_shipdate"), col("o_orderdate")).cast("bigint")
            .as("lag_days"))
        .groupBy(col("priority"), col("lag_days"))
        .agg(count(lit(1)).as("c")))
    val wp = Window.partitionBy(col("priority")).orderBy(col("lag_days").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cdf = cells.withColumn("cdf", sum(col("c")).over(wp))
    val tot = cells.groupBy(col("priority"))
      .agg(sum(col("c")).as("n_items"), max(col("lag_days")).as("max_days"))
    cdf.join(Tables.stateHint(tot), Seq("priority"))
      .groupBy(col("priority"))
      .agg(max(col("n_items")).as("n_items"),
        min(when(col("cdf") >= expr("(50 * n_items + 99) div 100"),
          col("lag_days"))).as("p50_days"),
        min(when(col("cdf") >= expr("(90 * n_items + 99) div 100"),
          col("lag_days"))).as("p90_days"),
        min(when(col("cdf") >= expr("(99 * n_items + 99) div 100"),
          col("lag_days"))).as("p99_days"),
        max(col("max_days")).as("max_days"))
  }

  val shippingLagPercentilesOracle: String = """
    WITH lag AS (
      SELECT o.o_orderpriority AS priority,
        DATE_DIFF('day', CAST(o.o_orderdate AS DATE),
          CAST(l.l_shipdate AS DATE)) AS lag_days
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
    cells AS (
      SELECT priority, CAST(lag_days AS BIGINT) AS lag_days, COUNT(*) AS c
      FROM lag GROUP BY 1, 2),
    cdf AS (
      SELECT priority, lag_days, c,
        CAST(SUM(c) OVER (PARTITION BY priority ORDER BY lag_days ASC
          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cdf
      FROM cells),
    tot AS (
      SELECT priority, CAST(SUM(c) AS BIGINT) AS n_items,
        MAX(lag_days) AS max_days
      FROM cells GROUP BY 1)
    SELECT priority, MAX(n_items) AS n_items,
      MIN(CASE WHEN cdf >= (50 * n_items + 99) // 100 THEN lag_days END)
        AS p50_days,
      MIN(CASE WHEN cdf >= (90 * n_items + 99) // 100 THEN lag_days END)
        AS p90_days,
      MIN(CASE WHEN cdf >= (99 * n_items + 99) // 100 THEN lag_days END)
        AS p99_days,
      MAX(max_days) AS max_days
    FROM cdf JOIN tot USING (priority)
    GROUP BY priority"""

  /** Herfindahl–Hirschman supplier concentration per nation — the
    * market-concentration audit beside [[graft.operators.StatTests]]'
    * gini (Gini reads INEQUALITY of the whole distribution; HHI reads
    * how close the market is to a monopoly, Σshare², the number
    * antitrust thresholds are written against — 0.25 "highly
    * concentrated" maps to 250 000 ppm here): per-supplier lifetime
    * revenue in exact half-up cents, then HHI_ppm = Σcᵢ²·1e6 div
    * (Σcᵢ)² — EXACT integer arithmetic with the squares in
    * DECIMAL(38,0)/HUGEINT (Σc² passes 2⁶³ long before 100 TB, the
    * olsTrend headroom treatment) — plus the top supplier's share.
    * Scale: one corpus-scale supplier aggregate (map-side combined),
    * the |suppliers|-row frame joins the broadcast supplier dim for
    * nation, and the nation fold is metadata.
    */
  def marketHhi(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    def dec(c: org.apache.spark.sql.Column) = c.cast(DecimalType(38, 0))
    val perSupp = Tables.lineitem(spark, dir)
      .groupBy(col("l_suppkey"))
      .agg(sum(floor(col("l_extendedprice") * 100 + lit(0.5)).cast("bigint"))
        .as("cents"))
    val dim = Tables.supplier(spark, dir)
      .select(col("s_suppkey").as("l_suppkey"),
        col("s_nationkey").cast("long").as("nationkey"))
      .transform(Tables.dimHint)
    perSupp.join(broadcast(dim), Seq("l_suppkey"))
      .groupBy(col("nationkey"))
      .agg(count(lit(1)).as("n_suppliers"),
        sum(col("cents")).as("total_cents"),
        sum(dec(col("cents")) * dec(col("cents"))).as("sumsq"),
        max(col("cents")).as("top_cents"))
      .select(col("nationkey"), col("n_suppliers"), col("total_cents"),
        expr("cast((sumsq * 1000000) div (cast(total_cents as decimal(38,0))"
          + " * cast(total_cents as decimal(38,0))) as bigint)").as("hhi_ppm"),
        expr("(top_cents * 1000000) div total_cents").as("top_share_ppm"))
  }

  val marketHhiOracle: String = """
    WITH per_supp AS (
      SELECT l_suppkey,
        CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT))
          AS BIGINT) AS cents
      FROM lineitem GROUP BY 1),
    j AS (
      SELECT CAST(s.s_nationkey AS BIGINT) AS nationkey, p.cents
      FROM per_supp p JOIN supplier s ON p.l_suppkey = s.s_suppkey),
    g AS (
      SELECT nationkey, COUNT(*) AS n_suppliers,
        CAST(SUM(cents) AS BIGINT) AS total_cents,
        SUM(CAST(cents AS HUGEINT) * CAST(cents AS HUGEINT)) AS sumsq,
        MAX(cents) AS top_cents
      FROM j GROUP BY 1)
    SELECT nationkey, n_suppliers, total_cents,
      CAST((sumsq * 1000000) // (CAST(total_cents AS HUGEINT)
        * CAST(total_cents AS HUGEINT)) AS BIGINT) AS hhi_ppm,
      (top_cents * 1000000) // total_cents AS top_share_ppm
    FROM g"""

  def defs: Map[String, QueryDef] = Map(
    "shipping_lag_percentiles" ->
      QueryDef.sql(shippingLagPercentiles, shippingLagPercentilesOracle),
    "market_hhi" -> QueryDef.sql(marketHhi, marketHhiOracle),
    "repurchase_curve" -> QueryDef.sql(repurchaseCurve, repurchaseCurveOracle),
    "skyline_2d" -> QueryDef.sql(skyline2d, skyline2dOracle),
    "entity_resolution" ->
      QueryDef.sql(entityResolution, entityResolutionOracle),
    "fuzzy_join" -> QueryDef.sql(fuzzyJoin, fuzzyJoinOracle),
    "bloom_join_prune" -> QueryDef.sql(bloomJoinPrune, bloomJoinPruneOracle),
    "q2_min_cost" -> QueryDef.sql(q2MinCost, q2MinCostOracle),
    "q9_profit" -> QueryDef.sql(q9Profit, q9ProfitOracle),
    "q11_important_stock" -> QueryDef.sql(q11ImportantStock, q11ImportantStockOracle),
    "q16_supplier_cnt" -> QueryDef.sql(q16SupplierCnt, q16SupplierCntOracle),
    "q20_part_promo" -> QueryDef.sql(q20PartPromo, q20PartPromoOracle)
  )
}
