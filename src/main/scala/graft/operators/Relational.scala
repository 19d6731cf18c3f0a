package graft.operators

import graft.{QueryDef, Tables}
import graft.functions.Exact
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Relational core: headline scan/join/agg workload (§2.D).
  *
  * These are the bench-critical queries. Design notes for 100 TB:
  *  - single pass over lineitem for q1 (scan + hash agg, fully
  *    whole-stage-codegen'd, map-side partial aggregation);
  *  - filters applied before joins so parquet pushdown prunes row groups.
  */
object Relational {

  /** TPC-H Q1-style pricing summary: one scan, hash aggregate.
    * Reference analogue: the DWH fact rollups in check_DWH.py.
    */
  def q1Agg(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
    l.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        Exact.dsum(col("l_quantity")).as("sum_qty"),
        Exact.dsum(col("l_extendedprice")).as("sum_base_price"),
        Exact.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
        Exact.dsum(
          col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))).as("sum_charge"),
        Exact.davg(col("l_quantity")).as("avg_qty"),
        Exact.davg(col("l_extendedprice")).as("avg_price"),
        Exact.davg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
  }

  val q1AggOracle: String = s"""
    SELECT l_returnflag, l_linestatus,
      ${Exact.sqlDsum("l_quantity")} AS sum_qty,
      ${Exact.sqlDsum("l_extendedprice")} AS sum_base_price,
      ${Exact.sqlDsum("l_extendedprice * (1.0 - l_discount)")} AS sum_disc_price,
      ${Exact.sqlDsum("l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)")} AS sum_charge,
      ${Exact.sqlDavg("l_quantity")} AS avg_qty,
      ${Exact.sqlDavg("l_extendedprice")} AS avg_price,
      ${Exact.sqlDavg("l_discount")} AS avg_disc,
      COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus"""

  /** TPC-H Q3-style: selective dim filter → two-join → agg → total-order
    * top-k. Filters applied before joins (pushed to parquet scans).
    */
  def q3Shipping(spark: SparkSession, dir: String): DataFrame = {
    val cutoff = lit("1998-01-01").cast("timestamp")
    val c = Tables.customer(spark, dir).filter(col("c_mktsegment") === "BUILDING")
    val o = Tables.orders(spark, dir).filter(col("o_orderdate") < cutoff)
    val l = Tables.lineitem(spark, dir).filter(col("l_shipdate") > cutoff)
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(Tables.dimHint(c), col("o_custkey") === col("c_custkey"))
      .groupBy(
        col("l_orderkey").as("order_key"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"),
        col("o_orderpriority").as("priority"))
      .agg(Exact.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      .orderBy(col("revenue").desc, col("order_key").asc)
      .limit(10)
  }

  val q3ShippingOracle: String = s"""
    SELECT l_orderkey AS order_key,
      STRFTIME(o_orderdate, '%Y-%m-%d') AS order_date,
      o_orderpriority AS priority,
      ${Exact.sqlDsum("l_extendedprice * (1.0 - l_discount)")} AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-01-01'
      AND l_shipdate > TIMESTAMP '1998-01-01'
    GROUP BY 1, 2, 3
    ORDER BY revenue DESC, order_key ASC LIMIT 10"""

  /** TPC-H Q5-style: 6-way star join with a cross-dimension constraint
    * (customer and supplier in the same nation), agg per nation.
    */
  def q5Local(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir)
    val l = Tables.lineitem(spark, dir)
    val s = Tables.supplier(spark, dir)
    val n = Tables.nation(spark, dir)
    val r = Tables.region(spark, dir).filter(col("r_name") === "ASIA")
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(Tables.dimHint(s), col("l_suppkey") === col("s_suppkey"))
      .join(Tables.dimHint(c),
        col("o_custkey") === col("c_custkey")
          && col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name").as("nation"))
      .agg(Exact.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
  }

  val q5LocalOracle: String = s"""
    SELECT n_name AS nation,
      ${Exact.sqlDsum("l_extendedprice * (1.0 - l_discount)")} AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
    GROUP BY 1"""

  /** Window functions: top-3 orders per customer by value — partitioned
    * row_number with unique tiebreak.
    */
  def windowRank(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    Tables.orders(spark, dir)
      .withColumn("rank_in_customer", row_number().over(w))
      .filter(col("rank_in_customer") <= 3)
      .select(
        col("o_custkey").as("customer_key"),
        col("o_orderkey").as("order_key"),
        col("o_totalprice").as("total_price"),
        col("rank_in_customer"))
  }

  val windowRankOracle: String = """
    SELECT customer_key, order_key, total_price, rank_in_customer FROM (
      SELECT o_custkey AS customer_key, o_orderkey AS order_key,
        o_totalprice AS total_price,
        ROW_NUMBER() OVER (PARTITION BY o_custkey
          ORDER BY o_totalprice DESC, o_orderkey ASC) AS rank_in_customer
      FROM orders
    ) WHERE rank_in_customer <= 3"""

  /** Multi-level ROLLUP aggregate; NULL rollup keys coalesced to 'ALL'
    * (engine-portable, and how the reference's DWH reports totals).
    */
  def rollupAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_orders"),
        Exact.dsum(col("o_totalprice")).as("total_value"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("n_orders"),
        col("total_value"))

  val rollupAggOracle: String = s"""
    SELECT COALESCE(o_orderstatus, 'ALL') AS status,
      COALESCE(o_orderpriority, 'ALL') AS priority,
      COUNT(*) AS n_orders,
      ${Exact.sqlDsum("o_totalprice")} AS total_value
    FROM orders
    GROUP BY ROLLUP(o_orderstatus, o_orderpriority)"""

  /** Pivot: event counts per user × event_type. Spark uses the native
    * pivot operator (explicit value list ⇒ single pass, no extra job to
    * discover values); oracle uses conditional aggregation.
    */
  private val eventTypes = Seq("click", "view", "purchase", "signup", "error")

  def pivotAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .pivot("event_type", eventTypes)
      .agg(count(lit(1)))
      .na.fill(0L, eventTypes)

  val pivotAggOracle: String = {
    val cols = eventTypes.map(t =>
      s"CAST(COUNT(*) FILTER (WHERE event_type = '$t') AS BIGINT) AS $t").mkString(",\n      ")
    s"""
    SELECT user_id,
      $cols
    FROM events GROUP BY user_id"""
  }

  /** The inverse of [[pivotAgg]]: melt the wide per-user counts back to
    * long (user_id, event_type, n) rows — Spark's `unpivot`/`melt`
    * relational operator (Dataset.unpivot plans as an Expand, one output
    * row per value column, no shuffle). NULL cells are dropped by
    * unpivot's definition; the pivot zero-fills first, so the melt is
    * total and the round trip is exactly the plain long GROUP BY —
    * which is what the oracle states.
    */
  def unpivotMelt(spark: SparkSession, dir: String): DataFrame =
    pivotAgg(spark, dir)
      .unpivot(
        Array(col("user_id")),
        eventTypes.map(col).toArray,
        "event_type", "n")

  val unpivotMeltOracle: String = {
    val types = eventTypes.map(t => s"('$t')").mkString(", ")
    s"""
    SELECT u.user_id, t.event_type,
      CAST(COUNT(e.event_id) AS BIGINT) AS n
    FROM (SELECT DISTINCT user_id FROM events) u
    CROSS JOIN (VALUES $types) AS t(event_type)
    LEFT JOIN events e
      ON e.user_id = u.user_id AND e.event_type = t.event_type
    GROUP BY 1, 2"""
  }

  /** Exact interpolated quartiles per event type. Computed over
    * floor(value): integer-valued inputs make quartile interpolation
    * formula-independent (both (1-f)·a+f·b and a+(b-a)·f are exact in
    * binary for f ∈ {.25,.5,.75}), so engines agree bit-for-bit.
    */
  def percentiles(spark: SparkSession, dir: String): DataFrame = {
    // Histogram-based exact quantiles: integer-valued inputs collapse to
    // a few hundred (value, count) rows per group, so instead of Spark's
    // sort-the-whole-group percentile we aggregate once, take running
    // counts, and interpolate with Spark's own formula
    // (lower + (higher − lower) · (pos − ⌊pos⌋)). Identical results, and
    // the shuffle carries the histogram, not the data — the formulation
    // that survives 100 TB.
    import org.apache.spark.sql.expressions.Window
    val byV = Window.partitionBy(col("event_type")).orderBy(col("v"))
    val byType = Window.partitionBy(col("event_type"))
    val hist = Tables.events(spark, dir)
      .select(col("event_type"), floor(col("value")).cast("double").as("v"))
      .groupBy(col("event_type"), col("v")).agg(count(lit(1)).as("cnt"))
      .withColumn("cum", sum(col("cnt")).over(byV))
      .withColumn("start", col("cum") - col("cnt"))
      .withColumn("n", sum(col("cnt")).over(byType))
    def pos(q: Double): Column = lit(q) * (col("n") - 1).cast("double")
    def valAt(i: Column): Column =
      max(when(col("start") <= i && i < col("cum"), col("v")))
    val agg = hist.groupBy(col("event_type")).agg(
      first(col("n")).as("n"),
      valAt(floor(pos(0.25))).as("lo25"), valAt(ceil(pos(0.25))).as("hi25"),
      valAt(floor(pos(0.50))).as("lo50"), valAt(ceil(pos(0.50))).as("hi50"),
      valAt(floor(pos(0.75))).as("lo75"), valAt(ceil(pos(0.75))).as("hi75"))
    def interp(q: Double, lo: String, hi: String): Column = {
      val p = lit(q) * (col("n") - 1).cast("double")
      col(lo) + (col(hi) - col(lo)) * (p - floor(p).cast("double"))
    }
    agg.select(
      col("event_type"),
      interp(0.25, "lo25", "hi25").as("p25"),
      interp(0.50, "lo50", "hi50").as("p50"),
      interp(0.75, "lo75", "hi75").as("p75"),
      col("n"))
  }

  val percentilesOracle: String = """
    SELECT event_type,
      QUANTILE_CONT(FLOOR(value), 0.25) AS p25,
      QUANTILE_CONT(FLOOR(value), 0.50) AS p50,
      QUANTILE_CONT(FLOOR(value), 0.75) AS p75,
      COUNT(*) AS n
    FROM events GROUP BY event_type"""

  /** Approximate quantiles — the 100 TB twin of [[percentiles]]: Spark's
    * percentile_approx is a mergeable KLL-style sketch, so the shuffle
    * carries fixed-size sketches instead of per-group histograms, at
    * bounded rank error. Sketch values are engine-specific, so the output
    * carries the exact quantiles (hash-checked against QUANTILE_CONT —
    * integer-valued inputs make the interpolation formula-independent)
    * plus `within_bounds`: each sketch value inside the exact quantile
    * band q ± 0.01, 100× the sketch's configured rank error (1/10000).
    * The exact twin exists only for this gate; at corpus scale you run
    * the sketch alone.
    */
  def approxPercentiles(spark: SparkSession, dir: String): DataFrame = {
    def exact(q: Double): Column = expr(s"percentile(v, ${q})")
    def banded(q: Double, ap: String): Column =
      col(ap) >= exact(q - 0.01) && col(ap) <= exact(q + 0.01)
    Tables.events(spark, dir)
      .select(col("event_type"), floor(col("value")).cast("double").as("v"))
      .groupBy(col("event_type"))
      .agg(
        percentile_approx(col("v"), lit(0.25), lit(10000)).as("ap25"),
        percentile_approx(col("v"), lit(0.50), lit(10000)).as("ap50"),
        percentile_approx(col("v"), lit(0.75), lit(10000)).as("ap75"),
        exact(0.25).as("p25"), exact(0.50).as("p50"), exact(0.75).as("p75"),
        banded(0.25, "ap25").as("b25"), banded(0.50, "ap50").as("b50"),
        banded(0.75, "ap75").as("b75"),
        count(lit(1)).as("n"))
      .select(col("event_type"), col("p25"), col("p50"), col("p75"), col("n"),
        (col("b25") && col("b50") && col("b75")).as("within_bounds"))
  }

  val approxPercentilesOracle: String = """
    SELECT event_type,
      QUANTILE_CONT(FLOOR(value), 0.25) AS p25,
      QUANTILE_CONT(FLOOR(value), 0.50) AS p50,
      QUANTILE_CONT(FLOOR(value), 0.75) AS p75,
      COUNT(*) AS n, TRUE AS within_bounds
    FROM events GROUP BY event_type"""

  /** Skew-safe salted join, hot keys only. Blanket salting replicates the
    * entire build side SaltBuckets× — at 100 TB that is 8× extra shuffle
    * for the 99% of keys that are not hot. Instead:
    *
    *  1. Detect heavy keys from a deterministic 1-in-16 hash sample of the
    *     probe side (one cheap pass; at scale this is a sampled scan, the
    *     same statistic AQE's skew join reads from shuffle files). A key is
    *     "hot" when its SAMPLED count reaches `hotSampleThreshold`
    *     (default 64 ≈ ≥1024 true rows).
    *  2. Broadcast the hot-key set (heavy hitters are few by definition),
    *     split both sides map-side with a broadcast semi/anti tag.
    *  3. Salt ONLY the hot branch (probe keyed by a deterministic salt,
    *     build exploded SaltBuckets×); the cold branch joins plainly.
    *  4. Union the branches pre-aggregation.
    *
    * Result is provably identical to the plain join the oracle runs: every
    * (l,o) pair appears exactly once in exactly one branch, and the final
    * aggregate is order-independent (exact decimal sum). AQE's runtime
    * skew-join split is the zero-config alternative; this operator is the
    * explicit form with a tunable threshold.
    */
  private val SaltBuckets = 8
  private val HotSampleRate = 16L  // 1-in-16 deterministic hash sample
  private val HotSampleThreshold = 64L

  def skewSaltedJoin(spark: SparkSession, dir: String): DataFrame =
    saltedJoin(Tables.lineitem(spark, dir), Tables.orders(spark, dir),
      HotSampleThreshold)
      .groupBy(col("o_orderpriority").as("priority"))
      .agg(
        count(lit(1)).as("n_items"),
        Exact.dsum(col("l_extendedprice")).as("total_price"))

  /** The joined (pre-aggregation) frame; `hotSampleThreshold` is exposed
    * so tests can force every key hot (0) or none (Long.MaxValue) and
    * prove all three regimes agree.
    */
  private[graft] def saltedJoin(l: DataFrame, o: DataFrame,
      hotSampleThreshold: Long): DataFrame = {
    val hot = broadcast(
      l.filter(pmod(xxhash64(col("l_orderkey")), lit(HotSampleRate)) === 0)
        .groupBy(col("l_orderkey")).agg(count(lit(1)).as("c"))
        .filter(col("c") >= hotSampleThreshold)
        .select(col("l_orderkey").as("hot_key")))
    val lHot = l.join(hot, col("l_orderkey") === col("hot_key"), "left_semi")
      .withColumn("salt", pmod(col("l_linenumber"), lit(SaltBuckets)))
    val oHot = o.join(hot, col("o_orderkey") === col("hot_key"), "left_semi")
      .withColumn("salt", explode(sequence(lit(0), lit(SaltBuckets - 1))))
    val lCold = l.join(hot, col("l_orderkey") === col("hot_key"), "left_anti")
    val oCold = o.join(hot, col("o_orderkey") === col("hot_key"), "left_anti")
    val out = Seq(col("o_orderpriority"), col("l_extendedprice"))
    lHot.join(oHot,
        col("l_orderkey") === col("o_orderkey") && lHot("salt") === oHot("salt"))
      .select(out: _*)
      .unionByName(
        lCold.join(oCold, col("l_orderkey") === col("o_orderkey")).select(out: _*))
  }

  val skewSaltedJoinOracle: String = s"""
    SELECT o_orderpriority AS priority, COUNT(*) AS n_items,
      ${Exact.sqlDsum("l_extendedprice")} AS total_price
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY 1"""

  /** Join-key skew diagnosis — [[skewSaltedJoin]]'s planning twin: the
    * profile a pipeline reads BEFORE deciding to salt. One row per
    * profiled key column: key cardinality, row count, the hottest key
    * and its count, its corpus share in ppm, and `skew_x` — how many
    * times the hottest key exceeds the uniform per-key share
    * (`max_count · n_keys / n_rows`; 1 = perfectly uniform). All
    * decisions integer (DIV / `//` floor division — both operands
    * positive, identical in both engines); products stay far inside
    * bigint at any realistic cardinality (10⁹ keys × 10⁶ ppm).
    *
    * Scale: the per-key count frame is eagerly checkpointed — THREE
    * consumers (stats fold, hottest-key top-1, nothing else touches the
    * base table again) would otherwise each re-plan the groupBy and
    * re-scan the corpus (exchange reuse does not fire across chained
    * aggregates). The checkpointed frame is (key, count) — narrow, key-
    * cardinality-sized. Top-1 plans as TakeOrderedAndProject (bounded
    * heaps, no global sort); the stats fold is one exchange of partial
    * aggregates.
    */
  def skewDiagnose(spark: SparkSession, dir: String): DataFrame = {
    def profile(df: DataFrame, keyCol: String, label: String): DataFrame = {
      val counts = graft.functions.Iterate.checkpoint(
        df.groupBy(col(keyCol).as("k")).agg(count(lit(1)).as("c")))
      val stats = counts.agg(
        count(lit(1)).as("n_keys"),
        sum(col("c")).as("n_rows"),
        max(col("c")).as("max_count"))
      val top = counts.orderBy(col("c").desc, col("k").asc).limit(1)
        .select(col("k").cast("string").as("top_key"))
      top.crossJoin(broadcast(stats))
        .select(lit(label).as("key_col"), col("n_keys"), col("n_rows"),
          col("top_key"), col("max_count"),
          expr("max_count * 1000000L div n_rows").as("max_share_ppm"),
          expr("max_count * n_keys div n_rows").as("skew_x"))
    }
    profile(Tables.lineitem(spark, dir), "l_partkey", "lineitem.l_partkey")
      .unionByName(
        profile(Tables.orders(spark, dir), "o_custkey", "orders.o_custkey"))
      .unionByName(
        profile(Tables.events(spark, dir), "user_id", "events.user_id"))
  }

  val skewDiagnoseOracle: String = {
    def profile(table: String, keyCol: String): String = s"""
    SELECT '$table.$keyCol' AS key_col, n_keys, n_rows, top_key, max_count,
      max_count * 1000000 // n_rows AS max_share_ppm,
      max_count * n_keys // n_rows AS skew_x
    FROM (
      SELECT COUNT(*) AS n_keys, CAST(SUM(c) AS BIGINT) AS n_rows,
        MAX(c) AS max_count
      FROM (SELECT $keyCol AS k, COUNT(*) AS c FROM $table GROUP BY 1))
    CROSS JOIN (
      SELECT CAST(k AS VARCHAR) AS top_key
      FROM (SELECT $keyCol AS k, COUNT(*) AS c FROM $table GROUP BY 1)
      ORDER BY c DESC, k ASC LIMIT 1)"""
    s"""${profile("lineitem", "l_partkey")}
    UNION ALL ${profile("orders", "o_custkey")}
    UNION ALL ${profile("events", "user_id")}"""
  }

  /** TPC-H Q6-style: pure filter + aggregate, the scan-speed baseline —
    * every predicate pushes to the parquet scan.
    */
  def q6Forecast(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp")
        && col("l_shipdate") < lit("1998-01-01").cast("timestamp")
        && col("l_discount").between(0.04, 0.06)
        && col("l_quantity") < 24)
      .agg(
        Exact.dsum(col("l_extendedprice") * col("l_discount")).as("revenue"),
        count(lit(1)).as("n_items"))

  val q6ForecastOracle: String = s"""
    SELECT ${Exact.sqlDsum("l_extendedprice * l_discount")} AS revenue,
      COUNT(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.04 AND 0.06
      AND l_quantity < 24"""

  /** TPC-H Q4-style: priority counts for orders with at least one
    * late-shipped item (EXISTS over a correlated range predicate).
    */
  def q4LateOrders(spark: SparkSession, dir: String): DataFrame = {
    val late = Tables.lineitem(spark, dir)
    Tables.orders(spark, dir)
      .join(late,
        col("o_orderkey") === col("l_orderkey")
          && col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"),
        "left_semi")
      .groupBy(col("o_orderpriority").as("priority"))
      .agg(count(lit(1)).as("n_orders"))
  }

  val q4LateOrdersOracle: String = """
    SELECT o_orderpriority AS priority, COUNT(*) AS n_orders
    FROM orders
    WHERE EXISTS (SELECT 1 FROM lineitem
      WHERE l_orderkey = o_orderkey
        AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
    GROUP BY 1"""

  /** TPC-H Q13-style: customer distribution by order count, including
    * zero-order customers (grouping BY an aggregate of a left join).
    */
  def q13Custdist(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir)
        .filter(col("o_orderpriority") =!= "5-LOW"),
        col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))

  val q13CustdistOracle: String = """
    SELECT c_count, COUNT(*) AS custdist FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer
      LEFT JOIN orders ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
      GROUP BY 1)
    GROUP BY 1"""

  /** TPC-H Q18-style: large-volume orders — HAVING over an aggregate
    * subquery, then joined back to the order/customer context.
    */
  def q18LargeOrders(spark: SparkSession, dir: String): DataFrame = {
    val big = Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey"))
      .agg(Exact.dsum(col("l_quantity")).as("total_qty"))
      .filter(col("total_qty") > 150)
    big.join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.dimHint(Tables.customer(spark, dir)), col("o_custkey") === col("c_custkey"))
      .select(
        col("c_custkey").as("customer_key"),
        col("c_name").as("name"),
        col("o_orderkey").as("order_key"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"),
        col("o_totalprice").as("total_price"),
        col("total_qty"))
  }

  val q18LargeOrdersOracle: String = s"""
    SELECT c_custkey AS customer_key, c_name AS name,
      o_orderkey AS order_key,
      STRFTIME(o_orderdate, '%Y-%m-%d') AS order_date,
      o_totalprice AS total_price, total_qty
    FROM (
      SELECT l_orderkey, ${Exact.sqlDsum("l_quantity")} AS total_qty
      FROM lineitem GROUP BY 1
      HAVING ${Exact.sqlDsum("l_quantity")} > 150)
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey"""

  /** TPC-H Q22-style: "global sales opportunity" — customers with
    * above-average balance (scalar subquery) and no urgent orders
    * (anti join), rolled up by nation.
    */
  def q22Opportunity(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val avgBal = c.filter(col("c_acctbal") > 0)
      .agg(Exact.davg(col("c_acctbal")).as("avg_bal"))
    val urgent = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey"))
    c.crossJoin(broadcast(avgBal))
      .filter(col("c_acctbal") > col("avg_bal"))
      .join(urgent, col("c_custkey") === col("o_custkey"), "left_anti")
      .join(broadcast(Tables.nation(spark, dir)), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"))
      .agg(
        count(lit(1)).as("n_customers"),
        Exact.dsum(col("c_acctbal")).as("total_balance"))
  }

  val q22OpportunityOracle: String = s"""
    SELECT n_name AS nation, COUNT(*) AS n_customers,
      ${Exact.sqlDsum("c_acctbal")} AS total_balance
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    WHERE c_acctbal > (
        SELECT ${Exact.sqlDavg("c_acctbal")} FROM customer WHERE c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders
        WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
    GROUP BY 1"""

  /** TPC-H Q10-style: top customers by revenue from returned items in a
    * date window, with geography context.
    */
  def q10Returns(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp")
        && col("o_orderdate") < lit("1997-07-01").cast("timestamp"))
    val l = Tables.lineitem(spark, dir).filter(col("l_returnflag") === "R")
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(Tables.dimHint(Tables.customer(spark, dir)), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, dir)), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey").as("customer_key"), col("c_name").as("name"),
        col("n_name").as("nation"))
      .agg(Exact.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .as("returned_revenue"))
      .orderBy(col("returned_revenue").desc, col("customer_key").asc)
      .limit(20)
  }

  val q10ReturnsOracle: String = s"""
    SELECT c_custkey AS customer_key, c_name AS name, n_name AS nation,
      ${Exact.sqlDsum("l_extendedprice * (1.0 - l_discount)")} AS returned_revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate < TIMESTAMP '1997-07-01'
    GROUP BY 1, 2, 3
    ORDER BY returned_revenue DESC, customer_key ASC LIMIT 20"""

  /** TPC-H Q12-style: conditional classification counts — urgent-class
    * vs other orders per ship year (CASE aggregation).
    */
  def q12PriorityClass(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .groupBy(year(col("l_shipdate")).as("ship_year"))
      .agg(
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L))
          .as("high_line_count"),
        sum(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L))
          .as("low_line_count"))

  val q12PriorityClassOracle: String = """
    SELECT CAST(YEAR(l_shipdate) AS INTEGER) AS ship_year,
      CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
        THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
        THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY 1"""

  /** TPC-H Q14-style: revenue share of one product class in a window —
    * a ratio of two exact sums, one deterministic division.
    */
  def q14PromoShare(spark: SparkSession, dir: String): DataFrame = {
    val rev = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp")
        && col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
      .join(Tables.dimHint(Tables.part(spark, dir)), col("l_partkey") === col("p_partkey"))
      .agg(
        (lit(100.0) * Exact.dsum(when(col("p_type") === "ECONOMY", rev).otherwise(lit(0.0)))
          / Exact.dsum(rev)).as("economy_share_pct"),
        count(lit(1)).as("n_items"))
  }

  val q14PromoShareOracle: String = s"""
    SELECT 100.0 * ${Exact.sqlDsum(
      "CASE WHEN p_type = 'ECONOMY' THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END")}
      / ${Exact.sqlDsum("l_extendedprice * (1.0 - l_discount)")} AS economy_share_pct,
      COUNT(*) AS n_items
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1997-04-01'"""

  /** Per-key top-k via the custom physical operator
    * [[org.apache.spark.sql.graft.TopKPerKeyExec]] (bounded heaps, no
    * partition sort) — same results as [[windowRank]], same DuckDB
    * oracle, different physical algorithm. The strategy self-registers
    * through `spark.experimental.extraStrategies` so the operator works
    * on any session; `GraftExtensions` also injects it.
    */
  def topKPerKey(df: DataFrame, keys: Seq[Column], order: Seq[Column], k: Int): DataFrame = {
    import org.apache.spark.sql.GraftBridge
    import org.apache.spark.sql.graft.{TopKPerKeyPlan, TopKStrategy}
    import org.apache.spark.sql.catalyst.expressions.{Ascending, SortOrder}
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(TopKStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKStrategy
    }
    val sortOrders = order.map(c => GraftBridge.catalystExpression(c) match {
      case s: SortOrder => s
      case e => SortOrder(e, Ascending)
    })
    GraftBridge.ofRows(spark,
      TopKPerKeyPlan(k, keys.map(GraftBridge.catalystExpression), sortOrders,
        GraftBridge.logicalPlan(df)))
  }

  /** windowRank's twin on the custom operator: heap-select the top 3
    * rows per customer (no full sort), then rank the tiny survivor set.
    * Oracle: identical SQL to window_rank — two implementations, one
    * answer.
    */
  def windowRankNative(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val top = topKPerKey(
      Tables.orders(spark, dir),
      keys = Seq(col("o_custkey")),
      order = Seq(col("o_totalprice").desc, col("o_orderkey").asc),
      k = 3)
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    top
      .withColumn("rank_in_customer", row_number().over(w))
      .select(
        col("o_custkey").as("customer_key"),
        col("o_orderkey").as("order_key"),
        col("o_totalprice").as("total_price"),
        col("rank_in_customer"))
  }

  /** Left-semi join: customers with ≥1 urgent order — EXISTS semantics
    * without duplicating or carrying right-side columns (the shuffle
    * carries only the key set).
    */
  def joinSemi(spark: SparkSession, dir: String): DataFrame = {
    val urgent = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey"))
    Tables.customer(spark, dir)
      .join(urgent, col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
  }

  val joinSemiOracle: String = """
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
      WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')"""

  /** Left-anti join: customers who never placed an urgent order (TPC-H
    * Q22 flavor; the urgent filter keeps the result non-degenerate on
    * this data — every customer has SOME order).
    */
  def joinAnti(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir)
        .filter(col("o_orderpriority") === "1-URGENT").select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))

  val joinAntiOracle: String = """
    SELECT c_custkey, c_name, c_acctbal
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
      WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')"""

  /** Set operators: nations with customers but no suppliers (EXCEPT) and
    * nations with both (INTERSECT), tagged and unioned.
    */
  def setOps(spark: SparkSession, dir: String): DataFrame = {
    // High-balance supplier nations only: keeps the EXCEPT branch
    // non-empty (every nation has some supplier).
    val cn = Tables.customer(spark, dir).select(col("c_nationkey").as("nationkey")).distinct()
    val sn = Tables.supplier(spark, dir).filter(col("s_acctbal") > 5000)
      .select(col("s_nationkey").as("nationkey")).distinct()
    cn.except(sn).withColumn("op", lit("customers_only"))
      .unionByName(cn.intersect(sn).withColumn("op", lit("both")))
      .select(col("op"), col("nationkey"))
  }

  val setOpsOracle: String = """
    SELECT 'customers_only' AS op, nationkey FROM (
      SELECT DISTINCT c_nationkey AS nationkey FROM customer
      EXCEPT SELECT DISTINCT s_nationkey FROM supplier WHERE s_acctbal > 5000)
    UNION ALL
    SELECT 'both' AS op, nationkey FROM (
      SELECT DISTINCT c_nationkey AS nationkey FROM customer
      INTERSECT SELECT DISTINCT s_nationkey FROM supplier WHERE s_acctbal > 5000)"""

  /** TPC-H Q7-style: bilateral shipping volume between two nations by
    * ship year (cross-nation join constraint over two broadcast dims).
    * The nation pair is NATION_3/NATION_8 — chosen so BOTH directions of
    * the bilateral filter match rows at sf0.001/0.01/0.1 (sf0.001 has
    * only 10 suppliers, covering nations {3,8,12,13,15,18,19,20,21,24}).
    * The first cut used TPC-H's literal FRANCE/GERMANY, which matched
    * nothing at any SF, so the oracle green only proved two empty sets
    * equal (r13 verdict finding 1); NonVacuitySpec now rejects that
    * class registry-wide.
    */
  def q7Volume(spark: SparkSession, dir: String): DataFrame = {
    val n1 = Tables.nation(spark, dir)
      .select(col("n_nationkey").as("s_nkey"), col("n_name").as("supp_nation"))
    val n2 = Tables.nation(spark, dir)
      .select(col("n_nationkey").as("c_nkey"), col("n_name").as("cust_nation"))
    Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.dimHint(Tables.supplier(spark, dir)), col("l_suppkey") === col("s_suppkey"))
      .join(Tables.dimHint(Tables.customer(spark, dir)), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n1), col("s_nationkey") === col("s_nkey"))
      .join(broadcast(n2), col("c_nationkey") === col("c_nkey"))
      .filter((col("supp_nation") === "NATION_3" && col("cust_nation") === "NATION_8")
        || (col("supp_nation") === "NATION_8" && col("cust_nation") === "NATION_3"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("ship_year"))
      .agg(Exact.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("volume"))
  }

  val q7VolumeOracle: String = s"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      CAST(YEAR(l_shipdate) AS INTEGER) AS ship_year,
      ${Exact.sqlDsum("l_extendedprice * (1.0 - l_discount)")} AS volume
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_8')
       OR (n1.n_name = 'NATION_8' AND n2.n_name = 'NATION_3')
    GROUP BY 1, 2, 3"""

  /** SCD2 dimension merge: apply an update set to the customer dimension,
    * closing changed rows and inserting new versions — the Kimball
    * slowly-changing-dimension pattern the reference's dims
    * (is_current/start_date/end_date, check_DWH.py:26-64) are shaped for.
    * Updates here: negative-balance customers move to segment 'DELINQUENT'.
    */
  def scd2Merge(spark: SparkSession, dir: String): DataFrame = {
    val dim = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"),
        lit("1970-01-01").as("valid_from"), lit("9999-12-31").as("valid_to"),
        lit(true).as("is_current"))
    val changed = col("c_acctbal") < 0
    val updates = Tables.customer(spark, dir).filter(changed)
      .select(col("c_custkey"))
    val asOf = "2024-01-01"
    val unchanged = dim.join(updates, Seq("c_custkey"), "left_anti")
    val closed = dim.join(updates, Seq("c_custkey"), "left_semi")
      .withColumn("valid_to", lit(asOf))
      .withColumn("is_current", lit(false))
    val fresh = Tables.customer(spark, dir).filter(changed)
      .select(col("c_custkey"), col("c_name"),
        lit("DELINQUENT").as("c_mktsegment"),
        lit(asOf).as("valid_from"), lit("9999-12-31").as("valid_to"),
        lit(true).as("is_current"))
    unchanged.unionByName(closed).unionByName(fresh)
  }

  /** Point-in-time (as-of) fact→SCD2-dim join — THE query pattern an
    * SCD2 dimension exists for ([[scd2Merge]] builds the validity
    * windows; this consumes them): every order joins the dim row whose
    * [valid_from, valid_to) window contains its order date, so revenue
    * lands in the segment the customer was in WHEN THEY ORDERED, not
    * the one they hold today. The cut sits inside the order-date span
    * (1998-01-01; negative-balance customers re-segment to DELINQUENT
    * then), so both validity windows carry real orders. Dates compare
    * as ISO strings (lexicographic ≡ chronological — the repo's
    * timestamp-portability discipline). Scale: the dim has ≤2 rows per
    * key, so this plans as an EQUI-join on custkey with the window as
    * a residual filter — never a range join; one fact-keyed shuffle,
    * one small aggregate.
    */
  def scd2PointInTime(spark: SparkSession, dir: String): DataFrame = {
    val cut = "1998-01-01"
    val base = Tables.customer(spark, dir)
    val delinquent = col("c_acctbal") < 0
    val dim = base.select(col("c_custkey"), col("c_mktsegment"),
        lit("1970-01-01").as("valid_from"),
        when(delinquent, lit(cut)).otherwise(lit("9999-12-31")).as("valid_to"))
      .unionByName(base.filter(delinquent).select(col("c_custkey"),
        lit("DELINQUENT").as("c_mktsegment"),
        lit(cut).as("valid_from"), lit("9999-12-31").as("valid_to")))
    val facts = Tables.orders(spark, dir).select(col("o_custkey"),
      date_format(col("o_orderdate"), "yyyy-MM-dd").as("od"),
      expr("CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)").as("cents"))
    facts.join(dim, facts("o_custkey") === dim("c_custkey")
        && col("od") >= col("valid_from") && col("od") < col("valid_to"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"), sum(col("cents")).as("revenue_cents"))
  }

  val scd2PointInTimeOracle: String = """
    WITH dim AS (
      SELECT c_custkey, c_mktsegment, '1970-01-01' AS valid_from,
        CASE WHEN c_acctbal < 0 THEN '1998-01-01'
             ELSE '9999-12-31' END AS valid_to
      FROM customer
      UNION ALL
      SELECT c_custkey, 'DELINQUENT', '1998-01-01', '9999-12-31'
      FROM customer WHERE c_acctbal < 0),
    f AS (
      SELECT o_custkey, STRFTIME(o_orderdate, '%Y-%m-%d') AS od,
        CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
      FROM orders)
    SELECT d.c_mktsegment, COUNT(*) AS n_orders,
      CAST(SUM(f.cents) AS BIGINT) AS revenue_cents
    FROM f JOIN dim d ON f.o_custkey = d.c_custkey
      AND f.od >= d.valid_from AND f.od < d.valid_to
    GROUP BY 1"""

  val scd2MergeOracle: String = """
    WITH dim AS (
      SELECT c_custkey, c_name, c_mktsegment,
        '1970-01-01' AS valid_from, '9999-12-31' AS valid_to, TRUE AS is_current
      FROM customer),
    upd AS (SELECT c_custkey FROM customer WHERE c_acctbal < 0)
    SELECT * FROM dim WHERE c_custkey NOT IN (SELECT c_custkey FROM upd)
    UNION ALL
    SELECT c_custkey, c_name, c_mktsegment, valid_from, '2024-01-01', FALSE
    FROM dim WHERE c_custkey IN (SELECT c_custkey FROM upd)
    UNION ALL
    SELECT c_custkey, c_name, 'DELINQUENT', '2024-01-01', '9999-12-31', TRUE
    FROM customer WHERE c_acctbal < 0"""

  /** CUBE aggregate: all grouping-set combinations, NULL keys coalesced. */
  def cubeAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .cube(col("o_orderstatus"), year(col("o_orderdate")).as("order_year"))
      .agg(count(lit(1)).as("n_orders"),
        Exact.dsum(col("o_totalprice")).as("total_value"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("order_year").cast("string"), lit("ALL")).as("order_year"),
        col("n_orders"), col("total_value"))

  val cubeAggOracle: String = s"""
    SELECT COALESCE(o_orderstatus, 'ALL') AS status,
      COALESCE(CAST(oy AS VARCHAR), 'ALL') AS order_year,
      COUNT(*) AS n_orders,
      ${Exact.sqlDsum("o_totalprice")} AS total_value
    FROM (SELECT o_orderstatus, CAST(YEAR(o_orderdate) AS INTEGER) AS oy,
            o_totalprice FROM orders)
    GROUP BY CUBE(o_orderstatus, oy)"""

  /** Explicit GROUPING SETS — the general form rollup_agg/cube_agg
    * specialize: exactly the (status, year), (status) and grand-total
    * layers, with `grouping_id()` distinguishing a real NULL dimension
    * from an aggregated-away one (the COALESCE('ALL') trick the
    * rollup/cube twins use can't tell those apart — gid can). One
    * shuffle; Spark expands the sets map-side, so each input row feeds
    * all three layers in the same partial aggregate.
    */
  def groupingSetsAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(col("o_orderstatus"), year(col("o_orderdate")).as("order_year"),
        col("o_totalprice"))
      .groupingSets(
        Seq(Seq(col("o_orderstatus"), col("order_year")),
          Seq(col("o_orderstatus")), Seq.empty),
        col("o_orderstatus"), col("order_year"))
      .agg(
        grouping_id().as("gid"),
        count(lit(1)).as("n_orders"),
        Exact.dsum(col("o_totalprice")).as("total_value"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("order_year").cast("string"), lit("ALL")).as("order_year"),
        col("gid"), col("n_orders"), col("total_value"))

  val groupingSetsAggOracle: String = s"""
    SELECT COALESCE(o_orderstatus, 'ALL') AS status,
      COALESCE(CAST(oy AS VARCHAR), 'ALL') AS order_year,
      CAST(GROUPING(o_orderstatus, oy) AS BIGINT) AS gid,
      COUNT(*) AS n_orders,
      ${Exact.sqlDsum("o_totalprice")} AS total_value
    FROM (SELECT o_orderstatus, CAST(YEAR(o_orderdate) AS INTEGER) AS oy,
            o_totalprice FROM orders)
    GROUP BY GROUPING SETS ((o_orderstatus, oy), (o_orderstatus), ())"""

  /** Statistical aggregates with engine-portable determinism: built-in
    * stddev/corr use engine-specific accumulation (Welford vs naive ⇒
    * different last bits), so variance and correlation are derived from
    * exact decimal moment sums instead — identical doubles everywhere.
    */
  def statsAgg(spark: SparkSession, dir: String): DataFrame = {
    // Integer-scaled moments: qty is integral, price has exactly 2
    // decimals → work in (qty, price-cents) longs. Every product and sum
    // is then EXACT (decimal accumulator where int64 could overflow), so
    // both engines derive the final doubles from identical integers.
    // Correlation is scale-invariant, so corr(qty, cents) = corr(qty, $).
    // (Casting big-mantissa doubles like price² straight to decimal is
    // NOT portable: Spark rounds the shortest decimal repr, DuckDB
    // scales-and-rounds the binary value — last-bit divergence.)
    val xi = floor(col("l_quantity"))
    val yc = floor(col("l_extendedprice") * 100.0 + 0.5)
    Tables.lineitem(spark, dir)
      .select(col("l_returnflag"), xi.as("xi"), yc.as("yc"))
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).cast("double").as("n"),
        sum(col("xi")).cast("double").as("sx"),
        sum((col("xi") * col("xi")).cast(org.apache.spark.sql.types.DecimalType(38, 0)))
          .cast("double").as("sxx"),
        sum(col("yc")).cast("double").as("sy"),
        sum((col("yc") * col("yc")).cast(org.apache.spark.sql.types.DecimalType(38, 0)))
          .cast("double").as("syy"),
        sum((col("xi") * col("yc")).cast(org.apache.spark.sql.types.DecimalType(38, 0)))
          .cast("double").as("sxy"))
      .select(
        col("l_returnflag"),
        col("n").cast("bigint").as("n"),
        ((col("sxx") - col("sx") * col("sx") / col("n")) / (col("n") - 1.0))
          .as("var_qty"),
        sqrt((col("sxx") - col("sx") * col("sx") / col("n")) / (col("n") - 1.0))
          .as("std_qty"),
        ((col("sxy") - col("sx") * col("sy") / col("n")) /
          sqrt((col("sxx") - col("sx") * col("sx") / col("n"))
            * (col("syy") - col("sy") * col("sy") / col("n"))))
          .as("corr_qty_price"))
  }

  val statsAggOracle: String = """
    SELECT l_returnflag, CAST(n AS BIGINT) AS n,
      (sxx - sx * sx / n) / (n - 1.0) AS var_qty,
      SQRT((sxx - sx * sx / n) / (n - 1.0)) AS std_qty,
      (sxy - sx * sy / n) / SQRT((sxx - sx * sx / n) * (syy - sy * sy / n))
        AS corr_qty_price
    FROM (
      SELECT l_returnflag, CAST(COUNT(*) AS DOUBLE) AS n,
        CAST(SUM(xi) AS DOUBLE) AS sx,
        CAST(SUM(CAST(xi * xi AS DECIMAL(38,0))) AS DOUBLE) AS sxx,
        CAST(SUM(yc) AS DOUBLE) AS sy,
        CAST(SUM(CAST(yc * yc AS DECIMAL(38,0))) AS DOUBLE) AS syy,
        CAST(SUM(CAST(xi * yc AS DECIMAL(38,0))) AS DOUBLE) AS sxy
      FROM (
        SELECT l_returnflag,
          CAST(FLOOR(l_quantity) AS BIGINT) AS xi,
          CAST(FLOOR(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS yc
        FROM lineitem)
      GROUP BY 1)"""

  /** Ordered string aggregation (LISTAGG): distinct priorities per
    * status, sorted — collect_set order is nondeterministic, so sort
    * before joining.
    */
  def stringAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_orderstatus").as("status"))
      .agg(concat_ws(",", array_sort(collect_set(col("o_orderpriority"))))
        .as("priorities"))

  val stringAggOracle: String = """
    SELECT o_orderstatus AS status,
      STRING_AGG(DISTINCT o_orderpriority, ',' ORDER BY o_orderpriority) AS priorities
    FROM orders GROUP BY 1"""

  /** Structured extraction via regex capture groups — the reference
    * parses ids/names out of semi-structured strings (handle_id,
    * utils.py:66).
    */
  def regexExtract(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .select(
        col("c_custkey"),
        regexp_extract(col("c_name"), "#(\\d+)", 1).cast("bigint").as("name_id"),
        regexp_extract(col("c_name"), "^([A-Za-z]+)#", 1).as("name_prefix"))

  val regexExtractOracle: String = """
    SELECT c_custkey,
      CAST(REGEXP_EXTRACT(c_name, '#(\d+)', 1) AS BIGINT) AS name_id,
      REGEXP_EXTRACT(c_name, '^([A-Za-z]+)#', 1) AS name_prefix
    FROM customer"""

  /** TPC-H Q8-style: a nation's market share inside its region, per
    * order year — conditional share of an exact revenue sum. Both sums
    * come from ONE aggregation (no double scan); dims broadcast.
    */
  def q8MarketShare(spark: SparkSession, dir: String): DataFrame = {
    val rev = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    val suppNation = Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val custRegion = Tables.customer(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir)),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("c_custkey"), col("r_name"))
    Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.dimHint(custRegion), col("o_custkey") === col("c_custkey"))
      .filter(col("r_name") === "AMERICA")
      .join(Tables.dimHint(suppNation), col("l_suppkey") === col("s_suppkey"))
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg(
        Exact.dsum(when(col("supp_nation") === "BRAZIL", rev).otherwise(lit(0.0)))
          .as("nation_rev"),
        Exact.dsum(rev).as("total_rev"))
      .select(col("o_year"),
        (col("nation_rev") / col("total_rev")).as("mkt_share"))
  }

  val q8MarketShareOracle: String = s"""
    SELECT o_year,
      nation_rev / total_rev AS mkt_share
    FROM (
      SELECT CAST(YEAR(o_orderdate) AS INTEGER) AS o_year,
        ${Exact.sqlDsum("CASE WHEN n2.n_name = 'BRAZIL' THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END")} AS nation_rev,
        ${Exact.sqlDsum("l_extendedprice * (1.0 - l_discount)")} AS total_rev
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region ON n1.n_regionkey = r_regionkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'AMERICA'
      GROUP BY 1)"""

  /** TPC-H Q15-style: supplier(s) with the maximum quarterly revenue —
    * a reused CTE compared against its own scalar max. Double equality
    * is safe because both sides derive from the same exact decimal sum.
    */
  def q15TopSupplier(spark: SparkSession, dir: String): DataFrame = {
    val revenue = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= "1997-01-01" && col("l_shipdate") < "1997-04-01")
      .groupBy(col("l_suppkey"))
      .agg(Exact.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .as("total_rev"))
    val maxRev = revenue.agg(max(col("total_rev")).as("max_rev"))
    revenue.join(broadcast(maxRev), col("total_rev") === col("max_rev"))
      .join(Tables.dimHint(Tables.supplier(spark, dir)), col("l_suppkey") === col("s_suppkey"))
      .select(col("l_suppkey").as("supp_key"), col("s_name").as("name"),
        col("total_rev"))
  }

  val q15TopSupplierOracle: String = s"""
    WITH revenue AS (
      SELECT l_suppkey, ${Exact.sqlDsum("l_extendedprice * (1.0 - l_discount)")} AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate < TIMESTAMP '1997-04-01'
      GROUP BY 1)
    SELECT l_suppkey AS supp_key, s_name AS name, total_rev
    FROM revenue
    JOIN supplier ON l_suppkey = s_suppkey
    WHERE total_rev = (SELECT MAX(total_rev) FROM revenue)"""

  /** TPC-H Q17-style: revenue locked in small-quantity orders of a
    * brand — the correlated average reframed as a per-part aggregate
    * join (the scale-correct decorrelation Catalyst would also pick).
    */
  def q17SmallQuantity(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
    val partAvg = l.groupBy(col("l_partkey").as("avg_partkey"))
      .agg((Exact.dsum(col("l_quantity"))
        / count(lit(1)).cast("double")).as("avg_qty"))
    l.join(Tables.dimHint(Tables.part(spark, dir).filter(col("p_brand") === "Brand#1")),
        col("l_partkey") === col("p_partkey"))
      .join(partAvg, col("l_partkey") === col("avg_partkey"))
      .filter(col("l_quantity") < lit(0.5) * col("avg_qty"))
      .agg((Exact.dsum(col("l_extendedprice")) / lit(7.0)).as("avg_yearly"))
  }

  val q17SmallQuantityOracle: String = s"""
    SELECT ${Exact.sqlDsum("l_extendedprice")} / 7.0 AS avg_yearly
    FROM lineitem
    JOIN part ON l_partkey = p_partkey AND p_brand = 'Brand#1'
    JOIN (
      SELECT l_partkey AS avg_partkey,
        ${Exact.sqlDsum("l_quantity")} / CAST(COUNT(*) AS DOUBLE) AS avg_qty
      FROM lineitem GROUP BY 1) a ON l_partkey = avg_partkey
    WHERE l_quantity < 0.5 * avg_qty"""

  /** TPC-H Q19-style: disjunctive predicate revenue — OR-of-ANDs over
    * part attributes and quantity bands, the pattern that tests
    * OR-predicate pushdown through a join.
    */
  def q19Disjunctive(spark: SparkSession, dir: String): DataFrame = {
    val rev = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    Tables.lineitem(spark, dir)
      .join(Tables.dimHint(Tables.part(spark, dir)), col("l_partkey") === col("p_partkey"))
      .filter(
        (col("p_brand") === "Brand#1" && col("p_size").between(1, 15)
          && col("l_quantity").between(1, 11))
          || (col("p_brand") === "Brand#2" && col("p_size").between(1, 25)
            && col("l_quantity").between(10, 20))
          || (col("p_brand") === "Brand#3" && col("p_size").between(1, 35)
            && col("l_quantity").between(20, 30)))
      .agg(Exact.dsum(rev).as("revenue"), count(lit(1)).as("n_items"))
  }

  val q19DisjunctiveOracle: String = s"""
    SELECT ${Exact.sqlDsum("l_extendedprice * (1.0 - l_discount)")} AS revenue,
      COUNT(*) AS n_items
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)"""

  /** TPC-H Q21-style: suppliers who were the sole late shipper in
    * multi-supplier orders (EXISTS for another supplier's line,
    * NOT EXISTS for another LATE supplier's line; "late" = shipped >90
    * days after order date, the lake's l_receiptdate analog). Two
    * semi/anti joins against the same keyed frame — both shuffle on
    * l_orderkey, so AQE plans them off one exchange.
    */
  def q21WaitingSupplier(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir).filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .withColumn("is_late",
        col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"))
    val l1 = l.filter(col("is_late"))
      .select(col("l_orderkey").as("k"), col("l_suppkey").as("s"))
    val others = l.select(col("l_orderkey").as("k2"), col("l_suppkey").as("s2"),
      col("is_late").as("late2"))
    l1
      .join(others, col("k") === col("k2") && col("s") =!= col("s2"), "left_semi")
      .join(others.filter(col("late2")),
        col("k") === col("k2") && col("s") =!= col("s2"), "left_anti")
      .groupBy(col("s").as("supp_key"))
      .agg(count(lit(1)).as("numwait"))
  }

  val q21WaitingSupplierOracle: String = """
    WITH l AS (
      SELECT l_orderkey, l_suppkey,
        (l_shipdate > o_orderdate + INTERVAL 90 DAY) AS is_late
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderstatus = 'F')
    SELECT l1.l_suppkey AS supp_key, COUNT(*) AS numwait
    FROM l l1
    WHERE l1.is_late
      AND EXISTS (SELECT 1 FROM l l2
        WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM l l3
        WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
          AND l3.is_late)
    GROUP BY 1"""

  def defs: Map[String, QueryDef] = Map(
    "q8_market_share" -> QueryDef.sql(q8MarketShare, q8MarketShareOracle),
    "q15_top_supplier" -> QueryDef.sql(q15TopSupplier, q15TopSupplierOracle),
    "q17_small_quantity" -> QueryDef.sql(q17SmallQuantity, q17SmallQuantityOracle),
    "q19_disjunctive" -> QueryDef.sql(q19Disjunctive, q19DisjunctiveOracle),
    "q21_waiting_supplier" -> QueryDef.sql(q21WaitingSupplier, q21WaitingSupplierOracle),
    "q1_agg" -> QueryDef.sql(q1Agg, q1AggOracle),
    "cube_agg" -> QueryDef.sql(cubeAgg, cubeAggOracle),
    "grouping_sets_agg" -> QueryDef.sql(groupingSetsAgg, groupingSetsAggOracle),
    "stats_agg" -> QueryDef.sql(statsAgg, statsAggOracle),
    "string_agg" -> QueryDef.sql(stringAgg, stringAggOracle),
    "regex_extract" -> QueryDef.sql(regexExtract, regexExtractOracle),
    "join_semi" -> QueryDef.sql(joinSemi, joinSemiOracle),
    "join_anti" -> QueryDef.sql(joinAnti, joinAntiOracle),
    "set_ops" -> QueryDef.sql(setOps, setOpsOracle),
    "q7_volume" -> QueryDef.sql(q7Volume, q7VolumeOracle),
    "q6_forecast" -> QueryDef.sql(q6Forecast, q6ForecastOracle),
    "q4_late_orders" -> QueryDef.sql(q4LateOrders, q4LateOrdersOracle),
    "q13_custdist" -> QueryDef.sql(q13Custdist, q13CustdistOracle),
    "q18_large_orders" -> QueryDef.sql(q18LargeOrders, q18LargeOrdersOracle),
    "q22_opportunity" -> QueryDef.sql(q22Opportunity, q22OpportunityOracle),
    "q10_returns" -> QueryDef.sql(q10Returns, q10ReturnsOracle),
    "q12_priority_class" -> QueryDef.sql(q12PriorityClass, q12PriorityClassOracle),
    "q14_promo_share" -> QueryDef.sql(q14PromoShare, q14PromoShareOracle),
    "scd2_merge" -> QueryDef.sql(scd2Merge, scd2MergeOracle),
    "scd2_point_in_time" ->
      QueryDef.sql(scd2PointInTime, scd2PointInTimeOracle),
    "q3_shipping" -> QueryDef.sql(q3Shipping, q3ShippingOracle),
    "q5_local" -> QueryDef.sql(q5Local, q5LocalOracle),
    "window_rank" -> QueryDef.sql(windowRank, windowRankOracle),
    "window_rank_native" -> QueryDef.sql(windowRankNative, windowRankOracle),
    "rollup_agg" -> QueryDef.sql(rollupAgg, rollupAggOracle),
    "pivot_agg" -> QueryDef.sql(pivotAgg, pivotAggOracle),
    "unpivot_melt" -> QueryDef.sql(unpivotMelt, unpivotMeltOracle),
    "percentiles" -> QueryDef.sql(percentiles, percentilesOracle),
    "approx_percentiles" -> QueryDef.sql(approxPercentiles, approxPercentilesOracle),
    "skew_salted_join" -> QueryDef.sql(skewSaltedJoin, skewSaltedJoinOracle),
    "skew_diagnose" -> QueryDef.sql(skewDiagnose, skewDiagnoseOracle)
  )
}
