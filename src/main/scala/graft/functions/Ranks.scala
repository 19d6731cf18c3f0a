package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact global ranks WITHOUT a single-partition window.
  *
  * `row_number() OVER (ORDER BY ...)` and `ntile(k) OVER (ORDER BY ...)`
  * serialize the whole input through ONE WindowExec task — correct and
  * cheap at sf0.1, a 100×-scale killer at corpus size (Spark logs
  * `WindowExec: No Partition Defined` for exactly this reason). The
  * two-level replacement used here keeps the rank EXACT (bit-identical
  * to the one-window oracle) while the corpus-scale work stays
  * partitioned:
  *
  *   1. a caller-supplied integer CELL that is monotone non-decreasing
  *      along the global sort order (a value prefix, a range bucket from
  *      broadcast min/max — anything whose boundaries respect the order);
  *   2. a per-cell histogram (bounded, dimension-scale) whose exclusive
  *      prefix sums give each cell its serial BASE — computed via a
  *      triangular join over the histogram rather than a window, so even
  *      the metadata pass carries no unpartitioned WindowExec;
  *   3. a within-cell `row_number` PARTITIONED by cell.
  *
  * global rank = base + local rank, identical to the global window
  * because partition boundaries cannot change a prefix count. Parallelism
  * scales with the data (a hot cell bounds one partition; callers choose
  * cells wide enough to stay dimension-scale and narrow enough to spread
  * the corpus — ≤ ~4k cells keeps the triangular histogram join under
  * 16M metadata pairs while giving 4k-way rank parallelism).
  *
  * The family: [[withGlobalRank]] (row_number), [[withExclusivePrefix]]
  * / [[withExclusivePrefixMax]] (running SUM / MAX — any associative
  * fold decomposes the same way), [[withNtile]] (arithmetic NTILE from
  * a rank), and the `withBucketed*` wrappers that derive the cell from
  * a broadcast [min, max] span probe so call sites never hand-spell the
  * monotonicity-critical bucket formula. `spark.graft.validateRankCells
  * = true` adds an eager debug check of the monotone-cell contract.
  * The same trick powers curriculum_order / sequence_pack (Sampling
  * .scala); this is the shared, reusable form. Reference analog: the
  * course pipelines rank in pandas on one node
  * (utils/utils.py transform helpers); at Spark scale the rank itself
  * must distribute.
  */
object Ranks {

  /** Adds BIGINT column `out` = exact `row_number() OVER (ORDER BY
    * order...)` (1-based). `cell` MUST be an integer expression monotone
    * non-decreasing in the global `order` (cell boundaries respect the
    * sort), and `order` must be a total order (callers tie-break on a
    * key) — both engines then agree rank-for-rank.
    */
  def withGlobalRank(df: DataFrame, out: String, cell: Column,
      order: Seq[Column]): DataFrame = {
    require(order.nonEmpty, "Ranks.withGlobalRank: order must be non-empty")
    val tagged = df.withColumn("__gr_cell", cell.cast("bigint"))
    validateMonotoneCells(tagged, "__gr_cell", order, "withGlobalRank")
    val hist = tagged.groupBy(col("__gr_cell")).agg(count(lit(1)).as("__gr_c"))
    // exclusive prefix over the bounded histogram, as a triangular join
    // (≤ cells² metadata pairs, broadcast nested-loop) — no WindowExec
    // with an empty partition spec anywhere in the plan
    val lower = hist.select(col("__gr_cell").as("__gr_cell_lo"),
      col("__gr_c").as("__gr_c_lo"))
    val bases = hist
      .join(lower, col("__gr_cell_lo") < col("__gr_cell"), "left")
      .groupBy(col("__gr_cell"))
      .agg(coalesce(sum(col("__gr_c_lo")), lit(0L)).as("__gr_base"))
    val wCell = Window.partitionBy(col("__gr_cell")).orderBy(order: _*)
    tagged
      .withColumn("__gr_rn", row_number().over(wCell).cast("long"))
      .join(graft.Tables.stateHint(bases), Seq("__gr_cell"))
      .withColumn(out, col("__gr_base") + col("__gr_rn"))
      .drop("__gr_cell", "__gr_rn", "__gr_base")
  }

  /** Adds exclusive-prefix-sum columns over a total order WITHOUT an
    * unpartitioned window — the [[withGlobalRank]] shape applied to
    * running sums: per-cell totals of each summand, cell bases from the
    * triangular metadata join, then a cell-PARTITIONED exclusive
    * running sum. For each `(expr, name)` in `sums` the output gains
    * `name` = Σ expr over all rows STRICTLY before the current one in
    * the global order (0 for the first row). Same contract as the rank
    * helper: `cell` integer and monotone non-decreasing along `order`,
    * `order` a total order.
    */
  def withExclusivePrefix(df: DataFrame, cell: Column, order: Seq[Column],
      sums: Seq[(Column, String)]): DataFrame = {
    require(sums.nonEmpty,
      "Ranks.withExclusivePrefix: sums must carry at least one (expr, name)")
    require(order.nonEmpty, "Ranks.withExclusivePrefix: order must be non-empty")
    val tagged = df.withColumn("__px_cell", cell.cast("bigint"))
    validateMonotoneCells(tagged, "__px_cell", order, "withExclusivePrefix")
    val hist = tagged.groupBy(col("__px_cell"))
      .agg(sum(sums.head._1).as("__px_t0"),
        sums.tail.zipWithIndex.map { case ((e, _), i) =>
          sum(e).as(s"__px_t${i + 1}") }: _*)
    val lower = hist.select(col("__px_cell").as("__px_cell_lo") +:
      sums.indices.map(i => col(s"__px_t$i").as(s"__px_lo$i")): _*)
    val bases = hist
      .join(lower, col("__px_cell_lo") < col("__px_cell"), "left")
      .groupBy(col("__px_cell"))
      .agg(coalesce(sum(col("__px_lo0")), lit(0L)).as("__px_b0"),
        sums.indices.tail.map(i =>
          coalesce(sum(col(s"__px_lo$i")), lit(0L)).as(s"__px_b$i")): _*)
    val wCell = Window.partitionBy(col("__px_cell")).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val joined = tagged.join(graft.Tables.stateHint(bases), Seq("__px_cell"))
    val withSums = sums.zipWithIndex.foldLeft(joined) {
      case (d, ((e, name), i)) =>
        d.withColumn(name,
          col(s"__px_b$i") + coalesce(sum(e).over(wCell), lit(0L)))
    }
    withSums.drop("__px_cell" +: sums.indices.map(i => s"__px_b$i"): _*)
  }

  /** Adds exclusive-prefix-MAX columns over a total order WITHOUT an
    * unpartitioned window — [[withExclusivePrefix]] with the associative
    * fold swapped from `+` to `max`: per-cell maxima, a cross-cell carry
    * from the triangular metadata join, then a cell-PARTITIONED
    * exclusive running max. For each `(expr, name)` in `maxes` the
    * output gains `name` = MAX expr over all rows STRICTLY before the
    * current one in the global order — NULL (not a sentinel) for the
    * first row, exactly like `max(e) OVER (... ROWS UNBOUNDED PRECEDING
    * TO 1 PRECEDING)`. Same contract: `cell` integer and monotone
    * non-decreasing along `order`, `order` a total order. This is the
    * skyline/frontier primitive (skyline_2d's "best strictly-cheaper
    * size" test).
    */
  def withExclusivePrefixMax(df: DataFrame, cell: Column, order: Seq[Column],
      maxes: Seq[(Column, String)]): DataFrame = {
    require(maxes.nonEmpty,
      "Ranks.withExclusivePrefixMax: maxes must carry at least one (expr, name)")
    require(order.nonEmpty,
      "Ranks.withExclusivePrefixMax: order must be non-empty")
    val tagged = df.withColumn("__pm_cell", cell.cast("bigint"))
    validateMonotoneCells(tagged, "__pm_cell", order, "withExclusivePrefixMax")
    val hist = tagged.groupBy(col("__pm_cell"))
      .agg(max(maxes.head._1).as("__pm_t0"),
        maxes.tail.zipWithIndex.map { case ((e, _), i) =>
          max(e).as(s"__pm_t${i + 1}") }: _*)
    val lower = hist.select(col("__pm_cell").as("__pm_cell_lo") +:
      maxes.indices.map(i => col(s"__pm_t$i").as(s"__pm_lo$i")): _*)
    val bases = hist
      .join(lower, col("__pm_cell_lo") < col("__pm_cell"), "left")
      .groupBy(col("__pm_cell"))
      .agg(max(col("__pm_lo0")).as("__pm_b0"),
        maxes.indices.tail.map(i =>
          max(col(s"__pm_lo$i")).as(s"__pm_b$i")): _*)
    val wCell = Window.partitionBy(col("__pm_cell")).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val joined = tagged.join(graft.Tables.stateHint(bases), Seq("__pm_cell"))
    // greatest() skips NULLs, so carry-NULL (no lower cell) and
    // frame-NULL (first row of its cell) combine exactly like the
    // single-window max over a possibly-empty frame.
    val withMaxes = maxes.zipWithIndex.foldLeft(joined) {
      case (d, ((e, name), i)) =>
        d.withColumn(name, greatest(col(s"__pm_b$i"), max(e).over(wCell)))
    }
    withMaxes.drop("__pm_cell" +: maxes.indices.map(i => s"__pm_b$i"): _*)
  }

  /** Shared span-probe bucketing behind the `withBucketed*` forms: tags
    * the BIGINT value, probes its broadcastable [min, max] span over
    * `df` itself, and derives the range-bucket cell — inverted for
    * descending orders so the cell stays monotone ALONG the order. The
    * monotonicity-critical formula lives HERE, once, instead of being
    * re-spelled at every call site (where a hand-copied desc inversion
    * or an off-by-one denominator would silently mis-rank).
    */
  private def spanBucketed(df: DataFrame, value: Column, ascending: Boolean,
      buckets: Int): (DataFrame, Column, Seq[Column]) = {
    require(buckets > 0, s"Ranks: buckets must be positive, got $buckets")
    val tagged0 = df.withColumn("__sb_v", value.cast("bigint"))
    val span = tagged0.agg(min(col("__sb_v")).as("__sb_lo"),
      max(col("__sb_v")).as("__sb_hi"))
    val tagged = tagged0.crossJoin(broadcast(span))
    val cell =
      if (ascending)
        expr(s"((__sb_v - __sb_lo) * $buckets) div (__sb_hi - __sb_lo + 1)")
      else
        expr(s"((__sb_hi - __sb_v) * $buckets) div (__sb_hi - __sb_lo + 1)")
    (tagged,
      cell,
      Seq(if (ascending) col("__sb_v").asc else col("__sb_v").desc))
  }

  private val SpanCols = Seq("__sb_v", "__sb_lo", "__sb_hi")

  /** [[withExclusivePrefix]] over an integer `value` whose distinct
    * support spans an arbitrary range (spend cents, price cells, score
    * cells): cells come from `buckets` equal range slices of the
    * broadcast [min, max] span, ordered by `value` alone (callers pass
    * frames where `value` is distinct per row — a histogram key).
    * `ascending = false` runs the prefix best-first down the value
    * order (curriculum bases).
    */
  def withBucketedExclusivePrefix(df: DataFrame, value: Column,
      ascending: Boolean, buckets: Int,
      sums: Seq[(Column, String)]): DataFrame = {
    val (tagged, cell, order) = spanBucketed(df, value, ascending, buckets)
    withExclusivePrefix(tagged, cell, order, sums).drop(SpanCols: _*)
  }

  /** [[withExclusivePrefixMax]] with the same span-bucketed cells. */
  def withBucketedExclusivePrefixMax(df: DataFrame, value: Column,
      ascending: Boolean, buckets: Int,
      maxes: Seq[(Column, String)]): DataFrame = {
    val (tagged, cell, order) = spanBucketed(df, value, ascending, buckets)
    withExclusivePrefixMax(tagged, cell, order, maxes).drop(SpanCols: _*)
  }

  /** Debug-mode contract check (opt-in: `spark.graft.validateRankCells`
    * = true): the helpers silently produce wrong answers if the
    * caller's cell is NOT monotone along the order, so under the conf
    * each call eagerly verifies that adjacent cells' order-key ranges
    * do not overlap (pairwise-adjacent suffices by transitivity of
    * `max(cell i) ≤ min(cell i+1)`). The metadata frame here is the
    * bounded cell histogram, so the debug window is dimension-scale;
    * mixed-direction orders are skipped (no current call site uses
    * one). Costs one extra aggregate per call — debug only.
    */
  private def validateMonotoneCells(tagged: DataFrame, cellCol: String,
      order: Seq[Column], helper: String): Unit = {
    val spark = tagged.sparkSession
    if (!spark.conf.get("spark.graft.validateRankCells", "false").toBoolean) return
    import org.apache.spark.sql.GraftBridge
    import org.apache.spark.sql.catalyst.expressions.{Ascending, SortOrder}
    val sos = order.map(c => GraftBridge.catalystExpression(c) match {
      case s: SortOrder => s
      case e => SortOrder(e, Ascending)
    })
    if (sos.map(_.direction).distinct.size != 1) return
    val key = struct(sos.map(s => GraftBridge.column(s.child)): _*)
    val ranges = tagged.groupBy(col(cellCol))
      .agg(min(key).as("__vr_lo"), max(key).as("__vr_hi"))
    val wAdj = Window.orderBy(col(cellCol).asc)
    val bad =
      if (sos.head.direction == Ascending)
        ranges.withColumn("__vr_prev", lag(col("__vr_hi"), 1).over(wAdj))
          .filter(col("__vr_prev").isNotNull && col("__vr_prev") > col("__vr_lo"))
      else
        ranges.withColumn("__vr_prev", lag(col("__vr_lo"), 1).over(wAdj))
          .filter(col("__vr_prev").isNotNull && col("__vr_prev") < col("__vr_hi"))
    val n = bad.count()
    require(n == 0, s"Ranks.$helper: cell is not monotone along the order — " +
      s"$n adjacent cell pair(s) have overlapping order-key ranges; " +
      "ranks/prefixes computed from this cell would be wrong")
  }

  /** Adds BIGINT column `out` = exact `NTILE(k) OVER (ORDER BY ...)`
    * reconstructed ARITHMETICALLY from an exact global rank (`rankCol`,
    * 1-based, from [[withGlobalRank]]) and the total row count
    * (`totalCol`, broadcast onto every row): with base = n div k and
    * rem = n mod k, SQL NTILE gives the first `rem` tiles base+1 rows
    * and the rest base — a pure integer formula both engines agree on,
    * including the n < k edge (base = 0 ⇒ every row its own tile; the
    * base-0 division sits in the untaken CASE branch).
    */
  def withNtile(df: DataFrame, out: String, rankCol: String,
      totalCol: String, k: Long): DataFrame =
    df.withColumn(out, expr(
      s"""CASE WHEN $rankCol <= ($totalCol % $k) * ($totalCol div $k + 1)
         THEN ($rankCol - 1) div ($totalCol div $k + 1) + 1
         ELSE ($totalCol % $k)
           + ($rankCol - ($totalCol % $k) * ($totalCol div $k + 1) - 1)
             div ($totalCol div $k) + 1 END"""))
}
