package graft

import org.apache.spark.sql.functions._

/** Invariants for the lake-management / planner-audit operators —
  * properties the DuckDB oracle can't see (conservation laws, layout
  * dominance, estimate-vs-exact inequalities).
  */
class LakehouseSpec extends SparkSpec {

  test("compaction_plan conserves bytes and files over the inventory") {
    val plan = operators.Lakehouse.compactionPlan(spark, sfDir)
    val li = Tables.lineitem(spark, sfDir)
    val nDays = li.select(to_date(col("l_shipdate"))).distinct().count()
    val nRows = li.count()
    val agg = plan.agg(sum("n_files"), sum("total_bytes")).head()
    assert(agg.getLong(0) == nDays, "every day lands in exactly one group")
    assert(agg.getLong(1) == nRows * 128L, "byte estimate is conserved")
  }

  test("compaction_plan groups are date-contiguous") {
    val rows = operators.Lakehouse.compactionPlan(spark, sfDir)
      .orderBy("out_group").collect()
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[String]("max_day") <= b.getAs[String]("min_day"),
          "consecutive output groups cover disjoint, ordered date ranges")
      case _ =>
    }
  }

  test("file_skipping_audit: sorted layout prunes at least as well") {
    val rows = operators.Lakehouse.fileSkippingAudit(spark, sfDir)
      .collect().map(r => r.getAs[String]("layout") -> r).toMap
    assert(rows.keySet == Set("natural", "shipdate_sorted"))
    rows.values.foreach(r => assert(r.getAs[Long]("n_files") == 64L))
    assert(rows("shipdate_sorted").getAs[Long]("prune_pct")
      >= rows("natural").getAs[Long]("prune_pct"))
    assert(rows("shipdate_sorted").getAs[Long]("rows_scanned")
      <= rows("natural").getAs[Long]("rows_scanned"))
  }

  test("shard_plan covers the corpus with shards in [0, 16)") {
    val df = operators.Lakehouse.shardPlan(spark, sfDir)
    val nDocs = Tables.documents(spark, sfDir).count()
    assert(df.agg(sum("n_docs")).head().getLong(0) == nDocs)
    df.collect().foreach { r =>
      val s = r.getAs[Long]("shard")
      assert(s >= 0L && s < 16L)
    }
  }

  test("mv_delta_merge: merged state reproduces the full recompute") {
    val rows = operators.Lakehouse.mvDeltaMerge(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("matches_full"),
        s"merge algebra must equal recompute for ${r.getAs[String]("priority")}")
      assert(r.getAs[Long]("cnt_merged")
        == r.getAs[Long]("cnt_base") + r.getAs[Long]("cnt_delta"))
    }
  }

  test("col_stats_histogram: bins partition each column in value order") {
    val rows = operators.Lakehouse.colStatsHistogram(spark, sfDir).collect()
    val byCol = rows.groupBy(_.getAs[String]("col_name"))
    assert(byCol.keySet ==
      Set("l_quantity", "l_extendedprice", "l_discount"))
    val n = Tables.lineitem(spark, sfDir).count()
    byCol.values.foreach { bins =>
      assert(bins.map(_.getAs[Long]("n_rows")).sum == n,
        "equi-depth bins cover every row exactly once")
      val ordered = bins.sortBy(_.getAs[Long]("bin"))
      ordered.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Double]("hi") <= b.getAs[Double]("lo"),
            "bin value ranges are non-overlapping and ascending")
        case _ =>
      }
    }
  }

  test("bloom_skipping_audit: bloom admits a superset of exact members") {
    val rows = operators.Lakehouse.bloomSkippingAudit(spark, sfDir).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_files") == 64L)
      val (exact, bloom) =
        (r.getAs[Long]("files_exact"), r.getAs[Long]("files_bloom"))
      assert(exact <= bloom, "a bloom can never miss a true member")
      assert(r.getAs[Long]("fp_files") == bloom - exact)
      assert(r.getAs[Long]("skip_pct") == (64L - bloom) * 100L / 64L)
    }
  }

  test("compression_estimate: run counts bounded by NDV below, rows above") {
    val rows = operators.Lakehouse.compressionEstimate(spark, sfDir).collect()
    assert(rows.length == 4)
    val n = Tables.lineitem(spark, sfDir).count()
    rows.foreach { r =>
      val (ndv, runs) = (r.getAs[Long]("ndv"), r.getAs[Long]("runs"))
      assert(r.getAs[Long]("n_rows") == n)
      assert(runs >= ndv, "every distinct value starts at least one run")
      assert(runs <= n)
      assert(r.getAs[Long]("sort_gain_x") == runs / ndv)
    }
    val byCol = rows.map(r => r.getAs[String]("col_name") -> r).toMap
    // a 3-value flag scattered by insert order is the rewrite's win
    assert(byCol("l_returnflag").getAs[Long]("sort_gain_x")
      > byCol("l_partkey").getAs[Long]("sort_gain_x"))
  }

  test("join_cardinality_est: FK join estimate is exact, skew underestimates") {
    val rows = operators.Lakehouse.joinCardinalityEst(spark, sfDir)
      .collect().map(r => r.getAs[String]("join_name") -> r).toMap
    // lineitem⋈orders is a foreign-key join with full ndv on the PK side:
    // the textbook formula collapses to |lineitem| — exact by construction.
    val fk = rows("lineitem*orders/orderkey")
    assert(fk.getAs[Long]("err_ppm") == 0L)
    assert(fk.getAs[Long]("actual_rows")
      == Tables.lineitem(spark, sfDir).count())
    // Cauchy-Schwarz: Σc² ≥ (Σc)²/ndv — a skewed self-join's true output
    // is never below the uniform estimate.
    val self = rows("events*events/user_id")
    assert(self.getAs[Long]("actual_rows") >= self.getAs[Long]("est_rows"))
  }

  test("hilbert_layout: both curves scan the same matches, profiles are sane") {
    val rows = operators.Lakehouse.hilbertLayout(spark, sfDir).collect()
    assert(rows.map(_.getAs[String]("layout")).toSet == Set("morton", "hilbert"))
    val matched = rows.map(_.getAs[Long]("n_matched")).distinct
    assert(matched.length == 1, "the predicate matches the same rows in any layout")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_files") == 64)
      assert(r.getAs[Long]("files_hit") <= 64)
      assert(r.getAs[Long]("rows_scanned") >= r.getAs[Long]("n_matched"))
      val loc = r.getAs[Long]("locality_ppm")
      assert(loc >= 0 && loc <= 1000000L)
    }
  }
}
