package graft

import org.apache.spark.sql.functions._

/** Invariant tests for the round-9 graph/event-science additions
  * (HITS, assortativity, modularity; bot detection, DOW seasonality,
  * mergeable quantile sketch). Value-level correctness is the DuckDB
  * oracle gate's job; these pin structural invariants an implementation
  * bug would break even if the oracle were wrong the same way.
  */
class GraphEventExtSpec extends SparkSpec {

  test("hits_authority: sides partition cleanly, scores normalized and ordered") {
    val rows = operators.GraphExt.hitsAuthority(spark, sfDir).collect()
    val (auth, hub) = rows.partition(_.getAs[String]("side") == "authority")
    assert(auth.nonEmpty && hub.nonEmpty)
    assert(rows.forall(r => Set("authority", "hub")(r.getAs[String]("side"))))
    // L1-normalized then top-15: every score in (0, 1]
    rows.foreach { r =>
      val s = r.getAs[Double]("score")
      assert(s > 0 && s <= 1.0, s"score $s out of (0,1]")
    }
    // authorities are suppliers, hubs are customers
    val supps = Tables.supplier(spark, sfDir)
      .select(col("s_suppkey")).collect().map(_.getLong(0)).toSet
    val custs = Tables.customer(spark, sfDir)
      .select(col("c_custkey")).collect().map(_.getLong(0)).toSet
    auth.foreach(r => assert(supps(r.getAs[Long]("node_key"))))
    hub.foreach(r => assert(custs(r.getAs[Long]("node_key"))))
    // descending within side with key tiebreak (total order)
    def sorted(rs: Array[org.apache.spark.sql.Row]) =
      rs.map(r => (-r.getAs[Double]("score"), r.getAs[Long]("node_key")))
    assert(sorted(auth).sameElements(sorted(auth).sorted))
    assert(sorted(hub).sameElements(sorted(hub).sorted))
  }

  test("graph_assortativity: moment identities and coefficient bounds hold") {
    val r = operators.GraphExt.graphAssortativity(spark, sfDir).collect().head
    val m = r.getAs[Long]("m_edges")
    assert(m % 2 == 0, "symmetrized edge list must have even cardinality")
    // Σ_edges deg(src) = Σ_v deg(v)² ≥ m (every degree ≥ 1)
    assert(r.getAs[Long]("sum_x") >= m)
    val a = r.getAs[Double]("assortativity")
    assert(a >= -1.0 - 1e-9 && a <= 1.0 + 1e-9, s"assortativity $a out of [-1,1]")
    assert(r.getAs[Long]("den") >= 0L, "variance denominator cannot be negative")
  }

  test("graph_modularity: partition identities (Σdeg = 2m, Σin ≤ m, Q ≤ 1)") {
    val rows = operators.GraphExt.graphModularity(spark, sfDir).collect()
    val m = rows.head.getAs[Long]("q_den") // 4m²
    val inSum = rows.map(_.getAs[Long]("in_w")).sum
    val degSum = rows.map(_.getAs[Long]("deg_w")).sum
    // recover m from q_den = 4m²
    val mTot = math.sqrt(m.toDouble / 4.0).round
    assert(mTot * mTot * 4 == m, "q_den must be a perfect 4m² square")
    assert(inSum <= mTot, "internal weight cannot exceed total weight")
    assert(degSum == 2 * mTot, "community strengths must sum to 2m")
    val q = rows.map(r => r.getAs[Long]("q_num").toDouble / r.getAs[Long]("q_den")).sum
    assert(q <= 1.0 + 1e-9, s"modularity $q exceeds 1")
    rows.foreach(r => assert(r.getAs[Long]("q_ppm") <= 1000000L))
  }

  test("bot_detect: one row per user, feature ranges and flag implication") {
    val df = operators.EventScience.botDetect(spark, sfDir)
    val rows = df.collect()
    val nUsers = Tables.events(spark, sfDir)
      .select(col("user_id")).distinct().count()
    assert(rows.length.toLong == nUsers)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_events") >= 1)
      assert(r.getAs[Long]("active_minutes") >= 1)
      val t = r.getAs[Long]("n_types"); assert(t >= 1 && t <= 5)
      assert(r.getAs[Long]("gap_cv_ppm") >= -1)
      if (r.getAs[Boolean]("is_bot")) assert(r.getAs[Long]("n_events") >= 20)
      // ≥1 event per active minute by construction
      assert(r.getAs[Long]("events_per_min_ppm") >= 1000000L)
    }
  }

  test("dow_seasonality: shares sum to ~1e6 per type, totals reconcile") {
    val rows = operators.EventScience.dowSeasonality(spark, sfDir).collect()
    rows.foreach { r =>
      val d = r.getAs[Long]("dow"); assert(d >= 0 && d <= 6)
      assert(r.getAs[Long]("seasonal_idx_ppm") ==
        r.getAs[Long]("dow_share_ppm") * 7
        || math.abs(r.getAs[Long]("seasonal_idx_ppm")
          - r.getAs[Long]("dow_share_ppm") * 7) <= 7) // independent floor divs
    }
    val byType = rows.groupBy(_.getAs[String]("event_type"))
    byType.foreach { case (_, rs) =>
      val share = rs.map(_.getAs[Long]("dow_share_ppm")).sum
      assert(share <= 1000000L && share > 1000000L - rs.length,
        s"floor-div shares sum to $share")
    }
    val total = byType.values.flatten.map(_.getAs[Long]("n_events")).sum
    assert(total == Tables.events(spark, sfDir).count())
  }

  test("growth_accounting: flows reconcile with a driver-side user-day recount") {
    val rows = operators.EventScience.growthAccounting(spark, sfDir).collect()
      .map(r => r.getAs[Long]("day_ord") -> r).toMap
    val byUser = Tables.events(spark, sfDir)
      .select(expr("ts div 86400000000000").as("d"), col("user_id")).distinct()
      .collect().map(r => (r.getLong(1), r.getLong(0)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val allDays = byUser.values.flatten.toSet
    val (d0, d1) = (allDays.min, allDays.max)
    assert(rows.keySet == (d0 to d1).toSet, "complete calendar spine")
    (d0 to d1).foreach { d =>
      val r = rows(d)
      val active = byUser.filter(_._2.contains(d)).keySet
      val newU = active.filter(u => byUser(u).min == d)
      val retained = active.filter(u => byUser(u).contains(d - 1))
      val resurrected = active -- newU -- retained
      val churned =
        if (d == d0) Set.empty[Long]
        else byUser.filter(_._2.contains(d - 1)).keySet.filterNot(active.contains)
      assert(r.getAs[Long]("n_active") == active.size.toLong, s"active at $d")
      assert(r.getAs[Long]("n_new") == newU.size.toLong, s"new at $d")
      assert(r.getAs[Long]("n_retained") == retained.size.toLong)
      assert(r.getAs[Long]("n_resurrected") == resurrected.size.toLong)
      assert(r.getAs[Long]("n_churned") == churned.size.toLong, s"churned at $d")
      // ledger identities
      assert(r.getAs[Long]("n_active") == r.getAs[Long]("n_new")
        + r.getAs[Long]("n_retained") + r.getAs[Long]("n_resurrected"))
      if (d > d0)
        assert(r.getAs[Long]("n_retained") + r.getAs[Long]("n_churned") ==
          rows(d - 1).getAs[Long]("n_active"))
    }
  }

  test("seasonal_decompose: grid complete, trend/seasonal/residual reconcile") {
    val rows = operators.EventScience.seasonalDecompose(spark, sfDir).collect()
      .sortBy(_.getAs[Long]("day_ord"))
    // complete calendar grid: consecutive day ordinals, counts reconcile
    val days = rows.map(_.getAs[Long]("day_ord"))
    assert(days.zip(days.tail).forall { case (a, b) => b == a + 1 })
    assert(rows.map(_.getAs[Long]("n_events")).sum ==
      Tables.events(spark, sfDir).count())
    val n = rows.map(r => r.getAs[Long]("day_ord") -> r.getAs[Long]("n_events")).toMap
    rows.foreach { r =>
      val d = r.getAs[Long]("day_ord")
      assert(r.getAs[Long]("dow") == (d + 4) % 7)
      val edge = d - days.head < 3 || days.last - d < 3
      if (edge) assert(r.isNullAt(r.fieldIndex("trend_x7")), s"edge day $d")
      else {
        // trend is the exact 7-day sum around d
        val want = (-3 to 3).map(o => n(d + o)).sum
        assert(r.getAs[Long]("trend_x7") == want)
        // decomposition identity in x7e6 units: 7e6*n = 1e6*trend + seasonal + resid
        assert(7000000L * r.getAs[Long]("n_events") ==
          1000000L * r.getAs[Long]("trend_x7") +
            r.getAs[Long]("seasonal_x7e6") + r.getAs[Long]("resid_x7e6"))
      }
    }
    // per-dow seasonal: the mean interior residual-free detrended value,
    // and interior residuals per dow sum to ~0 (floor-div bias < cnt)
    rows.filter(!_.isNullAt(rows.head.fieldIndex("trend_x7")))
      .groupBy(_.getAs[Long]("dow")).foreach { case (_, rs) =>
        // Σresid = (Σdet·1e6) mod cnt — the exact floor-division remainder
        val residSum = rs.map(_.getAs[Long]("resid_x7e6")).sum
        assert(residSum >= 0 && residSum < rs.length.toLong,
          s"interior residuals should cancel per dow, got $residSum")
      }
  }

  test("seasonal_anomaly: MAD z-scores match a driver-side median recount") {
    val rows = operators.EventScience.seasonalAnomaly(spark, sfDir).collect()
      .map(r => r.getAs[Long]("day_ord") -> r).toMap
    val interior = operators.EventScience.seasonalDecompose(spark, sfDir)
      .filter(col("resid_x7e6").isNotNull)
      .select(col("day_ord"), col("resid_x7e6")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.keySet == interior.map(_._1).toSet)
    def lowerMedian(xs: Seq[Long]): Long = {
      val s = xs.sorted
      s((s.length + 1) / 2 - 1)
    }
    val med = lowerMedian(interior.map(_._2))
    val devs = interior.map { case (d, r) => (d, math.abs(r - med)) }
    val mad = lowerMedian(devs.map(_._2))
    assert(mad > 0, "constant-residual series would make this test vacuous")
    var flagged = 0
    devs.foreach { case (d, dev) =>
      val r = rows(d)
      assert(r.getAs[Long]("abs_dev_x7e6") == dev)
      val z = dev * 10000L / mad
      assert(r.getAs[Long]("z_x1e4") == z, s"z at day $d")
      assert(r.getAs[Long]("anomaly") == (if (z > 25000L) 1L else 0L))
      if (z > 25000L) flagged += 1
    }
    assert(flagged > 0, "no anomalies at this SF — vacuous flag column")
  }

  test("kcenter_coreset: 8 distinct centers, non-increasing cover radius") {
    val rows = operators.Coreset.kcenterCoreset(spark, sfDir).collect()
      .sortBy(_.getAs[Long]("sel_round"))
    assert(rows.map(_.getAs[Long]("sel_round")).sameElements(0L to 7L))
    val ids = rows.map(_.getAs[Long]("vec_id"))
    assert(ids.distinct.length == 8, "centers must be distinct")
    assert(rows.head.getAs[Double]("d2") == -1.0, "seed reports the -1 sentinel")
    val dists = rows.tail.map(_.getAs[Double]("d2"))
    dists.foreach(d => assert(d >= 0.0))
    dists.sliding(2).foreach { case Array(a, b) =>
      assert(b <= a + 1e-9, "greedy k-center radius must be non-increasing")
    }
  }

  test("behavior_gini: exact impurity bounds per user") {
    val rows = operators.EventScience.behaviorGini(spark, sfDir).collect()
    val nUsers = Tables.events(spark, sfDir)
      .select(col("user_id")).distinct().count()
    assert(rows.length.toLong == nUsers)
    rows.foreach { r =>
      val g = r.getAs[Long]("gini_ppm"); val t = r.getAs[Long]("n_types")
      assert(g >= 0 && g < 1000000L)
      // impurity is maximized by the uniform mix: g ≤ (t−1)/t
      assert(g <= (t - 1) * 1000000L / t,
        s"gini $g exceeds the $t-type maximum")
      if (t == 1) assert(g == 0L)
    }
  }

  test("drift_tvd: halves partition the events, TVD and worst-bin bounds") {
    val rows = operators.EventScience.driftTvd(spark, sfDir).collect()
    val total = Tables.events(spark, sfDir).count()
    assert(rows.map(r => r.getAs[Long]("n_first") + r.getAs[Long]("n_second")).sum
      == total)
    rows.foreach { r =>
      val tvd = r.getAs[Long]("tvd_ppm")
      assert(tvd >= 0 && tvd <= 1000000L)
      val wb = r.getAs[Long]("worst_bin"); assert(wb >= 0 && wb <= 31)
      // the worst bin's |Δppm| contributes at most 2·TVD (TVD = Σ|Δ|/2)
      assert(r.getAs[Long]("worst_bin_dppm") <= 2 * tvd + 1)
    }
  }

  test("assoc_rules: metric identities on every surviving rule") {
    val rows = operators.GraphExt.assocRules(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 25)
    val lifts = rows.map(_.getAs[Long]("lift_ppm"))
    assert(lifts.sameElements(lifts.sorted.reverse), "rules ranked by lift")
    rows.foreach { r =>
      val co = r.getAs[Long]("cofreq")
      assert(co >= 2)
      assert(co <= math.min(r.getAs[Long]("n_a"), r.getAs[Long]("n_b")),
        "cofreq cannot exceed either item support")
      assert(r.getAs[Long]("conf_a_to_b_ppm") <= 1000000L)
      assert(r.getAs[Long]("conf_b_to_a_ppm") <= 1000000L)
      assert(r.getAs[Long]("support_ppm") <= r.getAs[Long]("conf_a_to_b_ppm"),
        "support ≤ confidence (n_a ≤ N)")
    }
  }

  test("pca_power_iteration: unit pivot, bounded components, near-eigenvector") {
    val rows = operators.Coreset.pcaPowerIteration(spark, sfDir).collect()
    assert(rows.length == 64)
    val v = rows.sortBy(_.getAs[Long]("dim_idx")).map(_.getAs[Double]("component"))
    assert(v.forall(c => math.abs(c) <= 1.0 + 1e-9))
    assert(v.count(c => c == 1.0) >= 1, "the pivot component must be exactly +1")
    assert(rows.head.getAs[Double]("lambda_est") > 0, "Gram is PSD")
    // convergence: v is (approximately) a fixed point of the Gram map —
    // recompute G·v independently and compare directions
    val embs = Tables.embeddings(spark, sfDir)
      .select(col("embedding")).collect()
      .map(_.getAs[scala.collection.Seq[Float]]("embedding").map(_.toDouble).toArray)
    val gv = Array.tabulate(64) { i =>
      embs.map(e => e(i) * e.indices.map(j => e(j) * v(j)).sum).sum
    }
    val piv = gv.map(math.abs).max
    val gvn = gv.map(_ / piv * (if (gv(gv.map(math.abs).indexOf(piv)) < 0) -1 else 1))
    val dot = v.zip(gvn).map { case (a, b) => a * b }.sum
    val na = math.sqrt(v.map(x => x * x).sum)
    val nb = math.sqrt(gvn.map(x => x * x).sum)
    assert(math.abs(dot / (na * nb)) > 0.995,
      s"returned vector is not close to an eigenvector (cos = ${dot / (na * nb)})")
  }

  test("attribution_linear: credit accounting identities per day") {
    val rows = operators.EventScience.attributionLinear(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val purchases = Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase").count()
    assert(rows.map(_.getAs[Long]("n_purchases")).sum == purchases)
    rows.foreach { r =>
      val na = r.getAs[Long]("n_attributed")
      assert(na <= r.getAs[Long]("n_purchases"))
      val credit = r.getAs[Long]("credit_recovered_ppm")
      assert(credit <= na * 1000000L)
      val loss = r.getAs[Long]("floor_loss_ppm")
      assert(loss >= 0 && loss == na * 1000000L - credit)
      assert(r.getAs[Long]("n_clicks_credited") >= 0)
    }
  }

  test("fano_factor: dispersion identity against driver recomputation") {
    val rows = operators.EventScience.fanoFactor(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val daily = Tables.events(spark, sfDir)
      .groupBy(col("event_type"), expr("ts div 86400000000000"))
      .count().collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(2))).toMap
    rows.foreach { r =>
      val xs = daily(r.getAs[String]("event_type"))
      val n = xs.length.toLong; val s = xs.sum; val sx2 = xs.map(x => x * x).sum
      assert(r.getAs[Long]("n_days") == n)
      assert(r.getAs[Long]("n_events") == s)
      assert(r.getAs[Long]("fano_ppm") ==
        ((n * sx2 - s * s) / n) * 1000000L / s)
      assert(r.getAs[Long]("fano_ppm") >= 0)
    }
  }

  test("daily_novelty: every user is new exactly once, shares bounded") {
    val rows = operators.EventScience.dailyNovelty(spark, sfDir).collect()
    val users = Tables.events(spark, sfDir)
      .select(col("user_id")).distinct().count()
    assert(rows.map(_.getAs[Long]("n_new")).sum == users,
      "summed new users must equal the distinct user count")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_new") <= r.getAs[Long]("n_active"))
      assert(r.getAs[Long]("n_active") <= r.getAs[Long]("n_events"))
      assert(r.getAs[Long]("new_share_ppm") <= 1000000L)
    }
    // the earliest observed day is all-new by definition
    val first = rows.minBy(_.getAs[Long]("day_ord"))
    assert(first.getAs[Long]("n_new") == first.getAs[Long]("n_active"))
  }

  test("user_concentration: deciles partition users, shares are non-increasing") {
    val rows = operators.EventScience.userConcentration(spark, sfDir).collect()
      .sortBy(_.getAs[Long]("decile"))
    assert(rows.map(_.getAs[Long]("decile")).sameElements(1L to rows.length))
    val users = Tables.events(spark, sfDir)
      .select(col("user_id")).distinct().count()
    assert(rows.map(_.getAs[Long]("n_users")).sum == users)
    assert(rows.map(_.getAs[Long]("n_events")).sum ==
      Tables.events(spark, sfDir).count())
    val shares = rows.map(_.getAs[Long]("events_share_ppm"))
    shares.sliding(2).foreach { case Array(a, b) =>
      // deciles are ordered most-active first, so event mass decreases
      // (ppm floors can tie adjacent deciles but never invert by >1)
      assert(b <= a + 1, s"decile shares inverted: $a then $b")
    }
  }

  test("stickiness_dau_mau: bitmap MAU equals the exact trailing-window distinct") {
    val rows = operators.EventScience.stickinessDauMau(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val byDay = Tables.events(spark, sfDir)
      .select(expr("ts div 86400000000000").as("d"), col("user_id")).distinct()
      .collect().groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    rows.foreach { r =>
      val d = r.getAs[Long]("day_ord")
      assert(r.getAs[Long]("dau") == byDay(d).size, s"DAU mismatch day $d")
      val mau = (d - 27 to d).flatMap(byDay.get).flatten.toSet.size
      assert(r.getAs[Long]("mau_28d") == mau, s"MAU mismatch day $d")
      val st = r.getAs[Long]("stickiness_ppm")
      assert(st > 0 && st <= 1000000L, "DAU ⊆ MAU ⇒ ratio in (0, 1]")
    }
  }

  test("bounce_rate: session accounting against the registered session stats") {
    val rows = operators.EventScience.bounceRate(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_bounces") <= r.getAs[Long]("n_sessions"))
      assert(r.getAs[Long]("bounce_ppm") <= 1000000L)
    }
    // total sessions reconcile with the canonical sessionize output
    val totalSessions = operators.EventOps.sessionize(spark, sfDir)
      .select(col("user_id"), col("session_id")).distinct().count()
    assert(rows.map(_.getAs[Long]("n_sessions")).sum == totalSessions,
      "bounce rollup must cover every session exactly once")
  }

  test("forecast_backtest: WAPE bounds and scored-day accounting") {
    val rows = operators.EventScience.forecastBacktest(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_days_scored") >= 1)
      assert(r.getAs[Long]("total_actual") > 0)
      // WAPE is nonnegative; a constant series scores 0
      assert(r.getAs[Long]("wape_lag7_ppm") >= 0)
      assert(r.getAs[Long]("wape_lag1_ppm") >= 0)
    }
  }

  test("cohort_ltv: cumulative cents are monotone and end at the cohort total") {
    val rows = operators.EventScience.cohortLtv(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("cohort")).foreach { case (_, rs) =>
      val byAge = rs.sortBy(_.getAs[Long]("age_weeks"))
      val cums = byAge.map(_.getAs[Long]("cum_cents"))
      assert(cums.sameElements(cums.sorted), "cumulative value must be monotone")
      assert(cums.last == byAge.map(_.getAs[Long]("week_cents")).sum)
      byAge.foreach(r => assert(r.getAs[Long]("active_users")
        <= r.getAs[Long]("cohort_users")))
    }
    // cohorts partition users
    val users = Tables.events(spark, sfDir).select(col("user_id")).distinct().count()
    val cohortUsers = rows.groupBy(_.getAs[Long]("cohort"))
      .map(_._2.head.getAs[Long]("cohort_users")).sum
    assert(cohortUsers == users)
  }

  test("dwh_dim_date: contiguous days, calendar identities hold") {
    val rows = operators.Dwh.dimDate(spark, sfDir).collect()
      .sortBy(_.getAs[Long]("epoch_day"))
    val days = rows.map(_.getAs[Long]("epoch_day"))
    assert(days.zip(days.tail).forall { case (a, b) => b == a + 1 },
      "date dim must be gap-free")
    rows.foreach { r =>
      val q = r.getAs[Long]("quarter"); val m = r.getAs[Long]("month")
      assert(q == (m - 1) / 3 + 1)
      assert(r.getAs[Long]("dow") == ((r.getAs[Long]("epoch_day") + 4) % 7))
      val iso = r.getAs[String]("date_iso")
      assert(iso == f"${r.getAs[Long]("year")}%04d-$m%02d-${r.getAs[Long]("day_of_month")}%02d")
    }
    assert(rows.count(_.getAs[Boolean]("is_month_end")) >= rows.length / 31)
  }

  test("bitmap_overlap: popcounts equal exact distinct intersections") {
    val rows = operators.EventScience.bitmapOverlap(spark, sfDir).collect()
    // exact audiences recomputed the naive way
    val aud = Tables.events(spark, sfDir)
      .select(col("event_type"), col("user_id")).distinct().collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val types = aud.keys.toSeq.sorted
    assert(rows.length == types.combinations(2).size,
      "one row per unordered type pair")
    rows.foreach { r =>
      val a = aud(r.getAs[String]("type_a")); val b = aud(r.getAs[String]("type_b"))
      assert(r.getAs[Long]("n_a") == a.size)
      assert(r.getAs[Long]("n_b") == b.size)
      assert(r.getAs[Long]("n_common") == (a intersect b).size,
        "bitmap popcount must equal the exact intersection")
      val j = r.getAs[Long]("jaccard_ppm")
      assert(j == (a intersect b).size.toLong * 1000000L / (a union b).size)
    }
  }

  test("group_kfold: folds partition customers and orders with no group split") {
    val rows = operators.Sampling.groupKfold(spark, sfDir).collect()
    assert(rows.map(_.getAs[Long]("fold")).toSet.subsetOf((0L to 4L).toSet))
    val nOrders = Tables.orders(spark, sfDir).count()
    assert(rows.map(_.getAs[Long]("n_orders")).sum == nOrders)
    // group safety: every customer's orders land in exactly one fold ⇒
    // Σ per-fold distinct customers = global distinct customers
    val nCusts = Tables.orders(spark, sfDir)
      .select(col("o_custkey")).distinct().count()
    assert(rows.map(_.getAs[Long]("n_groups")).sum == nCusts,
      "a customer appearing in two folds would double-count here")
  }

  test("quantile_sketch_merge: monotone quantiles, window dominates the day") {
    val rows = operators.EventScience.quantileSketchMerge(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // daily totals recomputed independently
    val daily = Tables.events(spark, sfDir)
      .groupBy(col("event_type"), expr("ts div 86400000000000").as("day_ord"))
      .agg(count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("day_ord")) ->
        r.getAs[Long]("n")).toMap
    assert(rows.length == daily.size, "one output row per observed type-day")
    rows.foreach { r =>
      val p50 = r.getAs[Long]("p50_bin"); val p95 = r.getAs[Long]("p95_bin")
      assert(p50 >= 0 && p50 <= 31 && p95 >= 0 && p95 <= 31)
      assert(p50 <= p95, "p50 bin must not exceed p95 bin")
      assert(r.getAs[Long]("p50_lo") == p50 * 16)
      val key = (r.getAs[String]("event_type"), r.getAs[Long]("day_ord"))
      // the 7-day merged count is at least the day's own count
      assert(r.getAs[Long]("n_window") >= daily(key))
    }
  }
}
