package graft

import org.apache.spark.sql.DataFrame

/** Partitioning-invariance proofs: the repo's FP/hash discipline claims
  * bit-reproducible results "at any partitioning" all over its
  * Scaladoc — integer-exact folds, hash-gated sampling, fixed-order
  * float expressions, no cross-row double sums. This spec TESTS the
  * claim instead of asserting it: each listed operator is built and
  * collected under two different shuffle widths (4 — the suite
  * default — and 13, which moves every hash-partition boundary and
  * with it aggregation merge order, join sides' arrival order, and
  * task scheduling), and the full row multisets must match EXACTLY —
  * doubles included, via each row's shortest-round-trip rendering, so
  * a 1-ulp drift fails. An operator whose result depended on partition
  * fold order (a naive float SUM, a first()-style pick, an
  * accumulation in arrival order) passes the DuckDB oracle only by
  * luck of one fixed plan; it fails here the moment the plan width
  * changes — which is exactly what a 1000-executor deployment does.
  *
  * Coverage is REGISTRY-WIDE (every SparkEntry.queries key, at
  * sf0.001 so the two-width sweep stays cheap): r12 proved the 52
  * operators whose construction leans hardest on the discipline; the
  * remaining operators relied on it holding by construction, which is
  * exactly the kind of claim this suite exists to replace with a
  * test. The historical 52 are kept below as documentation of the
  * leaned-on classes; `ops` itself is the full registry. The
  * order-free allowlist is EMPTY: results are collected as a sorted
  * row multiset, so output order never matters and every operator —
  * including samplers and sketches — must produce the identical
  * multiset at any shuffle width. An operator that cannot is a
  * cluster-portability bug, not an allowlist candidate.
  */
class DeterminismSpec extends SparkSpec {

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private val ops = SparkEntry.queries.keys.toSeq.sorted

  /** r12's curated high-lean classes, kept as documentation (all are
    * members of the registry-wide `ops` above).
    */
  private val leanedOnClasses = Seq(
    // hash-gated sampling / mixing (a rate or bucket derived per row)
    "sample_temperature", "mix_rebalance", "dataset_split",
    "sample_stratified", "token_budget_plan",
    // integer-cell rank machinery (two-level folds must equal the
    // single-window oracle under ANY cell-to-partition placement)
    "gini_concentration", "ks_statistic", "skyline_2d",
    "curriculum_order", "sequence_pack", "user_concentration",
    "kendall_tau_b", "kruskal_wallis",
    // float-expression scorers with fixed-order folds
    "bm25_topk", "ndcg_eval", "quality_score", "ewma_smooth",
    "filter_agreement_kappa", "retrieval_eval_pk",
    "decontaminate_semantic", "cochran_armitage", "mann_kendall",
    "welch_ttest", "anova_oneway", "ols_trend", "map_eval",
    "seasonal_decompose", "qq_compare", "chi2_residuals",
    "class_separability", "mix_quality_frontier", "growth_accounting",
    "seasonal_anomaly", "shipping_lag_percentiles", "market_hhi",
    // candidate generation (the pair SET must not depend on which
    // partition saw a band first)
    "dedup_minhash_lsh", "dedup_simhash", "winnow_fingerprint",
    "multimodal_phash",
    // iterative broadcast-state folds (per-round aggregates must
    // commute) and mergeable sketches
    "pagerank", "quantile_sketch_merge", "hll_window_merge",
    "heavy_hitters", "cluster_label_purity", "cluster_outliers",
    "ann_nprobe_sweep", "bootstrap_mean_ci", "ngram_novelty",
    // collect_list order is only pinned by the sort_array treatment —
    // exactly the class a shuffle-width change would expose
    "holt_forecast", "holt_by_type", "content_chunk_dedup",
    "centroid_confusion")

  test("the documented leaned-on classes are all registry members") {
    val missing = leanedOnClasses.filterNot(SparkEntry.queries.contains)
    assert(missing.isEmpty, s"stale documentation entries: $missing")
  }

  ops.foreach { name =>
    test(s"$name is bit-identical across shuffle widths (4 vs 13)") {
      val q = SparkEntry.queries(name)
      val at4 = rows(q(spark, sfDir))
      spark.conf.set("spark.sql.shuffle.partitions", "13")
      try {
        val at13 = rows(q(spark, sfDir))
        assert(at4 == at13,
          s"$name drifted across shuffle widths: " +
            s"${at4.diff(at13).take(3)} vs ${at13.diff(at4).take(3)}")
      } finally spark.conf.set("spark.sql.shuffle.partitions", "4")
    }
  }
}
