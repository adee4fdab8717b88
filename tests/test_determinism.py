"""Partitioning-determinism audit: a query's result must not depend on
how the data was shuffled. This is the failure mode behind the q9
cent-rounding bug (double sums accumulate in partition order; the last
ulp flips round(x, 2)) — any query that survives a 3-vs-32-partition
comparison is also stable against the driver's own partitioning and,
at scale, against AQE re-planning.

Queries chosen for sensitivity: big float sums (q1/q9), rounded-equality
selection (q15), correlated averages (q17), log-space averaging (LM
score), windowed prefix sums (concurrency sweep).
"""

import pytest

SF = "/root/testdata/sf0.001"

SENSITIVE = [
    "tpch_q1_style_full",
    "tpch_q2_style_min_cost_supplier",  # rounded-equality selection
    "tpch_q8_style_market_share",  # ratio of two big sums
    "tpch_q9_style_product_profit",
    "tpch_q15_style_top_supplier",
    "tpch_q17_style_small_qty_revenue",
    "llm_ngram_lm_score",
    "llm_text_tfidf",  # log-weighted scores
    "ts_resample_ohlc",  # min_by/max_by tie behavior
    "ts_concurrency_sweep",
    "agg_stats",  # variance/stddev accumulation
    "subq_recursive_cte",  # per-depth path-bal totals (decimal-summed)
    "udf_apply_in_arrow",  # grouped-map sums rounded outside the UDF
    "agg_trimmed_winsorized",  # quantile cuts + decimal sums
    "llm_perplexity_buckets",  # percentile cutpoints over log-averages
    "ts_interpolate_linear",  # floor-integer interpolation
    # round-5 analytics (decimal/bigint-exact by design — prove it):
    "ts_twap",  # decimal weighted sums / exact total division
    "stats_chi_square",  # decimal-cast per-cell terms
    "agg_gini_concentration",  # rank-weighted decimal sums
    "graph_pagerank",  # integer-scaled ranks, bigint contribution sums
    "ts_changepoint_split",  # argmax over rounded split statistic
    "llm_token_entropy",  # decimal-cast c*ln(c) term sums
    # round-12 ops (integerized / exact-moment designs — prove the
    # order-free claims their docstrings make):
    "ts_ljung_box",  # integerized cumulative Q terms
    "ts_periodogram",  # snapped-trig DECIMAL product sums
    "ts_hurst_exponent",  # integer cumdev numerators + snapped R/S
    "stats_permutation_test",  # md5 uniforms must survive repartitioning
    "stats_roc_auc",  # domain-table prefix sums
    "stats_calibration_brier",  # 1e-9-integerized decomposition terms
    "stats_friedman_test",  # doubled-unit rank algebra
    "llm_heaps_law_fit",  # integerized log-log OLS
    "llm_ngram_kneser_ney",  # float log-prob averages (stress case)
    "graph_modularity",  # exact bigint Q numerators
    # round-13 ops (the order-free claims their docstrings make):
    "stats_cmh_test",  # 1e-9-snapped per-stratum rationals
    "stats_jonckheere_terpstra",  # DECIMAL prefix-sum U terms + 2^20 ties
    "ts_spectral_coherence",  # snapped-trig DECIMAL cross-spectra
    "ts_page_hinkley",  # cumulative-window doubles (ordered precedent)
    "llm_selfbleu_diversity",  # 1e-9-snapped per-pair precisions
    "stats_sign_test",  # spine/tail ordered-window accumulation
    "stats_xi_correlation",  # integer rank windows + tie-broken walk
    "llm_mixture_weights",  # snapped-sqrt normalizer (r13 hardening)
    "llm_watermark_detect",  # md5 green bits + 1e-6-snapped mean z
    "stats_kaplan_meier",  # ordered log-space survival product
    "stats_logrank_test",  # 1e-9-snapped per-time O-E/V sums
    "stats_cochran_q",  # exact discrete medians + integer Q algebra
    # round-14 ops (the order-free claims their docstrings make):
    "ts_turning_points",  # exact extremum counts, 1-row double close
    "ts_permutation_entropy",  # decimal-summed c*ln(c) pattern terms
    "ts_kpss_test",  # 2^20-snapped centered series, exact DECIMAL lrv
    "stats_brunner_munzel",  # exact DECIMAL placement moments
    "stats_cvm_two_sample",  # exact integer ECDF-gap numerators
    "stats_ansari_bradley",  # exact doubled-score permutation moments
    "stats_mood_median",  # 1e-9-snapped per-group 2xk terms
    "stats_bartlett_test",  # unit/1e-9/1e-12-snapped cross-group sums
    "stats_poisson_dispersion",  # exact integer D ratio per type
    "ts_adf_augmented",  # exact DECIMAL 9-moment Cramer solve
    "ts_spectral_entropy",  # snapped-trig bins, max-normalized integers
    "graph_local_clustering",  # 1e-9-snapped c_i, integer buckets
    "stats_theil_inequality",  # decimal-summed x*ln(x), 1e-12 snaps
    "ts_cusum_squares",  # exact DECIMAL squares, double bridge max
    # round-14 waves 6-8:
    "stats_durbin_watson",  # 2^40-snapped scaled residuals
    "stats_breusch_pagan",  # re-snapped squared residuals, exact aux moments
    "ts_hjorth_parameters",  # exact DECIMAL variance moments
    "ts_higuchi_fd",  # unit-snapped L_m, integerized log-log OLS
    "ts_dfa",  # exact bigint profile, 2^40-snapped per-box SSR
    "stats_quade_test",  # doubled-rank integer algebra
    "stats_ad_two_sample",  # 1e-12-snapped per-value terms, harmonic bigints
    "ts_haar_energy",  # exact bigint details, fixed-order 6-term total
    "stats_hotelling_t2",  # exact DECIMAL 5-moment pooled covariance
    "stats_energy_distance",  # exact integer prefix |diff| sums
    "stats_mahalanobis_outliers",  # exact moments + double quadratic form
    "stats_distance_correlation",  # exact bigint double-centering
    "stats_lepage_test",  # doubled midranks + Hajek score moments
    "ts_var_stability",  # exact DECIMAL cross moments, Cramer solve
    "stats_pca_closed_form",  # exact moments, closed-form eigenpair
    "ts_bds_test",  # exact integer pair/triple counts, snapped eps
    "stats_cucconi_test",  # doubled-midrank exact squared-rank sums
]


def _rows(spark, name: str, partitions: str):
    from unittest.mock import patch

    from spark_lineage_spark import session as S
    from spark_lineage_spark.registry import load_all

    # The override must govern BOTH build time and action time: some
    # builders execute their float-sensitive aggregate eagerly at build
    # (localCheckpoint in tpch_q2/q15), and the registry wrapper's
    # tune_runtime re-applies RUNTIME_CONFS before the builder body
    # runs — so patch the default itself for the duration (ADVICE r4;
    # previously the 3-vs-32 comparison never reached the checkpointed
    # aggregation).
    patched = dict(S.RUNTIME_CONFS, **{"spark.sql.shuffle.partitions": partitions})
    with patch.dict(S.RUNTIME_CONFS, patched, clear=True):
        spark.conf.set("spark.sql.shuffle.partitions", partitions)
        df = load_all()[name].builder(spark, SF)
        cols = sorted(df.columns)
        return sorted(tuple(str(r[c]) for c in cols) for r in df.collect())


@pytest.mark.parametrize("name", SENSITIVE)
def test_result_stable_across_partitioning(spark, name):
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        few = _rows(spark, name, "3")
        many = _rows(spark, name, "32")
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert few == many, f"{name} result depends on partitioning"


def test_hll_union_matches_direct(spark):
    """Mergeable-sketch consistency: hll_union_agg over the per-segment
    partials must estimate the SAME cardinality as a single direct
    global sketch (DataSketches HLL union is lossless over sketches of
    the same lgK), and land within 5% of the exact distinct count."""
    from pyspark.sql import functions as F

    from spark_lineage_spark.operators.aggregates import agg_hll_two_level
    from spark_lineage_spark.tables import load

    rows = {r.segment: r.est_distinct for r in agg_hll_two_level(spark, SF).collect()}
    c = load(spark, SF, "customer")
    direct = c.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("c_custkey")).alias("e")
    ).collect()[0].e
    exact = c.select("c_custkey").distinct().count()
    assert rows["ALL"] == direct, (rows["ALL"], direct)
    assert abs(rows["ALL"] - exact) / exact < 0.05, (rows["ALL"], exact)
