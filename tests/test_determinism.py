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
]


def _rows(spark, name: str, partitions: str):
    from spark_lineage_spark.registry import load_all

    # Build FIRST (the registry wrapper re-applies the engine's default
    # confs, which would silently undo the override), THEN set the
    # partitioning and execute — Spark reads shuffle confs at action
    # time, so the override governs the actual run.
    df = load_all()[name].builder(spark, SF)
    spark.conf.set("spark.sql.shuffle.partitions", partitions)
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
