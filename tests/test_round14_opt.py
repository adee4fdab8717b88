"""Focused equivalence tests for the round-14 OPTIMIZATION rewrites.

Each restructured operator is replayed against its naive (pre-r14)
formulation on the same fixture — the optimization must be a pure
plan-shape change, never a result change. (The DuckDB oracle gate
covers the same ground end-to-end; these pin the equivalence argument
itself, so a future edit that breaks it fails fast in-unit.)
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window, functions as F

from spark_lineage_spark.registry import load_all
from spark_lineage_spark.tables import load

SF = "/root/testdata/sf0.001"


def _sorted_rows(df):
    cols = sorted(df.columns)
    return [tuple(str(r[c]) for c in cols) for r in sorted(df.select(cols).collect())]


@pytest.fixture(scope="module")
def specs():
    return load_all()


def test_win_ranking_matches_naive_windows(spark, specs):
    """Threshold-pruned win_ranking == the naive 4-window QUALIFY form
    (row_number/rank/dense_rank unchanged by the prune; ntile formula
    reproduces ntile(4) including the uneven-bucket remainder rule)."""
    li = load(spark, SF, "lineitem")
    order = [F.desc("l_quantity"), F.col("l_orderkey"), F.col("l_linenumber")]
    w_full = Window.partitionBy("l_returnflag").orderBy(*order)
    w_qty = Window.partitionBy("l_returnflag").orderBy(F.desc("l_quantity"))
    naive = (
        li.select(
            "l_orderkey",
            "l_linenumber",
            F.row_number().over(w_full).alias("rn"),
            F.rank().over(w_qty).alias("rnk"),
            F.dense_rank().over(w_qty).alias("drnk"),
            F.ntile(4).over(w_full).alias("quartile"),
        )
        .filter(F.col("rn") <= 500)
    )
    opt = specs["win_ranking"].builder(spark, SF)
    assert _sorted_rows(opt) == _sorted_rows(naive)


def test_ntile_formula_uneven_buckets(spark):
    """The integer ntile(4) derivation handles n % 4 != 0 exactly —
    pinned on a grid of partition sizes including n < 4."""
    rows = [(g, i) for g, n in [("a", 1), ("b", 3), ("c", 4), ("d", 7), ("e", 10), ("f", 1001)] for i in range(1, n + 1)]
    df = spark.createDataFrame(rows, "g string, rn int")
    cnt = df.groupBy("g").agg(F.count("*").alias("_n"))
    j = df.join(cnt, "g")
    fat = F.expr("(_n % 4) * ((_n DIV 4) + 1)")
    ceil_fat = F.expr("(rn + (_n DIV 4)) DIV ((_n DIV 4) + 1)")
    ceil_thin = F.expr(
        "(_n % 4) + (rn - (_n % 4) * ((_n DIV 4) + 1) + (_n DIV 4) - 1) DIV (_n DIV 4)"
    )
    formula = j.select(
        "g", "rn",
        F.when(F.col("rn") <= fat, ceil_fat).otherwise(ceil_thin).cast("int").alias("q"),
    )
    w = Window.partitionBy("g").orderBy("rn")
    reference = df.select("g", "rn", F.ntile(4).over(w).alias("q"))
    assert _sorted_rows(formula) == _sorted_rows(reference)


def test_agg_count_distinct_matches_single_agg(spark, specs):
    li = load(spark, SF, "lineitem")
    naive = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.count("*").alias("n_rows"),
    )
    opt = specs["agg_count_distinct"].builder(spark, SF)
    assert _sorted_rows(opt) == _sorted_rows(naive)


def test_fingerprint_matches_window_form(spark, specs):
    from spark_lineage_spark.functions.text_funcs import tokens
    from spark_lineage_spark.operators.text import FP_K

    d = load(spark, SF, "documents")
    tok = (
        d.select("doc_id", F.explode(tokens(F.col("text"))).alias("t"))
        .filter(F.length("t") > 0)
        .distinct()
        .select("doc_id", F.md5(F.col("t").cast("binary")).alias("th"))
    )
    w = Window.partitionBy("doc_id").orderBy("th")
    naive = (
        tok.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= FP_K)
        .groupBy("doc_id")
        .agg(
            F.md5(
                F.array_join(F.sort_array(F.collect_list("th")), "").cast("binary")
            ).alias("fingerprint")
        )
    )
    opt = specs["llm_text_fingerprint"].builder(spark, SF)
    assert _sorted_rows(opt) == _sorted_rows(naive)


def test_verify_exact_jaccard_matches_pair_join(spark):
    """Map-side array_intersect verify == the pair-join+agg form it
    replaced, on the session-staged index + LSH candidates."""
    from spark_lineage_spark.operators.dedup import (
        JACCARD_THRESHOLD,
        _minhash_lsh_pairs,
        _shingle_index,
    )

    sh = _shingle_index(spark, SF)
    opt = _minhash_lsh_pairs(sh)
    # naive reference verify over the same candidate universe: exact
    # jaccard via the pair join on the full index, filtered to pairs
    # the optimized path emitted OR any pair >= threshold (recall is
    # asserted by comparing against the full exact pair set)
    a, b = sh.alias("a"), sh.alias("b")
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    common = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("da"), F.col("b.doc_id").alias("db"))
        .agg(F.count("*").alias("c"))
    )
    exact = (
        common.join(sizes.alias("sa"), F.col("da") == F.col("sa.doc_id"))
        .join(sizes.alias("sb"), F.col("db") == F.col("sb.doc_id"))
        .withColumn("jr", F.col("c") / (F.col("sa.n") + F.col("sb.n") - F.col("c")))
        .filter(F.col("jr") >= JACCARD_THRESHOLD)
        .select("da", "db", F.round("jr", 6).alias("jaccard"))
    )
    assert _sorted_rows(opt) == _sorted_rows(exact)


def test_mad_lazy_checkpoint_matches_eager(spark, specs):
    """Lazy vs eager checkpoint forms of agg_median_abs_deviation
    produce identical rows (the checkpoint is a barrier, never a
    semantic change)."""
    import spark_lineage_spark.plans.extract as ex

    opt = _sorted_rows(specs["agg_median_abs_deviation"].builder(spark, SF))
    orig = ex.lineage_checkpoint
    ex.lineage_checkpoint = lambda df, eager=True: orig(df, True)
    try:
        eager_rows = _sorted_rows(
            specs["agg_median_abs_deviation"].builder(spark, SF)
        )
    finally:
        ex.lineage_checkpoint = orig
    assert opt == eager_rows
