"""Property tests for the df.stat battery (SURVEY §2.4, VERDICT r7
item 4): the approximate modes that the oracle-checked queries can't
pin down exactly.

- approxQuantile with relativeError e must return a value whose rank
  is within e*n of the target rank (the GK-sketch contract).
- freqItems(support s) must return a SUPERSET of the items with
  frequency > s*n (one-sided guarantee; extra candidates allowed).
- df.stat.cov / corr must agree with the exact decimal-sum
  computation to ~1e-9 relative (the double co-moment pass is
  order-dependent only at ulp level).
"""

from decimal import Decimal

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def lineitem(spark, sf_dir):
    from spark_lineage_spark.tables import load

    df = load(spark, sf_dir, "lineitem").cache()
    yield df
    # MUST unpersist: Spark substitutes the cached InMemoryRelation
    # into any later plan with an identical scan subtree, which breaks
    # other test modules' PushedFilters/ReadSchema plan assertions
    df.unpersist()


def test_approx_quantile_rank_bound(lineitem):
    n = lineitem.count()
    eps = 0.05
    for p in (0.1, 0.5, 0.9):
        (approx,) = lineitem.stat.approxQuantile("l_extendedprice", [p], eps)
        # rank of the returned value among the sorted data
        rank_lo = lineitem.filter(F.col("l_extendedprice") < approx).count()
        rank_hi = lineitem.filter(F.col("l_extendedprice") <= approx).count()
        target = p * n
        slack = eps * n + 1
        assert rank_lo - slack <= target <= rank_hi + slack, (
            p,
            approx,
            rank_lo,
            rank_hi,
        )


def test_exact_quantile_convention_matches_duckdb(spark):
    """Pin the EXACT-rank convention (ADVICE r8): Spark's
    approxQuantile(col, [p], 0.0) and DuckDB's quantile_disc must pick
    the SAME order statistic on duplicate-free data — stat_df_battery's
    oracle equates them, and heavy duplication in l_quantity must not
    be the only thing masking a convention gap. Probed across odd/even
    n (incl. n % 4 residues, where ceil(p*n) vs floor(p*(n-1))
    conventions would pick adjacent order statistics for p=0.25/0.75):
    both engines land on nearest-rank ceil(p*n), 1-based."""
    import math

    import duckdb

    con = duckdb.connect()
    for n in (4, 5, 6, 7, 9, 10, 11, 12, 101, 102, 103, 104):
        vals = [float(i * 10 + 3) for i in range(1, n + 1)]  # strictly increasing
        df = spark.createDataFrame([(v,) for v in vals], "x double")
        for p in (0.25, 0.5, 0.75):
            (sq,) = df.stat.approxQuantile("x", [p], 0.0)
            (dq,) = con.execute(
                f"SELECT quantile_disc(x, {p}) FROM (SELECT unnest({vals}) AS x)"
            ).fetchone()
            assert sq == dq == vals[math.ceil(p * n) - 1], (n, p, sq, dq)


def test_freq_items_superset(lineitem):
    n = lineitem.count()
    support = 0.1
    freq = set(lineitem.stat.freqItems(["l_returnflag"], support).collect()[0][0])
    truly_heavy = {
        r.l_returnflag
        for r in lineitem.groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") > support * n)
        .collect()
    }
    assert truly_heavy, "fixture should have heavy hitters at 10% support"
    assert truly_heavy <= freq, freq - truly_heavy


def test_cov_corr_match_exact_decimal(lineitem):
    cov = lineitem.stat.cov("l_quantity", "l_extendedprice")
    corr = lineitem.stat.corr("l_quantity", "l_extendedprice")
    row = lineitem.select(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("l_quantity").cast("decimal(30,6)")).alias("sx"),
        F.sum(F.col("l_extendedprice").cast("decimal(30,6)")).alias("sy"),
        F.sum(
            (
                F.col("l_quantity").cast("decimal(30,6)")
                * F.col("l_extendedprice").cast("decimal(30,6)")
            ).cast("decimal(38,6)")
        ).alias("sxy"),
        F.sum(
            (
                F.col("l_quantity").cast("decimal(30,6)")
                * F.col("l_quantity").cast("decimal(30,6)")
            ).cast("decimal(38,6)")
        ).alias("sxx"),
        F.sum(
            (
                F.col("l_extendedprice").cast("decimal(30,6)")
                * F.col("l_extendedprice").cast("decimal(30,6)")
            ).cast("decimal(38,6)")
        ).alias("syy"),
    ).collect()[0]
    n = Decimal(row.n)
    sx, sy, sxy = row.sx, row.sy, row.sxy
    sxx, syy = row.sxx, row.syy
    exact_cov = (sxy - sx * sy / n) / (n - 1)
    assert abs(cov - float(exact_cov)) <= 1e-9 * abs(float(exact_cov))
    exact_corr = float(
        (sxy - sx * sy / n)
        / ((sxx - sx * sx / n) * (syy - sy * sy / n)).sqrt()
    )
    assert abs(corr - exact_corr) <= 1e-9 * max(abs(exact_corr), 1e-12)
