"""Semantics tests for the round-5 analytics additions: robust
aggregates, the KMV sketch, Markov transitions, linear interpolation,
perplexity bucketing, co-occurrence mining. Each is cross-checked
against an independent pandas/numpy computation on the smallest
fixture (the DuckDB oracle already covers engine parity; these pin the
MATH, so a same-bug-both-sides mistake cannot hide).
"""

import math

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def test_kmv_estimate_close_to_truth(spark):
    from spark_lineage_spark.operators.aggregates import agg_distinct_kmv

    row = agg_distinct_kmv(spark, SF).collect()[0]
    assert row.k_used <= 256
    if row.k_used == 256:
        # KMV std error ~ 1/sqrt(k-2) ~ 6.3%; allow 4 sigma
        assert abs(row.est_distinct - row.true_distinct) / row.true_distinct < 0.25
    else:
        # fewer distincts than k: the sketch saw everything; the
        # estimator still applies but k tracks the distinct count
        assert row.k_used <= row.true_distinct


def test_trimmed_winsorized_match_numpy(spark):
    from spark_lineage_spark.operators.aggregates import agg_trimmed_winsorized

    got = {r.o_orderpriority: r for r in agg_trimmed_winsorized(spark, SF).collect()}
    orders = pd.read_parquet(f"{SF}/orders.parquet")[["o_orderpriority", "o_totalprice"]]
    for prio, grp in orders.groupby("o_orderpriority"):
        x = np.sort(grp.o_totalprice.to_numpy())
        n = len(x)
        # discrete quantile: smallest value with cume_dist >= q
        lo = x[math.ceil(0.10 * n) - 1]
        hi = x[math.ceil(0.90 * n) - 1]
        r = got[prio]
        assert r.p10 == pytest.approx(round(lo, 2))
        assert r.p90 == pytest.approx(round(hi, 2))
        assert r.winsorized_mean == pytest.approx(np.clip(x, lo, hi).mean(), abs=1e-3)
        inside = x[(x >= lo) & (x <= hi)]
        assert r.trimmed_mean == pytest.approx(inside.mean(), abs=1e-3)
        # robustness direction: both means live inside the clamp range
        assert lo <= r.trimmed_mean <= hi


def test_markov_transitions_match_pandas(spark):
    from spark_lineage_spark.operators.advanced_sql import ts_markov_transitions

    got = {(r.prev_type, r.next_type): r for r in ts_markov_transitions(spark, SF).collect()}
    ev = pd.read_parquet(f"{SF}/events.parquet").sort_values(["user_id", "ts", "event_id"])
    ev["prev"] = ev.groupby("user_id")["event_type"].shift(1)
    pairs = ev.dropna(subset=["prev"])
    counts = pairs.groupby(["prev", "event_type"]).size()
    v = ev.event_type.nunique()
    row_tot = counts.groupby(level=0).sum()
    assert set(got) == set(counts.index)
    for (p, nx), c in counts.items():
        r = got[(p, nx)]
        assert r.n_trans == c
        assert r.p_smoothed == pytest.approx((c + 1) / (row_tot[p] + v), abs=1e-6)
    # smoothed rows sum below 1 by exactly the unseen-transition mass
    for p in row_tot.index:
        s = sum(r.p_smoothed for (pp, _), r in got.items() if pp == p)
        n_seen = len([1 for (pp, _) in got if pp == p])
        assert s == pytest.approx((row_tot[p] + n_seen) / (row_tot[p] + v), abs=1e-4)


def test_interpolation_fills_every_gap_between_bounds(spark):
    from spark_lineage_spark.operators.advanced_sql import ts_interpolate_linear

    pdf = ts_interpolate_linear(spark, SF).toPandas()
    assert (pdf.kind.isin(["obs", "edge", "interp"])).all()
    assert pdf.v_filled.notna().all()
    # per user the spine is dense: consecutive calendar days
    for uid, grp in pdf.groupby("user_id"):
        days = pd.to_datetime(grp.d).sort_values()
        assert (days.diff().dropna() == pd.Timedelta(days=1)).all()
    # an interpolated value lies between its neighbors' filled values
    # (linear blend of the two nearest observations)
    pdf = pdf.sort_values(["user_id", "d"]).reset_index(drop=True)
    for i, row in pdf[pdf.kind == "interp"].iterrows():
        lo = pdf.v_filled[max(0, i - 1)]
        hi = pdf.v_filled[min(len(pdf) - 1, i + 1)]
        assert min(lo, hi) - 1e-6 <= row.v_filled <= max(lo, hi) + 1e-6


def test_perplexity_buckets_partition_the_corpus(spark):
    from spark_lineage_spark.operators.text import llm_perplexity_buckets

    pdf = llm_perplexity_buckets(spark, SF).toPandas().sort_values("bucket")
    n_docs = len(pd.read_parquet(f"{SF}/documents.parquet"))
    assert pdf.n_docs.sum() == n_docs
    assert pdf.bucket.between(1, 10).all()
    # buckets are ordered score ranges: min_lp non-decreasing, and each
    # bucket's range does not overlap the next bucket's
    mins, maxs = pdf.min_lp.to_numpy(), pdf.max_lp.to_numpy()
    assert (mins <= maxs).all()
    assert (maxs[:-1] <= mins[1:]).all()
    # deciles over distinct-ish scores: no bucket hogs the corpus
    assert pdf.n_docs.max() <= max(1, int(0.25 * n_docs))


def test_cooccurrence_matches_pandas_and_prunes(spark):
    from spark_lineage_spark.operators.text import llm_token_cooccurrence

    got = {(r.w1, r.w2): r for r in llm_token_cooccurrence(spark, SF).collect()}
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    n = len(docs)
    minsup = math.ceil(0.25 * n)
    sets = docs.text.str.split(" ").map(set)
    df_t = pd.Series([w for s in sets for w in s]).value_counts()
    frequent = set(df_t[df_t >= minsup].index)
    from collections import Counter

    pair_counts = Counter()
    for s in sets:
        fs = sorted(s & frequent)
        for i in range(len(fs)):
            for j in range(i + 1, len(fs)):
                pair_counts[(fs[i], fs[j])] += 1
    expected = {p: c for p, c in pair_counts.items() if c >= minsup}
    assert set(got) == set(expected)
    for (a, b), c in expected.items():
        r = got[(a, b)]
        assert r.n_pair == c
        assert r.support == pytest.approx(c / n, abs=1e-6)
        assert r.lift == pytest.approx(c * n / (df_t[a] * df_t[b]), abs=1e-6)
        assert a < b  # canonical pair order, no mirrored duplicates


def test_triangles_match_bruteforce(spark):
    from itertools import combinations

    from spark_lineage_spark.operators.advanced_sql import graph_triangle_copurchase

    row = graph_triangle_copurchase(spark, SF).collect()[0]
    li = pd.read_parquet(f"{SF}/lineitem.parquet")[["l_orderkey", "l_partkey"]]
    edges = set()
    for _, grp in li.drop_duplicates().groupby("l_orderkey"):
        for u, v in combinations(sorted(grp.l_partkey.unique()), 2):
            edges.add((u, v))
    assert row.n_edges == len(edges)
    adj = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
    tri = sum(
        1
        for (u, v) in edges
        for w in adj.get(v, ())
        if w in adj.get(u, ())
    )
    assert row.n_triangles == tri


def test_weighted_median_matches_numpy(spark):
    from spark_lineage_spark.operators.advanced_sql import agg_weighted_median

    got = {r.l_returnflag: r for r in agg_weighted_median(spark, SF).collect()}
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    for flag, grp in li.groupby("l_returnflag"):
        g = grp.sort_values(["l_extendedprice", "l_orderkey", "l_linenumber"])
        cum = g.l_quantity.cumsum()
        half = g.l_quantity.sum() / 2
        med = g.l_extendedprice[(cum >= half).to_numpy()].iloc[0]
        assert got[flag].weighted_median == pytest.approx(round(med, 2))
        assert got[flag].total_weight == pytest.approx(g.l_quantity.sum(), abs=1e-2)


def test_rolling_distinct_users_matches_pandas(spark):
    from spark_lineage_spark.operators.advanced_sql import ts_rolling_distinct_users

    got = {r.d: r.active_7d for r in ts_rolling_distinct_users(spark, SF).collect()}
    ev = pd.read_parquet(f"{SF}/events.parquet")
    du = (
        ev.assign(d=pd.to_datetime(ev.ts).dt.floor("D"))[["d", "user_id"]]
        .drop_duplicates()
    )
    days = pd.date_range(du.d.min(), du.d.max(), freq="D")
    assert len(got) == len(days)
    for day in days:
        window = du[(du.d >= day - pd.Timedelta(days=6)) & (du.d <= day)]
        assert got[day.strftime("%Y-%m-%d")] == window.user_id.nunique()


def test_xml_roundtrip_preserves_nation(spark):
    from spark_lineage_spark.operators.sources_sinks import scan_xml_roundtrip

    got = {r.n_regionkey: r for r in scan_xml_roundtrip(spark, SF).collect()}
    nat = pd.read_parquet(f"{SF}/nation.parquet")
    for rk, grp in nat.groupby("n_regionkey"):
        assert got[rk].n_nations == len(grp)
        assert got[rk].names == ",".join(sorted(grp.n_name))
