"""Round-13 property coverage: independent replays of the new ops —
each re-derives the operator's statistic from the raw parquet with
numpy/pandas/hashlib, pinned to the textbook definition rather than
the operator's own SQL, so a shared-SQL formula transcription error
cannot hide behind the cross-engine hash gate (the
ts_seasonal_strength F_T/F_S lesson from ADVICE r11)."""

import hashlib

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def _load_all():
    from spark_lineage_spark.registry import load_all

    return load_all()


# ---------------------------------------------------------------------------
# rows-only -> hash-gated upgrades (VERDICT r12 item 4)
# ---------------------------------------------------------------------------


def test_sample_hash_deterministic_matches_hashlib_replay(spark):
    got = (
        _load_all()["sample_hash_deterministic"].builder(spark, SF).toPandas()
    )
    li = pd.read_parquet(
        f"{SF}/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber", "l_quantity"],
    )

    def keep(ok, ln):
        h = hashlib.md5(f"{ok}_{ln}_seed42".encode()).hexdigest()[:15]
        return int(h, 16) / 1152921504606846976 < 0.1

    exp = li[[keep(ok, ln) for ok, ln in zip(li.l_orderkey, li.l_linenumber)]]
    got_keys = set(zip(got.l_orderkey, got.l_linenumber))
    exp_keys = set(zip(exp.l_orderkey, exp.l_linenumber))
    assert got_keys == exp_keys
    # the empirical rate is near the nominal fraction (binomial 3-sigma)
    n = len(li)
    sd = (0.1 * 0.9 / n) ** 0.5
    assert abs(len(exp) / n - 0.1) < 3 * sd
    # membership is a pure function of the key: a rerun is identical
    again = (
        _load_all()["sample_hash_deterministic"].builder(spark, SF).toPandas()
    )
    assert set(zip(again.l_orderkey, again.l_linenumber)) == got_keys


def test_fn_variant_json_deterministic_projection(spark):
    got = _load_all()["fn_variant_json"].builder(spark, SF).toPandas()
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["event_id", "props"])
    import json

    exp_k = ev.set_index("event_id")["props"].map(lambda p: json.loads(p)["k"])
    merged = got.set_index("event_id")
    assert (merged["k_int"] == exp_k.loc[merged.index]).all()
    # schema rendering is the constant implied by the uniform structure
    assert (merged["variant_schema"] == "OBJECT<k: BIGINT>").all()


# ---------------------------------------------------------------------------
# round-13 new operators
# ---------------------------------------------------------------------------


def test_cmh_matches_pandas_replay(spark):
    got = (
        _load_all()["stats_cmh_test"].builder(spark, SF).toPandas()
        .sort_values("nation").reset_index(drop=True)
    )
    o = pd.read_parquet(
        f"{SF}/orders.parquet",
        columns=["o_custkey", "o_totalprice", "o_orderpriority"],
    )
    c = pd.read_parquet(
        f"{SF}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    m = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    m["x"] = (m.o_totalprice > 150000).astype(int)
    m["y"] = (m.o_orderpriority == "1-URGENT").astype(int)
    dev = var = orn = ordn = 0.0
    strata = []
    for nat, grp in m.groupby("c_nationkey"):
        a = int(((grp.x == 1) & (grp.y == 1)).sum())
        b = int(((grp.x == 1) & (grp.y == 0)).sum())
        cc = int(((grp.x == 0) & (grp.y == 1)).sum())
        d = int(((grp.x == 0) & (grp.y == 0)).sum())
        n = a + b + cc + d
        if n <= 1:
            continue
        strata.append((nat, a, b, cc, d))
        dev += round((a - (a + b) * (a + cc) / n) * 1e9)
        var += round((a + b) * (cc + d) * (a + cc) * (b + d)
                     / n / n / (n - 1) * 1e9)
        orn += round(a * d / n * 1e9)
        ordn += round(b * cc / n * 1e9)
    dev, var = dev / 1e9, var / 1e9
    # per-stratum counts match exactly
    assert [tuple(r) for r in got[
        ["nation", "n_exp_pos", "n_exp_neg", "n_unexp_pos", "n_unexp_neg"]
    ].itertuples(index=False)] == strata
    # textbook CMH statistic, continuity-corrected variant, MH OR
    assert abs(got.chi2_cmh.iloc[0] - round(dev * dev / var, 6)) < 1e-9
    cc_stat = max(abs(dev) - 0.5, 0.0) ** 2 / var
    assert abs(got.chi2_cmh_cc.iloc[0] - round(cc_stat, 6)) < 1e-9
    assert abs(got.or_mh.iloc[0] - round(orn / ordn, 6)) < 1e-9
    assert (got.reject_95 == int(dev * dev / var > 3.8415)).all()
    # scalars are identical on every output row (broadcast join shape)
    for col in ["chi2_cmh", "chi2_cmh_cc", "or_mh", "n_strata"]:
        assert got[col].nunique() == 1


def test_jonckheere_terpstra_matches_numpy_replay(spark):
    got = (
        _load_all()["stats_jonckheere_terpstra"].builder(spark, SF).toPandas()
        .sort_values("priority_rank").reset_index(drop=True)
    )
    o = pd.read_parquet(
        f"{SF}/orders.parquet", columns=["o_orderpriority", "o_totalprice"]
    )
    g = o.o_orderpriority.str[0].astype(int).to_numpy()
    cell = np.floor(o.o_totalprice.to_numpy() / 2500).astype(np.int64)
    # direct pairwise JT on the binned values (textbook definition)
    jt = 0.0
    for i in range(1, 6):
        for j in range(i + 1, 6):
            xi, xj = cell[g == i], cell[g == j]
            jt += (xi[:, None] < xj[None, :]).sum()
            jt += 0.5 * (xi[:, None] == xj[None, :]).sum()
    ns = [int((g == k).sum()) for k in range(1, 6)]
    n = sum(ns)
    mean = (n * n - sum(x * x for x in ns)) / 4
    # three-term tie-corrected variance (Hollander & Wolfe)
    _, tv = np.unique(cell, return_counts=True)
    s1 = n * (n - 1) * (2 * n + 5)
    s1 -= sum(x * (x - 1) * (2 * x + 5) for x in ns)
    # cubic tie sums replayed at the operator's 2^20-grain snap
    t25 = sum(round(t * (t - 1) * (2 * t + 5) / 1048576) for t in tv) * 1048576
    t3 = sum(round(t * (t - 1) * (t - 2) / 1048576) for t in tv) * 1048576
    var = (s1 - t25) / 72
    var += (sum(x * (x - 1) * (x - 2) for x in ns) * t3
            / (36 * n * (n - 1) * (n - 2)))
    var += (sum(x * (x - 1) for x in ns)
            * sum(int(t) * (int(t) - 1) for t in tv) / (8 * n * (n - 1)))
    assert got.n_group.tolist() == ns
    assert (got.n_total == n).all()
    assert abs(got.jt_stat.iloc[0] - round(jt, 2)) < 1e-6
    assert abs(got.jt_mean.iloc[0] - round(mean, 2)) < 1e-6
    assert abs(got.jt_var.iloc[0] - round(var, 2)) < 0.02
    z = (jt - mean) / np.sqrt(var)
    assert abs(got.z_score.iloc[0] - round(z, 4)) < 1e-3
    assert (got.increasing_trend_95 == int(z > 1.6449)).all()


def test_page_trend_matches_numpy_replay(spark):
    got = (
        _load_all()["stats_page_trend"].builder(spark, SF).toPandas()
        .sort_values("event_type").reset_index(drop=True)
    )
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["ts", "event_type"])
    grid = (
        ev.groupby([ev.ts.dt.normalize(), "event_type"]).size().unstack()
    )
    grid = grid.dropna()  # complete blocks only
    k = grid.shape[1]
    n = len(grid)
    # within-day mid-ranks (average rank over ties), textbook
    ranks = grid.rank(axis=1, method="average")
    r_sum = ranks.sum(axis=0)  # per treatment, alphabetical columns
    j = np.arange(1, k + 1)  # alphabetical hypothesized order
    l_stat = float((j * r_sum.to_numpy()).sum())
    l_mean = n * k * (k + 1) ** 2 / 4
    l_var = n * k * k * (k + 1) * (k * k - 1) / 144
    z = (l_stat - l_mean) / np.sqrt(l_var)
    assert got.event_type.tolist() == list(grid.columns)
    assert got.hypothesized_rank.tolist() == list(range(1, k + 1))
    assert np.allclose(got.rank_sum, r_sum.to_numpy(), atol=1e-9)
    assert (got.n_blocks == n).all() and (got.k_treatments == k).all()
    assert abs(got.page_l.iloc[0] - round(l_stat, 1)) < 1e-9
    assert abs(got.page_l_mean.iloc[0] - round(l_mean, 1)) < 1e-9
    assert abs(got.page_l_var.iloc[0] - round(l_var, 2)) < 1e-9
    assert abs(got.z_score.iloc[0] - round(z, 4)) < 1e-3
    assert (got.increasing_trend_95 == int(z > 1.6449)).all()
