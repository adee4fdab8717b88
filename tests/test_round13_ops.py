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


def test_spectral_coherence_matches_numpy_replay(spark):
    got = (
        _load_all()["ts_spectral_coherence"].builder(spark, SF).toPandas()
        .sort_values("fourier_k").reset_index(drop=True)
    )
    o = pd.read_parquet(
        f"{SF}/orders.parquet", columns=["o_orderdate", "o_totalprice"]
    )
    d = pd.to_datetime(o.o_orderdate).dt.normalize()
    cents = np.floor(o.o_totalprice.to_numpy() * 100 + 0.5).astype(np.int64)
    daily = pd.DataFrame({"d": d, "x": 1, "y": cents}).groupby("d").sum()
    d0 = daily.index.min()
    di = (daily.index - d0).days.to_numpy()
    span = di.max() + 1
    n_seg = span // 256
    ks = [1, 2, 4, 8, 16, 32, 37, 64]
    rows = {}
    tpx = tpy = 0
    for k in ks:
        re = im = pxx = pyy = 0
        for s in range(n_seg):
            mask = (di // 256) == s
            t = di[mask] % 256
            x = daily.x.to_numpy()[mask]
            y = daily.y.to_numpy()[mask]
            c8 = np.round(np.cos(2 * np.pi * k * t / 256) * 1e8)
            s8 = np.round(np.sin(2 * np.pi * k * t / 256) * 1e8)
            ax = round(float((x * c8).sum()) / 100)
            bx = round(float((x * s8).sum()) / 100)
            ay = round(float((y * c8).sum()) / 1e9)
            by = round(float((y * s8).sum()) / 1e9)
            re += ax * ay + bx * by
            im += bx * ay - ax * by
            pxx += ax * ax + bx * bx
            pyy += ay * ay + by * by
        coh2 = (re * re + im * im) / (pxx * pyy)
        rows[k] = (coh2, pxx, pyy)
        tpx += pxx
        tpy += pyy
    assert got.fourier_k.tolist() == ks
    assert (got.n_segments == n_seg).all() and n_seg >= 2
    for k, (_, row) in zip(ks, got.iterrows()):
        coh2, pxx, pyy = rows[k]
        assert abs(row.coherence2 - round(coh2, 6)) < 2e-6, k
        assert abs(row.power_share_x - round(pxx / tpx, 6)) < 2e-6, k
        assert abs(row.power_share_y - round(pyy / tpy, 6)) < 2e-6, k
        assert 0 <= row.coherence2 <= 1 + 1e-9
    # count and revenue co-move strongly at the longest timescale
    assert got.coherence2.iloc[0] > 0.5


def test_rich_club_matches_numpy_replay(spark):
    got = (
        _load_all()["graph_rich_club"].builder(spark, SF).toPandas()
        .sort_values("mean_factor").reset_index(drop=True)
    )
    li = pd.read_parquet(
        f"{SF}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    ).drop_duplicates()
    edges = set()
    for _, grp in li.groupby("l_orderkey"):
        ps = sorted(grp.l_partkey.unique())
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                edges.add((ps[i], ps[j]))
    deg = {}
    for u, v in edges:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
    n_nodes, deg_sum = len(deg), sum(deg.values())
    for jj, (_, row) in zip(range(8, 14), got.iterrows()):
        k = (deg_sum * jj + 10 * n_nodes - 1) // (10 * n_nodes)
        rich = {x for x, d in deg.items() if d > k}
        e_rich = sum(1 for u, v in edges if u in rich and v in rich)
        assert row.k_threshold == k
        assert row.n_rich == len(rich)
        assert row.e_rich == e_rich
        assert abs(row.mean_degree - round(deg_sum / n_nodes, 4)) < 1e-9
        if len(rich) > 1:
            phi = 2 * e_rich / (len(rich) * (len(rich) - 1))
            assert abs(row.phi - round(phi, 6)) < 1e-9
        else:
            assert pd.isna(row.phi)
    # rich-node count shrinks (weakly) as the threshold rises
    assert (got.n_rich.diff().dropna() <= 0).all()


def test_page_hinkley_matches_pandas_replay(spark):
    got = _load_all()["ts_page_hinkley"].builder(spark, SF).toPandas()
    o = pd.read_parquet(
        f"{SF}/orders.parquet", columns=["o_orderdate", "o_totalprice"]
    )
    cents = np.round(o.o_totalprice.to_numpy() * 100).astype(np.int64)
    daily = (
        pd.DataFrame({"d": pd.to_datetime(o.o_orderdate), "c": cents})
        .groupby("d")["c"].sum().sort_index()
    )
    calib = daily[daily.index < "1996-01-01"]
    n0 = len(calib)
    s1, s2 = int(calib.sum()), int((calib.astype(object) ** 2).sum())
    mu0 = s1 / n0
    sigma0 = np.sqrt((s2 - mu0 * s1) / (n0 - 1))
    delta, lam = mu0 * 0.005, 5 * sigma0
    mon = daily[daily.index >= "1996-01-01"]
    # full sequential recursion (textbook Page-Hinkley, both sides)
    csum = 0
    m_up = m_dn = 0.0
    min_up = min_dn = np.inf
    n_up = n_dn = 0
    max_up = max_dn = -np.inf
    first_up = first_dn = None
    for t, (d, x) in enumerate(mon.items(), start=1):
        csum += int(x)
        mu_run = csum / t
        m_up += float(x) - mu_run - delta
        m_dn += mu_run - float(x) - delta
        min_up, min_dn = min(min_up, m_up), min(min_dn, m_dn)
        ph_up, ph_dn = m_up - min_up, m_dn - min_dn
        max_up, max_dn = max(max_up, ph_up), max(max_dn, ph_dn)
        if ph_up > lam:
            n_up += 1
            first_up = first_up or d
        if ph_dn > lam:
            n_dn += 1
            first_dn = first_dn or d
    assert got.n_monitored_days.iloc[0] == len(mon)
    assert got.n_up_alarm_days.iloc[0] == n_up
    assert got.n_dn_alarm_days.iloc[0] == n_dn
    assert abs(got.max_ph_up_sigma.iloc[0] - round(max_up / sigma0, 4)) < 1e-3
    assert abs(got.max_ph_dn_sigma.iloc[0] - round(max_dn / sigma0, 4)) < 1e-3
    for col, exp in [("first_up_alarm", first_up), ("first_dn_alarm", first_dn)]:
        if exp is None:
            assert pd.isna(got[col].iloc[0])
        else:
            assert pd.Timestamp(got[col].iloc[0]) == exp


def test_selfbleu_matches_python_replay(spark):
    from collections import Counter

    got = (
        _load_all()["llm_selfbleu_diversity"].builder(spark, SF).toPandas()
        .sort_values("source").reset_index(drop=True)
    )
    d = pd.read_parquet(
        f"{SF}/documents.parquet", columns=["doc_id", "source", "text"]
    )
    d = d[d.text.notna()].sort_values("doc_id")
    agg = {}
    for src, grp in d.groupby("source"):
        s1 = c1 = s2 = c2 = 0
        ids = grp.doc_id.to_numpy()
        texts = dict(zip(grp.doc_id, grp.text))
        for a, b in zip(ids, ids[1:]):
            if a // 1000 != b // 1000:
                continue  # block boundary: unpaired tail
            ta = [t for t in texts[a].split(" ") if t]
            tb = [t for t in texts[b].split(" ") if t]
            for n in (1, 2):
                ga = Counter(
                    " ".join(ta[i : i + n]) for i in range(len(ta) - n + 1)
                )
                gb = Counter(
                    " ".join(tb[i : i + n]) for i in range(len(tb) - n + 1)
                )
                total = sum(ga.values())
                if total == 0:
                    continue
                clipped = sum(min(c, gb[g]) for g, c in ga.items())
                p9 = round(clipped / total * 1e9)
                if n == 1:
                    s1, c1 = s1 + p9, c1 + 1
                else:
                    s2, c2 = s2 + p9, c2 + 1
        agg[src] = (c1, s1 / c1 / 1e9, s2 / c2 / 1e9)
    assert got.source.tolist() == sorted(agg)
    for _, row in got.iterrows():
        n_pairs, p1, p2 = agg[row.source]
        assert row.n_pairs == n_pairs
        assert abs(row.mean_p1 - round(p1, 6)) < 1e-9
        assert abs(row.mean_p2 - round(p2, 6)) < 1e-9
        assert abs(row.selfbleu2 - round(np.sqrt(p1 * p2), 6)) < 1e-6
        # overlap precisions are true fractions; bigram <= unigram
        assert 0 <= row.mean_p2 <= row.mean_p1 <= 1


def test_dunn_matches_numpy_replay(spark):
    got = (
        _load_all()["stats_dunn_test"].builder(spark, SF).toPandas()
        .sort_values(["group_i", "group_j"]).reset_index(drop=True)
    )
    o = pd.read_parquet(
        f"{SF}/orders.parquet", columns=["o_orderpriority", "o_totalprice"]
    )
    g = o.o_orderpriority.str[0].astype(int).to_numpy()
    cell = np.floor(o.o_totalprice.to_numpy() / 2500).astype(np.int64)
    n = len(cell)
    ranks = pd.Series(cell).rank(method="average").to_numpy()  # global midranks
    mean_rank = {k: ranks[g == k].mean() for k in range(1, 6)}
    ns = {k: int((g == k).sum()) for k in range(1, 6)}
    _, tv = np.unique(cell, return_counts=True)
    t3 = sum(round(int(t) ** 3 / 1048576) for t in tv) * 1048576
    var_unit = n * (n + 1) / 12 - (t3 - n) / (12 * (n - 1))
    idx = 0
    for i in range(1, 6):
        for j in range(i + 1, 6):
            row = got.iloc[idx]
            idx += 1
            assert (row.group_i, row.group_j) == (i, j)
            assert (row.n_i, row.n_j) == (ns[i], ns[j])
            assert abs(row.mean_rank_i - round(mean_rank[i], 4)) < 1e-3
            assert abs(row.mean_rank_j - round(mean_rank[j], 4)) < 1e-3
            z = (mean_rank[i] - mean_rank[j]) / np.sqrt(
                var_unit * (1 / ns[i] + 1 / ns[j])
            )
            assert abs(row.z_dunn - round(z, 4)) < 1e-3
            assert row.reject_bonferroni_95 == int(abs(z) > 2.807)


def test_dickey_fuller_matches_numpy_replay(spark):
    got = _load_all()["ts_dickey_fuller"].builder(spark, SF).toPandas()
    o = pd.read_parquet(
        f"{SF}/orders.parquet", columns=["o_orderdate", "o_totalprice"]
    )
    cents = np.round(o.o_totalprice.to_numpy() * 100).astype(np.int64)
    daily = (
        pd.DataFrame({"d": pd.to_datetime(o.o_orderdate), "c": cents})
        .groupby("d")["c"].sum().sort_index()
    )
    # consecutive-calendar-day pairs only (sparse-series rule)
    nxt = daily.reindex(daily.index + pd.Timedelta(days=1))
    mask = nxt.notna().to_numpy()
    x = daily.to_numpy()[mask].astype(float)
    dy = (nxt.to_numpy()[mask] - daily.to_numpy()[mask]).astype(float)
    n = len(x)
    # textbook OLS of dy on x with intercept
    xm, ym = x.mean(), dy.mean()
    ssx = ((x - xm) ** 2).sum()
    ssxy = ((x - xm) * (dy - ym)).sum()
    ssy = ((dy - ym) ** 2).sum()
    b = ssxy / ssx
    se = np.sqrt(((ssy - b * ssxy) / (n - 2)) / ssx)
    t = b / se
    assert got.n_obs.iloc[0] == n
    assert abs(got.b_coef.iloc[0] - round(b, 6)) < 1e-5
    assert abs(got.rho.iloc[0] - round(b + 1, 6)) < 1e-5
    assert abs(got.df_stat.iloc[0] - round(t, 4)) < 1e-2
    assert got.reject_unit_root.iloc[0] == int(t < -2.86)
    rho = b + 1
    if 0 < rho < 1:
        assert abs(
            got.half_life_days.iloc[0] - round(-np.log(2) / np.log(rho), 2)
        ) < 0.02
    else:
        assert pd.isna(got.half_life_days.iloc[0])


def test_variance_ratio_matches_numpy_replay(spark):
    got = (
        _load_all()["ts_variance_ratio"].builder(spark, SF).toPandas()
        .sort_values("horizon_days").reset_index(drop=True)
    )
    o = pd.read_parquet(
        f"{SF}/orders.parquet", columns=["o_orderdate", "o_totalprice"]
    )
    cents = np.round(o.o_totalprice.to_numpy() * 100).astype(np.int64)
    daily = (
        pd.DataFrame({"d": pd.to_datetime(o.o_orderdate), "c": cents})
        .groupby("d")["c"].sum().sort_index()
    )

    def moments(q):
        shifted = daily.reindex(daily.index + pd.Timedelta(days=q))
        mask = shifted.notna().to_numpy()
        x = (shifted.to_numpy()[mask] - daily.to_numpy()[mask]).astype(float)
        return len(x), x

    n1, x1 = moments(1)
    var1 = x1.var(ddof=1)
    assert got.horizon_days.tolist() == [2, 4, 8, 16]
    for _, row in got.iterrows():
        q = int(row.horizon_days)
        nq, xq = moments(q)
        vr = xq.var(ddof=1) / (q * var1)
        z = (vr - 1) / np.sqrt(2 * (2 * q - 1) * (q - 1) / (3 * q * n1))
        assert row.n_pairs == nq and row.n_base_pairs == n1
        assert abs(row.variance_ratio - round(vr, 6)) < 1e-5, q
        assert abs(row.z_score - round(z, 4)) < 1e-2, q
        assert row.reject_random_walk_95 == int(abs(z) > 1.96)
    # independent daily shocks: VR must FALL with horizon (mean reversion
    # of the level series), and the fixture pins strong rejection
    assert (got.variance_ratio.diff().dropna() < 0).all()


def test_sign_test_matches_python_replay(spark):
    import math

    got = _load_all()["stats_sign_test"].builder(spark, SF).toPandas()
    o = pd.read_parquet(
        f"{SF}/orders.parquet", columns=["o_orderdate", "o_totalprice"]
    )
    cents = np.round(o.o_totalprice.to_numpy() * 100).astype(np.int64)
    d = pd.to_datetime(o.o_orderdate)
    ed = (d - pd.Timestamp("1970-01-01")).dt.days.to_numpy()
    daily = (
        pd.DataFrame({"ed": ed, "c": cents}).groupby("ed")["c"].sum()
    )
    k_pos = k_neg = 0
    weeks = pd.DataFrame({
        "ed": daily.index,
        "c": daily.to_numpy(),
        "wk": (daily.index + 3) // 7,
        "wknd": np.isin(daily.index % 7, [2, 3]),
    })
    for _, grp in weeks.groupby("wk"):
        wd, we = grp[~grp.wknd], grp[grp.wknd]
        if len(wd) == 0 or len(we) == 0:
            continue
        lhs = int(wd.c.sum()) * len(we)
        rhs = int(we.c.sum()) * len(wd)
        if lhs > rhs:
            k_pos += 1
        elif lhs < rhs:
            k_neg += 1
    n = k_pos + k_neg
    kmin = min(k_pos, k_neg)
    # exact binomial(n, 1/2) lower tail via lgamma
    tail = sum(
        math.exp(
            math.lgamma(n + 1) - math.lgamma(i + 1) - math.lgamma(n - i + 1)
            - n * math.log(2)
        )
        for i in range(kmin + 1)
    )
    p2 = min(1.0, 2 * tail)
    assert got.n_weeks.iloc[0] == n
    assert got.n_weekday_higher.iloc[0] == k_pos
    assert got.n_weekend_higher.iloc[0] == k_neg
    assert abs(got.p_two_sided.iloc[0] - round(p2, 6)) < 1e-4
    assert got.reject_95.iloc[0] == int(2 * tail < 0.05)


def test_mixture_weights_sqrt_snap_replay(spark):
    """Round-13 hardening replay: the temperature weights must equal
    the 1e-9-snapped-sqrt chassis exactly (pow(n, 0.5) drifted a ulp
    between engines at sf0.1 and flipped floor(expected_docs))."""
    got = (
        _load_all()["llm_mixture_weights"].builder(spark, SF).toPandas()
        .sort_values("source").reset_index(drop=True)
    )
    d = pd.read_parquet(f"{SF}/documents.parquet", columns=["source"])
    counts = d.source.value_counts().sort_index()
    s9 = {src: round(np.sqrt(n) * 1e9) for src, n in counts.items()}
    z9, total = sum(s9.values()), int(counts.sum())
    for _, row in got.iterrows():
        n = counts[row.source]
        w = s9[row.source] / z9
        rate = min(1.0, w * total * 0.5 / n)
        assert row.n_docs == n
        assert abs(row.weight - round(w, 6)) < 1e-9
        assert abs(row.sample_rate - round(rate, 6)) < 1e-9
        assert row.expected_docs == int(np.floor(n * rate))
    # the alpha temperature upweights small sources: sample_rate is
    # (weakly) decreasing in source size
    m = got.sort_values("n_docs")
    assert (m.sample_rate.diff().dropna() <= 1e-12).all()


def test_xi_correlation_matches_numpy_replay(spark):
    got = (
        _load_all()["stats_xi_correlation"].builder(spark, SF).toPandas()
        .sort_values("direction").reset_index(drop=True)
    )
    o = pd.read_parquet(
        f"{SF}/orders.parquet", columns=["o_orderdate", "o_totalprice"]
    )
    cents = np.round(o.o_totalprice.to_numpy() * 100).astype(np.int64)
    g = pd.DataFrame({"d": pd.to_datetime(o.o_orderdate), "y": cents})
    daily = g.groupby("d").agg(x=("y", "size"), y=("y", "sum")).reset_index()

    def xi(xv, yv, dv):
        n = len(yv)
        order = np.lexsort((dv, xv))  # x-order with the (x, d) tie-break
        ys = yv[order]
        r = np.array([(yv <= v).sum() for v in ys])
        l = np.array([(yv >= v).sum() for v in ys])
        sum_dr = np.abs(np.diff(r)).sum()
        sum_ln = (l * (n - l)).sum()
        return 1 - n * sum_dr / (2 * sum_ln), n

    for direction, xv, yv in [
        ("count_on_revenue", daily.y.to_numpy(), daily.x.to_numpy()),
        ("revenue_on_count", daily.x.to_numpy(), daily.y.to_numpy()),
    ]:
        row = got[got.direction == direction].iloc[0]
        val, n = xi(xv, yv, daily.d.to_numpy())
        z = val * np.sqrt(n) / np.sqrt(2 / 5)
        assert row.n_days == n
        assert abs(row.xi - round(val, 6)) < 1e-9, direction
        assert abs(row.z_score - round(z, 4)) < 1e-3, direction
        assert row.dependent_95 == int(z > 1.6449)
    # revenue is (nearly) a function of count on this fixture, so the
    # dependence must register and be direction-asymmetric
    rv = got.set_index("direction").xi
    assert rv["revenue_on_count"] > 0.1


def test_sample_entropy_matches_numpy_replay(spark):
    got = _load_all()["ts_sample_entropy"].builder(spark, SF).toPandas()
    o = pd.read_parquet(
        f"{SF}/orders.parquet", columns=["o_orderdate", "o_totalprice"]
    )
    cents = np.round(o.o_totalprice.to_numpy() * 100).astype(np.int64)
    daily = (
        pd.DataFrame({"d": pd.to_datetime(o.o_orderdate), "c": cents})
        .groupby("d")["c"].sum().sort_index().to_numpy()
    )
    n = len(daily)
    sm, sq = float(daily.sum()), float((daily.astype(object) ** 2).sum())
    r = round(0.2 * np.sqrt((sq - sm * sm / n) / (n - 1)))

    def count(m):
        tot = 0
        v = np.stack([daily[k : n - (m - 1) + k] for k in range(m)], axis=1)
        for i in range(len(v)):
            d = np.abs(v[i + 1 :] - v[i]).max(axis=1)
            tot += int((d <= r).sum())
        return tot

    # m=2/m=3 template pair counts over the FULL t table (the operator
    # pairs all rows with a defined window, template i<j)
    b = count(2)
    a = count(3)
    assert got.n_days.iloc[0] == n
    assert got.tolerance_cents.iloc[0] == r
    assert got.n_matches_m2.iloc[0] == b
    assert got.n_matches_m3.iloc[0] == a
    if a > 0 and b > 0:
        assert abs(got.sample_entropy.iloc[0] - round(-np.log(a / b), 6)) < 1e-6
        assert got.sample_entropy.iloc[0] > 0  # A is a subset of B


def test_watermark_detect_matches_hashlib_replay(spark):
    got = (
        _load_all()["llm_watermark_detect"].builder(spark, SF).toPandas()
        .sort_values("source").reset_index(drop=True)
    )
    d = pd.read_parquet(
        f"{SF}/documents.parquet", columns=["doc_id", "source", "text"]
    )
    d = d[d.text.notna()]
    agg = {}
    for src, grp in d.groupby("source"):
        zs, gsum, tsum = [], 0, 0
        for text in grp.text:
            toks = [t for t in text.split(" ") if t]
            t = max(0, len(toks) - 1)
            if t == 0:
                continue
            g = 0
            for a, b in zip(toks, toks[1:]):
                h = hashlib.md5(f"wm_{a}_{b}".encode()).hexdigest()[:15]
                if int(h, 16) / 1152921504606846976 < 0.25:
                    g += 1
            z = (g - 0.25 * t) / np.sqrt(t * 0.1875)
            zs.append(round(z * 1e6))
            gsum += g
            tsum += t
        agg[src] = (len(zs), sum(zs) / len(zs) / 1e6,
                    max(zs) / 1e6, gsum / tsum,
                    sum(1 for z in zs if z / 1e6 > 4))
    for _, row in got.iterrows():
        n, mean_z, max_z_snap, gf, ndet = agg[row.source]
        assert row.n_docs == n
        assert abs(row.mean_z - round(mean_z, 6)) < 1e-9
        # max_z in the op is the raw double; the replay snapped at 1e-6
        assert abs(row.max_z - round(max_z_snap, 4)) < 1e-3
        assert abs(row.green_fraction - round(gf, 6)) < 1e-9
        assert row.n_detected == ndet
    # the fixture is UNWATERMARKED: null behavior is the pinned claim
    assert (got.n_detected == 0).all()
    assert got.green_fraction.between(0.2, 0.3).all()
    assert got.mean_z.abs().max() < 1.0


def _km_subjects(sf=SF, horizon=180):
    o = pd.read_parquet(
        f"{sf}/orders.parquet",
        columns=["o_custkey", "o_orderdate", "o_orderkey"],
    )
    o["d"] = pd.to_datetime(o.o_orderdate)
    endd = o.d.max()
    subj = {}
    for cust, grp in o.sort_values(["d", "o_orderkey"]).groupby("o_custkey"):
        ds = grp.d.tolist()
        t1 = ds[0]
        win = min(horizon, (endd - t1).days)
        gap = (ds[1] - t1).days if len(ds) > 1 else None
        if gap is not None and gap <= win:
            subj[cust] = (gap, 1)
        else:
            subj[cust] = (win, 0)
    return subj


def test_kaplan_meier_matches_python_replay(spark):
    got = (
        _load_all()["stats_kaplan_meier"].builder(spark, SF).toPandas()
        .sort_values("gap_days").reset_index(drop=True)
    )
    subj = _km_subjects()
    times = sorted({t for t, _ in subj.values()})
    n = len(subj)
    removed = 0
    s = 1.0
    rows = []
    for t in times:
        d = sum(1 for tt, e in subj.values() if tt == t and e == 1)
        c = sum(1 for tt, e in subj.values() if tt == t and e == 0)
        n_risk = n - removed
        if d > 0:
            s *= 1 - d / n_risk
            rows.append((t, n_risk, d, c, s))
        removed += d + c
    assert got.gap_days.tolist() == [r[0] for r in rows]
    assert got.n_risk.tolist() == [r[1] for r in rows]
    assert got.n_events.tolist() == [r[2] for r in rows]
    assert got.n_censored.tolist() == [r[3] for r in rows]
    assert np.allclose(got.survival, [round(r[4], 6) for r in rows], atol=2e-6)
    # KM invariants: S is strictly decreasing at event times, in (0,1]
    assert (got.survival.diff().dropna() < 0).all()
    assert got.survival.iloc[0] <= 1.0 and got.survival.iloc[-1] > 0


def test_logrank_matches_python_replay(spark):
    got = _load_all()["stats_logrank_test"].builder(spark, SF).toPandas()
    c = pd.read_parquet(
        f"{SF}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    )
    g1set = set(
        c[c.c_mktsegment.isin(["AUTOMOBILE", "BUILDING"])].c_custkey
    )
    subj = _km_subjects()
    items = [(t, e, cust in g1set) for cust, (t, e) in subj.items()]
    times = sorted({t for t, e, _ in items if e == 1})
    oe = v = 0.0
    d_tot = d1_tot = 0
    for t in times:
        at_risk = [(tt, e, g) for tt, e, g in items if tt >= t]
        n_risk = len(at_risk)
        n1 = sum(1 for _, _, g in at_risk if g)
        d = sum(1 for tt, e, _ in at_risk if tt == t and e == 1)
        d1 = sum(1 for tt, e, g in at_risk if tt == t and e == 1 and g)
        oe += round((d1 - d * n1 / n_risk) * 1e9)
        if n_risk > 1:
            v += round(
                d * n1 / n_risk * (1 - n1 / n_risk)
                * (n_risk - d) / (n_risk - 1) * 1e9
            )
        d_tot += d
        d1_tot += d1
    oe, v = oe / 1e9, v / 1e9
    chi2 = oe * oe / v
    assert got.n_subjects.iloc[0] == len(subj)
    assert got.n_group1.iloc[0] == len([1 for _, _, g in items if g])
    assert got.events_total.iloc[0] == d_tot
    assert got.events_g1.iloc[0] == d1_tot
    assert abs(got.observed_minus_expected.iloc[0] - round(oe, 4)) < 1e-9
    assert abs(got.expected_g1.iloc[0] - round(d1_tot - oe, 4)) < 1e-9
    assert abs(got.chi2_logrank.iloc[0] - round(chi2, 4)) < 1e-9
    assert got.reject_95.iloc[0] == int(chi2 > 3.8415)


def test_cochran_q_matches_pandas_replay(spark):
    got = (
        _load_all()["stats_cochran_q"].builder(spark, SF).toPandas()
        .sort_values("event_type").reset_index(drop=True)
    )
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["ts", "event_type"])
    grid = (
        ev.groupby([ev.ts.dt.normalize(), "event_type"]).size().unstack()
    ).dropna()
    # exact discrete median (lower of the two middles = percentile_disc)
    meds = grid.apply(
        lambda col: sorted(col)[(len(col) - 1) // 2], axis=0
    )
    x = (grid > meds).astype(int)
    k = x.shape[1]
    ct = x.sum(axis=0)
    rb = x.sum(axis=1)
    n = int(ct.sum())
    q_den = k * n - int((rb**2).sum())
    q = (k - 1) * (k * int((ct**2).sum()) - n * n) / q_den
    assert got.event_type.tolist() == list(x.columns)
    assert got.n_days_above_median.tolist() == ct.tolist()
    assert (got.k_treatments == k).all() and (got.n_successes == n).all()
    assert abs(got.q_stat.iloc[0] - round(q, 6)) < 1e-9
    assert (got.reject_95 == int(q > 9.487729)).all()


def test_cochran_q_reduces_to_mcnemar_formula():
    """k=2 textbook reduction: Q equals McNemar's (b-c)^2/(b+c) on the
    discordant pairs — pure python, no Spark."""
    rng = np.random.default_rng(13)
    for _ in range(25):
        x1 = rng.integers(0, 2, 40)
        x2 = rng.integers(0, 2, 40)
        b = int(((x1 == 1) & (x2 == 0)).sum())
        c = int(((x1 == 0) & (x2 == 1)).sum())
        if b + c == 0:
            continue
        k, ct = 2, [int(x1.sum()), int(x2.sum())]
        n = sum(ct)
        rb = x1 + x2
        q = (k - 1) * (k * sum(v * v for v in ct) - n * n) / (
            k * n - int((rb**2).sum())
        )
        assert abs(q - (b - c) ** 2 / (b + c)) < 1e-9
