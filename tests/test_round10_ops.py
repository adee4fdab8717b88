"""Property tests for the round-10 operators (SURVEY §2.19 and the
late-round-9 wave): agreement with independent pandas/numpy reference
implementations, algebraic invariants, and the completeness guarantees
(banded-join recall, water-filling budget exactness) an oracle
value-hash can't express.
"""

import math

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F


def _load_all():
    from spark_lineage_spark.registry import load_all

    return load_all()


# ---------------------------------------------------------------------------
# graph_link_prediction
# ---------------------------------------------------------------------------


def _bipartite(spark, sf_dir):
    from spark_lineage_spark.tables import load

    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    od = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("1998-01-01").cast("date"))
        .select("o_orderkey", "o_custkey")
    )
    return (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .select(F.col("o_custkey").alias("c"), F.col("l_partkey").alias("p"))
        .distinct()
        .toPandas()
    )


def test_link_prediction_matches_bruteforce(spark, sf_dir):
    """The banded top-20 must equal a pandas brute-force over the same
    trailing-window bipartite table: common counts, degrees, Jaccard,
    and Adamic-Adar recomputed from scratch (dict-of-sets reference,
    independent of the wedge join)."""
    bip = _bipartite(spark, sf_dir)
    by_c = bip.groupby("c")["p"].apply(set)
    deg_p = bip.groupby("p")["c"].nunique()
    pairs = {}
    for c, parts in by_c.items():
        dc = len(parts)
        for a in parts:
            for b in parts:
                if a < b:
                    cnt, aa = pairs.get((a, b), (0, 0.0))
                    pairs[(a, b)] = (cnt + 1, aa + 1.0 / math.log(dc))
    rows = _load_all()["graph_link_prediction"].builder(spark, sf_dir).collect()
    assert 0 < len(rows) <= 20
    expected_order = sorted(pairs.items(), key=lambda kv: (-kv[1][0], kv[0]))[: len(rows)]
    for row, ((a, b), (cnt, aa)) in zip(rows, expected_order):
        assert (row.part_a, row.part_b) == (a, b)
        assert row.common_cnt == cnt
        assert row.deg_a == int(deg_p[a]) and row.deg_b == int(deg_p[b])
        jac = cnt / (deg_p[a] + deg_p[b] - cnt)
        assert abs(row.jaccard - jac) < 1e-5
        assert abs(row.adamic_adar - aa) < 1e-5
        assert 0 < row.jaccard <= 1
        assert row.common_cnt <= min(row.deg_a, row.deg_b)


def test_link_prediction_hub_cap_noop(spark, sf_dir):
    """The in-plan hub cap (drop customers with > _LINK_PRED_HUB_CAP
    distinct parts before the wedge self-join) must be a NO-OP on the
    fixture — max basket is well under the cap — so the capless DuckDB
    oracle stays hash-identical.  Also exercises the cap for real on a
    synthetic hub: a planted customer above the cap contributes zero
    wedges."""
    from spark_lineage_spark.operators.analytics import _LINK_PRED_HUB_CAP

    bip = _bipartite(spark, sf_dir)
    max_basket = int(bip.groupby("c")["p"].nunique().max())
    assert max_basket <= _LINK_PRED_HUB_CAP, (
        f"fixture basket {max_basket} exceeds the hub cap "
        f"{_LINK_PRED_HUB_CAP}: the cap is no longer a no-op and the "
        f"capless oracle would diverge — raise the cap or cap the oracle"
    )
    # planted hub: cap+1 parts for one customer -> every wedge filtered
    hub = spark.createDataFrame(
        [(999_999_001, p, 1) for p in range(_LINK_PRED_HUB_CAP + 1)],
        "c long, p long, dc long",
    )
    capped = hub.filter(F.col("dc") <= F.lit(_LINK_PRED_HUB_CAP))
    # dc here mirrors the operator's degc join value for a hub customer
    hub_dc = hub.groupBy("c").count().collect()[0]["count"]
    assert hub_dc == _LINK_PRED_HUB_CAP + 1
    assert (
        hub.withColumn("dc", F.lit(hub_dc))
        .filter(F.col("dc") <= F.lit(_LINK_PRED_HUB_CAP))
        .count()
        == 0
    )
    assert capped.count() == hub.count()  # per-row dc=1 passes untouched


def test_link_prediction_hub_cap_is_live(spark, sf_dir, monkeypatch):
    """The guard must be LIVE in the operator's plan, not dead code: a
    cap forced BELOW the fixture's max basket changes the result (hub
    customers' wedges vanish), while a huge cap reproduces the normal
    top-20 exactly."""
    import spark_lineage_spark.operators.analytics as A

    normal = [
        (r.part_a, r.part_b, r.common_cnt)
        for r in A.graph_link_prediction(spark, sf_dir).collect()
    ]
    monkeypatch.setattr(A, "_LINK_PRED_HUB_CAP", 10**9)
    huge = [
        (r.part_a, r.part_b, r.common_cnt)
        for r in A.graph_link_prediction(spark, sf_dir).collect()
    ]
    assert huge == normal, "cap at 1e9 must be a no-op"
    # a tiny cap must drop wedge mass: total common_cnt strictly falls
    monkeypatch.setattr(A, "_LINK_PRED_HUB_CAP", 5)
    tiny = A.graph_link_prediction(spark, sf_dir).collect()
    assert sum(r.common_cnt for r in tiny) < sum(c for _, _, c in normal), (
        "cap=5 did not reduce wedge mass — the guard is not in the plan"
    )


# ---------------------------------------------------------------------------
# stats_runs_test / stats_jarque_bera
# ---------------------------------------------------------------------------


def _daily_cents(spark, sf_dir):
    from spark_lineage_spark.tables import load

    pdf = (
        load(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderdate").cast("date").alias("d"))
        .agg(
            F.sum((F.col("o_totalprice") * 100).cast("decimal(38,0)"))
            .cast("long")
            .alias("v")
        )
        .orderBy("d")
        .toPandas()
    )
    return pdf


def test_runs_test_matches_bruteforce(spark, sf_dir):
    """n1/n2/runs must equal a direct pandas walk: discrete median
    (lower-middle order statistic), sign series, run starts at sign
    flips; z from the textbook moments."""
    pdf = _daily_cents(spark, sf_dir)
    v = pdf["v"].to_numpy()
    med = int(np.sort(v)[(len(v) - 1) // 2])  # percentile_disc(0.5)
    signs = [1 if x > med else (-1 if x < med else 0) for x in v]
    kept = [s for s in signs if s != 0]
    runs = 1 + sum(1 for i in range(1, len(kept)) if kept[i] != kept[i - 1])
    n1 = sum(1 for s in kept if s == 1)
    n2 = sum(1 for s in kept if s == -1)
    row = _load_all()["stats_runs_test"].builder(spark, sf_dir).collect()[0]
    assert (row.n_above, row.n_below, row.n_runs) == (n1, n2, runs)
    mu = 2.0 * n1 * n2 / (n1 + n2) + 1
    var = 2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2) / ((n1 + n2) ** 2 * (n1 + n2 - 1))
    assert abs(row.expected_runs - mu) < 1e-4
    assert abs(row.z_stat - (runs - mu) / math.sqrt(var)) < 1e-4


def test_jarque_bera_matches_numpy_moments(spark, sf_dir):
    """Skewness/kurtosis from the shifted bigint power sums must match
    numpy central moments of the same $1000-floored daily values; the
    p-value is exactly the chi2(2df) survival exp(-JB/2)."""
    from spark_lineage_spark.tables import load

    pdf = (
        load(spark, sf_dir, "orders")
        .groupBy("o_orderdate")
        .agg(F.floor(F.sum("o_totalprice") / 1000).cast("long").alias("x"))
        .toPandas()
    )
    x = pdf["x"].to_numpy(dtype=float)
    m2 = ((x - x.mean()) ** 2).mean()
    skew = ((x - x.mean()) ** 3).mean() / m2**1.5
    kurt = ((x - x.mean()) ** 4).mean() / m2**2
    row = _load_all()["stats_jarque_bera"].builder(spark, sf_dir).collect()[0]
    assert row.n_days == len(x)
    assert abs(row.skewness - skew) < 1e-4
    assert abs(row.kurtosis - kurt) < 1e-4
    jb = len(x) / 6.0 * (skew**2 + (kurt - 3) ** 2 / 4)
    assert abs(row.jb_stat - jb) < 1e-2
    assert abs(row.p_value - math.exp(-row.jb_stat / 2)) < 1e-5


# ---------------------------------------------------------------------------
# stats_fdr_bh
# ---------------------------------------------------------------------------


def test_fdr_bh_matches_reference(spark, sf_dir):
    """The inlined erf polynomial must sit within its published 1.5e-7
    bound of math.erfc, and the BH adjustment must equal the standard
    step-up reference (numpy suffix-min of p*m/rank)."""
    rows = _load_all()["stats_fdr_bh"].builder(spark, sf_dir).collect()
    m = len(rows)
    assert m == 25
    for r in rows:
        exact_p = math.erfc(abs(r.z_stat) / math.sqrt(2))
        assert abs(r.p_value - exact_p) < 1e-3  # z rounded to 4dp upstream
    order = sorted(rows, key=lambda r: (r.p_value, r.nationkey))
    p = np.array([r.p_value for r in order])
    adj = np.minimum.accumulate((p * m / np.arange(1, m + 1))[::-1])[::-1]
    adj = np.minimum(adj, 1.0)
    for r, a in zip(order, adj):
        assert abs(r.p_bh - a) < 1e-4
        assert r.rejected == (1 if r.p_bh <= 0.10 else 0)
    # monotone: adjusted p never decreases with rank
    assert all(adj[i] <= adj[i + 1] + 1e-12 for i in range(m - 1))


# ---------------------------------------------------------------------------
# ts_hampel_outliers
# ---------------------------------------------------------------------------


def test_hampel_matches_pandas_rolling(spark, sf_dir):
    """Flags and ratios must match a pandas reference: centered 7-day
    rolling discrete median and MAD over the calendar-contiguous
    neighborhood (join semantics: only days PRESENT within +/-3
    calendar days; full windows only)."""
    pdf = _daily_cents(spark, sf_dir).set_index("d")["v"]
    idx = pdf.index
    rows = _load_all()["ts_hampel_outliers"].builder(spark, sf_dir).collect()
    assert len(rows) == 10

    def disc_median(vals):
        s = np.sort(np.asarray(vals))
        return int(s[(len(s) - 1) // 2])

    for r in rows:
        d = r.d
        nb = [
            int(pdf.loc[d + pd.Timedelta(days=k)])
            for k in range(-3, 4)
            if (d + pd.Timedelta(days=k)) in idx
        ]
        assert len(nb) == 7  # full-window rows only
        med = disc_median(nb)
        mad = disc_median([abs(x - med) for x in nb])
        assert r.med_cents == med and r.mad_cents == mad
        ratio = abs(int(pdf.loc[d]) - med) / (1.4826 * mad)
        assert abs(r.ratio - ratio) < 1e-3
        assert r.is_outlier == (1 if abs(int(pdf.loc[d]) - med) > 3 * 1.4826 * mad else 0)


# ---------------------------------------------------------------------------
# llm_epoch_allocation
# ---------------------------------------------------------------------------


def test_epoch_allocation_waterfilling_invariants(spark, sf_dir):
    """sum(alloc) must equal the budget EXACTLY (the property the
    rate-capped mixture op lacks); clamped sources sit at the 4-epoch
    cap; unclamped sources share one waterline (equal alloc); and the
    whole vector matches an independent iterative water-filling
    reference."""
    rows = _load_all()["llm_epoch_allocation"].builder(spark, sf_dir).collect()
    n = {r.source: r.n_tokens for r in rows}
    total = sum(n.values())
    budget = 3.5 * total
    assert abs(sum(r.alloc_tokens for r in rows) - budget) < 1.0
    # iterative reference: clamp, redistribute evenly, repeat
    clamped: set = set()
    while True:
        rem_m = len(n) - len(clamped)
        rem_b = budget - sum(4 * n[s] for s in clamped)
        newly = {
            s for s in n if s not in clamped and rem_b / rem_m > 4 * n[s] + 1e-9
        }
        if not newly:
            break
        clamped |= newly
    lam = rem_b / rem_m
    for r in rows:
        if r.clamped:
            assert r.source in clamped
            assert abs(r.epochs - 4.0) < 1e-6
            assert abs(r.alloc_tokens - 4 * n[r.source]) < 0.5
        else:
            assert r.source not in clamped
            assert abs(r.alloc_tokens - lam) < 0.5
            assert r.epochs <= 4.0 + 1e-9
    assert any(r.clamped for r in rows), "fixture should exercise the cap"
    assert any(not r.clamped for r in rows)


# ---------------------------------------------------------------------------
# llm_multimodal_ahash / llm_multimodal_ahash_dedup
# ---------------------------------------------------------------------------


def _np_ahash(v):
    n = len(v)
    cells = (np.arange(n, dtype=np.int64) * 64) // n
    s = np.zeros(64, dtype=np.int64)
    c = np.zeros(64, dtype=np.int64)
    np.add.at(s, cells, v)
    np.add.at(c, cells, 1)
    return ((s * c.sum()) > (s.sum() * c)).astype(np.int64)


def test_ahash_identical_blob_collides(spark, sf_dir):
    """Byte-identical blobs must produce byte-identical signatures,
    and each signature must match the independent numpy reference."""
    from spark_lineage_spark.tables import load

    sigs = {
        r.doc_id: (r.b0, r.b1, r.b2, r.b3)
        for r in _load_all()["llm_multimodal_ahash"].builder(spark, sf_dir).collect()
    }
    docs = load(spark, sf_dir, "documents").select("doc_id", "text").limit(20).collect()
    for d in docs:
        bits = _np_ahash(np.frombuffer(d.text.encode(), dtype=np.uint8).astype(np.int64))
        bands = tuple(
            int(sum(int(bits[b * 16 + i]) << i for i in range(16))) for b in range(4)
        )
        assert sigs[d.doc_id] == bands


def test_ahash_dedup_recovers_all_dimmed_twins(spark, sf_dir):
    """Completeness: every (doc, dimmed-doc) twin whose true hamming
    is <= 3 (verified by the numpy reference) must appear in the
    banded join's output — the pigeonhole guarantee, checked against
    brute force; and every reported pair keeps >= 1 intact band."""
    from spark_lineage_spark.tables import load

    docs = load(spark, sf_dir, "documents").select("doc_id", "text").collect()
    expect = set()
    for d in docs:
        v = np.frombuffer(d.text.encode(), dtype=np.uint8).astype(np.int64)
        h = int((_np_ahash(v) != _np_ahash((9 * v) // 10)).sum())
        if h <= 3:
            expect.add((d.doc_id, d.doc_id + 1_000_000))
    rows = _load_all()["llm_multimodal_ahash_dedup"].builder(spark, sf_dir).collect()
    got = {(r.doc_a, r.doc_b) for r in rows}
    assert expect <= got
    for r in rows:
        assert r.hamming <= 3
        assert r.n_shared_bands >= 1  # pigeonhole
    assert len(expect) > 0


# ---------------------------------------------------------------------------
# graph_label_propagation / ts_sessionize_gap_percentile /
# llm_reward_normalize (earlier round-10 queue, previously untested)
# ---------------------------------------------------------------------------


def test_label_propagation_histogram_covers_nodes(spark, sf_dir):
    """The community-size histogram must account for every node of the
    symmetric co-purchase graph exactly once, and three min-label
    rounds can never leave a label above its node id."""
    from spark_lineage_spark.operators.analytics import copurchase_edges

    e0 = copurchase_edges(spark, sf_dir)
    n_nodes = (
        e0.select(F.col("u").alias("n"))
        .unionAll(e0.select(F.col("v").alias("n")))
        .distinct()
        .count()
    )
    rows = _load_all()["graph_label_propagation"].builder(spark, sf_dir).collect()
    assert sum(r.community_size * r.n_communities for r in rows) == n_nodes


def test_sessionize_gap_percentile_bounds(spark, sf_dir):
    """Learned-threshold sessionization invariants: every user opens
    at least one session, sessions never exceed events, threshold is
    a positive gap actually observed in the data."""
    row = _load_all()["ts_sessionize_gap_percentile"].builder(spark, sf_dir).collect()[0]
    assert row.threshold_us > 0
    assert row.n_users <= row.n_sessions <= row.n_events
    assert row.events_per_session >= 1.0


def test_reward_normalize_group_moments(spark, sf_dir):
    """Per-group z-scores must have (near-)zero mean, and exactly one
    best-of-n winner per prompt group."""
    pdf = _load_all()["llm_reward_normalize"].builder(spark, sf_dir)
    pdf = pdf.toPandas()
    by_g = pdf.groupby("group_id")
    assert (by_g["is_best"].sum() == 1).all()
    assert (by_g["z_reward"].mean().abs() < 1e-3).all()


# ---------------------------------------------------------------------------
# stats_fisher_exact
# ---------------------------------------------------------------------------


def test_fisher_exact_matches_comb_reference(spark, sf_dir):
    """The log-factorial-spine tail must match the exact rational
    hypergeometric tail computed with math.comb (arbitrary-precision
    integers, no logs at all)."""
    from spark_lineage_spark.tables import load

    pdf = load(spark, sf_dir, "supplier").select("s_acctbal", "s_nationkey").toPandas()
    f1 = (pdf["s_acctbal"] < 0).astype(int)
    f2 = (pdf["s_nationkey"] < 5).astype(int)
    a = int((f1 & f2).sum())
    K = int(f1.sum())
    nn = int(f2.sum())
    N = len(pdf)
    denom = math.comb(N, nn)
    p_upper = sum(
        math.comb(K, k) * math.comb(N - K, nn - k) for k in range(a, min(K, nn) + 1)
    ) / denom
    p_point = math.comb(K, a) * math.comb(N - K, nn - a) / denom
    row = _load_all()["stats_fisher_exact"].builder(spark, sf_dir).collect()[0]
    assert row.n_both == a
    assert abs(row.p_upper - p_upper) < 1e-5
    assert abs(row.p_point - p_point) < 1e-5
    b, c, d = K - a, nn - a, N - K - nn + a
    assert abs(
        row.odds_ratio - (a + 0.5) * (d + 0.5) / ((b + 0.5) * (c + 0.5))
    ) < 1e-3


# ---------------------------------------------------------------------------
# fn_geo_haversine_battery
# ---------------------------------------------------------------------------


def test_haversine_matches_python_reference(spark, sf_dir):
    """Per-warehouse counts and average distances must match an
    independent python haversine over the same synthetic coordinates
    (math module trig, not Spark's)."""
    from collections import defaultdict

    from spark_lineage_spark.tables import load

    keys = [r.c_custkey for r in load(spark, sf_dir, "customer").select("c_custkey").collect()]
    wh = [(0, 40.71, -74.0), (1, 51.51, -0.13), (2, 35.68, 139.69)]

    def hav(lat1, lon1, lat2, lon2):
        rl1, rl2 = math.radians(lat1), math.radians(lat2)
        dlat = math.radians(lat2 - lat1)
        dlon = math.radians(lon2 - lon1)
        a = math.sin(dlat / 2) ** 2 + math.cos(rl1) * math.cos(rl2) * math.sin(dlon / 2) ** 2
        return 2 * 6371.0088 * math.asin(math.sqrt(a))

    counts = defaultdict(int)
    sums = defaultdict(float)
    for k in keys:
        lat = (k * 37 % 18000) / 100 - 90
        lon = (k * 73 % 36000) / 100 - 180
        wid, km = min(((w, hav(lat, lon, wl, wo)) for w, wl, wo in wh), key=lambda t: t[1])
        counts[wid] += 1
        sums[wid] += km
    rows = _load_all()["fn_geo_haversine_battery"].builder(spark, sf_dir).collect()
    assert sum(r.n_customers for r in rows) == len(keys)
    for r in rows:
        assert r.n_customers == counts[r.warehouse_id]
        assert abs(r.avg_km - sums[r.warehouse_id] / counts[r.warehouse_id]) < 1e-2
        assert 0 <= r.min_km <= r.avg_km <= r.max_km <= 20040  # half circumference


# ---------------------------------------------------------------------------
# llm_judge_agreement / llm_bradley_terry
# ---------------------------------------------------------------------------


def test_judge_agreement_matches_reference(spark, sf_dir):
    """Kappa must equal the definitional computation over
    independently recomputed flags (pandas medians, integer ppm
    ratio), and sit in [-1, 1]."""
    from spark_lineage_spark.tables import load

    pdf = load(spark, sf_dir, "documents").select("n_chars", "text").toPandas()
    toks = pdf["text"].str.split(" ")
    ratio_ppm = toks.apply(lambda t: len(set(t)) * 1_000_000 // len(t))
    med_c = int(np.sort(pdf["n_chars"])[(len(pdf) - 1) // 2])
    med_r = int(np.sort(ratio_ppm)[(len(ratio_ppm) - 1) // 2])
    ja = (pdf["n_chars"] > med_c).astype(int)
    jb = (ratio_ppm > med_r).astype(int)
    n = len(pdf)
    a = int((ja & jb).sum())
    b = int((ja & (1 - jb)).sum())
    c = int(((1 - ja) & jb).sum())
    d = n - a - b - c
    po = (a + d) / n
    pe = ((a + b) * (a + c) + (c + d) * (b + d)) / (n * n)
    kappa = (po - pe) / (1 - pe)
    row = _load_all()["llm_judge_agreement"].builder(spark, sf_dir).collect()[0]
    assert (row.both_good, row.only_a, row.only_b, row.both_bad) == (a, b, c, d)
    assert abs(row.kappa - kappa) < 1e-5
    assert -1 <= row.kappa <= 1


def test_bradley_terry_invariants(spark, sf_dir):
    """BT sanity: per-source wins sum to total games played once per
    game (sum(wins) == sum(games)/2), ratings are positive with mean
    ~1 (the normalization), and the MM fixpoint direction holds —
    the top-rated source beats the bottom-rated one in win rate
    against common opponents at least ordinally (spot check: ratings
    must not be constant)."""
    rows = _load_all()["llm_bradley_terry"].builder(spark, sf_dir).collect()
    assert len(rows) == 20
    total_games = sum(r.games for r in rows)
    total_wins = sum(r.wins for r in rows)
    assert total_wins * 2 == total_games  # every game appears twice in sym
    rats = [r.bt_rating for r in rows]
    assert all(x > 0 for x in rats)
    assert abs(sum(rats) / len(rats) - 1.0) < 1e-3
    assert max(rats) > min(rats)
    # BT must broadly agree with win rate (rank correlation positive)
    wr = [r.win_rate for r in rows]
    order_bt = np.argsort(rats)
    order_wr = np.argsort(wr)
    rank_bt = np.empty(len(rats)); rank_bt[order_bt] = np.arange(len(rats))
    rank_wr = np.empty(len(wr)); rank_wr[order_wr] = np.arange(len(wr))
    assert np.corrcoef(rank_bt, rank_wr)[0, 1] > 0.5


# ---------------------------------------------------------------------------
# stats_diff_in_diff / stats_cuped
# ---------------------------------------------------------------------------


def _cust_period_spend(spark, sf_dir):
    from spark_lineage_spark.tables import load

    o = load(spark, sf_dir, "orders").select("o_custkey", "o_orderdate", "o_totalprice")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .select(
            "o_custkey",
            (F.col("c_nationkey") < 5).alias("treated"),
            F.col("o_orderdate").cast("date").alias("d"),
            F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long").alias("cents"),
        )
        .toPandas()
    )


def test_did_matches_pandas_reference(spark, sf_dir):
    """Cell means and the DiD contrast must match a pandas groupby
    over the same per-customer period spend."""
    pdf = _cust_period_spend(spark, sf_dir)
    pdf["post"] = pdf["d"] >= pd.Timestamp("1997-01-01").date()
    per = pdf.groupby(["treated", "post", "o_custkey"])["cents"].sum().reset_index()
    cell = per.groupby(["treated", "post"])["cents"].mean()
    did = (cell[(True, True)] - cell[(True, False)]) - (
        cell[(False, True)] - cell[(False, False)]
    )
    row = _load_all()["stats_diff_in_diff"].builder(spark, sf_dir).collect()[0]
    assert abs(row.did_estimate - did / 100) < 0.05
    assert abs(row.treated_post_mean - cell[(True, True)] / 100) < 0.05
    counts = per.groupby(["treated", "post"])["o_custkey"].count()
    assert row.n_tp == counts[(True, True)] and row.n_cq == counts[(False, False)]


def test_cuped_matches_numpy_and_identity(spark, sf_dir):
    """theta must equal numpy cov/var over the same per-customer
    (pre, post) pairs, and the adjusted variance must satisfy the
    CUPED identity var_adj = var_y * (1 - rho^2)."""
    pdf = _cust_period_spend(spark, sf_dir)
    pdf["is98"] = pdf["d"] >= pd.Timestamp("1998-01-01").date()
    per = (
        pdf.assign(y=pdf["cents"].where(pdf["is98"], 0), x=pdf["cents"].where(~pdf["is98"], 0))
        .groupby(["o_custkey", "treated"])[["x", "y"]]
        .sum()
        .reset_index()
    )
    x = per["x"].to_numpy(dtype=float)
    y = per["y"].to_numpy(dtype=float)
    theta = np.cov(x, y, ddof=1)[0, 1] / np.var(x, ddof=1)
    var_y = np.var(y, ddof=1)
    rho2 = np.corrcoef(x, y)[0, 1] ** 2
    row = _load_all()["stats_cuped"].builder(spark, sf_dir).collect()[0]
    assert row.n_customers == len(per)
    assert abs(row.theta - theta) < 1e-4
    assert abs(row.var_y_dollars2 - var_y / 10000) < max(1.0, var_y / 1e8)
    assert abs(row.variance_reduction_pct - rho2 * 100) < 0.01
    assert 0 <= row.variance_reduction_pct < 100


# ---------------------------------------------------------------------------
# stats_kruskal_wallis
# ---------------------------------------------------------------------------


def test_kruskal_wallis_matches_rank_bruteforce(spark, sf_dir):
    """H (tie-corrected) must equal the textbook compute on pandas
    average ranks over the raw rows — the formulation the
    domain-collapsed doubled-rank identity replaces."""
    from spark_lineage_spark.tables import load

    li = load(spark, sf_dir, "lineitem").select("l_returnflag", "l_quantity").toPandas()
    li["q"] = li["l_quantity"].astype("int64")
    li["r"] = li["q"].rank(method="average")
    n = len(li)
    rs = li.groupby("l_returnflag")["r"].agg(["sum", "count"])
    h = 12.0 / (n * (n + 1)) * (rs["sum"] ** 2 / rs["count"]).sum() - 3 * (n + 1)
    _, t = np.unique(li["q"], return_counts=True)
    c = 1 - (t.astype("float64") ** 3 - t).sum() / (float(n) ** 3 - n)
    row = _load_all()["stats_kruskal_wallis"].builder(spark, sf_dir).collect()[0]
    assert row.n_flag_a + row.n_flag_n + row.n_flag_r == n
    # query output is rounded to 6 dp
    assert row.h_stat == pytest.approx(h, abs=1e-6)
    assert row.h_tie_adj == pytest.approx(h / c, abs=1e-6)
    assert row.p_chi2_2df == pytest.approx(math.exp(-(h / c) / 2), abs=1e-6)


# ---------------------------------------------------------------------------
# ts_cusum_drift
# ---------------------------------------------------------------------------


def test_cusum_matches_sequential_fold(spark, sf_dir):
    """The closed form (cumsum minus running min) must equal the
    sequential S_i = max(0, S_{i-1} + a_i) recursion it replaces —
    alarm-day counts exactly, extrema to rounding."""
    from spark_lineage_spark.tables import load

    od = load(spark, sf_dir, "orders").select("o_orderdate", "o_totalprice").toPandas()
    od["cents"] = (od["o_totalprice"] * 100).round().astype("int64")
    daily = od.groupby("o_orderdate")["cents"].sum().sort_index()
    daily.index = pd.to_datetime(daily.index)
    cutoff = pd.Timestamp("1996-01-01")
    calib = daily[daily.index < cutoff]
    mu, sd = calib.mean(), calib.std(ddof=1)
    z = (daily[daily.index >= cutoff] - mu) / sd
    s_up = s_dn = 0.0
    ups = dns = 0
    max_up = max_dn = 0.0
    for zi in z:
        s_up = max(0.0, s_up + zi - 0.5)
        s_dn = max(0.0, s_dn - zi - 0.5)
        ups += s_up > 5
        dns += s_dn > 5
        max_up, max_dn = max(max_up, s_up), max(max_dn, s_dn)
    row = _load_all()["ts_cusum_drift"].builder(spark, sf_dir).collect()[0]
    assert (row.n_up_alarm_days, row.n_dn_alarm_days) == (ups, dns)
    assert row.max_s_up == pytest.approx(max_up, abs=1e-3)
    assert row.max_s_dn == pytest.approx(max_dn, abs=1e-3)


# ---------------------------------------------------------------------------
# stats_herfindahl
# ---------------------------------------------------------------------------


def test_herfindahl_matches_pandas_reference(spark, sf_dir):
    """HHI per region from a pandas groupby over the same floored
    dollars; bounds 1/n <= HHI <= 1 and effective_n = 1/HHI."""
    from spark_lineage_spark.tables import load

    li = load(spark, sf_dir, "lineitem").select(
        "l_suppkey",
        F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("d"),
    ).toPandas()
    sup = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey").toPandas()
    nat = load(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey").toPandas()
    reg = load(spark, sf_dir, "region").select("r_regionkey", "r_name").toPandas()
    j = (
        li.merge(sup, left_on="l_suppkey", right_on="s_suppkey")
        .merge(nat, left_on="s_nationkey", right_on="n_nationkey")
        .merge(reg, left_on="n_regionkey", right_on="r_regionkey")
    )
    by_supp = j.groupby(["r_name", "l_suppkey"])["d"].sum()
    rows = _load_all()["stats_herfindahl"].builder(spark, sf_dir).collect()
    for r in rows:
        d = by_supp.xs(r.region, level="r_name").astype("float64")
        hhi = float((d**2).sum() / d.sum() ** 2)
        assert 1.0 / r.n_suppliers <= r.hhi <= 1.0
        assert r.hhi == pytest.approx(hhi, abs=1e-8)  # query rounds to 8 dp
        assert r.effective_suppliers == pytest.approx(1.0 / hhi, abs=1e-4)
        if r.n_suppliers == 1:
            assert r.hhi_normalized is None  # undefined at n=1 (guarded NULL)
        else:
            assert r.hhi_normalized == pytest.approx(
                (hhi - 1.0 / r.n_suppliers) / (1 - 1.0 / r.n_suppliers), abs=1e-8
            )


# ---------------------------------------------------------------------------
# stats_isotonic_minimax
# ---------------------------------------------------------------------------


def _pava(y, w):
    """Weighted PAVA (nondecreasing), the sequential-stack reference
    for the minimax closed form."""
    blocks = []  # (sum_wy, sum_w)
    for yi, wi in zip(y, w):
        blocks.append([yi * wi, wi])
        while len(blocks) > 1 and (
            blocks[-2][0] / blocks[-2][1] > blocks[-1][0] / blocks[-1][1]
        ):
            b = blocks.pop()
            blocks[-1][0] += b[0]
            blocks[-1][1] += b[1]
    fits, i = [], 0
    for swy, sw in blocks:
        mean = swy / sw
        acc = 0
        while acc < sw:
            acc += w[i]
            fits.append(mean)
            i += 1
    return fits


def test_isotonic_matches_pava(spark, sf_dir):
    """The minimax fit must equal sequential weighted PAVA, and be
    nondecreasing in quantity."""
    rows = sorted(
        _load_all()["stats_isotonic_minimax"].builder(spark, sf_dir).collect(),
        key=lambda r: r.quantity,
    )
    y = [r.raw_mean_ppm for r in rows]
    w = [r.n_rows for r in rows]
    # reference on the rounded raw means: rounding at 1e-4 ppm shifts
    # block means by < 1e-4, far under the 1e-3 comparison tolerance
    ref = _pava(y, w)
    fits = [r.iso_fit_ppm for r in rows]
    assert all(b >= a - 1e-9 for a, b in zip(fits, fits[1:]))
    for got, want in zip(fits, ref):
        assert got == pytest.approx(want, abs=1e-3)


# ---------------------------------------------------------------------------
# graph_hits
# ---------------------------------------------------------------------------


def test_hits_integer_scores_track_double_reference(spark, sf_dir):
    """The integer-exact scores must track a float64 HITS (same 1.5
    rounds, L1 norms) within the documented ~1e-8-per-unit truncation
    envelope, and the returned list must be sorted by score."""
    bip = _bipartite(spark, sf_dir)
    a1 = bip.groupby("p").size().astype("float64")
    a1 /= a1.sum()
    h1 = bip.merge(a1.rename("a"), left_on="p", right_index=True).groupby("c")["a"].sum()
    h1 /= h1.sum()
    a2 = bip.merge(h1.rename("h"), left_on="c", right_index=True).groupby("p")["h"].sum()
    a2 /= a2.sum()
    rows = _load_all()["graph_hits"].builder(spark, sf_dir).collect()
    assert rows == sorted(rows, key=lambda r: (-r.authority_scaled, r.partkey))
    total = 100_000_000
    got_mass = sum(r.authority_scaled for r in rows)
    for r in rows:
        assert r.authority_scaled / got_mass == pytest.approx(
            a2[r.partkey] / a2[a2.index.isin([x.partkey for x in rows])].sum(),
            rel=5e-4,
        )
    assert got_mass <= total


# ---------------------------------------------------------------------------
# llm_mmr_diverse_topk / setop_union_by_name
# ---------------------------------------------------------------------------


def test_mmr_matches_python_greedy(spark, sf_dir):
    """The unrolled rounds must equal a straightforward python greedy
    MMR over the same candidate pool, and diversity must bind: the
    MMR list must diverge from pure relevance order at some pick
    whenever any candidate pair is similar enough."""
    from spark_lineage_spark.tables import load

    pdf = load(spark, sf_dir, "embeddings").toPandas()
    embs = {int(r.vec_id): np.asarray(r.embedding, dtype="float64") for r in pdf.itertuples()}

    def cos(a, b):
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))

    q = embs[0]
    rel = {v: cos(e, q) for v, e in embs.items() if v != 0}
    pool = sorted(rel, key=lambda v: (-rel[v], v))[:25]
    sel = [max(pool, key=lambda v: (rel[v], -v))]
    while len(sel) < 5:
        rest = [v for v in pool if v not in sel]
        mmr = {v: 0.7 * rel[v] - 0.3 * max(cos(embs[v], embs[s]) for s in sel) for v in rest}
        sel.append(max(rest, key=lambda v: (mmr[v], -v)))
    rows = sorted(
        _load_all()["llm_mmr_diverse_topk"].builder(spark, sf_dir).collect(),
        key=lambda r: r.pick_rank,
    )
    assert [r.vec_id for r in rows] == sel
    for r in rows:
        assert r.rel == pytest.approx(rel[r.vec_id], abs=1e-6)


def test_union_by_name_alignment(spark, sf_dir):
    """Cross-filled NULLs land in the right columns: every click row
    has a value and no channel, every purchase row the reverse; row
    count is the sum of the two sides."""
    from spark_lineage_spark.tables import load

    ev = load(spark, sf_dir, "events")
    n_click = ev.filter(F.col("event_type") == "click").count()
    n_purch = ev.filter(F.col("event_type") == "purchase").count()
    out = _load_all()["setop_union_by_name"].builder(spark, sf_dir)
    assert set(out.columns) == {"src", "event_id", "user_id", "value", "channel"}
    agg = out.groupBy("src").agg(
        F.count(F.lit(1)).alias("n"),
        F.count("value").alias("nv"),
        F.count("channel").alias("nc"),
    ).collect()
    by = {r.src: r for r in agg}
    assert (by["click"].n, by["click"].nv, by["click"].nc) == (n_click, n_click, 0)
    assert (by["purchase"].n, by["purchase"].nv, by["purchase"].nc) == (n_purch, 0, n_purch)


# ---------------------------------------------------------------------------
# llm_retrieval_ndcg / ts_cross_correlation / pandas_api_pivot_table
# ---------------------------------------------------------------------------


def test_retrieval_ndcg_matches_numpy_reference(spark, sf_dir):
    """Recall@5 and NDCG@5 recomputed from scratch with numpy rankings
    (full-dim exact vs 16-dim truncation); NDCG in (0, 1]."""
    from spark_lineage_spark.tables import load

    pdf = load(spark, sf_dir, "embeddings").toPandas()
    embs = {int(r.vec_id): np.asarray(r.embedding, dtype="float64") for r in pdf.itertuples()}

    def cos(a, b):
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))

    rows = _load_all()["llm_retrieval_ndcg"].builder(spark, sf_dir).collect()
    assert len(rows) == 10
    cands = [v for v in embs if v >= 10]
    for r in rows:
        q = embs[r.query_id]
        exact = sorted(cands, key=lambda v: (-cos(embs[v], q), v))
        trunc = sorted(cands, key=lambda v: (-cos(embs[v][:16], q[:16]), v))
        top_e, top_t = exact[:5], trunc[:5]
        recall = len(set(top_e) & set(top_t)) / 5.0
        dcg = sum(max(cos(embs[v], q), 0) / math.log2(i + 2) for i, v in enumerate(top_t))
        idcg = sum(max(cos(embs[v], q), 0) / math.log2(i + 2) for i, v in enumerate(top_e))
        assert r.recall_at_k == pytest.approx(recall, abs=1e-9)
        assert r.ndcg_at_k == pytest.approx(dcg / idcg, abs=1e-5)
        assert 0 < r.ndcg_at_k <= 1.0 + 1e-9


def test_cross_correlation_matches_pandas(spark, sf_dir):
    """Each lag's r must equal pandas .corr() over the same aligned
    cent-exact day pairs; lag 0 n equals the day count."""
    from spark_lineage_spark.tables import load

    ev = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("purchase", "view"))
        .select(
            F.col("ts").cast("date").alias("d"),
            F.round(F.col("value") * 100).cast("long").alias("vu"),
            "event_type",
        )
        .toPandas()
    )
    daily = ev.pivot_table(index="d", columns="event_type", values="vu", aggfunc="sum", fill_value=0)
    rows = {r.lag: r for r in _load_all()["ts_cross_correlation"].builder(spark, sf_dir).collect()}
    assert set(rows) == set(range(-3, 4))
    x = daily["purchase"]
    y = daily["view"]
    idx = pd.to_datetime(pd.Series(daily.index))
    for lag, r in rows.items():
        shifted = pd.Series(
            y.values, index=idx + pd.Timedelta(days=-lag)
        )  # y at d+lag aligns to a.d
        both = pd.DataFrame({"x": pd.Series(x.values, index=idx)}).join(
            shifted.rename("y"), how="inner"
        )
        assert r.n == len(both)
        assert r.ccf == pytest.approx(both["x"].corr(both["y"]), abs=1e-5)


def test_pivot_table_matches_pandas(spark, sf_dir):
    """The pyspark.pandas pivot must equal plain-pandas pivot_table on
    the same cent-exact base (cell-for-cell, fill_value=0)."""
    from spark_lineage_spark.tables import load

    base = (
        load(spark, sf_dir, "orders")
        .select(
            "o_orderstatus",
            "o_orderpriority",
            F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        )
        .toPandas()
    )
    want = base.pivot_table(
        index="o_orderstatus", columns="o_orderpriority", values="cents",
        aggfunc="sum", fill_value=0,
    )
    rows = _load_all()["pandas_api_pivot_table"].builder(spark, sf_dir).collect()
    colmap = {
        "p1_urgent": "1-URGENT", "p2_high": "2-HIGH", "p3_medium": "3-MEDIUM",
        "p4_notspec": "4-NOT SPECIFIED", "p5_low": "5-LOW",
    }
    assert len(rows) == len(want)
    for r in rows:
        for attr, col in colmap.items():
            want_v = int(want.loc[r.o_orderstatus, col]) if col in want.columns else 0
            assert getattr(r, attr) == want_v


# ---------------------------------------------------------------------------
# llm_dedup_set_containment / llm_judge_mcnemar / profile_key_skew
# ---------------------------------------------------------------------------


def _shingle_sets(spark, sf_dir):
    from spark_lineage_spark.tables import load

    docs = load(spark, sf_dir, "documents").select("doc_id", "text").toPandas()
    out = {}
    for r in docs.itertuples():
        ws = r.text.split(" ")
        out[int(r.doc_id)] = {
            " ".join(ws[i : i + 3]) for i in range(len(ws) - 2)
        }
    return out

def test_set_containment_matches_bruteforce(spark, sf_dir):
    """Every reported pair's directional scores must match the
    brute-force set computation, and the report must be COMPLETE:
    every pair with either direction >= 0.6 appears."""
    sets = _shingle_sets(spark, sf_dir)
    want = {}
    ids = sorted(sets)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(sets[a] & sets[b])
            if inter and (inter / len(sets[a]) >= 0.6 or inter / len(sets[b]) >= 0.6):
                want[(a, b)] = (inter / len(sets[a]), inter / len(sets[b]))
    rows = _load_all()["llm_dedup_set_containment"].builder(spark, sf_dir).collect()
    got = {(r.da, r.db): (r.cont_a_in_b, r.cont_b_in_a) for r in rows}
    assert set(got) == set(want)
    for k, (ca, cb) in want.items():
        assert got[k][0] == pytest.approx(ca, abs=1e-6)
        assert got[k][1] == pytest.approx(cb, abs=1e-6)


def test_mcnemar_matches_erfc_reference(spark, sf_dir):
    """b/c recomputed from the same judge definitions; the statistic
    and the A-S-polynomial p-value must match math-library erfc within
    the polynomial's 1.5e-7 published bound."""
    from spark_lineage_spark.tables import load

    docs = load(spark, sf_dir, "documents").select("n_chars", "text").toPandas()
    ws = docs["text"].str.split(" ")
    ratio = (ws.map(lambda t: len(set(t))) * 1_000_000 // ws.map(len)).astype("int64")
    chars = docs["n_chars"].astype("int64")

    def disc_med(s):
        v = np.sort(s.to_numpy())
        return int(v[(len(v) - 1) // 2])

    ja = (chars > disc_med(chars)).astype(int)
    jb = (ratio > disc_med(ratio)).astype(int)
    b = int(((ja == 1) & (jb == 0)).sum())
    c = int(((ja == 0) & (jb == 1)).sum())
    stat = 0.0 if b + c == 0 else max(abs(b - c) - 1, 0) ** 2 / (b + c)
    row = _load_all()["llm_judge_mcnemar"].builder(spark, sf_dir).collect()[0]
    assert (row.only_a_good, row.only_b_good) == (b, c)
    assert row.mcnemar_cc == pytest.approx(stat, abs=1e-6)
    assert row.p_value == pytest.approx(math.erfc(math.sqrt(stat) / math.sqrt(2)), abs=2e-6)


def test_key_skew_matches_pandas_order_stats(spark, sf_dir):
    """Order statistics under the pinned ceil(p*n) convention, hot-key
    share, and ratios recomputed with pandas/numpy."""
    from spark_lineage_spark.tables import load

    c = (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_partkey")
        .count()
        .toPandas()["count"]
        .to_numpy()
    )
    srt = np.sort(c)
    n = len(c)

    def disc(p):
        return int(srt[math.ceil(p * n) - 1])

    row = _load_all()["profile_key_skew"].builder(spark, sf_dir).collect()[0]
    assert row.n_keys == n and row.total == int(c.sum()) and row.max_c == int(c.max())
    assert (row.p50, row.p90, row.p99) == (disc(0.5), disc(0.9), disc(0.99))
    assert row.top1_share_ppm == int(c.max() * 1_000_000 // c.sum())
    assert row.p99_over_p50 == pytest.approx(disc(0.99) / disc(0.5), abs=1e-4)
    assert row.max_over_mean == pytest.approx(c.max() * n / c.sum(), abs=1e-4)


def test_effect_size_matches_numpy(spark, sf_dir):
    """d/g/CI recomputed with numpy on the same micro-quantized
    values; the Hedges correction shrinks toward zero."""
    from spark_lineage_spark.tables import load

    ev = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("click", "view"))
        .select("event_type", F.round(F.col("value") * 1_000_000).cast("long").alias("v"))
        .toPandas()
    )
    a = ev.loc[ev.event_type == "click", "v"].to_numpy(dtype=float)
    b = ev.loc[ev.event_type == "view", "v"].to_numpy(dtype=float)
    n1, n2 = len(a), len(b)
    sp = math.sqrt(((a - a.mean()) ** 2).sum() / (n1 + n2 - 2) + ((b - b.mean()) ** 2).sum() / (n1 + n2 - 2))
    d = (a.mean() - b.mean()) / sp
    j = 1 - 3 / (4 * (n1 + n2 - 2) - 1)
    se = math.sqrt((n1 + n2) / (n1 * n2) + d * d / (2 * (n1 + n2)))
    row = _load_all()["stats_effect_size"].builder(spark, sf_dir).collect()[0]
    assert (row.n_click, row.n_view) == (n1, n2)
    assert row.cohens_d == pytest.approx(d, abs=1e-6)
    assert row.hedges_g == pytest.approx(j * d, abs=1e-6)
    assert abs(row.hedges_g) <= abs(row.cohens_d)
    assert row.d_ci_lo == pytest.approx(d - 1.959963984540054 * se, abs=1e-5)
    assert row.d_ci_hi == pytest.approx(d + 1.959963984540054 * se, abs=1e-5)


def test_power_mde_matches_reference(spark, sf_dir):
    """MDE and required-n recomputed from the textbook closed forms on
    pandas counts; required n must actually deliver the MDE: plugging
    n_req back in gives MDE <= the 10% target (+1 ceil slack)."""
    from spark_lineage_spark.tables import load

    od = load(spark, sf_dir, "orders").select("o_custkey", "o_orderpriority").toPandas()
    cu = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey").toPandas()
    j = od.merge(cu, left_on="o_custkey", right_on="c_custkey")
    za, zb = 1.959963984540054, 0.8416212335729143
    rows = _load_all()["stats_power_mde"].builder(spark, sf_dir).collect()
    g = j.groupby("c_nationkey")["o_orderpriority"]
    n_by = g.size()
    k_by = g.apply(lambda s: int((s == "1-URGENT").sum()))
    assert len(rows) == len(n_by)
    for r in rows:
        n, k = int(n_by[r.nationkey]), int(k_by[r.nationkey])
        assert (r.n, r.k) == (n, k)
        p = k / n
        mde = (za + zb) * math.sqrt(2 * p * (1 - p) / (n / 2))
        assert r.mde_abs == pytest.approx(mde, abs=1e-6)
        assert r.mde_rel == pytest.approx(mde / p, abs=1e-6)
        n_req = math.ceil(2 * p * (1 - p) * ((za + zb) / (0.1 * p)) ** 2)
        assert r.n_per_arm_for_10pct_lift == n_req
        # inverse consistency: at n_req per arm the detectable lift is
        # within the 10% relative target
        got = (za + zb) * math.sqrt(2 * p * (1 - p) / n_req) / p
        assert got <= 0.1 + 1e-3


def test_bayes_ab_matches_math_reference(spark, sf_dir):
    """Posterior moments and P(B>A) recomputed with math.erf on the
    same exact counts; the probability must be consistent with the
    z sign and live in (0,1)."""
    from spark_lineage_spark.tables import load

    od = load(spark, sf_dir, "orders").select("o_custkey", "o_orderpriority").toPandas()
    arm = (od["o_custkey"] % 2).to_numpy()
    urgent = (od["o_orderpriority"] == "1-URGENT").to_numpy()
    stats = {}
    for a in (0, 1):
        n = int((arm == a).sum())
        k = int((urgent & (arm == a)).sum())
        mu = (1 + k) / (2 + n)
        var = (1 + k) * (1 + n - k) / ((2 + n) ** 2 * (3 + n))
        stats[a] = (n, k, mu, var)
    z = (stats[1][2] - stats[0][2]) / math.sqrt(stats[0][3] + stats[1][3])
    p = 0.5 * (1 + math.erf(z / math.sqrt(2)))
    row = _load_all()["stats_bayes_ab"].builder(spark, sf_dir).collect()[0]
    assert (row.n_arm_a, row.k_arm_a) == stats[0][:2]
    assert (row.n_arm_b, row.k_arm_b) == stats[1][:2]
    assert row.posterior_mean_a == pytest.approx(stats[0][2], abs=1e-6)
    assert row.posterior_mean_b == pytest.approx(stats[1][2], abs=1e-6)
    assert row.z_stat == pytest.approx(z, abs=1e-6)
    assert row.p_b_beats_a == pytest.approx(p, abs=2e-6)  # A-S poly bound
    assert 0 < row.p_b_beats_a < 1
    assert (row.p_b_beats_a > 0.5) == (z > 0)


def test_lin_ccc_matches_numpy(spark, sf_dir):
    """CCC, r, and C_b recomputed with numpy population moments; the
    CCC <= |r| inequality must hold."""
    from spark_lineage_spark.tables import load

    pdf = load(spark, sf_dir, "documents").select("n_chars", "text").toPandas()
    x = pdf["n_chars"].to_numpy(dtype=float)
    y = 6.0 * (pdf["text"].str.count(" ").to_numpy(dtype=float) + 1)
    vx, vy = x.var(), y.var()
    cxy = ((x - x.mean()) * (y - y.mean())).mean()
    r = cxy / math.sqrt(vx * vy)
    ccc = 2 * cxy / (vx + vy + (x.mean() - y.mean()) ** 2)
    row = _load_all()["stats_lin_ccc"].builder(spark, sf_dir).collect()[0]
    assert row.n_docs == len(x)
    assert row.pearson_r == pytest.approx(r, abs=1e-6)
    assert row.lin_ccc == pytest.approx(ccc, abs=1e-6)
    assert row.bias_correction_cb == pytest.approx(ccc / r, abs=1e-5)
    assert abs(row.lin_ccc) <= abs(row.pearson_r) + 1e-9


def test_embedding_norm_outliers_fixture_and_planted(spark, sf_dir, tmp_path):
    """On the (unit-normalized) fixture: zero variance must mean zero
    outliers, not a crash.  On a synthetic table with planted
    scaled/zero vectors, the flags must match a numpy reference."""
    row = _load_all()["llm_embedding_norm_outliers"].builder(spark, sf_dir).collect()[0]
    assert row.n_outliers_3sd == 0 and row.n_zero_vectors == 0
    assert row.mean_norm == pytest.approx(1.0, abs=1e-4)

    # planted: 60 unit-ish vectors, one double-scaled, one zero
    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(62, 8)).astype("float32")
    vecs[:60] /= np.linalg.norm(vecs[:60], axis=1, keepdims=True)
    vecs[:60] *= rng.uniform(0.9, 1.1, size=(60, 1)).astype("float32")
    vecs[60] *= 50.0
    vecs[61] = 0.0
    pdf = pd.DataFrame(
        {"vec_id": range(62), "embedding": list(map(list, vecs)), "label": 0}
    )
    out = str(tmp_path / "synth")
    spark.createDataFrame(pdf).write.parquet(out + "/embeddings.parquet")
    got = _load_all()["llm_embedding_norm_outliers"].builder(spark, out).collect()[0]
    nu = np.round(np.sqrt((vecs.astype("float64") ** 2).sum(axis=1)) * 1e6)
    sd2 = nu.var(ddof=1)
    dev = nu - nu.mean()
    want_out = int(((sd2 > 0) & (np.abs(dev) > 3 * np.sqrt(sd2))).sum())
    assert got.n_vectors == 62
    assert got.n_zero_vectors == 1
    assert got.n_outliers_3sd == want_out >= 1


def test_source_overlap_matches_bruteforce(spark, sf_dir):
    """Top-20 source-pair overlaps recomputed brute-force from python
    shingle sets grouped by source."""
    from spark_lineage_spark.tables import load

    docs = load(spark, sf_dir, "documents").select("source", "text").toPandas()
    by_src = {}
    for r in docs.itertuples():
        ws = r.text.split(" ")
        by_src.setdefault(r.source, set()).update(
            " ".join(ws[i : i + 3]) for i in range(len(ws) - 2)
        )
    pairs = []
    srcs = sorted(by_src)
    for i, a in enumerate(srcs):
        for b in srcs[i + 1 :]:
            c = len(by_src[a] & by_src[b])
            if c:
                pairs.append((a, b, c))
    pairs.sort(key=lambda t: (-t[2], t[0], t[1]))
    rows = _load_all()["llm_source_overlap_matrix"].builder(spark, sf_dir).collect()
    assert len(rows) == min(20, len(pairs))
    for row, (a, b, c) in zip(rows, pairs[:20]):
        assert (row.sa, row.sb, row.shared_shingles) == (a, b, c)
        na, nb = len(by_src[a]), len(by_src[b])
        assert row.jaccard == pytest.approx(c / (na + nb - c), abs=1e-6)
        assert row.max_containment == pytest.approx(max(c / na, c / nb), abs=1e-6)


def test_cochran_armitage_matches_textbook(spark, sf_dir):
    """z and p recomputed with the textbook formulas on pandas counts;
    p must equal erfc(|z|/sqrt(2)) within the polynomial bound."""
    from spark_lineage_spark.tables import load

    od = load(spark, sf_dir, "orders").select("o_orderpriority", "o_orderstatus").toPandas()
    od["s"] = od["o_orderpriority"].str[0].astype(int)
    od["f"] = (od["o_orderstatus"] == "F").astype(int)
    g = od.groupby("s").agg(n=("f", "size"), r=("f", "sum"))
    N, R = int(g["n"].sum()), int(g["r"].sum())
    pbar = R / N
    sn = (g.index * g["n"]).sum()
    sr = (g.index * g["r"]).sum()
    ssn = (g.index**2 * g["n"]).sum()
    z = (sr - pbar * sn) / math.sqrt(pbar * (1 - pbar) * (ssn - sn**2 / N))
    row = _load_all()["stats_cochran_armitage"].builder(spark, sf_dir).collect()[0]
    assert (row.n_orders, row.n_f_status) == (N, R)
    assert row.z_trend == pytest.approx(z, abs=1e-6)
    assert row.p_two_sided == pytest.approx(math.erfc(abs(z) / math.sqrt(2)), abs=2e-6)


def test_agg_pushdown_values_and_conf_restore(spark, sf_dir):
    """The pushed aggregate must equal the full-scan values, and the
    builder must leave both confs exactly as it found them."""
    from spark_lineage_spark.tables import load

    before = (
        spark.conf.get("spark.sql.sources.useV1SourceList"),
        spark.conf.get("spark.sql.parquet.aggregatePushdown", "false"),
    )
    row = _load_all()["scan_parquet_agg_pushdown"].builder(spark, sf_dir).collect()[0]
    after = (
        spark.conf.get("spark.sql.sources.useV1SourceList"),
        spark.conf.get("spark.sql.parquet.aggregatePushdown", "false"),
    )
    assert before == after
    od = load(spark, sf_dir, "orders")
    want = od.agg(
        F.count(F.lit(1)), F.min("o_totalprice"), F.max("o_totalprice")
    ).collect()[0]
    assert row.n_orders == want[0]
    assert row.min_price_cents == round(want[1] * 100)
    assert row.max_price_cents == round(want[2] * 100)


def test_capture_recapture_matches_sets(spark, sf_dir):
    """na/nb/c/truth recomputed from python shingle sets; the Chapman
    estimate must obey its closed form and land within 2x of truth on
    this fixture (the halves overlap heavily by construction)."""
    sets = _shingle_sets(spark, sf_dir)
    from spark_lineage_spark.tables import load

    src = dict(
        load(spark, sf_dir, "documents").select("doc_id", "source").toPandas().values
    )
    a, b = set(), set()
    for doc, sh in sets.items():
        (a if src[doc] < "src5" else b).update(sh)
    row = _load_all()["llm_capture_recapture"].builder(spark, sf_dir).collect()[0]
    assert (row.n_sample_a, row.n_sample_b) == (len(a), len(b))
    assert row.n_recaptured == len(a & b)
    assert row.true_total == len(a | b)
    est = (len(a) + 1) * (len(b) + 1) / (len(a & b) + 1) - 1
    assert row.chapman_estimate == math.floor(est)
    assert row.estimate_over_truth == pytest.approx(est / len(a | b), abs=1e-4)
    assert 0.5 < row.estimate_over_truth < 2.0


def test_wilcoxon_matches_rank_bruteforce(spark, sf_dir):
    """W+, z, p recomputed with pandas average ranks over the same
    day-paired cent differences (zeros dropped, tie-corrected)."""
    from spark_lineage_spark.tables import load

    ev = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("purchase", "view"))
        .select(
            F.col("ts").cast("date").alias("d"),
            F.round(F.col("value") * 100).cast("long").alias("vu"),
            "event_type",
        )
        .toPandas()
    )
    daily = ev.pivot_table(
        index="d", columns="event_type", values="vu", aggfunc="sum", fill_value=0
    )
    dd = (daily["purchase"] - daily["view"]).to_numpy()
    dd = dd[dd != 0]
    n = len(dd)
    r = pd.Series(np.abs(dd)).rank(method="average").to_numpy()
    w_plus = r[dd > 0].sum()
    _, t = np.unique(np.abs(dd), return_counts=True)
    var = n * (n + 1) * (2 * n + 1) / 24 - (t.astype(float) ** 3 - t).sum() / 48
    z = (w_plus - n * (n + 1) / 4) / math.sqrt(var)
    row = _load_all()["stats_wilcoxon_signed_rank"].builder(spark, sf_dir).collect()[0]
    assert row.n_pairs == n
    assert row.w_plus == pytest.approx(w_plus, abs=0.1)
    assert row.z_stat == pytest.approx(z, abs=1e-6)
    assert row.p_two_sided == pytest.approx(math.erfc(abs(z) / math.sqrt(2)), abs=2e-6)


def test_var_cvar_matches_numpy(spark, sf_dir):
    """VaR = the ceil(0.05 n)-th smallest daily total, CVaR = the exact
    mean of those k days, recomputed by sorting."""
    pdf = _daily_cents(spark, sf_dir)
    v = np.sort(pdf["v"].to_numpy())
    n = len(v)
    k = math.ceil(0.05 * n)
    row = _load_all()["ts_var_cvar"].builder(spark, sf_dir).collect()[0]
    assert (row.n_days, row.k_worst) == (n, k)
    assert row.var95_cents == int(v[k - 1])
    assert row.cvar95_cents == pytest.approx(v[:k].mean(), abs=0.01)
    assert row.cvar95_cents <= row.var95_cents


def test_vocab_growth_matches_prefix_sets(spark, sf_dir):
    """Cumulative vocabulary at each decile must equal python running
    sets over docs in doc_id order, and be nondecreasing with the last
    point equal to the total distinct shingle count."""
    sets = _shingle_sets(spark, sf_dir)
    span = max(sets) + 1
    rows = sorted(
        _load_all()["llm_vocab_growth_curve"].builder(spark, sf_dir).collect(),
        key=lambda r: r.bucket,
    )
    seen = set()
    want = {}
    for doc in sorted(sets):
        seen |= sets[doc]
        want[int(doc * 10.0 / span)] = len(seen)
    # want[b] currently holds vocab after the LAST doc of bucket b
    cum = 0
    for r in rows:
        assert r.cumulative_vocab == want[r.bucket]
        cum += r.new_vocab
        assert r.cumulative_vocab == cum
    assert rows[-1].cumulative_vocab == len(set().union(*sets.values()))
