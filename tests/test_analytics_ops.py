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
    # (linear blend of the two nearest observations); neighbors are
    # taken WITHIN the user's group so a boundary row never compares
    # against another user's series (ADVICE r5)
    for _, grp in pdf.groupby("user_id"):
        grp = grp.sort_values("d").reset_index(drop=True)
        for i, row in grp[grp.kind == "interp"].iterrows():
            lo = grp.v_filled[max(0, i - 1)]
            hi = grp.v_filled[min(len(grp) - 1, i + 1)]
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


def test_scd2_intervals_tile_and_match_pandas(spark):
    from spark_lineage_spark.operators.analytics import cdc_scd2_build

    pdf = cdc_scd2_build(spark, SF).toPandas()
    ev = pd.read_parquet(f"{SF}/events.parquet").sort_values(
        ["user_id", "ts", "event_id"]
    )
    for uid, grp in ev.groupby("user_id"):
        runs = (grp.event_type != grp.event_type.shift(1)).cumsum()
        exp = grp.groupby(runs).agg(
            seg=("event_type", "first"), valid_from=("ts", "first"),
            n_events=("event_type", "size"),
        )
        got = pdf[pdf.user_id == uid].sort_values("valid_from").reset_index(drop=True)
        assert len(got) == len(exp)
        assert list(got.seg) == list(exp.seg)
        assert list(got.n_events) == list(exp.n_events)
        # intervals tile: each valid_to equals the next valid_from
        assert (
            got.valid_to.iloc[:-1].to_numpy() == got.valid_from.iloc[1:].to_numpy()
        ).all()
        assert got.is_current.iloc[:-1].eq(0).all() and got.is_current.iloc[-1] == 1


def test_twap_matches_pandas(spark):
    from spark_lineage_spark.operators.analytics import ts_twap

    got = {r.user_id: r for r in ts_twap(spark, SF).collect()}
    ev = pd.read_parquet(f"{SF}/events.parquet").dropna(subset=["value"])
    ev = ev.sort_values(["user_id", "ts", "event_id"])
    for uid, grp in ev.groupby("user_id"):
        dt = (grp.ts.shift(-1) - grp.ts).dt.total_seconds() * 1e6
        mask = dt.notna() & (dt > 0)
        twap = (grp.value[mask] * dt[mask]).sum() / dt[mask].sum()
        assert got[uid].twap == pytest.approx(twap, abs=1e-4)
        assert got[uid].n_steps == int(mask.sum())


def test_chi_square_matches_numpy(spark):
    from spark_lineage_spark.operators.analytics import stats_chi_square

    row = stats_chi_square(spark, SF).collect()[0]
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ct = pd.crosstab(ev.event_type, ev.ts.dt.dayofweek)
    o = ct.to_numpy().astype(float)
    e = np.outer(o.sum(axis=1), o.sum(axis=0)) / o.sum()
    chi2 = ((o - e) ** 2 / e).sum()
    assert float(row.chi2) == pytest.approx(chi2, abs=1e-2)
    # n_cells counts the COMPLETE |types| x |weekdays| grid (zero
    # cells included — they contribute rt*ct/n to the statistic)
    assert row.n_cells == o.size
    assert row.dof == (o.shape[0] - 1) * (o.shape[1] - 1)


def test_attribution_matches_pandas(spark):
    from spark_lineage_spark.operators.analytics import attribution_touch

    got = {r.channel: r for r in attribution_touch(spark, SF).collect()}
    ev = pd.read_parquet(f"{SF}/events.parquet").sort_values(
        ["user_id", "ts", "event_id"]
    )
    lt_n, lt_rev, ft_n, ft_rev = {}, {}, {}, {}
    for uid, grp in ev.groupby("user_id"):
        first = last = None
        for _, r in grp.iterrows():
            if r.event_type == "purchase":
                if last is not None:
                    lt_n[last] = lt_n.get(last, 0) + 1
                    lt_rev[last] = lt_rev.get(last, 0.0) + r.value
                    ft_n[first] = ft_n.get(first, 0) + 1
                    ft_rev[first] = ft_rev.get(first, 0.0) + r.value
            else:
                last = r.event_type
                if first is None:
                    first = r.event_type
    assert set(got) == set(lt_n) | set(ft_n)
    for ch, r in got.items():
        assert r.lt_purchases == lt_n.get(ch, 0)
        assert float(r.lt_revenue) == pytest.approx(lt_rev.get(ch, 0.0), abs=0.02)
        assert r.ft_purchases == ft_n.get(ch, 0)
        assert float(r.ft_revenue) == pytest.approx(ft_rev.get(ch, 0.0), abs=0.02)


def test_equi_depth_matches_pandas_rank(spark):
    from spark_lineage_spark.operators.analytics import hist_equi_depth

    pdf = hist_equi_depth(spark, SF).toPandas().sort_values("bucket")
    o = pd.read_parquet(f"{SF}/orders.parquet").sort_values(
        ["o_totalprice", "o_orderkey"]
    )
    n = len(o)
    o["bucket"] = (np.arange(n) * 10) // n + 1
    exp = o.groupby("bucket").o_totalprice.agg(["size", "min", "max", "sum"])
    assert list(pdf.bucket) == list(exp.index)
    assert list(pdf.n_rows) == list(exp["size"])
    assert pdf.lo.to_numpy() == pytest.approx(exp["min"].round(2).to_numpy())
    assert pdf.hi.to_numpy() == pytest.approx(exp["max"].round(2).to_numpy())
    assert pdf.total.to_numpy() == pytest.approx(exp["sum"].to_numpy(), abs=0.5)
    # depth is equal within 1 row (rank partition remainder)
    assert pdf.n_rows.max() - pdf.n_rows.min() <= 1


def test_pagerank_matches_float_power_iteration(spark):
    from spark_lineage_spark.operators.analytics import graph_pagerank

    got = {r.node: r.pagerank for r in graph_pagerank(spark, SF).collect()}
    li = pd.read_parquet(f"{SF}/lineitem.parquet")[["l_orderkey", "l_partkey"]]
    edges = set()
    for _, grp in li.drop_duplicates().groupby("l_orderkey"):
        parts = sorted(grp.l_partkey.unique())
        for i, u in enumerate(parts):
            for v in parts[i + 1 :]:
                edges.add((u, v))
                edges.add((v, u))
    nodes = sorted({u for u, _ in edges})
    idx = {u: i for i, u in enumerate(nodes)}
    outdeg = np.zeros(len(nodes))
    for u, _ in edges:
        outdeg[idx[u]] += 1
    r = np.full(len(nodes), 1.0 / len(nodes))
    for _ in range(2):
        c = np.zeros(len(nodes))
        for u, v in edges:
            c[idx[v]] += r[idx[u]] / outdeg[idx[u]]
        r = 0.15 / len(nodes) + 0.85 * c
    ranked = sorted(zip(nodes, r), key=lambda t: (-t[1], t[0]))[:20]
    for node, rank in ranked:
        assert node in got
        # integer pico-unit truncation loses < 1e-6 absolute
        assert got[node] == pytest.approx(rank, abs=1e-6)


def test_gini_matches_numpy(spark):
    from spark_lineage_spark.operators.analytics import agg_gini_concentration

    row = agg_gini_concentration(spark, SF).collect()[0]
    x = np.sort(pd.read_parquet(f"{SF}/orders.parquet").o_totalprice.to_numpy())
    n = len(x)
    i = np.arange(1, n + 1)
    gini = (2 * (i * x).sum() - (n + 1) * x.sum()) / (n * x.sum())
    assert row.gini == pytest.approx(gini, abs=1e-4)
    top = x[i * 10 > n * 9].sum() / x.sum()
    assert row.top_decile_share == pytest.approx(top, abs=1e-4)
    assert row.n == n


def test_token_entropy_matches_numpy(spark):
    from spark_lineage_spark.operators.text import llm_token_entropy

    got = {r.source: r for r in llm_token_entropy(spark, SF).collect()}
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    for src, grp in docs.groupby("source"):
        toks = [w for t in grp.text for w in t.split(" ")]
        counts = pd.Series(toks).value_counts().to_numpy().astype(float)
        p = counts / counts.sum()
        ent = -(p * np.log(p)).sum()
        r = got[src]
        assert r.n_tokens == len(toks)
        assert r.n_types == len(counts)
        assert float(r.ttr) == pytest.approx(len(counts) / len(toks), abs=1e-5)
        assert float(r.entropy) == pytest.approx(ent, abs=1e-3)


def test_ngram_novelty_matches_pandas(spark):
    import hashlib

    from spark_lineage_spark.operators.text import llm_ngram_novelty

    row = llm_ngram_novelty(spark, SF).collect()[0]
    docs = pd.read_parquet(f"{SF}/documents.parquet")

    def split_of(t):
        h = hashlib.md5(t.encode()).hexdigest()[0]
        return "train" if h <= "b" else ("val" if h in "cd" else "test")

    def grams(t):
        ws = t.split(" ")
        return {" ".join(ws[i : i + 3]) for i in range(len(ws) - 2)}

    tr, te = set(), set()
    for t in docs.text:
        s = split_of(t)
        if s == "train":
            tr |= grams(t)
        elif s == "test":
            te |= grams(t)
    assert row.n_train_grams == len(tr)
    assert row.n_test_grams == len(te)
    assert row.n_novel == len(te - tr)
    assert float(row.novelty_rate) == pytest.approx(len(te - tr) / len(te), abs=1e-6)


def test_binary_files_roundtrip_bytes_exact(spark):
    import hashlib

    from spark_lineage_spark.operators.sources_sinks import (
        _BINARY_FILES,
        scan_binary_files,
    )

    got = {r.name: r for r in scan_binary_files(spark, SF).collect()}
    assert set(got) == set(_BINARY_FILES)
    for name, payload in _BINARY_FILES.items():
        assert got[name].length == len(payload)
        assert got[name].content_md5 == hashlib.md5(payload).hexdigest()


def test_levenshtein_matches_python_dp(spark):
    from spark_lineage_spark.operators.scalar_funcs import fn_levenshtein_battery

    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    got = {r.k: r for r in fn_levenshtein_battery(spark, SF).collect()}
    p = (
        pd.read_parquet(f"{SF}/part.parquet")
        .query("p_partkey <= 200")
        .set_index("p_partkey")
        .p_name
    )
    for k, r in got.items():
        a, b = p[k], p[k + 1]
        assert r.lev == lev(a, b)
        assert float(r.sim) == pytest.approx(1 - r.lev / max(len(a), len(b)), abs=1e-5)
        assert r.lev_case == lev(a, a.upper())


def test_degree_stats_match_pandas(spark):
    from spark_lineage_spark.operators.analytics import graph_degree_stats

    got = {r.bucket: r for r in graph_degree_stats(spark, SF).collect()}
    li = pd.read_parquet(f"{SF}/lineitem.parquet")[["l_orderkey", "l_partkey"]]
    edges = set()
    for _, grp in li.drop_duplicates().groupby("l_orderkey"):
        parts = sorted(grp.l_partkey.unique())
        for i, u in enumerate(parts):
            for v in parts[i + 1 :]:
                edges.add((u, v))
    deg = pd.Series([n for e in edges for n in e]).value_counts()
    exp = deg.groupby(np.floor(np.log2(deg)).astype(int)).agg(["size", "min", "max", "sum"])
    assert set(got) == set(exp.index)
    for b, row in exp.iterrows():
        assert got[b].n_nodes == row["size"]
        assert got[b].min_deg == row["min"]
        assert got[b].max_deg == row["max"]
        assert got[b].total_deg == row["sum"]


def test_changepoint_matches_numpy(spark):
    from spark_lineage_spark.operators.advanced_sql import ts_changepoint_split

    got = {r.user_id: r for r in ts_changepoint_split(spark, SF).collect()}
    ev = pd.read_parquet(f"{SF}/events.parquet").dropna(subset=["value"])
    ev["d"] = pd.to_datetime(ev.ts).dt.floor("D")
    for uid, grp in ev.groupby("user_id"):
        daily = grp.groupby("d").value.agg(["sum", "size"]).sort_index()
        sv, c = daily["sum"].to_numpy(), daily["size"].to_numpy()
        n_days, tc, tot = len(daily), c.sum(), sv.sum()
        best = None
        for i in range(1, n_days):
            pc, ps = c[:i].sum(), sv[:i].sum()
            stat = round(
                abs(ps / pc - (tot - ps) / (tc - pc))
                * math.sqrt(pc * (tc - pc) / tc),
                6,
            )
            if best is None or stat > best[0]:
                best = (stat, daily.index[i - 1])
        r = got[uid]
        assert r.n_days == n_days
        assert float(r.stat) == pytest.approx(best[0], abs=1e-4)
        assert pd.Timestamp(r.split_day) == best[1]


def test_python_sink_roundtrip_and_manifest(spark):
    import glob
    import json
    import os

    from spark_lineage_spark.streaming.queries import sink_python_stream

    got = {r.event_type: r for r in sink_python_stream(spark, SF).collect()}
    ev = pd.read_parquet(f"{SF}/events.parquet").dropna(subset=["value"])
    exp = ev.groupby("event_type").value.agg(["size", "sum"])
    assert set(got) == set(exp.index)
    for et, row in exp.iterrows():
        assert got[et].n == row["size"]
        assert got[et].total_value == pytest.approx(row["sum"], abs=0.02)
    # exactly-once contract: every data file in THIS run's sink dir is
    # manifest-listed (no orphan task output, incl. empty partitions)
    from spark_lineage_spark.streaming.queries import _PYSINK_DIRS

    d = next(p for p in _PYSINK_DIRS if "sls_pysink_" in p)
    committed = set()
    for m in glob.glob(os.path.join(d, "_commit_*.json")):
        committed |= set(json.load(open(m)))
    data_files = set(glob.glob(os.path.join(d, "task-*.jsonl")))
    assert data_files == committed


def test_incremental_scd2_equals_full_rebuild(spark):
    from spark_lineage_spark.operators.analytics import (
        cdc_scd2_build,
        cdc_scd2_incremental,
    )

    full = cdc_scd2_build(spark, SF).toPandas()
    inc = cdc_scd2_incremental(spark, SF).toPandas()
    key = ["user_id", "valid_from"]
    full = full.sort_values(key).reset_index(drop=True)
    inc = inc.sort_values(key).reset_index(drop=True)
    # byte-identical to the from-scratch rebuild — boundary-straddling
    # runs merged, no duplicated or split intervals
    pd.testing.assert_frame_equal(
        full[["user_id", "seg", "valid_from", "valid_to", "n_events"]],
        inc[["user_id", "seg", "valid_from", "valid_to", "n_events"]],
        check_dtype=False,
    )


def test_mad_matches_numpy(spark):
    from spark_lineage_spark.operators.aggregates import agg_median_abs_deviation

    got = {r.l_returnflag: r for r in agg_median_abs_deviation(spark, SF).collect()}
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    for flag, grp in li.groupby("l_returnflag"):
        x = np.sort(grp.l_extendedprice.to_numpy())
        n = len(x)
        med = x[math.ceil(0.5 * n) - 1]  # discrete: smallest with cd >= .5
        ad = np.sort(np.abs(np.round(x, 2) - round(med, 2)))
        mad = ad[math.ceil(0.5 * n) - 1]
        r = got[flag]
        assert r.n == n
        assert r.median == pytest.approx(round(med, 2))
        assert r.mad == pytest.approx(round(mad, 2), abs=0.011)


def test_asof_directions_match_pandas(spark):
    from spark_lineage_spark.operators.joins import join_asof_directions

    got = {r.purchase_id: r for r in join_asof_directions(spark, SF).collect()}
    ev = pd.read_parquet(f"{SF}/events.parquet")
    clicks = (
        ev[ev.event_type == "click"]
        .sort_values("event_id")
        .drop_duplicates(["user_id", "ts"], keep="last")
    )
    purchases = ev[ev.event_type == "purchase"]
    assert len(got) == len(purchases)
    for _, p in purchases.iterrows():
        cs = clicks[clicks.user_id == p.user_id]
        before = cs[cs.ts <= p.ts].sort_values(["ts", "event_id"])
        after = cs[cs.ts >= p.ts].sort_values(["ts", "event_id"])
        r = got[p.event_id]
        exp_b = before.iloc[-1].event_id if len(before) else None
        exp_f = after.iloc[0].event_id if len(after) else None
        assert r.click_before == exp_b
        assert r.click_after == exp_f
        if exp_b is None:
            assert r.click_nearest == exp_f
        elif exp_f is None:
            assert r.click_nearest == exp_b
        else:
            db = (p.ts - before.iloc[-1].ts).total_seconds()
            df_ = (after.iloc[0].ts - p.ts).total_seconds()
            assert r.click_nearest == (exp_b if db <= df_ else exp_f)


def test_band_bucketized_equals_nested_loop_and_avoids_bnlj(spark):
    from spark_lineage_spark.operators.joins import (
        join_band_bucketized,
        join_range_band,
    )

    bucketized = join_band_bucketized(spark, SF)
    nested = join_range_band(spark, SF)
    a = {r.s_suppkey: r.n_close for r in bucketized.collect()}
    b = {r.s_suppkey: r.n_close for r in nested.collect()}
    assert a == b
    # the whole point: the rewrite is an equi-join, not a nested loop
    plan = bucketized._sc._jvm.PythonSQLUtils.explainString(
        bucketized._jdf.queryExecution(), "formatted"
    )
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_union_missing_columns_nullfills_by_name(spark):
    from spark_lineage_spark.operators.setops import set_union_missing_columns

    got = {r.prio: r for r in set_union_missing_columns(spark, SF).collect()}
    o = pd.read_parquet(f"{SF}/orders.parquet")
    old_n = (o.o_orderkey % 3 == 0).sum()
    assert got["none"].n == old_n
    new = o[o.o_orderkey % 3 == 1]
    for prio, grp in new.groupby("o_orderpriority"):
        assert got[prio].n == len(grp)
        assert float(got[prio].total) == pytest.approx(grp.o_totalprice.sum(), abs=0.03)


def test_forecast_error_matches_pandas(spark):
    from spark_lineage_spark.operators.advanced_sql import ts_forecast_error

    got = {r.user_id: r for r in ts_forecast_error(spark, SF).collect()}
    ev = pd.read_parquet(f"{SF}/events.parquet").dropna(subset=["value"])
    ev["d"] = pd.to_datetime(ev.ts).dt.floor("D")
    daily = ev.groupby(["user_id", "d"]).value.sum().reset_index()
    lagged = daily.assign(d=daily.d + pd.Timedelta(days=7)).rename(
        columns={"value": "forecast"}
    )
    paired = daily.merge(lagged, on=["user_id", "d"])
    for uid, grp in paired.groupby("user_id"):
        a, f = grp.value.to_numpy(), grp.forecast.to_numpy()
        r = got[uid]
        assert r.n_days == len(grp)
        assert r.wape == pytest.approx(np.abs(a - f).sum() / a.sum(), abs=2e-6)
        assert r.mae == pytest.approx(np.abs(a - f).mean(), abs=2e-6)
        assert r.bias == pytest.approx((a - f).mean(), abs=2e-6)


def test_higher_moments_match_numpy(spark):
    from spark_lineage_spark.operators.aggregates import agg_higher_moments

    got = {r.o_orderpriority: r for r in agg_higher_moments(spark, SF).collect()}
    o = pd.read_parquet(f"{SF}/orders.parquet")
    for prio, grp in o.groupby("o_orderpriority"):
        x = grp.o_totalprice.to_numpy()
        d = x - x.mean()
        m2, m3, m4 = (d**2).mean(), (d**3).mean(), (d**4).mean()
        r = got[prio]
        assert r.n == len(x)
        assert r.skewness == pytest.approx(m3 / m2**1.5, abs=1e-3)
        assert r.excess_kurtosis == pytest.approx(m4 / m2**2 - 3, abs=1e-3)


def test_rouge_unigram_matches_python_sets(spark):
    from spark_lineage_spark.operators.text import llm_rouge_unigram

    got = {r.ref_id: r for r in llm_rouge_unigram(spark, SF).collect()}
    docs = pd.read_parquet(f"{SF}/documents.parquet").set_index("doc_id").text
    for ref_id, r in got.items():
        a, b = set(docs[ref_id].split(" ")), set(docs[ref_id + 1].split(" "))
        ov = len(a & b)
        assert (r.n_ref, r.n_cand, r.ov) == (len(a), len(b), ov)
        assert float(r.precision_1) == pytest.approx(ov / len(b), abs=1e-5)
        assert float(r.recall_1) == pytest.approx(ov / len(a), abs=1e-5)
        assert float(r.f1) == pytest.approx(2 * ov / (len(a) + len(b)), abs=1e-5)


def test_winnowing_matches_python_reference(spark):
    import hashlib

    from spark_lineage_spark.operators.text import (
        _WINNOW_W,
        llm_winnowing_fingerprint,
    )

    got = {r.doc_id: r for r in llm_winnowing_fingerprint(spark, SF).collect()}
    docs = pd.read_parquet(f"{SF}/documents.parquet").set_index("doc_id").text

    def fingerprints(t):
        ws = t.split(" ")
        hs = [
            hashlib.md5(" ".join(ws[i : i + 3]).encode()).hexdigest()
            for i in range(len(ws) - 2)
        ]
        return {
            min(hs[i : i + _WINNOW_W]) for i in range(len(hs) - _WINNOW_W + 1)
        }

    all_fp = {d: fingerprints(t) for d, t in docs.items()}
    from collections import Counter

    df_count = Counter(fp for s in all_fp.values() for fp in s)
    for d, fps in all_fp.items():
        if not fps:
            assert d not in got
            continue
        r = got[d]
        assert r.n_fp == len(fps)
        assert r.n_shared == sum(1 for fp in fps if df_count[fp] > 1)


def test_correlation_matrix_matches_numpy(spark):
    from spark_lineage_spark.operators.aggregates import agg_correlation_matrix

    got = {(r.l_returnflag, r.pair): r for r in agg_correlation_matrix(spark, SF).collect()}
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    cols = {"qty_price": ("l_quantity", "l_extendedprice"),
            "qty_discount": ("l_quantity", "l_discount"),
            "price_discount": ("l_extendedprice", "l_discount")}
    for flag, grp in li.groupby("l_returnflag"):
        for pair, (cx, cy) in cols.items():
            r = got[(flag, pair)]
            assert r.n == len(grp)
            assert r.corr == pytest.approx(
                np.corrcoef(grp[cx], grp[cy])[0, 1], abs=1e-5
            )


def test_sequence_pattern_matches_python(spark):
    from spark_lineage_spark.operators.advanced_sql import ts_sequence_pattern

    got = {r.user_id: r for r in ts_sequence_pattern(spark, SF).collect()}
    ev = pd.read_parquet(f"{SF}/events.parquet").sort_values(
        ["user_id", "ts", "event_id"]
    )
    for uid, grp in ev.groupby("user_id"):
        seq = ",".join(grp.event_type)
        r = got[uid]
        assert r.n_events == len(grp)
        assert r.n_matches == seq.count("view,click,purchase")


def test_autocorrelation_matches_numpy(spark):
    from spark_lineage_spark.operators.advanced_sql import ts_autocorrelation

    got = {r.lag: r for r in ts_autocorrelation(spark, SF).collect()}
    ev = pd.read_parquet(f"{SF}/events.parquet").dropna(subset=["value"])
    daily = (
        ev.assign(d=pd.to_datetime(ev.ts).dt.floor("D"))
        .groupby("d")
        .value.sum()
        .sort_index()
    )
    for lag in (1, 2, 3):
        shifted = daily.copy()
        shifted.index = shifted.index - pd.Timedelta(days=lag)
        joined = pd.concat([daily, shifted], axis=1, join="inner")
        x, y = joined.iloc[:, 0], joined.iloc[:, 1]
        r = got[lag]
        assert r.n == len(joined)
        assert r.acf == pytest.approx(np.corrcoef(x, y)[0, 1], abs=1e-5)


def test_preference_pairs_match_pandas(spark):
    from spark_lineage_spark.operators.text import llm_preference_pairs

    got = {(r.source, r.chosen_id): r for r in llm_preference_pairs(spark, SF).collect()}
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    docs["score"] = docs.text.map(
        lambda t: len(set(t.split(" "))) * 1_000_000 + len(t.split(" "))
    )
    expected = {}
    for src, grp in docs.groupby("source"):
        top = grp.sort_values(["score", "doc_id"], ascending=[False, True])
        bot = grp.sort_values(["score", "doc_id"], ascending=[True, False])
        for i in range(3):
            c, r = top.iloc[i], bot.iloc[i]
            if c.doc_id != r.doc_id and c.score > r.score:
                expected[(src, c.doc_id)] = (r.doc_id, c.score - r.score)
    assert set(got) == set(expected)
    for key, (rej, margin) in expected.items():
        assert got[key].rejected_id == rej
        assert got[key].margin == margin
        assert got[key].chosen_score > got[key].rejected_score


def test_point_in_time_scd2_matches_pandas(spark):
    from spark_lineage_spark.operators.analytics import join_point_in_time_scd2

    got = {r.segment_at_purchase: r for r in join_point_in_time_scd2(spark, SF).collect()}
    ev = pd.read_parquet(f"{SF}/events.parquet").sort_values(
        ["user_id", "ts", "event_id"]
    )
    split = pd.Timestamp("2024-01-20")
    hist = ev[ev.ts < split]
    counts, users = {}, {}
    for _, p in ev[(ev.event_type == "purchase") & (ev.ts >= split)].iterrows():
        h = hist[(hist.user_id == p.user_id) & (hist.ts <= p.ts)]
        if len(h):
            seg = h.iloc[-1].event_type
            counts[seg] = counts.get(seg, 0) + 1
            users.setdefault(seg, set()).add(p.user_id)
    assert set(got) == set(counts)
    for seg, n in counts.items():
        assert got[seg].n_purchases == n
        assert got[seg].n_users == len(users[seg])


def test_mask_redact_semantics(spark):
    from spark_lineage_spark.operators.scalar_funcs import fn_mask_redact

    import re

    got = {r.c_custkey: r for r in fn_mask_redact(spark, SF).collect()}
    c = pd.read_parquet(f"{SF}/customer.parquet").query("c_custkey <= 100")
    for _, row in c.iterrows():
        r = got[row.c_custkey]
        exp = re.sub(r"[0-9]", "n", re.sub(r"[a-z]", "x", re.sub(r"[A-Z]", "X", row.c_name)))
        assert r.masked_default == exp
        assert r.masked_star_digits == exp.replace("n", "*")
        assert r.masked_digits_only == re.sub(r"[0-9]", "n", row.c_name)


def test_top_percent_per_source_matches_pandas(spark):
    from spark_lineage_spark.operators.text import llm_top_percent_per_source

    got = {r.source: r for r in llm_top_percent_per_source(spark, SF).collect()}
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    docs["score"] = docs.text.map(
        lambda t: len(set(t.split(" "))) * 1_000_000 + len(t.split(" "))
    )
    for src, grp in docs.groupby("source"):
        n = len(grp)
        keep = n // 10
        if keep == 0:
            assert src not in got
            continue
        top = grp.sort_values(["score", "doc_id"], ascending=[False, True]).head(keep)
        r = got[src]
        assert r.n_kept == keep
        assert r.n_source_docs == n
        assert r.min_kept_score == top.score.min()


def test_encoding_battery_roundtrips(spark):
    import base64

    from spark_lineage_spark.operators.scalar_funcs import fn_encoding_battery

    got = {r.n_nationkey: r for r in fn_encoding_battery(spark, SF).collect()}
    nat = pd.read_parquet(f"{SF}/nation.parquet")
    for _, row in nat.iterrows():
        r = got[row.n_nationkey]
        raw = row.n_name.encode()
        assert r.b64 == base64.b64encode(raw).decode()
        assert r.b64_roundtrip == row.n_name
        assert r.hex_name == raw.hex()
        assert r.hex_roundtrip == row.n_name
        assert r.n_bytes == len(raw)


def test_format_string_matches_python(spark):
    from spark_lineage_spark.operators.scalar_funcs import fn_format_string_battery

    got = {r.s_suppkey: r for r in fn_format_string_battery(spark, SF).collect()}
    sup = pd.read_parquet(f"{SF}/supplier.parquet").query("s_suppkey <= 100")
    for _, row in sup.iterrows():
        r = got[row.s_suppkey]
        assert r.tagged == "%s#%05d" % (row.s_name, row.s_suppkey)
        assert r.bal_padded == "bal=%09.2f" % row.s_acctbal
        assert r.key_hex == "%x" % row.s_suppkey
        assert r.key_lpad == str(row.s_suppkey).rjust(8, "0")


def test_grouped_kth_matches_cume_dist_with_ties(spark):
    """grouped_kth's rank-k pick (k = ceil(q*n)) must equal the
    discrete quantile `smallest v with cume_dist >= q` on tie-heavy
    data — including ties that straddle a coarse-bucket boundary and a
    group smaller than one bucket."""
    from pyspark.sql import functions as F

    from spark_lineage_spark.operators.analytics import grouped_kth

    rng = np.random.RandomState(7)
    rows = []
    for g, n in (("a", 997), ("b", 500), ("c", 3)):
        # values drawn from a small integer domain * 5 => heavy ties,
        # and multiples of 10 land exactly on the bucket boundary
        vals = rng.randint(0, 40, size=n) * 5
        rows += [(g, float(v)) for v in vals]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["g", "v"]))
    targets = [("p10", 1, 10), ("med", 1, 2), ("p90", 9, 10)]
    collected = grouped_kth(
        df, ["g"], "v", F.floor(F.col("_v") / F.lit(10.0)).cast("bigint"), targets
    ).collect()
    # exactly one output row per (group, target) — assert on the LIST,
    # a dict would silently collapse duplicate rows
    assert len(collected) == 9, sorted((r.g, r._q) for r in collected)
    got = {(r.g, r._q): (r._v, r.n) for r in collected}
    pdf = pd.DataFrame(rows, columns=["g", "v"])
    for g, grp in pdf.groupby("g"):
        s = grp.v.sort_values().reset_index(drop=True)
        n = len(s)
        for label, num, den in targets:
            # smallest v with cume_dist >= num/den == value at rank
            # ceil(n*num/den) (1-based) in sorted order
            k = -(-num * n // den)
            v, n_got = got[(g, label)]
            assert n_got == n
            assert v == s[k - 1], (g, label, v, s[k - 1])


def test_grouped_rank_weight_path_matches_plain_window(spark):
    """Differential check of grouped_rank's two-phase prefix sums
    against the single-window form it replaces: per-group rnk / n /
    cum_w / tot_w must all agree on tie-heavy data with values
    straddling bucket boundaries (integer weights, so the re-associated
    addition is exact)."""
    from pyspark.sql import Window, functions as F

    from spark_lineage_spark.operators.analytics import grouped_rank

    rng = np.random.RandomState(11)
    rows = []
    for g, n in (("a", 800), ("b", 5)):
        vals = rng.randint(0, 30, size=n) * 10  # multiples on boundaries
        wts = rng.randint(1, 9, size=n)
        rows += [(g, int(i), float(v), int(w)) for i, (v, w) in enumerate(zip(vals, wts))]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["g", "id", "v", "w"]))
    got = (
        grouped_rank(
            df, ["g"], ["v", "id"], F.floor(F.col("v") / F.lit(100.0)).cast("bigint"),
            weight="w",
        )
        .select("g", "id", "rnk", "n", "cum_w", "tot_w")
        .collect()
    )
    wo = Window.partitionBy("g").orderBy("v", "id")
    expected = {
        (r.g, r.id): (r.rnk, r.n, r.cum_w, r.tot_w)
        for r in df.select(
            "g",
            "id",
            F.row_number().over(wo).alias("rnk"),
            F.count(F.lit(1)).over(Window.partitionBy("g")).alias("n"),
            F.sum("w")
            .over(wo.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .alias("cum_w"),
            F.sum("w").over(Window.partitionBy("g")).alias("tot_w"),
        ).collect()
    }
    assert len(got) == len(expected)
    for r in got:
        assert (r.rnk, r.n, r.cum_w, r.tot_w) == expected[(r.g, r.id)], (r.g, r.id)


def test_sssp_matches_python_bellman_ford(spark):
    """graph_sssp_weighted: independent 3-round Bellman-Ford in plain
    Python over the same co-purchase edges (pandas-derived) must give
    identical distances — pins the min-plus math, not just engine
    parity."""
    from spark_lineage_spark.operators.analytics import graph_sssp_weighted

    li = pd.read_parquet(f"{SF}/lineitem.parquet")[["l_orderkey", "l_partkey"]]
    m = li.merge(li, on="l_orderkey")
    m = m[m.l_partkey_x != m.l_partkey_y]
    edges = set(zip(m.l_partkey_x, m.l_partkey_y))  # both directions present
    nodes = {u for u, _ in edges}
    dist = {n: 0 for n in nodes if n % 97 == 0}
    for _ in range(3):
        nxt = dict(dist)
        for u, v in edges:
            if u in dist:
                w = (u + v) % 7 + 1
                if v not in nxt or dist[u] + w < nxt[v]:
                    nxt[v] = dist[u] + w
        dist = nxt
    got = {r.node: r.dist for r in graph_sssp_weighted(spark, SF).collect()}
    assert got == dist


def test_span_corruption_matches_python(spark):
    """llm_span_corruption: replay the hash-mask rule with hashlib for
    every doc; counts and the target string must match exactly, and
    the corpus mask rate must sit near the designed ~14.6%
    (1-(19/20)^3 per position, edge-truncated)."""
    import hashlib

    from spark_lineage_spark.operators.text import llm_span_corruption

    docs = pd.read_parquet(f"{SF}/documents.parquet")[["doc_id", "text"]]
    rows = {r.doc_id: r for r in llm_span_corruption(spark, SF).collect()}
    tot_tok = tot_masked = 0
    for doc_id, text in zip(docs.doc_id, docs.text):
        toks = [t for t in text.split(" ") if t]

        def start(i):
            h = hashlib.md5(f"{doc_id}:{i}".encode()).hexdigest()
            return int(h[:15], 16) % 20 == 0

        starts = [i for i in range(1, len(toks) + 1) if start(i)]
        masked = [
            i
            for i in range(1, len(toks) + 1)
            if start(i) or (i >= 2 and start(i - 1)) or (i >= 3 and start(i - 2))
        ]
        r = rows[doc_id]
        assert (r.n_tokens, r.n_spans, r.n_masked) == (
            len(toks),
            len(starts),
            len(masked),
        ), doc_id
        assert r.target_text == " ".join(toks[i - 1] for i in masked), doc_id
        tot_tok += len(toks)
        tot_masked += len(masked)
    assert abs(tot_masked / tot_tok - (1 - (19 / 20) ** 3)) < 0.02
