"""Round-12 property coverage: numpy replays of the three new
frequency/memory diagnostics (Ljung-Box, periodogram, rescaled-range
Hurst) — each re-derives the operator's exact integerized arithmetic
from the raw parquet, so a formula transcription error in the shared
SQL text cannot hide behind the cross-engine hash gate (the
ts_seasonal_strength F_T/F_S lesson from ADVICE r11)."""

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def _load_all():
    from spark_lineage_spark.registry import load_all

    return load_all()


def _daily_micro(sf=SF) -> np.ndarray:
    ev = pd.read_parquet(f"{sf}/events.parquet", columns=["ts", "value"])
    d = ev["ts"].dt.normalize()
    y = (
        (ev["value"] * 1_000_000)
        .round()
        .astype("int64")
        .groupby(d)
        .sum()
        .sort_index()
    )
    return y.to_numpy()


def test_ljung_box_matches_numpy_replay(spark):
    got = (
        _load_all()["ts_ljung_box"].builder(spark, SF).toPandas()
        .sort_values("lag").reset_index(drop=True)
    )
    y = _daily_micro().astype(np.float64)
    n = len(y)
    s, ss = y.sum(), (y * y).sum()
    acfs, t12s = [], []
    for k in range(1, 8):
        a, b = y[:-k], y[k:]
        num = n * n * (a * b).sum() - n * s * (a.sum() + b.sum()) + (n - k) * s * s
        den = n * (n * ss - s * s)
        r = round(num / den, 6)
        acfs.append(r)
        t12s.append(round(r * r / (n - k) * 1e12))
    qs = [round(n * (n + 2) * sum(t12s[:k]) / 1e12, 6) for k in range(1, 8)]
    assert got["lag"].tolist() == list(range(1, 8))
    assert np.allclose(got["acf"], acfs, atol=2e-6)
    assert np.allclose(got["q_stat"], qs, atol=2e-5)
    # Q is a cumulative sum of non-negative terms -> non-decreasing
    assert (got["q_stat"].diff().dropna() >= -1e-12).all()
    # reject flag is exactly the crit comparison, df tracks the lag
    assert (got["df"] == got["lag"]).all()
    exp_flag = (got["q_stat"] > got["chi2_crit_95"]).astype(int)
    assert (got["reject_white_noise"] == exp_flag).all()


def test_periodogram_matches_numpy_replay(spark):
    got = (
        _load_all()["ts_periodogram"].builder(spark, SF).toPandas()
        .sort_values("period_days").reset_index(drop=True)
    )
    y = _daily_micro()
    n = len(y)
    t = np.arange(n, dtype=np.float64)
    pw4 = {}
    for p in (2, 3, 4, 5, 6, 7, 14, 28, 91, 182, 365):
        k = max(1, round(n / p))
        arg = 2 * np.pi * k * t / n
        c8 = np.round(np.cos(arg) * 1e8)
        s8 = np.round(np.sin(arg) * 1e8)
        a8 = float((y * c8).sum())
        b8 = float((y * s8).sum())
        raw = 2 * (a8 * a8 + b8 * b8) / (n * 1e8 * 1e8 * 1e6 * 1e6)
        pw4[p] = round(raw * 1e4)
    total = sum(pw4.values())
    for _, row in got.iterrows():
        p = int(row["period_days"])
        assert abs(row["power"] - pw4[p] / 1e4) < 1e-9, (p, row["power"])
        assert abs(row["power_share"] - round(pw4[p] / total, 6)) < 1e-9
    # shares of the probed grid sum to ~1 (duplicate k=1 bins included)
    assert abs(got["power_share"].sum() - 1.0) < 1e-4
    # the k=1 collapse on the 30-day fixture: all p>=28 rows identical
    long_rows = got[got["period_days"] >= 28]
    assert long_rows["fourier_k"].nunique() == 1 == long_rows["power"].nunique()


def test_hurst_matches_numpy_replay(spark):
    got = (
        _load_all()["ts_hurst_exponent"].builder(spark, SF).toPandas()
        .sort_values("window_size").reset_index(drop=True)
    )
    y = _daily_micro()
    n = len(y)
    pts = []
    for w in (4, 8, 16, 32, 64):
        rs8 = []
        for b in range(n // w):
            blk = y[b * w : (b + 1) * w].astype(object)  # exact int arithmetic
            sb = sum(blk)
            pj = np.cumsum(blk)
            cum = [w * int(pj[j]) - (j + 1) * int(sb) for j in range(w)]
            r_num = max(cum) - min(cum)
            var_num = float(w * sum(int(v) * int(v) for v in blk)) - float(sb) * float(sb)
            if var_num > 0:
                rs8.append(round(float(r_num) / np.sqrt(var_num) * 1e8))
        if rs8:
            mean_rs = sum(rs8) / len(rs8) / 1e8
            pts.append((w, len(rs8), mean_rs))
    assert got["window_size"].tolist() == [p[0] for p in pts] == [4, 8, 16]
    assert got["n_blocks"].tolist() == [p[1] for p in pts] == [7, 3, 1]
    for (w, nb, mean_rs), (_, row) in zip(pts, got.iterrows()):
        assert abs(row["mean_rs"] - round(mean_rs, 6)) < 1e-9
    lx = np.array([np.log2(p[0]) for p in pts])
    ly = np.array([round(np.log2(p[2]) * 1e8) / 1e8 for p in pts])
    m = len(pts)
    slope = (m * (lx * ly).sum() - lx.sum() * ly.sum()) / (
        m * (lx * lx).sum() - lx.sum() ** 2
    )
    assert abs(got["hurst"].iloc[0] - round(slope, 6)) < 2e-6
    # every row repeats the one fitted exponent; R/S grows with w
    assert got["hurst"].nunique() == 1
    assert got["mean_rs"].is_monotonic_increasing


# ---------------------------------------------------------------------------
# round-12 wave 2: stats + text ops
# ---------------------------------------------------------------------------


def test_friedman_matches_numpy_replay(spark):
    got = (
        _load_all()["stats_friedman_test"].builder(spark, SF).toPandas()
        .sort_values("event_type").reset_index(drop=True)
    )
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["ts", "event_type"])
    cell = (
        ev.groupby([ev["ts"].dt.normalize(), "event_type"])
        .size()
        .unstack(fill_value=0)
    )
    k = cell.shape[1]
    complete = cell[(cell > 0).sum(axis=1) == k]
    n = len(complete)
    # doubled average ranks within each day: 2r = 2*#less + #eq-others + 2
    r2 = np.zeros_like(complete.values)
    for i, row in enumerate(complete.values):
        for j, v in enumerate(row):
            less = (row < v).sum()
            eq = (row == v).sum() - 1
            r2[i, j] = 2 * less + eq + 2
    r2_sums = r2.sum(axis=0)
    a4 = int((r2.astype(np.int64) ** 2).sum())
    dev2 = int(((r2_sums - n * (k + 1)) ** 2).sum())
    denom = a4 - n * k * (k + 1) ** 2
    q = round((k - 1) * dev2 / denom, 6)
    assert got["n_blocks"].iloc[0] == n and got["k_treatments"].iloc[0] == k
    assert np.allclose(
        got.set_index("event_type")["rank_sum"],
        pd.Series(r2_sums / 2, index=complete.columns).sort_index(),
    )
    assert abs(got["q_stat"].iloc[0] - q) < 1e-9
    # no-tie reduction: if no day has tied counts, Conover's A-C form
    # must equal the textbook 12/(nk(k+1)) * sum R^2 - 3n(k+1)
    if all(len(set(row)) == len(row) for row in complete.values):
        r_sums = r2_sums / 2
        q_textbook = 12 / (n * k * (k + 1)) * (r_sums**2).sum() - 3 * n * (k + 1)
        assert abs(q - round(q_textbook, 6)) < 1e-4
    assert (got["reject_equal_treatments"] == (got["q_stat"] > 9.487729).astype(int)).all()


def test_cronbach_alpha_matches_pandas_replay(spark):
    got = _load_all()["stats_cronbach_alpha"].builder(spark, SF).toPandas().iloc[0]
    d = pd.read_parquet(f"{SF}/documents.parquet", columns=["text", "n_chars"])
    toks = d["text"].str.split(" ")
    items = pd.DataFrame(
        {
            "i1": d["n_chars"],
            "i2": toks.str.len(),
            "i3": toks.map(lambda ws: len(set(ws))),
            "i4": toks.map(lambda ws: max(len(w) for w in ws)),
        }
    ).astype("int64")
    n = len(items)
    pv = items.var(ddof=0)
    vt = items.sum(axis=1).var(ddof=0)
    alpha = 4 / 3 * (1 - pv.sum() / vt)
    assert got["n_docs"] == n and got["k_items"] == 4
    for col, key in zip(
        ("var_chars", "var_tokens", "var_distinct", "var_maxtoken"),
        ("i1", "i2", "i3", "i4"),
    ):
        assert abs(got[col] - round(pv[key], 6)) < 1e-4, col
    assert abs(got["alpha"] - alpha) < 1e-6
    # positively-covarying counters: alpha positive, bounded by 1
    # (raw-score alpha; n_chars' large variance dominates the total,
    # which is why it lands mid-range rather than near 1)
    assert 0.0 < got["alpha"] <= 1.0


def test_roc_auc_matches_numpy_replay(spark):
    got = (
        _load_all()["stats_roc_auc"].builder(spark, SF).toPandas()
        .sort_values("bucket").reset_index(drop=True)
    )
    o = pd.read_parquet(
        f"{SF}/orders.parquet", columns=["o_totalprice", "o_orderpriority"]
    )
    b = np.floor(o["o_totalprice"] / 5000).astype("int64")
    y = (o["o_orderpriority"] == "1-URGENT").astype("int64")
    cells = pd.DataFrame({"b": b, "y": y}).groupby("b")["y"].agg(["sum", "count"])
    pos, neg = cells["sum"], cells["count"] - cells["sum"]
    p_tot, n_tot = int(pos.sum()), int(neg.sum())
    neg_below = neg.cumsum().shift(fill_value=0)
    auc = float((pos * (2 * neg_below + neg)).sum()) / (2 * p_tot * n_tot)
    assert abs(got["auc"].iloc[0] - round(auc, 6)) < 1e-9
    # sklearn-convention rank check: average-rank AUC via scores=bucket
    ranks = pd.Series(np.concatenate([np.repeat(cells.index, cells["count"])])).rank()
    flat_y = np.concatenate([[1] * int(pos[i]) + [0] * int(neg[i]) for i in cells.index])
    auc_rank = (ranks[flat_y == 1].sum() - p_tot * (p_tot + 1) / 2) / (p_tot * n_tot)
    assert abs(auc - auc_rank) < 1e-12
    # ROC sanity: TPR/FPR decrease as the threshold rises; lowest
    # threshold classifies everything positive
    assert got["tpr"].iloc[0] == 1.0 and got["fpr"].iloc[0] == 1.0
    assert got["tpr"].is_monotonic_decreasing and got["fpr"].is_monotonic_decreasing
    # priority is ~price-independent on this fixture
    assert 0.35 < auc < 0.65


def test_calibration_brier_decomposition_identity(spark):
    got = _load_all()["stats_calibration_brier"].builder(spark, SF).toPandas()
    o = pd.read_parquet(
        f"{SF}/orders.parquet",
        columns=["o_orderkey", "o_totalprice", "o_orderpriority"],
    )
    b = np.floor(o["o_totalprice"] / 25000).astype("int64")
    y = (o["o_orderpriority"] == "1-URGENT").astype("int64")
    fold = o["o_orderkey"] % 10
    df = pd.DataFrame({"b": b, "y": y, "fold": fold})
    tr = df[df["fold"] < 8].groupby("b")["y"].agg(["mean", "count"])
    te = df[df["fold"] >= 8].groupby("b")["y"].agg(["mean", "sum", "count"])
    j = te.join(tr, rsuffix="_tr").dropna()
    n = j["count"].sum()
    obar = j["sum"].sum() / n
    p, orate, w = j["mean_tr"], j["mean"], j["count"]
    brier = float((w * p * p - 2 * p * j["sum"] + j["sum"]).sum()) / n
    rel = float((w * (p - orate) ** 2).sum()) / n
    res = float((w * (orate - obar) ** 2).sum()) / n
    unc = obar * (1 - obar)
    row = got.iloc[0]
    assert abs(row["brier"] - brier) < 1e-5
    assert abs(row["reliability"] - rel) < 1e-5
    assert abs(row["resolution"] - res) < 1e-5
    assert abs(row["uncertainty"] - unc) < 1e-5
    # Murphy identity holds exactly for a bucket-constant forecaster
    assert abs(brier - (rel - res + unc)) < 1e-12
    assert abs(row["brier"] - (row["reliability"] - row["resolution"]
                               + row["uncertainty"])) < 5e-6
    # per-bucket gap column is consistent
    assert np.allclose(got["calib_gap"], (got["obs_rate"] - got["p_hat"]).round(6),
                       atol=2e-6)


def test_hodges_lehmann_matches_numpy_replay(spark):
    got = _load_all()["stats_hodges_lehmann"].builder(spark, SF).toPandas().iloc[0]
    o = pd.read_parquet(f"{SF}/orders.parquet", columns=["o_orderdate", "o_totalprice"])
    cents = np.floor(o["o_totalprice"] * 100 + 0.5).astype("int64")
    d = o["o_orderdate"].dt.normalize()
    daily = cents.groupby(d).sum()
    dow = (daily.index - pd.Timestamp("1970-01-01")).days % 7
    wd = daily[~np.isin(dow, (2, 3))].to_numpy()
    we = daily[np.isin(dow, (2, 3))].to_numpy()

    def mid(v):
        v = np.sort(v)
        n = len(v)
        return (int(v[(n + 1) // 2 - 1]) + int(v[n // 2])) / 2

    diffs = (wd[:, None] - we[None, :]).ravel()
    assert got["n_weekday_days"] == len(wd) and got["n_weekend_days"] == len(we)
    assert got["n_pairs"] == len(wd) * len(we)
    assert abs(got["hl_shift_usd"] - round(mid(diffs) / 100, 2)) < 1e-9
    assert abs(got["median_weekday_usd"] - round(mid(wd) / 100, 2)) < 1e-9
    assert abs(got["median_weekend_usd"] - round(mid(we) / 100, 2)) < 1e-9
    # HL sits inside the IQR of the pairwise differences
    lo, hi = np.percentile(diffs, [25, 75])
    assert lo / 100 <= got["hl_shift_usd"] <= hi / 100


def test_kneser_ney_matches_python_replay(spark):
    got = (
        _load_all()["llm_ngram_kneser_ney"].builder(spark, SF).toPandas()
        .sort_values("source").reset_index(drop=True)
    )
    d = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "source", "text"])
    toks = {
        r.doc_id: [w for w in r.text.split(" ") if w]
        for r in d.itertuples()
        if isinstance(r.text, str)
    }
    src = dict(zip(d["doc_id"], d["source"]))
    from collections import Counter, defaultdict

    big = Counter()
    for did, ws in toks.items():
        if did % 10 != 0:
            big.update(zip(ws, ws[1:]))
    c_prev, n1p_prev, n1p_cur = Counter(), Counter(), Counter()
    for (p, c), n in big.items():
        c_prev[p] += n
        n1p_prev[p] += 1
        n1p_cur[c] += 1
    nbt, vc = len(big), len(n1p_cur)
    per_src = defaultdict(list)
    rates = defaultdict(lambda: [0, 0, 0])  # unseen_bigram, unseen_ctx, n
    for did, ws in toks.items():
        if did % 10 != 0:
            continue
        lps = []
        for p, c in zip(ws, ws[1:]):
            pc = (n1p_cur.get(c, 0) + 1.0) / (nbt + vc + 1)
            if p in c_prev:
                lp = np.log(
                    max(big.get((p, c), 0) - 0.75, 0.0) / c_prev[p]
                    + 0.75 * n1p_prev[p] / c_prev[p] * pc
                )
            else:
                lp = np.log(pc)
            lps.append(lp)
            rates[src[did]][0] += (p, c) not in big
            rates[src[did]][1] += p not in c_prev
            rates[src[did]][2] += 1
        if lps:
            per_src[src[did]].append(np.mean(lps))
    for _, row in got.iterrows():
        s = row["source"]
        assert row["n_docs"] == len(per_src[s])
        assert abs(row["avg_logprob_kn"] - round(np.mean(per_src[s]), 6)) < 1e-5
        ub, uc, nb = rates[s]
        assert abs(row["unseen_bigram_rate"] - round(ub / nb, 6)) < 1e-9
        assert abs(row["unseen_context_rate"] - round(uc / nb, 6)) < 1e-9
    # KN and stupid backoff score the same held slice: same sources
    bo = _load_all()["llm_ngram_backoff_score"].builder(spark, SF).toPandas()
    assert set(bo["source"]) == set(got["source"])
    assert (got["avg_logprob_kn"] < 0).all()


def test_heaps_fit_matches_python_replay(spark):
    got = (
        _load_all()["llm_heaps_law_fit"].builder(spark, SF).toPandas()
        .sort_values("bucket").reset_index(drop=True)
    )
    d = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    span = int(d["doc_id"].max()) + 1
    nb, firsts = {}, {}
    for r in d.itertuples():
        if not isinstance(r.text, str):
            continue
        ws = [w for w in r.text.split(" ") if w]
        b = int(r.doc_id * 10.0 // span)
        shs = [" ".join(ws[i : i + 3]) for i in range(len(ws) - 2)]
        nb[b] = nb.get(b, 0) + len(shs)
        for s in shs:
            if s not in firsts or firsts[s] > b:
                firsts[s] = b
    buckets = sorted(nb)
    cum_n, cum_v, rows = 0, 0, []
    nv = {}
    for s, b in firsts.items():
        nv[b] = nv.get(b, 0) + 1
    for b in buckets:
        cum_n += nb[b]
        cum_v += nv.get(b, 0)
        rows.append((b, cum_n, cum_v))
    assert [tuple(r) for r in got[["bucket", "cum_ngrams", "cum_vocab"]].to_numpy()] == rows
    lx = np.array([round(np.log(r[1]) * 1e8) / 1e8 for r in rows])
    ly = np.array([round(np.log(r[2]) * 1e8) / 1e8 for r in rows])
    m = len(rows)
    beta = (m * (lx * ly).sum() - lx.sum() * ly.sum()) / (
        m * (lx * lx).sum() - lx.sum() ** 2
    )
    assert abs(got["heaps_beta"].iloc[0] - round(beta, 6)) < 2e-6
    # a growing shingle vocabulary: beta strictly inside (0, 1), fit tight
    assert 0 < got["heaps_beta"].iloc[0] < 1
    assert got["r2"].iloc[0] is not None and got["r2"].iloc[0] > 0.9
    assert got["cum_vocab"].is_monotonic_increasing


# ---------------------------------------------------------------------------
# round-12 wave 3: theil u / permutation / modularity
# ---------------------------------------------------------------------------


def test_theil_u_matches_numpy_replay(spark):
    got = _load_all()["ts_theil_u"].builder(spark, SF).toPandas().iloc[0]
    o = pd.read_parquet(f"{SF}/orders.parquet", columns=["o_orderdate", "o_totalprice"])
    cents = np.floor(o["o_totalprice"] * 100 + 0.5).astype("int64")
    daily = cents.groupby(o["o_orderdate"].dt.normalize()).sum()
    idx = daily.index
    rows = []
    for d in idx:
        d1, d7 = d - pd.Timedelta(days=1), d - pd.Timedelta(days=7)
        if d1 in daily.index and d7 in daily.index:
            rows.append((int(daily[d]), int(daily[d1]), int(daily[d7])))
    y = np.array([r[0] for r in rows], dtype=np.float64)
    f1 = np.array([r[1] for r in rows], dtype=np.float64)
    f7 = np.array([r[2] for r in rows], dtype=np.float64)
    sse7, sse1, ssy = ((y - f7) ** 2).sum(), ((y - f1) ** 2).sum(), (y * y).sum()
    assert got["n_days"] == len(rows)
    assert abs(got["rmse_seasonal_usd"] - round(np.sqrt(sse7 / len(rows)) / 100, 2)) < 1e-6
    assert abs(got["theil_u2_seasonal"] - round(np.sqrt(sse7 / ssy), 6)) < 1e-9
    assert abs(got["theil_u2_naive"] - round(np.sqrt(sse1 / ssy), 6)) < 1e-9
    assert abs(got["seasonal_vs_naive"] - round(np.sqrt(sse7 / sse1), 6)) < 1e-9
    # consistency: the ratio is the quotient of the two U2 numbers
    assert abs(got["seasonal_vs_naive"]
               - got["theil_u2_seasonal"] / got["theil_u2_naive"]) < 1e-4


def test_permutation_test_matches_hashlib_replay(spark):
    import hashlib

    got = _load_all()["stats_permutation_test"].builder(spark, SF).toPandas().iloc[0]
    o = pd.read_parquet(f"{SF}/orders.parquet", columns=["o_orderdate", "o_totalprice"])
    cents = np.floor(o["o_totalprice"] * 100 + 0.5).astype("int64")
    d = o["o_orderdate"].dt.normalize()
    daily = cents.groupby(d).sum()
    dow = (daily.index - pd.Timestamp("1970-01-01")).days % 7
    wknd = np.isin(dow, (2, 3))
    n, n_we = len(daily), int(wknd.sum())
    diff_obs = daily[~wknd].to_numpy().sum() / (n - n_we) - daily[wknd].to_numpy().sum() / n_we
    assert got["n_days"] == n and got["n_weekend"] == n_we
    assert abs(got["diff_obs_usd"] - round(diff_obs / 100, 2)) < 1e-6
    days = [ts.date().isoformat() for ts in daily.index]
    vals = daily.to_numpy()
    hits = valid = 0
    thr = n_we / n
    for b in range(1, 201):
        u = np.array(
            [
                int(hashlib.md5(f"{day}_{b}".encode()).hexdigest()[:15], 16)
                / 1152921504606846976
                for day in days
            ]
        )
        flag = u < thr
        n1 = int(flag.sum())
        if 0 < n1 < n:
            valid += 1
            diff_b = vals[~flag].sum() / (n - n1) - vals[flag].sum() / n1
            hits += abs(diff_b) >= abs(diff_obs)
    assert got["b_valid"] == valid
    assert abs(got["p_value"] - round((1 + hits) / (1 + valid), 6)) < 1e-9
    # a valid p-value under the add-one convention
    assert 0 < got["p_value"] <= 1


def test_modularity_matches_numpy_replay(spark):
    got = (
        _load_all()["graph_modularity"].builder(spark, SF).toPandas()
        .sort_values(["size", "community"], ascending=[False, True])
        .reset_index(drop=True)
    )
    li = pd.read_parquet(f"{SF}/lineitem.parquet", columns=["l_orderkey", "l_partkey"])
    part = pd.read_parquet(f"{SF}/part.parquet", columns=["p_partkey", "p_brand"])
    brand = dict(zip(part["p_partkey"], part["p_brand"]))
    edges = set()
    for _, grp in li.drop_duplicates().groupby("l_orderkey"):
        ps = sorted(set(grp["l_partkey"]))
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                edges.add((ps[i], ps[j]))
    m = len(edges)
    from collections import Counter

    deg, e_c, d_c = Counter(), Counter(), Counter()
    for u, v in edges:
        deg[u] += 1
        deg[v] += 1
        if brand[u] == brand[v]:
            e_c[brand[u]] += 1
    for nd, dg in deg.items():
        d_c[brand[nd]] += dg
    m2 = 2 * m
    q = sum(m2 * 2 * e_c[c] - d_c[c] ** 2 for c in d_c) / m2 / m2
    row = got.iloc[0]
    assert row["n_communities"] == len(d_c)
    assert abs(row["modularity"] - round(q, 6)) < 1e-9
    # per-community check for every reported row + contribution algebra
    sizes = Counter(brand[nd] for nd in deg)
    for _, r in got.iterrows():
        c = r["community"]
        assert r["size"] == sizes[c]
        assert r["internal_edges"] == e_c[c]
        assert r["degree_sum"] == d_c[c]
        contrib = (m2 * 2 * e_c[c] - d_c[c] ** 2) / m2 / m2
        assert abs(r["contribution"] - round(contrib, 6)) < 1e-9
    # uniform basket generator: brands mix at chance level
    assert abs(row["modularity"]) < 0.05
    # all rows repeat the one scalar; sizes are reported descending
    assert got["modularity"].nunique() == 1
    assert got["size"].is_monotonic_decreasing


# ---------------------------------------------------------------------------
# round-12 wave 4: auc-pr / assortativity / tost
# ---------------------------------------------------------------------------


def test_auc_pr_matches_numpy_replay(spark):
    got = (
        _load_all()["stats_auc_pr"].builder(spark, SF).toPandas()
        .sort_values("bucket", ascending=False).reset_index(drop=True)
    )
    o = pd.read_parquet(
        f"{SF}/orders.parquet", columns=["o_totalprice", "o_orderpriority"]
    )
    b = np.floor(o["o_totalprice"] / 5000).astype("int64")
    y = (o["o_orderpriority"] == "1-URGENT").astype("int64")
    cells = pd.DataFrame({"b": b, "y": y}).groupby("b")["y"].agg(["sum", "count"])
    cells = cells.sort_index(ascending=False)
    pos, neg = cells["sum"], cells["count"] - cells["sum"]
    cp, cn = pos.cumsum(), neg.cumsum()
    p_tot, n_all = int(pos.sum()), int(cells["count"].sum())
    ap9 = sum(round(float(pos[i]) * cp[i] / (cp[i] + cn[i]) * 1e9) for i in cells.index)
    ap = round(ap9 / 1e9 / p_tot, 6)
    row = got.iloc[0]
    assert abs(row["avg_precision"] - ap) < 1e-9
    assert abs(row["prevalence_baseline"] - round(p_tot / n_all, 6)) < 1e-9
    for (i, r), idx in zip(got.iterrows(), cells.index):
        assert r["bucket"] == idx
        assert abs(r["precision_at"] - round(float(cp[idx]) / (cp[idx] + cn[idx]), 6)) < 1e-9
        assert abs(r["recall_at"] - round(float(cp[idx]) / p_tot, 6)) < 1e-9
    # recall grows monotonically as the threshold drops; the last row
    # classifies everything positive -> precision == prevalence
    assert got["recall_at"].is_monotonic_increasing
    assert abs(got["recall_at"].iloc[-1] - 1.0) < 1e-9
    assert abs(got["precision_at"].iloc[-1] - row["prevalence_baseline"]) < 1e-9
    # ~price-independent priority: AP lands near the prevalence line
    assert abs(row["avg_precision"] - row["prevalence_baseline"]) < 0.05


def test_assortativity_matches_numpy_replay(spark):
    got = _load_all()["graph_assortativity"].builder(spark, SF).toPandas().iloc[0]
    li = pd.read_parquet(f"{SF}/lineitem.parquet", columns=["l_orderkey", "l_partkey"])
    edges = set()
    for _, grp in li.drop_duplicates().groupby("l_orderkey"):
        ps = sorted(set(grp["l_partkey"]))
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                edges.add((ps[i], ps[j]))
    from collections import Counter

    deg = Counter()
    for u, v in edges:
        deg[u] += 1
        deg[v] += 1
    x = np.array([deg[u] for u, v in edges] + [deg[v] for u, v in edges], float)
    yv = np.array([deg[v] for u, v in edges] + [deg[u] for u, v in edges], float)
    m2 = len(x)
    num = m2 * (x * yv).sum() - x.sum() * yv.sum()
    den = np.sqrt(
        (m2 * (x * x).sum() - x.sum() ** 2) * (m2 * (yv * yv).sum() - yv.sum() ** 2)
    )
    assert got["n_nodes"] == len(deg) and got["n_edges"] == len(edges)
    assert abs(got["assortativity"] - round(num / den, 6)) < 2e-6
    # mean EDGE degree is the size-biased mean: sum(d^2)/sum(d)
    ds = np.array(list(deg.values()), float)
    assert abs(got["mean_edge_degree"] - round((ds**2).sum() / ds.sum(), 6)) < 2e-6
    assert -1 <= got["assortativity"] <= 1


def test_tost_matches_numpy_replay(spark):
    got = _load_all()["stats_tost_equivalence"].builder(spark, SF).toPandas().iloc[0]
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["event_type", "value"])
    g = {
        t: (ev.loc[ev["event_type"] == t, "value"] * 1e6).round().astype("int64")
        for t in ("click", "view")
    }
    n1, n2 = len(g["click"]), len(g["view"])
    s1, s2 = float(g["click"].sum()), float(g["view"].sum())
    q1 = float((g["click"].astype(object) ** 2).sum())
    q2 = float((g["view"].astype(object) ** 2).sum())
    mu1, mu2 = s1 / n1, s2 / n2
    delta = (s1 + s2) / (n1 + n2) * 0.01
    se1 = (q1 - s1 * s1 / n1) / (n1 - 1) / n1
    se2 = (q2 - s2 * s2 / n2) / (n2 - 1) / n2
    se = np.sqrt(se1 + se2)
    t_lo = round((mu1 - mu2 + delta) / se, 4)
    t_hi = round((mu1 - mu2 - delta) / se, 4)
    assert got["n_click"] == n1 and got["n_view"] == n2
    assert abs(got["t_lower"] - t_lo) < 1e-6
    assert abs(got["t_upper"] - t_hi) < 1e-6
    assert abs(got["margin_value"] - round(delta / 1e6, 6)) < 1e-9
    exp = int((mu1 - mu2 + delta) / se > 1.6449 and (mu1 - mu2 - delta) / se < -1.6449)
    assert got["equivalent_90"] == exp
    # internal consistency with the Welch op: same mean columns
    w = _load_all()["stats_ttest_welch"].builder(spark, SF).toPandas().iloc[0]
    assert abs(w["mean_click"] - got["mean_click"]) < 1e-9
    assert abs(w["mean_view"] - got["mean_view"]) < 1e-9


# ---------------------------------------------------------------------------
# round-12 hardening regression guards (10x-sweep fixes)
# ---------------------------------------------------------------------------


def test_ohlc_mean_is_exact_microunit_sum(spark):
    """ts_resample_ohlc's mean_value must equal the exact micro-unit
    integer sum divided once — not a float accumulation (the 10x
    sweep caught the avg(value) form on a round-6 boundary)."""
    got = _load_all()["ts_resample_ohlc"].builder(spark, SF).toPandas()
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["ts", "event_type", "value"])
    micro = (ev["value"] * 1_000_000).round().astype("int64")
    key = [ev["event_type"], ev["ts"].dt.floor("h")]
    exp = (micro.groupby(key).sum() / micro.groupby(key).count() / 1e6).round(6)
    m = got.set_index(["event_type", "bucket"])["mean_value"]
    for (et, b), v in exp.items():
        assert abs(m[(et, b)] - v) < 1e-9, (et, b)


def test_multimodal_byte_stats_exact_moments(spark):
    """llm_multimodal_features' text-path byte mean/std must equal the
    exact integer-moment closed form with HALF_UP rounding applied
    Spark-side (the 10x sweep caught np.mean pairwise accumulation +
    python banker's rounding flipping an exact dyadic .5)."""
    import decimal

    got = (
        _load_all()["llm_multimodal_features"].builder(spark, SF).toPandas()
    )
    d = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    txt = dict(zip(d["doc_id"], d["text"]))

    def half_up(x, nd=6):
        return float(
            decimal.Decimal(repr(x)).quantize(
                decimal.Decimal("1e-6"), rounding=decimal.ROUND_HALF_UP
            )
        )

    text_rows = got[got["media_type"] == "text/plain"]
    assert len(text_rows) > 0
    for _, r in text_rows.head(50).iterrows():
        data = np.frombuffer(txt[r["doc_id"]].encode(), dtype=np.uint8)
        n = len(data)
        s = int(data.sum(dtype=np.int64))
        ss = int((data.astype(np.int64) ** 2).sum())
        var = (n * float(ss) - float(s) * float(s)) / n / n
        assert abs(r["byte_mean"] - half_up(s / n)) < 1e-9, r["doc_id"]
        assert abs(r["byte_std"] - half_up(float(np.sqrt(var)))) < 1e-9, r["doc_id"]
