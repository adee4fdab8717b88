"""Round-14 property coverage: independent replays of the new ops —
each re-derives the operator's statistic from the raw parquet with
numpy/pandas, pinned to the textbook definition rather than the
operator's own SQL, so a shared-SQL formula transcription error
cannot hide behind the cross-engine hash gate (the
ts_seasonal_strength F_T/F_S lesson from ADVICE r11)."""

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def _load_all():
    from spark_lineage_spark.registry import load_all

    return load_all()


def _daily_cents():
    o = pd.read_parquet(
        f"{SF}/orders.parquet", columns=["o_orderdate", "o_totalprice"]
    )
    d = pd.to_datetime(o.o_orderdate).dt.normalize()
    cents = np.round(o.o_totalprice.to_numpy() * 100).astype(np.int64)
    return (
        pd.DataFrame({"d": d, "y": cents})
        .groupby("d")["y"].sum().sort_index().to_numpy()
    )


def test_turning_points_matches_numpy_replay(spark):
    got = _load_all()["ts_turning_points"].builder(spark, SF).toPandas()
    y = _daily_cents()
    n = len(y)
    interior = y[1:-1]
    t = int(
        (((interior > y[:-2]) & (interior > y[2:]))
         | ((interior < y[:-2]) & (interior < y[2:]))).sum()
    )
    e = 2.0 * (n - 2) / 3
    v = (16 * n - 29) / 90.0
    z = (t - e) / np.sqrt(v)
    row = got.iloc[0]
    assert row.n_obs == n and row.n_turning == t
    assert abs(row.expected_turning - round(e, 4)) < 1e-9
    assert abs(row.var_turning - round(v, 4)) < 1e-9
    assert abs(row.z_score - round(z, 4)) < 1e-3
    assert row.reject_iid_95 == int(abs(z) > 1.96)


def test_turning_points_textbook_cases():
    """Monotone series: zero turning points.  Perfect zigzag: every
    interior point turns.  These pin the strict-extremum definition
    independent of any engine."""
    for y in (np.arange(10), np.arange(10)[::-1]):
        interior = y[1:-1]
        t = (((interior > y[:-2]) & (interior > y[2:]))
             | ((interior < y[:-2]) & (interior < y[2:]))).sum()
        assert t == 0
    zig = np.array([0, 5, 1, 6, 2, 7, 3, 8])
    interior = zig[1:-1]
    t = (((interior > zig[:-2]) & (interior > zig[2:]))
         | ((interior < zig[:-2]) & (interior < zig[2:]))).sum()
    assert t == len(zig) - 2


def _perm_code(y0, y1, y2):
    r0 = int(y0 > y1) + int(y0 > y2)
    r1 = int(y1 >= y0) + int(y1 > y2)
    r2 = int(y2 >= y0) + int(y2 >= y1)
    return r0 * 9 + r1 * 3 + r2


def test_permutation_entropy_matches_numpy_replay(spark):
    got = (
        _load_all()["ts_permutation_entropy"].builder(spark, SF).toPandas()
        .sort_values("pattern_code").reset_index(drop=True)
    )
    y = _daily_cents()
    codes = [
        _perm_code(y[i], y[i + 1], y[i + 2]) for i in range(len(y) - 2)
    ]
    counts = pd.Series(codes).value_counts().sort_index()
    n = counts.sum()
    slc = float(sum(round(c * np.log(c), 8) for c in counts))
    h = np.log(n) - slc / n
    assert got.pattern_code.tolist() == counts.index.tolist()
    assert got.n_windows.tolist() == counts.tolist()
    for i, c in enumerate(counts):
        assert abs(got.share[i] - round(c / n, 6)) < 1e-9
    assert (abs(got.perm_entropy_nats - round(h, 6)) < 2e-6).all()
    assert (abs(got.perm_entropy_norm - round(h / np.log(6), 6)) < 2e-6).all()
    # codes are valid order-3 permutations only
    assert set(got.pattern_code) <= {5, 7, 11, 15, 19, 21}
    assert 0 <= got.perm_entropy_norm.iloc[0] <= 1 + 1e-9


def test_permutation_entropy_code_is_bijective_on_permutations():
    """Every strict ordering of three distinct values maps to a
    distinct code, ties resolve by position (Bandt-Pompe)."""
    import itertools

    codes = {_perm_code(*p) for p in itertools.permutations([1.0, 2.0, 3.0])}
    assert codes == {5, 7, 11, 15, 19, 21}
    # tie convention: equal values rank by position — same as the
    # strictly-increasing pattern
    assert _perm_code(1, 1, 1) == _perm_code(1, 2, 3)


def _kpss_replay(y):
    n = len(y)
    s1 = int(y.sum())
    e = np.array(
        [round((n * int(v) - s1) / 1048576) for v in y], dtype=np.int64
    )
    s = np.cumsum(e)
    ss2 = int((s.astype(object) ** 2).sum())
    l = int(np.floor(4 * np.sqrt(np.sqrt(n / 100.0))))
    gamma0 = int((e.astype(object) ** 2).sum())
    wgamma = 0
    for j in range(1, l + 1):
        wgamma += (l + 1 - j) * int((e[j:].astype(object) * e[:-j]).sum())
    lrv_scaled = (l + 1) * gamma0 + 2 * wgamma
    eta = ss2 * (l + 1) / (n * lrv_scaled)
    return n, l, eta


def test_kpss_matches_numpy_replay(spark):
    got = _load_all()["ts_kpss_test"].builder(spark, SF).toPandas()
    y = _daily_cents()
    n, l, eta = _kpss_replay(y)
    row = got.iloc[0]
    assert row.n_obs == n and row.bandwidth == l
    assert abs(row.kpss_eta - round(eta, 6)) < 2e-6
    assert row.reject_stationary == int(eta > 0.463)


def test_kpss_textbook_behavior():
    """A pure random walk must blow eta up; white noise keeps it
    small — the level-stationarity null reacts exactly as KPSS 1992
    describes.  Deterministic pseudo-random input (md5-free LCG) so
    the case replays bit-identically."""
    rng = np.random.RandomState(7)
    noise = (rng.randint(0, 10_000_000, size=2000)).astype(np.int64)
    _, _, eta_noise = _kpss_replay(noise)
    walk = np.cumsum(rng.randint(-5_000_000, 5_000_000, size=2000)).astype(
        np.int64
    ) + 10_000_000_000
    _, _, eta_walk = _kpss_replay(walk)
    assert eta_noise < 0.463 < eta_walk


# ---------------------------------------------------------------------------
# two-sample rank trio (shared prefix chassis)
# ---------------------------------------------------------------------------


def _two_sample_values(type_a, type_b):
    ev = pd.read_parquet(
        f"{SF}/events.parquet", columns=["event_type", "value"]
    )
    v = np.round(ev.value.to_numpy() * 1_000_000).astype(np.int64)
    a = v[ev.event_type.to_numpy() == type_a]
    b = v[ev.event_type.to_numpy() == type_b]
    return a, b


def _midranks(combined):
    return pd.Series(combined).rank(method="average").to_numpy()


def test_brunner_munzel_matches_numpy_replay(spark):
    got = _load_all()["stats_brunner_munzel"].builder(spark, SF).toPandas()
    a, b = _two_sample_values("purchase", "click")
    n1, n2 = len(a), len(b)
    comb = np.concatenate([a, b])
    rc = _midranks(comb)
    rcx, rcy = rc[:n1], rc[n1:]
    rx = _midranks(a)
    ry = _midranks(b)
    mx, my = rcx.mean(), rcy.mean()
    sx2 = ((rcx - rx - mx + (n1 + 1) / 2) ** 2).sum() / (n1 - 1)
    sy2 = ((rcy - ry - my + (n2 + 1) / 2) ** 2).sum() / (n2 - 1)
    w = n1 * n2 * (my - mx) / ((n1 + n2) * np.sqrt(n1 * sx2 + n2 * sy2))
    p_hat = (my - (n2 + 1) / 2) / n1
    df = (n1 * sx2 + n2 * sy2) ** 2 / (
        (n1 * sx2) ** 2 / (n1 - 1) + (n2 * sy2) ** 2 / (n2 - 1)
    )
    row = got.iloc[0]
    assert row.n_a == n1 and row.n_b == n2
    assert abs(row.p_a_lt_b - round(p_hat, 6)) < 2e-6
    assert abs(row.bm_stat - round(w, 4)) < 2e-3
    assert abs(row.df_satterthwaite - round(df, 2)) < 0.1
    assert row.reject_95 == int(abs(w) > 1.96)


def test_brunner_munzel_identical_samples_pin():
    """Identical samples: W = 0 exactly, p_hat = 1/2 — the symmetric
    null, engine-free."""
    a = np.array([3, 1, 4, 1, 5, 9, 2, 6], dtype=float)
    comb = np.concatenate([a, a])
    n = len(a)
    rc = _midranks(comb)
    mx, my = rc[:n].mean(), rc[n:].mean()
    assert mx == my  # placements symmetric
    p_hat = (my - (n + 1) / 2) / n
    assert abs(p_hat - 0.5) < 1e-12


def test_cvm_two_sample_matches_numpy_replay(spark):
    got = _load_all()["stats_cvm_two_sample"].builder(spark, SF).toPandas()
    a, b = _two_sample_values("purchase", "click")
    n1, n2 = len(a), len(b)
    pts = np.unique(np.concatenate([a, b]))
    ca = np.array([(a == v).sum() for v in pts], dtype=np.int64)
    cv = np.array([(b == v).sum() for v in pts], dtype=np.int64)
    cum_a, cum_b = np.cumsum(ca), np.cumsum(cv)
    g = ca + cv
    A = cum_a.astype(object) * n2 - cum_b.astype(object) * n1
    num = int((g.astype(object) * A * A).sum())
    t = num / (n1 * n2 * (n1 + n2) ** 2)
    row = got.iloc[0]
    assert row.n_a == n1 and row.n_b == n2
    assert abs(row.cvm_t - round(t, 6)) < 2e-6
    assert row.reject_same_dist == int(t > 0.461)


def test_cvm_identical_distributions_pin():
    """Equal samples of equal size: the ECDF gap is zero at every
    point, so T = 0 exactly."""
    a = np.array([1, 2, 2, 7], dtype=np.int64)
    pts = np.unique(a)
    ca = np.array([(a == v).sum() for v in pts])
    cum = np.cumsum(ca)
    A = cum * len(a) - cum * len(a)
    assert (A == 0).all()


def test_ansari_bradley_matches_numpy_replay(spark):
    got = _load_all()["stats_ansari_bradley"].builder(spark, SF).toPandas()
    a, b = _two_sample_values("click", "view")
    n1, n2 = len(a), len(b)
    comb = np.concatenate([a, b])
    n = n1 + n2
    r = _midranks(comb)
    s = np.minimum(r, n + 1 - r)
    ab = s[:n1].sum()
    sbar = s.sum() / n
    var = n1 * n2 * ((s**2).sum() - n * sbar**2) / (n * (n - 1))
    z = (ab - n1 * sbar) / np.sqrt(var)
    row = got.iloc[0]
    assert row.n_a == n1 and row.n_b == n2
    assert abs(row.ab_stat - round(ab, 1)) < 1e-6
    assert abs(row.z_score - round(z, 4)) < 2e-3
    assert row.reject_equal_scale == int(abs(z) > 1.96)


def test_ansari_bradley_dispersion_direction_pin():
    """A sample concentrated at the extremes (high dispersion) must
    score BELOW its permutation mean — the sign convention the
    docstring claims."""
    wide = np.array([1.0, 2.0, 19.0, 20.0])
    narrow = np.array([9.0, 10.0, 11.0, 12.0])
    comb = np.concatenate([wide, narrow])
    n = len(comb)
    r = _midranks(comb)
    s = np.minimum(r, n + 1 - r)
    ab_wide = s[:4].sum()
    assert ab_wide < 4 * s.sum() / n


# ---------------------------------------------------------------------------
# k-group tests
# ---------------------------------------------------------------------------

_CHI2_CRIT = {1: 3.841459, 2: 5.991465, 3: 7.814728, 4: 9.487729,
              5: 11.070498, 6: 12.591587, 7: 14.067140, 8: 15.507313}


def _priority_cents():
    o = pd.read_parquet(
        f"{SF}/orders.parquet", columns=["o_orderpriority", "o_totalprice"]
    )
    g = o.o_orderpriority.str[0].astype(int).to_numpy()
    cents = np.round(o.o_totalprice.to_numpy() * 100).astype(np.int64)
    return g, cents


def test_mood_median_matches_numpy_replay(spark):
    got = (
        _load_all()["stats_mood_median"].builder(spark, SF).toPandas()
        .sort_values("priority_group").reset_index(drop=True)
    )
    g, cents = _priority_cents()
    # percentile_disc(0.5): smallest value with cumulative share >= 0.5
    srt = np.sort(cents)
    m = srt[int(np.ceil(0.5 * len(srt))) - 1]
    nn = len(cents)
    r1 = int((cents > m).sum())
    r2 = nn - r1
    c9 = 0
    rows = []
    for gg in sorted(set(g)):
        mask = g == gg
        n = int(mask.sum())
        a = int((cents[mask] > m).sum())
        rows.append((gg, n, a))
        A = a * nn - n * r1
        c9 += round(A * A / (n * r1 * r2) * 1e9)
    chi2 = c9 / 1e9
    k = len(rows)
    assert list(got.priority_group) == [r[0] for r in rows]
    assert list(got.n_orders) == [r[1] for r in rows]
    assert list(got.n_above_median) == [r[2] for r in rows]
    assert (abs(got.chi2_stat - round(chi2, 6)) < 2e-6).all()
    assert (got.df == k - 1).all()
    assert (abs(got.chi2_crit_95 - _CHI2_CRIT[k - 1]) < 1e-9).all()
    assert (got.reject_equal_medians == int(chi2 > _CHI2_CRIT[k - 1])).all()


def test_mood_median_textbook_2x2_identity():
    """For k = 2 Mood's chi-square must equal the standard 2x2
    contingency chi-square (no continuity correction) — pins the
    closed-form A_g algebra against the textbook (O-E)^2/E."""
    a1, n1, a2, n2 = 30, 100, 50, 80
    nn, r1 = n1 + n2, a1 + a2
    r2 = nn - r1
    chi_closed = sum(
        (a * nn - n * r1) ** 2 / (n * r1 * r2)
        for a, n in [(a1, n1), (a2, n2)]
    )
    # textbook form over the 4 cells
    chi_text = 0.0
    for (o, rt, ct) in [(a1, n1, r1), (n1 - a1, n1, r2),
                        (a2, n2, r1), (n2 - a2, n2, r2)]:
        e = rt * ct / nn
        chi_text += (o - e) ** 2 / e
    assert abs(chi_closed - chi_text) < 1e-9


def test_bartlett_matches_numpy_replay(spark):
    got = (
        _load_all()["stats_bartlett_test"].builder(spark, SF).toPandas()
        .sort_values("priority_group").reset_index(drop=True)
    )
    g, cents = _priority_cents()
    csst = t19 = sinv = 0
    ks, nn = 0, 0
    rows = []
    for gg in sorted(set(g)):
        x = cents[g == gg].astype(np.float64)
        n = len(x)
        if n <= 1:
            continue
        ss = float((x * x).sum())
        s = float(x.sum())
        css = ss - s * s / n
        rows.append((gg, n, css))
        csst += round(css / 1048576)
        t19 += round((n - 1) * np.log(css / (n - 1)) * 1e9)
        sinv += round(1e12 / (n - 1))
        ks += 1
        nn += n
    sp2 = csst * 1048576 / (nn - ks)
    c = 1 + (sinv / 1e12 - 1 / (nn - ks)) / (3 * (ks - 1))
    chi2 = ((nn - ks) * np.log(sp2) - t19 / 1e9) / c
    assert list(got.priority_group) == [r[0] for r in rows]
    assert list(got.n_orders) == [r[1] for r in rows]
    for i, (_, n, css) in enumerate(rows):
        assert abs(got.variance_dollars2[i]
                   - round(css / (n - 1) / 1e4, 2)) < 0.02
    assert (abs(got.chi2_stat - round(chi2, 6)) < 1e-4).all()
    assert (got.df == ks - 1).all()
    assert (got.reject_equal_variance
            == int(chi2 > _CHI2_CRIT[ks - 1])).all()


def test_bartlett_equal_variances_textbook_pin():
    """Identical groups give chi2 = 0 exactly (log ratio of equal
    variances) — the null pins the formula's sign and centering."""
    x = np.array([1.0, 2.0, 3.0, 4.0, 5.0])
    groups = [x, x + 100, x - 7]  # equal variances, shifted means
    nn = sum(len(g) for g in groups)
    k = len(groups)
    csst = sum(((g - g.mean()) ** 2).sum() for g in groups)
    sp2 = csst / (nn - k)
    t1 = sum((len(g) - 1) * np.log(((g - g.mean()) ** 2).sum() / (len(g) - 1))
             for g in groups)
    chi2_num = (nn - k) * np.log(sp2) - t1
    assert abs(chi2_num) < 1e-9


def test_poisson_dispersion_matches_numpy_replay(spark):
    got = (
        _load_all()["stats_poisson_dispersion"].builder(spark, SF).toPandas()
        .sort_values("event_type").reset_index(drop=True)
    )
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["event_type", "ts"])
    ev["d"] = pd.to_datetime(ev.ts).dt.normalize()
    daily = ev.groupby(["event_type", "d"]).size().rename("c").reset_index()
    for _, row in got.iterrows():
        c = daily[daily.event_type == row.event_type].c.to_numpy()
        n, s, ss = len(c), int(c.sum()), int((c * c).sum())
        d = (n * ss - s * s) / s
        disp = (n * ss - s * s) / (n - 1) / n / (s / n)
        z = np.sqrt(2 * d) - np.sqrt(2 * (n - 1) - 1)
        assert row.n_days == n
        assert abs(row.mean_daily - round(s / n, 4)) < 1e-9
        assert abs(row.dispersion_index - round(disp, 6)) < 2e-6
        assert abs(row.d_stat - round(d, 4)) < 1e-3
        assert abs(row.z_score - round(z, 4)) < 1e-3
        assert row.overdispersed_95 == int(z > 1.645)


def test_poisson_dispersion_exact_poisson_pin():
    """A constant series has D = 0 (maximal underdispersion); a
    unit-variance-equals-mean series has index exactly 1 — the two
    anchors of the variance/mean index."""
    c = np.array([5, 5, 5, 5], dtype=np.int64)
    n, s, ss = len(c), int(c.sum()), int((c * c).sum())
    assert n * ss - s * s == 0
    c2 = np.array([4, 6, 4, 6], dtype=np.int64)  # var=4/3, mean=5
    n, s, ss = len(c2), int(c2.sum()), int((c2 * c2).sum())
    disp = (n * ss - s * s) / (n - 1) / n / (s / n)
    assert abs(disp - c2.var(ddof=1) / c2.mean()) < 1e-12


# ---------------------------------------------------------------------------
# ADF / spectral entropy / local clustering
# ---------------------------------------------------------------------------


def _daily_series():
    o = pd.read_parquet(
        f"{SF}/orders.parquet", columns=["o_orderdate", "o_totalprice"]
    )
    d = pd.to_datetime(o.o_orderdate).dt.normalize()
    cents = np.round(o.o_totalprice.to_numpy() * 100).astype(np.int64)
    return pd.DataFrame({"d": d, "y": cents}).groupby("d")["y"].sum()


def test_adf_augmented_matches_numpy_replay(spark):
    got = _load_all()["ts_adf_augmented"].builder(spark, SF).toPandas()
    daily = _daily_series()
    idx = daily.index
    byd = daily.to_dict()
    rows = []
    for d in idx:
        d1, d2 = d - pd.Timedelta(days=1), d - pd.Timedelta(days=2)
        if d1 in byd and d2 in byd:
            rows.append((byd[d1], byd[d1] - byd[d2], byd[d] - byd[d1]))
    x1 = np.array([r[0] for r in rows], dtype=np.float64)
    x2 = np.array([r[1] for r in rows], dtype=np.float64)
    yv = np.array([r[2] for r in rows], dtype=np.float64)
    n = len(rows)
    X = np.column_stack([np.ones(n), x1, x2])
    beta, *_ = np.linalg.lstsq(X, yv, rcond=None)
    resid = yv - X @ beta
    rss = float((resid**2).sum())
    s2 = rss / (n - 3)
    c11 = ((x1 - x1.mean()) ** 2).sum()
    c22 = ((x2 - x2.mean()) ** 2).sum()
    c12 = ((x1 - x1.mean()) * (x2 - x2.mean())).sum()
    det = c11 * c22 - c12 * c12
    se_b1 = np.sqrt(s2 * c22 / det)
    t = beta[1] / se_b1
    row = got.iloc[0]
    assert row.n_obs == n
    assert abs(row.b_coef - round(beta[1], 6)) < 1e-5
    assert abs(row.lag_coef - round(beta[2], 6)) < 1e-5
    assert abs(row.adf_stat - round(t, 4)) < 2e-3
    assert row.reject_unit_root == int(t < -2.86)
    rho = beta[1] + 1
    if 0 < rho < 1:
        assert abs(row.half_life_days - round(-np.log(2) / np.log(rho), 2)) < 0.05


def test_adf_reduces_to_df_when_lag_is_noise():
    """On an AR(1) series y_t = 0.5 y_{t-1} + e the augmented fit's b
    must stay close to the plain DF b (the lag term absorbs only
    residual serial structure) — pins the 2-regressor Cramer solve
    against the 1-regressor closed form on the same data."""
    rng = np.random.RandomState(3)
    y = np.zeros(800)
    for t in range(1, 800):
        y[t] = 0.5 * y[t - 1] + rng.randn()
    x1 = y[1:-1]
    yv = np.diff(y)[1:]
    x2 = np.diff(y)[:-1]
    n = len(yv)
    X = np.column_stack([np.ones(n), x1, x2])
    b_aug = np.linalg.lstsq(X, yv, rcond=None)[0][1]
    X1 = np.column_stack([np.ones(n), x1])
    b_df = np.linalg.lstsq(X1, yv, rcond=None)[0][1]
    assert abs(b_aug - b_df) < 0.1
    assert -0.7 < b_aug < -0.3  # recovers rho-1 = -0.5


def test_spectral_entropy_matches_numpy_replay(spark):
    got = _load_all()["ts_spectral_entropy"].builder(spark, SF).toPandas()
    y = _daily_series().to_numpy()
    n = len(y)
    t = np.arange(n)
    pw = {}
    for k in range(1, 65):
        c8 = np.round(np.cos(2 * np.pi * k * t / n) * 1e8)
        s8 = np.round(np.sin(2 * np.pi * k * t / n) * 1e8)
        a8 = float((y * c8).sum())
        b8 = float((y * s8).sum())
        pw[k] = a8 * a8 + b8 * b8
    m = max(pw.values())
    u = {k: round(p / m * 1e12) for k, p in pw.items() if round(p / m * 1e12) > 0}
    su = sum(u.values())
    sul = float(sum(round(v * np.log(v), 8) for v in u.values()))
    h = np.log(su) - sul / su
    k_peak = min(k for k, v in u.items() if v == max(u.values()))
    row = got.iloc[0]
    assert row.n_obs == n and row.n_bins == len(u)
    assert abs(row.spectral_entropy_nats - round(h, 6)) < 2e-5
    assert abs(row.spectral_entropy_norm - round(h / np.log(64), 6)) < 2e-5
    assert row.peak_harmonic == k_peak
    assert abs(row.peak_power_share
               - round(u[k_peak] / su, 6)) < 2e-6
    assert 0 <= row.spectral_entropy_norm <= 1 + 1e-9


def test_spectral_entropy_pure_tone_vs_flat_pin():
    """A pure cosine concentrates all power in one bin (entropy ~ 0);
    equal powers in all bins give exactly ln(K)."""
    n, K = 512, 64
    t = np.arange(n)
    y = np.cos(2 * np.pi * 8 * t / n) * 1e6

    def entropy(y):
        pw = {}
        for k in range(1, K + 1):
            a = float((y * np.cos(2 * np.pi * k * t / n)).sum())
            b = float((y * np.sin(2 * np.pi * k * t / n)).sum())
            pw[k] = a * a + b * b
        m = max(pw.values())
        u = {k: round(p / m * 1e12) for k, p in pw.items()}
        u = {k: v for k, v in u.items() if v > 0}
        su = sum(u.values())
        return np.log(su) - sum(v * np.log(v) for v in u.values()) / su

    assert entropy(y) < 0.01
    flat = {k: 10**12 for k in range(1, K + 1)}
    su = sum(flat.values())
    h_flat = np.log(su) - sum(v * np.log(v) for v in flat.values()) / su
    assert abs(h_flat - np.log(K)) < 1e-9


def test_local_clustering_matches_numpy_replay(spark):
    got = _load_all()["graph_local_clustering"].builder(spark, SF).toPandas()
    li = pd.read_parquet(
        f"{SF}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    ).drop_duplicates()
    from collections import defaultdict
    from itertools import combinations

    edges = set()
    for _, grp in li.groupby("l_orderkey"):
        ps = sorted(set(grp.l_partkey))
        for a, b in combinations(ps, 2):
            edges.add((a, b))
    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    tri = defaultdict(int)
    # direct per-node triangle count
    for v in adj:
        nb = sorted(adj[v])
        t = 0
        for i, x in enumerate(nb):
            t += len(adj[x] & set(nb[i + 1:]))
        tri[v] = t
    n_tri = sum(tri.values()) // 3
    nodes = [v for v in adj if len(adj[v]) >= 2]
    c9 = {v: round(2 * tri[v] / (len(adj[v]) * (len(adj[v]) - 1)) * 1e9)
          for v in nodes}
    nn = len(nodes)
    deg_sum = sum(len(adj[v]) for v in nodes)
    sc9 = sum(c9.values())
    wedges2 = sum(len(adj[v]) * (len(adj[v]) - 1) for v in nodes)
    t3 = sum(tri[v] for v in nodes)
    global_avg = sc9 / nn / 1e9
    transitivity = t3 / wedges2 * 2
    # bucket replay
    buckets = defaultdict(list)
    order = {}
    for v in nodes:
        d = len(adj[v])
        if d * 10 * nn < 8 * deg_sum:
            b = "lt_0.8x_mean"
        elif d * 10 * nn < 10 * deg_sum:
            b = "0.8-1.0x_mean"
        elif d * 10 * nn < 12 * deg_sum:
            b = "1.0-1.2x_mean"
        else:
            b = "ge_1.2x_mean"
        buckets[b].append(c9[v])
        order[b] = min(order.get(b, 10**9), d)
    exp = sorted(buckets, key=lambda b: order[b])
    assert list(got.degree_bucket) == exp
    for _, row in got.iterrows():
        vals = buckets[row.degree_bucket]
        assert row.n_nodes == len(vals)
        assert abs(row.avg_local_clustering
                   - round(sum(vals) / len(vals) / 1e9, 6)) < 2e-6
    assert (abs(got.global_avg_clustering - round(global_avg, 6)) < 2e-6).all()
    assert (abs(got.transitivity - round(transitivity, 6)) < 2e-6).all()
    assert (got.n_triangles == n_tri).all()


def test_local_clustering_textbook_graphs():
    """Complete triangle: every c_i = 1, transitivity 1.  Star: all
    c_i = 0.  Pins sign and normalization engine-free."""
    from collections import defaultdict

    def metrics(edges):
        adj = defaultdict(set)
        for a, b in edges:
            adj[a].add(b)
            adj[b].add(a)
        tri = {}
        for v in adj:
            nb = sorted(adj[v])
            t = sum(
                len(adj[x] & set(nb[i + 1:])) for i, x in enumerate(nb)
            )
            tri[v] = t
        nodes = [v for v in adj if len(adj[v]) >= 2]
        cs = [2 * tri[v] / (len(adj[v]) * (len(adj[v]) - 1)) for v in nodes]
        wedges2 = sum(len(adj[v]) * (len(adj[v]) - 1) for v in nodes)
        t3 = sum(tri[v] for v in nodes)
        return cs, (2 * t3 / wedges2 if wedges2 else None)

    cs, trans = metrics([(1, 2), (2, 3), (1, 3)])
    assert all(c == 1.0 for c in cs) and trans == 1.0
    cs, trans = metrics([(0, 1), (0, 2), (0, 3), (0, 4)])
    assert cs == [0.0] and trans == 0.0


# ---------------------------------------------------------------------------
# Theil inequality / CUSUM of squares
# ---------------------------------------------------------------------------


def test_theil_inequality_matches_numpy_replay(spark):
    got = (
        _load_all()["stats_theil_inequality"].builder(spark, SF).toPandas()
        .sort_values("nation_key").reset_index(drop=True)
    )
    o = pd.read_parquet(
        f"{SF}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    )
    c = pd.read_parquet(
        f"{SF}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    o["cents"] = np.round(o.o_totalprice.to_numpy() * 100).astype(np.int64)
    cust = (
        o.groupby("o_custkey")["cents"].sum().rename("x").reset_index()
        .merge(c, left_on="o_custkey", right_on="c_custkey")
    )
    ss = int(cust.x.sum())
    nn = len(cust)
    sxlx = float(sum(round(int(x) * np.log(int(x)), 8) for x in cust.x))
    t_total = sxlx / ss - np.log(ss / nn)
    b12 = w12 = 0
    rows = {}
    for nk, grp in cust.groupby("c_nationkey"):
        s = int(grp.x.sum())
        n = len(grp)
        xlx = float(sum(round(int(x) * np.log(int(x)), 8) for x in grp.x))
        tw = xlx / s - np.log(s / n)
        share = s / ss
        rows[nk] = (n, share, tw)
        b12 += round(share * np.log((s / n) / (ss / nn)) * 1e12)
        w12 += round(share * tw * 1e12)
    assert got.nation_key.tolist() == sorted(rows)
    for _, r in got.iterrows():
        n, share, tw = rows[r.nation_key]
        assert r.n_customers == n
        assert abs(r.revenue_share - round(share, 6)) < 2e-6
        assert abs(r.theil_within - round(tw, 6)) < 2e-6
    assert (abs(got.theil_total - round(t_total, 6)) < 2e-6).all()
    assert (abs(got.theil_between - round(b12 / 1e12, 6)) < 2e-6).all()
    assert (abs(got.theil_within_total - round(w12 / 1e12, 6)) < 2e-6).all()
    # THE decomposition identity — the whole reason Theil exists
    assert abs(t_total - (b12 / 1e12 + w12 / 1e12)) < 1e-6


def test_theil_textbook_pins():
    """Equal incomes: T = 0.  All income to one of n: T = ln(n).
    Decomposition is exact on a 2-group example."""
    x = np.array([5.0, 5.0, 5.0, 5.0])
    t = float((x / x.mean() * np.log(x / x.mean())).sum() / len(x))
    assert abs(t) < 1e-12
    y = np.array([4.0, 1e-300, 1e-300, 1e-300])  # limit case
    n = 4
    t1 = (y / y.mean() * np.log(y / y.mean())).sum() / n
    assert abs(t1 - np.log(n)) < 1e-9
    # 2-group exact decomposition
    g1, g2 = np.array([1.0, 3.0]), np.array([2.0, 6.0, 10.0])
    allx = np.concatenate([g1, g2])
    mu = allx.mean()
    t_tot = (allx / mu * np.log(allx / mu)).sum() / len(allx)

    def theil(g):
        m = g.mean()
        return (g / m * np.log(g / m)).sum() / len(g)

    s1, s2 = g1.sum() / allx.sum(), g2.sum() / allx.sum()
    t_b = s1 * np.log(g1.mean() / mu) + s2 * np.log(g2.mean() / mu)
    assert abs(t_tot - (t_b + s1 * theil(g1) + s2 * theil(g2))) < 1e-12


def _cusum_sq_replay(y):
    n = len(y)
    s1 = int(y.sum())
    es = np.array(
        [round((n * int(v) - s1) / 1048576) for v in y], dtype=object
    )
    es2 = es * es
    cr = np.cumsum(es2)
    cn = int(es2.sum())
    r = np.arange(1, n + 1, dtype=object)
    dr = np.abs(
        n * cr.astype(np.float64) - r.astype(np.float64) * float(cn)
    )
    stat = dr.max() / (n * float(cn))
    z = np.sqrt(n / 2) * stat
    imax = int(np.argmax(dr))  # numpy argmax = first max = min index
    return stat, z, imax


def test_cusum_squares_matches_numpy_replay(spark):
    got = _load_all()["ts_cusum_squares"].builder(spark, SF).toPandas()
    daily = _daily_series()
    y = daily.to_numpy()
    stat, z, imax = _cusum_sq_replay(y)
    row = got.iloc[0]
    assert row.n_obs == len(y)
    assert abs(row.cusum_sq_stat - round(stat, 6)) < 2e-6
    assert abs(row.z_bridge - round(z, 4)) < 2e-4
    assert row.variance_break_95 == int(z > 1.358)
    assert pd.Timestamp(row.break_day) == daily.index[imax]


def test_cusum_squares_detects_variance_break():
    """Half quiet, half loud: the bridge max lands near the break and
    z blows past 1.358; a homogeneous series stays under."""
    rng = np.random.RandomState(11)
    quiet = rng.randint(-1000, 1000, 1000)
    loud = rng.randint(-100000, 100000, 1000)
    y = np.concatenate([quiet, loud]).astype(np.int64) + 10_000_000
    stat, z, imax = _cusum_sq_replay(y)
    assert z > 1.358 and abs(imax - 1000) < 50
    homo = rng.randint(-1000, 1000, 2000).astype(np.int64) + 10_000_000
    _, z2, _ = _cusum_sq_replay(homo)
    assert z2 < 1.358


# --- wave 6: OLS residual diagnostics + Hjorth parameters ---------------


def _trend_residuals(y):
    n = len(y)
    t = np.arange(1, n + 1, dtype=np.float64)
    b = np.polyfit(t, y.astype(np.float64), 1)
    return y - (b[0] * t + b[1])


def test_durbin_watson_matches_numpy_replay(spark):
    got = _load_all()["stats_durbin_watson"].builder(spark, SF).toPandas()
    y = _daily_cents()
    e = _trend_residuals(y)
    dw = np.sum(np.diff(e) ** 2) / np.sum(e**2)
    rho1 = 1 - dw / 2
    z = rho1 * np.sqrt(len(y))
    row = got.iloc[0]
    assert row.n_obs == len(y)
    assert abs(row.dw_stat - dw) < 1e-4
    assert abs(row.rho1 - rho1) < 1e-4
    assert abs(row.z_lag1 - z) < 1e-2
    assert row.autocorr_95 == int(abs(z) > 1.96)


def test_durbin_watson_textbook_cases():
    """White noise: DW near 2.  A slow sine (strong positive serial
    correlation): DW near 0.  Alternating signs: DW near 4."""
    rng = np.random.RandomState(7)
    e = rng.normal(size=4000)
    dw = np.sum(np.diff(e) ** 2) / np.sum(e**2)
    assert 1.9 < dw < 2.1
    t = np.arange(400, dtype=np.float64)
    slow = np.sin(2 * np.pi * t / 200)
    dw_slow = np.sum(np.diff(slow) ** 2) / np.sum(slow**2)
    assert dw_slow < 0.1
    alt = np.where(np.arange(400) % 2 == 0, 1.0, -1.0)
    dw_alt = np.sum(np.diff(alt) ** 2) / np.sum(alt**2)
    assert dw_alt > 3.9


def test_breusch_pagan_matches_numpy_replay(spark):
    got = _load_all()["stats_breusch_pagan"].builder(spark, SF).toPandas()
    y = _daily_cents()
    e = _trend_residuals(y)
    g = e**2
    n = len(y)
    t = np.arange(1, n + 1, dtype=np.float64)
    r = np.corrcoef(t, g)[0, 1]
    lm = n * r * r
    row = got.iloc[0]
    assert row.n_obs == n
    assert abs(row.r2_aux - r * r) < 1e-4
    assert abs(row.bp_lm - lm) < max(1e-2, 2e-3 * lm)
    assert row.heteroscedastic_95 == int(lm > 3.841)


def test_breusch_pagan_textbook_cases():
    """Homoscedastic noise: LM small.  Variance growing with t: LM
    rejects decisively (the Koenker n*R^2 studentized form)."""
    rng = np.random.RandomState(11)
    n = 2000
    t = np.arange(1, n + 1, dtype=np.float64)
    e_homo = rng.normal(size=n)
    g = e_homo**2
    r = np.corrcoef(t, g)[0, 1]
    assert n * r * r < 6.0
    e_het = rng.normal(size=n) * np.sqrt(t)
    gh = e_het**2
    rh = np.corrcoef(t, gh)[0, 1]
    assert n * rh * rh > 50.0


def test_hjorth_matches_numpy_replay(spark):
    got = _load_all()["ts_hjorth_parameters"].builder(spark, SF).toPandas()
    o = pd.read_parquet(
        f"{SF}/orders.parquet", columns=["o_orderdate", "o_totalprice"]
    )
    d = pd.to_datetime(o.o_orderdate).dt.normalize()
    cents = np.round(o.o_totalprice.to_numpy() * 100).astype(np.int64)
    daily = pd.DataFrame({"d": d, "y": cents}).groupby("d")["y"].sum().sort_index()
    days = daily.index.to_numpy()
    y = daily.to_numpy().astype(np.float64)
    nxt = (days[1:] - days[:-1]) == np.timedelta64(1, "D")
    v = (y[1:] - y[:-1])[nxt]
    vd = days[1:][nxt]
    nxt2 = (vd[1:] - vd[:-1]) == np.timedelta64(1, "D")
    w = (v[1:] - v[:-1])[nxt2]
    var0, var1, var2 = (np.var(a) for a in (y, v, w))
    mob = np.sqrt(var1 / var0)
    comp = np.sqrt(var2 / var1) / mob
    row = got.iloc[0]
    assert row.n_obs == len(y) and row.n_diff1 == len(v) and row.n_diff2 == len(w)
    assert abs(row.activity_rms_dollars - np.sqrt(var0) / 100) < 1e-2
    assert abs(row.mobility - mob) < 1e-6
    assert abs(row.complexity - comp) < 1e-6


def test_hjorth_textbook_cases():
    """A pure sinusoid has complexity exactly 1 (in the continuous
    limit) and mobility equal to its angular frequency; white noise
    has much higher mobility than a slow sine."""
    t = np.arange(0.0, 400.0)
    slow = np.sin(2 * np.pi * t / 100)
    v = np.diff(slow)
    w = np.diff(v)
    mob = np.sqrt(np.var(v) / np.var(slow))
    comp = np.sqrt(np.var(w) / np.var(v)) / mob
    assert abs(mob - 2 * np.pi / 100) < 1e-3
    assert abs(comp - 1.0) < 1e-2  # discrete-diff bias ~5e-3 at this step
    rng = np.random.RandomState(3)
    noise = rng.normal(size=400)
    vn = np.diff(noise)
    mob_noise = np.sqrt(np.var(vn) / np.var(noise))
    assert mob_noise > 10 * mob


# --- wave 7: fractal/scaling diagnostics + Quade test -------------------


def _higuchi_numpy(y, ks=(1, 2, 3, 4, 6, 8, 11, 16)):
    n = len(y)
    y = y.astype(np.float64)
    pts = []
    for k in ks:
        lms = []
        for m in range(1, k + 1):
            seq = y[m - 1 :: k]
            cnt = len(seq) - 1
            s = np.abs(np.diff(seq)).sum()
            lms.append(s * (n - 1) / (cnt * k * k))
        pts.append((np.log(k), np.log(np.mean(lms))))
    x, ly = np.array(pts).T
    return -np.polyfit(x, ly, 1)[0]


def test_higuchi_matches_numpy_replay(spark):
    got = _load_all()["ts_higuchi_fd"].builder(spark, SF).toPandas()
    y = _daily_cents()
    fd = _higuchi_numpy(y)
    row = got.iloc[0]
    assert row.n_obs == len(y) and row.n_strides == 8
    assert abs(row.fd_higuchi - fd) < 5e-3


def test_higuchi_textbook_cases():
    """A straight line has FD 1; white noise approaches 2; a random
    walk sits near 1.5 (FD = 2 - H for self-affine series)."""
    line = np.arange(2000, dtype=np.float64) * 7 + 3
    assert abs(_higuchi_numpy(line) - 1.0) < 1e-6
    rng = np.random.RandomState(5)
    noise = rng.normal(size=4000)
    assert _higuchi_numpy(noise) > 1.9
    walk = np.cumsum(rng.normal(size=4000))
    assert 1.35 < _higuchi_numpy(walk) < 1.65


def _dfa_numpy(y, ss=(8, 16, 32, 64)):
    y = y.astype(np.float64)
    n = len(y)
    prof = np.cumsum(y - y.mean())
    pts = []
    for s in ss:
        nb = n // s
        ssr = 0.0
        for b in range(nb):
            seg = prof[b * s : (b + 1) * s]
            t = np.arange(b * s + 1, (b + 1) * s + 1, dtype=np.float64)
            c = np.polyfit(t, seg, 1)
            r = seg - (c[0] * t + c[1])
            ssr += (r**2).sum()
        pts.append((np.log(s), 0.5 * np.log(ssr / (nb * s))))
    x, lf = np.array(pts).T
    return np.polyfit(x, lf, 1)[0]


def test_dfa_matches_numpy_replay(spark):
    got = _load_all()["ts_dfa"].builder(spark, SF).toPandas()
    y = _daily_cents()
    alpha = _dfa_numpy(y)
    row = got.iloc[0]
    n = len(y)
    assert row.n_obs == n
    assert row.n_boxes == sum(n // s for s in (8, 16, 32, 64))
    assert abs(row.alpha_dfa - alpha) < 2e-2


def test_dfa_textbook_cases():
    """White noise: alpha near 0.5.  Integrated noise (random walk):
    alpha near 1.5.  AR(1) with strong persistence sits between."""
    rng = np.random.RandomState(9)
    noise = rng.normal(size=8000)
    assert abs(_dfa_numpy(noise) - 0.5) < 0.08
    walk = np.cumsum(rng.normal(size=8000))
    assert _dfa_numpy(walk) > 1.25


def _quade_numpy(mat):
    """mat: n_blocks x k matrix of responses."""
    nb, k = mat.shape
    r = np.zeros_like(mat, dtype=np.float64)
    for i in range(nb):
        r[i] = pd.Series(mat[i]).rank().to_numpy()
    dr = mat.max(axis=1) - mat.min(axis=1)
    q = pd.Series(dr).rank().to_numpy()
    s = q[:, None] * (r - (k + 1) / 2)
    a = (s**2).sum()
    tj = s.sum(axis=0)
    b = (tj**2).sum() / nb
    return (nb - 1) * b / (a - b)


def test_quade_matches_pandas_replay(spark):
    got = _load_all()["stats_quade_test"].builder(spark, SF).toPandas()
    o = pd.read_parquet(
        f"{SF}/orders.parquet",
        columns=["o_orderdate", "o_orderpriority", "o_totalprice"],
    )
    o["blk"] = pd.to_datetime(o.o_orderdate).dt.month
    o["v"] = np.round(o.o_totalprice.to_numpy() * 100).astype(np.int64)
    cell = o.groupby(["blk", "o_orderpriority"])["v"].sum().unstack()
    f = _quade_numpy(cell.to_numpy())
    row = got.iloc[0]
    assert row.n_blocks == 12 and row.k_treatments == 5 and row.df2 == 44
    assert abs(row.quade_f - f) < 1e-3
    assert row.reject_95 == int(f > 2.5837)


def test_quade_critical_value_derivation():
    """The hard-coded F(4,44) 95% point is derivable in closed form:
    with integer half-dfs (2, 22) the beta CDF is a finite binomial
    sum, I_x = 1 - (1-x)^23 - 23x(1-x)^22 with x = 4F/(4F+44)."""

    def cdf(fv):
        x = 4 * fv / (4 * fv + 44)
        return 1 - (1 - x) ** 23 - 23 * x * (1 - x) ** 22

    lo, hi = 1.0, 10.0
    for _ in range(80):
        mid = (lo + hi) / 2
        if cdf(mid) < 0.95:
            lo = mid
        else:
            hi = mid
    assert abs((lo + hi) / 2 - 2.5837) < 5e-4


def test_quade_detects_planted_treatment_effect():
    """A strong consistent treatment effect across blocks must push F
    far past the critical value; iid noise must not (checked at the
    much looser 20x bound to keep the test deterministic)."""
    rng = np.random.RandomState(21)
    base = rng.normal(0, 1, size=(12, 5))
    effect = base + np.array([0.0, 1.0, 2.0, 3.0, 4.0]) * 3
    assert _quade_numpy(effect) > 2.5837 * 3
    assert _quade_numpy(base) < 2.5837 * 20


# --- wave 8: Anderson-Darling two-sample + Haar energy ------------------


def _ad_a2akn_numpy(xa, xb):
    """Scholz-Stephens A2akN (midrank/tie version, k=2) and its
    standardized T, straight from the 1987 paper's formulas."""
    pooled = np.concatenate([xa, xb])
    n1, n2 = len(xa), len(xb)
    n = n1 + n2
    z = np.unique(pooled)
    lj = np.array([(pooled == v).sum() for v in z], dtype=np.float64)
    fa = np.array([(xa == v).sum() for v in z], dtype=np.float64)
    fb = np.array([(xb == v).sum() for v in z], dtype=np.float64)
    ma = np.cumsum(fa) - fa / 2
    mb = np.cumsum(fb) - fb / 2
    bj = np.cumsum(lj) - lj / 2
    denom = bj * (n - bj) - n * lj / 4
    inner_a = (lj / n) * (n * ma - n1 * bj) ** 2 / denom
    inner_b = (lj / n) * (n * mb - n2 * bj) ** 2 / denom
    a2 = (n - 1) / n * (inner_a.sum() / n1 + inner_b.sum() / n2)
    h_ = (1.0 / np.arange(1, n)).sum()
    hcum = np.cumsum(1.0 / np.arange(1, n))
    i = np.arange(1, n - 1)
    g_ = ((hcum[n - 2] - hcum[i - 1]) / (n - i)).sum()
    bigh = 1.0 / n1 + 1.0 / n2
    k = 2
    a = (4 * g_ - 6) * (k - 1) + (10 - 6 * g_) * bigh
    b = (2 * g_ - 4) * k**2 + 8 * h_ * k + (2 * g_ - 14 * h_ - 4) * bigh \
        - 8 * h_ + 4 * g_ - 6
    c = (6 * h_ + 2 * g_ - 2) * k**2 + (4 * h_ - 4 * g_ + 6) * k \
        + (2 * h_ - 6) * bigh + 4 * h_
    d = (2 * h_ + 6) * k**2 - 4 * h_ * k
    var = (a * n**3 + b * n**2 + c * n + d) / ((n - 1) * (n - 2) * (n - 3))
    return a2, (a2 - (k - 1)) / np.sqrt(var)


def _event_micro(sf, typ):
    e = pd.read_parquet(f"{sf}/events.parquet", columns=["event_type", "value"])
    v = e[e.event_type == typ].value.to_numpy()
    return np.round(v * 1_000_000).astype(np.int64)


def test_ad_two_sample_matches_numpy_replay(spark):
    got = _load_all()["stats_ad_two_sample"].builder(spark, SF).toPandas()
    xa = _event_micro(SF, "purchase")
    xb = _event_micro(SF, "click")
    a2, t = _ad_a2akn_numpy(xa, xb)
    row = got.iloc[0]
    assert row.n_a == len(xa) and row.n_b == len(xb)
    assert abs(row.ad_a2akn - a2) < 2e-3
    assert abs(row.ad_t - t) < 5e-3
    assert row.reject_same_dist == int(t > 1.960)


def test_ad_two_sample_textbook_cases():
    """Identical samples give A2 ~ its null mean 1 and T near 0 (well
    under the 1.96 gate); a clean tail shift is decisively rejected —
    and AD beats CvM's sensitivity on a pure tail alternative, the
    reason the op exists."""
    rng = np.random.RandomState(17)
    x = np.round(rng.normal(0, 1, 800) * 1e6).astype(np.int64)
    y = np.round(rng.normal(0, 1, 800) * 1e6).astype(np.int64)
    a2, t = _ad_a2akn_numpy(x, y)
    assert t < 1.96
    shift = np.round((rng.normal(0, 1, 800) + 0.35) * 1e6).astype(np.int64)
    a2s, ts = _ad_a2akn_numpy(x, shift)
    assert ts > 1.96 and a2s > a2


def test_haar_energy_matches_numpy_replay(spark):
    got = (
        _load_all()["ts_haar_energy"].builder(spark, SF).toPandas()
        .sort_values("level").reset_index(drop=True)
    )
    y = _daily_cents().astype(np.float64)
    n = len(y)
    energies = {}
    for lv in range(1, 7):
        sz = 2**lv
        m = n - n % sz
        blocks = y[:m].reshape(-1, sz)
        d = blocks[:, : sz // 2].sum(axis=1) - blocks[:, sz // 2 :].sum(axis=1)
        energies[lv] = (d**2).sum() / sz
        row = got[got.level == lv].iloc[0]
        assert row.block_days == sz and row.n_blocks == m // sz
        assert abs(row.rms_detail_dollars
                   - np.sqrt(energies[lv] / (m // sz)) / 100) < 1e-2
    te = sum(energies.values())
    for lv in range(1, 7):
        assert abs(got[got.level == lv].iloc[0].energy_share
                   - energies[lv] / te) < 1e-6
    assert abs(got.energy_share.sum() - 1.0) < 1e-5


def test_haar_energy_textbook_cases():
    """A pure alternating series puts all its energy at level 1; a
    64-periodic square wave concentrates at the matching level; white
    noise spreads energy roughly equally (Parseval flatness)."""
    alt = np.tile([1.0, -1.0], 512)
    n = len(alt)
    shares = []
    for lv in range(1, 7):
        sz = 2**lv
        m = n - n % sz
        blocks = alt[:m].reshape(-1, sz)
        d = blocks[:, : sz // 2].sum(axis=1) - blocks[:, sz // 2 :].sum(axis=1)
        shares.append((d**2).sum() / sz)
    shares = np.array(shares) / sum(shares)
    assert shares[0] > 0.999
    sq = np.tile(np.concatenate([np.ones(32), -np.ones(32)]), 16)
    e6 = []
    for lv in range(1, 7):
        sz = 2**lv
        m = len(sq) - len(sq) % sz
        blocks = sq[:m].reshape(-1, sz)
        d = blocks[:, : sz // 2].sum(axis=1) - blocks[:, sz // 2 :].sum(axis=1)
        e6.append((d**2).sum() / sz)
    assert np.argmax(e6) == 5  # level 6 = 64-day blocks


# --- wave 9: multivariate family + energy distance ----------------------


def test_hotelling_t2_matches_numpy_replay(spark):
    got = _load_all()["stats_hotelling_t2"].builder(spark, SF).toPandas()
    li = pd.read_parquet(
        f"{SF}/lineitem.parquet",
        columns=["l_returnflag", "l_quantity", "l_extendedprice"],
    )
    li = li[li.l_returnflag.isin(["R", "N"])]
    x = np.column_stack([
        np.round(li.l_quantity.to_numpy()),
        np.round(li.l_extendedprice.to_numpy() * 100),
    ]).astype(np.float64)
    g = (li.l_returnflag == "R").to_numpy()
    xa, xb = x[g], x[~g]
    n1, n2 = len(xa), len(xb)
    d = xa.mean(axis=0) - xb.mean(axis=0)
    ssa = (xa - xa.mean(axis=0)).T @ (xa - xa.mean(axis=0))
    ssb = (xb - xb.mean(axis=0)).T @ (xb - xb.mean(axis=0))
    s = (ssa + ssb) / (n1 + n2 - 2)
    t2 = n1 * n2 / (n1 + n2) * d @ np.linalg.solve(s, d)
    nn = n1 + n2
    f = (nn - 3) / (2 * (nn - 2)) * t2
    xc = 1 - 0.05 ** (2 / (nn - 3))
    fcrit = (nn - 3) / 2 * xc / (1 - xc)
    row = got.iloc[0]
    assert row.n_returned == n1 and row.n_clean == n2
    assert abs(row.hotelling_t2 - t2) < max(1e-3, 1e-5 * abs(t2))
    assert abs(row.f_stat - f) < max(1e-3, 1e-5 * abs(f))
    assert abs(row.f_crit_5pct - fcrit) < 1e-3
    assert row.reject_equal_means == int(f > fcrit)


def test_hotelling_t2_textbook_cases():
    """Same-distribution groups: T^2 small.  A correlated shift that
    cancels on each axis marginally is still caught jointly — the
    reason T^2 exists.  Also pin the closed-form F critical value
    against the closed-form beta CDF."""
    rng = np.random.RandomState(23)

    def t2of(xa, xb):
        n1, n2 = len(xa), len(xb)
        d = xa.mean(axis=0) - xb.mean(axis=0)
        ssa = (xa - xa.mean(axis=0)).T @ (xa - xa.mean(axis=0))
        ssb = (xb - xb.mean(axis=0)).T @ (xb - xb.mean(axis=0))
        s = (ssa + ssb) / (n1 + n2 - 2)
        return n1 * n2 / (n1 + n2) * d @ np.linalg.solve(s, d)

    cov = np.array([[1.0, 0.95], [0.95, 1.0]])
    base = rng.multivariate_normal([0, 0], cov, size=500)
    same = rng.multivariate_normal([0, 0], cov, size=500)
    # shift ALONG the anti-correlated direction: small marginal z,
    # huge whitened distance
    shifted = rng.multivariate_normal([0.25, -0.25], cov, size=500)
    assert t2of(base, same) < 12
    assert t2of(base, shifted) > 100
    nn = 1000
    xc = 1 - 0.05 ** (2 / (nn - 3))
    fcrit = (nn - 3) / 2 * xc / (1 - xc)
    cdf = 1 - (1 - 2 * fcrit / (2 * fcrit + nn - 3)) ** ((nn - 3) / 2)
    assert abs(cdf - 0.95) < 1e-12


def _energy_numpy(xa, xb):
    xa = np.sort(xa.astype(np.float64))
    xb = np.sort(xb.astype(np.float64))

    def meanabs(u, v):
        # exact O((n+m) log) via merge prefix sums
        tot = 0.0
        j = 0
        cs = 0.0
        sv = v.sum()
        for i, x in enumerate(u):
            while j < len(v) and v[j] <= x:
                cs += v[j]
                j += 1
            tot += x * j - cs + (sv - cs) - x * (len(v) - j)
        return tot / (len(u) * len(v))

    exy = meanabs(xa, xb)
    exx = meanabs(xa, xa)
    eyy = meanabs(xb, xb)
    return 2 * exy - exx - eyy, exy


def test_energy_distance_matches_numpy_replay(spark):
    got = _load_all()["stats_energy_distance"].builder(spark, SF).toPandas()
    xa = _event_micro(SF, "purchase")
    xb = _event_micro(SF, "click")
    e, exy = _energy_numpy(xa, xb)
    row = got.iloc[0]
    assert row.n_a == len(xa) and row.n_b == len(xb)
    assert abs(row.e_dist - e / 1e6) < 1e-4
    assert abs(row.energy_coef - e / (2 * exy)) < 1e-6
    assert abs(row.t_energy
               - len(xa) * len(xb) / (len(xa) + len(xb)) * e / 1e6) < 1e-2


def test_energy_distance_textbook_cases():
    """E = 0 for identical samples; a pure variance difference (zero
    mean shift) still produces E > 0 — the all-alternatives
    consistency rank tests lack."""
    x = np.array([1, 2, 3, 4, 5] * 20)
    e, _ = _energy_numpy(x, x)
    assert abs(e) < 1e-12
    rng = np.random.RandomState(31)
    a = np.round(rng.normal(0, 1, 2000) * 1e6)
    b = np.round(rng.normal(0, 3, 2000) * 1e6)
    e2, _ = _energy_numpy(a, b)
    assert e2 > 1e5  # clearly positive at this scale


def test_mahalanobis_matches_numpy_replay(spark):
    got = _load_all()["stats_mahalanobis_outliers"].builder(spark, SF).toPandas()
    o = pd.read_parquet(
        f"{SF}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    )
    o["cents"] = np.round(o.o_totalprice.to_numpy() * 100).astype(np.int64)
    cust = o.groupby("o_custkey").agg(
        c=("cents", "size"), s=("cents", "sum")
    )
    x = cust.to_numpy().astype(np.float64)
    mu = x.mean(axis=0)
    cov = np.cov(x.T, bias=True)
    inv = np.linalg.inv(cov)
    d = x - mu
    md2 = np.einsum("ij,jk,ik->i", d, inv, d)
    order = np.lexsort((cust.index.to_numpy(), -md2))
    top = order[:20]
    assert got.shape[0] == 20
    for rk, (idx, row) in enumerate(zip(top, got.itertuples()), start=1):
        assert row.rank == rk
        assert row.c_custkey == cust.index[idx]
        assert row.n_orders == cust.c.iloc[idx]
        assert abs(row.maha_sq - md2[idx]) < max(1e-3, 1e-6 * md2[idx])
        assert row.outlier_95 == int(md2[idx] > -2 * np.log(0.05))


def test_mahalanobis_textbook_case():
    """A point far along the anti-correlated direction has a much
    larger Mahalanobis distance than an equally-Euclidean-far point
    along the correlated direction — the whitening property."""
    rng = np.random.RandomState(41)
    cov = np.array([[1.0, 0.9], [0.9, 1.0]])
    x = rng.multivariate_normal([0, 0], cov, size=5000)
    inv = np.linalg.inv(np.cov(x.T, bias=True))
    along = np.array([2.0, 2.0])
    against = np.array([2.0, -2.0])
    d_along = along @ inv @ along
    d_against = against @ inv @ against
    assert d_against > 5 * d_along


# --- wave 10: distance correlation + Lepage test ------------------------


def _dcor_numpy(x, y):
    x = x.astype(np.float64)
    y = y.astype(np.float64)
    a = np.abs(x[:, None] - x[None, :])
    b = np.abs(y[:, None] - y[None, :])
    A = a - a.mean(axis=0) - a.mean(axis=1)[:, None] + a.mean()
    B = b - b.mean(axis=0) - b.mean(axis=1)[:, None] + b.mean()
    dcov2 = (A * B).mean()
    dvx = (A * A).mean()
    dvy = (B * B).mean()
    return np.sqrt(dcov2 / np.sqrt(dvx * dvy))


def test_dcor_matches_numpy_replay(spark):
    got = _load_all()["stats_distance_correlation"].builder(spark, SF).toPandas()
    o = pd.read_parquet(
        f"{SF}/orders.parquet", columns=["o_orderdate", "o_totalprice"]
    )
    d = pd.to_datetime(o.o_orderdate).dt.normalize()
    cents = np.round(o.o_totalprice.to_numpy() * 100).astype(np.int64)
    daily = pd.DataFrame({"d": d, "v": cents}).groupby("d").agg(
        x=("v", "sum"), y=("v", "size")
    )
    dc = _dcor_numpy(daily.x.to_numpy(), daily.y.to_numpy())
    r = np.corrcoef(daily.x, daily.y)[0, 1]
    row = got.iloc[0]
    assert row.n_days == len(daily)
    assert abs(row.dcor - dc) < 1e-6
    assert abs(row.pearson_r - r) < 1e-6


def test_dcor_textbook_cases():
    """dCor sees the dependence Pearson cannot: y = x^2 on a
    symmetric domain has r ~ 0 but dCor far from 0; independent
    noise has both near 0; dCor = 1 exactly for a linear map."""
    rng = np.random.RandomState(13)
    x = np.linspace(-3, 3, 400)
    y = x**2
    assert abs(np.corrcoef(x, y)[0, 1]) < 1e-10
    assert _dcor_numpy(x, y) > 0.4
    a = rng.normal(size=400)
    b = rng.normal(size=400)
    assert _dcor_numpy(a, b) < 0.2
    assert abs(_dcor_numpy(x, 3 * x + 7) - 1.0) < 1e-12


def test_lepage_matches_numpy_replay(spark):
    got = _load_all()["stats_lepage_test"].builder(spark, SF).toPandas()
    xa = _event_micro(SF, "purchase")
    xb = _event_micro(SF, "click")
    pooled = np.concatenate([xa, xb])
    n1, n2 = len(xa), len(xb)
    n = n1 + n2
    ranks = pd.Series(pooled).rank().to_numpy()  # midranks
    w = ranks[:n1].sum()
    # tie-corrected Wilcoxon variance
    _, counts = np.unique(pooled, return_counts=True)
    tie = (counts.astype(np.float64)**3 - counts).sum()
    ew = n1 * (n + 1) / 2
    vw = n1 * n2 / 12 * ((n + 1) - tie / (n * (n - 1)))
    zw = (w - ew) / np.sqrt(vw)
    # Ansari-Bradley with Hajek moments over actual scores
    s = np.minimum(ranks, n + 1 - ranks)
    ab = s[:n1].sum()
    sbar = s.mean()
    vab = n1 * n2 * ((s**2).mean() - sbar**2) * n / (n * (n - 1))
    zab = (ab - n1 * sbar) / np.sqrt(vab)
    ll = zw**2 + zab**2
    row = got.iloc[0]
    assert row.n_a == n1 and row.n_b == n2
    assert abs(row.z_wilcoxon - zw) < 2e-3
    assert abs(row.z_ansari - zab) < 2e-3
    assert abs(row.lepage_l - ll) < 2e-2
    assert row.reject_95 == int(ll > -2 * np.log(0.05))


def test_lepage_textbook_cases():
    """Pure location shift loads z_W; pure scale change loads z_AB;
    the combined statistic rejects in both cases where the wrong
    single component would not."""
    rng = np.random.RandomState(29)

    def zs(xa, xb):
        pooled = np.concatenate([xa, xb])
        n1, n2 = len(xa), len(xb)
        n = n1 + n2
        ranks = pd.Series(pooled).rank().to_numpy()
        w = ranks[:n1].sum()
        _, counts = np.unique(pooled, return_counts=True)
        tie = (counts.astype(np.float64)**3 - counts).sum()
        zw = (w - n1 * (n + 1) / 2) / np.sqrt(
            n1 * n2 / 12 * ((n + 1) - tie / (n * (n - 1))))
        s = np.minimum(ranks, n + 1 - ranks)
        sbar = s.mean()
        vab = n1 * n2 * ((s**2).mean() - sbar**2) / (n - 1)
        zab = (s[:n1].sum() - n1 * sbar) / np.sqrt(vab)
        return zw, zab

    base = rng.normal(0, 1, 600)
    loc = rng.normal(0.5, 1, 600)
    zw, zab = zs(base, loc)
    assert abs(zw) > 3 and abs(zw) > 2 * abs(zab)
    scale = rng.normal(0, 2.5, 600)
    zw2, zab2 = zs(base, scale)
    assert abs(zab2) > 3 and abs(zab2) > 2 * abs(zw2)


# --- wave 11: VAR(1) stability + closed-form PCA ------------------------


def test_var_stability_matches_numpy_replay(spark):
    got = _load_all()["ts_var_stability"].builder(spark, SF).toPandas()
    o = pd.read_parquet(
        f"{SF}/orders.parquet", columns=["o_orderdate", "o_totalprice"]
    )
    d = pd.to_datetime(o.o_orderdate).dt.normalize()
    cents = np.round(o.o_totalprice.to_numpy() * 100).astype(np.int64)
    daily = pd.DataFrame({"d": d, "v": cents}).groupby("d").agg(
        x=("v", "sum"), y=("v", "size")
    )
    days = daily.index.to_numpy()
    nxt = (days[1:] - days[:-1]) == np.timedelta64(1, "D")
    x0 = daily.x.to_numpy()[:-1][nxt].astype(np.float64)
    y0 = daily.y.to_numpy()[:-1][nxt].astype(np.float64)
    x1 = daily.x.to_numpy()[1:][nxt].astype(np.float64)
    y1 = daily.y.to_numpy()[1:][nxt].astype(np.float64)
    z = np.column_stack([np.ones_like(x0), x0, y0])
    cx, _, _, _ = np.linalg.lstsq(z, x1, rcond=None)
    cy, _, _, _ = np.linalg.lstsq(z, y1, rcond=None)
    amat = np.array([[cx[1], cx[2]], [cy[1], cy[2]]])
    rad = max(abs(np.linalg.eigvals(amat)))
    row = got.iloc[0]
    assert row.n_pairs == len(x0)
    assert abs(row.a_rev_rev - amat[0, 0]) < 1e-5
    assert abs(row.a_rev_cnt - amat[0, 1]) < max(1e-4, 1e-3 * abs(amat[0, 1]))
    assert abs(row.a_cnt_rev - amat[1, 0]) < 1e-5
    assert abs(row.a_cnt_cnt - amat[1, 1]) < 1e-4
    assert abs(row.spectral_radius - rad) < 1e-4
    assert row.var_stable == int(rad < 1)


def test_var_stability_textbook_case():
    """A simulated stable VAR(1) recovers its coefficient matrix and
    spectral radius; an explosive one flags unstable."""
    rng = np.random.RandomState(37)
    amat = np.array([[0.5, 0.2], [-0.1, 0.3]])
    z = np.zeros((4000, 2))
    for t in range(1, 4000):
        z[t] = amat @ z[t - 1] + rng.normal(size=2)
    zz = np.column_stack([np.ones(3999), z[:-1]])
    cx = np.linalg.lstsq(zz, z[1:, 0], rcond=None)[0]
    cy = np.linalg.lstsq(zz, z[1:, 1], rcond=None)[0]
    est = np.array([[cx[1], cx[2]], [cy[1], cy[2]]])
    assert np.abs(est - amat).max() < 0.06
    assert max(abs(np.linalg.eigvals(est))) < 1
    assert max(abs(np.linalg.eigvals(np.array([[1.1, 0], [0, 0.5]])))) > 1


def test_pca_closed_form_matches_numpy_replay(spark):
    got = _load_all()["stats_pca_closed_form"].builder(spark, SF).toPandas()
    li = pd.read_parquet(
        f"{SF}/lineitem.parquet", columns=["l_quantity", "l_extendedprice"]
    )
    x = np.column_stack([
        np.round(li.l_quantity.to_numpy()),
        np.round(li.l_extendedprice.to_numpy() * 100),
    ]).astype(np.float64)
    cov = np.cov(x.T, bias=True)
    lam, vec = np.linalg.eigh(cov)
    l1, l2 = lam[1], lam[0]
    row = got.iloc[0]
    assert row.n_rows == len(x)
    assert abs(row.explained_ratio_pc1 - l1 / (l1 + l2)) < 1e-6
    assert abs(row.pc1_sd_dollars - np.sqrt(l1) / 100) < 1e-2
    assert abs(row.corr_qp - cov[0, 1] / np.sqrt(cov[0, 0] * cov[1, 1])) < 1e-6
    # the closed-form angle matches the eigh principal eigenvector
    # (compare angles mod pi -- tan is ill-conditioned near pi/2)
    v1 = vec[:, 1]
    ang = np.arctan2(l1 - cov[0, 0], cov[0, 1])
    ang_ref = np.arctan2(v1[1], v1[0])
    diff = (ang - ang_ref) % np.pi
    assert min(diff, np.pi - diff) < 1e-6


def test_pca_closed_form_textbook_case():
    """An isotropic cloud splits 50/50; a rank-1 line loads 100% on
    PC1 with the line's own angle."""
    vq, vp, c = 2.0, 2.0, 0.0
    l1 = (vq + vp) / 2 + np.sqrt(((vq - vp) / 2) ** 2 + c**2)
    assert abs(l1 / (vq + vp) - 0.5) < 1e-12
    t = np.linspace(0, 1, 1000)
    x = np.column_stack([t, 3 * t])
    cov = np.cov(x.T, bias=True)
    l1b = (cov[0, 0] + cov[1, 1]) / 2 + np.sqrt(
        ((cov[0, 0] - cov[1, 1]) / 2) ** 2 + cov[0, 1] ** 2)
    l2b = (cov[0, 0] + cov[1, 1]) - l1b
    assert l2b / l1b < 1e-12
    ang = np.arctan2(l1b - cov[0, 0], cov[0, 1])
    assert abs(np.tan(ang) - 3.0) < 1e-9


# --- wave 12: BDS test + Cucconi test -----------------------------------


def _bds_numpy(y):
    y = y.astype(np.float64)
    y0, y1 = y[:-1], y[1:]
    nn = len(y0)
    eps = np.round(np.sqrt(np.var(y0)))
    near = np.abs(y0[:, None] - y0[None, :]) <= eps
    np.fill_diagonal(near, False)
    near2 = near & (np.abs(y1[:, None] - y1[None, :]) <= eps)
    p1 = near.sum()
    p2 = near2.sum()
    d = near.sum(axis=1)
    c1 = p1 / (nn * (nn - 1))
    c2 = p2 / (nn * (nn - 1))
    kk = ((d.astype(np.float64)**2).sum() - p1) / (nn * (nn - 1) * (nn - 2))
    w = np.sqrt(nn) * (c2 - c1**2) / (2 * (kk - c1**2))
    return nn, eps, c1, c2, kk, w


def test_bds_matches_numpy_replay(spark):
    got = _load_all()["ts_bds_test"].builder(spark, SF).toPandas()
    y = _daily_cents()
    nn, eps, c1, c2, kk, w = _bds_numpy(y)
    row = got.iloc[0]
    assert row.n_embedded == nn and row.eps_cents == eps
    assert abs(row.c1_integral - c1) < 1e-6
    assert abs(row.c2_integral - c2) < 1e-6
    assert abs(row.k_integral - kk) < 1e-6
    assert abs(row.bds_w - w) < 1e-3
    assert row.reject_iid_95 == int(abs(w) > 1.96)


def test_bds_textbook_cases():
    """iid noise: |w| stays small (the null).  A nonlinear
    multiplicative process with ZERO autocorrelation (ARCH-style
    y_t = e_t * e_{t-1}) — invisible to Ljung-Box — is decisively
    rejected by BDS; so is a plain AR(1)."""
    rng = np.random.RandomState(43)
    noise = np.round(rng.normal(0, 100, 1200))
    *_, w_noise = _bds_numpy(noise)
    assert abs(w_noise) < 2.5
    e = rng.normal(0, 10, 1501)
    arch = np.round(e[1:] * e[:-1])
    lag1 = np.corrcoef(arch[1:], arch[:-1])[0, 1]
    assert abs(lag1) < 0.06  # no linear signature
    *_, w_arch = _bds_numpy(arch)
    assert abs(w_arch) > 5
    ar = np.zeros(1200)
    for t in range(1, 1200):
        ar[t] = 0.6 * ar[t - 1] + rng.normal(0, 50)
    *_, w_ar = _bds_numpy(np.round(ar))
    assert abs(w_ar) > 5


def _cucconi_numpy(xa, xb):
    pooled = np.concatenate([xa, xb])
    n1, n2 = len(xa), len(xb)
    n = n1 + n2
    r = pd.Series(pooled).rank().to_numpy()
    rb = r[n1:]
    u = (6 * (rb**2).sum() - n2 * (n + 1) * (2 * n + 1)) / np.sqrt(
        n1 * n2 * (n + 1) * (2 * n + 1) * (8 * n + 11) / 5)
    v = (6 * ((n + 1 - rb)**2).sum() - n2 * (n + 1) * (2 * n + 1)) / np.sqrt(
        n1 * n2 * (n + 1) * (2 * n + 1) * (8 * n + 11) / 5)
    rho = 2 * (n**2 - 4) / ((2 * n + 1) * (8 * n + 11)) - 1
    c = (u**2 + v**2 - 2 * rho * u * v) / (2 * (1 - rho**2))
    return u, v, rho, c


def test_cucconi_matches_numpy_replay(spark):
    got = _load_all()["stats_cucconi_test"].builder(spark, SF).toPandas()
    xa = _event_micro(SF, "purchase")
    xb = _event_micro(SF, "click")
    u, v, rho, c = _cucconi_numpy(xa, xb)
    row = got.iloc[0]
    assert row.n_a == len(xa) and row.n_b == len(xb)
    assert abs(row.u_sqrank - u) < 2e-3
    assert abs(row.v_contrary - v) < 2e-3
    assert abs(row.rho_uv - rho) < 1e-6
    assert abs(row.cucconi_c - c) < 1e-2
    assert row.reject_95 == int(c > -np.log(0.05))


def test_cucconi_textbook_cases():
    """Identical distributions: C small (under the e^-c null the 5%
    bound is -ln 0.05 ~ 3).  A joint location+scale alternative is
    rejected; U and -V move together under a pure location shift
    (the squared/contrary-rank symmetry)."""
    rng = np.random.RandomState(47)
    a = np.round(rng.normal(0, 1, 700) * 1e6)
    b = np.round(rng.normal(0, 1, 700) * 1e6)
    *_, c_null = _cucconi_numpy(a, b)
    assert c_null < 3.5
    shifted = np.round((rng.normal(0.4, 1.6, 700)) * 1e6)
    *_, c_alt = _cucconi_numpy(a, shifted)
    assert c_alt > 3 * 2.9957
    u, v, _, _ = _cucconi_numpy(a, np.round((rng.normal(0.5, 1, 700)) * 1e6))
    assert u * v < 0  # pure shift pushes U and V in opposite directions
