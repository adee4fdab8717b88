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
