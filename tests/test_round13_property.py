"""Hypothesis properties for the round-13 algebra — pure python, no
Spark: each test pins an IDENTITY or a brute-force equivalence the
shared SQL relies on, on random data, so the derivation is validated
in general, not just at the fixture point (tests/test_round13_ops.py
covers that)."""

import math

import numpy as np
from hypothesis import given, settings, strategies as st

small_vals = st.lists(
    st.integers(min_value=0, max_value=12), min_size=10, max_size=60
)
groups = st.lists(st.integers(min_value=1, max_value=4), min_size=10, max_size=60)


@settings(max_examples=60, deadline=None)
@given(small_vals, groups)
def test_jonckheere_prefix_sum_equals_bruteforce(vals, gs):
    """stats_jonckheere_terpstra counts 2*U_ij per value cell as
    c_j * (2*F_i(<v) + c_i(v)); summed over cells this must equal the
    brute-force pairwise count 2*(#{x_i < x_j} + 0.5*#{x_i == x_j})
    for every ordered group pair — the identity that lets the corpus
    stay unsorted."""
    n = min(len(vals), len(gs))
    vals, gs = np.array(vals[:n]), np.array(gs[:n])
    k = 4
    cells = sorted(set(vals.tolist()))
    # operator form: per-cell counts + prefix sums
    jt2_op = 0
    cum = {g: 0 for g in range(1, k + 1)}
    for v in cells:
        c = {g: int(((vals == v) & (gs == g)).sum()) for g in range(1, k + 1)}
        for i in range(1, k + 1):
            for j in range(i + 1, k + 1):
                jt2_op += c[j] * (2 * cum[i] + c[i])
        for g in range(1, k + 1):
            cum[g] += c[g]
    # brute force
    jt2_bf = 0
    for i in range(1, k + 1):
        for j in range(i + 1, k + 1):
            xi, xj = vals[gs == i], vals[gs == j]
            jt2_bf += 2 * int((xi[:, None] < xj[None, :]).sum())
            jt2_bf += int((xi[:, None] == xj[None, :]).sum())
    assert jt2_op == jt2_bf


@settings(max_examples=60, deadline=None)
@given(small_vals, groups)
def test_dunn_doubled_midranks_equal_scipy_convention(vals, gs):
    """stats_dunn_test derives per-group mean ranks from doubled-unit
    prefix sums (2r = 2F(<v) + t_v + 1); they must equal pandas
    method='average' mid-ranks exactly for every group."""
    import pandas as pd

    n = min(len(vals), len(gs))
    vals, gs = np.array(vals[:n]), np.array(gs[:n])
    ranks = pd.Series(vals).rank(method="average").to_numpy()
    cells = sorted(set(vals.tolist()))
    cum = 0
    r2 = {}  # value -> doubled midrank
    for v in cells:
        t = int((vals == v).sum())
        r2[v] = 2 * cum + t + 1
        cum += t
    for g in set(gs.tolist()):
        mask = gs == g
        op_mean = sum(r2[v] for v in vals[mask]) / 2 / mask.sum()
        assert abs(op_mean - ranks[mask].mean()) < 1e-12


@settings(max_examples=40, deadline=None)
@given(st.integers(min_value=1, max_value=40), st.integers(min_value=0, max_value=40))
def test_sign_test_spine_tail_equals_exact_binomial(n_extra, k_pos):
    """stats_sign_test's log-factorial-spine tail must equal the exact
    rational binomial(n, 1/2) lower tail."""
    n = k_pos + n_extra
    kmin = min(k_pos, n - k_pos)
    tail_spine = sum(
        math.exp(
            math.lgamma(n + 1) - math.lgamma(i + 1) - math.lgamma(n - i + 1)
            - n * math.log(2)
        )
        for i in range(kmin + 1)
    )
    tail_exact = sum(math.comb(n, i) for i in range(kmin + 1)) / 2**n
    assert abs(tail_spine - tail_exact) < 1e-9


@settings(max_examples=60, deadline=None)
@given(st.lists(st.integers(min_value=-10**6, max_value=10**6),
                min_size=6, max_size=40))
def test_variance_ratio_is_one_at_q1_and_moment_form_matches(ys):
    """ts_variance_ratio's moment form (Sxx - Sx^2/n)/(n-1) must equal
    numpy's ddof=1 variance, and VR(1) is identically 1."""
    y = np.array(ys, dtype=np.float64)
    n = len(y)
    sx, sxx = y.sum(), (y * y).sum()
    var_moment = (sxx - sx * sx / n) / (n - 1)
    var_np = y.var(ddof=1)
    assert abs(var_moment - var_np) < 1e-6 * max(1.0, abs(var_np))
    if var_np > 0:
        assert abs(var_moment / (1 * var_np) - 1.0) < 1e-9


@settings(max_examples=60, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 3), st.integers(0, 1),
                          st.integers(0, 1)), min_size=8, max_size=80))
def test_cmh_reduces_to_chi_square_with_one_stratum(rows):
    """With a single stratum, the CMH statistic (no continuity
    correction) must equal the classic 2x2 Pearson chi-square with
    the (n-1)/n hypergeometric-variance factor — the textbook
    reduction that validates the dev/var algebra."""
    a = sum(1 for _, x, y in rows if x and y)
    b = sum(1 for _, x, y in rows if x and not y)
    c = sum(1 for _, x, y in rows if not x and y)
    d = sum(1 for _, x, y in rows if not x and not y)
    n = a + b + c + d
    r1, r2, c1, c2 = a + b, c + d, a + c, b + d
    if min(r1, r2, c1, c2) == 0 or n < 2:
        return
    dev = a - r1 * c1 / n
    var = r1 * r2 * c1 * c2 / (n * n * (n - 1))
    cmh = dev * dev / var
    chi2 = n * (a * d - b * c) ** 2 / (r1 * r2 * c1 * c2)
    # dev = (ad-bc)/n and var = r1 r2 c1 c2 / (n^2 (n-1)), so
    # CMH = (ad-bc)^2 (n-1) / (r1 r2 c1 c2) = chi2 * (n-1)/n
    assert abs(cmh - chi2 * (n - 1) / n) < 1e-9 * max(1.0, chi2)


@settings(max_examples=60, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=10**6),
                min_size=3, max_size=30))
def test_rich_club_threshold_ceil_is_exact(degs):
    """graph_rich_club's integer ceiling (2E*j + 10N - 1) div (10N)
    must equal ceil(mean_deg * j/10) exactly for every j in 8..13."""
    n = len(degs)
    deg_sum = sum(degs)
    for j in range(8, 14):
        k_int = (deg_sum * j + 10 * n - 1) // (10 * n)
        k_math = math.ceil(deg_sum * j / (10 * n))
        assert k_int == k_math
