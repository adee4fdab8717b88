"""Unit tests for bench.py's storm trigger (VERDICT r10 item 1): the
query-local stall case that the median-only check missed must now fire
extra passes, using BENCH_r10's own dispersion profile as the fixture."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _storm_extra_passes


def _samples(spreads):
    """One query per spread value: samples [1.0, 1.0, spread, 1.0, 1.0]."""
    return {
        f"q{i}": [1.0, 1.0, float(s), 1.0, 1.0] for i, s in enumerate(spreads)
    }


def test_calm_window_no_extra_passes():
    assert _storm_extra_passes(_samples([1.1, 1.2, 1.3, 1.1, 1.0]), steal_delta=37) == 0


def test_steal_storm_triggers():
    assert _storm_extra_passes(_samples([1.1, 1.2, 1.3]), steal_delta=2000) == 3


def test_broad_dispersion_triggers_via_median():
    assert _storm_extra_passes(_samples([2.8, 3.4, 2.9, 3.1, 2.7]), steal_delta=0) == 3


def test_query_local_stall_triggers():
    """The BENCH_r10 gap: fn_string_battery spread 5.65 and
    llm_dedup_minhash_lsh 4.42 while the ACROSS-QUERY median stayed
    under 2.5 — the old median-only check let this pass untouched."""
    spreads = [1.2, 1.1, 1.3, 1.1, 1.2, 1.4, 1.1, 1.2, 1.3, 1.1, 1.2, 1.1, 1.3, 5.65, 4.42]
    samples = _samples(spreads)
    import statistics

    assert statistics.median(max(t) / min(t) for t in samples.values()) <= 2.5
    assert _storm_extra_passes(samples, steal_delta=0) == 3


def test_single_spread_just_under_threshold_stays_calm():
    assert _storm_extra_passes(_samples([1.1, 1.2, 2.9]), steal_delta=0) == 0


def test_empty_or_zero_samples_safe():
    assert _storm_extra_passes({}, steal_delta=9999) == 0
    assert _storm_extra_passes({"q": [0.0, 0.0]}, steal_delta=0) == 0


def test_calm_pass_selection_uses_all_calm_passes():
    from bench import _calm_pass_indices

    # 4 passes under the threshold -> all 4 selected
    assert _calm_pass_indices([10, 5000, 40, 0, 120]) == [0, 2, 3, 4]


def test_calm_pass_selection_falls_back_to_calmest_three():
    from bench import _calm_pass_indices

    # only 1 pass under threshold -> calmest 3 by steal, in pass order
    assert _calm_pass_indices([900, 40, 8000, 300, 4000]) == [0, 1, 3]


def test_calm_pass_selection_deterministic_on_ties():
    from bench import _calm_pass_indices

    assert _calm_pass_indices([500, 500, 500, 500, 500]) == [0, 1, 2]
