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
