"""Benchmark harness (driver contract): runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Method (BASELINE.md): warm session; per query one warm-up-free timed
loop (best of N_RUNS) with a noop-sink action so every column is
materialized (a bare count() would let Catalyst prune the computed
columns away).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from spark_lineage_spark.registry import load_all
from spark_lineage_spark.session import build_spark

# Representative headline set: relational core, joins, windows,
# streaming, and every LLM-pipeline op family (SURVEY.md §6/§2.11).
HEADLINE = [
    ("tpch_q1_style_full", 2),
    ("tpch_q5_style_regional_volume", 2),
    ("flagship_pricing_join", 2),
    ("join_inner_equi", 2),
    ("join_asof", 2),
    ("agg_rollup", 2),
    ("agg_count_distinct", 2),
    ("win_ranking", 2),
    ("fn_string_battery", 2),
    ("llm_dedup_exact", 2),
    ("llm_text_quality", 2),
    ("llm_text_fingerprint", 2),
    ("llm_knn_cosine_exact", 2),
    ("llm_dedup_minhash_lsh", 2),
    ("stream_tumbling_window", 1),
]


def materialize(df) -> None:
    """Run the full plan without collecting to the driver."""
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    specs = load_all()
    spark = build_spark("sls_bench")
    # JVM/codegen warm-up on a tiny query (not timed)
    materialize(specs["flagship_pricing_join"].builder(spark, "/root/testdata/sf0.001"))

    timings: dict[str, float] = {}
    for name, runs in HEADLINE:
        spec = specs[name]
        best = float("inf")
        for _ in range(runs):
            t0 = time.time()
            materialize(spec.builder(spark, sf_dir))
            best = min(best, time.time() - t0)
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        sf = float(base[2:]) if base.startswith("sf") else base
    except ValueError:
        sf = base  # non-numeric dir name: report it verbatim
    print(
        json.dumps(
            {
                "metric": "headline_query_wall_time_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
