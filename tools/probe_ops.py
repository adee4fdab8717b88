"""Quick per-op probe: warm best-of-N wall time with noop sink and
per-rep steal delta, for picking optimization targets (guide §1).

Usage: python tools/probe_ops.py [--sf DIR] [--reps N] name [name...]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def steal() -> int:
    with open("/proc/stat") as f:
        return int(f.readline().split()[8])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    from spark_lineage_spark.registry import load_all
    from spark_lineage_spark.session import build_spark

    specs = load_all()
    spark = build_spark("sls_probe")
    specs["flagship_pricing_join"].builder(spark, "/root/testdata/sf0.001").count()

    for name in args.names:
        times = []
        for _ in range(args.reps):
            s0, t0 = steal(), time.time()
            specs[name].builder(spark, args.sf).write.format("noop").mode(
                "overwrite"
            ).save()
            times.append((round(time.time() - t0, 3), steal() - s0))
        print(f"{name:36s} " + "  ".join(f"{t}s/{s}st" for t, s in times), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
