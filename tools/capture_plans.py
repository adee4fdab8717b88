"""Capture .explain("formatted") output for named queries into
plans/<round>/<name>_<tag>.txt (the optimization-round evidence trail:
the judge checks plan claims against these files).

Usage: python tools/capture_plans.py --tag before [--round r14] [--sf DIR] name...
       (no names => the bench HEADLINE list)
"""

from __future__ import annotations

import argparse
import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", required=True)
    ap.add_argument("--round", default="r14")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    from bench import HEADLINE
    from spark_lineage_spark.registry import load_all
    from spark_lineage_spark.session import build_spark

    names = args.names or list(HEADLINE)
    outdir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                          "plans", args.round)
    os.makedirs(outdir, exist_ok=True)
    spark = build_spark("sls_capture_plans")
    specs = load_all()
    for name in names:
        df = specs[name].builder(spark, args.sf)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(outdir, f"{name}_{args.tag}.txt")
        with open(path, "w") as f:
            f.write(f"== {name} @ {args.sf} ==\n")
            f.write(buf.getvalue())
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
