"""Simulate the grading driver against the public contract.

Fresh process: import /root/repo/__spark_entry__.py, build a *plain*
SparkSession (exactly what the external driver does — not our
build_spark), then:

  1. entry(spark).collect() -> rows > 0, and a lineage report was
     appended to /tmp/sls_lineage/reports.jsonl naming lineitem+orders.
  2. every queries()[name](spark, sf_dir) -> pandas, compared against
     oracle_sql()[name] run in DuckDB over the same parquet views —
     order-insensitive (sort columns by name, sort rows, astype(str)),
     mimicking the driver's value hash. Queries without an oracle are
     recorded rows-only.

Usage: python tools/driver_sim.py [--sf /root/testdata/sf0.01] [names...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def compare(spark_pdf, duck_pdf) -> str:
    if len(spark_pdf) != len(duck_pdf):
        return f"rows {len(spark_pdf)} != {len(duck_pdf)}"
    scols, dcols = sorted(spark_pdf.columns), sorted(duck_pdf.columns)
    if scols != dcols:
        return f"cols {scols} != {dcols}"
    a = spark_pdf[scols].astype(str).sort_values(scols).reset_index(drop=True)
    b = duck_pdf[scols].astype(str).sort_values(scols).reset_index(drop=True)
    if not a.equals(b):
        neq = (a != b).any(axis=1)
        return f"values differ in {int(neq.sum())} rows (first: {a[neq].head(1).to_dict()} vs {b[neq].head(1).to_dict()})"
    return ""


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import duckdb
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "32")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as E

    report_path = "/tmp/sls_lineage/reports.jsonl"

    def nlines() -> int:
        try:
            with open(report_path) as f:
                return sum(1 for _ in f)
        except OSError:
            return 0

    before = nlines()
    rows = E.entry(spark).collect()
    assert len(rows) > 0, "entry() returned 0 rows"
    assert nlines() > before, "entry() emitted no lineage report"
    with open(report_path) as f:
        last = json.loads(f.readlines()[-1])
    inames = {os.path.basename(i.get("name", "")).split(".")[0] for i in last["inputs"]}
    assert {"lineitem", "orders"} <= inames, f"lineage inputs wrong: {inames}"
    print(f"entry(): {len(rows)} rows, lineage ok ({sorted(inames)})", flush=True)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{args.sf}/{t}.parquet')"
        )

    queries, oracles = E.queries(), E.oracle_sql()
    names = args.names or list(queries)
    n_pass = n_fail = n_rowsonly = 0
    failures = []
    for name in names:
        t0 = time.time()
        try:
            pdf = queries[name](spark, args.sf).toPandas()
            if name in oracles:
                opdf = con.execute(oracles[name]).df()
                err = compare(pdf, opdf)
                if err:
                    n_fail += 1
                    failures.append((name, err))
                    print(f"FAIL  {name}: {err}", flush=True)
                else:
                    n_pass += 1
                    print(f"pass  {name} ({time.time()-t0:.1f}s, {len(pdf)} rows)", flush=True)
            else:
                n_rowsonly += 1
                print(f"rows  {name} ({time.time()-t0:.1f}s, {len(pdf)} rows)", flush=True)
        except Exception as e:
            n_fail += 1
            failures.append((name, f"{type(e).__name__}: {e}"))
            print(f"ERROR {name}: {type(e).__name__}: {e}", flush=True)
    print(f"\n== driver-sim: {n_pass} pass, {n_rowsonly} rows-only, {n_fail} fail ==")
    for name, err in failures:
        print(f"  FAIL {name}: {err[:300]}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
