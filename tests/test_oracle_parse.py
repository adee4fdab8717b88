"""Every registered DuckDB oracle must at least PARSE/BIND against the
fixture views — a seconds-fast pytest gate that catches oracle syntax
or column drift without waiting for a full driver-sim execution pass.
(Execution-level value checks live in tools/driver_sim.py and the
official driver record; this is the cheap early tripwire.)"""

import duckdb
import pytest

SF = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def test_every_oracle_parses_and_binds_in_duckdb():
    from spark_lineage_spark.registry import load_all

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    failures = []
    for name, spec in load_all().items():
        if not spec.oracle:
            continue
        try:
            # EXPLAIN parses, binds and plans without executing
            con.execute(f"EXPLAIN {spec.oracle}")
        except Exception as e:  # noqa: BLE001 - collecting all failures
            failures.append((name, str(e).splitlines()[0][:120]))
    assert not failures, failures
