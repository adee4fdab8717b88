"""Registry hygiene: cheap guards that catch contract breakage without
spinning Spark — every oracle must BIND in DuckDB against the fixture
schemas, and the driver-ordering lists must only name real queries
(a typo there silently reorders the verification budget).
"""

import duckdb
import pytest

from spark_lineage_spark.registry import (
    _DRIVER_VERIFIED_ROUNDS_AGO,
    _VERIFY_FIRST,
    _VERIFY_LAST,
    load_all,
)
from spark_lineage_spark.tables import TABLES

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    con = duckdb.connect()
    for t in TABLES:
        # LIMIT 0: real schema, no data — binder checks only
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet') LIMIT 0"
        )
    return con


def test_all_oracles_bind_in_duckdb(con):
    failures = []
    for name, spec in load_all().items():
        if spec.oracle is None:
            continue
        try:
            con.execute(f"EXPLAIN {spec.oracle}")
        except Exception as e:
            failures.append((name, str(e).splitlines()[0]))
    assert not failures, failures


def test_ordering_lists_name_real_queries():
    known = set(load_all())
    for lst, label in [
        (_DRIVER_VERIFIED_ROUNDS_AGO, "_DRIVER_VERIFIED_ROUNDS_AGO"),
        (_VERIFY_FIRST, "_VERIFY_FIRST"),
        (_VERIFY_LAST, "_VERIFY_LAST"),
    ]:
        unknown = [n for n in lst if n not in known]
        assert not unknown, f"{label} names unknown queries: {unknown}"
        assert len(set(lst)) == len(lst), f"{label} has duplicates"


def test_ordering_lists_disjoint():
    first, last = set(_VERIFY_FIRST), set(_VERIFY_LAST)
    seen = set(_DRIVER_VERIFIED_ROUNDS_AGO)
    assert not (first & last)
    # a verified query needs no placement in either priority list
    assert not (first & seen), first & seen
    assert not (last & seen), last & seen
