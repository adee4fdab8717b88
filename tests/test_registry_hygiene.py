"""Registry hygiene: cheap guards that catch contract breakage without
spinning Spark — every oracle must BIND in DuckDB against the fixture
schemas, and the driver-ordering lists must only name real queries
(a typo there silently reorders the verification budget).
"""

import duckdb
import pytest

from spark_lineage_spark.registry import (
    _DRIVER_VERIFIED_ROUNDS_AGO,
    _VERIFY_AFTER,
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
        (_VERIFY_AFTER, "_VERIFY_AFTER"),
    ]:
        unknown = [n for n in lst if n not in known]
        assert not unknown, f"{label} names unknown queries: {unknown}"
        assert len(set(lst)) == len(lst), f"{label} has duplicates"


def test_ordering_lists_disjoint():
    first, last = set(_VERIFY_FIRST), set(_VERIFY_LAST)
    after = set(_VERIFY_AFTER)
    seen = set(_DRIVER_VERIFIED_ROUNDS_AGO)
    assert not (first & last) and not (first & after) and not (last & after)
    # a verified query needs no placement in any priority list (a
    # query queued for RE-verification moves out of the verified list)
    assert not (first & seen), first & seen
    assert not (last & seen), last & seen
    assert not (after & seen), after & seen


def test_driver_budget_lands_on_the_50_unrecorded():
    """The first 50 names load_all() yields must be exactly
    _VERIFY_FIRST + _VERIFY_LAST — the 50 queries still lacking an
    official CORRECTNESS row after round 5. Anything displacing them
    (a typo'd list entry falling into the catch-all middle, a new
    query registered outside _VERIFY_AFTER) breaks the round-6 close
    of official coverage."""
    head = _VERIFY_FIRST + _VERIFY_LAST
    names = list(load_all())
    assert names[: len(head)] == head
