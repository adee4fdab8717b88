"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (scan→filter→join→agg) on
sf0.001 through the LineageSession facade, emitting a lineage report
as a side effect (the engine's identity — SURVEY.md §0).

``queries()`` / ``oracle_sql()`` expose the SURVEY.md §2 operator
inventory from ``spark_lineage_spark.registry`` — every implemented
operator registers a builder + (when SQL-expressible) a DuckDB oracle.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from spark_lineage_spark.registry import load_all  # noqa: E402
from spark_lineage_spark.tables import SMOKE_SF_DIR  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from spark_lineage_spark import LineageSession
    from spark_lineage_spark.operators.relational import flagship_df
    from spark_lineage_spark.session import tune_runtime

    tune_runtime(spark)
    # Pre-warm the Python/Arrow worker pool (daemon + one worker per
    # core): the first pandas-UDF stage of a session otherwise pays
    # ~5 s of fork/handshake, which would land on whichever registry
    # query happens to run first. One trivial 32-task mapInPandas pass
    # moves that cost here, where the smoke check absorbs it.
    try:
        par = spark.sparkContext.defaultParallelism
        spark.range(par).repartition(par).mapInPandas(
            lambda it: it, "id long"
        ).count()
    except Exception:
        pass  # warm-up is best-effort; never fail the smoke check
    engine = LineageSession(spark)
    df = flagship_df(spark, SMOKE_SF_DIR)
    # run through the facade once so the smoke check also exercises
    # lineage capture (report lands in the JSONL log)
    engine._wrap(df).count()
    return df


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.builder for name, spec in load_all().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; omitted => rows-only check."""
    return {name: spec.oracle for name, spec in load_all().items() if spec.oracle is not None}
