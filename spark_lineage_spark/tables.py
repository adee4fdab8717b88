"""Test-table access (driver-generated parquet, TESTDATA.md).

Tables: region nation customer supplier part orders lineitem events
documents embeddings — one parquet each under /root/testdata/sf*/.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SMOKE_SF_DIR = "/root/testdata/sf0.001"


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one table. Parquet scan: columnar, predicate/column pushdown
    comes free from Catalyst as long as downstream code stays
    declarative (SURVEY.md §4).

    events.ts must come out as TimestampType (LTZ) whatever the fixture
    generation produced — the fixtures have shipped as TIMESTAMP(NANOS)
    (read as raw int64 ns under legacy.parquet.nanosAsLong) and as
    timestamp[us] (read as TIMESTAMP_NTZ). Watermarks and unix_micros
    require LTZ; the session tz is pinned UTC (session.py) so the
    NTZ→LTZ cast preserves the wall clock and the DuckDB oracle hash.
    The oracle must date_trunc('microseconds', ts) to align when the
    fixture is nanos (tools/check_oracle, tests).
    """
    df = spark.read.parquet(table_path(sf_dir, name))
    if name == "events":
        df = _normalize_ts(df)
    return df


def _normalize_ts(df: DataFrame, col: str = "ts") -> DataFrame:
    """Normalize the event-time column to TimestampType (LTZ)."""
    from pyspark.sql import functions as F

    dtype = dict(df.dtypes).get(col)
    if dtype == "bigint":
        # int64 nanoseconds: integer division — ts/1000 via double would
        # lose precision (1.7e18 ns exceeds the 2^53 exact-integer range)
        df = df.withColumn(col, F.timestamp_micros(F.expr(f"{col} div 1000")))
    elif dtype == "timestamp_ntz":
        # A bare NTZ→LTZ cast interprets the wall clock in the SESSION
        # timezone; on a non-UTC host with an untuned session that
        # shifts the epoch instant and every epoch-anchored result
        # (window() buckets, unix_micros) diverges from the oracle.
        # Convert tz-FREE instead: wall-clock micros since the NTZ
        # epoch (pure calendar arithmetic, no timezone involved), then
        # timestamp_micros reattaches the instant. No session conf is
        # read or mutated — callers keep whatever timezone they set.
        df = df.withColumn(
            col,
            F.timestamp_micros(
                F.expr(
                    f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', {col})"
                )
            ),
        )
    return df


def register_views(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> None:
    for name in names or TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
