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

    events.ts is TIMESTAMP(NANOS) parquet — Spark 4 has no ns timestamp
    type, so it is read as raw int64 ns (legacy.parquet.nanosAsLong) and
    floor-converted to µs TimestampType here. The DuckDB oracle must
    date_trunc('microseconds', ts) to align (tools/check_oracle, tests).
    """
    df = spark.read.parquet(table_path(sf_dir, name))
    if name == "events":
        from pyspark.sql import functions as F
        from pyspark.sql.types import LongType

        if isinstance(df.schema["ts"].dataType, LongType):
            # integer division — ts/1000 via double would lose precision
            # (1.7e18 ns exceeds the 2^53 exact-integer range)
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def register_views(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> None:
    for name in names or TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
