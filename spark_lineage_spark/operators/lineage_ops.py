"""Lineage operators as queries (SURVEY.md §2.12): the engine's own
surface, dogfooded — run a pipeline through the facade, then query the
captured lineage log as a DataFrame.

The reports themselves are asserted structurally in
tests/test_lineage.py (golden tests); here the driver gets a
rows-only entry proving the lineage store is engine-queryable
(SURVEY §1.4: "the catalog is itself a table").
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession, functions as F

from spark_lineage_spark.registry import query
from spark_lineage_spark.tables import load


@query("lineage_catalog_query", "§2.12 lineage log as a queryable table — rows-only", None)
def lineage_catalog_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run a read→transform→write pipeline through LineageSession,
    then read the JSONL lineage log back and aggregate it: one row per
    (func_name) with input counts — the data-catalog behavior of the
    reference (observe queries, store metadata, make it queryable)."""
    from spark_lineage_spark import LineageSession
    from spark_lineage_spark.plans.reporters import JsonlReporter

    path = os.path.join(tempfile.mkdtemp(prefix="sls_lineage_q_"), "reports.jsonl")
    engine = LineageSession(spark, reporter=JsonlReporter(path))

    # pipeline 1: scan -> filter -> agg -> count (action)
    nat = engine._wrap(
        load(spark, sf_dir, "nation").filter(F.col("n_regionkey") >= 0).groupBy("n_regionkey").count()
    )
    nat.count()
    # pipeline 2: join -> write parquet (output lineage)
    out_dir = os.path.join(tempfile.mkdtemp(prefix="sls_lineage_out_"), "joined")
    joined = engine._wrap(
        load(spark, sf_dir, "region").join(
            load(spark, sf_dir, "nation"),
            F.col("r_regionkey") == F.col("n_regionkey"),
        )
    )
    joined.write.mode("overwrite").parquet(out_dir)

    lineage = engine.lineage()
    return (
        lineage.select(
            F.col("run.func_name").alias("func_name"),
            F.size("inputs").alias("n_inputs"),
            F.col("output.kind").alias("output_kind"),
        )
        .groupBy("func_name", "output_kind")
        .agg(F.count("*").alias("n_reports"), F.max("n_inputs").alias("max_inputs"))
    )
