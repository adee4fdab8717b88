"""Property tests for the round-8 SQL-misc battery pieces whose
engine-level sampling can't be oracle-checked cross-engine."""

import pytest
from pyspark.sql import functions as F


def _sample_counts(spark, sf_dir, seed):
    from spark_lineage_spark.tables import register_views

    register_views(spark, sf_dir, ["lineitem"])
    return {
        r.l_returnflag: r.n_sampled
        for r in spark.sql(
            f"""
            SELECT l_returnflag, count(*) AS n_sampled
            FROM lineitem TABLESAMPLE (10 PERCENT) REPEATABLE ({seed})
            GROUP BY l_returnflag
            """
        ).collect()
    }


def test_tablesample_fraction_bounds(spark, sf_dir):
    from spark_lineage_spark.tables import load

    total = load(spark, sf_dir, "lineitem").count()
    sampled = sum(_sample_counts(spark, sf_dir, 42).values())
    # Bernoulli(0.1): mean 0.1*n, sd ~ sqrt(0.09*n); 6 sigma bounds
    import math

    mean, sd = 0.1 * total, math.sqrt(0.1 * 0.9 * total)
    assert mean - 6 * sd <= sampled <= mean + 6 * sd, (sampled, total)


def test_tablesample_seed_repeatable(spark, sf_dir):
    a = _sample_counts(spark, sf_dir, 42)
    b = _sample_counts(spark, sf_dir, 42)
    c = _sample_counts(spark, sf_dir, 7)
    assert a == b, "same REPEATABLE seed must reproduce the sample"
    assert a != c, "different seeds should (overwhelmingly) differ"
