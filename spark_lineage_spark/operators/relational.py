"""Projection / filter / distinct / dedup (SURVEY.md §2.2) + flagship.

All declarative DataFrame ops — Catalyst pushes the filters and the
column pruning into the parquet scan (verified via explain in
tests/test_plans.py), so at 100 TB these are scan-bound with no
shuffle except the aggregations' partial+final hash agg.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from spark_lineage_spark.registry import query
from spark_lineage_spark.tables import load

# ---------------------------------------------------------------------------
# flagship: scan -> filter -> join -> agg (one query touching the core path)
# ---------------------------------------------------------------------------


def flagship_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by order status & return flag for shipped-before-cutoff items.

    Join strategy at scale: lineitem⋈orders is a key join on o_orderkey;
    orders is the smaller side but not broadcast-small at 100 TB, so this
    stays a shuffle join co-partitioned on the key — AQE handles skew.
    Aggregation is partial (map-side) + final, 2-phase, via Catalyst.
    """
    # ONE sql() text (optimization r14, guide §7.3): identical plan to
    # the previous Column chain, built JVM-side in a single py4j
    # round-trip (~0.15 s less per-invocation driver time).
    from spark_lineage_spark.tables import table_path

    return spark.sql(f"""
        SELECT o_orderstatus, l_returnflag,
               round(sum(l_quantity), 2) AS sum_qty,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
               round(avg(l_discount), 6) AS avg_disc,
               count(*) AS count_order
        FROM parquet.`{table_path(sf_dir, "lineitem")}` li
        JOIN parquet.`{table_path(sf_dir, "orders")}` o
          ON l_orderkey = o_orderkey
        WHERE l_shipdate <= '2000-12-01'
        GROUP BY o_orderstatus, l_returnflag
    """)


FLAGSHIP_ORACLE = """
SELECT o_orderstatus, l_returnflag,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(avg(l_discount), 6) AS avg_disc,
       count(*) AS count_order
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
GROUP BY o_orderstatus, l_returnflag
"""

query("flagship_pricing_join", "§2 flagship: scan→filter→join→agg", FLAGSHIP_ORACLE)(flagship_df)


# ---------------------------------------------------------------------------
# §2.2 projection / filters
# ---------------------------------------------------------------------------


@query(
    "proj_select_compute",
    "§2.2 project: subset/rename/compute",
    """
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS revenue,
           l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charged,
           l_returnflag AS flag
    FROM lineitem
    """,
)
def proj_select_compute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-row arithmetic stays unrounded: identical IEEE ops in the same
    association order are bitwise-equal across engines. Only aggregates
    (order-nondeterministic sums) get rounded (determinism discipline)."""
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        (F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))).alias(
            "charged"
        ),
        F.col("l_returnflag").alias("flag"),
    )


@query(
    "filter_compare_bool",
    "§2.2 filter: comparison + boolean logic",
    """
    SELECT o_orderkey, o_orderstatus, round(o_totalprice, 2) AS total
    FROM orders
    WHERE o_totalprice > 150000.0
      AND (o_orderstatus = 'F' OR o_orderpriority <> '1-URGENT')
      AND NOT (o_custkey < 10)
    """,
)
def filter_compare_bool(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.filter(
        (F.col("o_totalprice") > 150000.0)
        & ((F.col("o_orderstatus") == "F") | (F.col("o_orderpriority") != "1-URGENT"))
        & ~(F.col("o_custkey") < 10)
    ).select("o_orderkey", "o_orderstatus", F.round("o_totalprice", 2).alias("total"))


@query(
    "filter_between_in_like",
    "§2.2 filter: BETWEEN / IN / LIKE",
    """
    SELECT p_partkey, p_name, p_brand, p_size
    FROM part
    WHERE p_size BETWEEN 10 AND 20
      AND p_brand IN ('Brand#1', 'Brand#7', 'Brand#13')
      AND p_name LIKE '%ar%'
    """,
)
def filter_between_in_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    return p.filter(
        F.col("p_size").between(10, 20)
        & F.col("p_brand").isin("Brand#1", "Brand#7", "Brand#13")
        & F.col("p_name").like("%ar%")
    ).select("p_partkey", "p_name", "p_brand", "p_size")


@query(
    "filter_null_semantics",
    "§2.2 filter: IS NULL / null-safe equality",
    """
    SELECT o_orderkey,
           nullif(o_orderstatus, 'P') AS status_np,
           (nullif(o_orderstatus, 'P') IS NOT DISTINCT FROM 'F') AS is_f_nullsafe
    FROM orders
    WHERE nullif(o_orderstatus, 'P') IS NULL OR o_totalprice < 50000.0
    """,
)
def filter_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    status_np = F.nullif(F.col("o_orderstatus"), F.lit("P"))
    return (
        o.select(
            "o_orderkey",
            status_np.alias("status_np"),
            status_np.eqNullSafe(F.lit("F")).alias("is_f_nullsafe"),
            "o_totalprice",
        )
        .filter(F.col("status_np").isNull() | (F.col("o_totalprice") < 50000.0))
        .drop("o_totalprice")
    )


@query(
    "distinct_rows",
    "§2.2 distinct",
    "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
)
def distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus").distinct()


@query(
    "dedup_by_key_deterministic",
    "§2.2 dropDuplicates(subset) — deterministic variant",
    """
    SELECT o_custkey, o_orderkey, o_orderdate
    FROM orders
    QUALIFY row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) = 1
    """,
)
def dedup_by_key_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dropDuplicates keeps an arbitrary row; the deterministic contract
    is row_number()=1 under an explicit order (SURVEY §2.2 notes)."""
    from pyspark.sql import Window

    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", "o_orderdate")
    )


@query(
    "dedup_projected_subset",
    "§2.2 dropDuplicates on projected identical rows",
    "SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders",
)
def dedup_projected_subset(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "orders").select("o_orderstatus", "o_orderpriority").dropDuplicates()


@query("sample_seeded", "§2.2 sample (bernoulli, seeded) — rows-only", None)
def sample_seeded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nondeterministic across engines (SURVEY §2.2) — rows-only check.
    The hash-gated companion is sample_hash_deterministic below: same
    bernoulli-0.1 semantics, but seeded from the row KEY instead of
    the engine RNG, so both engines select the identical row set."""
    return (
        load(spark, sf_dir, "lineitem")
        .sample(fraction=0.1, seed=42)
        .select("l_orderkey", "l_linenumber", "l_quantity")
    )


@query(
    "sample_hash_deterministic",
    "§2.2 key-hash bernoulli sample (engine-portable seeded sampling, full oracle)",
    """
    SELECT l_orderkey, l_linenumber, l_quantity
    FROM lineitem
    WHERE CAST(CAST(concat('0x', substr(md5(concat(
              CAST(l_orderkey AS VARCHAR), '_',
              CAST(l_linenumber AS VARCHAR), '_seed42')), 1, 15))
            AS BIGINT) AS DOUBLE) / 1152921504606846976 < 0.1
    """,
)
def sample_hash_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic bernoulli sampling — the production replacement
    for engine-RNG .sample() when a sample must be REPRODUCIBLE
    across engines, reruns, and cluster sizes (VERDICT r12 item 4:
    the hash-gated companion to sample_seeded): u = md5(key, seed)
    first 15 hex digits / 2^60 is a uniform in [0,1) computed
    identically by Spark's conv() and DuckDB's hex cast (the proven
    stats_bootstrap_ci idiom), and the row is kept iff u < fraction.
    Same marginal statistics as .sample(0.1), but membership is a
    pure function of the row key — at 100 TB the sample is stable
    under retries, speculative execution, and partition re-splits,
    none of which hold for the engine-RNG path.

    Shape at any SF: map-only scan with the filter evaluated per row
    in whole-stage codegen (one md5 per row); no shuffle at all."""
    li = load(spark, sf_dir, "lineitem")
    u = (
        F.expr(
            "CAST(conv(substring(md5(CAST(concat("
            "CAST(l_orderkey AS STRING), '_', CAST(l_linenumber AS STRING),"
            " '_seed42') AS BINARY)), 1, 15), 16, 10) AS DOUBLE)"
        )
        / F.lit(1152921504606846976)
    )
    return li.filter(u < 0.1).select("l_orderkey", "l_linenumber", "l_quantity")
