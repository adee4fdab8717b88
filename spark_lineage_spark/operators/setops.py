"""Set operations (SURVEY.md §2.7) and sort/limit/top-k (§2.6).

Set ops in Spark: UNION ALL is a no-shuffle concat; DISTINCT/INTERSECT/
EXCEPT variants shuffle on the full row — at 100 TB prefer pre-
aggregated or keyed sides (as done here) so the shuffled width is
narrow.

Sort/limit: a bare limit is nondeterministic (partition order) —
every limit here follows a total order with an explicit tie-break;
Spark plans orderBy+limit as TakeOrderedAndProject (no global sort
materialization).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from spark_lineage_spark.registry import query
from spark_lineage_spark.tables import load


def _halves(spark, sf_dir):
    o = load(spark, sf_dir, "orders").select("o_orderstatus", "o_orderpriority")
    lo = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") < 200000.0).select(
        "o_orderstatus", "o_orderpriority"
    )
    return o, lo


@query(
    "set_union_all",
    "§2.7 union all (by position) + unionByName",
    """
    SELECT o_orderstatus, o_orderpriority, count(*) AS n FROM (
      SELECT o_orderstatus, o_orderpriority FROM orders
      UNION ALL
      SELECT o_orderstatus, o_orderpriority FROM orders WHERE o_totalprice < 200000.0
    ) GROUP BY o_orderstatus, o_orderpriority
    """,
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    a, b = _halves(spark, sf_dir)
    # unionByName: same result here, exercises the by-name resolution
    return a.unionByName(b.select("o_orderpriority", "o_orderstatus")).groupBy(
        "o_orderstatus", "o_orderpriority"
    ).agg(F.count("*").alias("n"))


@query(
    "set_union_distinct",
    "§2.7 union distinct",
    """
    SELECT o_orderstatus, o_orderpriority FROM orders
    UNION
    SELECT o_orderstatus, o_orderpriority FROM orders WHERE o_totalprice < 200000.0
    """,
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    a, b = _halves(spark, sf_dir)
    return a.union(b).distinct()


@query(
    "set_intersect",
    "§2.7 intersect (distinct)",
    """
    SELECT c_nationkey FROM customer WHERE c_acctbal > 0
    INTERSECT
    SELECT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    a = c.filter(F.col("c_acctbal") > 0).select("c_nationkey")
    b = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_nationkey")
    return a.intersect(b)


@query(
    "set_intersect_all",
    "§2.7 intersect all (bag semantics)",
    """
    SELECT o_orderstatus FROM orders WHERE o_totalprice > 100000.0
    INTERSECT ALL
    SELECT o_orderstatus FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    a = o.filter(F.col("o_totalprice") > 100000.0).select("o_orderstatus")
    b = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_orderstatus")
    return a.intersectAll(b)


@query(
    "set_except",
    "§2.7 except (distinct)",
    """
    SELECT c_custkey FROM customer
    EXCEPT
    SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").select("c_custkey")
    f = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return c.subtract(f)


@query(
    "set_except_all",
    "§2.7 except all (bag semantics)",
    """
    SELECT o_orderstatus FROM orders
    EXCEPT ALL
    SELECT o_orderstatus FROM orders WHERE o_totalprice > 150000.0
    """,
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.select("o_orderstatus").exceptAll(
        o.filter(F.col("o_totalprice") > 150000.0).select("o_orderstatus")
    )


# ---------------------------------------------------------------------------
# §2.6 sort / limit / top-k / offset
# ---------------------------------------------------------------------------


@query(
    "sort_topk",
    "§2.6 top-k (orderBy + limit, tie-broken)",
    """
    SELECT o_orderkey, round(o_totalprice, 2) AS total
    FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 25
    """,
)
def sort_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return (
        o.orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(25)
        .select("o_orderkey", F.round("o_totalprice", 2).alias("total"))
    )


@query(
    "sort_offset",
    "§2.6 offset + limit after total order",
    """
    SELECT o_orderkey, round(o_totalprice, 2) AS total
    FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 25 OFFSET 25
    """,
)
def sort_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return (
        o.orderBy(F.desc("o_totalprice"), "o_orderkey")
        .offset(25)
        .limit(25)
        .select("o_orderkey", F.round("o_totalprice", 2).alias("total"))
    )


@query(
    "sort_nulls_placement",
    "§2.6 global sort with NULLS FIRST/LAST",
    """
    SELECT o_orderkey, nullif(o_orderstatus, 'P') AS status_np
    FROM orders
    ORDER BY status_np NULLS FIRST, o_orderkey LIMIT 40
    """,
)
def sort_nulls_placement(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", F.nullif("o_orderstatus", F.lit("P")).alias("status_np"))
        .orderBy(F.col("status_np").asc_nulls_first(), "o_orderkey")
        .limit(40)
    )


@query(
    "sort_rank_materialized",
    "§2.6 global total order materialized as rank",
    """
    SELECT o_orderkey,
           row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS rnk
    FROM orders QUALIFY rnk <= 100
    """,
)
def sort_rank_materialized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-insensitive value-hash can't see row order, so the total
    order is materialized as a rank column (SURVEY §2.6 note). The
    empty-partition window is fine at test SF; at scale use zipWithIndex
    -style two-pass or limit pushdown instead."""
    o = load(spark, sf_dir, "orders")
    w = Window.orderBy(F.desc("o_totalprice"), "o_orderkey")
    return (
        o.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 100)
        .select("o_orderkey", "rnk")
    )


@query(
    "set_union_missing_columns",
    "§2.7 unionByName with missing columns (schema-evolved union)",
    """
    WITH old_style AS (
      SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 3 = 0
    ),
    new_style AS (
      SELECT o_orderkey, o_totalprice, o_orderpriority
      FROM orders WHERE o_orderkey % 3 = 1
    )
    SELECT coalesce(o_orderpriority, 'none') AS prio,
           count(*) AS n,
           round(sum(cast(o_totalprice AS DECIMAL(18,2))), 2) AS total
    FROM (
      SELECT o_orderkey, o_totalprice, NULL AS o_orderpriority FROM old_style
      UNION ALL
      SELECT o_orderkey, o_totalprice, o_orderpriority FROM new_style
    )
    GROUP BY 1
    """,
    doc="Union across schema versions: missing columns null-filled by name.",
)
def set_union_missing_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolved union — the everyday shape when an old extract
    lacks columns a newer one has:
    ``unionByName(allowMissingColumns=True)`` aligns by NAME and
    null-fills the gaps (positional union would silently misalign).
    The oracle spells out the equivalent explicit NULL projection.
    Map-side only: no shuffle until the final rollup.
    """
    o = load(spark, sf_dir, "orders")
    old_style = o.filter(F.col("o_orderkey") % 3 == 0).select("o_orderkey", "o_totalprice")
    new_style = o.filter(F.col("o_orderkey") % 3 == 1).select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    u = old_style.unionByName(new_style, allowMissingColumns=True)
    return u.groupBy(
        F.coalesce("o_orderpriority", F.lit("none")).alias("prio")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum(F.col("o_totalprice").cast("decimal(18,2)")), 2).alias("total"),
    )


@query(
    "setop_union_by_name",
    "§2.20 unionByName with allowMissingColumns (schema-evolution concat)",
    """
    SELECT 'click' AS src, event_id, user_id, value
    FROM events WHERE event_type = 'click'
    UNION ALL BY NAME
    SELECT CASE WHEN user_id % 2 = 0 THEN 'web' ELSE 'app' END AS channel,
           user_id, event_id, 'purchase' AS src
    FROM events WHERE event_type = 'purchase'
    """,
)
def setop_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`unionByName(allowMissingColumns=True)` — the schema-evolution
    concat: the click side carries `value` but no `channel`, the
    purchase side carries `channel` but no `value`, and the purchase
    side's column ORDER is scrambled, so positional UNION ALL would
    either fail or silently misalign.  Spark aligns by name and
    NULL-fills the missing columns on each side; the oracle is
    DuckDB's `UNION ALL BY NAME`, the same semantics in SQL form.
    Scale: a by-name union is still a zero-shuffle concat — column
    alignment is a metadata projection, so this costs exactly what
    UNION ALL costs at any SF."""
    ev = load(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.lit("click").alias("src"), "event_id", "user_id", "value"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.when(F.col("user_id") % 2 == 0, "web").otherwise("app").alias("channel"),
        "user_id",
        "event_id",
        F.lit("purchase").alias("src"),
    )
    return clicks.unionByName(purchases, allowMissingColumns=True)
