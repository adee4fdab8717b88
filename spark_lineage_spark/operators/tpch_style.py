"""Composed analytical workloads — TPC-H-shaped queries adapted to the
fixture schema (SURVEY.md §5.2: realistic multi-join/agg/sort shapes
on top of the per-operator inventory).

Scale notes: dimension chains (customer→nation→region) broadcast; the
fact-side joins (orders⋈lineitem) shuffle on the key with AQE skew
handling; every top-k is orderBy+limit (TakeOrderedAndProject).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from spark_lineage_spark.plans.extract import lineage_checkpoint
from spark_lineage_spark.registry import query
from spark_lineage_spark.tables import load


@query(
    "tpch_q3_style_shipping_priority",
    "§5.2 composed: Q3-shaped shipping priority (3-way join + top-k)",
    """
    SELECT l_orderkey,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def tpch_q3_style(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1998-01-01")
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1998-01-01")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
    )


@query(
    "tpch_q5_style_regional_volume",
    "§5.2 composed: Q5-shaped regional supplier volume (6-way join)",
    """
    SELECT n_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
    GROUP BY n_name
    """,
)
def tpch_q5_style(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local-supplier volume: the fact chain shuffles on its keys; the
    nation/region dims broadcast; the s_nationkey = c_nationkey
    conjunct is the classic co-nationality filter.

    ONE sql() text (optimization r14, guide §7.3): the 6-way join
    chain cost ~0.5 s of per-invocation py4j plan construction; the
    SQL form builds the identical join tree (same order, same explicit
    nation/region broadcasts, ASIA filter pushed to the region scan)
    JVM-side in a single round-trip."""
    from spark_lineage_spark.tables import table_path

    p = lambda t: table_path(sf_dir, t)  # noqa: E731
    return spark.sql(f"""
        SELECT /*+ BROADCAST(n), BROADCAST(r) */ n_name,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM parquet.`{p("customer")}` c
        JOIN parquet.`{p("orders")}` o ON c_custkey = o_custkey
        JOIN parquet.`{p("lineitem")}` li ON l_orderkey = o_orderkey
        JOIN parquet.`{p("supplier")}` s
          ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
        JOIN parquet.`{p("nation")}` n ON c_nationkey = n_nationkey
        JOIN parquet.`{p("region")}` r ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
        GROUP BY n_name
    """)


@query(
    "tpch_q10_style_returned_items",
    "§5.2 composed: Q10-shaped returned-item reporting (top 20)",
    """
    SELECT c_custkey, c_name, n_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           count(*) AS n_items
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def tpch_q10_style(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = F.broadcast(load(spark, sf_dir, "nation"))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
            F.count("*").alias("n_items"),
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@query(
    "tpch_q1_style_full",
    "§5.2 composed: full Q1-shaped pricing summary (8 aggregates)",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           round(avg(l_quantity), 6) AS avg_qty,
           round(avg(l_extendedprice), 4) AS avg_price,
           round(avg(l_discount), 6) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def tpch_q1_style(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ONE sql() text (optimization r14, guide §7.3): the 8-aggregate
    chain cost ~0.3 s of per-invocation py4j plan construction as a
    Column chain; the SQL form builds the identical plan JVM-side in a
    single round-trip (expressions coerce the same way: int literals
    against double columns, string date against the ntz scan)."""
    from spark_lineage_spark.tables import table_path

    return spark.sql(f"""
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty,
               round(sum(l_extendedprice), 2) AS sum_base_price,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
               round(sum((l_extendedprice * (1 - l_discount)) * (1 + l_tax)), 2)
                   AS sum_charge,
               round(avg(l_quantity), 6) AS avg_qty,
               round(avg(l_extendedprice), 4) AS avg_price,
               round(avg(l_discount), 6) AS avg_disc,
               count(*) AS count_order
        FROM parquet.`{table_path(sf_dir, "lineitem")}`
        WHERE l_shipdate <= '2001-09-01'
        GROUP BY l_returnflag, l_linestatus
    """)


Q18_QTY_THRESHOLD = 300


@query(
    "tpch_q18_style_large_orders",
    "§5.2 composed: Q18-shaped large-quantity orders (agg semi-filter + 3-way join)",
    f"""
    SELECT c_name, c_custkey, o_orderkey, o_orderdate,
           round(o_totalprice, 2) AS o_totalprice,
           CAST(sum(l_quantity) AS BIGINT) AS total_qty
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey HAVING sum(l_quantity) > {Q18_QTY_THRESHOLD}
    )
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def tpch_q18_style(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 shape: find orders whose total quantity crosses a threshold
    (an aggregate-then-semi-join — the 'filter a fact table by its own
    aggregate' pattern), then enrich with customer and re-aggregate.

    Scale: the HAVING subquery is ONE pass over lineitem producing only
    qualifying keys (tiny — broadcast left-semi into the fact join, AQE
    picks it), so lineitem is scanned twice but shuffled on l_orderkey
    only for rows that survive; customers broadcast. Top-k is
    TakeOrderedAndProject — no global sort."""
    li = load(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > Q18_QTY_THRESHOLD)
        .select("l_orderkey")
    )
    o = load(spark, sf_dir, "orders").join(
        big.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey", "left_semi"
    )
    c = load(spark, sf_dir, "customer")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum("l_quantity").cast("bigint").alias("total_qty"))
        .withColumn("o_totalprice", F.round("o_totalprice", 2))
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(100)
    )


@query(
    "tpch_q7_style_nation_volume",
    "§5.2 composed: Q7-shaped bilateral trade volume (5-way join, dim pair filter)",
    """
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l_shipdate) AS INTEGER) AS l_year,
           count(*) AS n_lines,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM supplier
    JOIN lineitem ON s_suppkey = l_suppkey
    JOIN orders ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE n1.n_name IN ('NATION_0', 'NATION_1')
      AND n2.n_name IN ('NATION_0', 'NATION_1')
      AND n1.n_name <> n2.n_name
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def tpch_q7_style(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 shape: revenue flowing between a nation pair, by ship year —
    a 5-way join where the same dimension (nation) enters twice under
    different roles. All four dimension sides (supplier, customer,
    nation×2) broadcast; lineitem⋈orders is the only shuffled join,
    and the nation filters reach the dimension scans so the fact rows
    that survive the broadcast probes are already pair-restricted
    before the shuffle."""
    n1 = load(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_0", "NATION_1")
    ).select(F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation"))
    n2 = load(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_0", "NATION_1")
    ).select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation"))
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_orderkey", "l_shipdate", "l_extendedprice", "l_discount"
    )
    return (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(
            F.count("*").alias("n_lines"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
        )
    )


@query(
    "tpch_q14_style_promo_revenue",
    "§5.2 composed: Q14-shaped promo revenue share (conditional agg over a join)",
    """
    SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                                  THEN l_extendedprice * (1 - l_discount)
                                  ELSE 0.0 END)
                 / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_pct,
           count(*) AS n_lines
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    """,
)
def tpch_q14_style(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 adapted to the fixture (p_type holds the promo flag; the
    classic uses a LIKE 'PROMO%%' prefix). Shape under test: a global
    conditional-aggregate ratio over a fact⋈dim join. part broadcasts;
    the shipdate range predicate is pushed to the lineitem scan so a
    year of the fact table is all that leaves the files; the ratio is
    computed in one partial-aggregatable pass (two sums), never as two
    separate jobs."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    p = load(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            F.round(
                100.0 * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0)) / F.sum(rev),
                4,
            ).alias("promo_pct"),
            F.count("*").alias("n_lines"),
        )
    )


@query(
    "tpch_q19_style_disjunctive",
    "§5.2 composed: Q19-shaped OR-of-ANDs predicate over a join",
    """
    SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           count(*) AS n_lines
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#4'  AND p_size BETWEEN 1 AND 10  AND l_quantity BETWEEN 1 AND 20)
       OR (p_brand = 'Brand#17' AND p_size BETWEEN 5 AND 25  AND l_quantity BETWEEN 10 AND 35)
       OR (p_brand = 'Brand#8'  AND p_size BETWEEN 10 AND 40 AND l_quantity BETWEEN 20 AND 50)
    """,
)
def tpch_q19_style(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19's signature is the disjunction of conjunctions spanning both
    join sides. Catalyst extracts the per-side common factors: the part
    scan gets `p_brand IN (...)` plus the size envelope, the lineitem
    scan gets the quantity envelope (CNF conversion of the OR) — so
    both scans prune before the broadcast join, and only the residual
    OR is evaluated post-join. At 100 TB that per-side extraction is
    the difference between scanning the fact table and scanning 1%% of
    it."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    cond = (
        ((F.col("p_brand") == "Brand#4") & F.col("p_size").between(1, 10)
         & F.col("l_quantity").between(1, 20))
        | ((F.col("p_brand") == "Brand#17") & F.col("p_size").between(5, 25)
           & F.col("l_quantity").between(10, 35))
        | ((F.col("p_brand") == "Brand#8") & F.col("p_size").between(10, 40)
           & F.col("l_quantity").between(20, 50))
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
            F.count("*").alias("n_lines"),
        )
    )


@query(
    "tpch_q12_style_late_lines",
    "§5.2 composed: Q12-shaped priority split of late shipments",
    """
    SELECT l_linestatus,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
                AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
                AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
    GROUP BY l_linestatus
    ORDER BY l_linestatus
    """,
)
def tpch_q12_style(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 adapted: the fixture has no l_commitdate/l_receiptdate, so
    'late' is shipped >60 days after the order date — same shape, a
    join-predicate comparing columns from both sides (not pushable to
    either scan) followed by a two-way conditional count. The equi-join
    on orderkey shuffles both sides; the interval comparison rides the
    join as a residual condition, never a separate pass."""
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate", "o_orderpriority")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_linestatus", "l_shipdate")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


@query(
    "tpch_q22_style_idle_customers",
    "§5.2 composed: Q22-shaped rich-but-idle customers (scalar subquery + anti-join)",
    """
    SELECT c_mktsegment,
           count(*) AS numcust,
           round(sum(c_acctbal), 2) AS totacctbal
    FROM customer
    WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
)
def tpch_q22_style(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 adapted (no c_phone in the fixture; the market segment
    stands in for the country-code grouping, and 'idle' means no order
    since 2000 — the fixture's order history covers every customer).
    Shape under test: an uncorrelated scalar aggregate gating a
    filter, plus NOT EXISTS decorrelated to a left-anti join. The 1-row average broadcasts as
    a crossJoin (no driver round-trip, stays one lazy plan — same
    discipline as the TF-IDF corpus-N fix); the anti-join shuffles on
    custkey, the natural key. At scale the anti-join's build side is
    the orders key projection only — one column survives the scan."""
    c = load(spark, sf_dir, "customer")
    o = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= "2000-01-01")
        .select("o_custkey")
    )
    avg_bal = (
        c.filter(F.col("c_acctbal") > 0.0).agg(F.avg("c_acctbal").alias("avg_bal"))
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
        .orderBy("c_mktsegment")
    )


@query(
    "tpch_q6_style_forecast_revenue",
    "§5.2 composed: Q6-shaped forecasting revenue (single-scan filter agg)",
    """
    SELECT CAST(count(*) AS BIGINT) AS n_lines,
           CAST(round(sum(CAST(l_extendedprice * l_discount AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.04 AND 0.08
      AND l_quantity < 24
    """,
)
def tpch_q6_style(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pushdown benchmark: every predicate is scan-pushable and the
    projection is two columns — at 100 TB the parquet reader should do
    nearly all the work (PushedFilters + pruned ReadSchema asserted for
    this shape in tests/test_plans.py)."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01")
        & (F.col("l_shipdate") < "1998-01-01")
        & F.col("l_discount").between(0.04, 0.08)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        F.count("*").alias("n_lines"),
        F.round(F.sum((F.col("l_extendedprice") * F.col("l_discount")).cast("decimal(18,4)")), 2)
        .cast("double")
        .alias("revenue"),
    )


@query(
    "tpch_q4_style_priority_check",
    "§5.2 composed: Q4-shaped order priority check (correlated EXISTS -> semi join)",
    """
    SELECT o_orderpriority, count(*) AS n_orders
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
    GROUP BY o_orderpriority
    """,
)
def tpch_q4_style(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS with a non-equi conjunct (late-shipping line),
    written directly as a left-semi join — the decorrelation Catalyst
    would produce. 'Late' = shipped >90 days after the order date
    (the fixture has no commit/receipt dates). Semi join shuffles both
    sides on orderkey once; the aggregate is a cheap 5-group rollup."""
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    )
    return (
        o.join(li, late, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
    )


@query(
    "tpch_q13_style_order_counts",
    "§5.2 composed: Q13-shaped customer order-count distribution",
    """
    SELECT c_count, count(*) AS custdist
    FROM (SELECT c_custkey, count(o_orderkey) AS c_count
          FROM customer LEFT JOIN orders
            ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
          GROUP BY c_custkey) t
    GROUP BY c_count
    """,
)
def tpch_q13_style(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join with a join-time filter (the filter belongs in
    the ON clause — pushing it to WHERE would drop customers with only
    urgent orders instead of counting them at 0), then a two-level
    aggregation. count(o_orderkey) counts matched rows only; the outer
    histogram groups the per-customer counts."""
    c = load(spark, sf_dir, "customer").select("c_custkey")
    o = load(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_orderpriority")
    per_cust = (
        c.join(
            o,
            (F.col("c_custkey") == F.col("o_custkey"))
            & (F.col("o_orderpriority") != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@query(
    "tpch_q15_style_top_supplier",
    "§5.2 composed: Q15-shaped top supplier (view + scalar-max subquery)",
    """
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
)
def tpch_q15_style(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The revenue 'view' is built once and reused for both the rows
    and the scalar max — localCheckpoint materializes it so the two
    plan branches don't recompute the scan+agg; the 1-row max rides a
    broadcast crossJoin (no driver round-trip). Comparison happens on
    the ROUNDED revenue so Spark and the oracle agree bit-for-bit."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1997-04-01")
    )
    revenue = (
        li.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            F.round(
                F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")),
                2,
            )
            .cast("double")
            .alias("total_revenue")
        )
        .transform(lineage_checkpoint)
    )
    mx = revenue.agg(F.max("total_revenue").alias("mx"))
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        s.join(revenue, s.s_suppkey == revenue.supplier_no)
        .crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("mx"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@query(
    "tpch_q17_style_small_qty_revenue",
    "§5.2 composed: Q17-shaped small-quantity revenue (correlated scalar avg)",
    """
    SELECT CAST(count(*) AS BIGINT) AS n_lines,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))) / 7.0, 2) AS DOUBLE) AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#4' AND p_size < 10
      AND l_quantity < (SELECT 0.5 * avg(l2.l_quantity)
                        FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
    """,
)
def tpch_q17_style(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar average decorrelated by hand: per-part avg
    quantity computed once (only for parts that survive the brand/size
    filter — the semi join prunes the aggregation input before the
    shuffle), broadcast back, then the threshold filter. Quantities
    are integers in doubles, so sum/count is bit-identical across
    engines and the < comparison cannot straddle rounding."""
    p = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#4") & (F.col("p_size") < 10)
    ).select("p_partkey")
    li = load(spark, sf_dir, "lineitem")
    li_p = li.join(F.broadcast(p), li.l_partkey == p.p_partkey, "left_semi")
    avg_q = (
        li_p.groupBy("l_partkey").agg((F.avg("l_quantity") * 0.5).alias("half_avg_qty"))
    )
    return (
        li_p.join(F.broadcast(avg_q), "l_partkey")
        .filter(F.col("l_quantity") < F.col("half_avg_qty"))
        .agg(
            F.count("*").alias("n_lines"),
            F.round(F.sum(F.col("l_extendedprice").cast("decimal(18,4)")) / 7.0, 2)
            .cast("double")
            .alias("avg_yearly"),
        )
    )


@query(
    "tpch_q2_style_min_cost_supplier",
    "§5.2 composed: Q2-shaped minimum-cost supplier (correlated min subquery)",
    """
    WITH cost AS (
      SELECT l_partkey, l_suppkey,
             round(min(l_extendedprice / l_quantity), 4) AS unit_cost
      FROM lineitem GROUP BY l_partkey, l_suppkey),
    eur AS (
      SELECT l_partkey, l_suppkey, unit_cost, s_acctbal, s_name, n_name
      FROM cost
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE')
    SELECT round(s_acctbal, 2) AS acctbal, s_name, n_name, p_partkey, p_type, unit_cost
    FROM part JOIN eur ON p_partkey = l_partkey
    WHERE p_size = 20
      AND unit_cost = (SELECT min(e2.unit_cost) FROM eur e2 WHERE e2.l_partkey = p_partkey)
    ORDER BY acctbal DESC, n_name, s_name, p_partkey
    LIMIT 10
    """,
)
def tpch_q2_style(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 adapted (no partsupp table): unit supply cost is derived as
    min(l_extendedprice / l_quantity) per (part, supplier). The
    correlated 'cheapest EUROPE supplier for this part' subquery is
    decorrelated to a per-part MIN WINDOW + equality filter on the
    ROUNDED cost (both engines compare identical rounded doubles).

    Optimization r14 (guide §2.1/§7.3): the previous shape
    localCheckpoint'd the EUROPE cost table (an eager ~1.2 s
    driver-blocking job at plan build) so a separate groupBy-min could
    re-read it and re-attach via a broadcast equality join. The window
    form computes the same per-part min IN PLACE — one pass over the
    small cost table, no checkpoint, no second join — and the whole
    query is ONE sql() text (single py4j round-trip). Same result: a
    min() window over exactly the rows the old aggregate grouped, and
    the same rounded-equality selection. Dim chain (supplier→nation→
    region) broadcasts; lineitem shuffles once on (partkey, suppkey);
    the window re-keys only the already-aggregated cost table."""
    from spark_lineage_spark.tables import table_path

    return spark.sql(f"""
        WITH cost AS (
          SELECT l_partkey, l_suppkey,
                 round(min(l_extendedprice / l_quantity), 4) AS unit_cost
          FROM parquet.`{table_path(sf_dir, "lineitem")}`
          GROUP BY l_partkey, l_suppkey
        ),
        eur AS (
          SELECT l_partkey, unit_cost, s_acctbal, s_name, n_name
          FROM cost
          JOIN parquet.`{table_path(sf_dir, "supplier")}` ON s_suppkey = l_suppkey
          JOIN parquet.`{table_path(sf_dir, "nation")}` ON s_nationkey = n_nationkey
          JOIN parquet.`{table_path(sf_dir, "region")}` ON n_regionkey = r_regionkey
          WHERE r_name = 'EUROPE'
        ),
        best AS (
          SELECT * FROM (
            SELECT l_partkey, unit_cost, s_acctbal, s_name, n_name,
                   min(unit_cost) OVER (PARTITION BY l_partkey) AS min_cost
            FROM eur
          ) WHERE unit_cost = min_cost
        )
        SELECT round(s_acctbal, 2) AS acctbal, s_name, n_name,
               p_partkey, p_type, unit_cost
        FROM parquet.`{table_path(sf_dir, "part")}`
        JOIN best ON p_partkey = l_partkey
        WHERE p_size = 20
        ORDER BY acctbal DESC, n_name, s_name, p_partkey
        LIMIT 10
    """)


@query(
    "tpch_q8_style_market_share",
    "§5.2 composed: Q8-shaped national market share (8-way join + conditional agg)",
    """
    WITH vol AS (
      SELECT year(o_orderdate) AS o_year,
             l_extendedprice * (1 - l_discount) AS volume,
             n2.n_name AS supp_nation
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region ON n1.n_regionkey = r_regionkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      JOIN part ON l_partkey = p_partkey
      WHERE r_name = 'AMERICA' AND p_type = 'PROMO'
        AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01')
    SELECT o_year,
           round(sum(CASE WHEN supp_nation = 'NATION_7' THEN volume ELSE 0 END)
                 / sum(volume), 6) AS mkt_share
    FROM vol GROUP BY o_year
    """,
)
def tpch_q8_style(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market share of NATION_7's suppliers in AMERICA's PROMO-part
    trade: the widest dim fan in the suite (nation joined twice under
    different roles). Fact chain (lineitem⋈orders) shuffles on the
    orderkey; every dimension — including the 100-row supplier and the
    filtered part side — broadcasts, so the share is one shuffle plus
    map-side lookups. The conditional numerator stays in the same
    aggregate pass as the denominator (no second scan)."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    n1 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_regionkey").alias("c_rkey")
    )
    n2 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    p = load(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO").select("p_partkey")
    vol = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("c_nkey"))
        .join(F.broadcast(r), F.col("c_rkey") == F.col("r_regionkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("s_nkey"))
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .select(
            F.year("o_orderdate").alias("o_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"),
            "supp_nation",
        )
    )
    return vol.groupBy("o_year").agg(
        F.round(
            F.sum(F.when(F.col("supp_nation") == "NATION_7", F.col("volume")).otherwise(0.0))
            / F.sum("volume"),
            6,
        ).alias("mkt_share")
    )


@query(
    "tpch_q9_style_product_profit",
    "§5.2 composed: Q9-shaped product-type profit by nation and year",
    """
    SELECT n_name AS nation, year(o_orderdate) AS o_year,
           CAST(round(sum(CAST(l_extendedprice * (1 - l_discount)
                               - 0.6 * p_retailprice * l_quantity
                               AS DECIMAL(18,4))), 2) AS DOUBLE) AS profit
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN orders ON o_orderkey = l_orderkey
    WHERE p_name LIKE '%gear%'
    GROUP BY 1, 2
    """,
)
def tpch_q9_style(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Profit per supplier-nation per year on '%gear%' parts. Supply
    cost is proxied as 60% of retail price (no partsupp in the
    fixture). The LIKE filter prunes part FIRST and the filtered part
    dim broadcasts into the fact scan — the big join (lineitem⋈orders)
    is the only shuffle."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_name").like("%gear%")).select(
        "p_partkey", "p_retailprice"
    )
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(
            # decimal(18,4) summand: addition is exact, so the group
            # total is independent of partitioning/order and agrees
            # with the oracle bit-for-bit (a double sum of ~1e5-row
            # groups differs across engines in the last ulp, which
            # flips the cent-rounding — seen in driver-sim)
            F.round(
                F.sum(
                    (
                        F.col("l_extendedprice") * (1 - F.col("l_discount"))
                        - 0.6 * F.col("p_retailprice") * F.col("l_quantity")
                    ).cast("decimal(18,4)")
                ),
                2,
            )
            .cast("double")
            .alias("profit")
        )
    )


@query(
    "tpch_q11_style_important_parts",
    "§5.2 composed: Q11-shaped important parts (HAVING vs global scalar subquery)",
    """
    WITH val AS (
      SELECT l_partkey, sum(l_quantity * p_retailprice) AS value
      FROM lineitem
      JOIN part ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      WHERE s_nationkey < 5
      GROUP BY l_partkey)
    SELECT l_partkey AS partkey, round(value, 2) AS part_value
    FROM val
    WHERE value > (SELECT sum(value) * 0.001 FROM val)
    """,
)
def tpch_q11_style(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts whose traded value (from nations 0-4's suppliers) exceeds
    0.1% of the total — the HAVING-against-global-aggregate shape. The
    per-part value is materialized once (localCheckpoint) and feeds
    both the rows and the 1-row total; the total rides a broadcast
    crossJoin so the gate is evaluated map-side with no driver
    round-trip and no second scan of the fact table."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").select("p_partkey", "p_retailprice")
    s = load(spark, sf_dir, "supplier").filter(F.col("s_nationkey") < 5).select("s_suppkey")
    val = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey, "left_semi")
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("l_partkey")
        .agg(F.sum(F.col("l_quantity") * F.col("p_retailprice")).alias("value"))
        .transform(lineage_checkpoint)
    )
    total = val.agg((F.sum("value") * 0.001).alias("threshold"))
    return (
        val.crossJoin(F.broadcast(total))
        .filter(F.col("value") > F.col("threshold"))
        .select(F.col("l_partkey").alias("partkey"), F.round("value", 2).alias("part_value"))
    )


@query(
    "tpch_q16_style_supplier_counts",
    "§5.2 composed: Q16-shaped supplier counts (NOT IN subquery + count distinct)",
    """
    SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#4'
      AND p_type NOT IN ('PROMO', 'ECONOMY')
      AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    """,
)
def tpch_q16_style(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Who can supply the wanted part shapes, excluding suppliers in
    the red: the NOT IN subquery decorrelates to a left-anti join
    (safe here — s_suppkey is non-null by construction; a nullable
    column would need the null-aware variant, cf. subq_exists_not_in).
    The part filters broadcast; count(DISTINCT) shuffles on the group
    keys with a partial distinct map-side."""
    p = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#4")
        & (~F.col("p_type").isin("PROMO", "ECONOMY"))
        & (F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45))
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    bad = load(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select("s_suppkey")
    li = load(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "tpch_q20_style_part_shippers",
    "§5.2 composed: Q20-shaped qualified shippers (nested IN subqueries + HAVING)",
    """
    SELECT s_suppkey, s_name, round(s_acctbal, 2) AS acctbal
    FROM supplier
    WHERE s_suppkey IN (
        SELECT l_suppkey FROM lineitem
        WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
          AND l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
        GROUP BY l_suppkey
        HAVING sum(l_quantity) > 50)
      AND s_nationkey < 13
    """,
)
def tpch_q20_style(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers (from nations 0-12) who shipped more than 50 units of
    red parts in 1997 — Q20's nested IN chain. Inner-to-outer: the
    part IN prunes the lineitem scan via a broadcast semi join, the
    HAVING aggregates on suppkey, and the outer IN is one more semi
    join against the 100-row supplier dim. No distinct is ever needed:
    semi joins dedupe for free."""
    red = load(spark, sf_dir, "part").filter(F.col("p_name").like("red%")).select("p_partkey")
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    qualified = (
        li.join(F.broadcast(red), li.l_partkey == red.p_partkey, "left_semi")
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 50)
        .select("l_suppkey")
    )
    s = load(spark, sf_dir, "supplier").filter(F.col("s_nationkey") < 13)
    return (
        s.join(F.broadcast(qualified), s.s_suppkey == qualified.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name", F.round("s_acctbal", 2).alias("acctbal"))
    )


@query(
    "tpch_q21_style_waiting_suppliers",
    "§5.2 composed: Q21-shaped blame analysis (EXISTS + NOT EXISTS on the same rel)",
    """
    WITH l1 AS (
      SELECT l_orderkey, l_suppkey, l_shipdate
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      WHERE o_orderstatus = 'F')
    SELECT s_name, count(*) AS numwait
    FROM l1 JOIN supplier ON s_suppkey = l_suppkey
    WHERE EXISTS (SELECT 1 FROM l1 l2
                  WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM l1 l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > l1.l_shipdate)
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 10
    """,
)
def tpch_q21_style(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which supplier shipped LAST in multi-supplier finished orders:
    EXISTS (another supplier in the order) as a left-semi join and
    NOT EXISTS (anyone later) as a left-anti join — both against the
    same materialized slice (localCheckpoint: three plan branches, one
    scan+join). Both joins shuffle on orderkey — the layout carries
    from the semi straight into the anti. Ties (two suppliers sharing
    the max shipdate) blame both, identically in both engines."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey"
    )
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    l1 = li.join(o, li.l_orderkey == o.o_orderkey, "left_semi").transform(lineage_checkpoint)
    l2 = l1.select(
        F.col("l_orderkey").alias("x_orderkey"), F.col("l_suppkey").alias("x_suppkey")
    )
    l3 = l1.select(
        F.col("l_orderkey").alias("y_orderkey"),
        F.col("l_suppkey").alias("y_suppkey"),
        F.col("l_shipdate").alias("y_shipdate"),
    )
    waiting = l1.join(
        l2,
        (F.col("l_orderkey") == F.col("x_orderkey"))
        & (F.col("l_suppkey") != F.col("x_suppkey")),
        "left_semi",
    ).join(
        l3,
        (F.col("l_orderkey") == F.col("y_orderkey"))
        & (F.col("l_suppkey") != F.col("y_suppkey"))
        & (F.col("y_shipdate") > F.col("l_shipdate")),
        "left_anti",
    )
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        waiting.join(F.broadcast(s), waiting.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(10)
    )
