"""Composed analytical workloads — TPC-H-shaped queries adapted to the
fixture schema (SURVEY.md §5.2: realistic multi-join/agg/sort shapes
on top of the per-operator inventory).

Scale notes: dimension chains (customer→nation→region) broadcast; the
fact-side joins (orders⋈lineitem) shuffle on the key with AQE skew
handling; every top-k is orderBy+limit (TakeOrderedAndProject).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

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
    conjunct is the classic co-nationality filter."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = F.broadcast(load(spark, sf_dir, "nation"))
    r = F.broadcast(load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA"))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(s, (li.l_suppkey == s.s_suppkey) & (s.s_nationkey == c.c_nationkey))
        .join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
    )


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
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= "2001-09-01")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
        F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
        F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
        F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
        F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
        F.round(F.avg("l_discount"), 6).alias("avg_disc"),
        F.count("*").alias("count_order"),
    )


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
