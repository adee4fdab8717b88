"""Aggregations (SURVEY.md §2.4): hash aggs, multi-level, stats, sketches.

Spark runs every groupBy as partial (map-side) + final agg around one
shuffle on the grouping keys — no code here needs to hand-schedule
that. Rounding discipline: sums/avgs of doubles are rounded because
accumulation order is nondeterministic; counts are exact.

DuckDB oracle notes: sum(BIGINT) returns HUGEINT there — always
CAST(... AS BIGINT) in oracle SQL to match Spark's long.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from spark_lineage_spark.registry import query
from spark_lineage_spark.tables import load, register_views


@query(
    "agg_global",
    "§2.4 global agg (no grouping keys)",
    """
    SELECT count(*) AS n_rows,
           round(sum(l_quantity), 2) AS sum_qty,
           round(min(l_extendedprice), 2) AS min_price,
           round(max(l_extendedprice), 2) AS max_price,
           count(DISTINCT l_suppkey) AS n_supp
    FROM lineitem
    """,
)
def agg_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.agg(
        F.count("*").alias("n_rows"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.min("l_extendedprice"), 2).alias("min_price"),
        F.round(F.max("l_extendedprice"), 2).alias("max_price"),
        F.countDistinct("l_suppkey").alias("n_supp"),
    )


@query(
    "agg_count_distinct",
    "§2.4 exact count distinct per group",
    """
    SELECT l_returnflag,
           count(DISTINCT l_orderkey) AS n_orders,
           count(DISTINCT l_suppkey) AS n_supp,
           count(*) AS n_rows
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple exact distincts per group. Optimization r14 (guide
    §2.3 'aggregate before you shuffle'): the single-agg form planned
    an Expand — every input row tripled (one replica per distinct
    column) before the partial aggregate, so the first stage chewed 3×
    the rows. Split instead into two ordinary two-phase aggregations
    that each see the table once at its natural width — (flag,
    orderkey) pre-aggregation re-aggregated to n_orders + n_rows, and
    the single-distinct n_supp branch (planned without Expand) — then
    a 3-row broadcast join reassembles the groups. Same result, no
    row multiplication, both branch shuffles carry only partial-agg
    output. sf0.1 warm: 0.98 s → 0.70 s; Expand gone from the plan
    (plans/r14/agg_count_distinct_{before,after}.txt)."""
    li = load(spark, sf_dir, "lineitem")
    a = (
        li.groupBy("l_returnflag", "l_orderkey")
        .agg(F.count(F.lit(1)).alias("_c"))
        .groupBy("l_returnflag")
        # count(l_orderkey) — not count(*) — so a NULL-key group is not
        # counted: count(DISTINCT x) ignores NULLs (ADVICE r14; latent
        # on the non-null fixture keys, bit-identical there)
        .agg(F.count("l_orderkey").alias("n_orders"), F.sum("_c").alias("n_rows"))
    )
    b = li.groupBy("l_returnflag").agg(F.countDistinct("l_suppkey").alias("n_supp"))
    return a.join(b, "l_returnflag").select(
        "l_returnflag", "n_orders", "n_supp", "n_rows"
    )


@query("agg_approx_sketches", "§2.4 approx distinct + sketches — rows-only", None)
def agg_approx_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL / CountMin estimates are engine-specific (SURVEY §2.4) —
    rows-only. Deterministic within Spark (fixed seeds)."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey").alias("approx_orders"),
        F.hll_sketch_estimate(F.hll_sketch_agg("l_suppkey")).alias("hll_supp"),
        F.md5(
            F.count_min_sketch(F.col("l_linenumber"), F.lit(0.01), F.lit(0.95), F.lit(42))
        ).alias("cms_md5"),
    )


@query(
    "agg_hll_two_level",
    "§2.4 mergeable HLL sketches: per-group partials re-aggregated with hll_union_agg — rows-only",
    None,
)
def agg_hll_two_level(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mergeable-sketch pattern behind every incremental
    distinct-count rollup (Spark 4 DataSketches): build a per-segment
    HLL sketch of the customer keys ONCE (the expensive pass over the
    fact), then answer the coarser question by UNIONING the stored
    partials with ``hll_union_agg`` — no second scan, which is the
    whole point at 100 TB (daily-partition sketches union into
    month/total cardinalities for free). Output: one estimate row per
    segment plus the ALL row from the union. Rows-only like
    agg_approx_sketches (DataSketches binaries are Spark-specific),
    deterministic within Spark; the union-vs-direct consistency
    property (ALL estimate == single-pass global estimate) is asserted
    in tests/test_determinism.py::test_hll_union_matches_direct."""
    c = load(spark, sf_dir, "customer")
    partials = c.groupBy("c_mktsegment").agg(
        F.hll_sketch_agg("c_custkey").alias("sk")
    )
    per_segment = partials.select(
        F.col("c_mktsegment").alias("segment"),
        F.hll_sketch_estimate("sk").alias("est_distinct"),
    )
    overall = partials.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est_distinct")
    ).select(F.lit("ALL").alias("segment"), "est_distinct")
    return per_segment.unionByName(overall)


@query(
    "agg_rollup",
    "§2.4 rollup (subtotal levels, ANSI null markers)",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ONE sql() text (optimization r14, guide §7.3): identical plan,
    # built JVM-side in a single py4j round-trip.
    from spark_lineage_spark.tables import table_path

    return spark.sql(f"""
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
        FROM parquet.`{table_path(sf_dir, "lineitem")}`
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """)


@query(
    "agg_cube",
    "§2.4 cube",
    """
    SELECT o_orderstatus, o_orderpriority, count(*) AS n,
           round(avg(o_totalprice), 4) AS avg_price
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n"), F.round(F.avg("o_totalprice"), 4).alias("avg_price")
    )


@query(
    "agg_grouping_sets",
    "§2.4 grouping sets + grouping()",
    """
    SELECT o_orderstatus, o_orderpriority,
           grouping(o_orderstatus) AS g_status,
           grouping(o_orderpriority) AS g_prio,
           count(*) AS n
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_lineage_spark.tables import register_views

    register_views(spark, sf_dir, ["orders"])
    # SQL entry point: groupingSets + grouping() markers, ANSI-aligned
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               grouping(o_orderstatus) AS g_status,
               grouping(o_orderpriority) AS g_prio,
               count(*) AS n
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


@query(
    "agg_stats",
    "§2.4 statistical aggregates",
    """
    SELECT l_returnflag,
           round(stddev_samp(l_quantity), 6) AS sd_qty,
           round(var_samp(l_quantity), 6) AS var_qty,
           round(stddev_pop(l_discount), 6) AS sdp_disc,
           round(corr(l_quantity, l_extendedprice), 6) AS corr_qp,
           round(covar_pop(l_quantity, l_discount), 6) AS cov_qd
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """covar over a SMALL-magnitude pair (qty×discount, |cov| < 1):
    engines use different accumulation formulas, so a large-magnitude
    covariance can drift past the rounding granularity — corr is
    already scale-free."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_quantity"), 6).alias("sd_qty"),
        F.round(F.var_samp("l_quantity"), 6).alias("var_qty"),
        F.round(F.stddev_pop("l_discount"), 6).alias("sdp_disc"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qp"),
        F.round(F.covar_pop("l_quantity", "l_discount"), 6).alias("cov_qd"),
    )


@query(
    "agg_percentile_median",
    "§2.4 exact percentiles + median",
    """
    SELECT o_orderstatus,
           round(median(o_totalprice), 4) AS med_price,
           round(quantile_cont(o_totalprice, 0.25), 4) AS p25,
           round(quantile_cont(o_totalprice, 0.90), 4) AS p90
    FROM orders GROUP BY o_orderstatus
    """,
)
def agg_percentile_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.round(F.median("o_totalprice"), 4).alias("med_price"),
        F.round(F.percentile("o_totalprice", 0.25), 4).alias("p25"),
        F.round(F.percentile("o_totalprice", 0.90), 4).alias("p90"),
    )


@query(
    "agg_mode_deterministic",
    "§2.4 mode (deterministic tie-break: smallest value wins)",
    """
    SELECT o_orderstatus, o_orderpriority AS mode_prio
    FROM (
      SELECT o_orderstatus, o_orderpriority, count(*) AS c
      FROM orders GROUP BY o_orderstatus, o_orderpriority
    )
    QUALIFY row_number() OVER (PARTITION BY o_orderstatus
                               ORDER BY c DESC, o_orderpriority) = 1
    """,
)
def agg_mode_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Built-in mode() has engine-defined tie-breaks; the deterministic
    contract is count+row_number (same shape both engines)."""
    o = load(spark, sf_dir, "orders")
    counts = o.groupBy("o_orderstatus", "o_orderpriority").agg(F.count("*").alias("c"))
    w = Window.partitionBy("o_orderstatus").orderBy(F.desc("c"), "o_orderpriority")
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_orderstatus", F.col("o_orderpriority").alias("mode_prio"))
    )


@query(
    "agg_collect_listagg",
    "§2.4 collect_list / collect_set / listagg (order-pinned)",
    """
    SELECT n_regionkey,
           array_to_string(list_sort(list(n_name)), ',') AS all_names,
           array_to_string(list_sort(list(DISTINCT substr(n_name, 1, 1))), ',') AS initials
    FROM nation GROUP BY n_regionkey
    """,
)
def agg_collect_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row→array aggs are order-sensitive; pin with sort_array before
    serializing to a comparable string (SURVEY §2.4 note)."""
    n = load(spark, sf_dir, "nation")
    return n.groupBy("n_regionkey").agg(
        F.array_join(F.sort_array(F.collect_list("n_name")), ",").alias("all_names"),
        F.array_join(F.sort_array(F.collect_set(F.substring("n_name", 1, 1))), ",").alias(
            "initials"
        ),
    )


@query(
    "agg_min_by_max_by",
    "§2.4 min_by/max_by + deterministic first/last",
    """
    SELECT o_custkey,
           arg_min(o_orderkey, o_orderdate) AS first_order,
           arg_max(o_orderkey, o_orderdate) AS last_order,
           min(o_orderdate) AS first_date
    FROM (
      SELECT o_custkey, o_orderkey, o_orderdate FROM orders
      QUALIFY row_number() OVER (PARTITION BY o_custkey, o_orderdate
                                 ORDER BY o_orderkey) = 1
    )
    GROUP BY o_custkey
    """,
)
def agg_min_by_max_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """argmin/argmax; input pre-deduped to one row per (key, date) so
    ties cannot make arg_min/arg_max engine-dependent."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey", "o_orderdate").orderBy("o_orderkey")
    dedup = (
        o.select("o_custkey", "o_orderkey", "o_orderdate")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
    )
    return dedup.groupBy("o_custkey").agg(
        F.min_by("o_orderkey", "o_orderdate").alias("first_order"),
        F.max_by("o_orderkey", "o_orderdate").alias("last_order"),
        F.min("o_orderdate").alias("first_date"),
    )


@query(
    "agg_unpivot_melt",
    "§2.4 unpivot / melt (wide → long)",
    """
    SELECT o_orderkey, metric, round(value, 4) AS value
    FROM (
      UNPIVOT (SELECT o_orderkey, o_totalprice,
                      CAST(o_custkey AS DOUBLE) AS o_custkey_d
               FROM orders)
      ON o_totalprice, o_custkey_d
      INTO NAME metric VALUE value
    )
    """,
)
def agg_unpivot_melt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DataFrame.unpivot (melt): wide columns → (name, value) rows —
    the inverse of pivot; a narrow map-side Expand, no shuffle."""
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_totalprice",
        F.col("o_custkey").cast("double").alias("o_custkey_d"),
    )
    return o.unpivot(
        ids=["o_orderkey"],
        values=["o_totalprice", "o_custkey_d"],
        variableColumnName="metric",
        valueColumnName="value",
    ).select("o_orderkey", "metric", F.round("value", 4).alias("value"))


@query(
    "agg_salted_twophase",
    "§2.4/§4 skew-safe aggregation (salted two-phase)",
    """
    SELECT l_returnflag, count(*) AS n, round(sum(l_quantity), 2) AS qty
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_salted_twophase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manual salting for skewed grouping keys (SURVEY §4 skew row):
    phase 1 groups on (key, salt) — a hot key splits across SALT
    partitions instead of one straggler — phase 2 merges the partials
    on the key alone. l_returnflag has 3 heavily-hot values, the worst
    case for a 32-way shuffle. Result ≡ plain GROUP BY (count/sum are
    algebraic; avg would carry (sum, count) pairs). AQE's skew handling
    covers joins; aggregation salting remains a manual pattern."""
    SALT = 16
    li = load(spark, sf_dir, "lineitem")
    partial = (
        li.withColumn("_salt", F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(SALT)))
        .groupBy("l_returnflag", "_salt")
        .agg(F.count("*").alias("pn"), F.sum("l_quantity").alias("pqty"))
    )
    return partial.groupBy("l_returnflag").agg(
        F.sum("pn").alias("n"), F.round(F.sum("pqty"), 2).alias("qty")
    )


@query(
    "agg_pivot",
    "§2.4 pivot (fixed value list)",
    """
    SELECT l_returnflag,
           round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) AS "O",
           round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) AS "F"
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    pv = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.sum("l_quantity"))
    )
    return pv.select(
        "l_returnflag",
        F.round(F.col("O"), 2).alias("O"),
        F.round(F.col("F"), 2).alias("F"),
    )


@query(
    "agg_boolean_conditional",
    "§2.4 boolean/conditional aggregates (count_if, bool_and/or, any_value)",
    """
    SELECT l_returnflag,
           count(*) AS n,
           count(CASE WHEN l_quantity > 25 THEN 1 END) AS n_bulk,
           CASE WHEN bool_and(l_discount <= 0.1) THEN 1 ELSE 0 END AS all_low_disc,
           CASE WHEN bool_or(l_tax > 0.07) THEN 1 ELSE 0 END AS any_high_tax,
           min(l_linestatus) AS a_linestatus
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_boolean_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate aggregates: count_if, every (bool_and), some (bool_or)
    — all partial-agg friendly single-bit states, the cheapest possible
    shuffle payload. any_value is nondeterministic by contract, so the
    deterministic stand-in is min() — same 'pick one' semantics, stable
    across engines (documented drift rule)."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.count_if(F.col("l_quantity") > 25).alias("n_bulk"),
        F.when(F.every(F.col("l_discount") <= 0.1), 1).otherwise(0).alias("all_low_disc"),
        F.when(F.some(F.col("l_tax") > 0.07), 1).otherwise(0).alias("any_high_tax"),
        F.min("l_linestatus").alias("a_linestatus"),
    )


@query(
    "agg_linear_regression",
    "§2.4 regression aggregates (regr_slope/intercept/r2/count)",
    """
    SELECT l_returnflag,
           regr_count(l_extendedprice, l_quantity) AS n,
           round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
           round(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept,
           round(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
           round(regr_avgx(l_extendedprice, l_quantity), 6) AS avg_x,
           round(regr_avgy(l_extendedprice, l_quantity), 4) AS avg_y
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_linear_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OLS-in-the-aggregate: regr_* are single-pass sum-of-products
    states (n, Σx, Σy, Σxx, Σxy …), so partial aggregation applies and
    the shuffle carries six doubles per group regardless of row count —
    the cheapest possible 'fit a trend per key' at 100 TB. Rounded
    because the sum order differs between engines (same discipline as
    the stats battery); slope/intercept at 4 decimals absorbs the
    price-scale accumulation drift."""
    li = load(spark, sf_dir, "lineitem")
    y, x = F.col("l_extendedprice"), F.col("l_quantity")
    return li.groupBy("l_returnflag").agg(
        F.regr_count(y, x).alias("n"),
        F.round(F.regr_slope(y, x), 4).alias("slope"),
        F.round(F.regr_intercept(y, x), 4).alias("intercept"),
        F.round(F.regr_r2(y, x), 6).alias("r2"),
        F.round(F.regr_avgx(y, x), 6).alias("avg_x"),
        F.round(F.regr_avgy(y, x), 4).alias("avg_y"),
    )


@query(
    "agg_trimmed_winsorized",
    "§2.4 robust aggregates: winsorized / trimmed means per group",
    """
    WITH ranked AS (
      SELECT o_orderpriority, o_totalprice,
             cume_dist() OVER (PARTITION BY o_orderpriority
                               ORDER BY o_totalprice) AS cd
      FROM orders
    ), cuts AS (
      SELECT o_orderpriority,
             min(CASE WHEN cd >= 0.10 THEN o_totalprice END) AS lo,
             min(CASE WHEN cd >= 0.90 THEN o_totalprice END) AS hi
      FROM ranked GROUP BY o_orderpriority
    )
    SELECT r.o_orderpriority,
           count(*) AS n,
           round(CAST(sum(CAST(least(greatest(r.o_totalprice, c.lo), c.hi)
                               AS DECIMAL(18,4))) AS DOUBLE)
                 / count(*), 4) AS winsorized_mean,
           round(CAST(sum(CASE WHEN r.o_totalprice BETWEEN c.lo AND c.hi
                               THEN CAST(r.o_totalprice AS DECIMAL(18,4))
                               ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
                 / sum(CASE WHEN r.o_totalprice BETWEEN c.lo AND c.hi
                            THEN 1 ELSE 0 END), 4) AS trimmed_mean,
           round(c.lo, 2) AS p10, round(c.hi, 2) AS p90
    FROM ranked r JOIN cuts c USING (o_orderpriority)
    GROUP BY r.o_orderpriority, c.lo, c.hi
    """,
)
def agg_trimmed_winsorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Outlier-robust group means: winsorized (clamp to the group's
    [p10, p90]) and trimmed (drop outside it). The cutpoints are
    DISCRETE quantiles derived from a cume_dist window — the smallest
    value whose cumulative distribution reaches q — because
    percentile_disc picks an actual data value, so the filter boundary
    is exact in both engines (an interpolated percentile_cont boundary
    could land between rows differently under float drift).

    Scale shape (the round-6 rewrite): o_orderpriority has 5 values, so
    a cume_dist window partitioned on it sorts ~1/5 of the table on one
    task. The cutpoints now come from ``grouped_kth`` SELECTION:
    bucket counts aggregate map-side (only O(#priorities x #ranges)
    rows shuffle), the tiny cumulative table locates each quantile's
    bucket, and the only row-level sort runs over those two buckets —
    cd >= q becomes the rank-k pick k = ceil(q*n), which selects the
    identical discrete value (a value qualifies under one iff its last
    tied row qualifies under the other). The 5-row cuts table
    broadcasts back onto the base scan — no window touches the full
    table at all. Sums run as decimal(18,4) so accumulation order
    cannot flip a cent (the q9 discipline); only the final division is
    double; the aggregate itself is partial-agg friendly (sum/count
    pairs)."""
    from spark_lineage_spark.operators.analytics import grouped_kth

    o = load(spark, sf_dir, "orders").select("o_orderpriority", "o_totalprice")
    kth = grouped_kth(
        o,
        ["o_orderpriority"],
        "o_totalprice",
        F.floor(F.col("_v") / F.lit(1000.0)).cast("bigint"),
        [("lo", 1, 10), ("hi", 9, 10)],
    )
    cuts = kth.groupBy("o_orderpriority").agg(
        F.min(F.when(F.col("_q") == "lo", F.col("_v"))).alias("lo"),
        F.min(F.when(F.col("_q") == "hi", F.col("_v"))).alias("hi"),
    )
    dec = lambda c: c.cast("decimal(18,4)")  # noqa: E731
    j = o.join(F.broadcast(cuts), "o_orderpriority")
    inside = F.col("o_totalprice").between(F.col("lo"), F.col("hi"))
    return (
        j.groupBy("o_orderpriority", "lo", "hi")
        .agg(
            F.count("*").alias("n"),
            F.round(
                F.sum(dec(F.least(F.greatest("o_totalprice", "lo"), F.col("hi"))))
                .cast("double")
                / F.count("*"),
                4,
            ).alias("winsorized_mean"),
            F.round(
                F.sum(F.when(inside, dec(F.col("o_totalprice"))).otherwise(dec(F.lit(0))))
                .cast("double")
                / F.sum(F.when(inside, 1).otherwise(0)),
                4,
            ).alias("trimmed_mean"),
        )
        .select(
            "o_orderpriority",
            "n",
            "winsorized_mean",
            "trimmed_mean",
            F.round("lo", 2).alias("p10"),
            F.round("hi", 2).alias("p90"),
        )
    )


@query(
    "agg_distinct_kmv",
    "§2.4 KMV distinct-count sketch (portable md5 hash, oracle-exact)",
    """
    WITH hashed AS (
      SELECT DISTINCT CAST(concat('0x', substr(md5(CAST(l_partkey AS VARCHAR)), 1, 15))
                           AS BIGINT) AS h
      FROM lineitem
    ), mink AS (
      SELECT h, row_number() OVER (ORDER BY h) AS r FROM hashed
      ORDER BY h LIMIT 256
    ), kth AS (
      SELECT max(h) AS hk, count(*) AS k FROM mink
    )
    SELECT k AS k_used, hk AS kth_hash,
           round((k - 1) / (CAST(hk AS DOUBLE) / 1152921504606846976), 2)
             AS est_distinct,
           (SELECT count(DISTINCT l_partkey) FROM lineitem) AS true_distinct
    FROM kth
    """,
)
def agg_distinct_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-minimum-values distinct sketch, the mergeable alternative to
    HLL that is EXACTLY reproducible across engines: hash every key
    with md5 (portable, unlike xxhash64 seeds), keep the k=256 smallest
    distinct hashes, estimate |D| ~= (k-1) / (h_k / 2^60) where h_k is
    the k-th minimum as a fraction of the 60-bit hash space. Every
    intermediate is an integer, so the oracle matches bit-for-bit —
    the check agg_approx_sketches (HLL, rows-only) cannot have.

    Plan shape: the distinct is a hash aggregate with MAP-SIDE partial
    dedup (each partition dedups before the exchange — per-partition
    distinct hashes are all that shuffles), then the ORDER BY h LIMIT k
    is Spark's TakeOrderedAndProject: a per-partition top-k merge, NOT
    a global sort. That is the textbook distributed KMV: partial
    sketches per partition, k-way merge of k-sized sets. true_distinct
    rides along for the relative-error read-out.

    At 100 TB: shuffle volume is bounded by distinct-per-partition, and
    the final merge moves only k longs per partition. For a per-group
    version, the same pipeline groups by (key, h)."""
    li = load(spark, sf_dir, "lineitem").select("l_partkey")
    h = F.conv(F.substring(F.md5(F.col("l_partkey").cast("string").cast("binary")), 1, 15), 16, 10).cast(
        "bigint"
    )
    mink = li.select(h.alias("h")).distinct().orderBy("h").limit(256)
    kth = mink.agg(F.max("h").alias("hk"), F.count("*").alias("k"))
    true_d = li.agg(F.countDistinct("l_partkey").alias("true_distinct"))
    return (
        kth.crossJoin(F.broadcast(true_d))  # two 1-row aggregates
        .select(
            F.col("k").alias("k_used"),
            F.col("hk").alias("kth_hash"),
            F.round(
                (F.col("k") - F.lit(1)) / (F.col("hk").cast("double") / F.lit(1152921504606846976)),
                2,
            ).alias("est_distinct"),
            "true_distinct",
        )
    )


@query(
    "agg_median_abs_deviation",
    "§2.4 robust dispersion: median absolute deviation (discrete medians)",
    """
    WITH ranked AS (
      SELECT l_returnflag, l_extendedprice,
             cume_dist() OVER (PARTITION BY l_returnflag
                               ORDER BY l_extendedprice) AS cd
      FROM lineitem
    ),
    med AS (
      SELECT l_returnflag,
             min(CASE WHEN cd >= 0.5 THEN l_extendedprice END) AS median
      FROM ranked GROUP BY l_returnflag
    ),
    dev AS (
      SELECT r.l_returnflag, m.median,
             abs(cast(r.l_extendedprice AS DECIMAL(18,2))
                 - cast(m.median AS DECIMAL(18,2))) AS ad,
             cume_dist() OVER (PARTITION BY r.l_returnflag
                               ORDER BY abs(cast(r.l_extendedprice AS DECIMAL(18,2))
                                            - cast(m.median AS DECIMAL(18,2)))) AS cd
      FROM ranked r JOIN med m ON r.l_returnflag = m.l_returnflag
    )
    SELECT l_returnflag,
           round(min(median), 2) AS median,
           cast(round(min(CASE WHEN cd >= 0.5 THEN ad END), 2) AS DOUBLE) AS mad,
           count(*) AS n
    FROM dev GROUP BY l_returnflag
    """,
    doc="MAD per return flag: median of |x - median|, discrete both times.",
)
def agg_median_abs_deviation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median absolute deviation — the robust spread statistic (50%
    breakdown point vs stddev's 0). Both medians are DISCRETE: the
    smallest value whose cumulative rank reaches half the group, i.e.
    the value at per-group rank ceil(n/2), which for row ranks is
    exactly min(x WHERE 2*rnk >= n) — the same value cume_dist >= 0.5
    picks (a value qualifies under one iff its last tied row qualifies
    under the other), so the cume_dist oracle matches bit-for-bit.
    Deviations are decimal(18,2)-exact so the second ranking has no
    float boundary at all.

    Scale shape (the round-6 rewrite): l_returnflag has 3 values, so a
    cume_dist window partitioned on it sorts ~1/3 of the fact table on
    a single task (SCALE.md 10x ratio was 11.1 — the one entry > 10).
    Both medians now come from ``grouped_kth`` SELECTION (the
    two-pass histogram cut the original docstring promised): bucket
    counts aggregate map-side — only O(#flags x #price-ranges) rows
    shuffle, never the fact rows — the tiny cumulative table locates
    the median's bucket + in-bucket offset, and the only row-level
    sort runs over that single bucket (~n/#ranges rows). The median
    join back is a broadcast of 3 rows; the integer rank threshold
    replaces the float cume_dist comparison (same selected value).

    Deviation arithmetic (optimization r15, guide §2.3 narrower
    types): prices are exact 2-decimal values, so the deviation runs
    in CENTS AS LONG — round(price*100) recovers the exact integer
    cents from the stored double (the product is correctly rounded
    and the true value is within 0.5 of it), |cents_x - cents_m| is
    exact int64, and cents/100.0 followed by round(·, 2) yields the
    IDENTICAL double the old decimal(18,2) path produced (both are
    the nearest double to the same exact 2-decimal value; ordering
    and ties are preserved under the monotone bijection, so the same
    row is selected). Measured: the decimal abs pass cost 0.90 s vs
    0.31 s in cents per fact pass, 2 passes per invocation.
    """
    from spark_lineage_spark.operators.analytics import grouped_kth
    from spark_lineage_spark.plans.extract import lineage_checkpoint

    li = load(spark, sf_dir, "lineitem").select("l_returnflag", "l_extendedprice")
    # 3-row result, consumed by both the deviation join and the final
    # select: checkpoint so the second selection pass cannot re-run
    # the first one under it. eager=False (optimization r14): under
    # AQE the upstream stages execute at build either way; lazy defers
    # the final materialization stage into the first consuming action
    # — measured neutral-to-slightly-faster, one fewer barrier.
    med = lineage_checkpoint(
        grouped_kth(
            li,
            ["l_returnflag"],
            "l_extendedprice",
            F.floor(F.col("_v") / F.lit(1000.0)).cast("bigint"),
            [("med", 1, 2)],
        ).select(
            "l_returnflag", F.col("_v").alias("median"), "n"
        ),
        eager=False,
    )
    dev = li.join(F.broadcast(med), "l_returnflag").withColumn(
        "ad",
        F.abs(
            F.round(F.col("l_extendedprice") * 100).cast("long")
            - F.round(F.col("median") * 100).cast("long")
        ),
    )
    mad = grouped_kth(
        dev,
        ["l_returnflag"],
        "ad",
        F.floor(F.col("_v") / F.lit(100000)).cast("bigint"),
        [("mad", 1, 2)],
    ).select("l_returnflag", F.col("_v").alias("mad_cents"))
    return mad.join(med, "l_returnflag").select(
        "l_returnflag",
        F.round("median", 2).alias("median"),
        F.round(F.col("mad_cents") / 100, 2).alias("mad"),
        "n",
    )


@query(
    "agg_higher_moments",
    "§2.4 skewness / excess kurtosis from exact centered power sums",
    """
    WITH m AS (
      SELECT o_orderpriority,
             CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,6)) * 1000000 AS BIGINT))
               // count(*) AS BIGINT)
               AS mean_u,
             count(*) AS n
      FROM orders GROUP BY o_orderpriority
    ),
    d AS (
      SELECT o.o_orderpriority, m.n,
             CAST(CAST(CAST(o_totalprice AS DECIMAL(18,6)) * 1000000 AS BIGINT)
                  - m.mean_u AS DOUBLE)
               / 1000000 AS dx
      FROM orders o JOIN m ON o.o_orderpriority = m.o_orderpriority
    ),
    s AS (
      SELECT o_orderpriority, max(n) AS n,
             sum(CAST(round(dx * dx, 6) AS DECIMAL(38,6))) AS s2,
             sum(CAST(round(dx * dx * dx, 4) AS DECIMAL(38,4))) AS s3,
             sum(CAST(round(dx * dx * dx * dx, 2) AS DECIMAL(38,2))) AS s4
      FROM d GROUP BY o_orderpriority
    )
    SELECT o_orderpriority, n,
           round(cast(s3 AS DOUBLE) / n
                 / pow(cast(s2 AS DOUBLE) / n, 1.5), 6) AS skewness,
           round(cast(s4 AS DOUBLE) / n
                 / pow(cast(s2 AS DOUBLE) / n, 2) - 3.0, 6) AS excess_kurtosis
    FROM s
    """,
    doc="Population skewness g1 and excess kurtosis g2 per order priority.",
)
def agg_higher_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Third and fourth standardized moments — built-in skewness()/
    kurtosis() disagree across engines on bias correction, so both
    sides compute the population moments from scratch with the
    determinism ladder: the group mean is an exact micro-unit integer
    quotient (sum_u div n — both engines truncate non-negatives
    identically), per-row deviations are exact integer differences
    cast once to double (identical bits), each power term is rounded
    and decimal-cast so the power SUMS are partial-agg-order
    independent, and only the final normalizations are double.

    Two passes over the group (mean, then centered sums) — the
    textbook two-pass moment algorithm; both aggs share the group-key
    exchange. The one-pass raw-power-sum alternative overflows
    decimal at x^4 on wide value ranges; centering keeps magnitudes
    bounded by the group's spread.
    """
    o = load(spark, sf_dir, "orders").select("o_orderpriority", "o_totalprice")
    xu = (F.col("o_totalprice").cast("decimal(18,6)") * 1_000_000).cast("bigint")
    m = o.groupBy("o_orderpriority").agg(
        F.expr(
            "cast(sum(cast(cast(o_totalprice as decimal(18,6)) * 1000000 as bigint))"
            " div count(*) as bigint)"
        ).alias(
            "mean_u"
        ),
        F.count(F.lit(1)).alias("n"),
    )
    d = o.join(m, "o_orderpriority").select(
        "o_orderpriority",
        "n",
        ((xu - F.col("mean_u")).cast("double") / 1_000_000).alias("dx"),
    )
    dx = F.col("dx")
    s = d.groupBy("o_orderpriority").agg(
        F.max("n").alias("n"),
        F.sum(F.round(dx * dx, 6).cast("decimal(38,6)")).alias("s2"),
        F.sum(F.round(dx * dx * dx, 4).cast("decimal(38,4)")).alias("s3"),
        F.sum(F.round(dx * dx * dx * dx, 2).cast("decimal(38,2)")).alias("s4"),
    )
    v = F.col("s2").cast("double") / F.col("n")
    return s.select(
        "o_orderpriority",
        "n",
        F.round(F.col("s3").cast("double") / F.col("n") / F.pow(v, 1.5), 6).alias(
            "skewness"
        ),
        F.round(
            F.col("s4").cast("double") / F.col("n") / F.pow(v, 2.0) - 3.0, 6
        ).alias("excess_kurtosis"),
    )


_CORR_SQL = """
WITH s AS (
  SELECT l_returnflag, count(*) AS n,
         sum(CAST(l_quantity AS DECIMAL(19,6))) AS sq,
         sum(CAST(l_extendedprice AS DECIMAL(19,6))) AS sp,
         sum(CAST(l_discount AS DECIMAL(19,6))) AS sd,
         sum(CAST(l_quantity AS DECIMAL(19,6))
             * CAST(l_extendedprice AS DECIMAL(19,6))) AS sqp,
         sum(CAST(l_quantity AS DECIMAL(19,6))
             * CAST(l_discount AS DECIMAL(19,6))) AS sqd,
         sum(CAST(l_extendedprice AS DECIMAL(19,6))
             * CAST(l_discount AS DECIMAL(19,6))) AS spd,
         sum(CAST(l_quantity AS DECIMAL(19,6))
             * CAST(l_quantity AS DECIMAL(19,6))) AS sqq,
         sum(CAST(l_extendedprice AS DECIMAL(19,6))
             * CAST(l_extendedprice AS DECIMAL(19,6))) AS spp,
         sum(CAST(l_discount AS DECIMAL(19,6))
             * CAST(l_discount AS DECIMAL(19,6))) AS sdd
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, pair, n,
       round((n * sxy - sx * sy)
             / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS corr
FROM (
  SELECT l_returnflag, 'qty_price' AS pair, n,
         cast(sq AS DOUBLE) AS sx, cast(sp AS DOUBLE) AS sy,
         cast(sqp AS DOUBLE) AS sxy, cast(sqq AS DOUBLE) AS sxx,
         cast(spp AS DOUBLE) AS syy
  FROM s
  UNION ALL
  SELECT l_returnflag, 'qty_discount', n,
         cast(sq AS DOUBLE), cast(sd AS DOUBLE),
         cast(sqd AS DOUBLE), cast(sqq AS DOUBLE), cast(sdd AS DOUBLE)
  FROM s
  UNION ALL
  SELECT l_returnflag, 'price_discount', n,
         cast(sp AS DOUBLE), cast(sd AS DOUBLE),
         cast(spd AS DOUBLE), cast(spp AS DOUBLE), cast(sdd AS DOUBLE)
  FROM s
)
"""


@query(
    "agg_correlation_matrix",
    "§2.4 pairwise Pearson correlations from exact decimal sums",
    _CORR_SQL,
    doc="corr(qty,price), corr(qty,discount), corr(price,discount) per flag.",
)
def agg_correlation_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation of three measures per return flag.
    Built-in corr() accumulates running doubles whose partial-merge
    order perturbs the last bits, so both engines instead compute the
    five raw sums per pair as EXACT decimals in one hash aggregate
    (partial-agg friendly, order-free) and apply
    (n*sxy - sx*sy) / sqrt((n*sxx - sx^2)(n*syy - sy^2)) on
    identically-cast doubles. Identical SQL text both engines; the
    3-pair expansion is a UNION ALL over the one-row-per-group sums
    table, not a rescan.
    """
    register_views(spark, sf_dir, ["lineitem"])
    return spark.sql(_CORR_SQL)


@query(
    "agg_bitmap_distinct",
    "§2.4 exact distinct via bitmap aggregation (bucketed bitmaps, OR-mergeable)",
    """
    SELECT l_returnflag, count(DISTINCT l_orderkey) AS n_orders
    FROM lineitem GROUP BY l_returnflag
    UNION ALL
    SELECT 'ALL', count(DISTINCT l_orderkey) FROM lineitem
    """,
)
def agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct counting with Spark 3.5's bitmap functions — the
    ClickHouse-groupBitmap shape that replaces count(DISTINCT) at
    100 TB. Keys are sharded into 32k-bit buckets
    (``bitmap_bucket_number``); each (group, bucket) aggregates a fixed
    4 KB bitmap via ``bitmap_construct_agg`` (map-side partial, tiny
    state), and the distinct count is the SUM of per-bucket popcounts —
    no Expand plan, no per-group hash set of raw keys. The stored
    per-bucket bitmaps are also OR-mergeable: the ALL row is produced
    by ``bitmap_or_agg`` over the per-flag bitmaps (a rollup over
    sketches, not a rescan of the fact), which is exactly how a
    day->month->total distinct rollup avoids re-reading history.
    Unlike HLL this is EXACT, so the DuckDB count(DISTINCT) oracle is a
    full value-hash check of both levels."""
    li = load(spark, sf_dir, "lineitem")
    per_bucket = li.groupBy(
        "l_returnflag",
        F.bitmap_bucket_number(F.col("l_orderkey")).alias("bucket"),
    ).agg(
        F.bitmap_construct_agg(F.bitmap_bit_position(F.col("l_orderkey"))).alias("bm")
    )
    per_flag = per_bucket.groupBy("l_returnflag").agg(
        F.sum(F.bitmap_count("bm")).alias("n_orders")
    )
    overall = (
        per_bucket.groupBy("bucket")
        .agg(F.bitmap_or_agg("bm").alias("bm"))
        .agg(F.sum(F.bitmap_count("bm")).alias("n_orders"))
        .select(F.lit("ALL").alias("l_returnflag"), "n_orders")
    )
    return per_flag.unionByName(overall)


@query(
    "agg_count_min_sketch",
    "§2.4 count-min sketch (portable md5 rows, mergeable counters, oracle-exact)",
    """
    WITH hashed AS (
      SELECT l_partkey, md5(CAST(l_partkey AS VARCHAR)) AS dig FROM lineitem
    ), cells AS (
      SELECT d.d AS d,
             CAST(concat('0x', substr(dig, 1 + 8 * d.d, 8)) AS BIGINT) % 256
               AS cell,
             count(*) AS cnt
      FROM hashed CROSS JOIN (SELECT unnest(range(4)) AS d) d
      GROUP BY 1, 2
    ), topk AS (
      SELECT l_partkey, count(*) AS exact_cnt FROM lineitem
      GROUP BY 1 ORDER BY exact_cnt DESC, l_partkey LIMIT 10
    ), probes AS (
      SELECT t.l_partkey, t.exact_cnt, d.d,
             CAST(concat('0x', substr(md5(CAST(t.l_partkey AS VARCHAR)),
                                      1 + 8 * d.d, 8))
                  AS BIGINT) % 256 AS cell
      FROM topk t CROSS JOIN (SELECT unnest(range(4)) AS d) d
    )
    SELECT p.l_partkey, p.exact_cnt,
           CAST(min(c.cnt) AS BIGINT) AS cms_est,
           CAST(min(c.cnt) - p.exact_cnt AS BIGINT) AS overcount
    FROM probes p JOIN cells c ON p.d = c.d AND p.cell = c.cell
    GROUP BY 1, 2 ORDER BY p.exact_cnt DESC, p.l_partkey
    """,
)
def agg_count_min_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch built from scratch with PORTABLE md5 row
    hashes (d=4 rows x w=256 counters), so unlike Spark's native
    ``count_min_sketch`` (xxhash-seeded binary blob, engine-specific)
    every counter — and therefore the estimate — is bit-identical in
    DuckDB and fully value-hash-checked (the 4 rows are disjoint 8-hex
    slices of ONE md5 digest — one hash evaluation per input row). The sketch is the canonical
    bounded-state frequency summary at 100 TB: each input row
    contributes to exactly d cells and two sketches merge by cell-wise
    addition (the groupBy's merge step IS the sketch union). The
    estimate for a key is min over its d counters; CMS never
    undercounts, so ``overcount >= 0`` always — the output reports est
    vs exact for the top-10 keys (deterministic count-desc/key
    tie-break). Query side: the probe table is 10 keys x 4 rows,
    broadcast to the 1024 counters; nothing rescans the fact.

    Optimization r14 (guide §2.3 shuffle less + §1.2): the sketch and
    the exact top-k used to run as two INDEPENDENT fact scans — and
    since cell is a pure function of the KEY, the sketch pass was
    hashing every fact row (600 k md5s in the fixture's single scan
    task, ~2.7 s serial). The per-key exact counts the top-k already
    needs are now built once (checkpointed) and the cells derive from
    them by a weighted sum: cnt(d, cell) = Σ exact_cnt over keys
    hashing to the cell — identical integers, ONE fact scan, and md5
    runs once per DISTINCT key (~30× fewer calls here). At 100 TB the
    mandatory per-key aggregation dominates either way; deriving the
    sketch from it adds only a |keys|-row pass."""
    from spark_lineage_spark.plans.extract import lineage_checkpoint

    li = load(spark, sf_dir, "lineitem").select("l_partkey")
    per_key = (
        li.groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("exact_cnt"))
        .transform(lineage_checkpoint)  # feeds the cells AND the top-k
    )
    # ONE md5 per key; the d=4 sketch rows are 4 disjoint 8-hex-char
    # slices of the 32-char digest (the split-one-strong-hash CMS
    # trick) — measured 5.1s -> ~2s at sf0.1 vs 4 salted md5 calls
    depth = F.explode(F.sequence(F.lit(0), F.lit(3))).alias("d")
    cell = (
        F.expr(
            "cast(conv(substring(dig, 1 + 8 * d, 8), 16, 10) AS BIGINT)"
        )
        % 256
    ).alias("cell")
    cells = (
        per_key.select(
            "exact_cnt",
            F.expr("md5(cast(cast(l_partkey AS STRING) AS BINARY))").alias("dig"),
        )
        .select("exact_cnt", "dig", depth)
        .select("exact_cnt", F.col("d"), cell)
        .groupBy("d", "cell")
        .agg(F.sum("exact_cnt").alias("cnt"))
    )
    topk = per_key.orderBy(F.desc("exact_cnt"), "l_partkey").limit(10)
    probes = (
        topk.withColumn(
            "dig", F.expr("md5(cast(cast(l_partkey AS STRING) AS BINARY))")
        )
        .select("l_partkey", "exact_cnt", "dig", depth)
        .select("l_partkey", "exact_cnt", "d", cell)
    )
    return (
        F.broadcast(probes)
        .join(cells, ["d", "cell"])
        .groupBy("l_partkey", "exact_cnt")
        .agg(F.min("cnt").alias("cms_est"))
        .select(
            "l_partkey",
            "exact_cnt",
            "cms_est",
            (F.col("cms_est") - F.col("exact_cnt")).alias("overcount"),
        )
    )


@query(
    "stat_crosstab",
    "§2.4 df.stat.crosstab contingency table (order priority × status)",
    """
    SELECT o_orderpriority AS priority,
           count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_f,
           count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_o,
           count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS n_p
    FROM orders GROUP BY o_orderpriority
    """,
)
def stat_crosstab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``df.stat.crosstab`` — the DataFrame-stats contingency table
    (VERDICT r7 item 4's df.stat battery, exact half). One pass, one
    shuffle on the pair key — identical cost shape to the conditional
    pivot it desugars to, so it holds at any scale. The crosstab
    result column per status value is selected explicitly (F/O/P are
    the complete TPC-H o_orderstatus domain) so the column order is
    deterministic regardless of the value-discovery order."""
    orders = load(spark, sf_dir, "orders")
    ct = orders.stat.crosstab("o_orderpriority", "o_orderstatus")
    return ct.select(
        F.col("o_orderpriority_o_orderstatus").alias("priority"),
        F.col("F").alias("n_f"),
        F.col("O").alias("n_o"),
        F.col("P").alias("n_p"),
    )


@query(
    "stat_df_battery",
    "§2.4 df.stat battery: cov / corr / exact approxQuantile / freqItems",
    """
    WITH t AS (SELECT l_quantity AS q, l_extendedprice AS p, l_returnflag AS f
               FROM lineitem)
    SELECT 'corr_qty_price' AS metric, round(corr(q, p), 6) AS value FROM t
    UNION ALL
    SELECT 'cov_qty_price', round(covar_samp(q, p), 6) FROM t
    UNION ALL
    SELECT 'q25_qty', CAST(quantile_disc(q, 0.25) AS DOUBLE) FROM t
    UNION ALL
    SELECT 'q50_qty', CAST(quantile_disc(q, 0.50) AS DOUBLE) FROM t
    UNION ALL
    SELECT 'q75_qty', CAST(quantile_disc(q, 0.75) AS DOUBLE) FROM t
    UNION ALL
    SELECT 'q50_price', CAST(quantile_disc(p, 0.50) AS DOUBLE) FROM t
    UNION ALL
    SELECT 'n_freq_flags', CAST(count(*) AS DOUBLE) FROM (
      SELECT f FROM t GROUP BY f
      HAVING count(*) > 0.2 * (SELECT count(*) FROM t))
    """,
)
def stat_df_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The rest of the ``df.stat`` API (VERDICT r7 item 4):
    ``cov`` / ``corr`` (co-moment streaming aggregate), ``approxQuantile``
    with relativeError=0 — which the API contract defines as EXACT
    quantiles, making it oracle-checkable against DuckDB's
    quantile_disc — and ``freqItems``. These calls return driver
    scalars by design (the computation is a distributed single pass;
    only the constant-size result lands on the driver), so the query
    re-wraps them as a metric/value table.

    freqItems is a one-pass heavy-hitter SKETCH whose output is a
    superset of the true >support items and may contain extra
    candidates in partition-dependent order — the deterministic,
    oracle-checkable fact is |freqItems ∩ exact-heavy-hitters| =
    |exact-heavy-hitters| (the superset guarantee), which is what
    n_freq_flags reports. cov/corr are rounded to 6 dp because the
    co-moment accumulation order varies with partitioning (measured
    ulp-level spread at sf0.1); the property-level agreement with the
    exact decimal-sum computation is tests/test_aggregates_stat.py.
    The quantile_disc equivalence is NOT fixture-luck: both engines use
    nearest-rank ceil(p*n) 1-based, pinned on duplicate-free data
    across odd/even n by test_exact_quantile_convention_matches_duckdb
    (ADVICE r8)."""
    from concurrent.futures import ThreadPoolExecutor

    li = load(spark, sf_dir, "lineitem")
    # Optimization r15 (guide §7.3/§2.6): every df.stat call is an
    # independent driver-blocking job, and the ε=0 approxQuantile
    # passes dominate (measured 1.7-4.2 s of the battery — their
    # exactness is the op's oracle-checked contract, so that cost
    # stays). So: (a) both quantile calls run on worker threads while
    # the small jobs (cov, corr, freqItems, group counts) execute
    # concurrently on the caller's thread and hide under them; (b)
    # n_rows comes from the same group-count collect as the exact
    # heavy hitters (count(*) == sum of group counts, exactly, null
    # group included). The calls stay PER-COLUMN deliberately: the
    # documented multi-column form was measured 3.4× SLOWER at the 10×
    # probe (52 s vs 15 s — one treeAggregate dragging both columns'
    # uncompressed ε=0 summaries), so two independent overlapped
    # passes win at every scale. Every df.stat API the battery exists
    # to cover is still exercised; each scalar is computed by the same
    # call as before, so values are unchanged.
    with ThreadPoolExecutor(max_workers=2) as pool:
        fut_q = pool.submit(
            li.stat.approxQuantile, "l_quantity", [0.25, 0.5, 0.75], 0.0
        )
        fut_p = pool.submit(
            li.stat.approxQuantile, "l_extendedprice", [0.5], 0.0
        )
        cov = li.stat.cov("l_quantity", "l_extendedprice")
        corr = li.stat.corr("l_quantity", "l_extendedprice")
        freq = set(li.stat.freqItems(["l_returnflag"], 0.2).collect()[0][0])  # bounded-collect-ok: 1 row of ≤16 items
        flag_counts = (
            li.groupBy("l_returnflag")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()  # bounded-collect-ok: ≤ n-distinct-flags rows
        )
        q25, q50, q75 = fut_q.result()
        (q50_price,) = fut_p.result()
    n_rows = sum(r.n for r in flag_counts)
    exact_heavy = {r.l_returnflag for r in flag_counts if r.n > 0.2 * n_rows}
    n_freq = float(len(freq & exact_heavy))
    rows = [
        ("corr_qty_price", corr),
        ("cov_qty_price", cov),
        ("q25_qty", q25),
        ("q50_qty", q50),
        ("q75_qty", q75),
        ("q50_price", q50_price),
        ("n_freq_flags", n_freq),
    ]
    return spark.createDataFrame(rows, "metric string, value double").select(
        "metric", F.round("value", 6).alias("value")
    )


@query(
    "agg_stack_unpivot",
    "§2.4 stack() n-way unpivot of computed aggregates (incl. try_sum/try_avg)",
    """
    WITH agg AS (
      SELECT l_returnflag,
             round(sum(l_quantity), 2) AS sq,
             round(sum(l_extendedprice), 2) AS sp,
             round(avg(l_quantity), 4) AS aq
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, 'sum_qty' AS metric, sq AS value FROM agg
    UNION ALL SELECT l_returnflag, 'sum_price', sp FROM agg
    UNION ALL SELECT l_returnflag, 'avg_qty', aq FROM agg
    UNION ALL SELECT l_returnflag, 'try_sum_overflow', CAST(NULL AS DOUBLE) FROM agg
    """,
)
def agg_stack_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``stack(n, k1, v1, ...)`` — the generator-style unpivot
    (VERDICT r7 item 5; agg_unpivot_melt covers the UNPIVOT/melt
    API, this covers the SQL table-generating function users reach
    for first). The stacked values come from one aggregation pass
    that also exercises ``try_sum`` / ``try_avg``: on clean input
    they equal sum/avg (checked through the sum_qty/avg_qty rows);
    the try_sum_overflow row feeds a decimal(38,0) sum that MUST
    overflow, and try_sum's contract turns that into NULL instead of
    an ANSI error — cross-checked by the oracle's literal NULL."""
    li = load(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.round(F.try_sum("l_quantity"), 2).alias("sq"),
        F.round(F.sum("l_extendedprice"), 2).alias("sp"),
        F.round(F.try_avg("l_quantity"), 4).alias("aq"),
        F.try_sum(F.expr("cast(9.9e36 AS decimal(38,0))"))
        .cast("double")
        .alias("overflowed"),
    )
    return agg.selectExpr(
        "l_returnflag",
        "stack(4, 'sum_qty', sq, 'sum_price', sp, 'avg_qty', aq,"
        " 'try_sum_overflow', overflowed) AS (metric, value)",
    )


@query(
    "agg_grouping_id",
    "§2.4 grouping_id() bit vector over grouping sets",
    """
    SELECT CASE WHEN GROUPING(l_returnflag) = 1 THEN NULL ELSE l_returnflag END
             AS l_returnflag,
           CASE WHEN GROUPING(l_linestatus) = 1 THEN NULL ELSE l_linestatus END
             AS l_linestatus,
           CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT)
             AS gid,
           count(*) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    """,
)
def agg_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``grouping_id()`` (VERDICT r7 item 5) — the packed bit vector
    that distinguishes subtotal levels in one integer instead of one
    grouping() call per column: bit i set ⇔ the i-th GROUP BY column
    is rolled up in this row. agg_grouping_sets covers per-column
    grouping(); this row pins the combined encoding (Spark packs
    left-to-right MSB-first, so gid = grouping(flag)*2 +
    grouping(status) — the oracle recomputes exactly that from
    DuckDB's per-column GROUPING)."""
    register_views(spark, sf_dir, ["lineitem"])
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               grouping_id() AS gid,
               count(*) AS n
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        """
    )


@query(
    "agg_approx_top_k",
    "§2.4 approx_top_k heavy hitters (k ≥ domain ⇒ exact, oracle-checked)",
    """
    SELECT event_type AS item, count(*) AS n
    FROM events GROUP BY event_type
    ORDER BY n DESC, item
    """,
)
def agg_approx_top_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4's ``approx_top_k`` — the built-in space-saving top-k
    frequency sketch (the engine-native answer to agg_count_min_sketch's
    from-scratch build). Sketch accuracy is exact whenever the sketch
    capacity covers the value domain; with k=16 over the handful of
    event types the result IS the exact frequency table, so the
    exploded (item, count) rows are fully value-hash-checked — the
    approximation behavior at k < domain is an accuracy property, not
    a semantics change. One partial-agg'd pass, constant-size state
    per partition — the same merge shape as any sketch at 100 TB."""
    register_views(spark, sf_dir, ["events"])
    return spark.sql(
        """
        SELECT t.item, t.count AS n
        FROM (SELECT explode(approx_top_k(event_type, 16)) AS t FROM events)
        ORDER BY n DESC, item
        """
    )


@query(
    "agg_filter_clause",
    "§2.4 ANSI FILTER (WHERE ...) clause on aggregates",
    """
    SELECT l_returnflag,
           count(*) AS n_all,
           count(*) FILTER (WHERE l_quantity > 25) AS n_big,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                FILTER (WHERE l_discount > 0.05) AS BIGINT) AS disc_price_cents,
           round(avg(l_quantity) FILTER (WHERE l_linestatus = 'F'), 6) AS avg_qty_f
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_filter_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ANSI ``FILTER (WHERE ...)`` aggregate modifier — the
    standard-SQL spelling of conditional aggregation that
    agg_boolean_conditional expresses with count_if/CASE: each
    aggregate sees only its predicate's rows, all predicates evaluated
    in ONE pass (no per-aggregate scans, no self-joins). Catalyst
    desugars FILTER to the same if(pred, x, null) partial aggregates,
    so the plan is identical to the CASE form — the oracle (DuckDB
    FILTER, same syntax) pins the semantics including
    empty-filter-set → NULL for sum/avg."""
    register_views(spark, sf_dir, ["lineitem"])
    return spark.sql(
        """
        SELECT l_returnflag,
               count(*) AS n_all,
               count(*) FILTER (WHERE l_quantity > 25) AS n_big,
               sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                 FILTER (WHERE l_discount > 0.05) AS disc_price_cents,
               round(avg(l_quantity) FILTER (WHERE l_linestatus = 'F'), 6)
                 AS avg_qty_f
        FROM lineitem GROUP BY l_returnflag
        """
    )


@query(
    "agg_kmv_union",
    "§2.4 KMV sketch UNION (mergeable distinct sketches combined across relations)",
    """
    WITH ev AS (
      SELECT DISTINCT event_type,
             CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
                  AS BIGINT) AS h
      FROM events WHERE event_type IN ('click', 'view')
    ), ska AS (
      SELECT h FROM ev WHERE event_type = 'click' ORDER BY h LIMIT 256
    ), skb AS (
      SELECT h FROM ev WHERE event_type = 'view' ORDER BY h LIMIT 256
    ), merged AS (
      SELECT DISTINCT h FROM (SELECT h FROM ska UNION ALL SELECT h FROM skb)
      ORDER BY h LIMIT 256
    ), kth AS (
      SELECT max(h) AS hk, count(*) AS k FROM merged
    )
    SELECT k AS k_used, hk AS kth_hash,
           round((k - 1) / (CAST(hk AS DOUBLE) / 1152921504606846976), 2)
             AS est_union_distinct,
           (SELECT count(DISTINCT user_id) FROM events
             WHERE event_type IN ('click', 'view')) AS true_union_distinct
    FROM kth
    """,
)
def agg_kmv_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The property that makes sketches the 100 TB distinct-count
    answer: MERGEABILITY. Two KMV sketches (k=256 min md5 hashes of
    click users and of view users, built independently — e.g. one per
    day, per table, per partition) combine by unioning the hash sets
    and re-taking the k smallest; the result is EXACTLY the sketch of
    the union stream, so |clicks ∪ views| is estimated without ever
    rescanning either input. Every intermediate is an integer (60-bit
    hash space, (k-1)/f_k estimator), so the DuckDB oracle matches
    bit-for-bit — sketch-vs-sketch parity, with the true union
    distinct riding along to read off the error. The merge itself
    moves 2k longs: at scale the pattern is per-partition/per-day
    sketch tables UNION ALL'd and re-min-k'd, never a re-count."""
    ev = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("click", "view"))
        .select("event_type", "user_id")
    )
    h = F.conv(
        F.substring(F.md5(F.col("user_id").cast("string").cast("binary")), 1, 15), 16, 10
    ).cast("bigint")
    hashed = ev.select("event_type", h.alias("h")).distinct()
    ska = hashed.filter(F.col("event_type") == "click").select("h").orderBy("h").limit(256)
    skb = hashed.filter(F.col("event_type") == "view").select("h").orderBy("h").limit(256)
    merged = ska.unionAll(skb).distinct().orderBy("h").limit(256)
    kth = merged.agg(F.max("h").alias("hk"), F.count("*").alias("k"))
    true_u = ev.agg(F.countDistinct("user_id").alias("true_union_distinct"))
    return kth.crossJoin(F.broadcast(true_u)).select(
        F.col("k").alias("k_used"),
        F.col("hk").alias("kth_hash"),
        F.round(
            (F.col("k") - F.lit(1))
            / (F.col("hk").cast("double") / F.lit(1152921504606846976)),
            2,
        ).alias("est_union_distinct"),
        "true_union_distinct",
    )


@query(
    "agg_bitmap_native",
    "§2.4 Spark-4 native bitmap aggregates (bitmap_construct_agg / bitmap_or_agg / bitmap_count)",
    """
    SELECT l_returnflag,
           count(DISTINCT l_partkey) AS distinct_direct,
           count(DISTINCT l_partkey) AS distinct_merged
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_bitmap_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4's built-in bitmap family — the engine-native version of
    agg_bitmap_distinct's hand-rolled bitmaps: keys bucket by
    bitmap_bucket_number (32768 bits per bucket), each bucket builds a
    dense bitmap with bitmap_construct_agg(bitmap_bit_position(key)),
    and bitmap_count sums set bits to an EXACT distinct count. Two
    paths prove mergeability: distinct_direct aggregates each
    (flag, bucket) group once; distinct_merged first builds finer
    (flag, linestatus, bucket) bitmaps, then bitmap_or_agg ORs the
    sub-bitmaps per (flag, bucket) — the re-aggregation pattern that
    lets daily bitmap partials roll up to any coarser grain without
    touching raw data. Both must equal count(DISTINCT) exactly (the
    oracle states it twice). At 100 TB bitmaps beat sets when keys
    are dense integers: fixed 4 KiB per bucket regardless of
    cardinality, and partition partials OR together."""
    register_views(spark, sf_dir, ["lineitem"])
    return spark.sql(
        """
        WITH direct AS (
          SELECT l_returnflag,
                 bitmap_count(bitmap_construct_agg(bitmap_bit_position(l_partkey))) AS c
          FROM lineitem
          GROUP BY l_returnflag, bitmap_bucket_number(l_partkey)
        ), fine AS (
          SELECT l_returnflag, l_linestatus,
                 bitmap_bucket_number(l_partkey) AS bucket,
                 bitmap_construct_agg(bitmap_bit_position(l_partkey)) AS bm
          FROM lineitem
          GROUP BY l_returnflag, l_linestatus, bitmap_bucket_number(l_partkey)
        ), merged AS (
          SELECT l_returnflag, bitmap_count(bitmap_or_agg(bm)) AS c
          FROM fine GROUP BY l_returnflag, bucket
        )
        SELECT d.l_returnflag,
               CAST(d.n AS BIGINT) AS distinct_direct,
               CAST(m.n AS BIGINT) AS distinct_merged
        FROM (SELECT l_returnflag, sum(c) AS n FROM direct GROUP BY l_returnflag) d
        JOIN (SELECT l_returnflag, sum(c) AS n FROM merged GROUP BY l_returnflag) m
          USING (l_returnflag)
        """
    )


@query(
    "agg_listagg_distinct",
    "§2.4 listagg(DISTINCT ... ) WITHIN GROUP (ordered distinct string aggregation)",
    """
    SELECT o_orderstatus,
           string_agg(DISTINCT o_orderpriority, '|' ORDER BY o_orderpriority)
             AS priorities,
           CAST(count(DISTINCT o_orderpriority) AS BIGINT) AS n_distinct
    FROM orders GROUP BY o_orderstatus
    """,
)
def agg_listagg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DISTINCT + WITHIN GROUP form of listagg (Spark 4) — dedup
    and a pinned output order inside ONE ordered-set aggregate, the
    ANSI spelling of collect_set→sort→join that agg_collect_listagg
    hand-builds. DuckDB's string_agg(DISTINCT ... ORDER BY) states
    the identical contract, so separator placement and order are
    cross-engine checked. Distinct-ordered aggregation shuffles only
    (group, value) pairs after map-side dedup — at 100 TB the value
    domain (5 priorities) bounds state, not the row count.
    (Found and pinned: Spark 4.1 throws ClassCastException when
    listagg(DISTINCT) WITHIN GROUP shares an Aggregate with
    count(DISTINCT) — ListAgg.withNewChildrenInternal mishandles the
    distinct-rewrite children — so n_distinct derives from the
    aggregated string instead of a second distinct aggregate.)"""
    register_views(spark, sf_dir, ["orders"])
    return spark.sql(
        """
        SELECT o_orderstatus, priorities,
               CAST(size(split(priorities, '[|]')) AS BIGINT) AS n_distinct
        FROM (
          SELECT o_orderstatus,
                 listagg(DISTINCT o_orderpriority, '|')
                   WITHIN GROUP (ORDER BY o_orderpriority) AS priorities
          FROM orders GROUP BY o_orderstatus
        )
        """
    )
