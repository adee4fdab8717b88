"""Window functions (SURVEY.md §2.5): ranking, analytic, frames, top-k.

Windows shuffle once on partitionBy keys then sort within partitions —
the same plan a 1000-executor cluster runs. Determinism discipline:
every orderBy carries a unique tie-break column so row_number/lag/
frames are reproducible across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from spark_lineage_spark.registry import query
from spark_lineage_spark.tables import load

_ORD = "ORDER BY l_quantity DESC, l_orderkey, l_linenumber"


@query(
    "win_ranking",
    "§2.5 row_number / rank / dense_rank / ntile",
    f"""
    SELECT l_orderkey, l_linenumber,
           row_number() OVER (PARTITION BY l_returnflag {_ORD}) AS rn,
           rank()       OVER (PARTITION BY l_returnflag ORDER BY l_quantity DESC) AS rnk,
           dense_rank() OVER (PARTITION BY l_returnflag ORDER BY l_quantity DESC) AS drnk,
           ntile(4)     OVER (PARTITION BY l_returnflag {_ORD}) AS quartile
    FROM lineitem
    QUALIFY rn <= 500
    """,
)
def win_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Threshold-pruned form (optimization r14, guide §2.3/§2.4): the
    naive plan (4 window functions over the FULL table, then QUALIFY
    rn <= 500) sorts and window-scans every row in only
    num_distinct(l_returnflag) ≈ 3 tasks — at 100 TB that is billions
    of rows per task, a genuine scale-killer; at sf0.1 it was a 0.96 s
    single-task sort+window stage (the 4-column comparator never
    resolves on its 3-value prefix).

    Equivalent restructure, proven result-identical against the
    unchanged oracle (all SFs):

    1. ``cnt`` = count per (l_returnflag, l_quantity) — a ~150-row
       map-side-partial hash aggregate (quantity has ~50 distinct
       values), no sort of the table.
    2. From ``cnt``: per flag the partition size ``_n`` and the
       quantity threshold ``_t`` = the quantity of the 500th row in
       (qty DESC, key...) order — the minimum quantity whose
       preceding cumulative count is < 500. Keeping ``qty >= _t``
       keeps a SUPERSET of the top-500 (ties at the threshold
       included), so no survivor is lost.
    3. ``rn``/``rnk``/``drnk`` computed over the survivors equal
       their full-table values: any row ordered before a survivor
       (strictly higher quantity, or equal with smaller keys) has
       quantity >= the survivor's >= _t, hence is itself kept — the
       window functions only count such rows. The rn window still
       carries QUALIFY rn <= 500, so Spark's WindowGroupLimit bounds
       even an adversarial tie mass map-side.
    4. ``quartile`` (ntile(4) over the full partition) depends only
       on rn and _n: buckets 1..r get q+1 rows and the rest get q,
       where q = _n div 4, r = _n mod 4 — so quartile =
       ceil(rn/(q+1)) inside the fat buckets, else
       r + ceil((rn - r*(q+1))/q). Integer ceil via (a+b-1) div b
       stays exact at any _n (a double division loses precision past
       2^53).

    Scale shape: one O(n) pass for the 150-row aggregate, one O(n)
    broadcast-join filter pass, then windows over ~(500 + tie mass)
    rows per flag instead of the whole table. Plan evidence:
    plans/r14/win_ranking_{before,after}.txt (full-table
    Sort+2×Window on a coalesced single task → tiny windows behind a
    selective filter).

    Shipped as ONE sql() text rather than a ~40-call DataFrame chain:
    plan construction happens JVM-side in a single py4j round-trip,
    cutting the per-invocation driver cost ~230 ms at identical plan
    semantics (guide §7.3 — planning is real driver work; the bench
    and every production caller pays it per submission)."""
    from spark_lineage_spark.tables import table_path

    return spark.sql(f"""
        WITH li AS (SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
                    FROM parquet.`{table_path(sf_dir, "lineitem")}`),
        cnt AS (SELECT l_returnflag, l_quantity, count(*) AS _c FROM li GROUP BY 1, 2),
        thr AS (SELECT /*+ BROADCAST */ l_returnflag,
                       min(CASE WHEN _cum - _c < 500 THEN l_quantity END) AS _t,
                       sum(_c) AS _n
                FROM (SELECT l_returnflag, l_quantity, _c,
                             sum(_c) OVER (PARTITION BY l_returnflag
                                           ORDER BY l_quantity DESC
                                           ROWS BETWEEN UNBOUNDED PRECEDING
                                           AND CURRENT ROW) AS _cum
                      FROM cnt)
                GROUP BY l_returnflag),
        top AS (SELECT * FROM (
                  SELECT li.l_orderkey, li.l_linenumber, li.l_quantity,
                         li.l_returnflag, _n,
                         row_number() OVER (PARTITION BY li.l_returnflag
                                            ORDER BY l_quantity DESC,
                                                     l_orderkey, l_linenumber) AS rn
                  FROM li JOIN thr ON li.l_returnflag = thr.l_returnflag
                                  AND li.l_quantity >= thr._t)
                WHERE rn <= 500)
        SELECT l_orderkey, l_linenumber, rn,
               rank()       OVER (PARTITION BY l_returnflag
                                  ORDER BY l_quantity DESC) AS rnk,
               dense_rank() OVER (PARTITION BY l_returnflag
                                  ORDER BY l_quantity DESC) AS drnk,
               CAST(CASE WHEN rn <= (_n % 4) * ((_n DIV 4) + 1)
                         THEN (rn + (_n DIV 4)) DIV ((_n DIV 4) + 1)
                         ELSE (_n % 4) + (rn - (_n % 4) * ((_n DIV 4) + 1)
                                          + (_n DIV 4) - 1) DIV (_n DIV 4)
                    END AS INT) AS quartile
        FROM top
    """)


@query(
    "win_lag_lead",
    "§2.5 lag / lead with defaults",
    """
    SELECT o_custkey, o_orderkey,
           lag(o_orderkey)      OVER w AS prev_order,
           lead(o_orderkey)     OVER w AS next_order,
           lag(o_orderkey, 2, -1) OVER w AS prev2_or_neg1
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.lag("o_orderkey").over(w).alias("prev_order"),
        F.lead("o_orderkey").over(w).alias("next_order"),
        F.lag("o_orderkey", 2, -1).over(w).alias("prev2_or_neg1"),
    )


@query(
    "win_value_picks",
    "§2.5 first_value / last_value / nth_value over full frame",
    """
    SELECT o_custkey, o_orderkey,
           first_value(o_orderkey) OVER w AS first_ok,
           last_value(o_orderkey)  OVER w AS last_ok,
           nth_value(o_orderkey, 2) OVER w AS second_ok
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def win_value_picks(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.first("o_orderkey").over(w).alias("first_ok"),
        F.last("o_orderkey").over(w).alias("last_ok"),
        F.nth_value("o_orderkey", 2).over(w).alias("second_ok"),
    )


@query(
    "win_percent_cume",
    "§2.5 percent_rank / cume_dist",
    """
    SELECT s_suppkey,
           round(percent_rank() OVER (ORDER BY s_acctbal, s_suppkey), 8) AS pr,
           round(cume_dist()    OVER (ORDER BY s_acctbal, s_suppkey), 8) AS cd
    FROM supplier
    """,
)
def win_percent_cume(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load(spark, sf_dir, "supplier")
    w = Window.orderBy("s_acctbal", "s_suppkey")
    return s.select(
        "s_suppkey",
        F.round(F.percent_rank().over(w), 8).alias("pr"),
        F.round(F.cume_dist().over(w), 8).alias("cd"),
    )


@query(
    "win_running_moving",
    "§2.5 running sum + moving average (row frames)",
    """
    SELECT o_custkey, o_orderkey,
           round(sum(o_totalprice) OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total,
           round(avg(o_totalprice) OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS moving_avg3
    FROM orders
    """,
)
def win_running_moving(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    base = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(
            F.sum("o_totalprice").over(base.rowsBetween(Window.unboundedPreceding, 0)), 2
        ).alias("running_total"),
        F.round(F.avg("o_totalprice").over(base.rowsBetween(-2, 0)), 4).alias("moving_avg3"),
    )


@query(
    "win_range_frame",
    "§2.5 RANGE frame on a numeric key",
    """
    SELECT s_suppkey,
           count(*) OVER (ORDER BY s_acctbal
                 RANGE BETWEEN 100.0 PRECEDING AND CURRENT ROW) AS n_within_100
    FROM supplier
    """,
)
def win_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Float RANGE bounds aren't accepted by the PySpark Window API
    (ints only) — the SQL entry point supports them; same plan."""
    from spark_lineage_spark.tables import register_views

    register_views(spark, sf_dir, ["supplier"])
    return spark.sql(
        """
        SELECT s_suppkey,
               count(*) OVER (ORDER BY s_acctbal
                     RANGE BETWEEN 100.0 PRECEDING AND CURRENT ROW) AS n_within_100
        FROM supplier
        """
    )


@query(
    "win_topk_per_group",
    "§2.5 top-k per group (row_number + filter)",
    """
    SELECT c_nationkey, c_custkey, round(c_acctbal, 2) AS bal
    FROM customer
    QUALIFY row_number() OVER (PARTITION BY c_nationkey
                               ORDER BY c_acctbal DESC, c_custkey) <= 3
    """,
)
def win_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"), "c_custkey")
    return (
        c.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("c_nationkey", "c_custkey", F.round("c_acctbal", 2).alias("bal"))
    )


@query(
    "win_ignore_nulls",
    "§2.5 IGNORE NULLS analytics (forward-fill, last non-null, nth non-null)",
    """
    SELECT event_id, user_id,
           round(last_value(click_v IGNORE NULLS) OVER w, 2)   AS ffill_click,
           round(lag(click_v, 1 IGNORE NULLS) OVER w, 2)       AS prev_click,
           round(nth_value(click_v, 2 IGNORE NULLS) OVER w, 2) AS second_click
    FROM (SELECT event_id, user_id, ts,
                 CASE WHEN event_type = 'click' THEN value END AS click_v
          FROM events)
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def win_ignore_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IGNORE NULLS is the window-native way to forward-fill a sparse
    measure (here: the last click value carried across non-click
    events). One shuffle on user_id, one sort, three analytics off the
    same frame — the alternative (self-join to the previous non-null
    row) is a second shuffle plus a range join. Spark exposes
    ignorenulls through last/nth_value kwargs; lag needs the SQL
    clause, so it goes through expr() — same plan either way
    (WindowExec with ignoreNulls=true)."""
    ev = load(spark, sf_dir, "events").withColumn(
        "click_v", F.when(F.col("event_type") == "click", F.col("value"))
    )
    w_lag = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w = w_lag.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.last("click_v", ignorenulls=True).over(w), 2).alias("ffill_click"),
        F.round(F.expr("lag(click_v, 1) IGNORE NULLS").over(w_lag), 2).alias("prev_click"),
        F.round(F.nth_value("click_v", 2, ignoreNulls=True).over(w), 2).alias("second_click"),
    )


@query(
    "win_range_interval_time",
    "§2.5 RANGE frame over event time (trailing 1-hour per-user window)",
    """
    SELECT user_id, event_id,
           strftime(date_trunc('microseconds', ts), '%Y-%m-%d %H:%M:%S.%f') AS tss,
           CAST(count(*) OVER w AS BIGINT) AS n_trailing_1h,
           CAST(sum(CAST(round(value * 1000000) AS BIGINT)) OVER w AS BIGINT)
             AS sum_micro_1h
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY date_trunc('microseconds', ts)
                 RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
    """,
)
def win_range_interval_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame keyed by an INTERVAL over event TIME — the
    per-event trailing window ("this user's activity in the hour up to
    now") that ROW frames cannot express when events are irregularly
    spaced, and the per-event twin of the bucketed sliding windows in
    streaming. win_range_frame covers numeric RANGE; this pins the
    temporal-interval variant, including the peers rule (equal
    timestamps aggregate together regardless of tie order — which is
    exactly why RANGE, not ROWS, is the deterministic choice here).
    One shuffle on user_id; values sum as exact micro-unit integers."""
    from spark_lineage_spark.tables import register_views

    isots = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    register_views(spark, sf_dir, ["events"])
    out = spark.sql(
        """
        SELECT user_id, event_id, ts,
               count(*) OVER w AS n_trailing_1h,
               sum(CAST(round(value * 1000000) AS BIGINT)) OVER w AS sum_micro_1h
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts
                     RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
        """
    )
    return out.select(
        "user_id",
        "event_id",
        F.date_format("ts", isots).alias("tss"),
        "n_trailing_1h",
        "sum_micro_1h",
    )


@query(
    "sql_named_window_clause",
    "§2.5 named WINDOW clause (one spec shared by many functions)",
    """
    SELECT o_custkey, o_orderkey,
           row_number() OVER w AS rn,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) OVER w AS BIGINT)
             AS run_cents,
           lag(o_orderkey) OVER w AS prev_order
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def sql_named_window_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL ``WINDOW w AS (...)`` clause: one named spec shared by
    every OVER — the maintainable form of multi-function analytics
    (changing the partition key is a one-line edit, and the planner
    provably evaluates ONE Window operator because all functions share
    the identical spec — no accidental second sort from a typo'd
    inline spec). Semantics pinned against DuckDB's identical clause."""
    from spark_lineage_spark.tables import register_views

    register_views(spark, sf_dir, ["orders"])
    return spark.sql(
        """
        SELECT o_custkey, o_orderkey,
               row_number() OVER w AS rn,
               sum(CAST(round(o_totalprice * 100) AS BIGINT)) OVER w AS run_cents,
               lag(o_orderkey) OVER w AS prev_order
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        """
    )
