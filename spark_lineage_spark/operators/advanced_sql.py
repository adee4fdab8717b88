"""Advanced SQL surface: subqueries, batch sessionization, time-spine
gap fill, latest-wins merge, column profiling, salted skew join.

These extend SURVEY.md §2 with the composed shapes a production user
writes daily on top of the primitive operators (reconstructed surface,
SURVEY §0; the reference library observes arbitrary Spark SQL, so the
lineage extractor must survive all of these plan shapes too).

Scale notes (100 TB):
- Correlated subqueries decorrelate in Catalyst
  (``RewriteCorrelatedScalarSubquery``, SURVEY §4 table) into joins —
  same physical plan as the hand-written aggregate+join, so there is no
  hidden per-row re-execution.
- Sessionization is one shuffle on user_id; the window functions then
  run within each partition. Skewed users are the risk — the gap logic
  is associative per user, so AQE skew-split cannot help (windows need
  the whole user in one partition); cap session length per user at
  ingest if a bot user can dominate a partition.
- The time spine is O(days), never O(rows): built from a 1-row
  min/max aggregate, exploded — broadcast side of the fill join.
- Latest-wins merge is the standard CDC compaction: one shuffle on the
  key, ``row_number`` per key, no driver involvement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from spark_lineage_spark.registry import query
from spark_lineage_spark.tables import load, register_views


_SUBQ_SCALAR_SQL = """
    SELECT o_orderstatus,
           count(*) AS n,
           round(sum(o_totalprice), 2) AS total
    FROM orders o
    WHERE o_totalprice > 1.1 * (
        SELECT avg(o2.o_totalprice) FROM orders o2
        WHERE o2.o_custkey = o.o_custkey
    )
    GROUP BY o_orderstatus
"""


@query(
    "subq_scalar_correlated",
    "§2.2/§2.3 correlated scalar subquery (Catalyst decorrelation)",
    _SUBQ_SCALAR_SQL,
    doc="Orders priced >1.1x their customer's own average.",
)
def subq_scalar_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Identical SQL text runs on Spark and DuckDB. Spark rewrites the
    correlated scalar subquery into an aggregate + join
    (RewriteCorrelatedScalarSubquery) — explain shows no per-row
    subquery execution, just a join on o_custkey.

    The 1.1x margin keeps the float comparison far from any ulp
    boundary (partial-aggregation order can perturb avg's last bit).
    """
    register_views(spark, sf_dir, ["orders"])
    return spark.sql(_SUBQ_SCALAR_SQL)


_SUBQ_EXISTS_SQL = """
    SELECT
      (SELECT count(*) FROM customer c
       WHERE EXISTS (SELECT 1 FROM orders o
                     WHERE o.o_custkey = c.c_custkey
                       AND o.o_totalprice > 300000.0)) AS n_exists,
      (SELECT count(*) FROM customer c
       WHERE NOT EXISTS (SELECT 1 FROM orders o
                         WHERE o.o_custkey = c.c_custkey
                           AND o.o_totalprice > 300000.0)) AS n_not_exists,
      (SELECT count(*) FROM customer c
       WHERE c.c_custkey NOT IN
         (SELECT o_custkey FROM orders
          WHERE o_totalprice > 300000.0)) AS n_not_in,
      (SELECT count(*) FROM customer c
       WHERE c.c_custkey NOT IN
         (SELECT CASE WHEN o_totalprice > 400000.0 THEN NULL
                      ELSE o_custkey END
          FROM orders WHERE o_totalprice > 300000.0)) AS n_not_in_nullable
"""


@query(
    "subq_exists_not_in",
    "§2.3 EXISTS / NOT EXISTS / NOT IN null semantics",
    _SUBQ_EXISTS_SQL,
    doc="NOT IN vs NOT EXISTS with a NULL-producing subquery.",
)
def subq_exists_not_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §2.3 warns NOT IN null-handling differs from anti-join:
    one NULL in the subquery result makes NOT IN select zero rows
    (three-valued logic), while NOT EXISTS is unaffected. Both engines
    implement ANSI semantics; the n_not_in_nullable column proves it.

    Spark plans EXISTS/NOT EXISTS as left-semi/anti joins and the
    nullable NOT IN as a null-aware anti join — all set-based, no
    per-row subquery at scale.
    """
    register_views(spark, sf_dir, ["orders", "customer"])
    return spark.sql(_SUBQ_EXISTS_SQL)


@query(
    "ts_sessionize_batch",
    "§2.5/§2.9 batch sessionization (gap > 30 min ⇒ new session)",
    """
    WITH e AS (
      SELECT user_id, event_id, date_trunc('microseconds', ts) AS tsu
      FROM events
    ), marked AS (
      SELECT user_id, event_id, tsu,
             CASE WHEN lag(tsu) OVER w IS NULL
                    OR tsu - lag(tsu) OVER w > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS is_new
      FROM e
      WINDOW w AS (PARTITION BY user_id ORDER BY tsu, event_id)
    ), sess AS (
      SELECT user_id, tsu,
             sum(is_new) OVER (PARTITION BY user_id ORDER BY tsu, event_id
                               ROWS UNBOUNDED PRECEDING) AS sess_id
      FROM marked
    ), per_session AS (
      SELECT user_id, sess_id, count(*) AS n_ev,
             date_diff('microsecond', min(tsu), max(tsu)) AS dur_us
      FROM sess GROUP BY user_id, sess_id
    )
    SELECT user_id, count(*) AS n_sessions,
           CAST(sum(n_ev) AS BIGINT) AS n_events,
           max(dur_us) AS max_session_us
    FROM per_session GROUP BY user_id
    """,
)
def ts_sessionize_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic lag+cumsum sessionization — the batch twin of
    streaming/queries.py's F.session_window query, over the full events
    history. One shuffle on user_id serves both window passes and the
    session aggregate (same partitioning, Exchange reuse).

    Gap comparison is exact integer microseconds in both engines — no
    float boundary. Ties at the same microsecond order by event_id.
    """
    ev = load(spark, sf_dir, "events").select("user_id", "event_id", "ts")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marked = ev.withColumn(
        "is_new",
        F.when(
            F.lag("ts").over(w).isNull()
            | (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w)) > 30 * 60 * 1_000_000),
            1,
        ).otherwise(0),
    )
    sess = marked.withColumn(
        "sess_id", F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    per_session = sess.groupBy("user_id", "sess_id").agg(
        F.count("*").alias("n_ev"),
        (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))).alias("dur_us"),
    )
    return per_session.groupBy("user_id").agg(
        F.count("*").alias("n_sessions"),
        F.sum("n_ev").alias("n_events"),
        F.max("dur_us").alias("max_session_us"),
    )


@query(
    "ts_gap_fill_spine",
    "§2.8 datetime: time-spine gap fill (sequence + explode + left join)",
    """
    WITH bounds AS (
      SELECT min(o_orderdate) AS lo, max(o_orderdate) AS hi FROM orders
    ), spine AS (
      SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS d FROM bounds
    ), daily AS (
      SELECT o_orderdate AS d, count(*) AS n,
             round(sum(o_totalprice), 2) AS total
      FROM orders GROUP BY o_orderdate
    )
    SELECT spine.d AS d, coalesce(daily.n, 0) AS n,
           coalesce(daily.total, 0.0) AS total
    FROM spine LEFT JOIN daily ON spine.d = daily.d
    """,
)
def ts_gap_fill_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense daily series with zero-filled gaps. The spine derives from
    a 1-row min/max aggregate exploded with F.sequence — O(days) rows
    regardless of input size, so it is always the broadcast side of the
    fill join and the big table is touched exactly once (for the
    pre-aggregated daily counts)."""
    o = load(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.count("*").alias("n"), F.round(F.sum("o_totalprice"), 2).alias("total")
    )
    spine = (
        o.agg(F.min("o_orderdate").alias("lo"), F.max("o_orderdate").alias("hi"))
        .select(
            F.explode(
                F.sequence(F.col("lo"), F.col("hi"), F.expr("INTERVAL 1 DAY"))
            ).alias("d")
        )
    )
    return (
        F.broadcast(spine)
        .join(daily, "d", "left")
        .select(
            "d",
            F.coalesce("n", F.lit(0)).alias("n"),
            F.coalesce("total", F.lit(0.0)).alias("total"),
        )
    )


@query(
    "merge_upsert_latest",
    "§2.2/§2.4 CDC latest-wins merge (upsert compaction)",
    """
    WITH updates AS (
      SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
             o_totalprice * 1.1 AS o_totalprice, 2 AS version
      FROM orders WHERE o_orderkey % 7 = 0
    ), base AS (
      SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, 1 AS version
      FROM orders
    ), merged AS (
      SELECT * FROM base UNION ALL SELECT * FROM updates
    ), latest AS (
      SELECT * FROM merged
      QUALIFY row_number() OVER (PARTITION BY o_orderkey
                                 ORDER BY version DESC) = 1
    )
    SELECT o_orderstatus, count(*) AS n, round(sum(o_totalprice), 2) AS total
    FROM latest GROUP BY o_orderstatus
    """,
)
def merge_upsert_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE-style upsert without a table format: union base + updates,
    keep the highest version per key via row_number. This is the
    standard CDC compaction plan shape — one shuffle on the merge key;
    at 100 TB, partition the base by key-bucket so only touched buckets
    rewrite (the Delta/Iceberg trick, expressible with bucketed writes
    from sources/writer.py)."""
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    base = o.withColumn("version", F.lit(1))
    updates = (
        o.filter(F.col("o_orderkey") % 7 == 0)
        .withColumn("o_orderstatus", F.lit("U"))
        # no per-row round: HALF_UP (Spark) vs half-even drift at cent
        # boundaries — round only the final aggregate
        .withColumn("o_totalprice", F.col("o_totalprice") * 1.1)
        .withColumn("version", F.lit(2))
    )
    merged = base.unionByName(updates)
    w = Window.partitionBy("o_orderkey").orderBy(F.col("version").desc())
    latest = merged.withColumn("rn", F.row_number().over(w)).filter("rn = 1")
    return latest.groupBy("o_orderstatus").agg(
        F.count("*").alias("n"), F.round(F.sum("o_totalprice"), 2).alias("total")
    )


@query(
    "profile_column_stats",
    "§2.4 data profiling: per-column null/distinct/min/max summary",
    """
    SELECT 'c_custkey' AS col_name, count(*) AS n_rows,
           count(*) - count(c_custkey) AS n_null,
           count(DISTINCT c_custkey) AS n_distinct,
           round(min(c_custkey), 4) AS min_num, round(max(c_custkey), 4) AS max_num,
           CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
    FROM customer
    UNION ALL
    SELECT 'c_acctbal', count(*), count(*) - count(c_acctbal),
           count(DISTINCT c_acctbal),
           round(min(c_acctbal), 4), round(max(c_acctbal), 4), NULL, NULL
    FROM customer
    UNION ALL
    SELECT 'c_mktsegment', count(*), count(*) - count(c_mktsegment),
           count(DISTINCT c_mktsegment), NULL, NULL,
           min(c_mktsegment), max(c_mktsegment)
    FROM customer
    UNION ALL
    SELECT 'c_name', count(*), count(*) - count(c_name),
           count(DISTINCT c_name), NULL, NULL, min(c_name), max(c_name)
    FROM customer
    """,
)
def profile_column_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality profiling: one summary row per column (nulls,
    distincts, min/max). Numeric and string extremes live in typed
    columns — casting doubles to strings would couple the check to each
    engine's float formatting.

    All four per-column aggregates scan customer once each but Spark
    collapses the count(*)/count(col) pairs into single partial aggs;
    at scale, compute all columns in ONE pass instead via a single
    struct-of-aggregates row and unpivot (the pattern in
    aggregates.py agg_unpivot_melt) — kept as four scans here so the
    oracle SQL stays the obvious UNION ALL form.
    """
    c = load(spark, sf_dir, "customer")

    def num(col: str) -> DataFrame:
        return c.agg(
            F.lit(col).alias("col_name"),
            F.count("*").alias("n_rows"),
            (F.count("*") - F.count(col)).alias("n_null"),
            F.countDistinct(col).alias("n_distinct"),
            F.round(F.min(col).cast("double"), 4).alias("min_num"),
            F.round(F.max(col).cast("double"), 4).alias("max_num"),
            F.lit(None).cast("string").alias("min_str"),
            F.lit(None).cast("string").alias("max_str"),
        )

    def txt(col: str) -> DataFrame:
        return c.agg(
            F.lit(col).alias("col_name"),
            F.count("*").alias("n_rows"),
            (F.count("*") - F.count(col)).alias("n_null"),
            F.countDistinct(col).alias("n_distinct"),
            F.lit(None).cast("double").alias("min_num"),
            F.lit(None).cast("double").alias("max_num"),
            F.min(col).alias("min_str"),
            F.max(col).alias("max_str"),
        )

    return num("c_custkey").unionByName(num("c_acctbal")).unionByName(
        txt("c_mktsegment")
    ).unionByName(txt("c_name"))


@query(
    "obs_observation_metrics",
    "§2.4/§2.12 Observation API: named metrics piggybacked on a real action",
    """
    SELECT count(*) AS n_rows,
           round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 2)
             AS sum_qty,
           strftime(min(CAST(l_shipdate AS DATE)), '%Y-%m-%d') AS min_ship,
           strftime(max(CAST(l_shipdate AS DATE)), '%Y-%m-%d') AS max_ship
    FROM lineitem
    """,
)
def obs_observation_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``pyspark.sql.Observation`` — the data-quality counters every
    production job attaches to its main pass: named aggregate metrics
    (count / decimal-exact sum / min / max; distinct aggs are
    disallowed by the API) are computed ON THE EXECUTORS while a real
    action runs, for free — no second scan, which at 100 TB is the
    difference between "we validate every batch" and "we validate
    weekly". Here the observed scan is materialized by one count()
    action and the harvested metrics come back as a 1-row DataFrame;
    the oracle recomputes the identical aggregates in SQL, so this is
    a full value-hash check of the observation path (sum over a
    decimal cast => partial-aggregation order cannot change a bit).
    Lineage note: observe() is plan-transparent — the lineage walk
    sees the underlying scan unchanged."""
    import uuid as _uuid

    from pyspark.sql import Observation

    obs = Observation(f"sls_obs_{_uuid.uuid4().hex[:8]}")
    li = load(spark, sf_dir, "lineitem").observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.round(
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double"), 2
        ).alias("sum_qty"),
        F.min(F.col("l_shipdate").cast("date")).alias("min_ship"),
        F.max(F.col("l_shipdate").cast("date")).alias("max_ship"),
    )
    li.count()  # the "real work" action the metrics piggyback on
    m = obs.get
    # dates travel as ISO strings: Spark DateType -> pandas object vs
    # DuckDB DATE -> datetime64 would dtype-mismatch in the compare
    return spark.createDataFrame(
        [
            (
                m["n_rows"],
                m["sum_qty"],
                m["min_ship"].isoformat(),
                m["max_ship"].isoformat(),
            )
        ],
        "n_rows long, sum_qty double, min_ship string, max_ship string",
    )


@query(
    "profile_join_skew",
    "§2.4/§4 join-key skew diagnostics (per-key histogram stats + heaviest key)",
    """
    WITH lk AS (SELECT l_orderkey AS k, count(*) AS n FROM lineitem GROUP BY 1),
    ek AS (SELECT user_id AS k, count(*) AS n FROM events GROUP BY 1),
    lstats AS (
      SELECT 'lineitem.l_orderkey' AS rel, count(*) AS n_keys,
             max(n) AS max_rows_per_key,
             round(sum(n) * 1.0 / count(*), 4) AS avg_rows_per_key,
             round(max(n) * count(*) * 1.0 / sum(n), 4) AS skew_ratio
      FROM lk
    ),
    lheavy AS (SELECT min(k) AS heaviest_key FROM lk
               WHERE n = (SELECT max(n) FROM lk)),
    estats AS (
      SELECT 'events.user_id' AS rel, count(*) AS n_keys,
             max(n) AS max_rows_per_key,
             round(sum(n) * 1.0 / count(*), 4) AS avg_rows_per_key,
             round(max(n) * count(*) * 1.0 / sum(n), 4) AS skew_ratio
      FROM ek
    ),
    eheavy AS (SELECT min(k) AS heaviest_key FROM ek
               WHERE n = (SELECT max(n) FROM ek))
    SELECT rel, n_keys, max_rows_per_key, avg_rows_per_key, skew_ratio,
           heaviest_key
    FROM lstats CROSS JOIN lheavy
    UNION ALL
    SELECT rel, n_keys, max_rows_per_key, avg_rows_per_key, skew_ratio,
           heaviest_key
    FROM estats CROSS JOIN eheavy
    """,
)
def profile_join_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pre-flight check behind every salting/AQE-skew decision
    (join_skew_salted, join_aqe_skew_handled): per-join-key row
    histograms reduced to the numbers that pick a strategy — key
    count, max and mean rows per key, their ratio (1.0 = uniform;
    large = a hot key that will straggle a shuffle join), and the
    heaviest key itself (min key on ties). One hash agg per fact
    produces the per-key counts (map-side partials, the only
    fact-sized work); the stats are second aggregates over the counts
    table and the heaviest key is a broadcast-scalar filter — nothing
    ever collects. skew_ratio is computed as max*n_keys/sum in exact
    integers before ONE double division, so both engines round the
    same value."""
    out = []
    for rel, df, key in [
        ("lineitem.l_orderkey", load(spark, sf_dir, "lineitem"), "l_orderkey"),
        ("events.user_id", load(spark, sf_dir, "events"), "user_id"),
    ]:
        counts = df.groupBy(F.col(key).alias("k")).agg(F.count(F.lit(1)).alias("n"))
        stats = counts.agg(
            F.lit(rel).alias("rel"),
            F.count(F.lit(1)).alias("n_keys"),
            F.max("n").alias("max_rows_per_key"),
            F.round(F.sum("n") / F.count(F.lit(1)), 4).alias("avg_rows_per_key"),
            F.round(F.max("n") * F.count(F.lit(1)) / F.sum("n"), 4).alias("skew_ratio"),
        )
        # min over (-n, k) structs = largest n, smallest key on ties —
        # one aggregate, no second pass over the counts table
        heavy = counts.agg(
            F.min_by("k", F.struct((-F.col("n")).alias("neg_n"), F.col("k"))).alias(
                "heaviest_key"
            )
        )
        out.append(stats.crossJoin(F.broadcast(heavy)))
    return out[0].unionByName(out[1])


@query(
    "dq_forget_user_sweep",
    "§2.4/§2.12 right-to-be-forgotten sweep (cascaded purge-impact across tables)",
    """
    WITH forget AS (SELECT c_custkey AS uid FROM customer WHERE c_custkey % 97 = 0),
    purged_orders AS (
      SELECT o_orderkey FROM orders WHERE o_custkey IN (SELECT uid FROM forget)
    )
    SELECT 'customer' AS rel,
           count(CASE WHEN c_custkey IN (SELECT uid FROM forget) THEN 1 END)
             AS rows_purged,
           count(CASE WHEN c_custkey NOT IN (SELECT uid FROM forget) THEN 1 END)
             AS rows_kept
    FROM customer
    UNION ALL
    SELECT 'orders',
           count(CASE WHEN o_custkey IN (SELECT uid FROM forget) THEN 1 END),
           count(CASE WHEN o_custkey NOT IN (SELECT uid FROM forget) THEN 1 END)
    FROM orders
    UNION ALL
    SELECT 'lineitem',
           count(CASE WHEN l_orderkey IN (SELECT o_orderkey FROM purged_orders)
                 THEN 1 END),
           count(CASE WHEN l_orderkey NOT IN (SELECT o_orderkey FROM purged_orders)
                 THEN 1 END)
    FROM lineitem
    UNION ALL
    SELECT 'events',
           count(CASE WHEN user_id IN (SELECT uid FROM forget) THEN 1 END),
           count(CASE WHEN user_id NOT IN (SELECT uid FROM forget) THEN 1 END)
    FROM events
    """,
)
def dq_forget_user_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The governance op a training-data platform runs on every
    deletion request (right to be forgotten): given a deletion list
    (stand-in: customers with c_custkey % 97 = 0), report the purge
    impact per table BEFORE executing it — direct hits on customer /
    orders / events, and the CASCADE through lineitem (rows whose
    parent order is purged — one-hop FK propagation, the shape lineage
    metadata drives at §2.12). Each fact is scanned ONCE: the deletion
    list (and the purged-order key list it induces) is broadcast into
    a left-semi-flagged conditional aggregate — no fact shuffle at
    all, which is the only acceptable cost for a sweep that runs per
    deletion batch at 100 TB. Purge execution itself would be the
    same joins as anti-join writes (merge_upsert_latest's machinery).
    """
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    lineitem = load(spark, sf_dir, "lineitem")
    events = load(spark, sf_dir, "events")
    forget = customer.filter(F.col("c_custkey") % 97 == 0).select(
        F.col("c_custkey").alias("uid")
    )
    purged_orders = orders.join(
        F.broadcast(forget), orders.o_custkey == F.col("uid"), "left_semi"
    ).select("o_orderkey")

    def sweep(rel: str, df: DataFrame, key: str, ids: DataFrame, id_col: str) -> DataFrame:
        flagged = df.select(key).join(
            F.broadcast(ids.withColumn("_hit", F.lit(1))),
            F.col(key) == F.col(id_col),
            "left",
        )
        return flagged.agg(
            F.lit(rel).alias("rel"),
            F.count(F.col("_hit")).alias("rows_purged"),
            (F.count(F.lit(1)) - F.count(F.col("_hit"))).alias("rows_kept"),
        )

    return (
        sweep("customer", customer, "c_custkey", forget, "uid")
        .unionByName(sweep("orders", orders, "o_custkey", forget, "uid"))
        .unionByName(
            sweep("lineitem", lineitem, "l_orderkey", purged_orders, "o_orderkey")
        )
        .unionByName(sweep("events", events, "user_id", forget, "uid"))
    )


@query(
    "join_skew_salted",
    "§2.3/§2.11 salted skew join (replicated dim, salted fact)",
    """
    SELECT event_type, count(*) AS n,
           round(sum(value * length(event_type)), 2) AS weighted
    FROM events GROUP BY event_type
    """,
)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe join: the fact side salts each row into one of 8
    sub-keys (pmod(xxhash64(event_id), 8)); the dim side replicates 8x
    with an exploded salt column; the join key becomes (event_type,
    salt) so one hot event_type spreads over 8 tasks instead of one.

    The dim here (5 distinct event types, weight = length) would
    normally broadcast — SHUFFLE_HASH is hinted to force the shuffle
    path this pattern exists for (dim too big to broadcast + skewed
    fact keys; AQE skew-split only helps sort-merge joins, and not the
    downstream aggregation). The oracle is the unsalted equivalent:
    salting must never change results.
    """
    ev = load(spark, sf_dir, "events").select("event_id", "event_type", "value")
    n_salt = 8
    dim = (
        ev.select("event_type")
        .distinct()
        .withColumn("weight", F.length("event_type"))
        .withColumn("salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1))))
    )
    fact = ev.withColumn("salt", F.pmod(F.xxhash64("event_id"), F.lit(n_salt)))
    joined = fact.join(dim.hint("SHUFFLE_HASH"), ["event_type", "salt"])
    return joined.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.round(F.sum(F.col("value") * F.col("weight")), 2).alias("weighted"),
    )


@query(
    "ts_resample_ohlc",
    "§2.11/§5.2 time-series resample to hourly OHLC bars",
    """
    SELECT event_type,
           date_trunc('hour', ts) AS bucket,
           round(arg_min(value, ts), 6) AS open,
           round(max(value), 6) AS high,
           round(min(value), 6) AS low,
           round(arg_max(value, ts), 6) AS close,
           count(*) AS n_events,
           round(CAST(sum(CAST(round(value * 1000000) AS BIGINT)) AS DOUBLE)
                 / count(*) / 1000000, 6) AS mean_value
    FROM events GROUP BY event_type, date_trunc('hour', ts)
    """,
)
def ts_resample_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Downsampling a tick stream to hourly OHLC bars: the classic
    time-series rollup, expressed as ONE hash aggregation on
    (event_type, hour) — min_by/max_by give open/close without a sort
    or a window, so partial aggregation (map-side combine) applies and
    the shuffle carries one row per (type, hour) regardless of tick
    volume. That is the 100 TB shape: no per-key ordering, no window
    state.

    Determinism: the fixture has no two events of the same type in the
    same microsecond (asserted in tests), so min_by(value, ts) is
    unambiguous in both engines; both engines hold ts at µs precision
    here. With tie-prone data you'd min_by on a (ts, event_id) struct —
    DuckDB's arg_min can't take a composite key, hence the documented
    fixture invariant (same discipline as stream_dedup_watermark).
    mean_value sums exact micro-unit bigints and divides once
    (round-12: the plain avg(value) double accumulation landed on a
    round-6 boundary at sf0.1 — the 10x oracle sweep finding); OHLC
    extremes are single picked values, no accumulation to harden."""
    e = load(spark, sf_dir, "events")
    return e.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("bucket")
    ).agg(
        F.round(F.min_by("value", "ts"), 6).alias("open"),
        F.round(F.max("value"), 6).alias("high"),
        F.round(F.min("value"), 6).alias("low"),
        F.round(F.max_by("value", "ts"), 6).alias("close"),
        F.count("*").alias("n_events"),
        F.round(
            F.sum(F.round(F.col("value") * 1000000).cast("bigint")).cast("double")
            / F.count("*")
            / 1000000,
            6,
        ).alias("mean_value"),
    )


@query(
    "ts_hierarchical_rollup",
    "§2.4/§5.2 hypertable-style time-hierarchy rollup (day→month→total)",
    """
    SELECT CAST(year(ts) AS INTEGER) AS y,
           CAST(month(ts) AS INTEGER) AS m,
           CAST(day(ts) AS INTEGER) AS d,
           count(*) AS n, round(sum(value), 2) AS total
    FROM events
    GROUP BY ROLLUP (y, m, d)
    """,
)
def ts_hierarchical_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hypertable continuous-aggregate shape: one pass over the
    tick stream producing day, month, year, and grand-total rollups
    via GROUP BY ROLLUP on the extracted calendar hierarchy. Spark
    plans this as a single Expand + hash aggregate — partial
    aggregation applies, so the shuffle carries one row per (level,
    bucket), not per event; at 100 TB this replaces three separate
    aggregation jobs and the scan is shared."""
    e = load(spark, sf_dir, "events")
    return (
        e.select(
            F.year("ts").alias("y"),
            F.month("ts").alias("m"),
            F.dayofmonth("ts").alias("d"),
            "value",
        )
        .rollup("y", "m", "d")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total"))
    )


@query(
    "win_funnel_ordered",
    "§2.5/§5.2 ordered funnel analysis (view→click→purchase per user)",
    """
    WITH f AS (
      SELECT user_id,
             min(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
             min(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
             min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
      FROM events GROUP BY user_id
    )
    SELECT
      count(*) AS n_users,
      count(t_view) AS n_view,
      count(CASE WHEN t_click > t_view THEN 1 END) AS n_view_click,
      count(CASE WHEN t_purchase > t_click AND t_click > t_view THEN 1 END)
        AS n_full_funnel
    FROM f
    """,
)
def win_funnel_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel: users whose FIRST view precedes their first
    click precedes their first purchase. One conditional-min hash
    aggregation per user (partial agg applies — the shuffle carries
    three timestamps per user, not the event stream), then a 1-row
    rollup; NULL comparisons drop non-completers in both engines.
    This is the product-analytics shape that at 100 TB replaces three
    self-joins with one grouped pass."""
    e = load(spark, sf_dir, "events")
    f = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("t_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("t_purchase"),
    )
    return f.agg(
        F.count("*").alias("n_users"),
        F.count("t_view").alias("n_view"),
        F.count(F.when(F.col("t_click") > F.col("t_view"), 1)).alias("n_view_click"),
        F.count(
            F.when(
                (F.col("t_purchase") > F.col("t_click"))
                & (F.col("t_click") > F.col("t_view")),
                1,
            )
        ).alias("n_full_funnel"),
    )


_RECURSIVE_CTE_SQL = """
WITH RECURSIVE chain AS (
  SELECT s_suppkey, CAST(0 AS BIGINT) AS depth,
         round(s_acctbal, 2) AS path_bal
  FROM supplier WHERE s_suppkey = 0
  UNION ALL
  SELECT s.s_suppkey, c.depth + 1,
         round(c.path_bal + s.s_acctbal, 2) AS path_bal
  FROM supplier s JOIN chain c
    ON CAST(floor((s.s_suppkey - 1) / 2.0) AS BIGINT) = c.s_suppkey
  WHERE s.s_suppkey > 0 AND s.s_suppkey < 127
)
SELECT depth, count(*) AS n_nodes,
       CAST(round(sum(CAST(path_bal AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_path_bal
FROM chain GROUP BY depth
"""


@query(
    "subq_recursive_cte",
    "§2 advanced SQL: WITH RECURSIVE hierarchy walk (Spark 4 recursive CTE)",
    _RECURSIVE_CTE_SQL,
)
def subq_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (new in Spark 4): walk a hierarchy encoded over
    the supplier table (node k's parent is floor((k-1)/2) — a
    deterministic org-tree stand-in), accumulating root-to-node
    balance along the path. Each recursion step is one join of the
    last iteration's frontier against the base table — the engine
    iterates to fixpoint exactly like DuckDB, so the oracle is the
    IDENTICAL SQL text. Path sums are rounded per step (a path is a
    sequential chain, so no summation-order nondeterminism there); the
    per-depth TOTAL sums many paths, so it accumulates in
    DECIMAL(18,4) — a double sum's order is partition-dependent and
    can flip the rounded cent (the q9 failure mode, ADVICE r4).

    The child linkage is written as an EQUI condition on the derived
    parent key (floor((k-1)/2) = parent), not `k = 2p+1 OR k = 2p+2` —
    the OR form plans a nested-loop per iteration. The subtree is
    capped at 127 nodes so recursion depth (= Spark job count — the
    dominating cost, ~0.5s/iteration at any data size) stays fixed
    across SFs: this query audits the RECURSION machinery; frontier
    THROUGHPUT at scale is governed by the same per-step join/shuffle
    properties the batch operators already audit.

    At scale: recursion depth bounds the iteration count (log n for a
    balanced hierarchy); each step shuffles only the FRONTIER, not the
    closure so far — the same pattern as llm_dedup_clusters'
    hand-rolled min-label fixpoint, now expressible in one SQL string.
    """
    register_views(spark, sf_dir, ["supplier"])
    return spark.sql(_RECURSIVE_CTE_SQL)


_COHORT_RETENTION_SQL = """
WITH firsts AS (
  SELECT user_id, min(date_trunc('week', date_trunc('microseconds', ts))) AS cohort
  FROM events GROUP BY user_id),
activity AS (
  SELECT DISTINCT user_id, date_trunc('week', date_trunc('microseconds', ts)) AS wk
  FROM events)
SELECT cohort,
       CAST(datediff('day', cohort, wk) / 7 AS BIGINT) AS week_offset,
       count(*) AS active_users
FROM activity JOIN firsts USING (user_id)
GROUP BY cohort, week_offset
"""


@query(
    "ts_cohort_retention",
    "§5.2 composed: weekly cohort retention matrix (first-touch + activity join)",
    _COHORT_RETENTION_SQL,
)
def ts_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The product-analytics staple: bucket each user by first-seen
    week (cohort), then count distinct users active in each subsequent
    week — the (cohort × week_offset) retention matrix. The first-touch
    week is a window MIN over the deduplicated activity set rather
    than a separate aggregate joined back: three narrow shuffles
    (distinct, per-user window, matrix agg) and NO join in the plan.
    Week arithmetic is done on week-truncated timestamps (both engines
    truncate to ISO Monday) so day-diff / 7 is exact integer weeks."""
    ev = load(spark, sf_dir, "events").select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("wk")
    )
    activity = ev.distinct()
    w = Window.partitionBy("user_id")
    ret = activity.withColumn("cohort", F.min("wk").over(w))
    return ret.groupBy(
        "cohort",
        (F.datediff(F.col("wk"), F.col("cohort")) / 7).cast("bigint").alias("week_offset"),
    ).agg(F.count("*").alias("active_users"))


_CONCURRENCY_SQL = """
WITH pts AS (
  SELECT date_trunc('microseconds', ts) AS t, 1 AS delta FROM events
  UNION ALL
  SELECT date_trunc('microseconds', ts) + INTERVAL '30 minutes' AS t, -1 AS delta
  FROM events
),
run AS (
  SELECT t, sum(delta) OVER (ORDER BY t, delta ROWS UNBOUNDED PRECEDING) AS concurrency
  FROM pts
)
SELECT date_trunc('hour', t) AS hour,
       CAST(max(concurrency) AS BIGINT) AS peak_concurrency
FROM run GROUP BY 1
"""


@query(
    "ts_concurrency_sweep",
    "§5.2 composed: sweep-line peak concurrency (distributed prefix sum)",
    _CONCURRENCY_SQL,
)
def ts_concurrency_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval analytics: each event opens a half-open [ts, ts+30min)
    presence window; the sweep line (+1 at start, -1 at end, ends
    before starts on ties via the delta sort key) yields instantaneous
    concurrency, reported as per-hour peaks.

    The running sum is the textbook anti-scale trap — a global-order
    window is ONE partition holding the whole corpus. Here it is a
    two-phase distributed prefix sum instead: (1) per-DAY partitioned
    running sums (parallel, bounded partitions), (2) a tiny day-total
    cumsum — thousands of rows at any scale — broadcast back as
    per-day offsets. Same result, no single-partition stage; this is
    how prefix-dependent analytics (inventory levels, account
    balances, concurrency) stay distributed at 100 TB.
    """
    ev = load(spark, sf_dir, "events").select("ts")
    pts = (
        ev.select(F.col("ts").alias("t"), F.lit(1).alias("delta"))
        .unionAll(
            ev.select(
                (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("t"),
                F.lit(-1).alias("delta"),
            )
        )
        .withColumn("day", F.date_trunc("day", F.col("t")))
    )
    w_local = (
        Window.partitionBy("day").orderBy("t", "delta").rowsBetween(Window.unboundedPreceding, 0)
    )
    local = pts.withColumn("local_sum", F.sum("delta").over(w_local))
    day_totals = pts.groupBy("day").agg(F.sum("delta").alias("day_total"))
    # day-level cumsum: one partition of O(days) rows — fine forever
    w_days = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, -1)
    offsets = day_totals.withColumn(
        "offset", F.coalesce(F.sum("day_total").over(w_days), F.lit(0))
    ).select("day", "offset")
    conc = local.join(F.broadcast(offsets), "day").withColumn(
        "concurrency", F.col("local_sum") + F.col("offset")
    )
    return conc.groupBy(F.date_trunc("hour", F.col("t")).alias("hour")).agg(
        F.max("concurrency").cast("bigint").alias("peak_concurrency")
    )


_DQ_RULES_SQL = """
SELECT
  (SELECT count(*) FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
   WHERE o.o_orderkey IS NULL) AS fk_orphans,
  (SELECT count(*) FROM lineitem
   WHERE l_extendedprice <= 0 OR l_quantity <= 0) AS nonpositive_amounts,
  (SELECT count(*) FROM lineitem
   WHERE l_discount < 0 OR l_discount > 0.5) AS discount_out_of_range,
  (SELECT count(*) FROM orders
   WHERE o_orderdate < TIMESTAMP '1990-01-01'
      OR o_orderdate > TIMESTAMP '2030-01-01') AS date_out_of_bounds,
  (SELECT count(*) FROM customer
   WHERE c_name IS NULL OR c_name = '') AS blank_names
"""


@query(
    "dq_rule_checks",
    "§5.2 composed: data-quality rule sweep (FK orphans + domain rules)",
    _DQ_RULES_SQL,
)
def dq_rule_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The validation gate every ingest pipeline runs before promoting
    a batch: referential integrity (lineitem rows whose order vanished
    — left-anti count), domain rules (non-positive amounts, discounts
    outside [0, 0.5], dates outside sane bounds), and blank keys.
    Each table is scanned ONCE with its rules fused into a single
    conditional aggregate; the orphan check is the only join (anti,
    shuffled on the key). The five 1-row metric frames combine by
    broadcast crossJoin into one row — at 100 TB this whole gate is
    three scans and one anti join, no matter how many rules ride each
    scan."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    orphans = (
        li.select("l_orderkey")
        .join(o.select("o_orderkey"), li.l_orderkey == o.o_orderkey, "left_anti")
        .agg(F.count("*").alias("fk_orphans"))
    )
    li_rules = li.agg(
        F.count(
            F.when((F.col("l_extendedprice") <= 0) | (F.col("l_quantity") <= 0), 1)
        ).alias("nonpositive_amounts"),
        F.count(
            F.when((F.col("l_discount") < 0) | (F.col("l_discount") > 0.5), 1)
        ).alias("discount_out_of_range"),
    )
    o_rules = o.agg(
        F.count(
            F.when(
                (F.col("o_orderdate") < "1990-01-01") | (F.col("o_orderdate") > "2030-01-01"),
                1,
            )
        ).alias("date_out_of_bounds")
    )
    c_rules = c.agg(
        F.count(F.when(F.col("c_name").isNull() | (F.col("c_name") == ""), 1)).alias(
            "blank_names"
        )
    )
    return (
        orphans.crossJoin(F.broadcast(li_rules))
        .crossJoin(F.broadcast(o_rules))
        .crossJoin(F.broadcast(c_rules))
    )


_SQL_SCRIPTING_SQL = """
SELECT o_orderpriority, count(*) AS n_above
FROM orders
WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
GROUP BY o_orderpriority
"""


@query(
    "sql_scripting_control_flow",
    "§2 advanced SQL: SQL scripting (BEGIN/DECLARE/SET procedural block, Spark 4)",
    _SQL_SCRIPTING_SQL,
)
def sql_scripting_control_flow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 SQL scripting: a BEGIN…END block with a DECLAREd
    variable bound from a scalar query, then used as a parameter in
    the final statement — the migration path for stored-procedure
    workloads. The script's final SELECT is the block's result set;
    semantically it equals the inlined scalar subquery the oracle
    runs. (Each SET is its own job — at scale, favor variables for
    control flow and leave data-dependent scalars inline where
    Catalyst can plan them together.)"""
    register_views(spark, sf_dir, ["orders"])
    return spark.sql(
        """
        BEGIN
          DECLARE avg_price DOUBLE DEFAULT 0;
          SET avg_price = (SELECT avg(o_totalprice) FROM orders);
          SELECT o_orderpriority, count(*) AS n_above
          FROM orders WHERE o_totalprice > avg_price
          GROUP BY o_orderpriority;
        END
        """
    )


_CDC_DIFF_SQL = """
WITH old AS (SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 3 <> 0),
new AS (SELECT o_orderkey,
               CASE WHEN o_orderkey % 5 = 0 THEN round(o_totalprice * 1.1, 2)
                    ELSE o_totalprice END AS o_totalprice
        FROM orders WHERE o_orderkey % 3 <> 1)
SELECT change_type, count(*) AS n,
       CAST(sum(o_orderkey) AS BIGINT) AS key_checksum
FROM (
  SELECT coalesce(n.o_orderkey, o.o_orderkey) AS o_orderkey,
         CASE WHEN o.o_orderkey IS NULL THEN 'insert'
              WHEN n.o_orderkey IS NULL THEN 'delete'
              WHEN n.o_totalprice <> o.o_totalprice THEN 'update'
              ELSE 'unchanged' END AS change_type
  FROM old o FULL OUTER JOIN new n ON o.o_orderkey = n.o_orderkey
) t GROUP BY change_type
"""


@query(
    "cdc_snapshot_diff",
    "§5.2 composed: CDC snapshot diff (insert/update/delete/unchanged classification)",
    _CDC_DIFF_SQL,
)
def cdc_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-based change data capture: diff two table versions
    into insert/update/delete/unchanged classes — what an ingest
    pipeline computes when the source can't emit a changelog. One full
    outer join on the key (both snapshots shuffle once on o_orderkey)
    and a classification CASE; per-class counts plus a key checksum
    make the diff verifiable. The synthetic versions derive
    deterministically from orders (key % 3 membership, key % 5 price
    bump) so the oracle reconstructs both sides. At 100 TB the same
    shape runs partition-wise when both snapshots share layout —
    bucketed or date-partitioned snapshots diff without a global
    shuffle."""
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    old = o.filter(F.col("o_orderkey") % 3 != 0).select(
        F.col("o_orderkey").alias("k_old"), F.col("o_totalprice").alias("p_old")
    )
    new = o.filter(F.col("o_orderkey") % 3 != 1).select(
        F.col("o_orderkey").alias("k_new"),
        F.when(
            F.col("o_orderkey") % 5 == 0, F.round(F.col("o_totalprice") * 1.1, 2)
        ).otherwise(F.col("o_totalprice")).alias("p_new"),
    )
    diff = old.join(new, old.k_old == new.k_new, "full_outer").select(
        F.coalesce("k_new", "k_old").alias("o_orderkey"),
        F.when(F.col("k_old").isNull(), "insert")
        .when(F.col("k_new").isNull(), "delete")
        .when(F.col("p_new") != F.col("p_old"), "update")
        .otherwise("unchanged")
        .alias("change_type"),
    )
    return diff.groupBy("change_type").agg(
        F.count("*").alias("n"), F.sum("o_orderkey").cast("bigint").alias("key_checksum")
    )


_ANOMALY_ZSCORE_SQL = """
WITH w AS (
  SELECT event_type, value,
         avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN 19 PRECEDING AND 1 PRECEDING) AS mu,
         stddev_samp(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN 19 PRECEDING AND 1 PRECEDING) AS sd,
         count(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN 19 PRECEDING AND 1 PRECEDING) AS n_hist
  FROM events)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_scored,
       CAST(count(CASE WHEN abs(value - mu) > 3 * sd THEN 1 END) AS BIGINT)
         AS n_anomalies
FROM w
WHERE n_hist >= 10 AND sd > 0
GROUP BY event_type
"""


@query(
    "ts_anomaly_zscore",
    "§5.2 composed: rolling z-score anomaly detection (trailing window stats)",
    _ANOMALY_ZSCORE_SQL,
)
def ts_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming-style anomaly scoring in batch: each event is judged
    against the TRAILING 19 events of its own user (frame excludes the
    current row — the score must not contaminate its own baseline);
    |value − µ| > 3σ flags it. Warm-up (<10 observations) and
    degenerate windows (σ=0) are excluded — the same guards a
    production detector needs. One shuffle on user_id computes all
    three rolling stats in a single window pass; the per-type rollup
    is a cheap second aggregate. Both engines evaluate the identical
    ordered frame, so mean/stddev agree to the ulp and the 3σ cut is
    stable (verified by the partitioning-determinism audit)."""
    ev = load(spark, sf_dir, "events").select("user_id", "event_id", "ts", "event_type", "value")
    w = (
        Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-19, -1)
    )
    scored = ev.select(
        "event_type",
        "value",
        F.avg("value").over(w).alias("mu"),
        F.stddev_samp("value").over(w).alias("sd"),
        F.count("*").over(w).alias("n_hist"),
    ).filter((F.col("n_hist") >= 10) & (F.col("sd") > 0))
    return scored.groupBy("event_type").agg(
        F.count("*").alias("n_scored"),
        F.count(F.when(F.abs(F.col("value") - F.col("mu")) > 3 * F.col("sd"), 1)).alias(
            "n_anomalies"
        ),
    )


@query(
    "ts_markov_transitions",
    "§2.5 event-sequence Markov transition matrix (lag + Laplace)",
    """
    WITH e AS (
      SELECT user_id, event_type, date_trunc('microseconds', ts) AS tsu, event_id
      FROM events
    ), pairs AS (
      SELECT lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY tsu, event_id) AS prev_type,
             event_type AS next_type
      FROM e
    ), counts AS (
      SELECT prev_type, next_type, count(*) AS n_trans
      FROM pairs WHERE prev_type IS NOT NULL
      GROUP BY prev_type, next_type
    ), totals AS (
      SELECT prev_type, CAST(sum(n_trans) AS BIGINT) AS row_total FROM counts
      GROUP BY prev_type
    ), n_types AS (SELECT count(DISTINCT event_type) AS v FROM events)
    SELECT c.prev_type, c.next_type, c.n_trans,
           round((c.n_trans + 1.0) / (t.row_total + v.v), 6) AS p_smoothed
    FROM counts c JOIN totals t USING (prev_type) CROSS JOIN n_types v
    """,
)
def ts_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov chain over per-user event streams: lag()
    within (user_id ORDER BY ts, event_id) forms the (prev, next)
    pairs, a hash agg counts each transition, and the probability is
    add-1 (Laplace) smoothed by the event-type vocabulary so unseen
    transitions stay representable. The vocabulary size rides the plan
    as a broadcast 1-row aggregate (in-plan scalar discipline — no
    driver-side collect).

    Shuffle shape: one exchange on user_id for the lag window, then
    one on (prev, next) for the counts — the totals re-aggregate from
    the counts table (|types|^2 rows), not from the events, so the big
    table is traversed exactly once. Ties at the same microsecond are
    broken by event_id, matching the oracle exactly.

    At 100 TB this is the sessionization scale profile: windows need
    whole-user partitions (bot users are the skew risk), while the
    transition-count agg is tiny-keyed (|types|^2) and partial-agg
    collapses it map-side."""
    ev = load(spark, sf_dir, "events").select("user_id", "event_type", "ts", "event_id")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = ev.select(
        F.lag("event_type").over(w).alias("prev_type"), F.col("event_type").alias("next_type")
    ).where(F.col("prev_type").isNotNull())
    counts = pairs.groupBy("prev_type", "next_type").agg(F.count("*").alias("n_trans"))
    totals = counts.groupBy("prev_type").agg(F.sum("n_trans").alias("row_total"))
    v = ev.agg(F.countDistinct("event_type").alias("v"))
    return (
        counts.join(totals, "prev_type")
        .crossJoin(F.broadcast(v))  # 1-row vocabulary scalar
        .select(
            "prev_type",
            "next_type",
            "n_trans",
            F.round((F.col("n_trans") + 1.0) / (F.col("row_total") + F.col("v")), 6).alias(
                "p_smoothed"
            ),
        )
    )


@query(
    "ts_interpolate_linear",
    "§2.5 per-user daily series with linear interpolation of gaps",
    """
    WITH daily AS (
      SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS d,
             CAST(floor(CAST(sum(CAST(value AS DECIMAL(18,6))) * 1000000 AS BIGINT)
                        * 1.0 / (count(*) * 100)) AS BIGINT) / 10000.0 AS v
      FROM events GROUP BY user_id, CAST(date_trunc('day', ts) AS DATE)
    ), bounds AS (
      SELECT user_id, min(d) AS lo, max(d) AS hi FROM daily GROUP BY user_id
    ), spine AS (
      SELECT user_id, unnest(generate_series(lo, hi, INTERVAL 1 DAY))::DATE AS d
      FROM bounds
    ), joined AS (
      SELECT s.user_id, s.d, daily.v,
             CASE WHEN daily.v IS NOT NULL THEN s.d END AS obs_d
      FROM spine s LEFT JOIN daily USING (user_id, d)
    ), ffill AS (
      SELECT user_id, d, v,
             last_value(v IGNORE NULLS) OVER wp AS prev_v,
             last_value(obs_d IGNORE NULLS) OVER wp AS prev_d,
             first_value(v IGNORE NULLS) OVER wf AS next_v,
             first_value(obs_d IGNORE NULLS) OVER wf AS next_d
      FROM joined
      WINDOW wp AS (PARTITION BY user_id ORDER BY d
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             wf AS (PARTITION BY user_id ORDER BY d
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT user_id, strftime(d, '%Y-%m-%d') AS d,
           CASE WHEN v IS NOT NULL THEN 'obs'
                WHEN prev_v IS NULL OR next_v IS NULL THEN 'edge'
                ELSE 'interp' END AS kind,
           CAST(CASE
             WHEN v IS NOT NULL THEN CAST(round(v * 10000) AS BIGINT) * 100
             WHEN prev_v IS NULL THEN CAST(round(next_v * 10000) AS BIGINT) * 100
             WHEN next_v IS NULL THEN CAST(round(prev_v * 10000) AS BIGINT) * 100
             ELSE CAST(floor(
               (CAST(round(prev_v * 10000) AS BIGINT)
                  * (date_diff('day', prev_d, next_d) - date_diff('day', prev_d, d))
                + CAST(round(next_v * 10000) AS BIGINT)
                  * date_diff('day', prev_d, d)) * 100.0
               / date_diff('day', prev_d, next_d)) AS BIGINT)
           END AS DOUBLE) / 1000000 AS v_filled
    FROM ffill
    """,
)
def ts_interpolate_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap repair for per-entity time series: densify each user's
    daily series over a per-user spine, then linearly interpolate
    missing days between the nearest observed values (forward-looking
    first_value + backward last_value, both IGNORE NULLS), falling back
    to nearest-edge carry at the boundaries. The daily average is
    rounded BEFORE interpolation so both engines interpolate identical
    operands; day offsets are exact integers.

    The spine is O(users x days) built from a per-user min/max
    aggregate exploded with F.sequence — never O(events). One shuffle
    on user_id then serves the fill join and BOTH window passes
    (identical partitioning, Exchange reuse; the forward window is the
    same sort order with a reversed frame, not a second sort).

    At 100 TB: state per user is two (value, date) pairs per direction
    — window-function memory is O(1) per row; the hazard is only a
    degenerate user with a years-long span x fine grain, which caps at
    spine granularity, not event volume."""
    ev = load(spark, sf_dir, "events").select("user_id", "ts", "value")
    daily = ev.groupBy("user_id", F.to_date(F.date_trunc("day", "ts")).alias("d")).agg(
        # exact decimal sum floored into 1e-4 units: a round() of the
        # double mean can disagree across engines on true midpoints
        (
            F.floor(
                (F.sum(F.col("value").cast("decimal(18,6)")) * 1000000).cast("bigint")
                * F.lit(1.0)
                / (F.count("*") * 100)
            ).cast("bigint")
            / 10000.0
        ).alias("v")
    )
    bounds = daily.groupBy("user_id").agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
    spine = bounds.select(
        "user_id", F.explode(F.sequence("lo", "hi", F.expr("interval 1 day"))).alias("d")
    )
    joined = spine.join(daily, ["user_id", "d"], "left").withColumn(
        "obs_d", F.when(F.col("v").isNotNull(), F.col("d"))
    )
    wp = (
        Window.partitionBy("user_id")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("user_id")
        .orderBy("d")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    ffill = joined.select(
        "user_id",
        "d",
        "v",
        F.last("v", ignorenulls=True).over(wp).alias("prev_v"),
        F.last("obs_d", ignorenulls=True).over(wp).alias("prev_d"),
        F.first("v", ignorenulls=True).over(wf).alias("next_v"),
        F.first("obs_d", ignorenulls=True).over(wf).alias("next_d"),
    )
    # Exact interpolation: 4-decimal v values become integers in 1e-4
    # units, the weighted blend is integer arithmetic, and the single
    # division floors into 1e-6 units — bit-identical across engines
    # (a double round() here can disagree on true midpoints, e.g. a
    # 2^k-day gap producing ...x5 exactly at the rounding digit).
    def units(c):
        return F.round(c * 10000).cast("bigint")

    dd = F.datediff("d", "prev_d")
    dd2 = F.datediff("next_d", "prev_d")
    interp_e6 = F.floor(
        (units(F.col("prev_v")) * (dd2 - dd) + units(F.col("next_v")) * dd) * 100.0 / dd2
    ).cast("bigint")
    v_e6 = (
        F.when(F.col("v").isNotNull(), units(F.col("v")) * 100)
        .when(F.col("prev_v").isNull(), units(F.col("next_v")) * 100)
        .when(F.col("next_v").isNull(), units(F.col("prev_v")) * 100)
        .otherwise(interp_e6)
    )
    return ffill.select(
        "user_id",
        F.date_format("d", "yyyy-MM-dd").alias("d"),
        F.when(F.col("v").isNotNull(), "obs")
        .when(F.col("prev_v").isNull() | F.col("next_v").isNull(), "edge")
        .otherwise("interp")
        .alias("kind"),
        (v_e6.cast("double") / 1000000).alias("v_filled"),
    )


@query(
    "graph_triangle_copurchase",
    "§2.3 graph analytics: degree-oriented triangle counting",
    """
    WITH pl AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    edges AS (
      SELECT a.l_partkey AS u, b.l_partkey AS v
      FROM pl a JOIN pl b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY a.l_partkey, b.l_partkey
    )
    SELECT (SELECT count(*) FROM edges) AS n_edges,
           (SELECT count(*)
            FROM edges e1
            JOIN edges e2 ON e2.u = e1.u AND e2.v > e1.v
            JOIN edges e3 ON e3.u = e1.v AND e3.v = e2.v) AS n_triangles
    """,
)
def graph_triangle_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting over the part co-purchase graph (parts in the
    same order are connected; edges stored once as u < v). The Spark
    side runs the DEGREE-ORIENTED algorithm: orient every edge from the
    (degree, id)-smaller endpoint to the larger, enumerate wedges only
    among each node's OUTGOING edges, and close each wedge against the
    canonical undirected edge set. With that orientation every node's
    out-degree is O(sqrt(|E|)), so the wedge join cannot go quadratic
    on hub parts — the reason this beats the oracle's plain u<v<w
    triple self-join at 100 TB, where a part appearing in millions of
    orders would square. Each triangle yields exactly one wedge (from
    its orientation-minimal vertex), so the counts agree exactly; all
    integers, no rounding.

    Shuffle shape: distinct + pair join on l_orderkey, degree agg on
    node, adjacency collect_list on src, two equi-joins of the edge
    table against the O(nodes) adjacency table, one global sum —
    every join equi-keyed, every aggregate partial-agg friendly.
    """
    from spark_lineage_spark.operators.analytics import (
        copurchase_edges,
        small_node_count,
    )

    # shared checkpointed edge build (groupBy + combination explode —
    # one shuffle, no lineitem self-join); edges feed four consumers
    edges = copurchase_edges(spark, sf_dir)
    bc = F.broadcast if small_node_count(spark, sf_dir) else (lambda df: df)
    deg = (
        edges.select(F.col("u").alias("n"))
        .unionAll(edges.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count("*").alias("deg"))
    )
    # deg is node-sized (<= |part|): broadcast both annotation joins
    ann = edges.join(bc(deg.withColumnsRenamed({"n": "u", "deg": "du"})), "u").join(
        bc(deg.withColumnsRenamed({"n": "v", "deg": "dv"})), "v"
    )
    fwd = (F.col("du") < F.col("dv")) | ((F.col("du") == F.col("dv")) & (F.col("u") < F.col("v")))
    oriented = ann.select(
        F.when(fwd, F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(fwd, F.col("v")).otherwise(F.col("u")).alias("dst"),
    )
    # Per-edge adjacency intersection instead of materializing the
    # wedge set: for each oriented edge (src,dst), triangles close on
    # the common OUT-neighbors of both endpoints, so
    # |N+(src) ∩ N+(dst)| summed over edges counts each triangle
    # exactly once (at its orientation-minimal vertex). Same O(sum
    # d_out^2) work as wedge enumeration, but it stays inside
    # whole-stage codegen as array_intersect over <=O(sqrt(E))-sized
    # sorted arrays — no 30M-row wedge shuffle (that variant measured
    # 40-60 s at sf0.1; this one ~8 s).
    adj = oriented.groupBy("src").agg(F.sort_array(F.collect_list("dst")).alias("nbrs"))
    # the adjacency table has one row per node (<= |part|, a dimension
    # cardinality) with O(sqrt(E)) entries each; broadcast it so the
    # closure is two map-side hash joins with zero array shuffle.
    # Size guard: parquet-metadata row count of the part dimension
    # (no data scan) — past ~2M nodes fall back to shuffle joins.
    adj = bc(adj)
    # the closure stage is CPU-bound (array_intersect per edge) but
    # byte-light, so AQE's size-based coalescing would starve it of
    # parallelism — spread the edges across the full core count first
    closed = (
        oriented.repartition(int(spark.conf.get("spark.sql.shuffle.partitions", "32")))
        .join(adj.withColumnsRenamed({"src": "u2", "nbrs": "na"}),
              F.col("src") == F.col("u2"))
        .join(adj.withColumnsRenamed({"src": "v2", "nbrs": "nb"}),
              F.col("dst") == F.col("v2"), "left")
        .select(
            F.size(
                F.array_intersect(
                    F.col("na"), F.coalesce(F.col("nb"), F.array().cast("array<bigint>"))
                )
            ).alias("n_common")
        )
    )
    tri = closed.agg(F.sum("n_common").alias("n_triangles"))
    n_edges = edges.agg(F.count("*").alias("n_edges"))
    return n_edges.crossJoin(F.broadcast(tri))  # two 1-row aggregates


@query(
    "agg_weighted_median",
    "§2.4 weighted median via cumulative-weight window (exact)",
    """
    WITH w AS (
      SELECT l_returnflag, l_extendedprice, l_quantity,
             sum(l_quantity) OVER (PARTITION BY l_returnflag
                                   ORDER BY l_extendedprice, l_orderkey, l_linenumber
                                   ROWS UNBOUNDED PRECEDING) AS cum_w,
             sum(l_quantity) OVER (PARTITION BY l_returnflag) AS tot_w
      FROM lineitem
    )
    SELECT l_returnflag,
           round(min(CASE WHEN cum_w >= tot_w / 2 THEN l_extendedprice END), 2)
             AS weighted_median,
           round(CAST(max(tot_w) AS DOUBLE), 2) AS total_weight
    FROM w GROUP BY l_returnflag
    """,
)
def agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted median price per return flag: sort by price
    within the group, accumulate weight, take the smallest price whose
    cumulative weight reaches half the total. Quantities are small
    integers, so the running sum is exact in doubles (< 2^53) — the
    halfway comparison has no float boundary; ties in price break on
    (l_orderkey, l_linenumber) identically in both engines.

    Scale shape (the round-6 rewrite): l_returnflag has 3 values, so a
    running-sum window partitioned on it accumulates ~1/3 of the fact
    table on one task. The cumulative weight now comes from
    ``grouped_rank(..., weight=...)`` — the two-phase distributed
    prefix sum partitioned on (flag, price-range): per-range local
    running sums in parallel, the O(#flags x #ranges) per-range weight
    totals cumsum broadcast back as offsets. Weights sum as
    decimal(18,2), so the re-associated addition is exact — the
    halfway comparison cannot drift from the oracle's strictly
    left-to-right window sum."""
    from spark_lineage_spark.operators.analytics import grouped_rank

    li = load(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        "l_extendedprice",
        F.col("l_quantity").cast("decimal(18,2)").alias("qty"),
        "l_orderkey",
        "l_linenumber",
    )
    w = grouped_rank(
        li,
        ["l_returnflag"],
        ["l_extendedprice", "l_orderkey", "l_linenumber"],
        F.floor(F.col("l_extendedprice") / F.lit(1000.0)).cast("bigint"),
        weight="qty",
    )
    return w.groupBy("l_returnflag").agg(
        F.round(
            F.min(F.when(F.col("cum_w") >= F.col("tot_w") / 2, F.col("l_extendedprice"))), 2
        ).alias("weighted_median"),
        F.round(F.max("tot_w").cast("double"), 2).alias("total_weight"),
    )


@query(
    "ts_rolling_distinct_users",
    "§2.4/§2.5 trailing-7-day distinct users per day (exact, no window-HLL)",
    """
    WITH du AS (
      SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS d, user_id FROM events
    ), bounds AS (SELECT min(d) AS lo, max(d) AS hi FROM du),
    spine AS (
      SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY))::DATE AS d FROM bounds
    )
    SELECT strftime(s.d, '%Y-%m-%d') AS d,
           count(DISTINCT du.user_id) AS active_7d
    FROM spine s JOIN du ON du.d BETWEEN s.d - 6 AND s.d
    GROUP BY s.d
    """,
)
def ts_rolling_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day active users — the metric COUNT(DISTINCT) OVER a
    RANGE frame cannot express (distinct is not frame-decomposable).
    Dedup to (day, user) first, then a range join against the O(days)
    spine fans each user-day into at most 7 evaluation days, and an
    exact count-distinct per day finishes. Work is 7x|user-days|,
    independent of raw event volume — the spine side broadcasts, the
    fan-out never shuffles the raw events twice.

    At 100 TB the same shape holds (user-days << events); if user-days
    themselves blow up, the 7-day distinct becomes a merge of 7 daily
    HLL sketches at documented error — the exact form stays the oracle.
    """
    ev = load(spark, sf_dir, "events")
    du = ev.select(F.to_date(F.date_trunc("day", "ts")).alias("d"), "user_id").distinct()
    bounds = du.agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("interval 1 day"))).alias("sd")
    )
    fan = du.join(
        F.broadcast(spine),
        (F.col("d") >= F.date_sub(F.col("sd"), 6)) & (F.col("d") <= F.col("sd")),
    )
    return fan.groupBy("sd").agg(F.countDistinct("user_id").alias("active_7d")).select(
        F.date_format("sd", "yyyy-MM-dd").alias("d"), "active_7d"
    )


_CHANGEPOINT_SQL = """
WITH daily AS (
  SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS d,
         sum(CAST(value AS DECIMAL(18,6))) AS sv, count(*) AS c
  FROM events WHERE value IS NOT NULL
  GROUP BY user_id, CAST(date_trunc('day', ts) AS DATE)
),
pre AS (
  SELECT user_id, d,
         sum(sv) OVER (PARTITION BY user_id ORDER BY d
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ps,
         sum(c) OVER (PARTITION BY user_id ORDER BY d
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pc,
         sum(sv) OVER (PARTITION BY user_id) AS tot,
         sum(c) OVER (PARTITION BY user_id) AS tc,
         count(*) OVER (PARTITION BY user_id) AS nd,
         row_number() OVER (PARTITION BY user_id ORDER BY d) AS i
  FROM daily
),
stats AS (
  SELECT user_id, d, nd,
         round(abs(CAST(ps AS DOUBLE) / pc
                   - CAST(tot - ps AS DOUBLE) / (tc - pc))
               * sqrt(pc * (tc - pc) * 1.0 / tc), 6) AS stat
  FROM pre WHERE i < nd
),
best AS (
  SELECT user_id, d AS split_day, stat, nd AS n_days,
         row_number() OVER (PARTITION BY user_id ORDER BY stat DESC, d) AS rn
  FROM stats
)
SELECT user_id, split_day, stat, n_days FROM best WHERE rn = 1
"""


@query(
    "ts_changepoint_split",
    "§2.5/§5.2 changepoint detection: max standardized mean-split statistic",
    _CHANGEPOINT_SQL,
    doc="Per-user day where the before/after mean difference peaks (binary segmentation step).",
)
def ts_changepoint_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Changepoint detection, binary-segmentation first step: for each
    candidate split day, the CUSUM-style statistic
    |mean_before - mean_after| * sqrt(n_l * n_r / n) — the day that
    maximizes it is the most likely level shift. Identical SQL text on
    both engines.

    Determinism without recursion: the full CUSUM recursion
    s_i = max(0, s_{i-1} + ...) is not window-expressible, but the
    split statistic needs only per-user prefix sums — decimal-exact —
    so every per-row double is computed from exact inputs (identical
    bits in both engines) and the argmax orders by the ROUNDED stat
    with a day tie-break. Scale: one shuffle to daily grain, windows
    over bounded per-user day series (O(days), not O(events)).
    """
    register_views(spark, sf_dir, ["events"])
    return spark.sql(_CHANGEPOINT_SQL)


_FORECAST_ERROR_SQL = """
WITH daily AS (
  SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS d,
         sum(CAST(value AS DECIMAL(18,6))) AS v
  FROM events WHERE value IS NOT NULL
  GROUP BY user_id, CAST(date_trunc('day', ts) AS DATE)
),
paired AS (
  SELECT a.user_id, a.v AS actual, f.v AS forecast
  FROM daily a JOIN daily f
    ON a.user_id = f.user_id AND f.d = a.d - INTERVAL 7 DAY
),
sums AS (
  SELECT user_id, count(*) AS n_days,
         CAST(CAST(sum(abs(actual - forecast)) * 1000000 AS BIGINT) AS DOUBLE)
           AS sabs,
         CAST(CAST(sum(abs(actual)) * 1000000 AS BIGINT) AS DOUBLE) AS sact,
         CAST(CAST(sum(actual - forecast) * 1000000 AS BIGINT) AS DOUBLE)
           AS sdiff
  FROM paired
  GROUP BY user_id
)
SELECT user_id, n_days,
       floor(sabs / nullif(sact, 0) * 1000000) / 1000000 AS wape,
       floor(sabs / n_days) / 1000000 AS mae,
       (CASE WHEN sdiff < 0 THEN -1 ELSE 1 END)
         * floor(abs(sdiff) / n_days) / 1000000 AS bias
FROM sums
"""


@query(
    "ts_forecast_error",
    "§2.5/§5.2 forecast evaluation: seasonal-naive WAPE / MAE / bias",
    _FORECAST_ERROR_SQL,
    doc="Error of the 'same weekday last week' forecast, per user.",
)
def ts_forecast_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast-accuracy scoring — the evaluation half of every demand
    pipeline: the seasonal-naive baseline (this day = same weekday
    last week) against actuals, as WAPE (scale-free), MAE, and signed
    bias. The 7-day lag is a calendar-day EQUI-JOIN on
    (user, d-7), not lag(7 rows) — a missing day must not slide the
    whole window (the classic sparse-series bug). Identical SQL text
    on both engines.

    Determinism: sums are decimal-exact, snapped to micro-unit bigints
    and cast once to double — the SAME int64 maps to the SAME double
    in both engines, so every subsequent floating op is bit-identical
    and the floor()-truncated 6-dp metrics cannot flip at a rounding
    midpoint (round() on a double quotient can — the first version
    failed the oracle exactly there). No bigint multiply, so no
    overflow at scale; WAPE's denominator is sum|actual| (the standard
    definition, non-negative by construction) with a NULLIF(., 0)
    all-zero guard; bias truncates toward zero via abs+sign.
    """
    register_views(spark, sf_dir, ["events"])
    return spark.sql(_FORECAST_ERROR_SQL)


_SEQ_PATTERN = "view,click,purchase"

_SEQ_PATTERN_SQL = f"""
WITH seqs AS (
  SELECT user_id,
         string_agg(event_type, ',' ORDER BY ts, event_id) AS seq
  FROM events GROUP BY user_id
)
SELECT user_id,
       CAST((length(seq) - length(replace(seq, '{_SEQ_PATTERN}', '')))
            / length('{_SEQ_PATTERN}') AS BIGINT) AS n_matches,
       CAST(length(seq) - length(replace(seq, ',', '')) + 1 AS BIGINT)
         AS n_events
FROM seqs
"""


@query(
    "ts_sequence_pattern",
    "§2.5 event-sequence pattern matching (MATCH_RECOGNIZE-lite)",
    _SEQ_PATTERN_SQL,
    doc="Count of consecutive view->click->purchase triples per user.",
)
def ts_sequence_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consecutive-pattern detection over ordered event streams — the
    set-based stand-in for SQL MATCH_RECOGNIZE (which neither engine
    ships): each user's events collapse to one ordered
    comma-separated string and non-overlapping occurrences of the
    pattern are counted with the replace-length identity
    (len(s) - len(replace(s, p, ''))) / len(p) — pure integer
    arithmetic, identical everywhere.

    Spark side builds the ordered sequence without a string_agg
    ORDER BY (not supported): array_sort over (ts, event_id, type)
    structs — struct comparison is lexicographic by field order, so
    the sort key equals the oracle's ORDER BY — then concat_ws. One
    user_id shuffle; per-user strings bounded by the user's history
    (cap upstream for bot users, same note as sessionization).
    """
    ev = load(spark, sf_dir, "events")
    seqs = ev.groupBy("user_id").agg(
        F.concat_ws(
            ",",
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("ts", "event_id", "event_type"))
                ),
                lambda s: s["event_type"],
            ),
        ).alias("seq")
    )
    pat = F.lit(_SEQ_PATTERN)
    return seqs.select(
        "user_id",
        (
            (F.length("seq") - F.length(F.replace(F.col("seq"), pat, F.lit(""))))
            / F.length(pat)
        )
        .cast("bigint")
        .alias("n_matches"),
        (F.length("seq") - F.length(F.replace(F.col("seq"), F.lit(","), F.lit(""))) + 1)
        .cast("bigint")
        .alias("n_events"),
    )


_ACF_SQL = """
WITH daily AS (
  SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
         sum(CAST(value AS DECIMAL(18,6))) AS v
  FROM events WHERE value IS NOT NULL
  GROUP BY CAST(date_trunc('day', ts) AS DATE)
),
lags AS (
  SELECT 1 AS lag UNION ALL SELECT 2 UNION ALL SELECT 3
),
pairs AS (
  SELECT l.lag, a.v AS x, b.v AS y
  FROM lags l
  JOIN daily a ON true
  JOIN daily b ON b.d = a.d + CAST(l.lag AS INTEGER)
),
s AS (
  SELECT lag, count(*) AS n,
         cast(sum(x) AS DOUBLE) AS sx, cast(sum(y) AS DOUBLE) AS sy,
         cast(sum(x * y) AS DOUBLE) AS sxy,
         cast(sum(x * x) AS DOUBLE) AS sxx,
         cast(sum(y * y) AS DOUBLE) AS syy
  FROM pairs GROUP BY lag
)
SELECT lag, n,
       round((n * sxy - sx * sy)
             / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS acf
FROM s
"""


@query(
    "ts_autocorrelation",
    "§2.5 autocorrelation of the daily series at lags 1-3 (exact sums)",
    _ACF_SQL,
    doc="Pearson ACF of daily totals at calendar-day lags 1, 2, 3.",
)
def ts_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation — the seasonality probe behind every forecast
    choice: Pearson correlation of the corpus-wide daily total with
    itself shifted by 1/2/3 CALENDAR days (equi-join on d+lag, the
    same no-row-sliding rule as ts_forecast_error). Sums are
    decimal-exact per (lag) group and the closed form runs on
    identically-cast doubles (the agg_correlation_matrix discipline).

    The daily table is O(days) — tiny at any SF — so the lag
    cross-join (3 x days) and self-join are trivially bounded; the
    only data-sized work is the one hash agg to daily grain.
    Identical SQL text on both engines.
    """
    register_views(spark, sf_dir, ["events"])
    return spark.sql(_ACF_SQL)


@query(
    "sql_named_parameters",
    "§2.2/§2.12 parameterized SQL (named + positional markers, injection-safe)",
    """
    SELECT o_orderpriority,
           count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS revenue
    FROM orders
    WHERE o_totalprice >= 50000.0
      AND o_orderstatus = 'O'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    GROUP BY o_orderpriority
    """,
)
def sql_named_parameters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 3.4+/4 parameterized SQL — ``spark.sql(query, args=...)``
    with ``:name`` markers. This is the injection-safe templating path
    every dashboard / scheduled-report layer should use instead of
    string interpolation: parameters are bound as typed literals in
    the parsed plan (so Catalyst still constant-folds and pushes them
    into the scan — the parquet row-group filter on o_totalprice is
    identical to the hand-written literal query's), and a malicious
    value cannot change the query shape. The oracle is the same query
    with the literals inlined, which also proves the binding is
    value-faithful (timestamp param arrives as TIMESTAMP, not a
    string compare)."""
    register_views(spark, sf_dir, ["orders"])
    return spark.sql(
        """
        SELECT o_orderpriority,
               count(*) AS n_orders,
               round(sum(o_totalprice), 2) AS revenue
        FROM orders
        WHERE o_totalprice >= :min_price
          AND o_orderstatus = :status
          AND o_orderdate >= CAST(:start_ts AS TIMESTAMP)
        GROUP BY o_orderpriority
        """,
        args={
            "min_price": 50000.0,
            "status": "O",
            "start_ts": "1996-01-01 00:00:00",
        },
    )


@query(
    "ts_session_window_builtin",
    "§2.5/§2.9 built-in session_window in BATCH mode (per-session rows, gap 30 min)",
    """
    WITH e AS (
      SELECT user_id, event_id, date_trunc('microseconds', ts) AS tsu
      FROM events
    ), marked AS (
      SELECT user_id, event_id, tsu,
             CASE WHEN lag(tsu) OVER w IS NULL
                    OR tsu - lag(tsu) OVER w >= INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS is_new
      FROM e
      WINDOW w AS (PARTITION BY user_id ORDER BY tsu, event_id)
    ), sess AS (
      -- cumulative-sum window ordered by the SAME (tsu, event_id) key
      -- as the lag window: two same-microsecond events at a session
      -- boundary would otherwise order nondeterministically around
      -- the is_new=1 row and split one session into two (ADVICE r7)
      SELECT user_id, tsu,
             sum(is_new) OVER (PARTITION BY user_id ORDER BY tsu, event_id
                               ROWS UNBOUNDED PRECEDING) AS sess_id
      FROM marked
    )
    SELECT user_id,
           strftime(min(tsu), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
           strftime(max(tsu) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S.%f') AS session_end,
           count(*) AS n_events
    FROM sess GROUP BY user_id, sess_id
    """,
)
def ts_session_window_builtin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``F.session_window`` used in BATCH mode — the built-in dynamic-gap
    windowing (one groupBy, Spark merges overlapping per-event windows
    internally) vs ts_sessionize_batch's hand-rolled lag+cumsum. The
    semantics differ at the boundary: the built-in closes a session
    when gap >= 30 min EXACTLY (an event at ts == previous session end
    starts a NEW session, because membership is ts < end), so the
    oracle's new-session predicate is >= where the lag-based query's
    is >. window.end is max(ts) + gap by definition — the oracle
    reproduces it arithmetically. Per-session rows keyed by
    (user_id, start) are a stable identity; timestamps travel as
    microsecond strings (ns-parquet truncation note in FIXTURES.md).
    One shuffle on user_id; the session merge itself is state inside
    the aggregation operator, not an extra exchange."""
    ev = load(spark, sf_dir, "events").select("user_id", "ts")
    isots = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("sw"))
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.date_format(F.col("sw.start"), isots).alias("session_start"),
            F.date_format(F.col("sw.end"), isots).alias("session_end"),
            "n_events",
        )
    )


# truncated EWMA: alpha = 1/2, 8 taps. Weight of lag j is 2^(7-j) in
# 256ths; null lags (series head) drop out of numerator AND denominator
# so the head is re-normalized, not biased toward zero.
_EWMA_TAPS = 8
_EWMA_NUM = " + ".join(
    f"coalesce(lag(m, {j}) OVER w, 0) * {1 << (_EWMA_TAPS - 1 - j)}"
    for j in range(_EWMA_TAPS)
)
_EWMA_DEN = " + ".join(
    f"CASE WHEN lag(m, {j}) OVER w IS NOT NULL THEN {1 << (_EWMA_TAPS - 1 - j)} ELSE 0 END"
    for j in range(_EWMA_TAPS)
)

def _ewma_sql(day_fmt: str) -> str:
    # identical SQL both engines except the date->ISO-string function:
    # Spark date_format vs DuckDB strftime (argument order differs too)
    return f"""
WITH daily AS (
  SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS d,
         CAST(sum(CAST(round(value * 1000000) AS BIGINT)) AS BIGINT) AS m
  FROM events GROUP BY 1, 2
), sm AS (
  SELECT user_id, d, m, {_EWMA_NUM} AS num, {_EWMA_DEN} AS den
  FROM daily
  WINDOW w AS (PARTITION BY user_id ORDER BY d)
)
SELECT user_id, {day_fmt} AS day,
       round(CAST(m AS DOUBLE) / 1000000.0, 6) AS daily_value,
       round(CAST(num AS DOUBLE) / den / 1000000.0, 6) AS ewma_value
FROM sm
"""


_EWMA_SQL = _ewma_sql("strftime(d, '%Y-%m-%d')")
_EWMA_SPARK_SQL = _ewma_sql("date_format(d, 'yyyy-MM-dd')")


@query(
    "ts_ewma_smoothing",
    "§2.5/§5.2 exponential smoothing (truncated EWMA, exact integer taps)",
    _EWMA_SQL,
    doc="Per-user daily EWMA (alpha=1/2, 8 taps) in exact scaled integers.",
)
def ts_ewma_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average of each user's daily
    value series — the denoising pass behind alerting baselines and
    trend dashboards. The IIR recursion s_t = a*x_t + (1-a)*s_(t-1)
    is not expressible as a window aggregate without recursion, so
    this uses the standard FIR truncation: with alpha = 1/2 the tap
    weights are 2^-1 ... 2^-8 and the tail beyond 8 taps carries
    < 0.4% of the mass. Exactness: daily values are scaled to integer
    micro-units, each tap multiplies by a power-of-two weight in
    256ths, and numerator/denominator are exact BIGINT sums — the
    single float division at the end runs on identical integers in
    both engines, so round(6) is bit-stable (the
    agg_correlation_matrix discipline applied to a time series).
    Series heads re-normalize by the present-tap weight sum instead
    of zero-padding. One shuffle on user_id serves the daily rollup
    and the 8-lag window; taps are lag() reads inside one window
    spec, not 8 self-joins."""
    register_views(spark, sf_dir, ["events"])
    return spark.sql(_EWMA_SPARK_SQL)


@query(
    "sql_pipe_syntax",
    "§2 advanced SQL: Spark 4.0 SQL pipe syntax (|> operator chain)",
    """
    SELECT l_returnflag,
           count(*) AS n_items,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem
    WHERE l_quantity >= 10
    GROUP BY l_returnflag
    HAVING count(*) > 100
    ORDER BY l_returnflag
    """,
)
def sql_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4.0's SQL pipe syntax — the linear `FROM ... |> WHERE ...
    |> AGGREGATE` form (GoogleSQL's pipe operators) that reads in
    execution order instead of inside-out nesting. Each |> stage maps
    to the same logical operator as its classic clause, so Catalyst
    plans this IDENTICALLY to the nested form — the oracle is the
    classic SQL, proving pipe syntax is pure surface (same filter
    pushdown, same partial aggregation). EXTEND adds the computed
    revenue column mid-pipe (the pipe-world SELECT-with-new-columns),
    AGGREGATE ... GROUP BY replaces the projection+groupBy pair, and
    the trailing WHERE after AGGREGATE is pipe-HAVING."""
    register_views(spark, sf_dir, ["lineitem"])
    return spark.sql(
        """
        FROM lineitem
        |> WHERE l_quantity >= 10
        |> EXTEND l_extendedprice * (1 - l_discount) AS disc_price
        |> AGGREGATE count(*) AS n_items,
                     round(sum(disc_price), 2) AS revenue
           GROUP BY l_returnflag
        |> WHERE n_items > 100
        |> SELECT l_returnflag, n_items, revenue
        |> ORDER BY l_returnflag
        """
    )


@query(
    "sql_group_by_all_lateral",
    "§2 advanced SQL: GROUP BY ALL / ORDER BY ALL / lateral column aliases",
    """
    SELECT l_returnflag AS flag, l_linestatus AS status,
           count(*) AS n, round(sum(l_quantity), 2) AS qty,
           round(round(sum(l_quantity), 2) / count(*), 4) AS qty_per_item,
           round(round(round(sum(l_quantity), 2) / count(*), 4) * 2, 4)
             AS double_rate
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    ORDER BY 1, 2, 3, 4, 5, 6
    """,
)
def sql_group_by_all_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The analyst-ergonomics SQL sugar, proven to desugar to the
    exact classic plan: GROUP BY ALL infers the grouping keys from the
    non-aggregate select items, ORDER BY ALL sorts by every output
    column left-to-right, and lateral column aliases let later select
    items reference earlier ones (`qty_per_item` built from the `n`
    and `qty` aliases, then `double_rate` built from `qty_per_item` —
    a 2-deep alias chain Catalyst rewrites into nested projections).
    The oracle spells everything out long-hand (explicit keys, ordinal
    sort, re-expanded alias expressions), so the value hash proves the
    sugar changes nothing: same keys, same hash aggregate, same sort
    order. Lateral aliases matter at scale precisely because they are
    pure sugar — the rewrite duplicates the EXPRESSION, not the
    computation (one projection node, common subexpressions
    eliminated), unlike a self-join someone might write instead."""
    register_views(spark, sf_dir, ["lineitem"])
    return spark.sql(
        """
        SELECT flag, status, n, qty,
               round(qty / n, 4) AS qty_per_item,
               round(qty_per_item * 2, 4) AS double_rate
        FROM (
          SELECT l_returnflag AS flag, l_linestatus AS status,
                 count(*) AS n, round(sum(l_quantity), 2) AS qty
          FROM lineitem
          GROUP BY ALL
        )
        ORDER BY ALL
        """
    )


@query(
    "ts_user_streaks",
    "§2.5/§5.2 gaps-and-islands: longest consecutive-active-day streak per user",
    """
    WITH days AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ), tagged AS (
      SELECT user_id, day,
             day - CAST(row_number() OVER (PARTITION BY user_id ORDER BY day)
                        AS INTEGER) AS island
      FROM days
    ), islands AS (
      SELECT user_id, island, count(*) AS len, min(day) AS start_day
      FROM tagged GROUP BY 1, 2
    )
    SELECT user_id,
           CAST(sum(len) AS BIGINT) AS n_active_days,
           CAST(count(*) AS BIGINT) AS n_streaks,
           CAST(max(len) AS BIGINT) AS longest_streak,
           CAST(min(start_day) FILTER (WHERE len = (
             SELECT max(i2.len) FROM islands i2 WHERE i2.user_id = islands.user_id
           )) AS VARCHAR) AS longest_start
    FROM islands GROUP BY user_id
    """,
)
def ts_user_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The gaps-and-islands classic: a user's consecutive-active-day
    runs found WITHOUT self-joins or iteration — subtract the per-user
    row_number from the calendar day and every consecutive run
    collapses to one constant "island" key (dates and row numbers both
    advance by 1 inside a run, so their difference is flat). One
    shuffle on user_id: the distinct (user, day) collapse, the
    per-user ordered window, and both group-bys all share that
    partitioning, and window state is bounded by one user's active
    days. Per user: total active days, number of streaks, the longest
    streak, and the start date of the longest (earliest wins ties —
    min_by on the (negated length, date) pair, which the oracle
    mirrors with a correlated max filter). The island trick is THE
    scalable form of streak analytics — the naive LEFT JOIN
    "yesterday exists?" chain is another full join per step."""
    ev = load(spark, sf_dir, "events")
    days = ev.select("user_id", F.to_date("ts").alias("day")).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    tagged = days.withColumn(
        "island", F.date_sub(F.col("day"), F.row_number().over(w))
    )
    islands = tagged.groupBy("user_id", "island").agg(
        F.count(F.lit(1)).alias("len"), F.min("day").alias("start_day")
    )
    return islands.groupBy("user_id").agg(
        F.sum("len").alias("n_active_days"),
        F.count(F.lit(1)).alias("n_streaks"),
        F.max("len").alias("longest_streak"),
        F.min_by(
            F.col("start_day"), F.struct(F.negate(F.col("len")), F.col("start_day"))
        )
        .cast("string")
        .alias("longest_start"),
    )


@query(
    "ts_seasonal_decompose",
    "§2.5/§5.2 classical decomposition: trend (7-day MA) + weekday seasonal + residual",
    """
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(sum(CAST(round(value * 1000000) AS BIGINT)) AS BIGINT) AS y
      FROM events GROUP BY 1
    ), t AS (
      SELECT day, y, (day - DATE '1970-01-01') % 7 AS dow,
             CASE WHEN count(*) OVER w7 = 7
                  THEN CAST(sum(y) OVER w7 AS BIGINT) END AS tx7
      FROM daily
      WINDOW w7 AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
    ), seas AS (
      SELECT dow, CAST(sum(7 * y - tx7) AS BIGINT) AS sdx7,
             count(*) AS cnt
      FROM t WHERE tx7 IS NOT NULL GROUP BY 1
    )
    SELECT CAST(t.day AS VARCHAR) AS day,
           round(t.y / 1000000.0, 2) AS observed,
           round(t.tx7 / 7.0 / 1000000.0, 2) AS trend,
           round(s.sdx7 / (s.cnt * 7.0) / 1000000.0, 2) AS seasonal,
           round(t.y / 1000000.0 - t.tx7 / 7.0 / 1000000.0
                 - s.sdx7 / (s.cnt * 7.0) / 1000000.0, 2) AS residual
    FROM t JOIN seas s ON t.dow = s.dow
    """,
)
def ts_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive decomposition of the daily revenue series:
    trend = centered 7-point moving average (NULL at the edges — head
    re-use would bias the weekday means), seasonal = per-weekday mean
    of the detrended series, residual = the rest. Built scale-first:
    the raw events collapse to ONE ROW PER DAY in the first hash agg,
    so the ordered window runs on a calendar-bounded table (30 rows
    here, ~36,500 for a century) — window size is set by time, not
    data volume, which is what makes a global ORDER BY day frame
    acceptable. Exactness: daily sums are integer micro-units, the MA
    is kept as the exact 7-day integer sum (tx7), the detrended series
    as exact 7y - tx7, and the weekday means as (integer sum, count)
    pairs — every float is a FIXED formula over exact integers, so
    round(2) is bit-stable across engines and partitionings. Weekday
    is epoch-day mod 7 (portable; engines disagree on dow numbering).
    The seasonal join broadcasts 7 rows."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum(F.round(F.col("value") * 1_000_000).cast("bigint")).alias("y")
    )
    w7 = Window.orderBy("day").rowsBetween(-3, 3)
    t = daily.select(
        "day",
        "y",
        (F.datediff("day", F.lit("1970-01-01").cast("date")) % 7).alias("dow"),
        F.when(F.count(F.lit(1)).over(w7) == 7, F.sum("y").over(w7)).alias("tx7"),
    )
    seas = (
        t.filter(F.col("tx7").isNotNull())
        .groupBy("dow")
        .agg(
            F.sum(7 * F.col("y") - F.col("tx7")).alias("sdx7"),
            F.count(F.lit(1)).alias("cnt"),
        )
    )
    j = t.join(F.broadcast(seas), "dow")
    trend = F.col("tx7") / 7.0 / 1_000_000.0
    seasonal = F.col("sdx7") / (F.col("cnt") * 7.0) / 1_000_000.0
    obs = F.col("y") / 1_000_000.0
    return j.select(
        F.col("day").cast("string").alias("day"),
        F.round(obs, 2).alias("observed"),
        F.round(trend, 2).alias("trend"),
        F.round(seasonal, 2).alias("seasonal"),
        F.round(obs - trend - seasonal, 2).alias("residual"),
    )


@query(
    "sql_execute_immediate",
    "§2 advanced SQL: EXECUTE IMMEDIATE (dynamic SQL with bound parameters)",
    """
    SELECT o_orderpriority,
           count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS revenue
    FROM orders
    WHERE o_totalprice < 150000.0
    GROUP BY o_orderpriority
    """,
)
def sql_execute_immediate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4's EXECUTE IMMEDIATE — dynamic SQL built as a string at
    runtime but with VALUES BOUND AS PARAMETERS (`USING 150000.0 AS
    cap`), the injection-safe form of query-by-string: the parameter
    is a typed literal in the plan, never text-spliced, so a
    malicious value cannot change the statement shape — and because
    it lands as a literal, Catalyst still constant-folds and pushes
    `o_totalprice < 150000.0` into the parquet scan exactly as if the
    query were static. The statement text itself comes from a
    variable (the dashboard/stored-procedure shape SQL scripting
    pairs with). The oracle is the equivalent static SQL, proving
    dynamic dispatch is plan-neutral."""
    register_views(spark, sf_dir, ["orders"])
    stmt = (
        "SELECT o_orderpriority, count(*) AS n_orders,"
        " round(sum(o_totalprice), 2) AS revenue"
        " FROM orders WHERE o_totalprice < :cap GROUP BY o_orderpriority"
    )
    spark.sql("DECLARE OR REPLACE VARIABLE sls_stmt STRING")
    spark.sql("SET VAR sls_stmt = ?", args=[stmt])
    return spark.sql("EXECUTE IMMEDIATE sls_stmt USING 150000.0 AS cap")


@query(
    "sql_transpose",
    "§2.2 Spark-4 DataFrame.transpose (rows ↔ columns pivot of a summary table)",
    """
    WITH agg AS (
      SELECT l_returnflag,
             round(sum(l_quantity), 2) AS sum_qty,
             round(sum(l_extendedprice), 2) AS sum_price,
             round(avg(l_discount), 4) AS avg_disc
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT 'sum_qty' AS key,
           max(CASE WHEN l_returnflag = 'A' THEN sum_qty END) AS A,
           max(CASE WHEN l_returnflag = 'N' THEN sum_qty END) AS N,
           max(CASE WHEN l_returnflag = 'R' THEN sum_qty END) AS R
    FROM agg
    UNION ALL
    SELECT 'sum_price',
           max(CASE WHEN l_returnflag = 'A' THEN sum_price END),
           max(CASE WHEN l_returnflag = 'N' THEN sum_price END),
           max(CASE WHEN l_returnflag = 'R' THEN sum_price END)
    FROM agg
    UNION ALL
    SELECT 'avg_disc',
           max(CASE WHEN l_returnflag = 'A' THEN avg_disc END),
           max(CASE WHEN l_returnflag = 'N' THEN avg_disc END),
           max(CASE WHEN l_returnflag = 'R' THEN avg_disc END)
    FROM agg
    """,
)
def sql_transpose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4's ``DataFrame.transpose`` (VERDICT r7 item 5): flip a
    per-flag summary so metrics become rows and flags become columns —
    the report-formatting step analysts do after every rollup. The
    transpose index column is the first column (l_returnflag), whose
    values (A/N/R, the full TPC-H domain) become the output columns.
    Safe EXACTLY because the input is a post-aggregation summary table
    (one row per flag): transpose collects the index values to the
    driver to name columns, so it is a metadata-scale operation here —
    never applied to a fact table. Aggregates are rounded before the
    flip so the transposed doubles hash identically."""
    li = load(spark, sf_dir, "lineitem")
    agg = (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
        )
        .orderBy("l_returnflag")
    )
    return agg.transpose()


@query(
    "sql_tablesample",
    "§2.2 TABLESAMPLE (x PERCENT) REPEATABLE(seed) — rows-only",
    None,
)
def sql_tablesample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL ``TABLESAMPLE (10 PERCENT) REPEATABLE(42)`` (VERDICT r7
    item 5) — the declarative cousin of df.sample(seed=) that
    sample_seeded covers. Bernoulli per-row sampling seeded per
    partition: deterministic for a fixed input layout but not
    reproducible cross-engine, hence rows-only (the same justification
    as sample_seeded). The aggregate shape keeps the driver row small;
    the sampling predicate evaluates at the scan, so the plan never
    materializes the unsampled rows. Property tests
    (tests/test_sql_misc.py) pin the fraction bounds and seed
    repeatability."""
    register_views(spark, sf_dir, ["lineitem"])
    return spark.sql(
        """
        SELECT l_returnflag, count(*) AS n_sampled
        FROM lineitem TABLESAMPLE (10 PERCENT) REPEATABLE (42)
        GROUP BY l_returnflag
        """
    )


@query(
    "sql_udf_scalar_table",
    "§2.10 Spark-4 SQL UDF + SQL UDTF (CREATE FUNCTION ... RETURN)",
    """
    WITH seg_orders AS (
      SELECT c.c_mktsegment AS segment, o.o_orderkey, o.o_totalprice,
             round(o.o_totalprice * CASE WHEN o.o_totalprice > 200000
                                         THEN 0.9 ELSE 1.0 END, 2)
               AS discounted
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ),
    ranked AS (
      SELECT segment, o_orderkey, discounted,
             row_number() OVER (PARTITION BY segment
                                ORDER BY discounted DESC, o_orderkey) AS rn
      FROM seg_orders
    )
    SELECT segment, o_orderkey, discounted, CAST(rn AS INT) AS rn
    FROM ranked WHERE rn <= 3
    """,
)
def sql_udf_scalar_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4's SQL-language UDFs (CREATE FUNCTION ... RETURN expr)
    and SQL UDTFs (... RETURNS TABLE) — reusable logic DECLARED in SQL
    so Catalyst inlines it into the calling plan: unlike a Python UDF
    there is no serialization wall, the scalar body constant-folds and
    pushes down like any expression, and the table function is just a
    named parameterized subquery. The scalar UDF applies a big-order
    discount; the UDTF returns the top-3 discounted orders per market
    segment (window inside the function body). The oracle inlines both
    bodies — passing proves the function indirection is plan-neutral."""
    register_views(spark, sf_dir, ["orders", "customer"])
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION sls_discounted(price DOUBLE)
        RETURNS DOUBLE
        RETURN round(price * CASE WHEN price > 200000 THEN 0.9 ELSE 1.0 END, 2)
        """
    )
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION sls_top_per_segment(k INT)
        RETURNS TABLE (segment STRING, o_orderkey BIGINT, discounted DOUBLE,
                       rn INT)
        RETURN
          SELECT segment, o_orderkey, discounted, CAST(rn AS INT)
          FROM (
            SELECT c.c_mktsegment AS segment, o.o_orderkey,
                   sls_discounted(o.o_totalprice) AS discounted,
                   row_number() OVER (
                     PARTITION BY c.c_mktsegment
                     ORDER BY sls_discounted(o.o_totalprice) DESC, o.o_orderkey
                   ) AS rn
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
          ) WHERE rn <= k
        """
    )
    return spark.sql("SELECT * FROM sls_top_per_segment(3)")


@query(
    "sql_distribute_cluster_by",
    "§2.2/§4 DISTRIBUTE BY / SORT BY physical-layout clauses",
    """
    SELECT l_suppkey, l_orderkey, l_linenumber,
           round(l_extendedprice, 2) AS price
    FROM lineitem WHERE l_orderkey % 25 = 0
    """,
)
def sql_distribute_cluster_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``DISTRIBUTE BY`` + ``SORT BY`` (≡ CLUSTER BY when the keys
    match) — the SQL clauses that declare a PHYSICAL layout without
    changing the result set: rows hash-shuffle on l_suppkey and sort
    within each partition, which is exactly the pre-layout a
    downstream per-supplier merge join or windowed read wants (the
    SQL-surface cousin of repartition().sortWithinPartitions()).
    The result ROWS are layout-independent — the oracle is a plain
    SELECT and the driver's order-insensitive hash proves the clauses
    are semantically free; the Exchange+Sort they add is visible in
    the plan (asserted in tests/test_plans.py grep style via
    docstring contract, not result)."""
    register_views(spark, sf_dir, ["lineitem"])
    return spark.sql(
        """
        SELECT l_suppkey, l_orderkey, l_linenumber,
               round(l_extendedprice, 2) AS price
        FROM lineitem WHERE l_orderkey % 25 = 0
        DISTRIBUTE BY l_suppkey SORT BY l_suppkey, l_orderkey, l_linenumber
        """
    )


@query(
    "sql_identifier_clause",
    "§2.2 IDENTIFIER() clause (injection-safe dynamic table/column names)",
    """
    SELECT o_orderpriority AS grp,
           count(*) AS n,
           round(sum(o_totalprice), 2) AS total
    FROM orders GROUP BY o_orderpriority
    """,
)
def sql_identifier_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4's ``IDENTIFIER(:param)`` clause — the missing half of
    parameterized SQL (sql_named_parameters binds VALUES; IDENTIFIER
    binds NAMES): table and column references supplied as parameters
    are resolved as identifiers, not spliced as strings, so dynamic
    report builders ("group by whatever column the user picked") stop
    being injection vectors. The grouping column, aggregated column
    AND table name all arrive via parameters; the oracle is the
    static query, proving identifier indirection is plan-neutral
    (constant-folded at analysis, same pushdown)."""
    register_views(spark, sf_dir, ["orders"])
    return spark.sql(
        """
        SELECT IDENTIFIER(:grp_col) AS grp,
               count(*) AS n,
               round(sum(IDENTIFIER(:agg_col)), 2) AS total
        FROM IDENTIFIER(:tbl)
        GROUP BY IDENTIFIER(:grp_col)
        """,
        args={"grp_col": "o_orderpriority", "agg_col": "o_totalprice", "tbl": "orders"},
    )


@query(
    "pandas_api_groupby_merge",
    "§2.10 pandas-on-Spark API (ps.read_parquet → groupby/agg → merge → to_spark)",
    """
    WITH seg AS (
      SELECT c.c_mktsegment AS segment,
             count(*) AS n_orders,
             round(sum(o.o_totalprice), 2) AS total
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY c.c_mktsegment
    ),
    cust AS (
      SELECT c_mktsegment AS segment, count(*) AS n_customers FROM customer
      GROUP BY c_mktsegment
    )
    SELECT seg.segment, seg.n_orders, seg.total, cust.n_customers,
           round(seg.total / cust.n_customers, 4) AS total_per_customer
    FROM seg JOIN cust ON seg.segment = cust.segment
    """,
)
def pandas_api_groupby_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pandas API on Spark (``pyspark.pandas``) — the surface
    pandas users migrate through, worth covering because its frames
    COMPILE TO THE SAME Catalyst plans as the DataFrame API (groupby →
    partial+final hash agg, merge → join), so "pandas at 100 TB" is
    real as long as index machinery is kept cheap: the distributed
    default index avoids the monotonically-increasing-id shuffle, and
    ``as_index=False`` + ``to_spark()`` round-trips without an index
    column at all. One groupby-agg per side, one merge, one derived
    column — the canonical pandas workflow — then back to a plain
    DataFrame for the oracle compare."""
    import pyspark.pandas as ps

    from spark_lineage_spark.tables import table_path

    prev = ps.get_option("compute.default_index_type")
    ps.set_option("compute.default_index_type", "distributed")
    try:
        orders = ps.read_parquet(table_path(sf_dir, "orders"), index_col="o_orderkey")
        cust = ps.read_parquet(table_path(sf_dir, "customer"), index_col="c_custkey")
        merged = orders.merge(
            cust[["c_mktsegment"]].rename(columns={"c_mktsegment": "segment"}),
            left_on="o_custkey",
            right_index=True,
        )
        seg = merged.groupby("segment", as_index=False).agg(
            n_orders=("o_totalprice", "count"), total=("o_totalprice", "sum")
        )
        ncust = (
            cust.rename(columns={"c_mktsegment": "segment"})
            .groupby("segment", as_index=False)
            .agg(n_customers=("segment", "count"))
        )
        out = seg.merge(ncust, on="segment")
        out["total"] = out["total"].round(2)
        out["total_per_customer"] = (out["total"] / out["n_customers"]).round(4)
        return out.to_spark().select(
            "segment", "n_orders", "total", "n_customers", "total_per_customer"
        )
    finally:
        ps.set_option("compute.default_index_type", prev)


@query(
    "agg_percentile_within_group",
    "§2.4 SQL-standard percentile_cont / percentile_disc WITHIN GROUP",
    """
    SELECT l_returnflag,
           round(quantile_cont(l_quantity, 0.5), 4) AS median_cont,
           CAST(quantile_disc(l_quantity, 0.25) AS DOUBLE) AS q25_disc,
           round(quantile_cont(l_extendedprice, 0.9), 4) AS p90_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_percentile_within_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ANSI ``WITHIN GROUP (ORDER BY ...)`` ordered-set aggregate
    syntax for percentile_cont (linear interpolation) and
    percentile_disc (an actual data value) — the standard-SQL spelling
    of agg_percentile_median's percentile()/median(). Interpolation
    and discrete-pick semantics line up exactly with DuckDB's
    quantile_cont/quantile_disc; integer-valued l_quantity keeps the
    interpolated medians on exactly representable halves."""
    register_views(spark, sf_dir, ["lineitem"])
    return spark.sql(
        """
        SELECT l_returnflag,
               round(percentile_cont(0.5) WITHIN GROUP (ORDER BY l_quantity), 4)
                 AS median_cont,
               percentile_disc(0.25) WITHIN GROUP (ORDER BY l_quantity)
                 AS q25_disc,
               round(percentile_cont(0.9) WITHIN GROUP (ORDER BY l_extendedprice), 4)
                 AS p90_price
        FROM lineitem GROUP BY l_returnflag
        """
    )


@query(
    "subq_quantified_any_all",
    "§2.3 quantified comparison subquery (> ALL / > ANY) via min-max decorrelation",
    """
    SELECT c.c_custkey,
           c.c_acctbal > ALL (SELECT o.o_totalprice / 100 FROM orders o
                              WHERE o.o_custkey = c.c_custkey) AS gt_all,
           c.c_acctbal > ANY (SELECT o.o_totalprice / 100 FROM orders o
                              WHERE o.o_custkey = c.c_custkey) AS gt_any
    FROM customer c
    """,
)
def subq_quantified_any_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI quantified comparison subqueries (`x > ALL (S)`,
    `x > ANY (S)`): Spark 4's parser does not accept the syntax
    (probed: PARSE_SYNTAX_ERROR), so this is the classic decorrelated
    rewrite every engine performs internally — `> ALL` ⇔ `x > max(S)`
    (vacuously TRUE on empty S), `> ANY` ⇔ `x > min(S)` (FALSE on
    empty S) — legal here because the subquery column is non-null.
    One aggregation of orders per custkey plus ONE left join replaces
    a per-row correlated scan; at 100 TB the agg is map-side partial
    on the join key and the join shuffles each side once. The DuckDB
    oracle runs the native quantified form, so this row is literal
    cross-engine parity for the ALL/ANY semantics including the
    empty-set edge (customers with no orders)."""
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    bounds = (
        load(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.max(F.col("o_totalprice") / 100).alias("mx"),
            F.min(F.col("o_totalprice") / 100).alias("mn"),
        )
    )
    j = cust.join(bounds, cust.c_custkey == bounds.o_custkey, "left")
    return j.select(
        "c_custkey",
        (F.col("mx").isNull() | (F.col("c_acctbal") > F.col("mx"))).alias("gt_all"),
        F.coalesce(F.col("c_acctbal") > F.col("mn"), F.lit(False)).alias("gt_any"),
    )


@query(
    "sql_rebalance_hints",
    "§2.3/§4 partitioning hints (REBALANCE / REPARTITION(n,col) / COALESCE) as SQL hints",
    """
    SELECT l_returnflag, l_linestatus, count(*) AS n,
           CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
             AS revenue_cents
    FROM lineitem GROUP BY l_returnflag, l_linestatus
    """,
)
def sql_rebalance_hints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL spelling of the layout-control verbs: REBALANCE(cols)
    (AQE-assisted even-sized output partitions keyed by cols — the
    small-files killer before a write), REPARTITION(n, col) (exact
    hash layout, the pre-shuffle co-location move), COALESCE(n)
    (shuffle-free partition narrowing on the tiny aggregate). Hints
    change ONLY the physical exchange structure, so the oracle is the
    plain aggregate — result invariance under relayout is the point —
    and tests/test_round8_ops.py asserts the rebalance + coalesce
    exchanges actually appear in the physical plan. At 100 TB these
    three verbs, as hints, are how SQL-only pipelines fix skewed
    writes and small-file explosions without touching engine code."""
    register_views(spark, sf_dir, ["lineitem"])
    return spark.sql(
        """
        WITH src AS (
          SELECT /*+ REBALANCE(l_returnflag) */
                 l_returnflag, l_linestatus, l_extendedprice FROM lineitem
        ), rep AS (
          SELECT /*+ REPARTITION(8, l_returnflag) */ * FROM src
        ), agg AS (
          SELECT l_returnflag, l_linestatus, count(*) AS n,
                 CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
                      AS BIGINT) AS revenue_cents
          FROM rep GROUP BY l_returnflag, l_linestatus
        )
        SELECT /*+ COALESCE(1) */ * FROM agg
        """
    )


@query(
    "ts_business_days",
    "§2.5/§5.2 business-day arithmetic (closed-form workday count, no calendar explode)",
    """
    WITH j AS (
      SELECT l_returnflag,
             date_diff('day', DATE '1970-01-05', CAST(l.l_shipdate AS DATE)) AS d2,
             date_diff('day', DATE '1970-01-05', CAST(o.o_orderdate AS DATE)) AS d1
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ), g AS (
      SELECT l_returnflag,
             ((d2 // 7) * 5 + least(d2 % 7 + 1, 5))
             - ((d1 // 7) * 5 + least(d1 % 7 + 1, 5)) AS busdays
      FROM j
    )
    SELECT l_returnflag, count(*) AS n,
           CAST(sum(busdays) AS BIGINT) AS total_busdays,
           round(CAST(sum(busdays) AS DOUBLE) / count(*), 4) AS avg_busdays,
           CAST(min(busdays) AS BIGINT) AS min_busdays,
           CAST(max(busdays) AS BIGINT) AS max_busdays
    FROM g GROUP BY l_returnflag
    """,
)
def ts_business_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Workdays (Mon–Fri) between order placement and line shipment —
    the SLA metric — computed CLOSED-FORM: anchor both dates to a
    known Monday (1970-01-05), count business days from the anchor as
    (weeks*5 + min(partial_week+1, 5)), subtract. No calendar-spine
    explode, no per-day join — the per-row cost is four integer ops,
    so the 100 TB plan is scan → map → the aggregate you already
    wanted (vs the gap-fill spine's O(rows × days) blow-up; keep the
    spine for irregular holiday calendars, use closed-form for the
    fixed week). Integer division/modulo on the anchored day counts
    are positive here (all dates > anchor), so Spark's div/% and
    DuckDB's //,% agree exactly; the averaged output divides exact
    integer sums."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_returnflag", "l_shipdate")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    j = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_returnflag",
        F.datediff(F.col("l_shipdate").cast("date"), F.lit("1970-01-05").cast("date")).alias("d2"),
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1970-01-05").cast("date")).alias("d1"),
    )
    bus = (
        (F.expr("d2 div 7") * 5 + F.least(F.col("d2") % 7 + 1, F.lit(5)))
        - (F.expr("d1 div 7") * 5 + F.least(F.col("d1") % 7 + 1, F.lit(5)))
    ).alias("busdays")
    g = j.select("l_returnflag", bus)
    return g.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum("busdays").cast("bigint").alias("total_busdays"),
        F.round(F.sum("busdays").cast("double") / F.count("*"), 4).alias("avg_busdays"),
        F.min("busdays").cast("bigint").alias("min_busdays"),
        F.max("busdays").cast("bigint").alias("max_busdays"),
    )


@query(
    "pandas_api_rolling",
    "§2.5 pandas API on Spark: groupby().rolling() window (trailing mean per group)",
    """
    WITH daily AS (
      SELECT l_returnflag,
             CAST(date_trunc('day', l_shipdate) AS DATE) AS day,
             CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS rev_cents
      FROM lineitem GROUP BY 1, 2
    )
    SELECT l_returnflag, day,
           round(avg(CAST(rev_cents AS DOUBLE)) OVER (
             PARTITION BY l_returnflag ORDER BY day
             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4) AS rev_7d_avg
    FROM daily
    """,
)
def pandas_api_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pandas rolling-window idiom — groupby('flag').rolling(7,
    min_periods=1).mean() — on pyspark.pandas, compiling to the SAME
    Window(ROWS 6 PRECEDING) plan the SQL oracle states, which is the
    whole migration pitch: pandas spelling, Catalyst execution. The
    day column is kept as the frame INDEX so sort_index() fixes the
    within-group order the rolling walk sees (indexes are metadata,
    not a shuffle), and min_periods=1 reproduces SQL's expanding
    window head instead of emitting NaNs. Input is pre-aggregated to
    (flag, day) grain in the DataFrame API first — the pandas layer
    only ever sees the small series, the pattern that keeps pandas-
    on-Spark viable at 100 TB."""
    import pyspark.pandas as ps

    daily = (
        load(spark, sf_dir, "lineitem")
        .groupBy(
            "l_returnflag",
            F.date_trunc("day", "l_shipdate").cast("date").alias("day"),
        )
        .agg(
            F.sum(F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("bigint")).alias(
                "rev_cents"
            )
        )
    )
    psdf = daily.pandas_api(index_col="day")
    rolled = (
        psdf.sort_index()
        .groupby("l_returnflag")
        .rolling(7, min_periods=1)
        .mean()
        .reset_index()
    )
    return rolled.to_spark().select(
        "l_returnflag", "day", F.round(F.col("rev_cents"), 4).alias("rev_7d_avg")
    )


@query(
    "pandas_api_merge_asof",
    "§2.3 pandas API on Spark: merge_asof (the pandas spelling of the as-of join)",
    """
    WITH c AS (
      SELECT user_id, max(event_id) AS click_id, date_trunc('microseconds', ts) AS tsu
      FROM events WHERE event_type = 'click'
      GROUP BY user_id, date_trunc('microseconds', ts)
    ),
    p AS (
      SELECT user_id, event_id, date_trunc('microseconds', ts) AS tsu
      FROM events WHERE event_type = 'purchase'
    )
    SELECT p.event_id AS purchase_id, c.click_id AS click_id
    FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND c.tsu <= p.tsu
    """,
)
def pandas_api_merge_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pandas-API spelling of join_asof's latest-click-<=-purchase
    lookup (backward direction, per-user grouping, <= inclusive,
    left-preserving on no match), via the UNION + groupby-ffill
    idiom: concat both sides, sort by (user, ts, kind) with clicks
    ordered before same-microsecond purchases (the inclusive-<= tie
    rule stated explicitly, as join_asof's oracle does with QUALIFY),
    forward-fill click_id within each user, keep the purchase rows.
    Compiles to one range-partitioned sort + one per-user window —
    linear and parallel at any SF.

    NOT ps.merge_asof itself, deliberately (round-14 finding):
    pyspark.pandas 4.1 lowers merge_asof through Spark's _joinAsOf
    rewrite, whose inner stage is a distinct-left-values x right
    BroadcastNestedLoopJoin on the bare ts inequality (the user
    equi-key is applied only AFTER the quadratic join) — measured as
    a multi-hour hang at sf0.1 (~4e9 single-stage comparisons) in
    the r14 multi-SF sweep.  The ffill spelling is the same pandas
    migration story with the plan shape our native asof_join uses.
    Clicks are pre-deduplicated to one row per (user, microsecond)
    with the highest event_id BEFORE the asof so tie semantics are
    explicit rather than inherited from sort stability.  click_id
    rides through the pandas layer as float64 (NaN = no match) and
    casts back to bigint — exact below 2^53, documented."""
    import pyspark.pandas as ps

    e = load(spark, sf_dir, "events")
    clicks = (
        e.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_id"))
        .withColumn("kind", F.lit(0))
    )
    purch = (
        e.filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            "ts",
            F.col("event_id").alias("purchase_id"),
            F.lit(1).alias("kind"),
        )
    )
    u = ps.concat(
        [clicks.pandas_api(), purch.pandas_api()], ignore_index=True
    ).sort_values(["user_id", "ts", "kind"])
    u["click_id"] = u.groupby("user_id")["click_id"].ffill()
    r = u[u["kind"] == 1]
    return r.to_spark().select(
        F.col("purchase_id").cast("long").alias("purchase_id"),
        F.col("click_id").cast("long").alias("click_id"),
    )


@query(
    "ts_session_window_dynamic_gap",
    "§2.5/§2.9 session_window with a DYNAMIC per-event gap (gap depends on event type)",
    """
    WITH g AS (
      SELECT user_id, event_id, epoch_us(date_trunc('microseconds', ts)) AS tsu,
             epoch_us(date_trunc('microseconds', ts))
               + CASE WHEN event_type = 'purchase' THEN 2700000000 ELSE 900000000 END
               AS end_u
      FROM events
    ), m AS (
      SELECT user_id, event_id, tsu, end_u,
             max(end_u) OVER (PARTITION BY user_id ORDER BY tsu, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS prev_end
      FROM g
    ), marked AS (
      SELECT user_id, event_id, tsu, end_u,
             CASE WHEN prev_end IS NULL OR tsu > prev_end THEN 1 ELSE 0 END AS is_new
      FROM m
    ), sess AS (
      SELECT user_id, tsu, end_u,
             sum(is_new) OVER (PARTITION BY user_id ORDER BY tsu, event_id
                               ROWS UNBOUNDED PRECEDING) AS sid
      FROM marked
    )
    SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
           strftime(make_timestamp(min(tsu)), '%Y-%m-%d %H:%M:%S') AS sess_start,
           strftime(make_timestamp(max(end_u)), '%Y-%m-%d %H:%M:%S') AS sess_end
    FROM sess GROUP BY user_id, sid
    """,
)
def ts_session_window_dynamic_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """session_window's Spark-4 DYNAMIC gap: each event extends its
    session by its OWN timeout — purchases hold the session open 45
    minutes, everything else 15 — so checkout flows don't fragment
    while browse noise still splits. Merge semantics are CLOSED at
    the boundary (probed: an event landing exactly at the previous
    max end MERGES and re-extends the session), which the oracle
    replays as a running max of window ends per user: new session ⇔
    tsu > max(prior ends) — ordered by (tsu, event_id) against
    same-microsecond ties per the house tie-break rule. Exact µs
    integers throughout. In batch mode this plans as one Window +
    hash agg per user (no state store); the same expression is valid
    under readStream with a watermark, where the dynamic gap is
    evaluated per update — the session-shape every checkout-
    attribution stream needs."""
    ev = load(spark, sf_dir, "events")
    gap = F.when(F.col("event_type") == "purchase", "45 minutes").otherwise("15 minutes")
    win = F.session_window("ts", gap)
    return (
        ev.groupBy(win.alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("n_events").cast("bigint").alias("n_events"),
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("sess_start"),
            F.date_format("w.end", "yyyy-MM-dd HH:mm:ss").alias("sess_end"),
        )
    )


@query(
    "sql_session_variables",
    "§2.2/§2.12 SQL session variables (DECLARE VARIABLE / SET VAR, data-derived, injection-safe)",
    """
    WITH cutoff AS (
      SELECT CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) // count(*)
                  AS BIGINT) AS c
      FROM orders
    )
    SELECT o_orderstatus, count(*) AS n,
           CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
             AS total_cents
    FROM orders, cutoff
    WHERE CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) > cutoff.c
    GROUP BY o_orderstatus
    """,
)
def sql_session_variables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 session variables — the catalog-native way to thread a
    DATA-DERIVED scalar between statements without string
    interpolation (the dynamic-SQL injection hole) or a temp view:
    DECLARE VARIABLE, SET VAR from a scalar subquery (here the exact
    integer-cents mean order value), then reference it like a literal
    in later queries; Catalyst folds the variable into the plan as a
    constant, so the filter is a plain pushable predicate. The oracle
    inlines the same scalar as a CTE. Integer floor-division keeps
    the cutoff exact (a double avg would make the comparison
    partition-order sensitive at the boundary). DROP afterwards keeps
    the session catalog clean for the next query."""
    register_views(spark, sf_dir, ["orders"])
    spark.sql("DECLARE OR REPLACE VARIABLE sls_cutoff_cents BIGINT DEFAULT 0")
    spark.sql(
        """
        SET VAR sls_cutoff_cents = (
          SELECT CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) DIV count(*)
                      AS BIGINT)
          FROM orders
        )
        """
    )
    out = spark.sql(
        """
        SELECT o_orderstatus, count(*) AS n,
               CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
                 AS total_cents
        FROM orders
        WHERE CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) > sls_cutoff_cents
        GROUP BY o_orderstatus
        """
    )
    # variable references resolve to literals at ANALYSIS time, so the
    # plan stays valid after the DROP (asserted by the driver collect)
    spark.sql("DROP TEMPORARY VARIABLE IF EXISTS sls_cutoff_cents")
    return out


@query(
    "profile_freshness_lag",
    "§2.4/§2.12 data-freshness profiling (per-source max-timestamp lag vs global head)",
    """
    WITH m AS (
      SELECT event_type,
             max(epoch_us(date_trunc('microseconds', ts))) AS mx,
             count(*) AS n
      FROM events GROUP BY event_type
    ), g AS (SELECT max(mx) AS gmx FROM m)
    SELECT event_type, n,
           CAST((gmx - mx) // 1000000 AS BIGINT) AS lag_s,
           CASE WHEN gmx - mx < 3600000000 THEN 'fresh'
                WHEN gmx - mx < 86400000000 THEN 'day-old'
                ELSE 'stale' END AS freshness
    FROM m CROSS JOIN g
    """,
)
def profile_freshness_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The first dashboard every ingest pipeline grows: how far behind
    the global high-water mark is each source's newest row? One
    scan → per-type (max ts, count) partials, a 1-row global max
    broadcast back, lag in EXACT integer microseconds (floor-divided
    to seconds — no double timestamps), bucketed into the
    fresh/day-old/stale bands an alerting rule consumes. At 100 TB
    this is the map-side-partial MAX pattern: no row leaves the
    executor except k per-type rows, and the same shape extends to
    per-partition freshness by swapping the grouping key. The
    lineage-ops angle (§2.12): freshness is the operational half of
    provenance — WHICH input last moved, not just where data came
    from."""
    ev = load(spark, sf_dir, "events").select(
        "event_type", F.unix_micros(F.col("ts")).alias("tsu")
    )
    m = ev.groupBy("event_type").agg(
        F.max("tsu").alias("mx"), F.count("*").alias("n")
    )
    g = m.agg(F.max("mx").alias("gmx"))
    lag = F.col("gmx") - F.col("mx")
    return m.crossJoin(F.broadcast(g)).select(
        "event_type",
        "n",
        F.expr("(gmx - mx) div 1000000").cast("bigint").alias("lag_s"),
        F.when(lag < 3600000000, "fresh")
        .when(lag < 86400000000, "day-old")
        .otherwise("stale")
        .alias("freshness"),
    )


@query(
    "profile_join_fanout",
    "§2.4/§4 join fan-out diagnostics (predicted output rows == actual, per key class)",
    """
    WITH l AS (SELECT o_custkey AS k, count(*) AS nl FROM orders GROUP BY o_custkey),
    r AS (SELECT c_custkey AS k, count(*) AS nr FROM customer GROUP BY c_custkey),
    j AS (SELECT l.k, l.nl, r.nr, l.nl * r.nr AS fanout FROM l JOIN r USING (k))
    SELECT CAST(sum(fanout) AS BIGINT) AS predicted_rows,
           (SELECT count(*) FROM orders o JOIN customer c
             ON o.o_custkey = c.c_custkey) AS actual_rows,
           CAST(max(fanout) AS BIGINT) AS max_key_fanout,
           CAST(count(*) AS BIGINT) AS n_join_keys
    FROM j
    """,
)
def profile_join_fanout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pre-flight check that catches row-explosion joins BEFORE
    they run: per-key counts on both sides, fanout = nl·nr per key,
    Σ fanout = the join's exact output cardinality — verified here by
    actually running the join and matching the prediction (the oracle
    states both). The two count-aggregates are a tiny fraction of the
    join's cost (map-side partials, keys-only shuffle), so at 100 TB
    this runs as a cheap guard: a max_key_fanout in the millions says
    'salt this key' (profile_join_skew's remedy) and an unexpected
    predicted_rows says the join key isn't the grain you thought —
    both found by arithmetic, not by OOMing the shuffle."""
    o = load(spark, sf_dir, "orders").select(F.col("o_custkey").alias("k"))
    c = load(spark, sf_dir, "customer").select(F.col("c_custkey").alias("k"))
    l_cnt = o.groupBy("k").agg(F.count("*").alias("nl"))
    r_cnt = c.groupBy("k").agg(F.count("*").alias("nr"))
    j = l_cnt.join(r_cnt, "k").select(
        "k", (F.col("nl") * F.col("nr")).alias("fanout")
    )
    pred = j.agg(
        F.sum("fanout").cast("bigint").alias("predicted_rows"),
        F.max("fanout").cast("bigint").alias("max_key_fanout"),
        F.count("*").cast("bigint").alias("n_join_keys"),
    )
    actual = (
        load(spark, sf_dir, "orders")
        .join(
            load(spark, sf_dir, "customer"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .agg(F.count("*").alias("actual_rows"))
    )
    return pred.crossJoin(F.broadcast(actual)).select(
        "predicted_rows", "actual_rows", "max_key_fanout", "n_join_keys"
    )


@query(
    "pandas_api_resample",
    "§2.5 pandas API on Spark: resample('7D').sum() with zero-filled empty bins",
    """
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             CAST(sum(CAST(o_totalprice * 100 AS DECIMAL(38,0))) AS BIGINT) AS v
      FROM orders GROUP BY CAST(o_orderdate AS DATE)
    ),
    b AS (SELECT min(d) AS d0, max(d) AS dmax FROM daily),
    spine AS (
      SELECT b.d0 + CAST(7 * g.i AS INTEGER) AS bin_d
      FROM b, LATERAL (
        SELECT unnest(generate_series(0, datediff('day', b.d0, b.dmax) // 7)) AS i
      ) g
    ),
    binned AS (
      SELECT b.d0 + CAST(7 * (datediff('day', b.d0, daily.d) // 7) AS INTEGER) AS bin_d,
             CAST(sum(daily.v) AS BIGINT) AS v
      FROM daily CROSS JOIN b
      GROUP BY b.d0 + CAST(7 * (datediff('day', b.d0, daily.d) // 7) AS INTEGER)
    )
    SELECT CAST(spine.bin_d AS TIMESTAMP) AS day,
           CAST(COALESCE(binned.v, 0) AS DOUBLE) AS rev_cents
    FROM spine LEFT JOIN binned ON binned.bin_d = spine.bin_d
    """,
)
def pandas_api_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pandas resample idiom — set_index('day').resample('7D')
    .sum() — on pyspark.pandas: 7-day bins ANCHORED AT THE SERIES
    MINIMUM (the pandas origin convention, not ISO weeks), empty bins
    EMITTED and zero-filled (the full-spine semantics a SQL GROUP BY
    silently drops — the oracle rebuilds it with a generate_series
    spine + left join), and sums promoted to double with 0.0 fill,
    all exactly as pandas does.  'W' is unsupported by
    pyspark.pandas' resampler and index_col-based conversion trips an
    internal-column bug (both probed), so the op pins the supported
    spelling: default index -> set_index -> resample -> reset_index.
    Input is pre-aggregated to day grain in the DataFrame API first
    (cent-exact decimal sums), so the pandas layer only handles the
    O(days) series — the pattern that keeps pandas-on-Spark viable at
    100 TB; the bin computation itself compiles to a datediff
    expression on the day column, one hash agg, no window."""
    import pyspark.pandas as ps  # noqa: F401 (activates the pandas API)

    daily = (
        load(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderdate").cast("timestamp").alias("day"))
        .agg(
            F.sum((F.col("o_totalprice") * 100).cast("decimal(38,0)"))
            .cast("long")
            .alias("rev_cents")
        )
    )
    res = daily.pandas_api().set_index("day").resample("7D").sum().reset_index()
    return res.to_spark().select(
        F.col("index").alias("day"), F.col("rev_cents")
    )


# CDC change-envelope parse + apply — queued for the round-10 official
# run.  The envelope JSON is BUILT with explicit string concatenation
# (identical bytes in both engines — to_json field order / decimal
# formatting would diverge), then each engine parses it with its own
# JSON machinery and applies the batch.
_CDC_ENVELOPE_DUCK = """
WITH base AS (
  SELECT o_orderkey, o_orderstatus,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS price_cents
  FROM orders WHERE o_orderkey % 7 <> 0
),
env AS (
  SELECT concat('{"op":"',
                CASE WHEN o_orderkey % 7 = 0 THEN 'c'
                     WHEN o_orderkey % 5 = 0 THEN 'u'
                     ELSE 'd' END,
                '","id":', CAST(o_orderkey AS VARCHAR),
                ',"status":"', o_orderstatus,
                '","price_cents":',
                CAST(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
                     + CASE WHEN o_orderkey % 5 = 0 THEN 1000 ELSE 0 END
                     AS VARCHAR),
                '}') AS payload
  FROM orders WHERE o_orderkey % 7 = 0 OR o_orderkey % 5 = 0 OR o_orderkey % 3 = 0
),
parsed AS (
  SELECT json_extract_string(payload, '$.op') AS op,
         CAST(json_extract(payload, '$.id') AS BIGINT) AS id,
         json_extract_string(payload, '$.status') AS status,
         CAST(json_extract(payload, '$.price_cents') AS BIGINT) AS price_cents
  FROM env
),
applied AS (
  SELECT b.o_orderkey, b.o_orderstatus, b.price_cents
  FROM base b
  WHERE NOT EXISTS (SELECT 1 FROM parsed p
                    WHERE p.id = b.o_orderkey AND p.op IN ('u', 'd'))
  UNION ALL
  SELECT p.id, p.status, p.price_cents
  FROM parsed p
  WHERE p.op = 'c'
     OR (p.op = 'u' AND EXISTS (SELECT 1 FROM base b WHERE b.o_orderkey = p.id))
)
SELECT o_orderstatus,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(price_cents) AS BIGINT) AS total_cents
FROM applied GROUP BY o_orderstatus
"""


@query(
    "cdc_json_envelope_apply",
    "§2.19 CDC JSON change-envelope parse + apply (insert/update/delete batch)",
    _CDC_ENVELOPE_DUCK,
)
def cdc_json_envelope_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CDC INGESTION step the scd2/scd6/merge family starts
    after: a Debezium-shaped JSON change batch ('op' c/u/d + payload)
    is parsed with from_json against an explicit schema and applied
    to the base table — deletes and updates knock out their base
    rows (left anti join on the u/d key set), updates and inserts
    re-enter from the parsed payload (update rows only if their key
    exists in base — the consumer-side idempotence rule).  The
    envelope is BUILT by deterministic string concatenation so both
    engines parse byte-identical JSON (to_json field order and
    decimal formatting would silently diverge); price survives as
    exact integer cents through the JSON round-trip.

    Keys partition by modulus: %7=0 rows are new inserts (excluded
    from base), then %5=0 updates (+$10.00), then %3=0 deletes —
    CASE order makes the classes disjoint.  Shape at any SF: the
    apply is one anti join + one semi join on the key, both
    partial-agg'd batches; the final rollup is a 3-row hash agg.  At
    100 TB this is exactly the hourly-batch merge plan, with the
    envelope scan replaced by a Kafka/file source."""
    register_views(spark, sf_dir, ["orders"])
    # Optimization r14 (guide §2.5/§4.3): the JSON envelope build +
    # from_json parse (the bulk of this op) ran inside the single-file
    # scan task; repartition the RAW envelope rows below the payload
    # expression so the string/JSON work spreads across cores. At real
    # scale the scan is parallel and the hint is dropped.
    from spark_lineage_spark.operators.dedup import est_scan_partitions
    from spark_lineage_spark.tables import load as _load

    o = _load(spark, sf_dir, "orders")
    npart = spark.sparkContext.defaultParallelism
    hint = (
        f"/*+ REPARTITION({npart}) */" if npart > est_scan_partitions(o) else ""
    )
    return spark.sql(
        """
WITH base AS (
  SELECT o_orderkey, o_orderstatus,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS price_cents
  FROM orders WHERE o_orderkey % 7 <> 0
),
env AS (
  SELECT concat('{"op":"',
                CASE WHEN o_orderkey % 7 = 0 THEN 'c'
                     WHEN o_orderkey % 5 = 0 THEN 'u'
                     ELSE 'd' END,
                '","id":', CAST(o_orderkey AS STRING),
                ',"status":"', o_orderstatus,
                '","price_cents":',
                CAST(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
                     + CASE WHEN o_orderkey % 5 = 0 THEN 1000 ELSE 0 END
                     AS STRING),
                '}') AS payload
  FROM (SELECT __HINT__ o_orderkey, o_orderstatus, o_totalprice
        FROM orders
        WHERE o_orderkey % 7 = 0 OR o_orderkey % 5 = 0 OR o_orderkey % 3 = 0)
),
jp AS (
  SELECT from_json(payload,
                   'op STRING, id BIGINT, status STRING, price_cents BIGINT') AS j
  FROM env
),
parsed AS (
  SELECT j.op AS op, j.id AS id, j.status AS status, j.price_cents AS price_cents
  FROM jp
),
applied AS (
  SELECT b.o_orderkey, b.o_orderstatus, b.price_cents
  FROM base b
  WHERE NOT EXISTS (SELECT 1 FROM parsed p
                    WHERE p.id = b.o_orderkey AND p.op IN ('u', 'd'))
  UNION ALL
  SELECT p.id, p.status, p.price_cents
  FROM parsed p
  WHERE p.op = 'c'
     OR (p.op = 'u' AND EXISTS (SELECT 1 FROM base b WHERE b.o_orderkey = p.id))
)
SELECT o_orderstatus,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(price_cents) AS BIGINT) AS total_cents
FROM applied GROUP BY o_orderstatus
""".replace("__HINT__", hint)
    )


@query(
    "pandas_api_pivot_table",
    "§2.4 pandas API on Spark: pivot_table (sum aggfunc, fill_value=0)",
    """
    WITH base AS (
      SELECT o_orderstatus, o_orderpriority,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    )
    SELECT o_orderstatus,
           CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN cents ELSE 0 END)
                AS BIGINT) AS p1_urgent,
           CAST(sum(CASE WHEN o_orderpriority = '2-HIGH' THEN cents ELSE 0 END)
                AS BIGINT) AS p2_high,
           CAST(sum(CASE WHEN o_orderpriority = '3-MEDIUM' THEN cents ELSE 0 END)
                AS BIGINT) AS p3_medium,
           CAST(sum(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN cents ELSE 0 END)
                AS BIGINT) AS p4_notspec,
           CAST(sum(CASE WHEN o_orderpriority = '5-LOW' THEN cents ELSE 0 END)
                AS BIGINT) AS p5_low
    FROM base GROUP BY o_orderstatus
    """,
)
def pandas_api_pivot_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pandas pivot_table idiom — index='o_orderstatus',
    columns='o_orderpriority', aggfunc='sum', fill_value=0 — on
    pyspark.pandas, compiling to the same single hash-agg the
    conditional-aggregation oracle states (Catalyst rewrites the
    pivot into CASE WHEN sums — no per-column pass, no driver
    transpose).  Values are cent-exact bigints BEFORE the pivot so
    the sums are integers in both engines; fill_value=0 mirrors the
    oracle's ELSE 0.  The pivoted column set is the 5-value priority
    DOMAIN — bounded and known, the condition that keeps pivot sane
    at 100 TB (a pivot on an unbounded column would be a schema
    explosion; this one is a fixed 3x5 grid from one shuffle)."""
    import pyspark.pandas as ps  # noqa: F401  (pandas-on-Spark entry point)

    base = load(spark, sf_dir, "orders").select(
        "o_orderstatus",
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    pv = base.pandas_api().pivot_table(
        index=["o_orderstatus"],
        columns="o_orderpriority",
        values="cents",
        aggfunc="sum",
        fill_value=0,
    )
    return pv.reset_index().to_spark().select(
        "o_orderstatus",
        F.col("`1-URGENT`").cast("bigint").alias("p1_urgent"),
        F.col("`2-HIGH`").cast("bigint").alias("p2_high"),
        F.col("`3-MEDIUM`").cast("bigint").alias("p3_medium"),
        F.col("`4-NOT SPECIFIED`").cast("bigint").alias("p4_notspec"),
        F.col("`5-LOW`").cast("bigint").alias("p5_low"),
    )


# Partial autocorrelation at lags 1-3 (round 11): Durbin-Levinson
# unrolled over the SAME pairwise sample correlations ts_autocorrelation
# reports, so the two queries agree by construction.  The r_k inputs
# are rounded to 6 BEFORE the recursion, making every downstream double
# expression bit-identical in both engines; one shared SQL text.
_PACF_SQL = """
WITH daily AS (
  SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
         sum(CAST(value AS DECIMAL(18,6))) AS v
  FROM events WHERE value IS NOT NULL
  GROUP BY CAST(date_trunc('day', ts) AS DATE)
),
lags AS (
  SELECT 1 AS lag UNION ALL SELECT 2 UNION ALL SELECT 3
),
pairs AS (
  SELECT l.lag, a.v AS x, b.v AS y
  FROM lags l
  JOIN daily a ON true
  JOIN daily b ON b.d = a.d + CAST(l.lag AS INTEGER)
),
s AS (
  SELECT lag, count(*) AS n,
         cast(sum(x) AS DOUBLE) AS sx, cast(sum(y) AS DOUBLE) AS sy,
         cast(sum(x * y) AS DOUBLE) AS sxy,
         cast(sum(x * x) AS DOUBLE) AS sxx,
         cast(sum(y * y) AS DOUBLE) AS syy
  FROM pairs GROUP BY lag
),
r AS (
  SELECT lag,
         round((n * sxy - sx * sy)
               / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS acf
  FROM s
),
w AS (
  SELECT max(CASE WHEN lag = 1 THEN acf END) AS r1,
         max(CASE WHEN lag = 2 THEN acf END) AS r2,
         max(CASE WHEN lag = 3 THEN acf END) AS r3
  FROM r
),
p AS (
  SELECT r1, r2, r3,
         (r2 - r1 * r1) / (1 - r1 * r1) AS p2
  FROM w
),
q AS (
  SELECT r1, r2, r3, p2, r1 - p2 * r1 AS a21
  FROM p
)
SELECT 1 AS lag, r1 AS acf, round(r1, 6) AS pacf FROM q
UNION ALL
SELECT 2 AS lag, r2 AS acf, round(p2, 6) AS pacf FROM q
UNION ALL
SELECT 3 AS lag, r3 AS acf,
       round((r3 - (a21 * r2 + p2 * r1)) / (1 - (a21 * r1 + p2 * r2)), 6) AS pacf
FROM q
ORDER BY lag
"""


@query(
    "ts_pacf",
    "§2.21 partial autocorrelation at lags 1-3 via unrolled Durbin-Levinson",
    _PACF_SQL,
)
def ts_pacf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial autocorrelation — the AR-order selector that completes
    ts_autocorrelation: ACF says HOW correlated lag k is, PACF says how
    much lag k adds AFTER lags 1..k-1 are regressed out (the classic
    Box-Jenkins rule reads AR order off where the PACF cuts).  Uses
    the Durbin-Levinson recursion unrolled for k = 1..3 over the SAME
    pairwise sample correlations ts_autocorrelation reports (computed
    from decimal-exact sums, each r_k rounded to 6 BEFORE the
    recursion), so the two queries agree by construction and every
    recursion step is a deterministic double expression identical in
    both engines: phi_11 = r1; phi_22 = (r2 - r1^2)/(1 - r1^2);
    phi_33 closes over the updated second-order coefficients.

    Shape at any SF: identical to ts_autocorrelation — one hash agg of
    events to the O(days) daily table, then 3 x days equi-joins and a
    3-row recursion; the only corpus-size work is the daily rollup."""
    register_views(spark, sf_dir, ["events"])
    return spark.sql(_PACF_SQL)


# Trend / seasonal strength (round 11): Hyndman's F_T and F_S over the
# SAME classical decomposition ts_seasonal_decompose reports (identical
# CTEs — exact integer daily sums, exact 7-day trend sums, exact
# weekday (sum, count) pairs), closed by population variances over the
# ~24 full-window days (small-cell double-sum precedent) and two
# greatest(0, 1 - ratio) expressions.  Template SQL: only the
# epoch-day-mod-7 spelling differs (Spark date subtraction yields an
# INTERVAL, DuckDB an integer).
_SEASONAL_STRENGTH_SQL = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(sum(CAST(round(value * 1000000) AS BIGINT)) AS BIGINT) AS y
  FROM events GROUP BY 1
), t AS (
  SELECT day, y, {dow} AS dow,
         CASE WHEN count(*) OVER w7 = 7
              THEN CAST(sum(y) OVER w7 AS BIGINT) END AS tx7
  FROM daily
  WINDOW w7 AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
), seas AS (
  SELECT dow, CAST(sum(7 * y - tx7) AS BIGINT) AS sdx7,
         count(*) AS cnt
  FROM t WHERE tx7 IS NOT NULL GROUP BY 1
), comp AS (
  SELECT CAST(t.y AS DOUBLE) / 1000000 - CAST(t.tx7 AS DOUBLE) / 7 / 1000000
           - CAST(s.sdx7 AS DOUBLE) / (s.cnt * 7) / 1000000 AS r,
         CAST(t.y AS DOUBLE) / 1000000
           - CAST(s.sdx7 AS DOUBLE) / (s.cnt * 7) / 1000000 AS tr,
         CAST(t.y AS DOUBLE) / 1000000
           - CAST(t.tx7 AS DOUBLE) / 7 / 1000000 AS sr
  FROM t JOIN seas s ON t.dow = s.dow
  WHERE t.tx7 IS NOT NULL
), v AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         (sum(r * r) - sum(r) * sum(r) / count(*)) / count(*) AS var_r,
         (sum(tr * tr) - sum(tr) * sum(tr) / count(*)) / count(*) AS var_tr,
         (sum(sr * sr) - sum(sr) * sum(sr) / count(*)) / count(*) AS var_sr
  FROM comp
)
SELECT n AS n_full_days,
       round(var_r, 6) AS var_residual,
       round(var_sr, 6) AS var_detrended_plus_r,
       round(var_tr, 6) AS var_deseasonalized,
       round(greatest(CAST(0 AS DOUBLE), 1 - var_r / var_tr), 6) AS trend_strength,
       round(greatest(CAST(0 AS DOUBLE), 1 - var_r / var_sr), 6) AS seasonal_strength
FROM v
"""


@query(
    "ts_seasonal_strength",
    "§2.21 trend / seasonal strength (Hyndman F_T, F_S) over the classical decomposition",
    _SEASONAL_STRENGTH_SQL.format(dow="(day - DATE '1970-01-01') % 7"),
)
def ts_seasonal_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trend and seasonal STRENGTH (Hyndman & Athanasopoulos, FPP:
    F_T = max(0, 1 - Var(R)/Var(T+R)) on the deseasonalized series,
    F_S = max(0, 1 - Var(R)/Var(S+R)) on the detrended series) — the
    two scalars a forecasting triage reads before model choice, and
    the series-health dashboard number behind ts_seasonal_decompose's
    row-level view.  Reuses the decomposition's CTEs verbatim (exact
    integer daily micro-units, exact 7-day trend sums, exact weekday
    (sum, count) pairs), restricted to full-window days; the three
    population variances are double sums over those ~24 rows (the
    stats_kl_divergence small-cell precedent) closed by two rounded
    greatest(0, ...) expressions.  One shared SQL text runs in both
    engines.

    Shape at any SF: identical to ts_seasonal_decompose — events
    collapse to the calendar-bounded daily table in the first hash
    agg; the window, weekday means, and variance finish are all
    O(days).  A century of data is ~36,500 rows here."""
    register_views(spark, sf_dir, ["events"])
    return spark.sql(
        _SEASONAL_STRENGTH_SQL.format(dow="datediff(day, DATE '1970-01-01') % 7")
    )


# Bollinger bands (round 11; squares hardened round 12): 7-day
# trailing mean +/- 2 sigma on daily revenue, full-window days only.
# One shared SQL text: daily cents and the window sum/sum-of-squares
# are exact integers; mean, population variance, and the bands are
# closing double expressions with identical operation order.  BOTH
# squares respect the int64 ceiling: y^2 casts each factor to
# DECIMAL(19,0) before multiplying (a BIGINT y*y wraps at ~3e9 daily
# cents — the sf0.1 fixture already exceeds it, caught by the round-12
# 10x oracle sweep), and s7^2 multiplies AFTER one cast to double
# (exceeds int64 at ~5e9 daily cents) — both engines lose the same
# ulps.
_BOLLINGER_SQL = """
WITH daily AS (
  SELECT o_orderdate AS d,
         CAST(sum(CAST(o_totalprice * 100 AS DECIMAL(38,0))) AS BIGINT) AS y
  FROM orders GROUP BY o_orderdate
),
w AS (
  SELECT d, y,
         CASE WHEN count(*) OVER w7 = 7
              THEN CAST(sum(y) OVER w7 AS BIGINT) END AS s7,
         CASE WHEN count(*) OVER w7 = 7
              THEN sum(CAST(y AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0)))
                   OVER w7 END AS ss7
  FROM daily
  WINDOW w7 AS (ORDER BY d ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
),
b AS (
  SELECT d, y, s7,
         CAST(s7 AS DOUBLE) / 7 AS mean_c,
         sqrt(greatest(CAST(0 AS DOUBLE),
              (7 * CAST(ss7 AS DOUBLE) - CAST(s7 AS DOUBLE) * s7) / 49)) AS std_c
  FROM w WHERE s7 IS NOT NULL
)
SELECT CAST(d AS STRING) AS day,
       round(CAST(y AS DOUBLE) / 100, 2) AS close_usd,
       round(mean_c / 100, 6) AS ma7_usd,
       round((mean_c - 2 * std_c) / 100, 6) AS lower_usd,
       round((mean_c + 2 * std_c) / 100, 6) AS upper_usd,
       CAST(CASE WHEN CAST(y AS DOUBLE) > mean_c + 2 * std_c THEN 1
                 WHEN CAST(y AS DOUBLE) < mean_c - 2 * std_c THEN -1
                 ELSE 0 END AS BIGINT) AS breach
FROM b ORDER BY day
"""


@query(
    "ts_bollinger_bands",
    "§2.21 Bollinger bands: 7-day trailing mean ± 2σ envelope with breach flags",
    _BOLLINGER_SQL,
)
def ts_bollinger_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bollinger bands on daily revenue — the volatility envelope a
    monitoring dashboard draws before alerting (ts_anomaly_zscore flags
    against a GLOBAL mean; the bands flag against the LOCAL 7-day
    regime, which is what catches level shifts without drowning in
    seasonal drift): trailing 7-day mean, population sigma from exact
    integer window sums, breach = close outside mean +/- 2 sigma (+1
    above / -1 below / 0 inside), full-window days only (the
    ts_seasonal_decompose edge rule).  Daily cents and the window sum
    are exact bigints; the sum of squares casts each factor to
    DECIMAL(19,0) first (a BIGINT y*y wraps past ~3e9 daily cents —
    sf0.1 already crosses it; found by the round-12 10x oracle sweep
    and fixed to the llm_judge_length_bias discipline); the variance
    numerator then casts to double BEFORE the s7^2 multiply (that
    square passes int64 at ~5e9 daily cents — at a 100 TB revenue
    quantum you'd lift the cent unit the way the OLS precedent
    documents) and every closing expression has identical operation
    order in both engines.

    Shape at any SF: orders partial-agg map-side to the CALENDAR-
    bounded daily table (the only pass over facts); the trailing
    window runs over O(days) rows — a single-partition window on a
    metadata-scale table, the same justification as the decompose."""
    register_views(spark, sf_dir, ["orders"])
    return spark.sql(_BOLLINGER_SQL)


@query(
    "pandas_api_ewm",
    "§2.21 pandas API on Spark: ewm(alpha).mean() exponential smoothing",
    """
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(sum(CAST(round(value * 1000000) AS BIGINT)) AS BIGINT) AS v
      FROM events GROUP BY 1
    ),
    idx AS (
      SELECT day, v, row_number() OVER (ORDER BY day) AS rn FROM daily
    ),
    pairs AS (
      SELECT a.day,
             sum(power(0.7, a.rn - b.rn) * b.v) AS num,
             sum(power(0.7, a.rn - b.rn)) AS den
      FROM idx a JOIN idx b ON b.rn <= a.rn
      GROUP BY a.day, a.rn
    )
    SELECT CAST(day AS STRING) AS day,
           round(num / den / 1000000, 4) AS ewm_value
    FROM pairs ORDER BY day
    """,
)
def pandas_api_ewm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pandas exponential-smoothing idiom — ewm(alpha=0.3).mean()
    — on pyspark.pandas, completing the migration-surface trio with
    pandas_api_rolling and pandas_api_resample: pandas spelling,
    Catalyst window execution.  adjust=True (the pandas default) makes
    every output an explicit finite weighted mean
    sum((1-a)^k x_{t-k}) / sum((1-a)^k), which is what the oracle
    replays literally as an O(days^2) rank self-join — exact integer
    micro-unit days in, one rounded double out, no recursive state
    (the classic EWMA recurrence y_t = a x_t + (1-a) y_{t-1} is
    adjust=False and intentionally NOT this query; ts_ewma_smoothing
    owns that convention).

    Shape at any SF: events pre-aggregate to the CALENDAR-bounded
    daily table in the DataFrame API before the pandas layer ever
    sees a row (the pandas_api_rolling discipline), so the ewm window
    and the oracle's quadratic join both run on O(days) rows."""
    import pyspark.pandas as ps  # noqa: F401  (registers the accessor)

    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.sum(F.round(F.col("value") * 1_000_000).cast("bigint")).alias("v")
    )
    psdf = daily.pandas_api(index_col="day")
    sm = psdf.sort_index().ewm(alpha=0.3).mean().reset_index()
    return (
        sm.to_spark()
        .select(
            F.col("day").cast("string").alias("day"),
            F.round(F.col("v") / 1_000_000.0, 4).alias("ewm_value"),
        )
        .orderBy("day")
    )


# Calendar profile (round 11): the (weekday x month) demand grid with
# independence-expected counts and Pearson residuals — exact integer
# counts and marginals, closing double expressions.  Template SQL:
# only the epoch-day-mod-7 spelling differs per engine.
_CALENDAR_PROFILE_SQL = """
WITH d AS (
  SELECT {dow} AS dow, month(CAST(o_orderdate AS DATE)) AS mon
  FROM orders
),
grid AS (
  SELECT dow, mon, CAST(count(*) AS BIGINT) AS n FROM d GROUP BY dow, mon
),
rows_m AS (SELECT dow, CAST(sum(n) AS BIGINT) AS rt FROM grid GROUP BY dow),
cols_m AS (SELECT mon, CAST(sum(n) AS BIGINT) AS ct FROM grid GROUP BY mon),
tot AS (SELECT CAST(sum(n) AS BIGINT) AS t FROM grid)
SELECT g.dow, g.mon, g.n AS n_orders,
       round(CAST(r.rt AS DOUBLE) * c.ct / t.t, 6) AS expected,
       round((g.n - CAST(r.rt AS DOUBLE) * c.ct / t.t)
             / sqrt(CAST(r.rt AS DOUBLE) * c.ct / t.t), 6) AS pearson_residual
FROM grid g
JOIN rows_m r ON g.dow = r.dow
JOIN cols_m c ON g.mon = c.mon
CROSS JOIN tot t
ORDER BY g.dow, g.mon
"""


@query(
    "ts_calendar_profile",
    "§2.21 calendar profile: weekday x month demand grid with Pearson residuals",
    _CALENDAR_PROFILE_SQL.format(
        dow="(CAST(o_orderdate AS DATE) - DATE '1970-01-01') % 7"
    ),
)
def ts_calendar_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar demand profile — the weekday x month contingency grid
    every capacity planner draws first, upgraded from raw counts to an
    ANALYTIC view: expected count under weekday/month independence
    (row_total * col_total / n) and the Pearson residual
    (o - e)/sqrt(e), whose cells beyond ~+/-2 mark weekday-month
    interactions a seasonal-naive forecast will miss (the per-cell
    decomposition of stats_chi_square's single statistic).  Counts and
    both marginals are exact integers; expected and residual are
    closing double expressions with identical operation order in both
    engines.  Weekday is epoch-day mod 7 (portable across engines'
    dow numbering — the ts_seasonal_decompose convention).

    Shape at any SF: one scan of orders partial-aggs map-side onto the
    84-cell grid; marginals and the finish are metadata-scale joins
    over <100 rows.  100 TB costs exactly one scan."""
    register_views(spark, sf_dir, ["orders"])
    return spark.sql(
        _CALENDAR_PROFILE_SQL.format(
            dow="datediff(CAST(o_orderdate AS DATE), DATE '1970-01-01') % 7"
        )
    )


# Rolling correlation (round 11, wave 3): 30-day trailing Pearson
# between daily order COUNT and daily revenue, full windows only.
# One shared SQL text: daily dollars are half-up integers, the five
# window sums are exact bigints, and the closed form runs on
# identically-cast doubles (the ts_bollinger_bands overflow
# discipline: products cast to double BEFORE multiplying).
_ROLLING_CORR_SQL = """
WITH daily AS (
  SELECT o_orderdate AS d,
         CAST(count(*) AS BIGINT) AS x,
         CAST(sum(CAST(floor(o_totalprice + 0.5) AS BIGINT)) AS BIGINT) AS y
  FROM orders GROUP BY o_orderdate
),
w AS (
  SELECT d, x, y,
         CASE WHEN count(*) OVER w30 = 30 THEN CAST(count(*) OVER w30 AS BIGINT) END AS n,
         CAST(sum(x) OVER w30 AS BIGINT) AS sx,
         CAST(sum(y) OVER w30 AS BIGINT) AS sy,
         CAST(sum(x * y) OVER w30 AS BIGINT) AS sxy,
         CAST(sum(x * x) OVER w30 AS BIGINT) AS sxx,
         CAST(sum(y * y) OVER w30 AS BIGINT) AS syy
  FROM daily
  WINDOW w30 AS (ORDER BY d ROWS BETWEEN 29 PRECEDING AND CURRENT ROW)
),
c AS (
  SELECT d,
         n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy AS num,
         (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx)
           * (n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy) AS den2
  FROM w WHERE n IS NOT NULL
)
SELECT CAST(d AS STRING) AS day,
       CASE WHEN den2 > 0 THEN round(num / sqrt(den2), 6)
            ELSE CAST(NULL AS DOUBLE) END AS corr_30d
FROM c ORDER BY day
"""


@query(
    "ts_rolling_correlation",
    "§2.21 rolling 30-day Pearson between daily order count and revenue",
    _ROLLING_CORR_SQL,
)
def ts_rolling_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 30-day Pearson correlation between daily order count
    and daily revenue — the regime-shift monitor ts_cross_correlation
    (global, lagged) can't give you: a STABLE local correlation means
    volume drives revenue as usual; a collapse toward 0 in some window
    marks a mix change (price inflation, basket-size shift) long
    before the global statistic moves.  Full 30-row windows only;
    counts are exact, daily dollars are half-up integers, the five
    trailing window sums are exact bigints, and the Pearson closed
    form casts each product through double with identical operation
    order (the ts_bollinger_bands discipline — sy*sy would pass 2^63
    at ~1e10 daily dollars, where the quantum lifts as documented
    there); zero-variance windows yield NULL deterministically in
    both engines.

    Shape at any SF: orders partial-agg map-side to the CALENDAR-
    bounded daily table — the only pass over facts; the trailing
    window is a single-partition pass over O(days) rows (the
    decompose justification)."""
    register_views(spark, sf_dir, ["orders"])
    return spark.sql(_ROLLING_CORR_SQL)


# Residual anomaly scoring (round 11, wave 3): robust MAD z-scores on
# the classical decomposition's residuals — template SQL (epoch-day
# dow + percentile_disc/quantile_disc spellings), everything upstream
# of the score exact or identically rounded.
_STL_ANOMALY_SQL = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(sum(CAST(round(value * 1000000) AS BIGINT)) AS BIGINT) AS y
  FROM events GROUP BY 1
), t AS (
  SELECT day, y, {dow} AS dow,
         CASE WHEN count(*) OVER w7 = 7
              THEN CAST(sum(y) OVER w7 AS BIGINT) END AS tx7
  FROM daily
  WINDOW w7 AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
), seas AS (
  SELECT dow, CAST(sum(7 * y - tx7) AS BIGINT) AS sdx7, count(*) AS cnt
  FROM t WHERE tx7 IS NOT NULL GROUP BY 1
), res AS (
  SELECT t.day, t.y,
         round(CAST(t.y AS DOUBLE) / 1000000
               - CAST(t.tx7 AS DOUBLE) / 7 / 1000000
               - CAST(s.sdx7 AS DOUBLE) / (s.cnt * 7) / 1000000, 2) AS r
  FROM t JOIN seas s ON t.dow = s.dow
  WHERE t.tx7 IS NOT NULL
), med AS (
  SELECT {p_med} AS m FROM res
), dev AS (
  SELECT res.day, res.y, res.r, abs(res.r - med.m) AS ad
  FROM res CROSS JOIN med
), mad AS (
  SELECT {p_mad} AS md FROM dev
)
SELECT CAST(dev.day AS STRING) AS day,
       round(CAST(dev.y AS DOUBLE) / 1000000, 2) AS observed,
       dev.r AS residual,
       CASE WHEN mad.md > 0
            THEN round(dev.ad / (1.4826 * mad.md), 4)
            ELSE CAST(NULL AS DOUBLE) END AS robust_z,
       CAST(CASE WHEN mad.md > 0 AND dev.ad > 3 * 1.4826 * mad.md
                 THEN 1 ELSE 0 END AS BIGINT) AS is_anomaly
FROM dev CROSS JOIN mad
ORDER BY day
"""


@query(
    "ts_stl_anomaly",
    "§2.21 decomposition-residual anomalies via robust MAD z-scores",
    _STL_ANOMALY_SQL.format(
        dow="(day - DATE '1970-01-01') % 7",
        p_med="quantile_disc(r, 0.5)",
        p_mad="quantile_disc(ad, 0.5)",
    ),
)
def ts_stl_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decomposition-residual anomaly scoring — the detector that
    completes the ts_seasonal_decompose / ts_seasonal_strength family:
    remove trend and weekday seasonality FIRST, then robust-score what
    remains (median + MAD with the 1.4826 normal-consistency factor;
    |r - med| > 3 sigma_robust flags).  This catches level spikes that
    ts_anomaly_zscore's global mean misses under seasonality and that
    ts_bollinger_bands' trailing window smears across the weekly
    cycle, and unlike both it is outlier-robust (the anomaly itself
    cannot inflate the threshold through a mean/stddev).  Residuals
    are the decompose's own round-2 fixed formulas over exact
    integers; the median and MAD use the pinned percentile_disc
    convention, so the score input doubles are bit-identical in both
    engines; zero-MAD degenerates to NULL scores deterministically.

    Shape at any SF: identical to ts_seasonal_decompose — one hash agg
    to the calendar-bounded daily table, O(days) windows and two
    discrete percentiles over ~24 rows; output is day-grain with an
    is_anomaly flag (all full-window days, so the row count is stable
    for the gate)."""
    register_views(spark, sf_dir, ["events"])
    return spark.sql(
        _STL_ANOMALY_SQL.format(
            dow="datediff(day, DATE '1970-01-01') % 7",
            p_med="percentile_disc(0.5) WITHIN GROUP (ORDER BY r)",
            p_mad="percentile_disc(0.5) WITHIN GROUP (ORDER BY ad)",
        )
    )


# Ljung-Box portmanteau test (round 12): "is the daily series white
# noise?" — the residual-diagnostics gate run after every forecast fit
# and the formal version of eyeballing ts_autocorrelation.  One shared
# SQL text.  Determinism: daily micro-units are exact bigints; every
# corpus-size sum is an exact DECIMAL(19,0)x(19,0) product sum (the
# llm_judge_length_bias overflow discipline — y^2 passes int64 at
# ~3e9 daily micro-units), cast once to double for the closed-form
# r_k; the cumulative Q sums round-12 INTEGERIZED per-lag terms (a
# bigint running sum is order-free, a double window sum is not).
# r_k here is the time-series convention (global mean, global
# denominator, row-lag pairing), NOT ts_autocorrelation's pairwise
# Pearson — the two agree asymptotically and the docstrings cross-ref.
_LJUNG_BOX_SQL = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(sum(CAST(round(value * 1000000) AS BIGINT)) AS BIGINT) AS y
  FROM events GROUP BY 1
),
idx AS (
  SELECT row_number() OVER (ORDER BY day) AS rn, y FROM daily
),
base AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(y AS DECIMAL(19,0))) AS DOUBLE) AS s,
         CAST(sum(CAST(y AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0)))
              AS DOUBLE) AS ss
  FROM idx
),
lags AS (
  SELECT 1 AS lag UNION ALL SELECT 2 UNION ALL SELECT 3 UNION ALL
  SELECT 4 UNION ALL SELECT 5 UNION ALL SELECT 6 UNION ALL SELECT 7
),
cs AS (
  SELECT l.lag AS lag,
         CAST(sum(CAST(a.y AS DECIMAL(19,0)) * CAST(b.y AS DECIMAL(19,0)))
              AS DOUBLE) AS syy,
         CAST(sum(CAST(a.y AS DECIMAL(19,0))) AS DOUBLE) AS sh,
         CAST(sum(CAST(b.y AS DECIMAL(19,0))) AS DOUBLE) AS st
  FROM lags l
  JOIN idx a ON true
  JOIN idx b ON b.rn = a.rn + l.lag
  GROUP BY l.lag
),
r AS (
  SELECT lag, n,
         round((n * n * syy - n * s * (sh + st)
                + (n - lag) * s * s) / (n * (n * ss - s * s)), 6) AS acf
  FROM cs CROSS JOIN base
),
terms AS (
  SELECT lag, n, acf,
         CAST(round(acf * acf / (n - lag) * 1000000000000) AS BIGINT) AS t12
  FROM r
),
q AS (
  SELECT lag, acf, n,
         round(n * (n + 2)
               * CAST(sum(t12) OVER (ORDER BY lag
                                     ROWS UNBOUNDED PRECEDING) AS DOUBLE)
               / 1000000000000, 6) AS q_stat
  FROM terms
)
SELECT lag, acf, q_stat,
       CAST(lag AS BIGINT) AS df,
       CAST(CASE lag WHEN 1 THEN 3.841459 WHEN 2 THEN 5.991465
                     WHEN 3 THEN 7.814728 WHEN 4 THEN 9.487729
                     WHEN 5 THEN 11.070498 WHEN 6 THEN 12.591587
                     ELSE 14.06714 END AS DOUBLE) AS chi2_crit_95,
       CAST(CASE WHEN q_stat > CASE lag WHEN 1 THEN 3.841459
                                        WHEN 2 THEN 5.991465
                                        WHEN 3 THEN 7.814728
                                        WHEN 4 THEN 9.487729
                                        WHEN 5 THEN 11.070498
                                        WHEN 6 THEN 12.591587
                                        ELSE 14.06714 END
                 THEN 1 ELSE 0 END AS BIGINT) AS reject_white_noise
FROM q ORDER BY lag
"""


@query(
    "ts_ljung_box",
    "§2.21 Ljung-Box portmanteau white-noise test at lags 1-7",
    _LJUNG_BOX_SQL,
)
def ts_ljung_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ljung-Box Q — the portmanteau white-noise test every forecast
    pipeline runs on its residuals (and the formal answer to the
    question ts_autocorrelation only plots): Q_K = n(n+2) * sum_{k<=K}
    r_k^2/(n-k) against chi-square(K), reported cumulatively at lags
    1-7 with the 95% critical value and a reject flag per df.  r_k is
    the time-series convention (deviations from the GLOBAL mean,
    global denominator, consecutive-row pairing) expanded so every
    corpus-touching sum is an exact DECIMAL product sum and the closed
    form runs on identically-cast doubles; the cumulative Q sums
    integerized per-lag terms (exact bigint running sum — a double
    window sum would be engine-order-dependent).  With the fixture's
    strong weekly cycle the test must reject hard by lag 7, which the
    property test pins against a numpy replay.

    Shape at any SF: one hash agg collapses events to the
    calendar-bounded daily table (the only pass over facts); the
    7-lag self-join, window, and finish are O(days) metadata-scale —
    the ts_autocorrelation justification."""
    register_views(spark, sf_dir, ["events"])
    return spark.sql(_LJUNG_BOX_SQL)


# Periodogram (round 12): spectral power at the Fourier frequencies
# nearest a fixed grid of CALENDAR periods (2..365 days) — "which
# cycle dominates" answered in the frequency domain, where
# ts_autocorrelation / ts_seasonal_strength answer it in the lag
# domain.  One shared SQL text.  Determinism: cos/sin of the shared
# double argument 2*pi()*k*t/n are snapped to 1e-8-grain integers
# BEFORE multiplying (a 1-ulp libm difference between the JVM and
# DuckDB's libm survives only at a rounding boundary, ~1e-8
# probability per term), so a_k/b_k are exact DECIMAL sums of
# bigint x bigint products and the closing power/share expressions
# run on identically-derived doubles; the share denominator sums
# integerized powers (order-free bigint, not a double window sum).
_PERIODOGRAM_SQL = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(sum(CAST(round(value * 1000000) AS BIGINT)) AS BIGINT) AS y
  FROM events GROUP BY 1
),
idx AS (
  SELECT row_number() OVER (ORDER BY day) - 1 AS t, y FROM daily
),
n1 AS (SELECT CAST(count(*) AS BIGINT) AS n FROM idx),
periods AS (
  SELECT 2 AS p UNION ALL SELECT 3 UNION ALL SELECT 4 UNION ALL
  SELECT 5 UNION ALL SELECT 6 UNION ALL SELECT 7 UNION ALL
  SELECT 14 UNION ALL SELECT 28 UNION ALL SELECT 91 UNION ALL
  SELECT 182 UNION ALL SELECT 365
),
ks AS (
  SELECT p, greatest(CAST(1 AS BIGINT),
                     CAST(round(CAST(n AS DOUBLE) / p) AS BIGINT)) AS k, n
  FROM periods CROSS JOIN n1
),
terms AS (
  SELECT ks.p, ks.k, ks.n,
         CAST(sum(CAST(i.y AS DECIMAL(19,0))
                  * CAST(CAST(round(cos(2 * pi() * ks.k * i.t / ks.n)
                                    * 100000000) AS BIGINT)
                         AS DECIMAL(19,0))) AS DOUBLE) AS a8,
         CAST(sum(CAST(i.y AS DECIMAL(19,0))
                  * CAST(CAST(round(sin(2 * pi() * ks.k * i.t / ks.n)
                                    * 100000000) AS BIGINT)
                         AS DECIMAL(19,0))) AS DOUBLE) AS b8
  FROM ks JOIN idx i ON true
  GROUP BY ks.p, ks.k, ks.n
),
pw AS (
  SELECT p, k, n,
         CAST(round(2 * (a8 * a8 + b8 * b8)
                    / (n * 100000000.0 * 100000000.0
                       * 1000000.0 * 1000000.0) * 10000) AS BIGINT) AS pw4
  FROM terms
)
SELECT p AS period_days, k AS fourier_k,
       round(CAST(n AS DOUBLE) / k, 2) AS period_actual,
       round(CAST(pw4 AS DOUBLE) / 10000.0, 4) AS power,
       round(CAST(pw4 AS DOUBLE) / sum(pw4) OVER (), 6) AS power_share
FROM pw ORDER BY period_days
"""


@query(
    "ts_periodogram",
    "§2.21 periodogram: spectral power at the Fourier bins nearest calendar periods 2-365d",
    _PERIODOGRAM_SQL,
)
def ts_periodogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Periodogram probe — the frequency-domain seasonality scan that
    complements ts_autocorrelation (lag domain) and names the winning
    cycle directly: spectral power I(f_k) = 2/n * (a_k^2 + b_k^2) at
    the Fourier frequency k = round(n/p) nearest each calendar period
    p in {2..7, 14, 28, 91, 182, 365} days, with each bin's share of
    the probed total.  The property test pins every bin against
    numpy.fft on the identical snapped-trig series.  (The fixture's
    events span 30 days, so the p >= 28 rows all collapse to the k=1
    fundamental — duplicate bins by design, the grid is a definition,
    not fixture-tuned; on real multi-year data each period gets its
    own bin.)  Trig terms snap to 1e-8-grain integers before the
    exact DECIMAL product sums (the llm_ngram_entropy_rate
    boundary-risk arithmetic note), so both engines sum identical
    integers in any order; power and share close over integerized
    1e-4-grain values.

    Shape at any SF: one hash agg collapses events to the
    calendar-bounded daily table; the 11-period cross join is 11 x
    O(days) rows partial-agg'd map-side — a century of data is ~4e5
    term rows.  100 TB costs exactly the one fact scan."""
    register_views(spark, sf_dir, ["events"])
    return spark.sql(_PERIODOGRAM_SQL)


# Hurst exponent via rescaled-range analysis (round 12): long-memory
# probe on the daily series.  One shared SQL text.  Determinism: the
# within-block cumulative deviation is kept as the INTEGER numerator
# w*P_j - j*S_b (prefix sums and block sums are exact bigints), the
# block variance numerator w*SSq - S_b^2 is an exact DECIMAL, and R/S
# per block reduces to R_num / sqrt(var_num) (the two 1/w factors
# cancel) — a closed double from exact integers, snapped to a
# 1e-8-grain bigint so the per-window mean is an order-free integer
# sum.  The log-log OLS runs on integerized log2 values for the same
# reason.
_HURST_SQL = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(sum(CAST(round(value * 1000000) AS BIGINT)) AS BIGINT) AS y
  FROM events GROUP BY 1
),
idx AS (
  SELECT row_number() OVER (ORDER BY day) - 1 AS t, y FROM daily
),
ws AS (
  SELECT 4 AS w UNION ALL SELECT 8 UNION ALL SELECT 16 UNION ALL
  SELECT 32 UNION ALL SELECT 64
),
blk AS (
  SELECT ws.w, CAST(floor(i.t / ws.w) AS BIGINT) AS b, i.t, i.y,
         count(*) OVER (PARTITION BY ws.w, CAST(floor(i.t / ws.w) AS BIGINT))
           AS bn,
         row_number() OVER (PARTITION BY ws.w,
                                         CAST(floor(i.t / ws.w) AS BIGINT)
                            ORDER BY i.t) AS j,
         CAST(sum(i.y) OVER (PARTITION BY ws.w,
                                          CAST(floor(i.t / ws.w) AS BIGINT)
                             ORDER BY i.t ROWS UNBOUNDED PRECEDING)
              AS BIGINT) AS pj,
         CAST(sum(i.y) OVER (PARTITION BY ws.w,
                                          CAST(floor(i.t / ws.w) AS BIGINT))
              AS BIGINT) AS sb
  FROM ws JOIN idx i ON true
),
dev AS (
  SELECT w, b, sb,
         w * pj - j * sb AS cum_num,
         CAST(y AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0)) AS y2
  FROM blk WHERE bn = w
),
per_block AS (
  SELECT w, b,
         max(cum_num) - min(cum_num) AS r_num,
         CAST(w * sum(y2) AS DOUBLE)
           - CAST(min(sb) AS DOUBLE) * CAST(min(sb) AS DOUBLE) AS var_num
  FROM dev GROUP BY w, b, sb
),
rs AS (
  SELECT w,
         CAST(round(CAST(r_num AS DOUBLE) / sqrt(var_num) * 100000000)
              AS BIGINT) AS rs8
  FROM per_block WHERE var_num > 0
),
per_w AS (
  SELECT w, CAST(count(*) AS BIGINT) AS n_blocks,
         CAST(sum(rs8) AS BIGINT) AS srs8
  FROM rs GROUP BY w
),
pts AS (
  SELECT w, n_blocks,
         CAST(srs8 AS DOUBLE) / n_blocks / 100000000 AS mean_rs,
         CAST(round(log2(CAST(srs8 AS DOUBLE) / n_blocks / 100000000)
                    * 100000000) AS BIGINT) AS ly8,
         CAST(log2(w) AS BIGINT) AS lx
  FROM per_w
),
fit AS (
  SELECT CAST(count(*) AS BIGINT) AS m,
         CAST(sum(lx) AS DOUBLE) AS sx,
         CAST(sum(ly8) AS DOUBLE) / 100000000 AS sy,
         CAST(sum(lx * ly8) AS DOUBLE) / 100000000 AS sxy,
         CAST(sum(lx * lx) AS DOUBLE) AS sxx
  FROM pts
)
SELECT p.w AS window_size, p.n_blocks,
       round(p.mean_rs, 6) AS mean_rs,
       round(CAST(p.ly8 AS DOUBLE) / 100000000, 6) AS log2_rs,
       round((f.m * f.sxy - f.sx * f.sy)
             / (f.m * f.sxx - f.sx * f.sx), 6) AS hurst
FROM pts p CROSS JOIN fit f ORDER BY window_size
"""


@query(
    "ts_hurst_exponent",
    "§2.21 Hurst exponent via rescaled-range (R/S) analysis at window sizes 8-64",
    _HURST_SQL,
)
def ts_hurst_exponent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hurst exponent — the long-memory / mean-reversion probe a
    quant or capacity planner reads before trusting any extrapolation:
    H ~ 0.5 means the daily series diffuses like a random walk's
    increments, H > 0.5 trending persistence, H < 0.5 mean reversion.
    Classical R/S: chunk the observed sequence into full blocks of
    w in {4,8,16,32,64} days, per block compute (max-min of cumulative
    deviations from the block mean) / block sigma, average per w, and
    read H as the OLS slope of log2(R/S) on log2(w).  The 1/w factors
    cancel, so each block's R/S is R_num/sqrt(var_num) over exact
    integer/decimal numerators; per-block values snap to 1e-8-grain
    bigints so the per-w mean and the log-log OLS are order-free
    exact sums (the ts_ljung_box integerized-running-sum discipline).
    The fixture's events table spans 30 calendar days, so only the
    w in {4,8,16} rows have full blocks here (7+3+1 blocks; the 32/64
    rows appear as soon as the calendar does — the grid is part of
    the definition, not fixture-tuned); the property test pins every
    block statistic against a numpy replay.

    Shape at any SF: one hash agg to the calendar-bounded daily
    table; the block windows partition O(days) rows into <=w-row
    groups and the finish is 4 rows.  100 TB costs the one fact
    scan."""
    register_views(spark, sf_dir, ["events"])
    return spark.sql(_HURST_SQL)


# Theil's U (round 12): corpus-level relative forecast accuracy —
# U2 of the seasonal-naive (same weekday last week) and the plain
# naive (yesterday) forecasts on daily revenue, plus their ratio.
# ts_forecast_error reports per-user absolute errors for ONE
# baseline; Theil's U is the scale-free "is the fancier baseline even
# worth it" scalar (U2 < 1 beats the no-change forecast).  One shared
# SQL text: daily cents exact, every squared error an exact DECIMAL
# product, three rounded closing ratios.
_THEIL_U_SQL = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
         CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
              AS BIGINT) AS y
  FROM orders GROUP BY 1
),
paired AS (
  SELECT a.d, a.y,
         n1.y AS f_naive,
         s7.y AS f_seasonal
  FROM daily a
  JOIN daily n1 ON n1.d = a.d - INTERVAL 1 DAY
  JOIN daily s7 ON s7.d = a.d - INTERVAL 7 DAY
),
s AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(y - f_seasonal AS DECIMAL(19,0))
                  * CAST(y - f_seasonal AS DECIMAL(19,0))) AS DOUBLE)
           AS sse_seasonal,
         CAST(sum(CAST(y - f_naive AS DECIMAL(19,0))
                  * CAST(y - f_naive AS DECIMAL(19,0))) AS DOUBLE)
           AS sse_naive,
         CAST(sum(CAST(y AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0)))
              AS DOUBLE) AS ssy
  FROM paired
)
SELECT n AS n_days,
       round(sqrt(sse_seasonal / n) / 100, 2) AS rmse_seasonal_usd,
       round(sqrt(sse_naive / n) / 100, 2) AS rmse_naive_usd,
       round(sqrt(sse_seasonal / ssy), 6) AS theil_u2_seasonal,
       round(sqrt(sse_naive / ssy), 6) AS theil_u2_naive,
       round(sqrt(sse_seasonal / sse_naive), 6) AS seasonal_vs_naive
FROM s
"""


@query(
    "ts_theil_u",
    "§2.22 Theil's U2: seasonal-naive vs naive forecast accuracy ratio",
    _THEIL_U_SQL,
)
def ts_theil_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil's U — the forecast-triage scalar ts_forecast_error's
    per-user WAPE table doesn't give you: RMSE of the seasonal-naive
    (same weekday last week) and plain naive (yesterday) baselines on
    corpus daily revenue, each normalized by the actuals' root mean
    square (U2; the no-change forecast scores 1 by construction
    against itself), and their direct ratio — below 1 means weekly
    seasonality carries real signal and a seasonal model is worth
    fitting, above 1 means yesterday already explains more.  Both
    lags are CALENDAR-day equi-joins, not row lags (the
    ts_forecast_error sparse-series rule); only days with both
    forecasts score, so the three sums share one row set.  Daily
    cents are half-up exact integers, every squared error an exact
    DECIMAL(19,0)^2 product sum, the five outputs rounded closing
    doubles with identical operation order.  numpy-replay property
    test.

    Shape at any SF: orders partial-agg map-side to the
    calendar-bounded daily table (the only fact pass); the two lag
    self-joins and the finish are O(days) metadata-scale."""
    register_views(spark, sf_dir, ["orders"])
    return spark.sql(_THEIL_U_SQL)
