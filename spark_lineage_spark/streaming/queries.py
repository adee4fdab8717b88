"""Structured Streaming operators (SURVEY.md §2.9).

Strategy (SURVEY §2.9 oracle note): tumbling/sliding/session window
aggregations are pure functions of event-time, so a finite
``trigger(availableNow)`` run over events.parquet must equal the batch
SQL over the same rows — those are fully oracle-checked. Pure-runtime
behaviors (watermark drops, state TTL) are property-tested in
tests/test_streaming.py.

Each query runs a real streaming query (micro-batch engine, state
store, memory sink) and returns the sink contents as the result
DataFrame.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import time
import uuid
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from spark_lineage_spark.plans.extract import lineage_checkpoint
from spark_lineage_spark.registry import query
from spark_lineage_spark.tables import table_path


def _stream_dir(sf_dir: str) -> str:
    """The file stream source wants a DIRECTORY; testdata is one
    read-only file per table — stage a copy into a cached temp dir."""
    import hashlib

    src = table_path(sf_dir, "events")
    st = os.stat(src)
    # key includes size+mtime so regenerated fixtures invalidate the copy
    key = hashlib.md5(f"{src}:{st.st_size}:{st.st_mtime_ns}".encode()).hexdigest()[:10]
    d = os.path.join(tempfile.gettempdir(), f"sls_stream_src_{key}")
    dst = os.path.join(d, "events.parquet")
    if not os.path.exists(dst):
        os.makedirs(d, exist_ok=True)
        # unique tmp per process: two concurrent stagings must not
        # interleave writes before the atomic rename
        tmp = f"{dst}.{os.getpid()}.{uuid.uuid4().hex[:6]}.tmp"
        shutil.copy(src, tmp)
        try:
            os.rename(tmp, dst)
        except OSError:
            os.unlink(tmp)  # lost the race; winner's copy is complete
    return d


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unbounded read of the events table (file source).

    Schema comes from the batch reader (static inference is not allowed
    on streams); ts is normalized to TimestampType by the same central
    helper as the batch loader (int64-ns fixtures get exact integer
    division, timestamp_ntz fixtures get a UTC-preserving cast).
    """
    from spark_lineage_spark.tables import _normalize_ts

    path = table_path(sf_dir, "events")
    schema = spark.read.parquet(path).schema
    stream = spark.readStream.schema(schema).parquet(_stream_dir(sf_dir))
    return _normalize_ts(stream)


@contextmanager
def _stream_state_shuffle(spark: SparkSession):
    """Scope ``spark.sql.shuffle.partitions`` to a stateful streaming
    run. AQE is disabled for stateful streaming, so the static value
    directly sets the state-store count — every stateful operator
    snapshots one store per partition per micro-batch. The batch
    default (32) pays 32 state checkpoints for a few thousand keys;
    size it explicitly for the run (~70 ms per store per batch
    measured) and restore after. On a real cluster this knob must be
    chosen up front anyway (it is fixed for the checkpoint's lifetime)
    — sized to peak state via $SPARK_GRAFT_STREAM_SHUFFLE, not to the
    batch default."""
    prev_shuffle = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set(
        "spark.sql.shuffle.partitions",
        os.environ.get("SPARK_GRAFT_STREAM_SHUFFLE", "4"),
    )
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_shuffle)


def _flush_sentinel(
    spark: SparkSession, schema, max_ts, hours: int, user_id: int, etype: str
) -> DataFrame:
    """One flush-sentinel event row (event_id -1, ts = max_ts + hours)
    built from range(1) + JVM literals instead of createDataFrame: a
    driver-local relation pays a multi-second handshake per FILE WRITE
    in this tuned session (measured 5-6 s for a ONE-ROW parquet write,
    the same finding as the corrupt-CSV staging note in sources_sinks;
    the range() form writes in ~0.4 s). Values and schema are
    identical to the old positional createDataFrame row."""
    vals = {
        "event_id": F.lit(-1),
        "ts": F.lit(max_ts) + F.expr(f"INTERVAL {hours} HOURS"),
        "user_id": F.lit(user_id),
        "event_type": F.lit(etype),
        "value": F.lit(0.0),
        "props": F.lit(None),
    }
    return spark.range(1).select(
        *[vals[f.name].cast(f.dataType).alias(f.name) for f in schema.fields]
    )


def run_to_memory(df: DataFrame, mode: str = "append") -> DataFrame:
    """Execute a streaming DataFrame to completion via availableNow into
    a memory sink; return the sink as a batch DataFrame.

    Shuffle sizing: see _stream_state_shuffle.
    """
    spark = df.sparkSession
    name = f"sls_sink_{uuid.uuid4().hex[:10]}"
    ckpt = os.path.join(tempfile.mkdtemp(prefix="sls_ckpt_"), "ckpt")
    with _stream_state_shuffle(spark):
        q = (
            df.writeStream.outputMode(mode)
            .format("memory")
            .queryName(name)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    # detach the result from the memory sink so the temp table and
    # checkpoint dir can be released (otherwise every call pins a
    # full result table in driver memory for the session's lifetime)
    out = spark.table(name).transform(lineage_checkpoint)
    try:
        spark.catalog.dropTempView(name)
    except Exception:
        pass
    shutil.rmtree(os.path.dirname(ckpt), ignore_errors=True)
    return out


@query(
    "stream_tumbling_window",
    "§2.9 streaming tumbling window agg (availableNow ≡ batch)",
    """
    SELECT time_bucket(INTERVAL '6 hours', date_trunc('microseconds', ts)) AS window_start,
           event_type,
           count(*) AS n,
           round(sum(value), 4) AS total_value
    FROM events GROUP BY 1, 2
    """,
)
def stream_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed 6h buckets; watermark bounds state, complete mode emits
    every window so the finite run equals batch GROUP BY."""
    agg = (
        events_stream(spark, sf_dir)
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "6 hours"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("total_value"))
    )
    out = run_to_memory(agg, mode="complete")
    return out.select(
        F.col("window.start").alias("window_start"), "event_type", "n", "total_value"
    )


@query(
    "stream_sliding_window",
    "§2.9 streaming sliding window agg",
    """
    WITH buckets AS (
      SELECT unnest([
               time_bucket(INTERVAL '6 hours', date_trunc('microseconds', ts)),
               time_bucket(INTERVAL '6 hours', date_trunc('microseconds', ts)) - INTERVAL '6 hours'
             ]) AS window_start,
             event_id, value, date_trunc('microseconds', ts) AS tsu
      FROM events
    )
    SELECT window_start, count(*) AS n, round(avg(value), 6) AS avg_value
    FROM buckets
    WHERE tsu >= window_start AND tsu < window_start + INTERVAL '12 hours'
    GROUP BY 1
    """,
)
def stream_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """12h windows sliding every 6h — each event lands in 2 windows;
    the oracle reconstructs the window set with unnest + range filter."""
    agg = (
        events_stream(spark, sf_dir)
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "12 hours", "6 hours"))
        .agg(F.count("*").alias("n"), F.round(F.avg("value"), 6).alias("avg_value"))
    )
    out = run_to_memory(agg, mode="complete")
    return out.select(F.col("window.start").alias("window_start"), "n", "avg_value")


@query(
    "stream_session_window",
    "§2.9 streaming session window (30 min gap)",
    """
    WITH e AS (
      SELECT user_id, date_trunc('microseconds', ts) AS tsu
      FROM events
    ),
    flagged AS (
      SELECT user_id, tsu,
             -- STRICT <: Spark sessions are [start, start+gap) and merge
             -- only on overlap, so an event exactly gap later opens a
             -- NEW session
             CASE WHEN tsu - lag(tsu) OVER (PARTITION BY user_id ORDER BY tsu)
                       < INTERVAL '30 minutes' THEN 0 ELSE 1 END AS new_session
      FROM e
    ),
    sessioned AS (
      SELECT user_id, tsu,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY tsu
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged
    )
    SELECT user_id, min(tsu) AS session_start, count(*) AS n_events
    FROM sessioned GROUP BY user_id, session_id
    """,
)
def stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessions via session_window (stateful merging windows);
    oracle sessionizes with lag + running sum of gap breaks — identical
    semantics for a finite event set."""
    agg = (
        events_stream(spark, sf_dir)
        .withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(F.count("*").alias("n_events"))
    )
    out = run_to_memory(agg, mode="complete")
    return out.select(
        "user_id", F.col("session_window.start").alias("session_start"), "n_events"
    )


@query(
    "stream_dedup_watermark",
    "§2.9 streaming dedup within watermark",
    """
    SELECT event_type, count(DISTINCT event_id) AS n_unique
    FROM events GROUP BY event_type
    """,
)
def stream_dedup_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dropDuplicatesWithinWatermark keyed on (event_id, event_type),
    then a batch count of the deduped append-mode output. State is
    bounded by the watermark — the 100 TB-stream-safe dedup. Keying on
    the full (id, type) pair makes the result survivor-independent:
    the oracle groups by event_type, so an id duplicated across TWO
    types must survive once per type regardless of arrival order
    (ADVICE r1 — with id-only keying the comparison depended on a
    fixture invariant that duplicates share their payload)."""
    dedup = (
        events_stream(spark, sf_dir)
        .withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["event_id", "event_type"])
    )
    out = run_to_memory(dedup, mode="append")
    return out.groupBy("event_type").agg(F.countDistinct("event_id").alias("n_unique"))


@query(
    "stream_stream_join",
    "§2.9 stream-stream interval join (clicks→purchases ≤1h)",
    """
    SELECT p.event_id AS purchase_id, c.event_id AS click_id
    FROM events p JOIN events c
      ON p.user_id = c.user_id
     AND p.event_type = 'purchase' AND c.event_type = 'click'
     AND date_trunc('microseconds', c.ts) >= date_trunc('microseconds', p.ts) - INTERVAL '1 hour'
     AND date_trunc('microseconds', c.ts) <= date_trunc('microseconds', p.ts)
    """,
)
def stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two streams joined on user_id with a time-bound condition;
    watermarks on both sides bound the join state (SURVEY §2.9). Inner
    join emits matches as they arrive, so the finite run equals the
    batch interval join."""
    purchases = (
        events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(F.col("event_id").alias("purchase_id"), F.col("user_id").alias("p_user"),
                F.col("ts").alias("p_ts"))
        .withWatermark("p_ts", "2 hours")
    )
    clicks = (
        events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .select(F.col("event_id").alias("click_id"), F.col("user_id").alias("c_user"),
                F.col("ts").alias("c_ts"))
        .withWatermark("c_ts", "2 hours")
    )
    joined = purchases.join(
        clicks,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("c_ts") <= F.col("p_ts")),
        "inner",
    ).select("purchase_id", "click_id")
    return run_to_memory(joined, mode="append")


def _outer_join_side(
    spark: SparkSession, sf_dir: str, run_dir: str, prefix: str, etype: str,
    id_alias: str,
) -> DataFrame:
    """One staged side of the outer stream-stream joins: the fixture's
    rows of one event type plus TWO flush sentinels 48 h / 96 h past
    the real data (negative ids; excluded batch-side after the sink —
    an in-plan filter would be pushed through EventTimeWatermark into
    the scan and starve the watermark, see stream_stream_left_outer_
    join's docstring). Staging is fixture-derived and mtime-pinned, so
    it is cached per (fixture, side) and SHARED by the left- and
    full-outer queries."""
    import glob
    import hashlib

    from spark_lineage_spark.tables import _normalize_ts, load, table_path

    ev = load(spark, sf_dir, "events")
    ev_src = table_path(sf_dir, "events")
    st = os.stat(ev_src)
    fixture_key = hashlib.md5(
        f"{ev_src}:{st.st_size}:{st.st_mtime_ns}:ssloj".encode()
    ).hexdigest()[:10]
    cache_root = os.path.join(tempfile.gettempdir(), f"sls_ssloj_src_{fixture_key}")

    src = os.path.join(cache_root, f"src_{prefix}")
    if not os.path.exists(os.path.join(src, "_DONE")):
        max_ts = ev.agg(F.max("ts")).collect()[0][0]  # driver scalar

        def sentinel_at(hours: int) -> DataFrame:
            return _flush_sentinel(spark, ev.schema, max_ts, hours, -1, etype)

        tmp = f"{src}.{os.getpid()}.{uuid.uuid4().hex[:6]}.tmp"
        os.makedirs(tmp, exist_ok=True)
        batches = (
            (0, ev.filter(F.col("event_type") == etype)),
            (1, sentinel_at(48)),
            (2, sentinel_at(96)),
        )
        for k, batch_df in batches:
            stage = os.path.join(run_dir, f"stage_src_{prefix}{k}")
            batch_df.coalesce(1).write.mode("overwrite").parquet(stage)
            part = glob.glob(stage + "/part-*.parquet")[0]
            dst = os.path.join(tmp, f"b{k}.parquet")
            shutil.move(part, dst)
            os.utime(dst, (1_600_000_000 + k, 1_600_000_000 + k))
            shutil.rmtree(stage)
        open(os.path.join(tmp, "_DONE"), "w").close()
        os.makedirs(cache_root, exist_ok=True)
        try:
            os.rename(tmp, src)
        except OSError:
            shutil.rmtree(tmp, ignore_errors=True)  # lost the race
    schema = spark.read.parquet(os.path.join(src, "b0.parquet")).schema
    return (
        _normalize_ts(
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        .withWatermark("ts", "2 hours")
        .select(
            F.col("event_id").alias(id_alias),
            F.col("user_id").alias(f"{prefix}_user"),
            F.col("ts").alias(f"{prefix}_ts"),
        )
    )


@query(
    "stream_stream_left_outer_join",
    "§2.9 stream-stream LEFT OUTER interval join (watermark-evicted null extension)",
    """
    SELECT p.event_id AS purchase_id, c.event_id AS click_id
    FROM events p LEFT JOIN events c
      ON p.user_id = c.user_id
     AND c.event_type = 'click'
     AND date_trunc('microseconds', c.ts) >= date_trunc('microseconds', p.ts) - INTERVAL '1 hour'
     AND date_trunc('microseconds', c.ts) <= date_trunc('microseconds', p.ts)
    WHERE p.event_type = 'purchase'
    """,
)
def stream_stream_left_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The state-eviction-proving half of SURVEY §2.9's stream-stream
    join row (VERDICT r7 item 3): a LEFT OUTER interval join. Matched
    (purchase, click) pairs emit as they arrive exactly like
    stream_stream_join; a purchase with NO click in its 1 h lookback
    emits null-extended only once the join watermark passes its match
    window and its state is EVICTED — the part an inner join never
    exercises. A finite availableNow run would withhold every
    still-open purchase, so each staged stream appends TWO flush
    sentinels 48 h and 96 h past the real data (the
    stream_chained_stateful discipline, doubled because a join applies
    the watermark computed from batch N's data during batch N+1: the
    first flush advances the watermark beyond every real purchase's
    window, the second triggers the batch in which that watermark
    evicts them): all unmatched purchases emit with click_id NULL.
    Sentinels carry negative event/user ids (they match nothing real)
    and are excluded from the result BATCH-SIDE, after the sink is
    read back — NOT inside the streaming plan: Catalyst pushes any
    non-event-time predicate THROUGH EventTimeWatermark into the
    parquet scan (verified in this plan: an in-plan purchase_id >= 0
    became PushedFilters GreaterThanOrEqual(event_id,0), silently
    pruning the sentinel before it could ever advance the watermark —
    the min-policy global watermark then pins forever and the tail of
    unmatched purchases is withheld). The two sides are staged as two
    SEPARATE pre-split directories (purchases / clicks, each with its
    own sentinel files): the faithful two-topic shape, and it keeps
    each side's watermark fed without event_type filters in the plan.
    Oracle = the batch LEFT JOIN under the same time bound; the
    late-match-stays-unmatched property is
    tests/test_streaming.py::test_stream_left_outer_late_match_stays_unmatched.

    State bound at 100 TB: each side holds only rows younger than
    watermark delay + join range (2 h + 1 h here) — eviction is exactly
    what this query proves, so a month-long run holds hours, not the
    month."""
    run_dir = tempfile.mkdtemp(prefix="sls_ssloj_")
    joined = (
        _outer_join_side(spark, sf_dir, run_dir, "p", "purchase", "purchase_id")
        .join(
            _outer_join_side(spark, sf_dir, run_dir, "c", "click", "click_id"),
            (F.col("p_user") == F.col("c_user"))
            & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR"))
            & (F.col("c_ts") <= F.col("p_ts")),
            "leftOuter",
        )
        .select("purchase_id", "click_id")
    )
    out = run_to_memory(joined, mode="append")
    # the 48 h sentinel purchase emits null-extended when the 96 h
    # flush evicts it; drop it HERE, on the batch sink contents — an
    # in-plan filter would push below the watermark (see docstring)
    out = out.filter(F.col("purchase_id") >= 0)
    shutil.rmtree(run_dir, ignore_errors=True)
    return out


@query(
    "stream_static_join",
    "§2.9 stream-static join (streaming fact x batch dim broadcast)",
    """
    SELECT c.c_mktsegment AS segment, e.event_type,
           count(*) AS n, round(sum(e.value), 2) AS total_value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY c.c_mktsegment, e.event_type
    """,
)
def stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming fact joined to a static dimension — the enrichment
    shape every streaming pipeline starts with. The static side is a
    plain batch DataFrame; Spark re-plans it per micro-batch and (being
    small) broadcasts it, so the stream side never shuffles for the
    join — state is only needed for the downstream aggregate. No
    watermark required: stream-static inner joins are stateless.

    availableNow over the staged events dir ≡ the batch join oracle.
    """
    from spark_lineage_spark.tables import load

    ev = events_stream(spark, sf_dir).select("user_id", "event_type", "value")
    dim = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    joined = ev.join(F.broadcast(dim), ev.user_id == dim.c_custkey)
    agg = joined.groupBy(
        F.col("c_mktsegment").alias("segment"), "event_type"
    ).agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
    return run_to_memory(agg, mode="complete")


@query(
    "stream_stateful_count",
    "§2.9 custom stateful operator (applyInPandasWithState running totals)",
    """
    SELECT user_id, count(*) AS n_events,
           round(sum(value), 4) AS total_value
    FROM events GROUP BY user_id
    """,
)
def stream_stateful_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary stateful processing: per-user running (count, sum)
    kept in a GroupState and emitted on update — the
    applyInPandasWithState shape every custom streaming aggregate
    (sessionizers, anomaly trackers, CDC reconcilers) builds on. State
    is one tuple per key per state-store partition; at scale the
    shuffle.partitions knob (sized in run_to_memory) sets store count.

    The staged events dir is a single file, so availableNow runs
    exactly one micro-batch and update-mode emits one final row per
    user — equal to the batch GROUP BY oracle.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def running(key, pdfs, state: GroupState):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 4)]}
        )

    ev = events_stream(spark, sf_dir).select("user_id", "value")
    out = ev.groupBy("user_id").applyInPandasWithState(
        running,
        outputStructType="user_id long, n_events long, total_value double",
        stateStructType="n long, total double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return run_to_memory(out, mode="update")


@query(
    "stream_transform_with_state",
    "§2.9 transformWithStateInPandas (Spark 4 stateful API: ValueState + MapState)",
    """
    SELECT user_id, count(*) AS n_events,
           round(sum(value), 4) AS total_value,
           count(DISTINCT event_type) AS n_event_types
    FROM events GROUP BY user_id
    """,
)
def stream_transform_with_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Spark-4 arbitrary-stateful API
    (pyspark:sql/pandas/group_ops.py:427 ``transformWithStateInPandas``),
    successor to ``applyInPandasWithState`` (stream_stateful_count):
    a ``StatefulProcessor`` with TYPED, composable state — a ValueState
    for the per-user (count, sum) running totals plus a MapState keyed
    by event_type for per-type counts, where the old API forced one
    monolithic state tuple per key. Requires the RocksDB state-store
    provider (state lives off-heap and snapshots incrementally —
    the 100 TB posture: state volume is bounded by keys x state
    schema, not micro-batch size, and store count = shuffle
    partitions, sized in run_to_memory).

    ENV GATE (import-try, brief's rule for missing libs): the
    transformWithState state-server protocol speaks protobuf
    (pyspark/sql/streaming/proto/StateMessage_pb2.py), and
    ``google.protobuf`` is not shipped in this container (pip installs
    forbidden) — the PRE_INIT driver worker crashes at import. When
    protobuf is importable the real transformWithStateInPandas path
    runs (RocksDB provider scoped to the run); otherwise the SAME
    per-key state machine runs through applyInPandasWithState, whose
    wire protocol is Arrow-only, producing identical rows. Both paths
    share one output schema/rounding, so the oracle checks whichever
    executed; tests/test_streaming.py gates the TWS-specific test the
    same way.

    The staged events dir is a single file, so availableNow runs
    exactly one micro-batch and update-mode emits one final row per
    user — equal to the batch GROUP BY oracle.
    """
    import pandas as pd

    out_schema = "user_id long, n_events long, total_value double, n_event_types long"
    ev = events_stream(spark, sf_dir).select("user_id", "event_type", "value")

    try:
        import pyspark.sql.streaming.proto.StateMessage_pb2  # noqa: F401

        has_tws_protocol = True
    except ImportError:
        has_tws_protocol = False

    if has_tws_protocol:
        from pyspark.sql.streaming.stateful_processor import (
            StatefulProcessor,
            StatefulProcessorHandle,
        )

        class UserStats(StatefulProcessor):
            def init(self, handle: StatefulProcessorHandle) -> None:
                self.totals = handle.getValueState("totals", "n long, total double")
                self.by_type = handle.getMapState(
                    "by_type", "event_type string", "n long"
                )

            def handleInputRows(self, key, rows, timerValues):
                n, total = self.totals.get() or (0, 0.0)
                for pdf in rows:
                    n += len(pdf)
                    total += float(pdf["value"].sum())
                    for etype, cnt in pdf["event_type"].value_counts().items():
                        prev = self.by_type.getValue((etype,)) or (0,)
                        self.by_type.updateValue((etype,), (prev[0] + int(cnt),))
                self.totals.update((n, total))
                n_types = sum(1 for _ in self.by_type.keys())
                yield pd.DataFrame(
                    {
                        "user_id": [key[0]],
                        "n_events": [n],
                        "total_value": [round(total, 4)],
                        "n_event_types": [n_types],
                    }
                )

            def close(self) -> None:
                pass

        out = ev.groupBy("user_id").transformWithStateInPandas(
            statefulProcessor=UserStats(),
            outputStructType=out_schema,
            outputMode="Update",
            timeMode="None",
        )
        # transformWithState requires the RocksDB provider; scope it to
        # this run and restore (other stateful queries keep the default)
        prev = spark.conf.get(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state."
            "HDFSBackedStateStoreProvider",
        )
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        )
        try:
            return run_to_memory(out, mode="update")
        finally:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)

    # fallback: identical state machine on the Arrow-wire stateful API
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def user_stats(key, pdfs, state: GroupState):
        n, total, types = state.get if state.exists else (0, 0.0, [])
        seen = set(types)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
            seen |= set(pdf["event_type"])
        state.update((n, total, sorted(seen)))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [round(total, 4)],
                "n_event_types": [len(seen)],
            }
        )

    out = ev.groupBy("user_id").applyInPandasWithState(
        user_stats,
        outputStructType=out_schema,
        stateStructType="n long, total double, types array<string>",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return run_to_memory(out, mode="update")


@query(
    "stream_chained_stateful",
    "§2.9 chained stateful operators (dedup-within-watermark -> tumbling window, append mode)",
    """
    SELECT time_bucket(INTERVAL '6 hours', date_trunc('microseconds', ts)) AS window_start,
           count(*) AS n,
           round(sum(value), 4) AS total_value
    FROM events GROUP BY 1
    """,
)
def stream_chained_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TWO stateful operators chained in ONE streaming query (the
    Spark-3.5+/4 multiple-stateful-operators capability):
    ``dropDuplicatesWithinWatermark`` absorbs an at-least-once
    delivery duplicate of EVERY event (batch 0 carries each event
    twice), and the surviving stream feeds a tumbling-window
    aggregation — in APPEND mode, the production output mode, where a
    window emits only once its end passes the watermark. A finite
    availableNow run would therefore withhold every still-open window,
    so batch 1 is a single FLUSH sentinel 48 h past the real data:
    processing it advances the watermark beyond every real window's
    end, they all emit, and the sentinel's own window (still open when
    the run terminates) never does — the emitted set is exactly the
    batch GROUP BY oracle with the duplicates removed. Dedup state is
    bounded by the watermark delay (1 h of event_ids), window state by
    open windows — both the shapes that hold at 100 TB."""
    import glob

    from spark_lineage_spark.tables import load

    run_dir = tempfile.mkdtemp(prefix="sls_chain_")
    src = os.path.join(run_dir, "src")
    os.makedirs(src)
    ev = load(spark, sf_dir, "events")
    max_ts = ev.agg(F.max("ts")).collect()[0][0]  # driver scalar, metadata-scale
    doubled = ev.unionByName(ev)
    flush = _flush_sentinel(spark, ev.schema, max_ts, 48, 0, "flush")
    for k, batch_df in ((0, doubled), (1, flush)):
        stage = os.path.join(run_dir, f"stage{k}")
        batch_df.coalesce(1).write.mode("overwrite").parquet(stage)
        part = glob.glob(stage + "/part-*.parquet")[0]
        dst = os.path.join(src, f"b{k}.parquet")
        shutil.move(part, dst)
        os.utime(dst, (1_600_000_000 + k, 1_600_000_000 + k))
        shutil.rmtree(stage)

    schema = spark.read.parquet(os.path.join(src, "b0.parquet")).schema
    from spark_lineage_spark.tables import _normalize_ts

    stream = _normalize_ts(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    deduped = stream.withWatermark("ts", "1 hour").dropDuplicatesWithinWatermark(
        ["event_id"]
    )
    agg = deduped.groupBy(F.window("ts", "6 hours")).agg(
        F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("total_value")
    )
    out = run_to_memory(agg, mode="append")
    shutil.rmtree(run_dir, ignore_errors=True)
    return out.select(
        F.col("window.start").alias("window_start"), "n", "total_value"
    )


def _simhash_stream_oracle() -> str:
    from spark_lineage_spark.operators.dedup import _SIMHASH_CTES

    return (
        _SIMHASH_CTES
        + """,
    docs AS (SELECT doc_id, sig, CAST(doc_id % 3 AS INT) AS batch_id FROM sigs),
    near AS (SELECT da, db FROM cand WHERE hamming <= 6)
    SELECT d.doc_id, d.batch_id, d.sig AS simhash
    FROM docs d
    WHERE NOT EXISTS (
      SELECT 1 FROM near n
      JOIN docs e ON e.doc_id = (CASE WHEN n.da = d.doc_id THEN n.db ELSE n.da END)
      WHERE (n.da = d.doc_id OR n.db = d.doc_id)
        AND (e.batch_id < d.batch_id
             OR (e.batch_id = d.batch_id AND e.doc_id < d.doc_id))
    )
    """
    )


@query(
    "stream_dedup_simhash",
    "§2.9/§2.11 streaming near-dup dedup (SimHash probe of an accumulating "
    "index in foreachBatch)",
    _simhash_stream_oracle(),
)
def stream_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The real-time ingest shape VERDICT r6 item 8 asks for:
    ``dropDuplicatesWithinWatermark`` (stream_dedup_watermark) handles
    EXACT keys only — this handles NEAR-duplicates. Documents arrive in
    micro-batches (staged here as 3 files by doc_id % 3,
    maxFilesPerTrigger=1, mtimes pinned so batch order is
    deterministic); each foreachBatch signs the batch with the
    portable md5 SimHash (_simhash_signatures — the identical pipeline
    as the batch operator), probes an ACCUMULATING signature index via
    the 8-byte-band blocking join (never all-pairs), and drops any doc
    within hamming ≤ 6 of an earlier doc — earlier batch, or same
    batch with smaller doc_id. ALL batch docs (kept and dropped) are
    appended to the index: "index everything seen, emit only novel",
    the semantics that keep the oracle non-recursive and are the
    standard crawl-dedup choice.

    The index IS the persisted band-row table of
    llm_dedup_persistent_index (VERDICT r7 item 2): each batch appends
    its 8 (doc_id, simhash, band_idx, band_key) band rows to a table
    bucketed+sorted on (band_idx, band_key), so a later batch's probe
    is an equi-join in which ONLY the batch's band rows shuffle — the
    accumulated index is scanned in its bucket layout with no exchange
    and no per-batch re-expansion. Per-batch work is O(batch + matched
    buckets), not O(everything seen so far): the O(B·N) total-index
    rescan of the round-7 implementation is gone.

    Fully oracle-checked: SimHash is md5-portable, so DuckDB replays
    signatures, band candidates, AND the batch-order drop rule; the
    planted-near-dup-in-a-later-batch property is
    tests/test_streaming.py::test_stream_simhash_drops_planted_near_dup."""
    import glob

    from spark_lineage_spark.operators.dedup import (
        _simhash_bands,
        _simhash_signatures,
    )
    from spark_lineage_spark.operators.sources_sinks import (
        _drop_table_and_location,
        _reap_stale_warehouse_dirs,
    )
    from spark_lineage_spark.tables import load

    # stage the 3 micro-batch files (deterministic order via mtime),
    # keyed by the fixture like _stream_dir so repeated invocations
    # (bench passes, AUDIT best-of-2) skip the 3 parquet writes; the
    # rename is atomic so concurrent stagings can't interleave
    import hashlib

    doc_src = table_path(sf_dir, "documents")
    st = os.stat(doc_src)
    fixture_key = hashlib.md5(
        f"{doc_src}:{st.st_size}:{st.st_mtime_ns}".encode()
    ).hexdigest()[:10]
    src = os.path.join(tempfile.gettempdir(), f"sls_sdsh_src_{fixture_key}")
    if not all(
        os.path.exists(os.path.join(src, f"b{k}.parquet")) for k in range(3)
    ):
        stage_root = tempfile.mkdtemp(prefix="sls_sdsh_stage_")
        docs = load(spark, sf_dir, "documents")
        os.makedirs(src, exist_ok=True)
        for k in range(3):
            stage = os.path.join(stage_root, f"stage{k}")
            docs.filter(F.col("doc_id") % 3 == k).coalesce(1).write.mode(
                "overwrite"
            ).parquet(stage)
            part = glob.glob(stage + "/part-*.parquet")[0]
            dst = os.path.join(src, f"b{k}.parquet")
            tmp = f"{dst}.{os.getpid()}.{uuid.uuid4().hex[:6]}.tmp"
            shutil.move(part, tmp)
            os.utime(tmp, (1_600_000_000 + k, 1_600_000_000 + k))
            try:
                os.rename(tmp, dst)
            except OSError:
                os.unlink(tmp)  # lost the race; winner's copy is complete
        shutil.rmtree(stage_root, ignore_errors=True)

    # index/output/checkpoint are PER-RUN (the accumulating index must
    # start empty every invocation); the band-row index is a bucketed
    # CATALOG table so its bucket layout survives per-batch appends —
    # stale tables from crashed runs are reaped like the other
    # warehouse-staged fixtures
    run_dir = tempfile.mkdtemp(prefix="sls_sdsh_run_")
    out_dir = os.path.join(run_dir, "out")
    t_index = f"sls_sdsh_idx_{uuid.uuid4().hex[:10]}"
    _reap_stale_warehouse_dirs(spark, "sls_sdsh_idx_")

    def dedup_batch(batch_df: DataFrame, batch_id: int) -> None:
        ss = batch_df.sparkSession
        sigs = _simhash_signatures(batch_df.filter(F.col("text").isNotNull()))
        bands = _simhash_bands(sigs)
        hamming_ok = (
            F.bit_count(F.col("p.simhash").bitwiseXOR(F.col("i.simhash"))) <= 6
        )
        dropped_cols = [F.col("p.doc_id").alias("doc_id")]
        # probe the accumulated BAND-ROW index: equi-join on the bucket
        # key (band_idx, band_key) — only this batch's band rows
        # shuffle; the index scans in place, already banded and already
        # bucketed, so nothing accumulated is ever recomputed
        dropped = None
        if ss.catalog.tableExists(t_index):
            dropped = (
                bands.alias("p")
                .join(
                    ss.table(t_index).alias("i"),
                    (F.col("p.band_idx") == F.col("i.band_idx"))
                    & (F.col("p.band_key") == F.col("i.band_key")),
                )
                .filter(hamming_ok)
                .select(*dropped_cols)
            )
        # intra-batch: smaller doc_id wins
        intra = (
            bands.alias("p")
            .join(
                bands.alias("i"),
                (F.col("p.band_idx") == F.col("i.band_idx"))
                & (F.col("p.band_key") == F.col("i.band_key"))
                & (F.col("i.doc_id") < F.col("p.doc_id")),
            )
            .filter(hamming_ok)
            .select(*dropped_cols)
        )
        dropped = intra if dropped is None else dropped.unionByName(intra)
        survivors = sigs.join(dropped.distinct(), "doc_id", "left_anti")
        survivors.write.mode("append").parquet(out_dir)
        # index EVERYTHING seen (kept and dropped): append this batch's
        # band rows into the bucketed layout (8 rows × 16 bytes/doc)
        bands.write.bucketBy(8, "band_idx", "band_key").sortBy(
            "band_idx", "band_key"
        ).mode("append").saveAsTable(t_index)

    schema = spark.read.parquet(os.path.join(src, "b0.parquet")).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    ckpt = os.path.join(run_dir, "ckpt")
    q = (
        stream.writeStream.foreachBatch(dedup_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = (
        spark.read.parquet(out_dir)
        .select(
            "doc_id",
            (F.col("doc_id") % 3).cast("int").alias("batch_id"),
            "simhash",
        )
        .transform(lineage_checkpoint)
    )
    _drop_table_and_location(spark, t_index)
    shutil.rmtree(run_dir, ignore_errors=True)
    return out


@query(
    "stream_rate_source_window",
    "§2.1/§2.9 rate source → tumbling window agg over derived event time",
    """
    SELECT 1600000000 + (range // 100) * 100 AS window_start_epoch,
           count(*) AS n,
           CAST(sum(range) AS BIGINT) AS value_sum
    FROM range(0, 1000)
    GROUP BY 1
    """,
)
def stream_rate_source_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The built-in ``rate-micro-batch`` source (SURVEY §2.1's second
    streaming source): a synthetic (timestamp, value) generator — the
    standard load-generator for sizing stateful pipelines before real
    data lands. ``value`` is a deterministic 0..rowsPerBatch-1
    sequence, so deriving event time as epoch+value seconds makes the
    whole windowed aggregation reproducible and oracle-checkable
    (DuckDB range()) — unlike the wall-clock ``rate`` variant.

    availableNow terminates after the generator's available offsets,
    so the run is finite; watermark bounds window state exactly as it
    would on an unbounded run.
    """
    stream = (
        spark.readStream.format("rate-micro-batch")
        .option("rowsPerBatch", "1000")
        .option("startTimestamp", "1600000000000")
        .load()
    )
    evented = stream.withColumn(
        "ts", F.timestamp_seconds(F.lit(1_600_000_000) + F.col("value"))
    )
    agg = (
        evented.withWatermark("ts", "10 seconds")
        .groupBy(F.window("ts", "100 seconds"))
        .agg(F.count("*").alias("n"), F.sum("value").alias("value_sum"))
    )
    out = run_to_memory(agg, mode="complete")
    return out.select(
        F.unix_seconds(F.col("window.start")).alias("window_start_epoch"),
        "n",
        "value_sum",
    )


@query(
    "stream_foreach_batch_sink",
    "§2.9 foreachBatch sink (exactly-once escape hatch) + re-read",
    """
    SELECT event_type, count(*) AS n,
           round(sum(value), 4) AS total_value
    FROM events GROUP BY event_type
    """,
)
def stream_foreach_batch_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """foreachBatch: each micro-batch lands through arbitrary batch
    code — here an idempotent parquet write keyed by epoch, the
    pattern every exactly-once custom sink (JDBC upsert, merge table)
    builds on. The staged events dir is one file ⇒ one epoch, so the
    re-read equals the batch aggregate. Aggregation happens INSIDE the
    batch function on the micro-batch DataFrame (no streaming state);
    the epoch directory is overwritten on replay — that idempotence,
    plus the checkpoint, is the exactly-once contract."""
    out = os.path.join(tempfile.mkdtemp(prefix="sls_fb_"), "out")

    def handle(batch_df: DataFrame, epoch_id: int) -> None:
        (
            batch_df.groupBy("event_type")
            .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("total_value"))
            .write.mode("overwrite")
            .parquet(f"{out}/epoch={epoch_id}")
        )

    ev = events_stream(spark, sf_dir).select("event_type", "value")
    ckpt = os.path.join(tempfile.mkdtemp(prefix="sls_ckpt_"), "ckpt")
    q = (
        ev.writeStream.foreachBatch(handle)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    shutil.rmtree(os.path.dirname(ckpt), ignore_errors=True)
    back = spark.read.parquet(f"{out}/epoch=0")
    # detach from the temp dir so it can be reclaimed
    result = back.transform(lineage_checkpoint)
    shutil.rmtree(os.path.dirname(out), ignore_errors=True)
    return result.select("event_type", "n", "total_value")


@query(
    "source_python_stream",
    "§2.1/§2.9 Spark-4 Python STREAMING data source (SimpleDataSourceStreamReader)",
    """
    SELECT CAST(i % 5 AS BIGINT) AS bucket, count(*) AS n,
           CAST(sum(i) AS BIGINT) AS total
    FROM (SELECT unnest(generate_series(0, 1999)) AS i)
    GROUP BY 1
    """,
)
def source_python_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom STREAMING source in pure Python (pyspark.sql.datasource
    SimpleDataSourceStreamReader): offset-tracked micro-batches — the
    escape hatch for queues/APIs with no built-in connector. The
    reader hands out a deterministic integer range and then reports
    no new data; availableNow drains exactly what was available at
    trigger time (one prefetched batch for a simple reader — hence one
    full-range batch here), so the aggregate equals the DuckDB range
    oracle. Offsets make it replayable: restart from the checkpoint
    re-reads from the recorded offset (exactly-once with an
    idempotent sink). The simple-reader API is driver-side prefetch —
    right for low-volume control streams; a partitioned
    DataSourceStreamReader is the high-volume form."""
    from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader

    N, STEP = 2000, 2000  # availableNow drains ONE prefetched batch

    class CounterReader(SimpleDataSourceStreamReader):
        def initialOffset(self):
            return {"pos": 0}

        def read(self, start):
            pos = start["pos"]
            end = min(pos + STEP, N)
            return iter([(i,) for i in range(pos, end)]), {"pos": end}

        def readBetweenOffsets(self, start, end):
            return iter([(i,) for i in range(start["pos"], end["pos"])])

    class CounterSource(DataSource):
        @classmethod
        def name(cls):
            return "sls_synth_counter_stream"

        def schema(self):
            return "i bigint"

        def simpleStreamReader(self, schema):
            return CounterReader()

    try:
        spark.dataSource.register(CounterSource)
    except Exception:
        pass  # already registered in this session
    stream = spark.readStream.format("sls_synth_counter_stream").load()
    agg = stream.groupBy((F.col("i") % 5).alias("bucket")).agg(
        F.count("*").alias("n"), F.sum("i").alias("total")
    )
    return run_to_memory(agg, mode="complete")


@query(
    "source_python_stream_partitioned",
    "§2.1/§2.9 partitioned Python streaming source (executor-parallel reads)",
    """
    SELECT CAST(i % 4 AS BIGINT) AS bucket, count(*) AS n,
           CAST(sum(i) AS BIGINT) AS total
    FROM (SELECT unnest(generate_series(0, 3999)) AS i)
    GROUP BY 1
    """,
)
def source_python_stream_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The high-volume form of the Python streaming source:
    DataSourceStreamReader with explicit offsets — each micro-batch's
    offset range SPLITS into InputPartitions that executors read in
    parallel (the simple-reader variant prefetches on the driver;
    this one scales reads with the cluster). The generator is a
    deterministic integer range so availableNow drains exactly
    [0, 4000) and the aggregate equals the DuckDB range oracle."""
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceStreamReader,
        InputPartition,
    )

    N, PARTS = 4000, 4

    class RangePartition(InputPartition):
        def __init__(self, start, end):
            self.start, self.end = start, end

    class PartitionedCounterReader(DataSourceStreamReader):
        def initialOffset(self):
            return {"pos": 0}

        def latestOffset(self):
            return {"pos": N}

        def partitions(self, start, end):
            lo, hi = start["pos"], end["pos"]
            step = max(1, (hi - lo) // PARTS)
            return [
                RangePartition(p, min(p + step, hi)) for p in range(lo, hi, step)
            ]

        def read(self, partition):
            # runs ON EXECUTORS — one task per InputPartition
            return iter([(i,) for i in range(partition.start, partition.end)])

        def commit(self, end):
            pass  # offsets are synthetic; nothing to release upstream

    class PartitionedCounterSource(DataSource):
        @classmethod
        def name(cls):
            return "sls_synth_counter_stream_part"

        def schema(self):
            return "i bigint"

        def streamReader(self, schema):
            return PartitionedCounterReader()

    try:
        spark.dataSource.register(PartitionedCounterSource)
    except Exception:
        pass  # already registered in this session
    stream = spark.readStream.format("sls_synth_counter_stream_part").load()
    agg = stream.groupBy((F.col("i") % 4).alias("bucket")).agg(
        F.count("*").alias("n"), F.sum("i").alias("total")
    )
    return run_to_memory(agg, mode="complete")


# sink_python_stream output/checkpoint dirs from prior invocations in
# this process (deferred cleanup — see the query body); the last entry
# pair is also how the companion test locates the manifest
_PYSINK_DIRS: list[str] = []


@query(
    "sink_python_stream",
    "§2.1/§2.9 Spark-4 Python STREAMING data sink (DataSourceStreamWriter)",
    """
    SELECT event_type, count(*) AS n,
           cast(round(sum(cast(value AS DECIMAL(18,6))), 2) AS DOUBLE)
             AS total_value
    FROM events WHERE value IS NOT NULL
    GROUP BY event_type
    """,
)
def sink_python_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom STREAMING sink in pure Python (pyspark.sql.datasource
    DataSourceStreamWriter) — the writer-side complement of
    source_python_stream: executors call write(iterator) per task and
    return commit messages naming the files they produced; the driver
    calls commit(messages, batchId) and records a per-epoch manifest.
    Exactly-once comes from reading back ONLY manifest-listed files —
    uncommitted task output from failed/speculative attempts is
    invisible, the same protocol every transactional file sink uses.

    The round trip is verified end-to-end: events stream through the
    sink as JSON lines (float bits survive via repr/parse), the
    manifest-listed files are read back in batch, and the aggregate
    must equal the DuckDB oracle over the original table. Decimal sums
    make the check exact.
    """
    import json as _json

    from pyspark.sql.datasource import (
        DataSource,
        DataSourceStreamWriter,
        WriterCommitMessage,
    )

    # the returned DataFrame reads the committed files LAZILY, so this
    # invocation's dirs must outlive the call — clean up the PREVIOUS
    # invocation's instead (bounded one-dir leak per process; the
    # module global also hands the test the manifest location)
    while _PYSINK_DIRS:
        shutil.rmtree(_PYSINK_DIRS.pop(), ignore_errors=True)
    out_dir = tempfile.mkdtemp(prefix="sls_pysink_")

    class FilesCommitted(WriterCommitMessage):
        def __init__(self, paths):
            self.paths = paths

    class JsonLinesWriter(DataSourceStreamWriter):
        def __init__(self, options):
            self.path = options["path"]

        def write(self, iterator):
            fname = os.path.join(self.path, f"task-{uuid.uuid4().hex}.jsonl")
            n = 0
            with open(fname, "w") as f:
                for row in iterator:
                    f.write(
                        _json.dumps({"event_type": row.event_type, "value": row.value})
                        + "\n"
                    )
                    n += 1
            if n == 0:
                # an empty partition must not leave an orphan data file
                # outside the manifest (the exactly-once invariant the
                # read-back — and the companion test — relies on)
                os.unlink(fname)
                return FilesCommitted([])
            return FilesCommitted([fname])

        def commit(self, messages, batchId):
            manifest = os.path.join(self.path, f"_commit_{batchId}.json")
            paths = [p for m in messages if m is not None for p in m.paths]
            with open(manifest, "w") as f:
                _json.dump(paths, f)

        def abort(self, messages, batchId):
            for m in messages:
                for p in m.paths if m is not None else []:
                    try:
                        os.unlink(p)
                    except OSError:
                        pass

    class JsonLinesSink(DataSource):
        @classmethod
        def name(cls):
            return "sls_jsonl_stream_sink"

        def streamWriter(self, schema, overwrite):
            return JsonLinesWriter(self.options)

    try:
        spark.dataSource.register(JsonLinesSink)
    except Exception:
        pass  # already registered in this session

    src = events_stream(spark, sf_dir).filter(F.col("value").isNotNull()).select(
        "event_type", "value"
    )
    ckpt_root = tempfile.mkdtemp(prefix="sls_ckpt_")
    ckpt = os.path.join(ckpt_root, "ckpt")
    _PYSINK_DIRS.extend([out_dir, ckpt_root])
    q = (
        src.writeStream.format("sls_jsonl_stream_sink")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # read back ONLY committed files (the exactly-once contract)
    committed: list[str] = []
    for fn in os.listdir(out_dir):
        if fn.startswith("_commit_"):
            with open(os.path.join(out_dir, fn)) as f:
                committed.extend(_json.load(f))
    back = spark.read.schema("event_type string, value double").json(committed)
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum(F.col("value").cast("decimal(18,6)")), 2)
        .cast("double")
        .alias("total_value"),
    )


def _split_events_dir(sf_dir: str, n_parts: int = 4) -> str:
    """Stage events.parquet as n_parts single-file parquets keyed by
    event_id % n_parts (deterministic), cached per fixture like
    _stream_dir. Used by restart-shaped queries that need files to
    arrive in waves."""
    import hashlib

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    # the wave key below is bit_wise_and(event_id, n_parts - 1), which
    # equals event_id % n_parts ONLY for powers of two (ADVICE r7 — a
    # non-power-of-two count would silently skew/empty the waves)
    assert n_parts & (n_parts - 1) == 0 and n_parts > 0, n_parts
    src = table_path(sf_dir, "events")
    st = os.stat(src)
    key = hashlib.md5(
        f"{src}:{st.st_size}:{st.st_mtime_ns}:split{n_parts}".encode()
    ).hexdigest()[:10]
    d = os.path.join(tempfile.gettempdir(), f"sls_stream_split_{key}")
    done = os.path.join(d, "_DONE")
    if not os.path.exists(done):
        tmp = f"{d}.{os.getpid()}.{uuid.uuid4().hex[:6]}.tmp"
        os.makedirs(tmp, exist_ok=True)
        t = pq.read_table(src)
        mod = pc.bit_wise_and(t.column("event_id"), n_parts - 1)
        for i in range(n_parts):
            pq.write_table(t.filter(pc.equal(mod, i)), os.path.join(tmp, f"f{i}.parquet"))
        open(os.path.join(tmp, "_DONE"), "w").close()
        try:
            os.rename(tmp, d)
        except OSError:
            shutil.rmtree(tmp, ignore_errors=True)  # lost the race
    return d


@query(
    "stream_checkpoint_recovery",
    "§2.9 checkpoint restart + exactly-once file sink (no reprocessing across runs)",
    """
    SELECT event_type,
           count(*) AS n_events,
           CAST(sum(CAST(round(value * 1000000) AS BIGINT)) AS BIGINT) AS sum_micro
    FROM events GROUP BY event_type
    """,
)
def stream_checkpoint_recovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The restart drill every production pipeline must pass: run a
    streaming ingest over the first half of the input files, STOP, let
    more files land, then start a NEW query from the SAME checkpoint.
    The file source's checkpoint records which files batch N consumed,
    so run 2 processes ONLY the new arrivals; the parquet file sink's
    _spark_metadata commit log makes the output transactional (a batch
    re-read through the log sees exactly the committed files — a
    half-written or reprocessed batch would either not appear or
    appear twice). The oracle is the batch aggregate over ALL events:
    any dropped file undercounts, any reprocessed file double-counts,
    so the value-hash IS the exactly-once check. Sums are exact
    integer micro-units (no float accumulation across the
    batch/stream boundary)."""
    from spark_lineage_spark.tables import _normalize_ts

    split = _split_events_dir(sf_dir)
    schema = spark.read.parquet(table_path(sf_dir, "events")).schema
    work = tempfile.mkdtemp(prefix="sls_ckpt_recovery_")
    in_dir = os.path.join(work, "in")
    out_dir = os.path.join(work, "out")
    ckpt = os.path.join(work, "ckpt")
    os.makedirs(in_dir)

    def run_once() -> None:
        stream = _normalize_ts(spark.readStream.schema(schema).parquet(in_dir))
        q = (
            stream.select("event_id", "event_type", "value")
            .writeStream.format("parquet")
            .outputMode("append")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # wave 1: half the files -> run to completion -> query STOPS
    for i in (0, 1):
        shutil.copy(os.path.join(split, f"f{i}.parquet"), in_dir)
    run_once()
    # wave 2: the rest land; a NEW query resumes from the checkpoint
    for i in (2, 3):
        shutil.copy(os.path.join(split, f"f{i}.parquet"), in_dir)
    run_once()

    out = (
        spark.read.parquet(out_dir)  # reads through _spark_metadata
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 1_000_000).cast("bigint")).alias(
                "sum_micro"
            ),
        )
        .transform(lineage_checkpoint)
    )
    shutil.rmtree(work, ignore_errors=True)
    return out


@query(
    "stream_update_mode_agg",
    "§2.9 UPDATE output mode (per-batch changed keys; latest update == batch agg)",
    """
    SELECT event_type,
           count(*) AS n_events,
           CAST(sum(CAST(round(value * 1000000) AS BIGINT)) AS BIGINT) AS sum_micro
    FROM events GROUP BY event_type
    """,
)
def stream_update_mode_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The third output mode (append and complete are covered by the
    window/static-join queries): UPDATE emits, each micro-batch, ONLY
    the aggregate rows that changed — the changelog shape every
    stream-to-KV-store pipeline consumes. Events arrive in 4 waves
    (_split_events_dir); foreachBatch lands each batch's update rows
    tagged with its batch_id, and the LATEST update per key (max
    batch_id that touched it) must equal the full batch aggregate —
    which is the oracle, so correctness proves both the no-watermark
    unbounded-state semantics AND that intermediate updates compose
    to the final answer. State is one row per event_type; at 100 TB
    an update-mode agg is sized by distinct keys, not input rows."""
    from spark_lineage_spark.tables import _normalize_ts

    split = _split_events_dir(sf_dir)
    schema = spark.read.parquet(table_path(sf_dir, "events")).schema
    run_dir = tempfile.mkdtemp(prefix="sls_upd_")
    out_dir = os.path.join(run_dir, "out")

    agg = (
        _normalize_ts(
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(split)
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.expr("CAST(round(value * 1000000) AS BIGINT)")).alias(
                "sum_micro"
            ),
        )
    )

    def land(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.withColumn("batch_id", F.lit(batch_id)).write.mode(
            "append"
        ).parquet(out_dir)

    # Optimization r15 (guide §5; the run_to_memory sizing, which this
    # foreachBatch path bypassed): without it the update-mode agg
    # committed 32 state stores × 5 micro-batches — 4 stores cover the
    # handful of event_type keys. Store count never changes WHAT the
    # agg emits, only how many state partitions hold it.
    with _stream_state_shuffle(spark):
        q = (
            agg.writeStream.outputMode("update")
            .foreachBatch(land)
            .option("checkpointLocation", os.path.join(run_dir, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    updates = spark.read.parquet(out_dir)
    w = Window.partitionBy("event_type").orderBy(F.desc("batch_id"))
    out = (
        updates.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("event_type", "n_events", "sum_micro")
        .transform(lineage_checkpoint)
    )
    shutil.rmtree(run_dir, ignore_errors=True)
    return out


@query(
    "stream_observe_metrics",
    "§2.9 streaming observe(): per-batch executor metrics summed == batch totals",
    """
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CAST(round(value * 1000000) AS BIGINT)) AS BIGINT)
             AS sum_micro,
           CAST(count(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT)
             AS n_purchases
    FROM events WHERE value IS NOT NULL
    """,
)
def stream_observe_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``df.observe`` on a STREAMING query (obs_observation_metrics
    covers batch): named aggregates computed on the executors during
    each micro-batch and surfaced through StreamingQueryProgress.
    observedMetrics — the per-batch data-quality counters production
    pipelines alert on, with NO second pass over the data. Each batch
    observes its own rows, so summing the per-batch metrics across the
    finite availableNow run must reproduce the batch totals — that sum
    IS the returned row and the oracle. Counts and micro-unit sums are
    exact integers, so cross-batch addition is associative."""
    from spark_lineage_spark.tables import _normalize_ts

    split = _split_events_dir(sf_dir)
    schema = spark.read.parquet(table_path(sf_dir, "events")).schema
    stream = (
        _normalize_ts(
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(split)
        )
        .filter(F.col("value").isNotNull())
        .observe(
            "sls_metrics",
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.expr("CAST(round(value * 1000000) AS BIGINT)")).alias(
                "sum_micro"
            ),
            F.count(F.when(F.col("event_type") == "purchase", 1)).alias(
                "n_purchases"
            ),
        )
    )
    ckpt = tempfile.mkdtemp(prefix="sls_obs_ckpt_")
    q = (
        stream.writeStream.format("noop")
        .option("checkpointLocation", os.path.join(ckpt, "c"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    totals = {"n_rows": 0, "sum_micro": 0, "n_purchases": 0}
    for p in q.recentProgress:
        m = (p.get("observedMetrics") or {}).get("sls_metrics")
        if m:
            for k in totals:
                totals[k] += int(m[k] or 0)
    shutil.rmtree(ckpt, ignore_errors=True)
    return spark.createDataFrame(
        [(totals["n_rows"], totals["sum_micro"], totals["n_purchases"])],
        "n_rows long, sum_micro long, n_purchases long",
    )


@query(
    "stream_source_archive_cleanup",
    "§2.1/§2.9 file-source cleanSource=archive (processed inputs moved aside)",
    """
    SELECT event_type, count(*) AS n_events
    FROM events GROUP BY event_type
    """,
)
def stream_source_archive_cleanup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The file source's ``cleanSource=archive`` option: after a batch
    COMMITS, its input files are moved to ``sourceArchiveDir`` — the
    landing-zone hygiene loop (ingest → archive) that otherwise needs
    an external janitor and risks racing the reader. Events arrive as
    4 waves into a fresh per-run inbox; after the availableNow run the
    aggregate must equal the batch GROUP BY (nothing lost or double-
    read around the moves) and the property test
    (tests/test_streaming.py::test_source_archive_moves_files) pins
    the mechanics: inbox emptied, archive holds the 4 files.
    NOTE archiving is asynchronous-ish (runs during following
    micro-batches), so the final sentinel wave exists to give the
    cleaner a batch in which to archive wave 3's file — at 100 TB this
    is a continuous stream and the lag is invisible."""
    from spark_lineage_spark.tables import _normalize_ts

    split = _split_events_dir(sf_dir)
    run_dir = tempfile.mkdtemp(prefix=f"sls_arch_{os.getpid()}_")
    inbox = os.path.join(run_dir, "inbox")
    archive = os.path.join(run_dir, "archive")
    os.makedirs(inbox)
    for fn in sorted(os.listdir(split)):
        if fn.endswith(".parquet"):
            shutil.copy(os.path.join(split, fn), os.path.join(inbox, fn))
    schema = spark.read.parquet(table_path(sf_dir, "events")).schema
    agg = (
        _normalize_ts(
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .option("cleanSource", "archive")
            .option("sourceArchiveDir", archive)
            .parquet(inbox)
        )
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    out = run_to_memory(agg, mode="complete")
    out = out.transform(lineage_checkpoint)
    # leave run_dir for the property test to inspect via the most
    # recent sls_arch_ dir; stale dirs are reaped on later calls, but
    # ONLY when their owning process is provably dead — an unconditional
    # rmtree here deleted a LIVE concurrent run's inbox/archive
    # mid-stream (bench + oracle-check concurrently; ADVICE r8). The
    # pid is embedded in the prefix, matching _proc_suffix discipline;
    # legacy un-pidded sls_arch_ dirs reap on age (>1h) instead.
    from spark_lineage_spark.operators.sources_sinks import _pid_alive

    now = time.time()
    for stale in os.listdir(tempfile.gettempdir()):
        p = os.path.join(tempfile.gettempdir(), stale)
        if not stale.startswith("sls_arch_") or p == run_dir:
            continue
        pid_s = stale[len("sls_arch_"):].split("_", 1)[0]
        if pid_s.isdigit():
            if int(pid_s) != os.getpid() and not _pid_alive(int(pid_s)):
                shutil.rmtree(p, ignore_errors=True)
        else:
            try:
                age_ok = now - os.path.getmtime(p) > 3600
            except OSError:
                age_ok = False
            if age_ok:
                shutil.rmtree(p, ignore_errors=True)
    return out


@query(
    "stream_foreach_writer",
    "§2.9 foreach sink (per-row ForeachWriter: open/process/close lifecycle)",
    """
    SELECT event_type, count(*) AS n,
           CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS total_cents
    FROM events GROUP BY event_type
    """,
)
def stream_foreach_writer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The row-level half of custom streaming sinks: writeStream
    .foreach(writer) ships a writer object to executors, and Spark
    drives the open(partition, epoch) → process(row)* → close(err)
    lifecycle per task. Unlike foreachBatch (whole-DataFrame batch
    hook), foreach sees ROWS — the shape for per-row pushes to KV
    stores/queues. Exactly-once is the WRITER's job: open() names its
    output by (partition, epoch), so any task retry overwrites rather
    than duplicates — the idempotence contract the docs require.
    Here each task appends JSON lines to a (partition, epoch)-keyed
    file; the batch re-read aggregates them, so row routing across
    partitions can't affect the result. Values go through the exact
    integer-cents idiom before the writer so the re-read needs no
    float parsing tolerance."""
    import json as _json

    out = tempfile.mkdtemp(prefix="sls_fw_")

    class RowWriter:
        def open(self, partition_id: int, epoch_id: int) -> bool:
            self._fh = open(
                os.path.join(out, f"p{partition_id:05d}_e{epoch_id}.jsonl"), "w"
            )
            return True

        def process(self, row) -> None:
            self._fh.write(
                _json.dumps({"event_type": row.event_type, "cents": row.cents}) + "\n"
            )

        def close(self, error) -> None:
            self._fh.close()
            if error is not None:
                raise error

    ev = events_stream(spark, sf_dir).select(
        "event_type",
        F.floor(F.col("value") * 100 + 0.5).cast("bigint").alias("cents"),
    )
    ckpt = os.path.join(tempfile.mkdtemp(prefix="sls_ckpt_"), "ckpt")
    q = (
        ev.writeStream.foreach(RowWriter())
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    shutil.rmtree(os.path.dirname(ckpt), ignore_errors=True)
    back = spark.read.schema("event_type string, cents bigint").json(
        os.path.join(out, "*.jsonl")
    )
    result = (
        back.groupBy("event_type")
        .agg(F.count("*").alias("n"), F.sum("cents").cast("bigint").alias("total_cents"))
        .transform(lineage_checkpoint)
    )
    shutil.rmtree(out, ignore_errors=True)
    return result


@query(
    "stream_stream_full_outer_join",
    "§2.9 stream-stream FULL OUTER interval join (both sides watermark-evicted)",
    """
    WITH p AS (
      SELECT event_id, user_id, date_trunc('microseconds', ts) AS tsu
      FROM events WHERE event_type = 'purchase'
    ), c AS (
      SELECT event_id, user_id, date_trunc('microseconds', ts) AS tsu
      FROM events WHERE event_type = 'click'
    )
    SELECT p.event_id AS purchase_id, c.event_id AS click_id
    FROM p FULL JOIN c
      ON p.user_id = c.user_id
     AND c.tsu >= p.tsu - INTERVAL '1 hour'
     AND c.tsu <= p.tsu
    """,
)
def stream_stream_full_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The last stream-stream join variant (inner and left-outer are
    separate queries): FULL OUTER, where BOTH sides' unmatched rows
    must emit null-extended as the watermark evicts their state — a
    purchase with no click in its 1 h lookback AND every click that
    no purchase ever claimed. The staging, double flush sentinels,
    and the batch-side (never in-plan) sentinel exclusion are shared
    with the left-outer query via _outer_join_side — including the
    subtlety that the two sentinel streams MATCH EACH OTHER (same
    negative user id, same instant), so the exclusion keeps a row
    only if NEITHER side is a sentinel (null-safe: null ids are
    unmatched real rows and must survive). Oracle = the batch FULL
    JOIN under the same bound. State bound as in the left-outer case:
    both sides hold watermark delay + join range, eviction proven by
    the clicks-without-purchases tail this variant uniquely emits."""
    run_dir = tempfile.mkdtemp(prefix="sls_ssfoj_")
    joined = (
        _outer_join_side(spark, sf_dir, run_dir, "p", "purchase", "purchase_id")
        .join(
            _outer_join_side(spark, sf_dir, run_dir, "c", "click", "click_id"),
            (F.col("p_user") == F.col("c_user"))
            & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR"))
            & (F.col("c_ts") <= F.col("p_ts")),
            "fullOuter",
        )
        .select("purchase_id", "click_id")
    )
    out = run_to_memory(joined, mode="append")
    out = out.filter(
        (F.coalesce(F.col("purchase_id"), F.lit(0)) >= 0)
        & (F.coalesce(F.col("click_id"), F.lit(0)) >= 0)
    )
    shutil.rmtree(run_dir, ignore_errors=True)
    return out
