"""Fixture-format drift guard (VERDICT r3 item 9).

Round 3 died because regenerated fixtures changed events.ts from
int64-nanos to timestamp[us] (Spark: TIMESTAMP_NTZ) and every watermark
query broke — but only in the DRIVER's plain session, not in the test
session that carried legacy confs. These tests assert the ts
normalization contract in BOTH shapes:

  * in-process: tables.load / events_stream yield TimestampType (LTZ)
    whatever physical type the parquet carries;
  * subprocess: a plain SparkSession (zero legacy/app confs — exactly
    what the grading driver builds) loads events with ts: timestamp and
    completes one watermarked windowed streaming query.
"""

import os
import subprocess
import sys
import textwrap

SF = "/root/testdata/sf0.001"


def test_batch_ts_is_ltz_timestamp(spark):
    from spark_lineage_spark.tables import load

    assert dict(load(spark, SF, "events").dtypes)["ts"] == "timestamp"


def test_stream_ts_is_ltz_timestamp(spark):
    from spark_lineage_spark.streaming.queries import events_stream

    assert dict(events_stream(spark, SF).dtypes)["ts"] == "timestamp"


def _expected_min_ts_micros() -> int:
    """Ground truth, independent of any Spark session: the earliest
    events.ts as epoch-UTC microseconds, read straight from the parquet
    footerless data with pyarrow (wall clock == UTC instant per the
    fixture contract, whether stored as timestamp[us]/[ns] or int64 ns)."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    col = pq.read_table(os.path.join(SF, "events.parquet"), columns=["ts"])["ts"]
    mn = pc.min(col).as_py()
    if isinstance(mn, int):  # raw int64 nanoseconds
        return mn // 1000
    import datetime

    if mn.tzinfo is not None:
        mn = mn.astimezone(datetime.timezone.utc).replace(tzinfo=None)
    td = mn - datetime.datetime(1970, 1, 1)
    return td.days * 86_400_000_000 + td.seconds * 1_000_000 + td.microseconds


def test_plain_session_watermark_query_runs():
    """Driver parity on a NON-UTC host: no nanosAsLong, no session tz
    pin beyond what the engine itself sets at query time — the streaming
    window must run AND epoch-anchored values must match the
    tz-independent pyarrow ground truth (ADVICE r4: a bare NTZ→LTZ cast
    in a non-UTC plain session would shift the instant; dtype/row-count
    checks alone wouldn't catch it)."""
    expected_us = _expected_min_ts_micros()
    code = textwrap.dedent(
        f"""
        import sys
        sys.path.insert(0, {os.path.dirname(os.path.dirname(os.path.abspath(__file__)))!r})
        from pyspark.sql import SparkSession
        spark = (SparkSession.builder.master("local[4]")
                 .appName("plain_parity").getOrCreate())
        from pyspark.sql import functions as F
        from spark_lineage_spark.tables import load
        ev = load(spark, {SF!r}, "events")
        assert dict(ev.dtypes)["ts"] == "timestamp"
        got_us = ev.agg(F.min(F.unix_micros("ts"))).collect()[0][0]
        assert got_us == {expected_us}, (got_us, {expected_us})
        from spark_lineage_spark.registry import load_all
        q = load_all()["stream_tumbling_window"]
        n = q.builder(spark, {SF!r}).count()
        assert n > 0, n
        print("PARITY_OK", n)
        """
    )
    env = dict(os.environ, TZ="America/New_York")  # non-UTC JVM + Python tz
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=300, env=env
    )
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    assert "PARITY_OK" in out.stdout
