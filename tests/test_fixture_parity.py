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


def test_plain_session_watermark_query_runs():
    """Driver parity: no nanosAsLong, no session tz pin beyond what the
    engine itself sets at query time — the streaming window must run."""
    code = textwrap.dedent(
        f"""
        import sys
        sys.path.insert(0, {os.path.dirname(os.path.dirname(os.path.abspath(__file__)))!r})
        from pyspark.sql import SparkSession
        spark = (SparkSession.builder.master("local[4]")
                 .appName("plain_parity").getOrCreate())
        from spark_lineage_spark.tables import load
        assert dict(load(spark, {SF!r}, "events").dtypes)["ts"] == "timestamp"
        from spark_lineage_spark.registry import load_all
        q = load_all()["stream_tumbling_window"]
        n = q.builder(spark, {SF!r}).count()
        assert n > 0, n
        print("PARITY_OK", n)
        """
    )
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=300
    )
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    assert "PARITY_OK" in out.stdout
