"""BufferedNetworkReporter: batching, retry, and failure isolation
(SURVEY.md §0 cloud-sink role — VERDICT r1 item 7).

The contract under test: reports ship in bounded batches through a
pluggable transport, transient transport errors are retried, and NO
transport failure ever propagates into (or fails) the user's query.
"""

import threading
import time

import pytest

from spark_lineage_spark.plans.model import LineageReport, RunMetadata
from spark_lineage_spark.plans.reporters import BufferedNetworkReporter


def mk_report(i: int) -> LineageReport:
    return LineageReport(run=RunMetadata(app_id="test", func_name=f"q{i}"))


def test_batches_by_max_batch():
    batches = []
    rep = BufferedNetworkReporter(
        transport=batches.append, max_batch=3, flush_interval_s=3600
    )
    for i in range(7):
        rep.report(mk_report(i))
    rep.close()
    assert [len(b) for b in batches] == [3, 3, 1]
    assert rep.sent_reports == 7 and rep.sent_batches == 3
    assert rep.dropped_batches == 0
    # order preserved end-to-end
    names = [r["run"]["func_name"] for b in batches for r in b]
    assert names == [f"q{i}" for i in range(7)]


def test_background_flush_on_interval():
    batches = []
    rep = BufferedNetworkReporter(
        transport=batches.append, max_batch=100, flush_interval_s=0.05
    )
    rep.report(mk_report(0))
    deadline = time.time() + 5
    while not batches and time.time() < deadline:
        time.sleep(0.02)
    assert batches and len(batches[0]) == 1  # shipped without close/flush
    rep.close()


def test_retry_then_success():
    calls = {"n": 0}
    batches = []

    def flaky(batch):
        calls["n"] += 1
        if calls["n"] <= 2:
            raise ConnectionError("transient")
        batches.append(batch)

    rep = BufferedNetworkReporter(
        transport=flaky, max_batch=10, flush_interval_s=3600, backoff_s=0.001
    )
    rep.report(mk_report(1))
    rep.flush()
    assert calls["n"] == 3 and len(batches) == 1
    assert rep.sent_batches == 1 and rep.dropped_batches == 0
    rep.close()


def test_permanent_failure_drops_batch_without_raising():
    def dead(batch):
        raise ConnectionError("endpoint down")

    rep = BufferedNetworkReporter(
        transport=dead, max_batch=2, flush_interval_s=3600, backoff_s=0.001
    )
    for i in range(4):
        rep.report(mk_report(i))
    rep.flush()  # must not raise
    rep.close()
    assert rep.dropped_batches == 2 and rep.sent_batches == 0


def test_report_never_blocks_on_transport():
    """report() must return immediately even when the transport hangs —
    the network round-trip belongs to the flusher thread."""
    gate = threading.Event()

    def slow(batch):
        gate.wait(timeout=10)

    rep = BufferedNetworkReporter(transport=slow, max_batch=1, flush_interval_s=3600)
    t0 = time.time()
    for i in range(5):
        rep.report(mk_report(i))
    assert time.time() - t0 < 1.0
    gate.set()
    rep.close()


def test_query_unaffected_by_dead_reporter(spark):
    """End-to-end failure isolation: a LineageSession wired to a dead
    network sink still executes the user's query and returns correct
    results."""
    from spark_lineage_spark import LineageSession

    def dead(batch):
        raise ConnectionError("endpoint down")

    rep = BufferedNetworkReporter(
        transport=dead, max_batch=1, flush_interval_s=3600, backoff_s=0.001
    )
    eng = LineageSession(spark, reporter=rep)
    got = eng.sql("SELECT 1 AS one UNION ALL SELECT 2").collect()
    assert sorted(r.one for r in got) == [1, 2]
    rep.flush()
    rep.close()


def test_http_transport_shape():
    """http_json_transport posts a JSON array body with the right
    content type (checked against a local socket server)."""
    import http.server
    import json as _json

    received = {}

    class Handler(http.server.BaseHTTPRequestHandler):
        def do_POST(self):
            n = int(self.headers["Content-Length"])
            received["body"] = _json.loads(self.rfile.read(n))
            received["ctype"] = self.headers["Content-Type"]
            self.send_response(200)
            self.end_headers()
            self.wfile.write(b"ok")

        def log_message(self, *a):
            pass

    srv = http.server.HTTPServer(("127.0.0.1", 0), Handler)
    th = threading.Thread(target=srv.handle_request, daemon=True)
    th.start()
    from spark_lineage_spark.plans.reporters import http_json_transport

    send = http_json_transport(f"http://127.0.0.1:{srv.server_port}/collect")
    send([mk_report(9).to_dict()])
    th.join(timeout=5)
    srv.server_close()
    assert received["ctype"] == "application/json"
    assert received["body"][0]["run"]["func_name"] == "q9"


def test_openlineage_event_shape(spark):
    """to_openlineage must produce a spec-shaped RunEvent: eventType,
    ISO eventTime, run.runId (deterministic UUID), dataset schema
    facets, and the columnLineage facet on the output dataset."""
    from spark_lineage_spark import InMemoryReporter, LineageSession
    from spark_lineage_spark.operators.relational import flagship_df

    rep = InMemoryReporter()
    eng = LineageSession(spark, reporter=rep)
    eng._wrap(flagship_df(spark, "/root/testdata/sf0.001")).count()
    ev = rep.last().to_openlineage()

    assert ev["eventType"] == "COMPLETE"
    assert ev["eventTime"].endswith("Z") and "T" in ev["eventTime"]
    import uuid as _uuid

    _uuid.UUID(ev["run"]["runId"])  # parseable
    assert ev["run"]["runId"] == rep.last().to_openlineage()["run"]["runId"]
    names = sorted(i["name"] for i in ev["inputs"])
    assert names == ["lineitem", "orders"]
    schema_fields = {
        f["name"] for i in ev["inputs"] for f in i["facets"]["schema"]["fields"]
    }
    assert "l_quantity" in schema_fields
    # read-only action: column lineage rides the run facet
    cl = ev["run"]["facets"]["resultColumnLineage"]["fields"]
    assert cl["sum_qty"]["inputFields"] == [
        {"namespace": "spark", "name": "lineitem", "field": "l_quantity"}
    ]


def test_openlineage_write_event_has_output_dataset(spark, tmp_path):
    """A write action must emit an OL output dataset carrying the
    columnLineage facet."""
    from spark_lineage_spark import InMemoryReporter, LineageSession
    from spark_lineage_spark.tables import load

    rep = InMemoryReporter()
    eng = LineageSession(spark, reporter=rep)
    df = eng._wrap(
        load(spark, "/root/testdata/sf0.001", "nation").select("n_name", "n_regionkey")
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "out.parquet"))
    ev = rep.last().to_openlineage()
    assert len(ev["outputs"]) == 1
    out = ev["outputs"][0]
    assert out["facets"]["columnLineage"]["fields"]["n_name"]["inputFields"] == [
        {"namespace": "spark", "name": "nation", "field": "n_name"}
    ]


def test_network_reporter_ships_openlineage_payloads(spark):
    """serializer=to_openlineage must put RunEvents on the wire."""
    from spark_lineage_spark.plans.model import LineageReport
    from spark_lineage_spark.plans.reporters import BufferedNetworkReporter
    from spark_lineage_spark import LineageSession
    from spark_lineage_spark.tables import load

    sent = []
    rep = BufferedNetworkReporter(
        transport=sent.extend,
        serializer=LineageReport.to_openlineage,
        max_batch=1,
    )
    eng = LineageSession(spark, reporter=rep)
    eng._wrap(load(spark, "/root/testdata/sf0.001", "region")).count()
    rep.close()
    assert sent and sent[0]["schemaURL"].startswith("https://openlineage.io/spec")
    assert sent[0]["inputs"][0]["name"] == "region"


def test_reporter_from_conf_default_and_named(spark, tmp_path):
    """spark.lineage.* conf surface: default is JSONL; named lists build
    the right stack; unknown names and network-without-endpoint fail
    loudly at build time."""
    import pytest

    from spark_lineage_spark.plans.reporters import (
        CompositeReporter,
        ConsoleReporter,
        InMemoryReporter,
        JsonlReporter,
        reporter_from_conf,
    )

    def clear():
        for k in (
            "spark.lineage.reporters",
            "spark.lineage.jsonl.path",
            "spark.lineage.network.endpoint",
        ):
            try:
                spark.conf.unset(k)
            except Exception:
                pass

    clear()
    try:
        assert isinstance(reporter_from_conf(spark), JsonlReporter)

        p = str(tmp_path / "lin.jsonl")
        spark.conf.set("spark.lineage.reporters", "jsonl")
        spark.conf.set("spark.lineage.jsonl.path", p)
        r = reporter_from_conf(spark)
        assert isinstance(r, JsonlReporter) and r.path == p

        spark.conf.set("spark.lineage.reporters", "console,memory")
        r = reporter_from_conf(spark)
        assert isinstance(r, CompositeReporter)
        assert isinstance(r.reporters[0], ConsoleReporter)
        assert isinstance(r.reporters[1], InMemoryReporter)

        spark.conf.set("spark.lineage.reporters", "network")
        with pytest.raises(ValueError, match="endpoint"):
            reporter_from_conf(spark)

        spark.conf.set("spark.lineage.reporters", "carrier-pigeon")
        with pytest.raises(ValueError, match="unknown lineage reporter"):
            reporter_from_conf(spark)
    finally:
        clear()


def test_reporter_from_conf_network_end_to_end(spark, tmp_path):
    """network reporter built from confs ships OpenLineage RunEvents to
    a local HTTP collector through a conf-configured LineageSession."""
    import http.server
    import json as _json
    import threading

    from spark_lineage_spark import LineageSession
    from spark_lineage_spark.tables import load

    received = []

    class Handler(http.server.BaseHTTPRequestHandler):
        def do_POST(self):
            n = int(self.headers["Content-Length"])
            received.extend(_json.loads(self.rfile.read(n)))
            self.send_response(200)
            self.end_headers()

        def log_message(self, *a):
            pass

    srv = http.server.HTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        spark.conf.set("spark.lineage.reporters", "network")
        spark.conf.set(
            "spark.lineage.network.endpoint",
            f"http://127.0.0.1:{srv.server_port}/collect",
        )
        spark.conf.set("spark.lineage.network.format", "openlineage")
        eng = LineageSession(spark)
        eng._wrap(load(spark, "/root/testdata/sf0.001", "region")).collect()
        eng.reporter.close()  # synchronous final drain
        assert received, "no events reached the collector"
        ev = received[0]
        assert ev["eventType"] == "COMPLETE" and "run" in ev and "inputs" in ev
    finally:
        for k in (
            "spark.lineage.reporters",
            "spark.lineage.network.endpoint",
            "spark.lineage.network.format",
        ):
            try:
                spark.conf.unset(k)
            except Exception:
                pass
        srv.shutdown()
