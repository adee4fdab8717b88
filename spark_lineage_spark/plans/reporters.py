"""Pluggable lineage reporters (SURVEY.md §2.12).

The reference ships reports to pluggable backends (console/JSON log and
a cloud sink — reconstruction, SURVEY.md §0). Here: an ABC with
console, JSONL-file, in-memory, and composite implementations. JSONL is
the default because the lineage log then doubles as an engine-queryable
table (``LineageSession.lineage()``).
"""

from __future__ import annotations

import json
import os
import sys
import threading
from abc import ABC, abstractmethod

from spark_lineage_spark.plans.model import LineageReport

DEFAULT_LINEAGE_PATH = os.environ.get("SLS_LINEAGE_PATH", "/tmp/sls_lineage/reports.jsonl")


class Reporter(ABC):
    """Receives one LineageReport per completed query action/write."""

    @abstractmethod
    def report(self, report: LineageReport) -> None: ...

    def close(self) -> None:  # pragma: no cover - default no-op
        pass


class ConsoleReporter(Reporter):
    def __init__(self, stream=None):
        self.stream = stream or sys.stderr

    def report(self, report: LineageReport) -> None:
        print(f"[lineage] {report.to_json()}", file=self.stream)


class JsonlReporter(Reporter):
    """Append-only JSON-lines log; thread-safe for concurrent actions."""

    def __init__(self, path: str = DEFAULT_LINEAGE_PATH):
        self.path = path
        self._lock = threading.Lock()
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)

    def report(self, report: LineageReport) -> None:
        line = report.to_json()
        with self._lock:
            with open(self.path, "a", encoding="utf-8") as fh:
                fh.write(line + "\n")


class InMemoryReporter(Reporter):
    """Collects reports in-process — the golden-test backend."""

    def __init__(self):
        self.reports: list[LineageReport] = []

    def report(self, report: LineageReport) -> None:
        self.reports.append(report)

    def last(self) -> LineageReport:
        return self.reports[-1]


def http_json_transport(endpoint: str, timeout_s: float = 5.0):
    """Default network transport: POST a JSON array of reports to an
    HTTP endpoint (the public cloud-sink shape — an HTTP collector or a
    Kinesis/Firehose-style PutRecords proxy). stdlib-only."""
    import urllib.request

    def send(batch: list[dict]) -> None:
        body = json.dumps(batch).encode("utf-8")
        req = urllib.request.Request(
            endpoint, data=body, headers={"Content-Type": "application/json"}
        )
        urllib.request.urlopen(req, timeout=timeout_s).read()

    return send


class BufferedNetworkReporter(Reporter):
    """Batching network reporter (SURVEY §0 cloud-sink role).

    Buffers reports and ships them as batches of ``max_batch`` (or on
    ``flush_interval_s`` ticks from a daemon flusher thread, or at
    ``close()``), through a pluggable ``transport(batch: list[dict])``
    callable — ``http_json_transport`` by default. A failing send is
    retried with exponential backoff; a batch still failing after
    ``max_retries`` attempts is counted in ``dropped_batches`` and
    discarded. No code path raises out of ``report()``/``flush()``:
    lineage shipping is observability and must never fail or slow the
    user's query (the network round-trip happens on the flusher
    thread, not the caller's)."""

    def __init__(
        self,
        transport=None,
        endpoint: str | None = None,
        max_batch: int = 50,
        flush_interval_s: float = 2.0,
        max_retries: int = 3,
        backoff_s: float = 0.05,
        serializer=None,
    ):
        if transport is None:
            if endpoint is None:
                raise ValueError("BufferedNetworkReporter needs transport= or endpoint=")
            transport = http_json_transport(endpoint)
        self.transport = transport
        # wire format: native report dicts by default; pass
        # serializer=LineageReport.to_openlineage to ship OpenLineage
        # RunEvents to a Marquez-style collector instead
        self.serializer = serializer or LineageReport.to_dict
        self.max_batch = max_batch
        self.max_retries = max_retries
        self.backoff_s = backoff_s
        self.flush_interval_s = flush_interval_s
        self.sent_batches = 0
        self.sent_reports = 0
        self.dropped_batches = 0
        self._buf: list[dict] = []
        self._lock = threading.Lock()
        self._wake = threading.Event()
        self._stop = False
        self._thread = threading.Thread(
            target=self._run, name="sls-reporter-flush", daemon=True
        )
        self._thread.start()

    def report(self, report: LineageReport) -> None:
        try:
            payload = self.serializer(report)
        except Exception:
            return  # serialization is shipping's problem, never the query's
        with self._lock:
            self._buf.append(payload)
            full = len(self._buf) >= self.max_batch
        if full:
            self._wake.set()  # hand off to the flusher thread

    def _run(self) -> None:
        while True:
            self._wake.wait(timeout=self.flush_interval_s)
            self._wake.clear()
            self.flush()
            if self._stop:
                return

    def flush(self) -> None:
        """Drain the buffer in max_batch chunks; swallow all errors."""
        while True:
            with self._lock:
                if not self._buf:
                    return
                batch, self._buf = self._buf[: self.max_batch], self._buf[self.max_batch :]
            self._send_with_retry(batch)

    def _send_with_retry(self, batch: list[dict]) -> None:
        import time as _time

        for attempt in range(self.max_retries):
            try:
                self.transport(batch)
                self.sent_batches += 1
                self.sent_reports += len(batch)
                return
            except Exception:
                if attempt + 1 < self.max_retries:
                    _time.sleep(self.backoff_s * (2**attempt))
        self.dropped_batches += 1  # shipping failed; the query must not

    def close(self) -> None:
        self._stop = True
        self._wake.set()
        self._thread.join(timeout=5)
        self.flush()  # final synchronous drain


class CompositeReporter(Reporter):
    def __init__(self, *reporters: Reporter):
        self.reporters = list(reporters)

    def report(self, report: LineageReport) -> None:
        for r in self.reporters:
            r.report(report)

    def close(self) -> None:
        for r in self.reporters:
            r.close()


def reporter_from_conf(spark) -> Reporter:
    """Build the reporter stack from ``spark.lineage.*`` runtime confs —
    the configuration surface the reference exposes (its reporters are
    selected through spark.lineage.* settings; SURVEY.md §0):

    - ``spark.lineage.reporters``: comma list of ``jsonl`` | ``console``
      | ``memory`` | ``network`` (default ``jsonl``).
    - ``spark.lineage.jsonl.path``: JSONL log path (default
      ``DEFAULT_LINEAGE_PATH``).
    - ``spark.lineage.network.endpoint``: HTTP collector URL (required
      for ``network``).
    - ``spark.lineage.network.format``: ``json`` (native dicts,
      default) or ``openlineage`` (RunEvents for a Marquez-style
      collector).
    - ``spark.lineage.network.batchSize`` / ``.flushSecs``: batching
      knobs (defaults 50 / 2.0).

    One name → that reporter; several → a CompositeReporter. Unknown
    names raise immediately (misconfiguration must fail loudly at
    session build, not silently drop lineage)."""
    from spark_lineage_spark.plans.model import LineageReport

    def conf(key: str, default: str | None = None) -> str | None:
        try:
            return spark.conf.get(key, default)
        except Exception:
            return default

    names = [
        n.strip()
        for n in (conf("spark.lineage.reporters", "jsonl") or "jsonl").split(",")
        if n.strip()
    ]
    built: list[Reporter] = []
    try:
        for name in names:
            if name == "jsonl":
                built.append(
                    JsonlReporter(conf("spark.lineage.jsonl.path", DEFAULT_LINEAGE_PATH))
                )
            elif name == "console":
                built.append(ConsoleReporter())
            elif name == "memory":
                built.append(InMemoryReporter())
            elif name == "network":
                endpoint = conf("spark.lineage.network.endpoint")
                if not endpoint:
                    raise ValueError(
                        "spark.lineage.reporters includes 'network' but "
                        "spark.lineage.network.endpoint is not set"
                    )
                fmt = conf("spark.lineage.network.format", "json")
                if fmt not in ("json", "openlineage"):
                    raise ValueError(
                        f"unknown spark.lineage.network.format {fmt!r} "
                        "(expected 'json' or 'openlineage')"
                    )
                serializer = (
                    LineageReport.to_openlineage if fmt == "openlineage" else None
                )
                built.append(
                    BufferedNetworkReporter(
                        endpoint=endpoint,
                        max_batch=int(conf("spark.lineage.network.batchSize", "50")),
                        flush_interval_s=float(
                            conf("spark.lineage.network.flushSecs", "2.0")
                        ),
                        serializer=serializer,
                    )
                )
            else:
                raise ValueError(
                    f"unknown lineage reporter {name!r} in spark.lineage.reporters"
                )
    except Exception:
        # a later invalid name must not leak already-started reporters
        # (BufferedNetworkReporter runs a flusher thread from __init__)
        for r in built:
            try:
                r.close()
            except Exception:
                pass
        raise
    if not built:
        built = [JsonlReporter()]
    return built[0] if len(built) == 1 else CompositeReporter(*built)


def load_lineage_json(path: str = DEFAULT_LINEAGE_PATH) -> list[dict]:
    """Read the JSONL log back as plain dicts (driver-side helper)."""
    out = []
    if os.path.exists(path):
        with open(path, encoding="utf-8") as fh:
            for line in fh:
                line = line.strip()
                if line:
                    out.append(json.loads(line))
    return out
