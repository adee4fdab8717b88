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


class CompositeReporter(Reporter):
    def __init__(self, *reporters: Reporter):
        self.reporters = list(reporters)

    def report(self, report: LineageReport) -> None:
        for r in self.reporters:
            r.report(report)

    def close(self) -> None:
        for r in self.reporters:
            r.close()


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
