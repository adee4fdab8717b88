"""Lineage report data model.

Shape mirrors the reference's report document (SURVEY.md §1.1,
reconstructed: ``{inputs: [{type, name/path, fields[]}], output: {...},
app, timestamp, duration}``) expressed as Python dataclasses serialized
to JSON-lines; the log itself is queryable as a DataFrame (§1.4).
"""

from __future__ import annotations

import dataclasses
import json
import time
from dataclasses import dataclass, field
from typing import Any, Optional


@dataclass
class FieldInfo:
    """One column of an input/output dataset schema."""

    name: str
    type: str
    nullable: bool = True


@dataclass
class DatasetRef:
    """A dataset read or written by a query.

    kind: "path" (file-based relation), "table" (catalog/temp view),
    "streaming" (unbounded source), "memory" (local relation),
    "unknown" (unrecognized plan leaf — never silently dropped).
    """

    kind: str
    format: Optional[str] = None
    name: Optional[str] = None
    paths: list[str] = field(default_factory=list)
    fields: list[FieldInfo] = field(default_factory=list)

    def key(self) -> tuple:
        return (self.kind, self.name, tuple(sorted(self.paths)))


@dataclass
class ColumnLineage:
    """output column -> the base input columns it derives from."""

    output: str
    inputs: list[str] = field(default_factory=list)  # "dataset.column" strings


@dataclass
class RunMetadata:
    app_id: str = ""
    app_name: str = ""
    func_name: str = ""
    duration_s: float = 0.0
    timestamp: float = field(default_factory=time.time)
    error: Optional[str] = None
    num_output_rows: Optional[int] = None


@dataclass
class LineageReport:
    inputs: list[DatasetRef] = field(default_factory=list)
    output: Optional[DatasetRef] = None
    columns: list[ColumnLineage] = field(default_factory=list)
    run: RunMetadata = field(default_factory=RunMetadata)

    def to_dict(self) -> dict[str, Any]:
        return dataclasses.asdict(self)

    def to_json(self) -> str:
        return json.dumps(self.to_dict(), sort_keys=True, default=str)

    def to_openlineage(self, namespace: str = "spark") -> dict[str, Any]:
        """Serialize as an OpenLineage RunEvent (public spec,
        https://openlineage.io/spec — the lingua franca lineage
        backends ingest), so any reporter can ship to a Marquez-style
        collector without a custom schema.

        Mapping: inputs/outputs -> OL datasets with a ``schema`` facet;
        column lineage -> the ``columnLineage`` facet on the output
        dataset. Read-only actions (collect/count) have no OL output
        dataset, so their column lineage rides a custom run facet
        instead of being dropped.
        """
        import uuid

        def ol_dataset(ref: DatasetRef) -> dict[str, Any]:
            name = ref.name or (ref.paths[0] if ref.paths else ref.kind)
            d: dict[str, Any] = {"namespace": namespace, "name": name, "facets": {}}
            if ref.fields:
                d["facets"]["schema"] = {
                    "fields": [
                        {"name": f.name, "type": f.type} for f in ref.fields
                    ]
                }
            if ref.paths:
                d["facets"]["dataSource"] = {
                    "name": ref.format or "file",
                    "uri": ref.paths[0],
                }
            return d

        def col_facet() -> dict[str, Any]:
            fields: dict[str, Any] = {}
            for c in self.columns:
                in_fields = []
                for src in c.inputs:
                    ds, _, col = src.partition(".")
                    in_fields.append(
                        {"namespace": namespace, "name": ds, "field": col}
                    )
                fields[c.output] = {"inputFields": in_fields}
            return {"fields": fields}

        # deterministic run id: same (app, action, t) -> same event
        run_id = str(
            uuid.uuid5(
                uuid.NAMESPACE_URL,
                f"{self.run.app_id}/{self.run.func_name}/{self.run.timestamp}",
            )
        )
        event_time = time.strftime(
            "%Y-%m-%dT%H:%M:%S", time.gmtime(self.run.timestamp)
        ) + ("%.3fZ" % (self.run.timestamp % 1))[1:]
        event: dict[str, Any] = {
            "eventType": "FAIL" if self.run.error else "COMPLETE",
            "eventTime": event_time,
            "producer": "https://github.com/spark-lineage-spark",
            "schemaURL": "https://openlineage.io/spec/1-0-5/OpenLineage.json",
            "run": {"runId": run_id, "facets": {}},
            "job": {
                "namespace": namespace,
                "name": f"{self.run.app_name or 'spark'}.{self.run.func_name or 'action'}",
            },
            "inputs": [ol_dataset(i) for i in self.inputs],
            "outputs": [],
        }
        if self.run.error:
            event["run"]["facets"]["errorMessage"] = {
                "message": self.run.error,
                "programmingLanguage": "python",
            }
        if self.output is not None:
            out = ol_dataset(self.output)
            if self.columns:
                out["facets"]["columnLineage"] = col_facet()
            event["outputs"] = [out]
        elif self.columns:
            event["run"]["facets"]["resultColumnLineage"] = col_facet()
        return event

    # convenience for tests / goldens
    def input_names(self) -> list[str]:
        out = []
        for i in self.inputs:
            out.append(i.name or (i.paths[0] if i.paths else i.kind))
        return sorted(out)
