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

    # convenience for tests / goldens
    def input_names(self) -> list[str]:
        out = []
        for i in self.inputs:
            out.append(i.name or (i.paths[0] if i.paths else i.kind))
        return sorted(out)
