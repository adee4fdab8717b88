"""LineageWriter: DataFrameWriter facade recording output lineage.

Write commands are where the reference captures OUTPUTS
(``InsertIntoHadoopFsRelationCommand`` etc. — SURVEY.md §0,
reconstruction). Facade equivalent: record the target (path/table,
format, mode) around the delegated write, then emit a report whose
output side is filled in.
"""

from __future__ import annotations

import time
from typing import Optional


class LineageWriter:
    def __init__(self, df, session: "LineageSession"):
        self._df = df
        self._session = session
        self._writer = df.write
        self._format: Optional[str] = None
        self._mode: Optional[str] = None

    # chainable writer config ----------------------------------------
    def format(self, source: str) -> "LineageWriter":
        self._writer = self._writer.format(source)
        self._format = source
        return self

    def mode(self, saveMode: str) -> "LineageWriter":
        self._writer = self._writer.mode(saveMode)
        self._mode = saveMode
        return self

    def option(self, key: str, value) -> "LineageWriter":
        self._writer = self._writer.option(key, value)
        return self

    def options(self, **options) -> "LineageWriter":
        self._writer = self._writer.options(**options)
        return self

    def partitionBy(self, *cols) -> "LineageWriter":
        self._writer = self._writer.partitionBy(*cols)
        return self

    def bucketBy(self, numBuckets: int, col, *cols) -> "LineageWriter":
        self._writer = self._writer.bucketBy(numBuckets, col, *cols)
        return self

    def sortBy(self, col, *cols) -> "LineageWriter":
        self._writer = self._writer.sortBy(col, *cols)
        return self

    # terminal writes -------------------------------------------------
    def _emit(self, func: str, t0: float, kind: str, fmt, name=None, paths=None, error=None):
        self._session.emit(
            self._df,
            func,
            time.time() - t0,
            output={"kind": kind, "format": fmt, "name": name, "paths": paths or []},
            error=error,
        )

    def _run(self, func: str, kind: str, fmt, name=None, paths=None):
        def do(callable_):
            t0 = time.time()
            try:
                result = callable_()
            except Exception as e:
                self._emit(func, t0, kind, fmt, name, paths, error=f"{type(e).__name__}: {e}")
                raise
            self._emit(func, t0, kind, fmt, name, paths)
            return result

        return do

    def parquet(self, path: str, **kw):
        return self._run("write.parquet", "path", "parquet", paths=[path])(
            lambda: self._writer.parquet(path, **kw)
        )

    def orc(self, path: str, **kw):
        return self._run("write.orc", "path", "orc", paths=[path])(
            lambda: self._writer.orc(path, **kw)
        )

    def csv(self, path: str, **kw):
        return self._run("write.csv", "path", "csv", paths=[path])(
            lambda: self._writer.csv(path, **kw)
        )

    def json(self, path: str, **kw):
        return self._run("write.json", "path", "json", paths=[path])(
            lambda: self._writer.json(path, **kw)
        )

    def save(self, path: Optional[str] = None, **kw):
        return self._run("write.save", "path", self._format, paths=[path] if path else [])(
            lambda: self._writer.save(path, **kw) if path else self._writer.save(**kw)
        )

    def saveAsTable(self, name: str, **kw):
        return self._run("write.saveAsTable", "table", self._format or "parquet", name=name)(
            lambda: self._writer.saveAsTable(name, **kw)
        )

    def insertInto(self, name: str, overwrite: Optional[bool] = None):
        return self._run("write.insertInto", "table", self._format, name=name)(
            lambda: self._writer.insertInto(name, overwrite)
            if overwrite is not None
            else self._writer.insertInto(name)
        )
