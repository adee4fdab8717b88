"""Streaming lineage via StreamingQueryListener (SURVEY.md §2.9/§3.3).

Unlike the batch path (facade capture — a Python QueryExecutionListener
cannot be registered in the JVM), Spark DOES support Python-side
streaming listeners: ``spark.streams.addListener`` delivers
QueryProgressEvents per micro-batch, carrying sources, sink, and row
counts. One LineageReport is emitted per micro-batch — the streaming
equivalent of the reference's one-report-per-query.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql.streaming import StreamingQueryListener

from spark_lineage_spark.plans.model import DatasetRef, LineageReport, RunMetadata
from spark_lineage_spark.plans.reporters import Reporter


class LineageStreamingListener(StreamingQueryListener):
    """Emits one report per micro-batch progress event."""

    def __init__(self, reporter: Reporter, app_id: str = "", app_name: str = ""):
        self.reporter = reporter
        self.app_id = app_id
        self.app_name = app_name

    # -- StreamingQueryListener interface -----------------------------
    def onQueryStarted(self, event) -> None:
        pass

    def onQueryProgress(self, event) -> None:
        p = event.progress
        inputs = []
        for src in p.sources or []:
            desc = src.description or ""
            inputs.append(
                DatasetRef(
                    kind="streaming",
                    format=desc.split("[", 1)[0] if "[" in desc else desc,
                    name=desc,
                )
            )
        sink_desc: Optional[str] = p.sink.description if p.sink else None
        out = (
            DatasetRef(kind="streaming", name=sink_desc, format=None)
            if sink_desc
            else None
        )
        self.reporter.report(
            LineageReport(
                inputs=inputs,
                output=out,
                columns=[],
                run=RunMetadata(
                    app_id=self.app_id,
                    app_name=self.app_name,
                    func_name=f"microbatch:{p.batchId}",
                    duration_s=(p.batchDuration or 0) / 1000.0,
                    # Spark reports -1 when a sink provides no count
                    num_output_rows=(
                        p.sink.numOutputRows
                        if p.sink and (p.sink.numOutputRows or 0) >= 0
                        else None
                    ),
                ),
            )
        )

    def onQueryIdle(self, event) -> None:
        pass

    def onQueryTerminated(self, event) -> None:
        pass
