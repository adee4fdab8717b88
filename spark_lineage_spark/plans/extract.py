"""Lineage extraction: walk the analyzed Catalyst plan via py4j.

Both engine entry points (SQL string, DataFrame API) converge on the
same analyzed logical plan (SURVEY.md §3), so extraction is a read-only
tree walk — zero extra Spark jobs. The walk is version-coupled to the
installed PySpark (4.1.2, classic mode); every JVM call is guarded and
the extractor degrades to ``df.inputFiles()`` rather than failing the
user's query.

Collected per report:
- inputs: leaf relations — file-based (``LogicalRelation`` over
  ``HadoopFsRelation``: paths + format), catalog/temp tables
  (``catalogTable``/``SubqueryAlias``), DSv2, streaming, local/in-memory.
- fields: each input's schema snapshot at execution time.
- column lineage: output column -> base input columns, via a bottom-up
  exprId -> {(dataset, column)} dataflow over Project/Aggregate/Window/
  Generate/Union nodes (SURVEY.md §2.12 "hardest module").
"""

from __future__ import annotations

import re
from typing import Any, Optional

from pyspark.sql import DataFrame

from spark_lineage_spark.plans.model import (
    ColumnLineage,
    DatasetRef,
    FieldInfo,
    LineageReport,
    RunMetadata,
)

# ---------------------------------------------------------------------------
# checkpoint-transparent lineage
# ---------------------------------------------------------------------------

# localCheckpoint() truncates the analyzed plan to a LogicalRDD leaf, so
# a checkpointed DataFrame would report "read nothing" (Spark itself has
# forgotten). ``lineage_checkpoint`` snapshots the pre-checkpoint plan's
# inputs + column sources keyed by the checkpoint RDD's id; the walk
# splices them back in when it meets that LogicalRDD. Bounded: LRU —
# only the least-recently-USED entry is evicted past _CHECKPOINT_CAP
# (clearing the whole dict dropped entries for checkpoints still
# referenced by live DataFrames, e.g. dedup's iterative checkpoints
# within one long session, silently degrading their later extraction
# to an unknown leaf — ADVICE r5). A session-lifetime cache of tiny
# metadata, not data; _resolve_checkpoint_entry re-inserts on every
# access, so dict order is recency order and eviction pops the stalest
# entry, never a hot one.
# (application id, rdd id) -> analyzed-plan jobj (unresolved) |
# (inputs, colmap) | None. RDD ids restart at 0 per SparkContext, so a
# bare-id key would splice a previous session's lineage into a new one
# (the applicationId-scoping rule _SHINGLE_INDEX_CACHE follows).
_CHECKPOINT_LINEAGE: dict[tuple[str, int], Any] = {}
_CHECKPOINT_CAP = 512


def lineage_checkpoint(df: DataFrame, eager: bool = True) -> DataFrame:
    """``df.localCheckpoint(eager)`` that stays lineage-transparent.

    Records the pre-checkpoint inputs and per-output-column source sets
    under the checkpoint RDD's id so later extraction over the
    truncated plan still reports the original tables/columns. Costs
    one plan walk (~tens of ms) per checkpoint; never fails the query.
    Chain-friendly: ``df.transform(lineage_checkpoint)`` (or
    ``lineage_checkpoint_lazy`` for ``eager=False``).
    """
    ckpt = df.localCheckpoint(eager)
    try:
        # store the analyzed-plan REFERENCE only; the (possibly
        # expensive, seconds on explode-heavy plans) extraction walk
        # runs lazily, the first time lineage is actually requested
        # for a plan containing this checkpoint — operators running
        # outside a lineage context never pay it
        analyzed = df._jdf.queryExecution().analyzed()
        rid = ckpt._jdf.queryExecution().analyzed().rdd().id()
        app = df.sparkSession.sparkContext.applicationId
        while len(_CHECKPOINT_LINEAGE) >= _CHECKPOINT_CAP:
            _CHECKPOINT_LINEAGE.pop(next(iter(_CHECKPOINT_LINEAGE)))
        _CHECKPOINT_LINEAGE[(app, rid)] = analyzed
    except Exception:
        pass  # observability must never fail the query
    return ckpt


def _resolve_checkpoint_entry(key: tuple[str, int]):
    """Resolve (and memoize) a checkpoint's recorded lineage: a stored
    plan reference becomes (inputs, colmap) on first use.

    Every access re-inserts the entry at the dict's end (LRU
    touch-on-access): a hot long-lived checkpoint — e.g. the
    session-lifetime shingle index reused by every dedup query — stays
    at the young end and is never the eviction victim, which pure
    creation-order FIFO would make it."""
    if key not in _CHECKPOINT_LINEAGE:
        return None
    entry = _CHECKPOINT_LINEAGE.pop(key)
    if entry is None or isinstance(entry, tuple):
        _CHECKPOINT_LINEAGE[key] = entry
        return entry
    try:
        inputs, raw_cols, _ = analyze_plan(entry, with_columns=True, _raw=True)
        resolved = (inputs, {name: set(srcs) for name, srcs in raw_cols})
    except Exception:
        resolved = None
    _CHECKPOINT_LINEAGE[key] = resolved
    return resolved


def lineage_checkpoint_lazy(df: DataFrame) -> DataFrame:
    """``lineage_checkpoint`` with ``eager=False`` (for .transform chains)."""
    return lineage_checkpoint(df, eager=False)


# ---------------------------------------------------------------------------
# small py4j helpers (Scala collections -> Python)
# ---------------------------------------------------------------------------


def _seq(jseq) -> list:
    return [jseq.apply(i) for i in range(jseq.size())]


def _iter_attr_set(jset) -> list:
    it = jset.iterator()
    out = []
    while it.hasNext():
        out.append(it.next())
    return out


def _cls(node) -> str:
    return node.getClass().getSimpleName()


def _fields_of(node) -> list[FieldInfo]:
    out = []
    try:
        for a in _seq(node.output()):
            out.append(FieldInfo(a.name(), a.dataType().simpleString(), a.nullable()))
    except Exception:
        pass
    return out


def _leaf_attr_ids(node) -> list[tuple[int, str]]:
    """(exprId, name) per output attribute of a leaf relation."""
    out = []
    try:
        for a in _seq(node.output()):
            out.append((a.exprId().id(), a.name()))
    except Exception:
        pass
    return out


def _short_name(path: str) -> str:
    base = path.rstrip("/").rsplit("/", 1)[-1]
    return base.rsplit(".", 1)[0] if "." in base else base


# ---------------------------------------------------------------------------
# input (leaf relation) collection
# ---------------------------------------------------------------------------


def _leaf_ref(node) -> Optional[DatasetRef]:
    """Recognize a plan leaf as a dataset reference, else None."""
    name = _cls(node)
    try:
        if name == "LogicalRelation":
            ct = node.catalogTable()
            if ct.isDefined():
                ident = ct.get().identifier().unquotedString()
                return DatasetRef(kind="table", name=ident, fields=_fields_of(node))
            rel = node.relation()
            rel_cls = rel.getClass().getSimpleName()
            if rel_cls == "JDBCRelation":
                # external DB read (SURVEY §2.1 jdbc scan — exercised
                # end-to-end against embedded Derby in
                # operators/sources_sinks.py::source_jdbc_roundtrip)
                tbl = None
                try:
                    tbl = rel.jdbcOptions().tableOrQuery()
                except Exception:
                    pass
                return DatasetRef(kind="table", format="jdbc", name=tbl, fields=_fields_of(node))
            paths, fmt = [], None
            try:
                paths = [p.toString() for p in _seq(rel.location().rootPaths())]
                fmt = rel.fileFormat().toString().lower()
            except Exception:
                pass
            ref_name = _short_name(paths[0]) if paths else None
            return DatasetRef(kind="path", format=fmt, name=ref_name, paths=paths, fields=_fields_of(node))
        if name in ("DataSourceV2Relation", "DataSourceV2ScanRelation"):
            try:
                tbl = node.table().name()
            except Exception:
                tbl = None
            return DatasetRef(kind="table", format="v2", name=tbl, fields=_fields_of(node))
        if name in ("StreamingRelation", "StreamingRelationV2", "StreamingExecutionRelation"):
            src = None
            try:
                src = node.sourceName()
            except Exception:
                pass
            return DatasetRef(kind="streaming", format=src, name=src, fields=_fields_of(node))
        if name in ("LocalRelation", "OneRowRelation", "Range"):
            return DatasetRef(kind="memory", name=name.lower(), fields=_fields_of(node))
        if name in ("HiveTableRelation", "UnresolvedCatalogRelation", "CatalogRelation"):
            try:
                ident = node.tableMeta().identifier().unquotedString()
            except Exception:
                ident = name
            return DatasetRef(kind="table", name=ident, fields=_fields_of(node))
    except Exception:
        return DatasetRef(kind="unknown", name=name)
    return None


def collect_inputs(plan) -> list[DatasetRef]:
    """Input refs only (cheaper: skips the exprId dataflow)."""
    inputs, _, _ = analyze_plan(plan, with_columns=False)
    return inputs


def _children(node) -> list:
    out = []
    try:
        out.extend(_seq(node.children()))
    except Exception:
        pass
    # subqueries live in expressions (e.g. scalar subquery, IN-subquery)
    try:
        sq = node.subqueries()
        out.extend(_seq(sq))
    except Exception:
        pass
    return out


# ---------------------------------------------------------------------------
# column-level lineage: bottom-up exprId dataflow
# ---------------------------------------------------------------------------


def _named_expr_nodes(node) -> list:
    """The node's defining NamedExpressions, per node type."""
    name = _cls(node)
    try:
        if name == "Project":
            return _seq(node.projectList())
        if name == "Aggregate":
            return _seq(node.aggregateExpressions())
        if name == "Window":
            return _seq(node.windowExpressions())
        if name == "Generate":
            return _seq(node.generatorOutput())
        # Generate and Expand have dedicated branches in the walk
    except Exception:
        pass
    return []


def column_lineage(plan) -> list[ColumnLineage]:
    """Map each output column of ``plan`` to its base input columns."""
    _, columns, _ = analyze_plan(plan, with_columns=True)
    return columns


# DSv2 write plans don't follow the v1 *Command naming
V2_WRITE_NODES = {
    "CreateTableAsSelect",
    "ReplaceTableAsSelect",
    "AppendData",
    "OverwriteByExpression",
    "OverwritePartitionsDynamic",
}

# v1 write commands carry Insert/AsSelect/SaveInto in the class name;
# a bare *Command suffix also matches SET/SHOW/DESCRIBE/EXPLAIN etc.,
# which are metadata reads and must NOT produce write reports
# InsertIntoHiveTable carries no "Command" suffix — matched explicitly
# (embedded-Hive metastore path, exercised in tests/test_hive_lineage.py)
_WRITE_CMD_RE = re.compile(
    r"(Insert.*Command|Create.*AsSelect.*Command|SaveInto.*Command|InsertIntoHiveTable)$"
)


def is_write_command(cls_name: str) -> bool:
    return cls_name in V2_WRITE_NODES or bool(_WRITE_CMD_RE.search(cls_name))


def _command_output(node) -> Optional[DatasetRef]:
    """Recognize a write COMMAND node's target (SURVEY §0: the
    reference's primary capture points — InsertIntoHadoopFsRelation,
    CreateDataSourceTableAsSelect, plus the DSv2 write plans)."""
    name = _cls(node)
    if not is_write_command(name):
        return None
    if name in V2_WRITE_NODES:
        # v2: the target rides a NamedRelation
        for getter in ("table", "name"):
            try:
                t = getattr(node, getter)()
                return DatasetRef(kind="table", format="v2", name=t.name())
            except Exception:
                continue
        return DatasetRef(kind="table", format="v2", name=name)
    for table_getter in ("table", "tableDesc"):
        # .table() → CatalogTable on InsertIntoHiveTable / datasource
        # commands; .tableDesc() → CreateHiveTableAsSelectCommand
        try:
            ident = getattr(node, table_getter)().identifier().unquotedString()
            return DatasetRef(kind="table", name=ident)
        except Exception:
            pass
    try:
        path = node.outputPath().toString()
        fmt = None
        try:
            fmt = node.fileFormat().toString().lower()
        except Exception:
            pass
        return DatasetRef(kind="path", format=fmt, name=_short_name(path), paths=[path])
    except Exception:
        pass
    return DatasetRef(kind="unknown", name=name)


def analyze_plan(
    plan, with_columns: bool = True, _raw: bool = False
) -> tuple[list[DatasetRef], list, Optional[DatasetRef]]:
    """ONE tree walk producing inputs, column lineage, and (for SQL
    write commands) the output target.

    py4j round-trips dominate extraction cost (~50 ms split across two
    walks before this merge), so leaves are analyzed once and shared.
    """
    mapping: dict[int, set[tuple[str, str]]] = {}
    found: list[DatasetRef] = []
    output_ref: list[Optional[DatasetRef]] = [None]
    # CTE / recursive-CTE support: defs and loop anchors register their
    # output exprIds here; the Ref leaves bind to them POSITIONALLY
    # (a CTERelationRef / UnionLoopRef mints fresh exprIds per reference)
    cte_outs: dict[int, list[int]] = {}
    loop_outs: dict[int, list[int]] = {}

    def ds_label(ref: DatasetRef) -> str:
        return ref.name or (ref.paths[0] if ref.paths else ref.kind)

    def walk(node, view: Optional[str] = None):
        name = _cls(node)
        if name == "CommandResult":
            # a later action on an already-executed command's DataFrame
            # sees this wrapper; the real command hangs off it
            try:
                walk(node.commandLogicalPlan(), None)
                return
            except Exception:
                pass
        if is_write_command(name):
            cmd_out = _command_output(node)
            if cmd_out is not None and output_ref[0] is None:
                output_ref[0] = cmd_out
            # the written query hangs off .query(), not always children
            try:
                q = node.query()
                if cmd_out is not None and not cmd_out.fields:
                    cmd_out.fields = _fields_of(q)
                if node.children().size() == 0:
                    walk(q, None)
                    return
            except Exception:
                pass
            for ch in _children(node):
                walk(ch, None)
            return
        if name == "SubqueryAlias":
            try:
                alias = node.alias()
            except Exception:
                alias = None
            for ch in _children(node):
                walk(ch, alias)
            return
        if name == "CTERelationDef":
            # walk the definition, then expose its output ids for every
            # later CTERelationRef of the same cte id
            for ch in _children(node):
                walk(ch, view)
            try:
                cte_outs[node.id()] = [
                    a.exprId().id() for a in _seq(node.child().output())
                ]
            except Exception:
                pass
            return
        if name == "CTERelationRef":
            try:
                base = cte_outs.get(node.cteId(), [])
                for pos, a in enumerate(_seq(node.output())):
                    if pos < len(base):
                        mapping[a.exprId().id()] = set(mapping.get(base[pos], set()))
            except Exception:
                pass
            return  # leaf; the def's walk already collected its inputs
        if name == "UnionLoop":
            # recursive CTE body: walk the anchor FIRST so the recursive
            # branch's UnionLoopRef can bind to the anchor's columns,
            # then bind the loop's own output per-position like Union
            try:
                loop_id = node.id()
            except Exception:
                loop_id = None
            kids = _children(node)
            if kids:
                walk(kids[0], None)
                try:
                    loop_outs[loop_id] = [
                        a.exprId().id() for a in _seq(kids[0].output())
                    ]
                except Exception:
                    pass
                for k in kids[1:]:
                    walk(k, None)
            try:
                kid_outs = [_seq(k.output()) for k in kids]
                for pos, a in enumerate(_seq(node.output())):
                    srcs: set[tuple[str, str]] = set()
                    for ko in kid_outs:
                        if pos < len(ko):
                            srcs |= mapping.get(ko[pos].exprId().id(), set())
                    mapping[a.exprId().id()] = srcs
            except Exception:
                pass
            return
        if name == "UnionLoopRef":
            try:
                base = loop_outs.get(node.loopId(), [])
                for pos, a in enumerate(_seq(node.output())):
                    if pos < len(base):
                        mapping[a.exprId().id()] = set(mapping.get(base[pos], set()))
            except Exception:
                pass
            return  # leaf; the anchor's walk already collected inputs
        if name == "LogicalRDD":
            # a lineage_checkpoint'ed subtree: splice the recorded
            # pre-checkpoint inputs/column sources back in
            try:
                rdd = node.rdd()
                entry = _resolve_checkpoint_entry(
                    (rdd.context().applicationId(), rdd.id())
                )
            except Exception:
                entry = None
            if entry is not None:
                ckpt_inputs, colmap = entry
                found.extend(ckpt_inputs)
                if with_columns:
                    try:
                        for a in _seq(node.output()):
                            srcs = colmap.get(a.name())
                            if srcs:
                                mapping[a.exprId().id()] = set(srcs)
                    except Exception:
                        pass
                return
        ref = _leaf_ref(node)
        chs = _children(node)
        if ref is None and not chs:
            # unrecognized LEAF (LogicalRDD, CTERelationRef, checkpoint
            # scans, ...): record an explicit unknown rather than
            # silently reporting a query that read nothing
            ref = DatasetRef(kind="unknown", name=name, fields=_fields_of(node))
        if ref is not None:
            if view and ref.kind in ("memory",):
                ref = DatasetRef(kind="table", name=view, fields=ref.fields)
            elif view and not ref.name:
                ref.name = view
            found.append(ref)
            if with_columns:
                label = ds_label(ref)
                for f, a_name in _leaf_attr_ids(node):
                    mapping[f] = {(label, a_name)}
            return
        for ch in chs:
            walk(ch, None)
        if not with_columns:
            return
        # after children: register this node's derived expressions
        if name == "Union":
            # output attrs bind per-position to every child's attrs
            try:
                kids = _seq(node.children())
                outs = _seq(node.output())
                kid_outs = [_seq(k.output()) for k in kids]
                for pos, a in enumerate(outs):
                    srcs: set[tuple[str, str]] = set()
                    for ko in kid_outs:
                        if pos < len(ko):
                            srcs |= mapping.get(ko[pos].exprId().id(), set())
                    mapping[a.exprId().id()] = srcs
            except Exception:
                pass
            return
        if name == "Generate":
            # generator OUTPUT attrs (e.g. pos/col of posexplode) carry
            # no references — the source columns hang off generator()
            gen_srcs: set[tuple[str, str]] = set()
            try:
                for ref_attr in _iter_attr_set(node.generator().references()):
                    gen_srcs |= mapping.get(ref_attr.exprId().id(), set())
                for a in _seq(node.generatorOutput()):
                    mapping[a.exprId().id()] = set(gen_srcs)
            except Exception:
                pass
            return
        if name == "Expand":
            # rollup/cube/grouping-sets: output attrs are FRESH exprIds
            # bound positionally to each projection row — union the
            # refs of every projection's expression at that position
            try:
                outs = _seq(node.output())
                projs = [_seq(p) for p in _seq(node.projections())]
                for pos, a in enumerate(outs):
                    srcs: set[tuple[str, str]] = set()
                    for proj in projs:
                        if pos < len(proj):
                            try:
                                for ref_attr in _iter_attr_set(proj[pos].references()):
                                    srcs |= mapping.get(ref_attr.exprId().id(), set())
                            except Exception:
                                pass
                    mapping[a.exprId().id()] = srcs
            except Exception:
                pass
            return
        for ne in _named_expr_nodes(node):
            try:
                eid = ne.exprId().id()
            except Exception:
                continue
            srcs: set[tuple[str, str]] = set()
            try:
                for ref_attr in _iter_attr_set(ne.references()):
                    srcs |= mapping.get(ref_attr.exprId().id(), set())
            except Exception:
                pass
            if eid in mapping:
                mapping[eid] |= srcs
            else:
                mapping[eid] = srcs

    walk(plan, None)

    # dedupe inputs (self-joins read the same input twice — SURVEY §2.3)
    seen, inputs = set(), []
    for r in found:
        k = r.key()
        if k not in seen:
            seen.add(k)
            inputs.append(r)

    columns: list = []
    if with_columns:
        try:
            for a in _seq(plan.output()):
                srcs = mapping.get(a.exprId().id(), set())
                if _raw:
                    # internal form for lineage_checkpoint: keep the
                    # (dataset, column) tuples — dataset labels may
                    # contain dots, so the joined string is lossy
                    columns.append((a.name(), set(srcs)))
                else:
                    columns.append(
                        ColumnLineage(
                            output=a.name(),
                            inputs=sorted(f"{ds}.{col}" for ds, col in srcs),
                        )
                    )
        except Exception:
            pass
    return inputs, columns, output_ref[0]


# ---------------------------------------------------------------------------
# report assembly
# ---------------------------------------------------------------------------


def extract_report(
    df: DataFrame,
    func_name: str = "",
    duration_s: float = 0.0,
    app_id: str = "",
    app_name: str = "",
    output: Optional[dict[str, Any]] = None,
    error: Optional[str] = None,
    num_output_rows: Optional[int] = None,
) -> LineageReport:
    inputs: list[DatasetRef] = []
    columns: list[ColumnLineage] = []
    command_out: Optional[DatasetRef] = None
    try:
        plan = df._jdf.queryExecution().analyzed()
        inputs, columns, command_out = analyze_plan(plan)
    except Exception:
        # degraded mode: physical input files only (still real lineage)
        try:
            files = sorted(set(df.inputFiles()))
            if files:
                inputs = [DatasetRef(kind="path", paths=files, name=_short_name(files[0]))]
        except Exception:
            pass

    out_ref = command_out  # SQL write command target, if any
    if output:
        out_ref = DatasetRef(
            kind=output.get("kind", "path"),
            format=output.get("format"),
            name=output.get("name"),
            paths=output.get("paths", []),
            fields=[FieldInfo(f.name, f.dataType.simpleString(), f.nullable) for f in df.schema.fields],
        )

    return LineageReport(
        inputs=inputs,
        output=out_ref,
        columns=columns,
        run=RunMetadata(
            app_id=app_id,
            app_name=app_name,
            func_name=func_name,
            duration_s=duration_s,
            error=error,
            num_output_rows=num_output_rows,
        ),
    )
