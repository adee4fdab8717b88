"""UDF / UDAF / UDTF surface (SURVEY.md §2.10).

Every user-defined path is checked against a SQL-expressible
equivalent so the oracle can verify the plumbing. Note the hot-path
guidance (§2.8 vs §2.10): builtins first; row-at-a-time UDFs exist
for API parity and are deliberately used on narrow data only.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from spark_lineage_spark.registry import query
from spark_lineage_spark.tables import load


@query(
    "udf_scalar_python",
    "§2.10 row-at-a-time Python UDF",
    """
    SELECT p_partkey,
           CASE WHEN p_size % 2 = 0 THEN upper(p_name) ELSE lower(p_name) END AS shouted
    FROM part
    """,
)
def udf_scalar_python(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time UDF (the slow path — serde per row). Used here on
    a 2-column projection of the smallest fact table; the pandas UDF
    below is the production shape."""

    @F.udf(T.StringType())
    def shout(name: str, size: int) -> str:
        return name.upper() if size % 2 == 0 else name.lower()

    p = load(spark, sf_dir, "part")
    return p.select("p_partkey", shout("p_name", "p_size").alias("shouted"))


@query(
    "udf_pandas_scalar",
    "§2.10 vectorized pandas UDF (Arrow)",
    """
    SELECT o_orderkey,
           round(o_totalprice * 1.1 + 5.0, 4) AS adjusted
    FROM orders
    """,
)
def udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-vectorized scalar UDF: one numpy op per batch, ~10-100×
    the row-at-a-time throughput (SURVEY §2.10)."""

    @F.pandas_udf(T.DoubleType())
    def adjust(price: pd.Series) -> pd.Series:
        return price * 1.1 + 5.0

    o = load(spark, sf_dir, "orders")
    # round OUTSIDE the UDF with F.round (HALF_UP, matching the oracle);
    # pandas .round is banker's half-to-even (the udf_apply_in_arrow rule)
    return o.select(
        "o_orderkey", F.round(adjust("o_totalprice"), 4).alias("adjusted")
    )


@query(
    "udf_pandas_grouped_agg",
    "§2.10 grouped-agg pandas UDAF",
    """
    SELECT o_orderstatus,
           round(sum(o_totalprice * o_custkey) / sum(CAST(o_custkey AS DOUBLE)), 4) AS wavg
    FROM orders WHERE o_custkey > 0 GROUP BY o_orderstatus
    """,
)
def udf_pandas_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom UDAF (weighted mean) as a grouped-agg pandas UDF —
    Spark still runs partial aggregation per partition before the
    shuffle of the (tiny) per-group pandas inputs."""

    @F.pandas_udf(T.DoubleType())
    def wavg(price: pd.Series, weight: pd.Series) -> float:
        return float((price * weight).sum() / weight.sum())

    o = load(spark, sf_dir, "orders").filter(F.col("o_custkey") > 0)
    # F.round outside the UDF: HALF_UP like the oracle, not banker's
    return o.groupBy("o_orderstatus").agg(
        F.round(
            wavg("o_totalprice", F.col("o_custkey").cast("double")), 4
        ).alias("wavg")
    )


@query(
    "udf_grouped_map_normalize",
    "§2.10 grouped-map applyInPandas (per-group normalize)",
    """
    SELECT c_nationkey, c_custkey,
           round((c_acctbal - avg(c_acctbal) OVER (PARTITION BY c_nationkey))
                 / stddev_samp(c_acctbal) OVER (PARTITION BY c_nationkey), 6) AS zscore
    FROM customer
    """,
)
def udf_grouped_map_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandas normalize-per-group vs the equivalent window SQL
    (SURVEY §2.10 check). One shuffle on the group key, Arrow both
    directions."""

    def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
        bal = pdf["c_acctbal"]
        pdf = pdf[["c_nationkey", "c_custkey"]].copy()
        pdf["zscore"] = (bal - bal.mean()) / bal.std(ddof=1)
        return pdf

    c = load(spark, sf_dir, "customer").select("c_nationkey", "c_custkey", "c_acctbal")
    # F.round outside the UDF: HALF_UP like the oracle, not banker's
    return (
        c.groupBy("c_nationkey")
        .applyInPandas(
            normalize, schema="c_nationkey int, c_custkey long, zscore double"
        )
        .withColumn("zscore", F.round("zscore", 6))
    )


@query(
    "udf_map_in_pandas",
    "§2.10 mapInPandas (per-partition batch iterator)",
    """
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice * (1 - l_discount), 4) AS net
    FROM lineitem WHERE l_quantity > 45.0
    """,
)
def udf_map_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas as a custom map operator: filter + compute inside
    the Arrow batch iterator; partition-preserving, no shuffle."""

    def op(batches):
        for pdf in batches:
            out = pdf[pdf["l_quantity"] > 45.0]
            yield pd.DataFrame(
                {
                    "l_orderkey": out["l_orderkey"],
                    "l_linenumber": out["l_linenumber"],
                    "net": out["l_extendedprice"] * (1 - out["l_discount"]),
                }
            )

    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount"
    )
    # F.round outside the UDF: HALF_UP like the oracle, not banker's
    return li.mapInPandas(
        op, schema="l_orderkey long, l_linenumber int, net double"
    ).withColumn("net", F.round("net", 4))


@query(
    "udf_map_in_arrow",
    "§2.10 mapInArrow (raw Arrow RecordBatch iterator)",
    """
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS net
    FROM lineitem WHERE l_quantity > 45.0
    """,
)
def udf_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow: the zero-copy sibling of mapInPandas — operates on
    pyarrow RecordBatches directly (no pandas conversion), the
    lowest-overhead Python hook for columnar kernels. No rounding:
    pc.round disagrees with SQL round by 1 ulp on some doubles, while
    the raw IEEE multiply is bitwise-identical across engines."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def op(batches):
        for batch in batches:
            mask = pc.greater(batch.column("l_quantity"), pa.scalar(45.0))
            kept = batch.filter(mask)
            net = pc.multiply(
                kept.column("l_extendedprice"),
                pc.subtract(pa.scalar(1.0), kept.column("l_discount")),
            )
            yield pa.RecordBatch.from_arrays(
                [kept.column("l_orderkey"), kept.column("l_linenumber"), net],
                names=["l_orderkey", "l_linenumber", "net"],
            )

    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount"
    )
    return li.mapInArrow(op, schema="l_orderkey long, l_linenumber int, net double")


@query(
    "udtf_split_words",
    "§2.10 Python UDTF (table function)",
    """
    SELECT doc_id, unnest(string_split(text, ' ')) AS word
    FROM documents WHERE doc_id < 25
    """,
)
def udtf_split_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 @udtf: one input row → many output rows, checked against
    unnest/lateral SQL. Registered then invoked via SQL+lateral join."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="word: string")
    class SplitWords:
        def eval(self, text: str):
            for w in text.split(" "):
                if w:
                    yield (w,)

    spark.udtf.register("split_words", SplitWords)
    from spark_lineage_spark.tables import register_views

    register_views(spark, sf_dir, ["documents"])
    return spark.sql(
        """
        SELECT d.doc_id, s.word
        FROM documents d, LATERAL split_words(d.text) s
        WHERE d.doc_id < 25
        """
    )


@query(
    "udf_cogroup_in_pandas",
    "§2.10 cogrouped applyInPandas (two-table per-key merge)",
    """
    WITH e AS (SELECT user_id, count(*) AS n_events,
                      round(sum(value), 2) AS total_value
               FROM events WHERE user_id < 100 GROUP BY user_id),
    o AS (SELECT o_custkey AS user_id, count(*) AS n_orders
          FROM orders WHERE o_custkey < 100 GROUP BY o_custkey)
    SELECT coalesce(e.user_id, o.user_id) AS user_id,
           coalesce(n_events, 0) AS n_events,
           coalesce(total_value, 0.0) AS total_value,
           coalesce(n_orders, 0) AS n_orders
    FROM e FULL OUTER JOIN o ON e.user_id = o.user_id
    """,
)
def udf_cogroup_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """groupBy().cogroup().applyInPandas — the two-sided custom merge
    operator (per-key reconciliation, custom as-of logic, feature
    joins). Each side shuffles once on the key; the UDF receives both
    sides' rows for one key as pandas frames. Here it computes an
    activity-vs-orders reconciliation per user, checked against the
    equivalent aggregate + full-outer-join SQL — the strongest oracle
    form for a cogroup (it must reproduce engine join semantics
    including keys present on only one side)."""

    def merge(ev: pd.DataFrame, od: pd.DataFrame) -> pd.DataFrame:
        uid = ev["user_id"].iloc[0] if len(ev) else od["o_custkey"].iloc[0]
        return pd.DataFrame(
            {
                "user_id": [int(uid)],
                "n_events": [len(ev)],
                # raw sum here; HALF_UP rounding applied outside via
                # F.round — Python round() is half-to-even (ADVICE r4)
                "total_value": [float(ev["value"].sum()) if len(ev) else 0.0],
                "n_orders": [len(od)],
            }
        )

    # cogroup invokes the UDF once per key — Python-per-key is the
    # deliberate slow path (reserved for logic a join can't express),
    # so the demo bounds the key range instead of paying ~10 ms x
    # every customer for identical coverage of the API surface.
    ev = load(spark, sf_dir, "events").select("user_id", "value").filter(
        F.col("user_id") < 100
    )
    od = load(spark, sf_dir, "orders").select("o_custkey").filter(
        F.col("o_custkey") < 100
    )
    return (
        ev.groupBy("user_id")
        .cogroup(od.groupBy("o_custkey"))
        .applyInPandas(
            merge, schema="user_id long, n_events long, total_value double, n_orders long"
        )
        .withColumn("total_value", F.round("total_value", 2))
    )


@query(
    "udf_apply_in_arrow",
    "§2.10 grouped applyInArrow (Arrow-native grouped map, no pandas)",
    """
    SELECT c_mktsegment AS segment,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(c_acctbal), 2) AS total_bal,
           round(max(c_acctbal) - min(c_acctbal), 2) AS bal_range
    FROM customer GROUP BY c_mktsegment
    """,
)
def udf_apply_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4's Arrow-native grouped map: the UDF receives each group
    as a pyarrow.Table and returns one — no pandas materialization at
    all, which for wide or binary-heavy groups skips a full
    Arrow→pandas→Arrow copy relative to applyInPandas (the reason this
    API exists). Group computation uses pyarrow.compute kernels
    (vectorized C++), so the Python layer is just dispatch. Same
    shuffle shape as every grouped map: one exchange on the key.

    Rounding happens OUTSIDE the UDF with F.round (HALF_UP, matching
    the DuckDB oracle and every other query) — Python's round() is
    banker's half-to-even and would flip an exact-half cent
    (ADVICE r4)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def summarize(table: pa.Table) -> pa.Table:
        bal = table.column("c_acctbal")
        total = pc.sum(bal).as_py() or 0.0
        mx, mn = pc.max(bal).as_py(), pc.min(bal).as_py()
        return pa.table(
            {
                "segment": [table.column("c_mktsegment")[0].as_py()],
                "n": pa.array([table.num_rows], type=pa.int64()),
                "total_bal": [total],
                "bal_range": [mx - mn],
            }
        )

    c = load(spark, sf_dir, "customer").select("c_mktsegment", "c_acctbal")
    out = c.groupBy("c_mktsegment").applyInArrow(
        summarize, schema="segment string, n long, total_bal double, bal_range double"
    )
    return out.withColumn("total_bal", F.round("total_bal", 2)).withColumn(
        "bal_range", F.round("bal_range", 2)
    )


@query(
    "udtf_analyze_polymorphic",
    "§2.10 polymorphic Python UDTF (static analyze() computes schema from args)",
    """
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS parts
               FROM documents WHERE doc_id < 50)
    SELECT doc_id,
           CASE WHEN len(parts) >= 1 THEN parts[1] END AS c0,
           CASE WHEN len(parts) >= 2 THEN parts[2] END AS c1,
           CASE WHEN len(parts) >= 3 THEN parts[3] END AS c2,
           CAST(len(parts) AS INTEGER) AS n_parts
    FROM t
    """,
)
def udtf_analyze_polymorphic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4's POLYMORPHIC UDTF: the static ``analyze()`` hook runs
    at PLAN time on the call's literal arguments and returns the
    output schema — here ``split_cols(text, ' ', 3)`` manufactures
    columns c0..c2 because the literal 3 says so; call it with 5 and
    the same class plans 5 columns. This is the table-function
    contract Catalyst needs to resolve downstream references and prune
    columns BEFORE any Python worker starts — schema-on-plan, not
    schema-on-read. eval() itself is one row in → one row out with the
    first n whitespace tokens (missing → NULL, matching the oracle's
    bounds-checked list indexing) plus the total token count. The
    worker cost is the usual pickled-Python row path — fine for the
    surface check; a hot path would use split()+getItem JVM-side."""
    from pyspark.sql.functions import udtf
    from pyspark.sql.types import IntegerType, StringType, StructType
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    @udtf
    class SplitCols:
        @staticmethod
        def analyze(
            text: AnalyzeArgument, delim: AnalyzeArgument, n: AnalyzeArgument
        ) -> AnalyzeResult:
            schema = StructType()
            for i in range(n.value):
                schema = schema.add(f"c{i}", StringType())
            return AnalyzeResult(schema=schema.add("n_parts", IntegerType()))

        def eval(self, text: str, delim: str, n: int):
            parts = [p for p in (text or "").split(delim)]
            yield tuple(parts[i] if i < len(parts) else None for i in range(n)) + (
                len(parts),
            )

    spark.udtf.register("split_cols", SplitCols)
    from spark_lineage_spark.tables import register_views

    register_views(spark, sf_dir, ["documents"])
    return spark.sql(
        """
        SELECT d.doc_id, s.c0, s.c1, s.c2, s.n_parts
        FROM documents d, LATERAL split_cols(d.text, ' ', 3) s
        WHERE d.doc_id < 50
        """
    )


@query(
    "udf_arrow_optimized",
    "§2.10 Arrow-optimized Python UDF (useArrow=True, Spark 3.5+/4)",
    """
    SELECT o_orderkey,
           CAST(floor(o_totalprice / 10000) * 10000 AS DOUBLE) AS price_band,
           upper(o_orderpriority) AS prio_up
    FROM orders WHERE o_orderkey % 7 = 0
    """,
)
def udf_arrow_optimized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``udf(..., useArrow=True)`` — the Spark-3.5+/4 Arrow-optimized
    Python UDF: SAME row-at-a-time user function as udf_scalar_python,
    but the executor⇄worker exchange is Arrow record batches instead
    of pickled rows (the serialization wall drops ~2×; still slower
    than a vectorized pandas UDF, which remains the hot-path choice).
    Semantics are identical to the pickled path — which is exactly
    what the shared relational oracle proves."""
    import math

    @F.udf("double", useArrow=True)
    def band(price: float) -> float:
        return math.floor(price / 10000.0) * 10000.0

    @F.udf("string", useArrow=True)
    def up(s: str) -> str:
        return s.upper()

    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 7 == 0)
    return o.select(
        "o_orderkey",
        band("o_totalprice").alias("price_band"),
        up("o_orderpriority").alias("prio_up"),
    )


@query(
    "udf_pandas_iterator",
    "§2.10 iterator-of-series pandas UDF (amortized per-partition init)",
    """
    SELECT l_orderkey, l_linenumber,
           CAST(floor(round(l_extendedprice * (1 - l_discount), 10) * 1.19 * 100
                      + 0.5) AS BIGINT) AS gross_cents
    FROM lineitem WHERE l_orderkey % 5 = 0
    """,
)
def udf_pandas_iterator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ``Iterator[pd.Series] -> Iterator[pd.Series]`` pandas-UDF
    form: one Python generator per PARTITION instead of one call per
    batch, so expensive per-worker initialization (model load, tax
    table, tokenizer) is paid once before the loop and amortized over
    every Arrow batch — the canonical shape for ML-scoring UDFs at
    100 TB. Here the 'model' is a tax rate fetched once; the math is
    then vectorized per batch. Same Arrow transfer as a scalar pandas
    UDF; the oracle is the inlined expression."""
    @F.pandas_udf("double")
    def gross(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        tax_rate = 1.19  # stand-in for expensive one-time init
        for net in batches:
            # no .round() here: pandas rounds half-to-even while the
            # engines round half-up — final rounding is F.round outside
            yield net * tax_rate

    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 5 == 0)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        # floor(x*100 + 0.5) integer cents, NOT round(x, 2): both
        # engines' round() on a DOUBLE half-boundary can disagree
        # (measured on 15422.994999...); floor over the identical
        # binary double cannot
        F.floor(
            gross(F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 10))
            * 100
            + 0.5
        )
        .cast("long")
        .alias("gross_cents"),
    )


@query(
    "udtf_table_argument",
    "§2.10 Python UDTF over a TABLE(...) argument (PARTITION BY / ORDER BY routing)",
    """
    SELECT o_orderstatus AS status,
           count(*) AS n,
           CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
             AS total_cents,
           CAST(min(o_orderkey) AS BIGINT) AS first_key,
           CAST(max(o_orderkey) AS BIGINT) AS last_key
    FROM orders GROUP BY o_orderstatus
    """,
)
def udtf_table_argument(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4's table-argument UDTF contract: the function consumes
    `TABLE(subquery) PARTITION BY k ORDER BY o`, and the engine
    guarantees every row of one partition-key group reaches ONE UDTF
    instance, in order — eval() accumulates, terminate() emits the
    per-group summary. That routing (a shuffle on the PARTITION BY
    key + in-group sort) is exactly a groupBy-agg's exchange, so the
    DuckDB oracle is the plain GROUP BY; first/last keys prove the
    ORDER BY reached the worker. The running total stays in a Python
    int (arbitrary precision — no overflow at any SF). This is the
    API for custom per-group logic that needs ordered iteration
    (sessionizers, sequence models) when built-in aggregates and
    applyInPandas's whole-group materialization both fall short: rows
    stream through eval() one at a time, O(1) state per group.
    (Measured: spark.sql.execution.pythonUDTF.arrow.enabled makes
    THIS shape 6x slower — per-row eval() gains nothing from Arrow
    batching and pays its framing; leave it off for accumulator
    UDTFs.)"""
    from pyspark.sql.functions import udtf

    @udtf(returnType=(
        "status string, n bigint, total_cents bigint, first_key bigint, last_key bigint"
    ))
    class GroupSummary:
        def __init__(self):
            self.status = None
            self.n = 0
            self.total = 0
            self.first_key = None
            self.last_key = None

        def eval(self, row):
            self.status = row["o_orderstatus"]
            self.n += 1
            self.total += row["cents"]
            if self.first_key is None:
                self.first_key = row["o_orderkey"]
            self.last_key = row["o_orderkey"]

        def terminate(self):
            if self.n:
                yield (self.status, self.n, self.total, self.first_key, self.last_key)

    spark.udtf.register("sls_group_summary", GroupSummary)
    from spark_lineage_spark.tables import register_views

    register_views(spark, sf_dir, ["orders"])
    return spark.sql(
        """
        SELECT status, n, total_cents, first_key, last_key
        FROM sls_group_summary(
          TABLE(SELECT o_orderstatus, o_orderkey,
                       CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
                FROM orders)
          PARTITION BY o_orderstatus ORDER BY o_orderkey
        )
        """
    )
