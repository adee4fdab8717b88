"""Similarity search over embeddings (SURVEY.md §2.11).

Baseline: exact brute-force cosine top-k — broadcast the (small) query
set, one linear scan over the corpus, per-query top-k via window. This
is the shape that survives 100 TB: corpus-side stays partitioned, no
shuffle of the corpus, the only shuffle is the final top-k on q keys
(tiny). Scale path: random-hyperplane LSH bucketing — candidates =
equi-join on bucket key, exact rerank inside buckets.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from spark_lineage_spark.functions.arrays import cosine, dot, norm, to_double_array
from spark_lineage_spark.plans.extract import lineage_checkpoint
from spark_lineage_spark.registry import query
from spark_lineage_spark.tables import load

TOP_K = 5
N_QUERIES = 10  # vec_id < 10 are the probe vectors


def _parallel_corpus(spark: SparkSession, e: DataFrame) -> DataFrame:
    """Vector-distance ops are compute-bound, not byte-bound: a 512 KB
    embedding file is one scan partition but carries q×dim FLOPs per
    row. When the scan has fewer partitions than cores and the data is
    small (cheap to shuffle), spread it; at real scale the input is
    already partitioned and this is a no-op."""
    try:
        import os

        files = e.inputFiles()
        size = sum(
            os.path.getsize(f.replace("file:", "").replace("//", "/")) for f in files
        )
    except Exception:
        return e
    par = spark.sparkContext.defaultParallelism
    # Estimate scan parallelism from file metadata instead of
    # e.rdd.getNumPartitions(): the RDD conversion built and planned
    # the whole query once per invocation (~0.1 s py4j/driver work,
    # optimization r14 guide §7.3). A scan yields at most one task per
    # max(128 MB, file) chunk, so small inputs always estimate below
    # the core count — same decision, no RDD materialization.
    est_parts = max(len(files), size // (128 << 20)) if files else par
    if size < (256 << 20) and est_parts < par:
        return e.repartition(par)
    return e


@query(
    "llm_knn_cosine_exact",
    "§2.11 exact top-k cosine kNN (broadcast queries, linear scan)",
    f"""
    WITH e AS (SELECT vec_id, label,
                      list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
               FROM embeddings),
    q AS (SELECT * FROM e WHERE vec_id < {N_QUERIES}),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, c.label AS neighbor_label,
             round(list_cosine_similarity(q.emb, c.emb), 6) AS cos_sim
      FROM q JOIN e c ON q.vec_id <> c.vec_id
    )
    SELECT query_id, neighbor_id, neighbor_label, cos_sim
    FROM scored
    QUALIFY row_number() OVER (PARTITION BY query_id
                               ORDER BY cos_sim DESC, neighbor_id) <= {TOP_K}
    """,
)
def llm_knn_cosine_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact kNN: F.broadcast(queries) ⋈ corpus — BroadcastNestedLoop
    over a 10-row side = a map-side scan of the corpus, NO corpus
    shuffle. Similarity is rounded to 6 digits BEFORE ranking, with
    neighbor_id tie-break, so ranking is engine-independent.

    Self-norms are hoisted out of the pair join (optimization r15,
    guide §1.2, the PQ-ADC precedent): cosine(q, c) inside the join
    re-evaluated norm(qemb) once per CORPUS row and norm(emb) once
    per QUERY — 2 of the 3 interpreted HOF folds per pair were
    redundant. Each side now carries its norm computed once; the
    division keeps the exact norm(a)*norm(b) operand order, so every
    rounded cos_sim — and the ranking — is bit-identical (pinned by
    test; warm best 0.67 s -> 0.48 s)."""
    e = (
        _parallel_corpus(spark, load(spark, sf_dir, "embeddings"))
        .select("vec_id", "label", to_double_array("embedding").alias("emb"))
        .withColumn("en", norm(F.col("emb")))
    )
    q = F.broadcast(
        e.filter(F.col("vec_id") < N_QUERIES).select(
            F.col("vec_id").alias("query_id"),
            F.col("emb").alias("qemb"),
            F.col("en").alias("qn"),
        )
    )
    scored = (
        q.join(e, F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.col("label").alias("neighbor_label"),
            F.round(
                dot(F.col("qemb"), F.col("emb")) / (F.col("qn") * F.col("en")),
                6,
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), "neighbor_id")
    return (
        scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= TOP_K).drop("rn")
    )


# ---------------------------------------------------------------------------
# scale path: random-hyperplane LSH
# ---------------------------------------------------------------------------

LSH_TABLES = 4
LSH_BITS = 4
_rng = np.random.RandomState(42)
# fixed hyperplanes per table (seeded, embedded as plan literals —
# deterministic across runs, sessions, and cluster sizes)
HYPERPLANES = _rng.standard_normal((LSH_TABLES, LSH_BITS, 64)).round(6)


def _bucket_expr(emb_col, table: int):
    """Sign-LSH bucket id for one hash table: packed sign bits of
    <emb, h_j>. The dot product is rounded to 6 decimals BEFORE the
    sign test (the repo's cross-engine float discipline), so the
    DuckDB oracle's list_dot_product makes the identical bucket
    decision — a raw > 0 could flip on a 1-ulp accumulation
    difference exactly at the boundary."""
    bucket = F.lit(0)
    for j in range(LSH_BITS):
        h = F.array(*[F.lit(float(v)) for v in HYPERPLANES[table][j]])
        bucket = bucket + F.when(
            F.round(dot(emb_col, h), 6) > 0, F.lit(1 << j)
        ).otherwise(F.lit(0))
    return bucket


def _lsh_oracle() -> str:
    """DuckDB twin of the full LSH pipeline: the hyperplane matrix is
    a (table, bit, 64-float) literal — 16 VALUES rows — so the oracle
    reproduces bucketing, 1-bit multi-probe, candidate join, and the
    exact-cosine rerank end-to-end."""
    rows = ",\n    ".join(
        f"({t}, {j}, [{', '.join(repr(float(v)) for v in HYPERPLANES[t][j])}])"
        for t in range(LSH_TABLES)
        for j in range(LSH_BITS)
    )
    flips = ", ".join(f"xor(bucket, {1 << j})" for j in range(LSH_BITS))
    return f"""
WITH e AS (SELECT vec_id,
                  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
           FROM embeddings),
planes(tbl, j, h) AS (VALUES
    {rows}),
buckets AS (
  SELECT e.vec_id, p.tbl,
         CAST(sum(CASE WHEN round(list_dot_product(e.emb, p.h), 6) > 0
                       THEN 1 << p.j ELSE 0 END) AS BIGINT) AS bucket
  FROM e CROSS JOIN planes p
  GROUP BY e.vec_id, p.tbl
),
probe_buckets AS (
  SELECT b.vec_id AS query_id, b.tbl,
         unnest([bucket, {flips}]) AS bucket
  FROM buckets b WHERE b.vec_id < {N_QUERIES}
),
cand AS (
  SELECT DISTINCT p.query_id, c.vec_id AS neighbor_id,
         round(list_cosine_similarity(qe.emb, ce.emb), 6) AS cos_sim
  FROM probe_buckets p
  JOIN buckets c ON c.tbl = p.tbl AND c.bucket = p.bucket
                AND c.vec_id <> p.query_id
  JOIN e qe ON qe.vec_id = p.query_id
  JOIN e ce ON ce.vec_id = c.vec_id
)
SELECT query_id, neighbor_id, cos_sim
FROM cand
QUALIFY row_number() OVER (PARTITION BY query_id
                           ORDER BY cos_sim DESC, neighbor_id) <= {TOP_K}
"""


@query(
    "llm_ann_lsh",
    "§2.11 ANN via multi-table random-hyperplane LSH (oracle-checked)",
    _lsh_oracle(),
)
def llm_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN scale path: L independent sign-LSH tables; candidates =
    equi-join on (table, bucket); exact cosine rerank on candidates
    only. Parameters size to the corpus: collision prob per hyperplane
    is 1-θ/π, so bits-per-table b trades candidate volume against
    recall and L tables amplify recall (1-(1-p)^L). This fixture is
    near-random (NN cosine ≈0.4 → p_bit≈0.63): b=4, L=4 with 1-bit
    multi-probe gives ~0.95 pair-collision; clustered production
    embeddings (NN cosine ≥0.8 → p_bit≥0.8) support b=12-16 for
    ~2^b-fold candidate reduction. At 100 TB the corpus is bucketed
    once at write time (partition by (table, bucket)); probes shuffle
    to buckets — no corpus-side O(n²). Measured recall@5 vs
    llm_knn_cosine_exact: 0.94 at sf0.001, 0.92 at sf0.01
    (deterministic — seeded hyperplanes); floor 0.9 asserted in
    tests/test_llm_ops.py::test_ann_lsh_recall_vs_exact. Round-6
    upgrade: the hyperplane matrix rides the oracle as 16 VALUES rows,
    so the WHOLE pipeline — bucketing (round-6 dot sign), multi-probe,
    candidate join, rerank — is now oracle-checked in DuckDB, not
    rows-only; the sign test rounds the dot to 6 decimals in both
    engines so a 1-ulp accumulation difference cannot flip a bucket."""
    e = _parallel_corpus(
        spark, load(spark, sf_dir, "embeddings")
    ).select("vec_id", "label", to_double_array("embedding").alias("emb"))
    # one row per (vector, table): bucket within that table
    bucketed = e.select(
        "vec_id",
        "emb",
        F.posexplode(
            F.array(*[_bucket_expr(F.col("emb"), t) for t in range(LSH_TABLES)])
        ).alias("tbl", "bucket"),
    )
    probes = bucketed.filter(F.col("vec_id") < N_QUERIES)

    # multi-probe: exact bucket + every 1-bit flip within the table
    probe_buckets = probes.select(
        F.col("vec_id").alias("query_id"),
        F.col("emb").alias("qemb"),
        "tbl",
        F.explode(
            F.array(
                F.col("bucket"),
                *[F.col("bucket").bitwiseXOR(F.lit(1 << j)) for j in range(LSH_BITS)],
            )
        ).alias("bucket"),
    )
    cand = (
        F.broadcast(probe_buckets)
        .join(bucketed, ["tbl", "bucket"])
        .filter(F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(cosine(F.col("qemb"), F.col("emb")), 6).alias("cos_sim"),
        )
        .distinct()
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), "neighbor_id")
    return cand.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= TOP_K).drop("rn")


@query(
    "llm_knn_cosine_pandas",
    "§2.11/§2.10 exact kNN via Arrow-batched pandas matmul",
    f"""
    WITH e AS (SELECT vec_id, label,
                      list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
               FROM embeddings),
    q AS (SELECT * FROM e WHERE vec_id < {N_QUERIES}),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             round(list_cosine_similarity(q.emb, c.emb), 6) AS cos_sim
      FROM q JOIN e c ON q.vec_id <> c.vec_id
    )
    SELECT query_id, neighbor_id, cos_sim
    FROM scored
    QUALIFY row_number() OVER (PARTITION BY query_id
                               ORDER BY cos_sim DESC, neighbor_id) <= {TOP_K}
    """,
)
def llm_knn_cosine_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same exact kNN, different physical path: the query matrix rides
    the closure to every partition and each Arrow batch computes one
    numpy matmul (queries × batch) — the high-throughput shape when
    per-element HOF evaluation becomes the bottleneck at wide
    dim × large batch. Identical oracle to llm_knn_cosine_exact."""
    import numpy as np

    e = _parallel_corpus(
        spark, load(spark, sf_dir, "embeddings")
    ).select("vec_id", to_double_array("embedding").alias("emb"))
    q_rows = sorted(
        # bounded-collect-ok: N_QUERIES rows -> closure. Collected from
        # the PLAIN scan (vec_id filter pushed to parquet), not from the
        # repartitioned corpus — the query pickup must not pay a
        # corpus-wide shuffle.
        load(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < N_QUERIES)
        .select("vec_id", to_double_array("embedding").alias("emb"))
        .collect(),  # bounded-collect-ok
        key=lambda r: r.vec_id,
    )
    q_ids = np.array([r.vec_id for r in q_rows])
    q_mat = np.array([r.emb for r in q_rows])  # (q, d)
    q_norm = q_mat / np.linalg.norm(q_mat, axis=1, keepdims=True)

    def score(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            c = np.array(pdf["emb"].to_list())  # (b, d)
            c_unit = c / np.linalg.norm(c, axis=1, keepdims=True)
            sims = c_unit @ q_norm.T  # (b, q)
            b = len(pdf)
            yield pd.DataFrame(
                {
                    "query_id": np.tile(q_ids, b),
                    "neighbor_id": np.repeat(pdf["vec_id"].to_numpy(), len(q_ids)),
                    "cos_sim": np.round(sims.reshape(-1), 6),
                }
            )

    scored = e.mapInPandas(
        score, schema="query_id long, neighbor_id long, cos_sim double"
    ).filter(F.col("query_id") != F.col("neighbor_id"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), "neighbor_id")
    return scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= TOP_K).drop("rn")


# ---------------------------------------------------------------------------
# scale path 2: IVF (coarse quantizer + probed exact rerank)
# ---------------------------------------------------------------------------

IVF_K = 16
IVF_NPROBE = 8
IVF_NASSIGN = 2  # each corpus vector is indexed under its 2 nearest lists
IVF_TRAIN_TARGET = 256 * IVF_K  # ~256 training points per centroid


_IVF_MODEL_CACHE: dict = {}


def _ivf_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, emb, lists) for the IVF family: every corpus vector
    with its IVF_NPROBE best-ranked centroid lists (cosine, best
    first). Extracted from llm_ann_ivf so the int8-in-cells variant
    (llm_ann_ivf_int8) indexes and probes the IDENTICAL quantizer —
    see llm_ann_ivf's docstring for the training/caching rationale."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    e = _parallel_corpus(
        spark, load(spark, sf_dir, "embeddings")
    ).select("vec_id", to_double_array("embedding").alias("emb"))
    feat = e.withColumn("features", array_to_vector("emb"))
    key = (spark.sparkContext.applicationId, sf_dir)
    model = _IVF_MODEL_CACHE.get(key)
    if model is None:
        for k in [k for k in _IVF_MODEL_CACHE if k[0] != key[0]]:
            del _IVF_MODEL_CACHE[k]
        n_corpus = load(spark, sf_dir, "embeddings").count()  # metadata-only
        train = feat.select("vec_id", "features")
        if n_corpus > IVF_TRAIN_TARGET:
            stride = -(-n_corpus // IVF_TRAIN_TARGET)  # ceil
            train = train.filter(F.col("vec_id") % stride == 0)
        train = (
            train.repartition(1)
            .sortWithinPartitions("vec_id")
            .select("features")
            .cache()
        )
        km = KMeans(
            k=IVF_K, seed=42, maxIter=5, initMode="random",
            featuresCol="features", predictionCol="list_id",
        )
        model = km.fit(train)
        train.unpersist()
        _IVF_MODEL_CACHE[key] = model
    cent_lit = F.array(
        *[
            F.struct(
                F.lit(i).alias("centroid_id"),
                F.array(*[F.lit(float(x)) for x in c]).alias("centroid"),
            )
            for i, c in enumerate(model.clusterCenters())
        ]
    )
    ranked_lists = F.transform(
        F.slice(
            F.array_sort(
                F.transform(
                    cent_lit,
                    lambda c: F.struct(
                        (-F.round(cosine(F.col("emb"), c["centroid"]), 6)).alias("neg_sim"),
                        c["centroid_id"].alias("centroid_id"),
                    ),
                )
            ),
            1,
            IVF_NPROBE,
        ),
        lambda s: s["centroid_id"],
    )
    return feat.select("vec_id", "emb").withColumn("lists", ranked_lists)


def _ivf_centroid_values() -> str:
    """Render the pinned sf0.01 coarse-quantizer centroids as a DuckDB
    VALUES list.  %.17e literals: E-notation parses as DOUBLE (a bare
    decimal literal would be DECIMAL) and 17 significant digits
    round-trip the exact IEEE doubles the Spark plan carries."""
    from spark_lineage_spark.operators._ivf_centroids_sf001 import (
        IVF_CENTROIDS_SF001,
    )

    return ",\n      ".join(
        f"({i}, [{', '.join(f'{x:.17e}' for x in c)}])"
        for i, c in enumerate(IVF_CENTROIDS_SF001)
    )


# Shared oracle prefix for the IVF family: pinned centroids -> per-
# vector centroid ranking by the same (-round(cos,6), centroid_id)
# key the Spark plan sorts on.
_IVF_ORACLE_PREFIX = f"""
    WITH cent(centroid_id, centroid) AS (VALUES
      {{values}}),
    e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
          FROM embeddings),
    ranked AS (
      SELECT vec_id, emb, centroid_id,
             row_number() OVER (
               PARTITION BY vec_id
               ORDER BY -round(list_cosine_similarity(emb, centroid), 6),
                        centroid_id) AS rk
      FROM e CROSS JOIN cent
    )"""


_IVF_ORACLE = (
    _IVF_ORACLE_PREFIX
    + f""",
    assigned AS (SELECT vec_id, emb, centroid_id AS list_id
                 FROM ranked WHERE rk <= {IVF_NASSIGN}),
    probes AS (SELECT vec_id AS query_id, emb AS qemb, centroid_id AS list_id
               FROM ranked WHERE vec_id < {N_QUERIES} AND rk <= {IVF_NPROBE}),
    cand AS (
      SELECT DISTINCT p.query_id, a.vec_id AS neighbor_id,
             round(list_cosine_similarity(p.qemb, a.emb), 6) AS cos_sim
      FROM probes p JOIN assigned a USING (list_id)
      WHERE p.query_id <> a.vec_id
    )
    SELECT query_id, neighbor_id, cos_sim
    FROM cand
    QUALIFY row_number() OVER (PARTITION BY query_id
                               ORDER BY cos_sim DESC, neighbor_id) <= {TOP_K}
    """
)


@query(
    "llm_ann_ivf",
    "§2.11 ANN via IVF (KMeans coarse quantizer) — hash-gated via pinned centroids",
    _IVF_ORACLE.format(values=_ivf_centroid_values()),
)
def llm_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN: train a KMeans coarse quantizer (seeded, few
    iterations), index every corpus vector under its IVF_NASSIGN
    nearest centroids by cosine (list replication, the FAISS
    multi-assignment / ScaNN-SOAR recall lever), probe the IVF_NPROBE
    nearest centroids per query, and exactly rerank only those lists.
    Assignment and probing use the SAME metric (cosine) so a
    neighbor's list ranking correlates with the query's probe ranking.
    At 100 TB: the quantizer trains on a sample, assignment is a
    map-only pass over a broadcast 16-row centroid table, and the
    corpus is written partitioned by list id so probes read only
    their lists (storage x IVF_NASSIGN, the standard recall/space
    trade). Centroids ride the plan as broadcast model parameters —
    no data collect(). Measured recall@5 vs exact kNN: 1.00 at
    sf0.001, 0.88 at sf0.01, bit-reproducible across sessions
    (deterministic stride-picked training rows in a sorted single
    partition + seeded KMeans; near-random fixture embeddings give
    the quantizer no cluster structure, the IVF worst case — on
    clustered real embeddings the same settings prune far more);
    floor 0.80 asserted in
    tests/test_llm_ops.py::test_ann_ivf_recall_vs_exact.

    Hash-gated since round 11 (was rows-only): the quantizer's
    bit-reproducibility means the sf0.01 centroids are one CONSTANT
    table, so the oracle pins them as VALUES literals
    (tools/gen_ivf_centroids.py regenerates; the pinned digest is
    asserted against a live-trained model in tests/test_round11_ops.py)
    and replays assignment -> dual-indexing -> nprobe probing -> exact
    rerank independently in DuckDB. The oracle is only meaningful at
    the driver's correctness-contract SF (sf0.01 — centroids are
    data-dependent); every other SF keeps the recall property tests."""
    vectors = _ivf_vectors(spark, sf_dir)
    # corpus side: indexed under its IVF_NASSIGN best lists (map-only)
    assigned = vectors.select(
        "vec_id",
        "emb",
        F.explode(F.slice("lists", 1, IVF_NASSIGN)).alias("list_id"),
    )
    # query side: probes its IVF_NPROBE best lists
    probe_lists = (
        vectors.filter(F.col("vec_id") < N_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("emb").alias("qemb"),
            F.explode("lists").alias("list_id"),
        )
    )
    cand = (
        F.broadcast(probe_lists)
        .join(assigned, "list_id")
        .filter(F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(cosine(F.col("qemb"), F.col("emb")), 6).alias("cos_sim"),
        )
        # dual assignment can surface the same (query, neighbor) via two
        # shared lists — collapse before the rerank window
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), "neighbor_id")
    return cand.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= TOP_K).drop("rn")


@query(
    "llm_embedding_centroids",
    "§2.11 per-label embedding centroids (dimension-wise mean)",
    """
    SELECT label, i AS dim, round(avg(x), 6) AS centroid
    FROM (
      SELECT label,
             unnest(list_transform(embedding, v -> CAST(v AS DOUBLE))) AS x,
             generate_subscripts(embedding, 1) AS i
      FROM embeddings
    )
    GROUP BY label, i
    """,
)
def llm_embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-class centroid vectors — the IVF/k-means seeding and
    class-prototype primitive. posexplode to (label, dim, component)
    rows, then ONE dimension-wise partial-agg'd groupBy: the shuffle
    carries only (n_labels × n_dims) partial sums regardless of corpus
    size. Cast to double BEFORE averaging so both engines accumulate in
    f64."""
    e = load(spark, sf_dir, "embeddings").select(
        "label", F.posexplode(to_double_array("embedding")).alias("pos", "x")
    )
    return (
        e.groupBy("label", (F.col("pos") + 1).alias("dim"))
        .agg(F.round(F.avg("x"), 6).alias("centroid"))
    )


@query(
    "llm_embedding_quantize_calib",
    "§2.11 int8 quantization calibration (per-vector scale)",
    """
    WITH e AS (
      SELECT vec_id, label,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
      FROM embeddings
    )
    SELECT vec_id, label,
           round(sqrt(list_sum(list_transform(emb, x -> x*x))), 6) AS l2_norm,
           round(list_aggregate(list_transform(emb, x -> abs(x)), 'max'), 6)
             AS max_abs,
           round(127.0 / list_aggregate(list_transform(emb, x -> abs(x)), 'max'), 4)
             AS int8_scale
    FROM e
    """,
)
def llm_embedding_quantize_calib(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector int8 quantization calibration for an embedding store:
    L2 norm (verifies the corpus is unit-normalized before cosine ≡
    dot-product shortcuts) and symmetric scale 127/max|x|. All
    higher-order array functions (F.aggregate / F.transform /
    F.array_max) — JVM-side, no shuffle at all: embarrassingly parallel
    over whatever partitioning the scan produced, which is exactly the
    shape that scales to a 100 TB embedding store. Cast to double
    before the fold so both engines accumulate in f64."""
    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", "label", to_double_array("embedding").alias("emb")
    )
    sumsq = F.aggregate("emb", F.lit(0.0), lambda acc, x: acc + x * x)
    max_abs = F.array_max(F.transform("emb", lambda x: F.abs(x)))
    return e.select(
        "vec_id",
        "label",
        F.round(F.sqrt(sumsq), 6).alias("l2_norm"),
        F.round(max_abs, 6).alias("max_abs"),
        F.round(F.lit(127.0) / max_abs, 4).alias("int8_scale"),
    )


RERANK_K = 20  # int8 pass keeps this many candidates per query


@query(
    "llm_ann_int8_rerank",
    "§2.11 int8 ANN scoring + exact float rerank (quantized candidate pass)",
    f"""
    WITH e AS (SELECT vec_id,
                      list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
               FROM embeddings),
    calib AS (
      SELECT vec_id, emb,
             round(127.0 / list_aggregate(list_transform(emb, x -> abs(x)), 'max'), 4)
               AS scale,
             round(sqrt(list_sum(list_transform(emb, x -> x*x))), 6) AS l2
      FROM e
    ),
    qz AS (
      SELECT vec_id, emb, scale, l2,
             list_transform(
               emb, x -> CAST(greatest(-127, least(127, floor(x * scale + 0.5)))
                              AS BIGINT)) AS qvec
      FROM calib
    ),
    q AS (SELECT * FROM qz WHERE vec_id < {N_QUERIES}),
    s1 AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             round(list_sum(list_transform(list_zip(q.qvec, c.qvec),
                                           p -> p[1] * p[2]))
                   / (c.scale * c.l2), 6) AS approx_sim,
             q.emb AS qemb, c.emb AS cemb
      FROM q JOIN qz c ON q.vec_id <> c.vec_id
    ),
    cand AS (
      SELECT * FROM s1
      QUALIFY row_number() OVER (PARTITION BY query_id
                                 ORDER BY approx_sim DESC, neighbor_id)
              <= {RERANK_K}
    )
    SELECT query_id, neighbor_id, approx_sim,
           round(list_cosine_similarity(qemb, cemb), 6) AS cos_sim
    FROM cand
    QUALIFY row_number() OVER (
        PARTITION BY query_id
        ORDER BY round(list_cosine_similarity(qemb, cemb), 6) DESC, neighbor_id)
      <= {TOP_K}
    """,
)
def llm_ann_int8_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantized ANN scoring: the int8 store llm_embedding_quantize_calib
    calibrates (symmetric per-vector scale 127/max|x|) is actually
    SEARCHED — the candidate pass scores every corpus vector with an
    INTEGER dot product over the quantized components (exact int64
    arithmetic, 4x smaller scan than float32 at a real store), keeps
    the RERANK_K best per query by dequantized-normalized score, and
    only those candidates are re-scored with exact float cosine for
    the final top-k. The int8 pass streams NARROW rows (two ids + a
    long) — candidate embeddings are re-fetched by id for the rerank
    (200 rows), never carried through the scan, which is the 100 TB
    shape. Quantization is floor(x*scale + 0.5) clamped to ±127 —
    floor is bit-identical across engines where a round() could
    half-tie differently — so the oracle replays the identical int8
    pipeline. Measured recall@5 vs llm_knn_cosine_exact: 1.00 at
    sf0.001 and 1.00 at sf0.01 (quantization noise never pushes a
    true top-5 neighbor out of the int8 top-20; floor asserted in
    tests/test_llm_ops.py::test_int8_rerank_recall)."""
    e = _parallel_corpus(
        spark, load(spark, sf_dir, "embeddings")
    ).select("vec_id", to_double_array("embedding").alias("emb"))
    scale = F.round(
        F.lit(127.0) / F.array_max(F.transform("emb", lambda x: F.abs(x))), 4
    )
    l2 = F.round(
        F.sqrt(F.aggregate("emb", F.lit(0.0), lambda acc, x: acc + x * x)), 6
    )
    qz = (
        e.withColumn("scale", scale)
        .withColumn("l2", l2)
        .withColumn(
            "qvec",
            F.transform(
                "emb",
                lambda x: F.greatest(
                    F.lit(-127),
                    F.least(F.lit(127), F.floor(x * F.col("scale") + F.lit(0.5))),
                ).cast("long"),
            ),
        )
    )
    queries = F.broadcast(
        qz.filter(F.col("vec_id") < N_QUERIES).select(
            F.col("vec_id").alias("query_id"),
            F.col("qvec").alias("q_qvec"),
            F.col("emb").alias("qemb"),
        )
    )
    int_dot = F.aggregate(
        F.zip_with("q_qvec", "qvec", lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    # int8 candidate pass: narrow output (ids + score), corpus never
    # shuffles — broadcast nested loop over the 10-row query side
    s1 = (
        queries.join(qz, F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(int_dot / (F.col("scale") * F.col("l2")), 6).alias("approx_sim"),
        )
    )
    w1 = Window.partitionBy("query_id").orderBy(F.desc("approx_sim"), "neighbor_id")
    cand = (
        s1.withColumn("rn", F.row_number().over(w1))
        .filter(F.col("rn") <= RERANK_K)
        .drop("rn")
    )
    # rerank: re-fetch float embeddings by id for the tiny candidate set
    corpus_emb = qz.select(F.col("vec_id").alias("neighbor_id"), F.col("emb").alias("cemb"))
    q_emb = qz.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("emb").alias("qemb")
    )
    reranked = (
        F.broadcast(cand)
        .join(corpus_emb, "neighbor_id")
        .join(F.broadcast(q_emb), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            "approx_sim",
            F.round(cosine(F.col("qemb"), F.col("cemb")), 6).alias("cos_sim"),
        )
    )
    w2 = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), "neighbor_id")
    return (
        reranked.withColumn("rn", F.row_number().over(w2))
        .filter(F.col("rn") <= TOP_K)
        .drop("rn")
    )


@query(
    "llm_cluster_assign",
    "§2.11 semantic cluster assignment (nearest per-label centroid)",
    """
    WITH e AS (SELECT vec_id, label,
                      list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
               FROM embeddings),
    comp AS (SELECT label, dim, round(avg(x), 6) AS c
             FROM (SELECT label, unnest(emb) AS x,
                          generate_subscripts(emb, 1) AS dim FROM e)
             GROUP BY label, dim),
    cent AS (SELECT label AS c_label, list(c ORDER BY dim) AS centroid
             FROM comp GROUP BY label),
    scored AS (SELECT e.vec_id, e.label, c_label,
                      round(list_sum(list_transform(list_zip(emb, centroid),
                            p -> (p[1] - p[2]) ** 2)), 6) AS dist2
               FROM e CROSS JOIN cent)
    SELECT vec_id, label, c_label AS assigned_label, dist2
    FROM scored
    QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist2, c_label) = 1
    """,
)
def llm_cluster_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic clustering for corpus balancing: assign every vector to
    its nearest class centroid (squared L2). The centroid table is
    built in the same plan — dimension-wise avg via posexplode (the
    shuffle carries only labels × dims partial sums), re-assembled into
    arrays with array_sort(collect_list(struct(dim, c))) — then
    broadcast under the corpus scan: the corpus itself never shuffles,
    which is the 100 TB shape (k centroids always fit in a broadcast).

    Cross-engine determinism: centroid components are rounded to 6
    BEFORE the distance fold, so both engines feed bit-identical
    doubles into the same left-to-right summation; the distance is
    rounded again before the (dist2, label) argmin tie-break."""
    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", "label", to_double_array("embedding").alias("emb")
    )
    comp = (
        e.select("label", F.posexplode("emb").alias("pos", "x"))
        .groupBy("label", "pos")
        .agg(F.round(F.avg("x"), 6).alias("c"))
    )
    cent = comp.groupBy(F.col("label").alias("c_label")).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "c"))), lambda s: s["c"]
        ).alias("centroid")
    )
    dist2 = F.aggregate(
        F.zip_with("emb", "centroid", lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    scored = e.crossJoin(F.broadcast(cent)).select(
        "vec_id", "label", "c_label", F.round(dist2, 6).alias("dist2")
    )
    w = Window.partitionBy("vec_id").orderBy("dist2", "c_label")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "label", F.col("c_label").alias("assigned_label"), "dist2")
    )


# Deterministic ±1 projection matrix (4 components × 64 dims), generated
# once at import with a fixed seed so the Spark plan literals and the
# DuckDB oracle SQL are built from the same numbers. Rademacher entries
# scaled by 1/sqrt(k) — the standard sparse Johnson–Lindenstrauss map.
def _rp_matrix(k: int = 4, dim: int = 64) -> list[list[float]]:
    import random

    rng = random.Random(20240613)
    return [[(1.0 if rng.random() < 0.5 else -1.0) / 2.0 for _ in range(dim)] for _ in range(k)]


_RP = _rp_matrix()


def _rp_oracle() -> str:
    comps = []
    for j, row in enumerate(_RP):
        terms = " + ".join(
            f"CAST(embedding[{i + 1}] AS DOUBLE)*({s})" for i, s in enumerate(row)
        )
        comps.append(f"round({terms}, 5) AS rp_{j}")
    return (
        "SELECT vec_id, label, " + ", ".join(comps) + " FROM embeddings"
    )


@query(
    "llm_embedding_random_projection",
    "§2.11 Johnson–Lindenstrauss random projection (64-d → 4-d, plan-literal matrix)",
    _rp_oracle(),
)
def llm_embedding_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dimensionality reduction as a map-only plan: each output
    component is a dot product against a ±1/√k row baked into the plan
    as an array literal — no broadcast variable, no Python, no shuffle;
    whole-stage codegen evaluates the fold inline. This is the cheap
    pre-step for LSH/clustering at 100 TB: 64→4 doubles per row cuts
    downstream shuffle bytes ~16× while approximately preserving
    pairwise distances (JL). zip_with+aggregate folds in index order,
    so the float→double sums associate identically to the oracle's
    left-to-right chain — results are bit-stable across engines."""
    e = load(spark, sf_dir, "embeddings")
    emb_d = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    cols = [F.col("vec_id"), F.col("label")]
    for j, row in enumerate(_RP):
        lit_row = F.array(*[F.lit(s) for s in row])
        comp = F.aggregate(
            F.zip_with(emb_d, lit_row, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        cols.append(F.round(comp, 5).alias(f"rp_{j}"))
    return e.select(*cols)


@query(
    "llm_embedding_drift",
    "§2.11 per-label embedding drift (centroid shift between ref and current windows)",
    """
    WITH e AS (
      SELECT vec_id % 2 AS w, label, u.dim,
             CAST(u.x AS DOUBLE) AS x
      FROM embeddings,
           LATERAL (SELECT unnest(embedding) AS x,
                           generate_subscripts(embedding, 1) AS dim) u
    ),
    c AS (
      SELECT label, w, dim,
             CAST(round(round(avg(x), 6) * 1000000) AS BIGINT) AS ci
      FROM e GROUP BY label, w, dim
    ),
    j AS (
      SELECT r.label, r.ci AS cr, u.ci AS cu
      FROM c r JOIN c u ON r.label = u.label AND r.dim = u.dim
      WHERE r.w = 0 AND u.w = 1
    ),
    per AS (
      SELECT label,
             sum((cr - cu) * (cr - cu)) AS d2,
             sum(cr * cu) AS dotp,
             sum(cr * cr) AS nr,
             sum(cu * cu) AS nu
      FROM j GROUP BY label
    ),
    n AS (
      SELECT label,
             count(CASE WHEN vec_id % 2 = 0 THEN 1 END) AS n_ref,
             count(CASE WHEN vec_id % 2 = 1 THEN 1 END) AS n_cur
      FROM embeddings GROUP BY label
    )
    SELECT per.label, CAST(n_ref AS BIGINT) AS n_ref,
           CAST(n_cur AS BIGINT) AS n_cur,
           round(sqrt(CAST(d2 AS DOUBLE)) / 1000000, 6) AS l2_shift,
           round(CAST(dotp AS DOUBLE) / (sqrt(CAST(nr AS DOUBLE))
                                         * sqrt(CAST(nu AS DOUBLE))), 6)
             AS cos_sim
    FROM per JOIN n ON per.label = n.label
    """,
)
def llm_embedding_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-distribution drift monitor: per label, the L2 shift
    and cosine similarity between the class centroid in a REFERENCE
    window and the CURRENT window (vec_id parity stands in for the
    two time windows — the retrain-trigger check every embedding
    pipeline schedules). Two dimension-wise partial-agg'd groupBys
    shuffle only (labels × dims × 2) partial sums regardless of
    corpus size; centroids are then rounded to 6 dp and scaled to
    EXACT integers, so the cross-centroid sums (distance, dot,
    norms) are integer-exact and the only floats are two final
    sqrt/divide steps — bit-stable cross-engine (the same
    micro-units discipline as the stats family)."""
    e = load(spark, sf_dir, "embeddings")
    comp = e.select(
        (F.col("vec_id") % 2).alias("w"),
        "label",
        F.posexplode(to_double_array("embedding")).alias("pos", "x"),
    )
    c = comp.groupBy("label", "w", (F.col("pos") + 1).alias("dim")).agg(
        F.expr("CAST(round(round(avg(x), 6) * 1000000) AS BIGINT)").alias("ci")
    )
    r, u = c.alias("r"), c.alias("u")
    j = r.join(
        u,
        (F.col("r.label") == F.col("u.label"))
        & (F.col("r.dim") == F.col("u.dim"))
        & (F.col("r.w") == 0)
        & (F.col("u.w") == 1),
    ).select(
        F.col("r.label").alias("label"),
        F.col("r.ci").alias("cr"),
        F.col("u.ci").alias("cu"),
    )
    per = j.groupBy("label").agg(
        F.sum((F.col("cr") - F.col("cu")) * (F.col("cr") - F.col("cu"))).alias("d2"),
        F.sum(F.col("cr") * F.col("cu")).alias("dotp"),
        F.sum(F.col("cr") * F.col("cr")).alias("nr"),
        F.sum(F.col("cu") * F.col("cu")).alias("nu"),
    )
    n = e.groupBy("label").agg(
        F.count(F.when(F.col("vec_id") % 2 == 0, 1)).alias("n_ref"),
        F.count(F.when(F.col("vec_id") % 2 == 1, 1)).alias("n_cur"),
    )
    return per.join(n, "label").select(
        "label",
        "n_ref",
        "n_cur",
        F.round(F.sqrt(F.col("d2").cast("double")) / 1000000, 6).alias("l2_shift"),
        F.round(
            F.col("dotp").cast("double")
            / (F.sqrt(F.col("nr").cast("double")) * F.sqrt(F.col("nu").cast("double"))),
            6,
        ).alias("cos_sim"),
    )


@query(
    "llm_ann_ivf_int8",
    "§2.11 production ANN: IVF cells × int8 scoring × exact float rerank — hash-gated via pinned centroids",
    (
        _IVF_ORACLE_PREFIX
        + f""",
    calib AS (
      SELECT vec_id, emb,
             round(127.0 / list_aggregate(list_transform(emb, x -> abs(x)), 'max'), 4)
               AS scale,
             round(sqrt(list_sum(list_transform(emb, x -> x*x))), 6) AS l2
      FROM e
    ),
    qz AS (
      SELECT vec_id, emb, scale, l2,
             list_transform(
               emb, x -> CAST(greatest(-127, least(127, floor(x * scale + 0.5)))
                              AS BIGINT)) AS qvec
      FROM calib
    ),
    assigned AS (SELECT q.vec_id, q.qvec, q.scale, q.l2, r.centroid_id AS list_id
                 FROM qz q JOIN ranked r ON q.vec_id = r.vec_id
                 WHERE r.rk <= {IVF_NASSIGN}),
    probes AS (SELECT q.vec_id AS query_id, q.qvec AS q_qvec,
                      r.centroid_id AS list_id
               FROM qz q JOIN ranked r ON q.vec_id = r.vec_id
               WHERE q.vec_id < {N_QUERIES} AND r.rk <= {IVF_NPROBE}),
    s1 AS (
      SELECT DISTINCT p.query_id, a.vec_id AS neighbor_id,
             round(list_sum(list_transform(list_zip(p.q_qvec, a.qvec),
                                           z -> z[1] * z[2]))
                   / (a.scale * a.l2), 6) AS approx_sim
      FROM probes p JOIN assigned a USING (list_id)
      WHERE p.query_id <> a.vec_id
    ),
    cand AS (
      SELECT query_id, neighbor_id FROM s1
      QUALIFY row_number() OVER (PARTITION BY query_id
                                 ORDER BY approx_sim DESC, neighbor_id)
              <= {RERANK_K}
    )
    SELECT c.query_id, c.neighbor_id,
           round(list_cosine_similarity(qe.emb, ne.emb), 6) AS cos_sim
    FROM cand c
    JOIN e ne ON ne.vec_id = c.neighbor_id
    JOIN e qe ON qe.vec_id = c.query_id
    QUALIFY row_number() OVER (
        PARTITION BY c.query_id
        ORDER BY round(list_cosine_similarity(qe.emb, ne.emb), 6) DESC,
                 c.neighbor_id) <= {TOP_K}
    """
    ).format(values=_ivf_centroid_values()),
)
def llm_ann_ivf_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PRODUCTION ANN composition (FAISS IVF-SQ / ScaNN shape):
    IVF cells bound WHICH vectors are scored (llm_ann_ivf's coarse
    quantizer via the shared _ivf_vectors — identical centroids,
    dual-assignment, nprobe 8), int8 integer dot products bound the
    COST of scoring them (llm_ann_int8_rerank's floor(x·scale+0.5)
    symmetric quantization — candidates stream as narrow
    (ids, long) rows), and only the top RERANK_K per query are
    re-scored with exact float cosine. At 100 TB this multiplies the
    two savings: probes read nprobe/K of the corpus AND each read row
    is 4× narrower; the float store is touched only for ~20 rows per
    query. Hash-gated since round 11 via the same pinned-centroid
    oracle as llm_ann_ivf (see its docstring: sf0.01-only by
    construction, digest-tested, regenerate with
    tools/gen_ivf_centroids.py); recall@5 vs exact kNN additionally
    floored at 0.80 in
    tests/test_llm_ops.py::test_ann_ivf_int8_recall_vs_exact."""
    vectors = _ivf_vectors(spark, sf_dir)
    scale = F.round(
        F.lit(127.0) / F.array_max(F.transform("emb", lambda x: F.abs(x))), 4
    )
    l2 = F.round(
        F.sqrt(F.aggregate("emb", F.lit(0.0), lambda acc, x: acc + x * x)), 6
    )
    qz = (
        vectors.withColumn("scale", scale)
        .withColumn("l2", l2)
        .withColumn(
            "qvec",
            F.transform(
                "emb",
                lambda x: F.greatest(
                    F.lit(-127),
                    F.least(F.lit(127), F.floor(x * F.col("scale") + F.lit(0.5))),
                ).cast("long"),
            ),
        )
        .transform(lineage_checkpoint)
    )
    assigned = qz.select(
        "vec_id",
        "qvec",
        "scale",
        "l2",
        F.explode(F.slice("lists", 1, IVF_NASSIGN)).alias("list_id"),
    )
    probe = qz.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("qvec").alias("q_qvec"),
        F.explode("lists").alias("list_id"),
    )
    int_dot = F.aggregate(
        F.zip_with("q_qvec", "qvec", lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    # int8 pass INSIDE the probed cells only: candidates are narrow
    # (ids + long score); dedup collapses dual-assignment repeats
    s1 = (
        F.broadcast(probe)
        .join(assigned, "list_id")
        .filter(F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(int_dot / (F.col("scale") * F.col("l2")), 6).alias("approx_sim"),
        )
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w1 = Window.partitionBy("query_id").orderBy(F.desc("approx_sim"), "neighbor_id")
    cand = (
        s1.withColumn("rn", F.row_number().over(w1))
        .filter(F.col("rn") <= RERANK_K)
        .drop("rn", "approx_sim")
    )
    corpus_emb = qz.select(F.col("vec_id").alias("neighbor_id"), F.col("emb").alias("cemb"))
    q_emb = qz.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("emb").alias("qemb")
    )
    reranked = (
        F.broadcast(cand)
        .join(corpus_emb, "neighbor_id")
        .join(F.broadcast(q_emb), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qemb"), F.col("cemb")), 6).alias("cos_sim"),
        )
    )
    w2 = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), "neighbor_id")
    return (
        reranked.withColumn("rn", F.row_number().over(w2))
        .filter(F.col("rn") <= TOP_K)
        .drop("rn")
    )


# ---------------------------------------------------------------------------
# Round-9 addition, queued for the round-10 official run (SURVEY §2.18):
# product quantization — the memory-compression half of production ANN.
# ---------------------------------------------------------------------------

PQ_M = 4  # subspaces
PQ_SUBDIM = 16  # 64-dim embeddings -> 4 x 16
PQ_K = 16  # centroids per subspace (codes fit a nibble)

PQ_SHORTLIST = 200  # ADC candidates per query that reach the exact rerank

_PQ_ORACLE = f"""
WITH raw AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb0
  FROM embeddings
),
e AS (
  SELECT vec_id,
         list_transform(emb0, x -> x / sqrt(list_inner_product(emb0, emb0))) AS emb
  FROM raw
),
seeds AS (
  SELECT vec_id,
         row_number() OVER (ORDER BY md5(concat('pqseed:', CAST(vec_id AS STRING))), vec_id) - 1 AS j
  FROM e
  QUALIFY row_number() OVER (ORDER BY md5(concat('pqseed:', CAST(vec_id AS STRING))), vec_id) <= {PQ_K}
),
ss(s) AS (VALUES (0), (1), (2), (3)),
cents AS (
  SELECT ss.s, seeds.j, (e.emb)[ss.s * {PQ_SUBDIM} + 1 : ss.s * {PQ_SUBDIM} + {PQ_SUBDIM}] AS cent
  FROM ss, seeds JOIN e ON e.vec_id = seeds.vec_id
),
subs AS (
  SELECT e.vec_id, ss.s,
         (e.emb)[ss.s * {PQ_SUBDIM} + 1 : ss.s * {PQ_SUBDIM} + {PQ_SUBDIM}] AS sub
  FROM e, ss
),
dists AS (
  SELECT subs.vec_id, subs.s, cents.j,
         round(list_inner_product(subs.sub, subs.sub)
               - 2 * list_inner_product(subs.sub, cents.cent)
               + list_inner_product(cents.cent, cents.cent), 6) AS d2
  FROM subs JOIN cents ON cents.s = subs.s
),
codes AS (
  SELECT vec_id, s, j AS code
  FROM dists
  QUALIFY row_number() OVER (PARTITION BY vec_id, s ORDER BY d2, j) = 1
),
qtab AS (
  SELECT d.vec_id AS query_id, d.s, d.j, d.d2
  FROM dists d WHERE d.vec_id < {N_QUERIES}
),
adc AS (
  SELECT q.query_id, c.vec_id AS neighbor_id, round(sum(q.d2), 6) AS adc_d2
  FROM codes c JOIN qtab q ON q.s = c.s AND q.j = c.code
  WHERE c.vec_id <> q.query_id
  GROUP BY q.query_id, c.vec_id
),
shortlist AS (
  SELECT query_id, neighbor_id
  FROM adc
  QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY adc_d2, neighbor_id)
          <= {PQ_SHORTLIST}
),
rerank AS (
  SELECT sl.query_id, sl.neighbor_id,
         round(list_inner_product(q.emb, c.emb), 6) AS cos_sim
  FROM shortlist sl
  JOIN e q ON q.vec_id = sl.query_id
  JOIN e c ON c.vec_id = sl.neighbor_id
)
SELECT query_id, neighbor_id, cos_sim
FROM rerank
QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) <= {TOP_K}
"""


@query(
    "llm_ann_pq_adc",
    "§2.18 ANN via product quantization + asymmetric-distance scoring",
    _PQ_ORACLE,
)
def llm_ann_pq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product quantization, the memory side of production ANN (FAISS
    IVFPQ's PQ half): each 64-dim vector compresses to {PQ_M} nibble
    codes (one argmin per 16-dim subspace against a {PQ_K}-centroid
    codebook — 32x smaller than float32), and queries score candidates
    with the ASYMMETRIC distance: the query precomputes its
    {PQ_M}x{PQ_K} subspace-distance table once, a candidate's distance
    is then {PQ_M} table lookups summed — no candidate decompression.

    Deterministic and fully oracle-able because the codebook is
    hash-seeded (the {PQ_K} corpus vectors with smallest salted md5 —
    the sampled-codebook regime; KMeans refinement is what llm_ann_ivf
    covers rows-only).  Vectors are L2-NORMALIZED first so L2 distance
    is monotone with cosine (d2 = 2 - 2cos) — without this the ADC
    order answers a different metric than the cosine ground truth and
    recall collapses (measured 0.04).  Distances use the expansion
    form |a|^2 - 2<a,b> + |b|^2 rounded to 6dp BEFORE every
    argmin/rank, so both engines pick identical codes and identical
    rankings; the ADC top-{PQ_SHORTLIST} shortlist is exactly reranked
    (inner product of the normalized vectors = cosine) — the standard
    PQ + rerank pipeline.

    Scale shape at 100 TB: the 64-row codebook broadcasts; encoding is
    a map-side argmin per (vector, subspace) folded by one
    partial-agg'd min_by (the corpus never shuffles raw vectors — only
    the 4-codes-per-vector table moves); ADC probing joins the
    broadcast query table against codes and reduces per (query,
    candidate); only the bounded shortlist rejoins the full vectors
    for rerank.  Recall vs exact kNN floor-tested in
    tests/test_round9_ops.py."""
    from spark_lineage_spark.functions.arrays import l2_normalize

    e = (
        _parallel_corpus(spark, load(spark, sf_dir, "embeddings"))
        .select("vec_id", to_double_array("embedding").alias("emb0"))
        .select("vec_id", l2_normalize(F.col("emb0")).alias("emb"))
    )
    h = F.md5(F.concat(F.lit("pqseed:"), F.col("vec_id").cast("string")))
    seeds = (
        e.select("vec_id", "emb", h.alias("h"))
        .orderBy("h", "vec_id")
        .limit(PQ_K)
    )
    jw = Window.orderBy("h", "vec_id")  # 16 rows: single-partition window is fine
    subspaces = spark.range(PQ_M).select(F.col("id").cast("int").alias("s"))
    # Self-norms are precomputed BEFORE the (vector-subspace) x
    # centroid join (optimization r15, guide §1.2 per-task work): the
    # expansion form previously evaluated dot(sub,sub) once per
    # CENTROID pair (x16) and dot(cent,cent) once per VECTOR pair
    # (x|corpus|) — 2 of the 3 interpreted HOF folds in the hot
    # 128k-row distance stage were redundant. Identical doubles: the
    # same fold over the same operands, combined in the same
    # a - b + c order, so every rounded d2 — and every downstream
    # argmin/rank — is bit-identical (pinned by test; measured
    # warm best 2.65 s -> 1.76 s).
    cents = (
        seeds.withColumn("j", F.row_number().over(jw) - 1)
        .crossJoin(F.broadcast(subspaces))
        .select(
            "s",
            "j",
            F.slice("emb", F.col("s") * PQ_SUBDIM + 1, PQ_SUBDIM).alias("cent"),
        )
        .withColumn("ncent", dot(F.col("cent"), F.col("cent")))
    )
    subs = (
        e.crossJoin(F.broadcast(subspaces))
        .select(
            "vec_id",
            "s",
            F.slice("emb", F.col("s") * PQ_SUBDIM + 1, PQ_SUBDIM).alias("sub"),
        )
        .withColumn("nsub", dot(F.col("sub"), F.col("sub")))
    )
    d2 = F.round(
        F.col("nsub") - 2 * dot(F.col("sub"), F.col("cent")) + F.col("ncent"),
        6,
    )
    dists = subs.join(F.broadcast(cents), "s").select(
        "vec_id", "s", "j", d2.alias("d2")
    )
    codes = dists.groupBy("vec_id", "s").agg(
        F.min_by("j", F.struct("d2", "j")).alias("code")
    )
    qtab = (
        dists.filter(F.col("vec_id") < N_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("s").alias("qs"),
            "j",
            F.col("d2").alias("qd2"),
        )
    )
    adc = (
        codes.join(
            F.broadcast(qtab),
            (F.col("s") == F.col("qs")) & (F.col("code") == F.col("j")),
        )
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", "vec_id")
        .agg(F.round(F.sum("qd2"), 6).alias("adc_d2"))
    )
    w = Window.partitionBy("query_id").orderBy("adc_d2", "vec_id")
    shortlist = (
        adc.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= PQ_SHORTLIST)
        .select("query_id", F.col("vec_id").alias("neighbor_id"))
    )
    qvec = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("emb").alias("qemb")
    )
    rerank = (
        F.broadcast(shortlist)
        .join(F.broadcast(qvec), "query_id")
        .join(e.withColumnRenamed("vec_id", "neighbor_id"), "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(dot(F.col("qemb"), F.col("emb")), 6).alias("cos_sim"),
        )
    )
    rw = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), "neighbor_id")
    return (
        rerank.withColumn("rn", F.row_number().over(rw))
        .filter(F.col("rn") <= TOP_K)
        .select("query_id", "neighbor_id", "cos_sim")
    )


_MMR_POOL = 25  # relevance-ranked candidate pool (top-25 by cosine)
_MMR_K = 5  # diverse picks
_MMR_LAMBDA = 0.7  # relevance weight; 1-lambda penalizes redundancy


def _mmr_oracle() -> str:
    """Unrolled greedy MMR in DuckDB: pick 1 is pure relevance; each
    later pick maximizes 0.7*rel - 0.3*max-sim-to-selected over the
    not-yet-picked pool, ties broken by vec_id.  Generated so the K
    rounds stay literally identical in structure."""
    sql = f"""
WITH e AS (SELECT vec_id,
                  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
           FROM embeddings),
q AS (SELECT emb AS qe FROM e WHERE vec_id = 0),
cand AS (
  SELECT e.vec_id, e.emb, list_cosine_similarity(e.emb, q.qe) AS rel
  FROM e CROSS JOIN q WHERE e.vec_id <> 0
  ORDER BY rel DESC, e.vec_id LIMIT {_MMR_POOL}
),
p1 AS (SELECT vec_id, emb, rel, 1 AS pick_rank, rel AS mmr
       FROM cand ORDER BY rel DESC, vec_id LIMIT 1),
s1 AS (SELECT * FROM p1)"""
    for r in range(2, _MMR_K + 1):
        sql += f""",
m{r} AS (
  SELECT c.vec_id, c.rel,
         {_MMR_LAMBDA} * c.rel
         - {round(1 - _MMR_LAMBDA, 10)} * max(list_cosine_similarity(c.emb, s.emb))
           AS mmr
  FROM cand c, s{r - 1} s
  WHERE c.vec_id NOT IN (SELECT vec_id FROM s{r - 1})
  GROUP BY c.vec_id, c.rel
),
p{r} AS (SELECT m.vec_id, c.emb, m.rel, {r} AS pick_rank, m.mmr
         FROM m{r} m JOIN cand c ON m.vec_id = c.vec_id
         ORDER BY m.mmr DESC, m.vec_id LIMIT 1),
s{r} AS (SELECT * FROM s{r - 1} UNION ALL SELECT * FROM p{r})"""
    sql += f"""
SELECT pick_rank, vec_id, round(rel, 6) AS rel, round(mmr, 6) AS mmr
FROM s{_MMR_K}
"""
    return sql


@query(
    "llm_mmr_diverse_topk",
    "§2.20 MMR diverse top-k selection (greedy, bounded candidate pool)",
    _mmr_oracle(),
)
def llm_mmr_diverse_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal Marginal Relevance — the diversity-aware retrieval cut
    a RAG pipeline runs after ANN: from the top-25 cosine candidates
    for query vec 0, greedily pick 5 maximizing
    0.7*relevance - 0.3*max_sim_to_already_picked.

    The greedy recursion is inherently sequential in K, but NOT in n:
    each of the 5 unrolled rounds is one anti-join + broadcast
    similarity max over the CANDIDATE POOL (25 rows, checkpointed
    once), never the corpus — the linear part (relevance scan + top-25
    cut) is the same broadcast-query/TakeOrdered shape as
    llm_knn_cosine_exact, so at 100 TB this costs one ANN pass plus
    K tiny driver-free rounds.  Both engines run the identical greedy
    arithmetic (one fused double expression per round, cosine on
    doubles in array order), so picks and scores agree bit-for-bit;
    the oracle unrolls the same rounds as MATERIALIZED-free CTEs.
    Property test: python greedy reference in
    tests/test_round10_ops.py."""
    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", to_double_array("embedding").alias("emb")
    )
    qv = e.filter(F.col("vec_id") == 0).select(F.col("emb").alias("qe"))
    cand = lineage_checkpoint(
        e.filter(F.col("vec_id") != 0)
        .join(F.broadcast(qv))
        .select("vec_id", "emb", cosine(F.col("emb"), F.col("qe")).alias("rel"))
        .orderBy(F.col("rel").desc(), "vec_id")
        .limit(_MMR_POOL)
    )
    selected = (
        cand.orderBy(F.col("rel").desc(), "vec_id")
        .limit(1)
        .select("vec_id", "emb", "rel", F.lit(1).alias("pick_rank"), F.col("rel").alias("mmr"))
    )
    for r in range(2, _MMR_K + 1):
        remaining = cand.join(selected.select("vec_id"), "vec_id", "left_anti")
        scored = (
            remaining.crossJoin(F.broadcast(selected.select(F.col("emb").alias("semb"))))
            .groupBy("vec_id")
            .agg(
                F.max("rel").alias("rel"),  # constant per vec_id
                (
                    F.lit(_MMR_LAMBDA) * F.max("rel")
                    - F.lit(round(1 - _MMR_LAMBDA, 10))
                    * F.max(cosine(F.col("emb"), F.col("semb")))
                ).alias("mmr"),
            )
        )
        pick = (
            scored.join(cand.select("vec_id", "emb"), "vec_id")
            .orderBy(F.col("mmr").desc(), "vec_id")
            .limit(1)
            .select("vec_id", "emb", "rel", F.lit(r).alias("pick_rank"), "mmr")
        )
        # each pick references `selected` twice (anti-join + crossJoin),
        # so without a cut the plan doubles per round; the lazy
        # checkpoint keeps it linear in K
        selected = lineage_checkpoint(selected.unionAll(pick), eager=False)
    return selected.select(
        "pick_rank",
        "vec_id",
        F.round("rel", 6).alias("rel"),
        F.round("mmr", 6).alias("mmr"),
    )


_NDCG_K = 5
_TRUNC_DIM = 16  # Matryoshka truncation: first 16 of 64 dims

_NDCG_ORACLE = f"""
WITH e AS (SELECT vec_id,
                  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
           FROM embeddings),
q AS (SELECT vec_id AS qid, emb AS qe FROM e WHERE vec_id < {N_QUERIES}),
scored AS (
  SELECT q.qid, e.vec_id AS cid,
         list_cosine_similarity(e.emb, q.qe) AS exact_cos,
         list_cosine_similarity(e.emb[1:{_TRUNC_DIM}], q.qe[1:{_TRUNC_DIM}])
           AS trunc_cos
  FROM e CROSS JOIN q WHERE e.vec_id >= {N_QUERIES}
),
exact_rk AS (
  SELECT qid, cid, exact_cos,
         row_number() OVER (PARTITION BY qid ORDER BY exact_cos DESC, cid) AS rk
  FROM scored
),
trunc_rk AS (
  SELECT qid, cid, exact_cos,
         row_number() OVER (PARTITION BY qid ORDER BY trunc_cos DESC, cid) AS rk
  FROM scored
),
dcg AS (
  SELECT qid, rk,
         sum(greatest(exact_cos, 0) / log2(rk + 1))
           OVER (PARTITION BY qid ORDER BY rk) AS c
  FROM trunc_rk WHERE rk <= {_NDCG_K}
),
idcg AS (
  SELECT qid, rk,
         sum(greatest(exact_cos, 0) / log2(rk + 1))
           OVER (PARTITION BY qid ORDER BY rk) AS c
  FROM exact_rk WHERE rk <= {_NDCG_K}
),
hits AS (
  SELECT t.qid, CAST(count(*) AS BIGINT) AS n_hit
  FROM trunc_rk t JOIN exact_rk x ON t.qid = x.qid AND t.cid = x.cid
  WHERE t.rk <= {_NDCG_K} AND x.rk <= {_NDCG_K}
  GROUP BY t.qid
)
SELECT d.qid AS query_id,
       round(coalesce(h.n_hit, 0) / {_NDCG_K}.0, 6) AS recall_at_k,
       round(d.c / i.c, 6) AS ndcg_at_k
FROM dcg d
JOIN idcg i ON d.qid = i.qid AND i.rk = {_NDCG_K}
LEFT JOIN hits h ON d.qid = h.qid
WHERE d.rk = {_NDCG_K}
"""


@query(
    "llm_retrieval_ndcg",
    "§2.20 retrieval eval: NDCG@5 + recall@5 of Matryoshka-truncated ANN vs exact",
    _NDCG_ORACLE,
)
def llm_retrieval_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval-quality eval — the metric pass a RAG/embedding
    pipeline runs after swapping in a cheaper index: rank by the
    16-dim Matryoshka truncation, grade against the full-64-dim exact
    ranking.  Per query: recall@5 (exact top-5 recovered) and NDCG@5
    with graded gains = clamp(exact cosine, 0) and log2 position
    discount.

    Determinism: both DCG and IDCG are CUMULATIVE window sums taken at
    rank K — 5 doubles added left-to-right in rank order in both
    engines, never a hash-agg of doubles whose partial order could
    differ.  Scale: the scoring pass is the same broadcast-queries
    linear corpus scan as llm_knn_cosine_exact (one shuffle of
    (query x candidate) scores on qid for the per-query windows, K
    bounded); everything after the rank cut is O(queries x K)."""
    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", to_double_array("embedding").alias("emb")
    )
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("emb").alias("qe")
    )
    scored = (
        e.filter(F.col("vec_id") >= N_QUERIES)
        .crossJoin(F.broadcast(q))
        .select(
            "qid",
            F.col("vec_id").alias("cid"),
            cosine(F.col("emb"), F.col("qe")).alias("exact_cos"),
            cosine(
                F.slice(F.col("emb"), 1, _TRUNC_DIM),
                F.slice(F.col("qe"), 1, _TRUNC_DIM),
            ).alias("trunc_cos"),
        )
    )
    w_exact = Window.partitionBy("qid").orderBy(F.col("exact_cos").desc(), "cid")
    w_trunc = Window.partitionBy("qid").orderBy(F.col("trunc_cos").desc(), "cid")
    exact_rk = scored.select(
        "qid", "cid", "exact_cos", F.row_number().over(w_exact).alias("rk")
    )
    trunc_rk = scored.select(
        "qid", "cid", "exact_cos", F.row_number().over(w_trunc).alias("rk")
    )
    w_cum = Window.partitionBy("qid").orderBy("rk")

    def dcg_at_k(rk: DataFrame) -> DataFrame:
        return (
            rk.filter(F.col("rk") <= _NDCG_K)
            .select(
                "qid",
                "rk",
                F.sum(
                    F.greatest(F.col("exact_cos"), F.lit(0.0)) / F.log2(F.col("rk") + 1)
                )
                .over(w_cum)
                .alias("c"),
            )
            .filter(F.col("rk") == _NDCG_K)
        )
    dcg = dcg_at_k(trunc_rk)
    idcg = dcg_at_k(exact_rk).select(F.col("qid").alias("iqid"), F.col("c").alias("ic"))
    hits = (
        trunc_rk.filter(F.col("rk") <= _NDCG_K)
        .join(
            exact_rk.filter(F.col("rk") <= _NDCG_K).select("qid", "cid"),
            ["qid", "cid"],
        )
        .groupBy("qid")
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    return (
        dcg.join(idcg, dcg.qid == F.col("iqid"))
        .join(hits, "qid", "left")
        .select(
            F.col("qid").alias("query_id"),
            F.round(F.coalesce(F.col("n_hit"), F.lit(0)) / float(_NDCG_K), 6).alias(
                "recall_at_k"
            ),
            F.round(F.col("c") / F.col("ic"), 6).alias("ndcg_at_k"),
        )
    )


_NORM_ORACLE = """
WITH nz AS (
  SELECT vec_id,
         CAST(round(sqrt(list_sum(list_transform(embedding,
                x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) * 1000000)
              AS BIGINT) AS nu
  FROM embeddings
),
s AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(nu AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS s1,
         CAST(sum(CAST(nu * nu AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS s2,
         CAST(min(nu) AS BIGINT) AS mn,
         CAST(max(nu) AS BIGINT) AS mx
  FROM nz
),
z AS (
  SELECT nz.vec_id, nz.nu, s.n, s.s1, s.s2, s.mn, s.mx,
         (CAST(s.s2 AS DOUBLE)
          - (CAST(s.s1 AS DOUBLE) / s.n) * CAST(s.s1 AS DOUBLE))
         / (s.n - 1) AS sd2,
         CAST(nz.nu AS DOUBLE) - CAST(s.s1 AS DOUBLE) / s.n AS dev
  FROM nz CROSS JOIN s
)
SELECT max(n) AS n_vectors,
       round(CAST(max(s1) AS DOUBLE) / max(n) / 1000000, 6) AS mean_norm,
       round(CAST(max(mn) AS DOUBLE) / 1000000, 6) AS min_norm,
       round(CAST(max(mx) AS DOUBLE) / 1000000, 6) AS max_norm,
       CAST(count(*) FILTER (WHERE sd2 > 0 AND abs(dev) > 3 * sqrt(sd2))
            AS BIGINT) AS n_outliers_3sd,
       CAST(count(*) FILTER (WHERE nu = 0) AS BIGINT) AS n_zero_vectors
FROM z
"""


@query(
    "llm_embedding_norm_outliers",
    "§2.20 embedding QC: L2-norm distribution + z-score outlier flags",
    _NORM_ORACLE,
)
def llm_embedding_norm_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-table QC — the ingest screen a vector pipeline runs
    before indexing: per-vector L2 norms, their distribution, and the
    degenerate cases that poison ANN (zero vectors; norms more than
    3 SDs from the mean, which usually mean a failed encode or a
    double-scaled batch).  Norms are computed with the SAME in-order
    double fold both engines use for cosine (dot(v,v) in array
    order), then micro-quantized to exact bigints so the moment sums
    are order-free integers; the z threshold compares identical
    doubles.  Shape at any SF: one corpus scan with a map-side
    partial agg to one moment row, broadcast back over the norms for
    the flag count — no shuffle of the vectors themselves."""
    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", to_double_array("embedding").alias("emb")
    )
    nz = e.select(
        "vec_id",
        F.round(F.sqrt(dot(F.col("emb"), F.col("emb"))) * 1_000_000)
        .cast("bigint")
        .alias("nu"),
    )
    s = nz.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("nu").cast("decimal(38,0)")).alias("s1"),
        F.sum((F.col("nu") * F.col("nu")).cast("decimal(38,0)")).alias("s2"),
        F.min("nu").alias("mn"),
        F.max("nu").alias("mx"),
    )
    # sample variance of the EXACT integer norms: zero variance (a
    # fully normalized table — this fixture) must mean "no outliers",
    # not a divide-by-zero, so the deviation test multiplies instead
    # of dividing (|dev| > 3*sqrt(sd2), guarded on sd2 > 0)
    z = nz.join(F.broadcast(s)).select(
        "nu", "n", "s1", "s2", "mn", "mx",
        (
            (
                F.col("s2").cast("double")
                - (F.col("s1").cast("double") / F.col("n"))
                * F.col("s1").cast("double")
            )
            / (F.col("n") - 1)
        ).alias("sd2"),
        (F.col("nu").cast("double") - F.col("s1").cast("double") / F.col("n")).alias(
            "dev"
        ),
    )
    return z.agg(
        F.max("n").alias("n_vectors"),
        F.round(F.max("s1").cast("double") / F.max("n") / 1_000_000, 6).alias(
            "mean_norm"
        ),
        F.round(F.max("mn").cast("double") / 1_000_000, 6).alias("min_norm"),
        F.round(F.max("mx").cast("double") / 1_000_000, 6).alias("max_norm"),
        F.count(
            F.when(
                (F.col("sd2") > 0)
                & (F.abs(F.col("dev")) > 3 * F.sqrt(F.col("sd2"))),
                1,
            )
        ).alias("n_outliers_3sd"),
        F.count(F.when(F.col("nu") == 0, 1)).alias("n_zero_vectors"),
    )


# ---------------------------------------------------------------------------
# Round-11 addition (SURVEY §2.21): top principal component of the
# embedding covariance via UNROLLED power iteration — the anisotropy /
# "all-but-the-top" whitening primitive.  One shared algorithm replayed
# in DuckDB: every intermediate (mean, covariance entry, iterate) is
# rounded before the next stage, so both engines feed bit-identical
# doubles into each step and the hash gate holds despite float sums.
# ---------------------------------------------------------------------------

PC_DIM = 64  # fixture embedding width (the PQ 4x16 layout pins this too)
PC_ITERS = 3  # unrolled power-iteration rounds


def _power_oracle_prefix() -> str:
    """Shared DuckDB CTE prefix replaying _power_iteration_parts:
    e/ex/mu/cx/n/cov + the PC_ITERS unrolled rounds (v0..v{N}) and the
    sgn canonicalizer — reused by the top-PC and ABTT oracles."""
    it = """,
    w{k} AS (
      SELECT i, round(sum(c * vj), 8) AS w
      FROM cov JOIN v{p} ON cov.j = v{p}.j GROUP BY i
    ),
    n{k} AS (SELECT sqrt(sum(w * w)) AS nrm FROM w{k}),
    v{k} AS (SELECT i AS j, round(w / nrm, 8) AS vj FROM w{k} CROSS JOIN n{k})"""
    iters = "".join(it.format(k=k, p=k - 1) for k in range(1, PC_ITERS + 1))
    return f"""
    WITH e AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
      FROM embeddings
    ),
    ex AS (
      SELECT vec_id, generate_subscripts(emb, 1) - 1 AS i, unnest(emb) AS x
      FROM e
    ),
    mu AS (SELECT i, round(avg(x), 6) AS m FROM ex GROUP BY i),
    cx AS (SELECT vec_id, ex.i, ex.x - mu.m AS c FROM ex JOIN mu USING (i)),
    n AS (SELECT count(*) AS n FROM e),
    cov AS (
      SELECT a.i AS i, b.i AS j,
             round(sum(a.c * b.c) / any_value(n.n), 8) AS c
      FROM cx a JOIN cx b USING (vec_id) CROSS JOIN n
      GROUP BY a.i, b.i
    ),
    v0 AS (SELECT range AS j, CASE WHEN range = 0 THEN CAST(1 AS DOUBLE)
                                   ELSE CAST(0 AS DOUBLE) END AS vj
           FROM range({PC_DIM})){iters},
    sgn AS (
      SELECT CASE WHEN vj >= 0 THEN 1 ELSE -1 END AS s
      FROM v{PC_ITERS} ORDER BY abs(vj) DESC, j LIMIT 1
    )"""


def _top_pc_oracle() -> str:
    return _power_oracle_prefix() + f""",
    lam AS (
      SELECT round(sqrt(sum(w * w)), 6) AS eigval
      FROM (SELECT round(sum(c * vj), 8) AS w
            FROM cov JOIN v{PC_ITERS} ON cov.j = v{PC_ITERS}.j GROUP BY i)
    ),
    tr AS (SELECT sum(c) AS trace FROM cov WHERE i = j)
    SELECT v.j AS dim, round(v.vj * sgn.s, 6) AS loading,
           lam.eigval AS eigval,
           round(lam.eigval / tr.trace, 6) AS explained_share
    FROM v{PC_ITERS} v CROSS JOIN sgn CROSS JOIN lam CROSS JOIN tr
    ORDER BY dim
    """


@query(
    "llm_embedding_top_pc",
    "§2.21 top principal component via unrolled power iteration (anisotropy / whitening primitive)",
    _top_pc_oracle(),
)
def llm_embedding_top_pc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal component of the embedding covariance — the
    anisotropy probe behind 'all-but-the-top' whitening and dominant-
    direction removal (common-mean + top-PC subtraction measurably
    improves similarity search on real embedding corpora).  ITERATIVE
    linear algebra expressed as one lazy plan: 3 unrolled power-
    iteration rounds over the dim x dim covariance — collapsed to a
    row-major array on ONE row, each round a matvec + normalization as
    array expressions (see _power_core) — with every stage ROUNDED
    (mean 6, cov 8, iterate 8, outputs 6) so DuckDB replays the same
    rounded arithmetic and the full pipeline sits under the value-hash
    gate despite float sums (the llm_embedding_centroids
    round-before-use precedent).  Sign is canonicalized at the
    largest-|loading| dimension (smallest dim on ties) since
    eigenvectors are sign-ambiguous.

    Scale shape: the ONLY corpus-wide work is the covariance build —
    per-row outer products flattened JVM-side (nested transform, no
    UDF) and hash-aggregated onto dim^2 partial sums, so the shuffle
    carries 4096 doubles per partition regardless of corpus size and
    the corpus itself never joins or shuffles; the iteration then runs
    as single-row array arithmetic whatever the SF (dim-bounded — it
    was ~12 metadata-scale AQE stage jobs as relational rounds).  With
    near-random fixture embeddings the spectrum is flat (explained
    share ~1/dim, eigval near the Marchenko-Pastur bulk edge), which
    the property test pins against numpy's replay of the identical
    3-round algorithm."""
    e = _parallel_corpus(
        spark, load(spark, sf_dir, "embeddings")
    ).select("vec_id", to_double_array("embedding").alias("emb"))
    mu, core = _power_core(spark, e)
    # per-dim output rows come from the checkpointed 64-row means table
    # (no explode — the plan stays Generate-free past the leaves), with
    # the one-row core broadcast over them
    return (
        mu.select(F.col("i").alias("dim"))
        .crossJoin(F.broadcast(core))
        .select(
            "dim",
            F.element_at(F.col("va6"), F.col("dim").cast("int") + 1).alias(
                "loading"
            ),
            "eigval",
            F.round(F.col("eigval") / F.col("trace"), 6).alias("explained_share"),
        )
        .orderBy("dim")
    )


def _cov_table(e, mu):
    """Pre-checkpoint covariance subtree — split out so the plan test
    can assert its 100 TB shape directly (the checkpointed table the
    iterations read is a 4096-row LogicalRDD leaf).  The 64 per-dim
    means collapse to ONE broadcast array row, so centering is
    map-side zip_with over the original vectors — the llm_ann_lsh
    broadcast-literal precedent.  (The previous shape exploded the
    corpus and re-assembled centered vectors with a groupBy(vec_id)
    collect_list — a full-corpus shuffle keyed by vec_id that VERDICT
    r11 flagged; per-row terms are unchanged, so both DuckDB replays
    hash identically.)"""
    mu_arr = mu.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("i", "m"))), lambda s: s["m"]
        ).alias("ma")
    )
    ce = e.crossJoin(F.broadcast(mu_arr)).select(
        "vec_id", F.zip_with("emb", "ma", lambda x, m: x - m).alias("cemb")
    )
    outer = F.flatten(
        F.transform("cemb", lambda x: F.transform("cemb", lambda y: x * y))
    )
    kv = ce.select(F.posexplode(outer).alias("k", "v"))
    n1 = e.agg(F.count(F.lit(1)).cast("double").alias("n"))
    return (
        kv.groupBy("k")
        .agg(F.sum("v").alias("s"))
        .crossJoin(F.broadcast(n1))
        .select(
            (F.col("k") / PC_DIM).cast("long").alias("i"),
            (F.col("k") % PC_DIM).alias("j"),
            F.round(F.col("s") / F.col("n"), 8).alias("c"),
        )
    )


def _matvec_arr(ca, v):
    """w_i = round(sum_j cov[i,j] * v[j], 8) over a row-major dim^2
    covariance ARRAY and a dim-element iterate array — the per-round
    matvec of the unrolled power iteration, as a single projection
    expression instead of a join+groupBy pair.  The inner sum is an
    in-j-order fold; cov entries are pre-rounded to 8 and ~1e-2 in
    magnitude, so ordering effects (~1e-14) vanish at the 1e-8 round —
    the same argument that already lets Spark's hash-agg sum hash-match
    DuckDB's (verified against the oracle at all three SFs)."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(PC_DIM - 1)),
        lambda i: F.round(
            F.aggregate(
                F.zip_with(
                    F.slice(ca, i * PC_DIM + 1, PC_DIM), v, lambda x, y: x * y
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
            8,
        ),
    )


def _power_core(spark, e):
    """Shared top-PC pipeline (SURVEY §2.21): per-dim rounded mean,
    dim x dim rounded covariance built from per-row JVM-side outer
    products over MAP-SIDE-centered vectors (the 64 means broadcast as
    one array row, zip_with subtraction — the corpus itself never
    shuffles; its only exchanges are 64-key / dim^2-key partial-agg
    reduces), PC_ITERS unrolled power-iteration rounds, and the sign
    canonicalizer — the common core of llm_embedding_top_pc (which
    reports the component) and llm_embedding_abtt (which projects it
    out per vector).  mu (64 rows) and cov (dim^2 rows) are
    localCheckpoint'd: the corpus is read exactly twice (means,
    covariance) and everything downstream runs on checkpointed leaves.

    Optimization r14 (guide §5/§7 driver overhead): the iteration used
    to run RELATIONALLY — each round a broadcast join + groupBy agg on
    the 4096-row cov leaf, plus separate eigval / trace / sign
    aggregations (~12 metadata-scale AQE stage jobs, ~1.5-2 s of pure
    scheduling at any SF since these tables are dim-bounded).  Now cov
    collapses once into a row-major 4096-element ARRAY on one row and
    all PC_ITERS matvec/normalize rounds, the eigval matvec, the trace
    and the sign canonicalization are array expressions in a handful of
    projections over that single row — 2 tiny aggregations total, no
    per-round shuffles.  Per-stage arithmetic (values, rounding points,
    evaluation order per stage) is IDENTICAL to the relational form the
    DuckDB oracles replay; only the sum fold order inside each rounded
    stage differs, which the 1e-8/1e-6 rounds absorb (oracle-verified
    at sf0.001/0.01/0.1).

    Returns (mu, core): mu the checkpointed 64-row means table (i, m);
    core a ONE-ROW DataFrame with ma (means array, i-order), va6 / va8
    (sign-canonicalized iterate, rounded 6 / 8), eigval, trace."""
    ex = e.select("vec_id", F.posexplode("emb").alias("i", "x"))
    # 64-row means table, materialized once (localCheckpoint): it feeds
    # the broadcast centering array AND the final per-dim output axis —
    # without the checkpoint every consumer re-runs the corpus explode
    mu = ex.groupBy("i").agg(F.round(F.avg("x"), 6).alias("m")).transform(
        lineage_checkpoint
    )
    cov = _cov_table(e, mu).transform(lineage_checkpoint)
    # collapse the checkpointed leaves to one row of arrays: ca is the
    # row-major cov (sorted by (i, j) — array_sort on structs), ma the
    # i-ordered means; the iteration seed keeps its spark.range(dim)
    # ancestry (lineage: loading/eigval trace to range.id)
    ca_row = cov.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("i", "j", "c"))), lambda s: s["c"]
        ).alias("ca")
    )
    ma_row = mu.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("i", "m"))), lambda s: s["m"]
        ).alias("ma")
    )
    v0_row = spark.range(PC_DIM).agg(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("id").alias("j"),
                        F.when(F.col("id") == 0, F.lit(1.0))
                        .otherwise(F.lit(0.0))
                        .alias("vj"),
                    )
                )
            ),
            lambda s: s["vj"],
        ).alias("v")
    )
    core = ca_row.crossJoin(F.broadcast(ma_row)).crossJoin(F.broadcast(v0_row))
    for _ in range(PC_ITERS):
        # matvec then normalize, each rounded exactly as before
        # (w to 8 inside _matvec_arr, v to 8 after the norm divide)
        core = core.select(
            "ca", "ma", _matvec_arr(F.col("ca"), F.col("v")).alias("w")
        ).select(
            "ca",
            "ma",
            "w",
            F.sqrt(
                F.aggregate(F.col("w"), F.lit(0.0), lambda a, y: a + y * y)
            ).alias("nrm"),
        ).select(
            "ca",
            "ma",
            F.transform(
                "w", lambda x: F.round(x / F.col("nrm"), 8)
            ).alias("v"),
        )
    # sign canonicalization at the largest-|loading| dimension
    # (array_position returns the FIRST occurrence = smallest dim on
    # ties — same tiebreak as the old ORDER BY abs(vj) DESC, j LIMIT 1)
    absv = F.transform("v", lambda x: F.abs(x))
    core = core.select(
        "ca",
        "ma",
        "v",
        F.when(
            F.element_at(
                F.col("v"), F.array_position(absv, F.array_max(absv)).cast("int")
            )
            >= 0,
            F.lit(1.0),
        )
        .otherwise(F.lit(-1.0))
        .alias("s"),
    )
    # final matvec for the eigenvalue + the diagonal trace, still in
    # the one-row array domain (was: two more relational aggregations)
    core = core.select(
        "ma",
        F.transform("v", lambda x: F.round(x * F.col("s"), 6)).alias("va6"),
        F.transform("v", lambda x: F.round(x * F.col("s"), 8)).alias("va8"),
        _matvec_arr(F.col("ca"), F.col("v")).alias("w4"),
        F.aggregate(
            F.sequence(F.lit(0), F.lit(PC_DIM - 1)),
            F.lit(0.0),
            lambda a, i: a + F.element_at(F.col("ca"), (i * (PC_DIM + 1) + 1).cast("int")),
        ).alias("trace"),
    ).select(
        "ma",
        "va6",
        "va8",
        "trace",
        F.round(
            F.sqrt(F.aggregate("w4", F.lit(0.0), lambda a, x: a + x * x)), 6
        ).alias("eigval"),
    )
    return mu, core


def _abtt_oracle() -> str:
    return _power_oracle_prefix() + f""",
    mu_arr AS (SELECT list(m ORDER BY i) AS ma FROM mu),
    v_arr AS (
      SELECT list(round(vj * sgn.s, 8) ORDER BY j) AS va
      FROM v{PC_ITERS} CROSS JOIN sgn
    ),
    per AS (
      SELECT vec_id,
             round(list_sum(list_transform(range(1, {PC_DIM + 1}),
                   j -> (emb[j] - ma[j]) * va[j])), 8) AS t8,
             round(list_sum(list_transform(range(1, {PC_DIM + 1}),
                   j -> (emb[j] - ma[j]) * (emb[j] - ma[j]))), 8) AS c28
      FROM e CROSS JOIN mu_arr CROSS JOIN v_arr
    )
    SELECT vec_id, round(t8, 6) AS coeff,
           round(sqrt(c28), 6) AS centered_norm,
           round(sqrt(greatest(0, c28 - t8 * t8)), 6) AS resid_norm,
           round(t8 * t8 / c28, 6) AS pc_share
    FROM per ORDER BY abs(t8) DESC, vec_id LIMIT 10
    """


@query(
    "llm_embedding_abtt",
    "§2.21 all-but-the-top whitening: per-vector top-PC projection removal (top-10 outliers)",
    _abtt_oracle(),
)
def llm_embedding_abtt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All-but-the-top (ABTT) whitening applied per vector — the
    postprocessing step that measurably improves similarity search on
    anisotropic embedding corpora (Mu & Viswanath's recipe: subtract
    the common mean, project out the dominant component): for each
    vector, the coefficient t = <emb - mu, v1>, the centered norm, the
    residual norm after removing t*v1, and the share of centered
    energy the top PC explains; reported for the 10 vectors MOST
    aligned with the dominant direction (|t| desc, vec_id tiebreak) —
    the rows an embedding-QC pass would flag as "common-direction
    outliers".  Reuses _power_core verbatim (same rounded
    mean / covariance / 3 power rounds / sign canonicalization as
    llm_embedding_top_pc), so the DuckDB oracle replays the identical
    unrolled algorithm and every per-vector number closes bit-identical
    under the hash gate: t and the centered energy are rounded to 8 in
    both engines before the derived columns, and the in-order per-row
    fold is the same left-to-right sum both engines use for cosine.

    Shape at any SF: the covariance build is the only corpus-wide work
    (per-row outer products onto dim^2 partial sums — the corpus never
    shuffles); mu and the signed component collapse to two broadcast
    64-element arrays, so the per-vector projection pass is map-side
    array arithmetic and the global top-10 is a TakeOrdered (per-
    partition top-10, then a 10-row merge — no full sort)."""
    e = _parallel_corpus(
        spark, load(spark, sf_dir, "embeddings")
    ).select("vec_id", to_double_array("embedding").alias("emb"))
    _, core = _power_core(spark, e)
    # one broadcast one-row side carrying BOTH arrays (means + signed
    # component, rounded 8) — was two separately-aggregated broadcasts
    cemb = F.zip_with(F.col("emb"), F.col("ma"), lambda x, m: x - m)
    per = (
        e.crossJoin(F.broadcast(core.select("ma", F.col("va8").alias("va"))))
        .select(
            "vec_id",
            F.round(dot(cemb, F.col("va")), 8).alias("t8"),
            F.round(dot(cemb, cemb), 8).alias("c28"),
        )
    )
    return (
        per.orderBy(F.abs(F.col("t8")).desc(), "vec_id")
        .limit(10)
        .select(
            "vec_id",
            F.round("t8", 6).alias("coeff"),
            F.round(F.sqrt("c28"), 6).alias("centered_norm"),
            F.round(
                F.sqrt(
                    F.greatest(
                        F.lit(0.0), F.col("c28") - F.col("t8") * F.col("t8")
                    )
                ),
                6,
            ).alias("resid_norm"),
            F.round(F.col("t8") * F.col("t8") / F.col("c28"), 6).alias("pc_share"),
        )
    )


@query(
    "llm_hard_negative_mining",
    "§2.21 hard-negative mining: top-k cross-label neighbors + positive margin per query",
    f"""
    WITH e AS (SELECT vec_id, label,
                      list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
               FROM embeddings),
    q AS (SELECT * FROM e WHERE vec_id < {N_QUERIES}),
    scored AS (
      SELECT q.vec_id AS query_id, q.label AS query_label,
             c.vec_id AS neg_id, c.label AS neg_label,
             round(list_cosine_similarity(q.emb, c.emb), 6) AS cos_sim
      FROM q JOIN e c ON q.vec_id <> c.vec_id
    ),
    pos AS (
      SELECT query_id, max(cos_sim) AS best_pos_sim
      FROM scored WHERE neg_label = query_label GROUP BY query_id
    ),
    neg AS (
      SELECT query_id, query_label, neg_id, neg_label, cos_sim,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cos_sim DESC, neg_id) AS rnk
      FROM scored WHERE neg_label <> query_label
    )
    SELECT n.query_id, n.query_label, n.rnk, n.neg_id, n.neg_label,
           n.cos_sim, p.best_pos_sim,
           round(p.best_pos_sim - n.cos_sim, 6) AS margin
    FROM neg n JOIN pos p ON n.query_id = p.query_id
    WHERE n.rnk <= {TOP_K}
    ORDER BY n.query_id, n.rnk
    """,
)
def llm_hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive / retrieval training — the
    embedding-space companion to llm_contrastive_negatives' text-bucket
    sampler: for each probe vector, the TOP_K most-similar corpus
    vectors with a DIFFERENT label (the negatives that actually move a
    contrastive loss), plus the best same-label similarity and the
    margin best_pos - neg; a negative margin marks a CONFUSABLE query
    whose hardest negative outranks its nearest positive (the rows a
    curriculum would upweight and a labeler would re-check).
    Similarity is the rounded-to-6 cosine with neg_id tie-break (the
    llm_knn_cosine_exact discipline), so ranking, the positive max,
    and the margin are engine-independent.

    Shape at any SF: the {N_QUERIES}-row probe side broadcasts and the
    corpus is scanned map-side (BroadcastNestedLoop) — once for the
    ranked negatives, once for the positive max; neither pass shuffles
    the corpus, and both aggregates are per-query partial (top-k heap
    / max).  At 1e9+ vectors you'd swap the scan for the IVF probe
    path (llm_ann_ivf) and keep this query's ranking contract."""
    e = _parallel_corpus(
        spark, load(spark, sf_dir, "embeddings")
    ).select("vec_id", "label", to_double_array("embedding").alias("emb"))
    q = F.broadcast(
        e.filter(F.col("vec_id") < N_QUERIES).select(
            F.col("vec_id").alias("query_id"),
            F.col("label").alias("query_label"),
            F.col("emb").alias("qemb"),
        )
    )
    scored = q.join(e, F.col("query_id") != F.col("vec_id")).select(
        "query_id",
        "query_label",
        F.col("vec_id").alias("neg_id"),
        F.col("label").alias("neg_label"),
        F.round(cosine(F.col("qemb"), F.col("emb")), 6).alias("cos_sim"),
    )
    pos = (
        scored.filter(F.col("neg_label") == F.col("query_label"))
        .groupBy("query_id")
        .agg(F.max("cos_sim").alias("best_pos_sim"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), "neg_id")
    neg = (
        scored.filter(F.col("neg_label") != F.col("query_label"))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
    )
    return (
        neg.join(F.broadcast(pos), "query_id")
        .select(
            "query_id",
            "query_label",
            "rnk",
            "neg_id",
            "neg_label",
            "cos_sim",
            "best_pos_sim",
            F.round(F.col("best_pos_sim") - F.col("cos_sim"), 6).alias("margin"),
        )
        .orderBy("query_id", "rnk")
    )


@query(
    "llm_cluster_silhouette",
    "§2.21 simplified silhouette per label over the in-plan class centroids",
    f"""
    WITH e AS (SELECT vec_id, label,
                      list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
               FROM embeddings),
    comp AS (
      SELECT label, i, round(avg(emb[i]), 6) AS c
      FROM e CROSS JOIN range(1, {PC_DIM + 1}) AS t(i)
      GROUP BY label, i
    ),
    cent AS (
      SELECT label AS c_label, list(c ORDER BY i) AS centroid
      FROM comp GROUP BY label
    ),
    scored AS (
      SELECT e.vec_id, e.label, c.c_label,
             round(list_sum(list_transform(range(1, {PC_DIM + 1}),
                   j -> (emb[j] - centroid[j]) * (emb[j] - centroid[j]))), 6)
               AS dist2
      FROM e CROSS JOIN cent c
    ),
    ab AS (
      SELECT vec_id, label,
             round(sqrt(max(CASE WHEN c_label = label THEN dist2 END)), 6) AS a,
             round(sqrt(min(CASE WHEN c_label <> label THEN dist2 END)), 6) AS b
      FROM scored GROUP BY vec_id, label
    ),
    s AS (
      SELECT label,
             CAST(round((b - a) / greatest(a, b) * 1000000) AS BIGINT) AS sq
      FROM ab
    )
    SELECT label, CAST(count(*) AS BIGINT) AS n_vectors,
           round(CAST(sum(sq) AS DOUBLE) / count(*) / 1000000, 6)
             AS mean_silhouette,
           round(CAST(sum(CASE WHEN sq < 0 THEN 1 ELSE 0 END) AS DOUBLE)
                 / count(*), 6) AS frac_negative
    FROM s GROUP BY label ORDER BY label
    """,
)
def llm_cluster_silhouette(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simplified (centroid-based) silhouette per label — the cluster-
    quality score that closes the loop llm_cluster_assign opens: for
    each vector, a = distance to its OWN class centroid, b = distance
    to the nearest OTHER centroid, s = (b - a)/max(a, b); per-label
    mean silhouette and the fraction of negative-s vectors (points
    sitting closer to a foreign centroid — the mislabeled/boundary
    mass a curation pass would re-embed or re-label).  The classic
    all-pairs silhouette is O(n^2); the centroid form is the standard
    distributed surrogate (k distances per row, k fixed).  Cross-
    engine exactness: centroid components round to 6 BEFORE the
    distance fold (the cluster_assign discipline), each squared
    distance rounds to 6, a and b round after sqrt, and each s
    micro-quantizes to an exact integer so the per-label MEAN is an
    order-free bigint sum closed by one rounded double division.

    Shape at any SF: the centroid build shuffles only labels x dims
    partial sums; centroids broadcast under the corpus scan, the a/b
    reduction is a per-vector k-row aggregate computed map-side after
    the broadcast join, and the final hash-agg is |labels| rows — the
    corpus never shuffles."""
    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", "label", to_double_array("embedding").alias("emb")
    )
    comp = (
        e.select("label", F.posexplode("emb").alias("pos", "x"))
        .groupBy("label", "pos")
        .agg(F.round(F.avg("x"), 6).alias("c"))
    )
    cent = comp.groupBy(F.col("label").alias("c_label")).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "c"))), lambda s: s["c"]
        ).alias("centroid")
    )
    dist2 = F.aggregate(
        F.zip_with("emb", "centroid", lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    scored = e.crossJoin(F.broadcast(cent)).select(
        "vec_id", "label", "c_label", F.round(dist2, 6).alias("dist2")
    )
    ab = scored.groupBy("vec_id", "label").agg(
        F.round(
            F.sqrt(
                F.max(F.when(F.col("c_label") == F.col("label"), F.col("dist2")))
            ),
            6,
        ).alias("a"),
        F.round(
            F.sqrt(
                F.min(F.when(F.col("c_label") != F.col("label"), F.col("dist2")))
            ),
            6,
        ).alias("b"),
    )
    s = ab.select(
        "label",
        F.round(
            (F.col("b") - F.col("a")) / F.greatest("a", "b") * 1_000_000
        )
        .cast("bigint")
        .alias("sq"),
    )
    return (
        s.groupBy("label")
        .agg(
            F.count("*").alias("n_vectors"),
            F.round(F.sum("sq").cast("double") / F.count("*") / 1_000_000, 6).alias(
                "mean_silhouette"
            ),
            F.round(
                F.sum(F.when(F.col("sq") < 0, 1).otherwise(0)).cast("double")
                / F.count("*"),
                6,
            ).alias("frac_negative"),
        )
        .orderBy("label")
    )
