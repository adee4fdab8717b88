"""Multimodal columns (SURVEY.md §2.11): opaque binary blobs with typed
metadata, decode/feature-extract via Arrow-batched mapInPandas.

The container has no image/audio codecs, so decode for non-text media
is STUBBED (clearly marked below) behind a deterministic fallback —
but the Spark-side plumbing is real and tested: BinaryType columns
through scans/joins/shuffles, metadata structs, Arrow batch transfer,
partition-preserving mapInPandas with a stable output schema.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession, functions as F

from spark_lineage_spark.plans.extract import lineage_checkpoint_lazy
from spark_lineage_spark.registry import query
from spark_lineage_spark.tables import load


@query(
    "llm_multimodal_blob",
    "§2.11 binary columns through relational ops",
    """
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           md5(text) AS blob_md5,
           upper(substr(md5(text), 1, 8)) AS blob_key,
           CASE WHEN octet_length(encode(text)) > 300 THEN 'large' ELSE 'small' END AS size_bucket
    FROM documents
    """,
)
def llm_multimodal_blob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blob plumbing: text encoded to a real BinaryType column, then
    length/hash/bucketing computed ON the binary column (not the
    string) — the same expressions that apply to image/audio bytes."""
    d = load(spark, sf_dir, "documents")
    blob = F.encode(F.col("text"), "utf-8")
    return d.select(
        "doc_id",
        F.octet_length(blob).alias("n_bytes"),
        F.md5(blob).alias("blob_md5"),
        F.upper(F.substring(F.md5(blob), 1, 8)).alias("blob_key"),
        F.when(F.octet_length(blob) > 300, "large").otherwise("small").alias("size_bucket"),
    )


MEDIA_SCHEMA = (
    "doc_id long, media_type string, n_bytes int, "
    "feat array<double>, decode_status string"
)


def _extract_features(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
    """Arrow-batched feature extractor over (doc_id, media_type, blob).

    text/plain: real features (byte histogram moments).
    image/audio/video: STUB — the real implementation would decode
    with PIL/ffmpeg here; this container has neither, so non-text
    media yields decode_status='stub:<type>' and a deterministic
    length-derived feature so the pipeline stays testable end-to-end
    (SURVEY.md §2.11 multimodal row).
    """
    import numpy as np
    import pandas as pd

    for pdf in batches:
        rows = []
        for doc_id, mt, blob in zip(pdf["doc_id"], pdf["media_type"], pdf["blob"]):
            data = np.frombuffer(blob, dtype=np.uint8)
            if mt == "text/plain":
                # exact integer moments, closed-form double finish with
                # the SAME operation order as the oracle — np.mean/std's
                # pairwise float accumulation differs from an exact-sum
                # division by ulps, which landed on round-6 boundaries
                # in the round-12 10x oracle sweep
                n = len(data)
                s = int(data.sum(dtype=np.int64))
                ss = int((data.astype(np.int64) ** 2).sum())
                var = (n * float(ss) - float(s) * float(s)) / n / n
                # RAW doubles out — rounding happens Spark-side
                # (F.round = HALF_UP, matching DuckDB; python round()
                # is banker's and flipped an exact s/n dyadic .5 the
                # other way at sf0.1 — the second 10x-sweep finding)
                feat = [
                    float(s) / n,
                    float(np.sqrt(var)),
                    float(data.min()),
                    float(data.max()),
                ]
                status = "ok"
            else:
                # STUB: no codec in this environment. Deterministic
                # fake so downstream operators remain exercisable.
                feat = [float(len(data) % 251), 0.0, 0.0, 0.0]
                status = f"stub:{mt}"
            rows.append((doc_id, mt, len(data), feat, status))
        yield pd.DataFrame(
            rows, columns=["doc_id", "media_type", "n_bytes", "feat", "decode_status"]
        )


MULTIMODAL_FEATURES_ORACLE = """
WITH chars AS (
  SELECT doc_id, unicode(substr(text, i, 1)) AS code
  FROM documents, LATERAL (SELECT unnest(range(1, length(text) + 1)) AS i) t
),
stats AS (
  SELECT doc_id,
         round(CAST(s AS DOUBLE) / n, 6) AS mean_c,
         round(sqrt((n * CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s)
                    / n / n), 6) AS std_c,
         n
  FROM (SELECT doc_id,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(code AS BIGINT)) AS BIGINT) AS s,
               CAST(sum(CAST(code AS BIGINT) * CAST(code AS BIGINT))
                    AS BIGINT) AS ss
        FROM chars GROUP BY doc_id)
),
typed AS (
  SELECT doc_id,
         CASE WHEN doc_id % 10 = 0 THEN 'image/png'
              WHEN doc_id % 10 = 1 THEN 'audio/wav'
              ELSE 'text/plain' END AS media_type,
         octet_length(encode(text)) AS n_bytes
  FROM documents
)
SELECT t.doc_id, t.media_type, CAST(t.n_bytes AS INTEGER) AS n_bytes,
       CASE WHEN t.media_type = 'text/plain' THEN s.mean_c
            ELSE CAST(t.n_bytes % 251 AS DOUBLE) END AS byte_mean,
       CASE WHEN t.media_type = 'text/plain' THEN s.std_c ELSE 0.0 END AS byte_std,
       CASE WHEN t.media_type = 'text/plain' THEN 'ok'
            ELSE 'stub:' || t.media_type END AS decode_status
FROM typed t JOIN stats s USING (doc_id)
"""


@query(
    "llm_multimodal_features",
    "§2.11 mapInPandas feature extraction over binary media",
    MULTIMODAL_FEATURES_ORACLE,
)
def llm_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode/feature-extract over binary media columns via
    mapInPandas: Arrow batches in, vectorized numpy per batch, stable
    typed schema out. Partitioning is preserved (no shuffle); at
    100 TB this runs as a map-only stage colocated with the scan.

    Oracle-checkable because the fixture text is ASCII (byte values ==
    code points), so the numpy byte statistics equal DuckDB's
    aggregate over unicode(substr(...)); both sides compute mean/std
    from EXACT integer (sum, sum-of-squares) with the identical
    closed-form double finish — np.mean/np.std's pairwise float
    accumulation was ulps off DuckDB's and landed on round-6
    boundaries at sf0.1 (round-12 10x oracle sweep), so rounding alone
    is not the guarantee here, exactness is."""
    d = load(spark, sf_dir, "documents")
    media = d.select(
        "doc_id",
        F.when(F.col("doc_id") % 10 == 0, "image/png")
        .when(F.col("doc_id") % 10 == 1, "audio/wav")
        .otherwise("text/plain")
        .alias("media_type"),
        F.encode(F.col("text"), "utf-8").alias("blob"),
    )
    return media.mapInPandas(_extract_features, schema=MEDIA_SCHEMA).select(
        "doc_id",
        "media_type",
        "n_bytes",
        F.round(F.element_at("feat", 1), 6).alias("byte_mean"),
        F.round(F.element_at("feat", 2), 6).alias("byte_std"),
        "decode_status",
    )


FRAME_SAMPLE_N = 4
FRAME_SCHEMA = (
    "doc_id long, frame_idx int, frame_offset long, frame_byte int, decode_status string"
)


def _sample_frames(batches):
    """Arrow-batched frame sampler over (doc_id, blob): emit
    FRAME_SAMPLE_N evenly-spaced frame records per blob (1 input row →
    N output rows — the video fan-out batch shape). The real
    implementation would ffmpeg-seek and decode at each offset; no
    codec ships in this container, so the decoded payload is STUBBED as
    the byte AT the offset (deterministic), while the offsets, fan-out,
    schema, and batching are the real plumbing."""
    import numpy as np
    import pandas as pd

    for pdf in batches:
        if not len(pdf):
            continue
        n_bytes = pdf["blob"].map(len).to_numpy(dtype=np.int64)
        stride = np.maximum(n_bytes // FRAME_SAMPLE_N, 1)
        doc_ids = pdf["doc_id"].to_numpy()
        rows = []
        for i in range(len(pdf)):
            blob = pdf["blob"].iloc[i]
            for f in range(FRAME_SAMPLE_N):
                off = int(stride[i]) * f
                if off >= n_bytes[i]:
                    break
                rows.append(
                    (int(doc_ids[i]), f, off, int(blob[off]), "stub:video/mp4")
                )
        yield pd.DataFrame(
            rows,
            columns=["doc_id", "frame_idx", "frame_offset", "frame_byte", "decode_status"],
        )


@query(
    "llm_multimodal_frame_sample",
    "§2.11 video frame sampling (mapInPandas 1→N fan-out, stubbed decode)",
    f"""
    WITH typed AS (
      SELECT doc_id, text, octet_length(encode(text)) AS n_bytes,
             greatest(octet_length(encode(text)) // {FRAME_SAMPLE_N}, 1) AS stride
      FROM documents
    ),
    frames AS (
      SELECT doc_id, text, n_bytes, stride, unnest(range(0, {FRAME_SAMPLE_N})) AS frame_idx
      FROM typed
    )
    SELECT doc_id, CAST(frame_idx AS INTEGER) AS frame_idx,
           CAST(frame_idx * stride AS BIGINT) AS frame_offset,
           unicode(substr(text, CAST(frame_idx * stride AS INTEGER) + 1, 1)) AS frame_byte,
           'stub:video/mp4' AS decode_status
    FROM frames
    WHERE frame_idx * stride < n_bytes
    """,
)
def llm_multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling for video-like blobs: every blob yields up to
    {N} evenly-spaced frame records through ONE mapInPandas pass —
    partition-preserving fan-out colocated with the scan, no shuffle;
    at 100 TB the decode cost dominates and scales linearly with
    executors. Oracle-checkable because the stub 'decode' (byte at
    offset) is exact integer arithmetic over ASCII fixture text."""
    d = load(spark, sf_dir, "documents")
    media = d.select("doc_id", F.encode(F.col("text"), "utf-8").alias("blob"))
    return media.mapInPandas(_sample_frames, schema=FRAME_SCHEMA)


AUDIO_WINDOW = 64  # fake PCM frame: 64 one-byte samples


def _audio_windows(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
    """STUB decode: real audio would arrive as PCM via ffmpeg; here the
    blob's utf-8 bytes stand in as uint8 samples. The windowed stats
    (mean amplitude, RMS) are exact integer sums divided in f64, so the
    DuckDB oracle reproduces them bit-for-bit."""
    import numpy as np
    import pandas as pd

    for pdf in batches:
        out = {"doc_id": [], "window_idx": [], "n_samples": [], "mean_amp": [], "rms": []}
        for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
            samples = np.frombuffer(bytes(blob), dtype=np.uint8).astype(np.int64)
            for w in range(0, len(samples), AUDIO_WINDOW):
                win = samples[w : w + AUDIO_WINDOW]
                out["doc_id"].append(doc_id)
                out["window_idx"].append(w // AUDIO_WINDOW)
                out["n_samples"].append(len(win))
                out["mean_amp"].append(round(float(win.sum()) / len(win), 6))
                out["rms"].append(round(float(np.sqrt(float((win * win).sum()) / len(win))), 6))
        yield pd.DataFrame(out)


@query(
    "llm_multimodal_audio_window",
    "§2.11 audio windowing (stub PCM decode, per-window amplitude stats)",
    f"""
    WITH pos AS (
      SELECT doc_id, unnest(generate_series(1, len(text))) AS p, text
      FROM documents
    ),
    b AS (SELECT doc_id, CAST((p - 1) // {AUDIO_WINDOW} AS INTEGER) AS window_idx,
                 unicode(substr(text, CAST(p AS INT), 1)) AS amp
          FROM pos)
    SELECT doc_id, window_idx,
           count(*) AS n_samples,
           round(sum(amp) * 1.0 / count(*), 6) AS mean_amp,
           round(sqrt(sum(amp * amp) * 1.0 / count(*)), 6) AS rms
    FROM b GROUP BY doc_id, window_idx
    """,
)
def llm_multimodal_audio_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio-style windowing over binary media: fixed 64-sample frames
    per blob, mean amplitude + RMS per frame — the feature shape a
    voice-activity or loudness filter consumes. One partition-
    preserving mapInPandas (decode + window stats colocated with the
    scan, 1→N fan-out, no shuffle); integer sums keep both engines
    bit-identical before the single rounded division."""
    d = load(spark, sf_dir, "documents")
    media = d.select("doc_id", F.encode(F.col("text"), "utf-8").alias("blob"))
    return media.mapInPandas(
        _audio_windows,
        schema="doc_id long, window_idx int, n_samples long, mean_amp double, rms double",
    )


# ---------------------------------------------------------------------------
# Round-9 addition, queued for round 10 (SURVEY §2.18): perceptual-hash
# near-dup signatures over binary media.
# ---------------------------------------------------------------------------

_AHASH_ORACLE = """
WITH b AS (SELECT doc_id, encode(text) AS blob FROM documents),
bytes AS (
  SELECT b.doc_id, octet_length(b.blob) AS n, g.j,
         CAST(concat('0x', substr(hex(b.blob), 2 * g.j - 1, 2)) AS BIGINT) AS v
  FROM b, LATERAL (SELECT unnest(generate_series(1, octet_length(b.blob))) AS j) g
),
chunks AS (
  SELECT doc_id, ((j - 1) * 64) // n AS c,
         CAST(sum(v) AS BIGINT) AS s, CAST(count(*) AS BIGINT) AS cnt
  FROM bytes GROUP BY doc_id, ((j - 1) * 64) // n
),
tot AS (
  SELECT doc_id, CAST(sum(s) AS BIGINT) AS ts, CAST(sum(cnt) AS BIGINT) AS tc
  FROM chunks GROUP BY doc_id
),
bits AS (
  SELECT c.doc_id, c.c,
         CASE WHEN c.s * t.tc > t.ts * c.cnt THEN 1 ELSE 0 END AS bit
  FROM chunks c JOIN tot t USING (doc_id)
),
bands AS (
  SELECT t.doc_id, g.band,
         CAST(COALESCE(sum(b.bit * (1 << (b.c % 16))), 0) AS BIGINT) AS band_val
  FROM tot t
  CROSS JOIN (VALUES (0), (1), (2), (3)) g(band)
  LEFT JOIN bits b ON b.doc_id = t.doc_id AND b.c // 16 = g.band
  GROUP BY t.doc_id, g.band
)
SELECT doc_id,
       CAST(max(CASE WHEN band = 0 THEN band_val END) AS BIGINT) AS b0,
       CAST(max(CASE WHEN band = 1 THEN band_val END) AS BIGINT) AS b1,
       CAST(max(CASE WHEN band = 2 THEN band_val END) AS BIGINT) AS b2,
       CAST(max(CASE WHEN band = 3 THEN band_val END) AS BIGINT) AS b3
FROM bands GROUP BY doc_id
"""


@query(
    "llm_multimodal_ahash",
    "§2.18 perceptual average-hash signatures over binary blobs (byte-exact cross-engine)",
    _AHASH_ORACLE,
)
def llm_multimodal_ahash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average-hash (aHash) perceptual signatures over BINARY media:
    the blob's bytes are bucketed into 64 contiguous cells (cell of
    byte j = j*64 div len — for a decoded image these would be 8x8
    downsampled pixels; the codec-less container treats the raw bytes
    as the pixel stream, the same STUB discipline as
    llm_multimodal_features), each cell sets its bit iff its mean
    exceeds the global mean, and the 64 bits pack into four 16-bit
    bands — the banding layout a hamming-distance dedup joins on
    (<=3 flipped bits leave >=1 band intact, the pigeonhole recall
    guarantee property-tested alongside identical-blob collision).

    All comparisons are EXACT integers (cell mean > global mean is
    cross-multiplied: s*total_cnt > total_sum*cnt), so the pandas
    byte loop and the DuckDB hex-parsing oracle agree bit-for-bit —
    value-parity for a real binary-media pipeline, not just plumbing.
    Scale shape: mapInPandas is one Arrow-batched map pass (no
    shuffle); signatures are 8 bytes/doc; the band join afterwards is
    the persisted-index shape of llm_dedup_persistent_index."""
    import numpy as np
    import pandas as pd

    d = load(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("blob")
    )

    def ahash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                v = np.frombuffer(bytes(blob), dtype=np.uint8).astype(np.int64)
                n = len(v)
                cells = (np.arange(n, dtype=np.int64) * 64) // n
                sums = np.zeros(64, dtype=np.int64)
                cnts = np.zeros(64, dtype=np.int64)
                np.add.at(sums, cells, v)
                np.add.at(cnts, cells, 1)
                ts, tc = int(sums.sum()), int(cnts.sum())
                bits = (sums * tc) > (ts * cnts)  # empty cells stay 0
                bands = [
                    int(sum(int(bits[b * 16 + i]) << i for i in range(16)))
                    for b in range(4)
                ]
                out.append((doc_id, *bands))
            yield pd.DataFrame(
                out, columns=["doc_id", "b0", "b1", "b2", "b3"]
            )

    return d.mapInPandas(ahash, "doc_id long, b0 long, b1 long, b2 long, b3 long")


# Hamming near-dup pairs over the aHash signatures — queued for the
# round-10 official run.  The media table is each blob PLUS a "dimmed"
# copy (every byte scaled 9v//10 — the uniform intensity change a
# perceptual hash must survive); the banded hamming join recovers the
# twins.
_AHASH_HAM_ORACLE = """
WITH b AS (SELECT doc_id, encode(text) AS blob FROM documents),
bytes AS (
  SELECT b.doc_id + var.off AS doc_id, octet_length(b.blob) AS n, g.j,
         CASE WHEN var.off = 0
              THEN CAST(concat('0x', substr(hex(b.blob), 2 * g.j - 1, 2)) AS BIGINT)
              ELSE (9 * CAST(concat('0x', substr(hex(b.blob), 2 * g.j - 1, 2)) AS BIGINT)) // 10
         END AS v
  FROM b
  CROSS JOIN (VALUES (0), (1000000)) var(off),
  LATERAL (SELECT unnest(generate_series(1, octet_length(b.blob))) AS j) g
),
chunks AS (
  SELECT doc_id, ((j - 1) * 64) // n AS c,
         CAST(sum(v) AS BIGINT) AS s, CAST(count(*) AS BIGINT) AS cnt
  FROM bytes GROUP BY doc_id, ((j - 1) * 64) // n
),
tot AS (
  SELECT doc_id, CAST(sum(s) AS BIGINT) AS ts, CAST(sum(cnt) AS BIGINT) AS tc
  FROM chunks GROUP BY doc_id
),
bits AS (
  SELECT c.doc_id, c.c,
         CASE WHEN c.s * t.tc > t.ts * c.cnt THEN 1 ELSE 0 END AS bit
  FROM chunks c JOIN tot t USING (doc_id)
),
bands AS (
  SELECT t.doc_id, g.band,
         CAST(COALESCE(sum(b.bit * (1 << (b.c % 16))), 0) AS BIGINT) AS band_val
  FROM tot t
  CROSS JOIN (VALUES (0), (1), (2), (3)) g(band)
  LEFT JOIN bits b ON b.doc_id = t.doc_id AND b.c // 16 = g.band
  GROUP BY t.doc_id, g.band
),
sigs AS MATERIALIZED (
  SELECT doc_id,
         CAST(max(CASE WHEN band = 0 THEN band_val END) AS BIGINT) AS b0,
         CAST(max(CASE WHEN band = 1 THEN band_val END) AS BIGINT) AS b1,
         CAST(max(CASE WHEN band = 2 THEN band_val END) AS BIGINT) AS b2,
         CAST(max(CASE WHEN band = 3 THEN band_val END) AS BIGINT) AS b3
  FROM bands GROUP BY doc_id
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.b0, b.b0)) + bit_count(xor(a.b1, b.b1))
            + bit_count(xor(a.b2, b.b2)) + bit_count(xor(a.b3, b.b3))
            AS BIGINT) AS hamming,
       CAST((CASE WHEN a.b0 = b.b0 THEN 1 ELSE 0 END)
            + (CASE WHEN a.b1 = b.b1 THEN 1 ELSE 0 END)
            + (CASE WHEN a.b2 = b.b2 THEN 1 ELSE 0 END)
            + (CASE WHEN a.b3 = b.b3 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_shared_bands
FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.b0, b.b0)) + bit_count(xor(a.b1, b.b1))
      + bit_count(xor(a.b2, b.b2)) + bit_count(xor(a.b3, b.b3)) <= 3
  AND (a.b0 = b.b0 OR a.b1 = b.b1 OR a.b2 = b.b2 OR a.b3 = b.b3)
ORDER BY doc_a, doc_b
"""


@query(
    "llm_multimodal_ahash_dedup",
    "§2.19 perceptual near-dup pairs: banded hamming join on aHash signatures",
    _AHASH_HAM_ORACLE,
)
def llm_multimodal_ahash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup llm_multimodal_ahash's band layout exists FOR: media
    pairs whose 64-bit perceptual signatures differ in at most 3
    bits.  The corpus is each blob plus a DIMMED copy (doc_id offset
    by 1e6; every byte scaled 9v//10 — the uniform intensity change
    aHash is built to survive, since scaling moves cell means and the
    global mean together and only boundary cells flip; measured 0-3
    flipped bits across all 500 sf0.01 twins, versus ~32 for
    unrelated pairs and 15-35 even for text-edit near-dup families,
    whose byte-shifts aHash does NOT absorb — an honest negative this
    docstring records rather than hides).

    By pigeonhole, <=3 flipped bits leave at least one of the four
    16-bit bands intact, so candidates come from FOUR BAND EQUI-JOINS
    (posexplode signatures to (band_idx, band_val), self-join on that
    key, distinct pairs) — never an all-pairs scan; exact hamming
    (bit_count of xor, JVM-side) verifies each candidate, the LSH
    candidate->verify shape of llm_dedup_minhash_lsh.  The oracle
    brute-forces all pairs with the same intactness predicate,
    proving the banded join loses nothing at this threshold.  At
    100 TB: band tables are 4 rows of (16-bit key, doc) per media
    item; saturated band values (all-zero bands from blank media)
    are the skew risk — drop or salt them, the
    llm_dedup_persistent_index discipline.  One Arrow-batched
    mapInPandas pass emits BOTH signatures per blob (1->2 fan-out,
    no shuffle)."""
    import numpy as np
    import pandas as pd

    d = load(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("blob")
    )

    def sig64(v):
        n = len(v)
        cells = (np.arange(n, dtype=np.int64) * 64) // n
        sums = np.zeros(64, dtype=np.int64)
        cnts = np.zeros(64, dtype=np.int64)
        np.add.at(sums, cells, v)
        np.add.at(cnts, cells, 1)
        ts, tc = int(sums.sum()), int(cnts.sum())
        bits = (sums * tc) > (ts * cnts)
        return [
            int(sum(int(bits[b * 16 + i]) << i for i in range(16))) for b in range(4)
        ]

    # Synthetic dimmed-twin ids live at doc_id + _TWIN_OFFSET; real ids
    # must stay strictly below the offset or the twins would collide
    # with real documents (both engines use the same offset, so the
    # oracle hash would still pass while pair semantics silently
    # break; ADVICE r9).  Asserted per Arrow batch executor-side —
    # a larger fixture fails loudly, no driver-side scan needed.
    _TWIN_OFFSET = 1_000_000

    def ahash_pairs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) and int(pdf["doc_id"].max()) >= _TWIN_OFFSET:
                raise ValueError(
                    f"doc_id >= {_TWIN_OFFSET} collides with synthetic "
                    f"dimmed-twin ids; raise _TWIN_OFFSET past max(doc_id)"
                )
            out = []
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                v = np.frombuffer(bytes(blob), dtype=np.uint8).astype(np.int64)
                out.append((doc_id, *sig64(v)))
                out.append((doc_id + _TWIN_OFFSET, *sig64((9 * v) // 10)))
            yield pd.DataFrame(out, columns=["doc_id", "b0", "b1", "b2", "b3"])

    sigs = d.mapInPandas(
        ahash_pairs, "doc_id long, b0 long, b1 long, b2 long, b3 long"
    ).transform(lineage_checkpoint_lazy)
    bands = sigs.select(
        "doc_id",
        F.posexplode(F.array("b0", "b1", "b2", "b3")).alias("band_idx", "band_val"),
    )
    cand = (
        bands.alias("x")
        .join(bands.alias("y"), ["band_idx", "band_val"])
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b"))
        .distinct()
    )
    sa = sigs.select(
        F.col("doc_id").alias("doc_a"),
        F.col("b0").alias("a0"), F.col("b1").alias("a1"),
        F.col("b2").alias("a2"), F.col("b3").alias("a3"),
    )
    sb = sigs.select(
        F.col("doc_id").alias("doc_b"),
        F.col("b0").alias("c0"), F.col("b1").alias("c1"),
        F.col("b2").alias("c2"), F.col("b3").alias("c3"),
    )
    ham = (
        F.bit_count(F.col("a0").bitwiseXOR(F.col("c0")))
        + F.bit_count(F.col("a1").bitwiseXOR(F.col("c1")))
        + F.bit_count(F.col("a2").bitwiseXOR(F.col("c2")))
        + F.bit_count(F.col("a3").bitwiseXOR(F.col("c3")))
    )
    shared = (
        F.when(F.col("a0") == F.col("c0"), 1).otherwise(0)
        + F.when(F.col("a1") == F.col("c1"), 1).otherwise(0)
        + F.when(F.col("a2") == F.col("c2"), 1).otherwise(0)
        + F.when(F.col("a3") == F.col("c3"), 1).otherwise(0)
    )
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            ham.cast("bigint").alias("hamming"),
            shared.cast("bigint").alias("n_shared_bands"),
        )
        .filter(F.col("hamming") <= 3)
        .orderBy("doc_a", "doc_b")
    )


# ---------------------------------------------------------------------------
# Round-11 addition (SURVEY §2.21): scene-cut detection over video-like
# blobs — frame-difference segmentation, the shot-boundary primitive a
# video-training pipeline runs before frame sampling (sample per SHOT,
# not per fixed stride, or you over-represent static scenes).
# ---------------------------------------------------------------------------

SCENE_FRAME_BYTES = 64  # fake frame: 64 consecutive blob bytes
SCENE_CUT_THRESH = 250  # |Δ frame byte-sum| above this = shot boundary


def _scene_frame_sums(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
    """Arrow-batched frame featurizer over (doc_id, blob): split each
    blob into consecutive SCENE_FRAME_BYTES-byte full frames and emit
    one EXACT integer byte-sum per frame (1 input row → n_frames output
    rows).  The real implementation would decode frames and compare
    histograms; no codec ships in this container, so the per-frame
    feature is STUBBED as the raw byte-sum (deterministic, exact),
    while the fan-out, numpy batch shape, and schema are the real
    plumbing."""
    import numpy as np
    import pandas as pd

    for pdf in batches:
        if not len(pdf):
            continue
        out_doc, out_idx, out_sum = [], [], []
        for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
            n = len(blob) // SCENE_FRAME_BYTES
            if not n:
                continue
            arr = np.frombuffer(blob, dtype=np.uint8, count=n * SCENE_FRAME_BYTES)
            sums = arr.reshape(n, SCENE_FRAME_BYTES).sum(axis=1, dtype=np.int64)
            out_doc.extend([int(doc_id)] * n)
            out_idx.extend(range(n))
            out_sum.extend(int(s) for s in sums)
        yield pd.DataFrame(
            {"doc_id": out_doc, "frame_idx": out_idx, "frame_sum": out_sum}
        )


@query(
    "llm_multimodal_scene_cut",
    "§2.21 scene-cut detection: frame-difference shot boundaries over video-like blobs",
    f"""
    WITH fr AS (
      SELECT doc_id, f AS frame_idx,
             list_sum(list_transform(range(1, {SCENE_FRAME_BYTES + 1}),
               j -> unicode(substr(text,
                 CAST(f * {SCENE_FRAME_BYTES} + j AS INTEGER), 1)))) AS s
      FROM (SELECT doc_id, text,
                   unnest(range(0, CAST(floor(length(text) / {SCENE_FRAME_BYTES})
                                        AS BIGINT))) AS f
            FROM documents)
    ),
    d AS (
      SELECT doc_id, frame_idx, s,
             s - lag(s) OVER (PARTITION BY doc_id ORDER BY frame_idx) AS jump
      FROM fr
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_frames,
           CAST(count(*) FILTER (WHERE abs(jump) > {SCENE_CUT_THRESH}) AS BIGINT)
             AS n_cuts,
           CAST(COALESCE(max(abs(jump)), 0) AS BIGINT) AS max_jump,
           CAST(COALESCE(min(CASE WHEN abs(jump) > {SCENE_CUT_THRESH}
                                  THEN frame_idx END), -1) AS BIGINT)
             AS first_cut_idx
    FROM d GROUP BY doc_id ORDER BY doc_id
    """,
)
def llm_multimodal_scene_cut(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scene-cut (shot-boundary) detection over video-like blobs — the
    segmentation pass a video pipeline runs BEFORE frame sampling so
    static scenes aren't over-represented: featurize consecutive
    fixed-size frames (stubbed here as exact integer byte-sums — see
    _scene_frame_sums), then a boundary is any frame whose feature
    jumps more than SCENE_CUT_THRESH from its predecessor.  Per doc:
    frame count, cut count, the largest jump, and the first boundary
    (-1 = single shot).  Everything is exact integer arithmetic over
    ASCII fixture bytes, so DuckDB replays it bit-identically via
    unicode(substr(...)) sums.

    Shape at any SF: the featurize pass is ONE partition-preserving
    mapInPandas colocated with the scan (1 row → n_frames rows, numpy
    reshape-sum per batch — the decode stand-in that dominates at real
    scale and parallelizes linearly with executors); the lag window and
    the per-doc aggregate both partition by doc_id, so the only
    shuffle carries (doc_id, frame_idx, int64) triples — a fixed small
    multiple of the row count, never the blob bytes."""
    d = load(spark, sf_dir, "documents")
    media = d.select("doc_id", F.encode(F.col("text"), "utf-8").alias("blob"))
    frames = media.mapInPandas(
        _scene_frame_sums, schema="doc_id long, frame_idx int, frame_sum long"
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy("frame_idx")
    dd = frames.withColumn(
        "jump", F.col("frame_sum") - F.lag("frame_sum").over(w)
    )
    return (
        dd.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_frames"),
            F.count(
                F.when(F.abs(F.col("jump")) > SCENE_CUT_THRESH, 1)
            ).alias("n_cuts"),
            F.coalesce(F.max(F.abs(F.col("jump"))), F.lit(0))
            .cast("bigint")
            .alias("max_jump"),
            F.coalesce(
                F.min(
                    F.when(
                        F.abs(F.col("jump")) > SCENE_CUT_THRESH, F.col("frame_idx")
                    )
                ),
                F.lit(-1),
            )
            .cast("bigint")
            .alias("first_cut_idx"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Round-11 addition (SURVEY §2.21): text<->media alignment score — the
# CLIP-score-shaped filter a paired image-text pipeline runs before
# training (drop the pairs whose caption doesn't match the image).
# Both encoders are deterministic stand-ins with EXACT integer
# outputs, so the cosine closes in one rounded double per pair.
# ---------------------------------------------------------------------------

ALIGN_DIMS = 8


def _media_chunk_vec(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
    """Arrow-batched media 'encoder' over (doc_id, blob): split the
    blob into ALIGN_DIMS contiguous equal chunks (tail dropped), one
    exact integer byte-sum per chunk, centered to a signed vector
    (8*s_i - sum(s)).  The real implementation would run an image
    encoder here; no model ships in this container, so the chunk-sum
    vector is the STUBBED deterministic stand-in while the Arrow
    batching, fan-in shape, and array<long> schema are the real
    plumbing."""
    import numpy as np
    import pandas as pd

    for pdf in batches:
        ids, vecs = [], []
        for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
            n = len(blob) // ALIGN_DIMS
            if not n:
                continue
            arr = np.frombuffer(
                blob, dtype=np.uint8, count=ALIGN_DIMS * n
            ).astype(np.int64)
            s = arr.reshape(ALIGN_DIMS, n).sum(axis=1)
            c = ALIGN_DIMS * s - s.sum()
            ids.append(int(doc_id))
            vecs.append([int(x) for x in c])
        yield pd.DataFrame({"doc_id": ids, "mvec": vecs})


@query(
    "llm_multimodal_alignment",
    "§2.21 text-media alignment score (CLIP-score-shaped pair filter, bottom-10)",
    f"""
    WITH toks AS (
      SELECT doc_id,
             CAST(concat('0x', substr(md5(t), 1, 15)) AS BIGINT) AS h
      FROM (SELECT doc_id,
                   unnest(list_filter(string_split(text, ' '), t -> len(t) > 0)) AS t
            FROM documents WHERE text IS NOT NULL)
    ),
    sums AS (
      SELECT doc_id, h % {ALIGN_DIMS} AS dim,
             CAST(sum(CASE WHEN (h >> 3) & 1 = 1 THEN 1 ELSE -1 END) AS BIGINT) AS v
      FROM toks GROUP BY 1, 2
    ),
    tvec AS (
      SELECT d.doc_id, dims.dim, coalesce(s.v, 0) AS v
      FROM (SELECT DISTINCT doc_id FROM toks) d
      CROSS JOIN (SELECT unnest(generate_series(0, {ALIGN_DIMS - 1})) AS dim) dims
      LEFT JOIN sums s ON s.doc_id = d.doc_id AND s.dim = dims.dim
    ),
    m AS (
      SELECT doc_id, text, CAST(floor(length(text) / {ALIGN_DIMS}) AS BIGINT) AS n
      FROM documents WHERE length(text) >= {ALIGN_DIMS}
    ),
    chunks AS (
      SELECT doc_id, i,
             CAST(list_sum(list_transform(range(1, n + 1),
                  j -> unicode(substr(text, CAST(i * n + j AS INTEGER), 1))))
               AS BIGINT) AS s
      FROM m CROSS JOIN range(0, {ALIGN_DIMS}) AS t(i)
    ),
    cvec AS (
      SELECT doc_id, i AS dim,
             {ALIGN_DIMS} * s - sum(s) OVER (PARTITION BY doc_id) AS c
      FROM chunks
    ),
    dots AS (
      SELECT t.doc_id,
             CAST(sum(t.v * c.c) AS BIGINT) AS tc,
             CAST(sum(t.v * t.v) AS BIGINT) AS tt,
             CAST(sum(c.c * c.c) AS BIGINT) AS cc
      FROM tvec t JOIN cvec c ON t.doc_id = c.doc_id AND t.dim = c.dim
      GROUP BY t.doc_id
    )
    SELECT doc_id,
           CASE WHEN doc_id % 10 = 0 THEN 'image/png'
                WHEN doc_id % 10 = 1 THEN 'audio/wav'
                ELSE 'text/plain' END AS media_type,
           round(CAST(tc AS DOUBLE) / (sqrt(CAST(tt AS DOUBLE))
                                       * sqrt(CAST(cc AS DOUBLE))), 6) AS align_cos
    FROM dots WHERE tt > 0 AND cc > 0
    ORDER BY align_cos, doc_id LIMIT 10
    """,
)
def llm_multimodal_alignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text<->media alignment scoring — the CLIP-score-shaped filter a
    paired dataset pipeline runs before training (LAION-style: embed
    caption and image, keep pairs above a cosine threshold): the text
    side is the vocab-free signed hash embedding (llm_doc_hash_
    embedding's exact integer fold), the media side a deterministic
    chunk-byte-sum 'encoder' over the blob (STUB for the real image
    model — see _media_chunk_vec), and the score their cosine; the
    output is the BOTTOM-10 pairs, i.e. exactly the rows the filter
    would drop first.  Both vectors are exact integers, every dot
    product is an exact int64 sum, and one rounded double division
    per pair closes the hash gate.

    Shape at any SF (optimization r15, guide §4.1/§2.3): the text side
    is explode + ONE two-phase aggregation with 8 conditional sums —
    per-token work is pure whole-stage codegen (the previous HOF fold
    allocated a fresh 8-long array per token in the interpreted
    evaluator; same-session A/B: full op 1.87 s -> 1.06 s), and the
    partial aggregation collapses the exploded tokens map-side so only
    ~one 8-long row per doc ever shuffles. A doc whose tokens all
    cancel (or that has none) had tvec == zeros before and tt == 0
    dropped it; under the groupBy form it simply has no row (explode
    drops empty arrays) or keeps tt == 0 — identical survivors. The
    media encoder is one partition-preserving mapInPandas; the pair
    join keys on doc_id and reuses the aggregation's partitioning;
    the global bottom-10 is a TakeOrdered."""
    d = load(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    hashes = F.expr(
        "transform(filter(split(text, ' '), t -> length(t) > 0),"
        " t -> cast(conv(substring(md5(cast(t AS BINARY)), 1, 15), 16, 10)"
        " AS BIGINT))"
    )

    def sgn(h):
        return F.when(h.bitwiseAND(F.lit(8)) != 0, F.lit(1)).otherwise(F.lit(-1))

    tok = d.select("doc_id", F.explode(hashes).alias("h"))
    tv = tok.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.col("h") % ALIGN_DIMS == i, sgn(F.col("h"))).otherwise(
                    F.lit(0)
                )
            ).alias(f"v{i}")
            for i in range(ALIGN_DIMS)
        ]
    )
    media = d.select("doc_id", F.encode(F.col("text"), "utf-8").alias("blob"))
    mv = media.mapInPandas(
        _media_chunk_vec, schema="doc_id long, mvec array<long>"
    )
    j = tv.join(mv, "doc_id")

    zero = F.lit(0).cast("long")
    tc = sum(
        (F.col(f"v{i}") * F.element_at("mvec", i + 1) for i in range(ALIGN_DIMS)),
        zero,
    )
    tt = sum((F.col(f"v{i}") * F.col(f"v{i}") for i in range(ALIGN_DIMS)), zero)
    cc = sum(
        (
            F.element_at("mvec", i + 1) * F.element_at("mvec", i + 1)
            for i in range(ALIGN_DIMS)
        ),
        zero,
    )
    scored = j.select(
        "doc_id", tc.alias("tc"), tt.alias("tt"), cc.alias("cc")
    ).filter((F.col("tt") > 0) & (F.col("cc") > 0))
    return (
        scored.select(
            "doc_id",
            F.when(F.col("doc_id") % 10 == 0, F.lit("image/png"))
            .when(F.col("doc_id") % 10 == 1, F.lit("audio/wav"))
            .otherwise(F.lit("text/plain"))
            .alias("media_type"),
            F.round(
                F.col("tc").cast("double")
                / (F.sqrt(F.col("tt").cast("double")) * F.sqrt(F.col("cc").cast("double"))),
                6,
            ).alias("align_cos"),
        )
        .orderBy("align_cos", "doc_id")
        .limit(10)
    )
