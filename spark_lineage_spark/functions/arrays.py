"""Array/vector expression helpers — JVM-side, codegen-friendly.

Everything here builds Column expressions from built-in higher-order
functions (no Python UDFs in the hot path — SURVEY.md §2.11 "100 TB
posture"). float32 embedding components are cast to double before
arithmetic so accumulation runs in float64 on every engine.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def to_double_array(col) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot(a, b) -> Column:
    """Σ a_i·b_i via zip_with + aggregate (left fold, deterministic)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a, b) -> Column:
    """Cosine similarity of two double arrays."""
    return dot(a, b) / (norm(a) * norm(b))


def l2_normalize(a) -> Column:
    n = norm(a)
    return F.transform(a, lambda x: x / n)
