"""Text expression helpers: tokens, shingles, marker scoring.

Token/shingle definitions are shared between the Spark operators and
their DuckDB oracles — both engines must build the exact same sets
for Jaccard/fingerprint comparisons to align.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# whitespace tokens (documents.text is space-separated)
def tokens(col) -> Column:
    return F.split(col, " ")


def word_shingles(col, n: int = 3) -> Column:
    """n-gram word shingles as space-joined strings.

    Built JVM-side, no UDF, and with O(1) array operations per
    DOCUMENT: arrays_zip of n shifted slices (slice i covers tokens
    [i, len-n+i]), then one concat_ws per position over the zipped
    structs. The previous per-position form (transform over an index
    sequence, slice+array_join per shingle) did O(n) allocations per
    position — measured 4× slower at sf0.1 (1.6s vs 0.4s for the
    3-gram corpus explode, identical output).

    Documents shorter than n tokens yield an EMPTY array — guarded
    explicitly because slice() with a non-positive length raises under
    ANSI.
    """
    toks = tokens(col)
    width = F.size(toks) - (n - 1)
    zipped = F.arrays_zip(*[F.slice(toks, i + 1, width) for i in range(n)])
    return F.when(
        F.size(toks) >= n,
        F.transform(zipped, lambda s: F.concat_ws(" ", *[s[str(i)] for i in range(n)])),
    ).otherwise(F.array().cast("array<string>"))


# marker vocabularies for the lang-id heuristic (public stopword lists)
LANG_MARKERS = {
    "en": ["the", "a", "of", "and", "to", "in", "is"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein"],
    "es": ["el", "los", "de", "que", "es", "una"],
    "fr": ["le", "les", "et", "est", "que", "une"],
}


def marker_count(toks, markers: list[str]) -> Column:
    """Count of tokens in the marker vocabulary (duplicates counted)."""

    def pred(t):
        expr = t == markers[0]
        for m in markers[1:]:
            expr = expr | (t == m)
        return expr

    return F.size(F.filter(toks, pred))
