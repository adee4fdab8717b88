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

    Built with transform over index positions — JVM-side, no UDF:
    shingle_i = tokens[i] .. tokens[i+n-1] for i in [0, len-n].

    Documents shorter than n tokens yield an EMPTY array — guarded
    explicitly because Spark's sequence(0, -1) returns the descending
    [0, -1] (not empty), which would both crash slice(toks, 0, n) and
    fabricate a short bogus shingle.
    """
    toks = tokens(col)
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
        ),
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
