"""Property test: word_shingles (arrays_zip-of-shifted-slices form,
round 5) vs a trivial Python reference — including empty strings,
single tokens, consecutive spaces (empty tokens), and n > len."""

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

texts = st.lists(
    st.text(alphabet="ab ", min_size=0, max_size=12),
    min_size=1,
    max_size=8,
)


def py_shingles(text: str, n: int) -> list:
    toks = text.split(" ")
    if len(toks) < n:
        return []
    return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(batch=texts, n=st.integers(min_value=2, max_value=4))
def test_word_shingles_match_python(spark, batch, n):
    from spark_lineage_spark.functions.text_funcs import word_shingles

    df = spark.createDataFrame([(i, t) for i, t in enumerate(batch)], "i long, t string")
    got = {
        r.i: list(r.s) for r in df.select("i", word_shingles(F.col("t"), n).alias("s")).collect()
    }
    expected = {i: py_shingles(t, n) for i, t in enumerate(batch)}
    assert got == expected
