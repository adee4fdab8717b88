"""Property test (SURVEY §7 M2 hard spot): the as-of join's
union+window implementation vs a brute-force reference on
hypothesis-generated data — tie-breaking and direction pinned.
"""

from hypothesis import HealthCheck, given, settings, strategies as st

rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),   # key
        st.integers(min_value=0, max_value=20),  # time
    ),
    min_size=0,
    max_size=25,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(build=rows, probe=rows)
def test_asof_matches_bruteforce(spark, build, probe):
    from spark_lineage_spark.operators.joins import asof_join

    bdf = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(build)] or [(99, -1, -1)],
        "k int, t int, bid int",
    )
    pdf = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(probe)] or [(98, -1, -1)],
        "k int, t int, pid int",
    )
    got = {
        r.pid: r.asof_bid
        for r in asof_join(pdf, bdf, "k", "t", "t", "pid", "bid").collect()
    }

    # brute force: greatest (t, bid) with t <= probe t, same key
    bl = [(k, t, i) for i, (k, t) in enumerate(build)] or [(99, -1, -1)]
    pl = [(k, t, i) for i, (k, t) in enumerate(probe)] or [(98, -1, -1)]
    for pk, pt, pid in pl:
        cands = [(t, i) for k, t, i in bl if k == pk and t <= pt]
        expect = max(cands)[1] if cands else None
        assert got[pid] == expect, (pk, pt, pid, cands, got[pid])
