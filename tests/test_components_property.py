"""Property test: the shared min-label component fixpoint
(_min_label_components, used by both lexical and semantic dedup) vs a
Python union-find on hypothesis-generated edge lists — including
disconnected nodes, self-referencing chains, and long paths."""

from hypothesis import HealthCheck, given, settings, strategies as st

edges_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=14),
        st.integers(min_value=0, max_value=14),
    ).filter(lambda p: p[0] != p[1]),
    min_size=1,
    max_size=20,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(edges=edges_strategy)
def test_components_match_union_find(spark, edges):
    from spark_lineage_spark.operators.dedup import _min_label_components

    pairs = spark.createDataFrame(
        [(min(a, b), max(a, b)) for a, b in edges], "da long, db long"
    ).distinct()
    got = {r.node: r.label for r in _min_label_components(pairs).collect()}

    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent[find(a)] = find(b)
    comp = {}
    for n in parent:
        comp.setdefault(find(n), []).append(n)
    expected = {n: min(members) for members in comp.values() for n in members}
    assert got == expected
