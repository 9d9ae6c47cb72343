"""Property-based tests (hypothesis): multiset semantics of the set
operators must match Python Counter arithmetic for arbitrary inputs — the
engine's UNION ALL fan-in contract (SURVEY.md §2.A row 6) depends on it."""

from __future__ import annotations

from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

small_ints = st.lists(st.integers(min_value=-5, max_value=5), min_size=0, max_size=12)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(xs=small_ints, ys=small_ints)
def test_multiset_set_ops_match_counter(spark, xs, ys):
    a = spark.createDataFrame([(v,) for v in xs] or [(0,)], "v long").limit(len(xs))
    b = spark.createDataFrame([(v,) for v in ys] or [(0,)], "v long").limit(len(ys))
    ca, cb = Counter(xs), Counter(ys)

    got_union = Counter(r.v for r in a.unionByName(b).collect())
    assert got_union == ca + cb  # fan-in keeps duplicates (UNION ALL)

    got_inter = Counter(r.v for r in a.intersectAll(b).collect())
    assert got_inter == ca & cb

    got_except = Counter(r.v for r in a.exceptAll(b).collect())
    assert got_except == ca - cb


edges_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=24), st.integers(min_value=0, max_value=24)
    ),
    min_size=1,
    max_size=30,
)


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(edges=edges_strategy)
def test_connected_components_match_union_find(spark, edges):
    """large-star/small-star must resolve arbitrary graphs (self-loops,
    parallel edges, chains, cliques) identically to a reference union-find
    with min-id labels."""
    from pipes_spark.operators.components import connected_components

    # reference: union-find over the same edge list
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    nodes = set()
    for a, b in edges:
        if a != b:
            union(a, b)
            nodes.update((a, b))
    if not nodes:
        return  # only self-loops: no pair graph to resolve
    roots: dict[int, int] = {}
    for n in nodes:
        roots.setdefault(find(n), n)
        roots[find(n)] = min(roots[find(n)], n)
    expected = {n: roots[find(n)] for n in nodes}

    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r.id: r.component for r in connected_components(pairs).collect()}
    assert got == expected
