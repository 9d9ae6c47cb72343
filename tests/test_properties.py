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
