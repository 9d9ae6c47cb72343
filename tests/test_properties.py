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


asof_left = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),    # by-group
        st.integers(min_value=0, max_value=50),   # on (integer time)
    ),
    min_size=1,
    max_size=15,
)
asof_right = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),
        st.integers(min_value=0, max_value=50),
        st.floats(min_value=-5, max_value=5, allow_nan=False),
    ),
    min_size=1,
    max_size=15,
    unique_by=lambda t: (t[0], t[1]),  # unique (by, on) aligns collapse rules
)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(lrows=asof_left, rrows=asof_right, direction=st.sampled_from(["backward", "forward"]),
       tol=st.sampled_from([None, 0, 5, 20]))
def test_asof_join_matches_pandas_merge_asof(spark, lrows, rrows, direction, tol):
    """The union+window as-of join must agree with pandas merge_asof for
    arbitrary inputs, both directions, with and without tolerance.
    Right (by, on) keys are unique so both engines' tie-collapse rules
    coincide; merge_asof tolerance on integer keys is inclusive, matching
    the operator's ``age <= tolerance`` contract (integer columns are
    interpreted as second-scale in the operator, so tolerance_seconds=N
    means N integer units)."""
    import pandas as pd

    from pipes_spark.operators.relational import asof_join

    left = spark.createDataFrame([(i, k, t) for i, (k, t) in enumerate(lrows)], "lid long, k long, t long")
    right = spark.createDataFrame(rrows, "k long, t long, rv double")
    got = {
        r.lid: r.asof_rv
        for r in asof_join(
            left, right, on="t", by=["k"], value_cols=["rv"],
            direction=direction, tolerance_seconds=tol,
        ).collect()
    }
    lp = pd.DataFrame([(i, k, t) for i, (k, t) in enumerate(lrows)], columns=["lid", "k", "t"]).sort_values("t", kind="stable")
    rp = pd.DataFrame(rrows, columns=["k", "t", "rv"]).sort_values("t", kind="stable")
    want_df = pd.merge_asof(
        lp, rp, on="t", by="k", direction=direction,
        tolerance=None if tol is None else tol,
    )
    want = {int(r.lid): (None if pd.isna(r.rv) else float(r.rv)) for r in want_df.itertuples()}
    assert got == want


# ---------------------------------------------------------------------------
# round-4 operator properties
# ---------------------------------------------------------------------------


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=6),  # score (small domain -> ties)
            st.booleans(),
        ),
        min_size=2,
        max_size=25,
    )
)
def test_auc_matches_naive_pairwise(spark, rows):
    """Grouped rank-sum AUC == the O(P·N) pairwise definition."""
    from pyspark.sql import functions as F

    from pipes_spark.operators.linear_model import auc_roc

    df = spark.createDataFrame(
        [(float(s), int(y)) for s, y in rows], "s double, y int"
    )
    got = auc_roc(df, F.col("y") == 1, F.col("s")).collect()[0].auc
    pos = [s for s, y in rows if y]
    neg = [s for s, y in rows if not y]
    if not pos or not neg:
        assert got is None
        return
    wins = sum(1.0 for p in pos for n in neg if p > n)
    ties = sum(1.0 for p in pos for n in neg if p == n)
    assert got == round((wins + 0.5 * ties) / (len(pos) * len(neg)), 6)


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    ids=st.sets(st.integers(min_value=0, max_value=10_000), min_size=1, max_size=40),
    shard_size=st.integers(min_value=1, max_value=7),
)
def test_shard_assignment_is_a_bijection_onto_prefix(spark, ids, shard_size):
    """Every row gets exactly one (shard, pos); the flattened indexes are
    exactly 0..n-1 (a permutation, no gaps, no dupes)."""
    from pipes_spark.operators.sampling import shard_assignment

    df = spark.createDataFrame([(i,) for i in sorted(ids)], "doc_id long")
    out = shard_assignment(df, "doc_id", shard_size).collect()
    assert len(out) == len(ids)
    flat = sorted(r.shard * shard_size + r.shard_pos for r in out)
    assert flat == list(range(len(ids)))


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(edges=edges_strategy, hops=st.integers(min_value=1, max_value=4))
def test_shortest_paths_match_python_bfs(spark, edges, hops):
    from pipes_spark.operators.components import shortest_paths

    edges = [(a, b) for a, b in edges if a != b] or [(0, 1)]
    df = spark.createDataFrame(edges, "src long, dst long")
    verts = sorted({v for e in edges for v in e})
    landmarks = verts[:2]
    got = {
        (r.vertex, r.landmark): r.distance
        for r in shortest_paths(df, landmarks, max_hops=hops).collect()
    }
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    expected = {}
    for lm in landmarks:
        dist = {lm: 0}
        frontier = [lm]
        for d in range(1, hops + 1):
            nxt = []
            for u in frontier:
                for v in adj.get(u, ()):
                    if v not in dist:
                        dist[v] = d
                        nxt.append(v)
            frontier = nxt
        for v, d in dist.items():
            expected[(v, lm)] = d
    assert got == expected


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    vals=st.lists(st.integers(min_value=-8, max_value=12), min_size=1, max_size=20),
    target=st.integers(min_value=-3, max_value=3),
)
def test_cusum_closed_form_equals_recursion(spark, vals, target):
    """prefix-min closed form == the literal S_n = max(0, S_{n-1}+x-t-k)
    recursion; integer inputs make both float- and decimal-exact."""
    import datetime

    from pipes_spark.operators.timeseries import cusum

    base = datetime.datetime(2024, 1, 1)
    rows = [
        ("k", base + datetime.timedelta(minutes=i), float(v), i)
        for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double, i long")
    got = [
        r.cusum
        for r in cusum(
            df, ["k"], "ts", "v", target=float(target), slack=1.0,
            threshold=5.0, tiebreak_col="i",
        ).orderBy("i").collect()
    ]
    s, expected = 0.0, []
    for v in vals:
        s = max(0.0, s + v - target - 1.0)
        expected.append(round(s, 6))
    assert got == expected


_streams = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),   # user
        st.integers(min_value=0, max_value=40),  # minute offset
        st.sampled_from(["a", "b", "c"]),        # type
    ),
    min_size=2,
    max_size=30,
)


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=_streams)
def test_sequence_bigrams_match_path_transitions(spark, rows):
    """sequence_ngrams(n=2) must agree with path_transitions counts on
    arbitrary per-user streams (ties broken by the same unique key)."""
    from datetime import datetime, timedelta

    from pipes_spark.operators.relational import path_transitions, sequence_ngrams

    t0 = datetime(2024, 1, 1)
    data = [(u, t0 + timedelta(minutes=m), ty, i)
            for i, (u, m, ty) in enumerate(rows)]
    df = spark.createDataFrame(
        data, "user_id long, ts timestamp, event_type string, event_id long")
    grams = {(r["step1"], r["step2"]): r["n"]
             for r in sequence_ngrams(df, "user_id", "ts", "event_type", n=2,
                                      order_tiebreak="event_id").collect()}
    trans = {(r["from_type"], r["to_type"]): r["n"]
             for r in path_transitions(df, "user_id", "ts", "event_type",
                                       order_tiebreak="event_id").collect()}
    assert grams == trans


_days = st.lists(
    st.tuples(st.integers(min_value=0, max_value=2),
              st.integers(min_value=1, max_value=25)),
    min_size=1,
    max_size=25,
)


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=_days)
def test_activity_streak_invariants(spark, rows):
    """Σ streak lengths = distinct active days; longest ≤ active days;
    streak count ≥ 1 for every active user — for arbitrary day sets."""
    from datetime import datetime

    from pipes_spark.operators.relational import activity_streaks

    data = [(u, datetime(2024, 1, d, 12)) for u, d in rows]
    df = spark.createDataFrame(data, "user_id long, ts timestamp")
    per_user_days = {}
    for u, d in rows:
        per_user_days.setdefault(u, set()).add(d)
    got = {r["user_id"]: r for r in activity_streaks(df, "user_id", "ts").collect()}
    assert set(got) == set(per_user_days)
    for u, days in per_user_days.items():
        r = got[u]
        assert r["n_active_days"] == len(days)
        assert 1 <= r["longest_streak"] <= r["n_active_days"]
        # independent streak count: runs of consecutive days
        ds = sorted(days)
        runs = 1 + sum(1 for a, b in zip(ds, ds[1:]) if b - a > 1)
        assert r["n_streaks"] == runs


pii_texts = st.lists(
    st.one_of(
        st.text(
            alphabet="abcdefghij @.-+()0123456789",
            min_size=0,
            max_size=60,
        ),
        st.just("reach me at bob.lee@site.example.org today"),
        st.just("call +1 (415) 555-0134 or 172.16.254.3 now"),
    ),
    min_size=1,
    max_size=8,
)


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(texts=pii_texts)
def test_redact_pii_is_idempotent_and_leaves_no_matches(spark, texts):
    """Redaction is a fixed point: redacting already-redacted text changes
    nothing, and no PII pattern matches the output."""
    import re as _re

    from pyspark.sql import functions as F

    from pipes_spark.operators.text import PII_PATTERNS, redact_pii

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id bigint, text string"
    )
    once = redact_pii(df, "text", "r1")
    twice = redact_pii(once.select("id", F.col("r1").alias("text")), "text", "r2")
    for row in twice.collect():
        assert row["r2"] == row["text"]  # fixed point
        for pat in PII_PATTERNS.values():
            assert not _re.search(pat, row["r2"])
