"""Round-5 operator tests: boilerplate n-gram stats, DSIR importance
weights, PII redaction."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_boilerplate_flags_frequent_bigram(spark):
    """A bigram present in most documents is boilerplate; documents made of
    unique vocabulary score zero."""
    from pipes_spark.operators.text import boilerplate_ngram_stats

    rows = [(i, f"visit our site today unique{i} word{i}") for i in range(8)]
    rows.append((8, "completely different tokens here"))
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {
        r["doc_id"]: r
        for r in boilerplate_ngram_stats(df, n=2, min_doc_frac=0.5).collect()
    }
    # the 8 templated docs share 'visit our'/'our site'/'site today' (df=8/9)
    for i in range(8):
        assert out[i]["boiler_grams"] == 3
        assert 0 < out[i]["boiler_ratio"] < 1
    assert out[8]["boiler_grams"] == 0 and out[8]["boiler_ratio"] == 0.0


def test_dsir_importance_ranks_target_like_docs_higher(spark):
    """Documents written in the target style must out-score off-domain
    documents, and n_bigrams is len(tokens)-1."""
    from pipes_spark.operators.text import dsir_importance

    target_style = "alpha beta gamma delta alpha beta"
    other_style = "omega psi chi phi omega psi"
    rows = [(i, target_style) for i in range(5)] + [
        (i + 5, other_style) for i in range(5)
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    target = df.filter(F.col("doc_id") < 5)
    out = {r["doc_id"]: r for r in dsir_importance(df, target).collect()}
    assert all(out[i]["n_bigrams"] == 5 for i in out)
    on_domain = min(out[i]["log_importance"] for i in range(5))
    off_domain = max(out[i]["log_importance"] for i in range(5, 10))
    assert on_domain > off_domain


def test_redact_pii_replaces_all_patterns(spark):
    """Email, phone, and IPv4 all collapse to typed placeholders; clean
    text passes through untouched."""
    from pipes_spark.operators.text import redact_pii

    df = spark.createDataFrame(
        [
            (1, "mail jane.doe@corp.example.com or call +1 (555) 867-5309 now"),
            (2, "server at 192.168.10.20 responded"),
            (3, "nothing sensitive here"),
        ],
        "id bigint, text string",
    )
    got = {r["id"]: r["redacted"] for r in redact_pii(df).collect()}
    assert "<EMAIL>" in got[1] and "<PHONE>" in got[1]
    assert "jane.doe" not in got[1] and "867" not in got[1]
    assert got[2] == "server at <IPV4> responded"
    assert got[3] == "nothing sensitive here"


def test_count_min_overestimates_and_merges(spark):
    """CM estimates never undercount, equal exact counts in the
    collision-free regime, and sketches merge: merge(sk(A), sk(B)) is
    byte-identical to the sketch of A∪B."""
    from pipes_spark.operators.rollup import (
        count_min_estimate,
        count_min_merge,
        count_min_sketch,
    )

    rows = [(i % 10,) for i in range(100)] + [(99,)] * 50
    df = spark.createDataFrame(rows, "item bigint")
    sk = count_min_sketch(df, "item", depth=4, width=512)
    items = df.select("item").distinct()
    est = {
        r["item"]: r["cm_estimate"]
        for r in count_min_estimate(items, sk, "item", depth=4, width=512).collect()
    }
    exact = {i: 10 for i in range(10)}
    exact[99] = 50
    for item, cnt in exact.items():
        assert est[item] >= cnt
    # 11 items in 512 buckets: expect the collision-free exact regime
    assert est == exact

    # a never-seen item estimates 0 (left join + coalesce), not a dropped
    # row or a collided positive count
    unseen = spark.createDataFrame([(123456,)], "item bigint")
    got = count_min_estimate(unseen, sk, "item", depth=4, width=512).collect()
    assert len(got) == 1 and got[0]["cm_estimate"] == 0

    a = df.filter(F.col("item") < 5)
    b = df.filter(F.col("item") >= 5)
    merged = count_min_merge(
        count_min_sketch(a, "item", depth=4, width=512),
        count_min_sketch(b, "item", depth=4, width=512),
    )
    want = {
        (r["seed"], r["bucket"]): r["cnt"] for r in sk.collect()
    }
    got = {(r["seed"], r["bucket"]): r["cnt"] for r in merged.collect()}
    assert got == want


def test_trajectory_jaccard_pairs_golden(spark):
    """Hand-computed footprints: overlap ratio exact, disjoint pairs and
    sub-threshold pairs excluded, duplicate visits to a cell count once."""
    from pipes_spark.operators.geo import trajectory_jaccard_pairs

    rows = [
        (1, 10), (1, 11), (1, 12), (1, 12),   # user 1: {10, 11, 12}
        (2, 11), (2, 12), (2, 13),            # user 2: {11, 12, 13}
        (3, 99),                               # user 3: disjoint
        (4, 10), (4, 50), (4, 51), (4, 52), (4, 53), (4, 54), (4, 55),
        (4, 56), (4, 57), (4, 58),            # user 4: 1 shared of 10 -> J=1/12
    ]
    df = spark.createDataFrame(rows, "user_id bigint, cell bigint")
    got = {
        (r["id_a"], r["id_b"]): (r["shared_cells"], r["jaccard"])
        for r in trajectory_jaccard_pairs(df, threshold=0.5).collect()
    }
    assert got == {(1, 2): (2, 0.5)}  # |{11,12}| / |{10,11,12,13}|
    # lower threshold surfaces the weak pair too, never the disjoint one
    low = {
        (r["id_a"], r["id_b"])
        for r in trajectory_jaccard_pairs(df, threshold=0.05).collect()
    }
    assert (1, 4) in low and (1, 2) in low
    assert not any(3 in p for p in low)


def test_trajectory_hot_cell_gate(spark):
    """max_cell_posting drops only hot-cell-mediated candidates: a pair
    sharing a quiet cell still surfaces (with exact sizes), a pair whose
    ONLY shared cell is hot is missed — the documented lossy trade."""
    from pipes_spark.operators.geo import trajectory_jaccard_pairs

    hot = [(u, 1) for u in range(1, 7)]           # cell 1: 6 visitors
    quiet = [(1, 2), (2, 2)]                       # users 1,2 also share cell 2
    df = spark.createDataFrame(hot + quiet, "user_id bigint, cell bigint")
    gated = {
        (r["id_a"], r["id_b"]): r["shared_cells"]
        for r in trajectory_jaccard_pairs(
            df, threshold=0.01, max_cell_posting=3
        ).collect()
    }
    # only (1,2) survives, via the quiet cell; its shared count is the
    # gated lower bound (1, not 2)
    assert gated == {(1, 2): 1}
    full = {
        (r["id_a"], r["id_b"])
        for r in trajectory_jaccard_pairs(df, threshold=0.01).collect()
    }
    assert len(full) == 15  # all C(6,2) pairs without the gate


def test_kmv_union_mergeable_property():
    """KMV mergeability: the k smallest hashes of A∪B are recoverable from
    the per-set k-smallest sketches alone (no raw data re-read)."""
    import hashlib

    def h(x):
        return int(hashlib.md5(str(x).encode()).hexdigest()[:14], 16)

    A = [h(i) for i in range(300)]
    B = [h(i) for i in range(150, 450)]
    k = 64
    merged = sorted(set(sorted(A)[:k]) | set(sorted(B)[:k]))[:k]
    direct = sorted(set(A) | set(B))[:k]
    assert merged == direct


def test_kmv_overlap_estimates_and_exact_fallback(spark):
    """Sets below k report their exact distinct count; larger sets estimate
    within KMV error bounds; the intersect row is inclusion–exclusion of
    the other three."""
    from pipes_spark.operators.rollup import kmv_overlap

    rows = [("a", i) for i in range(40)] + [("b", i) for i in range(20, 520)]
    df = spark.createDataFrame(rows, "s string, key bigint")
    out = {r["set_name"]: r for r in kmv_overlap(df, "s", "key", k=64).collect()}
    assert set(out) == {"a", "b", "union", "intersect"}
    assert out["a"]["n_exact"] == 40 and out["a"]["est"] == 40.0
    assert out["b"]["n_exact"] == 500
    assert abs(out["b"]["est"] - 500) / 500 < 0.5  # ~1/sqrt(64) noise + slack
    assert out["union"]["n_exact"] == 520
    assert out["intersect"]["n_exact"] == 20
    assert (
        abs(
            out["intersect"]["est"]
            - round(out["a"]["est"] + out["b"]["est"] - out["union"]["est"], 6)
        )
        < 1e-9
    )


def test_concurrency_gauge_peak_carry_and_inclusive_ends(spark):
    """Peak counts an end and a start at the same instant as overlapping;
    buckets with no boundary are not emitted (carry-in rides the close
    column); the final bucket closes at zero."""
    import datetime as dt

    from pipes_spark.operators.timeseries import concurrency_gauge

    def T(h, m=0):
        return dt.datetime(2024, 1, 1, h, m)

    rows = [
        (T(10, 0), T(12, 30)),   # spans hour 11 with no boundary there
        (T(10, 15), T(10, 45)),
        (T(10, 45), T(12, 10)),  # starts exactly when the previous ends
    ]
    df = spark.createDataFrame(rows, "s timestamp, e timestamp")
    out = {
        r["bucket"]: r for r in concurrency_gauge(df, "s", "e", "hour").collect()
    }
    assert set(out) == {T(10), T(12)}
    assert out[T(10)]["peak_concurrency"] == 3  # 10:45: open + ending + starting
    assert out[T(10)]["close_concurrency"] == 2
    assert out[T(12)]["peak_concurrency"] == 2
    assert out[T(12)]["close_concurrency"] == 0


def test_cm_join_cardinality_never_undercounts_and_exact_when_collision_free(spark):
    """Inner-product estimate ≥ exact always; with width >> distinct keys
    (no collisions) the estimate IS the exact join size."""
    from pipes_spark.operators.rollup import count_min_join_cardinality

    a = spark.createDataFrame(
        [(i % 5,) for i in range(50)], "k bigint"
    )  # f_A = 10 each of 0..4
    b = spark.createDataFrame([(i % 3,) for i in range(9)], "k bigint")
    # exact = sum over shared keys {0,1,2}: 10*3 = 90
    wide = count_min_join_cardinality(a, "k", b, "k", depth=4, width=4096).first()
    assert wide["exact_join"] == 90
    assert wide["est_join"] == 90
    narrow = count_min_join_cardinality(a, "k", b, "k", depth=2, width=2).first()
    assert narrow["est_join"] >= narrow["exact_join"] == 90


def test_fellegi_sunter_em_numpy_parity_and_separation(spark):
    """Distributed EM must match a numpy reference bit-for-bit at every
    round (DECIMAL-exact M-step sums), and the fitted posterior must
    separate a planted match/non-match mixture."""
    import numpy as np

    from pipes_spark.operators.linear_model import (
        fellegi_sunter_scores,
        fit_fellegi_sunter,
    )

    rows = []
    for i in range(300):
        match = i < 90
        f1 = 1 if (match and i % 9 != 0) or (not match and i % 7 == 0) else 0
        f2 = 1 if (match and i % 6 != 0) or (not match and i % 10 == 0) else 0
        rows.append((i, match, f1, f2))
    df = spark.createDataFrame(rows, "pid bigint, is_match boolean, f1 int, f2 int")
    m, u, p = fit_fellegi_sunter(df, ["f1", "f2"], iters=6)

    g = np.array([[r[2], r[3]] for r in rows], dtype=float)
    mm, uu, pp = np.array([0.9, 0.9]), np.array([0.1, 0.1]), 0.1
    eps = 1e-6
    for _ in range(6):
        lw = (g * np.log(mm) + (1 - g) * np.log(1 - mm)).sum(axis=1)
        lv = (g * np.log(uu) + (1 - g) * np.log(1 - uu)).sum(axis=1)
        w, v = pp * np.exp(lw), (1 - pp) * np.exp(lv)
        gam = np.round(w / (w + v), 12)
        sg = gam.sum()
        pp = min(max(sg / len(g), eps), 1 - eps)
        mm = np.clip((gam[:, None] * g).sum(axis=0) / max(sg, eps), eps, 1 - eps)
        uu = np.clip(
            ((1 - gam)[:, None] * g).sum(axis=0) / max(len(g) - sg, eps),
            eps,
            1 - eps,
        )
    assert np.allclose(m, mm, atol=1e-9) and np.allclose(u, uu, atol=1e-9)
    assert abs(p - pp) < 1e-9

    scored = fellegi_sunter_scores(df, ["f1", "f2"], m, u, p).collect()
    hi = {r["pid"] for r in scored if r["match_posterior"] > 0.5}
    planted = {r[0] for r in rows if r[1]}
    # both agreement fields planted at ~85% for matches vs ~12% for rest:
    # the two-field posterior cannot be perfect, but must be discriminative
    overlap = len(hi & planted) / max(len(planted), 1)
    assert overlap > 0.6
    false_rate = len(hi - planted) / max(len(hi), 1)
    assert false_rate < 0.4


def test_phrase_search_overlaps_boundaries_and_case(spark):
    """Overlapping matches count individually; matching is
    case-insensitive; phrase split across docs never matches; positions
    survive leading whitespace."""
    from pipes_spark.operators.text import phrase_search, positional_postings

    df = spark.createDataFrame(
        [
            (1, "A a a a"),          # 'a a' overlaps 3x
            (2, "  b c"),            # leading whitespace, 'b c' once
            (3, "b"),                # phrase tail missing
            (4, "c b"),              # wrong order
        ],
        "doc_id bigint, text string",
    )
    p = positional_postings(df)
    aa = {r["doc_id"]: r["n_occurrences"] for r in phrase_search(p, ["a", "a"]).collect()}
    assert aa == {1: 3}
    bc = {r["doc_id"]: r["n_occurrences"] for r in phrase_search(p, ["B", "C"]).collect()}
    assert bc == {2: 1}


def test_proximity_search_window_and_order(spark):
    """Either order matches; pairs outside the window don't; a doc with
    only one of the terms never appears."""
    from pipes_spark.operators.text import positional_postings, proximity_search

    df = spark.createDataFrame(
        [
            (1, "x y z q w x"),   # x@0, x@5 ; y@1 → pairs (0,1) d=1, (5,1) d=4
            (2, "y a b c d e x"), # y@0, x@6 → d=6 outside w=4
            (3, "x only here"),
        ],
        "doc_id bigint, text string",
    )
    p = positional_postings(df)
    out = {r["doc_id"]: r for r in proximity_search(p, "x", "y", 4).collect()}
    assert set(out) == {1}
    assert out[1]["n_pairs"] == 2 and out[1]["min_distance"] == 1


def test_incremental_cc_equals_full_recompute(spark):
    """CC(assign(E1) ⊕ E2) must equal CC(E1 ∪ E2) exactly — merges across
    old clusters, brand-new nodes, and untouched clusters passing through
    unrecomputed."""
    from pipes_spark.operators.components import (
        connected_components,
        connected_components_incremental,
    )

    e1 = [(1, 2), (2, 3), (10, 11), (20, 21), (30, 31)]
    e2 = [(3, 10), (40, 41), (11, 20)]  # merge {1..3}+{10,11}+{20,21}; new {40,41}
    df1 = spark.createDataFrame(e1, "id_a bigint, id_b bigint")
    df2 = spark.createDataFrame(e2, "id_a bigint, id_b bigint")
    assign = connected_components(df1)
    inc = connected_components_incremental(assign, df2)
    full = connected_components(df1.unionByName(df2))
    assert sorted(map(tuple, inc.collect())) == sorted(map(tuple, full.collect()))
    # untouched cluster {30,31} rides through with its original label
    got = {r["id"]: r["component"] for r in inc.collect()}
    assert got[30] == 30 and got[31] == 30
    # merged clusters adopt the global min id
    assert got[20] == 1 and got[11] == 1
    assert got[40] == 40 and got[41] == 40


def test_table_diff_statuses_null_safety_and_column_counts(spark):
    """NULL→value and value→NULL both count as changes; added/removed keys
    classify correctly; per-column counts tally changed rows only."""
    from pipes_spark.operators.profiling import table_diff

    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, None, 20.0), (3, "c", None), (4, "d", 40.0)],
        "k bigint, x string, y double",
    )
    new = spark.createDataFrame(
        [(1, "a", 10.0), (2, "B", 20.0), (3, "c", 30.0), (5, "e", 50.0)],
        "k bigint, x string, y double",
    )
    out = {r["status"]: r for r in table_diff(old, new, ["k"]).collect()}
    assert out["unchanged"]["n_rows"] == 1          # key 1
    assert out["changed"]["n_rows"] == 2            # keys 2 (x), 3 (y)
    assert out["removed"]["n_rows"] == 1            # key 4
    assert out["added"]["n_rows"] == 1              # key 5
    assert out["changed"]["chg_x"] == 1 and out["changed"]["chg_y"] == 1
    assert out["added"]["chg_x"] == 0 and out["removed"]["chg_y"] == 0


def test_isotonic_pav_matches_hand_fit_and_is_monotone(spark):
    """PAV on a known violator sequence pools exactly as the textbook fit;
    the calibrated values are non-decreasing in score; ties share one
    value."""
    from pipes_spark.operators.linear_model import isotonic_calibration

    # scores 1..6 with labels 0,1,1,0,0,1: PAV pools (2,3,4,5) -> 0.5
    rows = [(1.0, 0.0), (2.0, 1.0), (3.0, 1.0), (4.0, 0.0), (5.0, 0.0), (6.0, 1.0)]
    df = spark.createDataFrame(rows, "s double, y double")
    out = (
        isotonic_calibration(df, "s", "y")
        .orderBy("_score")
        .collect()
    )
    got = [r["calibrated"] for r in out]
    assert got == [0.0, 0.5, 0.5, 0.5, 0.5, 1.0]
    # ties on score collapse to one pooled value
    df2 = spark.createDataFrame(
        [(1.0, 0.0), (1.0, 1.0), (2.0, 1.0)], "s double, y double"
    )
    out2 = isotonic_calibration(df2, "s", "y").orderBy("_score", "_y").collect()
    assert out2[0]["calibrated"] == out2[1]["calibrated"] == 0.5
    assert out2[2]["calibrated"] == 1.0


def test_huber_location_numpy_parity_and_robustness(spark):
    """The distributed IRLS matches a numpy reference to float tolerance,
    and a gross outlier that drags the mean barely moves the Huber
    estimate."""
    import numpy as np

    from pipes_spark.operators.profiling import huber_location

    vals = [1.0, 1.2, 0.8, 1.1, 0.9, 1.05, 0.95, 100.0]  # one gross outlier
    df = spark.createDataFrame([("a", v) for v in vals], "g string, v double")
    got = huber_location(df, "g", "v", iters=8).first()

    x = np.array(vals)
    med = np.percentile(x, 50)
    s = 1.4826 * np.percentile(np.abs(x - med), 50)
    mu = x.mean()
    for _ in range(8):
        r = np.abs(x - mu)
        thr = 1.345 * max(s, 1e-12)
        w = np.where(r <= thr, 1.0, thr / r)
        mu = (w * x).sum() / w.sum()
    assert abs(got["huber_mean"] - round(mu, 6)) < 1e-6
    assert abs(got["scale"] - round(s, 6)) < 1e-6
    plain_mean = x.mean()  # ~13.4
    assert abs(got["huber_mean"] - 1.0) < 0.2 and plain_mean > 10
    # lazy-construction contract: building the plan fires no job
    tracker = spark.sparkContext.statusTracker()
    group = "huber-lazy"
    spark.sparkContext.setJobGroup(group, "huber")
    huber_location(df, "g", "v", iters=4)
    spark.sparkContext.setJobGroup("idle", "idle")
    assert not tracker.getJobIdsForGroup(group)


def test_changepoint_finds_planted_mean_shift(spark):
    """A series with a clean level shift at t=10 must split exactly there
    with a large SSE drop; a flat series reports drop_ratio 0 (or a split
    with no gain)."""
    from pipes_spark.operators.timeseries import changepoint_binary

    rows = [("a", t, 10.0 if t <= 10 else 30.0) for t in range(1, 21)]
    rows += [("flat", t, 7.0) for t in range(1, 21)]
    df = spark.createDataFrame(rows, "k string, t int, y double")
    out = {r["k"]: r for r in changepoint_binary(df, "k", "t", "y").collect()}
    assert out["a"]["change_point"] == 10
    assert out["a"]["sse_split"] == 0.0 and out["a"]["drop_ratio"] == 1.0
    assert out["flat"]["sse_nochange"] == 0.0 and out["flat"]["drop_ratio"] is None


def test_multiprobe_lsh_recall_dominates_single_probe(spark, sf_dir):
    """On the SAME (tables, planes) budget, probing Hamming-1 buckets must
    reach recall >= the single-probe path, strictly widening the candidate
    set on this corpus; both stay valid top-k (scores descend)."""
    from pipes_spark.operators.similarity import (
        cosine_topk,
        lsh_cosine_topk,
    )
    from pipes_spark.sources import load_table, parquet_list_width

    emb = load_table(spark, sf_dir, "embeddings")
    dim = parquet_list_width(f"{sf_dir}/embeddings.parquet", "embedding")
    q = emb.filter("vec_id < 12")
    exact = cosine_topk(emb, q, k=5, dim=dim)
    truth = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}

    def recall(multiprobe):
        got = lsh_cosine_topk(
            emb, q, k=5, dim=dim, num_tables=2, num_planes=6,
            multiprobe=multiprobe,
        )
        hits = {(r["query_id"], r["neighbor_id"]) for r in got.collect()}
        return len(hits & truth) / len(truth)

    r0, r1 = recall(0), recall(6)
    assert r1 >= r0
    assert r1 >= 0.3  # 2 tables × 7 probed buckets on the toy corpus


def test_mann_kendall_direction_and_scipy_free_parity(spark):
    """A strictly increasing series has S = n(n-1)/2 and large positive z;
    a constant series has S = 0, var 0-from-ties handled, z = 0; the
    tie-corrected variance matches the closed form."""
    from pipes_spark.operators.profiling import mann_kendall_trend

    rows = [("up", t, float(t)) for t in range(1, 11)]
    rows += [("const", t, 5.0) for t in range(1, 11)]
    df = spark.createDataFrame(rows, "k string, t int, y double")
    out = {r["k"]: r for r in mann_kendall_trend(df, "k", "t", "y").collect()}
    n = 10
    assert out["up"]["s_stat"] == n * (n - 1) // 2 == 45
    var = n * (n - 1) * (2 * n + 5) / 18.0
    assert abs(out["up"]["var_s"] - round(var, 6)) < 1e-9
    assert abs(out["up"]["z"] - round((45 - 1) / var**0.5, 6)) < 1e-9
    # all-tied series: tie term cancels the variance entirely, S = 0
    assert out["const"]["s_stat"] == 0 and out["const"]["var_s"] == 0.0
    assert out["const"]["z"] == 0.0


def test_fdr_bh_matches_statsmodels_convention(spark):
    """BH adjusted p-values equal the textbook step-up (monotone envelope
    of p*m/rank), and rejection at alpha matches the largest-k rule."""
    from pipes_spark.operators.profiling import fdr_bh

    ps = [0.01, 0.02, 0.03, 0.2, 0.9]
    df = spark.createDataFrame(
        [(f"t{i}", p) for i, p in enumerate(ps)], "test string, p double"
    )
    out = {r["test"]: r for r in fdr_bh(df, "p", "test", alpha=0.05).collect()}
    m = len(ps)
    # hand step-up: raw = [0.05, 0.05, 0.05, 0.25, 0.9]; envelope keeps them
    assert out["t0"]["p_adj"] == 0.05 and out["t2"]["p_adj"] == 0.05
    assert out["t3"]["p_adj"] == 0.25 and out["t4"]["p_adj"] == 0.9
    assert out["t0"]["reject"] and out["t1"]["reject"] and out["t2"]["reject"]
    assert not out["t3"]["reject"] and not out["t4"]["reject"]


def test_quantile_normalize_equalizes_group_marginals(spark):
    """Two equal-size groups with different scales get IDENTICAL sorted
    normalized sequences (the defining QN property), and the map is
    monotone within each group."""
    from pipes_spark.operators.features import quantile_normalize

    rows = [("a", i, float(i)) for i in range(1, 21)]
    rows += [("b", 100 + i, 1000.0 + 5 * i) for i in range(1, 21)]
    df = spark.createDataFrame(rows, "g string, id bigint, v double")
    out = quantile_normalize(df, "g", "v", "id").collect()
    by_g = {}
    for r in out:
        by_g.setdefault(r["g"], []).append((r["v"], r["qnorm"]))
    qa = [q for _, q in sorted(by_g["a"])]
    qb = [q for _, q in sorted(by_g["b"])]
    assert qa == qb                      # shared marginal
    assert qa == sorted(qa)              # monotone
    assert qa[0] < qa[-1]


def test_cliffs_delta_known_values_and_magnitude(spark):
    """Fully separated groups give delta = +/-1 ('large'); identical
    groups give 0 ('negligible'); a hand case matches the pair count."""
    from pyspark.sql import functions as F

    from pipes_spark.operators.profiling import cliffs_delta

    sep = spark.createDataFrame(
        [(1, 10.0), (1, 11.0), (0, 1.0), (0, 2.0)], "g int, v double"
    )
    r = cliffs_delta(sep, F.col("g") == 1, F.col("v")).first()
    assert r["cliffs_delta"] == 1.0 and r["magnitude"] == "large"
    same = spark.createDataFrame(
        [(1, 5.0), (1, 7.0), (0, 5.0), (0, 7.0)], "g int, v double"
    )
    r2 = cliffs_delta(same, F.col("g") == 1, F.col("v")).first()
    assert r2["cliffs_delta"] == 0.0 and r2["magnitude"] == "negligible"
    # hand case: x={1,3}, y={2}: pairs (1<2):-1, (3>2):+1 → delta 0
    hand = spark.createDataFrame(
        [(1, 1.0), (1, 3.0), (0, 2.0)], "g int, v double"
    )
    r3 = cliffs_delta(hand, F.col("g") == 1, F.col("v")).first()
    assert r3["cliffs_delta"] == 0.0


def test_nelson_aalen_hand_computed_and_km_relation(spark):
    """Hand case with censoring: hazard increments skip censored exits but
    shrink the risk set; H <= -ln(S) pointwise (x <= -ln(1-x)), both
    close."""
    import math

    from pipes_spark.operators.timeseries import kaplan_meier, nelson_aalen

    # durations: events at 1 (d=1/n=5), censor at 2, events at 3 (d=2/n=3)
    rows = [(1, 1), (2, 0), (3, 1), (3, 1), (4, 0)]
    df = spark.createDataFrame(rows, "dur int, e int")
    na = {r["duration"]: r for r in nelson_aalen(df, "dur", "e").collect()}
    assert na[1]["n_risk"] == 5 and abs(na[1]["cum_hazard"] - 0.2) < 1e-9
    assert na[2]["cum_hazard"] == na[1]["cum_hazard"]  # censor adds nothing
    assert abs(na[3]["cum_hazard"] - round(0.2 + 2 / 3, 6)) < 1e-9
    assert abs(na[3]["hazard_var"] - round(1 / 25 + 2 / 9, 6)) < 1e-9
    km = {r["duration"]: r["survival"] for r in kaplan_meier(df, "dur", "e").collect()}
    for t in (1, 3):
        assert na[t]["cum_hazard"] <= -math.log(km[t]) + 1e-9


def test_skyline_dominance_hand_case_and_tie_survival(spark):
    """Hand frontier: dominated points drop (strictly cheaper with >= qty,
    or equal cost with strictly more), exact duplicates both survive
    (mutually non-dominating)."""
    from pipes_spark.operators.relational import skyline_2d

    rows = [
        ("g", 1.0, 10.0, 1),   # frontier
        ("g", 2.0, 10.0, 2),   # dominated by id1 (costlier, same qty)
        ("g", 2.0, 20.0, 3),   # frontier
        ("g", 2.0, 15.0, 4),   # dominated by id3 (same cost, more qty)
        ("g", 3.0, 30.0, 5),   # frontier
        ("g", 1.0, 10.0, 6),   # duplicate of id1: both survive
    ]
    df = spark.createDataFrame(rows, "grp string, price double, qty double, id int")
    got = {r["id"] for r in skyline_2d(df, ["grp"], "price", "qty", "id").collect()}
    assert got == {1, 3, 5, 6}


def test_postings_table_append_is_delta_only_and_idempotent(spark, sf_dir):
    """append_postings indexes only unseen docs, re-appending a batch adds
    zero rows, and phrase search over the table equals the fresh-postings
    result."""
    from pipes_spark.operators.text import phrase_search, positional_postings
    from pipes_spark.sources import load_table
    from pipes_spark.warehouse import (
        _tag,
        append_postings,
        clear_stale_location,
        postings_table,
    )

    # self-contained: a previous run of this test appended to the shared
    # warehouse table — rebuild from scratch so the delta is predictable
    name = f"postings_documents_{_tag(sf_dir)}"
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    clear_stale_location(spark, name)
    base = postings_table(spark, sf_dir)
    n0 = base.count()
    docs = load_table(spark, sf_dir, "documents")
    old_doc = docs.limit(1)
    new_doc = spark.createDataFrame(
        [(10_000_001, "table scan table scan", "en", "t", 21)],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    batch = old_doc.unionByName(new_doc)
    t1 = append_postings(spark, sf_dir, batch)
    assert t1.count() == n0 + 4  # only the new doc's 4 tokens
    t2 = append_postings(spark, sf_dir, batch)  # replay: zero new rows
    assert t2.count() == n0 + 4
    got = {
        r["doc_id"]: r["n_occurrences"]
        for r in phrase_search(t2, ["table", "scan"]).collect()
        if r["doc_id"] == 10_000_001
    }
    fresh = phrase_search(positional_postings(new_doc), ["table", "scan"]).first()
    assert got[10_000_001] == fresh["n_occurrences"] == 2
