"""Semantic assertions for the profiling, clustering (k-means / SemDeDup),
EWMA, rolling z-score, chunking, and weighted-sampling operators — the
non-SQL-expressible ones get their correctness here (CLAUDE.md step 2)."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from pipes_spark.operators.clustering import (
    assign_clusters,
    kmeans_cluster_stats,
    kmeans_fit,
    kmeans_init,
    semantic_dedup_keep,
    semantic_dedup_pairs,
)
from pipes_spark.operators.profiling import linear_fit, profile_table
from pipes_spark.operators.sampling import weighted_sample
from pipes_spark.operators.text import chunk_token_windows
from pipes_spark.operators.timeseries import ewma, rolling_zscore, zscore_outliers
from pipes_spark.sources import load_table

SF001 = "/root/testdata/sf0.01"


# ---------------------------------------------------------------------------
# k-means
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def embeddings(spark):
    return load_table(spark, SF001, "embeddings")


def _numpy_lloyd(X, C0, iters, round_decimals=12):
    """Driver-side replica of kmeans_fit's exact algorithm: spherical Lloyd
    from the same init, means over exact (math.fsum) member sums."""
    Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-300)
    C = [list(c) for c in C0]
    k = len(C)
    for _ in range(iters):
        M = np.array(C)
        Mn = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-300)
        assign = (Xn @ Mn.T).argmax(axis=1)
        newC = []
        for j in range(k):
            members = Xn[assign == j]
            if len(members) == 0:
                newC.append(C[j])
                continue
            m = np.array([math.fsum(members[:, d]) for d in range(Xn.shape[1])])
            m = m / len(members)
            norm = max(float(np.linalg.norm(m)), 1e-300)
            newC.append([round(x / norm, round_decimals) for x in m])
        C = newC
    return np.array(C)


def test_kmeans_fit_matches_numpy_lloyd(spark, embeddings):
    rows = embeddings.select("vec_id", "embedding").collect()
    ids = np.array([r[0] for r in rows])
    X = np.vstack([np.asarray(r[1], dtype="float64") for r in rows])

    C_spark = np.array(kmeans_fit(embeddings, k=6, iters=3, seed=42))

    C0 = kmeans_init(embeddings, 6, seed=42)
    C_np = _numpy_lloyd(X, C0, iters=3)
    # the exact decimal sums in Spark and fsum in numpy should agree to
    # ~1e-12 (both are exact; the division + rounding step is shared)
    assert C_spark.shape == C_np.shape
    np.testing.assert_allclose(C_spark, C_np, atol=1e-9)


def test_kmeans_cluster_stats_invariants(spark, embeddings):
    C = kmeans_fit(embeddings, k=6, iters=2, seed=42)
    stats = kmeans_cluster_stats(embeddings, C).collect()
    total = sum(r["n_members"] for r in stats)
    assert total == embeddings.count()
    for r in stats:
        assert 0 <= r["cluster_id"] < 6
        assert -1.0 - 1e-9 <= r["avg_cosine"] <= 1.0 + 1e-9
    # spherical k-means on real data: members should lean toward their
    # centroid, not away
    assert all(r["avg_cosine"] > 0 for r in stats)


def test_assign_clusters_nearest(spark, embeddings):
    C = kmeans_fit(embeddings, k=4, iters=2, seed=7)
    got = assign_clusters(embeddings, C).select("vec_id", "cluster_id").collect()
    rows = embeddings.select("vec_id", "embedding").collect()
    vecs = {r[0]: np.asarray(r[1], dtype="float64") for r in rows}
    M = np.array(C)
    Mn = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-300)
    for r in got:
        x = vecs[r["vec_id"]]
        xn = x / max(np.linalg.norm(x), 1e-300)
        assert r["cluster_id"] == int((xn @ Mn.T).argmax())


# ---------------------------------------------------------------------------
# SemDeDup
# ---------------------------------------------------------------------------


def test_semantic_dedup_pairs_match_bruteforce(spark, embeddings):
    C = kmeans_fit(embeddings, k=4, iters=3, seed=42)
    got = {
        (r["id_a"], r["id_b"]): r["cos_sim"]
        for r in semantic_dedup_pairs(embeddings, C, threshold=0.3).collect()
    }

    rows = embeddings.select("vec_id", "embedding").collect()
    ids = [r[0] for r in rows]
    X = np.vstack([np.asarray(r[1], dtype="float64") for r in rows])
    Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-300)
    M = np.array(C)
    Mn = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-300)
    assign = (Xn @ Mn.T).argmax(axis=1)
    S = Xn @ Xn.T
    expected = {}
    n = len(ids)
    for i in range(n):
        for j in range(n):
            if ids[i] < ids[j] and assign[i] == assign[j]:
                s = round(float(S[i, j]), 6)
                # stay clear of the round-6 threshold boundary: a pair at
                # exactly 0.3±1e-6 can legitimately flip on float order
                if s >= 0.300001:
                    expected[(ids[i], ids[j])] = s
    core_got = {k: v for k, v in got.items() if v >= 0.300001}
    assert set(core_got) == set(expected)
    for k in expected:
        assert abs(core_got[k] - expected[k]) <= 2e-6


def test_semantic_dedup_keep_partition(spark, embeddings):
    C = kmeans_fit(embeddings, k=4, iters=2, seed=42)
    kept = semantic_dedup_keep(embeddings, C, threshold=0.3)
    kept_ids = {r["vec_id"] for r in kept.select("vec_id").collect()}
    pairs = semantic_dedup_pairs(embeddings, C, threshold=0.3).collect()
    losers = {r["id_b"] for r in pairs}
    all_ids = {r["vec_id"] for r in embeddings.select("vec_id").collect()}
    assert kept_ids == all_ids - losers
    # the anti-join dropped every loser and nothing else
    assert losers.isdisjoint(kept_ids)


# ---------------------------------------------------------------------------
# profiling
# ---------------------------------------------------------------------------


def test_profile_table_full_width(spark):
    orders = load_table(spark, SF001, "orders")
    prof = {
        r["column"]: r
        for r in profile_table(
            orders, ["o_orderkey", "o_totalprice", "o_orderdate", "o_orderstatus"]
        ).collect()
    }
    n = orders.count()
    assert set(prof) == {"o_orderkey", "o_totalprice", "o_orderdate", "o_orderstatus"}
    assert all(r["n_rows"] == n for r in prof.values())
    assert prof["o_orderkey"]["n_nulls"] == 0
    assert prof["o_orderkey"]["n_distinct"] == n  # primary key
    exp_min = orders.agg(F.min("o_totalprice")).first()[0]
    assert float(prof["o_totalprice"]["min_value"]) == pytest.approx(exp_min)


def test_profile_table_approx_mode(spark):
    orders = load_table(spark, SF001, "orders")
    prof = {
        r["column"]: r for r in profile_table(orders, ["o_custkey"], approx=True).collect()
    }
    exact = orders.select("o_custkey").distinct().count()
    # HLL++ default rsd is 5%
    assert prof["o_custkey"]["n_distinct"] == pytest.approx(exact, rel=0.15)


def test_linear_fit_recovers_exact_line(spark):
    rows = [(g, float(x), 2.0 * x + 1.0) for g in ("a", "b") for x in range(10)]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    got = {r["g"]: r for r in linear_fit(df, ["g"], F.col("x"), F.col("y")).collect()}
    for g in ("a", "b"):
        assert got[g]["slope"] == pytest.approx(2.0)
        assert got[g]["intercept"] == pytest.approx(1.0)
        assert got[g]["r2"] == pytest.approx(1.0)
        assert got[g]["n_points"] == 10


def test_linear_fit_degenerate_groups(spark):
    rows = [("flat", 1.0, 5.0), ("flat", 1.0, 7.0), ("flat", 1.0, 9.0),
            ("tiny", 1.0, 2.0), ("tiny", 2.0, 4.0)]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    got = {r["g"]: r for r in linear_fit(df, ["g"], F.col("x"), F.col("y")).collect()}
    assert got["flat"]["slope"] is None  # zero x-variance
    assert got["tiny"]["slope"] is None  # below min_points


# ---------------------------------------------------------------------------
# EWMA / rolling z-score
# ---------------------------------------------------------------------------


def test_ewma_golden(spark):
    vals = [10.0, 20.0, 30.0, 40.0]
    df = spark.createDataFrame(
        [(1, i, v) for i, v in enumerate(vals)], "k int, i int, v double"
    )
    out = {
        r["i"]: r["v_ewma"]
        for r in ewma(df, ["k"], "i", "v", alpha=0.5, span=2, out_col="v_ewma").collect()
    }
    # finite-impulse EWMA, weights 1, .5, .25 renormalized over available lags
    assert out[0] == pytest.approx(10.0)
    assert out[1] == pytest.approx((20 + 0.5 * 10) / 1.5)
    assert out[2] == pytest.approx((30 + 0.5 * 20 + 0.25 * 10) / 1.75)
    assert out[3] == pytest.approx((40 + 0.5 * 30 + 0.25 * 20) / 1.75)


def test_ewma_constant_series_is_identity(spark):
    df = spark.createDataFrame([(1, i, 7.5) for i in range(20)], "k int, i int, v double")
    out = ewma(df, ["k"], "i", "v", alpha=0.3, span=12, out_col="e").collect()
    assert all(r["e"] == pytest.approx(7.5) for r in out)


def test_rolling_zscore_golden(spark):
    vals = [10.0, 12.0, 11.0, 9.0, 10.0, 11.0, 50.0]
    df = spark.createDataFrame(
        [(1, i, v) for i, v in enumerate(vals)], "k int, i int, v double"
    )
    out = {
        r["i"]: r
        for r in rolling_zscore(df, ["k"], "i", "v", lookback=10, min_periods=3).collect()
    }
    hist = vals[:6]
    mean = sum(hist) / len(hist)
    std = math.sqrt(sum((x - mean) ** 2 for x in hist) / (len(hist) - 1))
    assert out[6]["roll_avg"] == pytest.approx(mean, abs=1e-6)
    assert out[6]["roll_std"] == pytest.approx(std, abs=1e-6)
    assert out[6]["zscore"] == pytest.approx((50.0 - mean) / std, abs=1e-5)
    assert out[0]["zscore"] is None  # no history
    assert out[1]["zscore"] is None  # below min_periods


def test_zscore_outliers_flags_spike_only(spark):
    base = [(1, i, 10.0 + (i % 3)) for i in range(30)]
    spike = [(1, 30, 500.0)]
    df = spark.createDataFrame(base + spike, "k int, i int, v double")
    out = zscore_outliers(df, ["k"], "i", "v", threshold=3.0, lookback=20, min_periods=5)
    got = [r["i"] for r in out.collect()]
    assert got == [30]


def test_rolling_zscore_constant_history_no_nan(spark):
    df = spark.createDataFrame([(1, i, 5.0) for i in range(15)], "k int, i int, v double")
    out = rolling_zscore(df, ["k"], "i", "v", lookback=10, min_periods=3).collect()
    # zero variance → zscore NULL (never NaN), roll_std 0
    assert all(r["zscore"] is None for r in out)
    assert all(r["roll_std"] in (None, 0.0) for r in out)


# ---------------------------------------------------------------------------
# chunking
# ---------------------------------------------------------------------------


def test_chunk_token_windows_covers_and_reconstructs(spark):
    docs = load_table(spark, SF001, "documents").limit(50)
    chunks = chunk_token_windows(docs, max_tokens=32, stride=24).collect()
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    by_doc: dict[int, list] = {}
    for r in chunks:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, text in texts.items():
        toks = [t for t in text.split() if t]
        if not toks:
            assert doc_id not in by_doc
            continue
        rows = sorted(by_doc[doc_id], key=lambda r: r["chunk_id"])
        # starts advance by the stride; every chunk is within budget
        assert [r["start_token"] for r in rows] == [24 * i for i in range(len(rows))]
        assert all(r["chunk_tokens"] <= 32 for r in rows)
        # stitching the non-overlapping prefixes reconstructs the doc exactly
        rebuilt: list[str] = []
        for r in rows:
            piece = r["chunk_text"].split()
            assert len(piece) == r["chunk_tokens"]
            assert r["start_token"] <= len(rebuilt)  # no gaps between chunks
            rebuilt.extend(piece[len(rebuilt) - r["start_token"]:])
        assert rebuilt == toks
        # overlap contract: consecutive chunks share max_tokens - stride
        for prev, cur in zip(rows, rows[1:]):
            prev_toks = prev["chunk_text"].split()
            cur_toks = cur["chunk_text"].split()
            overlap = prev["start_token"] + len(prev_toks) - cur["start_token"]
            if overlap > 0:
                assert prev_toks[-overlap:] == cur_toks[:overlap]


def test_chunk_token_windows_short_doc_single_chunk(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    rows = chunk_token_windows(df, max_tokens=32, stride=24).collect()
    assert len(rows) == 1
    assert rows[0]["chunk_text"] == "a b c"
    assert rows[0]["chunk_tokens"] == 3


# ---------------------------------------------------------------------------
# weighted sampling
# ---------------------------------------------------------------------------


def test_weighted_sample_extremes_and_monotonicity(spark):
    docs = load_table(spark, SF001, "documents").select("doc_id")
    n = docs.count()
    assert weighted_sample(docs, "doc_id", F.lit(1.0)).count() == n
    assert weighted_sample(docs, "doc_id", F.lit(0.0)).count() == 0
    low = {r["doc_id"] for r in weighted_sample(docs, "doc_id", F.lit(0.3)).collect()}
    high = {r["doc_id"] for r in weighted_sample(docs, "doc_id", F.lit(0.8)).collect()}
    assert low <= high  # same hash, higher threshold ⇒ superset
    assert len(low) == pytest.approx(0.3 * n, rel=0.25)
    assert len(high) == pytest.approx(0.8 * n, rel=0.15)


# ---------------------------------------------------------------------------
# product quantization ANN
# ---------------------------------------------------------------------------


def test_pq_adc_recall_and_exact_rerank(spark, embeddings):
    from pipes_spark.operators.similarity import (
        cosine_topk,
        fit_pq_codebooks,
        pq_adc_topk,
    )

    books = fit_pq_codebooks(embeddings, m=8, num_codes=64, iters=5)
    qs = embeddings.filter(F.col("vec_id") % 100 == 0)
    got = pq_adc_topk(embeddings, qs, books, k=5, oversample=8).collect()
    exact = cosine_topk(embeddings, qs, k=5).collect()

    got_map = {(r["query_id"], r["neighbor_id"]): r["cosine"] for r in got}
    exact_map = {(r["query_id"], r["neighbor_id"]): r["cosine"] for r in exact}
    # overlapping pairs carry bit-identical cosines (exact rerank)
    shared = set(got_map) & set(exact_map)
    assert shared, "no overlap at all — PQ routing is broken"
    for key in shared:
        assert got_map[key] == exact_map[key]
    # recall@5 against brute force
    by_q_got: dict[int, set] = {}
    by_q_exact: dict[int, set] = {}
    for q, n in got_map:
        by_q_got.setdefault(q, set()).add(n)
    for q, n in exact_map:
        by_q_exact.setdefault(q, set()).add(n)
    hits = sum(len(by_q_got[q] & by_q_exact[q]) for q in by_q_exact)
    total = sum(len(v) for v in by_q_exact.values())
    assert hits / total >= 0.5, f"recall {hits}/{total}"


def test_pq_encode_shapes_and_reconstruction(spark, embeddings):
    from pipes_spark.operators.similarity import fit_pq_codebooks, pq_encode

    books = fit_pq_codebooks(embeddings, m=8, num_codes=64, iters=3)
    enc = pq_encode(embeddings, books).collect()
    assert all(len(r["pq_code"]) == 8 for r in enc)
    assert all(0 <= c < 64 for r in enc for c in r["pq_code"])
    assert all(r["pq_norm"] > 0 for r in enc)
    # the reconstruction is a real approximation of the vector: its norm is
    # within a factor of the true norm for every row
    rows = embeddings.select("vec_id", "embedding").collect()
    true_norm = {r[0]: float(np.linalg.norm(np.asarray(r[1], dtype="float64"))) for r in rows}
    for r in enc:
        assert 0.3 * true_norm[r["vec_id"]] < r["pq_norm"] < 3.0 * true_norm[r["vec_id"]]


# ---------------------------------------------------------------------------
# histogram / per-group reservoir
# ---------------------------------------------------------------------------


def test_histogram_partitions_rows(spark):
    from pipes_spark.operators.profiling import histogram

    ev = load_table(spark, SF001, "events").select("event_type", "value")
    out = histogram(ev, F.col("value"), 50.0, ["event_type"]).collect()
    assert sum(r["n"] for r in out) == ev.count()
    for r in out:
        assert r["bin_lo"] <= r["bin_min"] <= r["bin_max"] < r["bin_lo"] + 50.0


def test_reservoir_per_group_exact_k_and_deterministic(spark):
    from pipes_spark.operators.sampling import reservoir_per_group

    ev = load_table(spark, SF001, "events").select("event_id", "event_type")
    a = reservoir_per_group(ev, ["event_type"], "event_id", 7).collect()
    b = reservoir_per_group(ev, ["event_type"], "event_id", 7).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    sizes: dict[str, int] = {}
    for r in a:
        sizes[r["event_type"]] = sizes.get(r["event_type"], 0) + 1
    totals = {r["event_type"]: r["cnt"] for r in
              ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    for t, n in sizes.items():
        assert n == min(7, totals[t])
    # independent salts draw different samples
    c = {tuple(r) for r in reservoir_per_group(ev, ["event_type"], "event_id", 7, salt="x").collect()}
    assert c != {tuple(r) for r in a}


# ---------------------------------------------------------------------------
# MAD outliers / quantile bins
# ---------------------------------------------------------------------------


def test_mad_outliers_robust_to_contamination(spark):
    from pipes_spark.operators.profiling import mad_outliers

    # 40 inliers around 10, 3 extreme outliers; mean/σ would be dragged,
    # the MAD baseline is not
    rows = [("a", i, 10.0 + (i % 5) * 0.1) for i in range(40)]
    rows += [("a", 100 + i, 1000.0 + i) for i in range(3)]
    df = spark.createDataFrame(rows, "g string, id int, v double")
    out = mad_outliers(df, ["g"], "v", threshold=3.5)
    got = sorted(r["id"] for r in out.collect())
    assert got == [100, 101, 102]


def test_mad_outliers_constant_group_no_rows(spark):
    from pipes_spark.operators.profiling import mad_outliers

    df = spark.createDataFrame([("a", i, 5.0) for i in range(10)], "g string, id int, v double")
    assert mad_outliers(df, ["g"], "v").count() == 0  # MAD 0 → NULL z → filtered


def test_quantile_bins_equal_frequency(spark):
    from pipes_spark.operators.profiling import quantile_bins

    df = spark.createDataFrame([(i, float(i)) for i in range(100)], "id int, v double")
    out = {r["bin"]: r for r in quantile_bins(df, "v", "id", n_bins=10).collect()}
    assert set(out) == set(range(1, 11))
    assert all(r["n_rows"] == 10 for r in out.values())
    # bins are ordered and disjoint
    for b in range(1, 10):
        assert out[b]["hi"] < out[b + 1]["lo"]


def test_zscore_bucketed_equals_global(spark):
    from datetime import datetime, timedelta

    from pipes_spark.operators.timeseries import (
        rolling_zscore,
        rolling_zscore_bucketed,
    )

    # sparse buckets: 4 rows/day for 30 days → every frame (lookback 50)
    # spans MANY buckets, exercising the multi-bucket tail path
    rows = []
    t0 = datetime(2024, 1, 1)
    for i in range(120):
        rows.append(("k", i, t0 + timedelta(days=i // 4, hours=i % 4), float((i * 37) % 100)))
    df = spark.createDataFrame(rows, "g string, id int, ts timestamp, v double")

    glob = rolling_zscore(df, ["g"], ["ts", "id"], "v", lookback=50, min_periods=10)
    buck = rolling_zscore_bucketed(
        df, ["g"], ["ts", "id"], "v", lookback=50, min_periods=10
    )
    g = {r["id"]: (r["roll_avg"], r["roll_std"], r["zscore"]) for r in glob.collect()}
    b = {r["id"]: (r["roll_avg"], r["roll_std"], r["zscore"]) for r in buck.collect()}
    assert g == b  # exact row-for-row equality, including NULL warm-up rows


def test_zscore_bucketed_equals_global_on_events(spark):
    from pipes_spark.operators.timeseries import (
        rolling_zscore,
        rolling_zscore_bucketed,
    )

    ev = load_table(spark, SF001, "events").select("event_id", "event_type", "value", "ts")
    glob = rolling_zscore(ev, ["event_type"], ["ts", "event_id"], "value")
    buck = rolling_zscore_bucketed(ev, ["event_type"], ["ts", "event_id"], "value")
    g = {r["event_id"]: (r["roll_avg"], r["roll_std"], r["zscore"]) for r in glob.collect()}
    b = {r["event_id"]: (r["roll_avg"], r["roll_std"], r["zscore"]) for r in buck.collect()}
    assert g == b


# ---------------------------------------------------------------------------
# duplicated spans / streaming dedup store
# ---------------------------------------------------------------------------


def test_duplicated_span_guarantee(spark):
    from pipes_spark.operators.dedup import duplicated_span_pairs

    shared = "the quick brown fox jumps over the lazy dog tonight"  # 51 chars
    rows = [
        (1, "alpha beta " + shared + " gamma delta epsilon zeta"),
        (2, "unrelated prefix words " + shared + " and a different tail"),
        (3, "completely different content with no overlap whatsoever here"),
        (4, "another totally unrelated document body for the test corpus"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r["id_a"], r["id_b"]) for r in duplicated_span_pairs(df, min_shared=2).collect()}
    assert (1, 2) in got  # ≥23-char shared substring ⇒ guaranteed detection
    assert all(p == (1, 2) for p in got)  # and nothing else


def test_stream_dedup_store_cross_batch(spark, tmp_path):
    import os

    from pipes_spark.streaming import stream_dedup_against_store

    # two parquet files → two micro-batches (maxFilesPerTrigger=1); the
    # duplicate of doc 1 arrives in the SECOND batch and must be rejected
    # by the store, not by any in-batch or watermark mechanism
    d = str(tmp_path / "docs_in")
    os.makedirs(d)
    spark.createDataFrame(
        [(1, "hello world"), (2, "other text")], "doc_id long, text string"
    ).coalesce(1).write.parquet(d + "/b1")
    spark.createDataFrame(
        [(10, "HELLO   world"), (11, "fresh content")], "doc_id long, text string"
    ).coalesce(1).write.parquet(d + "/b2")
    flat = str(tmp_path / "flat")
    os.makedirs(flat)
    i = 0
    for sub in ("b1", "b2"):
        for f in sorted(os.listdir(d + "/" + sub)):
            if f.endswith(".parquet"):
                os.symlink(f"{d}/{sub}/{f}", f"{flat}/{i:02d}.parquet")
                i += 1
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(flat)
    )
    admitted = stream_dedup_against_store(stream, "text", "doc_id")
    ids = sorted(r["doc_id"] for r in admitted.collect())
    # 10 is a normalized duplicate of 1 (case/whitespace) → rejected
    assert ids == [1, 2, 11]


def test_prefix_jaccard_equals_full_join(spark):
    from pipes_spark.operators.dedup import ngram_jaccard_pairs, prefix_jaccard_pairs

    docs = load_table(spark, SF001, "documents")
    full = {(r["id_a"], r["id_b"]): r["jaccard"] for r in ngram_jaccard_pairs(docs, threshold=0.2).collect()}
    pref = {(r["id_a"], r["id_b"]): r["jaccard"] for r in prefix_jaccard_pairs(docs, threshold=0.2).collect()}
    assert full == pref  # prefix filter is lossless — identical exact output


# ---------------------------------------------------------------------------
# logistic regression
# ---------------------------------------------------------------------------


def test_logistic_matches_numpy_gd(spark, embeddings):
    from pipes_spark.operators.linear_model import fit_logistic

    w_spark = np.array(fit_logistic(embeddings, (F.col("label") < 5).cast("int"), iters=5))

    rows = embeddings.select("embedding", "label").collect()
    X = np.vstack([np.asarray(r[0], dtype="float64") for r in rows])
    y = (np.array([r[1] for r in rows]) < 5).astype(float)
    w = np.zeros(X.shape[1] + 1)
    for _ in range(5):
        z = X @ w[:-1] + w[-1]
        p = 1.0 / (1.0 + np.exp(-z))
        r = p - y
        G = np.hstack([X * r[:, None], r[:, None]])
        g = np.array([math.fsum(G[:, j]) for j in range(G.shape[1])]) / len(X)
        w = np.round(w - 1.0 * g, 12)
    np.testing.assert_allclose(w_spark, w, atol=1e-9)


def test_logistic_beats_baseline(spark, embeddings):
    from pipes_spark.operators.linear_model import fit_logistic, predict_logistic

    y = (F.col("label") < 5).cast("int")
    w = fit_logistic(embeddings, y, iters=20, lr=1.0)
    scored = predict_logistic(embeddings, w).withColumn("actual", y)
    n = scored.count()
    correct = scored.filter(F.col("pred") == F.col("actual")).count()
    assert correct / n >= 0.58  # majority baseline is ~0.51


def test_logistic_deterministic_across_runs(spark, embeddings):
    from pipes_spark.operators.linear_model import fit_logistic

    y = (F.col("label") < 5).cast("int")
    a = fit_logistic(embeddings.repartition(3), y, iters=3)
    b = fit_logistic(embeddings.repartition(11), y, iters=3)
    assert a == b  # decimal gradient sums: partitioning-independent


def test_ivfpq_recall_and_exact_rerank(spark, embeddings):
    from pipes_spark.operators.similarity import (
        cosine_topk,
        fit_ivfpq,
        ivfpq_topk,
    )

    C, books = fit_ivfpq(embeddings, num_lists=8, m=8, num_codes=64, iters=5)
    qs = embeddings.filter(F.col("vec_id") % 100 == 0)
    got = ivfpq_topk(embeddings, qs, C, books, k=5, n_probe=6, oversample=8).collect()
    exact = cosine_topk(embeddings, qs, k=5).collect()
    got_map = {(r["query_id"], r["neighbor_id"]): r["cosine"] for r in got}
    exact_map = {(r["query_id"], r["neighbor_id"]): r["cosine"] for r in exact}
    shared = set(got_map) & set(exact_map)
    assert shared
    for key in shared:
        assert got_map[key] == exact_map[key]  # bit-identical rerank
    by_q_got: dict[int, set] = {}
    by_q_exact: dict[int, set] = {}
    for q, nb in got_map:
        by_q_got.setdefault(q, set()).add(nb)
    for q, nb in exact_map:
        by_q_exact.setdefault(q, set()).add(nb)
    hits = sum(len(by_q_got.get(q, set()) & by_q_exact[q]) for q in by_q_exact)
    total = sum(len(v) for v in by_q_exact.values())
    assert hits / total >= 0.4, f"recall {hits}/{total}"


def test_ivfpq_encode_layout(spark, embeddings):
    from pipes_spark.operators.similarity import fit_ivfpq, ivfpq_encode

    C, books = fit_ivfpq(embeddings, num_lists=8, m=8, num_codes=64, iters=3)
    enc = ivfpq_encode(embeddings, C, books).collect()
    assert all(0 <= r["list_id"] < 8 for r in enc)
    assert all(len(r["pq_code"]) == 8 for r in enc)
    # residual reconstruction ≈ unit vector: recon norms near 1
    assert all(0.5 < r["recon_norm"] < 1.5 for r in enc)


def test_tfidf_cosine_pairs_matches_numpy(spark):
    from pipes_spark.operators.text import tfidf_cosine_pairs

    docs = load_table(spark, SF001, "documents").limit(80)
    got = {
        (r["id_a"], r["id_b"]): r["cos_sim"]
        for r in tfidf_cosine_pairs(docs, threshold=0.5).collect()
    }
    rows = docs.select("doc_id", "text").collect()
    n_docs = len(rows)
    from collections import Counter, defaultdict

    tf = {r["doc_id"]: Counter(t for t in r["text"].split() if t) for r in rows}
    dfreq = Counter()
    for c in tf.values():
        dfreq.update(c.keys())
    w = {
        d: {t: round(cnt * math.log(n_docs / dfreq[t]), 6) for t, cnt in c.items()}
        for d, c in tf.items()
    }
    ids = sorted(w)
    import numpy as np

    exp = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            shared = set(w[a]) & set(w[b])
            dot = math.fsum(w[a][t] * w[b][t] for t in shared)
            na = math.sqrt(math.fsum(v * v for v in w[a].values()))
            nb = math.sqrt(math.fsum(v * v for v in w[b].values()))
            cs = round(dot / (na * nb), 6)
            if cs >= 0.5:
                exp[(a, b)] = cs
    assert set(got) == set(exp)
    for k in exp:
        assert abs(got[k] - exp[k]) <= 2e-6


def test_containment_catches_embedded_doc(spark):
    from pipes_spark.operators.dedup import containment_pairs

    small = "alpha beta gamma delta epsilon zeta eta theta"
    big = "prefix words here " + small + " and a much longer tail " + \
          "with many additional tokens diluting the symmetric jaccard " + \
          "far below any reasonable near dup threshold for sure " + \
          "plus even more filler content to stretch the container document"
    rows = [(1, small), (2, big), (3, "entirely unrelated text body")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {(r["id_a"], r["id_b"]): r for r in containment_pairs(df, threshold=0.8).collect()}
    assert (1, 2) in out
    r = out[(1, 2)]
    assert r["containment_a_in_b"] >= 0.8  # the small doc is inside the big one
    assert r["jaccard"] < 0.3  # symmetric measure would have missed it


# ---------------------------------------------------------------------------
# content-defined chunking
# ---------------------------------------------------------------------------


def test_cdc_chunks_cover_blob_exactly(spark):
    from pipes_spark.operators.multimodal import binary_assets_from_text, cdc_chunks

    docs = load_table(spark, SF001, "documents").limit(30)
    assets = binary_assets_from_text(docs)
    sizes = {r["asset_id"]: r["meta"]["n_bytes"] for r in assets.collect()}
    rows = cdc_chunks(assets, avg_size=64, min_size=16, max_size=256).collect()
    by_asset: dict[int, list] = {}
    for r in rows:
        by_asset.setdefault(r["asset_id"], []).append(r)
    for aid, chunks in by_asset.items():
        chunks.sort(key=lambda r: r["chunk_idx"])
        # chunks tile the blob exactly: contiguous, complete, size-bounded
        assert chunks[0]["offset"] == 0
        for prev, cur in zip(chunks, chunks[1:]):
            assert cur["offset"] == prev["offset"] + prev["length"]
        assert sum(c["length"] for c in chunks) == sizes[aid]
        assert all(c["length"] <= 256 for c in chunks)


def test_cdc_shift_invariance_beats_fixed_chunking(spark):
    import hashlib

    from pipes_spark.operators.multimodal import cdc_chunks

    base = bytes(bytearray((i * 131 + 17) % 256 for i in range(4000)))
    shifted = b"XYZPREFIX" + base  # 9 inserted bytes at the front
    df = spark.createDataFrame(
        [(1, bytearray(base)), (2, bytearray(shifted))],
        "asset_id long, content binary",
    )
    rows = cdc_chunks(df, avg_size=64, min_size=16, max_size=256).collect()
    h1 = {r["chunk_hash"] for r in rows if r["asset_id"] == 1}
    h2 = {r["chunk_hash"] for r in rows if r["asset_id"] == 2}
    overlap = len(h1 & h2) / len(h1)
    # content-defined boundaries re-align after the insertion: most chunk
    # hashes survive. Fixed-size chunking would share ZERO chunks.
    assert overlap >= 0.7, overlap
    fixed1 = {hashlib.md5(base[i : i + 256]).hexdigest() for i in range(0, len(base), 256)}
    fixed2 = {hashlib.md5(shifted[i : i + 256]).hexdigest() for i in range(0, len(shifted), 256)}
    assert len(fixed1 & fixed2) == 0


def test_operator_argument_guards(spark):
    import pytest as _pt

    from pipes_spark.operators.multimodal import cdc_chunks
    from pipes_spark.operators.profiling import histogram
    from pipes_spark.operators.text import chunk_token_windows
    from pipes_spark.operators.timeseries import ewma, rolling_zscore

    df = spark.createDataFrame([(1, "a b c", 1.0)], "doc_id long, text string, v double")
    with _pt.raises(ValueError):
        chunk_token_windows(df, stride=0)
    with _pt.raises(ValueError):
        ewma(df, ["doc_id"], "doc_id", "v", alpha=0.0)
    with _pt.raises(ValueError):
        ewma(df, ["doc_id"], "doc_id", "v", span=-1)
    with _pt.raises(ValueError):
        rolling_zscore(df, ["doc_id"], "doc_id", "v", lookback=0)
    with _pt.raises(ValueError):
        histogram(df, df.v, 0.0)
    with _pt.raises(ValueError):
        cdc_chunks(df.selectExpr("doc_id as asset_id", "encode(text, 'UTF-8') as content"), min_size=0)


def test_random_projection_preserves_distances(spark, embeddings):
    from pipes_spark.operators.similarity import random_projection

    rows = random_projection(embeddings, out_dim=16, seed=42).select(
        "vec_id", "embedding", "proj"
    ).limit(60).collect()
    X = np.vstack([np.asarray(r["embedding"], dtype="float64") for r in rows])
    P = np.vstack([np.asarray(r["proj"], dtype="float64") for r in rows])
    import itertools

    ratios = []
    for i, j in itertools.islice(itertools.combinations(range(len(rows)), 2), 400):
        d_full = np.linalg.norm(X[i] - X[j])
        d_proj = np.linalg.norm(P[i] - P[j])
        if d_full > 1e-9:
            ratios.append(d_proj / d_full)
    ratios = np.array(ratios)
    # JL at k=16: distances preserved in distribution (mean ratio ≈ 1,
    # individual pairs within a generous band)
    assert 0.85 <= ratios.mean() <= 1.15
    assert (np.abs(ratios - 1.0) < 0.8).all()


def test_random_projection_reproducible(spark, embeddings):
    from pipes_spark.operators.similarity import random_projection

    a = {r["vec_id"]: np.array(r["proj"]) for r in
         random_projection(embeddings.repartition(3), out_dim=8).collect()}
    b = {r["vec_id"]: np.array(r["proj"]) for r in
         random_projection(embeddings.repartition(7), out_dim=8).collect()}
    # same seeded matrix everywhere; BLAS kernel choice varies with the
    # Arrow batch shape, so agreement is to float precision, not the bit —
    # the documented routing-tier contract
    for k in a:
        np.testing.assert_allclose(a[k], b[k], rtol=1e-12, atol=1e-12)


def test_kfold_partitions_rows(spark):
    from pipes_spark.operators.sampling import kfold_assign

    docs = load_table(spark, SF001, "documents").select("doc_id")
    out = kfold_assign(docs, "doc_id", k=5).collect()
    assert len(out) == docs.count()
    folds = {r["fold"] for r in out}
    assert folds <= set(range(5)) and len(folds) == 5
    sizes = [sum(1 for r in out if r["fold"] == f) for f in range(5)]
    assert min(sizes) > 0.5 * max(sizes)  # roughly balanced


def test_negative_samples_contract(spark):
    from pipes_spark.operators.sampling import negative_samples

    docs = load_table(spark, SF001, "documents").select("doc_id")
    out = negative_samples(docs, "doc_id", k=4, salt="t").collect()
    n_docs = docs.count()
    assert len(out) == 4 * n_docs  # exactly k per anchor
    by_anchor: dict[int, list] = {}
    for r in out:
        assert r["negative_id"] != r["anchor_id"]  # never self
        by_anchor.setdefault(r["anchor_id"], []).append(r["negative_id"])
    assert all(len(v) == 4 for v in by_anchor.values())
    # negatives are spread, not degenerate: many distinct rows get drawn
    assert len({nid for v in by_anchor.values() for nid in v}) > n_docs * 0.5


def test_table_diff_classification(spark):
    from pipes_spark.operators.relational import table_diff

    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", None), (4, "d", 40.0)],
        "k long, name string, v double",
    )
    new = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 99.0), (3, "c", None), (5, "e", 50.0)],
        "k long, name string, v double",
    )
    out = {r["k"]: r["diff_status"] for r in table_diff(old, new, ["k"]).collect()}
    assert out == {1: "unchanged", 2: "changed", 3: "unchanged", 4: "removed", 5: "added"}
    # 3 is unchanged despite NULL v on both sides — null-safe comparison


def test_rrf_fuse_semantics(spark):
    from pipes_spark.operators.similarity import rrf_fuse

    r1 = spark.createDataFrame([(10, 1), (20, 2), (30, 3)], "id long, rank long")
    r2 = spark.createDataFrame([(20, 1), (40, 2)], "id long, rank long")
    out = {r["id"]: r["rrf_score"] for r in rrf_fuse([r1, r2], k=60).collect()}
    assert out[20] == pytest.approx(round(1 / 62 + 1 / 61, 6))  # in both lists
    assert out[10] == pytest.approx(round(1 / 61, 6))
    assert out[40] == pytest.approx(round(1 / 62, 6))
    assert set(out) == {10, 20, 30, 40}
    # item present in both rankings outranks single-list items at worse ranks
    assert out[20] > out[10] > out[30]


def test_silhouette_separated_vs_overlapping(spark):
    import numpy as np

    from pipes_spark.operators.clustering import silhouette_stats

    rng = np.random.RandomState(2)

    def blob(center, n=60, spread=0.05):
        return center + rng.randn(n, 4) * spread

    tight = np.vstack([blob(np.array(c)) for c in
                       ([5, 0, 0, 0], [0, 5, 0, 0], [0, 0, 5, 0])])
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(tight)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = [[5, 0, 0, 0], [0, 5, 0, 0], [0, 0, 5, 0]]
    got = {r["cluster_id"]: r for r in silhouette_stats(df, cents).collect()}
    assert got[-1]["n_members"] == 180
    assert got[-1]["avg_silhouette"] > 0.9  # tight, well-separated
    for c in (0, 1, 2):
        assert got[c]["n_members"] == 60
    # heavy overlap → much lower silhouette
    loose = np.vstack([blob(np.array(c), spread=3.0) for c in
                       ([5, 0, 0, 0], [0, 5, 0, 0], [0, 0, 5, 0])])
    rows2 = [(i, [float(x) for x in v]) for i, v in enumerate(loose)]
    df2 = spark.createDataFrame(rows2, "vec_id long, embedding array<float>")
    got2 = {r["cluster_id"]: r for r in silhouette_stats(df2, cents).collect()}
    assert got2[-1]["avg_silhouette"] < got[-1]["avg_silhouette"] - 0.3


def test_temperature_mixture_contract(spark):
    """alpha=1 keeps natural proportions (everything kept); alpha=0 targets
    uniform — the largest group is downsampled toward the smallest; output
    is deterministic across repartitionings."""
    from pipes_spark.operators.sampling import temperature_mixture
    from pyspark.sql import functions as F

    rows = [(i, "big" if i < 800 else "small") for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id bigint, source string")
    kept_a1 = temperature_mixture(df, "source", alpha=1.0, key="doc_id", salt="t")
    assert kept_a1.count() == 1000  # natural proportions: nothing dropped
    kept_a0 = temperature_mixture(df, "source", alpha=0.0, key="doc_id", salt="t")
    by = {r["source"]: r["n"] for r in kept_a0.groupBy("source").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    # uniform target: big downsampled to ~small's size; small fully kept
    assert by["small"] == 200
    assert abs(by["big"] - 200) <= 30  # hash-sampling tolerance
    ids1 = sorted(r["doc_id"] for r in kept_a0.collect())
    ids2 = sorted(r["doc_id"] for r in
                  temperature_mixture(df.repartition(13), "source", alpha=0.0,
                                      key="doc_id", salt="t").collect())
    assert ids1 == ids2
