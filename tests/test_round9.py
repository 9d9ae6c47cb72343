"""Round-9 additions: persisted Kneser-Ney bigram model (warehouse
ingest artifact + delta append) and convergence early exit for the
iterative graph family."""

from __future__ import annotations

from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# persisted KN bigram model
# ---------------------------------------------------------------------------


def test_kn_from_model_equals_inflight_fit(spark, sf_dir):
    """The persisted-model scorer is value-identical to refitting on the
    corpus — the contract the driver-graded twin query rides."""
    from pipes_spark.operators.text import (
        kneser_ney_perplexity,
        kneser_ney_perplexity_from_model,
    )
    from pipes_spark.sources import load_table
    from pipes_spark.warehouse import bigram_model_table

    docs = load_table(spark, sf_dir, "documents")
    counts = bigram_model_table(spark, sf_dir)
    a = sorted(tuple(r) for r in kneser_ney_perplexity(docs).collect())
    b = sorted(
        tuple(r) for r in kneser_ney_perplexity_from_model(docs, counts).collect()
    )
    assert a == b and len(a) > 0


def test_bigram_append_is_idempotent_and_delta_exact(spark, sf_dir):
    """Append-log maintenance: re-appending an ingested batch adds zero
    rows, and after a genuine delta the summed counts equal a fresh
    recount over the union corpus."""
    from pipes_spark.operators.text import _bigram_stream
    from pipes_spark.sources import load_table
    from pipes_spark.warehouse import append_bigram_counts, bigram_model_table

    docs = load_table(spark, sf_dir, "documents")
    base = docs.filter(F.col("doc_id") < 30)
    batch = docs.filter((F.col("doc_id") >= 30) & (F.col("doc_id") < 50))

    tag = "t9kn_delta"
    # force a clean build for this tag even if a previous pytest process
    # left the managed tables on disk
    for t in (f"bigram_counts_documents_{tag}", f"bigram_docs_documents_{tag}"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        from pipes_spark.warehouse import clear_stale_location

        clear_stale_location(spark, t)

    bigram_model_table(spark, sf_dir, corpus=base, tag=tag)
    after_delta = append_bigram_counts(spark, sf_dir, batch, tag=tag)
    n_rows_after_delta = after_delta.count()

    # idempotency: same batch again → zero new rows
    again = append_bigram_counts(spark, sf_dir, batch, tag=tag)
    assert again.count() == n_rows_after_delta

    # exactness: read-time compaction equals a fresh recount on the union
    summed = sorted(
        tuple(r)
        for r in after_delta.groupBy("w1", "w2")
        .agg(F.sum("c2").cast("bigint").alias("c2"))
        .collect()
    )
    _, big = _bigram_stream(base.unionByName(batch), "text", "doc_id")
    fresh = sorted(
        tuple(r)
        for r in big.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c2"))
        .collect()
    )
    assert summed == fresh


# ---------------------------------------------------------------------------
# convergence early exit (iterative graph family)
# ---------------------------------------------------------------------------


def _two_cliques(spark):
    """Two disjoint triangles: LPA settles each to its min id in ~2
    rounds, far under the default budget."""
    edges = [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12), (10, 12)]
    return spark.createDataFrame(edges, "src long, dst long")


def test_lpa_early_exit_identical_in_fewer_rounds(spark):
    from pipes_spark.operators.components import label_propagation

    e = _two_cliques(spark)
    stats: dict = {}
    fast = label_propagation(e, num_iter=10, early_exit=True, stats=stats)
    slow = label_propagation(e, num_iter=10, early_exit=False)
    assert sorted(tuple(r) for r in fast.collect()) == sorted(
        tuple(r) for r in slow.collect()
    )
    assert stats["converged"] and stats["rounds"] < 10, stats


def test_lpa_budget_cap_still_respected(spark):
    """A path graph keeps rippling labels: the budget, not convergence,
    ends the loop and stats reports that honestly."""
    from pipes_spark.operators.components import label_propagation

    n = 40
    e = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "src long, dst long"
    )
    stats: dict = {}
    label_propagation(e, num_iter=2, early_exit=True, stats=stats).collect()
    assert stats["rounds"] == 2 and not stats["converged"], stats


def test_pagerank_tol_early_exit_on_converged_fixture(spark):
    """A directed cycle is PageRank's exact fixed point from the uniform
    start (every vertex keeps rank 1.0): round 1 measures delta 0 and
    the loop exits with ranks identical to the full-budget run."""
    from pipes_spark.operators.components import pagerank

    e = spark.createDataFrame(
        [(i, (i + 1) % 6) for i in range(6)], "src long, dst long"
    )
    stats: dict = {}
    fast = pagerank(e, num_iter=10, tol=1e-9, stats=stats)
    slow = pagerank(e, num_iter=10, tol=None)
    assert sorted(tuple(r) for r in fast.collect()) == sorted(
        tuple(r) for r in slow.collect()
    )
    assert stats["converged"] and stats["rounds"] == 1, stats


def test_pagerank_tol_none_keeps_fixed_round_semantics(spark):
    """tol=None (the contract every oracle encodes; the scale DEFAULT is
    tol=1e-4 since round 10) must not early-exit even on a converged
    fixture — and the default must."""
    from pipes_spark.operators.components import pagerank

    e = spark.createDataFrame(
        [(i, (i + 1) % 4) for i in range(4)], "src long, dst long"
    )
    stats: dict = {}
    pagerank(e, num_iter=7, tol=None, stats=stats).collect()
    assert stats["rounds"] == 7 and not stats["converged"], stats
    # the cycle is the exact fixed point: the scale default exits round 1
    dstats: dict = {}
    pagerank(e, num_iter=7, stats=dstats).collect()
    assert dstats["converged"] and dstats["rounds"] == 1, dstats


# ---------------------------------------------------------------------------
# driver-owned sessions: protobuf remediation for transformWithStateInPandas
# ---------------------------------------------------------------------------


def test_twsip_survives_session_created_before_import(tmp_path):
    """The correctness driver builds its SparkSession BEFORE importing
    this package, so TWS workers inherit a PYTHONPATH without the
    offline protobuf runtime — exactly the crash r9 fixed via
    session.worker_protobuf_ok (sc.environment PYTHONPATH injection: the
    TWS pre-init StreamingPythonRunner syncs no pyFiles, the
    PythonFunction envVars map is the only post-launch channel) plus
    streaming._ensure_tws_state_store (driver sessions default to the
    HDFS state store, which lacks column families). Run the hostile
    order in a subprocess (own cwd → own warehouse; no managed tables
    touched) and require the REAL TWS path to produce oracle-matching
    values."""
    import os
    import subprocess
    import sys
    import textwrap

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    script = textwrap.dedent(
        f"""
        import sys
        sys.path.insert(0, {root!r})
        from pyspark.sql import SparkSession
        spark = (SparkSession.builder.master("local[2]")
                 .config("spark.sql.shuffle.partitions", "2")
                 .appName("twsip_hostile").getOrCreate())
        from pipes_spark.catalog import QUERIES
        from pipes_spark.session import _WORKER_PROTOBUF_STATE
        df = QUERIES["streaming_twsip"].fn(spark, {sf!r})
        rows = sorted(tuple(r) for r in df.collect())
        import duckdb
        want = sorted(duckdb.sql(
            "SELECT user_id, count(value), round(sum(value), 6) "
            "FROM read_parquet({sf!r} || '/events.parquet') GROUP BY user_id"
        ).fetchall())
        assert rows == want, (rows[:2], want[:2])
        # the probe must have actually run and passed (real TWS path,
        # not the applyInPandasWithState fallback)
        assert list(_WORKER_PROTOBUF_STATE.values()) == [True]
        print("HOSTILE_TWSIP_OK", len(rows))
        """
    )
    out = subprocess.run(
        [sys.executable, "-c", script],
        cwd=str(tmp_path),
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert "HOSTILE_TWSIP_OK" in out.stdout, out.stdout[-800:] + out.stderr[-2000:]


def test_bigram_append_replays_half_applied_batch_without_double_count(spark, sf_dir):
    """Crash-safety: counts land in a partition keyed by a deterministic
    digest of the delta doc set (dynamic partition overwrite), registry
    appended LAST — so a process dying between the two writes retries
    into the SAME partition. Simulate the half-applied state (counts
    written, registry not) and require the retry to converge to the
    exact fresh recount."""
    from pipes_spark.operators.text import _bigram_stream
    from pipes_spark.sources import load_table
    from pipes_spark.warehouse import (
        append_bigram_counts,
        bigram_model_table,
        clear_stale_location,
    )

    docs = load_table(spark, sf_dir, "documents")
    base = docs.filter(F.col("doc_id") < 20)
    batch = docs.filter((F.col("doc_id") >= 20) & (F.col("doc_id") < 35))

    tag = "t9kn_crash"
    name = f"bigram_counts_documents_{tag}"
    for t in (name, f"bigram_docs_documents_{tag}"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        clear_stale_location(spark, t)
    bigram_model_table(spark, sf_dir, corpus=base, tag=tag)

    # replicate exactly what a process that died between the counts
    # insert and the registry append left behind
    batch_id = batch.agg(
        F.md5(
            F.concat_ws(
                ",", F.sort_array(F.collect_list(F.col("doc_id").cast("string")))
            )
        ).alias("d")
    ).collect()[0]["d"]
    _, big = _bigram_stream(batch, "text", "doc_id")
    half = (
        big.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c2"))
        .withColumn("_batch", F.lit(batch_id))
        .select("w1", "w2", "c2", "_batch")
    )
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    half.write.insertInto(name, overwrite=True)

    # the retry: must replace the half-applied partition, not add to it
    refreshed = append_bigram_counts(spark, sf_dir, batch, tag=tag)
    summed = sorted(
        tuple(r)
        for r in refreshed.groupBy("w1", "w2")
        .agg(F.sum("c2").cast("bigint").alias("c2"))
        .collect()
    )
    _, big2 = _bigram_stream(base.unionByName(batch), "text", "doc_id")
    fresh = sorted(
        tuple(r)
        for r in big2.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c2"))
        .collect()
    )
    assert summed == fresh


# ---------------------------------------------------------------------------
# round-9 second wave: theta A-not-B, l-diversity, Cramér's V, Ljung–Box,
# rendezvous reshard
# ---------------------------------------------------------------------------


def test_kmv_a_not_b_small_sets_are_exact(spark):
    """Below k the sketch retains everything (theta = 2^56), so every
    estimate must EQUAL the exact hash-level difference."""
    from pipes_spark.operators.rollup import kmv_a_not_b

    rows = [("a", i) for i in range(30)] + [("b", i) for i in range(20, 50)]
    df = spark.createDataFrame(rows, ["s", "k"])
    got = {r["set_name"]: r for r in kmv_a_not_b(df, "s", "k", k=64).collect()}
    assert got["a_not_b"]["n_exact"] == 20
    assert got["b_not_a"]["n_exact"] == 20
    assert got["sym_diff"]["n_exact"] == 40
    for r in got.values():
        assert r["est"] == float(r["n_exact"])


def test_kmv_a_not_b_disjoint_and_subset(spark):
    from pipes_spark.operators.rollup import kmv_a_not_b

    # A ⊂ B: a_not_b must be exactly zero in both readouts
    rows = [("a", i) for i in range(10)] + [("b", i) for i in range(40)]
    df = spark.createDataFrame(rows, ["s", "k"])
    got = {r["set_name"]: r for r in kmv_a_not_b(df, "s", "k", k=64).collect()}
    assert got["a_not_b"]["n_exact"] == 0 and got["a_not_b"]["est"] == 0.0
    assert got["b_not_a"]["n_exact"] == 30


def test_kmv_a_not_b_estimates_track_truth_when_sketched(spark):
    """Above k the estimator is approximate: relative error of each
    directional estimate stays within the ~1/sqrt(k) KMV regime."""
    from pipes_spark.operators.rollup import kmv_a_not_b

    rows = [("a", i) for i in range(3000)] + [("b", i) for i in range(1000, 4000)]
    df = spark.createDataFrame(rows, ["s", "k"])
    got = {r["set_name"]: r for r in kmv_a_not_b(df, "s", "k", k=256).collect()}
    for name in ("a_not_b", "b_not_a"):
        exact, est = got[name]["n_exact"], got[name]["est"]
        assert exact == 1000
        assert abs(est - exact) / exact < 0.35, (name, est)


def test_l_diversity_flags_low_diversity_groups_only(spark):
    from pipes_spark.operators.profiling import l_diversity

    rows = (
        [("g1", "x")] * 99 + [("g1", "y")]          # 2 distinct, skewed
        + [("g2", "x")] * 5 + [("g2", "y")] * 5 + [("g2", "z")] * 5
        + [("g3", None)] * 4                          # NULL is one value
    )
    df = spark.createDataFrame(rows, ["g", "v"])
    got = {r["g"]: r for r in l_diversity(df, ["g"], "v", l=3).collect()}
    assert set(got) == {"g1", "g3"}                   # g2 has 3 values: passes
    assert got["g1"]["distinct_l"] == 2 and got["g1"]["n_rows"] == 100
    # entropy-l punishes the 99/1 split: effective values ≪ 2
    assert 1.0 < got["g1"]["entropy_l"] < 1.1
    assert got["g3"]["distinct_l"] == 1 and got["g3"]["entropy_l"] == 1.0


def test_cramers_v_bounds_on_perfect_and_independent(spark):
    from pipes_spark.operators.profiling import cramers_v

    perfect = spark.createDataFrame(
        [("a", "x")] * 10 + [("b", "y")] * 10 + [("c", "z")] * 10, ["u", "v"]
    )
    r = cramers_v(perfect, "u", "v").collect()[0]
    assert r["cramers_v"] == 1.0
    assert r["n_levels_a"] == r["n_levels_b"] == 3
    # exact independence: every cell = product of margins / n → V = 0
    indep = spark.createDataFrame(
        [(u, v) for u in "ab" for v in "xy" for _ in range(5)], ["u", "v"]
    )
    r2 = cramers_v(indep, "u", "v").collect()[0]
    assert r2["chi2"] == 0.0 and r2["cramers_v"] == 0.0
    assert r2["cramers_v_corrected"] == 0.0


def test_ljung_box_matches_hand_computation(spark):
    """Q recomputed in pure Python over the same quantized series."""
    import math

    from pipes_spark.operators.timeseries import ljung_box

    vals = [3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0, 5.0, 3.0, 5.0, 8.0]
    df = spark.createDataFrame(
        [("s", i, v) for i, v in enumerate(vals)], ["key", "t", "v"]
    )
    got = ljung_box(df, ["key"], "t", "v", max_lag=3).collect()[0]
    n = len(vals)
    mean = sum(vals) / n
    c = [v - mean for v in vals]
    den = sum(round(x * x, 6) for x in c)
    q = 0.0
    for h in (1, 2, 3):
        num = sum(round(c[t] * c[t - h], 6) for t in range(h, n))
        r = round(num / den, 6)
        q += round(r * r / (n - h), 12)
    expected = round(n * (n + 2.0) * q, 6)
    assert got["n_obs"] == n and got["h_lags"] == 3
    assert abs(got["q_stat"] - expected) < 1e-9


def test_rendezvous_reshard_matches_pure_python_and_beats_mod(spark):
    """Summary numbers recomputed from scratch with hashlib md5; the
    rendezvous scheme must (a) move every moved key ONTO a new shard
    and (b) move materially fewer keys than mod hashing."""
    import hashlib

    from pipes_spark.operators.sampling import rendezvous_reshard

    keys = [str(i) for i in range(200)]
    n_old, n_new = 4, 6

    def h56(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:14], 16)

    exp = {}
    for scheme in ("mod", "rendezvous"):
        moved, load = 0, {}
        for k in keys:
            if scheme == "mod":
                old, new = h56(k) % n_old, h56(k) % n_new
            else:
                ws = [(h56(f"{k}#{s}"), -s) for s in range(n_new)]
                new = -max(ws)[1]
                old = -max(ws[:n_old])[1]
                if old != new:
                    assert new >= n_old  # moves only onto NEW shards
            moved += old != new
            load[new] = load.get(new, 0) + 1
        exp[scheme] = (len(keys), moved, max(load.values()), min(load.values()))

    df = spark.createDataFrame([(k,) for k in keys], ["k"])
    got = {
        r["scheme"]: r for r in rendezvous_reshard(df, "k", n_old, n_new).collect()
    }
    for scheme, (nk, mv, mx, mn) in exp.items():
        r = got[scheme]
        assert (r["n_keys"], r["n_moved"], r["max_shard_keys"], r["min_shard_keys"]) == (
            nk, mv, mx, mn
        ), scheme
    assert got["rendezvous"]["n_moved"] < got["mod"]["n_moved"]


def test_rendezvous_reshard_same_counts_move_nothing(spark):
    from pipes_spark.operators.sampling import rendezvous_reshard

    df = spark.createDataFrame([(str(i),) for i in range(50)], ["k"])
    for r in rendezvous_reshard(df, "k", 5, 5).collect():
        assert r["n_moved"] == 0 and r["moved_frac"] == 0.0


# ---------------------------------------------------------------------------
# real PNG codec surface + A-ES weighted reservoir
# ---------------------------------------------------------------------------


def test_png_encode_decode_roundtrip_matches_formula(spark):
    from pipes_spark.operators.multimodal import (
        encode_png_assets,
        png_decode_stats,
    )

    d = spark.createDataFrame(
        [(7, 5, 3), (200, 1, 1), (9999, 31, 17)], ["doc_id", "width", "height"]
    )
    got = {
        r["asset_id"]: r
        for r in png_decode_stats(
            encode_png_assets(d, "doc_id", "width", "height")
        ).collect()
    }
    for aid, w, h in [(7, 5, 3), (200, 1, 1), (9999, 31, 17)]:
        r = got[aid]
        assert (r["format"], r["width"], r["height"]) == ("png", w, h)
        assert (r["bit_depth"], r["color_type"]) == (8, 0)
        assert r["n_pixels"] == w * h
        assert r["pixel_sum"] == sum((aid + i) % 256 for i in range(w * h))


def test_sniff_image_header_png_gif_jpeg_and_crc():
    import pytest as _pytest

    from pipes_spark.operators.multimodal import (
        png_encode_gray,
        sniff_image_header,
    )

    png = png_encode_gray(42, 6, 4)
    assert sniff_image_header(png) == ("png", 6, 4, 8, 0)
    # corrupt one IHDR byte: the CRC check must refuse, not misreport
    bad = bytearray(png)
    bad[16] ^= 0xFF
    with _pytest.raises(ValueError, match="CRC"):
        sniff_image_header(bytes(bad))
    # GIF89a logical screen descriptor, 320x200, 8-bit colour resolution
    gif = b"GIF89a" + (320).to_bytes(2, "little") + (200).to_bytes(2, "little") + bytes([0xF7, 0, 0])
    assert sniff_image_header(gif) == ("gif", 320, 200, 8, None)
    # minimal JPEG: SOI, APP0 (empty), SOF0 precision 8, 480x640, 3 comps
    import struct

    sof0 = b"\xff\xc0" + struct.pack(">H", 8 + 9) + bytes([8]) + struct.pack(">HH", 480, 640) + bytes([3] + [1, 0x11, 0] * 3)
    jpeg = b"\xff\xd8" + b"\xff\xe0" + struct.pack(">H", 2) + sof0
    assert sniff_image_header(jpeg) == ("jpeg", 640, 480, 8, 3)
    assert sniff_image_header(b"plain text")[0] is None


def test_png_decode_rejects_non_png(spark):
    import pytest as _pytest

    from pipes_spark.operators.multimodal import png_decode_stats

    bad = spark.createDataFrame([(1, bytearray(b"not a png"))], "asset_id bigint, content binary")
    with _pytest.raises(Exception, match="not a PNG"):
        png_decode_stats(bad).collect()


def test_weighted_reservoir_exact_k_and_weight_bias(spark):
    from pipes_spark.operators.sampling import weighted_reservoir_per_group

    rows = [("g", f"k{i}", 1.0) for i in range(200)] + [("g", "heavy", 1e9)]
    df = spark.createDataFrame(rows, ["g", "id", "w"])
    for salt in ("s1", "s2", "s3"):
        got = weighted_reservoir_per_group(df, ["g"], "id", "w", k=10, salt=salt).collect()
        assert len(got) == 10
        # weight 1e9 vs 1: u^(1/w) ≈ 1 — the heavy row wins every draw
        assert any(r["id"] == "heavy" for r in got), salt


def test_weighted_reservoir_deterministic_and_excludes_nonpositive(spark):
    from pipes_spark.operators.sampling import weighted_reservoir_per_group

    rows = [("a", f"k{i}", float(i % 7 - 1)) for i in range(100)]
    df = spark.createDataFrame(rows, ["g", "id", "w"])
    a = sorted(r["id"] for r in weighted_reservoir_per_group(df, ["g"], "id", "w", 5).collect())
    b = sorted(
        r["id"]
        for r in weighted_reservoir_per_group(df.repartition(13), ["g"], "id", "w", 5).collect()
    )
    assert a == b and len(a) == 5
    kept_w = {
        r["id"]: r["w"]
        for r in weighted_reservoir_per_group(df, ["g"], "id", "w", 100).collect()
    }
    assert all(w > 0 for w in kept_w.values())


def test_t_closeness_matches_hand_computation_and_zero_case(spark):
    from pipes_spark.operators.profiling import t_closeness

    rows = (
        [("g1", "a")] * 75 + [("g1", "b")] * 25
        + [("g2", "a")] * 75 + [("g2", "b")] * 25
        + [("g3", "a")] * 100
    )
    df = spark.createDataFrame(rows, ["g", "v"])
    got = {r["g"]: r for r in t_closeness(df, ["g"], "v", t=0.1).collect()}

    # pure-Python replica of the ordered-EMD formula
    from collections import Counter

    groups = {"g1": ["a"] * 75 + ["b"] * 25, "g2": ["a"] * 75 + ["b"] * 25,
              "g3": ["a"] * 100}
    all_vals = sorted({v for vs in groups.values() for v in vs})
    n = sum(len(vs) for vs in groups.values())
    q = {v: sum(vs.count(v) for vs in groups.values()) / n for v in all_vals}
    for g, vs in groups.items():
        c = Counter(vs)
        cum, emd = 0.0, 0.0
        for v in all_vals:
            cum += c.get(v, 0) / len(vs) - q[v]
            emd += round(abs(cum), 9)
        expected = round(emd / (len(all_vals) - 1), 6)
        assert abs(got[g]["emd"] - expected) < 1e-9, g
        assert got[g]["n_rows"] == len(vs)
        assert got[g]["violates_t"] == int(expected > 0.1)
    # the all-"a" group must deviate; the two global-shaped groups equally
    assert got["g3"]["emd"] > got["g1"]["emd"] == got["g2"]["emd"]


# ---------------------------------------------------------------------------
# review-pass regressions (wave 5)
# ---------------------------------------------------------------------------


def test_rendezvous_reshard_shrink_counts_real_moves(spark):
    """Shrinking 6→4: a key moves iff its old argmax was a retired
    shard — candidates must span BOTH layouts or every key reads
    unmoved."""
    import hashlib

    from pipes_spark.operators.sampling import rendezvous_reshard

    keys = [str(i) for i in range(150)]

    def h56(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:14], 16)

    exp_moved = 0
    for k in keys:
        ws = [(h56(f"{k}#{s}"), -s) for s in range(6)]
        old = -max(ws)[1]
        new = -max(ws[:4])[1]
        if old != new:
            assert old >= 4  # only keys on retired shards move
            exp_moved += 1
    assert exp_moved > 0
    df = spark.createDataFrame([(k,) for k in keys], ["k"])
    got = {r["scheme"]: r for r in rendezvous_reshard(df, "k", 6, 4).collect()}
    assert got["rendezvous"]["n_moved"] == exp_moved
    assert 0 < got["rendezvous"]["n_moved"] < got["mod"]["n_moved"]


def test_cramers_v_exact_independence_rounding_cannot_go_negative(spark):
    """3×3 with 7 rows/cell: every term is 1/9, whose 12-decimal
    rounding sums to 0.999999999999 — the clamp must yield 0.0, never
    −0.0 chi2 or NaN V."""
    import math

    from pipes_spark.operators.profiling import cramers_v

    rows = [(a, b) for a in "xyz" for b in "pqr" for _ in range(7)]
    r = cramers_v(spark.createDataFrame(rows, ["u", "v"]), "u", "v").collect()[0]
    assert r["chi2"] == 0.0 and math.copysign(1, r["chi2"]) == 1.0
    assert r["cramers_v"] == 0.0 and not math.isnan(r["cramers_v"])
    assert r["cramers_v_corrected"] == 0.0


def test_weighted_reservoir_nan_weights_excluded(spark):
    from pipes_spark.operators.sampling import weighted_reservoir_per_group

    rows = [("g", f"k{i}", 1.0) for i in range(20)] + [
        ("g", "nan1", float("nan")),
        ("g", "nan2", float("nan")),
    ]
    df = spark.createDataFrame(rows, ["g", "id", "w"])
    got = [r["id"] for r in weighted_reservoir_per_group(df, ["g"], "id", "w", 5).collect()]
    assert len(got) == 5 and not any(i.startswith("nan") for i in got)


def test_kmv_a_not_b_three_sets_raises(spark):
    import pytest as _pytest

    from pipes_spark.operators.rollup import kmv_a_not_b

    rows = [("a", 1), ("b", 2), ("c", 3)]
    df = spark.createDataFrame(rows, ["s", "k"])
    with _pytest.raises(Exception, match="exactly 2 sets"):
        kmv_a_not_b(df, "s", "k").collect()


def test_avro_time_millis_submillisecond_raises(tmp_path):
    import datetime as _dt

    import pytest as _pytest

    from pipes_spark.sources import avro as _av

    schema = {
        "type": "record",
        "name": "TMS",
        "fields": [
            {"name": "t", "type": {"type": "int", "logicalType": "time-millis"}}
        ],
    }
    p = str(tmp_path / "subms.avro")
    with _pytest.raises(ValueError, match="sub-millisecond"):
        _av.write_avro_file(p, schema, [(_dt.time(0, 0, 0, 500),)])


def test_sniff_header_jpeg_fill_bytes_and_truncated_png():
    import struct

    import pytest as _pytest

    from pipes_spark.operators.multimodal import (
        png_encode_gray,
        sniff_image_header,
    )

    # JPEG with fill padding and a standalone RST marker before SOF2
    sof2 = (
        b"\xff\xff\xff\xc2"  # fill bytes then SOF2
        + struct.pack(">H", 8 + 6)
        + bytes([12])
        + struct.pack(">HH", 100, 50)
        + bytes([1, 1, 0x11, 0])
    )
    jpeg = b"\xff\xd8" + b"\xff\xd0" + sof2  # RST0 is standalone: no length
    assert sniff_image_header(jpeg) == ("jpeg", 50, 100, 12, 1)
    # truncated PNG: documented ValueError, not struct.error
    png = png_encode_gray(1, 4, 4)
    with _pytest.raises(ValueError, match="truncated"):
        sniff_image_header(png[:20])


def test_brown_forsythe_spread_sensitivity(spark):
    """Mean shifts alone must NOT trigger it (z-distributions identical
    ⇒ F = 0); a genuine spread difference must."""
    from pipes_spark.operators.profiling import brown_forsythe

    shifted = [("a", float(v)) for v in (1, 2, 3, 4, 5)] + [
        ("b", float(v + 10)) for v in (1, 2, 3, 4, 5)
    ]
    r = brown_forsythe(spark.createDataFrame(shifted, ["g", "v"]), "g", "v").collect()[0]
    assert r["ss_between"] == 0.0 and r["f_stat"] == 0.0
    assert (r["n_groups"], r["n_total"]) == (2, 10)

    spread = [("a", float(v)) for v in (1, 2, 3, 4, 5)] + [
        ("b", float(v)) for v in (-20, -10, 0, 10, 20)
    ]
    r2 = brown_forsythe(spark.createDataFrame(spread, ["g", "v"]), "g", "v").collect()[0]
    assert r2["f_stat"] > 5.0


def test_wilcoxon_signed_rank_matches_hand_computation(spark):
    """W⁺/W⁻/z recomputed in pure Python with midranks and the
    tie-corrected variance, zeros dropped."""
    import math

    from pipes_spark.operators.profiling import wilcoxon_signed_rank

    diffs = [1.5, -0.5, 0.5, 2.0, -2.0, 3.0, 0.0, 0.5, -1.5, 4.0]
    df = spark.createDataFrame([(d,) for d in diffs], ["d"])
    got = wilcoxon_signed_rank(df, "d").collect()[0]

    nz = [d for d in diffs if d != 0]
    n = len(nz)
    ranked = sorted(nz, key=abs)
    # midranks over |d|
    from collections import Counter

    cnt = Counter(abs(d) for d in nz)
    below = 0
    midrank = {}
    for v in sorted(cnt):
        midrank[v] = below + (cnt[v] + 1) / 2
        below += cnt[v]
    wp = sum(midrank[abs(d)] for d in nz if d > 0)
    wm = n * (n + 1) / 2 - wp
    ties = sum(t**3 - t for t in cnt.values())
    var = n * (n + 1) * (2 * n + 1) / 24 - ties / 48
    z = (wp - n * (n + 1) / 4) / math.sqrt(var)
    assert got["n_pairs"] == n
    assert got["w_plus"] == round(wp, 6) and got["w_minus"] == round(wm, 6)
    assert abs(got["z"] - z) < 1e-6


def test_wilcoxon_excludes_nan_and_honors_quantization_grain(spark):
    from pipes_spark.operators.profiling import wilcoxon_signed_rank

    rows = [(1.5,), (-0.5,), (2.0,), (float("nan"),), (None,)]
    got = wilcoxon_signed_rank(spark.createDataFrame(rows, ["d"]), "d").collect()[0]
    assert got["n_pairs"] == 3  # NaN and NULL excluded, not ranked

    # sub-grain differences survive when round_decimals is raised
    tiny = [(5e-8,), (-3e-8,), (4e-8,)]
    df = spark.createDataFrame(tiny, ["d"])
    at6 = wilcoxon_signed_rank(df, "d", round_decimals=6).collect()[0]
    at8 = wilcoxon_signed_rank(df, "d", round_decimals=8).collect()[0]
    assert at6["n_pairs"] is None or at6["n_pairs"] == 0  # all rounded to 0
    assert at8["n_pairs"] == 3


def test_friedman_matches_hand_computation_and_cancels_block_levels(spark):
    """Tie-corrected chi2 recomputed in pure Python; adding a huge
    per-block offset must not change the statistic (within-block ranks
    are offset-invariant)."""
    from pipes_spark.operators.profiling import friedman_test

    # 4 blocks x 3 treatments with one within-block tie
    data = {
        "b1": {"t1": 1.0, "t2": 2.0, "t3": 3.0},
        "b2": {"t1": 2.0, "t2": 2.0, "t3": 5.0},   # tie t1/t2
        "b3": {"t1": 1.0, "t2": 3.0, "t3": 2.0},
        "b4": {"t1": 1.0, "t2": 2.0, "t3": 4.0},
    }
    rows = [(b, t, v) for b, ts in data.items() for t, v in ts.items()]
    df = spark.createDataFrame(rows, ["b", "t", "v"])
    got = friedman_test(df, "b", "t", "v").collect()[0]

    # pure-Python midranks + tie-corrected statistic
    n, k = len(data), 3
    ranks = {}
    sq = 0.0
    for b, ts in data.items():
        vals = sorted(ts.values())
        for t, v in ts.items():
            less = sum(1 for x in vals if x < v)
            ties = sum(1 for x in vals if x == v)
            r = less + (ties + 1) / 2
            ranks.setdefault(t, []).append(r)
            sq += round(r * r, 6)
    dev2 = sum(
        round((sum(rs) / n - (k + 1) / 2) ** 2, 9) for rs in ranks.values()
    )
    denom = sq - n * k * (k + 1) ** 2 / 4
    expected = round((k - 1) * (n * dev2) * n / denom, 6)
    assert (got["n_blocks"], got["k_treatments"], got["df"]) == (4, 3, 2)
    assert abs(got["chi2"] - expected) < 1e-9

    # block-level invariance: +1000 on every b2 value, identical chi2
    shifted = [
        (b, t, v + (1000.0 if b == "b2" else 0.0)) for b, t, v in rows
    ]
    got2 = friedman_test(
        spark.createDataFrame(shifted, ["b", "t", "v"]), "b", "t", "v"
    ).collect()[0]
    assert got2["chi2"] == got["chi2"]

    # incomplete blocks are excluded
    partial = rows + [("b5", "t1", 9.0)]
    got3 = friedman_test(
        spark.createDataFrame(partial, ["b", "t", "v"]), "b", "t", "v"
    ).collect()[0]
    assert got3["n_blocks"] == 4 and got3["chi2"] == got["chi2"]


# ---------------------------------------------------------------------------
# high-effort review regressions (wave 10)
# ---------------------------------------------------------------------------


def test_rendezvous_reshard_reports_empty_shards(spark):
    """5 keys over 10 new shards: some shards MUST be empty, and
    min_shard_keys must read 0, not the smallest non-empty load."""
    from pipes_spark.operators.sampling import rendezvous_reshard

    df = spark.createDataFrame([(str(i),) for i in range(5)], ["k"])
    got = {r["scheme"]: r for r in rendezvous_reshard(df, "k", 8, 10).collect()}
    for scheme in ("mod", "rendezvous"):
        assert got[scheme]["min_shard_keys"] == 0, scheme
        assert got[scheme]["max_shard_keys"] >= 1


def test_avro_local_timestamp_millis_submicro_raises(tmp_path):
    import datetime as _dt

    import pytest as _pytest

    from pipes_spark.sources import avro as _av

    schema = {
        "type": "record",
        "name": "LTM",
        "fields": [
            {
                "name": "lts",
                "type": {"type": "long", "logicalType": "local-timestamp-millis"},
            }
        ],
    }
    p = str(tmp_path / "ltm.avro")
    with _pytest.raises(ValueError, match="sub-millisecond"):
        _av.write_avro_file(
            p, schema, [(_dt.datetime(2021, 3, 4, 5, 6, 7, 123456),)]
        )
    # exact milliseconds still round-trip
    rows = [(_dt.datetime(2021, 3, 4, 5, 6, 7, 123000),)]
    _av.write_avro_file(p, schema, rows)
    assert list(_av._iter_range_rows(p, 0, 10**9)) == rows


def test_brown_forsythe_and_friedman_exclude_nan(spark):
    from pipes_spark.operators.profiling import brown_forsythe, friedman_test

    rows = [("a", float(v)) for v in (1, 2, 3, 4, 5)] + [
        ("b", float(v)) for v in (2, 3, 4, 5, 6)
    ] + [("a", float("nan"))]
    r = brown_forsythe(spark.createDataFrame(rows, ["g", "v"]), "g", "v").collect()[0]
    assert r["n_total"] == 10  # NaN row excluded, no ANSI throw

    f_rows = [
        (b, t, float(i + j)) for i, b in enumerate("xyz") for j, t in enumerate("pq")
    ] + [("x", "p", float("nan"))]
    f = friedman_test(
        spark.createDataFrame(f_rows, ["b", "t", "v"]), "b", "t", "v"
    ).collect()[0]
    assert f["n_blocks"] == 3 and f["chi2"] is not None


def test_t_closeness_single_valued_domain_is_zero_not_null(spark):
    from pipes_spark.operators.profiling import t_closeness

    df = spark.createDataFrame(
        [("g1", "only"), ("g1", "only"), ("g2", "only")], ["g", "v"]
    )
    for r in t_closeness(df, ["g"], "v", t=0.1).collect():
        assert r["emd"] == 0.0 and r["violates_t"] == 0


def test_cochran_q_matches_hand_computation(spark):
    """Q recomputed in pure Python via the integer identity; constant
    blocks zero the denominator -> NULL; incomplete blocks excluded."""
    data = {
        "b1": {"t1": 1, "t2": 0, "t3": 0},
        "b2": {"t1": 1, "t2": 1, "t3": 0},
        "b3": {"t1": 1, "t2": 0, "t3": 1},
        "b4": {"t1": 0, "t2": 0, "t3": 0},
        "b5": {"t1": 1, "t2": 1, "t3": 1},
        "b6": {"t1": 1, "t2": 0, "t3": 0},
    }
    from pipes_spark.operators.profiling import cochran_q

    rows = [(b, t, x) for b, ts in data.items() for t, x in ts.items()]
    got = cochran_q(
        spark.createDataFrame(rows, ["b", "t", "x"]), "b", "t", "x"
    ).collect()[0]
    k = 3
    n_tot = sum(sum(ts.values()) for ts in data.values())
    sc2 = sum(
        sum(ts[t] for ts in data.values()) ** 2 for t in ("t1", "t2", "t3")
    )
    sr2 = sum(sum(ts.values()) ** 2 for ts in data.values())
    expected = round((k - 1) * (k * sc2 - n_tot**2) / (k * n_tot - sr2), 6)
    assert (got["n_blocks"], got["k_treatments"], got["df"]) == (6, 3, 2)
    assert got["q_stat"] == expected

    # all-constant blocks: denominator zero -> NULL statistic, no throw
    const = [(b, t, 1) for b in ("c1", "c2") for t in ("t1", "t2")]
    r = cochran_q(
        spark.createDataFrame(const, ["b", "t", "x"]), "b", "t", "x"
    ).collect()[0]
    assert r["q_stat"] is None

    # incomplete block excluded
    partial = rows + [("b7", "t1", 1)]
    r2 = cochran_q(
        spark.createDataFrame(partial, ["b", "t", "x"]), "b", "t", "x"
    ).collect()[0]
    assert r2["n_blocks"] == 6 and r2["q_stat"] == got["q_stat"]
