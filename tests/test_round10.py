"""Round-10 additions: ADVICE fixes (cochran_q duplicate-cell guard,
t_closeness categorical EMD, avro truncate_millis escape hatch) plus the
round's new operators."""

import pytest


def test_cochran_q_duplicate_cell_block_excluded(spark):
    """A block with a DUPLICATED (block, treatment) cell masking a missing
    treatment has row-count == k but countDistinct < k — it must be
    excluded, not double-counted into R_i / C_j (ADVICE r9)."""
    from pipes_spark.operators.profiling import cochran_q

    data = {
        "b1": {"t1": 1, "t2": 0, "t3": 0},
        "b2": {"t1": 1, "t2": 1, "t3": 0},
        "b3": {"t1": 1, "t2": 0, "t3": 1},
        "b4": {"t1": 0, "t2": 0, "t3": 0},
        "b5": {"t1": 1, "t2": 1, "t3": 1},
        "b6": {"t1": 1, "t2": 0, "t3": 0},
    }
    rows = [(b, t, x) for b, ts in data.items() for t, x in ts.items()]
    base = cochran_q(
        spark.createDataFrame(rows, ["b", "t", "x"]), "b", "t", "x"
    ).collect()[0]

    # b7 has t1 twice and no t3: 3 rows (== k) but only 2 distinct
    # treatments — the pre-fix filter admitted it
    poisoned = rows + [("b7", "t1", 1), ("b7", "t1", 1), ("b7", "t2", 0)]
    got = cochran_q(
        spark.createDataFrame(poisoned, ["b", "t", "x"]), "b", "t", "x"
    ).collect()[0]
    assert got["n_blocks"] == 6
    assert got["q_stat"] == base["q_stat"]


def test_t_closeness_categorical_mode_label_invariant(spark):
    """ordered=False computes the equal-distance EMD 0.5*sum|p-q| — the
    paper's categorical metric — and is invariant under label renaming,
    which the ordered (ordinal) default is deliberately not."""
    from pipes_spark.operators.profiling import t_closeness

    rows = [
        ("g1", "a"), ("g1", "a"), ("g1", "c"), ("g1", "c"),
        ("g2", "b"), ("g2", "b"), ("g2", "b"), ("g2", "b"),
    ]
    df = spark.createDataFrame(rows, ["g", "v"])
    got = {
        r["g"]: r["emd"]
        for r in t_closeness(df, ["g"], "v", t=0.1, ordered=False).collect()
    }
    # global q = (a:2, b:4, c:2)/8 = (.25, .5, .25)
    # g1 p = (.5, 0, .5): 0.5*(|.25|+|.5|+|.25|) = 0.5; g2 likewise
    assert got == {"g1": 0.5, "g2": 0.5}

    # rename 'a' -> 'z' (now sorts LAST): categorical emd unchanged,
    # ordinal emd changes — demonstrating exactly the documented caveat
    from pyspark.sql import functions as F

    df2 = df.withColumn("v", F.when(F.col("v") == "a", "z").otherwise(F.col("v")))
    got2 = {
        r["g"]: r["emd"]
        for r in t_closeness(df2, ["g"], "v", t=0.1, ordered=False).collect()
    }
    assert got2 == got
    ord1 = {
        r["g"]: r["emd"] for r in t_closeness(df, ["g"], "v", t=0.1).collect()
    }
    ord2 = {
        r["g"]: r["emd"] for r in t_closeness(df2, ["g"], "v", t=0.1).collect()
    }
    assert ord1 != ord2  # the ordinal default is label-order sensitive


def test_avro_truncate_millis_escape_hatch(tmp_path):
    """timestamp-millis with sub-ms precision: default raises loudly,
    truncate_millis=True floors to the millisecond (ADVICE r9)."""
    from datetime import datetime

    from pipes_spark.sources.avro import _iter_range_rows, write_avro_file

    schema = {
        "type": "record",
        "name": "R",
        "fields": [
            {
                "name": "ts",
                "type": {"type": "long", "logicalType": "timestamp-millis"},
            }
        ],
    }
    v = datetime(2024, 3, 1, 12, 0, 0, 123456)  # 456 us below the ms
    p = str(tmp_path / "a.avro")
    with pytest.raises(ValueError, match="sub-millisecond"):
        write_avro_file(p, schema, [{"ts": v}], codec="null")
    write_avro_file(p, schema, [{"ts": v}], codec="null", truncate_millis=True)
    ((got,),) = list(_iter_range_rows(p, 0, 10**9))
    assert got.replace(tzinfo=None) == datetime(2024, 3, 1, 12, 0, 0, 123000)


# ---------------------------------------------------------------------------
# GIF LZW codec (round-10: multimodal_gif_roundtrip)
# ---------------------------------------------------------------------------


def test_gif_lzw_hand_fixture_from_spec_rules():
    """min_code_size=2, pixels [1]*5: LZW per the spec gives codes
    clear(4),1,6,6 then EOI(5) — the width bump to 4 bits fires after the
    4th code (next entry 8 == 2^3), so EOI packs at 4 bits:
    4 | 1<<3 | 6<<6 | 6<<9 | 5<<12 = 0x5D8C -> bytes 8C 5D (LSB-first)."""
    from pipes_spark.operators.multimodal import _gif_lzw_decode, _gif_lzw_encode

    enc = _gif_lzw_encode(bytes([1] * 5), 2)
    assert enc == bytes.fromhex("8c5d")
    assert bytes(_gif_lzw_decode(enc, 2)) == bytes([1] * 5)


def test_gif_lzw_round_trip_and_table_reset():
    import random

    from pipes_spark.operators.multimodal import _gif_lzw_decode, _gif_lzw_encode

    rng = random.Random(7)
    for n in (0, 1, 255, 256, 5000, 30000):
        data = bytes(rng.randrange(256) for _ in range(n))
        assert bytes(_gif_lzw_decode(_gif_lzw_encode(data, 8), 8)) == data
    # low-entropy long stream: forces multiple 12-bit table resets and
    # plenty of KwKwK cases
    data = bytes(((i * i) >> 3) % 4 for i in range(200000))
    assert bytes(_gif_lzw_decode(_gif_lzw_encode(data, 8), 8)) == data


def test_gif_lzw_deferred_clear_tolerated():
    """Spec-conformant encoders may keep emitting 12-bit codes on a full
    table instead of clearing; hand-build such a stream (every code a
    literal, never clearing) and check the decoder accepts it."""
    from pipes_spark.operators.multimodal import _gif_lzw_decode

    data = bytes((i * 7) % 256 for i in range(6000))  # 6000 > 4096-258 adds
    out = bytearray()
    bitbuf = nbits = 0
    cs = 9
    running = 258

    def emit(code):
        nonlocal bitbuf, nbits, cs, running
        bitbuf |= code << nbits
        nbits += cs
        while nbits >= 8:
            out.append(bitbuf & 0xFF)
            bitbuf >>= 8
            nbits -= 8
        # literal-only stream: the decoder still counts every read, so the
        # width schedule matches its running counter (capped at 4097)
        if running < 4097:
            running += 1
            if running > (1 << cs) and cs < 12:
                cs += 1

    emit(256)  # clear
    running = 258  # decoder resets its counter on clear
    for b in data:
        emit(b)
    emit(257)  # EOI
    if nbits:
        out.append(bitbuf & 0xFF)
    assert bytes(_gif_lzw_decode(bytes(out), 8)) == data


def test_gif_lzw_corrupt_streams_raise():
    from pipes_spark.operators.multimodal import _gif_lzw_decode, _gif_lzw_encode

    enc = _gif_lzw_encode(b"hello world", 8)
    with pytest.raises(ValueError, match="ended before EOI"):
        _gif_lzw_decode(enc[:-2], 8)
    # a code far beyond the table: craft 9-bit stream clear(256) then 300
    bad = bytearray()
    v = 256 | (300 << 9)
    for _ in range(3):
        bad.append(v & 0xFF)
        v >>= 8
    with pytest.raises(ValueError, match="invalid first LZW code"):
        _gif_lzw_decode(bytes(bad), 8)


def test_gif_interlace_row_order_is_permutation():
    from pipes_spark.operators.multimodal import _gif_row_order

    for h in (1, 2, 7, 8, 9, 19, 64):
        order = _gif_row_order(h, True)
        assert sorted(order) == list(range(h))
    assert _gif_row_order(10, True) == [0, 8, 4, 2, 6, 1, 3, 5, 7, 9]


def test_gif_decode_stats_matches_content_contract(spark):
    """Full Spark-side round trip incl. interlaced images, a GIF89a
    graphic-control extension block, and a local color table."""
    import numpy as np
    from pyspark.sql import functions as F

    from pipes_spark.operators.multimodal import (
        encode_gif_assets,
        gif_decode_stats,
    )

    d = spark.range(0, 40).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 13 + 1).cast("int").alias("width"),
        (F.col("id") % 9 + 1).cast("int").alias("height"),
        (F.col("id") % 2 == 1).alias("interlaced"),
    )
    stats = gif_decode_stats(
        encode_gif_assets(d, "doc_id", "width", "height", "interlaced")
    ).collect()
    assert len(stats) == 40
    for r in stats:
        n = r["width"] * r["height"]
        expected = int(((r["asset_id"] + np.arange(n)) % 256).sum())
        assert (r["format"], r["bit_depth"], r["n_colors"]) == ("gif", 8, 256)
        assert r["n_pixels"] == n and r["pixel_sum"] == expected


def test_gif_decoder_extension_blocks_and_local_color_table(spark):
    """Hand-assemble a GIF with a graphic-control extension, a comment
    extension, NO global color table, and a 4-entry LOCAL color table —
    the decoder must skip the extensions and dereference the LCT."""
    import struct

    from pipes_spark.operators.multimodal import (
        _gif_lzw_encode,
        gif_decode_stats,
    )

    w, h = 3, 2
    idx = bytes([0, 1, 2, 3, 0, 1])
    lct = bytes([10, 0, 0, 20, 0, 0, 30, 0, 0, 40, 0, 0])  # reds 10/20/30/40
    b = bytearray(b"GIF89a")
    b += struct.pack("<HHBBB", w, h, 0x22, 0, 0)  # no GCT, color res 3
    b += b"\x21\xf9\x04\x00\x00\x00\x00\x00"  # graphic control ext
    b += b"\x21\xfe\x05hello\x00"  # comment ext
    b += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0x80 | 0x01)  # LCT size 4
    b += lct
    b.append(2)  # LZW min code size for 4-color data
    lzw = _gif_lzw_encode(idx, 2)
    b.append(len(lzw))
    b += lzw
    b += b"\x00\x3b"
    df = spark.createDataFrame([(1, bytes(b))], "asset_id long, content binary")
    (r,) = gif_decode_stats(df).collect()
    assert (r["width"], r["height"], r["n_colors"]) == (3, 2, 4)
    assert r["bit_depth"] == 3  # color-resolution field of the LSD
    assert r["pixel_sum"] == 10 + 20 + 30 + 40 + 10 + 20


def test_avro_reader_alias_resolution(tmp_path):
    """Spec 'Aliases': a reader field matches a renamed writer field via
    its aliases list; a direct NAME match wins over an alias match."""
    from pipes_spark.sources.avro import _iter_range_rows, write_avro_file

    writer = {
        "type": "record",
        "name": "R",
        "fields": [
            {"name": "old_name", "type": "long"},
            {"name": "shared", "type": "long"},
        ],
    }
    p = str(tmp_path / "v1.avro")
    write_avro_file(p, writer, [(7, 100), (9, 200)], codec="null")

    import json

    reader = {
        "type": "record",
        "name": "R",
        "fields": [
            {"name": "new_name", "type": "long", "aliases": ["old_name"]},
            # 'shared' matches by NAME even though another field lists it
            # as an alias — name match must win
            {"name": "shared", "type": "long"},
            {"name": "grabby", "type": "long", "aliases": ["shared"],
             "default": -1},
        ],
    }
    rows = list(_iter_range_rows(p, 0, 10**9, reader_schema=json.dumps(reader)))
    assert rows == [(7, 100, -1), (9, 200, -1)]


# ---------------------------------------------------------------------------
# Iterative-loop convergence exits (round-10: pagerank tol default,
# shortest_paths stats contract)
# ---------------------------------------------------------------------------


def test_shortest_paths_frontier_exit_identity(spark):
    """A diameter-2 graph under a 6-hop budget: the frontier-empty exit
    fires (converged, rounds == 3) and the settled set is IDENTICAL to
    the exact-budget run — the exit is bit-identical by construction."""
    from pipes_spark.operators.components import shortest_paths

    # path graph 0-1-2 plus a disconnected 3-4: diameter from landmark 0 is 2
    e = spark.createDataFrame(
        [(0, 1), (1, 2), (3, 4)], "src long, dst long"
    )
    stats: dict = {}
    wide = shortest_paths(e, [0], max_hops=6, stats=stats)
    rows_wide = sorted(tuple(r) for r in wide.collect())
    assert stats["converged"] and stats["rounds"] == 3, stats
    tight = shortest_paths(e, [0], max_hops=2)
    assert rows_wide == sorted(tuple(r) for r in tight.collect())
    assert rows_wide == [(0, 0, 0), (1, 0, 1), (2, 0, 2)]

    # budget smaller than the diameter: no convergence claim
    s2: dict = {}
    shortest_paths(e, [0], max_hops=1, stats=s2).collect()
    assert s2 == {"rounds": 1, "converged": False}


def test_pagerank_scale_default_converges_within_tol(spark):
    """The new tol=1e-4 default: on a graph that needs several rounds,
    every returned rank is within tol of the full-budget fixed-round
    ranks, and the stats row records the saved rounds."""
    from pipes_spark.operators.components import pagerank

    edges = [(2, 1), (3, 1), (4, 1), (1, 2), (5, 4), (2, 3), (4, 5)]
    df = spark.createDataFrame(edges, "src long, dst long")
    exact = {r.id: r.rank for r in pagerank(df, num_iter=40, tol=None).collect()}
    stats: dict = {}
    got = {r.id: r.rank for r in pagerank(df, num_iter=40, stats=stats).collect()}
    assert stats["converged"] and stats["rounds"] < 40, stats
    assert got.keys() == exact.keys()
    for k in exact:
        assert abs(got[k] - exact[k]) < 1e-3, (k, got[k], exact[k])


# ---------------------------------------------------------------------------
# JPEG baseline codec (round-10: multimodal_jpeg_roundtrip)
# ---------------------------------------------------------------------------


def _jpeg_reference_decode(px, q):
    """Direct quantize→dequantize reference: what a bit-exact entropy
    layer must reproduce through the full file round trip."""
    import numpy as np

    from pipes_spark.operators.multimodal import _jpeg_dct_matrix

    m = _jpeg_dct_matrix()
    h, w = px.shape
    ph, pw = (h + 7) // 8 * 8, (w + 7) // 8 * 8
    padded = np.pad(px, ((0, ph - h), (0, pw - w)), mode="edge")
    blocks = (
        padded.reshape(ph // 8, 8, pw // 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(-1, 8, 8)
        .astype(np.float64)
        - 128
    )
    F_ = np.einsum("ux,nxy,vy->nuv", m, blocks, m)
    qq = np.asarray(q, dtype=np.int32).reshape(8, 8)
    deq = np.round(F_ / qq[None]).astype(np.int64) * qq[None]
    sp = np.einsum("xu,nuv,yv->nxy", m.T, deq.astype(np.float64), m.T) + 128
    out = np.clip(np.round(sp), 0, 255).astype(np.uint8)
    return (
        out.reshape(ph // 8, pw // 8, 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(ph, pw)[:h, :w]
    )


def test_jpeg_dct_matrix_matches_spec_definition():
    """The 8×8 DCT basis against the direct O(N^4) T.81 definition."""
    import numpy as np

    from pipes_spark.operators.multimodal import _jpeg_dct_matrix

    m = _jpeg_dct_matrix()
    rng = np.random.default_rng(3)
    f = rng.integers(0, 256, (8, 8)).astype(np.float64) - 128
    ref = np.zeros((8, 8))
    for u in range(8):
        for v in range(8):
            cu = 1 / np.sqrt(2) if u == 0 else 1.0
            cv = 1 / np.sqrt(2) if v == 0 else 1.0
            s = 0.0
            for x in range(8):
                for y in range(8):
                    s += (
                        f[x, y]
                        * np.cos((2 * x + 1) * u * np.pi / 16)
                        * np.cos((2 * y + 1) * v * np.pi / 16)
                    )
            ref[u, v] = 0.25 * cu * cv * s
    assert np.allclose(m @ f @ m.T, ref, atol=1e-9)
    # orthonormal: inverse is the transpose
    assert np.allclose(m.T @ m, np.eye(8), atol=1e-12)


def test_jpeg_flat_block_round_trip_exact():
    """Block-constant content under the default qtable (DC quantum 8)
    round-trips bit-exactly — the oracle contract."""
    import numpy as np

    from pipes_spark.operators.multimodal import (
        jpeg_block_gray,
        jpeg_decode_gray,
        jpeg_encode_gray,
        sniff_image_header,
    )

    for (h, w, aid) in [(16, 24, 5), (17, 23, 42), (8, 8, 0), (1, 1, 200)]:
        px = jpeg_block_gray(aid, w, h)
        data = jpeg_encode_gray(px)
        fmt, sw, sh, d, ncomp = sniff_image_header(data)
        assert (fmt, sw, sh, d, ncomp) == ("jpeg", w, h, 8, 1)
        assert np.array_equal(jpeg_decode_gray(data), px), (h, w, aid)


def test_jpeg_entropy_layer_bit_exact_on_random_content():
    """decode(encode(x)) must equal the direct quantize→dequantize
    reference EXACTLY: the Huffman/bitstream/marker layers are lossless
    around the lossy core. Also exercises ZRL/EOB and restart markers."""
    import numpy as np

    from pipes_spark.operators.multimodal import (
        jpeg_decode_gray,
        jpeg_encode_gray,
    )

    rng = np.random.default_rng(11)
    q = [8] + [16] * 63
    for trial in range(3):
        h, w = int(rng.integers(9, 60)), int(rng.integers(9, 60))
        px = rng.integers(0, 256, (h, w)).astype(np.uint8)
        got = jpeg_decode_gray(jpeg_encode_gray(px, q))
        assert np.array_equal(got, _jpeg_reference_decode(px, q)), trial
    # sparse high-contrast image: long zero runs -> ZRL symbols
    px = np.zeros((32, 32), dtype=np.uint8)
    px[::9, ::9] = 255
    got = jpeg_decode_gray(jpeg_encode_gray(px, q))
    assert np.array_equal(got, _jpeg_reference_decode(px, q))
    # restart markers every 2 MCUs
    px = rng.integers(0, 256, (24, 40)).astype(np.uint8)
    data = jpeg_encode_gray(px, q, restart_interval=2)
    assert any(bytes([0xFF, 0xD0 + i]) in data for i in range(8))
    assert np.array_equal(jpeg_decode_gray(data), _jpeg_reference_decode(px, q))


def test_jpeg_out_of_scope_files_raise():
    import numpy as np
    import struct

    from pipes_spark.operators.multimodal import (
        jpeg_decode_gray,
        jpeg_encode_gray,
    )

    # SOF2/SOF9 are SUPPORTED since the progressive and arithmetic
    # round trips landed; the remaining rejects are the arithmetic
    # progressive/lossless/differential modes
    with pytest.raises(ValueError, match="arithmetic"):
        jpeg_decode_gray(b"\xff\xd8\xff\xca" + struct.pack(">H", 10) + bytes(8))
    with pytest.raises(ValueError, match="missing SOI"):
        jpeg_decode_gray(b"nope")
    # truncated entropy segment
    px = np.full((8, 8), 77, dtype=np.uint8)
    data = jpeg_encode_gray(px)
    with pytest.raises(ValueError):
        jpeg_decode_gray(data[:-4])


def test_jpeg_decode_stats_matches_content_contract(spark):
    import numpy as np
    from pyspark.sql import functions as F

    from pipes_spark.operators.multimodal import (
        encode_jpeg_assets,
        jpeg_block_gray,
        jpeg_decode_stats,
    )

    d = spark.range(0, 30).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 21 + 1).cast("int").alias("width"),
        (F.col("id") % 17 + 1).cast("int").alias("height"),
        (F.col("id") % 3).cast("int").alias("restart"),
    )
    stats = jpeg_decode_stats(
        encode_jpeg_assets(d, "doc_id", "width", "height", "restart")
    ).collect()
    assert len(stats) == 30
    for r in stats:
        px = jpeg_block_gray(r["asset_id"], r["width"], r["height"])
        assert (r["format"], r["bit_depth"], r["n_components"]) == ("jpeg", 8, 1)
        assert r["n_pixels"] == px.size
        assert r["pixel_sum"] == int(px.sum(dtype=np.int64))


# ---------------------------------------------------------------------------
# WAV PCM + AVI/MJPEG (round-10: multimodal_wav_roundtrip,
# multimodal_video_frame_sample)
# ---------------------------------------------------------------------------


def test_wav_round_trip_and_chunk_walk(spark):
    import struct

    import numpy as np
    from pyspark.sql import functions as F

    from pipes_spark.operators.multimodal import (
        encode_wav_assets,
        wav_decode_stats,
        wav_encode_pcm16,
    )

    d = spark.range(0, 20).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 100 + 10).cast("int").alias("n_samples"),
        F.lit(8000).cast("int").alias("sample_rate"),
        (F.col("id") % 2 + 1).cast("int").alias("channels"),
    )
    stats = wav_decode_stats(
        encode_wav_assets(d, "doc_id", "n_samples", "sample_rate", "channels")
    ).collect()
    assert len(stats) == 20
    for r in stats:
        n = r["n_samples"] * r["n_channels"]
        vals = ((r["asset_id"] + np.arange(n)) * 2557) % 65536 - 32768
        assert r["bit_depth"] == 16 and r["sample_rate"] == 8000
        assert r["sample_sum"] == int(vals.sum())
        assert r["sample_abs_max"] == int(np.abs(vals).max())

    # decoder skips unknown chunks (spec framing) and honors word
    # alignment: splice a 3-byte 'junk' chunk (padded to 4) before data
    raw = wav_encode_pcm16(5, 7, 8000, 1)
    fmt_end = raw.index(b"data")
    spliced = (
        raw[:fmt_end]
        + b"junk" + struct.pack("<I", 3) + b"abc\x00"
        + raw[fmt_end:]
    )
    spliced = (
        spliced[:4]
        + struct.pack("<I", len(spliced) - 8)
        + spliced[8:]
    )
    df = spark.createDataFrame(
        [(5, spliced)], "asset_id long, content binary"
    )
    (r,) = wav_decode_stats(df).collect()
    assert r["n_samples"] == 7

    # non-PCM refused loudly
    bad = bytearray(wav_encode_pcm16(1, 4))
    bad[20] = 3  # fmt tag -> IEEE float
    df2 = spark.createDataFrame([(1, bytes(bad))], "asset_id long, content binary")
    with pytest.raises(Exception, match="16-bit PCM"):
        wav_decode_stats(df2).collect()


def test_avi_mjpeg_frame_sample_decodes_real_frames(spark):
    import numpy as np
    from pyspark.sql import functions as F

    from pipes_spark.operators.multimodal import (
        avi_frame_sample_stats,
        encode_avi_assets,
        jpeg_block_gray,
    )

    d = spark.range(0, 12).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 13 + 1).cast("int").alias("width"),
        (F.col("id") % 11 + 1).cast("int").alias("height"),
        (F.col("id") % 4 + 2).cast("int").alias("n_frames"),
    )
    rows = avi_frame_sample_stats(
        encode_avi_assets(d, "doc_id", "width", "height", "n_frames"),
        every_k=2,
    ).collect()
    by_asset: dict = {}
    for r in rows:
        by_asset.setdefault(r["asset_id"], []).append(r)
    assert set(by_asset) == set(range(12))
    for aid, rs in by_asset.items():
        nf = aid % 4 + 2
        assert [r["frame_no"] for r in sorted(rs, key=lambda x: x["frame_no"])] == list(
            range(0, nf, 2)
        )
        for r in rs:
            px = jpeg_block_gray(aid + 11 * r["frame_no"], r["width"], r["height"])
            assert r["pixel_sum"] == int(px.sum(dtype=np.int64))


def test_avi_index_mismatch_raises(spark):
    import struct

    from pipes_spark.operators.multimodal import (
        avi_frame_sample_stats,
        avi_mjpeg_encode,
    )

    raw = bytearray(avi_mjpeg_encode(3, 9, 7, 3))
    i = raw.rindex(b"idx1")
    # corrupt the first index entry's offset field
    off_pos = i + 8 + 8
    (old,) = struct.unpack("<I", raw[off_pos : off_pos + 4])
    raw[off_pos : off_pos + 4] = struct.pack("<I", old + 2)
    sdf = spark.createDataFrame([(3, bytes(raw))], "asset_id long, content binary")
    with pytest.raises(Exception, match="idx1 entry mismatch"):
        avi_frame_sample_stats(sdf).collect()


def test_jpeg_optimized_huffman_tables_annex_k2():
    """optimize_huffman=True: Annex-K.2 per-image tables must decode to
    the identical pixels while compressing markedly better, including
    with restart markers and on flat-block exact content."""
    import numpy as np

    from pipes_spark.operators.multimodal import (
        jpeg_block_gray,
        jpeg_decode_gray,
        jpeg_encode_gray,
    )

    rng = np.random.default_rng(5)
    q = [8] + [16] * 63
    for trial in range(3):
        h, w = int(rng.integers(9, 80)), int(rng.integers(9, 80))
        px = rng.integers(0, 256, (h, w)).astype(np.uint8)
        fixed = jpeg_encode_gray(px, q)
        opt = jpeg_encode_gray(px, q, optimize_huffman=True)
        assert np.array_equal(jpeg_decode_gray(opt), jpeg_decode_gray(fixed))
        assert len(opt) < len(fixed), trial
    px = jpeg_block_gray(42, 23, 17)
    data = jpeg_encode_gray(px, restart_interval=2, optimize_huffman=True)
    assert np.array_equal(jpeg_decode_gray(data), px)


def test_jpeg_optimal_table_is_valid_canonical():
    """The K.2 output must be a valid length-limited prefix code: Kraft
    sum ≤ 1, ≤16-bit lengths, reserved all-ones code never assigned."""
    from pipes_spark.operators.multimodal import (
        _jpeg_canonical_codes,
        _jpeg_optimal_table,
    )

    # adversarial frequency shapes incl. a deep skew (forces >16-bit
    # lengths pre-adjustment: fibonacci-ish growth)
    shapes = []
    f = [0] * 257
    a, b = 1, 1
    for s in range(30):
        f[s] = a
        a, b = b, a + b
    f[256] = 1
    shapes.append(f)
    shapes.append([1] * 257)
    g = [0] * 257
    g[3] = 1000
    g[256] = 1
    shapes.append(g)
    for freq in shapes:
        bits, vals = _jpeg_optimal_table(list(freq))
        assert len(bits) == 16 and sum(bits) == len(vals)
        assert sum(n * 2 ** (16 - ln) for ln, n in zip(range(1, 17), bits)) <= 2**16
        codes = _jpeg_canonical_codes(bits, vals)
        assert len(codes) == len(vals)
        for sym, (ln, code) in codes.items():
            assert code < (1 << ln) - (1 if ln == 16 else 0) or ln < 16
        # every symbol with nonzero frequency (except the reserve) present
        expect = {s for s in range(256) if freq[s] > 0}
        assert set(vals) == expect


def test_audio_pcm_features_deinterleaves_channels(spark):
    """A stereo signal whose interleaved-order zero-crossing count
    differs from the per-channel count: ch0 constant +1000, ch1 constant
    -1000 — interleaved order crosses at EVERY step, per-channel never.
    The operator must report 0."""
    import numpy as np

    from pipes_spark.operators.multimodal import audio_pcm_features

    import struct

    n = 50
    samples = np.empty(n * 2, dtype="<i2")
    samples[0::2] = 1000
    samples[1::2] = -1000
    data = samples.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 2, 8000, 32000, 4, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    wav = b"RIFF" + struct.pack("<I", len(body)) + body
    df = spark.createDataFrame([(9, wav)], "asset_id long, content binary")
    (r,) = audio_pcm_features(df).collect()
    assert r["n_channels"] == 2 and r["n_samples"] == n
    assert r["zero_crossings"] == 0  # interleaved reading would give 2n-1
    assert r["peak"] == 1000
    assert r["duration_us"] == n * 1_000_000 // 8000
    assert r["rms"] == 1000.0


def test_image_ahash_is_codec_independent(spark):
    """The SAME picture through png/gif/jpeg byte streams must produce
    the identical aHash — the cross-format re-encode dedup primitive —
    and a DIFFERENT picture must differ."""
    from pyspark.sql import functions as F

    from pipes_spark.operators.multimodal import encode_image_assets, image_ahash

    rows = []
    for aid, codec in [(100, "png"), (100, "gif"), (100, "jpeg"), (230, "png")]:
        rows.append((aid, 64, 64, codec))
    # distinct asset_id per row so hashes are attributable
    d = spark.createDataFrame(
        [(i, a, w, h, c) for i, (a, w, h, c) in enumerate(rows)],
        "row_id long, content_id long, width int, height int, codec string",
    ).select(
        F.col("row_id").alias("doc_id"),
        "content_id",
        "width",
        "height",
        "codec",
    )
    # encode_image_assets keys content on id: re-key so rows 0-2 share
    # content 100 and row 3 carries content 230 (whose
    # lattice WRAPS mid-image — aHash is brightness-invariant, so an
    # unwrapped shifted ramp would hash identically by design)
    enc = encode_image_assets(
        d.select(F.col("content_id").alias("doc_id"), "width", "height", "codec"),
        "doc_id",
        "width",
        "height",
        "codec",
    )
    got = image_ahash(enc).collect()
    hashes = {}
    for r in got:
        hashes.setdefault(r["asset_id"], set()).add(r["ahash_bits"])
    assert len(hashes[100]) == 1  # png == gif == jpeg
    assert hashes[230] != hashes[100]
    fmts = {r["format"] for r in got if r["asset_id"] == 100}
    assert fmts == {"png", "gif", "jpeg"}


def test_image_ahash_stable_under_lossy_jpeg_noise():
    """aHash's job: small pixel perturbations (lossy JPEG of a NON-flat
    image) leave the hash within a few bits of the lossless PNG hash,
    while a different image is far away — computed driver-side on the
    raw operators."""
    import numpy as np

    from pipes_spark.operators.multimodal import (
        decode_image_gray,
        jpeg_encode_gray,
    )

    rng = np.random.default_rng(2)
    base = np.clip(
        rng.integers(0, 140, (64, 64)).astype(np.int32)
        + np.repeat(np.arange(64)[:, None], 64, 1),
        0,
        255,
    ).astype(np.uint8)

    def ahash(px):
        cells = px.reshape(8, 8, 8, 8).transpose(0, 2, 1, 3).reshape(8, 8, 64)
        means = cells.mean(axis=2)
        mu = means.mean()
        return "".join(
            "1" if means[r, c] > mu else "0" for r in range(8) for c in range(8)
        )

    exact = ahash(base.astype(np.float64))
    lossy_px = decode_image_gray(jpeg_encode_gray(base, [8] + [16] * 63))
    lossy = ahash(lossy_px.astype(np.float64))
    dist = sum(a != b for a, b in zip(exact, lossy))
    assert dist <= 6, dist
    other = ahash(base[::-1, ::-1].astype(np.float64))
    far = sum(a != b for a, b in zip(exact, other))
    assert far > 10, far


# ---------------------------------------------------------------------------
# Pure-Python snappy (round-10: avro snappy codec)
# ---------------------------------------------------------------------------


def test_snappy_decompress_handles_all_element_types():
    """Hand-build a stream from the spec's element grammar: literal,
    copy-1 (with the 3-bit length and split offset), copy-2, copy-4,
    and an OVERLAPPING copy (offset < length — the run-length trick)."""
    from pipes_spark.sources.snappy_codec import snappy_decompress

    expected = b"abcdefgh" + b"abcd" + b"efgh" + b"x" * 10
    stream = bytearray()
    stream.append(len(expected))  # varint length (< 128)
    # literal "abcdefgh": tag (8-1)<<2 | 00
    stream.append((8 - 1) << 2)
    stream += b"abcdefgh"
    # copy-1: length 4, offset 8 -> tag 01 | (4-4)<<2 | (0)<<5 ; byte 8
    stream.append(0x01)
    stream.append(8)
    # copy-2: length 4, offset 8 -> tag 10 | (4-1)<<2 ; 2-byte LE offset
    stream.append(0x02 | ((4 - 1) << 2))
    stream += (8).to_bytes(2, "little")
    # literal "x"
    stream.append(0)
    stream += b"x"
    # overlapping copy-4: length 9, offset 1 (repeats 'x')
    stream.append(0x03 | ((9 - 1) << 2))
    stream += (1).to_bytes(4, "little")
    assert snappy_decompress(bytes(stream)) == expected

    with pytest.raises(ValueError, match="offset out of range"):
        snappy_decompress(bytes([4, 0x01, 200]))
    with pytest.raises(ValueError, match="declared"):
        snappy_decompress(bytes([99, (8 - 1) << 2]) + b"abcdefgh")


def test_snappy_round_trip_and_long_literals():
    import random

    from pipes_spark.sources.snappy_codec import (
        snappy_compress,
        snappy_decompress,
    )

    rng = random.Random(3)
    for n in (0, 1, 59, 60, 61, 255, 256, 65535, 65536, 200_000):
        data = bytes(rng.randrange(256) for _ in range(min(n, 4096))) * (
            max(1, n // 4096)
        )
        data = data[:n]
        assert snappy_decompress(snappy_compress(data)) == data, n


def test_avro_snappy_codec_round_trip(tmp_path):
    """Avro container with codec=snappy: write (literal-stream snappy +
    big-endian CRC32 framing) and read back value-exact; a corrupted
    CRC raises."""
    from pipes_spark.sources.avro import _iter_range_rows, write_avro_file

    schema = {
        "type": "record",
        "name": "R",
        "fields": [
            {"name": "a", "type": "long"},
            {"name": "s", "type": "string"},
        ],
    }
    rows = [(i, f"value-{i}") for i in range(500)]
    p = str(tmp_path / "s.avro")
    write_avro_file(p, schema, rows, codec="snappy", block_rows=64)
    assert list(_iter_range_rows(p, 0, 10**9)) == rows

    raw = bytearray(open(p, "rb").read())
    # the last block's CRC32 is the 4 bytes just before the trailing
    # 16-byte sync marker
    raw[-18] ^= 0xFF
    q = str(tmp_path / "bad.avro")
    open(q, "wb").write(bytes(raw))
    with pytest.raises(ValueError, match="CRC32 mismatch|snappy"):
        list(_iter_range_rows(q, 0, 10**9))


# ---------------------------------------------------------------------------
# Color JPEG (round-10: multimodal_jpeg_color_roundtrip)
# ---------------------------------------------------------------------------


def _jpeg_color_reference(rgb, sub):
    """Direct YCbCr → subsample → quantize→dequantize → upsample → RGB
    reference (the lossy core without the file/entropy layers)."""
    import numpy as np

    from pipes_spark.operators.multimodal import _jpeg_dct_matrix

    m = _jpeg_dct_matrix()
    px = rgb.astype(np.float64)
    h, w = px.shape[:2]
    hs = 2 if sub in ("420", "422") else 1
    vs = 2 if sub == "420" else 1
    mcus_x = (w + 8 * hs - 1) // (8 * hs)
    mcus_y = (h + 8 * vs - 1) // (8 * vs)
    ph, pw = mcus_y * 8 * vs, mcus_x * 8 * hs
    p = np.pad(px, ((0, ph - h), (0, pw - w), (0, 0)), mode="edge")
    r_, g_, b_ = p[..., 0], p[..., 1], p[..., 2]
    y = 0.299 * r_ + 0.587 * g_ + 0.114 * b_
    cb = 128 - 0.168736 * r_ - 0.331264 * g_ + 0.5 * b_
    cr = 128 + 0.5 * r_ - 0.418688 * g_ - 0.081312 * b_
    if vs == 2:
        cb = cb.reshape(ph // 2, 2, pw).mean(axis=1)
        cr = cr.reshape(ph // 2, 2, pw).mean(axis=1)
    if hs == 2:
        cb = cb.reshape(cb.shape[0], pw // 2, 2).mean(axis=2)
        cr = cr.reshape(cr.shape[0], pw // 2, 2).mean(axis=2)
    q = np.asarray([8] + [16] * 63).reshape(8, 8).astype(np.int32)

    def rt(plane):
        bh, bw = plane.shape[0] // 8, plane.shape[1] // 8
        blocks = (
            plane.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
            - 128
        )
        F_ = np.einsum("ux,nxy,vy->nuv", m, blocks, m)
        deq = np.round(F_ / q[None]).astype(np.int64) * q[None]
        sp = np.einsum("xu,nuv,yv->nxy", m.T, deq.astype(np.float64), m.T) + 128
        return (
            sp.reshape(bh, bw, 8, 8).transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
        )

    y2, cb2, cr2 = rt(y), rt(cb), rt(cr)
    if vs == 2:
        cb2 = np.repeat(cb2, 2, 0)
        cr2 = np.repeat(cr2, 2, 0)
    if hs == 2:
        cb2 = np.repeat(cb2, 2, 1)
        cr2 = np.repeat(cr2, 2, 1)
    y2, cb2, cr2 = y2[:h, :w], cb2[:h, :w], cr2[:h, :w]
    rr = y2 + 1.402 * (cr2 - 128)
    gg = y2 - 0.344136 * (cb2 - 128) - 0.714136 * (cr2 - 128)
    bb = y2 + 1.772 * (cb2 - 128)
    return np.stack(
        [np.clip(np.round(c), 0, 255).astype(np.uint8) for c in (rr, gg, bb)],
        axis=2,
    )


def test_jpeg_color_gray_valued_round_trip_exact():
    """Gray-valued RGB (Cb = Cr = 128 exactly) through 4:2:0 and 4:4:4
    round-trips bit-exactly — the color hash-gate contract — including
    with restart markers."""
    import numpy as np

    from pipes_spark.operators.multimodal import (
        jpeg_block_gray,
        jpeg_decode,
        jpeg_encode_color,
        sniff_image_header,
    )

    for (aid, w, h) in [(5, 23, 17), (42, 16, 16), (0, 1, 1), (200, 9, 31)]:
        rgb = np.stack([jpeg_block_gray(aid, w, h)] * 3, axis=2)
        data = jpeg_encode_color(rgb, "420")
        fmt, sw, sh, _d, ncomp = sniff_image_header(data)
        assert (fmt, sw, sh, ncomp) == ("jpeg", w, h, 3)
        assert np.array_equal(jpeg_decode(data), rgb), (aid, w, h)
    rgb = np.stack([jpeg_block_gray(7, 19, 21)] * 3, axis=2)
    assert np.array_equal(jpeg_decode(jpeg_encode_color(rgb, "444")), rgb)
    assert np.array_equal(jpeg_decode(jpeg_encode_color(rgb, "422")), rgb)
    assert np.array_equal(
        jpeg_decode(jpeg_encode_color(rgb, "420", restart_interval=2)), rgb
    )


def test_jpeg_color_entropy_layer_bit_exact_on_chroma_rich_content():
    """Random COLOR content: the full file round trip must equal the
    direct quantize→dequantize reference exactly, for 4:4:4 and 4:2:0 —
    the interleaved-MCU entropy layer is lossless around the lossy
    core, chroma included."""
    import numpy as np

    from pipes_spark.operators.multimodal import jpeg_decode, jpeg_encode_color

    rng = np.random.default_rng(9)
    for sub in ("444", "422", "420"):
        for trial in range(2):
            h, w = int(rng.integers(9, 50)), int(rng.integers(9, 50))
            rgb = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
            got = jpeg_decode(jpeg_encode_color(rgb, sub))
            assert np.array_equal(got, _jpeg_color_reference(rgb, sub)), (
                sub,
                trial,
            )


def test_jpeg_decode_gray_wrapper_rejects_color():
    import numpy as np

    from pipes_spark.operators.multimodal import (
        jpeg_decode_gray,
        jpeg_encode_color,
    )

    rgb = np.full((8, 8, 3), 77, dtype=np.uint8)
    with pytest.raises(ValueError, match="color JPEG"):
        jpeg_decode_gray(jpeg_encode_color(rgb, "420"))


# ---------------------------------------------------------------------------
# Progressive JPEG (round-10: multimodal_jpeg_progressive_roundtrip)
# ---------------------------------------------------------------------------

_PROG_SCRIPTS = {
    "default": None,
    "deep": (
        (0, 0, 0, 2), (1, 5, 0, 2), (6, 63, 0, 2),
        (0, 0, 2, 1), (1, 5, 2, 1), (6, 63, 2, 1),
        (0, 0, 1, 0), (1, 5, 1, 0), (6, 63, 1, 0),
    ),
    "no-sa": ((0, 0, 0, 0), (1, 20, 0, 0), (21, 63, 0, 0)),
    "three-band": (
        (0, 0, 0, 1), (1, 2, 0, 1), (3, 10, 0, 1), (11, 63, 0, 1),
        (0, 0, 1, 0), (1, 2, 1, 0), (3, 10, 1, 0), (11, 63, 1, 0),
    ),
}


def test_jpeg_progressive_equals_baseline_decode():
    """Progressive decode must equal baseline decode bit-for-bit (both
    reconstruct the same quantized coefficients) — across scan scripts
    with/without successive approximation, split bands, and the four
    content kinds that exercise EOB runs, ZRLs, and correction bits."""
    import numpy as np

    from pipes_spark.operators.multimodal import (
        jpeg_decode,
        jpeg_encode_gray,
        jpeg_encode_progressive,
    )

    q = [8] + [16] * 63
    rng = np.random.default_rng(99)
    for trial in range(12):
        h, w = int(rng.integers(8, 90)), int(rng.integers(8, 90))
        kind = trial % 4
        if kind == 0:
            px = rng.integers(0, 256, (h, w)).astype(np.uint8)
        elif kind == 1:
            y, x = np.mgrid[0:h, 0:w]
            px = ((x * 2 + y * 3) % 256).astype(np.uint8)
        elif kind == 2:
            px = np.zeros((h, w), dtype=np.uint8)
            px[::7, ::5] = 255
        else:
            px = (rng.integers(0, 2, (h, w)) * 255).astype(np.uint8)
        baseline = jpeg_decode(jpeg_encode_gray(px, q))
        for name, sc in _PROG_SCRIPTS.items():
            kw = {} if sc is None else {"scans": sc}
            prog = jpeg_decode(jpeg_encode_progressive(px, q, **kw))
            assert np.array_equal(prog, baseline), (trial, name)


def test_jpeg_progressive_flat_blocks_exact():
    import numpy as np

    from pipes_spark.operators.multimodal import (
        jpeg_block_gray,
        jpeg_decode,
        jpeg_encode_progressive,
        sniff_image_header,
    )

    px = jpeg_block_gray(42, 23, 17)
    data = jpeg_encode_progressive(px)
    fmt, w, h, _d, ncomp = sniff_image_header(data)
    assert (fmt, w, h, ncomp) == ("jpeg", 23, 17, 1)
    assert np.array_equal(jpeg_decode(data), px)


def test_jpeg_progressive_rejects_mixed_dc_ac_scan():
    import numpy as np

    from pipes_spark.operators.multimodal import jpeg_encode_progressive

    px = np.full((8, 8), 50, dtype=np.uint8)
    with pytest.raises(ValueError, match="cannot mix DC and AC"):
        jpeg_encode_progressive(px, scans=((0, 63, 0, 0),))


def test_jpeg_progressive_color_equals_baseline_color_decode():
    """Round 11: progressive COLOR decode must equal the baseline color
    decode bit-for-bit on arbitrary chroma-rich content — interleaved
    DC scans (first + refinement, per-component predictors over the MCU
    grid incl. padding blocks), non-interleaved AC scans over each
    component's true data units, across all three chroma geometries and
    both the canonical 8-scan script and the 15-scan split-band
    ladder."""
    import numpy as np

    from pipes_spark.operators.multimodal import (
        _JPEG_PROG_COLOR_DEEP_SCANS,
        jpeg_decode,
        jpeg_encode_color,
        jpeg_encode_progressive_color,
    )

    rng = np.random.default_rng(4)
    for trial in range(9):
        h, w = int(rng.integers(8, 70)), int(rng.integers(8, 70))
        rgb = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
        sub = ("420", "422", "444")[trial % 3]
        baseline = jpeg_decode(jpeg_encode_color(rgb, sub))
        for scans in (None, _JPEG_PROG_COLOR_DEEP_SCANS):
            kw = {} if scans is None else {"scans": scans}
            prog = jpeg_decode(jpeg_encode_progressive_color(rgb, sub, **kw))
            assert np.array_equal(prog, baseline), (trial, sub, scans is None)


def test_g711_companding_involution_and_bounds():
    """Round 11: G.711 µ-law/A-law — encode must be the exact inverse of
    the decode tables (all 256 A-law codes; all µ-law codes except the
    canonical negative zero 0x7F, which re-encodes as 0xFF), and the
    decode(encode(x)) quantization error must stay within half the top
    segment step."""
    import numpy as np

    from pipes_spark.operators.multimodal import (
        g711_alaw_decode_table,
        g711_alaw_encode,
        g711_ulaw_decode_table,
        g711_ulaw_encode,
    )

    ut, at = g711_ulaw_decode_table(), g711_alaw_decode_table()
    assert [c for c in range(256) if g711_ulaw_encode(ut)[c] != c] == [0x7F]
    assert [c for c in range(256) if g711_alaw_encode(at)[c] != c] == []
    assert ut[0xFF] == 0 and at[0xD5] == 8  # spec anchors
    xs = np.arange(-32635, 32636, 3)
    assert np.abs(ut[g711_ulaw_encode(xs)] - xs).max() <= 512
    xa = np.arange(-32767, 32768, 3)
    assert np.abs(at[g711_alaw_encode(xa)] - xa).max() <= 512


def test_g711_wav_decodes_through_generic_real_mode(spark):
    """A G.711 WAV asset must flow through the generic sniff-and-dispatch
    real mode (extract_features fake=False) like any other engine
    codec."""
    import numpy as np

    from pipes_spark.operators.multimodal import (
        encode_wav_g711_assets,
        extract_features,
        g711_alaw_decode_table,
        g711_ulaw_decode_table,
    )

    d = spark.createDataFrame(
        [(0, 300, 8000, "ulaw"), (1, 300, 8000, "alaw")],
        "doc_id long, n_samples int, sample_rate int, law string",
    )
    assets = encode_wav_g711_assets(d)
    feats = {r.asset_id: r for r in extract_features(assets, fake=False).collect()}
    for aid, table in ((0, g711_ulaw_decode_table()), (1, g711_alaw_decode_table())):
        codes = (aid * 7 + np.arange(300) * 13) % 256
        want = table[codes]
        assert feats[aid].format == "wav"
        assert feats[aid].val_sum == int(want.sum())
        assert feats[aid].n_values == 300


def test_avi_dib_frame_sampling_matches_reference(spark):
    """Round 11: uncompressed 'DIB ' AVI — bottom-up rows, 4-byte stride
    padding, 256-entry palette — must decode to exactly the encoded
    lattice at every stride residue, through the same sampler operator
    as MJPEG."""
    import numpy as np

    from pipes_spark.operators.multimodal import (
        avi_frame_sample_stats,
        encode_avi_dib_assets,
    )

    rows = [(w, (w % 4) + 3, 3) for w in (5, 6, 7, 8)]  # all stride residues
    d = spark.createDataFrame(
        [(i, w, h, nf) for i, (w, h, nf) in enumerate(rows)],
        "doc_id long, width int, height int, n_frames int",
    )
    got = {
        (r.asset_id, r.frame_no): (r.width, r.height, r.pixel_sum)
        for r in avi_frame_sample_stats(
            encode_avi_dib_assets(d), every_k=1
        ).collect()
    }
    for aid, (w, h, nf) in enumerate(rows):
        for f in range(nf):
            i = np.arange(w * h, dtype=np.int64)
            want = int(((aid + 11 * f + i) % 256).sum())
            assert got[(aid, f)] == (w, h, want), (aid, f)


def test_avi_unknown_handler_raises(spark):
    import struct

    from pipes_spark.operators.multimodal import (
        avi_frame_sample_stats,
        avi_dib_encode,
    )

    b = bytearray(avi_dib_encode(1, 8, 8, 2))
    pos = b.find(b"vids" + b"DIB ")
    b[pos + 4 : pos + 8] = b"H264"
    d = spark.createDataFrame(
        [(1, bytes(b))], "asset_id long, content binary"
    )
    import pytest as _pytest

    with _pytest.raises(Exception, match="unsupported video handler"):
        avi_frame_sample_stats(d, every_k=1).collect()


def test_jpeg_progressive_color_block_lattice_bit_exact():
    """Gray-valued RGB block-constant content (Cb = Cr = 128 exactly)
    must round-trip bit-exactly through progressive color — the
    hash-gate contract, checked here for every subsampling at odd
    dims."""
    import numpy as np

    from pipes_spark.operators.multimodal import (
        jpeg_block_gray,
        jpeg_decode,
        jpeg_encode_progressive_color,
        sniff_image_header,
    )

    gray = jpeg_block_gray(42, 23, 17)
    rgb = np.stack([gray] * 3, axis=2)
    for sub in ("420", "422", "444"):
        data = jpeg_encode_progressive_color(rgb, sub)
        fmt, w, h, _d, ncomp = sniff_image_header(data)
        assert (fmt, w, h, ncomp) == ("jpeg", 23, 17, 3)
        assert np.array_equal(jpeg_decode(data), rgb)


# ---------------------------------------------------------------------------
# Prefix-doubling exact duplicate detection (round-10: dedup_prefix_doubling)
# ---------------------------------------------------------------------------


def test_prefix_doubling_matches_bruteforce_reference(spark):
    """Rank algebra must reproduce byte-exact substring equality: compare
    against a literal gram-counting reference, including a non-power-of-
    two L (sparse-table composite), cross-doc duplication, a doc shorter
    than L, and within-doc repeats."""
    from collections import Counter

    from pipes_spark.operators.dedup import prefix_doubling_duplicates

    texts = {
        1: "the quick brown fox jumps over the lazy dog",
        2: "a different text with the quick brown fox inside it",
        3: "completely unique content here with nothing shared at all",
        4: "short",
        5: "abcabcabcabcabcabcabcabcabc",  # within-doc period-3 repeats
    }
    docs = spark.createDataFrame(list(texts.items()), ["doc_id", "text"])
    for L in (19, 16, 8):
        rows = {
            r["doc_id"]: r.asDict()
            for r in prefix_doubling_duplicates(docs, min_len=L).collect()
        }
        grams: Counter = Counter()
        for t in texts.values():
            for p in range(len(t) - L + 1):
                grams[t[p : p + L]] += 1
        for d, t in texts.items():
            n = max(0, len(t) - L + 1)
            if n == 0:
                assert d not in rows or rows[d]["n_grams"] == 0
                continue
            dups = [p for p in range(n) if grams[t[p : p + L]] >= 2]
            got = rows[d]
            assert got["n_grams"] == n, (L, d)
            assert got["n_duplicated"] == len(dups), (L, d)
            assert got["first_dup_pos"] == (dups[0] if dups else None), (L, d)


def test_prefix_doubling_rejects_tiny_min_len(spark):
    from pipes_spark.operators.dedup import prefix_doubling_duplicates

    docs = spark.createDataFrame([(1, "abc")], ["doc_id", "text"])
    with pytest.raises(ValueError, match="min_len"):
        prefix_doubling_duplicates(docs, min_len=1)


def test_prefix_doubling_gated_identity(spark):
    """Round 11 (VERDICT r10 ask #4): the winnowing-gated fast path must
    return EXACTLY the ungated operator's rows on a corpus planting every
    failure mode of a candidate filter — cross-doc duplicates, a
    WITHIN-doc overlapping repeat (per-doc-distinct fingerprints would
    miss it), a case-sensitive near-miss that IS a candidate but NOT a
    true duplicate (false candidates re-enter the exact path), unique
    docs (the pruned mass), and a too-short doc."""
    from pipes_spark.operators.dedup import (
        prefix_doubling_candidates,
        prefix_doubling_duplicates,
        prefix_doubling_duplicates_gated,
    )

    shared = "The SHARED thirty-plus character duplicated passage X7."
    texts = {
        1: "lead-in text then " + shared + " and a tail of its own here",
        2: shared + " appears right at the start of this other document",
        3: "ab" * 40,  # within-doc overlapping period-2 repeats
        4: "zqj kvw xbt this one-off piece holds zero echoes, not even "
        "an octet borrowed from its neighbors, promise",
        5: "another fully unique body whose words never form a long "
        "duplicated span shared with any sibling document",
        # case flip inside an otherwise-shared >=23-char region: the
        # case-sensitive gate may or may not flag it, but the exact pass
        # must agree with the ungated operator either way
        6: "lead-in text then " + shared.replace("X7", "x7") + " tail",
        7: "short",
    }
    docs = spark.createDataFrame(list(texts.items()), ["doc_id", "text"])
    want = {
        r["doc_id"]: r.asDict()
        for r in prefix_doubling_duplicates(docs, min_len=30).collect()
    }
    got = {
        r["doc_id"]: r.asDict()
        for r in prefix_doubling_duplicates_gated(docs, min_len=30).collect()
    }
    assert got == want
    # the gate actually prunes: unique docs 4/5 must not be candidates
    cand = {
        r["doc_id"]
        for r in prefix_doubling_candidates(docs, min_len=30).collect()
    }
    assert {1, 2, 3} <= cand
    assert not {4, 5} & cand

    # second sweep at a non-power-of-two L with a tighter window
    want = {
        r["doc_id"]: r.asDict()
        for r in prefix_doubling_duplicates(docs, min_len=19).collect()
    }
    got = {
        r["doc_id"]: r.asDict()
        for r in prefix_doubling_duplicates_gated(
            docs, min_len=19, k=4, w=8
        ).collect()
    }
    assert got == want


def test_prefix_doubling_gate_rejects_bad_window(spark):
    from pipes_spark.operators.dedup import prefix_doubling_candidates

    docs = spark.createDataFrame([(1, "abc" * 20)], ["doc_id", "text"])
    with pytest.raises(ValueError, match="recall guarantee"):
        prefix_doubling_candidates(docs, min_len=20, k=8, w=16)
