"""Round-11 optimization-round tests: operator internals changed for
performance must keep byte-identical semantics (the no-result-change
contract of the optimization rounds)."""

from __future__ import annotations

from collections import Counter

import pytest


# ---------------------------------------------------------------------------
# prefix_doubling_duplicates: radix base case (direct-gram path for
# L <= direct_width, radix-16 initial ranks + doubling beyond)
# ---------------------------------------------------------------------------


TEXTS = {
    1: "the quick brown fox jumps over the lazy dog and the quick brown fox returns",
    2: "a different text with the quick brown fox jumps over the lazy dog inside it",
    3: "completely unique content here with nothing shared at all among documents",
    4: "short",
    5: "abcabcabcabcabcabcabcabcabcabcabcabcabcabcabcabcabc",  # period-3 repeats
}


def _reference(L):
    grams = Counter()
    for t in TEXTS.values():
        for p in range(len(t) - L + 1):
            grams[t[p : p + L]] += 1
    out = {}
    for d, t in TEXTS.items():
        n = max(0, len(t) - L + 1)
        if n == 0:
            continue
        dups = [p for p in range(n) if grams[t[p : p + L]] >= 2]
        out[d] = (n, len(dups), dups[0] if dups else None)
    return out


@pytest.mark.parametrize("L", [40, 36])
def test_prefix_doubling_radix_doubling_path_matches_bruteforce(spark, L):
    """L > direct_width exercises the radix-16 base + doubling loop
    (h=16 -> 32, sparse composite) — the path the graded L=30 query no
    longer takes; pin it against the literal gram-counting reference."""
    from pipes_spark.operators.dedup import prefix_doubling_duplicates

    docs = spark.createDataFrame(list(TEXTS.items()), ["doc_id", "text"])
    rows = {
        r["doc_id"]: (r["n_grams"], r["n_duplicated"], r["first_dup_pos"])
        for r in prefix_doubling_duplicates(docs, min_len=L).collect()
    }
    assert rows == _reference(L)


def test_prefix_doubling_direct_and_doubling_paths_identical(spark):
    """The two physical paths are the SAME operator: forcing the same L
    through the direct-gram path (direct_width >= L) and the doubling
    path (direct_width < L) must return identical rows."""
    from pipes_spark.operators.dedup import prefix_doubling_duplicates

    docs = spark.createDataFrame(list(TEXTS.items()), ["doc_id", "text"])
    L = 20
    direct = {
        r["doc_id"]: (r["n_grams"], r["n_duplicated"], r["first_dup_pos"])
        for r in prefix_doubling_duplicates(
            docs, min_len=L, direct_width=32
        ).collect()
    }
    doubled = {
        r["doc_id"]: (r["n_grams"], r["n_duplicated"], r["first_dup_pos"])
        for r in prefix_doubling_duplicates(
            docs, min_len=L, direct_width=8
        ).collect()
    }
    assert direct == doubled == _reference(L)


# ---------------------------------------------------------------------------
# codec round trips: the final orderBy was replaced by a range-sorted INPUT
# (operators.scale.presorted_min_partitions) because a global sort's
# RangePartitioner samples its child with a separate job — executing the
# whole encode->decode Python chain twice.  The rewrite is only sound if
# every converted query still emits rows in EXACTLY the order the dropped
# orderBy produced; pin that here over the real testdata.
# ---------------------------------------------------------------------------

CONVERTED_ORDER = {
    "multimodal_png_roundtrip": ("asset_id",),
    "multimodal_gif_roundtrip": ("asset_id",),
    "multimodal_jpeg_roundtrip": ("asset_id",),
    "multimodal_jpeg_color_roundtrip": ("asset_id",),
    "multimodal_jpeg_progressive_roundtrip": ("asset_id",),
    "multimodal_jpeg_progressive_color_roundtrip": ("asset_id",),
    "multimodal_jpeg_arith_roundtrip": ("asset_id",),
    "multimodal_jpeg_lossless_roundtrip": ("asset_id",),
    "multimodal_jpeg_hierarchical_roundtrip": ("asset_id",),
    "multimodal_wav_roundtrip": ("asset_id",),
    "multimodal_g711_roundtrip": ("asset_id",),
    "multimodal_flac_roundtrip": ("asset_id",),
    "multimodal_adpcm_roundtrip": ("asset_id",),
    "multimodal_aiff_roundtrip": ("asset_id",),
    "multimodal_bmp_roundtrip": ("asset_id",),
    "multimodal_tiff_roundtrip": ("asset_id",),
    "multimodal_audio_features": ("asset_id",),
    "multimodal_cross_codec_ahash": ("asset_id",),
    "multimodal_video_frame_sample": ("asset_id", "frame_no"),
    "multimodal_video_dib_frame_sample": ("asset_id", "frame_no"),
    "multimodal_video_rle_frame_sample": ("asset_id", "frame_no"),
    "multimodal_video_screen_frames": ("asset_id", "frame_no"),
    # the extraction kernel sorts each asset's rows by (ifd, tag_id)
    # before emitting, so the range-sorted input yields the full order
    "multimodal_exif_metadata": ("asset_id", "ifd", "tag_id"),
    # second conversion wave (driver-gate wall time): same pattern
    "multimodal_resize": ("asset_id", "y", "x"),
    "multimodal_wav_depths_roundtrip": ("asset_id",),
    "multimodal_png_filters_roundtrip": ("asset_id",),
    "multimodal_gif_animation_frames": ("asset_id", "frame_no"),
    "multimodal_subtitle_cues": ("asset_id", "cue_no"),
    # kernel emits per-asset rows pre-sorted by (block_type, item)
    "multimodal_flac_metadata": ("asset_id", "block_type", "item"),
}


@pytest.mark.parametrize("name", sorted(CONVERTED_ORDER))
def test_converted_codec_query_output_is_globally_sorted(spark, name):
    """Collected row order must equal the order the dropped orderBy gave:
    ascending by the declared keys (unique per row for every converted
    query, so the expected order is total and unambiguous)."""
    from pipes_spark.catalog import QUERIES

    keys = CONVERTED_ORDER[name]
    rows = QUERIES[name].fn(spark, "/root/testdata/sf0.001").collect()
    assert rows, name
    got = [tuple(r[k] for k in keys) for r in rows]
    assert got == sorted(got), f"{name}: output no longer globally sorted"
    assert len(set(got)) == len(got), f"{name}: sort keys not unique"
