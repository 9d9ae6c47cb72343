"""Multimodal-column operators: image/audio/video as opaque ``binary``
columns with typed metadata (SURVEY.md §2.C extensions).

The Spark-side plumbing — schema, Arrow batch shape, mapInPandas signatures,
partition sizing — is real and tested. Image codecs are REAL and implemented
from their public specs (no codec library in this container): PNG (stdlib
zlib; round 9), GIF89a with a from-the-spec variable-width LZW (round 10),
JPEG per ITU-T T.81 — baseline grayscale, three-component YCbCr color with
4:2:0/4:2:2/4:4:4 subsampling, AND progressive (SOF2: spectral selection +
successive approximation; all round 10) — plus RIFF/WAVE PCM audio and
RIFF/AVI Motion-JPEG video, each hash-graded by a checksum oracle. Since
round 11 the GENERIC real mode (``extract_features`` / ``perceptual_hash``
with ``fake=False``) dispatches through these same decoders via
``decode_asset_values``; only genuinely unsupported formats raise
``ValueError`` (arithmetic progressive/lossless JPEG modes, perceptual
audio codecs (MP3/AAC-class), motion-compensated video codecs
(H.264-class; block-delta inter-frame video IS implemented — FLV/Screen
Video) —
swapping in PIL/ffmpeg widens only the dispatch; progressive COLOR
JPEG, ARITHMETIC-CODED sequential JPEG (SOF9, the Annex D QM-coder),
lossless + hierarchical JPEG, G.711 companded audio, FLAC lossless
compressed audio (RFC 9639: Rice residuals, fixed + Levinson-Durbin LPC
prediction, stereo decorrelation, MD5-verified), and uncompressed-DIB
AVI joined the supported set in round 11). Fake mode
remains the deterministic byte-level plumbing path for arbitrary blobs.

Scale notes: binary payloads ride in Arrow record batches; keep
``spark.sql.files.maxPartitionBytes`` sized so one partition of blobs fits
executor memory, and repartition by a content-hash key before heavy decode
so stragglers (giant files) spread out. Features, not pixels, should cross
shuffles.
"""

from __future__ import annotations

import os
import tempfile
import zipfile
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _ship_package(spark) -> None:
    """Make ``pipes_spark`` importable on executor Python workers.

    Module-level functions referenced from mapInPandas are pickled *by
    reference*, so workers must import this package — which fails when the
    driver process was launched outside the repo. Shipping the package as a
    zip via addPyFile fixes that for any deployment (local or cluster)."""
    sc = spark.sparkContext
    if getattr(sc, "_pipes_spark_shipped", False):
        return
    pkg_dir = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    root = os.path.dirname(pkg_dir)
    zpath = os.path.join(
        tempfile.gettempdir(), f"pipes_spark_pkg_{os.getpid()}.zip"
    )
    with zipfile.ZipFile(zpath, "w") as z:
        for dirpath, _dirs, files in os.walk(pkg_dir):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(dirpath, f)
                    z.write(full, os.path.relpath(full, root))
    sc.addPyFile(zpath)
    sc._pipes_spark_shipped = True

#: Typed metadata struct carried next to every blob.
ASSET_SCHEMA = (
    "asset_id bigint, content binary, "
    "meta struct<format:string, width:int, height:int, n_bytes:bigint>"
)

FEATURE_SCHEMA = (
    "asset_id bigint, format string, n_bytes bigint, "
    "byte_mean double, byte_min int, byte_max int, fake_embedding array<float>"
)

#: Real-mode feature schema: stats + an 8-bucket embedding over DECODED
#: values (pixels for images, int16 samples for audio). width/height are
#: NULL for audio.
REAL_FEATURE_SCHEMA = (
    "asset_id bigint, format string, width int, height int, "
    "n_values bigint, val_mean double, val_min bigint, val_max bigint, "
    "val_sum bigint, embedding array<double>"
)


def decode_asset_values(content: bytes, label: str = "asset"):
    """Sniff-and-dispatch decode across every codec the engine implements
    (round 11, VERDICT r10 ask #2 — the generic real-mode entry point):
    PNG / GIF / JPEG (baseline, progressive, lossless, hierarchical,
    arithmetic-coded SOF9) /
    BMP / TIFF → grayscale pixel matrix via :func:`decode_image_gray`;
    RIFF/WAVE (PCM, G.711, ADPCM) → int16-domain samples via
    :func:`wav_decode_pcm`; AIFF via :func:`aiff_decode_pcm`; FLAC via
    :func:`flac_decode` (MD5-verified). Returns ``(format, values int64 1-D ndarray,
    width, height)`` (width/height ``None`` for audio); raises
    ``ValueError`` only for genuinely unsupported formats."""
    import numpy as np

    b = bytes(content)
    fmt, *_ = sniff_image_header(b)
    if fmt in ("png", "gif", "jpeg", "bmp", "tiff"):
        px = decode_image_gray(b)
        h, w = px.shape
        return fmt, px.reshape(-1).astype(np.int64), int(w), int(h)
    if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
        samples, _nch, _rate, _bits = wav_decode_pcm(b, label=label)
        return "wav", samples, None, None
    if b[:4] == b"FORM" and b[8:12] == b"AIFF":
        samples, _nch, _rate, _bits = aiff_decode_pcm(b, label=label)
        return "aiff", samples, None, None
    if b[:4] == b"fLaC":
        samples, _nch, _rate, _bits, _total, md5_ok = flac_decode(
            b, label=label
        )
        if not md5_ok:
            raise ValueError(f"{label}: FLAC MD5 mismatch after decode")
        return "flac", samples, None, None
    raise ValueError(
        f"{label}: unsupported media format (engine codecs: PNG, GIF, "
        "JPEG baseline/progressive/lossless/hierarchical/arithmetic, "
        "BMP, TIFF, "
        "RIFF/WAVE PCM+G.711+ADPCM, AIFF, FLAC; perceptual audio codecs "
        "and other containers need an external codec library)"
    )


def binary_assets_from_text(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Manufacture a deterministic binary-asset table from a text corpus
    (the container has no real media files). Schema matches ASSET_SCHEMA."""
    content = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col).alias("asset_id"),
        content.alias("content"),
        F.struct(
            F.lit("fake/raw").alias("format"),
            (F.length(content) % 640).cast("int").alias("width"),
            (F.length(content) % 480).cast("int").alias("height"),
            F.length(content).cast("bigint").alias("n_bytes"),
        ).alias("meta"),
    )


def _decode_batch(pdf: pd.DataFrame, fake: bool) -> pd.DataFrame:
    """Decode one Arrow batch of assets into per-asset features.

    Real mode (round 11) dispatches through the module's OWN from-the-spec
    codecs via :func:`decode_asset_values` — PNG/GIF/JPEG pixels, WAV PCM
    samples — and emits value stats plus an 8-bucket embedding
    (``REAL_FEATURE_SCHEMA``); genuinely unsupported formats raise
    ``ValueError``. Fake mode derives deterministic 'features' from the
    raw bytes so the plumbing is testable on arbitrary blobs.
    """
    import numpy as np

    if not fake:
        from pipes_spark.operators.multimodal import decode_asset_values

        rows = []
        for asset_id, content in zip(pdf["asset_id"], pdf["content"]):
            fmt, vals, w, h = decode_asset_values(
                content, label=f"asset {asset_id}"
            )
            n = int(vals.size)
            # 8 contiguous buckets over the flattened value stream:
            # bucket b covers [b*n//8, (b+1)*n//8) — SQL-expressible as
            # bucket = i*8 // n, so the oracle recomputes it closed-form
            cuts = [b * n // 8 for b in range(9)]
            emb = [
                float(vals[cuts[b] : cuts[b + 1]].mean())
                if cuts[b + 1] > cuts[b]
                else None
                for b in range(8)
            ]
            rows.append(
                {
                    "asset_id": int(asset_id),
                    "format": fmt,
                    "width": w,
                    "height": h,
                    "n_values": n,
                    "val_mean": float(vals.mean()),
                    "val_min": int(vals.min()),
                    "val_max": int(vals.max()),
                    "val_sum": int(vals.sum()),
                    "embedding": emb,
                }
            )
        return pd.DataFrame(rows)

    rows = []
    for asset_id, content, meta in zip(pdf["asset_id"], pdf["content"], pdf["meta"]):
        arr = np.frombuffer(content, dtype=np.uint8)
        if arr.size == 0:
            arr = np.zeros(1, dtype=np.uint8)
        emb = (arr[:8].astype(np.float32) / 255.0) if arr.size >= 8 else np.zeros(8, np.float32)
        rows.append(
            {
                "asset_id": asset_id,
                "format": meta["format"] if isinstance(meta, dict) else meta.format,
                "n_bytes": int(arr.size),
                "byte_mean": float(round(arr.mean(), 6)),
                "byte_min": int(arr.min()),
                "byte_max": int(arr.max()),
                "fake_embedding": [float(x) for x in emb],
            }
        )
    return pd.DataFrame(rows)


def extract_features(assets: DataFrame, fake: bool = True) -> DataFrame:
    """Per-asset feature extraction via mapInPandas (Arrow-batched; the
    canonical shape for any decode/resize/frame-sample operator). Real
    mode (``fake=False``, round 11) decodes through the module's OWN
    codecs — PNG / GIF / baseline+progressive JPEG pixels, RIFF/WAVE PCM
    samples — and returns ``REAL_FEATURE_SCHEMA`` (value stats + 8-bucket
    embedding over decoded values; catalog ``multimodal_features`` proves
    it under a closed-form oracle). Formats beyond the engine's codecs
    (compressed audio, arbitrary containers) raise ``ValueError``; fake
    mode remains the deterministic byte-level plumbing path for those."""

    _ship_package(assets.sparkSession)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                yield _decode_batch(pdf, fake)

    return assets.mapInPandas(
        gen, schema=FEATURE_SCHEMA if fake else REAL_FEATURE_SCHEMA
    )


def frame_sample(assets: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """'Frame sampling' stand-in over raw bytes (1→N explode via
    mapInPandas). Since round 10 the REAL path exists:
    :func:`avi_frame_sample_stats` walks an actual RIFF/AVI container and
    decodes Motion-JPEG frames — this byte-offset variant remains for
    formats the engine cannot yet parse."""

    _ship_package(assets.sparkSession)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for asset_id, content in zip(pdf["asset_id"], pdf["content"]):
                for off in range(0, len(content), every_n_bytes):
                    out.append(
                        {
                            "asset_id": asset_id,
                            "frame_no": off // every_n_bytes,
                            "offset": off,
                            "sample_byte": int(content[off]),
                        }
                    )
            if out:
                yield pd.DataFrame(out)

    return assets.mapInPandas(
        gen, schema="asset_id bigint, frame_no int, offset int, sample_byte int"
    )


def resize_image_assets(
    assets: DataFrame, out_w: int = 8, out_h: int = 8
) -> DataFrame:
    """REAL image resize (round 11 — the last member of the
    decode / feature-extract / resize / frame-sample quartet to go real):
    decode via the module's own codecs (:func:`decode_image_gray`
    sniff-and-dispatch), box-mean downsample with the floor-partition
    rule — source pixel (y, x) belongs to output cell
    (y·out_h // h, x·out_w // w), output value = FLOOR of the box mean
    (integer division: bit-exact in any engine, no rounding-mode games)
    — then re-encode as a filter-0 grayscale PNG. Binary in, binary out,
    metadata rewrite: the true thumbnailer shape. Arrow-batched
    mapInPandas; pixels never cross a shuffle (catalog
    ``multimodal_resize`` decodes the output and hash-checks every
    resized pixel against a closed-form oracle)."""
    spark = assets.sparkSession
    _ship_package(spark)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from pipes_spark.operators.multimodal import (
            decode_image_gray,
            png_encode_array,
        )

        for pdf in batches:
            rows = []
            for asset_id, content in zip(pdf["asset_id"], pdf["content"]):
                px = decode_image_gray(bytes(content)).astype(np.int64)
                h, w = px.shape
                if out_w > w or out_h > h:
                    raise ValueError(
                        f"asset {asset_id}: upscaling not supported "
                        f"({w}x{h} -> {out_w}x{out_h})"
                    )
                ry = np.arange(h) * out_h // h
                rx = np.arange(w) * out_w // w
                sums = np.zeros((out_h, out_w), dtype=np.int64)
                cnts = np.zeros((out_h, out_w), dtype=np.int64)
                np.add.at(sums, (ry[:, None], rx[None, :]), px)
                np.add.at(cnts, (ry[:, None], rx[None, :]), 1)
                out = (sums // cnts).astype(np.uint8)
                rows.append(
                    {
                        "asset_id": int(asset_id),
                        "content": png_encode_array(out),
                        "width": out_w,
                        "height": out_h,
                        "n_bytes": 0,
                    }
                )
            if rows:
                pdf2 = pd.DataFrame(rows)
                pdf2["n_bytes"] = pdf2["content"].map(len)
                yield pdf2

    return assets.mapInPandas(
        gen,
        schema="asset_id bigint, content binary, width int, height int, n_bytes bigint",
    )


def decoded_pixels(assets: DataFrame) -> DataFrame:
    """Explode decoded grayscale pixels to (asset_id, y, x, v) rows via
    the sniff-and-dispatch decoder — the verification read behind the
    resize gate (bounded use: call on SMALL images only; pixels DO cross
    the shuffle here by design)."""
    spark = assets.sparkSession
    _ship_package(spark)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from pipes_spark.operators.multimodal import decode_image_gray

        for pdf in batches:
            ids, ys, xs, vs = [], [], [], []
            for asset_id, content in zip(pdf["asset_id"], pdf["content"]):
                px = decode_image_gray(bytes(content)).astype(np.int64)
                h, w = px.shape
                yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
                ids.append(np.full(h * w, int(asset_id), dtype=np.int64))
                ys.append(yy.reshape(-1))
                xs.append(xx.reshape(-1))
                vs.append(px.reshape(-1))
            if ids:
                yield pd.DataFrame(
                    {
                        "asset_id": np.concatenate(ids),
                        "y": np.concatenate(ys).astype("int32"),
                        "x": np.concatenate(xs).astype("int32"),
                        "v": np.concatenate(vs).astype("int32"),
                    }
                )

    return assets.mapInPandas(
        gen, schema="asset_id bigint, y int, x int, v int"
    )


def resize_stub(assets: DataFrame, width: int = 32, height: int = 32) -> DataFrame:
    """'Resize' stand-in for images: emit a fixed-size byte payload per asset
    (truncate / zero-pad to width·height) with updated metadata — the exact
    plumbing of a real thumbnailer (binary in, binary out, metadata rewrite);
    since round 11 the REAL path exists (:func:`resize_image_assets`,
    decode → box-mean → PNG re-encode); this byte-level variant remains
    for formats the engine cannot decode."""

    _ship_package(assets.sparkSession)
    target = width * height

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for asset_id, content in zip(pdf["asset_id"], pdf["content"]):
                body = bytes(content[:target]).ljust(target, b"\0")
                rows.append(
                    {
                        "asset_id": asset_id,
                        "content": body,
                        "width": width,
                        "height": height,
                        "n_bytes": len(body),
                    }
                )
            if rows:
                yield pd.DataFrame(rows)

    return assets.mapInPandas(
        gen,
        schema="asset_id bigint, content binary, width int, height int, n_bytes bigint",
    )


def cdc_chunks(
    assets: DataFrame,
    id_col: str = "asset_id",
    content_col: str = "content",
    avg_size: int = 256,
    min_size: int = 64,
    max_size: int = 1024,
) -> DataFrame:
    """Content-defined chunking of binary blobs (the LBFS/restic/borg
    storage-dedup technique): chunk boundaries are set where a rolling
    hash of the last 8 bytes hits ``0 mod avg_size`` — so boundaries are
    determined by CONTENT, not offsets, and inserting bytes at the front
    of a blob shifts only the first chunk; every later chunk re-aligns
    and deduplicates (fixed-size chunking loses all of them). The chunk
    fingerprint table is what a binary-asset dedup joins on — the
    multimodal analog of the text winnowing fingerprints.

    Map-side only (one numpy pass per Arrow batch, no shuffle); the
    downstream dedup is a groupBy on ``chunk_hash``. ``min_size`` guards
    pathological boundary runs, ``max_size`` forces progress through
    boundary-free regions.
    """
    import hashlib

    if not (0 < min_size <= max_size) or avg_size < 1:
        raise ValueError(
            f"need 0 < min_size <= max_size and avg_size >= 1, got "
            f"{min_size}, {max_size}, {avg_size}"
        )
    spark = assets.sparkSession
    _ship_package(spark)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        # fixed random byte→weight table (deterministic seed) — the Buzhash
        # convention; the window hash is a weighted sum mod 2^32
        rng = np.random.RandomState(42)
        table = rng.randint(0, 2**31 - 1, size=256, dtype=np.int64)
        win = 8
        for pdf in batches:
            out_ids, out_idx, out_off, out_len, out_hash = [], [], [], [], []
            for aid, blob in zip(pdf[id_col], pdf[content_col]):
                if blob is None:
                    continue
                b = np.frombuffer(bytes(blob), dtype=np.uint8)
                n = len(b)
                if n == 0:
                    continue
                # rolling window hash at every position ≥ win
                if n >= win:
                    w = table[b]
                    csum = np.concatenate([[0], np.cumsum(w)])
                    roll = (csum[win:] - csum[:-win]) % (2**32)
                else:
                    roll = np.empty(0, dtype=np.int64)
                starts = [0]
                last = 0
                pos = win
                while pos < n:
                    at_boundary = roll[pos - win] % avg_size == 0
                    size = pos - last
                    if (at_boundary and size >= min_size) or size >= max_size:
                        starts.append(pos)
                        last = pos
                    pos += 1
                for i, s in enumerate(starts):
                    e = starts[i + 1] if i + 1 < len(starts) else n
                    piece = bytes(blob)[s:e]
                    out_ids.append(aid)
                    out_idx.append(i)
                    out_off.append(s)
                    out_len.append(e - s)
                    out_hash.append(hashlib.md5(piece).hexdigest())
            yield pd.DataFrame(
                {
                    id_col: pd.Series(out_ids, dtype="int64"),
                    "chunk_idx": pd.Series(out_idx, dtype="int64"),
                    "offset": pd.Series(out_off, dtype="int64"),
                    "length": pd.Series(out_len, dtype="int64"),
                    "chunk_hash": pd.Series(out_hash, dtype="object"),
                }
            )

    return assets.select(id_col, content_col).mapInPandas(
        gen,
        schema=f"{id_col} bigint, chunk_idx bigint, offset bigint, length bigint, chunk_hash string",
    )


def perceptual_hash(
    assets: DataFrame, fake: bool = True, ensure_partitions: bool = True
) -> DataFrame:
    """64-bit perceptual hash per asset — the image-dedup fingerprint
    (aHash family: bit i says whether region i is brighter than the
    asset's mean). Real mode (round 11) decodes through the module's OWN
    codecs via :func:`decode_asset_values` and applies the rule to the
    DECODED value stream (pixels row-major, or PCM samples) split into 64
    equal blocks; fake mode applies the IDENTICAL rule to the raw byte
    stream, so the hash math, Arrow batching, and pair plumbing are the
    same code path — only the value source differs. Catalog
    ``multimodal_phash_pairs`` hash-grades the real path end to end
    (closed-form bit-pattern oracle + Hamming pair join).

    Returns ``(asset_id, phash bigint)`` — 8 bytes per asset through any
    downstream shuffle, never the content.
    """
    from .scale import ensure_min_partitions

    _ship_package(assets.sparkSession)
    if ensure_partitions:
        # skip when the caller already sized partitions upstream:
        # the probe (df.rdd.getNumPartitions) would otherwise execute
        # the upstream AQE shuffle stage at CONSTRUCTION time
        assets = ensure_min_partitions(assets)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from pipes_spark.operators.multimodal import decode_asset_values

        for pdf in batches:
            if not len(pdf):
                continue
            out = []
            for asset_id, content in zip(pdf["asset_id"], pdf["content"]):
                if fake:
                    arr = np.frombuffer(content, dtype=np.uint8).astype(
                        np.int64
                    )
                else:
                    _fmt, arr, _w, _h = decode_asset_values(
                        content, label=f"asset {asset_id}"
                    )
                if arr.size == 0:
                    arr = np.zeros(64, dtype=np.int64)
                pad = (-arr.size) % 64
                a = np.pad(arr, (0, pad), mode="wrap")
                blocks = a.reshape(64, -1).mean(axis=1)
                # threshold on the GLOBAL value mean — equal to the mean
                # of the 64 equal-sized block means mathematically, but
                # float-exact (one integer sum, one IEEE division), so
                # the oracle's sequential and numpy's pairwise summation
                # cannot disagree in the last ulp
                bits = blocks > a.mean()
                h = 0
                for b in bits:
                    h = (h << 1) | int(b)
                if h >= 1 << 63:
                    h -= 1 << 64  # signed 64-bit for the BIGINT column
                out.append({"asset_id": int(asset_id), "phash": h})
            yield pd.DataFrame(out)

    return assets.mapInPandas(gen, schema="asset_id bigint, phash bigint")


def phash_pairs(hashes: DataFrame, max_hamming: int = 7) -> DataFrame:
    """Near-duplicate asset pairs by perceptual-hash Hamming distance ≤
    ``max_hamming`` (≤ 7: the pigeonhole blocks are the hash's 8 bytes —
    any pair within Hamming 7 of a 64-bit hash agrees on at least one of
    them, so candidate generation is a per-byte-value equi-join, never
    all-pairs; the same blocking scheme as text SimHash). Only
    (id, hash) longs flow through the shuffle; the exact distance check
    is one bit_count(XOR) per surviving candidate.
    """
    if not 0 <= max_hamming <= 7:
        raise ValueError(f"max_hamming must be in [0, 7], got {max_hamming}")
    blocked = hashes.select(
        F.col("asset_id"),
        F.col("phash"),
        F.posexplode(
            F.array(
                *[
                    F.shiftright("phash", 8 * i).bitwiseAND(F.lit(255)).cast("int")
                    for i in range(8)
                ]
            )
        ).alias("block", "block_val"),
    )
    a = blocked.select(
        "block", "block_val", F.col("asset_id").alias("id_a"), F.col("phash").alias("ph_a")
    )
    b = blocked.select(
        "block", "block_val", F.col("asset_id").alias("id_b"), F.col("phash").alias("ph_b")
    )
    return (
        a.join(b, ["block", "block_val"])
        .filter(F.col("id_a") < F.col("id_b"))
        # hamming is a pure function of the pair: verify map-side BEFORE
        # the dedup shuffle, so only true near-pairs (not every
        # one-byte-coincidence candidate, ≤8× per pair) reach the exchange
        .withColumn(
            "hamming",
            F.bit_count(F.col("ph_a").bitwiseXOR(F.col("ph_b"))).cast("bigint"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .dropDuplicates(["id_a", "id_b"])
        .select("id_a", "id_b", "hamming")
    )


# ---------------------------------------------------------------------------
# REAL image codec surface (round-9 second wave): PNG needs only zlib +
# struct — both stdlib — so unlike the PIL/ffmpeg-gated decode stub above,
# this encode → decode path runs for real in this environment.
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(typ: bytes, data: bytes) -> bytes:
    import struct
    import zlib as _z

    return (
        struct.pack(">I", len(data))
        + typ
        + data
        + struct.pack(">I", _z.crc32(typ + data) & 0xFFFFFFFF)
    )


def png_encode_gray(asset_id: int, width: int, height: int) -> bytes:
    """Minimal REAL grayscale 8-bit PNG (spec: IHDR + one IDAT + IEND,
    filter 0 scanlines): pixel i (row-major) = (asset_id + i) % 256 —
    the deterministic content contract the decode oracle recomputes."""
    import struct
    import zlib as _z

    import numpy as np

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    px = ((asset_id + np.arange(height * width)) % 256).astype(np.uint8)
    scan = np.zeros((height, width + 1), dtype=np.uint8)
    scan[:, 1:] = px.reshape(height, width)  # leading 0 = filter None
    idat = _z.compress(scan.tobytes(), 6)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", idat)
        + _png_chunk(b"IEND", b"")
    )


def sniff_image_header(content: bytes):
    """Codec-free header sniff of the three classic formats — returns
    (format, width, height, bit_depth, color_type) or Nones. PNG: IHDR
    with CRC verification; GIF87a/89a: logical-screen descriptor; JPEG:
    first SOFn marker scan (the dimension source; C4/C8/CC are not
    frame headers). Pure byte parsing from the public specs — the
    'typed metadata without decoding pixels' step of an ingest scan."""
    import struct
    import zlib as _z

    if content[:8] == _PNG_SIG:
        # truncated or non-IHDR-first files violate the spec: refuse
        # with the documented ValueError, not a raw struct.error
        if len(content) < 33 or content[12:16] != b"IHDR":
            raise ValueError("truncated or malformed PNG header")
        data = content[16:29]
        (crc,) = struct.unpack(">I", content[29:33])
        if _z.crc32(b"IHDR" + data) & 0xFFFFFFFF != crc:
            raise ValueError("PNG IHDR CRC mismatch")
        w, h, depth, ctype = struct.unpack(">IIBB", data[:10])
        return ("png", w, h, depth, ctype)
    if content[:6] in (b"GIF87a", b"GIF89a") and len(content) >= 11:
        w, h = struct.unpack("<HH", content[6:10])
        depth = ((content[10] >> 4) & 0x7) + 1
        return ("gif", w, h, depth, None)
    if content[:4] in (b"II*\x00", b"MM\x00*") and len(content) >= 8:
        e = "<" if content[:2] == b"II" else ">"
        (ifd_at,) = struct.unpack(e + "I", content[4:8])
        w = h = depth = None
        if ifd_at + 2 <= len(content):
            (n_entries,) = struct.unpack(
                e + "H", content[ifd_at : ifd_at + 2]
            )
            for i in range(n_entries):
                at = ifd_at + 2 + i * 12
                if at + 12 > len(content):
                    break
                tag, typ, _cnt = struct.unpack(
                    e + "HHI", content[at : at + 8]
                )
                if typ == 3:
                    (val,) = struct.unpack(e + "H", content[at + 8 : at + 10])
                else:
                    (val,) = struct.unpack(e + "I", content[at + 8 : at + 12])
                if tag == 256:
                    w = val
                elif tag == 257:
                    h = val
                elif tag == 258:
                    depth = val
        return ("tiff", w, h, depth, None)
    if content[:2] == b"BM" and len(content) >= 26:
        # BITMAPINFOHEADER starts at offset 14; negative height = top-down
        w, h = struct.unpack("<ii", content[18:26])
        bitcount = (
            struct.unpack("<H", content[28:30])[0] if len(content) >= 30
            else None
        )
        return ("bmp", w, abs(h), bitcount, None)
    if content[:2] == b"\xff\xd8":
        # standard marker walk: fill bytes (repeated 0xFF) are padding,
        # and TEM/RSTn/SOI are standalone markers with NO length field —
        # reading a length there derails the scan past a present SOF
        i, n = 2, len(content)
        while i < n:
            if content[i] != 0xFF:
                break
            while i < n and content[i] == 0xFF:
                i += 1
            if i >= n:
                break
            marker = content[i]
            i += 1
            if marker == 0x01 or 0xD0 <= marker <= 0xD8:
                continue
            if marker == 0xD9 or i + 2 > n:
                break
            seglen = struct.unpack(">H", content[i : i + 2])[0]
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                if i + 8 > n:
                    break
                depth = content[i + 2]
                h, w = struct.unpack(">HH", content[i + 3 : i + 7])
                ncomp = content[i + 7]
                return ("jpeg", w, h, depth, ncomp)
            i += seglen
        return ("jpeg", None, None, None, None)
    return (None, None, None, None, None)


def encode_png_assets(
    df: DataFrame,
    id_col: str = "doc_id",
    width_col: str = "width",
    height_col: str = "height",
) -> DataFrame:
    """Arrow-batched REAL PNG encode: (id, width, height) rows →
    (id, content binary). mapInPandas so blobs are produced executor-
    side in batch — at 100 TB the encode is embarrassingly parallel and
    pixels never cross a shuffle (the module's features-not-pixels
    rule; downstream ops reduce to metadata before any exchange)."""
    spark = df.sparkSession
    _ship_package(spark)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pipes_spark.operators.multimodal import png_encode_gray

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "asset_id": pdf[id_col].astype("int64"),
                    "content": [
                        png_encode_gray(int(i), int(w), int(h))
                        for i, w, h in zip(
                            pdf[id_col], pdf[width_col], pdf[height_col]
                        )
                    ],
                }
            )

    return df.select(id_col, width_col, height_col).mapInPandas(
        gen, "asset_id bigint, content binary"
    )


def png_decode_stats(assets: DataFrame) -> DataFrame:
    """REAL full PNG decode over Arrow batches: CRC-checked IHDR parse,
    IDAT zlib inflate, filter-byte strip, and a pixel checksum —
    (asset_id, format, width, height, bit_depth, color_type, n_pixels,
    pixel_sum). The pixel_sum is the proof-of-decode: it can only be
    computed from the inflated scanlines, so a hash-match against the
    closed-form oracle certifies the decoder ran for real (catalog
    ``multimodal_png_roundtrip``). Only filter-0 scanlines (what
    :func:`png_encode_gray` emits) are supported; anything else raises
    loudly rather than guessing."""
    spark = assets.sparkSession
    _ship_package(spark)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct
        import zlib as _z

        import numpy as np

        from pipes_spark.operators.multimodal import sniff_image_header

        for pdf in batches:
            out = {
                "asset_id": [],
                "format": [],
                "width": [],
                "height": [],
                "bit_depth": [],
                "color_type": [],
                "n_pixels": [],
                "pixel_sum": [],
            }
            for aid, content in zip(pdf["asset_id"], pdf["content"]):
                content = bytes(content)
                fmt, w, h, depth, ctype = sniff_image_header(content)
                if fmt != "png":
                    raise ValueError(f"asset {aid}: not a PNG")
                idat, i = b"", 8
                while i + 8 <= len(content):
                    (ln,) = struct.unpack(">I", content[i : i + 4])
                    typ = content[i + 4 : i + 8]
                    if typ == b"IDAT":
                        idat += content[i + 8 : i + 8 + ln]
                    i += 12 + ln
                    if typ == b"IEND":
                        break
                raw = np.frombuffer(_z.decompress(idat), dtype=np.uint8)
                scan = raw.reshape(h, w + 1)
                if scan[:, 0].any():
                    raise ValueError(f"asset {aid}: non-zero PNG filter type")
                px = scan[:, 1:]
                out["asset_id"].append(int(aid))
                out["format"].append(fmt)
                out["width"].append(w)
                out["height"].append(h)
                out["bit_depth"].append(depth)
                out["color_type"].append(ctype)
                out["n_pixels"].append(int(px.size))
                out["pixel_sum"].append(int(px.sum(dtype=np.int64)))
            yield pd.DataFrame(out)

    return assets.mapInPandas(
        gen,
        "asset_id bigint, format string, width int, height int, "
        "bit_depth int, color_type int, n_pixels bigint, pixel_sum bigint",
    )


# --------------------------------------------------------------------------
# GIF: REAL LZW codec from the public GIF89a specification (no PIL/ffmpeg —
# the sources/avro.py / png_decode_stats precedent: when the env lacks the
# library, implement the format from its spec with stdlib only).
#
# Variable-width LZW per the spec's "Appendix F" scheme as implemented by
# every interoperable codec: clear = 1<<min_code_size, EOI = clear+1, first
# dynamic entry = EOI+1, code width starts at min_code_size+1 and grows to
# at most 12 bits. Width-change alignment is the subtle part (the encoder
# assigns table entries one emit AHEAD of the decoder): both sides key the
# bump on a per-CODE counter — the encoder checks its next-entry counter
# after every WRITE, the decoder increments a read counter after every READ
# and bumps when it exceeds 2^width — which provably lines up, tail
# included (see tests/test_round10.py fixture, hand-derived from the spec
# rules). Codes pack LSB-first into bytes (spec: "codes are formed into a
# stream of bits as if they were packed right to left").
# --------------------------------------------------------------------------


def _gif_lzw_encode(data: bytes, min_code_size: int) -> bytes:
    """LZW-compress ``data`` (GIF89a spec section 22 / Appendix F).

    Emits an initial clear code, resets the table via a clear code when the
    entry counter reaches 4095 (the conservative full-table reset every
    mainstream codec performs), and terminates with EOI.

    r12 kernel pass (guide §4.2): the dictionary keys on the INTEGER
    ``(prefix_code << 8) | next_byte`` instead of the byte-string prefix —
    the standard LZW table encoding. Identical code sequence by
    construction (single bytes are their own codes, so the string table
    and the int table assign entries in the same order); pytest pins the
    round trip and a direct old-vs-new micro-benchmark read bit-identical
    streams at 2.4× the throughput (no per-input-byte bytes() allocation
    or string hashing)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    append = out.append
    bitbuf = 0
    nbits = 0
    cs = min_code_size + 1
    next_code = eoi + 1
    table: dict = {}
    table_get = table.get

    # emit(clear) — the width check mirrors the decoder's per-read counter
    bitbuf |= clear << nbits
    nbits += cs
    while nbits >= 8:
        append(bitbuf & 0xFF)
        bitbuf >>= 8
        nbits -= 8
    if next_code >= (1 << cs) and cs < 12:
        cs += 1

    it = iter(data)
    w = next(it, None)
    if w is not None:
        for b in it:
            key = (w << 8) | b
            nc = table_get(key)
            if nc is not None:
                w = nc
                continue
            bitbuf |= w << nbits
            nbits += cs
            while nbits >= 8:
                append(bitbuf & 0xFF)
                bitbuf >>= 8
                nbits -= 8
            if next_code >= (1 << cs) and cs < 12:
                cs += 1
            if next_code >= 4095:
                bitbuf |= clear << nbits
                nbits += cs
                while nbits >= 8:
                    append(bitbuf & 0xFF)
                    bitbuf >>= 8
                    nbits -= 8
                if next_code >= (1 << cs) and cs < 12:
                    cs += 1
                table = {}
                table_get = table.get
                next_code = eoi + 1
                cs = min_code_size + 1
            else:
                table[key] = next_code
                next_code += 1
            w = b
        bitbuf |= w << nbits
        nbits += cs
        while nbits >= 8:
            append(bitbuf & 0xFF)
            bitbuf >>= 8
            nbits -= 8
        if next_code >= (1 << cs) and cs < 12:
            cs += 1

    bitbuf |= eoi << nbits
    nbits += cs
    while nbits >= 8:
        append(bitbuf & 0xFF)
        bitbuf >>= 8
        nbits -= 8
    if nbits:
        append(bitbuf & 0xFF)
    return bytes(out)


def _gif_lzw_decode(data: bytes, min_code_size: int) -> bytearray:
    """Inverse of :func:`_gif_lzw_encode`, tolerant of deferred clear codes
    (spec-conformant streams may keep emitting 12-bit codes on a full
    table). Raises ValueError on corrupt streams (code beyond the table,
    missing EOI) instead of guessing."""
    clear = 1 << min_code_size
    eoi = clear + 1
    first = eoi + 1
    out = bytearray()
    bitbuf = 0
    nbits = 0
    pos = 0
    n = len(data)

    cs = min_code_size + 1
    running = first  # per-READ counter driving width bumps (giflib scheme)
    prefix: list = [b""] * 4096
    for i in range(clear):
        prefix[i] = bytes([i])
    next_entry = first
    prev: bytes | None = None

    while True:
        while nbits < cs:
            if pos >= n:
                raise ValueError("LZW stream ended before EOI")
            bitbuf |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = bitbuf & ((1 << cs) - 1)
        bitbuf >>= cs
        nbits -= cs
        if running < 4097:
            running += 1
            if running > (1 << cs) and cs < 12:
                cs += 1
        if code == clear:
            cs = min_code_size + 1
            running = first
            next_entry = first
            prev = None
            continue
        if code == eoi:
            return out
        if prev is None:
            if code >= clear:
                raise ValueError(f"invalid first LZW code {code}")
            entry = prefix[code]
        elif code < next_entry:
            entry = prefix[code]
        elif code == next_entry and next_entry < 4096:
            entry = prev + prev[:1]  # the KwKwK case
        else:
            raise ValueError(f"corrupt LZW code {code} (table size {next_entry})")
        out += entry
        if prev is not None and next_entry < 4096:
            prefix[next_entry] = prev + entry[:1]
            next_entry += 1
        prev = entry


#: de-interlace row schedule (spec section 20: 4 passes)
_GIF_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _gif_row_order(height: int, interlaced: bool) -> list:
    if not interlaced:
        return list(range(height))
    rows = []
    for start, step in _GIF_INTERLACE_PASSES:
        rows.extend(range(start, height, step))
    return rows


def gif_encode_gray(
    asset_id: int, width: int, height: int, interlaced: bool = False
) -> bytes:
    """Minimal REAL grayscale GIF89a (spec: header, logical screen
    descriptor, 256-entry global color table with palette[j] = (j,j,j),
    one image descriptor, LZW-compressed 8-bit index data in ≤255-byte
    sub-blocks, trailer): pixel i (row-major) = (asset_id + i) % 256 —
    the same deterministic content contract as :func:`png_encode_gray`,
    so the decode oracle recomputes the checksum in closed form.
    ``interlaced=True`` stores rows in the spec's 4-pass order and sets
    the interlace flag (decoder coverage for real-world GIFs)."""
    import struct

    import numpy as np

    px = ((asset_id + np.arange(height * width)) % 256).astype(np.uint8)
    grid = px.reshape(height, width)
    order = _gif_row_order(height, interlaced)
    stored = grid[order, :].tobytes()

    out = bytearray(b"GIF89a")
    # LSD packed 0xF7: global color table present, color resolution 8,
    # unsorted, table size 2^(7+1) = 256
    out += struct.pack("<HHBBB", width, height, 0xF7, 0, 0)
    out += bytes(j for j in range(256) for _ in range(3))  # (j, j, j)
    out += b"\x2c" + struct.pack(
        "<HHHHB", 0, 0, width, height, 0x40 if interlaced else 0
    )
    out.append(8)  # LZW minimum code size
    lzw = _gif_lzw_encode(stored, 8)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"  # block terminator + trailer
    return bytes(out)


def encode_gif_assets(
    df: DataFrame,
    id_col: str = "doc_id",
    width_col: str = "width",
    height_col: str = "height",
    interlace_col: str | None = None,
) -> DataFrame:
    """Arrow-batched REAL GIF encode: (id, width, height[, interlaced])
    rows → (id, content binary) — the GIF twin of
    :func:`encode_png_assets` (same 100 TB shape: embarrassingly
    parallel mapInPandas, pixels never cross a shuffle). An optional
    boolean ``interlace_col`` stores those images in the spec's 4-pass
    interlaced row order (exercising the decoder's de-interlace path)."""
    spark = df.sparkSession
    _ship_package(spark)
    cols = [id_col, width_col, height_col]
    if interlace_col is not None:
        cols.append(interlace_col)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pipes_spark.operators.multimodal import gif_encode_gray

        for pdf in batches:
            il = (
                pdf[interlace_col]
                if interlace_col is not None
                else [False] * len(pdf)
            )
            yield pd.DataFrame(
                {
                    "asset_id": pdf[id_col].astype("int64"),
                    "content": [
                        gif_encode_gray(int(i), int(w), int(h), bool(f))
                        for i, w, h, f in zip(
                            pdf[id_col], pdf[width_col], pdf[height_col], il
                        )
                    ],
                }
            )

    return df.select(*cols).mapInPandas(
        gen, "asset_id bigint, content binary"
    )


def gif_decode_stats(assets: DataFrame) -> DataFrame:
    """REAL full GIF decode over Arrow batches: header + logical-screen
    parse, global/local color table, extension-block walk, variable-width
    LZW inflate, de-interlace, and a palette-mapped pixel checksum —
    (asset_id, format, width, height, bit_depth, n_colors, n_pixels,
    pixel_sum). pixel_sum sums the RED channel of each pixel's palette
    entry, so it can only be computed by actually inflating the LZW
    stream AND dereferencing the color table — a hash-match against the
    closed-form oracle certifies the full decoder ran (catalog
    ``multimodal_gif_roundtrip``; the png_decode_stats precedent).
    Stats cover the FIRST image block (for animations, frame 0);
    truncated/corrupt files raise loudly rather than guessing."""
    spark = assets.sparkSession
    _ship_package(spark)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        import numpy as np

        from pipes_spark.operators.multimodal import (
            _gif_lzw_decode,
            _gif_row_order,
        )

        for pdf in batches:
            out = {
                "asset_id": [],
                "format": [],
                "width": [],
                "height": [],
                "bit_depth": [],
                "n_colors": [],
                "n_pixels": [],
                "pixel_sum": [],
            }
            for aid, content in zip(pdf["asset_id"], pdf["content"]):
                b = bytes(content)
                if b[:6] not in (b"GIF87a", b"GIF89a") or len(b) < 13:
                    raise ValueError(f"asset {aid}: not a GIF")
                _sw, _sh, packed, _bg, _ar = struct.unpack("<HHBBB", b[6:13])
                depth = ((packed >> 4) & 0x7) + 1
                i = 13
                palette = None
                if packed & 0x80:
                    gct_n = 2 << (packed & 0x7)
                    palette = np.frombuffer(
                        b[i : i + 3 * gct_n], dtype=np.uint8
                    ).reshape(gct_n, 3)
                    i += 3 * gct_n
                while i < len(b):
                    blk = b[i]
                    i += 1
                    if blk == 0x21:  # extension: label + sub-blocks
                        i += 1
                        while b[i]:
                            i += 1 + b[i]
                        i += 1
                        continue
                    if blk == 0x3B:
                        raise ValueError(f"asset {aid}: trailer before image")
                    if blk != 0x2C:
                        raise ValueError(
                            f"asset {aid}: unknown block 0x{blk:02x}"
                        )
                    _l, _t, w, h, ipk = struct.unpack("<HHHHB", b[i : i + 9])
                    i += 9
                    if ipk & 0x80:  # local color table overrides
                        lct_n = 2 << (ipk & 0x7)
                        palette = np.frombuffer(
                            b[i : i + 3 * lct_n], dtype=np.uint8
                        ).reshape(lct_n, 3)
                        i += 3 * lct_n
                    if palette is None:
                        raise ValueError(f"asset {aid}: no color table")
                    mcs = b[i]
                    i += 1
                    lzw = bytearray()
                    while b[i]:
                        ln = b[i]
                        lzw += b[i + 1 : i + 1 + ln]
                        i += 1 + ln
                    i += 1
                    idx = np.frombuffer(
                        bytes(_gif_lzw_decode(bytes(lzw), mcs)), dtype=np.uint8
                    )
                    if idx.size != w * h:
                        raise ValueError(
                            f"asset {aid}: decoded {idx.size} pixels, "
                            f"expected {w * h}"
                        )
                    if int(idx.max(initial=0)) >= len(palette):
                        raise ValueError(f"asset {aid}: index beyond palette")
                    stored = idx.reshape(h, w)
                    grid = np.empty_like(stored)
                    grid[_gif_row_order(h, bool(ipk & 0x40)), :] = stored
                    red = palette[:, 0][grid]
                    out["asset_id"].append(int(aid))
                    out["format"].append("gif")
                    out["width"].append(int(w))
                    out["height"].append(int(h))
                    out["bit_depth"].append(int(depth))
                    out["n_colors"].append(int(len(palette)))
                    out["n_pixels"].append(int(red.size))
                    out["pixel_sum"].append(int(red.sum(dtype=np.int64)))
                    break
                else:
                    raise ValueError(f"asset {aid}: truncated GIF")
            yield pd.DataFrame(out)

    return assets.mapInPandas(
        gen,
        "asset_id bigint, format string, width int, height int, "
        "bit_depth int, n_colors int, n_pixels bigint, pixel_sum bigint",
    )


# --------------------------------------------------------------------------
# JPEG: REAL baseline codec from the public ITU-T T.81 specification —
# grayscale (single-component, 8-bit, sequential DCT) with numpy for the
# block transforms. Same routing as GIF/PNG/Avro: no codec library in the
# container, so the format is implemented from its spec with stdlib+numpy.
#
# The entropy layer (canonical Huffman per Annex C, DC difference
# categories, AC run/size symbols, EOB/ZRL, byte stuffing, restart
# markers) is LOSSLESS and fully exercised; the lossy core is the standard
# quantized block DCT. The hash-graded oracle uses BLOCK-CONSTANT content:
# a flat 8×8 block has only a DC coefficient, and with the DC quantum
# chosen to divide 8 exactly the round trip is bit-exact — so the gate
# proves the full marker+Huffman+DCT pipeline without fighting lossiness.
# Random-content closeness is pytest-covered (the entropy layer must be
# bit-exact around the quantize/dequantize core).
#
# Scope (documented narrowing): baseline grayscale only — color
# components, chroma subsampling, progressive (SOF2), arithmetic coding,
# and 12-bit precision raise loudly.
# --------------------------------------------------------------------------

#: zigzag scan order (T.81 figure 5): _JPEG_ZIGZAG[k] = (row, col) flat index
_JPEG_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

#: fixed-length canonical Huffman tables (Annex C): every table the spec's
#: BITS/HUFFVAL form allows is legal — these trade a few bits of
#: compression for an unambiguous construction. DC: 12 size categories at
#: 4 bits (Kraft 12/16, all-ones code unused); AC: all 162 standard
#: symbols (EOB, ZRL, (run 0..15) × (size 1..10)) at 8 bits (162/256).
_JPEG_DC_BITS = [0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_JPEG_DC_VALS = list(range(12))
#: 176 symbols: EOB, ZRL, (run 0..15) x (size 1..10), PLUS the
#: progressive-mode EOBn symbols (run << 4 for run 1..14 — end-of-band
#: run lengths; T.81 G.1.2.2) so one table serves both SOF0 and SOF2
_JPEG_AC_BITS = [0, 0, 0, 0, 0, 0, 0, 176, 0, 0, 0, 0, 0, 0, 0, 0]
_JPEG_AC_VALS = (
    [0x00, 0xF0]
    + [(r << 4) | s for r in range(16) for s in range(1, 11)]
    + [r << 4 for r in range(1, 15)]
)


_JPEG_CODES_CACHE: dict = {}


def _jpeg_canonical_codes(bits, vals):
    """Annex C code assignment: codes of each length in HUFFVAL order.
    Memoized: the standard-table paths pass the same (BITS, HUFFVAL)
    for every asset in a task, and all callers read the dict only. The
    bound guards a long-lived worker against per-image optimal tables
    filling the cache (cheap full clear; correctness unaffected)."""
    key = (tuple(bits), tuple(vals))
    hit = _JPEG_CODES_CACHE.get(key)
    if hit is not None:
        return hit
    codes = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            codes[vals[k]] = (ln, code)
            code += 1
            k += 1
        code <<= 1
    if len(_JPEG_CODES_CACHE) >= 512:
        _JPEG_CODES_CACHE.clear()
    _JPEG_CODES_CACHE[key] = codes
    return codes


_JPEG_DCT_MATRIX_CACHE = None


def _jpeg_dct_matrix():
    # constant 8×8 basis, memoized (was rebuilt per encode AND per
    # decode); every call site uses it read-only (einsum / .T)
    global _JPEG_DCT_MATRIX_CACHE
    if _JPEG_DCT_MATRIX_CACHE is not None:
        return _JPEG_DCT_MATRIX_CACHE
    import numpy as np

    m = np.zeros((8, 8))
    for u in range(8):
        c = (1.0 / (2.0 ** 0.5)) if u == 0 else 1.0
        for x in range(8):
            m[u, x] = 0.5 * c * np.cos((2 * x + 1) * u * np.pi / 16.0)
    _JPEG_DCT_MATRIX_CACHE = m
    return m


class _JpegBitWriter:
    """MSB-first bit packer with T.81 byte stuffing (0x00 after 0xFF)."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, length: int) -> None:
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> None:
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)  # 1-bit padding per spec


def _jpeg_category(v: int):
    """DC/AC magnitude category + appended bits (T.81 tables F.1/F.2):
    negative values encode as v + 2^size - 1 (one's-complement form)."""
    if v == 0:
        return 0, 0
    size = abs(v).bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def jpeg_encode_gray(
    pixels,
    quality_qtable=None,
    restart_interval: int = 0,
    optimize_huffman: bool = False,
) -> bytes:
    """REAL baseline JPEG encode of an 8-bit grayscale image (2-D numpy
    array): SOI, JFIF APP0, DQT, SOF0, two DHTs, optional DRI, SOS,
    Huffman-coded quantized block DCTs with byte stuffing and restart
    markers, EOI. ``quality_qtable`` is the 64-entry quantization table
    in NATURAL (row-major) order — default is DC=8 / AC=16, the table
    under which block-constant content round-trips bit-exactly.
    ``optimize_huffman=True`` runs the two-pass table build of T.81
    Annex K.2 (per-image symbol frequencies → spec CODE_SIZE/
    ADJUST_BITS procedure), emitting VARIABLE-length canonical codes in
    the DHTs — smaller files, and the decoder's general table
    construction gets exercised beyond the fixed-length default."""
    import struct

    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim != 2:
        raise ValueError("jpeg_encode_gray expects a 2-D array")
    h, w = px.shape
    if not (0 < h <= 65535 and 0 < w <= 65535):
        raise ValueError("image dimensions out of JPEG range")
    q = np.asarray(
        quality_qtable if quality_qtable is not None else [8] + [16] * 63,
        dtype=np.int32,
    ).reshape(8, 8)
    if q.min() < 1 or q.max() > 255:
        raise ValueError("8-bit quantization table entries must be 1..255")

    # pad to block multiples by edge replication
    ph, pw = (h + 7) // 8 * 8, (w + 7) // 8 * 8
    padded = np.pad(px, ((0, ph - h), (0, pw - w)), mode="edge")
    blocks = (
        padded.reshape(ph // 8, 8, pw // 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(-1, 8, 8)
        .astype(np.float64)
        - 128.0
    )
    m = _jpeg_dct_matrix()
    coef = np.einsum("ux,nxy,vy->nuv", m, blocks, m)
    quant = np.round(coef / q[None, :, :]).astype(np.int64).reshape(-1, 64)
    zz = quant[:, _JPEG_ZIGZAG]

    zz_list = zz.tolist()  # plain ints: per-coefficient numpy scalar
    # indexing was a measured encoder hot spot

    def block_symbols(blk, prev_dc):
        """Symbol stream for one block: [('dc'|'ac', symbol, size, bits)]
        — shared between the counting pass (optimize_huffman) and the
        emit pass so both see the identical stream. ``blk`` is a plain
        64-list in zigzag order."""
        syms = []
        size, bits = _jpeg_category(blk[0] - prev_dc)
        syms.append(("dc", size, size, bits))
        run = 0
        last_nz = 0
        for k in range(63, 0, -1):
            if blk[k]:
                last_nz = k
                break
        for k in range(1, last_nz + 1):
            v = blk[k]
            if v == 0:
                run += 1
                continue
            while run >= 16:
                syms.append(("ac", 0xF0, 0, 0))  # ZRL
                run -= 16
            size, bits = _jpeg_category(v)
            if size > 10:
                raise ValueError("AC coefficient magnitude beyond category 10")
            syms.append(("ac", (run << 4) | size, size, bits))
            run = 0
        if last_nz < 63:
            syms.append(("ac", 0x00, 0, 0))  # EOB
        return blk[0], syms

    if optimize_huffman:
        # pass 1 (Annex K.2): per-image symbol frequencies -> spec tables
        fdc = [0] * 257
        fac = [0] * 257
        prev_dc = 0
        for i, blk in enumerate(zz_list):
            if restart_interval and i and i % restart_interval == 0:
                prev_dc = 0
            prev_dc, syms = block_symbols(blk, prev_dc)
            for tbl, sym, _size, _bits in syms:
                (fdc if tbl == "dc" else fac)[sym] += 1
        fdc[256] = 1
        fac[256] = 1
        dc_bits, dc_vals = _jpeg_optimal_table(fdc)
        ac_bits, ac_vals = _jpeg_optimal_table(fac)
    else:
        dc_bits, dc_vals = _JPEG_DC_BITS, _JPEG_DC_VALS
        ac_bits, ac_vals = _JPEG_AC_BITS, _JPEG_AC_VALS
    dc_codes = _jpeg_canonical_codes(dc_bits, dc_vals)
    ac_codes = _jpeg_canonical_codes(ac_bits, ac_vals)

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    zz_q = q.reshape(-1)[_JPEG_ZIGZAG]
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes(int(v) for v in zz_q)
    out += b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, h, w, 1) + b"\x01\x11\x00"
    for cls, bits, vals in (
        (0x00, dc_bits, dc_vals),
        (0x10, ac_bits, ac_vals),
    ):
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(vals))
        out.append(cls)
        out += bytes(bits) + bytes(vals)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += b"\xff\xda" + struct.pack(">HB", 8, 1) + b"\x01\x00\x00\x3f\x00"

    # emit pass: local-accumulator bit pack per entropy segment, whole-
    # byte chunk flushes, then T.81 stuffing in ONE bytes-level replace —
    # stuffing inserts 0x00 after every 0xFF data byte and never creates
    # new 0xFF bytes, and restart markers are appended OUTSIDE the
    # replaced segments, so the byte stream is identical to the
    # per-symbol _JpegBitWriter path (incl. a stuffed 0xFF pad byte)
    acc = 0
    n = 0
    raw = bytearray()
    prev_dc = 0
    for i, blk in enumerate(zz_list):
        if restart_interval and i and i % restart_interval == 0:
            if n:  # 1-bit padding per spec
                pad = 8 - n
                raw.append((acc << pad) | ((1 << pad) - 1))
            out += bytes(raw).replace(b"\xff", b"\xff\x00")
            raw = bytearray()
            acc = 0
            n = 0
            out += bytes([0xFF, 0xD0 + ((i // restart_interval - 1) % 8)])
            prev_dc = 0
        prev_dc, syms = block_symbols(blk, prev_dc)
        for tbl, sym, size, bits in syms:
            ln, code = (dc_codes if tbl == "dc" else ac_codes)[sym]
            if size:
                # one fused pack: code bits then appended bits (same
                # MSB-first stream)
                acc = (acc << (ln + size)) | (
                    (code << size) | (bits & ((1 << size) - 1))
                )
                n += ln + size
            else:
                acc = (acc << ln) | code
                n += ln
            if n >= 8:
                nb = n >> 3
                n -= nb << 3
                raw += (acc >> n).to_bytes(nb, "big")
                acc &= (1 << n) - 1
    if n:  # 1-bit padding per spec
        pad = 8 - n
        raw.append((acc << pad) | ((1 << pad) - 1))
    out += bytes(raw).replace(b"\xff", b"\xff\x00")
    out += b"\xff\xd9"  # EOI
    return bytes(out)


class _JpegBitReader:
    """MSB-first bit reader over entropy-coded data: un-stuffs FF00,
    stops at any other marker (the caller handles RSTn)."""

    def __init__(self, data: bytes, pos: int):
        self.d = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        if self.pos >= len(self.d):
            raise ValueError("JPEG entropy data truncated")
        b = self.d[self.pos]
        if b == 0xFF:
            nxt = self.d[self.pos + 1] if self.pos + 1 < len(self.d) else None
            if nxt == 0x00:
                self.pos += 2
            else:
                raise ValueError("marker inside entropy segment")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.n += 8

    def bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        # bulk extract: fills exactly as many bytes as the former
        # per-bit loop did (lazily, one stuffing-checked byte at a
        # time), so marker/truncation errors fire at the same point —
        # just without k function calls per field
        while self.n < k:
            self._fill()
        self.n -= k
        v = (self.acc >> self.n) & ((1 << k) - 1) if k else 0
        self.acc &= (1 << self.n) - 1
        return v

    def peek8(self) -> int:
        """Top 8 unconsumed bits WITHOUT consuming, or -1 when fewer
        than 8 are available before a marker / end of data. Never
        raises: buffered-but-unconsumed bits are exactly the bits a
        later consuming read would have filled, so truncation/marker
        errors still fire at the same consumption point (peek stops at
        a non-stuffed 0xFF and never advances past it)."""
        d = self.d
        while self.n < 8:
            pos = self.pos
            if pos >= len(d):
                return -1
            b = d[pos]
            if b == 0xFF:
                if pos + 1 < len(d) and d[pos + 1] == 0x00:
                    self.pos = pos + 2
                else:
                    return -1
            else:
                self.pos = pos + 1
            self.acc = (self.acc << 8) | b
            self.n += 8
        return (self.acc >> (self.n - 8)) & 0xFF

    def align_to_marker(self):
        """Discard pad bits; expect and consume an RST marker."""
        self.acc = 0
        self.n = 0
        if self.pos + 1 < len(self.d) and self.d[self.pos] == 0xFF:
            m = self.d[self.pos + 1]
            self.pos += 2
            return m
        raise ValueError("expected restart marker")


_JPEG_DECODER_CACHE: dict = {}


def _jpeg_huff_decoder(bits, vals):
    # Memoized per (BITS, HUFFVAL): the standard-table decode paths
    # rebuild an identical LUT for every asset in a task; the returned
    # closure is stateless across readers. Bounded like the encode-side
    # code cache (per-image optimal tables from the lossless frames).
    key = (tuple(bits), tuple(vals))
    hit = _JPEG_DECODER_CACHE.get(key)
    if hit is not None:
        return hit
    # per-length (mincode, maxcode, value row) arrays — the T.81 F.2.2.3
    # DECODE procedure's comparison walk, one tuple compare per bit
    # instead of a dict probe — plus a first-level LUT: any code of
    # length <= 8 resolves in ONE probe on the next 8 bits
    # ((length << 8) | value packed); longer codes and stream edges fall
    # back to the comparison walk. With the per-image K.2-optimal tables
    # the common symbols are all short, so this removes the per-bit call
    # chain on the decoder's hottest path (guide §1.2 step 2).
    # Consumption and error points are unchanged: peek8 is non-raising
    # and never crosses a marker.
    mincode = [0] * 17
    maxcode = [-1] * 17
    rows: list = [None] * 17
    lut = [0] * 256
    code = 0
    k = 0
    for ln in range(1, 17):
        cnt = bits[ln - 1]
        if cnt:
            mincode[ln] = code
            maxcode[ln] = code + cnt - 1
            rows[ln] = vals[k : k + cnt]
            if ln <= 8:
                span = 1 << (8 - ln)
                for c in range(code, code + cnt):
                    base = c << (8 - ln)
                    lut[base : base + span] = [(ln << 8) | vals[k + c - code]] * span
            code += cnt
            k += cnt
        code <<= 1

    def decode(r: _JpegBitReader) -> int:
        p = r.peek8() if r.n < 8 else (r.acc >> (r.n - 8)) & 0xFF
        if p >= 0:
            e = lut[p]
            if e:
                r.n -= e >> 8
                r.acc &= (1 << r.n) - 1
                return e & 0xFF
        bit = r.bit
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | bit()
            if code <= maxcode[ln]:
                return rows[ln][code - mincode[ln]]
        raise ValueError("invalid JPEG Huffman code")

    decode.tables = (lut, mincode, maxcode, rows)
    if len(_JPEG_DECODER_CACHE) >= 512:
        _JPEG_DECODER_CACHE.clear()
    _JPEG_DECODER_CACHE[key] = decode
    return decode


def _jpeg_diff_run(r: _JpegBitReader, dec, cnt: int) -> list:
    """Decode ``cnt`` DC-class difference values (Huffman category +
    appended bits, T.81 F.12 extend, with the SSSS-16 no-extra-bits and
    SSSS-0 cases) in one call — the decode()/bits()/_jpeg_extend bodies
    inlined over local reader state (the lossless/hierarchical scans'
    hottest loop). Fill, stuffing, truncation and marker errors fire at
    exactly the same consumption points as the per-call path."""
    d = r.d
    nd = len(d)
    pos = r.pos
    acc = r.acc
    nb = r.n
    lut, mincode, maxcode, rows = dec.tables
    out: list = []
    append = out.append
    for _ in range(cnt):
        # non-raising peek fill (peek8 semantics: stop at end / marker)
        while nb < 8:
            if pos >= nd:
                break
            b = d[pos]
            if b == 0xFF:
                if pos + 1 < nd and d[pos + 1] == 0x00:
                    pos += 2
                else:
                    break
            else:
                pos += 1
            acc = (acc << 8) | b
            nb += 8
        t = -1
        if nb >= 8:
            e = lut[(acc >> (nb - 8)) & 0xFF]
            if e:
                nb -= e >> 8
                acc &= (1 << nb) - 1
                t = e & 0xFF
        if t < 0:
            code = 0
            for ln in range(1, 17):
                if nb == 0:  # raising fill (bit() semantics)
                    if pos >= nd:
                        raise ValueError("JPEG entropy data truncated")
                    b = d[pos]
                    if b == 0xFF:
                        if pos + 1 < nd and d[pos + 1] == 0x00:
                            pos += 2
                        else:
                            raise ValueError("marker inside entropy segment")
                    else:
                        pos += 1
                    acc = (acc << 8) | b
                    nb += 8
                nb -= 1
                code = (code << 1) | ((acc >> nb) & 1)
                if code <= maxcode[ln]:
                    t = rows[ln][code - mincode[ln]]
                    break
            else:
                raise ValueError("invalid JPEG Huffman code")
            acc &= (1 << nb) - 1
        if t == 16:
            append(32768)
            continue
        if t == 0:
            append(0)
            continue
        while nb < t:  # raising fill (bits() semantics)
            if pos >= nd:
                raise ValueError("JPEG entropy data truncated")
            b = d[pos]
            if b == 0xFF:
                if pos + 1 < nd and d[pos + 1] == 0x00:
                    pos += 2
                else:
                    raise ValueError("marker inside entropy segment")
            else:
                pos += 1
            acc = (acc << 8) | b
            nb += 8
        nb -= t
        v = (acc >> nb) & ((1 << t) - 1)
        acc &= (1 << nb) - 1
        append(v if v >= (1 << (t - 1)) else v - (1 << t) + 1)
    r.pos = pos
    r.acc = acc
    r.n = nb
    return out


def _jpeg_decode_block_huff(r: _JpegBitReader, dc, ac, prev: int):
    """Decode one baseline data unit (DC category + extend, then the
    F.2.2.2 AC run/size loop with EOB/ZRL) fused over local reader
    state — the per-symbol decode()/bits()/_jpeg_extend call chain was
    the sequential decoder's hottest path. Returns (zigzag-order block
    as a 64-list, new DC predictor). Fill/stuffing/truncation/marker
    errors fire at the same consumption points as the per-call path."""
    d = r.d
    nd = len(d)
    pos = r.pos
    acc = r.acc
    nb = r.n
    blk = [0] * 64
    k = 0  # slot 0 = DC; AC loop starts at 1
    dc_tables = dc.tables
    ac_tables = ac.tables
    lut, mincode, maxcode, rows = dc_tables
    while True:
        # --- one Huffman symbol (decode() semantics) ---
        while nb < 8:  # non-raising peek fill
            if pos >= nd:
                break
            b = d[pos]
            if b == 0xFF:
                if pos + 1 < nd and d[pos + 1] == 0x00:
                    pos += 2
                else:
                    break
            else:
                pos += 1
            acc = (acc << 8) | b
            nb += 8
        sym = -1
        if nb >= 8:
            e = lut[(acc >> (nb - 8)) & 0xFF]
            if e:
                nb -= e >> 8
                acc &= (1 << nb) - 1
                sym = e & 0xFF
        if sym < 0:
            code = 0
            for ln in range(1, 17):
                if nb == 0:  # raising fill (bit() semantics)
                    if pos >= nd:
                        raise ValueError("JPEG entropy data truncated")
                    b = d[pos]
                    if b == 0xFF:
                        if pos + 1 < nd and d[pos + 1] == 0x00:
                            pos += 2
                        else:
                            raise ValueError("marker inside entropy segment")
                    else:
                        pos += 1
                    acc = (acc << 8) | b
                    nb += 8
                nb -= 1
                code = (code << 1) | ((acc >> nb) & 1)
                if code <= maxcode[ln]:
                    sym = rows[ln][code - mincode[ln]]
                    break
            else:
                raise ValueError("invalid JPEG Huffman code")
            acc &= (1 << nb) - 1
        # --- symbol dispatch ---
        if k == 0:
            size = sym
        else:
            if sym == 0x00:  # EOB
                break
            if sym == 0xF0:  # ZRL
                k += 16
                if k < 64:
                    lut, mincode, maxcode, rows = ac_tables
                    continue
                break
            k += sym >> 4
            size = sym & 0xF
            if k > 63:
                raise ValueError("AC run past end of block")
        # --- appended bits (bits() semantics) + F.12 extend ---
        while nb < size:
            if pos >= nd:
                raise ValueError("JPEG entropy data truncated")
            b = d[pos]
            if b == 0xFF:
                if pos + 1 < nd and d[pos + 1] == 0x00:
                    pos += 2
                else:
                    raise ValueError("marker inside entropy segment")
            else:
                pos += 1
            acc = (acc << 8) | b
            nb += 8
        if size:
            nb -= size
            v = (acc >> nb) & ((1 << size) - 1)
            acc &= (1 << nb) - 1
            ext = v if v >= (1 << (size - 1)) else v - (1 << size) + 1
        else:
            ext = 0
        if k == 0:
            prev += ext
            blk[0] = prev
        else:
            blk[k] = ext
        k += 1
        if k >= 64:
            break
        lut, mincode, maxcode, rows = ac_tables
    r.pos = pos
    r.acc = acc
    r.n = nb
    return blk, prev


def _jpeg_extend(bits: int, size: int) -> int:
    """T.81 F.12: map appended bits back to a signed value."""
    if size == 0:
        return 0
    return bits if bits >= (1 << (size - 1)) else bits - (1 << size) + 1


def _jpeg_lossless_predict(a: int, b: int, c: int, sel: int) -> int:
    """T.81 Table H.1 — the seven lossless predictors (a = left,
    b = above, c = above-left; integer arithmetic, >> is the spec's
    arithmetic shift)."""
    if sel == 1:
        return a
    if sel == 2:
        return b
    if sel == 3:
        return c
    if sel == 4:
        return a + b - c
    if sel == 5:
        return a + ((b - c) >> 1)
    if sel == 6:
        return b + ((a - c) >> 1)
    if sel == 7:
        return (a + b) >> 1
    raise ValueError(f"lossless predictor {sel} out of range 1-7")


def jpeg_encode_lossless(
    pixels, predictor: int = 1, point_transform: int = 0
) -> bytes:
    """REAL LOSSLESS JPEG encode (T.81 Annex H — SOF3, process 14):
    single-component 8-bit, predictor selector Ss ∈ 1..7, optional
    point transform Al (samples pre-shifted right, decoder re-shifts
    left). Per sample: prediction from the causal neighbors (default
    2^(P-Pt-1) at the scan start, 'b' down the first column, 'a' along
    the first row per H.1.1), difference taken modulo 2^16, coded as a
    DC-class magnitude category + appended bits with the spec's
    SSSS=16 no-extra-bits special case. The Huffman table is built
    per-image by the Annex K.2 procedure (:func:`_jpeg_optimal_table`).
    NO quantization and no DCT — decode reproduces the (point-
    transformed) samples bit-for-bit, which is what the hash gate
    certifies."""
    import struct

    import numpy as np

    if not 1 <= predictor <= 7:
        raise ValueError(f"predictor must be 1-7, got {predictor}")
    if not 0 <= point_transform <= 7:
        raise ValueError(f"point transform must be 0-7, got {point_transform}")
    px = np.asarray(pixels, dtype=np.int64) >> point_transform
    h, w = px.shape
    default = 1 << (8 - point_transform - 1)
    a = np.zeros_like(px)
    b = np.zeros_like(px)
    c = np.zeros_like(px)
    a[:, 1:] = px[:, :-1]
    b[1:, :] = px[:-1, :]
    c[1:, 1:] = px[:-1, :-1]
    sel = predictor
    if sel == 1:
        pred = a.copy()
    elif sel == 2:
        pred = b.copy()
    elif sel == 3:
        pred = c.copy()
    elif sel == 4:
        pred = a + b - c
    elif sel == 5:
        pred = a + ((b - c) >> 1)
    elif sel == 6:
        pred = b + ((a - c) >> 1)
    else:
        pred = (a + b) >> 1
    # H.1.1 boundary rules: first row predicts from 'a', first column
    # from 'b', the very first sample from the default
    if h > 0:
        pred[0, 1:] = px[0, :-1]
    if w > 0:
        pred[1:, 0] = px[:-1, 0]
    if h > 0 and w > 0:
        pred[0, 0] = default
    diff = (px - pred) & 0xFFFF
    diff = np.where(diff >= 32768, diff - 65536, diff)  # signed mod 2^16
    bits_spec, huffval, entropy = _jpeg_code_diff_stream(diff.reshape(-1))
    out = bytearray(b"\xff\xd8")
    dht = bytes([0x00] + bits_spec + huffval)
    out += b"\xff\xc4" + struct.pack(">H", 2 + len(dht)) + dht
    sof = struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0])
    out += b"\xff\xc3" + struct.pack(">H", 2 + len(sof)) + sof
    sos = bytes([1, 1, 0x00, predictor, 0, point_transform])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    out += entropy
    out += b"\xff\xd9"
    return bytes(out)


_BITLEN8_CACHE = None


def _bitlen8():
    """256-entry bit_length LUT as an int64 numpy array (lazy: the
    module keeps numpy imports function-local for worker ship)."""
    global _BITLEN8_CACHE
    if _BITLEN8_CACHE is None:
        import numpy as np

        _BITLEN8_CACHE = np.array(
            [v.bit_length() for v in range(256)], dtype=np.int64
        )
    return _BITLEN8_CACHE


def _jpeg_code_diff_stream(flat):
    """Entropy-code a flat stream of modulo-2^16 signed differences with
    a per-stream Annex K.2 optimal DC-class Huffman table (shared by the
    lossless Annex-H path and the hierarchical Annex-J differential
    frames). Returns (BITS, HUFFVAL, entropy bytes)."""
    import numpy as np

    a = np.asarray(flat, dtype=np.int64)
    # vectorized magnitude category: bit_length via an exact 256-entry
    # LUT on the low/high byte (abs(-32768) = 32768 → hi byte 128 →
    # 8 + 8 = 16, the SSSS-16 case, so no special-casing needed)
    mag = np.abs(a)
    hi = mag >> 8
    bl = _bitlen8()
    cat = np.where(hi > 0, bl[hi] + 8, bl[mag & 0xFF])
    freq = np.bincount(cat, minlength=257).tolist()
    freq[256] = 1
    bits_spec, huffval = _jpeg_optimal_table(freq)
    codes = _jpeg_canonical_codes(bits_spec, huffval)
    # vectorized symbol prep: per difference the stream is the category's
    # Huffman code followed by `size` appended bits (the value if
    # positive, its one's-complement form if negative) — except SSSS 16,
    # which carries no appended bits. Fold each symbol into ONE
    # (value, width) pair via 17-entry LUTs indexed by category.
    code_lut = np.zeros(17, dtype=np.int64)
    len_lut = np.zeros(17, dtype=np.int64)
    for sym, (ln, code) in codes.items():
        code_lut[sym] = code
        len_lut[sym] = ln
    size = np.where(cat == 16, 0, cat)  # SSSS 16: no appended bits
    extra = np.where(a > 0, a, a + (np.int64(1) << size) - 1) & (
        (np.int64(1) << size) - 1
    )
    vals = (code_lut[cat] << size) | extra
    lens = len_lut[cat] + size
    # pack with a local accumulator, flushing whole-byte chunks, then
    # apply T.81 byte stuffing in ONE pass: stuffing inserts 0x00 after
    # every 0xFF *data* byte and never creates new 0xFF bytes, and this
    # stream contains no markers, so bytes-level replace IS the
    # _JpegBitWriter behavior (byte-identical, incl. a stuffed 0xFF pad
    # byte)
    acc = 0
    n = 0
    raw = bytearray()
    for v, l in zip(vals.tolist(), lens.tolist()):
        acc = (acc << l) | v
        n += l
        if n >= 8:
            nb = n >> 3
            n -= nb << 3
            raw += (acc >> n).to_bytes(nb, "big")
            acc &= (1 << n) - 1
    if n:  # 1-bit padding per spec
        pad = 8 - n
        raw.append((acc << pad) | ((1 << pad) - 1))
    return bits_spec, huffval, bytes(raw).replace(b"\xff", b"\xff\x00")


def _jpeg_decode_lossless(data: bytes):
    """REAL LOSSLESS JPEG decode (T.81 Annex H): marker walk (DHT +
    SOF3 + SOS), per-sample Huffman category + appended-bits entropy
    decode, predictor reconstruction modulo 2^16 with the H.1.1
    boundary rules, point-transform left shift on output. Single
    8-bit component; other shapes raise loudly."""
    import struct

    import numpy as np

    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    dc_dec = {}
    h = w = None
    predictor = None
    pt = 0
    i = 2
    n = len(data)
    pos = None
    while i < n:
        if data[i] != 0xFF:
            raise ValueError(f"expected marker at offset {i}")
        while i < n and data[i] == 0xFF:
            i += 1
        marker = data[i]
        i += 1
        if marker in (0x01,) or 0xD0 <= marker <= 0xD8:
            continue
        if marker == 0xD9:
            break
        (seglen,) = struct.unpack(">H", data[i : i + 2])
        seg_end = i + seglen
        p = i + 2
        if marker == 0xC4:
            while p < seg_end:
                cls, tid = data[p] >> 4, data[p] & 0xF
                p += 1
                bits = list(data[p : p + 16])
                p += 16
                nv = sum(bits)
                vals = list(data[p : p + nv])
                p += nv
                if cls == 0:
                    dc_dec[tid] = _jpeg_huff_decoder(bits, vals)
        elif marker == 0xC3:
            prec = data[p]
            if prec != 8:
                raise ValueError(
                    f"lossless JPEG precision {prec} unsupported (8 only)"
                )
            h, w = struct.unpack(">HH", data[p + 1 : p + 5])
            nf = data[p + 5]
            if nf != 1:
                raise ValueError(
                    f"{nf}-component lossless JPEG unsupported (grayscale only)"
                )
        elif marker == 0xDD:
            (restart,) = struct.unpack(">H", data[p : p + 2])
            if restart:
                raise ValueError(
                    "restart intervals unsupported in lossless JPEG decode"
                )
        elif marker == 0xDA:
            ns = data[p]
            if ns != 1 or h is None:
                raise ValueError("unsupported lossless scan layout")
            td = data[p + 2] >> 4
            off = p + 1 + 2 * ns
            predictor = data[off]
            pt = data[off + 2] & 0xF
            if not 1 <= predictor <= 7:
                raise ValueError(
                    f"lossless predictor {predictor} out of range 1-7"
                )
            if td not in dc_dec:
                raise ValueError(f"scan references undefined DC table {td}")
            dec = dc_dec[td]
            pos = seg_end
            break
        i = seg_end
    if pos is None:
        raise ValueError("no lossless scan found")
    default = 1 << (8 - pt - 1)
    r = _JpegBitReader(data, pos)
    # entropy decode of the whole sample stream in one fused call (same
    # symbol order/consumption points), then the causal prediction walk —
    # which carries a loop dependency, so it stays scalar, over plain
    # Python row lists: per-sample numpy scalar indexing (px[y, x]
    # reads/writes) was a measured hot spot
    diffs = _jpeg_diff_run(r, dec, h * w)
    rows_px: list = []
    prev_row: list = []
    di = 0
    for y in range(h):
        cur: list = []
        append = cur.append
        for x in range(w):
            diff = diffs[di]
            di += 1
            if y == 0 and x == 0:
                pred = default
            elif y == 0:
                pred = cur[x - 1]
            elif x == 0:
                pred = prev_row[0]
            else:
                pred = _jpeg_lossless_predict(
                    cur[x - 1], prev_row[x], prev_row[x - 1], predictor
                )
            append((pred + diff) & 0xFFFF)
        rows_px.append(cur)
        prev_row = cur
    px = np.array(rows_px, dtype=np.int64).reshape(h, w)
    return (px << pt).astype(np.uint8)


def jpeg_decode(data: bytes):
    """REAL baseline JPEG decode, general form (round 10): marker walk,
    DQT/DHT/SOF0/SOS/DRI parse, interleaved-MCU canonical-Huffman
    entropy decode with restart resync, per-component dequantize /
    de-zigzag / IDCT, chroma upsampling, and the JFIF YCbCr→RGB inverse
    transform. Supports 1-component (grayscale) and 3-component (YCbCr)
    scans with sampling factors H,V ∈ {1,2} — i.e. 4:4:4, 4:2:2, 4:4:0
    and the ubiquitous 4:2:0. Returns (h, w) uint8 for grayscale or
    (h, w, 3) uint8 RGB. PROGRESSIVE (SOF2) streams decode through the
    multi-scan coefficient-assembly path — grayscale AND three-component
    color since round 11 (interleaved DC scans over the MCU grid with
    per-component predictors, non-interleaved AC/DC scans over each
    component's true data units, spectral selection + successive
    approximation). LOSSLESS (SOF3, Annex H) and
    HIERARCHICAL (DHP, Annex J) streams dispatch to their dedicated
    round-11 paths. ARITHMETIC-CODED sequential streams (SOF9, Annex D
    QM-coder + F.1.4.4 models, DAC conditioning, restarts) decode
    through the shared sequential path since round 11. Raises loudly on
    arithmetic progressive/lossless/differential modes, 12-bit
    precision, or sampling factors beyond 2 — the documented scope
    narrowing."""
    import struct

    import numpy as np

    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    qtables = {}
    dc_dec = {}
    ac_dec = {}
    h = w = None
    comps = None  # [(cid, H, V, Tq)]
    scan = None   # [(cid, Td, Ta)]
    restart = 0
    progressive = False
    arith = False
    dc_cond = {}  # DAC conditioning: table id -> (L, U)
    ac_cond = {}  # DAC conditioning: table id -> Kx
    prog_stores = None  # progressive: per-COMPONENT zigzag stores (true dims)
    i = 2
    n = len(data)
    while i < n:
        if data[i] != 0xFF:
            raise ValueError(f"expected marker at offset {i}")
        while i < n and data[i] == 0xFF:
            i += 1
        marker = data[i]
        i += 1
        if marker == 0xD9:  # EOI
            if progressive and prog_stores is not None:
                break
            raise ValueError("EOI before SOS")
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue
        (seglen,) = struct.unpack(">H", data[i : i + 2])
        seg_end = i + seglen
        p = i + 2
        if marker == 0xDB:  # DQT
            while p < seg_end:
                pq, tq = data[p] >> 4, data[p] & 0xF
                p += 1
                if pq != 0:
                    raise ValueError("16-bit quantization tables unsupported")
                tbl = np.zeros(64, dtype=np.int32)
                tbl[_JPEG_ZIGZAG] = np.frombuffer(data[p : p + 64], np.uint8)
                qtables[tq] = tbl.reshape(8, 8)
                p += 64
        elif marker == 0xC4:  # DHT
            while p < seg_end:
                cls, tid = data[p] >> 4, data[p] & 0xF
                p += 1
                bits = list(data[p : p + 16])
                p += 16
                nv = sum(bits)
                vals = list(data[p : p + nv])
                p += nv
                dec = _jpeg_huff_decoder(bits, vals)
                (dc_dec if cls == 0 else ac_dec)[tid] = dec
        elif marker in (0xC0, 0xC1, 0xC2, 0xC9):
            # SOF0/1 baseline, SOF2 progressive, SOF9 sequential arithmetic
            progressive = marker == 0xC2
            arith = marker == 0xC9
            prec = data[p]
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            h, w = struct.unpack(">HH", data[p + 1 : p + 5])
            nf = data[p + 5]
            if nf not in (1, 3):
                raise ValueError(f"{nf}-component JPEG unsupported")
            comps = []
            for c in range(nf):
                cid = data[p + 6 + 3 * c]
                hv = data[p + 7 + 3 * c]
                tq = data[p + 8 + 3 * c]
                hi, vi = hv >> 4, hv & 0xF
                if hi not in (1, 2) or vi not in (1, 2):
                    raise ValueError(
                        f"sampling factors {hi}x{vi} unsupported (1-2 only)"
                    )
                comps.append((cid, hi, vi, tq))
        elif marker == 0xC3:  # lossless (Annex H): dedicated path
            return _jpeg_decode_lossless(data)
        elif marker == 0xDE:  # DHP: hierarchical (Annex J) dedicated path
            return _jpeg_decode_hierarchical(data)
        elif marker in (0xC5, 0xC6, 0xC7):
            raise ValueError(
                "differential frame outside a hierarchical stream (no DHP)"
            )
        elif marker in (0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                "arithmetic progressive/lossless/differential JPEG "
                "unsupported (sequential SOF9 is the supported mode)"
            )
        elif marker == 0xCC:  # DAC: arithmetic conditioning (B.2.4.3)
            while p < seg_end:
                tc, tb = data[p] >> 4, data[p] & 0xF
                cs = data[p + 1]
                p += 2
                if tc == 0:
                    lo, up = cs & 0xF, cs >> 4
                    if lo > up:
                        raise ValueError("DAC DC conditioning needs L <= U")
                    dc_cond[tb] = (lo, up)
                else:
                    if not (1 <= cs <= 63):
                        raise ValueError("DAC AC conditioning Kx must be 1..63")
                    ac_cond[tb] = cs
        elif marker == 0xDD:  # DRI
            (restart,) = struct.unpack(">H", data[p : p + 2])
        elif marker == 0xDA:  # SOS
            ns = data[p]
            if comps is None:
                raise ValueError("SOS before SOF")
            if not progressive:
                if ns != len(comps):
                    raise ValueError("SOS component count mismatch")
                scan = []
                for c in range(ns):
                    cid = data[p + 1 + 2 * c]
                    tt = data[p + 2 + 2 * c]
                    scan.append((cid, tt >> 4, tt & 0xF))
                i = seg_end
                break
            # ----- progressive scan (grayscale OR color, round 11) -----
            scomps = []
            for c in range(ns):
                cid_s = data[p + 1 + 2 * c]
                tt = data[p + 2 + 2 * c]
                scomps.append((cid_s, tt >> 4, tt & 0xF))
            off = p + 1 + 2 * ns
            ss_, se_ = data[off], data[off + 1]
            ah_, al_ = data[off + 2] >> 4, data[off + 2] & 0xF
            if prog_stores is None:
                import numpy as _np

                hmax_ = max(c[1] for c in comps)
                vmax_ = max(c[2] for c in comps)
                prog_stores = []
                for _cid, hi_c, vi_c, _tq in comps:
                    # TRUE component dims (T.81 A.1.1) — non-interleaved
                    # scans walk exactly these blocks in raster order
                    cw_ = (w * hi_c + hmax_ - 1) // hmax_
                    ch_ = (h * vi_c + vmax_ - 1) // vmax_
                    prog_stores.append(
                        _np.zeros(
                            ((ch_ + 7) // 8, (cw_ + 7) // 8, 64),
                            dtype=_np.int64,
                        )
                    )
            cindex = {c[0]: k for k, c in enumerate(comps)}
            if ns == 1:
                cid_s, td, ta = scomps[0]
                if cid_s not in cindex:
                    raise ValueError("scan references unknown component")
                flat = prog_stores[cindex[cid_s]].reshape(-1, 64)
                i = _jpeg_decode_prog_scan(
                    data, seg_end, flat, ss_, se_, ah_, al_,
                    dc_dec.get(td), ac_dec.get(ta), restart,
                )
            else:
                if ss_ != 0 or se_ != 0:
                    raise ValueError(
                        "interleaved progressive scan must be DC-only"
                    )
                i = _jpeg_decode_prog_dc_interleaved(
                    data, seg_end, prog_stores, scomps, comps, cindex,
                    dc_dec, ah_, al_, restart, w, h,
                )
            continue
        i = seg_end
    else:
        if progressive and prog_stores is not None:
            # EOI path for progressive streams falls through the loop
            pass
        else:
            raise ValueError("no SOS marker")

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (h + 8 * vmax - 1) // (8 * vmax)

    if progressive:
        if prog_stores is None:
            raise ValueError("progressive JPEG with no scans")
        # zero-pad each component's true-dim store to the MCU grid; the
        # padding blocks only touch pixels the final crop discards
        stores = []
        for ci, (cid, hi, vi, tq) in enumerate(comps):
            if tq not in qtables:
                raise ValueError("missing quantization table")
            pad = np.zeros((mcus_y * vi, mcus_x * hi, 64), dtype=np.int64)
            st = prog_stores[ci]
            pad[: st.shape[0], : st.shape[1]] = st
            stores.append(pad)
    else:
        if h is None or scan is None:
            raise ValueError("missing SOF0 or SOS")
        sel = {cid: (td, ta) for cid, td, ta in scan}
        n_mcus = mcus_x * mcus_y

        # per-component coefficient stores, one row per block in MCU order
        stores = []
        for cid, hi, vi, tq in comps:
            if tq not in qtables or cid not in sel:
                raise ValueError("missing quantization/huffman selection")
            stores.append(
                np.zeros((mcus_y * vi, mcus_x * hi, 64), dtype=np.int64)
            )

        prev_dc = [0] * len(comps)
        if arith:
            dec = _QMDecoder(data, i)
            fixed = bytearray([113])
            dc_stats = {}
            ac_stats = {}
            dc_ctx = [0] * len(comps)

            def decode_block(ci):
                td, ta = sel[comps[ci][0]]
                sdc = dc_stats.setdefault(td, bytearray(64))
                sac = ac_stats.setdefault(ta, bytearray(256))
                cl, cu = dc_cond.get(td, (0, 1))
                kx = ac_cond.get(ta, 5)
                blk = np.zeros(64, dtype=np.int64)
                diff, dc_ctx[ci] = _arith_decode_dc(dec, sdc, dc_ctx[ci], cl, cu)
                prev_dc[ci] += diff
                blk[0] = prev_dc[ci]
                _arith_decode_ac(dec, sac, fixed, blk, kx)
                return blk

        else:
            r = _JpegBitReader(data, i)

            def decode_block(ci):
                dc = dc_dec[sel[comps[ci][0]][0]]
                ac = ac_dec[sel[comps[ci][0]][1]]
                blk, prev_dc[ci] = _jpeg_decode_block_huff(
                    r, dc, ac, prev_dc[ci]
                )
                return blk

        for midx in range(n_mcus):
            if restart and midx and midx % restart == 0:
                if arith:
                    # the flushed segment may end in droppable zero
                    # bytes the decoder never consumed: scan forward to
                    # the marker (0xFF + non-fill, non-stuffed byte)
                    j = dec.marker_pos if dec.marker_pos is not None else dec.pos
                    while j + 1 < n and not (
                        data[j] == 0xFF and data[j + 1] not in (0x00, 0xFF)
                    ):
                        j += 1
                    if j + 1 >= n:
                        raise ValueError("expected restart marker")
                    m_ = data[j + 1]
                    if not (0xD0 <= m_ <= 0xD7):
                        raise ValueError(f"expected RSTn, got 0x{m_:02x}")
                    # full statistics reset per F.1.4.1.1 / D.1.1
                    dec = _QMDecoder(data, j + 2)
                    dc_stats = {}
                    ac_stats = {}
                    dc_ctx = [0] * len(comps)
                else:
                    m_ = r.align_to_marker()
                    if not (0xD0 <= m_ <= 0xD7):
                        raise ValueError(f"expected RSTn, got 0x{m_:02x}")
                prev_dc = [0] * len(comps)
            my, mx = divmod(midx, mcus_x)
            for ci, (cid, hi, vi, tq) in enumerate(comps):
                for v in range(vi):
                    for hh in range(hi):
                        stores[ci][my * vi + v, mx * hi + hh] = decode_block(ci)

    m = _jpeg_dct_matrix()
    planes = []
    for ci, (cid, hi, vi, tq) in enumerate(comps):
        zz = stores[ci].reshape(-1, 64)
        coef = np.zeros((zz.shape[0], 64), dtype=np.float64)
        coef[:, _JPEG_ZIGZAG] = zz
        coef = coef.reshape(-1, 8, 8) * qtables[tq][None, :, :]
        spatial = np.einsum("xu,nuv,yv->nxy", m.T, coef, m.T) + 128.0
        bh, bw_ = mcus_y * vi, mcus_x * hi
        plane = (
            spatial.reshape(bh, bw_, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(bh * 8, bw_ * 8)
        )
        # upsample to full sampling grid (nearest-neighbor repeat — the
        # canonical box upsample for 4:2:0/4:2:2 chroma)
        if hi != hmax or vi != vmax:
            plane = np.repeat(np.repeat(plane, vmax // vi, 0), hmax // hi, 1)
        planes.append(plane[: mcus_y * vmax * 8, : mcus_x * hmax * 8])

    if len(planes) == 1:
        out = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
        return out[:h, :w]
    y, cb, cr = (p[:h, :w] for p in planes)
    r_ = y + 1.402 * (cr - 128.0)
    g_ = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b_ = y + 1.772 * (cb - 128.0)
    rgb = np.stack(
        [np.clip(np.round(c), 0, 255).astype(np.uint8) for c in (r_, g_, b_)],
        axis=2,
    )
    return rgb


def jpeg_decode_gray(data: bytes):
    """Grayscale-returning wrapper over :func:`jpeg_decode` — the
    original round-10 single-component contract (raises on color input
    rather than silently converting)."""
    px = jpeg_decode(data)
    if px.ndim != 2:
        raise ValueError("color JPEG passed to jpeg_decode_gray")
    return px


def block_gray_lattice(
    seed: int, width: int, height: int, seed_mul: int = 1, cell_mul: int = 1
):
    """Generalized block-constant gray content: 8×8 block i (row-major)
    is uniformly (seed_mul·seed + cell_mul·i) % 256. Every block carries
    ONLY a DC coefficient, so the default DC quantum (8) keeps the lossy
    JPEG round trip bit-exact for ANY multipliers; non-unit multipliers
    give the pseudo-varied cell patterns the perceptual-hash gate needs
    (unit multipliers = :func:`jpeg_block_gray`, the original
    contract)."""
    import numpy as np

    bw = (width + 7) // 8
    bh = (height + 7) // 8
    vals = (seed_mul * seed + cell_mul * np.arange(bh * bw)) % 256
    grid = np.repeat(np.repeat(vals.reshape(bh, bw), 8, 0), 8, 1)
    return grid[:height, :width].astype(np.uint8)


def jpeg_block_gray(asset_id: int, width: int, height: int):
    """The block-constant content contract behind the JPEG hash gate:
    8×8 block (bx, by) is uniformly (asset_id + by·bw + bx) % 256, so
    every block carries ONLY a DC coefficient and the default DC quantum
    (8) makes the lossy round trip bit-exact — the oracle recomputes the
    pixel sum closed-form per block (value × covered pixels)."""
    return block_gray_lattice(asset_id, width, height)


def encode_jpeg_assets(
    df: DataFrame,
    id_col: str = "doc_id",
    width_col: str = "width",
    height_col: str = "height",
    restart_col: str | None = None,
    optimize_col: str | None = None,
) -> DataFrame:
    """Arrow-batched REAL baseline JPEG encode of block-constant
    grayscale content: (id, width, height[, restart_interval]
    [, optimize]) → (id, content binary) — the JPEG member of the
    encode_png_assets / encode_gif_assets family (pixels never cross a
    shuffle). An optional ``restart_col`` (int; 0 = none) emits DRI/RSTn
    restart markers, and an optional boolean ``optimize_col`` switches
    those images to Annex-K.2 per-image Huffman tables — so the
    decoder's resync AND variable-length-table paths both run under the
    gate."""
    spark = df.sparkSession
    _ship_package(spark)
    cols = [id_col, width_col, height_col]
    if restart_col is not None:
        cols.append(restart_col)
    if optimize_col is not None:
        cols.append(optimize_col)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pipes_spark.operators.multimodal import (
            jpeg_block_gray,
            jpeg_encode_gray,
        )

        for pdf in batches:
            ri = (
                pdf[restart_col]
                if restart_col is not None
                else [0] * len(pdf)
            )
            opt = (
                pdf[optimize_col]
                if optimize_col is not None
                else [False] * len(pdf)
            )
            yield pd.DataFrame(
                {
                    "asset_id": pdf[id_col].astype("int64"),
                    "content": [
                        jpeg_encode_gray(
                            jpeg_block_gray(int(i), int(w), int(h)),
                            restart_interval=int(r),
                            optimize_huffman=bool(o),
                        )
                        for i, w, h, r, o in zip(
                            pdf[id_col],
                            pdf[width_col],
                            pdf[height_col],
                            ri,
                            opt,
                        )
                    ],
                }
            )

    return df.select(*cols).mapInPandas(
        gen, "asset_id bigint, content binary"
    )


def jpeg_decode_stats(assets: DataFrame) -> DataFrame:
    """REAL baseline JPEG decode over Arrow batches — marker walk,
    DQT/DHT/SOF0/DRI/SOS parse, canonical-Huffman entropy decode with
    restart resync, dequantize, de-zigzag, IDCT — plus a pixel checksum:
    (asset_id, format, width, height, bit_depth, n_components, n_pixels,
    pixel_sum). The pixel_sum can only be produced by running the full
    inverse transform chain, so a hash-match against the closed-form
    block-constant oracle certifies the decoder end to end (catalog
    ``multimodal_jpeg_roundtrip``; the png/gif precedent). Corrupt or
    out-of-scope files (progressive, color, 12-bit) raise loudly."""
    spark = assets.sparkSession
    _ship_package(spark)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from pipes_spark.operators.multimodal import (
            jpeg_decode_gray,
            sniff_image_header,
        )

        for pdf in batches:
            out = {
                "asset_id": [],
                "format": [],
                "width": [],
                "height": [],
                "bit_depth": [],
                "n_components": [],
                "n_pixels": [],
                "pixel_sum": [],
            }
            for aid, content in zip(pdf["asset_id"], pdf["content"]):
                b = bytes(content)
                fmt, w, h, depth, ncomp = sniff_image_header(b)
                if fmt != "jpeg":
                    raise ValueError(f"asset {aid}: not a JPEG")
                px = jpeg_decode_gray(b)
                out["asset_id"].append(int(aid))
                out["format"].append(fmt)
                out["width"].append(int(px.shape[1]))
                out["height"].append(int(px.shape[0]))
                out["bit_depth"].append(int(depth))
                out["n_components"].append(int(ncomp))
                out["n_pixels"].append(int(px.size))
                out["pixel_sum"].append(int(px.sum(dtype=np.int64)))
            yield pd.DataFrame(out)

    return assets.mapInPandas(
        gen,
        "asset_id bigint, format string, width int, height int, "
        "bit_depth int, n_components int, n_pixels bigint, pixel_sum bigint",
    )


# --------------------------------------------------------------------------
# WAV: REAL PCM audio codec from the public RIFF/WAVE format description
# (Microsoft/IBM multimedia spec; the canonical fmt/data chunk layout).
# PCM needs no codec library — this closes the AUDIO decode gap for the
# uncompressed case the way PNG/GIF/JPEG closed images. 16-bit PCM, mono
# or stereo; other encodings (fmt tag != 1) raise loudly.
# --------------------------------------------------------------------------


def wav_encode_pcm16(
    asset_id: int, n_samples: int, sample_rate: int = 16000, channels: int = 1
) -> bytes:
    """Minimal REAL WAV (RIFF: 'WAVE' form, fmt chunk with PCM tag 1,
    data chunk): sample i of channel c = ((asset_id + i·channels + c) ·
    2557) % 65536 − 32768 — a deterministic full-range int16 signal the
    decode oracle recomputes closed-form (2557 is odd, so the lattice
    walks all residues)."""
    import struct

    import numpy as np

    idx = np.arange(n_samples * channels, dtype=np.int64)
    samples = (((asset_id + idx) * 2557) % 65536 - 32768).astype("<i2")
    data = samples.tobytes()
    byte_rate = sample_rate * channels * 2
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, byte_rate, channels * 2, 16
    )
    out = bytearray(b"RIFF")
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    if len(data) % 2:  # RIFF chunks are word-aligned
        body += b"\x00"
    out += struct.pack("<I", len(body)) + body
    return bytes(out)


def g711_ulaw_decode_table():
    """G.711 µ-law code → linear value table (256 entries), from the
    public CCITT reference expansion: complement the code, then
    ((mantissa << 3) + 132) << exponent − 132, sign-applied."""
    import numpy as np

    c = np.arange(256, dtype=np.int64)
    u = (~c) & 0xFF
    sign = (u & 0x80) != 0
    exp = (u >> 4) & 0x07
    mant = u & 0x0F
    t = (((mant << 3) + 0x84) << exp) - 0x84
    return np.where(sign, -t, t)


def g711_alaw_decode_table():
    """G.711 A-law code → linear value table (256 entries), from the
    public CCITT reference expansion (toggle the even bits with 0x55;
    segment 0 adds 8, segment 1 adds 0x108, higher segments shift; the
    sign bit SET means positive)."""
    import numpy as np

    c = np.arange(256, dtype=np.int64)
    a = c ^ 0x55
    seg = (a >> 4) & 0x07
    t = (a & 0x0F) << 4
    t = np.where(seg == 0, t + 8, np.where(seg == 1, t + 0x108, 0))
    hi = ((a & 0x0F) << 4) + 0x108
    for s in range(2, 8):
        t = np.where(seg == s, hi << (s - 1), t)
    return np.where((a & 0x80) != 0, t, -t)


def g711_ulaw_encode(samples):
    """Linear (16-bit domain) → µ-law code (G.711, the public reference
    convention with BIAS 0x84 and CLIP 32635): clamp, add the bias, find
    the segment (MSB position), pack sign/exponent/mantissa, complement.
    Inverse of :func:`g711_ulaw_decode_table` on every code except the
    canonical negative-zero 0x7F (which re-encodes as 0xFF)."""
    import numpy as np

    x = np.asarray(samples, dtype=np.int64)
    sign = x < 0
    mag = np.clip(np.abs(x), 0, 32635) + 0x84
    exp = (np.floor(np.log2(mag)).astype(np.int64) - 7).clip(0, 7)
    mant = (mag >> (exp + 3)) & 0x0F
    code = (np.where(sign, 0x80, 0) | (exp << 4) | mant) ^ 0xFF
    return code.astype(np.uint8)


def g711_alaw_encode(samples):
    """Linear (16-bit domain) → A-law code (G.711 public reference
    convention): segment by MSB (segment 0 below 256), pack, toggle the
    even bits (sign bit set = positive). Exact inverse of
    :func:`g711_alaw_decode_table` on all 256 codes."""
    import numpy as np

    x = np.asarray(samples, dtype=np.int64)
    pos = x >= 0
    mag = np.clip(np.abs(x), 0, 32767)
    seg = np.zeros_like(mag)
    for s in range(1, 8):
        seg = np.where(mag >= (1 << (s + 7)), s, seg)
    mant = np.where(seg == 0, mag >> 4, (mag >> (seg + 3)) & 0x0F)
    code = (np.where(pos, 0x80, 0) | (seg << 4) | mant) ^ 0x55
    return code.astype(np.uint8)


def wav_decode_pcm(content: bytes, label: str = "asset"):
    """Standalone RIFF/WAVE decode (the parse inside
    :func:`wav_decode_stats`, factored out so :func:`extract_features`
    real mode can dispatch to it): RIFF walk skipping unknown chunks per
    the spec's chunk framing (word alignment honored), fmt parse, sample
    decode. Format tags: 1 = 16-bit linear PCM; 6/7 = G.711 A-law/µ-law
    COMPANDED 8-bit audio (round 11), expanded to the spec's linear
    values through the public CCITT tables. Returns ``(samples int64
    ndarray, n_channels, sample_rate, bit_depth)``; other encodings and
    truncated files raise loudly."""
    import struct

    import numpy as np

    b = bytes(content)
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError(f"{label}: not a RIFF/WAVE file")
    (riff_len,) = struct.unpack("<I", b[4:8])
    if riff_len + 8 > len(b):
        raise ValueError(f"{label}: truncated RIFF payload")
    i = 12
    fmt = None
    fmt_body = None
    data = None
    fact = None
    while i + 8 <= len(b):
        cid = b[i : i + 4]
        (clen,) = struct.unpack("<I", b[i + 4 : i + 8])
        body = b[i + 8 : i + 8 + clen]
        if len(body) != clen:
            raise ValueError(f"{label}: truncated chunk {cid!r}")
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
            fmt_body = body
        elif cid == b"data":
            data = body
        elif cid == b"fact" and clen >= 4:
            (fact,) = struct.unpack("<I", body[:4])
        i += 8 + clen + (clen & 1)  # word alignment
    if fmt is None or data is None:
        raise ValueError(f"{label}: missing fmt or data chunk")
    tag, nch, rate, _brate, align, bits = fmt
    if tag == 1 and bits == 16:
        samples = np.frombuffer(data, dtype="<i2").astype(np.int64)
    elif tag == 1 and bits == 8:
        # 8-bit linear PCM is UNSIGNED per the WAV spec; center on 0
        samples = np.frombuffer(data, dtype=np.uint8).astype(np.int64) - 128
    elif tag == 1 and bits == 24:
        # 3-byte little-endian signed frames (no numpy int24: widen)
        if len(data) % 3:
            raise ValueError(f"{label}: partial 24-bit sample")
        raw = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        u = (
            raw[:, 0].astype(np.int64)
            | (raw[:, 1].astype(np.int64) << 8)
            | (raw[:, 2].astype(np.int64) << 16)
        )
        samples = np.where(u >= 1 << 23, u - (1 << 24), u)
    elif tag == 3 and bits == 32:
        # IEEE float PCM in [-1, 1); scaled back to the 16-bit domain
        # (values k/32768 with |k| < 32768 are exact in float32, so the
        # scaling is lossless for the signal contract)
        f = np.frombuffer(data, dtype="<f4").astype(np.float64)
        samples = np.rint(f * 32768.0).astype(np.int64)
    elif tag in (6, 7) and bits == 8:
        codes = np.frombuffer(data, dtype=np.uint8)
        table = (
            g711_alaw_decode_table() if tag == 6 else g711_ulaw_decode_table()
        )
        samples = table[codes]
    elif tag in (17, 2) and bits == 4:
        # ADPCM (round 11): block-framed 4-bit differential codes — IMA
        # (tag 17: per-block predictor + step-index header) or Microsoft
        # (tag 2: coefficient-pair header with adaptive delta). The true
        # sample count lives in the 'fact' chunk per the WAV spec (the
        # final block is zero-padded to nBlockAlign).
        if nch != 1:
            raise ValueError(
                f"{label}: ADPCM decode supports mono (got {nch}ch)"
            )
        if fact is None:
            raise ValueError(f"{label}: ADPCM WAV missing its fact chunk")
        if fmt_body is None or len(fmt_body) < 20:
            raise ValueError(f"{label}: ADPCM fmt missing wSamplesPerBlock")
        (spb,) = struct.unpack("<H", fmt_body[18:20])
        want_spb = (align - 4) * 2 + 1 if tag == 17 else (align - 7) * 2 + 2
        if spb != want_spb:
            raise ValueError(
                f"{label}: wSamplesPerBlock {spb} inconsistent with "
                f"nBlockAlign {align} for tag {tag}"
            )
        dec = adpcm_ima_decode_mono if tag == 17 else adpcm_ms_decode_mono
        samples = dec(data, align, spb, fact, label=label)
    else:
        raise ValueError(
            f"{label}: unsupported WAV encoding (tag {tag}, {bits}-bit; "
            "supported: 16-bit PCM, 8-bit G.711 A-law/mu-law, 4-bit "
            "IMA/MS ADPCM mono)"
        )
    if samples.size % nch:
        raise ValueError(f"{label}: partial sample frame")
    return samples, int(nch), int(rate), int(bits)


def wav_encode_g711(
    asset_id: int, n_samples: int, sample_rate: int = 8000, law: str = "ulaw"
) -> bytes:
    """Minimal REAL G.711 companded WAV (RIFF 'WAVE', fmt tag 7 = µ-law
    / 6 = A-law, 8-bit): code byte i = (asset_id·7 + i·13) % 256 — a
    deterministic lattice covering all 256 codes, so the decode gate
    exercises the full expansion table and the oracle recomputes every
    linear value closed-form from the public G.711 formula."""
    import struct

    import numpy as np

    idx = np.arange(n_samples, dtype=np.int64)
    data = ((asset_id * 7 + idx * 13) % 256).astype(np.uint8).tobytes()
    tag = 7 if law == "ulaw" else 6
    if law not in ("ulaw", "alaw"):
        raise ValueError(f"law must be 'ulaw' or 'alaw', got {law!r}")
    fmt = struct.pack("<HHIIHH", tag, 1, sample_rate, sample_rate, 1, 8)
    out = bytearray(b"RIFF")
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    if len(data) % 2:
        body += b"\x00"
    out += struct.pack("<I", len(body)) + body
    return bytes(out)


def encode_wav_g711_assets(
    df: DataFrame,
    id_col: str = "doc_id",
    samples_col: str = "n_samples",
    rate_col: str = "sample_rate",
    law_col: str = "law",
) -> DataFrame:
    """Arrow-batched G.711 companded-WAV encode: (id, n_samples, rate,
    law 'ulaw'|'alaw') → (id, content binary)."""
    spark = df.sparkSession
    _ship_package(spark)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pipes_spark.operators.multimodal import wav_encode_g711

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "asset_id": pdf[id_col].astype("int64"),
                    "content": [
                        wav_encode_g711(int(i), int(n), int(r), str(lw))
                        for i, n, r, lw in zip(
                            pdf[id_col], pdf[samples_col], pdf[rate_col],
                            pdf[law_col],
                        )
                    ],
                }
            )

    return df.select(id_col, samples_col, rate_col, law_col).mapInPandas(
        gen, "asset_id bigint, content binary"
    )


def _ieee754_extended_encode(value: int) -> bytes:
    """Encode a positive integer as the 80-bit IEEE 754 extended-precision
    big-endian float AIFF's COMM chunk uses for the sample rate (sign+
    15-bit exponent biased 16383, 64-bit mantissa with EXPLICIT integer
    bit)."""
    import struct

    if value <= 0:
        raise ValueError("AIFF sample rate must be positive")
    e = value.bit_length() - 1
    mant = value << (63 - e)
    return struct.pack(">HQ", 16383 + e, mant)


def _ieee754_extended_decode(b: bytes) -> int:
    """Decode AIFF's 80-bit extended sample rate back to an integer rate
    (rounded; audio rates are integral in practice)."""
    import struct

    se, mant = struct.unpack(">HQ", b[:10])
    if se & 0x8000:
        raise ValueError("negative AIFF sample rate")
    e = se - 16383
    if e < 0 or e > 62:
        raise ValueError(f"AIFF sample rate exponent {e} out of range")
    shift = 63 - e
    return (mant + (1 << (shift - 1))) >> shift if shift > 0 else mant


def aiff_encode_pcm16(
    asset_id: int, n_samples: int, sample_rate: int = 16000, channels: int = 1
) -> bytes:
    """Minimal REAL AIFF (IFF 'FORM'/'AIFF' with BIG-endian chunk sizes,
    COMM chunk incl. the 80-bit extended sample rate, SSND with
    offset/blockSize preamble): the SAME int16 lattice signal as
    :func:`wav_encode_pcm16` but big-endian — so the pair proves the
    byte-order handling is real, not incidental."""
    import struct

    import numpy as np

    idx = np.arange(n_samples * channels, dtype=np.int64)
    samples = (((asset_id + idx) * 2557) % 65536 - 32768).astype(">i2")
    comm = struct.pack(">hIh", channels, n_samples, 16)
    comm += _ieee754_extended_encode(sample_rate)
    ssnd = struct.pack(">II", 0, 0) + samples.tobytes()

    def chunk(cid: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) % 2 else b""
        return cid + struct.pack(">I", len(body)) + body + pad

    body = b"AIFF" + chunk(b"COMM", comm) + chunk(b"SSND", ssnd)
    return b"FORM" + struct.pack(">I", len(body)) + body


def aiff_decode_pcm(content: bytes, label: str = "asset"):
    """Standalone AIFF decode (FORM walk honoring big-endian sizes and
    word alignment, COMM parse incl. the 80-bit extended rate, SSND
    offset skip). Returns ``(samples int64 ndarray, n_channels,
    sample_rate, bit_depth)``; compressed AIFF-C and non-16-bit files
    raise loudly."""
    import struct

    import numpy as np

    b = bytes(content)
    if len(b) < 12 or b[:4] != b"FORM" or b[8:12] != b"AIFF":
        raise ValueError(f"{label}: not an IFF FORM/AIFF file")
    (form_len,) = struct.unpack(">I", b[4:8])
    if form_len + 8 > len(b):
        raise ValueError(f"{label}: truncated FORM payload")
    i = 12
    comm = None
    ssnd = None
    while i + 8 <= len(b):
        cid = b[i : i + 4]
        (clen,) = struct.unpack(">I", b[i + 4 : i + 8])
        body = b[i + 8 : i + 8 + clen]
        if len(body) != clen:
            raise ValueError(f"{label}: truncated chunk {cid!r}")
        if cid == b"COMM":
            comm = body
        elif cid == b"SSND":
            ssnd = body
        i += 8 + clen + (clen & 1)  # IFF chunks are word-aligned
    if comm is None or ssnd is None:
        raise ValueError(f"{label}: missing COMM or SSND chunk")
    nch, nframes, bits = struct.unpack(">hIh", comm[:8])
    rate = _ieee754_extended_decode(comm[8:18])
    if bits != 16:
        raise ValueError(
            f"{label}: unsupported AIFF sample size {bits} (16-bit only)"
        )
    offset, _blocksize = struct.unpack(">II", ssnd[:8])
    data = ssnd[8 + offset : 8 + offset + nframes * nch * 2]
    if len(data) != nframes * nch * 2:
        raise ValueError(f"{label}: SSND shorter than COMM numSampleFrames")
    samples = np.frombuffer(data, dtype=">i2").astype(np.int64)
    return samples, int(nch), int(rate), int(bits)


def encode_aiff_assets(
    df: DataFrame,
    id_col: str = "doc_id",
    samples_col: str = "n_samples",
    rate_col: str = "sample_rate",
    channels_col: str = "channels",
) -> DataFrame:
    """Arrow-batched AIFF encode: (id, n_samples, rate, channels) →
    (id, content binary)."""
    spark = df.sparkSession
    _ship_package(spark)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pipes_spark.operators.multimodal import aiff_encode_pcm16

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "asset_id": pdf[id_col].astype("int64"),
                    "content": [
                        aiff_encode_pcm16(int(i), int(n), int(r), int(c))
                        for i, n, r, c in zip(
                            pdf[id_col], pdf[samples_col], pdf[rate_col],
                            pdf[channels_col],
                        )
                    ],
                }
            )

    return df.select(id_col, samples_col, rate_col, channels_col).mapInPandas(
        gen, "asset_id bigint, content binary"
    )


def aiff_decode_stats(assets: DataFrame) -> DataFrame:
    """REAL AIFF decode over Arrow batches with the same checksum row as
    :func:`wav_decode_stats` (format 'aiff') — a hash-match proves the
    big-endian stream, COMM dims, and the 80-bit rate all decoded."""
    spark = assets.sparkSession
    _ship_package(spark)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from pipes_spark.operators.multimodal import aiff_decode_pcm

        for pdf in batches:
            out = {
                "asset_id": [], "format": [], "n_channels": [],
                "sample_rate": [], "bit_depth": [], "n_samples": [],
                "sample_sum": [], "sample_abs_max": [],
            }
            for aid, content in zip(pdf["asset_id"], pdf["content"]):
                samples, nch, rate, bits = aiff_decode_pcm(
                    content, label=f"asset {aid}"
                )
                out["asset_id"].append(int(aid))
                out["format"].append("aiff")
                out["n_channels"].append(int(nch))
                out["sample_rate"].append(int(rate))
                out["bit_depth"].append(int(bits))
                out["n_samples"].append(int(samples.size // nch))
                out["sample_sum"].append(int(samples.sum()))
                out["sample_abs_max"].append(int(np.abs(samples).max(initial=0)))
            yield pd.DataFrame(out)

    return assets.mapInPandas(
        gen,
        "asset_id bigint, format string, n_channels int, sample_rate int, "
        "bit_depth int, n_samples bigint, sample_sum bigint, "
        "sample_abs_max bigint",
    )


# IMA/DVI ADPCM (round 11) — tables and recurrence from the public IMA
# "Recommended Practices for Enhancing Digital Audio Compatibility"
# algorithm (the same tables every public implementation ships).
_IMA_STEP_TABLE = (
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
)
_IMA_INDEX_TABLE = (-1, -1, -1, -1, 2, 4, 6, 8)

# Microsoft ADPCM (round 11) — adaptation table (indexed by the UNSIGNED
# nibble) and the seven standard coefficient pairs, from the public
# WAVEFORMAT_MSADPCM documentation.
_MS_ADAPT_TABLE = (
    230, 230, 230, 230, 307, 409, 512, 614,
    768, 614, 512, 409, 307, 230, 230, 230,
)
_MS_COEF_PAIRS = (
    (256, 0), (512, -256), (0, 0), (192, 64),
    (240, 0), (460, -208), (392, -232),
)


def adpcm_ima_decode_mono(
    data: bytes, block_align: int, samples_per_block: int, n_samples: int,
    label: str = "asset",
):
    """Decode mono IMA ADPCM block data to linear int16-domain samples:
    each ``block_align``-byte block carries a 4-byte header (int16
    predictor = output sample 0 of the block, uint8 step index, reserved)
    followed by 4-bit codes, LOW nibble first. Blocks are decoded in full
    and the stream truncated to ``n_samples`` (the fact-chunk contract —
    the final block's pad nibbles never survive)."""
    import struct

    import numpy as np

    nblocks = (n_samples + samples_per_block - 1) // samples_per_block
    if nblocks * block_align > len(data):
        raise ValueError(f"{label}: ADPCM data shorter than block layout")
    out = []
    for b in range(nblocks):
        blk = data[b * block_align : (b + 1) * block_align]
        pred, idx = struct.unpack("<hB", blk[:3])
        if idx > 88:
            raise ValueError(f"{label}: ADPCM step index {idx} out of range")
        out.append(pred)
        for byte in blk[4:]:
            for nib in (byte & 0x0F, byte >> 4):
                step = _IMA_STEP_TABLE[idx]
                diff = step >> 3
                if nib & 4:
                    diff += step
                if nib & 2:
                    diff += step >> 1
                if nib & 1:
                    diff += step >> 2
                pred = pred - diff if nib & 8 else pred + diff
                pred = max(-32768, min(32767, pred))
                idx = max(0, min(88, idx + _IMA_INDEX_TABLE[nib & 7]))
                out.append(pred)
    return np.asarray(out[:n_samples], dtype=np.int64)


def adpcm_ima_encode_mono(samples, block_align: int = 36):
    """TRUE mono IMA ADPCM encoder (the quantize-against-step loop from
    the public IMA practice): per block, header = (first sample, carried
    step index), then each following sample quantized to the nibble whose
    reconstruction tracks the decoder state exactly. Returns the packed
    block bytes; ``adpcm_ima_decode_mono`` of the result reproduces the
    encoder's internal predictions bit-for-bit (pytest holds SNR against
    the input signal)."""
    import struct

    samples = [int(s) for s in samples]
    spb = (block_align - 4) * 2 + 1
    idx = 0
    out = bytearray()
    for start in range(0, len(samples), spb):
        blk_samples = samples[start : start + spb]
        pred = max(-32768, min(32767, blk_samples[0]))
        out += struct.pack("<hBB", pred, idx, 0)
        nibbles = []
        for s in blk_samples[1:]:
            step = _IMA_STEP_TABLE[idx]
            delta = s - pred
            nib = 8 if delta < 0 else 0
            delta = abs(delta)
            diff = step >> 3
            if delta >= step:
                nib |= 4
                delta -= step
                diff += step
            if delta >= step >> 1:
                nib |= 2
                delta -= step >> 1
                diff += step >> 1
            if delta >= step >> 2:
                nib |= 1
                diff += step >> 2
            pred = pred - diff if nib & 8 else pred + diff
            pred = max(-32768, min(32767, pred))
            idx = max(0, min(88, idx + _IMA_INDEX_TABLE[nib & 7]))
            nibbles.append(nib)
        nibbles += [0] * ((spb - 1) - len(nibbles))
        for lo, hi in zip(nibbles[0::2], nibbles[1::2]):
            out.append(lo | (hi << 4))
    return bytes(out)


def adpcm_ms_decode_mono(
    data: bytes, block_align: int, samples_per_block: int, n_samples: int,
    label: str = "asset",
):
    """Decode mono Microsoft ADPCM block data: each block's 7-byte header
    carries (uint8 coefficient-pair index, int16 initial delta, int16
    sample1, int16 sample2); output starts with sample2 THEN sample1 (the
    spec's ordering — sample1 is the more recent), followed by signed
    4-bit codes HIGH nibble first, each predicting
    ``(s1·c1 + s2·c2) >> 8 + code·delta`` with the adaptive delta
    ``max(16, (adapt[code]·delta) >> 8)``. Truncated to ``n_samples``."""
    import struct

    import numpy as np

    nblocks = (n_samples + samples_per_block - 1) // samples_per_block
    if nblocks * block_align > len(data):
        raise ValueError(f"{label}: ADPCM data shorter than block layout")
    out = []
    for b in range(nblocks):
        blk = data[b * block_align : (b + 1) * block_align]
        cidx, delta, s1, s2 = struct.unpack("<Bhhh", blk[:7])
        if cidx >= len(_MS_COEF_PAIRS):
            raise ValueError(
                f"{label}: MS ADPCM predictor index {cidx} out of range"
            )
        c1, c2 = _MS_COEF_PAIRS[cidx]
        out.append(s2)
        out.append(s1)
        for byte in blk[7:]:
            for nib in (byte >> 4, byte & 0x0F):
                signed = nib - 16 if nib >= 8 else nib
                pred = (s1 * c1 + s2 * c2) >> 8
                new = max(-32768, min(32767, pred + signed * delta))
                delta = max(16, (_MS_ADAPT_TABLE[nib] * delta) >> 8)
                s2, s1 = s1, new
                out.append(new)
    return np.asarray(out[:n_samples], dtype=np.int64)


def wav_encode_adpcm(
    asset_id: int,
    n_samples: int,
    sample_rate: int = 8000,
    codec: str = "ima",
) -> bytes:
    """Minimal REAL ADPCM WAV (RIFF 'WAVE', fmt tag 17 = IMA / 2 = MS,
    4-bit mono, extended fmt with wSamplesPerBlock, spec-mandated fact
    chunk): block ``b``'s header state and its 4-bit code stream are
    deterministic lattices (code j = (asset_id·3 + b·5 + j·7) % 16 —
    7 is coprime to 16, so every code value appears), so the decode
    oracle replays the EXACT adaptive recurrence closed-form as a
    recursive SQL walk. Final block zero-padded to nBlockAlign; the fact
    chunk carries the true length."""
    import struct

    if codec == "ima":
        align = 36
        spb = (align - 4) * 2 + 1  # 65
        tag = 17
    elif codec == "ms":
        align = 39
        spb = (align - 7) * 2 + 2  # 66
        tag = 2
    else:
        raise ValueError(f"codec must be 'ima' or 'ms', got {codec!r}")
    nblocks = (n_samples + spb - 1) // spb
    data = bytearray()
    for b in range(nblocks):
        r = min(spb, n_samples - b * spb)
        if codec == "ima":
            pred = (asset_id * 2557 + b * 97) % 65536 - 32768
            idx = (asset_id + b * 11) % 89
            data += struct.pack("<hBB", pred, idx, 0)
            n_nib = spb - 1
        else:
            cidx = (asset_id + b) % 7
            delta = 16 + (asset_id * 31 + b * 17) % 4000
            s1 = (asset_id * 2557 + b * 97) % 65536 - 32768
            s2 = (asset_id * 1901 + b * 53) % 65536 - 32768
            data += struct.pack("<Bhhh", cidx, delta, s1, s2)
            n_nib = spb - 2
        nibbles = [
            (asset_id * 3 + b * 5 + j * 7) % 16 for j in range(max(0, r - (spb - n_nib)))
        ]
        nibbles += [0] * (n_nib - len(nibbles))
        if codec == "ima":
            for lo, hi in zip(nibbles[0::2], nibbles[1::2]):
                data.append(lo | (hi << 4))
        else:
            for hi, lo in zip(nibbles[0::2], nibbles[1::2]):
                data.append((hi << 4) | lo)
    byte_rate = (sample_rate * align + spb - 1) // spb
    fmt = struct.pack(
        "<HHIIHHHH", tag, 1, sample_rate, byte_rate, align, 4, 2, spb
    )
    fact = struct.pack("<I", n_samples)
    out = bytearray(b"RIFF")
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"fact" + struct.pack("<I", len(fact)) + fact
    body += b"data" + struct.pack("<I", len(data)) + bytes(data)
    if len(data) % 2:
        body += b"\x00"
    out += struct.pack("<I", len(body)) + body
    return bytes(out)


def wav_encode_pcm_depth(
    asset_id: int, n_samples: int, sample_rate: int = 16000, bits: int = 16
) -> bytes:
    """Minimal REAL WAV at any linear PCM depth the decoder reads
    (round 11): 8-bit UNSIGNED (code i = ((id+i)·2557) % 256), 16-bit
    signed (the standard lattice), 24-bit signed (a step-7654321
    lattice over the full 2^24 range), or fmt tag 3 IEEE float32
    (k/32768 with k the 16-bit lattice — exactly representable, so
    decode-and-rescale is bit-exact)."""
    import struct

    import numpy as np

    idx = np.arange(n_samples, dtype=np.int64)
    if bits == 8:
        data = (((asset_id + idx) * 2557) % 256).astype(np.uint8).tobytes()
        tag, block = 1, 1
    elif bits == 16:
        data = (
            (((asset_id + idx) * 2557) % 65536 - 32768).astype("<i2").tobytes()
        )
        tag, block = 1, 2
    elif bits == 24:
        v = ((asset_id + idx) * 7654321) % (1 << 24)
        raw = np.zeros((n_samples, 3), dtype=np.uint8)
        raw[:, 0] = v & 0xFF
        raw[:, 1] = (v >> 8) & 0xFF
        raw[:, 2] = (v >> 16) & 0xFF
        data = raw.tobytes()
        tag, block = 1, 3
    elif bits == 32:
        k = ((asset_id + idx) * 2557) % 65536 - 32768
        data = (k.astype(np.float64) / 32768.0).astype("<f4").tobytes()
        tag, block = 3, 4
    else:
        raise ValueError(f"bits must be 8/16/24/32, got {bits}")
    fmt = struct.pack(
        "<HHIIHH", tag, 1, sample_rate, sample_rate * block, block, bits
    )
    out = bytearray(b"RIFF")
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    if len(data) % 2:
        body += b"\x00"
    out += struct.pack("<I", len(body)) + body
    return bytes(out)


def encode_wav_depth_assets(
    df: DataFrame,
    id_col: str = "doc_id",
    samples_col: str = "n_samples",
    rate_col: str = "sample_rate",
    bits_col: str = "bits",
) -> DataFrame:
    """Arrow-batched multi-depth WAV encode: (id, n_samples, rate,
    bits 8|16|24|32) → (id, content binary)."""
    spark = df.sparkSession
    _ship_package(spark)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pipes_spark.operators.multimodal import wav_encode_pcm_depth

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "asset_id": pdf[id_col].astype("int64"),
                    "content": [
                        wav_encode_pcm_depth(int(i), int(n), int(r), int(b))
                        for i, n, r, b in zip(
                            pdf[id_col], pdf[samples_col], pdf[rate_col],
                            pdf[bits_col],
                        )
                    ],
                }
            )

    return df.select(id_col, samples_col, rate_col, bits_col).mapInPandas(
        gen, "asset_id bigint, content binary"
    )


def encode_wav_adpcm_assets(
    df: DataFrame,
    id_col: str = "doc_id",
    samples_col: str = "n_samples",
    rate_col: str = "sample_rate",
    codec_col: str = "codec",
) -> DataFrame:
    """Arrow-batched ADPCM WAV encode: (id, n_samples, rate, codec
    'ima'|'ms') → (id, content binary)."""
    spark = df.sparkSession
    _ship_package(spark)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pipes_spark.operators.multimodal import wav_encode_adpcm

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "asset_id": pdf[id_col].astype("int64"),
                    "content": [
                        wav_encode_adpcm(int(i), int(n), int(r), str(c))
                        for i, n, r, c in zip(
                            pdf[id_col], pdf[samples_col], pdf[rate_col],
                            pdf[codec_col],
                        )
                    ],
                }
            )

    return df.select(id_col, samples_col, rate_col, codec_col).mapInPandas(
        gen, "asset_id bigint, content binary"
    )


def wav_decode_stats(assets: DataFrame) -> DataFrame:
    """REAL WAV decode over Arrow batches (parse: :func:`wav_decode_pcm`)
    with a sample checksum — (asset_id, format, n_channels, sample_rate,
    bit_depth, n_samples, sample_sum, sample_abs_max). sample_sum/abs_max
    can only come from decoding the int16 stream, so a hash-match against
    the closed-form oracle certifies the decoder (catalog
    ``multimodal_wav_roundtrip``)."""
    spark = assets.sparkSession
    _ship_package(spark)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from pipes_spark.operators.multimodal import wav_decode_pcm

        for pdf in batches:
            out = {
                "asset_id": [],
                "format": [],
                "n_channels": [],
                "sample_rate": [],
                "bit_depth": [],
                "n_samples": [],
                "sample_sum": [],
                "sample_abs_max": [],
            }
            for aid, content in zip(pdf["asset_id"], pdf["content"]):
                samples, nch, rate, bits = wav_decode_pcm(
                    content, label=f"asset {aid}"
                )
                out["asset_id"].append(int(aid))
                out["format"].append("wav")
                out["n_channels"].append(int(nch))
                out["sample_rate"].append(int(rate))
                out["bit_depth"].append(int(bits))
                out["n_samples"].append(int(samples.size // nch))
                out["sample_sum"].append(int(samples.sum()))
                out["sample_abs_max"].append(int(np.abs(samples).max(initial=0)))
            yield pd.DataFrame(out)

    return assets.mapInPandas(
        gen,
        "asset_id bigint, format string, n_channels int, sample_rate int, "
        "bit_depth int, n_samples bigint, sample_sum bigint, "
        "sample_abs_max bigint",
    )


def encode_wav_assets(
    df: DataFrame,
    id_col: str = "doc_id",
    samples_col: str = "n_samples",
    rate_col: str = "sample_rate",
    channels_col: str | None = None,
) -> DataFrame:
    """Arrow-batched REAL WAV PCM16 encode: (id, n_samples, rate
    [, channels]) → (id, content binary) — the audio member of the
    encode_*_assets family (same 100 TB shape: embarrassingly parallel,
    samples never cross a shuffle)."""
    spark = df.sparkSession
    _ship_package(spark)
    cols = [id_col, samples_col, rate_col]
    if channels_col is not None:
        cols.append(channels_col)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pipes_spark.operators.multimodal import wav_encode_pcm16

        for pdf in batches:
            ch = (
                pdf[channels_col]
                if channels_col is not None
                else [1] * len(pdf)
            )
            yield pd.DataFrame(
                {
                    "asset_id": pdf[id_col].astype("int64"),
                    "content": [
                        wav_encode_pcm16(int(i), int(n), int(r), int(c))
                        for i, n, r, c in zip(
                            pdf[id_col], pdf[samples_col], pdf[rate_col], ch
                        )
                    ],
                }
            )

    return df.select(*cols).mapInPandas(
        gen, "asset_id bigint, content binary"
    )


# --------------------------------------------------------------------------
# AVI/MJPEG: REAL video container from the public RIFF/AVI specification
# (Microsoft 'AVI ' form: hdrl/avih/strl/strh/strf headers, movi chunk
# stream, idx1 index), with Motion-JPEG frames — each '00dc' chunk is a
# complete baseline JPEG decoded by this module's own T.81 decoder. This
# makes FRAME SAMPLING real: parse the container, pick every k-th frame,
# decode actual pixels — the operation frame_sample stubbed byte-wise.
# --------------------------------------------------------------------------


def avi_mjpeg_encode(asset_id: int, width: int, height: int, n_frames: int) -> bytes:
    """Minimal REAL AVI (RIFF 'AVI ': LIST hdrl with avih + one 'vids'
    strl (handler MJPG, strf BITMAPINFOHEADER), LIST movi of '00dc'
    JPEG frames, idx1 index): frame f's 8×8 block i is uniformly
    (asset_id + 11·f + i) % 256 — block-constant content, so each frame
    round-trips bit-exactly through the lossy codec (the
    multimodal_jpeg_roundtrip contract) and the frame-sample oracle
    recomputes per-frame pixel sums closed-form."""
    import struct

    frames = []
    for f in range(n_frames):
        px = jpeg_block_gray(asset_id + 11 * f, width, height)
        frames.append(jpeg_encode_gray(px))

    def chunk(cid: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) % 2 else b""
        return cid + struct.pack("<I", len(body)) + body + pad

    def lst(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    max_bytes = max(len(fr) for fr in frames)
    avih = struct.pack(
        "<IIIIIIIIII4I",
        100_000,  # microseconds per frame (10 fps)
        max_bytes * 10,
        0,
        0x10,  # AVIF_HASINDEX
        n_frames,
        0,
        1,  # one stream
        max_bytes,
        width,
        height,
        0, 0, 0, 0,
    )
    # AVISTREAMHEADER (56 bytes): fccType, fccHandler, flags, priority,
    # language, initialFrames, scale, rate, start, length,
    # suggestedBuffer, quality, sampleSize, rcFrame(4×16-bit)
    strh = (
        b"vids" + b"MJPG"
        + struct.pack(
            "<IHH8I", 0, 0, 0, 0, 1, 10, 0, n_frames, max_bytes, 0, 0
        )
        + struct.pack("<4H", 0, 0, width, height)
    )
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, width, height, 1, 24, b"MJPG",
        width * height * 3, 0, 0, 0, 0,
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi_body = b"movi"
    offsets = []
    for fr in frames:
        offsets.append(len(movi_body))  # offset of ckid relative to 'movi'
        movi_body += chunk(b"00dc", fr)
    movi = chunk(b"LIST", movi_body)
    idx = b""
    for off, fr in zip(offsets, frames):
        idx += b"00dc" + struct.pack("<III", 0x10, off, len(fr))
    riff_body = b"AVI " + hdrl + movi + chunk(b"idx1", idx)
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def avi_dib_encode(asset_id: int, width: int, height: int, n_frames: int) -> bytes:
    """Minimal REAL uncompressed-video AVI (round 11 — the '00db' raw
    path next to avi_mjpeg_encode's '00dc' codec path; narrows the
    'non-MJPEG video' stub to inter-frame codecs): handler 'DIB ' with
    an 8-bit palettized BITMAPINFOHEADER (biCompression 0 = BI_RGB,
    256-entry grayscale RGBQUAD palette) and the DIB spec's BOTTOM-UP
    row order with 4-byte row stride padding. Frame f's pixel
    (y, x) = (asset_id + 11·f + y·width + x) % 256 — raw frames are
    lossless, so the lattice is per-PIXEL (no block-constant contract
    needed) and the oracle recomputes frame pixel sums closed-form."""
    import struct

    import numpy as np

    stride = (width + 3) // 4 * 4
    frames = []
    for f in range(n_frames):
        i = np.arange(height * width, dtype=np.int64)
        px = ((asset_id + 11 * f + i) % 256).astype(np.uint8).reshape(
            height, width
        )
        rows = np.zeros((height, stride), dtype=np.uint8)
        rows[:, :width] = px
        frames.append(rows[::-1].tobytes())  # bottom-up per the DIB spec

    def chunk(cid: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) % 2 else b""
        return cid + struct.pack("<I", len(body)) + body + pad

    def lst(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    max_bytes = max(len(fr) for fr in frames)
    avih = struct.pack(
        "<IIIIIIIIII4I",
        100_000, max_bytes * 10, 0, 0x10, n_frames, 0, 1, max_bytes,
        width, height, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"DIB "
        + struct.pack("<IHH8I", 0, 0, 0, 0, 1, 10, 0, n_frames, max_bytes, 0, 0)
        + struct.pack("<4H", 0, 0, width, height)
    )
    strf = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 8, 0,
        stride * height, 0, 0, 256, 0,
    ) + bytes(v for j in range(256) for v in (j, j, j, 0))  # B,G,R,reserved
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih)
        + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi_body = b"movi"
    offsets = []
    for fr in frames:
        offsets.append(len(movi_body))
        movi_body += chunk(b"00db", fr)
    movi = chunk(b"LIST", movi_body)
    idx = b""
    for off, fr in zip(offsets, frames):
        idx += b"00db" + struct.pack("<III", 0x10, off, len(fr))
    riff_body = b"AVI " + hdrl + movi + chunk(b"idx1", idx)
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def rle8_encode_frame(px) -> bytes:
    """Encode ONE frame as Microsoft BI_RLE8 (the public Windows
    bitmap-compression spec): rows bottom-up; runs ≥ 2 as encoded mode
    (count, value), literal stretches ≥ 3 as absolute mode (escape 00,
    count 3..255, pixels, word-aligned), shorter literals as count-1
    encoded pairs; every row closed with EOL (00 00), the bitmap with
    EOS (00 01). General-purpose: accepts any uint8 matrix (top-down
    row-major input, flipped here per the DIB convention)."""
    import numpy as np

    px = np.asarray(px, dtype=np.uint8)
    h, w = px.shape
    out = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up
        row = px[y]
        # run-length partition of the row
        runs = []  # (value, length)
        x = 0
        while x < w:
            v = row[x]
            n = 1
            while x + n < w and row[x + n] == v:
                n += 1
            runs.append((int(v), n))
            x += n
        i = 0
        while i < len(runs):
            v, n = runs[i]
            if n >= 2:
                while n > 0:
                    c = min(n, 255)
                    out += bytes((c, v))
                    n -= c
                i += 1
                continue
            # collect a literal stretch of consecutive length-1 runs
            lit = [v]
            j = i + 1
            while j < len(runs) and runs[j][1] == 1:
                lit.append(runs[j][0])
                j += 1
            if len(lit) >= 3:
                k = 0
                while len(lit) - k >= 3:
                    c = min(len(lit) - k, 255)
                    if c < 3:
                        break
                    out += bytes((0, c)) + bytes(lit[k : k + c])
                    if c % 2:
                        out.append(0)  # absolute runs are word-aligned
                    k += c
                for vv in lit[k:]:
                    out += bytes((1, vv))
            else:
                for vv in lit:
                    out += bytes((1, vv))
            i = j
        out += b"\x00\x00"  # EOL
    out += b"\x00\x01"  # end of bitmap
    return bytes(out)


def rle8_decode_frame(data: bytes, width: int, height: int, label: str = "frame"):
    """Decode Microsoft BI_RLE8 to a TOP-DOWN index matrix: encoded mode
    (count, value), escapes 00 00 = EOL, 00 01 = end of bitmap,
    00 02 dx dy = delta (right/up skip, skipped pixels stay 0 — the
    spec's undefined-pixels-as-background convention), 00 n≥3 =
    absolute mode with word alignment. Out-of-bounds writes raise."""
    import numpy as np

    img = np.zeros((height, width), dtype=np.uint8)  # bottom-up rows
    x = y = 0
    i = 0
    n = len(data)
    done = False
    while i + 1 < n and not done:
        c, v = data[i], data[i + 1]
        i += 2
        if c > 0:
            if y >= height or x + c > width:
                raise ValueError(f"{label}: RLE8 run beyond bitmap bounds")
            img[y, x : x + c] = v
            x += c
        elif v == 0:  # EOL
            x, y = 0, y + 1
        elif v == 1:  # end of bitmap
            done = True
        elif v == 2:  # delta
            if i + 2 > n:
                raise ValueError(f"{label}: truncated RLE8 delta")
            x += data[i]
            y += data[i + 1]
            i += 2
            if x > width or y > height:
                raise ValueError(f"{label}: RLE8 delta beyond bounds")
        else:  # absolute mode
            if i + v > n:
                raise ValueError(f"{label}: truncated RLE8 absolute run")
            if y >= height or x + v > width:
                raise ValueError(f"{label}: RLE8 absolute beyond bounds")
            img[y, x : x + v] = np.frombuffer(
                data[i : i + v], dtype=np.uint8
            )
            x += v
            i += v + (v & 1)  # word alignment
    if not done:
        raise ValueError(f"{label}: RLE8 stream missing end-of-bitmap")
    return img[::-1]  # return top-down


def rle8_frame_lattice(asset_id: int, f: int, width: int, height: int):
    """The deterministic frame content for the RLE8 video gate, in
    TOP-DOWN coordinates: every 4th row is a step-13 literal lattice
    (forcing ABSOLUTE mode), other rows are runs of 4 (forcing encoded
    mode) — so the graded stream exercises both modes plus EOL/EOS on
    every frame, and the oracle recomputes sums closed-form."""
    import numpy as np

    x = np.arange(width, dtype=np.int64)[None, :]
    y = np.arange(height, dtype=np.int64)[:, None]
    lit = (asset_id + 11 * f + x * 13) % 256
    run = (asset_id + 11 * f + y * 7 + (x // 4) * 31) % 256
    return np.where(y % 4 == 0, lit, run).astype(np.uint8)


def avi_rle8_encode(asset_id: int, width: int, height: int, n_frames: int) -> bytes:
    """Minimal REAL RLE-compressed AVI (round 11 — the third video path:
    '00dc' chunks holding BI_RLE8 streams, handler 'MRLE',
    biCompression 1 per the public VfW convention): frame content from
    :func:`rle8_frame_lattice`, compressed by :func:`rle8_encode_frame`.
    Narrows the remaining video stub to INTER-frame codecs — this is
    real intra-frame compression with a real entropy-free decode."""
    import struct

    frames = [
        rle8_encode_frame(rle8_frame_lattice(asset_id, f, width, height))
        for f in range(n_frames)
    ]

    def chunk(cid: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) % 2 else b""
        return cid + struct.pack("<I", len(body)) + body + pad

    def lst(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    max_bytes = max(len(fr) for fr in frames)
    avih = struct.pack(
        "<IIIIIIIIII4I",
        100_000, max_bytes * 10, 0, 0x10, n_frames, 0, 1, max_bytes,
        width, height, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"MRLE"
        + struct.pack("<IHH8I", 0, 0, 0, 0, 1, 10, 0, n_frames, max_bytes, 0, 0)
        + struct.pack("<4H", 0, 0, width, height)
    )
    strf = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 8, 1,  # biCompression 1 = BI_RLE8
        width * height, 0, 0, 256, 0,
    ) + bytes(v for j in range(256) for v in (j, j, j, 0))
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih)
        + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi_body = b"movi"
    offsets = []
    for fr in frames:
        offsets.append(len(movi_body))
        movi_body += chunk(b"00dc", fr)
    movi = chunk(b"LIST", movi_body)
    idx = b""
    for off, fr in zip(offsets, frames):
        idx += b"00dc" + struct.pack("<III", 0x10, off, len(fr))
    riff_body = b"AVI " + hdrl + movi + chunk(b"idx1", idx)
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def encode_avi_rle8_assets(
    df: DataFrame,
    id_col: str = "doc_id",
    width_col: str = "width",
    height_col: str = "height",
    frames_col: str = "n_frames",
) -> DataFrame:
    """Arrow-batched RLE8-AVI encode: (id, width, height, n_frames) →
    (id, content binary)."""
    spark = df.sparkSession
    _ship_package(spark)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pipes_spark.operators.multimodal import avi_rle8_encode

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "asset_id": pdf[id_col].astype("int64"),
                    "content": [
                        avi_rle8_encode(int(i), int(w), int(h), int(nf))
                        for i, w, h, nf in zip(
                            pdf[id_col], pdf[width_col], pdf[height_col],
                            pdf[frames_col],
                        )
                    ],
                }
            )

    return df.select(id_col, width_col, height_col, frames_col).mapInPandas(
        gen, "asset_id bigint, content binary"
    )


def avi_frame_sample_stats(assets: DataFrame, every_k: int = 2) -> DataFrame:
    """REAL video frame sampling over Arrow batches: RIFF/AVI walk (hdrl
    parse for declared frame count and handler, movi chunk iteration
    with word alignment, idx1 cross-check against actual chunk offsets),
    then DECODE every ``every_k``-th frame — Motion-JPEG '00dc' chunks
    through the module's T.81 decoder, or (round 11) uncompressed
    'DIB ' '00db' chunks through the BITMAPINFOHEADER / bottom-up /
    stride-padded / palettized raw path — one output row per sampled
    frame: (asset_id, frame_no, width, height, pixel_sum). The per-frame
    pixel sums can only come from inflating real frames, so a
    hash-match against the closed-form oracle certifies container walk +
    index + codec together (catalog ``multimodal_video_frame_sample``,
    ``multimodal_video_dib_frame_sample``). Other handlers (inter-frame
    codecs) and index mismatches raise loudly."""
    spark = assets.sparkSession
    _ship_package(spark)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        import numpy as np

        from pipes_spark.operators.multimodal import (
            jpeg_decode_gray,
            rle8_decode_frame,
        )

        for pdf in batches:
            out = {
                "asset_id": [],
                "frame_no": [],
                "width": [],
                "height": [],
                "pixel_sum": [],
            }
            for aid, content in zip(pdf["asset_id"], pdf["content"]):
                b = bytes(content)
                if b[:4] != b"RIFF" or b[8:12] != b"AVI ":
                    raise ValueError(f"asset {aid}: not a RIFF/AVI file")
                i = 12
                handler = None
                declared_frames = None
                movi_start = None
                frames = []  # (offset_rel_movi, chunk_type, frame_bytes)
                idx_entries = None
                strf_body = None
                while i + 8 <= len(b):
                    cid = b[i : i + 4]
                    (clen,) = struct.unpack("<I", b[i + 4 : i + 8])
                    body = b[i + 8 : i + 8 + clen]
                    if cid == b"LIST":
                        kind = body[:4]
                        if kind == b"hdrl":
                            # walk sub-chunks for avih and strh
                            j = 4
                            while j + 8 <= len(body):
                                scid = body[j : j + 4]
                                (slen,) = struct.unpack("<I", body[j + 4 : j + 8])
                                sbody = body[j + 8 : j + 8 + slen]
                                if scid == b"avih":
                                    declared_frames = struct.unpack(
                                        "<I", sbody[16:20]
                                    )[0]
                                elif scid == b"LIST" and sbody[:4] == b"strl":
                                    k = 4
                                    while k + 8 <= len(sbody):
                                        tcid = sbody[k : k + 4]
                                        (tlen,) = struct.unpack(
                                            "<I", sbody[k + 4 : k + 8]
                                        )
                                        if tcid == b"strh":
                                            tb = sbody[k + 8 : k + 8 + tlen]
                                            if tb[:4] == b"vids":
                                                handler = tb[4:8]
                                        elif tcid == b"strf":
                                            strf_body = sbody[k + 8 : k + 8 + tlen]
                                        k += 8 + tlen + (tlen & 1)
                                j += 8 + slen + (slen & 1)
                        elif kind == b"movi":
                            movi_start = i + 8
                            j = 4
                            while j + 8 <= len(body):
                                scid = body[j : j + 4]
                                (slen,) = struct.unpack("<I", body[j + 4 : j + 8])
                                if scid[2:4] in (b"dc", b"db"):
                                    frames.append(
                                        (j, scid[2:4], body[j + 8 : j + 8 + slen])
                                    )
                                j += 8 + slen + (slen & 1)
                    elif cid == b"idx1":
                        idx_entries = [
                            (body[k : k + 4], *struct.unpack("<III", body[k + 4 : k + 16]))
                            for k in range(0, len(body), 16)
                        ]
                    i += 8 + clen + (clen & 1)
                if handler == b"MJPG":
                    want_ct, mode = b"dc", "jpeg"
                elif handler == b"DIB ":
                    want_ct, mode = b"db", "dib"
                elif handler in (b"MRLE", b"mrle"):
                    want_ct, mode = b"dc", "rle8"
                else:
                    raise ValueError(
                        f"asset {aid}: unsupported video handler {handler!r} "
                        "(supported: MJPG, 'DIB ' uncompressed, MRLE/BI_RLE8; "
                        "inter-frame codecs need an external library)"
                    )
                if movi_start is None or not frames:
                    raise ValueError(f"asset {aid}: no movi frames")
                if declared_frames is not None and declared_frames != len(frames):
                    raise ValueError(
                        f"asset {aid}: avih declares {declared_frames} frames, "
                        f"movi holds {len(frames)}"
                    )
                if idx_entries is not None:
                    if len(idx_entries) != len(frames):
                        raise ValueError(f"asset {aid}: idx1 length mismatch")
                    for (ckid, _fl, off, size), (real_off, ct, fr) in zip(
                        idx_entries, frames
                    ):
                        if (
                            ckid[2:4] != want_ct
                            or ct != want_ct
                            or off != real_off
                            or size != len(fr)
                        ):
                            raise ValueError(f"asset {aid}: idx1 entry mismatch")
                if mode in ("dib", "rle8"):
                    if strf_body is None or len(strf_body) < 40:
                        raise ValueError(f"asset {aid}: stream missing strf")
                    (_bsz, bw_, bh_, _pl, bits, comp, _sz, _xp, _yp, used,
                     _imp) = struct.unpack("<IiiHHIIiiII", strf_body[:40])
                    want_comp = 0 if mode == "dib" else 1  # BI_RGB / BI_RLE8
                    if comp != want_comp or bits != 8:
                        raise ValueError(
                            f"asset {aid}: 8-bit with biCompression "
                            f"{want_comp} required for {mode} "
                            f"(got compression {comp}, {bits}-bit)"
                        )
                    n_pal = used or 256
                    pal = np.frombuffer(
                        strf_body[40 : 40 + 4 * n_pal], dtype=np.uint8
                    ).reshape(n_pal, 4)
                    red = pal[:, 2]  # RGBQUAD is B,G,R,reserved
                    stride = (bw_ + 3) // 4 * 4
                for fno in range(0, len(frames), every_k):
                    fr = frames[fno][2]
                    if mode == "jpeg":
                        px = jpeg_decode_gray(fr)
                    elif mode == "rle8":
                        idxs = rle8_decode_frame(
                            fr, bw_, bh_, label=f"asset {aid} frame {fno}"
                        )
                        px = red[idxs.astype(np.int64)]
                    else:
                        if len(fr) != stride * bh_:
                            raise ValueError(
                                f"asset {aid}: DIB frame {fno} size mismatch"
                            )
                        rows = np.frombuffer(fr, dtype=np.uint8).reshape(
                            bh_, stride
                        )
                        # bottom-up rows, stride padding stripped, palette
                        # red channel (grayscale-identity contract)
                        px = red[rows[::-1, :bw_].astype(np.int64)]
                    out["asset_id"].append(int(aid))
                    out["frame_no"].append(int(fno))
                    out["width"].append(int(px.shape[1]))
                    out["height"].append(int(px.shape[0]))
                    out["pixel_sum"].append(int(px.sum(dtype=np.int64)))
            yield pd.DataFrame(out)

    return assets.mapInPandas(
        gen,
        "asset_id bigint, frame_no int, width int, height int, "
        "pixel_sum bigint",
    )


def encode_avi_assets(
    df: DataFrame,
    id_col: str = "doc_id",
    width_col: str = "width",
    height_col: str = "height",
    frames_col: str = "n_frames",
) -> DataFrame:
    """Arrow-batched REAL AVI/MJPEG encode: (id, width, height,
    n_frames) → (id, content binary) — the video member of the
    encode_*_assets family."""
    spark = df.sparkSession
    _ship_package(spark)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pipes_spark.operators.multimodal import avi_mjpeg_encode

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "asset_id": pdf[id_col].astype("int64"),
                    "content": [
                        avi_mjpeg_encode(int(i), int(w), int(h), int(nf))
                        for i, w, h, nf in zip(
                            pdf[id_col],
                            pdf[width_col],
                            pdf[height_col],
                            pdf[frames_col],
                        )
                    ],
                }
            )

    return df.select(id_col, width_col, height_col, frames_col).mapInPandas(
        gen, "asset_id bigint, content binary"
    )


def encode_avi_dib_assets(
    df: DataFrame,
    id_col: str = "doc_id",
    width_col: str = "width",
    height_col: str = "height",
    frames_col: str = "n_frames",
) -> DataFrame:
    """Arrow-batched REAL uncompressed-AVI encode (round 11): (id, width,
    height, n_frames) → (id, content binary) through
    :func:`avi_dib_encode` — the raw-video sibling of
    :func:`encode_avi_assets`."""
    spark = df.sparkSession
    _ship_package(spark)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pipes_spark.operators.multimodal import avi_dib_encode

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "asset_id": pdf[id_col].astype("int64"),
                    "content": [
                        avi_dib_encode(int(i), int(w), int(h), int(nf))
                        for i, w, h, nf in zip(
                            pdf[id_col],
                            pdf[width_col],
                            pdf[height_col],
                            pdf[frames_col],
                        )
                    ],
                }
            )

    return df.select(id_col, width_col, height_col, frames_col).mapInPandas(
        gen, "asset_id bigint, content binary"
    )


def _jpeg_optimal_table(freq257):
    """T.81 Annex K.2 Huffman table generation: the spec's own
    CODE_SIZE / COUNT_BITS / ADJUST_BITS / SORT_INPUT procedure —
    entry 256 is the reserved codepoint (frequency 1) that keeps the
    all-ones code unused. Returns (BITS[16], HUFFVAL)."""
    import heapq

    freq = list(freq257)
    assert len(freq) == 257
    codesize = [0] * 257
    others = [-1] * 257
    # The spec's FIND_V1/FIND_V2 scans pick the least-frequency live
    # symbol, breaking frequency ties toward the LARGEST symbol value
    # (the ascending scan's `<=` keeps the last tied index). A min-heap
    # on (freq, -symbol) with lazy deletion pops in exactly that order
    # — the tie-break depends only on (frequency, value), never on
    # insertion order, so the merge sequence (and thus BITS/HUFFVAL and
    # the output bitstream) is identical to the quadratic scan replaced
    # here (measured encoder hot spot, guide §1.2 step 2).
    heap = [(f, -i) for i, f in enumerate(freq) if f > 0]
    heapq.heapify(heap)
    while True:
        v1 = v2 = -1
        while heap:
            f, ni = heapq.heappop(heap)
            if freq[-ni] == f:
                v1 = -ni
                break
        while heap:
            f, ni = heap[0]
            if freq[-ni] != f:
                heapq.heappop(heap)
                continue
            v2 = -ni
            break
        if v2 == -1:
            break
        heapq.heappop(heap)
        freq[v1] += freq[v2]
        freq[v2] = 0
        heapq.heappush(heap, (freq[v1], -v1))
        codesize[v1] += 1
        while others[v1] != -1:
            v1 = others[v1]
            codesize[v1] += 1
        others[v1] = v2
        codesize[v2] += 1
        while others[v2] != -1:
            v2 = others[v2]
            codesize[v2] += 1
    bits = [0] * 33
    for i in range(257):
        if codesize[i]:
            bits[codesize[i]] += 1
    # ADJUST_BITS: fold code lengths beyond 16 back under the limit
    i = 32
    while i > 16:
        if bits[i] > 0:
            j = i - 2
            while bits[j] == 0:
                j -= 1
            bits[i] -= 2
            bits[i - 1] += 1
            bits[j + 1] += 2
            bits[j] -= 1
        else:
            i -= 1
    while bits[i] == 0:
        i -= 1
    bits[i] -= 1  # drop the reserved codepoint
    huffval = [
        s
        for _, s in sorted(
            (codesize[s], s) for s in range(256) if codesize[s]
        )
    ]
    return bits[1:17], huffval


def audio_pcm_features(assets: DataFrame) -> DataFrame:
    """Audio FEATURE EXTRACTION over real decoded PCM (the multimodal
    'decode / feature-extract' step, now on the real WAV decoder rather
    than a byte stub): per asset — RMS (exact integer sum of squares,
    one double sqrt), zero-crossing count (strict sign product < 0,
    summed per channel over deinterleaved frames), peak amplitude, and
    duration. All four derive from the inflated int16 stream, so the
    hash gate (catalog ``multimodal_audio_features``) certifies decode +
    deinterleave + the feature math together. Arrow-batched mapInPandas;
    features, not samples, cross the shuffle."""
    spark = assets.sparkSession
    _ship_package(spark)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        import numpy as np

        for pdf in batches:
            out = {
                "asset_id": [],
                "n_channels": [],
                "n_samples": [],
                "duration_us": [],
                "rms": [],
                "zero_crossings": [],
                "peak": [],
            }
            for aid, content in zip(pdf["asset_id"], pdf["content"]):
                b = bytes(content)
                if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
                    raise ValueError(f"asset {aid}: not a RIFF/WAVE file")
                i = 12
                fmt = None
                data = None
                while i + 8 <= len(b):
                    cid = b[i : i + 4]
                    (clen,) = struct.unpack("<I", b[i + 4 : i + 8])
                    body = b[i + 8 : i + 8 + clen]
                    if cid == b"fmt ":
                        fmt = struct.unpack("<HHIIHH", body[:16])
                    elif cid == b"data":
                        data = body
                    i += 8 + clen + (clen & 1)
                if fmt is None or data is None:
                    raise ValueError(f"asset {aid}: missing fmt or data chunk")
                tag, nch, rate, _br, _al, bits = fmt
                if tag != 1 or bits != 16:
                    raise ValueError(f"asset {aid}: only 16-bit PCM supported")
                s = np.frombuffer(data, dtype="<i2").astype(np.int64)
                frames = s.reshape(-1, nch)
                n = frames.shape[0]
                prod = frames[:-1, :] * frames[1:, :] if n > 1 else frames[:0, :]
                out["asset_id"].append(int(aid))
                out["n_channels"].append(int(nch))
                out["n_samples"].append(int(n))
                # exact integer microseconds: no float rounding to
                # disagree across engines at half points
                out["duration_us"].append(n * 1_000_000 // rate)
                out["rms"].append(
                    round(float(np.sqrt((s * s).sum() / s.size)), 6)
                )
                out["zero_crossings"].append(int((prod < 0).sum()))
                out["peak"].append(int(np.abs(s).max(initial=0)))
            yield pd.DataFrame(out)

    return assets.mapInPandas(
        gen,
        "asset_id bigint, n_channels int, n_samples bigint, "
        "duration_us bigint, rms double, zero_crossings bigint, peak bigint",
    )


# --------------------------------------------------------------------------
# Cross-codec grayscale decode + perceptual hash over REAL pixels.
# --------------------------------------------------------------------------


#: Adam7 pass grid (PNG spec: x_start, x_step, y_start, y_step per pass)
_PNG_ADAM7 = (
    (0, 8, 0, 8), (4, 8, 0, 8), (0, 4, 4, 8), (2, 4, 0, 4),
    (0, 2, 2, 4), (1, 2, 0, 2), (0, 1, 1, 2),
)


def _png_paeth(a: int, b: int, c: int) -> int:
    """PNG filter-4 Paeth predictor (spec section 9.4)."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _png_unfilter_image(raw, w: int, h: int, label: str = "png"):
    """Undo per-scanline filtering for one (sub)image of 8-bit grayscale
    (bpp = 1): filter types 0-4 — None, Sub, Up, Average, Paeth —
    reconstructed sequentially per the spec's recon() definitions.
    ``raw`` is the h·(w+1) filtered byte stream; returns (h, w) uint8."""
    import numpy as np

    out = np.zeros((h, w), dtype=np.int64)
    pos = 0
    for y in range(h):
        ft = raw[pos]
        pos += 1
        row = raw[pos : pos + w]
        pos += w
        if ft == 0:
            out[y, :] = row
        elif ft == 1:  # Sub
            acc = 0
            for x in range(w):
                acc = (int(row[x]) + acc) & 0xFF
                out[y, x] = acc
        elif ft == 2:  # Up
            above = out[y - 1] if y else np.zeros(w, dtype=np.int64)
            out[y, :] = (row.astype(np.int64) + above) & 0xFF
        elif ft == 3:  # Average
            above = out[y - 1] if y else np.zeros(w, dtype=np.int64)
            left = 0
            for x in range(w):
                left = (int(row[x]) + (left + int(above[x])) // 2) & 0xFF
                out[y, x] = left
        elif ft == 4:  # Paeth
            above = out[y - 1] if y else np.zeros(w, dtype=np.int64)
            left = ul = 0
            for x in range(w):
                left = (
                    int(row[x]) + _png_paeth(left, int(above[x]), ul)
                ) & 0xFF
                ul = int(above[x])
                out[y, x] = left
        else:
            raise ValueError(f"{label}: unknown PNG filter type {ft}")
    return out.astype(np.uint8)


def _png_filter_row(row, above, ft: int):
    """Apply one spec filter to a reconstructed row (encode side)."""
    import numpy as np

    row = row.astype(np.int64)
    above = above.astype(np.int64)
    if ft == 0:
        return row.astype(np.uint8)
    if ft == 1:
        left = np.concatenate([[0], row[:-1]])
        return ((row - left) & 0xFF).astype(np.uint8)
    if ft == 2:
        return ((row - above) & 0xFF).astype(np.uint8)
    if ft == 3:
        left = np.concatenate([[0], row[:-1]])
        return ((row - (left + above) // 2) & 0xFF).astype(np.uint8)
    if ft == 4:
        out = []
        left = ul = 0
        for x in range(row.shape[0]):
            out.append((int(row[x]) - _png_paeth(left, int(above[x]), ul)) & 0xFF)
            left = int(row[x])
            ul = int(above[x])
        return np.asarray(out, dtype=np.uint8)
    raise ValueError(f"unknown PNG filter type {ft}")


def png_encode_filtered(
    px, filter_mode: str = "adaptive", interlaced: bool = False
) -> bytes:
    """REAL general-profile grayscale PNG encode: any of the five spec
    scanline filters (``filter_mode`` '0'..'4'), the libpng-style
    'adaptive' minimum-sum-of-absolute-differences heuristic, and
    optional ADAM7 interlacing (seven sub-images, each independently
    filtered, empty passes omitted per the spec)."""
    import struct
    import zlib as _z

    import numpy as np

    px = np.asarray(px, dtype=np.uint8)
    h, w = px.shape

    def filt_image(img):
        ih, iw = img.shape
        out = bytearray()
        above = np.zeros(iw, dtype=np.uint8)
        for y in range(ih):
            row = img[y]
            if filter_mode == "adaptive":
                best = None
                for ft in range(5):
                    cand = _png_filter_row(row, above, ft)
                    score = int(
                        np.abs(cand.astype(np.int8).astype(np.int64)).sum()
                    )
                    if best is None or score < best[0]:
                        best = (score, ft, cand)
                _, ft, data = best
            else:
                ft = int(filter_mode)
                data = _png_filter_row(row, above, ft)
            out.append(ft)
            out += data.tobytes()
            above = row
        return bytes(out)

    if interlaced:
        stream = bytearray()
        for x0, xs, y0, ys in _PNG_ADAM7:
            sub = px[y0::ys, x0::xs]
            if sub.size == 0:
                continue
            stream += filt_image(sub)
        stream = bytes(stream)
    else:
        stream = filt_image(px)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 1 if interlaced else 0)
    out = bytearray(_PNG_SIG)
    out += _png_chunk(b"IHDR", ihdr)
    out += _png_chunk(b"IDAT", _z.compress(stream, 6))
    out += _png_chunk(b"IEND", b"")
    return bytes(out)


def png_decode_gray(content: bytes):
    """Decode an 8-bit grayscale PNG to its (h, w) uint8 array — since
    round 11 the GENERAL profile: all five scanline filters (None, Sub,
    Up, Average, Paeth) and ADAM7 interlacing (seven independently
    filtered sub-images merged on the pass grid), not just the
    engine's own filter-0 write profile."""
    import struct
    import zlib as _z

    import numpy as np

    fmt, w, h, depth, ctype = sniff_image_header(content)
    if fmt != "png":
        raise ValueError("not a PNG")
    if depth != 8 or ctype != 0:
        raise ValueError(
            f"unsupported PNG shape (depth {depth}, color type {ctype}; "
            "8-bit grayscale only)"
        )
    interlace = content[28]
    idat, i = b"", 8
    while i + 8 <= len(content):
        (ln,) = struct.unpack(">I", content[i : i + 4])
        typ = content[i + 4 : i + 8]
        if typ == b"IDAT":
            idat += content[i + 8 : i + 8 + ln]
        i += 12 + ln
        if typ == b"IEND":
            break
    raw = np.frombuffer(_z.decompress(idat), dtype=np.uint8)
    if interlace == 0:
        if raw.size != h * (w + 1):
            raise ValueError("PNG stream size mismatch")
        return _png_unfilter_image(raw, w, h)
    if interlace != 1:
        raise ValueError(f"unknown PNG interlace method {interlace}")
    out = np.zeros((h, w), dtype=np.uint8)
    pos = 0
    for x0, xs, y0, ys in _PNG_ADAM7:
        sw = (w - x0 + xs - 1) // xs
        sh = (h - y0 + ys - 1) // ys
        if sw == 0 or sh == 0:
            continue
        need = sh * (sw + 1)
        sub = _png_unfilter_image(raw[pos : pos + need], sw, sh)
        pos += need
        out[y0::ys, x0::xs] = sub
    if pos != raw.size:
        raise ValueError("PNG interlaced stream size mismatch")
    return out


def gif_decode_gray(content: bytes):
    """Decode the first frame of a GIF to grayscale via the palette's
    RED channel — the standalone form of :func:`gif_decode_stats`."""
    import struct

    import numpy as np

    b = bytes(content)
    if b[:6] not in (b"GIF87a", b"GIF89a") or len(b) < 13:
        raise ValueError("not a GIF")
    _sw, _sh, packed, _bg, _ar = struct.unpack("<HHBBB", b[6:13])
    i = 13
    palette = None
    if packed & 0x80:
        gct_n = 2 << (packed & 0x7)
        palette = np.frombuffer(b[i : i + 3 * gct_n], dtype=np.uint8).reshape(
            gct_n, 3
        )
        i += 3 * gct_n
    while i < len(b):
        blk = b[i]
        i += 1
        if blk == 0x21:
            i += 1
            while b[i]:
                i += 1 + b[i]
            i += 1
            continue
        if blk != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{blk:02x}")
        _l, _t, w, h, ipk = struct.unpack("<HHHHB", b[i : i + 9])
        i += 9
        if ipk & 0x80:
            lct_n = 2 << (ipk & 0x7)
            palette = np.frombuffer(
                b[i : i + 3 * lct_n], dtype=np.uint8
            ).reshape(lct_n, 3)
            i += 3 * lct_n
        if palette is None:
            raise ValueError("GIF has no color table")
        mcs = b[i]
        i += 1
        lzw = bytearray()
        while b[i]:
            ln = b[i]
            lzw += b[i + 1 : i + 1 + ln]
            i += 1 + ln
        idx = np.frombuffer(
            bytes(_gif_lzw_decode(bytes(lzw), mcs)), dtype=np.uint8
        )
        stored = idx.reshape(h, w)
        grid = np.empty_like(stored)
        grid[_gif_row_order(h, bool(ipk & 0x40)), :] = stored
        return palette[:, 0][grid]
    raise ValueError("truncated GIF")


def gif_encode_animation(
    asset_id: int, width: int, height: int, n_frames: int
) -> bytes:
    """Minimal REAL ANIMATED GIF89a (the inter-frame side of the GIF
    spec): NETSCAPE2.0 looping application extension (decoders must
    skip it), per-frame Graphic Control Extensions (disposal method,
    transparency flag + index), SUB-RECTANGLE image descriptors
    (left/top offsets — frames 1+ update only part of the canvas), and
    TRANSPARENT pixels that keep the previous canvas value — i.e. real
    frame-delta compression semantics. Frame 0 is full-rect opaque
    (pixel (x,y) = (id + x·13 + y·7) % 255; index 255 is reserved as
    the transparent index); frame f ≥ 1 covers a deterministic
    sub-rect with every (x+y+f) % 3 == 0 pixel transparent and the
    rest (id + 11f + x·13 + y·7) % 255. Disposal is 'leave in place'
    (1) so composition is pure paint-over — the oracle replays it
    closed-form as an argmax over covering opaque frames."""
    import struct

    if n_frames < 1:
        raise ValueError("animation needs at least one frame")
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", width, height, 0xF7, 0, 0)
    out += bytes(j for j in range(256) for _ in range(3))
    # NETSCAPE2.0 looping extension (loop forever)
    out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    for f in range(n_frames):
        if f == 0:
            left = top = 0
            w, h = width, height
            transparent = False
        else:
            left = f % 3 + 1
            top = (f * 2) % 3 + 1
            w = width - left - (f % 2)
            h = height - top - ((f + 1) % 2)
            transparent = True
        # GCE: disposal 1 (leave in place), transparency per frame
        packed = (1 << 2) | (1 if transparent else 0)
        out += b"\x21\xf9\x04" + bytes([packed, 4, 0, 255]) + b"\x00"
        out += b"\x2c" + struct.pack("<HHHHB", left, top, w, h, 0)
        rows = bytearray()
        for yy in range(top, top + h):
            for xx in range(left, left + w):
                if f > 0 and (xx + yy + f) % 3 == 0:
                    rows.append(255)  # transparent: keep previous canvas
                else:
                    base = 11 * f if f > 0 else 0
                    rows.append((asset_id + base + xx * 13 + yy * 7) % 255)
        out.append(8)
        lzw = _gif_lzw_encode(bytes(rows), 8)
        for i in range(0, len(lzw), 255):
            chunk = lzw[i : i + 255]
            out.append(len(chunk))
            out += chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)


def gif_decode_frames(content: bytes, label: str = "asset"):
    """Decode EVERY frame of a (possibly animated) GIF and return the
    list of COMPOSITED grayscale canvases: header + GCT parse,
    extension-block walk (GCE disposal/transparency captured, other
    extensions skipped per the spec's sub-block framing), per-frame
    LZW decode, de-interlace, sub-rect placement with transparent
    pixels keeping the previous canvas, then the disposal step —
    0/1 leave, 2 restore-to-background over the frame's rect;
    3 (restore-previous) raises honestly."""
    import struct

    import numpy as np

    b = bytes(content)
    if b[:6] not in (b"GIF87a", b"GIF89a") or len(b) < 13:
        raise ValueError(f"{label}: not a GIF")
    sw, sh, packed, bg, _ar = struct.unpack("<HHBBB", b[6:13])
    i = 13
    palette = None
    if packed & 0x80:
        gct_n = 2 << (packed & 0x7)
        palette = np.frombuffer(b[i : i + 3 * gct_n], dtype=np.uint8).reshape(
            gct_n, 3
        )
        i += 3 * gct_n
    canvas = np.zeros((sh, sw), dtype=np.uint8)
    if palette is not None and bg < palette.shape[0]:
        canvas[:] = palette[bg, 0]
    frames = []
    disposal = 0
    transparent = None
    while i < len(b):
        blk = b[i]
        i += 1
        if blk == 0x3B:  # trailer
            break
        if blk == 0x21:
            label_b = b[i]
            i += 1
            if label_b == 0xF9:  # Graphic Control Extension
                sz = b[i]
                pk = b[i + 1]
                disposal = (pk >> 2) & 0x7
                transparent = b[i + 4] if pk & 1 else None
                i += 1 + sz
            while b[i]:  # remaining/other sub-blocks
                i += 1 + b[i]
            i += 1
            continue
        if blk != 0x2C:
            raise ValueError(f"{label}: unexpected GIF block 0x{blk:02x}")
        left, top, w, h, ipk = struct.unpack("<HHHHB", b[i : i + 9])
        i += 9
        pal = palette
        if ipk & 0x80:
            lct_n = 2 << (ipk & 0x7)
            pal = np.frombuffer(
                b[i : i + 3 * lct_n], dtype=np.uint8
            ).reshape(lct_n, 3)
            i += 3 * lct_n
        if pal is None:
            raise ValueError(f"{label}: GIF has no color table")
        mcs = b[i]
        i += 1
        lzw = bytearray()
        while b[i]:
            ln = b[i]
            lzw += b[i + 1 : i + 1 + ln]
            i += 1 + ln
        i += 1  # block terminator
        idx = np.frombuffer(
            bytes(_gif_lzw_decode(bytes(lzw), mcs)), dtype=np.uint8
        )
        stored = idx.reshape(h, w)
        grid = np.empty_like(stored)
        grid[_gif_row_order(h, bool(ipk & 0x40)), :] = stored
        if top + h > sh or left + w > sw:
            raise ValueError(f"{label}: frame rect beyond logical screen")
        region = canvas[top : top + h, left : left + w]
        gray = pal[:, 0][grid.astype(np.int64)]
        if transparent is not None:
            mask = grid != transparent
            region[mask] = gray[mask]
        else:
            region[:] = gray
        frames.append(canvas.copy())
        if disposal == 2:  # restore to background color
            bgv = pal[bg, 0] if bg < pal.shape[0] else 0
            canvas[top : top + h, left : left + w] = bgv
        elif disposal == 3:
            raise ValueError(
                f"{label}: disposal 3 (restore previous) unsupported"
            )
        disposal = 0
        transparent = None
    if not frames:
        raise ValueError(f"{label}: GIF holds no frames")
    return frames


def encode_gif_animation_assets(
    df: DataFrame,
    id_col: str = "doc_id",
    width_col: str = "width",
    height_col: str = "height",
    frames_col: str = "n_frames",
) -> DataFrame:
    """Arrow-batched animated-GIF encode: (id, width, height, n_frames)
    → (id, content binary)."""
    spark = df.sparkSession
    _ship_package(spark)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pipes_spark.operators.multimodal import gif_encode_animation

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "asset_id": pdf[id_col].astype("int64"),
                    "content": [
                        gif_encode_animation(int(i), int(w), int(h), int(nf))
                        for i, w, h, nf in zip(
                            pdf[id_col], pdf[width_col], pdf[height_col],
                            pdf[frames_col],
                        )
                    ],
                }
            )

    return df.select(id_col, width_col, height_col, frames_col).mapInPandas(
        gen, "asset_id bigint, content binary"
    )


def gif_animation_frame_stats(assets: DataFrame) -> DataFrame:
    """1→N animated-GIF frame sampling over Arrow batches: one row per
    COMPOSITED frame (asset_id, frame_no, width, height, pixel_sum) —
    the GIF sibling of avi_frame_sample_stats (catalog
    ``multimodal_gif_animation_frames``)."""
    spark = assets.sparkSession
    _ship_package(spark)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from pipes_spark.operators.multimodal import gif_decode_frames

        for pdf in batches:
            out = {
                "asset_id": [], "frame_no": [], "width": [], "height": [],
                "pixel_sum": [],
            }
            for aid, content in zip(pdf["asset_id"], pdf["content"]):
                for fno, canvas in enumerate(
                    gif_decode_frames(content, label=f"asset {aid}")
                ):
                    out["asset_id"].append(int(aid))
                    out["frame_no"].append(int(fno))
                    out["width"].append(int(canvas.shape[1]))
                    out["height"].append(int(canvas.shape[0]))
                    out["pixel_sum"].append(int(canvas.sum(dtype=np.int64)))
            yield pd.DataFrame(out)

    return assets.mapInPandas(
        gen,
        "asset_id bigint, frame_no int, width int, height int, "
        "pixel_sum bigint",
    )


def decode_image_gray(content: bytes):
    """Sniff-and-dispatch grayscale decode across every image codec the
    engine implements (PNG / GIF / JPEG incl. lossless + hierarchical /
    BMP / TIFF) — the cross-format entry point :func:`image_ahash`
    builds on."""
    fmt, *_ = sniff_image_header(bytes(content))
    if fmt == "png":
        return png_decode_gray(bytes(content))
    if fmt == "gif":
        return gif_decode_gray(bytes(content))
    if fmt == "jpeg":
        return jpeg_decode_gray(bytes(content))
    if fmt == "bmp":
        return bmp_decode_gray(bytes(content))
    if fmt == "tiff":
        return tiff_decode_gray(bytes(content))
    raise ValueError(f"unsupported image format {fmt!r}")


def bmp_encode(
    asset_id: int,
    width: int,
    height: int,
    bpp: int = 8,
    topdown: bool = False,
) -> bytes:
    """Minimal REAL BMP (BITMAPFILEHEADER + BITMAPINFOHEADER, BI_RGB,
    4-byte row stride, bottom-up by default / top-down via negative
    biHeight): 8-bit palettized (256-entry gray BGRA palette, pixel
    (x,y) = (asset_id·7 + x·11 + y·13) % 256) or 24-bit BGR (three
    per-channel lattices). The oracle recomputes pixels closed-form;
    a POSITION-WEIGHTED checksum in the stats proves orientation and
    stride handling (a flipped or stride-slipped read keeps the plain
    sum but breaks the weighted one)."""
    import struct

    import numpy as np

    if bpp not in (8, 24):
        raise ValueError(f"bpp must be 8 or 24, got {bpp}")
    x = np.arange(width, dtype=np.int64)[None, :]
    y = np.arange(height, dtype=np.int64)[:, None]
    if bpp == 8:
        px = ((asset_id * 7 + x * 11 + y * 13) % 256).astype(np.uint8)
        palette = b"".join(
            struct.pack("<BBBB", v, v, v, 0) for v in range(256)
        )
        stride = (width + 3) & ~3
        rows = np.zeros((height, stride), dtype=np.uint8)
        rows[:, :width] = px
        n_colors = 256
    else:
        bch = ((asset_id * 7 + x * 11 + y * 13) % 256).astype(np.uint8)
        gch = ((asset_id * 5 + x * 3 + y * 17) % 256).astype(np.uint8)
        rch = ((asset_id * 3 + x * 13 + y * 7) % 256).astype(np.uint8)
        stride = (width * 3 + 3) & ~3
        rows = np.zeros((height, stride), dtype=np.uint8)
        inter = np.stack([bch, gch, rch], axis=-1).reshape(height, width * 3)
        rows[:, : width * 3] = inter
        palette = b""
        n_colors = 0
    if not topdown:
        rows = rows[::-1]  # file stores bottom row first
    data = rows.tobytes()
    info = struct.pack(
        "<IiiHHIIiiII",
        40, width, -height if topdown else height, 1, bpp, 0, len(data),
        2835, 2835, n_colors, 0,
    )
    offset = 14 + 40 + len(palette)
    header = struct.pack("<2sIHHI", b"BM", offset + len(data), 0, 0, offset)
    return header + info + palette + data


def bmp_decode_gray(content: bytes):
    """Standalone BMP decode to a grayscale matrix (top-down row-major):
    BITMAPFILEHEADER/INFOHEADER parse, BI_RGB only, 8-bit palettized
    (palette deref then exact integer luma (299R+587G+114B)//1000 — the
    identity for gray palettes) or 24-bit BGR; bottom-up rows flipped,
    4-byte stride honored. Other depths/compressions raise loudly."""
    import struct

    import numpy as np

    b = bytes(content)
    if b[:2] != b"BM" or len(b) < 54:
        raise ValueError("not a BMP file")
    (offset,) = struct.unpack("<I", b[10:14])
    hsize, w, h = struct.unpack("<Iii", b[14:26])
    if hsize < 40:
        raise ValueError(f"unsupported BMP header size {hsize}")
    planes, bpp, compression = struct.unpack("<HHI", b[26:34])
    (n_colors,) = struct.unpack("<I", b[46:50])
    if compression != 0:
        raise ValueError(f"unsupported BMP compression {compression}")
    if bpp not in (8, 24):
        raise ValueError(f"unsupported BMP bit depth {bpp}")
    topdown = h < 0
    h = abs(h)
    stride = ((w * bpp + 31) // 32) * 4
    data = b[offset : offset + stride * h]
    if len(data) != stride * h:
        raise ValueError("truncated BMP pixel data")
    rows = np.frombuffer(data, dtype=np.uint8).reshape(h, stride)
    if not topdown:
        rows = rows[::-1]
    if bpp == 8:
        if n_colors == 0:
            n_colors = 256
        pal = np.frombuffer(
            b[14 + hsize : 14 + hsize + n_colors * 4], dtype=np.uint8
        ).reshape(-1, 4)
        if pal.shape[0] < n_colors:
            raise ValueError("truncated BMP palette")
        idx = rows[:, :w].astype(np.int64)
        if int(idx.max(initial=0)) >= pal.shape[0]:
            raise ValueError("BMP pixel index beyond palette")
        bch = pal[idx, 0].astype(np.int64)
        gch = pal[idx, 1].astype(np.int64)
        rch = pal[idx, 2].astype(np.int64)
    else:
        trip = rows[:, : w * 3].reshape(h, w, 3).astype(np.int64)
        bch, gch, rch = trip[..., 0], trip[..., 1], trip[..., 2]
    return ((rch * 299 + gch * 587 + bch * 114) // 1000).astype(np.uint8)


def encode_bmp_assets(
    df: DataFrame,
    id_col: str = "doc_id",
    width_col: str = "width",
    height_col: str = "height",
    bpp_col: str = "bpp",
    topdown_col: str = "topdown",
) -> DataFrame:
    """Arrow-batched BMP encode: (id, width, height, bpp 8|24, topdown
    bool) → (id, content binary)."""
    spark = df.sparkSession
    _ship_package(spark)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pipes_spark.operators.multimodal import bmp_encode

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "asset_id": pdf[id_col].astype("int64"),
                    "content": [
                        bmp_encode(int(i), int(w), int(h), int(p), bool(t))
                        for i, w, h, p, t in zip(
                            pdf[id_col], pdf[width_col], pdf[height_col],
                            pdf[bpp_col], pdf[topdown_col],
                        )
                    ],
                }
            )

    return df.select(
        id_col, width_col, height_col, bpp_col, topdown_col
    ).mapInPandas(gen, "asset_id bigint, content binary")


def bmp_decode_stats(assets: DataFrame) -> DataFrame:
    """REAL BMP decode with a position-weighted checksum: (asset_id,
    format, width, height, bpp, pixel_sum, weighted_sum, px_min,
    px_max) where weighted_sum = Σ px(x,y)·(y·W + x + 1) over the
    TOP-DOWN orientation — bottom-up files must be flipped and strides
    skipped exactly for the weight grid to line up (catalog
    ``multimodal_bmp_roundtrip``)."""
    spark = assets.sparkSession
    _ship_package(spark)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from pipes_spark.operators.multimodal import (
            bmp_decode_gray,
            sniff_image_header,
        )

        for pdf in batches:
            out = {
                "asset_id": [], "format": [], "width": [], "height": [],
                "bpp": [], "pixel_sum": [], "weighted_sum": [],
                "px_min": [], "px_max": [],
            }
            for aid, content in zip(pdf["asset_id"], pdf["content"]):
                fmt, w, h, bpp, _ = sniff_image_header(bytes(content))
                if fmt != "bmp":
                    raise ValueError(f"asset {aid}: expected BMP, got {fmt}")
                px = bmp_decode_gray(bytes(content)).astype(np.int64)
                hh, ww = px.shape
                weights = (
                    np.arange(hh, dtype=np.int64)[:, None] * ww
                    + np.arange(ww, dtype=np.int64)[None, :]
                    + 1
                )
                out["asset_id"].append(int(aid))
                out["format"].append("bmp")
                out["width"].append(int(ww))
                out["height"].append(int(hh))
                out["bpp"].append(int(bpp))
                out["pixel_sum"].append(int(px.sum()))
                out["weighted_sum"].append(int((px * weights).sum()))
                out["px_min"].append(int(px.min()))
                out["px_max"].append(int(px.max()))
            yield pd.DataFrame(out)

    return assets.mapInPandas(
        gen,
        "asset_id bigint, format string, width int, height int, bpp int, "
        "pixel_sum bigint, weighted_sum bigint, px_min int, px_max int",
    )


def _packbits_encode(row: bytes) -> bytes:
    """Apple PackBits (the TIFF 6.0 Compression=32773 scheme): runs of
    ≥ 3 as (257-n, value) replicate pairs, literals as (n-1, bytes);
    128 is the no-op and never emitted."""
    out = bytearray()
    i = 0
    n = len(row)
    while i < n:
        j = i + 1
        while j < n and row[j] == row[i] and j - i < 127:
            j += 1
        if j - i >= 3:
            out.append(257 - (j - i))
            out.append(row[i])
            i = j
            continue
        # literal stretch: until the next ≥3 run or the 128-byte ceiling
        k = i
        while k < n and k - i < 128:
            if k + 2 < n and row[k] == row[k + 1] == row[k + 2]:
                break
            k += 1
        out.append(k - i - 1)
        out += row[i:k]
        i = k
    return bytes(out)


def _packbits_decode(data: bytes, expected: int, label: str = "strip") -> bytes:
    """PackBits inflate: n in 0..127 → copy n+1 literals; 129..255 →
    repeat next byte 257-n times; 128 → no-op."""
    out = bytearray()
    i = 0
    n = len(data)
    while len(out) < expected and i < n:
        c = data[i]
        i += 1
        if c < 128:
            if i + c + 1 > n:
                raise ValueError(f"{label}: truncated PackBits literal")
            out += data[i : i + c + 1]
            i += c + 1
        elif c > 128:
            if i >= n:
                raise ValueError(f"{label}: truncated PackBits run")
            out += bytes([data[i]]) * (257 - c)
            i += 1
        # c == 128: no-op
    if len(out) != expected:
        raise ValueError(
            f"{label}: PackBits inflated {len(out)} bytes, expected {expected}"
        )
    return bytes(out)


def _tiff_lzw_encode(data: bytes) -> bytes:
    """TIFF 6.0 chapter-13 LZW compress: MSB-first bit packing, codes
    start at 9 bits, ClearCode 256 / EOI 257, table entries from 258,
    and the spec's EARLY CHANGE — the code width bumps when the NEXT
    entry would be 2^width − 1 (one code earlier than GIF's LSB-first
    variant); at 12 bits a ClearCode resets the table instead."""
    # r12 kernel pass (guide §4.2, the _gif_lzw_encode rewrite): the table
    # keys on the INTEGER (prefix_code << 8) | next_byte instead of the
    # byte-string prefix — identical code sequence by construction (single
    # bytes are their own codes, entries assigned in the same order), no
    # per-input-byte bytes() allocation or string hashing.
    CLEAR, EOI = 256, 257
    out = bytearray()
    append = out.append
    acc = 0
    nbits = 0
    width = 9

    table: dict = {}
    table_get = table.get
    next_code = 258

    # emit(CLEAR)
    acc = (acc << width) | CLEAR
    nbits += width
    while nbits >= 8:
        append((acc >> (nbits - 8)) & 0xFF)
        nbits -= 8
    acc &= (1 << nbits) - 1

    it = iter(data)
    w = next(it, None)
    if w is not None:
        for ch in it:
            key = (w << 8) | ch
            nc = table_get(key)
            if nc is not None:
                w = nc
                continue
            acc = (acc << width) | w
            nbits += width
            while nbits >= 8:
                append((acc >> (nbits - 8)) & 0xFF)
                nbits -= 8
            acc &= (1 << nbits) - 1
            table[key] = next_code
            next_code += 1
            if next_code == (1 << width) - 1:  # early change
                if width < 12:
                    width += 1
                else:
                    acc = (acc << width) | CLEAR
                    nbits += width
                    while nbits >= 8:
                        append((acc >> (nbits - 8)) & 0xFF)
                        nbits -= 8
                    acc &= (1 << nbits) - 1
                    table = {}
                    table_get = table.get
                    next_code = 258
                    width = 9
            w = ch
        acc = (acc << width) | w
        nbits += width
        while nbits >= 8:
            append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8
        acc &= (1 << nbits) - 1

    acc = (acc << width) | EOI
    nbits += width
    while nbits >= 8:
        append((acc >> (nbits - 8)) & 0xFF)
        nbits -= 8
    acc &= (1 << nbits) - 1
    if nbits:
        append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def _tiff_lzw_decode(data: bytes, expected: int, label: str = "strip") -> bytes:
    """TIFF LZW inflate mirroring :func:`_tiff_lzw_encode`'s early-change
    width schedule; handles the KwKwK just-added-code case."""
    CLEAR, EOI = 256, 257
    bitpos = 0
    total = len(data) * 8
    width = 9

    def read() -> int:
        nonlocal bitpos
        if bitpos + width > total:
            raise ValueError(f"{label}: LZW stream ran out of bits")
        v = 0
        for _ in range(width):
            v = (v << 1) | ((data[bitpos >> 3] >> (7 - (bitpos & 7))) & 1)
            bitpos += 1
        return v

    base = [bytes([i]) for i in range(256)] + [b"", b""]
    table = list(base)
    out = bytearray()
    prev = None
    while True:
        code = read()
        if code == EOI:
            break
        if code == CLEAR:
            table = list(base)
            width = 9
            prev = None
            continue
        if prev is None:
            if code >= 256:
                raise ValueError(f"{label}: bad LZW code after clear")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError(f"{label}: LZW code {code} beyond table")
        # early change, mirrored ONE ENTRY EARLY: the decoder's table
        # is one entry behind the encoder's (no append on the first
        # code after a clear), so the width bump fires at 2^w − 2
        if len(table) == (1 << width) - 2 and width < 12:
            width += 1
        out += entry
        prev = entry
        if len(out) > expected:
            raise ValueError(f"{label}: LZW inflated past expected size")
    if len(out) != expected:
        raise ValueError(
            f"{label}: LZW inflated {len(out)} bytes, expected {expected}"
        )
    return bytes(out)


def tiff_encode_gray(
    asset_id: int,
    width: int,
    height: int,
    byte_order: str = "II",
    compression: int = 1,
    photometric: int = 1,
    rows_per_strip: int = 4,
) -> bytes:
    """Minimal REAL TIFF 6.0 (public Adobe spec): header in EITHER byte
    order ('II' little / 'MM' big — tag values follow it), one IFD with
    the baseline grayscale tag set, MULTI-STRIP layout (RowsPerStrip
    usually < height, so StripOffsets/ByteCounts are real arrays), and
    Compression 1 (none) or 32773 (PackBits). Stored sample for pixel
    (x,y): the standard lattice under PhotometricInterpretation 1
    (BlackIsZero), or its 255-complement under 0 (WhiteIsZero) — the
    decoder must re-invert, so the gate proves photometric handling."""
    import struct

    import numpy as np

    if byte_order not in ("II", "MM"):
        raise ValueError(f"byte_order must be 'II' or 'MM', got {byte_order!r}")
    if compression not in (1, 32773, 5):
        raise ValueError(
            f"compression must be 1, 5 or 32773, got {compression}"
        )
    if photometric not in (0, 1):
        raise ValueError(f"photometric must be 0 or 1, got {photometric}")
    e = "<" if byte_order == "II" else ">"
    x = np.arange(width, dtype=np.int64)[None, :]
    y = np.arange(height, dtype=np.int64)[:, None]
    px = ((asset_id * 7 + x * 11 + y * 13) % 256).astype(np.uint8)
    stored = (255 - px) if photometric == 0 else px
    strips = []
    for y0 in range(0, height, rows_per_strip):
        raw = stored[y0 : y0 + rows_per_strip].tobytes()
        if compression == 32773:
            raw = _packbits_encode(raw)
        elif compression == 5:
            raw = _tiff_lzw_encode(raw)
        strips.append(raw)

    def entry(tag, typ, count, value):
        # SHORT (3) and LONG (4) inline values live left-justified in the
        # 4-byte field per the spec
        if typ == 3:
            return struct.pack(e + "HHI", tag, typ, count) + struct.pack(
                e + "HH", value, 0
            )
        return struct.pack(e + "HHII", tag, typ, count, value)

    n_strips = len(strips)
    # layout: header(8) + IFD + [strip arrays] + strip data
    n_entries = 9
    ifd_size = 2 + n_entries * 12 + 4
    arrays_at = 8 + ifd_size
    if n_strips > 1:
        offs_at = arrays_at
        counts_at = offs_at + 4 * n_strips
        data_at = counts_at + 4 * n_strips
    else:
        offs_at = counts_at = 0
        data_at = arrays_at
    strip_offsets = []
    pos = data_at
    for s in strips:
        strip_offsets.append(pos)
        pos += len(s)
    entries = [
        entry(256, 4, 1, width),  # ImageWidth
        entry(257, 4, 1, height),  # ImageLength
        entry(258, 3, 1, 8),  # BitsPerSample
        entry(259, 3, 1, compression),
        entry(262, 3, 1, photometric),
        entry(
            273, 4, n_strips,
            strip_offsets[0] if n_strips == 1 else offs_at,
        ),  # StripOffsets
        entry(277, 3, 1, 1),  # SamplesPerPixel
        entry(278, 4, 1, rows_per_strip),
        entry(
            279, 4, n_strips,
            len(strips[0]) if n_strips == 1 else counts_at,
        ),  # StripByteCounts
    ]
    out = bytearray()
    out += byte_order.encode() + struct.pack(e + "HI", 42, 8)
    out += struct.pack(e + "H", n_entries)
    for en in entries:
        out += en
    out += struct.pack(e + "I", 0)  # next-IFD terminator
    if n_strips > 1:
        for o in strip_offsets:
            out += struct.pack(e + "I", o)
        for s in strips:
            out += struct.pack(e + "I", len(s))
    for s in strips:
        out += s
    return bytes(out)


def tiff_decode_gray(content: bytes, label: str = "asset"):
    """Standalone baseline-grayscale TIFF decode: byte-order-aware
    header + first-IFD walk, strip concatenation (PackBits inflated),
    WhiteIsZero re-inversion. Returns the grayscale matrix; color,
    other depths, and other compressions raise loudly."""
    import struct

    import numpy as np

    b = bytes(content)
    if len(b) < 8 or b[:2] not in (b"II", b"MM"):
        raise ValueError(f"{label}: not a TIFF file")
    e = "<" if b[:2] == b"II" else ">"
    magic, ifd_at = struct.unpack(e + "HI", b[2:8])
    if magic != 42:
        raise ValueError(f"{label}: bad TIFF magic {magic}")
    (n_entries,) = struct.unpack(e + "H", b[ifd_at : ifd_at + 2])
    tags = {}
    for i in range(n_entries):
        at = ifd_at + 2 + i * 12
        tag, typ, count = struct.unpack(e + "HHI", b[at : at + 8])
        if typ == 3 and count == 1:
            (val,) = struct.unpack(e + "H", b[at + 8 : at + 10])
            tags[tag] = (typ, count, val)
        else:
            (val,) = struct.unpack(e + "I", b[at + 8 : at + 12])
            tags[tag] = (typ, count, val)

    def long_array(tag):
        typ, count, val = tags[tag]
        if count == 1:
            return [val]
        sz = 2 if typ == 3 else 4
        fmt = "H" if typ == 3 else "I"
        return list(
            struct.unpack(e + fmt * count, b[val : val + sz * count])
        )

    for req in (256, 257, 273, 279):
        if req not in tags:
            raise ValueError(f"{label}: TIFF missing required tag {req}")
    width = tags[256][2]
    height = tags[257][2]
    bits = tags.get(258, (3, 1, 1))[2]
    compression = tags.get(259, (3, 1, 1))[2]
    photometric = tags.get(262, (3, 1, 1))[2]
    spp = tags.get(277, (3, 1, 1))[2]
    rps = tags.get(278, (4, 1, height))[2]
    if bits != 8 or spp != 1:
        raise ValueError(
            f"{label}: only 8-bit single-sample TIFF supported "
            f"(bits {bits}, samples {spp})"
        )
    if compression not in (1, 32773, 5):
        raise ValueError(
            f"{label}: unsupported TIFF compression {compression} "
            "(supported: none, LZW, PackBits)"
        )
    if photometric not in (0, 1):
        raise ValueError(
            f"{label}: unsupported photometric {photometric} (gray only)"
        )
    offsets = long_array(273)
    counts = long_array(279)
    if len(offsets) != len(counts):
        raise ValueError(f"{label}: strip offset/count arity mismatch")
    raw = bytearray()
    for si, (off, cnt) in enumerate(zip(offsets, counts)):
        strip = b[off : off + cnt]
        if len(strip) != cnt:
            raise ValueError(f"{label}: truncated strip {si}")
        rows_here = min(rps, height - si * rps)
        if rows_here <= 0:
            raise ValueError(f"{label}: more strips than image rows")
        if compression == 32773:
            strip = _packbits_decode(
                strip, rows_here * width, label=f"{label} strip {si}"
            )
        elif compression == 5:
            strip = _tiff_lzw_decode(
                strip, rows_here * width, label=f"{label} strip {si}"
            )
        elif len(strip) != rows_here * width:
            raise ValueError(f"{label}: strip {si} size mismatch")
        raw += strip
    if len(raw) != width * height:
        raise ValueError(f"{label}: strips cover {len(raw)} bytes, "
                         f"expected {width * height}")
    px = np.frombuffer(bytes(raw), dtype=np.uint8).reshape(height, width)
    if photometric == 0:  # WhiteIsZero
        px = 255 - px
    return px


def encode_tiff_assets(
    df: DataFrame,
    id_col: str = "doc_id",
    width_col: str = "width",
    height_col: str = "height",
    order_col: str = "byte_order",
    comp_col: str = "compression",
    photo_col: str = "photometric",
) -> DataFrame:
    """Arrow-batched TIFF encode: (id, width, height, byte_order
    'II'|'MM', compression 1|32773, photometric 0|1) → (id, content)."""
    spark = df.sparkSession
    _ship_package(spark)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pipes_spark.operators.multimodal import tiff_encode_gray

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "asset_id": pdf[id_col].astype("int64"),
                    "content": [
                        tiff_encode_gray(
                            int(i), int(w), int(h), str(o), int(c), int(p)
                        )
                        for i, w, h, o, c, p in zip(
                            pdf[id_col], pdf[width_col], pdf[height_col],
                            pdf[order_col], pdf[comp_col], pdf[photo_col],
                        )
                    ],
                }
            )

    return df.select(
        id_col, width_col, height_col, order_col, comp_col, photo_col
    ).mapInPandas(gen, "asset_id bigint, content binary")


def tiff_decode_stats(assets: DataFrame) -> DataFrame:
    """REAL TIFF decode with the position-weighted checksum row
    (catalog ``multimodal_tiff_roundtrip``): (asset_id, format,
    byte_order, compression, photometric, width, height, pixel_sum,
    weighted_sum) — the weighted sum catches strip mis-assembly and a
    skipped WhiteIsZero inversion alike."""
    spark = assets.sparkSession
    _ship_package(spark)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        import numpy as np

        from pipes_spark.operators.multimodal import tiff_decode_gray

        for pdf in batches:
            out = {
                "asset_id": [], "format": [], "byte_order": [],
                "compression": [], "photometric": [], "width": [],
                "height": [], "pixel_sum": [], "weighted_sum": [],
            }
            for aid, content in zip(pdf["asset_id"], pdf["content"]):
                b = bytes(content)
                e = "<" if b[:2] == b"II" else ">"
                px = tiff_decode_gray(b, label=f"asset {aid}").astype(
                    np.int64
                )
                # re-read compression/photometric for the evidence row
                (_, ifd_at) = struct.unpack(e + "HI", b[2:8])
                (n_entries,) = struct.unpack(e + "H", b[ifd_at : ifd_at + 2])
                comp = photo = 1
                for i in range(n_entries):
                    at = ifd_at + 2 + i * 12
                    tag, typ, _cnt = struct.unpack(e + "HHI", b[at : at + 8])
                    if tag in (259, 262):
                        (val,) = struct.unpack(e + "H", b[at + 8 : at + 10])
                        if tag == 259:
                            comp = val
                        else:
                            photo = val
                hh, ww = px.shape
                weights = (
                    np.arange(hh, dtype=np.int64)[:, None] * ww
                    + np.arange(ww, dtype=np.int64)[None, :]
                    + 1
                )
                out["asset_id"].append(int(aid))
                out["format"].append("tiff")
                out["byte_order"].append(b[:2].decode())
                out["compression"].append(int(comp))
                out["photometric"].append(int(photo))
                out["width"].append(int(ww))
                out["height"].append(int(hh))
                out["pixel_sum"].append(int(px.sum()))
                out["weighted_sum"].append(int((px * weights).sum()))
            yield pd.DataFrame(out)

    return assets.mapInPandas(
        gen,
        "asset_id bigint, format string, byte_order string, "
        "compression int, photometric int, width int, height int, "
        "pixel_sum bigint, weighted_sum bigint",
    )


def _jpeg_hier_upsample(ref, out_h: int, out_w: int):
    """T.81 J.1.1.2 reference expansion: per axis, output even sample
    2i = input i, odd sample 2i+1 = (input[i] + input[i+1] + 1) >> 1
    with edge replication for the final odd sample; horizontal then
    vertical, truncated to the frame dims."""
    import numpy as np

    ref = np.asarray(ref, dtype=np.int64)

    def axis_up(a, out_n):
        n = a.shape[1]
        up = np.empty((a.shape[0], 2 * n), dtype=np.int64)
        up[:, 0::2] = a
        nb = np.concatenate([a[:, 1:], a[:, -1:]], axis=1)  # edge replicate
        up[:, 1::2] = (a + nb + 1) >> 1
        return up[:, :out_n]

    out = axis_up(ref, out_w)
    out = axis_up(out.T, out_h).T
    return out


def jpeg_encode_hierarchical(pixels) -> bytes:
    """REAL HIERARCHICAL JPEG encode (T.81 Annex J — the multi-frame
    pyramid mode): SOI, DHP (define hierarchical progression, SOF-syntax
    header with the FULL dims), a NON-differential SOF0 first frame
    coding the 2×-decimated image through the module's own baseline
    codec, EXP (expand reference, Eh=Ev=1), then a DIFFERENTIAL
    LOSSLESS (SOF7) final frame coding ``original − upsample(decoded
    first frame)`` modulo 2^16 with zero prediction (the Annex-J rule
    for differential frames) and a per-stream optimal table. Because
    the encoder computes the residual against its own DECODE of frame 1
    and the final frame is lossless, reconstruction is BIT-EXACT on
    arbitrary content even though the base frame is lossy — and the
    hash gate thereby certifies the decoder's J.1.1.2 upsample filter
    (any filter slip leaves a nonzero net error)."""
    import struct

    import numpy as np

    px = np.asarray(pixels, dtype=np.int64)
    h, w = px.shape
    small = px[::2, ::2].astype(np.uint8)  # encoder's downsample choice
    frame1 = jpeg_encode_gray(small)
    ref = jpeg_decode_gray(frame1).astype(np.int64)
    ref_up = _jpeg_hier_upsample(ref, h, w)
    diff = (px - ref_up) & 0xFFFF
    diff = np.where(diff >= 32768, diff - 65536, diff)
    bits_spec, huffval, entropy = _jpeg_code_diff_stream(diff.reshape(-1))
    out = bytearray(b"\xff\xd8")
    dhp = struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0])
    out += b"\xff\xde" + struct.pack(">H", 2 + len(dhp)) + dhp
    out += frame1[2:-2]  # strip the embedded SOI/EOI
    out += b"\xff\xdf" + struct.pack(">H", 3) + bytes([0x11])  # EXP Eh=Ev=1
    dht = bytes([0x00] + bits_spec + huffval)
    out += b"\xff\xc4" + struct.pack(">H", 2 + len(dht)) + dht
    sof7 = struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0])
    out += b"\xff\xc7" + struct.pack(">H", 2 + len(sof7)) + sof7
    sos = bytes([1, 1, 0x00, 0, 0, 0])  # Ss=0: no prediction (differential)
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    out += entropy
    out += b"\xff\xd9"
    return bytes(out)


def _jpeg_decode_hierarchical(data: bytes):
    """REAL HIERARCHICAL JPEG decode (T.81 Annex J): DHP parse, first
    (non-differential) frame re-framed as a standalone stream for the
    module's baseline decoder, EXP reference expansion through the
    J.1.1.2 filter, then the differential-lossless SOF7 frame decoded
    with zero prediction and ADDED to the reference modulo 2^16.
    Single 8-bit component; differential DCT frames and multi-level
    pyramids beyond one EXP raise loudly."""
    import struct

    import numpy as np

    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    full_h = full_w = None
    tables_raw = bytearray()  # DQT/DHT/DRI segments seen before frame 1
    ref = None
    expanded = False
    dc_dec = {}
    i = 2
    n = len(data)
    while i < n:
        if data[i] != 0xFF:
            raise ValueError(f"expected marker at offset {i}")
        while i < n and data[i] == 0xFF:
            i += 1
        marker = data[i]
        i += 1
        if marker in (0x01,) or 0xD0 <= marker <= 0xD8:
            continue
        if marker == 0xD9:
            break
        (seglen,) = struct.unpack(">H", data[i : i + 2])
        seg_end = i + seglen
        p = i + 2
        if marker == 0xDE:  # DHP
            prec = data[p]
            if prec != 8:
                raise ValueError("hierarchical precision != 8 unsupported")
            full_h, full_w = struct.unpack(">HH", data[p + 1 : p + 5])
            if data[p + 5] != 1:
                raise ValueError(
                    "multi-component hierarchical JPEG unsupported"
                )
            i = seg_end
        elif marker in (0xDB, 0xDD):  # DQT / DRI for the embedded frame
            tables_raw += b"\xff" + bytes([marker])
            tables_raw += data[i:seg_end]
            i = seg_end
        elif marker == 0xC4:  # DHT: keep raw for frame 1 AND parsed for SOF7
            tables_raw += b"\xff\xc4" + data[i:seg_end]
            while p < seg_end:
                cls, tid = data[p] >> 4, data[p] & 0xF
                p += 1
                bits = list(data[p : p + 16])
                p += 16
                nv = sum(bits)
                vals = list(data[p : p + nv])
                p += nv
                if cls == 0:
                    dc_dec[tid] = _jpeg_huff_decoder(bits, vals)
            i = seg_end
        elif marker == 0xC0:  # first (non-differential) frame
            if ref is not None:
                raise ValueError("second non-differential frame unsupported")
            if full_h is None:
                raise ValueError("SOF0 before DHP in hierarchical stream")
            # find this frame's SOS and the end of its entropy data
            j = seg_end
            frame_raw = bytearray(b"\xff\xc0" + data[i:seg_end])
            while j < n:
                if data[j] != 0xFF:
                    raise ValueError("marker expected inside frame 1")
                m2 = data[j + 1]
                (l2,) = struct.unpack(">H", data[j + 2 : j + 4])
                if m2 == 0xDA:
                    k = j + 2 + l2
                    while k + 1 < n and not (
                        data[k] == 0xFF
                        and data[k + 1] != 0x00
                        and not 0xD0 <= data[k + 1] <= 0xD7
                    ):
                        k += 1
                    frame_raw += data[j : k]
                    j = k
                    break
                frame_raw += data[j : j + 2 + l2]
                j += 2 + l2
            standalone = b"\xff\xd8" + bytes(tables_raw) + bytes(frame_raw) + b"\xff\xd9"
            ref = jpeg_decode_gray(standalone).astype(np.int64)
            i = j
        elif marker == 0xDF:  # EXP
            if ref is None:
                raise ValueError("EXP before the first frame")
            if expanded:
                raise ValueError("multi-level pyramids unsupported (one EXP)")
            ehv = data[p]
            if ehv != 0x11:
                raise ValueError(f"EXP Eh/Ev {ehv:#x} unsupported (1/1 only)")
            ref = _jpeg_hier_upsample(ref, full_h, full_w)
            expanded = True
            i = seg_end
        elif marker == 0xC7:  # differential lossless frame
            if data[p] != 8 or data[p + 5] != 1:
                raise ValueError("SOF7 shape unsupported")
            fh, fw = struct.unpack(">HH", data[p + 1 : p + 5])
            if (fh, fw) != (full_h, full_w):
                raise ValueError("SOF7 dims disagree with DHP")
            i = seg_end
        elif marker in (0xC5, 0xC6):
            raise ValueError(
                "differential DCT frames unsupported (lossless SOF7 only)"
            )
        elif marker == 0xDA:  # the differential scan
            if ref is None or not expanded:
                raise ValueError("differential scan before reference ready")
            ns = data[p]
            td = data[p + 2] >> 4
            off = p + 1 + 2 * ns
            if ns != 1 or data[off] != 0:
                raise ValueError(
                    "differential lossless scan must be 1-component Ss=0"
                )
            if td not in dc_dec:
                raise ValueError(f"scan references undefined DC table {td}")
            dec = dc_dec[td]
            r = _JpegBitReader(data, seg_end)
            # fused entropy decode of the whole diff stream (same symbol
            # order/consumption points), then one vectorized modular
            # add — per-sample numpy scalar indexing was a measured hot
            # spot
            diffs = _jpeg_diff_run(r, dec, full_h * full_w)
            out = (
                ref.astype(np.int64)
                + np.array(diffs, dtype=np.int64).reshape(full_h, full_w)
            ) & 0xFFFF
            if out.max() > 255:
                raise ValueError("hierarchical reconstruction out of range")
            return out.astype(np.uint8)
        else:
            i = seg_end
    raise ValueError("no differential scan found in hierarchical stream")


def encode_jpeg_hierarchical_assets(
    df: DataFrame,
    id_col: str = "doc_id",
    width_col: str = "width",
    height_col: str = "height",
) -> DataFrame:
    """Arrow-batched HIERARCHICAL JPEG encode (T.81 Annex J): (id,
    width, height) → (id, content binary) over the standard per-pixel
    lattice (the differential-lossless top frame makes arbitrary
    content bit-exact)."""
    spark = df.sparkSession
    _ship_package(spark)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from pipes_spark.operators.multimodal import jpeg_encode_hierarchical

        for pdf in batches:
            content = []
            for i, w, h in zip(
                pdf[id_col], pdf[width_col], pdf[height_col]
            ):
                x = np.arange(int(w), dtype=np.int64)[None, :]
                y = np.arange(int(h), dtype=np.int64)[:, None]
                px = ((int(i) * 7 + x * 11 + y * 13) % 256).astype(np.uint8)
                content.append(jpeg_encode_hierarchical(px))
            yield pd.DataFrame(
                {"asset_id": pdf[id_col].astype("int64"), "content": content}
            )

    return df.select(id_col, width_col, height_col).mapInPandas(
        gen, "asset_id bigint, content binary"
    )


def encode_jpeg_lossless_assets(
    df: DataFrame,
    id_col: str = "doc_id",
    width_col: str = "width",
    height_col: str = "height",
    pred_col: str = "predictor",
    pt_col: str = "point_transform",
) -> DataFrame:
    """Arrow-batched LOSSLESS JPEG encode (T.81 Annex H): (id, width,
    height, predictor 1-7, point_transform) → (id, content binary),
    over the standard per-pixel lattice (lossless ⇒ arbitrary per-pixel
    content reconstructs exactly — no block-constant contract)."""
    spark = df.sparkSession
    _ship_package(spark)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from pipes_spark.operators.multimodal import jpeg_encode_lossless

        for pdf in batches:
            content = []
            for i, w, h, pr, pt in zip(
                pdf[id_col], pdf[width_col], pdf[height_col],
                pdf[pred_col], pdf[pt_col],
            ):
                x = np.arange(int(w), dtype=np.int64)[None, :]
                y = np.arange(int(h), dtype=np.int64)[:, None]
                px = ((int(i) * 7 + x * 11 + y * 13) % 256).astype(np.uint8)
                content.append(
                    jpeg_encode_lossless(px, int(pr), int(pt))
                )
            yield pd.DataFrame(
                {"asset_id": pdf[id_col].astype("int64"), "content": content}
            )

    return df.select(
        id_col, width_col, height_col, pred_col, pt_col
    ).mapInPandas(gen, "asset_id bigint, content binary")


def image_decode_weighted_stats(assets: DataFrame) -> DataFrame:
    """Codec-independent REAL image decode with the position-weighted
    checksum row: sniff the format, decode through
    :func:`decode_image_gray` (PNG/GIF/JPEG incl. lossless/BMP/TIFF),
    output (asset_id, format, width, height, pixel_sum, weighted_sum,
    px_min, px_max). The weighted sum pins every pixel to its
    position, so a hash-pass proves exact per-pixel reconstruction."""
    spark = assets.sparkSession
    _ship_package(spark)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from pipes_spark.operators.multimodal import (
            decode_image_gray,
            sniff_image_header,
        )

        for pdf in batches:
            out = {
                "asset_id": [], "format": [], "width": [], "height": [],
                "pixel_sum": [], "weighted_sum": [], "px_min": [],
                "px_max": [],
            }
            for aid, content in zip(pdf["asset_id"], pdf["content"]):
                fmt, *_ = sniff_image_header(bytes(content))
                px = decode_image_gray(bytes(content)).astype(np.int64)
                hh, ww = px.shape
                weights = (
                    np.arange(hh, dtype=np.int64)[:, None] * ww
                    + np.arange(ww, dtype=np.int64)[None, :]
                    + 1
                )
                out["asset_id"].append(int(aid))
                out["format"].append(str(fmt))
                out["width"].append(int(ww))
                out["height"].append(int(hh))
                out["pixel_sum"].append(int(px.sum()))
                out["weighted_sum"].append(int((px * weights).sum()))
                out["px_min"].append(int(px.min()))
                out["px_max"].append(int(px.max()))
            yield pd.DataFrame(out)

    return assets.mapInPandas(
        gen,
        "asset_id bigint, format string, width int, height int, "
        "pixel_sum bigint, weighted_sum bigint, px_min int, px_max int",
    )


# EXIF (round 11) — the public Exif/TIFF tag registry subset the
# extractor names; everything else surfaces as tag_<id>.
_EXIF_TAG_NAMES = {
    271: "Make", 272: "Model", 274: "Orientation", 306: "DateTime",
    282: "XResolution", 283: "YResolution", 296: "ResolutionUnit",
    33434: "ExposureTime", 33437: "FNumber", 34855: "ISOSpeedRatings",
    36867: "DateTimeOriginal", 40962: "PixelXDimension",
    40963: "PixelYDimension", 34665: "ExifIFDPointer",
}
_EXIF_TYPE_NAMES = {2: "ASCII", 3: "SHORT", 4: "LONG", 5: "RATIONAL"}


def _exif_ifd_bytes(entries, e: str, ifd_at: int, next_ifd: int = 0):
    """Serialize one TIFF IFD (entries = [(tag, type, values)]) at
    offset ``ifd_at`` inside the TIFF structure, placing out-of-line
    values right after the IFD. Returns the IFD+data bytes."""
    import struct

    n = len(entries)
    data_at = ifd_at + 2 + n * 12 + 4
    body = bytearray(struct.pack(e + "H", n))
    tail = bytearray()
    for tag, typ, values in sorted(entries):
        if typ == 2:  # ASCII: NUL-terminated
            raw = values.encode() + b"\x00"
            count = len(raw)
        elif typ == 3:
            raw = b"".join(struct.pack(e + "H", v) for v in values)
            count = len(values)
        elif typ == 4:
            raw = b"".join(struct.pack(e + "I", v) for v in values)
            count = len(values)
        elif typ == 5:
            raw = b"".join(
                struct.pack(e + "II", num, den) for num, den in values
            )
            count = len(values)
        else:
            raise ValueError(f"unsupported EXIF type {typ}")
        if len(raw) <= 4:
            field = raw + b"\x00" * (4 - len(raw))
        else:
            field = struct.pack(e + "I", data_at + len(tail))
            tail += raw
            if len(raw) % 2:
                tail += b"\x00"
        body += struct.pack(e + "HHI", tag, typ, count) + field
    body += struct.pack(e + "I", next_ifd)
    return bytes(body) + bytes(tail)


def exif_app1_payload(tags0, exif_tags, byte_order: str = "II") -> bytes:
    """Build an APP1 'Exif\\x00\\x00' payload: TIFF header + IFD0 (with
    an ExifIFDPointer when ``exif_tags`` is nonempty) + the Exif
    sub-IFD, in either byte order."""
    import struct

    if byte_order not in ("II", "MM"):
        raise ValueError(f"byte_order must be 'II' or 'MM', got {byte_order!r}")
    e = "<" if byte_order == "II" else ">"
    ifd0_at = 8
    entries0 = list(tags0)
    if exif_tags:
        # two-pass: size IFD0 first to learn where the sub-IFD lands
        probe = _exif_ifd_bytes(
            entries0 + [(34665, 4, [0])], e, ifd0_at
        )
        exif_at = ifd0_at + len(probe)
        entries0 = entries0 + [(34665, 4, [exif_at])]
    ifd0 = _exif_ifd_bytes(entries0, e, ifd0_at)
    out = byte_order.encode() + struct.pack(e + "HI", 42, ifd0_at) + ifd0
    if exif_tags:
        assert len(out) == exif_at
        out += _exif_ifd_bytes(list(exif_tags), e, exif_at)
    return b"Exif\x00\x00" + out


def jpeg_with_exif(jpeg: bytes, app1_payload: bytes) -> bytes:
    """Splice an APP1 segment right after SOI (the Exif placement
    rule)."""
    import struct

    if jpeg[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    seg = b"\xff\xe1" + struct.pack(">H", 2 + len(app1_payload)) + app1_payload
    return jpeg[:2] + seg + jpeg[2:]


def _exif_walk_ifd(b: bytes, e: str, ifd_at: int, label: str):
    """Yield (tag, type, value_string) rows from one IFD; follows no
    pointers itself (the caller chases ExifIFDPointer)."""
    import struct

    (n,) = struct.unpack(e + "H", b[ifd_at : ifd_at + 2])
    rows = []
    for i in range(n):
        at = ifd_at + 2 + i * 12
        tag, typ, count = struct.unpack(e + "HHI", b[at : at + 8])
        field = b[at + 8 : at + 12]
        if typ == 2:
            size = count
        elif typ == 3:
            size = 2 * count
        elif typ == 4:
            size = 4 * count
        elif typ == 5:
            size = 8 * count
        else:
            raise ValueError(f"{label}: unsupported EXIF type {typ}")
        if size <= 4:
            raw = field[:size]
        else:
            (off,) = struct.unpack(e + "I", field)
            raw = b[off : off + size]
            if len(raw) != size:
                raise ValueError(f"{label}: truncated EXIF value for tag {tag}")
        if typ == 2:
            val = raw.rstrip(b"\x00").decode("ascii", "replace")
        elif typ == 3:
            vals = struct.unpack(e + "H" * count, raw)
            val = ",".join(str(v) for v in vals)
        elif typ == 4:
            vals = struct.unpack(e + "I" * count, raw)
            val = ",".join(str(v) for v in vals)
        else:
            parts = struct.unpack(e + "II" * count, raw)
            val = ",".join(
                f"{parts[2 * i]}/{parts[2 * i + 1]}" for i in range(count)
            )
        rows.append((tag, typ, val))
    return rows


def exif_extract(content: bytes, label: str = "asset"):
    """Extract EXIF metadata WITHOUT decoding pixels (the typed-metadata
    ingest step): accepts a JPEG (APP1 'Exif\\x00\\x00' segment located
    by a marker walk) or a bare TIFF; walks IFD0 and, when present, the
    Exif sub-IFD pointed to by tag 34665. Returns rows of
    (ifd, tag_id, tag_name, tag_type, value)."""
    import struct

    b = bytes(content)
    if b[:2] == b"\xff\xd8":
        i = 2
        tiff = None
        while i + 4 <= len(b):
            if b[i] != 0xFF:
                break
            marker = b[i + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            (seglen,) = struct.unpack(">H", b[i + 2 : i + 4])
            if marker == 0xE1 and b[i + 4 : i + 10] == b"Exif\x00\x00":
                tiff = b[i + 10 : i + 2 + seglen]
                break
            if marker == 0xDA:
                break
            i += 2 + seglen
        if tiff is None:
            raise ValueError(f"{label}: JPEG carries no Exif APP1 segment")
        b = tiff
    if b[:2] not in (b"II", b"MM"):
        raise ValueError(f"{label}: no TIFF header in EXIF payload")
    e = "<" if b[:2] == b"II" else ">"
    magic, ifd0_at = struct.unpack(e + "HI", b[2:8])
    if magic != 42:
        raise ValueError(f"{label}: bad TIFF magic {magic} in EXIF payload")
    rows = []
    exif_at = None
    for tag, typ, val in _exif_walk_ifd(b, e, ifd0_at, label):
        if tag == 34665:
            exif_at = int(val)
            continue
        rows.append(
            ("IFD0", tag, _EXIF_TAG_NAMES.get(tag, f"tag_{tag}"),
             _EXIF_TYPE_NAMES[typ], val)
        )
    if exif_at is not None:
        for tag, typ, val in _exif_walk_ifd(b, e, exif_at, label):
            rows.append(
                ("Exif", tag, _EXIF_TAG_NAMES.get(tag, f"tag_{tag}"),
                 _EXIF_TYPE_NAMES[typ], val)
            )
    return rows


def exif_metadata_rows(assets: DataFrame) -> DataFrame:
    """1→N EXIF extraction over Arrow batches: (asset_id, content) →
    one row per metadata tag (asset_id, ifd, tag_id, tag_name,
    tag_type, value) — pixels are never touched, which is the point:
    a 100 TB ingest scan reads headers, not images (catalog
    ``multimodal_exif_metadata``)."""
    spark = assets.sparkSession
    _ship_package(spark)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pipes_spark.operators.multimodal import exif_extract

        for pdf in batches:
            out = {
                "asset_id": [], "ifd": [], "tag_id": [], "tag_name": [],
                "tag_type": [], "value": [],
            }
            for aid, content in zip(pdf["asset_id"], pdf["content"]):
                # emit per-asset rows already in (ifd, tag_id) order — the
                # catalog query's output order contract ("Exif" < "IFD0"
                # in plain string order), so a range-sorted input needs no
                # final orderBy over the extraction (same row multiset)
                for ifd, tag, name, typ, val in sorted(
                    exif_extract(content, label=f"asset {aid}"),
                    key=lambda r: (r[0], r[1]),
                ):
                    out["asset_id"].append(int(aid))
                    out["ifd"].append(ifd)
                    out["tag_id"].append(int(tag))
                    out["tag_name"].append(name)
                    out["tag_type"].append(typ)
                    out["value"].append(val)
            yield pd.DataFrame(out)

    return assets.mapInPandas(
        gen,
        "asset_id bigint, ifd string, tag_id int, tag_name string, "
        "tag_type string, value string",
    )


def encode_exif_jpeg_assets(
    df: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Arrow-batched EXIF-bearing JPEG encode: per id, an 8×8 JPEG with
    an APP1 Exif segment holding a deterministic tag ladder (byte order
    by id parity — the extractor must honor 'MM' tag reads to
    reproduce the same value strings)."""
    spark = df.sparkSession
    _ship_package(spark)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from pipes_spark.operators.multimodal import (
            exif_app1_payload,
            jpeg_encode_gray,
            jpeg_with_exif,
        )

        for pdf in batches:
            content = []
            for i in pdf[id_col]:
                i = int(i)
                base = jpeg_encode_gray(
                    np.full((8, 8), i % 256, np.uint8)
                )
                tags0 = [
                    (271, 2, f"maker_{i % 5}"),
                    (272, 2, f"model_{i % 7}"),
                    (274, 3, [i % 8 + 1]),
                    (306, 2, f"2021:{i % 12 + 1:02d}:{i % 28 + 1:02d} "
                             f"10:30:{i % 60:02d}"),
                    (282, 5, [(72 + (i % 4) * 72, 1)]),
                ]
                exif_tags = [
                    (33434, 5, [(1, 60 + i % 200)]),
                    (34855, 3, [100 * (1 + i % 8)]),
                    (40962, 4, [8]),
                    (40963, 4, [8]),
                ]
                order = "II" if i % 2 == 0 else "MM"
                content.append(
                    jpeg_with_exif(
                        base, exif_app1_payload(tags0, exif_tags, order)
                    )
                )
            yield pd.DataFrame(
                {"asset_id": pdf[id_col].astype("int64"), "content": content}
            )

    return df.select(id_col).mapInPandas(
        gen, "asset_id bigint, content binary"
    )


def encode_png_filtered_assets(
    df: DataFrame,
    id_col: str = "doc_id",
    width_col: str = "width",
    height_col: str = "height",
    mode_col: str = "filter_mode",
    interlace_col: str = "interlaced",
) -> DataFrame:
    """Arrow-batched general-profile PNG encode: (id, width, height,
    filter_mode '0'..'4'|'adaptive', interlaced bool) → (id, content)
    over the standard per-pixel lattice."""
    spark = df.sparkSession
    _ship_package(spark)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from pipes_spark.operators.multimodal import png_encode_filtered

        for pdf in batches:
            content = []
            for i, w, h, m, il in zip(
                pdf[id_col], pdf[width_col], pdf[height_col],
                pdf[mode_col], pdf[interlace_col],
            ):
                x = np.arange(int(w), dtype=np.int64)[None, :]
                y = np.arange(int(h), dtype=np.int64)[:, None]
                px = ((int(i) * 7 + x * 11 + y * 13) % 256).astype(np.uint8)
                content.append(png_encode_filtered(px, str(m), bool(il)))
            yield pd.DataFrame(
                {"asset_id": pdf[id_col].astype("int64"), "content": content}
            )

    return df.select(
        id_col, width_col, height_col, mode_col, interlace_col
    ).mapInPandas(gen, "asset_id bigint, content binary")


def _subtitle_ts_ms(ts: str, sep: str, label: str) -> int:
    """Parse 'HH:MM:SS<sep>mmm' (SRT uses ',', WebVTT '.'; VTT hours
    optional) to milliseconds."""
    parts = ts.strip().split(":")
    if len(parts) == 2:  # VTT MM:SS.mmm short form
        parts = ["0"] + parts
    if len(parts) != 3 or sep not in parts[2]:
        raise ValueError(f"{label}: bad subtitle timestamp {ts!r}")
    sec, ms = parts[2].split(sep)
    return (
        int(parts[0]) * 3600_000 + int(parts[1]) * 60_000
        + int(sec) * 1000 + int(ms)
    )


def _subtitle_fmt_ts(ms: int, sep: str) -> str:
    h, rem = divmod(ms, 3600_000)
    m, rem = divmod(rem, 60_000)
    s, frac = divmod(rem, 1000)
    return f"{h:02d}:{m:02d}:{s:02d}{sep}{frac:03d}"


def srt_render(cues) -> str:
    """Render [(start_ms, end_ms, text)] as SubRip: 1-based index line,
    comma-millisecond timestamps, blank-line separated blocks."""
    out = []
    for i, (s, e, text) in enumerate(cues, 1):
        out.append(
            f"{i}\n{_subtitle_fmt_ts(s, ',')} --> {_subtitle_fmt_ts(e, ',')}"
            f"\n{text}"
        )
    return "\n\n".join(out) + "\n"


def vtt_render(cues) -> str:
    """Render [(start_ms, end_ms, text)] as WebVTT: the WEBVTT magic, a
    NOTE block (parsers must skip it), dot-millisecond timestamps with
    a position setting after the arrow (parsers must ignore it)."""
    out = ["WEBVTT", "", "NOTE generated fixture", ""]
    for s, e, text in cues:
        out.append(
            f"{_subtitle_fmt_ts(s, '.')} --> {_subtitle_fmt_ts(e, '.')} "
            f"position:50%\n{text}"
        )
        out.append("")
    return "\n".join(out)


def subtitle_parse(text: str, label: str = "asset"):
    """Parse SubRip OR WebVTT cue text (sniffed on the WEBVTT magic) to
    [(cue_no, start_ms, end_ms, text)]: SRT numeric-index blocks with
    comma timestamps; VTT header/NOTE/STYLE block skipping, optional
    cue identifiers, dot timestamps, cue settings after the arrow
    ignored, multi-line payloads joined with newlines."""
    lines = text.replace("\r\n", "\n").split("\n")
    is_vtt = bool(lines) and lines[0].startswith("WEBVTT")
    sep = "." if is_vtt else ","
    cues = []
    i = 1 if is_vtt else 0
    n = len(lines)
    while i < n:
        if not lines[i].strip():
            i += 1
            continue
        if is_vtt and lines[i].split(" ")[0] in ("NOTE", "STYLE", "REGION"):
            while i < n and lines[i].strip():
                i += 1
            continue
        # optional identifier line (SRT index / VTT cue id)
        if "-->" not in lines[i]:
            i += 1
            if i >= n or "-->" not in lines[i]:
                raise ValueError(f"{label}: cue block without a timing line")
        timing = lines[i]
        i += 1
        left, right = timing.split("-->")
        right = right.strip().split(" ")[0]  # drop VTT cue settings
        start = _subtitle_ts_ms(left, sep, label)
        end = _subtitle_ts_ms(right, sep, label)
        if end < start:
            raise ValueError(f"{label}: cue ends before it starts")
        payload = []
        while i < n and lines[i].strip():
            payload.append(lines[i])
            i += 1
        cues.append((len(cues) + 1, start, end, "\n".join(payload)))
    return cues


def subtitle_cue_rows(
    assets: DataFrame, id_col: str = "asset_id", text_col: str = "content"
) -> DataFrame:
    """1→N subtitle extraction over Arrow batches: (id, subtitle text)
    → one row per cue (asset_id, cue_no, start_ms, end_ms, duration_ms,
    cue_text) — the video-text alignment step of a multimodal training
    pipeline (catalog ``multimodal_subtitle_cues``)."""
    spark = assets.sparkSession
    _ship_package(spark)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pipes_spark.operators.multimodal import subtitle_parse

        for pdf in batches:
            out = {
                "asset_id": [], "cue_no": [], "start_ms": [], "end_ms": [],
                "duration_ms": [], "cue_text": [],
            }
            for aid, text in zip(pdf[id_col], pdf[text_col]):
                for no, s, e, t in subtitle_parse(
                    str(text), label=f"asset {aid}"
                ):
                    out["asset_id"].append(int(aid))
                    out["cue_no"].append(int(no))
                    out["start_ms"].append(int(s))
                    out["end_ms"].append(int(e))
                    out["duration_ms"].append(int(e - s))
                    out["cue_text"].append(t)
            yield pd.DataFrame(out)

    return assets.mapInPandas(
        gen,
        "asset_id bigint, cue_no int, start_ms bigint, end_ms bigint, "
        "duration_ms bigint, cue_text string",
    )


def encode_subtitle_assets(
    df: DataFrame, id_col: str = "doc_id", cues_col: str = "n_cues"
) -> DataFrame:
    """Arrow-batched subtitle fixture encode: per id, ``n_cues`` cues at
    deterministic offsets (start = id·1000 + i·2000 ms, duration 1500 +
    (i % 3)·200 ms, text 'cue <id>_<i>'), rendered as SubRip for even
    ids and WebVTT (with a NOTE block and cue settings the parser must
    skip) for odd."""
    spark = df.sparkSession
    _ship_package(spark)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pipes_spark.operators.multimodal import srt_render, vtt_render

        for pdf in batches:
            content = []
            for i, nc in zip(pdf[id_col], pdf[cues_col]):
                i, nc = int(i), int(nc)
                cues = [
                    (
                        i * 1000 + c * 2000,
                        i * 1000 + c * 2000 + 1500 + (c % 3) * 200,
                        f"cue {i}_{c}",
                    )
                    for c in range(nc)
                ]
                content.append(
                    srt_render(cues) if i % 2 == 0 else vtt_render(cues)
                )
            yield pd.DataFrame(
                {"asset_id": pdf[id_col].astype("int64"), "content": content}
            )

    return df.select(id_col, cues_col).mapInPandas(
        gen, "asset_id bigint, content string"
    )


def image_ahash(assets: DataFrame, grid: int = 8) -> DataFrame:
    """Average-hash (aHash) over REAL decoded pixels — the perceptual
    dedup primitive, now codec-INDEPENDENT: the same picture stored as
    PNG, GIF, or (losslessly-representable) JPEG hashes identically, so
    near-dup clustering catches re-encoded copies across formats
    (catalog ``multimodal_cross_codec_ahash`` proves that under the
    driver's hash gate). Per asset: decode via :func:`decode_image_gray`,
    average-pool to a grid×grid cell matrix (cell (r,c) spans rows
    ⌊r·h/g⌋..⌊(r+1)·h/g⌋ — exact block means when dims are multiples of
    g), threshold each cell against the mean of cell means, and emit the
    row-major bit string. Returns (asset_id, format, ahash_bits string)
    — a string so the 64-bit pattern is engine-portable with no sign-bit
    arithmetic."""
    spark = assets.sparkSession
    _ship_package(spark)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from pipes_spark.operators.multimodal import (
            decode_image_gray,
            sniff_image_header,
        )

        bit_chars = np.array(["0", "1"])

        def pool(px):
            # whole-image block means via two reduceat passes (r12,
            # guide §4.2: 2 vectorized calls replace grid² python-loop
            # .mean() slices). Boundaries ⌊r·h/g⌋ match the old slices
            # exactly; pixel values are small integers, so the float64
            # block sums are exact in any summation order — bit-identical
            # cells.
            h, w = px.shape
            rb = np.arange(grid) * h // grid
            cb = np.arange(grid) * w // grid
            sums = np.add.reduceat(np.add.reduceat(px, rb, axis=0), cb, axis=1)
            counts = np.outer(np.diff(np.append(rb, h)), np.diff(np.append(cb, w)))
            return sums / counts

        for pdf in batches:
            out = {"asset_id": [], "format": [], "ahash_bits": []}
            for aid, content in zip(pdf["asset_id"], pdf["content"]):
                b = bytes(content)
                fmt, *_ = sniff_image_header(b)
                px = decode_image_gray(b).astype(np.float64)
                cells = pool(px)
                bits = "".join(bit_chars[(cells.ravel() > cells.mean()).astype(np.intp)])
                out["asset_id"].append(int(aid))
                out["format"].append(fmt)
                out["ahash_bits"].append(bits)
            yield pd.DataFrame(out)

    return assets.mapInPandas(
        gen, "asset_id bigint, format string, ahash_bits string"
    )


def encode_image_assets(
    df: DataFrame,
    id_col: str = "doc_id",
    width_col: str = "width",
    height_col: str = "height",
    codec_col: str = "codec",
    seed_col: str | None = None,
    seed_mul: int = 1,
    cell_mul: int = 1,
) -> DataFrame:
    """Arrow-batched encode of the SAME block-constant grayscale content
    (:func:`block_gray_lattice`'s contract; unit multipliers =
    :func:`jpeg_block_gray`) through a per-row choice of codec
    ('png' | 'gif' | 'jpeg') — the fixture generator behind the
    cross-codec dedup gates: identical pixels, three different byte
    streams. ``seed_col`` decouples the content seed from the asset id so
    near-duplicate pairs can be PLANTED (two ids sharing a seed get
    identical pixels under different codecs — the phash-pairs gate)."""
    spark = df.sparkSession
    _ship_package(spark)
    seed_col = seed_col or id_col

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pipes_spark.operators.multimodal import (
            block_gray_lattice,
            encode_pixels,
        )

        for pdf in batches:
            blobs = []
            for s, w, h, codec in zip(
                pdf[seed_col], pdf[width_col], pdf[height_col], pdf[codec_col]
            ):
                px = block_gray_lattice(
                    int(s), int(w), int(h), seed_mul, cell_mul
                )
                blobs.append(encode_pixels(px, str(codec)))
            yield pd.DataFrame(
                {
                    "asset_id": pdf[id_col].astype("int64"),
                    "content": blobs,
                }
            )

    cols = [id_col, width_col, height_col, codec_col]
    if seed_col != id_col:
        cols.append(seed_col)
    return df.select(*cols).mapInPandas(gen, "asset_id bigint, content binary")


def png_encode_array(px) -> bytes:
    """Filter-0 grayscale PNG of an arbitrary (h, w) uint8 array (the
    module-level form of the encode inside :func:`encode_image_assets`)."""
    import struct
    import zlib as _z

    import numpy as np

    h, w = px.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    scan = np.zeros((h, w + 1), dtype=np.uint8)
    scan[:, 1:] = px
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", _z.compress(scan.tobytes(), 6))
        + _png_chunk(b"IEND", b"")
    )


def gif_encode_array(px) -> bytes:
    """GIF89a of an arbitrary (h, w) uint8 array under the 256-entry
    grayscale-identity global color table (palette red channel == pixel
    value, the :func:`gif_decode_gray` contract)."""
    import struct

    h, w = px.shape
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0xF7, 0, 0)
    out += bytes(j for j in range(256) for _ in range(3))
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
    out.append(8)
    lzw = _gif_lzw_encode(px.tobytes(), 8)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)


def encode_pixels(px, codec: str) -> bytes:
    """Encode one (h, w) uint8 grayscale array under the named codec —
    the shared dispatch behind the fixture generators."""
    if codec == "png":
        return png_encode_array(px)
    if codec == "gif":
        return gif_encode_array(px)
    if codec == "jpeg":
        return jpeg_encode_gray(px)
    raise ValueError(f"unknown codec {codec!r}")


def encode_pixel_assets(
    df: DataFrame,
    id_col: str = "doc_id",
    seed_col: str = "seed",
    delta_col: str = "delta",
    codec_col: str = "codec",
    width: int = 64,
    height: int = 64,
    seed_mul: int = 2557,
    pos_mul: int = 31,
    hit_mod: int = 331,
) -> DataFrame:
    """Arrow-batched encode of PER-PIXEL (not block-constant) content
    through a per-row LOSSLESS codec choice ('png' | 'gif'): row-major
    pixel p of asset (seed, delta) is
    ``(seed·seed_mul + p·(pos_mul + 2·(seed % 13)) + delta·[p % hit_mod
    == 0]) % 256`` — the seed-dependent position multiplier breaks the
    constant-shift symmetry an affine-in-p lattice would have (where
    every seed pair lands within a few Hamming bits), so only ids
    SHARING a seed are near-duplicates; ``delta`` perturbs a sparse
    pixel lattice so same-seed pairs are NEAR (not exact) duplicates.
    The fixture generator behind the real-mode phash gate (catalog
    ``multimodal_phash_pairs``); the oracle recomputes the same lattice
    closed-form."""
    spark = df.sparkSession
    _ship_package(spark)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from pipes_spark.operators.multimodal import encode_pixels

        p = np.arange(width * height, dtype=np.int64)
        hits = (p % hit_mod == 0).astype(np.int64)
        for pdf in batches:
            blobs = []
            for s, dlt, codec in zip(
                pdf[seed_col], pdf[delta_col], pdf[codec_col]
            ):
                mul = pos_mul + 2 * (int(s) % 13)
                v = (int(s) * seed_mul + p * mul + int(dlt) * hits) % 256
                px = v.astype(np.uint8).reshape(height, width)
                blobs.append(encode_pixels(px, str(codec)))
            yield pd.DataFrame(
                {
                    "asset_id": pdf[id_col].astype("int64"),
                    "content": blobs,
                }
            )

    return df.select(id_col, seed_col, delta_col, codec_col).mapInPandas(
        gen, "asset_id bigint, content binary"
    )


def _jpeg_block_symbols(blk, prev_dc: int):
    """Module-level symbol stream for one zigzag block (the color
    encoder's twin of the closure inside :func:`jpeg_encode_gray`):
    returns (new_prev_dc, [(table, symbol, size, bits), ...])."""
    syms = []
    size, bits = _jpeg_category(int(blk[0]) - prev_dc)
    syms.append(("dc", size, size, bits))
    run = 0
    last_nz = 0
    for k in range(63, 0, -1):
        if blk[k]:
            last_nz = k
            break
    for k in range(1, last_nz + 1):
        v = int(blk[k])
        if v == 0:
            run += 1
            continue
        while run >= 16:
            syms.append(("ac", 0xF0, 0, 0))
            run -= 16
        size, bits = _jpeg_category(v)
        if size > 10:
            raise ValueError("AC coefficient magnitude beyond category 10")
        syms.append(("ac", (run << 4) | size, size, bits))
        run = 0
    if last_nz < 63:
        syms.append(("ac", 0x00, 0, 0))
    return int(blk[0]), syms


def jpeg_encode_color(
    rgb,
    subsample: str = "420",
    qtable_luma=None,
    qtable_chroma=None,
    restart_interval: int = 0,
) -> bytes:
    """REAL baseline COLOR JPEG encode (round 10): RGB (h, w, 3) uint8 →
    JFIF YCbCr, chroma downsampled per ``subsample`` ("444" = none, "422" =
    horizontal 2×1 box mean, "420" = 2×2 box mean — the ubiquitous web
    layout), interleaved MCU
    entropy coding with per-component quantization (table 0 luma /
    table 1 chroma) and Huffman selectors (DHT ids 0/1), optional
    DRI/RSTn restarts. Default quant tables keep the DC quantum at 8 so
    GRAY-valued RGB content (Cb = Cr = 128 exactly) round-trips
    bit-exactly — the hash-gate contract; chroma-rich content is the
    standard lossy path, pytest-held against the quantize→dequantize
    reference."""
    import struct

    import numpy as np

    px = np.asarray(rgb, dtype=np.uint8)
    if px.ndim != 3 or px.shape[2] != 3:
        raise ValueError("jpeg_encode_color expects (h, w, 3)")
    if subsample not in ("444", "422", "420"):
        raise ValueError("subsample must be '444', '422', or '420'")
    h, w = px.shape[:2]
    hs = 2 if subsample in ("420", "422") else 1
    vs = 2 if subsample == "420" else 1
    mcus_x = (w + 8 * hs - 1) // (8 * hs)
    mcus_y = (h + 8 * vs - 1) // (8 * vs)
    ph, pw = mcus_y * 8 * vs, mcus_x * 8 * hs
    padded = np.pad(
        px.astype(np.float64), ((0, ph - h), (0, pw - w), (0, 0)), mode="edge"
    )
    r_, g_, b_ = padded[..., 0], padded[..., 1], padded[..., 2]
    y = 0.299 * r_ + 0.587 * g_ + 0.114 * b_
    cb = 128.0 - 0.168736 * r_ - 0.331264 * g_ + 0.5 * b_
    cr = 128.0 + 0.5 * r_ - 0.418688 * g_ - 0.081312 * b_
    if vs == 2:
        cb = cb.reshape(ph // 2, 2, pw).mean(axis=1)
        cr = cr.reshape(ph // 2, 2, pw).mean(axis=1)
    if hs == 2:
        cb = cb.reshape(cb.shape[0], pw // 2, 2).mean(axis=2)
        cr = cr.reshape(cr.shape[0], pw // 2, 2).mean(axis=2)

    ql = np.asarray(
        qtable_luma if qtable_luma is not None else [8] + [16] * 63,
        dtype=np.int32,
    ).reshape(8, 8)
    qc = np.asarray(
        qtable_chroma if qtable_chroma is not None else [8] + [16] * 63,
        dtype=np.int32,
    ).reshape(8, 8)

    m = _jpeg_dct_matrix()

    def to_blocks(plane, q):
        bh, bw_ = plane.shape[0] // 8, plane.shape[1] // 8
        blocks = (
            plane.reshape(bh, 8, bw_, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
            - 128.0
        )
        coef = np.einsum("ux,nxy,vy->nuv", m, blocks, m)
        quant = np.round(coef / q[None, :, :]).astype(np.int64).reshape(-1, 64)
        return quant[:, _JPEG_ZIGZAG].reshape(bh, bw_, 64)

    zz_y = to_blocks(y, ql)
    zz_cb = to_blocks(cb, qc)
    zz_cr = to_blocks(cr, qc)

    dc_codes = _jpeg_canonical_codes(_JPEG_DC_BITS, _JPEG_DC_VALS)
    ac_codes = _jpeg_canonical_codes(_JPEG_AC_BITS, _JPEG_AC_VALS)

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tid, q in ((0, ql), (1, qc)):
        zzq = q.reshape(-1)[_JPEG_ZIGZAG]
        out += b"\xff\xdb" + struct.pack(">H", 67)
        out.append(tid)
        out += bytes(int(v) for v in zzq)
    out += b"\xff\xc0" + struct.pack(">HBHHB", 17, 8, h, w, 3)
    out += bytes([1, (hs << 4) | vs, 0])  # Y
    out += bytes([2, 0x11, 1])  # Cb
    out += bytes([3, 0x11, 1])  # Cr
    for tid in (0, 1):  # same fixed tables under both ids
        for cls, bits, vals in (
            (0x00, _JPEG_DC_BITS, _JPEG_DC_VALS),
            (0x10, _JPEG_AC_BITS, _JPEG_AC_VALS),
        ):
            out += b"\xff\xc4" + struct.pack(">H", 19 + len(vals))
            out.append(cls | tid)
            out += bytes(bits) + bytes(vals)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += b"\xff\xda" + struct.pack(">HB", 12, 3)
    out += bytes([1, 0x00, 2, 0x11, 3, 0x11, 0, 0x3F, 0])

    bw = _JpegBitWriter()
    prev = [0, 0, 0]
    rst = 0
    for midx in range(mcus_y * mcus_x):
        if restart_interval and midx and midx % restart_interval == 0:
            bw.flush()
            out += bw.out
            bw = _JpegBitWriter()
            out += bytes([0xFF, 0xD0 + (rst % 8)])
            rst += 1
            prev = [0, 0, 0]
        my, mx = divmod(midx, mcus_x)
        mcu_blocks = []
        for v in range(vs):
            for hh in range(hs):
                mcu_blocks.append((0, zz_y[my * vs + v, mx * hs + hh]))
        mcu_blocks.append((1, zz_cb[my, mx]))
        mcu_blocks.append((2, zz_cr[my, mx]))
        for ci, blk in mcu_blocks:
            prev[ci], syms = _jpeg_block_symbols(blk, prev[ci])
            for tbl, sym, size, bits in syms:
                ln, code = (dc_codes if tbl == "dc" else ac_codes)[sym]
                bw.write(code, ln)
                if size:
                    bw.write(bits, size)
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


def encode_jpeg_color_assets(
    df: DataFrame,
    id_col: str = "doc_id",
    width_col: str = "width",
    height_col: str = "height",
    subsample_col: str = "subsample",
) -> DataFrame:
    """Arrow-batched REAL color JPEG encode of gray-valued RGB
    block-constant content (R = G = B = the :func:`jpeg_block_gray`
    lattice, so Cb = Cr = 128 exactly and the lossy pipeline is
    bit-exact): (id, width, height, subsample '420'|'444') →
    (id, content binary)."""
    spark = df.sparkSession
    _ship_package(spark)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from pipes_spark.operators.multimodal import (
            jpeg_block_gray,
            jpeg_encode_color,
        )

        for pdf in batches:
            blobs = []
            for i, w, h, sub in zip(
                pdf[id_col], pdf[width_col], pdf[height_col], pdf[subsample_col]
            ):
                gray = jpeg_block_gray(int(i), int(w), int(h))
                rgb = np.stack([gray] * 3, axis=2)
                blobs.append(jpeg_encode_color(rgb, str(sub)))
            yield pd.DataFrame(
                {"asset_id": pdf[id_col].astype("int64"), "content": blobs}
            )

    return df.select(id_col, width_col, height_col, subsample_col).mapInPandas(
        gen, "asset_id bigint, content binary"
    )


def jpeg_color_decode_stats(assets: DataFrame) -> DataFrame:
    """REAL color JPEG decode over Arrow batches — the full
    :func:`jpeg_decode` chain (interleaved MCUs, chroma upsampling,
    YCbCr→RGB) plus a checksum over ALL channels: (asset_id, format,
    width, height, n_components, n_pixels, pixel_sum). A hash-match
    against the closed-form oracle certifies the color pipeline
    end to end (catalog ``multimodal_jpeg_color_roundtrip``)."""
    spark = assets.sparkSession
    _ship_package(spark)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from pipes_spark.operators.multimodal import (
            jpeg_decode,
            sniff_image_header,
        )

        for pdf in batches:
            out = {
                "asset_id": [],
                "format": [],
                "width": [],
                "height": [],
                "n_components": [],
                "n_pixels": [],
                "pixel_sum": [],
            }
            for aid, content in zip(pdf["asset_id"], pdf["content"]):
                b = bytes(content)
                fmt, _w, _h, _d, ncomp = sniff_image_header(b)
                if fmt != "jpeg":
                    raise ValueError(f"asset {aid}: not a JPEG")
                px = jpeg_decode(b)
                if px.ndim != 3:
                    raise ValueError(f"asset {aid}: expected a color JPEG")
                out["asset_id"].append(int(aid))
                out["format"].append(fmt)
                out["width"].append(int(px.shape[1]))
                out["height"].append(int(px.shape[0]))
                out["n_components"].append(int(ncomp))
                out["n_pixels"].append(int(px.shape[0] * px.shape[1]))
                out["pixel_sum"].append(int(px.sum(dtype=np.int64)))
            yield pd.DataFrame(out)

    return assets.mapInPandas(
        gen,
        "asset_id bigint, format string, width int, height int, "
        "n_components int, n_pixels bigint, pixel_sum bigint",
    )


# --------------------------------------------------------------------------
# PROGRESSIVE JPEG (SOF2) — spectral selection + successive approximation,
# from T.81 sections G.1/G.2. The four scan kinds (DC first, DC
# refinement, AC first with EOB runs, AC refinement with correction
# bits) are implemented on BOTH sides; the encoder's default scan script
# exercises all four. Since round 11 COLOR progressive is in scope too:
# interleaved DC scans over the MCU grid (per-component predictors,
# padding blocks entropy-coded per spec) + non-interleaved per-component
# AC scans (jpeg_encode_progressive_color / _jpeg_decode_prog_dc_interleaved).
# --------------------------------------------------------------------------


def _jpeg_emit_dc_first(zz, al, bw, dc_codes):
    """DC-first scan (Ss=Se=0, Ah=0): sequential-style DIFF coding of the
    point-transformed DC (arithmetic shift — T.81 G.1.2.1)."""
    prev = 0
    for blk in zz:
        v = int(blk[0]) >> al
        size, bits = _jpeg_category(v - prev)
        prev = v
        ln, code = dc_codes[size]
        bw.write(code, ln)
        if size:
            bw.write(bits, size)


def _jpeg_emit_dc_refine(zz, al, bw):
    """DC refinement (Ah=Al+1): one raw bit per block — bit Al of DC."""
    for blk in zz:
        bw.write((int(blk[0]) >> al) & 1, 1)


def _pt_ac(v, al):
    """AC point transform: divide by 2^Al truncating toward ZERO
    (T.81 G.1.2.2 — explicitly NOT an arithmetic shift)."""
    return -((-v) >> al) if v < 0 else v >> al


def _jpeg_emit_ac_first(zz, ss, se, al, bw, ac_codes):
    """AC-first scan (Ah=0): sequential run/size coding within the band
    plus cross-block EOB runs (EOBn symbols r<<4 with r appended bits)."""
    import numpy as np

    eobrun = 0

    def flush_eob():
        nonlocal eobrun
        if not eobrun:
            return
        nbits = eobrun.bit_length() - 1
        ln, code = ac_codes[nbits << 4]
        bw.write(code, ln)
        if nbits:
            bw.write(eobrun - (1 << nbits), nbits)
        eobrun = 0

    for blk in zz:
        # vectorized G.1.2.2 point transform (truncate toward zero)
        seg = np.asarray(blk[ss : se + 1], dtype=np.int64)
        t = np.where(seg < 0, -((-seg) >> al), seg >> al).tolist()
        last = -1
        for j in range(len(t) - 1, -1, -1):
            if t[j]:
                last = j
                break
        if last < 0:
            eobrun += 1
            if eobrun == 0x7FFF:
                flush_eob()
            continue
        flush_eob()
        run = 0
        for j in range(last + 1):
            v = t[j]
            if v == 0:
                run += 1
                continue
            while run >= 16:
                ln, code = ac_codes[0xF0]
                bw.write(code, ln)
                run -= 16
            size, bits = _jpeg_category(v)
            ln, code = ac_codes[(run << 4) | size]
            bw.write((code << size) | (bits & ((1 << size) - 1)), ln + size)
            run = 0
        if last < len(t) - 1:
            eobrun += 1
            if eobrun == 0x7FFF:
                flush_eob()
    flush_eob()


def _jpeg_emit_ac_refine(zz, ss, se, al, bw, ac_codes):
    """AC refinement (Ah=Al+1): newly-significant coefficients code as
    (run, 1) + sign bit over ZERO-HISTORY positions only; coefficients
    already nonzero contribute buffered CORRECTION bits emitted after
    the symbol that ends the run; end-of-band folds into EOB runs
    (T.81 G.1.2.3 / the cjpeg encode_mcu_AC_refine structure)."""
    import numpy as np

    eobrun = 0
    pending: list = []  # correction bits owed to the current EOB run

    def flush_eob():
        nonlocal eobrun
        if not eobrun:
            assert not pending
            return
        nbits = eobrun.bit_length() - 1
        ln, code = ac_codes[nbits << 4]
        bw.write(code, ln)
        if nbits:
            bw.write(eobrun - (1 << nbits), nbits)
        for b in pending:
            bw.write(b, 1)
        pending.clear()
        eobrun = 0

    for blk in zz:
        # vectorized G.1.2.2 point transform (truncate toward zero)
        seg = np.asarray(blk[ss : se + 1], dtype=np.int64)
        t = np.where(seg < 0, -((-seg) >> al), seg >> al).tolist()
        # eob = index of the LAST newly-significant coefficient; runs
        # beyond it fold into the EOB run instead of ZRLs (the
        # `r > 15 && k <= EOB` guard of cjpeg encode_mcu_AC_refine)
        eob = -1
        for j in range(len(t)):
            if abs(t[j]) == 1:
                eob = j
        run = 0
        corrections: list = []  # bits owed within the current run
        for j in range(len(t)):
            v = t[j]
            a = abs(v)
            if a == 0:
                run += 1
                continue
            # the ZRL check runs at EVERY nonzero coefficient (history
            # included) while still within EOB — a history coefficient
            # after a >15 run must flush the ZRL BEFORE buffering its
            # correction bit, or the decoder's skip-16 advance reads a
            # different correction-bit set than the encoder emitted
            while run > 15 and j <= eob:
                flush_eob()
                ln, code = ac_codes[0xF0]
                bw.write(code, ln)
                run -= 16
                for b in corrections:
                    bw.write(b, 1)
                corrections.clear()
            if a > 1:
                # history coefficient: correction bit, not counted in
                # zero runs (cjpeg encode_mcu_AC_refine invariant)
                corrections.append(a & 1)
                continue
            # newly significant (|t| == 1)
            flush_eob()
            ln, code = ac_codes[(run << 4) | 1]
            bw.write(code, ln)
            bw.write(1 if v > 0 else 0, 1)
            for b in corrections:
                bw.write(b, 1)
            corrections.clear()
            run = 0
        # trailing zero-history run and/or buffered correction bits:
        # this block's end-of-band joins the EOB run; its correction
        # bits are owed to whatever symbol flushes that run
        if run > 0 or corrections:
            eobrun += 1
            pending.extend(corrections)
            if eobrun == 0x7FFF:
                flush_eob()
    flush_eob()


def _jpeg_decode_prog_scan(data, start, coef, ss, se, ah, al, dc, ac, restart):
    """Decode ONE progressive (SOF2) scan's entropy data for a
    single-component image, updating the zigzag coefficient store
    in place — the four scan kinds of T.81 G.2 (DC first/refine, AC
    first with EOB runs, AC refine with correction bits; the
    djpeg decode_mcu_* structure). Returns the byte offset just past
    the scan's entropy data (positioned at the next marker)."""
    r = _JpegBitReader(data, start)
    n_blocks = coef.shape[0]
    eobrun = 0
    prev_dc = 0

    def resync():
        nonlocal prev_dc, eobrun
        m_ = r.align_to_marker()
        if not (0xD0 <= m_ <= 0xD7):
            raise ValueError(f"expected RSTn, got 0x{m_:02x}")
        prev_dc = 0
        eobrun = 0

    if ss == 0:  # DC scan (se must be 0)
        if se != 0:
            raise ValueError("DC scan with Se != 0")
        for b in range(n_blocks):
            if restart and b and b % restart == 0:
                resync()
            if ah == 0:  # first
                size = dc(r)
                prev_dc += _jpeg_extend(r.bits(size), size)
                coef[b, 0] = prev_dc << al
            else:  # refinement: one raw bit
                if r.bit():
                    coef[b, 0] |= 1 << al
    elif ah == 0:  # AC first
        for b in range(n_blocks):
            if restart and b and b % restart == 0:
                resync()
            if eobrun > 0:
                eobrun -= 1
                continue
            k = ss
            while k <= se:
                sym = ac(r)
                rr, s = sym >> 4, sym & 15
                if s:
                    k += rr
                    if k > se:
                        raise ValueError("AC run past end of band")
                    coef[b, k] = _jpeg_extend(r.bits(s), s) << al
                    k += 1
                else:
                    if rr == 15:
                        k += 16
                        continue
                    eobrun = (1 << rr) - 1
                    if rr:
                        eobrun += r.bits(rr)
                    break
    else:  # AC refinement
        p1 = 1 << al
        m1 = -(1 << al)
        for b in range(n_blocks):
            if restart and b and b % restart == 0:
                resync()
            k = ss
            if eobrun == 0:
                while k <= se:
                    sym = ac(r)
                    rr, s = sym >> 4, sym & 15
                    val = 0
                    if s:
                        if s != 1:
                            raise ValueError("refinement size must be 1")
                        val = p1 if r.bit() else m1
                    else:
                        if rr != 15:
                            eobrun = 1 << rr
                            if rr:
                                eobrun += r.bits(rr)
                            break
                        # rr == 15: ZRL — skip 16 zero-history coeffs
                    while k <= se:
                        if coef[b, k] != 0:
                            if r.bit() and not (coef[b, k] & p1):
                                coef[b, k] += p1 if coef[b, k] >= 0 else m1
                        else:
                            rr -= 1
                            if rr < 0:
                                break
                        k += 1
                    if s and k <= se:
                        coef[b, k] = val
                    k += 1
            if eobrun > 0:
                while k <= se:
                    if coef[b, k] != 0:
                        if r.bit() and not (coef[b, k] & p1):
                            coef[b, k] += p1 if coef[b, k] >= 0 else m1
                    k += 1
                eobrun -= 1

    # advance to the next marker (discard the final byte's 1-padding,
    # tolerate stuffed zero bytes)
    pos = r.pos
    while pos + 1 < len(data):
        if data[pos] == 0xFF and data[pos + 1] != 0x00:
            return pos
        pos += 1
    return len(data)


def _jpeg_decode_prog_dc_interleaved(
    data, start, stores, scomps, comps, cindex, dc_dec, ah, al, restart, w, h
):
    """Decode one INTERLEAVED progressive DC scan (round 11 — the scan
    kind only multi-component SOF2 streams have; T.81 G.2 with the B.2.3
    MCU ordering): MCU raster order, each component contributing its
    H×V blocks per MCU with its own DC predictor. The MCU grid includes
    the spec's padding blocks — they are entropy-decoded (the predictor
    and bit position depend on them) but stored only when inside the
    component's true block grid. Returns the offset just past the scan's
    entropy data."""
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
    r = _JpegBitReader(data, start)
    prev = [0] * len(scomps)
    cis = []
    for cid_s, _td, _ta in scomps:
        if cid_s not in cindex:
            raise ValueError("scan references unknown component")
        cis.append(cindex[cid_s])
    for midx in range(mcus_y * mcus_x):
        if restart and midx and midx % restart == 0:
            m_ = r.align_to_marker()
            if not (0xD0 <= m_ <= 0xD7):
                raise ValueError(f"expected RSTn, got 0x{m_:02x}")
            prev = [0] * len(scomps)
        my, mx = divmod(midx, mcus_x)
        for si, (cid_s, td, _ta) in enumerate(scomps):
            ci = cis[si]
            _cid, hi, vi, _tq = comps[ci]
            st = stores[ci]
            for v in range(vi):
                for hh in range(hi):
                    row, col = my * vi + v, mx * hi + hh
                    in_range = row < st.shape[0] and col < st.shape[1]
                    if ah == 0:  # first pass: Huffman-coded diff
                        size = dc_dec[td](r)
                        prev[si] += _jpeg_extend(r.bits(size), size)
                        if in_range:
                            st[row, col, 0] = prev[si] << al
                    else:  # refinement: one raw bit per block
                        if r.bit() and in_range:
                            st[row, col, 0] |= 1 << al
    pos = r.pos
    while pos + 1 < len(data):
        if data[pos] == 0xFF and data[pos + 1] != 0x00:
            return pos
        pos += 1
    return len(data)


def jpeg_encode_progressive(
    pixels,
    quality_qtable=None,
    scans=((0, 0, 0, 1), (1, 63, 0, 1), (0, 0, 1, 0), (1, 63, 1, 0)),
) -> bytes:
    """REAL PROGRESSIVE JPEG encode (SOF2, grayscale; round 10): the
    same quantized block DCTs as the baseline encoder, delivered as a
    SCAN SCRIPT of (Ss, Se, Ah, Al) spectral-selection / successive-
    approximation passes — the default script runs all four scan kinds
    (DC first at point transform 1, AC first at 1, then the DC and AC
    refinement passes), which is what real progressive encoders emit.
    The decoder side lives in :func:`jpeg_decode` (SOF2 path); pixel
    output equals the BASELINE decode of the same image exactly, since
    both reconstruct the identical quantized coefficients."""
    import struct

    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim != 2:
        raise ValueError("jpeg_encode_progressive expects a 2-D array")
    h, w = px.shape
    q = np.asarray(
        quality_qtable if quality_qtable is not None else [8] + [16] * 63,
        dtype=np.int32,
    ).reshape(8, 8)
    ph, pw = (h + 7) // 8 * 8, (w + 7) // 8 * 8
    padded = np.pad(px, ((0, ph - h), (0, pw - w)), mode="edge")
    blocks = (
        padded.reshape(ph // 8, 8, pw // 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(-1, 8, 8)
        .astype(np.float64)
        - 128.0
    )
    m = _jpeg_dct_matrix()
    coefs = np.einsum("ux,nxy,vy->nuv", m, blocks, m)
    quant = np.round(coefs / q[None, :, :]).astype(np.int64).reshape(-1, 64)
    zz = quant[:, _JPEG_ZIGZAG]

    # validate the scan script: every coefficient bit delivered once
    seen_dc = []
    seen_ac = []
    for ss, se, ah, al in scans:
        if ss == 0 and se != 0:
            raise ValueError("progressive scans cannot mix DC and AC")
        (seen_dc if ss == 0 else seen_ac).append((ss, se, ah, al))

    dc_codes = _jpeg_canonical_codes(_JPEG_DC_BITS, _JPEG_DC_VALS)
    ac_codes = _jpeg_canonical_codes(_JPEG_AC_BITS, _JPEG_AC_VALS)

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    zz_q = q.reshape(-1)[_JPEG_ZIGZAG]
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes(int(v) for v in zz_q)
    out += b"\xff\xc2" + struct.pack(">HBHHB", 11, 8, h, w, 1) + b"\x01\x11\x00"
    for cls, bits, vals in (
        (0x00, _JPEG_DC_BITS, _JPEG_DC_VALS),
        (0x10, _JPEG_AC_BITS, _JPEG_AC_VALS),
    ):
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(vals))
        out.append(cls)
        out += bytes(bits) + bytes(vals)

    for ss, se, ah, al in scans:
        out += b"\xff\xda" + struct.pack(">HB", 8, 1)
        out += bytes([1, 0x00, ss, se, (ah << 4) | al])
        bw = _JpegBitWriter()
        if ss == 0:
            if ah == 0:
                _jpeg_emit_dc_first(zz, al, bw, dc_codes)
            else:
                _jpeg_emit_dc_refine(zz, al, bw)
        elif ah == 0:
            _jpeg_emit_ac_first(zz, ss, se, al, bw, ac_codes)
        else:
            _jpeg_emit_ac_refine(zz, ss, se, al, bw, ac_codes)
        bw.flush()
        out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


#: the deep scan ladder the progressive gate's odd doc_ids use: split AC
#: bands + a 2-step successive-approximation descent for DC and both bands
_JPEG_PROG_DEEP_SCANS = (
    (0, 0, 0, 2), (1, 5, 0, 2), (6, 63, 0, 2),
    (0, 0, 2, 1), (1, 5, 2, 1), (6, 63, 2, 1),
    (0, 0, 1, 0), (1, 5, 1, 0), (6, 63, 1, 0),
)


def encode_jpeg_progressive_assets(
    df: DataFrame,
    id_col: str = "doc_id",
    width_col: str = "width",
    height_col: str = "height",
    deep_col: str | None = None,
) -> DataFrame:
    """Arrow-batched REAL progressive JPEG encode of block-constant
    grayscale content: (id, width, height[, deep]) → (id, content
    binary). ``deep_col`` (boolean) switches those images to the
    9-scan split-band successive-approximation ladder; default is the
    4-scan script — so BOTH real-world script shapes run under the
    gate."""
    spark = df.sparkSession
    _ship_package(spark)
    cols = [id_col, width_col, height_col]
    if deep_col is not None:
        cols.append(deep_col)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pipes_spark.operators.multimodal import (
            _JPEG_PROG_DEEP_SCANS,
            jpeg_block_gray,
            jpeg_encode_progressive,
        )

        for pdf in batches:
            deep = (
                pdf[deep_col] if deep_col is not None else [False] * len(pdf)
            )
            blobs = []
            for i, w, h, d in zip(
                pdf[id_col], pdf[width_col], pdf[height_col], deep
            ):
                px = jpeg_block_gray(int(i), int(w), int(h))
                kw = {"scans": _JPEG_PROG_DEEP_SCANS} if bool(d) else {}
                blobs.append(jpeg_encode_progressive(px, **kw))
            yield pd.DataFrame(
                {"asset_id": pdf[id_col].astype("int64"), "content": blobs}
            )

    return df.select(*cols).mapInPandas(
        gen, "asset_id bigint, content binary"
    )


#: deep progressive-color scan ladder (odd doc_ids in the gate): split
#: luma AC bands + a 2-step successive-approximation descent, with the
#: DC refinements INTERLEAVED — every scan kind including interleaved
#: refinement runs under the hash gate
_JPEG_PROG_COLOR_DEEP_SCANS = (
    ("all", 0, 0, 0, 2),
    (0, 1, 5, 0, 2), (0, 6, 63, 0, 2), (1, 1, 63, 0, 2), (2, 1, 63, 0, 2),
    ("all", 0, 0, 2, 1),
    (0, 1, 5, 2, 1), (0, 6, 63, 2, 1), (1, 1, 63, 2, 1), (2, 1, 63, 2, 1),
    ("all", 0, 0, 1, 0),
    (0, 1, 5, 1, 0), (0, 6, 63, 1, 0), (1, 1, 63, 1, 0), (2, 1, 63, 1, 0),
)


def encode_jpeg_progressive_color_assets(
    df: DataFrame,
    id_col: str = "doc_id",
    width_col: str = "width",
    height_col: str = "height",
    subsample_col: str = "subsample",
    deep_col: str | None = None,
) -> DataFrame:
    """Arrow-batched REAL progressive COLOR JPEG encode of gray-valued
    RGB block-constant content (R = G = B ⇒ Cb = Cr = 128 exactly ⇒
    bit-exact lossy pipeline): (id, width, height, subsample
    '420'|'422'|'444'[, deep]) → (id, content binary). ``deep_col``
    switches those images to the 15-scan split-band ladder."""
    spark = df.sparkSession
    _ship_package(spark)
    cols = [id_col, width_col, height_col, subsample_col]
    if deep_col is not None:
        cols.append(deep_col)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from pipes_spark.operators.multimodal import (
            _JPEG_PROG_COLOR_DEEP_SCANS,
            jpeg_block_gray,
            jpeg_encode_progressive_color,
        )

        for pdf in batches:
            deep = (
                pdf[deep_col] if deep_col is not None else [False] * len(pdf)
            )
            blobs = []
            for i, w, h, sub, d in zip(
                pdf[id_col], pdf[width_col], pdf[height_col],
                pdf[subsample_col], deep,
            ):
                gray = jpeg_block_gray(int(i), int(w), int(h))
                rgb = np.stack([gray] * 3, axis=2)
                kw = (
                    {"scans": _JPEG_PROG_COLOR_DEEP_SCANS} if bool(d) else {}
                )
                blobs.append(
                    jpeg_encode_progressive_color(rgb, str(sub), **kw)
                )
            yield pd.DataFrame(
                {"asset_id": pdf[id_col].astype("int64"), "content": blobs}
            )

    return df.select(*cols).mapInPandas(
        gen, "asset_id bigint, content binary"
    )


def jpeg_encode_progressive_color(
    rgb,
    subsample: str = "420",
    qtable_luma=None,
    qtable_chroma=None,
    scans=None,
) -> bytes:
    """REAL PROGRESSIVE COLOR JPEG encode (SOF2, three components;
    round 11 — closes the r10 'progressive COLOR' stub): the same
    YCbCr / chroma-subsample / quantized-DCT front end as
    :func:`jpeg_encode_color`, delivered as a progressive scan script —
    INTERLEAVED DC scans over the full MCU grid (per-component
    predictors, the scan kind grayscale progressive never exercises)
    plus NON-INTERLEAVED per-component AC scans over each component's
    true data units, with successive-approximation refinement passes for
    both. The default script is the canonical 8-scan shape
    (DC-first@Al=1 interleaved → per-component AC-first@Al=1 →
    DC-refine interleaved → per-component AC-refine). ``scans`` entries
    are (comp, Ss, Se, Ah, Al) with comp='all' for interleaved DC or a
    component index 0/1/2. Decodes through :func:`jpeg_decode`'s SOF2
    path to pixels IDENTICAL to the baseline color encode of the same
    image (both reconstruct the same quantized coefficients)."""
    import struct

    import numpy as np

    px = np.asarray(rgb, dtype=np.uint8)
    if px.ndim != 3 or px.shape[2] != 3:
        raise ValueError("jpeg_encode_progressive_color expects (h, w, 3)")
    if subsample not in ("444", "422", "420"):
        raise ValueError("subsample must be '444', '422', or '420'")
    h, w = px.shape[:2]
    hs = 2 if subsample in ("420", "422") else 1
    vs = 2 if subsample == "420" else 1
    mcus_x = (w + 8 * hs - 1) // (8 * hs)
    mcus_y = (h + 8 * vs - 1) // (8 * vs)
    ph, pw = mcus_y * 8 * vs, mcus_x * 8 * hs
    padded = np.pad(
        px.astype(np.float64), ((0, ph - h), (0, pw - w), (0, 0)), mode="edge"
    )
    r_, g_, b_ = padded[..., 0], padded[..., 1], padded[..., 2]
    y = 0.299 * r_ + 0.587 * g_ + 0.114 * b_
    cb = 128.0 - 0.168736 * r_ - 0.331264 * g_ + 0.5 * b_
    cr = 128.0 + 0.5 * r_ - 0.418688 * g_ - 0.081312 * b_
    if vs == 2:
        cb = cb.reshape(ph // 2, 2, pw).mean(axis=1)
        cr = cr.reshape(ph // 2, 2, pw).mean(axis=1)
    if hs == 2:
        cb = cb.reshape(cb.shape[0], pw // 2, 2).mean(axis=2)
        cr = cr.reshape(cr.shape[0], pw // 2, 2).mean(axis=2)

    ql = np.asarray(
        qtable_luma if qtable_luma is not None else [8] + [16] * 63,
        dtype=np.int32,
    ).reshape(8, 8)
    qc = np.asarray(
        qtable_chroma if qtable_chroma is not None else [8] + [16] * 63,
        dtype=np.int32,
    ).reshape(8, 8)
    m = _jpeg_dct_matrix()

    def to_blocks(plane, q):
        bh, bw_ = plane.shape[0] // 8, plane.shape[1] // 8
        blocks = (
            plane.reshape(bh, 8, bw_, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
            - 128.0
        )
        coef = np.einsum("ux,nxy,vy->nuv", m, blocks, m)
        quant = np.round(coef / q[None, :, :]).astype(np.int64).reshape(-1, 64)
        return quant[:, _JPEG_ZIGZAG].reshape(bh, bw_, 64)

    zz = [to_blocks(y, ql), to_blocks(cb, qc), to_blocks(cr, qc)]
    samp = [(hs, vs), (1, 1), (1, 1)]
    # true data-unit grids (T.81 A.1.1) — AC scans cover exactly these
    true_dims = [
        (((h + 7) // 8), ((w + 7) // 8)),
        (((h + vs - 1) // vs + 7) // 8, ((w + hs - 1) // hs + 7) // 8),
        (((h + vs - 1) // vs + 7) // 8, ((w + hs - 1) // hs + 7) // 8),
    ]
    if scans is None:
        scans = (
            ("all", 0, 0, 0, 1),
            (0, 1, 63, 0, 1), (1, 1, 63, 0, 1), (2, 1, 63, 0, 1),
            ("all", 0, 0, 1, 0),
            (0, 1, 63, 1, 0), (1, 1, 63, 1, 0), (2, 1, 63, 1, 0),
        )

    dc_codes = _jpeg_canonical_codes(_JPEG_DC_BITS, _JPEG_DC_VALS)
    ac_codes = _jpeg_canonical_codes(_JPEG_AC_BITS, _JPEG_AC_VALS)

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tid, q in ((0, ql), (1, qc)):
        zzq = q.reshape(-1)[_JPEG_ZIGZAG]
        out += b"\xff\xdb" + struct.pack(">H", 67)
        out.append(tid)
        out += bytes(int(v) for v in zzq)
    out += b"\xff\xc2" + struct.pack(">HBHHB", 17, 8, h, w, 3)
    out += bytes([1, (hs << 4) | vs, 0])  # Y
    out += bytes([2, 0x11, 1])  # Cb
    out += bytes([3, 0x11, 1])  # Cr
    for tid in (0, 1):  # same fixed tables under both ids
        for cls, bits, vals in (
            (0x00, _JPEG_DC_BITS, _JPEG_DC_VALS),
            (0x10, _JPEG_AC_BITS, _JPEG_AC_VALS),
        ):
            out += b"\xff\xc4" + struct.pack(">H", 19 + len(vals))
            out.append(cls | tid)
            out += bytes(bits) + bytes(vals)

    for comp, ss, se, ah, al in scans:
        bw = _JpegBitWriter()
        if comp == "all":
            if ss != 0 or se != 0:
                raise ValueError("interleaved scans must be DC-only")
            out += b"\xff\xda" + struct.pack(">HB", 12, 3)
            out += bytes([1, 0x00, 2, 0x10, 3, 0x10, 0, 0, (ah << 4) | al])
            prev = [0, 0, 0]
            for midx in range(mcus_y * mcus_x):
                my, mx = divmod(midx, mcus_x)
                blks = []
                for v in range(vs):
                    for hh in range(hs):
                        blks.append((0, zz[0][my * vs + v, mx * hs + hh]))
                blks.append((1, zz[1][my, mx]))
                blks.append((2, zz[2][my, mx]))
                for ci, blk in blks:
                    if ah == 0:
                        v_ = int(blk[0]) >> al
                        size, bits = _jpeg_category(v_ - prev[ci])
                        prev[ci] = v_
                        ln, code = dc_codes[size]
                        bw.write(code, ln)
                        if size:
                            bw.write(bits, size)
                    else:
                        bw.write((int(blk[0]) >> al) & 1, 1)
        else:
            ci = int(comp)
            out += b"\xff\xda" + struct.pack(">HB", 8, 1)
            # Td/Ta selectors: table 0 for luma, 1 for chroma (the DC id
            # matters only when Ss=0, the AC id only when Ss>0)
            tt = 0x00 if ci == 0 else 0x11
            out += bytes([ci + 1, tt, ss, se, (ah << 4) | al])
            bh_t, bw_t = true_dims[ci]
            blocks = [
                zz[ci][r0, c0]
                for r0 in range(bh_t)
                for c0 in range(bw_t)
            ]
            if ss == 0:
                if ah == 0:
                    _jpeg_emit_dc_first(blocks, al, bw, dc_codes)
                else:
                    _jpeg_emit_dc_refine(blocks, al, bw)
            elif ah == 0:
                _jpeg_emit_ac_first(blocks, ss, se, al, bw, ac_codes)
            else:
                _jpeg_emit_ac_refine(blocks, ss, se, al, bw, ac_codes)
        bw.flush()
        out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


# --------------------------------------------------------------------------
# ARITHMETIC-CODED JPEG (ITU-T T.81 Annex D QM-coder + the Annex F.1.4.4 /
# F.2.4 sequential-DCT statistical models) — round 11. SOF9 (extended
# sequential, arithmetic) joins the supported set: the QM binary
# arithmetic coder with its 113-state probability-estimation ladder
# (Table D.3), byte stuffing (X'FF00'), carry resolution over stacked
# X'FF' bytes, the Annex D.1.8 CLEARBITS flush, DAC conditioning
# parameters (DC L/U difference categories, AC Kx band split), and
# DRI/RSTn restarts with full statistics resets. Entropy-layer
# losslessness is pytest-held by decoding an arithmetic stream and a
# Huffman stream of the SAME quantized coefficients to identical pixels.
# The state-transition table is transcribed from the public spec
# (T.81 Table D.3, also reproduced in ISO/IEC 10918-1 implementations);
# encoder and decoder share one table, and the roundtrip gate exercises
# every row reachable on the test content. Remaining arithmetic stubs:
# progressive (SOF10) / lossless (SOF11) / differential modes.
# --------------------------------------------------------------------------

#: T.81 Table D.3: (Qe, next-index-after-LPS, next-index-after-MPS,
#: switch-MPS-on-LPS). Index 113 is the non-adaptive "fixed" bin the AC
#: sign decision uses (Qe ~ 0.5, transitions to itself).
_JPEG_ARITH_QE = [
    (0x5A1D, 1, 1, 1), (0x2586, 14, 2, 0), (0x1114, 16, 3, 0),
    (0x080B, 18, 4, 0), (0x03D8, 20, 5, 0), (0x01DA, 23, 6, 0),
    (0x00E5, 25, 7, 0), (0x006F, 28, 8, 0), (0x0036, 30, 9, 0),
    (0x001A, 33, 10, 0), (0x000D, 35, 11, 0), (0x0006, 9, 12, 0),
    (0x0003, 10, 13, 0), (0x0001, 12, 13, 0), (0x5A7F, 15, 15, 1),
    (0x3F25, 36, 16, 0), (0x2CF2, 38, 17, 0), (0x207C, 39, 18, 0),
    (0x17B9, 40, 19, 0), (0x1182, 42, 20, 0), (0x0CEF, 43, 21, 0),
    (0x09A1, 45, 22, 0), (0x072F, 46, 23, 0), (0x055C, 48, 24, 0),
    (0x0406, 49, 25, 0), (0x0303, 51, 26, 0), (0x0240, 52, 27, 0),
    (0x01B1, 54, 28, 0), (0x0144, 56, 29, 0), (0x00F5, 57, 30, 0),
    (0x00B7, 59, 31, 0), (0x008A, 60, 32, 0), (0x0068, 62, 33, 0),
    (0x004E, 63, 34, 0), (0x003B, 32, 35, 0), (0x002C, 33, 9, 0),
    (0x5AE1, 37, 37, 1), (0x484C, 64, 38, 0), (0x3A0D, 65, 39, 0),
    (0x2EF1, 67, 40, 0), (0x261F, 68, 41, 0), (0x1F33, 69, 42, 0),
    (0x19A8, 70, 43, 0), (0x1518, 72, 44, 0), (0x1177, 73, 45, 0),
    (0x0E74, 74, 46, 0), (0x0BFB, 75, 47, 0), (0x09F8, 77, 48, 0),
    (0x0861, 78, 49, 0), (0x0706, 79, 50, 0), (0x05CD, 48, 51, 0),
    (0x04DE, 50, 52, 0), (0x040F, 50, 53, 0), (0x0363, 51, 54, 0),
    (0x02D4, 52, 55, 0), (0x025C, 53, 56, 0), (0x01F8, 54, 57, 0),
    (0x01A4, 55, 58, 0), (0x0160, 56, 59, 0), (0x0125, 57, 60, 0),
    (0x00F6, 58, 61, 0), (0x00CB, 59, 62, 0), (0x00AB, 61, 63, 0),
    (0x008F, 61, 32, 0), (0x5B12, 65, 65, 1), (0x4D04, 80, 66, 0),
    (0x412C, 81, 67, 0), (0x37D8, 82, 68, 0), (0x2FE8, 83, 69, 0),
    (0x293C, 84, 70, 0), (0x2379, 86, 71, 0), (0x1EDF, 87, 72, 0),
    (0x1AA9, 87, 73, 0), (0x174E, 72, 74, 0), (0x1424, 72, 75, 0),
    (0x119C, 74, 76, 0), (0x0F6B, 74, 77, 0), (0x0D51, 75, 78, 0),
    (0x0BB6, 77, 79, 0), (0x0A40, 77, 48, 0), (0x5832, 80, 81, 1),
    (0x4D1C, 88, 82, 0), (0x438E, 89, 83, 0), (0x3BDD, 90, 84, 0),
    (0x34EE, 91, 85, 0), (0x2EAE, 92, 86, 0), (0x299A, 93, 87, 0),
    (0x2516, 86, 71, 0), (0x5570, 88, 89, 1), (0x4CA9, 95, 90, 0),
    (0x44D9, 96, 91, 0), (0x3E22, 97, 92, 0), (0x3824, 99, 93, 0),
    (0x32B4, 99, 94, 0), (0x2E17, 93, 86, 0), (0x56A8, 95, 96, 1),
    (0x4F46, 101, 97, 0), (0x47E5, 102, 98, 0), (0x41CF, 103, 99, 0),
    (0x3C3D, 104, 100, 0), (0x375E, 99, 93, 0), (0x5231, 105, 102, 0),
    (0x4C0F, 106, 103, 0), (0x4639, 107, 104, 0), (0x415E, 103, 99, 0),
    (0x5627, 105, 106, 1), (0x50E7, 108, 107, 0), (0x4B85, 109, 103, 0),
    (0x5597, 110, 109, 0), (0x504F, 111, 107, 0), (0x5A10, 110, 111, 1),
    (0x5522, 112, 109, 0), (0x59EB, 112, 111, 1), (0x5A1D, 113, 113, 0),
]


class _QMEncoder:
    """T.81 Annex D QM arithmetic ENCODER. Registers per D.1: interval
    A in [0x8000, 0x10000] after renormalization, code accumulator C
    with the output byte at bits 19..26, countdown CT (11 initially —
    the 3 spacer bits between the first byte and C's 16-bit interval
    field — then 8 per byte). Carry resolution defers the last byte
    (``buffer``) plus runs of stacked 0xFF bytes (``sc``) and interior
    zero bytes (``zc``) until no future carry can reach them; every
    emitted data byte equal to 0xFF is followed by a stuffed 0x00 so
    the entropy segment never emulates a marker (D.1.6). Statistics
    bins are single bytes: bit 7 = current MPS sense, bits 0..6 = the
    Table D.3 state index."""

    def __init__(self):
        self.a = 0x10000
        self.c = 0
        self.ct = 11
        self.buffer = -1  # pending byte a future carry could increment
        self.sc = 0       # stacked 0xFF bytes (carry turns them into 0x00)
        self.zc = 0       # deferred 0x00 bytes between buffer flushes
        self.out = bytearray()

    def _emit_data(self, b: int) -> None:
        self.out.append(b)
        if b == 0xFF:
            self.out.append(0x00)  # byte stuffing (D.1.6)

    def _emit_zeros(self) -> None:
        if self.zc:
            self.out += b"\x00" * self.zc
            self.zc = 0

    def _byteout(self) -> None:
        temp = self.c >> 19
        if temp > 0xFF:
            # carry: propagate into the deferred byte, convert stacked
            # 0xFF bytes to 0x00 (they absorbed the carry chain)
            if self.buffer >= 0:
                self._emit_zeros()
                self._emit_data(self.buffer + 1)
            self.zc += self.sc
            self.sc = 0
            self.buffer = temp & 0xFF
        elif temp == 0xFF:
            self.sc += 1  # might still be incremented by a later carry
        else:
            # temp < 0xFF: no future carry can reach the pending bytes
            if self.buffer == 0:
                self.zc += 1  # defer zeros (trailing ones may be dropped)
            elif self.buffer >= 0:
                self._emit_zeros()
                self._emit_data(self.buffer)
            while self.sc:
                self._emit_zeros()
                self._emit_data(0xFF)
                self.sc -= 1
            self.buffer = temp
        self.c &= 0x7FFFF

    def encode(self, st: bytearray, idx: int, bit: int) -> None:
        sv = st[idx]
        mps = sv >> 7
        qe, nl, nm, sw = _JPEG_ARITH_QE[sv & 0x7F]
        self.a -= qe
        if bit == mps:
            if self.a >= 0x8000:
                return  # fast path: no renormalization, no estimation
            if self.a < qe:  # conditional exchange (MPS takes top/Qe)
                self.c += self.a
                self.a = qe
            st[idx] = (mps << 7) | nm
        else:
            if self.a >= qe:  # normal: LPS takes the top subinterval
                self.c += self.a
                self.a = qe
            # else conditional exchange: LPS keeps the bottom (larger) one
            st[idx] = ((mps ^ sw) << 7) | nl
        while True:
            self.a <<= 1
            self.c <<= 1
            self.ct -= 1
            if self.ct == 0:
                self._byteout()
                self.ct = 8
            if self.a >= 0x8000:
                break

    def flush(self) -> bytes:
        """D.1.8 termination: pick the in-interval value with the most
        trailing zero bits, push out the remaining significant bytes,
        then drain the deferred byte / 0xFF stack (trailing zero bytes
        are dropped — the decoder feeds zeros once it hits a marker)."""
        t = (self.c + self.a - 1) & 0xFFFF0000
        self.c = t + 0x8000 if t < self.c else t
        self.c <<= self.ct
        self._byteout()
        self.c <<= 8
        self._byteout()
        # drain: anything still pending is significant unless zero
        if self.buffer > 0 or (self.buffer == 0 and self.sc):
            self._emit_zeros()
            self._emit_data(self.buffer)
        while self.sc:
            self._emit_zeros()
            self._emit_data(0xFF)
            self.sc -= 1
        return bytes(self.out)


class _QMDecoder:
    """T.81 Annex D QM arithmetic DECODER, the exact mirror of
    :class:`_QMEncoder`: ``chigh`` holds the next 16 consumed code bits
    minus the encoder's accumulated interval bases (always < A, so 17
    bits suffice); each renormalization shift consumes one more code
    bit. Byte input unstuffs X'FF00' to a 0xFF data byte (leading 0xFF
    fill bytes are swallowed) and feeds zero bits forever once a marker
    is reached (``marker_pos`` records where, for restart resync)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.marker_pos = None
        self.eos = False
        self.bitbuf = 0
        self.nbits = 0
        b0 = self._next_byte()
        b1 = self._next_byte()
        self.chigh = (b0 << 8) | b1
        self.a = 0x10000

    def _next_byte(self) -> int:
        if self.eos:
            return 0
        d = self.data
        n = len(d)
        if self.pos >= n:
            self.eos = True
            return 0
        b = d[self.pos]
        if b != 0xFF:
            self.pos += 1
            return b
        j = self.pos + 1
        while j < n and d[j] == 0xFF:
            j += 1  # 0xFF fill bytes before a marker are legal padding
        if j < n and d[j] == 0x00:
            self.pos = j + 1
            return 0xFF  # stuffed data byte
        self.eos = True
        self.marker_pos = self.pos
        return 0

    def _next_bit(self) -> int:
        if self.nbits == 0:
            self.bitbuf = self._next_byte()
            self.nbits = 8
        self.nbits -= 1
        return (self.bitbuf >> self.nbits) & 1

    def decode(self, st: bytearray, idx: int) -> int:
        sv = st[idx]
        mps = sv >> 7
        qe, nl, nm, sw = _JPEG_ARITH_QE[sv & 0x7F]
        self.a -= qe
        if self.chigh < self.a:
            if self.a >= 0x8000:
                return mps  # encoder fast path: nothing else to mirror
            if self.a < qe:  # encoder coded an exchanged LPS here
                bit = mps ^ 1
                st[idx] = ((mps ^ sw) << 7) | nl
            else:
                bit = mps
                st[idx] = (mps << 7) | nm
        else:
            self.chigh -= self.a
            if self.a < qe:  # encoder coded an exchanged MPS on top
                bit = mps
                st[idx] = (mps << 7) | nm
            else:
                bit = mps ^ 1
                st[idx] = ((mps ^ sw) << 7) | nl
            self.a = qe
        while True:
            self.a <<= 1
            self.chigh = (self.chigh << 1) | self._next_bit()
            if self.a >= 0x8000:
                break
        return bit


def _arith_encode_dc(enc, st, v, ctx, cond_l, cond_u):
    """Encode one DC difference (F.1.4.4.1): zero/sign decisions in the
    conditioning-context bank, log2 magnitude-category ladder at X1=20,
    magnitude bits in one shared bin. Returns the next block's context
    (0 zero / 4 small+ / 8 small- / 12 large+ / 16 large-, the L/U
    split)."""
    if v == 0:
        enc.encode(st, ctx, 0)
        return 0
    enc.encode(st, ctx, 1)
    if v > 0:
        enc.encode(st, ctx + 1, 0)
        pos = ctx + 2
        new_ctx = 4
    else:
        v = -v
        enc.encode(st, ctx + 1, 1)
        pos = ctx + 3
        new_ctx = 8
    mag = v - 1
    m = 0
    if mag:
        enc.encode(st, pos, 1)
        m = 1
        pos = 20
        v2 = mag >> 1
        while v2:
            enc.encode(st, pos, 1)
            m <<= 1
            pos += 1
            v2 >>= 1
    enc.encode(st, pos, 0)
    if m < (1 << cond_l) >> 1:
        new_ctx = 0
    elif m > (1 << cond_u) >> 1:
        new_ctx += 8
    pos += 14
    mm = m
    while mm >> 1:
        mm >>= 1
        enc.encode(st, pos, 1 if (mag & mm) else 0)
    return new_ctx


def _arith_decode_dc(dec, st, ctx, cond_l, cond_u):
    """Mirror of :func:`_arith_encode_dc`: returns (diff, next_ctx)."""
    if dec.decode(st, ctx) == 0:
        return 0, 0
    sign = dec.decode(st, ctx + 1)
    pos = ctx + 2 + sign
    new_ctx = 4 + sign * 4
    m = dec.decode(st, pos)
    if m:
        pos = 20
        while dec.decode(st, pos):
            m <<= 1
            if m == 0x8000:
                raise ValueError("arithmetic DC magnitude overflow")
            pos += 1
    if m < (1 << cond_l) >> 1:
        new_ctx = 0
    elif m > (1 << cond_u) >> 1:
        new_ctx += 8
    mag = m
    pos += 14
    mm = m
    while mm >> 1:
        mm >>= 1
        if dec.decode(st, pos):
            mag |= mm
    v = mag + 1
    return (-v if sign else v), new_ctx


def _arith_encode_ac(enc, st, fixed, blk, kx):
    """Encode one block's AC coefficients (F.1.4.4.2): per-index
    EOB/run/size decision triplets, sign in the FIXED (non-adaptive)
    bin, shared magnitude ladders split at Kx (low band X bins at 189,
    high band at 217)."""
    ke = 0
    for k in range(63, 0, -1):
        if blk[k]:
            ke = k
            break
    k = 1
    while k <= ke:
        pos = 3 * (k - 1)
        enc.encode(st, pos, 0)  # not end-of-block
        while blk[k] == 0:
            enc.encode(st, pos + 1, 0)
            pos += 3
            k += 1
        enc.encode(st, pos + 1, 1)
        v = int(blk[k])
        if v > 0:
            enc.encode(fixed, 0, 0)
        else:
            v = -v
            enc.encode(fixed, 0, 1)
        pos += 2
        mag = v - 1
        m = 0
        if mag:
            enc.encode(st, pos, 1)
            m = 1
            v2 = mag >> 1
            if v2:
                enc.encode(st, pos, 1)  # second decision shares the bin
                m = 2
                pos = 189 if k <= kx else 217
                v2 >>= 1
                while v2:
                    enc.encode(st, pos, 1)
                    m <<= 1
                    pos += 1
                    v2 >>= 1
        enc.encode(st, pos, 0)
        pos += 14
        mm = m
        while mm >> 1:
            mm >>= 1
            enc.encode(st, pos, 1 if (mag & mm) else 0)
        k += 1
    if ke < 63:
        enc.encode(st, 3 * (k - 1), 1)  # end-of-block decision


def _arith_decode_ac(dec, st, fixed, blk, kx):
    """Mirror of :func:`_arith_encode_ac`: fills blk[1..63] in place."""
    k = 1
    while k <= 63:
        pos = 3 * (k - 1)
        if dec.decode(st, pos):
            return  # end-of-block
        while dec.decode(st, pos + 1) == 0:
            pos += 3
            k += 1
            if k > 63:
                raise ValueError("arithmetic AC run past end of block")
        sign = dec.decode(fixed, 0)
        pos += 2
        m = dec.decode(st, pos)
        if m:
            if dec.decode(st, pos):
                m = 2
                pos = 189 if k <= kx else 217
                while dec.decode(st, pos):
                    m <<= 1
                    if m == 0x8000:
                        raise ValueError("arithmetic AC magnitude overflow")
                    pos += 1
        mag = m
        pos += 14
        mm = m
        while mm >> 1:
            mm >>= 1
            if dec.decode(st, pos):
                mag |= mm
        v = mag + 1
        blk[k] = -v if sign else v
        k += 1


def jpeg_encode_arith(
    pixels,
    subsample: str = "420",
    quality_qtable=None,
    qtable_chroma=None,
    restart_interval: int = 0,
    dc_conditioning=(0, 1),
    ac_kx: int = 5,
) -> bytes:
    """REAL ARITHMETIC-CODED JPEG encode (T.81 SOF9, extended
    sequential DCT): 2-D uint8 grayscale or (h, w, 3) uint8 RGB in,
    full interchange stream out — SOI, JFIF APP0, DQT(s), SOF9, DAC
    (the arithmetic conditioning segment: DC L/U, AC Kx), optional DRI,
    SOS, QM-coded entropy data with byte stuffing and RSTn restarts
    (statistics and contexts fully reset per D.1.1), EOI. The transform
    front end (DCT, quantization, zigzag, YCbCr + subsampling for
    color) is byte-identical to the Huffman encoders, so
    arithmetic-vs-Huffman pixel equality isolates the entropy layer.
    Default quant tables keep the DC quantum at 8 — block-constant
    content round-trips bit-exactly, the hash-gate contract."""
    import struct

    import numpy as np

    cond_l, cond_u = dc_conditioning
    if not (0 <= cond_l <= cond_u <= 15):
        raise ValueError("DC conditioning requires 0 <= L <= U <= 15")
    if not (1 <= ac_kx <= 63):
        raise ValueError("AC conditioning Kx must be 1..63")
    px = np.asarray(pixels, dtype=np.uint8)
    color = px.ndim == 3
    if color and px.shape[2] != 3:
        raise ValueError("color input must be (h, w, 3)")
    if not color and px.ndim != 2:
        raise ValueError("expects 2-D grayscale or (h, w, 3) RGB")
    h, w = px.shape[:2]
    if not (0 < h <= 65535 and 0 < w <= 65535):
        raise ValueError("image dimensions out of JPEG range")
    m = _jpeg_dct_matrix()
    ql = np.asarray(
        quality_qtable if quality_qtable is not None else [8] + [16] * 63,
        dtype=np.int32,
    ).reshape(8, 8)

    def to_blocks(plane, q):
        bh, bw_ = plane.shape[0] // 8, plane.shape[1] // 8
        blocks = (
            plane.reshape(bh, 8, bw_, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
            - 128.0
        )
        coef = np.einsum("ux,nxy,vy->nuv", m, blocks, m)
        quant = np.round(coef / q[None, :, :]).astype(np.int64).reshape(-1, 64)
        return quant[:, _JPEG_ZIGZAG].reshape(bh, bw_, 64)

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    if color:
        if subsample not in ("444", "422", "420"):
            raise ValueError("subsample must be '444', '422', or '420'")
        hs = 2 if subsample in ("420", "422") else 1
        vs = 2 if subsample == "420" else 1
        mcus_x = (w + 8 * hs - 1) // (8 * hs)
        mcus_y = (h + 8 * vs - 1) // (8 * vs)
        ph, pw = mcus_y * 8 * vs, mcus_x * 8 * hs
        padded = np.pad(
            px.astype(np.float64), ((0, ph - h), (0, pw - w), (0, 0)),
            mode="edge",
        )
        r_, g_, b_ = padded[..., 0], padded[..., 1], padded[..., 2]
        y = 0.299 * r_ + 0.587 * g_ + 0.114 * b_
        cb = 128.0 - 0.168736 * r_ - 0.331264 * g_ + 0.5 * b_
        cr = 128.0 + 0.5 * r_ - 0.418688 * g_ - 0.081312 * b_
        if vs == 2:
            cb = cb.reshape(ph // 2, 2, pw).mean(axis=1)
            cr = cr.reshape(ph // 2, 2, pw).mean(axis=1)
        if hs == 2:
            cb = cb.reshape(cb.shape[0], pw // 2, 2).mean(axis=2)
            cr = cr.reshape(cr.shape[0], pw // 2, 2).mean(axis=2)
        qc = np.asarray(
            qtable_chroma if qtable_chroma is not None else [8] + [16] * 63,
            dtype=np.int32,
        ).reshape(8, 8)
        stores = [to_blocks(y, ql), to_blocks(cb, qc), to_blocks(cr, qc)]
        for tid, q in ((0, ql), (1, qc)):
            zzq = q.reshape(-1)[_JPEG_ZIGZAG]
            out += b"\xff\xdb" + struct.pack(">H", 67)
            out.append(tid)
            out += bytes(int(v) for v in zzq)
        out += b"\xff\xc9" + struct.pack(">HBHHB", 17, 8, h, w, 3)
        out += bytes([1, (hs << 4) | vs, 0])
        out += bytes([2, 0x11, 1])
        out += bytes([3, 0x11, 1])
        tids = [(0, 0), (1, 1), (1, 1)]  # (Td, Ta) per component
    else:
        ph, pw = (h + 7) // 8 * 8, (w + 7) // 8 * 8
        padded = np.pad(px, ((0, ph - h), (0, pw - w)), mode="edge").astype(
            np.float64
        )
        hs = vs = 1
        mcus_x, mcus_y = pw // 8, ph // 8
        stores = [to_blocks(padded, ql)]
        zzq = ql.reshape(-1)[_JPEG_ZIGZAG]
        out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00"
        out += bytes(int(v) for v in zzq)
        out += b"\xff\xc9" + struct.pack(">HBHHB", 11, 8, h, w, 1)
        out += b"\x01\x11\x00"
        tids = [(0, 0)]
    # DAC: conditioning for every referenced table id (Tc=0 DC: L|U<<4;
    # Tc=1 AC: Kx)
    dac_entries = []
    for tid in sorted({t[0] for t in tids}):
        dac_entries.append((tid, cond_l | (cond_u << 4)))
    for tid in sorted({t[1] for t in tids}):
        dac_entries.append((0x10 | tid, ac_kx))
    out += b"\xff\xcc" + struct.pack(">H", 2 + 2 * len(dac_entries))
    for tc_tb, cs in dac_entries:
        out += bytes([tc_tb, cs])
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    ncomp = len(stores)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * ncomp, ncomp)
    for ci, (td, ta) in enumerate(tids):
        out += bytes([ci + 1, (td << 4) | ta])
    out += bytes([0, 0x3F, 0])

    def fresh_stats():
        return (
            {t: bytearray(64) for t in {x[0] for x in tids}},
            {t: bytearray(256) for t in {x[1] for x in tids}},
            bytearray([113]),
        )

    enc = _QMEncoder()
    dc_stats, ac_stats, fixed = fresh_stats()
    dc_ctx = [0] * ncomp
    prev_dc = [0] * ncomp
    rst = 0
    if color:
        mcu_plan = (
            [(0, v, hh) for v in range(vs) for hh in range(hs)]
            + [(1, 0, 0), (2, 0, 0)]
        )
    else:
        mcu_plan = [(0, 0, 0)]
    for midx in range(mcus_y * mcus_x):
        if restart_interval and midx and midx % restart_interval == 0:
            out += enc.flush()
            out += bytes([0xFF, 0xD0 + (rst % 8)])
            rst += 1
            enc = _QMEncoder()
            dc_stats, ac_stats, fixed = fresh_stats()
            dc_ctx = [0] * ncomp
            prev_dc = [0] * ncomp
        my, mx = divmod(midx, mcus_x)
        for ci, v, hh in mcu_plan:
            if color and ci == 0:
                blk = stores[0][my * vs + v, mx * hs + hh]
            else:
                blk = stores[ci][my, mx]
            td, ta = tids[ci]
            dc = int(blk[0])
            dc_ctx[ci] = _arith_encode_dc(
                enc, dc_stats[td], dc - prev_dc[ci], dc_ctx[ci],
                cond_l, cond_u,
            )
            prev_dc[ci] = dc
            _arith_encode_ac(enc, ac_stats[ta], fixed, blk, ac_kx)
    out += enc.flush()
    out += b"\xff\xd9"
    return bytes(out)


def encode_jpeg_arith_assets(
    df: DataFrame,
    id_col: str = "doc_id",
    width_col: str = "width",
    height_col: str = "height",
    restart_col: str | None = None,
    kx_col: str | None = None,
) -> DataFrame:
    """Arrow-batched REAL ARITHMETIC-CODED JPEG encode (T.81 SOF9) of
    block-constant grayscale content: (id, width, height
    [, restart_interval][, ac_kx]) → (id, content binary). Per-row
    restart intervals exercise the QM coder's flush/reinit/statistics
    reset, and per-row AC Kx conditioning exercises DAC parsing and the
    band-split magnitude bins — both decoded back by the SAME
    :func:`jpeg_decode_stats` the Huffman modes use (dispatch via SOF9
    in :func:`jpeg_decode`). Pixels never cross a shuffle."""
    spark = df.sparkSession
    _ship_package(spark)
    cols = [id_col, width_col, height_col]
    if restart_col is not None:
        cols.append(restart_col)
    if kx_col is not None:
        cols.append(kx_col)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pipes_spark.operators.multimodal import (
            jpeg_block_gray,
            jpeg_encode_arith,
        )

        for pdf in batches:
            ri = (
                pdf[restart_col]
                if restart_col is not None
                else [0] * len(pdf)
            )
            kx = pdf[kx_col] if kx_col is not None else [5] * len(pdf)
            yield pd.DataFrame(
                {
                    "asset_id": pdf[id_col].astype("int64"),
                    "content": [
                        jpeg_encode_arith(
                            jpeg_block_gray(int(i), int(w), int(h)),
                            restart_interval=int(r),
                            ac_kx=int(k),
                        )
                        for i, w, h, r, k in zip(
                            pdf[id_col],
                            pdf[width_col],
                            pdf[height_col],
                            ri,
                            kx,
                        )
                    ],
                }
            )

    return df.select(*cols).mapInPandas(
        gen, "asset_id bigint, content binary"
    )


# --------------------------------------------------------------------------
# FLAC: REAL lossless compressed audio from the public spec (RFC 9639 /
# the xiph.org format description) — round 11. This moves the audio
# story past containers and companding into a true compressed codec:
# Rice-coded prediction residuals (4-bit and 5-bit parameter variants
# with raw-escape partitions), CONSTANT/VERBATIM/FIXED(0-4)/LPC
# subframes (the encoder runs REAL Levinson-Durbin LPC with spec
# coefficient quantization), stereo decorrelation (left/side,
# right/side, mid/side), the extended-UTF-8 frame numbering, CRC-8
# frame headers, CRC-16 frame trailers, and the STREAMINFO MD5 of the
# unencoded audio — which the decoder recomputes, so a decode is
# verified lossless end to end. Remaining audio stubs: perceptual
# codecs (MP3/AAC-class).
# --------------------------------------------------------------------------


def _crc_table(poly: int, width: int) -> list:
    """Standard 256-entry byte-at-a-time CRC table for an MSB-first CRC
    (identical math to the bitwise loop, 8× fewer Python operations —
    both FLAC CRCs run over every frame byte on encode AND decode, so
    this is a measured hot path of the round trip, guide §1.2 step 2)."""
    top = 1 << (width - 1)
    mask = (1 << width) - 1
    table = []
    for b in range(256):
        crc = b << (width - 8)
        for _ in range(8):
            crc = ((crc << 1) ^ poly) & mask if crc & top else (crc << 1) & mask
        table.append(crc)
    return table


_FLAC_CRC8_TABLE = _crc_table(0x07, 8)
_FLAC_CRC16_TABLE = _crc_table(0x8005, 16)


def _flac_crc8(data: bytes) -> int:
    """CRC-8 with polynomial x^8 + x^2 + x + 1 (0x07), init 0 — the
    frame-header checksum (table-driven)."""
    crc = 0
    t = _FLAC_CRC8_TABLE
    for b in data:
        crc = t[crc ^ b]
    return crc


def _flac_crc16(data: bytes) -> int:
    """CRC-16 with polynomial x^16 + x^15 + x^2 + 1 (0x8005), init 0 —
    the whole-frame checksum (table-driven)."""
    crc = 0
    t = _FLAC_CRC16_TABLE
    for b in data:
        crc = t[((crc >> 8) ^ b) & 0xFF] ^ ((crc << 8) & 0xFFFF)
    return crc


class _FlacBitWriter:
    """MSB-first bit packer (no byte stuffing — FLAC frames are CRC-
    delimited, not marker-delimited)."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, length: int) -> None:
        if length == 0:
            return
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            self.out.append((self.acc >> (self.n - 8)) & 0xFF)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def write_signed(self, value: int, length: int) -> None:
        self.write(value & ((1 << length) - 1), length)

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)  # q zeros then a terminating 1

    def align(self) -> None:
        if self.n:
            self.write(0, 8 - self.n)


class _FlacBitReader:
    """MSB-first bit reader over a byte range."""

    def __init__(self, data: bytes, pos: int):
        self.d = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def bits(self, k: int) -> int:
        # refill in 8-byte gulps: int.from_bytes of a slice beats the
        # per-byte shift-or loop ~6× on the Rice-residual hot path
        while self.n < k:
            take = min(8, len(self.d) - self.pos)
            if take <= 0:
                raise ValueError("FLAC: truncated bit stream")
            self.acc = (self.acc << (8 * take)) | int.from_bytes(
                self.d[self.pos : self.pos + take], "big"
            )
            self.pos += take
            self.n += 8 * take
        self.n -= k
        v = (self.acc >> self.n) & ((1 << k) - 1) if k else 0
        self.acc &= (1 << self.n) - 1
        return v

    def signed(self, k: int) -> int:
        v = self.bits(k)
        return v - (1 << k) if k and v >= (1 << (k - 1)) else v

    def unary(self) -> int:
        # count leading zeros via bit_length instead of a per-bit loop:
        # with n buffered bits, the leading-zero count of acc is
        # n - acc.bit_length(), exact for any bit pattern
        q = 0
        while True:
            if self.n == 0 or self.acc == 0:
                q += self.n
                self.n = 0
                self.acc = 0
                if q > 1 << 24:
                    raise ValueError("FLAC: runaway unary code")
                take = min(8, len(self.d) - self.pos)
                if take <= 0:
                    raise ValueError("FLAC: truncated bit stream")
                self.acc = int.from_bytes(self.d[self.pos : self.pos + take], "big")
                self.pos += take
                self.n = 8 * take
                continue
            top = self.acc.bit_length()
            q += self.n - top
            self.n = top - 1  # consume the zeros and the terminating 1
            self.acc &= (1 << self.n) - 1
            return q

    def rice_many(self, cnt: int, k: int) -> list:
        """Decode ``cnt`` Rice(k) residuals (unary quotient, k remainder
        bits, zigzag unmap) in one call — the unary() + bits() bodies
        inlined over local state (the decoder's hottest loop). Raises
        the same errors at the same consumption points; reader state on
        an exception is irrelevant because the whole decode aborts."""
        d = self.d
        ln = len(d)
        pos = self.pos
        acc = self.acc
        n = self.n
        out: list = []
        append = out.append
        mask = (1 << k) - 1
        for _ in range(cnt):
            q = 0
            while True:
                if n == 0 or acc == 0:
                    q += n
                    if q > 1 << 24:
                        raise ValueError("FLAC: runaway unary code")
                    take = min(8, ln - pos)
                    if take <= 0:
                        raise ValueError("FLAC: truncated bit stream")
                    acc = int.from_bytes(d[pos : pos + take], "big")
                    pos += take
                    n = 8 * take
                    continue
                top = acc.bit_length()
                q += n - top
                n = top - 1
                acc &= (1 << n) - 1
                break
            while n < k:
                take = min(8, ln - pos)
                if take <= 0:
                    raise ValueError("FLAC: truncated bit stream")
                acc = (acc << (8 * take)) | int.from_bytes(
                    d[pos : pos + take], "big"
                )
                pos += take
                n += 8 * take
            n -= k
            u = (q << k) | ((acc >> n) & mask) if k else q
            acc &= (1 << n) - 1
            append((u >> 1) ^ -(u & 1))
        self.pos = pos
        self.acc = acc
        self.n = n
        return out

    def bytepos(self) -> int:
        """Byte cursor of the consumption point. With chunked refill,
        ``pos`` runs ahead of what was consumed; the invariant
        consumed_bits == pos*8 − n recovers the true cursor (call sites
        read it only at byte-aligned points)."""
        return self.pos - self.n // 8

    def align(self) -> None:
        # advance the consumption point to the next byte boundary and
        # rewind pos onto it (pos may sit past it after a chunked refill)
        consumed = self.pos * 8 - self.n
        self.pos = (consumed + 7) // 8
        self.n = 0
        self.acc = 0


def _flac_utf8_encode(n: int) -> bytes:
    """FLAC's extended UTF-8 style coding for frame/sample numbers
    (plain UTF-8 widened to 36-bit values / 7 bytes)."""
    if n < 0x80:
        return bytes([n])
    for nbytes, firstmax in ((2, 11), (3, 16), (4, 21), (5, 26), (6, 31), (7, 36)):
        if n < (1 << firstmax):
            lead = (0xFF << (8 - nbytes)) & 0xFF
            shift = 6 * (nbytes - 1)
            out = [lead | (n >> shift)]
            for i in range(nbytes - 1):
                shift -= 6
                out.append(0x80 | ((n >> shift) & 0x3F))
            return bytes(out)
    raise ValueError("frame number beyond 36 bits")


def _flac_utf8_decode(data: bytes, pos: int):
    """Returns (value, new_pos); raises on malformed coding."""
    b0 = data[pos]
    if b0 < 0x80:
        return b0, pos + 1
    # count leading ones
    nbytes = 0
    m = 0x80
    while b0 & m:
        nbytes += 1
        m >>= 1
    if nbytes < 2 or nbytes > 7:
        raise ValueError("FLAC: malformed UTF-8 frame number")
    v = b0 & (0x7F >> nbytes)
    for i in range(1, nbytes):
        bi = data[pos + i]
        if bi & 0xC0 != 0x80:
            raise ValueError("FLAC: malformed UTF-8 continuation")
        v = (v << 6) | (bi & 0x3F)
    return v, pos + nbytes


#: FIXED predictor coefficients by order (RFC 9639 §4.2.2): residual =
#: polynomial difference of that order.
_FLAC_FIXED_COEF = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}

_FLAC_BLOCK_SIZES = {
    192: 1, 576: 2, 1152: 3, 2304: 4, 4608: 5,
    256: 8, 512: 9, 1024: 10, 2048: 11, 4096: 12,
    8192: 13, 16384: 14, 32768: 15,
}

_FLAC_RATES = {
    88200: 1, 176400: 2, 192000: 3, 8000: 4, 16000: 5, 22050: 6,
    24000: 7, 32000: 8, 44100: 9, 48000: 10, 96000: 11,
}


def _flac_rice_cost(res, param: int) -> int:
    total = 0
    for r in res:
        u = (r << 1) if r >= 0 else ((-r << 1) - 1)
        total += (u >> param) + 1 + param
    return total


def _flac_best_rice(res):
    """Exact best single Rice parameter 0..30 by total cost (RICE2
    range; the writer picks the 4-bit method when the param fits).

    The per-residual work is vectorized (zigzag once, then one shifted
    sum per candidate parameter — the encoder's measured hot spot,
    guide §4.2); the parameter walk replays the original scalar loop
    over the 31 precomputed costs, so the selection — including the
    first-minimum tie-break and the convexity early-exit — is
    decision-identical to the loop it replaces."""
    import numpy as np

    a = np.asarray(res, dtype=np.int64)
    # zigzag as one op: (a << 1) ^ (a >> 63) == a<<1 for a >= 0 and
    # ~(a<<1) == (-a<<1)-1 for a < 0 (arithmetic shift fills sign)
    u = ((a << 1) ^ (a >> 63)).astype(np.uint64)
    n = len(u)
    # only parameters up to the max zigzag bit length can change the
    # shifted sum: for p >= kmax every u >> p is 0, so the cost
    # (1+p)*n increases strictly with p and can never beat the best
    # found in [0, kmax] — the walk below therefore examines the same
    # prefix and returns the same (param, cost) as the full 31-row scan
    kmax = int(int(u.max()).bit_length()) if n else 0
    top = min(31, kmax + 1)
    sums = (u[None, :] >> np.arange(top, dtype=np.uint64)[:, None]).sum(axis=1)
    best_p, best_c = 0, None
    for p in range(0, top):
        c = int(sums[p]) + (1 + p) * n
        if best_c is None or c < best_c:
            best_p, best_c = p, c
        elif c > best_c * 2:
            break  # costs are convex in p once past the optimum
    if best_c is None:
        best_c = 0  # empty residual: zero cost at parameter 0, as before
    return best_p, best_c


def _flac_write_residual(bw, res, order: int, block_size: int) -> None:
    """Partition order 0 (one parameter), method chosen by parameter
    width — decoder-side generality (partitions, escapes) is exercised
    by dedicated pytest fixtures."""
    import numpy as np

    param, _ = _flac_best_rice(res)
    method = 0 if param < 15 else 1
    bw.write(method, 2)
    bw.write(0, 4)  # partition order 0
    bw.write(param, 4 if method == 0 else 5)
    # vectorized emit: per residual the stream is q zeros, a 1, then
    # the param low bits of the zigzag — i.e. ONE write of value
    # (1 << param) | (u & mask) at width q + 1 + param. The loop below
    # packs those precomputed (value, width) pairs with a local
    # accumulator and flushes whole-byte chunks; the byte sequence is
    # identical to the per-residual write_unary + write calls
    # (measured encoder hot spot, guide §4.2).
    a = np.asarray(res, dtype=np.int64)
    u = (a << 1) ^ (a >> 63)
    mark = 1 << param
    vals = (mark | (u & (mark - 1))).tolist()
    lens = ((u >> param) + (1 + param)).tolist()
    acc = bw.acc
    n = bw.n
    out = bw.out
    for v, l in zip(vals, lens):
        acc = (acc << l) | v
        n += l
        if n >= 8:
            nb = n >> 3
            n -= nb << 3
            out += (acc >> n).to_bytes(nb, "big")
            acc &= (1 << n) - 1
    bw.acc = acc
    bw.n = n


def _flac_residuals(x, coefs, shift: int = 0):
    """Prediction residuals, vectorized: one int64 vector
    multiply-accumulate per coefficient instead of a Python sum per
    sample (products bounded by 2^15-precision coefs × 17-bit side
    samples × order ≤ 32 — well inside int64; numpy's ``>>`` on
    negatives floors exactly like Python's)."""
    import numpy as np

    order = len(coefs)
    a = np.asarray(x, dtype=np.int64)
    if len(a) <= order:
        return []
    pred = np.zeros(len(a) - order, dtype=np.int64)
    for j, c in enumerate(coefs):
        pred += int(c) * a[order - 1 - j : len(a) - 1 - j]
    # stays an int64 array: both consumers (_flac_best_rice and
    # _flac_write_residual) convert via .tolist() only at the last
    # step, so the bit writer's unbounded-width accumulator never sees
    # a fixed-width np.int64
    return a[order:] - (pred >> shift)


def _flac_lpc_quantize(x, order: int, precision: int = 14):
    """REAL LPC analysis: autocorrelation → Levinson-Durbin →
    spec coefficient quantization with error feedback. Returns
    (qcoefs, shift) or None when the signal is degenerate."""
    import numpy as np

    sig = np.asarray(x, dtype=np.float64)
    n = len(sig)
    if n <= order + 1:
        return None
    ac = [float(np.dot(sig[: n - k], sig[k:])) for k in range(order + 1)]
    if ac[0] == 0.0:
        return None
    err = ac[0]
    lpc = [0.0] * order
    for i in range(order):
        k = ac[i + 1]
        for j in range(i):
            k -= lpc[j] * ac[i - j]
        k /= err
        lpc[i] = k
        for j in range(i // 2):
            t = lpc[j]
            lpc[j] = t - k * lpc[i - 1 - j]
            lpc[i - 1 - j] -= k * t
        if i & 1:
            lpc[i // 2] -= k * lpc[i // 2]
        err *= 1.0 - k * k
        if err <= 0.0:
            return None
    cmax = max(abs(c) for c in lpc)
    if cmax == 0.0:
        return None
    # shift so the largest coefficient fills the precision budget
    import math

    shift = precision - 1 - max(0, int(math.floor(math.log2(cmax))) + 1)
    shift = max(0, min(15, shift))  # 5-bit signed field, kept non-negative
    qmax = (1 << (precision - 1)) - 1
    qmin = -(1 << (precision - 1))
    q = []
    e = 0.0
    for c in lpc:
        v = c * (1 << shift) + e
        qi = int(round(v))
        qi = max(qmin, min(qmax, qi))
        e = v - qi
        q.append(qi)
    return q, shift


def _flac_pack_samples(arr, bits: int) -> bytes:
    """Interleaved samples → the little-endian signed byte layout the
    STREAMINFO MD5 covers (RFC 9639 §6: bits/8 bytes per sample)."""
    import numpy as np

    if bits == 8:
        return arr.astype("<i1").tobytes()
    if bits == 16:
        return arr.astype("<i2").tobytes()
    if bits == 24:
        u = (arr.astype(np.int64) & 0xFFFFFF).astype(np.uint32)
        out = np.empty((len(arr), 3), dtype=np.uint8)
        out[:, 0] = u & 0xFF
        out[:, 1] = (u >> 8) & 0xFF
        out[:, 2] = (u >> 16) & 0xFF
        return out.tobytes()
    if bits == 32:
        return arr.astype("<i4").tobytes()
    raise ValueError("bit depth must be 8, 16, 24, or 32")


def flac_encode_pcm16(
    samples,
    sample_rate: int,
    channels: int = 1,
    block_size: int = 1024,
    stereo_mode: str = "independent",
    use_lpc: bool = True,
    lpc_order: int = 8,
    bits: int = 16,
) -> bytes:
    """REAL FLAC encode of interleaved int16 PCM (RFC 9639): fLaC
    marker, STREAMINFO (incl. the MD5 of the unencoded audio), fixed-
    blocking frames with CRC-8 headers and CRC-16 trailers. Per
    subframe the encoder picks the cheapest of CONSTANT / FIXED 0-4
    (exact Rice cost) / true Levinson-Durbin LPC / VERBATIM. Stereo
    decorrelation per ``stereo_mode``: independent, left_side,
    right_side, or mid_side (side channels carry bps+1 bits per spec).
    """
    import hashlib
    import struct

    import numpy as np

    if channels not in (1, 2):
        raise ValueError("1 or 2 channels supported")
    if stereo_mode not in ("independent", "left_side", "right_side", "mid_side"):
        raise ValueError(f"unknown stereo_mode {stereo_mode!r}")
    s = np.asarray(samples, dtype=np.int64)
    if s.ndim != 1 or len(s) % channels:
        raise ValueError("samples must be 1-D interleaved")
    if len(s) == 0:
        raise ValueError("empty signal")
    if bits not in (8, 16, 24):
        raise ValueError("bit depth must be 8, 16, or 24")
    lo, hi = -(1 << (bits - 1)), (1 << (bits - 1)) - 1
    if s.min() < lo or s.max() > hi:
        raise ValueError(f"samples out of int{bits} range")
    n_total = len(s) // channels
    bps = bits

    md5 = hashlib.md5(_flac_pack_samples(s, bits)).digest()

    def write_subframe(bw, x, sub_bps):
        x = [int(v) for v in x]
        n = len(x)
        if all(v == x[0] for v in x):
            bw.write(0, 1)
            bw.write(0b000000, 6)
            bw.write(0, 1)
            bw.write_signed(x[0], sub_bps)
            return
        verbatim_cost = n * sub_bps
        best = ("verbatim", None, None, verbatim_cost)
        for order, coefs in _FLAC_FIXED_COEF.items():
            if n <= order:
                continue
            res = _flac_residuals(x, coefs)
            _, rc = _flac_best_rice(res)
            cost = order * sub_bps + 6 + rc
            if cost < best[3]:
                best = ("fixed", order, res, cost)
        if use_lpc and n > lpc_order + 1:
            lq = _flac_lpc_quantize(x, lpc_order)
            if lq is not None:
                qc, shift = lq
                res = _flac_residuals(x, qc, shift)
                _, rc = _flac_best_rice(res)
                cost = lpc_order * sub_bps + 4 + 5 + lpc_order * 14 + 6 + rc
                if cost < best[3]:
                    best = ("lpc", (qc, shift), res, cost)
        kind = best[0]
        bw.write(0, 1)
        if kind == "verbatim":
            bw.write(0b000001, 6)
            bw.write(0, 1)
            for v in x:
                bw.write_signed(v, sub_bps)
        elif kind == "fixed":
            order, res = best[1], best[2]
            bw.write(0b001000 | order, 6)
            bw.write(0, 1)
            for v in x[:order]:
                bw.write_signed(v, sub_bps)
            _flac_write_residual(bw, res, order, n)
        else:
            (qc, shift), res = best[1], best[2]
            order = len(qc)
            bw.write(0b100000 | (order - 1), 6)
            bw.write(0, 1)
            for v in x[:order]:
                bw.write_signed(v, sub_bps)
            bw.write(14 - 1, 4)  # precision 14
            bw.write_signed(shift, 5)
            for c in qc:
                bw.write_signed(c, 14)
            _flac_write_residual(bw, res, order, n)

    frames = bytearray()
    min_fs = max_fs = None
    frame_idx = 0
    for start in range(0, n_total, block_size):
        blk = s[start * channels : (start + min(block_size, n_total - start)) * channels]
        nb = len(blk) // channels
        header = bytearray()
        bw = _FlacBitWriter()
        bw.write(0b11111111111110, 14)
        bw.write(0, 1)  # reserved
        bw.write(0, 1)  # fixed blocking strategy
        bs_code = _FLAC_BLOCK_SIZES.get(nb)
        tail_bs = None
        if bs_code is None:
            if nb <= 256:
                bs_code, tail_bs = 6, (nb - 1, 8)
            else:
                bs_code, tail_bs = 7, (nb - 1, 16)
        bw.write(bs_code, 4)
        sr_code = _FLAC_RATES.get(sample_rate)
        tail_sr = None
        if sr_code is None:
            if sample_rate % 1000 == 0 and sample_rate // 1000 <= 255:
                sr_code, tail_sr = 12, (sample_rate // 1000, 8)
            elif sample_rate <= 65535:
                sr_code, tail_sr = 13, (sample_rate, 16)
            elif sample_rate % 10 == 0 and sample_rate // 10 <= 65535:
                sr_code, tail_sr = 14, (sample_rate // 10, 16)
            else:
                raise ValueError("sample rate not representable")
        bw.write(sr_code, 4)
        if channels == 1 or stereo_mode == "independent":
            ch_code = channels - 1
        else:
            ch_code = {"left_side": 8, "right_side": 9, "mid_side": 10}[
                stereo_mode
            ]
        bw.write(ch_code, 4)
        bw.write({8: 1, 16: 4, 24: 6}[bits], 3)  # sample-size code
        bw.write(0, 1)  # reserved
        header += bw.out
        assert bw.n == 0
        header += _flac_utf8_encode(frame_idx)
        bw2 = _FlacBitWriter()
        if tail_bs is not None:
            bw2.write(*tail_bs)
        if tail_sr is not None:
            bw2.write(*tail_sr)
        header += bw2.out
        header.append(_flac_crc8(bytes(header)))

        body = _FlacBitWriter()
        if channels == 1:
            write_subframe(body, blk, bps)
        else:
            left = blk[0::2]
            right = blk[1::2]
            if stereo_mode == "independent":
                write_subframe(body, left, bps)
                write_subframe(body, right, bps)
            elif stereo_mode == "left_side":
                write_subframe(body, left, bps)
                write_subframe(body, left - right, bps + 1)
            elif stereo_mode == "right_side":
                write_subframe(body, left - right, bps + 1)
                write_subframe(body, right, bps)
            else:
                write_subframe(body, (left + right) >> 1, bps)
                write_subframe(body, left - right, bps + 1)
        body.align()
        frame = bytes(header) + bytes(body.out)
        frame += struct.pack(">H", _flac_crc16(frame))
        frames += frame
        fs = len(frame)
        min_fs = fs if min_fs is None else min(min_fs, fs)
        max_fs = fs if max_fs is None else max(max_fs, fs)
        frame_idx += 1

    info = _FlacBitWriter()
    info.write(min(block_size, n_total), 16)
    info.write(min(block_size, n_total) if frame_idx == 1 else block_size, 16)
    info.write(min_fs, 24)
    info.write(max_fs, 24)
    info.write(sample_rate, 20)
    info.write(channels - 1, 3)
    info.write(bps - 1, 5)
    info.write(n_total, 36)
    out = bytearray(b"fLaC")
    out.append(0x80)  # last metadata block, type 0 = STREAMINFO
    out += (34).to_bytes(3, "big")
    out += bytes(info.out) + md5
    out += frames
    return bytes(out)


def flac_decode(content: bytes, label: str = "asset", frame_table=None):
    """REAL FLAC decode (RFC 9639): metadata-block walk (STREAMINFO
    mandatory-first, others skipped), frame sync + header parse with
    CRC-8 verification (all block-size/sample-rate code forms, both
    blocking strategies), subframe decode — CONSTANT, VERBATIM,
    FIXED 0-4, LPC 1-32 (quantized-coefficient prediction with
    arithmetic shift applied to the accumulated sum), wasted bits,
    Rice residuals in both parameter widths incl. raw-escape
    partitions at any partition order — stereo un-decorrelation
    (left/side, right/side, mid/side), CRC-16 frame verification, and
    an MD5 recomputation over the reconstructed audio checked against
    STREAMINFO. Returns (samples int64 interleaved ndarray, channels,
    sample_rate, bits_per_sample, total_samples, md5_ok). Pass a
    list as ``frame_table`` to additionally receive exact
    (first_sample, byte_offset_from_first_frame, block_size) triples —
    the seek-table source of truth (FLAC frames are not
    length-prefixed, so only a real decode can locate them)."""
    import hashlib

    import numpy as np

    d = bytes(content)
    if d[:4] != b"fLaC":
        raise ValueError(f"{label}: not a FLAC stream")
    pos = 4
    sinfo = None
    md5_expect = None
    while True:
        if pos + 4 > len(d):
            raise ValueError(f"{label}: truncated metadata")
        hdr = d[pos]
        last = hdr & 0x80
        btype = hdr & 0x7F
        blen = int.from_bytes(d[pos + 1 : pos + 4], "big")
        pos += 4
        if sinfo is None and btype != 0:
            raise ValueError(f"{label}: first metadata block must be STREAMINFO")
        if btype == 0:
            if blen != 34:
                raise ValueError(f"{label}: bad STREAMINFO length")
            r = _FlacBitReader(d, pos)
            min_bs = r.bits(16)
            max_bs = r.bits(16)
            r.bits(24)
            r.bits(24)
            rate = r.bits(20)
            nch = r.bits(3) + 1
            bps = r.bits(5) + 1
            total = r.bits(36)
            md5_expect = d[pos + 18 : pos + 34]
            sinfo = (min_bs, max_bs, rate, nch, bps, total)
        elif btype == 127:
            raise ValueError(f"{label}: invalid metadata block type")
        pos += blen
        if last:
            break
    if sinfo is None:
        raise ValueError(f"{label}: missing STREAMINFO")
    _, _, rate, nch, bps, total = sinfo
    if nch > 2:
        raise ValueError(f"{label}: >2 channels unsupported")

    chans = [[] for _ in range(nch)]
    got = 0
    first_frame_at = pos
    while got < total:
        if pos >= len(d):
            raise ValueError(f"{label}: truncated before all samples decoded")
        frame_start = pos
        r = _FlacBitReader(d, pos)
        sync = r.bits(14)
        if sync != 0b11111111111110:
            raise ValueError(f"{label}: lost frame sync")
        if r.bits(1):
            raise ValueError(f"{label}: reserved frame-header bit set")
        variable = r.bits(1)
        bs_code = r.bits(4)
        sr_code = r.bits(4)
        ch_code = r.bits(4)
        ss_code = r.bits(3)
        if r.bits(1):
            raise ValueError(f"{label}: reserved frame-header bit set")
        # the header so far is exactly 4 bytes
        num, npos = _flac_utf8_decode(d, pos + 4)
        r2 = _FlacBitReader(d, npos)
        if bs_code == 0:
            raise ValueError(f"{label}: reserved block-size code")
        if bs_code == 1:
            nb = 192
        elif 2 <= bs_code <= 5:
            nb = 576 << (bs_code - 2)
        elif bs_code == 6:
            nb = r2.bits(8) + 1
        elif bs_code == 7:
            nb = r2.bits(16) + 1
        else:
            nb = 256 << (bs_code - 8)
        if sr_code == 0:
            f_rate = rate
        elif sr_code in _FLAC_RATES.values():
            f_rate = next(k for k, v in _FLAC_RATES.items() if v == sr_code)
        elif sr_code == 12:
            f_rate = r2.bits(8) * 1000
        elif sr_code == 13:
            f_rate = r2.bits(16)
        elif sr_code == 14:
            f_rate = r2.bits(16) * 10
        else:
            raise ValueError(f"{label}: invalid sample-rate code")
        if ss_code == 0:
            f_bps = bps
        else:
            f_bps = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}.get(ss_code)
            if f_bps is None:
                raise ValueError(f"{label}: reserved sample-size code")
        crc8_at = r2.bytepos()
        if _flac_crc8(d[frame_start:crc8_at]) != d[crc8_at]:
            raise ValueError(f"{label}: frame header CRC-8 mismatch")
        body = _FlacBitReader(d, crc8_at + 1)

        if ch_code <= 7:
            f_nch = ch_code + 1
            mode = "independent"
        elif ch_code == 8:
            f_nch, mode = 2, "left_side"
        elif ch_code == 9:
            f_nch, mode = 2, "right_side"
        elif ch_code == 10:
            f_nch, mode = 2, "mid_side"
        else:
            raise ValueError(f"{label}: reserved channel assignment")
        if f_nch != nch:
            raise ValueError(f"{label}: frame channel count != STREAMINFO")

        def read_subframe(sub_bps):
            if body.bits(1):
                raise ValueError(f"{label}: subframe padding bit set")
            stype = body.bits(6)
            wasted = 0
            if body.bits(1):
                wasted = body.unary() + 1
            eff = sub_bps - wasted
            if eff <= 0:
                raise ValueError(f"{label}: wasted bits exceed sample size")
            if stype == 0:
                v = body.signed(eff)
                x = [v] * nb
            elif stype == 1:
                x = [body.signed(eff) for _ in range(nb)]
            elif 8 <= stype <= 12 or stype >= 32:
                if stype >= 32:
                    order = (stype & 0x1F) + 1
                    warm = [body.signed(eff) for _ in range(order)]
                    prec = body.bits(4) + 1
                    if prec == 16:
                        raise ValueError(f"{label}: invalid LPC precision")
                    shift = body.signed(5)
                    if shift < 0:
                        raise ValueError(f"{label}: negative LPC shift")
                    coefs = [body.signed(prec) for _ in range(order)]
                else:
                    order = stype - 8
                    warm = [body.signed(eff) for _ in range(order)]
                    coefs = [c for c in _FLAC_FIXED_COEF[order]]
                    shift = 0
                method = body.bits(2)
                if method > 1:
                    raise ValueError(f"{label}: reserved residual method")
                porder = body.bits(4)
                nparts = 1 << porder
                if nb % nparts:
                    raise ValueError(
                        f"{label}: block size not divisible by partitions"
                    )
                res = []
                pw = 4 if method == 0 else 5
                esc = (1 << pw) - 1
                for pi in range(nparts):
                    cnt = (nb >> porder) - (order if pi == 0 else 0)
                    if cnt < 0:
                        raise ValueError(f"{label}: partition smaller than order")
                    param = body.bits(pw)
                    if param == esc:
                        raw = body.bits(5)
                        res.extend(
                            body.signed(raw) if raw else 0 for _ in range(cnt)
                        )
                    else:
                        res.extend(body.rice_many(cnt, param))
                # order-specialized integer recurrences (identical
                # arithmetic to the generic indexed sum — the per-sample
                # genexpr was a measured decoder hot spot)
                x = warm
                append = x.append
                if order == 0:
                    x.extend(res)
                elif order == 1:
                    (c0,) = coefs
                    p0 = x[-1]
                    for rv in res:
                        p0 = rv + ((c0 * p0) >> shift)
                        append(p0)
                elif order == 2:
                    c0, c1 = coefs
                    p0, p1 = x[-1], x[-2]
                    for rv in res:
                        v = rv + ((c0 * p0 + c1 * p1) >> shift)
                        append(v)
                        p1 = p0
                        p0 = v
                elif order == 3:
                    c0, c1, c2 = coefs
                    p0, p1, p2 = x[-1], x[-2], x[-3]
                    for rv in res:
                        v = rv + ((c0 * p0 + c1 * p1 + c2 * p2) >> shift)
                        append(v)
                        p2 = p1
                        p1 = p0
                        p0 = v
                elif order == 4:
                    c0, c1, c2, c3 = coefs
                    p0, p1, p2, p3 = x[-1], x[-2], x[-3], x[-4]
                    for rv in res:
                        v = rv + (
                            (c0 * p0 + c1 * p1 + c2 * p2 + c3 * p3) >> shift
                        )
                        append(v)
                        p3 = p2
                        p2 = p1
                        p1 = p0
                        p0 = v
                else:
                    # rolling window w[j] = x[-1-j], zip beats indexing
                    w = x[-order:][::-1]
                    for rv in res:
                        acc = 0
                        for c, s_ in zip(coefs, w):
                            acc += c * s_
                        v = rv + (acc >> shift)
                        append(v)
                        w.pop()
                        w.insert(0, v)
            else:
                raise ValueError(f"{label}: reserved subframe type {stype}")
            if wasted:
                x = [v << wasted for v in x]
            return x

        if nch == 1:
            sub = [read_subframe(f_bps)]
        elif mode == "independent":
            sub = [read_subframe(f_bps), read_subframe(f_bps)]
        elif mode == "left_side":
            sub = [read_subframe(f_bps), read_subframe(f_bps + 1)]
        elif mode == "right_side":
            sub = [read_subframe(f_bps + 1), read_subframe(f_bps)]
        else:
            sub = [read_subframe(f_bps), read_subframe(f_bps + 1)]
        body.align()
        crc16_at = body.pos
        crc_got = int.from_bytes(d[crc16_at : crc16_at + 2], "big")
        if _flac_crc16(d[frame_start:crc16_at]) != crc_got:
            raise ValueError(f"{label}: frame CRC-16 mismatch")
        pos = crc16_at + 2

        if frame_table is not None:
            frame_table.append((got, frame_start - first_frame_at, nb))
        if nch == 2:
            if mode == "left_side":
                left = sub[0]
                right = [l - s_ for l, s_ in zip(sub[0], sub[1])]
            elif mode == "right_side":
                right = sub[1]
                left = [s_ + r_ for s_, r_ in zip(sub[0], sub[1])]
            elif mode == "mid_side":
                left, right = [], []
                for mid, side in zip(sub[0], sub[1]):
                    mid = (mid << 1) | (side & 1)
                    left.append((mid + side) >> 1)
                    right.append((mid - side) >> 1)
            else:
                left, right = sub
            chans[0].extend(left)
            chans[1].extend(right)
        else:
            chans[0].extend(sub[0])
        got += nb

    if got != total:
        raise ValueError(f"{label}: decoded {got} != STREAMINFO total {total}")
    out = np.empty(total * nch, dtype=np.int64)
    for ci in range(nch):
        out[ci::nch] = chans[ci][:total]
    try:
        raw = _flac_pack_samples(out, bps)
    except ValueError:
        raw = b""
    md5_ok = bool(raw) and hashlib.md5(raw).digest() == md5_expect
    return out, nch, rate, bps, total, md5_ok


def encode_flac_assets(
    df: DataFrame,
    id_col: str = "doc_id",
    n_samples_col: str = "n_samples",
    rate_col: str = "sample_rate",
    channels_col: str = "channels",
    mode_col: str | None = None,
    block_col: str | None = None,
) -> DataFrame:
    """Arrow-batched REAL FLAC encode of the full-range int16 lattice
    signal (sample i = ((id + i) * 2557) % 65536 - 32768, the
    encode_wav_assets contract): (id, n_samples, sample_rate, channels
    [, stereo_mode][, block_size]) → (id, content binary). Per-row
    stereo modes exercise all three decorrelation reconstructions and
    per-row block sizes exercise both table-coded and end-of-header
    block-size forms under the gate."""
    spark = df.sparkSession
    _ship_package(spark)
    cols = [id_col, n_samples_col, rate_col, channels_col]
    if mode_col is not None:
        cols.append(mode_col)
    if block_col is not None:
        cols.append(block_col)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from pipes_spark.operators.multimodal import flac_encode_pcm16

        for pdf in batches:
            modes = (
                pdf[mode_col] if mode_col is not None
                else ["independent"] * len(pdf)
            )
            blocks = pdf[block_col] if block_col is not None else [192] * len(pdf)
            blobs = []
            for i, ns, rate, ch, mode, bs in zip(
                pdf[id_col], pdf[n_samples_col], pdf[rate_col],
                pdf[channels_col], modes, blocks,
            ):
                n = int(ns) * int(ch)
                sig = ((np.arange(n, dtype=np.int64) + int(i)) * 2557) % 65536 - 32768
                blobs.append(
                    flac_encode_pcm16(
                        sig, int(rate), channels=int(ch),
                        block_size=int(bs), stereo_mode=str(mode),
                    )
                )
            yield pd.DataFrame(
                {"asset_id": pdf[id_col].astype("int64"), "content": blobs}
            )

    return df.select(*cols).mapInPandas(
        gen, "asset_id bigint, content binary"
    )


def flac_decode_stats(assets: DataFrame) -> DataFrame:
    """REAL FLAC decode over Arrow batches — the full :func:`flac_decode`
    chain (metadata walk, CRC-8/CRC-16-verified frames, Rice residual
    decode, FIXED/LPC prediction, stereo un-decorrelation) plus a
    sample checksum AND the STREAMINFO MD5 recomputation: (asset_id,
    format, n_channels, sample_rate, bit_depth, n_samples, sample_sum,
    sample_abs_max, md5_ok). A hash-match against the closed-form
    lattice oracle with md5_ok = TRUE certifies byte-exact lossless
    reconstruction — the strongest decode proof in the audio family."""
    spark = assets.sparkSession
    _ship_package(spark)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from pipes_spark.operators.multimodal import flac_decode

        for pdf in batches:
            out = {k: [] for k in (
                "asset_id", "format", "n_channels", "sample_rate",
                "bit_depth", "n_samples", "sample_sum", "sample_abs_max",
                "md5_ok",
            )}
            for aid, content in zip(pdf["asset_id"], pdf["content"]):
                samples, nch, rate, bps, total, md5_ok = flac_decode(
                    bytes(content), label=f"asset {aid}"
                )
                out["asset_id"].append(int(aid))
                out["format"].append("flac")
                out["n_channels"].append(int(nch))
                out["sample_rate"].append(int(rate))
                out["bit_depth"].append(int(bps))
                out["n_samples"].append(int(total))
                out["sample_sum"].append(int(samples.sum(dtype=np.int64)))
                out["sample_abs_max"].append(int(np.abs(samples).max()))
                out["md5_ok"].append(bool(md5_ok))
            yield pd.DataFrame(out)

    return assets.mapInPandas(
        gen,
        "asset_id bigint, format string, n_channels int, sample_rate int, "
        "bit_depth int, n_samples bigint, sample_sum bigint, "
        "sample_abs_max bigint, md5_ok boolean",
    )


# --------------------------------------------------------------------------
# FLV / Screen Video: REAL INTER-FRAME video from the public Adobe "Video
# File Format Specification v10" (FLV container, VIDEODATA codec id 3 =
# Screen video) — round 11. The first true inter-frame codec path: frames
# are grids of zlib-compressed BGR blocks ordered from the bottom-left,
# and an inter frame transmits ONLY the blocks that changed (a 16-bit
# zero data size means "hold the previous frame's block") — so decoding
# frame N requires the persisted canvas of frames 0..N-1, the semantics
# the AVI paths (full frames) never exercised. The remaining video stub
# narrows to motion-compensated codecs (H.264-class).
# --------------------------------------------------------------------------


def flv_screen_encode(frames, block: int = 32, fps: int = 25) -> bytes:
    """REAL FLV + Screen-Video encode: list of (h, w, 3) uint8 RGB
    frames (same dims) → FLV stream. Frame 0 is a keyframe carrying
    every block; later frames are inter frames carrying only blocks
    whose pixels differ from the previous frame. Blocks are clipped at
    the right and TOP edges (the grid grows from the bottom-left per
    spec), pixels are stored as bottom-up BGR rows, each block deflated
    with stdlib zlib."""
    import struct
    import zlib as _z

    import numpy as np

    if block not in (16, 32, 64, 128, 256):
        raise ValueError("block must be a multiple of 16 up to 256")
    fr = [np.asarray(f, dtype=np.uint8) for f in frames]
    if not fr:
        raise ValueError("need at least one frame")
    h, w = fr[0].shape[:2]
    if any(f.shape != (h, w, 3) for f in fr):
        raise ValueError("all frames must be (h, w, 3) and same size")
    if not (0 < w < 4096 and 0 < h < 4096):
        raise ValueError("dimensions out of the 12-bit FLV range")
    ncols = (w + block - 1) // block
    nrows = (h + block - 1) // block

    def block_bounds(br, bc):
        # block row 0 is the BOTTOM strip; the top strip is clipped
        y1 = h - br * block
        y0 = max(0, y1 - block)
        x0 = bc * block
        x1 = min(w, x0 + block)
        return y0, y1, x0, x1

    def block_bytes(f, br, bc):
        y0, y1, x0, x1 = block_bounds(br, bc)
        cut = f[y0:y1, x0:x1, ::-1]  # RGB -> BGR
        return cut[::-1].tobytes()  # bottom-up rows

    out = bytearray(b"FLV\x01\x01\x00\x00\x00\x09")
    out += struct.pack(">I", 0)  # PreviousTagSize0
    for idx, f in enumerate(fr):
        body = bytearray()
        key = idx == 0
        body.append((0x10 if key else 0x20) | 0x03)  # frametype | codec 3
        hdr = ((block // 16 - 1) << 28) | (w << 16) | ((block // 16 - 1) << 12) | h
        body += struct.pack(">I", hdr)
        for br in range(nrows):
            for bc in range(ncols):
                blk = block_bytes(f, br, bc)
                if not key and blk == block_bytes(fr[idx - 1], br, bc):
                    body += b"\x00\x00"
                    continue
                comp = _z.compress(blk)
                if len(comp) > 0xFFFF:
                    raise ValueError("compressed block exceeds 16-bit size")
                body += struct.pack(">H", len(comp)) + comp
        ts = idx * (1000 // fps)
        out += bytes([9])  # video tag
        out += len(body).to_bytes(3, "big")
        out += (ts & 0xFFFFFF).to_bytes(3, "big")
        out += bytes([(ts >> 24) & 0xFF])
        out += b"\x00\x00\x00"  # stream id
        out += body
        out += struct.pack(">I", 11 + len(body))
    return bytes(out)


def flv_screen_decode(content: bytes, label: str = "asset"):
    """REAL FLV + Screen-Video decode: FLV header and tag walk
    (PreviousTagSize cross-checked), per-frame SCREENVIDEOPACKET parse,
    zlib block inflation into a PERSISTENT canvas (empty blocks hold
    the previous frame's pixels — the inter-frame contract), bottom-up
    BGR de-swizzle. Returns a list of (timestamp_ms, frame (h, w, 3)
    RGB uint8, n_blocks_updated). Raises loudly on non-screen codecs,
    an inter frame before any keyframe, size mismatches, or broken tag
    framing."""
    import struct
    import zlib as _z

    import numpy as np

    d = bytes(content)
    if d[:3] != b"FLV" or d[3] != 1:
        raise ValueError(f"{label}: not an FLV stream")
    off = int.from_bytes(d[5:9], "big")
    if off < 9:
        raise ValueError(f"{label}: bad FLV data offset")
    pos = off
    if d[pos : pos + 4] != b"\x00\x00\x00\x00":
        raise ValueError(f"{label}: missing PreviousTagSize0")
    pos += 4
    canvas = None
    frames = []
    dims = None
    while pos < len(d):
        if pos + 11 > len(d):
            raise ValueError(f"{label}: truncated tag header")
        ttype = d[pos]
        dsize = int.from_bytes(d[pos + 1 : pos + 4], "big")
        ts = int.from_bytes(d[pos + 4 : pos + 7], "big") | (d[pos + 7] << 24)
        data = d[pos + 11 : pos + 11 + dsize]
        if len(data) != dsize:
            raise ValueError(f"{label}: truncated tag body")
        after = pos + 11 + dsize
        (ptag,) = struct.unpack(">I", d[after : after + 4])
        if ptag != 11 + dsize:
            raise ValueError(f"{label}: PreviousTagSize mismatch")
        pos = after + 4
        if ttype != 9:
            continue  # audio/script tags are legal, skipped
        ftype = data[0] >> 4
        codec = data[0] & 0xF
        if codec != 3:
            raise ValueError(
                f"{label}: codec id {codec} unsupported (screen video only; "
                "motion-compensated codecs need an external library)"
            )
        (hdr,) = struct.unpack(">I", data[1:5])
        bw = ((hdr >> 28) + 1) * 16
        w = (hdr >> 16) & 0xFFF
        bh = (((hdr >> 12) & 0xF) + 1) * 16
        h = hdr & 0xFFF
        if dims is None:
            dims = (h, w, bw, bh)
            canvas = np.zeros((h, w, 3), dtype=np.uint8)
        elif dims != (h, w, bw, bh):
            raise ValueError(f"{label}: frame geometry changed mid-stream")
        if canvas is None or (ftype == 2 and not frames):
            raise ValueError(f"{label}: inter frame before any keyframe")
        if ftype not in (1, 2):
            raise ValueError(f"{label}: frame type {ftype} unsupported")
        ncols = (w + bw - 1) // bw
        nrows = (h + bh - 1) // bh
        p = 5
        updated = 0
        for br in range(nrows):
            for bc in range(ncols):
                if p + 2 > len(data):
                    raise ValueError(f"{label}: truncated block table")
                (bsize,) = struct.unpack(">H", data[p : p + 2])
                p += 2
                y1 = h - br * bh
                y0 = max(0, y1 - bh)
                x0 = bc * bw
                x1 = min(w, x0 + bw)
                if bsize == 0:
                    if ftype == 1:
                        raise ValueError(
                            f"{label}: keyframe with an empty block"
                        )
                    continue
                raw = _z.decompress(data[p : p + bsize])
                p += bsize
                if len(raw) != (y1 - y0) * (x1 - x0) * 3:
                    raise ValueError(f"{label}: block pixel count mismatch")
                blk = np.frombuffer(raw, dtype=np.uint8).reshape(
                    y1 - y0, x1 - x0, 3
                )
                canvas[y0:y1, x0:x1] = blk[::-1, :, ::-1]  # un-flip, BGR->RGB
                updated += 1
        if p != len(data):
            raise ValueError(f"{label}: trailing bytes in video tag")
        frames.append((ts, canvas.copy(), updated))
    if not frames:
        raise ValueError(f"{label}: no video frames")
    return frames


def flv_screen_block_frames(
    asset_id: int, width: int, height: int, n_frames: int, block: int = 32
):
    """Deterministic inter-frame test content: frame 0 is a
    block-constant lattice (block b value = (asset_id * 3 + b * 7) %
    256 on all three channels); each inter frame f >= 1 repaints ONLY
    block f % n_blocks to the constant (asset_id + b * 5 + f * 17) %
    256 — so every later frame's pixels depend on the whole persisted
    update history, which is exactly what the closed-form oracle
    recomputes."""
    import numpy as np

    ncols = (width + block - 1) // block
    nrows = (height + block - 1) // block
    nb = ncols * nrows
    frames = []
    canvas = np.zeros((height, width, 3), dtype=np.uint8)
    for br in range(nrows):
        for bc in range(ncols):
            b = br * ncols + bc
            y1 = height - br * block
            y0 = max(0, y1 - block)
            canvas[y0:y1, bc * block : min(width, (bc + 1) * block)] = (
                asset_id * 3 + b * 7
            ) % 256
    frames.append(canvas.copy())
    for f in range(1, n_frames):
        b = f % nb
        br, bc = divmod(b, ncols)
        y1 = height - br * block
        y0 = max(0, y1 - block)
        canvas[y0:y1, bc * block : min(width, (bc + 1) * block)] = (
            asset_id + b * 5 + f * 17
        ) % 256
        frames.append(canvas.copy())
    return frames


def encode_flv_screen_assets(
    df: DataFrame,
    id_col: str = "doc_id",
    width_col: str = "width",
    height_col: str = "height",
    frames_col: str = "n_frames",
) -> DataFrame:
    """Arrow-batched REAL FLV/Screen-Video encode of the deterministic
    inter-frame lattice: (id, width, height, n_frames) → (id, content
    binary). Pixels never cross a shuffle."""
    spark = df.sparkSession
    _ship_package(spark)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pipes_spark.operators.multimodal import (
            flv_screen_block_frames,
            flv_screen_encode,
        )

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "asset_id": pdf[id_col].astype("int64"),
                    "content": [
                        flv_screen_encode(
                            flv_screen_block_frames(
                                int(i), int(w), int(h), int(n)
                            )
                        )
                        for i, w, h, n in zip(
                            pdf[id_col], pdf[width_col], pdf[height_col],
                            pdf[frames_col],
                        )
                    ],
                }
            )

    return df.select(id_col, width_col, height_col, frames_col).mapInPandas(
        gen, "asset_id bigint, content binary"
    )


def flv_screen_frame_stats(assets: DataFrame) -> DataFrame:
    """REAL inter-frame video decode over Arrow batches — the full
    :func:`flv_screen_decode` chain — one row per frame: (asset_id,
    frame_no, width, height, n_blocks_updated, pixel_sum). pixel_sum is
    over ONE channel (the content is gray); because inter frames carry
    only the changed block, every frame's sum can only be right if the
    canvas persisted every earlier update — the inter-frame contract
    the hash gate certifies."""
    spark = assets.sparkSession
    _ship_package(spark)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from pipes_spark.operators.multimodal import flv_screen_decode

        for pdf in batches:
            out = {k: [] for k in (
                "asset_id", "frame_no", "width", "height",
                "n_blocks_updated", "pixel_sum",
            )}
            for aid, content in zip(pdf["asset_id"], pdf["content"]):
                for fno, (_ts, frame, updated) in enumerate(
                    flv_screen_decode(bytes(content), label=f"asset {aid}")
                ):
                    out["asset_id"].append(int(aid))
                    out["frame_no"].append(fno)
                    out["height"].append(int(frame.shape[0]))
                    out["width"].append(int(frame.shape[1]))
                    out["n_blocks_updated"].append(int(updated))
                    out["pixel_sum"].append(
                        int(frame[:, :, 0].sum(dtype=np.int64))
                    )
            yield pd.DataFrame(out)

    return assets.mapInPandas(
        gen,
        "asset_id bigint, frame_no int, width int, height int, "
        "n_blocks_updated int, pixel_sum bigint",
    )


def flac_add_metadata(
    content: bytes,
    tags=None,
    vendor: str = "pipes_spark flac",
    seek_every: int = 0,
    padding: int = 0,
) -> bytes:
    """Splice SEEKTABLE / VORBIS_COMMENT / PADDING metadata blocks into
    a FLAC stream (RFC 9639 metadata block framing; the Vorbis comment
    payload uses ITS spec's little-endian lengths inside FLAC's
    otherwise big-endian layout). ``seek_every`` > 0 writes one
    18-byte seek point per that many frames: (first sample, byte offset
    from the first frame byte, samples in frame) — offsets are
    recomputed by walking the real frame headers, so a later
    :func:`flac_parse_metadata` can verify each point lands on a sync
    code carrying exactly that sample number."""
    import struct

    d = bytes(content)
    if d[:4] != b"fLaC":
        raise ValueError("not a FLAC stream")
    # walk existing metadata to find the first frame
    pos = 4
    blocks = []
    while True:
        hdr = d[pos]
        blen = int.from_bytes(d[pos + 1 : pos + 4], "big")
        blocks.append((hdr & 0x7F, d[pos + 4 : pos + 4 + blen]))
        pos += 4 + blen
        if hdr & 0x80:
            break
    audio = d[pos:]

    new = []
    if seek_every > 0:
        # a real decode is the only exact frame locator (frames are not
        # length-prefixed); it also guards the splice with CRC checks
        ft = []
        flac_decode(d, label="seektable source", frame_table=ft)
        body = b"".join(
            struct.pack(">QQH", sn, off, cnt)
            for i, (sn, off, cnt) in enumerate(ft)
            if i % seek_every == 0
        )
        new.append((3, body))
    if tags is not None:
        vb = vendor.encode()
        body = struct.pack("<I", len(vb)) + vb
        body += struct.pack("<I", len(tags))
        for k, v in tags:
            kv = f"{k}={v}".encode()
            body += struct.pack("<I", len(kv)) + kv
        new.append((4, body))
    if padding > 0:
        new.append((1, bytes(padding)))

    out = bytearray(b"fLaC")
    allb = blocks + new
    for i, (btype, body) in enumerate(allb):
        last = 0x80 if i == len(allb) - 1 else 0
        out.append(last | btype)
        out += len(body).to_bytes(3, "big")
        out += body
    return bytes(out + audio)


def flac_parse_metadata(content: bytes, label: str = "asset"):
    """Parse every FLAC metadata block: returns a list of dicts —
    {'type': 'STREAMINFO'|'SEEKTABLE'|'VORBIS_COMMENT'|'PADDING'|...,
    plus type-specific fields}. Vorbis comments are split into
    (key, value) pairs (case-insensitive keys uppercased per the Vorbis
    spec); seek points are (sample_number, offset, n_samples) triples
    verified well-formed (18-byte multiples, ascending samples)."""
    import struct

    d = bytes(content)
    if d[:4] != b"fLaC":
        raise ValueError(f"{label}: not a FLAC stream")
    pos = 4
    out = []
    names = {0: "STREAMINFO", 1: "PADDING", 2: "APPLICATION",
             3: "SEEKTABLE", 4: "VORBIS_COMMENT", 5: "CUESHEET",
             6: "PICTURE"}
    while True:
        hdr = d[pos]
        btype = hdr & 0x7F
        blen = int.from_bytes(d[pos + 1 : pos + 4], "big")
        body = d[pos + 4 : pos + 4 + blen]
        if len(body) != blen:
            raise ValueError(f"{label}: truncated metadata block")
        entry = {"type": names.get(btype, f"RESERVED_{btype}"),
                 "length": blen}
        if btype == 3:
            if blen % 18:
                raise ValueError(f"{label}: SEEKTABLE not 18-byte aligned")
            pts = [
                struct.unpack(">QQH", body[i : i + 18])
                for i in range(0, blen, 18)
            ]
            real = [p for p in pts if p[0] != 0xFFFFFFFFFFFFFFFF]
            if any(b[0] <= a[0] for a, b in zip(real, real[1:])):
                raise ValueError(f"{label}: seek points not ascending")
            entry["points"] = pts
        elif btype == 4:
            (vlen,) = struct.unpack("<I", body[:4])
            entry["vendor"] = body[4 : 4 + vlen].decode()
            p = 4 + vlen
            (n,) = struct.unpack("<I", body[p : p + 4])
            p += 4
            comments = []
            for _ in range(n):
                (clen,) = struct.unpack("<I", body[p : p + 4])
                p += 4
                kv = body[p : p + clen].decode()
                p += clen
                if "=" not in kv:
                    raise ValueError(f"{label}: comment without '='")
                k, v = kv.split("=", 1)
                comments.append((k.upper(), v))
            entry["comments"] = comments
        out.append(entry)
        pos += 4 + blen
        if hdr & 0x80:
            break
    return out


def encode_flac_tagged_assets(
    df: DataFrame,
    id_col: str = "doc_id",
    n_samples_col: str = "n_samples",
) -> DataFrame:
    """Arrow-batched FLAC encode with metadata: the lattice signal
    (mono, 16 kHz, block 192) plus per-doc Vorbis comments and a
    per-frame seek table: (id, n_samples) → (id, content binary)."""
    spark = df.sparkSession
    _ship_package(spark)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from pipes_spark.operators.multimodal import (
            flac_add_metadata,
            flac_encode_pcm16,
        )

        for pdf in batches:
            blobs = []
            for i, ns in zip(pdf[id_col], pdf[n_samples_col]):
                i, ns = int(i), int(ns)
                sig = ((np.arange(ns, dtype=np.int64) + i) * 2557) % 65536 - 32768
                raw = flac_encode_pcm16(sig, 16000, block_size=192)
                blobs.append(
                    flac_add_metadata(
                        raw,
                        tags=[
                            ("TITLE", f"doc_{i}"),
                            ("ARTIST", f"artist_{i % 7}"),
                            ("TRACKNUMBER", str(i % 12 + 1)),
                        ],
                        seek_every=1,
                        padding=16,
                    )
                )
            yield pd.DataFrame(
                {"asset_id": pdf[id_col].astype("int64"), "content": blobs}
            )

    return df.select(id_col, n_samples_col).mapInPandas(
        gen, "asset_id bigint, content binary"
    )


def flac_metadata_rows(assets: DataFrame) -> DataFrame:
    """FLAC metadata extraction over Arrow batches — the audio analog
    of EXIF extraction: one row per metadata item: (asset_id,
    block_type, item, value). Vorbis comments → (key, value); seek
    points → ('seekpoint_<i>', 'sample/count') with the byte offset
    deliberately EXCLUDED (it depends on compressed frame sizes, so it
    is verified in pytest against real frame syncs instead of the
    closed-form oracle); padding → its length. The decoded stream
    itself is additionally MD5-verified so the metadata splice is
    proven not to corrupt audio."""
    spark = assets.sparkSession
    _ship_package(spark)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pipes_spark.operators.multimodal import (
            flac_decode,
            flac_parse_metadata,
        )

        for pdf in batches:
            out = {k: [] for k in ("asset_id", "block_type", "item", "value")}

            for aid, content in zip(pdf["asset_id"], pdf["content"]):
                b = bytes(content)
                *_, md5_ok = flac_decode(b, label=f"asset {aid}")
                if not md5_ok:
                    raise ValueError(f"asset {aid}: audio corrupted by splice")
                rows = []
                for entry in flac_parse_metadata(b, label=f"asset {aid}"):
                    if entry["type"] == "VORBIS_COMMENT":
                        rows.append(("VORBIS_COMMENT", "vendor", entry["vendor"]))
                        for k, v in entry["comments"]:
                            rows.append(("VORBIS_COMMENT", k, v))
                    elif entry["type"] == "SEEKTABLE":
                        for i, (sn, _off, cnt) in enumerate(entry["points"]):
                            rows.append(("SEEKTABLE", f"seekpoint_{i}",
                                         f"{sn}/{cnt}"))
                    elif entry["type"] == "PADDING":
                        rows.append(("PADDING", "length", str(entry["length"])))
                # emit per-asset rows in (block_type, item) string order —
                # the catalog query's output order contract, so the
                # range-sorted input needs no final orderBy (same multiset)
                for bt, item, value in sorted(rows, key=lambda r: (r[0], r[1])):
                    out["asset_id"].append(int(aid))
                    out["block_type"].append(bt)
                    out["item"].append(item)
                    out["value"].append(value)
            yield pd.DataFrame(out)

    return assets.mapInPandas(
        gen, "asset_id bigint, block_type string, item string, value string"
    )
