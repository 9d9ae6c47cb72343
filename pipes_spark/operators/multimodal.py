"""Multimodal-column operators: image/audio/video as opaque ``binary``
columns with typed metadata (SURVEY.md §2.C extensions).

The Spark-side plumbing — schema, Arrow batch shape, mapInPandas signatures,
partition sizing — is real and tested. The actual codec step is STUBBED:
image/audio libraries are not in this container, so ``decode_image`` either
raises ``NotImplementedError`` (real mode) or produces a deterministic fake
decode (test mode). Swapping in PIL/ffmpeg later changes only the body of
``_decode_batch``.

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

    Real mode raises: the image/audio codecs are not installed here. Fake
    mode derives deterministic 'features' from the raw bytes so the full
    distributed pipeline (schema, batching, shuffle) is exercised end-to-end.
    """
    if not fake:
        raise NotImplementedError(
            "media codecs (PIL/ffmpeg) are not available in this environment; "
            "use fake=True for the deterministic test decode"
        )
    import numpy as np

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
    canonical shape for any decode/resize/frame-sample operator)."""

    _ship_package(assets.sparkSession)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                yield _decode_batch(pdf, fake)

    return assets.mapInPandas(gen, schema=FEATURE_SCHEMA)


def frame_sample(assets: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """'Frame sampling' stand-in for video: emit one row per sampled offset
    (1→N explode via mapInPandas, the real sampler's exact plumbing)."""

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


def resize_stub(assets: DataFrame, width: int = 32, height: int = 32) -> DataFrame:
    """'Resize' stand-in for images: emit a fixed-size byte payload per asset
    (truncate / zero-pad to width·height) with updated metadata — the exact
    plumbing of a real thumbnailer (binary in, binary out, metadata rewrite);
    a real codec changes only the body."""

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


def perceptual_hash(assets: DataFrame, fake: bool = True) -> DataFrame:
    """64-bit perceptual hash per asset — the image-dedup fingerprint
    (aHash family: bit i says whether region i is brighter than the
    asset's mean). Real mode would decode to grayscale pixels first and
    hash 8×8 downsampled blocks; with no codecs in this container the
    deterministic stand-in applies the IDENTICAL rule to the raw byte
    stream split into 64 equal blocks — the hash math, Arrow batching,
    and pair plumbing are the real thing, only the decode differs.

    Returns ``(asset_id, phash bigint)`` — 8 bytes per asset through any
    downstream shuffle, never the content.
    """
    from .scale import ensure_min_partitions

    _ship_package(assets.sparkSession)
    assets = ensure_min_partitions(assets)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        if not fake:
            raise NotImplementedError(
                "media codecs (PIL/ffmpeg) are not available in this "
                "environment; use fake=True for the deterministic byte-block hash"
            )
        for pdf in batches:
            if not len(pdf):
                continue
            out = []
            for asset_id, content in zip(pdf["asset_id"], pdf["content"]):
                arr = np.frombuffer(content, dtype=np.uint8)
                if arr.size == 0:
                    arr = np.zeros(64, dtype=np.uint8)
                pad = (-arr.size) % 64
                a = np.pad(arr, (0, pad), mode="wrap")
                blocks = a.reshape(64, -1).mean(axis=1)
                bits = blocks > blocks.mean()
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
