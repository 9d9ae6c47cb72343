#!/usr/bin/env python
"""media_pipeline — a multimodal ingest pipeline composed from the REAL
from-the-spec codecs through the dataflow-graph API:

    documents ──> per-doc media manifest (dims / frames / samples)
        ──┬──> image branch: JPEG encode ──> decode stats  ─┐
          ├──> audio branch: WAV encode  ──> PCM features  ─┼──> fan-in
          └──> video branch: AVI encode  ──> frame samples ─┘     │
                                                 unified media report

Every codec here is implemented from its public spec inside the engine
(T.81 JPEG, RIFF/WAVE, RIFF/AVI + Motion-JPEG) — no PIL/ffmpeg. The
fan-out runs the three modality branches off one manifest scan; the
fan-in (UNION ALL of per-modality stat rows normalized to a common
schema) is the Joiner contract (ref: pipe/node.go:25-28). Pixels and
samples never cross a shuffle: each branch is an encode→decode
mapInPandas chain that reduces to metadata before the union.

Usage: python examples/media_pipeline.py [SF_DIR]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import pipes_spark as ps
from pipes_spark import Final, Middle, NodesMap, Pipeline, Start
from pipes_spark.operators.multimodal import (
    audio_pcm_features,
    avi_frame_sample_stats,
    encode_avi_assets,
    encode_jpeg_assets,
    encode_wav_assets,
    jpeg_decode_stats,
)
from pipes_spark.sources import load_table


class MediaPipeline(NodesMap):
    manifest = Start()   # per-doc media parameters
    image = Middle()     # JPEG encode -> decode stats
    audio = Middle()     # WAV encode -> PCM features
    video = Middle()     # AVI/MJPEG encode -> sampled-frame stats
    report = Final()     # fan-in: one row per (modality, asset)

    def connect(self):
        self.manifest.send_to(self.image, self.audio, self.video)
        self.image.send_to(self.report)
        self.audio.send_to(self.report)
        self.video.send_to(self.report)


_REPORT_COLS = ["asset_id", "modality", "units", "checksum"]


def build(spark, sf_dir: str, collected: dict):
    p = Pipeline(MediaPipeline, spark=spark)

    def manifest(s):
        return load_table(s, sf_dir, "documents").select(
            "doc_id",
            (F.col("doc_id") % 27 + 1).cast("int").alias("width"),
            ((F.col("doc_id") * 3) % 21 + 1).cast("int").alias("height"),
            (F.col("doc_id") % 200 + 20).cast("int").alias("n_samples"),
            F.lit(8000).cast("int").alias("sample_rate"),
            (F.col("doc_id") % 2 + 1).cast("int").alias("channels"),
            (F.col("doc_id") % 4 + 2).cast("int").alias("n_frames"),
        )

    def image(df):
        stats = jpeg_decode_stats(
            encode_jpeg_assets(df, "doc_id", "width", "height")
        )
        return stats.select(
            "asset_id",
            F.lit("image").alias("modality"),
            F.col("n_pixels").alias("units"),
            F.col("pixel_sum").alias("checksum"),
        )

    def audio(df):
        feats = audio_pcm_features(
            encode_wav_assets(df, "doc_id", "n_samples", "sample_rate", "channels")
        )
        return feats.select(
            "asset_id",
            F.lit("audio").alias("modality"),
            F.col("n_samples").alias("units"),
            F.col("zero_crossings").alias("checksum"),
        )

    def video(df):
        frames = avi_frame_sample_stats(
            encode_avi_assets(df, "doc_id", "width", "height", "n_frames")
        )
        return (
            frames.groupBy("asset_id")
            .agg(
                F.count(F.lit(1)).alias("units"),
                F.sum("pixel_sum").alias("checksum"),
            )
            .select(
                "asset_id",
                F.lit("video").alias("modality"),
                "units",
                "checksum",
            )
        )

    def report(df):
        rows = df.groupBy("modality").agg(
            F.count(F.lit(1)).alias("n_assets"),
            F.sum("checksum").alias("total_checksum"),
        )
        collected["report"] = {r["modality"]: r.asDict() for r in rows.collect()}

    p.add_start("manifest", manifest)
    p.add_middle("image", image)
    p.add_middle("audio", audio)
    p.add_middle("video", video)
    p.add_final("report", report)
    return p


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = ps.get_spark("media_pipeline", shuffle_partitions=8)
    got: dict = {}
    build(spark, sf_dir, got).build().start().done()
    for modality, row in sorted(got["report"].items()):
        print(f"{modality}: {row['n_assets']} assets, checksum {row['total_checksum']}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
