#!/usr/bin/env python
"""Round-11 second-session scale probe: run the eight brand-new queries
(seven codec families + EXIF) at sf0.01 and sf0.1 and report the wall
ratio. All eight are embarrassingly parallel mapInPandas chains over the
documents table (content generated per row, decoded per row, only stats
cross the shuffle), so the design expectation is ~linear in rows with
partition parallelism absorbing the 10×; a super-linear ratio would
indicate a per-partition fixed cost or skew worth a look.

Usage: python tools/scale_probe_r11b.py   (ONE Spark process at a time)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NEW = [
    "multimodal_adpcm_roundtrip",
    "multimodal_aiff_roundtrip",
    "multimodal_bmp_roundtrip",
    "multimodal_tiff_roundtrip",
    "multimodal_video_rle_frame_sample",
    "multimodal_jpeg_lossless_roundtrip",
    "multimodal_jpeg_hierarchical_roundtrip",
    "multimodal_exif_metadata",
]


def main() -> None:
    from pipes_spark.catalog import QUERIES
    from pipes_spark.session import get_spark

    spark = get_spark("scale_probe_r11b")

    def run_noop(df):
        df.write.mode("overwrite").format("noop").save()
    spark.range(1000).selectExpr("sum(id)").collect()  # warm JVM
    for name in NEW:
        spec = QUERIES[name]
        times = {}
        for sf in ("/root/testdata/sf0.01", "/root/testdata/sf0.1"):
            # warm pass then measured pass (plan/codegen compile excluded)
            run_noop(spec.fn(spark, sf))
            t0 = time.perf_counter()
            run_noop(spec.fn(spark, sf))
            times[sf] = time.perf_counter() - t0
        r = times["/root/testdata/sf0.1"] / max(times["/root/testdata/sf0.01"], 1e-9)
        print(
            f"{name}: sf0.01 {times['/root/testdata/sf0.01']:.2f}s  "
            f"sf0.1 {times['/root/testdata/sf0.1']:.2f}s  ratio {r:.1f}x",
            flush=True,
        )


if __name__ == "__main__":
    main()
