#!/usr/bin/env python
"""streaming_ingest — incremental corpus ingestion as a streaming pipeline:

    document stream (file source, one micro-batch per file)
        ──> dedup against the persistent fingerprint store
            (all-history anti-join — a doc seen in ANY earlier batch
             is rejected; streaming.stream_dedup_against_store)
        ──> quality gate (alpha ratio + token count floors)
        ──> token-window chunking (context-window preparation)
        ──> chunk manifest parquet + admission report

This is the ingestion loop a training corpus actually runs: every new
crawl drop lands as a micro-batch, only never-seen documents get through,
and what survives is already chunked for the trainer. Batch and streaming
stages compose — the dedup runs the stream to completion (availableNow),
and the downstream curation is plain DataFrame composition on its result.

Usage: python examples/streaming_ingest.py [SF_DIR] [OUT_DIR]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import pipes_spark as ps
from pipes_spark.operators.text import chunk_token_windows, with_quality_scores
from pipes_spark.sources import load_table
from pipes_spark.streaming import stream_dedup_against_store


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(prefix="ingest_")
    spark = ps.get_spark("streaming_ingest")

    # stage the corpus as TWO "crawl drops" (micro-batches), the second
    # containing duplicates of the first — the store must reject them
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text", "source")
    drop_dir = tempfile.mkdtemp(prefix="ingest_drops_")
    docs.filter(F.col("doc_id") % 2 == 0).coalesce(1).write.parquet(f"{drop_dir}/d0")
    second = docs.filter(F.col("doc_id") % 2 == 1).unionByName(
        # re-crawled copies of already-admitted docs (same text, new ids)
        docs.filter(F.col("doc_id") % 2 == 0)
        .limit(20)
        .withColumn("doc_id", F.col("doc_id") + 10_000_000)
    )
    second.coalesce(1).write.parquet(f"{drop_dir}/d1")
    flat = tempfile.mkdtemp(prefix="ingest_flat_")
    n = 0
    for sub in ("d0", "d1"):
        for f in sorted(os.listdir(f"{drop_dir}/{sub}")):
            if f.endswith(".parquet"):
                os.symlink(f"{drop_dir}/{sub}/{f}", f"{flat}/{n:02d}.parquet")
                n += 1

    stream = (
        spark.readStream.schema("doc_id long, text string, source string")
        .option("maxFilesPerTrigger", 1)
        .parquet(flat)
    )
    admitted = stream_dedup_against_store(stream, "text", "doc_id")

    gated = (
        with_quality_scores(admitted)
        .filter((F.col("alpha_ratio") >= 0.5))
        .drop("alpha_ratio", "digit_ratio", "space_ratio", "stopword_ratio")
    )
    chunks = chunk_token_windows(gated, max_tokens=32, stride=24)
    chunks.write.mode("overwrite").parquet(f"{out_dir}/chunks")

    n_docs = docs.count()
    n_admitted = admitted.count()
    n_chunks = spark.read.parquet(f"{out_dir}/chunks").count()
    print(f"stream drops: 2, source docs: {n_docs} (+20 re-crawled dupes)")
    print(f"admitted (store-deduped): {n_admitted}")
    print(f"chunks written: {n_chunks} -> {out_dir}/chunks")
    return 0 if n_admitted <= n_docs else 1


if __name__ == "__main__":
    raise SystemExit(main())
