#!/usr/bin/env python
"""embedding_pipeline — the embedding half of a training-data pipeline,
composed through the dataflow-graph API:

    embeddings ──> semantic dedup (distributed k-means → SemDeDup
        within-cluster pruning, arXiv:2303.09540)
        ──┬──> PQ-encode (m-byte codes + recon norm) ──> parquet
          │        (the 32×-smaller ANN serving tier, Jégou 2011)
          ├──> per-cluster size/cohesion report ──> collect
          └──> ANN self-probe: PQ-ADC top-k for a sample of queries
               against the deduped corpus ──> collect

The k-means fit runs inside the dedup node's body (driver-held k×dim
codebook, one tiny DECIMAL aggregate per Lloyd round); everything
downstream is declarative DataFrame composition, so the fan-out
materializes the deduped corpus once and feeds all three sinks.

Usage: python examples/embedding_pipeline.py [SF_DIR] [OUT_DIR]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import pipes_spark as ps
from pipes_spark import Final, Middle, NodesMap, Pipeline, Start
from pipes_spark.operators.clustering import (
    kmeans_cluster_stats,
    kmeans_fit,
    semantic_dedup_keep,
)
from pipes_spark.operators.similarity import fit_pq_codebooks, pq_adc_topk, pq_encode
from pipes_spark.sinks import write_parquet
from pipes_spark.sources import load_table


class EmbeddingPipeline(NodesMap):
    source = Start()
    dedup = Middle()
    encode = Middle()
    probe = Middle()
    stats = Middle()
    write_codes = Final()
    collect_stats = Final()
    collect_probe = Final()

    def connect(self):
        self.source.send_to(self.dedup)
        self.dedup.send_to(self.encode, self.stats, self.probe)
        self.encode.send_to(self.write_codes)
        self.stats.send_to(self.collect_stats)
        self.probe.send_to(self.collect_probe)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(prefix="emb_pipe_")
    spark = ps.get_spark("embedding_pipeline")

    state: dict = {}

    def dedup(df):
        state["centroids"] = kmeans_fit(df, k=8, iters=3, seed=42)
        return semantic_dedup_keep(df, state["centroids"], threshold=0.3)

    def encode(df):
        state["books"] = fit_pq_codebooks(df, m=8, num_codes=64, iters=5)
        return pq_encode(df, state["books"])

    def probe(df):
        qs = df.filter(F.col("vec_id") % 100 == 0)
        return pq_adc_topk(df, qs, state["books"], k=3)

    pipe = Pipeline(EmbeddingPipeline, spark=spark)
    pipe.add_start("source", lambda s: load_table(s, sf_dir, "embeddings"))
    pipe.add_middle("dedup", dedup)
    pipe.add_middle("encode", encode)
    pipe.add_middle("stats", lambda df: kmeans_cluster_stats(df, state["centroids"]))
    pipe.add_middle("probe", probe)
    pipe.add_final("write_codes", write_parquet(f"{out_dir}/pq_codes"))
    pipe.add_final("collect_stats", lambda df: df.collect())
    pipe.add_final("collect_probe", lambda df: df.collect())

    results = pipe.build().start().done()
    stats_rows = results["collect_stats"]
    probe_rows = results["collect_probe"]
    kept = sum(r["n_members"] for r in stats_rows)
    print(f"clusters: {len(stats_rows)}, kept vectors: {kept}")
    for r in sorted(stats_rows, key=lambda r: r["cluster_id"])[:4]:
        print(f"  cluster {r['cluster_id']}: n={r['n_members']} avg_cos={r['avg_cosine']}")
    print(f"probe results: {len(probe_rows)} (query, neighbor) pairs")
    print(f"pq codes written to {out_dir}/pq_codes")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
