#!/usr/bin/env python
"""corpus_pipeline — an end-to-end training-data curation pipeline composed
from the engine's extension operators through the dataflow-graph API:

    documents ──> exact dedup ──> near-dup cluster removal (MinHash-LSH
        pairs → connected components → keep canonical) ──> quality+langid
        annotate ──> quality gate ──> eval-set decontamination
        ──> train/test split
        ──┬──> partitioned parquet (the corpus)
          ├──> per-split/lang stats (the report)
          └──> sequence packing ──> packing manifest parquet

Every stage is a named node; the fan-out at the end materializes the
curated corpus once (single-pass fan-out) and feeds both sinks. This is
the graph a user of the reference would hand-write as MiddleFuncs
(ref: pipe/node.go:16-19) — here each node body is a declarative
DataFrame transform, so Catalyst fuses the whole curation chain into a
handful of codegen'd stages.

Usage: python examples/corpus_pipeline.py [SF_DIR] [OUT_DIR]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import pipes_spark as ps
from pipes_spark import Final, Middle, NodesMap, Pipeline, Start
from pipes_spark.operators.components import drop_near_duplicates
from pipes_spark.operators.dedup import (
    benchmark_contamination,
    exact_dedup,
    minhash_lsh_pairs,
)
from pipes_spark.operators.packing import pack_greedy
from pipes_spark.operators.sampling import train_test_split
from pipes_spark.operators.text import token_count, with_lang_scores, with_quality_scores
from pipes_spark.sinks import write_parquet
from pipes_spark.sources import load_table


def decontaminate(df, max_overlap: float = 0.5):
    """Eval-set decontamination: every 97th doc plays the held-out benchmark
    suite (in production this is the external eval corpus); benchmark docs
    are excluded from the corpus outright and any remaining doc whose
    distinct 5-gram shingles overlap the benchmark above ``max_overlap`` is
    dropped. The benchmark shingle set is broadcast — no corpus shuffle."""
    is_bench = F.col("doc_id") % 97 == 0
    bench = df.filter(is_bench)
    corpus = df.filter(~is_bench)
    contaminated = (
        benchmark_contamination(corpus, bench, shingle_n=5)
        .filter(F.col("contamination_frac") >= max_overlap)
        .select("doc_id")
    )
    return corpus.join(contaminated, "doc_id", "left_anti")


class CorpusPipeline(NodesMap):
    docs = Start()
    dedup = Middle()      # exact near-identical removal (fingerprint)
    neardup = Middle()    # MinHash-LSH pairs -> duplicate clusters -> canonical
    annotate = Middle()   # quality + language scores
    gate = Middle()       # quality threshold filter
    decontam = Middle()   # drop docs overlapping the eval set's shingles
    split = Middle()      # deterministic train/test split
    pack = Middle()       # greedy sequence packing of the train split
    corpus = Final()      # partitioned parquet, the training corpus
    report = Final()      # per-split/lang stats
    manifest = Final()    # (doc -> training sequence) packing manifest

    def connect(self):
        self.docs.send_to(self.dedup)
        self.dedup.send_to(self.neardup)
        self.neardup.send_to(self.annotate)
        self.annotate.send_to(self.gate)
        self.gate.send_to(self.decontam)
        self.decontam.send_to(self.split)
        self.split.send_to(self.corpus, self.report, self.pack)
        self.pack.send_to(self.manifest)


def build(spark, sf_dir: str, out_dir: str, min_alpha: float = 0.5):
    p = Pipeline(CorpusPipeline, spark=spark)
    p.add_start("docs", lambda s: load_table(s, sf_dir, "documents"))
    p.add_middle("dedup", lambda df: exact_dedup(df).drop("fingerprint"))
    # near-dup removal at cluster granularity: LSH candidates, connected
    # components (large-star/small-star), keep the min-id canonical per
    # cluster — pair lists alone under-delete transitive duplicate groups
    p.add_middle(
        "neardup",
        lambda df: drop_near_duplicates(df, minhash_lsh_pairs(df, threshold=0.5)),
    )
    p.add_middle("annotate", lambda df: with_lang_scores(with_quality_scores(df)))
    # provider: the gate is config-conditional — a None threshold disables
    # the node entirely (zero-cost bypass, ref: pipe/bypass.go:23-33)
    p.add_middle_provider(
        "gate",
        lambda: None
        if min_alpha is None
        else (
            lambda df: df.filter(
                (F.col("alpha_ratio") >= min_alpha) & (F.col("digit_ratio") < 0.3)
            )
        ),
    )
    p.add_middle("decontam", decontaminate)
    p.add_middle("split", lambda df: train_test_split(df, "doc_id", 0.1))
    # training sequences: pack the train split into 1024-token sequences;
    # the packing shuffle carries (id, n_tokens) longs only
    p.add_middle(
        "pack",
        lambda df: pack_greedy(
            df.filter(F.col("split") == "train").select(
                "doc_id", token_count("text").alias("n_tokens")
            ),
            budget=1024,
            num_buckets=8,
        ),
    )
    p.add_final(
        "corpus", write_parquet(os.path.join(out_dir, "corpus"), partition_by=["split"])
    )
    p.add_final(
        "report",
        lambda df: df.groupBy("split", "lang_pred")
        .agg(F.count(F.lit(1)).alias("docs"), F.sum("n_chars").alias("chars"))
        .collect(),
    )
    p.add_final("manifest", write_parquet(os.path.join(out_dir, "manifest")))
    return p.build()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/corpus_pipeline_out"
    spark = ps.get_spark("corpus_pipeline", shuffle_partitions=8)
    results = build(spark, sf_dir, out_dir).start().done()
    print(f"corpus written to {results['corpus']}")
    for row in sorted(results["report"], key=lambda r: (r.split, r.lang_pred)):
        print(f"  {row.split:5s} {row.lang_pred:3s} docs={row.docs:6d} chars={row.chars}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
