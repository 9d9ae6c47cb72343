#!/usr/bin/env python
"""data_mixing — the corpus-assembly tail of a training-data pipeline,
composed through the dataflow-graph API:

    documents ──> score (DSIR importance toward the 'en' domain +
        boilerplate bigram ratio, both joined back onto the docs)
        ──> gate (drop templated shells and the most off-domain tail)
        ──> mix (temperature rebalancing of languages, α=0.5 —
            rare languages upweighted without a hand recipe)
        ──┬──> shards parquet (hash-sharded, partitioned layout)
          ├──> shard manifest (row counts + order-independent digests) ──> collect
          └──> per-language mixture readout ──> collect

Every scoring/selection decision is deterministic (md5-derived hashes,
integer-scaled DSIR log-ratios), so re-running the pipeline reproduces
the same corpus byte-for-byte — the property a resumable 100 TB export
actually needs.

Usage: python examples/data_mixing.py [SF_DIR] [OUT_DIR]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import pipes_spark as ps
from pipes_spark import Final, Middle, NodesMap, Pipeline, Start
from pipes_spark.operators.sampling import hash_bucket, shard_manifest, temperature_mixture
from pipes_spark.operators.text import boilerplate_ngram_stats, dsir_importance
from pipes_spark.sinks import write_parquet
from pipes_spark.sources import load_table

N_SHARDS = 4


class DataMixing(NodesMap):
    docs = Start()
    score = Middle()
    gate = Middle()
    mix = Middle()
    shards = Final()
    manifest = Middle()
    collect_manifest = Final()
    readout = Middle()
    collect_readout = Final()

    def connect(self):
        self.docs.send_to(self.score)
        self.score.send_to(self.gate)
        self.gate.send_to(self.mix)
        self.mix.send_to(self.shards, self.manifest, self.readout)
        self.manifest.send_to(self.collect_manifest)
        self.readout.send_to(self.collect_readout)


def score(df):
    """DSIR importance toward the 'en' slice + boilerplate bigram ratio,
    joined back onto the documents (both scorers shuffle ids + hashes
    only; the doc text never leaves its scan except into the sinks)."""
    target = df.filter(F.col("lang") == "en")
    imp = dsir_importance(df, target, "doc_id", "text", num_buckets=1024)
    boiler = boilerplate_ngram_stats(df, "doc_id", "text", n=2, min_doc_frac=0.07)
    return (
        df.join(imp.select("doc_id", "log_importance"), "doc_id")
        .join(boiler.select("doc_id", "boiler_ratio"), "doc_id")
    )


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(prefix="mix_")
    spark = ps.get_spark("data_mixing", shuffle_partitions=8)

    p = Pipeline(DataMixing, spark=spark)
    p.add_start("docs", lambda s: load_table(s, sf_dir, "documents"))
    p.add_middle("score", score)
    # templated shells out; keep the rest regardless of domain, but the
    # most off-domain tail (bottom of the DSIR range) is dropped too
    p.add_middle(
        "gate",
        lambda df: df.filter(
            (F.col("boiler_ratio") < 0.9) & (F.col("log_importance") > -50.0)
        ),
    )
    p.add_middle(
        "mix",
        lambda df: temperature_mixture(df, "lang", alpha=0.5, key="doc_id").withColumn(
            "shard", (hash_bucket("doc_id", salt="shard") % N_SHARDS).cast("int")
        ),
    )
    p.add_final(
        "shards", write_parquet(os.path.join(out_dir, "shards"), partition_by=["shard"])
    )
    p.add_middle("manifest", lambda df: shard_manifest(df, ["doc_id", "text"], "shard"))
    p.add_final("collect_manifest", lambda df: df.collect())
    p.add_middle(
        "readout",
        lambda df: df.groupBy("lang").agg(F.count(F.lit(1)).alias("docs")),
    )
    p.add_final("collect_readout", lambda df: df.collect())

    results = p.build().start().done()
    manifest = sorted(results["collect_manifest"], key=lambda r: r["shard"])
    readout = sorted(results["collect_readout"], key=lambda r: r["lang"])
    total = sum(r["n_rows"] for r in manifest)
    print(f"mixed corpus: {total} docs in {len(manifest)} shards -> {out_dir}/shards")
    for r in manifest:
        print(f"  shard {r['shard']}: n={r['n_rows']} digest={r['content_digest']}")
    for r in readout:
        print(f"  lang {r['lang']}: docs={r['docs']}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
