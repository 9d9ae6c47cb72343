#!/usr/bin/env python
"""incremental_refresh — the append-mostly corpus-refresh pipeline: a new
ingest batch is deduplicated AGAINST the existing corpus without ever
re-processing the corpus itself, then the refreshed corpus is re-exported
as deterministic training shards with a verification manifest:

    existing corpus ──> persisted MinHash signatures (the ingest artifact)
    new batch ──> delta-only signatures (incremental_signature_ingest)
             ──> batch×corpus LSH pairs (minhash_lsh_pairs_delta —
                 old×old pairs never enumerated)
             ──> drop new docs colliding with the corpus or with an
                 earlier batch member (connected components, keep-min)
             ──> quality gate (char-class/stopword heuristics)
             ──> union into the corpus
             ──┬──> training shards (write_training_shards, one ordered
               │    file per shard)
               └──> shard manifest (order-independent content digests)

This is the 100 TB refresh loop in miniature: per-batch cost scales with
|batch|·bucket, not |corpus|², and the export is reproducible bit-for-bit
(hash permutation + commutative digests). In the reference a user would
hand-write the dedup store as a stateful MiddleFunc (ref:
pipe/node.go:16-19); here every stage is a declarative DataFrame node.

Usage: python examples/incremental_refresh.py [SF_DIR] [OUT_DIR]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import pipes_spark as ps
from pipes_spark import Final, Middle, NodesMap, Pipeline, Start
from pipes_spark.operators.components import connected_components
from pipes_spark.operators.dedup import (
    _minhash_wide,
    incremental_signature_ingest,
    minhash_lsh_pairs_delta,
)
from pipes_spark.operators.sampling import shard_assignment, shard_manifest
from pipes_spark.operators.text import with_quality_scores
from pipes_spark.sinks import write_training_shards
from pipes_spark.sources import load_table


class Refresh(NodesMap):
    corpus = Start()      # the already-ingested corpus
    batch = Start()       # the incoming ingest batch
    admit = Middle()      # delta dedup + quality gate -> admitted batch rows
    merged = Middle()     # corpus ∪ admitted
    shards = Final()      # deterministic shard export
    manifest = Final()    # per-shard verification digests

    def connect(self):
        self.corpus.send_to(self.admit)
        self.batch.send_to(self.admit)
        self.admit.send_to(self.merged)
        self.merged.send_to(self.shards)
        self.merged.send_to(self.manifest)


def admit_batch(joined):
    """Dedup the batch against the corpus and itself, then quality-gate.

    ``joined`` is corpus ∪ batch with an ``_is_new`` flag (the fan-in of
    the two Start nodes). Signatures are computed for the batch only —
    the corpus side stands in for the persisted ingest artifact
    (warehouse.minhash_signature_table in a real deployment)."""
    corpus = joined.filter(~F.col("_is_new")).drop("_is_new")
    batch = joined.filter(F.col("_is_new")).drop("_is_new")
    sigs_corpus = _minhash_wide(corpus, "doc_id", "text", 64, 3)
    sigs_all = incremental_signature_ingest(sigs_corpus, batch)
    pairs = minhash_lsh_pairs_delta(
        sigs_all, batch.select("doc_id"), threshold=0.5
    )
    # the corpus always wins: a new doc paired with ANY old doc drops
    # outright (regardless of id order); among batch-internal clusters the
    # min-id member is kept as canonical
    an = batch.select(F.col("doc_id").alias("id_a")).withColumn("_an", F.lit(1))
    bn = batch.select(F.col("doc_id").alias("id_b")).withColumn("_bn", F.lit(1))
    p = pairs.join(F.broadcast(an), "id_a", "left").join(
        F.broadcast(bn), "id_b", "left"
    )
    vs_corpus = (
        p.filter(F.col("_an").isNotNull() & F.col("_bn").isNull())
        .select(F.col("id_a").alias("_loser"))
        .unionByName(
            p.filter(F.col("_bn").isNotNull() & F.col("_an").isNull()).select(
                F.col("id_b").alias("_loser")
            )
        )
    )
    new_new = p.filter(F.col("_an").isNotNull() & F.col("_bn").isNotNull()).select(
        "id_a", "id_b"
    )
    cc = connected_components(new_new)
    in_batch = cc.filter(F.col("id") != F.col("component")).select(
        F.col("id").alias("_loser")
    )
    losers = vs_corpus.unionByName(in_batch).distinct()
    admitted = batch.join(
        F.broadcast(losers), batch["doc_id"] == F.col("_loser"), "left_anti"
    )
    gated = (
        with_quality_scores(admitted)
        .filter((F.col("alpha_ratio") > 0.5) & (F.length("text") >= 20))
        .select(*batch.columns)
    )
    return corpus.withColumn("_admitted_new", F.lit(False)).unionByName(
        gated.withColumn("_admitted_new", F.lit(True))
    )


def main(sf_dir: str = "/root/testdata/sf0.001", out_dir: str = "/tmp/refresh_out"):
    spark = ps.get_spark("incremental_refresh", shuffle_partitions=8)
    p = Pipeline(Refresh, spark=spark)
    p.add_start(
        "corpus",
        lambda s: load_table(s, sf_dir, "documents")
        .filter(F.col("doc_id") % 5 != 0)
        .withColumn("_is_new", F.lit(False)),
    )
    p.add_start(
        "batch",
        lambda s: load_table(s, sf_dir, "documents")
        .filter(F.col("doc_id") % 5 == 0)
        .withColumn("_is_new", F.lit(True)),
    )
    p.add_middle("admit", admit_batch)
    p.add_middle("merged", lambda df: df.drop("_admitted_new"))
    shard_path = os.path.join(out_dir, "shards")
    p.add_final(
        "shards",
        lambda df: write_training_shards(shard_path, "doc_id", 128)(
            df.select("doc_id", "text", "source")
        ),
    )
    p.add_final(
        "manifest",
        lambda df: [
            (r.shard, r.n_rows, r.content_digest)
            for r in shard_manifest(
                shard_assignment(df.select("doc_id", "n_chars"), "doc_id", 128),
                ["doc_id", "n_chars"],
            )
            .orderBy("shard")
            .collect()
        ],
    )
    res = p.build().start().done()
    for shard, n, digest in res["manifest"]:
        print(f"shard={shard} rows={n} digest={digest}")
    print(f"shards written to {res['shards']}")
    return res


if __name__ == "__main__":
    main(*sys.argv[1:])
