#!/usr/bin/env python
"""search_lab — the IR suite composed through the dataflow-graph API:
one documents scan builds the positional inverted index ONCE, then fans
into the three classic retrieval readouts a search team runs together:

    documents ──┬──> postings ──┬──> phrase search  ("table scan")
                │               └──> proximity NEAR (vector ~4~ hash)
                └──> BM25 ranking ──> top-10 lexical relevance

The two fan-outs share their subplans (the builder persists each shared
subtree once — the reference's Forker, pipe/node.go:99-116): the
documents scan feeds both the index build and BM25, and the postings
table feeds both positional readouts without re-exploding the corpus.

Usage: python examples/search_lab.py [SF_DIR]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pipes_spark as ps
from pipes_spark import Final, Middle, NodesMap, Pipeline, Start
from pipes_spark.operators.text import (
    bm25_scores,
    phrase_search,
    positional_postings,
    proximity_search,
)
from pipes_spark.sources import load_table

PHRASE = ["table", "scan"]
NEAR_A, NEAR_B, NEAR_D = "vector", "hash", 4
BM25_TERMS = ["table", "scan", "vector"]


class SearchLab(NodesMap):
    docs = Start()
    postings = Middle()
    phrase = Middle()
    phrase_sink = Final()
    near = Middle()
    near_sink = Final()
    bm25 = Middle()
    bm25_sink = Final()

    def connect(self):
        self.docs.send_to(self.postings, self.bm25)
        self.postings.send_to(self.phrase, self.near)
        self.phrase.send_to(self.phrase_sink)
        self.near.send_to(self.near_sink)
        self.bm25.send_to(self.bm25_sink)


def main(sf_dir: str) -> dict:
    from pyspark.sql import functions as F

    spark = ps.get_spark("search_lab", shuffle_partitions=8)
    results: dict = {}

    p = Pipeline(SearchLab, spark=spark)
    p.add_start("docs", lambda s: load_table(s, sf_dir, "documents"))
    p.add_middle("postings", positional_postings)
    p.add_middle("phrase", lambda df: phrase_search(df, PHRASE).orderBy("doc_id"))
    p.add_middle(
        "near",
        lambda df: proximity_search(df, NEAR_A, NEAR_B, NEAR_D).orderBy("doc_id"),
    )
    p.add_middle(
        "bm25",
        lambda df: bm25_scores(df, BM25_TERMS)
        .orderBy(F.desc("bm25"), "doc_id")
        .limit(10),
    )
    for name in ("phrase", "near", "bm25"):
        p.add_final(f"{name}_sink", lambda df, n=name: results.setdefault(n, df.collect()))
    p.build().start().done()
    return results


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = main(sf)
    print(f"phrase '{' '.join(PHRASE)}': {len(out['phrase'])} docs")
    print(f"NEAR({NEAR_A}, {NEAR_B}, {NEAR_D}): {len(out['near'])} docs")
    print("BM25 top-10:")
    for r in out["bm25"]:
        print(f"  doc {r['doc_id']}: {r['bm25']}")
