#!/usr/bin/env python
"""privacy_audit — the three-rung privacy ladder composed through the
dataflow-graph API: one validated orders scan fans out into the audits
a data-release review runs together before shipping ANY derived table:

    orders ──┬──> k-anonymity  ──> "which quasi-identifier combos are
             │                      small enough to re-identify?"
             ├──> l-diversity  ──> "which groups leak the sensitive
             │                      value by near-constancy?"
             └──> t-closeness  ──> "which groups' sensitive DISTRIBUTION
                                    deviates from the global one?"

Each rung catches what the previous one misses: a group can be large
(k-anonymous) yet single-valued (fails l-diversity), and large AND
diverse yet skewed (fails t-closeness — Li, Li & Venkatasubramanian
2007). The fan-out shares the single orders scan (the builder persists
the shared subplan once — the reference's Forker, pipe/node.go:99-116).

Usage: python examples/privacy_audit.py [SF_DIR]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pipes_spark as ps
from pipes_spark import Final, Middle, NodesMap, Pipeline, Start
from pipes_spark.operators.profiling import k_anonymity, l_diversity, t_closeness
from pipes_spark.sources import load_table

QUASI = ["o_orderpriority", "order_month"]
SENSITIVE = "o_orderstatus"


class PrivacyAudit(NodesMap):
    orders = Start()
    k_anon = Middle()
    k_sink = Final()
    l_div = Middle()
    l_sink = Final()
    t_close = Middle()
    t_sink = Final()

    def connect(self):
        self.orders.send_to(self.k_anon, self.l_div, self.t_close)
        self.k_anon.send_to(self.k_sink)
        self.l_div.send_to(self.l_sink)
        self.t_close.send_to(self.t_sink)


def main(sf_dir: str) -> dict:
    from pyspark.sql import functions as F

    spark = ps.get_spark("privacy_audit", shuffle_partitions=8)
    results: dict = {}

    def scan(s):
        return load_table(s, sf_dir, "orders").select(
            "o_orderpriority",
            F.date_trunc("month", "o_orderdate").alias("order_month"),
            SENSITIVE,
        )

    p = Pipeline(PrivacyAudit, spark=spark)
    p.add_start("orders", scan)
    p.add_middle("k_anon", lambda df: k_anonymity(df, QUASI, k=5))
    p.add_middle("l_div", lambda df: l_diversity(df, QUASI, SENSITIVE, l=3))
    p.add_middle("t_close", lambda df: t_closeness(df, ["o_orderpriority"], SENSITIVE, t=0.005))
    for name, sink in (("k_anon", "k_sink"), ("l_div", "l_sink"), ("t_close", "t_sink")):
        p.add_final(sink, lambda df, n=name: results.setdefault(n, df.collect()))
    p.build().start().done()
    return results


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = main(sf)
    for name, rows in out.items():
        print(f"== {name}: {len(rows)} violation/report rows")
        for r in rows[:3]:
            print("  ", r)
