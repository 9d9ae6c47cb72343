#!/usr/bin/env python
"""inference_lab — the statistical-inference suite composed through the
dataflow-graph API: one validated event scan fans out into four readouts
a growth team runs together before and after an experiment:

    events ──┬──> one-way ANOVA  ──> "do segment means differ at all?"
             ├──> Tukey HSD      ──> "which pairs differ?"
             ├──> Kruskal–Wallis ──> "…and without normality assumptions?"
             └──> power analysis ──> "how big must the NEXT test be?"

The fan-out shares the single events scan (the builder persists the
shared subplan once — the reference's Forker, pipe/node.go:99-116);
each branch is one declarative aggregate the reference's users would
hand-write as stateful MiddleFunc accumulation (ref: pipe/node.go:16-19).

Usage: python examples/inference_lab.py [SF_DIR]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pipes_spark as ps
from pipes_spark import Final, Middle, NodesMap, Pipeline, Start
from pipes_spark.operators.profiling import (
    ab_power_analysis,
    anova_oneway,
    kruskal_wallis,
    tukey_hsd,
)
from pipes_spark.sources import load_table


class InferenceLab(NodesMap):
    events = Start()
    anova = Middle()
    anova_sink = Final()
    tukey = Middle()
    tukey_sink = Final()
    kruskal = Middle()
    kruskal_sink = Final()
    power = Middle()
    power_sink = Final()

    def connect(self):
        self.events.send_to(self.anova, self.tukey, self.kruskal, self.power)
        self.anova.send_to(self.anova_sink)
        self.tukey.send_to(self.tukey_sink)
        self.kruskal.send_to(self.kruskal_sink)
        self.power.send_to(self.power_sink)


def main(sf_dir: str) -> dict:
    spark = ps.get_spark("inference_lab", shuffle_partitions=8)
    results: dict = {}

    p = Pipeline(InferenceLab, spark=spark)
    p.add_start("events", lambda s: load_table(s, sf_dir, "events"))
    p.add_middle("anova", lambda df: anova_oneway(df, "event_type", "value"))
    p.add_middle("tukey", lambda df: tukey_hsd(df, "event_type", "value"))
    p.add_middle("kruskal", lambda df: kruskal_wallis(df, "event_type", "value"))
    p.add_middle("power", lambda df: ab_power_analysis(df, "value"))
    for name in ("anova", "tukey", "kruskal", "power"):
        p.add_final(f"{name}_sink", lambda df, n=name: results.setdefault(n, df.collect()))
    p.build().start().done()
    return results


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = main(sf)
    for name, rows in out.items():
        print(f"== {name}: {len(rows)} rows")
        for r in rows[:3]:
            print("  ", r)
