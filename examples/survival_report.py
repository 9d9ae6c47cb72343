#!/usr/bin/env python
"""survival_report — time-to-event analysis composed through the
dataflow-graph API: one validated order scan becomes a duration/event
table, which fans out into the three readouts a retention or reliability
team reads together:

    orders ──> durations ──┬──> Kaplan–Meier curve ──> survival S(t)
                           ├──> Nelson–Aalen       ──> cumulative hazard H(t)
                           └──> log-rank test      ──> "do the two order
                                                        priorities differ?"

The fan-out shares the single durations subplan (the builder persists it
once — the reference's Forker, pipe/node.go:99-116). Every cumulative
sweep underneath is the round-7 bucket-parallel form
(operators.ranks.bucketed_cumsum) — none of these branches serializes
the duration domain through a one-task window at scale.

Usage: python examples/survival_report.py [SF_DIR]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import pipes_spark as ps
from pipes_spark import Final, Middle, NodesMap, Pipeline, Start
from pipes_spark.operators.timeseries import kaplan_meier, logrank_test, nelson_aalen
from pipes_spark.sources import load_table


class SurvivalReport(NodesMap):
    orders = Start()
    durations = Middle()
    km = Middle()
    km_sink = Final()
    na = Middle()
    na_sink = Final()
    logrank = Middle()
    logrank_sink = Final()

    def connect(self):
        self.orders.send_to(self.durations)
        self.durations.send_to(self.km, self.na, self.logrank)
        self.km.send_to(self.km_sink)
        self.na.send_to(self.na_sink)
        self.logrank.send_to(self.logrank_sink)


def _durations(df):
    """Days from order placement to the observation horizon; an order that
    reached final status F is the 'event', anything else is censored at
    the horizon. Urgent-or-high priority is the comparison group."""
    horizon = F.lit("1998-12-31")
    return df.select(
        F.datediff(horizon, F.col("o_orderdate")).alias("duration"),
        (F.col("o_orderstatus") == "F").cast("int").alias("event"),
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH").cast("int").alias("grp"),
    ).filter(F.col("duration") >= 0)


def main(sf_dir: str) -> dict:
    spark = ps.get_spark("survival_report", shuffle_partitions=8)
    results: dict = {}

    p = Pipeline(SurvivalReport, spark=spark)
    p.add_start("orders", lambda s: load_table(s, sf_dir, "orders"))
    p.add_middle("durations", _durations)
    p.add_middle("km", lambda df: kaplan_meier(df, "duration", "event"))
    p.add_middle("na", lambda df: nelson_aalen(df, "duration", "event"))
    p.add_middle(
        "logrank", lambda df: logrank_test(df, "duration", "event", "grp")
    )
    for name in ("km", "na", "logrank"):
        p.add_final(
            f"{name}_sink",
            lambda df, n=name: results.setdefault(
                n, df.orderBy(df.columns[0]).collect()
            ),
        )
    p.build().start().done()
    return results


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = main(sf)
    km = out["km"]
    print(f"== kaplan_meier: {len(km)} distinct durations; head/tail:")
    for r in km[:2] + km[-2:]:
        print("  ", r)
    print(f"== nelson_aalen: {len(out['na'])} rows; last:", out["na"][-1])
    print("== logrank:", out["logrank"][0])
