#!/usr/bin/env python
"""experiment_pipeline — an experimentation/attribution readout composed
from the round-3 analytics operators through the dataflow-graph API:

    events ──> quality gate (declarative rules; abort on violation)
           ──┬──> conversion attribution (last/first touch) ──> sink
             ├──> A/B readout (Welch t from sufficient stats) ──> sink
             └──> journey transition matrix ──> sink

The quality gate is the promotion check a warehouse pipeline runs before
trusting a batch: if any rule fails, the pipeline raises instead of
publishing (the reference's users would encode this as an erroring
MiddleFunc — ref: pipe/node.go:16-19). The fan-out after the gate
materializes the validated events once and feeds all three readouts.

Usage: python examples/experiment_pipeline.py [SF_DIR]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import pipes_spark as ps
from pipes_spark import Final, Middle, NodesMap, Pipeline, Start
from pipes_spark.operators.profiling import ab_test, quality_checks
from pipes_spark.operators.relational import attribution, path_transitions
from pipes_spark.sources import load_table


class Experiment(NodesMap):
    events = Start()
    gate = Middle()            # declarative quality rules; abort on failure
    attrib = Middle()          # last/first-touch conversion attribution
    attrib_sink = Final()
    abtest = Middle()          # Welch readout per variant
    abtest_sink = Final()
    journeys = Middle()        # event-type transition matrix
    journeys_sink = Final()

    def connect(self):
        self.events.send_to(self.gate)
        self.gate.send_to(self.attrib, self.abtest, self.journeys)
        self.attrib.send_to(self.attrib_sink)
        self.abtest.send_to(self.abtest_sink)
        self.journeys.send_to(self.journeys_sink)


def gated(df):
    """Run the rule set; raise if the batch fails the gate."""
    report = quality_checks(
        df,
        [
            ("not_null", "user_id"),
            ("not_null", "ts"),
            ("unique", "event_id"),
            ("in_set", "event_type", ("view", "click", "purchase", "signup", "error")),
        ],
    ).collect()
    failed = [r for r in report if not r["passed"]]
    if failed:
        raise RuntimeError(f"quality gate failed: {failed}")
    return df


def main(sf_dir: str) -> dict:
    spark = ps.get_spark("experiment_pipeline", shuffle_partitions=8)
    results: dict = {}

    p = Pipeline(Experiment, spark=spark)
    p.add_start("events", lambda s: load_table(s, sf_dir, "events"))
    p.add_middle("gate", gated)
    p.add_middle(
        "attrib",
        lambda df: attribution(
            df, "user_id", "ts", "event_type", "event_id",
            conversion_type="purchase", touch_types=["click", "view"],
            lookback_seconds=86400,
        ),
    )
    p.add_middle(
        "abtest",
        lambda df: ab_test(
            df.withColumn(
                "variant",
                F.when(F.col("user_id") % 2 == 0, F.lit("A")).otherwise(F.lit("B")),
            ),
            "variant",
            "value",
        ),
    )
    p.add_middle(
        "journeys",
        lambda df: path_transitions(df, "user_id", "ts", "event_type", "event_id"),
    )
    p.add_final("attrib_sink", lambda df: results.setdefault("attributions", df.count()))
    p.add_final("abtest_sink", lambda df: results.setdefault("readout", df.collect()[0].asDict()))
    p.add_final(
        "journeys_sink",
        lambda df: results.setdefault("transitions", df.count()),
    )
    r = p.build()
    r.start()
    r.done()
    return results


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = main(sf)
    print(f"attributed conversions: {out['attributions']}")
    print(f"transition matrix rows: {out['transitions']}")
    ro = out["readout"]
    print(
        f"A/B: mean_a={ro['mean_a']} mean_b={ro['mean_b']} "
        f"diff={ro['mean_diff']} t={ro['t_stat']}"
    )
