#!/usr/bin/env python
"""product_analytics — an event-analytics pipeline composed from the
time-series and sessionization operators through the dataflow-graph API:

    events ──> skew-safe sessionize (two-pass bucketed) ──┬──> session stats
                                                          └──> daily activity
                                                               (gapfill +
                                                                forward fill)
    events ──> view→click→purchase funnel ──> conversion table

The fan-out after sessionization materializes the sessionized events once
(single-pass fan-out) and feeds both sinks; the funnel branch runs from
its own scan. Every stage the reference's users would hand-write as a
stateful MiddleFunc (ref: pipe/node.go:16-19) is a declarative operator
here, so one hot user's history spreads across (user, day) tasks instead
of serializing onto one.

Usage: python examples/product_analytics.py [SF_DIR]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import pipes_spark as ps
from pipes_spark import Final, Middle, NodesMap, Pipeline, Start
from pipes_spark.operators.relational import sessionize_bucketed
from pipes_spark.operators.timeseries import forward_fill, funnel_counts, gapfill
from pipes_spark.sources import load_table


class Analytics(NodesMap):
    events = Start()
    sessions = Middle()       # skew-safe gap-based sessionization
    session_stats = Final()   # per-session stats sink
    daily = Middle()          # dense daily activity (gapfill + ffill)
    daily_sink = Final()
    funnel = Middle()         # ordered conversion funnel
    funnel_sink = Final()

    def connect(self):
        self.events.send_to(self.sessions, self.funnel)
        self.sessions.send_to(self.session_stats, self.daily)
        self.daily.send_to(self.daily_sink)
        self.funnel.send_to(self.funnel_sink)


def daily_activity(df):
    """Dense per-user daily series: days without events appear with NULL
    counts, then the last seen session count is carried forward."""
    daily = df.groupBy(
        "user_id", F.date_trunc("day", "ts").alias("day")
    ).agg(F.countDistinct("session_id").alias("n_sessions"))
    dense = gapfill(daily, ["user_id"], "day", "1 day", ["n_sessions"])
    return forward_fill(dense, ["user_id"], "day", ["n_sessions"])


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = ps.get_spark("product_analytics")
    out = {}

    p = Pipeline(Analytics, spark=spark)
    p.add_start("events", lambda s: load_table(s, sf_dir, "events"))
    p.add_middle(
        "sessions",
        lambda df: sessionize_bucketed(
            df, "user_id", "ts", gap_seconds=1800, order_tiebreak="event_id"
        ),
    )
    p.add_final(
        "session_stats",
        lambda df: out.__setitem__(
            "sessions",
            df.groupBy("user_id", "session_id")
            .agg(F.count(F.lit(1)).alias("n_events"))
            .count(),
        ),
    )
    p.add_middle("daily", daily_activity)
    p.add_final("daily_sink", lambda df: out.__setitem__("daily_rows", df.count()))
    p.add_middle(
        "funnel",
        lambda df: funnel_counts(
            df, "user_id", "ts", "event_type", ["view", "click", "purchase"]
        ),
    )
    p.add_final("funnel_sink", lambda df: out.__setitem__("funnel", df.collect()))
    p.build().start().done()

    print(f"sessions={out['sessions']} daily_rows={out['daily_rows']}")
    for r in out["funnel"]:
        print(f"  step {r.step} {r.step_name:<9} users={r.n_users}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
