#!/usr/bin/env python
"""Provider-swapped streaming source: the SAME pipeline graph runs on a
local file stream and on a Kafka broker by swapping one provider — the
reference's conditional-assembly pattern (ref: pipe/providers.go:47-152):
the graph is fixed, the node implementation comes from a provider chosen
by configuration at build time.

Locally (no broker in this environment) the source provider returns a
file-backed stream over the events table; with ``KAFKA_BOOTSTRAP`` set it
returns ``read_stream_kafka`` over the same event schema. Every node
downstream of the source — windowed aggregation, memory sink — is
untouched by the swap, which is the point: pipelines are declared once
and rebound per environment.

Usage: python examples/stream_portability.py [SF_DIR]
       KAFKA_BOOTSTRAP=host:9092 KAFKA_TOPIC=events python examples/stream_portability.py
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import pipes_spark as ps
from pipes_spark import Final, Middle, NodesMap, Pipeline, Start
from pipes_spark.sources import load_table
from pipes_spark.streaming import run_to_memory


class EventCounts(NodesMap):
    source = Start()   # file stream locally, Kafka on a cluster
    window = Middle()  # tumbling hourly counts per event type
    sink = Final()     # memory sink (availableNow drain)

    def connect(self):
        self.source.send_to(self.window)
        self.window.send_to(self.sink)


def source_provider(sf_dir: str):
    """Choose the stream source at BUILD time from the environment —
    the provider body is the only environment-specific code."""
    bootstrap = os.environ.get("KAFKA_BOOTSTRAP")
    if bootstrap:
        topic = os.environ.get("KAFKA_TOPIC", "events")

        def kafka_source(spark):
            from pipes_spark.streaming import read_stream_kafka

            raw = read_stream_kafka(spark, bootstrap, topic, starting_offsets="earliest")
            # Kafka carries JSON-encoded event rows in `value`
            schema = "event_id bigint, ts timestamp, user_id bigint, event_type string, value double"
            return raw.select(F.from_json("value", schema).alias("e")).select("e.*")

        return kafka_source

    def file_source(spark):
        batch = load_table(spark, sf_dir, "events")
        d = tempfile.mkdtemp(prefix="stream_portability_")
        batch.write.mode("overwrite").parquet(d)
        return spark.readStream.schema(batch.schema).parquet(d)

    return file_source


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = ps.get_spark("stream_portability")
    results = {}

    p = Pipeline(EventCounts, spark=spark)
    p.add_start_provider("source", lambda: source_provider(sf_dir))
    p.add_middle(
        "window",
        lambda df: df.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n")),
    )
    p.add_final(
        "sink",
        lambda df: results.__setitem__(
            "counts", run_to_memory(df, output_mode="complete")
        ),
    )
    p.build().start().done()

    out = results["counts"]
    total = out.agg(F.sum("n")).collect()[0][0]
    print(f"windows={out.count()} events={total}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
