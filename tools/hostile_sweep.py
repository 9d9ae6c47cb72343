#!/usr/bin/env python
"""Driver-style hostile-order sweep of the graded window.

Replicates the correctness driver's worst-case conditions — the
SparkSession is built BEFORE this package is imported (workers never see
the package's pre-JVM wiring), plain conf (HDFS-default state store, no
RocksDB, default shuffle partitions), and a NON-REPO working directory
(workers cannot resolve `pipes_spark` via cwd) — then runs every
graded-window query end to end. This is what certified the round-9
remediations (session.worker_protobuf_ok, streaming._ensure_tws_state_
store, the by-value-pickled Avro DataSource).

Run it FROM A SCRATCH DIRECTORY (a repo cwd would mask the worker
sys.path condition):

    mkdir -p /tmp/hostile && cd /tmp/hostile && \
        env -u PYTHONPATH python /root/repo/tools/hostile_sweep.py

One Spark process at a time (CLAUDE.md): don't run while bench/pytest
own the repo warehouse — this sweep uses the scratch cwd's own
warehouse, but CPUs are shared.
"""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    if os.path.realpath(os.getcwd()) == os.path.realpath(REPO):
        raise SystemExit(
            "run from a scratch directory — a repo cwd lets workers import "
            "the package via cwd and masks the condition under test"
        )
    sys.path.insert(0, REPO)
    # the hostile order: session FIRST, package import after
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{os.cpu_count() or 4}]")
        .config("spark.sql.shuffle.partitions", "16")
        .appName("hostile_sweep")
        .getOrCreate()
    )
    spark.conf.set("spark.sql.session.timeZone", "UTC")

    import __spark_entry__ as entry

    q = entry.queries()
    names = list(q)[:50]
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    fails = []
    for n in names:
        t0 = time.time()
        try:
            rows = q[n](spark, sf).collect()
            print(f"OK   {n} rows={len(rows)} {time.time() - t0:.1f}s", flush=True)
        except Exception as ex:  # noqa: BLE001 - sweep reports, doesn't mask
            fails.append(n)
            print(f"FAIL {n}: {type(ex).__name__} {str(ex)[:200]}", flush=True)
    print(f"sweep done: {len(names) - len(fails)} ok, fails: {fails}")
    raise SystemExit(1 if fails else 0)


if __name__ == "__main__":
    main()
