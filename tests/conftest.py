from __future__ import annotations

import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "4")


@pytest.fixture(scope="session")
def spark():
    from pipes_spark.session import get_spark

    s = get_spark("pipes_spark_tests", shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture
def job_budget(spark):
    """Foreground-action audit: run a block under a job group and assert it
    launches at most ``max_jobs`` Spark jobs — the regression guard against
    hidden counts/collects sneaking into examples (the reference's
    one-goroutine-per-node execution discipline, SURVEY §3.3). Budgets are
    ceilings, not exact counts: AQE legitimately fans one action into a
    variable number of jobs, and streaming micro-batches run on threads job
    groups cannot tag."""
    from contextlib import contextmanager

    sc = spark.sparkContext
    tracker = sc.statusTracker()

    @contextmanager
    def budget(name: str, max_jobs: int):
        group = f"budget-{name}"
        sc.setJobGroup(group, name)
        try:
            yield
        finally:
            sc.setJobGroup("budget-idle", "idle")
        n = len(tracker.getJobIdsForGroup(group))
        assert n <= max_jobs, (
            f"{name} launched {n} foreground Spark jobs (budget {max_jobs}) — "
            "did a hidden count/collect sneak in?"
        )

    return budget
