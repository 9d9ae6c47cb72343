"""Plan-quality assertions: the optimizations the engine relies on at scale
must actually appear in the physical plans (SURVEY.md §4.2)."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from pipes_spark.catalog import QUERIES


def _plan(spark, sf_dir, name):
    return QUERIES[name].fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q1_pricing_summary")
    pushed = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
    assert pushed and "LessThanOrEqual(l_shipdate" in pushed.group(1)


def test_column_pruning_reaches_scan(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q1_pricing_summary")
    schema = re.search(r"ReadSchema: struct<([^>]*)", plan).group(1)
    # q1 needs 7 of lineitem's 16 columns; the scan must not read the rest
    assert "l_comment" not in schema and "l_partkey" not in schema
    assert "l_quantity" in schema


def test_small_dims_broadcast(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q3_shipping_priority")
    assert "BroadcastHashJoin" in plan


def test_minhash_band_join_carries_no_text_or_signatures(spark, sf_dir):
    """The band self-join must shuffle ids + band keys only — neither the
    document text nor the 64-long signature arrays ride the shuffle."""
    plan = _plan(spark, sf_dir, "dedup_minhash_lsh")
    m = re.search(r"SortMergeJoin.*?\[band", plan) or re.search(r"ShuffledHashJoin", plan)
    # join inputs listed in the plan around the band join must not mention text
    joins = [seg for seg in plan.split("+- ") if "band_hash" in seg and "Exchange hashpartitioning" in seg]
    assert joins, "expected shuffle exchanges keyed on band_hash"
    assert all("text#" not in seg for seg in joins)


def test_salted_join_matches_plain_join(spark, sf_dir):
    from pipes_spark.operators.scale import salted_equi_join
    from pipes_spark.sources import load_table

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").withColumnRenamed("c_custkey", "o_custkey")
    plain = orders.join(cust, ["o_custkey"]).count()
    salted = salted_equi_join(orders, cust, ["o_custkey"]).count()
    assert salted == plain
