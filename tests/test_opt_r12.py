"""Round-12 optimization-round tests: operator internals changed for
performance must keep byte-identical semantics (the no-result-change
contract of the optimization rounds)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# scale.py: driver-side scan-partition estimate replacing the df.rdd probe
# ---------------------------------------------------------------------------


def test_parse_byte_conf_units():
    from pipes_spark.operators.scale import _parse_byte_conf

    assert _parse_byte_conf("134217728") == 128 << 20
    assert _parse_byte_conf("128m") == 128 << 20
    assert _parse_byte_conf("128MB") == 128 << 20
    assert _parse_byte_conf("1g") == 1 << 30
    assert _parse_byte_conf("64k") == 64 << 10
    assert _parse_byte_conf(" 512b ") == 512


def test_est_scan_partitions_matches_probe_on_scan(spark, sf_dir):
    """The byte estimate must reproduce the df.rdd probe's repartition
    DECISION for a scan-rooted input — the invariant the r12 change rests
    on (local small file: both say 'fewer than target'; the estimate is
    ceil(bytes/maxPartitionBytes) which equals the scan's split count)."""
    from pipes_spark.operators.scale import _est_scan_partitions
    from pipes_spark.sources import load_table

    d = load_table(spark, sf_dir, "documents")
    est = _est_scan_partitions(spark, d._pipes_src_bytes)
    probe = d.rdd.getNumPartitions()
    assert est == probe == 1  # single small local file → one split


def test_read_parquet_tags_src_bytes(spark, sf_dir):
    from pipes_spark.operators.scale import src_bytes_hint
    from pipes_spark.sources import load_table

    d = load_table(spark, sf_dir, "documents")
    assert src_bytes_hint(d) == os.path.getsize(f"{sf_dir}/documents.parquet")
    # derivations drop the tag (the helper must not mis-apply it)
    assert src_bytes_hint(d.select("doc_id")) is None


def test_ensure_min_partitions_hint_equals_probe_result(spark, sf_dir):
    """Same partition count out of the helper whether the decision came
    from the byte estimate (tagged scan) or the df.rdd probe (untagged)."""
    from pipes_spark.operators.scale import ensure_min_partitions
    from pipes_spark.sources import load_table

    d = load_table(spark, sf_dir, "documents")
    via_hint = ensure_min_partitions(d)  # auto-detected tag
    untagged = d.select(F.col("doc_id"), F.col("text"))  # tag dropped
    via_probe = ensure_min_partitions(untagged)
    assert (
        via_hint.rdd.getNumPartitions() == via_probe.rdd.getNumPartitions()
    )
    assert via_hint.count() == via_probe.count() == d.count()


# ---------------------------------------------------------------------------
# similarity/clustering: pure UDFs marked non-deterministic must evaluate
# exactly once per input side (the guide §4.4 double-eval fix)
# ---------------------------------------------------------------------------


def _formatted_plan(df):
    spark = df.sparkSession
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return df._jdf.queryExecution().explainString(mode)


def test_ivf_corpus_routing_udf_evaluates_once(spark, sf_dir):
    """sim_ivf_topk's corpus `nearest` UDF previously ran TWICE per corpus
    row: once below a pushed isnotnull(element_at(...)) filter and again in
    the projection above the repartition. The asNondeterministic fix pins
    the plan at one ArrowEvalPython on the corpus side (plus at most one on
    the query side when the driver-side probe path is not taken)."""
    from pipes_spark.catalog import QUERIES

    plan = _formatted_plan(QUERIES["sim_ivf_topk"].fn(spark, sf_dir))
    n_eval = plan.count(") ArrowEvalPython")
    assert n_eval == 1, f"expected 1 ArrowEvalPython node, saw {n_eval}"


def test_ivf_results_unchanged_by_nondeterministic_flag(spark, sf_dir):
    """The flag must not change values: the routing UDF is pure numpy over
    broadcast centroids, so the assignment equals the driver-side
    recomputation with the same math."""
    import numpy as np

    from pipes_spark.operators.similarity import assign_ivf_lists, fit_ivf_centroids
    from pipes_spark.sources import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    C = fit_ivf_centroids(emb, 8, 42, "vec_id", "embedding")
    got = {
        r["vec_id"]: r["list_id"]
        for r in assign_ivf_lists(emb, C, "vec_id", "embedding").collect()
    }
    rows = emb.select("vec_id", "embedding").collect()
    M = np.array([list(map(float, c)) for c in C], dtype="float64")
    for r in rows:
        x = np.array(r["embedding"], dtype="float64")
        xn = x / max(np.linalg.norm(x), 1e-12)
        assert got[r["vec_id"]] == int((-(xn @ M.T)).argmin())


# ---------------------------------------------------------------------------
# avro: per-session registration memo + explicit schema keep reads identical
# ---------------------------------------------------------------------------


def test_avro_registration_memoized_and_reads_identical(spark, tmp_path, sf_dir):
    from pipes_spark.sources import load_table
    from pipes_spark.sources.avro import read_avro, write_avro

    cust = load_table(spark, sf_dir, "customer")
    d = str(tmp_path / "cust_avro")
    write_avro(cust, d)
    a = read_avro(spark, d, split_target_bytes=1 << 16)
    assert getattr(spark, "_pipes_avro_registered", False) is True
    b = read_avro(spark, d, split_target_bytes=1 << 16)  # memoized path
    assert a.schema == b.schema == cust.schema
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, cust.collect()))


def test_avro_explicit_schema_matches_resolution(spark, tmp_path, sf_dir):
    """The driver-side schema passed to load() must equal what the reader
    resolves (incl. under a reader schema with promotion/rename/default)."""
    from pipes_spark.sources import load_table
    from pipes_spark.sources.avro import read_avro, write_avro

    cust = load_table(spark, sf_dir, "customer").limit(50)
    d = str(tmp_path / "cust_avro2")
    write_avro(cust, d)
    v2 = {
        "type": "record",
        "name": "customer",
        "fields": [
            # the writer (from a nullable Spark schema) emits
            # ["null", T] unions - mirror them reader-side
            {"name": "c_custkey", "type": ["null", "long"]},
            {"name": "balance", "type": ["null", "double"], "aliases": ["c_acctbal"]},
            {"name": "region_code", "type": "string", "default": "XX"},
        ],
    }
    df = read_avro(spark, d, reader_schema=json.dumps(v2))
    assert [f.name for f in df.schema.fields] == [
        "c_custkey",
        "balance",
        "region_code",
    ]
    rows = df.collect()
    assert len(rows) == 50 and all(r["region_code"] == "XX" for r in rows)
