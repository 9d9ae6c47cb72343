"""Avro container-file source/sink (pipes_spark.sources.avro).

The format is implemented from the PUBLIC Apache Avro 1.11 spec (no Avro
library ships in this environment), so the tests validate three
independent layers:

1. spec compliance of the READER against a byte fixture constructed by
   hand in the test (not by our own writer — a symmetric encode/decode
   bug cannot hide there);
2. writer↔reader round trips over the full supported type surface,
   codecs, and block-split boundaries;
3. the Spark integration: split-parallel DataSource reads, the
   distributed DataSourceWriter sink, and spec schema resolution.
"""

from __future__ import annotations

import datetime
import json
import os
import struct
import zlib
from decimal import Decimal

import pytest

from pipes_spark.sources import avro as av


# ---------------------------------------------------------------------------
# layer 1: hand-crafted bytes (reader spec compliance, writer-independent)
# ---------------------------------------------------------------------------


def _varint(v: int) -> bytes:
    """Independent zigzag-varint encoder, written from the spec text."""
    z = (v << 1) ^ (v >> 63)
    z &= (1 << 64) - 1
    out = bytearray()
    while z > 0x7F:
        out.append((z & 0x7F) | 0x80)
        z >>= 7
    out.append(z)
    return bytes(out)


def _handmade_file(tmp_path, codec: str = "null") -> str:
    """Container file for record{id long, name string, score double}
    with rows (1,"a",0.5), (-2,"bc",-1.25) — every byte laid out from the
    spec by hand."""
    schema = json.dumps(
        {
            "type": "record",
            "name": "H",
            "fields": [
                {"name": "id", "type": "long"},
                {"name": "name", "type": "string"},
                {"name": "score", "type": "double"},
            ],
        }
    ).encode()
    sync = bytes(range(16))
    header = bytearray(b"Obj\x01")
    header += _varint(2)  # metadata map: 2 entries
    for k, v in ((b"avro.schema", schema), (b"avro.codec", codec.encode())):
        header += _varint(len(k)) + k + _varint(len(v)) + v
    header += _varint(0) + sync
    body = bytearray()
    body += _varint(1) + b"a" + struct.pack("<d", 0.5)
    body = _varint(1) + body  # id=1 zigzag
    body2 = _varint(-2) + _varint(2) + b"bc" + struct.pack("<d", -1.25)
    data = bytes(body) + bytes(body2)
    if codec == "deflate":
        c = zlib.compressobj(9, zlib.DEFLATED, -15)
        data = c.compress(data) + c.flush()
    elif codec == "bzip2":
        import bz2

        data = bz2.compress(data)
    elif codec == "xz":
        import lzma

        data = lzma.compress(data)
    block = _varint(2) + _varint(len(data)) + data + sync
    p = str(tmp_path / f"hand_{codec}.avro")
    with open(p, "wb") as f:
        f.write(header + block)
    return p


@pytest.mark.parametrize("codec", ["null", "deflate", "bzip2", "xz"])
def test_reader_decodes_handmade_bytes(tmp_path, codec):
    p = _handmade_file(tmp_path, codec)
    rows = list(av._iter_range_rows(p, 0, 10**9))
    assert rows == [(1, "a", 0.5), (-2, "bc", -1.25)]
    meta = av.read_file_metadata(p)
    assert meta["codec"] == codec
    assert meta["schema"]["name"] == "H"


def test_reader_rejects_bad_magic(tmp_path):
    p = str(tmp_path / "bad.avro")
    with open(p, "wb") as f:
        f.write(b"PAR1not avro at all")
    with pytest.raises(ValueError, match="magic"):
        av.read_file_metadata(p)


def test_reader_rejects_corrupt_sync(tmp_path):
    p = _handmade_file(tmp_path)
    raw = bytearray(open(p, "rb").read())
    raw[-1] ^= 0xFF  # flip a byte of the trailing block sync
    with open(p, "wb") as f:
        f.write(raw)
    with pytest.raises(ValueError, match="sync"):
        list(av._iter_range_rows(p, 0, 10**9))


# ---------------------------------------------------------------------------
# layer 2: writer ↔ reader round trips (pure Python)
# ---------------------------------------------------------------------------

FULL_SCHEMA = {
    "type": "record",
    "name": "T",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "name", "type": ["null", "string"]},
        {"name": "score", "type": "double"},
        {"name": "ratio", "type": "float"},
        {"name": "flag", "type": "boolean"},
        {"name": "raw", "type": "bytes"},
        {"name": "color", "type": {"type": "enum", "name": "Color", "symbols": ["RED", "GREEN", "BLUE"]}},
        {"name": "tags", "type": {"type": "array", "items": "string"}},
        {"name": "props", "type": {"type": "map", "values": "int"}},
        {"name": "fx", "type": {"type": "fixed", "name": "F4", "size": 4}},
        {"name": "d", "type": {"type": "int", "logicalType": "date"}},
        {"name": "ts", "type": {"type": "long", "logicalType": "timestamp-micros"}},
        {"name": "amt", "type": {"type": "bytes", "logicalType": "decimal", "precision": 10, "scale": 2}},
        {
            "name": "nested",
            "type": {
                "type": "record",
                "name": "N",
                "fields": [
                    {"name": "a", "type": "int"},
                    {"name": "b", "type": ["null", "double"]},
                ],
            },
        },
    ],
}

FULL_ROWS = [
    (
        1, "alice", 1.5, 0.25, True, b"\x00\x01", "RED", ["x", "y"], {"k": 3},
        b"abcd", datetime.date(2020, 1, 2),
        datetime.datetime(2021, 3, 4, 5, 6, 7, 123456), Decimal("-12.34"), (7, 2.5),
    ),
    (
        -2, None, -0.25, -2.0, False, b"", "BLUE", [], {}, b"wxyz",
        datetime.date(1969, 12, 31),
        datetime.datetime(1969, 12, 31, 23, 59, 59), Decimal("0.01"), (8, None),
    ),
]


@pytest.mark.parametrize("codec", ["null", "deflate", "bzip2", "xz"])
def test_full_surface_roundtrip(tmp_path, codec):
    p = str(tmp_path / f"full_{codec}.avro")
    n = av.write_avro_file(p, FULL_SCHEMA, FULL_ROWS, codec=codec, block_rows=1)
    assert n == 2
    assert list(av._iter_range_rows(p, 0, 10**9)) == FULL_ROWS


def test_dict_rows_and_named_type_reference(tmp_path):
    # a named type defined once and referenced by name later (spec:
    # named-type references), rows supplied as dicts
    schema = {
        "type": "record",
        "name": "R",
        "fields": [
            {"name": "p", "type": {"type": "fixed", "name": "F2", "size": 2}},
            {"name": "q", "type": "F2"},
        ],
    }
    p = str(tmp_path / "named.avro")
    av.write_avro_file(p, schema, [{"p": b"ab", "q": b"cd"}])
    assert list(av._iter_range_rows(p, 0, 10**9)) == [(b"ab", b"cd")]


def test_split_ranges_partition_blocks_exactly(tmp_path):
    """Every block decodes in exactly one byte-range split, for any cut."""
    schema = {"type": "record", "name": "S", "fields": [{"name": "i", "type": "long"}]}
    p = str(tmp_path / "split.avro")
    av.write_avro_file(p, schema, [(i,) for i in range(1000)], block_rows=7)
    size = os.path.getsize(p)
    lo0 = av.read_file_metadata(p)["first_block_offset"]
    for n_splits in (1, 2, 3, 5, 13):
        step = max((size - lo0) // n_splits, 1)
        got = []
        bounds = list(range(lo0, size, step)) + [size]
        for a, b in zip(bounds, bounds[1:]):
            got += [r[0] for r in av._iter_range_rows(p, a, b)]
        assert sorted(got) == list(range(1000)), f"n_splits={n_splits}"


def test_schema_resolution_defaults_promotions_reorder(tmp_path):
    p = str(tmp_path / "res.avro")
    av.write_avro_file(p, FULL_SCHEMA, FULL_ROWS)
    reader = json.dumps(
        {
            "type": "record",
            "name": "T",
            "fields": [
                # reorder + promote int-field nested.a untouched; id long→double
                {"name": "score", "type": "double"},
                {"name": "id", "type": "double"},
                # writer-missing field with default
                {"name": "lang", "type": "string", "default": "en"},
                # nested record: drop b, add defaulted c
                {
                    "name": "nested",
                    "type": {
                        "type": "record",
                        "name": "N",
                        "fields": [
                            {"name": "a", "type": "long"},
                            {"name": "c", "type": "int", "default": 9},
                        ],
                    },
                },
            ],
        }
    )
    rows = list(av._iter_range_rows(p, 0, 10**9, reader))
    assert rows == [(1.5, 1.0, "en", (7, 9)), (-0.25, -2.0, "en", (8, 9))]


def test_resolution_missing_field_without_default_raises(tmp_path):
    p = str(tmp_path / "res2.avro")
    schema = {"type": "record", "name": "A", "fields": [{"name": "x", "type": "int"}]}
    av.write_avro_file(p, schema, [(1,)])
    reader = json.dumps(
        {"type": "record", "name": "A", "fields": [{"name": "y", "type": "int"}]}
    )
    with pytest.raises(ValueError, match="default"):
        list(av._iter_range_rows(p, 0, 10**9, reader))


def test_incompatible_types_raise(tmp_path):
    p = str(tmp_path / "res3.avro")
    schema = {"type": "record", "name": "A", "fields": [{"name": "x", "type": "string"}]}
    av.write_avro_file(p, schema, [("s",)])
    reader = json.dumps(
        {"type": "record", "name": "A", "fields": [{"name": "x", "type": "int"}]}
    )
    with pytest.raises(ValueError, match="resolve"):
        list(av._iter_range_rows(p, 0, 10**9, reader))


# ---------------------------------------------------------------------------
# layer 3: Spark integration
# ---------------------------------------------------------------------------


def test_read_avro_dataframe_types_and_values(spark, tmp_path):
    p = str(tmp_path / "full.avro")
    av.write_avro_file(p, FULL_SCHEMA, FULL_ROWS, block_rows=1)
    df = av.read_avro(spark, p)
    ddl = dict((f.name, f.dataType.simpleString()) for f in df.schema.fields)
    assert ddl["id"] == "bigint" and ddl["name"] == "string"
    assert ddl["d"] == "date" and ddl["ts"] == "timestamp"
    assert ddl["amt"] == "decimal(10,2)"
    assert ddl["nested"] == "struct<a:int,b:double>"
    assert df.schema["name"].nullable and not df.schema["id"].nullable
    rows = df.orderBy(df.id.desc()).collect()
    assert rows[0]["nested"]["a"] == 7 and rows[0]["amt"] == Decimal("-12.34")
    assert rows[1]["name"] is None and rows[1]["tags"] == []


def test_read_avro_splits_make_parallel_partitions(spark, tmp_path):
    schema = {"type": "record", "name": "S", "fields": [{"name": "i", "type": "long"}]}
    p = str(tmp_path / "big.avro")
    # ~200 KB uncompressed in 5-row blocks → several 64 KiB splits
    av.write_avro_file(p, schema, [(i,) for i in range(20000)], codec="null", block_rows=5)
    df = av.read_avro(spark, p, split_target_bytes=1 << 16)
    assert df.rdd.getNumPartitions() > 1
    agg = df.agg({"i": "sum", "*": "count"}).collect()[0]
    assert agg["count(1)"] == 20000 and agg["sum(i)"] == sum(range(20000))


def test_write_avro_distributed_sink_roundtrip(spark, sf_dir, tmp_path):
    from pipes_spark.sources import load_table

    out = str(tmp_path / "cust_avro")
    cust = load_table(spark, sf_dir, "customer")
    av.write_avro(cust.repartition(4), out)
    parts = [f for f in os.listdir(out) if f.endswith(".avro")]
    assert len(parts) == 4  # one container file per partition
    back = av.read_avro(spark, out)
    assert back.schema == cust.schema or [
        (f.name, f.dataType) for f in back.schema.fields
    ] == [(f.name, f.dataType) for f in cust.schema.fields]
    a = sorted(tuple(r) for r in cust.collect())
    b = sorted(tuple(r) for r in back.collect())
    assert a == b


def test_customer_fixture_idempotent_and_query_matches_parquet(spark, sf_dir):
    from pipes_spark.catalog import QUERIES
    from pipes_spark.sources import load_table
    from pipes_spark.warehouse import avro_customer_fixture

    p1 = avro_customer_fixture(spark, sf_dir)
    m1 = os.path.getmtime(p1)
    p2 = avro_customer_fixture(spark, sf_dir)
    assert p1 == p2 and os.path.getmtime(p2) == m1  # second call: pure read

    got = QUERIES["source_avro_roundtrip"].fn(spark, sf_dir).collect()
    cust = load_table(spark, sf_dir, "customer")
    from pyspark.sql import functions as F

    want = (
        cust.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
            F.round(
                F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double"), 2
            ).alias("total_acctbal"),
        )
        .orderBy("c_mktsegment")
        .collect()
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_union_beyond_nullable_has_no_spark_type():
    with pytest.raises(ValueError, match="union"):
        av.spark_schema_for(
            json.dumps(
                {
                    "type": "record",
                    "name": "U",
                    "fields": [{"name": "u", "type": ["int", "string"]}],
                }
            )
        )


def test_sources_sinks_wrappers_roundtrip(spark, sf_dir, tmp_path):
    """The package-level wrappers (sources.read_avro / sinks.write_avro)
    compose like every other format pair."""
    from pipes_spark import sinks, sources

    out = str(tmp_path / "nation_avro")
    nation = sources.load_table(spark, sf_dir, "nation")
    assert sinks.write_avro(out)(nation) == out
    back = sources.read_avro(spark, out)
    assert sorted(tuple(r) for r in back.collect()) == sorted(
        tuple(r) for r in nation.collect()
    )


def test_union_encoder_dispatches_by_runtime_type(tmp_path):
    """Multi-branch unions pick the branch matching the datum (spec), not
    blindly the first non-null branch (which would write 1.5 through a
    long branch — silent corruption)."""
    schema = {
        "type": "record",
        "name": "U",
        "fields": [{"name": "u", "type": ["null", "long", "double", "string"]}],
    }
    rows = [(None,), (5,), (1.5,), ("x",)]
    p = str(tmp_path / "union.avro")
    av.write_avro_file(p, schema, rows)
    assert list(av._iter_range_rows(p, 0, 10**9)) == rows
    # int datum with only a double branch promotes, and an unmatchable
    # datum raises instead of corrupting
    p2 = str(tmp_path / "union2.avro")
    av.write_avro_file(
        p2,
        {"type": "record", "name": "U2", "fields": [{"name": "u", "type": ["null", "double"]}]},
        [(3,)],
    )
    assert list(av._iter_range_rows(p2, 0, 10**9)) == [(3.0,)]
    with pytest.raises(ValueError, match="union branch"):
        av.write_avro_file(
            str(tmp_path / "union3.avro"),
            {"type": "record", "name": "U3", "fields": [{"name": "u", "type": ["null", "long"]}]},
            [("not an int",)],
        )


def test_write_avro_overwrite_replaces_and_append_adds(spark, sf_dir, tmp_path):
    from pipes_spark.sources import load_table

    out = str(tmp_path / "modes")
    nation = load_table(spark, sf_dir, "nation")
    av.write_avro(nation, out)  # default overwrite
    assert av.read_avro(spark, out).count() == 25
    av.write_avro(nation, out)  # re-run must NOT double the data
    assert av.read_avro(spark, out).count() == 25
    av.write_avro(nation, out, mode="append")
    assert av.read_avro(spark, out).count() == 50
    with pytest.raises(ValueError, match="mode"):
        av.write_avro(nation, out, mode="errorifexists")


def test_orphaned_tmp_files_invisible_to_readers(spark, sf_dir, tmp_path):
    """A failed/speculative task attempt leaves only a dot-prefixed temp
    file (the commit protocol renames succeeded attempts); readers list
    *.avro and never see it."""
    from pipes_spark.sources import load_table

    out = str(tmp_path / "tmpvis")
    nation = load_table(spark, sf_dir, "nation")
    av.write_avro(nation, out)
    # simulate a dead attempt's leftover
    stray = os.path.join(out, ".part-deadbeef.avro.tmp")
    with open(stray, "wb") as f:
        f.write(b"truncated garbage")
    assert av.read_avro(spark, out).count() == 25
    # and the next overwrite clears it
    av.write_avro(nation, out)
    assert not os.path.exists(stray)


def test_repeated_reads_do_not_grow_datasource_registry(spark, tmp_path):
    """The format is ONE static registration ('pipes_avro'); per-call
    uuid-named sources would leak a registry entry per query."""
    schema = {"type": "record", "name": "S", "fields": [{"name": "i", "type": "long"}]}
    p = str(tmp_path / "reg.avro")
    av.write_avro_file(p, schema, [(1,), (2,)])
    for _ in range(3):
        assert av.read_avro(spark, p).count() == 2
    # same name resolves; a fourth read still works after re-registration
    assert av.read_avro(spark, p, split_target_bytes=1 << 16).count() == 2


def test_read_avro_stream_unions_drops_and_discovers_new_files(spark, tmp_path):
    """Directory streaming: existing monotone-named drops form the first
    micro-batches; a file landing while the query runs is picked up by
    the next offset discovery."""
    from pyspark.sql import functions as F

    schema = {
        "type": "record",
        "name": "S",
        "fields": [{"name": "i", "type": "long"}, {"name": "g", "type": "string"}],
    }
    d = str(tmp_path / "drops")
    os.makedirs(d)
    av.write_avro_file(f"{d}/batch-000001.avro", schema, [(i, "a") for i in range(100)])
    av.write_avro_file(f"{d}/batch-000002.avro", schema, [(i, "b") for i in range(50)])

    stream = av.read_avro_stream(spark, d, split_target_bytes=1 << 16)
    agg = stream.groupBy("g").agg(
        F.count(F.lit(1)).alias("n"), F.sum("i").alias("s")
    )
    name = "avro_stream_inc"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {r["g"]: (r["n"], r["s"]) for r in spark.table(name).collect()}
        assert got == {"a": (100, 4950), "b": (50, 1225)}

        av.write_avro_file(
            f"{d}/batch-000003.avro", schema, [(i, "a") for i in range(10)]
        )
        q.processAllAvailable()
        got = {r["g"]: (r["n"], r["s"]) for r in spark.table(name).collect()}
        assert got == {"a": (110, 4995), "b": (50, 1225)}
    finally:
        q.stop()
        spark.catalog.dropTempView(name)


def test_streaming_avro_query_matches_batch(spark, sf_dir):
    from pipes_spark.catalog import QUERIES

    a = [tuple(r) for r in QUERIES["streaming_avro_source"].fn(spark, sf_dir).collect()]
    b = [tuple(r) for r in QUERIES["source_avro_roundtrip"].fn(spark, sf_dir).collect()]
    assert a == b and len(a) > 0


def test_stream_idles_on_missing_dir_and_torn_drop_holds_watermark(spark, tmp_path):
    """A not-yet-created drop directory idles (no crash); a torn
    in-flight file holds the name watermark back so it and later names
    wait, then flow once the file is complete."""
    import json as _json

    from pyspark.sql import functions as F

    schema = {"type": "record", "name": "S", "fields": [{"name": "i", "type": "long"}]}
    d = str(tmp_path / "notyet")
    stream = av.read_avro_stream(spark, d, reader_schema=_json.dumps(schema))
    agg = stream.agg(F.count(F.lit(1)).alias("n"))
    name = "avro_stream_torn"
    q = (
        agg.writeStream.format("memory").queryName(name).outputMode("complete").start()
    )
    try:
        q.processAllAvailable()  # missing dir: idle, not crash
        assert spark.table(name).collect()[0]["n"] == 0

        os.makedirs(d)
        av.write_avro_file(f"{d}/batch-000001.avro", schema, [(i,) for i in range(7)])
        with open(f"{d}/batch-000002.avro", "wb") as f:
            f.write(b"Obj\x01torn-in-flight")  # producer mid-write
        av.write_avro_file(f"{d}/batch-000003.avro", schema, [(i,) for i in range(5)])
        q.processAllAvailable()
        # only the readable prefix (file 1) is admitted
        assert spark.table(name).collect()[0]["n"] == 7

        av.write_avro_file(f"{d}/batch-000002.avro", schema, [(i,) for i in range(3)])
        q.processAllAvailable()
        assert spark.table(name).collect()[0]["n"] == 15
    finally:
        q.stop()
        spark.catalog.dropTempView(name)


def test_write_avro_part_names_monotone_for_stream_composition(spark, sf_dir, tmp_path):
    """Sequential write_avro batches produce lexicographically increasing
    part names (nanosecond prefix), so the module's own sink composes
    with the directory stream's name-watermark offsets."""
    from pyspark.sql import functions as F

    from pipes_spark.sources import load_table

    d = str(tmp_path / "compose")
    nation = load_table(spark, sf_dir, "nation")
    av.write_avro(nation.repartition(2), d, mode="append")
    first = sorted(f for f in os.listdir(d) if f.endswith(".avro"))
    av.write_avro(nation.repartition(2), d, mode="append")
    both = sorted(f for f in os.listdir(d) if f.endswith(".avro"))
    second = [f for f in both if f not in first]
    assert len(first) == 2 and len(second) == 2
    assert min(second) > max(first)

    # end to end: the stream sees both batches
    stream = av.read_avro_stream(spark, d)
    out_name = "avro_stream_compose"
    q = (
        stream.agg(F.count(F.lit(1)).alias("n"))
        .writeStream.format("memory")
        .queryName(out_name)
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
        assert spark.table(out_name).collect()[0]["n"] == 50
    finally:
        q.stop()
        spark.catalog.dropTempView(out_name)


# ---------------------------------------------------------------------------
# round-9 extension: time-millis/micros + local-timestamp logical types
# ---------------------------------------------------------------------------

TIME_SCHEMA = {
    "type": "record",
    "name": "TT",
    "fields": [
        {"name": "t_ms", "type": {"type": "int", "logicalType": "time-millis"}},
        {"name": "t_us", "type": {"type": "long", "logicalType": "time-micros"}},
        {
            "name": "lts_ms",
            "type": {"type": "long", "logicalType": "local-timestamp-millis"},
        },
        {
            "name": "lts_us",
            "type": ["null", {"type": "long", "logicalType": "local-timestamp-micros"}],
        },
        {
            "name": "t_opt",
            "type": ["null", {"type": "long", "logicalType": "time-micros"}],
        },
    ],
}

TIME_ROWS = [
    (
        datetime.time(13, 45, 30, 250000),
        datetime.time(23, 59, 59, 999999),
        datetime.datetime(2021, 3, 4, 5, 6, 7, 123000),
        datetime.datetime(1969, 12, 31, 23, 59, 59, 1),
        datetime.time(0, 0, 0, 7),
    ),
    (
        datetime.time(0, 0),
        datetime.time(0, 0),
        datetime.datetime(1970, 1, 1),
        None,
        None,
    ),
]


def test_time_and_local_timestamp_roundtrip(tmp_path):
    p = str(tmp_path / "times.avro")
    av.write_avro_file(p, TIME_SCHEMA, TIME_ROWS, block_rows=1)
    assert list(av._iter_range_rows(p, 0, 10**9)) == TIME_ROWS


def test_time_logicals_decode_handmade_bytes(tmp_path):
    """time-millis (int) and local-timestamp-millis (long) laid out by
    hand from the spec: 13:45:30.250 = 49_530_250 ms-of-day;
    1970-01-02T03:04:05.006 local = 97_445_006 ms since epoch."""
    schema = json.dumps(
        {
            "type": "record",
            "name": "HM",
            "fields": [
                {"name": "t", "type": {"type": "int", "logicalType": "time-millis"}},
                {
                    "name": "lts",
                    "type": {"type": "long", "logicalType": "local-timestamp-millis"},
                },
            ],
        }
    ).encode()
    sync = bytes(range(16))
    row = _varint(49_530_250) + _varint(97_445_006)
    header = (
        b"Obj\x01"
        + _varint(2)
        + _varint(len(b"avro.schema")) + b"avro.schema"
        + _varint(len(schema)) + schema
        + _varint(len(b"avro.codec")) + b"avro.codec"
        + _varint(len(b"null")) + b"null"
        + _varint(0)
        + sync
    )
    p = str(tmp_path / "hand_time.avro")
    with open(p, "wb") as f:
        f.write(header + _varint(1) + _varint(len(row)) + row + sync)
    assert list(av._iter_range_rows(p, 0, 10**9)) == [
        (
            datetime.time(13, 45, 30, 250000),
            datetime.datetime(1970, 1, 2, 3, 4, 5, 6000),
        )
    ]


def test_time_logicals_spark_types():
    from pyspark.sql import types as T

    st = av.spark_schema_for(av._parse(dict(TIME_SCHEMA), {}))
    assert isinstance(st["t_ms"].dataType, T.TimeType)
    assert isinstance(st["t_us"].dataType, T.TimeType)
    assert isinstance(st["lts_ms"].dataType, T.TimestampNTZType)
    assert isinstance(st["lts_us"].dataType, T.TimestampNTZType)
    assert st["lts_us"].nullable and not st["lts_ms"].nullable


def test_time_and_ntz_spark_roundtrip(spark, tmp_path):
    """TimeType and TimestampNTZType survive the full DataSource path:
    Spark DF → distributed writer → split-parallel reader → Spark DF."""
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("i", T.LongType(), False),
            T.StructField("t", T.TimeType(), True),
            T.StructField("lts", T.TimestampNTZType(), True),
        ]
    )
    rows = [
        (
            1,
            datetime.time(13, 45, 30, 250000),
            datetime.datetime(2021, 3, 4, 5, 6, 7, 123456),
        ),
        (2, None, None),
    ]
    dest = str(tmp_path / "times_avro")
    av.write_avro(spark.createDataFrame(rows, schema), dest)
    back = av.read_avro(spark, dest)
    assert isinstance(back.schema["t"].dataType, T.TimeType)
    assert isinstance(back.schema["lts"].dataType, T.TimestampNTZType)
    assert sorted(tuple(r) for r in back.collect()) == sorted(rows)
