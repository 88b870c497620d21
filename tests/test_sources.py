"""Graphite wire codec + spool data source (reference daemon.py:16-30).

The end-to-end daemon golden (reference tests/test_smalltsdb.py:36-82) is
in test_daemon.py; here: pure codec semantics and the DataSource.
"""

import pytest

from smalltsdb_spark.sources.daemon import SpoolSink
from smalltsdb_spark.sources.datasource import GraphiteDataSource
from smalltsdb_spark.sources.graphite import (
    format_lines_df,
    parse_line,
    parse_lines_df,
)


def test_parse_line_golden():
    # wire order is "path value timestamp"; tuple order is (path, ts, value)
    assert parse_line("one 1 1") == ("one", 1.0, 1.0)
    assert parse_line("a.b.c 2.5 1704067200.25") == ("a.b.c", 1704067200.25, 2.5)


@pytest.mark.parametrize(
    "bad", ["", "onlypath", "a 1", "a 1 2 3", "a x 1", "a 1 x"]
)
def test_parse_line_rejects(bad):
    with pytest.raises(ValueError):
        parse_line(bad)


def test_parse_lines_df_drops_malformed(spark):
    lines = spark.createDataFrame(
        [
            ("one 1 1",),
            ("  two   2.5   10.5  ",),  # forgiving about whitespace runs
            ("garbage",),
            ("too many fields 1 2",),
            ("bad notanumber 3",),
            ("bad 3 notanumber",),
            ("",),
        ],
        "value string",
    )
    rows = sorted(tuple(r) for r in parse_lines_df(lines).collect())
    assert rows == [("one", 1.0, 1.0), ("two", 10.5, 2.5)]


def test_wire_round_trip(spark):
    from tests.test_golden import GOLDEN_A_INPUT

    inc = spark.createDataFrame(GOLDEN_A_INPUT, "path string, timestamp double, value double")
    back = parse_lines_df(format_lines_df(inc))
    assert sorted(map(tuple, back.collect())) == sorted(GOLDEN_A_INPUT)


def test_spool_sink_and_datasource_batch(spark, tmp_path):
    spool = str(tmp_path / "spool")
    sink = SpoolSink(spool)
    sink([("one", 1.0, 1.0), ("one", 2.0, 5.0)])
    sink([("two", 5.0, 2.0), ("one", 12.0, 1.0)])

    spark.dataSource.register(GraphiteDataSource)
    df = spark.read.format("graphite").load(spool)
    assert df.columns == ["path", "timestamp", "value"]
    rows = sorted(tuple(r) for r in df.collect())
    assert rows == [
        ("one", 1.0, 1.0),
        ("one", 2.0, 5.0),
        ("one", 12.0, 1.0),
        ("two", 5.0, 2.0),
    ]
    # one input partition per spool file → parallel batch reads
    assert df.rdd.getNumPartitions() == 2


def test_datasource_stream_availablenow(spark, tmp_path):
    spool = str(tmp_path / "spool")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    sink = SpoolSink(spool)
    sink([("one", 1.0, 1.0)])
    sink([("two", 5.0, 2.0)])

    spark.dataSource.register(GraphiteDataSource)
    q = (
        spark.readStream.format("graphite")
        .load(spool)
        .writeStream.format("parquet")
        .option("checkpointLocation", ckpt)
        .option("path", out)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    first = sorted(tuple(r) for r in spark.read.parquet(out).collect())
    assert first == [("one", 1.0, 1.0), ("two", 5.0, 2.0)]

    # new spool file after the first run → incremental pickup from offset
    sink([("one", 12.0, 1.0)])
    q = (
        spark.readStream.format("graphite")
        .load(spool)
        .writeStream.format("parquet")
        .option("checkpointLocation", ckpt)
        .option("path", out)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    rows = sorted(tuple(r) for r in spark.read.parquet(out).collect())
    assert rows == [
        ("one", 1.0, 1.0),
        ("one", 12.0, 1.0),
        ("two", 5.0, 2.0),
    ]


def test_incoming_roundtrips_through_all_formats(spark, tmp_path):
    """SURVEY §2.1 'file formats' row: the incoming relation survives
    csv/json/orc/parquet round-trips byte-exactly (values chosen exactly
    representable so text formats can't lose precision)."""
    from smalltsdb_spark.schemas import INCOMING_SCHEMA

    rows = [("a.b", 1.5, 2.25), ("c", 10.0, -3.0), ("d.e.f", 0.125, 1e9)]
    df = spark.createDataFrame(rows, INCOMING_SCHEMA)
    for fmt in ("csv", "json", "orc", "parquet"):
        path = str(tmp_path / fmt)
        df.write.format(fmt).option("header", "true").save(path)
        back = (
            spark.read.format(fmt)
            .option("header", "true")
            .schema(INCOMING_SCHEMA)
            .load(path)
        )
        assert sorted(map(tuple, back.collect())) == sorted(rows), fmt
