"""Custom stateful streaming operator (streaming/stateful.py).

Pins: the EW recurrence itself, the batch/streaming equivalence contract
(time-ordered arrival ⇒ identical scores), and state carry-over across
micro-batches — the property that distinguishes applyInPandasWithState
from a per-batch groupBy.
"""

from __future__ import annotations

import math

import pytest

from smalltsdb_spark.schemas import INCOMING_SCHEMA
from smalltsdb_spark.streaming.stateful import (
    _ew_step,
    ewma_scores_batch,
    ewma_scores_stream,
)

ROWS = [
    ("a", 1.0, 10.0),
    ("a", 2.0, 10.0),
    ("a", 3.0, 10.0),
    ("a", 4.0, 20.0),  # spike: scored against pre-update state
    ("b", 1.0, 5.0),
    ("b", 2.0, 6.0),
]


def test_ew_step_recurrence():
    # first point: z=0, mean=x, var=0
    assert _ew_step(0.0, 0.0, 0, 10.0, 0.5) == (0.0, 10.0, 0.0)
    # constant series keeps var at 0 and z uses denom=1 fallback
    z, m, v = _ew_step(10.0, 0.0, 3, 20.0, 0.5)
    assert z == 10.0 and m == 15.0 and v == pytest.approx(25.0)


def test_batch_scores(spark):
    inc = spark.createDataFrame(ROWS, INCOMING_SCHEMA)
    got = {
        (r.path, r.timestamp): (r.ew_mean, r.ew_var, r.zscore)
        for r in ewma_scores_batch(inc, alpha=0.5).collect()
    }
    assert got[("a", 1.0)] == (10.0, 0.0, 0.0)
    assert got[("a", 3.0)] == (10.0, 0.0, 0.0)
    # spike at ts=4: z = (20-10)/1.0 (var=0 fallback), then state absorbs it
    assert got[("a", 4.0)] == (15.0, 25.0, 10.0)
    assert got[("b", 2.0)][2] == pytest.approx(1.0)  # (6-5)/1.0 fallback


def test_stream_equals_batch_and_state_carries(spark, tmp_path):
    """Feed the same rows as TWO chronological files → two micro-batches;
    scores must equal the batch twin's (state carried across batches)."""
    inc = spark.createDataFrame(ROWS, INCOMING_SCHEMA)
    batch = {
        (r.path, r.timestamp): (r.ew_mean, r.ew_var, r.zscore)
        for r in ewma_scores_batch(inc, alpha=0.5).collect()
    }

    src = tmp_path / "src"
    src.mkdir()
    first = [r for r in ROWS if r[1] <= 2.0]
    second = [r for r in ROWS if r[1] > 2.0]
    spark.createDataFrame(first, INCOMING_SCHEMA).coalesce(1).write.parquet(
        str(src / "b0.parquet")
    )
    stream = spark.readStream.schema(INCOMING_SCHEMA).option(
        "maxFilesPerTrigger", "1"
    ).parquet(str(src) + "/*/")
    q = (
        ewma_scores_stream(stream, alpha=0.5)
        .writeStream.format("memory")
        .queryName("ewma_t")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        spark.createDataFrame(second, INCOMING_SCHEMA).coalesce(1).write.parquet(
            str(src / "b1.parquet")
        )
        q.processAllAvailable()
        got = {
            (r.path, r.timestamp): (r.ew_mean, r.ew_var, r.zscore)
            for r in spark.table("ewma_t").collect()
        }
    finally:
        q.stop()
    assert len(got) == len(ROWS)
    for k, v in batch.items():
        assert got[k] == pytest.approx(v), k
    # the spike row landed in batch 2 but was scored against batch-1 state
    assert got[("a", 4.0)][2] == pytest.approx(10.0)


def test_stream_rejects_nothing_on_empty_batch(spark):
    """Smoke: operator declares sound schemas (analysis-time check)."""
    inc = spark.readStream.format("rate").load().selectExpr(
        "'p' as path", "cast(value as double) as timestamp", "cast(value as double) as value"
    )
    ewma_scores_stream(inc)  # must analyze without error


def test_first_seen_stream_equals_batch_and_drops_across_batches(spark, tmp_path):
    """Cross-micro-batch dedup: keys emitted in batch 1 must be dropped in
    batch 2 by STATE, and the surviving rows must equal the batch twin."""
    from smalltsdb_spark.streaming.stateful import (
        first_seen_batch,
        first_seen_stream,
    )

    rows = [
        ("a", 1.0, 10.0), ("a", 2.0, 10.0),   # dup within batch 1
        ("a", 1.5, 20.0),
        ("b", 2.5, 10.0),
    ]
    rows2 = [
        ("a", 3.0, 10.0),                     # dup ACROSS batches -> state
        ("a", 3.5, 30.0),                     # new key in batch 2
        ("b", 4.0, 10.0),                     # dup across batches
    ]
    inc_all = spark.createDataFrame(rows + rows2, INCOMING_SCHEMA)
    expect = {
        (r.path, r.value): r.timestamp
        for r in first_seen_batch(
            inc_all, key_cols=["path", "value"]
        ).collect()
    }

    src = tmp_path / "src"
    src.mkdir()
    spark.createDataFrame(rows, INCOMING_SCHEMA).coalesce(1).write.parquet(
        str(src / "b0.parquet")
    )
    stream = spark.readStream.schema(INCOMING_SCHEMA).option(
        "maxFilesPerTrigger", "1"
    ).parquet(str(src) + "/*/")
    q = (
        first_seen_stream(stream, key_cols=["path", "value"])
        .writeStream.format("memory")
        .queryName("fs_t")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        n_after_b1 = spark.table("fs_t").count()
        spark.createDataFrame(rows2, INCOMING_SCHEMA).coalesce(1).write.parquet(
            str(src / "b1.parquet")
        )
        q.processAllAvailable()
        got = {
            (r.path, r.value): r.timestamp for r in spark.table("fs_t").collect()
        }
    finally:
        q.stop()
    assert n_after_b1 == 3  # (a,10) (a,20) (b,10)
    assert got == expect    # batch-2 dups dropped, (a,30) added


def test_first_seen_ttl_plumbing(spark, tmp_path):
    """TTL mode: the ProcessingTimeTimeout wiring must run a full
    lifecycle (setTimeoutDuration on create and on refresh) and produce
    the same first-seen output; actual expiry is wall-clock-dependent and
    not asserted here."""
    from smalltsdb_spark.streaming.stateful import first_seen_stream

    src = tmp_path / "src"
    src.mkdir()
    rows = [("a", 1.0, 10.0), ("a", 2.0, 10.0), ("b", 3.0, 20.0)]
    spark.createDataFrame(rows, INCOMING_SCHEMA).coalesce(1).write.parquet(
        str(src / "b0.parquet")
    )
    import time as _time

    stream = spark.readStream.schema(INCOMING_SCHEMA).parquet(str(src) + "/*/")
    # with ProcessingTimeTimeout armed the engine schedules timeout-check
    # batches forever, so neither availableNow nor processAllAvailable
    # quiesces (documented on first_seen_stream) — poll the sink, then stop
    q = (
        first_seen_stream(stream, key_cols=["path", "value"], ttl_minutes=5)
        .writeStream.format("memory")
        .queryName("fs_ttl")
        .outputMode("append")
        .start()
    )
    try:
        deadline = _time.monotonic() + 120
        while _time.monotonic() < deadline:
            if spark.table("fs_ttl").count() >= 2:
                break
            _time.sleep(0.5)
        got = {(r.path, r.value) for r in spark.table("fs_ttl").collect()}
    finally:
        q.stop()
    assert got == {("a", 10.0), ("b", 20.0)}
