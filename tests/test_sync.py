"""Golden dataset D — simulated-clock incremental sync.

Reference test (tests/test_smalltsdb.py:121-155): the wall clock is
injected, and the tensecond table is asserted after each step.  Pins bucket
finalization timing, the silent-late-row drop, and sync idempotency.
"""

import pytest

from smalltsdb_spark.tsdb import TablesTSDB, TwoDatabasesTSDB


def rows_n(db):
    return [
        (r.path, r.timestamp, r.n)
        for r in db.period_table("tensecond").orderBy("path", "timestamp").collect()
    ]


@pytest.mark.parametrize("cls", [TablesTSDB, TwoDatabasesTSDB])
def test_simulated_clock_sync(cls, spark, tsdb_dir):
    clock = {"now": 0.0}
    db = cls(spark, tsdb_dir, now=lambda: clock["now"])

    # step 1: bucket 0 not final at 69 (needs now >= 0 + 10 + 60)
    db.insert([("one", 1, 1), ("two", 5, 2)])
    clock["now"] = 69.0
    db.sync()
    assert rows_n(db) == []

    # step 2: bucket 0 final at 70
    clock["now"] = 70.0
    db.sync()
    assert rows_n(db) == [("one", 0.0, 1.0), ("two", 0.0, 1.0)]

    # step 3: late row ('one', 2, 5) silently lost — bucket 0 already final
    db.insert([("one", 2, 5), ("one", 12, 1)])
    clock["now"] = 79.0
    db.sync()
    assert rows_n(db) == [("one", 0.0, 1.0), ("two", 0.0, 1.0)]

    # step 4: bucket 10 finalizes at 80
    clock["now"] = 80.0
    db.sync()
    assert rows_n(db) == [("one", 0.0, 1.0), ("one", 10.0, 1.0), ("two", 0.0, 1.0)]

    # step 5: idempotent
    clock["now"] = 90.0
    db.sync()
    assert rows_n(db) == [("one", 0.0, 1.0), ("one", 10.0, 1.0), ("two", 0.0, 1.0)]


def test_retention_drops_old_partitions(spark, tsdb_dir):
    clock = {"now": 0.0}
    db = TablesTSDB(spark, tsdb_dir, now=lambda: clock["now"])
    old_ts = 100.0  # day 0
    new_ts = 10 * 86400.0 + 5  # day 10
    db.insert([("m", old_ts, 1.0), ("m", new_ts, 2.0)])
    clock["now"] = new_ts + 100
    db.sync()
    # cutoff = now - 60 - 86400 is far past old_ts -> day-0 partition dropped
    remaining = [(r.path, r.timestamp) for r in db.incoming().collect()]
    assert remaining == [("m", new_ts)]
    # but the old bucket was finalized before deletion
    assert ("m", 0.0 + (old_ts // 10) * 10) in [
        (r.path, r.timestamp) for r in db.period_table("tensecond").collect()
    ]
