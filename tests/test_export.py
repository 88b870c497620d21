"""Sharded JSONL export sink (operators/export.py).

Pins the sink's three contracts: deterministic shard assignment (pure
function of the id — stable across row order and partitioning), exactly
one file per shard directory, and in-file ordering by id.  The full
value round trip vs the source table is the ``ext_export_shards`` driver
row (tests/test_oracle_parity.py runs it locally).
"""

import json
import os

import pytest
from pyspark.sql import types as T

from smalltsdb_spark.operators.export import (
    SHARD_COLUMN,
    export_jsonl_shards,
    read_jsonl_shards,
    shard_of,
)

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)


def _docs(spark, n=40):
    rows = [(i, f"doc {i} " + "tricky éń text\nwith newline") for i in range(n)]
    return spark.createDataFrame(rows, SCHEMA)


def test_one_file_per_shard_sorted(spark, tmp_path):
    out = str(tmp_path / "corpus")
    export_jsonl_shards(_docs(spark), out, n_shards=4)
    shard_dirs = sorted(d for d in os.listdir(out) if d.startswith("shard="))
    assert shard_dirs  # at least one non-empty shard
    for d in shard_dirs:
        files = [
            f
            for f in os.listdir(os.path.join(out, d))
            if f.endswith(".json") and not f.startswith(("_", "."))
        ]
        assert len(files) == 1  # one file per shard
        with open(os.path.join(out, d, files[0])) as f:
            ids = [json.loads(line)["doc_id"] for line in f]
        assert ids == sorted(ids)  # in-file ordering by id


def test_roundtrip_and_deterministic_assignment(spark, tmp_path):
    docs = _docs(spark)
    out1, out2 = str(tmp_path / "c1"), str(tmp_path / "c2")
    export_jsonl_shards(docs, out1, n_shards=4)
    # same data, different incoming order/partitioning → same assignment
    export_jsonl_shards(docs.orderBy("text").repartition(7), out2, n_shards=4)
    b1 = read_jsonl_shards(spark, out1, SCHEMA)
    b2 = read_jsonl_shards(spark, out2, SCHEMA)
    r1 = sorted(map(tuple, b1.collect()))
    r2 = sorted(map(tuple, b2.collect()))
    assert r1 == r2
    # round trip is lossless, including the newline-bearing unicode text
    src = sorted(map(tuple, docs.withColumn(SHARD_COLUMN, shard_of("doc_id", 4)).collect()))
    assert r1 == src


def test_bad_shard_count(spark):
    with pytest.raises(ValueError):
        export_jsonl_shards(_docs(spark, 2), "/tmp/never-written", 0)


def test_incremental_export_idempotent_and_complete(spark, tmp_path):
    from smalltsdb_spark.operators.export import (
        export_jsonl_shards,
        export_jsonl_shards_incremental,
    )

    docs = _docs(spark, 30)
    inc_dir, full_dir = str(tmp_path / "inc"), str(tmp_path / "full")
    export_jsonl_shards_incremental(docs.filter("doc_id < 10"), inc_dir, 4)
    export_jsonl_shards_incremental(docs, inc_dir, 4)  # adds 10..29
    export_jsonl_shards_incremental(docs, inc_dir, 4)  # no-op
    export_jsonl_shards(docs, full_dir, 4)
    from smalltsdb_spark.operators.export import read_jsonl_shards

    got = sorted(map(tuple, read_jsonl_shards(spark, inc_dir, SCHEMA).collect()))
    want = sorted(map(tuple, read_jsonl_shards(spark, full_dir, SCHEMA).collect()))
    assert got == want  # same logical content incl. shard assignment
    # no duplicates from the idempotent third run
    assert len(got) == 30


def test_incremental_rejects_mismatched_shard_count(spark, tmp_path):
    """ADVICE r7: an increment run with a different n_shards would mix
    two shard maps and silently break incremental == one-shot."""
    from smalltsdb_spark.operators.export import (
        export_jsonl_shards,
        export_jsonl_shards_incremental,
    )

    out = str(tmp_path / "exp")
    export_jsonl_shards(_docs(spark, 10), out, 4)
    with pytest.raises(ValueError, match="n_shards"):
        export_jsonl_shards_incremental(_docs(spark, 20), out, 8)
    with pytest.raises(ValueError, match="n_shards"):
        export_jsonl_shards_incremental(_docs(spark, 20), out, 2)
    with pytest.raises(ValueError, match="n_shards"):
        export_jsonl_shards_incremental(_docs(spark, 20), out, 0)
    # the matching count still appends fine
    export_jsonl_shards_incremental(_docs(spark, 20), out, 4)


def test_incremental_marker_backfills_pre_r8_exports(spark, tmp_path):
    """Exports written before the marker existed are still guarded by
    the shard-dir bound, and gain the marker on first increment."""
    import os

    from smalltsdb_spark.operators.export import (
        N_SHARDS_MARKER,
        export_jsonl_shards,
        export_jsonl_shards_incremental,
    )

    out = str(tmp_path / "exp")
    export_jsonl_shards(_docs(spark, 10), out, 4)
    os.remove(os.path.join(out, N_SHARDS_MARKER))  # simulate pre-r8
    with pytest.raises(ValueError, match="shard dirs"):
        export_jsonl_shards_incremental(_docs(spark, 20), out, 2)
    export_jsonl_shards_incremental(_docs(spark, 20), out, 4)
    assert os.path.exists(os.path.join(out, N_SHARDS_MARKER))


def test_incremental_rejects_larger_shard_count_on_markerless_export(
    spark, tmp_path
):
    """ADVICE r8: the dir-name bound only catches a SMALLER n_shards.  A
    marker-less export incremented with a LARGER count passes it and
    would interleave two inconsistent shard maps — the data-derived
    consistency check (recorded shard vs shard_of(id, n_shards)) must
    refuse."""
    import os

    from smalltsdb_spark.operators.export import (
        N_SHARDS_MARKER,
        export_jsonl_shards,
        export_jsonl_shards_incremental,
    )

    out = str(tmp_path / "exp")
    export_jsonl_shards(_docs(spark, 40), out, 4)
    os.remove(os.path.join(out, N_SHARDS_MARKER))  # simulate pre-r8
    with pytest.raises(ValueError, match="inconsistent"):
        export_jsonl_shards_incremental(_docs(spark, 60), out, 8)
    # the refused increment wrote nothing and left no marker claiming 8
    assert not os.path.exists(os.path.join(out, N_SHARDS_MARKER))
    # a consistent re-increment at the true count still works
    export_jsonl_shards_incremental(_docs(spark, 60), out, 4)
    got = sorted(
        r.doc_id
        for r in read_jsonl_shards(spark, out, SCHEMA).collect()
    )
    assert got == list(range(60))


def test_legacy_consistency_scan_runs_at_most_once(spark, tmp_path):
    """ADVICE r9: a PASSING legacy data-verify persists the marker
    immediately (before the increment's own append), so the full-export
    scan happens at most once per legacy export — later increments take
    the marker fast path even if an intermediate append crashed."""
    import os
    from unittest import mock

    from smalltsdb_spark.operators import export as export_mod
    from smalltsdb_spark.operators.export import (
        N_SHARDS_MARKER,
        export_jsonl_shards,
        export_jsonl_shards_incremental,
    )

    out = str(tmp_path / "exp")
    export_jsonl_shards(_docs(spark, 10), out, 4)
    os.remove(os.path.join(out, N_SHARDS_MARKER))  # simulate pre-r8
    with mock.patch.object(
        export_mod, "read_jsonl_shards", wraps=export_mod.read_jsonl_shards
    ) as rd:
        export_jsonl_shards_incremental(_docs(spark, 20), out, 4)
        # verify scan + existing-id anti-join read on the legacy call
        first_calls = rd.call_count
        assert first_calls >= 2
        export_jsonl_shards_incremental(_docs(spark, 30), out, 4)
        # marker fast path: only the existing-id read, no verify scan
        assert rd.call_count == first_calls + 1
    assert os.path.exists(os.path.join(out, N_SHARDS_MARKER))
    got = sorted(
        r.doc_id for r in read_jsonl_shards(spark, out, SCHEMA).collect()
    )
    assert got == list(range(30))
