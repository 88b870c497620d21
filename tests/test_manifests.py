"""Unit + property tests for the shared versioned-manifest protocol
(smalltsdb_spark/manifests.py) — the commit/GC mechanics three
subsystems share (storage.py single-manifest tables, streaming span
index, streaming semantic index).

The GC visibility tests pin ADVICE r12 (high): Spark's file-index
hidden rule exempts ``_``-prefixed names containing ``=`` (partition
dirs for underscore-named columns, e.g. the semantic index's
``_list=3``).  Before the fix, ``collect_parquets`` pruned those dirs,
every live ``data_b*`` dir scanned as empty writer debris, and
``gc_superseded_versions`` rmtree'd manifest-referenced index files
once the dir aged past the grace window.
"""

from __future__ import annotations

import os
import time

from smalltsdb_spark import manifests


def _age(path: str, seconds: float = 3600.0) -> None:
    old = time.time() - seconds
    os.utime(path, (old, old))


def _mkfile(path: str, payload: bytes = b"x") -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "wb") as f:
        f.write(payload)


def test_is_hidden_name_spark_rule():
    # hidden: writer debris, markers, dotfiles
    assert manifests.is_hidden_name("_temporary")
    assert manifests.is_hidden_name("_SUCCESS")
    assert manifests.is_hidden_name(".part-0.parquet.crc")
    assert manifests.is_hidden_name("._committed_123")
    # visible: partition dirs for underscore-named columns (Spark's
    # InMemoryFileIndex '='-exemption), and ordinary data names
    assert not manifests.is_hidden_name("_list=3")
    assert not manifests.is_hidden_name("_list=__HIVE_DEFAULT_PARTITION__")
    assert not manifests.is_hidden_name("part-00000.parquet")
    assert not manifests.is_hidden_name("data_b0")  # starts with 'd'
    # dot wins over '=' (Spark hides dotfiles unconditionally)
    assert manifests.is_hidden_name("._list=3")


def test_collect_parquets_sees_underscore_partition_dirs(tmp_path):
    base = str(tmp_path)
    _mkfile(os.path.join(base, "data_b0", "_list=3", "part-0.parquet"))
    _mkfile(os.path.join(base, "data_b0", "_list=3", ".part-0.parquet.crc"))
    _mkfile(os.path.join(base, "data_b0", "_SUCCESS"))
    _mkfile(os.path.join(base, "data_b0", "_temporary", "t.parquet"))
    got = sorted(
        os.path.relpath(p, base)
        for p in manifests.collect_parquets(os.path.join(base, "data_b0"))
    )
    assert got == [os.path.join("data_b0", "_list=3", "part-0.parquet")]


def test_gc_preserves_live_files_under_underscore_partitions(tmp_path):
    """The ADVICE r12 reproduction: a live, manifest-referenced file
    under ``data_b0/_list=3`` must survive a zero-grace GC even when
    the batch dir itself has aged past the window (before the fix the
    dir scanned as empty debris and was rmtree'd whole)."""
    base = str(tmp_path)
    live_rel = os.path.join("data_b0", "_list=3", "part-0.parquet")
    _mkfile(os.path.join(base, live_rel))
    manifests.write_version(base, 0, {3: [live_rel]})
    # age everything: the dir AND the file are well past any grace
    _age(os.path.join(base, "data_b0", "_list=3", "part-0.parquet"))
    _age(os.path.join(base, "data_b0", "_list=3"))
    _age(os.path.join(base, "data_b0"))

    # commit v1 carrying the file by reference; GC with grace 0
    manifests.write_version(base, 1, {3: [live_rel]})
    removed_m, removed_f = manifests.gc_superseded_versions(
        base, 1, 0, live={live_rel}, grace_seconds=0.0
    )
    assert removed_f == []
    assert os.path.isfile(os.path.join(base, live_rel)), (
        "live manifest-referenced file under an _list= partition dir "
        "was reaped as writer debris"
    )
    # the committed manifest must still read back intact
    assert manifests.read_version(base, 1) == {3: [live_rel]}


def test_gc_reaps_dead_files_under_underscore_partitions(tmp_path):
    """The same root cause's second half: a DEAD (superseded) file
    under an ``_list=`` dir was invisible to GC and leaked forever;
    with the visibility fix it is individually reaped once aged, while
    a live sibling in the same partition dir survives."""
    base = str(tmp_path)
    live_rel = os.path.join("data_b0", "_list=3", "part-0.parquet")
    dead_rel = os.path.join("data_b0", "_list=3", "part-1.parquet")
    _mkfile(os.path.join(base, live_rel))
    _mkfile(os.path.join(base, dead_rel))
    manifests.write_version(base, 0, {3: [live_rel, dead_rel]})
    manifests.write_version(base, 1, {3: [live_rel]})
    manifests.write_version(base, 2, {3: [live_rel]})
    _age(os.path.join(base, live_rel))
    _age(os.path.join(base, dead_rel))
    # batch 2's GC: v1 is the pre-state (kept), v0 is superseded
    removed_m, removed_f = manifests.gc_superseded_versions(
        base, 2, 1, live={live_rel}, grace_seconds=0.0
    )
    assert removed_m == [0]
    assert removed_f == [dead_rel]
    assert os.path.isfile(os.path.join(base, live_rel))
    assert not os.path.exists(os.path.join(base, dead_rel))


def test_gc_reaps_fully_dead_partitioned_batch_dir(tmp_path):
    """A batch dir whose every (partition-nested) file is dead is
    removed whole, _SUCCESS markers included, once everything aged."""
    base = str(tmp_path)
    dead_rel = os.path.join("data_b0", "_list=7", "part-0.parquet")
    _mkfile(os.path.join(base, dead_rel))
    _mkfile(os.path.join(base, "data_b0", "_SUCCESS"))
    manifests.write_version(base, 0, {7: [dead_rel]})
    manifests.write_version(base, 1, {})
    _age(os.path.join(base, dead_rel))
    removed_m, removed_f = manifests.gc_superseded_versions(
        base, 1, 0, live=set(), grace_seconds=0.0
    )
    assert removed_f == [dead_rel]
    assert not os.path.exists(os.path.join(base, "data_b0"))


def test_gc_empty_batch_dir_still_reaped_as_debris(tmp_path):
    """A genuinely-empty batch dir (crashed writer before any file) is
    still treated as debris under its own mtime grace — the '='
    exemption must not break the r11 empty-dir branch."""
    base = str(tmp_path)
    os.makedirs(os.path.join(base, "data_b0", "_temporary"))
    manifests.write_version(base, 0, {})
    manifests.write_version(base, 1, {})
    _age(os.path.join(base, "data_b0"))
    manifests.gc_superseded_versions(base, 1, 0, live=set(), grace_seconds=0.0)
    assert not os.path.exists(os.path.join(base, "data_b0"))
