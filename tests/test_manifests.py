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


# ---------------------------------------------------------------------------
# Property tests (VERDICT r12 item 7): randomized writer/replay/zombie
# interleavings over the batch-versioned protocol.  Pure-Python model of
# the foreachBatch handlers' manifest ops (semantic_dedup.handle's shape
# without Spark): each "file" is a JSON token list named *.parquet, so
# collect_parquets/GC see exactly the real layout (including the
# underscore partition dirs), and compaction unions token sets the way
# the real one unions immutable rows.
# ---------------------------------------------------------------------------

import json

from hypothesis import given, settings
from hypothesis import strategies as st

_COMPACT = 3


def _write_tokens(path: str, tokens: set[str]) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(sorted(tokens), f)


def _read_tokens(base: str, rels: list[str]) -> set[str]:
    out: set[str] = set()
    for rel in rels:
        with open(os.path.join(base, rel)) as f:
            out.update(json.load(f))
    return out


def _process_batch(base: str, batch_id: int, parts: list[int],
                   grace: float) -> None:
    """One handler invocation: resolve pre-state (< batch_id), append
    one delta file per touched partition under an attempt-unique
    data_b{batch_id}/_list={p}/ dir, compact partitions past the file
    bound, commit manifest_v{batch_id}, GC."""
    pre_v, pre_files = manifests.resolve_version(base, before=batch_id)
    new_files = dict(pre_files)
    data_name = manifests.attempt_unique_dir(base, f"data_b{batch_id}")
    for p in parts:
        rel = os.path.join(data_name, f"_list={p}", "part-0.parquet")
        _write_tokens(os.path.join(base, rel), {f"b{batch_id}p{p}"})
        new_files[p] = pre_files.get(p, []) + [rel]
    to_compact = [p for p in parts if len(new_files[p]) > _COMPACT]
    if to_compact:
        comp = manifests.attempt_unique_dir(base, f"data_b{batch_id}_c")
        for p in to_compact:
            rel = os.path.join(comp, f"_list={p}", "part-0.parquet")
            _write_tokens(
                os.path.join(base, rel), _read_tokens(base, new_files[p])
            )
            new_files[p] = [rel]
    manifests.write_version(base, batch_id, new_files)
    live = {
        f
        for fm in (new_files, pre_files)
        for fs in fm.values()
        for f in fs
    }
    manifests.gc_superseded_versions(base, batch_id, pre_v, live, grace)


def _assert_resolved_state(base: str, want_version: int,
                           model: dict[int, set[str]]) -> None:
    v, files = manifests.resolve_version(base)
    assert v == want_version
    for p, toks in model.items():
        rels = files.get(p, [])
        for rel in rels:
            assert os.path.isfile(os.path.join(base, rel)), (
                f"live manifest-referenced file {rel} missing"
            )
        assert _read_tokens(base, rels) == toks, f"partition {p} corpus lost"
    assert set(files) == {p for p, t in model.items() if t}


@settings(max_examples=60, deadline=None)
@given(
    steps=st.lists(
        st.tuples(
            st.booleans(),  # True = at-least-once replay of the latest batch
            st.sets(st.integers(0, 2), min_size=1, max_size=3),
        ),
        min_size=1,
        max_size=12,
    )
)
def test_property_sequential_replays_never_lose_corpus(tmp_path_factory, steps):
    """At-least-once single-stream orderings at ZERO grace: every step
    either advances to a new batch or replays the latest committed one
    (commit succeeded, checkpoint lost).  After EVERY commit+GC, the
    resolved manifest must be the newest batch, every referenced file
    must exist, and the token union per partition must equal the model
    (the union of all batches that touched it, compaction included) —
    zero grace makes every superseded file instantly sweep-eligible, so
    any over-eager GC surfaces immediately."""
    base = str(tmp_path_factory.mktemp("idx"))
    model: dict[int, set[str]] = {0: set(), 1: set(), 2: set()}
    next_batch = 0
    last_parts: list[int] | None = None
    for is_replay, parts_set in steps:
        if is_replay and last_parts is not None:
            batch_id, parts = next_batch - 1, last_parts  # same data again
        else:
            batch_id, parts = next_batch, sorted(parts_set)
            next_batch += 1
            last_parts = parts
        _process_batch(base, batch_id, parts, grace=0.0)
        for p in parts:
            model[p].add(f"b{batch_id}p{p}")
        _assert_resolved_state(base, next_batch - 1, model)


@settings(max_examples=40, deadline=None)
@given(
    n_batches=st.integers(2, 6),
    zombie_of=st.integers(0, 4),
    parts_per_batch=st.lists(
        st.sets(st.integers(0, 2), min_size=1, max_size=3),
        min_size=6,
        max_size=6,
    ),
)
def test_property_zombie_gc_never_touches_future_state(
    tmp_path_factory, n_batches, zombie_of, parts_per_batch
):
    """A ZOMBIE writer (crash-recovery leftover) re-running an OLD
    batch's commit+GC while the stream has already advanced: its GC
    must never remove the newer manifests (the future-version skip,
    manifests.py) and — inside the grace window — never remove their
    files, so the current reader's resolved state is untouched.  The
    zombie's own manifest replace is benign: nothing resolves an old
    version while a newer one exists."""
    base = str(tmp_path_factory.mktemp("idx"))
    model: dict[int, set[str]] = {0: set(), 1: set(), 2: set()}
    for b in range(n_batches):
        parts = sorted(parts_per_batch[b])
        _process_batch(base, b, parts, grace=3600.0)
        for p in parts:
            model[p].add(f"b{b}p{p}")
    latest = n_batches - 1
    _assert_resolved_state(base, latest, model)
    manifests_before = {
        n for n in os.listdir(base) if manifests.VERSION_RE.match(n)
    }
    # zombie replays an older batch end-to-end (same data)
    z = min(zombie_of, latest - 1)
    _process_batch(base, z, sorted(parts_per_batch[z]), grace=3600.0)
    # every manifest that existed before the zombie still exists (the
    # future-version skip: v > committed is never the zombie's to GC);
    # the zombie may only have ADDED its own v{z} back
    manifests_after = {
        n for n in os.listdir(base) if manifests.VERSION_RE.match(n)
    }
    assert manifests_before <= manifests_after, (
        f"zombie GC of batch {z} removed manifests "
        f"{manifests_before - manifests_after}"
    )
    _assert_resolved_state(base, latest, model)


# ---------------------------------------------------------------------------
# File-sink log protocol (storage.read_sink_log / reconcile_sink_log)
# ---------------------------------------------------------------------------
#
# The stream→batch handover (VERDICT r13 item 1) removes the sink's
# _spark_metadata log, so whatever the directory then lists IS the
# table.  The property below drives a model of Spark's sink through
# random interleavings of write-files / commit-batch / crash-pre-commit
# (plus log compaction and compaction-retention deletes) and asserts
# the post-handover directory read equals exactly the union of
# COMMITTED batches — crashed triggers' staged files are quarantined,
# never surfaced, and committed files are never swept.


def _sink_log_entry(table: str, rel: str, action: str = "add") -> str:
    return json.dumps({
        "path": "file://" + os.path.join(os.path.abspath(table), rel),
        "size": 4, "isDir": False, "modificationTime": 0,
        "blockReplication": 1, "action": action,
    })


from hypothesis import HealthCheck


@settings(
    max_examples=50,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    steps=st.lists(
        st.tuples(
            st.integers(1, 3),        # part files written this trigger
            st.sampled_from([0, 1]),  # target pday partition
            st.booleans(),            # True = batch commits, False = crash
        ),
        min_size=1,
        max_size=10,
    ),
    compact_every=st.sampled_from([2, 3, 100]),
    retention_drop=st.booleans(),
)
def test_property_sink_handover_equals_committed_union(
    tmp_path, steps, compact_every, retention_drop
):
    """Random write/commit/crash/compact interleavings of the file-sink
    protocol: after decommission, the visible directory listing equals
    the committed union (adds minus retention deletes), and everything
    else — crashed-trigger leftovers AND retention-deleted files still
    on disk — sits in the quarantine dot-dir."""
    import tempfile

    import pytest

    from smalltsdb_spark import storage

    # tmp_path is function-scoped but hypothesis re-runs the body many
    # times per test (including replaying the SAME example after a
    # shrink) — the table dir must be unique per EXECUTION, not per
    # example value, or leftover state corrupts the falsifying re-run
    table = tempfile.mkdtemp(prefix="sink_", dir=str(tmp_path))
    md = os.path.join(table, storage.STREAM_METADATA_DIR)
    os.makedirs(md)

    committed: list[str] = []   # rel paths, commit order
    dropped: set[str] = set()   # retention-deleted (still on disk)
    orphans: set[str] = set()   # crashed-trigger leftovers
    batch_id = 0
    counter = 0
    for n_files, pday, commits in steps:
        rels = []
        for _ in range(n_files):
            rel = os.path.join(
                f"pday={pday}",
                f"part-{counter:05d}-feedface.c000.snappy.parquet",
            )
            counter += 1
            _mkfile(os.path.join(table, rel), b"PAR1")
            rels.append(rel)
        if not commits:
            orphans.update(rels)  # staged; the log never learns of them
            continue
        if (batch_id + 1) % compact_every == 0:
            # compaction folds all history into one file — and with
            # sink-log retention it may DELETE-mark the oldest entry
            lines = ["v1"]
            if retention_drop and committed:
                victim = committed.pop(0)
                dropped.add(victim)
                lines.append(_sink_log_entry(table, victim, "delete"))
            committed.extend(rels)
            lines.extend(_sink_log_entry(table, r) for r in committed)
            log_name = f"{batch_id}.compact"
        else:
            committed.extend(rels)
            lines = ["v1"] + [_sink_log_entry(table, r) for r in rels]
            log_name = str(batch_id)
        with open(os.path.join(md, log_name), "w") as f:
            f.write("\n".join(lines))
        batch_id += 1

    expect_quarantined = orphans | dropped
    if expect_quarantined:
        with pytest.raises(ValueError, match="never committed"):
            storage.decommission_streaming_sink(table, on_orphans="refuse")
        assert os.path.isdir(md), "refuse must leave the log intact"
    assert storage.decommission_streaming_sink(table)  # quarantine mode
    assert not os.path.isdir(md)
    visible = {
        os.path.relpath(p, table)
        for p in manifests.collect_parquets(table)
    }
    assert visible == set(committed), (
        "post-handover listing is not the committed union"
    )
    qroot = os.path.join(table, storage.SINK_QUARANTINE_DIR)
    quarantined = (
        {os.path.relpath(p, qroot) for p in manifests.collect_parquets(qroot)}
        if os.path.isdir(qroot)
        else set()
    )
    assert quarantined == expect_quarantined


def test_decommission_manifest_index_flattens_committed_state(tmp_path):
    """VERDICT r13 item 7: the streaming-index symmetry of the sink-log
    handover.  After batches 0-4 (with compaction), decommission must
    leave a PLAIN partitioned directory — no manifests, no data_b*
    attempt level — whose per-partition token union equals the resolved
    committed state, with every superseded file gone."""
    base = str(tmp_path / "idx")
    for b in range(5):
        _process_batch(base, b, [0, 1] if b % 2 == 0 else [1, 2], grace=0.0)
    v, files = manifests.resolve_version(base)
    want = {p: _read_tokens(base, rels) for p, rels in files.items()}

    final = manifests.decommission_manifest_index(base)
    assert final is not None and set(final) == set(want)
    # protocol fully retired: no manifests, no attempt dirs
    names = os.listdir(base)
    assert not any(manifests.VERSION_RE.match(n) for n in names)
    assert not any(n.startswith("data_b") for n in names)
    # the flattened layout is <partition-dir>/<file> only, and the
    # content per partition is exactly the committed state
    for p, rels in final.items():
        for rel in rels:
            head, tail = os.path.split(rel)
            assert head == f"_list={p}" and os.sep not in head
        assert _read_tokens(base, rels) == want[p]
    # nothing else survived: every visible parquet is in the final map
    visible = {
        os.path.relpath(f, base) for f in manifests.collect_parquets(base)
    }
    assert visible == {r for rels in final.values() for r in rels}
    # idempotence face: a second call finds no manifest — nothing to do
    assert manifests.decommission_manifest_index(base) is None


def test_decommission_manifest_index_refuses_corrupt_index(tmp_path):
    """A manifest referencing a missing file is corruption — refuse
    rather than hand over a partial index."""
    import pytest

    base = str(tmp_path / "idx")
    _process_batch(base, 0, [0], grace=0.0)
    v, files = manifests.resolve_version(base)
    os.remove(os.path.join(base, files[0][0]))
    with pytest.raises(ValueError, match="missing file"):
        manifests.decommission_manifest_index(base)
    # refused: the manifest is still there (nothing half-retired)
    assert manifests.latest_version(base) == v


def test_sink_log_torn_line_refuses_unless_recoverable(tmp_path):
    """A torn (unparseable) log line means the committed set cannot be
    trusted: every mode refuses by default; allow_damaged skips the
    line but is only accepted with quarantine (recoverable) disposal."""
    import pytest

    from smalltsdb_spark import storage

    table = str(tmp_path / "t")
    md = os.path.join(table, storage.STREAM_METADATA_DIR)
    os.makedirs(md)
    committed = os.path.join("pday=0", "part-00000-aa.c000.snappy.parquet")
    maybe = os.path.join("pday=0", "part-00001-bb.c000.snappy.parquet")
    for rel in (committed, maybe):
        _mkfile(os.path.join(table, rel), b"PAR1")
    with open(os.path.join(md, "0"), "w") as f:
        f.write(
            "v1\n"
            + _sink_log_entry(table, committed)
            + "\n"
            + _sink_log_entry(table, maybe)[: 40]  # torn tail write
        )
    with pytest.raises(ValueError, match="unparseable"):
        storage.read_sink_log(table)
    with pytest.raises(ValueError, match="unparseable"):
        storage.decommission_streaming_sink(table)
    # destructive disposal with lost entries is refused outright
    with pytest.raises(ValueError, match="allow_damaged requires"):
        storage.reconcile_sink_log(
            table, on_orphans="delete", allow_damaged=True
        )
    assert os.path.isdir(md)
    # recoverable path: the torn entry's file quarantines (it MIGHT be
    # committed — that is exactly why it is not deleted)
    assert storage.decommission_streaming_sink(table, allow_damaged=True)
    assert os.path.isfile(os.path.join(table, committed))
    assert not os.path.exists(os.path.join(table, maybe))
    assert os.path.isfile(
        os.path.join(table, storage.SINK_QUARANTINE_DIR, maybe)
    )


def test_decommission_manifest_index_resumes_after_crash(tmp_path):
    """A process killed mid-flatten leaves the manifest in place with
    some files already moved; the retry must treat moved-but-validated
    files as done and complete, not refuse forever (the validation is
    for real corruption: a rel present at NEITHER location)."""
    base = str(tmp_path / "idx")
    for b in range(3):
        _process_batch(base, b, [0, 1], grace=0.0)
    v, files = manifests.resolve_version(base)
    want = {p: _read_tokens(base, rels) for p, rels in files.items()}
    # simulate the crash: the first live file was already moved to its
    # flattened destination, manifest still present
    first_rel = files[0][0]
    pieces = first_rel.split(os.sep)
    pdir = next(p for p in pieces[:-1] if "=" in p)
    os.makedirs(os.path.join(base, pdir), exist_ok=True)
    os.replace(
        os.path.join(base, first_rel),
        os.path.join(base, pdir, pieces[-1]),
    )
    final = manifests.decommission_manifest_index(base)  # resumes
    assert final is not None
    for p, rels in final.items():
        assert _read_tokens(base, rels) == want[p]
    assert not any(
        manifests.VERSION_RE.match(n) or n.startswith("data_b")
        for n in os.listdir(base)
    )
