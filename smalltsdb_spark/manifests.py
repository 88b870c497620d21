"""Shared versioned-manifest commit/GC primitives (VERDICT r11 item 4).

Two subsystems publish live-file maps with the same discipline — the
single-manifest period tables (``storage.py``: one ``_manifest.json``
per table, swapped per mutation) and the batch-versioned streaming span
index (``streaming/span_dedup.py``: one ``manifest_v{b}.json`` per
micro-batch) — and before r12 each carried its own copy of the commit
point, the retirement stamp, and the grace sweep (~150 LoC of drift
risk).  The shared invariants live here:

- **atomic publish**: a manifest is a single JSON document written
  tmp + fsync + ``os.replace`` — presence IS commit; a crash mid-write
  leaves no manifest and the version was never committed.
- **retirement stamp**: when a commit retires data files (they left the
  live set), their mtime is re-touched so grace windows measure
  RETIREMENT age, not write age (ADVICE r9 — a file already older than
  the grace when retired would otherwise be reaped immediately).
- **grace sweep**: unreferenced files are physically removed only once
  their (retirement-stamped) mtime exceeds the grace window — an
  in-flight reader that resolved the previous manifest can finish its
  scan.  Crashed-writer debris was never stamped, so its mtime is its
  write time — the right bound for files no reader ever resolved.

The policy layers (which versions are live, what a partition key means,
when compaction folds files) stay with the callers; this module owns
only the mechanics both must agree on.
"""

from __future__ import annotations

import json
import os
import uuid


def atomic_publish_json(target: str, payload: dict) -> None:
    """Write ``payload`` as JSON at ``target`` via tmp + fsync +
    ``os.replace`` — THE commit point of a manifest mutation.  The tmp
    name is unique per writer (pid alone collides across threads)."""
    tmp = f"{target}.tmp-{os.getpid()}-{uuid.uuid4().hex[:8]}"
    with open(tmp, "w") as f:
        json.dump(payload, f, indent=0)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, target)


def files_payload(files: dict[int, list[str]]) -> dict:
    """The canonical live-file-map document: ``{version: 1, files:
    {str(key): sorted(relative paths)}}``, empty entries dropped."""
    return {
        "version": 1,
        "files": {str(k): sorted(v) for k, v in sorted(files.items()) if v},
    }


def parse_files_payload(data: dict) -> dict[int, list[str]]:
    return {int(k): sorted(v) for k, v in data["files"].items()}


def touch_retired(base: str, rel_files) -> None:
    """Stamp just-retired data files with the retirement time (utime →
    now) so a grace sweep measures retirement age, not write age.
    Called AFTER the commit that retired them; a missing file races
    nobody (already swept, or never installed)."""
    for rel in rel_files:
        try:
            os.utime(os.path.join(base, rel), None)
        except OSError:
            pass


def is_hidden_name(name: str) -> bool:
    """Spark's file-index visibility rule (InMemoryFileIndex): a name
    is hidden when it starts with ``.``, or starts with ``_`` WITHOUT
    containing ``=`` — ``_temporary``/``_SUCCESS`` are hidden, but a
    partition directory for an underscore-named column (``_list=3``,
    the semantic index's cluster partitioning) is DATA.  ADVICE r12
    (high): pruning all ``_``-prefixed dirs made every live ``_list=*``
    partition scan as empty writer debris, so GC rmtree'd
    manifest-referenced index files once the dir aged past grace."""
    return name.startswith(".") or (name.startswith("_") and "=" not in name)


def collect_parquets(root_dir: str) -> list[str]:
    """Every committed data file under ``root_dir`` (full paths),
    skipping in-flight/hidden entries (``_temporary``, dotfiles) — the
    same visibility rule as Spark's file index (see
    :func:`is_hidden_name` for the ``=``-exemption that keeps
    underscore-column partition dirs visible)."""
    out: list[str] = []
    for root, dirs, fs in os.walk(root_dir):
        dirs[:] = [d for d in dirs if not is_hidden_name(d)]
        out.extend(
            os.path.join(root, f)
            for f in fs
            if f.endswith(".parquet") and not is_hidden_name(f)
        )
    return out


def reap_if_aged(full_path: str, keep_after: float) -> bool:
    """Remove one dead file iff its (retirement-stamped) mtime is at or
    past the grace cutoff; True when removed.  OSErrors are benign —
    a vanished file was already swept by an earlier pass."""
    try:
        if os.path.getmtime(full_path) <= keep_after:
            os.remove(full_path)
            return True
    except OSError:
        pass
    return False


# ---------------------------------------------------------------------------
# Batch-versioned manifests (the streaming-index protocol)
# ---------------------------------------------------------------------------
#
# The single-manifest tables above have ONE live-file map swapped per
# mutation; streaming indexes (span_dedup's shingle counts, semantic
# dedup's assigned-vector lists) version theirs BY BATCH ID instead:
# processing batch ``b`` resolves the newest committed
# ``manifest_v{n}.json`` with ``n < b`` (a replay of ``b`` ignores its
# own half-committed version) and commits ``manifest_v{b}.json``.
# foreachBatch delivers batch b only after b-1's checkpoint committed,
# so at most the pre-state and the new version are ever live — GC reaps
# everything older plus data files referenced by no live manifest, under
# the same retirement-stamp grace window as the single-manifest GC.

import re as _re

VERSION_RE = _re.compile(r"^manifest_v(\d+)\.json$")


def latest_version(base: str, before: int | None = None) -> int | None:
    """Newest committed version, optionally restricted to versions
    strictly below ``before`` (the replay rule).  None when no committed
    version qualifies — a version counts once its manifest JSON exists
    (published by atomic rename, so presence is commit)."""
    if not os.path.isdir(base):
        return None
    best = None
    for name in os.listdir(base):
        m = VERSION_RE.match(name)
        if not m:
            continue
        v = int(m.group(1))
        if before is not None and v >= before:
            continue
        if best is None or v > best:
            best = v
    return best


def version_path(base: str, version: int) -> str:
    return os.path.join(base, f"manifest_v{version}.json")


def read_version(base: str, version: int) -> dict[int, list[str]]:
    """The committed ``{partition: [relative parquet paths]}`` map of
    one version."""
    with open(version_path(base, version)) as f:
        return parse_files_payload(json.load(f))


def write_version(base: str, version: int, files: dict[int, list[str]]) -> None:
    """Atomically publish one version's live-file map — THE commit
    point of the batch's index mutation."""
    os.makedirs(base, exist_ok=True)
    atomic_publish_json(version_path(base, version), files_payload(files))


def resolve_version(
    base: str, before: int | None = None
) -> tuple[int | None, dict[int, list[str]]]:
    """(version, files map) of the newest committed manifest (< before),
    or (None, {}) for a fresh store."""
    v = latest_version(base, before)
    if v is None:
        return None, {}
    return v, read_version(base, v)


def gc_superseded_versions(
    base: str,
    committed_version: int,
    pre_version: int | None,
    live: set[str],
    grace_seconds: float,
    data_prefix: str = "data_b",
) -> tuple[list[int], list[str]]:
    """Bound version count and disk after the ``v{committed_version}``
    commit: delete manifests older than the pre-state version (the
    replay rule never resolves them again), retirement-stamp their
    newly-unreferenced data files, and remove unreferenced files whose
    retirement age exceeds the grace window.  A ``data_prefix`` dir
    holding ZERO parquet files (partial writer debris) is reaped only
    once the DIR's own mtime passes the grace window (ADVICE r11: the
    all-dead branch is vacuously true on an empty list).  Returns
    (removed manifest versions, removed relative file paths)."""
    import shutil
    import time

    removed_manifests: list[int] = []
    retired: set[str] = set()
    for name in list(os.listdir(base)):
        m = VERSION_RE.match(name)
        if not m:
            continue
        v = int(m.group(1))
        if v == committed_version or (pre_version is not None and v == pre_version):
            continue
        if v > committed_version:
            continue  # a future writer's version is never ours to GC
        try:
            for fs in read_version(base, v).values():
                retired.update(f for f in fs if f not in live)
        except OSError:
            pass
        os.remove(os.path.join(base, name))
        removed_manifests.append(v)
    touch_retired(base, retired)
    removed_files: list[str] = []
    keep_after = time.time() - grace_seconds
    for name in list(os.listdir(base)):
        root_dir = os.path.join(base, name)
        if not name.startswith(data_prefix) or not os.path.isdir(root_dir):
            continue
        parquets = collect_parquets(root_dir)
        rels = {p: os.path.relpath(p, base) for p in parquets}
        dead = [p for p in parquets if rels[p] not in live]
        try:
            if not parquets:
                if os.path.getmtime(root_dir) <= keep_after:
                    shutil.rmtree(root_dir, ignore_errors=True)
                continue
            if len(dead) == len(parquets) and all(
                os.path.getmtime(p) <= keep_after for p in parquets
            ):
                # nothing live left under this batch dir: remove the
                # whole tree, writer markers (_SUCCESS) included
                shutil.rmtree(root_dir, ignore_errors=True)
                removed_files.extend(rels[p] for p in dead)
                continue
        except OSError:
            pass
        for p in dead:
            if reap_if_aged(p, keep_after):
                removed_files.append(rels[p])
    return removed_manifests, removed_files


def decommission_manifest_index(base: str) -> dict[int, list[str]] | None:
    """One-way retirement of a batch-versioned streaming index: flatten
    the newest committed manifest into a PLAIN partitioned-parquet
    directory and remove the manifest protocol (VERDICT r13 item 7 —
    the streaming-index symmetry of ``storage.decommission_streaming_
    sink``; before this, a retired span/semantic stream's index stayed
    manifest-managed forever with no batch-ownership path).

    Mechanics: every live file moves up out of its ``data_b*`` attempt
    directory into ``<partition-dir>/<name>`` directly under ``base``
    (the attempt level exists only for the at-least-once replay rule,
    which dies with the stream; without flattening, a plain recursive
    read trips over the non-``k=v`` ``data_b*`` level).  Everything the
    newest manifest does not reference — superseded versions' files,
    crashed-attempt debris — is deleted: unlike the sink-log handover
    there is nothing recoverable here, the protocol's own GC was always
    going to reap it.  Every ``manifest_v*.json`` is then removed; the
    directory is afterwards an ordinary partitioned parquet table
    (``spark.read.parquet(base)`` with partition inference), legal for
    batch mutation, and the manifest-misuse guards that refuse
    manifest-managed directories no longer trigger on it.

    Only safe once the streaming query is stopped FOREVER — a resumed
    stream would resolve no manifest and rebuild from empty, orphaning
    this data.  Returns the final ``{partition: [relative paths]}`` map,
    or None when no committed manifest exists (nothing to retire).

    Crash-resumable: a process killed mid-flatten leaves the manifest
    in place (it is removed LAST) with some files already moved to
    their flattened destinations — a retry treats a missing source
    whose flattened destination exists as already-moved and continues;
    only a rel with NEITHER location present is real corruption and
    refuses."""
    import shutil

    def _flat_rel(rel: str) -> str:
        pieces = rel.split(os.sep)
        # rel is data_b*/…/<pdir>/<name>; keep the partition dir
        # (the k=v component) and the unique part-file name
        pdir = next((p for p in pieces[:-1] if "=" in p), None)
        return os.path.join(pdir, pieces[-1]) if pdir else pieces[-1]

    v = latest_version(base)
    if v is None:
        return None
    files = read_version(base, v)
    # validate BEFORE the first move (failing mid-flatten on a missing
    # file would otherwise manufacture corruption); an interrupted
    # earlier flatten is fine — its moved files sit at _flat_rel
    for rels in files.values():
        for rel in rels:
            if not os.path.isfile(os.path.join(base, rel)) and not (
                os.path.isfile(os.path.join(base, _flat_rel(rel)))
            ):
                raise ValueError(
                    f"index at {base!r} is corrupt: manifest v{v} "
                    f"references missing file {rel!r} (not at its "
                    "flattened destination either); refusing to "
                    "decommission"
                )
    final: dict[int, list[str]] = {}
    for part, rels in sorted(files.items()):
        out = []
        for rel in rels:
            src = os.path.join(base, rel)
            new_rel = _flat_rel(rel)
            dest = os.path.join(base, new_rel)
            if not os.path.isfile(src):
                # interrupted earlier run already moved it (validated
                # above); nothing left to do for this rel
                out.append(new_rel)
                continue
            stem, ext = os.path.splitext(os.path.basename(new_rel))
            head = os.path.dirname(new_rel)
            n = 0
            while os.path.exists(dest):  # name collision across attempts
                new_rel = os.path.join(head, f"{stem}-d{n}{ext}")
                dest = os.path.join(base, new_rel)
                n += 1
            os.makedirs(os.path.dirname(dest) or base, exist_ok=True)
            os.replace(src, dest)
            out.append(new_rel)
        final[part] = sorted(out)
    for name in list(os.listdir(base)):
        full = os.path.join(base, name)
        if VERSION_RE.match(name):
            os.remove(full)
        elif name.startswith("data_b") and os.path.isdir(full):
            shutil.rmtree(full)  # only dead files / writer markers left
    return final


def attempt_unique_dir(base: str, preferred: str) -> str:
    """``preferred`` when free, else an attempt-unique sibling name — an
    at-least-once replay must never overwrite a committed attempt's dir
    in place (Spark overwrite deletes it, yanking files from stale
    readers inside their grace window; ADVICE r11)."""
    if not os.path.exists(os.path.join(base, preferred)):
        return preferred
    return f"{preferred}-{uuid.uuid4().hex[:8]}"
