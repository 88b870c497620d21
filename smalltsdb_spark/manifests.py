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


def collect_parquets(root_dir: str) -> list[str]:
    """Every committed data file under ``root_dir`` (full paths),
    skipping in-flight/hidden entries (``_temporary``, dotfiles) — the
    same visibility rule as Spark's file index."""
    out: list[str] = []
    for root, dirs, fs in os.walk(root_dir):
        dirs[:] = [d for d in dirs if not d.startswith(("_", "."))]
        out.extend(
            os.path.join(root, f)
            for f in fs
            if f.endswith(".parquet") and not f.startswith(("_", "."))
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
