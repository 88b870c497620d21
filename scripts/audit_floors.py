#!/usr/bin/env python
"""Audit BENCH_FLOORS.json against committed clean-session evidence.

History of the problem: floors seeded from raw runs of every committed
BENCH_DETAIL revision captured warm-cache/partial fragments no official
number could reproduce (VERDICT r11 item 1 — text_bpe_train's 0.276 s
floor vs a 1.4-1.8 s official history made floor_ratio read 35.8x
catastrophe where ~5x host noise was the truth).  bench.py has advanced
floors from OFFICIAL values only since r12, but legacy floors remain,
and VERDICT r13 item 3 named the residue: a floor no CLEAN session can
come within 2x of (rel_props_json: floor 0.225 s vs 0.652 s r12-clean /
1.31 s best-of-day) has stopped being a useful noise denominator.

Evidence model (all officials, never retry minima):

- **clean-session records**: every committed BENCH_DETAIL.json revision
  at sf=0.1 whose own median floor ratio (its officials over the
  CURRENT floors) is <= --clean-threshold (default 1.5).  Per-entry
  values a record itself annotated noisy (``environment`` list /
  ``noise_class`` keys) are excluded as evidence.
- **current session**: BENCH_DETAIL.json in the working tree, same
  exclusions.

Rules, per floor entry:

- **RAISE (r13 rule)**: floor < clean_min / 2, where clean_min is the
  best official any clean session ever posted -> re-base to clean_min.
  A floor the cleanest sessions on record cannot approach within 2x is
  a measurement artifact, not an achievable number.
- **raise (r11 rule, kept)**: floor < official_min / 3 with a clean
  current-session official -> re-base to the official minimum.
- Floors within those envelopes stand: a floor is allowed to be an
  unusually good-but-real run.

Evidence class per repaired floor (VERDICT r13 item 6): committed
records since r12 carry per-entry ``io`` fingerprints (bytes/records
written, shuffle bytes) and — since r13 — ``io_pre_retry`` (the
DISTORTED run's fingerprint for entries the end-of-suite retry
replaced).  When the evidence entry's io fingerprint matches the
current record's (identical output_bytes/output_records), the repair is
``io-verified``: the timed work was byte-identical, so the time delta
is pure host noise, not a workload change.  Otherwise ``time-only``.

Prints every decision; pass --apply to write the ledger.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CLEAN_THRESHOLD = 1.5


def _load_record(blob: str) -> dict | None:
    try:
        d = json.loads(blob)
    except ValueError:
        return None
    if d.get("sf") != 0.1 or not d.get("queries"):
        return None
    return d


def committed_records() -> list[tuple[str, dict]]:
    """Every committed BENCH_DETAIL.json revision (newest first)."""
    out = []
    try:
        revs = subprocess.run(
            ["git", "log", "--format=%H", "--", "BENCH_DETAIL.json"],
            capture_output=True, text=True, cwd=HERE, check=True,
        ).stdout.split()
    except (OSError, subprocess.CalledProcessError):
        return out
    for h in revs:
        blob = subprocess.run(
            ["git", "show", f"{h}:BENCH_DETAIL.json"],
            capture_output=True, text=True, cwd=HERE,
        ).stdout
        d = _load_record(blob)
        if d is not None:
            out.append((h[:9], d))
    return out


def noisy_entries(record: dict) -> set[str]:
    return set(record.get("environment") or []) | set(
        record.get("noise_class") or {}
    )


def record_median_ratio(record: dict, floors: dict[str, float]) -> float | None:
    ratios = [
        float(v) / floors[k]
        for k, v in record.get("queries", {}).items()
        if k in floors and floors[k] > 0
    ]
    return statistics.median(ratios) if ratios else None


def io_fingerprint(record: dict, name: str) -> tuple | None:
    """(output_bytes, output_records) for an entry — the workload
    identity check.  Prefers the entry's official ``io``; falls back to
    ``io_pre_retry`` (the distorted run's fingerprint — identical bytes
    there proves even the noisy run did the same work)."""
    for key in ("io", "io_pre_retry"):
        e = (record.get(key) or {}).get(name)
        if e:
            return (
                e.get("output_bytes"),
                e.get("output_records"),
                e.get("shuffle_write_bytes"),
            )
    return None


def main() -> None:
    apply = "--apply" in sys.argv
    floors_path = os.path.join(HERE, "BENCH_FLOORS.json")
    with open(floors_path) as f:
        all_floors = json.load(f)
    floors = {k: float(v) for k, v in all_floors.get("0.1", {}).items()}

    cur = {}
    cur_record: dict = {}
    try:
        with open(os.path.join(HERE, "BENCH_DETAIL.json")) as f:
            cur_record = _load_record(f.read()) or {}
    except OSError:
        pass
    cur = cur_record.get("queries", {})
    cur_noisy = noisy_entries(cur_record)
    cur_median = record_median_ratio(cur_record, floors)
    cur_session_clean = cur_median is not None and cur_median <= CLEAN_THRESHOLD
    session_tag = (
        "clean"
        if cur_session_clean
        else "NOISY — r11 rule disabled: its officials are "
        "session-inflated and would overstate floors"
    )
    print(f"current session median ratio: {cur_median} ({session_tag})")

    # clean-session evidence: committed records whose own medians pass
    clean: list[tuple[str, dict]] = []
    for h, rec in committed_records():
        med = record_median_ratio(rec, floors)
        if med is not None and med <= CLEAN_THRESHOLD:
            clean.append((h, rec))
    print(
        f"clean-session records (median <= {CLEAN_THRESHOLD}x current "
        f"floors): {[h for h, _ in clean] or 'NONE'}"
    )

    # per-entry clean minimum with provenance
    clean_min: dict[str, tuple[float, str]] = {}
    for h, rec in clean:
        bad = noisy_entries(rec)
        for k, v in rec.get("queries", {}).items():
            if k in bad:
                continue
            v = float(v)
            if k not in clean_min or v < clean_min[k][0]:
                clean_min[k] = (v, h)

    # all-official history (round records list only slowest entries —
    # biased high, usable as bound, never alone)
    import glob

    hist: dict[str, list[float]] = {}
    for p in sorted(glob.glob(os.path.join(HERE, "BENCH_r*.json"))):
        try:
            with open(p) as f:
                d = json.load(f)
        except (OSError, ValueError):
            continue
        qs = d.get("queries") or (d.get("parsed") or {}).get("queries") or {}
        for k, v in qs.items():
            hist.setdefault(k, []).append(float(v))

    changed: dict[str, float] = {}
    notes: dict[str, str] = {}
    for name, fl in sorted(floors.items()):
        cm = clean_min.get(name)
        if cm is not None and fl < cm[0] / 2:
            best, src = cm
            fp_src = None
            for h, rec in clean:
                if h == src:
                    fp_src = io_fingerprint(rec, name)
            fp_cur = io_fingerprint(cur_record, name)
            io_note = (
                "io-verified"
                if fp_src is not None and fp_src == fp_cur
                else "time-only"
            )
            print(
                f"RAISE  {name}: floor {fl} -> {best} (clean-session "
                f"min, record {src}, {io_note}; no clean session came "
                f"within 2x of the old floor)"
            )
            changed[name] = round(best, 3)
            notes[name] = f"{src}:{io_note}"
            continue
        candidates = list(hist.get(name, []))
        clean_now = cur_session_clean and name in cur and name not in cur_noisy
        if clean_now:
            candidates.append(float(cur[name]))
        # the r11 rule is blunter than the clean-session rule (round
        # records list only each round's slowest entries — biased
        # high, and a single entry can run hot inside an overall-clean
        # session without earning a noise flag), so it only applies
        # when NO clean-session evidence exists for the entry at all;
        # a clean official within 2x of the floor VALIDATES the floor
        if candidates and cm is None:
            best = min(candidates)
            if fl < best / 3 and clean_now:
                print(
                    f"RAISE  {name}: floor {fl} -> {best} "
                    f"(r11 rule: clean official {cur[name]}, "
                    f"history min {best})"
                )
                changed[name] = round(best, 3)
                notes[name] = "r11-rule"
                continue
        ev = f"clean min {cm[0]} ({cm[1]})" if cm else "no clean evidence"
        print(f"keep   {name}: floor {fl} vs {ev}")

    if apply and changed:
        floors.update(changed)
        all_floors["0.1"] = dict(sorted(floors.items()))
        audit = all_floors.setdefault("_audit", {})
        for k, v in changed.items():
            audit[k] = f"rebased {v} [{notes[k]}]"
        with open(floors_path, "w") as f:
            json.dump(dict(sorted(all_floors.items())), f, indent=1)
        print(f"\napplied {len(changed)} floor re-bases to {floors_path}")
    elif changed:
        print(f"\n{len(changed)} re-bases pending (run with --apply)")
    else:
        print("\nno changes needed")


if __name__ == "__main__":
    main()
