#!/usr/bin/env python
"""Audit BENCH_FLOORS.json against the official record (VERDICT r11
item 1: floors seeded from raw runs of every committed BENCH_DETAIL
revision captured warm-cache/partial fragments no official number could
reproduce — text_bpe_train's 0.276 s floor vs a 1.4-1.8 s official
history made floor_ratio read 35.8x catastrophe where ~5x host noise
was the truth; bench.py now advances floors from OFFICIAL values only).

This script repairs the ledger's LEGACY entries: a floor is implausible
when the cleanest official evidence available cannot come near it.
Evidence, per entry at sf0.1:

- the CURRENT session's BENCH_DETAIL.json official (run this after a
  clean, solo full-suite bench — entries noise-annotated in that
  session are excluded as evidence);
- every official value in the committed BENCH_r*.json records (these
  only contain each round's SLOWEST entries, so they are biased high —
  usable as an upper-bound sanity check, never alone).

Rule: if floor < official_min / 3 AND the current session's official is
clean (not in its own "environment" list), the floor is re-seeded to
min(official candidates) — a number a healthy session actually posted.
Floors within 3x of clean evidence stand (a floor is allowed to be an
unusually good-but-real run).  Prints every decision; pass --apply to
write."""

from __future__ import annotations

import glob
import json
import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    apply = "--apply" in sys.argv
    floors_path = os.path.join(HERE, "BENCH_FLOORS.json")
    with open(floors_path) as f:
        all_floors = json.load(f)
    floors = {k: float(v) for k, v in all_floors.get("0.1", {}).items()}

    detail = {}
    try:
        with open(os.path.join(HERE, "BENCH_DETAIL.json")) as f:
            detail = json.load(f)
    except OSError:
        pass
    cur = detail.get("queries", {}) if detail.get("sf") == 0.1 else {}
    noisy = set(detail.get("environment", []))

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

    changed = {}
    for name, fl in sorted(floors.items()):
        candidates = list(hist.get(name, []))
        clean_now = name in cur and name not in noisy
        if clean_now:
            candidates.append(float(cur[name]))
        if not candidates:
            print(f"keep   {name}: floor {fl} (no official evidence)")
            continue
        best = min(candidates)
        if fl < best / 3 and clean_now:
            print(
                f"RAISE  {name}: floor {fl} -> {best} "
                f"(clean official {cur[name]}, history min {best})"
            )
            changed[name] = round(best, 3)
        else:
            tag = "clean" if clean_now else "no clean evidence this session"
            print(f"keep   {name}: floor {fl} vs official min {best} ({tag})")

    if apply and changed:
        floors.update(changed)
        all_floors["0.1"] = dict(sorted(floors.items()))
        with open(floors_path, "w") as f:
            json.dump(dict(sorted(all_floors.items())), f, indent=1)
        print(f"\napplied {len(changed)} floor re-seeds to {floors_path}")
    elif changed:
        print(f"\n{len(changed)} re-seeds pending (run with --apply)")
    else:
        print("\nno changes needed")


if __name__ == "__main__":
    main()
