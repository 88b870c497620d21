"""The finality planning kernel.

Re-derivation of the reference's ``intervals()`` (tsdb.py:234-268): given a
period, a finality tail, the current time, and the last finalized bucket for
a path, compute the half-open ``[start, end)`` pair of

- the *final* interval: buckets that became final (their end is at least
  ``tail`` seconds in the past) and have not been synced yet, and
- the *partial* interval: buckets that exist but are not final yet.

Semantics pinned by the reference's 16 golden cases
(tests/test_smalltsdb.py:85-118, reproduced in FIXTURES.md §4):

- ``final.start = last_final + period`` (``last_final=None`` ⇒ ``-period``,
  so start is 0 — pre-1970 data is deliberately out of scope, as in the
  reference).
- ``final.end = floor((now - tail) / period) * period``, clamped to
  ``>= final.start``.
- ``partial = [final.end, floor(now / period) * period + period)``.

Buckets are labeled by their start; ``floor`` (not truncation) is used so
the arithmetic is well-defined for all inputs — documented divergence from
SQLite's ``cast as integer`` (truncation toward zero) for negative
timestamps, which the reference's tests never exercise (SURVEY.md §2.3 A1).
"""

from __future__ import annotations

import math

Number = float | int

Interval = tuple[Number, Number]


def bucket_start(ts: Number, seconds: int) -> Number:
    """Start of the tumbling bucket containing ``ts`` (floor semantics)."""
    return math.floor(ts / seconds) * seconds


def intervals(
    seconds: int,
    tail: Number,
    now: Number,
    last_final: Number | None = None,
) -> tuple[Interval, Interval]:
    """Return ``(final, partial)`` half-open interval pair for one period."""
    if last_final is None:
        last_final = -seconds
    final_start = last_final + seconds
    final_end = bucket_start(now - tail, seconds)
    if final_end < final_start:
        final_end = final_start
    partial_end = bucket_start(now, seconds) + seconds
    return (final_start, final_end), (final_end, partial_end)


def final_end(seconds: int, tail: Number, now: Number) -> Number:
    """Global (path-independent) end of the final interval."""
    return bucket_start(now - tail, seconds)
