"""Engine configuration constants.

Mirrors the reference's fixed aggregation periods and stat list
(reference tsdb.py:58-67), kept as plain data so they stay configurable
(the reference accepts a ``periods=`` kwarg, tsdb.py:71-83).
"""

from __future__ import annotations

# (name, seconds) — fixed aggregation periods (reference tsdb.py:58-65).
PERIODS: list[tuple[str, int]] = [
    ("onesecond", 1),
    ("tensecond", 10),
    ("oneminute", 60),
    ("fiveminute", 300),
    ("onehour", 3600),
    ("oneday", 86400),
]

PERIOD_SECONDS: dict[str, int] = dict(PERIODS)

# Stats computed per (path, bucket) (reference tsdb.py:67).
STATS: tuple[str, ...] = ("n", "min", "max", "avg", "sum", "p50", "p90", "p99")

# Quantiles behind p50/p90/p99 (reference tsdb.py:196-198).
QUANTILES: tuple[float, ...] = (0.5, 0.9, 0.99)

# Finality horizon in seconds: buckets whose end is <= now - tail are final
# (reference tsdb.py:303, `_tail = 60`).
DEFAULT_TAIL: int = 60


def validate_period(period: str, periods: dict[str, int] | None = None) -> int:
    """Return the period's seconds or raise ValueError.

    The reference asserts (tsdb.py:120) and TODOs a ValueError
    (tsdb.py:119); we do what the TODO says.
    """
    table = PERIOD_SECONDS if periods is None else periods
    if period not in table:
        raise ValueError(f"unknown period {period!r}; expected one of {sorted(table)}")
    return table[period]


def validate_stat(stat: str) -> str:
    """Return the stat name or raise ValueError (reference tsdb.py:121)."""
    if stat not in STATS:
        raise ValueError(f"unknown stat {stat!r}; expected one of {STATS}")
    return stat
