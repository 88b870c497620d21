"""Epoch/datetime conversion helpers (reference utils.py:4-9)."""

from __future__ import annotations

import datetime
import time


def epoch_from_datetime(dt: datetime.datetime) -> float:
    """UTC epoch seconds from a (naive-UTC or aware) datetime."""
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=datetime.timezone.utc)
    return dt.timestamp()


def utcnow() -> float:
    return time.time()


def coerce_epoch(value: float | int | datetime.datetime) -> float:
    return epoch_from_datetime(value) if isinstance(value, datetime.datetime) else float(value)
