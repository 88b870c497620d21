"""Self-instrumentation timer (reference timer.py:16-121).

Measures named blocks with pluggable clocks and yields ``(name, start_utc,
duration)`` triples shaped exactly like datapoints, so the engine can
ingest its own timings (T6) — ``TablesTSDB.sync(emit_metrics=True)`` does.

Call surface matches the reference:

- ``timer('name')`` — time one block under the current prefix stack;
- ``timer('prefix', 'total')`` — push ``prefix`` for nested blocks and
  time the whole group as ``prefix.total``;
- the outermost block's context value is the shared timings list; inner
  blocks append before outer ones (they finish first).

Clocks are callables returning ``(clock_name, reading)`` pairs; a block's
metric names are ``<prefix...>.<name>.<clock_name>``.  Defaults: wall
time always; user/system CPU and IO counters when psutil importable
(reference timer.py:106-121) — absent in this container, gated by
try-import.
"""

from __future__ import annotations

import time
from contextlib import contextmanager

from smalltsdb_spark.utils import utcnow

try:
    import psutil
except ImportError:  # pragma: no cover - not installed here
    psutil = None

SEPARATOR = "."


def wall_clock():
    return [("time", time.perf_counter())]


def process_clock():  # pragma: no cover - psutil not installed here
    proc = psutil.Process()
    with proc.oneshot():
        cpu = proc.cpu_times()
        readings = [("user", cpu.user), ("system", cpu.system)]
        try:
            io = proc.io_counters()
        except AttributeError:
            return readings
        readings += [
            (name, getattr(io, name))
            for name in ("read_count", "write_count", "read_bytes", "write_bytes")
        ]
    return readings


def default_clocks():
    clocks = [wall_clock]
    if psutil is not None:  # pragma: no cover
        clocks.insert(0, process_clock)
    return clocks


class Timer:
    """Measure nested blocks of code using arbitrary clocks."""

    def __init__(self, clocks=None, prefix: str | None = None):
        self.clocks = list(clocks) if clocks is not None else default_clocks()
        self._prefix_stack: list[str] = [prefix] if prefix else []
        self._timings: list[tuple[str, float, float]] | None = None
        #: the finished outermost block's timings (the context value is
        #: reset on exit; this survives for after-the-fact collection,
        #: e.g. merging per-thread timers in TablesTSDB.sync)
        self.collected: list[tuple[str, float, float]] = []

    @contextmanager
    def __call__(self, name_or_prefix: str, group_name: str | None = None):
        pushed = group_name is not None
        if pushed:
            self._prefix_stack.append(name_or_prefix)
        label = SEPARATOR.join(self._prefix_stack + [group_name or name_or_prefix])

        outermost = self._timings is None
        if outermost:
            self._timings = []

        start_utc = utcnow()
        begin = {k: v for clock in self.clocks for k, v in clock()}
        try:
            yield self._timings
        finally:
            for clock in reversed(self.clocks):
                for k, end in clock():
                    self._timings.append(
                        (f"{label}{SEPARATOR}{k}", start_utc, end - begin[k])
                    )
            if pushed:
                self._prefix_stack.pop()
            if outermost:
                self.collected = self._timings
                self._timings = None
