"""Graphite plaintext wire-format codec (reference daemon.py:16-30).

On the wire a datapoint is one line, ``"<path> <value> <timestamp>\\n"`` —
note the wire order differs from the engine's tuple order
``(path, timestamp, value)`` (SURVEY.md §1.4).

Two codecs, same semantics:

- :func:`parse_line` — pure Python, used by the ingest daemon at the socket
  boundary (tiny batches, no Spark involvement);
- :func:`parse_lines_df` — the distributed path: whole-stage-codegen
  ``split`` + ``cast``, no Python UDFs, for parsing spooled line files or a
  streaming text source at any scale.

Malformed-input semantics: the reference raises on the first bad line,
which drops the *entire datagram* it arrived in (daemon.py:42-46).  The
DataFrame codec instead drops exactly the malformed lines (wrong field
count, or non-numeric value/timestamp) — strictly-better recovery, same
outcome for well-formed input; the daemon keeps per-datagram parity by
calling :func:`parse_line` eagerly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from smalltsdb_spark.schemas import INCOMING_COLUMNS

Datapoint = tuple[str, float, float]


def parse_line(line: str) -> Datapoint:
    """``"path value ts"`` → ``(path, ts, value)``; ValueError on any
    deviation (field count, non-numeric) — reference daemon.py:16-25."""
    fields = line.split()
    if len(fields) != 3:
        raise ValueError(f"invalid line: {line!r}")
    path, value, timestamp = fields
    return path, float(timestamp), float(value)


def format_line(path: str, timestamp: float, value: float) -> str:
    """Datapoint → wire line (inverse of :func:`parse_line`).

    ``repr`` emits the shortest digit string that round-trips the double
    exactly — ``%g``-style formatting truncates to 6 significant digits,
    which silently corrupts epoch timestamps (1704067200.25 → 1.70407e+09).
    """
    return f"{path} {float(value)!r} {float(timestamp)!r}"


def parse_lines_df(lines: DataFrame, column: str = "value") -> DataFrame:
    """Parse a DataFrame of wire lines into the incoming relation.

    Built-ins only (``split`` on whitespace runs + ``try_cast``), so the
    whole parse sits inside one WholeStageCodegen span; a cast failure
    yields NULL (ANSI-safe) and the row is dropped, mirroring the
    reference's reject-malformed behavior per-line.
    """
    f = F.split(F.trim(F.col(column)), r"\s+")
    return (
        lines.select(
            f.getItem(0).alias("path"),
            f.getItem(2).try_cast("double").alias("timestamp"),
            f.getItem(1).try_cast("double").alias("value"),
            F.size(f).alias("_nf"),
        )
        .filter(
            (F.col("_nf") == 3)
            & F.col("timestamp").isNotNull()
            & F.col("value").isNotNull()
            & (F.length("path") > 0)
        )
        .select(*INCOMING_COLUMNS)
    )


def format_lines_df(incoming: DataFrame, column: str = "value") -> DataFrame:
    """Incoming relation → single-column DataFrame of wire lines
    (serialization side, used by the round-trip tests and spool writer)."""
    return incoming.select(
        F.format_string(
            "%s %s %s",
            F.col("path"),
            F.col("value").cast("string"),
            F.col("timestamp").cast("string"),
        ).alias(column)
    )
