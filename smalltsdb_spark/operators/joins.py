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


# ---------------------------------------------------------------------------
# Bloom-filter semi join
# ---------------------------------------------------------------------------

#: hard cap on the Bloom bitmap (bits): 2^27 bits = 16 MiB broadcast —
#: large enough for ~10 M keys at 1% fpp, small enough that the driver OR
#: and the executor broadcast stay trivial.  Beyond this, fpp degrades
#: gracefully (the filter stays CORRECT — the exact join removes the extra
#: false positives; only the prefilter's selectivity suffers).
BLOOM_MAX_BITS = 1 << 27


def _bloom_params(expected_items: int, fpp: float) -> tuple[int, int]:
    """Optimal (m_bits, k_hashes) for a Bloom filter: m = -n ln p / ln2²,
    k = (m/n) ln2 — capped at BLOOM_MAX_BITS and byte-aligned."""
    import math

    n = max(1, int(expected_items))
    m = int(-n * math.log(fpp) / (math.log(2) ** 2))
    m = min(max(m, 64), BLOOM_MAX_BITS)
    m = (m + 7) // 8 * 8
    k = max(1, min(16, round(m / n * math.log(2))))
    return m, k


def _hash_pair(col):
    """Two independent 64-bit hashes of a column, computed JVM-side
    (xxhash64 — whole-stage-codegen, no Python in the scan), combined by
    double hashing ``(h1 + i*h2) mod m`` on the Python side.  Both the
    build and the probe use this same pair, so membership is consistent
    by construction."""
    return F.xxhash64(col), F.xxhash64(col, F.lit(1))


def build_bloom(
    keys: DataFrame, key_col: str, expected_items: int | None = None,
    fpp: float = 0.01,
) -> tuple[bytes, int, int]:
    """Build a Bloom filter over ``keys[key_col]`` distributedly.

    Each partition materializes its own m-bit bitmap from JVM-computed
    hash pairs (numpy-vectorized bit setting inside one Arrow batch
    loop), and the driver ORs the per-partition bitmaps — driver traffic
    is ``n_partitions × m/8`` bytes, independent of key count.  No
    shuffle, no distinct: duplicate keys set the same bits.

    ``expected_items=None`` sizes the filter with a ``keys.count()`` —
    one extra scan of an uncached input; pass the hint when the caller
    already knows the cardinality (same contract as the blocked GEMM's
    ``n_blocks`` hint, operators/similarity.py).

    Returns ``(bitmap_bytes, m_bits, k_hashes)``.
    """
    import numpy as np

    if expected_items is None:
        expected_items = keys.count()
    m, k = _bloom_params(expected_items, fpp)
    h1, h2 = _hash_pair(F.col(key_col))
    hashed = keys.select(h1.alias("_h1"), h2.alias("_h2"))

    mbytes = m // 8

    def build(batches):
        bm = np.zeros(mbytes, dtype=np.uint8)
        import pandas as pd

        for pdf in batches:
            a = pdf["_h1"].to_numpy().astype(np.uint64)
            b = pdf["_h2"].to_numpy().astype(np.uint64)
            for i in range(k):
                idx = (a + np.uint64(i) * b) % np.uint64(m)
                np.bitwise_or.at(
                    bm, (idx >> np.uint64(3)).astype(np.int64),
                    (np.uint64(1) << (idx & np.uint64(7))).astype(np.uint8),
                )
        yield pd.DataFrame({"bm": [bm.tobytes()]})

    parts = hashed.mapInPandas(build, "bm binary").collect()
    out = np.zeros(mbytes, dtype=np.uint8)
    for row in parts:
        out |= np.frombuffer(row.bm, dtype=np.uint8)
    return out.tobytes(), m, k


def bloom_semi_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    expected_items: int | None = None,
    fpp: float = 0.01,
    exact: bool = True,
) -> DataFrame:
    """Left-semi join with a Bloom prefilter on the big side.

    The scale pattern for "filter a huge fact table by a key set too big
    to broadcast exactly": a plain left-semi join shuffles ALL of
    ``left`` on the key; here ``left`` is first filtered by a broadcast
    Bloom filter of the right keys (16 MiB cap regardless of key count),
    so the exact join's shuffle carries only true matches plus an
    ``fpp`` fraction of non-matches.  With ``exact=True`` (default) the
    result EQUALS the plain semi join — the Bloom filter only shrinks
    the shuffle, false positives are removed by the final join (which is
    why the driver row ``rel_bloom_semi_join`` can be value-checked
    against a plain ``IN`` oracle).  ``exact=False`` returns the
    candidate superset (matches + ~fpp of the rest) and skips the join
    entirely — the one-shuffle-cheaper mode for pipelines that tolerate
    a bounded over-selection (e.g. candidate generation).

    Spark's AQE injects a similar runtime bloom under specific plan
    shapes only (selective build side, shuffle on both sides); this
    operator makes the pattern explicit, portable, and usable from the
    probe side of any plan.

    Both sides must present the key in the SAME data type — xxhash64
    hashes the native representation, so ``int 5`` and ``string "5"``
    hash differently.
    """
    bits, m, k = build_bloom(right, on, expected_items, fpp)
    import numpy as np
    import pandas as pd

    bc = left.sparkSession.sparkContext.broadcast(bits)

    def _member_fn(h1, h2):
        bm = np.frombuffer(bc.value, dtype=np.uint8)
        a = h1.to_numpy().astype(np.uint64)
        b = h2.to_numpy().astype(np.uint64)
        ok = np.ones(len(a), dtype=bool)
        for i in range(k):
            idx = (a + np.uint64(i) * b) % np.uint64(m)
            bit = bm[(idx >> np.uint64(3)).astype(np.int64)] >> (
                idx & np.uint64(7)
            )
            ok &= (bit & np.uint8(1)).astype(bool)
        return pd.Series(ok)

    # registered without type hints (pandas is a local import here, so
    # string annotations would not resolve) → scalar pandas UDF
    _member = F.pandas_udf(_member_fn, "boolean")

    h1, h2 = _hash_pair(F.col(on))
    candidates = left.filter(_member(h1, h2))
    if not exact:
        return candidates
    return candidates.join(right.select(on), on, "left_semi")
