"""Custom stateful streaming operator: per-path online anomaly scoring.

The window/watermark rollup (pipeline.py) covers everything the reference
computes; this module demonstrates the capability the built-in operators
can NOT express — arbitrary per-key state evolved across micro-batches —
via ``applyInPandasWithState``, the PySpark custom-stateful-operator API.

The operator keeps a per-path exponentially-weighted mean/variance
(Welford-style EW update) and emits, for every incoming datapoint, its
z-score against the state *before* the update — i.e. an online anomaly
score with O(1) state per path, the classic streaming-monitoring primitive
the reference's batch tables can't provide (its closest analog is eyeballs
on the Bokeh graphs).

Scale: state is 3 doubles + a count per path, sharded by the state store
across (path-hash) partitions; each micro-batch shuffles only that batch's
rows on path.  The same function body runs unchanged under
``GroupState`` timeouts for TTL-ing idle paths (not enabled here — the
reference never expires metrics either, tsdb.py has no such path).

Batch parity: :func:`ewma_scores_batch` computes the identical recurrence
with a sort-based pass per path, so the streaming operator is testable
against a deterministic batch oracle (and against DuckDB window SQL — the
EW recurrence is expressible with ``sum(x * pow(1-a, -i))`` tricks only in
unstable forms, so the batch variant uses the same Python kernel instead).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = (
    "path string, timestamp double, value double, ew_mean double, "
    "ew_var double, zscore double"
)
STATE_SCHEMA = "mean double, var double, n long"


def _ew_step(mean: float, var: float, n: int, x: float, alpha: float):
    """One EW mean/variance update (returns score-then-update outputs).

    The z-score uses the state BEFORE x is folded in, so a lone spike
    scores high instead of masking itself; the first point of a path
    scores 0 by definition.
    """
    if n == 0:
        return 0.0, x, 0.0
    d = x - mean
    denom = var ** 0.5 if var > 0 else 1.0
    z = d / denom
    new_mean = mean + alpha * d
    new_var = (1.0 - alpha) * (var + alpha * d * d)
    return z, new_mean, new_var


def _apply_group(
    key, pdfs: Iterator[pd.DataFrame], state: GroupState, alpha: float
) -> Iterator[pd.DataFrame]:
    if state.exists:
        mean, var, n = state.get
    else:
        mean, var, n = 0.0, 0.0, 0
    # value as tiebreak on equal timestamps: keeps the fold order identical
    # to the batch twin and the DuckDB recursive-CTE oracle
    rows = pd.concat(list(pdfs)).sort_values(["timestamp", "value"])
    out = {"timestamp": [], "value": [], "ew_mean": [], "ew_var": [], "zscore": []}
    for ts, x in zip(rows["timestamp"], rows["value"]):
        z, mean, var = _ew_step(mean, var, n, float(x), alpha)
        n += 1
        out["timestamp"].append(ts)
        out["value"].append(x)
        out["ew_mean"].append(mean)
        out["ew_var"].append(var)
        out["zscore"].append(z)
    state.update((mean, var, n))
    df = pd.DataFrame(out)
    df.insert(0, "path", key[0])
    yield df


def ewma_scores_stream(incoming: DataFrame, alpha: float = 0.125) -> DataFrame:
    """Streaming per-path anomaly scores via applyInPandasWithState.

    ``incoming`` is a streaming DataFrame with (path, timestamp, value);
    output appends one scored row per input row.  Within a micro-batch
    rows are processed in timestamp order; cross-batch order is arrival
    order (state carries over) — the monitoring semantic, not a total
    event-time sort.
    """
    return incoming.groupBy("path").applyInPandasWithState(
        lambda key, pdfs, state: _apply_group(key, pdfs, state, alpha),
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def ewma_scores_batch(incoming: DataFrame, alpha: float = 0.125) -> DataFrame:
    """Batch twin of :func:`ewma_scores_stream`: same recurrence, same
    output schema, computed with ``applyInPandas`` over each full path
    (deterministic: global timestamp sort per path).  Streaming-vs-batch
    equivalence when each path's rows arrive time-ordered is the test
    contract (tests/test_stateful.py)."""

    def score(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["timestamp", "value"])
        mean, var, n = 0.0, 0.0, 0
        ms, vs, zs = [], [], []
        for x in pdf["value"]:
            z, mean, var = _ew_step(mean, var, n, float(x), alpha)
            n += 1
            ms.append(mean)
            vs.append(var)
            zs.append(z)
        return pd.DataFrame(
            {
                "path": pdf["path"].to_numpy(),
                "timestamp": pdf["timestamp"].to_numpy(),
                "value": pdf["value"].to_numpy(),
                "ew_mean": ms,
                "ew_var": vs,
                "zscore": zs,
            }
        )

    return incoming.select("path", "timestamp", "value").groupBy("path").applyInPandas(
        score, OUT_SCHEMA
    )


def first_seen_stream(
    stream: DataFrame,
    key_cols: list[str],
    ts_col: str = "timestamp",
    ttl_minutes: int | None = None,
) -> DataFrame:
    """Streaming first-seen dedup: emit each key's FIRST row (by ``ts_col``
    within its arrival micro-batch), drop every later occurrence across
    all micro-batches — the on-arrival dedup a training-data ingest
    pipeline runs so duplicates never land in storage at all (the batch
    dedup operators then only handle NEAR-duplicates).

    State is one counter per key, sharded by the state store across
    key-hash partitions.  ``ttl_minutes`` arms a processing-time timeout
    that expires idle keys — the bounded-state mode for unbounded key
    spaces (an exact seen-set over 100 TB of content hashes does not fit;
    TTL turns the guarantee into "exact within the window", which is the
    standard contract for streaming dedup — cf. dropDuplicates
    withWatermark).  Output schema == input schema.

    Lifecycle note for TTL mode: a processing-time timeout makes the
    engine schedule timeout-check batches indefinitely, so the query
    never self-quiesces — ``processAllAvailable`` blocks and an
    ``availableNow`` trigger does not terminate promptly.  TTL is for
    genuinely always-on queries (explicit ``stop()``); use
    ``ttl_minutes=None`` for drain-and-stop/batch-replay runs.

    Batch twin: :func:`first_seen_batch` (pure window, no Python) — equal
    output when each key's first row arrives in the earliest micro-batch,
    pinned by tests/test_stateful.py.
    """
    schema = stream.schema
    cols = [f.name for f in schema.fields]
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl_minutes is not None
        else GroupStateTimeout.NoTimeout
    )

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return
        rows = pd.concat(list(pdfs))
        if len(rows) and not state.exists:
            first = rows.sort_values(ts_col).head(1)
            state.update((1,))
            if ttl_minutes is not None:
                state.setTimeoutDuration(ttl_minutes * 60_000)
            yield first[cols]
        else:
            if state.exists and ttl_minutes is not None:
                state.setTimeoutDuration(ttl_minutes * 60_000)

    return stream.groupBy(*key_cols).applyInPandasWithState(
        fn,
        outputStructType=schema,
        stateStructType="n long",
        outputMode="append",
        timeoutConf=timeout,
    )


def first_seen_batch(
    df: DataFrame, key_cols: list[str], ts_col: str = "timestamp"
) -> DataFrame:
    """Batch twin of :func:`first_seen_stream`: one window pass, pure JVM
    (row_number over the key ordered by time, remaining columns as the
    deterministic tiebreak)."""
    from pyspark.sql import Window

    others = [c for c in df.columns if c not in key_cols and c != ts_col]
    w = Window.partitionBy(*key_cols).orderBy(ts_col, *others)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def top_anomalies(scored: DataFrame, k: int = 10) -> DataFrame:
    """Top-k |zscore| rows — the 'what should I look at' query."""
    return (
        scored.withColumn("abs_z", F.abs("zscore"))
        .orderBy(F.desc("abs_z"))
        .limit(k)
        .drop("abs_z")
    )
