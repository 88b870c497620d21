"""Sequence packing — token-budget chunk assignment for training prep.

Documents are assembled into fixed-budget training sequences: within a
stratum, documents in deterministic ``order_col`` order are assigned to
consecutive chunks by running token count, ``chunk_id =
floor(tokens_before_this_doc / budget)`` (a doc straddling a boundary
starts in the chunk where its first token lands — the streaming-pack
convention).

Scale shape: ONE window shuffle on the stratum key.  The stratum is a
parameter because it is the parallelism knob — packing an entire corpus
on ``lang`` alone means ~#langs window partitions do all the running-sum
work (3 tasks at any scale), which is the only serialization point in
the pipeline-prep family.  The 100 TB mode shards each natural stratum
into ``n`` independent timelines (:func:`add_shard`), giving
``#strata × n`` window partitions; each shard packs independently and
the chunk key becomes (stratum..., shard, chunk_id).  Budget semantics
are preserved per shard exactly (see tests/test_sampling.py equality
test), and cross-shard chunk boundaries don't exist by construction —
sharding trades nothing except that documents in different shards never
share a chunk, which a training pipeline doesn't care about.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    order_col: str,
    n_tokens_col: str,
    budget: int = 512,
    stratum_cols: Sequence[str] = ("lang",),
) -> DataFrame:
    """Assign ``chunk_id`` by running token count within each stratum.

    Returns ``df``'s ``order_col`` + ``stratum_cols`` + ``n_tokens_col``
    with ``chunk_id`` appended; chunks are identified by
    (*stratum_cols, chunk_id*).  ``chunk_id`` is computed as
    ``CAST(floor((cum - n_tokens) / float(budget)) AS BIGINT)`` — kept
    division-free of ``//`` so the Spark side and any SQL oracle agree
    bit-for-bit across engine versions (exact when ``budget`` is a power
    of two; for other budgets the quotient still only misrounds if
    cum/budget lands within one ULP of an integer, which integer token
    counts < 2**53 cannot produce).
    """
    if not stratum_cols:
        raise ValueError("pack_sequences: stratum_cols must be non-empty")
    w = (
        Window.partitionBy(*stratum_cols)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    before = F.sum(n_tokens_col).over(w) - F.col(n_tokens_col)
    return df.select(
        order_col,
        *stratum_cols,
        n_tokens_col,
        F.floor(before / F.lit(float(budget))).cast("long").alias("chunk_id"),
    )


def add_shard(
    df: DataFrame, id_col: str, n_shards: int, shard_col: str = "shard"
) -> DataFrame:
    """Add a deterministic shard bucket for sharded-stratum packing.

    xxhash64 spreads ids uniformly regardless of their distribution
    (sequential ids, hot prefixes), so each (stratum, shard) timeline
    gets ~1/n of the stratum — the skew-proof default.  Any
    deterministic bucketing works semantically; oracle-checked queries
    use ``id % n`` instead because a SQL engine can reproduce it.
    """
    if n_shards < 1:
        raise ValueError("pack_sequences: n_shards must be >= 1")
    return df.withColumn(
        shard_col, F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_shards))
    )
