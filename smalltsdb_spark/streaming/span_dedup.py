"""Streaming ExactSubstr span dedup — the foreachBatch handler behind the
``stream_span_dedup_incremental`` driver row, factored out so its
EXACTLY-ONCE story is unit-testable without a stream.

Structured Streaming's foreachBatch contract is AT-LEAST-ONCE: after a
crash between the sink write and the checkpoint commit, the batch is
REPLAYED with the same ``batch_id``.  A naive handler (append cleaned
docs, bump an in-memory index pointer) double-appends on replay and
loses the pointer on driver restart.  This handler is idempotent and
restart-safe by construction:

- **Index versions are keyed by batch id**: processing batch ``b`` reads
  the newest ``index_v{n}`` with ``n < b`` (empty relation when none —
  batch 0, or a fresh store) and overwrites ``index_v{b}``.  A replay of
  batch ``b`` reads the same pre-state (its own half-written ``v{b}`` is
  ignored by the ``n < b`` rule) and rewrites the same version.
- **Output is keyed by batch id too**: cleaned docs land in
  ``out/batch={b}`` with overwrite — a replay replaces, never duplicates.
- **No driver state**: everything resolves from the directory listing,
  so a restarted driver continues where the checkpoint says.

Scale shape per trigger is the batch path's measured model (SCALE.md):
batch shingling + one 24-byte-row index scan + one union-sum index
rewrite — corpus text never re-shingles.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession

_VERSION_RE = re.compile(r"^index_v(\d+)$")


def latest_index_version(index_base: str, before: int | None = None) -> int | None:
    """Newest committed index version, optionally restricted to versions
    strictly below ``before`` (the replay rule).  None when no committed
    version qualifies — a version directory counts only once its
    ``_SUCCESS`` marker exists (a crash mid-write leaves no marker, so a
    half-written version is never resolved)."""
    if not os.path.isdir(index_base):
        return None
    best = None
    for name in os.listdir(index_base):
        m = _VERSION_RE.match(name)
        if not m:
            continue
        v = int(m.group(1))
        if before is not None and v >= before:
            continue
        if not os.path.exists(os.path.join(index_base, name, "_SUCCESS")):
            continue
        if best is None or v > best:
            best = v
    return best


def read_index(
    spark: SparkSession, index_base: str, before: int | None = None
) -> DataFrame:
    """The (h, c) shingle-count relation as of the newest committed
    version (< ``before`` when given); empty relation when none."""
    v = latest_index_version(index_base, before)
    if v is None:
        return spark.createDataFrame([], "h long, c long")
    return spark.read.parquet(os.path.join(index_base, f"index_v{v}"))


def make_span_dedup_batch_handler(
    spark: SparkSession,
    index_base: str,
    out_dir: str,
    id_col: str,
    text_col: str,
    k: int = 50,
    min_count: int = 2,
):
    """A foreachBatch callable implementing idempotent streaming span
    dedup (module docstring).  Pass to ``writeStream.foreachBatch``."""
    from smalltsdb_spark.operators.dedup import (
        merge_shingle_index,
        remove_duplicated_spans_incremental,
        shingle_count_index,
    )

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        batch_df = batch_df.persist()
        try:
            index = read_index(spark, index_base, before=batch_id)
            remove_duplicated_spans_incremental(
                batch_df, index, id_col, text_col, k=k, min_count=min_count
            ).write.mode("overwrite").parquet(
                os.path.join(out_dir, f"batch={batch_id}")
            )
            merge_shingle_index(
                index, shingle_count_index(batch_df, id_col, text_col, k=k)
            ).write.mode("overwrite").parquet(
                os.path.join(index_base, f"index_v{batch_id}")
            )
        finally:
            batch_df.unpersist()

    return handle
