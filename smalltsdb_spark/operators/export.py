"""Sharded JSONL export — the training-data handoff sink.

Downstream training stacks consume corpora as N fixed JSONL shards with a
DETERMINISTIC document→shard assignment (reproducible data orders, stable
resharding diffs, per-shard resumability).  Spark's plain ``write.json``
gives neither: output file count tracks upstream task count, and which
rows share a file depends on the physical plan of the producing query.

This sink pins both degrees of freedom:

- ``shard = md5_long(id) mod n_shards`` — a content hash of the document
  id, independent of row order, partitioning, and cluster size, and
  reproducible outside Spark (the DuckDB rendering is
  ``functions.md5_long_sql``, used verbatim by the ``ext_export_shards``
  oracle);
- ``repartition(shard)`` + ``partitionBy(shard)`` — exactly one file per
  shard directory, rows sorted by id within the file.

Scale shape: one hash-shuffle of the corpus (the minimum any deterministic
resharding needs), then embarrassingly-parallel JSONL encoding JVM-side —
no Python in the write path.  ``n_shards`` bounds per-file size: at 100 TB
pick shards so each holds a few GB (e.g. 65536), giving write parallelism
equal to shard count and downstream readers an addressable unit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from smalltsdb_spark.functions import md5_long

SHARD_COLUMN = "shard"
N_SHARDS_MARKER = "_n_shards"


def _write_n_shards_marker(out_dir: str, n_shards: int) -> None:
    import os

    with open(os.path.join(out_dir, N_SHARDS_MARKER), "w") as f:
        f.write(f"{n_shards}\n")


def shard_of(id_col, n_shards: int):
    """The deterministic shard assignment column: ``md5_long(id) mod n``.

    ``md5_long`` is a positive 60-bit hash, so plain ``%`` agrees across
    engines; ``pmod`` keeps the invariant explicit.  The id is cast to
    string first so integer and string ids hash identically.
    """
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return F.pmod(md5_long(c.cast("string")), F.lit(n_shards)).cast("int")


def export_jsonl_shards(
    df: DataFrame,
    out_dir: str,
    n_shards: int,
    id_col: str = "doc_id",
) -> None:
    """Write ``df`` as ``n_shards`` JSONL shard directories under
    ``out_dir`` (``shard=K/part-*.json``), one file per shard, rows
    ordered by ``id_col`` within each file."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    sharded = df.withColumn(SHARD_COLUMN, shard_of(id_col, n_shards))
    (
        sharded.repartition(F.col(SHARD_COLUMN))
        .sortWithinPartitions(id_col)
        .write.partitionBy(SHARD_COLUMN)
        .mode("overwrite")
        .json(out_dir)
    )
    _write_n_shards_marker(out_dir, n_shards)


def export_jsonl_shards_incremental(
    df: DataFrame,
    out_dir: str,
    n_shards: int,
    id_col: str = "doc_id",
) -> None:
    """Incremental export: write only the rows whose id is NOT already
    in the export at ``out_dir`` (the daily-dump pattern — each run
    appends one new file per touched shard, never rewrites or
    re-emits).

    The document→shard map is the same content hash as
    :func:`export_jsonl_shards`, so an export grown incrementally is
    LOGICALLY IDENTICAL to a one-shot export of the union — pinned by
    the ``ext_export_incremental`` driver row, which compares the
    incrementally-built export against the one-shot oracle.

    Already-exported ids come from a projection read of the export
    itself (only ``id_col`` is parsed), removed with a left-anti join —
    at corpus scale, prefilter with :func:`~smalltsdb_spark.operators.
    joins.bloom_semi_join` ``exact=False`` inverted if the exported-id
    relation is too big to shuffle comfortably.  File counts grow one
    per shard per increment; ``compact``-style maintenance applies if
    increments are frequent.
    """
    import os

    from pyspark.sql import types as T

    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    sharded = df.withColumn(SHARD_COLUMN, shard_of(id_col, n_shards))
    if os.path.isdir(out_dir):
        # the shard map is part of the export's identity: appending with
        # a different n_shards would interleave two inconsistent maps and
        # break incremental-equals-one-shot determinism
        marker = os.path.join(out_dir, N_SHARDS_MARKER)
        if os.path.exists(marker):
            with open(marker) as f:
                recorded = int(f.read().strip())
            if recorded != n_shards:
                raise ValueError(
                    f"existing export at {out_dir} was written with "
                    f"n_shards={recorded} but this increment passed "
                    f"n_shards={n_shards}; increments must reuse the "
                    "original shard count"
                )
        else:
            # pre-marker export: the dir names bound the original count
            # from below (empty shards leave no dir), catching the
            # too-small case; write the marker for future increments
            existing_shards = [
                int(d.split("=", 1)[1])
                for d in os.listdir(out_dir)
                if d.startswith(f"{SHARD_COLUMN}=")
            ]
            if existing_shards and max(existing_shards) >= n_shards:
                raise ValueError(
                    f"existing export at {out_dir} has shard dirs up to "
                    f"{max(existing_shards)} but n_shards={n_shards}; "
                    "increments must reuse the original shard count"
                )
            if existing_shards:
                # the dir-name bound is one-sided: an original n=8 export
                # has dirs 0..7, which a LARGER n_shards (16) would pass —
                # and then interleave two inconsistent shard maps.  So
                # additionally verify the claimed count against the data:
                # every already-exported id must land in its recorded
                # shard under n_shards.  One projection read (id + the
                # shard partition column), short-circuited by limit(1) on
                # the first mismatch.  Cost/soundness contract (ADVICE
                # r9): this full scan runs AT MOST ONCE per legacy
                # export — the marker is written immediately below on a
                # pass (not only after the append succeeds), so every
                # later increment takes the marker fast path; and the
                # check is probabilistic for TINY exports (an id
                # survives h%2n == h%n with p≈0.5, so k exported ids
                # miss a doubled count with p≈2^-k) — the marker is the
                # real contract, this is the best-effort legacy guard.
                id_field = next(
                    f for f in df.schema.fields if f.name == id_col
                )
                recorded = read_jsonl_shards(
                    df.sparkSession, out_dir, T.StructType([id_field])
                )
                mismatch = (
                    recorded.withColumn("_expect", shard_of(id_col, n_shards))
                    .filter(F.col("_expect") != F.col(SHARD_COLUMN))
                    .limit(1)
                    .collect()
                )
                if mismatch:
                    r = mismatch[0]
                    raise ValueError(
                        f"existing export at {out_dir} is inconsistent with "
                        f"n_shards={n_shards}: id {getattr(r, id_col)!r} "
                        f"lives in shard {r[SHARD_COLUMN]} but would map to "
                        f"{r['_expect']}; the original export was written "
                        "with a different shard count — increments must "
                        "reuse it"
                    )
                # passing check: persist the validated count NOW so the
                # legacy data scan never re-runs, even if this
                # increment's append crashes before its own marker write
                _write_n_shards_marker(out_dir, n_shards)
        id_field = next(f for f in df.schema.fields if f.name == id_col)
        existing = read_jsonl_shards(
            df.sparkSession, out_dir, T.StructType([id_field])
        ).select(id_col)
        sharded = sharded.join(existing, id_col, "left_anti")
    (
        sharded.repartition(F.col(SHARD_COLUMN))
        .sortWithinPartitions(id_col)
        .write.partitionBy(SHARD_COLUMN)
        .mode("append")
        .json(out_dir)
    )
    _write_n_shards_marker(out_dir, n_shards)


def read_jsonl_shards(
    spark: SparkSession, out_dir: str, schema: T.StructType
) -> DataFrame:
    """Read an export back with its shard partition column.

    The schema is explicit (no inference job over the whole export; JSON
    inference would also widen absent-in-some-shard columns).  ``shard``
    comes from the directory names, typed int to match :func:`shard_of`.
    """
    read_schema = T.StructType(
        list(schema.fields) + [T.StructField(SHARD_COLUMN, T.IntegerType())]
    )
    return spark.read.schema(read_schema).json(out_dir)
