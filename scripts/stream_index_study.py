#!/usr/bin/env python
"""Measured evidence for the r11 streaming span-dedup index layout
(VERDICT r10 "What's wrong" #1): index MAINTENANCE cost of the
hash-prefix partitioned, LSM-appended index vs the r10 layout's
full-index rewrite, across corpus sizes.

Two measurements per scale, isolating maintenance from the dedup itself
(the batch-vs-index count lookup is inherent and identical in both
designs):

1. one-trigger wall: with the batch's (h, c, pfx) delta pre-computed
   and persisted, time (a) the O(batch) delta append write vs (b) the
   r10 full read + union-sum + rewrite;
2. steady state: drive T=8 consecutive triggers through the SHIPPED
   handler (compact_files=4, zero grace) and count the actual
   maintenance bytes written under the index (deltas + compaction
   folds + retired-then-GC'd files) vs what 8 full rewrites of the
   final index would have written — the disk/write-amplification story
   a 10 s cadence lives or dies on.

Prints one JSON line per scale.  Run:
    python scripts/stream_index_study.py [scales...]   # default 1 10 50
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from smalltsdb_spark.operators.dedup import shingle_count_index
from smalltsdb_spark.session import get_spark
from smalltsdb_spark.streaming.span_dedup import (
    make_span_dedup_batch_handler,
    read_index,
)

K = 8
N_PREFIXES = 64
BATCH_DOCS = 200
TRIGGERS = 8


def _tree_bytes(root: str) -> int:
    total = 0
    for r, _d, fs in os.walk(root):
        for f in fs:
            try:
                total += os.path.getsize(os.path.join(r, f))
            except OSError:
                pass
    return total


def main() -> None:
    scales = [int(s) for s in sys.argv[1:]] or [1, 10, 50]
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    spark = get_spark(
        app_name="stream-index-study",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    docs = (
        spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
        .select("doc_id", "text")
    )
    base_n = docs.count()

    for scale in scales:
        corpus = docs
        if scale > 1:
            corpus = (
                docs.crossJoin(
                    F.broadcast(spark.range(scale).select(F.col("id").alias("_r")))
                )
                .select(
                    (F.col("doc_id") * scale + F.col("_r")).alias("doc_id"),
                    # PER-TOKEN replica marker: every k-token window of
                    # every copy contains a marker token, so distinct
                    # shingles (index rows) scale with the corpus
                    F.regexp_replace(
                        F.concat(F.lit("r"), F.col("_r"), F.lit(" "), F.col("text")),
                        F.lit(" "),
                        F.concat(F.lit(" m"), F.col("_r"), F.lit(" ")),
                    ).alias("text"),
                )
            )

        work = tempfile.mkdtemp(prefix=f"stream_idx_study_{scale}x_")
        index_base, out = f"{work}/idx", f"{work}/out"
        handle = make_span_dedup_batch_handler(
            spark, index_base, out, "doc_id", "text",
            k=K, n_prefixes=N_PREFIXES, gc_grace_seconds=0.0,
        )
        t0 = time.perf_counter()
        handle(corpus, 0)  # batch 0 = the corpus (index build, untimed)
        build_s = time.perf_counter() - t0
        index_rows = read_index(spark, index_base).count()
        index_bytes = _tree_bytes(index_base)

        # -- measurement 1: one trigger's MAINTENANCE write, isolated --
        delta = (
            shingle_count_index(
                docs.limit(BATCH_DOCS).select(
                    (F.col("doc_id") + F.lit(10_000_000)).alias("doc_id"),
                    "text",
                ),
                "doc_id", "text", k=K,
            )
            .withColumn("pfx", F.pmod(F.col("h"), F.lit(N_PREFIXES)))
            .persist()
        )
        delta.count()
        append_dir, full_dir = f"{work}/m_append", f"{work}/m_full"
        t0 = time.perf_counter()
        (
            delta.select("h", "c", "pfx")
            .repartition("pfx")
            .write.mode("overwrite")
            .partitionBy("pfx")
            .parquet(append_dir)
        )
        append_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        (
            read_index(spark, index_base)
            .unionByName(delta.select("h", "c"))
            .groupBy("h")
            .agg(F.sum("c").cast("long").alias("c"))
            .write.mode("overwrite")
            .parquet(full_dir)
        )
        full_s = time.perf_counter() - t0
        append_bytes = _tree_bytes(append_dir)
        full_bytes = _tree_bytes(full_dir)
        delta.unpersist()

        # -- measurement 2: steady state over TRIGGERS handler calls --
        written = 0
        trigger_walls = []
        before_dirs = {d for d in os.listdir(index_base)}
        for b in range(1, TRIGGERS + 1):
            batch = docs.limit(BATCH_DOCS).select(
                (F.col("doc_id") + F.lit(10_000_000 * b)).alias("doc_id"),
                "text",
            )
            t0 = time.perf_counter()
            handle(batch, b)
            trigger_walls.append(round(time.perf_counter() - t0, 2))
            for d in os.listdir(index_base):
                if d.startswith("data_b") and d not in before_dirs:
                    written += _tree_bytes(os.path.join(index_base, d))
                    before_dirs.add(d)

        print(
            json.dumps(
                {
                    "scale": scale,
                    "corpus_docs": base_n * scale,
                    "index_rows": index_rows,
                    "index_bytes": index_bytes,
                    "index_build_s": round(build_s, 2),
                    "batch_docs": BATCH_DOCS,
                    "one_trigger_append_write_s": round(append_s, 2),
                    "one_trigger_full_rewrite_s": round(full_s, 2),
                    "one_trigger_append_bytes": append_bytes,
                    "one_trigger_full_bytes": full_bytes,
                    "steady_triggers": TRIGGERS,
                    "steady_maintenance_bytes": written,
                    "steady_full_rewrite_bytes": full_bytes * TRIGGERS,
                    "steady_trigger_walls_s": trigger_walls,
                }
            ),
            flush=True,
        )
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
