#!/usr/bin/env python
"""Measured evidence for the r11 streaming span-dedup index layout
(VERDICT r10 "What's wrong" #1): per-trigger cost of the hash-prefix
PARTITIONED index (upsert only touched partitions) vs the r10 layout's
full-index rewrite, across corpus sizes, with a fixed-size micro-batch.

Method: build a corpus index of N documents (replica-marked sf0.1
documents, the span_incremental_study fixture recipe) through the batch
handler; then time ONE trigger of a fixed 200-doc batch two ways:

- partitioned: the shipped handler (read touched prefixes, rewrite
  touched partitions, manifest commit, GC);
- full-rewrite: read the ENTIRE index, union-sum, rewrite every row as
  one new version — what the r10 handler did every trigger.

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

from smalltsdb_spark.operators.dedup import (
    merge_shingle_index,
    shingle_count_index,
)
from smalltsdb_spark.session import get_spark
from smalltsdb_spark.streaming.span_dedup import (
    make_span_dedup_batch_handler,
    read_index,
)

K = 8
N_PREFIXES = 64
BATCH_DOCS = 200


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
                    # replica marker keeps shingles distinct across copies
                    F.concat(F.lit("r"), F.col("_r"), F.lit(" "), F.col("text")).alias(
                        "text"
                    ),
                )
            )
        batch = (
            docs.limit(BATCH_DOCS)
            .select(
                (F.col("doc_id") + F.lit(10_000_000)).alias("doc_id"), "text"
            )
            .persist()
        )
        batch.count()

        work = tempfile.mkdtemp(prefix=f"stream_idx_study_{scale}x_")
        index_base, out = f"{work}/idx", f"{work}/out"
        handle = make_span_dedup_batch_handler(
            spark, index_base, out, "doc_id", "text",
            k=K, n_prefixes=N_PREFIXES, gc_grace_seconds=0.0,
        )
        # batch 0 = the corpus (index build; untimed for the comparison)
        t0 = time.perf_counter()
        handle(corpus, 0)
        build_s = time.perf_counter() - t0
        index_rows = read_index(spark, index_base).count()

        # timed trigger, partitioned path (the shipped handler)
        t0 = time.perf_counter()
        handle(batch, 1)
        part_s = time.perf_counter() - t0
        touched = len(
            [
                d
                for d in os.listdir(os.path.join(index_base, "data_b1"))
                if d.startswith("pfx=")
            ]
        )

        # timed trigger, r10 layout: full-index union-sum rewrite
        full_dir = f"{work}/full"
        t0 = time.perf_counter()
        merge_shingle_index(
            read_index(spark, index_base),
            shingle_count_index(batch, "doc_id", "text", k=K),
        ).write.mode("overwrite").parquet(full_dir)
        full_s = time.perf_counter() - t0

        print(
            json.dumps(
                {
                    "scale": scale,
                    "corpus_docs": base_n * scale,
                    "index_rows": index_rows,
                    "index_build_s": round(build_s, 2),
                    "batch_docs": BATCH_DOCS,
                    "touched_prefixes": touched,
                    "n_prefixes": N_PREFIXES,
                    "trigger_partitioned_s": round(part_s, 2),
                    "trigger_full_rewrite_s": round(full_s, 2),
                }
            ),
            flush=True,
        )
        batch.unpersist()
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
