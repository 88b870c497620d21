#!/usr/bin/env python
"""Incremental span dedup scale proof (VERDICT r9 item 4's cost claim).

The claim under test: cleaning a daily increment against a PERSISTED
shingle-hash index costs ~(increment shingling + one scan of the
16-byte-row index), so increment wall time must stay near-FLAT as the
corpus behind the index grows 1x -> 10x, while the from-scratch
alternative (re-shingling corpus + increment) grows ~linearly with the
corpus.

Corpus synthesis matches scripts/scale_proof.py: replicas of sf0.1
documents with per-replica token markers (gram structure isomorphic
within a replica, disjoint across), so duplication density stays
constant as the corpus grows.  The increment is a FIXED slice
(doc_id % 5 == 0 of one replica, ~1k docs) whose tokens are unmarked --
it duplicates nothing in the corpus, the worst case for index lookups
(every probe misses).

Usage: python scripts/span_incremental_study.py [replicas]
Prints one JSON line per (corpus_scale, path) cell; record in SCALE.md.
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
    remove_duplicated_spans,
    remove_duplicated_spans_incremental,
    shingle_count_index,
)
from smalltsdb_spark.session import get_spark

K = 8  # the driver row's shingle width


def replicate(docs, replicas: int, id_offset: int = 1_000_000):
    parts = []
    for r in range(replicas):
        parts.append(
            docs.select(
                (F.col("doc_id") + F.lit(r * id_offset)).alias("doc_id"),
                F.regexp_replace(
                    F.concat(F.lit(f"r{r}x"), F.col("text")), " ", f" r{r}x"
                ).alias("text"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.repartition(32).localCheckpoint(eager=True)


def noop(df):
    df.write.mode("overwrite").format("noop").save()


def main() -> None:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = get_spark(app_name="span-incr-study", master="local[32]")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    increment = (
        docs.filter(F.col("doc_id") % 5 == 0)
        .select((F.col("doc_id") + F.lit(900_000_000)).alias("doc_id"), "text")
        .localCheckpoint(eager=True)
    )
    n_inc = increment.count()

    for scale in (1, replicas):
        corpus = replicate(docs, scale)
        n_corpus = corpus.count()
        idx_dir = tempfile.mkdtemp(prefix=f"span_idx_{scale}x_")
        t0 = time.perf_counter()
        shingle_count_index(corpus, "doc_id", "text", k=K).write.mode(
            "overwrite"
        ).parquet(idx_dir)
        t_index = time.perf_counter() - t0
        index = spark.read.parquet(idx_dir)
        n_index = index.count()

        # incremental clean: 2 timed runs, report min (JIT warm)
        runs = []
        for _ in range(2):
            t0 = time.perf_counter()
            noop(
                remove_duplicated_spans_incremental(
                    increment, index, "doc_id", "text", k=K
                )
            )
            runs.append(time.perf_counter() - t0)
        # from-scratch alternative on corpus + increment
        scratch_runs = []
        union = corpus.unionByName(increment)
        for _ in range(2):
            t0 = time.perf_counter()
            noop(remove_duplicated_spans(union, "doc_id", "text", k=K))
            scratch_runs.append(time.perf_counter() - t0)
        print(
            json.dumps(
                {
                    "corpus_scale": scale,
                    "n_corpus_docs": n_corpus,
                    "n_increment_docs": n_inc,
                    "n_index_rows": n_index,
                    "index_build_sec": round(t_index, 2),
                    "incremental_sec": round(min(runs), 2),
                    "incremental_runs": [round(r, 2) for r in runs],
                    "scratch_sec": round(min(scratch_runs), 2),
                    "scratch_runs": [round(r, 2) for r in scratch_runs],
                }
            ),
            flush=True,
        )
        shutil.rmtree(idx_dir, ignore_errors=True)
        corpus.unpersist()


if __name__ == "__main__":
    main()
