#!/usr/bin/env python
"""10x scale proof for the dedup/clustering suite (VERDICT r2 item #8).

Synthesizes a 10x corpus from sf0.1 documents — each replica's tokens are
prefixed with a replica marker, so gram/signature structure is isomorphic
WITHIN a replica and disjoint ACROSS replicas.  That keeps the per-doc
near-dup degree constant as the corpus grows (the realistic web-corpus
shape: duplication rate does not rise with corpus size), so a correct
posting-list cost model must scale ~linearly in documents; a super-linear
blowup falsifies it.

Runs ngram-Jaccard pairs, minhash-LSH pairs, and the full
clusters pipeline at 1x and 10x and prints docs/sec for each.  Results
recorded in SCALE.md.

Usage: python scripts/scale_proof.py [replicas]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from smalltsdb_spark.operators import dedup
from smalltsdb_spark.operators.components import dedup_cluster_labels
from smalltsdb_spark.session import get_spark


def replicate(docs, replicas: int, id_offset: int = 1_000_000):
    """replicas x docs with disjoint ids and gram-disjoint text."""
    parts = []
    for r in range(replicas):
        parts.append(
            docs.select(
                (F.col("doc_id") + F.lit(r * id_offset)).alias("doc_id"),
                # prefix every token with a replica marker: token/gram
                # multisets stay isomorphic within a replica, disjoint
                # across replicas
                F.regexp_replace(
                    F.concat(F.lit(f"r{r}x"), F.col("text")),
                    " ",
                    f" r{r}x",
                ).alias("text"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    # a real 10x corpus arrives pre-partitioned; materialize the synthetic
    # one the same way so the timing measures the operators, not the union
    return out.repartition(32).localCheckpoint(eager=True)


def run_suite(docs, n_docs: int) -> dict[str, float]:
    """Best-of-2 per operator: the first run of each carries whole-stage
    codegen JIT compilation (seconds — bigger than the 1x data cost
    itself), which would otherwise masquerade as super/sub-linear
    scaling."""

    def noop(df):
        df.write.mode("overwrite").format("noop").save()

    def jaccard():
        noop(dedup.ngram_jaccard_pairs(docs, "doc_id", "text", n=2,
                                       threshold=0.15, max_gram_freq=100))

    def minhash():
        noop(dedup.minhash_lsh_pairs(docs, "doc_id", "text", k=16, bands=4,
                                     threshold=0.5))

    def clusters():
        pairs = dedup.minhash_lsh_pairs(docs, "doc_id", "text", k=16,
                                        bands=4, threshold=0.5)
        noop(dedup_cluster_labels(docs, "doc_id", pairs))

    def lines():
        # line_sep=' ': every token is a 'line' — the per-line explode
        # carries the FULL corpus token count, the op's worst case; the
        # replica token prefixes keep per-line doc counts constant as
        # the corpus grows (the linear-cost shape being pinned)
        noop(dedup.remove_duplicated_lines(docs, "doc_id", "text",
                                           line_sep=" "))

    def bpe():
        from smalltsdb_spark.operators.textstats import bpe_train

        # corpus → distinct-word reduction is the only corpus-sized
        # pass; 4 iterations then run on the vocabulary relation, so
        # wall time should be near-flat in corpus size
        bpe_train(docs, "text", 4)

    out = {}
    for name, fn in [("jaccard", jaccard), ("minhash", minhash),
                     ("clusters", clusters), ("lines", lines),
                     ("bpe", bpe)]:
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        out[f"{name}_sec"] = round(best, 2)
    for k in list(out):
        out[k.replace("_sec", "_docs_per_sec")] = round(n_docs / out[k], 1)
    out["n_docs"] = n_docs
    return out


def replicate_emb(emb, replicas: int, dim: int = 64, id_offset: int = 10_000_000):
    """replicas x embeddings with disjoint ids and scrambled geometry.

    Each replica r > 0 applies a deterministic per-replica sign-flip
    pattern — an orthogonal transform, so WITHIN a replica every
    pairwise cosine (and thus the near-dup/topk structure) is exactly
    preserved, while ACROSS replicas similarities are scrambled: per-row
    near-dup degree stays constant as the corpus grows, the same
    realistic shape the document replication uses."""
    import random

    parts = []
    for r in range(replicas):
        rng = random.Random(1234 + r)
        mask = [
            1.0 if (r == 0 or rng.random() < 0.5) else -1.0 for _ in range(dim)
        ]
        parts.append(
            emb.select(
                (F.col("vec_id") + F.lit(r * id_offset)).alias("vec_id"),
                F.zip_with(
                    "embedding",
                    F.array(*[F.lit(m) for m in mask]),
                    lambda x, s: (x * s).cast("float"),
                ).alias("embedding"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.repartition(32).localCheckpoint(eager=True)


def run_sim_suite(emb, queries, n_vecs: int) -> dict[str, float]:
    """Best-of-2 per operator (see run_suite on why)."""
    from smalltsdb_spark.operators import similarity

    def noop(df):
        df.write.mode("overwrite").format("noop").save()

    def lsh():
        noop(similarity.lsh_topk(emb, queries, "vec_id", "embedding",
                                 k=5, nbits=8, tables=4, dim=64))

    def ivf():
        noop(similarity.ivf_topk(emb, queries, "vec_id", "embedding",
                                 k=5, n_centroids=16, nprobe=4, dim=64))

    # block count scales with the corpus so the per-task GEMM stays
    # bounded (~2.5k x 2.5k, ~50 MB result): n_blocks is the operator's
    # documented memory knob — a FIXED block count at 100x data means
    # (n/8)^2 ~ 5 GB per task x 32 workers, which OOMs the host
    n_blocks = max(8, -(-n_vecs // 2500))

    def neardup():
        noop(similarity.embedding_near_dup_pairs_blocked(
            emb, "vec_id", "embedding", threshold=0.9, n_blocks=n_blocks))

    def semantic():
        # one cluster-keyed shuffle + within-cluster GEMMs; cluster count
        # scales with the corpus so per-task pair grids stay bounded
        # (same budget reasoning as n_blocks above)
        noop(similarity.semantic_near_dup_pairs(
            emb, "vec_id", "embedding",
            n_clusters=max(16, -(-n_vecs // 2500)), threshold=0.9))

    def ivf_pq():
        # full build + probe each run: training is driver-side on the
        # bounded id-ordered sample, encode is one corpus pass, probe
        # reads only code columns — the measured quantity is the whole
        # index lifecycle, which is what an ingest pipeline pays
        C = similarity.ivf_train(emb, "vec_id", "embedding",
                                 n_centroids=16, seed=42)
        assigned = similarity.ivf_assign(emb, "vec_id", "embedding", C)
        B = similarity.pq_train_residual(emb, "vec_id", "embedding", C,
                                         m=4, codes=16)
        index = similarity.ivf_pq_encode(assigned, B, C)
        noop(similarity.ivf_pq_topk(index, C, B, queries,
                                    "vec_id", "embedding", k=5, nprobe=4))

    out = {}
    for name, fn in [("lsh_topk", lsh), ("ivf_topk", ivf),
                     ("neardup_blocked", neardup), ("semantic_dedup", semantic),
                     ("ivf_pq", ivf_pq)]:
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        out[f"{name}_sec"] = round(best, 2)
    for k in list(out):
        out[k.replace("_sec", "_vecs_per_sec")] = round(n_vecs / out[k], 1)
    out["n_vecs"] = n_vecs
    return out


def main_sim(replicas: int):
    spark = get_spark(app_name="scale-proof-sim", master="local[32]",
                      shuffle_partitions=32)
    base = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    n = base.count()
    one = replicate_emb(base, 1)
    big = replicate_emb(base, replicas)
    # queries: 25 vectors from the base replica, same set at every scale
    queries = one.filter(F.col("vec_id") < 25).localCheckpoint(eager=True)
    one.limit(10).count()

    r1 = run_sim_suite(one, queries, n)
    rN = run_sim_suite(big, queries, n * replicas)
    ratios = {
        k.replace("_sec", ""): round(rN[k] / r1[k], 2)
        for k in ("lsh_topk_sec", "ivf_topk_sec", "neardup_blocked_sec",
                  "semantic_dedup_sec", "ivf_pq_sec")
    }
    print(json.dumps({"sf0.1": r1, f"{replicas}x": rN,
                      f"time_ratio_at_{replicas}x_data": ratios}))


def run_pipeline_suite(docs, emb, n_docs: int) -> dict[str, float]:
    """Best-of-2 per operator (see run_suite on why): the round-4
    pipeline-prep family — all linear by construction (no pair joins),
    so the proof target is time ratio ~ data ratio or better."""
    from smalltsdb_spark.operators import similarity, textstats

    def noop(df):
        df.write.mode("overwrite").format("noop").save()

    def segments():
        noop(dedup.duplicated_segments(docs, "doc_id", "text", width=20))

    def novelty():
        noop(textstats.novelty(docs, "doc_id", "text", n=2))

    def tfidf():
        noop(textstats.tfidf_topk(docs, "doc_id", "text", k=3))

    def kmeans():
        _, assigned = similarity.kmeans_fit(
            emb, "vec_id", "embedding", k=8, iters=2
        )
        noop(
            assigned.groupBy("cluster").agg(
                F.count("*").alias("n"), F.avg("dist2").alias("d")
            )
        )

    def embed():
        # r8 text->embedding bridge: one explode/groupBy + broadcast
        # projection join + one groupBy(doc) of long sums -- linear
        from smalltsdb_spark.operators.embedding import embed_text

        noop(embed_text(docs, "doc_id", "text", n_features=1 << 15, d=16))

    def classifier_fit():
        # r8 learned quality gate: 3 iterations over the cached
        # (doc, feature) relation -- per-iteration cost is the proof
        # target (corpus scans, model-sized driver traffic)
        from pyspark.sql import functions as FF

        from smalltsdb_spark.functions import tokens
        from smalltsdb_spark.operators import classifier as clf

        labels = docs.select(
            "doc_id",
            (FF.size(FF.filter(tokens("text"), lambda w: FF.length(w) > 0))
             >= 60).cast("int").alias("label"),
        )
        feats = clf.featurize(docs, "doc_id", "text", 4096)
        clf.fit(feats, labels, "doc_id", 4096, iters=3, lr=0.5)

    out = {}
    for name, fn in [("segments", segments), ("novelty", novelty),
                     ("tfidf", tfidf), ("kmeans", kmeans),
                     ("embed", embed), ("classifier", classifier_fit)]:
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        out[f"{name}_sec"] = round(best, 2)
    for k in list(out):
        out[k.replace("_sec", "_docs_per_sec")] = round(n_docs / out[k], 1)
    out["n_docs"] = n_docs
    return out


def main_pipeline(replicas: int):
    spark = get_spark(app_name="scale-proof-pipeline", master="local[32]",
                      shuffle_partitions=32)
    docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    n = docs.count()
    one, em1 = replicate(docs, 1), replicate_emb(emb, 1)
    big, emN = replicate(docs, replicas), replicate_emb(emb, replicas)
    one.limit(10).count()

    r1 = run_pipeline_suite(one, em1, n)
    rN = run_pipeline_suite(big, emN, n * replicas)
    ratios = {
        k.replace("_sec", ""): round(rN[k] / r1[k], 2)
        for k in ("segments_sec", "novelty_sec", "tfidf_sec", "kmeans_sec",
                  "embed_sec", "classifier_sec")
    }
    print(json.dumps({"sf0.1": r1, f"{replicas}x": rN,
                      f"time_ratio_at_{replicas}x_data": ratios}))



def main():
    args = [a for a in sys.argv[1:] if a not in ("sim", "pipeline")]
    replicas = int(args[0]) if args else 10
    if "sim" in sys.argv[1:]:
        main_sim(replicas)
        return
    if "pipeline" in sys.argv[1:]:
        main_pipeline(replicas)
        return
    spark = get_spark(app_name="scale-proof", master="local[32]",
                      shuffle_partitions=32)
    base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    n = base.count()

    one = replicate(base, 1)
    ten = replicate(base, replicas)
    # warm JVM + python workers so fixed startup cost hits neither run
    one.limit(10).count()

    r1 = run_suite(one, n)
    r10 = run_suite(ten, n * replicas)
    ratios = {
        k.replace("_sec", ""): round(r10[k] / r1[k], 2)
        for k in ("jaccard_sec", "minhash_sec", "clusters_sec")
    }
    print(json.dumps({"sf0.1": r1, f"{replicas}x": r10,
                      "time_ratio_at_10x_data": ratios}))


if __name__ == "__main__":
    main()
