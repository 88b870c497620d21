"""Similarity search over embedding columns (array<float>).

Two paths:

- :func:`cosine_topk` — brute-force exact top-k.  The query set is
  broadcast; every executor scores its partition of the corpus and the
  global top-k per query falls out of a ranking window.  At 100 TB this
  is the correct *baseline* (one corpus scan, no shuffle of the corpus —
  only (n_queries × corpus_partitions × k) candidate rows move).
- :func:`lsh_topk` — random-hyperplane LSH: both sides are bucketed by
  sign-bit signatures; only same-bucket pairs are scored.  Recall < 1 by
  construction, bounded by the usual hyperplane-LSH analysis; increase
  ``tables`` for recall, ``nbits`` for precision.  The hyperplanes are
  seeded driver-side so results are deterministic.

The scale path for a real IVF index (k-means centroids + inverted lists)
composes from these pieces: centroids become the bucket function; this
module keeps the bucket function data-independent so the oracle can check
the plumbing deterministically.
"""

from __future__ import annotations

import random
from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from smalltsdb_spark.functions import cosine_similarity, dot_product_fixed, l2_norm


def _pair_sim(a, b, na, nb, dim: int | None):
    """Per-pair cosine given per-row precomputed norms.

    With a known dimension the dot product is unrolled (compiles inside
    whole-stage codegen — the full cosine including norms overflows the
    64 KB generated-method limit inside join consume functions, forcing
    an interpreted fallback; norms are per-ROW work and belong before the
    join anyway).  Summation order matches functions.cosine_similarity,
    so results are bit-identical to the generic fold.
    """
    if dim:
        return dot_product_fixed(a, b, dim) / (na * nb)
    return cosine_similarity(a, b)


def _scored_pairs(
    corpus: DataFrame, queries: DataFrame, id_col: str, vec_col: str, dim: int | None
):
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qvec")
    ).withColumn("_qn", l2_norm(F.col("_qvec")))
    # parallelize the corpus scan even when it arrives as one small file
    parallelism = corpus.sparkSession.sparkContext.defaultParallelism
    c = (
        corpus.repartition(parallelism)
        .select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cvec"))
        .withColumn("_cn", l2_norm(F.col("_cvec")))
    )
    return (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "sim",
            F.round(
                _pair_sim(
                    F.col("_cvec"), F.col("_qvec"), F.col("_cn"), F.col("_qn"), dim
                ),
                6,
            ),
        )
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

    Deterministic ranking: similarity is rounded before ranking and ties
    break on neighbor_id, so the result is stable across engines and
    partitionings.
    """
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), "neighbor_id")
    return (
        _scored_pairs(corpus, queries, id_col, vec_col, dim)
        .withColumn("rank", F.row_number().over(w))
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


def _bucket_of(vec_col, planes: list[list[float]]):
    """Sign-bit bucket id of a vector under one table's hyperplanes.

    Deliberately NOT unrolled: tables × nbits × dim literal terms blow the
    64 KB generated-method limit and force a whole-stage interpreted
    fallback (measured slower than the higher-order form).  Bucketing runs
    once per row, not per pair, so the interpreted fold is off the hot
    path; pair *scoring* uses the unrolled cosine.
    """
    bits = [
        F.when(
            F.aggregate(
                F.zip_with(
                    F.transform(vec_col, lambda x: x.cast("double")),
                    F.array(*[F.lit(w) for w in plane]),
                    lambda x, y: x * y,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            > 0,
            F.lit(1 << i),
        ).otherwise(F.lit(0))
        for i, plane in enumerate(planes)
    ]
    return reduce(lambda a, b: a + b, bits)


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

    Output schema matches :func:`cosine_topk`; rank is within retrieved
    candidates, so missing neighbors (recall misses) shift ranks — that is
    the documented approximation contract.
    """
    planes = hyperplanes(dim, nbits, tables, seed)

    def bucketed(df: DataFrame, idc: str) -> DataFrame:
        parts = [
            df.select(
                F.col(idc),
                F.col(vec_col).alias("_v"),
                l2_norm(F.col(vec_col)).alias("_n"),
                F.lit(t).alias("_table"),
                _bucket_of(F.col(vec_col), planes[t]).alias("_bucket"),
            )
            for t in range(tables)
        ]
        return reduce(DataFrame.unionByName, parts)

    qb = bucketed(
        queries.select(F.col(id_col).alias("query_id"), vec_col), "query_id"
    )
    cb = bucketed(
        corpus.select(F.col(id_col).alias("neighbor_id"), vec_col), "neighbor_id"
    )
    cand = (
        cb.join(
            F.broadcast(
                qb.withColumnRenamed("_v", "_qv").withColumnRenamed("_n", "_qn")
            ),
            ["_table", "_bucket"],
        )
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                _pair_sim(
                    F.col("_v"), F.col("_qv"), F.col("_n"), F.col("_qn"), dim
                ),
                6,
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
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: the classic ANN index shape.

    Build: k-means centroids over the corpus (MLlib, seeded →
    deterministic), every vector assigned to its nearest centroid — the
    "inverted lists" are just a ``prediction`` column, so the index IS a
    partitionable DataFrame (at 100 TB: partition/bucket by centroid and
    the probe join prunes to nprobe/n_centroids of the data).

    Probe: each query scores only the lists of its ``nprobe`` nearest
    centroids (centroid distances computed driver-side — the centroid
    table is tiny by construction).  Output schema matches
    :func:`cosine_topk`; recall < 1 by construction, tunable via
    ``nprobe``/``n_centroids``.
    """
    import math

    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feat = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_v"),
        array_to_vector(
            F.transform(F.col(vec_col), lambda x: x.cast("double"))
        ).alias("_feat"),
    )
    model = KMeans(k=n_centroids, seed=seed, featuresCol="_feat").fit(feat)
    assigned = (
        model.transform(feat)
        .select(
            "neighbor_id",
            "_v",
            l2_norm(F.col("_v")).alias("_n"),
            F.col("prediction").alias("_list"),
        )
    )

    centroids = [[float(x) for x in c] for c in model.clusterCenters()]

    def nearest_lists(vec: list[float]) -> list[int]:
        dists = [
            (math.dist(vec, c), i) for i, c in enumerate(centroids)
        ]
        return [i for _, i in sorted(dists)[:nprobe]]

    q_rows = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    ).collect()
    spark = corpus.sparkSession
    probes = spark.createDataFrame(
        [
            (r.query_id, [float(x) for x in r._qv], l, float(_py_norm(r._qv)))
            for r in q_rows
            for l in nearest_lists([float(x) for x in r._qv])
        ],
        "query_id long, _qv array<double>, _list int, _qn double",
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), "neighbor_id")
    return (
        assigned.join(F.broadcast(probes), "_list")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                _pair_sim(F.col("_v"), F.col("_qv"), F.col("_n"), F.col("_qn"), dim),
                6,
            ).alias("sim"),
        )
        .distinct()
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "sim", "rank")
    )


def _py_norm(vec) -> float:
    """Driver-side L2 norm with the same left-to-right summation order as
    functions.l2_norm, so probe-side norms are bit-compatible."""
    import math

    acc = 0.0
    for x in vec:
        acc += float(x) * float(x)
    return math.sqrt(acc)


def embedding_near_dup_pairs(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.4,
    dim: int | None = None,
) -> DataFrame:
    """All pairs with cosine >= threshold (exact, pair join on id order).

    At corpus scale this would go through lsh buckets first; the exact
    variant is the oracle-checkable baseline.
    """
    # the corpus often arrives as one small file → one partition → the
    # O(n²) pair evaluation runs on one core; spread the streamed side
    # across the cluster (the other side broadcasts, so this repartition
    # shuffles only n rows to parallelize n² work)
    parallelism = corpus.sparkSession.sparkContext.defaultParallelism
    a = (
        corpus.repartition(parallelism)
        .select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"))
        .withColumn("_na", l2_norm(F.col("_va")))
    )
    b = corpus.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb")
    ).withColumn("_nb", l2_norm(F.col("_vb")))
    return (
        a.crossJoin(F.broadcast(b))
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "sim",
            F.round(
                _pair_sim(F.col("_va"), F.col("_vb"), F.col("_na"), F.col("_nb"), dim),
                6,
            ),
        )
        .filter(F.col("sim") >= threshold)
        .select("id_a", "id_b", "sim")
    )
