"""Unit tests for similarity search operators."""

import math

import pytest
from pyspark.sql import functions as F

from smalltsdb_spark.functions import cosine_similarity
from smalltsdb_spark.operators import similarity

# 4-dim toy corpus: v1 ~ v2, both orthogonal to v3
VECS = [
    (1, [1.0, 0.0, 0.0, 0.0]),
    (2, [0.9, 0.1, 0.0, 0.0]),
    (3, [0.0, 0.0, 1.0, 0.0]),
    (4, [0.0, 0.0, 0.9, 0.1]),
    (5, [0.5, 0.5, 0.5, 0.5]),
]


@pytest.fixture(scope="module")
def emb(spark):
    return spark.createDataFrame(VECS, "vec_id long, embedding array<float>")


def test_cosine_similarity_expr(spark):
    df = spark.createDataFrame(
        [([1.0, 2.0], [2.0, 3.0])], "a array<float>, b array<float>"
    )
    got = df.select(cosine_similarity(F.col("a"), F.col("b")).alias("c")).collect()[0].c
    assert got == pytest.approx(0.9922778767136677)


def test_cosine_topk_exact(emb):
    res = similarity.cosine_topk(emb, emb.filter(F.col("vec_id") == 1), "vec_id", "embedding", k=2)
    rows = [(r.neighbor_id, r.rank) for r in res.orderBy("rank").collect()]
    assert rows == [(2, 1), (5, 2)]


def test_lsh_topk_subset_of_bruteforce(emb):
    brute = {
        (r.query_id, r.neighbor_id)
        for r in similarity.cosine_topk(emb, emb, "vec_id", "embedding", k=4).collect()
    }
    approx = similarity.lsh_topk(emb, emb, "vec_id", "embedding", k=4, nbits=4, tables=2, dim=4)
    rows = approx.collect()
    assert rows, "LSH returned nothing"
    assert {(r.query_id, r.neighbor_id) for r in rows} <= brute
    assert set(approx.columns) == {"query_id", "neighbor_id", "sim", "rank"}


def test_ivf_topk_scores_match_bruteforce(spark):
    """IVF on the real embeddings fixture: every retrieved (query,
    neighbor) pair carries exactly the brute-force cosine score, and
    probing 4 of 8 lists recalls most of the true top-5."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 5)
    brute = similarity.cosine_topk(emb, queries, "vec_id", "embedding", k=5, dim=64)
    ivf = similarity.ivf_topk(
        emb, queries, "vec_id", "embedding", k=5, n_centroids=8, nprobe=4, dim=64
    )
    truth = {(r.query_id, r.neighbor_id): r.sim for r in brute.collect()}
    got = {(r.query_id, r.neighbor_id): r.sim for r in ivf.collect()}
    # exact scores wherever retrieved
    all_scores = {
        (r.query_id, r.neighbor_id): r.sim
        for r in similarity.cosine_topk(
            emb, queries, "vec_id", "embedding", k=10**9, dim=64
        ).collect()
    }
    for pair, sim in got.items():
        assert sim == pytest.approx(all_scores[pair], abs=1e-6), pair
    # recall@5 over the 5 queries: probing half the lists should find
    # at least half the true neighbors
    recall = len(set(got) & set(truth)) / len(truth)
    assert recall >= 0.5, f"recall@5 = {recall}"


def test_embedding_near_dup_pairs(emb):
    pairs = {
        (r.id_a, r.id_b)
        for r in similarity.embedding_near_dup_pairs(emb, "vec_id", "embedding", 0.9).collect()
    }
    assert (1, 2) in pairs and (3, 4) in pairs
    assert (1, 3) not in pairs


def test_blocked_near_dup_equals_broadcast(spark):
    """The blocked-GEMM exact path must produce the identical pair set to
    the broadcast variant (it is the same computation, re-partitioned)."""
    from smalltsdb_spark.operators.similarity import (
        embedding_near_dup_pairs,
        embedding_near_dup_pairs_blocked,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    base = {
        (r.id_a, r.id_b): r.sim
        for r in embedding_near_dup_pairs(emb, "vec_id", "embedding", 0.4).collect()
    }
    for nb in (1, 3, 8, None):  # None = auto-sized
        blocked = {
            (r.id_a, r.id_b): r.sim
            for r in embedding_near_dup_pairs_blocked(
                emb, "vec_id", "embedding", 0.4, n_blocks=nb
            ).collect()
        }
        assert blocked == base, f"n_blocks={nb}"


def test_auto_blocks_bounds_task_memory_at_any_scale():
    """The auto-sizer's BLOCK SIZE (rows per task) must be corpus-size
    independent: per-task memory is 2·m·dim·8 (slices) + 8·m² (score
    grid), so a fixed block COUNT means per-task memory grows with the
    corpus — the scale-killer VERDICT r4 flagged.  Derived block count
    must instead grow linearly while every task stays inside the
    budget."""
    from smalltsdb_spark.operators.similarity import _auto_blocks

    budget = 512 << 20
    dim = 64

    def task_bytes(n_rows: int) -> float:
        nb = _auto_blocks(n_rows, dim, budget)
        m = math.ceil(n_rows / nb)
        return 2 * m * dim * 8 + 8 * m * m

    # 200k vectors was the documented ~5 GB/task OOM case at n_blocks=8;
    # check 100x beyond it
    for n in (10_000, 200_000, 2_000_000, 20_000_000):
        assert task_bytes(n) <= budget * 1.05, f"n={n}"
    # block count scales ~linearly (block size saturates at the budget)
    nb_small, nb_big = _auto_blocks(200_000, dim, budget), _auto_blocks(
        20_000_000, dim, budget
    )
    assert nb_big >= 50 * nb_small


def test_blocked_auto_sizing_is_lazy_with_size_hint(spark):
    """With size_hint=(n_rows, dim), AUTO block sizing must run NO eager
    job: building the plan over a corpus that EXPLODES on materialization
    must succeed (ADVICE r6 — the auto path previously ran count()+first()
    before the plan was built, two scans of an uncached corpus)."""
    from pyspark.sql import functions as F
    from smalltsdb_spark.operators import similarity

    @F.udf("array<double>")
    def boom():
        raise RuntimeError("corpus was materialized during plan build")

    corpus = spark.range(8).select(
        F.col("id").alias("vec_id"), boom().alias("embedding")
    )
    out = similarity.embedding_near_dup_pairs_blocked(
        corpus, "vec_id", "embedding", size_hint=(10_000_000, 64)
    )
    # plan built, schema resolved, no job ran
    assert [f.name for f in out.schema.fields] == ["id_a", "id_b", "sim"]

    # hinted sizing must agree with what the eager path would derive
    nb = similarity._auto_blocks(10_000_000, 64, similarity.BLOCKED_GEMM_TASK_MEM)
    assert nb > 1


def test_blocked_auto_sizing_scans_corpus_once_without_hint(spark):
    """Without the hint, AUTO is documented to cost exactly ONE eager
    scan of the corpus (count + sample dim fused into a single agg), not
    the two separate count()/first() scans ADVICE r6 flagged.  Pinned by
    an accumulator counting per-row UDF invocations — job count is not a
    stable proxy (AQE materializes each shuffle stage as its own job)."""
    from pyspark.sql import functions as F
    from smalltsdb_spark.operators import similarity

    sc = spark.sparkContext
    scans = sc.accumulator(0)

    @F.udf("double")
    def counted(x):
        scans.add(1)
        return float(x)

    n = 16
    emb = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.array(counted(F.col("id")), F.lit(1.0)).alias("embedding"),
    )
    similarity.embedding_near_dup_pairs_blocked(emb, "vec_id", "embedding")
    assert scans.value == n, f"auto sizing evaluated {scans.value} rows, want {n} (one scan)"


def test_empty_queries_yield_empty_results(spark):
    """Empty query sets must return empty DataFrames, not crash at build
    time (regression: _row_norms einsum on a 0-row stack raised)."""
    from smalltsdb_spark.operators import similarity

    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])], "vec_id long, embedding array<float>"
    )
    empty = corpus.filter("vec_id < 0")
    assert similarity.cosine_topk(corpus, empty, "vec_id", "embedding", k=2).count() == 0
    assert (
        similarity.lsh_topk(
            corpus, empty, "vec_id", "embedding", k=2, nbits=2, tables=1, dim=2
        ).count()
        == 0
    )
    assert (
        similarity.ivf_topk(
            corpus, empty, "vec_id", "embedding", k=2, n_centroids=2, nprobe=1
        ).count()
        == 0
    )


@pytest.mark.parametrize("nprobe", [4, 16])
def test_ivf_probe_distributed_equals_driver_probe(spark, nprobe):
    """The batch-scoring probe (queries stay a DataFrame) must be
    row-identical to the driver-side probe — at nprobe=4 (real pruning)
    and nprobe=n_centroids (exhaustive, == brute force)."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 8)
    C = similarity.ivf_train(emb, "vec_id", "embedding", n_centroids=16, seed=42)
    index = similarity.ivf_assign(emb, "vec_id", "embedding", C)
    driver = {
        tuple(r)
        for r in similarity.ivf_probe(
            index, C, queries, "vec_id", "embedding", k=5, nprobe=nprobe, dim=64
        ).collect()
    }
    dist = {
        tuple(r)
        for r in similarity.ivf_probe_distributed(
            index, C, queries, "vec_id", "embedding", k=5, nprobe=nprobe, dim=64
        ).collect()
    }
    assert len(driver) > 0
    assert dist == driver


def test_ivf_probe_distributed_no_driver_collect(spark):
    """The query side must reach the _list join as a PLAN (Arrow-batched
    centroid kernel + explode), not as driver-collected literals: the
    executed plan carries a Python eval node on the probe branch and no
    LocalTableScan of query rows."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 8)
    C = similarity.ivf_train(emb, "vec_id", "embedding", n_centroids=16, seed=42)
    index = similarity.ivf_assign(emb, "vec_id", "embedding", C)
    out = similarity.ivf_probe_distributed(
        index, C, queries, "vec_id", "embedding", k=5, nprobe=4, dim=64
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    # two Arrow kernels: corpus-side assign_info + query-side probe_info
    assert plan.count("ArrowEvalPython") >= 2
    assert "LocalTableScan" not in plan


def test_kmeans_fit_separates_obvious_clusters(spark):
    """Two tight blobs far apart; k=2 must put each blob in its own
    cluster regardless of which blob seeds which centroid, and the
    final assignment's dist2 must be small within blobs."""
    rows = []
    for i in range(10):
        rows.append((i, [10.0 + 0.01 * i, 0.0]))          # blob A
        rows.append((100 + i, [0.0, 10.0 + 0.01 * i]))    # blob B
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    C, assigned = similarity.kmeans_fit(df, "vec_id", "embedding", k=2, iters=3)
    got = {r.vec_id: r.cluster for r in assigned.collect()}
    blob_a = {got[i] for i in range(10)}
    blob_b = {got[100 + i] for i in range(10)}
    assert len(blob_a) == 1 and len(blob_b) == 1 and blob_a != blob_b
    assert C.shape == (2, 2)
    max_d2 = max(r.dist2 for r in assigned.collect())
    assert max_d2 < 0.01  # within-blob spread only


def test_kmeans_fit_empty_cluster_keeps_centroid(spark):
    """k exceeds the number of distinct points: surplus centroids keep
    their (initial) positions instead of NaN-ing the means."""
    df = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [0.0, 0.0]), (2, [5.0, 5.0])],
        "vec_id long, embedding array<float>",
    )
    C, assigned = similarity.kmeans_fit(df, "vec_id", "embedding", k=3, iters=2)
    assert C.shape == (3, 2)
    import numpy as np
    assert not np.isnan(C).any()
    assert assigned.count() == 3


def test_quantize_int8_round_trip_and_retrieval(spark):
    """Quantized vectors reconstruct within half a step per dim, and
    brute-force top-k over DEQUANTIZED vectors matches exact top-k on
    well-separated fixture data (the retrieval contract int8 must keep)."""
    import numpy as np
    from pyspark.sql import functions as F

    from smalltsdb_spark.operators.similarity import (
        cosine_topk,
        quantize_int8,
        quantization_error_profile,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    prof = quantization_error_profile(emb).collect()
    for r in prof:
        # half-step bound: scale/254 (+ slack for the 6-decimal rounding
        # both columns carry)
        assert r.max_abs_err <= r.scale / 254 + 1e-6, r

    q = quantize_int8(emb)
    deq = q.select(
        "vec_id",
        F.transform(
            F.zip_with("qvec", F.array_repeat("scale", 64), lambda a, s: a * s),
            lambda x: (x / 127.0).cast("float"),
        ).alias("embedding"),
    )
    queries = emb.limit(5)
    exact = {
        (r.query_id, r.rank): r.neighbor_id
        for r in cosine_topk(emb, queries, "vec_id", "embedding", k=3).collect()
    }
    quant = {
        (r.query_id, r.rank): r.neighbor_id
        for r in cosine_topk(deq, queries, "vec_id", "embedding", k=3).collect()
    }
    agree = sum(exact[k] == quant.get(k) for k in exact)
    assert agree >= 0.8 * len(exact), (agree, len(exact))


def test_pq_encode_codes_shape_and_range(spark):
    import numpy as np

    rng = np.random.RandomState(7)
    vecs = [(i, [float(x) for x in rng.randn(8)]) for i in range(40)]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    B = similarity.pq_train(df, "vec_id", "embedding", m=2, codes=4)
    assert B.shape == (2, 4, 4)
    rows = similarity.pq_encode(df, "vec_id", "embedding", B).collect()
    assert len(rows) == 40
    for r in rows:
        assert len(r.pq_codes) == 2
        assert all(0 <= c < 4 for c in r.pq_codes)


def test_pq_adc_lossless_when_corpus_is_the_codebook(spark):
    """With ≤``codes`` distinct prototypes per subspace, k-means++ never
    re-picks a taken point and Lloyd fixes each centroid at its
    prototype — encoding is LOSSLESS, so every ADC score must equal the
    exact inner product (the reconstruction-error term vanishes)."""
    import numpy as np

    rng = np.random.RandomState(3)
    protos = rng.randn(4, 8)  # 4 distinct prototypes, dim 8
    vecs = [(i, [float(x) for x in protos[i % 4]]) for i in range(24)]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    B = similarity.pq_train(df, "vec_id", "embedding", m=2, codes=4)
    index = similarity.pq_encode(df, "vec_id", "embedding", B)
    queries = df.filter(F.col("vec_id") < 2)
    got = similarity.pq_adc_topk(index, B, queries, "vec_id", "embedding", k=3)

    P = np.array([np.asarray(v, dtype=np.float64) for _, v in vecs])
    f32 = P.astype(np.float32).astype(np.float64)  # what parquet/Spark stores
    for r in got.collect():
        true_dot = float(np.dot(f32[r.query_id], f32[r.neighbor_id]))
        assert r.adc_dot == pytest.approx(true_dot, abs=2e-6)


def test_pq_adc_ranks_near_cluster_first(spark):
    """Clustered corpus: ADC retrieval must rank same-cluster vectors
    above cross-cluster ones even through 1-byte-per-subspace codes."""
    import numpy as np

    rng = np.random.RandomState(11)
    centers = np.array([[10.0] * 8, [-10.0] * 8])
    vecs = [
        (i, [float(x) for x in centers[i % 2] + rng.randn(8) * 0.1])
        for i in range(30)
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    B = similarity.pq_train(df, "vec_id", "embedding", m=4, codes=8)
    index = similarity.pq_encode(df, "vec_id", "embedding", B)
    got = similarity.pq_adc_topk(
        index, B, df.filter(F.col("vec_id") == 0), "vec_id", "embedding", k=5
    )
    neighbors = [r.neighbor_id for r in got.collect()]
    assert len(neighbors) == 5
    assert all(n % 2 == 0 for n in neighbors), neighbors


def test_ivf_pq_topk_ranks_near_cluster_first(spark):
    """IVF-PQ end-to-end on a well-separated corpus: the compact index
    carries no float column, probing stays inside nprobe lists, and the
    residual-coded ADC still ranks same-cluster vectors first."""
    import numpy as np

    rng = np.random.RandomState(5)
    centers = np.array([[8.0] * 8, [-8.0] * 8, [8.0, -8.0] * 4])
    vecs = [
        (i, [float(x) for x in centers[i % 3] + rng.randn(8) * 0.1])
        for i in range(36)
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    C = similarity.ivf_train(df, "vec_id", "embedding", n_centroids=3, seed=1)
    assigned = similarity.ivf_assign(df, "vec_id", "embedding", C)
    B = similarity.pq_train_residual(df, "vec_id", "embedding", C, m=2, codes=8)
    index = similarity.ivf_pq_encode(assigned, B, C)
    assert set(index.columns) == {"neighbor_id", "_list", "pq_codes"}

    got = similarity.ivf_pq_topk(
        index, C, B, df.filter(F.col("vec_id") == 0), "vec_id", "embedding",
        k=5, nprobe=1,
    )
    neighbors = [r.neighbor_id for r in got.collect()]
    assert len(neighbors) == 5
    assert all(n % 3 == 0 for n in neighbors), neighbors


def test_semantic_near_dup_pairs_finds_within_cluster_dups(emb):
    """SemDeDup composition: near-identical vectors land in the same
    k-means cluster and surface as within-cluster pairs; orthogonal
    vectors never pair."""
    got = {
        (r.id_a, r.id_b): (r.cluster, r.sim)
        for r in similarity.semantic_near_dup_pairs(
            emb, "vec_id", "embedding", n_clusters=2, threshold=0.9
        ).collect()
    }
    assert (1, 2) in got and (3, 4) in got
    assert (1, 3) not in got and (2, 3) not in got
    # pair members share the cluster by construction; scores are cosine
    assert all(0.9 <= sim <= 1.0 for _, sim in got.values())


def test_semantic_near_dup_single_cluster_shuffle_no_broadcast(spark):
    """SemDeDup's pair stage shuffles the corpus ONCE keyed by cluster
    (spread + assignment + the groupBy exchange) and never broadcasts
    corpus-sized data — the property that makes it the scale path vs
    all-pairs."""
    from smalltsdb_spark.plans import exchange_count, physical_plan

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    df = similarity.semantic_near_dup_pairs(
        emb, "vec_id", "embedding", n_clusters=4, threshold=0.4
    )
    # spread repartition + cluster groupBy exchange; nothing else
    assert exchange_count(df) <= 2
    plan = physical_plan(df)
    assert "BroadcastExchange" not in plan
    assert "FlatMapGroupsInPandas" in plan  # the per-cluster GEMM stage


# ---------------------------------------------------------------------------
# distributed PCA
# ---------------------------------------------------------------------------


def test_pca_matches_numpy(spark):
    """Distributed sufficient-statistics PCA equals a single-node numpy
    PCA on the collected data: same eigenvalues, same subspace (columns
    equal up to sign), projections carry the eigenvalue variances."""
    import numpy as np

    rng = np.random.default_rng(7)
    # anisotropic 6-dim cloud with a known strong direction
    X = rng.normal(size=(400, 6)) * np.array([5.0, 3.0, 1.0, 0.5, 0.2, 0.1])
    df = spark.createDataFrame(
        [(i, row.tolist()) for i, row in enumerate(X)],
        "vec_id long, embedding array<float>",
    ).repartition(8)
    X32 = X.astype(np.float32).astype(np.float64)  # what Spark stored

    mean, W, eig = similarity.pca_fit(df, "vec_id", "embedding")
    assert mean == pytest.approx(X32.mean(axis=0), abs=1e-9)
    cov = np.cov(X32.T, bias=True)
    w_ref, v_ref = np.linalg.eigh(cov)
    assert eig == pytest.approx(w_ref[::-1], rel=1e-9, abs=1e-9)
    # same principal axes up to per-column sign
    v_ref = v_ref[:, ::-1]
    for j in range(6):
        assert min(
            float(np.abs(W[:, j] - v_ref[:, j]).max()),
            float(np.abs(W[:, j] + v_ref[:, j]).max()),
        ) < 1e-8

    proj = similarity.pca_project(df, "vec_id", "embedding", mean, W, k=2)
    P = np.array(
        [r.proj for r in proj.orderBy("vec_id").collect()]
    )
    # projected variance per component == top eigenvalues
    assert P.var(axis=0, ddof=0) == pytest.approx(eig[:2], rel=1e-9)

    # reconstruction error decreases with k, and k=dim is ~zero
    errs = [
        similarity.pca_reconstruction_error(df, "embedding", mean, W, k)
        for k in (1, 3, 6)
    ]
    assert errs[0] >= errs[1] >= errs[2]
    assert errs[2] < 1e-9


def test_pca_empty_corpus_raises(spark):
    df = spark.createDataFrame([], "vec_id long, embedding array<float>")
    with pytest.raises(ValueError):
        similarity.pca_fit(df, "vec_id", "embedding")


def test_semantic_incremental_toy_semantics(spark, emb):
    """Incremental SemDeDup one-sided contract: pairs involving the new
    batch are reported exactly once (new-vs-corpus and new-vs-new), and
    corpus-only pairs — even genuine near-dups — are NOT re-reported
    (the rewrite pipeline's job, same contract as the minhash
    incremental)."""
    batch = spark.createDataFrame(
        [
            (10, [0.95, 0.05, 0.0, 0.0]),   # near corpus v1/v2
            (11, [0.94, 0.06, 0.0, 0.0]),   # near 10 (new-vs-new)
            (12, [0.0, 1.0, 0.0, 0.0]),     # near nothing at 0.9
        ],
        "vec_id long, embedding array<float>",
    )
    C = similarity.ivf_train(emb, "vec_id", "embedding", n_centroids=2, seed=1)
    index = similarity.ivf_assign(emb, "vec_id", "embedding", C)
    got = {
        (r.id_a, r.id_b)
        for r in similarity.semantic_near_dup_pairs_incremental(
            batch, index, C, "vec_id", "embedding", threshold=0.9
        ).collect()
    }
    assert (1, 10) in got and (2, 10) in got      # new-vs-corpus
    assert (10, 11) in got                        # new-vs-new, once
    assert (1, 2) not in got                      # corpus-only: not ours
    assert not any(12 in p for p in got)


def test_semantic_incremental_equals_frozen_full_restricted(spark):
    """The oracle identity the dedup_semantic_incremental driver row
    checks, pinned differentially in-library: incremental(batch |
    ivf_assign(corpus), C) == semantic_near_dup_pairs(corpus ∪ batch,
    centroids=C) restricted to pairs touching the batch."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    batch = emb.filter(F.col("vec_id") % 5 == 0)
    corpus = emb.filter(F.col("vec_id") % 5 != 0)
    C = similarity.ivf_train(
        corpus, "vec_id", "embedding", n_centroids=8, seed=7
    )
    index = similarity.ivf_assign(corpus, "vec_id", "embedding", C)
    inc = {
        (r.cluster, r.id_a, r.id_b, r.sim)
        for r in similarity.semantic_near_dup_pairs_incremental(
            batch, index, C, "vec_id", "embedding", threshold=0.3
        ).collect()
    }
    full = {
        (r.cluster, r.id_a, r.id_b, r.sim)
        for r in similarity.semantic_near_dup_pairs(
            emb, "vec_id", "embedding", threshold=0.3, centroids=C
        ).collect()
        if r.id_a % 5 == 0 or r.id_b % 5 == 0
    }
    assert inc == full
    assert inc, "fixture yields no batch-touching pairs — weak test"


def test_semantic_index_append_two_batch_differential(spark, tmp_path):
    """VERDICT r11 item 5 — the index-advance half of incremental
    SemDeDup: the corpus index is PERSISTED partitioned by _list,
    batch 1 is probed against it and APPENDED, and batch 2's probe must
    then see batch 1's vectors as corpus — incremental(b2 | index) ==
    frozen-centroid full recompute over corpus ∪ b1 ∪ b2 restricted to
    b2-touching pairs.  Round-tripping through parquet must not change
    the index schema the probe consumes (partition-column type
    restored by semantic_index_load)."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    corpus = emb.filter(F.col("vec_id") % 5 > 1)
    b1 = emb.filter(F.col("vec_id") % 5 == 0)
    b2 = emb.filter(F.col("vec_id") % 5 == 1)
    C = similarity.ivf_train(
        corpus, "vec_id", "embedding", n_centroids=8, seed=7
    )
    index_path = str(tmp_path / "sem_index")
    # seed the index with the corpus, then advance it by batch 1
    similarity.semantic_index_append(corpus, index_path, C, "vec_id", "embedding")
    similarity.semantic_index_append(b1, index_path, C, "vec_id", "embedding")
    idx = similarity.semantic_index_load(spark, index_path)
    # the loaded index holds exactly corpus ∪ b1, one row per vector
    assert idx.count() == corpus.count() + b1.count()
    inc = {
        (r.cluster, r.id_a, r.id_b, r.sim)
        for r in similarity.semantic_near_dup_pairs_incremental(
            b2, idx, C, "vec_id", "embedding", threshold=0.3
        ).collect()
    }
    full = {
        (r.cluster, r.id_a, r.id_b, r.sim)
        for r in similarity.semantic_near_dup_pairs(
            emb, "vec_id", "embedding", threshold=0.3, centroids=C
        ).collect()
        if r.id_a % 5 == 1 or r.id_b % 5 == 1
    }
    assert inc == full
    assert inc, "fixture yields no b2-touching pairs — weak test"
    # b2 must see at least one pair against a BATCH-1 vector — the
    # property the append half exists for
    assert any(a % 5 == 0 or b % 5 == 0 for _, a, b, _s in inc), (
        "no pair against batch 1 — the advanced index was not probed"
    )


def test_semantic_index_refuses_manifest_managed_dirs(spark, tmp_path):
    """VERDICT r12 item 2: a batch-versioned manifest-managed index
    (streaming/semantic_dedup.py) keeps superseded replay attempts live
    on disk inside their grace window, so directory-reading it silently
    double-counts and directory-appending writes files no manifest
    references.  Both batch helpers must refuse with a pointer to
    read_semantic_index."""
    import numpy as np

    from smalltsdb_spark import manifests

    index_path = str(tmp_path / "stream_idx")
    manifests.write_version(index_path, 0, {})
    C = np.eye(2)
    vecs = spark.createDataFrame(
        [(1, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="read_semantic_index"):
        similarity.semantic_index_load(spark, index_path)
    with pytest.raises(ValueError, match="read_semantic_index"):
        similarity.semantic_index_append(
            vecs, index_path, C, "vec_id", "embedding"
        )
    # a plain (non-manifest) index still loads/appends fine
    plain = str(tmp_path / "plain_idx")
    similarity.semantic_index_append(vecs, plain, C, "vec_id", "embedding")
    assert similarity.semantic_index_load(spark, plain).count() == 1


def test_semantic_incremental_sharing_hooks_identical(spark):
    """The r15 sharing hooks: a precomputed ``assigned_new`` and a
    pre-restricted corpus with ``corpus_prefiltered=True`` (what the
    streaming handler passes) must produce the identical pair set to
    the self-contained form."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    batch = emb.filter(F.col("vec_id") % 5 == 0)
    corpus = emb.filter(F.col("vec_id") % 5 != 0)
    C = similarity.ivf_train(corpus, "vec_id", "embedding", n_centroids=8, seed=7)
    index = similarity.ivf_assign(corpus, "vec_id", "embedding", C)
    plain = {
        (r.cluster, r.id_a, r.id_b, r.sim)
        for r in similarity.semantic_near_dup_pairs_incremental(
            batch, index, C, "vec_id", "embedding", threshold=0.3
        ).collect()
    }
    assigned = similarity.ivf_assign(batch, "vec_id", "embedding", C)
    touched = [r._list for r in assigned.select("_list").distinct().collect()]
    restricted = index.filter(F.col("_list").isin(touched))
    hooked = {
        (r.cluster, r.id_a, r.id_b, r.sim)
        for r in similarity.semantic_near_dup_pairs_incremental(
            batch, restricted, C, "vec_id", "embedding", threshold=0.3,
            assigned_new=assigned, corpus_prefiltered=True,
        ).collect()
    }
    assert hooked == plain
    assert plain, "fixture yields no pairs — weak test"
