"""Unit tests for similarity search operators."""

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


def test_embedding_near_dup_pairs(emb):
    pairs = {
        (r.id_a, r.id_b)
        for r in similarity.embedding_near_dup_pairs(emb, "vec_id", "embedding", 0.9).collect()
    }
    assert (1, 2) in pairs and (3, 4) in pairs
    assert (1, 3) not in pairs
