"""Connected components / dedup clustering (operators/components.py)."""

import pytest
from pyspark.sql import functions as F

from smalltsdb_spark.operators.components import (
    connected_components,
    dedup_cluster_labels,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "id_a long, id_b long")


def _result(df):
    return {(r.id, r.component) for r in df.collect()}


def test_two_components(spark):
    e = _edges(spark, [(1, 2), (2, 3), (10, 11)])
    assert _result(connected_components(e)) == {
        (1, 1), (2, 1), (3, 1), (10, 10), (11, 10),
    }


def test_long_chain_converges(spark):
    # path graph 0-1-2-...-19: diameter 19, pointer jumping must close it
    # well inside the round cap
    n = 20
    e = _edges(spark, [(i, i + 1) for i in range(n - 1)])
    assert _result(connected_components(e)) == {(i, 0) for i in range(n)}


def test_edge_direction_irrelevant(spark):
    a = connected_components(_edges(spark, [(5, 1), (2, 5)]))
    b = connected_components(_edges(spark, [(1, 5), (5, 2)]))
    assert _result(a) == _result(b) == {(1, 1), (2, 1), (5, 1)}


def test_cycle(spark):
    e = _edges(spark, [(1, 2), (2, 3), (3, 1)])
    assert _result(connected_components(e)) == {(1, 1), (2, 1), (3, 1)}


def test_empty_edges(spark):
    e = _edges(spark, [])
    assert connected_components(e).count() == 0


def test_string_ids(spark):
    e = spark.createDataFrame(
        [("b", "c"), ("a", "b")], "id_a string, id_b string"
    )
    assert _result(connected_components(e)) == {("a", "a"), ("b", "a"), ("c", "a")}


def test_cluster_labels_singletons_and_keep(spark):
    docs = spark.createDataFrame([(i,) for i in range(6)], "doc_id long")
    pairs = _edges(spark, [(0, 1), (1, 2), (4, 5)])
    rows = {
        (r.id, r.component, r.keep)
        for r in dedup_cluster_labels(docs, "doc_id", pairs).collect()
    }
    assert rows == {
        (0, 0, True), (1, 0, False), (2, 0, False),
        (3, 3, True),                      # singleton keeps itself
        (4, 4, True), (5, 4, False),
    }
    # exactly one keeper per component
    keep_per_comp = (
        dedup_cluster_labels(docs, "doc_id", pairs)
        .groupBy("component")
        .agg(F.sum(F.col("keep").cast("int")).alias("k"))
        .collect()
    )
    assert all(r.k == 1 for r in keep_per_comp)


def test_no_residual_blocks_after_run(spark):
    """The iterative loop's localCheckpoint blocks must ALL be released by
    return time: a long-lived session (the bench runs 50+ queries in one
    SparkSession) must not accumulate pinned storage from clustering."""
    from smalltsdb_spark.operators.components import _persistent_rdd_ids

    sc = spark.sparkContext
    before = _persistent_rdd_ids(sc)
    e = _edges(spark, [(1, 2), (2, 3), (10, 11), (11, 12)])
    df = connected_components(e)
    assert df.count() == 6  # result is readable after the blocks are gone
    assert _persistent_rdd_ids(sc) - before == set()


def test_no_fixpoint_raises(spark):
    e = _edges(spark, [(i, i + 1) for i in range(9)])
    with pytest.raises(RuntimeError, match="no fixpoint"):
        connected_components(e, max_rounds=1)
