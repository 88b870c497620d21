"""stratified_sample: the hot-strata hash-threshold variant must be
EXACTLY the window formulation's result, including ranks — the point of
the design is that the physical strategy changes and the answer doesn't."""

import pytest
from pyspark.sql import functions as F

from smalltsdb_spark.queries_ext import stratified_sample


def _rows(df):
    return {(r[0], r[1], r[2]) for r in df.collect()}


def _docs(spark, spec):
    """spec: {stratum: n_rows} with globally unique ids."""
    rows, next_id = [], 0
    for stratum, n in spec.items():
        for _ in range(n):
            rows.append((next_id, stratum))
            next_id += 1
    return spark.createDataFrame(rows, "doc_id long, lang string")


@pytest.mark.parametrize(
    "spec,k",
    [
        ({"en": 500, "fr": 40, "de": 3}, 20),  # hot + small + k>n strata
        ({"en": 1000}, 5),                     # single hot stratum
        ({"a": 1, "b": 1, "c": 1}, 10),        # all strata smaller than k
        ({"en": 997, "zh": 61}, 50),
    ],
)
def test_hot_strata_equals_window(spark, spec, k):
    docs = _docs(spark, spec)
    base = stratified_sample(docs, "lang", "doc_id", k)
    hot = stratified_sample(docs, "lang", "doc_id", k, hot_strata=True)
    assert _rows(hot) == _rows(base)


def test_hot_strata_shortfall_fallback(spark):
    """slack ~ 0 forces the prefix filter to pass (almost) nothing, so
    every stratum takes the exact-fallback path — including the
    zero-survivor case — and the result must still be exact."""
    docs = _docs(spark, {"en": 300, "fr": 7})
    base = stratified_sample(docs, "lang", "doc_id", 10)
    hot = stratified_sample(
        docs, "lang", "doc_id", 10, hot_strata=True, slack=1e-9
    )
    assert _rows(hot) == _rows(base)


def test_hot_strata_on_documents_table(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    base = stratified_sample(docs, "lang", "doc_id", 20)
    hot = stratified_sample(docs, "lang", "doc_id", 20, hot_strata=True)
    assert _rows(hot) == _rows(base)
    # every stratum filled to min(k, n)
    per = (
        hot.groupBy("lang").agg(F.count("*").alias("c"))
        .join(docs.groupBy("lang").agg(F.count("*").alias("n")), "lang")
        .collect()
    )
    assert all(r.c == min(20, r.n) for r in per)
