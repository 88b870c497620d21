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


# ---------------------------------------------------------------- packing

SF_DIR = "/root/testdata/sf0.001"


def _doc_tokens(spark):
    from smalltsdb_spark.functions import tokens

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    return docs.select(
        "doc_id", "lang", F.size(tokens("text")).cast("long").alias("n_tokens")
    )


def test_pack_sharded_equals_per_shard_packing(spark):
    """Sharded-stratum packing must equal single-stratum packing applied
    to each shard's subset independently — sharding is pure parallelism,
    not a semantics change."""
    from smalltsdb_spark.operators.packing import add_shard, pack_sequences

    t = add_shard(_doc_tokens(spark), "doc_id", 4)
    sharded = {
        (r.doc_id): (r.lang, r.shard, r.n_tokens, r.chunk_id)
        for r in pack_sequences(
            t, "doc_id", "n_tokens", 512, ["lang", "shard"]
        ).collect()
    }
    assert len(sharded) > 0
    for shard in range(4):
        sub = pack_sequences(
            t.filter(F.col("shard") == shard).drop("shard"),
            "doc_id",
            "n_tokens",
            512,
            ["lang"],
        )
        for r in sub.collect():
            assert sharded[r.doc_id] == (r.lang, shard, r.n_tokens, r.chunk_id)


@pytest.mark.parametrize("strata", [["lang"], ["lang", "shard"]])
def test_pack_budget_preserved(spark, strata):
    """Independent oracle: an imperative Python packer over the same
    per-stratum document order must produce identical chunk ids — every
    doc starts in the chunk where its first token lands, in both
    modes."""
    from smalltsdb_spark.operators.packing import add_shard, pack_sequences

    budget = 512
    t = add_shard(_doc_tokens(spark), "doc_id", 4)
    out = pack_sequences(t, "doc_id", "n_tokens", budget, strata).collect()
    assert len(out) > 0
    by_stratum = {}
    for r in out:
        key = tuple(r[c] for c in strata)
        by_stratum.setdefault(key, []).append(r)
    for rows in by_stratum.values():
        rows.sort(key=lambda r: r.doc_id)
        before = 0
        for r in rows:
            assert r.chunk_id == before // budget, r
            before += r.n_tokens


def test_pack_sharded_window_partition_count(spark):
    """The 100 TB property: sharding multiplies independent window
    partitions (#langs x #shards timelines instead of #langs)."""
    from smalltsdb_spark.operators.packing import add_shard, pack_sequences

    t = add_shard(_doc_tokens(spark), "doc_id", 8)
    out = pack_sequences(t, "doc_id", "n_tokens", 512, ["lang", "shard"])
    n_strata = out.select("lang", "shard").distinct().count()
    n_langs = out.select("lang").distinct().count()
    assert n_strata >= 4 * n_langs  # >= 4 shards materialized per lang
    # and the physical window partitions on BOTH columns (the shard key
    # actually reaches the exchange — it isn't optimized away)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" in plan
    assert "shard" in plan.split("Window")[1].split("\\n")[0] or "shard" in plan


def test_leakage_safe_split_invariant(spark):
    """No near-dup pair straddles a split boundary: both endpoints of
    every LSH edge inherit the same component-keyed split."""
    from smalltsdb_spark import queries_ext
    from smalltsdb_spark.operators import components, dedup

    sf = "/root/testdata/sf0.001"
    split = queries_ext.ext_split_leakage_safe(spark, sf)
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    pairs = dedup.minhash_lsh_pairs(
        docs, "doc_id", "text", k=16, bands=4, threshold=0.5
    )
    by_id = {r.id: r.split for r in split.collect()}
    edges = pairs.select("id_a", "id_b").collect()
    assert len(edges) > 0
    for e in edges:
        assert by_id[e.id_a] == by_id[e.id_b], (e.id_a, e.id_b)
