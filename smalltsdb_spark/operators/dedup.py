"""Deduplication operators for large-scale training-data pipelines.

Five families, all expressed as shuffled-once DataFrame plans (no Python in
the hot path) and designed so the candidate-generation step — never the
all-pairs cross product — dominates cost:

- **exact**: md5 content hash → groupBy.  One shuffle on the hash; at
  100 TB the hash groupBy is the only viable exact method (no sort of raw
  text).
- **n-gram Jaccard**: inverted-index join on shared n-grams (only pairs
  sharing at least one gram are ever materialized), then exact Jaccard
  from gram-set sizes.  Skew note: stop-gram-like shingles fan out
  quadratically; ``max_gram_freq`` drops grams appearing in more than N
  docs (standard df-cut), bounding the join fan-out.
- **MinHash + LSH**: k minhashes per doc computed with ONE explode +
  groupBy (k min-aggregates, map-side combined), banded into b bands →
  candidates join only within equal band keys.  Error vs exact Jaccard is
  the standard 1/sqrt(k).
- **SimHash**: 60-bit signature via per-bit weighted sums (60 conditional
  sums in one groupBy), near-dup = equal 15-bit chunk (banding) +
  Hamming-distance verify via xor/bit_count.
- **embedding cosine**: see operators/similarity.py; near-dup threshold
  join via the same candidate machinery.

All hash values that reach checked results use functions.md5_long so the
DuckDB oracle reproduces them exactly.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from smalltsdb_spark.functions import (
    md5_long,
    minhash_params,
    tokens,
    universal_hash,
    word_ngrams,
)
from smalltsdb_spark.operators import spread

SIMHASH_BITS = 60


def exact_duplicates(df: DataFrame, id_col: str, content_col: str) -> DataFrame:
    """Per-row exact-duplicate labeling by content hash.

    Returns (id, content_hash, dup_rank, is_dup): dup_rank=1 marks the
    canonical row to keep (lowest id); is_dup marks rows to drop.
    """
    w = Window.partitionBy("content_hash").orderBy(id_col)
    return (
        spread(df)
        .select(F.col(id_col), F.md5(F.col(content_col)).alias("content_hash"))
        .withColumn("dup_rank", F.row_number().over(w))
        .withColumn("is_dup", F.col("dup_rank") > 1)
    )


def doc_grams(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """(id, gram) exploded distinct word n-grams per document.

    Input is spread first: tokenize+explode is the per-row-expensive step
    of every gram-based method, and single-file fixtures otherwise run it
    on one core (operators.spread docstring has the numbers)."""
    return spread(df).select(
        F.col(id_col).alias("doc"),
        F.explode(F.array_distinct(word_ngrams(tokens(text_col), n))).alias("gram"),
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 2,
    threshold: float = 0.15,
    max_gram_freq: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for all pairs sharing >= 1 gram.

    Inverted-index candidate generation over ONE shuffle of the gram
    relation: window-count per gram applies the df-cut in place (no
    count→join-back, which would recompute the tokenize+explode subtree
    for every consumer), then ``collect_list(doc)`` per gram REUSES the
    window's gram partitioning (no second exchange) and ordered doc pairs
    explode from each posting list.  The pair explosion is bounded by the
    df-cut (``max_gram_freq`` docs per gram ⇒ ≤ f(f−1)/2 pairs per gram),
    so no skewed stop-gram can blow up a task — the cut happens BEFORE
    the quadratic step.  Jaccard = inter / (|A| + |B| − inter).
    """
    grams = doc_grams(df, id_col, text_col, n)
    if max_gram_freq is not None:
        w = Window.partitionBy("gram")
        kept = grams.withColumn("_df", F.count("*").over(w)).filter(
            F.col("_df") <= max_gram_freq
        )
    else:
        kept = grams
    # posting list per gram; cached because it feeds both the per-doc
    # sizes and the pair explosion (each posting list ≤ max_gram_freq ids,
    # orders of magnitude smaller than the raw gram relation)
    bygram = kept.groupBy("gram").agg(F.collect_list("doc").alias("docs")).cache()
    sizes = (
        bygram.select(F.explode("docs").alias("doc"))
        .groupBy("doc")
        .agg(F.count("*").alias("sz"))
    )
    # ordered (x, y) pairs from each posting list, value-compared so the
    # nondeterministic collect_list order never matters
    pair_structs = F.flatten(
        F.transform(
            F.col("docs"),
            lambda x: F.transform(
                F.filter(F.col("docs"), lambda y: y > x),
                lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
            ),
        )
    )
    pairs = (
        bygram.select(F.explode(pair_structs).alias("p"))
        .select("p.id_a", "p.id_b")
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("inter"))
    )
    return (
        pairs.join(
            F.broadcast(sizes.select(F.col("doc").alias("id_a"), F.col("sz").alias("sz_a"))),
            "id_a",
        )
        .join(
            F.broadcast(sizes.select(F.col("doc").alias("id_b"), F.col("sz").alias("sz_b"))),
            "id_b",
        )
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")), 6
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, k: int = 16, n: int = 2
) -> DataFrame:
    """k-minhash signature per document as columns h0..h{k-1}.

    One explode + one groupBy with k min-aggregates; the k hash functions
    are universal hashes ``(a_i·md5(gram) + b_i) mod p`` derived from ONE
    md5 per gram (k salted md5s would cost k× the hashing).  Map-side
    partial min keeps shuffle volume at k longs per doc regardless of
    document size.
    """
    grams = doc_grams(df, id_col, text_col, n).withColumn(
        "_base", md5_long(F.col("gram"))
    )
    aggs = [
        F.min(universal_hash(F.col("_base"), a, b)).alias(f"h{i}")
        for i, (a, b) in enumerate(minhash_params(k))
    ]
    return grams.groupBy("doc").agg(*aggs)


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 16,
    bands: int = 4,
    n: int = 2,
    threshold: float = 0.5,
) -> DataFrame:
    """Candidate pairs from banded minhash, scored by signature agreement.

    Two docs are candidates iff at least one band (k/bands consecutive
    minhashes) matches exactly; est_jaccard = fraction of the k minhashes
    that agree.  Returns (id_a, id_b, est_jaccard >= threshold).
    """
    assert k % bands == 0
    r = k // bands
    sig = minhash_signatures(df, id_col, text_col, k, n)

    # one (doc, sig[], band_idx, band_key) row per band via a single
    # explode — no b-way union re-scan; the full signature RIDES the band
    # row (k longs) so scoring needs no join back to the signature table
    sig_arr = sig.select(
        "doc", F.array(*[F.col(f"h{i}") for i in range(k)]).alias("sig")
    )
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_idx"),
                F.concat_ws(
                    "_", *[F.col("sig")[b * r + j].cast("string") for j in range(r)]
                ).alias("band_key"),
            )
            for b in range(bands)
        ]
    )
    stacked = sig_arr.select(
        "doc", "sig", F.explode(band_structs).alias("bk")
    ).select("doc", "sig", "bk.band_idx", "bk.band_key")
    # posting list per band bucket → ordered in-list pairs (same shape as
    # ngram_jaccard_pairs): ONE shuffle on the band key replaces the
    # band-key self-join plus two signature re-joins.  A pair surviving in
    # several bands dedups via distinct (est_jaccard is a pure function of
    # the pair, so the triple is distinct-safe).
    bucket = stacked.groupBy("band_idx", "band_key").agg(
        F.collect_list(F.struct("doc", "sig")).alias("ds")
    )
    pair_structs = F.flatten(
        F.transform(
            F.col("ds"),
            lambda x: F.transform(
                F.filter(F.col("ds"), lambda y: y["doc"] > x["doc"]),
                lambda y: F.struct(
                    x["doc"].alias("id_a"),
                    y["doc"].alias("id_b"),
                    F.size(
                        F.filter(
                            F.zip_with(x["sig"], y["sig"], lambda u, v: u == v),
                            lambda m: m,
                        )
                    ).alias("agree"),
                ),
            ),
        )
    )
    return (
        bucket.select(F.explode(pair_structs).alias("p"))
        .select(
            F.col("p.id_a").alias("id_a"),
            F.col("p.id_b").alias("id_b"),
            F.round(F.col("p.agree") / F.lit(float(k)), 6).alias("est_jaccard"),
        )
        .filter(F.col("est_jaccard") >= threshold)
        .distinct()
    )


def simhash(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """60-bit SimHash per document from token-frequency-weighted bit votes.

    explode tokens (keeping multiplicity as the weight) → one groupBy with
    60 conditional sums (bit i of the token hash votes +1/-1) → assemble
    the signature long.  Ties (vote sum 0) resolve to bit 0.
    """
    # hash materialized as a column BEFORE the aggregation: referencing
    # md5_long(t) inside all 60 sum expressions relies on codegen CSE to
    # avoid 60 md5s per token — hoisting guarantees exactly one
    ex = spread(df).select(
        F.col(id_col).alias("doc"), F.explode(tokens(text_col)).alias("t")
    ).select("doc", md5_long(F.col("t")).alias("_h"))
    h = F.col("_h")
    votes = [
        F.sum(
            F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{i}")
        for i in range(SIMHASH_BITS)
    ]
    g = ex.groupBy("doc").agg(*votes)
    sig: Column = reduce(
        lambda acc, i: acc
        + F.when(F.col(f"b{i}") > 0, F.lit(1 << i)).otherwise(F.lit(0)),
        range(SIMHASH_BITS),
        F.lit(0).cast("long"),
    )
    return g.select("doc", sig.alias("simhash"))


def simhash_near_pairs(
    df: DataFrame, id_col: str, text_col: str, max_hamming: int = 12
) -> DataFrame:
    """Near-dup pairs by SimHash: band on 15-bit quarters (a pair within
    Hamming distance <= 3 of 60 bits must agree on >= 1 quarter; wider
    distances trade recall), verify with exact xor/bit_count."""
    sig = simhash(df, id_col, text_col)
    # one (doc, simhash, q, chunk) row per 15-bit quarter via a single
    # explode (no 4-way union re-scan), then posting lists per (q, chunk)
    # bucket: ONE shuffle on the chunk key replaces the chunk-key
    # self-join, and the signature rides the row so the Hamming verify
    # needs no join back
    quarter_structs = F.array(
        *[
            F.struct(
                F.lit(q).alias("q"),
                F.shiftright("simhash", q * 15)
                .bitwiseAND(F.lit((1 << 15) - 1))
                .alias("chunk"),
            )
            for q in range(4)
        ]
    )
    chunks = sig.select(
        "doc", "simhash", F.explode(quarter_structs).alias("qc")
    ).select("doc", "simhash", "qc.q", "qc.chunk")
    bucket = chunks.groupBy("q", "chunk").agg(
        F.collect_list(F.struct("doc", "simhash")).alias("ds")
    )
    pair_structs = F.flatten(
        F.transform(
            F.col("ds"),
            lambda x: F.transform(
                F.filter(F.col("ds"), lambda y: y["doc"] > x["doc"]),
                lambda y: F.struct(
                    x["doc"].alias("id_a"),
                    y["doc"].alias("id_b"),
                    # long, matching the oracle's CAST(bit_count(...) AS BIGINT)
                    F.bit_count(x["simhash"].bitwiseXOR(y["simhash"]))
                    .cast("long")
                    .alias("hamming"),
                ),
            ),
        )
    )
    return (
        bucket.select(F.explode(pair_structs).alias("p"))
        .select("p.id_a", "p.id_b", "p.hamming")
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )
