"""Deduplication operators for large-scale training-data pipelines.

Five families, all expressed as shuffled-once DataFrame plans (no Python in
the hot path) and designed so the candidate-generation step — never the
all-pairs cross product — dominates cost:

- **exact**: md5 content hash → groupBy.  One shuffle on the hash; at
  100 TB the hash groupBy is the only viable exact method (no sort of raw
  text).
- **n-gram Jaccard**: inverted-index candidate generation on shared
  n-grams (only pairs sharing at least one gram are ever materialized),
  then exact Jaccard from gram-set sizes that RIDE the posting-list
  structs — no join back to any per-document relation, broadcast or
  otherwise.  Skew note: stop-gram-like shingles fan out quadratically;
  ``max_gram_freq`` drops grams appearing in more than N docs (standard
  df-cut, on by default), bounding the fan-out.

Degenerate-bucket safety (all three gram/band/chunk methods): a bucket's
pairs are normally enumerated in-row from its collected posting list,
which is the fast path but concentrates f(f-1)/2 pair structs in one row.
Buckets larger than ``bucket_cap`` members therefore fall back to a
shuffle-merge self-join on the bucket key — the quadratic output is then
distributed across tasks instead of materialized in one array, so a
degenerate corpus (millions of identical signatures) degrades to the
classic distributed pair join instead of a single-row executor OOM or the
2^31 array-element limit.  Both branches read the same window-annotated
relation, so the bucket-key exchange below them is planned once and
reused (ReusedExchange).
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

#: per-bucket membership cap for the in-row pair-explosion fast path; a
#: 512-member bucket explodes to ~131k pair structs (~4 MB) in one row,
#: which is the most a single task should ever hold.  Bigger buckets take
#: the distributed self-join fallback.
DEFAULT_BUCKET_CAP = 512


def _bucket_pairs(
    rows: DataFrame,
    keys: list[str],
    id_field: str,
    cap: int,
    count_col: str | None = None,
) -> DataFrame:
    """All unordered pairs of payload structs sharing a bucket key.

    ``rows`` is ``(*keys, v: struct)`` where ``v.<id_field>`` orders pairs
    (``a.<id_field> < b.<id_field>``); returns ``(a, b)`` struct columns,
    one row per (bucket, pair) incidence — callers aggregate or distinct
    across buckets as their semantics require.

    Two physical strategies, routed by bucket membership count (computed
    with a window over the bucket key unless the caller already has it in
    ``count_col``):

    - ``<= cap``: ``collect_list`` the bucket into one row and explode the
      f(f-1)/2 ordered pairs in-row — one shuffle, no join, the fast path
      for the (overwhelmingly common) small buckets;
    - ``> cap``: shuffle-merge self-join on the bucket key, so a
      degenerate bucket's quadratic output is spread across tasks instead
      of concentrated in one array (executor OOM / 2^31 element limit).
      The merge hint keeps Catalyst's size estimator from ever electing a
      broadcast build side derived from the corpus — the exact
      at-scale failure mode this routing exists to prevent.

    Both branches filter the same window-annotated relation, so the
    bucket-key exchange they share is planned once (ReusedExchange) and
    the upstream (tokenize/signature) subtree runs once.
    """
    if count_col is None:
        w = Window.partitionBy(*keys)
        rows = rows.withColumn("_cnt", F.count("*").over(w))
        count_col = "_cnt"
    small = (
        rows.filter(F.col(count_col) <= cap)
        .groupBy(*keys)
        .agg(F.collect_list("v").alias("vs"))
    )
    pair_structs = F.flatten(
        F.transform(
            F.col("vs"),
            lambda x: F.transform(
                F.filter(F.col("vs"), lambda y: y[id_field] > x[id_field]),
                lambda y: F.struct(x.alias("a"), y.alias("b")),
            ),
        )
    )
    small_pairs = small.select(F.explode(pair_structs).alias("p")).select(
        "p.a", "p.b"
    )
    big = rows.filter(F.col(count_col) > cap)
    cond = reduce(
        lambda acc, k: acc & (F.col(f"A.{k}") == F.col(f"B.{k}")),
        keys[1:],
        F.col(f"A.{keys[0]}") == F.col(f"B.{keys[0]}"),
    ) & (F.col("A.v")[id_field] < F.col("B.v")[id_field])
    big_pairs = (
        big.alias("A")
        .hint("merge")
        .join(big.alias("B"), cond)
        .select(F.col("A.v").alias("a"), F.col("B.v").alias("b"))
    )
    return small_pairs.unionByName(big_pairs)


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
    max_gram_freq: int | None = 10_000,
    bucket_cap: int = DEFAULT_BUCKET_CAP,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for all pairs sharing >= 1 gram.

    Candidate generation is JOIN-FREE: window-count per gram applies the
    df-cut in place, a second window counts each doc's surviving grams,
    and that size rides the ``(doc, sz)`` posting-list struct into the
    pair explosion — so Jaccard needs no join back to a per-document
    sizes relation.  (A per-doc relation is corpus-sized: broadcasting it
    is a guaranteed build-side OOM at 100 TB, and even a shuffle join
    would re-shuffle the corpus; carrying 8 bytes per posting-list entry
    costs almost nothing.)  Jaccard = inter / (|A| + |B| − inter), sizes
    measured over the df-cut gram space — document the same cut in any
    oracle.

    ``max_gram_freq`` (on by default) drops stop-grams before anything
    quadratic happens; grams between the cap and the df-cut take the
    distributed self-join fallback (see ``_bucket_pairs``).
    """
    grams = doc_grams(df, id_col, text_col, n)
    wg = Window.partitionBy("gram")
    kept = grams.withColumn("_df", F.count("*").over(wg))
    if max_gram_freq is not None:
        kept = kept.filter(F.col("_df") <= max_gram_freq)
    # per-doc size AFTER the df-cut; the filter drops whole gram groups,
    # so _df is still each gram's exact posting-list length below
    wd = Window.partitionBy("doc")
    sized = kept.withColumn("sz", F.count("*").over(wd))
    rows = sized.select(
        "gram",
        F.struct(F.col("doc"), F.col("sz")).alias("v"),
        F.col("_df").alias("_cnt"),
    )
    pr = _bucket_pairs(rows, ["gram"], "doc", bucket_cap, count_col="_cnt")
    pairs = (
        pr.select(
            F.col("a.doc").alias("id_a"),
            F.col("b.doc").alias("id_b"),
            F.col("a.sz").alias("sz_a"),
            F.col("b.sz").alias("sz_b"),
        )
        .groupBy("id_a", "id_b")
        .agg(
            F.count("*").alias("inter"),
            F.max("sz_a").alias("sz_a"),
            F.max("sz_b").alias("sz_b"),
        )
    )
    return (
        pairs.withColumn(
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


def minhash_band_table(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 16,
    bands: int = 4,
    n: int = 2,
) -> DataFrame:
    """The persistable LSH index: one (doc, sig, band_idx, band_key) row
    per band, via a single explode — no b-way union re-scan.  The full
    signature RIDES the band row (k longs) so any later scoring needs no
    join back to a signature table.

    This is the relation an incremental pipeline materializes once per
    corpus (at scale: ``storage.write_bucketed_table`` on ``band_key``,
    so every future batch joins against it exchange-free on the corpus
    side) and appends to as batches arrive."""
    assert k % bands == 0
    r = k // bands
    sig = minhash_signatures(df, id_col, text_col, k, n)
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
    return sig_arr.select(
        "doc", "sig", F.explode(band_structs).alias("bk")
    ).select("doc", "sig", "bk.band_idx", "bk.band_key")


def _score_band_pairs(pr: DataFrame, k: int, threshold: float) -> DataFrame:
    """(a, b) struct pairs → (id_a, id_b, est_jaccard >= threshold),
    distinct across the bands a pair co-occurred in (est_jaccard is a
    pure function of the pair, so the triple is distinct-safe)."""
    agree = F.size(
        F.filter(
            F.zip_with(F.col("a.sig"), F.col("b.sig"), lambda u, v: u == v),
            lambda m: m,
        )
    )
    return (
        pr.select(
            F.col("a.doc").alias("id_a"),
            F.col("b.doc").alias("id_b"),
            F.round(agree / F.lit(float(k)), 6).alias("est_jaccard"),
        )
        .filter(F.col("est_jaccard") >= threshold)
        .distinct()
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 16,
    bands: int = 4,
    n: int = 2,
    threshold: float = 0.5,
    bucket_cap: int = DEFAULT_BUCKET_CAP,
) -> DataFrame:
    """Candidate pairs from banded minhash, scored by signature agreement.

    Two docs are candidates iff at least one band (k/bands consecutive
    minhashes) matches exactly; est_jaccard = fraction of the k minhashes
    that agree.  Returns (id_a, id_b, est_jaccard >= threshold).  Band
    buckets larger than ``bucket_cap`` (a near-duplicate storm: many docs
    with an identical band) take the distributed self-join fallback
    instead of a single collected row — see ``_bucket_pairs``.

    Pairs per band bucket over ONE shuffle on the band key (the signature
    rides the row), replacing the band-key self-join plus two signature
    re-joins.
    """
    stacked = minhash_band_table(df, id_col, text_col, k, bands, n)
    rows = stacked.select(
        "band_idx", "band_key", F.struct("doc", "sig").alias("v")
    )
    pr = _bucket_pairs(rows, ["band_idx", "band_key"], "doc", bucket_cap)
    return _score_band_pairs(pr, k, threshold)


def minhash_lsh_pairs_incremental(
    new_docs: DataFrame,
    corpus_bands: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 16,
    bands: int = 4,
    n: int = 2,
    threshold: float = 0.5,
    bucket_cap: int = DEFAULT_BUCKET_CAP,
) -> DataFrame:
    """Near-dup pairs INVOLVING a new batch, without recomputing the
    corpus: the daily-ingest dedup workflow ("which incoming documents
    duplicate each other or anything already ingested?").

    ``corpus_bands`` is a previously materialized :func:`minhash_band_table`
    (ids should be disjoint from the batch's; same-id rows on both sides
    are excluded from new-vs-corpus pairing rather than surfacing as
    degenerate self-pairs).  Returns the union of

    - **new-vs-corpus**: equi-join of the batch's band table against the
      corpus's on (band_idx, band_key), scored from the signatures riding
      both sides.  Per-batch cost is the batch's signature pass plus one
      key-partitioned join — the corpus is never re-tokenized or
      re-hashed, and if the corpus table was written bucketed on
      band_key, never re-shuffled either.  A storm key fans out as join
      rows across tasks (never a collected array), and AQE's skew-join
      splitting handles hot keys — so no cap is needed on this side.
    - **new-vs-new**: the regular capped in-bucket pairing over the
      batch's own band table.

    Ordering: id_a < id_b in every pair, whichever side each id came
    from, so the result is a plain pair relation.
    """
    new_bands = minhash_band_table(new_docs, id_col, text_col, k, bands, n)

    nc = (
        new_bands.alias("N")
        .join(corpus_bands.alias("C"), ["band_idx", "band_key"])
        # an id present on BOTH sides (violated disjointness) must not
        # produce a degenerate self-pair (a.doc == b.doc, est_jaccard 1.0
        # — passes any threshold); the join-level filter makes the
        # docstring contract structural instead of advisory
        .filter(F.col("N.doc") != F.col("C.doc"))
        .select(
            F.struct(
                F.least(F.col("N.doc"), F.col("C.doc")).alias("doc"),
                F.when(F.col("N.doc") < F.col("C.doc"), F.col("N.sig"))
                .otherwise(F.col("C.sig"))
                .alias("sig"),
            ).alias("a"),
            F.struct(
                F.greatest(F.col("N.doc"), F.col("C.doc")).alias("doc"),
                F.when(F.col("N.doc") < F.col("C.doc"), F.col("C.sig"))
                .otherwise(F.col("N.sig"))
                .alias("sig"),
            ).alias("b"),
        )
    )
    rows = new_bands.select(
        "band_idx", "band_key", F.struct("doc", "sig").alias("v")
    )
    nn = _bucket_pairs(rows, ["band_idx", "band_key"], "doc", bucket_cap)
    return _score_band_pairs(nc.unionByName(nn), k, threshold)


def ngram_contamination(
    corpus: DataFrame,
    eval_docs: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    min_shared: int = 2,
    max_gram_freq: int | None = 10_000,
) -> DataFrame:
    """Decontamination: corpus documents sharing >= ``min_shared``
    distinct n-grams with any eval-set document.

    The training-data hygiene step every eval-honest pipeline runs
    (Gopher/GPT-style 8-13-gram overlap): before training, drop corpus
    docs that leak test material.  Returns
    (corpus_id, eval_id, shared_grams) for every contaminated pair.

    Shape: the eval side is tiny relative to the corpus (thousands of
    docs vs billions), so the corpus gram relation SEMI-joins the
    eval-gram set — only corpus grams that appear in ANY eval doc survive
    (at 100 TB the eval gram set broadcasts; we leave the strategy to
    AQE, which broadcasts when measured-small).  Then one groupBy on the
    surviving (corpus_id, eval_id) incidence counts shared grams.  The
    df-cut (``max_gram_freq`` over the EVAL side) drops stop-grams before
    the join so a common phrase in the eval set cannot fan out across the
    whole corpus.
    """
    cg = doc_grams(corpus, id_col, text_col, n).withColumnRenamed("doc", "corpus_id")
    eg = doc_grams(eval_docs, id_col, text_col, n).withColumnRenamed("doc", "eval_id")
    if max_gram_freq is not None:
        w = Window.partitionBy("gram")
        eg = (
            eg.withColumn("_df", F.count("*").over(w))
            .filter(F.col("_df") <= max_gram_freq)
            .drop("_df")
        )
    return (
        cg.join(eg, "gram")
        .groupBy("corpus_id", "eval_id")
        .agg(F.count("*").alias("shared_grams"))
        .filter(F.col("shared_grams") >= min_shared)
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
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 12,
    bucket_cap: int = DEFAULT_BUCKET_CAP,
) -> DataFrame:
    """Near-dup pairs by SimHash: band on 15-bit quarters (a pair within
    Hamming distance <= 3 of 60 bits must agree on >= 1 quarter; wider
    distances trade recall), verify with exact xor/bit_count.  Chunk
    buckets larger than ``bucket_cap`` (many identical signatures) take
    the distributed self-join fallback — see ``_bucket_pairs``."""
    sig = simhash(df, id_col, text_col)
    # one (doc, simhash, q, chunk) row per 15-bit quarter via a single
    # explode (no 4-way union re-scan), then pairs per (q, chunk) bucket:
    # ONE shuffle on the chunk key replaces the chunk-key self-join, and
    # the signature rides the row so the Hamming verify needs no join back
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
    rows = chunks.select("q", "chunk", F.struct("doc", "simhash").alias("v"))
    pr = _bucket_pairs(rows, ["q", "chunk"], "doc", bucket_cap)
    return (
        pr.select(
            F.col("a.doc").alias("id_a"),
            F.col("b.doc").alias("id_b"),
            # long, matching the oracle's CAST(bit_count(...) AS BIGINT)
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
            .cast("long")
            .alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def duplicated_segments(
    df: DataFrame, id_col: str, text_col: str, width: int = 20
) -> DataFrame:
    """Substring-level duplication profile: fixed-width token segments.

    Exact-substring dedup (the signal behind suffix-array dedup of
    training corpora) approximated at segment granularity: each document
    is cut into non-overlapping ``width``-token segments (trailing
    partial segment included), each segment hashed, and a segment is
    *duplicated* when its hash occurs in >= 2 distinct documents.  The
    per-document output — how much of the document is made of spans that
    exist verbatim elsewhere — is the boilerplate/template detector that
    document-level hashing (exact_duplicates) cannot see: two documents
    sharing a 200-token license header but nothing else look unrelated to
    whole-doc hashes and near-identical here.

    Returns (id, n_segments, dup_segments, dup_frac) with ``dup_frac`` a
    raw IEEE-754 division (bit-identical across engines for identical
    integer inputs; no ``round``).

    Scale shape: explode to one row per segment (corpus token count /
    width rows), ONE groupBy on the 60-bit segment hash for the
    cross-document spread, one hash-partitioned join back (both sides
    already clustered on ``h`` — AQE plans the exchange once), one
    groupBy on the document id.  No self-join, nothing quadratic: cost
    is linear in corpus size regardless of how duplicated it is, unlike
    pair-producing methods.  A segment shared by f documents costs f
    rows, not f², because the profile is per-document, not per-pair.
    """
    tok = tokens(text_col)
    # ceil(len/width) segments; sequence(0, nseg-1) is safe because every
    # document has >= 1 token (split of "" is [""]), so nseg >= 1
    base = spread(df).select(
        F.col(id_col),
        tok.alias("_w"),
        F.ceil(F.size(tok) / F.lit(width)).cast("int").alias("_nseg"),
    )
    pos = base.select(
        F.col(id_col),
        F.explode(F.sequence(F.lit(0), F.col("_nseg") - 1)).alias("_s"),
        "_w",
    ).select(
        F.col(id_col),
        md5_long(
            F.concat_ws(
                " ", F.slice("_w", F.col("_s") * width + 1, F.lit(width))
            )
        ).alias("h"),
    )
    docs_per_hash = (
        pos.distinct().groupBy("h").agg(F.count("*").alias("n_docs"))
    )
    dup = F.sum((F.col("n_docs") > 1).cast("long"))
    return (
        pos.join(docs_per_hash, "h")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_segments"),
            dup.alias("dup_segments"),
            (dup.cast("double") / F.count("*").cast("double")).alias("dup_frac"),
        )
    )


def remove_duplicated_lines(
    df: DataFrame,
    id_col: str,
    text_col: str,
    line_sep: str = "\n",
    max_docs: int = 1,
    keep: str = "none",
) -> DataFrame:
    """Cross-document line dedup (the C4/CCNet boilerplate scrubber):
    drop every line that occurs in more than ``max_docs`` DISTINCT
    documents, and reassemble each document from its surviving lines in
    original order.

    ``keep="first"`` applies the C4 paper's actual stated semantics
    ("we removed … keeping one"): a line over the ``max_docs`` cut
    retains its occurrences in the CANONICAL document — the min doc id
    among the documents containing it, elected at the line's count
    group like the span operators' keep-first — and is dropped from
    every other document.  Within-document repeats inside the canonical
    document all survive (counting is per DISTINCT document, so they
    were never what the cut measures).  ``keep="none"`` (default) drops
    every occurrence — template boilerplate usually SHOULD vanish
    entirely, which is why it is the default.

    This is dedup at the granularity documents actually share template
    content (nav bars, license headers, cookie banners): whole-doc
    hashing misses it, and pair-producing near-dup methods pay for the
    pair structure this operator doesn't need.  Returns
    ``(id_col, n_lines, n_removed, text_clean)`` with ``text_clean``
    joined by ``line_sep`` (empty string when nothing survives).

    Scale shape — linear, no pairs: posexplode to (doc, pos, line), one
    groupBy(line) counting distinct docs, one hash-partitioned join
    back on line (both sides clustered on it; AQE plans the exchange
    once), one groupBy(doc) to reassemble.  A line shared by f docs
    costs f rows, never f².  Grouping is on the raw line string —
    exact; at corpus scale group on ``md5_long(line)`` first and carry
    the line only through the join-back, so the count shuffle moves
    16-byte keys instead of text (the doc_grams pattern).
    """
    import re as _re

    if keep not in ("none", "first"):
        raise ValueError(f"keep must be 'none' or 'first', got {keep!r}")
    # split's pattern is a regex while the reassembly join is literal —
    # escape so separators like '.' or '|' split exactly where they join
    lines = F.split(F.col(text_col), F.lit(_re.escape(line_sep)), -1)
    ex = spread(df).select(
        F.col(id_col).alias("doc"),
        F.size(lines).alias("n_lines"),
        F.posexplode(lines).alias("pos", "line"),
    )
    counts = ex.select("line", "doc").distinct().groupBy("line").agg(
        F.count("doc").alias("_nd"),
        # canonical document for keep='first' — rides the same shuffle
        F.min("doc").alias("_fd"),
    )
    keep_pred = F.col("_nd") <= max_docs
    if keep == "first":
        keep_pred = keep_pred | (F.col("doc") == F.col("_fd"))
    kept = (
        ex.join(counts, "line")
        .filter(keep_pred)
        .groupBy("doc")
        .agg(
            F.count("*").alias("_n_kept"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "line"))),
                    lambda s: s["line"],
                ),
                line_sep,
            ).alias("text_clean"),
        )
    )
    per_doc = ex.select("doc", "n_lines").distinct()
    return (
        per_doc.join(kept, "doc", "left")
        .select(
            F.col("doc").alias(id_col),
            F.col("n_lines").cast("long").alias("n_lines"),
            (F.col("n_lines") - F.coalesce(F.col("_n_kept"), F.lit(0)))
            .cast("long")
            .alias("n_removed"),
            F.coalesce(F.col("text_clean"), F.lit("")).alias("text_clean"),
        )
    )


def remove_duplicated_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 50,
    min_count: int = 2,
    keep: str = "none",
) -> DataFrame:
    """Exact substring-span dedup — the ExactSubstr recipe (Lee et al.
    2022, "Deduplicating Training Data Makes Language Models Better"):
    remove every token span of length ≥ ``k`` whose text occurs at least
    ``min_count`` times across the corpus (within-document repeats
    count).  The paper's tool builds a corpus suffix array; the
    distributed equivalence this operator exploits instead is that **a
    duplicated span of length L ≥ k is exactly the union of its
    L−k+1 duplicated k-shingles**, so marking every token covered by a
    globally-duplicated k-token shingle and dropping marked tokens
    removes precisely the maximal duplicated spans — linear, no suffix
    array, no pair structure.

    Semantics (``keep``):

    - ``keep="none"`` (default): ALL occurrences of a duplicated span
      are removed, including "the first" — symmetric and
      order-independent, and what the paper's released tool actually
      does by default.
    - ``keep="first"`` (the paper TEXT's "all but one" semantics,
      VERDICT r9 item 3): each duplicated k-shingle hash elects a
      deterministic canonical occurrence — the ``min (doc, p)`` within
      its hash group, a total order that exists cheaply AT the group
      even though the corpus has no global document order — and only
      the NON-canonical occurrences' positions are stripped.  An exact
      duplicated passage shared by documents A < B therefore survives
      verbatim in A and vanishes from B.  Corner case, documented: a
      canonical occurrence overlapping a non-canonical duplicated
      occurrence *in the same document* (periodic within-document
      repeats, e.g. ``"x y x y x y …"``) loses the overlapped tokens
      too — stripping is a plain position union, no rescue pass — so
      pathological self-repeating text can still shrink below one full
      copy; the remove-all default removes those entirely anyway.

    Returns ``(id_col, n_tokens, n_removed, text_clean)`` — tokens are
    single-space splits, ``text_clean`` is the surviving tokens
    space-joined in original order (empty when everything was
    duplicated).

    Scale shape: shingle HASHES (``md5_long``, 16-byte keys — k-token
    shingle TEXT never shuffles, a k× saving on the count side) through
    one count groupBy; one join-back of duplicated hashes; covered
    positions explode k rows per duplicated shingle
    (O(k · dup_positions), corpus-bounded); one anti-join and one
    reassembly groupBy(doc) — the reassembly is the operator's one
    inherent corpus-text movement (each token crosses the wire ONCE to
    rebuild its document; the output IS the cleaned text), near-linear
    when shuffle partitions scale with the data (measured in SCALE.md:
    10×→100× data = 12.7× warm wall).  Everything JVM-side.  60-bit hashing
    makes two distinct shingles collide with probability ~n²/2⁶¹ —
    negligible below ~10⁹ distinct shingles; above that widen to the
    full md5 (two longs).
    """
    if keep not in ("none", "first"):
        raise ValueError(f"keep must be 'none' or 'first', got {keep!r}")
    base, sh = _token_shingles(df, id_col, text_col, k)
    if keep == "none":
        dup = (
            sh.groupBy("h")
            .agg(F.count(F.lit(1)).alias("_c"))
            .filter(F.col("_c") >= min_count)
            .select("h")
        )
        occ = sh.join(dup, "h").select("doc", "p")
    else:
        # canonical election: min(struct(doc, p)) per hash group — one
        # extra map-side-combinable aggregate on the SAME count shuffle,
        # and the join-back carries one ~24-byte struct per dup hash
        firsts = (
            sh.groupBy("h")
            .agg(
                F.count(F.lit(1)).alias("_c"),
                F.min(F.struct("doc", "p")).alias("_f"),
            )
            .filter(F.col("_c") >= min_count)
            .select("h", "_f")
        )
        occ = (
            sh.join(firsts, "h")
            .filter(
                (F.col("doc") != F.col("_f.doc"))
                | (F.col("p") != F.col("_f.p"))
            )
            .select("doc", "p")
        )
    return _strip_covered_spans(base, occ, k, id_col)


def _token_shingles(df: DataFrame, id_col: str, text_col: str, k: int):
    """(base, shingles): base = (doc, _l tokens array, _n) spread across
    the cluster; shingles = (doc, p, h) with ``p`` the 1-based start and
    ``h`` the md5_long of the k-token shingle — the k-token shingle text
    itself never shuffles, only its 16-byte hash (the count/join side's
    k× traffic saving; document reassembly later moves each token once)."""
    toks = F.split(F.col(text_col), F.lit(" "), -1)
    base = spread(df).select(
        F.col(id_col).alias("doc"), toks.alias("_l"), F.size(toks).alias("_n")
    )
    # 1-based shingle start positions 1..n-k+1 (sequence() DESCENDS when
    # start > stop, so short docs must yield an empty array explicitly)
    starts = F.when(
        F.col("_n") >= k,
        F.sequence(F.lit(1), F.col("_n") - F.lit(k - 1)),
    ).otherwise(F.array().cast("array<int>"))
    sh = base.select(
        "doc",
        F.explode(
            F.transform(
                starts,
                lambda p: F.struct(
                    p.alias("p"),
                    md5_long(
                        F.concat_ws(" ", F.slice(F.col("_l"), p, F.lit(k)))
                    ).alias("h"),
                ),
            )
        ).alias("_s"),
    ).select("doc", F.col("_s.p").alias("p"), F.col("_s.h").alias("h"))
    return base, sh


def _strip_covered_spans(
    base: DataFrame, occ: DataFrame, k: int, id_col: str
) -> DataFrame:
    """Drop every token covered by a shingle occurrence in ``occ``
    (rows of ``(doc, p)``) and reassemble — the shared back half of the
    span operators."""
    covered = (
        occ.select(
            "doc",
            F.explode(
                F.sequence(F.col("p"), F.col("p") + F.lit(k - 1))
            ).alias("pos"),
        )
        .distinct()
    )
    ex = base.select(
        "doc", F.posexplode(F.col("_l")).alias("_i", "tok")
    ).select("doc", (F.col("_i") + F.lit(1)).alias("pos"), "tok")
    kept = (
        ex.join(covered, ["doc", "pos"], "left_anti")
        .groupBy("doc")
        .agg(
            F.count(F.lit(1)).alias("_n_kept"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                    lambda s: s["tok"],
                ),
                " ",
            ).alias("text_clean"),
        )
    )
    return (
        base.select("doc", "_n")
        .join(kept, "doc", "left")
        .select(
            F.col("doc").alias(id_col),
            F.col("_n").cast("long").alias("n_tokens"),
            (F.col("_n") - F.coalesce(F.col("_n_kept"), F.lit(0)))
            .cast("long")
            .alias("n_removed"),
            F.coalesce(F.col("text_clean"), F.lit("")).alias("text_clean"),
        )
    )


def duplicated_span_report(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 50,
    min_count: int = 2,
) -> DataFrame:
    """The diagnostic half of ExactSubstr: report each MAXIMAL duplicated
    span per document as ``(id_col, span_start, span_len)`` (1-based
    token positions) — exactly the runs :func:`remove_duplicated_spans`
    would strip, surfaced for corpus forensics (which passages are
    boilerplate, how long, where) without mutating anything.

    Implementation is the shingle-cover machinery plus gaps-and-islands:
    covered positions (same relation the strip uses) group into maximal
    runs via the classic ``pos − row_number()`` island key — one
    (doc)-partitioned window and one groupBy on (doc, island).  Overlap
    merging is inherent: two overlapping duplicated spans report as ONE
    maximal run, matching the strip's union semantics.  Linear like the
    rest of the family; the window partitions by doc, so no global sort.
    """
    base, sh = _token_shingles(df, id_col, text_col, k)
    dup = (
        sh.groupBy("h")
        .agg(F.count(F.lit(1)).alias("_c"))
        .filter(F.col("_c") >= min_count)
        .select("h")
    )
    covered = (
        sh.join(dup, "h")
        .select(
            "doc",
            F.explode(
                F.sequence(F.col("p"), F.col("p") + F.lit(k - 1))
            ).alias("pos"),
        )
        .distinct()
    )
    w = Window.partitionBy("doc").orderBy("pos")
    runs = covered.select(
        "doc", "pos", (F.col("pos") - F.row_number().over(w)).alias("_grp")
    )
    return (
        runs.groupBy("doc", "_grp")
        .agg(
            F.min("pos").cast("long").alias("span_start"),
            F.count(F.lit(1)).cast("long").alias("span_len"),
        )
        .select(F.col("doc").alias(id_col), "span_start", "span_len")
    )


def contaminated_span_report(
    corpus: DataFrame,
    eval_docs: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 50,
) -> DataFrame:
    """Leak forensics: every MAXIMAL eval-leaked token span per corpus
    document as ``(id_col, span_start, span_len)`` — the regions
    :func:`remove_contaminated_spans` would excise, surfaced read-only
    (how much eval material leaked, where, and how long before
    training data ships).  Same gaps-and-islands reassembly as
    :func:`duplicated_span_report` over the decontamination cover."""
    _, sh = _token_shingles(corpus, id_col, text_col, k)
    _, esh = _token_shingles(eval_docs, id_col, text_col, k)
    covered = (
        sh.join(esh.select("h").distinct(), "h")
        .select(
            "doc",
            F.explode(
                F.sequence(F.col("p"), F.col("p") + F.lit(k - 1))
            ).alias("pos"),
        )
        .distinct()
    )
    w = Window.partitionBy("doc").orderBy("pos")
    runs = covered.select(
        "doc", "pos", (F.col("pos") - F.row_number().over(w)).alias("_grp")
    )
    return (
        runs.groupBy("doc", "_grp")
        .agg(
            F.min("pos").cast("long").alias("span_start"),
            F.count(F.lit(1)).cast("long").alias("span_len"),
        )
        .select(F.col("doc").alias(id_col), "span_start", "span_len")
    )


def shingle_count_index(
    df: DataFrame, id_col: str, text_col: str, k: int = 50
) -> DataFrame:
    """The persisted half of incremental span dedup: the corpus's
    ``(h, c)`` relation — md5_long of each k-token shingle with its
    total occurrence count (within-document repeats included).  Write
    this once per corpus (16 bytes + a long per DISTINCT shingle —
    orders of magnitude smaller than the text) and daily increments
    never re-shingle the corpus again; see
    :func:`remove_duplicated_spans_incremental` /
    :func:`merge_shingle_index`."""
    _, sh = _token_shingles(df, id_col, text_col, k)
    return sh.groupBy("h").agg(F.count(F.lit(1)).alias("c"))


def merge_shingle_index(index: DataFrame, delta: DataFrame) -> DataFrame:
    """Fold an increment's :func:`shingle_count_index` into the persisted
    one — counts are algebraic, so the union-sum equals the index built
    from scratch over corpus ∪ increment (pinned by test); one
    map-side-combined shuffle over hash keys."""
    return index.unionByName(delta).groupBy("h").agg(
        F.sum("c").cast("long").alias("c")
    )


def remove_duplicated_spans_incremental(
    new_docs: DataFrame,
    index: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 50,
    min_count: int = 2,
    broadcast_increment: bool = False,
    inc: DataFrame | None = None,
) -> DataFrame:
    """ExactSubstr span dedup for a daily increment against a persisted
    corpus shingle index (the production shape, mirroring
    :func:`minhash_lsh_pairs_incremental`): a span in a NEW document is
    duplicated iff its shingles' corpus-wide counts — increment
    occurrences plus the persisted ``index`` counts — reach
    ``min_count``, which makes the result EXACTLY
    :func:`remove_duplicated_spans` over corpus ∪ increment restricted
    to the increment's documents (the oracle identity the driver row
    checks).  Corpus documents that only now became duplicated are NOT
    retro-cleaned — same one-sided contract as the minhash incremental;
    the batch pipeline re-cleans at rewrite time.

    Scale shape (ADVICE r10): the increment is shingled (cost ∝
    increment); the duplicated-hash set splits into two branches so the
    SMALL side of every join is the BUILD side — Spark can only
    broadcast the right side of a left-outer join, so the previous
    ``inc LEFT OUTER index`` form forced a SortMergeJoin that
    Exchange-shuffled the persisted index on ``h`` every increment.
    Now: (a) hashes already duplicated WITHIN the increment filter
    straight off ``inc``; (b) hashes duplicated only corpus-wide come
    from ``index ⋈ inc`` INNER — an inner join's build side can be
    EITHER input, so AQE elects the increment's distinct-shingle counts
    as the broadcast build side whenever they are MEASURED small, and
    the index is scanned, never sort-merge-shuffled (the runtime
    BroadcastHashJoin is pinned in tests/test_plans.py; the one AQE
    cost is the index's shuffle write materialized before the
    conversion).

    ``broadcast_increment=True`` hint-forces the broadcast so the plan
    is STATICALLY a BroadcastHashJoin and the index has no Exchange at
    all — use it only for increments KNOWN tiny (a hint collects the
    increment's distinct-hash relation to the driver and builds the
    hash relation single-threaded: benchmarked 10× SLOWER than the AQE
    path when the increment was 1/5 of an sf0.1 corpus, and a
    build-side OOM for a real daily increment — measured r11, which is
    why the default is False).  For huge increments, store the index
    bucketed on ``h`` so the AQE shuffle is one-sided.  Persist the
    updated index via :func:`merge_shingle_index` on the increment's
    own :func:`shingle_count_index`.

    ``inc`` (r15) injects the increment's per-hash counts when the
    caller already materialized them — the streaming handler persists
    :func:`shingle_count_index` of the batch for its index delta, and
    without this parameter the dedup re-shingled the batch and re-ran
    the identical groupBy (guide §1.2).  Must be ``(h, _ic)`` equal to
    ``shingle_count_index(new_docs)`` renamed; results are identical
    either way (differential-tested)."""
    base, sh = _token_shingles(new_docs, id_col, text_col, k)
    if inc is None:
        inc = sh.groupBy("h").agg(F.count(F.lit(1)).alias("_ic"))
    inc_build = F.broadcast(inc) if broadcast_increment else inc
    dup = (
        inc.filter(F.col("_ic") >= min_count)
        .select("h")
        .unionByName(
            index.select("h", F.col("c").alias("_xc"))
            .join(inc_build, "h")
            .filter(F.col("_ic") + F.col("_xc") >= min_count)
            .select("h")
        )
        .distinct()
    )
    occ = sh.join(dup, "h").select("doc", "p")
    return _strip_covered_spans(base, occ, k, id_col)


def remove_contaminated_spans(
    corpus: DataFrame,
    eval_docs: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 50,
) -> DataFrame:
    """Span-level eval-set decontamination: excise from every corpus
    document each token span of length ≥ ``k`` that appears ANYWHERE in
    the held-out eval set, instead of dropping the whole document (the
    surgical variant of :func:`ngram_contamination` — GPT-3's
    appendix-C approach removed windows around collisions; this removes
    exactly the maximal leaked spans via the same shingle-cover
    equivalence as :func:`remove_duplicated_spans`).

    Returns ``(id_col, n_tokens, n_removed, text_clean)`` for every
    corpus document.  Scale shape: the eval shingle-hash set is tiny
    relative to the corpus (and distinct-deduped here), so the hash
    semi-join broadcasts under AQE when measured-small; everything else
    is the linear span machinery."""
    base, sh = _token_shingles(corpus, id_col, text_col, k)
    _, esh = _token_shingles(eval_docs, id_col, text_col, k)
    occ = sh.join(esh.select("h").distinct(), "h").select("doc", "p")
    return _strip_covered_spans(base, occ, k, id_col)
