"""Unit tests for dedup operators on tiny crafted inputs."""

import pytest

from smalltsdb_spark.operators import dedup

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
    (3, "the quick brown fox leaps over the lazy dog"),  # near dup
    (4, "completely different words appear in this one"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_exact_duplicates(docs):
    rows = {r.doc_id: r for r in dedup.exact_duplicates(docs, "doc_id", "text").collect()}
    assert not rows[1].is_dup and rows[2].is_dup
    assert rows[1].content_hash == rows[2].content_hash
    assert not rows[3].is_dup and not rows[4].is_dup


def test_ngram_jaccard_pairs(docs):
    pairs = {
        (r.id_a, r.id_b): r.jaccard
        for r in dedup.ngram_jaccard_pairs(docs, "doc_id", "text", n=2, threshold=0.1).collect()
    }
    assert pairs[(1, 2)] == 1.0  # identical docs
    # docs 1,3 differ in one word -> share 6 of 10 distinct bigrams: j = 6/10
    assert pairs[(1, 3)] == pytest.approx(0.6)
    assert (1, 4) not in pairs and (3, 4) not in pairs


def test_minhash_identical_docs_agree_fully(docs):
    pairs = {
        (r.id_a, r.id_b): r.est_jaccard
        for r in dedup.minhash_lsh_pairs(
            docs, "doc_id", "text", k=16, bands=4, threshold=0.0
        ).collect()
    }
    assert pairs[(1, 2)] == 1.0
    # near-dups share >= one band often; if present, estimate is < 1
    if (1, 3) in pairs:
        assert 0.0 < pairs[(1, 3)] < 1.0


def test_simhash_properties(docs):
    sig = {r.doc: r.simhash for r in dedup.simhash(docs, "doc_id", "text").collect()}
    assert sig[1] == sig[2]  # identical text, identical signature
    assert sig[1] != sig[4]
    assert all(0 <= s < (1 << 60) for s in sig.values())
    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in dedup.simhash_near_pairs(docs, "doc_id", "text", max_hamming=20).collect()
    }
    assert pairs[(1, 2)] == 0
    if (1, 3) in pairs:
        assert pairs[(1, 3)] > 0


def test_short_docs_do_not_crash_gram_ops(spark):
    """Docs with fewer tokens than n (1-token, empty) must yield empty gram
    arrays, not an element_at index crash (regression: sequence(1, 0)
    stepped downward to [1, 0])."""
    docs = spark.createDataFrame(
        [(1, ""), (2, "single"), (3, "two words"), (4, "two words")],
        "doc_id long, text string",
    )
    pairs = dedup.ngram_jaccard_pairs(docs, "doc_id", "text", n=2, threshold=0.1).collect()
    assert {(r.id_a, r.id_b) for r in pairs} == {(3, 4)}
    sigs = dedup.minhash_signatures(docs, "doc_id", "text", k=4).collect()
    # docs with no bigrams produce no gram rows → absent from signatures
    assert {r.doc for r in sigs} == {3, 4}
    lsh = dedup.minhash_lsh_pairs(docs, "doc_id", "text", k=4, bands=2).collect()
    assert {(r.id_a, r.id_b) for r in lsh} == {(3, 4)}


def test_word_ngrams_short_doc_empty(spark):
    from pyspark.sql import functions as F

    from smalltsdb_spark.functions import tokens, word_ngrams

    df = spark.createDataFrame([("a",), ("a b c",)], "t string")
    rows = df.select(word_ngrams(tokens("t"), 3).alias("g")).collect()
    assert rows[0].g == []
    assert rows[1].g == ["a b c"]


def _corpus_with_storm(spark, n_unique=30, n_storm=40):
    """n_unique distinct docs plus a near-duplicate storm: n_storm copies
    of one document with tiny suffixes — every gram/band/chunk bucket the
    storm touches exceeds a small cap."""
    rows = [(i, f"alpha{i} beta{i} gamma{i} delta{i} epsilon{i}")
            for i in range(n_unique)]
    rows += [
        (1000 + j, "storm common text shared by every copy token" + str(j % 3))
        for j in range(n_storm)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.mark.parametrize("cap", [1, 3, 10**9])
def test_jaccard_bucket_cap_invariant(spark, cap):
    """The distributed self-join fallback must be EXACTLY the in-row
    explosion: any cap (even one that routes every bucket to the
    fallback) yields the identical pair set with identical scores."""
    docs = _corpus_with_storm(spark)
    ref = {
        (r.id_a, r.id_b): r.jaccard
        for r in dedup.ngram_jaccard_pairs(
            docs, "doc_id", "text", n=2, threshold=0.1, bucket_cap=10**9
        ).collect()
    }
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in dedup.ngram_jaccard_pairs(
            docs, "doc_id", "text", n=2, threshold=0.1, bucket_cap=cap
        ).collect()
    }
    assert got == ref and len(ref) > 0


@pytest.mark.parametrize("cap", [1, 3, 10**9])
def test_minhash_bucket_cap_invariant(spark, cap):
    docs = _corpus_with_storm(spark)
    ref = {
        (r.id_a, r.id_b): r.est_jaccard
        for r in dedup.minhash_lsh_pairs(
            docs, "doc_id", "text", k=16, bands=4, threshold=0.3,
            bucket_cap=10**9,
        ).collect()
    }
    got = {
        (r.id_a, r.id_b): r.est_jaccard
        for r in dedup.minhash_lsh_pairs(
            docs, "doc_id", "text", k=16, bands=4, threshold=0.3,
            bucket_cap=cap,
        ).collect()
    }
    assert got == ref and len(ref) > 0


@pytest.mark.parametrize("cap", [1, 3, 10**9])
def test_simhash_bucket_cap_invariant(spark, cap):
    docs = _corpus_with_storm(spark)
    ref = {
        (r.id_a, r.id_b): r.hamming
        for r in dedup.simhash_near_pairs(
            docs, "doc_id", "text", max_hamming=20, bucket_cap=10**9
        ).collect()
    }
    got = {
        (r.id_a, r.id_b): r.hamming
        for r in dedup.simhash_near_pairs(
            docs, "doc_id", "text", max_hamming=20, bucket_cap=cap
        ).collect()
    }
    assert got == ref and len(ref) > 0


@pytest.mark.parametrize("cap", [2, 10**9])
def test_minhash_incremental_equals_full_filtered(spark, cap):
    """Incremental (batch vs persisted corpus band table) must equal the
    from-scratch pair relation restricted to pairs touching the batch —
    including under the storm-bucket fallback."""
    docs = _corpus_with_storm(spark)
    batch = docs.filter("doc_id % 2 = 0")
    corpus = docs.filter("doc_id % 2 = 1")
    bands_tbl = dedup.minhash_band_table(corpus, "doc_id", "text", k=16, bands=4)
    inc = {
        (r.id_a, r.id_b): r.est_jaccard
        for r in dedup.minhash_lsh_pairs_incremental(
            batch, bands_tbl, "doc_id", "text", k=16, bands=4,
            threshold=0.3, bucket_cap=cap,
        ).collect()
    }
    full = {
        (r.id_a, r.id_b): r.est_jaccard
        for r in dedup.minhash_lsh_pairs(
            docs, "doc_id", "text", k=16, bands=4, threshold=0.3
        ).collect()
        if r.id_a % 2 == 0 or r.id_b % 2 == 0
    }
    assert inc == full and len(full) > 0


def test_minhash_incremental_overlapping_ids_no_self_pairs(spark):
    """An id on BOTH sides (violated disjointness) must not surface as a
    degenerate self-pair (a == b, est_jaccard 1.0) — the new-vs-corpus
    join filters same-id matches structurally (r3 ADVICE, low)."""
    docs = _corpus_with_storm(spark)
    bands_tbl = dedup.minhash_band_table(docs, "doc_id", "text", k=16, bands=4)
    pairs = dedup.minhash_lsh_pairs_incremental(
        docs, bands_tbl, "doc_id", "text", k=16, bands=4, threshold=0.3
    ).collect()
    assert len(pairs) > 0
    assert all(r.id_a < r.id_b for r in pairs)


def test_ngram_contamination(spark):
    corpus = spark.createDataFrame(
        [
            (1, "the secret eval answer is forty two exactly"),
            (2, "a completely unrelated training document here"),
            (3, "the secret eval answer differs from forty two"),
        ],
        "doc_id long, text string",
    )
    evals = spark.createDataFrame(
        [(100, "the secret eval answer is forty two")],
        "doc_id long, text string",
    )
    got = {
        (r.corpus_id, r.eval_id): r.shared_grams
        for r in dedup.ngram_contamination(
            corpus, evals, "doc_id", "text", n=3, min_shared=2
        ).collect()
    }
    # doc 1 contains the full eval text -> shares all 5 eval trigrams;
    # doc 3 shares "the secret eval", "secret eval answer" (prefix) = 2;
    # doc 2 shares none
    assert got == {(1, 100): 5, (3, 100): 2}


def test_ngram_contamination_no_broadcast_hint(spark):
    from smalltsdb_spark.plans import broadcast_hint_count

    corpus = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
    evals = spark.createDataFrame([(2, "a b c")], "doc_id long, text string")
    df = dedup.ngram_contamination(corpus, evals, "doc_id", "text")
    assert broadcast_hint_count(df) == 0


def test_duplicated_segments(spark):
    # width=3 segments; doc 1 and 2 share their first 3-token span
    # verbatim ("shared header line"); each has a distinct tail segment.
    docs = spark.createDataFrame(
        [
            (1, "shared header line unique tail one"),
            (2, "shared header line other ending two"),
            (3, "totally different text with no overlap here"),  # 7 tokens -> 3 segs
        ],
        "doc_id long, text string",
    )
    rows = {
        r.doc_id: r
        for r in dedup.duplicated_segments(docs, "doc_id", "text", width=3).collect()
    }
    assert rows[1].n_segments == 2 and rows[2].n_segments == 2
    assert rows[1].dup_segments == 1 and rows[2].dup_segments == 1
    assert rows[1].dup_frac == pytest.approx(0.5)
    # trailing partial segment is its own span, not dropped
    assert rows[3].n_segments == 3 and rows[3].dup_segments == 0


def test_duplicated_segments_internal_repeat_not_cross_doc(spark):
    # the same span repeated WITHIN one doc is not "duplicated" — the
    # signal is cross-document spread, counted over distinct docs
    docs = spark.createDataFrame(
        [(1, "a b c a b c"), (2, "x y z p q r")],
        "doc_id long, text string",
    )
    rows = {
        r.doc_id: r
        for r in dedup.duplicated_segments(docs, "doc_id", "text", width=3).collect()
    }
    assert rows[1].n_segments == 2 and rows[1].dup_segments == 0


def test_remove_duplicated_lines(spark):
    """Cross-doc lines vanish from every holder; within-doc repeats
    survive; a doc made entirely of boilerplate comes back empty; order
    is preserved."""
    from smalltsdb_spark.operators.dedup import remove_duplicated_lines

    docs = spark.createDataFrame(
        [
            (1, "COOKIE BANNER\nalpha beta\nalpha beta\nunique one"),
            (2, "COOKIE BANNER\nunique two\nNAV BAR"),
            (3, "COOKIE BANNER\nNAV BAR"),
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.n_lines, r.n_removed, r.text_clean)
        for r in remove_duplicated_lines(docs, "doc_id", "text").collect()
    }
    # doc 1: banner removed; the within-doc duplicate 'alpha beta' kept twice
    assert got[1] == (4, 1, "alpha beta\nalpha beta\nunique one")
    assert got[2] == (3, 2, "unique two")
    assert got[3] == (2, 2, "")


def test_remove_duplicated_lines_differential(spark):
    """Differential vs a pure-Python reference over edge-shaped docs:
    leading/trailing separators (empty lines), unicode, regex-special
    separators ('.') — the split pattern is escaped so it cuts exactly
    where the reassembly joins."""
    from collections import Counter

    from smalltsdb_spark.operators.dedup import remove_duplicated_lines

    def reference(docs, sep, max_docs=1):
        holders = Counter()
        for _, text in docs:
            for line in set(text.split(sep)):
                holders[line] += 1
        out = {}
        for doc_id, text in docs:
            lines = text.split(sep)
            kept = [l for l in lines if holders[l] <= max_docs]
            out[doc_id] = (len(lines), len(lines) - len(kept), sep.join(kept))
        return out

    for sep, docs in [
        ("\n", [(1, "\nshared\na é b\n"), (2, "shared\nx"), (3, "x\n\n")]),
        (".", [(1, "a.b.c"), (2, "b.d"), (3, "..a")]),
    ]:
        df = spark.createDataFrame(docs, "doc_id long, text string")
        got = {
            r.doc_id: (r.n_lines, r.n_removed, r.text_clean)
            for r in remove_duplicated_lines(df, "doc_id", "text", line_sep=sep).collect()
        }
        assert got == reference(docs, sep), (sep, got)


def test_remove_duplicated_lines_keep_first(spark):
    """keep='first' (C4's stated all-but-one): a shared line survives in
    the min-doc-id canonical document only; within-doc repeats in the
    canonical doc all survive (counting is per DISTINCT doc); unique
    lines untouched; remove-all keeps a subset of keep-first's lines."""
    from smalltsdb_spark.operators.dedup import remove_duplicated_lines

    docs = [
        (2, "shared\nmine"),          # canonical home for "shared" (min id)
        (5, "shared\nshared\nyours"), # loses both copies: 2 is canonical
        (9, "solo\nlines\nonly"),
        (11, "twin\ntwin"),           # within-doc repeat, single doc: kept
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_lines, r.n_removed, r.text_clean)
        for r in remove_duplicated_lines(
            df, "doc_id", "text", keep="first"
        ).collect()
    }
    assert got[2] == (2, 0, "shared\nmine")
    assert got[5] == (3, 2, "yours")
    assert got[9] == (3, 0, "solo\nlines\nonly")
    assert got[11] == (2, 0, "twin\ntwin")

    got_all = {
        r.doc_id: r.text_clean
        for r in remove_duplicated_lines(df, "doc_id", "text").collect()
    }
    assert got_all[2] == "mine"  # remove-all drops the canonical too
    # remove-all keeps a subset: every remove-all line survives keep-first
    for d in got:
        a = got_all[d].split("\n") if got_all[d] else []
        b = got[d][2].split("\n") if got[d][2] else []
        it = iter(b)
        assert all(line in it for line in a), d

    with pytest.raises(ValueError, match="keep"):
        remove_duplicated_lines(df, "doc_id", "text", keep="last")


def test_remove_duplicated_spans(spark):
    """ExactSubstr (Lee et al. 2022) edges: a shared >=k span vanishes
    from ALL occurrences (within-doc repeats included), sub-k overlap
    survives, short docs pass through, a fully-duplicated doc empties."""
    from smalltsdb_spark.operators.dedup import remove_duplicated_spans

    span = "a b c d"  # k=4 duplicated span
    docs = spark.createDataFrame(
        [
            (0, f"x {span} y"),            # span in the middle
            (1, f"{span} z {span}"),       # twice in ONE doc: both go
            (2, "a b c q d"),              # sub-k overlap with the span
            (3, "short doc"),              # shorter than k
            (4, span),                     # nothing but the span
            (5, ""),                       # empty text
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.n_tokens, r.n_removed, r.text_clean)
        for r in remove_duplicated_spans(
            docs, "doc_id", "text", k=4, min_count=2
        ).collect()
    }
    assert got[0] == (6, 4, "x y")
    assert got[1] == (9, 8, "z")
    assert got[2] == (5, 0, "a b c q d")
    assert got[3] == (2, 0, "short doc")
    assert got[4] == (4, 4, "")
    # split('', ' ') is one empty token; no shingles, nothing removed
    assert got[5] == (1, 0, "")


def test_remove_duplicated_spans_merges_overlapping_spans(spark):
    """Two duplicated spans overlapping in one doc cover the union of
    their tokens (the maximal-span property of the shingle cover)."""
    from smalltsdb_spark.operators.dedup import remove_duplicated_spans

    docs = spark.createDataFrame(
        [
            # doc 0 contains two OVERLAPPING duplicated 4-spans:
            # "p q r s" (shared with doc 1) and "r s t u" (with doc 2)
            (0, "p q r s t u"),
            (1, "p q r s"),
            (2, "r s t u"),
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.n_removed, r.text_clean)
        for r in remove_duplicated_spans(
            docs, "doc_id", "text", k=4, min_count=2
        ).collect()
    }
    # doc 0 loses p q r s (shared with 1) AND r s t u (shared with 2):
    # union = all 6 tokens
    assert got[0] == (6, "")
    assert got[1] == (4, "")
    assert got[2] == (4, "")


def test_remove_contaminated_spans(spark):
    """Eval-leaked >=k spans are excised from corpus docs; corpus-only
    duplication is untouched (decontamination, not dedup)."""
    from smalltsdb_spark.operators.dedup import remove_contaminated_spans

    leak = "q w e r"
    corpus = spark.createDataFrame(
        [(0, f"a {leak} b"), (1, "a a a a a"), (2, "a a a a a")],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame([(100, f"x {leak} y")], "doc_id long, text string")
    got = {
        r.doc_id: (r.n_tokens, r.n_removed, r.text_clean)
        for r in remove_contaminated_spans(
            corpus, ev, "doc_id", "text", k=4
        ).collect()
    }
    assert got[0] == (6, 4, "a b")
    # duplicated WITHIN the corpus but absent from eval: kept
    assert got[1] == (5, 0, "a a a a a")
    assert got[2] == (5, 0, "a a a a a")


def test_remove_duplicated_spans_matches_bruteforce_on_random_corpus(spark):
    """Independent validation of the shingle-cover equivalence: a brute
    force that enumerates EVERY span of length >= k (not shingles),
    counts its corpus occurrences, and marks duplicated spans' tokens
    must agree with the operator on a seeded random corpus over a tiny
    alphabet (dense with overlapping repeats — the adversarial shape
    for position arithmetic and boundary handling)."""
    import random
    from collections import Counter

    from smalltsdb_spark.operators.dedup import remove_duplicated_spans

    k, min_count = 3, 2
    rng = random.Random(20260815)
    docs = [
        (d, " ".join(rng.choice("xyz") for _ in range(rng.randint(0, 12))))
        for d in range(60)
    ]

    toks = {d: t.split(" ") for d, t in docs}
    span_cnt = Counter()
    for t in toks.values():
        for L in range(k, len(t) + 1):
            for i in range(len(t) - L + 1):
                span_cnt[tuple(t[i : i + L])] += 1
    want = {}
    for d, t in toks.items():
        covered = set()
        for L in range(k, len(t) + 1):
            for i in range(len(t) - L + 1):
                if span_cnt[tuple(t[i : i + L])] >= min_count:
                    covered |= set(range(i, i + L))
        kept = [tok for j, tok in enumerate(t) if j not in covered]
        want[d] = (len(t), len(t) - len(kept), " ".join(kept))

    got = {
        r.doc_id: (r.n_tokens, r.n_removed, r.text_clean)
        for r in remove_duplicated_spans(
            spark.createDataFrame(docs, "doc_id long, text string"),
            "doc_id",
            "text",
            k=k,
            min_count=min_count,
        ).collect()
    }
    assert got == want
    # the random corpus actually exercised removal (not a vacuous pass)
    assert sum(v[1] for v in want.values()) > 0
    assert any(v[1] == 0 for v in want.values())


def test_remove_duplicated_spans_keep_first(spark):
    """keep='first' (the paper TEXT's all-but-one semantics): each
    duplicated shingle's min-(doc, p) occurrence survives, every other
    occurrence is stripped — cross-document AND within-document."""
    from smalltsdb_spark.operators.dedup import remove_duplicated_spans

    span = "a b c d"
    docs = spark.createDataFrame(
        [
            (0, f"x {span} y"),        # canonical home (smallest doc id)
            (1, f"{span} z {span}"),   # loses both: doc 0 is canonical
            (2, "only p q r s z"),     # within-corpus unique: untouched
            (5, "h i j k"),            # shared with doc 7 below
            (7, "m h i j k n"),        # loses it: (5,1) < (7,2)
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.n_tokens, r.n_removed, r.text_clean)
        for r in remove_duplicated_spans(
            docs, "doc_id", "text", k=4, min_count=2, keep="first"
        ).collect()
    }
    assert got[0] == (6, 0, f"x {span} y")
    assert got[1] == (9, 8, "z")
    assert got[2] == (6, 0, "only p q r s z")
    assert got[5] == (4, 0, "h i j k")
    assert got[7] == (6, 4, "m n")


def test_remove_duplicated_spans_keep_first_within_doc(spark):
    """A within-document repeat keeps its FIRST occurrence (min p in the
    same doc) when no earlier document shares the span."""
    from smalltsdb_spark.operators.dedup import remove_duplicated_spans

    docs = spark.createDataFrame(
        [(3, "a b c d z a b c d")], "doc_id long, text string"
    )
    [r] = remove_duplicated_spans(
        docs, "doc_id", "text", k=4, min_count=2, keep="first"
    ).collect()
    assert (r.n_tokens, r.n_removed, r.text_clean) == (9, 4, "a b c d z")


def test_remove_duplicated_spans_keep_first_rejects_bad_keep(spark):
    from smalltsdb_spark.operators.dedup import remove_duplicated_spans

    docs = spark.createDataFrame([(0, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError, match="keep"):
        remove_duplicated_spans(docs, "doc_id", "text", keep="last")


def test_remove_duplicated_spans_keep_first_differential(spark):
    """Differential vs the remove-all variant on the same seeded random
    corpus (VERDICT r9 item 3): keep-first strips a strict SUBSET of
    positions (its occ relation drops one occurrence per dup hash), so
    per-doc n_removed is <= and every remove-all survivor survives
    keep-first too; an independent shingle-level brute force (canonical
    = sorted(occurrences)[0], strip the rest) pins the exact output."""
    import random
    from collections import defaultdict

    from smalltsdb_spark.operators.dedup import remove_duplicated_spans

    k, min_count = 3, 2
    rng = random.Random(20260815)
    docs = [
        (d, " ".join(rng.choice("xyz") for _ in range(rng.randint(0, 12))))
        for d in range(60)
    ]
    toks = {d: t.split(" ") for d, t in docs}

    occ = defaultdict(list)  # shingle tuple -> [(doc, 0-based pos)]
    for d, t in toks.items():
        for i in range(len(t) - k + 1):
            occ[tuple(t[i : i + k])].append((d, i))
    covered = defaultdict(set)
    for s, occs in occ.items():
        if len(occs) >= min_count:
            for d, i in sorted(occs)[1:]:
                covered[d] |= set(range(i, i + k))
    want = {}
    for d, t in toks.items():
        kept = [tok for j, tok in enumerate(t) if j not in covered[d]]
        want[d] = (len(t), len(t) - len(kept), " ".join(kept))

    sdf = spark.createDataFrame(docs, "doc_id long, text string")
    got_first = {
        r.doc_id: (r.n_tokens, r.n_removed, r.text_clean)
        for r in remove_duplicated_spans(
            sdf, "doc_id", "text", k=k, min_count=min_count, keep="first"
        ).collect()
    }
    assert got_first == want

    got_all = {
        r.doc_id: (r.n_removed, r.text_clean)
        for r in remove_duplicated_spans(
            sdf, "doc_id", "text", k=k, min_count=min_count
        ).collect()
    }
    def _is_subseq(a: list, b: list) -> bool:
        it = iter(b)
        return all(tok in it for tok in a)

    removed_first = removed_all = 0
    for d in toks:
        n_first, n_all = got_first[d][1], got_all[d][0]
        assert n_first <= n_all, d
        removed_first += n_first
        removed_all += n_all
        # remove-all keeps a subset of positions -> its clean text is a
        # subsequence of keep-first's clean text
        a = got_all[d][1].split(" ") if got_all[d][1] else []
        b = got_first[d][2].split(" ") if got_first[d][2] else []
        assert _is_subseq(a, b), d
    # keep-first genuinely kept something remove-all stripped
    assert removed_first < removed_all


def test_duplicated_span_report_maximal_runs(spark):
    """The report operator returns MAXIMAL covered runs: overlapping
    duplicated spans merge into one island; disjoint spans in one doc
    report separately; start/len agree with what the strip removes."""
    from smalltsdb_spark.operators.dedup import (
        duplicated_span_report,
        remove_duplicated_spans,
    )

    docs = spark.createDataFrame(
        [
            # doc 0: two OVERLAPPING dup 4-spans (p q r s @2, r s t u @4)
            # -> one island [2..7]; plus a disjoint one (a b c d @10)
            (0, "w p q r s t u x y a b c d"),
            (1, "p q r s"),
            (2, "r s t u"),
            (3, "a b c d"),
            (4, "nothing duplicated here at all"),
        ],
        "doc_id long, text string",
    )
    got = sorted(
        (r.doc_id, r.span_start, r.span_len)
        for r in duplicated_span_report(
            docs, "doc_id", "text", k=4, min_count=2
        ).collect()
    )
    assert got == [
        (0, 2, 6),   # merged overlap: positions 2-7
        (0, 10, 4),  # disjoint island
        (1, 1, 4),
        (2, 1, 4),
        (3, 1, 4),
    ]
    # the reported token count equals what the strip removes, per doc
    removed = {
        r.doc_id: r.n_removed
        for r in remove_duplicated_spans(
            docs, "doc_id", "text", k=4, min_count=2
        ).collect()
    }
    from collections import Counter

    reported = Counter()
    for d, _s, ln in got:
        reported[d] += ln
    assert all(reported.get(d, 0) == n for d, n in removed.items())


def test_remove_duplicated_spans_incremental_equals_scratch(spark, tmp_path):
    """The incremental contract (VERDICT r9 item 4): cleaning a batch
    against the persisted corpus shingle index equals the from-scratch
    remove-all span dedup over corpus ∪ batch, restricted to batch docs
    — including a batch-vs-corpus duplicate (count 1+1), a batch-internal
    duplicate the index never saw, and a batch doc repeating a span the
    corpus already holds twice."""
    from smalltsdb_spark.operators.dedup import (
        merge_shingle_index,
        remove_duplicated_spans,
        remove_duplicated_spans_incremental,
        shingle_count_index,
    )

    k, mc = 3, 2
    corpus_rows = [
        (1, "a b c d e"),      # "a b c" will be re-ingested by batch doc 10
        (2, "q r s t"),
        (3, "u v w u v w"),    # corpus-internal dup, batch-irrelevant
        (4, "m n o p"),        # "m n o" also in corpus doc 6
        (6, "z m n o"),
    ]
    batch_rows = [
        (10, "x a b c y"),     # duplicates corpus doc 1's prefix: stripped
        (11, "f g h i"),       # batch-internal dup with doc 12
        (12, "f g h j"),
        (13, "fresh unique words only"),
        (14, ""),
    ]
    corpus = spark.createDataFrame(corpus_rows, "doc_id long, text string")
    batch = spark.createDataFrame(batch_rows, "doc_id long, text string")

    idx_dir = str(tmp_path / "span_idx")
    shingle_count_index(corpus, "doc_id", "text", k=k).write.parquet(idx_dir)
    index = spark.read.parquet(idx_dir)

    got = {
        r.doc_id: (r.n_tokens, r.n_removed, r.text_clean)
        for r in remove_duplicated_spans_incremental(
            batch, index, "doc_id", "text", k=k, min_count=mc
        ).collect()
    }
    everything = spark.createDataFrame(
        corpus_rows + batch_rows, "doc_id long, text string"
    )
    want = {
        r.doc_id: (r.n_tokens, r.n_removed, r.text_clean)
        for r in remove_duplicated_spans(
            everything, "doc_id", "text", k=k, min_count=mc
        ).collect()
        if r.doc_id >= 10
    }
    assert got == want
    # the scenario actually exercised both duplication sources
    assert want[10][1] > 0 and want[11][1] > 0 and want[13][1] == 0

    # index maintenance: union-sum of the increment's index equals the
    # index built from scratch over corpus ∪ batch
    merged = {
        r.h: r.c
        for r in merge_shingle_index(
            index, shingle_count_index(batch, "doc_id", "text", k=k)
        ).collect()
    }
    scratch = {
        r.h: r.c
        for r in shingle_count_index(
            everything, "doc_id", "text", k=k
        ).collect()
    }
    assert merged == scratch


def test_contaminated_span_report_maximal_runs(spark):
    """Leak report: maximal eval-leaked runs per corpus doc; corpus-only
    duplication is invisible (it is a LEAK report, not dedup); reported
    lengths equal what decontamination would excise."""
    from smalltsdb_spark.operators.dedup import (
        contaminated_span_report,
        remove_contaminated_spans,
    )

    leak = "q w e r"
    corpus = spark.createDataFrame(
        [(0, f"a {leak} b {leak} c"),  # two disjoint leaks of one span
         (1, "a a a a a"), (2, "a a a a a")],  # corpus-only dup: invisible
        "doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [(100, f"x {leak} y")], "doc_id long, text string"
    )
    got = sorted(
        (r.doc_id, r.span_start, r.span_len)
        for r in contaminated_span_report(
            corpus, ev, "doc_id", "text", k=4
        ).collect()
    )
    assert got == [(0, 2, 4), (0, 7, 4)]
    removed = {
        r.doc_id: r.n_removed
        for r in remove_contaminated_spans(
            corpus, ev, "doc_id", "text", k=4
        ).collect()
    }
    from collections import Counter

    reported = Counter()
    for d, _s, ln in got:
        reported[d] += ln
    assert all(reported.get(d, 0) == n for d, n in removed.items())


def test_remove_duplicated_spans_incremental_precomputed_inc(spark, tmp_path):
    """The r15 sharing hook: passing the caller's materialized
    shingle_count_index as ``inc`` must leave the result identical to
    the self-computed increment counts (the streaming handler feeds its
    persisted index delta through this)."""
    from pyspark.sql import functions as F

    from smalltsdb_spark.operators.dedup import (
        remove_duplicated_spans_incremental,
        shingle_count_index,
    )

    k, mc = 3, 2
    corpus = spark.createDataFrame(
        [(1, "a b c d e"), (2, "q r s t")], "doc_id long, text string"
    )
    batch = spark.createDataFrame(
        [(10, "x a b c y"), (11, "f g h i"), (12, "f g h j")],
        "doc_id long, text string",
    )
    index = shingle_count_index(corpus, "doc_id", "text", k=k)
    inc = shingle_count_index(batch, "doc_id", "text", k=k).select(
        "h", F.col("c").alias("_ic")
    )
    rows = lambda df: {  # noqa: E731
        r.doc_id: (r.n_tokens, r.n_removed, r.text_clean) for r in df.collect()
    }
    without = rows(
        remove_duplicated_spans_incremental(
            batch, index, "doc_id", "text", k=k, min_count=mc
        )
    )
    with_inc = rows(
        remove_duplicated_spans_incremental(
            batch, index, "doc_id", "text", k=k, min_count=mc, inc=inc
        )
    )
    assert with_inc == without
    assert without[10][1] > 0 and without[11][1] > 0
