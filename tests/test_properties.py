"""Property-based tests (hypothesis) for the pure-Python kernels — the
test-strategy upgrade the reference lacks (SURVEY.md §5: "no
property-based testing").  Spark-free, so thousands of cases run in
milliseconds."""

import math

from hypothesis import assume, given, settings
from hypothesis import strategies as st

from smalltsdb_spark.flat import flatten, unflatten
from smalltsdb_spark.intervals import bucket_start, intervals
from smalltsdb_spark.sources.graphite import format_line, parse_line

PERIOD_SECONDS = st.sampled_from([1, 10, 60, 300, 3600, 86400])


# -- intervals kernel --------------------------------------------------------


@given(
    seconds=PERIOD_SECONDS,
    tail=st.integers(0, 10_000),
    now=st.integers(0, 10**9),
    last_idx=st.none() | st.integers(-1, 10**5),
)
def test_intervals_invariants(seconds, tail, now, last_idx):
    # domain: a finalized bucket can only lie in the finalized past
    # (last_final ≤ bucket_start(now - tail)); out-of-domain inputs are
    # unreachable from sync(), which derives last_final from prior plans
    last_final = None if last_idx is None else last_idx * seconds
    assume(last_final is None or last_final <= bucket_start(now - tail, seconds))
    (fs, fe), (ps, pe) = intervals(seconds, tail, now, last_final)
    # contiguity: partial starts exactly where final ends
    assert ps == fe
    # ordering
    assert fs <= fe <= ps <= pe
    # alignment: every bound is a bucket boundary
    for x in (fs, fe, pe):
        assert x % seconds == 0
    # the partial interval always covers `now`
    assert pe > now >= pe - 2 * seconds or fe == ps == pe  # clamped case
    # finality: nothing final within the tail
    assert fe <= bucket_start(now - tail, seconds) or fe == fs
    # progress: final starts right after the last finalized bucket
    assert fs == (last_final if last_final is not None else -seconds) + seconds


@given(
    seconds=PERIOD_SECONDS,
    tail=st.integers(0, 10_000),
    now=st.integers(0, 10**9),
)
def test_intervals_idempotent_when_caught_up(seconds, tail, now):
    """After syncing to final_end, a second plan at the same `now` is
    empty — the property behind idempotent re-sync (test_sync.py)."""
    (_, fe), _ = intervals(seconds, tail, now, None)
    (fs2, fe2), _ = intervals(seconds, tail, now, fe - seconds)
    assert fs2 == fe2 == fe


# -- wire codec --------------------------------------------------------------

finite_doubles = st.floats(allow_nan=False, allow_infinity=False, width=64)
paths = st.text(
    alphabet=st.characters(whitelist_categories=["L", "N"], whitelist_characters="._-"),
    min_size=1,
    max_size=40,
)


@given(path=paths, ts=finite_doubles, value=finite_doubles)
def test_wire_line_round_trip_exact(path, ts, value):
    """format → parse restores the exact doubles (repr round-trip)."""
    p, t, v = parse_line(format_line(path, ts, value))
    assert p == path
    assert t == ts or (math.isnan(t) and math.isnan(ts))
    assert v == value


# -- flat codec --------------------------------------------------------------

scalars = st.one_of(
    st.integers(-(10**9), 10**9),
    st.text(max_size=10),
    st.booleans(),
    st.floats(allow_nan=False, allow_infinity=False),
)
# keys: no separator dots, and not all-decimal (decimal keys are the
# list encoding and may not round-trip as dict keys by design)
keys = st.text(
    alphabet=st.characters(whitelist_categories=["L"], whitelist_characters="_-"),
    min_size=1,
    max_size=8,
)


def nested(depth=3):
    if depth == 0:
        return scalars
    return st.one_of(
        scalars,
        st.lists(nested(depth - 1), min_size=1, max_size=3),
        st.dictionaries(keys, nested(depth - 1), min_size=1, max_size=3),
    )


@settings(max_examples=200)
@given(st.dictionaries(keys, nested(), min_size=1, max_size=4))
def test_flatten_unflatten_round_trip(d):
    assert unflatten(flatten(d)) == d


@settings(max_examples=200)
@given(st.dictionaries(keys, nested(), min_size=1, max_size=4))
def test_flatten_is_flat(d):
    flat = flatten(d)
    for v in flat.values():
        assert not isinstance(v, (dict, list))


# -- Bloom filter kernel ------------------------------------------------------


@given(
    n=st.integers(1, 10**13),
    fpp=st.floats(1e-9, 0.5),
)
def test_bloom_params_always_sane(n, fpp):
    from smalltsdb_spark.operators.joins import BLOOM_MAX_BITS, _bloom_params

    m, k = _bloom_params(n, fpp)
    assert 64 <= m <= BLOOM_MAX_BITS
    assert m % 8 == 0
    assert 1 <= k <= 16


@given(
    hashes=st.lists(
        st.tuples(
            st.integers(-(2**63), 2**63 - 1), st.integers(-(2**63), 2**63 - 1)
        ),
        min_size=1,
        max_size=200,
    ),
    extra=st.tuples(
        st.integers(-(2**63), 2**63 - 1), st.integers(-(2**63), 2**63 - 1)
    ),
    fpp=st.sampled_from([0.5, 0.1, 0.01]),
)
@settings(max_examples=200)
def test_bloom_kernel_no_false_negatives(hashes, extra, fpp):
    """The pure bit-set/bit-test kernel bloom_semi_join runs on both
    sides: EVERY inserted (h1, h2) pair — including negative int64
    values, whose uint64 wraparound must match between build and probe —
    tests as a member.  False positives are allowed by design; false
    negatives are a correctness bug at any fpp."""
    import numpy as np

    from smalltsdb_spark.operators.joins import _bloom_params

    m, k = _bloom_params(len(hashes), fpp)
    bm = np.zeros(m // 8, dtype=np.uint8)
    a = np.array([h[0] for h in hashes], dtype=np.int64).astype(np.uint64)
    b = np.array([h[1] for h in hashes], dtype=np.int64).astype(np.uint64)
    for i in range(k):
        idx = (a + np.uint64(i) * b) % np.uint64(m)
        np.bitwise_or.at(
            bm,
            (idx >> np.uint64(3)).astype(np.int64),
            (np.uint64(1) << (idx & np.uint64(7))).astype(np.uint8),
        )

    def member(h1, h2):
        x = np.array([h1], dtype=np.int64).astype(np.uint64)
        y = np.array([h2], dtype=np.int64).astype(np.uint64)
        for i in range(k):
            idx = (x + np.uint64(i) * y) % np.uint64(m)
            if not (bm[int(idx[0]) >> 3] >> (int(idx[0]) & 7)) & 1:
                return False
        return True

    assert all(member(h1, h2) for h1, h2 in hashes)
    # an un-inserted pair may be a false positive but must never crash
    member(*extra)


# -- shingle-cover equivalence (the span-dedup family's theorem) -------------


def _dup_shingle_cover(docs: dict, k: int, min_count: int) -> dict:
    """Positions covered by globally-duplicated k-shingles (what the
    operators compute, mirrored in pure Python)."""
    from collections import Counter, defaultdict

    cnt = Counter()
    for t in docs.values():
        for i in range(len(t) - k + 1):
            cnt[tuple(t[i : i + k])] += 1
    cov = defaultdict(set)
    for d, t in docs.items():
        for i in range(len(t) - k + 1):
            if cnt[tuple(t[i : i + k])] >= min_count:
                cov[d] |= set(range(i, i + k))
    return cov


def _dup_span_cover(docs: dict, k: int, min_count: int) -> dict:
    """Positions covered by duplicated spans of ANY length >= k (the
    paper's definition — what a suffix array would compute)."""
    from collections import Counter, defaultdict

    cnt = Counter()
    for t in docs.values():
        for L in range(k, len(t) + 1):
            for i in range(len(t) - L + 1):
                cnt[tuple(t[i : i + L])] += 1
    cov = defaultdict(set)
    for d, t in docs.items():
        for L in range(k, len(t) + 1):
            for i in range(len(t) - L + 1):
                if cnt[tuple(t[i : i + L])] >= min_count:
                    cov[d] |= set(range(i, i + L))
    return cov


@given(
    texts=st.lists(
        st.lists(st.sampled_from("ab"), max_size=14), min_size=1, max_size=8
    ),
    k=st.integers(2, 4),
    min_count=st.integers(2, 3),
)
@settings(max_examples=400, deadline=None)
def test_shingle_cover_equals_span_cover(texts, k, min_count):
    """THE theorem replacing the suffix array (dedup.py span family): a
    position lies in some duplicated span of length >= k iff it lies in
    some duplicated k-shingle — because any duplicated span's length-k
    subwindows are each duplicated, and any duplicated k-shingle IS a
    duplicated span.  A tiny alphabet makes overlapping repeats dense —
    the adversarial regime for the equivalence."""
    docs = dict(enumerate(texts))
    assert _dup_shingle_cover(docs, k, min_count) == _dup_span_cover(
        docs, k, min_count
    )


@given(
    texts=st.lists(
        st.lists(st.sampled_from("abc"), max_size=12), min_size=1, max_size=6
    ),
    k=st.integers(2, 4),
)
@settings(max_examples=300, deadline=None)
def test_keep_first_strip_is_strict_subset_with_canonical_survivor(texts, k):
    """keep='first' invariants, shingle-level (mirrors the operator's
    election exactly): the stripped-position set is a SUBSET of
    remove-all's, and for every duplicated shingle the canonical
    occurrence is never stripped by its OWN hash group (it may still be
    clipped by an overlapping group — the documented corner case)."""
    from collections import defaultdict

    docs = dict(enumerate(texts))
    occ = defaultdict(list)
    for d, t in docs.items():
        for i in range(len(t) - k + 1):
            occ[tuple(t[i : i + k])].append((d, i))
    strip_all = defaultdict(set)
    strip_first = defaultdict(set)
    for s, occs in occ.items():
        if len(occs) >= 2:
            for d, i in occs:
                strip_all[d] |= set(range(i, i + k))
            canonical = sorted(occs)[0]
            for d, i in occs:
                if (d, i) != canonical:
                    strip_first[d] |= set(range(i, i + k))
    for d in docs:
        assert strip_first[d] <= strip_all[d]
