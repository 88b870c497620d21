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
