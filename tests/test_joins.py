"""asof_join (operators/joins.py) and rate (operators/aggregate.py).

The as-of join is an extension (reference has no joins beyond the HWM
left-equi-join, SURVEY.md §2.4); semantics pinned here match pandas
``merge_asof`` and DuckDB ``ASOF JOIN``: backward = greatest right ts <=
left ts per key, left-outer, deterministic max-payload tie-break.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from smalltsdb_spark.operators.aggregate import rate
from smalltsdb_spark.operators.joins import asof_join

LEFT = [("a", 10.0, "l1"), ("a", 25.0, "l2"), ("b", 5.0, "l3"), ("c", 7.0, "l4")]
RIGHT = [
    ("a", 10.0, 100.0),  # exact-ts match must be visible to l1
    ("a", 20.0, 200.0),
    ("a", 30.0, 300.0),
    ("b", 6.0, 400.0),  # after b's only left row → no backward match
]


def _frames(spark):
    left = spark.createDataFrame(LEFT, "k string, ts double, tag string")
    right = spark.createDataFrame(RIGHT, "k string, rts double, rv double")
    return left, right


def test_asof_backward(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, on="k", left_ts="ts", right_ts="rts")
    got = {r.tag: r.rv for r in out.collect()}
    assert got == {"l1": 100.0, "l2": 200.0, "l3": None, "l4": None}
    assert out.count() == 4  # left-outer: every left row survives


def test_asof_forward(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, on="k", left_ts="ts", right_ts="rts", direction="forward")
    got = {r.tag: r.rv for r in out.collect()}
    # earliest right ts >= left ts; exact ts still matches
    assert got == {"l1": 100.0, "l2": 300.0, "l3": 400.0, "l4": None}


def test_asof_tolerance(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, on="k", left_ts="ts", right_ts="rts", tolerance=5.0)
    got = {r.tag: r.rv for r in out.collect()}
    # l2 at 25 matches rts=20 (gap 5, inclusive); l1 exact (gap 0)
    assert got == {"l1": 100.0, "l2": 200.0, "l3": None, "l4": None}
    out2 = asof_join(left, right, on="k", left_ts="ts", right_ts="rts", tolerance=4.0)
    assert {r.tag: r.rv for r in out2.collect()}["l2"] is None


def test_asof_tie_picks_max_payload(spark):
    left = spark.createDataFrame([("a", 10.0)], "k string, ts double")
    right = spark.createDataFrame(
        [("a", 5.0, 1.0), ("a", 5.0, 2.0)], "k string, rts double, rv double"
    )
    out = asof_join(left, right, on="k", left_ts="ts", right_ts="rts")
    assert out.collect()[0].rv == 2.0  # deterministic: struct-max at equal ts


def test_asof_single_shuffle_plan(spark):
    """Scale property: the plan is one exchange on the key + window sort —
    no nested-loop / cartesian and no range-exploded join."""
    left, right = _frames(spark)
    plan = (
        asof_join(left, right, on="k", left_ts="ts", right_ts="rts")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
    assert plan.count("Exchange hashpartitioning(k") == 1


def test_rate(spark):
    agg = spark.createDataFrame(
        [("a", 0.0, 10.0), ("a", 60.0, 40.0), ("a", 240.0, 41.0), ("b", 0.0, 5.0)],
        "path string, timestamp double, sum double",
    )
    rows = {(r.path, r.timestamp): (r.delta, r.rate) for r in rate(agg).collect()}
    assert rows[("a", 0.0)] == (None, None)  # no predecessor
    assert rows[("a", 60.0)] == (30.0, 0.5)
    # honest across the 3-bucket gap: divide by observed 180 s, not 60
    assert rows[("a", 240.0)] == (1.0, 1.0 / 180.0)
    assert rows[("b", 0.0)] == (None, None)


def test_asof_matches_pandas_merge_asof(spark):
    """Randomized differential test: asof_join vs pandas.merge_asof over
    1000×1000 rows / 40 keys, both directions + tolerance, one seed.
    Right (key, ts) pairs are unique so tie-break ambiguity can't differ."""
    import numpy as np
    import pandas as pd

    rng = np.random.RandomState(7)
    nl, nr, nk = 1000, 1000, 40
    left_pd = pd.DataFrame(
        {
            "k": rng.randint(0, nk, nl).astype(np.int64),
            "ts": np.round(rng.uniform(0, 1000, nl), 3),
            "lid": np.arange(nl, dtype=np.int64),
        }
    )
    right_pd = (
        pd.DataFrame(
            {
                "k": rng.randint(0, nk, nr).astype(np.int64),
                "rts": np.round(rng.uniform(0, 1000, nr), 3),
                "rv": np.round(rng.uniform(-10, 10, nr), 6),
            }
        )
        .drop_duplicates(["k", "rts"])
    )
    left = spark.createDataFrame(left_pd)
    right = spark.createDataFrame(right_pd)

    for direction, tol in [("backward", None), ("forward", None), ("backward", 50.0)]:
        got = {
            r.lid: r.rv
            for r in asof_join(
                left, right, on="k", left_ts="ts", right_ts="rts",
                right_cols=["rv"], direction=direction, tolerance=tol,
            ).collect()
        }
        expect_pd = pd.merge_asof(
            left_pd.sort_values("ts"),
            right_pd.sort_values("rts"),
            left_on="ts",
            right_on="rts",
            by="k",
            direction=direction,
            **({"tolerance": tol} if tol is not None else {}),
        )
        expect = {
            int(r.lid): (None if pd.isna(r.rv) else float(r.rv))
            for r in expect_pd.itertuples()
        }
        assert got == expect, f"direction={direction} tolerance={tol}"


def test_asof_empty_right(spark):
    left, _ = _frames(spark)
    empty = spark.createDataFrame([], "k string, rts double, rv double")
    out = asof_join(left, empty, on="k", left_ts="ts", right_ts="rts")
    assert out.count() == 4
    assert all(r.rv is None for r in out.collect())


def test_asof_reserved_column_clash(spark):
    import pytest as _pytest

    left = spark.createDataFrame([("a", 1.0, 2.0)], "k string, ts double, _p double")
    right = spark.createDataFrame([("a", 1.0, 2.0)], "k string, rts double, rv double")
    with _pytest.raises(ValueError, match="clash"):
        asof_join(left, right, on="k", left_ts="ts", right_ts="rts")


def _brute_interval(points, intervals):
    out = []
    for pt in points:
        hits = [iv for iv in intervals if iv[1] <= pt[1] < iv[2]]
        out.extend((pt[0], iv[0]) for iv in hits) if hits else None
    return sorted(out)


def test_interval_join_inner_matches_brute_force(spark):
    from smalltsdb_spark.operators.joins import interval_join
    import numpy as np

    rng = np.random.RandomState(11)
    pts = [(int(i), float(round(rng.uniform(0, 500), 3))) for i in range(300)]
    ivs = [
        (int(100 + i), float(s), float(s + rng.uniform(1, 80)))
        for i, s in enumerate(rng.uniform(0, 500, 40))
    ]
    p = spark.createDataFrame(pts, "pid long, ts double")
    iv = spark.createDataFrame(ivs, "iid long, start double, end double")
    for bin_s in (10.0, 50.0, 1000.0):
        got = sorted(
            (r.pid, r.iid)
            for r in interval_join(p, iv, "ts", "start", "end", bin_s).collect()
        )
        assert got == _brute_interval(pts, ivs), f"bin={bin_s}"


def test_interval_join_left_keeps_unmatched(spark):
    from smalltsdb_spark.operators.joins import interval_join

    p = spark.createDataFrame(
        [(1, 5.0), (2, 50.0), (3, 15.0)], "pid long, ts double"
    )
    iv = spark.createDataFrame([(9, 10.0, 20.0)], "iid long, start double, end double")
    out = interval_join(p, iv, "ts", "start", "end", 10.0, how="left").collect()
    got = {r.pid: r.iid for r in out}
    assert got == {1: None, 2: None, 3: 9}
    assert len(out) == 3


def test_interval_join_no_nested_loop_plan(spark):
    from smalltsdb_spark.operators.joins import interval_join

    p = spark.createDataFrame([(1, 5.0)], "pid long, ts double")
    iv = spark.createDataFrame([(9, 1.0, 9.0)], "iid long, start double, end double")
    for how in ("inner", "left"):
        plan = (
            interval_join(p, iv, "ts", "start", "end", 10.0, how=how)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "BroadcastNestedLoop" not in plan and "Cartesian" not in plan, how


def test_asof_right_cols_duplicate_left_raises(spark):
    import pytest as _pytest

    left = spark.createDataFrame([("a", 1.0, 2.0)], "k string, ts double, rv double")
    right = spark.createDataFrame([("a", 1.0, 2.0)], "k string, rts double, rv double")
    with _pytest.raises(ValueError, match="duplicate left columns"):
        asof_join(left, right, on="k", left_ts="ts", right_ts="rts")


def test_asof_right_reserved_column_raises(spark):
    import pytest as _pytest

    left = spark.createDataFrame([("a", 1.0)], "k string, ts double")
    right = spark.createDataFrame([("a", 1.0, 2.0)], "k string, rts double, _p double")
    with _pytest.raises(ValueError, match="clash"):
        asof_join(left, right, on="k", left_ts="ts", right_ts="rts")


def test_interval_join_left_null_point_column_not_duplicated(spark):
    """A matched point row carrying a NULL in a payload column must appear
    exactly once (regression: equality-based recovery re-emitted it)."""
    from smalltsdb_spark.operators.joins import interval_join

    p = spark.createDataFrame(
        [(1, 15.0, None), (2, 50.0, "x")], "pid long, ts double, payload string"
    )
    iv = spark.createDataFrame([(9, 10.0, 20.0)], "iid long, start double, end double")
    out = interval_join(p, iv, "ts", "start", "end", 10.0, how="left").collect()
    assert len(out) == 2
    got = {r.pid: r.iid for r in out}
    assert got == {1: 9, 2: None}


def test_interval_join_left_duplicate_point_rows_kept(spark):
    """Two identical unmatched point rows stay two rows (regression: the
    distinct() in the old recovery collapsed them)."""
    from smalltsdb_spark.operators.joins import interval_join

    p = spark.createDataFrame([(1, 50.0), (1, 50.0)], "pid long, ts double")
    iv = spark.createDataFrame([(9, 10.0, 20.0)], "iid long, start double, end double")
    out = interval_join(p, iv, "ts", "start", "end", 10.0, how="left").collect()
    assert len(out) == 2


def test_interval_join_left_nondeterministic_points_lineage(spark):
    """The left path must be correct when points come out of a
    nondeterministically-ordered shuffle: the surrogate row id is
    evaluated in exactly one subtree, so re-evaluation divergence (the
    classic monotonically_increasing_id trap) cannot occur by
    construction."""
    from smalltsdb_spark.operators.joins import interval_join

    base = spark.createDataFrame(
        [(i, float(i)) for i in range(200)], "pid long, ts double"
    )
    # repartition by a key gives a shuffle whose within-partition order is
    # not a contract; downstream row ids may differ between evaluations
    p = base.repartition(7, "ts")
    iv = spark.createDataFrame(
        [(9, 50.0, 60.0), (10, 150.0, 160.0)],
        "iid long, start double, end double",
    )
    out = interval_join(p, iv, "ts", "start", "end", 10.0, how="left").collect()
    assert len(out) == 200  # every point exactly once
    matched = {r.pid: r.iid for r in out if r.iid is not None}
    assert matched == {
        **{i: 9 for i in range(50, 60)},
        **{i: 10 for i in range(150, 160)},
    }


# ---------------------------------------------------------------------------
# bloom_semi_join
# ---------------------------------------------------------------------------


def test_bloom_params_math():
    from smalltsdb_spark.operators.joins import BLOOM_MAX_BITS, _bloom_params

    m, k = _bloom_params(1000, 0.01)
    # textbook optimum: ~9.59 bits/key, ~7 hashes at 1% fpp
    assert 9000 <= m <= 10000 and k == 7
    assert m % 8 == 0
    # cap holds for absurd inputs, and k stays sane
    m, k = _bloom_params(10**12, 1e-9)
    assert m == BLOOM_MAX_BITS and 1 <= k <= 16


def test_bloom_semi_join_exact_equals_plain_semi(spark):
    from smalltsdb_spark.operators.joins import bloom_semi_join

    left = spark.createDataFrame(
        [(i, f"p{i % 7}") for i in range(500)], "k long, payload string"
    )
    right = spark.createDataFrame([(i,) for i in range(0, 500, 3)], "k long")
    got = sorted(map(tuple, bloom_semi_join(left, right, "k").collect()))
    want = sorted(map(tuple, left.join(right, "k", "left_semi").collect()))
    assert got == want
    # hint path: same result without the build-side count
    got_hint = sorted(
        map(tuple, bloom_semi_join(left, right, "k", expected_items=200).collect())
    )
    assert got_hint == want


def test_bloom_candidates_superset_and_bounded(spark):
    """exact=False returns every true match plus a bounded false-positive
    tail: with fpp=0.01 over 2000 non-matching keys, expect ~20 extras —
    assert a generous 5x bound so the test is not flaky, while still
    catching a broken filter (which would pass all 2000)."""
    from smalltsdb_spark.operators.joins import bloom_semi_join

    left = spark.createDataFrame([(i,) for i in range(2500)], "k long")
    right = spark.createDataFrame([(i,) for i in range(500)], "k long")
    cand = bloom_semi_join(left, right, "k", fpp=0.01, exact=False)
    ids = {r.k for r in cand.collect()}
    assert set(range(500)) <= ids  # no false negatives, ever
    extras = len(ids) - 500
    assert extras <= 0.05 * 2000  # 5x the 1% design fpp


def test_counter_rate_reset_semantics(spark):
    """A counter drop is a restart: increase counts from zero, never
    negative; first bucket per path gets nulls (no predecessor)."""
    from smalltsdb_spark.operators.aggregate import counter_rate

    agg = spark.createDataFrame(
        [("a", 0.0, 10.0), ("a", 60.0, 25.0), ("a", 120.0, 5.0),
         ("a", 240.0, 11.0), ("b", 0.0, 3.0)],
        "path string, timestamp double, max double",
    )
    got = {
        (r.path, r.timestamp): (r.increase, r.reset, r.rate)
        for r in counter_rate(agg).collect()
    }
    assert got[("a", 0.0)] == (None, None, None)      # no predecessor
    assert got[("a", 60.0)] == (15.0, False, 0.25)    # plain delta
    assert got[("a", 120.0)] == (5.0, True, 5.0 / 60) # reset: count from 0
    assert got[("a", 240.0)] == (6.0, False, 6.0 / 120)  # gap-aware divisor
    assert got[("b", 0.0)] == (None, None, None)
