"""Semantics tests for the round-4 pipeline operators on crafted inputs
(the parity sweep checks them against DuckDB; these pin the *intent*)."""

import pytest
from pyspark.sql import functions as F

from smalltsdb_spark.functions import md5_long
from smalltsdb_spark.operators import textstats


def _funnel(spark, rows):
    import smalltsdb_spark.queries_ext as qx

    # build an events-shaped frame and run the same step logic the query
    # uses, but from a local relation (the query reads parquet)
    e = spark.createDataFrame(rows, "user_id long, event_type string, t double")
    s1 = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("t").alias("t_view"))
    )
    s2 = (
        e.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter(F.col("t") >= F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("t").alias("t_click"))
    )
    s3 = (
        e.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter(F.col("t") >= F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("t").alias("t_purchase"))
    )
    out = s1.join(s2, "user_id", "left").join(s3, "user_id", "left")
    return {r.user_id: (r.t_view, r.t_click, r.t_purchase) for r in out.collect()}


def test_funnel_order_matters(spark):
    rows = [
        # user 1: clean funnel
        (1, "view", 10.0), (1, "click", 20.0), (1, "purchase", 30.0),
        # user 2: purchase BEFORE the view — must not count as converted
        (2, "purchase", 5.0), (2, "view", 10.0), (2, "click", 20.0),
        # user 3: click before view — click must not count, so no step 2/3
        (3, "click", 5.0), (3, "view", 10.0), (3, "purchase", 30.0),
    ]
    got = _funnel(spark, rows)
    assert got[1] == (10.0, 20.0, 30.0)
    assert got[2] == (10.0, 20.0, None)
    assert got[3] == (10.0, None, None)


def test_funnel_same_timestamp_counts(spark):
    # ties are inclusive: a click at exactly the view time advances
    got = _funnel(spark, [(1, "view", 10.0), (1, "click", 10.0)])
    assert got[1] == (10.0, 10.0, None)


def test_dataset_split_stable_under_growth(spark):
    """A document's split must not change when the corpus grows — the
    property hash assignment has and row_number()/random() do not."""
    docs1 = spark.createDataFrame(
        [(i, "x", "en") for i in range(50)], "doc_id long, text string, lang string"
    )
    docs2 = spark.createDataFrame(
        [(i, "x", "en") for i in range(200)], "doc_id long, text string, lang string"
    )

    def assign(df):
        bucket = md5_long(F.col("doc_id").cast("string"), "split") % 1000
        split = (
            F.when(bucket < 980, "train").when(bucket < 990, "valid").otherwise("test")
        )
        return {r.doc_id: r.s for r in df.select("doc_id", split.alias("s")).collect()}

    a1, a2 = assign(docs1), assign(docs2)
    assert all(a2[i] == a1[i] for i in range(50))


def test_tfidf_prefers_rare_terms(spark):
    """A term unique to one doc must outrank a corpus-wide term with the
    same tf."""
    docs = spark.createDataFrame(
        [
            (1, "common common unique unique"),
            (2, "common common other other"),
            (3, "common common filler filler"),
        ],
        "doc_id long, text string",
    )
    top = textstats.tfidf_topk(docs, "doc_id", "text", k=1)
    got = {r.doc_id: r.term for r in top.collect()}
    assert got[1] == "unique" and got[2] == "other" and got[3] == "filler"
    # the corpus-wide term has idf = ln(1) = 0 -> never the top pick
    assert "common" not in got.values()


def test_novelty_first_doc_owns_grams(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b c d"),          # introduces all 3 bigrams
            (2, "a b c d"),          # introduces nothing
            (3, "a b x y"),          # introduces 2 of 3 ("b x", "x y")
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in textstats.novelty(docs, "doc_id", "text").collect()}
    assert got[1].novelty_frac == 1.0
    assert got[2].novelty_frac == 0.0
    assert got[3].novel_grams == 2 and got[3].n_grams == 3


def test_mad_robust_to_outliers(spark):
    """The MAD threshold flags the planted outlier; mean/std would have
    been dragged by it — median/MAD are not."""
    vals = [10.0 + 0.1 * i for i in range(99)] + [10_000.0]
    e = spark.createDataFrame(
        [("p", v) for v in vals], "path string, value double"
    )
    med = e.groupBy("path").agg(
        F.round(F.percentile("value", F.lit(0.5)), 6).alias("med")
    )
    stats = (
        e.join(med, "path")
        .groupBy("path")
        .agg(
            F.min("med").alias("med"),
            F.round(
                F.percentile(F.abs(F.col("value") - F.col("med")), F.lit(0.5)), 6
            ).alias("mad"),
        )
    )
    out = (
        e.join(stats, "path")
        .groupBy("path")
        .agg(
            F.sum(
                (
                    F.abs(F.col("value") - F.col("med"))
                    > F.lit(4.4478) * F.col("mad")
                ).cast("long")
            ).alias("n_outliers")
        )
        .collect()[0]
    )
    assert out.n_outliers == 1


def test_interleave_is_round_robin_permutation(spark):
    """ext_interleave's arithmetic seq must be (a) a permutation of
    1..N, (b) order-preserving within each source, and (c) round-robin:
    a doc's round r may only be preceded by docs of round < r or
    same-round docs of lexicographically earlier sources — checked here
    on skewed source sizes (3/1/2), independent of the oracle-equality
    driver row."""
    from smalltsdb_spark.queries_ext import ext_interleave
    import tempfile

    docs = spark.createDataFrame(
        [(1, "A"), (2, "A"), (3, "A"), (4, "B"), (5, "C"), (6, "C")],
        "doc_id long, source string",
    )
    d = tempfile.mkdtemp()
    docs.write.mode("overwrite").parquet(f"{d}/documents.parquet")
    rows = ext_interleave(spark, d).collect()

    assert sorted(r.seq for r in rows) == list(range(1, 7))
    by_source = {}
    for r in rows:
        by_source.setdefault(r.source, []).append((r.r, r.seq))
    for source, pairs in by_source.items():
        pairs.sort()
        seqs = [s for _, s in pairs]
        assert seqs == sorted(seqs), (source, pairs)
    # global order sorted by seq must be sorted by (round, source)
    ordering = [(r.r, r.source) for r in sorted(rows, key=lambda r: r.seq)]
    assert ordering == sorted(ordering), ordering


def test_reaggregate_cascade_equals_direct_aggregation(spark):
    """The cascade claim (operators/aggregate.reaggregate): deriving a
    coarse period from a fine one is EXACT for n/min/max/sum/avg —
    equal to aggregating raw data directly at the coarse period (float
    tolerance only for sum/avg, whose addend grouping differs)."""
    import math
    import random

    from smalltsdb_spark.operators.aggregate import aggregate, reaggregate

    rng = random.Random(7)
    rows = [
        (f"m{i % 3}", float(rng.uniform(0, 7200)), float(rng.uniform(-50, 150)))
        for i in range(3000)
    ]
    inc = spark.createDataFrame(
        rows, "path string, timestamp double, value double"
    )
    direct = {
        (r.path, r.timestamp): r.asDict()
        for r in aggregate(inc, 3600).collect()
    }
    cascade = {
        (r.path, r.timestamp): r.asDict()
        for r in reaggregate(aggregate(inc, 10), 3600).collect()
    }
    assert set(direct) == set(cascade)
    for key, d in direct.items():
        c = cascade[key]
        assert c["n"] == d["n"] and c["min"] == d["min"] and c["max"] == d["max"]
        assert math.isclose(c["sum"], d["sum"], rel_tol=1e-12)
        assert math.isclose(c["avg"], d["avg"], rel_tol=1e-12)
        assert set(c) == {"path", "timestamp", "n", "min", "max", "avg", "sum"}


def test_histogram_quantile_bounds_contain_exact_percentiles(spark):
    """The cascade quantile companion's containment contract (VERDICT r9
    item 5): on seeded random data (negatives included), every exact
    interpolated percentile lies inside the histogram-derived [lo, hi]
    interval, and the fine->coarse merged bounds EQUAL bounds computed
    from a directly-built coarse histogram (counts are algebraic)."""
    import random

    from smalltsdb_spark.operators.aggregate import (
        aggregate,
        histogram_quantile_bounds,
        value_histogram,
    )

    rng = random.Random(11)
    rows = [
        (f"m{i % 3}", float(rng.uniform(0, 7200)), float(rng.uniform(-120, 1100)))
        for i in range(4000)
    ]
    inc = spark.createDataFrame(
        rows, "path string, timestamp double, value double"
    )
    got = {
        (r.path, r.timestamp): r.asDict()
        for r in histogram_quantile_bounds(
            value_histogram(inc, 60), 3600
        ).collect()
    }
    direct = {
        (r.path, r.timestamp): r.asDict()
        for r in histogram_quantile_bounds(
            value_histogram(inc, 3600), 3600
        ).collect()
    }
    assert got == direct  # merge-equivalence: cascade == direct histogram
    exact = {
        (r.path, r.timestamp): r.asDict()
        for r in aggregate(inc, 3600).collect()
    }
    assert set(got) == set(exact)
    saw_unbounded = saw_bounded = False
    for key, b in got.items():
        e = exact[key]
        assert b["n"] == e["n"]
        for name in ("p50", "p90", "p99"):
            lo, hi = b[f"{name}_lo"], b[f"{name}_hi"]
            assert e[name] >= lo - 1e-9, (key, name)
            if hi is None:
                saw_unbounded = True  # rank in the clamp bin: honest tail
            else:
                saw_bounded = True
                assert e[name] <= hi + 1e-9, (key, name)
    assert saw_bounded and saw_unbounded


def test_histogram_quantile_bounds_bin_arithmetic(spark):
    """Crafted cases pin the rank->bin arithmetic: 100 uniform values
    0..99 in one bucket put p50's two order stats (49, 50) in bins 0 and
    1 -> [0, 100]; p90's (89.1 -> ranks 90, 91 -> values 89, 90) in bin
    1 -> [50, 100]; p99 (98.01 -> values 98, 99) in bin 1 -> [50, 100];
    a single-value bucket collapses every interval to its own bin."""
    from smalltsdb_spark.operators.aggregate import (
        histogram_quantile_bounds,
        value_histogram,
    )

    rows = [("a", float(i), float(i)) for i in range(100)]
    rows.append(("b", 3.0, 75.0))
    inc = spark.createDataFrame(
        rows, "path string, timestamp double, value double"
    )
    got = {
        r.path: r.asDict()
        for r in histogram_quantile_bounds(
            value_histogram(inc, 3600), 3600
        ).collect()
    }
    a = got["a"]
    assert (a["p50_lo"], a["p50_hi"]) == (0.0, 100.0)
    assert (a["p90_lo"], a["p90_hi"]) == (50.0, 100.0)
    assert (a["p99_lo"], a["p99_hi"]) == (50.0, 100.0)
    b = got["b"]
    assert b["n"] == 1
    for name in ("p50", "p90", "p99"):
        assert (b[f"{name}_lo"], b[f"{name}_hi"]) == (50.0, 100.0)


def test_histogram_quantile_bounds_clamp_tail_is_null(spark):
    """Values at/above the clamp bin edge make hi NULL (unbounded tail),
    while lo still reports the clamp bin's lower edge."""
    from smalltsdb_spark.operators.aggregate import (
        histogram_quantile_bounds,
        value_histogram,
    )

    inc = spark.createDataFrame(
        [("a", 0.0, 2000.0), ("a", 1.0, 3000.0)],
        "path string, timestamp double, value double",
    )
    [r] = histogram_quantile_bounds(
        value_histogram(inc, 3600), 3600
    ).collect()
    assert r.p99_lo == 950.0 and r.p99_hi is None


def test_reaggregate_rejects_non_divisible_coarse_period(spark):
    """ADVICE r9: a coarse period that is not a multiple of the fine
    bucket width would silently misassign straddling buckets — with
    fine_seconds passed (as the cascade path does) it raises instead."""
    from smalltsdb_spark.operators.aggregate import aggregate, reaggregate

    inc = spark.createDataFrame(
        [("p", 1.0, 1.0)], "path string, timestamp double, value double"
    )
    fine = aggregate(inc, 7)
    with pytest.raises(ValueError, match="not a multiple"):
        reaggregate(fine, 3600, fine_seconds=7)
    # divisible passes (and still works without fine_seconds — caller-owned)
    assert reaggregate(aggregate(inc, 10), 3600, fine_seconds=10).count() == 1


def test_histogram_bounds_reject_non_divisible_coarse_period(spark):
    """ADVICE r10: histogram_quantile_bounds coarsens with the same
    floor(timestamp/seconds) arithmetic as reaggregate, so it needs the
    same divisibility guard — a fine histogram bucket straddling a
    coarse boundary would merge its counts wholly into the floor
    bucket, producing plausible but wrong quantile bounds."""
    from smalltsdb_spark.operators.aggregate import (
        histogram_quantile_bounds,
        value_histogram,
    )

    inc = spark.createDataFrame(
        [("p", 1.0, 1.0)], "path string, timestamp double, value double"
    )
    hist = value_histogram(inc, 7)
    with pytest.raises(ValueError, match="not a multiple"):
        histogram_quantile_bounds(hist, 3600, fine_seconds=7)
    # divisible passes (and still works without fine_seconds — caller-owned)
    assert (
        histogram_quantile_bounds(
            value_histogram(inc, 60), 3600, fine_seconds=60
        ).count()
        == 1
    )


def test_reaggregate_chain_is_transitive(spark):
    """The cascade composes: 10s -> 60s -> 3600s -> 86400s through three
    reaggregate hops equals aggregating raw directly at the day period —
    the property that lets a real deployment maintain each coarse table
    from the NEXT FINER one (maximum compression at every hop) instead
    of always re-reading tensecond."""
    import math
    import random

    from smalltsdb_spark.operators.aggregate import aggregate, reaggregate

    rng = random.Random(23)
    rows = [
        (f"m{i % 2}", float(rng.uniform(0, 2 * 86400)), float(rng.uniform(-5, 5)))
        for i in range(2000)
    ]
    inc = spark.createDataFrame(
        rows, "path string, timestamp double, value double"
    )
    chained = reaggregate(
        reaggregate(
            reaggregate(aggregate(inc, 10), 60, fine_seconds=10),
            3600,
            fine_seconds=60,
        ),
        86400,
        fine_seconds=3600,
    )
    direct = {
        (r.path, r.timestamp): r.asDict() for r in aggregate(inc, 86400).collect()
    }
    got = {(r.path, r.timestamp): r.asDict() for r in chained.collect()}
    assert set(got) == set(direct)
    for key, d in direct.items():
        c = got[key]
        assert c["n"] == d["n"] and c["min"] == d["min"] and c["max"] == d["max"]
        assert math.isclose(c["sum"], d["sum"], rel_tol=1e-12)
        assert math.isclose(c["avg"], d["avg"], rel_tol=1e-12)
