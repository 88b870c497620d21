"""Second wave of relational/window breadth: as-of join, counter rate,
ROLLUP grouping, exact distinct aggregation, deterministic sampling.

Registered into the same driver registry as :mod:`queries` (import-time
side effect, like :mod:`queries_ext`).  Every query has a DuckDB oracle;
all computed doubles are rounded to 6 decimals on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from smalltsdb_spark.operators.aggregate import aggregate, rate
from smalltsdb_spark.operators.joins import asof_join
from smalltsdb_spark.queries import _t, events_as_incoming, query, read_events


@query(
    "rel_asof_latest_order",
    """
    SELECT event_id, user_id, o_orderkey,
           round(o_totalprice, 6) AS o_totalprice
    FROM (
        SELECT e.event_id, e.user_id, o.o_orderkey, o.o_totalprice,
               row_number() OVER (
                   PARTITION BY e.event_id
                   ORDER BY o.o_orderdate DESC, o.o_totalprice DESC,
                            o.o_orderkey DESC
               ) AS rn
        FROM events e
        LEFT JOIN orders o
          ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
    ) WHERE rn = 1
    """,
)
def rel_asof_latest_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of (temporal) join — SURVEY.md §2.4 ABSENT row, implemented
    Spark-first as union + carry-forward window (operators/joins.py):
    each event enriched with the user's most recent order at or before
    the event time.  The oracle is the quadratic-per-key formulation;
    the engine's is the linear single-sort one — same answer."""
    ev = read_events(spark, sf_dir).select(
        "event_id", F.col("user_id"), F.col("ts_sec")
    )
    orders = _t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("user_id"),
        # NTZ → TZ (session tz is pinned UTC) → epoch double, matching
        # DuckDB's epoch() on the same column
        F.col("o_orderdate").cast("timestamp").cast("double").alias("o_ts"),
        "o_orderkey",
        "o_totalprice",
    )
    joined = asof_join(
        ev,
        orders,
        on="user_id",
        left_ts="ts_sec",
        right_ts="o_ts",
        right_cols=["o_totalprice", "o_orderkey"],
    )
    return joined.select(
        "event_id",
        "user_id",
        "o_orderkey",
        F.round("o_totalprice", 6).alias("o_totalprice"),
    )


@query(
    "tsdb_rate_oneminute",
    """
    WITH agg AS (
        SELECT event_type AS path,
               floor(epoch(ts) / 60) * 60 AS "timestamp",
               round(sum(value), 6) AS s
        FROM events GROUP BY 1, 2
    )
    SELECT path, "timestamp",
           s AS sum,
           floor((s - lag(s) OVER w) * 1e6 + 0.5) / 1e6 AS delta,
           floor((s - lag(s) OVER w)
                 / ("timestamp" - lag("timestamp") OVER w) * 1e6 + 0.5) / 1e6
               AS rate
    FROM agg
    WINDOW w AS (PARTITION BY path ORDER BY "timestamp")
    """,
)
def tsdb_rate_oneminute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Counter rate/delta (SURVEY.md §2.5 — the analytic-window family the
    reference lacks): lag over per-path bucket timeline, honest across
    missing buckets (divides by observed gap).

    Two cross-engine fp precautions: the lag inputs are the *pre-rounded*
    sums (deltas of raw parallel sums can land on opposite sides of a
    rounding boundary), and delta/rate are rounded with the pure-IEEE
    ``floor(x*1e6 + 0.5)/1e6`` — Spark's ``round`` goes through the
    shortest decimal string (HALF_UP on Double.toString) while DuckDB
    rounds the exact binary value, and they disagree on exact halves
    (seen live: 246.18/960 = 0.2564375 → 0.256438 vs 0.256437)."""
    agg = aggregate(events_as_incoming(spark, sf_dir), 60).withColumn(
        "sum", F.round("sum", 6)
    )
    r = rate(agg, stat="sum")
    round6 = lambda c: F.floor(F.col(c) * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)  # noqa: E731
    return r.select(
        "path",
        "timestamp",
        "sum",
        round6("delta").alias("delta"),
        round6("rate").alias("rate"),
    )


@query(
    "rel_rollup",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(grouping(l_returnflag, l_linestatus) AS BIGINT) AS g,
           round(sum(l_extendedprice), 4) AS sum_price,
           count(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def rel_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets (SURVEY.md §2.3 ABSENT row) over *algebraic*
    aggregates only — the reference deliberately refuses hierarchical
    re-aggregation for percentiles (IDEAS.md:4) and so do we; sum/count
    re-aggregate losslessly, so rollup is sound here."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().cast("long").alias("g"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_price"),
            F.count("*").alias("n"),
        )
        .select("l_returnflag", "l_linestatus", "g", "sum_price", "n")
    )


@query(
    "rel_distinct_users",
    """
    SELECT event_type,
           count(DISTINCT user_id) AS n_users,
           count(*) AS n_events
    FROM events GROUP BY event_type
    """,
)
def rel_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct aggregation (SURVEY.md §2.3 ABSENT row).  Catalyst
    expands count(DISTINCT) into a two-phase expand+agg; at 100 TB the
    documented scale alternative is approx_count_distinct (HLL sketch,
    mergeable map-side) — kept out of the oracle because sketches are
    engine-specific."""
    ev = read_events(spark, sf_dir)
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count("*").alias("n_events"),
    )


@query(
    "rel_distinct_users_approx",
    """
    SELECT CAST(0 AS BIGINT) AS violations,
           CAST(count(DISTINCT event_type) AS BIGINT) AS n_groups
    FROM events
    """,
)
def rel_distinct_users_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB distinct-count mode — approx_count_distinct (HLL++
    sketch, mergeable map-side, no expand) — with its own value-gated
    driver row, same self-check pattern as tsdb_agg_onehour_approx:
    per group |approx − exact| must be within 3x the configured rsd
    (0.05), a bound the sketch's error distribution clears with wide
    margin on fixed data; the returned (violations, n_groups) row is
    hash-exact against a constant oracle, so a sketch regression >15%
    flips the row red while the comparison stays exact."""
    ev = read_events(spark, sf_dir)
    g = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("_exact"),
        F.approx_count_distinct("user_id", 0.05).alias("_approx"),
    )
    bad = (
        F.abs(F.col("_approx") - F.col("_exact"))
        > F.lit(0.15) * F.col("_exact")
    )
    return g.agg(
        F.sum(bad.cast("long")).alias("violations"),
        F.count("*").alias("n_groups"),
    )


@query(
    "rel_interval_join",
    """
    SELECT a.event_id, count(b.event_id) AS n_following
    FROM events a
    LEFT JOIN events b
      ON epoch(b.ts) >= epoch(a.ts) AND epoch(b.ts) < epoch(a.ts) + 60
     AND b.event_id <> a.event_id
    WHERE a.event_type = 'click'
    GROUP BY a.event_id
    """,
)
def rel_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed range join (operators/joins.interval_join): for each
    click, how many other events land in its following 60-second window.
    The engine's bin-bucketed equi-join + refine never builds a
    nested-loop plan (plan-shape-tested); the oracle is the plain
    quadratic non-equi join."""
    from smalltsdb_spark.operators.joins import interval_join

    ev = read_events(spark, sf_dir)
    points = ev.select(F.col("event_id").alias("p_id"), F.col("ts_sec"))
    windows = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id"),
        F.col("ts_sec").alias("w_start"),
        (F.col("ts_sec") + 60.0).alias("w_end"),
    )
    return (
        # inner: every click window contains the click itself, so no
        # zero-match window exists to preserve
        interval_join(points, windows, "ts_sec", "w_start", "w_end", 60.0)
        .groupBy("event_id")
        .agg(
            F.count(F.when(F.col("p_id") != F.col("event_id"), 1)).alias("n_following")
        )
    )
