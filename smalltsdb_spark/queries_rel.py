"""Second wave of relational/window breadth: as-of join, counter rate,
ROLLUP grouping, exact distinct aggregation, deterministic sampling.

Registered into the same driver registry as :mod:`queries` (import-time
side effect, like :mod:`queries_ext`).  Every query has a DuckDB oracle;
all computed doubles are rounded to 6 decimals on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
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


@query(
    "tsdb_histogram",
    """
    SELECT event_type AS path,
           floor(epoch(ts) / 60) * 60 AS "timestamp",
           CAST(least(floor(value / 50), 19) AS BIGINT) AS bin,
           count(*) AS n
    FROM events
    GROUP BY 1, 2, 3
    """,
)
def tsdb_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-bucket value histogram — the heatmap feed a TSDB UI renders
    when a single percentile line hides the distribution (the reference
    stores 3 fixed quantiles; a histogram is the generalization).  Bins
    are fixed-width (50, clamped to 20 bins) so counts are mergeable
    across buckets/paths — unlike quantiles, histograms re-aggregate
    losslessly, which is what makes them the scale-friendly shape.

    One map-side-combined groupBy on (path, bucket, bin) — a scan
    expression, no joins, no window; at 100 TB it is the same single
    shuffle as the core aggregation with 20× the key cardinality."""
    inc = events_as_incoming(spark, sf_dir)
    b = F.floor(F.col("timestamp") / 60).cast("long") * 60
    bin_ = F.least(F.floor(F.col("value") / 50), F.lit(19)).cast("long")
    return (
        inc.groupBy(
            "path",
            b.cast("double").alias("timestamp"),
            bin_.alias("bin"),
        )
        .agg(F.count("*").alias("n"))
    )


@query(
    "tsdb_downsample",
    """
    WITH pts AS (
        SELECT event_type AS path, epoch(ts) AS ts_sec, value,
               floor(epoch(ts) / 3600) * 3600 AS bts
        FROM events
    ),
    stats AS (
        SELECT path, bts,
               floor(avg(value) * 1e6 + 0.5) / 1e6 AS bavg,
               count(*) AS n
        FROM pts GROUP BY 1, 2
    ),
    dev AS (
        SELECT p.path, p.bts, p.ts_sec, p.value, s.bavg, s.n,
               row_number() OVER (
                   PARTITION BY p.path, p.bts
                   ORDER BY floor(abs(p.value - s.bavg) * 1e6 + 0.5) / 1e6 DESC,
                            p.ts_sec, p.value
               ) AS rn
        FROM pts p JOIN stats s ON p.path = s.path AND p.bts = s.bts
    )
    SELECT path, bts AS "timestamp", round(ts_sec, 6) AS point_ts, value,
           bavg AS bucket_avg, n
    FROM dev WHERE rn = 1
    """,
)
def tsdb_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graphing downsample: one representative RAW point per
    (path, onehour bucket) — the point deviating most from the bucket
    mean, so spikes survive the downsample instead of averaging away
    (the parallel-friendly core of largest-triangle downsampling; true
    LTTB chains bucket choices sequentially and cannot scale out).

    Shape: both the bucket-mean window and the ranking window partition
    by (path, bucket), so Catalyst plans ONE exchange and sorts within
    it — no join, no second shuffle (AQE reuses the partitioning).  The
    deviation key is pre-rounded on both engines (pure-IEEE
    ``floor(x*1e6+0.5)/1e6`` — the tsdb_rate precedent) so parallel-sum
    fp noise in the mean cannot flip the ranking."""
    round6 = lambda c: F.floor(c * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)  # noqa: E731
    inc = events_as_incoming(spark, sf_dir)
    pts = inc.select(
        "path",
        F.col("timestamp").alias("ts_sec"),
        "value",
        (F.floor(F.col("timestamp") / 3600).cast("long") * 3600)
        .cast("double")
        .alias("bts"),
    )
    wb = Window.partitionBy("path", "bts")
    pts = pts.withColumn("bavg", round6(F.avg("value").over(wb))).withColumn(
        "n", F.count("*").over(wb)
    )
    wr = Window.partitionBy("path", "bts").orderBy(
        F.desc(round6(F.abs(F.col("value") - F.col("bavg")))), "ts_sec", "value"
    )
    return (
        pts.withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") == 1)
        .select(
            "path",
            F.col("bts").alias("timestamp"),
            F.round("ts_sec", 6).alias("point_ts"),
            "value",
            F.col("bavg").alias("bucket_avg"),
            "n",
        )
    )


#: rel_pivot's pivoted columns — explicit so the plan never pays the
#: distinct-values discovery job and the output schema is deterministic
PIVOT_TYPES = ["click", "error", "purchase", "signup", "view"]


@query(
    "rel_pivot",
    f"""
    SELECT CAST(user_id % 10 AS BIGINT) AS cohort,
           {", ".join(
               f"round(coalesce(sum(CASE WHEN event_type = '{t}' "
               f"THEN value END), 0), 6) AS {t}"
               for t in PIVOT_TYPES
           )}
    FROM events
    GROUP BY 1
    """,
)
def rel_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT (long→wide reshape): per user cohort, total value by event
    type as columns — the report-matrix shape every BI layer asks for.
    The pivot values are DECLARED (PIVOT_TYPES), not discovered, so
    Catalyst compiles straight to one groupBy with conditional
    aggregates — a single map-side-combined shuffle, no extra job, no
    schema surprises when a new event type appears upstream (it is
    deliberately excluded until declared).  Empty cells coalesce to 0
    on both engines."""
    ev = read_events(spark, sf_dir)
    p = (
        ev.groupBy((F.col("user_id") % 10).cast("long").alias("cohort"))
        .pivot("event_type", PIVOT_TYPES)
        .agg(F.sum("value"))
    )
    return p.select(
        "cohort",
        *[F.round(F.coalesce(F.col(t), F.lit(0.0)), 6).alias(t) for t in PIVOT_TYPES],
    )


@query(
    "tsdb_seasonal",
    """
    WITH agg AS (
        SELECT event_type AS path,
               floor(epoch(ts) / 3600) * 3600 AS "timestamp",
               floor(avg(value) * 1e6 + 0.5) / 1e6 AS bucket_avg,
               count(*) AS n
        FROM events GROUP BY 1, 2
    ),
    season AS (
        SELECT path,
               CAST(floor("timestamp" / 3600) AS BIGINT) % 24 AS hod,
               floor(avg(bucket_avg) * 1e6 + 0.5) / 1e6 AS baseline
        FROM agg GROUP BY 1, 2
    )
    SELECT a.path, a."timestamp", a.bucket_avg, s.baseline,
           a.bucket_avg - s.baseline AS deviation
    FROM agg a
    JOIN season s
      ON a.path = s.path
     AND CAST(floor(a."timestamp" / 3600) AS BIGINT) % 24 = s.hod
    """,
)
def tsdb_seasonal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal (hour-of-day) baseline and deviation — the diurnal-cycle
    anomaly view: each hourly bucket compared against the average of
    ALL buckets sharing its hour-of-day for that path, so "traffic is
    low" at 4am is normal and at 2pm is an incident.  Complements
    tsdb_anomaly_mad (which is season-blind).

    Shape: the hourly rollup (one map-side-combined shuffle), a 24×paths
    baseline relation aggregated FROM the rollup (second tiny shuffle),
    and a broadcast join back — the baseline side is bounded by
    paths×24 regardless of corpus size, so the join never shuffles the
    rollup again at 100 TB.  Averages are pre-rounded with the
    pure-IEEE floor(x*1e6+0.5)/1e6 on both engines; the deviation is a
    subtraction of two identically-rounded doubles, bit-stable."""
    round6 = lambda c: F.floor(c * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)  # noqa: E731
    inc = events_as_incoming(spark, sf_dir)
    agg = (
        inc.groupBy(
            "path",
            (F.floor(F.col("timestamp") / 3600).cast("long") * 3600)
            .cast("double")
            .alias("timestamp"),
        )
        .agg(
            round6(F.avg("value")).alias("bucket_avg"),
            F.count("*").alias("n"),
        )
    )
    hod = F.pmod(F.floor(F.col("timestamp") / 3600).cast("long"), F.lit(24))
    season = agg.groupBy("path", hod.alias("hod")).agg(
        round6(F.avg("bucket_avg")).alias("baseline")
    )
    return (
        agg.withColumn("hod", hod)
        .join(F.broadcast(season), ["path", "hod"])
        .select(
            "path",
            "timestamp",
            "bucket_avg",
            "baseline",
            (F.col("bucket_avg") - F.col("baseline")).alias("deviation"),
        )
    )


@query(
    "tsdb_burn_rate",
    """
    WITH b AS (
        SELECT floor(epoch(ts) / 60) * 60 AS "timestamp",
               count(CASE WHEN event_type = 'error' THEN 1 END) AS n_err,
               count(*) AS n_all
        FROM events GROUP BY 1
    ),
    w AS (
        SELECT "timestamp", n_err, n_all,
               CAST(sum(n_err) OVER w5 AS BIGINT) AS err_5m,
               CAST(sum(n_all) OVER w5 AS BIGINT) AS all_5m,
               CAST(sum(n_err) OVER w60 AS BIGINT) AS err_1h,
               CAST(sum(n_all) OVER w60 AS BIGINT) AS all_1h
        FROM b
        WINDOW w5 AS (ORDER BY "timestamp"
                      RANGE BETWEEN 240 PRECEDING AND CURRENT ROW),
               w60 AS (ORDER BY "timestamp"
                       RANGE BETWEEN 3540 PRECEDING AND CURRENT ROW)
    )
    SELECT "timestamp", n_err, n_all, err_5m, all_5m, err_1h, all_1h,
           CAST(err_5m AS DOUBLE) / CAST(all_5m AS DOUBLE) AS rate_5m,
           CAST(err_1h AS DOUBLE) / CAST(all_1h AS DOUBLE) AS rate_1h,
           CASE WHEN err_1h = 0 THEN NULL
                ELSE (CAST(err_5m AS DOUBLE) / CAST(all_5m AS DOUBLE))
                     / (CAST(err_1h AS DOUBLE) / CAST(all_1h AS DOUBLE))
           END AS burn
    FROM w
    """,
)
def tsdb_burn_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-window SLO burn rate — the alerting query behind
    error-budget policies: per minute, the error fraction over the
    trailing 5-minute and 1-hour windows and their ratio (a burn > 1
    means the last 5 minutes are consuming budget faster than the
    hourly trend; page when both windows exceed thresholds).

    Shape: one map-side-combined minute rollup, then RANGE-frame
    running sums over the single global bucket timeline — at 100 TB
    the timeline is still only minutes×1 rows (the heavy lifting
    happened in the rollup shuffle), so the unpartitioned window is a
    bounded relation, not a corpus sort.  All rates are raw IEEE
    divisions of identical integers (bit-stable); the 1h/5m windows
    share one sort.  The windowed sums are CAST to BIGINT in the oracle
    — DuckDB's integer sum() yields HUGEINT, which the driver's pandas
    fetch coerces to float64 ("123.0" ≠ Spark's "123"; the r3/r4
    hash-miss cause)."""
    inc = events_as_incoming(spark, sf_dir)
    b = (
        inc.groupBy(
            (F.floor(F.col("timestamp") / 60).cast("long") * 60)
            .cast("double")
            .alias("timestamp")
        )
        .agg(
            F.count(F.when(F.col("path") == "error", 1)).alias("n_err"),
            F.count("*").alias("n_all"),
        )
    )
    ts = F.col("timestamp").cast("long")
    w5 = Window.orderBy(ts).rangeBetween(-240, 0)
    w60 = Window.orderBy(ts).rangeBetween(-3540, 0)
    w = b.select(
        "timestamp",
        "n_err",
        "n_all",
        F.sum("n_err").over(w5).alias("err_5m"),
        F.sum("n_all").over(w5).alias("all_5m"),
        F.sum("n_err").over(w60).alias("err_1h"),
        F.sum("n_all").over(w60).alias("all_1h"),
    )
    rate5 = F.col("err_5m").cast("double") / F.col("all_5m").cast("double")
    rate1h = F.col("err_1h").cast("double") / F.col("all_1h").cast("double")
    return w.select(
        "timestamp",
        "n_err",
        "n_all",
        "err_5m",
        "all_5m",
        "err_1h",
        "all_1h",
        rate5.alias("rate_5m"),
        rate1h.alias("rate_1h"),
        F.when(F.col("err_1h") == 0, F.lit(None).cast("double"))
        .otherwise(rate5 / rate1h)
        .alias("burn"),
    )


@query(
    "rel_regional_revenue",
    """
    SELECT n_name,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
           count(*) AS n_items
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
    GROUP BY n_name
    """,
)
def rel_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Six-table star join (the TPC-H Q5 shape — local supplier volume):
    revenue from lineitems where customer and supplier share a nation in
    one region.  The fact table (lineitem) is joined once; every
    dimension (supplier, customer→orders bridge aside) is
    broadcast-small, and the region filter prunes nation BEFORE the
    fact join, so Catalyst's join reordering + AQE keeps exactly the
    fact-side shuffles (orders⋈customer, lineitem⋈orders) and
    broadcasts the rest — the plan a 100 TB star schema needs."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            s,
            (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(n, s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


@query(
    "rel_small_qty_revenue",
    """
    WITH li AS (
        SELECT l_partkey, l_quantity, l_extendedprice
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_brand = 'Brand#21'
    ),
    pa AS (SELECT l_partkey, avg(l_quantity) AS avg_qty
           FROM li GROUP BY l_partkey)
    SELECT round(sum(l_extendedprice) / 7.0, 6) AS avg_yearly,
           count(*) AS n_small
    FROM li JOIN pa USING (l_partkey)
    WHERE l_quantity < 0.2 * avg_qty
    """,
)
def rel_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-quantity-order revenue (the TPC-H Q17 shape): yearly revenue
    lost if orders below 20% of a part's average order quantity were no
    longer filled — the classic CORRELATED SCALAR SUBQUERY, expressed as
    its decorrelated form: one brand-pruned fact slice, a per-part avg
    over that slice, and a join-back with the threshold filter.

    Determinism note: l_quantity is integer-valued, so the per-part avg
    is an exact integer sum over a double divide — bit-identical across
    engines and summation orders; the 0.2·avg row-membership boundary
    therefore cannot flip (unlike a general double aggregate, where
    membership predicates need the floor(x*1e6+0.5)/1e6 quantization).

    Scale shape: the brand filter prunes part BEFORE touching the fact
    table (broadcast dim), the avg relation is #parts-of-brand rows
    (broadcast back — AQE picks it), so lineitem is scanned once and
    shuffled at most once on l_partkey."""
    part = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#21")
        .select("p_partkey")
    )
    li = (
        _t(spark, sf_dir, "lineitem")
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .select("l_partkey", "l_quantity", "l_extendedprice")
    )
    pa = li.groupBy("l_partkey").agg(F.avg("l_quantity").alias("avg_qty"))
    return (
        li.join(pa, "l_partkey")
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            F.round(F.sum("l_extendedprice") / 7.0, 6).alias("avg_yearly"),
            F.count("*").alias("n_small"),
        )
    )


@query(
    "rel_promo_revenue_share",
    """
    SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                                  THEN l_extendedprice * (1 - l_discount)
                                  ELSE 0.0 END)
                 / sum(l_extendedprice * (1 - l_discount)), 6) AS promo_share,
           round(sum(CASE WHEN p_type = 'PROMO'
                          THEN l_extendedprice * (1 - l_discount)
                          ELSE 0.0 END), 4) AS promo_revenue,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS total_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    """,
)
def rel_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Promotion revenue share (the TPC-H Q14 shape): the percentage of
    discounted revenue coming from PROMO-type parts — conditional
    aggregation over a fact⋈dim join, both sums in ONE pass (a CASE
    inside the aggregate, not two scans).  part is broadcast; lineitem
    is scanned once with no shuffle beyond the final 1-row aggregate.
    The share divides two same-pass sums, so the ratio is stable to the
    last displayed decimal (round 6) even though each double sum's bit
    pattern depends on partition order."""
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    l = _t(spark, sf_dir, "lineitem")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", disc).otherwise(F.lit(0.0))
    return (
        l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(F.lit(100.0) * F.sum(promo) / F.sum(disc), 6).alias(
                "promo_share"
            ),
            F.round(F.sum(promo), 4).alias("promo_revenue"),
            F.round(F.sum(disc), 4).alias("total_revenue"),
        )
    )


@query(
    "rel_priority_returns",
    """
    SELECT o_orderpriority, count(*) AS n_orders
    FROM orders
    WHERE EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey AND l_returnflag = 'R'
    )
    GROUP BY o_orderpriority
    """,
)
def rel_priority_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders with at least one returned lineitem, counted per priority
    (the TPC-H Q4 shape adapted to this schema's columns): the EXISTS
    pattern as a LEFT SEMI join — each order contributes once no matter
    how many returned items it has, which a plain inner join + distinct
    would reconstruct only with an extra dedup shuffle.  The semi join
    shuffles both sides on the order key once; the filter on the fact
    side (l_returnflag = 'R') is pushed into the parquet scan."""
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        o.join(l, o.o_orderkey == l.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
    )


@query(
    "rel_large_volume_orders",
    """
    SELECT c_name, c_custkey, o_orderkey,
           epoch(o_orderdate) AS o_orderdate, o_totalprice,
           round(sum(l_quantity), 4) AS sum_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    HAVING sum(l_quantity) > 250
    """,
)
def rel_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The TPC-H Q18 shape — large-volume customers: per-order quantity
    rollup with a HAVING cut, customer annotation via broadcast.  The
    HAVING threshold compares a sum of small-integer-valued doubles
    (exact in IEEE-754 well below 2^53), so the cut is engine-exact
    without rounding; the per-order aggregation map-side combines on the
    natural join key, one fact shuffle total (the orders join reuses the
    order-key partitioning)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("_sq"))
        .filter(F.col("_sq") > 250)
        .join(o, F.col("l_orderkey") == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.unix_timestamp("o_orderdate").cast("double").alias("o_orderdate"),
            "o_totalprice",
            F.round(F.col("_sq"), 4).alias("sum_qty"),
        )
    )


@query(
    "rel_bloom_semi_join",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(count(*) AS BIGINT) AS n_items,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
    FROM lineitem
    WHERE l_orderkey IN (
        SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'
    )
    GROUP BY 1, 2
    """,
)
def rel_bloom_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-prefiltered semi join (operators/joins.bloom_semi_join):
    revenue of lineitems belonging to urgent orders, where the order-key
    set is treated as too big to broadcast exactly (the 100 TB stance —
    at scale the filtered dimension can be billions of keys).  The fact
    table is first filtered by a 16 MiB-capped broadcast Bloom filter of
    the urgent keys (JVM xxhash64 + Arrow-vectorized membership), so the
    exact semi join's shuffle carries only matches + ~1% false
    positives; the final join removes those, which is why the row is
    value-exact against the plain ``IN`` oracle.

    ``expected_items=None`` sizes the filter with one count() of the
    (already filtered, small-by-selectivity) build side — the documented
    trade; callers with a known cardinality pass the hint instead."""
    from smalltsdb_spark.operators.joins import bloom_semi_join

    l = _t(spark, sf_dir, "lineitem")
    urgent = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_orderkey").alias("l_orderkey"))
    )
    matched = bloom_semi_join(l, urgent, "l_orderkey", fpp=0.01)
    return matched.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
        ).alias("revenue"),
    )


@query(
    "tsdb_counter_rate",
    """
    WITH agg AS (
        SELECT event_type AS path,
               CAST(floor(epoch(ts) / 60) * 60 AS DOUBLE) AS ts,
               CAST(count(*) AS DOUBLE) AS n
        FROM events GROUP BY 1, 2
    ),
    ctr AS (
        SELECT path, ts,
               CAST(sum(n) OVER (
                   PARTITION BY path ORDER BY ts
               ) AS DOUBLE) % 1000 AS counter
        FROM agg
    ),
    lagged AS (
        SELECT path, ts, counter,
               lag(counter) OVER (PARTITION BY path ORDER BY ts) AS pv,
               lag(ts) OVER (PARTITION BY path ORDER BY ts) AS pt
        FROM ctr
    )
    SELECT path, ts AS "timestamp", counter,
           CASE WHEN pv IS NULL THEN NULL
                WHEN counter >= pv THEN counter - pv
                ELSE counter END AS increase,
           counter < pv AS reset,
           CASE WHEN pv IS NULL THEN NULL
                WHEN counter >= pv THEN counter - pv
                ELSE counter END / (ts - pt) AS rate
    FROM lagged
    """,
)
def tsdb_counter_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reset-aware counter rate (operators/aggregate.counter_rate — the
    Prometheus ``rate()`` semantic): a drop in a monotone counter is a
    process restart, so the bucket's increase counts from zero instead
    of going hugely negative and poisoning downstream sums.

    The fixture has no counter column, so BOTH engines derive the same
    one (the line-gate derived-input pattern): cumulative per-minute
    event count per path, mod 1000 — the mod injects deterministic
    resets wherever the running count crosses a multiple of 1000.
    Every value is an exact small integer in a double, so the increase
    arithmetic and the raw-IEEE rate division are bit-identical across
    engines with no rounding step."""
    from smalltsdb_spark.operators.aggregate import counter_rate

    ev = events_as_incoming(spark, sf_dir)
    agg = ev.groupBy(
        "path",
        (F.floor(F.col("timestamp") / 60) * 60).cast("double").alias("timestamp"),
    ).agg(F.count(F.lit(1)).cast("double").alias("n"))
    w = Window.partitionBy("path").orderBy("timestamp")
    ctr = agg.select(
        "path",
        "timestamp",
        F.pmod(F.sum("n").over(w), F.lit(1000.0)).alias("counter"),
    )
    return counter_rate(ctr, stat="counter")
