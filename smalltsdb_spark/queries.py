"""Driver-facing query registry: one entry per implemented operator.

Each ``QUERIES[name]`` is a callable ``(spark, sf_dir) -> DataFrame``; the
matching ``ORACLE[name]`` is ANSI SQL DuckDB runs over the same parquet
tables.  The driver (and ``tests/test_oracle_parity.py``) compares
row-count, schema, and order-insensitive value hashes, with columns sorted
by name — so every computed column is aliased identically on both sides.

Floating-point note: double aggregates are wrapped in ``round(x, 6)`` on
BOTH sides so summation-order fp noise (Spark's parallel sum vs DuckDB's
serial sum) cannot flip the hash; 6 decimals is far above the ~1e-11
relative error of either engine at this scale.

The reference's data model is exercised by mapping the driver's ``events``
table onto ``incoming``: path := event_type, timestamp := epoch(ts) as
double, value := value (FIXTURES.md §6).
"""

from __future__ import annotations

from collections.abc import Callable
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from smalltsdb_spark.operators.aggregate import aggregate, bucket

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
#: values are SQL strings, or zero-arg callables returning SQL for oracles
#: that embed data-derived constants (resolved by __spark_entry__.oracle_sql)
ORACLE: dict[str, str | Callable[[], str]] = {}


def query(name: str, oracle: str | Callable[[], str] | None = None):
    def deco(fn):
        # a duplicate name would SILENTLY shadow an already-driver-green
        # query (and its oracle) — fail loudly at import instead
        if name in QUERIES:
            raise ValueError(
                f"driver query {name!r} is already registered "
                f"(by {QUERIES[name].__module__}.{QUERIES[name].__qualname__})"
            )
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


#: atexit-cleaned scratch dirs for streaming staging/checkpoint trees —
#: the driver queries stage inputs and state under tempdirs, and a long
#: session (bench runs 70+ queries) must not leak driver disk (the same
#: hygiene operators/components.py applies to its label scratch)
_SCRATCH_DIRS: list[str] = []


def _scratch_dir(prefix: str) -> str:
    import atexit
    import shutil
    import tempfile

    if not _SCRATCH_DIRS:
        atexit.register(
            lambda: [shutil.rmtree(d, ignore_errors=True)
                     for d in _SCRATCH_DIRS]
        )
    d = tempfile.mkdtemp(prefix=prefix)
    _SCRATCH_DIRS.append(d)
    return d


def read_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events with ``ts_sec`` (double epoch seconds) added.

    Handles both generator vintages of the events parquet:

    - TIMESTAMP(NANOS), which Spark 4 refuses by default — the runtime
      conf maps it to a nanosecond LongType, and the epoch derivation
      truncates to microseconds first (``div 1000``);
    - TIMESTAMP(MICROS) (TIMESTAMP_NTZ in Spark) — NTZ → TZ (session tz
      is pinned UTC, session.py:53) → double is micros/1e6, the same
      IEEE-754 division DuckDB's ``epoch(ts)`` performs (DuckDB
      timestamps are µs), so both paths stay bit-identical to the
      oracle."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = _t(spark, sf_dir, "events")
    if isinstance(df.schema["ts"].dataType, LongType):
        ts_sec = F.expr("ts div 1000").cast("double") / F.lit(1e6)
    else:
        ts_sec = F.col("ts").cast("timestamp").cast("double")
    return df.withColumn("ts_sec", ts_sec)


def events_as_incoming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → the reference's incoming relation (FIXTURES.md §6)."""
    return read_events(spark, sf_dir).select(
        F.col("event_type").alias("path"),
        F.col("ts_sec").alias("timestamp"),
        F.col("value"),
    )


def _round_stats(df: DataFrame, cols: tuple[str, ...]) -> DataFrame:
    return df.select(
        *[c for c in df.columns if c not in cols],
        *[F.round(F.col(c), 6).alias(c) for c in cols],
    )


_STATS = ("n", "min", "max", "avg", "sum", "p50", "p90", "p99")

# SQL fragment: the reference aggregation in DuckDB dialect
# (quantile_cont = same linear interpolation as Spark percentile / numpy).
def _oracle_agg(seconds: int) -> str:
    return f"""
    SELECT event_type AS path,
           floor(epoch(ts) / {seconds}) * {seconds} AS "timestamp",
           round(CAST(count(value) AS DOUBLE), 6) AS n,
           round(min(value), 6) AS "min",
           round(max(value), 6) AS "max",
           round(avg(value), 6) AS "avg",
           round(sum(value), 6) AS "sum",
           round(quantile_cont(value, 0.5), 6) AS p50,
           round(quantile_cont(value, 0.9), 6) AS p90,
           round(quantile_cont(value, 0.99), 6) AS p99
    FROM events
    GROUP BY 1, 2
    """


def _agg_query(seconds: int):
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        return _round_stats(aggregate(events_as_incoming(spark, sf_dir), seconds), _STATS)

    return fn


# A1-A5, F1-F2: the reference's one aggregation (tsdb.py:183-198) at three
# granularities — tumbling bucket key, hash agg, exact multi-quantile.
for _name, _seconds in [("tensecond", 10), ("oneminute", 60), ("onehour", 3600)]:
    QUERIES[f"tsdb_agg_{_name}"] = _agg_query(_seconds)
    ORACLE[f"tsdb_agg_{_name}"] = _oracle_agg(_seconds)


#: quantile-bracket half-width for the approx-mode self-check, and the
#: minimum bucket size it is provable at.  For a correct sketch with
#: accuracy A=10000, the returned element's rank is within 1 + n/A of
#: q*n; the exact interpolated value at q-0.1 sits 0.1*n - 1.1 ranks
#: below q*n — so for n >= 30 (0.1*n - 1.1 = 1.9 > 1 + n/A) containment
#: in [exact(q-0.1), exact(q+0.1)] is a THEOREM, not a tolerance guess:
#: the violation count is deterministically 0, hash-checkable against a
#: constant oracle, yet any sketch regression >10 percentile points of
#: rank error flips it.
APPROX_BRACKET = 0.1
APPROX_MIN_N = 30


@query(
    "tsdb_agg_onehour_approx",
    """
    WITH agg AS (
        SELECT event_type AS path,
               floor(epoch(ts) / 3600) * 3600 AS ts,
               count(*) AS n
        FROM events GROUP BY 1, 2
    )
    SELECT CAST(0 AS BIGINT) AS violations,
           CAST(sum(CASE WHEN n >= 30 THEN 1 ELSE 0 END) AS BIGINT)
               AS buckets_checked,
           CAST(count(*) AS BIGINT) AS buckets
    FROM agg
    """,
)
def tsdb_agg_onehour_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The documented 100 TB scale mode — ``aggregate(exact=False)``
    (percentile_approx: mergeable bounded-memory sketch, no per-group
    value buffering) — with its own value-level driver signal instead of
    riding the exact mode's row.

    Every bucket's approx p50/p90/p99 is checked against the exact
    aggregation's interpolated quantile bracket [q-0.1, q+0.1] (provable
    containment for n >= APPROX_MIN_N, see APPROX_BRACKET); the returned
    row is (violations, buckets_checked, buckets), hash-compared to the
    oracle's (0, ...) — so the approx path's whole plan runs and its
    output quality is gated, while the comparison stays exact.
    tests/test_api_ops.py additionally pins quantitative |approx-exact|
    error at sf0.1."""
    from smalltsdb_spark.config import QUANTILES

    inc = events_as_incoming(spark, sf_dir)
    ap = aggregate(inc, 3600, exact=False)

    brackets = []
    for q in QUANTILES:
        brackets += [max(0.0, q - APPROX_BRACKET), min(1.0, q + APPROX_BRACKET)]
    ex = (
        inc.groupBy("path", bucket("timestamp", 3600).alias("timestamp"))
        .agg(
            F.count("value").alias("_n"),
            F.percentile("value", F.array(*[F.lit(b) for b in brackets])).alias("_b"),
        )
    )
    j = ap.join(ex, ["path", "timestamp"])
    bad = F.lit(False)
    for i, q in enumerate(QUANTILES):
        p = F.col(f"p{int(q * 100)}")
        lo, hi = F.col("_b")[2 * i], F.col("_b")[2 * i + 1]
        bad = bad | (p < lo - F.lit(1e-9)) | (p > hi + F.lit(1e-9))
    checked = F.col("_n") >= APPROX_MIN_N
    return j.agg(
        F.sum((checked & bad).cast("long")).alias("violations"),
        F.sum(checked.cast("long")).alias("buckets_checked"),
        F.count("*").alias("buckets"),
    )


@query(
    "tsdb_get_metric",
    """
    SELECT "timestamp", p90 FROM (
        SELECT event_type AS path,
               floor(epoch(ts) / 3600) * 3600 AS "timestamp",
               round(quantile_cont(value, 0.9), 6) AS p90
        FROM events GROUP BY 1, 2
    ) WHERE path = 'click'
      AND "timestamp" BETWEEN 1704067200 AND 1704499200
    ORDER BY "timestamp"
    """,
)
def tsdb_get_metric(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1-P3 + W1: the read path (reference tsdb.py:130-137) — projection,
    path equality, inclusive time range, ordered by timestamp.

    Catalyst pushes the path filter below the aggregation (grouping key),
    which the reference's SQLite view + Python UDAF could not do.
    """
    agg = aggregate(events_as_incoming(spark, sf_dir), 3600)
    return (
        agg.filter(F.col("path") == "click")
        .filter(F.col("timestamp").between(1704067200, 1704499200))
        .select("timestamp", F.round("p90", 6).alias("p90"))
        .orderBy("timestamp")
    )


@query(
    "tsdb_get_metric_partial",
    """
    SELECT "timestamp", p90 FROM (
        SELECT event_type AS path,
               floor(epoch(ts) / 3600) * 3600 AS "timestamp",
               round(quantile_cont(value, 0.9), 6) AS p90
        FROM events GROUP BY 1, 2
    ) WHERE path = 'click' ORDER BY "timestamp"
    """,
)
def tsdb_get_metric_partial(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The partial-read API as its own oracle-paired row (VERDICT r9
    item 6; tsdb.get_metric_df(include_partial=True), previously only
    golden-tested): a TablesTSDB is synced at a PINNED mid-range clock,
    so half the hour buckets are final (served from the period table)
    and the tail is open (recomputed from incoming past the finality
    cut, ViewTSDB-parity, materialized rows winning via the bucket
    anti-join).  Finals + partials together must equal the plain full
    aggregation — which IS the oracle, computed directly in SQL; a
    wrong finality cut, a lost open bucket, or a shadowed materialized
    row all break the hash.

    Scale shape: the finals side is the partition-pruned period-table
    read; the partial side aggregates only incoming rows PAST the cut
    (bounded by retention to the open window), one map-side-combined
    shuffle over one path's tail."""
    import math

    from smalltsdb_spark.tsdb import TablesTSDB

    bucket_s = 3600.0
    # cached: min/max probe + staged half-writes re-scan the same
    # relation (guide §1.2); built from parquet inside the timed query
    inc = events_as_incoming(spark, sf_dir).cache()
    # r15 (VERDICT r14 item 4): the cache feeds only in-function
    # actions; release it before returning (the returned plan reads
    # back from storage), even on error
    try:
        t_min, t_max = inc.agg(F.min("timestamp"), F.max("timestamp")).first()
        # mid-bucket horizon: engine-vs-oracle boundary semantics can't
        # disagree (the tsdb_sync_idempotent pattern)
        t_split = (
            math.floor((t_min + (t_max - t_min) / 2) / bucket_s) * bucket_s
            + bucket_s / 2
        )
        base = _scratch_dir("tsdb_partial_")
        clock = {"now": 0.0}
        db = TablesTSDB(
            spark, base, periods=[("onehour", 3600)], now=lambda: clock["now"]
        )
        db.insert(inc)
        clock["now"] = t_split + db.tail  # finality horizon = t_split
        db.sync()
        out = db.get_metric_df(
            "click", "onehour", "p90", (0.0, 4e9), include_partial=True
        )
        return out.select("timestamp", F.round("p90", 6).alias("p90"))
    finally:
        inc.unpersist()


@query(
    "tsdb_list_metrics",
    """
    SELECT DISTINCT event_type AS path FROM events
    """,
)
def tsdb_list_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E1-E2: list_metrics (reference tsdb.py:142-152) — per-period DISTINCT
    paths combined with set-semantics UNION (Spark union + distinct)."""
    inc = events_as_incoming(spark, sf_dir)
    a = aggregate(inc, 3600).select("path")
    b = aggregate(inc, 86400).select("path")
    return a.union(b).distinct()


@query(
    "tsdb_last_finals",
    """
    WITH paths AS (SELECT DISTINCT event_type AS path FROM events),
    agg AS (
        SELECT event_type AS path,
               floor(epoch(ts) / 3600) * 3600 AS "timestamp"
        FROM events WHERE value > 400 GROUP BY 1, 2
    )
    SELECT paths.path, max(agg."timestamp") AS last_final
    FROM paths LEFT JOIN agg ON paths.path = agg.path
    GROUP BY paths.path
    """,
)
def tsdb_last_finals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 + J1: per-path high-water mark (reference tsdb.py:352-369) — CTE
    of distinct paths LEFT JOINed to an aggregate table; paths never
    aggregated yield NULL.  The agg side is restricted (value > 400) so the
    left join actually produces NULLs on this dataset.

    The distinct-paths side is tiny → Catalyst broadcasts it."""
    inc = events_as_incoming(spark, sf_dir)
    paths = inc.select("path").distinct()
    agg = (
        inc.filter(F.col("value") > 400)
        .groupBy("path", bucket("timestamp", 3600).alias("timestamp"))
        .count()
        .select("path", "timestamp")
    )
    return (
        paths.join(agg, "path", "left")
        .groupBy("path")
        .agg(F.max("timestamp").alias("last_final"))
    )


@query(
    "tsdb_retention",
    """
    SELECT count(*) AS kept, round(sum(value), 6) AS kept_sum
    FROM events WHERE epoch(ts) >= 1705276800
    """,
)
def tsdb_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4 + S8: retention predicate (reference tsdb.py:412-420) — open
    range delete expressed as its complement (the surviving rows)."""
    inc = events_as_incoming(spark, sf_dir)
    return inc.filter(F.col("timestamp") >= 1705276800).agg(
        F.count("*").alias("kept"), F.round(F.sum("value"), 6).alias("kept_sum")
    )


@query(
    "tsdb_parse_lines",
    """
    WITH lines AS (
        SELECT printf('%s %.4f %.4f', event_type, round(value, 4),
                      round(epoch(ts), 4)) AS line
        FROM events
        UNION ALL SELECT 'garbage'
        UNION ALL SELECT 'too many fields here 1 2'
    ),
    parsed AS (
        SELECT string_split(line, ' ') AS f FROM lines
    )
    SELECT f[1] AS path,
           count(*) AS n,
           round(sum(CAST(f[2] AS DOUBLE)), 4) AS value_sum
    FROM parsed WHERE len(f) = 3
    GROUP BY 1
    """,
)
def tsdb_parse_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4 + F5: the Graphite wire-format parser (reference daemon.py:16-30)
    as a pure DataFrame transform — serialize events to plaintext
    ``"<path> <value> <timestamp>"`` lines (round(x,4) *before* %.4f:
    Java's Formatter rounds format ties HALF_UP while C printf rounds
    them half-even, so the tie-break must happen in round(), where both
    engines agree on away-from-zero), parse back with split + cast,
    reject lines that
    don't have exactly 3 fields, and aggregate the parsed values."""
    ev = read_events(spark, sf_dir)
    lines = ev.select(
        F.format_string(
            "%s %.4f %.4f",
            F.col("event_type"),
            F.round(F.col("value"), 4),
            F.round(F.col("ts_sec"), 4),
        ).alias("line")
    )
    bad = spark.createDataFrame(
        [("garbage",), ("too many fields here 1 2",)], "line string"
    )
    parsed = (
        lines.union(bad)
        .select(F.split("line", " ").alias("f"))
        .filter(F.size("f") == 3)
        .select(
            F.col("f")[0].alias("path"),
            F.col("f")[2].cast("double").alias("timestamp"),
            F.col("f")[1].cast("double").alias("value"),
        )
    )
    return parsed.groupBy("path").agg(
        F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("value_sum")
    )


@query(
    "tsdb_self_metrics",
    """
    SELECT count(CASE WHEN event_type NOT LIKE 's%' THEN 1 END) AS n_outside,
           count(*) AS n_total
    FROM events
    """,
)
def tsdb_self_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5 + A7: prefix predicate + conditional count (reference
    daemon.py:178-180) — count datapoints outside a metric-name prefix."""
    ev = read_events(spark, sf_dir)
    return ev.agg(
        F.count(F.when(~F.col("event_type").startswith("s"), 1)).alias("n_outside"),
        F.count("*").alias("n_total"),
    )


@query(
    "tsdb_agg_salted",
    """
    SELECT event_type AS path,
           floor(epoch(ts) / 60) * 60 AS "timestamp",
           round(CAST(count(value) AS DOUBLE), 6) AS n,
           round(min(value), 6) AS "min",
           round(max(value), 6) AS "max",
           round(avg(value), 6) AS "avg",
           round(sum(value), 6) AS "sum"
    FROM events
    GROUP BY 1, 2
    """,
)
def tsdb_agg_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew escape hatch (SURVEY.md §7 watch-list "path skew"): the
    two-phase salted aggregation — algebraic stats split across 32
    sub-groups per (path, bucket) then merged, so no hot metric can
    bottleneck one reducer.  The oracle is the PLAIN aggregation: salting
    must be invisible in the results."""
    from smalltsdb_spark.operators.aggregate import aggregate_salted

    return _round_stats(
        aggregate_salted(events_as_incoming(spark, sf_dir), 60),
        ("n", "min", "max", "avg", "sum"),
    )


@contextmanager
def _stream_state_partitions(spark: SparkSession, n: int):
    """Pin ``spark.sql.shuffle.partitions`` for a streaming lifecycle.

    A stateful streaming agg commits one state-store delta file per state
    partition per micro-batch, and the partition count is frozen into the
    checkpoint from the session conf at first start — inheriting the batch
    shuffle width (32) means 32+ tiny state commits per batch for a
    5-path keyspace, which dominates these queries' wall time (~4× the
    actual compute).  State partitions should track KEY CARDINALITY and
    state size, not batch width: a 100 TB deployment with millions of
    paths would raise this, the bench keyspace wants it small.  Restored
    only after the caller's ``awaitTermination`` — the conf is read during
    micro-batch planning, so restoring before termination would race."""
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", n)
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


#: state partitions for the driver's streaming queries.  The state key is
#: (path, window) — ~10k entries at sf0.1 — so a handful of partitions
#: covers it and avoids 32 near-empty state-store commits per micro-batch.
#: A/B at sf0.1 (4 vs 16 vs 32) shows the choice is inside run-to-run
#: noise at this shape — the pin is about the CONTRACT (state partitions
#: track key cardinality and are frozen into the checkpoint at first
#: start, so they must be chosen deliberately, not inherited from the
#: batch shuffle width; a 100 TB deployment with millions of paths raises
#: this the same way).
STREAM_STATE_PARTITIONS = 4


@query("stream_agg_tensecond", _oracle_agg(10))
def stream_agg_tensecond(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T1/T2/T5: the Structured Streaming rollup (streaming/pipeline.py)
    driven to completion over the full dataset with an availableNow
    trigger, update mode exposing every bucket.  With all data in hand the
    result equals the batch aggregation — so the same SQL oracle applies,
    giving the streaming path full value-level correctness coverage."""
    import uuid

    from smalltsdb_spark.schemas import INCOMING_SCHEMA
    from smalltsdb_spark.streaming import streaming_aggregate

    staging = _scratch_dir("stream_agg_src_")
    # one staged file ⇒ availableNow runs one micro-batch ⇒ update mode
    # emits each bucket exactly once (no per-batch re-emission dups)
    events_as_incoming(spark, sf_dir).coalesce(1).write.mode("overwrite").parquet(staging)
    inc = spark.readStream.schema(INCOMING_SCHEMA).parquet(staging)
    sink = f"stream_agg_{uuid.uuid4().hex[:8]}"
    with _stream_state_partitions(spark, STREAM_STATE_PARTITIONS):
        q = (
            streaming_aggregate(inc, 10)
            .writeStream.format("memory")
            .queryName(sink)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(600), "stream drain did not finish"
    return _round_stats(spark.table(sink), _STATS)


@query(
    "stream_ingest_e2e",
    """
    WITH lines AS (
        SELECT printf('%s %.4f %.4f', event_type, round(value, 4),
                      round(epoch(ts), 4)) AS line
        FROM events
    ),
    parsed AS (SELECT string_split(line, ' ') AS f FROM lines),
    inc AS (
        SELECT f[1] AS path,
               CAST(f[3] AS DOUBLE) AS ts,
               CAST(f[2] AS DOUBLE) AS value
        FROM parsed WHERE len(f) = 3
    )
    SELECT path,
           floor(ts / 60) * 60 AS "timestamp",
           round(CAST(count(value) AS DOUBLE), 6) AS n,
           round(min(value), 6) AS "min",
           round(max(value), 6) AS "max",
           round(avg(value), 6) AS "avg",
           round(sum(value), 6) AS "sum",
           round(quantile_cont(value, 0.5), 6) AS p50,
           round(quantile_cont(value, 0.9), 6) AS p90,
           round(quantile_cont(value, 0.99), 6) AS p99
    FROM inc
    GROUP BY 1, 2
    """,
)
def stream_ingest_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2/S5/T5 end-to-end, value-checked: the full ingest pipeline —
    spool files of Graphite wire lines → ``read_spool_stream`` (file
    source + codegen parser) → ``start_ingest`` (checkpointed append to
    the day-partitioned incoming table) → batch aggregation of what
    landed.  The oracle serializes the SAME events to %.4f wire lines and
    parses them back in SQL, so the check covers the parser's precision
    contract, the streaming append path, and the aggregation in one row
    (values round(x,4)ed in-engine before %.4f on BOTH sides — see
    tsdb_parse_lines on the Java-vs-C format-tie divergence this removes).
    Spool lines are split across several files to exercise multi-file
    micro-batch accumulation (reference daemon.py:108-197's cadence)."""
    import glob
    import os

    from smalltsdb_spark.streaming import read_spool_stream, start_ingest

    base = _scratch_dir("stream_ingest_e2e_")
    spool, inc_path, ckpt = f"{base}/spool", f"{base}/incoming", f"{base}/ckpt"
    ev = read_events(spark, sf_dir)
    ev.select(
        F.format_string(
            "%s %.4f %.4f",
            F.col("event_type"),
            F.round(F.col("value"), 4),
            F.round(F.col("ts_sec"), 4),
        ).alias("value")
    ).coalesce(4).write.mode("overwrite").text(spool)
    # the daemon's spool contract names flushes *.graphite (SpoolSink);
    # rename the text parts to match what read_spool_stream tails
    for i, part in enumerate(sorted(glob.glob(f"{spool}/part-*"))):
        os.rename(part, f"{spool}/{i:06d}.graphite")

    q = start_ingest(
        read_spool_stream(spark, spool), inc_path, ckpt, available_now=True
    )
    assert q.awaitTermination(600), "stream drain did not finish"

    landed = spark.read.parquet(inc_path).select("path", "timestamp", "value")
    return _round_stats(aggregate(landed, 60), _STATS)


@query(
    "stream_first_seen",
    """
    SELECT event_type AS path,
           round(min(epoch(ts)), 6) AS "timestamp",
           floor(value / 10) * 10 AS value
    FROM events
    GROUP BY event_type, floor(value / 10) * 10
    """,
)
def stream_first_seen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming on-arrival dedup (streaming/stateful.first_seen_stream)
    driven across TWO micro-batch runs: batch 1 stages the first half of
    events (value coarsened to 10-wide bins so keys actually repeat),
    batch 2 stages the second half PLUS copies of batch-1 rows.  The
    state store must drop every key batch 1 already emitted — so the
    final table equals the global first-occurrence per (path, bin),
    which is exactly the group-by-min oracle.  A state failure re-emits
    batch-1 keys and flips rows_match."""
    import math

    from smalltsdb_spark.streaming.stateful import first_seen_stream

    # cached: the min/max probe and the two staged half-writes are
    # three full scans of the same small transformed relation (guide
    # §1.2 — fewer passes); built from parquet inside the timed query
    inc = events_as_incoming(spark, sf_dir).select(
        "path",
        "timestamp",
        (F.floor(F.col("value") / 10) * 10).cast("double").alias("value"),
    ).cache()
    # r15 (VERDICT r14 item 4): the cache feeds only in-function
    # actions; release it before returning (the returned plan reads
    # back from storage), even on error
    try:
        t_min, t_max = inc.agg(F.min("timestamp"), F.max("timestamp")).first()
        t_split = (t_min + t_max) / 2

        base = _scratch_dir("stream_first_seen_")
        src, out, ckpt = f"{base}/src", f"{base}/out", f"{base}/ckpt"

        def run_once():
            with _stream_state_partitions(spark, STREAM_STATE_PARTITIONS):
                q = (
                    first_seen_stream(
                        spark.readStream.schema(INCOMING_SCHEMA).parquet(src),
                        key_cols=["path", "value"],
                    )
                    .writeStream.format("parquet")
                    .outputMode("append")
                    .option("checkpointLocation", ckpt)
                    .option("path", out)
                    .trigger(availableNow=True)
                    .start()
                )
                assert q.awaitTermination(600), "stream drain did not finish"

        from smalltsdb_spark.schemas import INCOMING_SCHEMA

        inc.filter(F.col("timestamp") < t_split).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        run_once()
        (
            inc.filter(F.col("timestamp") >= t_split)
            .unionByName(inc.filter(F.col("timestamp") < t_min + (t_max - t_min) / 4))
            .coalesce(1)
            .write.mode("append")
            .parquet(src)
        )
        run_once()

        return spark.read.parquet(out).select(
            "path", F.round("timestamp", 6).alias("timestamp"), "value"
        )
    finally:
        inc.unpersist()


@query(
    "stream_dedup_watermark",
    """
    SELECT DISTINCT event_type AS path,
           floor(value / 10) * 10 AS value
    FROM events
    """,
)
def stream_dedup_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Built-in streaming dedup — ``dropDuplicatesWithinWatermark`` —
    driven across TWO micro-batch runs with run-2 replaying copies of
    run-1 rows (the at-least-once-source shape the operator exists
    for).  Complements stream_first_seen: that row pins the CUSTOM
    stateful operator (per-key first-occurrence with emitted
    timestamps); this one pins Spark's native dedup state machinery —
    the idiomatic choice when "seen before?" is all the pipeline asks.
    The retention delay is set beyond the data's time span, so state
    never expires mid-test and the emitted rows are exactly the
    distinct (path, value-bin) keys; a state-restore failure re-emits
    run-1 keys and flips rows_match.  At scale the SAME query bounds
    state by shrinking the delay to the real out-of-orderness budget —
    that tradeoff dial is the point of the watermark variant."""
    from smalltsdb_spark.schemas import INCOMING_SCHEMA

    # cached: the min/max probe and the two staged half-writes are
    # three full scans of the same small transformed relation (guide
    # §1.2 — fewer passes); built from parquet inside the timed query
    inc = events_as_incoming(spark, sf_dir).select(
        "path",
        "timestamp",
        (F.floor(F.col("value") / 10) * 10).cast("double").alias("value"),
    ).cache()
    # r15 (VERDICT r14 item 4): the cache feeds only in-function
    # actions; release it before returning (the returned plan reads
    # back from storage), even on error
    try:
        t_min, t_max = inc.agg(F.min("timestamp"), F.max("timestamp")).first()
        t_split = (t_min + t_max) / 2

        base = _scratch_dir("stream_dedup_wm_")
        src, out, ckpt = f"{base}/src", f"{base}/out", f"{base}/ckpt"

        def run_once():
            with _stream_state_partitions(spark, STREAM_STATE_PARTITIONS):
                stream = (
                    spark.readStream.schema(INCOMING_SCHEMA)
                    .parquet(src)
                    .withColumn("ets", F.timestamp_seconds(F.col("timestamp")))
                    .withWatermark("ets", "100000 hours")
                    .dropDuplicatesWithinWatermark(["path", "value"])
                    .select("path", "value")
                )
                q = (
                    stream.writeStream.format("parquet")
                    .outputMode("append")
                    .option("checkpointLocation", ckpt)
                    .option("path", out)
                    .trigger(availableNow=True)
                    .start()
                )
                assert q.awaitTermination(600), "stream drain did not finish"

        inc.filter(F.col("timestamp") < t_split).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        run_once()
        (
            inc.filter(F.col("timestamp") >= t_split)
            .unionByName(inc.filter(F.col("timestamp") < t_min + (t_max - t_min) / 4))
            .coalesce(1)
            .write.mode("append")
            .parquet(src)
        )
        run_once()

        return spark.read.parquet(out).select("path", "value")
    finally:
        inc.unpersist()


@query("stream_rollup_finality", _oracle_agg(3600))
def stream_rollup_finality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T2/T4 at the driver level: the APPEND-mode (finality) rollup driven
    across TWO micro-batch runs with late data — the semantics
    ``test_streaming.test_rollup_watermark_finality_golden`` pins, promoted
    to a value-checked CORRECTNESS row.

    Run 1 stages the first half of events: buckets up to watermark₁
    (max event time − tail) finalize and append exactly once.  Run 2
    stages the second half PLUS (a) copies of early rows — later than the
    tail, so the engine must DROP them (their buckets already emitted;
    merging would double n) — and (b) a clock-advancing row on a synthetic
    path whose own bucket stays open (never emitted).  The final table
    therefore equals the plain one-hour aggregation over events iff
    append-mode emits each bucket exactly once across runs and late rows
    are dropped — which is exactly the oracle."""
    import math

    from smalltsdb_spark.schemas import INCOMING_SCHEMA
    from smalltsdb_spark.streaming import start_rollup

    bucket = 3600.0
    # cached: min/max probe + staged half-writes re-scan the same
    # relation (guide §1.2); built from parquet inside the timed query
    inc = events_as_incoming(spark, sf_dir).cache()
    # r15 (VERDICT r14 item 4): the cache feeds only in-function
    # actions; release it before returning (the returned plan reads
    # back from storage), even on error
    try:
        t_min, t_max = inc.agg(F.min("timestamp"), F.max("timestamp")).first()
        # mid-bucket split: watermark comparisons stay ~½ bucket away from any
        # bucket end, so engine-vs-oracle boundary semantics can't disagree
        t_split = math.floor((t_min + (t_max - t_min) / 2) / bucket) * bucket + bucket / 2
        clock_ts = math.floor(t_max / bucket) * bucket + 2.5 * bucket

        base = _scratch_dir("stream_finality_")
        src, out, ckpt = f"{base}/src", f"{base}/onehour", f"{base}/ckpt"

        def run_once():
            with _stream_state_partitions(spark, STREAM_STATE_PARTITIONS):
                q = start_rollup(
                    spark.readStream.schema(INCOMING_SCHEMA).parquet(src),
                    out,
                    ckpt,
                    int(bucket),
                    available_now=True,
                )
                assert q.awaitTermination(600), "stream drain did not finish"

        inc.filter(F.col("timestamp") < t_split).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        run_once()

        late_copies = inc.filter(F.col("timestamp") < t_min + 2 * bucket)
        clock = spark.createDataFrame([("_clock", clock_ts, 0.0)], INCOMING_SCHEMA)
        (
            inc.filter(F.col("timestamp") >= t_split)
            .unionByName(late_copies)
            .unionByName(clock)
            .coalesce(1)
            .write.mode("append")
            .parquet(src)
        )
        run_once()

        return _round_stats(
            spark.read.parquet(out).select(
                "path", "timestamp", "n", "min", "max", "avg", "sum", "p50", "p90", "p99"
            ),
            _STATS,
        )
    finally:
        inc.unpersist()


@query("stream_rollup_partials", _oracle_agg(3600))
def stream_rollup_partials(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T2's capability upgrade (VERDICT r7 stretch item): the UPDATE-mode
    rollup materializing the partial interval the reference computes but
    never stores (reference tsdb.py:372-374), driven across TWO
    micro-batch runs with late data.

    Run 1 stages the first half of events; run 2 stages the second half
    plus copies of early rows (behind the watermark — dropped, same T4
    rule as append mode).  Unlike ``stream_rollup_finality``, NO
    clock-advancing row is staged, so the tail buckets stay OPEN — and
    the partials table still holds them at their current (here:
    complete) values, upserted by the foreachBatch replace-by-key sink.
    The table therefore equals the plain one-hour aggregation over ALL
    events — which append mode cannot produce without the clock trick
    (its open buckets are simply absent) — iff partial buckets are
    really materialized, updates replace rather than duplicate, and
    late rows are dropped."""
    import math

    from smalltsdb_spark.schemas import INCOMING_SCHEMA
    from smalltsdb_spark.streaming import start_rollup_partials

    bucket = 3600.0
    # cached: min/max probe + staged half-writes re-scan the same
    # relation (guide §1.2); built from parquet inside the timed query
    inc = events_as_incoming(spark, sf_dir).cache()
    # r15 (VERDICT r14 item 4): the cache feeds only in-function
    # actions; release it before returning (the returned plan reads
    # back from storage), even on error
    try:
        t_min, t_max = inc.agg(F.min("timestamp"), F.max("timestamp")).first()
        t_split = math.floor((t_min + (t_max - t_min) / 2) / bucket) * bucket + bucket / 2

        base = _scratch_dir("stream_partials_")
        src, out, ckpt = f"{base}/src", f"{base}/onehour_partial", f"{base}/ckpt"

        def run_once():
            with _stream_state_partitions(spark, STREAM_STATE_PARTITIONS):
                q = start_rollup_partials(
                    spark.readStream.schema(INCOMING_SCHEMA).parquet(src),
                    out,
                    ckpt,
                    int(bucket),
                    available_now=True,
                )
                assert q.awaitTermination(600), "stream drain did not finish"

        inc.filter(F.col("timestamp") < t_split).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        run_once()

        late_copies = inc.filter(F.col("timestamp") < t_min + 2 * bucket)
        (
            inc.filter(F.col("timestamp") >= t_split)
            .unionByName(late_copies)
            .coalesce(1)
            .write.mode("append")
            .parquet(src)
        )
        run_once()

        from smalltsdb_spark import storage
        from smalltsdb_spark.schemas import AGG_SCHEMA

        return _round_stats(
            storage.read_table(spark, out, AGG_SCHEMA).select(
                "path", "timestamp", "n", "min", "max", "avg", "sum", "p50", "p90", "p99"
            ),
            _STATS,
        )
    finally:
        inc.unpersist()


@query("tsdb_sync_idempotent", _oracle_agg(3600))
def tsdb_sync_idempotent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S7/T3 end-to-end as a value-checked CORRECTNESS row (VERDICT r4
    item 5): the TablesTSDB upsert sink + HWM incremental sync, driven
    across THREE sync() calls on a simulated clock, compared against the
    plain one-hour aggregation oracle.

    Sync 1 sees the first half of events at a mid-range clock: every
    complete hour bucket before the clock's finality horizon is
    aggregated and upserted exactly once; the straddling bucket stays
    open.  Sync 2 sees the second half PLUS copies of first-2-hour rows
    (late data behind every path's high-water mark — the engine must
    skip them, their buckets are already final) at a far-future clock:
    the straddling bucket is completed from both halves (its first-half
    rows aggregate exactly once, in this sync), every remaining bucket
    finalizes, and incoming retention then empties the raw table.
    Sync 3 runs on the emptied incoming — a no-op that must leave the
    period table byte-identical (idempotent re-sync, the upsert's
    replace-not-duplicate contract).  The final onehour table equals the
    oracle iff the HWM picks up exactly the unaggregated rows, the
    upsert never double-applies, and finality drops late rows — S7, T3,
    and T4 in one row.

    Scale shape: each sync is the production plan — per-path HWM is a
    bounded broadcast (paths × 1 row), aggregation is one map-side-
    combined shuffle over only the ELIGIBLE slice of incoming, and the
    upsert rewrites only affected day-partitions (reference
    tsdb.py:388-410 semantics on parquet partition swaps)."""
    import math

    from smalltsdb_spark.schemas import SECONDS_PER_DAY
    from smalltsdb_spark.tsdb import TablesTSDB

    bucket = 3600.0
    # cached: min/max probe + staged half-writes re-scan the same
    # relation (guide §1.2); built from parquet inside the timed query
    inc = events_as_incoming(spark, sf_dir).cache()
    # r15 (VERDICT r14 item 4): the cache feeds only in-function
    # actions; release it before returning (the returned plan reads
    # back from storage), even on error
    try:
        t_min, t_max = inc.agg(F.min("timestamp"), F.max("timestamp")).first()
        # mid-bucket split: the finality horizon lands ~half a bucket from
        # any bucket end, so engine-vs-oracle boundary semantics can't
        # disagree (the stream_rollup_finality pattern)
        t_split = (
            math.floor((t_min + (t_max - t_min) / 2) / bucket) * bucket + bucket / 2
        )

        base = _scratch_dir("tsdb_sync_idem_")
        clock = {"now": 0.0}
        db = TablesTSDB(
            spark,
            base,
            periods=[("onehour", 3600), ("oneday", 86400)],
            now=lambda: clock["now"],
        )

        db.insert(inc.filter(F.col("timestamp") < t_split))
        clock["now"] = t_split + db.tail  # finality horizon = straddling bucket start
        db.sync()

        late_copies = inc.filter(F.col("timestamp") < t_min + 2 * bucket)
        db.insert(inc.filter(F.col("timestamp") >= t_split).unionByName(late_copies))
        clock["now"] = t_max + db.tail + 2 * SECONDS_PER_DAY  # everything final
        db.sync()
        db.sync()  # idempotent no-op on emptied incoming

        return _round_stats(
            db.period_table("onehour").select(
                "path", "timestamp", "n", "min", "max", "avg", "sum", "p50", "p90", "p99"
            ),
            _STATS,
        )
    finally:
        inc.unpersist()


@query("tsdb_compact_roundtrip", _oracle_agg(3600))
def tsdb_compact_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compaction preserves the row multiset exactly, value-checked.

    Two interleaved insert batches fragment every day-partition of the
    incoming table to 2 files (storage.append adds one file per touched
    partition per write — the daemon/streaming write pattern), then
    ``compact()`` rewrites each fragmented partition down to one file via
    the same atomic per-partition swap the upsert path uses.  The
    one-hour aggregation of the compacted table equals the plain oracle
    iff no row was lost, duplicated, or altered by the rewrite.

    Scale shape: compaction reads ONLY fragmented partitions (``pday IN
    (...)`` prunes at the file index) and rewrites one partition per
    task — cost scales with fragmentation, not table size.  File-count
    assertions live in tests/test_sync.py::test_compact_preserves_rows.
    """
    from smalltsdb_spark.tsdb import TablesTSDB

    inc = events_as_incoming(spark, sf_dir).cache()  # two insert scans
    # r15 (VERDICT r14 item 4): the cache feeds only in-function
    # actions; release it before returning (the returned plan reads
    # back from storage), even on error
    try:
        base = _scratch_dir("tsdb_compact_")
        db = TablesTSDB(spark, base, now=lambda: 0.0)
        # one row goes to exactly one batch (hash over ALL columns, so
        # identical duplicate rows travel together and the union of the two
        # batches is the original multiset)
        bucket = F.pmod(F.abs(F.hash("path", "timestamp", "value")), F.lit(2))
        for i in range(2):
            db.insert(inc.filter(bucket == i))
        db.compact()
        return _round_stats(aggregate(db.incoming(), 3600), _STATS)
    finally:
        inc.unpersist()


@query("tsdb_two_databases", _oracle_agg(3600))
def tsdb_two_databases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S9 as a value-checked row: the split-location backend
    (TwoDatabasesTSDB — incoming under ``<path>.incoming``, aggregates
    under ``<path>``, the reference's writer/reader isolation surface,
    tsdb.py:423-454) ingests the full events stream and syncs once at a
    far-future clock; its onehour table must equal the plain aggregation
    oracle, proving the separate-incoming wiring feeds the same sync
    pipeline (parquet readers are snapshot-isolated, so the split is
    API parity — which is exactly what this row checks)."""
    from smalltsdb_spark.schemas import SECONDS_PER_DAY
    from smalltsdb_spark.tsdb import TwoDatabasesTSDB

    inc = events_as_incoming(spark, sf_dir).cache()  # probe + insert
    # r15 (VERDICT r14 item 4): the cache feeds only in-function
    # actions; release it before returning (the returned plan reads
    # back from storage), even on error
    try:
        t_max = inc.agg(F.max("timestamp")).first()[0]
        base = _scratch_dir("tsdb_twodb_")
        db = TwoDatabasesTSDB(
            spark,
            f"{base}/agg",
            periods=[("onehour", 3600)],
            now=lambda: t_max + 60 + 2 * SECONDS_PER_DAY,
        )
        db.insert(inc)
        db.sync()
        return _round_stats(
            db.period_table("onehour").select(
                "path", "timestamp", "n", "min", "max", "avg", "sum", "p50", "p90", "p99"
            ),
            _STATS,
        )
    finally:
        inc.unpersist()


#: the deterministic self-metric name set one sync() with the default
#: 6 periods emits (reference tsdb.py:310-337 naming): one ``all`` +
#: one ``upsert_query`` timing per period, plus the outer sync and the
#: incoming-retention delete
_SELF_METRIC_PATHS = (
    ["smalltsdb.sync.all.time", "smalltsdb.sync.delete_incoming_query.time"]
    + [
        f"smalltsdb.sync.{name}.{phase}.time"
        for name in (
            "onesecond", "tensecond", "oneminute",
            "fiveminute", "onehour", "oneday",
        )
        for phase in ("all", "upsert_query")
    ]
)


@query(
    "tsdb_self_metrics_emit",
    "SELECT * FROM (VALUES "
    + ", ".join(f"('{p}', 1)" for p in sorted(_SELF_METRIC_PATHS + ["probe.data"]))
    + ") AS t(path, n)",
)
def tsdb_self_metrics_emit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T6 as a value-checked row: ``sync(emit_metrics=True)`` re-ingests
    its own phase timings as ordinary datapoints under the reference's
    dotted names (tsdb.py:310-337 — ``<prefix>.sync.<period>.<phase>.
    <clock>``).  The timing VALUES are wall-clock (non-deterministic),
    but the NAME SET and per-name row counts are exact: 6 periods × 2
    phases + the outer sync + the retention delete + the probe data
    row.  The oracle is that literal name/count relation — so the row
    fails if the self-metrics loop drops a phase, renames a metric, or
    double-emits."""
    from smalltsdb_spark.timer import Timer
    from smalltsdb_spark.tsdb import TablesTSDB

    base = _scratch_dir("tsdb_selfmetrics_")
    db = TablesTSDB(
        spark,
        base,
        now=lambda: 100.0,
        emit_metrics=True,
        timer=Timer(prefix="smalltsdb"),
    )
    db.insert([("probe.data", 1.0, 1.0)])
    db.sync()
    return db.incoming().groupBy("path").agg(F.count("*").alias("n"))


#: deterministic wire payloads for the daemon driver row: graphite lines
#: split across UDP datagrams and TCP streams, same-bucket duplicates to
#: exercise aggregation, and one malformed line whose whole datagram the
#: parser must drop (daemon.py contract).  (path, timestamp, value)
#: triples below mirror exactly the well-formed lines.
_DAEMON_UDP = [
    b"web.req 3.5 12\nweb.req 1.5 15",  # graphite wire: path VALUE TIMESTAMP
    b"web.err 1.0 13",
    b"bad line here too wide extra",  # malformed: datagram dropped whole
    b"web.req 4.0 27",
]
_DAEMON_TCP = [
    b"web.req 2.0 14\nweb.err 2.5 21\n",
    b"db.lat 7.25 12\n",
]
_DAEMON_POINTS = [
    ("web.req", 12.0, 3.5),
    ("web.req", 15.0, 1.5),
    ("web.err", 13.0, 1.0),
    ("web.req", 27.0, 4.0),
    ("web.req", 14.0, 2.0),
    ("web.err", 21.0, 2.5),
    ("db.lat", 12.0, 7.25),
]


def _daemon_oracle() -> str:
    # ::DOUBLE on every numeric literal: bare 7.25 is DECIMAL in DuckDB,
    # and DECIMAL aggregates reach pandas as objects rendering "7.25" vs
    # the driver-hash-unstable class test_oracle_types pins
    rows = ", ".join(
        f"('{p}', {t!r}::DOUBLE, {v!r}::DOUBLE)" for p, t, v in _DAEMON_POINTS
    )
    return f"""
    WITH inc(path, ts, value) AS (VALUES {rows})
    SELECT path,
           floor(ts / 10) * 10 AS "timestamp",
           round(CAST(count(value) AS DOUBLE), 6) AS n,
           round(min(value), 6) AS "min",
           round(max(value), 6) AS "max",
           round(avg(value), 6) AS "avg",
           round(sum(value), 6) AS "sum",
           round(quantile_cont(value, 0.5), 6) AS p50,
           round(quantile_cont(value, 0.9), 6) AS p90,
           round(quantile_cont(value, 0.99), 6) AS p99
    FROM inc GROUP BY 1, 2
    """


@query("tsdb_daemon_ingest", _daemon_oracle())
def tsdb_daemon_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2/S3/S4/S5 as one value-checked row: REAL loopback sockets end to
    end — the UDP datagram listener and the TCP stream listener (both on
    one OS-assigned port), the graphite line parser (including the
    malformed-datagram drop contract), and the micro-batch spool sink
    with graceful-drain-on-stop — then the spooled lines are parsed and
    aggregated, and the tensecond rollup must equal the pure-SQL
    aggregation of the well-formed lines that were sent.

    Deterministic despite the sockets: payloads are fixed, loopback UDP
    is lossless, stop() drains the queue exactly once, and the malformed
    datagram's drop is part of the expected relation.  The previously
    golden-only daemon surface (VERDICT r4 correctness legend) thus gets
    a driver CORRECTNESS row; tests/test_daemon.py keeps the
    finer-grained golden pins."""
    import socket

    from smalltsdb_spark.sources.daemon import Daemon, SpoolSink
    from smalltsdb_spark.sources.graphite import parse_lines_df

    spool = _scratch_dir("tsdb_daemon_spool_") + "/spool"
    daemon = Daemon(SpoolSink(spool), interval=60.0)  # flush only on stop
    with daemon:
        with socket.socket(socket.AF_INET, socket.SOCK_DGRAM) as s:
            for p in _DAEMON_UDP:
                s.sendto(p, daemon.address)
        for p in _DAEMON_TCP:
            with socket.create_connection(daemon.address) as s:
                s.sendall(p)
        # poll, don't sleep: a handler thread scheduled late on a loaded
        # host would silently lose datapoints to stop()'s drain (ADVICE r5)
        if not daemon.wait_for_datapoints(len(_DAEMON_POINTS), timeout=30.0):
            raise RuntimeError(
                f"daemon ingested {daemon.datapoints_received}/"
                f"{len(_DAEMON_POINTS)} datapoints within deadline"
            )
    inc = parse_lines_df(spark.read.text(spool))
    return _round_stats(aggregate(inc, 10), _STATS)


# ---------------------------------------------------------------------------
# Relational breadth beyond the reference (SURVEY.md §2 "ABSENT" rows the
# Spark engine provides natively): multi-way joins, semi/anti joins,
# ranking windows, top-k.
# ---------------------------------------------------------------------------


@query(
    "rel_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 6) AS sum_qty,
           round(sum(l_extendedprice), 6) AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 6) AS sum_disc_price,
           round(avg(l_quantity), 6) AS avg_qty,
           round(avg(l_discount), 6) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def rel_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary: filter pushdown + grouped
    aggregation with arithmetic expressions, all whole-stage-codegen."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 6).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 6).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 6).alias(
                "sum_disc_price"
            ),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "rel_revenue_by_nation",
    """
    SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
)
def rel_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-way star join: fact joined to dims with explicit broadcast of
    the small sides (customer/nation at this scale; on a cluster the AQE
    threshold makes the same choice automatically)."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
                "revenue"
            )
        )
        .orderBy(F.desc("revenue"), "n_name")
    )


@query(
    "rel_customers_without_orders",
    """
    SELECT c_mktsegment, count(*) AS n_customers
    FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
    GROUP BY c_mktsegment
    """,
)
def rel_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti join (NOT EXISTS): customers with no orders, per segment."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers"))
    )


@query(
    "rel_props_json",
    """
    SELECT event_type,
           count(*) AS n,
           -- sum(BIGINT) is HUGEINT in DuckDB, which pandas/arrow widens to
           -- float64 (98088.0 vs Spark's long 98088) — flips the value hash
           -- even though the numbers are equal; cast back to BIGINT
           CAST(sum(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS k_sum,
           max(CAST(props->>'$.k' AS BIGINT)) AS k_max
    FROM events
    WHERE CAST(props->>'$.k' AS BIGINT) >= 10
    GROUP BY event_type
    """,
)
def rel_props_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON property extraction (SURVEY.md §2.7 — absent in the
    reference, needed for events.props): get_json_object stays JVM-side;
    at scale prefer parsing once with from_json into a struct column."""
    ev = read_events(spark, sf_dir)
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.select("event_type", k.alias("_k"))
        .filter(F.col("_k") >= 10)
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("_k").alias("k_sum"),
            F.max("_k").alias("k_max"),
        )
    )


@query(
    "rel_having",
    """
    SELECT user_id, count(*) AS n_events, round(sum(value), 6) AS value_sum
    FROM events
    GROUP BY user_id
    HAVING count(*) >= 20 AND sum(value) > 100
    """,
)
def rel_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HAVING / post-aggregation filter (SURVEY.md §2.3, absent in the
    reference): heavy users by event count and value sum."""
    ev = read_events(spark, sf_dir)
    return (
        ev.groupBy("user_id")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("_vs"))
        .filter((F.col("n_events") >= 20) & (F.col("_vs") > 100))
        .select("user_id", "n_events", F.round("_vs", 6).alias("value_sum"))
    )


@query(
    "rel_set_ops",
    """
    WITH half AS (SELECT median(epoch(ts)) m FROM events),
    first_half AS (
        SELECT DISTINCT user_id FROM events, half WHERE epoch(ts) < m
    ),
    second_half AS (
        SELECT DISTINCT user_id FROM events, half WHERE epoch(ts) >= m
    ),
    both_halves AS (SELECT user_id FROM first_half INTERSECT SELECT user_id FROM second_half),
    only_first AS (SELECT user_id FROM first_half EXCEPT SELECT user_id FROM second_half)
    SELECT 'both' AS cohort, user_id FROM both_halves
    UNION ALL
    SELECT 'only_first' AS cohort, user_id FROM only_first
    """,
)
def rel_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT semantics (SURVEY.md §2.6, absent in the
    reference): users active in both time halves vs only the first.

    One plan, no driver round-trip: the median is a 1-row aggregate
    broadcast-joined onto the scan (a scalar subquery), and both cohorts
    come from ONE groupBy — per-user presence flags replace the
    intersect/exceptAll pair, turning 2 scans + 4 shuffles into 2 scans +
    1 shuffle.  The oracle keeps the literal INTERSECT/EXCEPT formulation;
    distinct user sets make the set ops and the flag filters equivalent."""
    ev = read_events(spark, sf_dir)
    m = ev.agg(F.median("ts_sec").alias("_m"))
    flags = (
        ev.join(F.broadcast(m))
        .groupBy("user_id")
        .agg(
            F.max(F.col("ts_sec") < F.col("_m")).alias("in_first"),
            F.max(F.col("ts_sec") >= F.col("_m")).alias("in_second"),
        )
    )
    cohort = F.when(F.col("in_first") & F.col("in_second"), "both").when(
        F.col("in_first") & ~F.col("in_second"), "only_first"
    )
    return (
        flags.select(cohort.alias("cohort"), "user_id")
        .filter(F.col("cohort").isNotNull())
    )


@query(
    "stream_sliding_window",
    """
    SELECT event_type,
           floor(epoch(ts) / 1800) * 1800 - 1800 * k AS win_start,
           count(*) AS n,
           round(sum(value), 6) AS value_sum
    FROM events CROSS JOIN (VALUES (0), (1)) AS slides(k)
    GROUP BY 1, 2
    """,
)
def stream_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding (hopping) windows (SURVEY.md §2.8 T7, absent in the
    reference — tumbling only): 1-hour windows every 30 minutes.  Each
    event lands in exactly 2 windows; the oracle enumerates both slides
    per row.  The same expression works under readStream."""
    ev = read_events(spark, sf_dir)
    return (
        ev.groupBy(
            "event_type",
            F.window(F.timestamp_seconds("ts_sec"), "1 hour", "30 minutes").alias("_w"),
        )
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 6).alias("value_sum"))
        .select(
            "event_type",
            F.unix_timestamp("_w.start").cast("double").alias("win_start"),
            "n",
            "value_sum",
        )
    )


@query(
    "stream_sessionize",
    """
    WITH o AS (SELECT user_id, epoch(ts) AS t FROM events),
    marked AS (
        SELECT user_id, t,
               CASE WHEN t - lag(t) OVER (PARTITION BY user_id ORDER BY t) >= 1800
                         OR lag(t) OVER (PARTITION BY user_id ORDER BY t) IS NULL
                    THEN 1 ELSE 0 END AS brk
        FROM o
    ),
    sessions AS (
        SELECT user_id, t,
               sum(brk) OVER (PARTITION BY user_id ORDER BY t) AS sess
        FROM marked
    )
    SELECT user_id,
           round(min(t), 6) AS session_start,
           round(max(t), 6) AS session_end,
           count(*) AS n_events
    FROM sessions GROUP BY user_id, sess
    """,
)
def stream_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization (SURVEY.md §2.8 T7): 30-minute-gap sessions per
    user via session_window — Spark merges events closer than the gap;
    the oracle reproduces it with the classic gaps-and-islands window
    SQL.  Session bounds are reported as first/last event time (Spark's
    window.end includes the trailing gap, so min/max keeps both engines
    comparable).  The same expression works under readStream with
    watermarked state."""
    ev = read_events(spark, sf_dir)
    return (
        ev.groupBy(
            "user_id",
            F.session_window(F.timestamp_seconds("ts_sec"), "30 minutes").alias("_w"),
        )
        .agg(
            F.round(F.min("ts_sec"), 6).alias("session_start"),
            F.round(F.max("ts_sec"), 6).alias("session_end"),
            F.count("*").alias("n_events"),
        )
        .select("user_id", "session_start", "session_end", "n_events")
    )


@query(
    "stream_interval_join",
    """
    WITH l AS (SELECT user_id, epoch(ts) AS t_click, value AS v_click
               FROM events WHERE event_type = 'click'),
         r AS (SELECT user_id, epoch(ts) AS t_view
               FROM events WHERE event_type = 'view')
    SELECT l.user_id,
           round(t_click, 6) AS t_click,
           round(v_click, 6) AS v_click,
           round(t_view, 6) AS t_view
    FROM l JOIN r ON l.user_id = r.user_id
               AND t_view <= t_click AND t_view >= t_click - 86400
    """,
)
def stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL stream-stream interval join (SURVEY.md §2.8 extension —
    Structured Streaming's symmetric hash join, not a batch stand-in):
    clicks join the views that preceded them by <= 1 day per user,
    driven across TWO micro-batch engine runs split at the time median.
    Run 2's clicks must pair with run 1's views out of RESTORED join
    state — a state-store failure loses exactly the cross-run pairs and
    flips rows_match.  Both sides are watermarked and the range lives
    on the event-time columns, so state is evictable (the production
    posture); the delay is set beyond the fixture's span so exactness
    vs the batch oracle is provable.  Inner-join results stream out
    immediately (no finality wait — that lifecycle is
    stream_rollup_finality's)."""
    # cached: the min/max probe plus FOUR staged filter-writes all
    # re-scan the same events transform (guide §1.2)
    ev = read_events(spark, sf_dir).cache()
    # r15 (VERDICT r14 item 4): the cache feeds only in-function
    # actions; release it before returning (the returned plan reads
    # back from storage), even on error
    try:
        t_min, t_max = ev.agg(F.min("ts_sec"), F.max("ts_sec")).first()
        t_split = (t_min + t_max) / 2

        base = _scratch_dir("stream_interval_join_")
        src_l, src_r = f"{base}/clicks", f"{base}/views"
        out, ckpt = f"{base}/out", f"{base}/ckpt"

        clicks = ev.filter(F.col("event_type") == "click").select(
            "user_id",
            F.timestamp_seconds("ts_sec").alias("ts"),
            F.col("value").alias("v_click"),
            "ts_sec",
        )
        views = ev.filter(F.col("event_type") == "view").select(
            F.col("user_id").alias("uid_r"),
            F.timestamp_seconds("ts_sec").alias("ts_r"),
            "ts_sec",
        )

        def run_once():
            with _stream_state_partitions(spark, STREAM_STATE_PARTITIONS):
                l = (
                    spark.readStream.schema("user_id long, ts timestamp, v_click double")
                    .parquet(src_l)
                    .withWatermark("ts", "40 days")
                )
                r = (
                    spark.readStream.schema("uid_r long, ts_r timestamp")
                    .parquet(src_r)
                    .withWatermark("ts_r", "40 days")
                )
                j = l.join(
                    r,
                    F.expr(
                        "user_id = uid_r AND ts_r BETWEEN ts - INTERVAL 1 DAY AND ts"
                    ),
                ).select(
                    "user_id",
                    F.round(F.col("ts").cast("double"), 6).alias("t_click"),
                    F.round("v_click", 6).alias("v_click"),
                    F.round(F.col("ts_r").cast("double"), 6).alias("t_view"),
                )
                q = (
                    j.writeStream.format("parquet")
                    .outputMode("append")
                    .option("checkpointLocation", ckpt)
                    .option("path", out)
                    .trigger(availableNow=True)
                    .start()
                )
                assert q.awaitTermination(600), "stream drain did not finish"

        for lo, hi in [(t_min - 1, t_split), (t_split, t_max + 1)]:
            clicks.filter(
                (F.col("ts_sec") >= lo) & (F.col("ts_sec") < hi)
            ).drop("ts_sec").coalesce(1).write.mode("append").parquet(src_l)
            views.filter(
                (F.col("ts_sec") >= lo) & (F.col("ts_sec") < hi)
            ).drop("ts_sec").coalesce(1).write.mode("append").parquet(src_r)
            run_once()

        return spark.read.parquet(out)
    finally:
        ev.unpersist()


@query(
    "rel_top_orders_per_customer",
    """
    SELECT o_custkey, o_orderkey, rn FROM (
        SELECT o_custkey, o_orderkey,
               row_number() OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_totalprice DESC, o_orderkey
               ) AS rn
        FROM orders
    ) WHERE rn <= 2
    """,
)
def rel_top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking window (SURVEY.md §2.5, absent in the reference): top-2
    orders per customer by price; orderkey tiebreak keeps it
    deterministic."""
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return (
        orders.select("o_custkey", "o_orderkey", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 2)
    )


@query(
    "rel_shipping_priority",
    """
    SELECT l_orderkey,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-06-01'
      AND l_shipdate > TIMESTAMP '1998-06-01'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def rel_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-shaped shipping priority: selective dimension filter
    broadcast into a 3-way join, grouped revenue, global top-10.  Both
    date filters sit directly on their scans (pushed to parquet), the
    filtered customer side is explicitly broadcast, and the orderkey
    tiebreak makes LIMIT deterministic."""
    cutoff = F.lit("1998-06-01").cast("timestamp")
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


@query(
    "tsdb_gap_fill",
    """
    WITH agg AS (
        SELECT event_type AS path,
               CAST(floor(epoch(ts) / 60) * 60 AS BIGINT) AS "timestamp",
               count(*) AS n,
               round(sum(value), 6) AS value_sum
        FROM events GROUP BY 1, 2
    ),
    bounds AS (SELECT min("timestamp") AS lo, max("timestamp") AS hi FROM agg),
    grid AS (
        SELECT p.path, CAST(g.b AS BIGINT) AS "timestamp"
        FROM (SELECT DISTINCT path FROM agg) p
        CROSS JOIN (
            SELECT unnest(generate_series(lo, hi, 60)) AS b FROM bounds
        ) g
    )
    SELECT grid.path, grid."timestamp",
           coalesce(agg.n, 0) AS n,
           round(coalesce(agg.value_sum, 0), 6) AS value_sum
    FROM grid LEFT JOIN agg USING (path, "timestamp")
    """,
)
def tsdb_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap filling — the dashboard-facing tsdb op the reference leaves to
    its Bokeh client (missing buckets simply break the plotted line,
    reference app/__init__.py graph data): every (path, minute) cell of
    the global bucket range is emitted, zero-filled where no datapoints
    landed.  The grid is built by exploding a sequence against the
    broadcast 1-row bounds relation — no driver loop, no cross product of
    data-sized inputs — and the fill join shuffles grid+agg once on the
    (path, bucket) key.  Grid cardinality is paths × buckets, independent
    of the raw event count, so at 100 TB the fill cost tracks the
    *output* size (what a renderer must consume anyway), not the input."""
    ev = events_as_incoming(spark, sf_dir)
    agg = ev.groupBy(
        "path",
        (F.floor(F.col("timestamp") / 60) * 60).cast("long").alias("timestamp"),
    ).agg(F.count("*").alias("n"), F.round(F.sum("value"), 6).alias("value_sum"))
    bounds = agg.agg(F.min("timestamp").alias("lo"), F.max("timestamp").alias("hi"))
    grid = (
        agg.select("path")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "path",
            F.explode(F.sequence(F.col("lo"), F.col("hi"), F.lit(60))).alias(
                "timestamp"
            ),
        )
    )
    return grid.join(agg, ["path", "timestamp"], "left").select(
        "path",
        "timestamp",
        F.coalesce("n", F.lit(0)).alias("n"),
        F.round(F.coalesce("value_sum", F.lit(0.0)), 6).alias("value_sum"),
    )


@query(
    "tsdb_moving_avg",
    """
    WITH agg AS (
        SELECT event_type AS path,
               CAST(floor(epoch(ts) / 60) * 60 AS BIGINT) AS "timestamp",
               avg(value) AS bucket_avg
        FROM events GROUP BY 1, 2
    )
    SELECT path, "timestamp",
           round(avg(bucket_avg) OVER (
               PARTITION BY path ORDER BY "timestamp"
               RANGE BETWEEN 240 PRECEDING AND CURRENT ROW
           ), 6) AS moving_avg
    FROM agg
    """,
)
def tsdb_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-bucket trailing moving average over the per-minute aggregate —
    the smoothing pass a graphing client applies.  RANGE (not ROWS)
    framing keyed on the bucket value makes gaps behave correctly: a
    bucket after a quiet period averages only buckets inside its 4-minute
    lookback.  One shuffle on path for the window; the frame runs on the
    already-aggregated relation (buckets, not raw events)."""
    ev = events_as_incoming(spark, sf_dir)
    agg = ev.groupBy(
        "path",
        (F.floor(F.col("timestamp") / 60) * 60).cast("long").alias("timestamp"),
    ).agg(F.avg("value").alias("bucket_avg"))
    w = (
        Window.partitionBy("path")
        .orderBy("timestamp")
        .rangeBetween(-240, Window.currentRow)
    )
    return agg.select(
        "path",
        "timestamp",
        F.round(F.avg("bucket_avg").over(w), 6).alias("moving_avg"),
    )


@query(
    "tsdb_rolling_p99",
    """
    SELECT event_type AS path,
           round(epoch(ts), 6) AS point_ts,
           round(quantile_cont(value, 0.99) OVER (
               PARTITION BY event_type ORDER BY epoch(ts)
               RANGE BETWEEN 240 PRECEDING AND CURRENT ROW
           ), 6) AS rolling_p99
    FROM events
    """,
)
def tsdb_rolling_p99(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 4-minute p99 per path at every datapoint — the
    latency-SLO dashboard query, and the EXACT percentile running as a
    WINDOW aggregate (every other percentile use is a groupBy; the
    sliding form is what alerting evaluates).  RANGE framing on the raw
    epoch keys the lookback to TIME, not row count, so burst and quiet
    periods window correctly.  Both engines interpolate linearly
    (Spark ``percentile`` == DuckDB ``quantile_cont``), rounded to 6.

    Scale shape: one shuffle on path; per-row work is bounded by the
    frame's datapoint count (rate × 240 s), independent of corpus size —
    the frame bound is the operator's admission contract, same as the
    Gopher gate's word-count bound."""
    ev = events_as_incoming(spark, sf_dir)
    w = (
        Window.partitionBy("path")
        .orderBy("timestamp")
        .rangeBetween(-240, Window.currentRow)
    )
    return ev.select(
        "path",
        F.round(F.col("timestamp"), 6).alias("point_ts"),
        F.round(F.percentile("value", F.lit(0.99)).over(w), 6).alias(
            "rolling_p99"
        ),
    )
