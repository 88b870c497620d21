#!/usr/bin/env python
"""Benchmark harness: runs the engine's headline queries at
``$SPARK_GRAFT_SF_DIR`` (default sf0.1) on ``local[$SPARK_GRAFT_CPUS]``
and prints ONE JSON line.

Two parts:

1. every registered query from smalltsdb_spark.queries (the correctness
   surface), executed to a no-op sink so the full plan runs without
   driver-side collection cost;
2. the BASELINE.md-equivalent workload: the full 6-period, 8-stat
   aggregation over >= 1M datapoints (the reference's prototype benchmark,
   prototypes/views.py — 1M rows in ~65-75 s single-core ≈ 13-15 k rows/s).
   We replicate the events-derived incoming relation up to 1M rows and
   report datapoints/sec across all 6 periods.
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import tempfile
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from smalltsdb_spark.config import PERIODS
from smalltsdb_spark.operators import spread
from smalltsdb_spark.operators.aggregate import aggregate
from smalltsdb_spark.queries import QUERIES, events_as_incoming
from smalltsdb_spark import queries_ext  # noqa: F401  (registers extensions)
from smalltsdb_spark import queries_rel  # noqa: F401  (registers rel/window wave)
from smalltsdb_spark.session import get_spark
from smalltsdb_spark.tsdb import TSDB


def noop_sink(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf"))
    except ValueError:
        sf = None

    spark = get_spark(
        app_name="smalltsdb-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        # the bench session exposes the status API (UI) so per-query
        # output/shuffle byte counts can be recorded (r8 protocol:
        # I/O-heaviness must be visible per entry); retainedStages is
        # raised so the cumulative totals stay monotonic across the
        # whole ~130-query session instead of silently evicting
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.retainedStages": "30000",
            "spark.ui.retainedJobs": "30000",
            # the console progress bar writes \r-frames that land in the
            # driver's captured output ahead of the final JSON line — in
            # r8 that junk consumed ~100 chars of the 2000-char tail and
            # cut the line mid-JSON (VERDICT r8 "What's wrong" #3)
            "spark.ui.showConsoleProgress": "false",
        },
    )

    # warm the JVM + file listing so per-query numbers measure the queries
    events_as_incoming(spark, sf_dir).limit(1).count()
    # ... and the streaming micro-batch machinery (~3 s one-time init that
    # would otherwise land on whichever streaming query runs first)
    import uuid

    _wdir = tempfile.mkdtemp(prefix="bench_stream_warm_")
    spark.createDataFrame([("w", 0.0, 0.0)], "path string, timestamp double, value double").write.mode("overwrite").parquet(_wdir)
    _wq = (
        spark.readStream.schema("path string, timestamp double, value double")
        .parquet(_wdir)
        .groupBy("path")
        .count()
        .writeStream.format("memory")
        .queryName(f"warm_{uuid.uuid4().hex[:8]}")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    _wq.awaitTermination(120)
    # ... and the Python/Arrow workers: the first pandas-UDF stage pays
    # ~7 s spawning one worker per core (each importing pandas/pyarrow).
    # Spawn them all up front with a trivial mapInPandas over one task per
    # core so no timed query carries that one-time cost.
    def _warm_py(batches):
        for b in batches:
            yield b

    spark.range(int(cpus) * 4, numPartitions=int(cpus)).mapInPandas(
        _warm_py, "id long"
    ).write.mode("overwrite").format("noop").save()

    # r9 JIT warm-up (VERDICT r8 item 1 — mitigate, not just diagnose,
    # the tiered-compilation churn that put 10-45x cold-run outliers in
    # the official record: text_embed_rp raw [340.4, 11.1, 4.8] in r8).
    # Whole-stage-codegen classes are plan-shape-specific, not
    # data-sized, so ONE pass of the heaviest codegen families at
    # sf0.001 compiles exactly the classes their sf0.1 measured runs
    # need.  Evidence: SYNC_STUDY.jsonl warm-up sessions — cold:warm for
    # tsdb_sync_idempotent / baseline_sync_1m dropped from 1.6-2.4x to
    # ~1.1x, both landing on the historical warm floor.  ~45 s once per
    # session, amortized against multi-minute collapse outliers.
    warm_sf = os.environ.get("SPARK_GRAFT_WARMUP_SF", "/root/testdata/sf0.001")
    if warm_sf and os.path.isdir(warm_sf) and os.path.abspath(
        warm_sf
    ) != os.path.abspath(sf_dir):
        for _warm_name in (
            "tsdb_sync_idempotent",   # sync upsert + manifest path
            "text_embed_rp",          # explode/groupBy + long-sum folds
            "text_quality_classifier",  # GD iteration plans
            # r10: sorts alphabetically BEFORE the classifier rows, so
            # without its own warm-up it pays the whole classifier-plan
            # JIT (measured: 32 s cold vs 16 s warm at sf0.1) plus its
            # window/gate shapes
            "ext_curate_learned",
        ):
            try:
                noop_sink(QUERIES[_warm_name](spark, warm_sf))
            except Exception:
                pass  # warm-up must never fail the bench
        _wsync = tempfile.mkdtemp(prefix="bench_warm_sync_")
        try:
            _wdb = TSDB(spark, _wsync, now=lambda: 4_000_000_000.0)
            _wdb.insert(spread(events_as_incoming(spark, warm_sf)))
            _wdb.sync()  # compiles all 6 period-aggregation plans
        except Exception:
            pass
        finally:
            shutil.rmtree(_wsync, ignore_errors=True)

    def isolate() -> None:
        """Reset session state between timed queries so each number is
        attributable to the query's plan, not to what ran before it:
        stop any streaming query a previous entry left active, drop
        cached relations, release any persistent RDD blocks (e.g. a
        leaked localCheckpoint) from the block manager, and re-warm the
        Python worker pool.  The re-warm matters: PythonWorkerFactory
        reaps idle pooled workers after a HARDCODED 1-minute timeout
        (IDLE_WORKER_TIMEOUT_NS, not configurable), so the first
        Arrow-batched query after a stretch of JVM-only queries would
        otherwise pay a ~4-8 s 32-worker respawn (pandas/pyarrow
        imports) that belongs to worker lifecycle, not to its plan —
        measured as phantom 3-10x regressions on whichever sim_/mm_
        query followed the rel_/text_ families alphabetically."""
        for q in spark.streams.active:
            try:
                q.stop()
            except Exception:
                pass
        spark.catalog.clearCache()
        for e in spark.sparkContext._jsc.getPersistentRDDs().entrySet().toArray():
            e.getValue().unpersist(False)
        spark.range(int(cpus) * 4, numPartitions=int(cpus)).mapInPandas(
            _warm_py, "id long"
        ).write.mode("overwrite").format("noop").save()

    # Host-interference probes (r8 protocol — VERDICT r7 item 1).  The
    # r7 sessions proved the CPU probe alone is "necessary but not
    # sufficient": parquet-write-heavy phases stalled while it stayed
    # flat.  Two fixed workloads now run side by side on a cadence, so a
    # stall window is attributable to the side it hits:
    #  - cpu: a 50 M-row whole-stage-codegen aggregation (no I/O);
    #  - write: a fixed 32-partition/400 k-row partitioned parquet
    #    write + recursive delete — the sync upsert's write shape.
    # The timeline lands in BENCH_DETAIL under "probes", one entry per
    # ~20 measured queries, each tagged with the query it preceded.
    def run_cpu_probe() -> float:
        t0 = time.perf_counter()
        spark.range(50_000_000).select(
            ((F.col("id") * 3 + 1) % 7).alias("x")
        ).agg(F.sum("x")).collect()
        return time.perf_counter() - t0

    def run_write_probe() -> float:
        d = tempfile.mkdtemp(prefix="bench_write_probe_")
        df = spark.range(400_000).select(
            (F.col("id") % 32).alias("p"), F.col("id").alias("v")
        )
        t0 = time.perf_counter()
        df.repartition(F.col("p")).write.partitionBy("p").mode(
            "overwrite"
        ).parquet(d)
        elapsed = time.perf_counter() - t0
        shutil.rmtree(d, ignore_errors=True)
        return elapsed

    probes: list[dict] = []

    def take_probes(near: str) -> None:
        probes.append(
            {
                "before": near,
                "cpu_sec": round(run_cpu_probe(), 3),
                "write_sec": round(run_write_probe(), 3),
            }
        )

    # Per-query I/O accounting via the status API: cumulative completed-
    # stage totals, delta'd around each measured run, so BENCH_DETAIL
    # shows how write-amplified each entry is (the r7 3-way
    # tsdb_sync_idempotent discrepancy was unattributable without this).
    def stage_totals() -> dict[str, int]:
        import urllib.request

        sc = spark.sparkContext
        url = (
            f"{sc.uiWebUrl}/api/v1/applications/{sc.applicationId}"
            "/stages?status=complete"
        )
        try:
            with urllib.request.urlopen(url, timeout=15) as r:
                stages = json.load(r)
        except Exception:
            return {}
        return {
            "output_bytes": sum(s.get("outputBytes", 0) for s in stages),
            "output_records": sum(s.get("outputRecords", 0) for s in stages),
            "shuffle_write_bytes": sum(
                s.get("shuffleWriteBytes", 0) for s in stages
            ),
            # cumulative task CPU and GC: a wall-time outlier whose
            # executor_run_ms scales with it is a host CPU-throughput
            # phase (observed: identical 32-task stages swinging 37 s →
            # 216 s cumulative with flat GC and flat I/O probes); wall
            # >> run is scheduling/stall; gc spike is memory pressure
            "executor_run_ms": sum(s.get("executorRunTime", 0) for s in stages),
            "executor_cpu_ms": int(
                sum(s.get("executorCpuTime", 0) for s in stages) / 1e6
            ),
            "jvm_gc_ms": sum(s.get("jvmGcTime", 0) for s in stages),
        }

    # Measurement protocol (VERDICT r5 item 1 — make the committed number
    # trustworthy): two isolated runs per query; if they disagree by more
    # than 2x, a third run breaks the tie and the MEDIAN of three is
    # recorded (a single GC pause / worker-respawn outlier can no longer
    # become the official number, in either direction — r5 committed a
    # 48.9 s text_novelty whose isolated re-measure was 4.9 s).  When the
    # two runs agree, the min is recorded as before (JIT warmup means the
    # second run is usually the honest plan cost).  EVERY raw run lands in
    # BENCH_DETAIL.json under "runs" so outliers stay visible.
    timings: dict[str, float] = {}
    runs_record: dict[str, list[float]] = {}
    io_record: dict[str, dict[str, int]] = {}
    deferred: dict[str, object] = {}  # name -> run_once, re-measured at suite end
    noise_record: dict[str, str] = {}  # name -> noise_class of the flagged delta
    runners: dict[str, object] = {}  # name -> run_once, for the floor-retry pass
    measured_count = {"n": 0}

    def noise_class(d: dict[str, int]) -> str:
        """Classify an outlier run's io fingerprint into one of the THREE
        observed host-noise modes (VERDICT r11 item 1 — the old single
        cpu-throughput fingerprint let gc-storm and scheduler-stall
        distortions escape both the deferral and the annotation, leaving
        9 distorted official numbers standing unannotated in r11):

        - ``cpu-collapse``: executor CPU proportional to executor run
          time with flat GC — the work itself ran slow (host
          CPU-throughput phase; r9 text_bpe_encode 69.4 s);
        - ``gc-storm``: GC takes >0.2x of executor run time (r11
          dedup_simhash — gc 26.3 s of a 42.6 s run);
        - ``stall``: executor CPU under half of executor run time —
          tasks were scheduled but not running (r11
          tsdb_compact_roundtrip — cpu 24 s vs run 97 s; wall >> run
          shows up here too, as run time that never turned into cpu);
        - ``no-io-evidence``: the status API returned nothing —
          conservative (treated as noise-eligible).

        The classification ATTRIBUTES a distortion; the gate for
        deferral/annotation is wall-time evidence (median >3x the
        session's own min, or >3x the cross-session floor with a
        multi-second gap) — every mode defers and annotates."""
        run_ms = d.get("executor_run_ms", 0)
        if run_ms <= 0:
            return "no-io-evidence"
        if d.get("jvm_gc_ms", 0) > 0.2 * run_ms:
            return "gc-storm"
        if d.get("executor_cpu_ms", 0) >= 0.5 * run_ms:
            return "cpu-collapse"
        return "stall"

    def measure(name: str, run_once) -> None:
        """run_once() executes the workload once and returns elapsed sec
        (timing its own timed region so per-run setup stays untimed)."""
        if measured_count["n"] % 20 == 0:
            take_probes(name)
        measured_count["n"] += 1
        runners[name] = run_once
        runs = []
        io_before = io_after = {}
        for _ in range(2):
            isolate()
            io_before = stage_totals()
            runs.append(run_once())
            io_after = stage_totals()
        if max(runs) > 2 * min(runs):
            isolate()
            io_before = stage_totals()
            runs.append(run_once())
            io_after = stage_totals()
            value = sorted(runs)[1]
        else:
            value = min(runs)
        timings[name] = round(value, 3)
        runs_record[name] = [round(r, 3) for r in runs]
        # stderr progress line (stdout stays reserved for the one JSON
        # line the driver tail-parses): makes a long/killed session
        # diagnosable — which entry it died in, and how far it got
        print(
            f"[bench {measured_count['n']}] {name} = {timings[name]}s "
            f"runs={runs_record[name]}",
            file=sys.stderr,
            flush=True,
        )
        delta = {}
        if io_before and io_after:
            delta = {
                k: io_after.get(k, 0) - io_before.get(k, 0) for k in io_after
            }
            io_record[name] = delta
        # Noise-aware deferral (VERDICT r9 item 2, widened r12): BENCH_r09
        # recorded text_bpe_encode at 69.4 s on unchanged code because TWO
        # of three runs fell in one host JVM-efficiency-collapse window —
        # the median-of-3 IS the collapse when the window spans two runs.
        # When the recorded median still disagrees with the session's own
        # floor by >3x, queue ONE extra isolated re-measure for the END of
        # the suite (minutes later — outside the window with high
        # probability) and record the lower median of all runs.  The io
        # fingerprint CLASSIFIES the distortion (noise_class) but no
        # longer gates the deferral: r11 showed gc-storm and stall modes
        # escaping the cpu-only fingerprint, and an extra re-measure is
        # cheap while a distorted official number is not.  Every raw run
        # stays in BENCH_DETAIL; entries re-measured this way are listed
        # under "deferred" with their class so the record shows its own
        # provenance.
        if len(runs) == 3 and value > 3 * min(runs):
            deferred[name] = run_once
            noise_record[name] = noise_class(delta)

    def settle_deferred() -> list[str]:
        names = list(deferred)
        for name in names:
            run_once = deferred.pop(name)
            isolate()
            runs = runs_record[name] + [round(run_once(), 3)]
            runs_record[name] = runs
            # lower median: collapse only ever inflates, so with an even
            # run count the cheaper middle value is the honest plan cost
            timings[name] = round(sorted(runs)[(len(runs) - 1) // 2], 3)
        return names

    def timed_noop(df_fn):
        def run_once() -> float:
            t0 = time.perf_counter()
            noop_sink(df_fn())
            return time.perf_counter() - t0

        return run_once

    # SPARK_GRAFT_BENCH_ONLY: regex filter over query names for targeted
    # local iteration (official runs leave it unset — the full suite)
    only = os.environ.get("SPARK_GRAFT_BENCH_ONLY")
    only_re = __import__("re").compile(only) if only else None
    for name, fn in sorted(QUERIES.items()):
        if only_re is not None and not only_re.search(name):
            continue
        measure(name, timed_noop(lambda fn=fn: fn(spark, sf_dir)))
    isolate()

    # Streaming lifecycle FLOOR (VERDICT r6 item 7): a do-nothing
    # Structured Streaming query over one staged row — readStream →
    # parquet sink with checkpointing, availableNow drain, stop.  Every
    # stream_* number above reads as (this floor) + actual work; without
    # it a reader can't tell how much of e.g. stream_interval_join's
    # seconds is checkpoint/micro-batch fixed overhead vs plan cost.
    def run_stream_noop() -> float:
        base = tempfile.mkdtemp(prefix="bench_stream_noop_")
        src, out, ckpt = f"{base}/src", f"{base}/out", f"{base}/ckpt"
        schema = "path string, timestamp double, value double"
        spark.createDataFrame([("n", 0.0, 1.0)], schema).write.mode(
            "overwrite"
        ).parquet(src)
        t0 = time.perf_counter()
        q = (
            spark.readStream.schema(schema)
            .parquet(src)
            .writeStream.format("parquet")
            .option("checkpointLocation", ckpt)
            .option("path", out)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        q.stop()
        elapsed = time.perf_counter() - t0
        shutil.rmtree(base, ignore_errors=True)
        return elapsed

    measure("stream_noop", run_stream_noop)

    # BASELINE-equivalent: 6-period aggregation of >= 1M datapoints.
    inc = spread(events_as_incoming(spark, sf_dir))
    n = inc.count()
    reps = max(1, math.ceil(1_000_000 / max(n, 1)))
    if reps > 1:
        big = (
            inc.crossJoin(F.broadcast(spark.range(reps)))
            .select(
                "path",
                (F.col("timestamp") + F.col("id") * 0.001).alias("timestamp"),
                "value",
            )
        )
    else:
        big = inc
    total_rows = n * reps
    # the 6 period aggregations are independent jobs (SURVEY.md §3.2) —
    # submit them concurrently so the scheduler interleaves their stages;
    # cache the expanded input so it is materialized once, not 6 times
    big = big.cache()
    big.count()
    # Same measure() protocol as the query suite (2 runs, median-of-3 on
    # >2x disagreement, all raw runs recorded): measured run-to-run
    # variance on an UNCHANGED plan in one session is ~2x (7.8 s vs
    # 15.3 s back-to-back at sf0.1 — JIT compile state + GC phase, not
    # the plan).  Even the fresh-session worst case stays >= 4x faster
    # than the reference's 65-75 s for the same workload.
    def run_agg6() -> float:
        t0 = time.perf_counter()
        threads = [
            threading.Thread(target=noop_sink, args=(aggregate(big, seconds),))
            for _, seconds in PERIODS
        ]
        for th in threads:
            th.start()
        for th in threads:
            th.join()
        return time.perf_counter() - t0

    measure("baseline_6period_agg", run_agg6)
    agg6_sec = timings["baseline_6period_agg"]

    # End-to-end maintenance path: TablesTSDB.sync of the same 1M rows —
    # aggregation PLUS materialization to parquet across all 6 periods
    # (the reference's prototype timing includes its table writes too).
    # Each run uses an INDEPENDENT storage dir: sync is incremental, so
    # re-syncing the same dir would time a no-op instead of the write.
    def run_sync() -> float:
        sync_dir = tempfile.mkdtemp(prefix="bench_sync_")
        try:
            db = TSDB(spark, sync_dir, now=lambda: 4_000_000_000.0)
            db.insert(big)
            t0 = time.perf_counter()
            db.sync()
            return time.perf_counter() - t0
        finally:
            shutil.rmtree(sync_dir, ignore_errors=True)

    take_probes("baseline_sync_1m")  # bracket the write-heaviest entry
    measure("baseline_sync_1m", run_sync)
    take_probes("after_baseline_sync_1m")
    # Settle main-suite deferrals HERE — minutes after the flagged runs,
    # while `big` is still cached and the session config is untouched
    # (the join block below disables broadcast, which would change the
    # re-measured plans).
    deferred_names = settle_deferred()
    sync_sec = timings["baseline_sync_1m"]
    big.unpersist()

    # Bucketed-table path: the write-once/read-many co-location claim,
    # with a number.  Same workload — orders ⋈ lineitem on orderkey plus
    # a per-order rollup (the TPC-H co-location shape) — over flat
    # parquet tables (join + agg each shuffle) vs both tables bucketed
    # by orderkey (exchange-free; plan pinned by tests/test_plans).
    # Broadcast is disabled for the pair: at 100 TB neither side
    # broadcasts, and the thing under test is shuffle vs co-location.
    from smalltsdb_spark.storage import write_bucketed_table

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    od = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li.write.mode("overwrite").format("parquet").saveAsTable("bench_li_flat")
    od.write.mode("overwrite").format("parquet").saveAsTable("bench_od_flat")
    write_bucketed_table(li, "bench_li_bkt", int(cpus), "l_orderkey")
    write_bucketed_table(od, "bench_od_bkt", int(cpus), "o_orderkey")

    def order_rollup(li_tbl: str, od_tbl: str):
        l, o = spark.table(li_tbl), spark.table(od_tbl)
        return (
            l.join(o, l.l_orderkey == o.o_orderkey)
            .groupBy("l_orderkey")
            .agg(
                F.count("*").alias("n_items"),
                F.sum("l_extendedprice").alias("revenue"),
                F.max("o_totalprice").alias("totalprice"),
            )
        )

    bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        for label, pair in [
            ("flat_agg_join", ("bench_li_flat", "bench_od_flat")),
            ("bucketed_agg_join", ("bench_li_bkt", "bench_od_bkt")),
        ]:
            measure(label, timed_noop(lambda pair=pair: order_rollup(*pair)))
        # join deferrals must re-run while broadcast is still disabled and
        # the bench tables still exist
        deferred_names += settle_deferred()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcast)
        for t in ("bench_li_flat", "bench_od_flat", "bench_li_bkt", "bench_od_bkt"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")

    # Cross-session floor ledger (VERDICT r10 item 2): BENCH_FLOORS.json
    # keeps the best-ever time per entry across ALL sessions — keyed by
    # scale factor, since an sf0.01 iteration run must not poison the
    # sf0.1 floors — updated whenever a run beats it (collapse only ever
    # inflates, so the min of raw runs is the honest floor).  Each
    # official number records its floor_ratio, and an entry whose
    # official value still exceeds 3x its stored floor WITH the collapse
    # io fingerprint is annotated "environment" — the number stands (it
    # is what this session measured) but the record carries its own
    # provenance, so one noisy host session can no longer masquerade as
    # a plan regression (r9 text_bpe_encode 69.4 s, r10 text_embed_rp
    # 23.4 s).
    floors_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_FLOORS.json"
    )
    sf_key = str(sf)
    try:
        with open(floors_path) as f:
            all_floors = json.load(f)
    except Exception:
        all_floors = {}
    floors = {k: float(v) for k, v in all_floors.get(sf_key, {}).items()}

    # Floor-triggered retry (r12): an entry that would be environment-
    # annotated (>3x its cross-session floor with a >2 s gap) gets ONE
    # more isolated re-measure at the very end of the suite — a
    # different noise window with high probability — and the LOWER
    # median of all its runs is recorded: the deferral discipline,
    # triggered by the ledger instead of the session's own min (the r12
    # clean session still annotated 8 entries whose solo re-runs were
    # fine; most would have been rescued by one more end-of-suite run).
    # A real regression re-measures high and stays annotated.  Entries
    # whose workload is no longer runnable (the join tables are dropped
    # by now) are skipped by the try/except.
    retried: list[str] = []
    # io delta of the ORIGINAL (distorted) measurement for entries the
    # retry pass re-runs — noise_class must attribute the run that
    # earned the annotation, not the retry (ADVICE r12)
    pre_retry_io: dict[str, dict[str, int]] = {}
    # the pass is wall-clock-BOUNDED: on a badly noisy host every retry
    # can itself stall (observed: a 131 s re-run of an 8 s workload), and
    # an unbounded pass could push the whole bench past the driver's
    # budget — cheapest officials retry first, and the pass stops once
    # its budget is spent (remaining entries keep their annotation)
    retry_budget = float(os.environ.get("SPARK_GRAFT_RETRY_BUDGET", "180"))
    retry_t0 = time.perf_counter()
    for name in sorted(timings, key=lambda n: timings[n]):
        fl = floors.get(name)
        run_once = runners.get(name)
        official = timings[name]
        if (
            not fl
            or fl <= 0
            or run_once is None
            or not (official > 3 * fl and official - fl > 2.0)
        ):
            continue
        if time.perf_counter() - retry_t0 > retry_budget:
            break
        try:
            isolate()
            io_b = stage_totals()
            extra = round(run_once(), 3)
            io_a = stage_totals()
        except Exception:
            continue  # workload context gone — leave the record as-is
        runs_record[name] = runs_record[name] + [extra]
        if io_b and io_a:
            # keep the DISTORTED run's io fingerprint for noise
            # classification (ADVICE r12: overwriting it here made
            # noise_class attribute the retry run's io, not the run
            # that earned the annotation) — it lands in the detail
            # record under "io_pre_retry"; "io" shows the retry's delta
            pre_retry_io.setdefault(name, dict(io_record.get(name, {})))
            io_record[name] = {
                k: io_a.get(k, 0) - io_b.get(k, 0) for k in io_a
            }
        rs = sorted(runs_record[name])
        # the rescue pass must never WORSEN the record it repairs
        # (ADVICE r12): an official from min-of-2 agreement plus one
        # stalled retry would make median-of-3 the HIGHER agreeing run
        # (e.g. agreeing [4.0, 7.9] official 4.0, a 131 s stalled retry
        # lifts the median to 7.9) — record min(previous official,
        # median of all runs)
        timings[name] = min(official, rs[(len(rs) - 1) // 2])
        retried.append(name)

    floor_ratios: dict[str, float] = {}
    environment: list[str] = []
    for name, official in timings.items():
        fl = floors.get(name)
        if fl and fl > 0:
            floor_ratios[name] = round(official / fl, 2)
            # relative AND absolute gate: 3x a 0.2 s floor is scheduler
            # noise, not a host event — only a multi-second gap earns
            # the annotation.  ANY noise class annotates (r12 — the
            # cpu-only gate left r11's gc-storm/stall distortions
            # unannotated); the class itself is recorded per entry.
            if official > 3 * fl and official - fl > 2.0:
                environment.append(name)
                # classify from the ORIGINAL run's io delta when the
                # retry pass overwrote it (ADVICE r12)
                noise_record.setdefault(
                    name,
                    noise_class(
                        pre_retry_io.get(name, io_record.get(name, {}))
                    ),
                )
        # Floor update rule (r12 — VERDICT r11 item 1): floors advance
        # from the OFFICIAL value only, never from raw runs.  Raw-run
        # seeding is how implausible floors entered the ledger (a
        # warm-cache or partial fragment no official number could ever
        # reproduce — text_bpe_train's 0.276 s floor against a
        # 1.4-1.8 s official history made floor_ratio read 35.8x
        # catastrophe where ~5x host noise was the truth).  An official
        # value is min-of-2-agreeing or median-of-3 — a number a
        # healthy session actually posts.
        if fl is None or official < fl:
            floors[name] = official
    if only_re is None:
        # targeted SPARK_GRAFT_BENCH_ONLY runs must not update the
        # cross-session ledger: partial sessions skip the suite-wide
        # warm-up ordering, so their numbers are not floor-grade
        all_floors[sf_key] = dict(sorted(floors.items()))
        with open(floors_path, "w") as f:
            json.dump(dict(sorted(all_floors.items())), f, indent=1)

    _ratios = sorted(floor_ratios.values())
    session_noise = {
        "median_floor_ratio": (
            _ratios[(len(_ratios) - 1) // 2] if _ratios else None
        ),
        "entries_over_3x_floor": sum(1 for r in _ratios if r > 3.0),
        "entries_with_floor": len(_ratios),
    }

    result = {
        "metric": "suite_total_wall_sec",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "baseline_6period_datapoints": total_rows,
        "baseline_6period_sec": round(agg6_sec, 3),
        "baseline_6period_rows_per_sec": round(total_rows / agg6_sec, 1),
        "baseline_sync_1m_sec": round(sync_sec, 3),
        "baseline_sync_1m_rows_per_sec": round(total_rows / sync_sec, 1),
        # every raw run behind every recorded number (detail file only —
        # stdout stays within the driver's 2000-char tail); 3 entries
        # mean the 2 runs disagreed >2x and the median was recorded
        "runs": runs_record,
        # entries whose median-of-3 hit the collapse gate and received a
        # deferred end-of-suite re-measure (recorded value = lower median
        # of all runs; see measure()/settle_deferred)
        "deferred": deferred_names,
        # entries given the floor-triggered end-of-suite re-measure
        # (recorded value = lower median of all runs; see the retry pass)
        "retried": retried,
        # per-entry official/best-ever ratio against the cross-session
        # floor ledger (BENCH_FLOORS.json, detail file only), and the
        # entries annotated as environment-distorted (official >3x its
        # floor with a >2 s absolute gap — wall-time evidence alone;
        # the io fingerprint only CLASSIFIES the mode, it no longer
        # gates the annotation)
        "floor_ratios": floor_ratios,
        "environment": sorted(environment),
        # ONE-GLANCE session health (VERDICT r12 item 4): the r12
        # driver record needed a cross-reference against the committed
        # clean session to see the whole host was ~1.4x inflated —
        # median floor_ratio across all floored entries plus the
        # >3x-floor count makes a noisy session self-describing, so a
        # reader can tell host noise from code regressions without
        # another record
        "session_noise": session_noise,
        # the noise MODE behind every deferred or environment-annotated
        # entry: cpu-collapse | gc-storm | stall | no-io-evidence (r12 —
        # the fingerprint class belongs in the record)
        "noise_class": dict(sorted(noise_record.items())),
        # r8 protocol: host-interference probe timeline (cpu + fixed
        # partitioned-write, every ~20 queries) and per-query output/
        # shuffle byte deltas from the status API — I/O-heaviness and
        # stall windows are attributable per entry now
        "probes": probes,
        "io": io_record,
        # original (pre-retry) io deltas for retried entries — the
        # fingerprints noise_class classified (ADVICE r12)
        "io_pre_retry": pre_retry_io,
    }

    # The driver's capture keeps only the LAST 2000 chars of stdout and
    # json.loads that tail — the full 100-query dict is ~2900 chars, which
    # is why BENCH_r03/r04 recorded parsed=null and lost ~1/3 of the
    # timings (ADVICE r4).  So: the complete result goes to a repo file,
    # and stdout gets ONE compact line guaranteed to fit the tail — the
    # contract fields plus the slowest queries (the ones a plan audit
    # reads; everything omitted is faster than every included entry).
    # targeted SPARK_GRAFT_BENCH_ONLY runs write a SCRATCH detail file —
    # a partial session must not clobber the committed full-suite record
    # (VERDICT r11 item 1)
    detail_name = (
        "BENCH_DETAIL.json" if only_re is None else "BENCH_DETAIL_scratch.json"
    )
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), detail_name
    )
    with open(detail_path, "w") as f:
        json.dump(result, f, indent=1, sort_keys=True)

    # A FULL 131-entry queries map is ~3.3k chars compact — physically
    # bigger than the 2000-char tail, so the complete per-query record
    # lives in BENCH_DETAIL.json (committed every round) and the stdout line
    # carries the slowest entries that fit.  With the progress bar off
    # (above) the whole budget is ours and the line is the LAST output,
    # so the tail parse sees one clean JSON document.
    budget = 1900  # tail is 2000 chars; leave headroom
    by_cost = sorted(timings.items(), key=lambda kv: (-kv[1], kv[0]))

    def render(keep: int) -> str:
        line = dict(result)
        line.pop("runs", None)  # raw runs live in the detail file only
        line.pop("io", None)
        line.pop("io_pre_retry", None)
        line.pop("probes", None)
        line.pop("floor_ratios", None)  # detail file only; stdout keeps
        # the compact "environment" list — the annotation a reader of
        # the one-line record needs
        line["queries"] = dict(sorted(by_cost[:keep]))
        line["queries_total"] = len(timings)
        line["queries_shown"] = keep
        line["detail_file"] = detail_name
        return json.dumps(line, separators=(",", ":"))

    keep = len(by_cost)
    while keep > 1 and len(render(keep)) > budget:
        keep -= 1
    sys.stdout.flush()
    print(render(keep), flush=True)


if __name__ == "__main__":
    main()
