#!/usr/bin/env python
"""Isolated re-measurement of the two write-heavy bench entries whose r7
numbers disagreed 3-way (builder 8.3 s / judge 28 s / driver 58-96 s for
``tsdb_sync_idempotent`` — VERDICT r7 "Next round" #1).

One FRESH session per invocation: warms the JVM/worker pools exactly like
bench.py, takes the cpu + parquet-write probes before and after each
entry, runs the entry once, and APPENDS one JSON line to
``SYNC_STUDY.jsonl`` at the repo root.  Run it several times, spaced
across hours, to separate host I/O phase from plan cost: if the entry's
time moves while both probes stay flat, the plan is implicated; if the
write probe moves with it, the host is.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from smalltsdb_spark.queries import QUERIES, events_as_incoming
from smalltsdb_spark import queries_ext  # noqa: F401
from smalltsdb_spark import queries_rel  # noqa: F401
from smalltsdb_spark.operators import spread
from smalltsdb_spark.session import get_spark
from smalltsdb_spark.tsdb import TSDB


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    spark = get_spark(
        app_name="sync-spread-study",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    events_as_incoming(spark, sf_dir).limit(1).count()

    def jit_stats() -> dict:
        """JIT compiler telemetry (r9 — VERDICT r8 item 1): cumulative
        compilation wall-ms and per-CodeHeap occupancy, so a slow entry
        is attributable to compile churn (compile_ms delta ~ the gap)
        vs host throughput (flat compile, proportional run time)."""
        jvm = spark.sparkContext._jvm
        mf = jvm.java.lang.management.ManagementFactory
        out = {"compile_ms": int(mf.getCompilationMXBean().getTotalCompilationTime())}
        it = mf.getMemoryPoolMXBeans().iterator()
        while it.hasNext():
            p = it.next()
            name = p.getName()
            if "CodeHeap" in name or "Code Cache" in name:
                key = (
                    name.replace(" ", "_").replace("'", "").lower()
                    + "_used_mb"
                )
                out[key] = round(p.getUsage().getUsed() / 1e6, 1)
        return out

    def cpu_probe() -> float:
        t0 = time.perf_counter()
        spark.range(50_000_000).select(
            ((F.col("id") * 3 + 1) % 7).alias("x")
        ).agg(F.sum("x")).collect()
        return round(time.perf_counter() - t0, 3)

    def write_probe() -> float:
        d = tempfile.mkdtemp(prefix="study_write_probe_")
        df = spark.range(400_000).select(
            (F.col("id") % 32).alias("p"), F.col("id").alias("v")
        )
        t0 = time.perf_counter()
        df.repartition(F.col("p")).write.partitionBy("p").mode(
            "overwrite"
        ).parquet(d)
        elapsed = round(time.perf_counter() - t0, 3)
        shutil.rmtree(d, ignore_errors=True)
        return elapsed

    record: dict = {
        "wallclock": time.strftime("%Y-%m-%dT%H:%M:%S"),
        "sf_dir": sf_dir,
        "java_opts": os.environ.get("SPARK_GRAFT_EXTRA_JAVA_OPTIONS", ""),
        # the EFFECTIVE driver JVM flags (session.py default + env) —
        # the env alone can't tell which default this session ran with
        "effective_java_opts": spark.conf.get(
            "spark.driver.extraJavaOptions", ""
        ),
        "entries": {},
    }

    def probes() -> dict:
        return {"cpu_sec": cpu_probe(), "write_sec": write_probe(), **jit_stats()}

    # Optional JIT warm-up pass (r9 mitigation experiment, VERDICT r8
    # item 1): run the SAME plan shapes at a tiny scale factor first, so
    # the cold measured run below finds the generated classes already
    # compiled.  Whole-stage-codegen classes are plan-shape-specific, not
    # data-sized, so an sf0.001 pass compiles exactly what the sf0.1 run
    # needs.  SYNC_STUDY_WARMUP=<sf_dir> enables it.
    warm_sf = os.environ.get("SYNC_STUDY_WARMUP")
    if warm_sf:
        t0 = time.perf_counter()
        QUERIES["tsdb_sync_idempotent"](spark, warm_sf).write.mode(
            "overwrite"
        ).format("noop").save()
        wdir = tempfile.mkdtemp(prefix="study_warm_sync_")
        try:
            wdb = TSDB(spark, wdir, now=lambda: 4_000_000_000.0)
            wdb.insert(spread(events_as_incoming(spark, warm_sf)))
            wdb.sync()  # compiles all 6 period-aggregation plans
        finally:
            shutil.rmtree(wdir, ignore_errors=True)
        record["warmup"] = {
            "sf_dir": warm_sf,
            "sec": round(time.perf_counter() - t0, 3),
        }

    # entry 1: the driver query itself (3 syncs x 2 period tables).
    # TWO runs: run 1 is cold (fresh-session JIT/codegen/worker costs),
    # run 2 is warm — the bench's min-of-2 protocol reports the warm
    # number, so the cold/warm split IS the r7 builder-vs-judge spread
    # hypothesis under test.
    record["entries"]["tsdb_sync_idempotent"] = {"probes_before": probes()}
    runs = []
    for _ in range(2):
        t0 = time.perf_counter()
        QUERIES["tsdb_sync_idempotent"](spark, sf_dir).write.mode(
            "overwrite"
        ).format("noop").save()
        runs.append(round(time.perf_counter() - t0, 3))
    record["entries"]["tsdb_sync_idempotent"]["sec"] = runs[-1]
    record["entries"]["tsdb_sync_idempotent"]["runs"] = runs
    record["entries"]["tsdb_sync_idempotent"]["probes_after"] = probes()

    # entry 2: baseline_sync_1m (full 6-period sync of >=1M rows)
    inc = spread(events_as_incoming(spark, sf_dir))
    n = inc.count()
    reps = max(1, -(-1_000_000 // max(n, 1)))
    big = (
        inc.crossJoin(F.broadcast(spark.range(reps))).select(
            "path",
            (F.col("timestamp") + F.col("id") * 0.001).alias("timestamp"),
            "value",
        )
        if reps > 1
        else inc
    ).cache()
    big.count()
    record["entries"]["baseline_sync_1m"] = {"probes_before": probes()}
    runs = []
    for _ in range(2):
        sync_dir = tempfile.mkdtemp(prefix="study_sync_")
        try:
            db = TSDB(spark, sync_dir, now=lambda: 4_000_000_000.0)
            db.insert(big)
            t0 = time.perf_counter()
            db.sync()
            runs.append(round(time.perf_counter() - t0, 3))
        finally:
            shutil.rmtree(sync_dir, ignore_errors=True)
    record["entries"]["baseline_sync_1m"]["sec"] = runs[-1]
    record["entries"]["baseline_sync_1m"]["runs"] = runs
    record["entries"]["baseline_sync_1m"]["probes_after"] = probes()
    big.unpersist()

    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SYNC_STUDY.jsonl",
    )
    with open(out, "a") as f:
        f.write(json.dumps(record, sort_keys=True) + "\n")
    print(json.dumps(record, sort_keys=True))


if __name__ == "__main__":
    main()
