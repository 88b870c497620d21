"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Implementations live in :mod:`smalltsdb_spark.queries`; this module is the
thin contract adapter.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from smalltsdb_spark.queries import ORACLE, QUERIES  # noqa: E402
from smalltsdb_spark import queries_ext  # noqa: E402,F401  (registers extensions)
from smalltsdb_spark import queries_rel  # noqa: E402,F401  (registers rel/window wave)
from smalltsdb_spark.operators.aggregate import aggregate  # noqa: E402
from smalltsdb_spark.queries import events_as_incoming  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the engine's core — the
    reference's multi-stat aggregation at three granularities in one
    DataFrame (events mapped onto the incoming relation)."""
    sf_dir = "/root/testdata/sf0.001"
    inc = events_as_incoming(spark, sf_dir)
    parts = [
        aggregate(inc, seconds).withColumn("period", F.lit(name))
        for name, seconds in [("oneminute", 60), ("onehour", 3600), ("oneday", 86400)]
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# Round in which a query's SEMANTICS last changed (scoring primitive, plan
# output, oracle rewrite).  A query whose most recent driver-green round
# predates its touch round is STALE — its green rows validated old code —
# and jumps to the head of the check order regardless of how many past
# greens it accumulated.  Maintained by hand at each semantic change; the
# default (absent) is 0 = never touched after registration.
TOUCHED_ROUND: dict[str, int] = {
    # r6: half-up score quantization (floor(x*1e6+0.5)/1e6) replaced
    # round() in 7 cosine-family oracles; r7: the Spark-side lsh/ivf
    # kernels moved from F.round to the same floor primitive.  Last
    # driver-green rows for all nine predate r6 (VERDICT r6 item 1).
    "sim_cosine_topk": 7,
    "sim_lsh_ann": 7,
    "sim_ivf_ann": 7,
    "sim_ivf_distributed": 7,
    "sim_ivf_incremental": 7,
    "sim_ivf_pq": 7,
    "sim_pq_adc": 7,
    "sim_recall_eval": 7,
    "dedup_embedding_cosine": 7,
}


def _driver_order(names: list[str]) -> list[str]:
    """Order queries stale-first, then least-driver-verified.

    The driver's correctness run checks a budget-capped PREFIX of this
    dict (50/round — exactly the first N in insertion order), so
    ordering is coverage policy: a query green in many past rounds can
    afford to rotate out; a never-checked, hash-missed, or
    touched-since-last-green one cannot.  Green history (count AND most
    recent green round) is read from the committed
    ``CORRECTNESS_r*.json`` files, so this stays self-maintaining as
    rounds accumulate; staleness comes from :data:`TOUCHED_ROUND`.
    Ties break newest-registered first (new operators get their first
    driver row immediately).  Rotated-out queries keep full local
    coverage via tests/test_oracle_parity.py.
    """
    import glob
    import json
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    greens = {n: 0 for n in names}
    last_green = {n: 0 for n in names}
    for path in glob.glob(os.path.join(here, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        rnd = int(m.group(1)) if m else 0
        try:
            with open(path) as f:
                rows = json.load(f)
        except (OSError, ValueError):
            continue
        for n, row in rows.items():
            if n in greens and isinstance(row, dict) and row.get("hash_match"):
                greens[n] += 1
                last_green[n] = max(last_green[n], rnd)
    pos = {n: i for i, n in enumerate(names)}
    return sorted(
        names,
        key=lambda n: (
            # stale (green rows predate the last semantic touch) → first
            last_green[n] >= TOUCHED_ROUND.get(n, 0),
            greens[n],
            -pos[n],
        ),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ extensions),
    least-driver-verified first (see :func:`_driver_order`)."""
    return {n: QUERIES[n] for n in _driver_order(list(QUERIES))}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalents, keyed like ``queries()``.

    Lazy entries (callables) embed data-derived constants — e.g. the IVF
    oracle trains the same deterministic k-means centroids the Spark query
    trains and renders them as literals; they read the sf dir from
    ``SMALLTSDB_ORACLE_SF_DIR`` (default: the driver's sf0.01).
    """
    return {k: (v() if callable(v) else v) for k, v in ORACLE.items()}
