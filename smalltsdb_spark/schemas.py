"""Fixed schemas of the engine's two relations.

Reference DDL: ``incoming`` (tsdb.py:155-162) and the per-period aggregate
tables (tsdb.py:165-180).  All numeric columns are DoubleType — the
reference stores everything as SQLite REAL, including the count ``n``
(tsdb.py:171 stores count as REAL; we keep that for bit parity).

Timestamps are UTC epoch seconds as DoubleType so fractional sub-second
inputs survive (reference accepts fractional timestamps, e.g.
rundev.py:40).
"""

from __future__ import annotations

from pyspark.sql import types as T

# Raw datapoint stream (reference tsdb.py:155-162).
INCOMING_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType(), False),
        T.StructField("timestamp", T.DoubleType(), False),
        T.StructField("value", T.DoubleType(), False),
    ]
)

INCOMING_COLUMNS = [f.name for f in INCOMING_SCHEMA.fields]

# Per-period aggregate relation (reference tsdb.py:165-180).
AGG_COLUMNS = ["path", "timestamp", "n", "min", "max", "avg", "sum", "p50", "p90", "p99"]

AGG_SCHEMA = T.StructType(
    [T.StructField("path", T.StringType(), False)]
    + [T.StructField(c, T.DoubleType(), True) for c in AGG_COLUMNS[1:]]
)

# Persisted fine value-histogram relation (r11 — the mergeable quantile
# carrier behind tsdb.get_metric_bounds_df): one row per (path, fine
# bucket, value bin), counts re-aggregate losslessly through the rollup
# cascade.  Same shape operators/aggregate.value_histogram emits.
HIST_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType(), False),
        T.StructField("timestamp", T.DoubleType(), True),
        T.StructField("bin", T.LongType(), True),
        T.StructField("n", T.LongType(), True),
    ]
)

# Partition column used by the parquet storage layer (not part of the
# logical schema): pday = floor(timestamp / grain_seconds).  Day-granular
# partitioning (the default grain) keeps partition counts sane at 100 TB
# while giving partition pruning on time-range predicates and
# partition-drop retention; hour grain (PARTITION_GRAINS['hour']) shrinks
# the upsert rewrite unit 24× for hot high-rate tables at the cost of 24×
# the partition count — a per-TSDB choice, fixed at table creation (the
# storage layer pins it with a root-level marker file).
PARTITION_COLUMN = "pday"
SECONDS_PER_DAY = 86400
PARTITION_GRAINS = {"day": 86400, "hour": 3600}
