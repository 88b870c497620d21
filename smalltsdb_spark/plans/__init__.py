"""Physical-plan inspection helpers (see plans/inspect.py)."""

from smalltsdb_spark.plans.inspect import (  # noqa: F401
    broadcast_hint_count,
    broadcast_join_count,
    exchange_count,
    physical_plan,
    pushed_filters,
    scan_columns,
    wholestage_codegen_count,
)
