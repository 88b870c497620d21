"""Physical-plan inspection: make "is this the plan we want?" testable.

The reference has no optimizer of its own (SURVEY.md §4); this engine
delegates to Catalyst — so the scale-critical properties are *plan
shapes*, and plan shapes can regress silently.  These helpers parse
``df.explain("formatted")`` output into assertable facts, and
tests/test_plans.py pins the ones that matter at 100 TB:

- filters reach the parquet scan (PushedFilters) — the composite-index
  role of the reference's ``(path, timestamp)`` index;
- scans read only the projected columns (ReadSchema) — column pruning;
- small dimension sides broadcast instead of shuffling;
- aggregations are partial (map-side combine) before the exchange;
- no more exchanges than the query's semantics require.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    """The formatted physical plan as a string (what
    ``df.explain('formatted')`` prints)."""
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def plan_nodes(df: DataFrame) -> list[str]:
    """Physical operator names, one per node (from the formatted plan's
    detail headers, so each node counts exactly once)."""
    return re.findall(r"(?m)^\(\d+\) (\w+)", physical_plan(df))


def exchange_count(df: DataFrame) -> int:
    """Number of shuffle exchanges (broadcast exchanges excluded)."""
    return sum(1 for n in plan_nodes(df) if n == "Exchange")


def broadcast_join_count(df: DataFrame) -> int:
    return sum(
        1
        for n in plan_nodes(df)
        if n in ("BroadcastHashJoin", "BroadcastNestedLoopJoin")
    )


def wholestage_codegen_count(df: DataFrame) -> int:
    return len(re.findall(r"WholeStageCodegen", physical_plan(df)))


def broadcast_hint_count(df: DataFrame) -> int:
    """Number of user-forced broadcast hints in the analyzed logical plan.

    AQE *choosing* a broadcast join at runtime (measured-small side) is
    fine and desirable; a hint-*forced* broadcast of a corpus-derived
    relation is a guaranteed build-side OOM at 100 TB — the distinction
    the dedup plan tests pin."""
    plan = df._jdf.queryExecution().analyzed().toString()
    return len(re.findall(r"(?i)ResolvedHint.*broadcast", plan))


def pushed_filters(df: DataFrame) -> list[str]:
    """All non-empty PushedFilters entries across scans."""
    out = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", physical_plan(df)):
        entry = m.group(1).strip()
        if entry:
            out.append(entry)
    return out


def scan_columns(df: DataFrame) -> list[set[str]]:
    """Column sets each scan reads (from ReadSchema) — column-pruning
    check: a 2-column projection must not scan 10 columns."""
    out = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", physical_plan(df)):
        cols = {
            part.split(":")[0].strip()
            for part in m.group(1).split(",")
            if part.strip()
        }
        out.append(cols)
    return out
