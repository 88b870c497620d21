#!/usr/bin/env python
"""Write ``explain("formatted")`` for registered queries to files.

Usage::

    python scripts/explain_query.py OUT_DIR [SUFFIX] QUERY [QUERY ...]

Builds each query's DataFrame against ``$SPARK_GRAFT_SF_DIR`` (default
sf0.1 — plan SHAPE is scale-independent, but using the bench scale keeps
PushedFilters/ReadSchema identical to what the bench runs) and writes
``OUT_DIR/<name>_<SUFFIX>.txt``.  Used by the optimization rounds to
commit before/after plans (plans/r14/...).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from smalltsdb_spark.queries import QUERIES  # noqa: E402
from smalltsdb_spark import queries_ext  # noqa: E402,F401
from smalltsdb_spark import queries_rel  # noqa: E402,F401
from smalltsdb_spark.session import get_spark  # noqa: E402


def main() -> None:
    out_dir, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(
        app_name="explain",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
