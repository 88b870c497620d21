"""smalltsdb_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of lemon24/smalltsdb, re-expressed Spark-first.

The reference (https://github.com/lemon24/smalltsdb) is a single-node
SQLite-backed time-series database.  This package is NOT a port: the logical
data model and query semantics are the same (see ``/root/reference`` and
SURVEY.md), but every operator is declared with the DataFrame/SQL API so
Catalyst + Tungsten pick the physical strategy, and the storage layer is
partitioned Parquet designed for a multi-executor cluster.

Public surface (mirrors reference ``src/smalltsdb/tsdb.py``):

- :class:`smalltsdb_spark.tsdb.ViewTSDB` — aggregates are lazy DataFrames
  recomputed from raw data on every read (reference tsdb.py:201-231).
- :class:`smalltsdb_spark.tsdb.TablesTSDB` — aggregates materialized as
  partitioned parquet, maintained incrementally by ``sync()``
  (reference tsdb.py:271-420).
- :class:`smalltsdb_spark.tsdb.TwoDatabasesTSDB` — incoming stored under a
  separate location for writer/reader isolation (reference tsdb.py:423-454).
"""

from smalltsdb_spark.config import PERIODS, STATS, DEFAULT_TAIL
from smalltsdb_spark.tsdb import TSDB, ViewTSDB, TablesTSDB, TwoDatabasesTSDB

__all__ = [
    "PERIODS",
    "STATS",
    "DEFAULT_TAIL",
    "TSDB",
    "ViewTSDB",
    "TablesTSDB",
    "TwoDatabasesTSDB",
]

__version__ = "0.5.0"
