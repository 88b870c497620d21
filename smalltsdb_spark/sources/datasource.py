"""``graphite`` — a PySpark Python DataSource for Graphite spool files.

Covers the reference's UDP/TCP sources (S2/S3, daemon.py:50-70) Spark-side:
the daemon lands wire lines in a spool directory (sources/daemon.py), and
this data source exposes that directory as a first-class format in both
batch and streaming:

    spark.dataSource.register(GraphiteDataSource)
    spark.read.format("graphite").load(spool_dir)          # batch
    spark.readStream.format("graphite").load(spool_dir)    # stream

Rows come out already parsed into the incoming schema
``(path string, timestamp double, value double)``; malformed lines are
dropped (graphite.py semantics).

Scale shape: batch reads get one InputPartition per spool file (parallel
across executors); the streaming reader is a ``SimpleDataSourceStreamReader``
whose offset is the lexicographically-largest consumed filename — spool
names are epoch-prefixed (daemon.SpoolSink) so arrival order and sort order
agree.  Spool files are micro-batch sized (one per daemon flush), so
driver-side listing is cheap; at very high fan-in point the daemon fleet at
partitioned subdirectories and run one stream per partition.
"""

from __future__ import annotations

import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

from smalltsdb_spark.sources.graphite import parse_line

_SUFFIX = ".graphite"


def _spool_files(spool_dir: str, after: str = "") -> list[str]:
    if not os.path.isdir(spool_dir):
        return []
    return sorted(
        n for n in os.listdir(spool_dir) if n.endswith(_SUFFIX) and n > after
    )


def _parse_file(path: str):
    with open(path, "r") as f:
        for line in f:
            if not line.strip():
                continue
            try:
                yield parse_line(line)
            except ValueError:
                continue


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class _GraphiteBatchReader(DataSourceReader):
    def __init__(self, spool_dir: str):
        self.spool_dir = spool_dir

    def partitions(self):
        return [
            _FilePartition(os.path.join(self.spool_dir, n))
            for n in _spool_files(self.spool_dir)
        ] or [_FilePartition("")]

    def read(self, partition: _FilePartition):
        if partition.path:
            yield from _parse_file(partition.path)


class _GraphiteStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, spool_dir: str):
        self.spool_dir = spool_dir

    def initialOffset(self) -> dict:
        return {"last": ""}

    def read(self, start: dict):
        names = _spool_files(self.spool_dir, after=start["last"])
        end = {"last": names[-1] if names else start["last"]}
        return self._rows(names), end

    def readBetweenOffsets(self, start: dict, end: dict):
        names = [
            n
            for n in _spool_files(self.spool_dir, after=start["last"])
            if n <= end["last"]
        ]
        return self._rows(names)

    def _rows(self, names):
        # a concrete list, not a generator: the runtime pickles these rows
        # for prefetch-cache replay between read() and commit()
        rows = []
        for name in names:
            rows.extend(_parse_file(os.path.join(self.spool_dir, name)))
        return rows


class GraphiteDataSource(DataSource):
    """Spool-directory reader for the Graphite wire format."""

    @classmethod
    def name(cls) -> str:
        return "graphite"

    def schema(self) -> str:
        return "path string, timestamp double, value double"

    def _spool_dir(self) -> str:
        spool = self.options.get("path")
        if not spool:
            raise ValueError("graphite source requires .load(<spool_dir>)")
        return spool

    def reader(self, schema) -> _GraphiteBatchReader:
        return _GraphiteBatchReader(self._spool_dir())

    def simpleStreamReader(self, schema) -> _GraphiteStreamReader:
        return _GraphiteStreamReader(self._spool_dir())
