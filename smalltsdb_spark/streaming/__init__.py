"""Structured Streaming flavor of the engine (reference daemon + sync as
always-on queries; SURVEY.md §2.8)."""

from smalltsdb_spark.streaming.pipeline import (  # noqa: F401
    read_spool_stream,
    start_histogram_rollup,
    start_ingest,
    start_rollup,
    start_rollup_partials,
    streaming_aggregate,
    streaming_value_histogram,
)
