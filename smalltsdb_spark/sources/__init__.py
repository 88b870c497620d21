"""Input connectors: the Graphite plaintext wire protocol and its
ingest daemon (reference daemon.py), plus a PySpark Python DataSource
exposing spooled line files as a first-class readable format."""

from smalltsdb_spark.sources.graphite import (  # noqa: F401
    format_lines_df,
    parse_line,
    parse_lines_df,
)
