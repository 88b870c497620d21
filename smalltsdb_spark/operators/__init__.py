from pyspark.sql import DataFrame

from smalltsdb_spark.operators.aggregate import aggregate, bucket

__all__ = ["aggregate", "bucket", "spread"]


def spread(df: DataFrame) -> DataFrame:
    """Ensure per-row-expensive work downstream (tokenize/explode/GEMM)
    has cluster-wide parallelism.

    Small fixture tables arrive as ONE parquet file → one partition → any
    amount of per-row work runs on one core (measured: the sf0.1 bigram
    explode is 2.8 s single-partition vs 0.5 s spread).  Repartition only
    when the input has fewer partitions than the cluster — a corpus that
    is already well-partitioned (the 100 TB case) passes through untouched,
    so this never adds a shuffle at scale; when it does fire it shuffles
    only the input rows to unlock N× the downstream work.
    """
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    # fast path: >= parallelism input files proves >= parallelism scan
    # partitions without the DataFrame->RDD plan conversion that
    # getNumPartitions() costs on every operator call (file listing is
    # already cached on the DataFrame's FileIndex, so inputFiles is a
    # driver-local lookup) — the well-partitioned 100 TB corpus never
    # leaves this branch
    if len(df.inputFiles()) >= parallelism:
        return df
    # few (or unknown) files can still split into many partitions if they
    # are large; only this small/opaque-input path pays the RDD conversion
    if df.rdd.getNumPartitions() >= parallelism:
        return df
    return df.repartition(parallelism)
