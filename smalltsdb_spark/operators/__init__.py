from smalltsdb_spark.operators.aggregate import aggregate, bucket

__all__ = ["aggregate", "bucket"]
