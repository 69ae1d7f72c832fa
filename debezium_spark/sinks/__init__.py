from debezium_spark.sinks.merge import merge_changes, ParquetMergeSink  # noqa: F401
