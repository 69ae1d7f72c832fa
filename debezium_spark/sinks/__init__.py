from debezium_spark.sinks.merge import merge_changes, ParquetMergeSink  # noqa: F401
from debezium_spark.sinks.mor import LogMergeSink  # noqa: F401
