from debezium_spark.sources.snapshot import snapshot_table, chunked_snapshot_bounds  # noqa: F401
from debezium_spark.sources.changefeed import accounts_changefeed, accounts_snapshot  # noqa: F401
