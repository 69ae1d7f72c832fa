from debezium_spark.operators.unwrap import (  # noqa: F401
    extract_new_record_state,
    extract_changed_record_state,
)
from debezium_spark.operators.reduce import reduce_last_per_key, apply_truncates  # noqa: F401
from debezium_spark.operators.filter import filter_records, skipped_operations  # noqa: F401
from debezium_spark.operators.route import (  # noqa: F401
    content_based_router,
    by_logical_table_router,
    partition_routing,
)
from debezium_spark.operators.mask import mask_string, hash_mask, truncate_column  # noqa: F401
from debezium_spark.operators.timezone import convert_timezone_fields  # noqa: F401
from debezium_spark.operators.outbox import outbox_event_router  # noqa: F401
from debezium_spark.operators.misc import header_to_value, enforce_record_size  # noqa: F401
from debezium_spark.operators.incremental import incremental_snapshot_chunk  # noqa: F401
from debezium_spark.operators.transaction import enrich_transaction_metadata  # noqa: F401
