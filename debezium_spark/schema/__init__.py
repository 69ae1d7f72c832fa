from debezium_spark.schema.history import (  # noqa: F401
    SchemaRegistry,
    attach_schema_version,
    registry_with_validity,
)
