from debezium_spark.formats.cloudevents import (  # noqa: F401
    from_cloudevents_json,
    to_cloudevents,
    to_cloudevents_json,
)
