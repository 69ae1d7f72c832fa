"""T7 — the outbox event router.

Reference: ``EventRouter`` / ``EventRouterDelegate``
(debezium-connect-plugins/.../transforms/outbox/EventRouter.java:25,
EventRouterDelegate.java:59; config EventRouterConfigDefinition.java:239-342):
rows of an *outbox table* become domain events — routed by ``aggregatetype``,
keyed by ``aggregateid``, value = ``payload``; only INSERTs are routed
(updates/deletes to the outbox are skipped/tombstoned).

Spark shape: filter + projection; the route column feeds ``partitionBy`` at
write time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from debezium_spark.envelope import OP_CREATE


def outbox_event_router(
    env_df: DataFrame,
    *,
    route_by: str = "aggregatetype",
    key_field: str = "aggregateid",
    payload_field: str = "payload",
    topic_prefix: str = "outbox.event",
    expand_json_fields: dict[str, str] | None = None,
) -> DataFrame:
    """Route outbox-table envelopes into domain events.

    ``expand_json_fields`` optionally extracts JSON paths from the payload
    into typed columns (payload expansion, EventRouterConfigDefinition
    ``table.expand.json.payload``).
    """
    after = F.col("after")
    out = env_df.filter(F.col("op") == OP_CREATE).select(
        after.getField(key_field).alias("key"),
        after.getField(payload_field).alias("payload"),
        F.concat(
            F.lit(topic_prefix + "."), after.getField(route_by)
        ).alias("__topic"),
        F.col("source.pos").alias("__pos"),
    )
    for alias, path in (expand_json_fields or {}).items():
        out = out.withColumn(alias, F.get_json_object(F.col("payload"), path))
    return out
