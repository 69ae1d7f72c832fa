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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from debezium_spark.envelope import OP_CREATE, OP_DELETE


def _routed_topic(template: str, route_value: Column) -> Column:
    """``route.topic.replacement`` semantics: the literal template with
    every ``${routedByValue}`` replaced by the routed column's value
    (EventRouterConfigDefinition.java:239-342)."""
    parts = template.split("${routedByValue}")
    pieces: list[Column] = []
    for i, p in enumerate(parts):
        if i:
            pieces.append(route_value)
        if p:
            pieces.append(F.lit(p))
    return F.concat(*pieces) if pieces else F.lit("")


def outbox_event_router(
    env_df: DataFrame,
    *,
    route_by: str = "aggregatetype",
    key_field: str = "aggregateid",
    payload_field: str = "payload",
    topic_prefix: str = "outbox.event",
    route_topic_replacement: str | None = None,
    expand_json_fields: dict[str, str] | None = None,
    additional_fields: tuple[tuple[str, str, str], ...] = (),
    delete_handling: str = "skip",  # skip | tombstone
) -> DataFrame:
    """Route outbox-table envelopes into domain events.

    Config parity with ``EventRouterConfigDefinition.java:239-342``:

    * ``route_topic_replacement`` — topic template with
      ``${routedByValue}`` placeholders (defaults to
      ``{topic_prefix}.{routed value}``).
    * ``expand_json_fields`` — JSON paths extracted from the payload into
      typed columns (``table.expand.json.payload``).
    * ``additional_fields`` — ``(outbox_column, placement, alias)`` triples
      mirroring ``table.fields.additional.placement``: placement
      ``envelope`` lands as a column, ``header`` collects into a
      ``__headers`` map.
    * ``delete_handling`` — outbox DELETEs are skipped (default) or become
      tombstones: routed topic + key preserved, payload and additional
      envelope fields null (EventRouterDelegate.java:59 tombstone branch).
    """
    template = route_topic_replacement or (topic_prefix + ".${routedByValue}")
    is_del = F.col("op") == OP_DELETE
    if delete_handling == "tombstone":
        kept = env_df.filter((F.col("op") == OP_CREATE) | is_del)
        img = F.when(is_del, F.col("before")).otherwise(F.col("after"))
    elif delete_handling == "skip":
        kept = env_df.filter(F.col("op") == OP_CREATE)
        img = F.col("after")
    else:
        raise ValueError(f"unknown delete handling: {delete_handling}")

    null_on_tombstone = (
        (lambda c: F.when(is_del, F.lit(None)).otherwise(c))
        if delete_handling == "tombstone"
        else (lambda c: c)
    )
    cols = [
        img.getField(key_field).alias("key"),
        null_on_tombstone(img.getField(payload_field)).alias("payload"),
        _routed_topic(template, img.getField(route_by)).alias("__topic"),
        F.col("source.pos").alias("__pos"),
    ]
    headers = []
    for src, placement, alias in additional_fields:
        if placement == "envelope":
            cols.append(null_on_tombstone(img.getField(src)).alias(alias))
        elif placement == "header":
            headers.append((alias, img.getField(src).cast("string")))
        else:
            raise ValueError(f"unknown placement: {placement}")
    if headers:
        cols.append(
            F.map_from_arrays(
                F.array(*[F.lit(a) for a, _ in headers]),
                F.array(*[c for _, c in headers]),
            ).alias("__headers")
        )
    out = kept.select(*cols)
    for alias, path in (expand_json_fields or {}).items():
        out = out.withColumn(alias, F.get_json_object(F.col("payload"), path))
    return out
