"""T5/T6/T10 — routing operators.

Reference: ``ContentBasedRouter`` (debezium-scripting/.../transforms/
ContentBasedRouter.java:23-31), ``ByLogicalTableRouter``
(.../transforms/ByLogicalTableRouter.java:26, ToLogicalTopicRouter.java:57-88),
``PartitionRouting`` (.../transforms/partitions/PartitionRouting.java:46,61,243-245).

Routing is a computed column; the physical routing happens at write time via
``partitionBy(__topic)`` / ``repartition(n, cols)`` so one shuffle realizes
the whole route.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def content_based_router(
    df: DataFrame, topic_expr: str, output_col: str = "__topic"
) -> DataFrame:
    """T5: destination computed from record content (ContentBasedRouter.java:23-31)."""
    return df.withColumn(output_col, F.expr(topic_expr))


def by_logical_table_router(
    df: DataFrame,
    topic_regex: str,
    topic_replacement: str,
    *,
    table_col: str = "source.table",
    key_augment: bool = True,
    output_col: str = "__topic",
) -> DataFrame:
    """T6: merge sharded physical tables into one logical stream.

    Regex-rewrites the physical table name (ByLogicalTableRouter.java:26) and,
    because merged shards can collide on PK, augments the key with the
    physical table id (``__dbz__physicalTableIdentifier``,
    ToLogicalTopicRouter.java:57-88).
    """
    out = df.withColumn(
        output_col, F.regexp_replace(F.col(table_col), topic_regex, topic_replacement)
    )
    if key_augment:
        out = out.withColumn(
            "__dbz__physicalTableIdentifier", F.col(table_col)
        )
    return out


def portable_bucket(col: Column, num_partitions: int) -> Column:
    """Deterministic, engine-portable hash bucket.

    The reference offers java/murmur hash options
    (PartitionRouting.java:243-245); Spark's native ``F.hash`` is murmur3 and
    is what production writes use (see partition_routing). For
    oracle-checkable routing we use an md5-derived bucket both Spark and
    DuckDB compute identically: first 12 hex chars → int → mod n.
    """
    h = F.conv(F.substring(F.md5(col.cast("string")), 1, 12), 16, 10).cast("long")
    return F.pmod(h, F.lit(num_partitions))


def partition_routing(
    df: DataFrame,
    payload_cols: list[str],
    num_partitions: int,
    *,
    portable: bool = False,
    output_col: str = "__partition",
) -> DataFrame:
    """T10: partition = hash(payload fields) % n (PartitionRouting.java:61).

    Default uses Spark's murmur3 ``F.hash`` (what a Kafka-compatible sink
    would use); ``portable=True`` switches to the md5 bucket for
    cross-engine checks.
    """
    if portable:
        key = F.concat_ws("|", *[F.col(c).cast("string") for c in payload_cols])
        part = portable_bucket(key, num_partitions)
    else:
        part = F.pmod(F.abs(F.hash(*[F.col(c) for c in payload_cols])), F.lit(num_partitions))
    return df.withColumn(output_col, part.cast("int"))
