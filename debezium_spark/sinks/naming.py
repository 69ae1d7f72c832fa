"""K7 — collection/column naming strategies.

Reference: ``DefaultCollectionNamingStrategy``
(debezium-sink/src/main/java/io/debezium/sink/naming/
DefaultCollectionNamingStrategy.java) — topic → table name with
``collection.name.format`` templating (``${topic}``, ``${source}``), dot
replacement, and case styles; ``FieldNameAdjuster``-style column
sanitization for targets that reject exotic characters.

Pure Column expressions — usable both driver-side (config strings) and in
routed writes (`partitionBy` on the computed name).
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F


def collection_name(
    topic: Column,
    *,
    fmt: str = "${topic}",
    replace_dots: bool = True,
    style: str = "none",  # none | lower | upper | snake
) -> Column:
    """Topic name → sink collection (table) name."""
    out = F.lit(fmt)
    out = F.replace(out, F.lit("${topic}"), topic)
    if replace_dots:
        out = F.replace(out, F.lit("."), F.lit("_"))
    if style == "lower":
        out = F.lower(out)
    elif style == "upper":
        out = F.upper(out)
    elif style == "snake":
        # camelCase / spaces → snake_case
        out = F.lower(F.regexp_replace(out, r"([a-z0-9])([A-Z])", r"$1_$2"))
        out = F.regexp_replace(out, r"\s+", "_")
    elif style != "none":
        raise ValueError(f"unknown style: {style}")
    return out


def sanitize_field_name(name: str, replacement: str = "_") -> str:
    """Driver-side column sanitization (SchemaNameAdjuster.java:60 pattern):
    first char [A-Za-z_], rest [A-Za-z0-9_]."""
    out = re.sub(r"[^A-Za-z0-9_]", replacement, name)
    if not re.match(r"[A-Za-z_]", out[:1] or "_"):
        out = "_" + out
    return out
