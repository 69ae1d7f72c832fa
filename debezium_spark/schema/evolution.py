"""Type-widening policy for schema evolution (K6's type half).

The reference's JDBC sink evolves target column types where the dialect
allows a lossless widening (int → bigint, float → double, decimal scale
growth) and fails the record otherwise
(``debezium-connector-jdbc``'s dialect ``alterTable`` paths). Spark-side
the same decision runs BEFORE the write: normalize the incoming batch
against the target schema, widening either side's view, so parquet
footers never mix physical types for one column (a mergeSchema read
error at best, silent corruption at worst).

Kept standalone from the MERGE sink: call
``widen_types(batch, target_schema)`` in the pre-write step of a custom
pipeline, or use the matrix to validate a DDL ``MODIFY`` before applying
it (`schema/ddl.py`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# column type → the set of strictly wider types it may become, transitively
# closed, every step lossless. (tinyint→…→decimal, float→double; date→
# timestamp is NOT here — midnight-localization is a semantic change the
# reference also refuses.)
_WIDENINGS: dict[str, tuple[str, ...]] = {
    "byte": ("short", "integer", "long", "decimal"),
    "short": ("integer", "long", "decimal"),
    "integer": ("long", "decimal"),
    "long": ("decimal",),
    "float": ("double",),
}


def _base(dt: T.DataType) -> str:
    return dt.typeName() if not isinstance(dt, T.DecimalType) else "decimal"


def can_widen(src: T.DataType, dst: T.DataType) -> bool:
    """True when every ``src`` value fits ``dst`` losslessly."""
    if src == dst:
        return True
    sb, db = _base(src), _base(dst)
    if isinstance(src, T.DecimalType) and isinstance(dst, T.DecimalType):
        # scale may grow; integer digits must not shrink
        return (
            dst.scale >= src.scale
            and dst.precision - dst.scale >= src.precision - src.scale
        )
    if sb in _WIDENINGS and db in _WIDENINGS[sb]:
        if isinstance(dst, T.DecimalType):
            needed = {"byte": 3, "short": 5, "integer": 10, "long": 20}[sb]
            return dst.scale >= 0 and dst.precision - dst.scale >= needed
        return True
    return False


def widened(a: T.DataType, b: T.DataType) -> T.DataType:
    """The narrower-to-wider resolution of two versions of one column, or
    ValueError when neither direction is lossless (the reference's
    fail-the-record path — surface it, never coerce silently)."""
    if can_widen(a, b):
        return b
    if can_widen(b, a):
        return a
    raise ValueError(f"incompatible column evolution: {a} vs {b}")


def widen_types(batch: DataFrame, target_schema: T.StructType) -> DataFrame:
    """Normalize a change batch against the target table's schema:
    columns whose types differ are cast to the WIDENED type (so the
    written files never mix physical types); incompatible changes raise.
    Columns new to the batch pass through (K6's add-column path handles
    them); target-only columns are the reader's null-fill problem, not
    the writer's."""
    by_name = {f.name: f.dataType for f in target_schema.fields}
    out = batch
    for f in batch.schema.fields:
        tgt = by_name.get(f.name)
        if tgt is None or f.dataType == tgt:
            continue
        wide = widened(f.dataType, tgt)
        if wide != f.dataType:
            out = out.withColumn(f.name, F.col(f.name).cast(wide))
    return out
