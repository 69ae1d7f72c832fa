"""T8/T11/T15 — header moves, record-size guards, vector-to-json.

Reference: ``HeaderToValue`` (debezium-connect-plugins/.../transforms/
HeaderToValue.java:38), ``EnforceRecordSize`` (.../transforms/
EnforceRecordSize.java:48), ``VectorToJsonConverter``
(.../transforms/VectorToJsonConverter.java:48).

In the DataFrame model headers are just columns (a map column when dynamic),
so these are projections/filters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def header_to_value(
    df: DataFrame,
    headers: list[str],
    *,
    headers_col: str = "headers",
    operation: str = "copy",  # copy | move
    prefix: str = "",
) -> DataFrame:
    """T8: copy/move header entries into value fields (HeaderToValue.java:38)."""
    out = df
    for h in headers:
        out = out.withColumn(prefix + h, F.col(headers_col).getItem(h))
    if operation == "move":
        remaining = F.map_filter(
            F.col(headers_col), lambda k, _v: ~k.isin(headers)
        )
        out = out.withColumn(headers_col, remaining)
    return out


def enforce_record_size(
    df: DataFrame,
    max_bytes: int,
    *,
    mode: str = "skip",  # skip | fail
    size_col: str | None = None,
) -> DataFrame:
    """T11: drop (or fail on) records over a byte budget (EnforceRecordSize.java:48).

    Size is the serialized JSON length of the full row unless ``size_col``
    names a precomputed length column.
    """
    size = (
        F.col(size_col)
        if size_col
        else F.octet_length(F.to_json(F.struct(*df.columns)))
    )
    if mode == "skip":
        return df.filter(size <= max_bytes)
    flagged = df.withColumn("__oversize", size > max_bytes)
    return flagged  # caller checks __oversize and raises (fail mode)


def vector_to_json(df: DataFrame, col: str, out_col: str | None = None) -> DataFrame:
    """T15: vector logical type → JSON string (VectorToJsonConverter.java:48).

    Dense Double/FloatVector arrays serialize via ``to_json``. A
    SparseDoubleVector struct (``dimensions``/``indices``/``values``, the
    columnar form of the reference's dimensions+map struct) renders the
    converter's exact sparse shape —
    ``{ "dimensions": D, "vector": { "i": v, ... } }`` with entries in
    ascending index order, matching the reference's TreeMap iteration
    (VectorToJsonConverter.java:151-165)."""
    from pyspark.sql import types as T

    dt = df.schema[col].dataType
    if isinstance(dt, T.StructType) and {f.name for f in dt.fields} >= {
        "dimensions",
        "indices",
        "values",
    }:
        return df.withColumn(out_col or col, sparse_vector_json(F.col(col)))
    return df.withColumn(out_col or col, F.to_json(F.col(col)))


def sparse_vector_json(sv: Column) -> Column:
    """The reference's sparse-vector JSON string for one struct column —
    NULL in, NULL out (the converter's optional-field contract)."""
    entries = F.zip_with(
        sv["indices"],
        sv["values"],
        lambda i, v: F.concat(
            F.lit('"'), i.cast("string"), F.lit('": '), v.cast("string")
        ),
    )
    return F.when(
        sv.isNotNull(),
        F.concat(
            F.lit('{ "dimensions": '),
            sv["dimensions"].cast("string"),
            F.lit(', "vector": { '),
            F.array_join(entries, ", "),
            F.lit(" } }"),
        ),
    )
