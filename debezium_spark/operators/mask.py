"""T17 — column masking / pseudonymization / truncation.

Reference: ``MaskStrings`` (debezium-connector-common/.../relational/mapping/
MaskStrings.java:34 — fixed mask or salted SHA-256 hash) and
``TruncateColumn`` (.../mapping/TruncateColumn.java:22,47).

All native column expressions (sha2/substring) — codegen'd, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def mask_string(df: DataFrame, col: str, mask: str = "***") -> DataFrame:
    """Replace every non-null value with a constant mask (MaskStrings.java:34)."""
    out = F.when(F.col(col).isNotNull(), F.lit(mask))
    return df.withColumn(col, out)


def hash_mask(df: DataFrame, col: str, salt: str) -> DataFrame:
    """Salted SHA-256 pseudonymization (MaskStrings HashValueConverter)."""
    return df.withColumn(col, hash_mask_col(F.col(col), salt))


def hash_mask_col(col: Column, salt: str) -> Column:
    return F.when(col.isNotNull(), F.sha2(F.concat(F.lit(salt), col.cast("string")), 256))


def truncate_column(df: DataFrame, col: str, length: int) -> DataFrame:
    """Truncate a string column to ``length`` chars (TruncateColumn.java:22,47)."""
    return df.withColumn(col, F.substring(F.col(col), 1, length))
