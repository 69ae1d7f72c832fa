"""T9 — timezone conversion of timestamp fields.

Reference: ``TimezoneConverter`` (debezium-connect-plugins/.../transforms/
TimezoneConverter.java:57,69-96) converts timestamp fields to a target zone
with per-field include/exclude rules.

Native ``to_utc_timestamp``/``from_utc_timestamp`` — codegen'd.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def convert_timezone_fields(
    df: DataFrame,
    target_tz: str,
    *,
    include: Iterable[str] | None = None,
    exclude: Iterable[str] = (),
    direction: str = "from_utc",  # from_utc | to_utc
) -> DataFrame:
    """Convert timestamp columns between UTC and ``target_tz``.

    ``include``/``exclude`` mirror the SMT's field rules
    (TimezoneConverter.java:69-96). ``from_utc`` reads stored naive-UTC
    values as wall-clock in the target zone; ``to_utc`` is the inverse.
    """
    excl = set(exclude)
    ts_cols = [
        f.name
        for f in df.schema.fields
        if f.dataType.typeName().startswith("timestamp") and f.name not in excl
    ]
    if include is not None:
        keep = set(include)
        ts_cols = [c for c in ts_cols if c in keep]
    fn = F.from_utc_timestamp if direction == "from_utc" else F.to_utc_timestamp
    out = df
    for c in ts_cols:
        out = out.withColumn(c, fn(F.col(c), target_tz))
    return out
