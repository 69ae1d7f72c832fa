"""T1/T3 — envelope unwrap and changed-field extraction.

Reference: ``ExtractNewRecordState``
(debezium-connect-plugins/.../transforms/ExtractNewRecordState.java:53,104-130)
and its delete-handling strategies
(extractnewstate/DefaultDeleteHandlingStrategy.java); ``ExtractChangedRecordState``
(.../transforms/ExtractChangedRecordState.java:36).

Both are pure projections — a single narrow ``select`` that Catalyst folds
into adjacent stages, no shuffle, full codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from debezium_spark.envelope import OP_DELETE


def _row_fields(df: DataFrame) -> list[str]:
    dt = df.schema["after"].dataType
    assert isinstance(dt, T.StructType)
    return [f.name for f in dt.fields]


def extract_new_record_state(
    df: DataFrame,
    *,
    delete_handling: str = "rewrite",  # rewrite | drop | none
    drop_tombstones: bool = True,
    add_fields: tuple[str, ...] = (),
    drop_fields: tuple[str, ...] = (),
) -> DataFrame:
    """Unwrap the envelope into a flat row (ExtractNewRecordState.java:104-130).

    delete handling:
      * ``rewrite`` — deletes keep the *before* image and gain a
        ``__deleted`` flag (DefaultDeleteHandlingStrategy rewrite mode);
      * ``drop`` — delete events are removed;
      * ``none`` — deletes pass through with null state.

    ``add_fields`` copies envelope metadata into ``__``-prefixed columns
    (``op`` → ``__op``, ``source.pos`` → ``__pos`` … mirroring the SMT's
    ``add.fields`` naming); ``drop_fields`` removes row fields.
    """
    if drop_tombstones:
        df = df.filter(F.col("op").isNotNull())
    if delete_handling == "drop":
        df = df.filter(F.col("op") != OP_DELETE)
        state = F.col("after")
    elif delete_handling == "rewrite":
        state = F.when(F.col("op") == OP_DELETE, F.col("before")).otherwise(
            F.col("after")
        )
    elif delete_handling == "none":
        state = F.col("after")
    else:
        raise ValueError(f"unknown delete_handling: {delete_handling}")

    fields = [f for f in _row_fields(df) if f not in set(drop_fields)]
    cols = [state.getField(f).alias(f) for f in fields]
    if delete_handling == "rewrite":
        cols.append((F.col("op") == OP_DELETE).alias("__deleted"))
    for spec in add_fields:
        alias = "__" + spec.split(".")[-1]
        cols.append(F.col(spec).alias(alias))
    return df.select(*cols)


def extract_changed_record_state(df: DataFrame) -> DataFrame:
    """T3: list the row fields whose value changed between before and after.

    Reference computes changed/unchanged field-name headers
    (ExtractChangedRecordState.java:36). Expressed as a filter over a literal
    field-name array — stays inside codegen, no UDF.
    """
    fields = _row_fields(df)

    def changed(f: str):
        b, a = F.col("before").getField(f), F.col("after").getField(f)
        return ~(b.eqNullSafe(a))

    changed_arr = F.array_compact(
        F.array(*[F.when(changed(f), F.lit(f)) for f in fields])
    )
    unchanged_arr = F.array_compact(
        F.array(*[F.when(~changed(f), F.lit(f)) for f in fields])
    )
    return df.withColumn("__changed", changed_arr).withColumn(
        "__unchanged", unchanged_arr
    )
