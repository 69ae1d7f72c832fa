"""T2 — ExtractNewDocumentState: document-store (MongoDB-style) unwrap.

Reference: ``ExtractNewDocumentState`` (debezium-connector-mongodb/src/main/
java/io/debezium/connector/mongodb/transforms/ExtractNewDocumentState.java:55).
Mongo change events carry the document as a JSON *string* (``after`` is BSON
serialized to extended JSON), so unwrap = parse + flatten, unlike the
relational T1 where ``after`` is already a struct.

Spark shape: ``from_json`` with an explicit schema (never runtime inference
— at 100 TB schema inference is a full extra pass), then ``select(doc.*)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def extract_new_document_state(
    df: DataFrame,
    doc_schema: T.StructType,
    *,
    doc_col: str = "after_json",
    keep: tuple[str, ...] = (),
    drop_deletes: bool = True,
) -> DataFrame:
    """Parse the JSON document column and flatten it to top-level fields.

    ``keep`` names passthrough columns (position, op, …) retained next to
    the flattened document fields.
    """
    out = df
    if drop_deletes:
        out = out.filter(F.col(doc_col).isNotNull())
    parsed = out.withColumn("__doc", F.from_json(F.col(doc_col), doc_schema))
    return parsed.select(*keep, "__doc.*")
