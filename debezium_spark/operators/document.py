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


def mongo_update_description(events: DataFrame) -> DataFrame:
    """S11 — Mongo change-stream ``updateDescription`` semantics: each event
    carries partial field updates (``updatedFields``) and removals
    (``removedFields``); downstream state is the per-key fold of those
    patches in stream order.

    Reference: the Mongo connector's change-stream emitter publishes update
    events as updateDescription patches rather than full post-images
    (debezium-connector-mongodb ChangeStreamDefaultRecordEmitter /
    ExtractNewDocumentState's updateDescription handling), and consumers
    reconstruct state per key.

    Feed mapping (deterministic, oracle-reproducible):
      signup   → full document  {status, value, k}
      purchase → $set {value};  click → $set {k};  view → $set {status}
      error    → $unset {value}
    ``value`` is canonicalized to integer cents via floor(value*100) — floor
    is the one float→decimal bridge both engines compute identically.

    Scale shape: ONE scan of the feed (the patch array is a when/otherwise
    expression, exploded), one shuffle on (key, field) for the last-wins
    fold (max_by on the stream position), one on key for document assembly.
    """
    et = F.col("event_type")

    def entry(f: str, v, rm: bool = False):
        return F.struct(
            F.lit(f).alias("f"),
            v.cast("string").alias("v"),
            F.lit(rm).alias("rm"),
        )

    status_e = entry("status", et)
    value_e = entry("value", F.floor(F.col("value") * 100).cast("long"))
    k_e = entry("k", F.get_json_object("props", "$.k"))
    rm_value = entry("value", F.lit(None).cast("string"), True)
    arr = (
        F.when(et == "signup", F.array(status_e, value_e, k_e))
        .when(et == "purchase", F.array(value_e))
        .when(et == "click", F.array(k_e))
        .when(et == "view", F.array(status_e))
        .when(et == "error", F.array(rm_value))
        .otherwise(F.array().cast("array<struct<f:string,v:string,rm:boolean>>"))
    )
    upd = events.select(
        "user_id", "event_id", F.explode(arr).alias("u")
    ).select("user_id", "event_id", "u.f", "u.v", "u.rm")
    last = upd.groupBy("user_id", "f").agg(
        F.max_by("v", "event_id").alias("v"),
        F.max_by("rm", "event_id").alias("rm"),
    )
    return (
        # A field whose last $set value is NULL is dropped like a removal —
        # concat_ws would otherwise emit a bare field name, which no JSON
        # document rendering has (and the SQL twin's `f || '=' || v` agrees:
        # NULL concatenation removes the field).
        last.filter(~F.col("rm") & F.col("v").isNotNull())
        .groupBy("user_id")
        .agg(
            F.array_join(
                F.sort_array(F.collect_list(F.concat_ws("=", "f", "v"))), ","
            ).alias("doc")
        )
    )


def mongo_truncated_arrays(events: DataFrame) -> DataFrame:
    """S11b — change-stream ``updateDescription.truncatedArrays``: an
    update that shrinks an array via $slice/$pop arrives as
    ``{field, newSize}`` rather than a $set of the whole array, and the
    consumer must apply it to its current state. The per-key fold is
    exact without replaying event-by-event because truncation is
    monotone: sequential truncations compose to the MINIMUM newSize, and
    a later $set resets the state — so the final array is the last $set
    value sliced to ``min(newSize)`` over the truncations that came
    after it (reference: the Mongo connector's updateDescription
    envelope carries truncatedArrays beside updatedFields/removedFields,
    and ExtractNewDocumentState's array handling applies them).

    Feed mapping (deterministic, oracle-reproducible): ``signup`` $sets
    the ``tags`` array from the event id; ``error`` truncates it to
    ``event_id % 3 + 1``.

    Scale shape: one scan, one user-keyed agg for the last $set, one
    (join + agg) for the post-set minimum truncation, one final
    broadcast-or-hash join — no window over the full stream, no
    per-event iteration."""
    et = F.col("event_type")
    e = F.col("event_id")

    def tag(mod: int):
        return F.concat(F.lit("t"), (e % mod).cast("string"))

    sets = events.filter(et == "signup").select(
        "user_id",
        "event_id",
        F.array(tag(7), tag(5), tag(3), tag(2)).alias("arr"),
    )
    last_set = sets.groupBy("user_id").agg(
        F.max_by("arr", "event_id").alias("arr"),
        F.max("event_id").alias("set_pos"),
    )
    truncs = events.filter(et == "error").select(
        "user_id", "event_id", (e % 3 + 1).cast("int").alias("new_size")
    )
    post = (
        truncs.join(last_set.select("user_id", "set_pos"), "user_id")
        .filter(F.col("event_id") > F.col("set_pos"))
        .groupBy("user_id")
        .agg(F.min("new_size").alias("n"))
    )
    n_eff = F.least(
        F.coalesce(F.col("n"), F.size("arr")), F.size("arr")
    )
    return last_set.join(post, "user_id", "left").select(
        "user_id",
        F.array_join(F.slice(F.col("arr"), 1, n_eff), ",").alias("tags"),
        n_eff.cast("int").alias("n_tags"),
    )
