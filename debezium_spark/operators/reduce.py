"""K4 — per-key write reduction (last event wins) and truncate collapse.

Reference: ``ReducedRecordBuffer`` (debezium-connector-jdbc/.../ReducedRecordBuffer.java:27)
and ``DeduplicatingBuffer`` (debezium-sink/.../batch/DeduplicatingBuffer.java:26,39-52):
before flushing a batch to the sink, keep only the latest event per key, and
let a TRUNCATE clear everything buffered before it.

This reduction is *mandatory* ahead of a MERGE (duplicate match keys are
illegal), not just an optimization. Spark shape: one window over
``partition by key order by source.pos desc`` — a single shuffle on the key,
which is the same shuffle the MERGE join needs, so AQE reuses the exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from debezium_spark.envelope import OP_TRUNCATE


def apply_truncates(env_df: DataFrame) -> DataFrame:
    """Drop change events superseded by a later TRUNCATE on the same table.

    DeduplicatingBuffer.java:39-52 — a truncate clears the pending buffer for
    its collection. Batch equivalent: events with pos < the table's max
    truncate pos are dead; the truncate row itself survives so the sink can
    clear the target.
    """
    trunc = (
        env_df.filter(F.col("op") == OP_TRUNCATE)
        .groupBy(F.col("source.table").alias("__t"))
        .agg(F.max("source.pos").alias("__trunc_pos"))
    )
    out = env_df.join(
        F.broadcast(trunc), env_df["source.table"] == F.col("__t"), "left"
    )
    keep = (
        F.col("__trunc_pos").isNull()
        | (F.col("source.pos") >= F.col("__trunc_pos"))
        | (F.col("op") == OP_TRUNCATE)
    )
    return out.filter(keep).drop("__t", "__trunc_pos")


def reduce_last_per_key(
    env_df: DataFrame,
    key_cols: tuple[str, ...] = ("key",),
    order_col: str = "source.pos",
    tiebreak_cols: tuple[str, ...] = ("ts_ns", "op"),
) -> DataFrame:
    """Keep only the latest event per key (ReducedRecordBuffer.java:27).

    Ordering is by the replayable stream position, never by batch row order
    (SURVEY §7.3 "Ordering"). Position collisions (two sources replaying
    into one feed, or a synthetic fixture) are broken deterministically by
    ``tiebreak_cols`` (descending, nulls last) — the same secondary order
    the inline COW fold applies, so the inline and distributed merge paths
    agree by construction whenever the full order key differs. Tie-break
    columns absent from the frame are skipped (flattened callers such as
    the incremental snapshotter carry only the position axis).
    """
    order = [F.col(order_col).desc()]
    for c in tiebreak_cols:
        if c in env_df.columns:
            order.append(F.col(c).desc_nulls_last())
    w = Window.partitionBy(*[F.col(c) for c in key_cols]).orderBy(*order)
    return (
        env_df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def maintain_group_aggregate(
    env_df: DataFrame,
    *,
    key_cols: list[str],
    group_col: str,
    value_col: str,
    pos_col: str = "source.pos",
    dec: str = "decimal(18,2)",
    aggs: tuple[str, ...] = ("sum", "count"),
) -> DataFrame:
    """Incremental view maintenance: a grouped SUM/COUNT maintained purely
    from the change stream — the aggregate a consumer keeps live instead of
    re-scanning the merged table (the IVM pattern CDC pipelines feed).

    **Supported aggregates** (``aggs``): ``sum`` (→ ``total_<value_col>``),
    ``count`` (→ ``n``) and the derived ``avg`` (→ ``avg_<value_col>``,
    computed as explicit sum/count so every engine reproduces it
    bit-for-bit — never a running mean). Anything else raises ValueError:
    MIN/MAX are NOT incrementally maintainable from deltas alone — when
    the current extremum is retracted, the next-best value is unknowable
    without re-scanning the group's surviving rows (the standard IVM
    limitation; maintainable variants need auxiliary top-k state, which is
    a different operator, not a flag here).

    Per key, each event contributes a **retraction** of the state the
    previous event left (−1, −value at the previous group) and an
    **assertion** of its own after-image (+1, +value) — deletes assert
    nothing, so the per-key deltas telescope to exactly the key's final
    state, and the grouped totals equal the batch aggregate over the
    merged table for ANY event history, which is what the oracle checks.

    Sources often don't carry before-images (this feed's ``before`` has
    null columns); the previous state is therefore RECONSTRUCTED with a
    per-key ``lag`` over position order — one shuffle on the key, the same
    exchange a MERGE would need. Values are summed as exact decimals:
    retract/assert pairs cancel exactly regardless of order, where float
    summation would drift under the heavy cancellation IVM produces.

    Requires a unique, totally ordered ``pos`` per key (the stream
    contract; position collisions would need the K4 tie-break axis here
    too).
    """
    supported = {"sum", "count", "avg"}
    unknown = [a for a in aggs if a not in supported]
    if unknown or not aggs:
        raise ValueError(
            f"maintain_group_aggregate supports {sorted(supported)}, got "
            f"{list(aggs)!r}. MIN/MAX cannot be maintained incrementally: "
            "retracting the current extremum requires re-scanning the "
            "group for the next-best value."
        )
    key = [F.col(f"key.{c}") for c in key_cols]
    # The empty-array casts below need the group column's real type — a
    # hardcoded string DDL would fail analysis (or miscoerce) for numeric
    # group keys.
    grp_t = env_df.schema["after"].dataType[group_col].dataType.simpleString()
    empty = f"array<struct<sign:int,grp:{grp_t},val:{dec}>>"
    w = Window.partitionBy(*key).orderBy(F.col(pos_col))
    prev = F.lag(F.col("after")).over(w)
    rows = env_df.select(
        F.col("after"), prev.alias("__prev"), F.col("op")
    )
    contrib = rows.select(
        F.explode(
            F.concat(
                F.when(
                    F.col("__prev").isNotNull(),
                    F.array(
                        F.struct(
                            F.lit(-1).alias("sign"),
                            F.col(f"__prev.{group_col}").alias("grp"),
                            F.col(f"__prev.{value_col}").cast(dec).alias("val"),
                        )
                    ),
                ).otherwise(F.array().cast(empty)),
                F.when(
                    F.col("after").isNotNull(),
                    F.array(
                        F.struct(
                            F.lit(1).alias("sign"),
                            F.col(f"after.{group_col}").alias("grp"),
                            F.col(f"after.{value_col}").cast(dec).alias("val"),
                        )
                    ),
                ).otherwise(F.array().cast(empty)),
            )
        ).alias("d")
    )
    # Sum and count are always maintained internally (count drives the
    # emptied-group filter; avg derives from both); `aggs` picks the
    # OUTPUT columns.
    agged = (
        contrib.groupBy(F.col("d.grp").alias(group_col))
        .agg(
            F.sum(F.col("d.sign") * F.col("d.val"))
            .cast("double")
            .alias(f"total_{value_col}"),
            F.sum("d.sign").cast("long").alias("n"),
        )
        .filter(F.col("n") > 0)
    )
    out_cols = [F.col(group_col)]
    if "sum" in aggs:
        out_cols.append(F.col(f"total_{value_col}"))
    if "count" in aggs:
        out_cols.append(F.col("n"))
    if "avg" in aggs:
        # Explicit sum/count (both already exact), divided as doubles —
        # IEEE division is deterministic, so the oracle's
        # CAST(sum AS DOUBLE)/CAST(count AS DOUBLE) matches bit-for-bit.
        out_cols.append(
            (
                F.col(f"total_{value_col}")
                / F.col("n").cast("double")
            ).alias(f"avg_{value_col}")
        )
    return agged.select(*out_cols)


def net_effect_per_key(
    env_df: DataFrame,
    *,
    key_cols: list[str],
    pos_col: str = "source.pos",
) -> DataFrame:
    """Batch-window compaction to NET EFFECT per key — stronger than K4's
    last-event-wins: the emitted op reflects what the whole window DID to
    the key, which is what changelog-consuming systems need (the
    Kafka-log-compaction / changelog-normalize semantics):

    - created then deleted inside the window → NO event (the key never
      existed for a reader of this window);
    - created (and possibly updated) → one ``c`` with the final state;
    - existed, then deleted → one ``d``;
    - existed, still exists → one ``u`` with the final state.

    ONE hash aggregation on the key (min_by/max_by over position — no
    window function, so partial aggregation combines map-side); requires
    the stream contract of a unique total order per key.
    """
    key = [F.col(f"key.{c}").alias(c) for c in key_cols]
    agg = env_df.groupBy(*key).agg(
        F.min_by("op", F.col(pos_col)).alias("__first_op"),
        F.max_by("op", F.col(pos_col)).alias("__last_op"),
        F.max_by("after", F.col(pos_col)).alias("__last_after"),
    )
    born = F.col("__first_op") == "c"  # key did not exist before the window
    dead = F.col("__last_op") == "d"
    net = (
        F.when(born & dead, F.lit(None).cast("string"))
        .when(born, F.lit("c"))
        .when(dead, F.lit("d"))
        .otherwise(F.lit("u"))
    )
    return (
        agg.withColumn("net_op", net)
        .filter(F.col("net_op").isNotNull())
        .select(
            *key_cols,
            "net_op",
            F.when(F.col("net_op") != "d", F.col("__last_after")).alias(
                "after"
            ),
        )
    )


def scd2_history(
    env_df: DataFrame,
    key_cols: list[str],
    value_cols: list[str] | None = None,
) -> DataFrame:
    """Materialize a change feed as a TYPE-2 slowly-changing dimension —
    the standard warehouse consumer of a Debezium stream (every version of
    every key, with validity interval and current flag) rather than K1's
    latest-state MERGE.

    Semantics (one row per surviving version):
    * each ``c``/``u``/``r`` event OPENS a version carrying its after-image,
      ``valid_from_pos`` = the event's log position;
    * the version CLOSES at the key's next event (``valid_to_pos`` =
      ``lead(pos)``, any op — an update supersedes, a delete terminates);
    * ``is_current`` = the version never closed;
    * a ``d`` event emits NO row of its own (its after-image is NULL,
      Envelope.java:330-345) — it only closes its predecessor, so a deleted
      key has no current version.

    Works on any envelope batch, including ``snapshot ∪ stream`` unions
    (``r`` rows open the baseline versions). ONE shuffle: the per-key
    lead() window; at 100 TB that is the same key-clustered exchange the
    MERGE path already pays, with no extra joins. Deterministic: ordered
    by the total order ``source.pos``."""
    if value_cols is None:
        value_cols = [
            f.name
            for f in env_df.schema["after"].dataType.fields
            if f.name not in key_cols
        ]
    w = Window.partitionBy(
        *[F.col("key").getField(k) for k in key_cols]
    ).orderBy(F.col("source.pos"))
    out = env_df.select(
        *[F.col("key").getField(k).alias(k) for k in key_cols],
        *[F.col("after").getField(v).alias(v) for v in value_cols],
        F.col("op"),
        F.col("source.pos").alias("valid_from_pos"),
        F.lead(F.col("source.pos")).over(w).alias("valid_to_pos"),
    )
    return (
        out.filter(F.col("op") != "d")
        .withColumn("is_current", F.col("valid_to_pos").isNull())
        .drop("op")
    )


def fold_partial_images(
    decoded: DataFrame,
    n_cols: int,
    key_idx: int = 0,
    order_col: str = "log_pos",
) -> DataFrame:
    """Materialize a table from PARTIAL row images
    (binlog-row-image=MINIMAL): the before image carries only the PK and
    the after image only the CHANGED columns, so per key each column
    independently takes its latest PRESENT value and an absent column
    (present bit clear) keeps prior state — absent is NOT null (a NULLed
    column arrives present with its null bit set). Deletes drop the row.

    The reference reconstructs the same semantics from
    ``mysql.binlog-row-image`` partial events (the included-columns
    bitmaps its binlog client exposes per rows event). Input is
    ``decode_binlog_rows`` output (before/after + *_present arrays).

    Spark shape: one groupBy on the key — per column a
    ``max_by(value, pos) FILTER (WHERE present)`` aggregate, all
    map-side combinable; NULL values survive the fold behind a sentinel
    (max_by skips null-valued rows, which would turn an explicit NULL
    update into "keep old value"). Same single shuffle the MERGE join
    needs."""
    SENT = "\x00\x00absent"
    kp = key_idx + 1  # element_at is 1-based
    key = F.coalesce(
        F.element_at("before", kp), F.element_at("after", kp)
    ).alias("__key")
    cols = [
        F.expr(
            f"nullif(max_by(coalesce(element_at(after, {i + 1}), '{SENT}'),"
            f" {order_col})"
            f" FILTER (WHERE element_at(after_present, {i + 1})),"
            f" '{SENT}') AS c{i}"
        )
        for i in range(n_cols)
    ]
    folded = (
        decoded.filter(F.col("kind").isin("c", "u", "d"))
        .select("*", key)
        .groupBy("__key")
        .agg(
            F.expr(f"max_by(kind, {order_col}) AS __last_op"),
            *cols,
        )
    )
    return folded.filter(F.col("__last_op") != "d").drop("__last_op")
