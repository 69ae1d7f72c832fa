"""S10 — LSN-windowed incremental polling (SQL Server CDC pattern) and
S4 read-only watermarks.

Reference: ``SqlServerStreamingChangeEventSource``
(debezium-connector-sqlserver/src/main/java/io/debezium/connector/sqlserver/
SqlServerStreamingChangeEventSource.java:69): each poll reads
``cdc.fn_cdc_get_all_changes_*`` between the last committed LSN and the
current max LSN (SqlServerConnection.java:75-78), advancing the offset after
each window. Read-only incremental watermarks (S4,
BinlogReadOnlyIncrementalSnapshotChangeEventSource.java:116-175) use the
same "position fence" idea: a watermark is just the max position observed.

Spark shape: a micro-batch JDBC/parquet read with a half-open window
predicate ``low < lsn AND lsn <= high`` — pushed into the scan — driven by a
Trigger.AvailableNow-style loop. Offsets persist like the streaming
checkpoint (JSON under the state dir).
"""

from __future__ import annotations

import json
import os
from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def window_read(
    source_df: DataFrame, lsn_col: str, low: int | None, high: int
) -> DataFrame:
    """One CDC poll: rows with ``low < lsn <= high`` (half-open window —
    SqlServerConnection.java:75-78). Both bounds are literals so the
    predicate pushes into the parquet/JDBC scan."""
    cond = F.col(lsn_col) <= F.lit(high)
    if low is not None:
        cond = (F.col(lsn_col) > F.lit(low)) & cond
    return source_df.filter(cond)


class PollingSource:
    """The Trigger.AvailableNow loop around :func:`window_read`, with a
    persisted offset (the ``lsn_time_mapping`` bookkeeping analog)."""

    def __init__(
        self,
        load_source: Callable[[], DataFrame],
        lsn_col: str,
        state_dir: str,
        *,
        max_window: int | None = None,
    ):
        self.load_source = load_source
        self.lsn_col = lsn_col
        self.max_window = max_window
        os.makedirs(state_dir, exist_ok=True)
        self._offset_file = os.path.join(state_dir, "poll_offset.json")

    @property
    def committed_lsn(self) -> int | None:
        if os.path.exists(self._offset_file):
            with open(self._offset_file) as f:
                return json.load(f)["lsn"]
        return None

    def _write_offset(self, lsn: int) -> None:
        with open(self._offset_file, "w") as f:
            json.dump({"lsn": lsn}, f)

    def poll(self) -> DataFrame | None:
        """Read the next window; None when caught up. The window cap keeps
        each micro-batch bounded (ChangeEventQueue.maxBatchSize analog).

        The offset does NOT advance here: the returned DataFrame is a lazy
        plan, and committing before the caller materializes and delivers it
        would turn a crash into silent row loss. Call :meth:`commit` after
        the sink write succeeds (BaseSourceTask.commit runs after delivery
        — that ordering is the at-least-once contract). An uncommitted
        window is simply re-returned by the next poll (re-delivery)."""
        src = self.load_source()
        low = self.committed_lsn
        row = src.agg(
            F.min(self.lsn_col).alias("lo"), F.max(self.lsn_col).alias("hi")
        ).collect()[0]
        max_lsn = row["hi"]
        if max_lsn is None or (low is not None and max_lsn <= low):
            return None
        if low is None:
            low = row["lo"] - 1  # first poll: fence just below the log start
        high = max_lsn
        if self.max_window is not None:
            high = min(max_lsn, low + self.max_window)
        batch = window_read(src, self.lsn_col, low, high)
        self._pending_high = high
        return batch

    def commit(self, lsn: int | None = None) -> None:
        """Durably advance the offset past the delivered window (defaults
        to the high bound of the last :meth:`poll`)."""
        if lsn is None:
            lsn = getattr(self, "_pending_high", None)
        if lsn is None:
            raise ValueError("no delivered window to commit")
        self._write_offset(lsn)
        self._pending_high = None


def assemble_change_table(
    df: DataFrame,
    value_cols: list[str],
    lsn_col: str = "start_lsn",
    seq_col: str = "seqval",
    op_col: str = "operation",
) -> DataFrame:
    """Assemble SQL Server change-table rows into change events —
    ``cdc.fn_cdc_get_all_changes_*`` emits __$operation 1=DELETE,
    2=INSERT, 3=UPDATE-before, 4=UPDATE-after, with the update halves
    adjacent under one (__$start_lsn, __$seqval)
    (SqlServerChangeRecordEmitter.java:21-24; the streaming source pairs
    op-3 with the NEXT row and throws if it is not the op-4 twin,
    SqlServerStreamingChangeEventSource.java:338-345).

    Spark shape: one hash aggregation on (start_lsn, seqval) — min_by/
    max_by pick the before/after halves, all map-side combinable, the
    same single shuffle at any log size. Malformed pairs (an op-3
    without its op-4, duplicate halves) raise executor-side instead of
    emitting a corrupted update."""
    vals = F.struct(*[F.col(c) for c in value_cols])
    g = df.groupBy(lsn_col, seq_col).agg(
        F.min(op_col).alias("__lo_op"),
        F.max(op_col).alias("__hi_op"),
        F.count("*").alias("__n"),
        F.expr(f"min_by(struct({', '.join(value_cols)}), {op_col})").alias(
            "__lo"
        ),
        F.expr(f"max_by(struct({', '.join(value_cols)}), {op_col})").alias(
            "__hi"
        ),
    )
    valid_single = (F.col("__n") == 1) & F.col("__lo_op").isin(1, 2)
    valid_pair = (
        (F.col("__n") == 2)
        & (F.col("__lo_op") == 3)
        & (F.col("__hi_op") == 4)
    )
    op = (
        F.when(valid_pair, F.lit("u"))
        .when(valid_single & (F.col("__lo_op") == 2), F.lit("c"))
        .when(valid_single & (F.col("__lo_op") == 1), F.lit("d"))
        .otherwise(
            F.raise_error(
                F.concat(
                    F.lit("malformed change-table group at lsn="),
                    F.col(lsn_col).cast("string"),
                    F.lit(" seq="),
                    F.col(seq_col).cast("string"),
                    F.lit(": ops ["),
                    F.col("__lo_op").cast("string"),
                    F.lit(","),
                    F.col("__hi_op").cast("string"),
                    F.lit("] x"),
                    F.col("__n").cast("string"),
                )
            )
        )
    )
    return g.select(
        F.col(lsn_col),
        F.col(seq_col),
        op.alias("op"),
        F.when(F.col("__lo_op").isin(1, 3), F.col("__lo")).alias("before"),
        F.when(
            (F.col("__hi_op") == 4)
            | (valid_single & (F.col("__lo_op") == 2)),
            F.col("__hi"),
        ).alias("after"),
    )


def migrate_capture_instances(
    instances: list[tuple[int, DataFrame]],
    lsn_col: str = "start_lsn",
) -> DataFrame:
    """S33 — SQL Server capture-instance migration: a schema change on a
    CDC-enabled table creates a NEW capture instance whose change table
    COEXISTS with the old one (SQL Server keeps writing to both until the
    old one is dropped), so a poll sees overlapping LSN ranges for one
    source table. The reference orders the instances by start LSN, sets
    the older one's stop LSN to the newer one's start LSN, and SKIPS any
    old-instance row whose commit LSN is at-or-past that stop
    (SqlServerStreamingChangeEventSource.java:465-536 getChangeTablesToQuery;
    :315-321 the per-row stopLsn skip; migrateTable dispatches the ALTER).

    ``instances`` is [(start_lsn, change_table_df), ...] for ONE source
    table (SQL Server allows at most two concurrent capture instances;
    N are accepted here — each instance's effective window is
    [its start, next start)). The merged stream unions BY NAME, so a
    renamed/added column surfaces as typed NULLs on the rows captured
    under instances that didn't have it — exactly the reference's
    post-migration shape. Each window predicate is a pair of literals
    pushed into the scan; no shuffle is added."""
    if not instances:
        raise ValueError("no capture instances to merge")
    ordered = sorted(instances, key=lambda it: it[0])
    starts = [s for s, _ in ordered]
    if len(set(starts)) != len(starts):
        raise ValueError(
            f"capture instances must have distinct start LSNs: {starts}"
        )
    frames = []
    for i, (start, df) in enumerate(ordered):
        cond = F.col(lsn_col) >= F.lit(start)
        if i + 1 < len(ordered):
            # old instance's stop = next instance's start; rows with
            # commit lsn >= stop are the new instance's to emit
            cond = cond & (F.col(lsn_col) < F.lit(ordered[i + 1][0]))
        frames.append(df.filter(cond))
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f, allowMissingColumns=True)
    return out
