"""P6 signals + P7 notifications + the signal-driven S3 chunk loop.

Reference control plane:

* ``SignalProcessor`` polls channels for actions
  (debezium-connector-common/.../pipeline/signal/SignalProcessor.java:45,117,147);
  the file channel (``FileSignalChannel``) is the shape used here — signals
  are JSON lines ``{"id","type","data"}`` appended to a control file.
* ``ExecuteSnapshot`` starts an incremental snapshot for named collections
  (.../signal/actions/snapshotting/ExecuteSnapshot.java:37,53); stop/pause/
  resume mirror StopSnapshot/PauseIncrementalSnapshot/ResumeIncrementalSnapshot.
* Notifications (.../pipeline/notification/Notification.java:21) surface
  snapshot progress; here they append to a JSON-lines log.

The chunk loop is the DBLog algorithm
(AbstractIncrementalSnapshotChangeEventSource.java:245-352): each micro-batch
processes one PK-ordered chunk; stream events win over buffered chunk rows.
With a static source-table stand-in (no live DB in the container), the dedup
window is "every key the stream has touched since the signal" — tracked in a
small keys table under the checkpoint dir — which preserves the invariant
that a snapshot row never overwrites newer streamed state (including
deletes), exactly the read-only variant's behavior
(BinlogReadOnlyIncrementalSnapshotChangeEventSource.java:116-175).
"""

from __future__ import annotations

import json
import os
import time
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from debezium_spark.sources.keyset import keyset_gt


def _json_key(v):
    """A chunk-bound key value in JSON-persistable form (ISO strings for
    temporal types, decimal digits for Decimal; ``_typed_bound`` rebuilds
    the exact typed literal on reload)."""
    if v is None or isinstance(v, (int, float, str, bool)):
        return v
    iso = getattr(v, "isoformat", None)
    return iso() if iso is not None else str(v)


def _typed_bound(schema, pk_cols, bound):
    """Rebuild persisted JSON bound values as exact typed literals.

    A Decimal key persists as its digit string; comparing that string
    literal to a decimal column would coerce BOTH to double (precision
    loss above 2^53 — exactly the decimal(20,0) range BIGINT UNSIGNED
    keys live in), so the literal is rebuilt as a Decimal and the keyset
    predicate compares decimal-to-decimal exactly. Temporal ISO strings
    stay strings: Spark casts the literal (not the column) back
    losslessly."""
    from decimal import Decimal

    from pyspark.sql import types as T

    out = []
    for c, v in zip(pk_cols, bound):
        if isinstance(schema[c].dataType, T.DecimalType) and isinstance(
            v, str
        ):
            v = Decimal(v)
        out.append(v)
    return out


class NotificationLog:
    """P7: append-only progress log (Notification.java:21)."""

    def __init__(self, path: str):
        self.path = path
        os.makedirs(os.path.dirname(path), exist_ok=True)

    def emit(self, aggregate: str, typ: str, **extra) -> None:
        rec = {"ts_ms": int(time.time() * 1000), "aggregate": aggregate,
               "type": typ, **extra}
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")

    def read(self) -> list[dict]:
        if not os.path.exists(self.path):
            return []
        with open(self.path) as f:
            return [json.loads(line) for line in f if line.strip()]


def _condition_of(data: dict) -> str | None:
    """Extract the signal's additional-condition predicate.

    Accepts both the reference's list form
    (``additional-conditions: [{"data-collection": ..., "filter": ...}]``,
    ExecuteSnapshot.java:37,53) and a plain string shortcut. Single-table
    snapshotter: the first entry's filter applies.
    """
    conds = data.get("additional-conditions")
    if not conds:
        return None
    if isinstance(conds, str):
        return conds
    first = conds[0]
    if isinstance(first, dict):
        return first.get("filter")
    return str(first)


class FileSignalChannel:
    """P6: JSON-lines control file polled once per micro-batch.

    Supported actions (SignalProcessor.java:306 registry):
    ``execute-snapshot`` {"data-collections": [...],
    "additional-conditions": [{"data-collection": ..., "filter": ...}]},
    ``stop-snapshot``, ``pause-snapshot``, ``resume-snapshot``,
    ``log`` {"message": ...}.
    """

    def __init__(
        self,
        signal_file: str,
        state_dir: str,
        *,
        snapshotter: "IncrementalSnapshotter | None" = None,
        notifications: NotificationLog | None = None,
    ):
        self.signal_file = signal_file
        self.state_dir = state_dir
        self.snapshotter = snapshotter
        self.notifications = notifications
        os.makedirs(state_dir, exist_ok=True)
        self._state_file = os.path.join(state_dir, "signal_state.json")

    # -- signal I/O -------------------------------------------------------
    def send(self, sig_id: str, sig_type: str, data: dict | None = None) -> None:
        os.makedirs(os.path.dirname(self.signal_file), exist_ok=True)
        with open(self.signal_file, "a") as f:
            f.write(json.dumps({"id": sig_id, "type": sig_type,
                                "data": data or {}}) + "\n")

    def _load_state(self) -> dict:
        if os.path.exists(self._state_file):
            with open(self._state_file) as f:
                return json.load(f)
        return {"processed": [], "paused": False}

    def _save_state(self, st: dict) -> None:
        with open(self._state_file, "w") as f:
            json.dump(st, f)

    def pending(self) -> list[dict]:
        if not os.path.exists(self.signal_file):
            return []
        st = self._load_state()
        out = []
        with open(self.signal_file) as f:
            for line in f:
                if not line.strip():
                    continue
                sig = json.loads(line)
                if sig["id"] not in st["processed"]:
                    out.append(sig)
        return out

    # -- per-batch hook (called by ChangeDataPipeline._dispatch) ----------
    def poll(self, pipeline, batch_df: DataFrame, epoch_id: int) -> None:
        st = self._load_state()
        for sig in self.pending():
            typ, data = sig["type"], sig.get("data", {})
            if typ == "log":
                if self.notifications:
                    self.notifications.emit("log", "MESSAGE",
                                            message=data.get("message", ""))
            elif typ == "execute-snapshot" and self.snapshotter:
                if data.get("type", "INCREMENTAL").upper() == "BLOCKING":
                    # S5 (ChangeEventSourceCoordinator.java:270-271): the
                    # stream is paused at this point in the batch cycle, the
                    # full snapshot re-runs, then streaming resumes — the
                    # current batch applies after and wins per-key.
                    if self.notifications:
                        self.notifications.emit("blocking_snapshot", "STARTED")
                    self.snapshotter.blocking(
                        pipeline,
                        condition=_condition_of(data),
                    )
                    if self.notifications:
                        self.notifications.emit("blocking_snapshot", "COMPLETED")
                else:
                    self.snapshotter.begin(
                        data.get("data-collections", []),
                        condition=_condition_of(data),
                    )
                    if self.notifications:
                        self.notifications.emit(
                            "incremental_snapshot", "STARTED",
                            collections=data.get("data-collections"))
            elif typ == "stop-snapshot" and self.snapshotter:
                self.snapshotter.stop()
                if self.notifications:
                    self.notifications.emit("incremental_snapshot", "ABORTED")
            elif typ == "pause-snapshot":
                st["paused"] = True
            elif typ == "resume-snapshot":
                st["paused"] = False
            st["processed"].append(sig["id"])
        self._save_state(st)

        if self.snapshotter is not None and not st["paused"]:
            self.snapshotter.advance(pipeline, batch_df)


class IncrementalSnapshotter:
    """The S3 chunk loop, driven one chunk per micro-batch.

    ``source_loader`` returns the current source table as a flat DataFrame
    (pk + value columns) — the stand-in for the chunk SELECT
    (AbstractChunkQueryBuilder.java:49-119 keyset pagination). Progress
    (next chunk lower bound) persists under the checkpoint dir so restarts
    resume mid-snapshot (OffsetContext-style, BaseSourceTask.java:364).
    """

    def __init__(
        self,
        spark: SparkSession,
        *,
        source_loader: Callable[[], DataFrame],
        wrap_chunk: Callable[[DataFrame], DataFrame],
        pk_col: str | list[str],
        state_dir: str,
        chunk_size: int = 1024,
        notifications: NotificationLog | None = None,
        table: str | None = None,
        gtid_uuid_expr: str | None = None,
        gtid_txid_expr: str | None = None,
    ):
        """``gtid_uuid_expr``/``gtid_txid_expr`` (SQL expressions over the
        envelope batch, e.g. ``source.gtid_uuid``/``source.gtid_tx``) turn
        on READ-ONLY mode: each chunk's dedup window is decided by GTID-SET
        containment over the per-batch executed-set progression instead of
        the accumulated touched-keys superset, and a batch whose window
        spans more than one server uuid (a failover) defers the chunk for a
        re-read — MySqlReadOnlyIncrementalSnapshotContext semantics over
        `sources/gtid.py`."""
        self.spark = spark
        self.source_loader = source_loader
        self.wrap_chunk = wrap_chunk
        self.gtid_uuid_expr = gtid_uuid_expr
        self.gtid_txid_expr = gtid_txid_expr
        self.readonly = gtid_uuid_expr is not None
        if self.readonly and gtid_txid_expr is None:
            raise ValueError("read-only mode needs gtid_txid_expr too")
        # Composite keys (order_line(order_id, line_no)) and non-numeric
        # keys (UUID/string) are first-class: pass a list and every chunk
        # bound becomes a lexicographic row-value predicate
        # (AbstractChunkQueryBuilder.java:49-119 keyset pagination). A
        # single string keeps the original API.
        self.pk_cols = [pk_col] if isinstance(pk_col, str) else list(pk_col)
        self.pk_col = self.pk_cols[0]
        self.table = table
        self.chunk_size = chunk_size
        self.state_dir = state_dir
        self.notifications = notifications
        os.makedirs(state_dir, exist_ok=True)
        self._progress_file = os.path.join(state_dir, "snapshot_progress.json")
        self._touched_dir = os.path.join(state_dir, "touched_keys")

    # -- progress state ---------------------------------------------------
    def _progress(self) -> dict:
        if os.path.exists(self._progress_file):
            with open(self._progress_file) as f:
                return json.load(f)
        return {"active": False, "bound": None}

    def _save(self, p: dict) -> None:
        with open(self._progress_file, "w") as f:
            json.dump(p, f)

    def begin(self, collections: list[str], condition: str | None = None) -> None:
        """``condition`` is the signal's ``additional-conditions`` filter
        (ExecuteSnapshot.java:37,53 / AbstractChunkQueryBuilder additional
        condition): a SQL predicate ANDed into every chunk SELECT."""
        p = self._progress()
        p.update(
            {
                "active": True,
                "bound": None,
                "collections": collections,
                "condition": condition,
            }
        )
        self._save(p)

    def stop(self) -> None:
        # merge, don't overwrite: the executed GTID set is OFFSET state
        # (the reference's offset context) and outlives any one snapshot
        p = self._progress()
        p.update({"active": False, "bound": None})
        self._save(p)

    def blocking(self, pipeline, condition: str | None = None) -> None:
        """S5 blocking snapshot: one-shot full re-read through the sink —
        no chunk loop, no dedup window (streaming is paused by batch
        ordering)."""
        src = self.source_loader()
        if condition:
            src = src.filter(F.expr(condition))
        pipeline.sink.write_batch(
            self.wrap_chunk(src), self._alloc_chunk_epoch(pipeline.sink)
        )

    def _alloc_chunk_epoch(self, sink) -> int | None:
        """A distinct epoch for one out-of-band emission.

        Sinks exposing ``allocate_oob_epoch`` (LogMergeSink) get a fresh
        negative epoch per chunk — without it, every chunk would land on
        the same default epoch and overwrite the previous one. Other sinks
        (COW merge) ignore the epoch beyond staging-dir naming."""
        alloc = getattr(sink, "allocate_oob_epoch", None)
        return alloc() if alloc is not None else None

    @property
    def active(self) -> bool:
        return self._progress()["active"]

    # -- dedup window -----------------------------------------------------
    def _record_touched(self, batch_df: DataFrame) -> None:
        scoped = batch_df.filter(F.col("op").isNotNull())
        if self.table is not None:
            # Only the captured collection's keys belong in the dedup
            # window — a multiplexed feed also carries signal-table rows
            # (SourceSignalChannel) whose keys are a different type.
            scoped = scoped.filter(F.col("source.table") == self.table)
        cols = [F.col(f"key.{c}").alias(c) for c in self.pk_cols]
        if self.readonly:
            # read-only windows are decided by gtid membership, so every
            # touched key carries the gtid it was touched UNDER
            cols += [
                F.expr(self.gtid_uuid_expr).alias("__g_uuid"),
                F.expr(self.gtid_txid_expr).cast("long").alias("__g_txid"),
            ]
        keys = scoped.select(*cols).distinct()
        keys.write.mode("append").parquet(self._touched_dir)

    def _touched(self) -> DataFrame | None:
        if os.path.exists(self._touched_dir):
            return self.spark.read.parquet(self._touched_dir)
        return None

    # -- read-only GTID window (S4) ----------------------------------------
    def _advance_readonly_window(self, batch_df: DataFrame):
        """One chunk window of the read-only algorithm: low watermark =
        the executed set BEFORE this batch, high = the executed set after
        it minus the low one (setHighWatermark). Returns the
        ``ReadOnlyWindow`` — callers check ``has_server_identifier_changed``
        (failover inside the window -> re-read the chunk, emitWindowClose
        -> rereadChunk) and filter the dedup keys by ``window.high``
        membership. Executed-set state persists in the progress file (the
        reference's offset context), a few uuids x one interval."""
        from debezium_spark.sources.gtid import GtidSet, ReadOnlyWindow

        p = self._progress()
        prev = GtidSet.parse(p.get("executed"))
        rows = (
            batch_df.filter(F.col("op").isNotNull())
            .select(
                F.expr(self.gtid_uuid_expr).alias("u"),
                F.expr(self.gtid_txid_expr).cast("long").alias("t"),
            )
            .groupBy("u").agg(F.max("t").alias("mx"))
            .collect()
        )
        cur = prev
        for r in rows:
            mx = int(r["mx"])
            known = cur.max_transaction_id(r["u"]) or 0
            if mx > known:
                cur = cur.with_(GtidSet.of({r["u"]: [(1, mx)]}))
        window = ReadOnlyWindow()
        window.open(prev)
        window.close(cur)
        p["executed"] = str(cur)
        self._save(p)
        return window

    # -- one chunk per micro-batch ---------------------------------------
    def advance(self, pipeline, batch_df: DataFrame) -> None:
        """Record the batch's keys into the dedup window; if a snapshot is
        active, emit the next chunk's surviving rows through the sink."""
        self._record_touched(batch_df)
        window = (
            self._advance_readonly_window(batch_df) if self.readonly
            else None
        )
        p = self._progress()
        if not p["active"]:
            return
        if window is not None and window.has_server_identifier_changed():
            # a failover happened inside this chunk's window: the chunk
            # cannot be trusted against a split-brain write history — defer
            # (re-read next batch), exactly rereadChunk
            if self.notifications:
                self.notifications.emit(
                    "incremental_snapshot", "CHUNK_REREAD",
                    reason="server identifier changed inside the window",
                )
            return

        src = self.source_loader()
        if p.get("condition"):
            # The additional-condition reaches the chunk SELECT itself, so
            # filtered-out rows are never read, chunked, or deduped.
            src = src.filter(F.expr(p["condition"]))
        if p["bound"] is not None:
            bound = p["bound"]
            if not isinstance(bound, list):  # legacy single-key progress
                bound = [bound]
            # Row-value (k1,k2,..) > (b1,b2,..) expansion; the leading
            # k1 > b1 disjunct alone prunes files via min-max stats.
            src = src.filter(
                keyset_gt(
                    self.pk_cols,
                    _typed_bound(src.schema, self.pk_cols, bound),
                )
            )
        # Keyset chunk: TopK by pk, no full sort (ChunkBoundaryCalculator.java:56).
        chunk = src.orderBy(*[F.col(c) for c in self.pk_cols]).limit(
            self.chunk_size
        )
        chunk = chunk.localCheckpoint(eager=True)  # stable across the two uses
        n = chunk.count()
        if n == 0:
            self.stop()
            if self.notifications:
                self.notifications.emit("incremental_snapshot", "COMPLETED")
            return

        touched = self._touched()
        survivors = chunk
        if touched is not None and window is not None:
            # read-only mode: ONLY keys touched inside THIS chunk's GTID
            # window evict — keys from earlier windows are already
            # reflected in the chunk rows the source read
            # (updateWindowState semantics); membership is the literal
            # interval predicate, join-free
            from debezium_spark.sources.gtid import (
                gtid_membership_predicate,
            )

            touched = touched.filter(
                gtid_membership_predicate(
                    window.high, F.col("__g_uuid"), F.col("__g_txid")
                )
            ).select(*self.pk_cols)
        if touched is not None:
            # No broadcast hint: the touched-keys side grows with stream
            # history; AQE picks broadcast while it's small and falls back
            # to a shuffled join when it isn't.
            survivors = chunk.join(touched.distinct(), self.pk_cols, "left_anti")
        # Persist the allocated chunk epoch BEFORE writing: a crash between
        # the write and the progress save replays the same chunk into the
        # same epoch dir (idempotent overwrite) instead of a duplicate.
        chunk_epoch = p.get("chunk_epoch")
        if chunk_epoch is None:
            chunk_epoch = self._alloc_chunk_epoch(pipeline.sink)
            if chunk_epoch is not None:
                p["chunk_epoch"] = chunk_epoch
                self._save(p)
        pipeline.sink.write_batch(self.wrap_chunk(survivors), chunk_epoch)

        # Lexicographic max of the composite key — struct comparison
        # matches ORDER BY k1, k2, ... exactly. Persisted as a JSON list
        # (ints/strings round-trip natively; date/timestamp bounds persist
        # as ISO strings, which Spark casts back in the comparison).
        max_row = chunk.agg(
            F.max(F.struct(*[F.col(c) for c in self.pk_cols])).alias("m")
        ).collect()[0]["m"]
        new_bound = [_json_key(v) for v in max_row]
        if len(self.pk_cols) == 1:
            # Keep single-key progress files in their historical scalar
            # shape so in-flight snapshots resume across this upgrade.
            new_bound = new_bound[0]
        p["bound"] = new_bound
        if chunk_epoch is not None:
            p["chunk_epoch"] = chunk_epoch - 1
        self._save(p)
        if self.notifications:
            self.notifications.emit(
                "incremental_snapshot", "IN_PROGRESS", bound=new_bound
            )


class SourceSignalChannel(FileSignalChannel):
    """P6 via the stream itself: the reference's ``signal.data.collection``
    path, where INSERTs into a signal *table* arrive as ordinary change
    events in the log (SignalProcessor.java:147 source-channel;
    MySQL read-only incremental snapshots depend on it).

    Each micro-batch is scanned for ``op='c'`` rows of the signal
    collection; their (id, type, data-JSON) payloads are appended to the
    durable signal file (dedup by signal id survives restarts) and then the
    normal action registry runs. Signals are therefore processed at the
    exact log position where they were written — the property that makes
    the DBLog watermark windows correct.

    The multiplexed envelope's ``after`` struct must carry the signal
    columns (``id``, ``type``, ``data``); pair with a routing/filter
    transform if the signal table should not reach the sink.
    """

    def __init__(
        self,
        signal_file: str,
        state_dir: str,
        *,
        signal_collection: str = "signals",
        **kw,
    ):
        super().__init__(signal_file, state_dir, **kw)
        self.signal_collection = signal_collection

    def poll(self, pipeline, batch_df: DataFrame, epoch_id: int) -> None:
        rows = (
            batch_df.filter(
                (F.col("source.table") == self.signal_collection)
                & (F.col("op") == "c")
            )
            .select(
                F.col("after.id").alias("id"),
                F.col("after.type").alias("type"),
                F.col("after.data").alias("data"),
            )
            .collect()
        )
        if rows:
            st = self._load_state()
            for r in rows:
                if r.id in st["processed"]:
                    continue
                data = json.loads(r.data) if r.data else {}
                self.send(r.id, r.type, data)
        super().poll(pipeline, batch_df, epoch_id)


class KafkaSignalChannel(FileSignalChannel):
    """P6 via a dedicated signal topic — ``KafkaSignalChannel``
    (debezium-connector-common/.../pipeline/signal/channels/
    KafkaSignalChannel.java) semantics over a pluggable record source:

    * records are (key, value, offset) from ONE partition of the signal
      topic (the reference assigns partition 0 only — total order);
    * the record KEY must equal the connector's logical name, otherwise
      the signal is skipped (processSignal's key guard) — one topic can
      fan signals to many connectors;
    * the value is the ``{"id","type","data"}`` JSON document; malformed
      JSON or a missing id/type is logged and SKIPPED, never fatal
      (parseJson's warn-and-skip contract);
    * every accepted signal carries its channel offset, the channel
      resumes from the last processed offset across restarts, and
      :meth:`seek` repositions like the reference's
      ``consumer.seek(offset + 1)``.

    ``record_source(after_offset)`` abstracts the consumer poll: the
    production binding reads the topic through spark-sql-kafka (gated on
    :func:`debezium_spark.sources.kafka.kafka_available`, same as the
    envelope source — see :func:`spark_kafka_record_source`); the contract
    test drives the SAME code path with a file-backed stand-in, so the
    production swap-in is a reader change, not untested prose.
    Dispatch (execute-snapshot / stop / pause / resume / log + id dedup)
    is inherited unchanged from the file channel.
    """

    def __init__(
        self,
        state_dir: str,
        *,
        connector_name: str,
        record_source,
        snapshotter: "IncrementalSnapshotter | None" = None,
        notifications: NotificationLog | None = None,
        warn=lambda m: None,
    ):
        super().__init__(
            os.path.join(state_dir, "__unused_signal_file"),
            state_dir,
            snapshotter=snapshotter,
            notifications=notifications,
        )
        self.connector_name = connector_name
        self.record_source = record_source
        self.warn = warn
        self._polled: list | None = None  # one consumer read per poll()

    def _load_state(self) -> dict:
        st = super()._load_state()
        st.setdefault("channel_offset", -1)
        return st

    def seek(self, signal_offset: int) -> None:
        """Resume reading after ``signal_offset`` (KafkaSignalChannel.seek:
        ``consumer.seek(offset + 1)``)."""
        st = self._load_state()
        st["channel_offset"] = signal_offset
        self._save_state(st)

    def pending(self) -> list[dict]:
        st = self._load_state()
        recs = (
            self._polled
            if self._polled is not None
            else self.record_source(st["channel_offset"])
        )
        out = []
        for key, value, offset in recs:
            if key != self.connector_name:
                self.warn(
                    f"signal key {key!r} doesn't match connector "
                    f"{self.connector_name!r}"
                )
                continue
            try:
                doc = json.loads(value)
            except (ValueError, TypeError):
                self.warn(f"skipped signal at offset {offset}: invalid JSON")
                continue
            sig_id, sig_type = doc.get("id"), doc.get("type")
            if not sig_id or not sig_type:
                self.warn(f"skipped signal at offset {offset}: missing id/type")
                continue
            if sig_id in st["processed"]:
                continue
            out.append(
                {
                    "id": sig_id,
                    "type": sig_type,
                    "data": doc.get("data") or {},
                    "channelOffset": offset,
                }
            )
        return out

    def poll(self, pipeline, batch_df: DataFrame, epoch_id: int) -> None:
        # ONE consumer read per poll: pending() (invoked by the inherited
        # dispatch) reuses this batch instead of re-polling the source.
        self._polled = self.record_source(self._load_state()["channel_offset"])
        try:
            super().poll(pipeline, batch_df, epoch_id)
            if self._polled:
                # Advance past everything polled (accepted, mismatched, or
                # malformed — the reference's consumer offset moves the same
                # way); id-dedup still guards replays after an explicit seek.
                st = self._load_state()
                st["channel_offset"] = max(
                    [off for _, _, off in self._polled] + [st["channel_offset"]]
                )
                self._save_state(st)
        finally:
            self._polled = None


def file_record_source(path: str):
    """File-backed stand-in consumer for :class:`KafkaSignalChannel` —
    JSON lines ``{"key": ..., "value": ...}``; the line number is the
    record offset. The contract tests exercise the Kafka channel's
    key-guard / parse-skip / offset-resume logic through this."""

    def read(after_offset: int):
        if not os.path.exists(path):
            return []
        out = []
        with open(path) as f:
            for off, line in enumerate(f):
                if off <= after_offset or not line.strip():
                    continue
                rec = json.loads(line)
                out.append((rec.get("key"), rec.get("value"), off))
        return out

    return read


def spark_kafka_record_source(
    spark: SparkSession, *, bootstrap_servers: str, topic: str
):
    """Production consumer binding: batch-read the single-partition signal
    topic through spark-sql-kafka from the given offset. Gated exactly
    like the envelope source — raises with remediation when the kafka
    data source isn't on the classpath (no broker in this container)."""
    from debezium_spark.sources.kafka import kafka_available

    if not kafka_available(spark):
        raise RuntimeError(
            "spark-sql-kafka is not available; add the "
            "spark-sql-kafka-0-10 package to use the Kafka signal channel "
            "(the file/in-stream channels need no broker)"
        )

    def read(after_offset: int):
        import json as _json

        raw = (
            spark.read.format("kafka")
            .option("kafka.bootstrap.servers", bootstrap_servers)
            .option("subscribe", topic)
            .option(
                "startingOffsets",
                _json.dumps({topic: {"0": after_offset + 1}}),
            )
            .load()
        )
        rows = raw.select(
            F.col("key").cast("string"),
            F.col("value").cast("string"),
            F.col("offset"),
        ).collect()
        return [(r["key"], r["value"], r["offset"]) for r in rows]

    return read
