"""P6/P7 golden runs: signal-triggered incremental snapshot (S3 chunk loop)
interleaved with streaming changes; stream events win over chunk rows.

Mirrors the reference's IncrementalSnapshotIT pattern: start streaming with
no initial snapshot, send an execute-snapshot signal, keep streaming, and
assert the final materialized table equals the batch answer.
"""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from debezium_spark.envelope import wrap_snapshot
from debezium_spark.sinks.merge import ParquetMergeSink
from debezium_spark.sources.changefeed import accounts_changefeed
from debezium_spark.streaming import (
    ChangeDataPipeline,
    FileSignalChannel,
    IncrementalSnapshotter,
    NotificationLog,
    replay_feed,
)


@pytest.fixture()
def dirs(tmp_path):
    d = {k: str(tmp_path / k) for k in
         ("feed", "target", "ckpt", "state", "notif", "sig")}
    yield d
    shutil.rmtree(tmp_path, ignore_errors=True)


def _accounts_source(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        F.col("c_custkey").alias("id"),
        F.col("c_mktsegment").alias("status"),
        F.col("c_acctbal").alias("balance"),
    )


def _expected_final(spark, sf_dir):
    from debezium_spark.suite import load_all

    qs = load_all()
    return sorted(
        (r.id, r.status, r.balance)
        for r in qs["k1_merge_upsert"].fn(spark, sf_dir).collect()
    )


def _build(spark, sf_dir, dirs, chunk_size=40):
    notif = NotificationLog(dirs["notif"] + "/notifications.jsonl")
    snapshotter = IncrementalSnapshotter(
        spark,
        source_loader=lambda: _accounts_source(spark, sf_dir),
        wrap_chunk=lambda df: wrap_snapshot(df, ["id"], db="testdb",
                                            table="accounts"),
        pk_col="id",
        state_dir=dirs["state"],
        chunk_size=chunk_size,
        notifications=notif,
        table="accounts",
    )
    signals = FileSignalChannel(
        dirs["sig"] + "/signals.jsonl",
        dirs["state"],
        snapshotter=snapshotter,
        notifications=notif,
    )
    sink = ParquetMergeSink(spark, dirs["target"], ["id"], num_buckets=8)
    env_schema = accounts_changefeed(spark, sf_dir).schema
    pipe = ChangeDataPipeline(
        spark,
        feed_dir=dirs["feed"],
        envelope_schema=env_schema,
        sink=sink,
        checkpoint_dir=dirs["ckpt"],
        signals=signals,
        notifications=notif,
    )
    return pipe, sink, signals, snapshotter, notif


def test_signal_snapshot_interleaved_with_stream(spark, sf_dir, dirs):
    env = accounts_changefeed(spark, sf_dir)
    pipe, sink, signals, snapshotter, notif = _build(spark, sf_dir, dirs)

    # Phase 1: stream the first half — no snapshot yet.
    median = env.select(F.col("source.pos").alias("p")).approxQuantile(
        "p", [0.5], 0.0
    )[0]
    replay_feed(env.filter(F.col("source.pos") <= median), dirs["feed"],
                num_chunks=2)
    pipe.run_available()
    assert not snapshotter.active

    # Phase 2: signal an ad-hoc incremental snapshot, keep streaming. The
    # chunk loop (150 customers / 40 per chunk) interleaves with 2 more
    # change batches and finishes on subsequent empty-feed polls.
    signals.send("adhoc-1", "execute-snapshot",
                 {"data-collections": ["testdb.accounts"]})
    replay_feed(env.filter(F.col("source.pos") > median), dirs["feed"],
                num_chunks=2, start_chunk=2)
    pipe.run_available()
    # Drain remaining chunks: AvailableNow with no new files still triggers
    # no batches, so push empty-feed polls via direct advance calls (the
    # continuous-mode trigger would do this on its own).
    while snapshotter.active:
        snapshotter.advance(pipe, env.limit(0))

    got = sorted(
        (r.id, r.status, r.balance)
        for r in sink.read().select("id", "status", "balance").collect()
    )
    assert got == _expected_final(spark, sf_dir)

    # P7: notifications tell the story in order.
    types = [(n["aggregate"], n["type"]) for n in notif.read()]
    assert ("incremental_snapshot", "STARTED") in types
    assert ("incremental_snapshot", "COMPLETED") in types
    started = types.index(("incremental_snapshot", "STARTED"))
    completed = types.index(("incremental_snapshot", "COMPLETED"))
    assert started < completed
    assert ("incremental_snapshot", "IN_PROGRESS") in types


def test_stop_and_pause_signals(spark, sf_dir, dirs):
    env = accounts_changefeed(spark, sf_dir)
    pipe, sink, signals, snapshotter, notif = _build(spark, sf_dir, dirs)

    replay_feed(env, dirs["feed"], num_chunks=1)
    signals.send("s1", "execute-snapshot",
                 {"data-collections": ["testdb.accounts"]})
    signals.send("s2", "pause-snapshot")
    pipe.run_available()
    # Paused: signal consumed, snapshot begun but no chunk advanced.
    assert snapshotter.active
    assert snapshotter._progress()["bound"] is None

    signals.send("s3", "resume-snapshot")
    signals.send("s4", "log", {"message": "resuming now"})
    pipe2, sink2, signals2, snapshotter2, notif2 = _build(spark, sf_dir, dirs)
    pipe2.run_available()  # no new files -> no batches -> no poll; drive poll:
    signals2.poll(pipe2, env.limit(0), epoch_id=0)
    assert snapshotter2._progress()["bound"] is not None  # chunk advanced

    signals2.send("s5", "stop-snapshot")
    signals2.poll(pipe2, env.limit(0), epoch_id=1)
    assert not snapshotter2.active
    msgs = [n for n in notif2.read() if n["type"] == "MESSAGE"]
    assert any("resuming now" in n.get("message", "") for n in msgs)


def test_blocking_snapshot_signal(spark, sf_dir, dirs):
    """S5: a blocking re-snapshot mid-stream resets key coverage to the
    source table; subsequent changes re-apply on top. Final state equals a
    fresh merge of (full snapshot, phase-2 changes only)."""
    from debezium_spark.operators.unwrap import extract_new_record_state
    from debezium_spark.sinks.merge import merge_changes
    from debezium_spark.sources.changefeed import accounts_snapshot

    env = accounts_changefeed(spark, sf_dir)
    pipe, sink, signals, snapshotter, notif = _build(spark, sf_dir, dirs)

    median = env.select(F.col("source.pos").alias("p")).approxQuantile(
        "p", [0.5], 0.0
    )[0]
    phase1 = env.filter(F.col("source.pos") <= median)
    phase2 = env.filter(F.col("source.pos") > median)

    replay_feed(phase1, dirs["feed"], num_chunks=1)
    pipe.run_available()

    signals.send("blk-1", "execute-snapshot", {"type": "BLOCKING"})
    replay_feed(phase2, dirs["feed"], num_chunks=1, start_chunk=1)
    pipe.run_available()

    got = sorted(
        (r.id, r.status, r.balance)
        for r in sink.read().select("id", "status", "balance").collect()
    )
    snap_flat = extract_new_record_state(
        accounts_snapshot(spark, sf_dir), delete_handling="drop"
    )
    expected = sorted(
        (r.id, r.status, r.balance)
        for r in merge_changes(snap_flat, phase2, ["id"]).collect()
    )
    assert got == expected
    types = [(n["aggregate"], n["type"]) for n in notif.read()]
    assert ("blocking_snapshot", "STARTED") in types
    assert ("blocking_snapshot", "COMPLETED") in types


def test_snapshot_additional_condition_filters_chunks(spark, sf_dir, dirs):
    """ExecuteSnapshot additional-conditions (ExecuteSnapshot.java:37,53):
    the predicate reaches the chunk SELECT, so only matching rows are
    snapshotted — unmatched rows never enter the sink."""
    env = accounts_changefeed(spark, sf_dir)
    pipe, sink, signals, snapshotter, notif = _build(spark, sf_dir, dirs)

    signals.send(
        "cond-1",
        "execute-snapshot",
        {
            "data-collections": ["testdb.accounts"],
            "additional-conditions": [
                {"data-collection": "testdb.accounts", "filter": "id % 2 = 0"}
            ],
        },
    )
    # Empty feed: drive the chunk loop directly (continuous mode would).
    signals.poll(pipe, env.limit(0), 0)
    while snapshotter.active:
        snapshotter.advance(pipe, env.limit(0))

    rows = sink.read().select("id").collect()
    assert rows and all(r.id % 2 == 0 for r in rows)


def test_source_signal_channel_processes_in_stream_signals(spark, sf_dir, dirs):
    """P6 source channel (signal.data.collection): an INSERT into the
    signal table arriving IN the change stream starts the snapshot at that
    log position; re-delivery of the same signal id is a no-op."""
    from debezium_spark.streaming import SourceSignalChannel

    pipe, sink, _file_signals, snapshotter, notif = _build(spark, sf_dir, dirs)
    signals = SourceSignalChannel(
        dirs["sig"] + "/stream_signals.jsonl",
        dirs["state"],
        signal_collection="signals",
        snapshotter=snapshotter,
        notifications=notif,
    )
    env = accounts_changefeed(spark, sf_dir)
    # A signal-table INSERT as an ordinary change event: after struct
    # carries (id, type, data-JSON); the account columns ride along null.
    import json as _json

    sig_after = F.struct(
        F.lit("sig-42").alias("id"),
        F.lit("execute-snapshot").alias("type"),
        F.lit(_json.dumps({
            "data-collections": ["testdb.accounts"],
            "additional-conditions": [{"filter": "id % 2 = 1"}],
        })).alias("data"),
    )
    sig_batch = env.limit(1).select(
        F.struct(F.lit("sig-42").alias("id")).alias("key"),
        F.lit(None).cast("struct<id:string,type:string,data:string>").alias("before"),
        sig_after.alias("after"),
        F.lit("c").alias("op"),
        F.struct(
            F.lit("testdb").alias("db"),
            F.lit("signals").alias("table"),
            F.lit(1).cast("long").alias("pos"),
            F.lit(None).cast("string").alias("tx_id"),
            F.lit(None).cast("string").alias("snapshot"),
        ).alias("source"),
    )
    signals.poll(pipe, sig_batch, 0)
    assert snapshotter.active

    while snapshotter.active:
        snapshotter.advance(pipe, sig_batch.limit(0))
    rows = sink.read().select("id").collect()
    assert rows and all(r.id % 2 == 1 for r in rows)

    # same signal id re-delivered (batch replay) → processed exactly once
    n_before = len(sink.read().collect())
    signals.poll(pipe, sig_batch, 1)
    assert not snapshotter.active  # not restarted
    assert len(sink.read().collect()) == n_before


def test_kafka_signal_channel_contract(spark, tmp_path):
    """KafkaSignalChannel semantics driven through the file-backed
    stand-in consumer (the production spark-sql-kafka binding swaps in
    behind the same record_source signature): key guard, malformed-JSON
    and missing-type skip, offset resume, seek + id-dedup replay."""
    import json as _json

    from debezium_spark.streaming.signals import (
        KafkaSignalChannel,
        NotificationLog,
        file_record_source,
    )

    topic = tmp_path / "signal_topic.jsonl"
    recs = [
        {"key": "conn1", "value": _json.dumps(
            {"id": "s1", "type": "log", "data": {"message": "hello"}})},
        {"key": "other-connector", "value": _json.dumps(
            {"id": "sX", "type": "log", "data": {"message": "not mine"}})},
        {"key": "conn1", "value": "{not json"},
        {"key": "conn1", "value": _json.dumps({"id": "s2"})},  # no type
    ]
    topic.write_text("".join(_json.dumps(r) + "\n" for r in recs))

    warns = []
    notes = NotificationLog(str(tmp_path / "notes.jsonl"))
    ch = KafkaSignalChannel(
        str(tmp_path / "state"),
        connector_name="conn1",
        record_source=file_record_source(str(topic)),
        notifications=notes,
        warn=warns.append,
    )
    ch.poll(None, None, epoch_id=0)

    msgs = [n for n in notes.read() if n["type"] == "MESSAGE"]
    assert [m["message"] for m in msgs] == ["hello"]
    assert len(warns) == 3  # key mismatch + bad JSON + missing type
    assert ch._load_state()["channel_offset"] == 3  # consumer moved past all

    # idempotent on re-poll: no new records, nothing re-dispatched
    ch.poll(None, None, epoch_id=1)
    assert len([n for n in notes.read() if n["type"] == "MESSAGE"]) == 1

    # seek replays the topic; id-dedup suppresses the already-run signal
    ch.seek(-1)
    ch.poll(None, None, epoch_id=2)
    assert len([n for n in notes.read() if n["type"] == "MESSAGE"]) == 1

    # a newly appended record is picked up from the stored offset
    with open(topic, "a") as f:
        f.write(_json.dumps({"key": "conn1", "value": _json.dumps(
            {"id": "s3", "type": "log", "data": {"message": "again"}})}) + "\n")
    ch.poll(None, None, epoch_id=3)
    assert [m["message"] for m in notes.read() if m["type"] == "MESSAGE"] == [
        "hello",
        "again",
    ]


# ---------------------------------------------------------------------------
# S4 read-only mode: GTID-set chunk windows + failover re-read
# (BinlogReadOnlyIncrementalSnapshotChangeEventSource.java:116-175 over
# sources/gtid.py — the streaming half of s30)
# ---------------------------------------------------------------------------
def test_readonly_gtid_windows_and_failover_reread(spark, tmp_path):
    from types import SimpleNamespace

    from debezium_spark.streaming.signals import IncrementalSnapshotter

    UUID_A = "aaaaaaaa-aaaa-aaaa-aaaa-aaaaaaaaaaaa"
    UUID_B = "bbbbbbbb-bbbb-bbbb-bbbb-bbbbbbbbbbbb"

    emitted: list = []

    class CaptureSink:
        def write_batch(self, df, epoch=None):
            emitted.append(sorted(r["id"] for r in df.collect()))

    src = spark.createDataFrame(
        [(i, f"v{i}") for i in range(1, 9)], "id long, val string"
    )
    snap = IncrementalSnapshotter(
        spark,
        source_loader=lambda: src,
        wrap_chunk=lambda df: df,
        pk_col="id",
        state_dir=str(tmp_path / "state"),
        chunk_size=4,
        gtid_uuid_expr="source.guuid",
        gtid_txid_expr="source.gtx",
    )
    snap.begin(["t"])
    pipe = SimpleNamespace(sink=CaptureSink())

    def batch(rows):
        # rows: (id, uuid, txid)
        return spark.createDataFrame(
            [
                {
                    "key": {"id": i},
                    "op": "u",
                    "source": {"guuid": u, "gtx": t},
                }
                for i, u, t in rows
            ],
            "key struct<id:long>, op string,"
            " source struct<guuid:string, gtx:long>",
        )

    # batch 1: events under server A touch keys 2 and 3 — both are inside
    # chunk 1's window, so the chunk (ids 1-4) emits without them
    snap.advance(pipe, batch([(2, UUID_A, 101), (3, UUID_A, 102)]))
    assert emitted == [[1, 4]]

    # batch 2: FAILOVER inside the window (A and B both advance): the
    # chunk must be deferred for a re-read, bound unchanged
    snap.advance(pipe, batch([(5, UUID_A, 103), (6, UUID_B, 1)]))
    assert emitted == [[1, 4]]  # nothing new emitted

    # batch 3: stable again under B — the RE-READ chunk (ids 5-8) emits;
    # only keys touched INSIDE this window (key 7 under B) evict; key 5,
    # touched in the PREVIOUS window, is presumed already reflected in
    # the re-read chunk (the live-table property the reference relies on)
    snap.advance(pipe, batch([(7, UUID_B, 2)]))
    assert emitted == [[1, 4], [5, 6, 8]]

    # empty-feed poll: no events -> empty window -> no eviction; the
    # snapshot completes (no rows past the bound)
    empty = batch([]).limit(0)
    snap.advance(pipe, empty)
    assert not snap.active

    # the executed set persisted through the walk (offset-context budget)
    import json as _json

    with open(str(tmp_path / "state" / "snapshot_progress.json")) as fh:
        p = _json.load(fh)
    assert UUID_A in p["executed"] and UUID_B in p["executed"]


def test_readonly_reread_chunk_end_to_end_matches_batch(spark, tmp_path):
    """The rereadChunk path END-TO-END: a failover lands mid-chunk, the
    CHUNK_REREAD notification fires, the chunk re-reads from the LIVE
    table (which moved during the deferred window — the property the
    reference relies on), and the final materialized state (chunk rows
    + streamed changes, last-write-wins) equals the batch oracle: the
    live table's final state."""
    from types import SimpleNamespace

    from debezium_spark.streaming.signals import (
        IncrementalSnapshotter,
        NotificationLog,
    )

    UUID_A = "aaaaaaaa-aaaa-aaaa-aaaa-aaaaaaaaaaaa"
    UUID_B = "bbbbbbbb-bbbb-bbbb-bbbb-bbbbbbbbbbbb"

    # the LIVE source: a mutable dict the loader snapshots on every read
    live = {i: f"v{i}" for i in range(1, 9)}

    def load():
        return spark.createDataFrame(
            sorted(live.items()), "id long, val string"
        )

    emitted: list[tuple[int, str]] = []   # (id, val) from chunk emissions
    streamed: list[tuple[int, str]] = []  # changes delivered by the stream

    class CaptureSink:
        def write_batch(self, df, epoch=None):
            emitted.extend((r["id"], r["val"]) for r in df.collect())

    notif = NotificationLog(str(tmp_path / "notif.jsonl"))
    snap = IncrementalSnapshotter(
        spark,
        source_loader=load,
        wrap_chunk=lambda df: df,
        pk_col="id",
        state_dir=str(tmp_path / "state"),
        chunk_size=4,
        notifications=notif,
        gtid_uuid_expr="source.guuid",
        gtid_txid_expr="source.gtx",
    )
    snap.begin(["t"])
    pipe = SimpleNamespace(sink=CaptureSink())

    def apply_and_batch(rows):
        # rows: (id, new_val, uuid, txid) — mutate the live table (the
        # change is committed there first) AND deliver the stream event
        for i, v, _u, _t in rows:
            live[i] = v
            streamed.append((i, v))
        return spark.createDataFrame(
            [
                {"key": {"id": i}, "op": "u",
                 "source": {"guuid": u, "gtx": t}}
                for i, v, u, t in rows
            ],
            "key struct<id:long>, op string,"
            " source struct<guuid:string, gtx:long>",
        )

    # batch 1 (A): id 2 changes -> chunk 1 (ids 1-4) emits without it
    snap.advance(pipe, apply_and_batch([(2, "s2", UUID_A, 101)]))
    assert sorted(i for i, _ in emitted) == [1, 3, 4]

    # batch 2: FAILOVER mid-chunk-2 window — ids 5 (under A) and 6
    # (under B) change; the chunk defers and CHUNK_REREAD fires
    snap.advance(pipe, apply_and_batch(
        [(5, "s5", UUID_A, 102), (6, "s6", UUID_B, 1)]
    ))
    assert any(n["type"] == "CHUNK_REREAD" for n in notif.read())
    assert sorted(i for i, _ in emitted) == [1, 3, 4]  # nothing new

    # batch 3 (stable under B): id 7 changes inside THIS window -> the
    # RE-READ chunk picks up 5/6's new values from the live table and
    # evicts only 7
    snap.advance(pipe, apply_and_batch([(7, "s7", UUID_B, 2)]))
    snap.advance(pipe, apply_and_batch([]).limit(0))  # drain -> complete
    assert not snap.active

    # the re-read observed the moved rows, not the stale first read
    assert ("s5" in dict(emitted).values() or (5, "s5") in emitted)
    assert (6, "s6") in emitted and 7 not in dict(emitted)

    # LWW merge of chunk emissions + streamed changes == the live table's
    # final state (the batch oracle)
    final: dict[int, str] = {}
    for i, v in emitted:
        final.setdefault(i, v)  # chunk rows lose to streamed changes
    for i, v in streamed:
        final[i] = v
    assert final == live
