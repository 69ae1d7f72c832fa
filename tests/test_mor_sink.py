"""LogMergeSink (merge-on-read) semantics: equivalence with the
copy-on-write MERGE, replay idempotence, compaction, and truncate handling.
The sink contract under test is still JdbcChangeEventSink.java:89-186 —
only the materialization strategy differs.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from debezium_spark.sinks.mor import LogMergeSink
from debezium_spark.sources.changefeed import accounts_changefeed, accounts_snapshot
from debezium_spark.streaming import ChangeDataPipeline, replay_feed

from tests.test_merge_edges import _mk_event


def _state(sink):
    return sorted(
        (r.id, r.status, r.balance)
        for r in sink.read().select("id", "status", "balance").collect()
    )


def _expected_final(spark, sf_dir):
    from debezium_spark.suite import load_all

    qs = load_all()
    return sorted(
        (r.id, r.status, r.balance)
        for r in qs["k1_merge_upsert"].fn(spark, sf_dir).collect()
    )


def test_mor_pipeline_matches_batch_merge(spark, sf_dir, tmp_path):
    """Snapshot + chunked stream through the MOR sink == one-shot batch
    MERGE (the k1 golden), including read-time delete/last-wins merging."""
    env = accounts_changefeed(spark, sf_dir)
    sink = LogMergeSink(spark, str(tmp_path / "t"), ["id"], compact_every=3)
    pipe = ChangeDataPipeline(
        spark,
        feed_dir=str(tmp_path / "feed"),
        envelope_schema=env.schema,
        sink=sink,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    pipe.run_snapshot(accounts_snapshot(spark, sf_dir))
    replay_feed(env, str(tmp_path / "feed"), num_chunks=4)
    pipe.run_available()
    assert _state(sink) == _expected_final(spark, sf_dir)


def test_mor_replay_idempotent(spark, sf_dir, tmp_path):
    """Re-delivery of a checkpointed epoch (crash between sink write and
    offset commit) rewrites the identical delta — state unchanged."""
    env = accounts_changefeed(spark, sf_dir)
    sink = LogMergeSink(spark, str(tmp_path / "t"), ["id"], compact_every=0)
    sink.write_batch(_mk_event(env, key_id=1, op="c", pos=1, status="a"), 0)
    batch2 = _mk_event(env, key_id=1, op="u", pos=2, status="b").unionByName(
        _mk_event(env, key_id=2, op="c", pos=3, status="x")
    )
    sink.write_batch(batch2, 1)
    before = _state(sink)
    sink.write_batch(batch2, 1)  # replay
    assert _state(sink) == before
    assert {r.id: r.status for r in sink.read().collect()} == {1: "b", 2: "x"}


def test_mor_compaction_preserves_state_and_prunes_dirs(spark, sf_dir, tmp_path):
    env = accounts_changefeed(spark, sf_dir)
    path = str(tmp_path / "t")
    sink = LogMergeSink(spark, path, ["id"], compact_every=0)
    sink.write_batch(_mk_event(env, key_id=1, op="c", pos=1, status="a"), 0)
    sink.write_batch(_mk_event(env, key_id=2, op="c", pos=2, status="b"), 1)
    sink.write_batch(_mk_event(env, key_id=1, op="d", pos=3), 2)
    before = _state(sink)
    sink.compact()
    assert _state(sink) == before
    assert os.path.isdir(os.path.join(path, "base-2"))
    assert sink._delta_epochs() == []
    # post-compaction batches keep merging on top of the new base
    sink.write_batch(_mk_event(env, key_id=2, op="u", pos=4, status="c"), 3)
    assert {r.id: r.status for r in sink.read().collect()} == {2: "c"}


def test_mor_truncate_drops_prior_epochs(spark, sf_dir, tmp_path):
    """A truncate marker kills base + earlier deltas at read time; events
    after the truncate in the same batch survive (apply_truncates)."""
    env = accounts_changefeed(spark, sf_dir)
    sink = LogMergeSink(spark, str(tmp_path / "t"), ["id"], compact_every=0)
    sink.write_batch(_mk_event(env, key_id=1, op="c", pos=1, status="old"), 0)
    sink.write_batch(_mk_event(env, key_id=2, op="c", pos=2, status="old"), 1)
    trunc_batch = _mk_event(env, key_id=0, op="t", pos=10).unionByName(
        _mk_event(env, key_id=3, op="c", pos=11, status="fresh")
    )
    sink.write_batch(trunc_batch, 2)
    assert {r.id: r.status for r in sink.read().collect()} == {3: "fresh"}
    # compaction folds the truncate away; state identical after
    sink.compact()
    assert {r.id: r.status for r in sink.read().collect()} == {3: "fresh"}


def test_mor_rejects_non_upsert_modes(spark, tmp_path):
    with pytest.raises(ValueError):
        LogMergeSink(spark, str(tmp_path / "t"), ["id"], insert_mode="insert")


def test_mor_schema_evolution_union(spark, sf_dir, tmp_path):
    """A delta carrying a new column merges: old rows read NULL for it."""
    env = accounts_changefeed(spark, sf_dir)
    sink = LogMergeSink(spark, str(tmp_path / "t"), ["id"], compact_every=0)
    sink.write_batch(_mk_event(env, key_id=1, op="c", pos=1, status="a"), 0)
    evolved = _mk_event(env, key_id=2, op="c", pos=2, status="b").select(
        F.col("key"),
        F.col("before").withField("tier", F.lit(None).cast("string")).alias("before"),
        F.col("after").withField("tier", F.lit("vip")).alias("after"),
        "op",
        "source",
        "transaction",
        "ts_ms",
    )
    sink.write_batch(evolved, 1)
    rows = {r.id: (r.status, r.tier) for r in sink.read().collect()}
    assert rows == {1: ("a", None), 2: ("b", "vip")}


def test_mor_time_travel_and_changelog(spark, sf_dir, tmp_path):
    """read(as_of_epoch=N) reconstructs historical state; changes_since(N)
    exposes the reduced per-epoch change stream (CDC out of the sink)."""
    env = accounts_changefeed(spark, sf_dir)
    sink = LogMergeSink(spark, str(tmp_path / "t"), ["id"], compact_every=0)
    sink.write_batch(_mk_event(env, key_id=1, op="c", pos=1, status="v1"), 0)
    sink.write_batch(_mk_event(env, key_id=1, op="u", pos=2, status="v2"), 1)
    sink.write_batch(_mk_event(env, key_id=1, op="d", pos=3), 2)

    assert {r.id: r.status for r in sink.read(as_of_epoch=0).collect()} == {1: "v1"}
    assert {r.id: r.status for r in sink.read(as_of_epoch=1).collect()} == {1: "v2"}
    assert sink.read(as_of_epoch=2).count() == 0

    ch = sink.changes_since(0).orderBy("__epoch").collect()
    assert [(r["__epoch"], r["status"], r["__deleted"]) for r in ch] == [
        (1, "v2", False),
        # the fixture's delete carries a skinny before-image (id only)
        (2, None, True),
    ]

    # after compaction, history below the marker is correctly refused
    sink.compact()
    import pytest as _pytest

    with _pytest.raises(ValueError):
        sink.read(as_of_epoch=0)
    with _pytest.raises(ValueError):
        sink.changes_since(0)


def test_mor_crash_mid_compaction_leaves_valid_state(spark, sf_dir, tmp_path):
    """Compaction order is write-base -> flip-marker -> delete-old. A crash
    after the base write but before the marker flip leaves an orphan
    base-<E> dir; reads still serve old-base + all deltas (unchanged
    state), and the next compaction garbage-collects the orphan."""
    import os

    env = accounts_changefeed(spark, sf_dir)
    path = str(tmp_path / "t")
    sink = LogMergeSink(spark, path, ["id"], compact_every=0)
    sink.write_batch(_mk_event(env, key_id=1, op="c", pos=1, status="a"), 0)
    sink.write_batch(_mk_event(env, key_id=2, op="c", pos=2, status="b"), 1)
    before = _state(sink)

    # Simulated crash: the new base exists, the marker was never flipped.
    sink.read().write.mode("overwrite").parquet(os.path.join(path, "base-1"))
    assert sink._marker_epoch() is None
    assert _state(sink) == before  # orphan base is invisible

    sink.write_batch(_mk_event(env, key_id=1, op="u", pos=3, status="c"), 2)
    sink.compact()  # completes normally, GCs the orphan
    assert os.path.isdir(os.path.join(path, "base-2"))
    assert not os.path.isdir(os.path.join(path, "base-1"))
    assert {r.id: r.status for r in sink.read().collect()} == {1: "c", 2: "b"}


def test_oob_writes_get_distinct_epochs(spark, sf_dir, tmp_path):
    """Regression: epochless writes (snapshot chunks) must each land in a
    fresh negative epoch — the old fixed epoch=-1 made every chunk
    overwrite the previous one, so only the last chunk survived."""
    env = accounts_changefeed(spark, sf_dir)
    sink = LogMergeSink(spark, str(tmp_path / "t"), ["id"], compact_every=0)
    sink.write_batch(_mk_event(env, key_id=1, op="c", pos=1, status="c1"))
    sink.write_batch(_mk_event(env, key_id=2, op="c", pos=2, status="c2"))
    sink.write_batch(_mk_event(env, key_id=3, op="c", pos=3, status="c3"))
    assert {r.id: r.status for r in sink.read().collect()} == {
        1: "c1", 2: "c2", 3: "c3",
    }
    assert sorted(e for e in sink._delta_epochs()) == [-3, -2, -1]


def test_snapshot_chunks_survive_compaction(spark, sf_dir, tmp_path):
    """Chunks written before a compaction are folded into the base; chunks
    written after stay visible via the marker's neg_floor — the old
    ``e > marker`` filter made every post-compaction negative delta
    silently invisible."""
    env = accounts_changefeed(spark, sf_dir)
    sink = LogMergeSink(spark, str(tmp_path / "t"), ["id"], compact_every=0)
    sink.write_batch(_mk_event(env, key_id=1, op="c", pos=1, status="chunk1"))
    sink.write_batch(_mk_event(env, key_id=10, op="c", pos=2, status="s0"), 0)
    sink.write_batch(_mk_event(env, key_id=11, op="c", pos=3, status="s1"), 1)
    sink.compact()
    # post-compaction chunk (e.g. a blocking snapshot mid-stream)
    sink.write_batch(_mk_event(env, key_id=2, op="c", pos=4, status="chunk2"))
    sink.write_batch(_mk_event(env, key_id=12, op="c", pos=5, status="s2"), 2)
    got = {r.id: r.status for r in sink.read().collect()}
    assert got == {1: "chunk1", 2: "chunk2", 10: "s0", 11: "s1", 12: "s2"}
    # stream row wins over a chunk row for the same key (DBLog contract)
    sink.write_batch(_mk_event(env, key_id=2, op="u", pos=6, status="newer"), 3)
    assert {r.id: r.status for r in sink.read().collect()}[2] == "newer"


def test_write_to_folded_epoch_raises(spark, sf_dir, tmp_path):
    env = accounts_changefeed(spark, sf_dir)
    sink = LogMergeSink(spark, str(tmp_path / "t"), ["id"], compact_every=0)
    sink.write_batch(_mk_event(env, key_id=1, op="c", pos=1, status="a"), 0)
    sink.write_batch(_mk_event(env, key_id=2, op="c", pos=2, status="b"), 1)
    sink.compact()
    with pytest.raises(ValueError, match="folded"):
        sink.write_batch(_mk_event(env, key_id=3, op="c", pos=3), 0)


def test_incremental_snapshot_chunks_into_mor_sink(spark, sf_dir, tmp_path):
    """End-to-end: the chunked incremental snapshotter paired with the MOR
    sink — every chunk must survive (ADVICE r2: chunks used to clobber each
    other at epoch -1 and vanish after compaction)."""
    from debezium_spark.streaming.signals import IncrementalSnapshotter

    env = accounts_changefeed(spark, sf_dir)
    sink = LogMergeSink(spark, str(tmp_path / "t"), ["id"], compact_every=0)
    pipe = ChangeDataPipeline(
        spark,
        feed_dir=str(tmp_path / "feed"),
        envelope_schema=env.schema,
        sink=sink,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    from debezium_spark.envelope import wrap_snapshot

    src = (
        spark.read.parquet(f"{sf_dir}/customer.parquet")
        .select(
            F.col("c_custkey").alias("id"),
            F.col("c_mktsegment").alias("status"),
            F.col("c_acctbal").alias("balance"),
        )
        .limit(50)
        .localCheckpoint(eager=True)
    )

    snap = IncrementalSnapshotter(
        spark,
        source_loader=lambda: src,
        wrap_chunk=lambda df: wrap_snapshot(df, ["id"], table="accounts"),
        pk_col="id",
        state_dir=str(tmp_path / "state"),
        chunk_size=20,
    )
    snap.begin(["accounts"])
    empty = env.limit(0)
    for _ in range(5):
        if not snap.active:
            break
        snap.advance(pipe, empty)
    assert not snap.active
    got = sorted(r.id for r in sink.read().collect())
    assert got == sorted(r.id for r in src.collect())


def test_mor_inline_delta_equals_distributed_delta(spark, sf_dir, tmp_path):
    """The inline (driver-pyarrow-written) delta must be byte-equivalent in
    CONTENT to the distributed _delta_frame plan: same reduced survivors,
    same columns, and the merged read over mixed-provenance deltas (inline
    epochs beside Spark-written epochs) must agree with an all-distributed
    sink."""
    env = accounts_changefeed(spark, sf_dir).limit(4000).localCheckpoint()
    half1 = env.filter(F.col("source.pos") % 2 == 0)
    half2 = env.filter(F.col("source.pos") % 2 == 1)

    inline = LogMergeSink(spark, str(tmp_path / "a"), ["id"],
                          compact_every=0)
    distributed = LogMergeSink(spark, str(tmp_path / "b"), ["id"],
                               compact_every=0, inline_max_rows=0)
    # epoch 0 inline, epoch 1 distributed (mixed provenance) on sink a;
    # both distributed on sink b
    inline.write_batch(half1, epoch_id=0)
    inline.inline_max_rows = 0
    inline.write_batch(half2, epoch_id=1)
    distributed.write_batch(half1, epoch_id=0)
    distributed.write_batch(half2, epoch_id=1)

    # epoch 0 of sink a was written by the driver (single pyarrow file)
    files_a0 = os.listdir(str(tmp_path / "a" / "delta" / "epoch=0"))
    assert any("inline" in f for f in files_a0)

    # per-delta content parity (epoch 0: inline vs distributed)
    read = lambda p: sorted(
        map(tuple, spark.read.parquet(str(p)).collect())
    )
    assert read(tmp_path / "a" / "delta" / "epoch=0") == read(
        tmp_path / "b" / "delta" / "epoch=0"
    )
    # merged-state parity across mixed provenance
    assert _state(inline) == _state(distributed)
