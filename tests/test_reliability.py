"""P5 heartbeats, P10 guardrails, P11 retry loop, S10 polling offsets."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from debezium_spark.sources.changefeed import accounts_changefeed
from debezium_spark.sources.polling import PollingSource
from debezium_spark.streaming import (
    GuardrailViolation,
    Heartbeat,
    RetriableError,
    run_with_retries,
    validate_guardrails,
)


def test_heartbeat_emits_on_quiet_and_respects_interval(tmp_path):
    hb = Heartbeat(str(tmp_path / "hb" / "heartbeat.jsonl"), interval_ms=0)
    assert hb.maybe_emit(pos=41, rows_in_batch=0)
    hb.interval_ms = 10**9  # effectively never again
    assert not hb.maybe_emit(pos=42, rows_in_batch=5)
    recs = hb.read()
    assert len(recs) == 1 and recs[0]["pos"] == 41


def test_heartbeat_advances_through_pipeline(spark, sf_dir, tmp_path):
    from debezium_spark.sinks.merge import ParquetMergeSink
    from debezium_spark.streaming import ChangeDataPipeline, replay_feed

    env = accounts_changefeed(spark, sf_dir)
    hb = Heartbeat(str(tmp_path / "hb.jsonl"), interval_ms=0)
    sink = ParquetMergeSink(spark, str(tmp_path / "t"), ["id"], num_buckets=4)
    pipe = ChangeDataPipeline(
        spark,
        feed_dir=str(tmp_path / "feed"),
        envelope_schema=env.schema,
        sink=sink,
        checkpoint_dir=str(tmp_path / "ckpt"),
        heartbeat=hb,
        max_files_per_trigger=None,
    )
    replay_feed(env, str(tmp_path / "feed"), num_chunks=1)
    pipe.run_available()
    recs = hb.read()
    assert recs and recs[-1]["pos"] == env.agg(F.max("source.pos")).collect()[0][0]


def test_guardrails():
    ok = validate_guardrails(["a", "b"], max_collections=2)
    assert ok == ["a", "b"]
    with pytest.raises(GuardrailViolation):
        validate_guardrails(["a", "b", "c"], max_collections=2)
    warnings = []
    validate_guardrails(
        ["a", "b", "c"], max_collections=2, mode="warn", warn=warnings.append
    )
    assert len(warnings) == 1


def test_retry_loop_retries_then_succeeds_and_propagates_fatal():
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise RetriableError("transient")

    used = run_with_retries(flaky, max_retries=5, backoff_initial_ms=1)
    assert used == 2 and calls["n"] == 3

    with pytest.raises(ValueError):
        run_with_retries(
            lambda: (_ for _ in ()).throw(ValueError("fatal")),
            max_retries=5,
            backoff_initial_ms=1,
        )

    with pytest.raises(RetriableError):
        run_with_retries(
            lambda: (_ for _ in ()).throw(RetriableError("always")),
            max_retries=2,
            backoff_initial_ms=1,
        )


def test_polling_source_windows_and_offsets(spark, sf_dir, tmp_path):
    from debezium_spark.sources.changefeed import _events

    src = PollingSource(
        lambda: _events(spark, sf_dir),
        "event_id",
        str(tmp_path / "state"),
        max_window=400,
    )
    total = 0
    polls = 0
    while (batch := src.poll()) is not None:
        n = batch.count()
        assert n <= 400
        total += n
        polls += 1
        src.commit()
    expected = _events(spark, sf_dir).count()
    assert total == expected
    assert polls >= expected // 400
    # Caught up: further polls are empty; offset survives a "restart".
    assert src.poll() is None
    src2 = PollingSource(
        lambda: _events(spark, sf_dir), "event_id", str(tmp_path / "state")
    )
    assert src2.poll() is None


def test_polling_uncommitted_window_redelivers(spark, sf_dir, tmp_path):
    """At-least-once: a crash after poll() but before delivery must NOT
    advance the offset — the same window is re-returned on restart
    (BaseSourceTask.commit runs after delivery, never before)."""
    from debezium_spark.sources.changefeed import _events

    src = PollingSource(
        lambda: _events(spark, sf_dir),
        "event_id",
        str(tmp_path / "state2"),
        max_window=100,
    )
    first = src.poll()
    ids1 = sorted(r.event_id for r in first.select("event_id").collect())
    # no commit — simulate crash before the sink write; "restart":
    src2 = PollingSource(
        lambda: _events(spark, sf_dir),
        "event_id",
        str(tmp_path / "state2"),
        max_window=100,
    )
    again = src2.poll()
    ids2 = sorted(r.event_id for r in again.select("event_id").collect())
    assert ids1 == ids2
    src2.commit()
    nxt = src2.poll()
    ids3 = sorted(r.event_id for r in nxt.select("event_id").collect())
    assert ids3[0] > ids2[-1]

def test_heartbeat_works_with_unwrap_transform_chain(spark, sf_dir, tmp_path):
    """Regression: the heartbeat position is aggregated over the RAW
    envelope batch — an unwrap SMT in the transform chain drops the source
    struct, which used to make every micro-batch fail with
    AnalysisException when a heartbeat was enabled."""
    from debezium_spark.operators.unwrap import extract_new_record_state
    from debezium_spark.streaming import ChangeDataPipeline, replay_feed

    env = accounts_changefeed(spark, sf_dir)
    hb = Heartbeat(str(tmp_path / "hb.jsonl"), interval_ms=0)

    class FlatSink:
        def __init__(self):
            self.rows = 0

        def write_batch(self, df, epoch_id=None):
            self.rows += df.count()

    sink = FlatSink()
    pipe = ChangeDataPipeline(
        spark,
        feed_dir=str(tmp_path / "feed"),
        envelope_schema=env.schema,
        sink=sink,
        checkpoint_dir=str(tmp_path / "ckpt"),
        transforms=[lambda df: extract_new_record_state(df, delete_handling="drop")],
        heartbeat=hb,
        max_files_per_trigger=None,
    )
    replay_feed(env, str(tmp_path / "feed"), num_chunks=1)
    pipe.run_available()
    recs = hb.read()
    assert recs and recs[-1]["pos"] == env.agg(F.max("source.pos")).collect()[0][0]
    assert sink.rows > 0


# ---------------------------------------------------------------------------
# bench quarantine rule (VERDICT r10 Wrong #2): noisy-accepted legs whose
# median jumped >2x their previous committed value drop out of the
# headline; real regressions (no noise evidence) stay in and hurt.
# ---------------------------------------------------------------------------
def test_bench_quarantine_noisy_legs():
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(os.path.dirname(__file__), "..", "bench.py")
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    timings = {
        "w2": 1.24,   # >2x previous, WAS requeued -> quarantine
        "x6": 1.50,   # >2x previous, NO noise evidence -> real regression
        "a2": 0.60,   # noisy but within 2x -> keep
        "new": 0.40,  # no previous committed value -> keep
    }
    previous = {"w2": 0.55, "x6": 0.70, "a2": 0.45}
    evidence = {"w2", "a2"}

    kept, total_all, quarantined = bench.quarantine_noisy_legs(
        timings, previous, evidence
    )
    assert quarantined == ["w2"]
    assert total_all == pytest.approx(3.74)
    assert kept == pytest.approx(2.50)

    # no previous payload at all: nothing quarantined, totals equal
    k2, a2, q2 = bench.quarantine_noisy_legs(timings, {}, evidence)
    assert q2 == [] and k2 == a2


def test_capture_instance_migration_no_double_emit(spark):
    """The stop-LSN rule: the OLD capture instance keeps capturing past
    the new instance's start (real SQL Server overlap) but those rows
    must come from the NEW instance only; renamed columns align by name
    with typed NULLs on the other side
    (SqlServerStreamingChangeEventSource.java:465-536,315-321)."""
    import pytest
    from pyspark.sql import functions as F

    from debezium_spark.sources.polling import migrate_capture_instances

    v1 = spark.createDataFrame(
        [(1, 1, "a"), (2, 2, "b"), (5, 5, "E-OLD"), (6, 6, "F-OLD")],
        "start_lsn long, id long, status string",
    )
    v2 = spark.createDataFrame(
        [(5, 5, "E", "t1"), (6, 6, "F", "t2")],
        "start_lsn long, id long, state string, tier string",
    )
    merged = migrate_capture_instances([(1, v1), (5, v2)])
    rows = {r["start_lsn"]: r for r in merged.collect()}
    assert sorted(rows) == [1, 2, 5, 6]          # no duplicates
    assert rows[2]["status"] == "b" and rows[2]["state"] is None
    assert rows[5]["state"] == "E" and rows[5]["status"] is None
    assert rows[6]["tier"] == "t2"

    # instance order is by start LSN, not list order
    swapped = migrate_capture_instances([(5, v2), (1, v1)])
    assert sorted(
        r["start_lsn"] for r in swapped.collect()
    ) == [1, 2, 5, 6]

    with pytest.raises(ValueError, match="distinct start"):
        migrate_capture_instances([(1, v1), (1, v2)])
    with pytest.raises(ValueError, match="no capture instances"):
        migrate_capture_instances([])
