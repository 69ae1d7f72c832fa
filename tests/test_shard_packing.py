"""Goldens for shard_payloads (analytics/multimodal.py) — the WebDataset-
style shard planner. Mirrors the docstring contract: NULL byte counts are
excluded, placement is deterministic across reruns, offsets reconstruct each
stream's concatenated layout exactly, and a shard overshoots the byte budget
by at most one payload."""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from debezium_spark.analytics.multimodal import shard_payloads


def _plan(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id long, n_bytes long")
    return shard_payloads(df, **kw).collect()


def test_null_rows_excluded_and_all_others_placed(spark):
    rows = [(i, 100 + i) for i in range(20)] + [(99, None), (98, None)]
    out = _plan(spark, rows, budget=512, streams=3)
    ids = {r["doc_id"] for r in out}
    assert 99 not in ids and 98 not in ids
    assert ids == set(range(20))


def test_deterministic_across_reruns(spark):
    rows = [(i, 50 + (i * 13) % 200) for i in range(64)]
    a = sorted(map(tuple, _plan(spark, rows, budget=1024, streams=4)))
    b = sorted(map(tuple, _plan(spark, rows, budget=1024, streams=4)))
    assert a == b


def test_offsets_reconstruct_stream_layout_and_overshoot_bounded(spark):
    budget = 1000
    rows = [(i, 100 + (i * 37) % 400) for i in range(80)]
    out = _plan(spark, rows, budget=budget, streams=4)

    by_stream = defaultdict(list)
    for r in out:
        by_stream[r["stream"]].append(r)

    for stream, recs in by_stream.items():
        # Reconstruct the concatenated layout: cumulative byte position of
        # each record must equal shard*budget + offset (the planner's
        # invariant), shards must number contiguously from 0, and each
        # shard's size may exceed the budget by at most its last payload.
        recs.sort(key=lambda r: r["shard"] * budget + r["offset"])
        cum = 0
        shard_bytes = defaultdict(int)
        for r in recs:
            assert r["shard"] * budget + r["offset"] == cum, r
            assert 0 <= r["offset"] < budget
            shard_bytes[r["shard"]] += r["n_bytes"]
            cum += r["n_bytes"]
        shards = sorted(shard_bytes)
        assert shards == list(range(len(shards)))
        for s in shards:
            # overshoot <= one payload: size - budget < max payload in shard
            over = shard_bytes[s] - budget
            if over > 0:
                assert over < max(
                    r["n_bytes"] for r in recs if r["shard"] == s
                )


def test_single_stream_total_bytes(spark):
    rows = [(i, 10) for i in range(10)]
    out = _plan(spark, rows, budget=35, streams=1)
    # 10 equal-size records, budget 35 -> first bytes at 10k for k=0..9
    # regardless of the (hash-deterministic) record order, so the SET of
    # (shard, offset) pairs is fixed: shard = floor(10k/35), offset = 10k%35.
    got = sorted((r["shard"], r["offset"]) for r in out)
    want = sorted((10 * k // 35, 10 * k % 35) for k in range(10))
    assert got == want
