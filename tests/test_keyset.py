"""Composite/non-numeric key chunking (sources/keyset.py) + the
composite-key incremental snapshotter walk — the r7 VERDICT's #1 missing
capability (reference: AbstractChunkQueryBuilder.java:49-119 multi-column
keyset pagination)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from debezium_spark.sources.keyset import (
    assign_chunks,
    chunk_split_points,
    exact_rank_chunks,
    keyset_gt,
    keyset_range,
)

KEYS = st.tuples(
    st.integers(min_value=0, max_value=3),
    st.text(alphabet="abc", min_size=0, max_size=2),
    st.integers(min_value=0, max_value=3),
)


@settings(max_examples=10, deadline=None)
@given(st.lists(KEYS, min_size=1, max_size=12, unique=True), KEYS)
def test_keyset_gt_matches_tuple_order(spark, rows, bound):
    """The OR-of-ANDs row-value expansion must agree with Python's tuple
    comparison on mixed int/string composite keys, for both > and >=."""
    df = spark.createDataFrame(rows, "a int, b string, c int")
    got_gt = {
        tuple(r)
        for r in df.filter(keyset_gt(["a", "b", "c"], list(bound))).collect()
    }
    assert got_gt == {r for r in rows if r > bound}
    got_ge = {
        tuple(r)
        for r in df.filter(
            keyset_gt(["a", "b", "c"], list(bound), strict=False)
        ).collect()
    }
    assert got_ge == {r for r in rows if r >= bound}


def test_keyset_range_half_open(spark):
    rows = [(i, chr(97 + i % 3)) for i in range(30)]
    df = spark.createDataFrame(rows, "a int, b string")
    got = {
        tuple(r)
        for r in df.filter(
            keyset_range(["a", "b"], [10, "b"], [20, "c"])
        ).collect()
    }
    assert got == {r for r in rows if (10, "b") < r <= (20, "c")}
    # unbounded sides
    assert df.filter(keyset_range(["a", "b"], None, None)).count() == 30


def test_split_points_cover_exactly(spark, sf_dir):
    """Sample-based splits give EXACT coverage: consecutive half-open
    ranges partition the table (every row in exactly one chunk), and
    assign_chunks agrees with per-range reads."""
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    keys = ["c_name", "c_custkey"]
    splits = chunk_split_points(cust, keys, 200)
    assert splits == sorted(splits)
    total = cust.count()
    bounds = [None, *splits, None]
    per_range = [
        cust.filter(keyset_range(keys, lo, hi)).count()
        for lo, hi in zip(bounds[:-1], bounds[1:])
    ]
    assert sum(per_range) == total
    assert all(n > 0 for n in per_range)
    by_chunk = dict(
        (r[0], r[1])
        for r in assign_chunks(cust, keys, splits)
        .groupBy("chunk_id")
        .count()
        .collect()
    )
    assert [by_chunk[i] for i in range(len(per_range))] == per_range


def test_exact_rank_chunks_deterministic_with_ties(spark):
    """Min-rank semantics: duplicated keys land in ONE chunk (overshoot
    <= tie-group size), boundaries match the rank() definition, and two
    invocations agree row-for-row."""
    rows = [(i // 3, f"k{i % 7}") for i in range(200)]  # heavy ties
    df = spark.createDataFrame(rows, "g int, s string")
    out1 = sorted(
        map(tuple, exact_rank_chunks(df, ["g", "s"], 16, n_parts=8).collect())
    )
    out2 = sorted(
        map(tuple, exact_rank_chunks(df, ["g", "s"], 16, n_parts=8).collect())
    )
    assert out1 == out2
    # replicate: chunk = floor((min-rank - 1)/16) under ORDER BY (g, s)
    ordered = sorted(rows)
    first_rank = {}
    for idx, key in enumerate(ordered):
        first_rank.setdefault(key, idx)
    expected = sorted((g, s, first_rank[(g, s)] // 16) for g, s in rows)
    assert out1 == expected


def _mk_source(spark):
    rows = [
        (grp, seq, grp * 100 + seq)
        for grp in range(5)
        for seq in range(1, 21)
    ]
    return spark.createDataFrame(
        [(f"g{g}", s, v) for g, s, v in rows], "grp string, seq int, val int"
    )


class _FakeSink:
    def __init__(self):
        self.batches = []

    def write_batch(self, df, epoch=None):
        self.batches.append([tuple(r) for r in df.select(
            "after.grp", "after.seq", "after.val").collect()])


class _FakePipe:
    def __init__(self):
        self.sink = _FakeSink()


def test_incremental_snapshotter_composite_key_walk(spark, tmp_path):
    """The S3 chunk loop over a COMPOSITE (string, int) key: row-value
    lower bounds advance lexicographically, the dedup window anti-joins
    on both key columns, progress (a JSON list bound) survives a
    restart mid-walk, and the union of chunks is exactly
    source-minus-touched."""
    from debezium_spark.envelope import wrap_snapshot
    from debezium_spark.streaming.signals import IncrementalSnapshotter

    src = _mk_source(spark)
    state = str(tmp_path / "state")

    def build():
        return IncrementalSnapshotter(
            spark,
            source_loader=lambda: src,
            wrap_chunk=lambda df: wrap_snapshot(
                df, ["grp", "seq"], db="d", table="t"
            ),
            pk_col=["grp", "seq"],
            state_dir=state,
            chunk_size=16,
            table="t",
        )

    snap = build()
    # Mark every g1 row as already streamed (touched): the dedup window
    # must drop them from chunk emissions — on BOTH key columns, so
    # (g1, 5) is excluded but (g0, 5) is not.
    touched = src.filter(F.col("grp") == "g1").select(
        F.lit("u").alias("op"),
        F.struct(F.lit("t").alias("table")).alias("source"),
        F.struct(F.col("grp"), F.col("seq")).alias("key"),
    )
    snap.begin(["d.t"])
    pipe = _FakePipe()
    snap.advance(pipe, touched)  # records touched keys + first chunk
    mid_bound = snap._progress()["bound"]
    assert isinstance(mid_bound, list) and len(mid_bound) == 2

    # Restart mid-walk: a fresh instance on the same state dir resumes
    # from the persisted composite bound.
    snap = build()
    empty = touched.limit(0)
    while snap.active:
        snap.advance(pipe, empty)

    emitted = sorted(t for b in pipe.sink.batches for t in b)
    expected = sorted(
        (r["grp"], r["seq"], r["val"])
        for r in src.filter(F.col("grp") != "g1").collect()
    )
    assert emitted == expected
    assert all(len(b) <= 16 for b in pipe.sink.batches)
    # chunk key ranges are disjoint and lexicographically increasing
    maxes = [max((g, s) for g, s, _ in b) for b in pipe.sink.batches if b]
    mins = [min((g, s) for g, s, _ in b) for b in pipe.sink.batches if b]
    for prev_max, nxt_min in zip(maxes, mins[1:]):
        assert prev_max < nxt_min


def test_keyset_gt_arity_mismatch():
    with pytest.raises(ValueError):
        keyset_gt(["a", "b"], [1])


def test_jdbc_chunk_predicates_render_and_partition(spark):
    """The rendered SQL fragments must partition rows exactly like the
    Column predicates (checked by filtering with F.expr on each fragment)
    and escape embedded quotes in string keys."""
    from debezium_spark.sources.keyset import jdbc_chunk_predicates

    rows = [(i % 7, f"nm'{i}") for i in range(40)]
    df = spark.createDataFrame(rows, "a int, b string")
    splits = [(2, "nm'10"), (4, "nm'30")]
    preds = jdbc_chunk_predicates(["a", "b"], splits)
    assert len(preds) == 3
    counts = [df.filter(F.expr(p)).count() for p in preds]
    assert sum(counts) == 40 and all(c > 0 for c in counts)
    # no-splits degenerate case: one full-table predicate
    assert jdbc_chunk_predicates(["a"], []) == ["1 = 1"]


def test_decimal_bound_roundtrips_exactly(spark):
    """A decimal(20,0) PK bound (the BIGINT UNSIGNED mapping) must resume
    exactly: the persisted JSON string is rebuilt as a Decimal literal so
    the keyset predicate compares decimal-to-decimal. A raw string literal
    would coerce both sides to double and lose precision above 2^53."""
    from decimal import Decimal

    from debezium_spark.streaming.signals import _json_key, _typed_bound

    base = Decimal(2**63)  # far above double's 2^53 integer precision
    vals = [base + i for i in range(4)]
    df = spark.createDataFrame(
        [(v,) for v in vals], "pk decimal(20,0)"
    )
    persisted = [_json_key(vals[1])]
    assert persisted == [str(vals[1])]  # JSON-safe digit string
    typed = _typed_bound(df.schema, ["pk"], persisted)
    assert typed == [vals[1]] and isinstance(typed[0], Decimal)
    got = sorted(
        r["pk"] for r in df.filter(keyset_gt(["pk"], typed)).collect()
    )
    assert got == vals[2:]  # exact: adjacent +1/+2 survive, bound doesn't
