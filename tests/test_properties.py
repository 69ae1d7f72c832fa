"""Property-based tests (hypothesis) for the MERGE semantics core.

The invariants every Debezium-compatible sink must hold (SURVEY §7.3,
JdbcChangeEventSink.java:89-186 flush rules):

1. Applying a batch of envelopes == folding them one-by-one into a dict
   (last-write-wins by position, delete removes, truncate clears).
2. Incremental delivery (any pos-respecting split into micro-batches)
   produces the same final state as one-shot delivery.
3. The copy-on-write and merge-on-read sinks agree with each other and
   with the model for every delivery schedule.

Examples are kept small (Spark jobs per example) but hypothesis explores
the op/key interleavings that hand-written goldens miss.
"""

from __future__ import annotations

import pyspark.sql.types as T
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from debezium_spark.sinks.merge import ParquetMergeSink, merge_changes
from debezium_spark.sinks.mor import LogMergeSink

KEYS = [1, 2, 3]

ENV_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StructType([T.StructField("id", T.LongType())])),
        T.StructField(
            "before",
            T.StructType(
                [
                    T.StructField("id", T.LongType()),
                    T.StructField("status", T.StringType()),
                    T.StructField("balance", T.DoubleType()),
                ]
            ),
        ),
        T.StructField(
            "after",
            T.StructType(
                [
                    T.StructField("id", T.LongType()),
                    T.StructField("status", T.StringType()),
                    T.StructField("balance", T.DoubleType()),
                ]
            ),
        ),
        T.StructField("op", T.StringType()),
        T.StructField(
            "source",
            T.StructType(
                [
                    T.StructField("table", T.StringType()),
                    T.StructField("pos", T.LongType()),
                ]
            ),
        ),
    ]
)


# One event: (op, key, status, balance). op None = tombstone (no state).
_event = st.tuples(
    st.sampled_from(["c", "u", "d", "t", None]),
    st.sampled_from(KEYS),
    st.sampled_from(["a", "b", "c"]),
    st.integers(min_value=0, max_value=9),
)
_events = st.lists(_event, min_size=1, max_size=12)
# Split points for micro-batching (consecutive, pos-respecting slices).
_splits = st.lists(st.integers(min_value=1, max_value=11), max_size=2)


def _rows(events):
    rows = []
    for pos, (op, k, status, bal) in enumerate(events, start=1):
        state = (k, status, float(bal))
        if op in ("c", "u"):
            before, after = None, state
        elif op == "d":
            before, after = state, None
        else:  # 't' marker or tombstone
            before, after = None, None
        rows.append(
            ((k,), before, after, op, ("accounts", pos))
        )
    return rows


def _env_df(spark, events):
    return spark.createDataFrame(_rows(events), ENV_SCHEMA)


def _model(events):
    state = {}
    for op, k, status, bal in events:  # already in pos order
        if op is None:
            continue
        if op == "t":
            state.clear()
        elif op == "d":
            state.pop(k, None)
        else:
            state[k] = (status, float(bal))
    return sorted((k, s, b) for k, (s, b) in state.items())


def _batches(events, splits):
    cuts = sorted({s for s in splits if s < len(events)})
    out, prev = [], 0
    for c in [*cuts, len(events)]:
        if c > prev:
            out.append(events[prev:c])
            prev = c
    return out


def _empty_target(spark):
    return spark.createDataFrame(
        [],
        T.StructType(
            [
                T.StructField("id", T.LongType()),
                T.StructField("status", T.StringType()),
                T.StructField("balance", T.DoubleType()),
            ]
        ),
    )


def _collect(df):
    return sorted((r.id, r.status, r.balance) for r in df.collect())


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(events=_events)
def test_one_shot_merge_matches_model(spark, events):
    merged = merge_changes(_empty_target(spark), _env_df(spark, events), ["id"])
    assert _collect(merged) == _model(events)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(events=_events, splits=_splits)
def test_incremental_delivery_matches_one_shot(spark, events, splits):
    state = _empty_target(spark)
    for batch in _batches(events, splits):
        state = merge_changes(state, _env_df(spark, batch), ["id"])
        state = state.localCheckpoint(eager=True)  # batch boundary
    one_shot = merge_changes(_empty_target(spark), _env_df(spark, events), ["id"])
    assert _collect(state) == _collect(one_shot) == _model(events)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(events=_events, splits=_splits)
def test_cow_and_mor_sinks_agree_with_model(spark, events, splits, tmp_path_factory):
    base = tmp_path_factory.mktemp("prop")
    # Default cow takes the INLINE micro-batch path; cow_dist forces the
    # fully distributed plan — both must agree with the model (and thus
    # with each other) on every op interleaving hypothesis finds.
    cow = ParquetMergeSink(spark, str(base / "cow"), ["id"], num_buckets=4)
    cow_dist = ParquetMergeSink(
        spark, str(base / "cowd"), ["id"], num_buckets=4, inline_max_rows=0
    )
    mor = LogMergeSink(spark, str(base / "mor"), ["id"], compact_every=2)
    for i, batch in enumerate(_batches(events, splits)):
        env = _env_df(spark, batch)
        cow.write_batch(env, i)
        cow_dist.write_batch(env, i)
        mor.write_batch(env, i)
    expected = _model(events)
    for sink in (cow, cow_dist, mor):
        # An empty model still defines a schema (at least one write above).
        assert (
            _collect(sink.read().select("id", "status", "balance")) == expected
        )


# --- position-collision tie-break ------------------------------------------
# Two sources replaying into one feed (or a synthetic fixture) can emit
# events with EQUAL source.pos for the same key. The reduction must then be
# deterministic and identical across the inline and distributed paths: ties
# break on (ts_ns, op) descending, nulls smallest.

ENV_TS_SCHEMA = T.StructType([*ENV_SCHEMA.fields, T.StructField("ts_ns", T.LongType())])


def _ts_rows(events):
    rows = []
    for ts, (op, k, status, bal, pos) in enumerate(events, start=1):
        state = (k, status, float(bal))
        before, after = (state, None) if op == "d" else (None, state)
        rows.append(((k,), before, after, op, ("accounts", pos), ts))
    return rows


def _ts_model(events):
    # winner per key = max (pos, ts_ns); ts_ns is the enumeration index.
    best = {}
    for ts, (op, k, status, bal, pos) in enumerate(events, start=1):
        cur = best.get(k)
        if cur is None or (pos, ts) >= (cur[0], cur[1]):
            best[k] = (pos, ts, op, status, float(bal))
    return sorted(
        (k, s, b) for k, (_p, _t, op, s, b) in best.items() if op != "d"
    )


_colliding_event = st.tuples(
    st.sampled_from(["c", "u", "d"]),
    st.sampled_from(KEYS),
    st.sampled_from(["a", "b", "c"]),
    st.integers(min_value=0, max_value=9),
    st.sampled_from([1, 2]),  # only two positions -> collisions guaranteed
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(events=st.lists(_colliding_event, min_size=2, max_size=8))
def test_colliding_positions_tiebreak_deterministically(
    spark, events, tmp_path_factory
):
    from debezium_spark.operators.reduce import reduce_last_per_key

    env = spark.createDataFrame(_ts_rows(events), ENV_TS_SCHEMA)
    expected = _ts_model(events)

    # Distributed K4 window
    red = reduce_last_per_key(env)
    got = sorted(
        (r["key"]["id"], r["after"]["status"], r["after"]["balance"])
        for r in red.collect()
        if r["op"] != "d"
    )
    assert got == expected

    # Inline vs distributed COW merge paths agree on the same batch
    base = tmp_path_factory.mktemp("ties")
    inline = ParquetMergeSink(spark, str(base / "i"), ["id"], num_buckets=4)
    dist = ParquetMergeSink(
        spark, str(base / "d"), ["id"], num_buckets=4, inline_max_rows=0
    )
    for sink in (inline, dist):
        sink.write_batch(env, 0)
    assert (
        _collect(inline.read().select("id", "status", "balance"))
        == _collect(dist.read().select("id", "status", "balance"))
        == expected
    )


# ---------------------------------------------------------------------------
# Line-dedup invariants (x31/x32) — hypothesis over arbitrary line layouts
# ---------------------------------------------------------------------------
_LINE = st.sampled_from(["alpha", "beta", "gamma", "delta", "epsilon"])
_DOC = st.lists(_LINE, min_size=1, max_size=6).map("\n".join)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(_DOC, min_size=1, max_size=5))
def test_dedupe_lines_idempotent_and_conserving(spark, docs):
    """dedupe_lines is idempotent (cleaning twice changes nothing), its
    output lines are exactly the input's distinct lines in first-seen
    order, and n_lines = kept + dupes."""
    from debezium_spark.analytics.text import dedupe_lines

    df = spark.createDataFrame(
        list(enumerate(docs)), "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in dedupe_lines(df).collect()}
    for i, doc in enumerate(docs):
        lines = doc.split("\n")
        seen: list = []
        for ln in lines:
            if ln not in seen:
                seen.append(ln)
        r = out[i]
        assert r["clean_text"] == "\n".join(seen)
        assert r["n_lines"] == len(lines)
        assert r["n_dupes"] == len(lines) - len(seen)
    # idempotence: run again on the cleaned text
    clean = spark.createDataFrame(
        [(i, out[i]["clean_text"]) for i in range(len(docs))],
        "doc_id long, text string",
    )
    again = {r["doc_id"]: r for r in dedupe_lines(clean).collect()}
    for i in range(len(docs)):
        assert again[i]["n_dupes"] == 0
        assert again[i]["clean_text"] == out[i]["clean_text"]


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(_DOC, min_size=1, max_size=5))
def test_dedupe_corpus_lines_partition_invariants(spark, docs):
    """Every distinct line survives in exactly the smallest doc containing
    it (all its positions there); per-doc accounting conserves lines."""
    from debezium_spark.analytics.text import dedupe_corpus_lines

    df = spark.createDataFrame(
        list(enumerate(docs)), "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in dedupe_corpus_lines(df).collect()}
    first_doc = {}
    for i, doc in enumerate(docs):
        for ln in doc.split("\n"):
            first_doc.setdefault(ln, i)
    for i, doc in enumerate(docs):
        lines = doc.split("\n")
        expect = [ln for ln in lines if first_doc[ln] == i]
        r = out[i]
        assert r["clean_text"] == "\n".join(expect)
        assert r["n_lines"] == len(lines)
        assert r["n_removed"] == len(lines) - len(expect)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.tuples(
            st.integers(0, 2),            # key
            st.sampled_from("cud"),       # op
            st.integers(0, 99),           # balance
        ),
        min_size=1,
        max_size=8,
    )
)
def test_scd2_partitions_pos_axis(spark, evs):
    """SCD2 invariants for any event interleaving: per key the surviving
    versions' [from, to) intervals chain exactly over that key's event
    positions; at most one current version per key, and none when the
    key's last event is a delete."""
    from pyspark.sql import functions as F
    from debezium_spark.envelope import make_envelope
    from debezium_spark.operators.reduce import scd2_history

    rows = [
        (k, op, float(b), pos) for pos, (k, op, b) in enumerate(evs)
    ]
    ev = spark.createDataFrame(
        rows, "id long, op string, balance double, pos long"
    )
    env = make_envelope(
        ev,
        key=F.struct(F.col("id")),
        before=F.lit(None).cast("struct<id:long,balance:double>"),
        after=F.when(
            F.col("op") != "d", F.struct(F.col("id"), F.col("balance"))
        ),
        op=F.col("op"),
        db="t", table="t",
        pos=F.col("pos"),
    )
    got = scd2_history(env, key_cols=["id"]).collect()
    by_key: dict = {}
    for r in got:
        by_key.setdefault(r["id"], []).append(r)
    events_by_key: dict = {}
    for k, op, _b, pos in rows:
        events_by_key.setdefault(k, []).append((pos, op))
    for k, evs_k in events_by_key.items():
        evs_k.sort()
        versions = sorted(by_key.get(k, []), key=lambda r: r["valid_from_pos"])
        expect = [
            (pos, nxt[0] if nxt else None)
            for (pos, op), nxt in zip(
                evs_k, [*evs_k[1:], None]
            )
            if op != "d"
        ]
        assert [(v["valid_from_pos"], v["valid_to_pos"]) for v in versions] == expect
        currents = [v for v in versions if v["is_current"]]
        if evs_k[-1][1] == "d":
            assert not currents
        else:
            assert len(currents) == 1
            assert currents[0]["valid_from_pos"] == evs_k[-1][0]


# ---------------------------------------------------------------------------
# JSONB codec: arbitrary documents round-trip byte-exactly (no Spark)
# ---------------------------------------------------------------------------
_json_scalars = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-(2**63), max_value=2**64 - 1),
    st.floats(allow_nan=False, allow_infinity=False, width=64),
    st.text(max_size=40),
)

_json_docs = st.recursive(
    _json_scalars,
    lambda children: st.one_of(
        st.lists(children, max_size=6),
        st.dictionaries(st.text(max_size=12), children, max_size=6),
    ),
    max_leaves=25,
)


def _norm_doc(v):
    if isinstance(v, dict):
        return {k: _norm_doc(x) for k, x in sorted(v.items())}
    if isinstance(v, list):
        return [_norm_doc(x) for x in v]
    return v


@settings(max_examples=300, deadline=None)
@given(_json_docs)
def test_jsonb_roundtrip_property(doc):
    """encode→decode is the identity on values for any document built
    from the supported scalar set, across the small/large container
    forms, inlined vs spilled scalars, and the server's key sort (order
    normalized before compare — stored order is sorted, not insertion)."""
    from debezium_spark.sources.jsonb import decode_jsonb, encode_jsonb

    assert _norm_doc(decode_jsonb(encode_jsonb(doc))) == _norm_doc(doc)


# ---------------------------------------------------------------------------
# _LobBuffer vs the flat DBMS_LOB.WRITE model (the r10-ADVICE bug class:
# fragment re-offsetting and unfilled holes)
# ---------------------------------------------------------------------------
@given(
    st.lists(
        st.tuples(st.integers(0, 40), st.text("ab", min_size=1, max_size=6)),
        min_size=1,
        max_size=12,
    )
)
@settings(max_examples=300, deadline=None)
def test_lob_buffer_matches_flat_array_model(writes):
    """Every interleaving of DBMS_LOB.WRITE calls must merge to exactly
    what a flat char array with space-filled holes produces."""
    from debezium_spark.sources.logminer import _LobBuffer

    buf = _LobBuffer()
    arr: list[str] = []
    for off, data in writes:
        buf.add(off, data)
        if len(arr) < off:
            arr.extend(" " * (off - len(arr)))
        for i, ch in enumerate(data):
            if off + i < len(arr):
                arr[off + i] = ch
            else:
                arr.append(ch)
    assert buf.merge() == "".join(arr)


# ---------------------------------------------------------------------------
# BSON codec round trip (the jsonb.py playbook applied to bson.py)
# ---------------------------------------------------------------------------
def _bson_scalars():
    from debezium_spark.sources import bson as B

    return st.one_of(
        st.none(),
        st.booleans(),
        st.integers(-(2**63), 2**63 - 1),
        st.floats(allow_nan=False),
        st.text(max_size=12).filter(lambda s: "\x00" not in s),
        st.binary(max_size=8).map(lambda b: B.Binary(0, b)),
        st.binary(min_size=12, max_size=12).map(B.ObjectId),
        st.integers(-(2**63), 2**63 - 1).map(B.DateTime),
        st.tuples(
            st.integers(0, 2**32 - 1), st.integers(0, 2**32 - 1)
        ).map(lambda t: B.Timestamp(*t)),
        st.tuples(
            st.booleans(),
            st.integers(0, 10**34 - 1),
            st.integers(-6176, 6111),
        ).map(lambda t: B.Decimal128(t[0], str(t[1]), t[2])),
    )


@given(
    st.dictionaries(
        st.text(
            st.characters(min_codepoint=32, max_codepoint=126),
            min_size=1, max_size=8,
        ).filter(lambda s: "\x00" not in s),
        st.recursive(
            _bson_scalars(),
            lambda kids: st.one_of(
                st.lists(kids, max_size=4),
                st.dictionaries(
                    st.text("abcdef", min_size=1, max_size=4), kids,
                    max_size=4,
                ),
            ),
            max_leaves=12,
        ),
        max_size=6,
    )
)
@settings(max_examples=250, deadline=None)
def test_bson_codec_round_trips(doc):
    from debezium_spark.sources.bson import decode_bson, encode_bson

    assert decode_bson(encode_bson(doc)) == doc


def test_bloom_artifact_round_trip(spark, tmp_path):
    """The persisted Bloom filter screens identically to the in-session
    one (train-once/screen-many, like the ANN index artifacts)."""
    from pyspark.sql import functions as F

    from debezium_spark.analytics.text import (
        bloom_decontaminate,
        bloom_ngram_build,
        load_bloom,
        save_bloom,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    bench = docs.filter(F.col("doc_id") % 7 == 0)
    corpus = docs.filter(F.col("doc_id") % 7 != 0)
    words = bloom_ngram_build(bench, n=3, m_words=16, k=2)
    save_bloom(spark, str(tmp_path / "bloom"), words, n=3, k=2)
    w2, n, k = load_bloom(spark, str(tmp_path / "bloom"))
    assert (w2, n, k) == (words, 3, 2)
    a = sorted(
        tuple(r) for r in bloom_decontaminate(corpus, words, n=3, k=2)
        .collect()
    )
    b = sorted(
        tuple(r) for r in bloom_decontaminate(corpus, w2, n=n, k=k)
        .collect()
    )
    assert a == b and len(a) > 0
