"""GTID-set algebra goldens + properties (GtidSet.java:15-61 contract,
MySqlGtidSet interval semantics) and the read-only incremental-snapshot
watermark state machine across a server failover
(BinlogReadOnlyIncrementalSnapshotChangeEventSource.java:116-175)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from debezium_spark.sources.gtid import GtidSet, ReadOnlyWindow

A = "aaaaaaaa-aaaa-aaaa-aaaa-aaaaaaaaaaaa"
B = "bbbbbbbb-bbbb-bbbb-bbbb-bbbbbbbbbbbb"


def test_parse_normalizes_and_round_trips():
    s = GtidSet.parse(f"{A}:1-5:6-10:15,{B}:3")
    # adjacent intervals merge like the binlog client's parse
    assert str(s) == f"{A}:1-10:15,{B}:3"
    assert GtidSet.parse(str(s)) == s
    assert GtidSet.parse(None).is_empty()
    assert GtidSet.parse("  ").is_empty()


def test_contains():
    s = GtidSet.parse(f"{A}:1-10:20-30")
    assert s.contains(f"{A}:1") and s.contains(f"{A}:10")
    assert s.contains(f"{A}:25")
    assert not s.contains(f"{A}:11") and not s.contains(f"{A}:31")
    assert not s.contains(f"{B}:5")


def test_subtract_splits_intervals_and_keeps_unknown_uuids():
    s = GtidSet.parse(f"{A}:1-100,{B}:1-5")
    other = GtidSet.parse(f"{A}:20-30:50")
    d = s.subtract(other)
    # interval split per Interval.remove (:478-494): head + tail survive
    assert str(d) == f"{A}:1-19:31-49:51-100,{B}:1-5"
    # uuids the other set doesn't know survive whole (:133-149)
    assert d.subtract(GtidSet.parse(f"{B}:1-5")).server_uuids() == (A,)
    # fully-contained entries vanish
    assert s.subtract(s).is_empty()


def test_with_replaces_per_uuid_entries():
    s = GtidSet.parse(f"{A}:1-10,{B}:1-5")
    other = GtidSet.parse(f"{A}:1-20")
    # with() REPLACES the same-uuid entry, it does not union (:110-122)
    assert str(s.with_(other)) == f"{A}:1-20,{B}:1-5"
    narrower = GtidSet.parse(f"{A}:5-6")
    assert str(s.with_(narrower)) == f"{A}:5-6,{B}:1-5"
    assert s.with_(None) == s


def test_is_contained_within():
    s = GtidSet.parse(f"{A}:2-5:8-9")
    assert s.is_contained_within(GtidSet.parse(f"{A}:1-10"))
    assert not s.is_contained_within(GtidSet.parse(f"{A}:1-8"))
    assert not s.is_contained_within(GtidSet.parse(f"{B}:1-10"))
    assert s.is_contained_within(s)
    assert not s.is_contained_within(None)


@st.composite
def model_sets(draw):
    ivs = draw(st.lists(
        st.tuples(st.integers(1, 60), st.integers(0, 8)),
        min_size=0, max_size=5,
    ))
    return [(s, s + w) for s, w in ivs]


def _members(ivs):
    out = set()
    for s, e in ivs:
        out.update(range(s, e + 1))
    return out


@given(model_sets(), model_sets())
@settings(max_examples=200, deadline=None)
def test_subtract_matches_integer_set_model(a_ivs, b_ivs):
    a = GtidSet.of({A: a_ivs}) if a_ivs else GtidSet(())
    b = GtidSet.of({A: b_ivs}) if b_ivs else GtidSet(())
    diff = a.subtract(b)
    expect = _members(a_ivs) - _members(b_ivs)
    got = {
        t for t in range(1, 80) if diff.contains(f"{A}:{t}")
    }
    assert got == expect


@given(model_sets(), model_sets())
@settings(max_examples=200, deadline=None)
def test_containment_matches_integer_set_model(a_ivs, b_ivs):
    a = GtidSet.of({A: a_ivs}) if a_ivs else GtidSet(())
    b = GtidSet.of({A: b_ivs}) if b_ivs else GtidSet(())
    assert a.is_contained_within(b) == (
        _members(a_ivs) <= _members(b_ivs)
    )


def test_readonly_window_closes_across_failover():
    """The VERDICT's S4 acceptance case: a chunk window that spans a
    server failover (new server_uuid, txids restarting at 1). The
    GTID-set watermarks close the window at the right event AND flag the
    chunk for re-read; a scalar txid fence provably cannot — the new
    server's low txids would sit 'inside' any scalar fence."""
    w = ReadOnlyWindow()
    w.open(GtidSet.parse(f"{A}:1-3000"))           # low watermark
    # binlog stream: A:3001..3004, failover, B:1..3
    assert not w.update_window_state(f"{A}:3001")  # opens the window
    assert w.window_opened
    # high watermark read AFTER the failover: executed minus low
    w.close(GtidSet.parse(f"{A}:1-3004,{B}:1-3"))
    assert str(w.high) == f"{A}:3001-3004,{B}:1-3"
    assert w.has_server_identifier_changed()       # -> rereadChunk
    assert not w.update_window_state(f"{A}:3004")
    assert not w.update_window_state(f"{B}:1")     # INSIDE the window
    assert not w.update_window_state(f"{B}:3")
    closed = w.update_window_state(f"{B}:4")       # first event past high
    assert closed and not w.window_opened
    assert w.watermarks_changed()

    # the scalar-fence counterexample: any fence f >= 3004 calls B:1-3
    # "before the fence" (1 <= f) yet B:4 too — it cannot separate the
    # in-window B events from the post-window ones
    fence = 3004
    assert all(int(t) <= fence for t in (1, 3, 4))


def test_readonly_window_reached_high_watermark():
    w = ReadOnlyWindow()
    w.open(GtidSet.parse(f"{A}:1-10"))
    w.close(GtidSet.parse(f"{A}:1-15"))
    assert not w.reached_high_watermark(f"{A}:14")
    assert w.reached_high_watermark(f"{A}:15")
    assert w.reached_high_watermark(f"{A}:16")
    assert w.reached_high_watermark(None)


# ---------------------------------------------------------------------------
# MariaDB flavor (MariaDbGtidSet.java:30-137, MariaDbStreamSet :278-320)
# ---------------------------------------------------------------------------
def test_mariadb_parse_contains_and_round_trip():
    from debezium_spark.sources.gtid import MariaDbGtidSet

    s = MariaDbGtidSet.parse("0-27-42,0-27-41,1-100-5")
    assert str(s) == "0-27-41,0-27-42,1-100-5"
    assert MariaDbGtidSet.parse(str(s)) == s
    assert s.contains("0-27-41") and s.contains("1-100-5")
    assert not s.contains("0-27-40") and not s.contains("2-1-1")
    assert MariaDbGtidSet.parse(None).is_empty()


def test_mariadb_containment_is_per_domain():
    """MariaDB tracks progress per DOMAIN, not per (domain, server):
    a gtid from server 27 is contained in a set whose domain-0 entry
    came from server 28 (debezium#1672, MariaDbGtidSet.java:70-80)."""
    from debezium_spark.sources.gtid import MariaDbGtidSet

    s = MariaDbGtidSet.parse("0-27-42")
    assert s.is_contained_within(MariaDbGtidSet.parse("0-28-43"))
    # isAllBefore: contained when this stream's min seq <= other's min
    assert MariaDbGtidSet.parse("0-27-10").is_contained_within(
        MariaDbGtidSet.parse("0-28-11")
    )
    assert not MariaDbGtidSet.parse("0-27-12").is_contained_within(
        MariaDbGtidSet.parse("0-28-11")
    )
    # unknown domain is never contained
    assert not s.is_contained_within(MariaDbGtidSet.parse("5-1-99"))
    assert not s.is_contained_within(None)


def test_mariadb_subtract_and_with():
    from debezium_spark.sources.gtid import MariaDbGtidSet

    s = MariaDbGtidSet.parse("0-27-41,0-27-42,1-100-5")
    # MariaDbGtidSet.java:119: stream 0-27 is contained-with the other's
    # (min 41 <= other's min 41 -> isAllBefore), so it drops WHOLE — not a
    # per-member subtract leaving 0-27-42.
    d = s.subtract(MariaDbGtidSet.parse("0-27-41"))
    assert str(d) == "1-100-5"
    assert s.subtract(s).is_empty()
    assert s.subtract(None) == s

    # with() replaces same-(domain,server) streams, keeps the rest
    w = s.with_(MariaDbGtidSet.parse("0-27-50"))
    assert str(w) == "0-27-50,1-100-5"

    # retainAll filters on the 'domain-server' source filter value
    r = s.retain_all(lambda v: v == "1-100")
    assert str(r) == "1-100-5"


def test_membership_predicate_matches_contains(spark):
    """The distributed half (literal interval predicate) must agree with
    the driver-side set's contains() on every (uuid, txid) pair —
    including interval edges and unknown uuids."""
    from pyspark.sql import functions as F

    from debezium_spark.sources.gtid import (
        GtidSet,
        gtid_membership_predicate,
    )

    s = GtidSet.parse(f"{A}:1-10:20-30:45,{B}:3-4")
    rows = [(u, t) for u in (A, B, "cccccccc-0000-0000-0000-000000000000")
            for t in range(0, 50)]
    df = spark.createDataFrame(rows, "uuid string, txid long")
    got = {
        (r["uuid"], r["txid"])
        for r in df.filter(
            gtid_membership_predicate(s, F.col("uuid"), F.col("txid"))
        ).collect()
    }
    expect = {(u, t) for u, t in rows if s.contains(f"{u}:{t}")}
    assert got == expect and len(expect) > 0


def test_mariadb_subtract_drops_contained_streams_whole():
    """MariaDbGtidSet.java:111-124: subtract first drops any stream that is
    contained-with the other's SAME stream — containsAll OR isAllBefore
    (min sequence <= the other's min) — and only then removes exact
    members. An all-before stream holding gtids the other lacks must not
    survive partially."""
    from debezium_spark.sources.gtid import MariaDbGtidSet

    # stream 0-27: this min seq (1) <= other's min seq (2), so the WHOLE
    # stream drops even though gtid 0-27-3 is absent from the other set.
    s = MariaDbGtidSet.parse("0-27-1,0-27-3")
    assert s.subtract(MariaDbGtidSet.parse("0-27-2")).is_empty()
    # not all-before (min 5 > other's min 2) -> exact member subtract only
    t = MariaDbGtidSet.parse("0-27-5,0-27-7")
    assert str(t.subtract(MariaDbGtidSet.parse("0-27-2,0-27-5"))) == "0-27-7"
    # a stream id the other set has never seen survives whole
    u = MariaDbGtidSet.parse("1-9-4")
    assert u.subtract(MariaDbGtidSet.parse("0-27-2")) == u


def test_membership_predicate_is_uuid_case_insensitive(spark):
    """GtidSet normalizes server uuids to lowercase; a stream whose uuid
    column carries uppercase hex must still match the watermark window
    (gtid_membership_predicate lowers the column before comparing)."""
    from pyspark.sql import functions as F

    from debezium_spark.sources.gtid import (
        GtidSet,
        gtid_membership_predicate,
    )

    s = GtidSet.parse(f"{A}:1-10")
    df = spark.createDataFrame(
        [(A.upper(), 5), (A.upper(), 11), (A, 7)], "uuid string, txid long"
    )
    got = sorted(
        r["txid"]
        for r in df.filter(
            gtid_membership_predicate(s, F.col("uuid"), F.col("txid"))
        ).collect()
    )
    assert got == [5, 7]
    # GtidSet.of normalizes too, so sets built from raw stream values
    # (uppercase reporting clients) behave like parsed ones
    up = GtidSet.of({A.upper(): [(1, 10)]})
    assert up == s and up.max_transaction_id(A) == 10
