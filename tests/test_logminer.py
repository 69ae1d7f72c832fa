"""LogMiner redo-SQL DML parser goldens (reference:
LogMinerDmlParser.java — insert/update/delete clause walks, the
explicit-NULL sentinel, Unsupported Type, ORA_ARCHIVE_STATE skip)."""

from __future__ import annotations

import pytest

from debezium_spark.sources.logminer import (
    decode_logminer_dml,
    parse_redo_sql,
)

COLS = ["ID", "NAME", "AMOUNT", "NOTE"]


def test_insert_values_map_by_column_list():
    m = parse_redo_sql(
        'insert into "S"."T"("ID","NAME","AMOUNT","NOTE") '
        "values (7,'it''s',12.5,NULL);",
        COLS,
    )
    assert m["op"] == "c" and (m["schema"], m["table"]) == ("S", "T")
    assert m["before"] is None
    # doubled '' unescapes; unquoted number keeps its SQL text; NULL -> None
    assert m["after"] == ["7", "it's", "12.5", None]


def test_insert_function_values_and_reordered_columns():
    m = parse_redo_sql(
        'insert into "S"."T"("NOTE","ID","NAME","AMOUNT") values '
        "(Unsupported Type,1,TO_TIMESTAMP('2024-01-02 03:04:05', "
        "'YYYY-MM-DD HH24:MI:SS'),EMPTY_BLOB());",
        COLS,
    )
    # values land by NAME through the column list, not position
    assert m["after"] == [
        "1",
        "TO_TIMESTAMP('2024-01-02 03:04:05', 'YYYY-MM-DD HH24:MI:SS')",
        "EMPTY_BLOB()",
        None,  # Unsupported Type -> null cell
    ]


def test_update_sentinel_reconciliation():
    m = parse_redo_sql(
        'update "S"."T" set "NAME" = \'b\', "NOTE" = NULL '
        'where "ID" = 3 and "NAME" = \'a\' and "AMOUNT" = 9.5 '
        'and "NOTE" IS NULL;',
        COLS,
    )
    assert m["op"] == "u"
    assert m["before"] == ["3", "a", "9.5", None]
    # NAME from SET; NOTE explicitly NULLed; ID/AMOUNT copy from before
    assert m["after"] == ["3", "b", "9.5", None]


def test_update_where_function_value():
    m = parse_redo_sql(
        'update "S"."T" set "AMOUNT" = 1 where "ID" = 3 and '
        "\"NAME\" = TO_DATE('2024-01-02', 'YYYY-MM-DD');",
        COLS,
    )
    assert m["before"][1] == "TO_DATE('2024-01-02', 'YYYY-MM-DD')"
    assert m["after"][2] == "1"


def test_delete_and_no_where_delete():
    m = parse_redo_sql(
        'delete from "S"."T" where "ID" = 2 and "NAME" = \'x\';', COLS
    )
    assert m["op"] == "d" and m["after"] is None
    assert m["before"] == ["2", "x", None, None]
    m = parse_redo_sql('delete from "S"."T";', COLS)
    assert m["before"] == [None] * 4  # DBZ-3235: WHERE-less delete


def test_ora_archive_state_skipped():
    m = parse_redo_sql(
        'insert into "S"."T"("ID","ORA_ARCHIVE_STATE","NAME") '
        "values (1,'1','z');",
        COLS,
    )
    assert m["after"] == ["1", "z", None, None]


def test_unsupported_constructs_raise():
    with pytest.raises(ValueError, match="OR disjunction"):
        parse_redo_sql(
            'delete from "S"."T" where "ID" = 1 or "ID" = 2;', COLS
        )
    with pytest.raises(ValueError, match="unsupported redo operation"):
        parse_redo_sql('merge into "S"."T" using dual;', COLS)
    with pytest.raises(ValueError, match="where clause"):
        parse_redo_sql('update "S"."T" set "ID" = 1;', COLS)


def test_distributed_decode(spark):
    rows = [
        (10, 'insert into "S"."T"("ID","NAME","AMOUNT","NOTE") '
             "values (1,'a',2.5,'n');"),
        (11, 'update "S"."T" set "NAME" = \'b\' where "ID" = 1 '
             'and "NAME" = \'a\' and "AMOUNT" = 2.5 and "NOTE" = \'n\';'),
        (12, 'delete from "S"."T" where "ID" = 1 and "NAME" = \'b\' '
             'and "AMOUNT" = 2.5 and "NOTE" = \'n\';'),
    ]
    df = spark.createDataFrame(rows, "scn long, sql_redo string")
    out = {r["scn"]: r for r in
           decode_logminer_dml(df, COLS).collect()}
    assert out[10]["op"] == "c" and out[10]["after"] == ["1", "a", "2.5", "n"]
    assert out[11]["after"] == ["1", "b", "2.5", "n"]
    assert out[11]["before"] == ["1", "a", "2.5", "n"]
    assert out[12]["op"] == "d" and out[12]["after"] is None


# ---------------------------------------------------------------------------
# S29 — LOB fragment assembly (TransactionCommitConsumer semantics)
# ---------------------------------------------------------------------------
def _lob_row(scn, tx, rowid, kind, after=None, lob_col=None,
             lob_offset=None, lob_data=None):
    return (scn, tx, rowid, kind, "S", "T", after, lob_col, lob_offset,
            lob_data)


_LOB_SCHEMA = (
    "scn long, tx string, row_id string, kind string, schema string,"
    " table string, after array<string>, lob_col string,"
    " lob_offset int, lob_data string"
)


def _assemble(spark, rows, columns=("id", "status", "note"),
              lob_columns=("note",)):
    from debezium_spark.sources.logminer import assemble_lob_events

    df = spark.createDataFrame(rows, _LOB_SCHEMA)
    return sorted(
        tuple(r) for r in assemble_lob_events(
            df, list(columns), list(lob_columns)
        ).collect()
    )


def test_lob_insert_locator_writes_fold_into_one_create(spark):
    from debezium_spark.sources.logminer import UNAVAILABLE

    rows = [
        _lob_row(1, "tx1", "r1", "insert", ["1", "ok", "EMPTY_CLOB()"]),
        _lob_row(2, "tx1", "r1", "sel_lob_locator",
                 ["1", "ok", UNAVAILABLE], lob_col="note"),
        _lob_row(3, "tx1", "r1", "lob_write", lob_offset=0,
                 lob_data="hello "),
        _lob_row(4, "tx1", "r1", "lob_write", lob_offset=6,
                 lob_data="world"),
    ]
    out = _assemble(spark, rows)
    # ONE event, op from the chain's first event (the INSERT), scn 1
    assert out == [(1, "tx1", "r1", "c", "S", "T",
                    ["1", "ok", "hello world"])]


def test_lob_overlapping_write_overwrites_region(spark):
    from debezium_spark.sources.logminer import UNAVAILABLE

    rows = [
        _lob_row(1, "tx1", "r1", "insert", ["1", "ok", "EMPTY_CLOB()"]),
        _lob_row(2, "tx1", "r1", "sel_lob_locator",
                 ["1", "ok", UNAVAILABLE], lob_col="note"),
        _lob_row(3, "tx1", "r1", "lob_write", lob_offset=0,
                 lob_data="aaaaaa"),
        # middle overwrite: truncates the head, drops the covered tail
        _lob_row(4, "tx1", "r1", "lob_write", lob_offset=2,
                 lob_data="BB"),
    ]
    out = _assemble(spark, rows)
    assert out[0][6] == ["1", "ok", "aaBBaa"[:2] + "BB" + "aa"]
    assert out[0][6][2] == "aaBBaa"


def test_lob_update_without_lob_change_is_separate_event(spark):
    from debezium_spark.sources.logminer import UNAVAILABLE

    rows = [
        _lob_row(1, "tx1", "r1", "insert", ["1", "ok", "EMPTY_CLOB()"]),
        _lob_row(2, "tx1", "r1", "sel_lob_locator",
                 ["1", "ok", UNAVAILABLE], lob_col="note"),
        _lob_row(3, "tx1", "r1", "lob_write", lob_offset=0, lob_data="x"),
        # plain UPDATE, LOB column UNAVAILABLE -> separate logical change
        _lob_row(4, "tx1", "r1", "update", ["1", "bad", UNAVAILABLE]),
    ]
    out = _assemble(spark, rows)
    assert len(out) == 2
    assert out[0] == (1, "tx1", "r1", "c", "S", "T", ["1", "ok", "x"])
    # the standalone update keeps the placeholder (NOT null)
    assert out[1] == (4, "tx1", "r1", "u", "S", "T",
                      ["1", "bad", UNAVAILABLE])


def test_lob_update_setting_lob_merges_and_replaces_construction(spark):
    from debezium_spark.sources.logminer import UNAVAILABLE

    rows = [
        _lob_row(1, "tx1", "r1", "insert", ["1", "ok", "EMPTY_CLOB()"]),
        _lob_row(2, "tx1", "r1", "sel_lob_locator",
                 ["1", "ok", UNAVAILABLE], lob_col="note"),
        _lob_row(3, "tx1", "r1", "lob_write", lob_offset=0,
                 lob_data="to-be-discarded"),
        # UPDATE sets the LOB inline -> merges, concrete value wins over
        # the in-flight fragments
        _lob_row(4, "tx1", "r1", "update", ["1", "ok2", "inline"]),
    ]
    out = _assemble(spark, rows)
    assert out == [(1, "tx1", "r1", "c", "S", "T", ["1", "ok2", "inline"])]


def test_lob_locator_rooted_chain_emits_update(spark):
    from debezium_spark.sources.logminer import UNAVAILABLE

    rows = [
        _lob_row(5, "tx2", "r9", "sel_lob_locator",
                 ["9", "keep", UNAVAILABLE], lob_col="note"),
        _lob_row(6, "tx2", "r9", "lob_write", lob_offset=0,
                 lob_data="appended"),
    ]
    out = _assemble(spark, rows)
    assert out == [(5, "tx2", "r9", "u", "S", "T",
                    ["9", "keep", "appended"])]


def test_lob_write_without_locator_raises(spark):
    import pytest

    rows = [
        _lob_row(1, "tx1", "r1", "lob_write", lob_offset=0, lob_data="x"),
    ]
    with pytest.raises(Exception, match="SEL_LOB_LOCATOR"):
        _assemble(spark, rows)


def test_lob_rows_are_independent_across_rowids(spark):
    from debezium_spark.sources.logminer import UNAVAILABLE

    rows = [
        _lob_row(1, "tx1", "r1", "insert", ["1", "a", "EMPTY_CLOB()"]),
        _lob_row(2, "tx1", "r1", "sel_lob_locator",
                 ["1", "a", UNAVAILABLE], lob_col="note"),
        _lob_row(5, "tx1", "r2", "insert", ["2", "b", "EMPTY_CLOB()"]),
        _lob_row(6, "tx1", "r2", "sel_lob_locator",
                 ["2", "b", UNAVAILABLE], lob_col="note"),
        _lob_row(3, "tx1", "r1", "lob_write", lob_offset=0, lob_data="A"),
        _lob_row(7, "tx1", "r2", "lob_write", lob_offset=0, lob_data="B"),
    ]
    out = _assemble(spark, rows)
    assert [o[6][2] for o in out] == ["A", "B"]


# ---------------------------------------------------------------------------
# _LobBuffer vs LobUnderConstruction (TransactionCommitConsumer.java:726-868)
# ---------------------------------------------------------------------------
def test_lob_buffer_fills_holes_with_spaces():
    """DBMS_LOB.WRITE past the current end leaves a hole; merge() fills
    it with spaces exactly like the reference's CLOB merge (:856-868)."""
    from debezium_spark.sources.logminer import _LobBuffer

    b = _LobBuffer()
    b.add(0, "a")
    b.add(10, "b")
    assert b.merge() == "a" + " " * 9 + "b"

    # a hole before the FIRST fragment is also space-filled
    b2 = _LobBuffer()
    b2.add(5, "x")
    assert b2.merge() == "     x"


def test_lob_buffer_fragments_after_write_region_untouched():
    """A middle write must not re-offset fragments that lie entirely
    after it (the reference inserts before them and breaks)."""
    from debezium_spark.sources.logminer import _LobBuffer

    b = _LobBuffer()
    b.add(0, "aa")
    b.add(10, "bb")
    b.add(1, "x")     # overlaps [0,'aa'] tail only
    assert b.frags == [[0, "a"], [1, "x"], [10, "bb"]]
    b.add(11, "yy")   # truncates the tail of [10,'bb']
    assert b.merge() == "ax" + " " * 8 + "byy"


def test_lob_buffer_absorb_and_front_truncate():
    from debezium_spark.sources.logminer import _LobBuffer

    # write fully inside one fragment absorbs in place
    b = _LobBuffer("abcdef")
    b.add(2, "XY")
    assert b.merge() == "abXYef"

    # write spanning a gap front-truncates the following fragment
    b2 = _LobBuffer()
    b2.add(0, "aaaa")
    b2.add(8, "bbbb")
    b2.add(2, "ZZZZZZZZ")  # covers [2,10): eats 'aa' tail + 'bb' head
    assert b2.merge() == "aaZZZZZZZZbb"

    # write covering a whole following fragment removes it
    b3 = _LobBuffer()
    b3.add(0, "aa")
    b3.add(4, "cc")
    b3.add(1, "XXXXXXX")  # [1,8) swallows [4,'cc'] entirely
    assert b3.merge() == "aXXXXXXX"


# ---------------------------------------------------------------------------
# s29b — LOB_ERASE / noop locator gate / 32k extended strings
# (TransactionCommitConsumer.java:225-229,319-334,552-559,944-973)
# ---------------------------------------------------------------------------
def test_lob_erase_discards_in_flight_merge_state(spark):
    """The reference does NOT apply erases: a LOB_ERASE discards the
    row's accumulated event entirely (discardCurrentMergeState) so a
    value it cannot reconstruct is never emitted; later events for the
    row start a fresh logical change."""
    from debezium_spark.sources.logminer import UNAVAILABLE

    rows = [
        _lob_row(1, "tx1", "r1", "insert", ["1", "ok", "EMPTY_CLOB()"]),
        _lob_row(2, "tx1", "r1", "sel_lob_locator",
                 ["1", "ok", UNAVAILABLE], lob_col="note"),
        _lob_row(3, "tx1", "r1", "lob_write", lob_offset=0, lob_data="x"),
        _lob_row(4, "tx1", "r1", "lob_erase"),
        # after the discard, a new UPDATE is its own logical change
        _lob_row(5, "tx1", "r1", "update", ["1", "later", UNAVAILABLE]),
    ]
    out = _assemble(spark, rows)
    assert out == [(5, "tx1", "r1", "u", "S", "T",
                    ["1", "later", UNAVAILABLE])]


def test_lob_erase_without_construction_is_ignored(spark):
    """Mid-stream start (DBZ-4367): an erase with no locator in flight
    is ignored, the surrounding chain folds normally."""
    from debezium_spark.sources.logminer import UNAVAILABLE

    rows = [
        _lob_row(1, "tx1", "r1", "lob_erase"),
        _lob_row(2, "tx1", "r1", "insert", ["1", "ok", "inline"]),
    ]
    out = _assemble(spark, rows)
    assert out == [(2, "tx1", "r1", "c", "S", "T", ["1", "ok", "inline"])]


def test_noop_locator_chain_is_not_emitted(spark):
    """A SEL_LOB_LOCATOR-rooted chain that changes nothing is a NOOP and
    must not emit (prepareAndDispatch's SELECT_LOB_LOCATOR gate); the
    same chain plus one write emits."""
    from debezium_spark.sources.logminer import UNAVAILABLE

    bare = [
        _lob_row(1, "tx1", "r1", "sel_lob_locator",
                 ["1", "ok", "existing"], lob_col="note"),
    ]
    assert _assemble(spark, bare) == []

    with_write = bare + [
        _lob_row(2, "tx1", "r1", "lob_write", lob_offset=8,
                 lob_data=" more"),
    ]
    out = _assemble(spark, with_write)
    assert out == [(1, "tx1", "r1", "u", "S", "T",
                    ["1", "ok", "existing more"])]


def test_extended_string_fragments_concatenate(spark):
    """EXTENDED_STRING_BEGIN + three 32K_WRITE fragments fold into one
    'u' whose column is the in-order concatenation (no offsets, no hole
    fill); the prior value is discarded by the fresh construction."""
    from debezium_spark.sources.logminer import UNAVAILABLE

    rows = [
        _lob_row(1, "tx1", "r1", "xs_begin",
                 ["1", "ok", "old-value"], lob_col="note"),
        _lob_row(2, "tx1", "r1", "xs_write", lob_data="part1|"),
        _lob_row(3, "tx1", "r1", "xs_write", lob_data="part2|"),
        _lob_row(4, "tx1", "r1", "xs_write", lob_data="part3"),
    ]
    out = _assemble(spark, rows)
    assert out == [(1, "tx1", "r1", "u", "S", "T",
                    ["1", "ok", "part1|part2|part3"])]


def test_extended_string_begin_without_writes_is_null(spark):
    """No 32K_WRITE arrives: the construction's isNull is never cleared,
    so the column is NULL — and begin-rooted chains are NOT noop-gated
    (the gate tests only SELECT_LOB_LOCATOR)."""
    rows = [
        _lob_row(1, "tx1", "r1", "xs_begin",
                 ["1", "ok", "old-value"], lob_col="note"),
    ]
    out = _assemble(spark, rows)
    assert out == [(1, "tx1", "r1", "u", "S", "T", ["1", "ok", None])]


def test_extended_string_write_without_begin_raises(spark):
    import pytest

    rows = [
        _lob_row(1, "tx1", "r1", "xs_write", lob_data="x"),
    ]
    with pytest.raises(Exception, match="EXTENDED_STRING_BEGIN"):
        _assemble(spark, rows)


def test_xml_begin_write_end_fold(spark):
    """XML_BEGIN + XML_WRITE fragments concatenate like 32k strings
    (XmlUnderConstruction :926-942); a NULL-payload write is skipped
    (:283-286) and XML_END is silently ignored (:276-279)."""
    rows = [
        _lob_row(1, "tx1", "r1", "xml_begin",
                 ["1", "ok", "old"], lob_col="note"),
        _lob_row(2, "tx1", "r1", "xml_write", lob_data="<a>"),
        _lob_row(3, "tx1", "r1", "xml_write", lob_data=None),
        _lob_row(4, "tx1", "r1", "xml_write", lob_data="x</a>"),
        _lob_row(5, "tx1", "r1", "xml_end"),
    ]
    out = _assemble(spark, rows)
    assert out == [(1, "tx1", "r1", "u", "S", "T", ["1", "ok", "<a>x</a>"])]


def test_xml_begin_without_writes_is_null_and_emits(spark):
    rows = [
        _lob_row(1, "tx1", "r1", "xml_begin",
                 ["1", "ok", "old"], lob_col="note"),
        _lob_row(2, "tx1", "r1", "xml_end"),
    ]
    out = _assemble(spark, rows)
    assert out == [(1, "tx1", "r1", "u", "S", "T", ["1", "ok", None])]


def test_xml_write_without_begin_raises(spark):
    import pytest

    rows = [_lob_row(1, "tx1", "r1", "xml_write", lob_data="<a/>")]
    with pytest.raises(Exception, match="XML_BEGIN"):
        _assemble(spark, rows)


def test_lob_chain_split_across_arrow_batches(spark):
    """The mapInPandas fold re-attaches a (tx, rowid) chain that an Arrow
    batch boundary split: with maxRecordsPerBatch=7, a 3-chain / 60-row
    transaction crosses several batch edges and must fold identically to
    the default batching."""
    from debezium_spark.sources.logminer import UNAVAILABLE

    rows = []
    for k in range(3):
        rid = f"r{k}"
        base = k * 100
        rows.append(_lob_row(base, "tx1", rid, "insert",
                             [str(k), "ok", "EMPTY_CLOB()"]))
        rows.append(_lob_row(base + 1, "tx1", rid, "sel_lob_locator",
                             [str(k), "ok", UNAVAILABLE], lob_col="note"))
        for j in range(17):
            rows.append(_lob_row(base + 2 + j, "tx1", rid, "lob_write",
                                 lob_offset=j, lob_data=str(j % 10)))
    expected = _assemble(spark, rows)
    assert len(expected) == 3 and expected[0][6][2] == "0123456789" + "0123456"
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    prev = spark.conf.get(key)
    try:
        spark.conf.set(key, "7")
        assert _assemble(spark, rows) == expected
    finally:
        spark.conf.set(key, prev)
