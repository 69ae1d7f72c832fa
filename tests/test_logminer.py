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
