"""DDL-text parsing subset (schema/ddl.py) — the minimal
CREATE/ALTER/DROP/RENAME grammar feeding the schema-history registry
(reference semantics: MySqlDatabaseSchema + debezium-ddl-parser's
MySqlParser.g4, scoped per SURVEY §7 step 6)."""

from __future__ import annotations

import pytest

from debezium_spark.schema.ddl import (
    DdlSchemaTracker,
    apply_change,
    map_type,
    parse_ddl,
)


def test_create_table_full():
    c = parse_ddl(
        """
        CREATE TABLE IF NOT EXISTS `shop`.`order_line` (
          `order_id` BIGINT NOT NULL,
          line_no INT NOT NULL,
          sku VARCHAR(64) NOT NULL,
          qty INT DEFAULT 1,
          price DECIMAL(12,2),
          note TEXT,
          flag TINYINT(1) NOT NULL DEFAULT 0,
          created DATETIME DEFAULT CURRENT_TIMESTAMP(),
          PRIMARY KEY (order_id, line_no),
          KEY idx_sku (sku)
        ) ENGINE=InnoDB DEFAULT CHARSET=utf8mb4;
        """
    )
    assert c.kind == "create" and c.table == "order_line"
    names = [s.name for s in c.columns]
    assert names == [
        "order_id", "line_no", "sku", "qty", "price", "note", "flag",
        "created",
    ]
    by = {s.name: s for s in c.columns}
    assert by["order_id"].primary_key and not by["order_id"].nullable
    assert by["line_no"].primary_key
    assert by["sku"].spark_type == "string" and not by["sku"].nullable
    assert by["qty"].default == "1" and by["qty"].nullable
    assert by["price"].spark_type == "decimal(12,2)"
    assert by["flag"].spark_type == "boolean"  # TINYINT(1) convention
    assert by["created"].spark_type == "timestamp"


def test_type_mapping():
    assert map_type("INT UNSIGNED") == "bigint"
    assert map_type("BIGINT UNSIGNED") == "decimal(20,0)"
    assert map_type("TINYINT(1)") == "boolean"
    assert map_type("TINYINT(4)") == "tinyint"
    assert map_type("NUMERIC(5)") == "decimal(5,0)"
    assert map_type("enum('a','b')".replace("'a','b'", "8")) == "string"
    with pytest.raises(ValueError):
        map_type("GEOMETRYCOLLECTION")


def test_alter_multi_action_and_positions():
    base = parse_ddl(
        "CREATE TABLE t (a INT PRIMARY KEY, b VARCHAR(10), c INT)"
    ).columns
    change = parse_ddl(
        "ALTER TABLE t ADD COLUMN d BIGINT NOT NULL AFTER a, "
        "DROP COLUMN c, MODIFY b TEXT, ADD e DATE FIRST"
    )
    cols = apply_change(base, change)
    assert [c.name for c in cols] == ["e", "a", "d", "b"]
    assert {c.name: c.spark_type for c in cols}["b"] == "string"
    assert not {c.name: c.nullable for c in cols}["d"]


def test_alter_change_rename_and_neutral_actions():
    base = parse_ddl("CREATE TABLE t (a INT, b INT)").columns
    change = parse_ddl(
        "ALTER TABLE t CHANGE COLUMN b b2 BIGINT, ENGINE=InnoDB, "
        "ADD INDEX idx_a (a)"
    )
    cols = apply_change(base, change)
    assert [(c.name, c.spark_type) for c in cols] == [
        ("a", "int"), ("b2", "bigint"),
    ]


def test_alter_errors():
    base = parse_ddl("CREATE TABLE t (a INT)").columns
    with pytest.raises(ValueError):
        apply_change(base, parse_ddl("ALTER TABLE t ADD a INT"))
    with pytest.raises(ValueError):
        apply_change(base, parse_ddl("ALTER TABLE t DROP COLUMN nope"))
    # MODIFY/CHANGE of an unknown column raises like DROP does
    with pytest.raises(ValueError):
        apply_change(base, parse_ddl("ALTER TABLE t MODIFY nope BIGINT"))
    with pytest.raises(ValueError):
        apply_change(base, parse_ddl("ALTER TABLE t CHANGE nope n2 INT"))


def test_rename_column_and_neutral_renames():
    """MySQL 8 RENAME COLUMN is a column op (not a table rename), RENAME
    INDEX/KEY is schema-neutral, and a malformed RENAME raises instead of
    corrupting history (the r8 ADVICE bug: 'RENAME COLUMN a TO b' parsed
    as new_table='COLUMN a TO b')."""
    base = parse_ddl("CREATE TABLE t (a INT, b VARCHAR(10))").columns
    c = parse_ddl("ALTER TABLE t RENAME COLUMN a TO a2")
    assert c.new_table is None
    cols = apply_change(base, c)
    assert [(x.name, x.spark_type) for x in cols] == [
        ("a2", "int"), ("b", "string"),
    ]
    # rename preserves the spec (type/nullability), only the name changes
    n = parse_ddl("ALTER TABLE t RENAME INDEX i1 TO i2")
    assert n.new_table is None and n.actions == []
    r = parse_ddl("ALTER TABLE t RENAME TO t2, RENAME KEY k1 TO k2")
    assert r.new_table == "t2"
    with pytest.raises(ValueError):
        apply_change(base, parse_ddl("ALTER TABLE t RENAME COLUMN nope TO x"))
    with pytest.raises(ValueError):
        apply_change(base, parse_ddl("ALTER TABLE t RENAME COLUMN a TO b"))
    with pytest.raises(ValueError):
        parse_ddl("ALTER TABLE t RENAME TO x y z")


def test_multi_table_drop_and_rename():
    d = parse_ddl("DROP TABLE IF EXISTS a, `sch`.`b`, c")
    assert d.kind == "drop" and d.tables == ["a", "b", "c"]
    r = parse_ddl("RENAME TABLE a TO a2, sch.b TO b2")
    assert r.renames == [("a", "a2"), ("b", "b2")]
    with pytest.raises(ValueError):
        parse_ddl("DROP TABLE a b")  # missing comma: malformed, not silent
    with pytest.raises(ValueError):
        parse_ddl("RENAME TABLE a")  # no TO clause


def test_modify_widening_enforced():
    """K6's widening matrix gates MODIFY/CHANGE: lossless widenings apply,
    a narrowing or cross-family change raises (the reference's
    fail-the-record path for lossy dialect ALTERs)."""
    base = parse_ddl(
        "CREATE TABLE t (a INT, b BIGINT, p DECIMAL(10,2), s VARCHAR(10))"
    ).columns
    # widenings apply
    cols = apply_change(base, parse_ddl(
        "ALTER TABLE t MODIFY a BIGINT, MODIFY p DECIMAL(14,4)"
    ))
    by = {c.name: c.spark_type for c in cols}
    assert by["a"] == "bigint" and by["p"] == "decimal(14,4)"
    # same-type MODIFY (nullability-only) is always fine
    apply_change(base, parse_ddl("ALTER TABLE t MODIFY s VARCHAR(500) NOT NULL"))
    # narrowing raises
    with pytest.raises(ValueError, match="lossless widening"):
        apply_change(base, parse_ddl("ALTER TABLE t MODIFY b INT"))
    with pytest.raises(ValueError, match="lossless widening"):
        apply_change(base, parse_ddl("ALTER TABLE t MODIFY p DECIMAL(8,2)"))
    with pytest.raises(ValueError, match="lossless widening"):
        apply_change(base, parse_ddl("ALTER TABLE t CHANGE s s2 INT"))
    # CHANGE with a widening still applies (rename + widen together)
    cols = apply_change(base, parse_ddl("ALTER TABLE t CHANGE a a2 BIGINT"))
    assert {c.name: c.spark_type for c in cols}["a2"] == "bigint"
    # escape hatch for intentionally lossy migrations
    cols = apply_change(
        base, parse_ddl("ALTER TABLE t MODIFY b INT"),
        enforce_widening=False,
    )
    assert {c.name: c.spark_type for c in cols}["b"] == "int"


def test_default_null_normalizes_to_none():
    c = parse_ddl(
        "CREATE TABLE t (a INT DEFAULT NULL, b INT DEFAULT -5, "
        "c DATETIME DEFAULT CURRENT_TIMESTAMP)"
    )
    by = {s.name: s.default for s in c.columns}
    assert by["a"] is None
    assert by["b"] == "-5"
    assert by["c"] == "CURRENT_TIMESTAMP"


def test_non_schema_statements_ignored():
    assert parse_ddl("CREATE INDEX i ON t (a)").kind == "ignore"
    assert parse_ddl("SET NAMES utf8").kind == "ignore"
    assert parse_ddl("GRANT ALL ON *.* TO x").kind == "ignore"
    assert parse_ddl("TRUNCATE TABLE t").kind == "truncate"
    d = parse_ddl("DROP TABLE IF EXISTS `sch`.`t`")
    assert d.kind == "drop" and d.table == "t"
    r = parse_ddl("RENAME TABLE a TO b")
    assert r.kind == "rename" and (r.table, r.new_table) == ("a", "b")


def test_tracker_versions_into_history(spark):
    """The applySchemaChange -> SchemaHistory.record loop: versions
    increment per table, renames carry version counters, schema_at
    resolves the columns in effect at any position."""
    from debezium_spark.schema.history import MemorySchemaHistory

    hist = MemorySchemaHistory(spark)
    trk = DdlSchemaTracker(hist)
    trk.apply("CREATE TABLE accounts (id BIGINT PRIMARY KEY, "
              "status VARCHAR(16), balance DOUBLE)", pos=0)
    trk.apply("ALTER TABLE accounts ADD COLUMN tier INT", pos=500)
    trk.apply("SET NAMES utf8", pos=600)            # neutral
    trk.apply("ALTER TABLE accounts DROP COLUMN status, "
              "RENAME TO accounts_v2", pos=900)
    rows = sorted(
        (r["table"], r["version"], r["columns_json"], r["valid_from_pos"])
        for r in hist.recover().collect()
    )
    assert rows == [
        ("accounts", 1, '["id", "status", "balance"]', 0),
        ("accounts", 2, '["id", "status", "balance", "tier"]', 500),
        ("accounts_v2", 3, '["id", "balance", "tier"]', 900),
    ]
    assert hist.schema_at("accounts", 700) == [
        "id", "status", "balance", "tier"
    ]
    with pytest.raises(KeyError):
        trk.apply("ALTER TABLE ghost ADD c INT", pos=1000)


def test_tracker_defaults_into_history(spark):
    """Column DEFAULTs propagate into the history row (the reference's
    Column.defaultValueExpression through SchemaHistory.record): an ALTER
    ADD .. DEFAULT populates defaults_json for that version."""
    import json as _json

    from debezium_spark.schema.history import MemorySchemaHistory

    hist = MemorySchemaHistory(spark)
    trk = DdlSchemaTracker(hist)
    trk.apply("CREATE TABLE t (id BIGINT PRIMARY KEY, s VARCHAR(8))", pos=0)
    trk.apply(
        "ALTER TABLE t ADD COLUMN qty INT NOT NULL DEFAULT 1, "
        "ADD created DATETIME DEFAULT CURRENT_TIMESTAMP",
        pos=10,
    )
    rows = {r["version"]: r for r in hist.recover().collect()}
    assert rows[1]["defaults_json"] is None
    assert _json.loads(rows[2]["defaults_json"]) == {
        "qty": "1", "created": "CURRENT_TIMESTAMP",
    }


def test_tracker_multi_drop_and_widening_quarantine(spark):
    from debezium_spark.schema.history import MemorySchemaHistory

    hist = MemorySchemaHistory(spark)
    trk = DdlSchemaTracker(hist)
    trk.apply("CREATE TABLE a (id INT PRIMARY KEY, v BIGINT)", pos=0)
    trk.apply("CREATE TABLE b (id INT PRIMARY KEY)", pos=1)
    # widening MODIFY applies and records a new version
    trk.apply("ALTER TABLE a MODIFY id BIGINT", pos=5)
    assert [c.spark_type for c in trk.table_columns("a")] == [
        "bigint", "bigint",
    ]
    # narrowing MODIFY quarantines: raises, history NOT rewritten
    n_before = hist.recover().count()
    with pytest.raises(ValueError, match="lossless widening"):
        trk.apply("ALTER TABLE a MODIFY v INT", pos=6)
    assert hist.recover().count() == n_before
    assert [c.spark_type for c in trk.table_columns("a")] == [
        "bigint", "bigint",
    ]
    # multi-table DROP removes every target
    trk.apply("DROP TABLE a, b", pos=9)
    for tbl in ("a", "b"):
        with pytest.raises(KeyError):
            trk.table_columns(tbl)


def test_generated_columns_parse():
    """MySQL 5.7+ generated columns: the expression is captured (the
    reference marks these via Column so sinks skip them on write) and is
    NOT mistaken for a DEFAULT."""
    c = parse_ddl(
        "CREATE TABLE t (a INT, b INT, "
        "s INT GENERATED ALWAYS AS (a + b) STORED, "
        "v VARCHAR(20) AS (concat(a, '-', b)) VIRTUAL, "
        "d INT DEFAULT 3)"
    )
    by = {s.name: s for s in c.columns}
    assert by["s"].generated == "a + b" and by["s"].default is None
    assert by["v"].generated == "concat(a, '-', b)"
    assert by["d"].generated is None and by["d"].default == "3"
    # ALTER ADD of a generated column flows through apply_change
    cols = apply_change(
        c.columns,
        parse_ddl("ALTER TABLE t ADD g BIGINT GENERATED ALWAYS AS (a * 2)"),
    )
    assert {x.name: x.generated for x in cols}["g"] == "a * 2"


def test_alter_column_set_and_drop_default(spark):
    """MySQL ALTER TABLE .. ALTER [COLUMN] c SET DEFAULT / DROP DEFAULT —
    the default-only ALTER that must not touch the type — and its
    propagation into the history row's defaults_json."""
    import json as _json

    from debezium_spark.schema.history import MemorySchemaHistory

    base = parse_ddl("CREATE TABLE t (a INT, b INT DEFAULT 7)").columns
    cols = apply_change(
        base, parse_ddl("ALTER TABLE t ALTER COLUMN a SET DEFAULT 5")
    )
    by = {c.name: c for c in cols}
    assert by["a"].default == "5" and by["a"].spark_type == "int"
    cols = apply_change(cols, parse_ddl("ALTER TABLE t ALTER b DROP DEFAULT"))
    assert {c.name: c.default for c in cols} == {"a": "5", "b": None}
    with pytest.raises(ValueError):
        apply_change(base, parse_ddl("ALTER TABLE t ALTER nope SET DEFAULT 1"))
    with pytest.raises(ValueError):
        parse_ddl("ALTER TABLE t ALTER COLUMN a SET GIBBERISH")

    hist = MemorySchemaHistory(spark)
    trk = DdlSchemaTracker(hist)
    trk.apply("CREATE TABLE t (a INT, b INT DEFAULT 7)", pos=0)
    trk.apply("ALTER TABLE t ALTER COLUMN a SET DEFAULT 5, "
              "ALTER b DROP DEFAULT", pos=10)
    rows = {r["version"]: r for r in hist.recover().collect()}
    assert _json.loads(rows[1]["defaults_json"]) == {"b": "7"}
    assert _json.loads(rows[2]["defaults_json"]) == {"a": "5"}


def test_default_literal_containing_as_parens_is_not_generated():
    """A plain column whose COMMENT/DEFAULT literal contains "as (x)"
    must NOT be misread as a generated column (which would silently
    discard its real DEFAULT from schema history)."""
    from debezium_spark.schema.ddl import parse_ddl

    ch = parse_ddl(
        "CREATE TABLE t ("
        " id INT PRIMARY KEY,"
        " note VARCHAR(40) DEFAULT 'computed as (x)' NOT NULL,"
        " doubled INT GENERATED ALWAYS AS (id * 2) STORED"
        ")"
    )
    cols = {c.name: c for c in ch.columns}
    assert cols["note"].generated is None
    assert cols["note"].default == "'computed as (x)'"
    assert cols["doubled"].generated == "id * 2"
    assert cols["doubled"].default is None
