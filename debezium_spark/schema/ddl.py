"""Minimal DDL-text parsing: the MySQL-ish CREATE/ALTER/DROP/RENAME TABLE
subset a binlog carries, feeding the schema-history registry.

Reference scope: the reference parses full MySQL DDL with a 5,660-line
ANTLR grammar (``debezium-ddl-parser/.../MySqlParser.g4``) and applies
the parsed changes to its in-memory relational model
(``MySqlDatabaseSchema`` → ``SchemaHistory.record``). SURVEY §7 step 6
descopes the full grammar; this module covers the statements that
actually change capture schemas — column set and types — so a MySQL
user whose log carries DDL text gets correct schema versions:

* ``CREATE TABLE t (col TYPE [NOT NULL] [DEFAULT x] [PRIMARY KEY] ...,
  PRIMARY KEY (a, b))``
* ``ALTER TABLE t ADD [COLUMN] c TYPE [FIRST | AFTER col]``,
  ``DROP [COLUMN] c``, ``MODIFY [COLUMN] c TYPE``,
  ``CHANGE [COLUMN] old new TYPE``, ``RENAME COLUMN a TO b`` (MySQL 8),
  ``RENAME [TO|AS] t2`` (comma-separated multi-actions supported;
  ``RENAME INDEX/KEY`` is schema-neutral)
* ``DROP TABLE [IF EXISTS] a[, b...]`` / ``RENAME TABLE a TO b[, c TO d...]``
* ``TRUNCATE TABLE t`` (no schema effect; parsed so the stream doesn't
  need pre-filtering)

Everything else (indexes, constraints, engines, charsets, partitions)
parses to ``kind='ignore'`` — schema-neutral for capture purposes.

Type mapping follows the reference's JdbcValueConverters defaults
(TINYINT(1) → boolean, DATETIME/TIMESTAMP → timestamp, TEXT/VARCHAR →
string, DECIMAL(p,s) preserved).

``MODIFY``/``CHANGE`` type changes are validated against the K6 widening
matrix (`schema/evolution.py`): a lossless widening applies, anything
else raises — the reference's fail-the-record path for lossy dialect
ALTERs, so bad DDL quarantines instead of silently rewriting history.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field


@dataclass
class ColumnSpec:
    name: str
    type_text: str
    spark_type: str
    nullable: bool = True
    primary_key: bool = False
    default: str | None = None
    #: generation expression text for GENERATED ALWAYS AS (...) columns
    #: (MySQL 5.7+; the reference's parser marks these so sinks skip them
    #: on write) — None for plain columns
    generated: str | None = None
    #: ENUM/SET label list in declaration order (the reference stores
    #: these as the column's enumValues in schema history — the binlog
    #: wire carries only 1-based ordinals / bitmasks, so label resolution
    #: is impossible without them) — None for non-enum columns
    enum_values: list[str] | None = None


@dataclass
class DdlChange:
    kind: str  # create | alter | drop | rename | truncate | ignore
    table: str | None = None
    columns: list[ColumnSpec] = field(default_factory=list)
    actions: list[tuple] = field(default_factory=list)  # alter sub-ops
    new_table: str | None = None
    #: every target of a multi-table DROP (table = first, for compat)
    tables: list[str] = field(default_factory=list)
    #: every (old, new) pair of a multi-table RENAME TABLE
    renames: list[tuple[str, str]] = field(default_factory=list)


_TYPE_MAP = {
    "TINYINT": "tinyint",
    "SMALLINT": "smallint",
    "MEDIUMINT": "int",
    "INT": "int",
    "INTEGER": "int",
    "BIGINT": "bigint",
    "FLOAT": "float",
    "DOUBLE": "double",
    "REAL": "double",
    "BOOLEAN": "boolean",
    "BOOL": "boolean",
    "DATE": "date",
    "DATETIME": "timestamp",
    "TIMESTAMP": "timestamp",
    "TIME": "string",
    "YEAR": "int",
    "CHAR": "string",
    "VARCHAR": "string",
    "TINYTEXT": "string",
    "TEXT": "string",
    "MEDIUMTEXT": "string",
    "LONGTEXT": "string",
    "JSON": "string",
    "UUID": "string",
    "ENUM": "string",
    "SET": "string",
    "BINARY": "binary",
    "VARBINARY": "binary",
    "TINYBLOB": "binary",
    "BLOB": "binary",
    "MEDIUMBLOB": "binary",
    "LONGBLOB": "binary",
    "BIT": "binary",
}

_IDENT = r"(?:`[^`]+`|\"[^\"]+\"|[A-Za-z_][A-Za-z0-9_$]*)"
_TYPE_RE = re.compile(
    r"([A-Za-z]+)\s*(?:\(\s*(\d+)\s*(?:,\s*(\d+)\s*)?\))?", re.I
)


def _unquote(ident: str) -> str:
    if ident and ident[0] in "`\"" and ident[-1] == ident[0]:
        return ident[1:-1]
    return ident


def map_type(type_text: str) -> str:
    """MySQL column type text → Spark SQL type DDL (the
    JdbcValueConverters default mapping: TINYINT(1) is a boolean flag,
    DECIMAL keeps precision/scale, unsigned widths are absorbed by the
    signed Spark type one size up)."""
    m = _TYPE_RE.match(type_text.strip())
    if not m:
        raise ValueError(f"unparseable column type: {type_text!r}")
    base, p, s = m.group(1).upper(), m.group(2), m.group(3)
    unsigned = "UNSIGNED" in type_text.upper()
    if base in ("DECIMAL", "NUMERIC", "DEC"):
        return f"decimal({p or 10},{s or 0})"
    if base == "TINYINT" and p == "1":
        return "boolean"
    if unsigned and base in ("INT", "INTEGER", "MEDIUMINT"):
        return "bigint"
    if unsigned and base == "BIGINT":
        return "decimal(20,0)"
    if base in _TYPE_MAP:
        return _TYPE_MAP[base]
    raise ValueError(f"unsupported column type: {type_text!r}")


def _split_top_level(s: str, sep: str = ",") -> list[str]:
    """Split on ``sep`` outside parens/quotes (column defs contain both)."""
    parts, depth, buf, quote = [], 0, [], None
    for ch in s:
        if quote:
            buf.append(ch)
            if ch == quote:
                quote = None
            continue
        if ch in "'\"`":
            quote = ch
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == sep and depth == 0:
            parts.append("".join(buf).strip())
            buf = []
            continue
        buf.append(ch)
    tail = "".join(buf).strip()
    if tail:
        parts.append(tail)
    return parts


_COL_DEF_RE = re.compile(
    rf"^({_IDENT})\s+([A-Za-z]+(?:\s*\(\s*(?:\d+\s*(?:,\s*\d+\s*)?"
    r"|'(?:[^']|'')*'(?:\s*,\s*'(?:[^']|'')*')*\s*)\))?"
    r"(?:\s+UNSIGNED)?)\s*(.*)$",
    re.I | re.S,
)
_ENUM_SET_RE = re.compile(r"(?:ENUM|SET)\s*\((.*)\)\s*$", re.I | re.S)
_DEFAULT_RE = re.compile(
    r"\bDEFAULT\s+('(?:[^']|'')*'|[A-Za-z0-9_.+-]+(?:\(\))?)", re.I
)


def _parse_column_def(text: str) -> ColumnSpec | None:
    """One CREATE-TABLE element → ColumnSpec, or None for table-level
    constraints (handled by the caller)."""
    head = text.strip().split(None, 1)[0].upper().rstrip("(")
    if head in (
        "PRIMARY", "UNIQUE", "KEY", "INDEX", "CONSTRAINT", "FOREIGN",
        "FULLTEXT", "SPATIAL", "CHECK",
    ):
        return None
    m = _COL_DEF_RE.match(text.strip())
    if not m:
        raise ValueError(f"unparseable column definition: {text!r}")
    name, type_text, rest = _unquote(m.group(1)), m.group(2), m.group(3)
    rest_u = f" {rest.upper()} "
    # generated column: [GENERATED ALWAYS] AS (expr) [VIRTUAL|STORED].
    # Position-anchored: in MySQL grammar the AS clause follows the type
    # (optionally after COLLATE) — an un-anchored search would misread a
    # COMMENT/DEFAULT string literal containing "as (x)" as a generation
    # expression and silently drop the real default.
    gm = re.match(
        r"(?:COLLATE\s+\S+\s+)?(?:GENERATED\s+ALWAYS\s+)?"
        r"AS\s*\((.*)\)\s*(?:VIRTUAL|STORED)?",
        rest.strip(),
        re.I | re.S,
    )
    generated = gm.group(1).strip() if gm else None
    dm = _DEFAULT_RE.search(rest)
    # DEFAULT NULL is the absence of a default, not the literal "NULL"
    # (Column.defaultValueExpression is null in the reference too).
    default = dm.group(1) if dm else None
    if default is not None and default.upper() == "NULL":
        default = None
    if generated is not None:
        default = None  # a generation expression is not a default
    # ENUM/SET label lists: the wire carries ordinals/bitmasks only, so
    # schema history must keep the declaration-order labels (the
    # reference's enumValues) for the sink to resolve values.
    em = _ENUM_SET_RE.match(type_text.strip())
    enum_values = (
        [v.strip()[1:-1].replace("''", "'")
         for v in _split_top_level(em.group(1))]
        if em
        else None
    )
    return ColumnSpec(
        name=name,
        type_text=type_text.strip(),
        spark_type=map_type(type_text),
        nullable=" NOT NULL " not in re.sub(r"\s+", " ", rest_u),
        primary_key="PRIMARY KEY" in re.sub(r"\s+", " ", rest_u),
        default=default,
        generated=generated,
        enum_values=enum_values,
    )


def parse_ddl(statement: str) -> DdlChange:
    """Parse one DDL statement into a structured change. Statements
    outside the supported subset return ``kind='ignore'`` (never raise on
    a whole statement class — a binlog carries plenty of schema-neutral
    DDL); malformed statements WITHIN the subset raise ValueError so bad
    input quarantines instead of corrupting the history."""
    s = statement.strip().rstrip(";").strip()
    u = re.sub(r"\s+", " ", s.upper())

    if u.startswith("CREATE TABLE"):
        m = re.match(
            rf"CREATE\s+TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?({_IDENT}(?:\.{_IDENT})?)\s*\((.*)\)[^)]*$",
            s,
            re.I | re.S,
        )
        if not m:
            raise ValueError(f"unparseable CREATE TABLE: {statement!r}")
        table = _unquote(m.group(1).split(".")[-1])
        cols: list[ColumnSpec] = []
        pk_cols: list[str] = []
        for element in _split_top_level(m.group(2)):
            eu = element.upper()
            if eu.startswith("PRIMARY KEY"):
                inner = element[element.index("(") + 1 : element.rindex(")")]
                pk_cols = [_unquote(c.strip()) for c in inner.split(",")]
                continue
            spec = _parse_column_def(element)
            if spec is not None:
                cols.append(spec)
        for c in cols:
            if c.name in pk_cols:
                c.primary_key = True
                c.nullable = False
        return DdlChange(kind="create", table=table, columns=cols)

    if u.startswith("ALTER TABLE"):
        m = re.match(
            rf"ALTER\s+TABLE\s+({_IDENT}(?:\.{_IDENT})?)\s+(.*)$", s, re.I | re.S
        )
        if not m:
            raise ValueError(f"unparseable ALTER TABLE: {statement!r}")
        table = _unquote(m.group(1).split(".")[-1])
        actions: list[tuple] = []
        new_table = None
        for act in _split_top_level(m.group(2)):
            au = re.sub(r"\s+", " ", act.upper())
            if au.startswith("ADD COLUMN ") or (
                au.startswith("ADD ")
                and not au.startswith(
                    ("ADD PRIMARY", "ADD UNIQUE", "ADD INDEX", "ADD KEY",
                     "ADD CONSTRAINT", "ADD FOREIGN", "ADD FULLTEXT")
                )
            ):
                body = re.sub(r"^ADD\s+(COLUMN\s+)?", "", act, flags=re.I)
                pos = None
                pm = re.search(
                    rf"\s+(FIRST|AFTER\s+({_IDENT}))\s*$", body, re.I
                )
                if pm:
                    pos = (
                        "first"
                        if pm.group(1).upper() == "FIRST"
                        else _unquote(pm.group(2))
                    )
                    body = body[: pm.start()]
                spec = _parse_column_def(body)
                actions.append(("add", spec, pos))
            elif au.startswith("DROP COLUMN ") or (
                au.startswith("DROP ")
                and not au.startswith(
                    ("DROP PRIMARY", "DROP INDEX", "DROP KEY",
                     "DROP CONSTRAINT", "DROP FOREIGN")
                )
            ):
                name = re.sub(r"^DROP\s+(COLUMN\s+)?", "", act, flags=re.I)
                actions.append(("drop", _unquote(name.strip())))
            elif au.startswith("MODIFY "):
                body = re.sub(r"^MODIFY\s+(COLUMN\s+)?", "", act, flags=re.I)
                spec = _parse_column_def(body)
                actions.append(("modify", spec))
            elif au.startswith("CHANGE "):
                body = re.sub(r"^CHANGE\s+(COLUMN\s+)?", "", act, flags=re.I)
                om = re.match(rf"({_IDENT})\s+(.*)$", body, re.S)
                if not om:
                    raise ValueError(f"unparseable CHANGE action: {act!r}")
                old = _unquote(om.group(1))
                spec = _parse_column_def(om.group(2))
                actions.append(("change", old, spec))
            elif au.startswith("ALTER "):
                # ALTER [COLUMN] c SET DEFAULT <lit> | DROP DEFAULT
                am = re.match(
                    rf"^ALTER\s+(?:COLUMN\s+)?({_IDENT})\s+"
                    rf"(SET\s+DEFAULT\s+(.+)|DROP\s+DEFAULT)\s*$",
                    act.strip(),
                    re.I | re.S,
                )
                if not am:
                    raise ValueError(f"unparseable ALTER action: {act!r}")
                col = _unquote(am.group(1))
                if am.group(2).upper().startswith("DROP"):
                    actions.append(("set_default", col, None))
                else:
                    lit = am.group(3).strip()
                    actions.append(
                        ("set_default", col,
                         None if lit.upper() == "NULL" else lit)
                    )
            elif au.startswith("RENAME"):
                # Three distinct MySQL forms share the keyword: RENAME
                # COLUMN a TO b (a column op), RENAME INDEX/KEY
                # (schema-neutral), and RENAME [TO|AS] t2 (table rename).
                # Matching them all as a table rename corrupts history.
                if re.match(r"^RENAME\s+(INDEX|KEY)\b", au):
                    continue
                cm = re.match(
                    rf"^RENAME\s+COLUMN\s+({_IDENT})\s+TO\s+({_IDENT})\s*$",
                    act.strip(),
                    re.I,
                )
                if cm:
                    actions.append(
                        ("rename_col", _unquote(cm.group(1)),
                         _unquote(cm.group(2)))
                    )
                    continue
                nm = re.match(
                    rf"^RENAME\s+(?:TO\s+|AS\s+)?({_IDENT}(?:\.{_IDENT})?)\s*$",
                    act.strip(),
                    re.I,
                )
                if not nm:
                    raise ValueError(f"unparseable RENAME action: {act!r}")
                new_table = _unquote(nm.group(1).split(".")[-1])
                actions.append(("rename", new_table))
            # everything else (engine/charset/index options): schema-neutral
        return DdlChange(
            kind="alter", table=table, actions=actions, new_table=new_table
        )

    if u.startswith("DROP TABLE"):
        body = re.sub(
            r"^DROP\s+TABLE\s+(IF\s+EXISTS\s+)?", "", s, flags=re.I
        )
        tables: list[str] = []
        for target in _split_top_level(body):
            m = re.match(rf"^({_IDENT}(?:\.{_IDENT})?)$", target.strip())
            if not m:
                raise ValueError(f"unparseable DROP TABLE: {statement!r}")
            tables.append(_unquote(m.group(1).split(".")[-1]))
        if not tables:
            raise ValueError(f"unparseable DROP TABLE: {statement!r}")
        return DdlChange(kind="drop", table=tables[0], tables=tables)

    if u.startswith("RENAME TABLE"):
        body = re.sub(r"^RENAME\s+TABLE\s+", "", s, flags=re.I)
        renames: list[tuple[str, str]] = []
        for pair in _split_top_level(body):
            m = re.match(
                rf"^({_IDENT}(?:\.{_IDENT})?)\s+TO\s+({_IDENT}(?:\.{_IDENT})?)$",
                pair.strip(),
                re.I,
            )
            if not m:
                raise ValueError(f"unparseable RENAME TABLE: {statement!r}")
            renames.append(
                (_unquote(m.group(1).split(".")[-1]),
                 _unquote(m.group(2).split(".")[-1]))
            )
        if not renames:
            raise ValueError(f"unparseable RENAME TABLE: {statement!r}")
        return DdlChange(
            kind="rename",
            table=renames[0][0],
            new_table=renames[0][1],
            renames=renames,
        )

    if u.startswith("TRUNCATE"):
        m = re.search(rf"({_IDENT}(?:\.{_IDENT})?)\s*$", s)
        if not m:
            raise ValueError(f"unparseable TRUNCATE: {statement!r}")
        return DdlChange(
            kind="truncate", table=_unquote(m.group(1).split(".")[-1])
        )

    return DdlChange(kind="ignore")


def _to_dtype(spark_type: str):
    """map_type's closed output set → a DataType instance (no session
    needed, unlike DataType.fromDDL which parses through the JVM)."""
    from pyspark.sql import types as T

    m = re.match(r"^decimal\((\d+),(\d+)\)$", spark_type)
    if m:
        return T.DecimalType(int(m.group(1)), int(m.group(2)))
    return {
        "tinyint": T.ByteType(),
        "smallint": T.ShortType(),
        "int": T.IntegerType(),
        "bigint": T.LongType(),
        "float": T.FloatType(),
        "double": T.DoubleType(),
        "boolean": T.BooleanType(),
        "date": T.DateType(),
        "timestamp": T.TimestampType(),
        "string": T.StringType(),
        "binary": T.BinaryType(),
    }[spark_type]


def _check_widen(old: ColumnSpec, new: ColumnSpec) -> None:
    """Validate a MODIFY/CHANGE type transition against the K6 widening
    matrix (`schema/evolution.py`): lossless widenings apply, anything
    else raises — the reference refuses lossy dialect ALTERs (the JDBC
    sink's fail-the-record path), so a narrowing MODIFY quarantines
    instead of silently rewriting history."""
    if old.spark_type == new.spark_type:
        return
    from debezium_spark.schema.evolution import can_widen

    if not can_widen(_to_dtype(old.spark_type), _to_dtype(new.spark_type)):
        raise ValueError(
            f"lossy type change for column {new.name!r}: "
            f"{old.spark_type} -> {new.spark_type} is not a lossless widening"
        )


def apply_change(
    columns: list[ColumnSpec],
    change: DdlChange,
    *,
    enforce_widening: bool = True,
) -> list[ColumnSpec]:
    """Apply one parsed ALTER to a column list (the relational-model
    update MySqlDatabaseSchema performs per DDL event). Pure function —
    returns a new list. MODIFY/CHANGE type transitions are validated
    against the widening matrix unless ``enforce_widening=False``."""
    import dataclasses

    cols = list(columns)
    for action in change.actions:
        if action[0] == "add":
            _, spec, pos = action
            if any(c.name == spec.name for c in cols):
                raise ValueError(f"duplicate column {spec.name!r}")
            if pos is None:
                cols.append(spec)
            elif pos == "first":
                cols.insert(0, spec)
            else:
                idx = next(
                    i for i, c in enumerate(cols) if c.name == pos
                )
                cols.insert(idx + 1, spec)
        elif action[0] == "drop":
            _, name = action
            if not any(c.name == name for c in cols):
                raise ValueError(f"drop of unknown column {name!r}")
            cols = [c for c in cols if c.name != name]
        elif action[0] == "modify":
            _, spec = action
            old = next((c for c in cols if c.name == spec.name), None)
            if old is None:
                raise ValueError(f"MODIFY of unknown column {spec.name!r}")
            if enforce_widening:
                _check_widen(old, spec)
            cols = [spec if c.name == spec.name else c for c in cols]
        elif action[0] == "change":
            _, old_name, spec = action
            old = next((c for c in cols if c.name == old_name), None)
            if old is None:
                raise ValueError(f"CHANGE of unknown column {old_name!r}")
            if enforce_widening:
                _check_widen(old, spec)
            cols = [spec if c.name == old_name else c for c in cols]
        elif action[0] == "set_default":
            _, name, lit = action
            old = next((c for c in cols if c.name == name), None)
            if old is None:
                raise ValueError(
                    f"SET/DROP DEFAULT of unknown column {name!r}"
                )
            updated = dataclasses.replace(old, default=lit)
            cols = [updated if c.name == name else c for c in cols]
        elif action[0] == "rename_col":
            _, old_name, new_name = action
            old = next((c for c in cols if c.name == old_name), None)
            if old is None:
                raise ValueError(
                    f"RENAME COLUMN of unknown column {old_name!r}"
                )
            if any(c.name == new_name for c in cols):
                raise ValueError(f"duplicate column {new_name!r}")
            renamed = dataclasses.replace(old, name=new_name)
            cols = [renamed if c.name == old_name else c for c in cols]
        # table-level rename handled by the tracker
    return cols


class DdlSchemaTracker:
    """Consume a (pos, ddl_text) stream in log order and maintain
    versioned schemas in a SchemaHistoryBackend — the
    ``MySqlDatabaseSchema.applySchemaChange`` → ``SchemaHistory.record``
    loop. DDL events are rare and strictly ordered, so this is a
    driver-side fold by design (the reference processes DDL serially on
    the single binlog reader thread for the same reason)."""

    def __init__(self, history):
        self.history = history
        self._state: dict[str, list[ColumnSpec]] = {}
        self._versions: dict[str, int] = {}

    def table_columns(self, table: str) -> list[ColumnSpec]:
        return list(self._state[table])

    def apply(self, ddl_text: str, pos: int) -> DdlChange:
        change = parse_ddl(ddl_text)
        if change.kind in ("ignore", "truncate"):
            return change
        if change.kind == "create":
            self._state[change.table] = list(change.columns)
            self._record(change.table, pos)
        elif change.kind == "alter":
            if change.table not in self._state:
                raise KeyError(f"ALTER of unknown table {change.table!r}")
            cols = apply_change(self._state[change.table], change)
            if change.new_table:
                del self._state[change.table]
                self._state[change.new_table] = cols
                self._versions[change.new_table] = self._versions.pop(
                    change.table
                )
                self._record(change.new_table, pos)
            else:
                self._state[change.table] = cols
                self._record(change.table, pos)
        elif change.kind == "drop":
            for tbl in change.tables or [change.table]:
                self._state.pop(tbl, None)
                self._versions.pop(tbl, None)
        elif change.kind == "rename":
            for old, new in change.renames or [(change.table, change.new_table)]:
                cols = self._state.pop(old)
                self._state[new] = cols
                self._versions[new] = self._versions.pop(old)
                self._record(new, pos)
        return change

    def _record(self, table: str, pos: int) -> None:
        v = self._versions.get(table, 0) + 1
        self._versions[table] = v
        cols = self._state[table]
        defaults = {
            c.name: c.default for c in cols if c.default is not None
        }
        self.history.record(
            table, v, [c.name for c in cols], pos, defaults or None
        )
