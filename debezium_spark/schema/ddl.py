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
  ``CHANGE [COLUMN] old new TYPE``, ``RENAME [TO] t2``
  (comma-separated multi-actions supported)
* ``DROP TABLE [IF EXISTS] t`` / ``RENAME TABLE a TO b``
* ``TRUNCATE TABLE t`` (no schema effect; parsed so the stream doesn't
  need pre-filtering)

Everything else (indexes, constraints, engines, charsets, partitions)
parses to ``kind='ignore'`` — schema-neutral for capture purposes.

Type mapping follows the reference's JdbcValueConverters defaults
(TINYINT(1) → boolean, DATETIME/TIMESTAMP → timestamp, TEXT/VARCHAR →
string, DECIMAL(p,s) preserved).
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


@dataclass
class DdlChange:
    kind: str  # create | alter | drop | rename | truncate | ignore
    table: str | None = None
    columns: list[ColumnSpec] = field(default_factory=list)
    actions: list[tuple] = field(default_factory=list)  # alter sub-ops
    new_table: str | None = None


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
    rf"^({_IDENT})\s+([A-Za-z]+(?:\s*\(\s*\d+\s*(?:,\s*\d+\s*)?\))?"
    r"(?:\s+UNSIGNED)?)\s*(.*)$",
    re.I | re.S,
)
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
    dm = _DEFAULT_RE.search(rest)
    return ColumnSpec(
        name=name,
        type_text=type_text.strip(),
        spark_type=map_type(type_text),
        nullable=" NOT NULL " not in re.sub(r"\s+", " ", rest_u),
        primary_key="PRIMARY KEY" in re.sub(r"\s+", " ", rest_u),
        default=dm.group(1) if dm else None,
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
                old = _unquote(om.group(1))
                spec = _parse_column_def(om.group(2))
                actions.append(("change", old, spec))
            elif au.startswith("RENAME"):
                nm = re.sub(r"^RENAME\s+(TO\s+|AS\s+)?", "", act, flags=re.I)
                new_table = _unquote(nm.strip().split(".")[-1])
                actions.append(("rename", new_table))
            # everything else (engine/charset/index options): schema-neutral
        return DdlChange(
            kind="alter", table=table, actions=actions, new_table=new_table
        )

    if u.startswith("DROP TABLE"):
        m = re.match(
            rf"DROP\s+TABLE\s+(?:IF\s+EXISTS\s+)?({_IDENT}(?:\.{_IDENT})?)",
            s,
            re.I,
        )
        return DdlChange(kind="drop", table=_unquote(m.group(1).split(".")[-1]))

    if u.startswith("RENAME TABLE"):
        m = re.match(
            rf"RENAME\s+TABLE\s+({_IDENT}(?:\.{_IDENT})?)\s+TO\s+({_IDENT}(?:\.{_IDENT})?)",
            s,
            re.I,
        )
        return DdlChange(
            kind="rename",
            table=_unquote(m.group(1).split(".")[-1]),
            new_table=_unquote(m.group(2).split(".")[-1]),
        )

    if u.startswith("TRUNCATE"):
        m = re.search(rf"({_IDENT}(?:\.{_IDENT})?)\s*$", s)
        return DdlChange(
            kind="truncate", table=_unquote(m.group(1).split(".")[-1])
        )

    return DdlChange(kind="ignore")


def apply_change(
    columns: list[ColumnSpec], change: DdlChange
) -> list[ColumnSpec]:
    """Apply one parsed ALTER to a column list (the relational-model
    update MySqlDatabaseSchema performs per DDL event). Pure function —
    returns a new list."""
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
            cols = [spec if c.name == spec.name else c for c in cols]
        elif action[0] == "change":
            _, old, spec = action
            cols = [spec if c.name == old else c for c in cols]
        # rename handled by the tracker (table-level)
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
            self._state.pop(change.table, None)
            self._versions.pop(change.table, None)
        elif change.kind == "rename":
            cols = self._state.pop(change.table)
            self._state[change.new_table] = cols
            self._versions[change.new_table] = self._versions.pop(
                change.table
            )
            self._record(change.new_table, pos)
        return change

    def _record(self, table: str, pos: int) -> None:
        v = self._versions.get(table, 0) + 1
        self._versions[table] = v
        self.history.record(
            table, v, [c.name for c in self._state[table]], pos
        )
