"""S23 — Oracle LogMiner redo-SQL DML parsing (the value-extraction half
of S9's commit-ordered emission).

Reference: ``debezium-connector-oracle/.../logminer/parser/
LogMinerDmlParser.java`` — statement dispatch on the first char (:80-88),
quoted table names (:220-238), INSERT column-list + values clauses
(:248-385), UPDATE set-clause with the explicit-NULL sentinel and the
unset-column copy-from-before reconciliation (:160-180, :391-585), WHERE
equality/IS NULL pairs (:593-741), the ``Unsupported Type`` marker and the
``ORA_ARCHIVE_STATE`` skip.

LogMiner's reconstructed SQL is machine-generated and regular: identifiers
are always double-quoted, strings single-quoted with ``''`` escapes,
function values (``TO_TIMESTAMP('…','…')``, ``HEXTORAW('…')``,
``EMPTY_BLOB()``) appear as unquoted call text whose parens/quotes must be
skipped, and clauses use exactly ``" set "``/``" where "``/``" values "``
with ``' = '`` and ``, `` separators. This module parses that grammar
strictly (the reference's relaxed-quote heuristics guard a LogMiner
misconfiguration we do not fixture); anything outside it raises
ValueError so bad redo quarantines instead of corrupting row images —
``or`` disjunctions in WHERE included (the reference only ever emits
``and``-joined PK/row predicates).

Row-image semantics (LogMinerDmlEntryImpl.for*):

* INSERT → after = VALUES list mapped by the column-list, before = null.
* UPDATE → before = WHERE pairs; after = SET pairs, where an explicit
  ``NULL`` clears the column and every column NOT in SET copies its
  before value (the reference's sentinel reconciliation).
* DELETE → before = WHERE pairs, after = null.
* ``NULL`` / ``Unsupported Type`` values and ``IS NULL`` predicates →
  null cells; non-string values (numbers, function calls) surface as
  their SQL text — downstream converters own typing, exactly like the
  reference hands Objects to its value converters.

Spark shape: one Arrow-batched ``mapInPandas`` kernel over the redo rows
(never a per-row UDF); the table's column order is a kernel closure (the
same bounded budget as the binlog TABLE_MAP registry).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_UNSUPPORTED_TYPE = "Unsupported Type"
_ORA_ARCHIVE_STATE = "ORA_ARCHIVE_STATE"


def _parse_table_name(sql: str, i: int) -> tuple[str, str, int]:
    """``"SCHEMA"."TABLE"`` (quotes mandatory in LogMiner output)."""
    start = i
    in_quote = False
    while i < len(sql):
        c = sql[i]
        if c == '"':
            in_quote = not in_quote
        elif c in (" ", "(") and not in_quote:
            break
        i += 1
    ident = sql[start:i]
    parts = [p.strip('"') for p in ident.split(".")]
    if len(parts) != 2 or not all(parts):
        raise ValueError(f"unparseable table identifier {ident!r}")
    return parts[0], parts[1], i


def _scan_quoted(sql: str, i: int) -> tuple[str, int]:
    """Single-quoted string starting at sql[i] == "'"; ``''`` unescapes."""
    out = []
    i += 1
    while i < len(sql):
        c = sql[i]
        if c == "'":
            if i + 1 < len(sql) and sql[i + 1] == "'":
                out.append("'")
                i += 2
                continue
            return "".join(out), i + 1
        out.append(c)
        i += 1
    raise ValueError("unterminated string literal in redo SQL")


def _scan_bare(sql: str, i: int, stops: str) -> tuple[str, int]:
    """Unquoted value (number, NULL, function call): read to a top-level
    stop char, skipping nested parens and any quoted text inside them."""
    start = i
    nested = 0
    in_quote = False
    while i < len(sql):
        c = sql[i]
        if in_quote:
            if c == "'":
                if i + 1 < len(sql) and sql[i + 1] == "'":
                    i += 2
                    continue
                in_quote = False
        elif c == "'":
            in_quote = True
        elif c == "(":
            nested += 1
        elif c == ")":
            if nested == 0:
                break
            nested -= 1
        elif c in stops and nested == 0:
            break
        i += 1
    return sql[start:i], i


def _parse_insert(sql: str, columns: list[str]) -> dict:
    i = len("insert into ")
    schema, table, i = _parse_table_name(sql, i)
    # column list: ("C1","C2",...)
    if sql[i] != "(":
        raise ValueError("INSERT without a column-list clause")
    names: list[str] = []
    i += 1
    while sql[i] != ")":
        if sql[i] == '"':
            end = sql.index('"', i + 1)
            names.append(sql[i + 1 : end])
            i = end + 1
        else:
            i += 1
    i += 1
    if not sql.startswith(" values ", i):
        raise ValueError("INSERT without a values clause")
    i += len(" values ")
    if sql[i] != "(":
        raise ValueError("INSERT values clause must be parenthesized")
    i += 1
    after: dict[str, str | None] = {}
    for name in names:
        while i < len(sql) and sql[i] == " ":
            i += 1
        if sql[i] == "'":
            v, i = _scan_quoted(sql, i)
        else:
            v, i = _scan_bare(sql, i, ",")
            v = None if v in ("NULL", _UNSUPPORTED_TYPE) else v
        if name != _ORA_ARCHIVE_STATE:
            after[name] = v
        while i < len(sql) and sql[i] in ", ":
            i += 1
    row = [after.get(c) for c in columns]
    return {"op": "c", "schema": schema, "table": table,
            "before": None, "after": row}


def _parse_pairs(sql: str, i: int, *, set_clause: bool) -> tuple[dict, int]:
    """``"C" = value`` pairs: ``, ``-joined (SET) or ``and ``-joined
    (WHERE, which also allows ``"C" IS NULL``). Returns {name: value}
    with the explicit-NULL sentinel preserved as None-with-presence."""
    pairs: dict[str, str | None] = {}
    n = len(sql)
    while i < n:
        while i < n and sql[i] == " ":
            i += 1
        if i >= n or sql[i] == ";":
            break
        if not set_clause and sql.startswith("or ", i):
            raise ValueError(
                "OR disjunction in redo WHERE clause is unsupported"
            )
        if not set_clause and sql.startswith("and ", i):
            i += 4
            continue
        if set_clause and sql[i] == ",":
            i += 1
            continue
        if set_clause and sql.startswith("where ", i):
            break
        if sql[i] != '"':
            raise ValueError(
                f"expected a quoted column name at …{sql[i:i + 25]!r}"
            )
        end = sql.index('"', i + 1)
        name = sql[i + 1 : end]
        i = end + 1
        while i < n and sql[i] == " ":
            i += 1
        if not set_clause and sql.startswith("IS NULL", i):
            pairs[name] = None
            i += len("IS NULL")
            continue
        if sql[i] != "=":
            raise ValueError(f"expected '=' after column {name!r}")
        i += 1
        while i < n and sql[i] == " ":
            i += 1
        if sql[i] == "'":
            v, i = _scan_quoted(sql, i)
        else:
            v, i = _scan_bare(sql, i, ", ;")
            v = None if v in ("NULL", _UNSUPPORTED_TYPE) else v
        if name != _ORA_ARCHIVE_STATE:
            pairs[name] = v
    return pairs, i


def _parse_update(sql: str, columns: list[str]) -> dict:
    i = len("update ")
    schema, table, i = _parse_table_name(sql, i)
    if not sql.startswith(" set ", i):
        raise ValueError("UPDATE without a set clause")
    set_pairs, i = _parse_pairs(sql, i + len(" set "), set_clause=True)
    if not sql.startswith("where ", i):
        raise ValueError("UPDATE without a where clause")
    where_pairs, _ = _parse_pairs(sql, i + len("where "), set_clause=False)
    before = [where_pairs.get(c) for c in columns]
    # the reference's sentinel reconciliation: explicit NULL in SET clears
    # the column; a column absent from SET copies its before value
    after = [
        set_pairs.get(c) if c in set_pairs else b
        for c, b in zip(columns, before)
    ]
    return {"op": "u", "schema": schema, "table": table,
            "before": before, "after": after}


def _parse_delete(sql: str, columns: list[str]) -> dict:
    i = len("delete from ")
    schema, table, i = _parse_table_name(sql, i)
    while i < len(sql) and sql[i] == " ":
        i += 1
    if i >= len(sql) or sql[i] == ";":
        # LogMiner can emit DELETE without WHERE (DBZ-3235 in the
        # reference): all-null before image
        return {"op": "d", "schema": schema, "table": table,
                "before": [None] * len(columns), "after": None}
    if not sql.startswith("where ", i):
        raise ValueError("DELETE without a where clause")
    where_pairs, _ = _parse_pairs(sql, i + len("where "), set_clause=False)
    return {"op": "d", "schema": schema, "table": table,
            "before": [where_pairs.get(c) for c in columns], "after": None}


def parse_redo_sql(sql: str, columns: list[str]) -> dict:
    """One reconstructed redo statement → row-image dict
    ``{op, schema, table, before, after}`` with before/after as
    column-ordered text lists (None cells for NULL / Unsupported Type /
    absent). Statements outside insert/update/delete raise."""
    if sql.startswith("insert into "):
        return _parse_insert(sql, columns)
    if sql.startswith("update "):
        return _parse_update(sql, columns)
    if sql.startswith("delete from "):
        return _parse_delete(sql, columns)
    raise ValueError(f"unsupported redo operation: {sql[:40]!r}")


_OUT_SCHEMA = (
    "scn long, op string, schema string, table string,"
    " before array<string>, after array<string>"
)


def decode_logminer_dml(
    df: DataFrame,
    columns: list[str],
    sql_col: str = "sql_redo",
    scn_col: str = "scn",
    passthrough: tuple[str, ...] = (),
) -> DataFrame:
    """Arrow-batched redo-SQL decode: one output row per DML statement
    with column-ordered before/after text images, ready for S9's
    commit-ordered assembly (scn is the emission key). ``columns`` is
    the table's column order — schema-history's job, a kernel closure
    here exactly like the binlog TABLE_MAP registry. ``passthrough``
    carries extra input columns (XID, thread#) through the kernel
    unchanged — V$LOGMNR_CONTENTS rows arrive with their tx identity
    beside the redo text, no join needed."""
    import pandas as pd

    cols = list(columns)
    extra = [c for c in passthrough]
    schema = _OUT_SCHEMA + "".join(
        f", {c} {dict(df.dtypes)[c]}" for c in extra
    )

    def run(batches):
        for pdf in batches:
            rows = []
            for tup in zip(pdf[scn_col], pdf[sql_col],
                           *[pdf[c] for c in extra]):
                scn, sql = tup[0], tup[1]
                m = parse_redo_sql(str(sql), cols)
                rows.append((int(scn), m["op"], m["schema"], m["table"],
                             m["before"], m["after"], *tup[2:]))
            yield pd.DataFrame(
                rows,
                columns=["scn", "op", "schema", "table", "before",
                         "after", *extra],
            )

    return df.select(scn_col, sql_col, *extra).mapInPandas(run, schema)


# ---------------------------------------------------------------------------
# S29 — LOB support: merging LOB_WRITE fragments into their owning DML
# (TransactionCommitConsumer.java:124-420, LobUnderConstruction:doAdd)
# ---------------------------------------------------------------------------
#: the reference's OracleValueConverters.UNAVAILABLE_VALUE placeholder —
#: LogMiner redo for an UPDATE re-images only the touched columns, LOB
#: columns it didn't touch carry this marker and must never override
UNAVAILABLE = "__dbz_unavailable_value__"

#: EMPTY_CLOB()/EMPTY_BLOB() initialize an empty LOB under construction
_EMPTY_LOB_CALLS = ("EMPTY_CLOB()", "EMPTY_BLOB()")


class _LobBuffer:
    """The reference's LobUnderConstruction fragment list
    (TransactionCommitConsumer.java:726-868): fragments are kept sorted
    by offset and may leave holes. A write at offset >= end appends (the
    expected DBMS_LOB.WRITE pattern); a write landing inside existing
    data truncates the overlapped head fragment, absorbs in place when
    it falls fully inside one fragment, removes fully-covered following
    fragments and front-truncates a partially-covered one
    (doAdd, :734-803). A write past the current end leaves a HOLE;
    fragments entirely after the written region are untouched. merge()
    fills every hole with spaces — DBMS_LOB.WRITE semantics for CLOBs
    (merge(), :833-869; the BLOB branch zero-fills, our fixtures are
    text so only the CLOB branch is modeled)."""

    def __init__(self, initial: str = ""):
        self.frags: list[list] = (
            [[0, initial]] if initial else []
        )  # [offset, data], sorted by offset
        self.end = len(initial)

    def add(self, offset: int, data: str) -> None:
        new_end = offset + len(data)
        if not self.frags or offset >= self.end:
            self.frags.append([offset, data])
            self.end = max(self.end, new_end)
            return
        # the uncommon case: writing somewhere in the middle (:753-803)
        out: list[list] = []
        i, n = 0, len(self.frags)
        absorbed = False
        while i < n:
            off, d = self.frags[i]
            fend = off + len(d)
            if off <= offset < fend:
                if new_end >= fend:
                    # partially overlaps: truncate frag, insert after
                    out.append([off, d[: offset - off]])
                    out.append([offset, data])
                else:
                    # fully inside frag: absorb in place (:769-771)
                    out.append(
                        [off, d[: offset - off] + data + d[new_end - off:]]
                    )
                    absorbed = True
                i += 1
                break
            if off > offset:
                # insert before; preceding fragments untouched (:774-779)
                out.append([offset, data])
                break
            out.append([off, d])
            i += 1
        else:
            out.append([offset, data])
        if not absorbed:
            # swallow / front-truncate following overlapped frags (:782-794)
            while i < n:
                off, d = self.frags[i]
                fend = off + len(d)
                if off >= new_end:
                    break
                if fend <= new_end:
                    i += 1  # removed entirely
                    continue
                keep = fend - new_end
                out.append([fend - keep, d[len(d) - keep:]])
                i += 1
        out.extend(self.frags[i:])
        self.frags = out
        self.end = max(self.end, new_end)

    def merge(self) -> str:
        parts: list[str] = []
        pos = 0
        for off, d in self.frags:
            if pos < off:  # fill the holes between fragments (:860-862)
                parts.append(" " * (off - pos))
            parts.append(d)
            pos = off + len(d)
        return "".join(parts)


def assemble_lob_events(
    df: DataFrame,
    columns: list[str],
    lob_columns: list[str],
    *,
    tx_col: str = "tx",
    scn_col: str = "scn",
    rowid_col: str = "row_id",
) -> DataFrame:
    """The ``lob.enabled`` merge pass: fold each transaction's per-row
    event chain (INSERT/UPDATE/SEL_LOB_LOCATOR + LOB_WRITE fragments)
    into ONE change event per logical change, the way the reference's
    commit consumer does before emission:

    * LOB_WRITE fragments accumulate into the column named by the
      preceding SEL_LOB_LOCATOR (offset-ordered, overlapping writes
      overwrite — LobUnderConstruction semantics); ``EMPTY_CLOB()`` /
      ``EMPTY_BLOB()`` cells seed an empty buffer.
    * An UPDATE merges into the prior event for the same row IFF it sets
      a real (non-UNAVAILABLE) value for some LOB column
      (isUpdateForSameTableWithLobColumnChanges); merged non-UNAVAILABLE
      cells override, UNAVAILABLE never does (mergeEvents). A plain
      UPDATE touching no LOB column is a separate logical change and
      emits on its own.
    * SEL_LOB_LOCATOR merges as a no-op carrier; a locator-rooted chain
      (bare ``UPDATE t SET lob = …`` via locator) emits as 'u' — UNLESS
      nothing changed after the locator, in which case the chain is a
      NOOP and is not emitted (prepareAndDispatch's SELECT_LOB_LOCATOR
      gate, TransactionCommitConsumer.java:319-334).
    * LOB_ERASE (and any other non-WRITE LOB manipulation) DISCARDS the
      row's in-flight merge state — the reference refuses to emit a
      value it cannot reconstruct (:225-229, discardCurrentMergeState
      :552-559); an erase with no construction in flight is ignored.
    * EXTENDED_STRING_BEGIN/WRITE (32k extended strings): begin names
      the column and starts a FRESH construction (prior value
      discarded), writes concatenate in order — no offsets, no hole
      filling (ExtendedStringFragment/UnderConstruction :944-973); a
      begin with no writes leaves the column NULL (isNull never
      cleared).
    * Emitted op/scn come from the chain's FIRST event (the reference
      emits the accumulator event).

    Spark shape: hash-repartition by TRANSACTION (the same partitioning
    S9's commit ordering already pays), sort within partitions by
    (tx, rowid, scn) in the JVM, then ONE ``mapInPandas`` pass whose
    kernel walks the pre-sorted stream detecting (tx, rowid) chain
    boundaries — Arrow framing is paid per BATCH, not per tx group, and
    the kernel never sorts (measured: the per-tx ``applyInPandas``
    variant cost 1.7x in pure fold time at 1k-tx/475k-row scale before
    counting its per-group framing). Chains split across Arrow batches
    re-attach through a bounded carry (one (tx, rowid) chain — one
    row's events, the same bound S9's retention policy enforces).
    Columns/lob_columns are kernel closures (schema history's bounded
    budget)."""
    import pandas as pd

    cols = list(columns)
    idx = {c: i for i, c in enumerate(cols)}
    lob_set = set(lob_columns)
    unknown = lob_set - set(cols)
    if unknown:
        raise ValueError(f"lob_columns not in columns: {sorted(unknown)}")

    out_schema = (
        f"{scn_col} long, {tx_col} string, {rowid_col} string,"
        " op string, schema string, table string, after array<string>"
    )

    def fold_chain(chain: list, out: list) -> None:
        # ``chain`` is one row's events, already scn-sorted by the caller
        acc = None  # [scn, tx, rowid, op, schema, table, values]
        bufs: dict[int, _LobBuffer] = {}
        xs_bufs: dict[int, list | None] = {}  # 32k/XML concat fragments
        target: int | None = None
        xs_target: int | None = None
        xml_target: int | None = None
        origin: str | None = None   # 'dml' | 'locator' — the acc's root
        mutated = False             # any write/merge since the root event

        def reset_state():
            nonlocal acc, bufs, xs_bufs, target, xs_target, xml_target
            nonlocal origin, mutated
            acc, bufs, xs_bufs = None, {}, {}
            target, xs_target, xml_target = None, None, None
            origin, mutated = None, False

        def finalize():
            nonlocal acc
            if acc is None:
                return
            vals = acc[6]
            for ci, buf in bufs.items():
                vals[ci] = buf.merge()
            for ci, parts in xs_bufs.items():
                # no 32K_WRITE arrived -> isNull stays set -> null column
                # (AbstractUnderConstruction:585-598)
                vals[ci] = "".join(parts) if parts is not None else None
            if origin == "locator" and not mutated:
                # the SEL_LOB_LOCATOR noop gate: a locator-rooted chain
                # that changed nothing is NOT emitted
                # (prepareAndDispatch, TransactionCommitConsumer.java:319-334)
                reset_state()
                return
            out.append(tuple(acc[:6]) + (vals,))
            reset_state()

        for r in chain:
            kind = r.kind
            if kind == "lob_write":
                if acc is None or target is None:
                    raise ValueError(
                        "LOB_WRITE without a preceding SEL_LOB_LOCATOR "
                        f"for row {getattr(r, rowid_col)!r}"
                    )
                bufs[target].add(int(r.lob_offset), str(r.lob_data))
                mutated = True
                continue
            if kind == "lob_erase":
                # the reference does NOT apply erases: any non-LOB_WRITE
                # manipulation DISCARDS the row's in-flight merge state so
                # a wrong value is never emitted (acceptLobManipulationEvent
                # :225-229 -> discardCurrentMergeState :552-559). Without a
                # construction in flight it is ignored (mid-stream start,
                # DBZ-4367).
                if target is not None:
                    reset_state()
                continue
            if kind == "xs_write":
                # EXTENDED_STRING_WRITE (32k strings): fragments simply
                # concatenate in arrival order — no offsets
                # (ExtendedStringUnderConstruction.merge :959-973)
                if acc is None or xs_target is None:
                    raise ValueError(
                        "32K_WRITE without a preceding "
                        "EXTENDED_STRING_BEGIN for row "
                        f"{getattr(r, rowid_col)!r}"
                    )
                parts = xs_bufs.get(xs_target)
                xs_bufs[xs_target] = (
                    [str(r.lob_data)] if parts is None
                    else parts + [str(r.lob_data)]
                )
                mutated = True
                continue
            if kind == "xml_write":
                # XML_WRITE: concat like 32K_WRITE, but a null payload is
                # SKIPPED, not an error (acceptXmlManipulationEvent
                # :283-286)
                if acc is None or xml_target is None:
                    raise ValueError(
                        "XML_WRITE without a preceding XML_BEGIN for row "
                        f"{getattr(r, rowid_col)!r}"
                    )
                if r.lob_data is not None:
                    parts = xs_bufs.get(xml_target)
                    xs_bufs[xml_target] = (
                        [str(r.lob_data)] if parts is None
                        else parts + [str(r.lob_data)]
                    )
                mutated = True
                continue
            if kind == "xml_end":
                # silently ignored (:276-279)
                continue
            vals = [None if v is None else str(v) for v in r.after]
            if len(vals) != len(cols):
                raise ValueError(
                    f"event with {len(vals)} values for {len(cols)} columns"
                )
            if kind == "sel_lob_locator":
                ci = idx.get(r.lob_col)
                if ci is None:
                    raise ValueError(f"locator names unknown column "
                                     f"{r.lob_col!r}")
                if acc is None:
                    acc = [int(getattr(r, scn_col)),
                           getattr(r, tx_col), getattr(r, rowid_col),
                           "u", r.schema, r.table, vals]
                    origin = "locator"
                # locator merge is a no-op for values; it only selects
                # the construction target
                if ci not in bufs:
                    cur = acc[6][ci]
                    init = (
                        "" if cur is None or cur == UNAVAILABLE
                        or cur in _EMPTY_LOB_CALLS else cur
                    )
                    bufs[ci] = _LobBuffer(init)
                target = ci
                continue
            if kind == "xs_begin":
                # EXTENDED_STRING_BEGIN: names the 32k column and starts
                # a FRESH construction — the prior value is discarded
                # (ExtendedStringUnderConstruction.fromInitialValue
                # ignores it, :960-962); unlike the locator root, begin-
                # rooted chains are not noop-gated (the gate tests only
                # SELECT_LOB_LOCATOR, :321)
                ci = idx.get(r.lob_col)
                if ci is None:
                    raise ValueError(f"extended-string begin names "
                                     f"unknown column {r.lob_col!r}")
                if acc is None:
                    acc = [int(getattr(r, scn_col)),
                           getattr(r, tx_col), getattr(r, rowid_col),
                           "u", r.schema, r.table, vals]
                    origin = "xs"
                xs_bufs[ci] = None
                xs_target = ci
                continue
            if kind == "xml_begin":
                # XML_BEGIN: same shape as the extended-string begin —
                # names the XML column, starts a FRESH construction
                # (XmlUnderConstruction.fromInitialValue :926-930), no
                # noop gate on begin-rooted chains
                ci = idx.get(r.lob_col)
                if ci is None:
                    raise ValueError(f"XML begin names unknown column "
                                     f"{r.lob_col!r}")
                if acc is None:
                    acc = [int(getattr(r, scn_col)),
                           getattr(r, tx_col), getattr(r, rowid_col),
                           "u", r.schema, r.table, vals]
                    origin = "xml"
                xs_bufs[ci] = None
                xml_target = ci
                continue
            if kind == "insert":
                finalize()
                for c in lob_set:
                    if vals[idx[c]] in _EMPTY_LOB_CALLS:
                        vals[idx[c]] = ""
                acc = [int(getattr(r, scn_col)), getattr(r, tx_col),
                       getattr(r, rowid_col), "c", r.schema, r.table,
                       vals]
                origin = "dml"
                continue
            if kind == "update":
                sets_lob = any(
                    vals[idx[c]] is not None
                    and vals[idx[c]] != UNAVAILABLE
                    for c in lob_set
                )
                if acc is not None and sets_lob:
                    # merge: non-UNAVAILABLE cells override; a concrete
                    # LOB value replaces any in-flight construction
                    for i, v in enumerate(vals):
                        if v != UNAVAILABLE:
                            if cols[i] in lob_set:
                                bufs.pop(i, None)
                                xs_bufs.pop(i, None)
                                if i == target:
                                    target = None
                                if i == xs_target:
                                    xs_target = None
                                if i == xml_target:
                                    xml_target = None
                                acc[6][i] = (
                                    "" if v in _EMPTY_LOB_CALLS else v
                                )
                            else:
                                acc[6][i] = v
                    mutated = True
                    continue
                finalize()
                # untouched LOB columns keep the UNAVAILABLE placeholder
                # in the emitted event (the reference's
                # unavailable.value.placeholder), they are NOT nulls
                for c in lob_set:
                    if vals[idx[c]] in _EMPTY_LOB_CALLS:
                        vals[idx[c]] = ""
                acc = [int(getattr(r, scn_col)), getattr(r, tx_col),
                       getattr(r, rowid_col), "u", r.schema, r.table,
                       vals]
                origin = "dml"
                if not sets_lob:
                    finalize()
                continue
            raise ValueError(f"unsupported LOB-pass event kind {kind!r}")
        finalize()

    out_cols = [scn_col, tx_col, rowid_col, "op", "schema", "table",
                "after"]

    def fold_pdf(pdf: pd.DataFrame) -> pd.DataFrame:
        # ONE sequential pass over a (tx, rowid, scn)-pre-sorted frame
        # with (tx, rowid) chain-change detection; the sort happened in
        # the JVM (sortWithinPartitions), never in Python.
        out: list = []
        chain: list = []
        cur = object()
        for r in pdf.itertuples(index=False):
            key = (getattr(r, tx_col), getattr(r, rowid_col))
            if key != cur:
                if chain:
                    fold_chain(chain, out)
                    chain = []
                cur = key
            chain.append(r)
        if chain:
            fold_chain(chain, out)
        return pd.DataFrame(out, columns=out_cols)

    def fold_stream(batches):
        # An Arrow batch boundary can split one (tx, rowid) chain; carry
        # the trailing chain's rows into the next batch. The carry is
        # bounded by ONE row's event chain (its LOB fragments), the same
        # per-row bound fold_chain itself holds in memory.
        carry: pd.DataFrame | None = None
        for pdf in batches:
            if carry is not None and len(carry):
                pdf = pd.concat([carry, pdf], ignore_index=True)
            n = len(pdf)
            if n == 0:
                continue
            txs = pdf[tx_col].to_numpy()
            rids = pdf[rowid_col].to_numpy()
            cut = n - 1
            while cut > 0 and txs[cut - 1] == txs[n - 1] \
                    and rids[cut - 1] == rids[n - 1]:
                cut -= 1
            carry = pdf.iloc[cut:]
            if cut:
                yield fold_pdf(pdf.iloc[:cut])
        if carry is not None and len(carry):
            yield fold_pdf(carry)

    part = df.repartition(tx_col).sortWithinPartitions(
        tx_col, rowid_col, scn_col
    )
    return part.mapInPandas(fold_stream, out_schema)
