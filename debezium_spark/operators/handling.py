"""§1.3 config-driven value-handling modes (the decoder cast layer).

Reference:
* ``DecimalHandlingMode`` precise/double/string —
  debezium-connector-common/.../relational/RelationalDatabaseConnectorConfig.java:69
* ``BinaryHandlingMode`` bytes/base64/hex —
  .../config/CommonConnectorConfig.java:213
* ``TemporalPrecisionMode`` adaptive/µs/isostring/connect —
  .../jdbc/TemporalPrecisionMode.java:31-59

In the reference these modes steer ``JdbcValueConverters`` (1,558 LoC of
java.sql.Types dispatch); on Spark each mode is a single cast/encoding
expression applied in the decode projection — the whole class collapses to
this module (SURVEY §1.3).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def decimal_mode(col: Column, mode: str, *, precision: int = 18, scale: int = 2) -> Column:
    """precise → DecimalType (exact); double → float64; string → display text."""
    if mode == "precise":
        return col.cast(f"decimal({precision},{scale})")
    if mode == "double":
        return col.cast("double")
    if mode == "string":
        return col.cast(f"decimal({precision},{scale})").cast("string")
    raise ValueError(f"unknown decimal handling mode: {mode}")


def binary_mode(col: Column, mode: str) -> Column:
    """bytes → BinaryType passthrough; base64/hex → encoded strings."""
    if mode == "bytes":
        return col
    if mode == "base64":
        return F.base64(col)
    if mode == "hex":
        return F.lower(F.hex(col))
    raise ValueError(f"unknown binary handling mode: {mode}")


def temporal_mode(ts_micros: Column, mode: str) -> Column:
    """From a µs-since-epoch axis: adaptive → TIMESTAMP; microseconds →
    int64 µs (MicroTimestamp); isostring → ISO-8601 text; connect →
    int64 millis (Kafka Connect Timestamp)."""
    if mode == "adaptive":
        return F.timestamp_micros(ts_micros)
    if mode == "microseconds":
        return ts_micros.cast("long")
    if mode == "isostring":
        return F.date_format(
            F.timestamp_micros(ts_micros), "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'"
        )
    if mode == "connect":
        return (ts_micros / 1000).cast("long")
    raise ValueError(f"unknown temporal precision mode: {mode}")


# ---------------------------------------------------------------------------
# io.debezium.time.* logical-type codecs — the named temporal encodings the
# envelope carries over Connect primitives (Date.java int32 epoch days,
# MicroTime.java int64 µs since midnight, ZonedTimestamp.java:94-104 ISO-8601
# string with offset, Year.java int32, MicroDuration.java int64 µs).
# ---------------------------------------------------------------------------


def epoch_days(date_col: Column) -> Column:
    """time.Date encoding: int32 days since epoch."""
    return F.datediff(date_col, F.lit("1970-01-01").cast("date")).cast("int")


def date_from_epoch_days(days: Column) -> Column:
    """Inverse of :func:`epoch_days` (the sink-side decode)."""
    return F.date_add(F.lit("1970-01-01").cast("date"), days)


def micro_time(ts_col: Column) -> Column:
    """time.MicroTime encoding: int64 microseconds since midnight."""
    return (
        F.unix_micros(ts_col) - F.unix_micros(F.date_trunc("DAY", ts_col))
    ).cast("long")


def zoned_timestamp(ts_col: Column) -> Column:
    """time.ZonedTimestamp: ISO-8601 text with offset (ZonedTimestamp.java:
    94-104). ``date_format`` renders the SESSION zone's wall clock, so the
    offset is emitted with the XXX pattern — 'Z' under UTC, the true offset
    otherwise — and the string always denotes the correct instant (a
    hardcoded 'Z' would misstate it under a non-UTC session)."""
    return F.date_format(ts_col, "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")


def year_of(date_col: Column) -> Column:
    """time.Year encoding: int32 calendar year."""
    return F.year(date_col).cast("int")


def micro_duration(start: Column, end: Column) -> Column:
    """time.MicroDuration: int64 µs between two instants."""
    return (F.unix_micros(end) - F.unix_micros(start)).cast("long")


def nano_timestamp(ts_col: Column) -> Column:
    """time.NanoTimestamp encoding (NanoTimestamp.java:toEpochNanos): int64
    nanoseconds since epoch. Spark timestamps carry µs precision, so the
    sub-microsecond digits are zero — same as the reference converting a
    µs-precision source value."""
    return (F.unix_micros(ts_col) * 1000).cast("long")


def nano_time(ts_col: Column) -> Column:
    """time.NanoTime encoding (NanoTime.java:toNanoOfDay): int64
    nanoseconds since midnight."""
    return (micro_time(ts_col) * 1000).cast("long")


def enum_set_value(arr: Column, allowed: tuple[str, ...]) -> Column:
    """EnumSet semantics (data/EnumSet.java:16): the value is a
    comma-separated string of values from the enumeration. Any element
    outside the allowed set nulls the whole value — :func:`enum_value`'s
    per-literal rule lifted to the set (one bad member invalidates the
    set, matching schema-level validation rather than silently dropping
    members)."""
    ok = F.forall(arr, lambda v: v.isin(*allowed))
    return F.when(arr.isNotNull() & ok, F.array_join(arr, ","))


def interval_iso(
    years: Column,
    months: Column,
    days: Column,
    hours: Column,
    minutes: Column,
    seconds: Column,
) -> Column:
    """time.Interval encoding (Interval.java:toIsoString): the ISO-8601
    duration string ``P{y}Y{m}M{d}DT{h}H{min}M{s}S``, with the seconds
    component rendered like ``BigDecimal.stripTrailingZeros()
    .toPlainString()`` — fractional trailing zeros dropped, then a bare
    trailing '.' dropped ('2.500' → '2.5', '2.000' → '2'). ``seconds``
    should be a decimal column so the text is exact."""
    sec_txt = F.regexp_replace(
        F.regexp_replace(seconds.cast("string"), r"(\.\d*?)0+$", "$1"),
        r"\.$",
        "",
    )
    return F.concat(
        F.lit("P"),
        years.cast("long").cast("string"), F.lit("Y"),
        months.cast("long").cast("string"), F.lit("M"),
        days.cast("long").cast("string"), F.lit("D"),
        F.lit("T"),
        hours.cast("long").cast("string"), F.lit("H"),
        minutes.cast("long").cast("string"), F.lit("M"),
        sec_txt, F.lit("S"),
    )


def table_include_exclude(
    df, *, table_col: str = "source.table",
    include: str | None = None, exclude: str | None = None,
):
    """§1.2 RelationalTableFilters (.../relational/RelationalTableFilters.java:42-59):
    regex include/exclude over the captured-table axis, applied as an early
    filter so it rides the scan."""
    out = df
    if include is not None:
        out = out.filter(F.col(table_col).rlike(include))
    if exclude is not None:
        out = out.filter(~F.col(table_col).rlike(exclude))
    return out


# ---------------------------------------------------------------------------
# io.debezium.data.* special logical types — VariableScaleDecimal
# (VariableScaleDecimal.java:25 struct{scale int32, value bytes BE unscaled}),
# Bits (Bits.java:22 little-endian bytes), Uuid (Uuid.java:21 canonical
# string), Enum (Enum.java:22 string + allowed-values parameter).
# ---------------------------------------------------------------------------


def variable_scale_decimal(unscaled: Column, scale: Column) -> Column:
    """Encode the VariableScaleDecimal struct: big-endian two's-complement
    unscaled bytes + scale. ``F.hex`` of a negative long already yields its
    16-digit two's-complement representation, so a fixed 8-byte encoding is
    sign-correct for the full signed-long range (the reference's
    VariableScaleDecimal.java:25 uses minimal-length BigInteger bytes; a
    fixed width is the same value, zero/sign-extended)."""
    value_bytes = F.unhex(F.lpad(F.hex(unscaled.cast("long")), 16, "0"))
    return F.struct(
        scale.cast("int").alias("scale"), value_bytes.alias("value")
    )


def decode_variable_scale_decimal(vsd: Column) -> Column:
    """Decode to a double: signed unscaled / 10^scale.

    Sign-aware: the leading byte's top bit selects 0x00- vs 0xFF-extension
    to 8 bytes, then the long is reassembled with shift+OR (never
    conv→cast, which NULLs/wraps for two's-complement values ≥ 2^63).
    Handles any value length ≤ 8 bytes, so minimal-length encodings from a
    reference-faithful producer decode too."""
    hx = F.upper(F.hex(vsd["value"]))
    first = F.conv(F.substring(hx, 1, 2), 16, 10).cast("long")
    pad = F.when(first >= 128, F.lit("F")).otherwise(F.lit("0"))
    hx16 = F.concat(F.repeat(pad, 16 - F.length(hx)), hx)
    total = F.lit(0).cast("long")
    for i in range(8):
        byte_i = F.conv(F.substring(hx16, 2 * i + 1, 2), 16, 10).cast("long")
        total = F.shiftleft(total, 8).bitwiseOR(byte_i)
    # Unscaled values wider than 8 bytes don't fit the fixed reassembly
    # window; surface them as NULL rather than silently truncating to the
    # top 8 bytes (the reference's BigInteger path has no such limit).
    return F.when(F.length(hx) > 16, F.lit(None).cast("double")).otherwise(
        total / F.pow(F.lit(10.0), vsd["scale"].cast("double"))
    )


def bits_le(value: Column, n_bytes: int = 2) -> Column:
    """Encode an integer as Bits: little-endian bytes (Bits.java:22).

    Pure integer arithmetic — arithmetic shift + pmod yields the exact
    two's-complement byte at every position, so large and negative values
    encode correctly at any ``n_bytes`` (float division would lose low bits
    past 2^53 and truncate negatives toward zero).
    """
    v = value.cast("long")
    parts = [
        F.lpad(F.hex(F.pmod(F.shiftright(v, 8 * i), F.lit(256))), 2, "0")
        for i in range(n_bytes)
    ]
    return F.unhex(F.concat(*parts))


def decode_bits_le(bits: Column, n_bytes: int = 2) -> Column:
    """Decode little-endian Bits bytes back to an integer.

    Reassembled with shift+OR (never multiply/add): bit ops wrap instead of
    raising under ANSI mode, and a full 8-byte value round-trips to the
    exact signed two's-complement long it encoded."""
    total = F.lit(0).cast("long")
    for i in range(n_bytes):
        byte_i = F.conv(F.hex(F.substring(bits, i + 1, 1)), 16, 10).cast("long")
        total = total.bitwiseOR(F.shiftleft(byte_i, 8 * i))
    return total


def uuid_from_hash(col: Column) -> Column:
    """Deterministic canonical-format UUID string (Uuid.java:21) derived
    from the md5 of the input — the feed's stand-in for a DB uuid column."""
    h = F.md5(col.cast("string"))
    return F.concat_ws(
        "-",
        F.substring(h, 1, 8),
        F.substring(h, 9, 4),
        F.substring(h, 13, 4),
        F.substring(h, 17, 4),
        F.substring(h, 21, 12),
    )


def enum_value(col: Column, allowed: tuple[str, ...]) -> Column:
    """Enum semantics (Enum.java:22): values outside the allowed set are
    nulled (the warn/skip handling-mode analog for bad enum literals)."""
    return F.when(col.isin(*allowed), col)


# ---------------------------------------------------------------------------
# io.debezium.data vector + text-search logical types — SparseDoubleVector
# (vector/SparseDoubleVector.java:26 struct{dimensions int16, vector
# map<int16,float64>}, logical string '{i1:v1,...}/dims' parsed by
# vector/Vectors.java:42-86) and TsVector (data/TsVector.java:17, a string
# logical type carrying PostgreSQL tsvector text).
#
# Spark shape: the map becomes parallel sorted indices[]/values[] arrays —
# deterministic (a map's iteration order is not), columnar-friendly, and
# directly usable by the ANN/dedup operators that consume vectors.
# ---------------------------------------------------------------------------


def sparse_double_vector(dense: Column, dims: int) -> Column:
    """Encode a dense double array as the SparseDoubleVector struct:
    ``{dimensions, indices[], values[]}`` keeping only non-zero entries,
    1-based indices in ascending order (pgvector ``sparsevec`` convention,
    SparseDoubleVector.java:26)."""
    pairs = F.filter(
        F.transform(
            dense,
            lambda v, i: F.struct(
                (i + 1).cast("int").alias("i"), v.cast("double").alias("v")
            ),
        ),
        lambda p: p["v"] != 0.0,
    )
    return F.struct(
        F.lit(dims).cast("int").alias("dimensions"),
        F.transform(pairs, lambda p: p["i"]).alias("indices"),
        F.transform(pairs, lambda p: p["v"]).alias("values"),
    )


def sparse_vector_to_string(sv: Column) -> Column:
    """Render the logical string ``{i1:v1,i2:v2,...}/dims`` — the inverse of
    ``Vectors.fromSparseVectorString`` (Vectors.java:42-86)."""
    entries = F.zip_with(
        sv["indices"],
        sv["values"],
        lambda i, v: F.concat(i.cast("string"), F.lit(":"), v.cast("string")),
    )
    return F.concat(
        F.lit("{"),
        F.array_join(entries, ","),
        F.lit("}/"),
        sv["dimensions"].cast("string"),
    )


def parse_sparse_vector(s: Column) -> Column:
    """``fromLogical``: parse ``'{i1:v1,...}/dims'`` back into the struct
    (Vectors.java:42-86; malformed input yields a null struct, the
    reference's warn-and-null contract)."""
    body = F.regexp_extract(s, r"^\{(.*)\}/(\d+)$", 1)
    dims = F.regexp_extract(s, r"^\{(.*)\}/(\d+)$", 2)
    entries = F.filter(F.split(body, ","), lambda e: e != "")
    parsed = F.struct(
        dims.cast("int").alias("dimensions"),
        F.transform(
            entries, lambda e: F.split(e, ":")[0].cast("int")
        ).alias("indices"),
        F.transform(
            entries, lambda e: F.split(e, ":")[1].cast("double")
        ).alias("values"),
    )
    return F.when(dims != "", parsed)


def ts_vector(text: Column) -> Column:
    """PostgreSQL ``to_tsvector('simple', ...)`` analog rendered as the
    canonical tsvector string the TsVector logical type carries
    (TsVector.java:17): sorted unique lexemes, each with its ascending
    1-based positions — ``'lex1':1,4 'lex2':2``. Pure column expression
    (nested higher-order functions), no UDF."""
    toks = F.filter(
        F.split(F.lower(text), r"[^a-z0-9]+"), lambda t: t != ""
    )
    pairs = F.transform(
        toks,
        lambda t, i: F.struct(t.alias("lex"), (i + 1).cast("int").alias("pos")),
    )
    lexes = F.array_sort(F.array_distinct(toks))
    return F.array_join(
        F.transform(
            lexes,
            lambda lx: F.concat(
                F.lit("'"),
                lx,
                F.lit("':"),
                F.array_join(
                    F.transform(
                        F.filter(pairs, lambda p: p["lex"] == lx),
                        lambda p: p["pos"].cast("string"),
                    ),
                    ",",
                ),
            ),
        ),
        " ",
    )
