"""Pure-Python BSON codec + the reference's Mongo typed-value projection.

The reference converts change-stream documents from BSON types to
Connect schemas in MongoDataConverter
(debezium-connector-mongodb/.../transforms/MongoDataConverter.java):
NULL/STRING/JAVASCRIPT/OBJECT_ID/DECIMAL128 -> optional string (ObjectId
as its 24-hex form, Decimal128 via its toString), DOUBLE -> float64,
BINARY -> bytes (subtype dropped, getData), INT32/INT64 -> int32/int64,
DATE_TIME -> Timestamp(ms), TIMESTAMP -> Timestamp(seconds*1000)
(:785-835), BOOLEAN -> boolean, REGULAR_EXPRESSION -> struct{regex,
options} (:340-346). This module re-derives that path against the PUBLIC
BSON spec (bsonspec.org, the same jsonb.py playbook): a byte-faithful
decoder/encoder pair plus :func:`bson_typed_table`, the distributed
Arrow kernel that turns a DataFrame of BSON document bytes into typed
Spark columns.

Decimal128 is the IEEE 754-2008 BID encoding; every value MongoDB's
encoders write uses the small-coefficient form (10^34-1 < 2^113), so the
large form + Inf/NaN raise as out-of-slice rather than mis-render. The
string form follows the Java driver's Decimal128.toString: plain
notation when exponent <= 0 and adjusted exponent >= -6, scientific
otherwise.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

from pyspark.sql import DataFrame

# element type bytes (bsonspec.org §Grammar)
T_DOUBLE = 0x01
T_STRING = 0x02
T_DOC = 0x03
T_ARRAY = 0x04
T_BINARY = 0x05
T_OBJECTID = 0x07
T_BOOL = 0x08
T_DATETIME = 0x09
T_NULL = 0x0A
T_REGEX = 0x0B
T_JS = 0x0D
T_INT32 = 0x10
T_TIMESTAMP = 0x11
T_INT64 = 0x12
T_DECIMAL128 = 0x13

_DEC128_BIAS = 6176


@dataclass(frozen=True)
class ObjectId:
    raw: bytes  # 12 bytes

    def __str__(self) -> str:
        return self.raw.hex()


@dataclass(frozen=True)
class Decimal128:
    sign: bool
    digits: str  # coefficient, no sign, no point
    exp: int

    def __str__(self) -> str:
        s = "-" if self.sign else ""
        d, exp = self.digits, self.exp
        adj = exp + len(d) - 1
        if exp <= 0 and adj >= -6:
            if exp == 0:
                return s + d
            point = len(d) + exp
            if point <= 0:
                return s + "0." + "0" * (-point) + d
            return s + d[:point] + "." + d[point:]
        tail = d[1:]
        e = f"E{'+' if adj >= 0 else ''}{adj}"
        return s + d[0] + (("." + tail) if tail else "") + e


@dataclass(frozen=True)
class Binary:
    subtype: int
    data: bytes


@dataclass(frozen=True)
class DateTime:
    ms: int  # UTC millis since epoch


@dataclass(frozen=True)
class Timestamp:
    time: int       # seconds (high 32 bits)
    increment: int  # ordinal (low 32 bits)


@dataclass(frozen=True)
class Regex:
    pattern: str
    options: str


@dataclass(frozen=True)
class JavaScript:
    code: str


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------
def _cstring(buf: bytes, off: int) -> tuple[str, int]:
    end = buf.index(0, off)
    return buf[off:end].decode("utf-8"), end + 1


def _string(buf: bytes, off: int) -> tuple[str, int]:
    n = struct.unpack_from("<i", buf, off)[0]  # includes trailing NUL
    s = buf[off + 4 : off + 4 + n - 1].decode("utf-8")
    return s, off + 4 + n


def _decimal128(buf: bytes, off: int) -> Decimal128:
    bits = int.from_bytes(buf[off : off + 16], "little")
    sign = bool(bits >> 127)
    combo = (bits >> 110) & 0x1FFFF
    if (combo >> 15) == 0b11:
        raise ValueError(
            "decimal128 large-coefficient/Inf/NaN form outside the decoded "
            "slice — MongoDB encoders never write it for finite values"
        )
    exp = ((bits >> 113) & 0x3FFF) - _DEC128_BIAS
    coeff = bits & ((1 << 113) - 1)
    return Decimal128(sign, str(coeff), exp)


def decode_bson(buf: bytes) -> dict:
    """Full document bytes -> Python dict (wrapper dataclasses for the
    non-JSON types). Raises on framing errors — a truncated document
    must not decode silently."""
    total = struct.unpack_from("<i", buf, 0)[0]
    if total != len(buf):
        raise ValueError(f"bson length {total} != buffer {len(buf)}")
    if buf[-1] != 0:
        raise ValueError("bson document missing trailing NUL")
    return _elements(buf, 4, len(buf) - 1)


def _elements(buf: bytes, off: int, end: int) -> dict:
    out: dict = {}
    while off < end:
        t = buf[off]
        name, off = _cstring(buf, off + 1)
        if t == T_DOUBLE:
            out[name] = struct.unpack_from("<d", buf, off)[0]
            off += 8
        elif t in (T_STRING, T_JS):
            s, off = _string(buf, off)
            out[name] = JavaScript(s) if t == T_JS else s
        elif t in (T_DOC, T_ARRAY):
            n = struct.unpack_from("<i", buf, off)[0]
            sub = _elements(buf, off + 4, off + n - 1)
            if t == T_ARRAY:
                out[name] = [sub[str(i)] for i in range(len(sub))]
            else:
                out[name] = sub
            off += n
        elif t == T_BINARY:
            n = struct.unpack_from("<i", buf, off)[0]
            out[name] = Binary(buf[off + 4], buf[off + 5 : off + 5 + n])
            off += 5 + n
        elif t == T_OBJECTID:
            out[name] = ObjectId(buf[off : off + 12])
            off += 12
        elif t == T_BOOL:
            out[name] = bool(buf[off])
            off += 1
        elif t == T_DATETIME:
            out[name] = DateTime(struct.unpack_from("<q", buf, off)[0])
            off += 8
        elif t == T_NULL:
            out[name] = None
        elif t == T_REGEX:
            pat, off = _cstring(buf, off)
            opts, off = _cstring(buf, off)
            out[name] = Regex(pat, opts)
        elif t == T_INT32:
            out[name] = struct.unpack_from("<i", buf, off)[0]
            off += 4
        elif t == T_TIMESTAMP:
            inc, tm = struct.unpack_from("<II", buf, off)
            out[name] = Timestamp(tm, inc)
            off += 8
        elif t == T_INT64:
            out[name] = struct.unpack_from("<q", buf, off)[0]
            off += 8
        elif t == T_DECIMAL128:
            out[name] = _decimal128(buf, off)
            off += 16
        else:
            raise ValueError(f"unsupported bson element type 0x{t:02x}")
    return out


# ---------------------------------------------------------------------------
# encode (fixtures)
# ---------------------------------------------------------------------------
def _enc_cstring(s: str) -> bytes:
    raw = s.encode("utf-8")
    if 0 in raw:
        raise ValueError("cstring cannot contain NUL")
    return raw + b"\x00"


def _enc_string(s: str) -> bytes:
    raw = s.encode("utf-8") + b"\x00"
    return struct.pack("<i", len(raw)) + raw


def _enc_element(name: str, v) -> bytes:
    key = _enc_cstring(name)
    if v is None:
        return bytes([T_NULL]) + key
    if isinstance(v, bool):
        return bytes([T_BOOL]) + key + bytes([int(v)])
    if isinstance(v, float):
        return bytes([T_DOUBLE]) + key + struct.pack("<d", v)
    if isinstance(v, int):
        if -(1 << 31) <= v < (1 << 31):
            return bytes([T_INT32]) + key + struct.pack("<i", v)
        return bytes([T_INT64]) + key + struct.pack("<q", v)
    if isinstance(v, str):
        return bytes([T_STRING]) + key + _enc_string(v)
    if isinstance(v, JavaScript):
        return bytes([T_JS]) + key + _enc_string(v.code)
    if isinstance(v, dict):
        return bytes([T_DOC]) + key + encode_bson(v)
    if isinstance(v, (list, tuple)):
        doc = {str(i): x for i, x in enumerate(v)}
        return bytes([T_ARRAY]) + key + encode_bson(doc)
    if isinstance(v, Binary):
        return (
            bytes([T_BINARY]) + key
            + struct.pack("<i", len(v.data)) + bytes([v.subtype]) + v.data
        )
    if isinstance(v, ObjectId):
        if len(v.raw) != 12:
            raise ValueError("ObjectId must be 12 bytes")
        return bytes([T_OBJECTID]) + key + v.raw
    if isinstance(v, DateTime):
        return bytes([T_DATETIME]) + key + struct.pack("<q", v.ms)
    if isinstance(v, Timestamp):
        return (
            bytes([T_TIMESTAMP]) + key
            + struct.pack("<II", v.increment, v.time)
        )
    if isinstance(v, Regex):
        return (
            bytes([T_REGEX]) + key
            + _enc_cstring(v.pattern) + _enc_cstring(v.options)
        )
    if isinstance(v, Decimal128):
        coeff = int(v.digits)
        if coeff >= (1 << 113):
            raise ValueError("decimal128 coefficient exceeds 113 bits")
        bits = (
            (int(v.sign) << 127)
            | ((v.exp + _DEC128_BIAS) << 113)
            | coeff
        )
        return bytes([T_DECIMAL128]) + key + bits.to_bytes(16, "little")
    raise ValueError(f"unencodable bson value {v!r}")


def encode_bson(doc: dict) -> bytes:
    body = b"".join(_enc_element(k, v) for k, v in doc.items())
    return struct.pack("<i", len(body) + 5) + body + b"\x00"


# ---------------------------------------------------------------------------
# the MongoDataConverter projection
# ---------------------------------------------------------------------------
#: declared bson type -> (Spark type, converter) per MongoDataConverter's
#: getSchema (:620-663) and scalar conversion (:785-835)
_TYPED = {
    "string": ("string", lambda v: v),
    "javascript": ("string", lambda v: v.code),
    "objectid": ("string", lambda v: str(v)),
    "decimal128": ("string", lambda v: str(v)),
    "double": ("double", lambda v: v),
    "binary": ("binary", lambda v: bytearray(v.data)),
    "int32": ("int", lambda v: v),
    "int64": ("long", lambda v: v),
    # DATE_TIME carries ms; TIMESTAMP carries seconds -> * 1000 (:820-826)
    "datetime": ("long", lambda v: v.ms),
    "timestamp": ("long", lambda v: 1000 * v.time),
    "boolean": ("boolean", lambda v: v),
    "regex": (
        "struct<regex:string,options:string>",
        lambda v: {"regex": v.pattern, "options": v.options},
    ),
    # default arrayEncoding=ARRAY: array of optional strings (:649-655)
    "array_string": ("array<string>", lambda v: [str(x) for x in v]),
}


def bson_typed_table(
    df: DataFrame,
    fields: list[tuple[str, str]],
    msg_col: str = "doc",
    keep: tuple[str, ...] = ("pos",),
) -> DataFrame:
    """DataFrame of BSON document bytes -> typed columns, the Spark form
    of MongoDataConverter's unified-schema struct build. ``fields`` is
    the declared (name, bson type) list — the reference derives it by
    scanning documents; here it is the schema-registry contract the
    caller supplies. Missing keys and BSON nulls surface as NULL; a key
    whose value has a DIFFERENT bson type than declared raises (the
    reference would have derived a union schema — silently coercing
    would corrupt). Arrow kernel over mapInPandas, same shape as the
    binlog/pgoutput wire decoders; the ms-epoch columns are exposed as
    longs so callers choose their timestamp casting explicitly."""
    import pandas as pd

    for _, t in fields:
        if t not in _TYPED:
            raise ValueError(f"unsupported declared bson type {t!r}")

    expect = {
        "string": str, "javascript": JavaScript, "objectid": ObjectId,
        "decimal128": Decimal128, "double": float, "binary": Binary,
        "int32": int, "int64": int, "datetime": DateTime,
        "timestamp": Timestamp, "boolean": bool, "regex": Regex,
        "array_string": list,
    }
    out_schema = ", ".join(
        [f"{k} {t}" for k, t in zip(keep, ["long"] * len(keep))]
        + [f"{name} {_TYPED[t][0]}" for name, t in fields]
    )

    def kernel(batches):
        for pdf in batches:
            rows = []
            for rec in pdf.itertuples(index=False):
                doc = decode_bson(bytes(getattr(rec, msg_col)))
                row = [getattr(rec, k) for k in keep]
                for name, t in fields:
                    v = doc.get(name)
                    if v is None:
                        row.append(None)
                        continue
                    if t == "boolean" and isinstance(v, bool):
                        pass
                    elif t in ("int32", "int64") and isinstance(v, bool):
                        raise ValueError(
                            f"field {name!r}: bool where {t} declared"
                        )
                    elif not isinstance(v, expect[t]):
                        raise ValueError(
                            f"field {name!r}: bson value {v!r} does not "
                            f"match declared type {t!r}"
                        )
                    row.append(_TYPED[t][1](v))
                rows.append(tuple(row))
            yield pd.DataFrame(
                rows, columns=list(keep) + [n for n, _ in fields]
            )

    return df.mapInPandas(kernel, out_schema)
