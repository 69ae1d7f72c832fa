"""MySQL binary JSON (JSONB) codec.

MySQL stores JSON columns as a binary tree and ships that binary form in
the binlog (column type 245); the reference renders it back to JSON text
with the binlog client's ``JsonBinary`` before its converters ever see the
value (the JSON branch of the deserializer wiring,
debezium-connector-binlog/.../BinlogStreamingChangeEventSource.java:549-560,
and JsonDeserializer in the vendored binlog client). This module is that
codec, written against the public layout (mysql json_binary.h / the
WL#8132 format notes):

- a document is one type byte + payload;
- containers (object/array) come in a small form (2-byte counts/offsets,
  total payload <= 64 KiB) and a large form (4-byte counts/offsets);
- object payload: element count, byte size, key entries
  (offset, 2-byte length), value entries (type + offset-or-inline),
  key bytes, value payloads — offsets relative to the payload start;
- array payload: the same minus the key tables;
- small scalars are INLINED in the value entry's offset field: literals
  (null/true/false) and int16/uint16 always, int32/uint32 additionally in
  the large form;
- strings carry a 7-bit-groups varlen length (high bit = continuation);
- server-side object keys are stored sorted by (length, bytes) — the
  encoder applies the same order so fixtures are byte-faithful.

``decode_jsonb`` -> Python object; ``jsonb_to_text`` -> canonical JSON
text in STORED key order (what the reference emits); ``encode_jsonb``
builds fixture documents. OPAQUE values (0x0f) are decoded per the
binlog client's JsonBinary opaque switch: a 1-byte MySQL column type +
varlen length + payload, where NEWDECIMAL carries (precision, scale,
packed-BCD) and DATE/TIME/DATETIME/TIMESTAMP carry the 8-byte packed
temporal; every other column type renders as the client's
``"base64:type<N>:<b64>"`` string. A ZERO-LENGTH document is what MySQL
emits for a JSON column set to the SQL ``null`` literal — the reference
delivers null for it (BinlogValueConverters.convertJson), so
``jsonb_to_text`` returns None there while ``decode_jsonb`` (the
parse layer, like JsonBinary.parse) still raises.
"""

from __future__ import annotations

import json
import struct

T_SMALL_OBJ = 0x00
T_LARGE_OBJ = 0x01
T_SMALL_ARR = 0x02
T_LARGE_ARR = 0x03
T_LITERAL = 0x04
T_INT16 = 0x05
T_UINT16 = 0x06
T_INT32 = 0x07
T_UINT32 = 0x08
T_INT64 = 0x09
T_UINT64 = 0x0A
T_DOUBLE = 0x0B
T_STRING = 0x0C
T_OPAQUE = 0x0F

LIT_NULL, LIT_TRUE, LIT_FALSE = 0x00, 0x01, 0x02
_LITS = {LIT_NULL: None, LIT_TRUE: True, LIT_FALSE: False}

# MySQL column-type codes that appear INSIDE an OPAQUE value (the
# JsonBinary opaque switch of the public binlog client: DATE/TIME/
# DATETIME/TIMESTAMP parse the 8-byte packed temporal, NEWDECIMAL the
# packed-BCD decimal, everything else renders base64)
_OP_TIMESTAMP = 7
_OP_DATE = 10
_OP_TIME = 11
_OP_DATETIME = 12
_OP_NEWDECIMAL = 246


class JsonDecimal:
    """A DECIMAL packed inside a JSON document (CAST(x AS DECIMAL)).
    Renders as a bare number at the stored scale, exactly like the
    server's JSON output."""

    __slots__ = ("text", "precision", "scale")

    def __init__(self, text: str, precision: int | None = None,
                 scale: int | None = None):
        self.text = text
        int_s, _, frac_s = text.lstrip("-").partition(".")
        self.scale = len(frac_s) if scale is None else scale
        self.precision = (
            (len(int_s.lstrip("0")) or 1) + self.scale
            if precision is None else precision
        )

    def __eq__(self, other):
        return isinstance(other, JsonDecimal) and other.text == self.text

    def __repr__(self):
        return f"JsonDecimal({self.text!r})"


class JsonDate:
    """CAST(x AS DATE) inside JSON: renders as a quoted yyyy-mm-dd."""

    __slots__ = ("y", "m", "d")

    def __init__(self, y: int, m: int, d: int):
        self.y, self.m, self.d = y, m, d

    def render(self) -> str:
        return f"{self.y:04d}-{self.m:02d}-{self.d:02d}"

    def __eq__(self, other):
        return isinstance(other, JsonDate) and (
            (self.y, self.m, self.d) == (other.y, other.m, other.d)
        )

    def __repr__(self):
        return f"JsonDate({self.render()})"


class JsonTime:
    """CAST(x AS TIME) inside JSON: quoted [-]hh:mm:ss.ffffff (the
    server always prints the 6-digit fraction in JSON output)."""

    __slots__ = ("neg", "h", "mi", "s", "us")

    def __init__(self, h: int, mi: int, s: int, us: int = 0,
                 neg: bool = False):
        self.neg, self.h, self.mi, self.s, self.us = neg, h, mi, s, us

    def render(self) -> str:
        sign = "-" if self.neg else ""
        return f"{sign}{self.h:02d}:{self.mi:02d}:{self.s:02d}.{self.us:06d}"

    def __eq__(self, other):
        return isinstance(other, JsonTime) and (
            (self.neg, self.h, self.mi, self.s, self.us)
            == (other.neg, other.h, other.mi, other.s, other.us)
        )

    def __repr__(self):
        return f"JsonTime({self.render()})"


class JsonDatetime:
    """CAST(x AS DATETIME) / TIMESTAMP inside JSON: quoted
    yyyy-mm-dd hh:mm:ss.ffffff."""

    __slots__ = ("y", "m", "d", "h", "mi", "s", "us")

    def __init__(self, y, m, d, h, mi, s, us=0):
        self.y, self.m, self.d = y, m, d
        self.h, self.mi, self.s, self.us = h, mi, s, us

    def render(self) -> str:
        return (
            f"{self.y:04d}-{self.m:02d}-{self.d:02d} "
            f"{self.h:02d}:{self.mi:02d}:{self.s:02d}.{self.us:06d}"
        )

    def __eq__(self, other):
        return isinstance(other, JsonDatetime) and (
            (self.y, self.m, self.d, self.h, self.mi, self.s, self.us)
            == (other.y, other.m, other.d, other.h, other.mi, other.s,
                other.us)
        )

    def __repr__(self):
        return f"JsonDatetime({self.render()})"


class JsonOpaque:
    """An OPAQUE value of a column type the client has no typed
    rendering for: kept as raw bytes, rendered ``base64:type<N>:<b64>``
    exactly like JsonStringFormatter.valueOpaque."""

    __slots__ = ("field_type", "data")

    def __init__(self, field_type: int, data: bytes):
        self.field_type, self.data = field_type, bytes(data)

    def render(self) -> str:
        import base64

        return (
            f"base64:type{self.field_type}:"
            + base64.b64encode(self.data).decode("ascii")
        )

    def __eq__(self, other):
        return isinstance(other, JsonOpaque) and (
            (self.field_type, self.data) == (other.field_type, other.data)
        )

    def __repr__(self):
        return f"JsonOpaque(type={self.field_type}, {self.data!r})"


def _pack_temporal(y, m, d, h, mi, s, us, neg=False) -> int:
    """The 8-byte packed temporal MySQL stores inside OPAQUE JSON values
    (TIME_to_longlong_datetime_packed): value = date/time bitfields,
    raw = value << 24 | microseconds."""
    value = ((y * 13 + m) << 22) | (d << 17) | (h << 12) | (mi << 6) | s
    raw = (value << 24) | us
    return -raw if neg else raw


def _decode_opaque(field_type: int, data: bytes):
    if field_type == _OP_NEWDECIMAL:
        from debezium_spark.sources.binlog import _read_newdecimal

        precision, scale = data[0], data[1]
        text, _ = _read_newdecimal(data, 2, precision, scale)
        return JsonDecimal(text, precision, scale)
    if field_type in (_OP_DATE, _OP_TIME, _OP_DATETIME, _OP_TIMESTAMP):
        raw = int.from_bytes(data[:8], "little", signed=True)
        neg = raw < 0
        if neg:
            raw = -raw
        us = raw & 0xFFFFFF
        value = raw >> 24
        if field_type == _OP_TIME:
            return JsonTime(
                (value >> 12) & 0x3FF, (value >> 6) & 0x3F, value & 0x3F,
                us, neg,
            )
        ym = (value >> 22) & 0x1FFFF
        y, m = divmod(ym, 13)
        d = (value >> 17) & 0x1F
        if field_type == _OP_DATE:
            return JsonDate(y, m, d)
        return JsonDatetime(
            y, m, d, (value >> 12) & 0x1F, (value >> 6) & 0x3F,
            value & 0x3F, us,
        )
    return JsonOpaque(field_type, data)


def _read_varlen(buf: bytes, off: int) -> tuple[int, int]:
    n, shift = 0, 0
    while True:
        b = buf[off]
        off += 1
        n |= (b & 0x7F) << shift
        if not b & 0x80:
            return n, off
        shift += 7


def _enc_varlen(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _inlined(t: int, large: bool) -> bool:
    return t in (T_LITERAL, T_INT16, T_UINT16) or (
        large and t in (T_INT32, T_UINT32)
    )


def _parse_any(t: int, buf: bytes, off: int):
    if t == T_SMALL_OBJ:
        return _parse_container(buf, off, is_obj=True, large=False)
    if t == T_LARGE_OBJ:
        return _parse_container(buf, off, is_obj=True, large=True)
    if t == T_SMALL_ARR:
        return _parse_container(buf, off, is_obj=False, large=False)
    if t == T_LARGE_ARR:
        return _parse_container(buf, off, is_obj=False, large=True)
    if t == T_LITERAL:
        return _LITS[buf[off]]
    if t == T_INT16:
        return struct.unpack_from("<h", buf, off)[0]
    if t == T_UINT16:
        return struct.unpack_from("<H", buf, off)[0]
    if t == T_INT32:
        return struct.unpack_from("<i", buf, off)[0]
    if t == T_UINT32:
        return struct.unpack_from("<I", buf, off)[0]
    if t == T_INT64:
        return struct.unpack_from("<q", buf, off)[0]
    if t == T_UINT64:
        return struct.unpack_from("<Q", buf, off)[0]
    if t == T_DOUBLE:
        return struct.unpack_from("<d", buf, off)[0]
    if t == T_STRING:
        n, p = _read_varlen(buf, off)
        return buf[p : p + n].decode("utf-8")
    if t == T_OPAQUE:
        # 1-byte MySQL column type + varlen data length + payload
        # (json_binary's opaque layout; typed per the JsonBinary switch)
        field_type = buf[off]
        n, p = _read_varlen(buf, off + 1)
        return _decode_opaque(field_type, buf[p : p + n])
    raise ValueError(f"unknown jsonb type byte 0x{t:02x}")


def _parse_container(buf: bytes, base: int, *, is_obj: bool, large: bool):
    w = 4 if large else 2

    def rd(o: int) -> int:
        return int.from_bytes(buf[o : o + w], "little")

    count = rd(base)
    off = base + 2 * w
    keys: list[str] = []
    if is_obj:
        for _ in range(count):
            ko = rd(off)
            kl = int.from_bytes(buf[off + w : off + w + 2], "little")
            keys.append(buf[base + ko : base + ko + kl].decode("utf-8"))
            off += w + 2
    vals = []
    for _ in range(count):
        t = buf[off]
        if _inlined(t, large):
            vals.append(_parse_any(t, buf, off + 1))
        else:
            vals.append(_parse_any(t, buf, base + rd(off + 1)))
        off += 1 + w
    return dict(zip(keys, vals)) if is_obj else vals


def decode_jsonb(buf: bytes):
    """Full document (type byte + payload) -> Python object. Object key
    order is the STORED order (the server's length-then-bytes sort)."""
    if not buf:
        raise ValueError("empty jsonb document")
    return _parse_any(buf[0], buf, 1)


def _render(v) -> str:
    if isinstance(v, JsonDecimal):
        return v.text  # bare number, exactly the stored scale
    if isinstance(v, (JsonDate, JsonTime, JsonDatetime, JsonOpaque)):
        return json.dumps(v.render(), ensure_ascii=False)
    if v is None:
        return "null"
    if v is True:
        return "true"
    if v is False:
        return "false"
    if isinstance(v, str):
        return json.dumps(v, ensure_ascii=False)
    if isinstance(v, int):
        return str(v)
    if isinstance(v, float):
        return repr(v)  # shortest round-trip form
    if isinstance(v, dict):
        return (
            "{"
            + ",".join(
                f"{json.dumps(k, ensure_ascii=False)}:{_render(x)}"
                for k, x in v.items()
            )
            + "}"
        )
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_render(x) for x in v) + "]"
    raise ValueError(f"unrenderable jsonb value {v!r}")


def jsonb_to_text(buf: bytes) -> str | None:
    """Document bytes -> compact JSON text, keys in stored order — the
    text form the reference's emitter hands to its JSON converters.
    A zero-length document (what the server writes for a JSON column
    holding SQL NULL) maps to None, matching the reference's
    BinlogValueConverters.convertJson null delivery."""
    if not buf:
        return None
    return _render(decode_jsonb(buf))


# ---------------------------------------------------------------------------
# fixture encoder
# ---------------------------------------------------------------------------
def _enc_scalar(v) -> tuple[int, bytes]:
    if v is None:
        return T_LITERAL, bytes([LIT_NULL])
    if v is True:
        return T_LITERAL, bytes([LIT_TRUE])
    if v is False:
        return T_LITERAL, bytes([LIT_FALSE])
    if isinstance(v, int):
        # the server picks the narrowest signed type, unsigned only past
        # the int64 range
        if -(1 << 15) <= v < (1 << 15):
            return T_INT16, struct.pack("<h", v)
        if -(1 << 31) <= v < (1 << 31):
            return T_INT32, struct.pack("<i", v)
        if -(1 << 63) <= v < (1 << 63):
            return T_INT64, struct.pack("<q", v)
        if v < (1 << 64):
            return T_UINT64, struct.pack("<Q", v)
        raise ValueError(f"integer {v} exceeds jsonb range")
    if isinstance(v, float):
        return T_DOUBLE, struct.pack("<d", v)
    if isinstance(v, str):
        raw = v.encode("utf-8")
        return T_STRING, _enc_varlen(len(raw)) + raw
    if isinstance(v, JsonDecimal):
        from debezium_spark.sources.binlog import _enc_newdecimal

        data = bytes([v.precision, v.scale]) + _enc_newdecimal(
            v.text, v.precision, v.scale
        )
        return T_OPAQUE, (
            bytes([_OP_NEWDECIMAL]) + _enc_varlen(len(data)) + data
        )
    if isinstance(v, (JsonDate, JsonTime, JsonDatetime)):
        if isinstance(v, JsonDate):
            ft, raw = _OP_DATE, _pack_temporal(v.y, v.m, v.d, 0, 0, 0, 0)
        elif isinstance(v, JsonTime):
            ft, raw = _OP_TIME, _pack_temporal(
                0, 0, 0, v.h, v.mi, v.s, v.us, v.neg
            )
        else:
            ft, raw = _OP_DATETIME, _pack_temporal(
                v.y, v.m, v.d, v.h, v.mi, v.s, v.us
            )
        data = raw.to_bytes(8, "little", signed=True)
        return T_OPAQUE, bytes([ft]) + _enc_varlen(len(data)) + data
    if isinstance(v, JsonOpaque):
        return T_OPAQUE, (
            bytes([v.field_type]) + _enc_varlen(len(v.data)) + v.data
        )
    raise ValueError(f"unencodable jsonb value {v!r}")


def _enc_container(v, large: bool) -> tuple[int, bytes]:
    is_obj = isinstance(v, dict)
    w = 4 if large else 2
    if is_obj:
        items = sorted(
            v.items(),
            key=lambda kv: (len(kv[0].encode("utf-8")), kv[0].encode("utf-8")),
        )
        keys = [k.encode("utf-8") for k, _ in items]
        vals = [x for _, x in items]
    else:
        keys, vals = [], list(v)
    n = len(vals)
    encoded = [_enc_any(x) for x in vals]

    head_len = 2 * w + (w + 2) * len(keys) + (1 + w) * n
    key_area = b"".join(keys)
    data_off = head_len + len(key_area)
    total = data_off + sum(
        len(p) for t, p in encoded if not _inlined(t, large)
    )
    if not large and total > 0xFFFF:
        return _enc_container(v, large=True)

    key_entries = bytearray()
    ko = head_len
    for k in keys:
        key_entries += ko.to_bytes(w, "little")
        key_entries += struct.pack("<H", len(k))
        ko += len(k)

    val_entries, data = bytearray(), bytearray()
    for t, payload in encoded:
        val_entries.append(t)
        if _inlined(t, large):
            val_entries += payload.ljust(w, b"\x00")
        else:
            val_entries += (data_off + len(data)).to_bytes(w, "little")
            data += payload
    size = data_off + len(data)
    payload = (
        n.to_bytes(w, "little")
        + size.to_bytes(w, "little")
        + bytes(key_entries)
        + bytes(val_entries)
        + key_area
        + bytes(data)
    )
    t = (
        (T_LARGE_OBJ if large else T_SMALL_OBJ)
        if is_obj
        else (T_LARGE_ARR if large else T_SMALL_ARR)
    )
    return t, payload


def _enc_any(v) -> tuple[int, bytes]:
    if isinstance(v, (dict, list, tuple)):
        return _enc_container(v, large=False)
    return _enc_scalar(v)


def encode_jsonb(obj) -> bytes:
    """Python object -> full document bytes (type byte + payload)."""
    t, payload = _enc_any(obj)
    return bytes([t]) + payload
