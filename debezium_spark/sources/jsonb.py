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
builds fixture documents. OPAQUE values (0x0f — decimals/dates packed
inside JSON) raise: surfacing them as the wrong type would corrupt
silently, and the fixture generator never writes them.
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
        raise ValueError(
            "jsonb OPAQUE value (packed decimal/temporal) outside the "
            "decoded slice — refusing to guess a rendering"
        )
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


def jsonb_to_text(buf: bytes) -> str:
    """Document bytes -> compact JSON text, keys in stored order — the
    text form the reference's emitter hands to its JSON converters."""
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
