"""Schema-registry wire framing + a pluggable schema-id registry.

The reference's Avro/Protobuf engine formats are, in deployment, framed for
a schema registry: each message is ``0x00 magic byte + 4-byte big-endian
schema id + encoded payload`` (the registry wire format is public and
documented by its vendors; consumers resolve the id back to the writer
schema before decoding). This module provides that framing over ANY binary
payload column plus a minimal registry that assigns monotonically
increasing ids to schema texts — the same register/lookup contract a
hosted registry exposes, with the store swappable exactly like the
schema-history backends (memory here; a REST client in production is the
same two calls).

Framing is pure byte concatenation, so it stays JVM-side: `frame` is
``concat(magic, int-as-4-bytes, payload)`` built from Spark expressions —
no UDF — and `unframe` slices the id and payload back out the same way.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MAGIC_BYTE = 0


def frame(payload: Column, schema_id: int | Column) -> Column:
    """``0x00 + 4-byte big-endian schema id + payload`` — expression-only.

    The id bytes come from integer shift/mask arithmetic (hex → unhex), so
    framing adds zero Python to the encode path.
    """
    sid = (
        F.lit(int(schema_id)) if isinstance(schema_id, int) else schema_id
    ).cast("long")
    id_hex = F.lpad(
        F.hex(sid.bitwiseAND(F.lit(0xFFFFFFFF))), 8, "0"
    )
    return F.concat(F.unhex(F.lit("00")), F.unhex(id_hex), payload)


def unframe_schema_id(framed: Column) -> Column:
    """The 4-byte big-endian schema id of a framed message (long).

    Long, not int: frame() accepts the full unsigned-32 range, and a
    non-ANSI int cast would NULL ids in [2^31, 2^32) — frame/unframe must
    round-trip every id frame() accepts."""
    return F.conv(F.hex(F.substring(framed, 2, 4)), 16, 10).cast("long")


def unframe_payload(framed: Column) -> Column:
    """The payload bytes after the 5-byte header."""
    return F.substring(framed, 6, F.length(framed) - 5)


def check_magic(framed: Column) -> Column:
    """True when the first byte is the registry magic 0x00."""
    return F.hex(F.substring(framed, 1, 1)) == "00"


class SchemaIdRegistry:
    """Minimal register/lookup registry: schema text → stable int id.

    Matches the hosted-registry contract the reference's converters code
    against: registering the same schema twice returns the same id;
    lookups by id return the schema text. In-memory here; persistence is a
    dict swap (file/DB/REST), deliberately mirroring the schema-history
    backend SPI."""

    def __init__(self):
        self._by_text: dict[str, int] = {}
        self._by_id: dict[int, str] = {}
        self._next = 1

    def register(self, subject: str, schema_text: str) -> int:
        key = f"{subject}\x00{schema_text}"
        sid = self._by_text.get(key)
        if sid is None:
            sid = self._next
            self._next += 1
            self._by_text[key] = sid
            self._by_id[sid] = schema_text
        return sid

    def lookup(self, schema_id: int) -> str:
        try:
            return self._by_id[schema_id]
        except KeyError:
            raise KeyError(f"unknown schema id {schema_id}") from None
