"""Pure-Python Avro binary codec for envelope payloads.

The reference ships Avro as a first-class engine format
(debezium-api/src/main/java/io/debezium/engine/format/Avro.java); this
container has neither the spark-avro jar nor fastavro, so the binary
encoding (Avro 1.11 spec, "Binary Encoding" section — public) is
implemented directly for the subset the envelope needs: records, nullable
unions ``["null", T]``, and the primitives null/boolean/int/long/double/
string/bytes. Conformance is pinned by golden tests against the spec's own
example encodings (zigzag varints: 1→0x02, -1→0x01; "foo"→06 66 6f 6f).

Spark integration is Arrow-batched pandas UDFs (`to_avro_py` /
`from_avro_py`): Avro is a per-record byte format, so the per-row Python
loop is inherent — the Arrow transfer keeps the batch path vectorized and
this stays off the hot path (formats are the edge of the pipeline, applied
once per record at ingress/egress, never inside joins/aggs).
"""

from __future__ import annotations

import json
import struct as _struct

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

# ---------------------------------------------------------------------------
# Schema mapping: Spark StructType ⇄ Avro record schema (JSON)
# ---------------------------------------------------------------------------

_PRIMITIVE = {
    T.StringType: "string",
    T.LongType: "long",
    T.IntegerType: "int",
    T.DoubleType: "double",
    T.BooleanType: "boolean",
    T.BinaryType: "bytes",
}


def avro_schema_for(st: T.StructType, name: str = "Envelope") -> dict:
    """Avro record schema for a flat Spark struct; nullable → ["null", T]."""
    fields = []
    for f in st.fields:
        t = _PRIMITIVE.get(type(f.dataType))
        if t is None:
            if isinstance(f.dataType, T.StructType):
                t = avro_schema_for(f.dataType, name=f"{name}_{f.name}")
            else:
                raise TypeError(
                    f"unsupported Avro mapping for field {f.name}: {f.dataType}"
                )
        fields.append(
            {"name": f.name, "type": ["null", t] if f.nullable else t}
        )
    return {"type": "record", "name": name, "fields": fields}


def avro_schema_json(st: T.StructType, name: str = "Envelope") -> str:
    return json.dumps(avro_schema_for(st, name))


# ---------------------------------------------------------------------------
# Binary encoding (Avro spec §Binary Encoding)
# ---------------------------------------------------------------------------


def _write_long(buf: bytearray, n: int) -> None:
    # zigzag then base-128 varint, little-endian groups of 7 bits.
    if not -(2**63) <= n < 2**63:
        # Python ints are unbounded; silently emitting an 11-byte varint
        # would corrupt the record for any conformant reader.
        raise OverflowError(f"Avro long out of 64-bit range: {n}")
    n = (n << 1) ^ (n >> 63) if n >= 0 else ((-n) << 1) - 1
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            buf.append(b | 0x80)
        else:
            buf.append(b)
            return


def _read_long(data: bytes, pos: int) -> tuple[int, int]:
    shift = 0
    acc = 0
    while True:
        b = data[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not (b & 0x80):
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1), pos


def _encode_value(buf: bytearray, schema, v) -> None:
    if isinstance(schema, list):  # ["null", T] union
        # Only true None selects the null branch — a genuine NaN double is a
        # VALUE and must round-trip as NaN (spark-avro preserves it). The
        # pandas NaN-means-null mapping happens at the UDF boundary, where
        # that ambiguity actually lives.
        if v is None:
            _write_long(buf, 0)
            return
        _write_long(buf, 1)
        _encode_value(buf, schema[1], v)
        return
    if isinstance(schema, dict):  # record
        for f in schema["fields"]:
            _encode_value(buf, f["type"], v[f["name"]] if v is not None else None)
        return
    if schema in ("long", "int"):
        _write_long(buf, int(v))
    elif schema == "double":
        buf += _struct.pack("<d", float(v))
    elif schema == "string":
        b = str(v).encode("utf-8")
        _write_long(buf, len(b))
        buf += b
    elif schema == "bytes":
        b = bytes(v)
        _write_long(buf, len(b))
        buf += b
    elif schema == "boolean":
        buf.append(1 if v else 0)
    elif schema == "null":
        pass
    else:
        raise TypeError(f"unsupported Avro type: {schema}")


def _decode_value(data: bytes, pos: int, schema):
    if isinstance(schema, list):
        idx, pos = _read_long(data, pos)
        if schema[idx] == "null":
            return None, pos
        return _decode_value(data, pos, schema[idx])
    if isinstance(schema, dict):
        out = {}
        for f in schema["fields"]:
            out[f["name"]], pos = _decode_value(data, pos, f["type"])
        return out, pos
    if schema in ("long", "int"):
        return _read_long(data, pos)
    if schema == "double":
        return _struct.unpack_from("<d", data, pos)[0], pos + 8
    if schema == "string":
        n, pos = _read_long(data, pos)
        return data[pos : pos + n].decode("utf-8"), pos + n
    if schema == "bytes":
        n, pos = _read_long(data, pos)
        return bytes(data[pos : pos + n]), pos + n
    if schema == "boolean":
        return data[pos] == 1, pos + 1
    if schema == "null":
        return None, pos
    raise TypeError(f"unsupported Avro type: {schema}")


def encode_record(schema: dict, record: dict) -> bytes:
    buf = bytearray()
    _encode_value(buf, schema, record)
    return bytes(buf)


def decode_record(schema: dict, data: bytes) -> dict:
    v, pos = _decode_value(data, 0, schema)
    if pos != len(data):
        raise ValueError(f"trailing {len(data) - pos} bytes after Avro record")
    return v


# ---------------------------------------------------------------------------
# Spark surface
# ---------------------------------------------------------------------------


def _scrub_nan(x):
    """Map pandas' NaN-for-NULL to None at EVERY nesting depth.

    avro_schema_for maps nested structs/arrays recursively, so the scrub
    must follow: a NaN inside a nested struct field otherwise reaches the
    codec unscrubbed and the documented NaN/NULL-conflation rule would
    silently not apply one level down."""
    if isinstance(x, float) and x != x:
        return None
    if isinstance(x, dict):
        return {k: _scrub_nan(v) for k, v in x.items()}
    if isinstance(x, (list, tuple)):
        return [_scrub_nan(v) for v in x]
    return x


def to_avro_py(struct_col: Column, struct_type: T.StructType) -> Column:
    """Serialize a struct column to Avro binary (pure-Python codec)."""
    schema = avro_schema_for(struct_type)

    @pandas_udf(T.BinaryType())
    def _enc(s: pd.Series) -> pd.Series:
        # A struct column arrives as a pandas DataFrame (one column per field).
        # pandas represents SQL NULL as NaN in float columns, so NaN here is
        # mapped to the null branch — a genuine NaN double entering through
        # this UDF is indistinguishable from NULL (Arrow/pandas limitation);
        # use encode_record directly where that distinction matters.
        rows = s.to_dict("records") if isinstance(s, pd.DataFrame) else list(s)
        rows = [_scrub_nan(r) for r in rows]
        return pd.Series([encode_record(schema, r) for r in rows])

    return _enc(struct_col)


def from_avro_py(
    bytes_col: Column, struct_type: T.StructType, *, on_error: str = "fail"
) -> Column:
    """Deserialize Avro binary back into the struct (inverse of to_avro_py).

    ``on_error='fail'`` (default) propagates decoder exceptions — the P9
    connector-stop semantics. ``on_error='mark'`` returns the struct
    extended with a ``__codec_err`` string field: NULL on success (and for
    the documented NULL-payload → all-NULL-row contract), the exception
    text for a MALFORMED payload whose fields are then all NULL — the
    shape :func:`debezium_spark.formats.errors.decode_or_quarantine`
    splits into good rows vs the DLQ without a second decode pass."""
    schema = avro_schema_for(struct_type)
    names = [f.name for f in struct_type.fields]
    if on_error == "mark":
        marked_t = T.StructType(
            [*struct_type.fields, T.StructField("__codec_err", T.StringType())]
        )

        @pandas_udf(marked_t)
        def _dec_marked(s: pd.Series) -> pd.DataFrame:
            rows = []
            for b in s:
                if b is None:
                    r = dict.fromkeys(names)
                    r["__codec_err"] = None
                else:
                    try:
                        r = decode_record(schema, b)
                        r["__codec_err"] = None
                    except Exception as e:  # malformed wire bytes
                        r = dict.fromkeys(names)
                        r["__codec_err"] = f"{type(e).__name__}: {e}"
                rows.append(r)
            return pd.DataFrame(rows, columns=[*names, "__codec_err"])

        return _dec_marked(bytes_col)
    if on_error != "fail":
        raise ValueError(f"on_error must be 'fail' or 'mark', got {on_error!r}")

    @pandas_udf(struct_type)
    def _dec(s: pd.Series) -> pd.DataFrame:
        # NULL payloads decode to an all-NULL row instead of crashing the
        # batch with an opaque TypeError inside the decoder.
        rows = [
            decode_record(schema, b) if b is not None else dict.fromkeys(names)
            for b in s
        ]
        return pd.DataFrame(rows, columns=names)

    return _dec(bytes_col)


def avro_roundtrip(df: DataFrame, cols: list[str], out_prefix: str = "") -> DataFrame:
    """Encode the given columns as one Avro record per row, decode back, and
    return the decoded fields (plus the encoded size) — the F1 Avro leg's
    self-check shape."""
    st = T.StructType([df.schema[c] for c in cols])
    rec = F.struct(*[F.col(c) for c in cols])
    enc = to_avro_py(rec, st).alias("avro_bytes")
    tmp = df.select(enc)
    dec = from_avro_py(F.col("avro_bytes"), st)
    return tmp.select(
        F.length("avro_bytes").cast("long").alias("avro_len"), dec.alias("d")
    ).select("avro_len", *[F.col(f"d.{c}").alias(f"{out_prefix}{c}") for c in cols])
