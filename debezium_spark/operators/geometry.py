"""T14 — geometry SMTs over the struct{wkb binary, srid int} logical type.

Reference: the geometry logical types (debezium-connector-common/src/main/
java/io/debezium/data/geometry/Geometry.java:25 — struct{wkb bytes, srid}),
``GeometryFormatTransformer`` (debezium-connect-plugins/.../transforms/
GeometryFormatTransformer.java:30 — WKB ↔ hex/base64 re-encode) and
``SwapGeometryCoordinates`` (.../SwapGeometryCoordinates.java:33), with the
WKB layout from ``WkbReader`` (.../spatial/WkbReader.java).

Spark shape: geometry stays an opaque ``BinaryType`` column — the multimodal
pattern: bytes + typed metadata, transformed with native binary functions
(substring/concat/hex/base64) so nothing leaves the JVM. A POINT WKB is
21 bytes: [0]=endianness, [1..4]=type (1), [5..12]=x f64 LE, [13..20]=y f64 LE.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

WKB_POINT_LEN = 21


def geometry_format(geom_wkb: Column, fmt: str) -> Column:
    """GeometryFormatTransformer: re-encode the wkb bytes (hex/base64/wkb)."""
    if fmt == "hex":
        return F.lower(F.hex(geom_wkb))
    if fmt == "base64":
        return F.base64(geom_wkb)
    if fmt == "wkb":
        return geom_wkb
    raise ValueError(f"unknown geometry format: {fmt}")


def is_point_wkb(geom_wkb: Column) -> Column:
    """Structural validity: length and little-endian POINT type header."""
    return (F.length(geom_wkb) == WKB_POINT_LEN) & (
        F.lower(F.hex(F.substring(geom_wkb, 1, 5))) == "0101000000"
    )


def swap_point_coordinates(geom_wkb: Column) -> Column:
    """SwapGeometryCoordinates for POINT: swap the x/y coordinate bytes.

    Byte-level: header(5) ‖ y(8) ‖ x(8) — pure binary substring/concat,
    no decode round-trip. Non-POINT geometries pass through unchanged
    (the SMT's behavior for unsupported types).
    """
    swapped = F.concat(
        F.substring(geom_wkb, 1, 5),
        F.substring(geom_wkb, 14, 8),
        F.substring(geom_wkb, 6, 8),
    )
    return F.when(is_point_wkb(geom_wkb), swapped).otherwise(geom_wkb)


def point_wkb_from_hex_coords(x_hex: Column, y_hex: Column) -> Column:
    """Deterministic POINT WKB synthesis from two 16-hex-digit (8-byte LE)
    coordinate encodings — the fixture generator for geometry tests (no
    float→bits builtin exists in either engine, so fixtures carry hex)."""
    return F.unhex(F.concat(F.lit("0101000000"), x_hex, y_hex))


def with_geometry_struct(
    df: DataFrame, wkb_col: str, srid: int | Column = 4326, out_col: str = "geom"
) -> DataFrame:
    """Wrap a wkb column into the Geometry logical struct (Geometry.java:25)."""
    srid_c = F.lit(srid) if isinstance(srid, int) else srid
    return df.withColumn(
        out_col,
        F.struct(F.col(wkb_col).alias("wkb"), srid_c.cast("int").alias("srid")),
    )


# ---------------------------------------------------------------------------
# Circle / Line logical types — the two PG geometric types with no WKB form
# (Circle.java:24-46 struct{center: Point, radius f64}; Line.java:24-47
# struct{a,b,c f64} for Ax + By + C = 0). Carried losslessly as nested
# structs; sinks without a native type dispatch on the struct shape.
# ---------------------------------------------------------------------------


def circle_struct(x: Column, y: Column, radius: Column) -> Column:
    """Circle logical value (Circle.java:59-67): true center + radius, no
    lossy WKB approximation."""
    center = F.struct(
        x.cast("double").alias("x"), y.cast("double").alias("y")
    )
    return F.struct(center.alias("center"), radius.cast("double").alias("radius"))


def line_struct(a: Column, b: Column, c: Column) -> Column:
    """Line logical value (Line.java:59-66): coefficients of Ax + By + C = 0."""
    return F.struct(
        a.cast("double").alias("a"),
        b.cast("double").alias("b"),
        c.cast("double").alias("c"),
    )


def line_through_points(x1: Column, y1: Column, x2: Column, y2: Column) -> Column:
    """The infinite line through two points, as Line coefficients — the PG
    two-point `line '[(x1,y1),(x2,y2)]'` constructor normalized to {a,b,c}."""
    a = y2 - y1
    b = x1 - x2
    c = x2 * y1 - x1 * y2
    return line_struct(a, b, c)


def circle_contains_point(circle: Column, px: Column, py: Column) -> Column:
    """PG `circle @> point`: squared-distance test, no sqrt (exact in f64
    whenever the product terms are)."""
    dx = px.cast("double") - circle["center"]["x"]
    dy = py.cast("double") - circle["center"]["y"]
    r = circle["radius"]
    return (dx * dx + dy * dy) <= (r * r)


def parse_pg_circle(text: Column) -> Column:
    """Parse the PG text form ``<(x,y),r>`` into the Circle struct — the
    decode path a circle column takes out of a text changefeed."""
    num = r"(-?\d+(?:\.\d+)?)"
    pat = rf"<\({num},{num}\),{num}>"
    return circle_struct(
        F.regexp_extract(text, pat, 1).cast("double"),
        F.regexp_extract(text, pat, 2).cast("double"),
        F.regexp_extract(text, pat, 3).cast("double"),
    )


def parse_pg_line(text: Column) -> Column:
    """Parse the PG text form ``{a,b,c}`` into the Line struct."""
    num = r"(-?\d+(?:\.\d+)?)"
    pat = rf"\{{{num},{num},{num}\}}"
    return line_struct(
        F.regexp_extract(text, pat, 1).cast("double"),
        F.regexp_extract(text, pat, 2).cast("double"),
        F.regexp_extract(text, pat, 3).cast("double"),
    )
