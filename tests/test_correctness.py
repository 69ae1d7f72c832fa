"""Driver-mimicking correctness gate: every registered query vs its DuckDB
oracle, compared exactly (order-insensitive, columns sorted by name).

Stricter than the driver's value-hash: full value equality after
normalization, so a hash mismatch in the driver should never surprise us.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd
import pytest

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _duck(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    import numpy as np

    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            # The driver's canonicalizer sorts the frame on all columns, which
            # throws on unhashable cells (list/dict/ndarray). Mirror that
            # failure mode instead of stringifying it away — stringification
            # is exactly how r5's h5 driver-only failure shipped.
            bad = df[c].map(lambda v: isinstance(v, (list, dict, set, np.ndarray)))
            if bad.any():
                raise TypeError(
                    f"column {c!r} contains unhashable cells "
                    "(list/dict/ndarray) — the driver canonicalizer would "
                    "die on this; render arrays as strings in the query"
                )
            df[c] = df[c].map(
                lambda v: None
                if v is None or (isinstance(v, float) and math.isnan(v))
                else str(v)
            )
        elif str(df[c].dtype).startswith("datetime"):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def _queries():
    from debezium_spark.suite import load_all

    return load_all()


QUERY_ITEMS = sorted(_queries().items())


@pytest.mark.parametrize("name", [n for n, _ in QUERY_ITEMS])
def test_query_matches_oracle(spark, sf_dir, name):
    q = _queries()[name]
    got = q.fn(spark, sf_dir)
    got_pdf = got.toPandas()
    assert got_pdf is not None
    if q.oracle is None:
        assert len(got_pdf) >= 0  # rows-only check, mirrors the driver
        return
    con = _duck(sf_dir)
    exp_pdf = con.execute(q.oracle).df()
    con.close()

    g, e = _normalize(got_pdf), _normalize(exp_pdf)
    assert list(g.columns) == list(e.columns), (
        f"{name}: columns differ: {list(g.columns)} vs {list(e.columns)}"
    )
    assert len(g) == len(e), f"{name}: row count {len(g)} vs {len(e)}"
    # Dtype-CLASS parity: the driver's value-hash distinguishes 1234 from
    # 1234.0, so an int-vs-float skew between Spark and the oracle must fail
    # here too (caught r3's m1_image_meta, where DuckDB list_aggregate
    # returned DOUBLE against Spark's BIGINT).
    for c in g.columns:
        gk, ek = _dtype_class(g[c]), _dtype_class(e[c])
        assert gk == ek, f"{name}.{c}: dtype class {gk} (spark) vs {ek} (oracle)"
    pd.testing.assert_frame_equal(g, e, check_dtype=False, check_exact=True)


def test_no_complex_output_schemas(spark, built_queries):
    """Driver-canonicalizer compatibility audit: no registered query may emit
    a top-level array/map/struct column. The driver sorts a pandas frame on
    all columns and dies on unhashable list cells (r5's h5 red row); complex
    values must be rendered as deterministic strings before the projection.
    Output schemas are scale-independent, so the audit reads the shared
    sf0.01 build instead of paying a third full-registry fixture pass."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    assert set(built_queries) == {n for n, _ in QUERY_ITEMS}
    offenders = []
    for name, df in built_queries.items():
        for field in df.schema.fields:
            if isinstance(field.dataType, (ArrayType, MapType, StructType)):
                offenders.append(f"{name}.{field.name}: {field.dataType.simpleString()}")
    assert not offenders, (
        "queries emit driver-unhashable complex columns:\n" + "\n".join(offenders)
    )


def _dtype_class(s: pd.Series) -> str:
    kind = s.dtype.kind  # i/u int, f float, b bool, M datetime, O object
    if kind in ("i", "u"):
        return "int"
    if kind == "f":
        # All-NaN or NaN-bearing int columns surface as float in pandas;
        # treat a float column whose non-null values are all integral as a
        # possible int carrier only when nulls exist (nullable-int lifting).
        nonnull = s.dropna()
        if len(nonnull) < len(s) and (nonnull % 1 == 0).all():
            return "int"
        return "float"
    return {"b": "bool", "M": "datetime", "O": "object"}.get(kind, kind)
