#!/usr/bin/env python
"""Local replica of the driver's correctness gate.

Runs every registered query at sf0.01 through Spark AND its DuckDB oracle,
compares row count, schema (column names sorted), and an order-insensitive
value hash. Usage:

    python scripts/check_correctness.py [query_name ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def value_hash(df) -> str:
    """Order-insensitive hash: sort columns by name, canonicalize values,
    hash each row, XOR-combine."""
    import hashlib

    cols = sorted(df.columns)
    pdf = df[cols]
    h = 0
    for row in pdf.itertuples(index=False, name=None):
        canon = []
        for v in row:
            if v is None or (isinstance(v, float) and v != v):
                canon.append("∅")
            elif isinstance(v, float):
                # Keep the .10g print tolerance but never let a float
                # canonicalize identically to an int: the driver's hash
                # DISTINGUISHES 1234 from 1234.0 (r3's m1 and r7's x27
                # both shipped a DuckDB HUGEINT/DOUBLE vs Spark BIGINT
                # skew that this loose form masked).
                s = f"{v:.10g}"
                if s.lstrip("-").isdigit():
                    s += ".0"
                canon.append(s)
            elif isinstance(v, (list, tuple)):
                canon.append(json.dumps(list(v), default=str))
            else:
                canon.append(str(v))
        h ^= int(hashlib.md5("|".join(canon).encode()).hexdigest()[:16], 16)
    return f"{h:016x}"


def main() -> int:
    import duckdb

    from debezium_spark.session import get_spark
    from debezium_spark.suite import load_all

    spark = get_spark()
    qs = load_all()
    names = sys.argv[1:] or list(qs)

    con = duckdb.connect()
    for t in TABLES:
        path = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")

    results = {}
    n_pass = 0
    for name in names:
        q = qs[name]
        rec: dict = {"err": None}
        t0 = time.time()
        try:
            sdf = q.fn(spark, SF_DIR)
            spdf = sdf.toPandas()
            rec["rows"] = len(spdf)
            rec["cols"] = sorted(spdf.columns)
            if q.oracle:
                odf = con.execute(q.oracle).fetchdf()
                # duckdb NaN for nulls in float cols; normalize via object
                rec["oracle_rows"] = len(odf)
                rec["rows_match"] = len(spdf) == len(odf)
                rec["schema_match"] = sorted(spdf.columns) == sorted(odf.columns)
                hs, ho = value_hash(spdf), value_hash(odf)
                rec["hash_match"] = hs == ho
                ok = rec["rows_match"] and rec["schema_match"] and rec["hash_match"]
            else:
                rec["hash_match"] = None
                ok = True
        except Exception as e:  # noqa: BLE001
            rec["err"] = f"{type(e).__name__}: {e}"[:500]
            ok = False
        rec["sec"] = round(time.time() - t0, 2)
        results[name] = rec
        n_pass += ok
        status = "PASS" if ok else ("ERR " if rec["err"] else "FAIL")
        print(f"{status} {name:32s} {rec.get('rows', '-'):>8} rows "
              f"{rec['sec']:>6}s {rec['err'] or ''}")
        if not ok and not rec["err"] and q.oracle:
            if not rec["schema_match"]:
                print(f"     spark cols:  {sorted(spdf.columns)}")
                print(f"     oracle cols: {sorted(odf.columns)}")

    print(f"\n{n_pass}/{len(names)} pass")
    with open("/tmp/check_correctness.json", "w") as f:
        json.dump(results, f, indent=1, default=str)
    return 0 if n_pass == len(names) else 1


if __name__ == "__main__":
    sys.exit(main())
