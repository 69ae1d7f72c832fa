#!/usr/bin/env python
"""Per-column-arm ablation for the typed-projection legs: time a noop
write of ``typed.select("id")`` (decode + framing baseline), then
``typed.select("id", <col>)`` per column — Spark prunes the unselected
arms' expressions above the opaque decode, so each delta isolates one
arm's JVM expression cost. Usage:

    python scripts/ablate_arms.py s22b_pg_array_grammar
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# leg -> (fixture fn name, registry table, typed_projection kwargs)
LEGS = {
    "s22_pgoutput_typed": ("_pgoutput_typed_fixture", "typed_accounts", {}),
    "s22b_pg_array_grammar": (
        "_pg_array_grammar_fixture", "arrayful", {"array_dims": {"grid": 2}}
    ),
    "s22e_pg_misc_types": ("_pg_misc_types_fixture", "miscful", {}),
}


def main() -> int:
    leg = sys.argv[1]
    fixture_name, table, kwargs = LEGS[leg]

    from debezium_spark.session import get_spark
    from debezium_spark.sources.pgoutput import (
        decode_pgoutput_binary,
        relation_registry,
        typed_projection,
    )
    from debezium_spark.suite import cdc2

    if leg == "s22e_pg_misc_types":
        kwargs["ext_oids"] = cdc2._PG_MISC_EXT

    spark = get_spark()
    sf_dir = os.environ["SPARK_GRAFT_SF_DIR"]
    stream = getattr(cdc2, fixture_name)(spark, sf_dir)
    reg = relation_registry(spark, stream)
    dec = decode_pgoutput_binary(spark, stream, registry=reg)
    typed = typed_projection(dec, reg, "public", table, **kwargs)

    def t3(df):
        df.write.format("noop").mode("overwrite").save()  # warm
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        return sorted(runs)[1]

    base = t3(typed.select("id"))
    print(f"baseline (decode + id): {base:.3f}s", flush=True)
    for c in typed.columns:
        if c in ("id", "lsn", "op", "xid", "commit_ts_us"):
            continue
        spark.sparkContext.setJobDescription(f"ablate:{leg}:{c}")
        d = t3(typed.select("id", c)) - base
        print(f"  {c:12s} +{d:.3f}s", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
