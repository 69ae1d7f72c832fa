#!/usr/bin/env python
"""Per-SMT overhead microbenchmark — the JMH-analog of the reference's
SmtOverheadPerf / FilterSmtPerf (debezium-microbenchmark/.../core/
SmtOverheadPerf.java): events/s through each transform alone, against the
no-op baseline, on the sf0.1 change feed (~100k envelopes).

Run: python scripts/microbench.py  →  one JSON line + a readable table.

Reading the numbers: overhead is vs. a no-op write of the SAME input, so
row-reducing or column-pruning transforms come out "negative" (they wrote
less) — the interesting signal is the positive outliers, where the
transform's expressions cost more than the write itself.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _flat_record(df):
    from pyspark.sql import functions as F

    return df.select(
        F.col("key.id").alias("id"),
        F.col("after.status").alias("status"),
        F.col("after.balance").alias("balance"),
        F.col("op"),
    )


def _avro_encode_case(df):
    import pyspark.sql.types as T
    from pyspark.sql import functions as F

    from debezium_spark.formats.avro_codec import to_avro_py

    flat = _flat_record(df)
    st = T.StructType([flat.schema[c] for c in flat.columns])
    return flat.select(
        F.length(to_avro_py(F.struct(*flat.columns), st)).alias("n")
    )


def _protobuf_encode_case(df):
    import pyspark.sql.types as T
    from pyspark.sql import functions as F

    from debezium_spark.formats.protobuf_codec import to_protobuf_py

    flat = _flat_record(df)
    st = T.StructType([flat.schema[c] for c in flat.columns])
    return flat.select(
        F.length(to_protobuf_py(F.struct(*flat.columns), st)).alias("n")
    )


def main() -> None:
    from pyspark.sql import functions as F

    from debezium_spark.operators.filter import filter_records, skipped_operations
    from debezium_spark.operators.mask import mask_string
    from debezium_spark.operators.misc import enforce_record_size, header_to_value
    from debezium_spark.operators.route import (
        content_based_router,
        partition_routing,
    )
    from debezium_spark.operators.unwrap import (
        extract_changed_record_state,
        extract_new_record_state,
    )
    from debezium_spark.session import get_spark
    from debezium_spark.sources.changefeed import accounts_changefeed

    spark = get_spark("smt-microbench")
    env = accounts_changefeed(spark, SF_DIR).localCheckpoint(eager=True)
    n = env.count()

    cases = {
        "baseline_noop": lambda df: df,
        "t1_unwrap": lambda df: extract_new_record_state(df),
        "t3_changed_state": lambda df: extract_changed_record_state(df),
        "t4_filter_expr": lambda df: filter_records(
            df, "op != 'd' or after is null"
        ),
        "t22_skip_ops": lambda df: skipped_operations(df, ("d",)),
        "t5_content_router": lambda df: content_based_router(
            df,
            "CASE WHEN op = 'c' THEN 'creates' "
            "WHEN op = 'u' THEN 'updates' ELSE 'other' END",
        ),
        "t10_partition_routing": lambda df: partition_routing(
            df.withColumn("id", F.col("key.id")), ["id"], 8
        ),
        "t17_mask": lambda df: mask_string(
            df.withColumn("status", F.col("after.status")), "status"
        ),
        "t8_header_to_value": lambda df: header_to_value(
            df.withColumn(
                "headers",
                F.create_map(F.lit("db"), F.col("source.db"),
                             F.lit("op"), F.col("op")),
            ),
            ["db", "op"],
            prefix="h_",
        ),
        "t11_enforce_size": lambda df: enforce_record_size(df, 4096),
        # Format codecs (pure-Python wire formats behind Arrow-batched
        # pandas UDFs — the deliberate slow path; these numbers are what
        # "formats are the edge of the pipeline" costs in practice).
        "f4_avro_encode": _avro_encode_case,
        "f5_protobuf_encode": _protobuf_encode_case,
    }

    results = {}
    for name, fn in cases.items():
        out = fn(env)
        out.schema  # analysis only
        best = None
        for _ in range(2):
            t0 = time.time()
            out.write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        results[name] = {
            "sec": round(best, 3),
            "events_per_sec": round(n / max(best, 1e-9)),
        }

    base = results["baseline_noop"]["sec"]
    for name, r in results.items():
        r["overhead_pct"] = round(100.0 * (r["sec"] - base) / base, 1)

    print(json.dumps({"metric": "smt_overhead", "events": n, "cases": results}))
    width = max(len(k) for k in results)
    for name, r in sorted(results.items(), key=lambda kv: kv[1]["sec"]):
        print(
            f"{name:<{width}}  {r['sec']:>7.3f}s  "
            f"{r['events_per_sec']:>9,} ev/s  {r['overhead_pct']:>6.1f}%"
        )


if __name__ == "__main__":
    main()
