#!/usr/bin/env python
"""Capture .explain("formatted") for every HEADLINE bench leg into
plans/r13/<query>_<tag>.txt.  Usage:

    python scripts/capture_plans.py before [query ...]

Analysis-only: builds each DataFrame (fixture localCheckpoints do run) but
does not execute the query itself beyond what fn() materializes.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = sys.argv[2:]

    from debezium_spark.session import get_spark
    from debezium_spark.suite import load_all

    import bench

    spark = get_spark()
    qs = load_all()
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r14"),
    )
    os.makedirs(out_dir, exist_ok=True)

    names = only or [n for n in bench.HEADLINE if n in qs]
    for name in names:
        try:
            df = qs[name].fn(spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001
            plan = f"ERROR building plan: {type(e).__name__}: {e}"
        with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as fh:
            fh.write(plan)
        print(f"captured {name}_{tag}.txt ({len(plan)} chars)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
