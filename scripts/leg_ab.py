#!/usr/bin/env python
"""Same-window per-leg timer for A/B sandwiches on this noisy host:
2 warm-ups + median-of-3 noop-sink runs per named leg, with a 3-sample
job-latency probe before and after (calm floor 0.03-0.08 s/job — read
the probes before trusting any delta). Pair with `git stash` to measure
old-vs-new back-to-back in one window:

    python scripts/leg_ab.py s32_binlog_txn_payload x6_lsh_candidates
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def probe(spark, n=3):
    out = []
    for _ in range(n):
        t0 = time.perf_counter()
        spark.range(1).count()
        out.append(round(time.perf_counter() - t0, 3))
    return out


def main():
    from debezium_spark.session import get_spark
    from debezium_spark.suite import load_all

    legs = sys.argv[1:]
    spark = get_spark()
    sf_dir = os.environ["SPARK_GRAFT_SF_DIR"]
    qs = load_all()
    print("probe_pre", probe(spark), flush=True)
    res = {}
    for name in legs:
        df = qs[name].fn(spark, sf_dir)
        df.schema  # warm the listing/analysis
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            ts.append(round(time.perf_counter() - t0, 3))
        res[name] = ts  # ts[0:2] = warm-ups
        print(name, ts, "median", sorted(ts[2:])[1], flush=True)
    print("probe_post", probe(spark), flush=True)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
