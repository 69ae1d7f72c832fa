"""Run the COW / MOR pipeline throughput blocks standalone (same harness as
bench.py's _pipeline_throughput) — the feedback loop for sink-latency work.

Usage: PYTHONPATH=. python scripts/profile_cow.py [cow|mor]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

from debezium_spark.session import get_spark
from debezium_spark.sinks.merge import ParquetMergeSink
from debezium_spark.sinks.mor import LogMergeSink
from debezium_spark.sources.changefeed import accounts_changefeed, accounts_snapshot
from debezium_spark.streaming import ChangeDataPipeline, replay_feed

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "cow"
    spark = get_spark("profile-cow")
    env = accounts_changefeed(spark, SF_DIR)
    n_events = env.count()
    num_chunks = max(1, n_events // 4096)
    tmp = tempfile.mkdtemp(prefix="profile_cow_")
    try:
        snap = accounts_snapshot(spark, SF_DIR).repartition(8)
        if which == "mor":
            sink = LogMergeSink(spark, f"{tmp}/target", ["id"], compact_every=8)
        else:
            sink = ParquetMergeSink(spark, f"{tmp}/target", ["id"], num_buckets=16)
        pipe = ChangeDataPipeline(
            spark,
            feed_dir=f"{tmp}/feed",
            envelope_schema=env.schema,
            sink=sink,
            checkpoint_dir=f"{tmp}/ckpt",
            max_files_per_trigger=1,
        )
        pipe.run_snapshot(snap)
        replay_feed(env, f"{tmp}/feed", num_chunks=num_chunks)
        t0 = time.time()
        pipe.run_available()
        stream_sec = time.time() - t0
        print(
            f"{which}: events={n_events} batches={pipe.batches_seen} "
            f"stream_sec={stream_sec:.2f} ev/s={n_events / stream_sec:.0f}"
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
