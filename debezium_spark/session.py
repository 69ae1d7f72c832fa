"""SparkSession factory with scale-appropriate defaults.

Local testing runs on local[N]; the same config block is what we would ship
for a multi-executor cluster (AQE, skew-join handling, arrow, UTC) — only
memory/partition sizing changes with the deployment.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "debezium-spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the SparkSession.

    Defaults follow the tuning rules that survive a 1000-executor scale-up:
    AQE on (runtime coalesce + skew-join split), shuffle partitions sized to
    the parallelism at hand, Arrow enabled for the pandas boundary, session
    timezone pinned to UTC so results are deployment-independent.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    if shuffle_partitions is None:
        shuffle_partitions = cpus
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # The synthetic events.parquet stores TIMESTAMP(NANOS), which Spark
        # refuses to scan natively; read as long nanos and convert explicitly.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        # Python<->JVM local-exchange sockets (collect / createDataFrame)
        # authenticate with a 15 s default timeout; a driver GC pause in a
        # long session (observed: the 180-query gate's PQ leg, ~45 min in)
        # overruns it and kills an otherwise-healthy query. These are
        # LOCAL handshakes — a generous timeout costs nothing when healthy.
        .config("spark.python.authenticate.socketTimeout", "120s")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Managed (bucketed) tables land in a scratch warehouse, not cwd.
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get(
                "SPARK_GRAFT_WAREHOUSE",
                os.path.join(
                    os.environ.get("TMPDIR", "/tmp"), "spark_graft_warehouse"
                ),
            ),
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
