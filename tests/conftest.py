from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from debezium_spark.session import get_spark

    s = get_spark("debezium-spark-tests")
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def built_queries(spark):
    """Every registered query's DataFrame, built ONCE at sf0.01 and shared
    by the registry-wide audits (cartesian scan, single-partition-window
    scan, complex-schema audit). Each audit independently rebuilding all
    ~214 fixtures (eager localCheckpoints + registry collects) cost the
    suite ~15 minutes; one shared build runs its fixture jobs through a
    small thread pool so the tail of one build back-fills the next
    (optimization guide §2.6)."""
    from concurrent.futures import ThreadPoolExecutor

    from debezium_spark.suite import load_all

    qs = load_all()

    def build(item):
        name, q = item
        return name, q.fn(spark, "/root/testdata/sf0.01")

    with ThreadPoolExecutor(max_workers=4) as pool:
        return dict(pool.map(build, sorted(qs.items())))
