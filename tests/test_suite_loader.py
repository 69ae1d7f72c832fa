"""The suite loader must never silently degrade.

load_all() guards each module import so one broken file doesn't zero the
whole registry — but r7 showed that guard can mask a dead registration
(m6_shard_packing shipped crashing at import and nothing failed). These
tests make loader degradation a hard failure: every suite module must
import cleanly, every PRIORITY name must resolve to a registered query,
and every registered query must carry a callable.
"""

from __future__ import annotations

import importlib

import pytest

from debezium_spark import suite


def test_every_suite_module_imports_cleanly():
    suite.load_all()
    assert suite.LOAD_FAILURES == {}, (
        "suite modules failed to import (registrations silently dropped):\n"
        + "\n".join(f"--- {m} ---\n{tb}" for m, tb in suite.LOAD_FAILURES.items())
    )


@pytest.mark.parametrize("mod", suite.SUITE_MODULES)
def test_suite_module_direct_import(mod):
    # Import outside the guard too, so the traceback surfaces directly.
    importlib.import_module(f"debezium_spark.suite.{mod}")


def test_priority_names_all_registered():
    queries = suite.load_all()
    missing = [n for n in suite.PRIORITY if n not in queries]
    assert missing == [], f"PRIORITY names not registered: {missing}"


def test_registry_entries_well_formed():
    queries = suite.load_all()
    assert len(queries) >= 168
    for name, q in queries.items():
        assert callable(q.fn), name
        assert q.oracle is None or isinstance(q.oracle, str), name
