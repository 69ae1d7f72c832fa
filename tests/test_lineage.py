"""OpenLineage emission goldens (streaming/lineage.py) — the P7
extension mirroring debezium-openlineage-core's OpenLineageEmitter:
RunEvents per lifecycle state with job/run/dataset facets, validated
against the public RunEvent shape."""

from __future__ import annotations

import shutil
import uuid

import pytest

from debezium_spark.streaming.lineage import (
    STATE_EVENT_TYPES,
    DatasetMetadata,
    OpenLineageEmitter,
    validate_run_event,
)


@pytest.fixture()
def dirs(tmp_path):
    d = {
        "feed": str(tmp_path / "feed"),
        "target": str(tmp_path / "target"),
        "ckpt": str(tmp_path / "ckpt"),
        "lineage": str(tmp_path / "lineage.jsonl"),
    }
    yield d
    shutil.rmtree(tmp_path, ignore_errors=True)


def test_state_mapping_and_envelope(tmp_path):
    """INITIAL→START, RUNNING→RUNNING, RESTARTING→FAIL, STOPPED→COMPLETE
    (OpenLineageEmitter javadoc); every facet carries the
    _producer/_schemaURL envelope; runId is stable across one run."""
    em = OpenLineageEmitter(
        str(tmp_path / "l.jsonl"),
        job_name="pg-connector-task",
        config={"connector": "postgres", "slot": "s1"},
        owners={"data-eng": "TEAM"},
        tags={"tier": "gold"},
    )
    assert STATE_EVENT_TYPES == {
        "INITIAL": "START", "RUNNING": "RUNNING",
        "RESTARTING": "FAIL", "STOPPED": "COMPLETE",
    }
    docs = [em.emit(s) for s in
            ("INITIAL", "RUNNING", "RESTARTING", "STOPPED")]
    assert [d["eventType"] for d in docs] == [
        "START", "RUNNING", "FAIL", "COMPLETE",
    ]
    for d in docs:
        assert validate_run_event(d) == []
        assert d["run"]["runId"] == docs[0]["run"]["runId"]
        uuid.UUID(d["run"]["runId"])
        jf = d["job"]["facets"]
        assert jf["jobType"]["processingType"] == "STREAMING"
        assert jf["jobType"]["jobType"] == "TASK"
        assert jf["ownership"]["owners"] == [
            {"name": "data-eng", "type": "TEAM"}]
        assert jf["tags"]["tags"] == [
            {"key": "tier", "value": "gold", "source": "CONFIG"}]
        assert d["run"]["facets"]["debezium_config"]["configs"] == [
            "connector=postgres", "slot=s1"]
    assert em.read() == docs

    with pytest.raises(ValueError, match="unknown task state"):
        em.emit("PAUSED")


def test_error_facet_carries_python_stacktrace(tmp_path):
    em = OpenLineageEmitter(str(tmp_path / "l.jsonl"), job_name="j")
    try:
        raise RuntimeError("slot vanished")
    except RuntimeError as exc:
        doc = em.emit("RESTARTING", error=exc)
    assert doc["eventType"] == "FAIL"
    f = doc["run"]["facets"]["errorMessage"]
    assert f["message"] == "slot vanished"
    assert f["programmingLanguage"] == "Python"
    assert "RuntimeError" in f["stackTrace"]
    assert validate_run_event(doc) == []


def test_dataset_schema_recurses_nested_structs(spark):
    """Schema facet fields recurse into nested structs like the
    reference's buildSchemaDatasetFacetFields."""
    df = spark.createDataFrame(
        [(1, ("a", 2.0))],
        "id long, payload struct<name:string, score:double>",
    )
    ds = DatasetMetadata.from_df(
        "inventory.orders", df, kind="input",
        namespace="postgres://db:5432",
    )
    ol = ds.to_openlineage()
    fields = ol["facets"]["schema"]["fields"]
    assert fields[0] == {"name": "id", "type": "bigint"}
    assert fields[1]["name"] == "payload"
    assert fields[1]["fields"] == [
        {"name": "name", "type": "string"},
        {"name": "score", "type": "double"},
    ]
    assert ol["namespace"] == "postgres://db:5432"


def test_snapshot_stream_merge_run_emits_valid_lineage(spark, sf_dir, dirs):
    """End-to-end: a snapshot→stream→merge pipeline run emits
    START (with the source table as input and sink as output) →
    RUNNING → COMPLETE, every document validating against the public
    RunEvent shape, with source/sink dataset schemas attached."""
    from debezium_spark.sinks.merge import ParquetMergeSink
    from debezium_spark.sources.changefeed import (
        accounts_changefeed,
        accounts_snapshot,
    )
    from debezium_spark.streaming import ChangeDataPipeline, replay_feed

    env = accounts_changefeed(spark, sf_dir)
    snap = accounts_snapshot(spark, sf_dir)
    sink = ParquetMergeSink(spark, dirs["target"], ["id"], num_buckets=8)
    em = OpenLineageEmitter(
        dirs["lineage"],
        job_name="accounts-cdc",
        config={"table": "accounts"},
    )
    datasets = [
        DatasetMetadata.from_df(
            "public.accounts", env, kind="input",
            namespace="postgres://src:5432",
        ),
        DatasetMetadata.from_df(
            "warehouse.accounts", snap, kind="output",
            namespace=f"file://{dirs['target']}",
        ),
    ]
    pipe = ChangeDataPipeline(
        spark,
        feed_dir=dirs["feed"],
        envelope_schema=env.schema,
        sink=sink,
        checkpoint_dir=dirs["ckpt"],
        lineage=em,
        lineage_datasets=datasets,
    )
    pipe.run_snapshot(snap)
    replay_feed(env, dirs["feed"], num_chunks=2)
    pipe.run_available()

    docs = em.read()
    assert [d["eventType"] for d in docs] == [
        "START", "RUNNING", "COMPLETE",
    ]
    for d in docs:
        assert validate_run_event(d) == [], d
        assert d["job"]["name"] == "accounts-cdc"
        assert [i["name"] for i in d["inputs"]] == ["public.accounts"]
        assert [o["name"] for o in d["outputs"]] == ["warehouse.accounts"]
        in_fields = {f["name"] for f in
                     d["inputs"][0]["facets"]["schema"]["fields"]}
        assert {"op", "before", "after", "source"} <= in_fields
    assert len({d["run"]["runId"] for d in docs}) == 1
