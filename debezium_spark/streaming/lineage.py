"""P7 extension — OpenLineage run-event emission.

Reference: the OpenLineage module the reference grew
(debezium-openlineage/debezium-openlineage-core/.../emitter/
OpenLineageEmitter.java:54 — RunEvents built per connector lifecycle with
processing_engine + config run facets and schema'd input/output datasets;
OpenLineageJobCreator.java:14-57 — job identity with documentation /
jobType{STREAMING, integration, TASK} / ownership / tags facets; state
mapping INITIAL→START, RUNNING→RUNNING, RESTARTING→FAIL, STOPPED→COMPLETE
per the class javadoc). Everything here follows the PUBLIC OpenLineage
object model (openlineage.io/spec — RunEvent, run/job/dataset facets, the
``_producer``/``_schemaURL`` facet envelope); no client library needed,
the events are plain JSON documents on the same append-only JSON-lines
channel NotificationLog rides, so any OpenLineage HTTP/Kafka transport
can forward them verbatim.

Spark shape: emission is DRIVER-side metadata only (a few lines per
lifecycle transition) — nothing touches the data plane, no job is
triggered; dataset schemas come from the DataFrame's analyzed schema,
which is already resolved on the driver.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from dataclasses import dataclass, field

_SPEC = "https://openlineage.io/spec/2-0-2/OpenLineage.json"
_FACETS = "https://openlineage.io/spec/facets/1-0-0"
PRODUCER = "https://github.com/debezium-spark"

#: DebeziumTaskState → OpenLineage eventType (OpenLineageEmitter.java
#: javadoc: INITIAL→START, RUNNING→RUNNING, RESTARTING→FAIL,
#: STOPPED→COMPLETE).
STATE_EVENT_TYPES = {
    "INITIAL": "START",
    "RUNNING": "RUNNING",
    "RESTARTING": "FAIL",
    "STOPPED": "COMPLETE",
}


def _facet(facet_name: str, **body) -> dict:
    """Every OpenLineage facet carries the _producer/_schemaURL envelope."""
    return {
        "_producer": PRODUCER,
        "_schemaURL": f"{_FACETS}/{facet_name}Facet.json",
        **body,
    }


def _schema_fields(spark_schema) -> list[dict]:
    """StructType → OpenLineage schema facet fields, recursing into
    nested structs exactly like the reference's
    buildSchemaDatasetFacetFields (OpenLineageEmitter.java:178-205)."""
    from pyspark.sql import types as T

    out = []
    for f in spark_schema.fields:
        entry = {"name": f.name, "type": f.dataType.simpleString()}
        dt = f.dataType
        if isinstance(dt, T.StructType):
            entry["fields"] = _schema_fields(dt)
        out.append(entry)
    return out


@dataclass
class DatasetMetadata:
    """One lineage dataset (dataset/DatasetMetadata.java): kind routes it
    to inputs or outputs; ``namespace`` is the resolved store identity
    (the reference's DatasetNamespaceResolver output, e.g.
    'postgres://host:5432' or a filesystem URI); ``fields`` is the
    OpenLineage schema facet field list."""

    name: str
    kind: str  # "input" | "output"
    namespace: str
    type: str = "TABLE"
    fields: list = field(default_factory=list)

    @classmethod
    def from_df(cls, name: str, df, *, kind: str,
                namespace: str) -> "DatasetMetadata":
        return cls(name=name, kind=kind, namespace=namespace,
                   fields=_schema_fields(df.schema))

    def to_openlineage(self) -> dict:
        return {
            "namespace": self.namespace,
            "name": self.name,
            "facets": {
                "schema": _facet("Schema", fields=self.fields),
                "datasetType": _facet(
                    "DatasetType", datasetType=self.type, subType=""
                ),
            },
        }


class OpenLineageEmitter:
    """Append-only OpenLineage RunEvent channel for one pipeline run.

    One emitter = one run (a stable runId across its events, like the
    reference's OpenLineageContext.getRunUuid()). ``emit`` writes one
    RunEvent JSON document per call; lifecycle states map through
    STATE_EVENT_TYPES and an exception adds the errorMessage run facet
    (OpenLineageEmitter.addStackTrace:129-137, language swapped for
    Python)."""

    def __init__(
        self,
        path: str,
        *,
        job_namespace: str = "debezium-spark",
        job_name: str,
        run_id: str | None = None,
        config: dict | None = None,
        description: str = "",
        owners: dict[str, str] | None = None,
        tags: dict[str, str] | None = None,
        integration: str = "DEBEZIUM",
        engine_version: str = "0",
    ):
        self.path = path
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self.job_namespace = job_namespace
        self.job_name = job_name
        self.run_id = run_id or str(uuid.uuid4())
        self.config = dict(config or {})
        self.description = description
        self.owners = dict(owners or {})
        self.tags = dict(tags or {})
        self.integration = integration
        self.engine_version = engine_version

    # -- job identity (OpenLineageJobCreator.create) ----------------------
    def _job(self) -> dict:
        facets = {
            "documentation": _facet(
                "Documentation", description=self.description
            ),
            "jobType": _facet(
                "JobType",
                processingType="STREAMING",
                integration=self.integration,
                jobType="TASK",
            ),
        }
        if self.owners:
            facets["ownership"] = _facet(
                "Ownership",
                owners=[{"name": n, "type": t}
                        for n, t in sorted(self.owners.items())],
            )
        if self.tags:
            facets["tags"] = _facet(
                "Tags",
                tags=[{"key": k, "value": v, "source": "CONFIG"}
                      for k, v in sorted(self.tags.items())],
            )
        return {
            "namespace": self.job_namespace,
            "name": self.job_name,
            "facets": facets,
        }

    def _run_facets(self, error: BaseException | None) -> dict:
        facets = {
            "processing_engine": _facet(
                "ProcessingEngineRun",
                version=self.engine_version,
                name="debezium-spark",
                openlineageAdapterVersion="2.0.2",
            ),
            # DebeziumConfigFacet: the connector config, verbatim
            "debezium_config": _facet(
                "DebeziumConfig",
                configs=[f"{k}={v}" for k, v in sorted(self.config.items())],
            ),
        }
        if error is not None:
            import traceback

            facets["errorMessage"] = _facet(
                "ErrorMessageRun",
                message=str(error),
                programmingLanguage="Python",
                stackTrace="".join(
                    traceback.format_exception(
                        type(error), error, error.__traceback__
                    )
                ),
            )
        return facets

    def emit(
        self,
        state: str,
        datasets: list[DatasetMetadata] | None = None,
        error: BaseException | None = None,
    ) -> dict:
        """Build + append one RunEvent; returns the document (tests and
        forwarding transports read it back)."""
        if state not in STATE_EVENT_TYPES:
            raise ValueError(
                f"unknown task state {state!r} "
                f"(expected one of {sorted(STATE_EVENT_TYPES)})"
            )
        ds = datasets or []
        # ONE clock read feeds both the seconds and the fraction — two
        # reads could straddle a second boundary and render a timestamp
        # up to ~1s early, breaking event-time ordering for consumers
        now = time.time()
        doc = {
            "eventType": STATE_EVENT_TYPES[state],
            "eventTime": time.strftime(
                "%Y-%m-%dT%H:%M:%S", time.gmtime(now)
            ) + f".{int(now * 1e6) % 1_000_000:06d}Z",
            "producer": PRODUCER,
            "schemaURL": f"{_SPEC}#/definitions/RunEvent",
            "run": {
                "runId": self.run_id,
                "facets": self._run_facets(error),
            },
            "job": self._job(),
            "inputs": [d.to_openlineage() for d in ds
                       if d.kind == "input"],
            "outputs": [d.to_openlineage() for d in ds
                        if d.kind == "output"],
        }
        with open(self.path, "a") as f:
            f.write(json.dumps(doc) + "\n")
        return doc

    def read(self) -> list[dict]:
        if not os.path.exists(self.path):
            return []
        with open(self.path) as f:
            return [json.loads(line) for line in f if line.strip()]


def validate_run_event(doc: dict) -> list[str]:
    """Structural validation against the public RunEvent shape — the
    required members and facet envelopes an OpenLineage consumer relies
    on. Returns a list of problems (empty = valid); kept dependency-free
    so tests and transports can gate on it without a jsonschema lib."""
    problems = []

    def need(cond, msg):
        if not cond:
            problems.append(msg)

    need(doc.get("eventType") in
         {"START", "RUNNING", "COMPLETE", "ABORT", "FAIL", "OTHER"},
         f"eventType invalid: {doc.get('eventType')!r}")
    et = doc.get("eventTime", "")
    need(isinstance(et, str) and len(et) >= 20 and et[4] == "-"
         and et[10] == "T" and et.endswith("Z"),
         f"eventTime not ISO-8601 Zulu: {et!r}")
    need(isinstance(doc.get("producer"), str)
         and doc["producer"].startswith("http"), "producer URI missing")
    need(isinstance(doc.get("schemaURL"), str)
         and "RunEvent" in doc.get("schemaURL", ""), "schemaURL missing")
    run = doc.get("run") or {}
    try:
        uuid.UUID(run.get("runId", ""))
    except (ValueError, TypeError):
        problems.append(f"run.runId not a UUID: {run.get('runId')!r}")
    job = doc.get("job") or {}
    need(bool(job.get("namespace")) and bool(job.get("name")),
         "job namespace/name missing")
    for section in ("inputs", "outputs"):
        for d in doc.get(section, []):
            need(bool(d.get("namespace")) and bool(d.get("name")),
                 f"{section} dataset namespace/name missing")
            for fname, facet in (d.get("facets") or {}).items():
                need("_producer" in facet and "_schemaURL" in facet,
                     f"{section} facet {fname} missing envelope")
    for scope in (run, job):
        for fname, facet in (scope.get("facets") or {}).items():
            need("_producer" in facet and "_schemaURL" in facet,
                 f"facet {fname} missing _producer/_schemaURL envelope")
    return problems
