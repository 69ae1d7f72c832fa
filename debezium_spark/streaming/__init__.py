"""Structured Streaming execution layer (P1-P3, P5-P8).

The reference's runtime — coordinator, queue/backpressure, dispatcher,
offsets — maps onto Structured Streaming primitives:

| reference | file:line | here |
|---|---|---|
| ChangeEventSourceCoordinator (snapshot→stream handoff) | debezium-connector-common/.../pipeline/ChangeEventSourceCoordinator.java:123-150,208-230 | ChangeDataPipeline.run |
| ChangeEventQueue (bounded batches, backpressure) | .../connector/base/ChangeEventQueue.java:65,207,312 | micro-batch boundary + maxFilesPerTrigger |
| EventDispatcher (per-record routing/filters) | .../pipeline/EventDispatcher.java:66,278-349 | the per-batch DataFrame program |
| BaseSourceTask offsets/commit | .../connector/common/BaseSourceTask.java:364,565-575 | checkpointLocation + idempotent MERGE |
| SignalProcessor (control channel) | .../pipeline/signal/SignalProcessor.java:45,117,147 | SignalChannel control table polled per batch |
| Notifications | .../pipeline/notification/Notification.java:21 | NotificationLog appended per phase |
| OpenLineage emission | debezium-openlineage-core/.../OpenLineageEmitter.java:54 | OpenLineageEmitter RunEvents per lifecycle |
"""

from debezium_spark.streaming.lineage import (  # noqa: F401
    DatasetMetadata,
    OpenLineageEmitter,
    validate_run_event,
)
from debezium_spark.streaming.pipeline import (  # noqa: F401
    ChangeDataPipeline,
    replay_feed,
)
from debezium_spark.streaming.signals import (  # noqa: F401
    FileSignalChannel,
    IncrementalSnapshotter,
    NotificationLog,
    SourceSignalChannel,
)
from debezium_spark.streaming.reliability import (  # noqa: F401
    GuardrailViolation,
    Heartbeat,
    RetriableError,
    run_with_retries,
    validate_guardrails,
)
