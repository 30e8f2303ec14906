"""Metrics loop + auto-scaling policy.

Reference: StreamSwitch (controlplane/rescale/streamswitch/
StreamSwitch.java, FlinkStreamSwitchAdaptor.java — a DS2-style
metrics-driven scaler) fed by KafkaMetricsRetriever.java:36-55 reading
a `flink_metrics` topic.

Spark image: StreamingQueryListener progress events carry everything the
Kafka topic did — input rate, processing rate, batch duration, state
rows — so the retriever is a listener and the policy is a pure function
history → target parallelism (testable without a cluster).
"""

from __future__ import annotations

import json
from collections import deque
from dataclasses import dataclass

from pyspark.sql.streaming import StreamingQueryListener


@dataclass(frozen=True)
class Progress:
    batch_id: int
    num_input_rows: int
    input_rows_per_second: float
    process_rows_per_second: float
    batch_duration_ms: int


def parse_progress(progress_json: str) -> Progress:
    p = json.loads(progress_json)
    return Progress(
        batch_id=p.get("batchId", -1),
        num_input_rows=p.get("numInputRows", 0),
        input_rows_per_second=p.get("inputRowsPerSecond", 0.0) or 0.0,
        process_rows_per_second=p.get("processedRowsPerSecond", 0.0) or 0.0,
        batch_duration_ms=p.get("batchDuration", 0),
    )


class ProgressMonitor(StreamingQueryListener):
    """Ring-buffer progress collector (KafkaMetricsRetriever stand-in).
    Attach with ``spark.streams.addListener(monitor)``."""

    def __init__(self, window: int = 32):
        self.history: deque[Progress] = deque(maxlen=window)

    def onQueryStarted(self, event) -> None:  # noqa: N802
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        self.history.append(parse_progress(event.progress.json))

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass


class StreamSwitchPolicy:
    """DS2-style target-parallelism policy.

    useful-work ratio = observed processing rate / input rate; the true
    rate a task can sustain scales linearly with parallelism (DS2's core
    assumption), so target = ceil(parallelism × input/process) with a
    hysteresis band to avoid flapping — the same
    scale-out-when-backlogged / scale-in-when-overprovisioned decisions
    StreamSwitch makes from its Kafka metrics.
    """

    def __init__(
        self,
        target_batch_ms: int = 5_000,
        low: float = 0.5,
        high: float = 0.9,
        min_parallelism: int = 1,
        max_parallelism: int = 128,
    ):
        self.target_batch_ms = target_batch_ms
        self.low = low
        self.high = high
        self.min_parallelism = min_parallelism
        self.max_parallelism = max_parallelism

    def decide(self, history: list[Progress], parallelism: int) -> int | None:
        """Return a new target parallelism, or None to hold."""
        recent = [p for p in history if p.num_input_rows > 0][-4:]
        if not recent:
            return None
        # Utilization proxy: fraction of the trigger budget spent
        # processing. >high → backlogged, scale out; <low → scale in.
        util = sum(p.batch_duration_ms for p in recent) / (
            len(recent) * self.target_batch_ms
        )
        if util > self.high:
            target = min(self.max_parallelism, max(parallelism + 1, int(parallelism * util / self.high + 0.999)))
        elif util < self.low:
            target = max(self.min_parallelism, int(parallelism * util / self.low + 0.999))
        else:
            return None
        return None if target == parallelism else target
