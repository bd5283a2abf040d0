"""Buffered application-metric emission.

Re-expresses the reference's CloudWatch metric-buffering property
cluster (consumer: metrics level NONE/SUMMARY/DETAILED, buffer flush
time 10s, bounded queue 10000, AbstractKinesisConsumerProcessor
.java:193-224; producer: metrics namespace/granularity,
AbstractKinesisProducerProcessor.java:120-148) for a Spark pipeline.

Two metric channels exist on purpose:

* **Lineage rows** (the correctness record) commit atomically WITH the
  data manifest (C1 exactly-once) — they are bookkeeping, never
  buffered, never dropped. See ``pipeline.apply_batch``.
* **This channel** is fire-and-forget telemetry: per-batch counters
  buffered driver-side in a bounded queue and flushed to a JSON-lines
  sink at most once per ``buffer_secs`` (or when the queue fills).
  Overflow drops the OLDEST record and counts the drops — emission
  must never block or fail the commit path, exactly the contract the
  reference's background CloudWatch publisher provides.

Levels: ``none`` emits nothing; ``summary`` one record per micro-batch
(stream totals); ``detailed`` additionally one record per shard slice
(reusing the merge's own latched Observation values — zero extra jobs).
"""

from __future__ import annotations

import json
import logging
import os
import time
from collections import deque

log = logging.getLogger(__name__)

#: ≙ ReportCloudWatchMetricsLevel allowable values (ACP:196-205)
METRICS_LEVELS = ("none", "summary", "detailed")


class MetricsEmitter:
    """Driver-side bounded metric buffer with timed flush.

    Single-threaded by design: ``record_batch`` is only called from the
    foreachBatch body (micro-batches are serialized per query), so no
    locking is needed; a flush is at most one file append.
    """

    def __init__(
        self,
        level: str = "summary",
        buffer_secs: float = 10.0,
        queue_size: int = 10_000,
        path: str = "",
        namespace: str = "cdc",
        clock=time.monotonic,
    ):
        if level not in METRICS_LEVELS:
            raise ValueError(f"metrics level must be one of {METRICS_LEVELS}")
        self.level = level
        self.buffer_secs = buffer_secs
        self.queue_size = queue_size
        self.path = path
        self.namespace = namespace
        self._clock = clock
        self._queue: deque = deque()
        self._dropped = 0
        self._last_flush = clock()
        self.flushes = 0  # observability for tests / ops

    # ------------------------------------------------------------ record

    def record_batch(
        self,
        batch_id: int,
        stats: dict,
        shard_rows: list[dict] | None = None,
    ) -> None:
        """Buffer the metrics of one committed micro-batch.

        ``stats`` is the merge's committed stats dict; ``shard_rows``
        the per-shard lineage rows already computed from the merge's
        latched Observation (``detailed`` reuses them — no extra job).
        """
        if self.level == "none":
            return
        self._put(
            {
                "ns": self.namespace,
                "kind": "batch",
                "batch_id": int(batch_id),
                "n_upserts": stats.get("n_upserts"),
                "n_dead_letter": stats.get("n_dead_letter"),
                "skipped": bool(stats.get("skipped", False)),
                "seconds": stats.get("seconds"),
            }
        )
        if self.level == "detailed":
            for r in shard_rows or []:
                self._put(
                    {
                        "ns": self.namespace,
                        "kind": "shard",
                        "batch_id": int(batch_id),
                        "shard": r.get("shard"),
                        "n_events": r.get("n_events"),
                        "n_dead_letter": r.get("n_dead_letter"),
                        "max_lag_ms": r.get("max_lag_ms"),
                    }
                )
        if self._clock() - self._last_flush >= self.buffer_secs:
            self.flush()

    def _put(self, rec: dict) -> None:
        if len(self._queue) >= self.queue_size:
            # ≙ the reference's bounded publisher queue: newest data is
            # the most valuable for telemetry, drop the oldest
            self._queue.popleft()
            self._dropped += 1
        self._queue.append(rec)

    # ------------------------------------------------------------- flush

    def flush(self) -> int:
        """Drain the buffer to the sink; returns records written.

        Never raises: telemetry failure must not abort the stream
        (≙ the reference logs-and-continues on CloudWatch errors)."""
        if not self._queue and not self._dropped:
            return 0
        recs = list(self._queue)
        self._queue.clear()
        if self._dropped:
            recs.append(
                {"ns": self.namespace, "kind": "dropped", "count": self._dropped}
            )
            self._dropped = 0
        try:
            if self.path:
                os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
                with open(self.path, "a") as f:
                    for r in recs:
                        f.write(json.dumps(r) + "\n")
            else:
                for r in recs:
                    log.info("metric %s", r)
        except Exception:  # pragma: no cover - sink failure is non-fatal
            log.warning("metric flush failed (%d records)", len(recs))
        self._last_flush = self._clock()
        self.flushes += 1
        return len(recs)
