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
  sink when ``buffer_secs`` elapses — on the record path AND from a
  background daemon timer, so an idle or continuous stream still
  drains (≙ the reference's background CloudWatch publisher). A full
  queue flushes too; records are dropped (oldest first, counted) only
  if the sink itself is failing. Emission must never block or fail
  the commit path.

Levels: ``none`` emits nothing; ``summary`` one record per micro-batch
(stream totals); ``detailed`` additionally one record per shard slice
(reusing the merge's own latched Observation values — zero extra jobs).
"""

from __future__ import annotations

import json
import logging
import os
import threading
import time
from collections import deque

log = logging.getLogger(__name__)

#: ≙ ReportCloudWatchMetricsLevel allowable values (ACP:196-205)
METRICS_LEVELS = ("none", "summary", "detailed")


class MetricsEmitter:
    """Driver-side bounded metric buffer with timed flush.

    ``record_batch`` is called from the foreachBatch body
    (micro-batches are serialized per query); the background flusher
    is a separate daemon thread, so queue and sink access are guarded
    by one lock."""

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
        self._lock = threading.Lock()
        self._queue: deque = deque()
        self._dropped = 0
        self._last_flush = clock()
        self._timer: threading.Timer | None = None
        self._closed = False
        self._flushing = False  # single-flight guard (one sink writer)
        self._sink_failing = False  # last flush failed → pace retries
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
        recs = [
            {
                "ns": self.namespace,
                "kind": "batch",
                "batch_id": int(batch_id),
                "n_upserts": stats.get("n_upserts"),
                "n_dead_letter": stats.get("n_dead_letter"),
                "skipped": bool(stats.get("skipped", False)),
                "seconds": stats.get("seconds"),
            }
        ]
        if self.level == "detailed":
            for r in shard_rows or []:
                recs.append(
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
        with self._lock:
            # a live stream re-arms a closed emitter; the reset lives
            # under the SAME lock close() takes, so a shutdown racing a
            # committing micro-batch can't leave a half-armed emitter
            self._closed = False
            self._queue.extend(recs)
            if self._sink_failing:
                # sink down and flushes paced: enforce the bound here —
                # drop the OLDEST (newest telemetry is most valuable),
                # counted, exactly the reference's bounded-queue shed
                while len(self._queue) > self.queue_size:
                    self._queue.popleft()
                    self._dropped += 1
            # queue pressure flushes too (a healthy sink should absorb
            # the buffer rather than lose records); the transient
            # overshoot of at most one batch's records is shed —
            # oldest-first, counted — only if the flush itself fails.
            # A FAILING sink ignores the pressure clause: once the
            # queue is pinned at cap, every batch would otherwise
            # retry the broken sink on the record path — pacing by
            # buffer_secs is exactly what the failure mode needs.
            due = self._clock() - self._last_flush >= self.buffer_secs or (
                len(self._queue) >= self.queue_size and not self._sink_failing
            )
        if due:
            self.flush()
        self._ensure_timer()

    # -------------------------------------------------- background timer

    def _ensure_timer(self) -> None:
        """Arm a daemon timer so buffered records drain even when no
        further batches arrive (idle stream, continuous trigger) — the
        analogue of the reference's background publisher thread."""
        if self.buffer_secs <= 0:
            return
        with self._lock:
            if self._closed or (self._timer is not None and self._timer.is_alive()):
                return
            t = threading.Timer(self.buffer_secs, self._timer_tick)
            t.daemon = True
            self._timer = t
            t.start()

    def _timer_tick(self) -> None:
        try:
            self.flush()
        finally:
            with self._lock:
                self._timer = None
                empty = not self._queue
            if not empty:
                self._ensure_timer()

    # ------------------------------------------------------------- flush

    def flush(self) -> int:
        """Drain the buffer to the sink; returns records written.

        Never raises: telemetry failure must not abort the stream
        (≙ the reference logs-and-continues on CloudWatch errors).
        Sink I/O happens OUTSIDE the lock (snapshot-and-swap), so a
        slow or hanging sink never blocks record_batch — and therefore
        never blocks the foreachBatch commit path. Flushes are
        SINGLE-FLIGHT: a flush racing an in-progress one (timer thread
        vs record path) returns immediately — its records stay queued
        for the next flush — so two threads never interleave writes
        into the sink and sink order always equals record order."""
        with self._lock:
            if self._flushing or (not self._queue and not self._dropped):
                return 0
            self._flushing = True
            recs = list(self._queue)
            self._queue.clear()
            dropped, self._dropped = self._dropped, 0
        payload = list(recs)
        if dropped:
            payload.append(
                {"ns": self.namespace, "kind": "dropped", "count": dropped}
            )
        try:
            if self.path:
                os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
                with open(self.path, "a") as f:
                    for r in payload:
                        f.write(json.dumps(r) + "\n")
            else:
                for r in payload:
                    log.info("metric %s", r)
        except Exception:
            # sink failure is non-fatal: re-queue the snapshot at the
            # FRONT (records that arrived during the write keep their
            # order behind it) so a recovered sink gets everything; a
            # persistently failing one sheds oldest-first, counted.
            # _last_flush still advances (and _sink_failing disables
            # the queue-pressure trigger) so retries are paced by
            # buffer_secs instead of hammering a broken sink once per
            # micro-batch on the record path.
            log.warning("metric flush failed (%d records)", len(payload))
            with self._lock:
                self._queue.extendleft(reversed(recs))
                self._dropped += dropped
                while len(self._queue) > self.queue_size:
                    self._queue.popleft()
                    self._dropped += 1
                self._last_flush = self._clock()
                self._sink_failing = True
                self._flushing = False
            return 0
        with self._lock:
            self._last_flush = self._clock()
            self._sink_failing = False
            self._flushing = False
            self.flushes += 1
        return len(payload)

    def close(self) -> None:
        """Final drain + stop the background timer (≙ flushSync on
        shutdown, PUT:369-376).

        A flush may be in flight on the timer thread when close() is
        called; our own flush() would then hit the single-flight guard
        and return 0 while records queued during (or re-queued by the
        failure path of) that racing flush are still pending. So: wait
        for the in-flight flush to clear, then drain until the queue is
        empty — bounded by ``buffer_secs`` (min 1s) so a persistently
        failing sink degrades to best-effort instead of hanging
        shutdown."""
        with self._lock:
            self._closed = True
            if self._timer is not None:
                self._timer.cancel()
                self._timer = None
        deadline = self._clock() + max(1.0, self.buffer_secs)
        while self._clock() < deadline:
            with self._lock:
                busy = self._flushing
                pending = bool(self._queue or self._dropped)
            if busy:
                time.sleep(0.01)
                continue
            if not pending:
                return
            if self.flush() > 0:
                continue  # drained something; loop to confirm empty
            # flush() returned 0: either we raced another flush that
            # snuck in (keep waiting — _sink_failing may be a STALE
            # flag from before that flush succeeded), or our own
            # attempt genuinely hit the failing sink (give up — the
            # records would just re-queue forever)
            with self._lock:
                busy = self._flushing
                failing = self._sink_failing
            if busy:
                time.sleep(0.01)
                continue
            if failing:
                return
