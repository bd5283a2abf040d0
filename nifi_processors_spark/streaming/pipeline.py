"""The CDC pipeline: binlog tail → validate/route → LWW MERGE → commit.

Structured Streaming drives micro-batches (the push/pull inversion of
the reference — its KCL worker thread pushing into NiFi sessions,
SURVEY.md §2.11, is exactly Spark's driver-scheduled model); each
micro-batch runs through ``apply_batch``:

1. validate + split (success/failure relationships, PUT:307-326)
2. dead-letter append for invalid rows (failure ≙ REL_FAILURE),
   watermarked so a redelivered micro-batch doesn't duplicate DLQ rows
3. per-shard lineage/metrics rows (provenance GET:266-268 + consumer
   lag GET:314-315)
4. LWW MERGE into the transcripts table with the offsets watermark and
   lineage committed in the SAME atomic manifest — exactly-once
   (upgrading the reference's checkpoint-before-commit at-least-once,
   GET:281-296)

Crash anywhere before the manifest commit → nothing is visible and
Structured Streaming redelivers the batch; crash after → redelivery is
skipped by the watermark. A nuked checkpoint (full replay) reconverges
because the merge itself is LWW-idempotent.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nifi_processors_spark.config import EngineConfig
from nifi_processors_spark.functions.attributes import validate_events
from nifi_processors_spark.schema import (
    CHANGE_EVENTS_SCHEMA,
    DEAD_LETTER_SCHEMA,
    KEY_COLS,
    LWW_COLS,
    TRANSCRIPTS_SCHEMA,
)
from nifi_processors_spark.sources.binlog import read_binlog_stream
from nifi_processors_spark.table import TransactionalTable

_log = logging.getLogger(__name__)


def _obs_values(obs, names: list[str]) -> dict | None:
    """Latched Observation metrics by POSITION. ``Observation.get``
    round-trips the JVM row through ``PythonSQLUtils.toPyRow``, which
    asserts the row carries a schema — in foreachBatch the metrics row
    sometimes arrives as a schema-less GenericRow and that assertion
    fires. All our metrics are longs/nulls, which py4j converts
    natively, so positional access on the JVM row is both safe and
    schema-independent. Blocks until the first action latches.

    Returns None when the latched row is EMPTY — observed empirically
    when the first action's result is empty (e.g. every row of the
    batch was filtered out above the CollectMetrics node); callers
    must fall back to a direct aggregation for that case."""
    jrow = obs._jo.getRow()
    if jrow.size() == 0:
        return None
    return {name: jrow.get(i) for i, name in enumerate(names)}


class CdcPipeline:
    def __init__(self, spark: SparkSession, config: EngineConfig, transform=None):
        """``transform``: optional vectorized content-rewrite stage
        (DataFrame → DataFrame, e.g. functions.rewrite.make_transform)
        applied to the validated batch before the LWW merge — the
        reference's route/transform/put content rewriting, vectorized."""
        self.spark = spark
        self.transform = transform
        self.config = config.validate()
        self.table = self._ensure_table(
            config.table_path, TRANSCRIPTS_SCHEMA, KEY_COLS,
            n_buckets=config.n_buckets,
            merge_strategy=config.merge_strategy,
        )
        self.dead_letter = (
            self._ensure_table(
                config.dead_letter_path, DEAD_LETTER_SCHEMA, KEY_COLS, n_buckets=1
            )
            if config.dead_letter_path
            else None
        )
        self.last_batch_stats: dict = {}
        # buffered telemetry channel (≙ CloudWatch metric buffering,
        # ACP:193-224) — decoupled from the atomic lineage commit
        self.metrics = None
        if config.metrics_enabled and config.metrics_level != "none":
            from nifi_processors_spark.streaming.metrics import MetricsEmitter

            self.metrics = MetricsEmitter(
                level=config.metrics_level,
                buffer_secs=config.metrics_buffer_secs,
                queue_size=config.metrics_queue_size,
                path=config.metrics_path,
                namespace=config.metrics_namespace,
            )

    def _ensure_table(self, path, schema, key_cols, n_buckets,
                      merge_strategy="copy-on-write"):
        if TransactionalTable.exists(self.spark, path):
            return TransactionalTable(self.spark, path)
        return TransactionalTable.create(
            self.spark, path, schema, key_cols, LWW_COLS, n_buckets=n_buckets,
            merge_strategy=merge_strategy,
        )

    # ------------------------------------------------------ micro-batch

    def _file_backed_batch(self, batch_id: int) -> DataFrame | None:
        """Rebuild the micro-batch as a genuine file scan.

        Spark 4's foreachBatch hands the batch as a row-based
        ``Scan ExistingRDD`` wrapper: ``inputFiles()`` is empty, parquet
        footers are unreachable, column pruning is lost, and every
        action re-decodes all ten columns. Measured on the 13.4M-event
        scaling replay that wrapper costs TWO redundant full decodes
        per micro-batch — a CollectLimit job for the empty-batch check
        and the merge's pre-count aggregate (the footer-rows hint can
        never engage) — ~10 s of a 46 s four-core batch.

        The file source's own commit log (checkpoint/sources/0/<id>)
        records exactly which files belong to this batch (`v1` header +
        one JSON per line; compacted logs carry older batches' entries
        tagged with their batchId). Re-reading those files with the
        stream's declared schema is the SAME data with a columnar,
        prunable, footer-countable plan. Returns None on any surprise
        (second source, missing log, unknown format) — callers fall
        back to the engine-provided frame."""
        import json as _json
        import os as _os

        cfg = self.config
        src_root = _os.path.join(cfg.checkpoint_dir, "sources")
        try:
            if not _os.path.isdir(src_root) or sorted(
                d for d in _os.listdir(src_root) if not d.startswith(".")
            ) != ["0"]:
                return None
            log = _os.path.join(src_root, "0", str(batch_id))
            if not _os.path.exists(log):
                log = _os.path.join(src_root, "0", f"{batch_id}.compact")
                if not _os.path.exists(log):
                    return None
            paths = []
            with open(log) as f:
                if f.readline().strip() != "v1":
                    return None
                for line in f:
                    if not line.startswith("{"):
                        continue
                    e = _json.loads(line)
                    if int(e.get("batchId", batch_id)) == batch_id:
                        paths.append(e["path"])
            if not paths:
                return None
            reader = self.spark.read.schema(CHANGE_EVENTS_SCHEMA)
            df = (
                reader.json(paths)
                if cfg.binlog_format == "json"
                else reader.parquet(*paths)
            )
            if cfg.initial_position == "latest":
                snap_path = _os.path.join(
                    cfg.checkpoint_dir, "initial_position_snapshot.json"
                )
                with open(snap_path) as f:  # must exist for a live stream
                    snap = {int(k): int(v) for k, v in _json.load(f).items()}
                if snap:
                    from nifi_processors_spark.sources.binlog import (
                        high_water_filter,
                    )

                    df = df.filter(high_water_filter(snap))
            return df
        except Exception:
            return None

    def apply_batch(
        self, batch_df: DataFrame, batch_id: int, from_stream: bool = False
    ) -> dict:
        """The foreachBatch body. Idempotent per (source_id, batch_id)."""
        import time as _time

        batch_t0 = _time.monotonic()
        cfg = self.config
        if from_stream:
            recovered = self._file_backed_batch(batch_id)
            if recovered is not None:
                batch_df = recovered
        if cfg.skip_empty_batches and not batch_df.inputFiles() and batch_df.isEmpty():
            # ≙ withCallProcessRecordsEvenForEmptyRecordList(false)
            # inverted default (ACP:133-140, GET:164). File-backed
            # batches skip the check — availableNow never emits them.
            self.last_batch_stats = {"skipped": True, "reason": "empty"}
            return self.last_batch_stats

        import uuid as _uuid

        from pyspark.sql.observation import Observation

        from nifi_processors_spark.functions.attributes import with_error_reason

        tagged = with_error_reason(batch_df)

        # ZERO-extra-job metrics: routing counts and per-shard
        # lineage/metrics (the reference accumulated these in its
        # per-record loop, GET:245-267,307-322) ride the merge's OWN
        # first job as aggregate Observations on the validated batch —
        # no dedicated metrics scan at all. Per-shard granularity is
        # expressed as conditional aggregates (one set per shard id),
        # all evaluated in the same pass.
        obs = None
        tags: list[int | None] = []
        want_metrics = (
            cfg.metrics_enabled or cfg.fail_on_dead_letter
            or self.dead_letter is not None
        )
        if want_metrics:
            obs = Observation(f"cdc-b{batch_id}-{_uuid.uuid4().hex[:6]}")
            tags = (
                list(range(cfg.n_shards))
                if cfg.metrics_granularity == "shard"
                else [None]
            )
            is_err = F.col("error_reason").isNotNull()
            expr_names = ["inv_total"]
            exprs = [F.sum(is_err.cast("long")).alias("inv_total")]
            for s in tags:
                in_s = F.lit(True) if s is None else (F.col("shard") == s)
                ok, ko = in_s & ~is_err, in_s & is_err
                t = "all" if s is None else str(s)
                exprs += [
                    F.sum(ko.cast("long")).alias(f"inv_{t}"),
                    F.sum(ok.cast("long")).alias(f"n_{t}"),
                    F.min(F.when(ok, F.col("seq"))).alias(f"fs_{t}"),
                    F.max(F.when(ok, F.col("seq"))).alias(f"ls_{t}"),
                    F.max(
                        F.when(
                            ok,
                            F.unix_millis(F.current_timestamp())
                            - F.unix_millis(F.col("arrival_ts")),
                        )
                    ).alias(f"lag_{t}"),
                ]
                expr_names += [f"inv_{t}", f"n_{t}", f"fs_{t}", f"ls_{t}", f"lag_{t}"]
            tagged = tagged.observe(obs, *exprs)

        valid = tagged.filter(F.col("error_reason").isNull()).drop("error_reason")
        if self.transform is not None:
            valid = self.transform(valid)

        holder: dict = {}

        def _lineage_after_write():
            """Runs inside merge AFTER the data write, BEFORE the
            manifest commit: the observation is latched by then (the
            merge's first job scanned the observed batch), so this is
            pure driver-side bookkeeping. Raising here aborts the
            commit (batch failure ≙ route-all-to-failure + yield,
            PUT:329-333) with nothing made visible."""
            vals = _obs_values(obs, expr_names)
            if vals is None:
                # the observation latched an empty row (all rows of
                # this batch filtered out before the first action's
                # output — e.g. an all-invalid micro-batch): compute
                # the same aggregates with one direct job
                row = tagged.agg(*exprs).collect()[0]
                vals = {n: row[n] for n in expr_names}
            n_inv = int(vals["inv_total"] or 0)
            holder["n_dlq"] = n_inv
            if n_inv and cfg.fail_on_dead_letter:
                raise ValueError(f"{n_inv} invalid events in batch {batch_id}")
            if not cfg.metrics_enabled:
                return None
            rows = []
            for s in tags:
                t = "all" if s is None else str(s)
                n = int(vals[f"n_{t}"] or 0)
                inv = int(vals[f"inv_{t}"] or 0)
                if n == 0 and inv == 0:
                    continue
                rows.append(
                    {
                        "source_id": cfg.source_id,
                        "batch_id": int(batch_id),
                        "shard": s,
                        "first_seq": vals[f"fs_{t}"],
                        "last_seq": vals[f"ls_{t}"],
                        "n_events": n,
                        "n_dead_letter": inv,
                        "max_lag_ms": vals[f"lag_{t}"],
                    }
                )
            holder["lineage_rows"] = rows
            return rows

        # footer-based row count of the RAW (pre-validation) batch — an
        # upper bound the merge may use to pick the bulk path without a
        # pre-count job (the validated view is filtered, so its own
        # plan is not a bare scan)
        hint = self.table.footer_row_estimate(batch_df)

        stats = self.table.merge(
            valid,
            source_id=cfg.source_id,
            batch_id=batch_id,
            lineage_fn=_lineage_after_write if obs is not None else None,
            broadcast_threshold=cfg.merge_broadcast_threshold,
            retries=cfg.commit_retries,
            backoff_ms=cfg.commit_retry_backoff_ms,
            upper_rows_hint=hint,
            dict_encode_cols=cfg.shuffle_dict_cols,
        )

        # a watermark-skipped merge ran no job over this batch, so the
        # observation never latched — compute the DLQ count directly
        # (redelivery-only path; correctness over job count here)
        n_dlq = holder.get("n_dlq", 0)
        if stats.get("skipped") and self.dead_letter is not None:
            n_dlq = tagged.filter(F.col("error_reason").isNotNull()).count()

        # dead-letter routing (failure relationship). Runs even when the
        # merge was watermark-skipped: a crash between the merge commit
        # and this append would otherwise lose the batch's DLQ rows
        # forever (redelivery hits the merge watermark). The DLQ table's
        # own (source::dlq, batch_id) watermark makes re-appends no-ops.
        if n_dlq and self.dead_letter is not None:
            invalid = tagged.filter(F.col("error_reason").isNotNull()).withColumn(
                "batch_id", F.lit(batch_id)
            )
            dlq_res = self.dead_letter.append(
                invalid,
                source_id=f"{cfg.source_id}::dlq",
                batch_id=batch_id,
                retries=cfg.commit_retries,
                backoff_ms=cfg.commit_retry_backoff_ms,
            )
            # DLQ retention (round-3 VERDICT #8): periodically fold the
            # DLQ's sliver files and expire old snapshots, so a
            # poison-heavy stream keeps a BOUNDED file/manifest count
            # instead of one file per bad batch. Round 6: the cadence
            # and retention now follow the SAME config knobs as the
            # main table's pass below (round-5 endurance ended with 68
            # DLQ manifests vs 11 main because the DLQ's hard-coded
            # every-64th/keep-8 left a much higher steady state —
            # steady-state manifests ∈ [keep_last, keep_last+cadence],
            # so sharing knobs bounds the DLQ within ~2× of the main
            # table). A disabled main cadence (0) keeps the legacy
            # every-64th floor: DLQ growth must stay bounded
            # regardless. expire's grace window keeps this safe next
            # to the main table's concurrent commits; failure here
            # must never fail the (already committed) batch.
            ver = dlq_res.get("version")
            dlq_every = cfg.maintenance_every_n_batches or 64
            if ver and ver % dlq_every == 0:
                try:
                    self.dead_letter.compact()
                    self.dead_letter.expire_snapshots(
                        keep_last=cfg.maintenance_keep_last
                    )
                except Exception:
                    # advisory on the hot path — but a persistently
                    # failing maintenance pass means unbounded DLQ
                    # growth, so it must be visible
                    _log.warning(
                        "DLQ maintenance failed at version %s", ver,
                        exc_info=True,
                    )
        # main-table maintenance cadence (round-5 endurance): every Nth
        # committed version compacts sliver files and expires old
        # snapshots so a 1,000-micro-batch stream keeps BOUNDED
        # manifest/data-file counts (the DLQ has its own cadence
        # above). Advisory like the DLQ pass — the batch is already
        # committed; a lost race with another writer must not fail it.
        mver = stats.get("version")
        if (
            cfg.maintenance_every_n_batches > 0
            and mver
            and mver % cfg.maintenance_every_n_batches == 0
        ):
            try:
                self.table.compact()
                self.table.expire_snapshots(
                    keep_last=cfg.maintenance_keep_last
                )
            except Exception:
                _log.warning(
                    "table maintenance failed at version %s", mver,
                    exc_info=True,
                )
        # put-side rate limit (≙ RateLimit APP:150-159, applied
        # PUT:181): pace the trigger so the sustained apply rate stays
        # at or below the configured events/sec — a driver-side sleep,
        # no per-record cost. Skipped batches applied nothing.
        if cfg.put_rate_limit_events_per_sec > 0 and not stats.get("skipped"):
            applied = int(stats.get("n_upserts") or 0)
            # a hint-derived n_upserts counts the RAW batch (including
            # invalid rows routed to the DLQ) — pace on the rows that
            # were actually applied, not the upper bound
            if stats.get("n_upserts_estimated"):
                applied = max(0, applied - int(n_dlq or 0))
            min_elapsed = applied / cfg.put_rate_limit_events_per_sec
            remaining = min_elapsed - (_time.monotonic() - batch_t0)
            if remaining > 0:
                _time.sleep(remaining)

        stats = {
            **stats,
            "n_dead_letter": n_dlq,
            # wall per batch — the emitter's per-batch `seconds` field
            # was always None before round 5 (nothing ever set it);
            # endurance flatness evidence reads it from the sink
            "seconds": round(_time.monotonic() - batch_t0, 3),
        }
        if self.metrics is not None:
            # post-commit, fire-and-forget: reuses the merge's latched
            # Observation values (zero extra jobs); buffered + flushed
            # on the emitter's own clock, never on the commit path
            self.metrics.record_batch(
                batch_id, stats, holder.get("lineage_rows")
            )
        self.last_batch_stats = stats
        return stats

    # -------------------------------------------------------- lifecycle

    def start(self, available_now: bool = True):
        """Start the streaming query. ``available_now=True`` drains the
        current binlog and stops (bounded replay); ``False`` runs
        continuously on the trigger interval."""
        cfg = self.config
        stream = read_binlog_stream(self.spark, cfg, CHANGE_EVENTS_SCHEMA)
        writer = (
            stream.writeStream.foreachBatch(
                lambda df, bid: self.apply_batch(df, bid, from_stream=True)
            )
            .option("checkpointLocation", cfg.checkpoint_dir)
            .queryName(f"cdc-{cfg.source_id}")
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        else:
            writer = writer.trigger(processingTime=f"{cfg.trigger_interval_ms} milliseconds")
        return writer.start()

    def run_once(self, timeout_s: int = 600) -> None:
        """Drain everything currently in the binlog, then stop
        (graceful stop: the in-flight batch commits — ≙ flushSync on
        shutdown, PUT:369-376)."""
        q = self.start(available_now=True)
        try:
            q.awaitTermination(timeout_s)
        finally:
            if q.isActive:
                q.stop()
            if self.metrics is not None:
                # ≙ flushSync on shutdown (PUT:369-376) for telemetry:
                # drain the buffer and park the background timer
                self.metrics.close()
