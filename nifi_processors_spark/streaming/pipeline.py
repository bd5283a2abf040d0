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
        )
        self.dead_letter = (
            self._ensure_table(
                config.dead_letter_path, DEAD_LETTER_SCHEMA, KEY_COLS, n_buckets=1
            )
            if config.dead_letter_path
            else None
        )
        self.last_batch_stats: dict = {}

    def _ensure_table(self, path, schema, key_cols, n_buckets):
        if TransactionalTable.exists(self.spark, path):
            return TransactionalTable(self.spark, path)
        return TransactionalTable.create(
            self.spark, path, schema, key_cols, LWW_COLS, n_buckets=n_buckets
        )

    # ------------------------------------------------------ micro-batch

    def apply_batch(self, batch_df: DataFrame, batch_id: int) -> dict:
        """The foreachBatch body. Idempotent per (source_id, batch_id)."""
        cfg = self.config
        if cfg.skip_empty_batches and not batch_df.inputFiles() and batch_df.isEmpty():
            # ≙ withCallProcessRecordsEvenForEmptyRecordList(false)
            # inverted default (ACP:133-140, GET:164). File-backed
            # batches skip the check — availableNow never emits them.
            self.last_batch_stats = {"skipped": True, "reason": "empty"}
            return self.last_batch_stats

        from nifi_processors_spark.functions.attributes import with_error_reason
        from nifi_processors_spark.schema import LINEAGE_SCHEMA

        tagged = with_error_reason(batch_df)
        valid = tagged.filter(F.col("error_reason").isNull()).drop("error_reason")
        if self.transform is not None:
            valid = self.transform(valid)

        # ONE small aggregation job computes routing counts AND the
        # per-shard lineage/metrics (the reference accumulated these in
        # its per-record loop, GET:245-267,307-322) — no per-concern
        # scans. Result is a handful of rows collected to the driver.
        lineage_df = None
        n_dlq = 0
        if cfg.metrics_enabled or cfg.fail_on_dead_letter or self.dead_letter is not None:
            gran = (
                F.col("shard")
                if cfg.metrics_granularity == "shard"
                else F.lit(None).cast("int")
            )
            ok = F.col("error_reason").isNull()
            mrows = (
                tagged.groupBy(gran.alias("shard"))
                .agg(
                    F.sum((~ok).cast("long")).alias("n_invalid"),
                    F.sum(ok.cast("long")).alias("n_events"),
                    F.min(F.when(ok, F.col("seq"))).alias("first_seq"),
                    F.max(F.when(ok, F.col("seq"))).alias("last_seq"),
                    F.max(
                        F.when(
                            ok,
                            F.unix_millis(F.current_timestamp())
                            - F.unix_millis(F.col("arrival_ts")),
                        )
                    ).alias("max_lag_ms"),
                )
                .collect()
            )
            n_dlq = int(sum(r["n_invalid"] or 0 for r in mrows))
            if n_dlq and cfg.fail_on_dead_letter:
                # whole-batch failure → Structured Streaming retries the
                # micro-batch (≙ route-all-to-failure + yield, PUT:329-333)
                raise ValueError(f"{n_dlq} invalid events in batch {batch_id}")
            if cfg.metrics_enabled:
                lineage_df = self.spark.createDataFrame(
                    [
                        (
                            cfg.source_id, int(batch_id),
                            r["shard"], r["first_seq"], r["last_seq"],
                            r["n_events"], int(r["n_invalid"] or 0),
                            r["max_lag_ms"],
                        )
                        for r in mrows
                    ],
                    LINEAGE_SCHEMA,
                )

        stats = self.table.merge(
            valid,
            source_id=cfg.source_id,
            batch_id=batch_id,
            lineage_df=lineage_df,
            broadcast_threshold=cfg.merge_broadcast_threshold,
            retries=cfg.commit_retries,
            backoff_ms=cfg.commit_retry_backoff_ms,
        )

        # dead-letter routing (failure relationship). Runs even when the
        # merge was watermark-skipped: a crash between the merge commit
        # and this append would otherwise lose the batch's DLQ rows
        # forever (redelivery hits the merge watermark). The DLQ table's
        # own (source::dlq, batch_id) watermark makes re-appends no-ops.
        if n_dlq and self.dead_letter is not None:
            invalid = tagged.filter(F.col("error_reason").isNotNull()).withColumn(
                "batch_id", F.lit(batch_id)
            )
            self.dead_letter.append(
                invalid,
                source_id=f"{cfg.source_id}::dlq",
                batch_id=batch_id,
                retries=cfg.commit_retries,
                backoff_ms=cfg.commit_retry_backoff_ms,
            )
        stats = {**stats, "n_dead_letter": n_dlq}
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
                lambda df, bid: self.apply_batch(df, bid)
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
