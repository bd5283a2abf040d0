"""Validated engine configuration.

Re-expresses the reference's PropertyDescriptor surface (consumer: 18
properties asserted at GetKinesisStreamTest.java:169-191; producer: 20
at PutKinesisStreamTest.java:129-156) as a typed dataclass with the
same style of per-field range validation (KinesisPropertyDescriptors.
java:43-51) and cross-field validation (AbstractKinesisConsumer
Processor.java:289-316).
"""

from __future__ import annotations

from dataclasses import dataclass, field, fields


class ConfigError(ValueError):
    """Raised when the engine configuration is invalid (≙ NiFi's
    customValidate failures, ACP:289-316)."""


#: Initial replay position for a fresh consumer — ≙ the reference's
#: LATEST / TRIM_HORIZON allowable values (ACP:85-92, 509-517).
INITIAL_POSITIONS = ("latest", "earliest")

#: Merge write strategies. ``copy-on-write`` rewrites touched buckets
#: per batch (read-optimized — steady state for read-heavy
#: transcripts); ``merge-on-read`` appends LWW-deduped delta files —
#: O(batch) writes with zero reads of existing data, winners resolved
#: at read time, folded back into base files by compact().
MERGE_STRATEGIES = ("copy-on-write", "merge-on-read")


@dataclass
class EngineConfig:
    """All knobs of the CDC pipeline, validated at build time.

    Defaults mirror the reference's operating envelope (BASELINE.md):
    e.g. ``max_files_per_trigger`` is the admission-control analogue of
    BATCH_SIZE (KPD:43-51, default 250 records/trigger — ours is
    file-granular because the source is a segment-file tail).
    """

    # --- source (≙ consumer properties, ACP:62-224) ---
    binlog_dir: str = ""
    binlog_format: str = "parquet"  # parquet | json (Debezium-style lines)
    initial_position: str = "earliest"  # ≙ TRIM_HORIZON/LATEST ACP:85-92
    max_files_per_trigger: int = 8  # ≙ BATCH_SIZE KPD:43-51
    # byte-granular admission control (≙ max records/request
    # ACP:109-116 scaled to bytes); 0 = file-count control only
    max_bytes_per_trigger: int = 0
    n_shards: int = 8  # ≙ stream shard count
    trigger_interval_ms: int = 1000  # ≙ idle-time-between-reads ACP:121-128
    skip_empty_batches: bool = True  # ≙ ACP:133-140

    # --- target table (≙ producer properties, APP:30-189) ---
    table_path: str = ""
    n_buckets: int = 32  # key-hash buckets ≙ shards on the put side
    target_file_bytes: int = 128 * 1024 * 1024  # ≙ KPL aggregation APP:40-68
    merge_strategy: str = "copy-on-write"
    # deduped batches at or below this row count merge via the
    # broadcast copy-on-write path (big side never shuffled); larger
    # batches fall back to union+aggregate (one shuffle, AQE-skew-safe)
    merge_broadcast_threshold: int = 2_000_000
    # low-cardinality string payload columns to dictionary-encode as
    # int codes across the bulk merge's bucket exchange (decoded after
    # the LWW agg, before the write) — narrower shuffle rows on the
    # agg+write stage, the named scaling hotspot (BENCH/BASELINE.md).
    # Columns above 256 distinct values per batch fall back to plain.
    shuffle_dict_cols: tuple = ()
    commit_retries: int = 4  # ≙ KCL/KPL retry policy ACP:181-188
    commit_retry_backoff_ms: int = 500  # ≙ task backoff ACP:181-188

    # max applied change-events per second across the stream; 0 =
    # unlimited. ≙ the producer's RateLimit property (APP:150-159,
    # applied PUT:181): the micro-batch is paced AFTER its commit so
    # downstream consumers see at most this sustained apply rate.
    put_rate_limit_events_per_sec: int = 0

    # --- skew handling (≙ random-key load spreading PUT:264-269) ---
    salt_buckets: int = 8
    hot_key_threshold: int = 1_000_000  # events/key/batch before salting

    # --- routing / dead letter (≙ REL_FAILURE PUT:307-326) ---
    dead_letter_path: str = ""
    fail_on_dead_letter: bool = False  # ≙ fail-if-throttled APP:90-98

    # --- exactly-once / checkpoint (≙ C1-C4, GET:281-296) ---
    checkpoint_dir: str = ""
    source_id: str = "binlog"

    # --- metrics (≙ CloudWatch metrics props ACP:193-224) ---
    metrics_enabled: bool = True
    metrics_granularity: str = "shard"  # shard | stream | global APP:131-138
    # buffered telemetry channel (decoupled from the atomically
    # committed lineage rows — see streaming/metrics.py):
    metrics_level: str = "summary"  # none | summary | detailed ACP:196-205
    metrics_buffer_secs: float = 10.0  # ≙ metric buffering time ACP:207-214
    metrics_queue_size: int = 10_000  # ≙ bounded publisher queue ACP:216-224
    metrics_path: str = ""  # JSONL sink; empty = log only
    metrics_namespace: str = "cdc"  # ≙ producer metric namespace APP:120-129

    # --- maintenance (round-5 endurance: bounded metadata growth) ---
    # every Nth committed batch runs table.compact() +
    # expire_snapshots(maintenance_keep_last) on the MAIN table (the
    # DLQ has its own fixed cadence); 0 disables. Advisory like the
    # DLQ pass: a lost race never fails the already-committed batch.
    maintenance_every_n_batches: int = 64
    maintenance_keep_last: int = 16

    # --- misc ---
    shuffle_partitions: int = 32
    extra_spark_conf: dict = field(default_factory=dict)

    def validate(self) -> "EngineConfig":
        """Range + cross-field validation; returns self for chaining."""
        if not self.binlog_dir:
            raise ConfigError("binlog_dir is required")
        if not self.table_path:
            raise ConfigError("table_path is required")
        if self.binlog_format not in ("parquet", "json"):
            raise ConfigError("binlog_format must be parquet or json")
        if self.initial_position not in INITIAL_POSITIONS:
            raise ConfigError(
                f"initial_position must be one of {INITIAL_POSITIONS}, "
                f"got {self.initial_position!r}"
            )
        if self.merge_strategy not in MERGE_STRATEGIES:
            raise ConfigError(
                f"merge_strategy must be one of {MERGE_STRATEGIES}"
            )
        if self.metrics_granularity not in ("shard", "stream", "global"):
            raise ConfigError("metrics_granularity: shard|stream|global")
        if self.metrics_level not in ("none", "summary", "detailed"):
            raise ConfigError("metrics_level: none|summary|detailed")
        if not (0 <= self.metrics_buffer_secs <= 3600):
            raise ConfigError("metrics_buffer_secs must be in [0, 3600]")
        if not (1 <= self.metrics_queue_size <= 10_000_000):
            raise ConfigError("metrics_queue_size must be in [1, 10000000]")
        # range validation ≙ KPD:49 createLongValidator(1, 500, false)
        for name, lo, hi in [
            ("max_files_per_trigger", 1, 100_000),
            ("max_bytes_per_trigger", 0, 1 << 50),
            ("n_shards", 1, 10_000),
            ("n_buckets", 1, 1_000_000),
            ("salt_buckets", 1, 65_536),
            ("commit_retries", 0, 100),
            ("put_rate_limit_events_per_sec", 0, 1_000_000_000),
            ("shuffle_partitions", 1, 1_000_000),
            ("trigger_interval_ms", 0, 86_400_000),
            ("maintenance_every_n_batches", 0, 1_000_000),
            ("maintenance_keep_last", 1, 100_000),
        ]:
            v = getattr(self, name)
            if not (lo <= v <= hi):
                raise ConfigError(f"{name} must be in [{lo}, {hi}], got {v}")
        # cross-field: dead-letter routing needs a quarantine path,
        # unless the pipeline is configured to fail the batch instead
        # (≙ access-key/secret-key must be set together, ACP:292-298)
        if not isinstance(self.shuffle_dict_cols, (tuple, list)) or any(
            not isinstance(c, str) for c in self.shuffle_dict_cols
        ):
            raise ConfigError("shuffle_dict_cols must be a tuple of column names")
        if not self.fail_on_dead_letter and not self.dead_letter_path:
            raise ConfigError(
                "dead_letter_path required when fail_on_dead_letter=False"
            )
        if not self.checkpoint_dir:
            raise ConfigError("checkpoint_dir is required")
        return self

    @classmethod
    def property_names(cls) -> list[str]:
        """The full validated property surface (tested for exact count
        the way the reference tests its descriptors, GT:169-191)."""
        return [f.name for f in fields(cls)]
