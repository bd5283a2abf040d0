"""Binlog/WAL-tail source.

The streaming analogue of the reference's KCL consumer (SURVEY.md
§2.1): a directory of per-shard segment files with per-shard monotone
``seq`` is tailed by Spark's file streaming source. Spark's offset log
(files-seen) is the lease/checkpoint bookkeeping the KCL kept in
DynamoDB (GET:62-64) — the driver owns all partitions, so no lease
protocol is needed (SURVEY.md §2.5 C4).

Admission control: ``maxFilesPerTrigger`` ≙ BATCH_SIZE
(KinesisPropertyDescriptors.java:43-51); the declared superset schema
makes pre-evolution segments (missing ``tool``) readable mid-stream
(missing columns → null), ≙ schema-free FlowFile payloads.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from nifi_processors_spark.config import EngineConfig
from nifi_processors_spark.schema import CHANGE_EVENTS_SCHEMA


def _latest_snapshot(
    spark: SparkSession, config: EngineConfig, schema: T.StructType
) -> dict[int, int]:
    """Per-shard high-water seq at FIRST stream start — the LATEST
    position (≙ ACP:85-92, applied GET:157-159: start at the shard's
    current tip, not the trim horizon). The snapshot is persisted next
    to the checkpoint so a resumed stream keeps the ORIGINAL position
    (initial position only applies when no checkpoint exists, exactly
    like the KCL lease table) instead of re-snapshotting and silently
    skipping events that arrived while the consumer was down."""
    snap_path = os.path.join(
        config.checkpoint_dir, "initial_position_snapshot.json"
    )
    if os.path.exists(snap_path):
        with open(snap_path) as f:
            return {int(k): int(v) for k, v in json.load(f).items()}
    # A fresh snapshot is only legal on a FRESH checkpoint. If Spark's
    # offset log already has committed entries (config flipped
    # earliest→latest on a live checkpoint, or a checkpoint restored
    # without the sidecar file), installing a new high-water filter
    # would silently skip every event that arrived while the consumer
    # was down — the exact gap the persisted snapshot exists to
    # prevent. Refuse loudly instead.
    offsets_dir = os.path.join(config.checkpoint_dir, "offsets")
    if os.path.isdir(offsets_dir) and any(
        not e.startswith(".") for e in os.listdir(offsets_dir)
    ):
        raise RuntimeError(
            "initial_position='latest' on an existing checkpoint "
            f"({config.checkpoint_dir}) with committed offsets but no "
            "initial_position_snapshot.json — refusing to take a new "
            "snapshot (it would skip events delivered while the "
            "stream was stopped). Restore the snapshot sidecar or use "
            "initial_position='earliest'."
        )
    try:
        base = read_binlog_batch(
            spark, config.binlog_dir, schema, config.binlog_format
        )
        rows = base.groupBy("shard").agg(F.max("seq").alias("mx")).collect()
        snap = {int(r["shard"]): int(r["mx"]) for r in rows}
    except Exception:
        snap = {}  # empty/nonexistent binlog: nothing to skip
    os.makedirs(config.checkpoint_dir, exist_ok=True)
    tmp = snap_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(snap, f)
    os.replace(tmp, snap_path)
    return snap


def read_binlog_stream(
    spark: SparkSession,
    config: EngineConfig,
    schema: T.StructType | None = None,
) -> DataFrame:
    """Structured Streaming tail of the binlog directory.

    ``initial_position='earliest'`` ≙ TRIM_HORIZON (ACP:85-92): replay
    from the start of the retained log. ``'latest'`` ≙ LATEST: only
    events appended after the stream first started are admitted — the
    pre-existing per-shard high-water seqs are snapshotted once
    (persisted with the checkpoint) and rows at-or-below them are
    filtered vectorized. Scale note: the filter is a broadcast map
    literal of n_shards entries evaluated JVM-side; pre-existing
    segment FILES are still listed/scanned once by the source, so
    pair with binlog retention/compaction for very old logs.
    """
    schema = schema or CHANGE_EVENTS_SCHEMA
    reader = spark.readStream.schema(schema)
    if getattr(config, "max_bytes_per_trigger", 0):
        # byte-granular admission; Spark forbids combining it with the
        # file-count cap, so it replaces maxFilesPerTrigger when set
        reader = reader.option("maxBytesPerTrigger", config.max_bytes_per_trigger)
    else:
        reader = reader.option("maxFilesPerTrigger", config.max_files_per_trigger)
    if config.binlog_format == "json":
        # JSON-lines segments (Debezium-style wire format); the
        # declared schema avoids inference and tolerates missing
        # (pre-evolution) fields exactly like the parquet path
        stream = reader.json(config.binlog_dir)
    else:
        stream = reader.parquet(config.binlog_dir)
    if config.initial_position == "latest":
        snap = _latest_snapshot(spark, config, schema)
        if snap:
            stream = stream.filter(high_water_filter(snap))
    return stream


def high_water_filter(snap: dict[int, int]):
    """Vectorized JVM-side predicate admitting only events past each
    shard's snapshotted high-water seq (broadcast map literal of
    n_shards entries). Shared by the stream and by any file-backed
    reconstruction of a micro-batch so the two paths cannot drift."""
    hw_map = F.create_map(*[F.lit(x) for kv in snap.items() for x in kv])
    return F.col("seq") > F.coalesce(hw_map[F.col("shard")], F.lit(-(2**62)))


def read_binlog_batch(
    spark: SparkSession,
    binlog_dir: str,
    schema: T.StructType | None = None,
    fmt: str = "parquet",
) -> DataFrame:
    """Batch read of the full binlog (for bounded replay / backfill)."""
    reader = spark.read.schema(schema or CHANGE_EVENTS_SCHEMA)
    return reader.json(binlog_dir) if fmt == "json" else reader.parquet(binlog_dir)
