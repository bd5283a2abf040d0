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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from nifi_processors_spark.config import EngineConfig
from nifi_processors_spark.schema import CHANGE_EVENTS_SCHEMA


def read_binlog_stream(
    spark: SparkSession,
    config: EngineConfig,
    schema: T.StructType | None = None,
) -> DataFrame:
    """Structured Streaming tail of the binlog directory.

    ``initial_position='earliest'`` ≙ TRIM_HORIZON (ACP:85-92): replay
    from the start of the retained log. ``'latest'`` (≙ LATEST) is not
    supported by Spark's file source semantics (it always admits
    existing files); callers wanting latest semantics should start the
    stream against a fresh/compacted binlog directory.
    """
    if config.initial_position != "earliest":
        raise NotImplementedError(
            "file-tail source replays from earliest (TRIM_HORIZON); "
            "for latest semantics point the stream at a fresh binlog dir"
        )
    reader = (
        spark.readStream.schema(schema or CHANGE_EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", config.max_files_per_trigger)
    )
    if config.binlog_format == "json":
        # JSON-lines segments (Debezium-style wire format); the
        # declared schema avoids inference and tolerates missing
        # (pre-evolution) fields exactly like the parquet path
        return reader.json(config.binlog_dir)
    return reader.parquet(config.binlog_dir)


def read_binlog_batch(
    spark: SparkSession,
    binlog_dir: str,
    schema: T.StructType | None = None,
    fmt: str = "parquet",
) -> DataFrame:
    """Batch read of the full binlog (for bounded replay / backfill)."""
    reader = spark.read.schema(schema or CHANGE_EVENTS_SCHEMA)
    return reader.json(binlog_dir) if fmt == "json" else reader.parquet(binlog_dir)
