"""Binlog writer — the producer half (≙ PutKinesisStream, SURVEY.md
§2.2).

Writes a DataFrame of change events INTO a sharded binlog directory
that the tail source (sources/binlog.py) can consume:

* **Key→shard routing with random fallback** (PutKinesisStream.java:
  264-269): events route by hash(partition key); rows with a NULL key
  get a uniform pseudo-random shard so load still spreads — the
  reference's anti-skew fallback, expressed as a coalesce over
  xxhash64 of the whole payload (deterministic per row, uniform).
* **Per-shard monotone seq** assigned from a base offset (the writer's
  sequence-number contract, ≙ KPL's per-shard sequencing).
* **Aggregation** (KPL record aggregation, APP:40-68): one segment
  file per shard per call — columnar parquet subsumes record packing.
* **Success/failure routing** (PUT:307-326): rows failing the writer's
  validation are returned, not written — callers route them to a DLQ.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nifi_processors_spark.functions.attributes import validate_events


def write_binlog_segment(
    df: DataFrame,
    binlog_dir: str,
    n_shards: int = 8,
    seq_base: int = 0,
    partition_key: str = "conv_id",
    validate: bool = True,
) -> tuple[dict, DataFrame | None]:
    """Write one batch of change events as per-shard segment files.

    Returns (stats, failed_df). ``failed_df`` is None when everything
    routed to success (≙ REL_SUCCESS only).
    """
    failed = None
    df = df.drop("seq", "shard")
    if validate:
        df, invalid = validate_events(df)
        if not invalid.isEmpty():
            failed = invalid

    # key→shard with random-fallback for null keys (PUT:264-269):
    # xxhash64 over the full row is deterministic yet uniform
    key_hash = F.when(
        F.col(partition_key).isNotNull(), F.xxhash64(F.col(partition_key))
    ).otherwise(F.xxhash64(*[F.col(c) for c in df.columns]))
    routed = df.withColumn("shard", F.pmod(key_hash, F.lit(n_shards)).cast("int"))

    # per-shard monotone seq from the base offset, ordered by event time
    from pyspark.sql import Window

    w = Window.partitionBy("shard").orderBy("ts", *[
        c for c in ("conv_id", "turn_idx") if c in df.columns
    ])
    routed = routed.withColumn(
        "seq", (F.row_number().over(w) + F.lit(seq_base)).cast("long")
    )

    os.makedirs(binlog_dir, exist_ok=True)
    token = uuid.uuid4().hex[:8]
    tmp = os.path.join(binlog_dir, f".tmp-{token}")
    # duplicate the shard as a partition-only column: partitionBy strips
    # its column from file contents, but readers need `shard` in-file
    (
        routed.withColumn("_shard_part", F.col("shard"))
        .repartition(n_shards, "shard")
        .write.partitionBy("_shard_part")
        .parquet(tmp)
    )

    n_files = 0
    for root, _dirs, files in os.walk(tmp):
        for fn in files:
            if not fn.endswith(".parquet"):
                continue
            shard = int(root.rsplit("_shard_part=", 1)[1])
            dest = os.path.join(
                binlog_dir,
                f"seg-{seq_base:010d}-shard{shard:03d}-{token}-{n_files:03d}.parquet",
            )
            os.rename(os.path.join(root, fn), dest)
            n_files += 1
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)
    return {"files": n_files, "n_shards": n_shards}, failed
