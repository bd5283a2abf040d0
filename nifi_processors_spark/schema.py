"""Schemas for the transcript table and the change-event stream.

Mirrors the reference's data model (SURVEY.md §1): the FlowFile payload
becomes typed columns ``(role, text, tool)``; the well-known record
metadata attributes (GetKinesisStream.java:79-84, 307-322 — partition
key, sequence number, arrival timestamp) become typed columns
``(conv_id, seq, shard, arrival_ts)``.
"""

from __future__ import annotations

from pyspark.sql import types as T

#: Key of the target table — ≙ the Kinesis partition key (GET:312)
#: plus the within-conversation ordinal.
KEY_COLS = ["conv_id", "turn_idx"]

#: Last-writer-wins ordering: max event-time wins, per-shard sequence
#: number breaks ties (the reference's "checkpoint only the last
#: record in shard order" discipline, GetKinesisStream.java:283-288).
LWW_COLS = ["ts", "seq"]

#: Payload columns carried into the target table.
PAYLOAD_COLS = ["role", "text", "tool", "ts"]

#: The target table of multi-turn transcripts (BASELINE.json input_hint).
TRANSCRIPTS_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)

#: One change event — ≙ one Kinesis record + its metadata attributes.
CHANGE_EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("op", T.StringType(), False),  # 'I' | 'U' | 'D'
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("seq", T.LongType(), False),
        T.StructField("shard", T.IntegerType(), False),
        T.StructField("arrival_ts", T.TimestampType(), True),
    ]
)

#: Pre-schema-evolution shape: segments written before the cut-over
#: physically lack the ``tool`` column (FlowFiles are schema-free —
#: the engine must accept both shapes mid-stream).
CHANGE_EVENTS_SCHEMA_V0 = T.StructType(
    [f for f in CHANGE_EVENTS_SCHEMA.fields if f.name != "tool"]
)

#: Dead-letter (quarantine) table: the failed record plus routing
#: metadata — ≙ the producer's failure relationship + error attributes
#: (PutKinesisStream.java:307-326, 343-364).
DEAD_LETTER_SCHEMA = T.StructType(
    list(CHANGE_EVENTS_SCHEMA.fields)
    + [
        T.StructField("error_reason", T.StringType(), True),
        T.StructField("batch_id", T.LongType(), True),
    ]
)

#: Per-partition lineage row, one per (micro-batch, shard) — ≙ the
#: provenance receive event (GET:266-268) + consumer-lag metric
#: (GET:314-315) aggregated per shard.
LINEAGE_SCHEMA = T.StructType(
    [
        T.StructField("source_id", T.StringType(), False),
        T.StructField("batch_id", T.LongType(), False),
        T.StructField("shard", T.IntegerType(), True),
        T.StructField("first_seq", T.LongType(), True),
        T.StructField("last_seq", T.LongType(), True),
        T.StructField("n_events", T.LongType(), True),
        T.StructField("n_dead_letter", T.LongType(), True),
        T.StructField("max_lag_ms", T.LongType(), True),
    ]
)


def schema_union(base: T.StructType, extra: T.StructType) -> T.StructType:
    """Union-by-name schema evolution: fields of ``base`` keep their
    position/type; new fields from ``extra`` are appended nullable.

    This is the engine's analogue of Iceberg schema merge / the
    reference's schema-free FlowFile payload (GET:256-257).
    """
    names = {f.name for f in base.fields}
    fields = list(base.fields)
    for f in extra.fields:
        if f.name not in names:
            fields.append(T.StructField(f.name, f.dataType, True))
    return T.StructType(fields)
