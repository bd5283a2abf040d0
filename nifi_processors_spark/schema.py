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


class SchemaEvolutionError(TypeError):
    """A batch tried to change a column's type in a way the table
    cannot represent losslessly (narrowing or incompatible kinds)."""


#: safe widening lattices (Iceberg's evolution rules): within each
#: chain a later type represents every value of an earlier one exactly
_INT_CHAIN = {"byte": 0, "short": 1, "integer": 2, "long": 3}
_FLOAT_CHAIN = {"float": 0, "double": 1}


def widen_type(base: T.DataType, new: T.DataType, col: str) -> T.DataType:
    """The narrower-to-wider resolution of two column types: identical
    → unchanged; both in a widening chain → the wider one (int→long,
    float→double; integers promote to floats); anything else —
    narrowing or cross-kind (string↔int, timestamp↔long) — raises
    loudly instead of silently down-casting (which truncated before
    this existed)."""
    if base == new:
        return base
    a, b = base.typeName(), new.typeName()
    # an all-null batch column arrives as NullType (void) — it carries
    # no type information and fits any base; a void base adopts the
    # first concrete type it sees
    if b == "void":
        return base
    if a == "void":
        return new
    if a in _INT_CHAIN and b in _INT_CHAIN:
        return base if _INT_CHAIN[a] >= _INT_CHAIN[b] else new
    if a in _FLOAT_CHAIN and b in _FLOAT_CHAIN:
        return base if _FLOAT_CHAIN[a] >= _FLOAT_CHAIN[b] else new
    if a in _INT_CHAIN and b in _FLOAT_CHAIN:
        return new
    if b in _INT_CHAIN and a in _FLOAT_CHAIN:
        return base
    raise SchemaEvolutionError(
        f"column {col!r}: cannot evolve {a} -> {b}; only widening "
        "(byte<short<int<long, float<double, int->float) is supported"
    )


def schema_union(base: T.StructType, extra: T.StructType) -> T.StructType:
    """Union-by-name schema evolution: fields of ``base`` keep their
    position; new fields from ``extra`` are appended nullable; a field
    present in both WIDENS to the wider type (int→long, float→double)
    and rejects any narrowing/incompatible change loudly.

    This is the engine's analogue of Iceberg schema merge / the
    reference's schema-free FlowFile payload (GET:256-257). Widening
    is sound end-to-end because Spark's vectorized parquet reader
    upcasts old files' physical int32/float pages into the widened
    long/double read schema.
    """
    by_name = {f.name: f for f in extra.fields}
    fields = [
        T.StructField(
            f.name,
            widen_type(f.dataType, by_name[f.name].dataType, f.name)
            if f.name in by_name
            else f.dataType,
            f.nullable,
        )
        for f in base.fields
    ]
    names = {f.name for f in base.fields}
    for f in extra.fields:
        if f.name not in names:
            fields.append(T.StructField(f.name, f.dataType, True))
    return T.StructType(fields)
