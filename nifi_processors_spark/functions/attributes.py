"""Vectorized change-event validation + attribute enrichment.

Re-expresses the reference's per-record Java loops as columnar
expressions (zero per-row Python):

* ``validate_events`` — the routing predicate set (SURVEY.md §2.4):
  per-record error isolation (GetKinesisStream.java:272-278) and
  null-payload tolerance (GetKinesisStreamTestIT.java:274-359) become
  a vectorized valid/invalid split with a reason column (the failure
  relationship's error attributes, PutKinesisStream.java:343-364).
* ``enrich_attributes`` — the consumer's six metadata attributes
  (GET:307-322): partition key, sequence number, millisBehindLatest,
  approximate arrival, batch start time, record number within batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

def _rules():
    """Validation rules, first failure wins (≙ the reference removing
    a failed record and continuing the loop, GET:272-278). Built
    lazily — Column construction needs an active SparkContext."""
    return [
        ("null_op", F.col("op").isNull()),
        ("bad_op", ~F.col("op").isin("I", "U", "D")),
        ("null_conv_id", F.col("conv_id").isNull()),
        ("null_turn_idx", F.col("turn_idx").isNull()),
        ("negative_turn_idx", F.col("turn_idx") < 0),
        ("null_ts", F.col("ts").isNull()),
        ("null_seq", F.col("seq").isNull()),
        # null payload on a non-delete ≙ null record data (GIT:274-359)
        ("null_text", (F.col("op") != "D") & F.col("text").isNull()),
    ]


_RULE_COLS = {
    "null_op": ["op"], "bad_op": ["op"], "null_conv_id": ["conv_id"],
    "null_turn_idx": ["turn_idx"], "negative_turn_idx": ["turn_idx"],
    "null_ts": ["ts"], "null_seq": ["seq"], "null_text": ["op", "text"],
}


def with_error_reason(df: DataFrame) -> DataFrame:
    """Adds ``error_reason`` (null = valid). Pure column expressions —
    whole-stage-codegen'd, no Python. Rules referencing columns the
    frame doesn't carry are skipped (producer-side frames have no
    seq/shard yet — the writer assigns them)."""
    have = set(df.columns)
    reason = F.lit(None).cast("string")
    for name, cond in reversed(_rules()):
        if set(_RULE_COLS[name]) <= have:
            reason = F.when(cond, F.lit(name)).otherwise(reason)
    return df.withColumn("error_reason", reason)


def validate_events(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Split into (valid, invalid-with-reason) — the success/failure
    relationship pair (GET:99-100, PUT:307-326)."""
    tagged = with_error_reason(df)
    valid = tagged.filter(F.col("error_reason").isNull()).drop("error_reason")
    invalid = tagged.filter(F.col("error_reason").isNotNull())
    return valid, invalid


def enrich_attributes(df: DataFrame, batch_start_ts=None) -> DataFrame:
    """Attach the reference's per-record metadata attributes (GET:79-84,
    307-322) as typed columns:

    * ``millis_behind`` ≙ millisBehindLatest (consumer lag) — here
      batch-start minus arrival time
    * ``batch_start_ts`` ≙ the processing-time stamp (GET:246,318)
    * ``record_number`` ≙ index within the (shard-ordered) batch
      (GET:319)

    The window sort is per shard on ``seq`` — monotone within a shard,
    so this is a cheap, already-clustered sort. Used for parity /
    inspection queries, NOT in the merge hot path (the merge needs none
    of these).
    """
    start = (
        F.lit(batch_start_ts).cast("timestamp")
        if batch_start_ts is not None
        else F.current_timestamp()
    )
    w = Window.partitionBy("shard").orderBy("seq")
    return (
        df.withColumn("batch_start_ts", start)
        .withColumn(
            "millis_behind",
            # integer µs arithmetic (exact; a double path can be off by
            # 1 ms at truncation boundaries)
            F.expr(
                "(unix_micros(batch_start_ts) - unix_micros(arrival_ts)) div 1000"
            ),
        )
        .withColumn("record_number", F.row_number().over(w) - 1)
    )
