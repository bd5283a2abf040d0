"""Round-2 regression tests: contended-commit isolation + attempt
history, manifest-driven LWW ordering, DLQ durability across the
merge-commit/DLQ-append crash window, and the footer-estimate gate
for filtered batches."""

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from nifi_processors_spark.config import EngineConfig
from nifi_processors_spark.schema import KEY_COLS, LWW_COLS, TRANSCRIPTS_SCHEMA
from nifi_processors_spark.streaming.pipeline import CdcPipeline
from nifi_processors_spark.synth import SynthSpec, generate_events, oracle_apply
from nifi_processors_spark.table import TransactionalTable

SPEC = SynthSpec(n_conversations=60, turns_per_conv=6, n_shards=4, seed=17)


def make_table(spark, path, n_buckets=8):
    return TransactionalTable.create(
        spark, path, TRANSCRIPTS_SCHEMA, KEY_COLS, LWW_COLS, n_buckets=n_buckets
    )


def events_df(spark, pdf):
    return spark.createDataFrame(pdf.drop(columns=["arrival_idx"], errors="ignore"))


def test_contended_commit_retries_and_records_attempt_history(
    spark, tmp_table_path
):
    """Two writers race one version: the loser retries against the new
    state, records the attempt in attempt_history, and its cleanup must
    NOT delete the winner's committed files (unique per-attempt dirs)."""
    ev = generate_events(SPEC)
    t = make_table(spark, tmp_table_path)
    t.merge(events_df(spark, ev.iloc[:50]), "s", 0)

    other = TransactionalTable(spark, tmp_table_path)
    orig = t._commit_manifest
    state = {"fired": False}

    def racy(manifest):
        # another writer steals this version just before our link
        if not state["fired"]:
            state["fired"] = True
            other.merge(events_df(spark, ev.iloc[50:60]), "other", 0)
        return orig(manifest)

    t._commit_manifest = racy
    r = t.merge(events_df(spark, ev.iloc[60:120]), "s", 1)
    assert r["commit_attempts"] == 2
    assert len(r["attempt_history"]) == 1
    assert r["attempt_history"][0]["error"] == "ConcurrentCommitError"
    assert r["attempt_history"][0]["backoff_ms"] >= 1

    # all three batches landed; the loser's rmtree touched only its own
    # attempt dir, so every manifest-referenced file is readable
    got = (
        t.read()
        .orderBy("conv_id", "turn_idx")
        .toPandas()[["conv_id", "turn_idx", "role", "text", "tool", "ts"]]
        .reset_index(drop=True)
    )
    exp = oracle_apply(ev.iloc[:120]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_custom_lww_cols_order_is_honored(spark, tmp_table_path):
    """A table created with lww_cols=['prio'] must merge by prio (then
    _seq), not by the default ts order."""
    schema = T.StructType(
        [
            T.StructField("conv_id", T.StringType()),
            T.StructField("turn_idx", T.IntegerType()),
            T.StructField("text", T.StringType()),
            T.StructField("prio", T.LongType()),
        ]
    )
    t = TransactionalTable.create(
        spark, tmp_table_path, schema, ["conv_id", "turn_idx"],
        lww_cols=["prio"], n_buckets=4,
    )
    rows = [
        ("I", "c1", 0, "winner-high-prio", 9, 1),
        ("I", "c2", 0, "loser", 1, 2),
    ]
    b0 = spark.createDataFrame(
        rows, "op string, conv_id string, turn_idx int, text string, prio long, seq long"
    )
    t.merge(b0, "s", 0)  # union-agg path (empty table)
    # later-delivered rows with LOWER prio must lose on both merge paths
    b1 = spark.createDataFrame(
        [("U", "c1", 0, "stale-low-prio", 3, 3),
         ("U", "c2", 0, "winner", 7, 4)],
        "op string, conv_id string, turn_idx int, text string, prio long, seq long",
    )
    t.merge(b1, "s", 1)  # broadcast-cow path (small vs existing)
    out = {r["conv_id"]: r["text"] for r in t.read().collect()}
    assert out == {"c1": "winner-high-prio", "c2": "winner"}


def test_dlq_append_survives_merge_watermark_skip(spark, tmp_path):
    """Crash window: merge manifest committed, process dies before the
    DLQ append. On redelivery the merge is watermark-skipped but the
    invalid rows MUST still be dead-lettered (and only once)."""
    cfg = EngineConfig(
        binlog_dir=str(tmp_path / "binlog"),
        table_path=str(tmp_path / "table"),
        dead_letter_path=str(tmp_path / "dlq"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        n_buckets=4,
    )
    p = CdcPipeline(spark, cfg)
    pdf = pd.DataFrame(
        {
            "op": ["I", "I", "I"],
            "conv_id": ["c1", "c2", "c3"],
            "turn_idx": pd.array([0, 0, 0], dtype="int32"),
            "role": ["user"] * 3,
            "text": ["ok", None, "ok2"],  # middle row → null_text
            "tool": [None] * 3,
            "ts": pd.to_datetime(["2024-01-01"] * 3).astype("datetime64[us]"),
            "seq": pd.array([1, 2, 3], dtype="int64"),
            "shard": pd.array([0, 0, 0], dtype="int32"),
            "arrival_ts": pd.to_datetime(["2024-01-01"] * 3).astype("datetime64[us]"),
        }
    )
    batch = spark.createDataFrame(pdf)

    # simulate the crashed first delivery: merge committed (valid rows
    # + watermark), DLQ append never happened
    from nifi_processors_spark.functions.attributes import with_error_reason

    tagged = with_error_reason(batch)
    valid = tagged.filter(F.col("error_reason").isNull()).drop("error_reason")
    p.table.merge(valid, source_id=cfg.source_id, batch_id=7)

    # redelivery of the same micro-batch
    stats = p.apply_batch(batch, 7)
    assert stats["skipped"] is True  # merge correctly watermark-skipped
    dlq = p.dead_letter.read().toPandas()
    assert len(dlq) == 1 and dlq["error_reason"][0] == "null_text"

    # a second redelivery duplicates nothing (DLQ's own watermark)
    p.apply_batch(batch, 7)
    assert p.dead_letter.read().count() == 1


def test_footer_estimate_gated_to_bare_scans(spark, tmp_path, tmp_table_path):
    """A filtered view of a big file must NOT inherit the file's footer
    row count: n_upserts reflects actual rows and the merge stays on
    the pruned broadcast-cow path instead of the all-buckets bulk path."""
    ev = generate_events(SPEC)
    big = events_df(spark, ev)
    pq_path = str(tmp_path / "events_pq")
    big.write.parquet(pq_path)

    t = make_table(spark, tmp_table_path, n_buckets=8)
    t.merge(spark.read.parquet(pq_path), "s", 0)

    small = spark.read.parquet(pq_path).filter(F.col("seq") % 101 == 0)
    n_small = small.count()
    assert 0 < n_small < len(ev) // 10
    r = t.merge(small, "s", 1, broadcast_threshold=max(n_small * 2, 64))
    assert r["n_upserts"] == n_small
    assert r["merge_path"] == "broadcast-cow"

    # bare file-backed batches still use the no-job footer shortcut
    assert TransactionalTable._is_bare_scan(spark.read.parquet(pq_path))
    assert TransactionalTable._is_bare_scan(
        spark.read.parquet(pq_path).select("conv_id", "seq")
    )
    assert not TransactionalTable._is_bare_scan(small)
