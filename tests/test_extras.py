"""Compaction, binlog writer (producer side), and multimodal plumbing."""

import pandas as pd
import pytest

from nifi_processors_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    extract_image_features,
    sample_video_frames,
)
from nifi_processors_spark.schema import KEY_COLS, LWW_COLS, TRANSCRIPTS_SCHEMA
from nifi_processors_spark.sources.binlog import read_binlog_batch
from nifi_processors_spark.sources.binlog_writer import write_binlog_segment
from nifi_processors_spark.synth import SynthSpec, generate_events, oracle_apply
from nifi_processors_spark.table import TransactionalTable

SPEC = SynthSpec(n_conversations=40, turns_per_conv=5, n_shards=3, seed=5)


def test_compact_restores_file_hygiene_and_state(spark, tmp_path):
    # merge-on-read is the strategy that actually fragments (one delta
    # generation per merge); copy-on-write's sized outputs now keep
    # buckets at ~1 file so compact() correctly reports nothing to do.
    ev = generate_events(SPEC)
    t = TransactionalTable.create(
        spark, str(tmp_path / "t"), TRANSCRIPTS_SCHEMA, KEY_COLS, LWW_COLS,
        n_buckets=4, merge_strategy="merge-on-read",
    )
    n = len(ev)
    for i in range(4):
        t.merge(
            spark.createDataFrame(
                ev.iloc[i * n // 4 : (i + 1) * n // 4].drop(columns=["arrival_idx"])
            ),
            "s", i,
        )
    before = t.read().orderBy("conv_id", "turn_idx").toPandas()
    files_before = len(t.manifest()["files"])
    r = t.compact()
    assert not r["skipped"]
    files_after = len(t.manifest()["files"])
    assert files_after <= files_before
    after = t.read().orderBy("conv_id", "turn_idx").toPandas()
    pd.testing.assert_frame_equal(before, after)
    # tombstone expiry drops internal deleted rows but not public state
    t.compact(drop_tombstones=True)
    after2 = t.read().orderBy("conv_id", "turn_idx").toPandas()
    pd.testing.assert_frame_equal(before, after2)
    internal = t.read(include_internal=True, include_deleted=True)
    assert internal.filter("_deleted").count() == 0


def test_binlog_writer_roundtrip(spark, tmp_path):
    ev = generate_events(SPEC).drop(columns=["arrival_idx", "seq", "shard"])
    df = spark.createDataFrame(ev)
    out = str(tmp_path / "binlog")
    stats, failed = write_binlog_segment(df, out, n_shards=4)
    assert failed is None
    assert stats["files"] >= 4
    back = read_binlog_batch(spark, out).toPandas()
    assert len(back) == len(ev)
    # key-stable routing: one shard per conversation
    assert (back.groupby("conv_id")["shard"].nunique() == 1).all()
    # per-shard monotone seq
    for _, g in back.groupby("shard"):
        s = g.sort_values("seq")["seq"]
        assert s.is_unique
    # the written binlog replays to the same oracle state
    t = TransactionalTable.create(
        spark, str(tmp_path / "t"), TRANSCRIPTS_SCHEMA, KEY_COLS, LWW_COLS, n_buckets=4
    )
    t.merge(read_binlog_batch(spark, out), "rt", 0)
    got = t.read().orderBy("conv_id", "turn_idx").toPandas()
    exp = oracle_apply(generate_events(SPEC))
    assert len(got) == len(exp)
    pd.testing.assert_frame_equal(
        got[["conv_id", "turn_idx", "text"]].reset_index(drop=True),
        exp[["conv_id", "turn_idx", "text"]].reset_index(drop=True),
        check_dtype=False,
    )


def test_binlog_writer_null_key_fallback_and_failure_routing(spark, tmp_path):
    ev = generate_events(SPEC).drop(columns=["arrival_idx", "seq", "shard"]).head(20).copy()
    ev.loc[ev.index[:8], "conv_id"] = None  # null partition key
    ev.loc[ev.index[:8], "op"] = "D"  # deletes tolerate null text; conv_id null → invalid
    df = spark.createDataFrame(ev)
    stats, failed = write_binlog_segment(df, str(tmp_path / "b"), n_shards=4)
    # null conv_id rows rejected by producer validation (routed to failure)
    assert failed is not None and failed.count() == 8
    assert set(failed.toPandas()["error_reason"]) == {"null_conv_id"}
    back = read_binlog_batch(spark, str(tmp_path / "b"))
    assert back.count() == 12


def media_df(spark):
    rows = [
        (1, "image", b"img-one-bytes", "image/png", 32, 32, None),
        (2, "image", b"img-two-bytes", "image/png", 64, 64, None),
        (3, "video", b"vid-bytes", "video/mp4", 640, 480, 3500),
        (4, "audio", b"aud-bytes", "audio/wav", None, None, 2000),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_image_features_plumbing(spark):
    out = extract_image_features(media_df(spark), resize=(8, 8), fake=True).toPandas()
    assert len(out) == 2
    assert all(len(f) == 64 for f in out["feat"])
    # deterministic: same payload → same features
    out2 = extract_image_features(media_df(spark), resize=(8, 8), fake=True).toPandas()
    pd.testing.assert_frame_equal(
        out.sort_values("media_id").reset_index(drop=True),
        out2.sort_values("media_id").reset_index(drop=True),
    )


def test_video_frame_sampling_plumbing(spark):
    out = sample_video_frames(media_df(spark), every_ms=1000, fake=True).toPandas()
    assert list(out["frame_idx"]) == [0, 1, 2]
    assert list(out["frame_ts_ms"]) == [0, 1000, 2000]


def test_decode_unrecognized_payload_quarantines(spark):
    """Round-5 R2 semantics: an unrecognized image payload no longer
    aborts the job — the row lands on the failure side with the codec
    boundary spelled out in error_reason (was: raise → task abort)."""
    out = extract_image_features(media_df(spark), fake=False).toPandas()
    assert len(out) == 2
    assert out["feat"].isna().all()
    assert all("NotImplementedError" in r for r in out["error_reason"])
