"""Streaming end-to-end: replay, crash/resume, dead-letter, duplicate
delivery — the FIXTURES.md §3 streaming scenarios."""

import os
import time

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from nifi_processors_spark.config import EngineConfig
from nifi_processors_spark.streaming.pipeline import CdcPipeline
from nifi_processors_spark.synth import SynthSpec, make_fixture

SPEC = SynthSpec(n_conversations=50, turns_per_conv=5, n_shards=3, seed=21,
                 segments_per_shard=4)


_PA_EVENT_SCHEMA = pa.schema(
    [
        ("op", pa.string()), ("conv_id", pa.string()), ("turn_idx", pa.int32()),
        ("role", pa.string()), ("text", pa.string()), ("tool", pa.string()),
        ("ts", pa.timestamp("us")), ("seq", pa.int64()), ("shard", pa.int32()),
        ("arrival_ts", pa.timestamp("us")),
    ]
)


def write_bad_segment(pdf, path):
    pq.write_table(
        pa.Table.from_pandas(pdf, schema=_PA_EVENT_SCHEMA, preserve_index=False),
        path,
    )


def cfg_for(tmp_path, **over):
    base = dict(
        binlog_dir=str(tmp_path / "binlog"),
        table_path=str(tmp_path / "table"),
        dead_letter_path=str(tmp_path / "dlq"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        n_buckets=8,
        max_files_per_trigger=3,
    )
    base.update(over)
    return EngineConfig(**base)


def read_final(pipeline):
    return (
        pipeline.table.read()
        .orderBy("conv_id", "turn_idx")
        .toPandas()[["conv_id", "turn_idx", "role", "text", "tool", "ts"]]
        .reset_index(drop=True)
    )


def test_streaming_full_replay_matches_oracle(spark, tmp_path):
    _, expected, paths = make_fixture(str(tmp_path / "binlog"), SPEC)
    p = CdcPipeline(spark, cfg_for(tmp_path))
    p.run_once()
    got = read_final(p)
    pd.testing.assert_frame_equal(got, expected.reset_index(drop=True), check_dtype=False)
    # multiple micro-batches actually ran (admission control worked)
    lineage = p.table.read_lineage().toPandas()
    assert lineage["batch_id"].nunique() >= 3
    # per-shard lineage rows with monotone seq ranges
    assert set(lineage["shard"].dropna()) <= {0, 1, 2}
    assert (lineage["first_seq"] <= lineage["last_seq"]).all()


def test_crash_and_resume_from_checkpoint(spark, tmp_path):
    _, expected, paths = make_fixture(str(tmp_path / "binlog"), SPEC)
    cfg = cfg_for(tmp_path, max_files_per_trigger=2)
    p = CdcPipeline(spark, cfg)
    # run phase 1, stop after at least one committed batch ("crash")
    q = p.start(available_now=True)
    deadline = time.time() + 120
    while time.time() < deadline:
        if p.table.watermark(cfg.source_id) is not None:
            break
        time.sleep(0.2)
    q.stop()
    q.awaitTermination(60)
    mid_version = p.table.current_version()
    assert mid_version >= 1

    # resume with the SAME checkpoint: must finish and converge
    p2 = CdcPipeline(spark, cfg)
    p2.run_once()
    got = read_final(p2)
    pd.testing.assert_frame_equal(got, expected.reset_index(drop=True), check_dtype=False)
    # redelivered boundary batches were skipped or idempotent — no
    # duplicate keys either way
    assert not got.duplicated(["conv_id", "turn_idx"]).any()


def test_replay_after_nuked_checkpoint_reconverges(spark, tmp_path):
    _, expected, _ = make_fixture(str(tmp_path / "binlog"), SPEC)
    cfg = cfg_for(tmp_path)
    p = CdcPipeline(spark, cfg)
    p.run_once()
    # nuke the checkpoint, replay the whole binlog under a new source id
    import shutil

    shutil.rmtree(cfg.checkpoint_dir)
    cfg2 = cfg_for(tmp_path, checkpoint_dir=str(tmp_path / "ckpt2"), source_id="replay2")
    p2 = CdcPipeline(spark, cfg2)
    p2.run_once()
    got = read_final(p2)
    pd.testing.assert_frame_equal(got, expected.reset_index(drop=True), check_dtype=False)


def test_malformed_events_dead_lettered_rest_applied(spark, tmp_path):
    events, expected, paths = make_fixture(str(tmp_path / "binlog"), SPEC)
    # inject a malformed segment mid-stream: null text on an insert,
    # bad op, null conv_id (FIXTURES malformed_mid_batch)
    bad = pd.DataFrame(
        {
            "op": ["I", "X", "I"],
            "conv_id": ["conv-bad", "conv-bad", None],
            "turn_idx": pd.array([0, 1, 2], dtype="int32"),
            "role": ["user"] * 3,
            "text": [None, "x", "y"],
            "tool": [None] * 3,
            "ts": pd.to_datetime(["2030-01-01"] * 3).astype("datetime64[us]"),
            "seq": pd.array([10_000, 10_001, 10_002], dtype="int64"),
            "shard": pd.array([0, 0, 0], dtype="int32"),
            "arrival_ts": pd.to_datetime(["2030-01-01"] * 3).astype("datetime64[us]"),
        }
    )
    write_bad_segment(
        bad,
        os.path.join(str(tmp_path / "binlog"), "seg-9999999999-shard000-bad.parquet"),
    )
    p = CdcPipeline(spark, cfg_for(tmp_path))
    p.run_once()
    got = read_final(p)
    # the valid rows still match the oracle; none of the bad rows landed
    assert not got["conv_id"].str.startswith("conv-bad").any()
    assert got["conv_id"].notna().all()
    pd.testing.assert_frame_equal(got, expected.reset_index(drop=True), check_dtype=False)
    dlq = p.dead_letter.read().toPandas()
    assert len(dlq) == 3
    assert set(dlq["error_reason"]) == {"null_text", "bad_op", "null_conv_id"}


def test_second_run_once_is_a_noop(spark, tmp_path):
    _, expected, _ = make_fixture(str(tmp_path / "binlog"), SPEC)
    cfg = cfg_for(tmp_path)
    p = CdcPipeline(spark, cfg)
    p.run_once()
    v1 = p.table.current_version()
    p.run_once()  # no new files: empty batches suppressed
    got = read_final(p)
    pd.testing.assert_frame_equal(got, expected.reset_index(drop=True), check_dtype=False)


def test_fail_on_dead_letter_raises(spark, tmp_path):
    make_fixture(str(tmp_path / "binlog"), SPEC)
    bad = pd.DataFrame(
        {
            "op": ["I"], "conv_id": ["c"], "turn_idx": pd.array([0], dtype="int32"),
            "role": ["user"], "text": [None], "tool": [None],
            "ts": pd.to_datetime(["2030-01-01"]).astype("datetime64[us]"),
            "seq": pd.array([1], dtype="int64"), "shard": pd.array([0], dtype="int32"),
            "arrival_ts": pd.to_datetime(["2030-01-01"]).astype("datetime64[us]"),
        }
    )
    write_bad_segment(
        bad,
        os.path.join(str(tmp_path / "binlog"), "seg-9999999999-shard000-bad.parquet"),
    )
    cfg = cfg_for(tmp_path, dead_letter_path="", fail_on_dead_letter=True)
    p = CdcPipeline(spark, cfg)
    q = p.start(available_now=True)
    with pytest.raises(Exception):
        q.awaitTermination(120)
        if q.exception() is not None:
            raise RuntimeError(q.exception().desc)
