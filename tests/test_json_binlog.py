"""JSON-lines binlog format: the full pipeline over a Debezium-style
wire format, including the schema-evolution cutover (pre-cutover JSON
events simply lack the tool field)."""

import gzip
import json
import os

import pandas as pd

from nifi_processors_spark.config import ConfigError, EngineConfig
from nifi_processors_spark.streaming.pipeline import CdcPipeline
from nifi_processors_spark.synth import SynthSpec, generate_events, oracle_apply

SPEC = SynthSpec(n_conversations=30, turns_per_conv=4, n_shards=2, seed=19)


def write_json_binlog(events: pd.DataFrame, binlog_dir: str, n_segments: int = 6):
    os.makedirs(binlog_dir, exist_ok=True)
    rows = events.drop(columns=["arrival_idx"]).to_dict("records")
    seg = max(len(rows) // n_segments, 1)
    for i in range(0, len(rows), seg):
        with open(os.path.join(binlog_dir, f"seg-{i:08d}.json"), "w") as f:
            for r in rows[i : i + seg]:
                r = dict(r)
                for tscol in ("ts", "arrival_ts"):
                    r[tscol] = pd.Timestamp(r[tscol]).isoformat()
                if r.get("tool") is None:
                    r.pop("tool", None)  # pre-evolution shape: field absent
                f.write(json.dumps(r) + "\n")


def test_json_binlog_full_replay(spark, tmp_path):
    ev = generate_events(SPEC)
    write_json_binlog(ev, str(tmp_path / "binlog"))
    cfg = EngineConfig(
        binlog_dir=str(tmp_path / "binlog"),
        binlog_format="json",
        table_path=str(tmp_path / "t"),
        dead_letter_path=str(tmp_path / "dlq"),
        checkpoint_dir=str(tmp_path / "ck"),
        n_buckets=4,
        max_files_per_trigger=2,
    )
    p = CdcPipeline(spark, cfg)
    p.run_once()
    got = (
        p.table.read()
        .orderBy("conv_id", "turn_idx")
        .toPandas()[["conv_id", "turn_idx", "role", "text", "tool", "ts"]]
        .reset_index(drop=True)
    )
    exp = oracle_apply(ev).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_bad_format_rejected():
    import pytest

    with pytest.raises(ConfigError):
        EngineConfig(
            binlog_dir="x", binlog_format="avro", table_path="y",
            dead_letter_path="z", checkpoint_dir="c",
        ).validate()
