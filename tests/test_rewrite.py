"""Content-rewrite stage: vectorized redaction + pandas-UDF
normalization wired through the pipeline."""

import pandas as pd

from nifi_processors_spark.config import EngineConfig
from nifi_processors_spark.functions.rewrite import make_transform, redact_text
from nifi_processors_spark.streaming.pipeline import CdcPipeline
from nifi_processors_spark.synth import SynthSpec, generate_events, make_fixture


def test_redact_text_patterns(spark):
    df = spark.createDataFrame(
        [
            (1, "mail me at alice@example.com today"),
            (2, "call 555-123-4567 or 5551234567"),
            (3, "card 4111111111111111 expires"),
            (4, None),
            (5, "docs at https://ex.com/a?b=c#d ok"),
            (6, "host 10.0.42.7 ssn 123-45-6789"),
            (7, "id 123e4567-e89b-42d3-a456-426614174000 sent"),
            (8, "auth Bearer abcDEF1234._x done"),
            (9, "acct GB82WEST12345698765432 paid"),
            (10, "the bearer receives the payment"),
        ],
        "id int, text string",
    )
    out = {r["id"]: r["text"] for r in redact_text(df).collect()}
    assert out[1] == "mail me at <EMAIL> today"
    assert out[2] == "call <PHONE> or <PHONE>"
    assert out[3] == "card <CARDNUM> expires"
    assert out[4] is None
    assert out[5] == "docs at <URL> ok"
    assert out[6] == "host <IP> ssn <SSN>"
    assert out[7] == "id <UUID> sent"
    assert out[8] == "auth <TOKEN> done"
    assert out[9] == "acct <IBAN> paid"
    # prose after the word "bearer" is NOT a credential
    assert out[10] == "the bearer receives the payment"


def test_pipeline_with_transform(spark, tmp_path):
    spec = SynthSpec(n_conversations=20, turns_per_conv=4, n_shards=2, seed=8)
    events, expected, _ = make_fixture(str(tmp_path / "binlog"), spec)
    # inject an email into a known payload via an extra late segment
    from tests.test_pipeline import write_bad_segment

    late = generate_events(spec).head(1).copy().drop(columns=["arrival_idx"])
    late["text"] = "contact bob@corp.io now"
    late["ts"] = (late["ts"] + pd.Timedelta(days=30)).astype("datetime64[us]")
    late["arrival_ts"] = late["arrival_ts"].astype("datetime64[us]")
    late["seq"] = late["seq"] + 10_000
    late["op"] = "U"
    write_bad_segment(late, str(tmp_path / "binlog" / "seg-9999999999-shard000-x.parquet"))
    cfg = EngineConfig(
        binlog_dir=str(tmp_path / "binlog"),
        table_path=str(tmp_path / "t"),
        dead_letter_path=str(tmp_path / "dlq"),
        checkpoint_dir=str(tmp_path / "ck"),
        n_buckets=4,
    )
    p = CdcPipeline(spark, cfg, transform=make_transform(redact=True, normalize=True))
    p.run_once()
    got = p.table.read().toPandas()
    hit = got[got["conv_id"] == late["conv_id"].iloc[0]]
    hit = hit[hit["turn_idx"] == late["turn_idx"].iloc[0]]
    assert hit["text"].iloc[0] == "contact <EMAIL> now"
    # no raw emails anywhere in the final table
    assert not got["text"].str.contains("@", regex=False).any()
