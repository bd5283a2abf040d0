"""Round-3 regression tests: bounded query caches, discriminating
oracles (nonzero rows), and ADVICE fixes."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nifi_processors_spark.plans import sql_queries  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


def _n_cached(spark):
    return spark.sparkContext._jsc.sc().getPersistentRDDs().size()


def test_staged_query_caches_are_bounded_and_releasable(spark):
    """Round-2 VERDICT "What's wrong" #1: the MinHash/IVF staged
    queries persisted intermediates and never released them, so a
    long-lived session accumulated cached blocks per invocation. Now
    each staged query releases the previous pins, and release_caches()
    drains to zero."""
    sql_queries.release_caches()
    spark.catalog.clearCache()
    base = _n_cached(spark)

    mh = sql_queries.QUERIES["doc_dedup_minhash_lsh"][0]
    ivf = sql_queries.QUERIES["emb_ivf_ann_topk"][0]
    high = base
    for fn in (mh, ivf, mh, ivf):
        fn(spark, SF_DIR).collect()
        high = max(high, _n_cached(spark))
    # at most ONE query's intermediates pinned at any time (MinHash
    # pins 2: shingles + signatures) — not 2 per invocation forever
    assert high <= base + 2

    sql_queries.release_caches()
    assert _n_cached(spark) == base


def test_null_key_upsert_converges_despite_file_pruning(spark, tmp_table_path):
    """ADVICE r2 (medium): min/max key-stat pruning excluded nulls on
    both sides while the merge join is null-safe — a file holding a
    null-key row whose non-null range was disjoint from the batch
    range got pruned, so a null-key upsert inserted a SECOND live row
    for the same key. Fixed two ways: footer stats with null_count>0
    are refused, and a bucket whose batch slice has null keys records
    no range."""
    import pandas as pd

    from nifi_processors_spark.schema import (
        KEY_COLS, LWW_COLS, TRANSCRIPTS_SCHEMA,
    )
    from nifi_processors_spark.table import TransactionalTable

    t = TransactionalTable.create(
        spark, tmp_table_path, TRANSCRIPTS_SCHEMA, KEY_COLS, LWW_COLS,
        n_buckets=1,
    )

    def batch(rows):
        pdf = pd.DataFrame(
            rows,
            columns=["op", "conv_id", "turn_idx", "role", "text", "tool",
                     "ts", "seq", "shard", "arrival_ts"],
        )
        for c in ("ts", "arrival_ts"):
            pdf[c] = pd.to_datetime(pdf[c])
        pdf["turn_idx"] = pdf["turn_idx"].astype("int32")
        pdf["shard"] = pdf["shard"].astype("int32")
        return spark.createDataFrame(pdf)

    # batch 1: a null-key row co-located with keys in the c* range
    t.merge(batch([
        ("I", "c500", 0, "user", "old-c500", None,
         "2024-01-01 00:00:01", 1, 0, "2024-01-01 00:00:01"),
        ("I", None, 0, "user", "old-null", None,
         "2024-01-01 00:00:02", 2, 0, "2024-01-01 00:00:02"),
    ]), "s", 0)
    # batch 2: null-key upsert + keys DISJOINT from the c* range (the
    # old bucket range [a000, a999] pruned batch-1's file)
    t.merge(batch([
        ("U", "a000", 0, "user", "new-a000", None,
         "2024-01-01 00:01:00", 3, 0, "2024-01-01 00:01:00"),
        ("U", None, 0, "user", "new-null", None,
         "2024-01-01 00:01:01", 4, 0, "2024-01-01 00:01:01"),
    ]), "s", 1)

    final = t.read().filter("conv_id IS NULL").collect()
    assert len(final) == 1, f"expected 1 live null-key row, got {final}"
    assert final[0]["text"] == "new-null"


def test_progress_fold_is_timestamp_resolution_independent():
    """ADVICE r2 (low): the stateful operator assumed Arrow hands
    datetime64[ns]; under pandas 2.x us-resolution frames the epoch
    conversion was off by 1000×. The fold must yield identical µs for
    ns- and µs-resolution inputs."""
    import pandas as pd

    from nifi_processors_spark.streaming.stateful import _fold_progress

    ts = pd.Timestamp("2024-03-01 12:00:00.123456")
    for unit in ("ns", "us"):
        pdf = pd.DataFrame(
            {"seq": [7], "ts": pd.Series([ts]).astype(f"datetime64[{unit}]")}
        )
        n, mx, ts_us = _fold_progress(0, None, None, pdf)
        assert (n, mx) == (1, 7)
        assert ts_us == ts.value // 1000, unit


def test_latest_refuses_fresh_snapshot_on_existing_checkpoint(
    spark, tmp_path
):
    """ADVICE r2 (low): flipping earliest→latest on a checkpoint that
    already committed offsets (or restoring one without the snapshot
    sidecar) silently skipped events delivered while the stream was
    down. The source must refuse loudly instead."""
    import pytest

    from nifi_processors_spark.config import EngineConfig
    from nifi_processors_spark.sources.binlog import read_binlog_stream

    binlog = tmp_path / "binlog"
    ckpt = tmp_path / "ckpt"
    binlog.mkdir()
    (ckpt / "offsets").mkdir(parents=True)
    (ckpt / "offsets" / "0").write_text("{}")
    cfg = EngineConfig(
        binlog_dir=str(binlog),
        table_path=str(tmp_path / "table"),
        checkpoint_dir=str(ckpt),
        source_id="s",
        initial_position="latest",
    )
    with pytest.raises(RuntimeError, match="refusing"):
        read_binlog_stream(spark, cfg)


def test_hint_derived_upsert_count_is_flagged_estimate(
    spark, tmp_table_path
):
    """ADVICE r2 (low): when the bulk path is chosen via
    upper_rows_hint (raw pre-validation rows), n_upserts is an upper
    bound — stats must say so, so the rate limiter can pace on the
    true applied count."""
    from nifi_processors_spark.schema import (
        KEY_COLS, LWW_COLS, TRANSCRIPTS_SCHEMA,
    )
    from nifi_processors_spark.synth import SynthSpec, generate_events
    from nifi_processors_spark.table import TransactionalTable

    ev = generate_events(
        SynthSpec(n_conversations=40, turns_per_conv=4, n_shards=2, seed=3)
    )
    df = spark.createDataFrame(ev.drop(columns=["arrival_idx"]))
    t = TransactionalTable.create(
        spark, tmp_table_path, TRANSCRIPTS_SCHEMA, KEY_COLS, LWW_COLS,
        n_buckets=4,
    )
    st = t.merge(
        df, "s", 0, broadcast_threshold=10, upper_rows_hint=1_000_000
    )
    assert st["n_upserts_estimated"] is True
    assert st["n_upserts"] == 1_000_000  # the documented upper bound
    st2 = t.merge(df, "s", 1)
    assert st2["n_upserts_estimated"] is False
    assert st2["n_upserts"] == len(ev)


def test_media_codecs_roundtrip_and_detect_layout():
    """Real (library-free) codecs: PPM/BMP/WAV roundtrip exactly, and
    the BMP decoder undoes BGR + bottom-up + row padding (an image
    asymmetric in both axes distinguishes every layout mistake)."""
    import numpy as np

    from nifi_processors_spark.operators.multimodal import (
        _synth_audio, _synth_image, decode_bmp, decode_ppm, decode_wav,
        encode_bmp, encode_ppm, encode_wav,
    )

    for d in (0, 2, 6, 10, 98, 498):
        img = _synth_image(d)
        assert np.array_equal(decode_ppm(encode_ppm(img)), img)
        assert np.array_equal(decode_bmp(encode_bmp(img)), img)
    for d in (1, 3, 63, 499):
        s = _synth_audio(d)
        out, rate = decode_wav(encode_wav(s, 8000))
        assert rate == 8000 and np.array_equal(out, s)

    # an odd-width image forces nonzero BMP row padding; asymmetric
    # content means flipped rows / kept-BGR would differ at [0,0]
    img = np.arange(5 * 3 * 3, dtype=np.uint8).reshape(3, 5, 3)
    assert (5 * 3) % 4 != 0
    assert np.array_equal(decode_bmp(encode_bmp(img)), img)


def test_zero_row_oracles_now_discriminate(spark):
    """Round-2 VERDICT "What's wrong" #3: doc_ngram_jaccard and
    q22_no_order_customers returned zero rows at every scale, passing
    vacuously. Both must produce rows at sf0.001 (test_entry verifies
    the values still match the oracle)."""
    for name in ("doc_ngram_jaccard", "q22_no_order_customers"):
        fn = sql_queries.QUERIES[name][0]
        assert fn(spark, SF_DIR).count() > 0, name
