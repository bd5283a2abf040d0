"""Property-based correctness: random event sequences, random batch
splits, random delivery orders — the merged table must always equal
the single-threaded oracle. (The reference has no property tests,
SURVEY.md §5; the LWW-convergence claim deserves them.)"""

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from nifi_processors_spark.schema import KEY_COLS, LWW_COLS, TRANSCRIPTS_SCHEMA
from nifi_processors_spark.synth import oracle_apply, oracle_apply_sequential
from nifi_processors_spark.table import TransactionalTable


@st.composite
def event_logs(draw):
    n = draw(st.integers(5, 60))
    rows = []
    for i in range(n):
        conv = draw(st.integers(0, 4))
        rows.append(
            {
                "op": draw(st.sampled_from(["I", "U", "U", "D"])),
                "conv_id": f"c{conv}",
                "turn_idx": draw(st.integers(0, 3)),
                "role": "user",
                "text": f"v{draw(st.integers(0, 9))}",
                "tool": draw(st.sampled_from([None, "search"])),
                # coarse ts pool → frequent exact ties (seq must break)
                "ts": pd.Timestamp("2024-01-01") + pd.Timedelta(seconds=draw(st.integers(0, 5))),
                "seq": i,
                "shard": conv % 2,
                "arrival_ts": pd.Timestamp("2024-01-02"),
            }
        )
    return pd.DataFrame(rows)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(
    ev=event_logs(),
    split=st.integers(1, 59),
    swap=st.booleans(),
    mor=st.booleans(),
)
def test_merge_always_equals_oracle(spark, tmp_path_factory, ev, split, swap, mor):
    """Both write strategies fuzzed against the oracle: copy-on-write
    resolves at merge time, merge-on-read at read time (plus a final
    compaction check)."""
    exp = oracle_apply(ev)
    # vectorized oracle == literal sequential apply (oracle self-check)
    pd.testing.assert_frame_equal(
        exp, oracle_apply_sequential(ev), check_dtype=False
    )
    path = str(tmp_path_factory.mktemp("prop") / "t")
    t = TransactionalTable.create(
        spark, path, TRANSCRIPTS_SCHEMA, KEY_COLS, LWW_COLS, n_buckets=4,
        merge_strategy="merge-on-read" if mor else "copy-on-write",
    )
    split = min(split, len(ev))
    parts = [ev.iloc[:split], ev.iloc[split:]]
    if swap:  # adversarial delivery order across batches
        parts.reverse()
    for i, part in enumerate(parts):
        if len(part):
            t.merge(spark.createDataFrame(part), "prop", i)

    def state():
        return (
            t.read()
            .orderBy("conv_id", "turn_idx")
            .toPandas()[["conv_id", "turn_idx", "role", "text", "tool", "ts"]]
            .reset_index(drop=True)
        )

    pd.testing.assert_frame_equal(state(), exp.reset_index(drop=True), check_dtype=False)
    if mor:
        t.compact(drop_tombstones=True)
        pd.testing.assert_frame_equal(
            state(), exp.reset_index(drop=True), check_dtype=False
        )


# --------------------------------------------------------------------------
# codec round-trips (round 4): pure functions, no Spark — hypothesis
# hammers the byte-layout edges (row padding, filter choice, frame
# boundaries) far harder than the fixed synthetic corpus
# --------------------------------------------------------------------------

import numpy as np
from hypothesis import given as _given, settings as _settings
from hypothesis import strategies as _st


@_settings(max_examples=40, deadline=None)
@_given(
    h=_st.integers(1, 24), w=_st.integers(1, 24),
    seed=_st.integers(0, 2**31 - 1),
)
def test_png_bmp_roundtrip_property(h, w, seed):
    from nifi_processors_spark.operators.multimodal import (
        decode_bmp, decode_png, encode_bmp, encode_png,
    )

    img = np.random.RandomState(seed).randint(0, 256, (h, w, 3), dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(img)), img)
    assert np.array_equal(decode_bmp(encode_bmp(img)), img)


@_settings(max_examples=25, deadline=None)
@_given(
    n=_st.integers(1, 6), h=_st.integers(1, 12), w=_st.integers(1, 12),
    fps=_st.integers(1, 30), seed=_st.integers(0, 2**31 - 1),
)
def test_y4m_roundtrip_property(n, h, w, fps, seed):
    from nifi_processors_spark.operators.multimodal import (
        decode_y4m, encode_y4m,
    )

    rng = np.random.RandomState(seed)
    y, u, v = (rng.randint(0, 256, (n, h, w), dtype=np.uint8) for _ in range(3))
    y2, u2, v2, fps2 = decode_y4m(encode_y4m(y, u, v, fps=fps))
    assert fps2 == fps
    assert np.array_equal(y, y2) and np.array_equal(u, u2) and np.array_equal(v, v2)


@_settings(max_examples=20, deadline=None)
@_given(
    n=_st.integers(1, 200), rate=_st.sampled_from([8000, 16000, 44100]),
    seed=_st.integers(0, 2**31 - 1),
)
def test_wav_roundtrip_property(n, rate, seed):
    from nifi_processors_spark.operators.multimodal import (
        decode_wav, encode_wav,
    )

    s = np.random.RandomState(seed).randint(-32768, 32767, n).astype(np.int16)
    s2, rate2 = decode_wav(encode_wav(s, rate))
    assert rate2 == rate and np.array_equal(s, s2)


@_settings(max_examples=20, deadline=None)
@_given(
    h=_st.integers(1, 32), w=_st.integers(1, 32),
    seed=_st.integers(0, 2**31 - 1),
)
def test_jpeg_q100_near_lossless_property(h, w, seed):
    """At quality 100 every quantizer is 1, so arbitrary content —
    including pure noise — must survive within DCT/color rounding; any
    zigzag, Huffman, predictor or block-layout bug blows the bound."""
    from nifi_processors_spark.operators.jpeg import decode_jpeg, encode_jpeg

    img = np.random.RandomState(seed).randint(0, 256, (h, w, 3), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=100))
    assert out.shape == img.shape
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 6
