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
