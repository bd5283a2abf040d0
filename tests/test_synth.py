"""Generator invariants + oracle equivalence (FIXTURES.md §3-4)."""

import numpy as np
import pandas as pd

from nifi_processors_spark.synth import (
    SynthSpec,
    generate_events,
    oracle_apply,
    oracle_apply_sequential,
    write_binlog,
)

SMALL = SynthSpec(n_conversations=40, turns_per_conv=5, n_shards=3, seed=7)


def test_deterministic():
    a = generate_events(SMALL)
    b = generate_events(SMALL)
    pd.testing.assert_frame_equal(a, b)


def test_per_shard_seq_monotone_modulo_redelivery():
    ev = generate_events(SMALL)
    # dropping redelivered duplicates, seq is strictly monotone per shard
    first = ev.drop_duplicates(["shard", "seq"], keep="first")
    for _, s in first.groupby("shard"):
        seqs = s.sort_values("arrival_idx")["seq"].to_numpy()
        assert (np.diff(seqs) > 0).all()


def test_key_stable_sharding():
    # all events of a conversation live on one shard (≙ partition key)
    ev = generate_events(SMALL)
    assert (ev.groupby("conv_id")["shard"].nunique() == 1).all()


def test_contains_all_op_types_dups_and_ties():
    ev = generate_events(SMALL)
    assert set(ev["op"]) == {"I", "U", "D"}
    assert ev.duplicated(["shard", "seq"]).any()  # redelivery
    ties = ev.groupby(["conv_id", "turn_idx", "ts"])["seq"].nunique()
    assert (ties > 1).any()  # ts ties broken by seq


def test_oracle_vectorized_equals_sequential():
    ev = generate_events(SMALL)
    a = oracle_apply(ev)
    b = oracle_apply_sequential(ev)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_oracle_order_independence():
    # LWW apply converges from any delivery order (replay-safety)
    ev = generate_events(SMALL)
    shuffled = ev.sample(frac=1.0, random_state=123).reset_index(drop=True)
    pd.testing.assert_frame_equal(oracle_apply(ev), oracle_apply(shuffled))


def test_binlog_schema_evolution_cutover(tmp_path):
    import pyarrow.parquet as pq

    ev = generate_events(SMALL)
    paths = write_binlog(ev, str(tmp_path / "binlog"), SMALL)
    schemas = [set(pq.read_schema(p).names) for p in paths]
    assert any("tool" not in s for s in schemas)  # pre-cutover shape
    assert any("tool" in s for s in schemas)  # post-cutover shape
