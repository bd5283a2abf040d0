"""Deterministic synthetic binlog generator + single-threaded oracle.

Produces the change-event stream described in FIXTURES.md §2-3: N shard
streams with per-shard monotone ``seq`` (≙ Kinesis shard + sequence
number, GetKinesisStream.java:312-313), insert/update/delete mix,
exact-duplicate redelivery (at-least-once, GET:281-296), out-of-order
event time, ts ties broken by seq, Zipf-hot conversations, and a
schema-evolution cut-over after which the ``tool`` column appears.

Everything is seeded numpy — no external data, identical output for
identical specs. Generation is vectorized so bench-scale (~10^7
events) synthesis stays cheap.
"""

from __future__ import annotations

import hashlib
import os
from dataclasses import dataclass, replace

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

_WORDS = np.array(
    (
        "the quick brown fox jumps over lazy dog stream merge batch "
        "window shard checkpoint replay table scan filter join order "
        "agg spark vector column row data key value query plan commit "
        "offset lineage metric salt skew bucket snapshot schema tool"
    ).split()
)

_ROLES = np.array(["user", "assistant", "tool", "system"])
_TOOLS = np.array(["search", "calculator", "browser", "python", "none"])

#: epoch seconds of 2024-01-01T00:00:00Z — fixed time origin so the
#: generator is fully deterministic (no wall-clock dependence).
_T0 = 1_704_067_200


@dataclass(frozen=True)
class SynthSpec:
    """Scale knobs per FIXTURES.md §5."""

    n_conversations: int = 200
    turns_per_conv: int = 8
    n_shards: int = 4
    update_ratio: float = 0.4  # updates per base insert
    delete_ratio: float = 0.05  # deletes per base insert
    reinsert_ratio: float = 0.4  # of deleted keys later re-inserted
    dup_ratio: float = 0.08  # exact redelivered copies
    hot_key_frac: float = 0.0  # extra updates concentrated on conv 0
    ooo_jitter_s: int = 120  # event-time jitter vs arrival order
    tie_ratio: float = 0.02  # updates sharing an exact ts (seq breaks)
    payload_words: int = 12
    evolution_cutover: float = 0.5  # arrival fraction before which tool is absent
    segments_per_shard: int = 4
    seed: int = 42

    @property
    def n_base(self) -> int:
        return self.n_conversations * self.turns_per_conv


def _stable_shard(conv_ids: np.ndarray, n_shards: int) -> np.ndarray:
    """Stable key→shard assignment (md5-based), ≙ Kinesis partition-key
    hashing: all events of a conversation land on one shard, so
    per-shard ordering gives per-key ordering."""
    uniq, inv = np.unique(conv_ids, return_inverse=True)
    shards = np.array(
        [
            int.from_bytes(hashlib.md5(c.encode()).digest()[:4], "big") % n_shards
            for c in uniq
        ],
        dtype=np.int32,
    )
    return shards[inv]


def _payload_text(conv: np.ndarray, turn: np.ndarray, ver: np.ndarray, n_words: int) -> np.ndarray:
    """Deterministic per-(key, version) text. The version prefix makes
    LWW winners observable; the filler makes payloads realistically
    sized. Vectorized string build."""
    base = np.char.add(
        np.char.add(
            np.char.add("c", conv.astype("U10")),
            np.char.add("-t", turn.astype("U6")),
        ),
        np.char.add("-v", ver.astype("U6")),
    )
    mix = (conv * 2654435761 + turn * 40503 + ver * 97) & 0x7FFFFFFF
    # filler drawn from a small precomputed pool (deterministic in the
    # mix) — one indexed gather instead of n_words char-adds over the
    # whole column, which dominates generation time at 10^7 events
    pool_n = 4096
    pool = np.array(
        [
            " " + " ".join(
                _WORDS[(p + i * 131) % len(_WORDS)] for i in range(n_words)
            )
            for p in range(pool_n)
        ]
    )
    return np.char.add(base, pool[mix % pool_n])


def generate_events(spec: SynthSpec) -> pd.DataFrame:
    """Generate the full change-event log, in arrival order, with
    shard/seq assigned. Columns = CHANGE_EVENTS_SCHEMA plus an
    ``arrival_idx`` ordinal used for segment slicing."""
    rng = np.random.default_rng(spec.seed)
    n_base = spec.n_base

    conv = np.repeat(np.arange(spec.n_conversations), spec.turns_per_conv)
    turn = np.tile(np.arange(spec.turns_per_conv), spec.n_conversations)

    parts: list[pd.DataFrame] = []

    def mk(op, c, t, ver, t_order):
        n = len(c)
        df = pd.DataFrame(
            {
                "op": np.full(n, op),
                "_c": c.astype(np.int64),
                "turn_idx": t.astype(np.int32),
                "_ver": ver.astype(np.int64),
                "_torder": t_order.astype(np.float64),
            }
        )
        return df

    # base inserts: one per (conv, turn), event time increases with turn
    base_order = rng.permutation(n_base).astype(np.float64)
    parts.append(mk("I", conv, turn, np.zeros(n_base), base_order))

    # updates: random keys, versions 1..k, later event times
    n_upd = int(spec.update_ratio * n_base)
    if n_upd:
        ki = rng.integers(0, n_base, n_upd)
        ver = rng.integers(1, 4, n_upd)
        parts.append(mk("U", conv[ki], turn[ki], ver, n_base + ver * n_base + base_order[ki]))

    # hot-key skew: extra updates all on conversation 0 (FIXTURES hot_key_skew)
    n_hot = int(spec.hot_key_frac * n_base)
    if n_hot:
        t = rng.integers(0, spec.turns_per_conv, n_hot)
        ver = rng.integers(4, 9, n_hot)
        parts.append(
            mk("U", np.zeros(n_hot, dtype=np.int64), t, ver, 6 * n_base + rng.random(n_hot) * n_base)
        )

    # deletes + partial re-inserts (FIXTURES deletes scenario)
    n_del = int(spec.delete_ratio * n_base)
    if n_del:
        ki = rng.choice(n_base, size=n_del, replace=False)
        parts.append(mk("D", conv[ki], turn[ki], np.full(n_del, 9), 10 * n_base + base_order[ki]))
        n_re = int(spec.reinsert_ratio * n_del)
        if n_re:
            parts.append(
                mk("I", conv[ki[:n_re]], turn[ki[:n_re]], np.full(n_re, 10), 12 * n_base + base_order[ki[:n_re]])
            )

    ev = pd.concat(parts, ignore_index=True)

    # out-of-order event time: jitter _torder BEFORE tie cloning so a
    # cloned tie keeps the exact same ts as its source row
    ev["_torder"] = ev["_torder"] + rng.integers(
        -spec.ooo_jitter_s, spec.ooo_jitter_s + 1, len(ev)
    )

    # ts ties broken by seq: clone some update rows with same _torder
    # (⇒ same ts) but a later arrival ⇒ higher seq and bumped version.
    n_tie = int(spec.tie_ratio * len(ev))
    if n_tie:
        src = ev[ev["op"] == "U"]
        if len(src):
            tie = src.sample(n=min(n_tie, len(src)), random_state=spec.seed).copy()
            tie["_ver"] = tie["_ver"] + 100  # distinct payload, same ts
            ev = pd.concat([ev, tie], ignore_index=True)

    # arrival order: mostly creation order with jitter (out-of-order
    # event-time vs arrival is induced by _torder jitter below)
    arrival = np.argsort(
        np.arange(len(ev)) + rng.normal(0, max(1.0, len(ev) * 0.01), len(ev))
    )
    ev = ev.iloc[arrival].reset_index(drop=True)

    # event time: _torder seconds after T0 (jitter already applied)
    ts_s = (_T0 + ev["_torder"].to_numpy()).astype(np.int64)
    ev["ts"] = pd.to_datetime(ts_s, unit="s", utc=True).tz_localize(None)

    # payload
    c = ev["_c"].to_numpy()
    t = ev["turn_idx"].to_numpy().astype(np.int64)
    v = ev["_ver"].to_numpy()
    # %06d, NOT np.char.zfill: zfill's output dtype is capped at the
    # requested width and silently TRUNCATES longer values — at >1M
    # conversations the 7-digit indices folded onto 6-digit ones,
    # collapsing distinct keys (found at 2M-conv scaling runs). %06d
    # pads short values identically and never truncates.
    ev["conv_id"] = np.char.add("conv-", np.char.mod("%06d", c))
    ev["role"] = _ROLES[(t % len(_ROLES))]
    ev["text"] = _payload_text(c, t, v, spec.payload_words)
    tool_vals = _TOOLS[(c + t + v) % len(_TOOLS)]
    ev["tool"] = np.where(tool_vals == "none", None, tool_vals)

    # schema-evolution cut-over: events arriving before the cut-over
    # predate the ``tool`` column's existence — their tool is null in
    # the log AND in the oracle. Applied before duplication so a
    # redelivered copy is an exact copy.
    cutover = int(spec.evolution_cutover * len(ev))
    ev.loc[ev.index[:cutover], "tool"] = None

    # shard assignment (key-stable) + per-shard monotone seq in arrival order
    ev["shard"] = _stable_shard(ev["conv_id"].to_numpy(), spec.n_shards)
    ev["seq"] = ev.groupby("shard").cumcount().astype(np.int64)

    # exact-duplicate redelivery: copies keep their ORIGINAL seq and
    # payload and reappear later in the same shard's stream (replay
    # overlap, ≙ at-least-once GET:281-296)
    n_dup = int(spec.dup_ratio * len(ev))
    if n_dup:
        dup = ev.sample(n=n_dup, random_state=spec.seed + 1).copy()
        ev = pd.concat([ev, dup], ignore_index=True)
        # re-sort so duplicates arrive after their originals per shard
        ev["_ord"] = np.arange(len(ev))
        ev = ev.sort_values(["_ord"]).reset_index(drop=True)
        ev = ev.drop(columns=["_ord"])

    ev["arrival_idx"] = np.arange(len(ev), dtype=np.int64)
    ev["arrival_ts"] = pd.to_datetime(
        _T0 + 20 * spec.n_base + ev["arrival_idx"].to_numpy() // 100, unit="s", utc=True
    ).tz_localize(None)

    cols = [
        "op", "conv_id", "turn_idx", "role", "text", "tool",
        "ts", "seq", "shard", "arrival_ts", "arrival_idx",
    ]
    return ev[cols]


def oracle_apply(events: pd.DataFrame) -> pd.DataFrame:
    """Single-threaded reference apply (FIXTURES.md §4): the final
    table is, per (conv_id, turn_idx), the event with max (ts, seq);
    if that winner is a delete the key is absent. Equivalent to a
    sequential fold that accepts an event iff (ts, seq) >= current —
    verified against :func:`oracle_apply_sequential` in tests."""
    w = events.sort_values(["ts", "seq"]).drop_duplicates(
        ["conv_id", "turn_idx"], keep="last"
    )
    w = w[w["op"] != "D"]
    out = w[["conv_id", "turn_idx", "role", "text", "tool", "ts"]]
    return out.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)


def oracle_apply_sequential(events: pd.DataFrame) -> pd.DataFrame:
    """Literal event-at-a-time apply in (shard, seq) order with the
    LWW acceptance rule — O(n) python loop, small fixtures only."""
    state: dict[tuple, tuple] = {}
    for r in events.sort_values(["shard", "seq"]).itertuples(index=False):
        k = (r.conv_id, r.turn_idx)
        cur = state.get(k)
        if cur is not None and (r.ts, r.seq) < (cur[0], cur[1]):
            continue  # stale event loses LWW
        state[k] = (r.ts, r.seq, r.op, r.role, r.text, r.tool)
    rows = [
        {"conv_id": k[0], "turn_idx": k[1], "role": v[3], "text": v[4], "tool": v[5], "ts": v[0]}
        for k, v in state.items()
        if v[2] != "D"
    ]
    out = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"])
    return out.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)


def write_binlog(events: pd.DataFrame, binlog_dir: str, spec: SynthSpec) -> list[str]:
    """Write the event log as per-shard segment files in arrival order.

    Segments whose last event arrives before the evolution cut-over are
    written WITHOUT the ``tool`` column (physical schema evolution
    mid-stream, FIXTURES schema_evolution). File names sort in global
    arrival order so a file-tail source replays faithfully.
    """
    os.makedirs(binlog_dir, exist_ok=True)
    paths = []
    for shard, sdf in events.groupby("shard"):
        segs = np.array_split(np.arange(len(sdf)), spec.segments_per_shard)
        for i, idx in enumerate(segs):
            if len(idx) == 0:
                continue
            seg = sdf.iloc[idx]
            first_arrival = int(seg["arrival_idx"].iloc[0])
            cols = seg.drop(columns=["arrival_idx"]).copy()
            # Spark's TimestampType is microsecond precision; pandas
            # defaults to ns, which Spark's vectorized parquet reader
            # refuses to downcast — write µs on disk.
            for c in ("ts", "arrival_ts"):
                cols[c] = cols[c].astype("datetime64[us]")
            cols["turn_idx"] = cols["turn_idx"].astype("int32")
            cols["shard"] = cols["shard"].astype("int32")
            if cols["tool"].isna().all():
                cols = cols.drop(columns=["tool"])  # pre-evolution shape
            path = os.path.join(
                binlog_dir, f"seg-{first_arrival:010d}-shard{int(shard):03d}-{i:03d}.parquet"
            )
            tbl = pa.Table.from_pandas(cols, preserve_index=False)
            pq.write_table(tbl, path)
            paths.append(path)
    return sorted(paths)


def make_fixture(binlog_dir: str, spec: SynthSpec | None = None, **overrides):
    """One-call fixture: generate, write binlog segments, return
    (events_df, expected_final_table, segment_paths)."""
    spec = replace(spec or SynthSpec(), **overrides)
    events = generate_events(spec)
    paths = write_binlog(events, binlog_dir, spec)
    expected = oracle_apply(events)
    return events, expected, paths
