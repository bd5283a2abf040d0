"""Custom stateful streaming operator via ``applyInPandasWithState``.

The reference keeps exactly one piece of per-shard state (the
checkpoint position, SURVEY.md §2.5); Structured Streaming's built-in
operators cover everything the CDC pipeline itself needs. This module
is the engine's exemplar for the cases built-ins can't express (the
build brief's ``applyInPandasWithState`` custom stateful operator):
per-conversation running progress maintained ACROSS micro-batches —
the streaming analogue of a per-key accumulator with explicit,
bounded, checkpointed state.

Scale notes: state is one tiny tuple per conv_id (bounded by live-key
cardinality, checkpointed by Structured Streaming); each micro-batch
touches only the groups present in the batch; the group-by shuffles
once per batch on the state key — identical distribution to the merge
bucket shuffle, so no extra skew surface.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

#: cumulative per-conversation progress emitted each micro-batch
PROGRESS_OUT_SCHEMA = (
    "conv_id string, n_events long, max_seq long, max_ts_us long"
)
#: the checkpointed state tuple
PROGRESS_STATE_SCHEMA = "n long, mx long, ts_us long"


def _fold_progress(
    n: int, mx: int | None, ts_us: int | None, pdf: pd.DataFrame
) -> tuple[int, int | None, int | None]:
    """Fold one micro-batch slice into the (n, max_seq, max_ts_us)
    state tuple. Timestamp conversion is resolution-independent:
    Arrow may hand datetime64[ns] OR datetime64[us] depending on the
    pandas/Arrow configuration, and a bare ``.astype('int64')`` would
    be off by 1000× on µs input — normalize to µs explicitly."""
    n += len(pdf)
    bmx = int(pdf["seq"].max())
    mx = bmx if mx is None else max(mx, bmx)
    bts = int(
        pd.to_datetime(pdf["ts"]).astype("datetime64[us]").astype("int64").max()
    )
    ts_us = bts if ts_us is None else max(ts_us, bts)
    return n, mx, ts_us


def conversation_progress(stream: DataFrame) -> DataFrame:
    """Running (event count, high-water seq, max event-time) per
    conversation, updated each micro-batch from explicit group state.

    All three fields are monotone per key, so the operator's converged
    output equals the batch aggregate ``groupBy(conv_id).agg(count,
    max(seq), max(ts))`` — which is exactly how it is oracle-checked.
    """

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n, mx, ts_us = state.get if state.exists else (0, None, None)
        for pdf in pdfs:
            if pdf.empty:
                continue
            n, mx, ts_us = _fold_progress(n, mx, ts_us, pdf)
        state.update((n, mx, ts_us))
        yield pd.DataFrame(
            [{"conv_id": key[0], "n_events": n, "max_seq": mx, "max_ts_us": ts_us}]
        )

    return stream.groupBy("conv_id").applyInPandasWithState(
        update,
        PROGRESS_OUT_SCHEMA,
        PROGRESS_STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )
