"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes every implemented operator from SURVEY.md §2
plus the training-data-pipeline operators (dedup family, similarity
search, text analysis); ``oracle_sql()`` gives the DuckDB-equivalent
SQL for each. Spark-side and oracle-side are rendered from shared
two-dialect templates (nifi_processors_spark/plans/) so semantics
cannot drift; all float outputs are rounded and timestamps exported as
epoch micros so the driver's value-hash is stable across engines.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from nifi_processors_spark.plans import cdc_queries, sql_queries  # noqa: E402

_ALL = {}
_ALL.update(cdc_queries.QUERIES)
_ALL.update(sql_queries.QUERIES)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full CDC replay through the merge engine on sf0.001 —
    derive a change-event stream, apply it in incremental batches via
    the transactional LWW MERGE, return the final table state."""
    return cdc_queries.cdc_merge_full_replay(spark, "/root/testdata/sf0.001")


def _drain_then(fn: Callable[[SparkSession, str], DataFrame]):
    """Release the previous staged query's pinned intermediates before
    building the next query: by the time the harness invokes the next
    callable it has materialized the previous result, so the pins are
    dead weight in storage memory. The registry ends with non-staged
    relational queries, so a full pass leaves getPersistentRDDs()
    empty (round-3 VERDICT "What's wrong" #1)."""

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        sql_queries.release_caches()
        return fn(spark, sf_dir)

    return run


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator (SURVEY.md §2 / build brief).

    Aliasing rule: every computed column is aliased identically in the
    Spark plan and the oracle SQL.
    """
    return {name: _drain_then(fn) for name, (fn, _oracle) in _ALL.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (tables pre-registered as views)."""
    return {name: oracle for name, (_fn, oracle) in _ALL.items() if oracle}
