"""Physical-plan inspection helpers.

Used by tests to assert the plans we ship are the plans we want:
filters pushed to the parquet scan, column-pruned read schemas,
broadcast joins where a side is small, no stray exchanges in the
copy-on-write merge path, whole-stage codegen over the hot
expressions. (`.explain` hygiene — the difference between "passed at
sf0.01" and "survives 100×".)
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import DataFrame


def plan_str(df: DataFrame, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across the plan's scans."""
    out = []
    for line in plan_str(df).splitlines():
        line = line.strip()
        if line.startswith("PushedFilters:"):
            inner = line.split(":", 1)[1].strip().strip("[]")
            if inner:
                out.extend(p.strip() for p in inner.split(","))
    return out


def read_schemas(df: DataFrame) -> list[str]:
    return [
        line.strip().split(":", 1)[1].strip()
        for line in plan_str(df).splitlines()
        if line.strip().startswith("ReadSchema:")
    ]


def count_exchanges(df: DataFrame) -> int:
    """Shuffle exchanges only — broadcast exchanges move the SMALL side
    and are exactly what we want instead of a shuffle."""
    s = plan_str(df, "simple")
    return s.count("Exchange") - s.count("BroadcastExchange")


def has_broadcast_join(df: DataFrame) -> bool:
    s = plan_str(df, "simple")
    return "BroadcastHashJoin" in s or "BroadcastNestedLoopJoin" in s


def codegen_stages(df: DataFrame, execute: bool = True) -> int:
    """Count whole-stage-codegen subtrees. Under AQE the final plan
    only exists after execution, so by default the frame is executed
    first (cheap for test-scale inputs)."""
    import re

    s = plan_str(df, "codegen")
    m = re.search(r"Found (\d+) WholeStageCodegen", s)
    n = int(m.group(1)) if m else 0
    if n == 0 and execute and "AdaptiveSparkPlan" in plan_str(df, "simple"):
        df.collect()  # finalize the adaptive plan (test-scale frames)
        final = str(df._jdf.queryExecution().executedPlan())
        n = len(set(re.findall(r"\*\((\d+)\)", final)))
    return n
