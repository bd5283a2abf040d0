"""Per-round benchmark harness.

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line: {"metric", "value" (total seconds), "unit": "sec",
"queries": {name: sec}, "sf", plus merge-apply throughput extras}.

The merge-apply stage (cdc_merge_full_replay) is the BASELINE.json
headline metric — its events/sec is reported separately. The
two-parallelism scaling evidence lives in BENCH/scaling.py →
BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from nifi_processors_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "cdc_merge_full_replay",
    "cdc_lww_replay",
    "cdc_validate_route",
    "q1_pricing_summary",
    "q3_top_unshipped",
    "q5_region_revenue",
    "events_sessionize",
    "doc_dedup_minhash_lsh",
    "doc_simhash",
    "emb_cosine_topk",
    "doc_token_stats",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    spark = get_spark("bench", cores=cpus, shuffle_partitions=max(cpus, 16))

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    timings: dict[str, float] = {}
    n_merge_events = 0
    for name in HEADLINE:
        fn = qs[name]
        t0 = time.perf_counter()
        rows = fn(spark, sf_dir).collect()
        timings[name] = round(time.perf_counter() - t0, 3)
        if name == "cdc_merge_full_replay":
            # events replayed = rows of the derived stream (= events table)
            n_merge_events = spark.read.parquet(f"{sf_dir}/events.parquet").count()
        del rows

    total = round(sum(timings.values()), 3)
    merge_sec = timings.get("cdc_merge_full_replay", 0.0)
    out = {
        "metric": "headline query wall time (sf parquet, local mode)",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "cpus": cpus,
        "merge_apply_events": n_merge_events,
        "merge_apply_events_per_sec": round(n_merge_events / merge_sec, 1)
        if merge_sec
        else None,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
