"""Round-6 optimization measurement harness (bench.py is FROZEN — this
file holds the extra measurements the optimization round needs).

Times individual declared queries with the noop sink (guide §1.4) so
the computation is measured without the collect-to-driver cost, and
optionally dumps ``.explain("formatted")`` for each to plans/r06/.

Usage:
  python bench_extra.py [query ...]            # time queries (noop sink)
  BENCH_X_SF_DIR=/root/sf1local python bench_extra.py emb_cosine_topk
  BENCH_X_EXPLAIN=plans/r06 BENCH_X_SUFFIX=_before python bench_extra.py q1_pricing_summary

Env:
  BENCH_X_SF_DIR    data dir (default $SPARK_GRAFT_SF_DIR or sf0.1)
  BENCH_X_ATTEMPTS  attempts per query (default 3, min reported)
  BENCH_X_EXPLAIN   if set, write '<query><suffix>.txt' plan files there
  BENCH_X_SUFFIX    plan file suffix (default '_before')
  BENCH_X_COLLECT   '1' → use .collect() like the frozen bench instead
                    of the noop sink (to compare like-for-like)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from nifi_processors_spark.session import get_spark  # noqa: E402

DEFAULT = [
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
    sf_dir = os.environ.get(
        "BENCH_X_SF_DIR",
        os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    attempts = int(os.environ.get("BENCH_X_ATTEMPTS", "3"))
    explain_dir = os.environ.get("BENCH_X_EXPLAIN")
    suffix = os.environ.get("BENCH_X_SUFFIX", "_before")
    use_collect = os.environ.get("BENCH_X_COLLECT") == "1"
    names = sys.argv[1:] or DEFAULT

    spark = get_spark("bench_extra", cores=cpus, shuffle_partitions=max(cpus, 16))

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    out: dict[str, object] = {"sf_dir": sf_dir, "attempts": attempts}
    walls: dict[str, list[float]] = {}
    for name in names:
        fn = qs[name]
        if explain_dir:
            from nifi_processors_spark.plans.explain import plan_str

            os.makedirs(explain_dir, exist_ok=True)
            df = fn(spark, sf_dir)
            with open(os.path.join(explain_dir, f"{name}{suffix}.txt"), "w") as f:
                f.write(plan_str(df, "formatted"))
        walls[name] = []
        for i in range(attempts):
            spark.sparkContext.setJobDescription(f"{name} attempt {i}")
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            if use_collect:
                df.collect()
            else:
                df.write.format("noop").mode("overwrite").save()
            walls[name].append(round(time.perf_counter() - t0, 3))
        spark.sparkContext.setJobDescription(None)
    out["walls"] = walls
    out["min"] = {k: min(v) for k, v in walls.items()}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
