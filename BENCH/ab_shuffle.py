"""A/B harness for the bulk merge's shuffle plan (round-3 VERDICT #1).

The 2→8-core full-pipeline scaling pair sits just under the 0.8 north
rule, and the per-stage event logs name the agg+write stage's shuffled
bytes as the culprit (BENCH/BASELINE.md). This harness measures the
three candidate plans for the bulk LWW dedup on the SAME pre-generated
binlog, pinned with taskset, with per-stage shuffle/input/output bytes
scraped from the Spark UI REST API:

* ``full`` — the product plan: one bucket exchange carrying the full
  payload, fused LWW max_by aggregation, bucketed write.
* ``dict`` — the product plan with ``dict_encode_cols=('role','tool')``:
  low-cardinality strings cross the exchange as int codes.
* ``late`` — late materialization: a pointer pass (keys + LWW columns +
  ``_metadata`` file/row pointers; text never read) resolves winners,
  then a broadcast semi-join fetches ONLY winning payloads, which cross
  the bucket exchange once. The broadcast of O(unique keys) pointers is
  the scale limiter — on a real cluster this becomes a shuffle join and
  the pointer pass is pure overhead; the A/B quantifies whether the
  payload-byte saving can ever pay for it at this duplication factor
  (events/keys ≈ 1.7 → winners ≈ 60% of events must cross the exchange
  regardless: that is the byte floor).

Usage:
    python BENCH/ab_shuffle.py                # all variants at 2 and 8 cores
    python BENCH/ab_shuffle.py --run VARIANT --cores N --binlog DIR
Env: AB_LEVELS=2,8  AB_ATTEMPTS=2  AB_VARIANTS=full,dict,late
     SCALING_CONVS picks the cached binlog (BENCH/scaling.py layout).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import subprocess
import sys
import tempfile
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_CONVS = int(os.environ.get("SCALING_CONVS", "1000000"))
LEVELS = tuple(int(x) for x in os.environ.get("AB_LEVELS", "2,8").split(","))
ATTEMPTS = int(os.environ.get("AB_ATTEMPTS", "2"))
VARIANTS = os.environ.get("AB_VARIANTS", "full,dict,late").split(",")
N_BUCKETS = 64


def _spark(cores: int, name: str):
    from nifi_processors_spark.session import get_spark

    work = tempfile.mkdtemp(prefix=f"ab-{name}-", dir="/dev/shm")
    conf = {
        "spark.local.dir": os.path.join(work, "spark-local"),
        "spark.driver.memory": "48g",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16m",
        "spark.io.compression.codec": "zstd",
        "spark.sql.parquet.compression.codec": "zstd",
        "spark.sql.files.maxPartitionBytes": "32m",
        "spark.memory.offHeap.enabled": "true",
        "spark.memory.offHeap.size": "16g",
        "spark.sql.sources.parallelPartitionDiscovery.threshold": "1024",
        "spark.ui.enabled": "true",  # REST metrics scrape
    }
    return get_spark(name, cores=cores, shuffle_partitions=cores * 2,
                     extra_conf=conf), work


def _ui_totals(spark) -> dict:
    """Aggregate per-stage bytes from the UI REST API."""
    ui = spark.sparkContext.uiWebUrl
    apps = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications"))
    app = apps[0]["id"]
    stages = json.load(
        urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/stages")
    )
    mb = 1e6
    return {
        "shuffle_write_mb": round(
            sum(s.get("shuffleWriteBytes", 0) for s in stages) / mb, 1
        ),
        "input_mb": round(sum(s.get("inputBytes", 0) for s in stages) / mb, 1),
        "output_mb": round(sum(s.get("outputBytes", 0) for s in stages) / mb, 1),
    }


def run_variant(variant: str, cores: int, binlog_dir: str) -> dict:
    from pyspark.sql import functions as F

    from nifi_processors_spark.schema import (
        CHANGE_EVENTS_SCHEMA, KEY_COLS, LWW_COLS, TRANSCRIPTS_SCHEMA,
    )
    from nifi_processors_spark.table import TransactionalTable

    spark, work = _spark(cores, f"{variant}-{cores}")
    segs = sorted(glob.glob(os.path.join(binlog_dir, "seg-*.parquet")))
    df = spark.read.schema(CHANGE_EVENTS_SCHEMA).parquet(*segs)
    t0 = time.perf_counter()
    if variant in ("full", "dict"):
        t = TransactionalTable.create(
            spark, os.path.join(work, "t"), TRANSCRIPTS_SCHEMA, KEY_COLS,
            LWW_COLS, n_buckets=N_BUCKETS,
        )
        t.merge(
            df, "s", 0, broadcast_threshold=300_000,
            dict_encode_cols=("role", "tool") if variant == "dict" else None,
        )
        rows = t.read().count()
    elif variant == "late":
        payload = [f.name for f in TRANSCRIPTS_SCHEMA.fields]
        meta = df.select(
            "*",
            F.xxhash64(F.col("_metadata.file_path")).alias("_fid"),
            F.col("_metadata.row_index").alias("_rix"),
        )
        # pointer pass: text/role/tool never read (column pruning), the
        # agg exchange carries ~60-byte rows instead of full payloads
        win = (
            meta.select("conv_id", "turn_idx", "ts", "seq", "_fid", "_rix")
            .groupBy("conv_id", "turn_idx")
            .agg(F.expr("max_by(struct(_fid, _rix), struct(ts, seq))").alias("w"))
            .select(F.col("w._fid").alias("_fid"), F.col("w._rix").alias("_rix"))
        )
        bucket = F.pmod(
            F.xxhash64(F.col("conv_id"), F.col("turn_idx").cast("long")),
            F.lit(N_BUCKETS),
        ).cast("int")
        fetched = (
            meta.join(F.broadcast(win), ["_fid", "_rix"], "left_semi")
            .withColumn("_bucket", bucket)
            .withColumn("_seq", F.col("seq").cast("long"))
            .withColumn("_deleted", F.col("op") == F.lit("D"))
            .select("_bucket", *payload, "_seq", "_deleted")
        )
        out_dir = os.path.join(work, "t", "data", "commit-000000000001-late")
        (
            fetched.repartition(N_BUCKETS, "_bucket")
            .write.partitionBy("_bucket").mode("errorifexists").parquet(out_dir)
        )
        rows = (
            spark.read.parquet(out_dir).filter("_deleted = false").count()
        )
    else:
        raise SystemExit(f"unknown variant {variant}")
    elapsed = time.perf_counter() - t0
    res = {
        "variant": variant,
        "cores": cores,
        "seconds": round(elapsed, 2),
        "final_rows": rows,
        **_ui_totals(spark),
    }
    spark.stop()
    return res


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--run", default=None)
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--binlog", default=None)
    args = ap.parse_args()
    if args.run:
        print(json.dumps(run_variant(args.run, args.cores, args.binlog)))
        return

    binlog_dir = os.path.join(tempfile.gettempdir(), f"scaling-binlog-{N_CONVS}")
    marker = os.path.join(binlog_dir, ".complete")
    if not os.path.exists(marker):
        raise SystemExit(
            f"no cached binlog at {binlog_dir}; run BENCH/scaling.py first"
        )
    n_events = int(open(marker).read().split()[0])
    print(f"binlog: {n_events} events at {binlog_dir}", file=sys.stderr)

    results = []
    for variant in VARIANTS:
        for cores in LEVELS:
            cmd = [sys.executable, os.path.abspath(__file__), "--run", variant,
                   "--cores", str(cores), "--binlog", binlog_dir]
            if os.path.exists("/usr/bin/taskset"):
                cmd = ["taskset", "-c", f"0-{cores - 1}"] + cmd
            best = None
            for _ in range(ATTEMPTS):
                out = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO)
                line = out.stdout.strip().splitlines()[-1] if out.stdout.strip() else ""
                if not line.startswith("{"):
                    print(out.stderr[-2000:], file=sys.stderr)
                    raise SystemExit(f"variant {variant}@{cores} failed")
                r = json.loads(line)
                r["events_per_sec"] = round(n_events / r["seconds"], 1)
                print(json.dumps(r), file=sys.stderr)
                if best is None or r["seconds"] < best["seconds"]:
                    best = r
            results.append(best)

    pairs = {}
    for variant in VARIANTS:
        by_cores = {r["cores"]: r for r in results if r["variant"] == variant}
        if len(LEVELS) == 2 and all(c in by_cores for c in LEVELS):
            lo, hi = sorted(LEVELS)
            eff = by_cores[hi]["events_per_sec"] / (
                (hi // lo) * by_cores[lo]["events_per_sec"]
            )
            pairs[variant] = round(eff, 3)
    summary = {"events": n_events, "results": results, "pair_efficiency": pairs}
    print(json.dumps(summary))
    with open(os.path.join(REPO, "BENCH", "ab_shuffle_last.json"), "w") as f:
        json.dump(summary, f, indent=1)


if __name__ == "__main__":
    main()
