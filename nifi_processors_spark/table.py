"""TransactionalTable — a from-scratch snapshot/commit-log lake table.

The target of the CDC pipeline. Iceberg-style semantics implemented
directly on parquet + an atomic JSON commit log (no Iceberg jars exist
in this environment; on a real cluster the merge pipeline would target
Iceberg via the same interface — the semantics below are what
`MERGE INTO ... WHEN MATCHED ...` provides there):

* **Atomic commits**: a snapshot is one JSON manifest under ``_log/``;
  committing is a single ``os.link`` (fails if the version exists —
  optimistic concurrency). Readers only ever see a committed manifest.
* **Bucketed layout**: data files are hash-bucketed by the merge key's
  conversation id. A merge touches only the buckets its batch hits —
  file-level pruning that scales with batch key-spread, not table size.
* **LWW MERGE**: per (conv_id, turn_idx), max (ts, seq) wins; deletes
  are LWW tombstones (kept internally, filtered from public reads) so
  replaying events in ANY order converges to the same state — this is
  what makes the pipeline exactly-once under at-least-once redelivery
  (upgrading the reference's checkpoint-then-commit at-least-once,
  GetKinesisStream.java:281-296).
* **Exactly-once watermarks**: per-source high-water batch ids are
  committed in the same manifest as the data, so "applied" and
  "recorded as applied" are one atomic event (C1 in SURVEY.md §2.5).
* **Schema evolution**: manifest schema is unioned-by-name with each
  batch's schema; old files are read with the new schema (missing
  columns → null) — the FlowFile schema-freedom analogue (GET:256-257).
* **Lineage**: per-(batch, shard) lineage rows (≙ provenance receive
  events GET:266-268 + millisBehindLatest GET:314-315) are parquet
  files referenced by the same manifest — atomic with the data.

Scale notes (100 TB / 1000 executors): bucket count is a table
property sized so bucket ≈ a few GB; merges shuffle once on the bucket
key with AQE skew splitting; unaffected buckets are never read or
rewritten; manifests hold per-file stats only (O(files), not O(rows)).
Copy-on-write favors read-heavy transcripts; a merge-on-read delta
layout is the documented alternative for update-dominated streams.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from nifi_processors_spark.schema import (
    LINEAGE_SCHEMA,
    SchemaEvolutionError,
    schema_union,
)

INTERNAL_COLS = ["_seq", "_deleted"]


class ConcurrentCommitError(RuntimeError):
    pass


class TransactionalTable:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        self._log_dir = os.path.join(path, "_log")

    # ------------------------------------------------------------ DDL

    @classmethod
    def create(
        cls,
        spark: SparkSession,
        path: str,
        schema: T.StructType,
        key_cols: list[str],
        lww_cols: list[str] | None = None,
        n_buckets: int = 32,
        bucket_cols: list[str] | None = None,
        merge_strategy: str = "copy-on-write",
    ) -> "TransactionalTable":
        """Create an empty table (v0 manifest). ``bucket_cols``
        defaults to the full key (skew-proof); pass a prefix (e.g.
        ["conv_id"]) to co-locate conversations instead.

        ``merge_strategy``: ``copy-on-write`` rewrites touched buckets
        per merge (read-optimized — steady state for read-heavy
        transcripts); ``merge-on-read`` appends LWW-deduped DELTA
        files per merge (write-optimized — O(batch) with ZERO reads of
        existing data) and resolves winners at read time; ``compact()``
        is the major compaction folding deltas back into base files."""
        if merge_strategy not in ("copy-on-write", "merge-on-read"):
            raise ValueError(f"unknown merge_strategy {merge_strategy!r}")
        t = cls(spark, path)
        os.makedirs(t._log_dir, exist_ok=True)
        if t.current_version() is not None:
            raise FileExistsError(f"table already exists at {path}")
        manifest = {
            "version": 0,
            "schema": schema.json(),
            "key_cols": key_cols,
            "lww_cols": lww_cols or ["ts"],
            "n_buckets": n_buckets,
            "bucket_cols": bucket_cols or list(key_cols),
            # hash integer bucket cols as LONG / floats as DOUBLE from
            # day one (Iceberg's bucket-transform rule): type WIDENING
            # of a key column then never moves keys between buckets
            # (xxhash64 is type-sensitive: hash(int 5) ≠ hash(long 5)).
            # Tables created before this marker keep the legacy raw
            # hash — _bucket_expr must never change for live files.
            "bucket_hash": "widened",
            "merge_strategy": merge_strategy,
            "files": [],
            "lineage_files": [],
            "watermarks": {},
            "parent": None,
            "stats": {},
        }
        t._commit_manifest(manifest)
        return t

    @classmethod
    def exists(cls, spark: SparkSession, path: str) -> bool:
        t = cls(spark, path)
        return t.current_version() is not None

    # ------------------------------------------------------- manifests

    def _manifest_path(self, version: int) -> str:
        return os.path.join(self._log_dir, f"v{version:012d}.json")

    def current_version(self) -> int | None:
        if not os.path.isdir(self._log_dir):
            return None
        versions = [
            int(f[1:-5])
            for f in os.listdir(self._log_dir)
            if f.startswith("v") and f.endswith(".json")
        ]
        return max(versions) if versions else None

    def manifest(self, version: int | None = None) -> dict:
        if version is None:
            version = self.current_version()
            if version is None:
                raise FileNotFoundError(f"no table at {self.path}")
        with open(self._manifest_path(version)) as f:
            return json.load(f)

    def _commit_manifest(self, manifest: dict) -> None:
        """Atomic commit: write tmp, hard-link to the versioned name.
        ``os.link`` raises EEXIST if another writer won the version —
        the caller retries against the new state (optimistic CC)."""
        tmp = os.path.join(self._log_dir, f".tmp-{uuid.uuid4().hex}.json")
        with open(tmp, "w") as f:
            json.dump(manifest, f)
            f.flush()
            os.fsync(f.fileno())
        try:
            os.link(tmp, self._manifest_path(manifest["version"]))
        except FileExistsError as e:
            raise ConcurrentCommitError(
                f"version {manifest['version']} already committed"
            ) from e
        finally:
            os.unlink(tmp)

    # --------------------------------------------------------- schema

    def table_schema(self, version: int | None = None) -> T.StructType:
        return T.StructType.fromJson(json.loads(self.manifest(version)["schema"]))

    def _internal_schema(self, version: int | None = None) -> T.StructType:
        s = self.table_schema(version)
        return T.StructType(
            list(s.fields)
            + [
                T.StructField("_seq", T.LongType(), True),
                T.StructField("_deleted", T.BooleanType(), True),
            ]
        )

    def watermark(self, source_id: str, version: int | None = None) -> int | None:
        wm = self.manifest(version)["watermarks"].get(source_id)
        return None if wm is None else int(wm)

    # ----------------------------------------------------------- read

    def read(
        self,
        version: int | None = None,
        include_internal: bool = False,
        include_deleted: bool = False,
    ) -> DataFrame:
        """Snapshot read (time travel via ``version``). Public shape
        drops internal columns and tombstones."""
        m = self.manifest(version)
        schema = self._internal_schema(version)
        paths = [os.path.join(self.path, f["path"]) for f in m["files"]]
        if not paths:
            df = self.spark.createDataFrame([], schema)
        else:
            # explicit schema ⇒ old (pre-evolution) files yield nulls
            # for later-added columns; passing leaf files disables
            # partition-dir inference so no stray _bucket column.
            df = self.spark.read.schema(schema).parquet(*paths)
        # merge-on-read resolution: when delta files exist, a key may
        # appear in several files — take the LWW winner per key (same
        # (lww_cols, _seq) order as the write path) in one shuffle.
        # Base-only snapshots (copy-on-write, or post-compaction) skip
        # this entirely — reads stay scan-only.
        if any(f.get("delta") for f in m["files"]):
            key_cols = m["key_cols"]
            lww_order = [
                ("_seq" if c == "seq" else c)
                for c in (m.get("lww_cols") or ["ts"])
            ]
            if "_seq" not in lww_order:
                lww_order.append("_seq")
            non_key = [c for c in df.columns if c not in key_cols]
            df = (
                df.groupBy(*key_cols)
                .agg(
                    F.expr(
                        "max_by(struct({cols}), struct({ord}))".format(
                            cols=", ".join(non_key), ord=", ".join(lww_order)
                        )
                    ).alias("_w")
                )
                .select(
                    *key_cols, *[F.col(f"_w.{c}").alias(c) for c in non_key]
                )
            )
        if not include_deleted:
            df = df.filter(~F.col("_deleted"))
        if not include_internal:
            df = df.drop(*INTERNAL_COLS)
        return df

    def read_raw(
        self, buckets: list[int] | set[int] | None = None,
        version: int | None = None,
    ) -> DataFrame:
        """Scan-only snapshot read for INSERT-ONLY tables, optionally
        pruned to a set of bucket ids.

        Skips the merge-on-read LWW resolution shuffle: the caller
        asserts each key was written at most once (true for the
        incremental-dedup index tables, whose rows are immutable —
        merge's per-batch watermark guarantees a redelivered batch
        never lands twice). With ``buckets``, only data files PLACED in
        those buckets are read — the LSH index probe reads O(touched
        buckets) of the corpus, not O(corpus). Files written by the
        unbucketed ``append`` path (bucket = -1) are excluded by any
        pruned read; index tables write through ``merge`` only."""
        m = self.manifest(version)
        schema = self._internal_schema(version)
        files = m["files"]
        if buckets is not None:
            bset = {int(b) for b in buckets}
            files = [f for f in files if f["bucket"] in bset]
        paths = [os.path.join(self.path, f["path"]) for f in files]
        if not paths:
            df = self.spark.createDataFrame([], schema)
        else:
            df = self.spark.read.schema(schema).parquet(*paths)
        return df.filter(~F.col("_deleted")).drop(*INTERNAL_COLS)

    def read_lineage(self) -> DataFrame:
        m = self.manifest()
        paths = [os.path.join(self.path, p) for p in m.get("lineage_files", [])]
        if not paths:
            return self.spark.createDataFrame([], LINEAGE_SCHEMA)
        return self.spark.read.schema(LINEAGE_SCHEMA).parquet(*paths)

    # ---------------------------------------------------------- merge

    def _bucket_expr(self, n_buckets: int, bucket_cols: list[str] | None = None):
        """Stable key→bucket hash. MUST never change for a live table
        (old files were placed with it). xxhash64 is Spark-native and
        JVM-evaluated (whole-stage codegen — no Python in this path).

        Buckets hash the FULL merge key by default: a viral
        conversation's turns then spread across all buckets instead of
        concentrating in one — bucket-level skew is solved structurally
        (the reference's random-partition-key load spreading,
        PutKinesisStream.java:264-269, made deterministic). File
        pruning still works: any batch key hashes to exactly one
        bucket."""
        cols = bucket_cols
        hash_mode, schema = "legacy", None
        try:
            m = self.manifest()
            if cols is None:
                cols = m.get("bucket_cols") or ["conv_id", "turn_idx"]
            hash_mode = m.get("bucket_hash", "legacy")
            schema = T.StructType.fromJson(json.loads(m["schema"]))
        except FileNotFoundError:
            cols = cols or ["conv_id", "turn_idx"]
        exprs = []
        for c in cols:
            e = F.col(c)
            if hash_mode == "widened" and schema is not None:
                tn = next(
                    (f.dataType.typeName() for f in schema.fields if f.name == c),
                    None,
                )
                # canonical hash width per chain: int→long / float→
                # double is value-stable, so widening a key column's
                # type never re-buckets existing files
                if tn in ("byte", "short", "integer", "long"):
                    e = e.cast("long")
                elif tn in ("float", "double"):
                    e = e.cast("double")
            exprs.append(e)
        return F.pmod(F.xxhash64(*exprs), F.lit(n_buckets)).cast("int")

    @staticmethod
    def _read_footer(abs_path: str):
        """One footer read shared by the per-file stat helpers in the
        commit loops (they each accept it as ``md``); None on failure —
        each helper then degrades to its own unavailable-stats path."""
        try:
            import pyarrow.parquet as _pq

            return _pq.read_metadata(abs_path)
        except Exception:
            return None

    @staticmethod
    def _file_key_stats(abs_path: str, key_col: str, md=None):
        """(min, max) of ``key_col`` from the file's parquet footer
        statistics — driver-side, a few ms, no Spark job. Returns
        (None, None) when stats are unavailable (never prune then).
        At cluster scale these stats would be collected executor-side
        during the write (as Iceberg does); the manifest format is the
        same either way. ``md``: a pre-read FileMetaData, so commit
        loops reading several stats per file open the footer once."""
        try:
            import pyarrow.parquet as _pq

            # read_metadata opens and closes the file per call —
            # ParquetFile would leave the handle to GC
            if md is None:
                md = _pq.read_metadata(abs_path)
            idx = {
                md.schema.column(i).name: i for i in range(md.num_columns)
            }.get(key_col)
            if idx is None:
                return None, None
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                if st is None or not st.has_min_max:
                    return None, None
                # min/max stats EXCLUDE nulls, but the merge join
                # matches null keys (eqNullSafe): a file holding a
                # null-key row must never be pruned on its non-null
                # range, or a null-key upsert would insert a second
                # live row for the same key and break LWW convergence.
                if st.null_count is None or st.null_count > 0:
                    return None, None
                # parquet writers may TRUNCATE long string stats (the
                # stored max can be a prefix that compares LOWER than
                # real values — unsound for pruning). Keys here are
                # short ids; refuse stats that could be truncated.
                if isinstance(st.max, (str, bytes)) and (
                    len(st.max) >= 60 or len(st.min) >= 60
                ):
                    return None, None
                mins.append(st.min)
                maxs.append(st.max)
            return (min(mins), max(maxs)) if mins else (None, None)
        except Exception:
            return None, None

    @staticmethod
    def _file_tombstone_flag(abs_path: str, md=None) -> bool | None:
        """Whether the file holds any delete tombstone, from the
        parquet footer's ``_deleted`` column statistics (driver-side,
        no job — same pattern as ``_file_key_stats``). False only when
        every row group's max is provably false with zero nulls; None
        (unknown) when stats are missing, which callers must treat as
        "may contain tombstones". Recorded per file at write time so a
        ``compact(drop_tombstones=True)`` major compaction can skip
        buckets that provably have nothing to expire (round-6 fix for
        the round-5 write-amplification finding: the drop_tombstones
        arm rewrote 100%% of the table when 2%% of buckets held
        tombstones)."""
        try:
            import pyarrow.parquet as _pq

            if md is None:
                md = _pq.read_metadata(abs_path)
            idx = {
                md.schema.column(i).name: i for i in range(md.num_columns)
            }.get("_deleted")
            if idx is None:
                return None
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                if st is None or not st.has_min_max:
                    return None
                # a null _deleted is not a live row under read()'s
                # `~_deleted` filter — treat files holding one as
                # tombstone-bearing so expiry always rewrites them
                if st.null_count is None or st.null_count > 0:
                    return True
                if bool(st.max):
                    return True
            return False
        except Exception:
            return None

    @staticmethod
    def footer_row_estimate(df: DataFrame) -> int | None:
        """Exact row count from parquet footers for bare-scan,
        file-backed frames — a few ms on the driver, no Spark job.
        Returns None when the plan filters/expands rows (footer counts
        would overcount) or the inputs aren't parquet."""
        try:
            import pyarrow.parquet as _pq

            paths = [
                p[7:] if p.startswith("file://") else p for p in df.inputFiles()
            ]
            if paths and TransactionalTable._is_bare_scan(df):
                if len(paths) > 8:
                    # a bulk batch spans hundreds of segment files;
                    # footer opens are independent ~ms IO — thread them
                    # so the driver-side estimate stays O(ms), not
                    # O(files) serial latency on the micro-batch path
                    from concurrent.futures import ThreadPoolExecutor

                    # read_metadata (not ParquetFile) closes each file
                    # handle per call — 16 concurrent opens over
                    # hundreds of files per bulk batch would otherwise
                    # ride on GC for fd release
                    with ThreadPoolExecutor(max_workers=16) as ex:
                        return sum(
                            ex.map(
                                lambda p: _pq.read_metadata(p).num_rows,
                                paths,
                            )
                        )
                return sum(_pq.read_metadata(p).num_rows for p in paths)
        except Exception:
            pass
        return None

    @staticmethod
    def _is_bare_scan(df: DataFrame) -> bool:
        """True iff the optimized logical plan contains only
        row-count-preserving nodes (scan + projection) — the only case
        where parquet-footer row counts equal the batch's row count."""
        try:
            plan = df._jdf.queryExecution().optimizedPlan().toString()
        except Exception:
            return False
        allowed = ("Relation", "Project", "LogicalRDD")
        for line in plan.splitlines():
            node = line.lstrip(" :+-").split(" ", 1)[0].split("[", 1)[0]
            if node and not any(node.startswith(a) for a in allowed):
                return False
        return True

    def _shuffle_dict_codecs(
        self, df: DataFrame, cand_cols, lww_order, key_cols, cap: int = 256
    ):
        """Per-batch dictionary codecs for low-cardinality STRING
        payload columns: narrower UnsafeRows across the bulk merge's
        bucket exchange (the agg+write stage is bandwidth-bound at high
        core counts — BENCH/BASELINE.md §2). One column-pruned
        collect_set job builds the dictionaries; sort_array makes codes
        deterministic. A column exceeding ``cap`` distinct values (or
        participating in keys / LWW ordering) passes through unchanged.
        Returns (encode, decode, encoded_col_names)."""
        strings = {
            f.name for f in df.schema.fields
            if isinstance(f.dataType, T.StringType)
        }
        cols = [
            c for c in (cand_cols or [])
            if c in strings and c not in key_cols and c not in lww_order
        ]
        specs: dict[str, list] = {}
        if cols:
            row = df.agg(
                *[
                    F.slice(
                        F.sort_array(F.collect_set(F.col(c))), 1, cap + 1
                    ).alias(c)
                    for c in cols
                ]
            ).collect()[0]
            for c in cols:
                vals = row[c]
                if vals and len(vals) <= cap:
                    specs[c] = list(vals)

        if not specs:
            return (lambda d: d), (lambda d: d), []

        def encode(d: DataFrame) -> DataFrame:
            for c, vals in specs.items():
                m = F.create_map(
                    *[x for i, v in enumerate(vals) for x in (F.lit(v), F.lit(i))]
                )
                # null value → null code; every non-null value is in
                # the dict by construction (built from this same frame)
                d = d.withColumn(c, F.element_at(m, F.col(c)).cast("int"))
            return d

        def decode(d: DataFrame) -> DataFrame:
            for c, vals in specs.items():
                arr = F.array(*[F.lit(v) for v in vals])
                # explicit null guard: element_at(arr, NULL) does NOT
                # return NULL (observed returning an arbitrary element
                # on Spark 4.x) — a null code must decode to null
                d = d.withColumn(
                    c,
                    F.when(
                        F.col(c).isNotNull(),
                        F.element_at(arr, F.col(c) + F.lit(1)),
                    ),
                )
            return d

        return encode, decode, sorted(specs)

    def merge(
        self,
        batch_df: DataFrame,
        source_id: str,
        batch_id: int,
        lineage_df: DataFrame | None = None,
        extra_stats: dict | None = None,
        broadcast_threshold: int = 2_000_000,
        lineage_fn=None,
        retries: int = 4,
        backoff_ms: int = 50,
        upper_rows_hint: int | None = None,
        dict_encode_cols=None,
        dict_min_rows: int = 8_000_000,
    ) -> dict:
        """Apply one micro-batch of change events (op/conv_id/turn_idx/
        payload/ts/seq) with LWW semantics. Idempotent per
        (source_id, batch_id): a redelivered batch is skipped via the
        committed watermark; a replayed-from-scratch stream converges
        anyway because the merge itself is LWW-idempotent.

        ``retries``/``backoff_ms`` come from EngineConfig
        (commit_retries / commit_retry_backoff_ms ≙ the reference's
        retry policy, ACP:181-188). Each contended attempt is recorded
        in the committed stats' ``attempt_history`` — the analogue of
        the producer's per-attempt error attributes (PUT:343-364).
        """
        history: list[dict] = []
        for attempt in range(retries + 1):
            try:
                return self._merge_once(
                    batch_df, source_id, batch_id, lineage_df, extra_stats,
                    broadcast_threshold, lineage_fn, attempt_history=history,
                    upper_rows_hint=upper_rows_hint,
                    dict_encode_cols=dict_encode_cols,
                    dict_min_rows=dict_min_rows,
                )
            except ConcurrentCommitError as e:
                if attempt == retries:
                    raise
                delay_ms = backoff_ms * (2**attempt)
                history.append({
                    "attempt": attempt + 1,
                    "error": type(e).__name__,
                    "message": str(e),
                    "backoff_ms": delay_ms,
                })
                time.sleep(delay_ms / 1000.0)
        raise AssertionError("unreachable")

    def _merge_once(
        self, batch_df, source_id, batch_id, lineage_df, extra_stats,
        broadcast_threshold=2_000_000, lineage_fn=None, attempt_history=None,
        upper_rows_hint=None, dict_encode_cols=None, dict_min_rows=8_000_000,
    ):
        m = self.manifest()
        wm = m["watermarks"].get(source_id)
        if wm is not None and batch_id <= int(wm):
            return {"skipped": True, "reason": "watermark", "batch_id": batch_id}

        key_cols = m["key_cols"]
        n_buckets = m["n_buckets"]
        # LWW ordering columns from the manifest — a table created with
        # custom lww_cols merges by ITS order. The stream's `seq` is
        # stored as the internal `_seq`; `_seq` is always the final
        # tie-break (total order even for identical lww values).
        lww_order = [
            ("_seq" if c == "seq" else c) for c in (m.get("lww_cols") or ["ts"])
        ]
        if "_seq" not in lww_order:
            lww_order.append("_seq")
        cur_schema = T.StructType.fromJson(json.loads(m["schema"]))

        # --- schema evolution: union-by-name with the batch's payload
        _non_payload = {"op", "seq", "shard", "arrival_ts", "arrival_idx",
                        "_seq", "_deleted", "_bucket"}
        batch_payload = T.StructType(
            [f for f in batch_df.schema.fields if f.name not in _non_payload]
        )
        # LOUD reject of retired names (round-5 VERDICT #6): after a
        # rename/drop migration, a producer still emitting the old
        # column name would otherwise be silently re-ADDED as a fresh
        # null-backed column by the union-by-name below — exactly the
        # quiet divergence schema evolution must never allow.
        retired = set(m.get("retired_cols") or [])
        stale = retired & {f.name for f in batch_payload.fields}
        if stale:
            raise SchemaEvolutionError(
                f"batch carries retired column(s) {sorted(stale)}: the "
                "table renamed or dropped them (migrate_rename_column/"
                "migrate_drop_column). Quiesce the producer and restart "
                "it with the current schema, or re-map the stream's "
                "columns before merge."
            )
        new_schema = schema_union(cur_schema, batch_payload)
        payload_cols = [f.name for f in new_schema.fields]

        # --- normalize batch → upsert rows (missing cols → null)
        have = set(batch_df.columns)
        proj = [
            (F.col(c).cast(f.dataType) if c in have else F.lit(None).cast(f.dataType)).alias(c)
            for c, f in zip(payload_cols, new_schema.fields)
        ]
        up = batch_df.select(
            *proj,
            F.col("seq").cast("long").alias("_seq"),
            (F.col("op") == F.lit("D")).alias("_deleted"),
        )

        non_key = [c for c in payload_cols if c not in key_cols] + INTERNAL_COLS
        bcols = m.get("bucket_cols") or ["conv_id", "turn_idx"]
        up = up.withColumn("_bucket", self._bucket_expr(n_buckets, bcols))

        def _lww_agg(df):
            """Intra-batch/merge LWW: one winner per key by the
            manifest's (lww_cols, _seq) order. max_by aggregation
            (partial/map-side combine) rather than a row_number window
            — no per-partition sort, skew-tolerant."""
            return (
                df.groupBy("_bucket", *key_cols)
                .agg(
                    F.expr(
                        "max_by(struct({cols}), struct({ord}))".format(
                            cols=", ".join(non_key), ord=", ".join(lww_order)
                        )
                    ).alias("_w")
                )
                .select(
                    "_bucket", *key_cols,
                    *[F.col(f"_w.{c}").alias(c) for c in non_key],
                )
            )

        # --- size the batch WITHOUT a job when possible: for
        # file-backed batches (the streaming source) the input file
        # sizes estimate rows on the driver. A clearly-bulk batch
        # skips the exact pre-count entirely — at bulk spread every
        # bucket is touched anyway, and the saved job is a full scan.
        # exact footer estimate exists only for bare-scan file-backed
        # batches (a filtered view of a big file would overcount,
        # misreport n_upserts, and wrongly push small batches onto the
        # all-buckets bulk path, defeating file pruning). The caller's
        # upper_rows_hint (e.g. footer rows of the raw pre-validation
        # stream batch) is an upper bound usable ONLY to pick the bulk
        # path when it is clearly large.
        est_rows = self.footer_row_estimate(batch_df)
        bulk_cutoff = max(broadcast_threshold, 8 * n_buckets * 1000)
        # hint-derived sizes are an UPPER BOUND (pre-validation rows):
        # usable to pick the bulk path, but n_upserts reported from it
        # must be flagged as an estimate (the true applied count is
        # hint − invalid/DLQ rows; the rate limiter corrects for this)
        n_batch_estimated = False
        if est_rows is None and upper_rows_hint is not None and upper_rows_hint > bulk_cutoff:
            est_rows = upper_rows_hint
            n_batch_estimated = True

        key0 = key_cols[0]
        bucket_ranges: dict[int, tuple] = {}
        if est_rows is not None and est_rows > bulk_cutoff:
            n_batch = est_rows
            affected = list(range(n_buckets))
        else:
            # one light job (map-side-combined count) yields the batch
            # size, the touched-bucket set (path choice + pruning) AND
            # each bucket's key range (intra-bucket file pruning)
            bucket_counts = (
                up.groupBy("_bucket")
                .agg(
                    F.count(F.lit(1)).alias("n"),
                    F.min(key0).alias("kmin"),
                    F.max(key0).alias("kmax"),
                    # F.min/F.max skip nulls, but the merge join is
                    # null-safe — a bucket whose batch slice contains
                    # a null leading key must not prune ANY file (the
                    # null-key row matches rows outside [kmin, kmax])
                    F.sum(F.isnull(key0).cast("long")).alias("knulls"),
                )
                .collect()
            )
            n_batch = sum(r["n"] for r in bucket_counts)
            affected = sorted(r["_bucket"] for r in bucket_counts)
            bucket_ranges = {
                r["_bucket"]: (r["kmin"], r["kmax"])
                for r in bucket_counts
                if r["kmin"] is not None and r["knulls"] == 0
            }
        affected_set = set(affected)

        old_files = m["files"]
        strategy = m.get("merge_strategy", "copy-on-write")
        # file-level pruning, two tiers: (1) untouched buckets are
        # never read or rewritten; (2) within a touched bucket, a file
        # whose manifest [min_key, max_key] is disjoint from the
        # batch's key range for that bucket cannot contain any batch
        # key (ranges are on the leading key column) — keep it as-is.
        # merge-on-read touches NOTHING: every existing file is kept
        # and the batch lands as delta files.
        touched, kept = [], list(old_files) if strategy == "merge-on-read" else []
        for f in [] if strategy == "merge-on-read" else old_files:
            if f["bucket"] not in affected_set:
                kept.append(f)
                continue
            rng = bucket_ranges.get(f["bucket"])
            fmin, fmax = f.get("min_key"), f.get("max_key")
            if (
                rng is not None
                and fmin is not None
                and fmax is not None
                and (fmax < rng[0] or fmin > rng[1])
            ):
                kept.append(f)
            else:
                touched.append(f)

        existing = None
        if touched:
            internal = self._internal_schema()
            existing = self.spark.read.schema(internal).parquet(
                *[os.path.join(self.path, f["path"]) for f in touched]
            )
            # align to evolved schema (new columns → null)
            eproj = [
                (
                    F.col(c).cast(f.dataType)
                    if c in existing.columns
                    else F.lit(None).cast(f.dataType)
                ).alias(c)
                for c, f in zip(payload_cols, new_schema.fields)
            ]
            existing = existing.select(
                *eproj, F.col("_seq"), F.col("_deleted")
            ).withColumn("_bucket", self._bucket_expr(n_buckets, bcols))

        version = m["version"] + 1
        # unique per-attempt dir: two writers racing the same version
        # never share a data path (errorifexists is check-then-write,
        # not atomic), this writer's os.walk can only see its own
        # files, and a loser's cleanup rmtree cannot touch data the
        # winner's committed manifest references — the manifest link
        # alone decides the winner.
        commit_rel = os.path.join(
            "data", f"commit-{version:012d}-{uuid.uuid4().hex[:8]}"
        )
        commit_dir = os.path.join(self.path, commit_rel)
        out_cols = ["_bucket", *payload_cols, *INTERNAL_COLS]

        # self-heal file fragmentation: once the affected buckets
        # average >3 files each, do a full union-agg rewrite (which
        # emits exactly one file chain per bucket) instead of
        # stacking more copy-on-write generations
        fragmented = touched and len(touched) > 3 * len(affected)

        # dictionary-encode configured low-cardinality payload columns
        # across the bucket exchange (both exchange-bearing paths);
        # identity codecs when unconfigured / high-cardinality. The
        # lever pays only on clearly-bulk replays whose exchange is
        # bandwidth-bound: measured +3% at 13.4M-row batches on 2-8
        # pinned cores, but −26% at 0.8M-row batches on 32 cores where
        # the dictionary scan can't amortize (BENCH/ab_shuffle.py vs
        # the bench merge A/B) — hence the explicit row floor on top
        # of the bulk-path threshold. broadcast-cow has no exchange at
        # all and never encodes.
        dict_active = bool(dict_encode_cols) and n_batch > max(
            broadcast_threshold, dict_min_rows
        )
        enc_cols: list[str] = []

        if strategy == "merge-on-read":
            # --- delta-append (write-optimized): LWW-dedupe the batch
            # and append it bucketed — ONE job over O(batch) rows, no
            # read/join/rewrite of existing data. Readers resolve
            # winners (read()); compact() folds deltas into base.
            merge_path = "delta-append"
            parts = max(len(affected), 1)
            if n_batch <= broadcast_threshold:
                parts = max(1, min(parts, -(-n_batch // 500_000)))
            src = up
            dec = None
            if dict_active:
                enc, dec, enc_cols = self._shuffle_dict_codecs(
                    up, dict_encode_cols, lww_order, key_cols
                )
                src = enc(up)
            merged = _lww_agg(src.repartition(parts, "_bucket"))
            if dec is not None:
                merged = dec(merged)
            (
                merged.select(*out_cols)
                .write.partitionBy("_bucket")
                .mode("errorifexists")
                .parquet(commit_dir)
            )
        elif existing is not None and n_batch <= broadcast_threshold and not fragmented:
            # --- small-batch path (the steady-state CDC case):
            # broadcast the deduped batch against the affected
            # buckets — the big side is scanned in place, NEVER
            # shuffled. Updated/unchanged rows are written back
            # preserving scan partitioning (copy-on-write, no
            # exchange in the plan); inserts are the small side.
            merge_path = "broadcast-cow"
            up_d = _lww_agg(up)  # join build side needs unique keys
            e, b = existing.alias("e"), F.broadcast(up_d.alias("b"))
            on = [F.col(f"e.{k}").eqNullSafe(F.col(f"b.{k}")) for k in key_cols]
            # lexicographic struct comparison = the manifest's LWW order
            bwins = (
                F.struct(*[F.col(f"b.{c}") for c in lww_order])
                >= F.struct(*[F.col(f"e.{c}") for c in lww_order])
            )
            cow = e.join(b, on, "left").select(
                F.col("e._bucket").alias("_bucket"),
                *[F.col(f"e.{k}").alias(k) for k in key_cols],
                *[
                    F.when(bwins, F.col(f"b.{c}"))
                    .otherwise(F.col(f"e.{c}"))
                    .alias(c)
                    for c in non_key
                ],
            ).select(*out_cols)
            # keys are unique within the table — no distinct needed.
            # Both the semi and the anti join MUST be null-safe like
            # the cow join above: plain equality never matches a null
            # key, so a null-key upsert would update the existing row
            # AND insert a duplicate (two live rows, LWW broken).
            matched_keys = existing.alias("e2").join(
                F.broadcast(up_d.select(*key_cols).alias("k")),
                [
                    F.col(f"e2.{k}").eqNullSafe(F.col(f"k.{k}"))
                    for k in key_cols
                ],
                "left_semi",
            ).select(*key_cols)
            # cluster the (small) inserts side by bucket — without
            # this every up_d partition writes a sliver file into
            # every bucket and file count explodes quadratically
            inserts = (
                up_d.alias("u")
                .join(
                    F.broadcast(matched_keys.alias("mk")),
                    [
                        F.col(f"u.{k}").eqNullSafe(F.col(f"mk.{k}"))
                        for k in key_cols
                    ],
                    "left_anti",
                )
                .select(*out_cols)
                .repartition(max(len(affected) // 2, 1), "_bucket")
            )
            # one write job: the cow side keeps its scan
            # partitioning (no exchange); inserts ride along.
            # Output sizing (K3 file aggregation, APP:40-68): when the
            # rewritten data is small (known from the touched files'
            # parquet footers — driver-side, no job), coalesce
            # (narrow, still no exchange) so the steady-state CDC case
            # emits a few right-sized files instead of one sliver per
            # scan task — less task-scheduling overhead per batch and
            # less fragmentation per commit.
            out = cow.unionByName(inserts)
            try:
                import pyarrow.parquet as _pq2

                touched_rows = sum(
                    _pq2.read_metadata(
                        os.path.join(self.path, f["path"])
                    ).num_rows
                    for f in touched
                )
            except Exception:
                touched_rows = None
            if touched_rows is not None:
                total = touched_rows + n_batch
                if total <= 4_000_000:
                    out = out.coalesce(max(1, -(-total // 500_000)))
            out.write.partitionBy("_bucket").mode("errorifexists").parquet(
                commit_dir
            )
        else:
            # --- big-batch path (backfill / bulk replay): union the
            # deduped batch with the affected buckets and take the
            # LWW winner per key in one shuffle. AQE coalesces and
            # splits skewed partitions at runtime.
            merge_path = "union-agg"
            # batch dedup and merge-vs-existing fuse into ONE
            # aggregation, and the whole merge moves the payload over
            # ONE exchange: repartitioning by _bucket alone both
            # satisfies the aggregate's clustered-distribution
            # requirement (bucket ⊂ group keys ⇒ keys co-located) and
            # leaves the output clustered for the partitionBy write —
            # no second shuffle before writing.
            unioned = (
                up.select(*out_cols).unionByName(existing.select(*out_cols))
                if existing is not None
                else up.select(*out_cols)
            )
            # partition count: one per affected bucket for bulk (the
            # per-bucket writer is the parallelism unit), downsized for
            # small batches (e.g. the first merge into an empty table)
            # so a 25k-row batch doesn't schedule 64 sliver tasks
            parts = max(len(affected), 1)
            if n_batch <= broadcast_threshold:
                parts = max(1, min(parts, -(-n_batch // 500_000)))
            dec = None
            if dict_active:
                # dictionaries build over the UNION (batch ∪ touched
                # table rows) so every value on either side encodes
                enc, dec, enc_cols = self._shuffle_dict_codecs(
                    unioned, dict_encode_cols, lww_order, key_cols
                )
                unioned = enc(unioned)
            merged = _lww_agg(unioned.repartition(parts, "_bucket"))
            if dec is not None:
                merged = dec(merged)
            merged = merged.select(*out_cols)
            (
                merged.write.partitionBy("_bucket")
                .mode("errorifexists")
                .parquet(commit_dir)
            )
        new_files = []
        for root, _dirs, files in os.walk(commit_dir):
            for fn in files:
                if fn.endswith(".parquet"):
                    abs_p = os.path.join(root, fn)
                    rel = os.path.relpath(abs_p, self.path)
                    bucket = int(root.rsplit("_bucket=", 1)[1])
                    md = self._read_footer(abs_p)
                    kmin, kmax = self._file_key_stats(abs_p, key0, md=md)
                    entry = {"path": rel, "bucket": bucket}
                    if kmin is not None:
                        entry["min_key"], entry["max_key"] = kmin, kmax
                    if strategy == "merge-on-read":
                        entry["delta"] = True
                    tflag = self._file_tombstone_flag(abs_p, md=md)
                    if tflag is not None:
                        entry["tombstones"] = tflag
                    new_files.append(entry)

        # --- lineage files (atomic with the data commit). lineage_fn
        # runs AFTER the data write (so Observation metrics that piggy-
        # backed on the merge's own jobs are latched — zero extra jobs)
        # but BEFORE the manifest commit (atomicity). A lineage_fn that
        # raises (e.g. fail-on-dead-letter) aborts the commit with
        # nothing made visible; this attempt's data dir is removed.
        lineage_files = list(m.get("lineage_files", []))
        lin_rel = None
        try:
            if lineage_fn is not None and lineage_df is None:
                lineage_df = lineage_fn()
            if lineage_df is not None:
                lin_rel = os.path.join(
                    "lineage", f"commit-{version:012d}-{uuid.uuid4().hex[:8]}"
                )
                if isinstance(lineage_df, DataFrame):
                    lineage_df.coalesce(1).write.mode("errorifexists").parquet(
                        os.path.join(self.path, lin_rel)
                    )
                    for root, _dirs, files in os.walk(
                        os.path.join(self.path, lin_rel)
                    ):
                        for fn in files:
                            if fn.endswith(".parquet"):
                                lineage_files.append(
                                    os.path.relpath(
                                        os.path.join(root, fn), self.path
                                    )
                                )
                else:
                    # plain rows (list[dict]) from driver-side metrics:
                    # write the handful of lineage rows with pyarrow
                    # directly — no Spark job for a few rows
                    rel = self._write_lineage_rows(lineage_df, lin_rel)
                    if rel is not None:
                        lineage_files.append(rel)
                    else:
                        lin_rel = None
        except Exception:
            shutil.rmtree(commit_dir, ignore_errors=True)
            if lin_rel is not None:
                shutil.rmtree(os.path.join(self.path, lin_rel), ignore_errors=True)
            raise

        watermarks = dict(m["watermarks"])
        watermarks[source_id] = batch_id
        stats = {
            "merge_path": merge_path,
            "n_upserts": n_batch,
            "n_upserts_estimated": n_batch_estimated,
            "buckets_touched": len(affected),
            "files_rewritten": len(touched),
            "files_added": len(new_files),
            # per-attempt commit-retry history (≙ the producer's
            # flattened attempt attributes, PUT:343-364)
            "commit_attempts": len(attempt_history or []) + 1,
            "attempt_history": list(attempt_history or []),
            "dict_encoded_cols": enc_cols,
            **(extra_stats or {}),
        }
        manifest = {
            "version": version,
            "schema": new_schema.json(),
            "key_cols": key_cols,
            "lww_cols": m["lww_cols"],
            "n_buckets": n_buckets,
            # MUST carry through every commit: files are placed by this
            # hash — losing either key would silently re-bucket the table
            "bucket_cols": bcols,
            "bucket_hash": m.get("bucket_hash", "legacy"),
            "merge_strategy": strategy,
            "files": kept + new_files,
            "lineage_files": lineage_files,
            "watermarks": watermarks,
            "parent": m["version"],
            "stats": stats,
        }
        try:
            self._commit_manifest(manifest)
        except ConcurrentCommitError:
            # safe: this attempt's dirs are uniquely named, so only
            # THIS loser's files are removed, never the winner's
            shutil.rmtree(commit_dir, ignore_errors=True)
            if lin_rel is not None:
                shutil.rmtree(os.path.join(self.path, lin_rel), ignore_errors=True)
            raise
        return {"skipped": False, "version": version, **stats}

    def _write_lineage_rows(self, rows: list[dict], lin_rel: str) -> str | None:
        """Driver-side parquet write of a handful of lineage rows
        (LINEAGE_SCHEMA-shaped dicts) — Spark's vectorized reader reads
        it back like any executor-written file. Returns the file's
        table-relative path, or None for empty input."""
        if not rows:
            return None
        import pyarrow as pa
        import pyarrow.parquet as pq

        pa_schema = pa.schema(
            [
                ("source_id", pa.string()),
                ("batch_id", pa.int64()),
                ("shard", pa.int32()),
                ("first_seq", pa.int64()),
                ("last_seq", pa.int64()),
                ("n_events", pa.int64()),
                ("n_dead_letter", pa.int64()),
                ("max_lag_ms", pa.int64()),
            ]
        )
        out_dir = os.path.join(self.path, lin_rel)
        os.makedirs(out_dir, exist_ok=True)
        rel = os.path.join(lin_rel, "part-00000.parquet")
        pq.write_table(
            pa.Table.from_pylist(
                [{k: r.get(k) for k in pa_schema.names} for r in rows],
                schema=pa_schema,
            ),
            os.path.join(self.path, rel),
        )
        return rel

    # ----------------------------------------------------- maintenance

    def compact(self, drop_tombstones: bool = False, max_files_per_bucket: int = 1) -> dict:
        """Rewrite fragmented buckets so each holds at most
        ``max_files_per_bucket`` files; optionally expire delete
        tombstones (safe once no replay older than the deletes can
        arrive). The analogue of Iceberg's rewrite_data_files."""
        m = self.manifest()
        by_bucket: dict[int, list[dict]] = {}
        for f in m["files"]:
            by_bucket.setdefault(f["bucket"], []).append(f)
        frag = {
            b: fs for b, fs in by_bucket.items()
            if len(fs) > max_files_per_bucket
            # delta files qualify regardless of count: folding them
            # into base restores scan-only reads
            or any(f.get("delta") for f in fs)
            # tombstone expiry touches only buckets whose files may
            # actually hold a tombstone: manifests record a per-file
            # `tombstones` flag from the parquet footer at write time
            # (absent = written before the flag existed = unknown =
            # must rewrite). Round-5 VERDICT #1: the previous
            # `or drop_tombstones` arm rewrote EVERY bucket, 100%
            # write amplification when a sliver of buckets holds
            # deletes.
            or (
                drop_tombstones
                and any(f.get("tombstones", True) for f in fs)
            )
        }
        if not frag:
            # endurance gap (round 5): a copy-on-write stream keeps its
            # data files tight (one rewrite per merge) so no bucket is
            # ever fragmented — but the per-batch LINEAGE slivers still
            # accumulate one file per micro-batch. Fold them in a
            # metadata-only commit so lineage file count stays bounded
            # even when there is nothing to compact on the data side.
            lineage_files = list(m.get("lineage_files", []))
            if len(lineage_files) > 16:
                version = m["version"] + 1
                folded = self._fold_lineage(lineage_files, version)
                if folded is not None:
                    manifest = {
                        **m,
                        "version": version,
                        "lineage_files": [folded],
                        "parent": m["version"],
                        "stats": {
                            "compacted_buckets": 0,
                            "lineage_folded": True,
                            "lineage_files_before": len(lineage_files),
                        },
                    }
                    try:
                        self._commit_manifest(manifest)
                    except ConcurrentCommitError:
                        try:
                            os.remove(os.path.join(self.path, folded))
                        except OSError:
                            pass
                        raise
                    return {
                        "skipped": False,
                        "version": version,
                        **manifest["stats"],
                    }
            return {"skipped": True, "reason": "nothing to compact"}
        internal = self._internal_schema()
        paths = [
            os.path.join(self.path, f["path"]) for fs in frag.values() for f in fs
        ]
        df = self.spark.read.schema(internal).parquet(*paths)
        if any(f.get("delta") for fs in frag.values() for f in fs):
            # major compaction of merge-on-read deltas: resolve LWW
            # winners so the rewritten base files hold exactly one row
            # per key. MUST happen BEFORE tombstone expiry — dropping
            # tombstones first would resurrect the older rows they
            # shadow. Keys never span buckets (bucket = key hash), so
            # per-bucket compaction sees every version of its keys.
            key_cols = m["key_cols"]
            lww_order = [
                ("_seq" if c == "seq" else c)
                for c in (m.get("lww_cols") or ["ts"])
            ]
            if "_seq" not in lww_order:
                lww_order.append("_seq")
            non_key = [c for c in df.columns if c not in key_cols]
            df = (
                df.groupBy(*key_cols)
                .agg(
                    F.expr(
                        "max_by(struct({cols}), struct({ord}))".format(
                            cols=", ".join(non_key), ord=", ".join(lww_order)
                        )
                    ).alias("_w")
                )
                .select(
                    *key_cols, *[F.col(f"_w.{c}").alias(c) for c in non_key]
                )
            )
        if drop_tombstones:
            df = df.filter(~F.col("_deleted"))
        df = df.withColumn(
            "_bucket",
            self._bucket_expr(m["n_buckets"], m.get("bucket_cols") or ["conv_id", "turn_idx"]),
        )
        version = m["version"] + 1
        commit_rel = os.path.join(
            "data", f"commit-{version:012d}-{uuid.uuid4().hex[:8]}"
        )
        commit_dir = os.path.join(self.path, commit_rel)
        (
            df.repartition(max(len(frag), 1), "_bucket")
            .write.partitionBy("_bucket")
            .mode("errorifexists")
            .parquet(commit_dir)
        )
        new_files = []
        for root, _dirs, files in os.walk(commit_dir):
            for fn in files:
                if fn.endswith(".parquet"):
                    abs_p = os.path.join(root, fn)
                    rel = os.path.relpath(abs_p, self.path)
                    md = self._read_footer(abs_p)
                    kmin, kmax = self._file_key_stats(
                        abs_p, m["key_cols"][0], md=md
                    )
                    entry = {"path": rel, "bucket": int(root.rsplit("_bucket=", 1)[1])}
                    if kmin is not None:
                        entry["min_key"], entry["max_key"] = kmin, kmax
                    # a drop_tombstones compaction provably leaves none;
                    # otherwise read the footer like the merge path does
                    tflag = (
                        False if drop_tombstones
                        else self._file_tombstone_flag(abs_p, md=md)
                    )
                    if tflag is not None:
                        entry["tombstones"] = tflag
                    new_files.append(entry)
        kept = [f for f in m["files"] if f["bucket"] not in frag]
        # fold lineage: streaming deployments add one tiny lineage file
        # per micro-batch — left alone the manifest's lineage_files list
        # (and the file count) grows linearly forever. Compaction
        # rewrites them as ONE file (driver-side pyarrow: a few rows per
        # batch, no Spark job).
        lineage_files = list(m.get("lineage_files", []))
        folded_lineage = None
        if len(lineage_files) > 1:
            folded_lineage = self._fold_lineage(lineage_files, version)
            if folded_lineage is not None:
                lineage_files = [folded_lineage]
        manifest = {
            **m,
            "version": version,
            "files": kept + new_files,
            "lineage_files": lineage_files,
            "parent": m["version"],
            "stats": {
                "compacted_buckets": len(frag),
                "files_before": sum(len(v) for v in frag.values()),
                "files_after": len(new_files),
                "lineage_folded": folded_lineage is not None,
            },
        }
        try:
            self._commit_manifest(manifest)
        except ConcurrentCommitError:
            shutil.rmtree(commit_dir, ignore_errors=True)
            if folded_lineage is not None:
                try:
                    os.remove(os.path.join(self.path, folded_lineage))
                except OSError:
                    pass
            raise
        return {"skipped": False, "version": version, **manifest["stats"]}

    def _fold_lineage(self, lineage_files: list[str], version: int) -> str | None:
        """Concatenate all lineage parquet files into one (driver-side
        pyarrow). Returns the new file's table-relative path, or None
        when any input is unreadable (keep the originals then)."""
        try:
            import pyarrow.parquet as pq

            tables = [
                pq.read_table(os.path.join(self.path, rel))
                for rel in lineage_files
            ]
            import pyarrow as pa

            folded = pa.concat_tables(tables, promote_options="default")
            rel_dir = os.path.join(
                "lineage", f"compact-{version:012d}-{uuid.uuid4().hex[:8]}"
            )
            os.makedirs(os.path.join(self.path, rel_dir), exist_ok=True)
            rel = os.path.join(rel_dir, "part-00000.parquet")
            pq.write_table(folded, os.path.join(self.path, rel))
            return rel
        except Exception:
            return None

    # ------------------------------------------------ schema migration

    def migrate_rename_column(self, old: str, new: str) -> dict:
        """Rename a column via transactional full rewrite (round-5
        VERDICT #6). Column ADDS evolve in-flight (schema_union);
        renames cannot be expressed without per-field IDs in the file
        format, so this engine takes the explicit-migration route a
        field-ID lake format (Iceberg) would make metadata-only:

        1. quiesce writers (a racing merge loses the version CAS and
           its retry then fails LOUDLY on the retired name — no silent
           null-backed resurrection of the old column);
        2. call this method — one Spark job rewrites every bucket
           under the new schema and commits atomically;
        3. restart producers emitting the new name.

        Bucket-placement invariant: ``_bucket`` is computed from the
        OLD names/schema before the rename touches the rows — hashes
        are over VALUES, so placement is byte-stable (``_bucket_expr``
        must never change for live files). Key/bucket/lww column
        references in the manifest follow the rename."""
        return self._migrate_schema(old, new)

    def migrate_drop_column(self, col: str) -> dict:
        """Drop a column via the same transactional rewrite. Key,
        bucket, and LWW-order columns are structural — dropping them
        is rejected loudly."""
        return self._migrate_schema(col, None)

    def _migrate_schema(self, old: str, new: str | None) -> dict:
        m = self.manifest()
        schema = self.table_schema()
        names = [f.name for f in schema.fields]
        if old not in names:
            raise SchemaEvolutionError(f"no such column {old!r}")
        # reserved names: the stream envelope (op/seq/shard/arrival_*)
        # is stripped from batch payloads before merge, so a payload
        # column renamed onto one of those names would silently absorb
        # the envelope value instead of producer data; _bucket is the
        # write path's partition column
        reserved = {"op", "seq", "shard", "arrival_ts", "arrival_idx",
                    "_bucket", *INTERNAL_COLS}
        if new is not None and (new in names or new in reserved):
            raise SchemaEvolutionError(
                f"column {new!r} already exists or is a reserved name"
            )
        structural = (
            set(m["key_cols"])
            | set(m.get("bucket_cols") or [])
            | set(m.get("lww_cols") or [])
        )
        if new is None and old in structural:
            raise SchemaEvolutionError(
                f"cannot drop structural column {old!r} (key/bucket/lww)"
            )

        # read EVERYTHING (tombstones + internal cols — a migration
        # must not change merge semantics), stamp buckets from the OLD
        # schema, then apply the rename/drop
        paths = [os.path.join(self.path, f["path"]) for f in m["files"]]
        int_schema = self._internal_schema()
        if paths:
            df = self.spark.read.schema(int_schema).parquet(*paths)
        else:
            df = self.spark.createDataFrame([], int_schema)
        if any(f.get("delta") for f in m["files"]):
            # merge-on-read with un-compacted deltas: the rewrite must
            # LWW-resolve winners (keeping tombstones — expiry is
            # compact()'s job, not migration's) exactly like compact()
            # does, or the rewritten files would hold every key
            # version WITHOUT the delta flag and read()'s
            # LWW-resolution gate (`any(f.get("delta"))`) would stop
            # firing — duplicate key versions and resurrected
            # tombstones on every subsequent read (round-5 ADVICE
            # high). Resolution runs on the OLD names, before the
            # rename touches any column.
            mig_keys = m["key_cols"]
            lww_order = [
                ("_seq" if c == "seq" else c)
                for c in (m.get("lww_cols") or ["ts"])
            ]
            if "_seq" not in lww_order:
                lww_order.append("_seq")
            mig_non_key = [c for c in df.columns if c not in mig_keys]
            df = (
                df.groupBy(*mig_keys)
                .agg(
                    F.expr(
                        "max_by(struct({cols}), struct({ord}))".format(
                            cols=", ".join(mig_non_key),
                            ord=", ".join(lww_order),
                        )
                    ).alias("_w")
                )
                .select(
                    *mig_keys,
                    *[F.col(f"_w.{c}").alias(c) for c in mig_non_key],
                )
            )
        bcols = m.get("bucket_cols") or ["conv_id", "turn_idx"]
        df = df.withColumn(
            "_bucket", self._bucket_expr(m["n_buckets"], bcols)
        )
        df = df.drop(old) if new is None else df.withColumnRenamed(old, new)

        def _ren(c: str) -> str:
            return new if c == old else c

        new_fields = []
        for f in schema.fields:
            if f.name == old:
                if new is None:
                    continue
                new_fields.append(T.StructField(new, f.dataType, f.nullable))
            else:
                new_fields.append(f)
        new_schema = T.StructType(new_fields)
        key_cols = [_ren(c) for c in m["key_cols"]]
        version = m["version"] + 1
        commit_rel = os.path.join(
            "data", f"commit-{version:012d}-{uuid.uuid4().hex[:8]}"
        )
        commit_dir = os.path.join(self.path, commit_rel)
        (
            df.repartition(m["n_buckets"], "_bucket")
            .write.partitionBy("_bucket")
            .mode("errorifexists")
            .parquet(commit_dir)
        )
        new_files = []
        for root, _dirs, files in os.walk(commit_dir):
            for fn in files:
                if fn.endswith(".parquet"):
                    abs_p = os.path.join(root, fn)
                    md = self._read_footer(abs_p)
                    kmin, kmax = self._file_key_stats(abs_p, key_cols[0], md=md)
                    entry = {
                        "path": os.path.relpath(abs_p, self.path),
                        "bucket": int(root.rsplit("_bucket=", 1)[1]),
                    }
                    if kmin is not None:
                        entry["min_key"], entry["max_key"] = kmin, kmax
                    # migration keeps tombstones (LWW-resolved above
                    # for MOR sources) — record their presence so a
                    # later drop_tombstones compact prunes correctly
                    tflag = self._file_tombstone_flag(abs_p, md=md)
                    if tflag is not None:
                        entry["tombstones"] = tflag
                    new_files.append(entry)
        manifest = {
            **m,
            "version": version,
            "schema": new_schema.json(),
            "key_cols": key_cols,
            "bucket_cols": [_ren(c) for c in (m.get("bucket_cols") or [])],
            "lww_cols": [_ren(c) for c in (m.get("lww_cols") or [])],
            "files": new_files,
            # a rename RETIRES the old name and, crucially, UN-retires
            # the new one: renaming a→b then b→a (or re-introducing a
            # previously dropped name via rename) must leave the live
            # name mergeable again, or the retired-name guard would
            # reject every future batch — permanently bricking writes
            "retired_cols": sorted(
                (set(m.get("retired_cols") or []) | {old}) - {new}
            ),
            "parent": m["version"],
            "stats": {
                "migration": "rename" if new is not None else "drop",
                "column": old,
                **({"renamed_to": new} if new is not None else {}),
                "files_rewritten": len(paths),
            },
        }
        try:
            self._commit_manifest(manifest)
        except ConcurrentCommitError:
            shutil.rmtree(commit_dir, ignore_errors=True)
            raise
        return {"skipped": False, "version": version, **manifest["stats"]}

    def expire_snapshots(
        self, keep_last: int = 10, grace_secs: float = 600.0
    ) -> dict:
        """Retention: drop manifest JSONs older than the newest
        ``keep_last`` versions and delete data/lineage files no
        retained manifest references. Bounds on-disk growth for
        fine-grained streaming deployments (1000s of micro-batches);
        time travel remains available within the retained window.

        Concurrency guard (``grace_secs``): an unreferenced file
        younger than the grace window is ALWAYS kept. A concurrent
        writer stages its commit directory (data written, manifest not
        yet linked) before the atomic os.link decides the version —
        those staged files are invisible to every manifest, and
        sweeping them would destroy the in-flight commit. Any file a
        racing writer could still reference is by construction younger
        than its commit attempt, so the age test makes expiry safe to
        run concurrently with merges/appends/compactions; genuinely
        orphaned files (loser attempts whose cleanup died) age out of
        the grace window and are collected on the next pass."""
        versions = sorted(
            int(f[1:-5])
            for f in os.listdir(self._log_dir)
            if f.startswith("v") and f.endswith(".json")
        )
        if len(versions) <= keep_last:
            return {"skipped": True, "reason": "nothing to expire"}
        retained, expired = versions[-keep_last:], versions[:-keep_last]
        referenced: set[str] = set()
        for v in retained:
            mv = self.manifest(v)
            referenced.update(f["path"] for f in mv["files"])
            referenced.update(mv.get("lineage_files", []))
        removed_files = skipped_young = 0
        now = time.time()
        for sub in ("data", "lineage"):
            base = os.path.join(self.path, sub)
            if not os.path.isdir(base):
                continue
            for root, _dirs, files in os.walk(base, topdown=False):
                for fn in files:
                    abs_p = os.path.join(root, fn)
                    if os.path.relpath(abs_p, self.path) in referenced:
                        continue
                    try:
                        age = now - os.path.getmtime(abs_p)
                    except OSError:
                        continue  # already gone (racing writer cleanup)
                    if age < grace_secs:
                        skipped_young += 1
                        continue
                    os.remove(abs_p)
                    removed_files += 1
                # empty-dir cleanup gets the SAME grace-window age test
                # as files: a concurrent writer mkdirs its commit-*/
                # directory before staging the first file into it, and
                # removing that still-empty directory mid-commit would
                # fail the in-flight stage. Old empty dirs (loser
                # attempts) age out and are collected on a later pass.
                try:
                    if (
                        not os.listdir(root)
                        and now - os.path.getmtime(root) >= grace_secs
                    ):
                        os.rmdir(root)
                except OSError:
                    pass  # racing writer created/removed it under us
        for v in expired:
            os.remove(self._manifest_path(v))
        return {
            "skipped": False,
            "expired_manifests": len(expired),
            "removed_files": removed_files,
            "skipped_in_grace": skipped_young,
            "retained_versions": retained,
        }

    # --------------------------------------------------------- append

    def append(
        self,
        df: DataFrame,
        source_id: str | None = None,
        batch_id: int | None = None,
        retries: int = 4,
        backoff_ms: int = 50,
    ) -> dict:
        """Append-only commit (dead-letter / metrics tables). Optional
        (source_id, batch_id) watermark makes re-appends of a
        redelivered micro-batch no-ops."""
        for attempt in range(retries + 1):
            m = self.manifest()
            if source_id is not None and batch_id is not None:
                wm = m["watermarks"].get(source_id)
                if wm is not None and batch_id <= int(wm):
                    return {"skipped": True, "reason": "watermark"}
            version = m["version"] + 1
            cur_schema = T.StructType.fromJson(json.loads(m["schema"]))
            new_schema = schema_union(cur_schema, df.schema)
            proj = [
                (F.col(f.name).cast(f.dataType) if f.name in df.columns else F.lit(None).cast(f.dataType)).alias(f.name)
                for f in new_schema.fields
            ]
            out = df.select(
                *proj,
                F.lit(None).cast("long").alias("_seq"),
                F.lit(False).alias("_deleted"),
            )
            commit_rel = os.path.join(
                "data",
                f"commit-{version:012d}-{uuid.uuid4().hex[:8]}",
                "_bucket=-1",
            )
            out.write.mode("errorifexists").parquet(os.path.join(self.path, commit_rel))
            new_files = [
                {"path": os.path.join(commit_rel, fn), "bucket": -1}
                for fn in os.listdir(os.path.join(self.path, commit_rel))
                if fn.endswith(".parquet")
            ]
            watermarks = dict(m["watermarks"])
            if source_id is not None and batch_id is not None:
                watermarks[source_id] = batch_id
            manifest = {
                **m,
                "version": version,
                "schema": new_schema.json(),
                "files": m["files"] + new_files,
                "watermarks": watermarks,
                "parent": m["version"],
            }
            try:
                self._commit_manifest(manifest)
                return {
                    "skipped": False,
                    "version": version,
                    "files_added": len(new_files),
                    "commit_attempts": attempt + 1,
                }
            except ConcurrentCommitError:
                shutil.rmtree(
                    os.path.join(self.path, os.path.dirname(commit_rel)),
                    ignore_errors=True,
                )
                if attempt == retries:
                    raise
                time.sleep(backoff_ms / 1000.0 * (2**attempt))
        raise AssertionError("unreachable")
