"""LakeTable — a minimal snapshot-versioned table format over parquet.

The north rule targets an Iceberg sink; this sandbox ships no Iceberg runtime
jar, so LakeTable re-implements the *subset of Iceberg semantics the engine
needs* with public Spark + filesystem APIs, keeping the same shape a real
deployment would have (swap LakeTable.merge for ``MERGE INTO`` on an Iceberg
v2 table and everything above it is unchanged):

- **Snapshots**: every commit writes an immutable ``_meta/snap-{v}.json``
  listing (bucket → data dirs); readers resolve the current snapshot through
  an atomically-swapped pointer behind the ``lake/catalog.py`` interface
  (POSIX ``os.replace`` here; an object-store catalog does the same CAS with
  conditional PUTs). Manifest entries are computed from the write plan, never
  from directory listings. Time travel = read an older snapshot;
  ``changes(v1, v2)`` reads just the delta between two snapshots.
- **Hidden partitioning**: rows are hash-bucketed on the identity key
  ``pmod(xxhash64(repo, path), n_buckets)`` — the analogue of Iceberg
  ``bucket(N, repo, path)``. A merge touches only the buckets its batch
  hits; readers prune to requested buckets (file-list pruning at the metadata
  layer + parquet min/max stats on the stored ``_ab_bucket`` column).
- **Copy-on-write and merge-on-read**: ``mode="cow"`` rewrites affected
  buckets per merge (read-optimized); ``mode="mor"`` appends LWW-deduped
  delta files per merge (write-optimized — the 10^10-event ingest path) and
  resolves winners at read time with a window, exactly like Iceberg MoR with
  equality deletes; ``maintenance()``/``compact()`` fold deltas into bases —
  ONLY when explicitly invoked (background-job shape), never inline in
  ``merge()``, so ingest batches are never stalled by compaction.
- **Deletes are tombstones** (rows with ``_ab_op='d'`` kept internally,
  filtered from user reads). This makes the final state a pure function of
  the event set — independent of batch boundaries, arrival order, and
  replays — which is what lets a replay from any checkpoint reproduce the
  table byte-for-byte (BASELINE.json north_star).
- **Exactly-once**: each merge records ``(checkpoint_id, batch_id)`` in the
  snapshot; re-delivered batches are skipped. The record is RETAINED
  BOUNDED (``max_applied_batches``, default 1024, most recent by version)
  so snapshot metadata stays metadata-sized at 10^6+ batches — Structured
  Streaming only ever re-delivers batches at/after the last unacknowledged
  checkpoint offset, a window of ~1, so 1024 is a deep margin. Even for a
  batch whose record has aged out, LWW makes re-application a no-op
  (idempotent MERGE — the second line of defense). KEYLESS tables have no
  LWW defense, so their applied-batches record is pruned ONLY below the
  streaming checkpoint's committed-offset watermark (``merge(...,
  offset_watermark=N)`` — batches < N can never redeliver), which keeps
  snapshot metadata bounded on append-only tables without giving up
  exactly-once; ad-hoc keyless merges (no watermark) never prune.
- **Snapshot expiration**: ``expire_snapshots(keep_last)`` (run from
  ``maintenance()``) deletes snapshot files older than the retained window
  and garbage-collects data dirs no retained snapshot references — the
  Iceberg ``expireSnapshots`` analogue. Time travel / ``changes()`` across
  expired versions fails with FileNotFoundError, same contract.
- **Additive schema evolution**: the snapshot carries the table schema;
  ``evolve()`` widens it without data rewrite; readers project old files
  through the widened schema (missing columns null-filled).

The reference has no table format at all — its "sink" is a destination
connector container fed newline-JSON over stdin (``/root/reference/abm/
connector.py:323-341``); sync modes append/overwrite (``/root/reference/abm/
server.py:182-187``) are subsumed by upsert.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from airbyte_module_spark import model
from airbyte_module_spark.lake.catalog import ConcurrentCommitError, FileCatalog

__all__ = ["LakeTable", "ConcurrentCommitError", "bucket_expr", "dedup_lww"]


def bucket_expr(n_buckets: int, key_columns: list[str]):
    """Identity-key hash bucket (Iceberg ``bucket(N, repo, path)`` analogue)."""
    return F.pmod(F.xxhash64(*key_columns), F.lit(n_buckets)).cast("int")


def dedup_lww(df: DataFrame, key_columns: list[str] | None = None) -> DataFrame:
    """Last-writer-wins dedup (SURVEY.md §2.5 W1): keep the max-cursor row
    per identity key, tombstones included.

    Implemented as ``max_by(struct(all columns), struct(cursor, seq))`` in an
    aggregation, NOT as a window/row_number: the aggregate gets map-side
    partial aggregation — conflicting events for a key collapse BEFORE the
    exchange, so the shuffle moves surviving candidates instead of the whole
    feed (at a 20x conflict ratio with hot-key skew that is most of the
    shuffle volume). The struct-valued buffer makes Spark pick SortAggregate
    (local sorts around each phase) rather than HashAggregate, but the
    partial phase is what bounds shuffle bytes.
    Measured on the 10M-event replay at local[32]: 15.2s (window) → 10.6s
    (agg), and the non-parallelizable fraction drops ~3x, which is what the
    N→4N scaling-efficiency criterion actually exercises. The winner is
    identical: lexicographic max of (cursor, seq) = first row of the
    (cursor DESC, seq DESC) window; seq is unique per event."""
    keys = key_columns or model.KEY_COLUMNS
    cols = df.columns
    order_key = F.struct(F.col(model.META_EMITTED), F.col(model.META_SEQ))
    return (
        df.groupBy(*keys)
        .agg(F.max_by(F.struct(*cols), order_key).alias("_w"))
        .select("_w.*")
    )


class LakeTable:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        self.catalog = FileCatalog(os.path.join(path, "_meta"))
        # last-commit phase wall-times (scaling serial-fraction profile)
        self.timings: dict[str, float] = {}

    # ------------------------------------------------------------------ meta
    @classmethod
    def create(
        cls,
        spark: SparkSession,
        path: str,
        schema: T.StructType | None = None,
        n_buckets: int = 32,
        mode: str = "mor",
        compact_after_deltas: int = 8,
        key_columns: list[str] | None = None,
        snapshot_retention: int = 64,
        max_applied_batches: int = 1024,
    ) -> "LakeTable":
        """Create an empty table. ``schema`` is the *data* schema
        (user columns + ``_ab_*`` metadata columns); defaults to the
        repo_files shape from BASELINE.json input_hint."""
        if schema is None:
            schema = model.table_schema(model.base_data_schema())
        t = cls(spark, path)
        t.catalog.initialize()
        if t.catalog.exists():
            raise FileExistsError(f"table already exists at {path}")
        snap = {
            "version": 0,
            "parent": None,
            "schema": schema.json(),
            "entries": [],
            "applied_batches": {},
            "lineage": [],
            "properties": {
                "n_buckets": n_buckets,
                "mode": mode,
                "compact_after_deltas": compact_after_deltas,
                "key_columns": key_columns if key_columns is not None else list(model.KEY_COLUMNS),
                "snapshot_retention": snapshot_retention,
                "max_applied_batches": max_applied_batches,
            },
        }
        t._write_snapshot(snap, expected_parent=None)
        return t

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "LakeTable":
        t = cls(spark, path)
        t.current_snapshot()  # raises if absent
        return t

    def current_version(self) -> int:
        return self.catalog.read_pointer()

    def current_snapshot(self) -> dict:
        return self.snapshot(self.current_version())

    def snapshot(self, version: int) -> dict:
        return self.catalog.read_snapshot(version)

    def schema(self, snap: dict | None = None) -> T.StructType:
        snap = snap or self.current_snapshot()
        return T.StructType.fromJson(json.loads(snap["schema"]))

    @property
    def n_buckets(self) -> int:
        return int(self.current_snapshot()["properties"]["n_buckets"])

    @property
    def key_columns(self) -> list[str]:
        """Identity key of the upsert; empty list = keyless append-only table
        (the reference's plain append sink, ``abm/server.py:182-187``)."""
        return list(self.current_snapshot()["properties"].get("key_columns", model.KEY_COLUMNS))

    def _write_snapshot(self, snap: dict, expected_parent: int | None) -> None:
        """Commit protocol: delegate snapshot persistence + pointer CAS to the
        catalog (see lake/catalog.py for the object-store contract)."""
        self.catalog.publish(snap, expected_parent)

    # ------------------------------------------------------------------ read
    def _read_entries(
        self, entries: list[dict], schema: T.StructType, buckets: list[int] | None
    ) -> DataFrame:
        full = T.StructType(
            list(schema.fields) + [T.StructField(model.BUCKET_COLUMN, T.IntegerType(), True)]
        )
        sel = None if buckets is None else set(buckets)
        dirs = [
            os.path.join(self.path, e["dir"])
            for e in entries
            if sel is None or e["bucket"] in sel
        ]
        if not dirs:
            return self.spark.createDataFrame([], full)
        df = self.spark.read.schema(full).parquet(*dirs)
        if sel is not None:
            # redundant with metadata pruning, but gives parquet row-group
            # skipping if a dir ever holds multiple buckets
            df = df.filter(F.col(model.BUCKET_COLUMN).isin(*sel))
        return df

    def read_internal(
        self, buckets: list[int] | None = None, version: int | None = None
    ) -> DataFrame:
        """All live rows incl. tombstones + metadata cols, LWW-resolved."""
        snap = self.snapshot(version) if version is not None else self.current_snapshot()
        schema = self.schema(snap)
        mode = snap["properties"]["mode"]
        df = self._read_entries(snap["entries"], schema, buckets)
        has_delta = any(e["kind"] == "delta" for e in snap["entries"])
        keys = snap["properties"].get("key_columns", model.KEY_COLUMNS)
        if mode == "mor" and has_delta and keys:
            df = dedup_lww(df, keys)
        return df

    def read(
        self, version: int | None = None, buckets: list[int] | None = None
    ) -> DataFrame:
        """User-facing read: winners only, no tombstones, metadata columns
        stripped — mirroring the reference's ``_airbyte_*`` stripping
        (``/root/reference/abm/connector.py:115-117``). ``buckets`` prunes
        to a subset of hash buckets — safe to read in parallel slices
        because every identity key lives wholly inside one bucket, so
        per-bucket LWW resolution is complete and the union of all bucket
        reads equals the full read (the per-bucket Flight endpoints lean on
        this)."""
        df = self.read_internal(version=version, buckets=buckets)
        live = df.filter(F.col(model.META_OP) != "d")
        keep = [c for c in live.columns if not c.startswith(model.META_PREFIX)]
        return live.select(*keep)

    def live_buckets(self) -> list[int]:
        """Buckets referenced by the current snapshot, ascending — the
        natural parallel-read split (one Flight endpoint per bucket)."""
        return sorted({e["bucket"] for e in self.current_snapshot()["entries"]})

    def entry_bytes(
        self, buckets: list[int] | None = None, version: int | None = None
    ) -> int:
        """On-disk parquet bytes of the snapshot entries serving ``buckets``
        (all buckets when None) — an upper bound on what a read of that
        slice returns (tombstones and LWW-superseded delta rows only
        shrink it). Metadata-sized: one listdir per entry dir, no Spark
        job; the Flight server uses it to pick the eager (bounded-slice)
        read path vs the streaming iterator."""
        snap = self.snapshot(version) if version is not None else self.current_snapshot()
        sel = None if buckets is None else set(buckets)
        total = 0
        for e in snap["entries"]:
            if sel is not None and e["bucket"] not in sel:
                continue
            d = os.path.join(self.path, e["dir"])
            try:
                for f in os.listdir(d):
                    if f.endswith(".parquet"):
                        total += os.path.getsize(os.path.join(d, f))
            except OSError:
                continue
        return total

    # ----------------------------------------------------------------- write
    def _stage_write(
        self,
        df: DataFrame,
        version: int,
        pre_partitioned: bool = False,
        buckets: list[int] | None = None,
    ) -> list[dict]:
        """Write rows grouped per bucket under a fresh commit dir; return
        snapshot entries [{dir, bucket, kind(placeholder)}].

        ``partitionBy`` on a shadow copy of the bucket column keeps
        ``_ab_bucket`` itself inside the data files (so parquet min/max stats
        prune at scan time) while producing one directory per bucket for
        metadata-level pruning. ``pre_partitioned`` promises the input is
        already hash-partitioned on the bucket column (the ingest pipeline's
        single shuffle), so the write adds no exchange and each bucket lands
        in exactly one file per commit.

        Manifest entries are computed from ``buckets`` — the bucket set of
        the staged rows, known to the caller (merge affects exactly the
        batch's buckets; compaction rewrites exactly the selected buckets) or
        derived here with one metadata-sized distinct — NEVER by listing the
        output directory afterwards: directory listing is both slow and
        non-atomic on object stores (Iceberg manifests are likewise derived
        from the write plan, not from LIST calls). Callers passing
        ``buckets`` guarantee every listed bucket has >= 1 row.
        """
        if buckets is None:
            buckets = [
                r[0] for r in df.select(model.BUCKET_COLUMN).distinct().collect()
            ]
        if not buckets:
            return []
        commit_dir = f"data/commit-{version}-{uuid.uuid4().hex[:8]}"
        out = os.path.join(self.path, commit_dir)
        staged = df if pre_partitioned else df.repartition(model.BUCKET_COLUMN)
        import time as _time

        t0 = _time.time()
        (
            staged.withColumn("_pb", F.col(model.BUCKET_COLUMN))
            .write.partitionBy("_pb")
            .parquet(out)
        )
        self.timings["stage_write"] = round(_time.time() - t0, 3)
        return [
            {"dir": f"{commit_dir}/_pb={int(b)}", "bucket": int(b)}
            for b in sorted(buckets)
        ]

    def with_bucket(self, df: DataFrame) -> DataFrame:
        keys = self.key_columns or [c for c in df.columns if c != model.BUCKET_COLUMN]
        return df.withColumn(model.BUCKET_COLUMN, bucket_expr(self.n_buckets, keys))

    def append_base(self, df: DataFrame) -> int:
        """Bulk-load rows as base files (initial backfill path)."""
        snap = self.current_snapshot()
        new_version = snap["version"] + 1
        entries = self._stage_write(self.with_bucket(df), new_version)
        for e in entries:
            e["kind"] = "base"
        new_snap = {
            **snap,
            "version": new_version,
            "parent": snap["version"],
            "entries": snap["entries"] + entries,
            "lineage": snap["lineage"],
        }
        self._write_snapshot(new_snap, expected_parent=snap["version"])
        return new_version

    # ----------------------------------------------------------------- merge
    # bounded optimistic-concurrency retries when another writer's commit
    # races ours between snapshot read and pointer CAS
    MERGE_CAS_RETRIES = 3

    def merge(
        self,
        changes: DataFrame,
        batch_id: int = 0,
        checkpoint_id: str = "adhoc",
        lineage: dict | None = None,
        pre_deduped: bool = False,
        pre_partitioned: bool = False,
        truncate: bool = False,
        offset_watermark: int | None = None,
        _attempts: int | None = None,
    ) -> int | None:
        """MERGE a change batch (parsed rows with ``_ab_*`` metadata cols)
        into the table. Returns the new snapshot version, or None if the
        batch was already applied (exactly-once skip).

        COW plans as: LWW-dedup batch → prune target to affected buckets →
        union + window (one shuffle, equivalent to the MERGE join but also
        deduping in the same exchange) → rewrite those buckets.
        MoR plans as: LWW-dedup batch → append delta files (no join at all);
        winners resolve at read; background ``compact()`` bounds read cost.

        ``pre_deduped``/``pre_partitioned`` let the ingest pipeline promise
        the batch is already LWW-resolved and bucket-hash-partitioned, so the
        MoR fast path adds zero extra shuffles.

        ``truncate=True`` makes this a REPLACEMENT commit (the atomic
        overwrite): the published snapshot references only the batch's
        files and a reset exactly-once record — one publish, so a crash at
        any point leaves either the complete old state or the complete new
        state, never an empty table (the r3 truncate-then-merge pair could).

        Concurrency: publish is a compare-and-swap on the parent version; on
        ``ConcurrentCommitError`` the merge retries up to
        ``MERGE_CAS_RETRIES`` times with a REBASE — re-read the head, skip
        if the racing writer already applied this very batch, re-point the
        already-staged files at the new head (MoR deltas and truncating
        replacements are position-independent, so this is metadata-only);
        a COW rewrite is recomputed against the new target instead (its
        staged files bake in the stale target) after removing the stale
        staging dir.

        ``offset_watermark``: the caller's assertion that every batch of
        this ``checkpoint_id`` with ``batch_id <`` the watermark has its
        offsets durably committed in the streaming checkpoint — Structured
        Streaming can then never redeliver them, so a KEYLESS table (whose
        applied-batches record is its only exactly-once defense) may prune
        those entries and keep snapshot metadata bounded instead of growing
        O(total batches) forever. The streaming sink passes its current
        batch_id (foreachBatch delivers batch N only after every batch < N
        committed); ad-hoc/batch merges pass None and keyless records are
        then never pruned (the r3 contract, unchanged). Keyed tables ignore
        it — their bounded window + LWW idempotence already covers aging.

        ``_attempts`` (internal) carries the REMAINING retry
        budget through the COW recomputation recursion so the bound is
        GLOBAL: without it each recursion level reset the budget, and under
        sustained contention the documented bound never applied (unbounded
        stack of full COW rewrites)."""
        attempts = self.MERGE_CAS_RETRIES if _attempts is None else _attempts
        snap = self.current_snapshot()
        key = f"{checkpoint_id}:{batch_id}"
        if key in snap["applied_batches"]:
            return None
        schema = self.schema(snap)
        mode = snap["properties"]["mode"]
        new_version = snap["version"] + 1

        keys = self.key_columns
        changes = self._conform(changes, schema)
        if model.BUCKET_COLUMN not in changes.columns:
            changes = self.with_bucket(changes)
            pre_partitioned = False
        winners = changes if pre_deduped or not keys else dedup_lww(changes, keys)

        if truncate:
            entries = self._stage_write(
                winners,
                new_version,
                pre_partitioned=pre_partitioned,
                buckets=lineage.get("buckets") if lineage else None,
            )
            for e in entries:
                e["kind"] = "base"
            new_entries = entries
        elif mode == "cow":
            # the affected-bucket set is already known from the lineage agg;
            # without lineage, one metadata-sized distinct
            buckets = (lineage or {}).get("buckets") or [
                r[0] for r in winners.select(model.BUCKET_COLUMN).distinct().collect()
            ]
            target = self._read_entries(
                [e for e in snap["entries"]], schema, buckets
            )
            merged = target.unionByName(winners)
            if keys:
                merged = dedup_lww(merged, keys)
            entries = self._stage_write(merged, new_version, buckets=buckets)
            for e in entries:
                e["kind"] = "base"
            kept = [e for e in snap["entries"] if e["bucket"] not in set(buckets)]
            new_entries = kept + entries
        else:  # mor
            # the batch's bucket set is already known from the lineage agg
            # (events and winners hit identical buckets: every event bucket
            # keeps >= 1 LWW winner); without lineage, one distinct job
            entries = self._stage_write(
                winners,
                new_version,
                pre_partitioned=pre_partitioned,
                buckets=lineage.get("buckets") if lineage else None,
            )
            for e in entries:
                e["kind"] = "delta"
            new_entries = snap["entries"] + entries

        staged_entries = entries
        max_applied = int(snap["properties"].get("max_applied_batches", 1024))
        for attempt in range(1 + attempts):
            if truncate:
                applied = {key: new_version}  # fresh state, fresh record
            else:
                applied = {**snap["applied_batches"], key: new_version}
                # Keyless (append-mode) tables prune ONLY below an explicit
                # offset watermark: the record is their ONLY exactly-once
                # defense (no LWW to make a re-applied aged-out batch a
                # no-op), so entries may be dropped only once the caller
                # asserts the streaming checkpoint has committed past them
                # (below which redelivery is impossible). Without a
                # watermark, keyless records are never pruned. Keyed tables
                # keep the bounded window (LWW is the second line of
                # defense).
                if keys and len(applied) > max_applied:
                    applied = dict(
                        sorted(applied.items(), key=lambda kv: kv[1])[-max_applied:]
                    )
                elif not keys and offset_watermark is not None:
                    def _committed_below(k: str) -> bool:
                        cp, _, b = k.rpartition(":")
                        try:
                            return cp == checkpoint_id and int(b) < offset_watermark
                        except ValueError:
                            return False

                    applied = {
                        k: v for k, v in applied.items() if not _committed_below(k)
                    }
            new_snap = {
                **snap,
                "version": new_version,
                "parent": snap["version"],
                "entries": new_entries,
                "applied_batches": applied,
                "lineage": (snap["lineage"] + [lineage])[-200:] if lineage else snap["lineage"],
            }
            try:
                self._write_snapshot(new_snap, expected_parent=snap["version"])
            except ConcurrentCommitError:
                if attempt == attempts:
                    raise
                snap = self.current_snapshot()
                if key in snap["applied_batches"]:
                    return None  # the racing writer delivered this batch
                if mode == "cow" and not truncate:
                    # staged rewrite baked in the stale target — drop the
                    # orphan staging dir and recompute against the new head
                    if staged_entries:
                        import shutil

                        shutil.rmtree(
                            os.path.dirname(
                                os.path.join(self.path, staged_entries[0]["dir"])
                            ),
                            ignore_errors=True,
                        )
                    return self.merge(
                        changes, batch_id, checkpoint_id, lineage,
                        pre_deduped, pre_partitioned,
                        offset_watermark=offset_watermark,
                        _attempts=attempts - attempt - 1,
                    )
                # MoR delta / truncating replacement: staged files are
                # position-independent — rebase metadata onto the new head
                new_version = snap["version"] + 1
                new_entries = (
                    staged_entries if truncate else snap["entries"] + staged_entries
                )
                continue
            # NOTE: merge never compacts inline — a hot bucket crossing the
            # delta threshold must not stall the ingest batch.
            # CdcPipeline._post_commit runs maintenance() after every Nth
            # committed batch (its ``maintenance_every`` option, default 16,
            # after the commit is durable); deployments that disable it must
            # schedule maintenance() as an external background job.
            return new_version

    def buckets_needing_compaction(self, limit: int | None = None) -> list[int]:
        """Buckets whose delta-file count has reached ``limit`` (defaults to
        the table's ``compact_after_deltas`` property)."""
        snap = self.current_snapshot()
        if snap["properties"]["mode"] != "mor":
            return []
        if limit is None:
            limit = int(snap["properties"].get("compact_after_deltas", 8))
        per_bucket: dict[int, int] = {}
        for e in snap["entries"]:
            if e["kind"] == "delta":
                per_bucket[e["bucket"]] = per_bucket.get(e["bucket"], 0) + 1
        return sorted(b for b, n in per_bucket.items() if n >= limit)

    def maintenance(self) -> int | None:
        """Explicit maintenance entry point (the Iceberg ``rewrite_data_files``
        + ``expireSnapshots`` analogue): compact every bucket at/over the
        delta threshold, then expire snapshot history past the retention
        window. Returns the new snapshot version, or None if nothing needed
        compaction. At cluster scale this runs as a scheduled background job
        — never inside ``merge()``."""
        hot = self.buckets_needing_compaction()
        version = self.compact(buckets=hot) if hot else None
        keep = int(
            self.current_snapshot()["properties"].get("snapshot_retention", 64)
        )
        self.expire_snapshots(keep_last=keep)
        return version

    def expire_snapshots(
        self, keep_last: int = 64, delete_orphan_data: bool = True
    ) -> list[int]:
        """Delete snapshot metadata older than the newest ``keep_last``
        versions and (by default) garbage-collect data dirs referenced ONLY
        by expired snapshots — without this, every compaction leaves its
        superseded base/delta files on storage forever. Never touches a dir
        any retained snapshot references. Returns the expired versions."""
        import shutil

        versions = self.catalog.list_snapshot_versions()
        keep = set(versions[-keep_last:]) | {self.current_version()}
        expired = [v for v in versions if v not in keep]
        if not expired:
            return []
        kept_dirs: set[str] = set()
        for v in keep:
            kept_dirs |= {e["dir"] for e in self.snapshot(v)["entries"]}
        for v in expired:
            if delete_orphan_data:
                for e in self.snapshot(v)["entries"]:
                    if e["dir"] not in kept_dirs:
                        shutil.rmtree(
                            os.path.join(self.path, e["dir"]), ignore_errors=True
                        )
                        kept_dirs.add(e["dir"])  # rmtree once per dir
            self.catalog.delete_snapshot(v)
        return expired

    def _conform(self, df: DataFrame, schema: T.StructType) -> DataFrame:
        """Project a change batch onto the table schema: missing columns
        null-filled (schema-evolution tolerance), extra columns rejected
        (caller must evolve() first), metadata columns passed through."""
        have = set(df.columns)
        cols = []
        for f_ in schema.fields:
            if f_.name in have:
                cols.append(F.col(f_.name).cast(f_.dataType))
            else:
                cols.append(F.lit(None).cast(f_.dataType).alias(f_.name))
        if model.BUCKET_COLUMN in have:
            cols.append(F.col(model.BUCKET_COLUMN))
        extra = have - {f_.name for f_ in schema.fields} - {model.BUCKET_COLUMN}
        if extra:
            raise ValueError(
                f"batch carries columns {sorted(extra)} not in table schema; "
                "call evolve() first (additive evolution only)"
            )
        return df.select(*cols)

    def evolve(self, new_fields: list[T.StructField]) -> int:
        """Additive schema evolution: widen the table schema, no data rewrite
        (SURVEY.md §2.8 T4). Old files read back null for new columns."""
        snap = self.current_snapshot()
        schema = self.schema(snap)
        existing = {f.name for f in schema.fields}
        add = [f for f in new_fields if f.name not in existing]
        if not add:
            return snap["version"]
        meta_idx = next(
            i for i, f in enumerate(schema.fields) if f.name.startswith(model.META_PREFIX)
        )
        fields = schema.fields[:meta_idx] + add + schema.fields[meta_idx:]
        new_version = snap["version"] + 1
        new_snap = {
            **snap,
            "version": new_version,
            "parent": snap["version"],
            "schema": T.StructType(fields).json(),
        }
        self._write_snapshot(new_snap, expected_parent=snap["version"])
        return new_version

    def compact(self, buckets: list[int] | None = None) -> int:
        """Fold delta files into base files for the given buckets (all if
        None): read union, resolve LWW winners (tombstones retained), rewrite
        as base. Bounds MoR read amplification; at cluster scale this runs as
        a background maintenance job per bucket range."""
        snap = self.current_snapshot()
        schema = self.schema(snap)
        all_buckets = {e["bucket"] for e in snap["entries"]}
        sel = sorted(all_buckets if buckets is None else set(buckets) & all_buckets)
        if not sel:
            return snap["version"]
        df = self._read_entries(snap["entries"], schema, sel)
        keys = snap["properties"].get("key_columns", model.KEY_COLUMNS)
        df = dedup_lww(df, keys) if keys else df
        new_version = snap["version"] + 1
        entries = self._stage_write(df, new_version, buckets=sel)
        for e in entries:
            e["kind"] = "base"
        kept = [e for e in snap["entries"] if e["bucket"] not in set(sel)]
        new_snap = {
            **snap,
            "version": new_version,
            "parent": snap["version"],
            "entries": kept + entries,
        }
        self._write_snapshot(new_snap, expected_parent=snap["version"])
        return new_version

    # ------------------------------------------------------------- utilities
    def changes(
        self, from_version: int, to_version: int | None = None
    ) -> DataFrame:
        """Net change rows applied between two snapshots — the CDC-consumer
        read (the engine-side analogue of the reference's Flight ``do_get``,
        but incremental: the reference re-reads full state per request,
        ``/root/reference/abm/server.py:140-159``).

        Returns one row per key changed in ``(from_version, to_version]``,
        LWW-resolved across the range, metadata columns (op/cursor/seq)
        retained so deletes are visible as tombstone rows.

        Two plans, one contract:

        - **Delta scan** (fast path) while the range's delta history is
          intact: read ONLY the files added in the range — cost scales
          with the delta, not the table.
        - **Snapshot diff** when a compaction / COW rewrite folded files
          inside the range: both snapshots remain readable (that is the
          point of a snapshot format — Iceberg's changelog scan must give
          up here because its rewrites fold equality-deletes away), so the
          net changes are recovered as ``LWW state at v2 minus state at
          v1`` joined on the identity key. One shuffle per side on the
          (uniform) key hash; cost scales with the table, so consumers
          polling faster than maintenance runs always stay on the fast
          path. Keys removed without a tombstone (a truncating
          replacement) surface as SYNTHESIZED tombstones (op='d', null
          payload/cursor).

        KEYLESS tables have no identity to diff on: a rewritten range
        still raises ValueError there (consumers fall back to a full
        read). An EXPIRED from-snapshot raises FileNotFoundError from the
        catalog — same fallback."""
        to_snap = (
            self.current_snapshot() if to_version is None else self.snapshot(to_version)
        )
        from_snap = self.snapshot(from_version)
        old_dirs = {e["dir"] for e in from_snap["entries"]}
        new_dirs = {e["dir"] for e in to_snap["entries"]}
        new_entries = [e for e in to_snap["entries"] if e["dir"] not in old_dirs]
        keys = to_snap["properties"].get("key_columns", model.KEY_COLUMNS)
        if (old_dirs - new_dirs) or any(e["kind"] != "delta" for e in new_entries):
            if not keys:
                raise ValueError(
                    f"delta history between v{from_version} and "
                    f"v{to_snap['version']} was rewritten (compaction or COW "
                    "merge) and the table is keyless; read the full state "
                    "instead"
                )
            return self._changes_by_state_diff(from_snap, to_snap, keys)
        schema = self.schema(to_snap)
        df = self._read_entries(new_entries, schema, buckets=None)
        if keys:
            df = dedup_lww(df, keys)
        return df.drop(model.BUCKET_COLUMN)

    def _changes_by_state_diff(
        self, from_snap: dict, to_snap: dict, keys: list[str]
    ) -> DataFrame:
        """Net changes across a rewritten range: LWW state at ``to_snap``
        minus state at ``from_snap``, joined on the identity key. A key is
        emitted iff its winning (cursor, seq) changed, it is new, or it
        vanished (truncating replacement → synthesized tombstone). Rows
        merely REWRITTEN by compaction keep their (cursor, seq) and drop
        out — the diff is exactly the net change set."""
        old = self.read_internal(version=from_snap["version"]).select(
            *keys,
            F.col(model.META_EMITTED).alias("_o_emitted"),
            F.col(model.META_SEQ).alias("_o_seq"),
        )
        new = self.read_internal(version=to_snap["version"]).drop(model.BUCKET_COLUMN)
        out_cols = new.columns
        j = new.join(old, keys, "full_outer")
        vanished = F.col(model.META_SEQ).isNull()  # never null for real rows
        changed = j.filter(
            vanished
            | F.col("_o_seq").isNull()
            | (F.col(model.META_EMITTED) != F.col("_o_emitted"))
            | (F.col(model.META_SEQ) != F.col("_o_seq"))
        )
        return changed.select(
            *[
                F.when(vanished, F.lit("d")).otherwise(F.col(c)).alias(c)
                if c == model.META_OP
                else F.col(c)
                for c in out_cols
            ]
        )

    def lineage(self) -> list[dict]:
        return self.current_snapshot()["lineage"]

    def digest(self, cols: list[str] | None = None, commutative: bool = False) -> str:
        """Order- and partitioning-independent table digest of the
        user-facing rows.

        Default form: sha256 over the SORTED per-row sha256 fingerprints —
        maximal discrimination, but ``collect_list`` funnels every row hash
        into one aggregation buffer, which caps it at memory-sized tables.

        ``commutative=True`` is the 10^10-row form: the same per-row sha256
        folds through three commutative aggregates — row count, sum of the
        24-bit hash prefix (wraparound-free below 2^39 rows even in ANSI
        mode), and xor of the 60-bit prefix — and the digest is the sha256
        of that triple. Fully map-side-combining, constant memory, one
        metadata-sized exchange; sum carries multiset multiplicity (xor
        alone would cancel duplicate rows when ``cols`` projects away the
        identity key). Mirrored exactly by ``oracle.table_digest(...,
        commutative=True)``."""
        df = self.read()
        cols = cols or df.columns
        row_hash = F.sha2(
            F.concat_ws("|", *[F.coalesce(F.col(c).cast("string"), F.lit("")) for c in cols]),
            256,
        )
        if commutative:
            h = df.select(row_hash.alias("h"))
            agg = h.agg(
                F.count("*").alias("n"),
                F.sum(F.conv(F.substring("h", 1, 6), 16, 10).cast("long")).alias("s"),
                F.expr(
                    "bit_xor(cast(conv(substring(h, 1, 15), 16, 10) as bigint))"
                ).alias("x"),
            )
            row = agg.collect()[0]
            material = f"{row['n']}:{row['s'] or 0}:{row['x'] or 0}"
            import hashlib

            return hashlib.sha256(material.encode()).hexdigest()
        agg = df.select(row_hash.alias("h")).agg(
            F.sha2(F.concat_ws("\n", F.sort_array(F.collect_list("h"))), 256).alias("d")
        )
        return agg.collect()[0]["d"]
