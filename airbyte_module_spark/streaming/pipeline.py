"""CDC pipeline: change-feed tail → transform → MERGE, batch or streaming.

The streaming tail is Structured Streaming with a checkpointed
``foreachBatch`` sink (SURVEY.md §3.4). Both entry points share one code
path: ``trigger(availableNow=True)`` gives bounded replay of everything in
the feed directory; ``processingTime`` gives a continuous tail. Restarting
from the checkpoint resumes at the last committed source offset, and the
``(checkpoint_id, batch_id)`` dedup inside :meth:`LakeTable.merge` makes
re-delivered batches no-ops — together: exactly-once effective semantics
(SURVEY.md §2.8 T2).

Replaces the reference's pull loop — one full_refresh connector run per HTTP/
Flight request (``/root/reference/abm/connector.py:223``, cursors disabled at
``:226``) — with an incremental, resumable, cursor-aware stream.
"""

from __future__ import annotations

import re
import time

from pyspark import StorageLevel
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from airbyte_module_spark import model
from airbyte_module_spark.functions import content as cf
from airbyte_module_spark.lake.table import LakeTable
from airbyte_module_spark.plans.lineage import lineage_from_batch, lineage_from_grouped
from airbyte_module_spark.sources import feed as feed_src

_INT_RE = re.compile(r"^-?\d+$")
_FLOAT_RE = re.compile(r"^-?\d+\.\d+([eE][+-]?\d+)?$")


class CdcPipeline:
    def __init__(
        self,
        table: LakeTable,
        stream: str = model.STREAM_NAME,
        use_pandas_udfs: bool = False,
        auto_evolve: bool = True,
        collect_lineage: bool = True,
        post_merge_hook=None,
        maintenance_every: int | None = 16,
    ):
        """``use_pandas_udfs`` switches normalize/sha to the Arrow-batched
        pandas UDF implementations (both are vectorized; the expression form
        stays fully inside whole-stage codegen and is the default).

        ``post_merge_hook``: optional ``callable(table, version)`` invoked
        after each successfully committed merge — the user-pluggable
        equivalent of the reference's post-write dbt normalization container
        (``/root/reference/abm/normalization.py:28-42``, invoked at
        ``abm/server.py:219-228``), except it receives the committed table
        instead of re-reading it through a second container. Runs after the
        commit, so a hook failure never loses the batch; exactly-once skips
        (already-applied batches) do not re-fire it.

        ``maintenance_every``: run :meth:`LakeTable.maintenance` (compact
        buckets over the delta threshold) after every Nth committed batch —
        off the commit critical path (the batch is already durable when it
        runs) but inside the sink, so a long MoR replay/tail bounds its own
        delta growth without an operator remembering to schedule anything.
        ``None`` disables it (run maintenance() as an external background
        job instead — the cluster-scale deployment shape)."""
        self.table = table
        self.stream = stream
        self.use_pandas_udfs = use_pandas_udfs
        self.auto_evolve = auto_evolve
        self.collect_lineage = collect_lineage
        self.post_merge_hook = post_merge_hook
        self.maintenance_every = maintenance_every
        self._batches_since_maintenance = 0
        # per-batch phase wall-times (overwritten each batch) — the
        # serial-fraction profile behind the N→4N scaling evidence
        # (scripts/scaling_bench.py --profile reads this)
        self.timings: dict[str, float] = {}
        # accumulated per-batch profiles + streaming progress (reset by
        # replay_stream) — the multibatch overhead attribution reads these
        self.batch_profiles: list[dict] = []
        self.stream_progress: list[dict] = []

    def _post_commit(self, version: int | None) -> None:
        """After a durable commit: fire the user hook, then scheduled
        maintenance every Nth applied batch (never on exactly-once skips)."""
        if version is None:
            return
        if self.post_merge_hook is not None:
            self.post_merge_hook(self.table, version)
        if self.maintenance_every:
            self._batches_since_maintenance += 1
            if self._batches_since_maintenance >= self.maintenance_every:
                self._batches_since_maintenance = 0
                self.table.maintenance()

    # ------------------------------------------------------------ transforms
    def data_schema(self) -> T.StructType:
        """Parse schema for the data payload, derived from the current table
        schema (so it widens automatically after evolution)."""
        fields = [
            T.StructField("op", T.StringType(), True),
            T.StructField("seq", T.LongType(), True),
        ]
        for f_ in self.table.schema().fields:
            if not f_.name.startswith(model.META_PREFIX):
                fields.append(T.StructField(f_.name, f_.dataType, True))
        return T.StructType(fields)

    def transform(self, changes: DataFrame) -> DataFrame:
        """Normalize content + sha256 fingerprint (north_star F6/F7).
        Tombstones keep null content/sha."""
        if self.use_pandas_udfs:
            norm = cf.normalize_content(F.col("content"))
            changes = changes.withColumn("content", norm)
            sha = cf.sha256_content(F.col("content"))
        else:
            changes = changes.withColumn(
                "content", cf.normalize_content_expr(F.col("content"))
            )
            sha = cf.sha256_expr(F.col("content"))
        return changes.withColumn(
            model.META_SHA,
            F.when(F.col("content").isNotNull(), sha),
        )

    # ------------------------------------------------------------- evolution
    def _evolve_new_fields(self, raw: DataFrame, new: list[str]) -> None:
        """Widen the table for fields that appeared mid-stream: infer a
        conservative type from one sample value per field (the reference
        plays the same 'number may be int or double, play it safe' game at
        ``/root/reference/abm/connector.py:182-185``). Runs only on the rare
        batch that actually carries new fields, and samples ALL new fields
        in ONE aggregation job (first non-null value per field rides a
        single pass over the batch) instead of one limit/collect job per
        field."""
        env = raw.select(F.from_json(F.col("value"), model.ENVELOPE_SCHEMA).alias("m"))
        samples = env.agg(
            *[
                F.first(
                    F.get_json_object(F.col("m.record.data"), f"$.{name}"),
                    ignorenulls=True,
                ).alias(name)
                for name in new
            ]
        ).collect()[0]
        self.table.evolve(self._infer_fields(samples, new))

    def _evolve_new_fields_from_winners(self, grouped: DataFrame, new: list[str]) -> None:
        """Same type inference, sampling the CACHED winner lines (one job
        over 1-row-per-key data) — the keyed path never re-reads the feed
        for evolution."""
        samples = grouped.agg(
            *[
                F.first(
                    F.get_json_object(F.col("_w.value"), f"$.record.data.{name}"),
                    ignorenulls=True,
                ).alias(name)
                for name in new
            ]
        ).collect()[0]
        self.table.evolve(self._infer_fields(samples, new))

    @staticmethod
    def _infer_fields(samples, new: list[str]) -> list[T.StructField]:
        fields = []
        for name in new:
            v = samples[name]
            if v is not None and _INT_RE.match(v):
                dt: T.DataType = T.LongType()
            elif v is not None and _FLOAT_RE.match(v):
                dt = T.DoubleType()
            else:
                dt = T.StringType()
            fields.append(T.StructField(name, dt, True))
        return fields

    # ----------------------------------------------------------------- batch
    def apply_batch(
        self,
        raw: DataFrame,
        batch_id: int = 0,
        checkpoint_id: str = "adhoc",
        offset_watermark: int | None = None,
    ) -> int | None:
        """Parse + dedup + transform + lineage + MERGE one batch of raw
        envelope lines. Shared by batch replay and the streaming sink.

        ``offset_watermark`` is forwarded to ``LakeTable.merge``; ONLY the
        streaming sink sets it (to its own ``batch_id``) because only
        Structured Streaming's checkpoint gives the can-never-redeliver
        guarantee the watermark asserts. Ad-hoc/batch replays leave it None
        and keyless exactly-once records are then never pruned.

        Plan shape — minimal parse, full decode on WINNERS only:

        1. ``parse_envelopes_minimal``: ONE ``from_json`` per line typing
           only identity keys + op + seq (+ the envelope cursor); the raw
           line rides along untouched. No full-payload decode, no second
           ``json_object_keys`` parse — at a 20:1 conflict ratio, fully
           decoding every event pays ~20x the decode the table needs
           (measured: the r2 full-width parse with the probe column was
           2.2x this parse on the 10M-event replay).
        2. ONE aggregation over (bucket, key): the LWW winner's raw line
           (``max_by`` over the cursor — see lake.table.dedup_lww for why
           an aggregate, not a window), event count, cursor/offset ranges.
           The buffer carries (line, cursor) — map-side partial aggregation
           collapses conflicts before the exchange. The tiny aggregate
           (1 row per live key) is what gets cached — never the parsed
           full-width feed (caching that measured 20s vs 4.7s at r1).
        3. The schema-evolution probe (``json_object_keys``), lineage, the
           full payload decode, normalize + sha256 all run on winners only.
           A new field triggers evolution when a WINNING row carries it (a
           field seen only on LWW losers is superseded data); since winner
           selection is schema-independent, evolution widens the table and
           re-projects the CACHED winners — no second pass over the feed.
        4. winners take one cheap repartition onto the bucket key for the
           per-bucket file write.
        """
        keys = self.table.key_columns
        if not keys:
            return self._apply_batch_keyless(
                raw, batch_id, checkpoint_id, offset_watermark
            )

        tm = self.timings = {}
        t_batch = time.time()
        order_key = F.struct(F.col(model.META_EMITTED), F.col(model.META_SEQ))
        key_types = {
            f.name: f.dataType
            for f in self.table.schema().fields
            if f.name in keys
        }
        minimal = feed_src.parse_envelopes_minimal(
            raw, keys, self.stream, key_types=key_types
        )
        minimal = self.table.with_bucket(minimal)
        aggs = [
            F.max_by(
                F.struct(
                    F.col("value"),
                    F.col(model.META_EMITTED),
                    F.col(model.META_SEQ),
                    F.col(model.META_OP),  # lineage counts winner deletes
                ),
                order_key,
            ).alias("_w"),
            F.count("*").alias("_n"),
            F.min(model.META_EMITTED).alias("_mne"),
            F.max(model.META_EMITTED).alias("_mxe"),
            F.min(model.META_SEQ).alias("_mns"),
            F.max(model.META_SEQ).alias("_mxs"),
        ]
        grouped = minimal.groupBy(model.BUCKET_COLUMN, *keys).agg(*aggs)
        # explicit spill level: the cache is 1 row per live key in the
        # batch — metadata-sized at normal batch cadence, but a 10^9-key
        # backfill batch must spill to disk, not evict-and-recompute the
        # full parse+agg (MEMORY_AND_DISK is also Spark's default for
        # DataFrame.persist; pinned here so the spill behavior is a
        # documented decision, not an inherited default)
        grouped.persist(StorageLevel.MEMORY_AND_DISK)
        try:
            lineage_obj = None
            if self.auto_evolve:
                t0 = time.time()
                if self.collect_lineage:
                    # probe + lineage in ONE driver job: the evolution
                    # probe's distinct key names ride the lineage
                    # aggregation over the cached per-key winners (see
                    # lineage_from_grouped) — at tail cadence the fixed
                    # per-job cost dominated both when run separately
                    lineage_obj, observed = lineage_from_grouped(
                        grouped, batch_id, checkpoint_id,
                        with_observed_keys=True,
                    )
                else:
                    observed = [
                        r[0]
                        for r in grouped.select(
                            F.explode(
                                F.json_object_keys(
                                    F.get_json_object(
                                        F.col("_w.value"), "$.record.data"
                                    )
                                )
                            ).alias("k")
                        ).distinct().collect()
                    ]
                tm["probe_collect"] = round(time.time() - t0, 3)
                known = {f.name for f in self.data_schema().fields}
                new = sorted(k for k in observed if k not in known)
                if new:
                    self._evolve_new_fields_from_winners(grouped, new)

            schema = self.data_schema()
            lineage = None
            if self.collect_lineage:
                t0 = time.time()
                if lineage_obj is None:
                    lineage_obj = lineage_from_grouped(
                        grouped, batch_id, checkpoint_id
                    )
                lineage = lineage_obj.to_dict()
                tm["lineage_collect"] = round(time.time() - t0, 3)

            # shuffle.partitions can be non-numeric on some platforms
            # (e.g. "auto" under auto-optimized shuffle) — fall back to
            # the scheduler's default parallelism
            try:
                conf_parts = int(
                    self.table.spark.conf.get("spark.sql.shuffle.partitions")
                )
            except (TypeError, ValueError):
                conf_parts = self.table.spark.sparkContext.defaultParallelism
            n_parts = max(self.table.n_buckets, conf_parts)

            # full decode of the winning lines (5% of events at 20:1
            # conflict), projected through the current — possibly just
            # widened — schema
            env_schema = model.envelope_schema(schema)
            user_cols = [
                f.name for f in schema.fields if f.name not in ("op", "seq")
            ]
            w = grouped.select(
                F.col(model.BUCKET_COLUMN),
                F.col(f"_w.{model.META_EMITTED}").alias(model.META_EMITTED),
                F.col(f"_w.{model.META_SEQ}").alias(model.META_SEQ),
                F.from_json(F.col("_w.value"), env_schema).alias("m"),
            )
            winners = w.select(
                *[F.col(f"m.record.data.{c}").alias(c) for c in user_cols],
                F.col(model.META_EMITTED),
                F.col(model.META_SEQ),
                F.col("m.record.data.op").alias(model.META_OP),
                F.col(model.BUCKET_COLUMN),
            )
            winners = winners.repartition(n_parts, F.col(model.BUCKET_COLUMN))
            if "content" in winners.columns:
                winners = self.transform(winners)
            t0 = time.time()
            version = self.table.merge(
                winners,
                batch_id=batch_id,
                checkpoint_id=checkpoint_id,
                lineage=lineage,
                pre_deduped=True,
                pre_partitioned=True,
            )
            tm["merge"] = round(time.time() - t0, 3)
            tm["apply_batch_total"] = round(time.time() - t_batch, 3)
            t0 = time.time()
            self._post_commit(version)
            # post-commit (hook + scheduled maintenance) runs AFTER the
            # apply_batch total so the multibatch attribution can separate
            # engine maintenance from Structured Streaming machinery
            tm["post_commit"] = round(time.time() - t0, 3)
            self.batch_profiles = (self.batch_profiles + [dict(tm)])[-1024:]
            return version
        finally:
            grouped.unpersist()

    def _apply_batch_keyless(
        self,
        raw: DataFrame,
        batch_id: int,
        checkpoint_id: str,
        offset_watermark: int | None = None,
    ) -> int | None:
        """Append-only path (no identity key — the reference's plain append
        sink, abm/server.py:182-187): no dedup; probe + lineage aggregate the
        parsed batch directly."""
        schema = self.data_schema()
        parsed = feed_src.parse_envelopes_once(
            raw, schema, self.stream, with_keys=self.auto_evolve
        )
        parsed = self.table.with_bucket(parsed)
        parsed.persist(StorageLevel.MEMORY_AND_DISK)
        try:
            if self.auto_evolve:
                observed = [
                    r[0]
                    for r in parsed.select(
                        F.explode(model.META_KEYS).alias("k")
                    ).distinct().collect()
                ]
                known = {f.name for f in schema.fields}
                new = sorted(k for k in observed if k not in known)
                parsed = parsed.drop(model.META_KEYS)
                if new:
                    self._evolve_new_fields(raw, new)
                    parsed.unpersist()
                    parsed = self.table.with_bucket(
                        feed_src.parse_envelopes_once(
                            raw, self.data_schema(), self.stream
                        )
                    )
                    parsed.persist(StorageLevel.MEMORY_AND_DISK)
            winners = parsed
            if "content" in winners.columns:
                winners = self.transform(winners)
            lineage = None
            if self.collect_lineage:
                lineage = lineage_from_batch(
                    parsed, winners, batch_id, checkpoint_id
                ).to_dict()
            version = self.table.merge(
                winners,
                batch_id=batch_id,
                checkpoint_id=checkpoint_id,
                lineage=lineage,
                pre_deduped=True,
                pre_partitioned=False,
                offset_watermark=offset_watermark,
            )
            self._post_commit(version)
            return version
        finally:
            parsed.unpersist()

    def replay_batch(self, feed_path: str, checkpoint_id: str = "batch-replay") -> int | None:
        """One-shot batch replay of an entire feed directory (backfill path).
        Same semantics as the streaming replay — final state is batch-
        boundary independent."""
        raw = feed_src.read_feed(self.table.spark, feed_path)
        return self.apply_batch(raw, batch_id=0, checkpoint_id=checkpoint_id)

    # ------------------------------------------------------------- streaming
    def replay_stream(
        self,
        feed_path: str,
        checkpoint_dir: str,
        max_files_per_trigger: int | None = None,
        processing_time: str | None = None,
        timeout_sec: float | None = None,
    ):
        """Streaming ingest with checkpointed offsets.

        ``processing_time=None`` → ``trigger(availableNow=True)``: process
        everything currently in the feed then stop (bounded replay / resume).
        Otherwise a continuous tail at the given cadence.
        """
        raw = feed_src.read_feed_stream(
            self.table.spark, feed_path, max_files_per_trigger
        )
        checkpoint_id = checkpoint_dir
        self.batch_profiles = []
        self.stream_progress = []

        def sink(batch_df: DataFrame, batch_id: int) -> None:
            # foreachBatch delivers batch N only after every batch < N has
            # its offsets durably committed in this checkpoint, so batch_id
            # is a valid can-never-redeliver watermark (batch N itself may
            # re-run after a crash — strictly-below pruning keeps its entry)
            self.apply_batch(
                batch_df,
                batch_id=batch_id,
                checkpoint_id=checkpoint_id,
                offset_watermark=batch_id,
            )

        writer = raw.writeStream.foreachBatch(sink).option(
            "checkpointLocation", checkpoint_dir
        )
        if processing_time:
            writer = writer.trigger(processingTime=processing_time)
        else:
            writer = writer.trigger(availableNow=True)
        query = writer.start()
        if processing_time is None:
            query.awaitTermination(timeout_sec)
            # per-trigger duration breakdown (latestOffset / walCommit /
            # addBatch / commitOffsets ...) — the only visibility into what
            # Structured Streaming spends OUTSIDE apply_batch; metadata-
            # sized and read by the multibatch attribution
            import json as _json

            self.stream_progress = [
                _json.loads(p.json) for p in query.recentProgress
            ]
        return query


def throughput(n_events: int, started: float) -> float:
    return n_events / max(time.time() - started, 1e-9)
