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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from airbyte_module_spark import model
from airbyte_module_spark.functions import content as cf
from airbyte_module_spark.lake.table import LakeTable, dedup_lww
from airbyte_module_spark.plans.lineage import lineage_from_batch
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
    ):
        """``use_pandas_udfs`` switches normalize/sha to the Arrow-batched
        pandas UDF implementations (both are vectorized; the expression form
        stays fully inside whole-stage codegen and is the default)."""
        self.table = table
        self.stream = stream
        self.use_pandas_udfs = use_pandas_udfs
        self.auto_evolve = auto_evolve
        self.collect_lineage = collect_lineage

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
    def _maybe_evolve(self, raw: DataFrame) -> None:
        """Additive schema evolution (FIXTURES.md F5): detect data fields not
        yet in the table schema, infer a conservative type from a sample
        value, widen the table. Runs per micro-batch; the distinct-keys probe
        is one small aggregation over the batch."""
        known = {f.name for f in self.data_schema().fields}
        observed = feed_src.observed_data_fields(raw, self.stream)
        new = [k for k in observed if k not in known]
        if not new:
            return
        env = raw.select(F.from_json(F.col("value"), model.ENVELOPE_SCHEMA).alias("m"))
        fields = []
        for name in new:
            sample = (
                env.select(
                    F.get_json_object(F.col("m.record.data"), f"$.{name}").alias("v")
                )
                .filter(F.col("v").isNotNull())
                .limit(1)
                .collect()
            )
            v = sample[0]["v"] if sample else None
            if v is not None and _INT_RE.match(v):
                dt: T.DataType = T.LongType()
            elif v is not None and _FLOAT_RE.match(v):
                dt = T.DoubleType()
            else:
                dt = T.StringType()
            fields.append(T.StructField(name, dt, True))
        self.table.evolve(fields)

    # ----------------------------------------------------------------- batch
    def apply_batch(
        self, raw: DataFrame, batch_id: int = 0, checkpoint_id: str = "adhoc"
    ) -> int | None:
        """Parse + transform + lineage + MERGE one batch of raw envelope
        lines. Shared by batch replay and the streaming sink."""
        if self.auto_evolve:
            self._maybe_evolve(raw)
        changes = feed_src.parse_envelopes(raw, self.data_schema(), self.stream)
        changes = self.table.with_bucket(self.transform(changes))
        # lineage + merge both consume the parsed batch: cache it once so the
        # parse/normalize/sha work runs a single time per micro-batch
        changes.persist()
        try:
            lineage = None
            if self.collect_lineage:
                winners = dedup_lww(changes, self.table.key_columns)
                lineage = lineage_from_batch(
                    changes, winners, batch_id, checkpoint_id
                ).to_dict()
            return self.table.merge(
                changes, batch_id=batch_id, checkpoint_id=checkpoint_id,
                lineage=lineage,
            )
        finally:
            changes.unpersist()

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

        def sink(batch_df: DataFrame, batch_id: int) -> None:
            self.apply_batch(batch_df, batch_id=batch_id, checkpoint_id=checkpoint_id)

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
        return query


def throughput(n_events: int, started: float) -> float:
    return n_events / max(time.time() - started, 1e-9)
