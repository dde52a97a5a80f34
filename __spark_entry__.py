"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the full CDC engine end-to-end (envelope feed derived from the
sf0.001 events table → streaming-semantics replay → MERGE → final state).
``queries``/``oracle_sql`` expose the SURVEY.md §2 operator surface in a form
DuckDB can cross-check (see airbyte_module_spark/queries.py for the
determinism rules; streaming-only operators T1-T4 are not SQL-expressible and
are covered by the pytest suite instead).
"""

from __future__ import annotations

import shutil
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from airbyte_module_spark import queries as Q
from airbyte_module_spark.oracle_sql import ORACLES


def _events_as_feed(spark: SparkSession, sf_dir: str, out_dir: str, shards: int = 8) -> None:
    """Render the events table as Airbyte-style envelope NDJSON shards —
    entirely JVM-side (to_json), the inverse of the engine's parse path."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    op = (
        F.when(F.col("event_type") == "signup", F.lit("i"))
        .when(F.col("event_type") == "error", F.lit("d"))
        .otherwise(F.lit("u"))
    )
    data = F.struct(
        op.alias("op"),
        F.col("event_id").alias("seq"),
        F.concat(F.lit("org"), (F.col("user_id") % 5).cast("string"),
                 F.lit("/project"), (F.col("user_id") % 23).cast("string")).alias("repo"),
        F.concat(F.lit("src/file_"), F.col("user_id").cast("string"), F.lit(".py")).alias("path"),
        F.substring(F.sha2(F.col("event_id").cast("string"), 256), 1, 40).alias("commit"),
        F.col("event_type").alias("lang"),
        F.when(op == "d", F.lit(None).cast("string")).otherwise(F.col("props")).alias("content"),
    )
    envelope = F.to_json(
        F.struct(
            F.lit("RECORD").alias("type"),
            F.struct(
                F.lit("repo_files").alias("stream"),
                F.lit("public").alias("namespace"),
                F.unix_millis(F.col("ts").cast("timestamp")).alias("emitted_at"),
                data.alias("data"),
            ).alias("record"),
        )
    )
    ev.select(envelope.alias("value")).repartition(shards).write.mode("overwrite").text(out_dir)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full CDC replay of sf0.001 events into a lake table; returns
    the merged final state (one row per surviving key, LWW semantics)."""
    from airbyte_module_spark import Engine

    work = tempfile.mkdtemp(prefix="ams_entry_")
    _events_as_feed(spark, "/root/testdata/sf0.001", f"{work}/feed")
    shutil.rmtree(f"{work}/table", ignore_errors=True)
    eng = Engine(spark, f"{work}/table")
    eng.replay(f"{work}/feed", checkpoint_dir=f"{work}/ck")
    return eng.read()


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "cdc_lww_dedup": Q.cdc_lww_dedup,
        "cdc_final_state": Q.cdc_final_state,
        "cdc_op_routing": Q.cdc_op_routing,
        "cdc_batch_lineage": Q.cdc_batch_lineage,
        "cdc_conflicts": Q.cdc_conflicts,
        "cdc_table_fingerprint": Q.cdc_table_fingerprint,
        "content_normalize_sha": Q.content_normalize_sha,
        "redact_columns": Q.redact_columns,
        "text_token_count": Q.text_token_count,
        "text_quality_score": Q.text_quality_score,
        "text_langid": Q.text_langid,
        "dedup_exact": Q.dedup_exact,
        "doc_fingerprint": Q.doc_fingerprint,
        "dedup_minhash": Q.dedup_minhash,
        "dedup_minhash_lsh": Q.dedup_minhash_lsh,
        "dedup_simhash": Q.dedup_simhash,
        "dedup_ngram_jaccard": Q.dedup_ngram_jaccard,
        "embedding_near_dup": Q.embedding_near_dup,
        "embedding_near_dup_lsh": Q.embedding_near_dup_lsh,
        "ann_topk": Q.ann_topk,
        "ann_lsh_buckets": Q.ann_lsh_buckets,
        "ann_topk_lsh": Q.ann_topk_lsh,
        "ann_topk_multiprobe": Q.ann_topk_multiprobe,
        "ann_ivf_cells": Q.ann_ivf_cells,
        "ann_topk_ivf": Q.ann_topk_ivf,
        "multimodal_meta": Q.multimodal_meta,
        "envelope_parse": Q.envelope_parse,
        "merge_routing": Q.merge_routing,
        "salted_join": Q.salted_join,
        "file_roundtrip_csv": Q.file_roundtrip_csv,
        "schema_discovery": Q.schema_discovery,
    }


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
