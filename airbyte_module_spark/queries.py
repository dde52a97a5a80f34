"""Oracle-checkable query surface (driver contract, SURVEY.md §2 coverage).

Each function here takes ``(spark, sf_dir)`` and returns a DataFrame; the
matching ANSI-SQL oracle lives in ``__spark_entry__.oracle_sql``. Because the
driver hash-compares values, every query follows three determinism rules:

1. hashes are sha256 only (identical hex output in Spark and DuckDB);
2. floats are either raw parquet values or a single division of
   deterministically-derived integers (IEEE-identical across engines) —
   never order-dependent float aggregates;
3. every computed column is aliased identically here and in the oracle SQL.

The ``events`` table stands in for the CDC feed in these cross-checked
queries (key = user_id, cursor = (ts, event_id), ``error`` events = deletes);
the real envelope feed path is exercised by the pytest suite and ``entry()``,
which run the full engine against the pandas oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def _documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/customer.parquet")


def _cursor():
    return F.unix_millis(F.col("ts").cast("timestamp"))


def _winners(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LWW winners per key: row_number over (cursor, event_id) desc —
    the W1 operator (SURVEY.md §2.5) on the stand-in feed."""
    w = Window.partitionBy("user_id").orderBy(
        _cursor().desc(), F.col("event_id").desc()
    )
    return (
        _events(spark, sf_dir)
        .withColumn("cursor_ms", _cursor())
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


# --------------------------------------------------------------------- W1/P6
def cdc_lww_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-writer-wins winner per key (window/row_number over the cursor)."""
    return _winners(spark, sf_dir).select(
        F.col("user_id").alias("key_id"),
        F.col("event_id").alias("winner_event_id"),
        F.col("cursor_ms"),
        F.col("event_type").alias("winner_type"),
        F.col("value").alias("winner_value"),
    )


def cdc_final_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Final MERGE state: LWW winners minus deletes (error = tombstone),
    with the sha256 row fingerprint (F6)."""
    return (
        _winners(spark, sf_dir)
        .filter(F.col("event_type") != "error")
        .select(
            F.col("user_id").alias("key_id"),
            F.col("event_id").alias("winner_event_id"),
            F.col("event_type").alias("winner_type"),
            F.col("value").alias("winner_value"),
            F.sha2(F.col("props"), 256).alias("props_sha"),
        )
    )


def cdc_op_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6: insert/update/delete routing — classify and count event ops."""
    op = (
        F.when(F.col("event_type") == "signup", F.lit("i"))
        .when(F.col("event_type") == "error", F.lit("d"))
        .otherwise(F.lit("u"))
    )
    return (
        _events(spark, sf_dir)
        .select(op.alias("op"), "user_id")
        .groupBy("op")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_keys"),
        )
    )


# ----------------------------------------------------------------------- A1
def cdc_batch_lineage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-partition lineage: offset range + rows per ingest bucket
    (bucket = key mod 8 here so the oracle can reproduce it portably)."""
    return (
        _events(spark, sf_dir)
        .withColumn("bucket", F.pmod(F.col("user_id"), F.lit(8)).cast("bigint"))
        .withColumn("cursor_ms", _cursor())
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_events"),
            F.min("cursor_ms").alias("min_cursor_ms"),
            F.max("cursor_ms").alias("max_cursor_ms"),
            F.min("event_id").alias("min_offset"),
            F.max("event_id").alias("max_offset"),
        )
    )


def cdc_conflicts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-conflict accounting per key: events superseded by LWW."""
    return (
        _events(spark, sf_dir)
        .groupBy(F.col("user_id").alias("key_id"))
        .agg(
            F.count("*").alias("n_events"),
            (F.count("*") - F.lit(1)).alias("n_conflicts"),
        )
    )


# ----------------------------------------------------------------------- A2
def cdc_table_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order/partitioning-independent table digest of the final state:
    commutative bit_xor fold over per-row sha256 prefixes (the scale-safe
    variant of the digest; see LakeTable.digest)."""
    rows = cdc_final_state(spark, sf_dir)
    row_hash = F.sha2(
        F.concat_ws(
            "|",
            F.col("key_id").cast("string"),
            F.col("winner_event_id").cast("string"),
            F.col("winner_type"),
            F.col("props_sha"),
        ),
        256,
    )
    h64 = F.conv(F.substring(row_hash, 1, 15), 16, 10).cast("bigint")
    return rows.select(h64.alias("h")).agg(
        F.count("*").alias("n_rows"),
        F.bit_xor("h").alias("table_digest"),
    )


# -------------------------------------------------------------------- F6/F7
def content_normalize_sha(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content normalization + sha256 fingerprint over documents (the text
    corpus stand-in for repo file contents)."""
    from airbyte_module_spark.functions.content import (
        normalize_content_expr,
        sha256_expr,
    )

    docs = _documents(spark, sf_dir)
    norm = normalize_content_expr(F.col("text"))
    return docs.select(
        "doc_id",
        F.length(norm).cast("long").alias("norm_len"),
        sha256_expr(norm).alias("content_sha"),
    )


# ----------------------------------------------------------------------- P5
def redact_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Policy-driven column redaction (the transform the reference chains to
    arrow-flight-module; fybrik/sample-policy-restrictive.rego redacts
    name/address-class columns)."""
    return _customer(spark, sf_dir).select(
        "c_custkey",
        F.lit("XXXXX").alias("c_name"),
        F.lit("XXXXX").alias("c_address"),
        "c_nationkey",
        "c_acctbal",
    )


# ------------------------------------------------------------ text analysis
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace token counting + char stats per document."""
    docs = _documents(spark, sf_dir).filter(F.length("text") > 0)
    toks = F.split(F.trim(F.col("text")), "\\s+")
    return docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.length("text").cast("long").alias("n_chars_actual"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct_tokens"),
    )


def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: stopword ratio, mean token length, alpha ratio.
    All ratios are single divisions of exact integers (cross-engine safe)."""
    docs = _documents(spark, sf_dir).filter(F.length("text") > 0)
    toks = F.split(F.trim(F.col("text")), "\\s+")
    stop = F.array([F.lit(s) for s in ["the", "a", "of", "and", "to", "in"]])
    n_tokens = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop, t)))
    n_alpha = F.length(F.regexp_replace(F.col("text"), "[^a-zA-Z]", ""))
    return docs.select(
        "doc_id",
        n_tokens.cast("long").alias("n_tokens"),
        n_stop.cast("long").alias("n_stopwords"),
        (n_stop.cast("double") / n_tokens.cast("double")).alias("stopword_ratio"),
        (n_alpha.cast("double") / F.length("text").cast("double")).alias("alpha_ratio"),
    )


def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n-gram/stopword language-ID heuristic: density of English function
    words decides en vs unknown (deterministic integer threshold)."""
    docs = _documents(spark, sf_dir).filter(F.length("text") > 0)
    toks = F.split(F.trim(F.col("text")), "\\s+")
    en = F.array([F.lit(s) for s in ["the", "a", "of", "and", "to", "in", "is", "it"]])
    n_en = F.size(F.filter(toks, lambda t: F.array_contains(en, t)))
    n_tokens = F.size(toks)
    return docs.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        F.when(n_en * 100 >= n_tokens * 2, F.lit("en"))
        .otherwise(F.lit("und"))
        .alias("predicted_lang"),
    )


# ------------------------------------------------------------------- dedup
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on normalized-content sha256; keeper = min
    doc_id (deterministic)."""
    from airbyte_module_spark.functions.content import (
        normalize_content_expr,
        sha256_expr,
    )

    docs = _documents(spark, sf_dir)
    return (
        docs.select(
            "doc_id", sha256_expr(normalize_content_expr(F.col("text"))).alias("content_sha")
        )
        .groupBy("content_sha")
        .agg(
            F.min("doc_id").alias("keeper_doc_id"),
            F.count("*").alias("n_copies"),
        )
    )
