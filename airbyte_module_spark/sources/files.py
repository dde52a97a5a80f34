"""Generic file source/sink: csv / json (NDJSON) / parquet / text.

Reference parity: the ``airbyte/source-file`` connector reads parquet/csv
from a URL (``/root/reference/sample/sample.yaml:4-10``, format + HTTPS
provider) and the ``destination-csv`` / ``destination-local-json``
connectors write delimited / NDJSON files (``/root/reference/sample/
write_config.yaml:4-8``, registry ``/root/reference/helm/abm/
values.yaml:82-89``). Here both directions are one Spark reader/writer call:
Spark's DataSource V2 handles splitting, header parsing, compression, and
predicate/column pushdown (for parquet) natively and in parallel — the
reference streams the same bytes through a single dockerized connector
process, one line at a time.

CSV defaults mirror the connector's: header row on, explicit schema
preferred (the reference "plays it safe" with a two-type string/double
schema, ``abm/connector.py:182-185``; we accept a real StructType instead
and fall back to inference when absent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

FORMATS = ("csv", "json", "parquet", "text")


def read_file(
    spark: SparkSession,
    path: str,
    format: str = "csv",
    schema: T.StructType | str | None = None,
    **options: str,
) -> DataFrame:
    """Read a file/directory/glob (local path, s3a://, https:// via hadoop fs)
    as a DataFrame. For csv, ``header`` defaults to true and schema inference
    is used only when no schema is given (inference costs an extra pass —
    pass a schema at scale)."""
    if format not in FORMATS:
        raise ValueError(f"format must be one of {FORMATS}, got {format!r}")
    reader = spark.read
    if format == "csv":
        options = {"header": "true", **options}
        if schema is None:
            options.setdefault("inferSchema", "true")
    if schema is not None:
        reader = reader.schema(schema)
    return reader.options(**options).format(format).load(path)


def write_file(
    df: DataFrame,
    path: str,
    format: str = "csv",
    mode: str = "overwrite",
    **options: str,
) -> None:
    """Write a DataFrame as csv/json/parquet/text files. ``mode`` maps to the
    reference's append/overwrite sync modes (``abm/server.py:182-187``)."""
    if format not in FORMATS:
        raise ValueError(f"format must be one of {FORMATS}, got {format!r}")
    writer = df.write.mode(mode)
    if format == "csv":
        options = {"header": "true", **options}
    writer.options(**options).format(format).save(path)
