"""Paginated API source — the engine-side counterpart of the reference's
API/SaaS connector class (S5: ``airbyte/source-google-sheets`` and
``airbyte/source-us-census`` registered at ``/root/reference/module.yaml:
25-42`` and ``helm/abm/values.yaml:58-66,77-81``).

The reference reads these by running a dockerized connector that pages
through a REST API and emits AirbyteRecordMessages on stdout. The Spark-
native shape is a *fetcher-injected* paginated source:

- ``fetch_page(page_index) -> list[dict] | None`` is the transport: the
  HTTP/auth specifics of sheets/census/any API live in this callable
  (credentials arrive via the same ``credentials_provider`` hook the JDBC
  path uses — see config.py). Returning ``None``/``[]`` ends pagination.
  This sandbox has no network egress, so the transport is exercised with
  local fetchers in tests; against a real API the callable wraps
  ``urllib``/``requests`` — no engine change.
- ``read_api`` (driver paging) is the small-source path — sheets-sized
  data, sequential fetch, one ``createDataFrame``.
- ``read_api_distributed`` is the scale path: page indices become a Spark
  range and ``mapInPandas`` fans the fetches out across executors (the
  fetcher is shipped to workers, so it must be picklable and
  self-contained) — N pages fetched with full cluster parallelism, rows
  never funneling through the driver. Census-style bulk APIs with stable
  page addressing fit this shape.

Rows are plain dicts; schema is explicit (preferred) or sampled from the
first page — mirroring the reference's play-it-safe JSON-schema fabrication
(``abm/connector.py:176-185``) but with real Spark types.
"""

from __future__ import annotations

from typing import Callable, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

Fetcher = Callable[[int], "list[dict] | None"]


def _infer_schema_from_rows(rows: list[dict]) -> T.StructType:
    """Conservative schema from sample rows: long/double/bool kept, all else
    string; fields sorted by name for determinism."""
    kinds: dict[str, T.DataType] = {}
    for row in rows:
        for k, v in row.items():
            if k in kinds and not isinstance(kinds[k], T.NullType):
                continue
            if isinstance(v, bool):
                kinds[k] = T.BooleanType()
            elif isinstance(v, int):
                kinds[k] = T.LongType()
            elif isinstance(v, float):
                kinds[k] = T.DoubleType()
            elif v is None:
                kinds.setdefault(k, T.NullType())
            else:
                kinds[k] = T.StringType()
    return T.StructType(
        [
            T.StructField(k, T.StringType() if isinstance(dt, T.NullType) else dt, True)
            for k, dt in sorted(kinds.items())
        ]
    )


def read_api(
    spark: SparkSession,
    fetch_page: Fetcher,
    schema: T.StructType | str | None = None,
    max_pages: int = 10_000,
) -> DataFrame:
    """Sequential driver-side paging (the reference's connector loop shape,
    ``abm/connector.py:215-237``, minus the subprocess). Stops at the first
    empty/None page or ``max_pages``."""
    rows: list[dict] = []
    for page in range(max_pages):
        batch = fetch_page(page)
        if not batch:
            break
        rows.extend(batch)
    if schema is None:
        if not rows:
            raise ValueError("empty API result and no schema given")
        schema = _infer_schema_from_rows(rows)
    return spark.createDataFrame(rows, schema=schema)


def read_api_distributed(
    spark: SparkSession,
    fetch_page: Fetcher,
    n_pages: int,
    schema: T.StructType | str,
    partitions: int | None = None,
) -> DataFrame:
    """Parallel paging: ``n_pages`` known page indices fetched by executors
    via ``mapInPandas`` (Arrow-batched output, no driver funnel). Requires
    an explicit schema and a picklable fetcher. Partition count defaults to
    the scheduler's parallelism, each partition fetching a contiguous page
    range — at 1000 executors this is 1000 concurrent API readers, the
    shape the reference's single connector container cannot express."""
    import pandas as pd

    if isinstance(schema, str):  # YAML configs give DDL strings
        schema = T.StructType.fromDDL(schema)
    if partitions is None:
        partitions = spark.sparkContext.defaultParallelism
    pages = spark.range(0, n_pages, 1, min(partitions, max(n_pages, 1)))
    field_names = [f.name for f in schema.fields]

    def fetch_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            for page in b["id"].tolist():
                rows = fetch_page(int(page)) or []
                if rows:
                    yield pd.DataFrame(
                        {n: [r.get(n) for r in rows] for n in field_names}
                    )

    return pages.mapInPandas(fetch_partition, schema=schema)
