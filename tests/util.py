"""Shared helpers: engine-vs-oracle comparison (golden-diff discipline,
mirroring /root/reference/tests/test_fybrik.sh:144-162)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from airbyte_module_spark import model, oracle
from airbyte_module_spark.lake.table import LakeTable

BASE_COLS = ["repo", "path", "commit", "lang", "content"]


def engine_state(table: LakeTable, cols: list[str] | None = None) -> pd.DataFrame:
    """Final user-facing state + per-row sha, sorted, as pandas."""
    cols = cols or BASE_COLS
    df = (
        table.read_internal()
        .filter(F.col(model.META_OP) != "d")
        .select(*cols, F.col(model.META_SHA).alias("content_sha"))
        .orderBy("repo", "path")
    )
    return df.toPandas().reset_index(drop=True)


def assert_matches_oracle(table: LakeTable, events: list[dict], cols: list[str] | None = None):
    cols = cols or BASE_COLS
    expected = oracle.apply_events(events)
    for c in cols:
        if c not in expected.columns:
            expected[c] = None
    expected = expected[cols + ["content_sha"]].sort_values(["repo", "path"]).reset_index(drop=True)
    actual = engine_state(table, cols)
    assert len(actual) == len(expected), f"row count {len(actual)} != {len(expected)}"
    pd.testing.assert_frame_equal(
        actual.fillna(""), expected.fillna(""), check_dtype=False
    )
    # per-row content sha256 equality is implied by the frame equality on
    # content_sha; also check the whole-table digest invariant
    assert table.digest() == oracle.table_digest(expected, cols)
