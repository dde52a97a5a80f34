"""M2: vectorized transforms — pandas UDF vs Catalyst expr vs plain-Python
oracle agreement; plans must show Arrow (never row-at-a-time) Python."""

import hashlib

import pytest
from pyspark.sql import functions as F

from airbyte_module_spark.functions import content as cf

CASES = [
    "plain text",
    "crlf\r\nline\r\n",
    "cr\ronly",
    "trailing   \nspaces\t\t\nend  ",
    "mixed \r\n\ttabs\t \r\nand  \n",
    "",
    "unicode: λ→∀ \r\n ωmega  ",
    "no newline trailing  ",
]


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame([(c,) for c in CASES] + [(None,)], ["content"])


def test_normalize_expr_matches_python(spark, df):
    rows = df.select(cf.normalize_content_expr("content").alias("n")).collect()
    expected = [cf.normalize_py(c) for c in CASES] + [None]
    assert [r["n"] for r in rows] == expected


def test_normalize_pandas_udf_matches_expr(spark, df):
    rows = df.select(
        cf.normalize_content(F.col("content")).alias("u"),
        cf.normalize_content_expr("content").alias("e"),
    ).collect()
    for r in rows:
        assert r["u"] == r["e"]


def test_sha256_matches_hashlib(spark, df):
    rows = df.select(
        "content",
        cf.sha256_expr("content").alias("e"),
        cf.sha256_content(F.col("content")).alias("u"),
    ).collect()
    for r in rows:
        want = (
            hashlib.sha256(r["content"].encode()).hexdigest()
            if r["content"] is not None
            else None
        )
        assert r["e"] == want and r["u"] == want


def test_udfs_are_arrow_vectorized(spark, df):
    """input_hint: 'no per-row Python'. Pandas UDFs must plan as
    ArrowEvalPython; BatchEvalPython (row-at-a-time) must never appear."""
    plan = (
        df.select(cf.normalize_content(F.col("content")))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan


def test_expr_form_stays_in_codegen(spark, df):
    """The default (expression) pipeline keeps normalize+sha fully JVM-side:
    no Python eval node of any kind in the plan."""
    plan = (
        df.select(cf.sha256_expr(cf.normalize_content_expr("content")))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EvalPython" not in plan
    # "*(1)" prefixes mark whole-stage-codegen stages in the plan string
    assert "*(" in plan or "WholeStageCodegen" in plan
