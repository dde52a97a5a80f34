"""File source/sink (S3/S6) and JDBC (S4) surface tests.

Mirrors the reference's write→read roundtrip e2e
(/root/reference/hack/test_module.sh:216-227: write a dataset through the
module, read it back, diff) — here per file format, lossless by assertion.
JDBC has no database in this sandbox (SURVEY.md §2.1 S4), so its tests pin
the option mapping the connectors' YAML config translates into.
"""

from __future__ import annotations

import pytest

from airbyte_module_spark.sources.files import read_file, write_file
from airbyte_module_spark.sources.jdbc import jdbc_options, jdbc_url


@pytest.fixture()
def df(spark):
    return spark.createDataFrame(
        [
            (1, "plain", "with,comma", 1.5),
            (2, None, 'quo"te', -3.25),
            (3, "unicode é", "tab\there", 0.0),
        ],
        "id long, s1 string, s2 string, v double",
    )


@pytest.mark.parametrize("fmt", ["csv", "json", "parquet"])
def test_write_read_roundtrip(spark, tmp_path, df, fmt):
    path = str(tmp_path / fmt)
    write_file(df, path, format=fmt)
    back = read_file(spark, path, format=fmt, schema=df.schema)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))
    assert back.schema == df.schema


def test_csv_infers_schema_without_explicit_schema(spark, tmp_path, df):
    path = str(tmp_path / "inferred")
    write_file(df, path, format="csv")
    back = read_file(spark, path, format="csv")
    assert back.count() == 3
    assert [f.name for f in back.schema.fields] == ["id", "s1", "s2", "v"]


def test_append_mode_accumulates(spark, tmp_path, df):
    path = str(tmp_path / "appended")
    write_file(df, path, format="json")
    write_file(df, path, format="json", mode="append")
    assert read_file(spark, path, format="json", schema=df.schema).count() == 6


def test_engine_file_methods(spark, tmp_path, df):
    from airbyte_module_spark import Engine

    eng = Engine(spark, str(tmp_path / "t"))
    path = str(tmp_path / "csv_out")
    eng.write_file(df, path, format="csv")
    assert eng.read_file(path, format="csv", schema=df.schema).count() == 3


def test_unknown_format_rejected(spark, df):
    with pytest.raises(ValueError):
        write_file(df, "/tmp/x", format="xml")
    with pytest.raises(ValueError):
        read_file(spark, "/tmp/x", format="avro")


# ------------------------------------------------------------------- jdbc
def test_jdbc_url_from_reference_connection_shape():
    # the connection block of /root/reference/sample/read_mysql.yaml:8-14
    conn = {"host": "db.example", "port": 3306, "database": "fybrik"}
    assert jdbc_url(conn, "mysql") == "jdbc:mysql://db.example:3306/fybrik"
    assert (
        jdbc_url({"host": "h", "database": "d"}, "postgresql")
        == "jdbc:postgresql://h:5432/d"
    )


def test_jdbc_options_partitioned_scan():
    opts = jdbc_options(
        "jdbc:mysql://h:3306/d",
        "userdata",
        user="root",
        password="pw",
        partition_column="id",
        num_partitions=16,
        lower_bound=0,
        upper_bound=1_000_000,
    )
    assert opts["dbtable"] == "userdata"
    assert opts["partitionColumn"] == "id"
    assert opts["numPartitions"] == "16"
    assert opts["lowerBound"] == "0" and opts["upperBound"] == "1000000"
    assert opts["user"] == "root" and opts["password"] == "pw"


def test_jdbc_options_partition_bounds_required():
    with pytest.raises(ValueError):
        jdbc_options("jdbc:mysql://h/d", "t", partition_column="id")
