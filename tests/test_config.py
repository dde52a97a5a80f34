"""Reference-shaped YAML asset config → served assets (ADVICE/VERDICT r2 #5).

The YAML shapes mirror the reference samples byte-for-byte where possible:
file asset = /root/reference/sample/sample.yaml:1-11 (minus the docker
connector tag), jdbc asset = sample/read_mysql.yaml:5-14, secret merge =
abm/connector.py:28-41 over abm/vault.py's provider contract.
"""

from __future__ import annotations

import json
import urllib.request

import pytest

from airbyte_module_spark.config import (
    AssetConfig,
    FileAsset,
    JdbcAsset,
    build_assets,
)
from airbyte_module_spark.server import EngineHttpServer


@pytest.fixture()
def userdata_csv(spark, tmp_path):
    path = str(tmp_path / "userdata_csv")
    spark.createDataFrame(
        [(1, "amy", 100.0), (2, "bob", 200.5)], "id long, first_name string, salary double"
    ).write.option("header", "true").csv(path)
    return path


def _yaml_config(tmp_path, text: str) -> str:
    p = tmp_path / "config.yaml"
    p.write_text(text)
    return str(p)


def test_asset_config_lookup_contract(tmp_path):
    cfg = AssetConfig(
        _yaml_config(
            tmp_path,
            """
data:
  - name: "userdata"
    connection:
      name: file
      file:
        dataset_name: userdata
        format: parquet
        url: "/data/userdata.parquet"
""",
        )
    )
    assert cfg.asset_names() == ["userdata"]
    assert cfg.for_asset("userdata")["connection"]["name"] == "file"
    with pytest.raises(ValueError, match="undefined asset"):
        cfg.for_asset("nope")  # abm/config.py:18 contract


def test_file_asset_reads_and_serves_over_http(spark, tmp_path, userdata_csv):
    assets = build_assets(
        spark,
        {
            "data": [
                {
                    "name": "userdata",
                    "connection": {
                        "name": "file",
                        "file": {"format": "csv", "url": userdata_csv},
                    },
                }
            ]
        },
    )
    assert isinstance(assets["userdata"], FileAsset)
    assert sorted(f.name for f in assets["userdata"].schema().fields) == [
        "first_name",
        "id",
        "salary",
    ]
    server = EngineHttpServer(assets).start()
    try:
        with urllib.request.urlopen(
            f"http://127.0.0.1:{server.port}/userdata"
        ) as resp:
            rows = [json.loads(ln) for ln in resp.read().decode().splitlines()]
        assert sorted(r["first_name"] for r in rows) == ["amy", "bob"]
    finally:
        server.stop()


def test_file_asset_write_roundtrip(spark, tmp_path):
    dest = str(tmp_path / "out_json")
    asset = FileAsset(
        spark, "out", {"format": "jsonl", "destination_path": dest, "url": dest}
    )
    df = spark.createDataFrame([(1, "x")], "id long, name string")
    asset.write(df, mode="overwrite")
    assert sorted(r.id for r in asset.read().collect()) == [1]


def test_jdbc_asset_option_mapping(spark):
    # read_mysql.yaml:5-14 shape; no DB server in the sandbox, so assert the
    # resolved Spark JDBC option map (the same level sources/jdbc.py tests at)
    asset = JdbcAsset(
        spark,
        "userdata",
        {
            "host": "db.example.com",
            "port": 3306,
            "database": "fybrik",
            "username": "root",
            "password": "password",
            "partition_column": "id",
            "num_partitions": 16,
            "lower_bound": 0,
            "upper_bound": 1_000_000,
        },
        "mysql",
    )
    opts = asset.options()
    assert opts["url"] == "jdbc:mysql://db.example.com:3306/fybrik"
    assert opts["dbtable"] == "userdata"
    assert opts["user"] == "root"
    assert (opts["partitionColumn"], opts["numPartitions"]) == ("id", "16")


def test_credentials_provider_merge(spark, userdata_csv):
    """vault_credentials blocks route through the pluggable provider and the
    secrets overlay the connection config (abm/connector.py:28-41), nested
    JSON decoded like the reference does."""
    calls = []

    def provider(vault_credentials, asset_name):
        calls.append((vault_credentials["secretPath"], asset_name))
        return {"url": userdata_csv, "extra": json.dumps({"nested": 1})}

    assets = build_assets(
        spark,
        {
            "data": [
                {
                    "name": "userdata",
                    "connection": {
                        "name": "file",
                        "file": {
                            "format": "csv",
                            "vault_credentials": {"secretPath": "/v1/secret/data/cred"},
                        },
                    },
                }
            ]
        },
        credentials_provider=provider,
    )
    assert calls == [("/v1/secret/data/cred", "userdata")]
    asset = assets["userdata"]
    assert asset.conn["url"] == userdata_csv
    assert asset.conn["extra"] == {"nested": 1}  # nested JSON decoded
    assert "vault_credentials" not in asset.conn
    assert sorted(r.first_name for r in asset.read().collect()) == ["amy", "bob"]


def test_asset_level_vault_credentials_honored(spark, userdata_csv):
    """ADVICE r3: the reference reads vault_credentials at the ASSET level —
    sibling of 'connection' (abm/connector.py:28 checks the whole asset
    entry) — so a reference-shaped YAML placing it there must route through
    the provider too, not proceed silently unauthenticated."""
    calls = []

    def provider(vault_credentials, asset_name):
        calls.append((vault_credentials["secretPath"], asset_name))
        return {"url": userdata_csv}

    assets = build_assets(
        spark,
        {
            "data": [
                {
                    "name": "userdata",
                    "vault_credentials": {"secretPath": "/v1/secret/data/cred"},
                    "connection": {"name": "file", "file": {"format": "csv"}},
                }
            ]
        },
        credentials_provider=provider,
    )
    assert calls == [("/v1/secret/data/cred", "userdata")]
    asset = assets["userdata"]
    assert asset.conn["url"] == userdata_csv
    assert "vault_credentials" not in asset.conn
    # and with no provider, the asset-level placement is loud, not silent
    with pytest.raises(ValueError, match="credentials_provider"):
        build_assets(
            spark,
            {
                "data": [
                    {
                        "name": "userdata",
                        "vault_credentials": {"secretPath": "/x"},
                        "connection": {"name": "file", "file": {"format": "csv"}},
                    }
                ]
            },
        )


def test_credentials_required_but_missing_is_loud(spark):
    with pytest.raises(ValueError, match="credentials_provider"):
        build_assets(
            spark,
            {
                "data": [
                    {
                        "name": "x",
                        "connection": {
                            "name": "file",
                            "file": {"vault_credentials": {}},
                        },
                    }
                ]
            },
        )


def test_unsupported_connection_kind_is_loud(spark):
    with pytest.raises(ValueError, match="unsupported connection"):
        build_assets(
            spark,
            {"data": [{"name": "x", "connection": {"name": "sheets", "sheets": {}}}]},
        )


def test_lake_asset_builds_engine(spark, tmp_path):
    from airbyte_module_spark import Engine

    assets = build_assets(
        spark,
        {
            "data": [
                {
                    "name": "repo_files",
                    "connection": {"name": "lake", "lake": {"path": "repo_files"}},
                }
            ]
        },
        lake_root=str(tmp_path),
    )
    assert isinstance(assets["repo_files"], Engine)
    assert assets["repo_files"].table_path == str(tmp_path / "repo_files")


# ------------------------------------------------------------------- API (S5)
def _census_fetcher(block):
    """Sheets/census-shaped fake transport: 3 pages of rows derived from the
    block's dataset id (no network egress in this sandbox — against the real
    API this callable wraps urllib with the same signature)."""
    dataset = block["dataset"]

    def fetch(page):
        if page >= 3:
            return None
        return [
            {"dataset": dataset, "row_id": page * 2 + i, "population": 100 * page + i}
            for i in range(2)
        ]

    return fetch


def test_api_asset_paginates_and_serves(spark):
    from airbyte_module_spark.config import ApiAsset

    assets = build_assets(
        spark,
        {
            "data": [
                {
                    "name": "acs",
                    "connection": {
                        "name": "read_census",
                        "read_census": {"dataset": "acs/acs5"},
                    },
                }
            ]
        },
        api_fetchers={"read_census": _census_fetcher},
    )
    asset = assets["acs"]
    assert isinstance(asset, ApiAsset)
    rows = asset.read().collect()
    assert len(rows) == 6  # 3 pages x 2 rows, pagination stopped at None
    assert sorted(r.row_id for r in rows) == list(range(6))
    with pytest.raises(ValueError, match="read-only"):
        asset.write(None)


def test_api_distributed_matches_sequential(spark):
    """The mapInPandas scale path returns the same rows as driver paging."""
    from pyspark.sql import types as T

    from airbyte_module_spark.sources.rest import read_api, read_api_distributed

    def fetch(page):
        if page >= 7:
            return None
        return [{"row_id": page * 3 + i, "v": f"p{page}r{i}"} for i in range(3)]

    schema = T.StructType(
        [T.StructField("row_id", T.LongType()), T.StructField("v", T.StringType())]
    )
    seq = read_api(spark, fetch, schema=schema)
    dist = read_api_distributed(spark, fetch, n_pages=7, schema=schema)
    assert sorted(map(tuple, seq.collect())) == sorted(map(tuple, dist.collect()))
    # the distributed plan fans out over executors, no driver collect
    assert "mapInPandas" in dist._jdf.queryExecution().optimizedPlan().toString() \
        or "MapInPandas" in dist._jdf.queryExecution().optimizedPlan().toString()


def test_api_asset_distributed_from_yaml(spark):
    """VERDICT r3 #7: 'distributed: true' + 'n_pages' in the YAML API block
    routes through read_api_distributed (executor-side page fan-out) and
    serves the same rows over HTTP as the driver-paging path."""
    import urllib.request as _rq

    from airbyte_module_spark.server import EngineHttpServer

    assets = build_assets(
        spark,
        {
            "data": [
                {
                    "name": "acs",
                    "connection": {
                        "name": "read_census",
                        "read_census": {
                            "dataset": "acs/acs5",
                            "distributed": True,
                            "n_pages": 3,
                            "schema": "dataset string, row_id long, population long",
                        },
                    },
                }
            ]
        },
        api_fetchers={"read_census": _census_fetcher},
    )
    asset = assets["acs"]
    df = asset.read()
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "mapInPandas" in plan or "MapInPandas" in plan  # executor fan-out
    assert sorted(r.row_id for r in df.collect()) == list(range(6))
    server = EngineHttpServer({"acs": asset}).start()
    try:
        with _rq.urlopen(f"http://127.0.0.1:{server.port}/acs") as resp:
            rows = [json.loads(ln) for ln in resp.read().decode().splitlines()]
        assert sorted(r["row_id"] for r in rows) == list(range(6))
    finally:
        server.stop()


def test_api_asset_distributed_missing_requirements_is_loud(spark):
    assets = build_assets(
        spark,
        {
            "data": [
                {
                    "name": "acs",
                    "connection": {
                        "name": "read_census",
                        "read_census": {"dataset": "d", "distributed": True},
                    },
                }
            ]
        },
        api_fetchers={"read_census": _census_fetcher},
    )
    with pytest.raises(ValueError, match="schema"):
        assets["acs"].read()


def test_serve_entrypoint_builds_and_serves(spark, tmp_path, userdata_csv):
    """scripts/serve.py — the reference main.py counterpart — wires a YAML
    config + file-backed secrets provider into both servers in one build()
    call; rows flow over HTTP end-to-end."""
    import argparse
    import sys

    sys.path.insert(0, "/root/repo/scripts")
    import serve as serve_mod

    secrets = tmp_path / "secrets.json"
    secrets.write_text(json.dumps({"/v1/secret/userdata": {"url": userdata_csv}}))
    cfg = tmp_path / "assets.yaml"
    cfg.write_text(
        f"""
data:
  - name: userdata
    vault_credentials:
      secretPath: /v1/secret/userdata
    connection:
      name: file
      file:
        format: csv
  - name: repo_files
    connection:
      name: lake
      lake:
        path: repo_files
"""
    )
    args = argparse.Namespace(
        config=str(cfg), host="127.0.0.1", port=0, arrowport=0,
        lake_root=str(tmp_path), secrets_file=str(secrets),
    )
    assets, http, flight = serve_mod.build(args)
    assert sorted(assets) == ["repo_files", "userdata"]
    http.start()
    try:
        with urllib.request.urlopen(
            f"http://127.0.0.1:{http.port}/userdata"
        ) as resp:
            rows = [json.loads(ln) for ln in resp.read().decode().splitlines()]
        assert sorted(r["first_name"] for r in rows) == ["amy", "bob"]
    finally:
        http.stop()
    if flight is not None:
        flight.shutdown()
