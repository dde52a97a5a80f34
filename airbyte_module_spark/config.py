"""Reference-shaped asset configuration: YAML ``data:`` list → served assets.

The reference resolves an asset name to a connection config through a YAML
``data:`` list (``/root/reference/abm/config.py:13-18``) whose per-asset
``connection`` block names a connector family — ``file`` (sample/sample.yaml:
1-11), ``read_mysql``/``write_mysql`` (sample/read_mysql.yaml:5-14,
write_mysql.yaml:5-15) — and optionally merges Vault-fetched secrets into it
(``abm/vault.py:9-32``, applied at ``abm/connector.py:28-41``).

Here the same YAML shape maps onto engine calls instead of docker containers:

| connection.name       | becomes                                            |
|-----------------------|----------------------------------------------------|
| ``file``              | :class:`FileAsset` → ``sources.files.read_file`` / ``write_file`` |
| ``read_mysql`` / ``read_postgres``  | :class:`JdbcAsset` → ``sources.jdbc.read_jdbc``  |
| ``write_mysql`` / ``write_postgres``| :class:`JdbcAsset` → ``sources.jdbc.write_jdbc`` |
| ``lake``              | a full :class:`~airbyte_module_spark.engine.Engine` (CDC lake table — no reference analogue) |

Secret indirection is a pluggable ``credentials_provider`` callable — the
engine-side stand-in for the reference's Vault client (an *infra* concern
kept out of the engine): any connection block carrying ``vault_credentials``
has ``provider(vault_credentials, asset_name)``'s result merged over it,
with the reference's nested-JSON decode attempt preserved
(``abm/connector.py:33-39``).

Every asset class duck-types the server surface (``read()/schema()/
write(df, mode)/spark``), so a YAML-loaded registry plugs straight into
``EngineHttpServer`` / ``EngineFlightServer``.
"""

from __future__ import annotations

import json
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

CredentialsProvider = Callable[[dict, str], dict]


def _merge_secrets(
    connection: dict, asset_name: str, provider: CredentialsProvider | None
) -> dict:
    """Reference secret-merge semantics (abm/connector.py:28-41): fetch via
    the provider when the block requests it, JSON-decode nested values, and
    overlay onto the connection config. No provider + a block that demands
    one is a loud error, not a silent unauthenticated attempt."""
    if "vault_credentials" not in connection:
        return connection
    if provider is None:
        raise ValueError(
            f"asset {asset_name!r} requires credentials (vault_credentials "
            "present) but no credentials_provider was given"
        )
    secrets = provider(connection["vault_credentials"], asset_name) or {}
    decoded = {}
    for key, value in secrets.items():
        try:
            decoded[key] = json.loads(value)
        except (TypeError, ValueError):
            decoded[key] = value
    merged = {k: v for k, v in connection.items() if k != "vault_credentials"}
    merged.update(decoded)
    return merged


class FileAsset:
    """File-connector asset (source-file / destination-csv /
    destination-local-json): reads ``url``/``path`` in ``format``, writes to
    ``destination_path``. Serves through the same duck-typed surface as
    Engine."""

    def __init__(self, spark: SparkSession, name: str, connection: dict):
        self.spark = spark
        self.name = name
        self.conn = connection

    def _format(self) -> str:
        fmt = self.conn.get("format", "csv")
        return {"jsonl": "json"}.get(fmt, fmt)

    def read(self) -> DataFrame:
        from airbyte_module_spark.sources.files import read_file

        path = self.conn.get("url") or self.conn.get("path")
        if not path:
            raise ValueError(f"file asset {self.name!r} has no url/path to read")
        return read_file(self.spark, path, format=self._format())

    def schema(self) -> T.StructType:
        return self.read().schema

    def write(self, df: DataFrame, mode: str = "append") -> None:
        from airbyte_module_spark.sources.files import write_file

        dest = self.conn.get("destination_path") or self.conn.get("path")
        if not dest:
            raise ValueError(f"file asset {self.name!r} has no destination_path")
        write_file(df, dest, format=self._format(), mode=mode)


class JdbcAsset:
    """JDBC-connector asset (source-/destination- mysql/postgres): the YAML
    block's {host, port, database, username, password} becomes a Spark JDBC
    option map; ``table`` defaults to the asset name (the reference derives
    it the same way from dataset naming)."""

    def __init__(
        self, spark: SparkSession, name: str, connection: dict, dialect: str
    ):
        self.spark = spark
        self.name = name
        self.conn = connection
        self.dialect = dialect

    def _call_kw(self) -> tuple[str, str, dict]:
        from airbyte_module_spark.sources.jdbc import jdbc_url

        url = jdbc_url(self.conn, dialect=self.dialect)
        table = self.conn.get("table", self.name)
        kw = {}
        if "username" in self.conn:
            kw["user"] = self.conn["username"]
        if "password" in self.conn:
            kw["password"] = self.conn["password"]
        for k in (
            "partition_column",
            "num_partitions",
            "lower_bound",
            "upper_bound",
            "fetchsize",
        ):
            if k in self.conn:
                kw[k] = self.conn[k]
        return url, table, kw

    def options(self) -> dict[str, str]:
        """The resolved Spark JDBC option map (what the sandbox tests assert
        on — no DB server/driver jar exists here; see sources/jdbc.py)."""
        from airbyte_module_spark.sources.jdbc import jdbc_options

        url, table, kw = self._call_kw()
        return jdbc_options(url, table, **kw)

    def read(self) -> DataFrame:
        from airbyte_module_spark.sources.jdbc import read_jdbc

        url, table, kw = self._call_kw()
        return read_jdbc(self.spark, url, table, **kw)

    def schema(self) -> T.StructType:
        return self.read().schema

    def write(self, df: DataFrame, mode: str = "append") -> None:
        from airbyte_module_spark.sources.jdbc import write_jdbc

        url, table, kw = self._call_kw()
        kw.pop("fetchsize", None)
        write_jdbc(df, url, table, mode=mode, **kw)


class ApiAsset:
    """API/SaaS-connector asset (S5: source-google-sheets / source-us-census
    shape): reads a paginated API through an injected fetcher (see
    sources/rest.py — the transport callable is built by a registered
    factory from the YAML connection block, the engine-side analogue of the
    reference dispatching on the connector image name)."""

    def __init__(self, spark: SparkSession, name: str, connection: dict, fetcher):
        self.spark = spark
        self.name = name
        self.conn = connection
        self.fetcher = fetcher

    def read(self) -> DataFrame:
        """Driver paging by default; ``distributed: true`` + ``n_pages`` in
        the YAML block fans the page fetches out across executors
        (``read_api_distributed`` — requires an explicit ``schema`` and a
        picklable fetcher; the census-style bulk shape)."""
        if self.conn.get("distributed"):
            from airbyte_module_spark.sources.rest import read_api_distributed

            schema = self.conn.get("schema")
            if schema is None:
                raise ValueError(
                    f"API asset {self.name!r}: distributed reads need an "
                    "explicit 'schema' in the connection block"
                )
            if "n_pages" not in self.conn:
                raise ValueError(
                    f"API asset {self.name!r}: distributed reads need "
                    "'n_pages' (known page count) in the connection block"
                )
            return read_api_distributed(
                self.spark,
                self.fetcher,
                n_pages=int(self.conn["n_pages"]),
                schema=schema,
                partitions=self.conn.get("partitions"),
            )
        from airbyte_module_spark.sources.rest import read_api

        return read_api(
            self.spark,
            self.fetcher,
            schema=self.conn.get("schema"),
            max_pages=int(self.conn.get("max_pages", 10_000)),
        )

    def schema(self) -> T.StructType:
        return self.read().schema

    def write(self, df: DataFrame, mode: str = "append") -> None:
        raise ValueError(f"API asset {self.name!r} is read-only")


class AssetConfig:
    """Parse a reference-shaped YAML (or pre-parsed dict) asset config.
    Same lookup contract as the reference's Config (abm/config.py:13-18):
    ``for_asset`` raises ValueError on an undefined asset."""

    def __init__(self, source: str | dict):
        if isinstance(source, dict):
            self.values = source
        else:
            import yaml

            with open(source) as stream:
                self.values = yaml.safe_load(stream)

    def asset_names(self) -> list[str]:
        return [a["name"] for a in self.values.get("data", [])]

    def for_asset(self, asset_name: str) -> dict:
        for asset_info in self.values.get("data", []):
            if asset_info["name"] == asset_name:
                return asset_info
        raise ValueError(f"Requested config for undefined asset: {asset_name}")


_JDBC_DIALECTS = {
    "read_mysql": "mysql",
    "write_mysql": "mysql",
    "read_postgres": "postgresql",
    "write_postgres": "postgresql",
}


def build_assets(
    spark: SparkSession,
    config: AssetConfig | str | dict,
    credentials_provider: CredentialsProvider | None = None,
    lake_root: str | None = None,
    api_fetchers: dict[str, Callable[[dict], Callable]] | None = None,
):
    """YAML config → ``{asset_name: served asset}`` registry for the
    HTTP/Flight servers. ``lake_root`` anchors relative ``lake`` asset paths.

    ``api_fetchers`` registers API-connector kinds (e.g. ``read_sheets``,
    ``read_census``): kind → factory(connection_block) → fetch_page
    callable — the dispatch the reference does on connector image names
    (``module.yaml:25-42``), with the transport injected instead of
    dockerized."""
    import os

    from airbyte_module_spark.engine import Engine

    if not isinstance(config, AssetConfig):
        config = AssetConfig(config)
    api_fetchers = api_fetchers or {}
    assets = {}
    for name in config.asset_names():
        info = config.for_asset(name)
        conn = info.get("connection", {})
        kind = conn.get("name")
        block = dict(conn.get(kind, {}))
        # The reference reads vault_credentials at the ASSET level — sibling
        # of 'connection' (abm/connector.py:28 checks config['vault_credentials']
        # where config is the whole asset entry). Honor that placement too;
        # a block-level key (engine-native placement) takes precedence.
        if "vault_credentials" in info and "vault_credentials" not in block:
            block["vault_credentials"] = info["vault_credentials"]
        block = _merge_secrets(block, name, credentials_provider)
        if kind == "file":
            assets[name] = FileAsset(spark, name, block)
        elif kind in _JDBC_DIALECTS:
            assets[name] = JdbcAsset(spark, name, block, _JDBC_DIALECTS[kind])
        elif kind in api_fetchers:
            assets[name] = ApiAsset(spark, name, block, api_fetchers[kind](block))
        elif kind == "lake":
            path = block.get("path", name)
            if lake_root and not os.path.isabs(path):
                path = os.path.join(lake_root, path)
            assets[name] = Engine(spark, path)
        else:
            raise ValueError(
                f"asset {name!r}: unsupported connection name {kind!r} "
                f"(supported: file, {', '.join(_JDBC_DIALECTS)}, lake, "
                f"registered api kinds: {sorted(api_fetchers)})"
            )
    return assets
