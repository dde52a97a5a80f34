"""JDBC source/sink — parity with the reference's mysql/postgres connectors.

The reference reads a DB table by launching ``airbyte/source-mysql`` /
``source-postgres`` containers from a YAML connection block of
``{host, port, database, username, password}`` (``/root/reference/sample/
read_mysql.yaml:5-14``; registry ``/root/reference/helm/abm/
values.yaml:47-76``) and writes through ``destination-mysql``/``-postgres``
(its primary e2e is a mysql write→read roundtrip,
``/root/reference/hack/test_module.sh:186-227``).

Spark-native equivalent: ``spark.read.format("jdbc")`` with partitioned
reads — one SELECT per partition over ``partition_column`` ranges instead of
the reference's single-container single-stream scan. This sandbox has no
database server or JDBC driver jar, so these functions are exercised at the
option-mapping level (``tests/test_files_jdbc.py``); against a real DB they
are plain public DataSource calls with no further engine code.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_DEFAULT_PORTS = {"mysql": 3306, "postgresql": 5432}


def jdbc_url(connection: dict, dialect: str = "mysql") -> str:
    """Reference-shaped connection block ({host, port, database, ...},
    read_mysql.yaml:8-14) → JDBC url."""
    host = connection["host"]
    port = int(connection.get("port", _DEFAULT_PORTS.get(dialect, 0)))
    database = connection["database"]
    return f"jdbc:{dialect}://{host}:{port}/{database}"


def jdbc_options(
    url: str,
    table: str,
    user: str | None = None,
    password: str | None = None,
    partition_column: str | None = None,
    num_partitions: int | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    fetchsize: int = 10_000,
    **extra: str,
) -> dict[str, str]:
    """Spark JDBC option map. When ``partition_column`` (+ bounds) is given
    the scan is split into ``num_partitions`` parallel range queries — the
    scale path; otherwise a single-partition read (what the reference always
    does, one connector container per request)."""
    opts: dict[str, str] = {
        "url": url,
        "dbtable": table,
        "fetchsize": str(fetchsize),
    }
    if user is not None:
        opts["user"] = user
    if password is not None:
        opts["password"] = password
    if partition_column is not None:
        if num_partitions is None or lower_bound is None or upper_bound is None:
            raise ValueError(
                "partitioned JDBC reads need num_partitions, lower_bound, upper_bound"
            )
        opts.update(
            partitionColumn=partition_column,
            numPartitions=str(num_partitions),
            lowerBound=str(lower_bound),
            upperBound=str(upper_bound),
        )
    opts.update({k: str(v) for k, v in extra.items()})
    return opts


def read_jdbc(spark: SparkSession, url: str, table: str, **kw) -> DataFrame:
    """DB table scan (reference: source-mysql/source-postgres full_refresh
    read, ``abm/connector.py:215-237``)."""
    return spark.read.format("jdbc").options(**jdbc_options(url, table, **kw)).load()


def write_jdbc(
    df: DataFrame, url: str, table: str, mode: str = "append", **kw
) -> None:
    """DB table write; ``mode`` append/overwrite mirrors the reference's
    do_put sync modes (``abm/server.py:182-187``)."""
    opts = jdbc_options(url, table, **kw)
    opts.pop("fetchsize", None)
    df.write.format("jdbc").options(**opts).mode(mode).save()
