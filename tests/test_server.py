"""Remote protocol surface (E1-E5): Arrow Flight + HTTP servers.

Mirrors the reference's e2e shape — write a dataset through the module, read
it back, diff (/root/reference/hack/test_module.sh:186-227) and the sample
Flight clients (/root/reference/helm/client/client.py:10-13,62-65,
/root/reference/sample/sample.py) — except in-process against the Engine.
"""

from __future__ import annotations

import json
import urllib.request

import pyarrow as pa
import pytest

from pyspark.sql import types as T

from airbyte_module_spark import Engine
from airbyte_module_spark.server import HAVE_FLIGHT, EngineHttpServer

USER_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), True),
        T.StructField("first_name", T.StringType(), True),
        T.StructField("salary", T.DoubleType(), True),
    ]
)


@pytest.fixture()
def asset(spark, tmp_path):
    eng = Engine(
        spark, str(tmp_path / "userdata"), schema=USER_SCHEMA, key_columns=[], n_buckets=2
    )
    df = spark.createDataFrame(
        [(1, "amy", 100.0), (2, "bob", 200.5)], schema=USER_SCHEMA
    )
    eng.write(df, mode="append")
    return eng


def _rows(eng):
    return sorted(tuple(r) for r in eng.read().collect())


# ------------------------------------------------------------------ flight
@pytest.mark.skipif(not HAVE_FLIGHT, reason="pyarrow.flight unavailable")
def test_flight_get_flight_info_and_do_get(asset):
    import pyarrow.flight as fl

    from airbyte_module_spark.server import EngineFlightServer

    with EngineFlightServer({"userdata": asset}) as server:
        client = fl.connect(f"grpc://127.0.0.1:{server.port}")
        info = client.get_flight_info(fl.FlightDescriptor.for_command(b"userdata"))
        assert [f.name for f in info.schema] == ["id", "first_name", "salary"]
        assert info.total_records == -1  # reference parity: abm/server.py:251-253
        table = client.do_get(info.endpoints[0].ticket).read_all()
        got = sorted(tuple(r.values()) for r in table.to_pylist())
        assert got == _rows(asset)


@pytest.mark.skipif(not HAVE_FLIGHT, reason="pyarrow.flight unavailable")
def test_flight_do_put_append_and_overwrite(asset):
    import pyarrow.flight as fl

    from airbyte_module_spark.server import EngineFlightServer

    with EngineFlightServer({"userdata": asset}) as server:
        client = fl.connect(f"grpc://127.0.0.1:{server.port}")
        new = pa.table({"id": [3], "first_name": ["cal"], "salary": [300.25]})

        desc = fl.FlightDescriptor.for_command(
            json.dumps({"asset": "userdata", "write_mode": "append"}).encode()
        )
        writer, _ = client.do_put(desc, new.schema)
        writer.write_table(new)
        writer.close()
        assert len(_rows(asset)) == 3

        desc = fl.FlightDescriptor.for_command(
            json.dumps({"asset": "userdata", "write_mode": "overwrite"}).encode()
        )
        writer, _ = client.do_put(desc, new.schema)
        writer.write_table(new)
        writer.close()
        assert _rows(asset) == [(3, "cal", 300.25)]


@pytest.mark.skipif(not HAVE_FLIGHT, reason="pyarrow.flight unavailable")
def test_flight_unknown_asset_rejected(asset):
    import pyarrow.flight as fl

    from airbyte_module_spark.server import EngineFlightServer

    with EngineFlightServer({"userdata": asset}) as server:
        client = fl.connect(f"grpc://127.0.0.1:{server.port}")
        with pytest.raises(fl.FlightError):
            client.do_get(fl.Ticket(json.dumps({"asset_name": "nope"}).encode())).read_all()


# -------------------------------------------------------------------- http
def test_http_get_ndjson_and_put_roundtrip(asset):
    server = EngineHttpServer({"userdata": asset}).start()
    try:
        base = f"http://127.0.0.1:{server.port}/userdata"
        with urllib.request.urlopen(base) as resp:
            lines = [json.loads(ln) for ln in resp.read().decode().splitlines()]
        assert sorted(r["id"] for r in lines) == [1, 2]

        body = json.dumps({"id": 3, "first_name": "cal", "salary": 300.25}).encode()
        req = urllib.request.Request(base, data=body, method="PUT")
        req.add_header("X-Write-Mode", "append")
        with urllib.request.urlopen(req) as resp:
            assert resp.status == 200
        assert len(_rows(asset)) == 3
    finally:
        server.stop()


def test_http_unknown_asset_404(asset):
    server = EngineHttpServer({"userdata": asset}).start()
    try:
        import urllib.error

        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(f"http://127.0.0.1:{server.port}/nope")
        assert e.value.code == 404
    finally:
        server.stop()
