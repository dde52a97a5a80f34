#!/usr/bin/env python
"""Dual-protocol server process — the reference's ``main.py`` counterpart.

The reference process starts an HTTP server on a thread and serves Arrow
Flight on the main thread, both over one YAML asset config
(``/root/reference/main.py:28-37``, ports from ``--port``/``--arrowport``).
Same shape here, minus docker: the YAML resolves to engine-served assets
(file / jdbc / api / lake — see airbyte_module_spark/config.py) behind
the same two protocol facades.

    python scripts/serve.py --config assets.yaml --port 8080 --arrowport 8081 \
        [--lake-root /data/lake] [--secrets-file secrets.json]

``--secrets-file`` is the sandbox stand-in for the reference's Vault
client: a JSON map ``{secretPath: {key: value, ...}}``; any asset whose
config carries ``vault_credentials: {secretPath: ...}`` gets that mapping
merged over its connection block (abm/vault.py:9-32 semantics). Omit it
and assets requiring credentials fail loudly at startup instead of
connecting unauthenticated.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def file_secrets_provider(path: str):
    """Vault-shaped credentials provider backed by a local JSON file."""
    with open(path) as f:
        secrets = json.load(f)

    def provider(vault_credentials: dict, asset_name: str) -> dict:
        return secrets.get(vault_credentials.get("secretPath", ""), {})

    return provider


def build(args):
    """Config → (assets, http_server, flight_server); separated from the
    serve loop so tests can drive the full wiring in-process."""
    from airbyte_module_spark import get_spark
    from airbyte_module_spark.config import build_assets
    from airbyte_module_spark.server import (
        HAVE_FLIGHT,
        EngineFlightServer,
        EngineHttpServer,
    )

    spark = get_spark(app_name="abm-serve")
    provider = (
        file_secrets_provider(args.secrets_file) if args.secrets_file else None
    )
    assets = build_assets(
        spark,
        args.config,
        credentials_provider=provider,
        lake_root=args.lake_root,
    )
    http = EngineHttpServer(assets, host=args.host, port=args.port)
    flight = (
        EngineFlightServer(
            assets, location=f"grpc://{args.host}:{args.arrowport}"
        )
        if HAVE_FLIGHT
        else None
    )
    return assets, http, flight


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("-c", "--config", required=True, help="YAML asset config")
    ap.add_argument("--host", default="0.0.0.0")
    ap.add_argument("-p", "--port", type=int, default=8080, help="HTTP port")
    ap.add_argument(
        "-a", "--arrowport", type=int, default=8081, help="Arrow Flight port"
    )
    ap.add_argument("--lake-root", default=None, help="root for relative lake paths")
    ap.add_argument(
        "--secrets-file", default=None, help="JSON {secretPath: {k: v}} credentials"
    )
    args = ap.parse_args()

    assets, http, flight = build(args)
    http.start()
    print(f"HTTP serving {sorted(assets)} on :{http.port}", file=sys.stderr)
    if flight is not None:
        # Flight on the main thread, exactly like the reference main.py:34-37
        print(f"Flight serving on :{flight.port}", file=sys.stderr)
        try:
            flight.serve()
        finally:
            http.stop()
    else:  # pragma: no cover - grpc-less build
        print("pyarrow.flight unavailable; HTTP only", file=sys.stderr)
        import threading

        threading.Event().wait()


if __name__ == "__main__":
    main()
