"""Remote protocol surface: Arrow Flight + HTTP servers over the Engine.

Protocol parity with the reference's dual-server process (``/root/reference/
main.py:28-35`` starts an HTTP server on 8080 in a thread and a Flight server
on 8081 in the main thread):

| reference                                            | here                         |
|------------------------------------------------------|------------------------------|
| ``ABMFlightServer.get_flight_info`` (abm/server.py:238-256) | ``EngineFlightServer.get_flight_info`` |
| ``ABMFlightServer.do_get`` (abm/server.py:140-159)   | ``EngineFlightServer.do_get``|
| ``ABMFlightServer.do_put`` append/overwrite (abm/server.py:164-231, modes :182-187) | ``EngineFlightServer.do_put`` (+ upsert) |
| ticket = JSON ``{"asset_name": ...}`` (abm/ticket.py:14-16) | same wire format             |
| ``ABMHttpHandler.do_GET`` NDJSON stream (abm/server.py:39-60) | ``EngineHttpServer`` GET     |
| ``ABMHttpHandler.do_PUT/do_POST`` (abm/server.py:63-91) | ``EngineHttpServer`` PUT/POST|

Differences that are the point of the exercise:

- the reference's do_get launches a docker connector per request and streams
  its stdout through a temp file per 100-record batch
  (abm/connector.py:288-297); here ``Engine.read()`` is a Spark plan and
  the response STREAMS (the reference's one good property, abm/server.py:159,
  kept): Arrow record batches / NDJSON chunks are produced incrementally
  from ``toLocalIterator`` — one partition of driver memory at a time, never
  the whole asset (the r2 ``toArrow()``/``collect()`` forms were the
  engine's last driver-memory-unbounded data path).
- the reference's do_put iterates rows in Python
  (``batch.to_pandas()`` + ``iterrows``, abm/server.py:206-210 — the
  structural bottleneck called out in BASELINE.md); here the incoming Arrow
  stream is consumed chunk-by-chunk into a parquet staging file (one batch
  of driver memory, type-exact — nullable int64/binary preserved; no
  pandas hop, which corrupted nullable int64 columns to float64/zeros and
  lost binary types) and applied as ONE Spark read + MERGE with cursors
  stamped vectorized. HTTP PUT likewise copies its body in bounded chunks
  and parses JVM-side. Neither write path ever materializes the payload.
- one asset = one Engine (lake table); the asset registry dict mirrors the
  reference's per-asset YAML config lookup (abm/config.py:13-18).
- beyond parity: lake assets expose one Flight endpoint PER HASH BUCKET
  (concurrent lossless read slices — the reference is structurally capped
  at one ticket per asset, abm/server.py:253) and serve INCREMENTAL change
  rows (Flight ticket ``from_version`` / HTTP ``?from_version=N``) so a
  CDC consumer polls deltas instead of re-reading full state per request
  the way the reference's do_get must.

The servers are thin: every data operation is one Engine call, so the
protocol layer adds no second data path to keep correct.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

try:  # gated: pyarrow.flight needs grpc support compiled in
    import pyarrow.flight as fl

    HAVE_FLIGHT = True
except ImportError:  # pragma: no cover
    fl = None
    HAVE_FLIGHT = False

from airbyte_module_spark.engine import Engine

# rows per Arrow record batch / NDJSON flush on the streamed read paths —
# bounds driver memory per in-flight chunk regardless of asset size
READ_BATCH_ROWS = 4096

# bytes per copy on the HTTP write path (reference parity: its connector
# copies the PUT body in bounded chunks too, abm/connector.py:323-341)
WRITE_COPY_BYTES = 65536

# incoming chunks consumed by the most recent Flight do_put — test
# observability for the incremental consumption contract (the analogue of
# counting batches on the streamed read)
LAST_PUT_CHUNKS = 0


def _spill_dir() -> str:
    """Fresh write-staging dir. Local temp is correct for local[N]; a
    cluster deployment points SPARK_GRAFT_STAGING at shared storage so
    executors can read the spilled file back (same requirement as any
    driver-received upload)."""
    root = os.environ.get("SPARK_GRAFT_STAGING")
    if root:
        os.makedirs(root, exist_ok=True)
    return tempfile.mkdtemp(prefix="abm-put-", dir=root)


def _arrow_schema(df):
    """Arrow schema of a DataFrame without running the query (metadata-only:
    converts the Spark schema, same mapping toArrow uses)."""
    from pyspark.sql.pandas.types import to_arrow_schema

    return to_arrow_schema(df.schema)


#: Eager-read gate for bounded slices: when the snapshot metadata proves a
#: read serves at most this many parquet bytes (LakeTable.entry_bytes — an
#: upper bound), the server collects it with Spark's native Arrow path
#: (``toArrow``) instead of the streaming IPC iterator. Measured on the
#: parallel-read bench corpus (117 MB, 16 buckets): one bucket drains in
#: 0.22s via toArrow vs 0.7s via the iterator, and 16 THREADED bucket reads
#: go from ~9s (the toLocalIterator + per-batch Python IPC decode path
#: serializes on the driver GIL and runs one job per partition-in-flight)
#: to ~0.9s — the 10x that was the whole r5 "1.23x parallel speedup"
#: ceiling. Unbounded/huge slices keep the memory-bounded iterator.
EAGER_READ_MAX_BYTES = 128 << 20


def _arrow_batches_eager(df, batch_rows: int | None = None):
    """Whole-slice Arrow collect, re-sliced to the wire batch size. Only
    for reads the caller has PROVEN bounded (see EAGER_READ_MAX_BYTES) —
    driver memory holds the full slice (a few x the parquet bytes)."""
    if batch_rows is None:
        batch_rows = READ_BATCH_ROWS
    for batch in df.toArrow().to_batches(max_chunksize=batch_rows):
        yield batch


def _arrow_batches(df, batch_rows: int | None = None):
    """Yield pyarrow RecordBatches of <= ``batch_rows`` rows from a DataFrame
    incrementally, Arrow-native end to end: executors serialize their own
    Arrow batches to IPC blobs inside a ``mapInArrow`` pass (one blob = one
    bounded batch — JVM/Arrow conversion, no Python row objects anywhere),
    and the driver iterates the blob rows with ``toLocalIterator`` (ONE
    partition in flight, prefetching the next) and deserializes each back
    into a RecordBatch. Peak driver memory is one partition of blobs — not
    the asset — and struct/nested columns ride through natively (the
    previous per-row ``Row``→``from_pylist`` loop choked on them and paid a
    large constant factor in driver-side Python)."""
    import pyarrow as pa

    if batch_rows is None:  # resolved at call time so tests can shrink it
        batch_rows = READ_BATCH_ROWS
    rows_cap = batch_rows
    schema = _arrow_schema(df)

    def to_ipc(batches):
        for batch in batches:
            for off in range(0, batch.num_rows, rows_cap):
                piece = batch.slice(off, rows_cap)
                sink = pa.BufferOutputStream()
                with pa.ipc.new_stream(sink, piece.schema) as w:
                    w.write_batch(piece)
                yield pa.RecordBatch.from_arrays(
                    [pa.array([sink.getvalue().to_pybytes()], pa.binary())],
                    ["ipc"],
                )

    for row in df.mapInArrow(to_ipc, "ipc binary").toLocalIterator(
        prefetchPartitions=True
    ):
        with pa.ipc.open_stream(row[0]) as reader:
            for batch in reader:
                if batch.schema != schema:  # strip executor-side metadata
                    batch = pa.RecordBatch.from_arrays(batch.columns, schema=schema)
                yield batch


if HAVE_FLIGHT:

    class EngineFlightServer(fl.FlightServerBase):
        """Arrow Flight facade over a registry of Engines (one per asset)."""

        def __init__(self, assets: dict[str, Engine], location: str = "grpc://127.0.0.1:0"):
            super().__init__(location)
            self.assets = assets

        def _engine(self, asset: str) -> Engine:
            if asset not in self.assets:
                raise fl.FlightServerError(f"unknown asset {asset!r}")
            return self.assets[asset]

        # ---------------------------------------------------------- discovery
        def list_flights(self, context, criteria):
            """Enumerate every served asset (standard Flight catalog
            discovery; the reference has no analogue — its clients must
            know asset names a priori)."""
            for asset in sorted(self.assets):
                yield self.get_flight_info(
                    context, fl.FlightDescriptor.for_command(asset.encode())
                )

        def get_flight_info(self, context, descriptor):
            """Schema discovery: metadata lookup instead of the reference's
            dockerized `discover` round-trip; unknown record/byte counts =
            -1, exactly like abm/server.py:238-256.

            Lake-table assets return ONE ENDPOINT PER LIVE BUCKET (ticket
            carries the bucket list) so clients can read all slices
            CONCURRENTLY — every identity key lives wholly inside one
            bucket, so per-bucket reads are complete and their union equals
            the single-stream read. This beats the reference's documented
            structural ceiling (one endpoint/ticket per asset,
            abm/server.py:253). Non-bucketed assets keep the single
            endpoint."""
            asset = descriptor.command.decode() if descriptor.command else descriptor.path[0].decode()
            eng = self._engine(asset)
            schema = _arrow_schema(eng.read())  # metadata-only, no Spark job
            bucket_groups: list[list[int] | None] = [None]
            version: int | None = None
            if hasattr(eng, "table"):  # lake-table asset: bucket-sliced
                # pin ONE snapshot version into every endpoint ticket: each
                # do_get resolves the ticket's version instead of the head,
                # so a commit landing between slice reads cannot tear the
                # multi-endpoint read — the union of slices equals the
                # single-stream read of the advertised snapshot (the same
                # race the HTTP path closes with X-Table-Version)
                version = eng.table.current_version()
                live = eng.table.live_buckets()
                if live:
                    bucket_groups = [[b] for b in live]
            endpoints = []
            for group in bucket_groups:
                payload: dict = {"asset_name": asset}
                if version is not None:
                    payload["version"] = version
                if group is not None:
                    payload["buckets"] = group
                endpoints.append(
                    fl.FlightEndpoint(fl.Ticket(json.dumps(payload).encode()), [])
                )
            return fl.FlightInfo(schema, descriptor, endpoints, -1, -1)

        # --------------------------------------------------------------- read
        def do_get(self, context, ticket):
            """Streamed read: a GeneratorStream fed batch-by-batch from the
            Arrow-native iterator — reference parity with its streamed
            response (abm/server.py:159) plus bounded driver memory. A
            ticket carrying ``buckets`` serves just that bucket slice
            (issued per-bucket by get_flight_info for lake assets); a
            ticket carrying ``from_version`` serves the INCREMENTAL change
            rows ``(from_version, to_version]`` instead of full state (the
            reference re-reads everything per request — its do_get at
            abm/server.py:140-159 has no delta concept; lake assets here
            let a CDC consumer poll just the net changes, tombstones
            visible). A rewritten range (compaction/COW) fails loudly with
            the fall-back-to-full-read contract of LakeTable.changes."""
            payload = json.loads(ticket.ticket.decode())
            asset = payload["asset_name"]
            eng = self._engine(asset)
            if "from_version" in payload:
                if not hasattr(eng, "changes"):
                    raise fl.FlightServerError(
                        f"asset {asset!r} does not serve incremental changes"
                    )
                try:
                    # a server-issued ticket pins `version`; use it as the
                    # default upper bound so the delta read is snapshot-
                    # consistent with the advertised FlightInfo
                    df = eng.changes(
                        int(payload["from_version"]),
                        payload.get("to_version", payload.get("version")),
                    )
                except (ValueError, FileNotFoundError) as e:
                    # range rewritten by maintenance / from-snapshot expired
                    raise fl.FlightServerError(str(e))
            else:
                kwargs = {
                    k: payload[k]
                    for k in ("buckets", "version")
                    if payload.get(k) is not None
                }
                df = eng.read(**kwargs)
                # size-gated eager path: when snapshot metadata bounds the
                # slice's bytes (per-bucket endpoints are exactly this
                # shape), skip the streaming iterator whose per-batch
                # Python IPC hop serializes concurrent streams on the
                # driver GIL — see EAGER_READ_MAX_BYTES for the measured
                # 10x on 16-way parallel bucket reads
                if hasattr(eng, "table"):
                    est = eng.table.entry_bytes(
                        payload.get("buckets"), payload.get("version")
                    )
                    if est <= EAGER_READ_MAX_BYTES:
                        return fl.GeneratorStream(
                            _arrow_schema(df), _arrow_batches_eager(df)
                        )
            return fl.GeneratorStream(_arrow_schema(df), _arrow_batches(df))

        # -------------------------------------------------------------- write
        def do_put(self, context, descriptor, reader, writer):
            """Descriptor command = JSON ``{asset, write_mode}``
            (abm/server.py:166-187; json_schema is unnecessary here — the
            Arrow stream carries a real schema, unlike the reference's
            2-type JSON-Schema fabrication at abm/connector.py:302-318).

            STREAMED: the incoming Flight stream is consumed chunk-by-chunk
            into a parquet staging file (``pq.ParquetWriter`` — one Arrow
            batch in driver memory at a time, never ``read_all()``; parquet
            preserves nullable int64/binary exactly, so the r3
            type-fidelity contract holds), then ONE ``spark.read.parquet``
            + ``eng.write`` applies it as a single commit — atomicity and
            exactly-once of the engine's merge are untouched. The reference
            never holds a write body either (abm/connector.py:323-341);
            this is its 1024-byte copy loop, Arrow-shaped."""
            import pyarrow.parquet as pq

            global LAST_PUT_CHUNKS
            cmd = json.loads(descriptor.command.decode())
            asset = cmd["asset"]
            mode = cmd.get("write_mode", "append")
            eng = self._engine(asset)
            staging = _spill_dir()
            spill = os.path.join(staging, "put.parquet")
            try:
                pqw = None
                n_chunks = 0
                try:
                    for chunk in reader:
                        if chunk.data is None:  # metadata-only message
                            continue
                        if pqw is None:
                            pqw = pq.ParquetWriter(spill, chunk.data.schema)
                        pqw.write_batch(chunk.data)
                        n_chunks += 1
                finally:
                    if pqw is not None:
                        pqw.close()
                LAST_PUT_CHUNKS = n_chunks
                if pqw is None:
                    # empty stream: zero-row frame from the declared schema
                    # (overwrite-with-empty must still truncate)
                    import pyarrow as pa

                    df = eng.spark.createDataFrame(
                        pa.Table.from_batches([], schema=reader.schema)
                    )
                else:
                    df = eng.spark.read.parquet(spill)
                eng.write(df, mode=mode)
            finally:
                shutil.rmtree(staging, ignore_errors=True)

else:  # pragma: no cover

    class EngineFlightServer:  # type: ignore[no-redef]
        def __init__(self, *a, **kw):
            raise ImportError("pyarrow.flight is not available in this build")


class _EngineHttpHandler(BaseHTTPRequestHandler):
    """HTTP facade (reference abm/server.py:39-91): GET streams the asset as
    NDJSON; PUT/POST writes an NDJSON body (write mode via X-Write-Mode
    header; the reference passes mode/schema through headers too)."""

    assets: dict[str, Engine] = {}
    protocol_version = "HTTP/1.1"  # chunked transfer needs 1.1

    def log_message(self, *args):  # quiet test runs
        pass

    def _engine(self) -> Engine | None:
        from urllib.parse import urlsplit

        asset = urlsplit(self.path).path.strip("/")
        eng = self.assets.get(asset)
        if eng is None:
            self.send_response(404)
            self.send_header("Content-Length", "0")
            self.end_headers()
        return eng

    def _query(self) -> dict:
        from urllib.parse import parse_qsl, urlsplit

        return dict(parse_qsl(urlsplit(self.path).query))

    def do_GET(self):
        """Chunked NDJSON stream: one partition of JSON lines on the driver
        at a time (``toJSON().toLocalIterator()``), flushed every
        READ_BATCH_ROWS lines — the asset never materializes driver-side
        (the reference's GET also streams, abm/server.py:39-60).

        ``?from_version=N[&to_version=M]`` on a lake asset serves the
        INCREMENTAL change rows instead of full state (tombstones visible,
        metadata columns retained) — the polling CDC-consumer read the
        reference cannot express. A range rewritten by maintenance returns
        409 (consumer falls back to a full read, same contract as
        LakeTable.changes). ``?buckets=0,3,7`` serves just those hash-bucket
        slices (complete per identity key — parallel HTTP clients split a
        read bucket-wise exactly like the per-bucket Flight endpoints).
        Lake responses carry ``X-Table-Version`` — the snapshot version the
        BODY is pinned to, captured BEFORE planning and threaded through
        the read/changes call: reading the head version after planning let
        a commit land in between, making the header advertise a version
        whose changes were not in the body, so a consumer polling
        ``?from_version=<header>`` next would silently skip them forever.

        Error mapping: 400 = the request itself is malformed (unparseable
        ``from_version``/``to_version``/``buckets``, or a version/bucket
        param on an asset that serves neither); 409 = the request was fine
        but the range is UNSERVABLE now (rewritten by maintenance on a
        keyless table, or the from-snapshot expired) — retryable as a full
        read, so it must not share a status with client bugs."""
        eng = self._engine()
        if eng is None:
            return
        params = self._query()
        is_lake = hasattr(eng, "table")
        try:  # parse/validate BEFORE any engine call: bad input is 400
            from_v = (
                int(params["from_version"]) if "from_version" in params else None
            )
            to_v = int(params["to_version"]) if params.get("to_version") else None
            buckets = (
                [int(b) for b in params["buckets"].split(",") if b]
                if "buckets" in params
                else None
            )
            if from_v is not None and not hasattr(eng, "changes"):
                raise ValueError("asset serves no incremental changes")
            if buckets is not None and not is_lake:
                raise ValueError("asset is not bucket-sliced")
        except ValueError:
            self.send_response(400)
            self.send_header("Content-Length", "0")
            self.end_headers()
            return
        # pin the whole response to ONE version: header == body contents
        v = eng.table.current_version() if is_lake else None
        try:
            if from_v is not None:
                df = eng.changes(from_v, to_v if to_v is not None else v)
                body_v = to_v if to_v is not None else v
            elif is_lake:
                df = eng.read(buckets=buckets, version=v)
                body_v = v
            else:
                df = eng.read()
                body_v = None
        except (ValueError, FileNotFoundError):
            # range rewritten by maintenance / from-snapshot expired:
            # retryable — consumer falls back to a full read
            self.send_response(409)
            self.send_header("Content-Length", "0")
            self.end_headers()
            return
        self.send_response(200)
        self.send_header("Content-Type", "application/x-ndjson")
        self.send_header("Transfer-Encoding", "chunked")
        if body_v is not None:
            self.send_header("X-Table-Version", str(body_v))
        self.end_headers()

        def chunk(data: bytes) -> None:
            if data:
                self.wfile.write(f"{len(data):x}\r\n".encode() + data + b"\r\n")

        buf: list[str] = []
        for line in df.toJSON().toLocalIterator(prefetchPartitions=True):
            buf.append(line)
            if len(buf) >= READ_BATCH_ROWS:
                chunk(("\n".join(buf) + "\n").encode())
                buf = []
        if buf:
            chunk(("\n".join(buf) + "\n").encode())
        self.wfile.write(b"0\r\n\r\n")

    def _write(self):
        """Streamed NDJSON write: the Content-Length-bounded body is copied
        from ``rfile`` to an NDJSON staging file in ``WRITE_COPY_BYTES``
        chunks (the reference's bounded copy loop,
        abm/connector.py:323-341 — never the whole body in memory), then
        parsed JVM-side by Spark's JSON reader against the asset schema and
        applied as ONE engine write. No per-row Python dicts anywhere."""
        eng = self._engine()
        if eng is None:
            return
        length = int(self.headers.get("Content-Length", "0"))
        mode = self.headers.get("X-Write-Mode", "append")
        staging = _spill_dir()
        spill = os.path.join(staging, "body.ndjson")
        try:
            remaining = length
            with open(spill, "wb") as out:
                while remaining > 0:
                    chunk = self.rfile.read(min(WRITE_COPY_BYTES, remaining))
                    if not chunk:
                        break
                    out.write(chunk)
                    remaining -= len(chunk)
            df = eng.spark.read.schema(eng.schema()).json(spill)
            eng.write(df, mode=mode)
        finally:
            shutil.rmtree(staging, ignore_errors=True)
        self.send_response(200)
        self.send_header("Content-Length", "0")
        self.end_headers()

    do_PUT = _write
    do_POST = _write


class EngineHttpServer:
    """Threaded HTTP server over the asset registry; ``port`` is resolved
    after ``start()`` (bind to port 0 in tests)."""

    def __init__(self, assets: dict[str, Engine], host: str = "127.0.0.1", port: int = 0):
        handler = type("Handler", (_EngineHttpHandler,), {"assets": assets})
        self._httpd = ThreadingHTTPServer((host, port), handler)
        self.port = self._httpd.server_address[1]
        self._thread: threading.Thread | None = None

    def start(self) -> "EngineHttpServer":
        self._thread = threading.Thread(target=self._httpd.serve_forever, daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()
