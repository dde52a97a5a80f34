"""Deterministic seeded change-feed generators (FIXTURES.md F1/F2/F5).

Two generators share one logical model:

- :func:`generate_feed` — pure-Python, exact control of the event mix
  (LWW ties, late events, duplicate replays, deletes, evolution cut-over).
  Used by unit tests together with the pandas oracle.
- :func:`generate_feed_spark` — Spark-side scale generator for benchmarks:
  every field is a deterministic function of the event id (sha2-derived), so
  output is independent of partitioning and identical across runs. All
  expression work is JVM-side (no Python UDFs) so generation never bounds the
  measured ingest throughput.

Seeding discipline follows the reference's test precedent
(``Faker.seed(1234)`` at ``/root/reference/helm/client/client.py:21``).
"""

from __future__ import annotations

import hashlib
import json
import os
import random
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LANGS = ["python", "go", "java", "js", "rust", "md"]

_WORDS = (
    "def class return import for while if else try except lambda yield "
    "func var const struct interface impl trait match pub use mod let "
    "public static void int string bool map list array hash merge batch"
).split()


def _content(rng: random.Random, min_len: int = 100, max_len: int = 2000) -> str:
    """Deterministic pseudo-source text with \\r\\n and trailing-whitespace
    variants to exercise normalization (FIXTURES.md F1)."""
    target = rng.randint(min_len, max_len)
    lines, size = [], 0
    while size < target:
        line = " ".join(rng.choice(_WORDS) for _ in range(rng.randint(3, 10)))
        if rng.random() < 0.3:
            line += " " * rng.randint(1, 4)  # trailing whitespace variant
        lines.append(line)
        size += len(line) + 1
    sep = "\r\n" if rng.random() < 0.4 else "\n"
    return sep.join(lines)


def _commit(repo: str, path: str, seq: int) -> str:
    return hashlib.sha1(f"{repo}|{path}|{seq}".encode()).hexdigest()


@dataclass
class FeedSpec:
    """Shape of a synthetic feed. Defaults give a small, branchy fixture."""

    seed: int = 42
    n_repos: int = 8
    paths_per_repo: int = 12
    n_events: int = 400
    n_shards: int = 8
    p_update: float = 0.45
    p_delete: float = 0.10
    p_duplicate: float = 0.05  # exact-duplicate replay of a prior event
    p_late: float = 0.10  # event emitted with an older cursor
    p_tie: float = 0.05  # same emitted_at as previous event on the key
    p_noise: float = 0.05  # LOG/STATE lines the engine must ignore
    hot_repo_share: float = 0.5  # fraction of events hitting repo 0 (skew)
    evolution_after: int | None = None  # seq cut-over adding branch/size (F5)
    stream: str = "repo_files"


def generate_feed(spec: FeedSpec, out_dir: str) -> list[dict]:
    """Write NDJSON shards to ``out_dir``; return the RECORD events in emit
    order (for the oracle). Shard assignment round-robins so every shard
    carries interleaved keys."""
    rng = random.Random(spec.seed)
    repos = [f"org{i % 3}/project{i}" for i in range(spec.n_repos)]
    keys = [
        (r, f"src/pkg{k % 4}/file{k}.{rng.choice(['py', 'go', 'rs', 'md'])}")
        for r in repos
        for k in range(spec.paths_per_repo)
    ]
    live: dict[tuple[str, str], int] = {}
    events: list[dict] = []
    lines_per_shard: list[list[str]] = [[] for _ in range(spec.n_shards)]
    emitted_at = 1_700_000_000_000

    def pick_key() -> tuple[str, str]:
        if rng.random() < spec.hot_repo_share:
            return keys[rng.randrange(spec.paths_per_repo)]  # hot repo 0
        return keys[rng.randrange(len(keys))]

    seq = 0
    while len(events) < spec.n_events:
        roll = rng.random()
        if roll < spec.p_duplicate and events:
            ev = dict(rng.choice(events))  # exact replay (idempotence test)
        else:
            key = pick_key()
            seq += 1
            if roll < spec.p_tie + spec.p_duplicate:
                pass  # keep emitted_at (tie with previous event; seq breaks it)
            elif roll < spec.p_tie + spec.p_duplicate + spec.p_late:
                emitted_at -= rng.randint(1, 5000)  # late/out-of-order cursor
            else:
                emitted_at += rng.randint(1, 2000)
            if key in live and rng.random() < spec.p_delete / (1 - spec.p_duplicate):
                op = "d"
                live.pop(key, None)
            elif key in live:
                op = "u"
            else:
                op = "i"
                live[key] = seq
            data = {
                "op": op,
                "seq": seq,
                "repo": key[0],
                "path": key[1],
                "commit": _commit(key[0], key[1], seq),
                "lang": rng.choice(LANGS),
                "content": None if op == "d" else _content(rng),
            }
            if spec.evolution_after is not None and seq > spec.evolution_after:
                data["branch"] = rng.choice(["main", "dev", "release"])
                data["size"] = len(data["content"] or "")
            ev = {
                "type": "RECORD",
                "record": {
                    "stream": spec.stream,
                    "namespace": "public",
                    "emitted_at": emitted_at,
                    "data": data,
                },
            }
        events.append(ev)
        shard = lines_per_shard[len(events) % spec.n_shards]
        if rng.random() < spec.p_noise:
            shard.append(json.dumps({"type": "LOG", "log": {"level": "INFO", "message": "noise"}}))
        if rng.random() < spec.p_noise / 2:
            shard.append(
                json.dumps(
                    {"type": "STATE", "state": {"data": {"cursor": emitted_at}}}
                )
            )
        shard.append(json.dumps(ev, separators=(",", ":")))

    os.makedirs(out_dir, exist_ok=True)
    for i, lines in enumerate(lines_per_shard):
        with open(os.path.join(out_dir, f"shard-{i:05d}.json"), "w") as f:
            f.write("\n".join(lines) + ("\n" if lines else ""))
    return events


def generate_feed_spark(
    spark: SparkSession,
    n_events: int,
    n_keys: int = 100_000,
    hot_fraction: float = 0.3,
    content_bytes: int = 200,
    p_delete: float = 0.05,
    seed: int = 42,
    stream: str = "repo_files",
) -> DataFrame:
    """Scale generator: DataFrame of envelope JSON lines (column ``value``).

    Deterministic pure functions of ``id`` only — safe under any partitioning.
    ``hot_fraction`` of events hit a single hot repo to exercise skew handling
    (north_star "salted keys for hot-repo skew").
    """
    df = spark.range(n_events)  # column `id`
    h = F.abs(F.xxhash64(F.col("id"), F.lit(seed)))
    # Key space: hot repo 0 takes `hot_fraction` of events, rest uniform.
    is_hot = (h % 1000) < int(hot_fraction * 1000)
    key_id = F.when(is_hot, h % max(n_keys // 100, 1)).otherwise(h % n_keys)
    repo = F.when(is_hot, F.lit("org0/hot-monorepo")).otherwise(
        F.concat(F.lit("org"), (key_id % 50).cast("string"), F.lit("/project"), (key_id % 997).cast("string"))
    )
    path = F.concat(
        F.lit("src/pkg"), (key_id % 13).cast("string"), F.lit("/file"), key_id.cast("string"), F.lit(".py")
    )
    op = F.when((h % 100) < int(p_delete * 100), F.lit("d")).otherwise(
        F.when((h % 7) < 3, F.lit("i")).otherwise(F.lit("u"))
    )
    token = F.sha2(F.concat(F.lit("c"), F.col("id").cast("string"), F.lit(str(seed))), 256)
    content = F.when(op == "d", F.lit(None).cast("string")).otherwise(
        F.substring(F.repeat(token, content_bytes // 64 + 1), 1, content_bytes)
    )
    data = F.struct(
        op.alias("op"),
        F.col("id").alias("seq"),
        repo.alias("repo"),
        path.alias("path"),
        F.sha2(F.concat(repo, path, F.col("id").cast("string")), 256).substr(1, 40).alias("commit"),
        F.element_at(F.array(*[F.lit(x) for x in LANGS]), (h % 6 + 1).cast("int")).alias("lang"),
        content.alias("content"),
    )
    envelope = F.to_json(
        F.struct(
            F.lit("RECORD").alias("type"),
            F.struct(
                F.lit(stream).alias("stream"),
                F.lit("public").alias("namespace"),
                # mostly-increasing cursor with deterministic jitter (late events)
                (F.lit(1_700_000_000_000) + F.col("id") * 3 - (h % 5000)).alias("emitted_at"),
                data.alias("data"),
            ).alias("record"),
        )
    )
    return df.select(envelope.alias("value"))
