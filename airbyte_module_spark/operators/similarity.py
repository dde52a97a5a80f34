"""Embedding similarity search: brute-force cosine top-k (baseline) and
random-hyperplane LSH bucketing (the scale path), plus embedding-cosine
near-duplicate pairs.

Determinism design: embeddings are quantized to integers (``round(x*1000)``)
before any arithmetic, so dot products and norms are *exact* int64 math and
cosine is a single double division/sqrt of exactly-represented integers —
bit-identical between Spark and the DuckDB oracle, immune to float summation
order. Quantization at 1e-3 changes cosine by < 1e-2 for unit-scale vectors,
irrelevant for ranking near-dups.

Scale notes:
- brute-force top-k broadcasts the (small) query set against the full corpus
  — embarrassingly parallel, no shuffle on the corpus side, O(Q*N) compute.
  Correct baseline; use for Q << N.
- LSH bucketing assigns each vector an 8-bit random-hyperplane signature
  (deterministic planes derived from sha256). ANN search joins query and
  corpus *within buckets* (expected N/256 candidates per query), turning
  O(Q*N) into O(Q*N/2^planes) with recall controlled by multi-probe /
  plane count. Bucket skew is bounded because hyperplane cuts are
  near-balanced for centered data.

All pure Catalyst expressions (zip_with/aggregate) — no UDFs.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

N_PLANES = 8
PLANE_DIM = 64
QUANT = 1000


def quantize(col) -> F.Column:
    """array<float> -> array<long>: round(x*1000). Exact int math follows."""
    return F.transform(col, lambda x: F.round(x.cast("double") * QUANT).cast("long"))


def int_dot(a, b) -> F.Column:
    """Exact int64 dot product of two equal-length long arrays."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def cosine_from_ints(dot, na, nb) -> F.Column:
    """cosine = dot / sqrt(na*nb) on exact ints — deterministic double."""
    return dot.cast("double") / F.sqrt((na * nb).cast("double"))


def plane_coeffs(n_planes: int = N_PLANES, dim: int = PLANE_DIM) -> list[list[int]]:
    """Deterministic pseudo-random hyperplanes: coeff(p,d) in [-1000, 1000]
    from sha256(f"{p}:{d}") — reproducible in any engine/language, embedded
    as literals in both the Spark plan and the SQL oracle."""
    planes = []
    for p in range(n_planes):
        row = []
        for d in range(dim):
            h = int(hashlib.sha256(f"{p}:{d}".encode()).hexdigest()[:15], 16)
            row.append(h % (2 * QUANT + 1) - QUANT)
        planes.append(row)
    return planes


def with_quantized(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    qv = quantize(F.col(vec_col))
    return emb.select(
        "vec_id",
        qv.alias("qv"),
    ).withColumn("norm2", int_dot(F.col("qv"), F.col("qv")))


def ann_brute_force(
    emb: DataFrame, n_queries: int = 10, k: int = 5, vec_col: str = "embedding"
) -> DataFrame:
    """Exact cosine top-k: the first ``n_queries`` vec_ids are the query set,
    broadcast against the whole corpus; rank by (cosine desc, vec_id) per
    query. Output: (query_id, neighbor_id, rank, dot_q, cosine)."""
    q = with_quantized(emb, vec_col)
    queries = q.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("qv").alias("q_qv"),
        F.col("norm2").alias("q_norm2"),
    )
    pairs = q.crossJoin(F.broadcast(queries)).filter(
        F.col("vec_id") != F.col("query_id")
    )
    dot = int_dot(F.col("q_qv"), F.col("qv"))
    scored = pairs.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        dot.alias("dot_q"),
        cosine_from_ints(dot, F.col("q_norm2"), F.col("norm2")).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("dot_q").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "dot_q", "cosine")
    )


def lsh_buckets(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Random-hyperplane LSH signature per vector: bit p = (qv . plane_p) >= 0.
    Output: (vec_id, bucket) with bucket in [0, 2^N_PLANES)."""
    q = with_quantized(emb, vec_col)
    bucket = None
    for p, coeffs in enumerate(plane_coeffs()):
        plane = F.array(*[F.lit(c).cast("long") for c in coeffs])
        bit = F.when(
            int_dot(F.col("qv"), plane) >= 0, F.lit(1 << p).cast("long")
        ).otherwise(F.lit(0).cast("long"))
        bucket = bit if bucket is None else bucket + bit
    return q.select("vec_id", bucket.alias("bucket"))


def ann_lsh(
    emb: DataFrame, n_queries: int = 10, k: int = 5, vec_col: str = "embedding"
) -> DataFrame:
    """Approximate top-k: brute-force *within* the query's LSH bucket only.
    Same output shape as :func:`ann_brute_force`; recall < 1 by construction
    (single-probe). The join is bucket-equi, so candidate generation scales
    with N/2^planes per query instead of N."""
    q = with_quantized(emb, vec_col)
    b = lsh_buckets(emb, vec_col)
    qb = q.join(b, "vec_id")
    queries = qb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("qv").alias("q_qv"),
        F.col("norm2").alias("q_norm2"),
        F.col("bucket").alias("q_bucket"),
    )
    cands = qb.join(
        F.broadcast(queries),
        (F.col("bucket") == F.col("q_bucket")) & (F.col("vec_id") != F.col("query_id")),
    )
    dot = int_dot(F.col("q_qv"), F.col("qv"))
    scored = cands.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        dot.alias("dot_q"),
        cosine_from_ints(dot, F.col("q_norm2"), F.col("norm2")).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("dot_q").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "dot_q", "cosine")
    )


def near_dup_pairs(
    emb: DataFrame, threshold: float = 0.45, vec_col: str = "embedding"
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (vec_a < vec_b, cosine >=
    threshold). Exact all-pairs form — the verification-grade variant; at
    corpus scale, run the same scoring only on LSH-bucket candidate pairs
    (compose :func:`lsh_buckets` with this scorer)."""
    q = with_quantized(emb, vec_col)
    a = q.select(
        F.col("vec_id").alias("vec_a"), F.col("qv").alias("qa"), F.col("norm2").alias("na")
    )
    b = q.select(
        F.col("vec_id").alias("vec_b"), F.col("qv").alias("qb"), F.col("norm2").alias("nb")
    )
    pairs = a.join(b, F.col("vec_a") < F.col("vec_b"))
    dot = int_dot(F.col("qa"), F.col("qb"))
    return pairs.select(
        "vec_a",
        "vec_b",
        dot.alias("dot_q"),
        cosine_from_ints(dot, F.col("na"), F.col("nb")).alias("cosine"),
    ).filter(F.col("cosine") >= threshold)
