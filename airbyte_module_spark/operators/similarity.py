"""Embedding similarity search: brute-force cosine top-k (baseline),
random-hyperplane LSH bucketing (the scale path), multi-probe ANN, and
embedding-cosine near-duplicate pairs (all-pairs verifier + LSH-bucketed
scale form).

Determinism design: embeddings are quantized to integers (``round(x*1000)``)
before any arithmetic, so dot products and norms are *exact* int64 math and
cosine is a single double division/sqrt of exactly-represented integers —
bit-identical between Spark and the DuckDB oracle, immune to float summation
order. Quantization at 1e-3 changes cosine by < 1e-2 for unit-scale vectors,
irrelevant for ranking near-dups. Ranking is by (cosine desc, neighbor_id):
cosine is the documented metric and, being a deterministic double on both
engines, is a safe cross-engine sort key even for unnormalized embeddings
(ranking by raw dot would be cosine-equivalent only for unit-norm vectors).

Scale notes:
- brute-force top-k broadcasts the (small) query set against the full corpus
  — embarrassingly parallel, no shuffle on the corpus side, O(Q*N) compute.
  Correct baseline; use for Q << N.
- LSH bucketing assigns each vector an 8-bit random-hyperplane signature
  (deterministic planes derived from sha256). ANN search joins query and
  corpus *within buckets* (expected N/256 candidates per query), turning
  O(Q*N) into O(Q*N/2^planes); multi-probe (also searching all buckets at
  Hamming distance 1) trades 9x candidates for near-exact recall. Bucket
  skew is bounded because hyperplane cuts are near-balanced for centered
  data.
- near-dup at corpus scale: :func:`near_dup_pairs_lsh` — candidates are
  banded-bucket collisions (grouped pair expansion, candidate-linear), never
  all-pairs. :func:`near_dup_pairs` (exact all-pairs) is the small-scale
  verifier only.
- IVF (:func:`ann_ivf`) is the recall-strong ANN path: 64 k-means-trained
  centroids (deterministic driver-side Lloyd over a capped sample, exact
  integer math so the oracle reproduces them bit-for-bit), broadcast
  assignment, nprobe cells searched exactly.

Execution discipline: per-ROW work (norms, bucket signatures, centroid
similarity) is unrolled Catalyst expressions over literal indices —
``aggregate(zip_with(...))`` higher-order lambdas are interpreted in Spark 4.
Per-PAIR scoring goes through ONE Arrow-batched numpy kernel
(:func:`_dot64_arrow`): a 64-term expression folded into a join condition
(or fallen out of whole-stage codegen) evaluates interpreted per candidate —
measured 4-13 µs/pair vs ~0.05 µs vectorized — and routing the dot through
the Python eval node also stops Catalyst from pushing the cosine filter back
into the join. Never BatchEvalPython (plan-pinned).
"""

from __future__ import annotations

import hashlib
import os
from urllib.parse import urlparse

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

N_PLANES = 8
PLANE_DIM = 64
QUANT = 1000


@pandas_udf(T.LongType())
def _dot64_arrow(a: pd.Series, b: pd.Series) -> pd.Series:
    """Arrow-batched exact int64 dot product of two array<long> columns.

    The pair-scoring hot path: Catalyst evaluates a 64-term product-sum
    expression INTERPRETED once it is folded into a join condition or falls
    out of whole-stage codegen (measured ~4-13 µs/pair either way at sf0.1);
    numpy does the same math as one vectorized (batch, 64) int64
    multiply-sum — bit-exact (int64 wraparound semantics match Spark/DuckDB
    BIGINT) and ~100x faster per pair, paying only the Arrow column
    transfer. This is ArrowEvalPython, never BatchEvalPython (pinned by
    tests/test_plan_shapes.py)."""
    if len(a) == 0:
        return pd.Series([], dtype="int64")
    A = np.stack(a.to_numpy())
    B = np.stack(b.to_numpy())
    return pd.Series((A * B).sum(axis=1))


def quantize(col) -> Column:
    """array<float> -> array<long>: round(x*1000). Exact int math follows."""
    return F.transform(col, lambda x: F.round(x.cast("double") * QUANT).cast("long"))


def cosine_from_ints(dot, na, nb) -> Column:
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


def _quantize_np(vectors) -> np.ndarray:
    """Quantize a batch of length-``PLANE_DIM`` float vectors to int64:
    exact round-half-away-from-zero of x*1000 (``np.rint`` everywhere —
    identical to half-away except on exact .5 fractions, corrected via
    trunc±1). Bit-identical to Spark ``F.round`` HALF_UP and DuckDB
    ``round()`` on this data. LOUD on any length != PLANE_DIM (same
    contract as :func:`with_quantized`), and on any NaN / null ELEMENT
    inside a vector: ``.astype(int64)`` of NaN is undefined (typically
    INT64_MIN), which would flow silent garbage into every downstream
    dot/cosine — the pre-kernel Catalyst form propagated null and dropped
    the pair, so the kernel must not invent values where the expression
    form had none."""
    if any(len(x) != PLANE_DIM for x in vectors):
        raise ValueError(
            f"embedding length != {PLANE_DIM} (vec_id column has a short/long vector)"
        )
    V = np.stack(np.asarray(vectors, dtype=object)).astype(np.float64) * 1000.0
    if not np.isfinite(V).all():
        # finiteness, not just NaN: ±inf passes an isnan check, casts to
        # INT64_MIN, and |INT64_MIN| wraps negative so the dim*q² magnitude
        # guard below would never fire — silent garbage in the exact paths
        raise ValueError(
            "embedding contains NaN/inf/null elements (whole-null vectors "
            "are dropped upstream; a partially-null or non-finite vector is "
            "corrupt input)"
        )
    R = np.rint(V)
    tr = np.trunc(V)
    half = np.abs(V - tr) == 0.5
    Q = np.where(half, tr + np.copysign(1.0, V), R).astype(np.int64)
    # Magnitude guard for ALL downstream exact arithmetic: with
    # dim*q² <= 2^31, norm2 fits 2^31, the norm PRODUCT na*nb fits int64
    # (DuckDB raises on BIGINT overflow while numpy silently wraps — the
    # engines would diverge), and every dot is far below the 2^53 bound
    # where float64 BLAS matmuls are still exact integers. Raise loudly
    # instead of flowing wrapped garbage through cosine filters; the fix
    # for a legitimate corpus is to normalize the embeddings.
    qmax = int(np.abs(Q).max(initial=0))
    if PLANE_DIM * qmax * qmax > 2**31:
        raise ValueError(
            f"quantized magnitude {qmax} exceeds the exact-arithmetic bound "
            f"(dim*q^2 must fit 2^31; normalize embeddings before ingest)"
        )
    return Q


@pandas_udf(
    T.StructType(
        [
            T.StructField("qv", T.ArrayType(T.LongType())),
            T.StructField("norm2", T.LongType()),
        ]
    )
)
def _quantize_norm_arrow(e: pd.Series) -> pd.DataFrame:
    """Arrow-batched quantization + norm: array<double> embedding →
    (qv = round-half-away(x*1000) as int64, norm2 = qv·qv).

    One numpy pass replaces the Catalyst ``transform`` + unrolled 64-term
    norm expression — ``transform``'s lambda is interpreted PER ELEMENT in
    Spark 4, and the dimension-checking CASE around it was cloned 128×
    into the norm and again into optimizer-inferred not-null filters
    (InferFiltersFromConstraints), which dominated ann_topk's cost
    (measured 0.7s → 0.31s for the quantize stage alone at sf0.1).
    Rounding is exact round-half-away-from-zero (rint everywhere, trunc±1
    on exact .5 fractions) — bit-identical to Spark's ``F.round`` HALF_UP
    and DuckDB's ``round()`` on this data (equality pinned against the
    expression form by tests and the oracle gate)."""
    if len(e) == 0:
        return pd.DataFrame(
            {"qv": pd.Series([], dtype=object), "norm2": pd.Series([], dtype="int64")}
        )
    Q = _quantize_np(e)
    return pd.DataFrame({"qv": list(Q), "norm2": (Q * Q).sum(axis=1)})


def with_quantized(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """(vec_id, qv, norm2) via ONE Arrow kernel pass. Dimension check is
    LOUD: ``int_dot``'s literal indexing returns null (not an error) past
    the end of a short array, which would silently drop rows through
    downstream cosine filters — so any vector whose length != PLANE_DIM
    raises inside the kernel instead. A NULL vector is exempt from the
    loud contract: it can never be a candidate or a pair member, so it is
    dropped by the filter here (equivalent to the null propagating through
    every downstream cosine filter, and it keeps None out of the numpy
    kernels). ZERO-NORM vectors (all elements quantize to 0) are likewise
    excluded: cosine against them is 0/0 = NaN, which Spark windows rank
    ABOVE every real cosine while numpy's lexsort ranks it last — no single
    defined order exists, so the one defined semantics everywhere (both
    kernels, the Catalyst forms, and the SQL oracles' fixtures, which
    contain no zero vectors) is "a direction-less vector is never a
    candidate, pair member, or query"."""
    return (
        emb.filter(F.col(vec_col).isNotNull())
        .select("vec_id", _quantize_norm_arrow(F.col(vec_col)).alias("_qn"))
        .select("vec_id", F.col("_qn.qv").alias("qv"), F.col("_qn.norm2").alias("norm2"))
        .filter(F.col("norm2") > 0)
    )


def _pdf_to_quantized(
    pdf, vec_col: str
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Driver-side quantization of a collected (vec_id, vectors) frame:
    (ids, Q, norms) sorted by vec_id, zero-norm rows dropped — the exact
    :func:`with_quantized` semantics (dim/NaN checks raise identically via
    :func:`_quantize_np`), minus the per-row Arrow round-trip. Used for the
    small sets that end up in the driver anyway (broadcast matrices, query
    sets, training samples): quantizing them through a distributed kernel
    pays a full Python-stage hop per pass for math the driver does in one
    vectorized call on the same collected rows (guide §4.1: control how
    many columns cross the boundary — here none do)."""
    ids = pdf["vec_id"].to_numpy().astype(np.int64)
    Q = _quantize_np(pdf[vec_col].to_numpy())
    norms = (Q * Q).sum(axis=1)
    keep = norms > 0
    ids, Q, norms = ids[keep], Q[keep], norms[keep]
    order = np.argsort(ids)
    return ids[order], Q[order], norms[order]


def _collect_quantized(
    emb: DataFrame, vec_col: str
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """ONE driver job collecting the raw (vec_id, vector) columns, then
    :func:`_pdf_to_quantized`. Replaces ``with_quantized(emb).toPandas()``
    on the broadcast paths: the old form ran the quantize kernel as a
    distributed Python stage and shipped the int64 arrays back row by row
    (~0.6s/pass at 20k rows, most of it Arrow struct<array> conversion);
    the raw floats are smaller on the wire and the math is one numpy call."""
    pdf = (
        emb.filter(F.col(vec_col).isNotNull()).select("vec_id", vec_col).toPandas()
    )
    if len(pdf) == 0:
        return (
            np.empty(0, np.int64),
            np.empty((0, PLANE_DIM), np.int64),
            np.empty(0, np.int64),
        )
    return _pdf_to_quantized(pdf, vec_col)


def _srp_planes(
    n_bands: int, rows_per_band: int, stride: int | None = None
) -> tuple[np.ndarray, np.ndarray]:
    """(planes matrix, bit weights) for SRP codes — shared by the kernel
    and the driver-side form so both compute identical buckets."""
    if stride is None:
        stride = rows_per_band
    assert stride >= rows_per_band
    all_planes = plane_coeffs(n_bands * stride)
    planes = np.array(
        [all_planes[b * stride + r]
         for b in range(n_bands) for r in range(rows_per_band)],
        dtype=np.int64,
    )
    weights = 1 << np.arange(rows_per_band, dtype=np.int64)
    return planes, weights


def _srp_codes_np(
    Q: np.ndarray, n_bands: int, rows_per_band: int, stride: int | None = None
) -> np.ndarray:
    """(n_rows, n_bands) SRP bucket codes — the kernel's exact int64 math
    ((Q @ P.T) >= 0, bit-weighted sums) run driver-side on an
    already-quantized matrix."""
    planes, weights = _srp_planes(n_bands, rows_per_band, stride)
    bits = (Q @ planes.T) >= 0
    return (bits.reshape(len(Q), n_bands, rows_per_band) * weights).sum(axis=2)


def _srp_codes_udf(n_bands: int, rows_per_band: int, stride: int | None = None):
    """Arrow-batched SRP signature kernel: array<long> qv → array of
    ``n_bands`` bucket codes, bit r of band b = (qv · plane_{b·stride+r}) >= 0.

    ``stride`` is the plane-index distance between consecutive bands
    (default ``rows_per_band`` — dense assignment, the historical layout
    used by :func:`with_buckets` / :func:`lsh_buckets`). The banded
    near-dup path passes a FIXED stride (:data:`NEARDUP_R_MAX`) larger
    than ``rows_per_band`` so that growing the adaptive code width only
    APPENDS planes to each band: the r-bit bucket is exactly the low-r-bit
    truncation of the full-width code, which is what lets the SQL oracle
    mirror adaptivity with one static code expression and a modulus.

    One numpy int64 matmul against the (planes × 64) coefficient matrix
    replaces an n_bands·rows_per_band·64-term Catalyst expression — the
    expression form is exact too, but a 512-term tree costs seconds of
    throttled codegen compile per plan in this sandbox and risks falling
    back to interpreted eval; the kernel's math is identical
    ((Q @ P.T) >= 0, exact int64), so oracles are unaffected."""
    planes, weights = _srp_planes(n_bands, rows_per_band, stride)

    @pandas_udf(T.ArrayType(T.LongType()))
    def codes(qv: pd.Series) -> pd.Series:
        if len(qv) == 0:
            return pd.Series([], dtype=object)
        Q = np.stack(qv.to_numpy())
        bits = (Q @ planes.T) >= 0
        out = (bits.reshape(len(Q), n_bands, rows_per_band) * weights).sum(axis=2)
        return pd.Series(list(out))

    return codes


def lsh_buckets(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Random-hyperplane LSH signature per vector: (vec_id, bucket) with
    bucket in [0, 2^N_PLANES).

    ONE fused Arrow kernel (quantize + norm + SRP code in a single numpy
    pass) instead of the former quantize-kernel → codes-kernel chain: the
    chained form crossed the Python boundary twice per pass AND the
    ``norm2 > 0`` filter pushdown cloned each kernel below the filter —
    the executed plan carried SIX ArrowEvalPython nodes for one logical
    pass (guide §4.4). The fused kernel is marked non-deterministic so the
    optimizer may not duplicate it; no filter needs to cross it (the only
    predicate above it is the zero-norm drop on its own output)."""
    planes, weights = _srp_planes(1, N_PLANES)

    @pandas_udf("norm2 long, bucket long")
    def k(e: pd.Series) -> pd.DataFrame:
        if len(e) == 0:
            return pd.DataFrame(
                {"norm2": pd.Series([], dtype="int64"),
                 "bucket": pd.Series([], dtype="int64")}
            )
        Q = _quantize_np(e.to_numpy())
        bits = (Q @ planes.T) >= 0
        return pd.DataFrame(
            {"norm2": (Q * Q).sum(axis=1), "bucket": (bits * weights).sum(axis=1)}
        )

    kernel = k.asNondeterministic()
    out = emb.filter(F.col(vec_col).isNotNull()).select(
        "vec_id", kernel(F.col(vec_col)).alias("_b")
    )
    return out.filter(F.col("_b.norm2") > 0).select(
        "vec_id", F.col("_b.bucket").alias("bucket")
    )


def _rank_topk(scored: DataFrame, k: int) -> DataFrame:
    """Per-query top-k by (cosine desc, neighbor_id) — cosine is the metric;
    the tiebreak makes the cut deterministic. Mirrored in the SQL oracles."""
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "dot_q", "cosine")
    )


def ann_brute_force(
    emb: DataFrame, n_queries: int = 10, k: int = 5, vec_col: str = "embedding"
) -> DataFrame:
    """Exact cosine top-k: the first ``n_queries`` vec_ids are the query set,
    broadcast against the whole corpus; rank by (cosine desc, vec_id) per
    query. Output: (query_id, neighbor_id, rank, dot_q, cosine).

    Execution is MAP-SIDE TOP-K: the (tiny) quantized query matrix is
    broadcast, each corpus partition scores its own rows with one numpy
    int64 matmul and emits only its per-batch top-k per query, and the
    final rank window sees Q·k·partitions candidate rows instead of Q·N
    scored pairs. Per-batch top-k uses the identical (cosine desc,
    neighbor_id asc) order as the global window, so the global winners are
    always inside the surviving candidates — exactness is unchanged while
    the shuffle shrinks from the corpus size to metadata size (the r1-r3
    crossJoin + full-width window form shuffled every scored pair; at
    10^8 vectors that window IS the job). Math is bit-identical to the
    DuckDB oracle: exact int64 dot/norms, one IEEE-double sqrt+divide.

    Zero-norm vectors are excluded on BOTH sides (the
    :func:`with_quantized` contract): their cosine is 0/0 = NaN, which
    Spark's window ranks above every real cosine while ``np.lexsort``
    ranks it last — the map-side prune and the global window would
    disagree on which candidates survive, silently breaking exactness.
    Masking them out gives both forms (and the oracle, whose fixtures
    have no zero vectors) one defined semantics."""
    corpus = emb.filter(F.col(vec_col).isNotNull()).select("vec_id", vec_col)
    qrows = (
        corpus.filter(F.col("vec_id") < n_queries).collect()
    )  # tiny pushed-down scan; queries ride a broadcast, never a join
    out_schema = "query_id long, neighbor_id long, dot_q long, cosine double"
    if not qrows:
        empty = emb.sparkSession.createDataFrame([], out_schema)
        return _rank_topk(empty, k)
    q_ids = np.array([r[0] for r in qrows], dtype=np.int64)
    QM = _quantize_np([np.asarray(r[1], dtype=np.float64) for r in qrows])
    q_norms = (QM * QM).sum(axis=1)
    bc = emb.sparkSession.sparkContext.broadcast((q_ids, QM, q_norms))

    def score(batches):
        q_ids, QM, q_norms = bc.value
        live_q = np.nonzero(q_norms > 0)[0]  # zero-norm query: no results
        for b in batches:
            if len(b) == 0:
                continue
            ids = b["vec_id"].to_numpy().astype(np.int64)
            C = _quantize_np(b[vec_col].to_numpy())
            norms = (C * C).sum(axis=1)
            D = QM @ C.T  # exact int64, (n_queries, batch)
            with np.errstate(divide="ignore", invalid="ignore"):
                cos = D / np.sqrt(
                    (q_norms[:, None] * norms[None, :]).astype(np.float64)
                )
            for qi in live_q:
                cand = np.nonzero((ids != q_ids[qi]) & (norms > 0))[0]
                order = np.lexsort((ids[cand], -cos[qi, cand]))[:k]
                sel = cand[order]
                if len(sel):
                    yield pd.DataFrame(
                        {
                            "query_id": q_ids[qi],
                            "neighbor_id": ids[sel],
                            "dot_q": D[qi, sel],
                            "cosine": cos[qi, sel],
                        }
                    )

    return _rank_topk(corpus.mapInPandas(score, schema=out_schema), k)


def ann_lsh(
    emb: DataFrame,
    n_queries: int = 10,
    k: int = 5,
    vec_col: str = "embedding",
    multiprobe: bool = False,
) -> DataFrame:
    """Approximate cosine top-k searched within the query's LSH bucket
    (single-probe), or within the bucket plus all 8 Hamming-distance-1
    buckets (``multiprobe=True`` — a query near a hyperplane sits right at a
    bucket boundary, so flipping each bit recovers the neighbors that fell
    on the other side; measured recall@5 goes from ~0.5 single-probe to
    ~0.9+). Same output shape as :func:`ann_brute_force`.

    Execution is MAP-SIDE (the :func:`ann_brute_force` shape): the (tiny)
    quantized query matrix with its probe-bucket sets rides a broadcast
    into ONE fused Arrow kernel that buckets each corpus batch, keeps the
    rows landing in a probe bucket, and scores exactly those candidates
    with one numpy int64 matmul. The former bucket-equi-join form was
    candidate-linear too, but its plan chained two corpus-wide Python
    kernels (quantize, codes), cloned them under filter pushdown (18
    ArrowEvalPython nodes executed — guide §4.4), and paid a third Python
    hop for the pair dot; one kernel does all of it in a single boundary
    crossing. Candidates and scores are identical: each corpus vector
    lives in exactly one bucket and probe buckets are distinct, so
    membership-in-probe-set equals the old join condition row for row."""
    spark = emb.sparkSession
    out_schema = "query_id long, neighbor_id long, dot_q long, cosine double"
    corpus = emb.filter(F.col(vec_col).isNotNull()).select("vec_id", vec_col)
    qrows = corpus.filter(F.col("vec_id") < n_queries).collect()
    planes, weights = _srp_planes(1, N_PLANES)
    q_ids = np.array([r[0] for r in qrows], dtype=np.int64)
    if len(qrows):
        QM = _quantize_np([np.asarray(r[1], dtype=np.float64) for r in qrows])
        q_norms = (QM * QM).sum(axis=1)
        live = q_norms > 0  # zero-norm query: no bucket, no results
        q_ids, QM, q_norms = q_ids[live], QM[live], q_norms[live]
    if not len(q_ids):
        return _rank_topk(spark.createDataFrame([], out_schema), k)
    qbits = (QM @ planes.T) >= 0
    qbuck = (qbits * weights).sum(axis=1)
    if multiprobe:
        flips = (1 << np.arange(N_PLANES, dtype=np.int64))[None, :]
        probes = np.concatenate([qbuck[:, None], qbuck[:, None] ^ flips], axis=1)
    else:
        probes = qbuck[:, None]
    bc = spark.sparkContext.broadcast((q_ids, QM, q_norms, probes))

    def score(batches):
        b_qids, b_QM, b_qnorms, b_probes = bc.value
        for b in batches:
            if len(b) == 0:
                continue
            ids = b["vec_id"].to_numpy().astype(np.int64)
            C = _quantize_np(b[vec_col].to_numpy())
            norms = (C * C).sum(axis=1)
            buck = (((C @ planes.T) >= 0) * weights).sum(axis=1)
            D = b_QM @ C.T  # exact int64, (n_queries, batch)
            with np.errstate(divide="ignore", invalid="ignore"):
                cos = D / np.sqrt(
                    (b_qnorms[:, None] * norms[None, :]).astype(np.float64)
                )
            for qi in range(len(b_qids)):
                m = (
                    (norms > 0)
                    & (ids != b_qids[qi])
                    & np.isin(buck, b_probes[qi])
                )
                sel = np.nonzero(m)[0]
                if len(sel):
                    yield pd.DataFrame(
                        {
                            "query_id": b_qids[qi],
                            "neighbor_id": ids[sel],
                            "dot_q": D[qi, sel],
                            "cosine": cos[qi, sel],
                        }
                    )

    return _rank_topk(corpus.mapInPandas(score, schema=out_schema), k)


N_IVF_CELLS = 64
N_IVF_PROBES = 8
MAX_TRAIN_ROWS = 4096
KMEANS_ITERS = 2

# --------------------------------------------------------------- corpus cache
#: Session-scoped memo of per-corpus *plan-time parameters* — the corpus row
#: count (drives the verifier subsample modulus, the adaptive LSH bucket
#: width, and the IVF training sample) and the trained IVF centroids. These
#: are deterministic pure functions of the corpus content, re-derived per
#: query call in r5 — a suite touching several similarity queries re-counted
#: (and re-Lloyd-ed) the same corpus every time, which is also the wrong
#: production lifecycle (you train an IVF quantizer once per corpus, not per
#: query). Keyed on (canonicalized plan, input files + local mtime/size), so
#: a different filter over the same files, or a rewritten file at the same
#: path, misses the cache and recomputes; a corpus not backed by files
#: (createDataFrame in tests) is never cached. Bounded FIFO — this memoizes
#: metadata-sized artifacts (one int; 64 x 64 ints), never row data, and
#: never query results: every bench/oracle invocation still computes its
#: answer from the parquet inputs.
_CORPUS_CACHE: dict = {}
_CORPUS_CACHE_MAX = 64
#: Cache-miss counters, exposed for the lifecycle regression tests (a second
#: identical call must not re-count / re-train).
CACHE_MISSES = {"count": 0, "centroids": 0}


def _corpus_cache_key(df: DataFrame):
    try:
        files = df.inputFiles()
        sem = df.semanticHash()
    except Exception:
        return None
    if not files:
        return None
    sig = []
    for f in sorted(files):
        p = urlparse(f)
        mtime = size = None
        if p.scheme in ("file", ""):
            try:
                st = os.stat(p.path or f)
                mtime, size = st.st_mtime_ns, st.st_size
            except OSError:
                pass
        sig.append((f, mtime, size))
    return (sem, tuple(sig))


def _corpus_memo(df: DataFrame, slot, compute):
    key = _corpus_cache_key(df)
    if key is None:
        CACHE_MISSES[slot if isinstance(slot, str) else slot[0]] += 1
        return compute()
    ent = _CORPUS_CACHE.get(key)
    if ent is None:
        if len(_CORPUS_CACHE) >= _CORPUS_CACHE_MAX:
            _CORPUS_CACHE.pop(next(iter(_CORPUS_CACHE)))
        ent = _CORPUS_CACHE[key] = {}
    if slot not in ent:
        CACHE_MISSES[slot if isinstance(slot, str) else slot[0]] += 1
        ent[slot] = compute()
    return ent[slot]


def corpus_count(df: DataFrame) -> int:
    """Corpus row count, memoized per corpus identity (see _CORPUS_CACHE)."""
    return _corpus_memo(df, "count", df.count)


def _train_centroids_np(
    emb: DataFrame, n_cells: int, vec_col: str
) -> tuple[np.ndarray, np.ndarray, np.ndarray] | None:
    """TRAINED coarse quantizer: deterministic Lloyd (k-means) refinement of
    the first-``n_cells`` seed, run in the driver over a modulus-capped
    sample. Returns (cell ids 0..k-1, centroid int64 matrix, norms), or
    ``None`` for an empty corpus.

    Every step is integer-exact or correctly-rounded IEEE, so the DuckDB
    oracle (oracle_sql._ivf_train_cte) reproduces the centroids BIT-FOR-BIT:

    - sample: ``vec_id % ceil(count/4096) == 0`` over non-null, nonzero-norm
      vectors (the near_dup verifier's modulus discipline) — training cost is
      O(cap) regardless of corpus size, the standard IVF discipline at scale
      (a 10^10-row corpus trains on the same 4096 rows).
    - init: the ``n_cells`` lowest-vec_id sample rows, cell = rank-1 (the
      r1-r4 untrained quantizer used exactly these seeds as final cells).
    - ``KMEANS_ITERS`` fixed Lloyd steps: assignment = argmax cosine with
      first-max (lowest cell) tiebreak — identical to the corpus assignment
      kernel; update = element-wise FLOOR division of the exact int64 member
      sum by the member count. floor(sum/cnt) via double division is exact
      here: |sum| < 2^53 and the true quotient is >= 1/cnt > 1 ulp away from
      any integer it could round across. An empty cell — or one whose mean
      rounds to the zero vector, which has no cosine direction — keeps its
      previous centroid.

    Why train at all: on clustered corpora, arbitrary-row seeds put multiple
    centroids inside one dense cluster and none in sparse regions; Lloyd
    steps move them toward the data's own geometry, raising recall at equal
    nprobe/scan fraction (measured on the sf0.001 fixture: recall@5
    0.88 -> 0.90 at an unchanged ~12% scan fraction, and 2 iterations reach
    the CONVERGED assignment — iterations 3 and 4 are bit-identical no-ops —
    so KMEANS_ITERS=2 is the saturation point, not a budget cut;
    tests/test_operators.py::test_ann_recall_gate)."""
    total = corpus_count(emb)
    m = max(1, -(-total // MAX_TRAIN_ROWS))  # ceil
    # ONE collect of the raw sample rows; quantization runs driver-side on
    # the same rows (_pdf_to_quantized == with_quantized semantics, minus a
    # distributed Python stage per training call — guide §4.1)
    spdf = (
        emb.filter((F.col("vec_id") % m == 0) & F.col(vec_col).isNotNull())
        .select("vec_id", vec_col)
        .toPandas()
    )
    if len(spdf) == 0:
        return None
    s_ids, S, sn = _pdf_to_quantized(spdf, vec_col)
    if len(s_ids) == 0:
        return None
    k = min(n_cells, len(s_ids))
    C = S[:k].copy()
    cn = sn[:k].copy()
    for _ in range(KMEANS_ITERS):
        cos = (S @ C.T) / np.sqrt(np.outer(sn, cn).astype(np.float64))
        assign = np.argmax(cos, axis=1)  # first max == (cos desc, cell asc)
        for c in range(k):
            members = assign == c
            cnt = int(members.sum())
            if cnt == 0:
                continue
            mv = S[members].sum(axis=0) // cnt  # exact int64 floor mean
            mn = int((mv * mv).sum())
            if mn == 0:
                continue
            C[c] = mv
            cn[c] = mn
    return np.arange(k, dtype=np.int64), C, cn


def _train_centroids(emb: DataFrame, n_cells: int, vec_col: str):
    """Train-once lifecycle for the coarse quantizer: centroids are a
    deterministic pure function of the corpus, so they are memoized per
    corpus identity (_CORPUS_CACHE) — ``ann_ivf``/``ivf_assign`` invoked
    repeatedly against the same corpus pay count+collect+Lloyd exactly once
    (the r5 per-call retraining was the measured +48% ann_ivf_cells
    regression, and re-Lloyd-ing per query is the wrong shape at any scale).
    The artifact is 64 x 64 int64 + norms — metadata-sized."""
    return _corpus_memo(
        emb,
        ("centroids", n_cells, vec_col),
        lambda: _train_centroids_np(emb, n_cells, vec_col),
    )


def ivf_assign(
    emb: DataFrame,
    n_cells: int = N_IVF_CELLS,
    vec_col: str = "embedding",
    _trained=None,
    cells_only: bool = False,
) -> DataFrame:
    """IVF coarse assignment: (vec_id, qv, norm2, cell) with cell = argmax
    cosine(v, centroid), tiebreak lowest cell id. Centroids come from the
    trained quantizer (:func:`_train_centroids_np` — driver-side Lloyd over
    a capped sample; pass ``_trained`` to reuse an already-trained set).
    ``cells_only=True`` returns just (vec_id, cell) and skips shipping the
    int64 vector arrays back across the Arrow boundary (the struct<array>
    column was most of the kernel's per-row cost; the cells query never
    reads it).

    Plan shape: the (tiny, deterministic) centroid matrix is broadcast into
    ONE fused Arrow kernel — quantize, norm and argmax-cosine assignment in
    a single numpy pass per batch. r5 chained a quantize kernel into an
    assign kernel (two Python boundary crossings per pass), and the
    ``norm2 > 0`` filter pushdown cloned them below the filter (6
    ArrowEvalPython nodes executed for one logical pass — guide §4.4); the
    fused kernel is non-deterministic so the optimizer may not duplicate
    it. argmax takes the FIRST maximum and centroid rows are ordered by
    cell id, so the tiebreak is identical; cosine doubles are the same
    IEEE ops as the expression form (oracle-pinned). Zero-norm rows are
    assigned a placeholder inside the kernel and dropped by the norm2
    filter, exactly like the former with_quantized chain."""
    trained = _trained if _trained is not None else _train_centroids(
        emb, n_cells, vec_col
    )
    if trained is None:
        q = with_quantized(emb, vec_col)
        out = q.withColumn("cell", F.lit(None).cast("long"))
        return out.select("vec_id", "cell") if cells_only else out
    c_ids, CM, c_norms = trained
    bc = emb.sparkSession.sparkContext.broadcast((c_ids, CM, c_norms))
    fields = "norm2 long, cell long" if cells_only else (
        "qv array<long>, norm2 long, cell long"
    )

    @pandas_udf(fields)
    def assign(e: pd.Series) -> pd.DataFrame:
        cc_ids, CCM, cc_norms = bc.value
        if len(e) == 0:
            cols = {"norm2": pd.Series([], dtype="int64"),
                    "cell": pd.Series([], dtype="int64")}
            if not cells_only:
                cols = {"qv": pd.Series([], dtype=object), **cols}
            return pd.DataFrame(cols)
        Q = _quantize_np(e.to_numpy())
        n2 = (Q * Q).sum(axis=1)
        D = Q @ CCM.T  # exact int64
        with np.errstate(divide="ignore", invalid="ignore"):
            cos = D / np.sqrt((n2[:, None] * cc_norms[None, :]).astype(np.float64))
        # zero-norm rows have NaN cosine everywhere; give them cell 0 — the
        # norm2 > 0 filter drops them before anything reads the value
        cell = cc_ids[np.argmax(np.nan_to_num(cos, nan=-np.inf), axis=1)]
        cell = np.where(n2 > 0, cell, 0)
        cols = {"norm2": n2, "cell": cell}
        if not cells_only:
            cols = {"qv": list(Q), **cols}
        return pd.DataFrame(cols)

    kernel = assign.asNondeterministic()
    out = emb.filter(F.col(vec_col).isNotNull()).select(
        "vec_id", kernel(F.col(vec_col)).alias("_a")
    ).filter(F.col("_a.norm2") > 0)
    if cells_only:
        return out.select("vec_id", F.col("_a.cell").alias("cell"))
    return out.select(
        "vec_id",
        F.col("_a.qv").alias("qv"),
        F.col("_a.norm2").alias("norm2"),
        F.col("_a.cell").alias("cell"),
    )


def ann_ivf(
    emb: DataFrame,
    n_queries: int = 10,
    k: int = 5,
    n_cells: int = N_IVF_CELLS,
    n_probes: int = N_IVF_PROBES,
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate cosine top-k — the recall-strong ANN scale path.

    Each query exhaustively scores only the vectors assigned to its
    ``n_probes`` nearest cells (expected n_probes/n_cells of the corpus).
    Measured on the sf0.001 fixture: recall@5 = 0.90 scanning ~12% of the
    corpus (n_cells=64, n_probes=8, trained centroids; 0.88 with the r1-r4
    untrained first-64 seeds) — versus 0.10 for 8-plane SRP-LSH with
    Hamming-1 multiprobe at 3.5% scanned: hyperplane LSH collapses when true
    neighbors sit at moderate cosine (this fixture's top-5 live at
    0.27-0.39), while IVF cells follow the data's own geometry. Same output
    shape as :func:`ann_brute_force`.

    Execution (r6): MAP-SIDE, one fused Arrow kernel. Queries are collected
    once (tiny pushed-down scan) and probe cells ranked driver-side with
    the identical (cosine desc, cell asc) order the former window used
    (np.lexsort on exact doubles); the kernel gets (query matrix, per-query
    probe-cell masks, centroid matrix) via broadcast, assigns each corpus
    batch to cells with one matmul-argmax, and scores exactly the rows
    whose cell is probed by each query. The r5 form ran assignment and
    scoring as a broadcast JOIN over a two-kernel quantize chain — 14
    executed ArrowEvalPython nodes (filter-pushdown cloning, guide §4.4)
    plus a probe-ranking window; candidates and scores here are
    row-identical (each vector lives in exactly one cell; probe cells are
    distinct per query)."""
    out_schema = "query_id long, neighbor_id long, dot_q long, cosine double"
    spark = emb.sparkSession
    trained = _train_centroids(emb, n_cells, vec_col)
    if trained is None:
        return _rank_topk(spark.createDataFrame([], out_schema), k)
    c_ids, CM, c_norms = trained
    corpus = emb.filter(F.col(vec_col).isNotNull()).select("vec_id", vec_col)
    qrows = corpus.filter(F.col("vec_id") < n_queries).collect()
    q_ids = np.array([r[0] for r in qrows], dtype=np.int64)
    if len(qrows):
        QM = _quantize_np([np.asarray(r[1], dtype=np.float64) for r in qrows])
        q_norms = (QM * QM).sum(axis=1)
        live = q_norms > 0  # zero-norm query: no cosine direction, no rows
        q_ids, QM, q_norms = q_ids[live], QM[live], q_norms[live]
    if not len(q_ids):
        return _rank_topk(spark.createDataFrame([], out_schema), k)
    # probe selection: per query the n_probes best cells by (cosine desc,
    # cell asc) — np.lexsort reproduces the former row_number window's
    # order on the same exact doubles (centroid norms are > 0 by
    # construction, so no NaN enters the sort)
    qcos = (QM @ CM.T) / np.sqrt(
        np.outer(q_norms, c_norms).astype(np.float64)
    )
    probe_mask = np.zeros((len(q_ids), len(c_ids)), dtype=bool)
    for qi in range(len(q_ids)):
        top = np.lexsort((c_ids, -qcos[qi]))[:n_probes]
        probe_mask[qi, top] = True
    bc = spark.sparkContext.broadcast((q_ids, QM, q_norms, probe_mask, CM, c_norms))

    def score(batches):
        b_qids, b_QM, b_qnorms, b_mask, b_CM, b_cnorms = bc.value
        for b in batches:
            if len(b) == 0:
                continue
            ids = b["vec_id"].to_numpy().astype(np.int64)
            C = _quantize_np(b[vec_col].to_numpy())
            n2 = (C * C).sum(axis=1)
            Dc = C @ b_CM.T  # exact int64, (batch, n_cells)
            with np.errstate(divide="ignore", invalid="ignore"):
                ccos = Dc / np.sqrt(
                    (n2[:, None] * b_cnorms[None, :]).astype(np.float64)
                )
            cell = np.argmax(np.nan_to_num(ccos, nan=-np.inf), axis=1)
            D = b_QM @ C.T  # exact int64, (n_queries, batch)
            with np.errstate(divide="ignore", invalid="ignore"):
                cos = D / np.sqrt(
                    (b_qnorms[:, None] * n2[None, :]).astype(np.float64)
                )
            for qi in range(len(b_qids)):
                m = (n2 > 0) & b_mask[qi][cell] & (ids != b_qids[qi])
                sel = np.nonzero(m)[0]
                if len(sel):
                    yield pd.DataFrame(
                        {
                            "query_id": b_qids[qi],
                            "neighbor_id": ids[sel],
                            "dot_q": D[qi, sel],
                            "cosine": cos[qi, sel],
                        }
                    )

    return _rank_topk(corpus.mapInPandas(score, schema=out_schema), k)


#: Max corpus rows for which the quantized vector table rides a broadcast
#: into the pair-scoring joins (~536 B/row -> ~110 MB at the cap). Below it
#: the 10^6-row candidate-pair stream is never shuffled for the attach; above
#: it the joins fall back to shuffle joins (the vector table no longer fits
#: every executor). The caller knows the corpus count (cached) — Catalyst
#: cannot, because the quantize kernel hides the size estimate.
SCORE_BROADCAST_MAX_ROWS = 200_000


def _score_pairs(
    pairs: DataFrame, q: DataFrame, threshold: float,
    broadcast_vectors: bool = False,
) -> DataFrame:
    """(vec_a, vec_b) id pairs → exact scored pairs >= threshold.

    Shape: two hash-equi joins attach the quantized vectors by id, the dot
    product runs as ONE Arrow-batched numpy kernel (:func:`_dot64_arrow`),
    and cosine is a single codegen division of exact ints. Keeping the pair
    GENERATION id-only and scoring after the joins matters twice at scale:
    the pair stream stays narrow (16 bytes/pair, not 1 KB of arrays), and
    the cosine filter cannot be folded back into a join condition (filters
    do not cross the Python eval node), where Catalyst would evaluate the
    64-term expression interpreted per candidate."""
    qa = q.select(
        F.col("vec_id").alias("vec_a"), F.col("qv").alias("qa"), F.col("norm2").alias("na")
    )
    qb = q.select(
        F.col("vec_id").alias("vec_b"), F.col("qv").alias("qb"), F.col("norm2").alias("nb")
    )
    if broadcast_vectors:
        qa, qb = F.broadcast(qa), F.broadcast(qb)
    attached = pairs.join(qa, "vec_a").join(qb, "vec_b")
    scored = attached.select(
        "vec_a",
        "vec_b",
        _dot64_arrow(F.col("qa"), F.col("qb")).alias("dot_q"),
        "na",
        "nb",
    )
    return scored.select(
        "vec_a",
        "vec_b",
        "dot_q",
        cosine_from_ints(F.col("dot_q"), F.col("na"), F.col("nb")).alias("cosine"),
    ).filter(F.col("cosine") >= threshold)


MAX_VERIFIER_ROWS = 20_000


def near_dup_pairs(
    emb: DataFrame,
    threshold: float = 0.45,
    vec_col: str = "embedding",
    max_rows: int | None = MAX_VERIFIER_ROWS,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (vec_a < vec_b, cosine >=
    threshold). Exact all-pairs form — O(N²) candidate pairs, the
    small-scale VERIFIER only; the shipped scale path is
    :func:`near_dup_pairs_lsh` (bucket-equi candidates). Even here the
    nested loop touches only the two id columns; vectors attach by id
    afterwards (:func:`_score_pairs`).

    ``max_rows`` guards the registry entry at arbitrary sf: above it the
    corpus is deterministically subsampled (``vec_id % ceil(n/max_rows) ==
    0``) before pair generation, so the verifier stays O(max_rows²) instead
    of O(N²) — it verifies the LSH path on a reproducible sample rather than
    never finishing. Pass ``max_rows=None`` for the unguarded exact form.
    The DuckDB oracle applies the identical modulus.

    Execution: broadcast block-matmul. The (sample-capped) quantized matrix
    is broadcast once (cap 20k × 64 int64 = 10 MB); each partition scores
    its OWN rows against the whole matrix with one numpy int64 matmul and
    emits only the above-threshold pairs. O(N²) multiply-adds but no O(N²)
    shuffle, no per-pair rows in the plan, ~100x less Arrow traffic than
    the id-crossjoin + per-pair kernel it replaces (measured 7.2s → see
    BENCH). The math is bit-identical to the SQL oracle: exact int64 dot,
    exact int64 norm product, one IEEE-double sqrt + divide."""
    import pandas as pd

    PAIR_SCHEMA = "vec_a long, vec_b long, dot_q long, cosine double"
    spark = emb.sparkSession
    if max_rows:
        n = corpus_count(emb)
        if n > max_rows:
            m = -(-n // max_rows)  # ceil
            emb = emb.filter(F.col("vec_id") % m == 0)
    # ONE collect + driver quantize builds the broadcast matrix
    # (_collect_quantized); the distributed side then carries ONLY vec_id —
    # each task re-derives its rows' vectors from the broadcast by binary
    # search instead of shipping a second quantize-kernel pass through the
    # plan (r5 ran the Arrow quantize stage twice per query: once under
    # toPandas, once under the scoring job — guide §4.1, fewer boundary
    # crossings; §2.3, shuffle keys instead of payloads).
    ids_all, M_all, norms_all = _collect_quantized(emb, vec_col)
    if len(ids_all) == 0:
        # an empty corpus has no pairs (the pre-matmul join form returned
        # an empty DataFrame here too)
        return spark.createDataFrame([], PAIR_SCHEMA)
    bc = spark.sparkContext.broadcast((ids_all, M_all, norms_all))
    thr = float(threshold)
    # Spread the row side across the cluster: the corpus usually arrives as
    # ONE parquet file -> one partition, which would run the whole O(N²)
    # matmul on a single core (measured: the entire sf1 verifier cost was
    # one task). ~512 rows per task gives every core a block while keeping
    # tasks coarse enough to amortize the Python worker round-trip; the
    # shuffle moved is only the 8-byte ids (the vectors ride the broadcast).
    par = spark.sparkContext.defaultParallelism
    side = emb.select("vec_id").repartition(
        max(1, min(par, -(-len(ids_all) // 512)))
    )

    def score(batches):
        b_ids, B, b_norms = bc.value
        # The N×64 @ 64×N matmul in float64, NOT int64: numpy routes int64
        # matmul through a naive non-BLAS loop (measured 104s for the full
        # 20k×20k block at sf1 vs ~2s via BLAS). The result is still the
        # EXACT integer dot — every product and partial sum of quantized
        # coordinates stays far below 2^53, where float64 arithmetic on
        # integers is exact — guarded loudly: 64 * qmax² < 2^53.
        Bf = B.astype(np.float64)
        # Chunk the broadcast side: a full Arrow batch against all 20k
        # corpus rows is a 10000×20000 float64 score matrix (1.6 GB) plus
        # an equal-size norm-product and mask — 32 concurrent workers at
        # that peak thrash the allocator (the measured 100s+ at sf1 was
        # allocation/memory traffic, not multiply-adds). 2048-column
        # chunks bound peak per-worker scratch to ~50 MB at any corpus
        # size with BLAS still saturated.
        B_CHUNK = 2048
        for batch in batches:
            if len(batch) == 0:
                continue
            raw_ids = batch["vec_id"].to_numpy().astype(np.int64)
            # rows not in the broadcast (null embedding, zero norm, or the
            # id simply absent) are masked out — identical to the former
            # with_quantized drop
            pos = np.searchsorted(b_ids, raw_ids).clip(0, len(b_ids) - 1)
            found = b_ids[pos] == raw_ids
            a_ids = raw_ids[found]
            if not len(a_ids):
                continue
            idx = pos[found]
            a_norms = b_norms[idx]
            # exactness of the float64 dot is guaranteed by _quantize_np's
            # magnitude guard (dim*q² <= 2^31 << 2^53) — every row of the
            # broadcast matrix has passed through it
            Af = Bf[idx]
            out_a, out_b, out_d, out_c = [], [], [], []
            for lo in range(0, len(b_ids), B_CHUNK):
                hi = lo + B_CHUNK
                D = np.rint(Af @ Bf[lo:hi].T).astype(np.int64)  # exact
                # ONE sqrt of the int64 norm PRODUCT (not sqrt*sqrt):
                # bit-identical to the SQL oracle's sqrt((na*nb)::DOUBLE)
                cos = D / np.sqrt(
                    (a_norms[:, None] * b_norms[None, lo:hi]).astype(np.float64)
                )
                mask = (cos >= thr) & (a_ids[:, None] < b_ids[None, lo:hi])
                ai, bj = np.nonzero(mask)
                if len(ai):
                    out_a.append(a_ids[ai])
                    out_b.append(b_ids[lo:hi][bj])
                    out_d.append(D[ai, bj])
                    out_c.append(cos[ai, bj])
            if out_a:
                yield pd.DataFrame(
                    {
                        "vec_a": np.concatenate(out_a),
                        "vec_b": np.concatenate(out_b),
                        "dot_q": np.concatenate(out_d),
                        "cosine": np.concatenate(out_c),
                    }
                )

    return side.mapInPandas(score, schema=PAIR_SCHEMA)


N_NEARDUP_BANDS = 4
NEARDUP_ROWS_PER_BAND = 4
#: Fixed plane stride between bands: band b owns planes
#: [b*NEARDUP_R_MAX, b*NEARDUP_R_MAX + rows_per_band). Because the stride —
#: not the adaptive width — fixes plane assignment, an r-bit bucket is the
#: low-r-bit truncation of the 16-bit code, and the static SQL oracle can
#: mirror any adaptive width with ``full_code % (1 << r)``.
NEARDUP_R_MAX = 16
#: Target mean LSH bucket load the adaptive width maintains. 128 keeps the
#: in-bucket pair expansion ~128²/2 per bucket and every realistic bucket
#: far below the MAX_GROUP_SIZE=512 degenerate-bucket cap.
NEARDUP_TARGET_BUCKET = 128


def adaptive_rows_per_band(n_rows: int) -> int:
    """Bucket-width staircase for the banded near-dup path: the smallest
    r in {4, 8, 12, 16} such that n_rows / 2^r <= NEARDUP_TARGET_BUCKET
    (i.e. expected bucket load stays bounded as the corpus grows — a FIXED
    width is the thing sf1 falsified: at 10× the data every 4-bit bucket
    blew the 512 cap and the capped plan returned zero pairs). Integer
    comparisons only, so the SQL oracle reproduces it exactly (no
    float-log2 edge cases). The recall trade (wider buckets collide fewer
    true pairs per band) is the documented SRP-LSH cost of corpus growth;
    production can raise ``n_bands`` to buy recall back — the knob is
    already a parameter of :func:`banded_buckets`."""
    for r in (4, 8, 12):
        if n_rows <= NEARDUP_TARGET_BUCKET << r:
            return r
    return 16


def banded_buckets(
    emb: DataFrame,
    vec_col: str = "embedding",
    n_bands: int = N_NEARDUP_BANDS,
    rows_per_band: int | None = None,
) -> DataFrame:
    """Multi-table SRP-LSH: ``n_bands`` independent ``rows_per_band``-bit
    hyperplane signatures per vector (plane stride :data:`NEARDUP_R_MAX`).
    Output: (vec_id, qv, norm2, band, bucket) — one row per band.
    ``rows_per_band=None`` (the default) adapts the width to the corpus
    size via :func:`adaptive_rows_per_band` — one count() job at plan
    time (a column-pruned scan; the same eager-parameter pattern as the
    verifier's cap, and the price of bucket load that stays bounded at
    any corpus size).

    Why banding instead of one wide signature: a single 8-plane bucket
    collides a cosine-0.45 pair with p = (1-θ/π)^8 ≈ 0.03 (useless recall);
    with 4 bands of 4 planes a pair is a candidate if ANY band agrees —
    p = 1-(1-(1-θ/π)^4)^4 ≈ 0.54 at cosine 0.45 and ≈ 0.96 at cosine 0.9,
    while a random pair (cosine 0) still collides in only ~4/16 of buckets'
    worth of pairs (1-(1-1/16)^4 ≈ 0.23 of a 2^4-bucket table per band).
    Same banding trade as MinHash-LSH (operators/dedup.py)."""
    if rows_per_band is None:
        rows_per_band = adaptive_rows_per_band(corpus_count(emb))
    q = with_quantized(emb, vec_col)
    codes = _srp_codes_udf(n_bands, rows_per_band, stride=NEARDUP_R_MAX)
    return q.select(
        "vec_id",
        "qv",
        "norm2",
        F.posexplode(codes(F.col("qv"))).alias("band", "bucket"),
    )


def near_dup_pairs_lsh(
    emb: DataFrame,
    threshold: float = 0.45,
    vec_col: str = "embedding",
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs at corpus scale: candidate
    pairs come from banded-LSH bucket collisions (grouped in-bucket pair
    expansion — the same candidate-linear shape as MinHash-LSH dedup, never
    all-pairs, no nested-loop join), deduplicated across bands by the pair
    groupBy, then scored exactly (:func:`_score_pairs` — numpy Arrow kernel
    + codegen cosine). Precision is 1 (every emitted score is bit-identical
    to the all-pairs verifier); recall per :func:`banded_buckets`.

    ``max_bucket_size`` (default: operators.dedup.MAX_GROUP_SIZE) caps a
    degenerate bucket — a mass-duplicated embedding — exactly like the
    dedup caps; audit drops with ``oversize_groups``."""
    from airbyte_module_spark.operators.dedup import MAX_GROUP_SIZE, _expand_pairs

    if max_bucket_size is None:
        max_bucket_size = MAX_GROUP_SIZE
    spark = emb.sparkSession
    n_corpus = corpus_count(emb)  # memoized per corpus
    if n_corpus <= SCORE_BROADCAST_MAX_ROWS:
        # Small-corpus fast path: ONE collect builds the quantized matrix
        # AND the banded SRP codes driver-side (identical numpy math to the
        # kernel — _srp_codes_np); the (doc_id, band, bucket) rows re-enter
        # the plan through an Arrow createDataFrame, group into buckets,
        # and candidates are scored inside one Arrow kernel over the bucket
        # tails against the broadcast matrix. The r5 shape re-ran the
        # quantize+codes kernel chain per consuming job (toPandas + final
        # collect) with filter-pushdown cloning on top — 18 executed
        # ArrowEvalPython corpus passes for one query (guide §4.4); now the
        # corpus crosses the Python boundary once in the driver collect and
        # once in the scoring kernel, and the only per-pair bytes that move
        # are the two ids inside tail arrays. Duplicate cross-band
        # candidates are scored (identical rows — exact math) and collapsed
        # by one distinct over the tiny thresholded output, as before.
        ids, M, norms = _collect_quantized(emb, vec_col)
        if len(ids) == 0:
            return spark.createDataFrame(
                [], "vec_a long, vec_b long, dot_q long, cosine double"
            )
        r = adaptive_rows_per_band(n_corpus)
        codes = _srp_codes_np(M, N_NEARDUP_BANDS, r, stride=NEARDUP_R_MAX)
        bdf = spark.createDataFrame(
            pd.DataFrame(
                {
                    "doc_id": np.repeat(ids, N_NEARDUP_BANDS),
                    "band": np.tile(
                        np.arange(N_NEARDUP_BANDS, dtype=np.int64), len(ids)
                    ),
                    "bucket": codes.reshape(-1),
                }
            )
        )
        bc = spark.sparkContext.broadcast((ids, M, norms))
        thr = float(threshold)
        cap = max_bucket_size

        def score(batches):
            # Group, cap, pair-expand AND score inside the kernel: the
            # repartition below co-locates each (band, bucket) group in one
            # partition, so an in-task lexsort reproduces the former
            # groupBy(collect_list) + posexplode/slice pair expansion
            # exactly — ascending doc ids per bucket, every a < b pair of a
            # surviving (1 < size <= cap) bucket once per band. Moving
            # those stages out of Catalyst is a COMPILE-cost fix, not a
            # row-cost fix: the ObjectHashAggregate + two Generate stages
            # were several whole-stage-codegen units that this sandbox's
            # throttled JIT recompiles at seconds apiece whenever a
            # neighboring heavy query evicts them (measured: the same
            # query steady at ~2s ran 7.7s inside the full bench, every
            # trial paying compilation; the kernel plan is one exchange +
            # MapInPandas).
            b_ids, B, b_norms = bc.value
            for batch in batches:
                if len(batch) == 0:
                    continue
                doc = batch["doc_id"].to_numpy().astype(np.int64)
                band = batch["band"].to_numpy().astype(np.int64)
                buck = batch["bucket"].to_numpy().astype(np.int64)
                order = np.lexsort((doc, buck, band))
                doc, band, buck = doc[order], band[order], buck[order]
                new = np.empty(len(doc), dtype=bool)
                new[0] = True
                np.logical_or(
                    band[1:] != band[:-1], buck[1:] != buck[:-1], out=new[1:]
                )
                starts = np.flatnonzero(new)
                sizes = np.diff(np.append(starts, len(doc)))
                a_parts, b_parts = [], []
                for s, size in zip(starts, sizes):
                    if size < 2 or (cap is not None and size > cap):
                        continue
                    members = doc[s : s + size]
                    ii, jj = np.triu_indices(size, k=1)
                    a_parts.append(members[ii])
                    b_parts.append(members[jj])
                if not a_parts:
                    continue
                a = np.concatenate(a_parts)
                b = np.concatenate(b_parts)
                ai = np.searchsorted(b_ids, a)
                bi = np.searchsorted(b_ids, b)
                # row-wise exact int64 dot — identical math to _dot64_arrow
                D = (B[ai] * B[bi]).sum(axis=1)
                cos = D / np.sqrt(
                    (b_norms[ai] * b_norms[bi]).astype(np.float64)
                )
                keep = cos >= thr
                if keep.any():
                    yield pd.DataFrame(
                        {
                            "vec_a": a[keep],
                            "vec_b": b[keep],
                            "dot_q": D[keep],
                            "cosine": cos[keep],
                        }
                    )

        # hash-partition by (band, bucket) so each bucket group is whole
        # within one task; what moves is the 24-byte bucket rows, and the
        # kernel stage runs at cluster parallelism
        par = emb.sparkSession.sparkContext.defaultParallelism
        scored = bdf.repartition(par, "band", "bucket").mapInPandas(
            score, schema="vec_a long, vec_b long, dot_q long, cosine double"
        )
        # cross-band duplicates carry bit-identical scores; one distinct
        # over the post-threshold stream (tiny) replaces the r5 pre-score
        # pair dedup exchange over every candidate
        return scored.distinct()
    # Big-corpus path: the quantized vector table no longer fits every
    # executor — candidates come from the distributed banded-bucket groupBy
    # and vectors attach by id through shuffle joins (r5 shape, unchanged).
    qb = banded_buckets(emb, vec_col).select(
        F.col("vec_id").alias("doc_id"), "band", "bucket"
    )
    grouped = (
        qb.groupBy("band", "bucket")
        .agg(F.array_sort(F.collect_list("doc_id")).alias("docs"))
        .filter(F.size("docs") > 1)
    )
    pairs = _expand_pairs(grouped, max_bucket_size).select(
        F.col("doc_a").alias("vec_a"), F.col("doc_b").alias("vec_b")
    )
    return _score_pairs(pairs, with_quantized(emb, vec_col), threshold)
