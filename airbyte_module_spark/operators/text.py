"""Text-analysis expression library: tokenization, shingling, hashing,
document fingerprinting.

All operators here are pure Catalyst expressions (JVM-side, whole-stage
codegen'd — no Python in the hot path, per BASELINE.json input_hint "no
per-row Python"). They are building blocks for the training-data pipeline
operators in :mod:`operators.dedup` and the oracle-checked queries.

Cross-engine determinism contract (the driver hash-compares every query
against a DuckDB oracle): the only hash primitive is sha256, folded to a
60-bit integer via the first 15 hex chars — identical bit-for-bit in Spark
(``conv(substring(sha2(s,256),1,15),16,10)``) and DuckDB
(``('0x' || substr(sha256(s),1,15))::BIGINT``). Never xxhash64/murmur (engine
-specific).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Modulus / base for the polynomial rolling hash (doc fingerprint).
FP_MOD = 2_147_483_647  # 2^31 - 1 (Mersenne prime)
FP_BASE = 131


def hash64(col: Column) -> Column:
    """60-bit deterministic hash: first 15 hex chars of sha256, as bigint.
    Cross-engine stable (see module docstring)."""
    return F.conv(F.substring(F.sha2(col, 256), 1, 15), 16, 10).cast("long")


def tokens(col: Column) -> Column:
    """Whitespace tokenization of trimmed text."""
    return F.split(F.trim(col), r"\s+")


def word_shingles(col: Column, n: int = 3, distinct: bool = True) -> Column:
    """Word n-gram shingles as an array<string> (space-joined). Empty array
    for texts with fewer than ``n`` tokens. Output matches the DuckDB
    oracle's ``range`` + list-indexing construction value-for-value.

    Construction: zip_with over ``n`` shifted slices of the token array —
    NOT ``transform(sequence(1, m), i -> concat(toks[i], ...))``. The
    distinction is the hot-path lesson of this module: higher-order lambdas
    are interpreted in Spark 4, and any subexpression written INSIDE the
    lambda is re-evaluated per element — the transform/element_at form
    re-ran the whole regex tokenization 3x per shingle (~150 splits per
    document; measured 4 ms/doc, 20 s for a 5,000-doc explode). With
    slices, tokenization is evaluated a constant number of times per ROW
    and the per-element lambda is a single string concat (measured ~60x
    faster end-to-end on the same explode)."""
    toks = tokens(col)
    m = F.greatest(F.size(toks) - (n - 1), F.lit(0))
    parts = [F.slice(toks, k + 1, m) for k in range(n)]
    grams = parts[0]
    for k in range(1, n):
        grams = F.zip_with(grams, parts[k], lambda a, b: F.concat(a, F.lit(" "), b))
    return F.array_distinct(grams) if distinct else grams


def rolling_fingerprint(col: Column) -> Column:
    """Polynomial rolling-hash document fingerprint over the token stream:

        acc_0 = 0;  acc_i = (acc_{i-1} * 131 + h(tok_i)) mod (2^31 - 1)

    with h = :func:`hash64` mod the same prime. Order-sensitive (unlike a
    bag-of-tokens hash) — two documents with the same tokens in different
    order fingerprint differently — and incremental, which is what makes the
    rolling form the standard primitive for content-defined chunking. All
    intermediates < 2^39, no bigint overflow. DuckDB mirror: ``list_reduce``
    with a prepended 0 as the fold seed.
    """
    hashes = F.transform(tokens(col), lambda t: hash64(t) % FP_MOD)
    return F.aggregate(
        hashes,
        F.lit(0).cast("long"),
        lambda acc, h: (acc * FP_BASE + h) % FP_MOD,
    )
