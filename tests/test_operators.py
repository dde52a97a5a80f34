"""Training-data operator tests: dedup family, similarity search, text
fingerprinting, multimodal plumbing (SURVEY.md §2 extensions).

Cross-engine value equality for every oracle-checkable operator is enforced
by scripts/check_oracles.py (and the driver per round); these tests cover
the *semantic* properties instead: recall of LSH vs exact methods, order
sensitivity, mapInPandas batch mechanics.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


# ------------------------------------------------------------- fingerprint
def test_rolling_fingerprint_order_sensitive(spark):
    from airbyte_module_spark.operators.text import rolling_fingerprint

    df = spark.createDataFrame(
        [("a b c",), ("c b a",), ("a b c",)], ["text"]
    ).select(rolling_fingerprint(F.col("text")).alias("fp"))
    fps = [r["fp"] for r in df.collect()]
    assert fps[0] == fps[2], "same text must fingerprint identically"
    assert fps[0] != fps[1], "token order must matter (rolling, not bag)"


def test_shingles_short_text(spark):
    from airbyte_module_spark.operators.text import word_shingles

    df = spark.createDataFrame([("one two",), ("",), ("a b c d",)], ["text"])
    out = df.select(word_shingles(F.col("text"), n=3).alias("s")).collect()
    assert out[0]["s"] == []  # fewer than n tokens
    assert out[1]["s"] == []
    assert out[2]["s"] == ["a b c", "b c d"]


# ------------------------------------------------------------------- dedup
def test_minhash_lsh_finds_true_near_dups(docs):
    """Every pair with exact 3-gram jaccard >= 0.8 must be produced as an
    LSH candidate (banding catches >=0.8 similarity with p ~ 1 at 4x4)."""
    from airbyte_module_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_bands,
        ngram_jaccard_pairs,
        with_minhash,
    )

    true_pairs = {
        (r["doc_a"], r["doc_b"])
        for r in ngram_jaccard_pairs(docs, n=3, threshold=0.8).collect()
    }
    assert true_pairs, "fixture should contain near-duplicate documents"
    cand = {
        (r["doc_a"], r["doc_b"])
        for r in lsh_candidate_pairs(minhash_bands(with_minhash(docs))).collect()
    }
    missed = true_pairs - cand
    assert not missed, f"LSH missed high-similarity pairs: {missed}"


def test_minhash_signature_estimates_jaccard(docs):
    """Signature agreement fraction approximates true jaccard for a known
    near-dup pair (within the +-1/sqrt(16) resolution of 16 hashes)."""
    from airbyte_module_spark.operators.dedup import (
        N_MINHASHES,
        ngram_jaccard_pairs,
        with_minhash,
    )

    top = (
        ngram_jaccard_pairs(docs, n=3, threshold=0.8)
        .orderBy(F.desc("jaccard"))
        .first()
    )
    sig = with_minhash(docs).filter(
        F.col("doc_id").isin(int(top["doc_a"]), int(top["doc_b"]))
    )
    rows = {r["doc_id"]: [r[f"m{j}"] for j in range(N_MINHASHES)] for r in sig.collect()}
    a, b = rows[top["doc_a"]], rows[top["doc_b"]]
    agree = sum(x == y for x, y in zip(a, b)) / N_MINHASHES
    assert abs(agree - top["jaccard"]) <= 0.3


def test_simhash_near_dups_close(docs):
    from airbyte_module_spark.operators.dedup import (
        ngram_jaccard_pairs,
        simhash32,
    )

    top = (
        ngram_jaccard_pairs(docs, n=3, threshold=0.8)
        .orderBy(F.desc("jaccard"))
        .first()
    )
    fp = {r["doc_id"]: r["simhash"] for r in simhash32(docs).collect()}

    def hamming(x, y):
        return bin(x ^ y).count("1")

    near = hamming(fp[top["doc_a"]], fp[top["doc_b"]])
    ids = sorted(fp)
    far = [hamming(fp[ids[i]], fp[ids[i + 1]]) for i in range(0, 40, 2)]
    assert near <= 6, f"near-dup pair hamming {near} too large"
    assert near < sorted(far)[len(far) // 2], "near-dup not closer than median"


# -------------------------------------------------------------- similarity
def test_ann_lsh_subset_of_bruteforce_scores(emb):
    """Every LSH-retrieved neighbor must carry the same dot/cosine the
    brute-force scorer assigns (same scoring, restricted candidate set),
    and per query the LSH neighbors are a subset of the full ranking."""
    from airbyte_module_spark.operators.similarity import (
        ann_brute_force,
        ann_lsh,
    )

    bf = ann_brute_force(emb, n_queries=5, k=500).select(
        "query_id", "neighbor_id", "dot_q"
    )
    lsh = ann_lsh(emb, n_queries=5, k=5).select(
        "query_id", "neighbor_id", F.col("dot_q").alias("dot_lsh")
    )
    joined = lsh.join(bf, ["query_id", "neighbor_id"], "left")
    rows = joined.collect()
    assert rows, "LSH returned nothing"
    for r in rows:
        assert r["dot_q"] is not None, "LSH neighbor missing from brute force"
        assert r["dot_q"] == r["dot_lsh"]


def test_lsh_buckets_group_same_bucket_neighbors(emb):
    from airbyte_module_spark.operators.similarity import ann_lsh, lsh_buckets

    buckets = {r["vec_id"]: r["bucket"] for r in lsh_buckets(emb).collect()}
    for r in ann_lsh(emb, n_queries=5, k=5).collect():
        assert buckets[r["query_id"]] == buckets[r["neighbor_id"]]


# -------------------------------------------------------------- multimodal
def test_multimodal_features_deterministic_and_shaped(docs):
    from airbyte_module_spark.operators.multimodal import (
        extract_features,
        synthesize_blobs,
    )

    blobs = synthesize_blobs(docs)
    feats = extract_features(blobs).orderBy("doc_id")
    pdf = feats.toPandas()
    assert len(pdf) == docs.count()
    assert set(pdf["kind"]) <= {"image", "audio", "video"}
    # histogram bins sum to the byte count, per row
    assert (pdf["histogram8"].map(sum) == pdf["size_bytes"]).all()
    # deterministic across runs
    pdf2 = extract_features(blobs).orderBy("doc_id").toPandas()
    pd.testing.assert_frame_equal(pdf, pdf2)


def test_multimodal_real_decode_gated():
    from airbyte_module_spark.operators.multimodal import extract_features

    with pytest.raises(NotImplementedError):
        extract_features(None, real_decode=True)


def test_multimodal_plan_is_arrow_batched(docs):
    """The featurizer must run as a single Arrow-batched python stage
    (MapInPandas), not row-at-a-time python."""
    from airbyte_module_spark.operators.multimodal import (
        extract_features,
        synthesize_blobs,
    )

    plan = extract_features(synthesize_blobs(docs))._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan
    assert "BatchEvalPython" not in plan
