"""Train-once / count-once lifecycle for the similarity suite (r6).

The r5 verdict flagged two lifecycle defects: IVF centroids retrained on
every ``ann_ivf``/``ivf_assign`` call (count + collect + driver Lloyd per
query — the measured +48% ann_ivf_cells regression), and each similarity
operator re-running its own eager corpus ``count()`` at plan time. Both
parameters are deterministic pure functions of the corpus, so they are
memoized per corpus identity (plan + input files + mtime/size). These tests
pin the lifecycle: a second identical call must be a cache hit, a different
corpus (or rewritten file) must be a miss.
"""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def sim():
    from airbyte_module_spark.operators import similarity as S

    S._CORPUS_CACHE.clear()
    S.CACHE_MISSES["count"] = 0
    S.CACHE_MISSES["centroids"] = 0
    return S


def _emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def test_second_ivf_call_runs_zero_training(spark, sim):
    first = sim.ann_ivf(_emb(spark), n_queries=5, k=3).collect()
    assert sim.CACHE_MISSES["centroids"] == 1
    # fresh DataFrame over the same corpus: training must be a cache hit
    again = sim.ann_ivf(_emb(spark), n_queries=5, k=3).collect()
    assert sim.CACHE_MISSES["centroids"] == 1, "second call retrained"
    assert sorted(map(tuple, first)) == sorted(map(tuple, again))
    # ivf_assign shares the same artifact
    sim.ivf_assign(_emb(spark)).collect()
    assert sim.CACHE_MISSES["centroids"] == 1


def test_similarity_suite_counts_corpus_once(spark, sim):
    """near_dup verifier cap + adaptive LSH width + IVF training all feed
    from ONE memoized count per corpus."""
    sim.near_dup_pairs(_emb(spark)).collect()
    sim.near_dup_pairs_lsh(_emb(spark)).collect()
    sim.ann_ivf(_emb(spark), n_queries=3, k=2).collect()
    sim.ivf_assign(_emb(spark)).collect()
    assert sim.CACHE_MISSES["count"] == 1, sim.CACHE_MISSES


def test_different_corpus_misses_cache(spark, sim, tmp_path):
    sim.ann_ivf(_emb(spark), n_queries=3, k=2).collect()
    assert sim.CACHE_MISSES["centroids"] == 1
    other = str(tmp_path / "emb2.parquet")
    _emb(spark).filter("vec_id % 2 = 0").write.parquet(other)
    sim.ann_ivf(spark.read.parquet(other), n_queries=3, k=2).collect()
    assert sim.CACHE_MISSES["centroids"] == 2, "new corpus must retrain"


def test_non_file_corpus_is_never_cached(spark, sim):
    rows = [(i, [float(i % 7 - 3)] * 64) for i in range(80)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    sim.ivf_assign(emb).collect()
    sim.ivf_assign(emb).collect()
    assert sim._CORPUS_CACHE == {}
    assert sim.CACHE_MISSES["centroids"] == 2
