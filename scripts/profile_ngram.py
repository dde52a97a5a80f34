"""Stage-by-stage profile of dedup_ngram_jaccard (VERDICT r4 #2: 2.7 -> 3.1s
drift chase). Times cumulative prefixes of the pipeline at sf0.1, repeated to
steady state (sandbox JIT throttle: first executions of a heavy plan measure
HotSpot compilation, not the engine).

Run:  python scripts/profile_ngram.py [sf_dir] [reps]
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from airbyte_module_spark import get_spark
from airbyte_module_spark.operators.dedup import (
    MAX_GROUP_SIZE,
    _expand_pairs,
    ngram_jaccard_pairs,
    shingle_postings,
)
from airbyte_module_spark.operators.text import word_shingles

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4

spark = get_spark(master="local[32]", shuffle_partitions=32)
docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
n = 3


def timeit(label, df_fn):
    best = None
    for _ in range(reps):
        t = time.time()
        df_fn().count()
        dt = time.time() - t
        best = dt if best is None else min(best, dt)
    print(f"{label:50s} best {best:6.3f}s")
    return best


# A: scan + tokenize + shingle + explode
def stage_a():
    sh = docs.filter(F.length("text") > 0).select(
        "doc_id", word_shingles(F.col("text"), n=n).alias("sh")
    )
    return sh.select("doc_id", F.explode("sh").alias("s"))


# B: + postings groupBy(shingle) collect_list
def stage_b():
    return shingle_postings(docs, "text", n)


# C: + pair expansion (flatten/transform + groupBy pair)
def stage_c():
    return _expand_pairs(shingle_postings(docs, "text", n), MAX_GROUP_SIZE)


# D: full query
def stage_d():
    return ngram_jaccard_pairs(docs, "text", n=n, threshold=0.15)


# sizes branch alone (second shingle computation)
def stage_sizes():
    sh = docs.filter(F.length("text") > 0).select(
        "doc_id", word_shingles(F.col("text"), n=n).alias("sh")
    )
    return sh.select("doc_id", F.size("sh").alias("n_sh")).filter(F.col("n_sh") > 0)


a = timeit("A scan+shingle+explode", stage_a)
b = timeit("B +postings groupBy/collect_list", stage_b)
c = timeit("C +pair expansion", stage_c)
d = timeit("D full query (joins+threshold)", stage_d)
s = timeit("sizes branch alone (2nd shingle pass)", stage_sizes)
print(f"\ndeltas: postings={b-a:.3f}s  expand={c-b:.3f}s  joins+sizes={d-c:.3f}s")
print(f"explode rows: {stage_a().count()}, postings rows: {stage_b().count()}")
spark.stop()
