"""Similarity search over embedding columns (array<float>).

- brute_force_topk: exact cosine top-k of query vectors against the
  corpus. The query side is broadcast (queries are small); the dot
  product is a JVM-side ``aggregate``/``zip_with`` fold — no Python.
  One shuffle for the per-query top-k window.
- lsh_bucketed_topk: the scale path — random-hyperplane LSH buckets
  (sign bits of dot products with broadcast random planes) shrink the
  candidate set; exact cosine re-ranks within buckets. Recall trades
  with bucket bits; planes are seeded deterministically.
"""

from __future__ import annotations

import math
import random
from typing import List

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """(query_id, neighbor_id, cos_sim, rank) exact top-k per query.
    ``queries`` must be small (broadcast side)."""
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
        )
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv"))
    scored = (
        c.crossJoin(q)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos_sim", cosine(F.col("_qv"), F.col("_cv")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def _random_planes(dim: int, bits: int, seed: int) -> List[List[float]]:
    rnd = random.Random(seed)
    return [[rnd.gauss(0, 1) for _ in range(dim)] for _ in range(bits)]


def lsh_bucketed_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    bits: int = 8,
    dim: int = 64,
    seed: int = 42,
    probe_bits: int = 0,
) -> DataFrame:
    """Approximate top-k: random-hyperplane signatures bucket the
    corpus; candidates = same-bucket rows (plus single-bit-flip probes
    when probe_bits>0); exact cosine re-ranks."""
    planes = _random_planes(dim, bits, seed)

    def signature(vec):
        sig = F.lit(0)
        for i, plane in enumerate(planes):
            p = F.array(*[F.lit(float(x)) for x in plane])
            sig = sig + F.when(_dot(vec, p) > 0, F.lit(1 << i)).otherwise(F.lit(0))
        return sig

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv")
    ).withColumn("_bucket", signature(F.col("_cv")))
    qbase = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    ).withColumn("_sig", signature(F.col("_qv")))
    # multi-probe: query also visits buckets at hamming distance 1
    probes = [F.col("_sig")] + [
        F.col("_sig").bitwiseXOR(F.lit(1 << i)) for i in range(probe_bits)
    ]
    q = F.broadcast(
        qbase.withColumn("_bucket", F.explode(F.array(*probes))).drop("_sig")
    )
    scored = (
        c.join(q, "_bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos_sim", cosine(F.col("_qv"), F.col("_cv")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )
