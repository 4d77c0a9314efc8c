"""Approximate-nearest-neighbor search over an embedding column
(engine additions — "similarity search" per the task brief).

- ``brute_force_topk``: exact cosine top-k — the baseline; one scan, no
  shuffle except the final top-k (a TakeOrdered, driver gets k rows only).
- ``lsh_topk``: sign-LSH bucketed variant — the scale path: buckets
  pre-partition the corpus so a query probes ~1/2^P of it.
- ``ivf_assign``/``ivf_topk``: IVF inverted file — nearest-centroid cell
  assignment (deterministic seeded centroids; swap in k-means-trained ones
  at scale, the assignment expression is unchanged) with ``nprobe``-cell
  query pruning.
"""
from __future__ import annotations

from typing import List, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.similarity import cosine, hyperplanes, ivf_cell, lsh_bucket


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


def ivf_assign(
    df: DataFrame,
    n_cells: int = 8,
    dim: int = 64,
    seed: int = 7,
    vec_col: str = 'embedding',
) -> DataFrame:
    """Assign every vector to its IVF cell (nearest deterministic centroid).
    At scale the assigned table is written partitioned by ``cell`` — the
    inverted file; queries then prune to nprobe partitions at the scan."""
    centroids = hyperplanes(n_cells, dim, seed)
    return df.withColumn('cell', ivf_cell(F.col(vec_col), centroids))


def _query_cells(query_vec: List[float], centroids, nprobe: int) -> List[int]:
    scored = sorted(
        (
            (round(sum(float(a) * float(b) for a, b in zip(query_vec, c)), 6), -i)
            for i, c in enumerate(centroids)
        ),
        reverse=True,
    )
    return [-neg_i for _, neg_i in scored[:nprobe]]


def ivf_topk(
    df: DataFrame,
    query_vec: List[float],
    k: int = 10,
    n_cells: int = 8,
    nprobe: int = 2,
    seed: int = 7,
    id_col: str = 'vec_id',
    vec_col: str = 'embedding',
) -> DataFrame:
    """Top-k within the query's ``nprobe`` nearest IVF cells: driver picks
    the probe cells against the same centroid constants, the scan reads only
    those cells (partition-pruned when the inverted file is materialized)."""
    centroids = hyperplanes(n_cells, len(query_vec), seed)
    probes = _query_cells(query_vec, centroids, nprobe)
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    assigned = df.withColumn('cell', ivf_cell(F.col(vec_col), centroids))
    return (
        assigned.filter(F.col('cell').isin(probes))
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
