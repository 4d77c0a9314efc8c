"""Graph analytics over extracted KG triples (engine additions beyond the
reference — the queries a KG consumer runs once the triples exist: node
importance, degree structure).

Reference parity note: the reference (kiran94/dgraphpandas) emits triples
and stops; these operators consume the (subject, predicate, object) edge
tables the engine extracts (see operators/canonicalize.py for the
construction side).  Architecture mirrors ``dedup.connected_components``:
fixed/driver-bounded iteration over DataFrames, ``localCheckpoint`` per
round to truncate lineage, labels/ranks shuffled — never payloads.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = 'src',
    dst: str = 'dst',
    iters: int = 3,
    damping: float = 0.85,
    ndigits: int = 6,
) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge list.  Returns
    DataFrame[id, pr].

    Deterministic and oracle-replayable by construction: rank vectors are
    rounded to ``ndigits`` after every iteration, so floating-point error
    cannot propagate between engines (the same re-synchronization trick as
    the k-means quantizer in simsearch.train_ivf_centroids) — a DuckDB
    oracle unrolls the same ``iters`` rounds as CTEs and matches exactly.

    Scale shape (the 100 TB story): per iteration ONE shuffle-join of
    (src, pr/outd) contributions against the edge list keyed on src and
    ONE shuffle-agg summing contributions by dst — both key+double rows,
    never payloads.  The edge list is localCheckpoint-ed once (cluster:
    reliable checkpoint) and AQE handles hub-node skew in the join (hubs
    are the web's power-law reality).  Dangling nodes (no out-edges)
    contribute no redistributed mass — the standard simplification; feed
    symmetrized edges if every node must have out-degree ≥ 1.  The single
    driver-side action is the node count (one long).
    """
    e = edges.select(F.col(src).alias('src'), F.col(dst).alias('dst'))
    nodes = (
        e.select(F.col('src').alias('id'))
        .unionByName(e.select(F.col('dst').alias('id')))
        .distinct()
        .localCheckpoint()
    )
    n = nodes.count()
    outd = e.groupBy('src').agg(F.count('*').alias('outd'))
    ed = e.join(outd, 'src').localCheckpoint()

    # both engines compute 1.0/n and (1-d)/n in IEEE double identically;
    # the oracle interpolates repr(damping)/repr(1-damping) verbatim
    pr = nodes.withColumn('pr', F.lit(1.0) / F.lit(float(n)))
    base = F.lit(1.0 - damping) / F.lit(float(n))
    for _ in range(iters):
        contrib = (
            ed.join(pr.withColumnRenamed('id', 'src'), 'src')
            .select(F.col('dst').alias('id'), (F.col('pr') / F.col('outd')).alias('c'))
        )
        sums = contrib.groupBy('id').agg(F.sum('c').alias('s'))
        pr = (
            nodes.join(sums, 'id', 'left')
            .select(
                'id',
                F.round(
                    base + F.lit(damping) * F.coalesce(F.col('s'), F.lit(0.0)), ndigits
                ).alias('pr'),
            )
            .localCheckpoint(eager=False)
        )
    return pr


def k_hop(
    edges: DataFrame,
    seeds: DataFrame,
    k: int = 3,
    src: str = 'src',
    dst: str = 'dst',
) -> DataFrame:
    """Bounded-depth BFS: minimum hop distance (0..k) from the seed set
    for every reachable node.  Returns DataFrame[id, hop].

    The KG use: neighborhood expansion around an entity ("everything
    within 3 hops of this tool") — the query Dgraph answers with a
    recurse block; here it is k driver-bounded rounds of
    frontier-join + anti-join, the same iterate-on-DataFrames shape as
    ``pagerank``/``dedup.connected_components``.

    Scale shape: per hop ONE equi-join of the current frontier against
    the edge list keyed on ``src`` (AQE broadcasts the frontier while it
    is small — the common case for entity neighborhoods) and ONE
    anti-join against the visited set — both shuffle node-id strings
    only, never payloads.  Frontiers are ``localCheckpoint``-ed
    (cluster: reliable checkpoint) so lineage stays O(1) per round; k is
    a driver constant, so there are no data-dependent driver actions at
    all — the whole expansion is one lazy plan per hop.
    """
    e = edges.select(F.col(src).alias('src'), F.col(dst).alias('dst'))
    frontier = seeds.select(F.col(seeds.columns[0]).alias('id')).distinct().localCheckpoint()
    visited = frontier.withColumn('hop', F.lit(0))
    for h in range(1, k + 1):
        frontier = (
            e.join(frontier.withColumnRenamed('id', 'src'), 'src')
            .select(F.col('dst').alias('id'))
            .distinct()
            .join(visited.select('id'), 'id', 'left_anti')
            .localCheckpoint()
        )
        visited = visited.unionByName(frontier.withColumn('hop', F.lit(h)))
    return visited


def degree_stats(edges: DataFrame, src: str = 'src', dst: str = 'dst') -> DataFrame:
    """Per-node (out_degree, in_degree) — one shuffle each side, full-outer
    merged on id.  Returns DataFrame[id, out_degree, in_degree]."""
    out = edges.groupBy(F.col(src).alias('id')).agg(F.count('*').alias('out_degree'))
    inn = edges.groupBy(F.col(dst).alias('id')).agg(F.count('*').alias('in_degree'))
    return (
        out.join(inn, 'id', 'full_outer')
        .select(
            'id',
            F.coalesce('out_degree', F.lit(0)).alias('out_degree'),
            F.coalesce('in_degree', F.lit(0)).alias('in_degree'),
        )
    )
