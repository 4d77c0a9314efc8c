"""KG quality validation: referential-integrity audit of extracted triples.

Engine addition beyond the reference — kiran94/dgraphpandas emits edge
triples without checking that the target node exists
(`dgraphpandas/strategies/vertical_helpers.py:_apply_edge_id` just
concatenates the id), so a malformed source column silently produces
dangling references that only surface as Dgraph query misses.  At
10^12-turn scale you want that audit as a first-class batch operator over
the extracted tables, not a post-load graph walk.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def orphan_edges(
    edges: DataFrame,
    nodes: DataFrame,
    edge_obj: str = 'object',
    node_id: str = 'subject',
    predicate_col: str = 'predicate',
) -> DataFrame:
    """Per-predicate dangling-reference audit: an edge is an orphan when
    its object id has no matching node in ``nodes``.  Returns
    DataFrame[predicate, n_edges, n_orphan_edges, n_orphan_objects].

    Plan shape (the 100 TB story): the edge table is FIRST collapsed to
    (predicate, object) groups with a partial map-side combine — the
    anti-join then runs on distinct references, not raw edges (web-scale
    edge tables repeat hot objects millions of times; the group collapse
    is the same hot-key guard as dedup's max_df).  The node side is a
    key-only distinct.  Both the anti-join and the final per-predicate
    rollup shuffle (predicate, object, count) rows only; AQE broadcasts
    the node set when it is small.
    """
    refs = (
        edges.groupBy(predicate_col, F.col(edge_obj).alias('__obj'))
        .agg(F.count('*').alias('__n'))
    )
    node_ids = nodes.select(F.col(node_id).alias('__obj')).distinct()
    orphans = refs.join(node_ids, '__obj', 'left_anti')
    totals = refs.groupBy(predicate_col).agg(
        F.sum('__n').alias('n_edges'),
    )
    orphan_stats = orphans.groupBy(predicate_col).agg(
        F.sum('__n').alias('n_orphan_edges'),
        F.count('*').alias('n_orphan_objects'),
    )
    return (
        totals.join(orphan_stats, predicate_col, 'left')
        .select(
            predicate_col,
            'n_edges',
            F.coalesce('n_orphan_edges', F.lit(0)).alias('n_orphan_edges'),
            F.coalesce('n_orphan_objects', F.lit(0)).alias('n_orphan_objects'),
        )
    )
