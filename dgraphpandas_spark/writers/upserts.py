"""N-Quad upsert line rendering as DataFrame expressions.

Parity: /root/reference/dgraphpandas/writers/upserts.py:10-77 — the
authoritative output format (asserted by the reference's own golden tests,
tests/writers/test_upserts.py:105-237):

    intrinsic: <subject> <predicate> "object"^^<type> .
    edges:     <subject> <predicate> <object> .

Column-contract validation and the default NA drop are preserved.
Distributed note: the reference returns Python line lists; we return
``DataFrame[line: string]`` so the sink is a parallel ``write.text``.
"""
from __future__ import annotations

from typing import Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..types import DEFAULT_RDF_TYPE

_REQUIRED_INTRINSIC = ['subject', 'predicate', 'object', 'type']
_REQUIRED_EDGES = ['subject', 'predicate', 'object']


def intrinsic_lines(intrinsic: DataFrame, drop_na_objects: bool = True) -> DataFrame:
    """Parity: upserts.py:10-27 (``_generate_intrinsic``)."""
    for col in _REQUIRED_INTRINSIC:
        if col not in intrinsic.columns:
            raise ValueError(f'{col} is not within intrinsic columns {intrinsic.columns}')
    if drop_na_objects:
        intrinsic = intrinsic.filter(F.col('object').isNotNull())
    return intrinsic.select(
        F.concat(
            F.lit('<'), F.col('subject').cast('string'), F.lit('> <'),
            F.col('predicate').cast('string'), F.lit('> "'),
            F.col('object').cast('string'), F.lit('"^^'),
            F.coalesce(F.col('type').cast('string'), F.lit(DEFAULT_RDF_TYPE)),
            F.lit(' .'),
        ).alias('line')
    )


def edge_lines(edges: DataFrame) -> DataFrame:
    """Parity: upserts.py:30-45 (``_generate_edges``)."""
    for col in _REQUIRED_EDGES:
        if col not in edges.columns:
            raise ValueError(f'{col} is not within edges columns {edges.columns}')
    return edges.select(
        F.concat(
            F.lit('<'), F.col('subject').cast('string'), F.lit('> <'),
            F.col('predicate').cast('string'), F.lit('> <'),
            F.col('object').cast('string'), F.lit('> .'),
        ).alias('line')
    )


def generate_upserts(
    intrinsic: DataFrame, edges: DataFrame, drop_na_objects: bool = True
) -> Tuple[DataFrame, DataFrame]:
    """Parity: upserts.py:48-77 (``generate_upserts``)."""
    if intrinsic is None:
        raise ValueError('intrinsic')
    if edges is None:
        raise ValueError('edges')
    return intrinsic_lines(intrinsic, drop_na_objects), edge_lines(edges)
