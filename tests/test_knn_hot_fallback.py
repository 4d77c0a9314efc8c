"""knn_graph hot-bucket audit + fallback (round-4 verdict item #4 / ADVICE).

Plants a mega-bucket (more members than ``max_bucket``) and asserts the
members are NOT silently dropped: the audit dict reports the hot bucket and
node counts, every hot node still receives neighbors via the sub-plane
fallback join, and no (id, nbr) pair is emitted twice (the primary and
fallback joins are disjoint by construction).
"""
from __future__ import annotations

import pytest

from dgraphpandas_spark.functions.similarity import hyperplanes, lsh_bucket
from dgraphpandas_spark.operators.simsearch import knn_graph

_DIM, _PLANES_N, _SEED = 8, 4, 11
_N_HOT, _N_COLD, _MAX_BUCKET = 30, 10, 20

# two fixed vectors in (with overwhelming probability) different sign-LSH
# buckets; exact duplicates so every same-bucket pair has cos == 1.0
_U = [1.0, 2.0, -1.0, 0.5, 1.5, -2.0, 0.25, 1.0]
_W = [-1.0, -2.0, 1.0, -0.5, -1.5, 2.0, -0.25, -1.0]


@pytest.fixture(scope='module')
def planted(spark):
    rows = [(i, _U) for i in range(_N_HOT)]
    rows += [(100 + i, _W) for i in range(_N_COLD)]
    return spark.createDataFrame(rows, 'vec_id long, embedding array<double>')


def test_hot_bucket_audited_and_routed(planted):
    audit: dict = {}
    out = knn_graph(
        planted, k=3, n_planes=_PLANES_N, dim=_DIM, seed=_SEED,
        max_bucket=_MAX_BUCKET, audit=audit,
    ).collect()

    assert audit == {'hot_buckets': 1, 'hot_nodes': _N_HOT}

    by_id = {}
    for r in out:
        by_id.setdefault(r['id'], []).append(r)
    # every hot node got neighbors through the fallback (identical vectors
    # share the sub bucket, so each has _N_HOT - 1 candidates, capped at k)
    for i in range(_N_HOT):
        nbrs = by_id.get(i, [])
        assert len(nbrs) == 3, f'hot node {i} lost its neighbors'
        assert all(r['cos'] == 1.0 and 0 <= r['nbr'] < _N_HOT for r in nbrs)
    # cold nodes unaffected
    for i in range(_N_COLD):
        nbrs = by_id.get(100 + i, [])
        assert len(nbrs) == 3
        assert all(r['nbr'] >= 100 for r in nbrs)
    # hot and cold never mix, and no duplicate (id, nbr) pair anywhere
    pairs = [(r['id'], r['nbr']) for r in out]
    assert len(pairs) == len(set(pairs))


def test_no_hot_no_audit_branch(planted):
    """max_bucket above every bucket size: audit reports zeros and the
    result equals a capless run (plan shape unchanged — no fallback)."""
    audit: dict = {}
    capped = knn_graph(planted, k=2, n_planes=_PLANES_N, dim=_DIM,
                       seed=_SEED, max_bucket=1000, audit=audit)
    uncapped = knn_graph(planted, k=2, n_planes=_PLANES_N, dim=_DIM,
                         seed=_SEED, max_bucket=0)
    assert audit == {'hot_buckets': 0, 'hot_nodes': 0}
    assert sorted(map(tuple, capped.collect())) == sorted(map(tuple, uncapped.collect()))


def test_planted_vectors_really_split_buckets(spark):
    """Guard the fixture's premise: _U and _W land in different buckets."""
    import pyspark.sql.functions as F

    planes = hyperplanes(_PLANES_N, _DIM, _SEED)
    df = spark.createDataFrame([(0, _U), (1, _W)], 'i long, v array<double>')
    got = {r['i']: r['b'] for r in
           df.select('i', lsh_bucket(F.col('v'), planes).alias('b')).collect()}
    assert got[0] != got[1]
