"""Property fuzz of knn_graph (LSH path) against an inline DuckDB mirror:
random small vector sets at dim=4 / 3 hyperplanes with planted duplicates
and near-ties — both engines must agree on every (id, nbr, cos, rank) row,
including the (cos DESC, nbr ASC) tiebreak after 6-dp rounding."""
from __future__ import annotations

import os

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from dgraphpandas_spark.functions.similarity import hyperplanes, plane_sql_literal
from dgraphpandas_spark.operators.simsearch import knn_graph

_EXAMPLES = int(os.environ.get('HYPOTHESIS_MAX_EXAMPLES', '25')) // 2 or 1

_DIM, _PLANES_N, _SEED = 4, 3, 11
_PLANES = hyperplanes(_PLANES_N, _DIM, _SEED)

# small integer coordinates → exact doubles, frequent duplicates and ties
_COORD = st.integers(min_value=-2, max_value=2).map(float)
_VEC = st.lists(_COORD, min_size=_DIM, max_size=_DIM).filter(
    lambda v: any(x != 0.0 for x in v)  # zero vector has undefined cosine
)


def _dot(a: str, b: str) -> str:
    return (
        f'list_reduce(list_transform(list_zip({a}, {b}), '
        f'z -> z[1]::double * z[2]::double), (x, y) -> x + y)'
    )


def _bucket_sql(vec: str) -> str:
    terms = [
        f'(CASE WHEN {_dot(vec, plane_sql_literal(p))} > 0 THEN {2 ** i} ELSE 0 END)'
        for i, p in enumerate(_PLANES)
    ]
    return '(' + ' + '.join(terms) + ')'


def _cos(a: str, b: str) -> str:
    return f'({_dot(a, b)} / (sqrt({_dot(a, a)}) * sqrt({_dot(b, b)})))'


_PROBES = ', '.join(f'xor(bucket, {2 ** i})' for i in range(_PLANES_N))
_SQL = f"""
WITH e AS (SELECT vec_id, list_transform(embedding, x -> x::double) AS v,
                  {_bucket_sql('list_transform(embedding, x -> x::double)')} AS bucket
           FROM vecs),
p AS (SELECT vec_id, v, unnest([bucket, {_PROBES}]) AS bucket FROM e),
cand AS (SELECT a.vec_id AS id, p.vec_id AS nbr, round({_cos('a.v', 'p.v')}, 6) AS cos
         FROM e a JOIN p ON a.bucket = p.bucket WHERE a.vec_id != p.vec_id),
r AS (SELECT id, nbr, cos,
             row_number() OVER (PARTITION BY id ORDER BY cos DESC, nbr ASC) AS rank
      FROM cand)
SELECT id, nbr, cos, CAST(rank AS INT) AS rank FROM r WHERE rank <= {{k}}
"""


@pytest.fixture(scope='module')
def con():
    return duckdb.connect()


@settings(
    max_examples=_EXAMPLES,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(vecs=st.lists(_VEC, min_size=2, max_size=10), k=st.integers(1, 4))
def test_knn_graph_matches_duckdb(spark, con, vecs, k):
    rows = [(i, v) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, 'vec_id long, embedding array<double>')
    got = sorted(
        tuple(r)
        for r in knn_graph(
            df, k=k, n_planes=_PLANES_N, dim=_DIM, seed=_SEED, multi_probe=True
        ).collect()
    )
    con.execute('DROP TABLE IF EXISTS vecs')
    con.execute('CREATE TABLE vecs(vec_id BIGINT, embedding DOUBLE[])')
    con.executemany('INSERT INTO vecs VALUES (?, ?)', rows)
    want = sorted(tuple(r) for r in con.execute(_SQL.format(k=k)).fetchall())
    assert got == want
