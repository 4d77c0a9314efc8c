"""Property fuzz of pagerank_weighted against an inline DuckDB mirror:
random small weighted digraphs (hubs, self-loops, multi-edges, dangling
nodes, disconnected components) with integer weights and a random integer
teleport vector — both engines must agree on every rank after 3 quantized
rounds (the corpus_pack-style regression harness for the PPR family).
The mirror must interpolate base = repr(1.0 - damping) — the IEEE value
0.15000000000000002, NOT the literal 0.15 — exactly as the production
oracle builder does."""
from __future__ import annotations

import os

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from dgraphpandas_spark.operators.graph import pagerank_weighted

_EXAMPLES = int(os.environ.get('HYPOTHESIS_MAX_EXAMPLES', '25')) // 2 or 1

_NODE = st.integers(min_value=0, max_value=6).map(lambda i: f'n{i}')


@st.composite
def graph(draw):
    n_edges = draw(st.integers(min_value=1, max_value=12))
    edges = [
        (draw(_NODE), draw(_NODE), draw(st.integers(1, 9))) for _ in range(n_edges)
    ]
    # teleport over a random subset of the touched nodes (weights ≥ 1)
    touched = sorted({e[0] for e in edges} | {e[1] for e in edges})
    k = draw(st.integers(1, len(touched)))
    tp = [(nid, draw(st.integers(1, 5))) for nid in touched[:k]]
    return edges, tp


@pytest.fixture(scope='module')
def con():
    return duckdb.connect()


_SQL = """
WITH e AS (SELECT * FROM g),
tp AS (SELECT * FROM t),
nodes AS (SELECT DISTINCT id FROM (SELECT src AS id FROM e UNION ALL SELECT dst FROM e)),
tvec AS (SELECT n.id, coalesce(tp.tw, 0) / (SELECT sum(tw) FROM tp) AS t
         FROM nodes n LEFT JOIN tp ON n.id = tp.id),
wout AS (SELECT src, sum(w) AS wout FROM e GROUP BY 1),
ed AS (SELECT e.src, e.dst, e.w, o.wout FROM e JOIN wout o ON e.src = o.src),
pr0 AS (SELECT id, t AS pr FROM tvec),
pr1 AS (SELECT tv.id, round((0.15000000000000002 * tv.t + 0.85 * coalesce(x.s, 0.0)) * 1000000.0)::bigint / 1000000.0 AS pr
        FROM tvec tv LEFT JOIN (SELECT dst AS id, sum(round(pr * w / wout * 1000000000000.0)::bigint) / 1000000000000.0 AS s
                                FROM ed JOIN pr0 p ON ed.src = p.id GROUP BY dst) x ON tv.id = x.id),
pr2 AS (SELECT tv.id, round((0.15000000000000002 * tv.t + 0.85 * coalesce(x.s, 0.0)) * 1000000.0)::bigint / 1000000.0 AS pr
        FROM tvec tv LEFT JOIN (SELECT dst AS id, sum(round(pr * w / wout * 1000000000000.0)::bigint) / 1000000000000.0 AS s
                                FROM ed JOIN pr1 p ON ed.src = p.id GROUP BY dst) x ON tv.id = x.id),
pr3 AS (SELECT tv.id, round((0.15000000000000002 * tv.t + 0.85 * coalesce(x.s, 0.0)) * 1000000.0)::bigint / 1000000.0 AS pr
        FROM tvec tv LEFT JOIN (SELECT dst AS id, sum(round(pr * w / wout * 1000000000000.0)::bigint) / 1000000000000.0 AS s
                                FROM ed JOIN pr2 p ON ed.src = p.id GROUP BY dst) x ON tv.id = x.id)
SELECT id, pr FROM pr3
"""


@settings(
    max_examples=_EXAMPLES,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(case=graph())
def test_pagerank_weighted_matches_duckdb(spark, con, case):
    edges, tp = case
    edf = spark.createDataFrame(edges, 'src string, dst string, weight long')
    tdf = spark.createDataFrame(tp, 'id string, t long')
    got = sorted(
        (r['id'], r['pr'])
        for r in pagerank_weighted(edf, teleport=tdf, iters=3, damping=0.85).collect()
    )

    con.execute('DROP TABLE IF EXISTS g'); con.execute('DROP TABLE IF EXISTS t')
    con.execute('CREATE TABLE g(src VARCHAR, dst VARCHAR, w BIGINT)')
    con.executemany('INSERT INTO g VALUES (?, ?, ?)', edges)
    con.execute('CREATE TABLE t(id VARCHAR, tw BIGINT)')
    con.executemany('INSERT INTO t VALUES (?, ?)', tp)
    want = sorted(tuple(r) for r in con.execute(_SQL).fetchall())
    assert got == want
