"""Bipartite projection + triangle counting (operators/graph.py) and the
grouped top-k plan shape — crafted graphs with known projections and
triangle counts."""
from __future__ import annotations

from pyspark.sql import functions as F

from dgraphpandas_spark.operators.graph import bipartite_project, triangle_count


def _bip(spark, pairs):
    return spark.createDataFrame(pairs, 'src string, dst string')


def test_projection_weights_and_canonical_pairs(spark):
    e = _bip(spark, [
        ('c1', 't1'), ('c1', 't2'),            # t1-t2 via c1
        ('c2', 't1'), ('c2', 't2'),            # t1-t2 again via c2
        ('c2', 't3'),                          # t1-t3, t2-t3 via c2
        ('c1', 't1'),                          # duplicate edge — must not inflate
    ])
    got = {(r['a'], r['b']): r['weight'] for r in bipartite_project(e).collect()}
    assert got == {('t1', 't2'): 2, ('t1', 't3'): 1, ('t2', 't3'): 1}


def test_projection_hot_src_guard(spark):
    # src 'hot' touches 3 dsts; cap at 2 removes all its pairs
    e = _bip(spark, [('hot', 't1'), ('hot', 't2'), ('hot', 't3'), ('c', 't1'), ('c', 't2')])
    got = {(r['a'], r['b']): r['weight']
           for r in bipartite_project(e, max_src_degree=2).collect()}
    assert got == {('t1', 't2'): 1}  # only via 'c'


def test_triangle_count_exact(spark):
    # K4 on {1,2,3,4} has 4 triangles; remove edge (3,4) → 2 triangles
    k4 = [(str(i), str(j)) for i in range(1, 5) for j in range(i + 1, 5)]
    pairs = spark.createDataFrame(k4, 'a string, b string')
    assert triangle_count(pairs).collect()[0]['n_triangles'] == 4
    pruned = spark.createDataFrame(
        [p for p in k4 if p != ('3', '4')], 'a string, b string'
    )
    assert triangle_count(pruned).collect()[0]['n_triangles'] == 2


def test_triangle_free_graph(spark):
    # a path graph has no triangles
    pairs = spark.createDataFrame([('1', '2'), ('2', '3'), ('3', '4')], 'a string, b string')
    assert triangle_count(pairs).collect()[0]['n_triangles'] == 0


def test_grouped_topk_plans_partial_window_group_limit(spark):
    """text_topk_per_lang's shuffle must carry only local top-k per group:
    the plan has a WindowGroupLimit below the exchange (partial) and one
    above (final)."""
    import __spark_entry__ as E

    df = E.queries()['text_topk_per_lang'](spark, '/root/testdata/sf0.001')
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString('formatted')
    )
    tree = plan.split('\n\n')[0]
    assert tree.count('WindowGroupLimit') == 2, tree
