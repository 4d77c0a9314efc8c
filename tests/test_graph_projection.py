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


def test_k_hop_fuzz_vs_python_bfs(spark):
    """Random small digraphs: k_hop must equal a plain Python BFS."""
    import itertools
    import random

    rng = random.Random(13)
    for trial in range(6):
        nodes = [f'n{i}' for i in range(rng.randint(2, 8))]
        edges = [
            (a, b) for a, b in itertools.permutations(nodes, 2) if rng.random() < 0.3
        ]
        k = rng.randint(1, 3)
        seeds = rng.sample(nodes, rng.randint(1, 2))

        # python BFS ground truth
        dist = {s: 0 for s in seeds}
        frontier = set(seeds)
        for h in range(1, k + 1):
            nxt = {b for (a, b) in edges if a in frontier} - set(dist)
            for n in nxt:
                dist[n] = h
            frontier = nxt
        edf = spark.createDataFrame(edges or [('x', 'y')], 'src string, dst string')
        if not edges:
            edf = edf.limit(0)
        sdf = spark.createDataFrame([(s,) for s in seeds], 'id string')
        from dgraphpandas_spark.operators.graph import k_hop

        got = {r['id']: r['hop'] for r in k_hop(edf, sdf, k=k).collect()}
        assert got == dist, (trial, edges, seeds, k, got, dist)


def test_triangle_count_fuzz_vs_bruteforce(spark):
    import itertools
    import random

    rng = random.Random(29)
    for trial in range(6):
        nodes = [str(i) for i in range(rng.randint(3, 9))]
        pairs = [
            (a, b) for a, b in itertools.combinations(sorted(nodes), 2)
            if rng.random() < 0.4
        ]
        eset = set(pairs)
        want = sum(
            1 for x, y, z in itertools.combinations(sorted(nodes), 3)
            if (x, y) in eset and (y, z) in eset and (x, z) in eset
        )
        pdf = spark.createDataFrame(pairs or [('a', 'b')], 'a string, b string')
        if not pairs:
            pdf = pdf.limit(0)
        got = triangle_count(pdf).collect()[0]['n_triangles']
        assert got == want, (trial, pairs, got, want)


def test_projection_fuzz_vs_python(spark):
    import itertools
    import random

    rng = random.Random(41)
    for trial in range(6):
        convs = [f'c{i}' for i in range(rng.randint(1, 5))]
        tools = [f't{i}' for i in range(rng.randint(2, 5))]
        edges = [
            (c, t) for c, t in itertools.product(convs, tools) if rng.random() < 0.5
        ]
        if not edges:
            continue
        # python ground truth: distinct (src,dst); weight = shared srcs
        eset = set(edges)
        want = {}
        for a, b in itertools.combinations(sorted(tools), 2):
            w = sum(1 for c in convs if (c, a) in eset and (c, b) in eset)
            if w:
                want[(a, b)] = w
        edf = spark.createDataFrame(edges, 'src string, dst string')
        got = {(r['a'], r['b']): r['weight'] for r in bipartite_project(edf).collect()}
        assert got == want, (trial, edges, got, want)
