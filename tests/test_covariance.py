"""One-pass covariance (operators/simsearch.py:covariance_matrix) —
numpy ground truth and the no-explode plan shape."""
from __future__ import annotations

import numpy as np
import pytest

from dgraphpandas_spark.operators.simsearch import covariance_matrix


def test_covariance_matches_numpy(spark):
    rng = np.random.default_rng(11)
    vecs = rng.normal(size=(200, 4)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(vecs)],
        'vec_id int, embedding array<float>',
    )
    got = {(r['i'], r['j']): r['cov'] for r in covariance_matrix(df, k=4).collect()}
    want = np.cov(vecs.astype(np.float64).T, bias=True)   # population covariance
    assert len(got) == 10                                  # upper triangle of 4×4
    for (i, j), c in got.items():
        assert c == pytest.approx(want[i, j], abs=2e-6)


def test_covariance_plan_is_single_aggregate(spark):
    df = spark.createDataFrame([(0, [1.0, 2.0])], 'vec_id int, embedding array<float>')
    plan = covariance_matrix(df, k=2)._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString('formatted')
    )
    tree = plan.split('\n\n')[0]
    assert 'Generate' not in tree or tree.count('Scan') == 1  # unpivot's Expand is fine
    assert tree.count('Scan') == 1                            # input read ONCE
    shuffles = tree.count('Exchange') - tree.count('BroadcastExchange')
    assert 'HashAggregate' in tree and shuffles == 1          # one moment pass


def test_pca_top_component_aligns_with_numpy_eig(spark):
    # planted dominant direction: x = t·u + small noise → the power
    # iteration must land (up to sign) on numpy's top eigenvector
    from dgraphpandas_spark.operators.simsearch import pca_top_component

    rng = np.random.default_rng(7)
    u = np.array([0.6, -0.5, 0.4, -0.3, 0.25, -0.2, 0.15, -0.1])
    u = u / np.linalg.norm(u)
    t = rng.normal(scale=3.0, size=300)
    vecs = (np.outer(t, u) + rng.normal(scale=0.1, size=(300, 8))).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(vecs)],
        'vec_id int, embedding array<float>',
    )
    comp = pca_top_component(df, k=8, iters=8)
    assert len(comp) == 8
    c = np.array(comp)
    assert np.linalg.norm(c) == pytest.approx(1.0, abs=1e-4)   # quantized unit
    cov = np.cov(vecs.astype(np.float64).T, bias=True)
    w, v = np.linalg.eigh(cov)
    top = v[:, np.argmax(w)]
    assert abs(float(c @ top)) > 0.999
    # determinism: identical on a second run
    assert pca_top_component(df, k=8, iters=8) == comp


def test_pca_project_is_zero_exchange(spark):
    from dgraphpandas_spark.operators.simsearch import pca_project

    df = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0]), (1, [0.0, 2.0, 0.0])],
        'vec_id int, embedding array<float>',
    )
    out = pca_project(df, [1.0, 0.0, 0.0])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert 'Exchange' not in plan, plan
    got = {r['vec_id']: r['pc1'] for r in out.collect()}
    assert got == {0: 1.0, 1: 0.0}
