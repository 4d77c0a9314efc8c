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
