"""Long-document scale guards: the operators whose docstrings promise
linear behavior on 100k-token web documents must stay linear — a
lambda-captured deep expression (the O(n²) trap fixed in round 5 for
winnow_fingerprints/shingles) would blow these up by orders of magnitude.
Sizes kept modest (20 docs × 5k tokens) so the guard costs seconds."""
from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

_N_DOCS, _N_TOKS = 20, 5000


@pytest.fixture(scope='module')
def long_docs(spark):
    base = spark.range(_N_DOCS).select(
        F.col('id').alias('doc_id'),
        F.array_join(
            F.transform(
                F.sequence(F.lit(1), F.lit(_N_TOKS)),
                lambda i: F.concat(F.lit('w'), ((i * (F.col('id') + 7)) % 499).cast('string')),
            ),
            ' ',
        ).alias('text'),
    )
    return base.localCheckpoint()


def _timed(fn, budget_s):
    t0 = time.time()
    out = fn()
    took = time.time() - t0
    assert took < budget_s, f'took {took:.1f}s (budget {budget_s}s) — quadratic regression?'
    return out


def test_chunk_documents_linear_on_long_docs(long_docs):
    from dgraphpandas_spark.operators.curation import chunk_documents

    n = _timed(lambda: chunk_documents(long_docs, size=32, stride=24).count(), 60)
    # floor((5000-1)/24)+1 chunks per doc
    assert n == _N_DOCS * ((_N_TOKS - 1) // 24 + 1)


def test_dup_spans_linear_on_long_docs(long_docs):
    from dgraphpandas_spark.operators.dedup import dup_spans

    rows = _timed(lambda: dup_spans(long_docs).collect(), 60)
    assert len(rows) == _N_DOCS
    assert all(r['n_tokens'] == _N_TOKS for r in rows)


def test_winnow_and_shingles_linear_on_long_docs(long_docs):
    from dgraphpandas_spark.functions.text import winnow_fingerprints
    from dgraphpandas_spark.operators.dedup import shingles

    n_fp = _timed(
        lambda: long_docs.select(
            F.explode(winnow_fingerprints(F.col('text'), k=5, w=4)).alias('fp')
        ).count(),
        60,
    )
    assert n_fp > 0
    n_sh = _timed(lambda: shingles(long_docs, n=3, distinct=False).count(), 60)
    assert n_sh == _N_DOCS * (_N_TOKS - 2)   # every positional 3-gram
