"""Streaming admission-control dedup (streaming/stream.py:
stream_ingest_dedup): the sink after draining N forced micro-batches must
equal ONE batch run of operators/dedup.incremental_dedup over the same
input (micro-batch-split invariance — each doc is judged only against the
static corpus), and the stream must actually have split into >= 2 batches.
"""
from __future__ import annotations

import os

from pyspark.sql import functions as F

from dgraphpandas_spark.operators.dedup import incremental_dedup
from dgraphpandas_spark.streaming.stream import stream_ingest_dedup

_CORPUS = [
    (i, f'alpha beta gamma delta epsilon zeta eta theta doc{i} '
        f'iota kappa lam mu nu xi omicron pi w{i % 7} w{i % 5}')
    for i in range(30)
]


def _frames(spark):
    corpus = spark.createDataFrame(_CORPUS, 'doc_id long, text string')
    new = (
        corpus.filter('doc_id % 3 = 0')
        .select((F.col('doc_id') + 1000).alias('doc_id'), 'text')   # exact dups
        .unionByName(
            corpus.filter('doc_id % 4 = 1').select(
                (F.col('doc_id') + 2000).alias('doc_id'),
                F.concat(F.col('text'), F.lit(' totally novel suffix tail')).alias('text'),
            )
        )
    )
    return corpus, new


def test_streamed_verdicts_equal_batch_and_split_into_batches(spark, tmp_path):
    corpus, new = _frames(spark)
    indir = str(tmp_path / 'in')
    os.makedirs(indir)
    for par in (0, 1):
        new.filter(F.col('doc_id') % 2 == par).coalesce(1) \
            .write.mode('append').parquet(indir)
    stream = (
        spark.readStream.schema(new.schema)
        .option('maxFilesPerTrigger', 1)
        .parquet(indir)
    )
    out = str(tmp_path / 'verdicts')
    q = stream_ingest_dedup(
        stream, corpus, out, str(tmp_path / 'ck'), n=3, bands=4, threshold=0.5
    )
    q.awaitTermination()
    assert len(q.recentProgress) >= 2          # genuinely micro-batched

    streamed = sorted(
        (r['id'], r['dup_of'], r['jaccard'], r['keep'])
        for r in spark.read.parquet(out).collect()
    )
    batch = sorted(
        (r['id'], r['dup_of'], r['jaccard'], r['keep'])
        for r in incremental_dedup(new, corpus, n=3, bands=4, threshold=0.5).collect()
    )
    assert streamed == batch
    assert len(streamed) == new.count()        # one verdict per new doc
    # every planted EXACT dup was caught with jaccard 1.0 against its source
    by_id = {i: (d, j, k) for i, d, j, k in streamed}
    exact_ids = [i + 1000 for i in range(30) if i % 3 == 0]
    assert exact_ids
    for i in exact_ids:
        d, j, k = by_id[i]
        assert not k and d == i - 1000 and j == 1.0
