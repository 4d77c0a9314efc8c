"""Weighted sampling determinism/monotonicity and stream-static
enrichment across micro-batches."""
from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from dgraphpandas_spark.operators.curation import sample_weighted
from dgraphpandas_spark.streaming.stream import enrich_stream


def test_weighted_sampling_extremes_and_monotone(spark):
    d = spark.range(2000).select(F.col('id').alias('doc_id'))
    assert sample_weighted(d, F.lit(1.0)).count() == 2000
    assert sample_weighted(d, F.lit(0.0)).count() == 0
    low = {r['doc_id'] for r in sample_weighted(d, F.lit(0.3)).collect()}
    high = {r['doc_id'] for r in sample_weighted(d, F.lit(0.7)).collect()}
    assert low <= high                      # same doc never flips out as p rises
    # acceptance rate tracks the weight (hash-uniform, ±5pp at n=2000)
    assert abs(len(low) / 2000 - 0.3) < 0.05
    assert abs(len(high) / 2000 - 0.7) < 0.05


def test_weighted_sampling_stable_under_repartition(spark):
    d = spark.range(1000).select(F.col('id').alias('doc_id'))
    w = (F.col('doc_id') % 10).cast('double') / 10.0
    a = {r['doc_id'] for r in sample_weighted(d, w).collect()}
    b = {r['doc_id'] for r in sample_weighted(d.repartition(7), w).collect()}
    assert a == b


def test_stream_static_enrich_two_batches(spark):
    tmp = tempfile.mkdtemp(prefix='t_enrich_')
    indir = os.path.join(tmp, 'in')
    os.makedirs(indir)
    rows = spark.range(20).select(
        F.col('id').alias('event_id'), (F.col('id') % 4).alias('user_id')
    )
    for par in (0, 1):
        rows.filter(F.col('event_id') % 2 == par).coalesce(1).write.mode('append').parquet(indir)
    dim = spark.range(4).select(
        F.col('id').alias('user_id'), (F.col('id') * 10).alias('tier')
    )
    stream = (
        spark.readStream.schema('event_id long, user_id long')
        .option('maxFilesPerTrigger', 1)
        .parquet(indir)
    )
    out = enrich_stream(stream, dim, on='user_id')
    q = (
        out.writeStream.trigger(availableNow=True)
        .outputMode('append')
        .format('memory')
        .queryName('t_enrich_sink')
        .option('checkpointLocation', os.path.join(tmp, 'ck'))
        .start()
    )
    q.awaitTermination()
    got = spark.table('t_enrich_sink').collect()
    assert len(got) == 20
    assert all(r['tier'] == r['user_id'] * 10 for r in got)   # every row enriched
    # maxFilesPerTrigger=1 over two files ⇒ at least two micro-batches ran
    assert len([p for p in q.recentProgress if p['numInputRows'] > 0]) >= 2
