"""Stateful streaming session aggregation: two input waves, two separate
AvailableNow stream runs sharing one checkpoint — state must accumulate
across the restart (the resumable-incremental-ELT contract)."""
from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from dgraphpandas_spark.sources.transcripts import synthetic_transcripts
from dgraphpandas_spark.streaming.stateful import conversation_sessions
from dgraphpandas_spark.streaming.stream import stream_transcripts

pytestmark = pytest.mark.filterwarnings('ignore')


def _run_wave(spark, input_dir, checkpoint, out_dir):
    stream = stream_transcripts(spark, input_dir)
    sessions = conversation_sessions(stream)

    def _append(batch_df, batch_id):
        batch_df.write.mode('append').parquet(out_dir)

    q = (
        sessions.writeStream.trigger(availableNow=True)
        .option('checkpointLocation', checkpoint)
        .outputMode('update')
        .foreachBatch(_append)
        .start()
    )
    q.awaitTermination(120)


def test_sessions_accumulate_across_restarts(spark, tmp_path):
    t = synthetic_transcripts(spark, n_turns=1000, seed=7).cache()
    wave1 = t.filter(F.col('turn_idx') % 2 == 0)
    wave2 = t.filter(F.col('turn_idx') % 2 == 1)

    input_dir = str(tmp_path / 'in')
    ckpt = str(tmp_path / 'ckpt')
    out = str(tmp_path / 'out')

    wave1.write.mode('append').parquet(input_dir)
    _run_wave(spark, input_dir, ckpt, out)

    wave2.write.mode('append').parquet(input_dir)
    _run_wave(spark, input_dir, ckpt, out)  # restart, same checkpoint

    assert glob.glob(os.path.join(out, '*.parquet'))
    # latest session row per conversation = the final accumulated state
    sessions = spark.read.parquet(out)
    latest = sessions.groupBy('conv_id').agg(
        F.max('n_turns').alias('n_turns'),
        F.max('n_tool_calls').alias('n_tool_calls'),
        F.max('max_turn_idx').alias('max_turn_idx'),
    )

    expected = t.groupBy('conv_id').agg(
        F.count('*').alias('n_turns'),
        F.count('tool').alias('n_tool_calls'),
        F.max('turn_idx').alias('max_turn_idx'),
    )
    diff = latest.exceptAll(expected).count() + expected.exceptAll(latest).count()
    assert diff == 0, 'accumulated streaming state must equal the batch aggregate'
    assert latest.count() == t.select('conv_id').distinct().count()
