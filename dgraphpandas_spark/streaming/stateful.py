"""Custom stateful streaming operator: incremental per-conversation session
aggregates via ``applyInPandasWithState``.

The reference has no streaming at all (SURVEY §2.9); this is the
Spark-native extension for feeds of transcript turns arriving out of order
across micro-batches: per ``conv_id`` we keep running state
``(n_turns, n_tool_calls, first_ts, last_ts)`` and emit the updated session
row each time a batch touches the conversation.  Downstream, the session row
becomes incremental conversation-node triples (turn_count etc.) without
re-scanning history — the streaming analogue of ``conversation_nodes``.

Scale notes:
- state is keyed by conv_id → partitioned by the same key as every other
  conversation-level operation; hot conversations cost O(batch rows), state
  itself is O(1) per conversation;
- Arrow-batched pandas per group-batch, never per-row Python
  (BASELINE input_hint);
- checkpointed state survives restarts — combined with
  ``Trigger.AvailableNow`` this gives resumable incremental ELT over
  snapshot feeds (tested: two waves, two separate stream runs, one
  accumulated state).
"""
from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

SESSION_SCHEMA = StructType([
    StructField('conv_id', StringType()),
    StructField('n_turns', LongType()),
    StructField('n_tool_calls', LongType()),
    StructField('first_ts', LongType()),   # epoch micros
    StructField('last_ts', LongType()),
    StructField('max_turn_idx', IntegerType()),
])

STATE_SCHEMA = StructType([
    StructField('n_turns', LongType()),
    StructField('n_tool_calls', LongType()),
    StructField('first_ts', LongType()),
    StructField('last_ts', LongType()),
    StructField('max_turn_idx', IntegerType()),
])


def _update_session(
    key: Tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    n_turns, n_tools, first_ts, last_ts, max_idx = (
        state.get if state.exists else (0, 0, None, None, -1)
    )
    for pdf in pdfs:
        n_turns += len(pdf)
        n_tools += int(pdf['tool'].notna().sum())
        # Drop NaT before the int64 view: NaT.astype('int64') is INT64_MIN,
        # which would permanently corrupt first_ts for the conversation.
        ts = pd.to_datetime(pdf['ts']).dropna().astype('int64') // 1000  # micros
        if len(ts):
            lo, hi = int(ts.min()), int(ts.max())
            first_ts = lo if first_ts is None else min(first_ts, lo)
            last_ts = hi if last_ts is None else max(last_ts, hi)
        if len(pdf):
            max_idx = max(max_idx, int(pdf['turn_idx'].max()))
    state.update((n_turns, n_tools, first_ts, last_ts, max_idx))
    yield pd.DataFrame([{
        'conv_id': key[0],
        'n_turns': n_turns,
        'n_tool_calls': n_tools,
        'first_ts': first_ts,
        'last_ts': last_ts,
        'max_turn_idx': max_idx,
    }])


def conversation_sessions(transcripts_stream: DataFrame) -> DataFrame:
    """Stateful streaming aggregate: one updated session row per touched
    conversation per micro-batch.  Input: streaming DataFrame with the
    transcript schema (conv_id, turn_idx, role, text, tool, ts)."""
    return transcripts_stream.groupBy('conv_id').applyInPandasWithState(
        _update_session,
        outputStructType=SESSION_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode='update',
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
