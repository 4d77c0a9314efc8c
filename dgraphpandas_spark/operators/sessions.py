"""Batch sessionization: gap-based session assignment over an event log
(engine addition — the batch counterpart of ``streaming/stateful.py``'s
``applyInPandasWithState`` sessions, for backfills and reprocessing).

The reference has no event-log operators; this family exists because a
KG-construction pipeline over transcripts/events needs session boundaries
before it can emit per-conversation edges (see
``operators/canonicalize.py`` conversation handling).

Semantics: events of one key are ordered by (ts, *tie_break); a new
session starts when the gap to the previous event exceeds ``gap``
seconds.  ``session_idx`` is the 1-based running count of session starts
— a pure function of the input, identical to what the streaming stateful
operator assigns batch-by-batch.

Physical shape (pinned in tests/test_plan_evidence.py): ONE hash
exchange on the key, then both window functions (lag + running sum)
share the single per-key sort — Catalyst collapses same-spec windows
into one Window node, so the whole operator is scan → exchange → sort →
window → project.  State per task is O(1) per key (running counters),
so a 1000-executor run is bounded by the largest single key's event
count — the same bound the streaming version has, and the reason the
key should be a conversation/user id rather than e.g. a tenant id.
"""
from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    key_col: str = 'user_id',
    ts_col: str = 'ts',
    gap: int = 1800,
    tie_break: Sequence[str] = ('event_id',),
) -> DataFrame:
    """Add ``session_idx`` (1-based per key) to an event DataFrame.

    ``tie_break`` columns make the within-key order total when
    timestamps collide — without a total order the boundary assignment
    would be nondeterministic across runs/engines.
    """
    order = [F.col(ts_col).asc(), *[F.col(c).asc() for c in tie_break]]
    w = Window.partitionBy(key_col).orderBy(*order)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev = F.lag(F.col(ts_col)).over(w)
    # integer epoch-seconds diff on both engines (DuckDB: epoch(ts));
    # unix_timestamp truncates sub-second parts identically to epoch()'s
    # floor for non-negative timestamps
    gap_s = F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(prev)
    is_start = F.when(prev.isNull() | (gap_s > gap), F.lit(1)).otherwise(F.lit(0))
    return df.withColumn('session_idx', F.sum(is_start).over(run))


def session_stats(
    df: DataFrame,
    key_col: str = 'user_id',
    ts_col: str = 'ts',
    gap: int = 1800,
    tie_break: Sequence[str] = ('event_id',),
) -> DataFrame:
    """Per-session rollup: (key, session_idx) → event count, start/end
    epoch seconds, duration.  The aggregate reuses the sessionize
    exchange (groupBy key is a prefix of the window partitioning, so AQE
    plans no second shuffle of the full data — the partial aggregate
    runs map-side on the window output)."""
    s = sessionize(df, key_col, ts_col, gap, tie_break)
    return s.groupBy(key_col, 'session_idx').agg(
        F.count('*').alias('n_events'),
        F.min(F.unix_timestamp(F.col(ts_col))).alias('start_s'),
        F.max(F.unix_timestamp(F.col(ts_col))).alias('end_s'),
        (
            F.max(F.unix_timestamp(F.col(ts_col)))
            - F.min(F.unix_timestamp(F.col(ts_col)))
        ).alias('duration_s'),
    )
