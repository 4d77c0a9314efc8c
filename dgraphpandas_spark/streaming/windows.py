"""Event-time windowed aggregation with watermarks (late-data handling).

Reference has no streaming (SURVEY §2.9); this covers the windowed-agg /
watermark surface for transcript feeds: per-window per-tool invocation
counts with a bounded-lateness watermark.  In append mode a window is
emitted exactly once — when the watermark (max event time − lateness)
passes its end — and events arriving later than the watermark are dropped
by Spark's state store, which is what bounds state size at 10^12-turn
scale: state = open windows only, not history.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tool_call_windows(
    transcripts_stream: DataFrame,
    window_duration: str = '1 minute',
    lateness: str = '2 minutes',
) -> DataFrame:
    """Tool invocations per (event-time window, tool), watermarked.

    Append-mode semantics: each (window, tool) row is final when emitted;
    turns later than ``lateness`` behind the max seen ``ts`` are dropped.
    """
    return (
        transcripts_stream
        .withWatermark('ts', lateness)
        .filter(F.col('tool').isNotNull())
        .groupBy(F.window('ts', window_duration).alias('w'), 'tool')
        .agg(F.count('*').alias('n_calls'))
        .select(
            F.col('w.start').alias('window_start'),
            F.col('w.end').alias('window_end'),
            'tool',
            'n_calls',
        )
    )


def windowed_counts(
    stream: DataFrame,
    ts_col: str,
    key_col: str,
    window_duration: str = '1 day',
    lateness: str = '1 hour',
) -> DataFrame:
    """Generic watermarked per-(window, key) count — the windowed-agg
    pattern over any event-time keyed stream.

    Append-mode + ``Trigger.AvailableNow`` on a finite source is
    DETERMINISTIC: Spark's final no-data micro-batch advances the watermark
    to ``max(ts) − lateness`` and emits exactly the windows whose end ≤ that
    watermark — so the emitted set equals a batch GROUP BY restricted to
    closed windows, which is how the DuckDB oracle mirrors it
    (``__spark_entry__.oracle_sql()['stream_event_windows']``).
    """
    return (
        stream.withWatermark(ts_col, lateness)
        .groupBy(F.window(ts_col, window_duration).alias('w'), key_col)
        .agg(F.count('*').alias('n_events'))
        .select(
            F.col('w.start').alias('window_start'),
            F.col('w.end').alias('window_end'),
            key_col,
            'n_events',
        )
    )
