"""Event-sequence analytics: ordered funnels and cohort retention.

Engine additions beyond the reference (which has no event-log analytics):
the two queries every interaction log answers — "how many users completed
signup → click → purchase IN ORDER" and "of the users who first appeared
in week W, how many returned in week W+k" — expressed as pure
aggregations so they hold at 10^12-event scale.
"""
from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel(
    df: DataFrame,
    steps: Sequence[str],
    key_col: str = 'user_id',
    type_col: str = 'event_type',
    ts_col: str = 'ts',
) -> DataFrame:
    """Ordered-funnel conversion: a key reaches step k iff its FIRST
    occurrence of each step is strictly later than the first occurrence
    of the previous step (the standard first-touch funnel).  Returns one
    row per step: DataFrame[step_idx, step, n_users].

    Plan shape: ONE hash aggregate per key computing min(ts) FILTER
    (step) for every step (map-side partial — each executor reduces its
    events to one row per key before the single exchange), then a tiny
    conditional rollup.  No self-joins, no window sorts — at 10^12
    events this is one pass over the log.  n_steps is a constant, so the
    aggregate is n_steps conditional mins wide.
    """
    firsts = df.groupBy(key_col).agg(
        *[
            F.min(F.when(F.col(type_col) == s, F.col(ts_col))).alias(f'__t{i}')
            for i, s in enumerate(steps)
        ]
    )
    flags = []
    for i in range(len(steps)):
        cond = F.col(f'__t{i}').isNotNull()
        if i > 0:
            cond = cond & (F.col(f'__t{i}') > F.col(f'__t{i - 1}')) & flags[i - 1]
        flags.append(cond)
    # reshape the ONE aggregated row via unpivot, never a union of
    # per-step selects — Spark shares no plan subtrees across union
    # branches, so that variant scans the log once PER STEP (PLANS.md §5t)
    agg = firsts.agg(
        *[F.count(F.when(flags[i], 1)).alias(str(i)) for i in range(len(steps))]
    )
    un = agg.unpivot([], agg.columns, '__i', 'n_users')
    idx = F.col('__i').cast('int')
    step_name = F.array(*[F.lit(s) for s in steps])[idx]
    return un.select(idx.alias('step_idx'), step_name.alias('step'), 'n_users')


def retention(
    df: DataFrame,
    key_col: str = 'user_id',
    ts_col: str = 'ts',
    period: str = 'week',
) -> DataFrame:
    """Cohort retention: keys are cohorted by the period of their FIRST
    event; each (cohort, offset) cell counts distinct keys active
    ``offset`` periods after their cohort period.  Returns
    DataFrame[cohort_start, offset, n_active].

    Plan shape: first-seen is one key aggregate (map-side partial); the
    cohort assignment joins it back to the event stream on the key (the
    first-seen table is one row per key — AQE broadcasts it while it
    fits, else a co-partitioned shuffle join); the cell rollup is a
    count-distinct per (cohort, offset).  All shuffles carry keys and
    two small integers.
    """
    # calendar periods (month/quarter/...) would need months_between, not
    # the fixed day-width offset below — reject them explicitly
    if period not in ('week', 'day'):
        raise ValueError(f"period must be 'week' or 'day', got {period!r}")
    trunc = F.date_trunc(period, F.col(ts_col))
    first = df.groupBy(key_col).agg(F.min(trunc).alias('__cohort'))
    events = df.select(key_col, trunc.alias('__p'))
    period_days = {'week': 7, 'day': 1}[period]
    offset = (
        F.datediff(F.col('__p'), F.col('__cohort')) / period_days
    ).cast('int')
    return (
        events.join(first, key_col)
        .select('__cohort', offset.alias('offset'), key_col)
        .groupBy('__cohort', 'offset')
        .agg(F.count_distinct(key_col).alias('n_active'))
        .select(F.col('__cohort').alias('cohort_start'), 'offset', 'n_active')
    )
