"""Ordered funnel + cohort retention (operators/funnels.py) on crafted
event logs where conversion and cohort membership are known."""
from __future__ import annotations

import datetime as dt

from dgraphpandas_spark.operators.funnels import funnel, retention

TS = dt.datetime


def _ev(spark, rows):
    return spark.createDataFrame(rows, 'user_id int, event_type string, ts timestamp')


def test_funnel_strict_ordering(spark):
    rows = [
        # u1 completes all three in order
        (1, 'signup', TS(2024, 1, 1, 9)), (1, 'click', TS(2024, 1, 1, 10)),
        (1, 'purchase', TS(2024, 1, 1, 11)),
        # u2 purchases BEFORE clicking — drops at step 3
        (2, 'signup', TS(2024, 1, 1, 9)), (2, 'purchase', TS(2024, 1, 1, 10)),
        (2, 'click', TS(2024, 1, 1, 11)),
        # u3 clicks before signup — drops at step 2
        (3, 'click', TS(2024, 1, 1, 8)), (3, 'signup', TS(2024, 1, 1, 9)),
        # u4 never signs up — counted nowhere
        (4, 'click', TS(2024, 1, 1, 9)),
    ]
    got = {r['step']: r['n_users'] for r in funnel(
        _ev(spark, rows), steps=['signup', 'click', 'purchase']).collect()}
    assert got == {'signup': 3, 'click': 2, 'purchase': 1}


def test_funnel_first_touch_semantics(spark):
    # a later re-click cannot rescue an out-of-order FIRST click
    rows = [
        (1, 'signup', TS(2024, 1, 1, 9)),
        (1, 'click', TS(2024, 1, 1, 8)),    # first click before signup
        (1, 'click', TS(2024, 1, 1, 10)),   # second click after — ignored
    ]
    got = {r['step']: r['n_users'] for r in funnel(
        _ev(spark, rows), steps=['signup', 'click']).collect()}
    assert got == {'signup': 1, 'click': 0}


def test_retention_cohorts_and_offsets(spark):
    rows = [
        # u1: first in week of Jan 1 (Mon), returns 1 and 2 weeks later
        (1, 'view', TS(2024, 1, 2)), (1, 'view', TS(2024, 1, 9)), (1, 'view', TS(2024, 1, 16)),
        # u2: same cohort, never returns
        (2, 'view', TS(2024, 1, 3)),
        # u3: next-week cohort, returns once
        (3, 'view', TS(2024, 1, 10)), (3, 'view', TS(2024, 1, 17)),
    ]
    got = {
        (r['cohort_start'].date(), r['offset']): r['n_active']
        for r in retention(_ev(spark, rows), period='week').collect()
    }
    w1, w2 = dt.date(2024, 1, 1), dt.date(2024, 1, 8)
    assert got == {
        (w1, 0): 2, (w1, 1): 1, (w1, 2): 1,
        (w2, 0): 1, (w2, 1): 1,
    }


def test_retention_rejects_calendar_periods(spark):
    """ADVICE r3: 'month' would silently break the fixed day-width offset
    math — reject anything but week/day explicitly."""
    import pytest

    with pytest.raises(ValueError, match="'week' or 'day'"):
        retention(_ev(spark, [(1, 'view', TS(2024, 1, 2))]), period='month')


def test_funnel_plan_scans_input_once(spark):
    """The step reshape must be unpivot over the single aggregated row —
    a union of per-step selects scans the log once per step."""
    import __spark_entry__ as E

    df = E.queries()['events_funnel'](spark, '/root/testdata/sf0.001')
    tree = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString('formatted')
    ).split('\n\n')[0]
    assert tree.count('Scan parquet') == 1, tree
