"""Temporal operators: as-of join, rolling event-time aggregation, SCD2
history (operators/temporal.py) — semantics pinned on crafted frames where
every edge case (equal-timestamp match, no-prior-row, tolerance expiry,
range-frame boundary, same-ts last-writer dedup) is present by
construction, plus the approx-percentile scale-path error bound."""
from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from dgraphpandas_spark.operators.temporal import asof_join, rolling_agg, scd2_history

TS = dt.datetime


def _events(spark):
    rows = [
        # (key, ts, side payload)
        (1, TS(2024, 1, 1, 9, 0, 0), 'L1'),
        (1, TS(2024, 1, 1, 10, 0, 0), 'L2'),   # equal-ts right row exists
        (1, TS(2024, 1, 1, 12, 0, 0), 'L3'),
        (2, TS(2024, 1, 1, 8, 0, 0), 'L4'),    # no prior right row
    ]
    left = spark.createDataFrame(rows, 'k int, ts timestamp, tag string')
    rrows = [
        (1, TS(2024, 1, 1, 9, 30, 0), 10.0),
        (1, TS(2024, 1, 1, 10, 0, 0), 20.0),   # ties L2 exactly
        (2, TS(2024, 1, 1, 9, 0, 0), 30.0),    # after L4 — must not match
    ]
    right = spark.createDataFrame(rrows, 'k int, ts timestamp, x double')
    return left, right


def test_asof_backward_inclusive_and_null(spark):
    left, right = _events(spark)
    out = {
        r['tag']: (r['ts_right'], r['x_right'])
        for r in asof_join(left, right, on='k', left_ts='ts', right_cols=['x']).collect()
    }
    assert out['L1'] == (None, None)                      # right rows all later
    assert out['L2'] == (TS(2024, 1, 1, 10, 0, 0), 20.0)  # equal ts matches (inclusive)
    assert out['L3'] == (TS(2024, 1, 1, 10, 0, 0), 20.0)  # latest prior, not first
    assert out['L4'] == (None, None)                      # no prior row for key 2


def test_asof_tolerance_voids_stale_match(spark):
    left, right = _events(spark)
    out = {
        r['tag']: r['x_right']
        for r in asof_join(
            left, right, on='k', left_ts='ts', right_cols=['x'], tolerance_s=3600
        ).collect()
    }
    assert out['L2'] == 20.0   # 0 s gap — inside tolerance
    assert out['L3'] is None   # 2 h gap — voided
    assert out['L1'] is None and out['L4'] is None


def test_rolling_range_boundary_inclusive(spark):
    rows = [
        (1, TS(2024, 1, 1, 9, 0, 0), 1.0),
        (1, TS(2024, 1, 1, 10, 0, 0), 2.0),   # exactly 3600 s after the first
        (1, TS(2024, 1, 1, 10, 0, 1), 4.0),   # first row now 3601 s old — evicted
        (2, TS(2024, 1, 1, 10, 0, 0), 8.0),
    ]
    df = spark.createDataFrame(rows, 'k int, ts timestamp, v double')
    out = rolling_agg(
        df, key_col='k', ts_col='ts', window_s=3600,
        aggs={'n': F.count(F.lit(1)), 's': F.sum('v')},
    )
    got = {(r['k'], r['ts']): (r['n'], r['s']) for r in out.collect()}
    assert got[(1, TS(2024, 1, 1, 10, 0, 0))] == (2, 3.0)   # boundary row included
    assert got[(1, TS(2024, 1, 1, 10, 0, 1))] == (2, 6.0)   # boundary row evicted
    assert got[(2, TS(2024, 1, 1, 10, 0, 0))] == (1, 8.0)   # keys isolated


def test_scd2_collapses_runs_and_dedups_last_writer(spark):
    rows = [
        # key 1: A A B A — runs A[1..3) B[3..4) A[4..)
        (1, TS(2024, 1, 1), 'A', 100),
        (1, TS(2024, 1, 2), 'A', 101),
        (1, TS(2024, 1, 3), 'B', 102),
        (1, TS(2024, 1, 4), 'A', 103),
        # key 2, same-ts tie: seq 201 wins (last writer)
        (2, TS(2024, 1, 1), 'X', 200),
        (2, TS(2024, 1, 1), 'Y', 201),
    ]
    df = spark.createDataFrame(rows, 'k int, ts timestamp, v string, seq int')
    hist = scd2_history(df, key_cols=['k'], ts_col='ts', value_col='v', tiebreak_cols=['seq'])
    got = sorted(
        (r['k'], r['v'], r['valid_from'], r['valid_to']) for r in hist.collect()
    )
    assert got == [
        (1, 'A', TS(2024, 1, 1), TS(2024, 1, 3)),
        (1, 'A', TS(2024, 1, 4), None),
        (1, 'B', TS(2024, 1, 3), TS(2024, 1, 4)),
        (2, 'Y', TS(2024, 1, 1), None),
    ]


def test_ewma_closed_form_and_ordering(spark):
    """EWMA recurrence with the quantized fold — hand-computed expectation,
    and the tiebreak column must decide same-timestamp ordering."""
    import math

    from dgraphpandas_spark.operators.temporal import ewma

    q = lambda s: math.floor(s * 1e6 + 0.5) / 1e6
    rows = [
        (1, TS(2024, 1, 1, 0, 0, 0), 1, 1.0),
        (1, TS(2024, 1, 1, 0, 0, 1), 2, 2.0),
        (1, TS(2024, 1, 1, 0, 0, 2), 3, 3.0),
        # key 2: two rows at the SAME ts — seq decides the fold order
        (2, TS(2024, 1, 1), 1, 10.0),
        (2, TS(2024, 1, 1), 2, 20.0),
    ]
    df = spark.createDataFrame(rows, 'k int, ts timestamp, seq int, v double')
    got = {
        r['k']: (r['n_events'], r['ewma'])
        for r in ewma(df, key_col='k', ts_col='ts', value_col='v', tiebreak_col='seq').collect()
    }
    s = 1.0
    s = q(0.125 * 2.0 + 0.875 * s)
    s = q(0.125 * 3.0 + 0.875 * s)
    assert got[1] == (3, q(s))
    assert got[2] == (2, q(q(0.125 * 20.0 + 0.875 * 10.0)))  # 10 first, then 20


def test_ewma_tied_ts_without_tiebreak_is_deterministic(spark):
    """ADVICE r3: with tiebreak_col=None and tied timestamps, the fold must
    not depend on partition arrival order — value_col is always the final
    sort key, so ties fold in ascending value order."""
    import math

    from dgraphpandas_spark.operators.temporal import ewma

    q = lambda s: math.floor(s * 1e6 + 0.5) / 1e6
    rows = [
        (1, TS(2024, 1, 1), 20.0),
        (1, TS(2024, 1, 1), 10.0),  # same ts — must fold 10 then 20
    ]
    expected = q(q(0.125 * 20.0 + 0.875 * 10.0))
    for _ in range(3):  # repartition shuffles arrival order between runs
        df = spark.createDataFrame(rows, 'k int, ts timestamp, v double').repartition(4)
        got = ewma(df, key_col='k', ts_col='ts', value_col='v').collect()[0]
        assert (got['n_events'], got['ewma']) == (2, expected)


def test_approx_count_distinct_scale_path_error_bound(spark):
    """events_cardinality's oracle checks the exact distinct; the 100 TB
    path is approx_count_distinct (HLL++, fixed-size mergeable sketch).
    Pin ≤5% relative error vs exact on the real events table at rsd=0.02
    so swapping it in at scale is a measured trade."""
    ev = spark.read.parquet('/root/testdata/sf0.001/events.parquet')
    row = ev.agg(
        F.count_distinct('user_id').alias('exact'),
        F.approx_count_distinct('user_id', 0.02).alias('approx'),
    ).collect()[0]
    assert row['approx'] == pytest.approx(row['exact'], rel=0.05)


def test_approx_percentile_scale_path_error_bound(spark):
    """events_quantiles' oracle uses exact percentile; the documented
    100 TB path is approx_percentile (mergeable sketch).  Pin that the
    sketch at accuracy=10000 stays within 1% relative error of exact on
    the real events table, so swapping it in is a measured trade."""
    ev = spark.read.parquet('/root/testdata/sf0.001/events.parquet')
    row = ev.select(
        F.expr('percentile(value, array(0.25D, 0.5D, 0.75D))').alias('exact'),
        F.expr('approx_percentile(value, array(0.25D, 0.5D, 0.75D), 10000)').alias('approx'),
    ).collect()[0]
    for e, a in zip(row['exact'], row['approx']):
        assert a == pytest.approx(e, rel=0.01)
