"""Property-based differential fuzz of the as-of join against DuckDB's
NATIVE ASOF JOIN: Hypothesis generates small keyed event sets (duplicate
timestamps across sides, equal-timestamp ties, keys with no matches) and
the union-tag implementation must agree with DuckDB on every draw.

The driver oracle covers one fixed dataset; this covers the semantic
space — backward-inclusive matching, per-key isolation, and NULL
propagation for unmatched rows.
"""
from __future__ import annotations

import datetime as dt
import os

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from dgraphpandas_spark.operators.temporal import asof_join

_EXAMPLES = int(os.environ.get('HYPOTHESIS_MAX_EXAMPLES', '25')) // 2 or 1

_KEY = st.integers(min_value=1, max_value=3)
# coarse second grid → frequent cross-side and equal-ts collisions
_TS = st.integers(min_value=0, max_value=20)


@st.composite
def asof_case(draw):
    left = draw(st.lists(st.tuples(_KEY, _TS), min_size=1, max_size=10))
    right = draw(st.lists(st.tuples(_KEY, _TS), min_size=0, max_size=10))
    # right side must be unique per (key, ts) — the operator's documented
    # precondition (the query layer dedups); enforce in the generator
    right = list({(k, t) for (k, t) in right})
    return left, right


@pytest.fixture(scope='module')
def con():
    return duckdb.connect()


@settings(
    max_examples=_EXAMPLES,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(case=asof_case())
def test_asof_join_matches_duckdb_native(spark, con, case):
    left_rows, right_rows = case
    base = dt.datetime(2024, 1, 1)
    lrows = [
        (i, k, base + dt.timedelta(seconds=t)) for i, (k, t) in enumerate(left_rows)
    ]
    rrows = [
        (k, base + dt.timedelta(seconds=t), float(k * 100 + t))
        for (k, t) in right_rows
    ]
    left = spark.createDataFrame(lrows, 'lid int, k int, ts timestamp')
    right = spark.createDataFrame(
        rrows, 'k int, ts timestamp, x double'
    ) if rrows else spark.createDataFrame([], 'k int, ts timestamp, x double')

    got = {
        r['lid']: (r['ts_right'], r['x_right'])
        for r in asof_join(left, right, on='k', left_ts='ts', right_cols=['x']).collect()
    }

    con.execute('DROP TABLE IF EXISTS l; DROP TABLE IF EXISTS r')
    con.execute('CREATE TABLE l(lid INT, k INT, ts TIMESTAMP)')
    con.executemany('INSERT INTO l VALUES (?, ?, ?)', lrows)
    con.execute('CREATE TABLE r(k INT, ts TIMESTAMP, x DOUBLE)')
    if rrows:
        con.executemany('INSERT INTO r VALUES (?, ?, ?)', rrows)
    want = {
        lid: (rts, x)
        for lid, rts, x in con.execute(
            'SELECT l.lid, r.ts, r.x FROM l ASOF LEFT JOIN r '
            'ON l.k = r.k AND l.ts >= r.ts'
        ).fetchall()
    }
    assert got == want


@st.composite
def ewma_case(draw):
    n = draw(st.integers(min_value=1, max_value=12))
    rows = []
    for i in range(n):
        k = draw(_KEY)
        t = draw(_TS)
        # values with awkward binary fractions — stress the quantized fold
        v = draw(st.floats(min_value=0.001, max_value=500.0,
                           allow_nan=False, allow_infinity=False, width=64))
        rows.append((k, t, i, v))
    return rows


@settings(
    max_examples=_EXAMPLES,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(rows=ewma_case())
def test_ewma_bit_exact_vs_duckdb_list_reduce(spark, con, rows):
    """The quantized EWMA fold must produce BIT-IDENTICAL doubles to
    DuckDB's list_reduce with the same lambda on arbitrary inputs — the
    floor-half-up step quantization is what makes this hold."""
    from dgraphpandas_spark.operators.temporal import ewma

    base = dt.datetime(2024, 1, 1)
    srows = [(k, base + dt.timedelta(seconds=t), seq, v) for (k, t, seq, v) in rows]
    df = spark.createDataFrame(srows, 'k int, ts timestamp, seq int, v double')
    got = {
        r['k']: (r['n_events'], r['ewma'])
        for r in ewma(df, key_col='k', ts_col='ts', value_col='v', tiebreak_col='seq').collect()
    }

    con.execute('DROP TABLE IF EXISTS ew')
    con.execute('CREATE TABLE ew(k INT, ts TIMESTAMP, seq INT, v DOUBLE)')
    con.executemany('INSERT INTO ew VALUES (?, ?, ?, ?)', srows)
    want = {
        k: (n, e)
        for k, n, e in con.execute(
            'WITH l AS (SELECT k, list(v ORDER BY ts, seq) AS vs, count(*) AS n FROM ew GROUP BY 1) '
            'SELECT k, n, floor(list_reduce(vs, (acc, x) -> '
            'floor((0.125 * x + 0.875 * acc) * 1000000 + 0.5) / 1000000'
            ') * 1000000 + 0.5) / 1000000 FROM l'
        ).fetchall()
    }
    assert got == want  # exact float equality — no tolerance


@settings(
    max_examples=_EXAMPLES,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(case=asof_case())
def test_rolling_range_matches_duckdb(spark, con, case):
    """Integer-microsecond RANGE frames must agree with DuckDB's numeric
    RANGE on arbitrary timestamp collisions (window = 5 s)."""
    from pyspark.sql import functions as F

    from dgraphpandas_spark.operators.temporal import rolling_agg

    rows, _ = case
    base = dt.datetime(2024, 1, 1)
    srows = [(k, base + dt.timedelta(seconds=t), i) for i, (k, t) in enumerate(rows)]
    df = spark.createDataFrame(srows, 'k int, ts timestamp, rid int')
    got = sorted(
        (r['rid'], r['n'])
        for r in rolling_agg(df, 'k', 'ts', 5, {'n': F.count(F.lit(1))}).collect()
    )
    con.execute('DROP TABLE IF EXISTS rl')
    con.execute('CREATE TABLE rl(k INT, ts TIMESTAMP, rid INT)')
    con.executemany('INSERT INTO rl VALUES (?, ?, ?)', srows)
    want = sorted(
        tuple(r)
        for r in con.execute(
            'SELECT rid, count(*) OVER (PARTITION BY k ORDER BY epoch_us(ts) '
            'RANGE BETWEEN 5000000 PRECEDING AND CURRENT ROW) FROM rl'
        ).fetchall()
    )
    assert got == want
