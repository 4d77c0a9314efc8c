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


@st.composite
def scd2_case(draw):
    n = draw(st.integers(min_value=1, max_value=14))
    rows = []
    for i in range(n):
        rows.append((
            draw(_KEY), draw(_TS), i, draw(st.sampled_from(['A', 'B', 'C']))
        ))
    return rows


@settings(
    max_examples=_EXAMPLES,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(rows=scd2_case())
def test_scd2_matches_duckdb_windows(spark, con, rows):
    """SCD2 collapse (same-ts last-writer dedup → run-length change
    detection → interval close) must agree with the window-function SQL
    mirror under same-timestamp ties and repeated values."""
    from dgraphpandas_spark.operators.temporal import scd2_history

    base = dt.datetime(2024, 1, 1)
    srows = [(k, base + dt.timedelta(seconds=t), seq, v) for (k, t, seq, v) in rows]
    df = spark.createDataFrame(srows, 'k int, ts timestamp, seq int, v string')
    got = sorted(
        (r['k'], r['v'], r['valid_from'], r['valid_to'])
        for r in scd2_history(df, ['k'], 'ts', 'v', tiebreak_cols=['seq']).collect()
    )
    con.execute('DROP TABLE IF EXISTS sc')
    con.execute('CREATE TABLE sc(k INT, ts TIMESTAMP, seq INT, v VARCHAR)')
    con.executemany('INSERT INTO sc VALUES (?, ?, ?, ?)', srows)
    want = sorted(
        tuple(r)
        for r in con.execute(
            "WITH ded AS (SELECT k, ts, v FROM sc "
            "  QUALIFY row_number() OVER (PARTITION BY k, ts ORDER BY seq DESC) = 1), "
            "runs AS (SELECT k, ts, v, lag(v) OVER (PARTITION BY k ORDER BY ts) AS prev FROM ded), "
            "chg AS (SELECT k, ts, v FROM runs WHERE prev IS NULL OR prev <> v) "
            "SELECT k, v, ts, lead(ts) OVER (PARTITION BY k ORDER BY ts) FROM chg"
        ).fetchall()
    )
    assert got == want


@st.composite
def funnel_case(draw):
    n = draw(st.integers(min_value=1, max_value=16))
    rows = []
    for i in range(n):
        rows.append((
            draw(_KEY), draw(st.sampled_from(['s1', 's2', 's3', 'x'])), draw(_TS), i
        ))
    return rows


@settings(
    max_examples=_EXAMPLES,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(rows=funnel_case())
def test_funnel_matches_duckdb(spark, con, rows):
    from dgraphpandas_spark.operators.funnels import funnel

    base = dt.datetime(2024, 1, 1)
    srows = [(k, e, base + dt.timedelta(seconds=t)) for (k, e, t, _) in rows]
    df = spark.createDataFrame(srows, 'user_id int, event_type string, ts timestamp')
    got = sorted(
        (r['step_idx'], r['step'], r['n_users'])
        for r in funnel(df, steps=['s1', 's2', 's3']).collect()
    )
    con.execute('DROP TABLE IF EXISTS fn')
    con.execute('CREATE TABLE fn(user_id INT, event_type VARCHAR, ts TIMESTAMP)')
    con.executemany('INSERT INTO fn VALUES (?, ?, ?)', srows)
    want = sorted(
        tuple(r)
        for r in con.execute(
            "WITH firsts AS (SELECT user_id, "
            "  min(ts) FILTER (WHERE event_type = 's1') AS t0, "
            "  min(ts) FILTER (WHERE event_type = 's2') AS t1, "
            "  min(ts) FILTER (WHERE event_type = 's3') AS t2 FROM fn GROUP BY 1), "
            "f AS (SELECT t0 IS NOT NULL AS r0, "
            "  (t1 IS NOT NULL AND t1 > t0 AND t0 IS NOT NULL) AS r1, "
            "  (t2 IS NOT NULL AND t2 > t1 AND t1 IS NOT NULL AND t1 > t0 AND t0 IS NOT NULL) AS r2 "
            "  FROM firsts) "
            "SELECT 0, 's1', count(*) FILTER (WHERE r0) FROM f "
            "UNION ALL SELECT 1, 's2', count(*) FILTER (WHERE r1) FROM f "
            "UNION ALL SELECT 2, 's3', count(*) FILTER (WHERE r2) FROM f"
        ).fetchall()
    )
    assert got == want


@settings(
    max_examples=_EXAMPLES,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(case=asof_case())
def test_retention_matches_duckdb(spark, con, case):
    """Cohort retention vs the SQL mirror under arbitrary first-seen /
    return patterns (days spread across ~3 weeks)."""
    from dgraphpandas_spark.operators.funnels import retention

    rows, _ = case
    base = dt.datetime(2024, 1, 1)   # a Monday — clean week boundaries
    srows = [(k, base + dt.timedelta(days=t)) for (k, t) in rows]
    df = spark.createDataFrame(srows, 'user_id int, ts timestamp')
    # DuckDB date_trunc('week') yields DATE, Spark yields TIMESTAMP —
    # normalize to date (the driver oracle sidesteps this via epoch_us)
    got = sorted(
        (r['cohort_start'].date(), r['offset'], r['n_active'])
        for r in retention(df, period='week').collect()
    )
    con.execute('DROP TABLE IF EXISTS rt')
    con.execute('CREATE TABLE rt(user_id INT, ts TIMESTAMP)')
    con.executemany('INSERT INTO rt VALUES (?, ?)', srows)
    want = sorted(
        tuple(r)
        for r in con.execute(
            "WITH ev AS (SELECT user_id, date_trunc('week', ts) AS p FROM rt), "
            "first AS (SELECT user_id, min(p) AS cohort FROM ev GROUP BY 1) "
            "SELECT f.cohort, CAST(datediff('day', f.cohort, e.p) / 7 AS INT), "
            "count(DISTINCT e.user_id) FROM ev e JOIN first f USING (user_id) GROUP BY 1, 2"
        ).fetchall()
    )
    assert got == want
