"""Pin the oracle type-portability rule (VERDICT r4 item #2).

The driver compares Spark vs DuckDB results after a pandas/Arrow fetch, so
any DuckDB output type whose pandas rendering diverges from Spark's
(HUGEINT -> float64 "1.0" vs Spark "1", DECIMAL, FLOAT, ...) produces a
hash mismatch even when the values are identical.  That exact defect hid in
``corpus_pack`` / ``events_rolling`` for two rounds (r3 + r4 driver-RED).

This test runs every ``oracle_sql()`` entry through DuckDB at sf0.001 and
asserts every output column's logical type is in the PORTABLE set.  It is
Spark-free and fast (~seconds), so a non-portable oracle can never again
survive to the driver.
"""
from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry
from tools.check_oracles import PORTABLE_TYPES, nonportable_columns

SF_DIR = os.environ.get('SPARK_GRAFT_TEST_SF', '/root/testdata/sf0.001')
TABLES = 'region nation customer supplier part orders lineitem events documents embeddings'.split()


@pytest.fixture(scope='module')
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return c


def test_every_oracle_output_type_is_portable(con):
    oracles = entry.oracle_sql()
    assert len(oracles) >= 90  # guard against accidental truncation
    offenders = {}
    for name, sql in oracles.items():
        rel = con.sql(sql)
        bad = nonportable_columns(rel)
        if bad:
            offenders[name] = bad
    assert not offenders, (
        f'oracles with non-portable DuckDB output types (cast them, e.g. '
        f'CAST(... AS BIGINT)): {offenders}')


def test_hugeint_is_rejected(con):
    """The gate itself must flag a windowed sum-of-BIGINT (HUGEINT)."""
    rel = con.sql('SELECT sum(CAST(1 AS BIGINT)) OVER () AS s FROM region')
    assert nonportable_columns(rel) == [('s', 'HUGEINT')]
    assert 'HUGEINT' not in PORTABLE_TYPES
