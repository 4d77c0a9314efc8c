"""Local stand-in for the driver's correctness gate: run every
``__spark_entry__.queries()`` entry on Spark and its ``oracle_sql()`` twin
on DuckDB at the same sf dir, compare row count, column names, and
order-insensitive stringified values.

Round-5 hardening (VERDICT r4 item #2): the r3/r4 gate fetched DuckDB rows
via ``fetchall()`` (HUGEINT -> Python int) and rounded floats to 6 dp, so it
could not see the type-rendering divergence the driver sees (the driver
fetches via pandas/Arrow, where HUGEINT renders as float64 -> ``"1.0"`` vs
Spark's ``"1"``).  This version mirrors the driver:

* DuckDB side fetched via ``rel.fetchdf()`` (pandas), Spark side via
  ``toPandas()`` -- both sides go through the same Arrow/pandas rendering
  the driver uses, so a non-portable oracle output type breaks HERE first.
* Floats are rendered exactly (``repr``), not rounded: every oracle is
  designed to be bit-exact vs Spark (integer micro-unit quantization), so
  any fp divergence is a real defect, not noise.
* Every oracle's DuckDB output type must be in the PORTABLE set (64-bit-or-
  narrower signed ints, DOUBLE, VARCHAR, TIMESTAMP, BOOLEAN, DATE).
  HUGEINT / DECIMAL / FLOAT are rejected outright -- those are exactly the
  types whose pandas rendering diverges from Spark's.

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""
from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

import __spark_entry__ as entry
from dgraphpandas_spark.session import get_spark

TABLES = 'region nation customer supplier part orders lineitem events documents embeddings'.split()

# DuckDB logical types whose pandas (fetchdf) rendering is identical to the
# Spark/Arrow rendering of the matching Spark type.  Anything else (HUGEINT,
# DECIMAL(p,s), FLOAT, unsigned ints, intervals, nested types) renders
# differently on at least one side and MUST be cast in the oracle SQL.
PORTABLE_TYPES = {'BIGINT', 'INTEGER', 'SMALLINT', 'TINYINT', 'DOUBLE',
                  'VARCHAR', 'TIMESTAMP', 'BOOLEAN', 'DATE'}


def nonportable_columns(rel) -> list:
    """(column, type) pairs of a DuckDB relation outside PORTABLE_TYPES."""
    return [(c, str(t)) for c, t in zip(rel.columns, rel.types)
            if str(t) not in PORTABLE_TYPES]


def norm_val(v):
    """Render one pandas scalar exactly as the driver's hash would see it."""
    if v is None:
        return ''
    if isinstance(v, float):
        if math.isnan(v):
            return ''
        return repr(v)
    # numpy scalars -> python (int64 -> int, bool_ -> bool, float64 handled
    # above via .item() below)
    item = getattr(v, 'item', None)
    if item is not None and type(v).__module__ == 'numpy' and getattr(v, 'ndim', 0) == 0:
        return norm_val(v.item())
    if v is pd.NaT:
        return ''
    return str(v)


def df_to_multiset(df: pd.DataFrame) -> list:
    cols = sorted(df.columns, key=lambda c: c.lower())
    out = []
    for row in df[cols].itertuples(index=False, name=None):
        out.append(tuple('' if (x is None or (isinstance(x, float) and math.isnan(x)))
                         else norm_val(x) for x in row))
    return sorted(out)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.01'
    only = set(sys.argv[2:])

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    spark = get_spark(app_name='check-oracles', master='local[8]', shuffle_partitions=8)
    qs = entry.queries()
    oracles = entry.oracle_sql()

    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            spdf = sdf.toPandas()
        except Exception as e:
            failures.append((name, f'SPARK ERROR: {e}'))
            print(f'FAIL {name}: spark error {str(e)[:200]}')
            continue
        if name not in oracles:
            print(f'SKIP {name}: rows-only ({len(spdf)} rows)')
            continue
        try:
            rel = con.sql(oracles[name])
            bad_types = nonportable_columns(rel)
            if bad_types:
                failures.append((name, f'NONPORTABLE TYPES {bad_types}'))
                print(f'FAIL {name}: non-portable oracle output types {bad_types}')
                continue
            ocols = [c.lower() for c in rel.columns]
            odf = rel.fetchdf()
            odf.columns = ocols
        except Exception as e:
            failures.append((name, f'DUCKDB ERROR: {e}'))
            print(f'FAIL {name}: duckdb error {str(e)[:200]}')
            continue
        spdf.columns = [c.lower() for c in spdf.columns]
        if sorted(spdf.columns) != sorted(ocols):
            failures.append((name, f'COLUMNS {list(spdf.columns)} vs {ocols}'))
            print(f'FAIL {name}: columns {list(spdf.columns)} vs {ocols}')
            continue
        s_set = df_to_multiset(spdf)
        o_set = df_to_multiset(odf)
        if len(s_set) != len(o_set):
            failures.append((name, f'ROWCOUNT {len(s_set)} vs {len(o_set)}'))
            print(f'FAIL {name}: rowcount {len(s_set)} vs {len(o_set)}')
        elif s_set != o_set:
            diff_a = [x for x in s_set if x not in set(o_set)][:3]
            diff_b = [x for x in o_set if x not in set(s_set)][:3]
            failures.append((name, f'VALUES spark-only={diff_a} oracle-only={diff_b}'))
            print(f'FAIL {name}: values spark-only={diff_a} oracle-only={diff_b}')
        else:
            print(f'OK   {name}: {len(s_set)} rows')

    spark.stop()
    print(f'\n{len(failures)} failures')
    sys.exit(1 if failures else 0)


if __name__ == '__main__':
    main()
