"""Local stand-in for the driver's correctness gate: run every
``__spark_entry__.queries()`` entry on Spark and its ``oracle_sql()`` twin
on DuckDB at the same sf dir, compare row count, column names, and
order-insensitive stringified values.

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""
from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entry
from dgraphpandas_spark.session import get_spark

TABLES = 'region nation customer supplier part orders lineitem events documents embeddings'.split()


def norm_val(v):
    if v is None:
        return ''
    if isinstance(v, float):
        if math.isnan(v):
            return 'nan'
        return repr(round(v, 6))
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            return repr(round(float(v), 6))
    except Exception:
        pass
    return str(v)


def rows_to_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm_val(r[i]) for i in order) for r in rows)


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
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append((name, f'SPARK ERROR: {e}'))
            print(f'FAIL {name}: spark error {str(e)[:200]}')
            continue
        if name not in oracles:
            print(f'SKIP {name}: rows-only ({len(srows)} rows)')
            continue
        try:
            rel = con.sql(oracles[name])
            ocols = [c.lower() for c in rel.columns]
            orows = rel.fetchall()
        except Exception as e:
            failures.append((name, f'DUCKDB ERROR: {e}'))
            print(f'FAIL {name}: duckdb error {str(e)[:200]}')
            continue
        s_set = rows_to_multiset([c.lower() for c in scols], srows)
        o_set = rows_to_multiset(ocols, orows)
        if sorted(c.lower() for c in scols) != sorted(ocols):
            failures.append((name, f'COLUMNS {scols} vs {rel.columns}'))
            print(f'FAIL {name}: columns {scols} vs {rel.columns}')
        elif len(s_set) != len(o_set):
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
