"""Shared fixtures: one local SparkSession per test session, and the
reference library (the oracle) importable from /root/reference.

The reference's own pytest suite cannot run here (no ``parameterized``
package, no network — BASELINE.md), so the oracle is the reference *library*
imported directly: we push the same rows through
``horizontal_transform``/``vertical_transform``/``generate_upserts`` on both
engines and compare triple sets (SURVEY.md §5 test plan).
"""
from __future__ import annotations

import sys

import pytest

REFERENCE_PATH = '/root/reference'
if REFERENCE_PATH not in sys.path:
    sys.path.insert(0, REFERENCE_PATH)


@pytest.fixture(scope='session')
def spark():
    from dgraphpandas_spark.session import get_spark

    s = get_spark(app_name='dgraphpandas-spark-tests', master='local[4]', shuffle_partitions=4)
    yield s
    s.stop()


def triples_set(df):
    """Spark triple frame → set of (subject, predicate, object, type) tuples."""
    return {
        (r['subject'], r['predicate'], r['object'], r['type'])
        for r in df.collect()
    }


def ref_triples_set(pdf):
    """Reference (pandas) triple frame → comparable set; values are
    stringified with the same late-render the reference applies in
    generate_upserts (str()/isoformat), NA objects dropped the way
    generate_upserts does by default.
    """
    import pandas as pd

    out = set()
    for _, row in pdf.iterrows():
        obj = row['object']
        if pd.isna(obj):
            continue
        # generate_upserts does astype(str) — declared dateTime rows are
        # already isoformat strings by then (vertical_helpers.py:158);
        # undeclared timestamps stringify in pandas' space form.
        obj = str(obj)
        typ = row['type']
        typ = None if (typ is None or (isinstance(typ, float) and pd.isna(typ))) else str(typ)
        out.add((str(row['subject']), str(row['predicate']), obj, typ))
    return out
