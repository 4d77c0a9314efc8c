"""Option-parity differential matrix: every config surface from the
reference's tests/strategies/test_vertical.py scenario table (SURVEY §5),
run through BOTH engines, comparing triple sets exactly.

Null objects are dropped on both sides before comparison (the same drop
``generate_upserts`` applies by default), so drop-toggle cases remain
meaningful through the edge-qualification path ('location_nan').
"""
from __future__ import annotations

import pandas as pd
import pytest

from tests.conftest import ref_triples_set, triples_set


def _run_both(spark, columns, rows, config, key, entry='horizontal', pandas_dtypes=None):
    import copy

    from dgraphpandas.strategies.horizontal import horizontal_transform as ref_h
    from dgraphpandas.strategies.vertical import vertical_transform as ref_v

    from dgraphpandas_spark import horizontal_transform as got_h
    from dgraphpandas_spark import vertical_transform as got_v

    pdf = pd.DataFrame(rows, columns=columns)
    if pandas_dtypes:
        pdf = pdf.astype(pandas_dtypes)
    ref_fn = ref_h if entry == 'horizontal' else ref_v
    ref_i, ref_e = ref_fn(pdf.copy(), copy.deepcopy(config), key)

    sdf = spark.createDataFrame(pdf)
    got_fn = got_h if entry == 'horizontal' else got_v
    got_i, got_e = got_fn(sdf, copy.deepcopy(config), key)

    def drop_nulls(s):
        return {t for t in s if t[2] is not None}

    assert drop_nulls(triples_set(got_i)) == ref_triples_set(ref_i), 'intrinsic mismatch'
    assert drop_nulls(triples_set(got_e)) == ref_triples_set(ref_e), 'edges mismatch'


CUSTOMER_COLS = ['customer_id', 'age', 'weight', 'location_id']
CUSTOMER_ROWS = [(1, 23, 90.5, 45), (2, 31, 70.2, 45), (3, 40, 60.0, 32)]


def _files(fc, **top):
    cfg = {'files': {'customer': fc}}
    cfg.update(top)
    return cfg


MATRIX = [
    (
        'defaults_dgraph_type',
        CUSTOMER_COLS,
        CUSTOMER_ROWS,
        _files({'subject_fields': ['customer_id']}),
        {},
    ),
    (
        'type_overrides',
        CUSTOMER_COLS,
        CUSTOMER_ROWS,
        _files({
            'subject_fields': ['customer_id'],
            'type_overrides': {'age': 'int32', 'weight': 'float32', 'location_id': 'int64'},
        }),
        {},
    ),
    (
        'edges_and_id_strip',
        CUSTOMER_COLS,
        CUSTOMER_ROWS,
        _files({'subject_fields': ['customer_id'], 'edge_fields': ['location_id']}),
        {},
    ),
    (
        'strip_id_disabled',
        CUSTOMER_COLS,
        CUSTOMER_ROWS,
        _files(
            {'subject_fields': ['customer_id'], 'edge_fields': ['location_id']},
            strip_id_from_edge_names=False,
        ),
        {},
    ),
    (
        'no_dgraph_type_records',
        CUSTOMER_COLS,
        CUSTOMER_ROWS,
        _files({'subject_fields': ['customer_id']}, add_dgraph_type_records=False),
        {},
    ),
    (
        'custom_key_separator',
        CUSTOMER_COLS,
        CUSTOMER_ROWS,
        _files({'subject_fields': ['customer_id']}, key_separator='#'),
        {},
    ),
    (
        'composite_key',
        ['customer_id', 'order_id', 'value'],
        [(1, 908, 10), (2, 909, 20), (1, 910, 30)],
        {'files': {'order': {'subject_fields': ['customer_id', 'order_id']}}},
        {'key': 'order'},
    ),
    (
        'ignore_fields',
        CUSTOMER_COLS,
        CUSTOMER_ROWS,
        _files({'subject_fields': ['customer_id'], 'ignore_fields': ['weight']}),
        {},
    ),
    (
        'pre_rename',
        CUSTOMER_COLS,
        CUSTOMER_ROWS,
        _files({'subject_fields': ['customer_id'], 'pre_rename': {'age': 'years_old'}}),
        {},
    ),
    (
        'csv_edges',
        ['customer_id', 'orders'],
        [(1, 'o1,o2, o3'), (2, 'o4'), (3, None)],
        _files({
            'subject_fields': ['customer_id'],
            'csv_edges': ['orders'],
            'edge_fields': ['orders'],
        }),
        {},
    ),
    (
        # Python re \s is Unicode-aware (strips NBSP etc.); Java's default
        # is ASCII-only — the scrub must run with (?U) to match the
        # reference on subjects containing unicode whitespace.
        'subject_scrub_unicode_whitespace',
        ['customer_id', 'tag', 'age'],
        [('a\xa0b', 'x', 30), ('c\td', 'y', 31)],
        _files({'subject_fields': ['customer_id']}),
        {},
    ),
    (
        # Fuzz-found: pandas .str.strip() removes ALL Python whitespace
        # (\n\t NBSP...), Spark's trim only ' ' — values like '1 \n' must
        # strip to '1', not survive to the scrub as '1 '.
        'csv_edges_python_whitespace_strip',
        ['customer_id', 'orders'],
        [(1, 'o1 \n,\to2, o3\xa0'), (2, ' o4\t\n')],
        _files({
            'subject_fields': ['customer_id'],
            'csv_edges': ['orders'],
            'edge_fields': ['orders'],
        }),
        {},
    ),
    (
        'csv_edges_custom_sep',
        ['customer_id', 'orders'],
        [(1, 'o1|o2| o3'), (2, 'o4')],
        _files({
            'subject_fields': ['customer_id'],
            'csv_edges': ['orders'],
            'csv_edges_seperator': '|',
            'edge_fields': ['orders'],
        }),
        {},
    ),
    (
        'datetime_date_fields',
        ['customer_id', 'dob'],
        [(1, '2021-04-01'), (2, '1999-12-31'), (3, None)],
        _files({
            'subject_fields': ['customer_id'],
            # explicit [ns] override: the reference's auto-'datetime64'
            # raises under pandas 2.2 (SURVEY §5 landmine)
            'type_overrides': {'dob': 'datetime64[ns]'},
            'date_fields': {'dob': {'format': '%Y-%m-%d'}},
        }),
        {},
    ),
    (
        'illegal_characters',
        ['customer_id', 'bio'],
        [('a b.c', 'quote " here'), ('x%y', 'line\nbreak'), ('ok', 'fine')],
        _files({'subject_fields': ['customer_id']}),
        {},
    ),
    (
        'null_objects_dropped',
        ['customer_id', 'age', 'note'],
        [(1, 23, None), (2, None, 'hi'), (3, 40, 'yo')],
        _files({'subject_fields': ['customer_id']}),
        {'pandas_dtypes': {'age': 'Int64'}},
    ),
    (
        'null_edge_objects_kept',
        ['customer_id', 'location_id'],
        [(1, 'a'), (2, None)],
        _files(
            {'subject_fields': ['customer_id'], 'edge_fields': ['location_id']},
            drop_na_edge_objects=False,
        ),
        {},
    ),
    (
        'override_edge_name',
        ['animal_id', 'habitat_id'],
        [(1, 'forest'), (2, 'sea')],
        _files({
            'subject_fields': ['animal_id'],
            'edge_fields': ['habitat_id'],
            'override_edge_name': {
                'habitat': {'predicate': 'lives_in', 'target_node_type': 'hab'}
            },
        }),
        {'key': 'customer'},
    ),
    (
        'edge_id_convention',
        ['customer_id', 'age', 'location_id', 'store_id'],
        [(1, 23, 45, 7), (2, 31, 46, 8)],
        _files({'subject_fields': ['customer_id'], 'edge_id_convention': True}),
        {},
    ),
    (
        'bool_column',
        ['customer_id', 'active'],
        [(1, True), (2, False)],
        _files({'subject_fields': ['customer_id'], 'type_overrides': {'active': 'bool'}}),
        {},
    ),
]


@pytest.mark.parametrize('name,columns,rows,config,extra', [m for m in MATRIX], ids=[m[0] for m in MATRIX])
def test_matrix_parity(spark, name, columns, rows, config, extra):
    key = extra.get('key', 'customer')
    _run_both(
        spark,
        columns,
        rows,
        config,
        key,
        entry=extra.get('entry', 'horizontal'),
        pandas_dtypes=extra.get('pandas_dtypes'),
    )


def test_vertical_entry_custom_fields(spark):
    """Vertical entry point with custom predicate/object column names
    (reference vertical.py:47-48, test_vertical.py vertical cases)."""
    cols = ['customer_id', 'pred_name', 'obj_value']
    rows = [
        (1, 'age', '23'),
        (1, 'location_id', '45'),
        (2, 'age', '31'),
        (2, 'location_id', '46'),
    ]
    config = {
        'files': {
            'customer': {
                'subject_fields': ['customer_id'],
                'edge_fields': ['location_id'],
                'predicate_field': 'pred_name',
                'object_field': 'obj_value',
                'type_overrides': {'age': 'int32'},
            }
        }
    }
    _run_both(spark, cols, rows, config, 'customer', entry='vertical')


def test_callable_config_resolution(spark):
    """C11 — callables resolved against the frame (vertical_helpers.py:266-281).
    Only the vertical entry supports callables in the reference (its
    horizontal entry calls len() on subject_fields before resolution)."""
    cols = ['customer_id', 'predicate', 'object']
    rows = [(1, 'age', '23'), (1, 'location_id', '45'), (2, 'age', '31')]
    config = {
        'files': {
            'customer': {
                'subject_fields': lambda f: ['customer_id'],
                'edge_fields': lambda f: [
                    c for c in ('location_id',) if len(f.columns) >= 3
                ],
            }
        }
    }
    _run_both(spark, cols, rows, config, 'customer', entry='vertical')


def test_planets_sample_end_to_end(spark):
    """F4 — the reference's real planets sample CSV through both engines
    with its shipped config (samples/planets/dgraphpandas.json)."""
    import copy
    import json

    from dgraphpandas.strategies.horizontal import horizontal_transform as ref_h

    from dgraphpandas_spark import horizontal_transform as got_h

    csv_path = '/root/reference/samples/planets/solar_system.csv'
    with open('/root/reference/samples/planets/dgraphpandas.json') as f:
        config = json.load(f)

    ref_i, ref_e = ref_h(csv_path, copy.deepcopy(config), 'planet')
    got_i, got_e = got_h(csv_path, copy.deepcopy(config), 'planet')

    assert triples_set(got_i) == ref_triples_set(ref_i)
    assert triples_set(got_e) == ref_triples_set(ref_e)
