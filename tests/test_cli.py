"""CLI parity tests (reference EP1/EP3, __main__.py:17-84).

Drives ``python -m dgraphpandas_spark`` main() in-process against the
session SparkSession: upserts mode on a small CSV (gzip N-Quad export +
debug CSV export), schema/types modes (pure config→text).
"""
from __future__ import annotations

import glob
import gzip
import json
import os

import pytest

from dgraphpandas_spark.__main__ import main

CONFIG = {
    'transform': 'horizontal',
    'files': {
        'customer': {
            'subject_fields': ['customer_id'],
            'edge_fields': ['location_id'],
            'type_overrides': {'age': 'int32'},
        }
    },
}


@pytest.fixture()
def workdir(tmp_path, spark):
    csv = tmp_path / 'customer.csv'
    csv.write_text(
        'customer_id,age,location_id\n'
        '1,23,32\n'
        '2,41,11\n'
    )
    cfg = tmp_path / 'config.json'
    cfg.write_text(json.dumps(CONFIG))
    out = tmp_path / 'out'
    out.mkdir()
    return tmp_path


def _read_gz_lines(base: str):
    lines = []
    for part in sorted(glob.glob(os.path.join(base, 'part-*'))):
        with gzip.open(part, 'rt') as f:
            lines.extend(l for l in f.read().splitlines() if l)
    return lines


def test_cli_upserts(workdir, spark):
    out = str(workdir / 'out')
    main(['-x', 'upserts',
          '-f', str(workdir / 'customer.csv'),
          '-c', str(workdir / 'config.json'),
          '-ck', 'customer',
          '-o', out,
          '--export_csv'])

    intrinsic = _read_gz_lines(os.path.join(out, 'customer_intrinsic.gz'))
    edges = _read_gz_lines(os.path.join(out, 'customer_edges.gz'))

    assert '<customer_1> <age> "23"^^<xs:int> .' in intrinsic
    assert '<customer_1> <dgraph.type> "customer"^^<xs:string> .' in intrinsic
    # '_id' stripped from edge predicate; object qualified with predicate
    assert '<customer_1> <location> <location_32> .' in edges
    assert len(edges) == 2
    # debug CSV export also present
    assert glob.glob(os.path.join(out, 'customer_intrinsic.csv', 'part-*'))


def test_cli_reference_layout_emits_empty_edges_gz(workdir, spark):
    """End-to-end pin of the ADVICE r3 fix: an ALL-INTRINSIC config (no
    edge_fields) run with --reference_layout must still emit a readable
    (empty) <src>_edges.gz single file — the reference always writes one
    gz per frame (rdf.py:111-116) and downstream globs expect it."""
    cfg = {
        'transform': 'horizontal',
        'files': {
            'customer': {
                'subject_fields': ['customer_id'],
                'type_overrides': {'age': 'int32'},
            }
        },
    }
    cfg_path = workdir / 'config_intrinsic_only.json'
    cfg_path.write_text(json.dumps(cfg))
    out = str(workdir / 'out')
    main(['-x', 'upserts',
          '-f', str(workdir / 'customer.csv'),
          '-c', str(cfg_path),
          '-ck', 'customer',
          '-o', out,
          '--reference_layout'])

    edges_gz = os.path.join(out, 'customer_edges.gz')
    assert os.path.isfile(edges_gz), 'edges gz must exist as a FILE (not dir)'
    with gzip.open(edges_gz, 'rt') as f:
        assert f.read() == ''                      # valid empty gzip member
    intrinsic_gz = os.path.join(out, 'customer_intrinsic.gz')
    assert os.path.isfile(intrinsic_gz)
    with gzip.open(intrinsic_gz, 'rt') as f:
        lines = [l for l in f.read().splitlines() if l]
    assert '<customer_1> <age> "23"^^<xs:int> .' in lines


def test_cli_boolean_override_works(workdir, spark):
    """The reference's wart (value-is-not-False filter) made
    ``--add_dgraph_type_records False`` a no-op; ours must honor it."""
    out = str(workdir / 'out')
    main(['-x', 'upserts',
          '-f', str(workdir / 'customer.csv'),
          '-c', str(workdir / 'config.json'),
          '-ck', 'customer',
          '-o', out,
          '--add_dgraph_type_records', 'False'])
    intrinsic = _read_gz_lines(os.path.join(out, 'customer_intrinsic.gz'))
    assert not any('<dgraph.type>' in l for l in intrinsic)
    assert any('<age>' in l for l in intrinsic)


def test_cli_schema_and_types(workdir):
    out = str(workdir / 'out')
    main(['-x', 'schema', '-c', str(workdir / 'config.json'), '-o', out])
    schema = (workdir / 'out' / 'schema.txt').read_text().splitlines()
    assert 'age: int .' in schema
    assert 'location: uid .' in schema
    assert 'xid: string @index(exact) .' in schema

    main(['-x', 'types', '-c', str(workdir / 'config.json'), '-o', out])
    types_txt = (workdir / 'out' / 'types.txt').read_text()
    assert types_txt.startswith('type customer {')
