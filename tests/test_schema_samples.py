"""Differential schema/types generation tests on the reference's OWN sample
configs (pokemon = 16 tables with pre_rename/override_edge_name/options/
Int64 overrides; netflix = csv_edges + list_edges) — config-only fixtures,
no sample data needed (the samples' data requires downloads, absent here).

Oracle: `create_schema`/`generate_schema` imported from /root/reference.
`generate_types` CANNOT run as oracle under installed pandas 2.2 — its
`frame.groupby(by=['table'])` iteration yields 1-tuple keys under pandas 2
and crashes with TypeError (reference writers/types.py:43, a pandas<2
pin casualty) — so the types test checks our blocks against the reference's
*schema frame* semantics instead (member sets per table, @reverse rendering,
reverse-tables-last ordering per reference writers/types.py:51-57).
"""
from __future__ import annotations

import json
import sys

import pytest

from dgraphpandas_spark.writers.schema import create_schema, generate_schema, generate_types

POKEMON = '/root/reference/samples/pokemon/dgraphpandas.json'
NETFLIX = '/root/reference/samples/netflix/dgraphpandas.json'


def _ref_schema(config_path):
    sys.path.insert(0, '/root/reference')
    try:
        from dgraphpandas.strategies.schema import create_schema as ref_create
        from dgraphpandas.writers.schema import generate_schema as ref_gen
    finally:
        sys.path.remove('/root/reference')
    frame = ref_create(json.load(open(config_path)), ensure_xid_predicate=True)
    return frame, ref_gen(frame)


def _norm(v):
    if v is None:
        return None
    try:
        import math

        if isinstance(v, float) and math.isnan(v):
            return None
    except TypeError:
        pass
    return v


@pytest.mark.parametrize('config_path', [POKEMON, NETFLIX], ids=['pokemon', 'netflix'])
def test_create_schema_matches_reference(config_path):
    ref_frame, ref_lines = _ref_schema(config_path)
    ours = create_schema(json.load(open(config_path)), ensure_xid_predicate=True)

    ref_rows = {
        (r.column, r.type, _norm(r.table), _norm(r.options))
        for r in ref_frame.itertuples(index=False)
    }
    our_rows = {(r['column'], r['type'], r['table'], r['options']) for r in ours}
    assert our_rows == ref_rows

    our_lines = set(generate_schema(ours).split('\n'))
    assert our_lines == set(ref_lines.split('\n'))


@pytest.mark.parametrize('config_path', [POKEMON, NETFLIX], ids=['pokemon', 'netflix'])
def test_generate_types_semantics_vs_reference_frame(config_path):
    ref_frame, _ = _ref_schema(config_path)
    ours = create_schema(json.load(open(config_path)), ensure_xid_predicate=True)
    blocks = generate_types(ours)

    # expected member set per table from the reference's schema frame
    expected = {}
    reverse_tables = set()
    for r in ref_frame.itertuples(index=False):
        if _norm(r.table) is None:
            continue
        opts = _norm(r.options)
        name = r.column
        if opts is not None and '@reverse' in opts:
            reverse_tables.add(r.table)
            name = f'<~{name}>'
        expected.setdefault(r.table, set()).add(name)

    assert len(blocks) == len(expected)
    seen_tables = []
    for block in blocks:
        table = block.split('{')[0].replace('type', '', 1).strip()
        seen_tables.append(table)
        body = block.split('{', 1)[1].rsplit('}', 1)[0]
        members = {m.strip() for m in body.split('\n') if m.strip()}
        assert members == expected[table], table

    # @reverse tables must come last (live-loader ordering constraint)
    if reverse_tables:
        first_reverse = min(seen_tables.index(t) for t in seen_tables if t in reverse_tables)
        assert all(t in reverse_tables for t in seen_tables[first_reverse:])


def test_export_csv_name_resolves_from_config(tmp_path):
    """Reference schema.py:47 resolves export_csv_name via config (not
    kwargs-only) — a config carrying a custom name must be honored."""
    cfg = json.load(open(POKEMON))
    cfg['export_csv'] = True
    cfg['export_csv_name'] = 'pre_schema.csv'
    create_schema(cfg, output_dir=str(tmp_path))
    assert (tmp_path / 'pre_schema.csv').exists()
    header = (tmp_path / 'pre_schema.csv').read_text().splitlines()[0]
    assert header == 'column,type,table,options'
