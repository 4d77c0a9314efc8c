"""Dgraph schema generation (D1/D2) — config → schema rows → DDL lines.

Parity: /root/reference/dgraphpandas/strategies/schema.py:14-155
(``create_schema``) and writers/schema.py:9-43 (``generate_schema``).
Metadata-scale, pure driver-side Python (SURVEY §2.11): no cluster work is
warranted for a few dozen schema rows.  Row shape matches the reference's
schema frame: ``(column, type, table, options)``.

Behavioral notes preserved faithfully:
- ``_strip_id`` here is *suffix-anchored*, unlike the transform's
  substring-anywhere C6 strip (reference inconsistency, SURVEY §7 hard-list
  item 2).
- edges → ``uid``, list_edges → ``[uid]``; pre_rename remaps column names and
  their types; ``ensure_xid_predicate`` appends
  ``xid: string @index(exact)``.
- sort by (table, type); schema lines deduped preserving first occurrence.
"""
from __future__ import annotations

import json
import os
from typing import Any, Dict, List, Optional, Set, Union

from ..config import get_from_config
from ..types import DEFAULT_DGRAPH_TYPE, find_dgraph_types


def _strip_id(names) -> Set[str]:
    """Suffix-anchored '_id' strip (reference schema.py:14-22)."""
    return {n[:-3] if n.endswith('_id') else n for n in names}


def create_schema(
    source_config: Union[str, Dict[str, Any]], output_dir: str = '.', **kwargs
) -> List[Dict[str, Any]]:
    """Fold config into schema rows [{column,type,table,options}].

    Parity: reference schema.py:25-155 (D1).  Returns a list of dicts rather
    than a pandas frame; ``rows_to_dataframe`` converts for display.
    """
    if not source_config:
        raise ValueError('source_config')
    if isinstance(source_config, str):
        with open(source_config) as f:
            config: Dict[str, Any] = json.load(f)
    else:
        config = source_config

    files: Dict[str, Any] = config['files']
    strip = get_from_config('strip_id_from_edge_names', config, True, **kwargs)
    ensure_xid = get_from_config('ensure_xid_predicate', config, False, **kwargs)

    rows: List[Dict[str, Any]] = []
    for table, file_config in files.items():
        if 'subject_fields' not in file_config:
            raise ValueError(f'{table} does not have subject_fields.')
        subject_fields = get_from_config('subject_fields', file_config, None, **kwargs)
        list_edges = set(get_from_config('list_edges', file_config, [], **kwargs))

        columns: Set[str] = set(subject_fields)
        dgraph_types: Dict[str, str] = {}
        edge_fields: List[str] = []

        if 'type_overrides' in file_config:
            type_overrides = get_from_config('type_overrides', file_config, None, **kwargs)
            columns.update(type_overrides)
            dgraph_types = find_dgraph_types(file_config['type_overrides'])

        if 'edge_fields' in file_config:
            edge_fields = list(get_from_config('edge_fields', file_config, [], **kwargs))
            columns.update(edge_fields)

        if 'csv_edges' in file_config:
            csv_edges = get_from_config('csv_edges', file_config, [], **kwargs)
            columns.update(csv_edges)
            edge_fields.extend(csv_edges)

        if 'ignore_fields' in file_config:
            ignore = get_from_config('ignore_fields', file_config, [], **kwargs)
            columns -= set(ignore)

        if 'override_edge_name' in file_config:
            override = get_from_config('override_edge_name', file_config, {}, **kwargs)
            for options in override.values():
                columns.add(options['predicate'])
                edge_fields.append(options['predicate'])

        if strip:
            columns = _strip_id(columns)
            edge_fields = _strip_id(edge_fields)
            list_edges = _strip_id(list_edges)

        if 'pre_rename' in file_config:
            pre_rename = get_from_config('pre_rename', file_config, {}, **kwargs)
            columns = {pre_rename.get(c, c) for c in columns}
            renamed_types: Dict[str, str] = {}
            edge_fields = set(edge_fields)
            for original, new in pre_rename.items():
                renamed_types[new] = dgraph_types.get(original, DEFAULT_DGRAPH_TYPE)
                if original in list_edges:
                    list_edges.add(new)
                if original in edge_fields:
                    edge_fields.add(new)
                dgraph_types.update(renamed_types)

        options_map: Dict[str, Optional[str]] = {}
        if 'options' in file_config:
            raw = get_from_config('options', file_config, {}, **kwargs)
            options_map = {c: ' '.join(o) for c, o in raw.items() if o is not None}

        edge_set = set(edge_fields)
        # deterministic output (the reference iterates a Python set, whose
        # order varies with hash randomization — we sort instead)
        for column in sorted(columns):
            if column in list_edges:
                dtype = '[uid]'
            elif column in edge_set:
                dtype = 'uid'
            else:
                dtype = dgraph_types.get(column, DEFAULT_DGRAPH_TYPE)
            rows.append({
                'column': column,
                'type': dtype,
                'table': table,
                'options': options_map.get(column),
            })

    if not rows:
        return rows

    if ensure_xid:
        rows.append({'column': 'xid', 'type': 'string', 'table': None, 'options': '@index(exact)'})

    rows.sort(key=lambda r: (r['table'] is None, r['table'] or '', r['type']))

    # Reference schema.py:148-155: console prints the schema frame;
    # export_csv writes the pre-schema rows.  Metadata-scale, driver-side.
    if get_from_config('console', config, False, **kwargs):
        for r in rows:
            print(r)
    export_csv = get_from_config('export_csv', config, False, **kwargs)
    if export_csv:
        # reference schema.py:47 resolves the name through the config too
        # (kwargs > config > 'schema.csv'), not kwargs-only
        export_csv_name = get_from_config('export_csv_name', config, 'schema.csv', **kwargs)
        path = os.path.join(output_dir, export_csv_name)
        encoding = kwargs.get('encoding', 'utf-8')
        with open(path, 'w', encoding=encoding) as f:
            f.write('column,type,table,options\n')
            for r in rows:
                f.write('{},{},{},{}\n'.format(
                    r['column'], r['type'],
                    '' if r['table'] is None else r['table'],
                    '' if r['options'] is None else r['options'],
                ))
    return rows


def generate_schema(rows: List[Dict[str, Any]], **kwargs) -> str:
    """Render ``column: type [options] .`` lines, deduped, joined.

    Parity: reference writers/schema.py:9-43 (D2).
    """
    if rows is None:
        raise ValueError('frame')
    output_dir = kwargs.get('output_dir', '.')
    export_schema = kwargs.get('export_schema', False)
    export_file = kwargs.get('export_file', 'schema.txt')
    encoding = kwargs.get('encoding', 'utf-8')

    seen = set()
    lines: List[str] = []
    for r in rows:
        line = (
            f"{r['column']}: {r['type']} ."
            if r['options'] is None
            else f"{r['column']}: {r['type']} {r['options']} ."
        )
        if line not in seen:
            seen.add(line)
            lines.append(line)
    joined = '\n'.join(lines)

    if export_schema:
        path = os.path.join(output_dir, export_file)
        with open(path, 'w', encoding=encoding) as f:
            f.write(joined)
    return joined


def generate_types(rows: List[Dict[str, Any]], **kwargs) -> List[str]:
    """Per-table ``type X { … }`` blocks; ``@reverse`` edges rendered
    ``<~edge>`` and their type blocks emitted LAST (dgraph live loader
    ordering constraint).

    Parity: reference writers/types.py:10-78 (D3).
    """
    if rows is None:
        raise ValueError('frame')
    output_dir = kwargs.get('output_dir', '.')
    export_schema = kwargs.get('export_schema', False)
    export_file = kwargs.get('export_file', 'types.txt')
    encoding = kwargs.get('encoding', 'utf-8')
    delim = kwargs.get('line_delimeter', '\n')

    tables: Dict[str, List[Dict[str, Any]]] = {}
    for r in rows:
        if r['table'] is None:
            continue
        tables.setdefault(r['table'], []).append(r)

    all_types: List[str] = []
    all_types_reverse: List[str] = []
    for table in sorted(tables):
        has_reverse = False
        members: List[str] = []
        seen = set()
        for r in tables[table]:
            opts = r['options']
            name = r['column']
            if opts is not None and '@reverse' in opts:
                has_reverse = True
                name = f'<~{name}>'
            if name not in seen:
                seen.add(name)
                members.append(name)
        block = f'type {table} {{ {delim}' + delim.join(members) + f'{delim} }}{delim}'
        (all_types_reverse if has_reverse else all_types).append(block)

    if export_schema:
        path = os.path.join(output_dir, export_file)
        with open(path, 'w', encoding=encoding) as f:
            for t in all_types + all_types_reverse:
                f.write(t)
                f.write('\n')
    return all_types + all_types_reverse
