"""Vertical transform: long (EAV) frame → (intrinsic, edges) triple frames.

Re-expresses the reference's 16-step chain
(/root/reference/dgraphpandas/strategies/vertical.py:17-115) as pure Column
expressions over one long DataFrame — Catalyst collapses the whole chain into
a single whole-stage-codegen projection per branch; the only shuffle in the
entire transform is the subject-distinct for dgraph.type records (R3), and
even that is skipped when ``assume_unique_subjects`` is set (transcript keys
are unique).

Stage map (reference file:line → here):
  rename predicate/object  vertical.py:90        → withColumnsRenamed
  pre_rename (C5)          vertical_helpers.py:284-296 → map-literal coalesce
  ignore_fields (P1)       vertical_helpers.py:252-263 → filter ~isin
  csv_edges (R2)           vertical_helpers.py:14-38   → split+explode_outer+trim
  join key fields (C4)     vertical_helpers.py:41-67   → concat_ws, no row apply
  dgraph.type (R3)         vertical_helpers.py:70-84   → distinct subjects + union
  split intrinsic/edges(R4) vertical_helpers.py:87-113 → two filters (disjoint
                            column pruning ≈ one scan of IO at the source)
  '_id' strip (C6)         vertical_helpers.py:105-106 → F.replace (substring-
                            anywhere, matching pandas str.replace regex=False)
  rdf types (C8)           vertical_helpers.py:116-134 → map-literal + coalesce
  date fields (C2/C3/P3)   vertical_helpers.py:137-165 → to_timestamp + iso expr
  illegal scrub (C7)       vertical_helpers.py:168-198 → regexp_replace, gated
                            to string-sourced predicates (pandas Series.replace
                            only rewrites str values)
  NA drops (P2)            vertical_helpers.py:201-213 → filter isNotNull
  edge qualify (C9)        vertical_helpers.py:216-249 → when/otherwise exprs
  projection (P4)          vertical.py:112-113         → select
"""
from __future__ import annotations

import re
from typing import Any, Dict, Iterable, List, Optional, Set, Tuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..config import get_from_config
from ..functions.render import iso_datetime, render_value
from ..functions.strftime import strftime_to_spark
from ..types import DEFAULT_RDF_TYPE, find_rdf_types

TRIPLE_COLUMNS = ['subject', 'predicate', 'object', 'type']


def _map_literal_lookup(col: Column, mapping: Dict[str, str]) -> Column:
    """``mapping.get(value, None)`` as a Catalyst expression."""
    pairs: List[Column] = []
    for k, v in mapping.items():
        pairs.extend([F.lit(k), F.lit(v)])
    return F.create_map(*pairs)[col]


def _rename_predicates(frame: DataFrame, pre_rename: Dict[str, str]) -> DataFrame:
    """C5 — parity: vertical_helpers.py:284-296."""
    if not pre_rename:
        return frame
    return frame.withColumn(
        'predicate', F.coalesce(_map_literal_lookup(F.col('predicate'), pre_rename), F.col('predicate'))
    )


def _ignore_fields(frame: DataFrame, ignore: List[str]) -> DataFrame:
    """P1 — parity: vertical_helpers.py:252-263."""
    if not ignore:
        return frame
    return frame.filter(~F.col('predicate').isin(ignore))


def _expand_csv_edges(frame: DataFrame, csv_edges: List[str], seperator: str = ',') -> DataFrame:
    """R2 — parity: vertical_helpers.py:14-38.

    csv-listed predicates: split object on the literal separator, explode,
    trim, and *always* drop null exploded objects; other predicates pass
    through untouched (including their nulls).
    """
    if not csv_edges:
        return frame
    is_csv = F.col('predicate').isin(csv_edges)
    arr = F.when(is_csv, F.split(F.col('object'), re.escape(seperator))).otherwise(
        F.array(F.col('object'))
    )
    frame = frame.withColumn('object', F.explode_outer(arr))
    # Python str.strip() parity, NOT F.trim: pandas ``.str.strip()``
    # (vertical_helpers.py:34) strips every char with str.isspace() —
    # \t\n\v\f\r, the ASCII file/group/record/unit separators, NEL, NBSP
    # and the unicode space block — while Spark's trim removes ' ' only.
    # (Fuzz-found: '1 \n' must strip to '1', not scrub to '1 '.)
    py_ws = '[\\t-\\r \\x1c-\\x1f\\x85\\xa0\\u1680\\u2000-\\u200a\\u2028\\u2029\\u202f\\u205f\\u3000]+'
    stripped = F.regexp_replace(F.col('object'), f'^{py_ws}|{py_ws}$', '')
    frame = frame.withColumn(
        'object', F.when(is_csv, stripped).otherwise(F.col('object'))
    )
    return frame.filter(~(is_csv & F.col('object').isNull()))


def subject_expr(
    key: List[str], key_seperator: str, dgraph_type: str, dtypes: Dict[str, T.DataType]
) -> Column:
    """C4 — composite xid ``{dgraph_type}{sep}{k1}{sep}{k2}…``.

    Parity: vertical_helpers.py:41-67, including str()-rendering of each key
    and pandas' ``'nan'`` for missing key values.  Single vectorized
    ``concat_ws`` — the reference's row-wise ``apply`` escape (its own perf
    comment at :43-46) is unnecessary under codegen.
    """
    # pandas renders a missing key as 'None' (object/string columns hold
    # None) or 'nan' (numeric columns hold NaN) — keep that distinction.
    parts = [
        F.coalesce(
            render_value(F.col(k), dtypes[k]),
            F.lit('None') if isinstance(dtypes[k], T.StringType) else F.lit('nan'),
        )
        for k in key
    ]
    return F.concat_ws(key_seperator, F.lit(dgraph_type), *parts)


def _scrub_expr(col: Column, characters: List[str]) -> Column:
    """C7 — alternation regex removal; parity: vertical_helpers.py:168-198.

    ``(?U)`` (UNICODE_CHARACTER_CLASS): the reference compiles the pattern
    with Python ``re``, whose ``\\s``/``\\w``/``\\d`` are Unicode-aware by
    default (``\\s`` strips NBSP etc.), while Java's default classes are
    ASCII-only — the flag aligns Java with Python's semantics for the
    default and any user-supplied character patterns."""
    return F.regexp_replace(col, '(?U)' + '|'.join(characters), '')


def _empty_triples(frame: DataFrame) -> DataFrame:
    schema = T.StructType([T.StructField(c, T.StringType()) for c in TRIPLE_COLUMNS])
    return frame.sparkSession.createDataFrame([], schema)


def vertical_transform(
    frame: DataFrame,
    config: Dict[str, Any],
    config_file_key: str,
    **kwargs,
) -> Tuple[DataFrame, DataFrame]:
    """Long EAV frame → (intrinsic, edges), both
    ``DataFrame[subject, predicate, object, type]`` string-typed.

    Accepts the reference's config schema verbatim
    (/root/reference/docs/configuration.md).  Internal kwargs set by
    ``horizontal_transform``:

    - ``_object_rendered``: object column already lexically rendered
    - ``_string_source_predicates``: predicates sourced from string columns
      (scrub gating)
    - ``_datetime_predicates``: predicates already ISO-rendered
    - ``_predicate_universe``: static predicate list (edge_id_convention
      without a driver round-trip)
    - ``_wide_keys_df``: pre-melt key columns for the R3 distinct (R×M
      cheaper than distinct over the long frame)
    """
    if frame is None:
        raise ValueError('frame')
    if not config:
        raise ValueError('config')
    if not config_file_key:
        raise ValueError('config_file_key')

    try:
        file_config: Dict[str, Any] = config['files'][config_file_key]
    except KeyError:
        raise KeyError(f'{config_file_key} must be within the files object in config')

    if isinstance(frame, str):
        # Path entry, parity: reference strategies/vertical.py:38-41 reads the
        # CSV itself when handed a path (honoring read_csv_options).
        from pyspark.sql import SparkSession

        from ..plans.pipeline import _read_source
        frame = _read_source(SparkSession.getActiveSession(), frame, file_config, **kwargs)

    subject_fields = get_from_config('subject_fields', file_config, **kwargs)
    edge_fields = get_from_config('edge_fields', file_config, [], **kwargs)
    dgraph_type = get_from_config('dgraph_type', file_config, config_file_key, **kwargs)
    predicate_field = get_from_config('predicate_field', file_config, 'predicate', **kwargs)
    object_field = get_from_config('object_field', file_config, 'object', **kwargs)
    key_seperator = get_from_config('key_separator', config, '_', **kwargs)
    add_dgraph_type_records = get_from_config('add_dgraph_type_records', config, True, **kwargs)
    strip_id_from_edge_names = get_from_config('strip_id_from_edge_names', config, True, **kwargs)
    drop_na_intrinsic_objects = get_from_config('drop_na_intrinsic_objects', config, True, **kwargs)
    drop_na_edge_objects = get_from_config('drop_na_edge_objects', config, True, **kwargs)
    illegal_characters = get_from_config(
        'illegal_characters', config, ['%', '\\.', '\\s', '\"', '\\n', '\\r\\n'], **kwargs
    )
    illegal_characters_intrinsic_object = get_from_config(
        'illegal_characters_intrinsic_object', config, ['\"', '\\n', '\\r\\n'], **kwargs
    )
    csv_edges = get_from_config('csv_edges', file_config, [], **kwargs)
    csv_edges_seperator = get_from_config('csv_edges_seperator', file_config, ',', **kwargs)
    ignore_fields = get_from_config('ignore_fields', file_config, [], **kwargs)
    override_edge_name = get_from_config('override_edge_name', file_config, {}, **kwargs)
    pre_rename = get_from_config('pre_rename', file_config, {}, **kwargs)
    type_overrides = get_from_config('type_overrides', file_config, {}, **kwargs)
    date_fields = get_from_config('date_fields', file_config, {}, **kwargs)
    edge_id_convention = get_from_config('edge_id_convention', file_config, False, **kwargs)
    assume_unique_subjects = get_from_config('assume_unique_subjects', config, False, **kwargs)

    predicate_universe: Optional[List[str]] = kwargs.get('_predicate_universe')

    if edge_id_convention:
        # C12 — parity: vertical_helpers.py:299-305, wired vertical.py:65-67
        def _find_id_edges(fr: DataFrame) -> List[str]:
            if predicate_universe is not None:
                return [p for p in predicate_universe if p.endswith('_id')]
            pred_col = predicate_field if predicate_field in fr.columns else 'predicate'
            return [
                r[0]
                for r in fr.filter(F.col(pred_col).endswith('_id'))
                .select(pred_col)
                .distinct()
                .collect()
            ]

        edge_fields = _find_id_edges

    # C11 — callable config resolution (vertical_helpers.py:266-281).
    # Callables receive the Spark DataFrame (schema-level introspection).
    def _resolve(v):
        return v(frame) if callable(v) else v

    key: List[str] = _resolve(subject_fields)
    edges_list: List[str] = _resolve(edge_fields) or []
    dgraph_type = _resolve(dgraph_type)
    predicate_field = _resolve(predicate_field)
    object_field = _resolve(object_field)

    if not key:
        raise ValueError('subject_fields must be defined')
    if predicate_field not in frame.columns:
        raise KeyError(f'predicate column {predicate_field} must be defined on vertical frame')
    if object_field not in frame.columns:
        raise KeyError(f'object column {object_field} must be defined on vertical frame')

    frame = frame.withColumnsRenamed({predicate_field: 'predicate', object_field: 'object'})

    rdf_map = find_rdf_types(type_overrides)
    datetime_predicates: Set[str] = set(kwargs.get('_datetime_predicates', set()))
    string_sources: Set[str] = set(kwargs.get('_string_source_predicates', set()))

    # Vertical entry: lexically render the object column (horizontal entry
    # arrives pre-rendered by the melt).
    if not kwargs.get('_object_rendered', False):
        obj_type = frame.schema['object'].dataType
        dt_preds = set(date_fields) | {p for p, t in rdf_map.items() if t == '<xs:dateTime>'}
        if isinstance(obj_type, (T.TimestampType, T.TimestampNTZType)):
            frame = frame.withColumn(
                'object',
                F.when(F.col('predicate').isin(list(dt_preds)), iso_datetime(F.col('object')))
                .otherwise(render_value(F.col('object'), obj_type)),
            )
            datetime_predicates |= dt_preds
        else:
            if isinstance(obj_type, T.StringType):
                string_sources |= {'*'}  # every predicate is string-sourced
            elif isinstance(obj_type, (T.FloatType, T.DoubleType)):
                # stage the double-repr inputs as attributes: the inlined
                # shortest-repr search exceeds janino's 64 KB method limit
                # and drops the stage out of codegen (see melt.py)
                from ..functions.render import (
                    pandas_double_str_parts, sci_staged_cols, sci_staged_k,
                )

                frame = (
                    frame.withColumn('__pds_d', F.col('object').cast('double'))
                    .withColumn('__pds_s', F.col('__pds_d').cast('string'))
                )
                g, e = sci_staged_cols(F.col('__pds_d'), F.col('__pds_s'))
                frame = frame.withColumn('__pds_g', g).withColumn('__pds_e', e)
                frame = frame.withColumn(
                    '__pds_k',
                    sci_staged_k(
                        F.col('__pds_d'), F.col('__pds_s'),
                        F.col('__pds_g'), F.col('__pds_e'),
                    ),
                )
                frame = frame.withColumn(
                    'object',
                    pandas_double_str_parts(
                        F.col('__pds_d'), F.col('__pds_s'),
                        ds=F.col('__pds_g'), expn=F.col('__pds_e'),
                        k=F.col('__pds_k'),
                    ),
                ).drop('__pds_d', '__pds_s', '__pds_g', '__pds_e', '__pds_k')
            else:
                frame = frame.withColumn('object', render_value(F.col('object'), obj_type))

    dtypes = {f.name: f.dataType for f in frame.schema.fields}

    def _apply_rename(name: str) -> str:
        return pre_rename.get(name, name) if pre_rename else name

    # Scrub gating tracks *values*, so renamed predicates keep their
    # string-sourced-ness; date_fields masks stay keyed by original names to
    # match the reference (its _format_date_fields at vertical_helpers.py:149
    # masks on post-rename predicates with pre-rename keys — a rename of a
    # date field therefore misses, same as here).
    string_sources = {_apply_rename(p) if p != '*' else p for p in string_sources}

    frame = _rename_predicates(frame, pre_rename)
    frame = _ignore_fields(frame, ignore_fields)
    frame = _expand_csv_edges(frame, csv_edges, csv_edges_seperator)
    string_sources |= set(csv_edges)

    # C4 — subject key concat, then drop key columns.  The horizontal entry
    # precomputes (and pre-scrubs) the subject on the wide frame so the melt
    # replicates a finished string (see horizontal.py); the vertical entry
    # builds it here per long row.
    precomputed_subject = bool(kwargs.get('_precomputed_subject', False))
    if precomputed_subject:
        frame = frame.select(
            F.col('__subject').alias('subject'), 'predicate', 'object'
        )
    else:
        frame = frame.select(
            subject_expr(key, key_seperator, dgraph_type, dtypes).alias('subject'),
            'predicate',
            'object',
        )

    # R3 — dgraph.type records (vertical_helpers.py:70-84)
    if add_dgraph_type_records:
        # the wide-keys shortcut (distinct over R keys instead of R×M long
        # rows) is only valid when no earlier stage removed rows: csv_edges
        # drops null-csv rows and ignore_fields drops predicates, either of
        # which can eliminate a subject entirely (reference then emits no
        # dgraph.type row for it)
        wide_keys: Optional[DataFrame] = kwargs.get('_wide_keys_df')
        if csv_edges or ignore_fields:
            wide_keys = None
        if wide_keys is not None:
            if precomputed_subject:
                subjects = wide_keys.select(F.col('__subject').alias('subject'))
            else:
                key_dtypes = {f.name: f.dataType for f in wide_keys.schema.fields}
                subjects = wide_keys.select(
                    subject_expr(key, key_seperator, dgraph_type, key_dtypes).alias('subject')
                )
        else:
            subjects = frame.select('subject')
        if not assume_unique_subjects:
            subjects = subjects.distinct()
        type_rows = subjects.select(
            'subject',
            F.lit('dgraph.type').alias('predicate'),
            F.lit(dgraph_type).alias('object'),
        )
        frame = frame.unionByName(type_rows)
        string_sources.add('dgraph.type')

    # R4 — intrinsic/edge split + C6 '_id' strip (substring-anywhere)
    if edges_list:
        intrinsic = frame.filter(~F.col('predicate').isin(edges_list))
        edges = frame.filter(F.col('predicate').isin(edges_list))
        if strip_id_from_edge_names:
            edges = edges.withColumn('predicate', F.replace(F.col('predicate'), F.lit('_id'), F.lit('')))
    else:
        intrinsic = frame
        edges = None  # empty, materialized at the end

    # C8 — RDF literal types on intrinsic
    if rdf_map:
        intrinsic = intrinsic.withColumn(
            'type',
            F.coalesce(_map_literal_lookup(F.col('predicate'), rdf_map), F.lit(DEFAULT_RDF_TYPE)),
        )
    else:
        intrinsic = intrinsic.withColumn('type', F.lit(DEFAULT_RDF_TYPE))

    # C2 (vertical path) + C3 + P3 — date parse/ISO render/NaT drop
    if date_fields:
        obj = F.col('object')
        for dcol, opts in date_fields.items():
            if dcol in datetime_predicates:
                continue  # already ISO-rendered at melt
            fmt = (opts or {}).get('format')
            parsed = (
                F.to_timestamp(F.col('object'), strftime_to_spark(fmt))
                if fmt
                else F.to_timestamp(F.col('object'))
            )
            obj = F.when(F.col('predicate') == dcol, iso_datetime(parsed)).otherwise(obj)
        intrinsic = intrinsic.withColumn('object', obj)
        intrinsic = intrinsic.withColumn(
            'type',
            F.when(
                F.col('predicate').isin(list(date_fields)), F.lit('<xs:dateTime>')
            ).otherwise(F.col('type')),
        )
    # P3 — NaT rows are dropped unconditionally (vertical_helpers.py:163)
    intrinsic = intrinsic.filter(
        ~((F.col('type') == '<xs:dateTime>') & F.col('object').isNull())
    )

    # C7 — illegal character scrubs (×4), gated to string-sourced predicates
    all_string = '*' in string_sources
    str_preds = sorted(string_sources - {'*'})

    def _gated_scrub(df: DataFrame, field: str, chars: List[str], stripped_names: bool = False) -> DataFrame:
        if not chars:
            return df
        if field == 'subject':
            return df.withColumn('subject', _scrub_expr(F.col('subject'), chars))
        if all_string:
            return df.withColumn(field, _scrub_expr(F.col(field), chars))
        names = (
            [p.replace('_id', '') for p in str_preds] if stripped_names else str_preds
        )
        if not names:
            return df
        return df.withColumn(
            field,
            F.when(
                F.col('predicate').isin(names), _scrub_expr(F.col(field), chars)
            ).otherwise(F.col(field)),
        )

    if not precomputed_subject:  # else scrubbed once on the wide frame
        intrinsic = _gated_scrub(intrinsic, 'subject', illegal_characters)

    # P2 — NA drop BEFORE the object scrub: regexp_replace preserves
    # nullness, so the results are identical, but filtering first keeps
    # Catalyst from substituting the scrub regex into the Filter predicate
    # (which would run the regexp twice per row — once to null-check, once
    # to project).
    if drop_na_intrinsic_objects:
        intrinsic = intrinsic.filter(F.col('object').isNotNull())
    intrinsic = _gated_scrub(intrinsic, 'object', illegal_characters_intrinsic_object)

    intrinsic = intrinsic.select(*TRIPLE_COLUMNS)

    if edges is None:
        return intrinsic, _empty_triples(frame)

    if not precomputed_subject:  # else scrubbed once on the wide frame
        edges = _gated_scrub(edges, 'subject', illegal_characters)
    # NA drop before the object scrub — same double-regexp avoidance as the
    # intrinsic branch (scrub preserves nullness)
    if drop_na_edge_objects:
        edges = edges.filter(F.col('object').isNotNull())
    edges = _gated_scrub(edges, 'object', illegal_characters, stripped_names=bool(strip_id_from_edge_names))

    # C9 — edge object qualification (vertical_helpers.py:216-249), pure
    # expressions instead of the reference's in-place row mutation.
    # str(None)='None' for string-sourced predicates, str(nan)='nan' for
    # numeric ones (only reachable when drop_na_edge_objects=False).
    if all_string:
        null_form = F.lit('None')
    else:
        edge_str_names = [p.replace('_id', '') for p in str_preds] if strip_id_from_edge_names else str_preds
        null_form = F.when(F.col('predicate').isin(edge_str_names), F.lit('None')).otherwise(F.lit('nan')) if edge_str_names else F.lit('nan')
    obj_safe = F.coalesce(F.col('object'), null_form)
    if override_edge_name:
        obj_expr: Column = F.concat(F.col('predicate'), F.lit(key_seperator), obj_safe)
        pred_expr: Column = F.col('predicate')
        for pred, ov in override_edge_name.items():
            cond = F.col('predicate') == pred
            obj_expr = F.when(
                cond, F.concat(F.lit(ov['target_node_type'] + key_seperator), obj_safe)
            ).otherwise(obj_expr)
            if 'predicate' in ov:
                pred_expr = F.when(cond, F.lit(ov['predicate'])).otherwise(pred_expr)
        edges = edges.withColumn('object', obj_expr).withColumn('predicate', pred_expr)
    else:
        edges = edges.withColumn(
            'object', F.concat(F.col('predicate'), F.lit(key_seperator), obj_safe)
        )

    edges = edges.withColumn('type', F.lit(None).cast('string')).select(*TRIPLE_COLUMNS)
    return intrinsic, edges
