"""Horizontal transform: wide frame → melt → vertical chain.

Parity: /root/reference/dgraphpandas/strategies/horizontal.py:12-94.
Stages: validate → (read csv if path) → no-data-column guard (P6) →
date_fields parse (C2) → type_overrides cast (C1) → melt (R1) → tail-call
vertical_transform.

Spark specifics: date parsing and casts are Column expressions on the wide
frame (pushed into the same codegen stage as the melt's Expand); the melt
pre-renders values so the long ``object`` column is a homogeneous string —
see operators/melt.py.  Casting failures yield NULL (Spark semantics) where
pandas would raise and the reference would ``exit()`` (horizontal.py:79);
we consider silent-null the saner distributed behavior and document it.
"""
from __future__ import annotations

from typing import Any, Dict, List, Tuple, Union

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..config import get_from_config
from ..functions.strftime import strftime_to_spark
from ..types import find_spark_type, is_datetime_type_name
from .melt import downcast_forced_columns, melt
from .vertical import vertical_transform


def horizontal_transform(
    frame: Union[str, DataFrame],
    config: Dict[str, Any],
    config_file_key: str,
    **kwargs,
) -> Tuple[DataFrame, DataFrame]:
    """Wide DataFrame (or CSV path) → (intrinsic, edges) triple frames."""
    if frame is None:
        raise ValueError('frame')
    if not config:
        raise ValueError('config')
    if not config_file_key:
        raise ValueError('config_file_key')

    file_config: Dict[str, Any] = config['files'][config_file_key]
    type_overrides: Dict[str, str] = dict(
        get_from_config('type_overrides', file_config, {}, **kwargs)
    )
    subject_fields = get_from_config('subject_fields', file_config, **kwargs)
    date_fields: Dict[str, Any] = get_from_config('date_fields', file_config, {}, **kwargs)
    melt_strategy: str = get_from_config('melt_strategy', config, 'expressions', **kwargs)

    if isinstance(frame, str):
        # S1 — CSV scan (reference horizontal.py:35-38); header + inference
        # mirror pandas read_csv defaults; read_csv_options passes through
        # Spark csv options.
        spark = SparkSession.getActiveSession()
        read_csv_options = dict(get_from_config('read_csv_options', file_config, {}, **kwargs))
        sep = read_csv_options.pop('sep', read_csv_options.pop('delimiter', ','))
        frame = (
            spark.read.option('header', True)
            .option('inferSchema', True)
            .option('sep', sep)
            .options(**read_csv_options)
            .csv(frame)
        )

    if callable(subject_fields):
        subject_fields = subject_fields(frame)
    if not subject_fields:
        raise ValueError('subject_fields')

    if len(frame.columns) <= len(subject_fields):
        # P6 — empty-data guard (reference horizontal.py:40-45)
        raise ValueError(
            f'It looks like there are no data fields. '
            f'subject_fields={subject_fields}, columns={frame.columns}'
        )

    # C2 — date_fields parse on the wide frame; auto-adds datetime override
    # (reference horizontal.py:52-58)
    for col, date_format in date_fields.items():
        fmt = (date_format or {}).get('format')
        dtype = frame.schema[col].dataType
        if isinstance(dtype, (T.TimestampType, T.TimestampNTZType, T.DateType)):
            parsed = F.col(col).cast('timestamp')
        elif fmt:
            parsed = F.to_timestamp(F.col(col), strftime_to_spark(fmt))
        else:
            parsed = F.to_timestamp(F.col(col))
        frame = frame.withColumn(col, parsed)
        if col not in type_overrides:
            type_overrides[col] = 'datetime64'

    # C1 — type-override casts so values melt with the correct lexical form
    # (reference horizontal.py:67-79)
    for col, user_type in type_overrides.items():
        spark_type = find_spark_type(user_type)
        if spark_type is None:
            raise ValueError(f'unknown type override {user_type!r} for column {col!r}')
        if col in date_fields:
            continue  # already a timestamp
        dtype = frame.schema[col].dataType
        if is_datetime_type_name(user_type) and isinstance(dtype, T.StringType):
            frame = frame.withColumn(col, F.to_timestamp(F.col(col)))
        else:
            frame = frame.withColumn(col, F.col(col).cast(spark_type))

    datetime_cols = set(date_fields) | {
        c for c, t in type_overrides.items() if is_datetime_type_name(t)
    }
    value_vars = [c for c in frame.columns if c not in subject_fields]

    # Post-filter scrub-downcast parity (see melt.downcast_forced_columns):
    # resolve each column's branch fate with the same rules vertical_transform
    # will use, then force float64 lexical form where the reference's
    # Series.replace would downcast.
    edge_fields = get_from_config('edge_fields', file_config, [], **kwargs)
    if get_from_config('edge_id_convention', file_config, False, **kwargs):
        # C12 acts pre-rename on the melted predicates == original col names
        edge_fields = [c for c in value_vars if c.endswith('_id')]
    elif callable(edge_fields):
        edge_fields = edge_fields(frame) or []
    pre_rename = get_from_config('pre_rename', file_config, {}, **kwargs)
    force_double_cols = downcast_forced_columns(
        dtypes={f.name: f.dataType for f in frame.schema.fields},
        value_vars=value_vars,
        datetime_columns=datetime_cols,
        pre_rename=pre_rename,
        ignore_fields=get_from_config('ignore_fields', file_config, [], **kwargs),
        edge_fields=edge_fields,
        add_dgraph_type_records=get_from_config('add_dgraph_type_records', config, True, **kwargs),
        scrub_intrinsic_object=bool(
            get_from_config('illegal_characters_intrinsic_object', config, ['\"', '\\n', '\\r\\n'], **kwargs)
        ),
        scrub_edge_object=bool(
            get_from_config('illegal_characters', config, ['%', '\\.', '\\s', '\"', '\\n', '\\r\\n'], **kwargs)
        ),
    )

    # Subject precompute: build (and scrub, C7) the subject string ONCE on
    # the wide frame so the melt's Expand replicates a finished string,
    # instead of re-running concat_ws + regexp_replace on every melted row
    # (M× per source row — measured 2× the whole melt-stage cost at 16M
    # turns).  Identical lexical result: same subject_expr over the same
    # key dtypes, same scrub alternation.  Skipped when dgraph_type is a
    # callable (it must resolve against the long frame, vertical's
    # contract).
    from .vertical import _scrub_expr, subject_expr

    dgraph_type = get_from_config('dgraph_type', file_config, config_file_key, **kwargs)
    if callable(dgraph_type):
        melt_id_vars = list(subject_fields)
        internal_subject: Dict[str, Any] = {
            '_wide_keys_df': frame.select(*subject_fields),
        }
    else:
        key_seperator = get_from_config('key_separator', config, '_', **kwargs)
        illegal_characters = get_from_config(
            'illegal_characters', config, ['%', '\\.', '\\s', '\"', '\\n', '\\r\\n'], **kwargs
        )
        wide_dtypes = {f.name: f.dataType for f in frame.schema.fields}
        subj = subject_expr(list(subject_fields), key_seperator, dgraph_type, wide_dtypes)
        if illegal_characters:
            subj = _scrub_expr(subj, illegal_characters)
        frame = frame.withColumn('__subject', subj)
        melt_id_vars = ['__subject']
        internal_subject = {
            '_precomputed_subject': True,
            '_wide_keys_df': frame.select('__subject'),
        }

    long_frame, string_sources = melt(
        frame,
        id_vars=melt_id_vars,
        value_vars=value_vars,
        datetime_columns=datetime_cols,
        strategy=melt_strategy,
        force_double_cols=force_double_cols,
    )

    internal = dict(kwargs)
    internal.update(
        subject_fields=list(subject_fields),
        type_overrides=type_overrides,
        _object_rendered=True,
        _string_source_predicates=string_sources,
        _datetime_predicates=datetime_cols,
        _predicate_universe=value_vars,
        **internal_subject,
    )
    return vertical_transform(long_frame, config, config_file_key, **internal)
