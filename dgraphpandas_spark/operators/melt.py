"""Melt (unpivot) — the central operator (R1).

Reference: ``frame.melt(id_vars=subject_fields, var_name='predicate',
value_name='object')`` at /root/reference/dgraphpandas/strategies/horizontal.py:88-92.

Spark design: values are rendered to their pandas-compatible lexical string
form *per source column* first (functions/render.py), then a single
``DataFrame.unpivot`` emits the long frame.  That is one scan + one Expand
node — no per-column union, no shuffle, fully whole-stage-codegen'd, and
column pruning still reaches the parquet scan for downstream branches that
only touch a subset of predicates.

An alternative ``arrow`` strategy runs the reference's own pandas idioms per
partition via ``mapInPandas`` (Arrow-batched, no per-row Python) for exact
lexical parity on pathological float/scientific-notation data.

Row ordering differs from pandas melt (which is column-major); triple
comparison is set-based (SURVEY §2.7 W4).
"""
from __future__ import annotations

from typing import Iterable, List, Optional, Sequence, Set, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.render import render_value


def _dtype_class(dtype: T.DataType, is_declared_dt: bool) -> str:
    if is_declared_dt or isinstance(dtype, (T.TimestampType, T.TimestampNTZType, T.DateType)):
        return 'dt'
    if isinstance(dtype, T.StringType):
        return 'str'
    if isinstance(dtype, T.BooleanType):
        return 'bool'
    if isinstance(dtype, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return 'int'
    if isinstance(dtype, (T.FloatType, T.DoubleType)):
        return 'float'
    return 'other'


def downcast_forced_columns(
    dtypes: dict,
    value_vars: Sequence[str],
    datetime_columns: Iterable[str],
    pre_rename: dict,
    ignore_fields: Sequence[str],
    edge_fields: Sequence[str],
    add_dgraph_type_records: bool,
    scrub_intrinsic_object: bool = True,
    scrub_edge_object: bool = True,
) -> Set[str]:
    """Columns whose int values must render in float64 lexical form.

    Parity: the reference's illegal-char scrub
    (vertical_helpers.py:196 ``Series.replace``) runs over each branch's
    object column AFTER the ignore/edge-split filters; pandas silently
    downcasts an all-numeric object column to float64 when the surviving
    values are an int+float mix (no str/bool/datetime left), re-rendering
    ints as ``7.0``.  Verified empirically under pandas 2.2:
    ``[0, 0.5] → float64``, but any bool or str in the mix keeps object
    dtype and per-value ``str()`` forms.

    Every source column's branch (intrinsic / edge / dropped) is known at
    plan time, so the downcast is decided statically here (single-chunk
    semantics; the reference decides per chunk, so its output is
    chunk-boundary-dependent on such data — documented deviation).
    dgraph.type rows are string-valued and land in intrinsic, so
    ``add_dgraph_type_records`` blocks the intrinsic downcast.
    """
    dt_cols = set(datetime_columns)
    classes = {c: _dtype_class(dtypes[c], c in dt_cols) for c in value_vars}
    if set(classes.values()) <= {'int', 'float', 'bool'}:
        return set()  # float/intbool melt promotion modes already model this
    pre_rename = pre_rename or {}
    ignore = set(ignore_fields or ())
    edge_set = set(edge_fields or ())
    forced: Set[str] = set()
    for branch in ('intrinsic', 'edge'):
        if branch == 'intrinsic' and (add_dgraph_type_records or not scrub_intrinsic_object):
            continue
        if branch == 'edge' and not scrub_edge_object:
            continue
        fated = []
        for c in value_vars:
            pred = pre_rename.get(c, c)
            if pred in ignore:
                continue
            if (pred in edge_set) != (branch == 'edge'):
                continue
            fated.append(c)
        branch_classes = {classes[c] for c in fated}
        if fated and branch_classes <= {'int', 'float'} and 'float' in branch_classes:
            forced |= {c for c in fated if classes[c] == 'int'}
    return forced


def melt_expressions(
    df: DataFrame,
    id_vars: Sequence[str],
    value_vars: Optional[Sequence[str]] = None,
    datetime_columns: Iterable[str] = (),
    force_double_cols: Iterable[str] = (),
) -> Tuple[DataFrame, Set[str]]:
    """Wide→long with render-at-melt.  Returns (long_df, string_source_cols).

    ``datetime_columns`` are rendered ISO-8601 (reference C3); other
    timestamps render with ``str()`` semantics (space separator).
    ``string_source_cols`` feeds the illegal-character scrub gating: pandas'
    ``Series.replace(regex)`` only touches values that are *strings* in the
    original frame (reference vertical_helpers.py:196), so only predicates
    sourced from string columns get scrubbed downstream.

    Dtype promotion parity: pandas ``melt`` concatenates every value column
    into ONE Series, so the joint dtype changes lexical forms (verified
    empirically against pandas 2.2 concat):

    - all int/float/bool with ≥1 float → float64: ints render ``23.0``,
      bools ``1.0``, float32 widens to double;
    - int+bool (no float/str/dt) → numeric: bools render ``1``/``0``;
    - any str/dt/other in the mix → object: every value keeps its own
      ``str()`` form (ints ``23``, bools ``True``, floats shortest-repr).

    Float lexical forms are pandas-exact across the full double range
    (functions/render.py: positional window rewrite + shortest-digits
    search); the one remaining deviation is non-integral or ≥2^63 doubles
    in the scientific range, where Java's digits can carry one extra digit
    (<0.5% of such values; both forms round-trip to the same double).  The
    arrow strategy has no deviation.
    """
    value_vars = list(value_vars) if value_vars is not None else [c for c in df.columns if c not in id_vars]
    if not value_vars:
        raise ValueError(
            f'no data fields: subject_fields={list(id_vars)}, columns={df.columns}'
        )
    dt_cols = set(datetime_columns)
    dtypes = dict(zip(df.schema.names, [f.dataType for f in df.schema.fields]))

    string_sources = {c for c in value_vars if isinstance(dtypes[c], T.StringType)}

    classes = {c: _dtype_class(dtypes[c], c in dt_cols) for c in value_vars}
    class_set = set(classes.values())
    pure_f32 = all(isinstance(dtypes[c], T.FloatType) for c in value_vars)
    if class_set <= {'int', 'float', 'bool'} and 'float' in class_set:
        mode = 'float'
    elif class_set == {'int', 'bool'}:
        mode = 'intbool'
    else:
        mode = 'object'

    # Columns whose render needs the pandas-exact double repr: stage the
    # (double, java-string) pair as real projection attributes first —
    # pandas_double_str_parts references them ~20×, and inlining the cast
    # subtree that many times made Catalyst planning + codegen compile the
    # dominant cost (5-60 s per fresh plan, measured).
    from ..functions.render import pandas_double_str_parts

    force_double = set(force_double_cols)
    needs_pds = [
        c
        for c in value_vars
        if (mode == 'float' and classes[c] != 'bool' and not pure_f32)
        or (mode == 'object' and classes[c] == 'float')
        or (mode == 'object' and c in force_double)
    ]
    staged = df
    if needs_pds:
        from ..functions.render import sci_staged_cols, sci_staged_k

        def _ge(c):
            return sci_staged_cols(F.col(f'__pds_d_{c}'), F.col(f'__pds_s_{c}'))

        staged = df.select(
            '*',
            *[F.col(c).cast('double').alias(f'__pds_d_{c}') for c in needs_pds],
        ).select(
            '*',
            *[F.col(f'__pds_d_{c}').cast('string').alias(f'__pds_s_{c}') for c in needs_pds],
        ).select(
            '*',
            *[_ge(c)[0].alias(f'__pds_g_{c}') for c in needs_pds],
            *[_ge(c)[1].alias(f'__pds_e_{c}') for c in needs_pds],
        ).select(
            '*',
            *[
                sci_staged_k(
                    F.col(f'__pds_d_{c}'), F.col(f'__pds_s_{c}'),
                    F.col(f'__pds_g_{c}'), F.col(f'__pds_e_{c}'),
                ).alias(f'__pds_k_{c}')
                for c in needs_pds
            ],
        )

    def _render(c: str):
        col, dtype, cls = F.col(c), dtypes[c], classes[c]
        if c in needs_pds:
            return pandas_double_str_parts(
                F.col(f'__pds_d_{c}'),
                F.col(f'__pds_s_{c}'),
                ds=F.col(f'__pds_g_{c}'),
                expn=F.col(f'__pds_e_{c}'),
                k=F.col(f'__pds_k_{c}'),
            )
        if mode == 'float':
            if cls == 'bool':
                return (
                    F.when(col.isNull(), F.lit(None).cast('string'))
                    .when(col, F.lit('1.0'))
                    .otherwise(F.lit('0.0'))
                )
            # pure-f32 frame stays float32 through pandas melt;
            # astype(str) is numpy's shortest float32 repr == Spark cast
            return col.cast('string')
        if mode == 'intbool' and cls == 'bool':
            return (
                F.when(col.isNull(), F.lit(None).cast('string'))
                .when(col, F.lit('1'))
                .otherwise(F.lit('0'))
            )
        return render_value(col, dtype, as_datetime=(c in dt_cols))

    rendered = staged.select(
        *[F.col(c) for c in id_vars],
        *[_render(c).alias(c) for c in value_vars],
    )
    long_df = rendered.unpivot(
        ids=list(id_vars), values=value_vars, variableColumnName='predicate', valueColumnName='object'
    )
    return long_df, string_sources


def melt_arrow(
    df: DataFrame,
    id_vars: Sequence[str],
    value_vars: Optional[Sequence[str]] = None,
    datetime_columns: Iterable[str] = (),
    force_double_cols: Iterable[str] = (),
) -> Tuple[DataFrame, Set[str]]:
    """Arrow-batched melt running pandas' own ``melt`` + stringify per
    partition (``mapInPandas``) — exact lexical parity with the reference,
    at Arrow-transfer cost.  No per-row Python: one pandas call per batch.
    """
    import pandas as pd  # noqa: F401 (executor-side)

    value_vars = list(value_vars) if value_vars is not None else [c for c in df.columns if c not in id_vars]
    if not value_vars:
        raise ValueError(
            f'no data fields: subject_fields={list(id_vars)}, columns={df.columns}'
        )
    dt_cols = set(datetime_columns)
    dtypes = dict(zip(df.schema.names, [f.dataType for f in df.schema.fields]))
    string_sources = {c for c in value_vars if isinstance(dtypes[c], T.StringType)}

    id_fields = [df.schema[c] for c in id_vars]
    out_schema = T.StructType(
        list(id_fields)
        + [T.StructField('predicate', T.StringType()), T.StructField('object', T.StringType())]
    )
    ids = list(id_vars)
    values = list(value_vars)
    force_double = set(force_double_cols)

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            m = pdf[ids + values].melt(id_vars=ids, var_name='predicate', value_name='object')
            obj = m['object']
            mask = obj.notna()
            if force_double:
                # post-filter scrub downcast parity (downcast_forced_columns)
                fsel = mask & m['predicate'].isin(force_double)
                if bool(fsel.any()):
                    obj = obj.copy()
                    obj.loc[fsel] = obj.loc[fsel].astype('float64')
            is_dt = m['predicate'].isin(dt_cols) if dt_cols else None
            rendered = pd.Series([None] * len(m), index=m.index, dtype='object')
            if is_dt is not None and bool(is_dt.any()):
                sel = mask & is_dt
                rendered.loc[sel] = obj.loc[sel].map(lambda x: x.isoformat())
                sel2 = mask & ~is_dt
                rendered.loc[sel2] = obj.loc[sel2].map(str)
            else:
                rendered.loc[mask] = obj.loc[mask].map(str)
            m['object'] = rendered
            yield m

    return df.mapInPandas(gen, schema=out_schema), string_sources


def melt(
    df: DataFrame,
    id_vars: Sequence[str],
    value_vars: Optional[Sequence[str]] = None,
    datetime_columns: Iterable[str] = (),
    strategy: str = 'expressions',
    force_double_cols: Iterable[str] = (),
) -> Tuple[DataFrame, Set[str]]:
    if strategy == 'arrow':
        return melt_arrow(df, id_vars, value_vars, datetime_columns, force_double_cols)
    return melt_expressions(df, id_vars, value_vars, datetime_columns, force_double_cols)
