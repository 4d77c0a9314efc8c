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


def melt_expressions(
    df: DataFrame,
    id_vars: Sequence[str],
    value_vars: Optional[Sequence[str]] = None,
    datetime_columns: Iterable[str] = (),
) -> Tuple[DataFrame, Set[str]]:
    """Wide→long with render-at-melt.  Returns (long_df, string_source_cols).

    ``datetime_columns`` are rendered ISO-8601 (reference C3); other
    timestamps render with ``str()`` semantics (space separator).
    ``string_source_cols`` feeds the illegal-character scrub gating: pandas'
    ``Series.replace(regex)`` only touches values that are *strings* in the
    original frame (reference vertical_helpers.py:196), so only predicates
    sourced from string columns get scrubbed downstream.
    """
    value_vars = list(value_vars) if value_vars is not None else [c for c in df.columns if c not in id_vars]
    if not value_vars:
        raise ValueError(
            f'no data fields: subject_fields={list(id_vars)}, columns={df.columns}'
        )
    dt_cols = set(datetime_columns)
    dtypes = dict(zip(df.schema.names, [f.dataType for f in df.schema.fields]))

    string_sources = {c for c in value_vars if isinstance(dtypes[c], T.StringType)}

    rendered = df.select(
        *[F.col(c) for c in id_vars],
        *[
            render_value(F.col(c), dtypes[c], as_datetime=(c in dt_cols)).alias(c)
            for c in value_vars
        ],
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

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            m = pdf[ids + values].melt(id_vars=ids, var_name='predicate', value_name='object')
            obj = m['object']
            mask = obj.notna()
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
) -> Tuple[DataFrame, Set[str]]:
    if strategy == 'arrow':
        return melt_arrow(df, id_vars, value_vars, datetime_columns)
    return melt_expressions(df, id_vars, value_vars, datetime_columns)
