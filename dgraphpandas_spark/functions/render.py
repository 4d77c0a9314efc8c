"""Lexical rendering of typed values to strings, matching pandas ``str()``
/ ``datetime.isoformat()`` forms the reference emits.

Why this exists: the reference's melt keeps native dtypes in the long
``object`` column and stringifies late (``astype(str)`` at
/root/reference/dgraphpandas/writers/upserts.py:18-20,38-40; ``.isoformat()``
at strategies/vertical_helpers.py:158).  Spark columns are homogeneous, so we
render to string *at melt time* with per-source-dtype expressions (SURVEY §7
"render-at-melt").  Everything here is built-in ``pyspark.sql.functions`` —
JVM-side, whole-stage-codegen'd, no Python in the hot path.

Known lexical deviations from CPython ``str()`` (documented, exercised in
tests): float values needing scientific notation (|x| >= 1e16 or < 1e-4)
render in Java style ``1.0E16`` vs Python ``1e+16``.  For exact pandas parity
on such data use the Arrow melt strategy (operators/melt.py).
"""
from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


def iso_datetime(col: Column) -> Column:
    """``datetime.isoformat()``: ``2026-01-01T10:00:00`` and, only when the
    microsecond component is non-zero, ``.ffffff`` (6 digits).

    Parity: reference vertical_helpers.py:153-164 (C3).
    """
    base = F.date_format(col, "yyyy-MM-dd'T'HH:mm:ss")
    micros = F.pmod(F.unix_micros(col), F.lit(1_000_000))
    return F.when(col.isNull(), F.lit(None).cast('string')).otherwise(
        F.when(micros == 0, base).otherwise(
            F.concat(base, F.lit('.'), F.lpad(micros.cast('string'), 6, '0'))
        )
    )


def py_str_datetime(col: Column) -> Column:
    """``str(pd.Timestamp)``: space separator, fraction only when non-zero.

    Used for timestamp columns *not* declared as dateTime in config — the
    reference stringifies those with plain ``str()`` (upserts.py:20).
    """
    base = F.date_format(col, 'yyyy-MM-dd HH:mm:ss')
    micros = F.pmod(F.unix_micros(col), F.lit(1_000_000))
    return F.when(col.isNull(), F.lit(None).cast('string')).otherwise(
        F.when(micros == 0, base).otherwise(
            F.concat(base, F.lit('.'), F.lpad(micros.cast('string'), 6, '0'))
        )
    )


def py_str_bool(col: Column) -> Column:
    """``str(bool)`` → ``True``/``False`` (Spark's cast gives lowercase)."""
    return (
        F.when(col.isNull(), F.lit(None).cast('string'))
        .when(col, F.lit('True'))
        .otherwise(F.lit('False'))
    )


def render_value(col: Column, dtype: T.DataType, as_datetime: bool = False) -> Column:
    """Render a typed column to its pandas-compatible string form.

    ``as_datetime=True`` → ISO form (column is config-declared dateTime,
    reference C3); otherwise plain ``str()`` semantics per dtype.
    Nulls stay null (they are dropped later by P2, reference
    vertical_helpers.py:201-213).
    """
    if isinstance(dtype, T.StringType):
        return col
    if isinstance(dtype, T.BooleanType):
        return py_str_bool(col)
    if isinstance(dtype, (T.TimestampType, T.TimestampNTZType)):
        return iso_datetime(col) if as_datetime else py_str_datetime(col)
    if isinstance(dtype, T.DateType):
        return col.cast('string')  # date.isoformat() == ISO yyyy-MM-dd
    # ints, floats, decimals: Spark's cast matches str() for common ranges
    return col.cast('string')
