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
    # cast covers TIMESTAMP_NTZ (unix_micros only accepts TIMESTAMP;
    # session TZ is UTC so the cast is lossless and matches date_format)
    micros = F.pmod(F.unix_micros(col.cast('timestamp')), F.lit(1_000_000))
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
    micros = F.pmod(F.unix_micros(col.cast('timestamp')), F.lit(1_000_000))
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


def pandas_double_str_parts(d: Column, s: Column) -> Column:
    """``str(float)`` rewrite given pre-staged ``d`` (double) and ``s``
    (its Java string form).  IMPORTANT: pass plain column *references* —
    this expression uses them ~20×, so inlining a non-trivial tree here
    multiplies plan size and codegen compile time (measured 5-20 s per
    fresh plan before staging).  ``melt`` stages them as projection
    attributes for exactly this reason.
    """
    sign = F.when(s.startswith('-'), F.lit('-')).otherwise(F.lit(''))
    lead = F.regexp_extract(s, r'^-?(\d+)\.', 1)
    frac = F.regexp_extract(s, r'\.(\d+)E', 1)
    expn = F.regexp_extract(s, r'E(-?\d+)$', 1).cast('int')
    digits = F.concat(lead, frac)
    digits_stripped = F.regexp_replace(digits, '0+$', '')
    frac_stripped = F.regexp_replace(frac, '0+$', '')
    ndig = F.length(digits)
    intlen = expn + F.lit(1)

    mant = F.concat(
        sign,
        lead,
        F.when(frac_stripped == '', F.lit('')).otherwise(F.concat(F.lit('.'), frac_stripped)),
    )
    sci = F.concat(
        mant,
        F.lit('e'),
        F.when(expn >= 0, F.lit('+')).otherwise(F.lit('-')),
        F.lpad(F.abs(expn).cast('string'), 2, '0'),
    )
    pos_big = F.concat(
        sign,
        F.when(
            ndig <= intlen,
            F.concat(digits, F.repeat(F.lit('0'), (intlen - ndig).cast('int')), F.lit('.0')),
        ).otherwise(
            F.concat(
                F.substr(digits, F.lit(1), intlen),
                F.lit('.'),
                F.substr(digits, intlen + 1),
            )
        ),
    )
    small4 = F.concat(sign, F.lit('0.000'), digits_stripped)

    return (
        F.when(d.isNull() | F.isnan(d), F.lit(None).cast('string'))
        .when(d == float('inf'), F.lit('inf'))
        .when(d == float('-inf'), F.lit('-inf'))
        .when(~s.contains('E'), s)
        .when(expn >= 16, sci)
        .when(expn >= 7, pos_big)
        .when(expn == -4, small4)
        .otherwise(sci)
    )


def pandas_double_str(col: Column) -> Column:
    """``str(float)`` (CPython repr) for a numeric column, exactly.

    Java ``Double.toString`` and CPython ``repr`` both emit the shortest
    round-trip digits, but switch to scientific notation at different
    magnitudes: Java at <1e-3 / ≥1e7, Python at <1e-4 / ≥1e16; the rewrite
    converts Java's form in the disagreement windows.  NaN renders NULL
    (pandas treats NaN as missing); ±Infinity → ``inf``/``-inf``.

    Prefer the staged form (see melt) in hot paths: this convenience
    wrapper inlines the cast subtree many times.
    """
    d = col.cast('double')
    return pandas_double_str_parts(d, d.cast('string'))


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
    if isinstance(dtype, (T.FloatType, T.DoubleType)):
        # pandas melt boxes numeric values into *Python* floats (doubles)
        # in mixed frames, so even float32 columns stringify through the
        # double repr (verified against the reference's planets sample)
        return pandas_double_str(col)
    # ints, decimals: Spark's cast matches str()
    return col.cast('string')
