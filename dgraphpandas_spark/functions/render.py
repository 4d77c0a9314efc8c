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


def shortest_digits_input(d: Column, s: Column) -> Column:
    """Digit string fed to the shortest-repr search (see
    ``pandas_double_str_parts``): Java ≤18's ``Double.toString`` prints the
    EXACT integer expansion of integral doubles (every double ≥ 2^53 is
    integral), up to ~5 more significant digits than CPython's shortest
    round-trip repr (JDK-4511638, fixed in JDK 19; this container runs 17).
    For |d| in [1e16, 2^63) recover the exact expansion via ``cast(long)``
    (also fixes half-digit rounding ties Java's 17-digit form can't
    resolve); otherwise use Java's digits.  Trailing zeros stripped.
    """
    digits = F.concat(
        F.regexp_extract(s, r'^-?(\d+)\.', 1), F.regexp_extract(s, r'\.(\d+)E', 1)
    )
    # upper bound: the literal 9.223372036854776e18 is exactly 2^63 as a
    # double, so strict < admits precisely the long-castable doubles
    exact_ok = (F.abs(d) >= 1e16) & (F.abs(d) < 9.223372036854776e18)
    raw = F.when(exact_ok, F.abs(d).cast('long').cast('string')).otherwise(digits)
    return F.regexp_replace(raw, '0+$', '')


def _exp2(e: Column) -> Column:
    """Python float-repr exponent: sign + two-digit-minimum magnitude.
    (NOT ``lpad``: Spark's lpad TRUNCATES 3-digit exponents like 308.)"""
    a = F.abs(e).cast('string')
    return F.concat(
        F.when(e >= 0, F.lit('+')).otherwise(F.lit('-')),
        F.when(F.length(a) < 2, F.concat(F.lit('0'), a)).otherwise(a),
    )


def pandas_double_str_parts(
    d: Column, s: Column, ds: Column = None, expn: Column = None
) -> Column:
    """``str(float)`` rewrite given pre-staged ``d`` (double) and ``s``
    (its Java string form).  IMPORTANT: pass plain column *references* —
    this expression uses them ~20×, so inlining a non-trivial tree here
    multiplies plan size and codegen compile time (measured 5-20 s per
    fresh plan before staging).  ``melt`` stages them as projection
    attributes for exactly this reason; it also stages ``ds``
    (``shortest_digits_input``) and ``expn`` (the parsed base-10 exponent)
    — pass those too in hot paths or the shortest-repr search below blows
    past janino's 64 KB method limit and the stage loses codegen.
    """
    sign = F.when(s.startswith('-'), F.lit('-')).otherwise(F.lit(''))
    lead = F.regexp_extract(s, r'^-?(\d+)\.', 1)
    frac = F.regexp_extract(s, r'\.(\d+)E', 1)
    if expn is None:
        expn = F.regexp_extract(s, r'E(-?\d+)$', 1).try_cast('int')
    digits = F.concat(lead, frac)
    digits_stripped = F.regexp_replace(digits, '0+$', '')
    frac_stripped = F.regexp_replace(frac, '0+$', '')
    ndig = F.length(digits)
    intlen = expn + F.lit(1)

    # Shortest-digits search for the scientific branch: try rounding the
    # digit string k=5..1 digits shorter (round to nearest; the digit
    # string is exact for integral doubles, see shortest_digits_input) and
    # keep the shortest candidate that casts back to exactly ``d``; fall
    # back to Java's digits.  Round-trip verification means every emitted
    # string is a correct representation of ``d``; the fallback can differ
    # lexically from CPython (one extra digit) only on non-integral /
    # ≥2^63 sci-range doubles, measured <0.5% of those.
    if ds is None:
        ds = shortest_digits_input(d, s)
    n = F.length(ds)

    def _sci_render(c: Column, dropped: int) -> Column:
        cs = c.cast('string')
        cd = F.regexp_replace(cs, '0+$', '')
        disp_exp = expn + F.length(cs) + F.lit(dropped) - n
        mant_c = F.concat(
            F.substr(cd, F.lit(1), F.lit(1)),
            F.when(F.length(cd) > 1, F.concat(F.lit('.'), F.substr(cd, F.lit(2)))).otherwise(F.lit('')),
        )
        return F.concat(sign, mant_c, F.lit('e'), _exp2(disp_exp))

    def _roundtrips(c: Column, dropped: int) -> Column:
        cand_exp = expn + F.lit(1 + dropped) - n
        back = F.concat(sign, c.cast('string'), F.lit('E'), cand_exp.cast('string')).try_cast('double')
        return back == d

    sci_java = F.concat(
        sign,
        lead,
        F.when(frac_stripped == '', F.lit('')).otherwise(F.concat(F.lit('.'), frac_stripped)),
        F.lit('e'),
        _exp2(expn),
    )
    branches = []
    for k in (5, 4, 3, 2, 1):
        # split the digit string (not long division: 17+-digit values lose
        # precision through double arithmetic), round to the nearest
        # k-digits-shorter integer candidate
        # try_cast: ANSI mode, and '' (when n<=k) must yield NULL so the
        # arm's condition nulls out — `&` does not short-circuit in codegen
        c1 = F.substr(ds, F.lit(1), n - k).try_cast('long')
        r = F.substr(ds, n - k + 1).try_cast('long')
        c_near = F.when(r * 2 >= F.lit(10 ** k), c1 + 1).otherwise(c1)
        branches.append(((n > k) & _roundtrips(c_near, k), _sci_render(c_near, k)))
    sci = sci_java
    for cond, val in reversed(branches):
        sci = F.when(cond, val).otherwise(sci)
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
        .when((expn >= 7) & (expn <= 15), pos_big)
        .when(expn == -4, small4)
        .otherwise(sci)  # sci referenced ONCE: the 5-arm shortest-digits
        # search below it is the largest subtree in this expression and
        # duplicating it breaks janino's 64 KB method limit
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
