"""strftime → Spark datetime-pattern translation.

The reference takes Python strftime formats in ``date_fields``
(e.g. ``{"ts": {"format": "%Y-%m-%dT%H:%M:%S"}}``,
/root/reference/dgraphpandas/strategies/horizontal.py:52-58).  Spark's
``to_timestamp`` wants Spark datetime patterns, so configs keep working
unchanged through this translator.
"""
from __future__ import annotations

_DIRECTIVES = {
    '%Y': 'yyyy',
    '%y': 'yy',
    '%m': 'MM',
    '%d': 'dd',
    '%H': 'HH',
    '%I': 'hh',
    '%M': 'mm',
    '%S': 'ss',
    '%f': 'SSSSSS',
    '%b': 'MMM',
    '%B': 'MMMM',
    '%a': 'EEE',
    '%A': 'EEEE',
    '%j': 'DDD',
    '%p': 'a',
    '%z': 'xx',
    '%Z': 'zzz',
    '%%': "'%'",
}

# characters with pattern meaning in Spark that must be quoted when literal
_NEEDS_QUOTE = set('abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ')


def strftime_to_spark(fmt: str) -> str:
    """Translate a strftime format string to a Spark datetime pattern.

    Raises ValueError on directives with no Spark equivalent.
    """
    out: list[str] = []
    i = 0
    while i < len(fmt):
        ch = fmt[i]
        if ch == '%':
            directive = fmt[i:i + 2]
            if directive not in _DIRECTIVES:
                raise ValueError(f'unsupported strftime directive {directive!r} in {fmt!r}')
            out.append(_DIRECTIVES[directive])
            i += 2
        elif ch in _NEEDS_QUOTE:
            out.append(f"'{ch}'")
            i += 1
        elif ch == "'":
            out.append("''")
            i += 1
        else:
            out.append(ch)
            i += 1
    return ''.join(out)
