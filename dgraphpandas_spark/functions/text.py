"""Text-analysis functions for large-scale training-data pipelines
(engine additions beyond the reference — task brief "text analysis").

Every function is a pure Column expression (JVM-side, codegen) and has an
exactly-mirrorable ANSI/DuckDB formulation, so each ships with a DuckDB
oracle in ``__spark_entry__.oracle_sql``.
"""
from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# deterministic marker sets for the n-gram/stopword language heuristic
LANG_MARKERS = {
    'en': ['the', 'and', 'of', 'to', 'a', 'in', 'is'],
    'de': ['der', 'und', 'die', 'das', 'ist', 'nicht'],
    'fr': ['le', 'la', 'et', 'les', 'est', 'une'],
    'es': ['el', 'de', 'que', 'los', 'es', 'una'],
}

STOPWORDS = LANG_MARKERS['en']

PUNCT_CLASS = r'[.,;:!?]'


def normalized(text: Column) -> Column:
    """lowercase + collapse whitespace — shared normal form for
    fingerprinting and tokenization."""
    return F.regexp_replace(F.lower(F.trim(text)), r'\s+', ' ')


def tokens(text: Column) -> Column:
    return F.split(normalized(text), ' ')


def token_count(text: Column) -> Column:
    """Whitespace token count (empty text → 0)."""
    return F.when(F.length(F.trim(text)) == 0, F.lit(0)).otherwise(F.size(tokens(text)))


def bpe_token_estimate(text: Column) -> Column:
    """BPE-ish token-count estimate: one token per ~4 chars plus one per
    punctuation mark — the standard cheap proxy when no tokenizer is
    shipped (none is, in this container)."""
    n_chars = F.length(text)
    n_punct = n_chars - F.length(F.regexp_replace(text, PUNCT_CLASS, ''))
    return (F.ceil(n_chars / F.lit(4.0)) + n_punct).cast('int')


def punct_ratio(text: Column) -> Column:
    n_chars = F.length(text)
    n_punct = n_chars - F.length(F.regexp_replace(text, PUNCT_CLASS, ''))
    return F.when(n_chars == 0, F.lit(0.0)).otherwise(n_punct / n_chars.cast('double'))


def stopword_ratio(text: Column, stopwords=None) -> Column:
    toks = tokens(text)
    sw = F.array(*[F.lit(s) for s in (stopwords or STOPWORDS)])
    hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return F.when(F.size(toks) == 0, F.lit(0.0)).otherwise(hits / F.size(toks).cast('double'))


def quality_score(text: Column) -> Column:
    """Deterministic [0,1] quality heuristic: length saturation,
    punctuation sanity, stopword presence.  Rounded to 6 dp so the Spark
    and DuckDB formulations hash identically."""
    length_term = F.least(F.lit(1.0), token_count(text) / F.lit(100.0))
    score = (
        F.lit(0.5) * length_term
        + F.lit(0.3) * (F.lit(1.0) - punct_ratio(text))
        + F.lit(0.2) * stopword_ratio(text)
    )
    return F.round(score, 6)


def lang_id(text: Column) -> Column:
    """Marker-token language heuristic: count hits per language, argmax
    with deterministic tie-break on language code order ('de' < 'en' < …
    alphabetical).  Returns a language code string."""
    toks = tokens(text)
    scores = []
    for lang in sorted(LANG_MARKERS):
        markers = F.array(*[F.lit(m) for m in LANG_MARKERS[lang]])
        hits = F.size(F.filter(toks, lambda t: F.array_contains(markers, t)))
        scores.append((lang, hits))
    # argmax via struct max: (hits, -ord) so ties break to alphabetically
    # first language; mirrored in SQL with greatest(struct...)
    best = F.greatest(*[F.struct(h.alias('h'), F.lit(-i).alias('o'), F.lit(lang).alias('l'))
                        for i, (lang, h) in enumerate(scores)])
    return F.when(best['h'] == 0, F.lit('und')).otherwise(best['l'])


def fingerprint(text: Column) -> Column:
    """Document fingerprint: md5 of the normal form (rolling-hash class;
    md5 chosen because Spark and DuckDB produce identical hex)."""
    return F.md5(normalized(text).cast('binary'))


def winnow_fingerprints(text: Column, k: int = 3, w: int = 4) -> Column:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken MOSS
    scheme): hash every k-token gram, slide a window of ``w`` consecutive
    gram hashes, keep each window's minimum, return the distinct selected
    hashes — a position-robust fingerprint set whose overlap estimates
    local similarity (guaranteed to catch matches ≥ w+k−1 tokens long).

    Pure expressions (sequence/transform/slice/array_min — one fused
    projection, no shuffle, no Python).  Gram hashes are the first 60 bits
    of md5 as LONG — computed directly rather than incrementally (the
    classic 'rolling' optimization is per-row CPU, irrelevant under
    whole-stage codegen), and replayable verbatim in DuckDB oracles.
    Docs shorter than k tokens fingerprint to an empty set; shorter than
    k+w−1 grams use the global minimum (one window).
    """
    toks = tokens(text)
    grams = F.when(F.size(toks) < k, F.array().cast('array<string>')).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - F.lit(k - 1)),
            lambda i: F.array_join(F.slice(toks, i, k), ' '),
        )
    )
    hashes = F.transform(
        grams, lambda g: F.conv(F.substring(F.md5(g), 1, 15), 16, 10).cast('long')
    )
    wins = (
        F.when(F.size(hashes) == 0, F.array().cast('array<long>'))
        .when(F.size(hashes) < w, F.array(F.array_min(hashes)))
        .otherwise(
            F.transform(
                F.sequence(F.lit(1), F.size(hashes) - F.lit(w - 1)),
                lambda i: F.array_min(F.slice(hashes, i, w)),
            )
        )
    )
    return F.array_distinct(wins)


# --------------------------------------------------------------- PII scrub
#
# Engine-portable patterns: explicit ASCII classes (never \d/\w, whose
# unicode semantics differ across regex engines), no lookaround — the same
# strings compile identically under Java regex and RE2 (DuckDB oracles).
# Order matters: emails first (their local part can contain digit runs),
# then SSN (3-2-4 beats the phone 3-3-4 only if applied before it), then
# phones.
PII_PATTERNS = [
    ('email', '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z][A-Za-z]+'),
    ('ssn', '[0-9]{3}-[0-9]{2}-[0-9]{4}'),
    ('phone', '[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}'),
]


def pii_counts(text: Column) -> dict:
    """Per-kind PII match counts — {'email': Column, 'ssn': ..., 'phone':
    ...}.  Counted in PII_PATTERNS order on the progressively-redacted
    text, so an SSN-shaped run inside a phone number is never double
    counted."""
    out = {}
    cur = text
    for kind, pat in PII_PATTERNS:
        out[kind] = F.regexp_count(cur, F.lit(pat))
        cur = F.regexp_replace(cur, pat, f'<{kind.upper()}>')
    return out


def redact_pii(text: Column) -> Column:
    """Replace every PII match with its ``<KIND>`` placeholder — the
    curation-stage scrub run before a corpus is eligible for training.
    Pure codegen expressions, zero shuffle; fuses into the scan."""
    cur = text
    for kind, pat in PII_PATTERNS:
        cur = F.regexp_replace(cur, pat, f'<{kind.upper()}>')
    return cur
