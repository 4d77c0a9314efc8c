"""BPE trainer/encoder (operators/curation.py:bpe_train/bpe_apply):
hand-computed merge sequences, greedy-overlap semantics, early stop, and
a hypothesis fuzz against a generated DuckDB CTE mirror (the same
replay the corpus_bpe oracle uses)."""
from __future__ import annotations

import os

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from dgraphpandas_spark.operators.curation import bpe_apply, bpe_train

_EXAMPLES = int(os.environ.get('HYPOTHESIS_MAX_EXAMPLES', '25')) // 2 or 1


def test_bpe_train_hand_computed_merges(spark):
    # corpus: low(5) lower(2) newest(6) widest(3) — the classic Sennrich
    # toy reduced: 'lo' dominates, then 'low', then 'est' family
    rows = [(1, ' '.join(['low'] * 5 + ['lower'] * 2 + ['newest'] * 6 + ['widest'] * 3))]
    df = spark.createDataFrame(rows, 'doc_id int, text string')
    m = [tuple(r) for r in bpe_train(df, n_merges=4).orderBy('rank').collect()]
    # round 1: pairs — (l,o):7, (o,w):7, (e,s):9, (s,t):9, (w,e):8, ...
    # argmax tie (e,s) vs (s,t) at 9 → lexicographic: (e,s)
    assert m[0] == (1, 'e', 's', 'es', 9)
    # round 2: (es,t):9 wins
    assert m[1] == (2, 'es', 't', 'est', 9)
    # round 3: (l,o):7 and (o,w):7 tie → (l,o)
    assert m[2] == (3, 'l', 'o', 'lo', 7)
    # round 4: (lo,w):7
    assert m[3] == (4, 'lo', 'w', 'low', 7)


def test_bpe_greedy_leftmost_nonoverlapping(spark):
    # 'aaaa' with merge (a,a) must segment as [aa][aa], 'aaa' as [aa][a]
    df = spark.createDataFrame([(1, 'aaaa aaaa aaa')], 'doc_id int, text string')
    m = bpe_train(df, n_merges=1)
    row = m.collect()[0]
    assert (row['left'], row['right'], row['merged']) == ('a', 'a', 'aa')
    # pair count: greedy positions — 'aaaa' has 3 adjacent pairs × 2 docs?
    # no: count is over ALL adjacent index pairs: aaaa→3, aaa→2 ⇒ 3·2+2=8
    assert row['pair_count'] == 8
    seg = {r['id']: r for r in bpe_apply(df, m).collect()}
    assert seg[1]['subwords'] == ['aa', 'aa', 'aa', 'aa', 'aa', 'a']
    assert seg[1]['n_words'] == 3 and seg[1]['n_subwords'] == 6


def test_bpe_early_stop_when_pairs_exhausted(spark):
    # single repeated char word collapses quickly; single-char words have
    # no pairs at all → fewer merges than requested, never an error
    df = spark.createDataFrame([(1, 'ab ab')], 'doc_id int, text string')
    m = [tuple(r) for r in bpe_train(df, n_merges=10).orderBy('rank').collect()]
    assert m == [(1, 'a', 'b', 'ab', 2)]
    df1 = spark.createDataFrame([(1, 'a b c')], 'doc_id int, text string')
    assert bpe_train(df1, n_merges=3).count() == 0


def test_bpe_apply_is_single_projection_until_regroup(spark):
    """The merge replay must compile into one chained-replace projection:
    no exchange before the per-doc regroup (the only shuffle)."""
    import contextlib
    import io

    df = spark.createDataFrame([(1, 'aa ab'), (2, 'bb aa')], 'doc_id int, text string')
    m = bpe_train(df, n_merges=3)
    out = bpe_apply(df, m)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain()
    plan = buf.getvalue()
    assert plan.count('Exchange') == 1, plan


# --- fuzz vs a generated DuckDB CTE mirror (same shape as the oracle) ---

_WORD = st.sampled_from(['ab', 'aab', 'abab', 'ba', 'bb', 'a', 'aaaa'])
_DOC = st.lists(_WORD, min_size=1, max_size=10).map(' '.join)


def _mirror_sql(n_merges: int) -> str:
    ctes = [
        """w0 AS MATERIALIZED (SELECT cnt, chr(1) || array_to_string(string_split(word, ''), chr(1)||chr(1)) || chr(1) AS s
       FROM (SELECT word, count(*)::bigint AS cnt
             FROM (SELECT unnest(string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) AS word FROM docs) u
             WHERE word <> '' GROUP BY 1) g)"""
    ]
    for k in range(1, n_merges + 1):
        ctes.append(
            f"""p{k} AS MATERIALIZED (SELECT syms[i] AS l, syms[i+1] AS r, sum(cnt)::bigint AS c
         FROM (SELECT cnt, string_split(substring(s, 2, length(s) - 2), chr(1)||chr(1)) AS syms FROM w{k - 1}) t,
              unnest(range(1, len(syms))) AS u(i) GROUP BY 1, 2)"""
        )
        ctes.append(f"b{k} AS MATERIALIZED (SELECT l, r, c FROM p{k} ORDER BY c DESC, l ASC, r ASC LIMIT 1)")
        ctes.append(
            f"""w{k} AS MATERIALIZED (SELECT cnt, replace(s,
               chr(1) || (SELECT l FROM b{k}) || chr(1) || chr(1) || (SELECT r FROM b{k}) || chr(1),
               chr(1) || (SELECT l FROM b{k}) || (SELECT r FROM b{k}) || chr(1)) AS s FROM w{k - 1})"""
        )
    union = '\nUNION ALL\n'.join(
        f'SELECT {k} AS rk, l, r, c FROM b{k}' for k in range(1, n_merges + 1)
    )
    return 'WITH ' + ',\n'.join(ctes) + '\n' + union


@pytest.fixture(scope='module')
def con():
    return duckdb.connect()


@settings(
    max_examples=_EXAMPLES,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(docs=st.lists(_DOC, min_size=1, max_size=5), n=st.integers(1, 4))
def test_bpe_train_matches_duckdb(spark, con, docs, n):
    rows = [(i, d) for i, d in enumerate(docs)]
    df = spark.createDataFrame(rows, 'doc_id int, text string')
    got = sorted(
        (r['rank'], r['left'], r['right'], r['pair_count'])
        for r in bpe_train(df, n_merges=n).collect()
    )
    con.execute('DROP TABLE IF EXISTS docs')
    con.execute('CREATE TABLE docs(doc_id INT, text VARCHAR)')
    con.executemany('INSERT INTO docs VALUES (?, ?)', rows)
    want = sorted(tuple(r) for r in con.execute(_mirror_sql(n)).fetchall())
    assert got == want


def _py_bpe_train(word_freq: dict, n_merges: int) -> list:
    """Independent pure-Python sequential BPE trainer (the differential
    oracle for the trie path): per round count adjacent pairs weighted by
    word frequency, take argmax under (count DESC, left ASC, right ASC),
    merge greedy leftmost non-overlapping in every word."""
    words = {tuple(w): f for w, f in word_freq.items()}
    merges = []
    for _ in range(n_merges):
        counts: dict = {}
        for syms, f in words.items():
            i = 0
            while i < len(syms) - 1:
                counts[(syms[i], syms[i + 1])] = counts.get((syms[i], syms[i + 1]), 0) + f
                i += 1
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        (l, r), _n = best
        merges.append((l, r))
        new_words = {}
        for syms, f in words.items():
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_words[tuple(out)] = new_words.get(tuple(out), 0) + f
        words = new_words
    return merges


def test_bpe_apply_trie_matches_replace_at_200_merges(spark):
    """Round-4 verdict item #5: the broadcast merge-trie mapInPandas encode
    must be bit-identical to the chained-replace path at a production-ish
    merge count (200), including n_words/n_subwords and subword order."""
    import itertools

    # deterministic Zipf-ish corpus: 60 distinct pseudo-words over a 6-char
    # alphabet, repeated with decaying frequency across 40 docs
    alpha = 'abcdefgh'
    vocab = [''.join(p) for n in (3, 4, 5) for p in itertools.product(alpha, repeat=n)]
    vocab = vocab[::11][:200]
    docs = []
    for d in range(40):
        ws = [vocab[(d * 13 + j * j) % len(vocab)] for j in range(40)]
        docs.append((d, ' '.join(ws)))
    df = spark.createDataFrame(docs, 'doc_id long, text string')

    freq: dict = {}
    for _, text in docs:
        for w in text.split():
            freq[w] = freq.get(w, 0) + 1
    merges = _py_bpe_train(freq, 200)
    assert len(merges) == 200, f'corpus too small, only {len(merges)} merges'
    mdf = spark.createDataFrame(
        [(i + 1, l, r, l + r, 0) for i, (l, r) in enumerate(merges)],
        'rank long, left string, right string, merged string, pair_count long',
    )

    a = {r['id']: (r['n_words'], r['n_subwords'], tuple(r['subwords']))
         for r in bpe_apply(df, mdf, method='replace').collect()}
    b = {r['id']: (r['n_words'], r['n_subwords'], tuple(r['subwords']))
         for r in bpe_apply(df, mdf, method='trie').collect()}
    assert a == b
    assert len(a) == 40
    # sanity: merges actually fired (subwords shorter than characters)
    assert all(v[1] < sum(len(w) for w in docs[k][1].split()) for k, v in a.items())


def test_bpe_apply_bad_method_raises(spark):
    df = spark.createDataFrame([(1, 'aa bb')], 'doc_id long, text string')
    mdf = spark.createDataFrame(
        [(1, 'a', 'a', 'aa', 2)],
        'rank long, left string, right string, merged string, pair_count long',
    )
    with pytest.raises(ValueError, match='trie'):
        bpe_apply(df, mdf, method='nope')
