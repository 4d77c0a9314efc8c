"""Property fuzz of pack_sequences against an inline DuckDB mirror —
regression harness for the round-3 `corpus_pack` hash mismatch: the
packing window must be a TOTAL order even under duplicate doc ids,
adversarial whitespace, empty / whitespace-only / NULL texts, so the two
engines agree row-for-row on (shard, start_offset, pack_id)."""
from __future__ import annotations

import os

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from dgraphpandas_spark.operators.curation import pack_sequences

_EXAMPLES = int(os.environ.get('HYPOTHESIS_MAX_EXAMPLES', '25')) // 2 or 1

_WORD = st.sampled_from(['aa', 'bb', 'héllo', '日本語', 'x'])
_WS = st.sampled_from([' ', '  ', '\t', '\n', '\r\n', ' \t '])


@st.composite
def _text(draw):
    kind = draw(st.integers(min_value=0, max_value=9))
    if kind == 0:
        return None
    if kind == 1:
        return ''
    if kind == 2:
        return draw(_WS)  # whitespace-only
    words = draw(st.lists(_WORD, min_size=1, max_size=8))
    seps = [draw(_WS) for _ in range(len(words) - 1)]
    body = words[0] + ''.join(s + w for s, w in zip(seps, words[1:]))
    return draw(_WS) * draw(st.integers(0, 1)) + body + draw(_WS) * draw(
        st.integers(0, 1)
    )


@st.composite
def corpus(draw):
    n = draw(st.integers(min_value=1, max_value=10))
    # ids drawn from a tiny range → duplicate ids by construction
    rows = [(draw(st.integers(0, 3)), draw(_text())) for _ in range(n)]
    cap = draw(st.sampled_from([1, 2, 5]))
    return rows, cap


@pytest.fixture(scope='module')
def con():
    return duckdb.connect()


# mirrors operators/curation.py pack_sequences: md5-bucket shard, token
# count with empty/null→0, TOTAL order (doc_id, n_tokens, md5(text))
_SQL = """
WITH t AS (SELECT doc_id,
                  COALESCE(CASE WHEN length(trim(text)) = 0 THEN 0
                                ELSE len(string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) END,
                           0)::bigint AS n_tokens,
                  md5(COALESCE(text, '')) AS tie,
                  ('0x' || substr(md5(doc_id::varchar), 1, 8))::bigint % 4 AS shard
           FROM docs),
o AS (SELECT shard, doc_id, n_tokens,
             sum(n_tokens) OVER (PARTITION BY shard
                                 ORDER BY doc_id ASC NULLS FIRST,
                                          n_tokens ASC NULLS FIRST,
                                          tie ASC NULLS FIRST
                                 ROWS UNBOUNDED PRECEDING) - n_tokens AS start_offset
      FROM t)
SELECT shard, doc_id, n_tokens, start_offset, start_offset // {cap} AS pack_id
FROM o
"""


@settings(
    max_examples=_EXAMPLES,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(case=corpus())
def test_pack_sequences_matches_duckdb(spark, con, case):
    rows, cap = case
    df = spark.createDataFrame(rows, 'doc_id int, text string')
    got = sorted(
        (r['shard'], r['doc_id'], r['n_tokens'], r['start_offset'], r['pack_id'])
        for r in pack_sequences(df, capacity=cap, n_shards=4).collect()
    )

    con.execute('DROP TABLE IF EXISTS docs')
    con.execute('CREATE TABLE docs(doc_id INT, text VARCHAR)')
    con.executemany('INSERT INTO docs VALUES (?, ?)', rows)
    want = sorted(tuple(r) for r in con.execute(_SQL.format(cap=cap)).fetchall())
    assert got == want
