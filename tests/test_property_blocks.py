"""Property fuzz of block-level dedup against an inline DuckDB mirror:
random tiny corpora with forced cross-doc repetition, random block sizes,
and trailing partial blocks — the operator and the SQL must agree on
every draw (kept counts AND reassembled-text fingerprints)."""
from __future__ import annotations

import os

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from dgraphpandas_spark.operators.dedup import block_dedup

_EXAMPLES = int(os.environ.get('HYPOTHESIS_MAX_EXAMPLES', '25')) // 2 or 1

# tiny vocabulary → frequent cross-doc block collisions by construction
_WORD = st.sampled_from(['aa', 'bb', 'cc', 'dd'])
_DOC = st.lists(_WORD, min_size=1, max_size=12).map(' '.join)


@st.composite
def corpus(draw):
    docs = draw(st.lists(_DOC, min_size=1, max_size=6))
    block = draw(st.integers(min_value=1, max_value=4))
    return docs, block


@pytest.fixture(scope='module')
def con():
    return duckdb.connect()


_SQL = """
WITH toks AS (SELECT doc_id, string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS t FROM docs),
blk AS (SELECT doc_id, i AS pos,
               array_to_string(t[(i * {b} + 1):(i * {b} + {b})], ' ') AS btext
        FROM toks, unnest(range(0, CAST(ceil(len(t) / {b}.0) AS INT))) AS u(i)),
h AS (SELECT doc_id, pos, btext, md5(btext) AS bh FROM blk),
dup AS (SELECT bh FROM h GROUP BY bh HAVING count(DISTINCT doc_id) > 1),
kept AS (SELECT h.* FROM h LEFT JOIN dup USING (bh) WHERE dup.bh IS NULL),
agg AS (SELECT doc_id, count(*) AS n_kept,
               string_agg(btext, ' ' ORDER BY pos) AS clean FROM kept GROUP BY 1),
nb AS (SELECT doc_id, CAST(ceil(len(t) / {b}.0) AS INT) AS n_blocks FROM toks)
SELECT nb.doc_id, nb.n_blocks,
       CAST(coalesce(agg.n_kept, 0) AS BIGINT) AS n_kept,
       md5(coalesce(agg.clean, '')) AS clean_fp
FROM nb LEFT JOIN agg USING (doc_id)
"""


@settings(
    max_examples=_EXAMPLES,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(case=corpus())
def test_block_dedup_matches_duckdb(spark, con, case):
    docs, block = case
    rows = [(i, d) for i, d in enumerate(docs)]
    df = spark.createDataFrame(rows, 'doc_id int, text string')
    got = sorted(tuple(r) for r in block_dedup(df, block=block, max_docs=1).collect())

    con.execute('DROP TABLE IF EXISTS docs')
    con.execute('CREATE TABLE docs(doc_id INT, text VARCHAR)')
    con.executemany('INSERT INTO docs VALUES (?, ?)', rows)
    want = sorted(tuple(r) for r in con.execute(_SQL.format(b=block)).fetchall())
    assert got == want
