"""Vocab encode (encode_tokens) and unigram LM scoring (unigram_logprob)
on crafted corpora with hand-computable expectations."""
from __future__ import annotations

import math

from pyspark.sql import functions as F

from dgraphpandas_spark.operators.curation import build_vocab, encode_tokens, unigram_logprob


def test_encode_tokens_order_and_oov(spark):
    docs = spark.createDataFrame(
        [(1, 'the cat sat on the mat'), (2, 'zzz the cat')],
        'doc_id int, text string',
    )
    # vocab: every token occurring >= 2 times → the(3), cat(2); ids by count desc
    vocab = build_vocab(docs, k=10, min_count=2)
    v = {r['token']: r['token_id'] for r in vocab.collect()}
    assert v == {'the': 1, 'cat': 2}
    enc = {r['id']: r for r in encode_tokens(docs, vocab).collect()}
    assert enc[1]['ids'] == [1, 2, 0, 0, 1, 0]   # order preserved, OOV → 0
    assert (enc[1]['n_tokens'], enc[1]['n_oov']) == (6, 3)
    assert enc[2]['ids'] == [0, 1, 2]
    assert (enc[2]['n_tokens'], enc[2]['n_oov']) == (3, 1)


def test_unigram_logprob_matches_closed_form(spark):
    docs = spark.createDataFrame([(1, 'a a b'), (2, 'a')], 'doc_id int, text string')
    out = {r['id']: r for r in unigram_logprob(docs).collect()}
    # corpus: a×3, b×1, total 4 → p(a)=.75, p(b)=.25; micro-nat quantized
    mu_a = round(math.log(0.75) * 1e6)
    mu_b = round(math.log(0.25) * 1e6)
    assert out[1]['n_tokens'] == 3
    assert out[1]['avg_logprob'] == round(((2 * mu_a + mu_b) / 3) / 1e6, 6)
    assert out[2]['n_tokens'] == 1
    assert out[2]['avg_logprob'] == round(mu_a / 1e6, 6)
    # prose made of frequent words must outscore rare-token soup
    assert out[2]['avg_logprob'] > out[1]['avg_logprob']


def test_chunk_documents_windows_and_overlap(spark):
    from dgraphpandas_spark.operators.curation import chunk_documents

    # 7 tokens, size 4, stride 3 → windows at 0, 3, 6
    docs = spark.createDataFrame([(1, 'a b c d e f g')], 'doc_id int, text string')
    got = {
        r['chunk_idx']: (r['chunk_text'], r['n_chunk_tokens'])
        for r in chunk_documents(docs, size=4, stride=3).collect()
    }
    assert got == {
        0: ('a b c d', 4),   # full window
        1: ('d e f g', 4),   # 1-token overlap with previous (size - stride)
        2: ('g', 1),         # short tail window kept
    }


def test_chunk_documents_short_doc_single_window(spark):
    from dgraphpandas_spark.operators.curation import chunk_documents

    docs = spark.createDataFrame([(1, 'x y')], 'doc_id int, text string')
    got = chunk_documents(docs, size=8, stride=6).collect()
    assert len(got) == 1 and got[0]['chunk_text'] == 'x y'


def test_bigram_logprob_self_scored_closed_form(spark):
    from dgraphpandas_spark.operators.curation import bigram_logprob

    docs = spark.createDataFrame(
        [(1, 'a b a b'), (2, 'a b c')], 'doc_id int, text string'
    )
    # train == score: bigram counts ab=3, ba=1, bc=1; unigram a=3, b=3, c=1
    out = {r['id']: (r['n_bigrams'], r['avg_logprob'])
           for r in bigram_logprob(docs).collect()}

    def micro(x):
        return float(round(math.log(x) * 1e6))

    # doc 1: ab, ba, ab → (2·ln(3/3) + ln(1/3)) / 3
    exp1 = round((2 * micro(3 / 3) + micro(1 / 3)) / 3 / 1e6, 6)
    # doc 2: ab, bc → (ln(3/3) + ln(1/3)) / 2
    exp2 = round((micro(3 / 3) + micro(1 / 3)) / 2 / 1e6, 6)
    assert out == {1: (3, exp1), 2: (2, exp2)}


def test_bigram_logprob_backoff_branches(spark):
    from dgraphpandas_spark.operators.curation import bigram_logprob

    train = spark.createDataFrame([(1, 'a b a b'), (2, 'b c')],
                                  'doc_id int, text string')
    held = spark.createDataFrame([(10, 'a c'), (11, 'a zzz')],
                                 'doc_id int, text string')
    out = {r['id']: (r['n_bigrams'], r['avg_logprob'])
           for r in bigram_logprob(held, train_df=train).collect()}
    # train: bigrams ab=2, ba=1, bc=1; unigrams a=2, b=3, c=1; total=6
    am = float(round(math.log(0.4) * 1e6))

    def micro(x):
        return float(round(math.log(x) * 1e6))

    # doc 10: bigram 'a c' unseen, c in vocab → ln(0.4) + ln(1/6)
    exp10 = round((am + micro(1 / 6)) / 1 / 1e6, 6)
    # doc 11: 'a zzz' unseen, zzz OOV → ln(0.4) + ln(1/6)  (floor = 1/total)
    exp11 = round((am + micro(1 / 6)) / 1 / 1e6, 6)
    assert out == {10: (1, exp10), 11: (1, exp11)}
