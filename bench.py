"""Benchmark harness — one JSON line to stdout.

Headline: the transcript KG pipeline (BASELINE.json north_star) — melt →
triple refine → canonicalize (conversation edges, broadcast tool linking,
tool/conversation nodes) over a deterministic Zipf-skewed synthetic
transcript table sized by SF, forced through a checksum aggregation (so
column pruning cannot fake the work), plus representative testdata queries.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS   (default 32).

Scaling evidence (BENCH/BASELINE.md): run with SPARK_GRAFT_CPUS=8 and =32 on
the same input; efficiency = (throughput@32 / throughput@8) / 4.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from dgraphpandas_spark import horizontal_transform
from dgraphpandas_spark.operators.canonicalize import (
    conversation_edges,
    conversation_nodes,
    link_entities,
    tool_nodes,
)
from dgraphpandas_spark.session import get_spark
from dgraphpandas_spark.sources.transcripts import (
    TRANSCRIPT_CONFIG,
    synthetic_transcripts,
    tool_dictionary,
)

def CHECKSUM():
    # built lazily — Column construction needs an active SparkContext
    return [F.count('*').alias('n'), F.bit_xor(F.xxhash64('subject', 'predicate', 'object')).alias('ck')]


def sf_of(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip('/'))
    try:
        return float(base.replace('sf', ''))
    except ValueError:
        return 0.1


def bench_transcript_kg(spark, n_turns: int):
    """Full north_star pipeline; returns (elapsed_sec, n_triples)."""
    t0 = time.time()
    transcripts = synthetic_transcripts(spark, n_turns=n_turns, seed=42)
    intrinsic, edges = horizontal_transform(
        transcripts, TRANSCRIPT_CONFIG, 'turn', assume_unique_subjects=True
    )
    dictionary = tool_dictionary(spark, 50).select(
        F.concat(F.lit('tool_'), F.col('tool_name')).alias('raw'),
        F.concat(F.lit('tool_'), F.col('canonical')).alias('canonical'),
    )
    linked = link_entities(edges, dictionary, target_predicates=['tool'])
    all_edges = linked.unionByName(conversation_edges(transcripts))
    all_intrinsic = intrinsic.unionByName(conversation_nodes(transcripts)).unionByName(
        tool_nodes(linked)
    )
    res_i = all_intrinsic.agg(*CHECKSUM()).collect()[0]
    res_e = all_edges.agg(*CHECKSUM()).collect()[0]
    elapsed = time.time() - t0
    return elapsed, int(res_i['n']) + int(res_e['n'])


def main():
    sf_dir = os.environ.get('SPARK_GRAFT_SF_DIR', '/root/testdata/sf0.1')
    cpus = int(os.environ.get('SPARK_GRAFT_CPUS', '32'))
    sf = sf_of(sf_dir)
    n_turns = max(10_000, int(10_000_000 * sf))

    spark = get_spark(app_name=f'bench-local[{cpus}]', master=f'local[{cpus}]',
                      shuffle_partitions=max(cpus * 2, 8))
    spark.sparkContext.setLogLevel('ERROR')

    queries = {}
    t0 = time.time()

    el, n_triples = bench_transcript_kg(spark, n_turns)
    queries['kg_transcripts'] = round(el, 3)

    import __spark_entry__ as entry

    t = time.time()
    entry.q_kg_events_intrinsic(spark, sf_dir).agg(*CHECKSUM()).collect()
    queries['kg_events_intrinsic'] = round(time.time() - t, 3)

    t = time.time()
    entry.q_kg_orders_composite(spark, sf_dir).agg(*CHECKSUM()).collect()
    queries['kg_orders_composite'] = round(time.time() - t, 3)

    t = time.time()
    entry.q_kg_upserts_customer(spark, sf_dir).agg(
        F.count('*').alias('n'), F.bit_xor(F.xxhash64('line')).alias('ck')
    ).collect()
    queries['kg_upserts_customer'] = round(time.time() - t, 3)

    t = time.time()
    entry.q_dedup_minhash_lsh(spark, sf_dir).count()
    queries['dedup_minhash_lsh'] = round(time.time() - t, 3)

    t = time.time()
    entry.q_text_stats(spark, sf_dir).agg(F.bit_xor(F.xxhash64('fp', 'lang_pred', 'n_tokens'))).collect()
    queries['text_stats'] = round(time.time() - t, 3)

    t = time.time()
    entry.q_ann_cosine_topk(spark, sf_dir).collect()
    queries['ann_cosine_topk'] = round(time.time() - t, 3)

    total = round(time.time() - t0, 3)
    print(json.dumps({
        'metric': 'e2e_sec',
        'value': total,
        'unit': 'sec',
        'queries': queries,
        'sf': sf,
        'cpus': cpus,
        'n_turns': n_turns,
        'kg_triples': n_triples,
        'kg_triples_per_sec': round(n_triples / queries['kg_transcripts'], 1),
    }))
    spark.stop()


if __name__ == '__main__':
    main()
