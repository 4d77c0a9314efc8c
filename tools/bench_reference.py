"""Measure the REFERENCE (pandas) pipeline's single-node throughput on the
same materialized transcript input the Spark bench uses, for the
match-or-beat comparison in BENCH/BASELINE.md.

The reference publishes no benchmark numbers anywhere in its repo
(BASELINE.md), so this measures it directly: load the bench parquet into
one pandas frame, run horizontal_transform + generate_upserts (the full
reference pipeline — it has no canonicalization stage), report triples/sec.

Usage: python tools/bench_reference.py [n_turns]  (default 1_000_000;
       requires the Spark bench to have materialized the input, or runs
       bench.py's generator first)
"""
from __future__ import annotations

import glob
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, '/root/reference')

CONFIG = {
    'transform': 'horizontal',
    'files': {
        'turn': {
            'subject_fields': ['conv_id', 'turn_idx'],
            'edge_fields': ['tool'],
            'type_overrides': {'turn_idx': 'int32', 'ts': 'datetime64[ns]'},
            'date_fields': {'ts': {'format': '%Y-%m-%dT%H:%M:%S'}},
        }
    },
}


def main():
    import pandas as pd

    n_turns = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    src = f'/tmp/dgraphpandas_spark_bench/transcripts_{n_turns}.parquet'
    if not os.path.exists(os.path.join(src, '_SUCCESS')):
        from bench import materialize_source
        from dgraphpandas_spark.session import get_spark

        spark = get_spark(master='local[16]')
        spark.sparkContext.setLogLevel('ERROR')
        materialize_source(spark, n_turns, '/tmp/dgraphpandas_spark_bench')
        spark.stop()

    parts = sorted(glob.glob(os.path.join(src, 'part-*.parquet')))
    pdf = pd.concat([pd.read_parquet(p) for p in parts], ignore_index=True)

    from dgraphpandas.strategies.horizontal import horizontal_transform
    from dgraphpandas.writers.upserts import generate_upserts

    t0 = time.time()
    intrinsic, edges = horizontal_transform(pdf, CONFIG, 'turn')
    il, el = generate_upserts(intrinsic, edges)
    elapsed = time.time() - t0
    n = len(il) + len(el)
    print(json.dumps({
        'engine': 'reference-pandas',
        'n_turns': len(pdf),
        'wall_sec': round(elapsed, 2),
        'triples': n,
        'triples_per_sec': round(n / elapsed, 1),
    }))


if __name__ == '__main__':
    main()
