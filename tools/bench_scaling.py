"""Scaling-evidence harness: run bench.py at two parallelism levels
(local[8] vs local[32] — the sandbox proxy for N vs 4N executors per
BASELINE.md) on the same input, compute throughput scaling efficiency,
write BENCH/BASELINE.md.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(cpus: int, sf_dir: str) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus), SPARK_GRAFT_SF_DIR=sf_dir)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, 'bench.py')],
        env=env, capture_output=True, text=True, timeout=3600,
    )
    line = out.stdout.strip().splitlines()[-1]
    return json.loads(line)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get('SPARK_GRAFT_SF_DIR', '/root/testdata/sf0.1')
    r8 = run(8, sf_dir)
    r32 = run(32, sf_dir)

    tp8 = r8['kg_triples_per_sec']
    tp32 = r32['kg_triples_per_sec']
    eff = (tp32 / tp8) / 4.0

    os.makedirs(os.path.join(REPO, 'BENCH'), exist_ok=True)
    lines = [
        '# BENCH/BASELINE.md — measured throughput + scaling evidence',
        '',
        'Scaling rule (BASELINE.json north_rule): throughput scaling efficiency',
        '≥ 0.8 between N and 4N executors.  Sandbox proxy per task instructions:',
        'same job, same input, `local[8]` vs `local[32]` (host has 32 cores).',
        '',
        f'Input: deterministic Zipf-skewed synthetic transcripts, n_turns={r8["n_turns"]:,}',
        f'(seed 42), sf dir `{sf_dir}`; KG pipeline = melt → 16-step refine →',
        'canonicalize (broadcast tool link + conversation edges/nodes) → checksum agg.',
        '',
        '| parallelism | kg wall (s) | kg triples | triples/sec | e2e all queries (s) |',
        '|---|---|---|---|---|',
        f"| local[8]  (N)  | {r8['queries']['kg_transcripts']} | {r8['kg_triples']:,} | {tp8:,.0f} | {r8['value']} |",
        f"| local[32] (4N) | {r32['queries']['kg_transcripts']} | {r32['kg_triples']:,} | {tp32:,.0f} | {r32['value']} |",
        '',
        f'**Scaling efficiency = (throughput@32 / throughput@8) / 4 = {eff:.3f}**',
        '',
        '## Per-query seconds',
        '',
        '| query | local[8] | local[32] |',
        '|---|---|---|',
    ]
    for q in r8['queries']:
        lines.append(f"| {q} | {r8['queries'][q]} | {r32['queries'].get(q, '—')} |")
    lines += [
        '',
        '## Raw JSON',
        '',
        '```json',
        json.dumps(r8),
        json.dumps(r32),
        '```',
        '',
    ]
    path = os.path.join(REPO, 'BENCH', 'BASELINE.md')
    with open(path, 'w') as f:
        f.write('\n'.join(lines))
    print(json.dumps({'efficiency': round(eff, 3), 'tp8': tp8, 'tp32': tp32, 'written': path}))


if __name__ == '__main__':
    main()
