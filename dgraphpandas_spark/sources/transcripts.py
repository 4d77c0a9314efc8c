"""Deterministic synthetic transcript source (BASELINE.json input_hint /
FIXTURES.md F7).

Schema: ``conv_id:string, turn_idx:int, role:string, text:string,
tool:string, ts:timestamp`` — one row per turn of a multi-turn
conversation/agent transcript.

Design for scale (this is the bench input, must generate 10^7+ rows without
a driver bottleneck or a shuffle):

- conversations are generated as ``spark.range(n_convs)`` and their turn
  counts follow a deterministic Zipf(s) law over conversation rank —
  conversation 0 is the hottest (skew fixture for salting/AQE evidence);
- turns materialize via a two-level explode: conversations → fixed-size
  *chunks* (≤ ``chunk`` turns each), a hash ``repartition`` of the tiny chunk
  table (the ONLY shuffle, ~n_convs rows), then chunks → turns.  This keeps
  task sizes even no matter how hot a conversation is: a 200k-turn
  conversation becomes ~25 chunk rows spread across the cluster instead of
  one 200k-row straggler task.  Value-level skew (hot ``conv_id`` keys) is
  fully preserved for the salting/AQE skew fixtures; only task-size skew is
  removed — exactly what a 100 TB generator must do, since every downstream
  narrow stage inherits this layout;
- all "randomness" derives from ``xxhash64(..., seed)`` — same seed ⇒
  byte-identical output at any parallelism (deterministic-resume
  requirement, SURVEY §7 hard-list item 5; no Date.now/rand anywhere).

~``tool_rate`` of turns carry a non-null tool drawn from a ``n_tools``-entry
dictionary (broadcast-link fixture); ``null_text_rate`` of turns have null
text; text embeds quotes/newlines/percent to exercise the C7 scrub.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def zipf_turn_counts(n_convs: int, n_turns: int, s: float = 1.2, max_len: int = 100_000):
    """Driver-side closed form: turn count for conversation rank r is
    ``max(1, round(C / (r+1)^s))`` with C chosen so the total ≈ n_turns.
    Deterministic; returns the scale constant C."""
    import math

    harmonic = sum(1.0 / (r + 1) ** s for r in range(min(n_convs, 10_000)))
    if n_convs > 10_000:
        # integral tail approximation of the generalized harmonic number
        harmonic += ((n_convs ** (1 - s)) - (10_000 ** (1 - s))) / (1 - s)
    return n_turns / harmonic


def synthetic_transcripts(
    spark: SparkSession,
    n_turns: int,
    seed: int = 42,
    n_convs: int | None = None,
    zipf_s: float = 1.2,
    n_tools: int = 50,
    tool_rate: float = 0.30,
    null_text_rate: float = 0.02,
    partitions: int | None = None,
) -> DataFrame:
    if n_convs is None:
        n_convs = max(1, n_turns // 8)
    c = zipf_turn_counts(n_convs, n_turns, zipf_s)

    convs = spark.range(0, n_convs, 1, partitions or spark.sparkContext.defaultParallelism)
    convs = convs.select(
        F.concat(F.lit('c'), F.col('id')).alias('conv_id'),
        F.col('id').alias('conv_rank'),
        F.greatest(
            F.lit(1),
            F.round(F.lit(float(c)) / F.pow(F.col('id') + 1, F.lit(float(zipf_s)))).cast('int'),
        ).alias('n'),
    )

    # two-level explode: conversations → chunks (≤`chunk` turns) → turns.
    # The chunk repartition is a tiny shuffle (~n_convs rows) that evens out
    # task sizes; without it the hot Zipf head lands in one straggler task
    # and the whole shuffle-free pipeline runs single-threaded.
    chunk = 8192
    n_parts = partitions or spark.sparkContext.defaultParallelism
    chunks = convs.select(
        'conv_id',
        'conv_rank',
        'n',
        F.explode(F.expr(f'sequence(0L, (n - 1) div {chunk})')).alias('chunk_id'),
    ).repartition(n_parts, 'conv_id', 'chunk_id')
    turns = chunks.select(
        'conv_id',
        'conv_rank',
        F.explode(
            F.expr(f'sequence(chunk_id * {chunk}, least(n - 1, (chunk_id + 1) * {chunk} - 1))')
        ).alias('turn_idx'),
    )

    h = F.abs(F.xxhash64('conv_id', 'turn_idx', F.lit(seed)))
    word = lambda i: F.concat(F.lit('w'), F.pmod(F.abs(F.xxhash64('conv_id', 'turn_idx', F.lit(seed + i))), F.lit(997)))  # noqa: E731

    text = F.concat_ws(
        ' ',
        word(1), word(2), word(3), word(4),
        # exercise the illegal-character scrub deterministically
        F.when(F.pmod(h, 17) == 0, F.lit('she said "hi"')).otherwise(word(5)),
        F.when(F.pmod(h, 19) == 0, F.lit('100% done.')).otherwise(word(6)),
    )

    df = turns.select(
        'conv_id',
        F.col('turn_idx').cast('int').alias('turn_idx'),
        F.when(F.col('turn_idx') % 2 == 0, F.lit('user'))
        .when(F.pmod(h, 11) == 0, F.lit('tool'))
        .otherwise(F.lit('assistant'))
        .alias('role'),
        F.when(F.pmod(h, F.lit(int(1 / max(null_text_rate, 1e-9)))) == 0, F.lit(None).cast('string'))
        .otherwise(text)
        .alias('text'),
        F.when(
            F.pmod(h, 100) < int(tool_rate * 100),
            F.concat(F.lit('tool'), F.pmod(F.abs(F.xxhash64('conv_id', 'turn_idx', F.lit(seed + 7))), F.lit(n_tools))),
        )
        .otherwise(F.lit(None).cast('string'))
        .alias('tool'),
        (
            F.timestamp_seconds(
                F.lit(1767225600)  # 2026-01-01T00:00:00Z
                + F.col('conv_rank') * 3600
                + F.col('turn_idx') * 7
            )
        ).alias('ts'),
    )
    return df


def tool_dictionary(spark: SparkSession, n_tools: int = 50) -> DataFrame:
    """Broadcast-link fixture: maps raw tool names to canonical tool
    entities (e.g. alias collapsing).  Deterministic tiny dim table."""
    rows = []
    for i in range(n_tools):
        canonical = f'tool{i % (n_tools // 2 or 1)}'  # two aliases → one canonical
        rows.append((f'tool{i}', canonical, f'vendor{i % 7}'))
    return spark.createDataFrame(rows, 'tool_name string, canonical string, vendor string')


TRANSCRIPT_CONFIG = {
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
