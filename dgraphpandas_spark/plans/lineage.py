"""Materialization + per-partition lineage + idempotent resume
(north_star additions; the reference's closest analogue is the chunked-file
loop at /root/reference/dgraphpandas/rdf.py:77-80 — batch incremental,
SURVEY §2.9/§4).

Layout under ``output_dir``:

    data/conv_bucket=NN/part-*.parquet   triple rows for one bucket
    manifest/bucket=NN.json              committed lineage row per bucket

A bucket's manifest row is written only after its data is fully on disk and
re-read (read-back verification), so the manifest IS the commit marker.
Resume = process only buckets without a manifest row; dynamic partition
overwrite makes a re-run of a half-written bucket byte-identical (the
pipeline is deterministic end-to-end: hash-derived salts, no Date.now/rand).

Buckets come from ``pmod(xxhash64(bucket_key), n_buckets)`` — the same
Iceberg-style ``bucket(N, conv_id)`` layout, Parquet-backed because this
sandbox has no Iceberg runtime jars (BASELINE.md); swap the writer for an
Iceberg table when the runtime is present.
"""
from __future__ import annotations

import json
import os
from typing import Callable, Dict, List, Optional

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

BUCKET_COL = 'conv_bucket'


def with_bucket(df: DataFrame, n_buckets: int, bucket_key: str = 'subject') -> DataFrame:
    return df.withColumn(BUCKET_COL, F.pmod(F.xxhash64(F.col(bucket_key)), F.lit(n_buckets)).cast('int'))


def committed_buckets(output_dir: str) -> List[int]:
    mdir = os.path.join(output_dir, 'manifest')
    if not os.path.isdir(mdir):
        return []
    out = []
    for name in os.listdir(mdir):
        if name.startswith('bucket=') and name.endswith('.json'):
            out.append(int(name[len('bucket='):-len('.json')]))
    return sorted(out)


def load_manifest(output_dir: str) -> Dict[int, dict]:
    mdir = os.path.join(output_dir, 'manifest')
    rows: Dict[int, dict] = {}
    for b in committed_buckets(output_dir):
        with open(os.path.join(mdir, f'bucket={b}.json')) as f:
            rows[b] = json.load(f)
    return rows


def _commit_manifest(output_dir: str, rows: List[dict]) -> None:
    mdir = os.path.join(output_dir, 'manifest')
    os.makedirs(mdir, exist_ok=True)
    for row in rows:
        path = os.path.join(mdir, f"bucket={row['bucket']}.json")
        tmp = path + '.tmp'
        with open(tmp, 'w') as f:
            json.dump(row, f)
        os.replace(tmp, path)  # atomic commit marker


def materialize_triples(
    triples: DataFrame,
    output_dir: str,
    n_buckets: int = 64,
    bucket_key: str = 'subject',
    stage: str = 'triples',
    waves: int = 1,
    fail_after_wave: Optional[int] = None,
    verify: bool = True,
) -> Dict[int, dict]:
    """Write the triple frame partitioned by conv bucket, committing a
    lineage manifest row per bucket; resumes idempotently.

    ``waves`` splits pending buckets into groups committed independently
    (checkpoint granularity); ``fail_after_wave`` is a test hook simulating
    a mid-run crash.  Returns the full manifest after this run.

    ``verify=True`` re-reads every written bucket once to derive the
    manifest's rows/checksum from the files as persisted (integrity over
    speed).  At the 100-TB scale that read-back is a full extra pass over
    the output; ``verify=False`` skips it and commits manifest rows with
    ``verified: false`` and total (not per-bucket) row counts observed for
    free on the write action — the commit-marker/resume contract is
    unchanged.  Cost model: PLANS.md §6.
    """
    spark = triples.sparkSession
    done = set(committed_buckets(output_dir))
    pending = [b for b in range(n_buckets) if b not in done]
    if not pending:
        return load_manifest(output_dir)

    data_dir = os.path.join(output_dir, 'data')
    bucketed = with_bucket(triples, n_buckets, bucket_key)

    wave_size = max(1, (len(pending) + waves - 1) // waves)
    # globally monotonic wave ids: a resumed run continues AFTER the crashed
    # run's last committed wave, so the manifest's wave sequence is a valid
    # snapshot history across restarts (read_snapshot/snapshot_log rely on
    # this — the Iceberg-snapshot-id analogue)
    wave_base = (
        max((row.get('wave', 0) for row in load_manifest(output_dir).values()), default=-1) + 1
    )
    spark.conf.set('spark.sql.sources.partitionOverwriteMode', 'dynamic')

    import time as _time

    for w in range(0, len(pending), wave_size):
        wave_t0 = _time.time()
        wave_buckets = pending[w:w + wave_size]
        subset = bucketed.filter(F.col(BUCKET_COL).isin(wave_buckets))
        obs = Observation()
        (
            # hash-repartition on the bucket column BEFORE partitionBy:
            # without it every task writes a file into every bucket dir
            # (tasks × buckets small files — fatal at scale); with it each
            # bucket is written by exactly one task → one file per bucket,
            # and n_buckets (not task count) is the file-count knob
            subset.observe(obs, F.count(F.lit(1)).alias('rows'))
            .repartition(F.col(BUCKET_COL))
            .write.mode('overwrite')
            .partitionBy(BUCKET_COL)
            .parquet(data_dir)
        )
        stats_by_bucket = {}
        if verify:
            # read-back verification: lineage metrics come from the files as
            # written, not from the in-flight computation
            written = spark.read.parquet(data_dir).filter(F.col(BUCKET_COL).isin(wave_buckets))
            stats = (
                written.groupBy(BUCKET_COL)
                .agg(
                    F.count('*').alias('rows'),
                    # XOR fold: order-independent, overflow-free (ANSI-safe)
                    F.bit_xor(F.xxhash64('subject', 'predicate', 'object')).alias('checksum'),
                )
                .collect()
            )
            stats_by_bucket = {r[BUCKET_COL]: r for r in stats}
        wave_rows = int(obs.get['rows'])  # observed on the write, free
        wave_ms = int((_time.time() - wave_t0) * 1000)
        rows = []
        for b in wave_buckets:  # empty buckets commit too (rows=0)
            r = stats_by_bucket.get(b)
            rows.append({
                'stage': stage,
                'bucket': b,
                'rows': int(r['rows']) if r else (None if not verify else 0),
                'checksum': int(r['checksum']) if r and r['checksum'] is not None else (None if not verify else 0),
                'status': 'committed',
                'verified': bool(verify),
                # metrics (north_rule: per-partition lineage + metrics):
                # wall time of the wave that committed this bucket, and the
                # wave's total row count observed on the write action
                'wave': wave_base + w // wave_size,
                'wave_ms': wave_ms,
                'wave_rows': wave_rows,
            })
        _commit_manifest(output_dir, rows)
        if fail_after_wave is not None and (w // wave_size) + 1 >= fail_after_wave:
            raise RuntimeError(f'simulated failure after wave {fail_after_wave}')

    return load_manifest(output_dir)


def read_triples(spark: SparkSession, output_dir: str) -> DataFrame:
    """Read back a materialized triple table (bucket-pruned scans: filter on
    conv_bucket prunes partitions at the source)."""
    return spark.read.parquet(os.path.join(output_dir, 'data'))


def snapshot_log(output_dir: str) -> List[dict]:
    """Snapshot history derived from the per-bucket manifests: one entry
    per committed wave — the engine's analogue of Iceberg's snapshot log
    (this sandbox has no Iceberg runtime; the seam is
    sources/table_format.py).  Each wave's commit is atomic per bucket
    (os.replace markers), so a wave is 'in' a snapshot iff all its bucket
    markers exist — which materialize_triples guarantees by committing a
    wave's markers together after its write completes.

    Returns [{'wave', 'n_buckets', 'rows', 'wave_ms'}] ordered by wave.
    """
    waves: Dict[int, dict] = {}
    for b, row in load_manifest(output_dir).items():
        w = row.get('wave', 0)
        ent = waves.setdefault(w, {'wave': w, 'n_buckets': 0, 'rows': 0, 'wave_ms': row.get('wave_ms', 0)})
        ent['n_buckets'] += 1
        ent['rows'] += int(row.get('rows', 0))
    return [waves[w] for w in sorted(waves)]


def read_snapshot(spark: SparkSession, output_dir: str, max_wave: int) -> DataFrame:
    """Time-travel read: the triple table as of the commit of ``max_wave``
    (inclusive) — only buckets whose manifest marker belongs to wave ≤
    ``max_wave`` are visible, exactly the rows a job that died after that
    wave had durably committed.

    Scale shape: the bucket list comes from the manifest (driver-side
    metadata, O(n_buckets) tiny JSONs — the same cost class as an Iceberg
    snapshot's manifest list); the scan filters on the partition column,
    so Spark prunes non-snapshot buckets at the source (PartitionFilters,
    pinned by pytest) and never reads their files.
    """
    buckets = [
        b for b, row in load_manifest(output_dir).items()
        if row.get('wave', 0) <= max_wave
    ]
    return read_triples(spark, output_dir).filter(F.col(BUCKET_COL).isin(buckets))


# ---------------------------------------------------------------- append mode
# (streaming micro-batches: one WAVE per batch, idempotent under replays)


def _append_manifest_path(output_dir: str, wave: int) -> str:
    return os.path.join(output_dir, 'manifest', f'wave={wave}.json')


def appended_waves(output_dir: str) -> List[int]:
    mdir = os.path.join(output_dir, 'manifest')
    if not os.path.isdir(mdir):
        return []
    out = []
    for name in os.listdir(mdir):
        if name.startswith('wave=') and name.endswith('.json'):
            out.append(int(name[len('wave='):-len('.json')]))
    return sorted(out)


def append_triples(
    triples: DataFrame,
    output_dir: str,
    n_buckets: int = 64,
    wave: int = 0,
    bucket_key: str = 'subject',
) -> dict:
    """Append-mode materialization for STREAMING micro-batches: each batch
    is one ``wave``, written under ``data/wave=<w>/conv_bucket=<b>/`` and
    committed by ONE atomic wave marker (``manifest/wave=<w>.json``,
    os.replace).  The batch-level exactly-once contract foreachBatch
    needs:

    - **replay-idempotent**: Structured Streaming re-runs a failed batch
      with the SAME batch id.  A replay first checks the wave marker (→
      no-op if committed), else DYNAMIC-OVERWRITES only its own
      ``wave=<w>`` partition directories — a half-written first attempt
      is replaced, never doubled, and no other wave's files are touched.
    - **all-or-nothing visibility**: readers (`read_appended` /
      `read_append_snapshot`) take the committed-wave list from the
      markers, so uncommitted data files are invisible.

    The batch-mode sibling (`materialize_triples`) is for full-frame jobs
    (bucket-level resume over ONE dataset); this is for accumulating
    deltas — the wave is the checkpoint unit, not the bucket.  Returns
    the wave's manifest entry.

    Scale shape: one ``repartition(bucket)`` shuffle per batch (avoids
    per-task small files, same as the batch path), row count observed on
    the write action for free.  Partition layout stays prunable on BOTH
    wave (snapshot reads) and bucket (key-routed reads).
    """
    import time as _time

    from pyspark.sql import Observation

    marker = _append_manifest_path(output_dir, wave)
    if os.path.exists(marker):
        with open(marker) as f:
            return json.load(f)

    spark = triples.sparkSession
    t0 = _time.time()
    bucketed = with_bucket(triples, n_buckets, bucket_key).withColumn(
        'wave', F.lit(int(wave))
    )
    obs = Observation()
    spark.conf.set('spark.sql.sources.partitionOverwriteMode', 'dynamic')
    (
        bucketed.observe(obs, F.count(F.lit(1)).alias('rows'))
        .repartition(BUCKET_COL)
        .write.mode('overwrite')
        .partitionBy('wave', BUCKET_COL)
        .parquet(os.path.join(output_dir, 'data'))
    )
    row = {
        'wave': int(wave),
        'rows': int(obs.get['rows']),
        'ms': int((_time.time() - t0) * 1000),
    }
    os.makedirs(os.path.dirname(marker), exist_ok=True)
    tmp = marker + '.tmp'
    with open(tmp, 'w') as f:
        json.dump(row, f)
    os.replace(tmp, marker)
    return row


def _empty_append_frame(spark: SparkSession) -> DataFrame:
    """Schema-stable empty result for a store with no committed waves —
    reading before the first append is safe by design (marker-gated), so
    it must not surface the raw reader's path-not-found AnalysisException."""
    return spark.createDataFrame(
        [],
        f'subject string, predicate string, object string, type string, '
        f'wave int, {BUCKET_COL} int',
    )


def _require_data_dir(output_dir: str, waves: list) -> str:
    """Committed markers promise data: if waves are committed but the data
    dir is gone, the store is corrupted (partial delete / wrong path) —
    raise loudly instead of masking it as an empty read (ADVICE r4)."""
    data_dir = os.path.join(output_dir, 'data')
    if not os.path.isdir(data_dir):
        raise FileNotFoundError(
            f'append store at {output_dir!r} has {len(waves)} committed '
            f'wave marker(s) (e.g. wave {waves[0]}) but no data/ directory '
            f'— the store is corrupted or partially deleted'
        )
    return data_dir


def read_appended(spark: SparkSession, output_dir: str) -> DataFrame:
    """All COMMITTED waves (marker-gated — uncommitted files invisible).
    A store with no committed waves reads as an empty frame with the
    triple schema; committed waves WITHOUT a data dir raise (corruption,
    not emptiness)."""
    waves = appended_waves(output_dir)
    if not waves:
        return _empty_append_frame(spark)
    return spark.read.parquet(_require_data_dir(output_dir, waves)).filter(
        F.col('wave').isin(waves)
    )


def read_append_snapshot(spark: SparkSession, output_dir: str, max_wave: int) -> DataFrame:
    """Time travel over the append log: committed waves ≤ ``max_wave``
    (wave = micro-batch id, so this is 'the table as of batch N');
    partition-pruned on the wave column.  No committed waves at all reads
    as an empty frame with the triple schema; committed waves without a
    data dir raise (corruption, not emptiness).  An empty in-range subset
    of a healthy store is an empty frame."""
    all_waves = appended_waves(output_dir)
    if not all_waves:
        return _empty_append_frame(spark)
    data_dir = _require_data_dir(output_dir, all_waves)
    waves = [w for w in all_waves if w <= max_wave]
    if not waves:
        return _empty_append_frame(spark)
    return spark.read.parquet(data_dir).filter(F.col('wave').isin(waves))
