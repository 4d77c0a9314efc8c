"""Multimodal column plumbing (engine additions — "multimodal columns" per
the task brief).

Media payloads are opaque ``binary`` columns with a typed metadata struct —
the Spark-side schema, partition sizing, Arrow batch shape, and UDF
signatures are real and tested; the actual decode (PIL/ffmpeg/librosa) is
STUBBED because the container ships no media libraries.  ``fake=True``
substitutes a deterministic byte-statistics "decoder" so the pipeline is
exercisable end-to-end; ``fake=False`` raises NotImplementedError at the
decode step, by design.

Batch sizing matters at 100 TB: media rows are large, so feature extraction
runs via ``mapInPandas`` with ``spark.sql.execution.arrow.maxRecordsPerBatch``
bounding per-batch memory (set in session.py), and the recommended physical
layout is one row-group per file with payloads in their own column chunk
(parquet already gives column-level IO: scanning metadata never reads bytes).
"""
from __future__ import annotations

import hashlib
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField('media_id', T.LongType()),
    T.StructField('kind', T.StringType()),           # image | audio | video
    T.StructField('payload', T.BinaryType()),         # opaque encoded bytes
    T.StructField('meta', T.StructType([
        T.StructField('mime', T.StringType()),
        T.StructField('width', T.IntegerType()),
        T.StructField('height', T.IntegerType()),
        T.StructField('duration_ms', T.IntegerType()),
    ])),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField('media_id', T.LongType()),
    T.StructField('kind', T.StringType()),
    T.StructField('n_bytes', T.IntegerType()),
    T.StructField('digest', T.StringType()),
    T.StructField('features', T.ArrayType(T.FloatType())),
])


def synthetic_media(spark, n_rows: int = 100, seed: int = 42) -> DataFrame:
    """Deterministic opaque-binary fixture (payload = hash-derived bytes)."""
    kinds = ['image', 'audio', 'video']
    rows = []
    for i in range(n_rows):
        h = hashlib.sha256(f'{seed}:{i}'.encode()).digest()
        kind = kinds[i % 3]
        rows.append((
            i,
            kind,
            h * (1 + i % 7),
            {'mime': f'{kind}/x-fake', 'width': 64 + i % 32, 'height': 64, 'duration_ms': 1000 + i},
        ))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def extract_features(df: DataFrame, dim: int = 8, fake: bool = True) -> DataFrame:
    """Decode + feature-extract via ``mapInPandas`` (Arrow batches, one
    pandas call per batch — no per-row Python outside the stubbed decode).

    fake=True → deterministic byte-statistics pseudo-features;
    fake=False → NotImplementedError (no media libs in this container).
    """

    def gen(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    'real media decode requires PIL/ffmpeg/librosa — not available; '
                    'use fake=True for the deterministic stub'
                )
            payloads = pdf['payload']
            feats = []
            digests = []
            for p in payloads:  # decode stub: per-payload byte statistics
                arr = np.frombuffer(p, dtype=np.uint8)
                chunks = np.array_split(arr.astype(np.float32), dim)
                feats.append([float(c.mean()) if len(c) else 0.0 for c in chunks])
                digests.append(hashlib.md5(p).hexdigest())
            yield pd.DataFrame({
                'media_id': pdf['media_id'],
                'kind': pdf['kind'],
                'n_bytes': payloads.map(len).astype('int32'),
                'digest': digests,
                'features': feats,
            })

    return df.mapInPandas(gen, schema=FEATURE_SCHEMA)


def resize_images(df: DataFrame, max_side: int = 32, fake: bool = True) -> DataFrame:
    """Image resize via ``mapInPandas``: metadata is recomputed exactly
    (aspect-preserving fit into ``max_side``); the pixel transform is the
    stubbed decode step (fake=True → deterministic payload downsample by
    byte striding, fake=False → NotImplementedError).  Non-image rows pass
    through untouched."""

    def gen(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out = pdf.copy()
            mask = out['kind'] == 'image'
            if mask.any():
                if not fake:
                    raise NotImplementedError(
                        'real image resize requires PIL — not available; use fake=True'
                    )
                metas, payloads = [], []
                for meta, payload in zip(out.loc[mask, 'meta'], out.loc[mask, 'payload']):
                    w, h = meta['width'], meta['height']
                    scale = max_side / max(w, h) if max(w, h) > max_side else 1.0
                    nw, nh = max(1, round(w * scale)), max(1, round(h * scale))
                    stride = max(1, int(round(1 / scale)) if scale < 1 else 1)
                    metas.append({**meta, 'width': nw, 'height': nh})
                    payloads.append(bytes(payload[::stride]))  # decode stub
                out.loc[mask, 'meta'] = pd.Series(metas, index=out.index[mask])
                out.loc[mask, 'payload'] = pd.Series(payloads, index=out.index[mask])
            yield out

    return df.mapInPandas(gen, schema=MEDIA_SCHEMA)


def frame_sample_plan(df: DataFrame, every_ms: int = 500) -> DataFrame:
    """Video frame-sampling *plan*: expands each video row into the frame
    timestamps a decoder would extract — pure expressions (the decode of
    each frame is the stubbed part, the fan-out shape is real)."""
    return (
        df.filter(F.col('kind') == 'video')
        .select(
            'media_id',
            F.explode(
                F.sequence(F.lit(0), F.col('meta.duration_ms'), F.lit(every_ms))
            ).alias('frame_ts_ms'),
        )
    )
