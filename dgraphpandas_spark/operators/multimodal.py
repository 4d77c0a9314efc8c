"""Multimodal column plumbing (engine additions — "multimodal columns" per
the task brief).

Media payloads are opaque ``binary`` columns with a typed metadata struct.
Decoding goes through a pluggable per-mime registry (``DECODERS`` /
``register_decoder``): two REAL codecs ship built-in — PCM WAV (stdlib
``wave``) and binary PPM/PGM images (numpy header parse) — because they
need no media libraries; compressed formats (JPEG/PNG/MP3/H.264) are the
STUBBED part (register a PIL/ffmpeg-backed decoder on a host that has
them; nothing else changes).  ``fake=True`` substitutes a deterministic
byte-statistics "decoder" for unregistered mimes so the pipeline is
exercisable end-to-end; ``fake=False`` decodes registered mimes for real
and raises NotImplementedError for the rest, by design.

Batch sizing matters at 100 TB: media rows are large, so feature extraction
runs via ``mapInPandas`` with ``spark.sql.execution.arrow.maxRecordsPerBatch``
bounding per-batch memory (set in session.py), and the recommended physical
layout is one row-group per file with payloads in their own column chunk
(parquet already gives column-level IO: scanning metadata never reads bytes).
"""
from __future__ import annotations

import hashlib
import io
import wave
from typing import Callable, Dict, Iterator

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


# ------------------------------------------------------- decoder registry
#
# A decoder takes the raw payload bytes and returns a dict with at least
# ``kind`` plus kind-specific fields:
#   image → {'kind': 'image', 'pixels': ndarray(h, w, c) uint8,
#            'width': w, 'height': h}
#   audio → {'kind': 'audio', 'samples': ndarray float32 in [-1, 1],
#            'framerate': int, 'duration_ms': int}


def decode_wav(payload: bytes) -> dict:
    """REAL codec: PCM WAV via the stdlib ``wave`` module (RIFF header
    parse + frame read; 8/16/32-bit int PCM)."""
    import numpy as np

    with wave.open(io.BytesIO(payload), 'rb') as w:
        nch, sampwidth, framerate, nframes = (
            w.getnchannels(), w.getsampwidth(), w.getframerate(), w.getnframes()
        )
        raw = w.readframes(nframes)
    dtype, scale = {1: (np.uint8, 128.0), 2: (np.int16, 32768.0), 4: (np.int32, 2147483648.0)}[sampwidth]
    samples = np.frombuffer(raw, dtype=dtype).astype(np.float32)
    if sampwidth == 1:
        samples -= 128.0
    samples /= scale
    if nch > 1:
        samples = samples.reshape(-1, nch).mean(axis=1)  # downmix to mono
    return {
        'kind': 'audio',
        'samples': samples,
        'framerate': framerate,
        'duration_ms': int(round(nframes / framerate * 1000)) if framerate else 0,
    }


def _ppm_header(payload: bytes, magic: bytes):
    """Parse a binary-PNM header (magic, whitespace/comment-tolerant
    width/height/maxval); returns (width, height, data_offset)."""
    if not payload.startswith(magic):
        raise ValueError(f'not a {magic!r} PNM payload')
    fields, pos = [], len(magic)
    while len(fields) < 3:
        while pos < len(payload) and payload[pos:pos + 1].isspace():
            pos += 1
        if payload[pos:pos + 1] == b'#':  # comment to end-of-line
            while pos < len(payload) and payload[pos:pos + 1] != b'\n':
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos:pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    return fields[0], fields[1], pos + 1  # single whitespace after maxval


def decode_ppm(payload: bytes) -> dict:
    """REAL codec: binary PPM (P6, 8-bit RGB) via numpy."""
    import numpy as np

    w, h, off = _ppm_header(payload, b'P6')
    pixels = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=off).reshape(h, w, 3)
    return {'kind': 'image', 'pixels': pixels, 'width': w, 'height': h}


def decode_pgm(payload: bytes) -> dict:
    """REAL codec: binary PGM (P5, 8-bit gray) via numpy."""
    import numpy as np

    w, h, off = _ppm_header(payload, b'P5')
    pixels = np.frombuffer(payload, dtype=np.uint8, count=w * h, offset=off).reshape(h, w, 1)
    return {'kind': 'image', 'pixels': pixels, 'width': w, 'height': h}


def encode_ppm(pixels) -> bytes:
    """Re-encode an (h, w, 3) uint8 array as binary PPM."""
    h, w = pixels.shape[0], pixels.shape[1]
    return b'P6\n%d %d\n255\n' % (w, h) + pixels.tobytes()


def encode_wav(samples, framerate: int = 16_000) -> bytes:
    """Encode mono float32 [-1, 1] samples as 16-bit PCM WAV."""
    import numpy as np

    buf = io.BytesIO()
    with wave.open(buf, 'wb') as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(framerate)
        w.writeframes((np.clip(samples, -1, 1) * 32767).astype('<i2').tobytes())
    return buf.getvalue()


DECODERS: Dict[str, Callable[[bytes], dict]] = {
    'audio/wav': decode_wav,
    'audio/x-wav': decode_wav,
    'image/x-portable-pixmap': decode_ppm,
    'image/x-portable-graymap': decode_pgm,
}


def register_decoder(mime: str, fn: Callable[[bytes], dict]) -> None:
    """Plug a real decoder in (e.g. PIL-backed JPEG on a host that has it).
    Executors pick it up as long as registration happens at import time of
    the job module (closures are shipped with the mapInPandas function)."""
    DECODERS[mime] = fn


def _resize_nn(pixels, max_side: int):
    """Nearest-neighbor aspect-preserving fit into ``max_side``."""
    import numpy as np

    h, w = pixels.shape[0], pixels.shape[1]
    if max(h, w) <= max_side:
        return pixels
    scale = max_side / max(h, w)
    nh, nw = max(1, round(h * scale)), max(1, round(w * scale))
    rows = np.minimum((np.arange(nh) / scale).astype(int), h - 1)
    cols = np.minimum((np.arange(nw) / scale).astype(int), w - 1)
    return pixels[rows][:, cols]


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


def synthetic_real_media(spark, n_rows: int = 60, seed: int = 42) -> DataFrame:
    """Deterministic fixture whose payloads are REAL encoded media: 16-bit
    PCM WAV sine tones and binary PPM gradient images (hash-seeded params,
    no RNG).  Exercises the registered decoders end-to-end."""
    import numpy as np

    rows = []
    for i in range(n_rows):
        h = hashlib.sha256(f'{seed}:{i}'.encode()).digest()
        if i % 2 == 0:
            freq = 100 + h[0] * 4          # 100..1120 Hz
            n = 800 + h[1] * 8             # 0.05-0.18 s at 16 kHz
            t = np.arange(n, dtype=np.float32) / 16_000.0
            payload = encode_wav(0.5 * np.sin(2 * np.pi * freq * t), framerate=16_000)
            rows.append((i, 'audio', payload, {
                'mime': 'audio/wav', 'width': None, 'height': None,
                'duration_ms': int(round(n / 16_000 * 1000)),
            }))
        else:
            w, hh = 16 + h[0] % 48, 16 + h[1] % 48
            yy, xx = np.mgrid[0:hh, 0:w]
            pixels = np.stack(
                [(xx * 255 // max(1, w - 1)).astype(np.uint8),
                 (yy * 255 // max(1, hh - 1)).astype(np.uint8),
                 np.full((hh, w), h[2], dtype=np.uint8)],
                axis=-1,
            )
            rows.append((i, 'image', encode_ppm(pixels), {
                'mime': 'image/x-portable-pixmap', 'width': w, 'height': hh,
                'duration_ms': None,
            }))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


MEDIA_STATS_SCHEMA = T.StructType([
    T.StructField('media_id', T.LongType()),
    T.StructField('kind', T.StringType()),
    T.StructField('n_bytes', T.IntegerType()),
    T.StructField('framerate', T.IntegerType()),   # audio
    T.StructField('n_samples', T.IntegerType()),   # audio
    T.StructField('width', T.IntegerType()),       # image
    T.StructField('height', T.IntegerType()),      # image
    T.StructField('pixel_sum', T.LongType()),      # image: sum of all channel bytes
])


def decode_media_stats(df: DataFrame) -> DataFrame:
    """REAL-decode audit: run the registered codec on every payload and emit
    facts recoverable ONLY by decoding (WAV header framerate/frame count,
    PNM header dims, exact pixel byte sum) — digest/length checks alone
    can't prove the codec ran.  All outputs are integers, so a SQL oracle
    can re-derive them in closed form from the fixture parameters with no
    float-math replication.  Arrow-batched ``mapInPandas``; the per-payload
    loop is inherent to variable-size binary decode and stays inside one
    Arrow batch (no per-row Python dispatch through Spark)."""

    def gen(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        cols = [f.name for f in MEDIA_STATS_SCHEMA.fields]
        for pdf in batches:
            out = []
            for mid, payload, meta in zip(pdf['media_id'], pdf['payload'], pdf['meta']):
                dec = DECODERS[meta['mime']](bytes(payload))
                row = dict.fromkeys(cols)
                row.update(media_id=mid, kind=dec['kind'], n_bytes=len(payload))
                if dec['kind'] == 'audio':
                    row['framerate'] = dec['framerate']
                    row['n_samples'] = int(len(dec['samples']))
                else:
                    row['width'] = dec['width']
                    row['height'] = dec['height']
                    row['pixel_sum'] = int(dec['pixels'].astype(np.int64).sum())
                out.append(row)
            yield pd.DataFrame(out, columns=cols)

    return df.mapInPandas(gen, schema=MEDIA_STATS_SCHEMA)


def extract_features(df: DataFrame, dim: int = 8, fake: bool = True) -> DataFrame:
    """Decode + feature-extract via ``mapInPandas`` (Arrow batches; the
    per-payload loop is inherent to variable-size binary decode and stays
    inside one Arrow batch).

    Mimes with a registered decoder (WAV/PPM/PGM built-in, more via
    ``register_decoder``) decode for REAL: features are per-chunk RMS of the
    decoded signal (audio samples / normalized pixels).  Unregistered mimes:
    fake=True → deterministic byte-statistics pseudo-features;
    fake=False → NotImplementedError naming the mime.
    """

    def gen(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            payloads = pdf['payload']
            feats = []
            digests = []
            for meta, p in zip(pdf['meta'], payloads):
                p = bytes(p)
                digests.append(hashlib.md5(p).hexdigest())
                decoder = DECODERS.get(meta['mime'])
                if decoder is not None:
                    decoded = decoder(p)
                    if decoded['kind'] == 'audio':
                        signal = decoded['samples']
                    else:
                        signal = decoded['pixels'].astype(np.float32).ravel() / 255.0
                    chunks = np.array_split(signal.astype(np.float32), dim)
                    feats.append([
                        float(np.sqrt(np.mean(c * c))) if len(c) else 0.0 for c in chunks
                    ])
                elif fake:  # decode stub: per-payload byte statistics
                    arr = np.frombuffer(p, dtype=np.uint8)
                    chunks = np.array_split(arr.astype(np.float32), dim)
                    feats.append([float(c.mean()) if len(c) else 0.0 for c in chunks])
                else:
                    raise NotImplementedError(
                        f"no decoder registered for mime {meta['mime']!r} "
                        '(built-ins: WAV/PPM/PGM; compressed formats need '
                        'register_decoder with PIL/ffmpeg on the host, or fake=True)'
                    )
            yield pd.DataFrame({
                'media_id': pdf['media_id'],
                'kind': pdf['kind'],
                'n_bytes': payloads.map(len).astype('int32'),
                'digest': digests,
                'features': feats,
            })

    return df.mapInPandas(gen, schema=FEATURE_SCHEMA)


def resize_images(df: DataFrame, max_side: int = 32, fake: bool = True) -> DataFrame:
    """Image resize via ``mapInPandas`` (aspect-preserving fit into
    ``max_side``).  Registered image mimes (PPM/PGM built-in) resize for
    REAL — decode, nearest-neighbor downsample, re-encode, exact metadata.
    Unregistered mimes: fake=True → deterministic payload downsample by
    byte striding; fake=False → NotImplementedError.  Non-image rows pass
    through untouched."""

    def gen(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out = pdf.copy()
            mask = out['kind'] == 'image'
            if mask.any():
                metas, payloads = [], []
                for meta, payload in zip(out.loc[mask, 'meta'], out.loc[mask, 'payload']):
                    payload = bytes(payload)
                    decoder = DECODERS.get(meta['mime'])
                    if decoder is not None:
                        # REAL resize: decode → nearest-neighbor fit → re-encode
                        pixels = _resize_nn(decoder(payload)['pixels'], max_side)
                        nh, nw, nc = pixels.shape
                        magic = b'P6' if nc == 3 else b'P5'
                        payloads.append(
                            magic + b'\n%d %d\n255\n' % (nw, nh) + pixels.tobytes()
                        )
                        metas.append({**meta, 'width': nw, 'height': nh})
                    elif fake:
                        w, h = meta['width'], meta['height']
                        scale = max_side / max(w, h) if max(w, h) > max_side else 1.0
                        nw, nh = max(1, round(w * scale)), max(1, round(h * scale))
                        stride = max(1, int(round(1 / scale)) if scale < 1 else 1)
                        metas.append({**meta, 'width': nw, 'height': nh})
                        payloads.append(payload[::stride])  # decode stub
                    else:
                        raise NotImplementedError(
                            f"no decoder registered for mime {meta['mime']!r}; "
                            'register one or use fake=True'
                        )
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
