"""Multimodal column plumbing (engine addition for training pipelines).

Media (image/audio/video) are opaque `binary` columns with typed metadata
structs. Decode/feature-extraction run as Arrow-batched mapInPandas with
one-time per-task init (the same iterator pattern the reference uses to
warm its embedding model once per container, pipeline.py:60 /
Dockerfile:10-19). Decoders are pluggable via `set_decoder`: REAL
stdlib decoders exist for audio (wav_amplitude_decode — wave-module PCM)
and image (bmp_mean_decode — struct/numpy BMP), dispatched by
kind_dispatch_decode; video decode remains honestly stubbed (no codec
libs in this container) and the deterministic fake_decode stays the
default for plumbing tests.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def fake_decode(payload: bytes | None, kind: str) -> list[float]:
    """Deterministic stand-in for a real decoder: 8 floats derived from the
    byte histogram. Real deployments replace via set_decoder()."""
    if payload is None:
        return [0.0] * 8
    buckets = [0] * 8
    for byte in payload[:4096]:
        buckets[byte % 8] += 1
    total = max(1, sum(buckets))
    return [b / total for b in buckets]


def wav_amplitude_decode(
    payload: bytes | None, kind: str, n_features: int = 8
) -> list[float]:
    """REAL decoder for the audio kind, stdlib-only (`wave`): parse PCM WAV
    bytes and emit ``n_features`` mean-|amplitude| features over equal time
    slices of the first channel, normalized to [0, 1] by the int16 range.

    This is the hermetic proof of the ``set_decoder`` contract (the
    reference's embedder twin warms a real model per container,
    ETL/batch_ecs/source/pipeline.py:47-50 — here the "model" is the
    stdlib WAV parser). Per the contract it raises NotImplementedError for
    kinds it cannot decode rather than guessing; image/video remain
    stubbed in this container (no codec libs)."""
    if kind != "audio":
        raise NotImplementedError(
            f"wav_amplitude_decode handles kind='audio', not {kind!r}"
        )
    if payload is None:
        return [0.0] * n_features
    import io
    import sys
    import wave
    from array import array

    with wave.open(io.BytesIO(payload), "rb") as w:
        if w.getsampwidth() != 2:
            raise NotImplementedError("only 16-bit PCM WAV is supported")
        nch = w.getnchannels()
        frames = w.readframes(w.getnframes())
    samples = array("h")
    samples.frombytes(frames)
    if sys.byteorder == "big":
        samples.byteswap()  # WAV payloads are little-endian
    if nch > 1:
        samples = samples[::nch]
    n = len(samples)
    if n == 0:
        return [0.0] * n_features
    feats = []
    for i in range(n_features):
        lo = i * n // n_features
        hi = max(lo + 1, (i + 1) * n // n_features)
        seg = samples[lo:hi]
        feats.append(sum(abs(int(s)) for s in seg) / (len(seg) * 32768.0))
    return feats


def bmp_mean_decode(
    payload: bytes | None, kind: str, n_features: int = 8
) -> list[float]:
    """REAL decoder for the image kind, stdlib-only (`struct` + numpy):
    parse an uncompressed 24-bit BMP (BITMAPINFOHEADER) and emit 8
    features — per-channel mean (R, G, B), global luma mean, and the four
    quadrant luma means — normalized to [0, 1].

    Together with :func:`wav_amplitude_decode` this retires the
    "decoder is a stub" caveat for two of the three media kinds without
    leaving the hermetic sandbox (BMP's raw pixel array needs no codec
    libs). Per the set_decoder contract it raises NotImplementedError for
    anything it cannot decode exactly (other kinds, compressed BMPs,
    non-24-bit depth) rather than guessing.
    """
    if kind != "image":
        raise NotImplementedError(
            f"bmp_mean_decode handles kind='image', not {kind!r}"
        )
    if payload is None:
        return [0.0] * n_features
    import struct

    import numpy as np

    if len(payload) < 54 or payload[:2] != b"BM":
        raise NotImplementedError("not a BMP payload")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size = struct.unpack_from("<I", payload, 14)[0]
    width, height = struct.unpack_from("<ii", payload, 18)  # signed:
    top_down = height < 0  # negative height = top-down row order
    height = abs(height)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if hdr_size < 40 or compression != 0 or bpp != 24 or planes != 1:
        raise NotImplementedError("only uncompressed 24-bit BMP is supported")
    if width <= 0 or height <= 0:
        return [0.0] * n_features
    row_stride = (width * 3 + 3) & ~3  # rows pad to 4-byte boundaries
    if len(payload) < data_off + row_stride * height:
        raise NotImplementedError("truncated BMP pixel array")
    arr = np.frombuffer(
        payload, dtype=np.uint8, count=row_stride * height, offset=data_off
    )
    rows = arr.reshape(height, row_stride)[:, : width * 3]
    px = rows.reshape(height, width, 3).astype(np.float64)  # B, G, R order
    if not top_down:
        px = px[::-1]  # BMP default is bottom-up; normalize to top-down
    b, g, r = px[..., 0], px[..., 1], px[..., 2]
    luma = 0.299 * r + 0.587 * g + 0.114 * b
    h2, w2 = max(1, height // 2), max(1, width // 2)
    quads = [luma[:h2, :w2], luma[:h2, w2:], luma[h2:, :w2], luma[h2:, w2:]]
    feats = [r.mean(), g.mean(), b.mean(), luma.mean()] + [
        (float(q.mean()) if q.size else 0.0) for q in quads
    ]
    return [float(f) / 255.0 for f in feats]


def kind_dispatch_decode(payload: bytes | None, kind: str) -> list[float]:
    """Production-shaped decoder: dispatch by media kind to the real
    stdlib decoders (audio → WAV PCM amplitudes, image → BMP channel/luma
    means); video stays honestly unsupported in this container (no codec
    libs) and raises per the contract."""
    if kind == "audio":
        return wav_amplitude_decode(payload, kind)
    if kind == "image":
        return bmp_mean_decode(payload, kind)
    raise NotImplementedError(f"no decoder for kind={kind!r} in this container")


_DECODER: Callable[[bytes | None, str], list[float]] = fake_decode


def set_decoder(fn: Callable[[bytes | None, str], list[float]]) -> None:
    """Swap in a real decoder (e.g. PIL/torchaudio-backed) where available.

    A real implementation must raise NotImplementedError for unsupported
    kinds rather than guessing."""
    global _DECODER
    _DECODER = fn


def extract_features(df: DataFrame, batch_size_hint: int = 1024) -> DataFrame:
    """mapInPandas feature extraction over media rows.

    Iterator-of-batches form: heavy init (model load) happens ONCE per task
    before the batch loop — mirroring the reference's warm_up(). The fake
    decoder needs no init; the pattern is what's load-bearing.
    """
    decoder = _DECODER

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # one-time per-task init would go here (e.g. model = load(...))
        for pdf in batches:
            feats = [
                decoder(p, k) for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(
                        lambda b: 0 if b is None else len(b)
                    ),
                    "feature": feats,
                }
            )

    return df.mapInPandas(fn, FEATURE_SCHEMA)
