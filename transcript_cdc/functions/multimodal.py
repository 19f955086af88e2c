"""Multimodal column plumbing (engine addition for training pipelines).

Media (image/audio/video) are opaque `binary` columns with typed metadata
structs. Decode/feature-extraction run as Arrow-batched mapInPandas with
one-time per-task init (the same iterator pattern the reference uses to
warm its embedding model once per container, pipeline.py:60 /
Dockerfile:10-19). The decode step itself is STUBBED — the container has
no image/audio libs — behind `set_decoder`; the Spark-side plumbing
(schema, batch shape, partitioning) is real and tested with the
deterministic fake decoder.
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
