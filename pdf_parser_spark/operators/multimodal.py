"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are carried as opaque BINARY columns. The Spark-side
plumbing — schema, batching, partitioning, UDF signatures — is real and
tested; the actual codec decode is stubbed (the decode libraries are not in
this container) behind a clearly-marked NotImplementedError with a
deterministic fake featurizer used by tests and benchmarks.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, FloatType, IntegerType, LongType, StringType, StructField,
    StructType,
)

__all__ = ["media_metadata", "media_features", "decode_image"]

# magic-number sniffing, all JVM-side (hex compare on the first bytes)
_MAGICS = [
    ("pdf", "25504446"),        # %PDF
    ("png", "89504E47"),
    ("jpeg", "FFD8FF"),
    ("gif", "47494638"),
    ("riff", "52494646"),       # wav/avi/webp container
    ("zip", "504B0304"),
    ("html", "3C21444F"),       # <!DO
    ("html", "3C68746D"),       # <htm
]


def media_metadata(df: DataFrame, bin_col: str = "html", key_col: str = "url") -> DataFrame:
    """Typed metadata for an opaque binary column: byte length + sniffed kind.

    Entirely built-in expressions (hex prefix compare), so Catalyst can prune
    and the scan never deserializes payloads it doesn't need.
    """
    head = F.upper(F.hex(F.substring(F.col(bin_col), 1, 4)))
    kind = F.lit("unknown")
    for name, magic in reversed(_MAGICS):
        kind = F.when(
            F.substring(head, 1, len(magic)) == F.lit(magic), F.lit(name)
        ).otherwise(kind)
    return df.select(
        F.col(key_col),
        F.coalesce(F.length(F.col(bin_col)), F.lit(0)).alias("n_bytes"),
        kind.alias("media_kind"),
    )


def decode_image(payload: bytes) -> "np.ndarray":
    """Real codec decode — NOT IMPLEMENTED in this container.

    The container has no image/audio codecs; production swaps this for a
    Pillow/ffmpeg-backed decode. The deterministic fake below keeps the
    Spark plumbing (schema, batch shapes, partitioning) fully testable.
    """
    raise NotImplementedError(
        "codec decode requires an image library not present in this container"
    )


def _fake_features(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic stand-in featurizer: seeded by content digest."""
    digest = hashlib.sha256(payload or b"").digest()
    seed = int.from_bytes(digest[:4], "big")
    rng = np.random.RandomState(seed)
    return rng.standard_normal(dim).astype(np.float32)


FEATURE_SCHEMA = StructType([
    StructField("url", StringType()),
    StructField("n_bytes", LongType()),
    StructField("feature_dim", IntegerType()),
    StructField("features", ArrayType(FloatType())),
])


def media_features(
    df: DataFrame,
    bin_col: str = "html",
    key_col: str = "url",
    dim: int = 16,
    real_decode: bool = False,
) -> DataFrame:
    """Arrow-batched feature extraction over opaque binary payloads.

    mapInPandas keeps batches bounded (session caps records/batch), so a
    4K-video-sized payload cannot blow worker memory; the decode step is the
    stub above unless real_decode is set (which raises loudly).
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, nbytes = [], []
            for payload in pdf[bin_col]:
                payload = payload or b""
                nbytes.append(len(payload))
                if real_decode:
                    decode_image(payload)  # raises NotImplementedError
                feats.append([float(x) for x in _fake_features(payload, dim)])
            yield pd.DataFrame({
                "url": pdf[key_col],
                "n_bytes": pd.Series(nbytes, dtype="int64"),
                "feature_dim": pd.Series([dim] * len(pdf), dtype="int32"),
                "features": feats,
            })

    return df.select(key_col, bin_col).mapInPandas(kernel, FEATURE_SCHEMA)
