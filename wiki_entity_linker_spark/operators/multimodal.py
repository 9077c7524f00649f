"""Multimodal column plumbing: image/audio/video as opaque binary + metadata.

The container has no codec libraries, so the decode kernels are deterministic
fakes / explicit stubs — but the Spark-side contract is real and tested:
typed schemas, Arrow-batched ``mapInPandas`` with bounded batch memory, and
partition-count preservation. Swap ``_decode_image_batch`` for a real decoder
(PIL/torchvision) on a cluster with the libs installed; nothing else changes.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id string, kind string, data binary, "
    "meta struct<width:int, height:int, sample_rate:int, n_frames:int>"
)

FEATURE_SCHEMA = "media_id string, kind string, n_bytes long, feature array<float>"

HAVE_REAL_CODECS = False  # flipped when PIL/librosa/av are importable
try:  # pragma: no cover - not present in this container
    import PIL.Image  # noqa: F401

    HAVE_REAL_CODECS = True
except Exception:
    pass


def _decode_image_batch(data: pd.Series) -> np.ndarray:
    """Deterministic fake decode: 4-dim feature from byte stats.

    Real implementation decodes to pixels and pools; raising here instead
    would be `NotImplementedError("image decode requires PIL")`.
    """
    feats = np.zeros((len(data), 4), dtype=np.float32)
    for i, buf in enumerate(data):
        arr = np.frombuffer(buf or b"\x00", dtype=np.uint8)
        feats[i] = [len(arr), float(arr.mean()), float(arr.std()), float(arr[0])]
    return feats


def extract_features(media: DataFrame, batch_rows: int = 1024) -> DataFrame:
    """Arrow-batched feature extraction over binary media columns.

    ``mapInPandas`` keeps each Arrow batch bounded (binary payloads can be
    huge — cap via ``spark.sql.execution.arrow.maxRecordsPerBatch`` at the
    session level for real media).
    """

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for lo in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[lo : lo + batch_rows]
                feats = _decode_image_batch(chunk["data"])
                yield pd.DataFrame(
                    {
                        "media_id": chunk["media_id"].values,
                        "kind": chunk["kind"].values,
                        "n_bytes": chunk["data"].map(
                            lambda b: len(b) if b is not None else 0
                        ).astype("int64").values,
                        "feature": list(feats),
                    }
                )

    return media.mapInPandas(_extract, schema=FEATURE_SCHEMA)


def synthetic_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for tests (binary payload + metadata)."""
    rng = np.random.RandomState(seed)
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        payload = rng.bytes(64 + (i % 5) * 32)
        rows.append(
            (
                f"m{i:04d}",
                kind,
                bytearray(payload),
                (32 + i % 8, 32, 16000 if kind == "audio" else None,
                 30 if kind == "video" else None),
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def frame_sample(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame-sampling plumbing for video rows: explode sampled frame indexes
    (decode stubbed — indexes only, deterministic)."""
    return (
        media.filter(F.col("kind") == "video")
        .withColumn(
            "frame_idx",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.coalesce(F.col("meta.n_frames"), F.lit(1)) - 1, F.lit(0)),
                    F.lit(every_n),
                )
            ),
        )
        .select("media_id", "frame_idx")
    )
