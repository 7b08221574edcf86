"""Multimodal column plumbing: opaque binary media + typed metadata.

Images/audio/video travel as ``binary`` columns with a metadata struct —
exactly how ``pages.html`` travels in the crawl engine. The Spark-side
plumbing (schema, batch shape, mapInPandas signatures, partition sizing)
is real and tested; the actual codec calls are STUBBED (this container has
no image/audio libraries) behind ``decoder=`` hooks — a deterministic fake
decoder stands in so the dataflow is testable end-to-end.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, DoubleType, IntegerType, LongType, StringType,
    StructField, StructType,
)

#: media table schema: one blob + typed metadata per row.
MEDIA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),      # image|audio|video
        StructField("payload", BinaryType(), False),
        StructField("mime", StringType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_s", DoubleType(), True),
    ]
)

FEATURES_SCHEMA = (
    "media_id long, kind string, n_bytes int, feature array<double>"
)


def fake_decode(payload: bytes, kind: str) -> np.ndarray:
    """Deterministic stand-in for a real codec (STUB).

    Real deployment: replace with PIL/ffmpeg/torchaudio decode. Raises on
    unknown kind the way a real decoder raises on a corrupt payload.
    """
    if kind not in ("image", "audio", "video"):
        raise NotImplementedError(f"no decoder for kind={kind!r}")
    arr = np.frombuffer(payload, dtype=np.uint8).astype(np.float64)
    if arr.size == 0:
        return np.zeros(8)
    # 8-bin byte histogram, normalized — deterministic "feature"
    hist, _ = np.histogram(arr, bins=8, range=(0, 256))
    return hist / max(arr.size, 1)


def extract_features(
    media: DataFrame,
    decoder: Callable[[bytes, str], np.ndarray] = fake_decode,
    batch_hint_rows: int = 256,
) -> DataFrame:
    """Decode + featurize media blobs via ``mapInPandas``.

    mapInPandas (not a scalar UDF) because decoders want whole-batch
    control: skip/limit rows, drop payloads early (the output batch no
    longer carries the blob — crucial for memory at 100 TB: the binary
    column dies inside the task instead of riding the shuffle).
    """

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decoder(bytes(p), k).tolist()
                for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(bytes(p)) for p in pdf["payload"]],
                    "feature": feats,
                }
            )

    return media.mapInPandas(_run, FEATURES_SCHEMA)


def sample_frames(
    media: DataFrame, every_n_bytes: int = 64,
) -> DataFrame:
    """'Frame sampling' plumbing: explode a video payload into fixed-stride
    chunk rows (media_id, frame_no, frame:binary). The real frame decoder is
    the stub boundary; the explode/partition shape is what matters at scale
    (frames repartitioned away from their source row)."""

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nos, frames = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload)
                for i in range(0, max(len(b), 1), every_n_bytes):
                    ids.append(mid)
                    nos.append(i // every_n_bytes)
                    frames.append(b[i : i + every_n_bytes])
            yield pd.DataFrame({"media_id": ids, "frame_no": nos, "frame": frames})

    return media.filter(F.col("kind") == "video").mapInPandas(
        _run, "media_id long, frame_no int, frame binary"
    )
