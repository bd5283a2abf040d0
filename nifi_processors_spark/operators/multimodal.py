"""Multimodal column operators — binary payloads with typed metadata.

Image/audio/video payloads are opaque ``binary`` columns plus typed
metadata (the engine treats them exactly like the reference treats
FlowFile content: bytes it never interprets, GET:256-257). The Spark
plumbing — schema, Arrow-batched ``mapInPandas`` operators, batch
shaping, partition sizing — is real and tested; the codec step itself
is stubbed (no image/audio libraries exist in this container) behind
``_decode_image``/``_decode_audio``: a deterministic fake when
``fake=True`` (tests), ``NotImplementedError`` otherwise.

At 100 TB scale the rules these operators encode:
* binary columns ride in parquet with metadata columns beside them —
  filters on metadata prune row groups BEFORE bytes are read;
* decode/extract runs in ``mapInPandas`` (Arrow batches, zero per-row
  Python) with ``spark.sql.files.maxPartitionBytes`` sized so a batch
  of decoded frames fits executor memory;
* derived features (embeddings, frame samples) are arrays of floats —
  downstream similarity operators consume them unchanged.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

#: media table schema: opaque payload + typed metadata
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("feat", T.ArrayType(T.FloatType()), True),
        T.StructField("out_width", T.IntegerType(), True),
        T.StructField("out_height", T.IntegerType(), True),
    ]
)

FRAME_SAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_ts_ms", T.LongType(), False),
        T.StructField("frame", T.BinaryType(), True),
    ]
)


def _decode_image(payload: bytes, fake: bool) -> np.ndarray:
    """STUB: the real implementation would decode via Pillow/opencv
    (not installed here). The fake is deterministic from the payload
    hash so tests can assert end-to-end plumbing."""
    if not fake:
        raise NotImplementedError(
            "image decode requires Pillow/opencv — not available in this "
            "container; pass fake=True or install a codec"
        )
    h = hashlib.md5(payload or b"").digest()
    rng = np.frombuffer(h, dtype=np.uint8).astype(np.float32)
    return np.tile(rng, 4)[:64].reshape(8, 8)


def extract_image_features(
    media: DataFrame, resize: tuple[int, int] = (8, 8), fake: bool = False
) -> DataFrame:
    """Decode → resize → feature-vector per image, as an Arrow-batched
    ``mapInPandas`` (one pandas batch per parquet row-group — never
    per-row Python)."""
    rw, rh = resize

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                img = _decode_image(payload, fake)
                # "resize": deterministic crop/pad to (rh, rw)
                out = np.zeros((rh, rw), dtype=np.float32)
                s = img[: rh, : rw]
                out[: s.shape[0], : s.shape[1]] = s
                rows.append(
                    {
                        "media_id": mid,
                        "feat": (out.ravel() / 255.0).tolist(),
                        "out_width": rw,
                        "out_height": rh,
                    }
                )
            yield pd.DataFrame(rows, columns=["media_id", "feat", "out_width", "out_height"])

    return media.filter("kind = 'image'").select("media_id", "payload").mapInPandas(
        op, IMAGE_FEATURES_SCHEMA
    )


def sample_video_frames(
    media: DataFrame, every_ms: int = 1000, max_frames: int = 8, fake: bool = False
) -> DataFrame:
    """Frame sampling: one output row per sampled frame. The decode is
    stubbed; the fan-out shape (row → N frame rows via mapInPandas) is
    the real contract."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload, dur in zip(
                pdf["media_id"], pdf["payload"], pdf["duration_ms"]
            ):
                if not fake:
                    raise NotImplementedError(
                        "video decode requires ffmpeg — not in this container"
                    )
                n = min(max_frames, max(int((dur or 0) // every_ms), 0))
                for i in range(n):
                    tag = hashlib.md5(
                        (payload or b"") + i.to_bytes(4, "big")
                    ).digest()
                    rows.append(
                        {
                            "media_id": mid,
                            "frame_idx": i,
                            "frame_ts_ms": i * every_ms,
                            "frame": tag,
                        }
                    )
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_idx", "frame_ts_ms", "frame"]
            )

    return media.filter("kind = 'video'").select(
        "media_id", "payload", "duration_ms"
    ).mapInPandas(op, FRAME_SAMPLE_SCHEMA)
