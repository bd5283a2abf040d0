"""Multimodal column operators — binary payloads with typed metadata.

Image/audio/video payloads are opaque ``binary`` columns plus typed
metadata (the engine treats them exactly like the reference treats
FlowFile content: bytes it never interprets, GET:256-257). The Spark
plumbing — schema, Arrow-batched ``mapInPandas`` operators, batch
shaping, partition sizing — is real and tested.

Codecs: uncompressed formats decode FOR REAL with no external
libraries — PPM (P6) and 24-bit BMP via numpy, PCM WAV via the stdlib
``wave`` module — so the decode → feature-extract path is end-to-end
and oracle-gated (``media_decode_features``). Compressed codecs
(JPEG/PNG/MP4) would need Pillow/ffmpeg, which this container lacks:
those payloads raise ``NotImplementedError`` unless ``fake=True``
(the deterministic fake used by plumbing tests) — the one honest
capability boundary left in this module.

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


# --------------------------------------------------------------------------
# real codecs (pure numpy / stdlib — no external libraries)
# --------------------------------------------------------------------------

def encode_ppm(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 → binary PPM (P6, maxval 255): ASCII header,
    then raw RGB bytes row-major top-down."""
    h, w, _ = arr.shape
    return b"P6\n%d %d\n255\n" % (w, h) + arr.astype(np.uint8).tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6) → (h, w, 3) uint8. Header = magic, width,
    height, maxval as whitespace-separated ASCII tokens (comments
    unsupported — the synthetic corpus never writes them)."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM")
    tokens, pos = [], 2
    while len(tokens) < 3:
        while payload[pos : pos + 1].isspace():
            pos += 1
        start = pos
        while not payload[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval, then raster
    w, h, maxval = tokens
    if maxval != 255:
        raise ValueError("only maxval 255 supported")
    raster = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=pos)
    return raster.reshape(h, w, 3)


def encode_bmp(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → 24-bit uncompressed BMP (BITMAPINFOHEADER,
    BI_RGB): rows bottom-up, pixels BGR, each row padded to 4 bytes —
    the layout quirks a correct decoder must undo."""
    h, w, _ = arr.shape
    row_bytes = w * 3
    pad = (4 - row_bytes % 4) % 4
    img_size = (row_bytes + pad) * h
    off = 14 + 40
    header = (
        b"BM"
        + (off + img_size).to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + off.to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little")
        + h.to_bytes(4, "little")
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")  # BI_RGB
        + img_size.to_bytes(4, "little")
        + b"\x00" * 16
    )
    bgr = arr[:, :, ::-1].astype(np.uint8)  # RGB → BGR
    rows = []
    for r in range(h - 1, -1, -1):  # bottom-up
        rows.append(bgr[r].tobytes() + b"\x00" * pad)
    return header + b"".join(rows)


def decode_bmp(payload: bytes) -> np.ndarray:
    """24-bit uncompressed BMP → (h, w, 3) uint8 RGB (undoes BGR order,
    bottom-up rows and 4-byte row padding)."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP")
    off = int.from_bytes(payload[10:14], "little")
    w = int.from_bytes(payload[18:22], "little", signed=True)
    h = int.from_bytes(payload[22:26], "little", signed=True)
    bpp = int.from_bytes(payload[28:30], "little")
    comp = int.from_bytes(payload[30:34], "little")
    if bpp != 24 or comp != 0:
        raise NotImplementedError("only 24-bit BI_RGB BMP supported")
    top_down = h < 0
    h = abs(h)
    row_bytes = w * 3
    stride = row_bytes + (4 - row_bytes % 4) % 4
    out = np.empty((h, w, 3), dtype=np.uint8)
    for i in range(h):
        r = i if top_down else h - 1 - i
        row = np.frombuffer(
            payload, dtype=np.uint8, count=row_bytes, offset=off + i * stride
        ).reshape(w, 3)
        out[r] = row[:, ::-1]  # BGR → RGB
    return out


def encode_wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    """int16 mono PCM samples → RIFF/WAV bytes (stdlib ``wave``)."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAV bytes → (int16 mono samples, sample_rate)."""
    import io
    import wave

    with wave.open(io.BytesIO(payload), "rb") as wf:
        if wf.getsampwidth() != 2 or wf.getnchannels() != 1:
            raise NotImplementedError("only 16-bit mono PCM supported")
        rate = wf.getframerate()
        frames = wf.readframes(wf.getnframes())
    return np.frombuffer(frames, dtype="<i2"), rate


def _decode_image(payload: bytes, fake: bool) -> np.ndarray:
    """Dispatch on magic bytes: PPM and BMP decode for real (pure
    numpy); anything else (JPEG/PNG/...) needs Pillow/opencv, which
    this container lacks — deterministic fake when ``fake=True``
    (plumbing tests), ``NotImplementedError`` otherwise."""
    if payload and payload[:2] == b"P6":
        return decode_ppm(payload).mean(axis=2).astype(np.float32)
    if payload and payload[:2] == b"BM":
        return decode_bmp(payload).mean(axis=2).astype(np.float32)
    if not fake:
        raise NotImplementedError(
            "compressed image decode requires Pillow/opencv — not "
            "available in this container; use PPM/BMP payloads, pass "
            "fake=True, or install a codec"
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


# --------------------------------------------------------------------------
# deterministic media corpus + real decode → stats (oracle-gated)
# --------------------------------------------------------------------------

#: per-media decode statistics — everything integer, so the DuckDB
#: oracle (closed-form arithmetic over the same seeds) hash-matches
#: without float-rounding hazards
MEDIA_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_units", T.LongType(), True),
        T.StructField("first_val", T.LongType(), True),
        T.StructField("sum_val", T.LongType(), True),
    ]
)


def _synth_image(d: int) -> np.ndarray:
    """Deterministic (h, w, 3) image for seed ``d``: a 3-channel
    gradient — pixel(r, c, k) = (7d + 3r + 5c + 11k) mod 256. Every
    byte depends on its position, so any decoder layout bug (BGR not
    undone, bottom-up rows kept, padding miscounted) changes the
    decoded first/sum stats and fails the oracle gate."""
    w, h = 8 + d % 8, 4 + d % 4
    r = np.arange(h).reshape(h, 1, 1)
    c = np.arange(w).reshape(1, w, 1)
    k = np.arange(3).reshape(1, 1, 3)
    return ((7 * d + 3 * r + 5 * c + 11 * k) % 256).astype(np.uint8)


def _synth_audio(d: int) -> np.ndarray:
    """Deterministic int16 PCM for seed ``d``:
    s(i) = ((31d + 17i) mod 4096) − 2048, n = 64 + d mod 64."""
    n = 64 + d % 64
    i = np.arange(n, dtype=np.int64)
    return (((31 * d + 17 * i) % 4096) - 2048).astype(np.int16)


def synth_media(docs: DataFrame) -> DataFrame:
    """Deterministic media table seeded by ``doc_id`` (no external
    data, per the build brief): odd ids → PCM WAV; even ids → image,
    alternating real BMP (id % 4 == 0) and PPM (id % 4 == 2) so both
    decoders are exercised. Encoding runs in Arrow-batched
    ``mapInPandas`` — the producer half of the media path."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for d in pdf["doc_id"]:
                d = int(d)
                if d % 2 == 1:
                    s = _synth_audio(d)
                    rows.append(
                        {
                            "media_id": d,
                            "kind": "audio",
                            "payload": encode_wav(s, 8000),
                            "mime": "audio/wav",
                            "width": None,
                            "height": None,
                            "duration_ms": len(s) * 1000 // 8000,
                        }
                    )
                else:
                    img = _synth_image(d)
                    bmp = d % 4 == 0
                    rows.append(
                        {
                            "media_id": d,
                            "kind": "image",
                            "payload": encode_bmp(img) if bmp else encode_ppm(img),
                            "mime": "image/bmp" if bmp else "image/x-portable-pixmap",
                            "width": img.shape[1],
                            "height": img.shape[0],
                            "duration_ms": None,
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=[f.name for f in MEDIA_SCHEMA.fields],
            )

    return docs.select("doc_id").mapInPandas(op, MEDIA_SCHEMA)


def media_stats(media: DataFrame) -> DataFrame:
    """REAL decode of every payload (PPM/BMP/WAV by magic bytes) →
    integer stats per media row: dimensions, unit count (pixel bytes /
    samples), first decoded value, total sum. One Arrow batch per
    parquet row group; numpy does the per-payload work — no per-row
    Python beyond the payload loop itself (payloads are opaque blobs;
    this IS the batch shape Pillow/ffmpeg would use)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                payload = bytes(payload)
                if kind == "audio":
                    s, _rate = decode_wav(payload)
                    rows.append(
                        {
                            "media_id": int(mid),
                            "kind": kind,
                            "width": None,
                            "height": None,
                            "n_units": len(s),
                            "first_val": int(s[0]),
                            "sum_val": int(s.astype(np.int64).sum()),
                        }
                    )
                else:
                    arr = (
                        decode_ppm(payload)
                        if payload[:2] == b"P6"
                        else decode_bmp(payload)
                    )
                    rows.append(
                        {
                            "media_id": int(mid),
                            "kind": kind,
                            "width": arr.shape[1],
                            "height": arr.shape[0],
                            "n_units": int(arr.size),
                            "first_val": int(arr[0, 0, 0]),
                            "sum_val": int(arr.astype(np.int64).sum()),
                        }
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in MEDIA_STATS_SCHEMA.fields]
            )

    return media.select("media_id", "kind", "payload").mapInPandas(
        op, MEDIA_STATS_SCHEMA
    )
