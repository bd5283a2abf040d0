"""MP4 (ISO BMFF) and AVI (RIFF) container demux for MJPEG video.

Closes the compressed-video-container boundary for the one codec
chain this engine can decode end-to-end without ffmpeg: Motion-JPEG
samples in either container, fed frame-by-frame to the pure-numpy
JPEG codec (``operators/jpeg.py`` — baseline AND progressive). The
container layer itself is lossless byte bookkeeping, so demux is
gated on EXACT equality: the sample bytes coming out must equal the
sample bytes muxed in.

Scope (honest, enforced):

* **MP4**: top-level/nested box walking (32- and 64-bit sizes),
  ``moov → trak → mdia`` traversal picking the first ``vide``
  handler track, and the full sample-table resolution —
  ``stsd`` (fourcc), ``stts`` (decode timestamps), ``stsc``
  (chunk → samples-per-chunk runs), ``stsz`` (sizes), ``stco``/
  ``co64`` (chunk offsets) — into per-sample (ts_ms, bytes).
  ``jpeg``/``mjpg``/``MJPG`` sample entries decode; ``avc1``/
  ``hvc1``/``hev1``/``vp09``/``av01`` raise ``NotImplementedError``
  (H.264/HEVC/VP9/AV1 entropy decoding is out of scope, stated).
* **AVI**: RIFF chunk walking, ``strh`` (vids stream: rate/scale →
  fps), ``movi`` list with ``NNdc``/``NNdb`` frame chunks (even-byte
  padding honored). Non-MJPEG ``strh`` handlers raise.
* **Muxers** (`mux_mp4_mjpeg`, `mux_avi_mjpeg`) emit minimal
  spec-valid files — one video track, one chunk (MP4) / one movi
  list (AVI) — used by the round-trip gates and the synthetic media
  corpus. They are independent code paths from the demuxers (box
  building vs box walking), so a demux bug cannot cancel.

Like JPEG itself, container-decoded frames are lossy downstream of
the demux and therefore stay OUT of the integer-exact media oracle;
the gates live in pytest.
"""

from __future__ import annotations

import struct

import numpy as np

# ------------------------------------------------------------------ MP4 mux

def _box(tag: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + tag + payload


def _fullbox(tag: bytes, version: int, flags: int, payload: bytes) -> bytes:
    return _box(tag, struct.pack(">I", (version << 24) | flags) + payload)


def mux_mp4_mjpeg(
    samples: list[bytes], fps: int, width: int, height: int
) -> bytes:
    """JPEG frame bytes → minimal ISO BMFF: ``ftyp`` + ``mdat`` with
    the samples concatenated + ``moov`` whose sample table addresses
    them as one chunk of uniform-duration ``jpeg`` samples at
    ``timescale=fps, delta=1``."""
    n = len(samples)
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2")
    mdat_payload = b"".join(samples)
    mdat = _box(b"mdat", mdat_payload)
    first_sample_off = len(ftyp) + 8  # mdat header precedes sample 0

    mvhd = _fullbox(
        b"mvhd", 0, 0,
        struct.pack(">IIII", 0, 0, fps, n)          # ctime mtime timescale dur
        + struct.pack(">IH", 0x00010000, 0x0100)    # rate 1.0, volume 1.0
        + b"\x00" * 10
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24
        + struct.pack(">I", 2),                     # next track id
    )
    tkhd = _fullbox(
        b"tkhd", 0, 3,
        struct.pack(">IIIII", 0, 0, 1, 0, n)        # ctime mtime id rsvd dur
        + b"\x00" * 8
        + struct.pack(">HHHH", 0, 0, 0, 0)          # layer group volume rsvd
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + struct.pack(">II", width << 16, height << 16),
    )
    mdhd = _fullbox(
        b"mdhd", 0, 0,
        struct.pack(">IIII", 0, 0, fps, n) + struct.pack(">HH", 0x55C4, 0),
    )
    hdlr = _fullbox(
        b"hdlr", 0, 0,
        struct.pack(">I", 0) + b"vide" + b"\x00" * 12 + b"MJPEG\x00",
    )
    entry = (
        b"\x00" * 6 + struct.pack(">H", 1)          # reserved + data_ref_idx
        + b"\x00" * 16
        + struct.pack(">HH", width, height)
        + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
        + struct.pack(">I", 0)
        + struct.pack(">H", 1)                      # frames per sample
        + b"\x00" * 32                              # compressor name
        + struct.pack(">Hh", 24, -1),               # depth, pre_defined
    )
    stsd = _fullbox(
        b"stsd", 0, 0,
        struct.pack(">I", 1) + _box(b"jpeg", b"".join(entry)),
    )
    stts = _fullbox(b"stts", 0, 0, struct.pack(">III", 1, n, 1))
    stsc = _fullbox(b"stsc", 0, 0, struct.pack(">IIII", 1, 1, n, 1))
    stsz = _fullbox(
        b"stsz", 0, 0,
        struct.pack(">II", 0, n)
        + b"".join(struct.pack(">I", len(s)) for s in samples),
    )
    stco = _fullbox(b"stco", 0, 0, struct.pack(">II", 1, first_sample_off))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    dref = _fullbox(
        b"dref", 0, 0, struct.pack(">I", 1) + _fullbox(b"url ", 0, 1, b"")
    )
    dinf = _box(b"dinf", dref)
    vmhd = _fullbox(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
    minf = _box(b"minf", vmhd + dinf + stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


# ---------------------------------------------------------------- MP4 demux

def _walk_boxes(buf: bytes, start: int, end: int):
    """Yield (tag, body_start, body_end) for the boxes in [start, end)."""
    pos = start
    while pos + 8 <= end:
        size = int.from_bytes(buf[pos : pos + 4], "big")
        tag = buf[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:  # 64-bit largesize
            size = int.from_bytes(buf[pos + 8 : pos + 16], "big")
            body = pos + 16
        elif size == 0:  # box extends to end of enclosing scope
            size = end - pos
        if size < 8 or pos + size > end:
            raise ValueError(f"bad MP4 box size {size} at {pos}")
        yield tag, body, pos + size
        pos += size


def _find(buf, start, end, tag):
    for t, b, e in _walk_boxes(buf, start, end):
        if t == tag:
            return b, e
    return None


def demux_mp4(payload: bytes) -> dict:
    """ISO BMFF bytes → the first video track's samples:
    ``{"fourcc": str, "timescale": int, "samples": [(ts_ms, bytes)]}``.
    Resolves the full stbl chain (stts/stsc/stsz/stco|co64)."""
    if payload[4:8] != b"ftyp":
        raise ValueError("not an ISO BMFF file (missing ftyp)")
    moov = _find(payload, 0, len(payload), b"moov")
    if moov is None:
        raise ValueError("MP4 missing moov")
    for tag, tb, te in _walk_boxes(payload, *moov):
        if tag != b"trak":
            continue
        mdia = _find(payload, tb, te, b"mdia")
        if mdia is None:
            continue
        hdlr = _find(payload, *mdia, b"hdlr")
        if hdlr is None or payload[hdlr[0] + 8 : hdlr[0] + 12] != b"vide":
            continue
        mdhd = _find(payload, *mdia, b"mdhd")
        if mdhd is None:
            raise ValueError("MP4 video track missing mdhd")
        version = payload[mdhd[0]]
        timescale = int.from_bytes(
            payload[mdhd[0] + (20 if version else 12) :][:4], "big"
        )
        if not timescale:
            raise ValueError("MP4 video track has zero timescale")
        minf = _find(payload, *mdia, b"minf")
        if minf is None:
            raise ValueError("MP4 video track missing minf")
        stbl = _find(payload, *minf, b"stbl")
        if stbl is None:
            raise ValueError("MP4 video track missing stbl")
        tables = {}
        for t, b, e in _walk_boxes(payload, *stbl):
            tables[t] = (b, e)

        def _need(tag):
            if tag not in tables:
                raise ValueError(f"MP4 stbl missing {tag.decode()}")
            return tables[tag]

        sb, _se = _need(b"stsd")
        fourcc = payload[sb + 12 : sb + 16].decode("latin1")
        # stts → per-sample decode-time deltas
        sb, _se = _need(b"stts")
        n_ent = int.from_bytes(payload[sb + 4 : sb + 8], "big")
        deltas = []
        for i in range(n_ent):
            cnt, dur = struct.unpack_from(">II", payload, sb + 8 + 8 * i)
            deltas.extend([dur] * cnt)
        # stsz → sizes
        sb, _se = _need(b"stsz")
        fixed, n_samp = struct.unpack_from(">II", payload, sb + 4)
        if fixed:
            sizes = [fixed] * n_samp
        else:
            sizes = list(
                struct.unpack_from(f">{n_samp}I", payload, sb + 12)
            )
        # stco / co64 → chunk offsets
        if b"stco" in tables:
            sb, _se = tables[b"stco"]
            n_ch = int.from_bytes(payload[sb + 4 : sb + 8], "big")
            offsets = list(struct.unpack_from(f">{n_ch}I", payload, sb + 8))
        else:
            sb, _se = _need(b"co64")
            n_ch = int.from_bytes(payload[sb + 4 : sb + 8], "big")
            offsets = list(struct.unpack_from(f">{n_ch}Q", payload, sb + 8))
        # stsc → samples-per-chunk runs (first_chunk is 1-based; each
        # run holds until the next run's first_chunk)
        sb, _se = _need(b"stsc")
        n_ent = int.from_bytes(payload[sb + 4 : sb + 8], "big")
        runs = [
            struct.unpack_from(">III", payload, sb + 8 + 12 * i)[:2]
            for i in range(n_ent)
        ]
        spc_per_chunk = []
        for i, (first, spc) in enumerate(runs):
            last = runs[i + 1][0] - 1 if i + 1 < len(runs) else len(offsets)
            spc_per_chunk.extend([spc] * (last - first + 1))
        # demux contract: malformed sample tables raise DESCRIPTIVE
        # ValueError (which R2-quarantines), never an opaque IndexError
        # from the loops below (round-5 ADVICE)
        if n_samp > 0 and not deltas:
            raise ValueError(
                f"MP4 stts has no entries but stsz declares {n_samp} samples"
            )
        if len(spc_per_chunk) < len(offsets):
            raise ValueError(
                f"MP4 stsc runs cover {len(spc_per_chunk)} chunks but "
                f"stco lists {len(offsets)}"
            )
        samples = []
        t = 0
        si = 0
        for ci, chunk_off in enumerate(offsets):
            off = chunk_off
            for _ in range(spc_per_chunk[ci]):
                if si >= n_samp:
                    break
                size = sizes[si]
                ts_ms = round(t * 1000 / timescale)
                samples.append((ts_ms, payload[off : off + size]))
                off += size
                t += deltas[si] if si < len(deltas) else deltas[-1]
                si += 1
        return {
            "fourcc": fourcc,
            "timescale": timescale,
            "samples": samples,
            # t has accumulated every consumed sample's stts delta, so
            # it IS the stream duration in time-units at this point
            "duration_ms": t * 1000.0 / timescale,
        }
    raise ValueError("MP4 has no video track")


_MJPEG_FOURCCS = {"jpeg", "mjpg", "MJPG", "AVDJ", "dmb1"}
_KNOWN_CODED = {"avc1", "avc3", "hvc1", "hev1", "vp09", "av01", "mp4v"}


def _require_mjpeg_fourcc(fourcc: str) -> None:
    if fourcc in _MJPEG_FOURCCS:
        return
    if fourcc in _KNOWN_CODED:
        raise NotImplementedError(
            f"{fourcc} entropy decoding requires ffmpeg — only "
            "Motion-JPEG MP4 tracks decode here"
        )
    raise ValueError(f"unknown MP4 sample entry {fourcc!r}")


def rgb_to_luma(frames: np.ndarray) -> np.ndarray:
    """Rec.601 integer luma of a (..., 3) uint8 RGB array — the ONE
    definition shared by the frame sampler and media_stats so their
    bytes can never diverge."""
    return np.clip(
        np.round(
            0.299 * frames[..., 0]
            + 0.587 * frames[..., 1]
            + 0.114 * frames[..., 2]
        ),
        0,
        255,
    ).astype(np.uint8)


def demux_mjpeg_container(payload: bytes) -> dict:
    """MP4 or AVI bytes → ``{"samples": [bytes], "ts_ms": [int],
    "duration_ms": float}`` for the first Motion-JPEG video stream,
    WITHOUT decoding any sample — callers that subsample frames pick
    their indices from ``ts_ms`` and JPEG-decode only those."""
    if payload[4:8] == b"ftyp":
        track = demux_mp4(payload)
        _require_mjpeg_fourcc(track["fourcc"])
        if not track["samples"]:
            # the zero-samples contract: raise so the frame sampler's
            # except branch emits a quarantined error row, matching
            # decode_mp4_frames (round-5 ADVICE — a structurally valid
            # container with no samples silently yielded zero rows)
            raise ValueError("MP4 video track has no samples")
        return {
            "samples": [s for _ts, s in track["samples"]],
            "ts_ms": [ts for ts, _s in track["samples"]],
            "duration_ms": track["duration_ms"],
        }
    track = demux_avi(payload)
    if not track["samples"]:
        raise ValueError("AVI vids stream has no samples")
    n = len(track["samples"])
    fps = track["fps"]
    return {
        "samples": track["samples"],
        "ts_ms": [round(i * 1000 / fps) for i in range(n)],
        "duration_ms": n * 1000.0 / fps,
    }


def decode_mp4_frames(payload: bytes):
    """MP4 bytes → ((n, h, w, 3) uint8 RGB frames, [ts_ms]). Only
    Motion-JPEG sample entries decode; H.264/HEVC/VP9/AV1 tracks are
    an explicit boundary."""
    from .jpeg import decode_jpeg

    track = demux_mp4(payload)
    _require_mjpeg_fourcc(track["fourcc"])
    if not track["samples"]:
        raise ValueError("MP4 video track has no samples")
    frames = [decode_jpeg(s) for _ts, s in track["samples"]]
    return np.stack(frames), [ts for ts, _s in track["samples"]]


# ------------------------------------------------------------------ AVI mux

def _riff_chunk(tag: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) % 2 else b""  # RIFF chunks word-align
    return tag + struct.pack("<I", len(payload)) + payload + pad


def _riff_list(tag: bytes, payload: bytes) -> bytes:
    return _riff_chunk(b"LIST", tag + payload)


def mux_avi_mjpeg(
    samples: list[bytes], fps: int, width: int, height: int
) -> bytes:
    """JPEG frame bytes → minimal RIFF AVI: hdrl (avih + one MJPG vids
    strl) + movi with one ``00dc`` chunk per frame."""
    n = len(samples)
    maxs = max((len(s) for s in samples), default=0)
    avih = _riff_chunk(
        b"avih",
        struct.pack(
            "<14I", 1_000_000 // fps, maxs * fps, 0, 0x10, n, 0, 1, maxs,
            width, height, 0, 0, 0, 0,
        ),
    )
    strh = _riff_chunk(
        b"strh",
        b"vids" + b"MJPG"
        + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, fps, 0, n, maxs,
                      0xFFFFFFFF, 0)
        + struct.pack("<4H", 0, 0, width, height),
    )
    strf = _riff_chunk(
        b"strf",
        struct.pack("<IiiHH4sIiiII", 40, width, height, 1, 24, b"MJPG",
                    width * height * 3, 0, 0, 0, 0),
    )
    hdrl = _riff_list(b"hdrl", avih + _riff_list(b"strl", strh + strf))
    movi = _riff_list(
        b"movi", b"".join(_riff_chunk(b"00dc", s) for s in samples)
    )
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


# ---------------------------------------------------------------- AVI demux

_HEX_DIGITS = frozenset(b"0123456789abcdefABCDEF")


def _is_hex2(b2: bytes) -> bool:
    return len(b2) == 2 and all(c in _HEX_DIGITS for c in b2)


def _walk_riff(buf: bytes, start: int, end: int):
    """Yield (tag, list_type_or_None, body_start, body_end)."""
    pos = start
    while pos + 8 <= end:
        tag = buf[pos : pos + 4]
        size = struct.unpack_from("<I", buf, pos + 4)[0]
        body, bend = pos + 8, pos + 8 + size
        if bend > end:
            raise ValueError(f"bad RIFF chunk size {size} at {pos}")
        if tag in (b"LIST", b"RIFF"):
            yield tag, buf[body : body + 4], body + 4, bend
        else:
            yield tag, None, body, bend
        pos = bend + (size % 2)  # word alignment


def demux_avi(payload: bytes) -> dict:
    """RIFF AVI bytes → ``{"fps": float, "samples": [bytes]}`` from
    the FIRST vids stream's ``NNdc``/``NNdb`` movi chunks. AVI movi
    chunk tags carry the stream number (``00dc`` = stream 0), and
    stream N is the Nth ``strh`` in file order counting ALL streams
    (audio included) — so chunks belonging to other streams are
    filtered out rather than interleaved in, and a second vids strh
    cannot overwrite the first stream's timing."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF AVI file")
    stream_idx = -1  # counts every strh (any type) in file order
    vids = None  # (stream_idx, handler, scale, rate) of FIRST vids
    chunks = []  # (stream_no, bytes)

    def walk(start, end):
        nonlocal stream_idx, vids
        for tag, _ltype, b, e in _walk_riff(payload, start, end):
            if tag in (b"LIST", b"RIFF"):
                walk(b, e)
            elif tag == b"strh":
                stream_idx += 1
                if payload[b : b + 4] == b"vids" and vids is None:
                    handler = payload[b + 4 : b + 8]
                    scale, rate = struct.unpack_from("<II", payload, b + 20)
                    vids = (stream_idx, handler, scale, rate)
            elif tag[2:4] in (b"dc", b"db") and _is_hex2(tag[:2]):
                # stream numbers are TWO ASCII HEX digits per the RIFF
                # AVI spec — decimal-only parsing dropped streams ≥ 10
                # ('0A'dc etc., round-5 ADVICE)
                chunks.append((int(tag[:2], 16), payload[b:e]))

    walk(12, len(payload))
    if vids is None:
        raise ValueError("AVI has no vids stream header")
    idx, handler, scale, rate = vids
    if handler not in (b"MJPG", b"mjpg", b"jpeg", b"\x00\x00\x00\x00"):
        raise NotImplementedError(
            f"AVI codec {handler!r} requires ffmpeg — only "
            "Motion-JPEG streams decode here"
        )
    if not scale or not rate:
        raise ValueError("AVI vids stream has zero timing (rate/scale)")
    return {
        "fps": rate / scale,
        "samples": [s for no, s in chunks if no == idx],
    }


def decode_avi_frames(payload: bytes):
    """AVI bytes → ((n, h, w, 3) uint8 RGB frames, [ts_ms])."""
    from .jpeg import decode_jpeg

    track = demux_avi(payload)
    if not track["samples"]:
        raise ValueError("AVI vids stream has no samples")
    frames = [decode_jpeg(s) for s in track["samples"]]
    ts = [round(i * 1000 / track["fps"]) for i in range(len(frames))]
    return np.stack(frames), ts
