"""JPEG (ITU-T T.81) encode/decode in pure numpy + stdlib.

Closes the last image-codec capability boundary without Pillow: the
engine can now produce and interpret REAL compressed JPEG payloads.
Scope (honest, enforced):

* **Decoder**: 8-bit Huffman DCT, both baseline sequential (SOF0) and
  progressive (SOF2, Annex G): spectral selection, successive
  approximation (DC + AC first/refinement scans with EOB runs),
  interleaved and per-component non-interleaved scan geometry.
  Grayscale or 3-component with sampling factors 1–2 (4:4:4, 4:2:2
  and the ubiquitous 4:2:0 — generic interleaved-MCU loop with
  nearest-neighbor chroma upsampling), restart intervals (DRI/RSTn
  with DC predictor / EOB-run reset), Huffman tables read from the
  stream's own DHT segments (arbitrary canonical tables, not just
  Annex K), quantization from DQT, JFIF/APP/COM segments skipped.
  Arithmetic coding, 12-bit precision, lossless and hierarchical
  modes raise ``NotImplementedError``.
* **Encoder**: matching subsets — Annex-K quantization tables scaled
  by libjpeg's quality formula, flat canonical Huffman tables (every
  DC category 4 bits; AC symbols 9–10 bits) emitted in DHT, baseline
  (``encode_jpeg``) or a multi-scan progressive script
  (``encode_progressive_jpeg``: interleaved DC first + refinement,
  per-component spectral bands, two-level successive approximation
  for luma). Flat codes trade compression for simplicity; the output
  is a spec-valid JPEG any decoder reads.

Because JPEG is lossy, round-trip tests assert bounded error (the DCT
quantization error at a given quality), never byte equality — which is
also why JPEG payloads stay OUT of the integer-exact media oracle gate
(`media_decode_features`); the codec is pytest-gated instead.

All heavy math is vectorized: the 2-D DCT/IDCT are two matrix products
over a (n_blocks, 8, 8) tensor via einsum; only the entropy coding
walks symbols in Python (inherent to Huffman bitstreams; bounded by
symbols, not pixels).
"""

from __future__ import annotations

import numpy as np

# ----------------------------------------------------------------- tables

#: Annex K luminance / chrominance quantization tables (row-major)
QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32).reshape(8, 8)

QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32).reshape(8, 8)


def _zigzag_indices() -> np.ndarray:
    """Linear indices (into a flattened 8×8 block) in zigzag order,
    computed by the diagonal walk rather than hardcoded."""
    order = []
    for s in range(15):
        rng = range(max(0, s - 7), min(s, 7) + 1)
        diag = [(s - j, j) for j in rng]
        if s % 2 == 0:
            diag = diag[::-1]
        order.extend(r * 8 + c for r, c in diag)
    return np.array(order, dtype=np.int64)


ZIGZAG = _zigzag_indices()
UNZIGZAG = np.argsort(ZIGZAG)

#: orthonormal DCT-II matrix: dct2(B) = C @ B @ C.T
_k = np.arange(8)
DCT_M = np.sqrt(2.0 / 8.0) * np.cos((2 * _k[None, :] + 1) * _k[:, None] * np.pi / 16.0)
DCT_M[0] /= np.sqrt(2.0)


def _quality_scale(table: np.ndarray, quality: int) -> np.ndarray:
    quality = min(max(int(quality), 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((table * scale + 50) // 100, 1, 255).astype(np.int32)


# ------------------------------------------------------------ bit streams

class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, value: int, length: int) -> None:
        self._acc = (self._acc << length) | (value & ((1 << length) - 1))
        self._n += length
        while self._n >= 8:
            self._n -= 8
            b = (self._acc >> self._n) & 0xFF
            self.out.append(b)
            if b == 0xFF:  # byte stuffing
                self.out.append(0x00)

    def flush(self) -> bytes:
        if self._n:
            pad = 8 - self._n
            self.write((1 << pad) - 1, pad)  # pad with 1s per spec
        return bytes(self.out)


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self._acc = 0
        self._n = 0

    def _fill(self) -> None:
        # drop already-consumed high bits FIRST: without this the
        # accumulator grows with the whole stream and every shift
        # degrades to O(stream length) big-int work
        self._acc &= (1 << self._n) - 1
        while self._n <= 24:
            if self.pos >= len(self.data):
                self._acc = (self._acc << 8) | 0
                self._n += 8
                continue
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.data[self.pos] if self.pos < len(self.data) else 0
                if nxt == 0x00:
                    self.pos += 1  # unstuff
                else:
                    # a real marker terminates entropy data; feed 0s
                    self.pos -= 1
                    self._acc = (self._acc << 8) | 0
                    self._n += 8
                    continue
            self._acc = (self._acc << 8) | b
            self._n += 8

    def read(self, length: int) -> int:
        if length == 0:
            return 0
        n = self._n
        if n < length:
            self._fill()
            n = self._n
        n -= length
        self._n = n
        return (self._acc >> n) & ((1 << length) - 1)

    def peek16(self) -> int:
        """Next 16 bits without consuming (zero-padded past the end) —
        the fast path for LUT Huffman decode."""
        if self._n < 16:
            self._fill()
        return (self._acc >> (self._n - 16)) & 0xFFFF

    def skip(self, length: int) -> None:
        self._n -= length

    def restart(self) -> None:
        """Consume an RSTn marker: discard the current byte's padding
        bits (the encoder byte-aligns before each restart) and step
        over the two marker bytes. Pre-read bits in the accumulator
        are garbage past the alignment point — drop them entirely."""
        self._acc = 0
        self._n = 0
        if (
            self.pos + 1 < len(self.data)
            and self.data[self.pos] == 0xFF
            and 0xD0 <= self.data[self.pos + 1] <= 0xD7
        ):
            self.pos += 2


# ------------------------------------------------------------ huffman

class _HuffTable:
    """Canonical Huffman table from DHT (bits[1..16], values)."""

    def __init__(self, bits: list[int], values: list[int]):
        self.bits = bits
        self.values = values
        self.enc: dict[int, tuple[int, int]] = {}
        self.dec: dict[tuple[int, int], int] = {}
        self.lut = None  # 16-bit-prefix decode LUT, built on first use
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                sym = values[k]
                self.enc[sym] = (code, length)
                self.dec[(length, code)] = sym
                code += 1
                k += 1
            code <<= 1

    def decode(self, br: _BitReader) -> int:
        # 16-bit-prefix LUT (built lazily): one peek + one list index
        # per symbol instead of up to 16 single-bit reads — the hot
        # path of every scan, ~10× on multi-scan progressive streams
        lut = self.lut
        if lut is None:
            lut = self.lut = self._build_lut()
        ent = lut[br.peek16()]
        if ent is None:
            raise ValueError("invalid Huffman code in entropy stream")
        br.skip(ent & 0x1F)
        return ent >> 5

    def _build_lut(self):
        lut = [None] * 65536
        for (length, code), sym in self.dec.items():
            packed = (sym << 5) | length
            base = code << (16 - length)
            for i in range(1 << (16 - length)):
                lut[base + i] = packed
        return lut


def _flat_dc_table() -> _HuffTable:
    bits = [0] * 16
    bits[3] = 12  # all 12 DC size categories at 4 bits (12 < 15)
    return _HuffTable(bits, list(range(12)))


def _flat_ac_table() -> _HuffTable:
    bits = [0] * 16
    bits[8] = 255  # 255 symbols at 9 bits …
    bits[9] = 1    # … and the last at 10 (count byte caps at 255)
    return _HuffTable(bits, list(range(256)))


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length() if v < 0 else 0


def _amplitude(v: int, size: int) -> int:
    return v if v >= 0 else v + (1 << size) - 1


def _extend(bits_val: int, size: int) -> int:
    if size == 0:
        return 0
    return bits_val if bits_val >= (1 << (size - 1)) else bits_val - (1 << size) + 1


# ------------------------------------------------- progressive scans

def _init_pstate(frame: dict) -> dict:
    """Per-frame progressive state: one zigzag-order (gy*gx, 64)
    coefficient array per component, sized to the MCU-padded grid
    (interleaved DC scans walk padded grids with dummy edge blocks),
    plus each component's ACTUAL block dims (non-interleaved scans
    walk ceil(comp_dim/8) only, T.81 A.2.2)."""
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-frame["w"] // (8 * hmax))
    mcuy = -(-frame["h"] // (8 * vmax))
    grids = [(mcuy * c["v"], mcux * c["h"]) for c in comps]
    nb = [
        (
            -(-(frame["h"] * c["v"]) // (8 * vmax)),
            -(-(frame["w"] * c["h"]) // (8 * hmax)),
        )
        for c in comps
    ]
    return {
        "hmax": hmax, "vmax": vmax, "mcux": mcux, "mcuy": mcuy,
        "grids": grids, "nb": nb,
        "zz": [np.zeros((gy * gx, 64), dtype=np.int32) for gy, gx in grids],
    }


def _prog_dc_block(br, zzc, b, dc_t, pred, ci, Ah, Al) -> None:
    if Ah == 0:  # first pass: Huffman-coded diff, point-transformed
        size = dc_t.decode(br)
        pred[ci] += _extend(br.read(size), size)
        zzc[b, 0] = pred[ci] << Al
    elif br.read(1):  # refinement: one appended bit per block
        zzc[b, 0] = int(zzc[b, 0]) | (1 << Al)


def _prog_dc_scan(br, pstate, scomps, Ah, Al, ri) -> None:
    """DC scan (Ss=0). ``scomps`` = [(comp_idx, comp, dc_table)] in
    scan order; >1 component → interleaved MCU walk over the padded
    grids, exactly 1 → raster over that component's actual grid."""
    zz = pstate["zz"]
    if len(scomps) > 1:
        pred = {ci: 0 for ci, _, _ in scomps}
        cnt = 0
        for my in range(pstate["mcuy"]):
            for mx in range(pstate["mcux"]):
                if ri and cnt and cnt % ri == 0:
                    br.restart()
                    pred = {ci: 0 for ci, _, _ in scomps}
                cnt += 1
                for ci, comp, dc_t in scomps:
                    _gy, gx = pstate["grids"][ci]
                    for bv in range(comp["v"]):
                        for bh in range(comp["h"]):
                            b = (my * comp["v"] + bv) * gx + (
                                mx * comp["h"] + bh
                            )
                            _prog_dc_block(br, zz[ci], b, dc_t, pred, ci, Ah, Al)
    else:
        ci, _comp, dc_t = scomps[0]
        nby, nbx = pstate["nb"][ci]
        _gy, gx = pstate["grids"][ci]
        pred = {ci: 0}
        cnt = 0
        for r in range(nby):
            for c in range(nbx):
                if ri and cnt and cnt % ri == 0:
                    br.restart()
                    pred = {ci: 0}
                cnt += 1
                _prog_dc_block(br, zz[ci], r * gx + c, dc_t, pred, ci, Ah, Al)


def _prog_ac_first_block(br, zzc, b, ac_t, Ss, Se, Al, eobrun) -> int:
    """AC first pass (Ah=0, T.81 G.1.2.2): run/size symbols as in
    sequential, but EOB carries a run length over FOLLOWING all-zero
    (in-band) blocks: symbol (r,0) with r<15 → skip 2^r-1+extra
    blocks after this one."""
    if eobrun > 0:
        return eobrun - 1
    k = Ss
    while k <= Se:
        rs = ac_t.decode(br)
        run, size = rs >> 4, rs & 0x0F
        if size == 0:
            if run == 15:
                k += 16  # ZRL
                continue
            return (1 << run) - 1 + (br.read(run) if run else 0)
        k += run
        if k > Se:
            raise ValueError("AC run overflows spectral band")
        zzc[b, k] = _extend(br.read(size), size) << Al
        k += 1
    return 0


def _prog_ac_refine_block(br, zzc, b, ac_t, Ss, Se, Al, eobrun) -> int:
    """AC refinement (Ah=Al+1, T.81 G.1.2.3): newly-nonzero
    coefficients arrive as ±1<<Al; every already-nonzero coefficient
    visited consumes one correction bit; EOB runs append correction
    bits for the remainder of each covered block."""
    p1, m1 = 1 << Al, -(1 << Al)
    if eobrun > 0 and not zzc[b, Ss : Se + 1].any():
        return eobrun - 1  # all-zero history: no correction bits ride
    # hot loop works on a Python list (numpy scalar indexing is ~10×
    # slower per element), written back once
    band = zzc[b, Ss : Se + 1].tolist()
    n = len(band)
    read = br.read
    j = 0
    if eobrun == 0:
        while j < n:
            rs = ac_t.decode(br)
            run, size = rs >> 4, rs & 0x0F
            if size == 0:
                if run != 15:
                    eobrun = (1 << run) + (read(run) if run else 0)
                    break
                val = 0  # ZRL: skip 16 zero-history positions
            else:
                if size != 1:
                    raise ValueError("refinement magnitude must be 1")
                val = p1 if read(1) else m1
            while j < n:
                cur = band[j]
                if cur != 0:
                    if read(1) and (cur & p1) == 0:
                        band[j] = cur + (p1 if cur >= 0 else m1)
                else:
                    if run == 0:
                        break
                    run -= 1
                j += 1
            if val and j < n:
                band[j] = val
            j += 1
    if eobrun > 0:
        while j < n:  # correction bits through end of band
            cur = band[j]
            if cur != 0 and read(1) and (cur & p1) == 0:
                band[j] = cur + (p1 if cur >= 0 else m1)
            j += 1
        eobrun -= 1
    zzc[b, Ss : Se + 1] = band
    return eobrun


def _prog_ac_scan(br, pstate, ci, ac_t, Ss, Se, Ah, Al, ri) -> None:
    """AC scan — always non-interleaved (one component, raster over
    its actual block grid; T.81 G.1.1.1 forbids interleaved AC)."""
    zzc = pstate["zz"][ci]
    nby, nbx = pstate["nb"][ci]
    _gy, gx = pstate["grids"][ci]
    eobrun = 0
    cnt = 0
    for r in range(nby):
        for c in range(nbx):
            if ri and cnt and cnt % ri == 0:
                br.restart()
                eobrun = 0
            cnt += 1
            b = r * gx + c
            if Ah == 0:
                eobrun = _prog_ac_first_block(
                    br, zzc, b, ac_t, Ss, Se, Al, eobrun
                )
            else:
                eobrun = _prog_ac_refine_block(
                    br, zzc, b, ac_t, Ss, Se, Al, eobrun
                )


# ------------------------------------------------------------ color

def _rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    r, g, b = (rgb[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = (ycc[..., i] for i in range(3))
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)


# ------------------------------------------------------------ block math

def _to_blocks(plane: np.ndarray) -> tuple[np.ndarray, int, int]:
    """Pad (h, w) to multiples of 8 by edge replication and return
    (n_blocks, 8, 8) float blocks plus the padded block grid shape."""
    h, w = plane.shape
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")
    by, bx = ph // 8, pw // 8
    blocks = padded.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    return blocks.astype(np.float64), by, bx


def _from_blocks(blocks: np.ndarray, by: int, bx: int, h: int, w: int) -> np.ndarray:
    full = blocks.reshape(by, bx, 8, 8).transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)
    return full[:h, :w]


def _fdct_quant(blocks: np.ndarray, qt: np.ndarray) -> np.ndarray:
    coef = np.einsum("ux,nxy,vy->nuv", DCT_M, blocks - 128.0, DCT_M)
    return np.round(coef / qt).astype(np.int32)


def _dequant_idct(coefs: np.ndarray, qt: np.ndarray) -> np.ndarray:
    blocks = np.einsum("xu,nuv,yv->nxy", DCT_M.T, coefs * qt.astype(np.float64), DCT_M.T)
    return blocks + 128.0


# ------------------------------------------------------------ encoder

def _encode_block(bw: _BitWriter, zz: np.ndarray, pred: int,
                  dc_tab: _HuffTable, ac_tab: _HuffTable) -> int:
    diff = int(zz[0]) - pred
    size = _category(diff)
    code, ln = dc_tab.enc[size]
    bw.write(code, ln)
    if size:
        bw.write(_amplitude(diff, size), size)
    run = 0
    nz = np.nonzero(zz[1:])[0]
    last = nz[-1] + 1 if len(nz) else 0
    for k in range(1, last + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_tab.enc[0xF0]  # ZRL
            bw.write(code, ln)
            run -= 16
        size = _category(v)
        code, ln = ac_tab.enc[(run << 4) | size]
        bw.write(code, ln)
        bw.write(_amplitude(v, size), size)
        run = 0
    if last < 63:
        code, ln = ac_tab.enc[0x00]  # EOB
        bw.write(code, ln)
    return int(zz[0])


def _prepare_components(img: np.ndarray, quality: int, subsample: bool):
    """Shared encoder front half: color transform, optional 4:2:0
    subsampling, blocking, FDCT + quantization. Returns
    (h, w, comp_coefs, grids, samp, qsel, qts)."""
    gray = img.ndim == 2
    h, w = img.shape[:2]
    if gray:
        planes = [img.astype(np.float64)]
        qts = [_quality_scale(QT_LUMA, quality)]
        qsel, samp = [0], [(1, 1)]
    elif subsample:
        ph, pw = -(-h // 16) * 16, -(-w // 16) * 16
        padded = np.pad(img, ((0, ph - h), (0, pw - w), (0, 0)), mode="edge")
        ycc = _rgb_to_ycbcr(padded)
        cb = ycc[..., 1].reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
        cr = ycc[..., 2].reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
        planes = [ycc[..., 0], cb, cr]
        qts = [_quality_scale(QT_LUMA, quality), _quality_scale(QT_CHROMA, quality)]
        qsel, samp = [0, 1, 1], [(2, 2), (1, 1), (1, 1)]
    else:
        ycc = _rgb_to_ycbcr(img)
        planes = [ycc[..., 0], ycc[..., 1], ycc[..., 2]]
        qts = [_quality_scale(QT_LUMA, quality), _quality_scale(QT_CHROMA, quality)]
        qsel, samp = [0, 1, 1], [(1, 1), (1, 1), (1, 1)]
    comp_coefs, grids = [], []
    for ci, plane in enumerate(planes):
        blocks, by, bx = _to_blocks(plane)
        grids.append((by, bx))
        comp_coefs.append(_fdct_quant(blocks, qts[qsel[ci]]))
    return h, w, comp_coefs, grids, samp, qsel, qts


def _seg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body


def _jpeg_headers(sof_marker, h, w, samp, qsel, qts, dc_tab, ac_tab):
    """SOI + APP0 + DQT + SOF + DHT prefix shared by both encoders."""
    out = [b"\xff\xd8"]
    out.append(_seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"))
    for tid, qt in enumerate(qts):
        out.append(_seg(0xDB, bytes([tid]) + bytes(qt.ravel()[ZIGZAG].astype(np.uint8))))
    ncomp = len(samp)
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([ncomp])
    for ci in range(ncomp):
        hi, vi = samp[ci]
        sof += bytes([ci + 1, (hi << 4) | vi, qsel[ci]])
    out.append(_seg(sof_marker, sof))
    for tc, tab in ((0, dc_tab), (1, ac_tab)):
        out.append(_seg(0xC4, bytes([tc << 4]) + bytes(tab.bits) + bytes(tab.values)))
    return out


def encode_jpeg(
    img: np.ndarray, quality: int = 90, subsample: bool = False
) -> bytes:
    """(h, w) grayscale or (h, w, 3) RGB uint8 → baseline JPEG bytes
    (flat Huffman tables declared in DHT). ``subsample=True`` emits
    4:2:0 (luma 2×2 per MCU, box-filtered half-resolution chroma) —
    the layout virtually all real-world JPEGs use; default is 4:4:4."""
    h, w, comp_coefs, grids, samp, qsel, qts = _prepare_components(
        img, quality, subsample
    )
    dc_tab, ac_tab = _flat_dc_table(), _flat_ac_table()
    # generic MCU-interleaved write (hi×vi blocks per comp per MCU)
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcuy, mcux = grids[0][0] // vmax, grids[0][1] // hmax
    bw = _BitWriter()
    pred = [0] * len(comp_coefs)
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, coefs in enumerate(comp_coefs):
                hi, vi = samp[ci]
                _by, bx = grids[ci]
                for bv in range(vi):
                    for bh in range(hi):
                        b = (my * vi + bv) * bx + (mx * hi + bh)
                        zz = coefs[b].ravel()[ZIGZAG]
                        pred[ci] = _encode_block(bw, zz, pred[ci], dc_tab, ac_tab)
    out = _jpeg_headers(0xC0, h, w, samp, qsel, qts, dc_tab, ac_tab)
    ncomp = len(comp_coefs)
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00])  # DC table 0, AC table 0
    sos += bytes([0, 63, 0])
    out.append(_seg(0xDA, sos))
    out.append(bw.flush())
    out.append(b"\xff\xd9")  # EOI
    return b"".join(out)


def encode_progressive_jpeg(
    img: np.ndarray, quality: int = 90, subsample: bool = False
) -> bytes:
    """(h, w) grayscale or (h, w, 3) RGB uint8 → progressive JPEG
    (SOF2, T.81 Annex G) carrying the SAME quantized coefficients as
    ``encode_jpeg`` at the same quality — so progressive and baseline
    encodings of one image must decode pixel-identically, which is the
    round-trip gate. Scan script: interleaved DC first pass (Al=1) +
    refinement; per-component AC spectral bands with a two-level
    successive-approximation chain on component 0 (Al=2 → 1 → 0,
    bands 1–5 / 6–63) and a single level (Al=1 → 0) on chroma."""
    h, w, comp_coefs, grids, samp, qsel, qts = _prepare_components(
        img, quality, subsample
    )
    dc_tab, ac_tab = _flat_dc_table(), _flat_ac_table()
    ncomp = len(comp_coefs)
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcuy, mcux = grids[0][0] // vmax, grids[0][1] // hmax
    zzs = [c.reshape(-1, 64)[:, ZIGZAG] for c in comp_coefs]

    def dc_walk(bw, Al, refine):
        pred = [0] * ncomp
        for my in range(mcuy):
            for mx in range(mcux):
                for ci in range(ncomp):
                    hi, vi = samp[ci]
                    _by, bx = grids[ci]
                    for bv in range(vi):
                        for bh in range(hi):
                            b = (my * vi + bv) * bx + (mx * hi + bh)
                            v = int(zzs[ci][b, 0]) >> Al
                            if refine:
                                bw.write(v & 1, 1)
                                continue
                            diff = v - pred[ci]
                            pred[ci] = v
                            size = _category(diff)
                            code, ln = dc_tab.enc[size]
                            bw.write(code, ln)
                            if size:
                                bw.write(_amplitude(diff, size), size)

    def comp_band_grid(ci):
        # non-interleaved scans cover the component's ACTUAL block
        # grid (frame-derived ceil dims), not the MCU-padded grid
        nby = -(-(h * samp[ci][1]) // (8 * vmax))
        nbx = -(-(w * samp[ci][0]) // (8 * hmax))
        return nby, nbx, grids[ci][1]

    def ac_first(bw, ci, Ss, Se, Al):
        nby, nbx, bx = comp_band_grid(ci)
        zz = zzs[ci]
        eobrun = 0

        def flush_eob():
            nonlocal eobrun
            if eobrun:
                e = eobrun.bit_length() - 1
                code, ln = ac_tab.enc[e << 4]
                bw.write(code, ln)
                if e:
                    bw.write(eobrun - (1 << e), e)
                eobrun = 0

        for rr in range(nby):
            for cc in range(nbx):
                b = rr * bx + cc
                run = 0
                for k in range(Ss, Se + 1):
                    t = int(zz[b, k])
                    t2 = (t if t >= 0 else -t) >> Al
                    if t2 == 0:
                        run += 1
                        continue
                    flush_eob()
                    while run > 15:
                        code, ln = ac_tab.enc[0xF0]
                        bw.write(code, ln)
                        run -= 16
                    s = t2.bit_length()
                    code, ln = ac_tab.enc[(run << 4) | s]
                    bw.write(code, ln)
                    bw.write(_amplitude(t2 if t >= 0 else -t2, s), s)
                    run = 0
                if run > 0:
                    eobrun += 1
                    if eobrun == 0x7FFF:
                        flush_eob()
        flush_eob()

    def ac_refine(bw, ci, Ss, Se, Al):
        nby, nbx, bx = comp_band_grid(ci)
        zz = zzs[ci]
        eobrun = 0
        be_bits = []  # correction bits riding the pending EOB run

        def flush_eob():
            nonlocal eobrun
            if eobrun:
                e = eobrun.bit_length() - 1
                code, ln = ac_tab.enc[e << 4]
                bw.write(code, ln)
                if e:
                    bw.write(eobrun - (1 << e), e)
                eobrun = 0
            for bit in be_bits:
                bw.write(bit, 1)
            be_bits.clear()

        for rr in range(nby):
            for cc in range(nbx):
                b = rr * bx + cc
                absv = []
                eobk = Ss - 1  # last newly-nonzero position in band
                for k in range(Ss, Se + 1):
                    t = int(zz[b, k])
                    t2 = (t if t >= 0 else -t) >> Al
                    absv.append(t2)
                    if t2 == 1:
                        eobk = k
                run = 0
                br_bits = []  # corrections since the last emitted symbol
                for k in range(Ss, Se + 1):
                    t2 = absv[k - Ss]
                    if t2 == 0:
                        run += 1
                        continue
                    while run > 15 and k <= eobk:
                        flush_eob()
                        code, ln = ac_tab.enc[0xF0]
                        bw.write(code, ln)
                        run -= 16
                        for bit in br_bits:
                            bw.write(bit, 1)
                        br_bits.clear()
                    if t2 > 1:  # history coefficient: correction only
                        br_bits.append(t2 & 1)
                        continue
                    flush_eob()
                    code, ln = ac_tab.enc[(run << 4) | 1]
                    bw.write(code, ln)
                    bw.write(1 if int(zz[b, k]) >= 0 else 0, 1)
                    for bit in br_bits:
                        bw.write(bit, 1)
                    br_bits.clear()
                    run = 0
                if run > 0 or br_bits:  # block ends inside an EOB run
                    eobrun += 1
                    be_bits.extend(br_bits)
                    if eobrun == 0x7FFF:
                        flush_eob()
        flush_eob()

    def sos_body(comp_ids, Ss, Se, Ah, Al):
        b = bytes([len(comp_ids)])
        for cid in comp_ids:
            b += bytes([cid + 1, 0x00])  # DC table 0, AC table 0
        return b + bytes([Ss, Se, (Ah << 4) | Al])

    allc = list(range(ncomp))
    script = []

    def scan(body, emit):
        bw = _BitWriter()
        emit(bw)
        script.append((body, bw.flush()))

    scan(sos_body(allc, 0, 0, 0, 1), lambda bw: dc_walk(bw, 1, False))
    for lo, hi in ((1, 5), (6, 63)):
        scan(sos_body([0], lo, hi, 0, 2),
             lambda bw, lo=lo, hi=hi: ac_first(bw, 0, lo, hi, 2))
    for ci in range(1, ncomp):
        scan(sos_body([ci], 1, 63, 0, 1),
             lambda bw, ci=ci: ac_first(bw, ci, 1, 63, 1))
    scan(sos_body(allc, 0, 0, 1, 0), lambda bw: dc_walk(bw, 0, True))
    for ah in (2, 1):
        for lo, hi in ((1, 5), (6, 63)):
            scan(sos_body([0], lo, hi, ah, ah - 1),
                 lambda bw, lo=lo, hi=hi, ah=ah:
                 ac_refine(bw, 0, lo, hi, ah - 1))
    for ci in range(1, ncomp):
        scan(sos_body([ci], 1, 63, 1, 0),
             lambda bw, ci=ci: ac_refine(bw, ci, 1, 63, 0))

    out = _jpeg_headers(0xC2, h, w, samp, qsel, qts, dc_tab, ac_tab)
    for body, entropy in script:
        out.append(_seg(0xDA, body))
        out.append(entropy)
    out.append(b"\xff\xd9")  # EOI
    return b"".join(out)


# ------------------------------------------------------------ decoder

def decode_jpeg(payload: bytes) -> np.ndarray:
    """JPEG bytes → (h, w, 3) RGB uint8 (grayscale replicated to 3
    channels). Supports 8-bit Huffman baseline sequential (SOF0) and
    progressive (SOF2) modes, sampling factors 1–2, Huffman/quant
    tables from the stream itself."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], _HuffTable] = {}
    frame = None
    pstate = None  # progressive coefficient state, grown scan by scan
    restart_interval = 0
    while pos < len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"expected marker at offset {pos}")
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # parameterless
        ln = int.from_bytes(payload[pos : pos + 2], "big")
        body = payload[pos + 2 : pos + ln]
        pos += ln
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 0x0F
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables unsupported")
                zz = np.frombuffer(body[p + 1 : p + 65], dtype=np.uint8).astype(np.int32)
                qt = np.zeros(64, dtype=np.int32)
                qt[ZIGZAG] = zz
                qtables[tq] = qt.reshape(8, 8)
                p += 65
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(body):
                tc, th = body[p] >> 4, body[p] & 0x0F
                bits = list(body[p + 1 : p + 17])
                n = sum(bits)
                values = list(body[p + 17 : p + 17 + n])
                htables[(tc, th)] = _HuffTable(bits, values)
                p += 17 + n
        elif marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
            prec = body[0]
            if prec != 8:
                raise NotImplementedError("only 8-bit precision supported")
            fh = int.from_bytes(body[1:3], "big")
            fw = int.from_bytes(body[3:5], "big")
            ncomp = body[5]
            comps = []
            for ci in range(ncomp):
                cid, hv, tq = body[6 + 3 * ci : 9 + 3 * ci]
                hi, vi = hv >> 4, hv & 0x0F
                if hi not in (1, 2) or vi not in (1, 2):
                    raise NotImplementedError(
                        f"sampling factors {hi}x{vi} unsupported (1-2 only)"
                    )
                comps.append({"id": cid, "tq": tq, "h": hi, "v": vi})
            frame = {"h": fh, "w": fw, "comps": comps,
                     "prog": marker == 0xC2}
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "only baseline sequential (SOF0) and progressive (SOF2) "
                "JPEG supported"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = int.from_bytes(body[0:2], "big")
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            # entropy segment runs to the next non-RST marker
            end = pos
            while end < len(payload) - 1:
                if payload[end] == 0xFF and payload[end + 1] not in (0x00,) and not (
                    0xD0 <= payload[end + 1] <= 0xD7
                ):
                    break
                end += 1
            br = _BitReader(payload[pos:end])
            pos = end
            if frame.get("prog"):
                # progressive: scans accumulate coefficient bits into
                # pstate; reconstruction happens at EOI
                if pstate is None:
                    pstate = _init_pstate(frame)
                byid = {c["id"]: i for i, c in enumerate(frame["comps"])}
                Ss = body[1 + 2 * ns]
                Se = body[2 + 2 * ns]
                Ah, Al = body[3 + 2 * ns] >> 4, body[3 + 2 * ns] & 0x0F
                if Ss == 0:
                    if Se != 0:
                        raise ValueError("progressive DC scan needs Se=0")
                    scomps = []
                    for si in range(ns):
                        cid, tabs = body[1 + 2 * si], body[2 + 2 * si]
                        dc_t = htables.get((0, tabs >> 4))
                        if Ah == 0 and dc_t is None:
                            raise ValueError("missing DC Huffman table")
                        ci = byid[cid]
                        scomps.append((ci, frame["comps"][ci], dc_t))
                    _prog_dc_scan(br, pstate, scomps, Ah, Al,
                                  restart_interval)
                else:
                    if ns != 1:
                        raise ValueError(
                            "progressive AC scans are non-interleaved"
                        )
                    ac_t = htables.get((1, body[2] & 0x0F))
                    if ac_t is None:
                        raise ValueError("missing AC Huffman table")
                    _prog_ac_scan(br, pstate, byid[body[1]], ac_t,
                                  Ss, Se, Ah, Al, restart_interval)
                continue
            if ns != len(frame["comps"]):
                # spec-legal but rare for baseline: one scan per
                # component (Ns=1 each). We support only the single
                # interleaved scan covering all frame components.
                raise NotImplementedError(
                    "only a single interleaved scan covering all frame "
                    "components is supported (per-component scans are a "
                    "documented boundary)"
                )
            sel = {}
            for si in range(ns):
                cs, tabs = body[1 + 2 * si], body[2 + 2 * si]
                sel[cs] = (tabs >> 4, tabs & 0x0F)
            h, w = frame["h"], frame["w"]
            comps = frame["comps"]
            if ns == 1:
                # A single-component scan is non-interleaved per the
                # spec (ISO 10918-1 A.2.2): one 8x8 block per MCU in
                # raster order over the component's own grid, whatever
                # sampling factors SOF0 declared. Forcing 1x1 makes the
                # MCU walk below exactly that raster.
                comps = [dict(comps[0], h=1, v=1)]
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            # MCU grid over the frame; per-component block grid sized
            # to the MCU grid (edge MCUs carry dummy blocks per spec)
            mcux = -(-w // (8 * hmax))
            mcuy = -(-h // (8 * vmax))
            cgrids = [(mcuy * c["v"], mcux * c["h"]) for c in comps]
            coefs = [
                np.zeros((gy * gx, 8, 8), dtype=np.int32)
                for gy, gx in cgrids
            ]
            pred = [0] * len(comps)
            mcu_count = 0
            for my in range(mcuy):
                for mx in range(mcux):
                    if restart_interval and mcu_count and (
                        mcu_count % restart_interval == 0
                    ):
                        br.restart()
                        pred = [0] * len(comps)
                    mcu_count += 1
                    for ci, comp in enumerate(comps):
                        dc_t = htables.get((0, sel[comp["id"]][0]))
                        ac_t = htables.get((1, sel[comp["id"]][1]))
                        if dc_t is None or ac_t is None:
                            raise ValueError("missing Huffman table for scan")
                        gy, gx = cgrids[ci]
                        for bv in range(comp["v"]):
                            for bh in range(comp["h"]):
                                zz = np.zeros(64, dtype=np.int32)
                                size = dc_t.decode(br)
                                pred[ci] += _extend(br.read(size), size)
                                zz[0] = pred[ci]
                                k = 1
                                while k < 64:
                                    rs = ac_t.decode(br)
                                    run, size = rs >> 4, rs & 0x0F
                                    if size == 0:
                                        if run == 15:
                                            k += 16  # ZRL
                                            continue
                                        break  # EOB
                                    k += run
                                    if k > 63:
                                        raise ValueError("AC run overflows block")
                                    zz[k] = _extend(br.read(size), size)
                                    k += 1
                                blk = np.zeros(64, dtype=np.int32)
                                blk[ZIGZAG] = zz
                                row = my * comp["v"] + bv
                                col = mx * comp["h"] + bh
                                coefs[ci][row * gx + col] = blk.reshape(8, 8)
            return _reconstruct(
                h, w, comps, cgrids, coefs, qtables, hmax, vmax
            )
        # other segments (APPn, COM) are skipped
    if frame is not None and frame.get("prog") and pstate is not None:
        comps = frame["comps"]
        coefs = []
        for ci in range(len(comps)):
            nat = np.zeros_like(pstate["zz"][ci])
            nat[:, ZIGZAG] = pstate["zz"][ci]
            coefs.append(nat.reshape(-1, 8, 8))
        return _reconstruct(
            frame["h"], frame["w"], comps, pstate["grids"], coefs,
            qtables, pstate["hmax"], pstate["vmax"],
        )
    raise ValueError("no scan data found in JPEG")


def _reconstruct(h, w, comps, cgrids, coefs, qtables, hmax, vmax):
    """Dequantize + IDCT each component's block grid, upsample
    subsampled chroma to full resolution, convert to RGB uint8."""
    planes = []
    for ci, comp in enumerate(comps):
        qt = qtables.get(comp["tq"])
        if qt is None:
            raise ValueError("missing quant table")
        gy, gx = cgrids[ci]
        px = _dequant_idct(coefs[ci], qt)
        full = _from_blocks(px, gy, gx, gy * 8, gx * 8)
        ry, rx = vmax // comp["v"], hmax // comp["h"]
        if ry > 1 or rx > 1:
            full = np.repeat(np.repeat(full, ry, axis=0), rx, axis=1)
        planes.append(full[:h, :w])
    if len(planes) == 1:
        g = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
        return np.repeat(g[:, :, None], 3, axis=2)
    return _ycbcr_to_rgb(np.stack(planes, axis=-1))
