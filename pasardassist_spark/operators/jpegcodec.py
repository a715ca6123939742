"""Baseline-JPEG codec (ITU-T T.81 sequential DCT, Huffman entropy
coding) — pure stdlib + numpy, the format that dominates any real web
crawl and the last stdlib-feasible gap in the media surface (VERDICT r10
"what's missing" #2; GIF-LZW was the r9 precedent).

Scope — the BASELINE process exactly:
- decode: SOF0 baseline AND SOF2 progressive frames (spectral
  selection + successive approximation, DC/AC first and refinement
  scans, EOB runs), 8-bit samples, Huffman coding, 1 or 3 components,
  sampling factors 1-2 per axis (4:4:4, 4:2:2, 4:2:0, ...), restart
  markers (DRI/RSTn), byte stuffing, JFIF/APPn/COM skipping;
- encode: the fixture-synthesis half — sequential (encode_jpeg) and
  progressive (encode_jpeg_progressive, the libjpeg-shaped scan script:
  DC Al=1 -> DC refine, two AC spectral bands at Al=1 per component ->
  AC refine), 4:4:4 or 4:2:0, optional restart interval — so tests and
  the driver fixtures exercise the decoder on REAL files this module
  itself produced.
- loud seams: arithmetic coding (SOF9-SOF11), extended/lossless/
  hierarchical frames and 12-bit raise NotImplementedError by marker
  name; malformed streams raise ValueError (the operators/imagecodec.py
  error-closure contract).

Exactness note (what the SQL oracle certifies): JPEG is lossy, but the
pipeline is deterministic — and for rasters CONSTANT within each 8x8
block the FDCT concentrates everything in DC with AC exactly zero, so a
block value v with (v-128) even and Q[0,0]=16 survives
quantize->dequantize->IDCT bit-exactly (qc = 8(v-128)/16 = (v-128)/2 an
exact integer; reconstruction qc*16/8 + 128 = v, all in exact float).
The driver fixture (operators/multimodal.attach_jpeg_payload) is built
from that family, so a closed-form pixel-sum oracle over doc_id
arithmetic certifies Huffman decode, DC prediction, restart handling,
dequantization, IDCT, chroma upsampling, and YCbCr conversion end to
end. AC coefficient coding is certified by pytest differentials against
an independent reference pipeline on random rasters
(tests/test_jpegcodec.py).

Reference parity: the reference stores media as URLs and thumbnails
(src/modules/utils/utils.service.ts); decoding belongs to this repo's
LLM-data extension surface, same seam as the PNG/BMP/GIF codecs.
"""

from __future__ import annotations

import struct

import numpy as np

from pasardassist_spark.operators.imagecodec import Raster, _check_dims

# ------------------------------------------------------------ constants --

# Annex K.1 / K.2 example quantization tables (the de-facto default).
QUANT_LUMA = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99],
], dtype=np.int32)

QUANT_CHROMA = np.array([
    [17, 18, 24, 47, 99, 99, 99, 99],
    [18, 21, 26, 66, 99, 99, 99, 99],
    [24, 26, 56, 99, 99, 99, 99, 99],
    [47, 66, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
], dtype=np.int32)

# Annex K.3-K.6 typical Huffman tables: (bits[1..16], values).
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))

AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]

# Progressive AC scans need EOBn symbols ((r<<4)|0, r=1..14) that the
# Annex K sequential AC tables cannot host (their Kraft slack fits ONE
# extra 16-bit code). Progressive files therefore carry this generic
# flat table in their DHT — every 8-bit symbol, 128 codes at length 8
# and 128 at length 9 (Kraft 0.75, canonical, no all-ones codeword).
# Compression is the optimizer's job (libjpeg computes per-scan optimal
# tables); correctness only needs a VALID table, and DHT travels with
# the file.
AC_PROG_BITS = [0, 0, 0, 0, 0, 0, 0, 128, 128, 0, 0, 0, 0, 0, 0, 0]
AC_PROG_VALS = list(range(256))

# frame markers this baseline decoder refuses BY NAME (loud seam)
_UNSUPPORTED_SOF = {
    0xC1: "SOF1 extended sequential",
    0xC3: "SOF3 lossless",
    0xC5: "SOF5 differential sequential",
    0xC6: "SOF6 differential progressive",
    0xC7: "SOF7 differential lossless",
    0xC9: "SOF9 arithmetic sequential",
    0xCA: "SOF10 arithmetic progressive",
    0xCB: "SOF11 arithmetic lossless",
    0xCD: "SOF13 differential arithmetic sequential",
    0xCE: "SOF14 differential arithmetic progressive",
    0xCF: "SOF15 differential arithmetic lossless",
}


def _zigzag() -> np.ndarray:
    """Zigzag scan order, generated (no typo surface): entry k is the
    flat row-major index of the k-th coefficient on the diagonal walk."""
    order = []
    for s in range(15):
        diag = [(s - c, c) for c in range(max(0, s - 7), min(s, 7) + 1)]
        if s % 2 == 1:
            diag.reverse()  # odd diagonals walk top-right -> bottom-left
        order.extend(r * 8 + c for r, c in diag)
    return np.array(order, dtype=np.int64)


ZIGZAG = _zigzag()  # zigzag position -> row-major index

# orthonormal 8-point DCT-II matrix: F = D @ f @ D.T, f = D.T @ F @ D
_D = np.cos((2 * np.arange(8)[None, :] + 1) * np.arange(8)[:, None] * np.pi / 16) / 2.0
_D[0, :] = 1.0 / (2.0 * np.sqrt(2.0))


# ----------------------------------------------------------- bit streams --

class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._nbits = 0

    def write(self, value: int, nbits: int) -> None:
        self._acc = (self._acc << nbits) | (value & ((1 << nbits) - 1))
        self._nbits += nbits
        while self._nbits >= 8:
            self._nbits -= 8
            b = (self._acc >> self._nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
        self._acc &= (1 << self._nbits) - 1

    def pad_align(self) -> None:
        if self._nbits:
            self.write((1 << (8 - self._nbits)) - 1, 8 - self._nbits)

    def marker(self, m: int) -> None:
        self.pad_align()
        self.out += bytes((0xFF, m))


class _BitReader:
    """Entropy-segment reader: unstuffs 0xFF00, stops AT markers (the
    caller handles RSTn), never reads past the payload."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self._acc = 0
        self._nbits = 0

    def _fill(self) -> None:
        d = self.data
        if self.pos >= len(d):
            raise ValueError("jpeg: entropy data truncated")
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1] if self.pos + 1 < len(d) else None
            if nxt == 0x00:
                self.pos += 2  # stuffed literal 0xFF
            else:
                raise ValueError("jpeg: hit marker inside entropy segment")
        else:
            self.pos += 1
        self._acc = (self._acc << 8) | b
        self._nbits += 8

    def read_bit(self) -> int:
        if self._nbits == 0:
            self._fill()
        self._nbits -= 1
        return (self._acc >> self._nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_to_marker(self) -> int:
        """Discard pad bits, consume one marker, return its second byte."""
        self._acc = 0
        self._nbits = 0
        d = self.data
        p = self.pos
        while p + 1 < len(d) and d[p] == 0xFF and d[p + 1] == 0xFF:
            p += 1  # fill bytes before a marker are legal
        if p + 1 >= len(d) or d[p] != 0xFF:
            raise ValueError("jpeg: expected marker in entropy stream")
        self.pos = p + 2
        return d[p + 1]


def _extend(v: int, s: int) -> int:
    """DC/AC amplitude decode (T.81 F.12): low s bits -> signed value."""
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


# -------------------------------------------------------- huffman tables --

def _build_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """value -> (code, length), canonical assignment (T.81 C.2)."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            codes[vals[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return codes


class _HuffDecoder:
    """Canonical decode via per-length (first-code, first-index) ranges —
    the spec's MINCODE/MAXCODE/VALPTR walk."""

    def __init__(self, bits: list[int], vals: list[int]) -> None:
        self.vals = vals
        self.min_code = [0] * 17
        self.max_code = [-1] * 17
        self.val_ptr = [0] * 17
        code = 0
        k = 0
        for ln in range(1, 17):
            if bits[ln - 1]:
                self.val_ptr[ln] = k
                self.min_code[ln] = code
                code += bits[ln - 1]
                k += bits[ln - 1]
                self.max_code[ln] = code - 1
            code <<= 1

    def decode(self, br: _BitReader) -> int:
        code = br.read_bit()
        ln = 1
        while code > self.max_code[ln]:
            if ln >= 16:
                raise ValueError("jpeg: invalid Huffman code")
            code = (code << 1) | br.read_bit()
            ln += 1
        return self.vals[self.val_ptr[ln] + code - self.min_code[ln]]


# ----------------------------------------------------------------- encode --

def _to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b
    return np.stack([y, cb, cr], axis=-1)


def _pad_edge(plane: np.ndarray, bh: int, bw: int) -> np.ndarray:
    h, w = plane.shape
    return np.pad(
        plane, ((0, (-h) % bh), (0, (-w) % bw)), mode="edge"
    )


def _fdct_quant(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
    """(H, W) float plane (already padded to 8-multiples) -> quantized
    coefficient blocks (H//8, W//8, 8, 8) int32, zigzag NOT applied."""
    h, w = plane.shape
    blocks = (plane - 128.0).reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3)
    coef = _D @ blocks @ _D.T
    return np.rint(coef / q).astype(np.int32)


def _encode_block(
    zz: np.ndarray, pred: int, dc_codes, ac_codes, bw: _BitWriter
) -> int:
    diff = int(zz[0]) - pred
    s = int(abs(diff)).bit_length()
    code, ln = dc_codes[s]
    bw.write(code, ln)
    if s:
        bw.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]  # ZRL
            bw.write(code, ln)
            run -= 16
        s = int(abs(v)).bit_length()
        code, ln = ac_codes[(run << 4) | s]
        bw.write(code, ln)
        bw.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
        if k == last_nz:
            break
    if last_nz < 63:
        code, ln = ac_codes[0x00]  # EOB
        bw.write(code, ln)
    return int(zz[0])


def _prepare_components(raster, subsampling, quant_luma, quant_chroma):
    """Shared encoder front half: color convert, subsample, pad, FDCT,
    quantize. Returns (w, h, samp, qtabs, mcux, mcuy, qzz) where qzz[i]
    is (bh, bw, 64) int32 coefficients in ZIGZAG order on component i's
    MCU-padded block grid."""
    w, h, ch = raster.width, raster.height, raster.channels
    _check_dims(w, h)
    if subsampling not in ("4:4:4", "4:2:0"):
        raise NotImplementedError(f"jpeg encode subsampling {subsampling}")
    arr = np.frombuffer(raster.pixels, dtype=np.uint8).astype(np.float64)
    if ch == 3:
        ycc = _to_ycbcr(arr.reshape(h, w, 3))
        planes = [np.rint(ycc[..., i]).clip(0, 255) for i in range(3)]
    elif ch == 1:
        planes = [arr.reshape(h, w)]
    else:
        raise ValueError(f"jpeg encode supports 1 or 3 channels, got {ch}")

    n_comp = len(planes)
    sub = subsampling == "4:2:0" and n_comp == 3
    samp = [(2, 2), (1, 1), (1, 1)] if sub else [(1, 1)] * n_comp
    if sub:
        for i in (1, 2):
            p = _pad_edge(planes[i], 2, 2)
            planes[i] = (
                p.reshape(p.shape[0] // 2, 2, p.shape[1] // 2, 2).mean(axis=(1, 3))
            )
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    qtabs = [quant_luma] + [quant_chroma] * (n_comp - 1)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    qzz = []
    for i, plane in enumerate(planes):
        hi, vi = samp[i]
        # pad by edge replication up to this component's full MCU grid
        # (target is always >= the plane, so one _pad_edge lands exactly)
        blocks = _fdct_quant(
            _pad_edge(plane, 8 * mcuy * vi, 8 * mcux * hi), qtabs[i]
        )
        qzz.append(blocks.reshape(*blocks.shape[:2], 64)[..., ZIGZAG])
    return w, h, samp, qtabs, mcux, mcuy, qzz


def _write_headers(
    out, sof_marker, w, h, samp, qtabs, restart_interval, huffs=None
) -> None:
    n_comp = len(samp)
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tq, q in enumerate(qtabs[:2] if n_comp == 3 else qtabs[:1]):
        zzq = q.reshape(-1)[ZIGZAG].astype(np.uint8).tobytes()
        out += b"\xff\xdb" + struct.pack(">HB", 67, tq) + zzq
    out += bytes((0xFF, sof_marker)) + struct.pack(">HBHHB", 8 + 3 * n_comp, 8, h, w, n_comp)
    for i in range(n_comp):
        out += bytes((i + 1, (samp[i][0] << 4) | samp[i][1], 0 if i == 0 else 1))
    if huffs is None:
        huffs = [(0x00, DC_LUMA_BITS, DC_LUMA_VALS), (0x10, AC_LUMA_BITS, AC_LUMA_VALS)]
        if n_comp == 3:
            huffs += [(0x01, DC_CHROMA_BITS, DC_CHROMA_VALS), (0x11, AC_CHROMA_BITS, AC_CHROMA_VALS)]
    for tc_th, bits, vals in huffs:
        out += b"\xff\xc4" + struct.pack(">HB", 19 + len(vals), tc_th)
        out += bytes(bits) + bytes(vals)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)


def _std_code_maps(n_comp):
    dc_l = _build_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_l = _build_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    dc_c = _build_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ac_c = _build_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)
    return (
        [dc_l] + [dc_c] * (n_comp - 1),
        [ac_l] + [ac_c] * (n_comp - 1),
    )


def encode_jpeg(
    raster: Raster,
    subsampling: str = "4:4:4",
    restart_interval: int = 0,
    quant_luma: np.ndarray = QUANT_LUMA,
    quant_chroma: np.ndarray = QUANT_CHROMA,
) -> bytes:
    """Encode a 1- or 3-channel raster as a baseline JFIF file.

    ``subsampling``: "4:4:4" (all components full-res) or "4:2:0" (chroma
    2x2-averaged, the web default). Grayscale rasters emit a single
    component regardless. ``restart_interval`` > 0 writes DRI and RSTn
    every that-many MCUs."""
    w, h, samp, qtabs, mcux, mcuy, qzz = _prepare_components(
        raster, subsampling, quant_luma, quant_chroma
    )
    n_comp = len(samp)
    dc_by_comp, ac_by_comp = _std_code_maps(n_comp)

    out = bytearray(b"\xff\xd8")  # SOI
    _write_headers(out, 0xC0, w, h, samp, qtabs, restart_interval)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * n_comp, n_comp)
    for i in range(n_comp):
        out += bytes((i + 1, 0x00 if i == 0 else 0x11))
    out += b"\x00\x3f\x00"  # Ss/Se/AhAl for sequential

    bw = _BitWriter()
    preds = [0] * n_comp
    n_mcu = mcux * mcuy
    for m in range(n_mcu):
        if restart_interval and m and m % restart_interval == 0:
            bw.marker(0xD0 + ((m // restart_interval - 1) % 8))
            preds = [0] * n_comp
        my, mx = divmod(m, mcux)
        for i in range(n_comp):
            hi, vi = samp[i]
            for by in range(vi):
                for bx in range(hi):
                    zz = qzz[i][my * vi + by, mx * hi + bx]
                    preds[i] = _encode_block(
                        zz, preds[i], dc_by_comp[i], ac_by_comp[i], bw
                    )
    bw.pad_align()
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------- progressive enc

class _AcFirstState:
    """EOB-run accumulator for AC first-pass scans (T.81 G.1.2.2): runs of
    entirely-zero bands across blocks collapse into one EOBn symbol."""

    def __init__(self, ac_codes, bw: _BitWriter) -> None:
        self.ac = ac_codes
        self.bw = bw
        self.eobrun = 0

    def flush(self) -> None:
        if self.eobrun:
            nbits = self.eobrun.bit_length() - 1
            code, ln = self.ac[nbits << 4]
            self.bw.write(code, ln)
            if nbits:
                self.bw.write(self.eobrun - (1 << nbits), nbits)
            self.eobrun = 0

    def block(self, zz: np.ndarray, ss: int, se: int, al: int) -> None:
        band = [
            (k, int(zz[k]) >> al if zz[k] >= 0 else -((-int(zz[k])) >> al))
            for k in range(ss, se + 1)
        ]
        nz = [(k, v) for k, v in band if v != 0]
        if not nz:
            self.eobrun += 1
            if self.eobrun == 0x7FFF:
                self.flush()
            return
        self.flush()
        run = 0
        last_k = nz[-1][0]
        for k, v in band:
            if k > last_k:
                break
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, ln = self.ac[0xF0]
                self.bw.write(code, ln)
                run -= 16
            s = abs(v).bit_length()
            code, ln = self.ac[(run << 4) | s]
            self.bw.write(code, ln)
            self.bw.write(v if v >= 0 else v + (1 << s) - 1, s)
            run = 0
        if last_k < se:
            self.eobrun += 1
            if self.eobrun == 0x7FFF:
                self.flush()


class _AcRefineState:
    """AC successive-approximation refinement emitter (T.81 G.1.2.3, the
    libjpeg encode_mcu_AC_refine structure): newly-significant coefficients
    carry (run, 1) symbols + sign; already-significant ones append their
    bit-Al correction to a buffer flushed after each emitted symbol; blocks
    ending in EOB fold into an EOB run whose buffered corrections ride
    along with the EOBn symbol."""

    def __init__(self, ac_codes, bw: _BitWriter) -> None:
        self.ac = ac_codes
        self.bw = bw
        self.eobrun = 0
        self.pending: list[int] = []  # correction bits buffered in EOB run

    def _emit_buffered(self, bits: list[int]) -> None:
        for b in bits:
            self.bw.write(b, 1)

    def flush(self) -> None:
        if self.eobrun:
            nbits = self.eobrun.bit_length() - 1
            code, ln = self.ac[nbits << 4]
            self.bw.write(code, ln)
            if nbits:
                self.bw.write(self.eobrun - (1 << nbits), nbits)
            self.eobrun = 0
        self._emit_buffered(self.pending)
        self.pending = []

    def block(self, zz: np.ndarray, ss: int, se: int, al: int) -> None:
        absv = [abs(int(zz[k])) >> al for k in range(ss, se + 1)]
        # last position that becomes significant in THIS pass
        eob = 0
        for idx, t in enumerate(absv):
            if t == 1:
                eob = idx + 1
        run = 0
        br: list[int] = []  # corrections since last emitted symbol
        for idx, t in enumerate(absv):
            if t == 0:
                run += 1
                continue
            if idx < eob:
                while run > 15:
                    self.flush()
                    code, ln = self.ac[0xF0]
                    self.bw.write(code, ln)
                    run -= 16
                    self._emit_buffered(br)
                    br = []
            if t > 1:
                br.append(t & 1)
                continue
            # t == 1: newly significant
            self.flush()
            code, ln = self.ac[(run << 4) | 1]
            self.bw.write(code, ln)
            self.bw.write(1 if zz[ss + idx] > 0 else 0, 1)
            self._emit_buffered(br)
            br = []
            run = 0
        if run > 0 or br:
            self.eobrun += 1
            self.pending.extend(br)
            if self.eobrun == 0x7FFF or len(self.pending) > 900:
                self.flush()


def encode_jpeg_progressive(
    raster: Raster,
    subsampling: str = "4:4:4",
    restart_interval: int = 0,
    quant_luma: np.ndarray = QUANT_LUMA,
    quant_chroma: np.ndarray = QUANT_CHROMA,
    ac_split: int = 6,
) -> bytes:
    """Encode as a PROGRESSIVE JFIF file (SOF2) with the standard scan
    script shape: interleaved DC first pass at Al=1, DC refinement to
    Al=0, then per component two spectral AC bands (1..ac_split-1,
    ac_split..63) at Al=1, then per component one AC refinement pass to
    Al=0 — exercising spectral selection AND successive approximation in
    both DC and AC, the same progression libjpeg's default scan script
    uses. ``restart_interval`` applies per scan (MCUs for the DC scans,
    data units for the non-interleaved AC scans)."""
    w, h, samp, qtabs, mcux, mcuy, qzz = _prepare_components(
        raster, subsampling, quant_luma, quant_chroma
    )
    n_comp = len(samp)
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    dc_by_comp = [_build_codes(DC_LUMA_BITS, DC_LUMA_VALS)] + [
        _build_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ] * (n_comp - 1)
    ac_prog = _build_codes(AC_PROG_BITS, AC_PROG_VALS)
    ac_by_comp = [ac_prog] * n_comp  # one generic AC table, id (1, 0)

    out = bytearray(b"\xff\xd8")
    huffs = [(0x00, DC_LUMA_BITS, DC_LUMA_VALS), (0x10, AC_PROG_BITS, AC_PROG_VALS)]
    if n_comp == 3:
        huffs.insert(1, (0x01, DC_CHROMA_BITS, DC_CHROMA_VALS))
    _write_headers(out, 0xC2, w, h, samp, qtabs, restart_interval, huffs=huffs)

    def sos(comp_ids, ss, se, ah, al, tds):
        body = bytearray(bytes((len(list(comp_ids)),)))
        for cid, td_ta in zip(comp_ids, tds):
            body += bytes((cid, td_ta))
        body += bytes((ss, se, (ah << 4) | al))
        out.extend(b"\xff\xda" + struct.pack(">H", 2 + len(body)) + bytes(body))

    def rst(bw, counter):
        bw.marker(0xD0 + (counter % 8))

    # -- scan 1: DC first, interleaved, Al=1
    sos(list(range(1, n_comp + 1)), 0, 0, 0, 1,
        [0x00 if i == 0 else 0x10 for i in range(n_comp)])
    bw = _BitWriter()
    preds = [0] * n_comp
    rst_n = 0
    for m in range(mcux * mcuy):
        if restart_interval and m and m % restart_interval == 0:
            rst(bw, rst_n)
            rst_n += 1
            preds = [0] * n_comp
        my, mx = divmod(m, mcux)
        for i in range(n_comp):
            hi, vi = samp[i]
            for by in range(vi):
                for bx in range(hi):
                    dc = int(qzz[i][my * vi + by, mx * hi + bx, 0]) >> 1
                    diff = dc - preds[i]
                    preds[i] = dc
                    s = abs(diff).bit_length()
                    code, ln = dc_by_comp[i][s]
                    bw.write(code, ln)
                    if s:
                        bw.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    bw.pad_align()
    out += bw.out

    # -- scan 2: DC refinement to Al=0 (one raw bit per data unit)
    sos(list(range(1, n_comp + 1)), 0, 0, 1, 0, [0x00] * n_comp)
    bw = _BitWriter()
    rst_n = 0
    for m in range(mcux * mcuy):
        if restart_interval and m and m % restart_interval == 0:
            rst(bw, rst_n)
            rst_n += 1
        my, mx = divmod(m, mcux)
        for i in range(n_comp):
            hi, vi = samp[i]
            for by in range(vi):
                for bx in range(hi):
                    bw.write(int(qzz[i][my * vi + by, mx * hi + bx, 0]) & 1, 1)
    bw.pad_align()
    out += bw.out

    def comp_grid(i):
        hi, vi = samp[i]
        cw = -(-w * hi // hmax)
        chh = -(-h * vi // vmax)
        return -(-cw // 8), -(-chh // 8)

    # -- AC first passes: two spectral bands per component, Al=1
    for i in range(n_comp):
        bwi, bhi = comp_grid(i)
        for ss, se in ((1, ac_split - 1), (ac_split, 63)):
            sos([i + 1], ss, se, 0, 1, [0x00])  # generic AC table id 0
            bw = _BitWriter()
            st = _AcFirstState(ac_by_comp[i], bw)
            rst_n = 0
            for u in range(bhi * bwi):
                if restart_interval and u and u % restart_interval == 0:
                    st.flush()
                    rst(bw, rst_n)
                    rst_n += 1
                st.block(qzz[i][u // bwi, u % bwi], ss, se, 1)
            st.flush()
            bw.pad_align()
            out += bw.out

    # -- AC refinement passes to Al=0, full band per component
    for i in range(n_comp):
        bwi, bhi = comp_grid(i)
        sos([i + 1], 1, 63, 1, 0, [0x00])  # generic AC table id 0
        bw = _BitWriter()
        st = _AcRefineState(ac_by_comp[i], bw)
        rst_n = 0
        for u in range(bhi * bwi):
            if restart_interval and u and u % restart_interval == 0:
                st.flush()
                rst(bw, rst_n)
                rst_n += 1
            st.block(qzz[i][u // bwi, u % bwi], 1, 63, 0)
        st.flush()
        bw.pad_align()
        out += bw.out

    out += b"\xff\xd9"
    return bytes(out)


# ----------------------------------------------------------------- decode --

def decode_jpeg(payload: bytes) -> Raster:
    """Decode a baseline (SOF0) or progressive (SOF2) JPEG to a Raster
    (gray or RGB).

    Both Huffman processes of T.81's DCT family are implemented: the
    sequential single scan, and progressive multi-scan with spectral
    selection AND successive approximation (DC first/refine, AC
    first-with-EOB-runs, AC bit refinement), coefficients accumulated
    across scans and reconstructed at EOI. Raises ValueError on
    malformed streams and NotImplementedError (with the marker name) on
    arithmetic/lossless/hierarchical/12-bit frames and sampling factors
    outside 1-2 — the honest seam where libjpeg-turbo plugs in for the
    exotic tail."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("jpeg: missing SOI")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _HuffDecoder] = {}
    restart_interval = 0
    frame = None  # (h, w, comps, progressive); comps = [(cid, hi, vi, tq)]
    coefs: list[np.ndarray] | None = None  # per comp (bh, bw, 64) zigzag space
    got_scan = False
    eobrun_box = [0]
    n = len(payload)
    while pos + 2 <= n:
        if payload[pos] != 0xFF:
            raise ValueError("jpeg: expected marker")
        marker = payload[pos + 1]
        if marker == 0xFF:  # fill byte before a marker
            pos += 1
            continue
        if marker == 0xD9:  # EOI
            break
        if 0xD0 <= marker <= 0xD7 or marker == 0x01:  # stray RSTn / TEM
            pos += 2
            continue
        if marker in _UNSUPPORTED_SOF:
            raise NotImplementedError(
                f"jpeg: {_UNSUPPORTED_SOF[marker]} unsupported "
                "(baseline + progressive Huffman only)"
            )
        if pos + 4 > n:
            raise ValueError("jpeg: truncated segment header")
        (seg_len,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
        seg = payload[pos + 4 : pos + 2 + seg_len]
        if len(seg) != seg_len - 2:
            raise ValueError("jpeg: truncated segment")
        if marker == 0xDB:  # DQT
            sp = 0
            while sp < len(seg):
                pq, tq = seg[sp] >> 4, seg[sp] & 0x0F
                if pq != 0:
                    raise NotImplementedError("jpeg: 16-bit quant tables")
                tbl = np.zeros(64, dtype=np.int32)
                tbl[ZIGZAG] = np.frombuffer(seg[sp + 1 : sp + 65], dtype=np.uint8)
                qtables[tq] = tbl.reshape(8, 8)
                sp += 65
        elif marker == 0xC4:  # DHT
            sp = 0
            while sp < len(seg):
                tc, th = seg[sp] >> 4, seg[sp] & 0x0F
                bits = list(seg[sp + 1 : sp + 17])
                nv = sum(bits)
                vals = list(seg[sp + 17 : sp + 17 + nv])
                huff[(tc, th)] = _HuffDecoder(bits, vals)
                sp += 17 + nv
        elif marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
            if frame is not None:
                raise ValueError("jpeg: multiple SOF markers")
            prec, fh, fw, nc = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            if prec != 8:
                raise NotImplementedError(f"jpeg: {prec}-bit samples")
            _check_dims(fw, fh)
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i : 9 + 3 * i]
                hi, vi = hv >> 4, hv & 0x0F
                if not (1 <= hi <= 2 and 1 <= vi <= 2):
                    raise NotImplementedError(
                        f"jpeg: sampling factors {hi}x{vi} unsupported"
                    )
                comps.append((cid, hi, vi, tq))
            frame = (fh, fw, comps, marker == 0xC2)
            hmax = max(c[1] for c in comps)
            vmax = max(c[2] for c in comps)
            mcux = -(-fw // (8 * hmax))
            mcuy = -(-fh // (8 * vmax))
            coefs = [
                np.zeros((mcuy * vi, mcux * hi, 64), dtype=np.int32)
                for (cid, hi, vi, tq) in comps
            ]
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS — decode one scan into the coef state
            if frame is None:
                raise ValueError("jpeg: SOS before SOF")
            pos = _decode_scan(
                payload, pos + 2 + seg_len, seg, frame, coefs, huff,
                restart_interval, eobrun_box,
            )
            got_scan = True
            continue
        # else: APPn/COM/etc — skip
        pos += 2 + seg_len
    if frame is None or not got_scan:
        raise ValueError("jpeg: ran out of segments before SOS")
    return _reconstruct(frame, coefs, qtables)


def _comp_grid(frame, i) -> tuple[int, int]:
    """True (non-MCU-padded) block grid of component i — the data-unit
    geometry of a NON-interleaved scan (T.81 A.2.2)."""
    fh, fw, comps, _ = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    cid, hi, vi, tq = comps[i]
    cw = -(-fw * hi // hmax)
    ch = -(-fh * vi // vmax)
    return -(-ch // 8), -(-cw // 8)  # (bh, bw)


def _decode_scan(
    payload, pos, sos, frame, coefs, huff, restart_interval, eobrun_box
) -> int:
    """Decode one entropy-coded scan into the coefficient arrays; returns
    the payload offset of the next marker. Handles all four progressive
    scan kinds plus the sequential full-band scan."""
    fh, fw, comps, progressive = frame
    ns = sos[0]
    scomps = []  # (comp index, dc table id, ac table id)
    cid_to_idx = {c[0]: i for i, c in enumerate(comps)}
    for i in range(ns):
        cs, td_ta = sos[1 + 2 * i : 3 + 2 * i]
        if cs not in cid_to_idx:
            raise ValueError(f"jpeg: scan references unknown component {cs}")
        scomps.append((cid_to_idx[cs], td_ta >> 4, td_ta & 0x0F))
    ss, se, ah_al = sos[1 + 2 * ns : 4 + 2 * ns]
    ah, al = ah_al >> 4, ah_al & 0x0F
    if not progressive and (ss, se, ah, al) != (0, 63, 0, 0):
        raise ValueError("jpeg: baseline scan must cover the full band")
    if progressive and ss == 0 and se != 0:
        raise ValueError("jpeg: progressive scan mixes DC and AC")
    if se > 63 or ss > se:
        raise ValueError("jpeg: bad spectral band")

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-fw // (8 * hmax))
    mcuy = -(-fh // (8 * vmax))

    br = _BitReader(payload, pos)
    preds = [0] * len(comps)
    eobrun_box[0] = 0

    def check_tables(ci, td, ta):
        dc = huff.get((0, td))
        ac = huff.get((1, ta))
        if (ss == 0 and ah == 0 and dc is None) or (se > 0 and ac is None):
            raise ValueError("jpeg: scan references undefined tables")
        return dc, ac

    # enumerate (comp, by, bx) data units in scan order
    if ns > 1:  # interleaved: MCU order over the padded grid
        def units():
            for m in range(mcux * mcuy):
                my, mx = divmod(m, mcux)
                for ci, td, ta in scomps:
                    hi, vi = comps[ci][1], comps[ci][2]
                    for by in range(vi):
                        for bx in range(hi):
                            yield m, ci, td, ta, my * vi + by, mx * hi + bx
        n_ru = mcux * mcuy  # restart counts MCUs
    else:
        ci0, td0, ta0 = scomps[0]
        bh, bw_ = _comp_grid(frame, ci0)

        def units():
            for u in range(bh * bw_):
                yield u, ci0, td0, ta0, u // bw_, u % bw_
        n_ru = bh * bw_  # restart counts data units

    last_ru = -1
    rst_count = 0
    for ru, ci, td, ta, by, bx in units():
        if restart_interval and ru != last_ru:
            if ru and ru % restart_interval == 0:
                got = br.align_to_marker()
                want = 0xD0 + (rst_count % 8)
                if got != want:
                    raise ValueError(
                        f"jpeg: expected RST{want & 7}, got marker 0x{got:02x}"
                    )
                rst_count += 1
                preds = [0] * len(comps)
                eobrun_box[0] = 0
            last_ru = ru
        dc, ac = check_tables(ci, td, ta)
        coef = coefs[ci][by, bx]
        if not progressive:
            _decode_unit_seq(br, dc, ac, coef, preds, ci)
        elif ss == 0 and ah == 0:      # DC first pass
            s = dc.decode(br)
            if s:
                preds[ci] += _extend(br.receive(s), s)
            coef[0] = preds[ci] << al
        elif ss == 0:                   # DC refinement
            if br.read_bit():
                coef[0] |= 1 << al
        elif ah == 0:                   # AC first pass (with EOB runs)
            _decode_ac_first(br, ac, coef, ss, se, al, eobrun_box)
        else:                           # AC refinement
            _decode_ac_refine(br, ac, coef, ss, se, al, eobrun_box)

    # advance to the next marker (skip pad bits / stuffed pad bytes)
    p = br.pos
    npay = len(payload)
    while p + 1 < npay and not (payload[p] == 0xFF and payload[p + 1] != 0x00):
        p += 1
    return p


def _decode_unit_seq(br, dc, ac, coef, preds, ci) -> None:
    s = dc.decode(br)
    if s:
        preds[ci] += _extend(br.receive(s), s)
    coef[0] = preds[ci]
    k = 1
    while k < 64:
        rs = ac.decode(br)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("jpeg: AC run past block end")
        coef[k] = _extend(br.receive(s), s)
        k += 1


def _decode_ac_first(br, ac, coef, ss, se, al, eobrun_box) -> None:
    if eobrun_box[0] > 0:
        eobrun_box[0] -= 1
        return
    k = ss
    while k <= se:
        rs = ac.decode(br)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r != 15:
                eobrun_box[0] = (1 << r) - 1
                if r:
                    eobrun_box[0] += br.receive(r)
                return
            k += 16  # ZRL
            continue
        k += r
        if k > se:
            raise ValueError("jpeg: AC run past spectral band")
        coef[k] = _extend(br.receive(s), s) << al
        k += 1


def _decode_ac_refine(br, ac, coef, ss, se, al, eobrun_box) -> None:
    """T.81 G.1.2.3 successive-approximation AC refinement (the libjpeg
    decode_mcu_AC_refine walk): (run,1) symbols place newly-significant
    +-1<<al values after skipping `run` zero-HISTORY positions, reading
    one correction bit for every nonzero coefficient passed along the
    way; EOB runs refine every remaining nonzero coefficient in band."""
    p1 = 1 << al
    m1 = -p1

    def refine_one(k):
        c = int(coef[k])
        if c != 0 and br.read_bit():
            if (c & p1) == 0:
                coef[k] = c + (p1 if c > 0 else m1)

    k = ss
    if eobrun_box[0] == 0:
        while k <= se:
            rs = ac.decode(br)
            r, s = rs >> 4, rs & 0x0F
            newval = 0
            if s == 0:
                if r != 15:
                    eobrun_box[0] = 1 << r
                    if r:
                        eobrun_box[0] += br.receive(r)
                    break  # EOB-run handling below
                # ZRL: skip 16 zero-history positions
            else:
                if s != 1:
                    raise ValueError("jpeg: AC refinement magnitude != 1")
                newval = p1 if br.read_bit() else m1
            while k <= se:
                if coef[k] != 0:
                    refine_one(k)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if newval and k <= se:
                coef[k] = newval
            k += 1
    if eobrun_box[0] > 0:
        while k <= se:
            if coef[k] != 0:
                refine_one(k)
            k += 1
        eobrun_box[0] -= 1


def _reconstruct(frame, coefs, qtables) -> Raster:
    """Dequantize + IDCT every component's accumulated coefficients, then
    upsample / crop / color-convert — shared by both processes."""
    fh, fw, comps, _ = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    full = []
    for (cid, hi, vi, tq), czz in zip(comps, coefs):
        if tq not in qtables:
            raise ValueError("jpeg: frame references undefined quant table")
        q = qtables[tq]
        bh, bw_ = czz.shape[:2]
        rm = np.zeros((bh, bw_, 64), dtype=np.int64)
        rm[..., ZIGZAG] = czz  # zigzag position k -> row-major index
        blocks = _D.T @ (rm.reshape(bh, bw_, 8, 8) * q) @ _D + 128.0
        plane = blocks.transpose(0, 2, 1, 3).reshape(bh * 8, bw_ * 8)
        if hi < hmax or vi < vmax:
            plane = np.repeat(
                np.repeat(plane, vmax // vi, axis=0), hmax // hi, axis=1
            )
        full.append(plane[:fh, :fw])
    if len(full) == 1:
        px = np.rint(full[0]).clip(0, 255).astype(np.uint8)
        return Raster(fw, fh, 1, px.tobytes())
    if len(full) != 3:
        raise NotImplementedError(f"jpeg: {len(full)}-component color unsupported")
    y, cb, cr = full
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136286 * (cb - 128.0) - 0.714136286 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    px = np.rint(rgb).clip(0, 255).astype(np.uint8)
    return Raster(fw, fh, 3, px.tobytes())
