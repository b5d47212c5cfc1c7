"""Pure-Python baseline JPEG codec (decode/encode) from the public
ITU-T T.81 specification — numpy only, no image libs.

Why it exists: the multimodal decode stage gained REAL pixels for PNG
in r5 (operators/png.py); JPEG is the dominant real-world image format
and needed the same treatment. Baseline sequential DCT JPEG is
self-contained: marker segments (B.2), canonical Huffman coding
(C.1-C.3 + the Annex K.3 example tables), the 8×8 DCT (A.3.3) as a
matrix product, and byte stuffing (B.1.1.5). The ~500 lines here
implement exactly that.

Supported: baseline sequential (SOF0), extended sequential (SOF1,
8-bit), and — since r6 — PROGRESSIVE (SOF2: spectral selection,
successive approximation, DC/AC first and refinement scans, EOB runs,
per-scan Huffman redefinition; T.81 Annex G), 8-bit precision, 1- or
3-component frames, sampling factors 1-2 (4:4:4, 4:2:0, and the 4:2:2
family), restart intervals (DRI/RSTn), interleaved and
non-interleaved scans. ``encode`` emits baseline JFIF with the Annex
K example tables quality-scaled by the public IJG convention;
``encode_progressive`` emits a multi-scan SOF2 stream (its AC scans
carry purpose-built DHT segments, since the K tables define no EOBn
symbols). Rejected loudly (JpegFormatError): lossless/hierarchical
SOF families, arithmetic coding, 12-bit precision, sampling
factors > 2.

The IDCT/DCT run vectorized over all blocks at once (einsum with the
precomputed 8×8 basis); the only per-symbol Python is the Huffman
entropy loop, which is irreducible without a compiled kernel and is
bounded per payload. At scale, decode runs inside Arrow-batched
mapInPandas — one image per core — so throughput comes from payload
parallelism, same as the PNG codec.
"""

from __future__ import annotations

import struct

import numpy as np

from ..errors import RqError


class JpegFormatError(RqError):
    """Malformed or unsupported-profile JPEG."""


def is_jpeg(data: bytes) -> bool:
    return bytes(data[:2]) == b"\xff\xd8"


def is_progressive(data: bytes) -> bool:
    """True iff the stream's frame header is SOF2 (progressive DCT).
    Walks marker segments — never the entropy-coded data — so DHT/DQT
    bodies that happen to contain 0xFFC2 can't false-positive."""
    b = bytes(data)
    if not is_jpeg(b):
        return False
    pos = 2
    while pos + 4 <= len(b):
        if b[pos] != 0xFF:
            return False
        while pos + 1 < len(b) and b[pos + 1] == 0xFF:
            pos += 1
        marker = b[pos + 1]
        if marker == 0xC2:
            return True
        if marker in (0xC0, 0xC1) or marker == 0xDA or marker == 0xD9:
            return False
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        seglen = int.from_bytes(b[pos + 2 : pos + 4], "big")
        if seglen < 2:
            return False
        pos += 2 + seglen
    return False


# ---------------------------------------------------------- constants

#: zigzag scan order (T.81 figure 5): zigzag index → row-major index
ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)
UNZIGZAG = np.argsort(ZIGZAG)

#: Annex K.1 example quantization tables (luminance / chrominance)
STD_LUM_Q = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
).reshape(8, 8)
STD_CHR_Q = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
).reshape(8, 8)

#: Annex K.3 example Huffman specs: (BITS[1..16], HUFFVAL)
DC_LUM_SPEC = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
DC_CHR_SPEC = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
AC_LUM_SPEC = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
AC_CHR_SPEC = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)


def _dct_matrix() -> np.ndarray:
    """8×8 forward-DCT basis (T.81 A.3.3): F = C @ block @ C.T."""
    n = np.arange(8)
    k = n[:, None]
    c = np.full(8, np.sqrt(2.0 / 8.0))
    c[0] = np.sqrt(1.0 / 8.0)
    return c[:, None] * np.cos((2 * n + 1) * k * np.pi / 16.0)


_C = _dct_matrix()


def _build_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical Huffman assignment (T.81 C.2): symbol → (code, length)."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


class _DecTable:
    """Decode-side Huffman table: the (length, code) → symbol map plus
    a 10-bit first-level LUT (entries (symbol, length); None marks a
    longer code). Short codes — the vast majority of a scan — resolve
    in one window lookup instead of a per-bit dict walk; codes longer
    than 10 bits (and windows near the stream tail) fall back to the
    exact walk. Build cost is 1024 slots, negligible even under
    per-scan DHT redefinition."""

    __slots__ = ("map", "lut")

    def __init__(self, mapping: dict[tuple[int, int], int]):
        self.map = mapping
        lut: list[tuple[int | None, int]] = [(None, 0)] * 1024
        for (ln, code), sym in mapping.items():
            if ln <= 10:
                base = code << (10 - ln)
                for i in range(1 << (10 - ln)):
                    lut[base + i] = (sym, ln)
        self.lut = lut


def _invert_codes(codes: dict[int, tuple[int, int]]) -> _DecTable:
    return _DecTable({(ln, code): sym for sym, (code, ln) in codes.items()})


def quality_scale(base: np.ndarray, quality: int) -> np.ndarray:
    """Quality → quant table, the public IJG scaling convention:
    q<50 scales by 5000/q, else by 200−2q, clamped to [1, 255]."""
    quality = min(100, max(1, quality))
    sf = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * sf + 50) // 100, 1, 255).astype(np.int64)


# ---------------------------------------------------------- bit I/O


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        if length == 0:
            return
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(b)
            if b == 0xFF:  # byte stuffing (B.1.1.5)
                self.buf.append(0x00)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> None:
        if self.n:  # pad the final byte with 1-bits (F.1.2.3)
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def read(self, k: int) -> int:
        while self.n < k:
            if self.pos >= len(self.data):
                raise JpegFormatError("truncated entropy-coded data")
            self.acc = (self.acc << 8) | self.data[self.pos]
            self.pos += 1
            self.n += 8
        self.n -= k
        v = (self.acc >> self.n) & ((1 << k) - 1)
        # trim consumed history — an unmasked accumulator grows with
        # the whole scan and turns every shift into O(scan bits)
        self.acc &= (1 << self.n) - 1
        return v

    def decode_symbol(self, table: "_DecTable") -> int:
        # fast path: one 10-bit window lookup (see _DecTable)
        while self.n < 10 and self.pos < len(self.data):
            self.acc = (self.acc << 8) | self.data[self.pos]
            self.pos += 1
            self.n += 8
        if self.n >= 10:
            sym, ln = table.lut[(self.acc >> (self.n - 10)) & 0x3FF]
            if sym is not None:
                self.n -= ln
                self.acc &= (1 << self.n) - 1
                return sym
        # exact walk: codes longer than 10 bits, or the stream tail
        mapping = table.map
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read(1)
            sym = mapping.get((length, code))
            if sym is not None:
                return sym
        raise JpegFormatError("invalid Huffman code in scan")


def _extend(v: int, t: int) -> int:
    """DIFF/AC magnitude decode (T.81 F.2.2.1 EXTEND)."""
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


def _category(v: int) -> tuple[int, int]:
    """value → (size category, raw bits) for encoding (F.1.2.1.2)."""
    if v == 0:
        return 0, 0
    t = abs(v).bit_length()
    return t, v if v > 0 else v + (1 << t) - 1


# ---------------------------------------------------------- color

# JFIF YCbCr matrices (public JFIF 1.02 / CCIR 601 coefficients)
_RGB2YCC = np.array(
    [
        [0.299, 0.587, 0.114],
        [-0.168736, -0.331264, 0.5],
        [0.5, -0.418688, -0.081312],
    ]
)
_YCC2RGB = np.array(
    [
        [1.0, 0.0, 1.402],
        [1.0, -0.344136, -0.714136],
        [1.0, 1.772, 0.0],
    ]
)


def _rgb_to_ycc(rgb: np.ndarray) -> np.ndarray:
    ycc = rgb.astype(np.float64) @ _RGB2YCC.T
    ycc[..., 1:] += 128.0
    return ycc


def _ycc_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y = ycc.astype(np.float64).copy()
    y[..., 1:] -= 128.0
    rgb = y @ _YCC2RGB.T
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# ---------------------------------------------------------- encoder


def _blockify(plane: np.ndarray) -> np.ndarray:
    """(H, W) float plane (H, W multiples of 8) → (n, 8, 8) blocks in
    row-major block order."""
    h, w = plane.shape
    return (
        plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    )


def _pad_to(plane: np.ndarray, mh: int, mw: int) -> np.ndarray:
    """Edge-replicate pad up to multiples of (mh, mw)."""
    h, w = plane.shape
    ph = (mh - h % mh) % mh
    pw = (mw - w % mw) % mw
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    return plane


def _encode_component_blocks(
    blocks: np.ndarray, qtab: np.ndarray
) -> np.ndarray:
    """(n, 8, 8) spatial blocks → (n, 64) zigzagged quantized coeffs."""
    shifted = blocks - 128.0
    coeffs = np.einsum("ij,njk,lk->nil", _C, shifted, _C)
    quant = np.round(coeffs / qtab).astype(np.int64)
    return quant.reshape(-1, 64)[:, ZIGZAG]


def _emit_block(
    w: _BitWriter,
    zz: np.ndarray,
    pred: int,
    dc_codes: dict[int, tuple[int, int]],
    ac_codes: dict[int, tuple[int, int]],
) -> int:
    dc = int(zz[0])
    t, bits = _category(dc - pred)
    code, ln = dc_codes[t]
    w.write(code, ln)
    w.write(bits, t)
    run = 0
    # index of last nonzero AC (0 if none)
    nz = np.nonzero(zz[1:])[0]
    last = (nz[-1] + 1) if nz.size else 0
    for i in range(1, last + 1):
        v = int(zz[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]  # ZRL
            w.write(code, ln)
            run -= 16
        t, bits = _category(v)
        code, ln = ac_codes[(run << 4) | t]
        w.write(code, ln)
        w.write(bits, t)
        run = 0
    if last < 63:
        code, ln = ac_codes[0x00]  # EOB
        w.write(code, ln)
    return dc


def _prepare_frame(arr: np.ndarray, quality: int, subsample: bool):
    """Shared encode-side frame prep: color transform, subsampling,
    MCU padding, forward DCT + quantization. Returns
    (h, w, nc, samps, qsel, lum_q, chr_q, mcux, mcuy, comp_zz) where
    comp_zz[i] = (zigzagged (n, 64) coeffs, blocks per store row)."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    if a.ndim != 3 or a.shape[2] not in (1, 3):
        raise JpegFormatError(f"unsupported array shape {a.shape}")
    h, w, nc = a.shape
    if h == 0 or w == 0:
        raise JpegFormatError("empty image")
    lum_q = quality_scale(STD_LUM_Q, quality)
    chr_q = quality_scale(STD_CHR_Q, quality)

    if nc == 1:
        planes = [a[:, :, 0].astype(np.float64)]
        samps = [(1, 1)]
        qsel = [0]
    else:
        ycc = _rgb_to_ycc(a)
        y, cb, cr = ycc[..., 0], ycc[..., 1], ycc[..., 2]
        if subsample:  # 4:2:0 — average 2×2 chroma neighborhoods
            cb = _pad_to(cb, 2, 2)
            cr = _pad_to(cr, 2, 2)
            cb = cb.reshape(cb.shape[0] // 2, 2, cb.shape[1] // 2, 2).mean((1, 3))
            cr = cr.reshape(cr.shape[0] // 2, 2, cr.shape[1] // 2, 2).mean((1, 3))
            samps = [(2, 2), (1, 1), (1, 1)]
        else:
            samps = [(1, 1), (1, 1), (1, 1)]
        planes = [y, cb, cr]
        qsel = [0, 1, 1]

    hmax = max(s[0] for s in samps)
    vmax = max(s[1] for s in samps)
    # pad each plane so every component tiles its MCU grid exactly
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    comp_zz = []
    for plane, (sh, sv) in zip(planes, samps):
        padded = _pad_to(plane, 8, 8)
        # also pad out to the full MCU grid for this component
        need_h = mcuy * sv * 8
        need_w = mcux * sh * 8
        padded = np.pad(
            padded,
            ((0, need_h - padded.shape[0]), (0, need_w - padded.shape[1])),
            mode="edge",
        )
        qtab = lum_q if qsel[len(comp_zz)] == 0 else chr_q
        comp_zz.append(
            (_encode_component_blocks(_blockify(padded), qtab), need_w // 8)
        )
    return h, w, nc, samps, qsel, lum_q, chr_q, mcux, mcuy, comp_zz


def _marker_preamble(
    h: int, w: int, nc: int, samps, qsel, lum_q, chr_q, sof_marker: int
) -> bytearray:
    """SOI + APP0 + DQT(s) + SOF — the segments shared by the baseline
    and progressive encoders."""
    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(
        0xFFE0, b"JFIF\x00\x01\x01\x00" + struct.pack(">HH", 1, 1) + bytes(2)
    )
    for tq, tab in ((0, lum_q), (1, chr_q)):
        if nc == 1 and tq == 1:
            continue
        out += _seg(
            0xFFDB, bytes([tq]) + tab.reshape(64)[ZIGZAG].astype(np.uint8).tobytes()
        )
    sof = bytearray(struct.pack(">BHHB", 8, h, w, nc))
    for ci, (sh, sv) in enumerate(samps):
        sof += bytes([ci + 1, (sh << 4) | sv, qsel[ci]])
    out += _seg(sof_marker, bytes(sof))
    return out


def _seg(marker: int, body: bytes) -> bytes:
    return struct.pack(">HH", marker, len(body) + 2) + body


def encode(
    arr: np.ndarray,
    quality: int = 90,
    subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """uint8 (H, W) gray or (H, W, 3) RGB array → baseline JFIF bytes.

    ``subsample=True`` emits 4:2:0 (chroma halved both ways, the
    common camera layout); default is 4:4:4. ``restart_interval``
    emits DRI + RSTn markers every n MCUs (exercises the decoder's
    resync path). Tables are the Annex K examples scaled by
    ``quality`` (IJG convention)."""
    h, w, nc, samps, qsel, lum_q, chr_q, mcux, mcuy, comp_zz = _prepare_frame(
        arr, quality, subsample
    )
    dc_lum = _build_codes(*DC_LUM_SPEC)
    ac_lum = _build_codes(*AC_LUM_SPEC)
    dc_chr = _build_codes(*DC_CHR_SPEC)
    ac_chr = _build_codes(*AC_CHR_SPEC)

    # interleaved entropy-coded scan (A.2.3 MCU ordering)
    bw = _BitWriter()
    preds = [0] * nc
    mcu_count = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                bw.flush()
                bw.buf += bytes([0xFF, 0xD0 + (rst % 8)])  # RSTn, unstuffed
                rst += 1
                preds = [0] * nc
            mcu_count += 1
            for ci, (sh, sv) in enumerate(samps):
                zzs, bw_blocks = comp_zz[ci]
                dc_c = dc_lum if ci == 0 else dc_chr
                ac_c = ac_lum if ci == 0 else ac_chr
                for by in range(sv):
                    for bx in range(sh):
                        bi = (my * sv + by) * bw_blocks + (mx * sh + bx)
                        preds[ci] = _emit_block(bw, zzs[bi], preds[ci], dc_c, ac_c)
    bw.flush()

    out = _marker_preamble(h, w, nc, samps, qsel, lum_q, chr_q, 0xFFC0)
    for tc_th, spec in (
        ((0 << 4) | 0, DC_LUM_SPEC),
        ((1 << 4) | 0, AC_LUM_SPEC),
        ((0 << 4) | 1, DC_CHR_SPEC),
        ((1 << 4) | 1, AC_CHR_SPEC),
    ):
        if nc == 1 and (tc_th & 0x0F) == 1:
            continue
        bits, vals = spec
        out += _seg(0xFFC4, bytes([tc_th]) + bytes(bits) + bytes(vals))
    if restart_interval:
        out += _seg(0xFFDD, struct.pack(">H", restart_interval))
    sos = bytearray([nc])
    for ci in range(nc):
        td_ta = 0x00 if ci == 0 else 0x11
        sos += bytes([ci + 1, td_ta])
    sos += bytes([0, 63, 0])  # Ss, Se, Ah/Al (baseline fixed)
    out += _seg(0xFFDA, bytes(sos))
    out += bw.buf
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ------------------------------------------------- progressive encoder


def _equal_length_table(symbols: set[int]) -> tuple[bytes, dict[int, tuple[int, int]]]:
    """Canonical Huffman table assigning every symbol the same code
    length L = ⌈log2(n+1)⌉ — valid per T.81 C.2 (the all-ones code of
    the longest length stays unassigned because n ≤ 2^L − 1). Not
    compression-optimal, but the point of the progressive encoder is
    exercising the decoder, and these tables force it through DHT
    redefinition between scans and through EOBn symbols the Annex K
    example tables do not define. Returns (DHT body sans table id,
    symbol → (code, length))."""
    vals = sorted(symbols)
    n = len(vals)
    if n == 0:
        vals, n = [0], 1  # a scan may emit no symbol (all-EOB image)
    length = max((n + 1 - 1).bit_length(), 1)  # smallest L with n ≤ 2^L − 1
    while n > (1 << length) - 1:
        length += 1
    bits = [0] * 16
    bits[length - 1] = n
    return bytes(bits) + bytes(vals), _build_codes(bits, vals)


def _flat_tokens(tokens: list) -> set[int]:
    return {t[1] for t in tokens if t[0] == "s"}


def _write_tokens(bw: _BitWriter, tokens: list, codes: dict[int, tuple[int, int]]) -> None:
    for t in tokens:
        if t[0] == "s":
            code, ln = codes[t[1]]
            bw.write(code, ln)
        else:
            bw.write(t[1], t[2])


def _dc_first_tokens(comp_zz, samps, order, mcux, mcuy, al) -> list:
    """Interleaved DC first-pass scan (G.1.2.1): diff-code dc >> al
    (arithmetic shift — floor, matching the decoder's `pred << al`
    plus later low-bit OR). One token stream, symbols shared across
    components (all scan selectors point at one DC table)."""
    toks: list = []
    preds = [0] * len(order)
    for my in range(mcuy):
        for mx in range(mcux):
            for si, ci in enumerate(order):
                sh, sv = samps[ci]
                zzs, row_blocks = comp_zz[ci]
                for by in range(sv):
                    for bx in range(sh):
                        bi = (my * sv + by) * row_blocks + (mx * sh + bx)
                        dc = int(zzs[bi][0]) >> al
                        t, bits = _category(dc - preds[si])
                        preds[si] = dc
                        toks.append(("s", t))
                        if t:
                            toks.append(("b", bits, t))
    return toks


def _dc_refine_tokens(comp_zz, samps, order, mcux, mcuy, al) -> list:
    """Interleaved DC refinement scan (G.1.2.1): one raw bit per
    block — bit `al` of the DC coefficient, no entropy coding."""
    toks: list = []
    for my in range(mcuy):
        for mx in range(mcux):
            for ci in order:
                sh, sv = samps[ci]
                zzs, row_blocks = comp_zz[ci]
                for by in range(sv):
                    for bx in range(sh):
                        bi = (my * sv + by) * row_blocks + (mx * sh + bx)
                        toks.append(("b", (int(zzs[bi][0]) >> al) & 1, 1))
    return toks


def _ac_first_tokens(blocks, ks, ke, al) -> list:
    """Non-interleaved AC first-pass scan (G.1.2.2): run-length code
    the band's coefficients point-transformed toward zero by 2^al,
    accumulating EOB runs across blocks (EOBn symbols, capped at
    32767 per G.1.2.2)."""
    toks: list = []
    eobrun = 0

    def flush_eob() -> None:
        nonlocal eobrun
        if eobrun == 0:
            return
        nbits = eobrun.bit_length() - 1
        toks.append(("s", nbits << 4))
        if nbits:
            toks.append(("b", eobrun - (1 << nbits), nbits))
        eobrun = 0

    for zz in blocks:
        r = 0
        wrote = False
        for k in range(ks, ke + 1):
            v = int(zz[k])
            t = abs(v) >> al
            if t == 0:
                r += 1
                continue
            flush_eob()
            while r > 15:
                toks.append(("s", 0xF0))  # ZRL
                r -= 16
            s = t.bit_length()
            val = t if v > 0 else -t
            toks.append(("s", (r << 4) | s))
            toks.append(("b", _category(val)[1], s))
            r = 0
            wrote = True
        if r > 0 or not wrote:
            eobrun += 1
            if eobrun == 0x7FFF:
                flush_eob()
    flush_eob()
    return toks


def _ac_refine_tokens(blocks, ks, ke, al) -> list:
    """Non-interleaved AC refinement scan (G.1.2.3): newly-significant
    coefficients (|v| >> al == 1) are run-length coded over
    zero-history positions; already-significant ones contribute
    buffered correction bits that trail the symbol covering them —
    mirror of the decoder's interleaved-read order, EOB-run pending
    bits included."""
    toks: list = []
    eobrun = 0
    pending: list = []  # correction bits deferred behind a future EOBn

    def flush_eob() -> None:
        nonlocal eobrun, pending
        if eobrun == 0:
            return
        nbits = eobrun.bit_length() - 1
        toks.append(("s", nbits << 4))
        if nbits:
            toks.append(("b", eobrun - (1 << nbits), nbits))
        toks.extend(pending)
        pending = []
        eobrun = 0

    for zz in blocks:
        r = 0
        br: list = []  # correction bits since the last emitted symbol
        # last newly-significant index: trailing ZRLs fold into the EOB run
        last_sig = ks - 1
        for k in range(ks, ke + 1):
            if abs(int(zz[k])) >> al == 1:
                last_sig = k
        for k in range(ks, ke + 1):
            v = int(zz[k])
            t = abs(v) >> al
            if t == 0:
                r += 1
                continue
            while r > 15 and k <= last_sig:
                flush_eob()
                toks.append(("s", 0xF0))
                r -= 16
                toks.extend(br)
                br = []
            if t > 1:
                # history-nonzero: correction bit only
                br.append(("b", t & 1, 1))
                continue
            flush_eob()
            toks.append(("s", (r << 4) | 1))
            toks.append(("b", 1 if v > 0 else 0, 1))
            toks.extend(br)
            br = []
            r = 0
        if r > 0 or br:
            eobrun += 1
            pending.extend(br)
            if eobrun == 0x7FFF:
                flush_eob()
    flush_eob()
    return toks


def _component_blocks(comp_zz, samps, ci, h, w, hmax, vmax, mcux):
    """Blocks of component ci in NON-interleaved scan order: the
    component's own ⌈dim/8⌉ grid (A.2.2), without the MCU padding rows
    and columns of the store."""
    sh, sv = samps[ci]
    zzs, row_blocks = comp_zz[ci]
    cw = -(-(w * sh) // hmax)
    ch = -(-(h * sv) // vmax)
    cbw = -(-cw // 8)
    cbh = -(-ch // 8)
    return [zzs[by * row_blocks + bx] for by in range(cbh) for bx in range(cbw)]


def encode_progressive(
    arr: np.ndarray, quality: int = 90, subsample: bool = False
) -> bytes:
    """uint8 (H, W) gray or (H, W, 3) RGB array → progressive (SOF2)
    JFIF bytes.

    Scan script (a valid Annex G decomposition chosen to exercise
    every decoder path):

    1. DC first, all components interleaved, Al=1
    2. DC refinement, interleaved, Ah=1 → Al=0 (raw bits, no table)
    3. AC first per component, luma split into bands 1-5 and 6-63
       (spectral selection), chroma as one band 1-63, all at Al=1
    4. AC refinement per component over the same bands, Ah=1 → Al=0

    Quantized coefficients are identical to `encode`'s (same
    `_prepare_frame`), so a progressive stream decodes to EXACTLY the
    pixels of the baseline stream at the same quality — the round-trip
    property the tests assert. AC scans each carry their own DHT
    (table id 0, redefined before every scan — `_equal_length_table`);
    DC scans reuse the Annex K DC specs."""
    h, w, nc, samps, qsel, lum_q, chr_q, mcux, mcuy, comp_zz = _prepare_frame(
        arr, quality, subsample
    )
    hmax = max(s[0] for s in samps)
    vmax = max(s[1] for s in samps)
    order = list(range(nc))

    out = _marker_preamble(h, w, nc, samps, qsel, lum_q, chr_q, 0xFFC2)

    def sos(sel: list[tuple[int, int, int]], ss: int, se: int, ah: int, al: int) -> bytes:
        body = bytearray([len(sel)])
        for ci, td, ta in sel:
            body += bytes([ci + 1, (td << 4) | ta])
        body += bytes([ss, se, (ah << 4) | al])
        return _seg(0xFFDA, bytes(body))

    # 1. DC first (Al=1) — one shared DC table (Annex K luma spec)
    out += _seg(0xFFC4, bytes([0x00]) + bytes(DC_LUM_SPEC[0]) + bytes(DC_LUM_SPEC[1]))
    dc_codes = _build_codes(*DC_LUM_SPEC)
    toks = _dc_first_tokens(comp_zz, samps, order, mcux, mcuy, 1)
    bw = _BitWriter()
    _write_tokens(bw, toks, dc_codes)
    bw.flush()
    out += sos([(ci, 0, 0) for ci in order], 0, 0, 0, 1)
    out += bw.buf

    # 2. DC refinement (Ah=1, Al=0) — raw bits
    toks = _dc_refine_tokens(comp_zz, samps, order, mcux, mcuy, 0)
    bw = _BitWriter()
    _write_tokens(bw, toks, {})
    bw.flush()
    out += sos([(ci, 0, 0) for ci in order], 0, 0, 1, 0)
    out += bw.buf

    # per-component AC bands: luma gets a spectral split
    bands = {ci: ([(1, 5), (6, 63)] if ci == 0 else [(1, 63)]) for ci in order}

    # 3. AC first passes (Al=1), custom DHT per scan
    for ci in order:
        for ss, se in bands[ci]:
            blocks = _component_blocks(comp_zz, samps, ci, h, w, hmax, vmax, mcux)
            toks = _ac_first_tokens(blocks, ss, se, 1)
            body, codes = _equal_length_table(_flat_tokens(toks))
            out += _seg(0xFFC4, bytes([0x10]) + body)  # AC table 0, redefined
            bw = _BitWriter()
            _write_tokens(bw, toks, codes)
            bw.flush()
            out += sos([(ci, 0, 0)], ss, se, 0, 1)
            out += bw.buf

    # 4. AC refinements (Ah=1 → Al=0)
    for ci in order:
        for ss, se in bands[ci]:
            blocks = _component_blocks(comp_zz, samps, ci, h, w, hmax, vmax, mcux)
            toks = _ac_refine_tokens(blocks, ss, se, 0)
            body, codes = _equal_length_table(_flat_tokens(toks))
            out += _seg(0xFFC4, bytes([0x10]) + body)
            bw = _BitWriter()
            _write_tokens(bw, toks, codes)
            bw.flush()
            out += sos([(ci, 0, 0)], ss, se, 1, 0)
            out += bw.buf

    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------- decoder


def _split_scan(b: bytes, start: int) -> tuple[list[bytes], int]:
    """Unstuff the entropy-coded data from ``start``: returns the
    restart segments (RSTn boundaries split; 0xFF00 → 0xFF) and the
    offset of the marker that terminated the scan."""
    segs: list[bytes] = []
    cur = bytearray()
    pos = start
    n = len(b)
    while pos < n:
        byte = b[pos]
        if byte != 0xFF:
            cur.append(byte)
            pos += 1
            continue
        if pos + 1 >= n:
            pos = n
            break
        nxt = b[pos + 1]
        if nxt == 0x00:  # stuffed 0xFF
            cur.append(0xFF)
            pos += 2
        elif 0xD0 <= nxt <= 0xD7:  # restart marker
            segs.append(bytes(cur))
            cur = bytearray()
            pos += 2
        else:  # EOI or any other marker ends the scan
            break
    segs.append(bytes(cur))
    return segs, pos


def _ac_first_block(
    reader: _BitReader,
    act: dict[tuple[int, int], int],
    zz: np.ndarray,
    ks: int,
    ke: int,
    al: int,
    eobrun: int,
) -> int:
    """First-pass AC decode of one block over band [ks, ke] with point
    transform al (T.81 F.2.2.2 for the baseline band 1-63 / al=0 case,
    G.2 EOBn semantics for progressive). Returns the remaining EOB
    run. Baseline streams reuse this path unchanged: their EOB symbol
    0x00 is EOB0, an EOB run covering exactly the current block."""
    if eobrun > 0:
        return eobrun - 1
    k = ks
    while k <= ke:
        rs = reader.decode_symbol(act)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            eobrun = (1 << r) - 1
            if r:
                eobrun += reader.read(r)
            return eobrun
        k += r
        if k > ke:
            raise JpegFormatError("AC coefficient overrun")
        zz[k] = _extend(reader.read(s), s) << al
        k += 1
    return 0


def _ac_refine_block(
    reader: _BitReader,
    act: dict[tuple[int, int], int],
    zz: np.ndarray,
    ks: int,
    ke: int,
    al: int,
    eobrun: int,
) -> int:
    """Refinement-pass AC decode of one block (T.81 G.2 / figure
    G.7): newly-significant coefficients arrive as ±2^al with a
    run-length over ZERO-history positions; every already-nonzero
    coefficient passed contributes one correction bit; EOB runs carry
    the trailing correction bits of the blocks they cover."""
    p1 = 1 << al
    k = ks
    if eobrun == 0:
        while k <= ke:
            rs = reader.decode_symbol(act)
            r, s = rs >> 4, rs & 0x0F
            if s == 0:
                if r != 15:
                    eobrun = (1 << r)
                    if r:
                        eobrun += reader.read(r)
                    break
                val = 0  # ZRL: skip 16 zero-history positions
            elif s == 1:
                val = p1 if reader.read(1) else -p1
            else:
                raise JpegFormatError("refinement scan symbol with s > 1")
            while k <= ke:
                v = int(zz[k])
                if v != 0:
                    if reader.read(1) and (abs(v) & p1) == 0:
                        zz[k] = v + (p1 if v > 0 else -p1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= ke:
                zz[k] = val
            k += 1
    if eobrun > 0:
        while k <= ke:
            v = int(zz[k])
            if v != 0:
                if reader.read(1) and (abs(v) & p1) == 0:
                    zz[k] = v + (p1 if v > 0 else -p1)
            k += 1
        eobrun -= 1
    return eobrun


class _FrameState:
    """Mutable decode state shared across the scans of one frame."""

    def __init__(self, h: int, w: int, comps: list, progressive: bool):
        self.h, self.w, self.comps = h, w, comps
        self.progressive = progressive
        self.hmax = max(c[1] for c in comps)
        self.vmax = max(c[2] for c in comps)
        self.mcux = -(-w // (8 * self.hmax))
        self.mcuy = -(-h // (8 * self.vmax))
        # coefficient store on the MCU-padded grid (row width mcux·sh);
        # non-interleaved scans touch only the component's own
        # ⌈dim/8⌉ sub-grid (A.2.2) — padding blocks stay zero and are
        # cropped away after the IDCT
        self.zz = [
            np.zeros((self.mcuy * sv * self.mcux * sh, 64), dtype=np.int64)
            for _, sh, sv, _ in comps
        ]
        self.scans = 0

    def comp_grid(self, ci: int) -> tuple[int, int]:
        """(blocks_wide, blocks_high) of component ci's OWN grid."""
        _, sh, sv, _ = self.comps[ci]
        cw = -(-(self.w * sh) // self.hmax)
        ch = -(-(self.h * sv) // self.vmax)
        return -(-cw // 8), -(-ch // 8)


def _decode_scan(
    fs: _FrameState,
    body: bytes,
    b: bytes,
    start: int,
    huff: dict,
    restart_interval: int,
) -> int:
    """Entropy-decode one scan (SOS body + following data) into the
    frame's coefficient store; returns the stream offset after the
    scan. Handles baseline (single full-band scan) and every
    progressive scan shape through the same block routines."""
    ns = body[0]
    cid_index = {c[0]: i for i, c in enumerate(fs.comps)}
    sel = []
    for si in range(ns):
        cs, tdta = body[1 + 2 * si], body[2 + 2 * si]
        if cs not in cid_index:
            raise JpegFormatError(f"scan references unknown component {cs}")
        sel.append((cid_index[cs], tdta >> 4, tdta & 0x0F))
    ss, se, ahal = body[1 + 2 * ns : 4 + 2 * ns]
    ah, al = ahal >> 4, ahal & 0x0F

    if not fs.progressive:
        if (ss, se, ah, al) != (0, 63, 0, 0):
            raise JpegFormatError(
                f"sequential scan with progressive parameters "
                f"Ss={ss} Se={se} Ah={ah} Al={al}"
            )
    else:
        if ss == 0 and se != 0:
            raise JpegFormatError("progressive DC scan must have Se=0 (G.1.1.1.1)")
        if ss > 0 and (len(sel) != 1 or se < ss or se > 63):
            raise JpegFormatError("progressive AC scans are single-component")
        if ah and ah != al + 1:
            raise JpegFormatError("successive approximation must step by one bit")

    segments, end = _split_scan(b, start)
    seg_idx = 0
    reader = _BitReader(segments[0])
    preds = [0] * len(sel)
    eobrun = 0

    def tables(td: int, ta: int):
        dct = huff.get((0, td)) if ss == 0 and ah == 0 else None
        act = huff.get((1, ta)) if se > 0 else None
        if ss == 0 and ah == 0 and dct is None:
            raise JpegFormatError("scan references missing DC Huffman table")
        if se > 0 and act is None:
            raise JpegFormatError("scan references missing AC Huffman table")
        return dct, act

    def decode_block(si: int, zz: np.ndarray, dct, act) -> None:
        nonlocal eobrun
        if ss == 0:
            if ah == 0:
                t = reader.decode_symbol(dct)
                diff = _extend(reader.read(t), t) if t else 0
                preds[si] += diff
                zz[0] = preds[si] << al
            elif reader.read(1):
                zz[0] = int(zz[0]) | (1 << al)
        if se > 0:
            band_start = max(ss, 1)
            if ah == 0:
                eobrun = _ac_first_block(reader, act, zz, band_start, se, al, eobrun)
            else:
                eobrun = _ac_refine_block(reader, act, zz, band_start, se, al, eobrun)

    if len(sel) > 1:
        # interleaved: MCU order over the full padded grid (A.2.3)
        units = fs.mcux * fs.mcuy
        sel_tabs = [tables(td, ta) for _, td, ta in sel]
        per_comp = [(fs.comps[ci][1], fs.comps[ci][2]) for ci, _, _ in sel]
        for u in range(units):
            if restart_interval and u and u % restart_interval == 0:
                seg_idx += 1
                if seg_idx >= len(segments):
                    raise JpegFormatError("missing restart segment in scan")
                reader = _BitReader(segments[seg_idx])
                preds = [0] * len(sel)
                eobrun = 0
            my, mx = divmod(u, fs.mcux)
            for si, (ci, td, ta) in enumerate(sel):
                dct, act = sel_tabs[si]
                sh, sv = per_comp[si]
                row_blocks = fs.mcux * sh
                for by in range(sv):
                    for bx in range(sh):
                        zz = fs.zz[ci][(my * sv + by) * row_blocks + (mx * sh + bx)]
                        decode_block(si, zz, dct, act)
    else:
        # non-interleaved: the component's own block grid (A.2.2)
        ci, td, ta = sel[0]
        dct, act = tables(td, ta)
        sh = fs.comps[ci][1]
        row_blocks = fs.mcux * sh
        cbw, cbh = fs.comp_grid(ci)
        for u in range(cbw * cbh):
            if restart_interval and u and u % restart_interval == 0:
                seg_idx += 1
                if seg_idx >= len(segments):
                    raise JpegFormatError("missing restart segment in scan")
                reader = _BitReader(segments[seg_idx])
                preds = [0]
                eobrun = 0
            byy, bxx = divmod(u, cbw)
            decode_block(0, fs.zz[ci][byy * row_blocks + bxx], dct, act)

    fs.scans += 1
    return end


def decode(data: bytes) -> np.ndarray:
    """JFIF bytes → uint8 array (height, width, channels). Baseline
    (SOF0), extended sequential Huffman (SOF1), and progressive (SOF2)
    streams; multi-scan files re-read DQT/DHT/DRI between scans as the
    stream defines them (tables apply to the scans that follow)."""
    b = bytes(data)
    if not is_jpeg(b):
        raise JpegFormatError("not a JPEG (bad SOI)")
    qtabs: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    fs: _FrameState | None = None
    restart_interval = 0

    pos = 2
    while pos + 2 <= len(b):
        if b[pos] != 0xFF:
            raise JpegFormatError(f"expected marker at offset {pos}")
        while pos + 1 < len(b) and b[pos + 1] == 0xFF:  # fill bytes
            pos += 1
        marker = b[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:  # standalone
            continue
        if pos + 2 > len(b):
            raise JpegFormatError("truncated segment header")
        seglen = struct.unpack(">H", b[pos : pos + 2])[0]
        if seglen < 2 or pos + seglen > len(b):
            raise JpegFormatError("truncated segment body")
        body = b[pos + 2 : pos + seglen]
        pos += seglen

        if marker == 0xDB:  # DQT — may hold several tables
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 0x0F
                if pq != 0:
                    raise JpegFormatError("16-bit quant tables unsupported")
                tab = np.frombuffer(body[p + 1 : p + 65], np.uint8).astype(np.int64)
                if tab.size != 64:
                    raise JpegFormatError("truncated DQT")
                qtabs[tq] = tab[UNZIGZAG].reshape(8, 8)
                p += 65
        elif marker == 0xC4:  # DHT — may hold several tables
            p = 0
            while p < len(body):
                tc, th = body[p] >> 4, body[p] & 0x0F
                bits = list(body[p + 1 : p + 17])
                nvals = sum(bits)
                vals = list(body[p + 17 : p + 17 + nvals])
                if len(vals) != nvals:
                    raise JpegFormatError("truncated DHT")
                huff[(tc, th)] = _invert_codes(_build_codes(bits, vals))
                p += 17 + nvals
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 sequential, SOF2 progressive
            if fs is not None:
                raise JpegFormatError("multiple SOF markers")
            prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise JpegFormatError(f"{prec}-bit precision unsupported")
            if h == 0 or w == 0:
                raise JpegFormatError("zero-sized frame")
            comps = []
            for ci in range(nc):
                cid, hv, tq = body[6 + 3 * ci : 9 + 3 * ci]
                sh, sv = hv >> 4, hv & 0x0F
                if sh not in (1, 2) or sv not in (1, 2):
                    raise JpegFormatError(f"sampling factor {sh}x{sv} unsupported")
                comps.append((cid, sh, sv, tq))
            fs = _FrameState(h, w, comps, progressive=(marker == 0xC2))
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise JpegFormatError(
                f"SOF{marker - 0xC0}: only sequential (SOF0/1) and "
                "progressive (SOF2) frames supported"
            )
        elif marker == 0xCC:
            raise JpegFormatError("arithmetic coding unsupported")
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", body[:2])[0]
        elif marker == 0xDA:  # SOS — decode the scan inline
            if fs is None:
                raise JpegFormatError("SOS before SOF")
            pos = _decode_scan(fs, body, b, pos, huff, restart_interval)
        # APPn / COM / other segments: skipped

    if fs is None or fs.scans == 0:
        raise JpegFormatError("missing SOF/SOS")

    # dequantize + IDCT per component, vectorized over all blocks
    planes = []
    for (cid, sh, sv, tq), zzs in zip(fs.comps, fs.zz):
        qtab = qtabs.get(tq)
        if qtab is None:
            raise JpegFormatError(f"missing quant table {tq}")
        coeffs = np.zeros_like(zzs, dtype=np.float64)
        coeffs[:, ZIGZAG] = zzs  # un-zigzag
        blocks = coeffs.reshape(-1, 8, 8) * qtab
        spatial = np.einsum("ji,njk,kl->nil", _C, blocks, _C) + 128.0
        by, bx = fs.mcuy * sv, fs.mcux * sh
        plane = (
            spatial.reshape(by, bx, 8, 8).transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)
        )
        # upsample to full resolution (sample replication) and crop
        ry, rx = fs.vmax // sv, fs.hmax // sh
        if ry > 1 or rx > 1:
            plane = plane.repeat(ry, axis=0).repeat(rx, axis=1)
        planes.append(plane[: fs.h, : fs.w])

    if len(planes) == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)[:, :, None]
    if len(planes) == 3:
        return _ycc_to_rgb(np.stack(planes, axis=-1))
    raise JpegFormatError(f"{len(planes)}-component images unsupported")
