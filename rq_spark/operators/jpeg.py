"""Pure-Python baseline JPEG codec (decode/encode) from the public
ITU-T T.81 specification — numpy only, no image libs.

Why it exists: the multimodal decode stage gained REAL pixels for PNG
in r5 (operators/png.py); JPEG is the dominant real-world image format
and needed the same treatment. Baseline sequential DCT JPEG is
self-contained: marker segments (B.2), canonical Huffman coding
(C.1-C.3 + the Annex K.3 example tables), the 8×8 DCT (A.3.3) as a
matrix product, and byte stuffing (B.1.1.5). The ~500 lines here
implement exactly that.

Supported: baseline sequential (SOF0), 8-bit precision, 1- or
3-component scans, sampling factors 1-2 (4:4:4, 4:2:0, and the 4:2:2
family), restart intervals (DRI/RSTn). Encoded output is JFIF with
the Annex K example tables, quality-scaled by the public IJG
convention. Rejected loudly (JpegFormatError): progressive (SOF2) and
every other SOF family, arithmetic coding, 12-bit precision,
sampling factors > 2.

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


def _invert_codes(codes: dict[int, tuple[int, int]]) -> dict[tuple[int, int], int]:
    return {(ln, code): sym for sym, (code, ln) in codes.items()}


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
        return (self.acc >> self.n) & ((1 << k) - 1)

    def decode_symbol(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read(1)
            sym = table.get((length, code))
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

    dc_lum = _build_codes(*DC_LUM_SPEC)
    ac_lum = _build_codes(*AC_LUM_SPEC)
    dc_chr = _build_codes(*DC_CHR_SPEC)
    ac_chr = _build_codes(*AC_CHR_SPEC)

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

    # interleaved entropy-coded scan (A.2.3 MCU ordering)
    bw = _BitWriter()
    preds = [0] * len(planes)
    mcu_count = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                bw.flush()
                bw.buf += bytes([0xFF, 0xD0 + (rst % 8)])  # RSTn, unstuffed
                rst += 1
                preds = [0] * len(planes)
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

    # ---- marker segments
    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(
        0xFFE0, b"JFIF\x00\x01\x01\x00" + struct.pack(">HH", 1, 1) + bytes(2)
    )
    for tq, tab in ((0, lum_q), (1, chr_q)):
        if nc == 1 and tq == 1:
            continue
        out += seg(0xFFDB, bytes([tq]) + tab.reshape(64)[ZIGZAG].astype(np.uint8).tobytes())
    sof = bytearray(struct.pack(">BHHB", 8, h, w, len(planes)))
    for ci, (sh, sv) in enumerate(samps):
        sof += bytes([ci + 1, (sh << 4) | sv, qsel[ci]])
    out += seg(0xFFC0, bytes(sof))
    for tc_th, spec in (
        ((0 << 4) | 0, DC_LUM_SPEC),
        ((1 << 4) | 0, AC_LUM_SPEC),
        ((0 << 4) | 1, DC_CHR_SPEC),
        ((1 << 4) | 1, AC_CHR_SPEC),
    ):
        if nc == 1 and (tc_th & 0x0F) == 1:
            continue
        bits, vals = spec
        out += seg(0xFFC4, bytes([tc_th]) + bytes(bits) + bytes(vals))
    if restart_interval:
        out += seg(0xFFDD, struct.pack(">H", restart_interval))
    sos = bytearray([len(planes)])
    for ci in range(len(planes)):
        td_ta = 0x00 if ci == 0 else 0x11
        sos += bytes([ci + 1, td_ta])
    sos += bytes([0, 63, 0])  # Ss, Se, Ah/Al (baseline fixed)
    out += seg(0xFFDA, bytes(sos))
    out += bw.buf
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------- decoder


def _parse_segments(b: bytes):
    """Yield (marker, body, scan_start) walking the marker stream;
    stops at SOS (scan data handled separately) or EOI."""
    if not is_jpeg(b):
        raise JpegFormatError("not a JPEG (bad SOI)")
    pos = 2
    while pos + 2 <= len(b):
        if b[pos] != 0xFF:
            raise JpegFormatError(f"expected marker at offset {pos}")
        while pos + 1 < len(b) and b[pos + 1] == 0xFF:  # fill bytes
            pos += 1
        marker = b[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            return
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:  # standalone
            continue
        if pos + 2 > len(b):
            raise JpegFormatError("truncated segment header")
        seglen = struct.unpack(">H", b[pos : pos + 2])[0]
        if seglen < 2 or pos + seglen > len(b):
            raise JpegFormatError("truncated segment body")
        body = b[pos + 2 : pos + seglen]
        pos += seglen
        yield marker, body, pos
        if marker == 0xDA:  # SOS: caller takes over at scan_start=pos
            return


def _split_scan(b: bytes, start: int) -> list[bytes]:
    """Unstuff the entropy-coded data from ``start``; returns restart
    segments (RSTn boundaries split; 0xFF00 → 0xFF)."""
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
    return segs


def decode(data: bytes) -> np.ndarray:
    """Baseline JFIF bytes → uint8 array (height, width, channels)."""
    b = bytes(data)
    qtabs: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    frame = None  # (h, w, comps) where comps = [(id, sh, sv, tq)]
    scan = None  # ([(comp_idx, td, ta)], scan_start)
    restart_interval = 0

    for marker, body, after in _parse_segments(b):
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
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise JpegFormatError(f"{prec}-bit precision unsupported")
            comps = []
            for ci in range(nc):
                cid, hv, tq = body[6 + 3 * ci : 9 + 3 * ci]
                sh, sv = hv >> 4, hv & 0x0F
                if sh not in (1, 2) or sv not in (1, 2):
                    raise JpegFormatError(f"sampling factor {sh}x{sv} unsupported")
                comps.append((cid, sh, sv, tq))
            frame = (h, w, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise JpegFormatError(
                f"SOF{marker - 0xC0}: only baseline sequential (SOF0) supported"
            )
        elif marker == 0xCC:
            raise JpegFormatError("arithmetic coding unsupported")
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", body[:2])[0]
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise JpegFormatError("SOS before SOF")
            ns = body[0]
            sel = []
            cid_index = {c[0]: i for i, c in enumerate(frame[2])}
            for si in range(ns):
                cs, tdta = body[1 + 2 * si], body[2 + 2 * si]
                if cs not in cid_index:
                    raise JpegFormatError(f"scan references unknown component {cs}")
                sel.append((cid_index[cs], tdta >> 4, tdta & 0x0F))
            scan = (sel, after)

    if frame is None or scan is None:
        raise JpegFormatError("missing SOF/SOS")
    h, w, comps = frame
    sel, scan_start = scan
    if len(sel) != len(comps):
        raise JpegFormatError("non-interleaved multi-scan unsupported")

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    # per-component zigzag coefficient store: (blocks_y*blocks_x, 64)
    zz_store = []
    for _, sh, sv, _ in comps:
        zz_store.append(
            np.zeros((mcuy * sv * mcux * sh, 64), dtype=np.int64)
        )

    segments = _split_scan(b, scan_start)
    seg_idx = 0
    reader = _BitReader(segments[0])
    preds = [0] * len(comps)
    total_mcus = mcux * mcuy
    for mcu in range(total_mcus):
        if restart_interval and mcu and mcu % restart_interval == 0:
            seg_idx += 1  # RSTn boundary: new segment, reset predictors
            if seg_idx >= len(segments):
                raise JpegFormatError("missing restart segment in scan")
            reader = _BitReader(segments[seg_idx])
            preds = [0] * len(comps)
        my, mx = divmod(mcu, mcux)
        for ci, td, ta in sel:
            _, sh, sv, _tq = comps[ci]
            dct = huff.get((0, td))
            act = huff.get((1, ta))
            if dct is None or act is None:
                raise JpegFormatError("scan references missing Huffman table")
            row_blocks = mcux * sh
            for by in range(sv):
                for bx in range(sh):
                    zz = zz_store[ci][(my * sv + by) * row_blocks + (mx * sh + bx)]
                    t = reader.decode_symbol(dct)
                    diff = _extend(reader.read(t), t) if t else 0
                    preds[ci] += diff
                    zz[0] = preds[ci]
                    k = 1
                    while k <= 63:
                        rs = reader.decode_symbol(act)
                        r, s = rs >> 4, rs & 0x0F
                        if s == 0:
                            if r == 15:  # ZRL
                                k += 16
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            raise JpegFormatError("AC coefficient overrun")
                        zz[k] = _extend(reader.read(s), s)
                        k += 1

    # dequantize + IDCT per component, vectorized over all blocks
    planes = []
    for (cid, sh, sv, tq), zzs in zip(comps, zz_store):
        qtab = qtabs.get(tq)
        if qtab is None:
            raise JpegFormatError(f"missing quant table {tq}")
        coeffs = np.zeros_like(zzs, dtype=np.float64)
        coeffs[:, ZIGZAG] = zzs  # un-zigzag
        blocks = coeffs.reshape(-1, 8, 8) * qtab
        spatial = np.einsum("ji,njk,kl->nil", _C, blocks, _C) + 128.0
        by, bx = mcuy * sv, mcux * sh
        plane = (
            spatial.reshape(by, bx, 8, 8).transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)
        )
        # upsample to full resolution (sample replication) and crop
        ry, rx = vmax // sv, hmax // sh
        if ry > 1 or rx > 1:
            plane = plane.repeat(ry, axis=0).repeat(rx, axis=1)
        planes.append(plane[:h, :w])

    if len(planes) == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)[:, :, None]
    if len(planes) == 3:
        return _ycc_to_rgb(np.stack(planes, axis=-1))
    raise JpegFormatError(f"{len(planes)}-component images unsupported")
