"""Pure-Python PNG codec (decode/encode) from the public PNG
specification (W3C PNG, RFC 2083) — zlib + numpy only, no image libs.

Why it exists: the multimodal pipeline's decode stage was a
NotImplementedError/deterministic-fake stub because the container has
no Pillow/libvips. PNG needs neither: the container format is chunks,
the compression is zlib (stdlib), and the five scanline filters are
~60 lines. With this module, ``decode_image`` / ``resize_image`` /
``extract_features`` operate on REAL pixels for PNG payloads; other
formats (JPEG etc.) keep the documented stub until a codec lib is
wired in production.

Supported: 8-bit depth, color types 0 (gray), 2 (RGB), 4 (gray+alpha),
6 (RGBA), non-interlaced. Rejected loudly: palette images, 1/2/4/16-bit
depths, interlacing (PngFormatError).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from ..errors import RqError

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

#: color type → samples per pixel
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


class PngFormatError(RqError):
    """Malformed or unsupported-profile PNG."""


def is_png(data: bytes) -> bool:
    return bytes(data[:8]) == PNG_MAGIC


def _chunks(data: bytes):
    pos = 8
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise PngFormatError("truncated chunk body")
        crc = data[pos + 8 + length : pos + 12 + length]
        if len(crc) != 4:
            raise PngFormatError("truncated chunk CRC")
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != struct.unpack(">I", crc)[0]:
            raise PngFormatError(f"chunk CRC mismatch in {ctype!r}")
        yield ctype, body
        pos += 12 + length


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode(data: bytes) -> np.ndarray:
    """PNG bytes → uint8 array of shape (height, width, channels)."""
    if not is_png(data):
        raise PngFormatError("not a PNG (bad signature)")
    width = height = None
    channels = 0
    idat = bytearray()
    for ctype, body in _chunks(data):
        if ctype == b"IHDR":
            width, height, depth, color, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8:
                raise PngFormatError(f"unsupported bit depth {depth} (8 only)")
            if color not in _CHANNELS:
                raise PngFormatError(f"unsupported color type {color}")
            if interlace:
                raise PngFormatError("interlaced PNG unsupported")
            channels = _CHANNELS[color]
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
    if width is None:
        raise PngFormatError("missing IHDR")
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:
        raise PngFormatError(f"IDAT corrupt: {e}") from e
    stride = width * channels
    if len(raw) != (stride + 1) * height:
        raise PngFormatError("decompressed size mismatch")

    out = np.empty((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    bpp = channels
    for y in range(height):
        ftype = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).copy()
        if ftype == 0:  # None
            recon = line
        elif ftype == 1:  # Sub
            recon = line
            for i in range(bpp, stride):
                recon[i] = (int(recon[i]) + int(recon[i - bpp])) & 0xFF
        elif ftype == 2:  # Up
            recon = (line.astype(np.int16) + prev).astype(np.uint8)
        elif ftype == 3:  # Average
            recon = line
            for i in range(stride):
                a = int(recon[i - bpp]) if i >= bpp else 0
                recon[i] = (int(line[i]) + (a + int(prev[i])) // 2) & 0xFF
        elif ftype == 4:  # Paeth
            recon = line
            for i in range(stride):
                a = int(recon[i - bpp]) if i >= bpp else 0
                c = int(prev[i - bpp]) if i >= bpp else 0
                recon[i] = (int(line[i]) + _paeth(a, int(prev[i]), c)) & 0xFF
        else:
            raise PngFormatError(f"unknown filter type {ftype} on row {y}")
        out[y] = recon
        prev = out[y]
    return out.reshape(height, width, channels)


def encode(arr: np.ndarray) -> bytes:
    """uint8 (H, W) or (H, W, C) array → PNG bytes (filter 0, one IDAT)."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    if a.ndim != 3 or a.shape[2] not in (1, 2, 3, 4):
        raise PngFormatError(f"unsupported array shape {a.shape}")
    h, w, c = a.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    raw = b"".join(b"\x00" + a[y].tobytes() for y in range(h))
    idat = zlib.compress(raw, 9)

    def chunk(ctype: bytes, body: bytes) -> bytes:
        crc = zlib.crc32(ctype + body) & 0xFFFFFFFF
        return struct.pack(">I", len(body)) + ctype + body + struct.pack(">I", crc)

    return (
        PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )


def resize_nearest(arr: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resample (the lib-free resize kernel)."""
    h, w = arr.shape[:2]
    ys = np.minimum((np.arange(height) * h) // height, h - 1)
    xs = np.minimum((np.arange(width) * w) // width, w - 1)
    return arr[ys][:, xs]
