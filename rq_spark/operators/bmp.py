"""Pure-numpy BMP codec (decode/encode) from the public Windows
bitmap file format layout (BITMAPFILEHEADER + BITMAPINFOHEADER, the
format every graphics text documents) — no image libs.

Why it exists: PNG, JPEG, and GIF payloads decode to real pixels
(operators/png.py, jpeg.py, gif.py); BMP was the last format the
multimodal stages could only header-sniff. It is also the simplest:
uncompressed BI_RGB pixel rows, bottom-up by default, each row padded
to a 4-byte boundary — one numpy reshape-and-slice per image, no
entropy coding at all.

Supported: BITMAPINFOHEADER-family DIB headers (sizes 40/52/56/108/
124) with BI_RGB (compression 0): 24-bit BGR, 32-bit BGRX/BGRA, and
8-bit palettized; bottom-up (positive height) and top-down (negative
height) row orders. Rejected loudly: RLE/bitfields compression,
other bit depths, and the OS/2 CORE header (dims parse via
multimodal._bmp_dims; pixel decode of a 1990s OS/2 profile is not
worth carrying).

Decode returns (height, width, channels) uint8 with channels in RGB
or RGBA order (BMP stores BGR on disk; the swap is a numpy stride
flip). Encode writes 24-bit bottom-up BI_RGB, the profile every
reader accepts.
"""

from __future__ import annotations

import struct

import numpy as np

from ..errors import RqError


class BmpFormatError(RqError):
    """Malformed or unsupported-profile BMP."""


def is_bmp(data: bytes) -> bool:
    """Magic + zeroed reserved fields + known DIB size — the 2-byte
    'BM' alone would match ordinary text (see multimodal._bmp_dims)."""
    return (
        len(data) >= 30
        and data[:2] == b"BM"
        and data[6:10] == bytes(4)
        and int.from_bytes(data[14:18], "little") in (40, 52, 56, 108, 124)
    )


def decode(data: bytes) -> np.ndarray:
    """Decode a BI_RGB BMP to (height, width, channels) uint8,
    channels RGB (24-bit, 8-bit palette) or RGBA (32-bit)."""
    if not is_bmp(data):
        raise BmpFormatError("bmp: bad signature or unsupported DIB header")
    pix_off = int.from_bytes(data[10:14], "little")
    dib = int.from_bytes(data[14:18], "little")
    width = int.from_bytes(data[18:22], "little", signed=True)
    raw_h = int.from_bytes(data[22:26], "little", signed=True)
    planes = int.from_bytes(data[26:28], "little")
    bits = int.from_bytes(data[28:30], "little")
    comp = int.from_bytes(data[30:34], "little") if len(data) >= 34 else 0
    if planes != 1:
        raise BmpFormatError(f"bmp: planes must be 1, got {planes}")
    if comp != 0:
        raise BmpFormatError(
            f"bmp: only BI_RGB (uncompressed) supported, got compression {comp}"
        )
    if bits not in (8, 24, 32):
        raise BmpFormatError(f"bmp: unsupported bit depth {bits}")
    if width <= 0 or raw_h == 0:
        raise BmpFormatError(f"bmp: bad dimensions {width}x{raw_h}")
    height = abs(raw_h)
    top_down = raw_h < 0

    stride = (width * (bits // 8) + 3) & ~3  # rows pad to 4 bytes
    need = pix_off + stride * height
    if len(data) < need:
        raise BmpFormatError(
            f"bmp: truncated pixel array ({len(data)} bytes, need {need})"
        )
    rows = np.frombuffer(data, dtype=np.uint8, count=stride * height, offset=pix_off)
    rows = rows.reshape(height, stride)[:, : width * (bits // 8)]
    if not top_down:
        rows = rows[::-1]

    if bits == 8:
        # color table: 4-byte BGRX entries between the DIB header and
        # the pixel array
        n_colors = int.from_bytes(data[46:50], "little") if dib >= 40 else 0
        if n_colors == 0:
            n_colors = 256
        tbl_off = 14 + dib
        tbl = np.frombuffer(
            data, dtype=np.uint8, count=4 * n_colors, offset=tbl_off
        ).reshape(-1, 4)[:, :3][:, ::-1]  # BGRX → RGB
        idx = rows
        if int(idx.max(initial=0)) >= len(tbl):
            raise BmpFormatError("bmp: palette index out of range")
        return np.ascontiguousarray(tbl[idx])
    px = rows.reshape(height, width, bits // 8)
    if bits == 24:
        return np.ascontiguousarray(px[:, :, ::-1])  # BGR → RGB
    # 32-bit BGRA → RGBA
    return np.ascontiguousarray(px[:, :, [2, 1, 0, 3]])


def encode(arr: np.ndarray) -> bytes:
    """Encode (h, w, 3) RGB / (h, w, 4) RGBA (alpha dropped — 24-bit
    BI_RGB is the universally-read profile) / (h, w) grayscale."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = np.stack([a] * 3, axis=-1)
    if a.ndim != 3 or a.shape[2] not in (3, 4):
        raise BmpFormatError(f"bmp encode: want (h,w,3|4), got {a.shape}")
    a = a[:, :, :3]
    h, w = a.shape[:2]
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = a[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up, RGB→BGR
    pix = rows.tobytes()
    header = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + len(pix), 0, 0, 14 + 40
    ) + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pix), 2835, 2835, 0, 0)
    return header + pix
