"""Pure-Python GIF codec (decode/encode) from the public GIF89a
specification (CompuServe/W3C "GRAPHICS INTERCHANGE FORMAT Version
89a", 1990) — numpy + stdlib only, no image libs.

Why it exists: with PNG (operators/png.py) and baseline JPEG
(operators/jpeg.py) decoding real pixels, GIF was the last sniffed
image format whose payloads stopped at header dimensions. GIF needs
no external codec either: the container is a short descriptor
grammar and the compression is the original variable-code-width LZW
(~80 lines each way).

Supported: GIF87a and GIF89a; global and local color tables;
interlaced images (the 4-pass row ordering, spec appendix E);
extension blocks are walked and skipped (Graphic Control transparency
is applied as the conventional "transparent index renders as the
background color" — GIF has no alpha channel, and the multimodal
pipeline's arrays are RGB). ``decode`` returns the first image;
``decode_frames`` composites EVERY frame of an animated GIF onto the
logical-screen canvas honoring the Graphic Control disposal methods
(none/keep, restore-to-background, restore-to-previous), and
``encode_animation`` writes a multi-frame GIF89a with per-frame
GCEs — fixtures for the frame-sampling operator. Rejected loudly:
truncated streams, missing color tables, LZW code overflow past the
12-bit limit.

Decode returns (height, width, 3) uint8 RGB — palette indices mapped
through the active color table with one numpy take per image. The
LZW inner loop is sequential by nature (each code may reference the
string built by the previous one); it runs per-code with list-append
chunks, O(output bytes), the same CPython-floor profile as PNG's
Paeth row (png.py module docstring) — acceptable because decode is
payload-parallel inside Arrow-batched mapInPandas.

Encode writes a GIF89a with a 256-entry global color table built by
exact-color assignment (≤256 distinct RGB colors required — this is
a codec for fixtures and round-trip property tests, not a quantizer;
>256-color images raise, callers quantize first) and real LZW
compression with dictionary reset at 4096 entries.
"""

from __future__ import annotations

import struct

import numpy as np

from ..errors import RqError

_MAGICS = (b"GIF87a", b"GIF89a")


class GifFormatError(RqError):
    """Malformed or unsupported-profile GIF."""


def is_gif(data: bytes) -> bool:
    return data[:6] in _MAGICS


# --------------------------------------------------------------------------
# bit-level LZW (GIF flavor: variable code width 3..12, LSB-first)
# --------------------------------------------------------------------------


def _lzw_decode(min_code_size: int, data: bytes) -> bytes:
    """GIF-LZW decompress (spec appendix F). Codes are packed
    LSB-first; width starts at min_code_size+1 and grows when the
    dictionary reaches 2**width, capping at 12 bits until a CLEAR."""
    clear = 1 << min_code_size
    eoi = clear + 1

    # dictionary as immutable bytes entries; indices 0..clear-1 are roots
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    width = min_code_size + 1
    out: list[bytes] = []
    prev: bytes | None = None

    acc = nbits = 0
    pos = 0
    n = len(data)
    while True:
        while nbits < width:
            if pos >= n:
                # streams lacking an explicit EOI terminate at data end
                return b"".join(out)
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width

        if code == clear:
            table = list(base)
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            return b"".join(out)

        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]  # the KwKwK case
        else:
            raise GifFormatError(f"gif: LZW code {code} out of range")
        out.append(entry)
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1


def _lzw_encode(min_code_size: int, pixels: bytes) -> bytes:
    """GIF-LZW compress with the standard dictionary-reset-at-4096
    policy; always emits a leading CLEAR and a trailing EOI."""
    clear = 1 << min_code_size
    eoi = clear + 1

    def fresh() -> dict[bytes, int]:
        return {bytes([i]): i for i in range(clear)}

    table = fresh()
    next_code = eoi + 1
    width = min_code_size + 1

    out = bytearray()
    acc = nbits = 0

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    w = b""
    for i in range(len(pixels)):
        c = pixels[i : i + 1]
        wc = w + c
        if wc in table:
            w = wc
            continue
        emit(table[w])
        table[wc] = next_code
        # width grows when next_code EXCEEDS the current range: the
        # decoder bumps after appending the entry for the code we just
        # emitted, so encoder and decoder stay in lockstep
        if next_code == (1 << width) and width < 12:
            width += 1
        next_code += 1
        if next_code > 4095:  # 12-bit code space exhausted: 4095 was the
            # last assignable slot, so reset before the next assignment
            emit(clear)
            table = fresh()
            next_code = eoi + 1
            width = min_code_size + 1
        w = c
    if w:
        emit(table[w])
    emit(eoi)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


# --------------------------------------------------------------------------
# container walk
# --------------------------------------------------------------------------


def _sub_blocks(b: bytes, pos: int) -> tuple[bytes, int]:
    """Concatenate the sub-block chain starting at pos; return
    (payload, position after the 0x00 terminator)."""
    parts = []
    n = len(b)
    while True:
        if pos >= n:
            raise GifFormatError("gif: truncated sub-block chain")
        ln = b[pos]
        pos += 1
        if ln == 0:
            return b"".join(parts), pos
        if pos + ln > n:
            raise GifFormatError("gif: truncated sub-block")
        parts.append(b[pos : pos + ln])
        pos += ln


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))  # (start row, step)


def header_dims(data: bytes) -> tuple[int, int, int] | None:
    """(width, height, 3) from the logical screen descriptor, or None
    if not a GIF. O(header) — never touches pixel data."""
    if not is_gif(data) or len(data) < 10:
        return None
    w, h = struct.unpack_from("<HH", data, 6)
    if w == 0 or h == 0:
        return None
    return w, h, 3


def _iter_images(data: bytes):
    """Parse the container: yield ((sw, sh, bg_rgb) once via the first
    tuple element) ... implemented as a generator over image records
    (left, top, idx_2d, color_table, transparent, disposal) after an
    initial (sw, sh, bg) header record."""
    if not is_gif(data):
        raise GifFormatError("gif: bad signature")
    if len(data) < 13:
        raise GifFormatError("gif: truncated header")
    sw, sh, packed, bg_idx, _aspect = struct.unpack_from("<HHBBB", data, 6)
    pos = 13
    gct = None
    if packed & 0x80:
        gct_len = 2 << (packed & 0x07)
        end = pos + 3 * gct_len
        if end > len(data):
            raise GifFormatError("gif: truncated global color table")
        gct = np.frombuffer(data[pos:end], dtype=np.uint8).reshape(-1, 3)
        pos = end
    bg = (
        gct[bg_idx]
        if (gct is not None and bg_idx < len(gct))
        else np.zeros(3, dtype=np.uint8)
    )
    yield ("header", sw, sh, bg)

    transparent = None
    disposal = 0
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            return
        if block == 0x21:  # extension: label byte + sub-block chain
            if pos >= len(data):
                raise GifFormatError("gif: truncated extension")
            label = data[pos]
            pos += 1
            body, pos = _sub_blocks(data, pos)
            if label == 0xF9 and len(body) >= 4:
                disposal = (body[0] >> 2) & 0x07
                transparent = body[3] if body[0] & 0x01 else None
            continue
        if block != 0x2C:
            raise GifFormatError(f"gif: unknown block 0x{block:02x}")

        if pos + 9 > len(data):
            raise GifFormatError("gif: truncated image descriptor")
        left, top, iw, ih, ipacked = struct.unpack_from("<HHHHB", data, pos)
        pos += 9
        ct = gct
        if ipacked & 0x80:
            lct_len = 2 << (ipacked & 0x07)
            end = pos + 3 * lct_len
            if end > len(data):
                raise GifFormatError("gif: truncated local color table")
            ct = np.frombuffer(data[pos:end], dtype=np.uint8).reshape(-1, 3)
            pos = end
        if ct is None:
            raise GifFormatError("gif: image has no color table")
        if pos >= len(data):
            raise GifFormatError("gif: missing LZW minimum code size")
        min_code = data[pos]
        pos += 1
        if not 2 <= min_code <= 11:
            raise GifFormatError(f"gif: bad LZW minimum code size {min_code}")
        lzw, pos = _sub_blocks(data, pos)
        idx = np.frombuffer(_lzw_decode(min_code, lzw), dtype=np.uint8)
        if idx.size < iw * ih:
            raise GifFormatError(
                f"gif: LZW stream yields {idx.size} pixels, need {iw * ih}"
            )
        idx = idx[: iw * ih].reshape(ih, iw)
        if ipacked & 0x40:  # interlaced: rows arrive in 4-pass order
            rows = np.empty(ih, dtype=np.int64)
            k = 0
            for start, step in _INTERLACE_PASSES:
                for r in range(start, ih, step):
                    rows[r] = k
                    k += 1
            idx = idx[rows]
        if np.any(idx >= len(ct)):
            raise GifFormatError("gif: palette index out of range")
        yield ("image", left, top, idx, ct, transparent, disposal)
        transparent = None
        disposal = 0
    raise GifFormatError("gif: truncated stream (no trailer)")


def decode(data: bytes) -> np.ndarray:
    """Decode the first image of a GIF to (height, width, 3) uint8
    RGB. The image is composited onto the logical screen at its
    (left, top) offset over the background color; a Graphic Control
    transparent index renders as the background."""
    it = _iter_images(data)
    _, sw, sh, bg = next(it)
    for rec in it:
        _, left, top, idx, ct, transparent, _disposal = rec
        ih, iw = idx.shape
        rgb = ct[idx]  # one vectorized palette take
        if transparent is not None and transparent < len(ct):
            rgb = np.where((idx == transparent)[..., None], bg, rgb)
        out = np.empty((sh, sw, 3), dtype=np.uint8)
        out[:] = bg
        y0, x0 = min(top, sh), min(left, sw)
        y1, x1 = min(top + ih, sh), min(left + iw, sw)
        out[y0:y1, x0:x1] = rgb[: y1 - y0, : x1 - x0]
        return out
    raise GifFormatError("gif: no image descriptor")


def decode_frames(data: bytes, max_frames: int | None = None) -> list[np.ndarray]:
    """Decode ALL frames of a (possibly animated) GIF as composited
    (sh, sw, 3) uint8 RGB canvases — what a viewer would display at
    each frame, honoring the Graphic Control disposal methods:
    0/1 leave the canvas, 2 restores the frame's region to the
    background color, 3 restores it to the previous canvas. A
    transparent index inside an animation frame shows the canvas
    underneath (unlike the single-image case, where there is nothing
    underneath but background). Stops after max_frames if given."""
    it = _iter_images(data)
    _, sw, sh, bg = next(it)
    canvas = np.empty((sh, sw, 3), dtype=np.uint8)
    canvas[:] = bg
    frames: list[np.ndarray] = []
    for rec in it:
        _, left, top, idx, ct, transparent, disposal = rec
        ih, iw = idx.shape
        y0, x0 = min(top, sh), min(left, sw)
        y1, x1 = min(top + ih, sh), min(left + iw, sw)
        if disposal == 3:
            saved = canvas[y0:y1, x0:x1].copy()
        rgb = ct[idx][: y1 - y0, : x1 - x0]
        region = canvas[y0:y1, x0:x1]
        if transparent is not None and transparent < len(ct):
            keep = (idx == transparent)[: y1 - y0, : x1 - x0, None]
            region[:] = np.where(keep, region, rgb)
        else:
            region[:] = rgb
        frames.append(canvas.copy())
        if max_frames is not None and len(frames) >= max_frames:
            return frames
        if disposal == 2:
            canvas[y0:y1, x0:x1] = bg
        elif disposal == 3:
            canvas[y0:y1, x0:x1] = saved
    if not frames:
        raise GifFormatError("gif: no image descriptor")
    return frames


def encode_animation(
    frames: list[np.ndarray], disposals: list[int] | None = None
) -> bytes:
    """Encode full-canvas RGB frames as an animated GIF89a: one global
    color table over the union of all frames' colors (≤256 or raise),
    a Graphic Control Extension per frame (delay 0, the given disposal
    method, default 1 = keep). Frames must share one (h, w, 3)."""
    if not frames:
        raise GifFormatError("gif encode_animation: no frames")
    fs = [np.asarray(f, dtype=np.uint8) for f in frames]
    if any(f.shape != fs[0].shape or f.ndim != 3 or f.shape[2] != 3 for f in fs):
        raise GifFormatError("gif encode_animation: frames must share (h,w,3)")
    h, w = fs[0].shape[:2]
    stacked = np.concatenate([f.reshape(-1, 3) for f in fs])
    colors, inv = np.unique(stacked, axis=0, return_inverse=True)
    if len(colors) > 256:
        raise GifFormatError(
            f"gif encode_animation: {len(colors)} distinct colors > 256"
        )
    ct_bits = max(1, int(np.ceil(np.log2(max(len(colors), 2)))))
    ct = np.zeros((1 << ct_bits, 3), dtype=np.uint8)
    ct[: len(colors)] = colors
    idx_frames = inv.reshape(len(fs), h * w)
    disposals = disposals or [1] * len(fs)

    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HHBBB", w, h, 0x80 | ((ct_bits - 1) & 0x07) | 0x70, 0, 0)
    out += ct.tobytes()
    min_code = max(2, ct_bits)
    for fi, idx in enumerate(idx_frames):
        d = disposals[fi] & 0x07
        out += bytes([0x21, 0xF9, 0x04, d << 2, 0x00, 0x00, 0x00, 0x00])
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
        out.append(min_code)
        lzw = _lzw_encode(min_code, idx.astype(np.uint8).tobytes())
        for i in range(0, len(lzw), 255):
            chunk = lzw[i : i + 255]
            out.append(len(chunk))
            out += chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)


def encode(arr: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array (or (h, w) grayscale) as a
    non-interlaced GIF89a with an exact-color global table. Images
    with more than 256 distinct colors raise (quantize first)."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = np.stack([a] * 3, axis=-1)
    if a.ndim != 3 or a.shape[2] != 3:
        raise GifFormatError(f"gif encode: want (h,w,3) RGB, got {a.shape}")
    h, w = a.shape[:2]
    flat = a.reshape(-1, 3)
    colors, idx = np.unique(flat, axis=0, return_inverse=True)
    if len(colors) > 256:
        raise GifFormatError(
            f"gif encode: {len(colors)} distinct colors > 256 (quantize first)"
        )
    # color table length must be a power of two ≥ 2
    ct_bits = max(1, int(np.ceil(np.log2(max(len(colors), 2)))))
    ct = np.zeros((1 << ct_bits, 3), dtype=np.uint8)
    ct[: len(colors)] = colors

    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HHBBB", w, h, 0x80 | ((ct_bits - 1) & 0x07) | 0x70, 0, 0)
    out += ct.tobytes()
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
    min_code = max(2, ct_bits)
    out.append(min_code)
    lzw = _lzw_encode(min_code, idx.astype(np.uint8).tobytes())
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)
