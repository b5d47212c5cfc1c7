"""Pure-Python PNG codec (decode/encode) from the public PNG
specification (W3C PNG, RFC 2083) — zlib + numpy only, no image libs.

Why it exists: the multimodal pipeline's decode stage was a
NotImplementedError/deterministic-fake stub because the container has
no Pillow/libvips. PNG needs neither: the container format is chunks,
the compression is zlib (stdlib), and the five scanline filters are
~60 lines. With this module, ``decode_image`` / ``resize_image`` /
``extract_features`` operate on REAL pixels for PNG payloads; other
formats keep the documented stub until a codec lib is wired in
production (JPEG has its own spec codec in operators/jpeg.py).

Supported (r6 widened): bit depths 1/2/4/8/16; color types 0 (gray),
2 (RGB), 3 (palette, PLTE), 4 (gray+alpha), 6 (RGBA); both
non-interlaced and Adam7-interlaced images (each interlace pass is an
independently filtered sub-image, decoded and scattered onto the
output grid). Sub-byte grayscale is scaled to 8-bit by bit
replication (x * 255/(2^d-1), exact); 16-bit samples are reduced to
8-bit via the high byte (libpng's classic 16→8 strip). Rejected
loudly: depth/color combinations the spec disallows (PNG spec table
11.1) and unknown interlace methods.

Performance (r6): scanline un-filtering is the codec's hot loop.
Filter 1 (Sub) is a per-byte-lane mod-256 prefix sum → one uint8
cumsum per lane, fully vectorized. Filters 3/4 (Average/Paeth) are
inherently sequential in x (each pixel needs the just-reconstructed
left neighbor — a true data dependency, so no exact vectorization
exists; a speculative whole-image fixed-point iteration was measured
and converges in exactly height+width passes, i.e. never pays off).
The Paeth loop instead runs per byte-lane with a local accumulator
and a precomputed 16 MiB predictor table P[b<<16|c<<8|a] stored as a
``bytes`` object (C-speed subscript, built lazily on first Paeth row,
~1 s once per process), unrolled 4×. Measured on a 200×200 RGB
all-Paeth fixture: 0.78 µs/byte (r5 per-element numpy indexing) →
0.18 µs/byte, a 4.4× speedup on an idle machine (~2.9× under heavy
co-tenant load — the table's random 16 MiB working set is
cache-contention-sensitive) — at the CPython floor, where the cost
is the interpreter's per-element machinery (one large-int index
allocation + one bytes subscript + add/mask/append ≈ 170 ns), not the
arithmetic. Beating ~4.5× requires a compiled kernel, which this
environment doesn't have; at scale the real lever is payload-level
parallelism (decode runs inside Arrow-batched mapInPandas, one image
per core) plus bounded payload sizes. The ENCODE direction is fully
vectorized for all five filters: filtering predicts from ORIGINAL
bytes, so there is no sequential dependency.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from ..errors import RqError

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

#: color type → samples per pixel (palette rows carry 1 index sample)
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}

#: color type → allowed bit depths (PNG spec table 11.1)
_DEPTHS = {
    0: (1, 2, 4, 8, 16),
    2: (8, 16),
    3: (1, 2, 4, 8),
    4: (8, 16),
    6: (8, 16),
}


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


#: lazily-built flat predictor table: _PAETH_TABLE[b<<16 | c<<8 | a]
#: = paeth(a, b, c). 16 MiB as an immutable ``bytes`` so the hot loop
#: pays one C-speed subscript instead of a Python _paeth() call.
#: Idempotent build — a concurrent first call in two executor threads
#: just builds it twice and one result wins.
_PAETH_TABLE: bytes | None = None


def _paeth_table() -> bytes:
    global _PAETH_TABLE
    if _PAETH_TABLE is None:
        b = np.arange(256, dtype=np.int16)[:, None, None]
        c = np.arange(256, dtype=np.int16)[None, :, None]
        a = np.arange(256, dtype=np.int16)[None, None, :]
        p = a + b - c
        pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
        full = (256, 256, 256)
        pred = np.where(
            (pa <= pb) & (pa <= pc),
            np.broadcast_to(a, full),
            np.where(pb <= pc, np.broadcast_to(b, full), np.broadcast_to(c, full)),
        )
        _PAETH_TABLE = pred.astype(np.uint8).tobytes()
    return _PAETH_TABLE


def header_dims(data: bytes) -> tuple[int, int, int] | None:
    """(width, height, channels) from IHDR alone — the metadata fast
    path (CRC-checked, no pixel inflate). None if not a PNG; raises
    on an unsupported profile so dispatch stays loud. At scale this is
    what a dims-only decode stage should pay: O(header), not
    O(pixels)."""
    if not is_png(data):
        return None
    for ctype, body in _chunks(data):
        if ctype != b"IHDR":
            raise PngFormatError("first chunk is not IHDR")
        width, height, depth, color, _comp, _filt, interlace = struct.unpack(
            ">IIBBBBB", body
        )
        if color not in _CHANNELS:
            raise PngFormatError(f"unsupported color type {color}")
        if depth not in _DEPTHS[color]:
            raise PngFormatError(f"invalid bit depth {depth} for color type {color}")
        if interlace not in (0, 1):
            raise PngFormatError(f"unknown interlace method {interlace}")
        # palette expands to RGB; gray/alpha report their sample count
        return width, height, 3 if color == 3 else _CHANNELS[color]
    raise PngFormatError("missing IHDR")


def _unfilter(raw: bytes, height: int, stride: int, bpp: int) -> np.ndarray:
    """Reverse the five scanline filters → (height, stride) raw bytes.

    Within a row, the Paeth/Average recurrences stay inside one byte
    lane (a, b, c are all at positions ≡ i mod bpp), so each lane is
    an independent chain driven by a local accumulator — no list
    indexing in the hot loop, predictor via the flat bytes table."""
    out = np.empty((height, stride), dtype=np.uint8)
    rowlen = stride + 1
    prev = np.zeros(stride, dtype=np.uint8)
    w = stride // bpp  # stride is always a multiple of bpp
    for y in range(height):
        ftype = raw[y * rowlen]
        line = np.frombuffer(raw, np.uint8, stride, y * rowlen + 1)
        row = out[y]
        if ftype == 0:  # None
            row[:] = line
        elif ftype == 1:  # Sub: recon[i] = line[i] + recon[i-bpp]
            # per-lane mod-256 prefix sum (uint8 cumsum wraps exactly)
            row[:] = line
            for r in range(bpp):
                lane = row[r::bpp]
                lane[:] = np.cumsum(lane, dtype=np.uint8)
        elif ftype == 2:  # Up (uint8 add wraps mod 256)
            np.add(line, prev, out=row)
        elif ftype == 3:  # Average — per-lane chain, local accumulator
            xs_all = line.reshape(w, bpp).T.tolist()
            bs_all = prev.reshape(w, bpp).T.tolist()
            for r in range(bpp):
                acc = 0
                lane: list[int] = []
                ap = lane.append
                for x, b_ in zip(xs_all[r], bs_all[r]):
                    acc = (x + ((acc + b_) >> 1)) & 0xFF
                    ap(acc)
                row[r::bpp] = lane
        elif ftype == 4:  # Paeth — per-lane chain, table predictor
            P = _paeth_table()
            b_full = prev.astype(np.int32)
            c_full = np.zeros(stride, np.int32)
            c_full[bpp:] = b_full[:-bpp]
            bc_all = ((b_full << 16) | (c_full << 8)).reshape(w, bpp).T.tolist()
            xs_all = line.reshape(w, bpp).T.tolist()
            for r in range(bpp):
                xs = xs_all[r]
                bc = bc_all[r]
                acc = 0
                lane = []
                ap = lane.append
                n4 = len(xs) // 4 * 4
                # 4× unrolled: the loop machinery is a third of the cost
                for x0, i0, x1, i1, x2, i2, x3, i3 in zip(
                    xs[0:n4:4], bc[0:n4:4], xs[1:n4:4], bc[1:n4:4],
                    xs[2:n4:4], bc[2:n4:4], xs[3:n4:4], bc[3:n4:4],
                ):
                    acc = (x0 + P[i0 + acc]) & 0xFF
                    ap(acc)
                    acc = (x1 + P[i1 + acc]) & 0xFF
                    ap(acc)
                    acc = (x2 + P[i2 + acc]) & 0xFF
                    ap(acc)
                    acc = (x3 + P[i3 + acc]) & 0xFF
                    ap(acc)
                for j in range(n4, len(xs)):
                    acc = (xs[j] + P[bc[j] + acc]) & 0xFF
                    ap(acc)
                row[r::bpp] = lane
        else:
            raise PngFormatError(f"unknown filter type {ftype} on row {y}")
        prev = row
    return out


#: Adam7 interlace passes (PNG spec 8.2): (y0, x0, dy, dx)
_ADAM7 = (
    (0, 0, 8, 8),
    (0, 4, 8, 8),
    (4, 0, 8, 4),
    (0, 2, 4, 4),
    (2, 0, 4, 2),
    (0, 1, 2, 2),
    (1, 0, 2, 1),
)


def _to_samples(
    rows: np.ndarray, h: int, w: int, depth: int, channels: int
) -> np.ndarray:
    """Unfiltered byte rows → raw uint8 samples (h, w, channels).
    Sub-byte samples come back UNSCALED (gray scaling / palette lookup
    happen once on the assembled image); 16-bit keeps the high byte."""
    if depth == 8:
        return rows.reshape(h, w, channels)
    if depth == 16:  # big-endian sample pairs → keep the high byte
        return np.ascontiguousarray(rows.reshape(h, w, channels, 2)[..., 0])
    # 1/2/4-bit: color types 0 and 3 only (1 sample per pixel)
    bits = np.unpackbits(rows, axis=1)[:, : w * depth]
    weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint8)
    samples = (bits.reshape(h, w, depth) * weights).sum(axis=2, dtype=np.uint16)
    return samples.astype(np.uint8)[:, :, None]


def decode(data: bytes) -> np.ndarray:
    """PNG bytes → uint8 array of shape (height, width, channels).

    Palette images come back expanded to RGB; sub-byte grayscale is
    scaled to 8-bit by bit replication; 16-bit is high-byte-stripped.
    Adam7-interlaced images decode pass-by-pass (each pass is an
    independently filtered sub-image scattered onto the output grid).
    """
    if not is_png(data):
        raise PngFormatError("not a PNG (bad signature)")
    width = height = None
    depth = color = channels = interlace = 0
    plte: np.ndarray | None = None
    idat = bytearray()
    for ctype, body in _chunks(data):
        if ctype == b"IHDR":
            width, height, depth, color, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if color not in _CHANNELS:
                raise PngFormatError(f"unsupported color type {color}")
            if depth not in _DEPTHS[color]:
                raise PngFormatError(
                    f"invalid bit depth {depth} for color type {color}"
                )
            if interlace not in (0, 1):
                raise PngFormatError(f"unknown interlace method {interlace}")
            channels = _CHANNELS[color]
        elif ctype == b"PLTE":
            if len(body) % 3 or not 3 <= len(body) <= 768:
                raise PngFormatError(f"bad PLTE length {len(body)}")
            plte = np.frombuffer(body, np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
    if width is None:
        raise PngFormatError("missing IHDR")
    if color == 3 and plte is None:
        raise PngFormatError("palette image missing PLTE chunk")
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:
        raise PngFormatError(f"IDAT corrupt: {e}") from e
    bits_pp = depth * channels
    bpp = max(1, bits_pp // 8)

    def decode_block(offset: int, h: int, w: int) -> tuple[np.ndarray, int]:
        stride = (w * bits_pp + 7) // 8
        need = (stride + 1) * h
        block = raw[offset : offset + need]
        if len(block) != need:
            raise PngFormatError("decompressed size mismatch")
        return _to_samples(_unfilter(block, h, stride, bpp), h, w, depth, channels), (
            offset + need
        )

    if interlace == 0:
        px, end = decode_block(0, height, width)
    else:  # Adam7: 7 independently-filtered sub-images
        px = np.zeros((height, width, channels), dtype=np.uint8)
        end = 0
        for y0, x0, dy, dx in _ADAM7:
            hp = -(-(height - y0) // dy) if height > y0 else 0
            wp = -(-(width - x0) // dx) if width > x0 else 0
            if hp == 0 or wp == 0:  # empty pass contributes no bytes
                continue
            sub, end = decode_block(end, hp, wp)
            px[y0::dy, x0::dx] = sub
    if end != len(raw):
        raise PngFormatError("decompressed size mismatch")

    if color == 3:
        idx = px[..., 0]
        if int(idx.max(initial=0)) >= len(plte):
            raise PngFormatError("palette index out of range")
        return plte[idx]  # (h, w, 3)
    if color == 0 and depth < 8:  # bit replication == exact scaling
        return (px.astype(np.uint16) * (255 // ((1 << depth) - 1))).astype(np.uint8)
    return px


def _filter_rows(rows: np.ndarray, bpp: int, filter_type: int) -> np.ndarray:
    """Apply one scanline filter to every row — fully vectorized
    (filter predictors use ORIGINAL bytes, unlike un-filtering)."""
    if filter_type == 0:
        return rows
    left = np.zeros_like(rows)
    left[:, bpp:] = rows[:, :-bpp]
    up = np.zeros_like(rows)
    up[1:] = rows[:-1]
    if filter_type == 1:
        return rows - left  # uint8 wraps mod 256
    if filter_type == 2:
        return rows - up
    if filter_type == 3:
        return rows - ((left.astype(np.uint16) + up) >> 1).astype(np.uint8)
    if filter_type == 4:
        ul = np.zeros_like(rows)
        ul[1:, bpp:] = rows[:-1, :-bpp]
        a = left.astype(np.int16)
        b = up.astype(np.int16)
        c = ul.astype(np.int16)
        p = a + b - c
        pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
        pred = np.where((pa <= pb) & (pa <= pc), left, np.where(pb <= pc, up, ul))
        return rows - pred
    raise PngFormatError(f"unknown filter type {filter_type}")


def _chunk(ctype: bytes, body: bytes) -> bytes:
    crc = zlib.crc32(ctype + body) & 0xFFFFFFFF
    return struct.pack(">I", len(body)) + ctype + body + struct.pack(">I", crc)


def _adam7_subs(a: np.ndarray):
    """Non-empty Adam7 sub-images of ``a`` in pass order."""
    for y0, x0, dy, dx in _ADAM7:
        sub = a[y0::dy, x0::dx]
        if sub.shape[0] and sub.shape[1]:
            yield sub


def encode(arr: np.ndarray, *, filter_type: int = 0, interlace: bool = False) -> bytes:
    """uint8 (H, W[, C]) or uint16 (H, W[, C]) array → PNG bytes.

    uint16 input emits a 16-bit-depth PNG (big-endian samples).
    ``filter_type`` applies one filter to every scanline (0 = None,
    the fastest to decode; 4 = Paeth, what real encoders mostly emit —
    used by tests to build realistic fixtures). ``interlace`` emits
    Adam7 (each pass filtered independently per the spec).
    """
    a = np.asarray(arr)
    depth = 16 if a.dtype == np.uint16 else 8
    a = a.astype(np.uint16 if depth == 16 else np.uint8, copy=False)
    if a.ndim == 2:
        a = a[:, :, None]
    if a.ndim != 3 or a.shape[2] not in (1, 2, 3, 4):
        raise PngFormatError(f"unsupported array shape {a.shape}")
    h, w, c = a.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    ihdr = struct.pack(">IIBBBBB", w, h, depth, color, 0, 0, int(interlace))
    bpp = max(1, (depth * c) // 8)
    tag = bytes([filter_type])

    def stream(sub: np.ndarray) -> bytes:
        hh, ww = sub.shape[0], sub.shape[1]
        if depth == 16:
            rows = np.frombuffer(sub.astype(">u2").tobytes(), np.uint8).reshape(
                hh, ww * c * 2
            )
        else:
            rows = np.ascontiguousarray(sub).reshape(hh, ww * c)
        filt = _filter_rows(rows, bpp, filter_type)
        return b"".join(tag + filt[y].tobytes() for y in range(hh))

    raw = b"".join(map(stream, _adam7_subs(a))) if interlace else stream(a)
    return (
        PNG_MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 9))
        + _chunk(b"IEND", b"")
    )


def _pack_sub_byte(a2d: np.ndarray, depth: int) -> bytes:
    """(H, W) samples < 2^depth → filter-0 scanline stream at that bit
    width (MSB-first packing per the spec)."""
    h, w = a2d.shape
    if depth == 8:
        rows = np.ascontiguousarray(a2d)
    else:
        bits = np.unpackbits(a2d[:, :, None], axis=2)[:, :, 8 - depth :]
        rows = np.packbits(bits.reshape(h, w * depth), axis=1)
    return b"".join(b"\x00" + rows[y].tobytes() for y in range(h))


def encode_indexed(
    indices: np.ndarray, palette: np.ndarray, *, depth: int = 8, interlace: bool = False
) -> bytes:
    """(H, W) palette indices + (N, 3) palette → color-type-3 PNG.

    ``depth`` of 1/2/4/8 packs indices at that bit width (MSB-first
    per the spec). Fixture builder for the palette decode path."""
    idx = np.asarray(indices, dtype=np.uint8)
    pal = np.asarray(palette, dtype=np.uint8).reshape(-1, 3)
    if idx.ndim != 2:
        raise PngFormatError(f"indices must be 2-D, got shape {idx.shape}")
    if depth not in _DEPTHS[3]:
        raise PngFormatError(f"invalid palette bit depth {depth}")
    if int(idx.max(initial=0)) >= min(len(pal), 1 << depth):
        raise PngFormatError("palette index out of range for depth/palette")
    h, w = idx.shape
    if interlace:
        raw = b"".join(_pack_sub_byte(s, depth) for s in _adam7_subs(idx))
    else:
        raw = _pack_sub_byte(idx, depth)
    ihdr = struct.pack(">IIBBBBB", w, h, depth, 3, 0, 0, int(interlace))
    return (
        PNG_MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"PLTE", pal.tobytes())
        + _chunk(b"IDAT", zlib.compress(raw, 9))
        + _chunk(b"IEND", b"")
    )


def encode_gray_lowdepth(
    arr: np.ndarray, *, depth: int, interlace: bool = False
) -> bytes:
    """(H, W) grayscale samples (< 2^depth) → 1/2/4-bit gray PNG.
    Fixture builder for the sub-byte grayscale decode path."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim != 2:
        raise PngFormatError(f"gray array must be 2-D, got shape {a.shape}")
    if depth not in (1, 2, 4):
        raise PngFormatError(f"not a sub-byte depth: {depth}")
    if int(a.max(initial=0)) >= 1 << depth:
        raise PngFormatError(f"sample out of range for depth {depth}")
    h, w = a.shape
    if interlace:
        raw = b"".join(_pack_sub_byte(s, depth) for s in _adam7_subs(a))
    else:
        raw = _pack_sub_byte(a, depth)
    ihdr = struct.pack(">IIBBBBB", w, h, depth, 0, 0, 0, int(interlace))
    return (
        PNG_MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 9))
        + _chunk(b"IEND", b"")
    )


def resize_nearest(arr: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resample (the lib-free resize kernel)."""
    h, w = arr.shape[:2]
    ys = np.minimum((np.arange(height) * h) // height, h - 1)
    xs = np.minimum((np.arange(width) * w) // width, w - 1)
    return arr[ys][:, xs]
