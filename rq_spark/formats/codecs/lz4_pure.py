"""Pure-Python LZ4 codec — frame format (the ``.lz4`` file/stream
shape) and block format, implemented from the public LZ4 format
descriptions. No external deps; cross-validated against the reference
``lz4`` CLI in tests when one is on PATH.

Decoder: full frame parsing — magic, FLG/BD descriptor with header
checksum (xxh32, implemented below), optional content size and
dictionary id (dictionaries rejected loudly), compressed and
uncompressed blocks, optional per-block checksums, content checksum,
skippable frames, multi-frame concatenation. Block decode handles the
full token grammar (15-extension literal/match lengths, overlapping
copies).

Encoder: independent blocks with greedy hash-table matching honoring
the spec's end conditions (last 5 bytes literal, no match within the
final 12 bytes), falling back to uncompressed blocks when compression
does not win; content checksum always emitted.

Bomb-safety mirrors zstd_pure: callers can pass ``max_output``; block
output is bounded by the frame's declared block maximum.
"""

from __future__ import annotations

import struct

__all__ = ["Lz4Error", "compress", "decompress", "xxh32"]


class Lz4Error(ValueError):
    pass


# ---------------------------------------------------------------------------
# xxhash32
# ---------------------------------------------------------------------------

_P32_1 = 0x9E3779B1
_P32_2 = 0x85EBCA77
_P32_3 = 0xC2B2AE3D
_P32_4 = 0x27D4EB2F
_P32_5 = 0x165667B1
_M32 = 0xFFFFFFFF


def _rotl32(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _M32


def xxh32(data: bytes, seed: int = 0) -> int:
    n = len(data)
    i = 0
    if n >= 16:
        v1 = (seed + _P32_1 + _P32_2) & _M32
        v2 = (seed + _P32_2) & _M32
        v3 = seed
        v4 = (seed - _P32_1) & _M32
        limit = n - 16
        while i <= limit:
            x1, x2, x3, x4 = struct.unpack_from("<4I", data, i)
            v1 = (_rotl32((v1 + x1 * _P32_2) & _M32, 13) * _P32_1) & _M32
            v2 = (_rotl32((v2 + x2 * _P32_2) & _M32, 13) * _P32_1) & _M32
            v3 = (_rotl32((v3 + x3 * _P32_2) & _M32, 13) * _P32_1) & _M32
            v4 = (_rotl32((v4 + x4 * _P32_2) & _M32, 13) * _P32_1) & _M32
            i += 16
        h = (_rotl32(v1, 1) + _rotl32(v2, 7) + _rotl32(v3, 12) + _rotl32(v4, 18)) & _M32
    else:
        h = (seed + _P32_5) & _M32
    h = (h + n) & _M32
    while i + 4 <= n:
        (k,) = struct.unpack_from("<I", data, i)
        h = (_rotl32((h + k * _P32_3) & _M32, 17) * _P32_4) & _M32
        i += 4
    while i < n:
        h = (_rotl32((h + data[i] * _P32_5) & _M32, 11) * _P32_1) & _M32
        i += 1
    h ^= h >> 15
    h = (h * _P32_2) & _M32
    h ^= h >> 13
    h = (h * _P32_3) & _M32
    h ^= h >> 16
    return h


# ---------------------------------------------------------------------------
# block format
# ---------------------------------------------------------------------------


def _block_decompress(src: bytes, max_size: int) -> bytearray:
    out = bytearray()
    i = 0
    n = len(src)
    while True:
        if i >= n:
            raise Lz4Error("lz4: truncated sequence token")
        token = src[i]
        i += 1
        ll = token >> 4
        if ll == 15:
            while True:
                if i >= n:
                    raise Lz4Error("lz4: truncated literal length")
                b = src[i]
                i += 1
                ll += b
                if b != 255:
                    break
        if i + ll > n:
            raise Lz4Error("lz4: literal run past block end")
        if len(out) + ll > max_size:
            raise Lz4Error("lz4: block output exceeds declared maximum")
        out += src[i : i + ll]
        i += ll
        if i == n:
            break  # final sequence is literals-only
        if i + 2 > n:
            raise Lz4Error("lz4: truncated match offset")
        offset = src[i] | (src[i + 1] << 8)
        i += 2
        if offset == 0 or offset > len(out):
            raise Lz4Error("lz4: bad match offset")
        ml = (token & 0xF) + 4
        if (token & 0xF) == 15:
            while True:
                if i >= n:
                    raise Lz4Error("lz4: truncated match length")
                b = src[i]
                i += 1
                ml += b
                if b != 255:
                    break
        if len(out) + ml > max_size:
            raise Lz4Error("lz4: block output exceeds declared maximum")
        start = len(out) - offset
        if offset >= ml:
            out += out[start : start + ml]
        else:
            for k in range(ml):
                out.append(out[start + k])
    return out


def _block_compress(src: bytes) -> bytes | None:
    """Greedy hash-table matcher honoring the spec end conditions
    (no match starting in the final 12 bytes; last 5 bytes literal).
    Returns None when storing wins."""
    n = len(src)
    out = bytearray()
    table: dict = {}
    anchor = 0
    i = 0
    match_limit = n - 12
    misses = 0

    def emit(lit_end: int, ml: int, offset: int) -> None:
        nonlocal out
        ll = lit_end - anchor
        tok_ll = 15 if ll >= 15 else ll
        if ml:
            tok_ml = 15 if ml - 4 >= 15 else ml - 4
            out.append((tok_ll << 4) | tok_ml)
        else:
            out.append(tok_ll << 4)
        rest = ll - 15
        while rest >= 0:
            out.append(255 if rest >= 255 else rest)
            if rest < 255:
                break
            rest -= 255
        out += src[anchor:lit_end]
        if ml:
            out += offset.to_bytes(2, "little")
            rest = (ml - 4) - 15
            while rest >= 0:
                out.append(255 if rest >= 255 else rest)
                if rest < 255:
                    break
                rest -= 255

    while i < match_limit:
        key = src[i : i + 4]
        cand = table.get(key)
        table[key] = i
        if cand is not None and i - cand <= 0xFFFF:
            ml = 4
            limit = (n - 5) - i  # matches may not cover the last 5 bytes
            while ml < limit and src[cand + ml] == src[i + ml]:
                ml += 1
            if ml >= 4:
                emit(i, ml, i - cand)
                i += ml
                anchor = i
                misses = 0
                continue
        misses += 1
        i += 1 + (misses >> 6)
    emit(n, 0, 0)  # final literals-only sequence
    return bytes(out) if len(out) < n else None


# ---------------------------------------------------------------------------
# frame format
# ---------------------------------------------------------------------------

_MAGIC = 0x184D2204
_SKIP_LO = 0x184D2A50
_BD_SIZES = {4: 1 << 16, 5: 1 << 18, 6: 1 << 20, 7: 1 << 22}


def decompress(data: bytes, max_output: int | None = None) -> bytes:
    out = bytearray()
    pos = 0
    n = len(data)
    while pos < n:
        if n - pos < 4:
            raise Lz4Error("lz4: truncated magic")
        (magic,) = struct.unpack_from("<I", data, pos)
        if (magic & 0xFFFFFFF0) == _SKIP_LO:
            if n - pos < 8:
                raise Lz4Error("lz4: truncated skippable frame")
            (sz,) = struct.unpack_from("<I", data, pos + 4)
            pos += 8 + sz
            if pos > n:
                raise Lz4Error("lz4: skippable frame overruns input")
            continue
        if magic != _MAGIC:
            raise Lz4Error(f"lz4: bad magic 0x{magic:08x}")
        try:
            pos = _decode_frame(data, pos + 4, out, max_output)
        except (struct.error, IndexError) as e:
            raise Lz4Error(f"lz4: truncated frame: {e}") from e
    return bytes(out)


def _decode_frame(data: bytes, pos: int, out: bytearray,
                  max_output: int | None) -> int:
    desc_start = pos
    flg = data[pos]
    bd = data[pos + 1]
    pos += 2
    if (flg >> 6) != 0b01:
        raise Lz4Error("lz4: unsupported frame version")
    block_checksum = (flg >> 4) & 1
    content_size_flag = (flg >> 3) & 1
    content_checksum = (flg >> 2) & 1
    dict_flag = flg & 1
    if flg & 0x02:
        raise Lz4Error("lz4: reserved FLG bit set")
    bmax_code = (bd >> 4) & 7
    if bd & 0x8F:
        raise Lz4Error("lz4: reserved BD bits set")
    if bmax_code not in _BD_SIZES:
        raise Lz4Error(f"lz4: bad block max size code {bmax_code}")
    bmax = _BD_SIZES[bmax_code]
    content_size = None
    if content_size_flag:
        (content_size,) = struct.unpack_from("<Q", data, pos)
        pos += 8
    if dict_flag:
        raise Lz4Error("lz4: dictionaries unsupported")
    want_hc = (xxh32(data[desc_start:pos]) >> 8) & 0xFF
    if data[pos] != want_hc:
        raise Lz4Error("lz4: frame header checksum mismatch")
    pos += 1
    frame_start = len(out)
    hasher_data = bytearray() if content_checksum else None
    while True:
        (bsize,) = struct.unpack_from("<I", data, pos)
        pos += 4
        if bsize == 0:
            break  # EndMark
        stored = bool(bsize & 0x80000000)
        bsize &= 0x7FFFFFFF
        if bsize > bmax:
            raise Lz4Error("lz4: block larger than declared maximum")
        block = data[pos : pos + bsize]
        if len(block) < bsize:
            raise Lz4Error("lz4: truncated block")
        pos += bsize
        if block_checksum:
            (want,) = struct.unpack_from("<I", data, pos)
            pos += 4
            if xxh32(block) != want:
                raise Lz4Error("lz4: block checksum mismatch")
        dec = block if stored else _block_decompress(block, bmax)
        if max_output is not None and len(out) + len(dec) > max_output:
            raise Lz4Error("lz4: output exceeds ceiling")
        if content_size is not None and (
            len(out) + len(dec) - frame_start > content_size
        ):
            raise Lz4Error("lz4: output exceeds declared content size")
        out += dec
        if hasher_data is not None:
            hasher_data += dec
    if content_size is not None and len(out) - frame_start != content_size:
        raise Lz4Error(
            f"lz4: frame declared {content_size} bytes, produced "
            f"{len(out) - frame_start}"
        )
    if content_checksum:
        (want,) = struct.unpack_from("<I", data, pos)
        pos += 4
        if xxh32(bytes(hasher_data)) != want:
            raise Lz4Error("lz4: content checksum mismatch")
    return pos


def compress(data: bytes, block_max: int = 1 << 20) -> bytes:
    """Standard .lz4 frame: independent blocks, content size + content
    checksum, no block checksums (the CLI default shape)."""
    if block_max not in _BD_SIZES.values():
        raise Lz4Error(f"lz4: invalid block max {block_max}")
    bmax_code = {v: k for k, v in _BD_SIZES.items()}[block_max]
    flg = (0b01 << 6) | (1 << 3) | (1 << 2)  # version, content size, checksum
    bd = bmax_code << 4
    desc = bytes([flg, bd]) + struct.pack("<Q", len(data))
    out = bytearray(struct.pack("<I", _MAGIC))
    out += desc
    out.append((xxh32(desc) >> 8) & 0xFF)
    for i in range(0, len(data), block_max):
        chunk = data[i : i + block_max]
        comp = _block_compress(chunk)
        if comp is None:
            out += struct.pack("<I", len(chunk) | 0x80000000)
            out += chunk
        else:
            out += struct.pack("<I", len(comp))
            out += comp
    out += struct.pack("<I", 0)  # EndMark
    out += struct.pack("<I", xxh32(data))
    return bytes(out)
