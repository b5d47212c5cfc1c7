"""Pure-Python TIFF codec (decode/encode) from the public TIFF 6.0
specification — numpy + spec entropy coders, no image libs.

Why it exists: PNG/JPEG/GIF/BMP payloads decode to real pixels
(operators/{png,jpeg,gif,bmp}.py); TIFF dims were header-sniffed only
(multimodal._tiff_dims). This carries the pixel layer: baseline
strip-organized TIFF with the three classic compressions.

Supported: both byte orders ('II' little / 'MM' big); strip
organization (StripOffsets/StripByteCounts/RowsPerStrip);
Compression 1 (none), 5 (LZW — TIFF's MSB-first variant with the
EarlyChange code-width bump one code early, spec §13), and
32773 (PackBits run-length, spec §9); horizontal differencing
Predictor 2 (§14); PhotometricInterpretation 0 (WhiteIsZero — values
inverted on decode), 1 (BlackIsZero), 2 (RGB); 8 bits per sample;
1/3/4 samples per pixel (alpha rides as a fourth channel); contiguous
planar configuration. Rejected loudly (TiffFormatError): tiles,
other compressions/bit depths/photometrics, planar configuration 2.

Decode returns (height, width, channels) uint8. Encode writes
single-IFD little-endian TIFF, one strip per image, with
``compression`` selectable ("none" | "lzw" | "packbits") so every
decode path has an in-repo round-trip proof.
"""

from __future__ import annotations

import struct

import numpy as np

from ..errors import RqError


class TiffFormatError(RqError):
    """Malformed or unsupported-profile TIFF."""


def is_tiff(data: bytes) -> bool:
    return bytes(data[:4]) in (b"II*\x00", b"MM\x00*")


# ------------------------------------------------------------- LZW (§13)

_CLEAR = 256
_EOI = 257


def _lzw_decode(data: bytes) -> bytes:
    """TIFF-variant LZW: 8-bit symbols, codes packed MSB-first,
    starting at 9 bits; the width bumps at table sizes 511/1023/2047
    (one EARLIER than the table-full point — the spec's off-by-one
    "EarlyChange" that distinguishes TIFF from GIF LZW)."""
    out = bytearray()
    table: list[bytes] = []

    def reset() -> None:
        table.clear()
        table.extend(bytes([i]) for i in range(256))
        table.extend((b"", b""))  # Clear / EOI placeholders

    reset()
    width = 9
    acc = nbits = 0
    prev: bytes | None = None
    for byte in data:
        acc = (acc << 8) | byte
        nbits += 8
        while nbits >= width:
            nbits -= width
            code = (acc >> nbits) & ((1 << width) - 1)
            # trim consumed history: an unmasked accumulator grows
            # with the whole strip and every shift becomes O(strip bits)
            acc &= (1 << nbits) - 1
            if code == _CLEAR:
                reset()
                width = 9
                prev = None
                continue
            if code == _EOI:
                return bytes(out)
            if prev is None:
                if code >= 256:
                    raise TiffFormatError("LZW: first code after clear not a literal")
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):  # the KwKwK case
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise TiffFormatError("LZW: code out of range")
            out += entry
            prev = entry
            # EarlyChange: bump one code before the width overflows
            if len(table) + 1 >= (1 << width) and width < 12:
                width += 1
    return bytes(out)


def _lzw_encode(data: bytes) -> bytes:
    """Mirror of `_lzw_decode` (MSB-first, EarlyChange) — exists so the
    decoder's LZW path has an in-repo round-trip proof."""
    out = bytearray()
    acc = nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            nbits -= 8
            out.append((acc >> nbits) & 0xFF)
            acc &= (1 << nbits) - 1  # same trim as the decoder

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    nxt = 258
    width = 9
    emit(_CLEAR, width)
    run = b""
    for byte in data:
        cand = run + bytes([byte])
        if cand in table:
            run = cand
            continue
        emit(table[run], width)
        table[cand] = nxt
        nxt += 1
        # encoder bumps when the NEXT emit would need more bits,
        # one early (EarlyChange) to stay in step with the decoder
        if nxt + 1 > (1 << width) and width < 12:
            width += 1
        if nxt >= (1 << 12) - 1:  # table full: clear and restart
            emit(_CLEAR, width)
            table = {bytes([i]): i for i in range(256)}
            nxt = 258
            width = 9
        run = bytes([byte])
    if run:
        emit(table[run], width)
    emit(_EOI, width)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


# -------------------------------------------------------- PackBits (§9)


def _packbits_decode(data: bytes, expected: int) -> bytes:
    out = bytearray()
    pos = 0
    while pos < len(data) and len(out) < expected:
        n = data[pos]
        pos += 1
        if n < 128:  # literal run of n+1 bytes
            if pos + n + 1 > len(data):
                raise TiffFormatError("PackBits: truncated literal run")
            out += data[pos : pos + n + 1]
            pos += n + 1
        elif n > 128:  # repeat next byte 257-n times
            if pos >= len(data):
                raise TiffFormatError("PackBits: truncated repeat run")
            out += bytes([data[pos]]) * (257 - n)
            pos += 1
        # n == 128: no-op per spec
    if len(out) < expected:
        raise TiffFormatError("PackBits: short output")
    return bytes(out[:expected])


def _packbits_encode(data: bytes) -> bytes:
    """Greedy PackBits: repeat runs ≥ 3 become repeat packets, the
    rest literal packets of ≤ 128."""
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 3:
            out.append(257 - run)
            out.append(data[i])
            i += run
            continue
        lit_start = i
        i += run
        while i < n and i - lit_start < 128:
            run = 1
            while i + run < n and run < 3 and data[i + run] == data[i]:
                run += 1
            if run >= 3:
                break
            i += run
        chunk = data[lit_start : min(i, lit_start + 128)]
        i = lit_start + len(chunk)
        out.append(len(chunk) - 1)
        out += chunk
    return bytes(out)


# --------------------------------------------------------------- decode

#: tag ids (TIFF 6.0 §8)
_T_WIDTH, _T_HEIGHT, _T_BITS, _T_COMP, _T_PHOTO = 256, 257, 258, 259, 262
_T_STRIP_OFF, _T_SPP, _T_ROWS_PER_STRIP, _T_STRIP_CNT = 273, 277, 278, 279
_T_PREDICTOR, _T_PLANAR = 317, 284
_T_TILE_W, _T_TILE_L = 322, 323

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}


def _read_ifd(b: bytes, endian: str):
    """First IFD → {tag: [values]} (BYTE/SHORT/LONG types)."""

    def u(sl: bytes) -> int:
        return int.from_bytes(sl, endian)

    ifd = u(b[4:8])
    if ifd + 2 > len(b):
        raise TiffFormatError("truncated IFD offset")
    count = u(b[ifd : ifd + 2])
    tags: dict[int, list[int]] = {}
    for i in range(count):
        e = ifd + 2 + 12 * i
        if e + 12 > len(b):
            raise TiffFormatError("truncated IFD entry")
        tag, typ, cnt = u(b[e : e + 2]), u(b[e + 2 : e + 4]), u(b[e + 4 : e + 8])
        size = _TYPE_SIZES.get(typ)
        if size is None:
            continue  # RATIONAL/other types: not needed for the pixel layer
        total = size * cnt
        src = e + 8 if total <= 4 else u(b[e + 8 : e + 12])
        if src + total > len(b):
            raise TiffFormatError(f"tag {tag}: value beyond file end")
        vals = [u(b[src + k * size : src + (k + 1) * size]) for k in range(cnt)]
        tags[tag] = vals
    return tags


def decode(data: bytes) -> np.ndarray:
    """TIFF bytes → uint8 array (height, width, channels)."""
    b = bytes(data)
    if not is_tiff(b):
        raise TiffFormatError("not a TIFF (bad byte-order magic)")
    endian = "little" if b[:2] == b"II" else "big"
    tags = _read_ifd(b, endian)
    if _T_TILE_W in tags or _T_TILE_L in tags:
        raise TiffFormatError("tiled TIFF unsupported (strip organization only)")
    try:
        width = tags[_T_WIDTH][0]
        height = tags[_T_HEIGHT][0]
        offsets = tags[_T_STRIP_OFF]
        counts = tags[_T_STRIP_CNT]
    except KeyError as e:
        raise TiffFormatError(f"missing required tag {e}") from None
    spp = tags.get(_T_SPP, [1])[0]
    bits = tags.get(_T_BITS, [8] * spp)
    comp = tags.get(_T_COMP, [1])[0]
    photo = tags.get(_T_PHOTO, [1])[0]
    predictor = tags.get(_T_PREDICTOR, [1])[0]
    rows_per_strip = tags.get(_T_ROWS_PER_STRIP, [height])[0]
    planar = tags.get(_T_PLANAR, [1])[0]
    if any(v != 8 for v in bits):
        raise TiffFormatError(f"only 8 bits per sample supported, got {bits}")
    if spp not in (1, 3, 4):
        raise TiffFormatError(f"{spp} samples per pixel unsupported")
    if photo not in (0, 1, 2):
        raise TiffFormatError(f"photometric interpretation {photo} unsupported")
    if planar != 1:
        raise TiffFormatError("planar configuration 2 (separate planes) unsupported")
    if predictor not in (1, 2):
        raise TiffFormatError(f"predictor {predictor} unsupported")
    if len(offsets) != len(counts):
        raise TiffFormatError("StripOffsets/StripByteCounts length mismatch")
    if width == 0 or height == 0:
        raise TiffFormatError("zero-sized image")

    row_bytes = width * spp
    raw = bytearray()
    rows_done = 0
    for si, (off, cnt) in enumerate(zip(offsets, counts)):
        if off + cnt > len(b):
            raise TiffFormatError(f"strip {si} beyond file end")
        strip = b[off : off + cnt]
        strip_rows = min(rows_per_strip, height - rows_done)
        expected = strip_rows * row_bytes
        if comp == 1:
            if len(strip) < expected:
                raise TiffFormatError(f"strip {si}: short uncompressed data")
            strip = strip[:expected]
        elif comp == 5:
            strip = _lzw_decode(strip)[:expected]
            if len(strip) < expected:
                raise TiffFormatError(f"strip {si}: short LZW data")
        elif comp == 32773:
            strip = _packbits_decode(strip, expected)
        else:
            raise TiffFormatError(
                f"compression {comp} unsupported (1/5/32773 only)"
            )
        raw += strip
        rows_done += strip_rows
    if rows_done < height:
        raise TiffFormatError("strips cover fewer rows than ImageLength")

    arr = np.frombuffer(bytes(raw), dtype=np.uint8).reshape(height, width, spp)
    if predictor == 2:  # horizontal differencing: undo with a row cumsum
        arr = np.cumsum(arr.astype(np.uint32), axis=1, dtype=np.uint32)
        arr = (arr & 0xFF).astype(np.uint8)
    if photo == 0:  # WhiteIsZero: invert to the universal min-is-black
        arr = 255 - arr
    return np.ascontiguousarray(arr)


# --------------------------------------------------------------- encode


def encode(
    arr: np.ndarray, compression: str = "none", predictor: bool = False
) -> bytes:
    """uint8 (H, W), (H, W, 1), (H, W, 3) or (H, W, 4) array →
    single-strip little-endian TIFF. ``compression``: "none" | "lzw" |
    "packbits"; ``predictor=True`` applies horizontal differencing
    before compression (the combination real writers use for LZW)."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    if a.ndim != 3 or a.shape[2] not in (1, 3, 4):
        raise TiffFormatError(f"unsupported array shape {a.shape}")
    h, w, spp = a.shape
    if h == 0 or w == 0:
        raise TiffFormatError("empty image")

    pix = a
    if predictor:
        pix = pix.astype(np.int16)
        pix = np.concatenate(
            [pix[:, :1], (pix[:, 1:] - pix[:, :-1]) & 0xFF], axis=1
        ).astype(np.uint8)
    payload = pix.tobytes()
    if compression == "none":
        comp_tag, strip = 1, payload
    elif compression == "lzw":
        comp_tag, strip = 5, _lzw_encode(payload)
    elif compression == "packbits":
        comp_tag, strip = 32773, _packbits_encode(payload)
    else:
        raise TiffFormatError(f"unknown compression {compression!r}")

    photo = 1 if spp == 1 else 2
    entries: list[tuple[int, int, int, bytes | int]] = []  # tag, type, count, val
    extra: bytearray = bytearray()

    def add(tag: int, typ: int, vals: list[int]) -> None:
        size = _TYPE_SIZES[typ]
        total = size * len(vals)
        packed = b"".join(v.to_bytes(size, "little") for v in vals)
        if total <= 4:
            entries.append((tag, typ, len(vals), packed.ljust(4, b"\0")))
        else:
            entries.append((tag, typ, len(vals), ("off", len(extra))))  # type: ignore[arg-type]
            extra.extend(packed)

    add(_T_WIDTH, 4, [w])
    add(_T_HEIGHT, 4, [h])
    add(_T_BITS, 3, [8] * spp)
    add(_T_COMP, 3, [comp_tag])
    add(_T_PHOTO, 3, [photo])
    add(_T_STRIP_OFF, 4, [0])  # patched below
    add(_T_SPP, 3, [spp])
    add(_T_ROWS_PER_STRIP, 4, [h])
    add(_T_STRIP_CNT, 4, [len(strip)])
    if predictor:
        add(_T_PREDICTOR, 3, [2])

    # layout: header(8) | IFD | next-IFD(4) | extra values | strip
    ifd_off = 8
    ifd_len = 2 + 12 * len(entries) + 4
    extra_off = ifd_off + ifd_len
    strip_off = extra_off + len(extra)

    out = bytearray(b"II*\x00" + struct.pack("<I", ifd_off))
    out += struct.pack("<H", len(entries))
    for tag, typ, cnt, val in sorted(entries):
        out += struct.pack("<HHI", tag, typ, cnt)
        if tag == _T_STRIP_OFF:
            out += struct.pack("<I", strip_off)
        elif isinstance(val, tuple):
            out += struct.pack("<I", extra_off + val[1])
        else:
            out += val
    out += struct.pack("<I", 0)  # no next IFD
    out += extra
    out += strip
    return bytes(out)
