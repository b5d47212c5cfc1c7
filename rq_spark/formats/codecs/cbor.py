"""Minimal CBOR codec (RFC 8949), written from the public spec.

Covers the value model the engine round-trips (SURVEY.md §1.2):
null, bool, signed/unsigned ints, float32/64, text, bytes, arrays,
maps. Indefinite-length items and tags are decoded (tags unwrapped,
matching the reference's "drop the type tag" stance for foreign
extensions, cf. msgpack Ext→Bytes in §1.4); canonical definite-length
encoding on output.

Streams are *concatenated* CBOR values until EOF — the same framing
the reference uses (/root/reference/src/value/cbor.rs:37-51).
"""

from __future__ import annotations

import math
import struct
from collections.abc import Iterator

from ...errors import CborError
from .. import values as _values

_MT_UINT, _MT_NINT, _MT_BYTES, _MT_TEXT, _MT_ARRAY, _MT_MAP, _MT_TAG, _MT_SIMPLE = range(8)
_BREAK = object()


def _head(mt: int, arg: int) -> bytes:
    if arg < 24:
        return bytes([(mt << 5) | arg])
    for ai, fmt, limit in ((24, ">B", 1 << 8), (25, ">H", 1 << 16),
                           (26, ">I", 1 << 32), (27, ">Q", 1 << 64)):
        if arg < limit:
            return bytes([(mt << 5) | ai]) + struct.pack(fmt, arg)
    raise CborError(f"integer too large: {arg}")


def encode(value) -> bytes:
    out = bytearray()
    _enc(value, out)
    return bytes(out)


def _enc(v, out: bytearray) -> None:
    if v is None:
        out.append(0xF6)
    elif isinstance(v, bool):
        out.append(0xF5 if v else 0xF4)
    elif isinstance(v, int):
        if v >= 0:
            out += _head(_MT_UINT, v)
        else:
            out += _head(_MT_NINT, -1 - v)
    elif isinstance(v, float):
        out.append(0xFB)
        out += struct.pack(">d", v)
    elif isinstance(v, str):
        b = v.encode("utf-8")
        out += _head(_MT_TEXT, len(b))
        out += b
    elif isinstance(v, (bytes, bytearray)):
        out += _head(_MT_BYTES, len(v))
        out += bytes(v)
    elif isinstance(v, (list, tuple)):
        out += _head(_MT_ARRAY, len(v))
        for x in v:
            _enc(x, out)
    elif isinstance(v, (dict, _values.OrderedPairs)):
        out += _head(_MT_MAP, len(v))
        for k, x in v.items():
            _enc(k, out)
            _enc(x, out)
    else:
        raise CborError(f"unencodable type {type(v).__name__}")


class _Reader:
    def __init__(self, buf: bytes, pos: int = 0):
        self.buf = buf
        self.pos = pos

    def take(self, n: int) -> bytes:
        if self.pos + n > len(self.buf):
            raise CborError("truncated input")
        b = self.buf[self.pos : self.pos + n]
        self.pos += n
        return b

    def _arg(self, ai: int) -> int | None:
        if ai < 24:
            return ai
        if ai == 24:
            return self.take(1)[0]
        if ai == 25:
            return struct.unpack(">H", self.take(2))[0]
        if ai == 26:
            return struct.unpack(">I", self.take(4))[0]
        if ai == 27:
            return struct.unpack(">Q", self.take(8))[0]
        if ai == 31:
            return None  # indefinite
        raise CborError(f"reserved additional info {ai}")

    def decode_one(self):
        ib = self.take(1)[0]
        mt, ai = ib >> 5, ib & 0x1F
        if ib == 0xFF:
            return _BREAK
        arg = self._arg(ai)
        if mt == _MT_UINT:
            return arg
        if mt == _MT_NINT:
            return -1 - arg
        if mt == _MT_BYTES or mt == _MT_TEXT:
            if arg is None:  # indefinite: concatenate chunks
                parts = []
                while True:
                    c = self.decode_one()
                    if c is _BREAK:
                        break
                    parts.append(c if isinstance(c, bytes) else c.encode())
                blob = b"".join(parts)
                return blob if mt == _MT_BYTES else blob.decode("utf-8")
            b = self.take(arg)
            return bytes(b) if mt == _MT_BYTES else b.decode("utf-8")
        if mt == _MT_ARRAY:
            items = []
            if arg is None:
                while (x := self.decode_one()) is not _BREAK:
                    items.append(x)
            else:
                items = [self.decode_one() for _ in range(arg)]
            return items
        if mt == _MT_MAP:
            # order/duplicates/any-key preserved via list-of-pairs
            # fallback (reference Map semantics, mod.rs:43-44)
            pairs = []
            if arg is None:
                while (k := self.decode_one()) is not _BREAK:
                    pairs.append((k, self.decode_one()))
            else:
                for _ in range(arg):
                    k = self.decode_one()
                    pairs.append((k, self.decode_one()))
            return _values.map_from_pairs(pairs)
        if mt == _MT_TAG:
            return self.decode_one()  # unwrap tag content
        # simple / float
        if ai == 20:
            return False
        if ai == 21:
            return True
        if ai == 22 or ai == 23:
            return None
        if ai == 25:  # float16
            return _decode_f16(struct.unpack(">H", struct.pack(">H", arg))[0])
        if ai == 26:
            return struct.unpack(">f", struct.pack(">I", arg))[0]
        if ai == 27:
            return struct.unpack(">d", struct.pack(">Q", arg))[0]
        raise CborError(f"unsupported simple value {ai}")


def _decode_f16(h: int) -> float:
    sign = -1.0 if h & 0x8000 else 1.0
    exp = (h >> 10) & 0x1F
    frac = h & 0x3FF
    if exp == 0:
        return sign * frac * 2.0**-24
    if exp == 31:
        return sign * (math.inf if frac == 0 else math.nan)
    return sign * (1 + frac / 1024.0) * 2.0 ** (exp - 15)


def decode_stream(buf: bytes) -> Iterator:
    """Concatenated CBOR values until EOF (cbor.rs:37-51 framing)."""
    r = _Reader(buf)
    while r.pos < len(buf):
        v = r.decode_one()
        if v is _BREAK:
            raise CborError("unexpected break code")
        yield v


def decode(buf: bytes):
    r = _Reader(buf)
    v = r.decode_one()
    if v is _BREAK:
        raise CborError("unexpected break code")
    if r.pos != len(buf):
        raise CborError("trailing bytes after value")
    return v
