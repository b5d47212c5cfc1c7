"""Minimal MessagePack codec, written from the public spec
(github.com/msgpack/msgpack/blob/master/spec.md).

Reference-parity notes (SURVEY.md §1.4, src/value/messagepack.rs):
* decode prefers unsigned ints (Integer→U64 when representable) —
  Python ints subsume this; the *encode* side emits the smallest
  unsigned family first, like rq's serializer (messagepack.rs:96-128);
* Ext(type, data) decodes to plain bytes — the type tag is dropped
  (messagepack.rs:63-94);
* invalid UTF-8 in a str is a hard error (fail-fast model);
* streams are back-to-back values until EOF (messagepack.rs:35-51).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

from ...errors import (
    FormatError,
    MessagePackDecodeError,
    MessagePackEncodeError,
)
from .. import values as _values


def encode(v) -> bytes:
    out = bytearray()
    _enc(v, out)
    return bytes(out)


def _enc(v, out: bytearray) -> None:
    if v is None:
        out.append(0xC0)
    elif isinstance(v, bool):
        out.append(0xC3 if v else 0xC2)
    elif isinstance(v, int):
        _enc_int(v, out)
    elif isinstance(v, float):
        out.append(0xCB)
        out += struct.pack(">d", v)
    elif isinstance(v, str):
        b = v.encode("utf-8")
        n = len(b)
        if n < 32:
            out.append(0xA0 | n)
        elif n < 1 << 8:
            out += bytes([0xD9, n])
        elif n < 1 << 16:
            out += b"\xda" + struct.pack(">H", n)
        else:
            out += b"\xdb" + struct.pack(">I", n)
        out += b
    elif isinstance(v, (bytes, bytearray)):
        n = len(v)
        if n < 1 << 8:
            out += bytes([0xC4, n])
        elif n < 1 << 16:
            out += b"\xc5" + struct.pack(">H", n)
        else:
            out += b"\xc6" + struct.pack(">I", n)
        out += bytes(v)
    elif isinstance(v, (list, tuple)):
        n = len(v)
        if n < 16:
            out.append(0x90 | n)
        elif n < 1 << 16:
            out += b"\xdc" + struct.pack(">H", n)
        else:
            out += b"\xdd" + struct.pack(">I", n)
        for x in v:
            _enc(x, out)
    elif isinstance(v, (dict, _values.OrderedPairs)):
        n = len(v)
        if n < 16:
            out.append(0x80 | n)
        elif n < 1 << 16:
            out += b"\xde" + struct.pack(">H", n)
        else:
            out += b"\xdf" + struct.pack(">I", n)
        for k, x in v.items():
            _enc(k, out)
            _enc(x, out)
    else:
        raise MessagePackEncodeError(f"unencodable type {type(v).__name__}")


def _enc_int(v: int, out: bytearray) -> None:
    if 0 <= v < 128:
        out.append(v)
    elif -32 <= v < 0:
        out.append(v & 0xFF)
    elif 0 <= v < 1 << 8:
        out += bytes([0xCC, v])
    elif 0 <= v < 1 << 16:
        out += b"\xcd" + struct.pack(">H", v)
    elif 0 <= v < 1 << 32:
        out += b"\xce" + struct.pack(">I", v)
    elif 0 <= v < 1 << 64:
        out += b"\xcf" + struct.pack(">Q", v)
    elif -(1 << 7) <= v < 0:
        out += b"\xd0" + struct.pack(">b", v)
    elif -(1 << 15) <= v < 0:
        out += b"\xd1" + struct.pack(">h", v)
    elif -(1 << 31) <= v < 0:
        out += b"\xd2" + struct.pack(">i", v)
    elif -(1 << 63) <= v < 0:
        out += b"\xd3" + struct.pack(">q", v)
    else:
        raise MessagePackEncodeError(f"integer out of range: {v}")


class _Reader:
    def __init__(self, buf: bytes, pos: int = 0):
        self.buf = buf
        self.pos = pos

    def take(self, n: int) -> bytes:
        if self.pos + n > len(self.buf):
            raise MessagePackDecodeError("truncated input")
        b = self.buf[self.pos : self.pos + n]
        self.pos += n
        return b

    def _str(self, n: int) -> str:
        b = self.take(n)
        try:
            return b.decode("utf-8")
        except UnicodeDecodeError as e:
            # messagepack.rs:73-77: an invalid-UTF-8 str is the
            # `Format` variant ("format error: {msg}"), not a decode
            # error — rmpv parses it as Utf8String and rq errors on
            # the is_err() branch
            raise FormatError(f"invalid utf-8 sequence: {e}") from e

    def decode_one(self):
        b = self.take(1)[0]
        if b < 0x80:
            return b
        if b >= 0xE0:
            return b - 256
        if 0x80 <= b <= 0x8F:
            return self._map(b & 0x0F)
        if 0x90 <= b <= 0x9F:
            return self._arr(b & 0x0F)
        if 0xA0 <= b <= 0xBF:
            return self._str(b & 0x1F)
        u = struct.unpack
        if b == 0xC0:
            return None
        if b == 0xC2:
            return False
        if b == 0xC3:
            return True
        if b == 0xC4:
            return bytes(self.take(self.take(1)[0]))
        if b == 0xC5:
            return bytes(self.take(u(">H", self.take(2))[0]))
        if b == 0xC6:
            return bytes(self.take(u(">I", self.take(4))[0]))
        if b in (0xC7, 0xC8, 0xC9):  # ext → bytes, tag dropped (§1.4)
            n = (self.take(1)[0] if b == 0xC7
                 else u(">H", self.take(2))[0] if b == 0xC8
                 else u(">I", self.take(4))[0])
            self.take(1)  # ext type byte, dropped
            return bytes(self.take(n))
        if b == 0xCA:
            return u(">f", self.take(4))[0]
        if b == 0xCB:
            return u(">d", self.take(8))[0]
        if b == 0xCC:
            return self.take(1)[0]
        if b == 0xCD:
            return u(">H", self.take(2))[0]
        if b == 0xCE:
            return u(">I", self.take(4))[0]
        if b == 0xCF:
            return u(">Q", self.take(8))[0]
        if b == 0xD0:
            return u(">b", self.take(1))[0]
        if b == 0xD1:
            return u(">h", self.take(2))[0]
        if b == 0xD2:
            return u(">i", self.take(4))[0]
        if b == 0xD3:
            return u(">q", self.take(8))[0]
        if 0xD4 <= b <= 0xD8:  # fixext 1/2/4/8/16 → bytes
            n = 1 << (b - 0xD4)
            self.take(1)
            return bytes(self.take(n))
        if b == 0xD9:
            return self._str(self.take(1)[0])
        if b == 0xDA:
            return self._str(u(">H", self.take(2))[0])
        if b == 0xDB:
            return self._str(u(">I", self.take(4))[0])
        if b == 0xDC:
            return self._arr(u(">H", self.take(2))[0])
        if b == 0xDD:
            return self._arr(u(">I", self.take(4))[0])
        if b == 0xDE:
            return self._map(u(">H", self.take(2))[0])
        if b == 0xDF:
            return self._map(u(">I", self.take(4))[0])
        raise MessagePackDecodeError(f"unknown type byte 0x{b:02x}")

    def _arr(self, n: int) -> list:
        return [self.decode_one() for _ in range(n)]

    def _map(self, n: int):
        # order + duplicates + non-string keys preserved, parity with
        # the reference's list-of-pairs Map (messagepack.rs:88-92)
        pairs = [(self.decode_one(), self.decode_one()) for _ in range(n)]
        return _values.map_from_pairs(pairs)


def decode_stream(buf: bytes) -> Iterator:
    r = _Reader(buf)
    while r.pos < len(buf):
        yield r.decode_one()


def decode(buf: bytes):
    r = _Reader(buf)
    v = r.decode_one()
    if r.pos != len(buf):
        raise MessagePackDecodeError("trailing bytes after value")
    return v
