"""Pure-Python Snappy block-format codec, written from the public
format description (github.com/google/snappy format_description.txt).

Why it exists: the Avro container's snappy codec
(avro.apache.org/docs/current/specification — "snappy") was gated
behind an import of python-snappy/cramjam, neither of which ships in
this environment, leaving the codec permanently untestable here. The
block format is small enough to carry directly:

* ``decompress`` implements the FULL tag set (literals with 1-4 extra
  length bytes; copies with 1-, 2- and 4-byte offsets, including
  overlapping copies with byte-at-a-time semantics), so it can read
  streams produced by any conforming compressor.
* ``compress`` emits the preamble varint plus ALL-LITERAL chunks —
  explicitly valid per the spec ("a compressor is free to emit any
  sequence of tags that decodes to the input"), decodable by every
  snappy implementation. No back-references means no compression,
  which is fine for the engine's use (Avro block transport where the
  real bindings take over in production; the container's deflate
  codec is the ratio path).

Used as the fallback backend of the Avro container codec; a real
binding (python-snappy, cramjam) is preferred when importable.
"""

from __future__ import annotations

from ...errors import AvroDecodeError

_MAX_LITERAL = 0xFFFFFFFF  # 4-length-byte literal cap


def _uvarint_encode(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _uvarint_decode(data: bytes, pos: int) -> tuple[int, int]:
    shift = acc = 0
    while True:
        if pos >= len(data):
            raise AvroDecodeError("snappy: truncated preamble varint")
        b = data[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            return acc, pos
        shift += 7
        if shift > 28:  # uncompressed length is a 32-bit quantity
            raise AvroDecodeError("snappy: preamble varint too long")


def compress(data: bytes) -> bytes:
    """All-literal snappy stream (spec-valid, ratio 1.0)."""
    data = bytes(data)
    out = bytearray(_uvarint_encode(len(data)))
    pos = 0
    while pos < len(data) or (pos == 0 and not data):
        chunk = data[pos : pos + _MAX_LITERAL]
        n = len(chunk)
        if n == 0:  # empty input: no tags at all, preamble says 0
            break
        if n <= 60:
            out.append((n - 1) << 2)
        elif n <= 0xFF:
            out.append(60 << 2)
            out += (n - 1).to_bytes(1, "little")
        elif n <= 0xFFFF:
            out.append(61 << 2)
            out += (n - 1).to_bytes(2, "little")
        elif n <= 0xFFFFFF:
            out.append(62 << 2)
            out += (n - 1).to_bytes(3, "little")
        else:
            out.append(63 << 2)
            out += (n - 1).to_bytes(4, "little")
        out += chunk
        pos += n
    return bytes(out)


def decompress(data: bytes) -> bytes:
    """Full-tag-set decompressor (literals + 1/2/4-byte-offset copies,
    overlapping copies run byte-at-a-time per the spec)."""
    data = bytes(data)
    want, pos = _uvarint_decode(data, 0)
    out = bytearray()
    while pos < len(data):
        tag = data[pos]
        pos += 1
        kind = tag & 0x03
        if kind == 0:  # literal
            n = tag >> 2
            if n >= 60:
                extra = n - 59  # 60→1, 61→2, 62→3, 63→4 length bytes
                if pos + extra > len(data):
                    raise AvroDecodeError("snappy: truncated literal length")
                n = int.from_bytes(data[pos : pos + extra], "little")
                pos += extra
            n += 1
            if pos + n > len(data):
                raise AvroDecodeError("snappy: truncated literal body")
            if len(out) + n > want:  # bound growth inside the loop —
                # a crafted stream must not balloon past the preamble
                # length before the final check (decompression bomb)
                raise AvroDecodeError("snappy: output exceeds preamble length")
            out += data[pos : pos + n]
            pos += n
            continue
        if kind == 1:  # copy, 1-byte offset
            if pos >= len(data):
                raise AvroDecodeError("snappy: truncated copy-1 offset")
            length = ((tag >> 2) & 0x07) + 4
            offset = ((tag >> 5) << 8) | data[pos]
            pos += 1
        elif kind == 2:  # copy, 2-byte offset
            if pos + 2 > len(data):
                raise AvroDecodeError("snappy: truncated copy-2 offset")
            length = (tag >> 2) + 1
            offset = int.from_bytes(data[pos : pos + 2], "little")
            pos += 2
        else:  # copy, 4-byte offset
            if pos + 4 > len(data):
                raise AvroDecodeError("snappy: truncated copy-4 offset")
            length = (tag >> 2) + 1
            offset = int.from_bytes(data[pos : pos + 4], "little")
            pos += 4
        if offset == 0 or offset > len(out):
            raise AvroDecodeError("snappy: copy offset out of range")
        if len(out) + length > want:  # same bomb bound for copies
            raise AvroDecodeError("snappy: output exceeds preamble length")
        if offset >= length:
            start = len(out) - offset
            out += out[start : start + length]
        else:  # overlapping copy: byte-at-a-time
            for _ in range(length):
                out.append(out[-offset])
    if len(out) != want:
        raise AvroDecodeError(
            f"snappy: length mismatch (preamble {want}, got {len(out)})"
        )
    return bytes(out)
