"""Protobuf source: wire-format decoder driven by a FileDescriptorSet,
written from the public protobuf encoding spec
(protobuf.dev/programming-guides/encoding) and the public
descriptor.proto field layout. No protobuf runtime exists in this
environment, so the engine parses descriptor sets itself.

Reference parity (SURVEY.md §2.1 S6, §3 E2):
* input requires a registered schema, addressed as a leading-dot
  fully-qualified name (doc/protobuf.md:39-44);
* exactly ONE message per stream (protobuf.rs:24-38 read-once flag);
* serialization is UNIMPLEMENTED (rq.rs:237-240) — see formats.__init__.
"""

from __future__ import annotations

import struct
from ..errors import NativeProtobufError, ProtobufSchemaError, SyntaxError_

# wire types
_VARINT, _I64, _LEN, _SGROUP, _EGROUP, _I32 = 0, 1, 2, 3, 4, 5

# FieldDescriptorProto.Type values (public descriptor.proto)
TYPE_DOUBLE, TYPE_FLOAT, TYPE_INT64, TYPE_UINT64, TYPE_INT32 = 1, 2, 3, 4, 5
TYPE_FIXED64, TYPE_FIXED32, TYPE_BOOL, TYPE_STRING, TYPE_GROUP = 6, 7, 8, 9, 10
TYPE_MESSAGE, TYPE_BYTES, TYPE_UINT32, TYPE_ENUM = 11, 12, 13, 14
TYPE_SFIXED32, TYPE_SFIXED64, TYPE_SINT32, TYPE_SINT64 = 15, 16, 17, 18

LABEL_REPEATED = 3


def read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    shift, acc = 0, 0
    while True:
        if pos >= len(buf):
            raise NativeProtobufError("truncated varint")
        b = buf[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            return acc, pos
        shift += 7
        if shift > 70:
            raise NativeProtobufError("varint too long")


def parse_fields(buf: bytes):
    """Raw wire fields: yields (field_number, wire_type, raw_value)."""
    pos = 0
    while pos < len(buf):
        key, pos = read_varint(buf, pos)
        fno, wt = key >> 3, key & 7
        if wt == _VARINT:
            v, pos = read_varint(buf, pos)
        elif wt == _I64:
            v, pos = buf[pos : pos + 8], pos + 8
        elif wt == _LEN:
            n, pos = read_varint(buf, pos)
            v, pos = buf[pos : pos + n], pos + n
        elif wt == _I32:
            v, pos = buf[pos : pos + 4], pos + 4
        else:
            raise NativeProtobufError(f"unsupported wire type {wt}")
        yield fno, wt, v


# ------------------------------------------------------- descriptor parsing
# Minimal structural parse of FileDescriptorSet using only public field
# numbers: FileDescriptorSet.file=1; FileDescriptorProto{name=1,
# package=2, message_type=4, enum_type=5}; DescriptorProto{name=1,
# field=2, nested_type=3, enum_type=4}; FieldDescriptorProto{name=1,
# number=3, label=4, type=5, type_name=6}; EnumDescriptorProto{name=1,
# value=2}; EnumValueDescriptorProto{name=1, number=2}.


def _group(buf: bytes) -> dict[int, list]:
    out: dict[int, list] = {}
    for fno, _wt, v in parse_fields(buf):
        out.setdefault(fno, []).append(v)
    return out


def _parse_enum(buf: bytes) -> dict[int, str]:
    g = _group(buf)
    values = {}
    for vb in g.get(2, []):
        vg = _group(vb)
        name = vg[1][0].decode() if 1 in vg else "?"
        number = vg[2][0] if 2 in vg else 0
        values[number] = name
    return values


def _parse_message_type(buf: bytes, prefix: str, types: dict) -> None:
    g = _group(buf)
    name = g[1][0].decode()
    fq = f"{prefix}.{name}"
    fields = {}
    for fb in g.get(2, []):
        fg = _group(fb)
        fields[fg[3][0]] = {
            "name": fg[1][0].decode(),
            "label": fg.get(4, [1])[0],
            "type": fg.get(5, [TYPE_BYTES])[0],
            "type_name": fg[6][0].decode() if 6 in fg else None,
        }
    types[fq] = {"fields": fields}
    for nb in g.get(3, []):
        _parse_message_type(nb, fq, types)
    for eb in g.get(4, []):
        eg = _group(eb)
        types[f"{fq}.{eg[1][0].decode()}"] = {"enum": _parse_enum(eb)}


def parse_descriptor_set(buf: bytes) -> dict:
    """FileDescriptorSet bytes → {'.pkg.Msg': {...}} type index."""
    types: dict = {}
    for fno, _wt, fb in parse_fields(buf):
        if fno != 1:
            continue
        fg = _group(fb)
        pkg = f".{fg[2][0].decode()}" if 2 in fg else ""
        for mb in fg.get(4, []):
            _parse_message_type(mb, pkg, types)
        for eb in fg.get(5, []):
            eg = _group(eb)
            types[f"{pkg}.{eg[1][0].decode()}"] = {"enum": _parse_enum(eb)}
    return types


# ------------------------------------------------------------- decoding


def _zigzag(v: int) -> int:
    return (v >> 1) ^ -(v & 1)


def _to_signed(v: int, bits: int) -> int:
    return v - (1 << bits) if v >= 1 << (bits - 1) else v


def decode_message(buf: bytes, fq_name: str, types: dict):
    if fq_name not in types or "fields" not in types[fq_name]:
        raise ProtobufSchemaError(f"no message type {fq_name!r} in registry")
    fields = types[fq_name]["fields"]
    out: dict = {}
    for fno, wt, raw in parse_fields(buf):
        f = fields.get(fno)
        if f is None:
            continue  # unknown field: skipped, like every proto decoder
        name, ftype = f["name"], f["type"]
        repeated = f["label"] == LABEL_REPEATED
        if wt == _LEN and repeated and ftype in _PACKABLE:
            vals = _decode_packed(raw, ftype)
            out.setdefault(name, []).extend(vals)
            continue
        v = _decode_value(raw, wt, f, types)
        if repeated:
            out.setdefault(name, []).append(v)
        else:
            out[name] = v
    return out


_PACKABLE = {
    TYPE_DOUBLE, TYPE_FLOAT, TYPE_INT64, TYPE_UINT64, TYPE_INT32,
    TYPE_FIXED64, TYPE_FIXED32, TYPE_BOOL, TYPE_UINT32, TYPE_ENUM,
    TYPE_SFIXED32, TYPE_SFIXED64, TYPE_SINT32, TYPE_SINT64,
}


def _decode_packed(raw: bytes, ftype: int) -> list:
    out, pos = [], 0
    while pos < len(raw):
        if ftype in (TYPE_DOUBLE, TYPE_FIXED64, TYPE_SFIXED64):
            out.append(_decode_value(raw[pos : pos + 8], _I64, {"type": ftype, "type_name": None}, {}))
            pos += 8
        elif ftype in (TYPE_FLOAT, TYPE_FIXED32, TYPE_SFIXED32):
            out.append(_decode_value(raw[pos : pos + 4], _I32, {"type": ftype, "type_name": None}, {}))
            pos += 4
        else:
            v, pos = read_varint(raw, pos)
            out.append(_decode_varint_value(v, ftype, None, {}))
    return out


def _decode_varint_value(v: int, ftype: int, type_name, types):
    if ftype == TYPE_BOOL:
        return bool(v)
    if ftype in (TYPE_SINT32, TYPE_SINT64):
        return _zigzag(v)
    if ftype in (TYPE_INT32, TYPE_INT64):
        return _to_signed(v, 64)
    if ftype == TYPE_ENUM:
        enum = types.get(type_name, {}).get("enum", {}) if type_name else {}
        return enum.get(v, v)  # symbol name, parity with Avro enum→name
    return v  # uint32/uint64


def _decode_value(raw, wt: int, f: dict, types: dict):
    ftype, type_name = f["type"], f.get("type_name")
    if wt == _VARINT:
        return _decode_varint_value(raw, ftype, type_name, types)
    if wt == _I64:
        if ftype == TYPE_DOUBLE:
            return struct.unpack("<d", raw)[0]
        v = struct.unpack("<Q", raw)[0]
        return _to_signed(v, 64) if ftype == TYPE_SFIXED64 else v
    if wt == _I32:
        if ftype == TYPE_FLOAT:
            return struct.unpack("<f", raw)[0]
        v = struct.unpack("<I", raw)[0]
        return _to_signed(v, 32) if ftype == TYPE_SFIXED32 else v
    # length-delimited
    if ftype == TYPE_STRING:
        return raw.decode("utf-8")
    if ftype == TYPE_BYTES:
        return bytes(raw)
    if ftype in (TYPE_MESSAGE, TYPE_GROUP) and type_name:
        return decode_message(raw, type_name, types)
    return bytes(raw)


def decode_single(data: bytes, message: str, registry=None):
    """One message per stream (S6). `registry` is a ProtoRegistry or a
    raw type index."""
    if registry is None:
        raise ProtobufSchemaError("protobuf input requires a schema registry")
    types = registry.types() if hasattr(registry, "types") else registry
    if not message.startswith("."):
        message = "." + message  # leading-dot FQN convention (doc/protobuf.md:39-44)
    return decode_message(data, message, types)
