"""Format-layer tests (SURVEY.md §5 item 2-3).

Covers: tutorial goldens (reference doc/tutorial.md:13-16,36-39),
hypothesis round-trip properties per codec, the documented lossy edges
and hard errors of SURVEY.md §1.4, and the Spark-level reader/writer
round trips.
"""

from __future__ import annotations

import json

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from rq_spark.errors import (
    AvroError,
    AvroKeyError,
    AvroUnsignedU64Error,
    IllegalRecordError,
    IllegalSequenceError,
    SyntaxError_,
    UnimplementedError,
)
from rq_spark.formats import decode_records, encode_records, transcode
from rq_spark.formats.codecs import avro as avro_codec

# ---------------------------------------------------------------- goldens


def test_tutorial_identity_json():
    # doc/tutorial.md:13-16: rq <<< 'null true {"a": 2.5}'
    out = transcode("json", "json", b'null true {"a": 2.5}')
    assert out == b'null\ntrue\n{"a":2.5}\n'


def test_tutorial_cbor_roundtrip():
    # doc/tutorial.md:36-39: (rq -jC | rq -cJ) <<< 'null true {"a": 2.5}'
    mid = transcode("json", "cbor", b'null true {"a": 2.5}')
    out = transcode("cbor", "json", mid)
    assert out == b'null\ntrue\n{"a":2.5}\n'


def test_json_is_ndjson_per_record():
    # json.rs:104-112: every record followed by newline
    out = transcode("json", "json", b"1 2 3")
    assert out == b"1\n2\n3\n"


def test_json_syntax_error_fail_fast():
    with pytest.raises(SyntaxError_):
        list(decode_records("json", b'{"a": 1} {broken'))


# ---------------------------------------------------- value round trips

# JSON-representable value trees (the cross-format common model)
json_scalars = st.none() | st.booleans() | st.integers(-(2**53), 2**53) | st.floats(
    allow_nan=False, allow_infinity=False, width=64
) | st.text(max_size=20)
json_values = st.recursive(
    json_scalars,
    lambda kids: st.lists(kids, max_size=4)
    | st.dictionaries(st.text(max_size=8), kids, max_size=4),
    max_leaves=12,
)


@settings(max_examples=60, deadline=None)
@given(json_values)
def test_cbor_roundtrip_property(v):
    from rq_spark.formats.codecs import cbor

    assert cbor.decode(cbor.encode(v)) == v


@settings(max_examples=60, deadline=None)
@given(json_values)
def test_msgpack_roundtrip_property(v):
    from rq_spark.formats.codecs import msgpack

    assert msgpack.decode(msgpack.encode(v)) == v


@settings(max_examples=40, deadline=None)
@given(json_values)
def test_json_pipe_roundtrip_property(v):
    data = json.dumps(v).encode()
    assert list(decode_records("json", data)) == [v]


@settings(max_examples=30, deadline=None)
@given(st.dictionaries(st.text(min_size=1, max_size=8).filter(str.isidentifier), json_values, max_size=4))
def test_yaml_roundtrip_property(doc):
    out = encode_records("yaml", [doc])
    back = list(decode_records("yaml", out))
    assert back == [doc]


def test_cbor_bytes_and_bignums():
    from rq_spark.formats.codecs import cbor

    for v in [b"\x00\xff", 2**40, -(2**40), 1.5, "snowman ☃"]:
        assert cbor.decode(cbor.encode(v)) == v


def test_msgpack_unsigned_preference():
    # messagepack.rs:63-94: Integer → u64-preferred
    from rq_spark.formats.codecs import msgpack

    big = 2**63 + 5  # above i64::MAX, valid u64
    assert msgpack.decode(msgpack.encode(big)) == big


def test_msgpack_invalid_utf8_string_errors():
    # messagepack.rs:73-77: invalid UTF-8 in str → the Format variant
    # (r9; previously misfiled under MessagePackDecode)
    from rq_spark.errors import FormatError
    from rq_spark.formats.codecs import msgpack

    bad = b"\xa2\xff\xfe"  # fixstr len 2 with invalid utf-8
    with pytest.raises(FormatError):
        msgpack.decode(bad)


# ----------------------------------------------------------- stream framing


def test_cbor_stream_back_to_back():
    from rq_spark.formats.codecs import cbor

    data = cbor.encode(1) + cbor.encode([2, 3]) + cbor.encode({"a": "b"})
    assert list(decode_records("cbor", data)) == [1, [2, 3], {"a": "b"}]


def test_yaml_only_first_document():
    # yaml.rs Option<R>::take — only the FIRST doc is read (SURVEY §2.1 S8)
    assert list(decode_records("yaml", b"a: 1\n---\nb: 2\n")) == [{"a": 1}]


def test_toml_whole_input_single_record():
    recs = list(decode_records("toml", b"[a]\nb = 1\nc = 'x'\n"))
    assert recs == [{"a": {"b": 1, "c": "x"}}]


def test_toml_roundtrip():
    doc = {"title": "t", "owner": {"name": "n", "age": 3}, "tags": [1, 2]}
    out = encode_records("toml", [doc])
    assert list(decode_records("toml", out)) == [doc]


def test_raw_lines():
    assert list(decode_records("raw", b"one\ntwo\n")) == ["one", "two"]
    assert encode_records("raw", ["x", b"y"]) == b"x\ny\n"


def test_csv_headerless_all_strings():
    # csv.rs:44-48: every field is a string, row = sequence
    assert list(decode_records("csv", b"a,1,2.5\nb,3,4\n")) == [
        ["a", "1", "2.5"],
        ["b", "3", "4"],
    ]


# ----------------------------------------------------------- error parity


def test_csv_rejects_non_sequence():
    with pytest.raises(IllegalSequenceError):
        encode_records("csv", [{"a": 1}])


def test_csv_rejects_nested():
    # csv.rs:60-110
    with pytest.raises(IllegalSequenceError):
        encode_records("csv", [[["nested"]]])


def test_raw_rejects_non_string():
    # raw.rs:50-72
    with pytest.raises(IllegalRecordError):
        encode_records("raw", [42])


def test_protobuf_sink_unimplemented():
    # rq.rs:237-240: Error::Unimplemented("protobuf serialization")
    with pytest.raises(UnimplementedError, match="protobuf serialization"):
        encode_records("protobuf", [1])


def test_avro_requires_schema():
    with pytest.raises(SyntaxError_):
        encode_records("avro", [1])


# ----------------------------------------------------------------- avro

PERSON_SCHEMA = {
    "type": "record",
    "name": "Person",
    "fields": [
        {"name": "name", "type": "string"},
        {"name": "id", "type": "long"},
        {"name": "email", "type": ["null", "string"]},
        {"name": "kind", "type": {"type": "enum", "name": "Kind", "symbols": ["A", "B"]}},
    ],
}


def _people():
    return [
        {"name": "ann", "id": 1, "email": "a@x", "kind": "A"},
        {"name": "bob", "id": 2, "email": None, "kind": "B"},
    ]


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_avro_container_roundtrip(codec):
    blob = encode_records("avro", _people(), schema=PERSON_SCHEMA, codec=codec)
    assert blob[:4] == b"Obj\x01"
    back = list(decode_records("avro", blob))
    # union unwrapped, enum decoded to symbol NAME (avro.rs:48-72)
    assert back == _people()


def test_avro_u64_overflow_errors():
    # avro.rs:94-113: "does not support unsigned 64 bit integer"
    schema = {"type": "record", "name": "R", "fields": [{"name": "v", "type": "long"}]}
    with pytest.raises(AvroUnsignedU64Error):
        encode_records("avro", [{"v": 2**63}], schema=schema)


def test_avro_map_keys_must_be_strings():
    # avro.rs:127-146 via the engine's map encoding
    schema = {"type": "map", "values": "long"}
    with pytest.raises(AvroKeyError):
        avro_codec.write_container(schema, [{1: 2}])


def test_avro_union_branch_fallthrough():
    # A value mismatching an earlier branch must fall through to a later
    # one even when the branch encoder raises a raw TypeError/ValueError
    # rather than AvroError (bytes('hi') -> TypeError must not abort).
    schema = {
        "type": "record",
        "name": "U",
        "fields": [{"name": "v", "type": ["bytes", "float", "string"]}],
    }
    for rec in ({"v": "hi"}, {"v": b"\x00"}, {"v": 1.5}):
        back = list(decode_records("avro", encode_records("avro", [rec], schema=schema)))
        assert back == [rec]
    # strict typing: a string numeral must pick the string branch, never
    # be coerced into the float branch by float("3")
    back = list(
        decode_records("avro", encode_records("avro", [{"v": "3"}], schema=schema))
    )
    assert back == [{"v": "3"}]


def test_avro_fixed_and_bytes():
    schema = {
        "type": "record",
        "name": "B",
        "fields": [
            {"name": "f", "type": {"type": "fixed", "name": "F4", "size": 4}},
            {"name": "b", "type": "bytes"},
        ],
    }
    rec = {"f": b"\x01\x02\x03\x04", "b": b"\xff"}
    back = list(decode_records("avro", encode_records("avro", [rec], schema=schema)))
    assert back == [rec]


# ------------------------------------------------------------- protobuf

# hand-encoded wire bytes for `.example.Person{name:"ann", id:5}` —
# field 1 (LEN) "ann", field 2 (VARINT) 5 — matching the reference
# tutorial message (doc/tutorial.md:45-46, doc/protobuf.md)
PERSON_TYPES = {
    ".example.Person": {
        "fields": {
            1: {"name": "name", "label": 1, "type": 9, "type_name": None},
            2: {"name": "id", "label": 1, "type": 5, "type_name": None},
            3: {"name": "email", "label": 1, "type": 9, "type_name": None},
        }
    }
}


def test_protobuf_decode_single():
    wire = b"\x0a\x03ann" + b"\x10\x05"
    recs = list(
        decode_records("protobuf", wire, message=".example.Person", registry=PERSON_TYPES)
    )
    assert recs == [{"name": "ann", "id": 5}]


def test_protobuf_requires_message_name():
    with pytest.raises(SyntaxError_):
        list(decode_records("protobuf", b""))


def test_protobuf_descriptor_set_parse():
    # minimal FileDescriptorSet: file{name,package=example,
    # message_type{name=Person, field{name=id,number=1,type=int64}}}
    from rq_spark.formats.protobuf import decode_message, parse_descriptor_set

    field = b"\x0a\x02id" + b"\x18\x01" + b"\x28\x03"  # name,number=1,type=TYPE_INT64
    msg = b"\x0a\x06Person" + b"\x12" + bytes([len(field)]) + field
    fdp = (
        b"\x0a\x07t.proto"
        + b"\x12\x07example"
        + b"\x22" + bytes([len(msg)]) + msg
    )
    fds = b"\x0a" + bytes([len(fdp)]) + fdp
    types = parse_descriptor_set(fds)
    assert ".example.Person" in types
    assert decode_message(b"\x08\x2a", ".example.Person", types) == {"id": 42}


# -------------------------------------------------------- spark surface


def test_spark_read_csv_sequence_shape(spark, tmp_path):
    from rq_spark.formats import spark_io

    p = tmp_path / "in.csv"
    p.write_text("a,1\nb,2\n")
    df = spark_io.read(spark, "csv", str(p), as_sequence=True)
    rows = [r.value for r in df.collect()]
    assert sorted(rows) == [["a", "1"], ["b", "2"]]


def test_spark_transcode_json_to_msgpack_and_back(spark, tmp_path):
    from rq_spark.formats import spark_io

    src = tmp_path / "in.json"
    src.write_text('{"a": 1, "s": "x"}\n{"a": 2, "s": "y"}\n')
    mp_dir = tmp_path / "mp"
    spark_io.transcode_path(spark, "json", str(src), "msgpack", str(mp_dir))
    df = spark_io.read(spark, "msgpack", str(mp_dir) + "/part-*")
    got = sorted((r.a, r.s) for r in df.collect())
    assert got == [(1, "x"), (2, "y")]


def test_spark_avro_roundtrip(spark, tmp_path):
    from rq_spark.formats import spark_io

    src = tmp_path / "in.json"
    src.write_text('{"id": 1, "name": "a"}\n{"id": 2, "name": "b"}\n')
    schema = {
        "type": "record",
        "name": "R",
        "fields": [{"name": "id", "type": "long"}, {"name": "name", "type": "string"}],
    }
    out = tmp_path / "avro"
    df = spark_io.read(spark, "json", str(src))
    spark_io.write(df, "avro", str(out), schema=schema, codec="deflate")
    back = spark_io.read(spark, "avro", str(out) + "/part-*")
    assert sorted((r.id, r.name) for r in back.collect()) == [(1, "a"), (2, "b")]


def test_spark_write_csv_rejects_nested(spark):
    from rq_spark.formats import spark_io
    from pyspark.sql import functions as F

    df = spark.range(1).select(F.array(F.lit(1)).alias("a"))
    with pytest.raises(IllegalSequenceError):
        spark_io.write(df, "csv", "/tmp/never")


def test_spark_write_is_committed(spark, tmp_path):
    """Codec writes are commit-protocol'd: _SUCCESS marker, no
    _temporary leftovers, containers only under final part names."""
    import os

    from rq_spark.formats import spark_io

    src = tmp_path / "in.json"
    src.write_text('{"a": 1}\n{"a": 2}\n')
    out = tmp_path / "out_cbor"
    df = spark_io.read(spark, "json", str(src))
    spark_io.write(df, "cbor", str(out))
    names = sorted(os.listdir(out))
    assert "_SUCCESS" in names
    assert "_temporary" not in names
    parts = [n for n in names if n.startswith("part-")]
    assert parts
    back = spark_io.read(spark, "cbor", str(out) + "/part-*")
    assert sorted(r.a for r in back.collect()) == [1, 2]


# ---------------------------------------- ordered/duplicate-key maps (§1.2)


def test_msgpack_duplicate_key_map_roundtrip():
    """Reference Map = ordered list of pairs (mod.rs:43-44): duplicate
    keys survive a msgpack→msgpack round trip byte-for-byte."""
    from rq_spark.formats.codecs import msgpack
    from rq_spark.formats.values import OrderedPairs

    # fixmap{2}: "a":1, "a":2
    raw = b"\x82\xa1a\x01\xa1a\x02"
    v = msgpack.decode(raw)
    assert v == OrderedPairs([("a", 1), ("a", 2)])
    assert msgpack.encode(v) == raw


def test_msgpack_nonstring_key_map():
    from rq_spark.formats.codecs import msgpack

    # fixmap{1}: 1 -> "x"  (int key stays a dict — hashable + unique)
    raw = b"\x81\x01\xa1x"
    assert msgpack.decode(raw) == {1: "x"}
    assert msgpack.encode({1: "x"}) == raw


def test_msgpack_unhashable_key_falls_back_to_pairs():
    from rq_spark.formats.codecs import msgpack
    from rq_spark.formats.values import OrderedPairs

    # fixmap{1}: [1] -> 2  (array key: unhashable in python)
    raw = b"\x81\x91\x01\x02"
    v = msgpack.decode(raw)
    assert v == OrderedPairs([([1], 2)])
    assert msgpack.encode(v) == raw


def test_cbor_duplicate_key_map_roundtrip():
    from rq_spark.formats.codecs import cbor
    from rq_spark.formats.values import OrderedPairs

    raw = bytes([0xA2, 0x61, ord("a"), 0x01, 0x61, ord("a"), 0x02])
    v = cbor.decode(raw)
    assert v == OrderedPairs([("a", 1), ("a", 2)])
    assert cbor.encode(v) == raw


def test_duplicate_key_map_to_json_keeps_both():
    out = transcode("msgpack", "json", b"\x82\xa1a\x01\xa1a\x02")
    assert out == b'{"a":1,"a":2}\n'


# --------------------------------------------------------- avro snappy gate


def test_avro_snappy_roundtrip():
    """Snappy container golden: works on every host — native binding
    when importable, else the bundled pure-Python block-format codec
    (r5; previously env-gated to an AvroError)."""
    blob = encode_records("avro", _people(), schema=PERSON_SCHEMA, codec="snappy")
    assert list(decode_records("avro", blob)) == _people()


def test_avro_snappy_crc_mismatch_detected():
    from rq_spark.errors import AvroDecodeError

    blob = bytearray(
        encode_records("avro", _people(), schema=PERSON_SCHEMA, codec="snappy")
    )
    # layout: ... block-bytes, CRC32 (last 4 of block), sync (16)
    blob[-17] ^= 0xFF  # flip a CRC byte
    with pytest.raises(AvroDecodeError, match="CRC"):
        list(decode_records("avro", bytes(blob)))


def test_avro_zstandard_roundtrip_and_corruption():
    """Avro spec `zstandard` codec via the bundled RFC 8878
    implementation: round-trip, real compression on repeated records,
    loud decode error on a corrupted block."""
    from rq_spark.errors import AvroDecodeError

    people = _people() * 50
    blob = encode_records("avro", people, schema=PERSON_SCHEMA, codec="zstandard")
    assert list(decode_records("avro", blob)) == people
    plain = encode_records("avro", people, schema=PERSON_SCHEMA, codec="null")
    assert len(blob) < len(plain) // 2  # really compressed

    bad = bytearray(blob)
    # layout: ... zstd frame (ends with its xxh64 checksum), sync(16);
    # flipping just before the sync corrupts the frame checksum
    bad[-17] ^= 0xFF
    with pytest.raises(AvroDecodeError, match="zstandard block corrupt"):
        list(decode_records("avro", bytes(bad)))


def test_avro_bzip2_and_xz_codecs():
    """The Avro spec's stdlib-backed codecs round-trip and reject a
    bad stream loudly; full spec codec set = null/deflate/snappy/
    zstandard/bzip2/xz."""
    from rq_spark.errors import AvroDecodeError

    people = _people() * 20
    for codec in ("bzip2", "xz"):
        blob = encode_records("avro", people, schema=PERSON_SCHEMA, codec=codec)
        assert list(decode_records("avro", blob)) == people
        bad = bytearray(blob)
        bad[-17] ^= 0xFF
        with pytest.raises(AvroDecodeError, match=f"{codec} block corrupt"):
            list(decode_records("avro", bytes(bad)))


def test_pure_snappy_full_tag_set():
    """The bundled codec must decode the FULL public tag set (real
    compressors emit copies), not just its own all-literal output."""
    from rq_spark.errors import AvroDecodeError
    from rq_spark.formats.codecs import snappy_pure as sp

    for payload in (b"", b"x", b"abc" * 10000, bytes(range(256)) * 300):
        assert sp.decompress(sp.compress(payload)) == payload

    # handcrafted: literal "ab" + copy-1(offset=2, len=6) — an
    # OVERLAPPING copy, byte-at-a-time semantics
    stream = bytes([8, (2 - 1) << 2]) + b"ab" + bytes([(2 << 2) | 1, 2])
    assert sp.decompress(stream) == b"abababab"

    # literal "abcd" + copy-2(offset=4, len=4)
    stream2 = (
        bytes([8, (4 - 1) << 2]) + b"abcd"
        + bytes([(3 << 2) | 2]) + (4).to_bytes(2, "little")
    )
    assert sp.decompress(stream2) == b"abcdabcd"

    # literal with a 1-byte explicit length (tag 60<<2)
    body = b"z" * 100
    stream3 = bytes([100, 60 << 2, 99]) + body
    assert sp.decompress(stream3) == body

    with pytest.raises(AvroDecodeError):
        sp.decompress(bytes([5, 0xFF, 0xFF]))  # truncated
    with pytest.raises(AvroDecodeError):
        sp.decompress(bytes([3, (1 << 2) | 1, 9]))  # offset beyond output


def test_pure_snappy_bomb_bounded():
    """r6 ADVICE fix: output growth is bounded INSIDE the decode loop —
    a crafted stream of repeated max-length copies must fail fast at
    the preamble length, not balloon memory first."""
    from rq_spark.errors import AvroDecodeError
    from rq_spark.formats.codecs import snappy_pure as sp

    # preamble says 4 bytes; stream emits a literal of 4 then tries to
    # keep copying 64-byte runs — must raise on the first excess copy
    bomb = (
        bytes([4, (4 - 1) << 2]) + b"abcd"
        + bytes([(63 << 2) | 2]) + (4).to_bytes(2, "little") * 1
    )
    with pytest.raises(AvroDecodeError, match="exceeds preamble"):
        sp.decompress(bomb)
    # oversized literal is bounded too
    with pytest.raises(AvroDecodeError, match="exceeds preamble"):
        sp.decompress(bytes([1, (3 - 1) << 2]) + b"xyz")
    # 64-bit-scale preamble varints are rejected outright
    with pytest.raises(AvroDecodeError, match="varint too long"):
        sp.decompress(bytes([0x80] * 5 + [0x01]))


# ------------------------------------------------- error taxonomy (P9)


def test_error_taxonomy_routes_to_typed_variants():
    """error.rs:21-119 parity: format failures surface as their typed
    variant, every variant under RqError, parse-side ones also under
    SyntaxError_ (fail-fast catch sites)."""
    from rq_spark import errors as E
    from rq_spark.formats.codecs import cbor, msgpack

    with pytest.raises(E.MessagePackDecodeError):
        msgpack.decode(b"\xc1")  # 0xC1 is never used
    with pytest.raises(E.MessagePackEncodeError):
        msgpack.encode(object())
    with pytest.raises(E.CborError):
        cbor.decode(b"\xff")  # lone break code
    with pytest.raises(E.JsonError):
        list(decode_records("json", b"{broken"))
    with pytest.raises(E.TomlDeserializeError):
        list(decode_records("toml", b"= nope"))
    with pytest.raises(E.YamlScanError):
        list(decode_records("yaml", b"a: [unclosed"))
    with pytest.raises(E.AvroDecodeError):
        list(decode_records("avro", b"NotAvro..."))
    with pytest.raises(E.NativeProtobufError):
        from rq_spark.formats.protobuf import read_varint

        read_varint(b"\xff", 0)  # truncated varint

    # hierarchy: parse-side variants are SyntaxError_ (fail-fast) and
    # every variant roots at RqError
    for cls in (E.JsonError, E.CborError, E.MessagePackDecodeError,
                E.YamlScanError, E.TomlDeserializeError, E.CsvError,
                E.AvroDecodeError, E.NativeProtobufError):
        assert issubclass(cls, E.SyntaxError_)
    for name in ("IoError", "Utf8Error", "UnimplementedError",
                 "IllegalStateError", "FormatError", "InternalError",
                 "MessageError", "MessagePackEncodeError",
                 "TomlSerializeError", "GlobError", "GlobPatternError",
                 "AvroParseSchemaError", "AvroSchemaResolutionError",
                 "AvroValidationError", "HjsonError"):
        assert issubclass(getattr(E, name), E.RqError), name
    assert issubclass(E.AvroDecodeError, E.AvroError)


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.tuples(st.text(max_size=6) | st.integers(-100, 100), json_values),
        max_size=5,
    )
)
def test_msgpack_pairs_roundtrip_property(pairs):
    """ANY pair list — duplicates, mixed key types — round-trips
    through msgpack with order and multiplicity preserved."""
    from rq_spark.formats.codecs import msgpack
    from rq_spark.formats.values import OrderedPairs, map_from_pairs

    v = map_from_pairs(pairs)
    back = msgpack.decode(msgpack.encode(v))
    if isinstance(v, OrderedPairs):
        assert back == v
    else:
        assert back == v  # dict path: keys unique+hashable


def test_spark_read_preserve_order(spark, tmp_path):
    """§4 known-hard (c): preserve_order attaches a monotone input
    index so strict FIFO order can be restored after parallelism."""
    from rq_spark.formats import spark_io

    src = tmp_path / "in.json"
    src.write_text("".join(f'{{"i": {i}}}\n' for i in range(100)))
    df = spark_io.read(spark, "json", str(src), preserve_order=True)
    rows = df.orderBy("_input_order").collect()
    assert [r.i for r in rows] == list(range(100))


# ----------------------------------- pairs across every sink (review r2 fixes)


def test_duplicate_key_map_to_yaml_keeps_both():
    """OrderedPairs must not crash PyYAML (RepresenterError) — YAML
    emission legally writes duplicate keys, matching serde_yaml."""
    out = transcode("msgpack", "yaml", b"\x82\xa1a\x01\xa1a\x02")
    assert out == b"a: 1\na: 2\n"


def test_duplicate_key_map_to_json_indented_stays_indented():
    """--format indented must not silently downgrade to compact when a
    record holds a dup-key map."""
    out = transcode(
        "msgpack", "json", b"\x82\xa1a\x01\xa1a\x02", out_opts={"style": "indented"}
    )
    assert out == b'{\n  "a": 1,\n  "a": 2\n}\n'


def test_pairs_json_key_coercion_matches_dict_path():
    """The same logical key serializes identically whether or not a
    duplicate forced the pairs fallback: true -> \"true\", not \"True\"."""
    from rq_spark.formats import _json_pairs
    from rq_spark.formats.values import OrderedPairs

    assert _json_pairs(OrderedPairs([(True, 1), (True, 2)])) == '{"true":1,"true":2}'
    assert _json_pairs(OrderedPairs([(None, 1), (None, 2)])) == '{"null":1,"null":2}'
    assert _json_pairs(OrderedPairs([(1, "x"), (1, "y")])) == '{"1":"x","1":"y"}'


def test_duplicate_key_map_to_toml_is_typed_error():
    from rq_spark.errors import TomlSerializeError

    with pytest.raises(TomlSerializeError, match="duplicate"):
        transcode("msgpack", "toml", b"\x82\xa1a\x01\xa1a\x02")
    # nested dup-key map inside a table hits the same typed error
    with pytest.raises(TomlSerializeError, match="duplicate"):
        transcode("msgpack", "toml", b"\x81\xa1t\x82\xa1a\x01\xa1a\x02")


def test_avro_enum_bad_symbol_is_typed_error():
    schema = {
        "type": "record",
        "name": "R",
        "fields": [
            {
                "name": "c",
                "type": {"type": "enum", "name": "Color", "symbols": ["RED", "GREEN"]},
            }
        ],
    }
    with pytest.raises(AvroError, match="PURPLE"):
        encode_records("avro", [{"c": "PURPLE"}], schema=schema)


# ------------------------------------------- avro round-trip property


_AVRO_PROP_SCHEMA = {
    "type": "record",
    "name": "Prop",
    "fields": [
        {"name": "u", "type": ["null", "long", "string", "bytes"]},
        {"name": "d", "type": "double"},
        {"name": "tags", "type": {"type": "array", "items": "string"}},
        {"name": "m", "type": {"type": "map", "values": "long"}},
        {
            "name": "c",
            "type": {"type": "enum", "name": "PropColor", "symbols": ["R", "G", "B"]},
        },
    ],
}

_avro_union = st.one_of(
    st.none(),
    st.integers(min_value=-(2**63), max_value=2**63 - 1),
    st.text(max_size=20),
    st.binary(max_size=20),
)
_avro_records = st.fixed_dictionaries(
    {
        "u": _avro_union,
        "d": st.floats(allow_nan=False, width=64),
        "tags": st.lists(st.text(max_size=10), max_size=4),
        "m": st.dictionaries(st.text(max_size=8), st.integers(-(2**31), 2**31), max_size=4),
        "c": st.sampled_from(["R", "G", "B"]),
    }
)


@settings(max_examples=60, deadline=None)
@given(st.lists(_avro_records, max_size=5))
def test_avro_roundtrip_property(records):
    """Container round trip over a schema that exercises every branch
    the round-2 fixes touched: 4-way unions (fallthrough on branch-type
    mismatch), enums, maps, arrays. First-match union semantics mean a
    bytes value that IS valid for no earlier branch lands on bytes."""
    blob = encode_records("avro", records, schema=_AVRO_PROP_SCHEMA)
    out = list(decode_records("avro", blob))
    assert out == records


def test_avro_union_mismatch_still_reports_no_branch():
    """A value that genuinely matches no branch keeps the classic
    error — the narrowed union catch only changes BUG handling."""
    from rq_spark.errors import AvroError

    out = bytearray()
    with pytest.raises(AvroError, match="matches no union branch"):
        avro_codec._encode(["null", "long"], "not-a-long", out, {})


def test_avro_union_branch_bug_surfaces_as_internal_error(monkeypatch):
    """A defective branch encoder (simulated: varint encoder raising
    TypeError AFTER the branch's type pre-check passed) must surface
    as InternalError — not be swallowed into a misleading 'matches no
    union branch' (ADVICE r2-r4, fixed r5)."""
    from rq_spark.errors import InternalError

    def buggy(n):
        raise TypeError("simulated encoder defect")

    monkeypatch.setattr(avro_codec, "_zigzag_encode", buggy)
    out = bytearray()
    with pytest.raises(InternalError, match="union branch encoder failed"):
        avro_codec._encode(["null", "long"], 7, out, {})


@pytest.mark.parametrize("fmt", ["json", "cbor"])
def test_spark_write_order_preserving_byte_parity(spark, tmp_path, fmt):
    """SURVEY §4 order preservation: a MULTI-partition distributed
    write with order_by must be byte-identical to the reference's
    single-threaded identity pipe over the same records — on both the
    Spark-native writer path (json) and the codec committer path
    (cbor). AQE partition coalescing is disabled for the write so the
    global sort genuinely lands in several range partitions (at real
    scale it always does); range partitions written in part order
    reproduce the total order by construction."""
    from rq_spark.formats import spark_io

    records = [{"i": i, "s": f"row-{i:03d}"} for i in range(100)]
    src = tmp_path / "in.json"
    src.write_text("".join(json.dumps(r) + "\n" for r in records))

    out = tmp_path / f"ordered_{fmt}"
    df = spark_io.read(spark, "json", str(src)).repartition(8)
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try:
        spark_io.write(df, fmt, str(out), order_by="i")
    finally:
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")

    parts = sorted(
        p for p in out.iterdir()
        if p.name.startswith("part-") and not p.name.endswith(".crc")
    )
    assert len(parts) >= 2, "round trip must actually exercise multiple partitions"
    got = b"".join(p.read_bytes() for p in parts)
    # both formats are headerless concatenated-value streams, so the
    # per-partition blobs concatenate to the single-process encoding
    assert got == encode_records(fmt, records)


@pytest.mark.parametrize("fmt", ["json", "msgpack"])
def test_transcode_path_order_parity_multifile(spark, tmp_path, fmt):
    """r6 (r5 advice #6): the FULL pipeline — a multi-FILE (hence
    multi-partition) source through ``transcode_path(order_by=...)``
    — concatenates in part order to exactly the bytes the reference's
    single-threaded identity pipe would emit over the sorted records.
    ≥4 output partitions so range boundaries are genuinely exercised
    on both the Spark-native writer (json) and the codec committer
    (msgpack)."""
    from rq_spark.formats import spark_io

    records = [{"i": i, "s": f"row-{i:04d}", "t": i % 7 == 0} for i in range(400)]
    src = tmp_path / "in_many"
    src.mkdir()
    for f in range(4):  # 4 source files, interleaved round-robin
        (src / f"chunk-{f}.json").write_text(
            "".join(json.dumps(r) + "\n" for r in records[f::4])
        )

    out = tmp_path / f"piped_{fmt}"
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try:
        spark_io.transcode_path(
            spark, "json", str(src), fmt, str(out), out_opts={"order_by": "i"}
        )
    finally:
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")

    parts = sorted(
        p for p in out.iterdir()
        if p.name.startswith("part-") and not p.name.endswith(".crc")
    )
    assert len(parts) >= 4, f"only {len(parts)} partitions — fixture too narrow"
    got = b"".join(p.read_bytes() for p in parts)
    assert got == encode_records(fmt, records)


@settings(max_examples=80, deadline=None)
@given(st.binary(max_size=4096))
def test_pure_snappy_roundtrip_property(payload):
    from rq_spark.formats.codecs import snappy_pure as sp

    assert sp.decompress(sp.compress(payload)) == payload


def test_pure_snappy_actually_compresses():
    """The r6 LZ77 matcher must beat 0.1 on repetitive input, stay
    ≈1.0 (plus preamble) on random bytes, and find a compressible
    tail after a long incompressible stretch (skip-ahead cap)."""
    import os

    from rq_spark.formats.codecs import snappy_pure as sp

    rep = b"hello snappy world " * 1000
    assert len(sp.compress(rep)) < len(rep) * 0.1
    assert sp.decompress(sp.compress(rep)) == rep

    rnd = os.urandom(20_000)
    z = sp.compress(rnd)
    assert len(z) <= len(rnd) + 16
    assert sp.decompress(z) == rnd

    mixed = os.urandom(50_000) + b"pattern tail " * 5000
    z = sp.compress(mixed)
    assert sp.decompress(z) == mixed
    assert len(z) < 50_000 + 5000 * 13 * 0.2  # tail compressed ≥ 5×
