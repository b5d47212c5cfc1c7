"""Generate the checked-in protobuf tutorial fixtures (no protoc
needed): a FileDescriptorSet for `.example.Person` plus a serialized
Person message, reproducing the reference tutorial golden
(doc/tutorial.md:45-46: `rq -p .example.Person < person.pb` →
{"name":"John","age":34}).

The descriptor set is hand-encoded from the PUBLIC descriptor.proto
field layout (FileDescriptorSet.file=1; FileDescriptorProto{name=1,
package=2, message_type=4}; DescriptorProto{name=1, field=2};
FieldDescriptorProto{name=1, number=3, label=4, type=5}).

Usage: python tools/make_person_fixture.py  (writes tests/data/)
"""

from __future__ import annotations

import os


def varint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def tag(fno: int, wt: int) -> bytes:
    return varint(fno << 3 | wt)


def ld(fno: int, payload: bytes) -> bytes:  # length-delimited
    return tag(fno, 2) + varint(len(payload)) + payload


def vi(fno: int, v: int) -> bytes:  # varint field
    return tag(fno, 0) + varint(v)


TYPE_STRING, TYPE_UINT32 = 9, 13
LABEL_OPTIONAL = 1


def build_descriptor_set() -> bytes:
    f_name = ld(1, b"name") + vi(3, 1) + vi(4, LABEL_OPTIONAL) + vi(5, TYPE_STRING)
    f_age = ld(1, b"age") + vi(3, 2) + vi(4, LABEL_OPTIONAL) + vi(5, TYPE_UINT32)
    person = ld(1, b"Person") + ld(2, f_name) + ld(2, f_age)
    file_proto = ld(1, b"example.proto") + ld(2, b"example") + ld(4, person)
    return ld(1, file_proto)


def build_person() -> bytes:
    return ld(1, b"John") + vi(2, 34)


if __name__ == "__main__":
    data_dir = os.path.join(os.path.dirname(__file__), "..", "tests", "data")
    os.makedirs(data_dir, exist_ok=True)
    with open(os.path.join(data_dir, "example_person.descriptor.pb"), "wb") as f:
        f.write(build_descriptor_set())
    with open(os.path.join(data_dir, "person.pb"), "wb") as f:
        f.write(build_person())
    print("wrote tests/data/example_person.descriptor.pb and tests/data/person.pb")
