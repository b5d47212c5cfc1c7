"""Engine error taxonomy, mirroring the reference's typed errors
(/root/reference/src/error.rs:21-119 — 22 variants + Avro sub-enum).

Only the *observable* variants are reproduced: the ones a user can
trigger through the format surface. Messages follow the reference
wording where tests in doc/ depend on it.
"""

from __future__ import annotations


class RqError(Exception):
    """Base of the engine's error hierarchy (error.rs:21)."""


class UnimplementedError(RqError):
    """error.rs `Unimplemented` — e.g. protobuf serialization
    (rq.rs:237-240 returns Error::Unimplemented)."""

    def __init__(self, feature: str):
        super().__init__(f"unimplemented: {feature}")
        self.feature = feature


class IllegalSequenceError(RqError):
    """CSV sink rejects nested/non-sequence records (csv.rs:60-110)."""


class IllegalRecordError(RqError):
    """Raw sink accepts only String/Bytes/Char (raw.rs:50-72)."""


class SyntaxError_(RqError):
    """Malformed input for the selected format (error.rs syntax arm);
    fail-fast: first bad record aborts the run (rq.rs:303-312)."""

    def __init__(self, format_name: str, message: str):
        super().__init__(f"syntax error in {format_name}: {message}")
        self.format_name = format_name


class AvroError(RqError):
    """Avro sub-enum (error.rs:13-14): schema/codec/value errors."""


class AvroUnsignedU64Error(AvroError):
    """avro.rs:94-113: values above i64::MAX cannot be written."""

    def __init__(self) -> None:
        super().__init__("Avro does not support unsigned 64 bit integer")


class AvroKeyError(AvroError):
    """avro.rs:127-146: map keys must be strings."""

    def __init__(self) -> None:
        super().__init__("Avro can only output string keys")


class ProtobufSchemaError(RqError):
    """Unknown message name / missing registry entry (proto_index.rs)."""


class MissingToolError(RqError):
    """protoc (or another external tool) not on PATH
    (proto_index.rs:41-65 shells out to protoc)."""
