"""CLI shim mirroring the reference's flag surface
(/root/reference/src/bin/rq.rs:14-120).

Records are read from stdin, processed (identity pipeline,
rq.rs:303-312), and written to stdout. Lower-case single-letter flag =
input format, upper-case = output format (doc/tutorial.md:27-31). JSON
is the default on both sides (rq.rs:196-207, 286-292); output style is
inferred from the terminal: tty → readable, pipe → compact
(rq.rs:216,323-329), overridable with --format.

The shim runs the in-process pipe layer (`rq_spark.formats.transcode`)
— no Spark session — because the reference's CLI is a single-threaded
pipe; the distributed path is `rq_spark.formats.spark_io` for files.
"""

from __future__ import annotations

import argparse
import sys

from .errors import RqError
from .proto_registry import ProtoRegistry


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="rq",
        description="A tool for manipulating data records. Records are read "
        "from stdin, processed, and written to stdout.",
    )
    p.add_argument("arg_query", nargs="?", default=None,
                   help="a query indicating how to transform each record "
                        "(vestigial in the reference: rq.rs:31-32 — accepted, unused)")
    p.add_argument("--format", dest="flag_format", default=None,
                   choices=["compact", "readable", "indented"],
                   help="force stylistic output formatting")
    p.add_argument("--codec", dest="flag_codec", default=None,
                   help="avro output codec: null, deflate, snappy")

    # input formats (rq.rs:42-67)
    p.add_argument("-a", "--input-avro", action="store_true", dest="input_avro",
                   help="input is an Apache Avro container file")
    p.add_argument("-c", "--input-cbor", action="store_true", dest="input_cbor",
                   help="input is a series of CBOR values")
    p.add_argument("-j", "--input-json", action="store_true", dest="input_json",
                   help="input is white-space separated JSON values (default)")
    p.add_argument("-v", "--input-csv", action="store_true", dest="input_csv",
                   help="input is CSV")
    p.add_argument("-m", "--input-message-pack", action="store_true", dest="input_message_pack",
                   help="input is formatted as MessagePack")
    p.add_argument("-p", "--input-protobuf", dest="input_protobuf", default=None,
                   metavar="MSG", help="input is a protobuf message of this type (-p .fq.Name)")
    p.add_argument("-r", "--input-raw", action="store_true", dest="input_raw",
                   help="input is plain text")
    p.add_argument("-t", "--input-toml", action="store_true", dest="input_toml",
                   help="input is formatted as TOML document")
    p.add_argument("-y", "--input-yaml", action="store_true", dest="input_yaml",
                   help="input is a series of YAML documents")

    # output formats (rq.rs:69-86)
    p.add_argument("-A", "--output-avro", dest="output_avro", default=None,
                   metavar="SCHEMA", help="output Avro with this schema file")
    p.add_argument("-C", "--output-cbor", action="store_true", dest="output_cbor")
    p.add_argument("-J", "--output-json", action="store_true", dest="output_json")
    p.add_argument("-R", "--output-raw", action="store_true", dest="output_raw")
    p.add_argument("-V", "--output-csv", action="store_true", dest="output_csv")
    p.add_argument("-M", "--output-message-pack", action="store_true",
                   dest="output_message_pack")
    p.add_argument("-P", "--output-protobuf", dest="output_protobuf", default=None,
                   metavar="MSG")
    p.add_argument("-T", "--output-toml", action="store_true", dest="output_toml")
    p.add_argument("-Y", "--output-yaml", action="store_true", dest="output_yaml")

    # logging (rq.rs:88-93)
    p.add_argument("-l", "--log", dest="flag_log", default=None)
    p.add_argument("-q", "--quiet", action="store_true", dest="flag_quiet")
    p.add_argument("--trace", action="store_true", dest="flag_trace")
    return p


def _split_subcommand(argv: list[str]):
    """`rq protobuf add <schema> [-b base]` (rq.rs:96-113)."""
    if argv and argv[0] == "protobuf":
        sp = argparse.ArgumentParser(prog="rq protobuf add")
        sp.add_argument("add", choices=["add"])
        sp.add_argument("schema")
        sp.add_argument("-b", "--base", default=None)
        return sp.parse_args(argv[1:])
    return None


def select_input(ns) -> tuple[str, dict]:
    """First-match dispatch, mirroring rq.rs:157-208's if/else chain."""
    if ns.input_protobuf:
        return "protobuf", {"message": ns.input_protobuf}
    if ns.input_avro:
        return "avro", {}
    if ns.input_cbor:
        return "cbor", {}
    if ns.input_message_pack:
        return "msgpack", {}
    if ns.input_toml:
        return "toml", {}
    if ns.input_yaml:
        return "yaml", {}
    if ns.input_csv:
        return "csv", {}
    if ns.input_raw:
        return "raw", {}
    return "json", {}  # default (rq.rs:196-207)


def select_output(ns) -> tuple[str, dict]:
    """Mirrors rq.rs:210-293."""
    if ns.output_protobuf is not None:
        return "protobuf", {}
    if ns.output_avro is not None:
        opts = {"schema": open(ns.output_avro).read()}
        if ns.flag_codec:
            opts["codec"] = ns.flag_codec
        return "avro", opts
    if ns.output_cbor:
        return "cbor", {}
    if ns.output_message_pack:
        return "msgpack", {}
    if ns.output_toml:
        return "toml", {}
    if ns.output_yaml:
        return "yaml", {}
    if ns.output_csv:
        return "csv", {}
    if ns.output_raw:
        return "raw", {}
    style = ns.flag_format or ("readable" if sys.stdout.isatty() else "compact")
    return "json", {"style": style}  # default + tty inference (rq.rs:216,323-329)


def main(argv: list[str] | None = None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    sub = _split_subcommand(argv)
    if sub is not None:
        ProtoRegistry().add(sub.schema, base=sub.base)
        return 0

    ns = build_parser().parse_args(argv)
    in_fmt, in_opts = select_input(ns)
    out_fmt, out_opts = select_output(ns)
    if in_fmt == "protobuf":
        reg = ProtoRegistry()
        in_opts["registry"] = reg.types()
    from .formats import transcode

    try:
        data = sys.stdin.buffer.read()
        sys.stdout.buffer.write(transcode(in_fmt, out_fmt, data, in_opts, out_opts))
        sys.stdout.buffer.flush()
    except RqError as e:
        # fail-fast with cause-chain message (rq.rs:359-390)
        print(f"rq: error: {e}", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
