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
import logging
import os
import sys

from .errors import IoError, MessageError, RqError
from .proto_registry import ProtoRegistry, default_dir

# avro_rs::Codec::from_str accepts exactly these (rq.rs:250-257); the
# pure-Python sink additionally supports zstandard as a documented
# spec-superset extension, rejected under --rq-parity.
_AVRO_CODECS_REFERENCE = ("null", "deflate", "snappy")
_AVRO_CODECS_SUPERSET = _AVRO_CODECS_REFERENCE + ("zstandard",)

_LOG = logging.getLogger("rq")

# ---------------------------------------------------------------- logging
# P10: -q / -l / --trace wired to real levels (rq.rs:392-408), with the
# reference's [LEVEL] [module] message format and per-level ansi_term
# colors on a tty stderr (rq.rs:423-463).

_LEVELS = {
    "off": logging.CRITICAL + 10,
    "error": logging.ERROR,
    "warn": logging.WARNING,
    "info": logging.INFO,
    "debug": logging.DEBUG,
    "trace": logging.DEBUG,  # python logging has no TRACE tier
}

_LEVEL_COLORS = {  # (front, back) SGR — rq.rs:434-440
    logging.ERROR: ("31", "2;31"),
    logging.WARNING: ("33", "2;33"),
    logging.INFO: ("34", "2;34"),
    logging.DEBUG: ("35", "2;35"),
}


class _LogFormatter(logging.Formatter):
    def format(self, record: logging.LogRecord) -> str:
        level = "WARN" if record.levelno == logging.WARNING else record.levelname
        msg = record.getMessage()
        if sys.stderr.isatty():
            front, back = _LEVEL_COLORS.get(record.levelno, ("37", "2;37"))

            def f(s):
                return f"\x1b[{front}m{s}\x1b[0m"

            def b(s):
                return f"\x1b[{back}m{s}\x1b[0m"

            return f"{b('[')}{f(level)}{b(']')} {b('[')}{f(record.name)}{b(']')} {f(msg)}"
        return f"[{level}] [{record.name}] {msg}"


def setup_log(spec: str | None, quiet: bool) -> None:
    root = logging.getLogger()
    for h in list(root.handlers):
        root.removeHandler(h)
    handler = logging.StreamHandler(sys.stderr)
    handler.setFormatter(_LogFormatter())
    root.addHandler(handler)
    if quiet:
        level = _LEVELS["off"]
    elif spec:
        level = _LEVELS.get(spec.lower(), logging.INFO)
    elif os.environ.get("RQ_LOG") or os.environ.get("RUST_LOG"):
        env = (os.environ.get("RQ_LOG") or os.environ.get("RUST_LOG", "")).lower()
        level = _LEVELS.get(env, logging.INFO)
    else:
        level = logging.INFO  # env_logger default filter (rq.rs:404)
    root.setLevel(level)


# ------------------------------------------------------- first-run warnings
# P8: "has-ran-help" marker files under the config dir suppress the
# default-format warnings after --help/--version has been shown once
# (rq.rs:331-357).


def _has_ran(cmd: str) -> bool:
    return (default_dir() / f"has-ran-{cmd}").exists()


def _warnings_suppressed() -> bool:
    return _has_ran("help") or _has_ran("version")


def _set_ran(cmd: str) -> None:
    d = default_dir()
    try:
        d.mkdir(parents=True, exist_ok=True)
        (d / f"has-ran-{cmd}").touch()
    except OSError:
        pass  # parity: set_ran_cmd swallows path errors (rq.rs:342-347)


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
                   help="avro output codec: null, deflate, snappy "
                        "(+ zstandard, a spec-superset extension the "
                        "reference rejects; see --rq-parity)")
    p.add_argument("--rq-parity", action="store_true", dest="rq_parity",
                   help="strict reference-parity mode: reject "
                        "spec-superset extensions (e.g. the zstandard "
                        "Avro codec, rq.rs:250-257 accepts only "
                        "null/deflate/snappy)")

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
    p.add_argument("-l", "--log", dest="flag_log", default=None,
                   help="log level/filter: off, error, warn, info, debug, trace")
    p.add_argument("-q", "--quiet", action="store_true", dest="flag_quiet",
                   help="log nothing")
    p.add_argument("--trace", action="store_true", dest="flag_trace",
                   help="include a backtrace in error reports")
    p.add_argument("--version", action="version", version="rq_spark 1.0.4-spark")
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
        try:
            schema = open(ns.output_avro).read()
        except OSError as e:
            raise IoError("IO error") from e  # error.rs `Io` variant
        opts = {"schema": schema}
        if ns.flag_codec:
            # codec validated HERE, only on the avro output path —
            # exactly where the reference parses it (rq.rs:245-257;
            # --codec without -A is ignored there too)
            allowed = (
                _AVRO_CODECS_REFERENCE if ns.rq_parity else _AVRO_CODECS_SUPERSET
            )
            if ns.flag_codec not in allowed:
                # byte-parity with rq.rs:253-256 (Error::Message)
                raise MessageError(f"illegal Avro codec: {ns.flag_codec}")
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


def _warn_default_format(ns, argv: list[str], in_fmt: str) -> None:
    """First-run warnings for implicitly-selected input modes
    (rq.rs:186-207): bare `-v` CSV mode, or no input flag at all."""
    if in_fmt == "csv" and "-v" in argv and not _warnings_suppressed():
        _LOG.warning("You started rq -v, which puts it in CSV input mode.")
        _LOG.warning(
            "It's now waiting for CSV input, which might not be what you wanted."
        )
        _LOG.warning(
            "Specify --input-csv explicitly or run rq --help once to "
            "suppress this warning."
        )
    elif in_fmt == "json" and not ns.input_json and not _warnings_suppressed():
        _LOG.warning(
            "You started rq without any input flags, which puts it in "
            "JSON input mode."
        )
        _LOG.warning(
            "It's now waiting for JSON input, which might not be what you wanted."
        )
        _LOG.warning(
            "Specify (-j|--input-json) explicitly or run rq --help once "
            "to suppress this warning."
        )


def _emit_chained(prefix: str, exc: BaseException) -> None:
    """One cause-chain entry: first line prefixed, continuation lines
    indented two spaces — rq.rs:361-372's exact line layout."""
    lines = str(exc).splitlines() or [""]
    _LOG.error("%s: %s", prefix, lines[0])
    for line in lines[1:]:
        _LOG.error("  %s", line)


def _log_error(e: BaseException, trace: bool) -> None:
    """Cause-chain error report (rq.rs:359-390)."""
    _emit_chained("Encountered", e)
    cause = e.__cause__
    while cause is not None:
        _emit_chained("Caused by", cause)
        cause = cause.__cause__
    if trace or os.environ.get("RUST_BACKTRACE") == "1":
        import traceback

        _LOG.error("")
        _LOG.error("Backtrace:")
        for line in "".join(traceback.format_exception(e)).splitlines():
            _LOG.error("  %s", line)
    else:
        _LOG.error("(Re-run with --trace or RUST_BACKTRACE=1 for a backtrace)")


def main(argv: list[str] | None = None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    sub = _split_subcommand(argv)
    if sub is not None:
        # the subcommand fails through the SAME cause-chain report as
        # the pipeline (the reference's run() returns its errors to
        # log_error, rq.rs:96-113 + 359-390); a missing/unreadable
        # schema file is the `Io` variant
        setup_log(None, False)
        try:
            ProtoRegistry().add(sub.schema, base=sub.base)
        except RqError as e:
            _log_error(e, False)
            return 1
        except OSError as e:
            err = IoError("IO error")
            err.__cause__ = e
            _log_error(err, False)
            return 1
        return 0

    try:
        ns = build_parser().parse_args(argv)
    except SystemExit as e:
        # --help/--version displayed → remember, to suppress the
        # default-format warning from now on (rq.rs:126-131)
        if e.code == 0:
            _set_ran("version" if "--version" in argv else "help")
        return e.code if isinstance(e.code, int) else 0

    setup_log(ns.flag_log, ns.flag_quiet)
    in_fmt, in_opts = select_input(ns)
    _warn_default_format(ns, argv, in_fmt)
    try:
        # inside the guard: schema-file IO and codec validation fail
        # through the same cause-chain report as the pipeline proper
        # (the reference's run() returns all of these to log_error)
        out_fmt, out_opts = select_output(ns)
        if in_fmt == "protobuf":
            reg = ProtoRegistry()
            in_opts["registry"] = reg.types()
        from .formats import transcode

        data = sys.stdin.buffer.read()
        sys.stdout.buffer.write(transcode(in_fmt, out_fmt, data, in_opts, out_opts))
        sys.stdout.buffer.flush()
    except RqError as e:
        # fail-fast with cause-chain message (rq.rs:359-390)
        _log_error(e, ns.flag_trace)
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
