"""CLI-shim tests: the reference's 27 flag-parse unit tests
(src/bin/rq.rs:465-652) translated, plus end-to-end pipe goldens from
doc/tutorial.md and `protobuf add` registry semantics
(doc/protobuf.md:12-34).
"""

from __future__ import annotations

import io
import subprocess
import sys

import pytest

from rq_spark.cli import build_parser, main, select_input, select_output

REPO = __file__.rsplit("/tests/", 1)[0]


def parse_args(args):
    return build_parser().parse_args(args)


# ------------------------------------------------- rq.rs:476-483 kitchen sink


def test_kitchen_sink():
    a = parse_args(["-l", "info", "-j", "-P", ".foo.Bar", "select x"])
    assert a.input_json
    assert a.output_protobuf == ".foo.Bar"
    assert a.flag_log == "info"
    assert a.arg_query == "select x"


def test_no_args():
    a = parse_args([])
    assert select_input(a)[0] == "json"  # default (rq.rs:196-207)


def test_help_exits():
    with pytest.raises(SystemExit):
        parse_args(["--help"])


# ------------------------------------------------- per-flag short/long pairs

FLAG_CASES = [
    (["-j"], "input_json"), (["--input-json"], "input_json"),
    (["-J"], "output_json"), (["--output-json"], "output_json"),
    (["-r"], "input_raw"), (["--input-raw"], "input_raw"),
    (["-R"], "output_raw"), (["--output-raw"], "output_raw"),
    (["-v"], "input_csv"), (["--input-csv"], "input_csv"),
    (["-V"], "output_csv"), (["--output-csv"], "output_csv"),
    (["-c"], "input_cbor"), (["--input-cbor"], "input_cbor"),
    (["-C"], "output_cbor"), (["--output-cbor"], "output_cbor"),
    (["-m"], "input_message_pack"), (["--input-message-pack"], "input_message_pack"),
    (["-M"], "output_message_pack"), (["--output-message-pack"], "output_message_pack"),
    (["-t"], "input_toml"), (["--input-toml"], "input_toml"),
    (["-T"], "output_toml"), (["--output-toml"], "output_toml"),
    (["-y"], "input_yaml"), (["--input-yaml"], "input_yaml"),
    (["-Y"], "output_yaml"), (["--output-yaml"], "output_yaml"),
    (["-a"], "input_avro"), (["--input-avro"], "input_avro"),
]


@pytest.mark.parametrize("argv,attr", FLAG_CASES)
def test_format_flags(argv, attr):
    assert getattr(parse_args(argv), attr) is True


def test_input_protobuf_takes_message():
    # rq.rs:596-618
    a = parse_args(["-p", ".example.Person"])
    assert a.input_protobuf == ".example.Person"
    assert select_input(a) == ("protobuf", {"message": ".example.Person"})


def test_output_avro_takes_schema():
    a = parse_args(["-A", "schema.avsc", "--codec", "deflate"])
    assert a.output_avro == "schema.avsc"
    assert a.flag_codec == "deflate"


def test_format_values():
    # rq.rs:635-651: --format compact/readable/indented
    for v in ("compact", "readable", "indented"):
        assert parse_args(["--format", v]).flag_format == v
    with pytest.raises(SystemExit):
        parse_args(["--format", "bogus"])


def test_combined_short_flags():
    # doc/tutorial.md:31: -jC
    a = parse_args(["-jC"])
    assert select_input(a)[0] == "json"
    assert select_output(a)[0] == "cbor"


def test_output_style_default_is_compact_when_piped():
    a = parse_args([])
    fmt, opts = select_output(a)
    assert fmt == "json"
    assert opts["style"] in ("compact", "readable")  # tty-dependent (rq.rs:323-329)


# --------------------------------------------------------------- end-to-end


def run_cli(argv, stdin: bytes) -> bytes:
    r = subprocess.run(
        [sys.executable, "-m", "rq_spark.cli", *argv],
        input=stdin, capture_output=True, cwd=REPO,
    )
    assert r.returncode == 0, r.stderr.decode()
    return r.stdout


def test_e2e_tutorial_identity():
    assert run_cli([], b'null true {"a": 2.5}') == b'null\ntrue\n{"a":2.5}\n'


def test_e2e_tutorial_cbor_pipe():
    mid = run_cli(["-jC"], b'null true {"a": 2.5}')
    assert run_cli(["-cJ"], mid) == b'null\ntrue\n{"a":2.5}\n'


def test_e2e_csv_to_json():
    out = run_cli(["-vJ"], b"a,1\nb,2\n")
    assert out == b'["a","1"]\n["b","2"]\n'


def test_e2e_error_exit_code():
    r = subprocess.run(
        [sys.executable, "-m", "rq_spark.cli", "-V"],
        input=b'{"a": 1}', capture_output=True, cwd=REPO,
    )
    assert r.returncode == 1
    assert b"error" in r.stderr


# --------------------------------------------------------- protobuf registry


def test_protobuf_add_and_decode(tmp_path, monkeypatch):
    # doc/protobuf.md:12-34 layout semantics under RQ_SYSTEM_DIR
    monkeypatch.setenv("RQ_SYSTEM_DIR", str(tmp_path))
    from rq_spark.proto_registry import ProtoRegistry

    proto = tmp_path / "person.proto"
    proto.write_text(
        'syntax = "proto2";\npackage example;\n'
        "message Person { optional string name = 1; optional int32 id = 2; }\n"
    )
    reg = ProtoRegistry()
    dst = reg.add(proto)
    assert dst == reg.proto_dir / "person.proto"

    import shutil

    if shutil.which("protoc") is None:
        pytest.skip("protoc not installed in this environment")
    types = reg.types()
    assert ".example.Person" in types


def test_protobuf_add_base_relative(tmp_path, monkeypatch):
    monkeypatch.setenv("RQ_SYSTEM_DIR", str(tmp_path))
    from rq_spark.proto_registry import ProtoRegistry

    base = tmp_path / "src"
    (base / "nested").mkdir(parents=True)
    proto = base / "nested" / "x.proto"
    proto.write_text('syntax = "proto2";\nmessage X {}\n')
    reg = ProtoRegistry()
    dst = reg.add(proto, base=base)
    # --base keeps the relative layout (doc/protobuf.md:21-34)
    assert dst == reg.proto_dir / "nested" / "x.proto"
