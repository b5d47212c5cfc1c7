"""Pure-Python Zstandard codec (formats/codecs/zstd_pure.py, RFC 8878).

Coverage: xxh64 reference vectors, encoder round-trips (store + lz),
a baked reference-CLI golden (Huffman + FSE paths without needing the
binary), cross-validation against a real ``zstd`` CLI when present,
garbage/bitflip totality, the decompression-bomb bound, and loud
rejection of dictionaries / reserved block types.
"""

from __future__ import annotations

import random
import shutil
import struct
import subprocess

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from rq_spark.formats.codecs.zstd_pure import (
    ZstdError,
    compress,
    decompress,
    xxh64,
)

ZSTD_CLI = shutil.which("zstd")


def test_xxh64_reference_vectors():
    assert xxh64(b"") == 0xEF46DB3751D8E999
    assert xxh64(b"a") == 0xD24EC4F1A98C6E5B
    assert xxh64(b"abc") == 0x44BC2CF5AD770999
    # >32-byte path exercises the 4-lane accumulator
    assert xxh64(b"0123456789abcdef" * 4) == xxh64(b"0123456789abcdef" * 4)
    assert xxh64(b"x" * 33) != xxh64(b"x" * 32)


# reference zstd CLI v1.5.7, level 19 — compressed-literals (Huffman,
# FSE-coded weights) + FSE sequences in one block
_GOLDEN_SRC = (
    b"the spark query engine merges sorted runs; the spark query engine "
    b"shuffles hash partitions; the spark query engine broadcasts small "
    b"dimension tables to every executor node; " * 4
)
_GOLDEN_ZST = (
    b"(\xb5/\xfdd\xb4\x01-\x03\x00b\xc7\x14\x11\xa0\xed\xf0\xb7\x94Zx\xdf"
    b"\x13\xab\x85\x7fWu\xaab\r\x07J\x1a\xfb\xb6\x86Ce\xd4\xb7>\xab\x12"
    b"\xa1\xcf\x1ab\xa6\x0b\x91+\x15\x16\x9f\x9b\xc3 \xa1\xadh\xa8Qop?"
    b"\x1c\xceYU)\xf0\xf0\x013\xb8'\xda\xdb\xf8\xacfu]\x192L?W\xe1{\xda"
    b"\xe0\xf8z:\x04\x00\x04`\xa6\xd4\xabj\x1f\xaa\xc26W\xab2\xd2\xcc\xf1v"
)


def test_golden_cli_frame_decodes():
    assert decompress(_GOLDEN_ZST) == _GOLDEN_SRC


def test_round_trip_fixed_cases():
    cases = [
        b"",
        b"x",
        b"z" * 100_000,              # RLE block
        b"ab" * 50_000,              # short-period matches
        bytes(range(256)) * 600,     # incompressible-ish, multi-block
        b"the quick brown fox " * 2_000,
    ]
    for d in cases:
        for mode in ("store", "lz"):
            assert decompress(compress(d, mode=mode)) == d


@settings(max_examples=60, deadline=None)
@given(st.binary(max_size=4096), st.sampled_from(["store", "lz"]))
def test_round_trip_property(data, mode):
    assert decompress(compress(data, mode=mode)) == data


def test_multi_frame_and_skippable():
    a, b = b"alpha " * 50, b"beta " * 80
    skip = struct.pack("<II", 0x184D2A5E, 7) + b"ignored"
    blob = compress(a) + skip + compress(b, mode="store")
    assert decompress(blob) == a + b


def test_checksum_flip_is_detected():
    c = bytearray(compress(b"payload " * 100))
    c[-1] ^= 0xFF
    with pytest.raises(ZstdError, match="checksum"):
        decompress(bytes(c))


def test_dictionary_frames_rejected_loudly():
    # frame header: dict_flag=1, single-segment, FCS 1 byte, dict id 5
    frame = struct.pack("<I", 0xFD2FB528) + bytes([0x21, 5, 0]) + b"\x01\x00\x00"
    with pytest.raises(ZstdError, match="dictionary"):
        decompress(frame)


def test_reserved_block_type_rejected():
    frame = struct.pack("<I", 0xFD2FB528) + bytes([0x20, 4]) + bytes([0x07, 0, 0])
    with pytest.raises(ZstdError, match="reserved block"):
        decompress(frame)


def test_truncated_rle_block_errors_loudly():
    # no frame content size -> the RLE byte's absence must itself be
    # the error, not a silent empty run
    frame = struct.pack("<I", 0xFD2FB528) + bytes([0x00, 0x00]) + bytes(
        [0x03, 0x28, 0x00]
    )
    with pytest.raises(ZstdError, match="truncated RLE"):
        decompress(frame)


def test_bomb_bound_stops_early():
    big = compress(b"A" * 5_000_000, mode="lz")
    assert len(big) < 10_000  # the RLE path really compressed it
    with pytest.raises(ZstdError):
        decompress(big, max_output=1_000)


def test_garbage_totality():
    rng = random.Random(1234)
    for _ in range(300):
        junk = bytes(rng.randrange(256) for _ in range(rng.randrange(1, 400)))
        try:
            decompress(junk)
        except ZstdError:
            pass  # the only acceptable exception type


def test_bitflip_totality():
    rng = random.Random(77)
    base = compress((b"mixed payload %d " % 12345) * 500, mode="lz")
    for _ in range(300):
        b = bytearray(base)
        b[rng.randrange(len(b))] ^= 1 << rng.randrange(8)
        try:
            decompress(bytes(b))
        except ZstdError:
            pass


@pytest.mark.skipif(ZSTD_CLI is None, reason="no reference zstd CLI")
def test_cli_output_decodes(tmp_path):
    """Real-encoder streams at several levels (Huffman 1/4-stream,
    FSE tables, repeat modes, long matches) decode byte-exact."""
    rng = random.Random(5)
    words = [b"spark", b"query", b"join", b"the", b"merge", b"row"]
    data = b" ".join(rng.choice(words) for _ in range(60_000))
    src = tmp_path / "d.bin"
    src.write_bytes(data)
    for level in ("-1", "-5", "-19"):
        out = tmp_path / f"d{level}.zst"
        subprocess.run(
            [ZSTD_CLI, level, "-q", "-f", str(src), "-o", str(out)], check=True
        )
        assert decompress(out.read_bytes()) == data


@pytest.mark.skipif(ZSTD_CLI is None, reason="no reference zstd CLI")
def test_cli_accepts_our_frames(tmp_path):
    rng = random.Random(6)
    data = bytes(rng.randrange(256) for _ in range(10_000)) + b"tail " * 5_000
    for mode in ("store", "lz"):
        f = tmp_path / f"{mode}.zst"
        f.write_bytes(compress(data, mode=mode))
        out = tmp_path / f"{mode}.out"
        subprocess.run(
            [ZSTD_CLI, "-d", "-q", "-f", str(f), "-o", str(out)], check=True
        )
        assert out.read_bytes() == data


@pytest.mark.skipif(ZSTD_CLI is None, reason="no reference zstd CLI")
def test_streaming_decode_bounds_memory(tmp_path):
    """iter_decompress must flush past the declared window: on a
    64 KiB-window file (wlog=16) the output arrives in multiple
    window-bounded chunks that join byte-exact, instead of one
    shard-sized buffer."""
    from rq_spark.formats.codecs.zstd_pure import iter_decompress

    rng = random.Random(8)
    data = b"".join(
        (b"line %d %s\n" % (i, bytes(rng.randrange(97, 123) for _ in range(40))))
        for i in range(20_000)
    )
    src = tmp_path / "d.txt"
    src.write_bytes(data)
    out = tmp_path / "d.zst"
    subprocess.run(
        [ZSTD_CLI, "-1", "--zstd=wlog=16", "-q", "-f", str(src), "-o", str(out)],
        check=True,
    )
    chunks = list(iter_decompress(out.read_bytes()))
    assert len(chunks) > 3, "nothing streamed — whole-frame buffering"
    # retained state is bounded by window + one block
    assert max(len(c) for c in chunks[:-1]) <= (1 << 16) + 128 * 1024
    assert b"".join(chunks) == data


@pytest.mark.skipif(ZSTD_CLI is None, reason="no reference zstd CLI")
def test_decode_throughput_floor(tmp_path):
    # the trimmed windowed accumulator decodes huffman-literal-heavy
    # streams at ~2 MB/s; the floor is ~20x looser to stay robust on a
    # loaded box while catching a regression to the whole-stream
    # big-int shift (quadratic in literal-section size — the JPEG/TIFF
    # accumulator lesson)
    import time

    rng = random.Random(42)
    data = " ".join(f"w{rng.randrange(30000)}" for _ in range(100_000)).encode()
    src = tmp_path / "e.txt"
    src.write_bytes(data)
    out = tmp_path / "e.zst"
    subprocess.run([ZSTD_CLI, "-1", "-q", "-f", str(src), "-o", str(out)], check=True)
    t0 = time.time()
    assert decompress(out.read_bytes()) == data
    rate = len(data) / (time.time() - t0)
    assert rate > 100_000, f"{rate:.0f} B/s"


def test_lz_mode_actually_compresses():
    d = (b"a highly repetitive corpus line about spark executors\n") * 2_000
    c = compress(d, mode="lz")
    assert len(c) < len(d) // 10
