"""Pure-Python LZ4 codec (formats/codecs/lz4_pure.py): xxh32 vectors,
round-trips, reference-CLI cross-validation both directions, frame
error paths, and totality fuzz."""

from __future__ import annotations

import random
import shutil
import struct
import subprocess

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from rq_spark.formats.codecs.lz4_pure import (
    Lz4Error,
    compress,
    decompress,
    xxh32,
)

LZ4_CLI = shutil.which("lz4")


def test_xxh32_reference_vectors():
    assert xxh32(b"") == 0x02CC5D05
    assert xxh32(b"a") == 0x550D7456
    assert xxh32(b"a" * 100) != xxh32(b"a" * 101)


def test_round_trip_fixed():
    cases = [
        b"",
        b"x",
        b"ab" * 100_000,           # multi-block, long matches
        bytes(range(256)) * 10,    # incompressible-ish -> stored block
        b"the quick brown fox " * 5_000,
    ]
    for d in cases:
        assert decompress(compress(d)) == d


@settings(max_examples=50, deadline=None)
@given(st.binary(max_size=3000))
def test_round_trip_property(data):
    assert decompress(compress(data)) == data


def test_checksum_and_header_errors():
    c = bytearray(compress(b"payload " * 200))
    c[-1] ^= 0xFF
    with pytest.raises(Lz4Error, match="content checksum"):
        decompress(bytes(c))
    c2 = bytearray(compress(b"data"))
    c2[6] ^= 0xFF  # inside the frame descriptor -> header checksum
    with pytest.raises(Lz4Error):
        decompress(bytes(c2))


def test_skippable_and_multi_frame():
    a, b = b"alpha " * 100, b"beta " * 100
    skip = struct.pack("<II", 0x184D2A51, 3) + b"xyz"
    assert decompress(compress(a) + skip + compress(b)) == a + b


def test_garbage_totality():
    rng = random.Random(99)
    base = compress(b"seed material " * 500)
    for _ in range(300):
        bad = bytearray(base)
        bad[rng.randrange(len(bad))] ^= 1 << rng.randrange(8)
        try:
            decompress(bytes(bad))
        except Lz4Error:
            pass  # only acceptable exception type
    for _ in range(200):
        junk = bytes(rng.randrange(256) for _ in range(rng.randrange(1, 300)))
        try:
            decompress(junk)
        except Lz4Error:
            pass


def test_bomb_ceiling():
    big = compress(b"A" * 3_000_000)
    with pytest.raises(Lz4Error, match="ceiling"):
        decompress(big, max_output=1_000)


@pytest.mark.skipif(LZ4_CLI is None, reason="no reference lz4 CLI")
def test_cli_cross_validation(tmp_path):
    rng = random.Random(4)
    data = b" ".join(b"w%d" % rng.randrange(500) for _ in range(30_000))
    src = tmp_path / "d.bin"
    src.write_bytes(data)
    for level in ("-1", "-9"):
        out = tmp_path / f"d{level}.lz4"
        subprocess.run([LZ4_CLI, level, "-q", "-f", str(src), str(out)], check=True)
        assert decompress(out.read_bytes()) == data
    ours = tmp_path / "ours.lz4"
    ours.write_bytes(compress(data))
    dec = tmp_path / "ours.out"
    subprocess.run([LZ4_CLI, "-d", "-q", "-f", str(ours), str(dec)], check=True)
    assert dec.read_bytes() == data
