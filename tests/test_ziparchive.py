"""ZIP archive reader (operators/ziparchive.py) — member iteration,
CRC verification, stored+deflated members, and the binaryFile scan."""

from __future__ import annotations

import io
import zipfile

import pytest

from rq_spark.operators import ziparchive as Z


def _zip_bytes(members, compression=zipfile.ZIP_DEFLATED):
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", compression=compression) as zf:
        for name, content in members:
            zf.writestr(name, content)
    return buf.getvalue()


def test_zip_member_iteration_and_sizes():
    data = _zip_bytes(
        [("a.txt", b"alpha " * 100), ("sub/b.json", b'{"k": 1}')]
    )
    out = list(Z.iter_members(data))
    assert [m[0] for m in out] == ["a.txt", "sub/b.json"]
    name, size, csize, crc, content = out[0]
    assert size == 600 and content == b"alpha " * 100
    assert csize < size  # deflate actually compressed
    import zlib

    assert crc == zlib.crc32(content)


def test_zip_stored_members_and_directories():
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", compression=zipfile.ZIP_STORED) as zf:
        zf.writestr("dir/", b"")
        zf.writestr("dir/file.bin", bytes(range(256)))
    out = list(Z.iter_members(buf.getvalue()))
    assert len(out) == 1  # directory entry skipped
    assert out[0][0] == "dir/file.bin" and out[0][4] == bytes(range(256))


def test_zip_crc_corruption_raises():
    data = bytearray(
        _zip_bytes([("x.txt", b"payload bytes here")], zipfile.ZIP_STORED)
    )
    pos = data.find(b"payload")
    data[pos] ^= 0xFF
    with pytest.raises(Z.ZipFormatError):
        list(Z.iter_members(bytes(data)))


def test_zip_rejections():
    assert not Z.is_zip(b"PKXX")
    with pytest.raises(Z.ZipFormatError):
        list(Z.iter_members(b"not a zip"))
    with pytest.raises(Z.ZipFormatError):
        list(Z.iter_members(b"PK\x03\x04" + b"\0" * 40))


def test_read_zip_binaryfile_scan(spark, tmp_path):
    (tmp_path / "batch-0.zip").write_bytes(
        _zip_bytes([("d0.txt", b"doc zero"), ("d1.txt", b"doc one")])
    )
    (tmp_path / "batch-1.zip").write_bytes(_zip_bytes([("d2.txt", b"doc two")]))
    (tmp_path / "readme.md").write_bytes(b"ignored")
    rows = Z.read_zip(spark, str(tmp_path)).collect()
    assert len(rows) == 3
    by_name = {r.member_name: r for r in rows}
    assert bytes(by_name["d2.txt"].member_bytes) == b"doc two"
    assert by_name["d0.txt"].archive_path.endswith("batch-0.zip")
    assert by_name["d0.txt"].member_size == 8
