"""Ogg and Matroska/WebM container parsers (operators/containers.py) —
stub round-trips, CRC verification, lacing edge cases, EBML walking,
and the strict decode_audio / decode_video_meta dispatch branches."""

from __future__ import annotations

import struct

import pytest

from rq_spark.operators import containers as C


def test_ogg_opus_roundtrip():
    b = C.ogg_opus_stub_bytes(48000 * 3, ch=2)
    codec, rate, ch, n, dur = C.ogg_params(b)
    assert (codec, rate, ch, n) == ("opus", 48000, 2, 48000 * 3)
    assert dur == 3.0


def test_ogg_vorbis_roundtrip():
    b = C.ogg_vorbis_stub_bytes(88200, rate=44100, ch=1)
    codec, rate, ch, n, dur = C.ogg_params(b)
    assert (codec, rate, ch, n, dur) == ("vorbis", 44100, 1, 88200, 2.0)


def test_ogg_preskip_subtracted():
    b = C.ogg_opus_stub_bytes(1000, preskip=312)
    assert C.ogg_params(b)[3] == 1000  # granule = 1000+312, minus preskip


def test_ogg_crc_rejects_bitflip():
    b = bytearray(C.ogg_opus_stub_bytes(480))
    b[-1] ^= 0x01  # flip inside the last page body
    with pytest.raises(C.ContainerFormatError):
        C.ogg_params(bytes(b))


def test_ogg_truncation_rejected():
    b = C.ogg_vorbis_stub_bytes(500)
    with pytest.raises(C.ContainerFormatError):
        C.ogg_params(b[:-3])
    with pytest.raises(C.ContainerFormatError):
        C.ogg_params(b"OggS\0" + bytes(30))


def test_ogg_long_payload_lacing():
    # a >255-byte packet exercises the 255-continuation lacing
    head = (
        b"OpusHead" + bytes([1, 1]) + struct.pack("<H", 0)
        + struct.pack("<I", 48000) + struct.pack("<h", 0) + bytes([0])
    )
    pages = C._ogg_page(9, 0, 0, head, 0x02) + C._ogg_page(
        9, 1, 960, b"\xab" * 700, 0x04
    )
    codec, rate, ch, n, dur = C.ogg_params(pages)
    assert (codec, n) == ("opus", 960)


def test_ogg_multiplexed_streams_use_first_serial_only():
    ident = (
        b"\x01vorbis" + (0).to_bytes(4, "little") + bytes([2])
        + (44100).to_bytes(4, "little") + bytes(12) + bytes([0x11])
    )
    pages = (
        C._ogg_page(7, 0, 0, ident, 0x02)
        + C._ogg_page(9, 0, 999_999, b"video stream page", 0x02)
        + C._ogg_page(7, 1, 44100, b"\x00", 0x04)
    )
    codec, rate, ch, n, dur = C.ogg_params(pages)
    assert (n, dur) == (44100, 1.0)  # the serial-9 granule is ignored


def test_ogg_not_ogg():
    assert not C.is_ogg(b"OggZ" + bytes(30))
    with pytest.raises(C.ContainerFormatError):
        C.ogg_params(b"RIFF" + bytes(30))


def test_webm_roundtrip():
    b = C.webm_stub_bytes(2500.0, 640, 360, n_tracks=2)
    assert C.matroska_meta(b) == (2.5, 640, 360, 2)


def test_webm_fractional_duration_exact():
    dur, w, h, n = C.matroska_meta(C.webm_stub_bytes(7.0, 16, 16))
    assert dur == 7.0 / 1000.0  # ×1e6 / 1e9 rounds identically


def test_webm_rejections():
    assert not C.is_matroska(b"\x1aE\xdf")
    with pytest.raises(C.ContainerFormatError):
        C.matroska_meta(b"not matroska")
    b = C.webm_stub_bytes(100.0, 32, 32)
    with pytest.raises(C.ContainerFormatError):
        C.matroska_meta(b[:-4])


def test_webm_vint_edge():
    # element id with a 2-byte vint and an unknown-size segment
    seg_body = C._elem(C._INFO, C._elem(C._DURATION, struct.pack(">f", 500.0)))
    data = (
        C._elem(C._EBML_HEADER, b"")
        + C._ebml_id(C._SEGMENT)
        + b"\xff"  # unknown size: extends to end
        + seg_body
    )
    dur, w, h, n = C.matroska_meta(data)
    assert dur == 0.5 and (w, h, n) == (0, 0, 0)


def test_decode_audio_ogg_branch(spark):
    from rq_spark.operators import multimodal as M

    df = spark.createDataFrame(
        [
            (1, bytearray(C.ogg_opus_stub_bytes(96000, ch=2))),
            (2, bytearray(C.ogg_vorbis_stub_bytes(44100, rate=44100, ch=1))),
        ],
        "id long, payload binary",
    )
    rows = {r.id: r for r in M.decode_audio(df, strict=True).collect()}
    assert (rows[1].sample_rate, rows[1].n_channels, rows[1].n_samples) == (
        48000, 2, 96000,
    )
    assert rows[2].duration_s == 1.0


def test_decode_video_meta_webm_branch(spark):
    from rq_spark.operators import multimodal as M

    df = spark.createDataFrame(
        [(1, bytearray(C.webm_stub_bytes(1234.0, 320, 240, n_tracks=3)))],
        "id long, payload binary",
    )
    row = M.decode_video_meta(df, strict=True).collect()[0]
    assert (row.width, row.height, row.n_tracks) == (320, 240, 3)
    assert row.duration_s == 1.234
