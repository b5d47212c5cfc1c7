"""TIFF spec codec (operators/tiff.py, r6): round-trips across all
three compressions, predictor, endianness, strip organization,
profile rejects, and multimodal pipeline integration."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from rq_spark.operators import tiff


def _rand(h, w, c, seed=0):
    rs = np.random.RandomState(seed)
    return rs.randint(0, 256, (h, w, c), dtype=np.uint8)


@pytest.mark.parametrize("compression", ["none", "lzw", "packbits"])
@pytest.mark.parametrize("predictor", [False, True])
def test_roundtrip_all_paths(compression, predictor):
    for h, w, c in [(1, 1, 1), (7, 5, 1), (16, 16, 3), (33, 47, 3), (10, 10, 4)]:
        a = _rand(h, w, c, seed=h * w * c)
        blob = tiff.encode(a, compression=compression, predictor=predictor)
        assert tiff.is_tiff(blob)
        assert np.array_equal(tiff.decode(blob), a), (h, w, c)


def test_gray_2d_input_and_compression_wins():
    yy, xx = np.mgrid[0:64, 0:64]
    smooth = ((yy + xx) % 256).astype(np.uint8)
    raw = tiff.encode(smooth)
    lzw = tiff.encode(smooth, compression="lzw", predictor=True)
    pb = tiff.encode(np.full((40, 40), 9, np.uint8), compression="packbits")
    assert len(lzw) < len(raw) / 3  # smooth gradients compress hard
    assert len(pb) < 40 * 40  # constant image: RLE wins
    assert np.array_equal(tiff.decode(lzw)[:, :, 0], smooth)


def test_lzw_coder_roundtrip_property():
    """The MSB-first EarlyChange LZW pair are exact inverses, including
    the table-full clear-and-restart path (input > 4k distinct runs)."""
    rs = np.random.RandomState(3)
    for _ in range(8):
        n = rs.randint(0, 30_000)
        data = bytes(rs.randint(0, rs.choice([2, 8, 256]), n, dtype=np.uint8))
        assert tiff._lzw_decode(tiff._lzw_encode(data)) == data


def test_packbits_roundtrip_property():
    rs = np.random.RandomState(4)
    for _ in range(10):
        n = rs.randint(0, 5000)
        data = bytes(rs.choice([0, 1, 7, 255], n).astype(np.uint8))
        assert tiff._packbits_decode(tiff._packbits_encode(data), n) == data


def _byteswap_to_mm(blob: bytes) -> bytes:
    """Rewrite the encoder's single-strip LE file as a valid
    big-endian ('MM') TIFF by re-emitting header + IFD fields."""
    tags = tiff._read_ifd(blob, "little")
    strip_off = tags[273][0]
    strip_len = tags[279][0]
    strip = blob[strip_off : strip_off + strip_len]
    entries = []
    extra = bytearray()
    # rebuild with the same tags, big-endian this time
    out_ifd_entries = sorted(tags.items())
    ifd_off = 8
    ifd_len = 2 + 12 * len(out_ifd_entries) + 4
    extra_off = ifd_off + ifd_len
    for tag, vals in out_ifd_entries:
        typ = 4 if max(vals) > 0xFFFF or tag in (256, 257, 273, 278, 279) else 3
        size = 4 if typ == 4 else 2
        packed = b"".join(v.to_bytes(size, "big") for v in vals)
        if tag == 273:
            continue  # patched after layout below
        if len(packed) <= 4:
            entries.append((tag, typ, len(vals), packed.ljust(4, b"\0")))
        else:
            entries.append((tag, typ, len(vals), ("off", len(extra))))
            extra.extend(packed)
    entries.append((273, 4, 1, None))  # strip offset placeholder
    entries.sort(key=lambda e: e[0])
    new_strip_off = extra_off + len(extra)
    out = bytearray(b"MM\x00*" + struct.pack(">I", ifd_off))
    out += struct.pack(">H", len(entries))
    for tag, typ, cnt, val in entries:
        out += struct.pack(">HHI", tag, typ, cnt)
        if tag == 273:
            out += struct.pack(">I", new_strip_off)
        elif isinstance(val, tuple):
            out += struct.pack(">I", extra_off + val[1])
        else:
            out += val
    out += struct.pack(">I", 0)
    out += extra
    out += strip
    return bytes(out)


def test_big_endian_decode():
    a = _rand(9, 13, 3, seed=7)
    mm = _byteswap_to_mm(tiff.encode(a))
    assert mm[:2] == b"MM"
    assert np.array_equal(tiff.decode(mm), a)


def test_multi_strip_decode():
    """Hand-build a 2-strip file (RowsPerStrip < height) — the strip
    loop must reassemble rows in order."""
    a = _rand(10, 6, 1, seed=11)
    rows_per_strip = 6
    s1 = a[:6].tobytes()
    s2 = a[6:].tobytes()
    entries = {
        256: (4, [6]), 257: (4, [10]), 258: (3, [8]), 259: (3, [1]),
        262: (3, [1]), 277: (3, [1]), 278: (4, [rows_per_strip]),
    }
    n_entries = len(entries) + 2  # + StripOffsets + StripByteCounts
    ifd_off = 8
    ifd_len = 2 + 12 * n_entries + 4
    extra_off = ifd_off + ifd_len
    # strip offsets/counts arrays (2 × LONG = 8 bytes each → offsets)
    strip1_off = extra_off + 16
    strip2_off = strip1_off + len(s1)
    extra = struct.pack("<II", strip1_off, strip2_off) + struct.pack(
        "<II", len(s1), len(s2)
    )
    all_tags = dict(entries)
    all_tags[273] = (4, None)
    all_tags[279] = (4, None)
    out = bytearray(b"II*\x00" + struct.pack("<I", ifd_off))
    out += struct.pack("<H", n_entries)
    for tag in sorted(all_tags):
        typ, vals = all_tags[tag]
        if tag == 273:
            out += struct.pack("<HHII", tag, typ, 2, extra_off)
        elif tag == 279:
            out += struct.pack("<HHII", tag, typ, 2, extra_off + 8)
        else:
            size = 4 if typ == 4 else 2
            packed = b"".join(v.to_bytes(size, "little") for v in vals)
            out += struct.pack("<HHI", tag, typ, len(vals)) + packed.ljust(4, b"\0")
    out += struct.pack("<I", 0)
    out += extra + s1 + s2
    assert np.array_equal(tiff.decode(bytes(out)), a)


def test_white_is_zero_inverts():
    a = _rand(4, 4, 1, seed=2)
    blob = bytearray(tiff.encode(a))
    # patch PhotometricInterpretation (tag 262) value 1 → 0
    tags = tiff._read_ifd(bytes(blob), "little")
    assert tags[262] == [1]
    idx = bytes(blob).find(struct.pack("<HH", 262, 3))
    blob[idx + 8] = 0
    assert np.array_equal(tiff.decode(bytes(blob)), 255 - a)


def test_rejects_unsupported_profiles():
    a = _rand(4, 4, 1)
    blob = tiff.encode(a)
    with pytest.raises(tiff.TiffFormatError, match="magic"):
        tiff.decode(b"nope" + blob)
    # unknown compression: patch tag 259's value
    bad = bytearray(blob)
    idx = bytes(bad).find(struct.pack("<HH", 259, 3))
    bad[idx + 8] = 7  # JPEG-in-TIFF
    with pytest.raises(tiff.TiffFormatError, match="compression 7"):
        tiff.decode(bytes(bad))
    with pytest.raises(tiff.TiffFormatError):
        tiff.encode(a, compression="zstd")


def test_multimodal_pipeline_integration(spark):
    """TIFF payloads flow through decode_image (header dims),
    extract_features (real histogram), and resize_image (real
    resample + re-encode) alongside the other codecs."""
    import pandas as pd

    from rq_spark.operators.multimodal import (
        decode_image,
        extract_features,
        resize_image,
    )

    imgs = [tiff.encode(_rand(20, 30, 3, seed=5), compression="lzw"),
            tiff.encode(np.full((8, 8), 0, np.uint8))]
    df = spark.createDataFrame(pd.DataFrame({"payload": imgs}))
    dims = {(r.width, r.height, r.channels) for r in decode_image(df, strict=True).collect()}
    assert dims == {(30, 20, 3), (8, 8, 1)}
    feats = extract_features(df, dim=8).collect()
    # the all-black image's histogram is a one-hot on the first bin
    black = next(r for r in feats if r.features[0] == pytest.approx(1.0))
    assert sum(black.features) == pytest.approx(1.0)
    rs = {r.out_channels: bytes(r.resized) for r in resize_image(df, width=10, height=10).collect()}
    assert set(rs) == {1, 3}
    for c, blob in rs.items():
        back = tiff.decode(blob)
        assert back.shape == (10, 10, c)
