"""Pure-numpy BMP codec (operators/bmp.py) — round-trips, row order,
palette/32-bit profiles, loud rejects, and the real-decode multimodal
branches."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from rq_spark.operators import bmp


def _rand(h, w, c, seed):
    return np.random.RandomState(seed).randint(0, 256, (h, w, c), dtype=np.uint8)


@pytest.mark.parametrize("h,w", [(1, 1), (3, 5), (7, 2), (16, 16), (5, 3)])
def test_bmp_roundtrip_24bit(h, w):
    """Widths chosen so row padding (w*3 % 4) covers 0..3 pad bytes."""
    img = _rand(h, w, 3, seed=h * 100 + w)
    data = bmp.encode(img)
    assert bmp.is_bmp(data)
    assert np.array_equal(bmp.decode(data), img)


def test_bmp_grayscale_input_broadcasts():
    g = _rand(4, 6, 1, seed=1)[:, :, 0]
    out = bmp.decode(bmp.encode(g))
    assert np.array_equal(out, np.stack([g] * 3, axis=-1))


def test_bmp_rgba_input_drops_alpha():
    img = _rand(4, 4, 4, seed=2)
    out = bmp.decode(bmp.encode(img))
    assert np.array_equal(out, img[:, :, :3])


def test_bmp_top_down_rows():
    """Negative height = top-down row order; pixels must come out
    identical to the bottom-up encoding of the same image."""
    img = _rand(5, 4, 3, seed=3)
    data = bytearray(bmp.encode(img))
    # flip to top-down: negate height, reverse the row blocks
    h, w = 5, 4
    stride = (w * 3 + 3) & ~3
    struct.pack_into("<i", data, 22, -h)
    off = 54
    rows = [bytes(data[off + i * stride : off + (i + 1) * stride]) for i in range(h)]
    data[off:] = b"".join(reversed(rows))
    assert np.array_equal(bmp.decode(bytes(data)), img)


def test_bmp_8bit_palette_decode():
    """Hand-build an 8-bit palettized BMP (BGRX color table) and check
    the palette take."""
    rng = np.random.RandomState(7)
    pal = rng.randint(0, 256, (16, 3), dtype=np.uint8)
    idx = rng.randint(0, 16, (6, 5), dtype=np.uint8)
    h, w = idx.shape
    stride = (w + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, :w] = idx[::-1]
    tbl = np.zeros((16, 4), dtype=np.uint8)
    tbl[:, :3] = pal[:, ::-1]  # RGB → BGRX
    pix_off = 14 + 40 + 64
    data = (
        struct.pack("<2sIHHI", b"BM", pix_off + rows.size, 0, 0, pix_off)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 8, 0, rows.size, 0, 0, 16, 16)
        + tbl.tobytes()
        + rows.tobytes()
    )
    assert np.array_equal(bmp.decode(data), pal[idx])


@pytest.mark.parametrize(
    "mutate,msg",
    [
        (lambda d: d[: len(d) - 8], "truncated"),
        (lambda d: d[:30] + b"\x01\x00\x00\x00" + d[34:], "BI_RGB"),  # RLE8
        (lambda d: d[:28] + b"\x10\x00" + d[30:], "bit depth"),  # 16-bit
    ],
)
def test_bmp_malformed_raises(mutate, msg):
    data = mutate(bmp.encode(_rand(4, 4, 3, seed=5)))
    with pytest.raises(bmp.BmpFormatError, match=msg):
        bmp.decode(data)


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=40, deadline=None)
@given(st.integers(1, 12), st.integers(1, 12), st.integers(0, 2**31 - 1))
def test_bmp_roundtrip_property(h, w, seed):
    img = _rand(h, w, 3, seed)
    assert np.array_equal(bmp.decode(bmp.encode(img)), img)


def test_bmp_text_never_sniffs():
    assert not bmp.is_bmp(b"BMW motorcycles are loud and this is text")


def test_multimodal_features_and_resize_decode_bmp_for_real(spark):
    from rq_spark.operators import multimodal as M
    from rq_spark.operators import png as P

    img = _rand(12, 10, 3, seed=11)
    df = spark.createDataFrame(
        [(1, bytearray(bmp.encode(img)))], "id long, payload binary"
    )

    [frow] = M.extract_features(df, dim=8).collect()
    gray = img.mean(axis=2).ravel()
    hist, _ = np.histogram(gray, bins=8, range=(0.0, 256.0))
    assert frow.features == pytest.approx(
        (hist.astype(np.float32) / np.float32(gray.size)).tolist()
    )

    [rrow] = M.resize_image(df, width=6, height=4).collect()
    out = bmp.decode(bytes(rrow.resized))
    assert np.array_equal(out, P.resize_nearest(img, 6, 4))
    assert rrow.out_channels == 3
