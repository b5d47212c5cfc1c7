"""VP8L / WebP-lossless codec (operators/vp8l.py) — lossless
round-trips through literals, color cache, and LZ77 runs; hand-built
streams for the transform inverses (subtract-green, predictor,
color-indexing with pixel bundling) and the spec's close-pixel
distance map; malformed-stream rejection; multimodal wiring."""

from __future__ import annotations

import numpy as np
import pytest

from rq_spark.operators import vp8l
from rq_spark.operators.vp8l import _BitWriter, _DIST_MAP


def _rt(img):
    out = vp8l.decode(vp8l.encode(img))
    return out


@pytest.mark.parametrize(
    "h,w,seed", [(1, 1, 0), (7, 13, 1), (16, 16, 2), (40, 3, 3), (2, 60, 4)]
)
def test_vp8l_random_rgb_roundtrip(h, w, seed):
    img = np.random.RandomState(seed).randint(0, 256, (h, w, 3), dtype=np.uint8)
    out = _rt(img)
    assert out.shape == (h, w, 4)
    assert np.array_equal(out[:, :, :3], img)
    assert (out[:, :, 3] == 255).all()


def test_vp8l_rgba_alpha_preserved():
    rng = np.random.RandomState(5)
    img = rng.randint(0, 256, (11, 9, 4), dtype=np.uint8)
    assert np.array_equal(_rt(img), img)


def test_vp8l_flat_image_compresses_via_runs():
    img = np.full((64, 64, 3), (12, 240, 7), dtype=np.uint8)
    data = vp8l.encode(img)
    assert len(data) < 100  # one literal + one long backref
    assert np.array_equal(vp8l.decode(data)[:, :, :3], img)


def test_vp8l_repeated_palette_uses_cache():
    rng = np.random.RandomState(6)
    pal = rng.randint(0, 256, (4, 3), dtype=np.uint8)
    img = pal[rng.randint(0, 4, (32, 32))]
    data = vp8l.encode(img)
    assert np.array_equal(vp8l.decode(data)[:, :, :3], img)
    assert len(data) < 0.35 * img.size  # cache hits ≪ raw literals


def test_vp8l_grayscale_input_broadcasts():
    g = (np.arange(120, dtype=np.uint8).reshape(10, 12) * 2) % 256
    out = _rt(g)
    assert np.array_equal(out[:, :, 0], g)
    assert np.array_equal(out[:, :, 1], g)
    assert np.array_equal(out[:, :, 2], g)


def test_vp8l_distance_map_matches_spec_head():
    # first rows of the spec's close-pixel table (public listing)
    expected = [
        (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
        (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
        (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    ]
    assert _DIST_MAP[: len(expected)] == expected
    assert len(_DIST_MAP) == 120
    assert len(set(_DIST_MAP)) == 120


def test_vp8l_rejects_garbage_and_truncation():
    assert not vp8l.is_webp_lossless(b"RIFF\0\0\0\0WAVE")
    with pytest.raises(vp8l.Vp8lFormatError):
        vp8l.decode(b"not webp")
    img = np.random.RandomState(7).randint(0, 256, (8, 8, 3), dtype=np.uint8)
    data = vp8l.encode(img)
    with pytest.raises(vp8l.Vp8lFormatError):
        vp8l.decode(data[: len(data) - 6])


# ---- hand-built transform streams ----------------------------------------


def _container(body_bits: _BitWriter) -> bytes:
    import struct

    payload = b"\x2f" + body_bits.bytes()
    padded = payload + (b"\0" if len(payload) & 1 else b"")
    return (
        b"RIFF"
        + struct.pack("<I", 12 + len(padded))
        + b"WEBP"
        + b"VP8L"
        + struct.pack("<I", len(payload))
        + padded
    )


def _simple_code(bw: _BitWriter, symbols):
    """Emit a simple prefix code (1 or 2 symbols, 8-bit form)."""
    bw.write(1, 1)
    bw.write(len(symbols) - 1, 1)
    bw.write(1, 1)  # first symbol in 8 bits
    bw.write(symbols[0], 8)
    if len(symbols) == 2:
        bw.write(symbols[1], 8)


def _literal_image_codes(bw: _BitWriter, greens, reds, blues, alphas,
                         level0=True):
    """No meta, no cache, 5 simple codes (distance unused → symbol 0).
    Subimages (level0=False) carry no meta-prefix bit."""
    if level0:
        bw.write(0, 1)  # no meta prefix
    bw.write(0, 1)  # no color cache
    _simple_code(bw, greens)
    _simple_code(bw, reds)
    _simple_code(bw, blues)
    _simple_code(bw, alphas)
    _simple_code(bw, [0])


def test_vp8l_subtract_green_transform():
    # 1×1 image, stored (r', g, b') with r' = r−g, b' = b−g (mod 256)
    r, g, b = 200, 50, 10
    bw = _BitWriter()
    bw.write(0, 14)  # w−1
    bw.write(0, 14)  # h−1
    bw.write(0, 1)
    bw.write(0, 3)
    bw.write(1, 1)  # transform present
    bw.write(2, 2)  # subtract green
    bw.write(0, 1)  # no more transforms
    _literal_image_codes(bw, [g], [(r - g) % 256], [(b - g) % 256], [255])
    # single-symbol codes consume no bits → no pixel bits needed
    out = vp8l.decode(_container(bw))
    assert out[0, 0].tolist() == [r, g, b, 255]


def test_vp8l_predictor_transform_left():
    # 1×2 image, predictor mode irrelevant: first pixel predicted by
    # ARGB black, second (top row) by L. Residuals chosen so the
    # reconstruction is (10,20,30) then (12,25,41).
    bw = _BitWriter()
    bw.write(1, 14)  # w = 2
    bw.write(0, 14)  # h = 1
    bw.write(0, 1)
    bw.write(0, 3)
    bw.write(1, 1)
    bw.write(0, 2)  # predictor transform
    bw.write(0, 3)  # size_bits = 2 → one 1×1 tile
    # tile image: one pixel, green channel = predictor mode (2: T)
    _literal_image_codes(bw, [2], [0], [0], [0], level0=False)
    bw.write(0, 1)  # no more transforms
    # main image: two literals; first: A=255−0? black pred adds a=255
    # px0 = (10,20,30,a0): residual a = 0 (black pred has a=255)
    _literal_image_codes(bw, [20, 25], [10, 2], [30, 11], [0])
    # canonical 1-bit codes go to the SMALLER symbol first:
    # greens {20,25}: 20→0, 25→1; reds {2,10}: 2→0, 10→1;
    # blues {11,30}: 11→0, 30→1; alpha single → 0 bits
    bw.write(0, 1)  # green 20
    bw.write(1, 1)  # red 10
    bw.write(1, 1)  # blue 30
    bw.write(1, 1)  # green 25
    bw.write(0, 1)  # red 2
    bw.write(0, 1)  # blue 11
    out = vp8l.decode(_container(bw))
    assert out[0, 0].tolist() == [10, 20, 30, 255]
    assert out[0, 1].tolist() == [12, 45, 41, 255]


def test_vp8l_predictor_tr_wraps_to_current_row_start():
    # 2×2, one tile, mode 3 (top-right). The bottom-right pixel's TR
    # is scan index i−w+1 = the CURRENT row's first pixel (the
    # contiguous-framebuffer rule), not the row above's first pixel.
    bw = _BitWriter()
    bw.write(1, 14)  # w = 2
    bw.write(1, 14)  # h = 2
    bw.write(0, 1)
    bw.write(0, 3)
    bw.write(1, 1)
    bw.write(0, 2)  # predictor transform
    bw.write(0, 3)  # size_bits = 2 → one tile
    _literal_image_codes(bw, [3], [0], [0], [0], level0=False)  # mode TR
    bw.write(0, 1)  # no more transforms
    # residuals: p00=(a0,r10,g20,b30); p10=p01=(0,2,5,1); p11=(0,2,20,1)
    _literal_image_codes(bw, [20, 5], [10, 2], [30, 1], [0])
    for bits in ((1, 1, 1), (0, 0, 0), (0, 0, 0), (1, 0, 0)):
        for v in bits:
            bw.write(v, 1)
    out = vp8l.decode(_container(bw))
    assert out[0, 0].tolist() == [10, 20, 30, 255]  # black + residual
    assert out[0, 1].tolist() == [12, 25, 31, 255]  # top row: L
    assert out[1, 0].tolist() == [12, 25, 31, 255]  # first col: T
    # TR = out[1, 0] (current row start), + residual (2, 20, 1)
    assert out[1, 1].tolist() == [14, 45, 32, 255]


def test_vp8l_color_indexing_with_bundling():
    # 10×1 image, 2-color palette → width_bits 3, packed width 2,
    # sub-pixel bits = 1; pattern 1,0,1,1,0,0,1,0 | 1,1
    bw = _BitWriter()
    bw.write(9, 14)  # w = 10
    bw.write(0, 14)  # h = 1
    bw.write(0, 1)
    bw.write(0, 3)
    bw.write(1, 1)
    bw.write(3, 2)  # color indexing
    bw.write(1, 8)  # palette size − 1 = 1
    # palette entropy image (2 px): first (255,10,20,30); second is a
    # DELTA (0, 90, 90, 90) → color 1 = (100,110,120)
    _literal_image_codes(bw, [90, 10], [90, 20], [90, 30], [0, 255],
                         level0=False)
    # two pixels, decoder reads green,red,blue,alpha per literal;
    # canonical bit goes to the smaller symbol: greens {10,90}: 10→0;
    # reds {20,90}: 20→0; blues {30,90}: 30→0; alphas {0,255}: 0→0
    for bits in ((0, 0, 0, 1), (1, 1, 1, 0)):  # px0=(255,20,10,30), px1=delta
        for v in bits:
            bw.write(v, 1)
    bw.write(0, 1)  # no more transforms
    # main image: packed width 2; greens carry the packed indices:
    # 0b01001101 = 77 (x0..x7 = 1,0,1,1,0,0,1,0 LSB-first), 0b11 = 3
    _literal_image_codes(bw, [77, 3], [0], [0], [255])
    # pixel order: packed[0]=77 (code 1 — 3 sorts first), packed[1]=3
    bw.write(1, 1)  # green 77
    bw.write(0, 1)  # green 3
    out = vp8l.decode(_container(bw))
    pal0 = [20, 10, 30, 255]
    pal1 = [110, 100, 120, 255]  # pal0 + delta(90,90,90), alpha 0+255
    pattern = [1, 0, 1, 1, 0, 0, 1, 0, 1, 1]
    for x, which in enumerate(pattern):
        assert out[0, x].tolist() == (pal1 if which else pal0), x


def test_vp8l_multimodal_wiring(spark):
    from rq_spark.operators import multimodal as M

    rng = np.random.RandomState(8)
    img = rng.randint(0, 256, (12, 16, 3), dtype=np.uint8)
    payload = vp8l.encode(img)
    df = spark.createDataFrame([(1, bytearray(payload))], "id long, payload binary")
    row = M.decode_image(df, strict=True).collect()[0]
    assert (row.width, row.height, row.channels) == (16, 12, 3)
    feats = M.extract_features(df, dim=8).collect()[0].features
    gray = img.mean(axis=2).ravel()
    hist, _ = np.histogram(gray, bins=8, range=(0.0, 256.0))
    expected = (hist.astype(np.float32) / np.float32(gray.size)).tolist()
    assert feats == pytest.approx(expected)
    rrow = M.resize_image(df, width=8, height=6).collect()[0]
    assert rrow.out_channels == 4  # RGBA decode path
    small = vp8l.decode(bytes(rrow.resized))
    assert small.shape == (6, 8, 4)


def test_vp8l_decode_throughput_floor():
    """r9: packed-LUT + inlined pixel loop runs ~930 Kpx/s warm; the
    floor is ~10x looser to stay robust on a loaded box while still
    catching a regression to the method-call-per-symbol loop
    (~250 Kpx/s would pass; the per-bit shape at ~57 Kpx/s fails)."""
    import time

    rng = np.random.RandomState(7)
    h, w = 150, 200
    img = np.empty((h, w, 4), dtype=np.uint8)
    img[..., 3] = 255
    img[..., :3] = (
        np.cumsum(rng.randint(-3, 4, (h, w, 3)), axis=1) % 256
    ).astype(np.uint8)
    blob = vp8l.encode(img)
    assert np.array_equal(vp8l.decode(blob), img)  # warm + lossless
    t0 = time.time()
    vp8l.decode(blob)
    elapsed = time.time() - t0
    assert h * w / elapsed > 90_000, f"{h * w / elapsed:.0f} px/s"
