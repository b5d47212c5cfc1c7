"""Pure-Python GIF codec (operators/gif.py) — LZW round-trips,
interlacing, transparency, container edge cases, and the real-decode
multimodal branches."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from rq_spark.operators import gif


def _palette_img(h, w, n_colors, seed):
    rng = np.random.RandomState(seed)
    pal = rng.randint(0, 256, (n_colors, 3), dtype=np.uint8)
    pal = np.unique(pal, axis=0)
    return pal[rng.randint(0, len(pal), (h, w))]


@pytest.mark.parametrize(
    "h,w,colors,seed",
    [(1, 1, 2, 0), (13, 7, 5, 1), (37, 53, 7, 2), (64, 64, 250, 3), (5, 9, 2, 4)],
)
def test_gif_roundtrip(h, w, colors, seed):
    img = _palette_img(h, w, colors, seed)
    data = gif.encode(img)
    assert gif.is_gif(data)
    assert gif.header_dims(data) == (w, h, 3)
    assert np.array_equal(gif.decode(data), img)


def test_gif_grayscale_input_broadcasts_to_rgb():
    g = (np.arange(100, dtype=np.uint8).reshape(10, 10) % 4) * 80
    out = gif.decode(gif.encode(g))
    assert np.array_equal(out, np.stack([g] * 3, axis=-1))


def test_gif_lzw_dictionary_reset():
    """> 4096 dictionary entries forces the encoder's CLEAR-and-reset;
    the decoder must resynchronize mid-stream."""
    img = _palette_img(200, 300, 7, seed=9)
    assert np.array_equal(gif.decode(gif.encode(img)), img)


def test_gif_lzw_kwkwk_case():
    """A run like ababab... makes the encoder emit a code the decoder
    has not finished defining (code == len(table)) — the classic KwKwK
    corner of LZW."""
    pal = np.array([[0, 0, 0], [255, 255, 255]], dtype=np.uint8)
    idx = np.tile([0, 1], 50).reshape(4, 25)
    img = pal[idx]
    assert np.array_equal(gif.decode(gif.encode(img)), img)


def test_gif_interlaced_decode():
    """Our encoder writes sequential rows; real GIFs may be interlaced.
    Build one by hand: permute the pixel rows into the 4-pass order
    (spec appendix E) and set the interlace flag."""
    img = _palette_img(17, 11, 6, seed=5)
    plain = gif.encode(img)
    # deinterleave rows into transmission order
    order = []
    for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
        order.extend(range(start, 17, step))
    colors, idx = np.unique(img.reshape(-1, 3), axis=0, return_inverse=True)
    idx = idx.reshape(17, 11)[order].astype(np.uint8)
    ct_bits = max(1, int(np.ceil(np.log2(max(len(colors), 2)))))
    ct = np.zeros((1 << ct_bits, 3), dtype=np.uint8)
    ct[: len(colors)] = colors
    out = bytearray()
    out += b"GIF89a" + struct.pack("<HHBBB", 11, 17, 0x80 | (ct_bits - 1), 0, 0)
    out += ct.tobytes()
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, 11, 17, 0x40)  # interlace flag
    min_code = max(2, ct_bits)
    out.append(min_code)
    lzw = gif._lzw_encode(min_code, idx.tobytes())
    for i in range(0, len(lzw), 255):
        out.append(len(lzw[i : i + 255]))
        out += lzw[i : i + 255]
    out += b"\x00\x3b"
    assert np.array_equal(gif.decode(bytes(out)), img)
    assert np.array_equal(gif.decode(plain), img)


def test_gif_transparency_renders_background():
    """A Graphic Control transparent index must render as the
    background color (GIF has no alpha; documented convention)."""
    img = _palette_img(6, 6, 3, seed=7)
    data = bytearray(gif.encode(img))
    # splice a GCE before the image descriptor: transparent index 1
    pos = data.index(0x2C, 13)
    gce = bytes([0x21, 0xF9, 0x04, 0x01, 0x00, 0x00, 0x01, 0x00])
    spliced = bytes(data[:pos]) + gce + bytes(data[pos:])
    out = gif.decode(spliced)
    colors, idx = np.unique(img.reshape(-1, 3), axis=0, return_inverse=True)
    idx = idx.reshape(6, 6)
    assert idx.max() >= 1, "fixture must actually use palette index 1"
    expect = colors[idx].copy()
    expect[idx == 1] = colors[0]  # transparent index 1 → background color 0
    assert np.array_equal(out, expect)
    assert not np.array_equal(out, img), "transparency had no visible effect"


def test_gif_first_frame_only_for_animations():
    """Multi-image streams decode the FIRST image (documented; frame
    iteration belongs to sample_frames). Built by appending a second
    copy of the image descriptor + data before the trailer."""
    a = _palette_img(4, 4, 2, seed=11)
    fa = gif.encode(a)
    merged = fa[:-1] + fa[fa.index(0x2C, 13) :]
    assert np.array_equal(gif.decode(merged), a)


def test_gif_decode_frames_disposal_methods():
    """Animated round-trip: full-canvas frames with disposal 1 (keep)
    must come back exactly; disposal 2 (restore-to-background) and 3
    (restore-to-previous) must reset the canvas between frames."""
    pal = np.array(
        [[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255]], dtype=np.uint8
    )
    rng = np.random.RandomState(3)
    frames = [pal[rng.randint(0, 4, (9, 7))] for _ in range(5)]
    data = gif.encode_animation(frames)
    out = gif.decode_frames(data)
    assert len(out) == 5
    for got, want in zip(out, frames):
        assert np.array_equal(got, want)
    assert np.array_equal(gif.decode_frames(data, max_frames=2)[1], frames[1])
    # single-image GIFs: one frame, equal to decode()
    single = gif.encode(frames[0])
    [only] = gif.decode_frames(single)
    assert np.array_equal(only, gif.decode(single))


def test_gif_decode_frames_transparency_shows_canvas():
    """In an animation, a transparent pixel shows the PREVIOUS canvas
    (not the background): encode two frames, then set frame 2's GCE
    transparent flag to palette index 0 — frame 2's canvas must keep
    frame 1's pixels wherever frame 2 has index 0."""
    pal = np.array([[10, 10, 10], [200, 0, 0]], dtype=np.uint8)
    f1 = np.tile(pal[1], (4, 4, 1))  # all red
    idx2 = np.zeros((4, 4), dtype=int)
    idx2[0, 0] = 1
    f2 = pal[idx2]
    data = bytearray(gif.encode_animation([f1, f2]))
    # flip frame 2's GCE: transparent flag on, index = palette slot of
    # color (10,10,10) which np.unique sorts first → index 0
    gce_positions = [i for i in range(len(data) - 1) if data[i] == 0x21 and data[i + 1] == 0xF9]
    p = gce_positions[1]
    data[p + 3] |= 0x01  # transparency flag
    data[p + 6] = 0  # transparent index
    out = gif.decode_frames(bytes(data))
    expect = f1.copy()
    expect[0, 0] = pal[1]
    assert np.array_equal(out[1], expect)


def test_sample_animation_frames_real_and_fallback(spark):
    """GIF payloads yield real PNG-encoded sampled canvases (first and
    last frame included); non-GIF payloads keep the byte-split stub."""
    from rq_spark.operators import multimodal as M
    from rq_spark.operators import png as P

    pal = np.array([[0, 0, 0], [255, 255, 255]], dtype=np.uint8)
    rng = np.random.RandomState(5)
    frames = [pal[rng.randint(0, 2, (6, 8))] for _ in range(7)]
    anim = gif.encode_animation(frames)
    df = spark.createDataFrame(
        [(1, bytearray(anim)), (2, bytearray(b"not a gif at all, just bytes"))],
        "id long, payload binary",
    )
    rows = {r.id: r for r in M.sample_animation_frames(df, n_frames=3).collect()}

    assert rows[1].frames_real is True
    got = [P.decode(bytes(f)) for f in rows[1].frames]
    assert len(got) == 3
    assert np.array_equal(got[0], frames[0])
    assert np.array_equal(got[-1], frames[-1])

    assert rows[2].frames_real is False
    assert len(rows[2].frames) == 3
    assert b"".join(bytes(f) for f in rows[2].frames) in b"not a gif at all, just bytes"


@pytest.mark.parametrize(
    "mutate",
    [
        lambda b: b[:10],  # truncated header
        lambda b: b[:-10],  # truncated stream
        lambda b: b"NOTGIF" + b[6:],  # bad signature
    ],
)
def test_gif_malformed_raises(mutate):
    img = _palette_img(8, 8, 4, seed=13)
    data = mutate(gif.encode(img))
    with pytest.raises(gif.GifFormatError):
        gif.decode(data)


def test_gif_too_many_colors_raises():
    rng = np.random.RandomState(17)
    img = rng.randint(0, 256, (32, 32, 3), dtype=np.uint8)
    assert len(np.unique(img.reshape(-1, 3), axis=0)) > 256
    with pytest.raises(gif.GifFormatError, match="quantize"):
        gif.encode(img)


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=40, deadline=None)
@given(st.integers(1, 12), st.integers(1, 12), st.integers(2, 256), st.integers(0, 2**31 - 1))
def test_gif_roundtrip_property(h, w, colors, seed):
    img = _palette_img(h, w, colors, seed)
    assert np.array_equal(gif.decode(gif.encode(img)), img)


def test_gif_header_dims_never_touches_pixels():
    img = _palette_img(20, 30, 5, seed=19)
    data = bytearray(gif.encode(img))
    data[20:] = b"\xff" * (len(data) - 20)  # destroy everything past the LSD
    assert gif.header_dims(bytes(data)) == (30, 20, 3)
    assert gif.header_dims(b"plain text") is None


def test_multimodal_features_and_resize_decode_gif_for_real(spark):
    """The mapInPandas stages must histogram/resize true GIF pixels
    (not the sha256 fake), and resize must re-encode as a decodable
    GIF of the target size."""
    from rq_spark.operators import multimodal as M
    from rq_spark.operators import png as P

    img = _palette_img(24, 16, 6, seed=23)
    payload = gif.encode(img)
    df = spark.createDataFrame([(1, bytearray(payload))], "id long, payload binary")

    [frow] = M.extract_features(df, dim=8).collect()
    gray = img.mean(axis=2).ravel()
    hist, _ = np.histogram(gray, bins=8, range=(0.0, 256.0))
    expect = (hist.astype(np.float32) / np.float32(gray.size)).tolist()
    assert frow.features == pytest.approx(expect)

    [rrow] = M.resize_image(df, width=8, height=6).collect()
    out = gif.decode(bytes(rrow.resized))
    assert out.shape == (6, 8, 3)
    assert np.array_equal(out, P.resize_nearest(img, 8, 6))
    assert rrow.out_channels == 3


def test_multimodal_gif_magic_text_keeps_fake_contract(spark):
    """A text payload that merely starts with 'GIF87a' must NOT take
    the real branch (ASCII-plausible magic): features fall back to the
    deterministic sha256 fake the oracle recomputes."""
    import hashlib

    from rq_spark.operators import multimodal as M

    b = b"GIF87a and then perfectly ordinary prose follows here."
    df = spark.createDataFrame([(1, bytearray(b))], "id long, payload binary")
    [row] = M.extract_features(df, dim=4).collect()
    d = hashlib.sha256(b).digest()
    arr = np.frombuffer((d * (16 // len(d) + 1))[:16], dtype="<u4")
    assert row.features == pytest.approx(
        (arr.astype(np.float32) / np.float32(2**32)).tolist()
    )
