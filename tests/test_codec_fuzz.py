"""Hypothesis properties for the r6 codecs (VP8L, FLAC, AVI, EXIF):
random inputs must round-trip exactly (VP8L/FLAC are lossless; AVI
frame count/dims and EXIF fields are containers around known layers),
and random bytes must never crash a sniff — they either reject or
raise the codec's typed error, mirroring tests/test_formats.py's
header-sniff fuzz for the earlier codec generation."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from rq_spark.operators import avi, exif, flac, jpeg, vp8l


@settings(max_examples=40, deadline=None)
@given(st.integers(1, 14), st.integers(1, 14), st.integers(0, 2**31 - 1),
       st.booleans())
def test_vp8l_roundtrip_property(h, w, seed, alpha):
    rng = np.random.RandomState(seed)
    img = rng.randint(0, 256, (h, w, 4 if alpha else 3), dtype=np.uint8)
    out = vp8l.decode(vp8l.encode(img))
    if alpha:
        assert np.array_equal(out, img)
    else:
        assert np.array_equal(out[:, :, :3], img)
        assert (out[:, :, 3] == 255).all()


@settings(max_examples=40, deadline=None)
@given(st.integers(1, 9000), st.integers(0, 2**31 - 1),
       st.sampled_from([1, 2]), st.integers(1, 200))
def test_flac_roundtrip_property(n, seed, ch, scale):
    rng = np.random.RandomState(seed)
    x = np.cumsum(rng.randint(-scale, scale + 1, (n, ch)), axis=0).clip(
        -32768, 32767
    )
    if ch == 1:
        x = x[:, 0]
    dec, rate, bits = flac.decode(flac.encode(x, 8000, 16))
    assert np.array_equal(dec, x.reshape(n, ch))


@settings(max_examples=20, deadline=None)
@given(st.integers(1, 6), st.integers(1, 30), st.integers(0, 2**31 - 1))
def test_avi_frame_count_and_dims_property(n, fps, seed):
    rng = np.random.RandomState(seed)
    h, w = rng.randint(8, 25), rng.randint(8, 33)
    yy, xx = np.mgrid[0:h, 0:w]
    frames = [
        np.round(120 + 90 * np.sin((xx + i) / 4.0) * np.cos(yy / 5.0)).astype(
            np.uint8
        )
        for i in range(n)
    ]
    data = avi.encode_mjpeg(frames, fps=fps, quality=95)
    _dur, mw, mh, _streams, total, _fps = avi.meta(data)
    assert (mw, mh, total) == (w, h, n)
    decoded = avi.decode_frames(data)
    assert len(decoded) == n
    for src, out in zip(frames, decoded):
        assert np.abs(out[:, :, 0].astype(int) - src.astype(int)).max() <= 8


@settings(max_examples=30, deadline=None)
@given(
    st.integers(1, 8),
    st.text(st.characters(min_codepoint=32, max_codepoint=126), max_size=12),
    st.integers(0, 65535),
    st.tuples(st.integers(1, 10**6), st.integers(1, 10**6)),
)
def test_exif_field_roundtrip_property(orientation, model, iso, expo):
    j = exif.insert_app1(
        jpeg.encode(np.full((8, 8), 40, np.uint8)),
        exif.app1_segment(
            orientation=orientation, model=model, iso=iso, exposure=expo
        ),
    )
    d = exif.parse_exif(j)
    assert d["orientation"] == orientation
    assert d["model"] == (model if model else None)
    assert d["iso"] == (iso if iso else None)
    assert d["exposure_time"] == expo[0] / expo[1]


@settings(max_examples=150, deadline=None)
@given(st.binary(max_size=2048))
def test_new_codec_sniffs_never_crash_on_garbage(data):
    # sniffs must be total functions over bytes
    vp8l.is_webp_lossless(data)
    flac.is_flac(data)
    avi.is_avi(data)
    assert exif.parse_exif(data) is None or isinstance(
        exif.parse_exif(data), dict
    )
    for mod, err in (
        (vp8l, vp8l.Vp8lFormatError),
        (flac, flac.FlacFormatError),
    ):
        try:
            mod.decode(data)
        except err:
            pass
        else:  # decoding random bytes "successfully" means the magic
            # matched by chance — essentially impossible for these
            pytest.fail("garbage decoded without error")


@settings(max_examples=60, deadline=None)
@given(st.binary(min_size=1, max_size=512), st.integers(0, 255))
def test_flac_bitflip_detected_by_crc(payload, flip):
    # any single corrupted byte inside a frame must be caught by the
    # CRC-8 (header) or CRC-16 (frame) check, never silently decoded
    # to different samples
    x = np.frombuffer(payload.ljust(8, b"\0"), dtype=np.uint8).astype(np.int64)
    data = bytearray(flac.encode(x, 8000, 16))
    frames_start = flac._frames_start(bytes(data))
    if frames_start >= len(data):
        return
    pos = frames_start + (flip % (len(data) - frames_start))
    old = data[pos]
    data[pos] ^= 0xFF
    if data[pos] == old:
        return
    try:
        dec, _, _ = flac.decode(bytes(data))
    except flac.FlacFormatError:
        return
    assert np.array_equal(dec[:, 0], x)  # flip in ignorable padding only
