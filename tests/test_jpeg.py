"""Baseline JPEG spec codec (operators/jpeg.py, r6): roundtrips within
quantization tolerance, marker/profile rejects, decoder resync."""

from __future__ import annotations

import numpy as np
import pytest

from rq_spark.operators import jpeg


def _smooth(h, w, seed=0):
    yy, xx = np.mgrid[0:h, 0:w]
    rs = np.random.RandomState(seed)
    a, b_ = rs.uniform(5, 15, 2)
    return np.dstack(
        [
            np.sin(yy / a) * 50 + 128,
            np.cos(xx / b_) * 40 + 100,
            (yy + xx) / 2 % 120 + 60,
        ]
    ).astype(np.uint8)


def test_zigzag_matches_spec_literal():
    # T.81 figure 5, first row of the published sequence
    assert jpeg.ZIGZAG[:8].tolist() == [0, 1, 8, 16, 9, 2, 3, 10]
    assert jpeg.ZIGZAG[-1] == 63
    assert np.array_equal(jpeg.ZIGZAG[jpeg.UNZIGZAG], np.arange(64))


def test_constant_gray_roundtrips_exactly():
    a = np.full((16, 16), 130, np.uint8)
    out = jpeg.decode(jpeg.encode(a, quality=95))
    assert out.shape == (16, 16, 1)
    assert int(np.abs(out[:, :, 0].astype(int) - 130).max()) <= 1


def test_smooth_gray_tolerance():
    yy, xx = np.mgrid[0:40, 0:56]
    g = (np.sin(yy / 9) * 60 + np.cos(xx / 7) * 50 + 128).astype(np.uint8)
    out = jpeg.decode(jpeg.encode(g, quality=95))
    assert out.shape == (40, 56, 1)
    assert int(np.abs(out[:, :, 0].astype(int) - g.astype(int)).max()) <= 3


@pytest.mark.parametrize("subsample,tol", [(False, 6), (True, 16)])
def test_rgb_odd_dims_roundtrip(subsample, tol):
    rgb = _smooth(37, 51, seed=3)
    out = jpeg.decode(jpeg.encode(rgb, quality=95, subsample=subsample))
    assert out.shape == rgb.shape
    assert int(np.abs(out.astype(int) - rgb.astype(int)).max()) <= tol


def test_restart_interval_resync():
    rgb = _smooth(37, 51, seed=5)
    plain = jpeg.decode(jpeg.encode(rgb, quality=95))
    blob = jpeg.encode(rgb, quality=95, restart_interval=3)
    assert b"\xff\xdd" in blob  # DRI emitted
    out = jpeg.decode(blob)
    # restart markers change the byte stream but not the pixels
    assert np.array_equal(out, plain)


def test_noise_bounded_by_quantization():
    n = np.random.RandomState(7).randint(0, 256, (24, 24, 3), np.uint8)
    out = jpeg.decode(jpeg.encode(n, quality=95))
    assert int(np.abs(out.astype(int) - n.astype(int)).max()) <= 32


def test_quality_scaling_convention():
    # IJG formula: q=50 is the base table; lower q scales up
    assert np.array_equal(jpeg.quality_scale(jpeg.STD_LUM_Q, 50), jpeg.STD_LUM_Q)
    assert (jpeg.quality_scale(jpeg.STD_LUM_Q, 10) >= jpeg.STD_LUM_Q).all()
    assert (jpeg.quality_scale(jpeg.STD_LUM_Q, 95) <= jpeg.STD_LUM_Q).all()
    assert jpeg.quality_scale(jpeg.STD_LUM_Q, 100).min() == 1


def test_rejects_unsupported_profiles():
    blob = jpeg.encode(_smooth(16, 16, seed=1), quality=90)
    with pytest.raises(jpeg.JpegFormatError, match="SOI"):
        jpeg.decode(b"nope" + blob)
    # a baseline stream relabeled SOF2 is malformed: its interleaved
    # full-band scan is illegal in a progressive frame (G.1.1.1.1)
    with pytest.raises(jpeg.JpegFormatError, match="Se=0"):
        jpeg.decode(blob.replace(b"\xff\xc0", b"\xff\xc2", 1))
    # lossless (SOF3) stays rejected
    with pytest.raises(jpeg.JpegFormatError, match="SOF3"):
        jpeg.decode(blob.replace(b"\xff\xc0", b"\xff\xc3", 1))
    # 12-bit precision: patch the SOF0 precision byte
    i = blob.find(b"\xff\xc0")
    bad = bytearray(blob)
    bad[i + 4] = 12
    with pytest.raises(jpeg.JpegFormatError, match="12-bit"):
        jpeg.decode(bytes(bad))
    # truncated scan
    with pytest.raises(jpeg.JpegFormatError, match="truncated|Huffman"):
        jpeg.decode(blob[: len(blob) // 2])


def test_dims_sniff_agrees_with_decode():
    from rq_spark.operators.multimodal import _jpeg_dims

    rgb = _smooth(33, 47, seed=9)
    blob = jpeg.encode(rgb, quality=90, subsample=True)
    assert _jpeg_dims(blob) == (47, 33, 3)
    assert jpeg.decode(blob).shape == (33, 47, 3)


from hypothesis import example, given, settings
from hypothesis import strategies as st


@settings(max_examples=25, deadline=None)
@given(
    st.integers(1, 40), st.integers(1, 40),
    st.sampled_from([1, 3]), st.booleans(), st.integers(0, 2**31 - 1),
)
@example(h=2, w=40, nc=3, subsample=True, seed=24565)
@example(h=5, w=40, nc=3, subsample=True, seed=773332797)
def test_jpeg_roundtrip_property(h, w, nc, subsample, seed):
    """Any size (including non-multiples of 8/16), gray or RGB,
    4:4:4 or 4:2:0: decode(encode(x)) stays within quantization
    tolerance of x for smooth content."""
    yy, xx = np.mgrid[0:h, 0:w]
    rs = np.random.RandomState(seed)
    base = (np.sin(yy / rs.uniform(4, 20)) * 40
            + np.cos(xx / rs.uniform(4, 20)) * 40 + 128)
    if nc == 1:
        img = base.astype(np.uint8)
    else:
        img = np.dstack([base, base * 0.7 + 30, 255 - base]).astype(np.uint8)
    out = jpeg.decode(jpeg.encode(img, quality=95, subsample=subsample))
    assert out.shape == (h, w, nc)
    # 4:2:0 chroma worst case measured at 17 over an 822-shape/seed sweep
    # (sharp blue-channel gradients on 1-5px-tall images); 20 leaves margin.
    tol = 20 if (subsample and nc == 3) else 6
    assert int(np.abs(out.astype(int) - img.reshape(h, w, nc).astype(int)).max()) <= tol


# ------------------------------------------------ progressive (SOF2)


def test_progressive_equals_baseline_pixels():
    """encode_progressive shares _prepare_frame with encode, so the
    decoded pixels must be IDENTICAL to the baseline stream's — the
    multi-scan reassembly (DC first/refine, AC spectral bands, AC
    refinement, EOB runs) must reconstruct the exact coefficients."""
    rs = np.random.RandomState(11)
    for h, w, nc, sub in [
        (16, 16, 1, False), (25, 31, 3, False), (25, 31, 3, True),
        (7, 5, 1, False), (64, 48, 3, True), (1, 1, 1, False),
    ]:
        shape = (h, w) if nc == 1 else (h, w, 3)
        img = rs.randint(0, 256, shape, dtype=np.uint8)
        base = jpeg.decode(jpeg.encode(img, quality=85, subsample=sub))
        prog = jpeg.decode(jpeg.encode_progressive(img, quality=85, subsample=sub))
        assert np.array_equal(base, prog), (h, w, nc, sub)


def test_progressive_constant_image_all_eob():
    """A constant image's AC scans are pure EOB runs (every band
    empty): exercises EOBn accumulation/flush and the empty-symbol
    DHT edge."""
    for v in (0, 128, 255):
        img = np.full((24, 40, 3), v, np.uint8)
        base = jpeg.decode(jpeg.encode(img, quality=85))
        prog = jpeg.decode(jpeg.encode_progressive(img, quality=85))
        assert np.array_equal(base, prog)


def test_progressive_marker_layout():
    """The stream declares SOF2 and carries one SOS per scan of the
    script (2 DC + 4 AC for gray band-split... — RGB: 2 DC + 8 AC)."""
    img = _smooth(20, 20, seed=3)
    blob = jpeg.encode_progressive(img, quality=90)
    assert blob.count(b"\xff\xc2") >= 1
    n_sos = blob.count(b"\xff\xda")
    # RGB: DC first + DC refine + (2 luma bands + 1 per chroma) × 2
    assert n_sos == 2 + 4 * 2
    # AC scans redefine table 0 via in-stream DHT segments
    assert blob.count(b"\xff\xc4") >= 1 + 8


def test_progressive_sniff_and_multimodal_integration():
    from rq_spark.operators.multimodal import _jpeg_dims

    img = _smooth(33, 47, seed=5)
    blob = jpeg.encode_progressive(img, quality=90, subsample=True)
    assert jpeg.is_jpeg(blob)
    assert _jpeg_dims(blob) == (47, 33, 3)  # SOF2 carries the same dims
    assert jpeg.decode(blob).shape == (33, 47, 3)


@settings(max_examples=20, deadline=None)
@given(
    st.integers(1, 40), st.integers(1, 40),
    st.sampled_from([1, 3]), st.booleans(), st.integers(0, 2**31 - 1),
)
def test_progressive_roundtrip_property(h, w, nc, subsample, seed):
    """Property: progressive and baseline streams of the same array
    decode to identical pixels at every size/colorspace/sampling."""
    rs = np.random.RandomState(seed)
    shape = (h, w) if nc == 1 else (h, w, 3)
    img = rs.randint(0, 256, shape, dtype=np.uint8)
    base = jpeg.decode(jpeg.encode(img, quality=80, subsample=subsample))
    prog = jpeg.decode(jpeg.encode_progressive(img, quality=80, subsample=subsample))
    assert np.array_equal(base, prog)


def _roundtrip_band(blocks_in, al_first=1):
    """Encode band 1-63 of the given coefficient blocks with the
    first-pass + refinement token generators, decode with the block
    routines, return the reconstructed blocks."""
    from rq_spark.operators.jpeg import (
        _ac_first_block,
        _ac_refine_block,
        _ac_first_tokens,
        _ac_refine_tokens,
        _BitReader,
        _BitWriter,
        _equal_length_table,
        _flat_tokens,
        _invert_codes,
        _split_scan,
        _write_tokens,
    )

    out = [np.zeros(64, dtype=np.int64) for _ in blocks_in]

    def run(tokens, block_fn, al):
        body, codes = _equal_length_table(_flat_tokens(tokens))
        bw = _BitWriter()
        _write_tokens(bw, tokens, codes)
        bw.flush()
        data = _split_scan(bytes(bw.buf), 0)[0][0]  # unstuff 0xFF00
        reader = _BitReader(data)
        inv = _invert_codes(codes)
        eobrun = 0
        for zz in out:
            eobrun = block_fn(reader, inv, zz, 1, 63, al, eobrun)

    run(_ac_first_tokens(blocks_in, 1, 63, al_first), _ac_first_block, al_first)
    run(_ac_refine_tokens(blocks_in, 1, 63, 0), _ac_refine_block, 0)
    return out


def test_ac_token_block_roundtrip_random_sparse():
    """The AC first/refine token generators and block decoders are
    exact inverses over random sparse bands (correction-bit buffering,
    ZRL runs, trailing EOB absorption)."""
    rs = np.random.RandomState(5)
    for trial in range(10):
        blocks = []
        for _ in range(rs.randint(1, 40)):
            zz = np.zeros(64, dtype=np.int64)
            for _k in range(rs.randint(0, 12)):
                zz[rs.randint(1, 64)] = rs.randint(-40, 41)
            blocks.append(zz)
        got = _roundtrip_band(blocks)
        for want, have in zip(blocks, got):
            assert np.array_equal(want[1:], have[1:]), trial


def test_ac_token_block_roundtrip_zrl_heavy():
    """Runs > 15 force ZRL symbols in both passes — including the
    refinement pass's interleaved correction-bit flushes."""
    zz = np.zeros(64, dtype=np.int64)
    zz[20] = 7       # 19-zero run → ZRL + run 3
    zz[60] = -1      # newly significant only in the refinement pass
    zz[63] = 30
    blocks = [zz, np.zeros(64, dtype=np.int64)]
    got = _roundtrip_band(blocks)
    assert np.array_equal(got[0][1:], zz[1:])
    assert not got[1][1:].any()


def test_ac_eobrun_cap_flushes_at_0x7fff():
    """32767 consecutive all-zero bands must flush an EOBn symbol at
    the spec cap and still round-trip exactly."""
    from rq_spark.operators.jpeg import _ac_first_tokens, _flat_tokens

    n = 33000
    blocks = [np.zeros(64, dtype=np.int64) for _ in range(n)]
    blocks[-1][1] = 5  # a nonzero tail so the cap flush is observable
    toks = _ac_first_tokens(blocks, 1, 63, 1)
    # 14 = floor(log2(0x7FFF)): the capped EOBn symbol
    assert (14 << 4) in _flat_tokens(toks)
    got = _roundtrip_band(blocks)
    assert got[-1][1] == 5 or got[-1][1] == 4  # 5>>1<<1 then +1 → 5
    assert np.array_equal(got[-1][1:], blocks[-1][1:])
    assert not any(b[1:].any() for b in got[:-1])


def test_jpeg_decode_throughput_floor():
    # the 10-bit Huffman LUT + trimmed bit accumulator run ~1.5 Mpx/s;
    # this floor is ~20x looser to stay robust on a loaded box while
    # catching a regression to the per-bit walk or the untrimmed
    # accumulator (whose cost grows quadratically with scan size)
    import time

    import numpy as np

    rng = np.random.RandomState(9)
    base = rng.randint(0, 256, (320, 320), dtype=np.uint8).astype(float)
    for _ in range(4):
        base = (base + np.roll(base, 1, 0) + np.roll(base, 1, 1)) / 3
    img = base.astype(np.uint8)
    data = jpeg.encode(img, quality=90)
    t0 = time.time()
    out = jpeg.decode(data)
    elapsed = time.time() - t0
    assert out.shape[:2] == (320, 320)
    assert 320 * 320 / elapsed > 80_000, f"{320 * 320 / elapsed:.0f} px/s"
