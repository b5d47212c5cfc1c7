"""Pure-Python FLAC codec (operators/flac.py) — lossless round-trips
through every subframe type and stereo mode, hand-built streams for
the decoder paths the fixture encoder never emits (LPC, 5-bit Rice,
partitioned residuals, raw escapes, wasted bits), CRC rejection, and
the multimodal FLAC branches."""

from __future__ import annotations

import numpy as np
import pytest

from rq_spark.operators import flac
from rq_spark.operators.flac import (
    _BitWriter,
    _crc8,
    _crc16,
    _utf8_number,
)


def _smoothish(n, seed, scale=60):
    rng = np.random.RandomState(seed)
    return np.cumsum(rng.randint(-scale, scale + 1, n)).clip(-30000, 30000)


@pytest.mark.parametrize("n,seed", [(1, 0), (191, 1), (4096, 2), (9000, 3), (5000, 4)])
def test_flac_mono_roundtrip(n, seed):
    x = _smoothish(n, seed)
    data = flac.encode(x, 8000, 16)
    assert flac.is_flac(data)
    assert flac.stream_info(data) == (8000, 1, 16, n)
    dec, rate, bits = flac.decode(data)
    assert (rate, bits) == (8000, 16)
    assert np.array_equal(dec[:, 0], x)


@pytest.mark.parametrize("mode", [None, "ls", "rs", "ms"])
def test_flac_stereo_modes_lossless(mode):
    base = _smoothish(5001, 7)
    st = np.stack([base[:5000], (base[1:] * 0.9).astype(np.int64)], axis=1)
    data = flac.encode(st, 44100, 16, stereo=mode)
    dec, rate, _ = flac.decode(data)
    assert rate == 44100
    assert np.array_equal(dec, st)


def test_flac_odd_side_exercises_mid_side_low_bit():
    # odd L+R forces the dropped low bit that mid/side must recover
    st = np.array([[3, 0], [0, 3], [5, 2], [-7, 4], [1, 1], [2, -9]])
    dec, _, _ = flac.decode(flac.encode(st, 8000, 16, stereo="ms"))
    assert np.array_equal(dec, st)


def test_flac_constant_and_noise_paths():
    c = np.full(4096 + 100, -321)  # two frames, both CONSTANT
    assert np.array_equal(flac.decode(flac.encode(c, 16000, 16))[0][:, 0], c)
    nz = np.random.RandomState(9).randint(-32768, 32768, 2000)  # VERBATIM
    assert np.array_equal(flac.decode(flac.encode(nz, 8000, 16))[0][:, 0], nz)


def test_flac_compresses_smooth_audio():
    x = _smoothish(20000, 11, scale=20)
    data = flac.encode(x, 8000, 16)
    assert len(data) < 0.7 * 2 * len(x)


def test_flac_decode_throughput_floor():
    # r9: the cached jump-table Rice walk + numpy-end-to-end frame
    # reconstruction run ~1.5 Msamples/s warm (was ~0.5 before the
    # per-code bisect loop was replaced); the floor is ~10x looser to
    # stay robust on a loaded box while still catching a regression to
    # the old per-code loop (~0.3 Msamples/s) or per-bit loops (~0.04)
    import time

    x = _smoothish(200_000, 12, scale=200)
    data = flac.encode(x, 44100, 16)
    dec, _, _ = flac.decode(data)  # warm numpy/code paths
    t0 = time.time()
    dec, _, _ = flac.decode(data)
    elapsed = time.time() - t0
    assert np.array_equal(dec[:, 0], x)
    assert len(x) / elapsed > 150_000, f"{len(x) / elapsed:.0f} samples/s"


def test_flac_nonstandard_sample_rates_roundtrip():
    x = _smoothish(300, 5)
    for rate in (8000, 12345, 11025, 192000, 65530):
        data = flac.encode(x, rate, 16)
        assert flac.stream_info(data)[0] == rate
        assert flac.decode(data)[1] == rate


def test_flac_crc_rejection():
    x = _smoothish(600, 6)
    data = bytearray(flac.encode(x, 8000, 16))
    data[-3] ^= 0x40  # flip a bit inside the last frame's payload
    with pytest.raises(flac.FlacFormatError):
        flac.decode(bytes(data))
    with pytest.raises(flac.FlacFormatError):
        flac.decode(b"fLaX" + bytes(40))
    with pytest.raises(flac.FlacFormatError):
        flac.decode(flac.encode(x, 8000, 16)[:-10] + b"\0" * 2)


def test_flac_samples_exceeding_depth_rejected():
    with pytest.raises(flac.FlacFormatError):
        flac.encode(np.array([40000]), 8000, 16)


# ---- hand-built streams: decoder paths the fixture encoder skips ----


def _handmade_stream(body_writer, block, rate=8000, bits=16, total=None):
    """Container + one frame whose subframe section is produced by
    ``body_writer(bw)`` — lets tests drive LPC / rice2 / partitions /
    escapes / wasted bits through the public decode()."""
    import struct

    total = block if total is None else total
    info = struct.pack(">HH", 4096, 4096) + b"\0" * 6
    info += ((rate << 44) | (0 << 41) | ((bits - 1) << 36) | total).to_bytes(8, "big")
    info += bytes(16)
    out = bytearray(b"fLaC") + bytes([0x80]) + len(info).to_bytes(3, "big") + info

    bw = _BitWriter()
    bw.write(0b11111111111110, 14)
    bw.write(0, 2)
    bw.write(7, 4)  # 16-bit block size field
    bw.write(4, 4)  # 8 kHz
    bw.write(0, 4)  # mono
    bw.write(4, 3)  # 16 bps
    bw.write(0, 1)
    for byte in _utf8_number(0):
        bw.write(byte, 8)
    bw.write(block - 1, 16)
    bw.align()
    header = bw.bytes()

    bw = _BitWriter()
    body_writer(bw)
    bw.align()
    body = header + bytes([_crc8(header)]) + bw.bytes()
    out += body + _crc16(body).to_bytes(2, "big")
    return bytes(out)


def _zigzag(v):
    return (v << 1) if v >= 0 else (((-v) << 1) - 1)


def test_flac_decodes_lpc_subframe():
    # s[i] = r[i] + (c0*s[i-1] + c1*s[i-2]) >> shift
    coef, shift, prec = [1843, -871], 10, 12
    samples = [100, 103]
    residual = [7, -3, 0, 12, -8, 2, 5, -1]
    for r in residual:
        pred = (coef[0] * samples[-1] + coef[1] * samples[-2]) >> shift
        samples.append(r + pred)

    def body(bw):
        bw.write(0, 1)
        bw.write(32 + (2 - 1), 6)  # LPC order 2
        bw.write(0, 1)  # no wasted bits
        for s in samples[:2]:
            bw.write(s, 16)
        bw.write(prec - 1, 4)
        bw.write(shift, 5)
        for c in coef:
            bw.write(c, prec)
        bw.write(0, 2)  # rice method 0
        bw.write(0, 4)  # partition order 0
        bw.write(3, 4)  # rice param 3
        for r in residual:
            z = _zigzag(r)
            bw.write_unary(z >> 3)
            bw.write(z, 3)

    data = _handmade_stream(body, block=len(samples))
    dec, _, _ = flac.decode(data)
    assert dec[:, 0].tolist() == samples


def test_flac_decodes_rice2_partitions_and_escape():
    # verbatim-equivalent via FIXED order 0, method 1 (5-bit params),
    # partition order 1: first partition rice2, second raw escape
    vals = [5, -6, 90, -121, 7, 8, -2, 0]

    def body(bw):
        bw.write(0, 1)
        bw.write(8, 6)  # FIXED order 0
        bw.write(0, 1)
        bw.write(1, 2)  # method 1: 5-bit rice2 params
        bw.write(1, 4)  # partition order 1 → two partitions of 4
        bw.write(4, 5)  # partition 1: rice param 4
        for r in vals[:4]:
            z = _zigzag(r)
            bw.write_unary(z >> 4)
            bw.write(z, 4)
        bw.write(31, 5)  # partition 2: escape
        bw.write(9, 5)  # raw 9-bit residuals
        for r in vals[4:]:
            bw.write(r & 0x1FF, 9)

    data = _handmade_stream(body, block=len(vals))
    assert flac.decode(data)[0][:, 0].tolist() == vals


def test_flac_decodes_wasted_bits():
    shifted = [v << 3 for v in (10, -5, 7, 0, -1, 2)]

    def body(bw):
        bw.write(0, 1)
        bw.write(1, 6)  # VERBATIM
        bw.write(1, 1)  # wasted-bits flag
        bw.write_unary(3 - 1)  # unary(k-1) → 3 wasted bits
        for v in shifted:
            bw.write(v >> 3, 16 - 3)

    data = _handmade_stream(body, block=len(shifted))
    assert flac.decode(data)[0][:, 0].tolist() == shifted


# ---- multimodal wiring ----


def test_decode_audio_flac_params(spark):
    from rq_spark.operators import multimodal as M

    x = _smoothish(1234, 8)
    df = spark.createDataFrame(
        [(1, bytearray(flac.encode(x, 22050, 16)))], "id long, payload binary"
    )
    row = M.decode_audio(df, strict=True).collect()[0]
    assert (row.sample_rate, row.n_channels, row.n_samples) == (22050, 1, 1234)


def test_extract_audio_features_flac_matches_wav(spark):
    import io
    import wave

    from rq_spark.operators import multimodal as M

    x = _smoothish(4000, 10)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(x.astype("<i2").tobytes())
    df = spark.createDataFrame(
        [
            (1, bytearray(buf.getvalue())),
            (2, bytearray(flac.encode(x, 8000, 16))),
        ],
        "id long, payload binary",
    )
    rows = {r.id: r for r in M.extract_audio_features(df, n_windows=4).collect()}
    # lossless: FLAC features must be bit-identical to the WAV's
    assert rows[1].rms_windows == rows[2].rms_windows
    assert rows[1].zero_cross_rate == rows[2].zero_cross_rate


def test_bitflip_near_footer_raises_not_misdecodes():
    # Regression (hypothesis, r8): flipping the byte just before the
    # frame CRC-16 made the subframe decode run one byte LONG, so the
    # footer slice data[br.byte : br.byte+2] silently truncated to one
    # byte and the CRC compare passed 1-in-256 — returning wrong
    # samples instead of raising. The footer read is now bounds-checked.
    import numpy as np
    import pytest

    x = np.frombuffer(b"\x07".ljust(8, b"\0"), dtype=np.uint8).astype(np.int64)
    data = bytearray(flac.encode(x, 8000, 16))
    frames_start = flac._frames_start(bytes(data))
    data[frames_start + 12] ^= 0xFF
    with pytest.raises(flac.FlacFormatError):
        flac.decode(bytes(data))
