"""Pure-Python AVI/MJPEG container codec (operators/avi.py) —
round-trips, header metadata, malformed-container rejection, and the
real-video-decode multimodal branches."""

from __future__ import annotations


import numpy as np
import pytest

from rq_spark.operators import avi, jpeg


def _smooth(h, w, phase=0):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.round(120 + 90 * np.sin((xx + phase) / 4.0) * np.cos(yy / 5.0)).astype(
        np.uint8
    )


@pytest.mark.parametrize("n,fps,h,w", [(1, 5, 8, 8), (4, 10, 24, 16), (7, 30, 16, 48)])
def test_avi_roundtrip(n, fps, h, w):
    frames = [_smooth(h, w, phase=i) for i in range(n)]
    data = avi.encode_mjpeg(frames, fps=fps, quality=95)
    assert avi.is_avi(data)
    dur, mw, mh, streams, total, mfps = avi.meta(data)
    assert (mw, mh, streams, total) == (w, h, 1, n)
    # fps round-trips through the microseconds-per-frame field
    assert abs(mfps - 1_000_000 / (1_000_000 // fps)) < 1e-9
    assert abs(dur - n * (1_000_000 // fps) / 1_000_000) < 1e-12
    decoded = avi.decode_frames(data)
    assert len(decoded) == n
    for src, out in zip(frames, decoded):
        assert out.shape == (h, w, 3)
        assert np.abs(out[:, :, 0].astype(int) - src.astype(int)).max() <= 6
        assert np.array_equal(out[:, :, 0], out[:, :, 1])


def test_avi_rgb_frames():
    rng = np.random.RandomState(7)
    base = rng.randint(60, 196, (16, 16, 3), dtype=np.uint8)
    # heavy blur so 4:4:4 JPEG stays within a small tolerance
    sm = base.astype(float)
    for _ in range(6):
        sm = (sm + np.roll(sm, 1, 0) + np.roll(sm, 1, 1) + np.roll(sm, -1, 0)) / 4
    frames = [sm.astype(np.uint8)] * 3
    data = avi.encode_mjpeg(frames, fps=12)
    out = avi.decode_frames(data)
    assert len(out) == 3 and out[0].shape == (16, 16, 3)
    assert np.abs(out[0].astype(int) - frames[0].astype(int)).max() <= 24


def test_avi_max_frames_bounds_decode_work():
    frames = [_smooth(8, 8, phase=i) for i in range(6)]
    data = avi.encode_mjpeg(frames, fps=10)
    assert len(avi.decode_frames(data, max_frames=2)) == 2


def test_avi_frame_chunks_are_jfif_streams():
    data = avi.encode_mjpeg([_smooth(8, 16)], fps=10)
    chunks = list(avi.iter_frame_chunks(data))
    assert len(chunks) == 1 and jpeg.is_jpeg(chunks[0])


def test_avi_rejects_non_avi_and_truncation():
    assert not avi.is_avi(b"RIFF\x04\x00\x00\x00WAVE")
    with pytest.raises(avi.AviFormatError):
        avi.meta(b"not an avi at all")
    data = avi.encode_mjpeg([_smooth(8, 8)], fps=10)
    # truncating inside the movi list must raise, not mis-parse
    with pytest.raises(avi.AviFormatError):
        list(avi.iter_frame_chunks(data[: len(data) - 40]))


def test_avi_rejects_mismatched_frame_dims():
    with pytest.raises(avi.AviFormatError):
        avi.encode_mjpeg([_smooth(8, 8), _smooth(9, 8)], fps=10)
    with pytest.raises(avi.AviFormatError):
        avi.encode_mjpeg([], fps=10)


def test_avi_non_jpeg_frame_chunk_raises():
    data = avi.encode_mjpeg([_smooth(8, 8)], fps=10)
    # corrupt the embedded JPEG SOI so the frame is no longer JFIF
    pos = data.find(b"\xff\xd8\xff")
    bad = data[:pos] + b"\x00\x00\x00" + data[pos + 3 :]
    with pytest.raises(avi.AviFormatError):
        avi.decode_frames(bad)


def test_decode_video_meta_avi_branch(spark):
    from rq_spark.operators import multimodal as M

    data = avi.encode_mjpeg([_smooth(12, 20, phase=i) for i in range(3)], fps=8)
    df = spark.createDataFrame([(1, bytearray(data))], "id long, payload binary")
    row = M.decode_video_meta(df, strict=True).collect()[0]
    assert (row.width, row.height, row.n_tracks) == (20, 12, 1)
    assert abs(row.duration_s - 3 * (1_000_000 // 8) / 1_000_000) < 1e-12


def test_sample_animation_frames_avi_real(spark):
    from rq_spark.operators import multimodal as M
    from rq_spark.operators import png as P

    data = avi.encode_mjpeg([_smooth(10, 16, phase=i) for i in range(5)], fps=10)
    df = spark.createDataFrame(
        [(1, bytearray(data)), (2, bytearray(b"\x00" * 64))],
        "id long, payload binary",
    )
    rows = {
        r.id: r for r in M.sample_animation_frames(df, n_frames=3).collect()
    }
    real = rows[1]
    assert real.frames_real and len(real.frames) == 3
    first = P.decode(bytes(real.frames[0]))
    assert first.shape == (10, 16, 3)
    # evenly-spaced sampling: first sampled frame is source frame 0
    assert (
        np.abs(first[:, :, 0].astype(int) - _smooth(10, 16, 0).astype(int)).max()
        <= 6
    )
    stub = rows[2]
    assert not stub.frames_real and len(stub.frames) == 3
