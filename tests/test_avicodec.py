"""MJPEG-AVI container codec (sources/avicodec.py) + the video frame
feature lane — closes the round-2 'video gated' stub with a real public
format (RIFF chunks of baseline JPEGs)."""

import struct

import numpy as np
import pytest

from niamoto_spark.sources import avicodec as av


def _frames(n=6, h=24, w=32):
    out = []
    for i in range(n):
        y, x = np.mgrid[0:h, 0:w]
        out.append(np.stack([(x * (11 + 7 * i)) % 256,
                             (y * (13 + 5 * i)) % 256,
                             ((x + y) * (3 + i)) % 256],
                            axis=2).astype(np.uint8))
    return out


def test_avi_roundtrip_all_frames():
    frames = _frames()
    data = av.encode_avi_mjpeg(frames, fps=10, quality=92)
    decoded = av.decode_avi_mjpeg(data)
    assert [i for i, _ in decoded] == list(range(6))
    for (_, got), want in zip(decoded, frames):
        assert got.shape == want.shape
        assert np.abs(got.astype(int) - want.astype(int)).mean() < 3.0


def test_avi_frame_sampling_and_cap():
    data = av.encode_avi_mjpeg(_frames(10))
    assert [i for i, _ in av.decode_avi_mjpeg(data, every_n=3)] == [0, 3, 6, 9]
    assert len(av.decode_avi_mjpeg(data, every_n=1, max_frames=4)) == 4


def test_avi_header_structure():
    data = av.encode_avi_mjpeg(_frames(2), fps=25)
    assert data[:4] == b"RIFF" and data[8:12] == b"AVI "
    # RIFF size field covers the whole body
    assert struct.unpack_from("<I", data, 4)[0] == len(data) - 8
    assert b"MJPG" in data and b"movi" in data and b"idx1" in data


def test_avi_rejects_garbage_and_truncation():
    with pytest.raises(ValueError, match="not an AVI"):
        list(av.iter_avi_frames(b"RIFFxxxxWAVE"))
    data = av.encode_avi_mjpeg(_frames(3))
    with pytest.raises(ValueError):
        # cut inside the movi list: chunk extends past the buffer
        list(av.iter_avi_frames(data[:len(data) // 2]))


def test_video_frame_features_operator(spark):
    from niamoto_spark.operators.multimodal import video_frame_features

    frames_a = _frames(6)
    frames_b = _frames(4, h=16, w=16)
    df = spark.createDataFrame(
        [(1, bytearray(av.encode_avi_mjpeg(frames_a))),
         (2, bytearray(av.encode_avi_mjpeg(frames_b)))],
        "media_id long, payload binary")
    rows = video_frame_features(df, every_n=2).collect()
    got = {(r["media_id"], r["frame_idx"]): r for r in rows}
    assert set(got) == {(1, 0), (1, 2), (1, 4), (2, 0), (2, 2)}
    assert got[(1, 0)]["width"] == 32 and got[(2, 0)]["width"] == 16
    # mean luminance tracks the encoder input within JPEG error
    want = float(frames_a[2].astype(np.float32).mean(axis=2).mean())
    assert got[(1, 2)]["mean_luma"] == pytest.approx(want, abs=2.0)
    # frame dHashes are populated and frame-distinct
    hashes = {r["dhash"] for r in rows}
    assert len(hashes) > 1
