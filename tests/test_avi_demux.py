"""MJPEG AVI demux (llm/avi.py) — round 8, session 3: RIFF container
walk, frame-chunk extraction, word-alignment padding, poison-pill
contract, and the distributed frame-explode operator."""

from __future__ import annotations

import numpy as np
import pytest

from turbine_maintenance_etl_spark.llm.avi import (
    decode_avi_frames,
    encode_avi_mjpeg,
    explode_avi_frames,
)
from turbine_maintenance_etl_spark.llm.jpeg import (
    decode_jpeg_pixels,
    encode_jpeg_baseline,
    encode_jpeg_lossless,
)


def test_mux_demux_round_trip_exact_payloads():
    rng = np.random.default_rng(1)
    pxs = [rng.integers(0, 256, (16, 18), dtype=np.uint8) for _ in range(7)]
    frames = [encode_jpeg_lossless(p) for p in pxs]
    got = decode_avi_frames(encode_avi_mjpeg(frames, 18, 16))
    assert got == frames
    for fb, px in zip(got, pxs):
        assert np.array_equal(decode_jpeg_pixels(fb)[:, :, 0], px)


def test_odd_length_frames_word_aligned():
    odd = [b"\xff\xd8" + b"x" * 7 + b"\xff\xd9",
           b"\xff\xd8" + b"y" * 4 + b"\xff\xd9"]
    assert decode_avi_frames(encode_avi_mjpeg(odd, 2, 2)) == odd


def test_mixed_jpeg_modes_inside_one_container():
    """The demuxer is codec-agnostic: frames may be any JPEG mode the
    repo decodes (baseline here, lossless above)."""
    rng = np.random.default_rng(2)
    px = rng.integers(0, 256, (16, 16, 1), dtype=np.uint8)
    frames = [encode_jpeg_baseline(px, 90), encode_jpeg_lossless(px)]
    got = decode_avi_frames(encode_avi_mjpeg(frames, 16, 16))
    assert got == frames


def test_corrupt_containers_rejected():
    with pytest.raises(ValueError, match="RIFF/AVI"):
        decode_avi_frames(b"RIFF\x10\x00\x00\x00WAVExxxx")
    good = encode_avi_mjpeg([b"\xff\xd8\xff\xd9"], 2, 2)
    with pytest.raises(ValueError, match="truncated"):
        decode_avi_frames(good[:40])
    with pytest.raises(ValueError, match="no video frame"):
        decode_avi_frames(b"RIFF\x04\x00\x00\x00AVI ")
    with pytest.raises(ValueError, match="empty"):
        encode_avi_mjpeg([], 2, 2)


def test_explode_avi_frames_distributed_with_poison_pill(spark):
    rng = np.random.default_rng(3)
    rows = []
    for vid in range(4):
        frames = [
            encode_jpeg_lossless(
                rng.integers(0, 256, (8, 8), dtype=np.uint8)
            )
            for _ in range(3)
        ]
        rows.append((vid, bytearray(encode_avi_mjpeg(frames, 8, 8))))
    rows.append((99, bytearray(b"not an avi at all")))
    df = spark.createDataFrame(rows, "video_id long, media binary")
    out = explode_avi_frames(df).toPandas()
    ok = out[out.err.isnull()]
    bad = out[out.err.notnull()]
    assert len(ok) == 12 and sorted(ok.frame_idx.unique()) == [0, 1, 2]
    assert list(bad.video_id) == [99] and bad.frame_idx.isnull().all()
