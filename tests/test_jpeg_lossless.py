"""Lossless JPEG (SOF3, T.81 Annex H) — round 8, session 3: the
prediction-residual mode DICOM archives use. Verification is the
defining property itself: decode(encode(x)) == x EXACTLY for every
input — across all 7 predictors, precisions 2..16, multi-component
interleaving, restart markers and the point transform."""

from __future__ import annotations

import numpy as np
import pytest

from turbine_maintenance_etl_spark.llm.jpeg import (
    decode_jpeg_pixels,
    decode_jpeg_pixels_native,
    encode_jpeg_lossless,
)


@pytest.mark.parametrize("predictor", list(range(1, 8)))
def test_exact_round_trip_every_predictor(predictor):
    rng = np.random.default_rng(predictor)
    for prec in (2, 8, 12, 16):
        for shape in [(1, 1, 1), (7, 9, 1), (5, 6, 3)]:
            dt = np.uint16 if prec > 8 else np.uint8
            px = rng.integers(0, 1 << prec, shape).astype(dt)
            for rst in (0, 5):
                got = decode_jpeg_pixels_native(
                    encode_jpeg_lossless(px, prec, predictor, 0, rst)
                )
                assert got.dtype == dt and got.shape == px.shape
                assert np.array_equal(got, px), (prec, shape, rst)


def test_worst_case_residuals_exact():
    """Alternating extremes maximize |diff| (the modulo-2^16 and
    SSSS=16 paths) — still exact."""
    for prec in (8, 16):
        m = (1 << prec) - 1
        px = np.zeros((4, 6), dtype=np.uint16)
        px[:, 1::2] = m
        got = decode_jpeg_pixels_native(encode_jpeg_lossless(px, prec, 1))
        assert np.array_equal(got[:, :, 0].astype(int), px.astype(int))


def test_point_transform_reconstructs_quantized_value():
    rng = np.random.default_rng(9)
    px = rng.integers(0, 256, (6, 8, 1)).astype(np.uint8)
    got = decode_jpeg_pixels_native(
        encode_jpeg_lossless(px, 8, 4, point_transform=2)
    )
    assert np.array_equal(
        got[:, :, 0].astype(int), (px[:, :, 0].astype(int) >> 2) << 2
    )


def test_uint8_contract_scales_by_true_precision():
    rng = np.random.default_rng(10)
    px16 = rng.integers(0, 65536, (5, 5)).astype(np.uint16)
    u8 = decode_jpeg_pixels(encode_jpeg_lossless(px16, 16))
    exp = ((px16.astype(np.int64) * 255 + 32767) // 65535).astype(np.uint8)
    assert np.array_equal(u8[:, :, 0], exp)
    # 8-bit lossless passes through untouched
    px8 = rng.integers(0, 256, (5, 5, 3)).astype(np.uint8)
    assert np.array_equal(
        decode_jpeg_pixels(encode_jpeg_lossless(px8, 8)), px8
    )


def test_invalid_lossless_streams_rejected():
    px = np.zeros((4, 4), dtype=np.uint8)
    data = bytearray(encode_jpeg_lossless(px, 8, predictor=3))
    # corrupt the predictor selector to 0 (reserved)
    i = data.find(b"\xff\xda")
    ln = int.from_bytes(data[i + 2 : i + 4], "big")
    data[i + 2 + ln - 3] = 0
    with pytest.raises(ValueError, match="predictor"):
        decode_jpeg_pixels(bytes(data))
    with pytest.raises(ValueError, match="precision"):
        encode_jpeg_lossless(px, precision=17)
    with pytest.raises(ValueError, match="exceed"):
        encode_jpeg_lossless(np.full((4, 4), 300, np.uint16), precision=8)
