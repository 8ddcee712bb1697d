"""12-bit JPEG (round 8, session 3): SOF1/SOF9 extended-sequential
decode at precision 12 — Pq=1 16-bit quantization tables, level shift
2048, DC categories to 15 / AC sizes to 14 — plus the grayscale
fixture encoder (Huffman flat tables or arithmetic) that gives the
path an in-container producer.

The q100 block-constant trick from the 8-bit oracle entries carries
over: an all-ones quantization table plus block-constant samples make
encode->decode BIT-exact at full 12-bit precision, and the Huffman and
arithmetic encoders must decode identically on ANY input (same
coefficients, different entropy layer)."""

from __future__ import annotations

import numpy as np
import pytest

from turbine_maintenance_etl_spark.llm.jpeg import (
    decode_jpeg_pixels,
    decode_jpeg_pixels_native,
    encode_jpeg_12bit,
    encode_jpeg_baseline,
)


def _block_constant(h, w, seed=123):
    br = np.arange(h)[:, None] // 8
    bc = np.arange(w)[None, :] // 8
    return ((br * 1000 + bc * 700 + seed) % 4096).astype(np.uint16)


@pytest.mark.parametrize("arith", [False, True])
def test_q100_block_constant_is_bit_exact(arith):
    px = _block_constant(16, 24)
    got = decode_jpeg_pixels_native(encode_jpeg_12bit(px, 100, arith=arith))
    assert got.dtype == np.uint16
    assert np.array_equal(got[:, :, 0], px)


def test_huffman_and_arithmetic_decode_identically():
    rng = np.random.default_rng(2)
    for shape in [(8, 8), (24, 33), (17, 9)]:
        px = rng.integers(0, 4096, shape, dtype=np.uint16)
        for quality in (60, 90, 100):
            h = decode_jpeg_pixels_native(encode_jpeg_12bit(px, quality))
            a = decode_jpeg_pixels_native(
                encode_jpeg_12bit(px, quality, arith=True)
            )
            assert np.array_equal(h, a), (shape, quality)


def test_q100_error_is_dct_rounding_only():
    rng = np.random.default_rng(3)
    px = rng.integers(0, 4096, (24, 33), dtype=np.uint16)
    got = decode_jpeg_pixels_native(encode_jpeg_12bit(px, 100))
    err = np.abs(got[:, :, 0].astype(int) - px.astype(int))
    # all-ones table: the only loss is the forward-DCT integer rounding
    assert int(err.max()) <= 2


@pytest.mark.parametrize("arith", [False, True])
def test_restart_markers_do_not_change_values(arith):
    rng = np.random.default_rng(4)
    px = rng.integers(0, 4096, (24, 33), dtype=np.uint16)
    a = decode_jpeg_pixels_native(encode_jpeg_12bit(px, 90, 3, arith))
    b = decode_jpeg_pixels_native(encode_jpeg_12bit(px, 90, 0, arith))
    assert np.array_equal(a, b)


def test_uint8_pipeline_contract_downconverts():
    px = _block_constant(16, 16)
    u8 = decode_jpeg_pixels(encode_jpeg_12bit(px, 100))
    assert u8.dtype == np.uint8 and u8.shape == (16, 16, 1)
    expect = ((px.astype(np.int64) * 255 + 2047) // 4095).astype(np.uint8)
    assert np.array_equal(u8[:, :, 0], expect)
    # 8-bit frames are untouched by the wrapper
    px8 = (px >> 4).astype(np.uint8)[:, :, None]
    assert decode_jpeg_pixels(encode_jpeg_baseline(px8, 90)).dtype == np.uint8


def test_rejects_12bit_baseline_and_bad_samples():
    px = _block_constant(8, 8)
    data = bytearray(encode_jpeg_12bit(px, 100))
    i = data.find(b"\xff\xc1")
    assert i != -1
    data[i + 1] = 0xC0  # claim baseline: 12-bit baseline is illegal
    with pytest.raises(NotImplementedError, match="precision"):
        decode_jpeg_pixels(bytes(data))
    with pytest.raises(ValueError, match="0..4095"):
        encode_jpeg_12bit(np.full((8, 8), 5000, dtype=np.uint16))
    with pytest.raises(ValueError, match="grayscale"):
        encode_jpeg_12bit(np.zeros((8, 8, 3), dtype=np.uint16))


def test_sof1_accepts_8bit_extended_sequential():
    """SOF1 at precision 8 is plain extended-sequential Huffman — the
    decoder must treat it exactly like baseline (same scan machinery)."""
    rng = np.random.default_rng(5)
    px = rng.integers(0, 256, (16, 24, 3), dtype=np.uint8)
    data = bytearray(encode_jpeg_baseline(px, 85))
    i = data.find(b"\xff\xc0")
    data[i + 1] = 0xC1
    assert np.array_equal(
        decode_jpeg_pixels(bytes(data)),
        decode_jpeg_pixels(encode_jpeg_baseline(px, 85)),
    )


def test_multimodal_dispatch_keeps_uint8_contract_for_12bit():
    """image_phash & friends sniff the JPEG signature and consume
    uint8 — a 12-bit stream must flow through the same dispatch with
    the downconverted contract, not leak uint16 into the hash path."""
    from turbine_maintenance_etl_spark.llm.multimodal import decode_image_pixels

    px = _block_constant(16, 24, seed=99)
    img = decode_image_pixels(encode_jpeg_12bit(px, 100))
    assert img.dtype == np.uint8 and img.shape == (16, 24, 1)
