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


def _independent_lossless_encode(px: np.ndarray, predictor: int, rst: int) -> bytes:
    """A second, from-scratch SOF3 encoder written directly from the
    T.81 Annex H text (own bit writer, own canonical-code derivation,
    own prediction logic) — the external oracle for the DRI prediction
    reset (H.1.2.1): at the beginning of each restart interval the
    first sample predicts 2^(P-1), the REST of that interval's first
    line uses the 1-D predictor Ra, and only later lines return to the
    normal rules (Rb at line start, selected predictor elsewhere)."""
    import struct

    h, w = px.shape
    prec = 8
    # canonical Huffman codes for BITS=[0,0,0,0,0,17,0,...] (17 codes
    # of length 6 for SSSS 0..16 — the stream's declared table),
    # derived per T.81 C.2 from scratch: first code of the shortest
    # length is 0, codes increment in value order
    codes = {v: (v, 6) for v in range(17)}

    bits: list[int] = []
    out = bytearray()

    def put(code: int, ln: int) -> None:
        for i in range(ln - 1, -1, -1):
            bits.append((code >> i) & 1)
        while len(bits) >= 8:
            byte = 0
            for b in bits[:8]:
                byte = (byte << 1) | b
            del bits[:8]
            out.append(byte)
            if byte == 0xFF:
                out.append(0x00)

    def flush() -> None:
        # pad the trailing partial byte with 1-bits (T.81 F.1.2.3)
        if len(bits) % 8:
            put((1 << (8 - len(bits) % 8)) - 1, 8 - len(bits) % 8)

    vals = px.astype(np.int64)
    default = 1 << (prec - 1)
    n = 0
    rs = (0, 0)
    rst_idx = 0
    for y in range(h):
        for x in range(w):
            if rst and n and n % rst == 0:
                flush()
                out.append(0xFF)
                out.append(0xD0 + rst_idx % 8)
                rst_idx += 1
                rs = (y, x)
            n += 1
            if (y, x) == rs:
                pred = default
            elif y == rs[0]:
                pred = int(vals[y, x - 1])  # Ra for interval's first line
            elif x == 0:
                pred = int(vals[y - 1, x])  # Rb at start of later lines
            else:
                a, b, c = (
                    int(vals[y, x - 1]),
                    int(vals[y - 1, x]),
                    int(vals[y - 1, x - 1]),
                )
                pred = {
                    1: a,
                    2: b,
                    3: c,
                    4: a + b - c,
                    5: a + ((b - c) >> 1),
                    6: b + ((a - c) >> 1),
                    7: (a + b) >> 1,
                }[predictor]
            diff = (int(vals[y, x]) - pred) % 65536
            if diff >= 32768:
                diff -= 65536
            if diff in (-32768, 32768):
                put(*codes[16])
                continue
            t = 0 if diff == 0 else int(abs(diff)).bit_length()
            put(*codes[t])
            if t:
                v = diff if diff >= 0 else diff + (1 << t) - 1
                put(v, t)
    flush()

    hdr = bytearray(b"\xff\xd8")
    sof = struct.pack(">BHHB", prec, h, w, 1) + struct.pack(">BBB", 1, 0x11, 0)
    hdr += b"\xff\xc3" + struct.pack(">H", 2 + len(sof)) + sof
    dc_bits = bytes([0, 0, 0, 0, 0, 17] + [0] * 10)
    body = b"\x00" + dc_bits + bytes(range(17))
    hdr += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body
    if rst:
        hdr += b"\xff\xdd" + struct.pack(">HH", 4, rst)
    sos = b"\x01" + struct.pack(">BB", 1, 0x00) + struct.pack(">BBB", predictor, 0, 0)
    hdr += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    return bytes(hdr) + bytes(out) + b"\xff\xd9"


@pytest.mark.parametrize("predictor", [2, 4, 6, 7])
def test_dri_prediction_reset_vs_independent_encoder(predictor):
    """ADVICE round-8 (medium): the restart reset must follow H.1.2.1 —
    default prediction for the interval's first sample, then Ra for the
    remainder of that interval's first LINE (not the 2-D predictor).
    Pinned against a from-scratch second encoder: (a) our encoder's
    stream is byte-identical, (b) our decoder reproduces the samples
    exactly — including restarts landing mid-line (w=7, rst=5) where
    the pre-fix rule diverged."""
    rng = np.random.default_rng(100 + predictor)
    for (h, w), rst in [((6, 7), 5), ((5, 8), 8), ((4, 9), 3)]:
        px = rng.integers(0, 256, (h, w)).astype(np.uint8)
        independent = _independent_lossless_encode(px, predictor, rst)
        ours = encode_jpeg_lossless(px[:, :, None], 8, predictor, 0, rst)
        assert ours == independent, (predictor, (h, w), rst)
        got = decode_jpeg_pixels_native(independent)
        assert np.array_equal(got[:, :, 0], px)


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
    with pytest.raises(ValueError, match="predictor"):
        encode_jpeg_lossless(px, predictor=0)
    with pytest.raises(ValueError, match="predictor"):
        encode_jpeg_lossless(px, predictor=8)
    with pytest.raises(ValueError, match="exceed"):
        encode_jpeg_lossless(np.full((4, 4), 300, np.uint16), precision=8)


def test_dri_mid_row_restart_frozen_fixture():
    """r9 ADVICE (low): lock the H.1.2.1 restart-origin interop
    interpretation against a FROZEN byte-level stream, so the encoder
    and decoder cannot co-drift to a different reading. The fixture is
    a 5x7 predictor-4 SOF3 stream with restart_interval=4 — every RSTn
    lands mid-row — generated once by the from-scratch independent
    encoder above and embedded literally. Interpretation chosen (and
    documented at llm/jpeg.py _lossless_predict): after an RSTn, the
    interval's first sample predicts 2^(P-Pt-1) and the REMAINDER of
    that interval's first line uses the 1-D predictor Ra; third-party
    encoders that keep 2-D prediction after a mid-row restart would
    produce a different byte stream for these samples."""
    px = np.array(
        [
            [81, 190, 0, 65, 184, 70, 133],
            [202, 146, 161, 175, 69, 185, 209],
            [189, 96, 202, 196, 4, 155, 38],
            [15, 20, 186, 50, 86, 165, 214],
            [42, 168, 63, 148, 129, 221, 87],
        ],
        dtype=np.uint8,
    )
    blob = bytes.fromhex(
        "ffd8ffc3000b080005000701011100ffc4002400000000000011000000000000"
        "00000000000102030405060708090a0b0c0d0e0f10ffdd00040004ffda000801"
        "01000400001901f690823c1fffd01b81c68df8fe7fffd11642789c395fffd21b"
        "9170210cd7ffd31e506483f225ff00ffd41d290a23e21bcfffd51d88d20f3c6c"
        "7fffd61d48ff00872c3d5fffd7063dc21e7fffd9"
    )
    assert np.array_equal(decode_jpeg_pixels_native(blob)[:, :, 0], px)
    assert encode_jpeg_lossless(px[:, :, None], 8, 4, 0, 4) == blob
