"""Baseline JPEG codec (llm/jpeg.py) — round-7: the last honest codec
gap. The encoder exists so the from-spec decoder is verifiable in this
container (no PIL/libjpeg): round-trip error must stay at quantization
level, and every structural variant the decoder claims (grayscale,
4:4:4, 4:2:0, restart markers, odd dimensions) has a producer here.
Reference: ITU-T T.81 (public spec); no reference-repo counterpart —
the reference pipeline has no image path at all."""

from __future__ import annotations

import numpy as np
import pytest

from turbine_maintenance_etl_spark.llm.jpeg import (
    decode_jpeg_pixels,
    encode_jpeg_baseline,
)


def _gradient(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return ((yy * 3 + xx * 2) % 256).astype(np.uint8)


def _rgb(h, w):
    g = _gradient(h, w)
    return np.stack([g, 255 - g, ((g.astype(int) * 2) % 256).astype(np.uint8)], 2)


def _rgb_smooth(h, w):
    """No 255->0 wraps: 4:2:0 chroma averaging across a wrap edge is a
    LEGITIMATE subsampling artifact (opposite hues average to gray), so
    the subsampled round-trip cases use smooth chroma."""
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [
            np.clip(yy * 2, 0, 255).astype(np.uint8),
            np.clip(xx * 3, 0, 255).astype(np.uint8),
            np.clip(yy + xx, 0, 255).astype(np.uint8),
        ],
        2,
    )


@pytest.mark.parametrize(
    "name,px,kw,mean_tol,max_tol",
    [
        # the rgb fixture's third channel wraps 255->0 (hard edges), so
        # its max tolerance allows the ringing JPEG legitimately adds
        ("gray", _gradient(40, 56)[:, :, None], {}, 1.0, 8),
        ("gray_odd", _gradient(41, 53)[:, :, None], {}, 1.0, 8),
        ("rgb_444", _rgb(40, 56), {}, 2.0, 48),
        ("rgb_420", _rgb_smooth(41, 53), {"subsample": True}, 3.0, 24),
        ("rgb_420_rst", _rgb_smooth(41, 53), {"subsample": True, "restart_interval": 2}, 3.0, 24),
        ("gray_rst", _gradient(40, 56)[:, :, None], {"restart_interval": 3}, 1.0, 8),
        ("tiny", _rgb(3, 5), {}, 4.0, 48),
    ],
)
def test_roundtrip_error_at_quantization_level(name, px, kw, mean_tol, max_tol):
    data = encode_jpeg_baseline(px, quality=90, **kw)
    dec = decode_jpeg_pixels(data)
    assert dec.shape == px.shape, name
    err = np.abs(dec.astype(int) - px.astype(int))
    assert err.mean() <= mean_tol, (name, err.mean())
    assert err.max() <= max_tol, (name, err.max())


def test_encode_is_deterministic():
    px = _rgb(24, 24)
    assert encode_jpeg_baseline(px, 85) == encode_jpeg_baseline(px, 85)


def test_restart_markers_present_and_equivalent():
    px = _gradient(40, 56)[:, :, None]
    plain = encode_jpeg_baseline(px, quality=90)
    rst = encode_jpeg_baseline(px, quality=90, restart_interval=2)
    assert b"\xff\xdd" in rst and b"\xff\xdd" not in plain  # DRI emitted
    assert any(bytes([0xFF, 0xD0 + i]) in rst for i in range(8))
    # decoded pixels identical: restarts change framing, not content
    assert np.array_equal(decode_jpeg_pixels(plain), decode_jpeg_pixels(rst))


def test_quality_monotone_in_size_and_error():
    px = np.random.default_rng(3).integers(0, 256, (32, 32, 3), dtype=np.uint8)
    hi = encode_jpeg_baseline(px, quality=95)
    lo = encode_jpeg_baseline(px, quality=30)
    assert len(hi) > len(lo)
    err_hi = np.abs(decode_jpeg_pixels(hi).astype(int) - px.astype(int)).mean()
    err_lo = np.abs(decode_jpeg_pixels(lo).astype(int) - px.astype(int)).mean()
    assert err_hi < err_lo


def test_rejects_non_jpeg_and_truncated():
    with pytest.raises(ValueError):
        decode_jpeg_pixels(b"\x89PNG\r\n\x1a\nxxxx")
    good = encode_jpeg_baseline(_gradient(16, 16)[:, :, None], 85)
    with pytest.raises(ValueError):
        decode_jpeg_pixels(good[: len(good) // 2])


def test_rejects_hierarchical_sof():
    # splice a hierarchical SOF5 where SOF0 sits: hierarchical stays
    # honestly rejected (progressive fell round 8, arithmetic fell
    # later the same round — see test_jpeg_arith.py)
    good = bytearray(encode_jpeg_baseline(_gradient(16, 16)[:, :, None], 85))
    i = bytes(good).index(b"\xff\xc0")
    good[i + 1] = 0xC5
    with pytest.raises(NotImplementedError):
        decode_jpeg_pixels(bytes(good))


# --- progressive (SOF2), round 8 --------------------------------------------


def _prog_cases():
    rng = np.random.default_rng(11)
    g = _gradient(24, 32)
    return [
        ("gray", _gradient(16, 16), False),
        ("gray-odd", _gradient(13, 19), False),
        ("gray-noise", rng.integers(0, 256, (24, 24)).astype(np.uint8), False),
        ("rgb", np.stack([g, 255 - g, ((g.astype(int) * 2) % 256).astype(np.uint8)], 2), False),
        ("rgb-noise", rng.integers(0, 256, (17, 21, 3)).astype(np.uint8), False),
        ("rgb-noise-420", rng.integers(0, 256, (17, 21, 3)).astype(np.uint8), True),
        ("rgb-big-420", rng.integers(0, 256, (64, 48, 3)).astype(np.uint8), True),
        ("flat", np.full((8, 8), 77, dtype=np.uint8), False),
        ("tiny", np.array([[200]], dtype=np.uint8), False),
    ]


@pytest.mark.parametrize("quality", [5, 30, 85, 95, 100])
def test_progressive_equals_baseline_bit_exactly(quality):
    """The decisive differential: progressive and baseline transmit the
    SAME quantized coefficients, so their decodes must be IDENTICAL
    arrays — any coefficient lost anywhere in the DC/AC first or
    refinement scan machinery (EOB runs, ZRL correction-bit
    interleaving, successive approximation) breaks this exactly."""
    from turbine_maintenance_etl_spark.llm.jpeg import encode_jpeg_progressive

    for name, px, sub in _prog_cases():
        base = decode_jpeg_pixels(
            encode_jpeg_baseline(px, quality=quality, subsample=sub)
        )
        prog = decode_jpeg_pixels(
            encode_jpeg_progressive(px, quality=quality, subsample=sub)
        )
        assert np.array_equal(base, prog), (name, quality, sub)


def test_progressive_streams_use_eob_runs_and_refinement():
    """Structural pin: the fixture encoder actually exercises the
    progressive decoder paths — the stream is SOF2, has >3 scans
    (spectral bands + refinements), and sparse data produces EOBn
    run symbols (checked by decoding a stream whose AC bands are
    mostly empty)."""
    from turbine_maintenance_etl_spark.llm.jpeg import encode_jpeg_progressive

    px = np.full((48, 48), 128, dtype=np.uint8)
    px[::16, ::16] = 255  # sparse detail -> most blocks all-zero AC bands
    data = encode_jpeg_progressive(px, quality=30)
    assert data[:2] == b"\xff\xd8" and b"\xff\xc2" in data
    n_scans = data.count(b"\xff\xda")
    assert n_scans >= 4, f"expected a multi-scan script, got {n_scans}"
    out = decode_jpeg_pixels(data)
    base = decode_jpeg_pixels(encode_jpeg_baseline(px, quality=30))
    assert np.array_equal(out, base)


def test_progressive_restart_markers_equivalent():
    """RSTn boundaries inside progressive scans (DC predictors reset,
    EOB runs flushed at the boundary) must not change the decode — the
    restart path of every progressive scan type gets a real producer."""
    from turbine_maintenance_etl_spark.llm.jpeg import encode_jpeg_progressive

    rng = np.random.default_rng(5)
    px = rng.integers(0, 256, (33, 41, 3)).astype(np.uint8)
    base = decode_jpeg_pixels(encode_jpeg_baseline(px, quality=60, subsample=True))
    for ri in (1, 2, 5):
        data = encode_jpeg_progressive(
            px, quality=60, subsample=True, restart_interval=ri
        )
        assert b"\xff\xdd" in data
        assert any(bytes([0xFF, 0xD0 + n]) in data for n in range(8))
        assert np.array_equal(base, decode_jpeg_pixels(data)), ri


def test_progressive_through_multimodal_dispatch():
    from turbine_maintenance_etl_spark.llm.jpeg import encode_jpeg_progressive
    from turbine_maintenance_etl_spark.llm.multimodal import decode_image_pixels

    px = _rgb(20, 28)
    prog = decode_image_pixels(encode_jpeg_progressive(px, quality=95))
    base = decode_image_pixels(encode_jpeg_baseline(px, quality=95))
    assert np.array_equal(prog, base)


def test_multimodal_dispatch_accepts_jpeg():
    from turbine_maintenance_etl_spark.llm.multimodal import (
        decode_image_pixels,
        encode_png,
    )

    px = _rgb(20, 28)
    jp = decode_image_pixels(encode_jpeg_baseline(px, quality=95))
    pn = decode_image_pixels(encode_png(px))
    assert jp.shape == pn.shape == px.shape
    assert np.array_equal(pn, px)  # PNG lossless
    assert np.abs(jp.astype(int) - px.astype(int)).mean() < 3.0


def test_image_phash_over_jpeg_bytes(spark):
    """The Spark-side contract: image_phash hashes a JPEG column
    end-to-end, identical bytes hash identically, and a corrupt row
    survives as a tagged NULL — and the perceptual hash of a
    high-quality JPEG matches the PNG of the same pixels (the decode
    noise is below dHash/aHash's comparison thresholds for this
    fixture)."""
    from turbine_maintenance_etl_spark.llm.multimodal import (
        dhash_int,
        encode_png,
        grayscale_int,
        image_phash,
    )

    px = _rgb(36, 48)
    jpeg = encode_jpeg_baseline(px, quality=95)
    png = encode_png(px)
    rows = [(1, bytearray(jpeg)), (2, bytearray(jpeg)), (3, bytearray(png)),
            (4, bytearray(b"not an image"))]
    df = spark.createDataFrame(rows, "doc_id long, media binary")
    got = {r["doc_id"]: r for r in image_phash(df).collect()}
    assert got[1]["dhash"] == got[2]["dhash"] is not None
    assert got[4]["dhash"] is None and got[4]["err"] is not None
    # JPEG q95 decode stays within the hash's tolerance on this fixture
    assert got[1]["dhash"] == got[3]["dhash"]
    assert got[1]["dhash"] == dhash_int(grayscale_int(px))


def test_fill_bytes_before_markers_are_skipped():
    """T.81 B.1.1.2: any number of 0xFF fill bytes may precede a marker.
    Round-7 advice: the fill byte fell through to the unknown-marker
    branch and misread a segment length, rejecting conformant streams
    from other encoders."""
    good = encode_jpeg_baseline(_gradient(16, 16)[:, :, None], 85)
    ref = decode_jpeg_pixels(good)
    # pad fills before the first few non-SOI markers (never inside the
    # entropy stream: stop at SOS)
    sos = good.index(b"\xff\xda")
    padded = bytearray(good[:2])
    pos = 2
    while pos < len(good):
        if pos <= sos and good[pos] == 0xFF:
            padded += b"\xff\xff\xff"  # three fills before the marker's 0xFF
        padded.append(good[pos])
        if pos <= sos and good[pos] == 0xFF:
            # copy the marker byte + rest of segment verbatim before
            # scanning for the next 0xFF (avoid padding inside lengths)
            pos += 1
            padded.append(good[pos])
            if good[pos] == 0xDA:
                padded += good[pos + 1 :]
                break
            if good[pos] not in (0x01, *range(0xD0, 0xD8)):
                import struct as _s

                (seglen,) = _s.unpack(">H", good[pos + 1 : pos + 3])
                padded += good[pos + 1 : pos + 1 + seglen]
                pos += seglen
        pos += 1
    out = decode_jpeg_pixels(bytes(padded))
    assert np.array_equal(out, ref)


def test_undefined_huffman_table_raises_valueerror():
    """Round-7 advice (medium): a scan referencing an undefined Huffman
    table id used to escape as a bare KeyError, crashing the Spark task
    instead of tagging a poison-pill NULL row."""
    good = bytearray(encode_jpeg_baseline(_gradient(16, 16)[:, :, None], 85))
    i = bytes(good).index(b"\xff\xda")
    # SOS: FF DA len(2) ns (cs tt)*ns ... — point comp 0 at tables 3/3
    good[i + 6] = 0x33
    with pytest.raises(ValueError):
        decode_jpeg_pixels(bytes(good))


def test_undefined_quant_table_raises_valueerror():
    good = bytearray(encode_jpeg_baseline(_gradient(16, 16)[:, :, None], 85))
    i = bytes(good).index(b"\xff\xc0")
    # SOF0: FF C0 len(2) prec(1) h(2) w(2) nc(1) (cid hv tq)* — comp 0's
    # tq sits at offset 11 from the 0xFF; point it at undefined table 3
    good[i + 12] = 0x03
    with pytest.raises(ValueError):
        decode_jpeg_pixels(bytes(good))


def test_partial_scan_raises_notimplemented():
    """Legal-but-unsupported non-interleaved multi-scan baseline (SOS
    listing fewer components than SOF0) must reject honestly, not
    KeyError mid-MCU."""
    px = _rgb(16, 16)
    good = bytearray(encode_jpeg_baseline(px, quality=85))
    i = bytes(good).index(b"\xff\xda")
    good[i + 4] = 1  # ns: 3 -> 1 (seglen untouched; parse rejects first)
    with pytest.raises(NotImplementedError):
        decode_jpeg_pixels(bytes(good))
