"""Hypothesis property tests for the round-8 session-3 codecs — the
shrinking counterpart to the seeded differentials: the QM arithmetic
coder, lossless JPEG, G.711 companding and the IMA ADPCM nibble core
each get a generative pin on their defining invariant."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from turbine_maintenance_etl_spark.llm.jpeg import (
    decode_jpeg_pixels_native,
    encode_jpeg_lossless,
)
from turbine_maintenance_etl_spark.llm.jpeg_arith import (
    ArithDecoder,
    ArithEncoder,
)

try:
    import audioop

    _HAVE_AUDIOOP = hasattr(audioop, "adpcm2lin")
except ImportError:  # pragma: no cover
    _HAVE_AUDIOOP = False


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 11), st.integers(0, 1)),
        min_size=1,
        max_size=800,
    )
)
def test_qm_coder_round_trips_any_decision_sequence(seq):
    enc = ArithEncoder()
    st_bins = bytearray(12)
    for i, d in seq:
        enc.encode(st_bins, i, d)
    payload = enc.flush()
    dec = ArithDecoder(payload + b"\xff\xd9", 0)
    st_bins = bytearray(12)
    assert [dec.decode(st_bins, i) for i, _d in seq] == [d for _i, d in seq]


@settings(max_examples=40, deadline=None)
@given(
    st.integers(1, 6),  # height
    st.integers(1, 6),  # width
    st.integers(1, 7),  # predictor
    st.integers(0, 2),  # restart interval selector
    st.data(),
)
def test_lossless_jpeg_exact_on_any_image(h, w, psel, rsel, data):
    px = np.array(
        data.draw(
            st.lists(
                st.integers(0, 255), min_size=h * w, max_size=h * w
            )
        ),
        dtype=np.uint8,
    ).reshape(h, w)
    rst = (0, 2, 7)[rsel]
    got = decode_jpeg_pixels_native(encode_jpeg_lossless(px, 8, psel, 0, rst))
    assert np.array_equal(got[:, :, 0], px)


@pytest.mark.skipif(not _HAVE_AUDIOOP, reason="stdlib audioop unavailable")
@settings(max_examples=60, deadline=None)
@given(st.integers(-32768, 32767))
def test_g711_encoders_match_audioop_pointwise(v):
    from turbine_maintenance_etl_spark.llm.g711 import (
        linear_to_alaw,
        linear_to_ulaw,
    )

    pcm = np.array([v], dtype="<i2").tobytes()
    assert bytes([linear_to_ulaw(v)]) == audioop.lin2ulaw(pcm, 2)
    assert bytes([linear_to_alaw(v)]) == audioop.lin2alaw(pcm, 2)


@pytest.mark.skipif(not _HAVE_AUDIOOP, reason="stdlib audioop unavailable")
@settings(max_examples=40, deadline=None)
@given(
    st.integers(-32768, 32767),
    st.integers(0, 88),
    st.lists(st.integers(0, 15), min_size=2, max_size=400),
)
def test_ima_nibble_decode_matches_audioop_anywhere(pred, index, nibs):
    from turbine_maintenance_etl_spark.llm.adpcm import decode_nibbles

    if len(nibs) % 2:
        nibs = nibs[:-1]  # audioop consumes whole bytes
    packed = bytes(
        (nibs[i] << 4) | nibs[i + 1] for i in range(0, len(nibs), 2)
    )
    ref = np.frombuffer(
        audioop.adpcm2lin(packed, 2, (pred, index))[0], dtype="<i2"
    )
    got, _p, _i = decode_nibbles(nibs, pred, index)
    assert np.array_equal(np.array(got, dtype=np.int16), ref)


@settings(max_examples=30, deadline=None)
@given(
    st.integers(2, 5),  # height
    st.integers(2, 5),  # width
    st.sampled_from([1, 2, 4, 8, 16]),  # depth (gray)
    st.integers(0, 1),  # interlace
    st.data(),
)
def test_png_gray_round_trips_any_depth(h, w, depth, interlace, data):
    from turbine_maintenance_etl_spark.llm.png import (
        decode_png_pixels,
        encode_png_extended,
    )

    s = np.array(
        data.draw(
            st.lists(
                st.integers(0, (1 << depth) - 1),
                min_size=h * w,
                max_size=h * w,
            )
        ),
        dtype=np.uint16,
    ).reshape(h, w)
    got = decode_png_pixels(encode_png_extended(s, depth, 0, interlace=interlace))
    if depth == 16:
        exp = (s >> 8).astype(np.uint8)
    elif depth < 8:
        exp = (s.astype(np.int64) * 255 // ((1 << depth) - 1)).astype(np.uint8)
    else:
        exp = s.astype(np.uint8)
    assert np.array_equal(got[:, :, 0], exp)
