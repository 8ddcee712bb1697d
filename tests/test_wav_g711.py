"""G.711 µ-law/A-law WAV support (llm/g711.py) — round 8, session 3.

The decode tables are compared codeword-for-codeword against CPython's
independent ``audioop`` implementation (all 512 cases), the encoders
against ``audioop.lin2ulaw``/``lin2alaw`` over the full int16 range,
and the WAV container round-trips through the shared
``decode_wav_samples`` dispatch with companding-level error bounds."""

from __future__ import annotations

import numpy as np
import pytest

from turbine_maintenance_etl_spark.llm.g711 import (
    ALAW_TABLE,
    ULAW_TABLE,
    encode_wav_g711,
    linear_to_alaw,
    linear_to_ulaw,
)
from turbine_maintenance_etl_spark.llm.multimodal import decode_wav_samples

try:
    import audioop

    _HAVE_AUDIOOP = hasattr(audioop, "ulaw2lin")
except ImportError:  # pragma: no cover
    _HAVE_AUDIOOP = False


@pytest.mark.skipif(not _HAVE_AUDIOOP, reason="stdlib audioop unavailable")
def test_decode_tables_match_audioop_for_all_codewords():
    codes = bytes(range(256))
    ref_u = np.frombuffer(audioop.ulaw2lin(codes, 2), dtype="<i2")
    ref_a = np.frombuffer(audioop.alaw2lin(codes, 2), dtype="<i2")
    assert np.array_equal(ULAW_TABLE, ref_u)
    assert np.array_equal(ALAW_TABLE, ref_a)


@pytest.mark.skipif(not _HAVE_AUDIOOP, reason="stdlib audioop unavailable")
def test_encoders_match_audioop_across_the_int16_range():
    pcm = np.arange(-32768, 32768, 7, dtype="<i2")  # dense sweep
    ref_u = audioop.lin2ulaw(pcm.tobytes(), 2)
    ref_a = audioop.lin2alaw(pcm.tobytes(), 2)
    got_u = bytes(linear_to_ulaw(int(v)) for v in pcm)
    got_a = bytes(linear_to_alaw(int(v)) for v in pcm)
    assert got_u == ref_u
    assert got_a == ref_a


@pytest.mark.parametrize("ulaw", [True, False])
@pytest.mark.parametrize("n_ch", [1, 2])
def test_wav_container_round_trip(ulaw, n_ch):
    rng = np.random.default_rng(3)
    t = np.arange(1500) / 8000.0
    base = 0.4 * np.sin(2 * np.pi * 300 * t) + 0.05 * rng.standard_normal(1500)
    x = np.stack([base, -base][:n_ch], axis=1).astype(np.float32)
    y, rate = decode_wav_samples(encode_wav_g711(x, 8000, ulaw))
    assert rate == 8000 and y.shape == x.shape
    # companding SNR: logarithmic 8-bit quantization tracks amplitude
    err = np.abs(y - np.clip(x, -1, 1))
    assert float(err.max()) < 0.04
    assert float(err.mean()) < 0.01


def test_g711_decode_is_vectorized_table_take():
    """The decode path must stay a numpy table lookup — no per-sample
    Python in the hot loop (the property that makes this format cheap
    at corpus scale, unlike the sequential ADPCM predictor)."""
    from turbine_maintenance_etl_spark.llm.g711 import decode_g711

    out = decode_g711(bytes(range(256)), ulaw=True)
    assert out.dtype == np.int16 and out.shape == (256,)
    assert np.array_equal(out, ULAW_TABLE)
