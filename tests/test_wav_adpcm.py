"""IMA/DVI ADPCM WAV support (llm/adpcm.py) — round 8.

Two independent verification layers:

1. Nibble-core differential against CPython's ``audioop.adpcm2lin``
   (stdlib until 3.12 — present in this container), an implementation
   written independently of this repo: identical int16 reconstruction
   for random nibble streams from a shared initial state.
2. Encoder/decoder contract: ADPCM is lossy, but the RECONSTRUCTION is
   integer-exact — the decoder must replay the encoder's predictor
   track bit-for-bit, the WAV container round-trips mono/stereo with
   fact-chunk trimming, and the error of the reconstruction against
   the input is bounded by the local step size (smooth signals)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from turbine_maintenance_etl_spark.llm.adpcm import (
    decode_ima_blocks,
    decode_nibbles,
    encode_nibbles,
    encode_wav_adpcm,
)
from turbine_maintenance_etl_spark.llm.multimodal import decode_wav_samples

try:
    import audioop  # deprecated, removed in 3.13 — gate, don't require

    _HAVE_AUDIOOP = hasattr(audioop, "adpcm2lin")
except ImportError:  # pragma: no cover
    _HAVE_AUDIOOP = False


@pytest.mark.skipif(not _HAVE_AUDIOOP, reason="stdlib audioop unavailable")
def test_nibble_decode_matches_audioop():
    rng = np.random.default_rng(5)
    for _ in range(20):
        n = int(rng.integers(2, 600)) & ~1  # audioop packs nibble pairs
        nibs = rng.integers(0, 16, size=n).tolist()
        # audioop packs the FIRST sample in the HIGH nibble
        packed = bytes(
            (nibs[i] << 4) | nibs[i + 1] for i in range(0, n, 2)
        )
        ref = np.frombuffer(
            audioop.adpcm2lin(packed, 2, (0, 0))[0], dtype="<i2"
        )
        got, _p, _i = decode_nibbles(nibs, 0, 0)
        assert np.array_equal(np.array(got, dtype=np.int16), ref)


@pytest.mark.skipif(not _HAVE_AUDIOOP, reason="stdlib audioop unavailable")
def test_nibble_decode_matches_audioop_from_random_states():
    rng = np.random.default_rng(6)
    for _ in range(10):
        pred = int(rng.integers(-32768, 32768))
        index = int(rng.integers(0, 89))
        nibs = rng.integers(0, 16, size=200).tolist()
        packed = bytes(
            (nibs[i] << 4) | nibs[i + 1] for i in range(0, 200, 2)
        )
        ref = np.frombuffer(
            audioop.adpcm2lin(packed, 2, (pred, index))[0], dtype="<i2"
        )
        got, _p, _i = decode_nibbles(nibs, pred, index)
        assert np.array_equal(np.array(got, dtype=np.int16), ref)


def test_decoder_replays_encoder_reconstruction_exactly():
    """Lossy codec, exact reconstruction: decode(encode(x)) must equal
    the encoder's own predictor track (not x)."""
    rng = np.random.default_rng(7)
    samples = rng.integers(-32768, 32768, size=1000).tolist()
    nibs, pred_end, idx_end = encode_nibbles(samples, samples[0], 0)
    recon, p2, i2 = decode_nibbles(nibs, samples[0], 0)
    assert (p2, i2) == (pred_end, idx_end)
    # re-encoding the reconstruction from the same state is a fixpoint
    nibs2, _, _ = encode_nibbles(recon, samples[0], 0)
    got, _, _ = decode_nibbles(nibs2, samples[0], 0)
    assert got == recon


@pytest.mark.parametrize("n_ch", [1, 2])
def test_wav_container_round_trip(n_ch):
    rng = np.random.default_rng(8 + n_ch)
    t = np.arange(2000) / 16000.0
    base = 0.5 * np.sin(2 * np.pi * 200 * t) + 0.02 * rng.standard_normal(2000)
    x = np.stack([base, -base][:n_ch], axis=1).astype(np.float32)
    data = encode_wav_adpcm(x, 16000)
    y, rate = decode_wav_samples(data)
    assert rate == 16000
    assert y.shape == x.shape  # fact chunk trims block padding
    # a trackable signal reconstructs at adaptive-step level after the
    # cold-start ramp (index starts at 0 = step 7)
    err = np.abs(y - np.clip(x, -1, 1))
    assert float(err[32:].max()) < 0.2
    assert float(err.mean()) < 0.01


@pytest.mark.skipif(not _HAVE_AUDIOOP, reason="stdlib audioop unavailable")
def test_coder_quality_matches_audioop_coder():
    """Same-signal error parity: our encoder's reconstruction error
    must match CPython's reference coder within 10% (catches quality
    regressions without over-pinning the quantizer's tie behavior)."""
    rng = np.random.default_rng(9)
    t = np.arange(4000) / 8000.0
    x = (0.5 * np.sin(2 * np.pi * 440 * t)
         + 0.1 * rng.standard_normal(4000)).astype(np.float32)
    pcm = np.round(np.clip(x, -1, 1) * 32767).astype("<i2")
    adp, _ = audioop.lin2adpcm(pcm.tobytes(), 2, None)
    lin, _ = audioop.adpcm2lin(adp, 2, None)
    ref = np.frombuffer(lin, dtype="<i2").astype(np.float32) / 32768.0
    ref_err = float(np.abs(ref - np.clip(x, -1, 1)).mean())

    nibs, _, _ = encode_nibbles(pcm.astype(np.int64).tolist(), 0, 0)
    mine, _, _ = decode_nibbles(nibs, 0, 0)
    mine = np.array(mine, dtype=np.int16).astype(np.float32) / 32768.0
    my_err = float(np.abs(mine - np.clip(x, -1, 1)).mean())
    assert my_err < ref_err * 1.1


def test_wav_adpcm_unaligned_frame_count_and_high_rate():
    x = (0.3 * np.sin(np.arange(777) / 5.0)).astype(np.float32)[:, None]
    y, rate = decode_wav_samples(encode_wav_adpcm(x, 44100))
    assert rate == 44100 and y.shape == (777, 1)


def test_corrupt_adpcm_rejected():
    x = np.zeros((100, 1), dtype=np.float32)
    data = bytearray(encode_wav_adpcm(x, 8000))
    # corrupt the first block header's step index beyond 88
    i = data.find(b"data") + 8
    data[i + 2] = 99
    with pytest.raises(ValueError, match="step index"):
        decode_wav_samples(bytes(data))
    # truncate below one block
    short = bytes(data[: i + 4])
    hdr = bytearray(short)
    hdr[i - 4 : i] = struct.pack("<I", 4)  # data size 4 < block_align
    with pytest.raises(ValueError):
        decode_wav_samples(bytes(hdr))


def test_other_compressed_formats_still_rejected():
    x = np.zeros((100, 1), dtype=np.float32)
    data = bytearray(encode_wav_adpcm(x, 8000))
    i = data.find(b"fmt ") + 8
    data[i : i + 2] = struct.pack("<H", 0x55)  # MP3-in-WAV: not implemented
    with pytest.raises(NotImplementedError):
        decode_wav_samples(bytes(data))


# ------------------------------------------------------------ MS ADPCM


def test_ms_nibble_decoder_replays_encoder_for_every_predictor():
    from turbine_maintenance_etl_spark.llm.adpcm import (
        ms_decode_nibbles,
        ms_encode_nibbles,
    )

    rng = np.random.default_rng(11)
    for pid in range(7):
        s = rng.integers(-32768, 32768, 400).tolist()
        nibs, rec = ms_encode_nibbles(s, pid, 64, s[1], s[0])
        assert ms_decode_nibbles(nibs, pid, 64, s[1], s[0]) == rec


@pytest.mark.parametrize("n_ch", [1, 2])
def test_ms_adpcm_wav_container_round_trip(n_ch):
    from turbine_maintenance_etl_spark.llm.adpcm import encode_wav_ms_adpcm

    rng = np.random.default_rng(12 + n_ch)
    t = np.arange(3000) / 16000.0
    base = 0.5 * np.sin(2 * np.pi * 200 * t) + 0.02 * rng.standard_normal(3000)
    x = np.stack([base, -base][:n_ch], axis=1).astype(np.float32)
    y, rate = decode_wav_samples(encode_wav_ms_adpcm(x, 16000))
    assert rate == 16000 and y.shape == x.shape
    # the fixture encoder CYCLES all 7 registered predictors (coverage
    # over fidelity), so the bound is looser than IMA's
    err = np.abs(y - np.clip(x, -1, 1))
    assert float(err.max()) < 0.25
    assert float(err.mean()) < 0.03


def test_ms_adpcm_header_samples_and_fact_trim():
    from turbine_maintenance_etl_spark.llm.adpcm import encode_wav_ms_adpcm

    # the first two output samples per block are the verbatim header
    # samples (oldest first) — exact regardless of predictor quality
    x = (np.linspace(-0.5, 0.5, 777).astype(np.float32))[:, None]
    y, _ = decode_wav_samples(encode_wav_ms_adpcm(x, 8000))
    assert y.shape == (777, 1)  # fact chunk trims final-block padding
    pcm = np.round(np.clip(x[:, 0], -1, 1) * 32767).astype(int)
    got = np.round(y[:, 0] * 32768).astype(int)
    assert got[0] == pcm[0] and got[1] == pcm[1]
    assert got[500] == pcm[500] and got[501] == pcm[501]  # block 2 header


def test_ms_adpcm_corrupt_predictor_rejected():
    from turbine_maintenance_etl_spark.llm.adpcm import encode_wav_ms_adpcm

    x = np.zeros((100, 1), dtype=np.float32)
    data = bytearray(encode_wav_ms_adpcm(x, 8000))
    i = data.find(b"data") + 8
    data[i] = 7  # predictor id out of range
    with pytest.raises(ValueError, match="predictor"):
        decode_wav_samples(bytes(data))


# ------------------------------------------- truncated final blocks (r9)


def _data_chunk(wav: bytes) -> tuple[bytes, int]:
    i = wav.find(b"data")
    n = struct.unpack_from("<I", wav, i + 4)[0]
    return wav[i + 8 : i + 8 + n], i


def test_ima_truncated_final_block_decodes_prefix():
    """ADVICE r8: a legal short FINAL block (header + k whole word
    rounds) must decode its samples instead of being silently dropped."""
    rng = np.random.default_rng(21)
    x = (0.4 * np.sin(np.arange(1200) / 7.0) + 0.02 * rng.standard_normal(1200)).astype(
        np.float32
    )[:, None]
    wav = encode_wav_adpcm(x, 8000, samples_per_block=505)
    raw, _ = _data_chunk(wav)
    block_align = 4 + (505 - 1) // 2  # mono
    full = decode_ima_blocks(raw, 1, block_align, None)
    for k in (0, 1, 7):  # header only / 1 word / 7 words into block 2
        cut = block_align + 4 + 4 * k
        got = decode_ima_blocks(raw[:cut], 1, block_align, None)
        want = 505 + 1 + 8 * k
        assert got.shape == (want, 1)
        assert np.array_equal(got, full[:want])
    # a sub-header trailing fragment is ignored, not an error
    got = decode_ima_blocks(raw[: block_align + 3], 1, block_align, None)
    assert np.array_equal(got, full[:505])
    # fact count beyond what a truncated stream holds still fails loudly
    with pytest.raises(ValueError, match="claims"):
        decode_ima_blocks(raw[: block_align + 4], 1, block_align, 1010)


def test_ms_truncated_final_block_decodes_prefix():
    from turbine_maintenance_etl_spark.llm.adpcm import (
        decode_ms_blocks,
        encode_wav_ms_adpcm,
    )

    rng = np.random.default_rng(22)
    x = (0.4 * np.sin(np.arange(1100) / 9.0) + 0.02 * rng.standard_normal(1100)).astype(
        np.float32
    )[:, None]
    wav = encode_wav_ms_adpcm(x, 8000, samples_per_block=500)
    raw, _ = _data_chunk(wav)
    block_align = 7 + (500 - 2) // 2  # mono
    full = decode_ms_blocks(raw, 1, block_align, None)
    for j in (0, 1, 9):  # header only / +1 nibble byte / +9 bytes
        cut = block_align + 7 + j
        got = decode_ms_blocks(raw[:cut], 1, block_align, None)
        want = 500 + 2 + 2 * j
        assert got.shape == (want, 1)
        assert np.array_equal(got, full[:want])
    # sub-header fragment ignored
    got = decode_ms_blocks(raw[: block_align + 6], 1, block_align, None)
    assert np.array_equal(got, full[:500])


def test_trailing_junk_fragments_ignored():
    """r9 review finding: a trailing fragment whose header doesn't
    validate is writer junk — skip it instead of poison-pilling the
    whole stream (a FULL block with a bad header still fails loudly)."""
    from turbine_maintenance_etl_spark.llm.adpcm import (
        decode_ms_blocks,
        encode_wav_ms_adpcm,
    )

    x = (0.3 * np.sin(np.arange(1010) / 7.0)).astype(np.float32)[:, None]
    wav = encode_wav_adpcm(x, 8000, samples_per_block=505)
    raw, _ = _data_chunk(wav)
    ba = 4 + (505 - 1) // 2
    full = decode_ima_blocks(raw, 1, ba, None)
    got = decode_ima_blocks(raw + b"\xff" * 10, 1, ba, None)  # index 255
    assert np.array_equal(got, full)
    # full-size block with a bad header still raises
    with pytest.raises(ValueError, match="step index"):
        decode_ima_blocks(raw + b"\xff" * ba, 1, ba, None)

    wav2 = encode_wav_ms_adpcm(x, 8000, samples_per_block=500)
    raw2, _ = _data_chunk(wav2)
    ba2 = 7 + (500 - 2) // 2
    full2 = decode_ms_blocks(raw2, 1, ba2, None)
    got2 = decode_ms_blocks(raw2 + b"\x09" * 12, 1, ba2, None)  # pred id 9
    assert np.array_equal(got2, full2)
    with pytest.raises(ValueError, match="predictor"):
        decode_ms_blocks(raw2 + b"\x09" * ba2, 1, ba2, None)
