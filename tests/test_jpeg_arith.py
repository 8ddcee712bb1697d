"""Arithmetic-coded JPEG (llm/jpeg_arith.py) — round-8: T.81 Annex D
QM-coder + Annex F/G statistical models, SOF9 sequential and SOF10
progressive.  Three independent verification layers:

1. The Table D.3 state machine is re-extracted from the SYSTEM
   libjpeg shared library (jaricom's packed table) and compared to the
   module's transcription — a typo in any of the 452 constants fails.
2. Internal differentials: the QM coder round-trips random decision
   sequences (covering carry propagation and 0xFF stacking), and both
   arithmetic encoders must decode BIT-exactly equal to the baseline
   Huffman encode of the same pixels (all four modes transmit
   identical quantized coefficients), across shapes, qualities,
   subsampling, restart intervals and DAC conditioning.
3. Cross-implementation interop: a small C helper compiled against the
   system libjpeg encodes/decodes real arithmetic JPEGs; libjpeg's
   streams must decode (by us) identically to its Huffman streams, and
   our streams must decode (by libjpeg) identically to our Huffman
   streams — both directions, sequential and progressive.

Reference: ITU-T T.81 (public spec); no reference-repo counterpart —
the reference pipeline has no image path at all."""

from __future__ import annotations

import os
import shutil
import struct
import subprocess

import numpy as np
import pytest

from turbine_maintenance_etl_spark.llm.jpeg import (
    decode_jpeg_pixels,
    encode_jpeg_baseline,
    encode_jpeg_progressive,
)
from turbine_maintenance_etl_spark.llm.jpeg_arith import (
    ArithDecoder,
    ArithEncoder,
    QM_STATES,
    encode_jpeg_arith,
    encode_jpeg_progressive_arith,
)

_LIBJPEG = next(
    (
        p
        for p in (
            "/usr/lib/x86_64-linux-gnu/libjpeg.so.62",
            "/usr/lib/x86_64-linux-gnu/libjpeg.so",
            "/usr/lib/libjpeg.so.62",
        )
        if os.path.exists(p)
    ),
    None,
)


# ------------------------------------------------------------ layer 1


@pytest.mark.skipif(_LIBJPEG is None, reason="system libjpeg not present")
def test_qm_table_matches_system_libjpeg():
    """Find the packed jaricom state table inside the system libjpeg
    (anchored on the first two Qe values) and compare every entry."""
    data = open(_LIBJPEG, "rb").read()
    anchor, second = struct.pack("<H", 0x5A1D), struct.pack("<H", 0x2586)
    base = None
    i = data.find(anchor)
    while i != -1:
        # 8-byte entries, Qe at bits 16..31: dword base is 2 back
        off = i - 2
        if off >= 0 and second in data[off : off + 20]:
            v = struct.unpack_from("<Q", data, off)[0]
            if v >> 16 == 0x5A1D:
                base = off
                break
        i = data.find(anchor, i + 1)
    assert base is not None, "jaricom table not found in libjpeg"
    packed = struct.unpack_from("<114Q", data, base)
    extracted = tuple(
        ((v >> 16) & 0xFFFF, (v >> 8) & 0xFF, v & 0x7F, (v >> 7) & 1)
        for v in packed
    )
    assert extracted == QM_STATES


# ------------------------------------------------------------ layer 2


def test_qm_coder_round_trip_random_decisions():
    rng = np.random.default_rng(7)
    for _ in range(30):
        n = int(rng.integers(1, 3000))
        bins = int(rng.integers(1, 40))
        seq = [
            (int(rng.integers(0, bins)), int(rng.integers(0, 2)))
            for _ in range(n)
        ]
        enc = ArithEncoder()
        st = bytearray(bins)
        for i, d in seq:
            enc.encode(st, i, d)
        payload = enc.flush()
        # stream invariant: every 0xFF inside the segment is stuffed
        j = 0
        while j < len(payload):
            if payload[j] == 0xFF:
                assert payload[j + 1] == 0x00
                j += 2
            else:
                j += 1
        dec = ArithDecoder(payload + b"\xff\xd9", 0)
        st = bytearray(bins)
        for i, d in seq:
            assert dec.decode(st, i) == d


def test_qm_coder_skewed_sequences_exercise_carry_paths():
    """Highly skewed decisions drive Qe toward both extremes, which is
    what produces long renormalization runs, 0xFF stacking and carry
    propagation in the byte layer."""
    for p_one, seed in ((0.999, 1), (0.001, 2), (0.97, 3)):
        rng = np.random.default_rng(seed)
        seq = (rng.random(5000) < p_one).astype(int).tolist()
        enc = ArithEncoder()
        st = bytearray(1)
        for d in seq:
            enc.encode(st, 0, d)
        payload = enc.flush()
        dec = ArithDecoder(payload + b"\xff\xd9", 0)
        st = bytearray(1)
        assert [dec.decode(st, 0) for _ in seq] == seq


def _grad_rgb(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [
            np.clip(yy * 2, 0, 255),
            np.clip(xx * 3, 0, 255),
            np.clip(yy + xx, 0, 255),
        ],
        2,
    ).astype(np.uint8)


@pytest.mark.parametrize("shape", [(8, 8, 1), (16, 24, 3), (33, 47, 3)])
@pytest.mark.parametrize("quality", [50, 85, 100])
def test_arith_decode_equals_baseline_bit_exact(shape, quality):
    rng = np.random.default_rng(hash(shape) % 2**32)
    px = rng.integers(0, 256, size=shape, dtype=np.uint8)
    for sub in (False, True) if shape[2] == 3 else (False,):
        for rst in (0, 3):
            base = decode_jpeg_pixels(
                encode_jpeg_baseline(px, quality, sub, rst)
            )
            seq = decode_jpeg_pixels(
                encode_jpeg_arith(px, quality, sub, rst)
            )
            prog = decode_jpeg_pixels(
                encode_jpeg_progressive_arith(px, quality, sub, rst)
            )
            assert np.array_equal(seq, base)
            assert np.array_equal(prog, base)


def test_dac_conditioning_changes_entropy_not_values():
    px = _grad_rgb(21, 34)
    base = decode_jpeg_pixels(encode_jpeg_baseline(px, 85, True))
    streams = set()
    for cond in ((0, 1), (0, 2), (2, 3), (4, 8), (0, 0)):
        for kx in (1, 5, 9, 63):
            data = encode_jpeg_arith(px, 85, True, dc_cond=cond, ac_kx=kx)
            streams.add(data)
            assert np.array_equal(decode_jpeg_pixels(data), base)
    # the conditioning really reaches the entropy coder
    assert len(streams) > 1


def test_invalid_conditioning_rejected():
    px = _grad_rgb(8, 8)
    with pytest.raises(ValueError, match="DC conditioning"):
        encode_jpeg_arith(px, dc_cond=(3, 1))
    with pytest.raises(ValueError, match="Kx"):
        encode_jpeg_arith(px, ac_kx=0)
    # decoder side: a DAC segment with L > U is corrupt
    data = bytearray(encode_jpeg_arith(px, dc_cond=(0, 1)))
    i = data.find(b"\xff\xcc")
    assert i != -1
    data[i + 5] = 0x0F  # (U=0)<<4 | L=15
    with pytest.raises(ValueError, match="DC conditioning"):
        decode_jpeg_pixels(bytes(data))


def test_grayscale_and_odd_dimensions():
    rng = np.random.default_rng(5)
    for shape in [(7, 9, 1), (64, 48, 1), (17, 19, 3)]:
        px = rng.integers(0, 256, size=shape, dtype=np.uint8)
        base = decode_jpeg_pixels(encode_jpeg_baseline(px, 90))
        assert np.array_equal(
            decode_jpeg_pixels(encode_jpeg_arith(px, 90)), base
        )
        assert np.array_equal(
            decode_jpeg_pixels(encode_jpeg_progressive_arith(px, 90)), base
        )


# ------------------------------------------------------------ layer 3


@pytest.fixture(scope="module")
def interop_helper(tmp_path_factory):
    if shutil.which("gcc") is None or not os.path.exists(
        "/usr/include/jpeglib.h"
    ):
        pytest.skip("gcc or jpeglib.h not available")
    src = os.path.join(os.path.dirname(__file__), "helpers", "jpeg_interop.c")
    exe = str(tmp_path_factory.mktemp("jpeg_interop") / "helper")
    res = subprocess.run(
        ["gcc", "-O2", "-o", exe, src, "-ljpeg"], capture_output=True
    )
    if res.returncode != 0:
        pytest.skip(f"helper failed to compile: {res.stderr[:200]!r}")
    return exe


def _write_pnm(path, px):
    h, w, nc = px.shape
    with open(path, "wb") as f:
        f.write((b"P6" if nc == 3 else b"P5") + b"\n%d %d\n255\n" % (w, h))
        f.write(px.tobytes())


def _read_pnm(path):
    data = open(path, "rb").read()
    magic, dims, _maxv, body = data.split(b"\n", 3)
    w, h = map(int, dims.split())
    nc = 3 if magic == b"P6" else 1
    return np.frombuffer(body, dtype=np.uint8).reshape(h, w, nc)


def test_libjpeg_arith_streams_decode_like_its_huffman_streams(
    interop_helper, tmp_path
):
    """System libjpeg encodes the same pixels in all four entropy/mode
    combinations; our decoder must read all four to identical pixels
    (entropy coding is lossless — the coefficients are the same)."""
    rng = np.random.default_rng(11)
    pnm_in = str(tmp_path / "in.pnm")
    jpg = str(tmp_path / "x.jpg")
    for shape in [(16, 24, 3), (37, 29, 3), (24, 16, 1)]:
        px = rng.integers(0, 256, size=shape, dtype=np.uint8)
        _write_pnm(pnm_in, px)
        for sub in (0, 1) if shape[2] == 3 else (0,):
            for rst in (0, 2):
                ref = None
                for arith in (0, 1):
                    for prog in (0, 1):
                        subprocess.run(
                            [interop_helper, "enc", pnm_in, jpg, "90",
                             str(arith), str(sub), str(prog), str(rst)],
                            check=True,
                        )
                        mine = decode_jpeg_pixels(open(jpg, "rb").read())
                        if ref is None:
                            ref = mine
                        assert np.array_equal(mine, ref), (
                            shape, sub, rst, arith, prog,
                        )


def test_our_arith_streams_decode_in_libjpeg_like_our_huffman_streams(
    interop_helper, tmp_path
):
    """The reverse direction: libjpeg must decode our four encoders'
    output to identical pixels."""
    rng = np.random.default_rng(12)
    jpg = str(tmp_path / "x.jpg")
    pnm_out = str(tmp_path / "out.pnm")
    for shape in [(16, 24, 3), (24, 16, 1)]:
        px = rng.integers(0, 256, size=shape, dtype=np.uint8)
        for sub in (False, True) if shape[2] == 3 else (False,):
            for rst in (0, 2):
                ref = None
                for enc in (
                    encode_jpeg_baseline,
                    encode_jpeg_progressive,
                    encode_jpeg_arith,
                    encode_jpeg_progressive_arith,
                ):
                    open(jpg, "wb").write(enc(px, 90, sub, rst))
                    subprocess.run(
                        [interop_helper, "dec", jpg, pnm_out], check=True
                    )
                    got = _read_pnm(pnm_out)
                    if ref is None:
                        ref = got
                    assert np.array_equal(got, ref), (
                        shape, sub, rst, enc.__name__,
                    )
