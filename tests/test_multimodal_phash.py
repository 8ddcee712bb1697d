"""Image perceptual-hash dedup (llm/multimodal.py: image_phash /
phash_dedup / phash_near_dup_pairs) — the image twin of the text dedup
family. The exact-collision + oracle path is driver-graded
(dedup_image_phash); these tests pin the NEAR-duplicate semantics the
oracle can't express: small-edit images land at small Hamming distance
and pair up via the band join, unrelated images don't, and poison-pill
rows survive."""

from __future__ import annotations

import numpy as np
import pytest

from turbine_maintenance_etl_spark.llm.multimodal import (
    ahash_int,
    dhash_int,
    decode_png_pixels,
    encode_png,
    grayscale_int,
    image_phash,
    phash_dedup,
    phash_near_dup_pairs,
)


def _smooth_image(seed: int, h: int = 32, w: int = 36) -> np.ndarray:
    """Natural-image stand-in: smooth 2D gradient + mild seeded texture
    (dHash is designed for smooth images; pure noise is out of scope)."""
    rng = np.random.default_rng(seed)
    r = np.arange(h)[:, None]
    c = np.arange(w)[None, :]
    k1, k2 = int(rng.integers(-9, 10)), int(rng.integers(-9, 10))
    amp, period, phase = (
        float(rng.uniform(20, 60)),
        float(rng.uniform(2.0, 6.0)),
        float(rng.uniform(0, 6.28)),
    )
    base = (
        r * k1 + c * k2 + amp * np.sin(c / period + phase) + amp * np.cos(r / period)
    ).astype(np.int64)
    tex = rng.integers(-2, 3, size=(h, w))
    return np.clip(base % 200 + 20 + tex, 0, 255).astype(np.uint8)[:, :, None]


def _hashes(px: np.ndarray) -> tuple[int, int]:
    gray = grayscale_int(decode_png_pixels(encode_png(px)))
    return dhash_int(gray), ahash_int(gray)


def test_brightness_shift_is_hash_invariant():
    """Uniform brightness change (the classic re-encode artifact): same
    dHash AND aHash, while the raw bytes differ — exactly what makes a
    perceptual hash a dedup key where sha256 is not."""
    a = _smooth_image(1)
    b = np.clip(a.astype(np.int64) + 7, 0, 255).astype(np.uint8)
    assert not np.array_equal(a, b)
    assert _hashes(a) == _hashes(b)


def test_small_edit_small_hamming_unrelated_large():
    a = _smooth_image(2)
    edited = a.copy()
    edited[4:7, 5:8, 0] = 255  # local splotch: a few resized cells change
    other = _smooth_image(99, h=32, w=36)
    da, _ = _hashes(a)
    de, _ = _hashes(edited)
    do, _ = _hashes(other)
    ham = lambda x, y: bin(x ^ y).count("1")  # noqa: E731
    assert ham(da, de) <= 6
    assert ham(da, do) > 6


def test_near_dup_pairs_and_poison_pills(spark):
    """End-to-end through Spark: the banded Hamming join pairs the
    edited near-duplicate with its source, skips the unrelated image,
    and a corrupt payload degrades to NULL hashes + err (kept as its
    own survivor by phash_dedup)."""
    a = _smooth_image(3)
    edited = a.copy()
    edited[10:12, 20:23, 0] = 0
    rows = [
        (1, bytearray(encode_png(a))),
        (2, bytearray(encode_png(edited))),
        (3, bytearray(encode_png(_smooth_image(77)))),
        (4, bytearray(b"not a png at all")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, media binary")
    ph = image_phash(df)
    rows_out = {r["doc_id"]: r for r in ph.collect()}
    assert rows_out[4]["dhash"] is None and rows_out[4]["err"] is not None
    assert rows_out[1]["err"] is None

    pairs = {
        (r["id_a"], r["id_b"])
        for r in phash_near_dup_pairs(ph, max_hamming=6).collect()
    }
    assert (1, 2) in pairs
    assert (1, 3) not in pairs and (2, 3) not in pairs

    surv = {r["doc_id"]: r["survivor"] for r in phash_dedup(ph).collect()}
    assert surv[4] is True  # poison pill passes through


def test_phash_dedup_collapses_exact_collisions(spark):
    """Brightness variants collide on dHash -> one survivor (min id);
    the distinct image survives alone."""
    a = _smooth_image(5)
    b = np.clip(a.astype(np.int64) + 5, 0, 255).astype(np.uint8)
    rows = [
        (10, bytearray(encode_png(a))),
        (11, bytearray(encode_png(b))),
        (12, bytearray(encode_png(_smooth_image(50)))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, media binary")
    out = {r["doc_id"]: r["survivor"] for r in phash_dedup(image_phash(df)).collect()}
    assert out == {10: True, 11: False, 12: True}


@pytest.mark.parametrize("h,w", [(16, 18), (40, 24), (9, 8)])
def test_resize_identity_and_bit_width(h, w):
    """Hashes fit in 56 bits for any input geometry, including inputs
    already at or below hash resolution."""
    px = _smooth_image(7, h=h, w=w)
    d, a = _hashes(px)
    assert 0 <= d < (1 << 56) and 0 <= a < (1 << 56)
