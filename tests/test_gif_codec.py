"""GIF decode (llm/gif.py) — round 8, session 3. Layers: LZW
round-trip properties (width growth, dict-full clears, KwKwK),
container round trips (interlace, transparency, offsets, disposal
compositing), cross-implementation differential against the JVM's
javax.imageio GIF codec, and the pipeline dispatch contract."""

from __future__ import annotations

import os

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from turbine_maintenance_etl_spark.llm.gif import (
    decode_gif_frames,
    decode_gif_pixels,
    encode_gif,
    lzw_decode,
    lzw_encode,
)


@settings(max_examples=50, deadline=None)
@given(st.integers(2, 8), st.lists(st.integers(0, 255), min_size=1,
                                   max_size=3000))
def test_lzw_round_trips_any_stream(mcs, idx):
    idx = [v % (1 << mcs) for v in idx]
    assert lzw_decode(lzw_encode(idx, mcs), mcs) == idx


def test_lzw_dict_full_clear_boundary():
    rng = np.random.default_rng(1)
    idx = rng.integers(0, 4, 60000).tolist()  # mcs=2 fills the dict fast
    assert lzw_decode(lzw_encode(idx, 2), 2) == idx


def test_lzw_kwkwk_self_reference():
    # 'aaaa...' produces the KwKwK case immediately
    idx = [0] * 50
    assert lzw_decode(lzw_encode(idx, 2), 2) == idx


@pytest.mark.parametrize("interlace", [False, True])
def test_single_frame_round_trip(interlace):
    rng = np.random.default_rng(2 + interlace)
    pal = rng.integers(0, 256, (16, 3)).astype(np.uint8)
    fr = rng.integers(0, 16, (23, 31))
    got = decode_gif_pixels(encode_gif([fr], pal, interlace=interlace))
    assert np.array_equal(got, pal[fr])


def test_animation_compositing_disposals():
    rng = np.random.default_rng(3)
    pal = rng.integers(0, 256, (16, 3)).astype(np.uint8)
    base = rng.integers(1, 16, (10, 12))
    patch = rng.integers(1, 16, (4, 5))
    patch_t = patch.copy()
    patch_t[1:3, 1:3] = 0  # transparent hole
    frames = decode_gif_frames(
        encode_gif(
            [base, patch_t, patch], pal, width=12, height=10,
            offsets=[(0, 0), (3, 2), (5, 4)], transparent=0,
            disposals=[1, 3, 0],
        )
    )
    assert len(frames) == 3
    exp1 = pal[base].copy()
    reg = exp1[2:6, 3:8].copy()
    vis = patch_t != 0
    reg[vis] = pal[patch_t][vis]
    assert np.array_equal(frames[1][2:6, 3:8], reg)
    exp2 = pal[base].copy()  # disposal 3 restored the base under frame 2
    exp2[4:8, 5:10] = pal[patch]
    assert np.array_equal(frames[2], exp2)


def test_corrupt_gifs_rejected():
    with pytest.raises(ValueError, match="not a GIF"):
        decode_gif_pixels(b"GIF90a" + b"\x00" * 20)
    pal = np.zeros((4, 3), np.uint8)
    good = encode_gif([np.zeros((4, 4), int)], pal)
    with pytest.raises(ValueError):
        decode_gif_pixels(good[:20])
    # frame exceeding the logical screen
    bad = bytearray(good)
    i = bad.index(0x2C)
    bad[i + 5 : i + 7] = (200).to_bytes(2, "little")  # frame width 200
    with pytest.raises(ValueError):
        decode_gif_pixels(bytes(bad))


def test_pipeline_dispatch_reads_gif():
    from turbine_maintenance_etl_spark.llm.multimodal import decode_image_pixels

    rng = np.random.default_rng(4)
    pal = rng.integers(0, 256, (8, 3)).astype(np.uint8)
    fr = rng.integers(0, 8, (9, 11))
    img = decode_image_pixels(encode_gif([fr], pal))
    assert img.dtype == np.uint8 and img.shape == (9, 11, 3)
    assert np.array_equal(img, pal[fr])


# ------------------------------------------- javax.imageio differential


def test_cross_implementation_with_imageio(spark, tmp_path):
    jvm = spark._jvm
    BufferedImage = jvm.java.awt.image.BufferedImage
    ImageIO = jvm.javax.imageio.ImageIO
    File = jvm.java.io.File
    rng = np.random.default_rng(5)

    def jread_rgb(path):
        img = ImageIO.read(File(path))
        w, h = img.getWidth(), img.getHeight()
        arr = np.array(list(img.getRGB(0, 0, w, h, None, 0, w)),
                       dtype=np.int64).reshape(h, w)
        return np.stack(
            [(arr >> 16) & 0xFF, (arr >> 8) & 0xFF, arr & 0xFF], 2
        )

    # ImageIO-produced GIF -> our decoder equals its own read-back
    px = rng.integers(0, 256, (21, 19, 3), dtype=np.uint8)
    bi = BufferedImage(19, 21, BufferedImage.TYPE_BYTE_INDEXED)
    for y in range(21):
        for x in range(19):
            bi.setRGB(x, y, int(px[y, x, 0]) << 16 | int(px[y, x, 1]) << 8
                      | int(px[y, x, 2]))
    p = str(tmp_path / "a.gif")
    ImageIO.write(bi, "gif", File(p))
    data = open(p, "rb").read()
    assert np.array_equal(decode_gif_pixels(data), jread_rgb(p))

    # our encoder (plain + interlaced) -> ImageIO reads exactly
    pal = rng.integers(0, 256, (32, 3)).astype(np.uint8)
    fr = rng.integers(0, 32, (17, 23))
    for il in (False, True):
        p2 = str(tmp_path / f"b{il}.gif")
        open(p2, "wb").write(encode_gif([fr], pal, interlace=il))
        assert np.array_equal(jread_rgb(p2), pal[fr]), il


def test_animated_disposal2_differential_with_imageio(spark, tmp_path):
    """ADVICE r8: disposal 2 with a declared transparency index must
    restore the region to TRANSPARENT, not the background color.
    External differential: javax.imageio decodes each frame raster;
    compositing is replayed renderer-style on a TYPE_INT_ARGB canvas
    (SrcOver draw, AlphaComposite.Clear for disposal 2), flattened via
    getRGB exactly as our black-for-transparent convention — every
    composited frame must match our decoder value-for-value."""
    from turbine_maintenance_etl_spark.llm.gif import decode_gif_frames, encode_gif

    jvm = spark._jvm
    rng = np.random.default_rng(7)
    pal = rng.integers(0, 256, (16, 3)).astype(np.uint8)
    h, w = 12, 14
    f1 = rng.integers(1, 16, (8, 10))
    f1[2:4, 3:6] = 0  # transparent holes
    f2 = rng.integers(1, 16, (5, 6))
    f2[0, :3] = 0
    f3 = rng.integers(1, 16, (4, 4))
    offsets = [(1, 1), (4, 3), (0, 0)]
    disposals = [2, 2, 0]
    data = encode_gif(
        [f1, f2, f3], pal, width=w, height=h,
        offsets=offsets, transparent=0, disposals=disposals,
    )
    p = str(tmp_path / "anim.gif")
    open(p, "wb").write(data)

    ImageIO = jvm.javax.imageio.ImageIO
    File = jvm.java.io.File
    BufferedImage = jvm.java.awt.image.BufferedImage
    AlphaComposite = jvm.java.awt.AlphaComposite
    reader = ImageIO.getImageReadersByFormatName("gif").next()
    reader.setInput(ImageIO.createImageInputStream(File(p)))
    assert reader.getNumImages(True) == 3
    canvas = BufferedImage(w, h, BufferedImage.TYPE_INT_ARGB)
    g = canvas.createGraphics()
    composited = []
    for i, ((left, top), disp, fr) in enumerate(zip(offsets, disposals, [f1, f2, f3])):
        g.drawImage(reader.read(i), left, top, None)
        arr = np.array(
            list(canvas.getRGB(0, 0, w, h, None, 0, w)), dtype=np.int64
        ).reshape(h, w)
        rgb = np.stack([(arr >> 16) & 0xFF, (arr >> 8) & 0xFF, arr & 0xFF], 2)
        composited.append(np.where((((arr >> 24) & 0xFF) == 255)[:, :, None], rgb, 0))
        if disp == 2:  # restore-to-transparent (transparency declared)
            g.setComposite(AlphaComposite.Clear)
            g.fillRect(left, top, fr.shape[1], fr.shape[0])
            g.setComposite(AlphaComposite.SrcOver)
    ours = decode_gif_frames(data)
    assert len(ours) == 3
    for i in range(3):
        assert np.array_equal(ours[i], composited[i]), f"frame {i}"
