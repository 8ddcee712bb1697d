"""Full PNG coverage (llm/png.py) — round 8, session 3: bit depths
1-16, palette (+tRNS alpha), ADAM7 interlacing, every legal
depth/color combination.

Two verification layers:

1. Round-trip matrix against the in-repo fixture encoder
   (``encode_png_extended``): every legal (color, depth, interlace)
   combination across shapes that exercise partial ADAM7 passes.
2. Cross-implementation differential against the JVM's
   ``javax.imageio`` PNG codec, reached through the live SparkSession's
   py4j gateway: ImageIO produces REAL third-party files we must decode
   exactly (Adam7-interlaced RGB, palette, 16-bit grayscale), and
   re-reads our encoder's 16-bit output at full precision through its
   raster (bit-exact, stronger than getRGB's rounded 8-bit view)."""

from __future__ import annotations

import os

import numpy as np
import pytest

from turbine_maintenance_etl_spark.llm.multimodal import encode_png
from turbine_maintenance_etl_spark.llm.png import (
    decode_png_pixels,
    encode_png_extended,
)

_SPP = {0: 1, 2: 3, 4: 2, 6: 4}


def test_legacy_8bit_encoder_still_round_trips():
    rng = np.random.default_rng(1)
    for c in (1, 2, 3, 4):
        px = rng.integers(0, 256, (11, 17, c), dtype=np.uint8)
        assert np.array_equal(decode_png_pixels(encode_png(px)), px)


@pytest.mark.parametrize("interlace", [0, 1])
def test_round_trip_matrix_all_depths_and_colors(interlace):
    rng = np.random.default_rng(2 + interlace)
    for color, depths in {0: (1, 2, 4, 8, 16), 2: (8, 16),
                          4: (8, 16), 6: (8, 16)}.items():
        spp = _SPP[color]
        for depth in depths:
            # shapes chosen so several ADAM7 passes are partial/empty
            for shape in [(9, 13), (8, 8), (1, 1), (3, 20), (16, 2)]:
                s = rng.integers(0, 1 << depth, (*shape, spp)).astype(np.uint16)
                data = encode_png_extended(
                    s if spp > 1 else s[:, :, 0], depth, color,
                    interlace=interlace,
                )
                got = decode_png_pixels(data)
                if depth == 16:
                    exp = (s >> 8).astype(np.uint8)
                elif depth < 8:
                    exp = (s.astype(np.int64) * 255 // ((1 << depth) - 1)).astype(np.uint8)
                else:
                    exp = s.astype(np.uint8)
                assert got.shape == exp.shape
                assert np.array_equal(got, exp), (color, depth, interlace, shape)


@pytest.mark.parametrize("interlace", [0, 1])
def test_palette_with_and_without_trns(interlace):
    rng = np.random.default_rng(4 + interlace)
    for depth in (1, 2, 4, 8):
        n = 1 << depth
        plte = rng.integers(0, 256, (n, 3), dtype=np.uint8)
        idx = rng.integers(0, n, (10, 14)).astype(np.uint16)
        got = decode_png_pixels(
            encode_png_extended(idx, depth, 3, palette=plte, interlace=interlace)
        )
        assert np.array_equal(got, plte[idx.astype(int)])
        trns = bytes(rng.integers(0, 256, min(n, 4), dtype=np.uint8))
        got = decode_png_pixels(
            encode_png_extended(idx, depth, 3, palette=plte, trns=trns,
                                interlace=interlace)
        )
        assert got.shape[2] == 4
        alpha = np.full(n, 255, np.uint8)
        alpha[: len(trns)] = np.frombuffer(trns, np.uint8)
        assert np.array_equal(got[:, :, 3], alpha[idx.astype(int)])
        assert np.array_equal(got[:, :, :3], plte[idx.astype(int)])


def test_corrupt_png_rejected():
    rng = np.random.default_rng(6)
    s = rng.integers(0, 256, (8, 8), dtype=np.uint16)
    data = bytearray(encode_png_extended(s, 8, 0))
    data[8 + 8 + 8] = 3  # depth 3 is illegal for every color type
    with pytest.raises(ValueError, match="illegal PNG depth"):
        decode_png_pixels(bytes(data))
    data = bytearray(encode_png_extended(s, 8, 0))
    data[8 + 8 + 12] = 2  # interlace method 2 does not exist
    with pytest.raises(ValueError, match="interlace"):
        decode_png_pixels(bytes(data))
    # palette file with its PLTE stripped
    plte = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    full = encode_png_extended(s % 16, 4, 3, palette=plte)
    i = full.index(b"PLTE") - 4
    ln = int.from_bytes(full[i : i + 4], "big")
    stripped = full[:i] + full[i + 12 + ln :]
    with pytest.raises(ValueError, match="PLTE"):
        decode_png_pixels(stripped)


# ------------------------------------------- javax.imageio differential


def _jwrite(jvm, bi, path, progressive=False):
    it = jvm.javax.imageio.ImageIO.getImageWritersByFormatName("png")
    wr = it.next()
    param = wr.getDefaultWriteParam()
    if progressive:
        param.setProgressiveMode(jvm.javax.imageio.ImageWriteParam.MODE_DEFAULT)
    fos = jvm.java.io.FileOutputStream(path)
    ios = jvm.javax.imageio.ImageIO.createImageOutputStream(fos)
    wr.setOutput(ios)
    wr.write(None, jvm.javax.imageio.IIOImage(bi, None, None), param)
    ios.close()
    fos.close()


def _jread_rgb(jvm, path):
    img = jvm.javax.imageio.ImageIO.read(jvm.java.io.File(path))
    w, h = img.getWidth(), img.getHeight()
    arr = np.array(list(img.getRGB(0, 0, w, h, None, 0, w)),
                   dtype=np.int64).reshape(h, w)
    return np.stack(
        [(arr >> 16) & 0xFF, (arr >> 8) & 0xFF, arr & 0xFF, (arr >> 24) & 0xFF], 2
    )


def test_decodes_imageio_adam7_palette_and_16bit(spark, tmp_path):
    jvm = spark._jvm
    BufferedImage = jvm.java.awt.image.BufferedImage
    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, (21, 19, 3), dtype=np.uint8)

    # Adam7-interlaced RGB written by ImageIO
    bi = BufferedImage(19, 21, BufferedImage.TYPE_INT_RGB)
    for y in range(21):
        for x in range(19):
            bi.setRGB(x, y, int(px[y, x, 0]) << 16 | int(px[y, x, 1]) << 8
                      | int(px[y, x, 2]))
    p = str(tmp_path / "il.png")
    _jwrite(jvm, bi, p, progressive=True)
    data = open(p, "rb").read()
    assert data[8 + 8 + 12] == 1  # really interlaced
    assert np.array_equal(decode_png_pixels(data), px)

    # palette file written by ImageIO: we must agree with its read-back
    bi2 = BufferedImage(19, 21, BufferedImage.TYPE_BYTE_INDEXED)
    for y in range(21):
        for x in range(19):
            bi2.setRGB(x, y, int(px[y, x, 0]) << 16 | int(px[y, x, 1]) << 8
                       | int(px[y, x, 2]))
    p2 = str(tmp_path / "pal.png")
    jvm.javax.imageio.ImageIO.write(bi2, "png", jvm.java.io.File(p2))
    mine = decode_png_pixels(open(p2, "rb").read())
    assert mine.shape[2] in (3, 4)
    assert np.array_equal(mine[:, :, :3], _jread_rgb(jvm, p2)[:, :, :3])

    # 16-bit grayscale written by ImageIO: our 8-bit view is the high byte
    g16 = rng.integers(0, 65536, (15, 11), dtype=np.uint16)
    bi3 = BufferedImage(11, 15, BufferedImage.TYPE_USHORT_GRAY)
    ras = bi3.getRaster()
    for y in range(15):
        for x in range(11):
            ras.setSample(x, y, 0, int(g16[y, x]))
    p3 = str(tmp_path / "g16.png")
    jvm.javax.imageio.ImageIO.write(bi3, "png", jvm.java.io.File(p3))
    mine = decode_png_pixels(open(p3, "rb").read())
    assert np.array_equal(mine[:, :, 0], (g16 >> 8).astype(np.uint8))


def test_imageio_reads_our_files_back(spark, tmp_path):
    jvm = spark._jvm
    rng = np.random.default_rng(8)

    # interlaced 4-bit palette from our encoder
    plte = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    idx = rng.integers(0, 16, (9, 13)).astype(np.uint16)
    p = str(tmp_path / "pal.png")
    open(p, "wb").write(encode_png_extended(idx, 4, 3, palette=plte, interlace=1))
    assert np.array_equal(
        _jread_rgb(jvm, p)[:, :, :3], plte[idx.astype(int)]
    )

    # RGBA16 from our encoder: ImageIO's raster must recover all 16 bits
    rgba16 = rng.integers(0, 65536, (7, 9, 4)).astype(np.uint16)
    p2 = str(tmp_path / "rgba16.png")
    open(p2, "wb").write(encode_png_extended(rgba16, 16, 6))
    img = jvm.javax.imageio.ImageIO.read(jvm.java.io.File(p2))
    ras = img.getRaster()
    assert ras.getNumBands() == 4
    samp = np.array(
        [[[ras.getSample(x, y, b) for b in range(4)] for x in range(9)]
         for y in range(7)],
        dtype=np.int64,
    )
    assert np.array_equal(samp, rgba16.astype(np.int64))
