"""Full PNG decode (ISO/IEC 15948, the public PNG spec) — round 8,
session 3: every legal still-image PNG now decodes, closing the
remaining gaps of the round-6 subset (which handled 8-bit depth,
color types 0/2/4/6, non-interlaced only):

- bit depths 1/2/4/8/16 (sub-byte samples unpacked MSB-first per the
  spec; 16-bit scaled to the 8-bit pipeline contract by taking the
  high byte, the spec's own depth-rescaling shortcut),
- color type 3 (palette) with PLTE lookup and optional tRNS alpha
  (output RGBA when tRNS is present, RGB otherwise),
- ADAM7 interlacing (7 sub-images, each independently filtered,
  reassembled by the spec's origin/stride grid),
- all five scanline filters at every bits-per-pixel (the filter
  distance is bytes-per-pixel, min 1, per the spec).

tRNS on color types 0/2 (a single transparent sample value — a
display hint, not pixel data) is ignored; ancillary chunks (gAMA,
iCCP, ...) are skipped, as before.

Verification: round-trip tests against the in-repo fixture encoder
(``encode_png_extended``), plus a REAL cross-implementation
differential — the JVM's ``javax.imageio`` PNG codec (reached through
the live SparkSession's py4j gateway) both produces files we must
decode exactly (palette, 16-bit, Adam7-interlaced) and re-reads our
encoder's output (tests/test_png_full.py).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"

# samples per pixel by color type
_SPP = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
# legal bit depths by color type (spec table 11.1)
_LEGAL_DEPTHS = {
    0: (1, 2, 4, 8, 16),
    2: (8, 16),
    3: (1, 2, 4, 8),
    4: (8, 16),
    6: (8, 16),
}
# ADAM7 pass grid: (x0, y0, dx, dy) — the 8x8 tile
#   1 6 4 6 2 6 4 6
#   7 7 7 7 7 7 7 7
#   5 6 5 6 5 6 5 6
#   7 7 7 7 7 7 7 7
#   3 6 4 6 3 6 4 6   (rows repeat below)
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _unfilter(lines: np.ndarray, bpp: int) -> np.ndarray:
    """Reverse the five scanline filters; ``lines`` is (h, rowbytes+1)
    with the filter byte leading each row, ``bpp`` the filter distance
    in bytes (max(1, samples_per_pixel * depth // 8))."""
    h, rb1 = lines.shape
    rowbytes = rb1 - 1
    out = np.zeros((h, rowbytes), dtype=np.uint8)
    for y in range(h):
        f = int(lines[y, 0])
        line = lines[y, 1:].astype(np.int64)
        prior = out[y - 1].astype(np.int64) if y else np.zeros(rowbytes, np.int64)
        if f == 0:  # None
            rec = line
        elif f == 2:  # Up — vectorizable (no intra-row dependency)
            rec = (line + prior) & 0xFF
        else:  # Sub / Average / Paeth depend on the reconstructed left
            rec = np.zeros(rowbytes, dtype=np.int64)
            for x in range(rowbytes):
                a = rec[x - bpp] if x >= bpp else 0
                b = prior[x]
                c = prior[x - bpp] if x >= bpp else 0
                if f == 1:  # Sub
                    pred = a
                elif f == 3:  # Average
                    pred = (a + b) // 2
                elif f == 4:  # Paeth
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                else:
                    raise ValueError(f"bad PNG filter type {f}")
                rec[x] = (line[x] + pred) & 0xFF
        out[y] = rec.astype(np.uint8)
    return out


def _extract_samples(lines: np.ndarray, width: int, depth: int,
                     spp: int) -> np.ndarray:
    """Unfiltered scanline bytes (h, rowbytes) -> (h, width*spp) sample
    values (uint16 domain; 16-bit stays 16-bit here)."""
    h = lines.shape[0]
    n = width * spp
    if depth == 8:
        return lines[:, :n].astype(np.uint16)
    if depth == 16:
        v = lines[:, : n * 2]
        return (v[:, 0::2].astype(np.uint16) << 8) | v[:, 1::2]
    bits = np.unpackbits(lines, axis=1)
    b = bits[:, : n * depth].reshape(h, n, depth).astype(np.uint16)
    weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint16)
    return (b * weights).sum(axis=2, dtype=np.uint16)


# Decode-side pixel bound (r10 review; same class as the GIF canvas and
# JPEG frame caps): 2^26 pixels (8192x8192) bounds per-task decode
# memory on untrusted corpora.
MAX_IMAGE_PIXELS = 1 << 26


def decode_png_pixels(data: bytes) -> np.ndarray:
    """Decode any legal still-image PNG to (height, width, channels)
    uint8 (grey -> 1, grey+alpha -> 2, RGB/palette -> 3, RGBA or
    palette+tRNS -> 4). Stdlib zlib + numpy only."""
    if not data.startswith(PNG_SIG):
        raise ValueError("not a PNG byte stream")
    pos = 8
    width = height = depth = color = interlace = None
    plte: np.ndarray | None = None
    trns: bytes | None = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        chunk = data[pos + 8 : pos + 8 + length]
        if ctype == b"IHDR":
            width, height, depth, color, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", chunk
            )
            if color not in _SPP or depth not in _LEGAL_DEPTHS[color]:
                raise ValueError(f"illegal PNG depth={depth} color={color}")
            if interlace not in (0, 1):
                raise ValueError(f"illegal PNG interlace method {interlace}")
        elif ctype == b"PLTE":
            if length % 3:
                raise ValueError("PLTE length not a multiple of 3")
            plte = np.frombuffer(chunk, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"tRNS" and color == 3:
            trns = bytes(chunk)
        elif ctype == b"IDAT":
            idat += chunk
        elif ctype == b"IEND":
            break
        pos += 12 + length  # len + type + data + crc
    if width is None or not idat:
        raise ValueError("truncated PNG (missing IHDR/IDAT)")
    if width == 0 or height == 0:
        raise ValueError("zero-dimension PNG")
    if width * height > MAX_IMAGE_PIXELS:
        # the ADAM7 canvas (np.zeros below) and every scanline array
        # are sized from these 8 unverified header bytes — same
        # header-declared-allocation DoS class as the GIF/JPEG caps
        # (r10 review)
        raise ValueError(
            f"PNG {width}x{height} exceeds the "
            f"{MAX_IMAGE_PIXELS}-pixel decode cap"
        )
    spp = _SPP[color]
    bpp = max(1, spp * depth // 8)

    def pass_payload(pw: int, ph: int) -> int:
        return ph * ((pw * spp * depth + 7) // 8 + 1) if pw > 0 and ph > 0 else 0

    if interlace == 0:
        expected = pass_payload(width, height)
    else:
        expected = sum(
            pass_payload((width - x0 + dx - 1) // dx, (height - y0 + dy - 1) // dy)
            for x0, y0, dx, dy in _ADAM7
        )
    # bounded inflate (r10 review): zlib expands up to ~1000x, so a
    # 1 MB IDAT of zeros is a ~1 GB allocation if decompressed blindly.
    # The exact payload size is derivable from the header; ask for at
    # most expected+1 bytes — an oversized stream yields exactly one
    # extra byte and fails the same size-mismatch check as before,
    # without ever materializing the bomb.
    raw = np.frombuffer(
        zlib.decompressobj().decompress(bytes(idat), expected + 1),
        dtype=np.uint8,
    )

    def subimage(off: int, pw: int, ph: int) -> tuple[np.ndarray, int]:
        rowbytes = (pw * spp * depth + 7) // 8
        need = ph * (rowbytes + 1)
        if off + need > raw.size:
            raise ValueError("PNG scanline payload size mismatch")
        lines = raw[off : off + need].reshape(ph, rowbytes + 1)
        return _extract_samples(_unfilter(lines, bpp), pw, depth, spp), off + need

    if interlace == 0:
        samples, off = subimage(0, width, height)
        if off != raw.size:
            raise ValueError("PNG scanline payload size mismatch")
        img = samples.reshape(height, width, spp)
    else:
        img = np.zeros((height, width, spp), dtype=np.uint16)
        off = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (width - x0 + dx - 1) // dx
            ph = (height - y0 + dy - 1) // dy
            if pw == 0 or ph == 0:
                continue  # empty pass contributes no bytes at all
            sub, off = subimage(off, pw, ph)
            img[y0::dy, x0::dx] = sub.reshape(ph, pw, spp)
        if off != raw.size:
            raise ValueError("PNG scanline payload size mismatch")

    if color == 3:
        if plte is None:
            raise ValueError("palette PNG without PLTE chunk")
        idx = img[:, :, 0].astype(np.int64)
        if int(idx.max(initial=0)) >= plte.shape[0]:
            raise ValueError("palette index out of range")
        rgb = plte[idx]
        if trns is None:
            return rgb
        alpha = np.full(plte.shape[0], 255, dtype=np.uint8)
        alpha[: len(trns)] = np.frombuffer(trns, dtype=np.uint8)
        return np.concatenate([rgb, alpha[idx][:, :, None]], axis=2)
    if depth == 16:
        img = img >> 8  # spec depth rescaling: high byte
    elif depth < 8:
        img = img * 255 // ((1 << depth) - 1)
    return img.astype(np.uint8)


# ------------------------------------------------------------- encode


def _pack_rows(samples: np.ndarray, depth: int) -> np.ndarray:
    """(h, n_samples) values -> (h, rowbytes) scanline bytes."""
    h, n = samples.shape
    if depth == 8:
        return samples.astype(np.uint8)
    if depth == 16:
        out = np.zeros((h, n * 2), dtype=np.uint8)
        out[:, 0::2] = (samples >> 8).astype(np.uint8)
        out[:, 1::2] = (samples & 0xFF).astype(np.uint8)
        return out
    bits = ((samples[:, :, None].astype(np.int64)
             >> np.arange(depth - 1, -1, -1)) & 1).reshape(h, n * depth)
    return np.packbits(bits.astype(np.uint8), axis=1)


def encode_png_extended(
    samples: np.ndarray,
    depth: int = 8,
    color: int | None = None,
    palette: np.ndarray | None = None,
    trns: bytes | None = None,
    interlace: int = 0,
    compress_level: int = 6,
) -> bytes:
    """Fixture encoder for the full decoder surface: any legal
    depth/color combo, optional PLTE/tRNS, optional ADAM7 interlacing
    (filter 0 scanlines). ``samples`` is (h, w) for color types 0/3 or
    (h, w, spp) otherwise, with values already in the depth's range."""
    if samples.ndim == 2:
        samples = samples[:, :, None]
    h, w, spp = samples.shape
    if color is None:
        color = {1: 0, 2: 4, 3: 2, 4: 6}[spp]
    if color not in _SPP or _SPP[color] != spp:
        raise ValueError(f"color type {color} needs {_SPP.get(color)} samples, got {spp}")
    if depth not in _LEGAL_DEPTHS[color]:
        raise ValueError(f"illegal depth {depth} for color type {color}")
    if int(samples.max(initial=0)) >= (1 << depth):
        raise ValueError(f"sample values exceed depth {depth}")
    if color == 3 and palette is None:
        raise ValueError("palette color type needs a palette")

    def rows_for(sub: np.ndarray) -> bytes:
        ph, pw, _ = sub.shape
        packed = _pack_rows(sub.reshape(ph, pw * spp).astype(np.uint16), depth)
        return np.concatenate(
            [np.zeros((ph, 1), np.uint8), packed], axis=1
        ).tobytes()

    if interlace == 0:
        body = rows_for(samples)
    else:
        parts = []
        for x0, y0, dx, dy in _ADAM7:
            sub = samples[y0::dy, x0::dx]
            if sub.shape[0] and sub.shape[1]:
                parts.append(rows_for(sub))
        body = b"".join(parts)

    def chunk(ctype: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload)) + ctype + payload
            + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF)
        )

    out = bytearray(PNG_SIG)
    out += chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, depth, color, 0, 0,
                                      interlace))
    if palette is not None:
        out += chunk(b"PLTE", np.asarray(palette, dtype=np.uint8).tobytes())
    if trns is not None:
        out += chunk(b"tRNS", trns)
    out += chunk(b"IDAT", zlib.compress(body, compress_level))
    out += chunk(b"IEND", b"")
    return bytes(out)
