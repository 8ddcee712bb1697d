"""GIF decode (GIF87a/89a, the public GIF specification) — round 8,
session 3: the web-corpus staple joins PNG/JPEG in the multimodal
layer. Everything here is from the spec:

- variable-width LZW decompression (LSB-first codes, CLEAR/END
  specials, KwKwK self-reference, 12-bit cap with deferred-clear
  tolerance),
- global/local color tables, transparency from the 89a graphic
  control extension,
- interlaced images (the 8/8/4/2 four-pass row order),
- multi-frame animations composited over the logical screen honoring
  disposal methods 0/1 (leave), 2 (restore background) and 3
  (restore previous).

The fixture encoder writes single- or multi-frame GIFs (optional
interlace, transparency, per-frame disposal) so every decoder path
has an in-container producer; tests additionally differential against
the JVM's ``javax.imageio`` GIF codec through the live py4j gateway.
"""

from __future__ import annotations

import struct

import numpy as np

_SIG87 = b"GIF87a"
_SIG89 = b"GIF89a"


# ------------------------------------------------------------- LZW


def lzw_decode(data: bytes, mcs: int, expect: int | None = None) -> list[int]:
    """Decode an LZW stream with minimum code size ``mcs`` to index
    values. ``expect`` bounds the output (a frame's pixel count) so a
    malicious stream cannot balloon memory."""
    if not (2 <= mcs <= 8):
        raise ValueError(f"bad LZW minimum code size {mcs}")
    clear, end = 1 << mcs, (1 << mcs) + 1
    # rolling LSB-first accumulator (r11): the old whole-stream bigint
    # paid an O(stream) `big >> pos` PER CODE — quadratic in stream
    # length (measured ~75% of GIF decode); the accumulator holds < 20
    # bits and every code costs one mask + one shift
    n = len(data)
    acc = accbits = i = 0
    width = mcs + 1
    table: list[tuple[int, ...]] = []
    prev: tuple[int, ...] | None = None
    out: list[int] = []
    while True:
        while accbits < width and i < n:
            acc |= data[i] << accbits
            i += 1
            accbits += 8
        if accbits < width:
            raise ValueError("truncated LZW stream")
        code = acc & ((1 << width) - 1)
        acc >>= width
        accbits -= width
        if code == clear:
            table = []
            width = mcs + 1
            prev = None
            continue
        if code == end:
            break
        nxt = clear + 2 + len(table)
        if code < clear:
            entry = (code,)
        elif clear + 2 <= code < nxt:
            entry = table[code - clear - 2]
        elif code == nxt and prev is not None:
            entry = prev + prev[:1]
        else:
            raise ValueError(f"bad LZW code {code}")
        if prev is not None and nxt < 4096:
            table.append(prev + entry[:1])
        out.extend(entry)
        if expect is not None and len(out) > expect:
            raise ValueError("LZW output exceeds frame size")
        prev = entry
        if clear + 2 + len(table) == (1 << width) and width < 12:
            width += 1
    return out


def lzw_encode(indices, mcs: int) -> bytes:
    """The fixture LZW encoder (CLEAR-on-full policy)."""
    clear, end = 1 << mcs, (1 << mcs) + 1
    acc = 0
    nbits = 0
    out = bytearray()

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    width = mcs + 1
    dic: dict[tuple[int, int], int] = {}
    next_free = clear + 2
    emit(clear, width)
    w: int | None = None
    for k in indices:
        k = int(k)
        if w is None:
            w = k
            continue
        if (w, k) in dic:
            w = dic[(w, k)]
            continue
        emit(w, width)
        if next_free < 4096:
            dic[(w, k)] = next_free
            next_free += 1
            # the decoder's table trails ours by one entry (it appends
            # while READING the next code), hence the +1
            if next_free == (1 << width) + 1 and width < 12:
                width += 1
        else:
            emit(clear, width)
            dic = {}
            next_free = clear + 2
            width = mcs + 1
        w = k
    if w is not None:
        emit(w, width)
        if next_free < 4096 and next_free == (1 << width) and width < 12:
            width += 1  # decoder appends after reading the final code
    emit(end, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


# ------------------------------------------------------------ decode

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(rows: np.ndarray) -> np.ndarray:
    h = rows.shape[0]
    out = np.empty_like(rows)
    src = 0
    for y0, dy in _INTERLACE_PASSES:
        n = len(range(y0, h, dy))
        out[y0::dy] = rows[src : src + n]
        src += n
    return out


# Decode-side canvas bound: a GIF's logical screen is declared in the
# header, so an adversarial 4-byte field could demand a multi-GB canvas
# before any data-length check can object. 2^26 pixels (8192x8192, a
# ~200 MB RGB canvas plus compositing copies) is far beyond any real
# GIF while keeping per-task decode memory bounded at corpus scale.
MAX_CANVAS_PIXELS = 1 << 26

# Total RETAINED pixels across all composited frames of one decode
# (r10 review finding): frames are full canvas copies, so animation
# length multiplies the canvas cost. 2^28 pixels (~768 MB of RGB across
# all frames — e.g. 4 cap-sized frames, or thousands of ordinary ones)
# bounds per-task decode memory independent of how many 1-pixel frames
# a crafted stream packs into its sub-blocks.
MAX_TOTAL_PIXELS = 1 << 28


def decode_gif_frames(
    data: bytes, max_frames: int | None = None
) -> list[np.ndarray]:
    """Decode the first ``max_frames`` frames of a GIF (all when None),
    composited over the logical screen per the disposal methods, to
    (h, w, 3) uint8 RGB arrays.

    Retained-memory bound (r10 review finding): each decoded frame is a
    FULL canvas copy, so total retention is frames x canvas — a ~15 KB
    stream declaring a cap-sized screen with hundreds of 1x1 frames
    would retain ~100 GB even though every single canvas is inside
    MAX_CANVAS_PIXELS. Decodes whose cumulative retained pixels would
    exceed MAX_TOTAL_PIXELS raise ValueError; single-image consumers
    pass ``max_frames=1`` (decode_gif_pixels) and stop paying for
    animation length entirely."""
    if len(data) < 13 or data[:6] not in (_SIG87, _SIG89):
        raise ValueError("not a GIF byte stream")
    width, height = struct.unpack("<HH", data[6:10])
    packed, bg_idx, _aspect = data[10], data[11], data[12]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(data[pos : pos + 3 * n], dtype=np.uint8).reshape(n, 3)
        pos += 3 * n
    if width == 0 or height == 0:
        raise ValueError("zero-dimension GIF")
    if width * height > MAX_CANVAS_PIXELS:
        # the canvas is allocated from the 4 header bytes alone, BEFORE
        # any pixel data exists to justify it — without this cap a
        # ~200-byte stream declaring a 65535x65535 logical screen
        # allocates ~12 GB and spends ~a minute compositing per decode
        # task (found by the r10 corrupted-stream fuzz; an executor-OOM
        # DoS on untrusted corpora)
        raise ValueError(
            f"GIF logical screen {width}x{height} exceeds the "
            f"{MAX_CANVAS_PIXELS}-pixel decode cap"
        )

    # The logical screen starts TRANSPARENT in every modern renderer
    # (GIF89a's background color is a legacy field browsers ignore);
    # this decoder's flat-RGB contract represents transparent as black
    # — exactly javax.imageio's getRGB flattening, so the animated
    # differential in tests/test_gif_codec.py compares value-for-value.
    # The bg color is painted only by an explicit disposal-2 restore on
    # a frame WITHOUT a declared transparency index (the literal
    # "restore to background color" reading); with transparency active,
    # disposal 2 restores to transparent per common renderers and
    # javax.imageio (ADVICE r8).
    canvas = np.zeros((height, width, 3), dtype=np.uint8)
    bg_fill = (
        gct[bg_idx].copy()
        if gct is not None and bg_idx < gct.shape[0]
        else np.zeros(3, np.uint8)
    )
    frames: list[np.ndarray] = []
    transparent: int | None = None
    disposal = 0

    def read_subblocks(p: int) -> tuple[bytes, int]:
        chunks = []
        while True:
            if p >= len(data):
                raise ValueError("truncated GIF sub-blocks")
            sz = data[p]
            p += 1
            if sz == 0:
                return b"".join(chunks), p
            chunks.append(data[p : p + sz])
            if p + sz > len(data):
                raise ValueError("truncated GIF sub-blocks")
            p += sz

    while pos < len(data):
        b = data[pos]
        pos += 1
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension
            label = data[pos]
            pos += 1
            body, pos = read_subblocks(pos)
            if label == 0xF9 and len(body) >= 4:  # graphic control
                flags = body[0]
                disposal = (flags >> 2) & 0x07
                transparent = body[3] if flags & 0x01 else None
            continue
        if b != 0x2C:
            raise ValueError(f"unknown GIF block 0x{b:02X}")
        # image descriptor
        left, top, fw, fh = struct.unpack("<HHHH", data[pos : pos + 8])
        ipacked = data[pos + 8]
        pos += 9
        table = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            table = np.frombuffer(
                data[pos : pos + 3 * n], dtype=np.uint8
            ).reshape(n, 3)
            pos += 3 * n
        if table is None:
            raise ValueError("GIF frame without any color table")
        if left + fw > width or top + fh > height:
            raise ValueError("GIF frame exceeds the logical screen")
        mcs = data[pos]
        pos += 1
        lzw, pos = read_subblocks(pos)
        idx = np.array(
            lzw_decode(lzw, max(mcs, 2), expect=fw * fh), dtype=np.int64
        )
        if idx.size != fw * fh:
            raise ValueError("GIF frame pixel count mismatch")
        if int(idx.max(initial=0)) >= table.shape[0]:
            raise ValueError("GIF color index out of range")
        grid = idx.reshape(fh, fw)
        if ipacked & 0x40:
            grid = _deinterlace(grid)
        prev_region = canvas[top : top + fh, left : left + fw].copy()
        region = table[grid]
        if transparent is not None:
            keep = grid == transparent
            region = np.where(keep[:, :, None], prev_region, region)
        canvas[top : top + fh, left : left + fw] = region
        if (len(frames) + 1) * width * height > MAX_TOTAL_PIXELS:
            raise ValueError(
                f"GIF animation exceeds the {MAX_TOTAL_PIXELS}-pixel "
                f"retained-decode cap at frame {len(frames) + 1}"
            )
        frames.append(canvas.copy())
        if max_frames is not None and len(frames) >= max_frames:
            return frames
        if disposal == 2:  # restore bg (transparent when declared)
            canvas[top : top + fh, left : left + fw] = (
                0 if transparent is not None else bg_fill
            )
        elif disposal == 3:  # restore previous
            canvas[top : top + fh, left : left + fw] = prev_region
        transparent = None
        disposal = 0
    if not frames:
        raise ValueError("GIF contains no image data")
    return frames


def decode_gif_pixels(data: bytes) -> np.ndarray:
    """First composited frame as (h, w, 3) uint8 — the single-image
    contract the feature/phash pipeline consumes. Stops decoding after
    frame 1, so a crafted thousand-frame animation costs one frame."""
    return decode_gif_frames(data, max_frames=1)[0]


# ------------------------------------------------------------ encode


def encode_gif(
    frames: list[np.ndarray],
    palette: np.ndarray,
    width: int | None = None,
    height: int | None = None,
    offsets: list[tuple[int, int]] | None = None,
    interlace: bool = False,
    transparent: int | None = None,
    disposals: list[int] | None = None,
    bg_index: int = 0,
) -> bytes:
    """Fixture encoder: index-array frames + one global palette ->
    GIF89a bytes (multi-frame, optional interlace/transparency/
    per-frame disposal/offsets)."""
    palette = np.asarray(palette, dtype=np.uint8)
    n = palette.shape[0]
    if n < 2 or n > 256 or (n & (n - 1)):
        raise ValueError("palette size must be a power of two in 2..256")
    if width is None:
        height, width = frames[0].shape[:2]
    bits = max(1, (n - 1).bit_length())
    out = bytearray(_SIG89)
    out += struct.pack("<HH", width, height)
    out += bytes([0x80 | (bits - 1), bg_index, 0])
    out += palette.tobytes()
    for i, fr in enumerate(frames):
        fh, fw = fr.shape[:2]
        left, top = (offsets[i] if offsets else (0, 0))
        disposal = disposals[i] if disposals else 0
        if transparent is not None or disposal:
            flags = (disposal & 0x07) << 2
            tidx = 0
            if transparent is not None:
                flags |= 1
                tidx = transparent
            out += bytes([0x21, 0xF9, 4, flags, 0, 0, tidx, 0])
        out += bytes([0x2C]) + struct.pack("<HHHH", left, top, fw, fh)
        out += bytes([0x40 if interlace else 0x00])
        grid = np.asarray(fr, dtype=np.int64)
        if interlace:
            rows = [grid[y0::dy] for y0, dy in _INTERLACE_PASSES]
            grid = np.concatenate(rows, axis=0)
        mcs = max(2, bits)
        out += bytes([mcs])
        lzw = lzw_encode(grid.reshape(-1).tolist(), mcs)
        for j in range(0, len(lzw), 255):
            blk = lzw[j : j + 255]
            out += bytes([len(blk)]) + blk
        out += b"\x00"
    out += b"\x3B"
    return bytes(out)
