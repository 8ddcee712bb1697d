"""Multimodal columns: image/audio/video as opaque binary + typed
metadata (BASELINE.json north star).

Design: media rides in a ``binary`` column next to typed metadata
(media_type, byte length, content hash). Decode / feature-extraction /
resize / frame-sampling run as Arrow-batched ``mapInPandas`` operators.
PNG decoding is REAL (pure stdlib zlib + numpy — 8-bit greyscale /
grey+alpha / RGB / RGBA, all five scanline filters, non-interlaced);
other codecs (JPEG/ffmpeg) are not in this container and raise, with a
deterministic fake available for plumbing tests. At 100 TB: binary
payloads stay columnar in parquet (no base64 inflation), metadata
predicates prune row groups before any decode, and
``spark.sql.files.maxPartitionBytes`` bounds per-task decode memory.
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODE_AVAILABLE = True  # PNG via stdlib zlib; JPEG/video codecs absent

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # color type -> samples/pixel


def decode_png_pixels(data: bytes) -> np.ndarray:
    """Pure-Python PNG decode to a (height, width, channels) uint8 array.

    Supports the formats a feature-extraction pipeline actually meets in
    bulk: 8-bit depth, color types 0/2/4/6 (no palette), non-interlaced,
    with full scanline unfiltering (None/Sub/Up/Average/Paeth). Built on
    stdlib ``zlib`` + numpy only — no PIL in this container."""
    if not data.startswith(_PNG_SIG):
        raise ValueError("not a PNG byte stream")
    pos = 8
    width = height = channels = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        chunk = data[pos + 8 : pos + 8 + length]
        if ctype == b"IHDR":
            width, height, depth, color, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", chunk
            )
            if depth != 8 or color not in _PNG_CHANNELS or interlace != 0:
                raise NotImplementedError(
                    f"PNG depth={depth} color={color} interlace={interlace} unsupported"
                )
            channels = _PNG_CHANNELS[color]
        elif ctype == b"IDAT":
            idat += chunk
        elif ctype == b"IEND":
            break
        pos += 12 + length  # len + type + data + crc
    if width is None or not idat:
        raise ValueError("truncated PNG (missing IHDR/IDAT)")
    stride = width * channels
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    if raw.size != height * (stride + 1):
        raise ValueError("PNG scanline payload size mismatch")
    raw = raw.reshape(height, stride + 1)
    out = np.zeros((height, stride), dtype=np.uint8)
    for y in range(height):
        f = int(raw[y, 0])
        line = raw[y, 1:].astype(np.int64)
        prior = out[y - 1].astype(np.int64) if y else np.zeros(stride, np.int64)
        if f == 0:  # None
            rec = line
        elif f == 2:  # Up — vectorizable (no intra-row dependency)
            rec = (line + prior) & 0xFF
        else:  # Sub / Average / Paeth depend on the reconstructed left pixel
            rec = np.zeros(stride, dtype=np.int64)
            for x in range(stride):
                a = rec[x - channels] if x >= channels else 0
                b = prior[x]
                c = prior[x - channels] if x >= channels else 0
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
    return out.reshape(height, width, channels)


def _decode_image(data: bytes) -> dict:
    """Real decoder path: PNG fully decoded to pixels (stdlib-only);
    other formats raise — JPEG/ffmpeg codecs are absent in-container."""
    if data.startswith(_PNG_SIG):
        px = decode_png_pixels(data)
        return {
            "width": int(px.shape[1]),
            "height": int(px.shape[0]),
            "channels": int(px.shape[2]),
            "n_bytes": len(data),
            "mean_intensity": round(float(px.mean()), 4),
        }
    raise NotImplementedError("only PNG decoding is available in this environment")


def _fake_decode(data: bytes) -> dict:
    """Deterministic stand-in for a decoder: derives pseudo
    width/height/channels from the byte content so the full Spark
    pipeline (schema, batching, partitioning) is exercised end-to-end."""
    n = len(data)
    h = int.from_bytes(data[:4].ljust(4, b"\0"), "big")
    return {
        "width": 64 + (h % 512),
        "height": 64 + ((h >> 9) % 512),
        "channels": 3,
        "n_bytes": n,
    }


def attach_binary_metadata(df: DataFrame, binary_col: str = "media") -> DataFrame:
    """Cheap metadata without decoding: byte length + sha2 content hash —
    pure JVM expressions, the exact-dedup key for media."""
    b = F.col(binary_col)
    return df.withColumn("media_bytes", F.octet_length(b)).withColumn(
        "media_sha256", F.sha2(b, 256)
    )


def extract_image_features(
    df: DataFrame,
    binary_col: str = "media",
    id_col: str = "doc_id",
    use_fake_decoder: bool = True,
) -> DataFrame:
    """Decode-and-extract as Arrow-batched mapInPandas: each batch is a
    pandas DataFrame of (id, bytes); output is typed metadata. The UDF
    boundary crosses once per batch (not per row); decode parallelism ==
    partition count."""
    decode = _fake_decode if use_fake_decoder else _decode_image
    schema = f"{id_col} bigint, width int, height int, channels int, n_bytes bigint"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for _, r in pdf.iterrows():
                meta = decode(bytes(r[binary_col]) if r[binary_col] is not None else b"")
                rows.append({id_col: r[id_col], **meta})
            yield pd.DataFrame(rows, columns=[id_col, "width", "height", "channels", "n_bytes"])

    return df.select(id_col, binary_col).mapInPandas(batches, schema=schema)


def sample_frames(
    df: DataFrame,
    every_nth: int = 10,
    frame_col: str = "frame_idx",
) -> DataFrame:
    """Frame-sampling for video tables keyed (video_id, frame_idx):
    keep every Nth frame — a pure filter, prunable at scan time."""
    return df.filter(F.col(frame_col) % every_nth == 0)
