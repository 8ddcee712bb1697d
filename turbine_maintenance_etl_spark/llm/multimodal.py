"""Multimodal columns: image/audio/video as opaque binary + typed
metadata (BASELINE.json north star).

Design: media rides in a ``binary`` column next to typed metadata
(media_type, byte length, content hash). Decode / feature-extraction /
resize / frame-sampling run as Arrow-batched ``mapInPandas`` operators —
the Spark-side plumbing (schema, batch shape, partitioning) is real and
tested; the actual codec calls are stubbed behind ``_decode_image``
because media libraries are not in this container. At 100 TB:
binary payloads stay columnar in parquet (no base64 inflation), metadata
predicates prune row groups before any decode, and
``spark.sql.files.maxPartitionBytes`` bounds per-task decode memory.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODE_AVAILABLE = False  # real codecs (PIL/ffmpeg) are not in this image


def _decode_image(data: bytes) -> dict:
    """STUB: real implementation would decode with PIL/libvips. Raises
    unless the deterministic fake is acceptable to the caller."""
    raise NotImplementedError("image codecs not available in this environment")


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
