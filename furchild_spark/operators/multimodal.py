"""Multimodal (image/audio/video) column plumbing.

Design: media is an opaque ``binary`` payload column plus typed metadata
(modality, mime, byte length, checksum). All Spark-side plumbing — schema,
partition sizing, Arrow batch shape, ``mapInPandas`` signatures — is real
and tested; the actual decode (PIL/ffmpeg/torchaudio) is STUBBED because the
media libraries are not in this container:

- ``decode_stub=True``  → deterministic fake features derived from the bytes
  (length/checksum-based), so pipelines are end-to-end testable.
- ``decode_stub=False`` → raises NotImplementedError at the first batch,
  clearly marking where a real decoder plugs in.

Scale notes: payloads are large → keep them out of shuffles (derive features
map-side, drop the payload before any wide operation), and size partitions
by bytes not rows (``spark.sql.files.maxPartitionBytes``). ``mapInPandas``
streams Arrow batches, so executor memory is bounded by batch size, not
partition size.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "id long, modality string, byte_len long, checksum string, "
    "width int, height int, n_frames int"
)


def attach_payload(
    df: DataFrame, id_col: str, content_col: str, modality: str = "image"
) -> DataFrame:
    """Wrap a column as an opaque binary payload with typed metadata.
    (In production the payload arrives from parquet/tar shards already
    binary; encoding text here just feeds the same plumbing in tests.)"""
    payload = (
        F.col(content_col).cast("binary")
        if dict(df.dtypes)[content_col] != "binary"
        else F.col(content_col)
    )
    return df.select(
        F.col(id_col).alias("id"),
        F.lit(modality).alias("modality"),
        payload.alias("payload"),
        F.octet_length(payload).alias("byte_len"),
        F.md5(payload).alias("checksum"),
    )


def extract_features(df: DataFrame, decode_stub: bool = True) -> DataFrame:
    """Decode payloads into per-item features via Arrow-batched mapInPandas.

    The stub derives deterministic fake dimensions from byte_len (so tests
    and oracles can check the plumbing); a real decoder replaces the marked
    block only — schema and batching stay identical.
    """

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                # Real decode path: PIL.Image.open(io.BytesIO(b)) etc.
                raise NotImplementedError(
                    "media decoders (PIL/ffmpeg) are not available in this "
                    "environment; run with decode_stub=True"
                )
            n = pdf["byte_len"].astype("int64")
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "modality": pdf["modality"],
                    "byte_len": n,
                    "checksum": pdf["checksum"],
                    # deterministic fake decode: dims derived from byte_len
                    "width": (n % 640 + 1).astype("int32"),
                    "height": (n % 480 + 1).astype("int32"),
                    "n_frames": (n % 24 + 1).astype("int32"),
                }
            )

    return df.mapInPandas(decode_batches, schema=FEATURE_SCHEMA)


def frame_sample_plan(df: DataFrame, every_nth: int = 8) -> DataFrame:
    """Plumbing for video frame sampling: one output row per sampled frame
    index (posexplode over the frame count) — the downstream per-frame
    decode then runs on an already-exploded, repartitionable row set."""
    return (
        df.withColumn(
            "frame_idx",
            F.explode(
                F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_nth))
            ),
        )
        .select("id", "modality", "frame_idx", "byte_len", "checksum")
    )
