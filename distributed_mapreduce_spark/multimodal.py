"""Multimodal column plumbing: image/audio/video as opaque `binary`
columns with typed metadata, processed by Arrow-batched Pandas UDFs.

The Spark-side plumbing (schema, partition shape, `mapInPandas` batch
signatures) is real and tested; the *codec* step is stubbed behind
import guards because media libraries (PIL/ffmpeg/librosa) are not in
this environment — a deployment swaps `_decode_stub` for a real decoder
without touching the distributed shape.

Scale notes: binary payloads ride the normal columnar path (parquet
binary + Arrow transfer); never collect them. Decode parallelism is
row-group parallelism — size `spark.sql.files.maxPartitionBytes` so a
task's batch of blobs fits executor memory.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Typed metadata carried next to every media blob.
MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType()),   # image/audio/video
        T.StructField("codec", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)

FEATURE_SCHEMA = "doc_id bigint, width int, height int, n_bytes bigint"
FRAME_SCHEMA = "doc_id bigint, frame_idx int, frame binary"


def attach_fake_media(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic fake media blobs for plumbing tests: 64 bytes
    derived from md5 of the id (JVM-side `unhex`, no Python)."""
    h = F.md5(F.col(id_col).cast("string"))
    blob = F.unhex(F.concat(h, F.reverse(h), h, F.reverse(h)))
    meta = F.struct(
        F.lit("image").alias("media_type"),
        F.lit("fake").alias("codec"),
        F.length(blob).cast("long").alias("n_bytes"),
    )
    return df.withColumn("media", blob).withColumn("media_meta", meta)


def _decode_stub(blob: bytes) -> tuple[int, int]:
    """Deterministic fake decode: (width, height) from the first two
    bytes. Swap for a real codec in deployment:

        try:
            from PIL import Image  # not available in this container
        except ImportError:
            raise NotImplementedError("image codec not installed")
    """
    if blob is None or len(blob) < 2:
        raise NotImplementedError("undecodable media payload (stub)")
    return (int(blob[0]) + 1, int(blob[1]) + 1)


def extract_image_features(df: DataFrame) -> DataFrame:
    """Decode dimensions per blob — `mapInPandas` so each Python call
    handles an Arrow batch of blobs, not one row."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dims = [_decode_stub(b) for b in pdf["media"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                    "n_bytes": [len(b) for b in pdf["media"]],
                }
            )

    return df.select("doc_id", "media").mapInPandas(run, schema=FEATURE_SCHEMA)


def sample_frames(df: DataFrame, every_n_bytes: int = 16) -> DataFrame:
    """Frame sampling stand-in: split each blob into fixed-size chunks
    as (doc_id, frame_idx, frame) rows — the row-explosion shape real
    video frame-sampling produces."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {"doc_id": [], "frame_idx": [], "frame": []}
            for doc_id, blob in zip(pdf["doc_id"], pdf["media"]):
                for i in range(0, len(blob), every_n_bytes):
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(i // every_n_bytes)
                    out["frame"].append(bytes(blob[i : i + every_n_bytes]))
            yield pd.DataFrame(out)

    return df.select("doc_id", "media").mapInPandas(run, schema=FRAME_SCHEMA)


RESAMPLE_SCHEMA = "doc_id bigint, resampled binary"


def resample_media(df: DataFrame, stride: int = 4) -> DataFrame:
    """Resize/downsample stand-in: keep every `stride`-th byte of each
    blob — the shape (per-blob transform, smaller payload out) of image
    resize / audio resample, as an Arrow-batched `mapInPandas`."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "resampled": [bytes(b[::stride]) for b in pdf["media"]],
                }
            )

    return df.select("doc_id", "media").mapInPandas(run, schema=RESAMPLE_SCHEMA)
