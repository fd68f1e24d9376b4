"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Pattern: media (image/audio/video) lives in a ``binary`` column with a
``media_type`` tag; decode / feature-extract / resize / frame-sample
run as Arrow-batched ``mapInPandas`` stages so the heavy per-item work
is vectorized per partition and the Spark-side contract (schema,
partitioning, batch shape) is engine-native.

The actual codec calls are STUBBED (`NotImplementedError` — this
container ships no image/audio libraries); ``extract_binary_metadata``
is the deterministic, fully-real part of the pipeline and is what the
oracle checks (byte length, crc32).
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

METADATA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("crc32", T.LongType()),
    ]
)


def to_binary_table(docs: DataFrame) -> DataFrame:
    """Model the documents table as a multimodal table: payload =
    utf-8 bytes of the text, tagged with a media type."""
    return docs.select(
        "doc_id",
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.lit("text/plain").alias("media_type"),
    )


def extract_binary_metadata(binary_df: DataFrame) -> DataFrame:
    """Arrow-batched metadata extraction over the binary payloads.

    ``mapInPandas`` receives pandas DataFrames per partition batch —
    the decode stage a real image pipeline would use, minus the codec.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "crc32": pdf["payload"]
                    .map(lambda b: zlib.crc32(b) & 0xFFFFFFFF)
                    .astype("int64"),
                }
            )

    return binary_df.mapInPandas(extract, METADATA_SCHEMA)


def decode_image(binary_df: DataFrame) -> DataFrame:
    """Image decode stage — STUB.

    The real implementation would ``mapInPandas`` over the payload
    column calling a codec (PIL/libvips/ffmpeg) per batch and emit
    (doc_id, height, width, channels, pixels binary). No codec library
    exists in this container, so the plumbing raises immediately
    rather than fabricating pixel data.
    """
    raise NotImplementedError(
        "image decode requires a codec library (PIL/libvips); "
        "the Spark-side plumbing is exercised via extract_binary_metadata"
    )


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_bytes", T.LongType()),
    ]
)


def sample_frames(
    binary_df: DataFrame, frame_size: int = 256, stride: int = 4
) -> DataFrame:
    """Frame-sampling plumbing for video-like payloads: treat the
    binary payload as fixed-size frames and keep every ``stride``-th
    one — the Spark-side shape (one-to-many Arrow-batched emission,
    partitioning preserved) of a real ffmpeg frame sampler, with the
    codec replaced by byte arithmetic (deterministic, oracle-checkable).
    """
    import math

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_ids, out_idx, out_len = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n = len(payload)
                total_frames = math.ceil(n / frame_size)
                for idx in range(0, total_frames, stride):
                    out_ids.append(doc_id)
                    out_idx.append(idx)
                    out_len.append(min(frame_size, n - idx * frame_size))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out_ids, dtype="int64"),
                    "frame_idx": pd.Series(out_idx, dtype="int32"),
                    "frame_bytes": pd.Series(out_len, dtype="int64"),
                }
            )

    return binary_df.mapInPandas(sample, FRAME_SCHEMA)
