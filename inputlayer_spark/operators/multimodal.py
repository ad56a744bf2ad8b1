"""Multimodal (image/audio/video) column plumbing.

Media are opaque `binary` columns with typed metadata structs. The
decode/extract kernels are Pandas-UDF `mapInPandas` stages so the heavy
work is Arrow-batched and partition-parallel; the actual codec calls are
STUBBED (image/audio libraries are not in this container) behind
deterministic fakes, clearly marked — the Spark-side plumbing (schemas,
batch iteration, partitioning) is real and tested.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("content", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("sample_rate", T.IntegerType()),
                    T.StructField("duration_ms", T.LongType()),
                    T.StructField("mime", T.StringType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("content_sha", T.StringType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def _fake_decode_features(content: bytes, dim: int = 8) -> list:
    """DETERMINISTIC FAKE of a decode+feature-extract kernel.

    A real deployment replaces this body with PIL/librosa/ffmpeg calls;
    the signature and batch shape are the contract. The fake derives a
    stable pseudo-feature from the content hash so tests are exact.
    """
    h = hashlib.sha256(content or b"").digest()
    return [round(b / 255.0, 6) for b in h[:dim]]


def extract_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """mapInPandas feature extraction over binary media columns.

    Arrow-batched: each partition streams pandas batches through the
    kernel; at 100 TB this is the canonical decode pattern (per-file
    parallelism, no driver involvement, codec libs loaded once per
    executor)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["content"].map(lambda b: len(b) if b is not None else 0),
                    "content_sha": pdf["content"].map(
                        lambda b: hashlib.sha256(b or b"").hexdigest()
                    ),
                    "feature": pdf["content"].map(lambda b: _fake_decode_features(b, dim)),
                }
            )
            yield out

    return media.mapInPandas(kernel, schema=FEATURE_SCHEMA)


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize stage — STUB: raises for non-fake use, but exercises
    the full Spark plumbing (filter to images, mapInPandas, schema
    preserved) with a deterministic passthrough so pipelines are testable.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # REAL IMPLEMENTATION: PIL.Image.open(io.BytesIO(b)).resize(...)
            # Container has no PIL → deterministic passthrough marks resize
            # by rewriting meta; content untouched.
            pdf = pdf.copy()
            pdf["meta"] = pdf["meta"].map(
                lambda m: {**(m or {}), "width": width, "height": height}
            )
            yield pdf

    return media.filter(F.col("kind") == "image").mapInPandas(kernel, schema=MEDIA_SCHEMA)


def sample_video_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame sampling — STUB kernel, real plumbing: one output row per
    sampled timestamp with the binary payload deferred to the decode
    stage (at scale you never materialize frames you don't keep)."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("frame_ts_ms", T.LongType()),
            T.StructField("content_sha", T.StringType()),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                dur = (r["meta"] or {}).get("duration_ms") or 0
                sha = hashlib.sha256(r["content"] or b"").hexdigest()
                for ts in range(0, int(dur), every_ms):
                    rows.append({"media_id": r["media_id"], "frame_ts_ms": ts, "content_sha": sha})
            yield pd.DataFrame(rows, columns=["media_id", "frame_ts_ms", "content_sha"])

    return media.filter(F.col("kind") == "video").mapInPandas(kernel, schema=out_schema)
