"""Multimodal column operators (SURVEY.md §2.11 L7).

Images/audio/video are opaque ``binary`` columns + typed metadata. The
Spark-side plumbing here is real and tested — schemas, partitioning, UDF
signatures, Arrow batch shapes — while the actual media decode is stubbed
behind deterministic fakes (the decode libraries are not in this
container; swap ``_decode_image_stub`` for PIL/torchvision in deployment).

Pattern: ``mapInPandas`` for decode/feature-extract (row-count-changing,
whole-batch numpy work), plain ``pandas_udf`` for per-row features.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("modality", T.StringType()),  # image | audio | video
        T.StructField("content", T.BinaryType()),
        T.StructField("length", T.LongType()),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("mean_intensity", T.DoubleType()),
    ]
)


def _decode_image_stub(content: bytes) -> np.ndarray:
    """Deterministic fake decoder: bytes → pseudo-image array.

    REAL IMPLEMENTATION REQUIRES PIL/opencv (not in this container):
    ``np.asarray(PIL.Image.open(io.BytesIO(content)))``. The fake derives
    shape and pixels from a hash of the bytes so tests are reproducible.
    """
    import zlib

    h = zlib.crc32(content) if content else 0  # crc32: process-stable, unlike hash()
    w, ht = 16 + h % 16, 16 + (h // 16) % 16
    rng = np.random.default_rng(h % (2**32))
    return rng.integers(0, 256, size=(ht, w, 3), dtype=np.uint8)


def image_features(df: DataFrame, content_col: str = "content", path_col: str = "path") -> DataFrame:
    """Decode + feature-extract via mapInPandas (Arrow-batched).

    Each batch decodes to numpy once and emits one feature row per input
    row. At scale: repartition upstream so batches are even; the binary
    column never shuffles after this projection (features are tiny).
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for path, content in zip(pdf[path_col], pdf[content_col]):
                arr = _decode_image_stub(bytes(content) if content is not None else b"")
                rows.append(
                    {
                        "path": path,
                        "width": int(arr.shape[1]),
                        "height": int(arr.shape[0]),
                        "n_channels": int(arr.shape[2]),
                        "mean_intensity": float(arr.mean()),
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in IMAGE_FEATURES_SCHEMA.fields])

    return df.select(path_col, content_col).mapInPandas(extract, IMAGE_FEATURES_SCHEMA)


def resize_images(df: DataFrame, target: tuple[int, int] = (8, 8)) -> DataFrame:
    """Resize stub: emits fixed-size thumbnails as binary.

    REAL IMPLEMENTATION: PIL ``Image.resize``. The stub center-crops the
    fake decode — the Spark contract (binary in, binary out, same rows)
    is what's under test.
    """
    th, tw = target

    def do_resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for path, content in zip(pdf["path"], pdf["content"]):
                arr = _decode_image_stub(bytes(content) if content is not None else b"")
                thumb = arr[:th, :tw, :]
                out.append({"path": path, "thumbnail": thumb.tobytes(), "thumb_h": th, "thumb_w": tw})
            yield pd.DataFrame(out, columns=["path", "thumbnail", "thumb_h", "thumb_w"])

    schema = T.StructType(
        [
            T.StructField("path", T.StringType()),
            T.StructField("thumbnail", T.BinaryType()),
            T.StructField("thumb_h", T.IntegerType()),
            T.StructField("thumb_w", T.IntegerType()),
        ]
    )
    return df.select("path", "content").mapInPandas(do_resize, schema)


def frame_sample_plan(df: DataFrame, every_n: int = 30) -> DataFrame:
    """Video frame-sampling plumbing: one row per sampled frame index.

    Decode is stubbed (length-derived frame count); the explode pattern —
    video row → N frame rows — is the real Spark shape that matters for
    partition sizing (a 2-hour video explodes to ~200 rows here, keep
    ``spark.sql.files.maxPartitionBytes`` small for binary-heavy scans).
    """
    n_frames = (F.coalesce(F.col("length"), F.lit(0)) / 1000 + 1).cast("int")
    return (
        df.withColumn("__n", F.least(n_frames, F.lit(100)))
        .select(
            "path",
            F.explode(F.sequence(F.lit(0), F.col("__n") * every_n, F.lit(every_n))).alias(
                "frame_index"
            ),
        )
    )


def audio_features_stub(df: DataFrame) -> DataFrame:
    """Audio feature plumbing (duration/rms from byte stats).

    REAL IMPLEMENTATION: librosa/torchaudio decode. Deterministic byte-level
    stats keep the UDF signature + schema real."""

    @F.pandas_udf(T.DoubleType())
    def fake_rms(content: pd.Series) -> pd.Series:
        return content.map(
            lambda b: float(np.frombuffer(bytes(b), dtype=np.uint8).astype(float).std())
            if b is not None and len(b) > 0
            else 0.0
        )

    return df.withColumn("rms_energy", fake_rms(F.col("content")))
