"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real — schema, partition-preserving
mapInPandas with Arrow batches, deterministic feature vectors that feed
straight into the ANN/dedup operators. The codec layer is STUBBED: this
container has no image/audio libraries, so `decode_*` raise
NotImplementedError unless a deterministic fake is requested. Swapping
the fake for PIL/ffmpeg changes one function, not the pipeline.

Media schema:
    media(media_id LONG, kind STRING, payload BINARY,
          meta STRUCT<width INT, height INT, n_frames INT, sample_rate INT>)
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, "
    "meta struct<width:int, height:int, n_frames:int, sample_rate:int>"
)

FEATURE_DIM = 64


def synthetic_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derive a deterministic media table from the documents fixture:
    payload bytes = the doc text encoded (stands in for image bytes),
    kind round-robins image/audio/video, metadata is payload-derived."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.struct(
            (F.col("n_chars") % 640).cast("int").alias("width"),
            (F.col("n_chars") % 480).cast("int").alias("height"),
            (F.col("n_chars") % 30 + 1).cast("int").alias("n_frames"),
            F.lit(16000).alias("sample_rate"),
        ).alias("meta"),
    )


def _fake_decode(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic stand-in for a real decoder+encoder: bytes → a unit
    feature vector via a seeded-from-content RNG. STUB — replace with a
    real model embedding when codecs/weights are available."""
    seed = int.from_bytes(payload[:8].ljust(8, b"\0"), "little") ^ len(payload)
    rng = np.random.default_rng(seed)
    v = rng.standard_normal(dim)
    return v / max(np.linalg.norm(v), 1e-30)


def decode_image(payload: bytes):
    """Real image decode — NOT AVAILABLE in this container (no PIL/cv2).

    The pipeline-facing path is `extract_features(..., fake=True)`."""
    try:
        import PIL.Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "image codecs not installed in this environment; use the "
            "deterministic fake feature path (extract_features)"
        ) from e
    raise NotImplementedError("real decode path is intentionally stubbed")


def extract_features(media: DataFrame, batch_size_hint: int = 256) -> DataFrame:
    """media → (media_id, kind, feature ARRAY<DOUBLE>): the decode +
    feature-extract stage as partition-parallel mapInPandas.

    Arrow batches stream through the Python worker; nothing is collected.
    At 100 TB this is the canonical shape: repartition by size, decode
    per batch, emit fixed-dim features for the vector operators."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _fake_decode(bytes(p)).tolist() for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "feature": feats,
                }
            )

    return media.mapInPandas(run, "media_id long, kind string, feature array<double>")


def frame_sample(media: DataFrame, every_nth: int = 5) -> DataFrame:
    """Video frame sampling: one output row per sampled frame index —
    pure column ops (sequence + explode), no Python."""
    vids = media.where(F.col("kind") == "video")
    frames = F.sequence(
        F.lit(0), F.col("meta.n_frames") - 1, F.lit(every_nth)
    )
    return vids.select(
        "media_id",
        F.explode(frames).alias("frame_idx"),
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
    )


def resize_meta(media: DataFrame, max_side: int = 256) -> DataFrame:
    """Resize planning (aspect-preserving target dims) as column math;
    the pixel transform itself would live next to decode in the kernel."""
    w, h = F.col("meta.width"), F.col("meta.height")
    scale = F.least(
        F.lit(1.0),
        F.lit(max_side) / F.greatest(w.cast("double"), h.cast("double"), F.lit(1.0)),
    )
    return media.select(
        "media_id",
        "kind",
        w.alias("width"),
        h.alias("height"),
        F.round(w * scale).cast("int").alias("target_width"),
        F.round(h * scale).cast("int").alias("target_height"),
    )
