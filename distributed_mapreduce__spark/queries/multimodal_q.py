"""Multimodal registered queries (rows-only: binary payloads + Pandas
UDF decoding aren't SQL-expressible — the driver records the weaker
check; tests/test_multimodal.py carries the behavioral assertions)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.multimodal import (
    extract_features,
    sample_frames,
    synthesize_media,
)
from ..registry import register


@register("multimodal_pipeline")
def multimodal_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full multimodal shape in one result: decode-and-featurize
    (byte stats + 8-bin histogram per item via Arrow-batched
    mapInPandas) left-joined with the video frame-sampling branch
    (1→n explode, then aggregate frames back per video) — non-video
    media carry NULL frame stats. tests/test_multimodal.py holds the
    per-operator behavioral assertions."""
    media = synthesize_media(spark, sf_dir)
    feats = extract_features(media)
    frames = sample_frames(media, every_k=2)
    frame_stats = frames.groupBy("media_id").agg(
        F.count("*").alias("n_sampled"),
        F.sum(F.length("frame_payload")).alias("total_bytes"),
    )
    return feats.join(frame_stats, "media_id", "left")


def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode-and-featurize over the synthesized media corpus: byte
    stats + 8-bin histogram per item via Arrow-batched mapInPandas."""
    return extract_features(synthesize_media(spark, sf_dir))


def multimodal_frame_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sample videos (1→n explode), then aggregate frames per
    video — the decode→explode→reduce shape of a video pipeline."""
    frames = sample_frames(synthesize_media(spark, sf_dir), every_k=2)
    return frames.groupBy("media_id").agg(
        F.count("*").alias("n_sampled"),
        F.sum(F.length("frame_payload")).alias("total_bytes"),
    )
