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


@register("multimodal_features")
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode-and-featurize over the synthesized media corpus: byte
    stats + 8-bin histogram per item via Arrow-batched mapInPandas."""
    return extract_features(synthesize_media(spark, sf_dir))


@register("multimodal_frame_stats")
def multimodal_frame_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sample videos (1→n explode), then aggregate frames per
    video — the decode→explode→reduce shape of a video pipeline."""
    frames = sample_frames(synthesize_media(spark, sf_dir), every_k=2)
    return frames.groupBy("media_id").agg(
        F.count("*").alias("n_sampled"),
        F.sum(F.length("frame_payload")).alias("total_bytes"),
    )
