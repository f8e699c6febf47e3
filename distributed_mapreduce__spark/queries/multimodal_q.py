"""Multimodal registered queries.

``multimodal_pipeline`` is FULLY value-oracled despite the binary
payloads + Pandas-UDF decode: ``synthesize_media`` derives payload
bytes deterministically from ``md5(text)`` and ``_fake_decode`` reads
the first ``w*h`` bytes of that cycle, so the DuckDB oracle can
reconstruct the exact byte stream from the hex digest (16 byte values
from hex pairs, cycled ``need/16`` times + a remainder prefix) and
replay the pinned-op-order stats from ``extract_features``. Array
outputs are CSV-scalarized so the cross-engine canonicalizer sees only
hashable cells. tests/test_multimodal.py carries the per-operator
behavioral assertions."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.multimodal import (
    extract_features,
    sample_frames,
    synthesize_media,
)
from ..registry import register


@register(
    "multimodal_pipeline",
    oracle="""
    WITH base AS (
      SELECT doc_id AS media_id,
             CASE doc_id % 3 WHEN 0 THEN 'image'
                             WHEN 1 THEN 'audio'
                             ELSE 'video' END AS kind,
             CAST(16 + doc_id % 17 AS BIGINT) AS w,
             CAST(16 + doc_id % 13 AS BIGINT) AS h,
             CASE WHEN doc_id % 3 = 2 THEN 4 + doc_id % 5 ELSE 1 END AS n_frames,
             md5(text) AS hx
      FROM documents
    ),
    -- the 16 md5 digest bytes, as integers, from the hex pairs
    bytes AS (
      SELECT *,
             list_transform(generate_series(0, 15),
               j -> (strpos('0123456789abcdef', substring(hx, 2*j + 1, 1)) - 1) * 16
                  + (strpos('0123456789abcdef', substring(hx, 2*j + 2, 1)) - 1)) AS b,
             w * h AS need
      FROM base
    ),
    -- decode reads the first `need` bytes of the cycled digest:
    -- fc full 16-byte cycles + the first `rem` bytes once more
    stats AS (
      SELECT *,
             need // 16 AS fc,
             need % 16 AS rem,
             list_sum(b) AS s_all,
             list_sum(list_transform(b, x -> x * x)) AS sq_all,
             coalesce(list_sum(b[1:(need % 16)]), 0) AS s_rem,
             coalesce(list_sum(list_transform(b[1:(need % 16)], x -> x * x)), 0) AS sq_rem
      FROM bytes
    )
    SELECT media_id, kind,
           CAST(w * h * n_frames AS INTEGER) AS n_bytes,
           CAST(fc * s_all + s_rem AS DOUBLE) / need AS mean_val,
           sqrt(greatest(
             CAST(fc * sq_all + sq_rem AS DOUBLE) / need
               - (CAST(fc * s_all + s_rem AS DOUBLE) / need)
                 * (CAST(fc * s_all + s_rem AS DOUBLE) / need),
             CAST(0 AS DOUBLE))) AS std_val,
           array_to_string(list_transform(generate_series(0, 7),
             k -> CAST(fc * len(list_filter(b, x -> x // 32 = k))
                     + len(list_filter(b[1:rem], x -> x // 32 = k)) AS VARCHAR)),
             ',') AS hist_csv,
           CASE WHEN kind = 'video'
                THEN CAST((n_frames + 1) // 2 AS BIGINT) END AS n_sampled,
           CASE WHEN kind = 'video'
                THEN CAST(((n_frames + 1) // 2) * w * h AS BIGINT) END AS total_bytes
    FROM stats
    """,
)
def multimodal_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full multimodal shape in one result: decode-and-featurize
    (byte stats + 8-bin histogram per item via Arrow-batched
    mapInPandas) left-joined with the video frame-sampling branch
    (1→n explode, then aggregate frames back per video) — non-video
    media carry NULL frame stats. The histogram is emitted as a CSV of
    integer bin counts (engine-portable scalar); mean/std follow
    extract_features' pinned-op-order contract, which the DuckDB oracle
    replays from the md5 byte cycle. tests/test_multimodal.py holds the
    per-operator behavioral assertions.

    The synthesized media frame is localCheckpoint'ed (computed once
    per run, inside the query): both branches — features and frame
    sampling — consume it, and without the checkpoint each re-runs the
    whole synthesis mapInPandas over the corpus (guide §5: cut lineage
    when two consumers would recompute an expensive Python stage)."""
    media = synthesize_media(spark, sf_dir).localCheckpoint(eager=False)
    feats = extract_features(media)
    frames = sample_frames(media, every_k=2)
    frame_stats = frames.groupBy("media_id").agg(
        F.count("*").alias("n_sampled"),
        F.sum(F.length("frame_payload")).alias("total_bytes"),
    )
    return (
        feats.join(frame_stats, "media_id", "left")
        .select(
            "media_id",
            "kind",
            "n_bytes",
            "mean_val",
            "std_val",
            F.concat_ws(
                ",", F.transform("hist_counts", lambda c: c.cast("string"))
            ).alias("hist_csv"),
            "n_sampled",
            "total_bytes",
        )
    )


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
