"""Multimodal plumbing tests: schema, batch shape, determinism, explode
counts (the decode itself is a documented stub — the Spark-side contract
is what's under test)."""

from __future__ import annotations

import pytest

from distributed_mapreduce__spark.operators.multimodal import (
    MEDIA_SCHEMA,
    extract_features,
    resize_images,
    sample_frames,
    synthesize_media,
    transcode,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def media(spark):
    df = synthesize_media(spark, SF)
    df.cache().count()
    return df


def test_media_schema_and_counts(spark, media):
    assert [f.name for f in media.schema.fields] == ["media_id", "kind", "payload", "meta"]
    assert media.schema["payload"].dataType.typeName() == "binary"
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert media.count() == n_docs
    kinds = {r["kind"] for r in media.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}


def test_features_align_one_to_one(media):
    feats = extract_features(media)
    assert feats.count() == media.count()
    row = feats.filter(feats.media_id == 0).collect()[0]
    assert len(row["histogram"]) == 8
    assert abs(sum(row["histogram"]) - 1.0) < 1e-9
    assert 0 <= row["mean_val"] <= 255


def test_features_deterministic(media):
    a = {r["media_id"]: r["mean_val"] for r in extract_features(media).collect()}
    b = {r["media_id"]: r["mean_val"] for r in extract_features(media).collect()}
    assert a == b


def test_resize_shape(media):
    out = resize_images(media, 8, 8)
    rows = out.collect()
    n_images = media.filter(media.kind == "image").count()
    assert len(rows) == n_images
    assert all(len(r["pixels"]) == 64 for r in rows)


def test_frame_sampling_explodes(spark, media):
    frames = sample_frames(media, every_k=2)
    from pyspark.sql import functions as F

    vids = media.filter(media.kind == "video").select(
        "media_id", F.col("meta.n_frames").alias("n"), F.col("meta.width").alias("w"),
        F.col("meta.height").alias("h")
    ).collect()
    expected = sum((v["n"] + 1) // 2 for v in vids)
    assert frames.count() == expected
    # frame slices carry exactly one frame of bytes
    sizes = {v["media_id"]: v["w"] * v["h"] for v in vids}
    for r in frames.limit(20).collect():
        assert len(r["frame_payload"]) == sizes[r["media_id"]]


def test_transcode_real_formats_are_explicit_stub(media, monkeypatch):
    """Without a codec stack, real formats raise at plan build — pinned
    by forcing the soft import to resolve to None, so this holds even
    in an image where Pillow IS installed."""
    from distributed_mapreduce__spark.operators import multimodal

    monkeypatch.setattr(multimodal, "_pil_image", lambda: None)
    with pytest.raises(NotImplementedError, match="Pillow"):
        transcode(media, "image/png")
    # audio/video have no PIL path regardless
    with pytest.raises(NotImplementedError):
        transcode(media, "audio/flac")


@pytest.mark.skipif(
    __import__("importlib").util.find_spec("PIL") is None,
    reason="Pillow not installed in this image — the PIL transcode "
    "path lights up (and this test runs) in a richer image",
)
def test_transcode_pil_roundtrip(spark):
    """With Pillow present, real-image transcode decodes with
    Image.open and re-encodes losslessly for PNG<->BMP."""
    from PIL import Image
    import io

    img = Image.new("RGB", (4, 3))
    img.putdata([(x, y, 7) for y in range(3) for x in range(4)])
    buf = io.BytesIO()
    img.save(buf, format="BMP")
    df = spark.createDataFrame(
        [(1, "image", bytearray(buf.getvalue()), (4, 3, None, None, "image/bmp"))],
        MEDIA_SCHEMA,
    )
    out = transcode(df, "image/png").collect()[0]
    assert out.meta.format == "image/png"
    assert (out.meta.width, out.meta.height) == (4, 3)
    back = Image.open(io.BytesIO(bytes(out.payload)))
    assert list(back.convert("RGB").getdata()) == list(img.getdata())


def test_transcode_fake_codecs_roundtrip(spark, media):
    """fake/raw → fake/rle → fake/delta → fake/raw must reproduce the
    original payload byte-for-byte (the codecs are invertible), with
    meta.format rewritten at each hop and every other column intact."""
    rle = transcode(media, "fake/rle")
    delta = transcode(rle, "fake/delta")
    back = transcode(delta, "fake/raw")

    orig = {r.media_id: bytes(r.payload) for r in media.collect()}
    got_rows = back.collect()
    assert {r.media_id: bytes(r.payload) for r in got_rows} == orig
    assert all(r.meta.format == "fake/raw" for r in got_rows)
    assert all(r.meta.format == "fake/rle" for r in rle.limit(5).collect())

    # rle actually compresses the repeated-md5 payloads' long runs?
    # No — md5 bytes rarely repeat; instead check rle on a constructed
    # constant payload: 600 equal bytes → 3 (count,value) pairs.
    from distributed_mapreduce__spark.operators.multimodal import (
        _codec_decode,
        _codec_encode,
    )

    blob = bytes([7]) * 600
    enc = _codec_encode(blob, "fake/rle")
    assert enc == bytes([255, 7, 255, 7, 90, 7])
    assert _codec_decode(enc, "fake/rle") == blob
    assert _codec_decode(_codec_encode(b"", "fake/delta"), "fake/delta") == b""


def test_fake_decode_degenerate_inputs():
    """Empty payloads and zero dimensions must yield a well-defined
    zero grid, not a reshape error."""
    from distributed_mapreduce__spark.operators.multimodal import _fake_decode

    assert _fake_decode(b"", 4, 3).shape == (3, 4)
    assert _fake_decode(b"", 4, 3).sum() == 0
    assert _fake_decode(b"xyz", 0, 5).size == 0
    assert _fake_decode(b"xyz", 5, 0).size == 0
    assert _fake_decode(b"xyz", 4, 3).shape == (3, 4)
