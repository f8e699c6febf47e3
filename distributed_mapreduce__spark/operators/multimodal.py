"""Multimodal column plumbing (north-star extension): images/audio/video
as opaque ``binary`` payloads + typed metadata, processed with
Arrow-batched ``mapInPandas`` operators.

The container has no image/audio codecs, so DECODING IS STUBBED: each
operator first tries the real library (PIL) and otherwise falls back to
``_fake_decode`` — a deterministic reshape of the payload bytes — or
raises ``NotImplementedError`` where faking would be misleading. The
Spark-side contract (schemas, batch iteration, partitioning, explode
shapes) is real and tested; swapping in a real codec changes only the
body of the decode function.

Scale: payloads stay opaque bytes end-to-end — Spark shuffles/scans never
interpret them, Arrow moves them zero-copy into pandas batches, and the
per-batch loop amortizes Python overhead. At 100 TB the media table is
stored as parquet with payloads in their own column (column pruning
skips them for metadata-only queries) and partitioned by ``kind``.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), False),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("sample_rate", T.IntegerType()),
                    T.StructField("n_frames", T.IntegerType()),
                    T.StructField("format", T.StringType()),
                ]
            ),
            False,
        ),
    ]
)

FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes int, mean_val double, std_val double, "
    "histogram array<double>, hist_counts array<long>"
)

FRAME_SCHEMA = "media_id long, frame_idx int, frame_payload binary"

RESIZE_SCHEMA = "media_id long, out_w int, out_h int, pixels binary"


def synthesize_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic fake media corpus derived from the documents fixture:
    payload bytes = repeated md5 of the text, sized by the (fake) meta.
    Exists so the multimodal plumbing is exercised against driver
    fixtures without binary test data."""
    from ..plans.partitioning import spread

    docs = spread(spark.read.parquet(f"{sf_dir}/documents.parquet"))

    def gen(batches):
        import pandas as pd

        # Iterate plain column arrays, not pdf.iterrows(): building a
        # pandas Series per row cost ~2-3 ms each — the dominant term of
        # every multimodal op at fixture scale (guide §4.2: keep the
        # per-row Python work to the minimum the logic needs).
        for pdf in batches:
            rows = []
            for did, text in zip(pdf["doc_id"].values, pdf["text"].values):
                did = int(did)
                kind = ("image", "audio", "video")[did % 3]
                w, h = 16 + did % 17, 16 + did % 13
                n_frames = 1 if kind != "video" else 4 + did % 5
                seed = hashlib.md5(str(text).encode()).digest()
                need = w * h * n_frames
                payload = (seed * (need // len(seed) + 1))[:need]
                rows.append(
                    {
                        "media_id": did,
                        "kind": kind,
                        "payload": payload,
                        "meta": {
                            "width": w,
                            "height": h,
                            "sample_rate": 16_000 if kind == "audio" else 0,
                            "n_frames": n_frames,
                            "format": "fake/raw",
                        },
                    }
                )
            yield pd.DataFrame(rows)

    return docs.mapInPandas(gen, schema=MEDIA_SCHEMA)


def _fake_decode(payload: bytes, width: int, height: int):
    """Deterministic stand-in for a codec: bytes → (h, w) uint8 grid.

    STUB — replace with PIL/ffmpeg decoding in a codec-enabled image.
    """
    import numpy as np

    need = width * height
    if need <= 0 or len(payload) == 0:
        # Degenerate media (zero-dim or empty payload): an all-zero grid
        # keeps downstream stats well-defined instead of a reshape error.
        return np.zeros((max(0, height), max(0, width)), dtype=np.uint8)
    buf = (payload * (need // len(payload) + 1))[:need]
    return np.frombuffer(bytes(buf), dtype=np.uint8).reshape(height, width)


def _try_real_decode(payload: bytes):
    """Attempt a real decode via PIL; None if the codec stack is absent."""
    try:
        import io

        from PIL import Image  # noqa: F401

        return Image.open(io.BytesIO(payload))
    except Exception:
        return None


def extract_features(media: DataFrame) -> DataFrame:
    """Per-item features (byte stats + 8-bin histogram) via mapInPandas.

    Batch contract: each Arrow batch is processed as one pandas frame;
    output rows align 1:1 with input rows.

    Numeric contract: ``mean_val``/``std_val`` are derived from EXACT
    integer sums with a pinned IEEE op order (``mean = s/n``;
    ``var = sq/n - mean*mean``; ``sqrt(max(var, 0))``) so a SQL oracle
    performing the same three float ops reproduces them bit-exactly —
    the same discipline the relational queries use for money math.
    ``hist_counts`` carries the raw integer bin counts (engine-portable
    scalars when CSV-joined); ``histogram`` is the normalized fraction
    view (each entry a single ``count/n`` division)."""

    def op(batches):
        import math

        import numpy as np
        import pandas as pd

        # Column-array iteration, not pdf.iterrows() — see
        # synthesize_media's gen for the measured why (guide §4.2).
        for pdf in batches:
            out = []
            for media_id, kind, payload, meta in zip(
                pdf["media_id"].values,
                pdf["kind"].values,
                pdf["payload"].values,
                pdf["meta"].values,
            ):
                grid = _fake_decode(
                    payload, int(meta["width"]), int(meta["height"])
                )
                vals = grid.astype(np.int64).ravel()
                n = int(vals.size)
                counts, _ = np.histogram(vals, bins=8, range=(0, 256))
                if n:
                    s = int(vals.sum())
                    sq = int((vals * vals).sum())
                    mean = s / n
                    std = math.sqrt(max(sq / n - mean * mean, 0.0))
                else:
                    mean = std = float("nan")
                out.append(
                    {
                        "media_id": media_id,
                        "kind": kind,
                        "n_bytes": len(payload),
                        "mean_val": mean,
                        "std_val": std,
                        "histogram": [c / n if n else 0.0 for c in counts.tolist()],
                        "hist_counts": counts.tolist(),
                    }
                )
            yield pd.DataFrame(out)

    return media.mapInPandas(op, schema=FEATURE_SCHEMA)


def resize_images(media: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbor resize of image payloads (fake-decoded grids).

    STUB decode; the resample index math and the binary-out plumbing are
    real. Non-images are filtered out (operator contract: kind='image')."""

    def op(batches):
        import numpy as np
        import pandas as pd

        # Column-array iteration, not pdf.iterrows() — see
        # synthesize_media's gen for the measured why (guide §4.2).
        for pdf in batches:
            out = []
            for media_id, kind, payload, meta in zip(
                pdf["media_id"].values,
                pdf["kind"].values,
                pdf["payload"].values,
                pdf["meta"].values,
            ):
                if kind != "image":
                    continue
                w, h = int(meta["width"]), int(meta["height"])
                grid = _fake_decode(payload, w, h)
                yi = (np.arange(out_h) * h // out_h).astype(int)
                xi = (np.arange(out_w) * w // out_w).astype(int)
                resized = grid[np.ix_(yi, xi)]
                out.append(
                    {
                        "media_id": media_id,
                        "out_w": out_w,
                        "out_h": out_h,
                        "pixels": resized.tobytes(),
                    }
                )
            yield pd.DataFrame(
                out, columns=["media_id", "out_w", "out_h", "pixels"]
            )

    return media.mapInPandas(op, schema=RESIZE_SCHEMA)


def sample_frames(media: DataFrame, every_k: int = 2) -> DataFrame:
    """Explode videos into every-k-th frame slices (1 row in → n rows
    out; the row-multiplying shape of a frame-sampling operator).

    Frame payload = the frame's byte slice of the opaque payload
    (real slicing math over the stubbed layout)."""

    def op(batches):
        import pandas as pd

        # Column-array iteration, not pdf.iterrows() — see
        # synthesize_media's gen for the measured why (guide §4.2).
        for pdf in batches:
            out = []
            for media_id, kind, payload, meta in zip(
                pdf["media_id"].values,
                pdf["kind"].values,
                pdf["payload"].values,
                pdf["meta"].values,
            ):
                if kind != "video":
                    continue
                w, h, n = int(meta["width"]), int(meta["height"]), int(meta["n_frames"])
                fsize = w * h
                for idx in range(0, n, every_k):
                    out.append(
                        {
                            "media_id": media_id,
                            "frame_idx": idx,
                            "frame_payload": bytes(
                                payload[idx * fsize : (idx + 1) * fsize]
                            ),
                        }
                    )
            yield pd.DataFrame(
                out, columns=["media_id", "frame_idx", "frame_payload"]
            )

    return media.mapInPandas(op, schema=FRAME_SCHEMA)


#: The deterministic fake codec family: byte-level, invertible, pure
#: numpy — enough to make decode→transform→re-encode a REAL tested path
#: (schema, meta rewrite, batch iteration). A real codec stack slots in
#: by extending these two tables with PIL/ffmpeg entries.
FAKE_FORMATS = ("fake/raw", "fake/rle", "fake/delta")

#: Real image formats the PIL-backed path supports when Pillow is
#: importable (it is NOT in this container — the soft import below
#: lights the path up in a richer image without code edits).
PIL_FORMATS = {
    "image/png": "PNG",
    "image/jpeg": "JPEG",
    "image/webp": "WEBP",
    "image/bmp": "BMP",
}


def _pil_image():
    """Soft import: Pillow's Image module, or None when the codec
    stack is absent (this container). Kept a function so tests can
    monkeypatch it and so the check happens at plan-build time, once,
    not per batch."""
    try:
        from PIL import Image  # noqa: PLC0415

        return Image
    except ImportError:
        return None


def _codec_decode(payload: bytes, fmt: str) -> bytes:
    """Fake-codec payload → raw bytes."""
    import numpy as np

    if fmt == "fake/raw":
        return bytes(payload)
    arr = np.frombuffer(bytes(payload), dtype=np.uint8)
    if fmt == "fake/rle":
        counts, vals = arr[0::2], arr[1::2]
        return np.repeat(vals, counts).tobytes()
    if fmt == "fake/delta":
        return (np.cumsum(arr.astype(np.uint64)) % 256).astype(np.uint8).tobytes()
    raise NotImplementedError(
        f"decoding {fmt!r} requires a codec stack (PIL/ffmpeg) absent "
        "from this image; extend _codec_decode with a real decoder"
    )


def _codec_encode(raw: bytes, fmt: str) -> bytes:
    """Raw bytes → fake-codec payload (exact inverse of decode)."""
    import numpy as np

    if fmt == "fake/raw":
        return bytes(raw)
    arr = np.frombuffer(bytes(raw), dtype=np.uint8)
    if fmt == "fake/rle":
        if arr.size == 0:
            return b""
        change = np.flatnonzero(np.diff(arr)) + 1
        starts = np.concatenate(([0], change))
        ends = np.concatenate((change, [arr.size]))
        out = bytearray()
        for s, e in zip(starts, ends):
            v, n = int(arr[s]), int(e - s)
            while n > 0:  # runs longer than 255 split into max-chunks
                c = min(n, 255)
                out += bytes((c, v))
                n -= c
        return bytes(out)
    if fmt == "fake/delta":
        if arr.size == 0:
            return b""
        deltas = np.diff(arr.astype(np.int16)) % 256
        return np.concatenate(([arr[0]], deltas)).astype(np.uint8).tobytes()
    raise NotImplementedError(
        f"encoding {fmt!r} requires a codec stack (PIL/ffmpeg) absent "
        "from this image; extend _codec_encode with a real encoder"
    )


def transcode(media: DataFrame, target_format: str) -> DataFrame:
    """Re-encode every payload into ``target_format`` (meta.format is
    rewritten; all other columns pass through).

    Supports the deterministic :data:`FAKE_FORMATS` end-to-end —
    decode with the row's current ``meta.format``, re-encode with the
    target — so the full decode→re-encode plumbing (struct rewrite,
    Arrow binary round-trip, per-batch loop) is real and tested. REAL
    formats go through Pillow when it is importable
    (:data:`PIL_FORMATS` — decode with ``Image.open``, re-encode with
    ``save``); without a codec stack (this container) they still raise
    ``NotImplementedError`` at plan-build time: faking them would ship
    garbage bytes downstream."""
    if target_format not in FAKE_FORMATS:
        if target_format in PIL_FORMATS and _pil_image() is not None:
            return _transcode_pil(media, target_format)
        raise NotImplementedError(
            f"transcode to {target_format!r} requires a codec stack "
            "(Pillow/ffmpeg) absent from this image; the deterministic "
            f"fake family {FAKE_FORMATS} is supported end-to-end, and "
            f"{sorted(PIL_FORMATS)} light up when Pillow is installed"
        )

    def op(batches):
        import pandas as pd

        # Column-array iteration, not pdf.iterrows() — see
        # synthesize_media's gen for the measured why (guide §4.2).
        for pdf in batches:
            out = []
            for media_id, kind, payload, meta in zip(
                pdf["media_id"].values,
                pdf["kind"].values,
                pdf["payload"].values,
                pdf["meta"].values,
            ):
                meta = dict(meta)
                raw = _codec_decode(payload, str(meta.get("format")))
                meta["format"] = target_format
                out.append(
                    {
                        "media_id": media_id,
                        "kind": kind,
                        "payload": _codec_encode(raw, target_format),
                        "meta": meta,
                    }
                )
            yield pd.DataFrame(
                out, columns=["media_id", "kind", "payload", "meta"]
            )

    return media.mapInPandas(op, schema=MEDIA_SCHEMA)


def _transcode_pil(media: DataFrame, target_format: str) -> DataFrame:
    """Pillow-backed real-image transcode (only reachable when
    :func:`_pil_image` resolves): ``Image.open`` sniffs the source
    container from the payload bytes itself, ``save`` re-encodes into
    ``target_format``. Same Arrow batch shape and output schema as the
    fake-codec path; meta.format is rewritten and width/height
    refreshed from the decoded image."""
    pil_fmt = PIL_FORMATS[target_format]

    def op(batches):
        import io

        import pandas as pd

        Image = _pil_image()
        # Column-array iteration, not pdf.iterrows() — see
        # synthesize_media's gen for the measured why (guide §4.2).
        for pdf in batches:
            out = []
            for media_id, kind, payload, meta in zip(
                pdf["media_id"].values,
                pdf["kind"].values,
                pdf["payload"].values,
                pdf["meta"].values,
            ):
                meta = dict(meta)
                img = Image.open(io.BytesIO(bytes(payload)))
                if pil_fmt == "JPEG" and img.mode not in ("RGB", "L"):
                    img = img.convert("RGB")
                buf = io.BytesIO()
                img.save(buf, format=pil_fmt)
                meta["format"] = target_format
                meta["width"] = img.width
                meta["height"] = img.height
                out.append(
                    {
                        "media_id": media_id,
                        "kind": kind,
                        "payload": buf.getvalue(),
                        "meta": meta,
                    }
                )
            yield pd.DataFrame(
                out, columns=["media_id", "kind", "payload", "meta"]
            )

    return media.mapInPandas(op, schema=MEDIA_SCHEMA)


PHASH_SCHEMA = "media_id long, phash long"


def _dhash_bits(grid, hash_size: int = 8) -> int:
    """dHash over a decoded grayscale grid: block-average down to
    (hash_size, hash_size+1) with EXACT integer block means
    (sum // count over near-equal row/col slices), then bit (i,j) = 1
    iff block[i][j] < block[i][j+1]; bits packed row-major, MSB first.
    Pure integer arithmetic end-to-end → bit-identical in any replay."""
    import numpy as np

    h, w = grid.shape
    rows, cols = hash_size, hash_size + 1
    if h == 0 or w == 0:
        return 0
    g = grid.astype(np.int64)
    row_edges = [(r * h) // rows for r in range(rows + 1)]
    col_edges = [(c * w) // cols for c in range(cols + 1)]
    ph = 0
    for i in range(rows):
        r0, r1 = row_edges[i], max(row_edges[i + 1], row_edges[i] + 1)
        for j in range(cols - 1):
            c0, c1 = col_edges[j], max(col_edges[j + 1], col_edges[j] + 1)
            c2, c3 = col_edges[j + 1], max(col_edges[j + 2], col_edges[j + 1] + 1)
            left = int(g[r0:r1, c0:c1].sum()) // ((r1 - r0) * (c1 - c0))
            right = int(g[r0:r1, c2:c3].sum()) // ((r1 - r0) * (c3 - c2))
            ph = (ph << 1) | (1 if left < right else 0)
    return ph - (1 << 64) if ph >= 1 << 63 else ph  # two's-complement long


def phash_media(
    media: DataFrame,
    hash_size: int = 8,
    kinds: tuple[str, ...] = ("image",),
) -> DataFrame:
    """Per-item 64-bit perceptual hash (dHash) → (media_id, phash).

    dHash (difference hash) fingerprints image CONTENT: decode to a
    grayscale grid, shrink to a 9×8 block-mean thumbnail, and keep only
    the sign of each horizontal gradient — so re-encodes, small crops,
    brightness shifts, and pixel noise move few bits, while different
    images differ in ~32. Pair with
    :func:`.dedup.hamming_near_pairs` (bits=64) for exact
    ≤-max_hamming near-duplicate detection without an all-pairs join —
    the image-side sibling of simhash-over-text.

    The decode is the honest fake-codec stub (``_fake_decode``, same
    as every operator here); the hash arithmetic downstream of the
    decoded grid is real, integer-exact, and replayed bit-for-bit by
    the pure-Python oracle in tests/test_phash.py. Scale: one Arrow
    map pass, 8 bytes out per item, zero shuffle.

    ``kinds`` gates which media rows are hashed (default: images only
    — dHash is image semantics; an audio payload would get a
    meaningless fingerprint and pollute the near-dup pairs). Rows with
    degenerate geometry (width·height ≤ 0) or an empty payload are
    dropped too: they would all hash to exactly 0 and form one giant
    identical-fingerprint bucket — precisely the band-join skew
    :func:`.dedup.hamming_near_pairs` warns about."""
    media = media.filter(
        F.col("kind").isin(list(kinds))
        & (F.col("meta.width") * F.col("meta.height") > 0)
        & (F.length(F.col("payload")) > 0)
    )

    def op(batches):
        import pandas as pd

        # Column-array iteration, not pdf.iterrows() — see
        # synthesize_media's gen for the measured why (guide §4.2).
        for pdf in batches:
            out = []
            for media_id, payload, meta in zip(
                pdf["media_id"].values,
                pdf["payload"].values,
                pdf["meta"].values,
            ):
                grid = _fake_decode(
                    payload, int(meta["width"]), int(meta["height"])
                )
                out.append(
                    {
                        "media_id": media_id,
                        "phash": _dhash_bits(grid, hash_size),
                    }
                )
            yield pd.DataFrame(out)

    return media.mapInPandas(op, schema=PHASH_SCHEMA)


def phash_near_dups(media: DataFrame, max_hamming: int = 6) -> DataFrame:
    """(id_a, id_b, hamming): media items whose perceptual hashes
    differ in ≤ max_hamming bits — exact banded Hamming join over the
    dHash fingerprints (see :func:`.dedup.hamming_near_pairs`)."""
    from .dedup import hamming_near_pairs

    return hamming_near_pairs(
        phash_media(media),
        id_col="media_id",
        hash_col="phash",
        bits=64,
        max_hamming=max_hamming,
    )
