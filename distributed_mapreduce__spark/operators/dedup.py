"""Deduplication operators (SURVEY.md §2.2 E1/E2 + north-star list).

Four tiers, all built from DataFrame ops (no Python in the hot path):

- exact            — hash-groupBy on (normalized) text.
- minhash + LSH    — word-3-gram shingles → 16 md5 minhashes → 8 bands
                     of 2 → band-bucket self-join → exact-Jaccard verify.
                     md5 is bit-identical in DuckDB, so the WHOLE LSH
                     pipeline (not just the final pairs) is oracle-checked.
- simhash          — 16-bit sign-of-sums fingerprint over token hashes.
- n-gram Jaccard   — exact pairwise similarity via shared-shingle join
                     (the small-scale baseline the LSH path approximates).

Scale (100 TB): exact dedup is one shuffle on the text hash (group on
md5(text), not the text itself, to keep shuffle rows small). MinHash
cost is rows × shingles × seeds before partial aggregation collapses to
(doc, seed); band join moves only (doc, band_key) pairs — candidates,
not the corpus, dominate the output. The exact-Jaccard join is the piece
that does NOT scale (shared-shingle fanout is quadratic in docs-per-
shingle) — at scale it runs only on LSH candidates, which is exactly how
``minhash_dedup_pairs`` composes it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_SEEDS = 16
BAND_ROWS = 2  # 8 bands of 2 → s-curve threshold ≈ (1/8)^(1/2) ≈ 0.35


def normalized_text(col: str = "text") -> F.Column:
    """lower + trim + collapse whitespace runs: the canonicalization used
    by normalized exact-dedup."""
    return F.regexp_replace(F.trim(F.lower(F.col(col))), r"\s+", " ")


def exact_dedup_groups(docs: DataFrame, text_expr: F.Column) -> DataFrame:
    """Group identical texts: (text_hash, canonical_id=min doc_id, n_copies).

    Grouping key is md5(text) so the shuffle carries 32-byte keys instead
    of documents (hash collisions are immaterial for md5 at any corpus
    size that fits in 2^64)."""
    return (
        docs.select(F.md5(text_expr).alias("text_hash"), "doc_id")
        .groupBy("text_hash")
        .agg(
            F.min("doc_id").alias("canonical_id"),
            F.count("*").alias("n_copies"),
        )
    )


def doc_shingles(docs: DataFrame, n: int = 3, distinct: bool = True) -> DataFrame:
    """Word n-gram shingles per document → (doc_id, shingle).

    ``distinct=True`` (set semantics) is required for Jaccard;
    minhash minima are identical with or without duplicates, so the
    signature path passes ``distinct=False`` and skips that shuffle.
    Documents with < n tokens yield no shingles (excluded from fuzzy
    dedup — they have no n-gram support)."""
    from ..plans.partitioning import spread

    docs = spread(docs)
    # Split a whitespace-collapsed text on a literal space: identical
    # token arrays in Spark and DuckDB (regex-split keeps/drops edge
    # empties differently across engines).
    toks = docs.select(
        "doc_id",
        F.split(F.regexp_replace(F.trim(F.col("text")), r"\s+", " "), " ").alias("toks"),
    )
    grams = ", ".join(f"toks[i+{j}]" for j in range(n))
    out = toks.filter(F.size("toks") >= n).select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(0, size(toks)-{n}), i -> concat_ws(' ', {grams}))"
            )
        ).alias("shingle"),
    )
    return out.distinct() if distinct else out


# Minhash universe: affine transforms of one 60-bit md5 value modulo a
# Mersenne prime (Carter-Wegman family) — ONE md5 per shingle, 16 cheap
# integer hashes derived from it, each minimized in the same single
# aggregation pass (16 min() columns — no seed explode, no extra rows).
MH_PRIME = 2_147_483_647


def shingle_hash() -> F.Column:
    """60-bit md5 fold of the ``shingle`` column, mod the Mersenne
    prime — the ONE string hash the whole minhash family derives from."""
    return (
        F.conv(F.substring(F.md5("shingle"), 1, 15), 16, 10).cast("long")
        % F.lit(MH_PRIME)
    )


def hashed_shingles(shingles: DataFrame, distinct: bool = True) -> DataFrame:
    """(doc_id, hm): shingles reduced to their 60-bit hash BEFORE any
    shuffle. Real-corpus shingles (13-gram production windows run
    80-130 bytes) dominate the dedup pipeline's shuffle volume; hashing
    first makes the distinct + verify-join exchanges carry 8-byte longs
    instead — a ~10x shuffle-size cut at scale with no semantic change
    (set equality over hm == set equality over shingles up to md5
    collision, immaterial below 2^30 distinct shingles per doc pair)."""
    out = shingles.select("doc_id", shingle_hash().alias("hm"))
    return out.distinct() if distinct else out


def minhash_signatures(shingles: DataFrame, n_seeds: int = N_SEEDS) -> DataFrame:
    """(doc_id, mh0..mh{n-1}): all minhashes in one aggregation pass.

    Accepts either raw (doc_id, shingle) or pre-hashed (doc_id, hm)
    input — the hashed form lets one projection feed signatures AND the
    verify join. Shuffle volume is one row per document (n_seeds longs
    wide) — independent of shingle count; partial aggregation does the
    mins map-side."""
    if "hm" in shingles.columns:
        hashed = shingles.select("doc_id", "hm")
    else:
        hashed = shingles.select("doc_id", shingle_hash().alias("hm"))
    # One F.expr per aggregate (a single SQL-parse py4j roundtrip each)
    # instead of the _seed_hash Column-tree build: the 16-column tree
    # cost ~155 ms of driver time per construction vs ~6 ms as strings
    # (guide §1 measurement, round 15) — same Remainder/Multiply/Add
    # expression either way, pinned identical by the oracle hash.
    return hashed.groupBy("doc_id").agg(
        *[
            F.expr(f"min((hm * {2 * s + 1}L + {s}L) % {MH_PRIME}L)").alias(f"mh{s}")
            for s in range(n_seeds)
        ]
    )


def lsh_bands(signatures: DataFrame, band_rows: int = BAND_ROWS) -> DataFrame:
    """(doc_id, band, band_key): md5 over each band's minhash columns,
    unpivoted to long form with stack() — pure projection, no shuffle."""
    n_seeds = sum(1 for f in signatures.schema.fields if f.name.startswith("mh"))
    n_bands = n_seeds // band_rows
    keys = [
        F.md5(
            F.concat_ws(
                ",", *[F.col(f"mh{b * band_rows + r}") for r in range(band_rows)]
            )
        ).alias(f"k{b}")
        for b in range(n_bands)
    ]
    wide = signatures.select("doc_id", *keys)
    stack_args = ", ".join(f"{b}, k{b}" for b in range(n_bands))
    return wide.selectExpr(
        "doc_id", f"stack({n_bands}, {stack_args}) as (band, band_key)"
    )


def lsh_candidate_pairs(bands: DataFrame) -> DataFrame:
    """Distinct (doc_a < doc_b) sharing ≥1 band bucket. The self-join is
    on (band, band_key) — only same-bucket rows meet, so output size
    tracks true-near-dup density, not corpus size²."""
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def exact_jaccard(
    shingles: DataFrame,
    pairs: DataFrame | None = None,
    key: str = "shingle",
    big_corpus: bool = False,
    sizes: DataFrame | None = None,
) -> DataFrame:
    """(doc_a, doc_b, jaccard) over distinct shingle sets.

    With ``pairs`` given, computes only those pairs (the scale path:
    verify LSH candidates). Without, all pairs sharing ≥1 shingle (the
    exact small-scale baseline). ``key`` names the set-element column —
    pass ``"hm"`` with :func:`hashed_shingles` input so the verify join
    shuffles 8-byte longs instead of shingle text (the scale form).
    jaccard = |∩| / (|A|+|B|-|∩|) — integer inputs, so the double is
    engine-identical.

    ``big_corpus`` switches the candidate-restricted path to broadcast
    discipline (the round-11 100x finding): the static planner sizes
    the EXPLODED shingle tables at their pre-explode parquet estimate
    — ~20x under — and happily broadcast-picks a corpus-scaled
    relation (measured: 500k docs → a >1 GB broadcast build that OOMs
    a 12 GB driver). Under discipline the candidate list is
    MATERIALIZED (localCheckpoint) and counted: a small candidate set
    broadcasts explicitly — the shuffle-free plan you want at any
    corpus size, since candidates track near-dup density, not corpus
    size — and a big one falls back to key-partitioned shuffle joins,
    with the shingle sides pinned out of broadcast consideration
    either way. The default (False) keeps the planner's small-scale
    plan, which measures ~25% faster at sf0.1; callers with a corpus
    size signal (a parquet scan estimate, a table profile) flip it —
    see queries/dedup_q.py and :func:`near_dup_pairs`.

    ``sizes`` (doc_id, n_sh) lets a caller that already aggregated the
    per-document set sizes pass them in — e.g. as one extra count in
    the minhash signature aggregation (:func:`lsh_verified_pairs`) —
    instead of this function re-evaluating the shingle subtree for a
    separate groupBy."""
    if sizes is None:
        sizes = shingles.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    if pairs is not None:
        # Candidate-restricted path: fan the pair list out to the two
        # shingle sets instead of materializing every shared-shingle
        # pair in the corpus — the all-pairs join is quadratic in
        # docs-per-shingle and is exactly what LSH exists to avoid.
        sa = shingles.select(F.col("doc_id").alias("doc_a"), key)
        sb = shingles.select(F.col("doc_id").alias("doc_b"), key)
        if big_corpus:
            pairs = pairs.localCheckpoint()
            small = pairs.count() * 32 < 64 * 1024 * 1024
            left = F.broadcast(pairs) if small else pairs
            fan_a = left.join(
                sa if small else sa.hint("shuffle_hash"), "doc_a"
            )
            inter = (
                fan_a.join(sb.hint("shuffle_hash"), ["doc_b", key])
                .groupBy("doc_a", "doc_b")
                .agg(F.count("*").alias("n_inter"))
            )
        else:
            inter = (
                pairs
                .join(sa, "doc_a")
                .join(sb, ["doc_b", key])
                .groupBy("doc_a", "doc_b")
                .agg(F.count("*").alias("n_inter"))
            )
    else:
        sa = shingles.alias("sa")
        sb = shingles.alias("sb")
        inter = (
            sa.join(
                sb,
                (F.col(f"sa.{key}") == F.col(f"sb.{key}"))
                & (F.col("sa.doc_id") < F.col("sb.doc_id")),
            )
            .select(F.col("sa.doc_id").alias("doc_a"), F.col("sb.doc_id").alias("doc_b"))
            .groupBy("doc_a", "doc_b")
            .agg(F.count("*").alias("n_inter"))
        )
    za = sizes.alias("za")
    zb = sizes.alias("zb")
    return (
        inter.join(za, F.col("doc_a") == F.col("za.doc_id"))
        .join(zb, F.col("doc_b") == F.col("zb.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            (
                F.col("n_inter")
                / (F.col("za.n_sh") + F.col("zb.n_sh") - F.col("n_inter"))
            ).alias("jaccard"),
        )
    )


def lsh_verified_pairs(
    docs: DataFrame,
    threshold: float,
    big_corpus: bool = False,
    n_seeds: int = N_SEEDS,
) -> DataFrame:
    """(doc_a, doc_b, jaccard ≥ threshold): the full MinHash→LSH→exact-
    Jaccard pipeline evaluated off ONE hashed-shingle set.

    The naive composition evaluates the shingle subtree (scan → token
    split → n-gram explode → md5) four times — signature aggregate,
    both verify-join sides, and the per-doc size groupBy (round-15
    stage metrics: 3-4 × ~20 s of executor time each at sf0.1, the
    query's dominant cost). Here the distinct hashed-shingle set is
    localCheckpoint'ed (computed once INSIDE the query, per run — an
    intermediate, not a cached result) and feeds everything; the
    per-doc set size rides the signature aggregation as one extra
    count(*) column instead of its own subtree evaluation. min() is
    duplicate-insensitive, so signatures over the distinct stream are
    identical to the non-distinct form — measured 1.82 s → 1.14 s at
    sf0.1 with bit-identical pairs.

    At 100 TB the same trade holds harder: the subtree re-evaluations
    it removes are full corpus re-reads + re-explosions, while the
    checkpoint stores only the 8-byte hashed shingle set (~10x smaller
    than the text, MEMORY_AND_DISK so it spills rather than OOMs); the
    checkpoint also truncates the exploded lineage, so the planner
    can't broadcast-pick a corpus-scaled relation off the pre-explode
    estimate (the round-11 failure ``big_corpus`` exists for).
    """
    hsd = hashed_shingles(
        doc_shingles(docs, distinct=False), distinct=False
    ).distinct().localCheckpoint(eager=False)
    sig = hsd.groupBy("doc_id").agg(
        *[
            F.expr(f"min((hm * {2 * s + 1}L + {s}L) % {MH_PRIME}L)").alias(f"mh{s}")
            for s in range(n_seeds)
        ],
        F.count("*").alias("n_sh"),
    )
    cands = lsh_candidate_pairs(lsh_bands(sig))
    scored = exact_jaccard(
        hsd,
        pairs=cands,
        key="hm",
        big_corpus=big_corpus,
        sizes=sig.select("doc_id", "n_sh"),
    )
    return scored.filter(F.col("jaccard") >= F.lit(threshold))


#: Routing threshold for :func:`near_dup_pairs`: documents above this
#: count route to LSH — the all-pairs shared-shingle join is quadratic
#: in docs-per-shingle and stops being an acceptable oracle baseline.
EXACT_PAIRS_MAX_DOCS = 20_000


def near_dup_pairs(
    docs: DataFrame,
    threshold: float = 0.7,
    strategy: str = "auto",
    doc_count: int | None = None,
) -> DataFrame:
    """(doc_a, doc_b, jaccard ≥ threshold): the near-dup front door —
    the engine picks the all-pairs exact baseline vs the MinHash+LSH
    candidate pipeline, so callers can't accidentally run the
    quadratic form on a corpus-scale input.

    ``strategy='auto'`` routes on document count (pass ``doc_count``
    from a persisted profile to skip the count job): ≤
    ``EXACT_PAIRS_MAX_DOCS`` → exact all-pairs; above → LSH banding for
    candidates + candidate-restricted EXACT Jaccard verification.
    Precision is identical on both branches (candidates are exact-
    verified, so LSH never returns a pair exact wouldn't); LSH can only
    MISS pairs that collide in no band (recall gated ≥0.8 by
    tests/test_similarity_quality.py's planted-pair discipline).
    """
    n = None
    if strategy == "auto":
        n = doc_count if doc_count is not None else docs.count()
        strategy = "exact" if n <= EXACT_PAIRS_MAX_DOCS else "lsh"
    if strategy == "exact":
        scored = exact_jaccard(doc_shingles(docs))
    elif strategy == "lsh":
        # Scale branch works on hashed shingles end-to-end
        # (hashed_shingles doc) through the one-evaluation pipeline
        # (lsh_verified_pairs doc). The verify join runs under
        # broadcast discipline once the corpus is clearly past
        # broadcast territory (see exact_jaccard's big_corpus doc —
        # the routing count we already have is the signal).
        big = (doc_count if doc_count is not None else n or 0) > 100_000
        return lsh_verified_pairs(docs, threshold, big_corpus=big)
    else:
        raise ValueError(
            f"unknown strategy {strategy!r}; expected auto/exact/lsh"
        )
    return scored.filter(F.col("jaccard") >= F.lit(threshold))


def ngram_contamination(
    train: DataFrame, eval_docs: DataFrame, n: int = 3
) -> DataFrame:
    """(train_doc, eval_doc, n_shared): training documents sharing ≥1
    word n-gram with an evaluation document — the decontamination scan
    run before pre-training (benchmark leakage detection).

    The eval set is benchmarks — thousands of rows against a 100 TB
    corpus — so its shingles broadcast; the train side streams through
    one equi-join on the shingle string, no shuffle of the corpus.
    Production uses n=13 (the conventional leakage window); the default
    n=3 suits the tiny fixture vocabulary where longer grams never
    collide. Follow with a threshold on ``n_shared`` or join back to
    doc length for an overlap ratio."""
    t = doc_shingles(train, n=n).select(
        F.col("doc_id").alias("train_doc"), "shingle"
    )
    e = doc_shingles(eval_docs, n=n).select(
        F.col("doc_id").alias("eval_doc"), "shingle"
    )
    return (
        t.join(F.broadcast(e), "shingle")
        .groupBy("train_doc", "eval_doc")
        .agg(F.count("*").alias("n_shared"))
    )


def simhash16(docs: DataFrame) -> DataFrame:
    """16-bit simhash over distinct tokens: bit j of the fingerprint is
    the sign of Σ_tokens (±1 by bit j of the token's 60-bit md5 hash).

    All-integer arithmetic → engine-identical. 16 bits keeps the
    bit-explode fanout (tokens × 16) modest; widen for production use."""
    from ..plans.partitioning import spread

    toks = (
        spread(docs)
        .select(
            "doc_id",
            F.explode(
                F.split(F.regexp_replace(F.trim(F.col("text")), r"\s+", " "), " ")
            ).alias("tok"),
        )
        .filter(F.col("tok") != "")
        .distinct()
        .select(
            "doc_id",
            F.conv(F.substring(F.md5("tok"), 1, 15), 16, 10).cast("long").alias("h"),
        )
    )
    bits = toks.select(
        "doc_id", "h", F.explode(F.expr("sequence(0, 15)")).alias("j")
    ).select(
        "doc_id",
        "j",
        F.when(F.expr("(h div cast(pow(2, j) as bigint)) % 2 = 1"), 1)
        .otherwise(-1)
        .alias("w"),
    )
    return (
        bits.groupBy("doc_id", "j")
        .agg(F.sum("w").alias("s"))
        .groupBy("doc_id")
        .agg(
            F.sum(
                F.when(F.col("s") > 0, F.expr("cast(pow(2, j) as bigint)")).otherwise(0)
            )
            .cast("long")
            .alias("simhash")
        )
    )


# --- incremental dedup (continuously-crawled corpora) ----------------------


def dedup_index(docs: DataFrame) -> DataFrame:
    """(doc_id, text_md5, mh0..mh15): the per-document dedup index row.

    The index a continuously-ingesting pipeline persists between
    batches: ONE row per historical document — an exact-dup key
    (md5 of normalized text) plus the 16-seed MinHash signature — so
    incremental dedup needs neither historical text nor historical
    shingle sets. Storage is O(corpus rows) × ~160 bytes: the 100 TB
    corpus carries a ~GB-scale index.

    Documents too short to shingle (<3 tokens) carry NULL signature
    columns — they still exact-dedup; the fuzzy path skips them."""
    sig = minhash_signatures(doc_shingles(docs, distinct=False))
    return docs.select(
        "doc_id", F.md5(normalized_text()).alias("text_md5")
    ).join(sig, "doc_id", "left")


def incremental_dedup(
    new_docs: DataFrame,
    index: DataFrame,
    est_threshold: float = 0.5,
    new_idx: "DataFrame | None" = None,
) -> tuple[DataFrame, DataFrame]:
    """Deduplicate a NEW batch against a historical :func:`dedup_index`.

    Returns ``(tagged, updated_index)``: ``tagged`` is ``new_docs`` +
    ``drop_reason`` ('dup_exact' — normalized text seen before;
    'dup_near' — estimated Jaccard vs some indexed doc ≥ threshold;
    NULL — keep), and ``updated_index`` appends the kept docs' index
    rows.

    Estimated Jaccard = fraction of agreeing minhash seeds (the
    unbiased MinHash estimator) — candidates come from an LSH band
    join against the index, so the signature comparison is candidate-
    restricted, never all-pairs. Intra-batch duplicates are out of
    scope by design: run the batch pipeline (``exact_dedup_groups`` /
    ``lsh_candidate_pairs``) on the batch first, then this against
    history.

    Scale shape: exact check is an equi-join on a 32-byte key;
    fuzzy check is band-bucket join + per-candidate 16-column compare;
    the corpus-sized text never joins anything.

    ``new_idx`` lets a caller that ALREADY computed the batch's
    :func:`dedup_index` (e.g. for intra-batch dedup) pass it in —
    minhashing is the batch's expensive pass (shingle explode × 32
    seeds) and must not run twice. Rows must correspond exactly to
    ``new_docs``."""
    if new_idx is None:
        new_idx = dedup_index(new_docs)

    exact_hits = (
        new_idx.join(
            index.select(F.col("text_md5").alias("_h")).distinct(),
            F.col("text_md5") == F.col("_h"),
            "left_semi",
        )
        .select("doc_id")
        .withColumn("_ex", F.lit(1))
    )

    sig_cols = [f"mh{s}" for s in range(N_SEEDS)]
    new_bands = lsh_bands(new_idx.filter(F.col("mh0").isNotNull()))
    old_bands = lsh_bands(
        index.filter(F.col("mh0").isNotNull())
    ).withColumnRenamed("doc_id", "old_id")
    cand = (
        new_bands.join(old_bands, ["band", "band_key"])
        .select("doc_id", "old_id")
        .distinct()
    )
    n_sig = new_idx.select("doc_id", *sig_cols)
    o_sig = index.select(
        F.col("doc_id").alias("old_id"),
        *[F.col(c).alias(f"o_{c}") for c in sig_cols],
    )
    est = (
        sum(
            (F.col(c) == F.col(f"o_{c}")).cast("int") for c in sig_cols
        )
        / F.lit(float(N_SEEDS))
    ).alias("est_jaccard")
    near_hits = (
        cand.join(n_sig, "doc_id")
        .join(o_sig, "old_id")
        .select("doc_id", est)
        .filter(F.col("est_jaccard") >= est_threshold)
        .select("doc_id")
        .distinct()
        .withColumn("_nr", F.lit(1))
    )

    tagged = (
        new_docs.join(exact_hits, "doc_id", "left")
        .join(near_hits, "doc_id", "left")
        .withColumn(
            "drop_reason",
            F.when(F.col("_ex").isNotNull(), "dup_exact").when(
                F.col("_nr").isNotNull(), "dup_near"
            ),
        )
        .drop("_ex", "_nr")
    )
    kept_idx = new_idx.join(
        tagged.filter(F.col("drop_reason").isNull()).select("doc_id"), "doc_id"
    )
    return tagged, index.unionByName(kept_idx)


def hamming_near_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    hash_col: str = "fp",
    bits: int = 64,
    max_hamming: int = 3,
) -> DataFrame:
    """(id_a, id_b, hamming): ALL pairs whose integer fingerprints
    differ in ≤ ``max_hamming`` of the low ``bits`` bits — EXACT, not
    approximate, via the pigeonhole band trick: split the fingerprint
    into ``max_hamming + 1`` disjoint bands; two hashes within the
    distance budget must agree exactly on at least one band (at most
    ``max_hamming`` bands can contain a differing bit), so the
    band-bucket equi-joins generate a candidate superset and the
    ``bit_count(xor)`` filter is the exact verify.

    Generic over any integer fingerprint: simhash (:func:`simhash16`,
    bits=16), image dHash (:func:`.multimodal.phash_media`, bits=64),
    audio chromaprints. The same candidate-restrict posture as the
    minhash band join — shuffle volume is (rows × bands) of
    (id, band_key) pairs, never all-pairs; a band whose key is shared
    by many rows (e.g. an all-zero band across blank images) is the
    skew to watch — AQE's skew-join split handles the verify join.
    """
    n_bands = max_hamming + 1
    if not 0 < n_bands <= bits:
        raise ValueError(f"need 0 <= max_hamming < bits, got {max_hamming}")
    h = F.col(hash_col)
    bands = []
    for b in range(n_bands):
        lo = b * bits // n_bands
        hi = (b + 1) * bits // n_bands
        if hi - lo == 64:
            # full-width band (max_hamming=0 at bits=64): the mask
            # literal (1<<64)-1 would overflow LongType — and no mask
            # is needed, the key is the fingerprint itself
            key = h
        else:
            mask = (1 << (hi - lo)) - 1
            # arithmetic >> then mask == logical shift for every band
            # incl. the sign-bit-bearing top band (the mask kills the
            # extension)
            key = F.shiftright(h, lo).bitwiseAND(F.lit(mask))
        bands.append(
            F.struct(F.lit(b).alias("band"), key.alias("band_key"))
        )
    keyed = df.select(
        F.col(id_col).alias("_id"),
        h.alias("_h"),
        F.explode(F.array(*bands)).alias("bk"),
    ).select("_id", "_h", "bk.band", "bk.band_key")
    a = keyed.select(
        "band", "band_key", F.col("_id").alias("id_a"), F.col("_h").alias("_ha")
    )
    b_ = keyed.select(
        "band", "band_key", F.col("_id").alias("id_b"), F.col("_h").alias("_hb")
    )
    return (
        a.join(b_, ["band", "band_key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.bit_count(F.col("_ha").bitwiseXOR(F.col("_hb"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= F.lit(max_hamming))
        .distinct()
    )
