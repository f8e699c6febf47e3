"""Dedup queries over ``documents`` (SURVEY.md §2.2 E1/E2).

The md5-based minhash/simhash operators are deliberately engine-portable,
so the oracles replicate the ENTIRE pipeline (shingling, signatures,
banding, candidate join, exact-Jaccard verify) — the strongest possible
correctness check for fuzzy dedup. The Spark-ML MinHashLSH variant (the
conventional scale path) registers rows-only: its hash family is
Spark-internal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import (
    doc_shingles,
    exact_dedup_groups,
    exact_jaccard,
    lsh_verified_pairs,
    normalized_text,
    simhash16,
)
from ..registry import register, register_local
from ..sources.tables import load_table

# Shared oracle fragments ---------------------------------------------------

# Whitespace-normalized token array (identical in both engines).
_TOKS = "string_split(regexp_replace(trim(text), '\\s+', ' ', 'g'), ' ')"

_SH_ONLY_CTE = f"""
    tarr AS (SELECT doc_id, {_TOKS} AS t FROM documents),
    tpos AS (SELECT doc_id, unnest(t) AS tok, generate_subscripts(t, 1) AS pos FROM tarr),
    sh AS (
      SELECT DISTINCT a.doc_id, a.tok || ' ' || b.tok || ' ' || c.tok AS shingle
      FROM tpos a
      JOIN tpos b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
      JOIN tpos c ON c.doc_id = a.doc_id AND c.pos = a.pos + 2
    )
"""

_SHINGLES_CTE = f"""
    {_SH_ONLY_CTE},
    szs AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
"""

_JACCARD = "CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter)"

# MinHash oracle pieces mirroring operators/dedup.py: one 60-bit md5 value
# per shingle (hex-digit fold), 16 affine seed-hashes minimized per doc,
# 8 band keys from adjacent minhash pairs.
_MH_SIG_COLS = ",\n             ".join(
    f"min((hm * {2 * s + 1} + {s}) % 2147483647) AS mh{s}" for s in range(16)
)
_MH_BANDS_UNION = "\n      UNION ALL ".join(
    f"SELECT doc_id, {b} AS band, md5(mh{2 * b} || ',' || mh{2 * b + 1}) AS band_key FROM sig"
    for b in range(8)
)

# Hashed-shingle set CTEs for the LSH scale path: the Spark side
# reduces shingles to their 60-bit hash BEFORE the distinct/verify
# shuffles (operators/dedup.py hashed_shingles), so the oracle's
# size/intersection tables are over DISTINCT (doc_id, hm) too —
# identical values up to md5 collision, which the fixture corpora
# cannot produce.
_HASHED_SET_CTE = """
    hsh AS (SELECT DISTINCT doc_id, hm FROM hmv),
    szs AS (SELECT doc_id, count(*) AS n_sh FROM hsh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
      FROM hsh a JOIN hsh b ON a.hm = b.hm AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
"""


@register(
    "dedup_exact",
    oracle="""
    SELECT 'raw' AS variant,
           md5(text) AS text_hash,
           min(doc_id) AS canonical_id,
           count(*) AS n_copies
    FROM documents
    GROUP BY 2
    UNION ALL
    SELECT 'normalized' AS variant,
           md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS text_hash,
           min(doc_id) AS canonical_id,
           count(*) AS n_copies
    FROM documents
    GROUP BY 2
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E1: exact dedup via hash-groupBy — shuffle carries md5 keys only —
    in two variants tagged in one result: byte-exact text, and
    case/whitespace-normalized text."""
    docs = load_table(spark, sf_dir, "documents")
    raw = exact_dedup_groups(docs, F.col("text")).select(
        F.lit("raw").alias("variant"), "text_hash", "canonical_id", "n_copies"
    )
    norm = exact_dedup_groups(docs, normalized_text("text")).select(
        F.lit("normalized").alias("variant"), "text_hash", "canonical_id", "n_copies"
    )
    return raw.unionByName(norm)


@register(
    "dedup_minhash_pairs",
    oracle=f"""
    WITH {_SH_ONLY_CTE},
    hmv AS (
      SELECT doc_id,
             list_reduce(list_transform(generate_series(1, 15),
                i -> CAST(strpos('0123456789abcdef', substring(md5(shingle), i, 1)) - 1
                          AS BIGINT)),
               (a, b) -> a * 16 + b) % 2147483647 AS hm
      FROM sh
    ),
    {_HASHED_SET_CTE},
    sig AS (
      SELECT doc_id,
             {_MH_SIG_COLS}
      FROM hmv GROUP BY doc_id
    ),
    bands AS (
      {_MH_BANDS_UNION}
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a
      JOIN bands b ON a.band = b.band AND a.band_key = b.band_key
                   AND a.doc_id < b.doc_id
    )
    SELECT c.doc_a, c.doc_b, {_JACCARD} AS jaccard
    FROM cand c
    JOIN inter i ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b
    JOIN szs sa ON sa.doc_id = c.doc_a
    JOIN szs sb ON sb.doc_id = c.doc_b
    WHERE {_JACCARD} >= 0.5
    """,
)
def dedup_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2 scale path: MinHash(16 seeds) → LSH(8 bands × 2) candidates →
    exact-Jaccard verification at 0.5. Oracle replays every stage,
    including the shingle→hash reduction.

    The whole pipeline — signature aggregate, distinct, verify join —
    runs on HASHED shingles (one 60-bit md5 fold per shingle, computed
    before any exchange): every shuffle carries 8-byte longs where the
    naive form ships shingle text (80-130 bytes at production 13-gram
    windows) — the dominant shuffle-volume term of fuzzy dedup at
    100 TB. Verification is exact Jaccard over the hashed sets
    (identical values up to md5 collision).

    Since round 15 the whole pipeline evaluates the hashed-shingle
    subtree ONCE (operators/dedup.lsh_verified_pairs: localCheckpoint'ed
    distinct set + the size count folded into the signature
    aggregation) — the naive composition re-ran the scan→explode→md5
    chain four times, the query's dominant cost (measured 1.82 s →
    1.14 s at sf0.1, bit-identical pairs; see lsh_verified_pairs' doc
    for the 100 TB posture)."""
    docs = load_table(spark, sf_dir, "documents")
    # broadcast discipline once the corpus text is clearly past
    # broadcast territory: the PRE-explode scan estimate is the one
    # size Catalyst gets right here (zero extra jobs), and without the
    # switch the planner broadcast-picks the exploded shingle table
    # from that same (20x-under) estimate — a >1 GB driver build at
    # the 100x step (SCALE.md round 11)
    # the probe reaches through py4j private plan APIs; on a Spark
    # build where the call chain or the scala BigInt conversion
    # changes, fall back to the SAFE answer (big=True: shuffle-hash
    # joins, exploded sides pinned out of broadcast) rather than
    # failing the query over a sizing heuristic
    try:
        big = int(str(
            docs._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        )) > 16 * 1024 * 1024
    except Exception:
        big = True
    return lsh_verified_pairs(docs, 0.5, big_corpus=big)


_NGRAM_JACCARD_ORACLE = f"""
    WITH {_SHINGLES_CTE}
    SELECT doc_a, doc_b, {_JACCARD} AS jaccard
    FROM inter
    JOIN szs sa ON sa.doc_id = doc_a
    JOIN szs sb ON sb.doc_id = doc_b
    WHERE {_JACCARD} >= 0.5
    """


@register_local("dedup_ngram_jaccard", oracle=_NGRAM_JACCARD_ORACLE)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2 exact baseline: all-pairs 3-gram Jaccard ≥ 0.5 via the
    shared-shingle join (quadratic in docs-per-shingle — small-scale
    ground truth for the LSH path's recall). Local tier since round 6:
    the driver slot went to :func:`neardup_front_door`, whose exact
    branch runs this very computation through the auto dispatch."""
    docs = load_table(spark, sf_dir, "documents")
    return exact_jaccard(doc_shingles(docs)).filter(F.col("jaccard") >= 0.5)


@register("neardup_front_door", oracle=_NGRAM_JACCARD_ORACLE)
def neardup_front_door(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE near-dup front door under the driver's value oracle
    (VERDICT r5 item 2): ``near_dup_pairs(strategy='auto')`` — the
    engine routes all-pairs exact vs MinHash-LSH+verify on document
    count. At the driver's sf0.01 (≤ 20k docs) auto picks the exact
    branch, so the result is bit-identical to the all-pairs oracle
    below; at the sf1 scale gate (50k docs) auto routes LSH, and
    strict_check --scale replays the routed branch's own complete
    oracle (the ``dedup_minhash_pairs`` SQL) instead — see
    scripts/strict_check.py:_scale_check_neardup_front_door. The LSH
    branch's dispatch-fidelity tests live in
    tests/test_incremental_dedup.py. The
    document count comes from a profile sidecar when
    $SPARK_GRAFT_PROFILE_DIR provides one (zero estimation jobs in
    the bench path), else one count job."""
    from ..operators.dedup import near_dup_pairs
    from ..operators.profile import table_hints

    docs = load_table(spark, sf_dir, "documents")
    hints = table_hints(spark, "documents")
    return near_dup_pairs(
        docs,
        threshold=0.5,
        strategy="auto",
        doc_count=hints["n_rows"] if hints else None,
    )


@register_local(
    "dedup_simhash",
    oracle=f"""
    WITH toks AS (
      SELECT DISTINCT doc_id, unnest({_TOKS}) AS tok FROM documents
    ),
    th AS (SELECT doc_id, md5(tok) AS hx FROM toks WHERE tok <> ''),
    bits AS (
      SELECT doc_id, j,
             CASE WHEN ((strpos('0123456789abcdef', substring(hx, 15 - j // 4, 1)) - 1)
                        // CAST(pow(2, j % 4) AS BIGINT)) % 2 = 1
                  THEN 1 ELSE -1 END AS w
      FROM th CROSS JOIN unnest(generate_series(0, 15)) AS t(j)
    ),
    sums AS (SELECT doc_id, j, sum(w) AS s FROM bits GROUP BY 1, 2)
    SELECT doc_id,
           CAST(sum(CASE WHEN s > 0 THEN CAST(pow(2, j) AS BIGINT) ELSE 0 END) AS BIGINT)
             AS simhash
    FROM sums GROUP BY doc_id
    """,
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2/fingerprint: 16-bit simhash per document. The oracle extracts
    the same bits straight from the md5 hex digits (bit j of the 60-bit
    prefix = bit j%4 of hex digit 15 - j/4)."""
    docs = load_table(spark, sf_dir, "documents")
    return simhash16(docs)


def dedup_minhash_ml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2 via pyspark.ml MinHashLSH (the stock scale path):
    shingles → HashingTF vectors → approxSimilarityJoin at distance 0.5.

    Not registered with the driver: its hash family is Spark-internal
    (no cross-engine oracle exists), so a registry row would only ever
    be a rows-only check. tests/test_queries_oracle.py instead pins its
    pair set against the oracle-checked portable-md5 variant above —
    a stronger gate than the driver could run."""
    from pyspark.ml.feature import HashingTF, MinHashLSH

    docs = load_table(spark, sf_dir, "documents")
    sets = doc_shingles(docs).groupBy("doc_id").agg(
        F.collect_set("shingle").alias("shingles")
    )
    tf = HashingTF(inputCol="shingles", outputCol="features", numFeatures=1 << 18)
    feats = tf.transform(sets)
    lsh = MinHashLSH(inputCol="features", outputCol="hashes", numHashTables=8, seed=42)
    model = lsh.fit(feats)
    pairs = model.approxSimilarityJoin(feats, feats, 0.5, distCol="jaccard_dist")
    return (
        pairs.filter(F.col("datasetA.doc_id") < F.col("datasetB.doc_id"))
        .select(
            F.col("datasetA.doc_id").alias("doc_a"),
            F.col("datasetB.doc_id").alias("doc_b"),
            F.col("jaccard_dist"),
        )
    )


_SUBSTRING_SPANS_ORACLE = """
WITH t AS (
  SELECT doc_id, regexp_extract_all(text, '\\S+') AS toks FROM documents
),
grams AS (
  SELECT t.doc_id, i.i - 1 AS pos,
         md5(array_to_string(list_slice(t.toks, i.i, i.i + 7), ' ')) AS gram
  FROM t, LATERAL (SELECT unnest(generate_series(1, len(t.toks) - 7)) AS i) i
),
dup AS (SELECT gram FROM grams GROUP BY gram HAVING count(*) >= 2),
pos AS (SELECT g.doc_id, g.pos FROM grams g JOIN dup USING (gram)),
isl AS (
  SELECT doc_id, pos,
         CASE WHEN max(pos + 8) OVER (PARTITION BY doc_id ORDER BY pos
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
              OR pos > max(pos + 8) OVER (PARTITION BY doc_id ORDER BY pos
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
         THEN 1 ELSE 0 END AS new_island
  FROM pos
),
num AS (
  SELECT doc_id, pos,
         sum(new_island) OVER (PARTITION BY doc_id ORDER BY pos
             ROWS UNBOUNDED PRECEDING) AS island
  FROM isl
),
ext AS (
  SELECT doc_id, min(pos) AS span_start, max(pos) + 8 AS span_end
  FROM num GROUP BY doc_id, island
)
SELECT e.doc_id,
       CAST(e.span_start AS INT) AS span_start,
       CAST(e.span_end AS INT) AS span_end,
       array_to_string(list_slice(t.toks, e.span_start + 1, e.span_end), ' ')
         AS span_text
FROM ext e JOIN t USING (doc_id)
"""


@register("substring_spans", oracle=_SUBSTRING_SPANS_ORACLE)
def substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactSubstr boilerplate mining (Lee et al., arXiv 2107.06499):
    maximal token spans covered by duplicated 8-grams, per document.
    Local tier: the full pipeline (including keep-one stripping) is
    oracle-replayed end-to-end in tests/test_substring_dedup.py."""
    from ..operators.substring_dedup import repeated_spans

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return repeated_spans(docs, k=8).select(
        "doc_id",
        F.col("span_start").cast("int").alias("span_start"),
        F.col("span_end").cast("int").alias("span_end"),
        "span_text",
    )


_DECONTAM_BLOOM_ORACLE = f"""
    WITH {_SH_ONLY_CTE}
    SELECT t.doc_id AS train_doc, e.doc_id AS eval_doc,
           count(*) AS n_shared
    FROM sh t
    JOIN (SELECT * FROM sh WHERE doc_id % 10 = 0) e
      ON t.shingle = e.shingle
    GROUP BY 1, 2
"""


@register("decontamination_bloom", oracle=_DECONTAM_BLOOM_ORACLE)
def decontamination_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-pruned benchmark decontamination
    (operators/bloom.decontaminate_bloom): eval-set shingles → 1%-fpp
    Bloom bitset → map-only corpus probe → exact verify join on the
    survivors. Output is bit-identical to the plain
    ngram_contamination scan (Bloom never drops a true member; false
    positives die in the verify join), which is exactly what the
    all-SQL oracle computes. Local tier: the driver's 50 slots are
    spoken for; the operator's full gate set (fpp bound, sql/arrow
    parity, DuckDB bit-arithmetic replay, map-only plan) lives in
    tests/test_bloom.py."""
    from ..operators.bloom import decontaminate_bloom

    docs = load_table(spark, sf_dir, "documents")
    eval_docs = docs.filter(F.col("doc_id") % 10 == 0)
    return decontaminate_bloom(docs, eval_docs, n=3, fpp=0.01)


# Round 11 (VERDICT r10 #2): the exactly-once incremental dedup pipe
# under the value oracle. The oracle replays the pipe's EXACT decision
# procedure — per-batch intra dedup (min-id exact survivor, then
# banded est-Jaccard >= 0.5 drops the larger id), then a history check
# of batch 2's survivors against batch 1's kept index (exact md5 join
# + banded candidates) — so it is bit-faithful to the two-tick drain,
# not a single-batch approximation.

_AGREE_AB = " + ".join(
    f"CASE WHEN sa.mh{s} = sb.mh{s} THEN 1 ELSE 0 END" for s in range(16)
)

_PIPE_ORACLE = f"""
    WITH {_SH_ONLY_CTE},
    hmv AS (
      SELECT doc_id,
             list_reduce(list_transform(generate_series(1, 15),
                i -> CAST(strpos('0123456789abcdef', substring(md5(shingle), i, 1)) - 1
                          AS BIGINT)),
               (a, b) -> a * 16 + b) % 2147483647 AS hm
      FROM sh
    ),
    sig AS (SELECT doc_id, {_MH_SIG_COLS} FROM hmv GROUP BY doc_id),
    bands AS (
      {_MH_BANDS_UNION}
    ),
    mid AS (SELECT CAST(floor(max(doc_id) / 2) AS BIGINT) AS m FROM documents),
    nrm AS (
      SELECT doc_id,
             md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS h
      FROM documents
    ),
    b1ex AS (
      SELECT min(n.doc_id) AS doc_id FROM nrm n, mid
      WHERE n.doc_id <= mid.m GROUP BY n.h
    ),
    b1near AS (
      SELECT DISTINCT gb.doc_id
      FROM bands ga
      JOIN bands gb ON ga.band = gb.band AND ga.band_key = gb.band_key
                    AND ga.doc_id < gb.doc_id
      JOIN b1ex ea ON ea.doc_id = ga.doc_id
      JOIN b1ex eb ON eb.doc_id = gb.doc_id
      JOIN sig sa ON sa.doc_id = ga.doc_id
      JOIN sig sb ON sb.doc_id = gb.doc_id
      WHERE ({_AGREE_AB}) >= 8
    ),
    keep1 AS (
      SELECT doc_id FROM b1ex
      WHERE doc_id NOT IN (SELECT doc_id FROM b1near)
    ),
    b2ex AS (
      SELECT min(n.doc_id) AS doc_id FROM nrm n, mid
      WHERE n.doc_id > mid.m GROUP BY n.h
    ),
    b2near AS (
      SELECT DISTINCT gb.doc_id
      FROM bands ga
      JOIN bands gb ON ga.band = gb.band AND ga.band_key = gb.band_key
                    AND ga.doc_id < gb.doc_id
      JOIN b2ex ea ON ea.doc_id = ga.doc_id
      JOIN b2ex eb ON eb.doc_id = gb.doc_id
      JOIN sig sa ON sa.doc_id = ga.doc_id
      JOIN sig sb ON sb.doc_id = gb.doc_id
      WHERE ({_AGREE_AB}) >= 8
    ),
    clean2 AS (
      SELECT doc_id FROM b2ex
      WHERE doc_id NOT IN (SELECT doc_id FROM b2near)
    ),
    hist_ex AS (
      SELECT DISTINCT c.doc_id
      FROM clean2 c JOIN nrm n ON n.doc_id = c.doc_id
      WHERE n.h IN (SELECT n2.h FROM keep1 k JOIN nrm n2 ON n2.doc_id = k.doc_id)
    ),
    hist_near AS (
      SELECT DISTINCT gn.doc_id
      FROM bands gn
      JOIN bands go ON gn.band = go.band AND gn.band_key = go.band_key
      JOIN clean2 cn ON cn.doc_id = gn.doc_id
      JOIN keep1 ko ON ko.doc_id = go.doc_id
      JOIN sig sa ON sa.doc_id = gn.doc_id
      JOIN sig sb ON sb.doc_id = go.doc_id
      WHERE ({_AGREE_AB}) >= 8
    ),
    keep2 AS (
      SELECT doc_id FROM clean2
      WHERE doc_id NOT IN (SELECT doc_id FROM hist_ex)
        AND doc_id NOT IN (SELECT doc_id FROM hist_near)
    ),
    surv AS (SELECT doc_id FROM keep1 UNION ALL SELECT doc_id FROM keep2)
    SELECT lang,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM documents JOIN surv USING (doc_id)
    GROUP BY lang
    """


@register("dedup_pipe_agg", oracle=_PIPE_ORACLE)
def dedup_pipe_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The exactly-once incremental corpus dedup pipe under the value
    oracle (streaming/dedup.dedup_pipe_available_now, VERDICT r10 #2;
    promoted to the driver tier by the round-12 rotation — it is the
    capstone composition of the storage + dedup families):
    ACID-ingest documents as two id-ordered txlog commits, drain them
    through the change-feed pipe across two ticks (intra-batch dedup +
    history check against the persisted signature index, survivors and
    index appended under per-source-version txn ids), then aggregate
    the CLEAN table. The DuckDB oracle replays the full two-tick
    decision procedure — minhash signatures, banding, est-Jaccard
    thresholding, exact-key history joins — so equality proves the
    pipe's survivor set bit-exactly, not just its size."""
    import tempfile

    from ..sources.txlog import tx_read, tx_write
    from ..streaming.dedup import dedup_pipe_available_now

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "n_chars"
    )
    mid = docs.agg(
        F.floor(F.max("doc_id") / 2).cast("long")
    ).first()[0]
    d = tempfile.mkdtemp(prefix="dedup_pipe_q_")
    src, dst = f"{d}/src", f"{d}/dst"
    tx_write(docs.filter(F.col("doc_id") <= mid), src)
    dedup_pipe_available_now(
        spark, src, dst, checkpoint=f"{d}/ckpt", index=f"{d}/idx"
    )
    tx_write(docs.filter(F.col("doc_id") > mid), src)
    dedup_pipe_available_now(
        spark, src, dst, checkpoint=f"{d}/ckpt", index=f"{d}/idx"
    )
    return (
        tx_read(spark, dst)
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
    )


_TX_NEARDUP_ORACLE = f"""
    WITH {_SH_ONLY_CTE},
    hmv AS (
      SELECT doc_id,
             list_reduce(list_transform(generate_series(1, 15),
                i -> CAST(strpos('0123456789abcdef', substring(md5(shingle), i, 1)) - 1
                          AS BIGINT)),
               (a, b) -> a * 16 + b) % 2147483647 AS hm
      FROM sh
    ),
    sig AS (SELECT doc_id, {_MH_SIG_COLS} FROM hmv GROUP BY doc_id),
    bands AS (
      {_MH_BANDS_UNION}
    ),
    nrm AS (
      SELECT doc_id,
             md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS h
      FROM documents
    ),
    ex AS (
      SELECT min(n.doc_id) AS doc_id FROM nrm n GROUP BY n.h
    ),
    near AS (
      SELECT DISTINCT gb.doc_id
      FROM bands ga
      JOIN bands gb ON ga.band = gb.band AND ga.band_key = gb.band_key
                    AND ga.doc_id < gb.doc_id
      JOIN ex ea ON ea.doc_id = ga.doc_id
      JOIN ex eb ON eb.doc_id = gb.doc_id
      JOIN sig sa ON sa.doc_id = ga.doc_id
      JOIN sig sb ON sb.doc_id = gb.doc_id
      WHERE ({_AGREE_AB}) >= 8
    ),
    keep AS (
      SELECT doc_id FROM ex
      WHERE doc_id NOT IN (SELECT doc_id FROM near)
    )
    SELECT lang,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM documents JOIN keep USING (doc_id)
    GROUP BY lang
"""


@register_local("tx_neardup_rows_agg", oracle=_TX_NEARDUP_ORACLE)
def tx_neardup_rows_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-place physical NEAR-dedup of an ACID corpus table under the
    value oracle (round 12, streaming/dedup.tx_dedup_table): ingest
    documents as ONE file in doc_id order — so the operator's
    positional row identity (file, zero-padded ordinal) orders
    exactly like doc_id, making its min-coordinate winners equal the
    oracle's min-doc_id winners — run the pipe's decision procedure
    over the snapshot (exact normalized-text survivors, then banded
    est-Jaccard >= 0.5 drops of the greater identity), erase the
    losers as a KB-scale deletion vector (zero files rewritten), and
    aggregate the cleaned table. The DuckDB oracle replays the whole
    procedure — shingles, minhash, banding, agreement threshold —
    over the same corpus."""
    import tempfile

    from ..sources.txlog import tx_read, tx_write
    from ..streaming.dedup import tx_dedup_table

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "n_chars"
    )
    table = tempfile.mkdtemp(prefix="tx_neardup_q_") + "/t"
    tx_write(docs.coalesce(1).sortWithinPartitions("doc_id"), table)
    tx_dedup_table(spark, table)
    return (
        tx_read(spark, table)
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
    )
