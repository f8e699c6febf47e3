"""Text-analysis queries over ``documents`` (north-star E4).

Ratios and scores divide exact integer counts (identical doubles across
engines); per-language rollups aggregate only ints and min/max of
doubles (both order-independent), never sums of doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.text_analysis import (
    LANG_PROFILES,
    bpe_ish_token_count,
    lang_id,
    language_profiles_df,
    rolling_fingerprint,
    token_stats,
    ws_tokens,
)
from ..registry import register, register_local
from ..sources.tables import load_table

_TOKS = "string_split(regexp_replace(trim(text), '\\s+', ' ', 'g'), ' ')"

_PROFILE_VALUES = ", ".join(
    f"('{lang}', '{w}')" for lang, words in LANG_PROFILES.items() for w in words
)


@register(
    "text_quality",
    oracle=f"""
    SELECT doc_id, lang, source,
           len({_TOKS}) AS n_tokens,
           length(text) AS n_chars,
           list_reduce(list_transform({_TOKS}, t -> CAST(length(t) AS BIGINT)),
                       (a, b) -> a + b) / len({_TOKS}) AS avg_token_len,
           len(regexp_extract_all(text, '[A-Za-z]')) / length(text) AS alpha_ratio,
           len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) / length(text) AS punct_ratio,
           (len(regexp_extract_all(text, '[A-Za-z]')) / length(text))
             * least(1.0, len({_TOKS}) / 20.0) AS quality_score
    FROM documents
    """,
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc quality profile: token/char counts, ratios, composite
    score — one shuffle-free scan."""
    return token_stats(load_table(spark, sf_dir, "documents"))


@register(
    "lang_id_pred",
    oracle=f"""
    WITH profiles(plang, pword) AS (VALUES {_PROFILE_VALUES}),
    tokens AS (
      SELECT doc_id, unnest({_TOKS}) AS tok FROM documents
    ),
    hits AS (
      SELECT doc_id, plang, count(*) AS n_hits
      FROM tokens JOIN profiles ON tok = pword
      GROUP BY doc_id, plang
    ),
    best AS (
      SELECT doc_id, plang AS pred_lang, n_hits
      FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
                                         ORDER BY n_hits DESC, plang ASC) AS rn
            FROM hits)
      WHERE rn = 1
    )
    SELECT d.doc_id, d.lang,
           coalesce(b.pred_lang, 'und') AS pred_lang,
           coalesce(b.n_hits, 0) AS n_hits
    FROM documents d LEFT JOIN best b ON b.doc_id = d.doc_id
    """,
)
def lang_id_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language ID: signature-word profile hits → per-doc
    argmax (broadcast profile join; deterministic tie-break)."""
    docs = load_table(spark, sf_dir, "documents")
    return lang_id(docs, language_profiles_df(spark))


@register_local(
    "token_counts",
    oracle=f"""
    SELECT source,
           count(*) AS n_docs,
           CAST(sum(CAST(len({_TOKS}) AS BIGINT)) AS BIGINT) AS ws_tokens,
           CAST(sum(CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))
                    AS BIGINT)) AS BIGINT) AS bpe_tokens
    FROM documents
    GROUP BY source
    """,
)
def token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus token budget per source under whitespace and BPE-ish
    tokenizations (the 'how many training tokens do I have' query)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(ws_tokens()).cast("long")).alias("ws_tokens"),
        F.sum(bpe_ish_token_count().cast("long")).alias("bpe_tokens"),
    )


@register_local(
    "doc_fingerprint",
    oracle="""
    SELECT doc_id,
           list_reduce(
             list_prepend(CAST(0 AS BIGINT),
                          list_transform(string_split(text, ''),
                                         ch -> CAST(greatest(ord(ch), 0) AS BIGINT))),
             (acc, c) -> (acc * 131 + c) % 2147483647) AS fingerprint
    FROM documents
    """,
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-sensitive rolling-hash fingerprint per document (the
    char-fold that generalizes to winnowing windows)."""
    return rolling_fingerprint(load_table(spark, sf_dir, "documents"))


@register(
    "doc_winnow",
    oracle=f"""
    WITH tarr AS (SELECT doc_id, {_TOKS} AS t FROM documents),
    tpos AS (SELECT doc_id, unnest(t) AS tok, generate_subscripts(t, 1) AS pos FROM tarr),
    sh AS (
      SELECT a.doc_id, a.pos - 1 AS pos,
             a.tok || ' ' || b.tok || ' ' || c.tok AS shingle
      FROM tpos a
      JOIN tpos b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
      JOIN tpos c ON c.doc_id = a.doc_id AND c.pos = a.pos + 2
    ),
    hashed AS (
      SELECT doc_id, pos,
             list_reduce(list_transform(generate_series(1, 15),
                i -> CAST(strpos('0123456789abcdef', substring(md5(shingle), i, 1)) - 1
                          AS BIGINT)),
               (a, b) -> a * 16 + b) % 2147483647 AS h
      FROM sh
    ),
    winned AS (
      SELECT doc_id, pos,
             min(h) OVER (PARTITION BY doc_id ORDER BY pos
                          ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp,
             count(*) OVER (PARTITION BY doc_id) AS n
      FROM hashed
    )
    SELECT DISTINCT doc_id, fp FROM winned WHERE pos <= n - 4
    """,
)
def doc_winnow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprint sets (k=3 shingles, w=4 windows): the
    local-similarity fingerprint — shared token runs of ≥ 6 guarantee a
    shared fingerprint. Oracle replays hash + window min exactly."""
    from ..operators.text_analysis import winnow_fingerprints

    return winnow_fingerprints(load_table(spark, sf_dir, "documents"), k=3, w=4)


@register(
    "lang_quality_summary",
    oracle=f"""
    SELECT lang,
           count(*) AS n_docs,
           CAST(sum(CAST(len({_TOKS}) AS BIGINT)) AS BIGINT) AS total_tokens,
           min(length(text)) AS min_chars,
           max(length(text)) AS max_chars
    FROM documents
    GROUP BY lang
    """,
)
def lang_quality_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language corpus rollup (int sums and min/max only — both
    order-independent, so safe to hash)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(ws_tokens()).cast("long")).alias("total_tokens"),
        F.min(F.length("text")).alias("min_chars"),
        F.max(F.length("text")).alias("max_chars"),
    )


# --- trained n-gram LM perplexity (stupid backoff) ------------------------

#: Full DuckDB replay of train_ngram_lm + ngram_lm_scores at n=3: count
#: all orders from the positioned token stream, divide by PRE-prune
#: context totals, then score each position at the longest matching
#: order with a 0.4 backoff factor per skipped level and the 1e-9 OOV
#: floor. avg(ln(score)) is the one float aggregate — rounded to 6
#: decimals on BOTH engines (repo float-parity convention; 6 decimals
#: keeps the cross-engine sum-order noise ~9 orders of magnitude away
#: from any rounding boundary, so the driver's EXACT value hash is
#: stable, not merely tolerance-close).
_LM_ORACLE = f"""
WITH tarr AS (
  SELECT doc_id,
         string_split(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'), ' ') AS t
  FROM documents
),
tpos AS (
  SELECT doc_id, generate_subscripts(t, 1) AS pos, unnest(t) AS w, t
  FROM tarr
),
tok AS (SELECT * FROM tpos WHERE w <> ''),
grams AS (
  SELECT k.k AS ord,
         -- coalesce: DuckDB renders the empty (unigram) slice as NULL
         coalesce(array_to_string(t[pos - k.k + 1 : pos - 1], ' '), '') AS context,
         w
  FROM tok, (VALUES (1), (2), (3)) k(k)
  WHERE k.k <= pos
),
counts AS (SELECT ord, context, w, count(*) AS c FROM grams GROUP BY 1, 2, 3),
totals AS (SELECT ord, context, sum(c) AS ct FROM counts GROUP BY 1, 2),
model AS (
  SELECT ord, context, w, CAST(c AS DOUBLE) / ct AS rf
  FROM counts JOIN totals USING (ord, context)
),
posn AS (
  SELECT doc_id, w,
         least(3, pos) AS mo,
         CASE WHEN pos >= 2
              THEN array_to_string(t[pos - 1 : pos - 1], ' ') END AS c2,
         CASE WHEN pos >= 3
              THEN array_to_string(t[pos - 2 : pos - 1], ' ') END AS c3
  FROM tok
),
s AS (
  SELECT doc_id,
         CASE WHEN m3.rf IS NOT NULL THEN power(0.4, mo - 3) * m3.rf
              WHEN m2.rf IS NOT NULL THEN power(0.4, mo - 2) * m2.rf
              WHEN m1.rf IS NOT NULL THEN power(0.4, mo - 1) * m1.rf
              ELSE power(0.4, mo - 1) * 1e-9 END AS sc
  FROM posn
  LEFT JOIN model m3 ON m3.ord = 3 AND m3.context = posn.c3 AND m3.w = posn.w
  LEFT JOIN model m2 ON m2.ord = 2 AND m2.context = posn.c2 AND m2.w = posn.w
  LEFT JOIN model m1 ON m1.ord = 1 AND m1.context = '' AND m1.w = posn.w
)
SELECT doc_id,
       count(*) AS n_tokens,
       round(avg(ln(sc)), 6) AS avg_logscore,
       round(exp(-avg(ln(sc))), 6) AS ppl
FROM s GROUP BY doc_id
"""


@register("lm_perplexity_docs", oracle=_LM_ORACLE)
def lm_perplexity_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stupid-backoff trigram LM trained on the corpus, scoring the
    corpus (operators/ngram_lm.py; Brants et al. 2007 + the CCNet
    perplexity-filter recipe). Self-scoring keeps the oracle closed
    over one table; train-on-A-score-B is the same two calls and is
    covered by tests/test_ngram_lm.py.

    The model is materialized to parquet and scored from the reload —
    the production train-once/score-many shape (KenLM-artifact
    analog): the scoring plan reads the vocabulary-sized model table
    three times (one per order slice) instead of recomputing the
    training aggregation three times in one mega-plan."""
    import tempfile

    from ..operators.ngram_lm import ngram_lm_scores, train_ngram_lm

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    model_path = tempfile.mkdtemp(prefix="lm_model_") + "/m"
    train_ngram_lm(docs, n=3).write.parquet(model_path)
    model = spark.read.parquet(model_path)
    return ngram_lm_scores(docs, model, n=3).select(
        "doc_id",
        "n_tokens",
        F.round("avg_logscore", 6).alias("avg_logscore"),
        F.round("ppl", 6).alias("ppl"),
    )


# --- feature-hashed document vectors --------------------------------------


def _hexfold(md5_expr: str) -> str:
    """conv(substr(md5,1,15),16,10) in portable SQL (60-bit fold)."""
    return f"""list_reduce(list_transform(generate_series(1, 15),
      i -> CAST(strpos('0123456789abcdef', substring({md5_expr}, i, 1)) - 1 AS BIGINT)),
      (a, b) -> a * 16 + b)"""


_HASH_VEC_ORACLE = f"""
WITH toks AS (
  SELECT doc_id,
         unnest(string_split(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'), ' ')) AS term
  FROM documents
),
tok AS (SELECT * FROM toks WHERE term <> ''),
tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
n AS (SELECT count(*) AS n_docs FROM documents),
comps AS (
  SELECT doc_id,
         {_hexfold("md5('0:' || term)")} % 64 AS b,
         (CASE WHEN {_hexfold("md5('1:' || term)")} % 2 = 0
               THEN 1.0 ELSE -1.0 END)
           * tf * (ln((n_docs + 1.0) / (df + 1.0)) + 1.0) AS w
  FROM tf JOIN dfq USING (term) CROSS JOIN n
),
sums AS (SELECT doc_id, b, CAST(sum(w) AS DOUBLE) AS w FROM comps GROUP BY 1, 2),
mv AS (SELECT doc_id, map(list(b ORDER BY b), list(w ORDER BY b)) AS m
       FROM sums GROUP BY doc_id),
dense AS (SELECT doc_id,
                 list_transform(generate_series(0, 63),
                                i -> coalesce(m[i][1], 0.0)) AS v
          FROM mv),
nrm AS (SELECT doc_id, v,
               sqrt(list_reduce(list_transform(v, x -> x * x),
                                (a, b) -> a + b)) AS nn
        FROM dense)
SELECT doc_id,
       CASE WHEN nn > 0
            THEN list_transform(v, x -> round(x / nn, 6))
            ELSE list_transform(v, x -> round(x, 6)) END AS embedding
FROM nrm
"""

# The driver's comparator canonicalizes via pandas over scalar cells
# and cannot hash ARRAY columns (CORRECTNESS_r07: doc_hash_vectors err
# "unhashable type: 'list'"), so the DRIVER row is the POSEXPLODEd
# (doc_id, i, component) shape; the array-shaped query stays in the
# local tier as the ANN-bridge contract (its oracle runner handles
# arrays).
_HASH_VEC_EXPLODED_ORACLE = f"""
WITH base AS ({_HASH_VEC_ORACLE}
)
SELECT doc_id, CAST(t.i AS INT) AS i, embedding[t.i + 1] AS component
FROM base CROSS JOIN generate_series(0, 63) AS t(i)
"""


def _hash_vec_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text_ranking import hashed_doc_vectors

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return hashed_doc_vectors(docs, dim=64).select(
        "doc_id",
        # component-wise 6-decimal rounding on BOTH engines: the
        # driver's exact value hash must not hinge on the last float
        # ulp of a cross-engine summation order
        F.transform("embedding", lambda x: F.round(x, 6)).alias(
            "embedding"
        ),
    )


@register("doc_hash_vectors", oracle=_HASH_VEC_EXPLODED_ORACLE)
def doc_hash_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-hashed TF-IDF document vectors at dim=64
    (operators/text_ranking.hashed_doc_vectors) — the model-free text →
    embedding bridge into the ANN family, whole construction replayed
    by the DuckDB oracle (hash buckets, signs, weights, densify,
    normalize). Registered in the exploded (doc_id, i, component)
    shape because the driver comparator cannot canonicalize array
    cells; :func:`doc_hash_vectors_array` is the array-shaped
    contract."""
    return _hash_vec_df(spark, sf_dir).select(
        "doc_id", F.posexplode("embedding").alias("i", "component")
    )


@register_local("doc_hash_vectors_array", oracle=_HASH_VEC_ORACLE)
def doc_hash_vectors_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The array-shaped variant (embedding ARRAY<DOUBLE>) — what ANN
    consumers actually take; oracle-gated by the suite, which handles
    list cells."""
    return _hash_vec_df(spark, sf_dir)
