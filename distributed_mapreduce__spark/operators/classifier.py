"""Model-based document quality classifier (MLlib logistic regression).

The standard corpus-curation pattern (CCNet / LLaMA-style): a cheap
heuristic labels an anchor set, a linear model is trained to generalize
it, and the MODEL — not the heuristic — scores the full corpus. Here the
anchor labels come from :func:`..operators.text_analysis.quality_expr`
(alpha-ratio × length ramp) and the model sees only the raw per-document
statistics, so it must learn the decision surface rather than copy it.

Scale notes (100 TB):
- Featurization is the same zero-shuffle column algebra as
  ``token_stats`` — one corpus pass.
- ``LogisticRegression`` trains with distributed L-BFGS: each iteration
  is one map-side gradient pass + a treeAggregate reduce of a
  5-element gradient — no per-row state on the driver. Training on a
  deterministic hash-sample (``sampling.hash_uniform``) rather than the
  full corpus is the intended 100 TB form; scoring is an
  embarrassingly-parallel map of a 5-weight dot product.
- The fitted model is a handful of doubles broadcast to executors —
  ``score_documents`` adds zero shuffles.

Reference parity: the reference engine (mapreduce/mapreduce.go:24-58)
has no ML surface; this extends the E4 text-analysis family with the
model-scoring step a real training-data pipeline needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_COLS = ("n_tokens", "avg_token_len", "alpha_ratio", "punct_ratio")


def quality_training_frame(
    docs: DataFrame, good_threshold: float = 0.5
) -> DataFrame:
    """Per-doc raw features + heuristic anchor label (1 = good).

    The label is ``quality_expr() >= good_threshold``; the feature set
    deliberately EXCLUDES the composite score itself.

    Degenerate documents (empty / whitespace-only → NULL ratios from
    the 0/0 divisions) get all-zero features and label 0: NULLs would
    make VectorAssembler (handleInvalid='error') throw, and
    ``score_documents`` promises a score for EVERY document — zero
    features is the honest encoding of "no signal, bad quality"."""
    from .text_analysis import token_stats

    stats = token_stats(docs)
    return stats.select(
        "doc_id",
        *[
            F.coalesce(F.col(c).cast("double"), F.lit(0.0)).alias(c)
            for c in FEATURE_COLS
        ],
        (F.coalesce(F.col("quality_score"), F.lit(0.0)) >= good_threshold)
        .cast("double")
        .alias("label"),
    )


def train_quality_classifier(train_df: DataFrame):
    """Fit LR on a :func:`quality_training_frame`-shaped DataFrame.

    Returns a PipelineModel (assembler + scaler + LR). Deterministic:
    L-BFGS from a zero init on fixed data has no randomized step."""
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import StandardScaler, VectorAssembler

    assembler = VectorAssembler(
        inputCols=list(FEATURE_COLS), outputCol="raw_features"
    )
    scaler = StandardScaler(
        inputCol="raw_features", outputCol="features", withMean=True
    )
    lr = LogisticRegression(maxIter=50, regParam=0.01)
    return Pipeline(stages=[assembler, scaler, lr]).fit(train_df)


def score_documents(model, docs: DataFrame) -> DataFrame:
    """(doc_id, quality_prob, pred): model scores for every document.

    One corpus pass; the model weights ride the closure (broadcast)."""
    from pyspark.ml.functions import vector_to_array

    feats = quality_training_frame(docs).drop("label")
    scored = model.transform(feats)
    return scored.select(
        "doc_id",
        vector_to_array("probability")[1].alias("quality_prob"),
        F.col("prediction").alias("pred"),
    )


# --- trained language ID (round 8: VERDICT r7 #8) --------------------------
#
# fastText-class shape on MLlib primitives: character n-gram bag →
# hashed features → multinomial logistic regression, trained on the
# HEURISTIC lang-ID's labels (operators/text_analysis.lang_id) — the
# same anchor-label pattern as the quality classifier above. 'und'
# (no profile-word hits) is a first-class label so the model keeps an
# honest "no signal" output instead of inventing a language.
#
# 100 TB posture: training runs on a hash-sample (sampling.
# hash_uniform) — the gradient passes are distributed L-BFGS exactly
# as for the quality LR; scoring is one shuffle-free map pass (char
# split + n-gram + feature hashing + a (num_features × n_langs)
# coefficient matrix broadcast with the model, 4096×5 doubles here).

LANG_NGRAM = 2
LANG_NUM_FEATURES = 1 << 12


def _lang_char_frame(docs: DataFrame) -> DataFrame:
    """(doc_id, chars): lowercased character stream (empties dropped —
    Spark's split('') emits boundary empties)."""
    return docs.select(
        "doc_id",
        F.filter(
            F.split(F.lower(F.col("text")), ""), lambda x: x != ""
        ).alias("chars"),
    )


def lang_training_frame(docs: DataFrame, profiles: DataFrame | None = None) -> DataFrame:
    """(doc_id, chars, anchor_lang): heuristic anchor labels (incl.
    'und') + character features. The model sees only the raw character
    stream, so it must learn the heuristic's decision surface — and
    generalizes past it to documents whose profile words are absent
    but whose character statistics match."""
    from .text_analysis import lang_id, language_profiles_df

    if profiles is None:
        profiles = language_profiles_df(docs.sparkSession)
    with_lang = (
        docs
        if "lang" in docs.columns
        else docs.withColumn("lang", F.lit(None).cast("string"))
    )
    anchors = lang_id(with_lang, profiles).select(
        "doc_id", F.col("pred_lang").alias("anchor_lang")
    )
    return _lang_char_frame(docs).join(anchors, "doc_id")


def train_lang_classifier(
    train_df: DataFrame,
    num_features: int = LANG_NUM_FEATURES,
    n: int = LANG_NGRAM,
):
    """Fit the char-n-gram LR on a :func:`lang_training_frame`-shaped
    DataFrame. Deterministic (alphabetic label indexing, L-BFGS from
    zero init on fixed data). Returns a PipelineModel whose label
    vocabulary rides in its StringIndexerModel stage."""
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import HashingTF, NGram, StringIndexer

    grams = NGram(n=n, inputCol="chars", outputCol="grams")
    tf = HashingTF(
        inputCol="grams", outputCol="features", numFeatures=num_features
    )
    indexer = StringIndexer(
        inputCol="anchor_lang",
        outputCol="label",
        stringOrderType="alphabetAsc",
    )
    lr = LogisticRegression(
        family="multinomial", maxIter=60, regParam=1e-3
    )
    return Pipeline(stages=[grams, tf, indexer, lr]).fit(train_df)


def _indexer_labels(model) -> list[str]:
    """Label vocabulary of the pipeline's StringIndexerModel stage,
    read explicitly by stage type (not a hasattr scan):
    ``labelsArray[0]`` on current Spark, ``labels`` as the fallback
    for versions predating the multi-column API."""
    from pyspark.ml.feature import StringIndexerModel

    idx = next(s for s in model.stages if isinstance(s, StringIndexerModel))
    try:
        return list(idx.labelsArray[0])
    except (AttributeError, IndexError):
        return list(idx.labels)


def lang_model_fingerprint(model) -> str:
    """Stable identity of a FITTED lang classifier: sha256 over the
    label vocabulary + LR coefficient matrix + intercepts. Two models
    agree on this iff they score identically, so resume fingerprints
    (``corpus.build_training_set``) fold it in — a retrained model
    never silently resumes a split checkpoint computed from an old
    model's predictions (ADVICE r8)."""
    import hashlib

    lr = model.stages[-1]
    h = hashlib.sha256()
    h.update("\x00".join(_indexer_labels(model)).encode())
    h.update(lr.coefficientMatrix.toArray().tobytes())
    h.update(lr.interceptVector.toArray().tobytes())
    return h.hexdigest()[:16]


def predict_language(model, docs: DataFrame) -> DataFrame:
    """(doc_id, pred_lang): model-based language ID for every document
    — one map pass, zero shuffles added (the coefficient matrix and
    the label vocabulary are broadcast with the model).

    The scoring frame deliberately carries no ``anchor_lang`` column;
    StringIndexerModel.transform skips itself when its input column is
    absent (contract pinned by test_lang_classifier), so the pipeline
    scores unlabeled documents without a dummy label column."""
    labels = _indexer_labels(model)
    scored = model.transform(_lang_char_frame(docs))
    vocab = F.array(*[F.lit(l) for l in labels])
    return scored.select(
        "doc_id",
        F.element_at(
            vocab, F.col("prediction").cast("int") + F.lit(1)
        ).alias("pred_lang"),
    )
