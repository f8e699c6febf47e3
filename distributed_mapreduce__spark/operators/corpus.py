"""End-to-end training-corpus preparation (the LLM-pipeline composite).

``prepare_corpus`` chains the pipeline a pre-training data run actually
executes, each stage an operator already proven on its own:

1. exact dedup      — keep one canonical copy per normalized text
                      (min doc_id wins — deterministic survivor).
2. quality gate     — keep documents above a quality-score threshold
                      (operators/text_analysis.quality_expr).
3. language filter  — optional allow-list on the language column.
4. split assignment — content-addressed train/val/test tags
                      (operators/sampling.hash_split: stable under
                      corpus growth and task retries).

Every stage is deterministic column algebra, so the WHOLE composition
is DuckDB-oracle-checkable end-to-end (tests/test_corpus_pipeline.py)
— the integration-level guarantee that the stages compose without
order-dependence.

Scale: dedup is the only shuffle (a window over md5 of normalized
text — 32-byte keys); quality, language, and split are projections.
The output is ready for
``sources.sinks.overwrite_partitions(df, path, "split")`` — re-runs
rewrite only the partitions they produce.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import normalized_text
from .sampling import hash_split
from .text_analysis import quality_expr

DEFAULT_SPLITS: Mapping[str, float] = {"train": 0.9, "val": 0.05, "test": 0.05}


def exact_dedup_canonical(docs: DataFrame) -> DataFrame:
    """Keep one canonical copy (min doc_id) per normalized text — the
    shared exact-dedup stage of ``prepare_corpus`` and
    ``build_training_set`` (one definition so the survivor rule can
    never drift between the two entry points)."""
    w = Window.partitionBy("_h").orderBy(F.asc("doc_id"))
    return (
        docs.withColumn("_h", F.md5(normalized_text("text")))
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .drop("_rk", "_h")
    )


def prepare_corpus(
    docs: DataFrame,
    min_quality: float = 0.5,
    languages: Sequence[str] | None = None,
    splits: Mapping[str, float] = DEFAULT_SPLITS,
    seed: int = 0,
) -> DataFrame:
    """documents → (doc_id, text, lang, quality, split): deduped,
    quality-gated, language-filtered, split-tagged (module docstring)."""
    scored = exact_dedup_canonical(docs).withColumn(
        "quality", quality_expr("text")
    ).filter(
        F.col("quality") >= F.lit(min_quality)
    )
    if languages is not None:
        scored = scored.filter(F.col("lang").isin(list(languages)))
    return hash_split(
        scored, F.col("doc_id").cast("string"), splits, seed=seed
    ).select("doc_id", "text", "lang", "quality", "split")


def curation_signals(
    docs: DataFrame, k: int = 8, text_col: str = "text"
) -> DataFrame:
    """ONE call → the full per-document curation signal table:

    (doc_id, n_tokens, dup_word_frac, dup_line_frac, top_bigram_frac,
    quality_score, bpe_ish_tokens, compressed_len, compression_ratio,
    n_grams, n_novel, novelty)

    — repetition profile (operators/repetition.py), heuristic quality
    + pre-token budget (text_analysis), deflate redundancy
    (text_analysis.compression_ratio), and corpus-unique-gram novelty
    (substring_dedup.novelty_scores). The filter-rule front door: each
    component is independently oracle-tested; this assembles them with
    doc_id equi-joins (one shuffle each, AQE-sized) so a funnel
    (operators/funnel.py) or classifier (operators/classifier.py) can
    consume every signal from one DataFrame without re-plumbing four
    operators.

    ``novelty`` is the only corpus-RELATIVE signal here (one gram
    shuffle across the corpus); everything else is per-row compute."""
    from .repetition import repetition_signals
    from .substring_dedup import novelty_scores
    from .text_analysis import bpe_ish_token_count, compression_ratio

    rep = repetition_signals(docs.select("doc_id", text_col))
    perdoc = compression_ratio(
        docs.select(
            "doc_id",
            F.col(text_col).alias("text"),
        )
    ).select(
        "doc_id",
        quality_expr("text").alias("quality_score"),
        bpe_ish_token_count("text").alias("bpe_ish_tokens"),
        "compressed_len",
        "compression_ratio",
    )
    nov = novelty_scores(docs, k=k, text_col=text_col)
    return rep.join(perdoc, "doc_id").join(nov, "doc_id")


def build_training_set(
    docs: DataFrame,
    out_path: str,
    *,
    eval_docs: DataFrame | None = None,
    html: bool = False,
    clean: bool = True,
    clean_opts: Mapping | None = None,
    min_quality: float = 0.5,
    languages: Sequence[str] | None = None,
    near_dup_threshold: float | None = 0.8,
    contamination_ngram: int = 3,
    contamination_min_grams: int = 1,
    lm_model: DataFrame | None = None,
    lm_max_ppl: float | None = None,
    lang_classifier=None,
    splits: Mapping[str, float] = DEFAULT_SPLITS,
    rows_per_shard: int = 10_000,
    seed: int = 0,
    report: bool = True,
    workdir: str | None = None,
    input_token: str = "",
) -> dict:
    """Crawl → training shards, one call: the full modern curation
    recipe composed from the engine's proven operators, in the order a
    production pre-training run applies them:

    0.  canonical-URL dedup (automatic when the input has a ``url``
        column — the cheapest dedup, run before any text work;
        operators/urls.url_dedup)
    1.  HTML strip        (``html=True``; operators/lines.strip_html)
    2.  line cleaning     (C4 heuristics + corpus-wide line dedup;
                          operators/lines.clean_lines, tuned via
                          ``clean_opts``)
    3.  exact dedup       (normalized-text hash, min-doc_id survivor)
    4.  near-dup removal  (the auto-routed MinHash/LSH front door +
                          connected-component survivors;
                          ``near_dup_threshold=None`` skips)
    5.  decontamination   (Bloom-pruned n-gram overlap vs ``eval_docs``;
                          drops any train doc sharing ≥
                          ``contamination_min_grams`` eval n-grams)
    6.  quality gate + language allow-list (when the input carries no
        ``lang`` column — raw crawl text — it is predicted first:
        with the opt-in trained model when ``lang_classifier`` is
        passed (classifier.train_lang_classifier's PipelineModel, one
        shuffle-free scoring pass), else with the heuristic lang-ID
        operator)
    7.  content-addressed split tags (growth-stable hash_split)
    8.  deterministic global shuffle (seeded training order)
    9.  per-split bounded shards + manifest
                          (sources/sinks.write_training_shards under
                          ``<out_path>/<split>``)

    Input contract: ``(doc_id, text[, lang])`` — e.g.
    ``sources.warc.warc_documents`` output (rename its url/meta as
    desired; extra columns ride along into the shards). Returns a
    funnel report: per-stage surviving counts plus per-split shard
    totals — every count is taken on a persisted intermediate, so the
    report costs one cheap action per stage, not a recompute chain.

    ``workdir`` makes the pipeline RESUMABLE: each stage's output is
    committed to a transactional table under ``workdir/<stage>``
    (sources/txlog.py) keyed by a fingerprint chained over every
    upstream stage's configuration — a re-run after a crash (or a
    config tweak to a LATE stage) reads the committed snapshots of
    every stage whose fingerprint still matches and recomputes only
    from the first divergence. ``input_token`` is the caller's dataset
    version string: it seeds the chain, so changing the input corpus
    (or ``eval_docs`` / ``lm_model``) MUST come with a new token —
    the usual build-cache contract, stated loudly because the corpus
    itself is unhashable at 100 TB. The funnel report gains
    ``resumed_stages`` naming what was skipped.

    ``report=False`` is the production fast path: it skips every
    per-stage persist + count, fusing the whole funnel into ONE plan
    per split write (Catalyst pipelines the stages; at 100 TB the
    six full-corpus materializations the funnel report costs are the
    dominant expense of the default mode). The output shards are
    byte-identical either way; the returned dict then carries only
    the per-split shard totals (free — they come from the manifests)
    plus ``n_input``-style keys omitted. The ONE remaining persist is
    the post-sort training order, shared by every split's writer, and
    the one remaining pre-write job is the near-dup router's count
    (pass a profiled ``doc_count`` upstream to kill even that).

    Scale: the stages shuffle on md5 keys (exact dedup), hashed
    shingle longs (near-dup), Bloom survivors (decontamination), and
    the final range sort — each individually plan-audited in its own
    operator; nothing here adds a join or shuffle beyond them.
    """
    from .bloom import decontaminate_bloom
    from .dedup import near_dup_pairs
    from .graph import dedup_survivors
    from .lines import clean_lines, strip_html
    from .sampling import deterministic_shuffle
    from ..sources.sinks import write_training_shards

    import hashlib as _hl

    cached: list[DataFrame] = []
    want_report = report

    def _stage(df: DataFrame) -> DataFrame:
        if not want_report:
            return df  # fast path: no materialization, stages fuse
        df = df.persist()
        cached.append(df)
        return df

    fp_chain = _hl.md5(f"v1|{input_token}".encode()).hexdigest()[:16]

    def _fp(*parts) -> str:
        nonlocal fp_chain
        fp_chain = _hl.md5(
            "|".join([fp_chain, *map(repr, parts)]).encode()
        ).hexdigest()[:16]
        return fp_chain

    resumed: list[str] = []

    def _ckpt(name: str, fingerprint: str, compute):
        """workdir mode: the stage's output lives in a transactional
        table keyed by the config-chain fingerprint; a matching
        committed fingerprint that still OWNS the latest snapshot is
        read back instead of recomputed (an overwrite by a different
        config retires older fingerprints from reuse — reusing a txn
        that no longer produced the current snapshot would silently
        serve the other config's data)."""
        if workdir is None:
            return _stage(compute())
        from ..sources.txlog import _committed_txns, tx_read, tx_write

        spark = docs.sparkSession
        path = f"{workdir}/{name}"
        prefix = f"{name}:{fingerprint}:"
        try:
            done = _committed_txns(spark, path)
        except Exception:  # noqa: BLE001 — table absent on first run
            done = {}
        latest = max(done.values()) if done else None
        if any(t.startswith(prefix) and v == latest for t, v in done.items()):
            resumed.append(name)
        else:
            # txn carries an attempt counter: rolling BACK to a config
            # whose fingerprint committed earlier must RE-commit (the
            # table meanwhile holds another config's snapshot), and a
            # bare fingerprint txn would be silently skipped by
            # tx_write's idempotence — while a crash-retry of THIS
            # attempt (same counter, nothing committed in between)
            # still dedupes exactly-once
            tx_write(
                compute(), path, mode="overwrite",
                txn=f"{prefix}{len(done)}",
            )
        return tx_read(spark, path)

    funnel: dict = {"n_input": docs.count()} if want_report else {}
    cur = docs
    if "url" in cur.columns:
        # stage 0 of every crawl pipeline: canonical-URL dedup — one
        # shuffle on the canonical key, BEFORE any text work touches
        # the (much heavier) document bodies
        from .urls import url_dedup

        src = cur
        cur = _ckpt(
            "url_dedup", _fp("url_dedup"),
            lambda: url_dedup(src, url_col="url", tie_col="doc_id"),
        )
        if want_report:
            funnel["n_after_url_dedup"] = cur.count()
    if html:
        cur = cur.withColumn("text", strip_html("text"))
    if clean:

        def _do_clean(src=cur):
            meta = src.drop("text")
            cleaned = clean_lines(src, **(dict(clean_opts or {}))).select(
                "doc_id", "text"
            )
            return cleaned.join(meta, "doc_id")

        cur = _ckpt(
            "clean",
            _fp("clean", html, sorted((clean_opts or {}).items())),
            _do_clean,
        )
        if want_report:
            funnel["n_after_clean"] = cur.count()

    cur = _ckpt(
        "exact_dedup", _fp("exact_dedup"),
        lambda src=cur: exact_dedup_canonical(src),
    )
    if want_report:
        funnel["n_after_exact_dedup"] = cur.count()

    if near_dup_threshold is not None:

        def _do_near(src=cur):
            pairs = near_dup_pairs(
                src,
                threshold=near_dup_threshold,
                doc_count=funnel.get("n_after_exact_dedup"),
            ).select("doc_a", "doc_b")
            return dedup_survivors(src, pairs, id_col="doc_id")

        cur = _ckpt(
            "near_dedup", _fp("near_dedup", near_dup_threshold), _do_near
        )
        if want_report:
            funnel["n_after_near_dedup"] = cur.count()

    if eval_docs is not None:

        def _do_decontam(src=cur):
            hits = (
                decontaminate_bloom(src, eval_docs, n=contamination_ngram)
                .filter(F.col("n_shared") >= F.lit(contamination_min_grams))
                .select(F.col("train_doc").alias("doc_id"))
                .distinct()
            )
            return src.join(hits, "doc_id", "left_anti")

        cur = _ckpt(
            "decontam",
            _fp("decontam", contamination_ngram, contamination_min_grams),
            _do_decontam,
        )
        if want_report:
            funnel["n_after_decontamination"] = cur.count()

    if lm_max_ppl is not None:
        if lm_model is None:
            raise ValueError(
                "lm_max_ppl requires lm_model (train one on clean "
                "reference text with ngram_lm.train_ngram_lm)"
            )
        from .ngram_lm import perplexity_filter

        cur = _ckpt(
            "lm_filter", _fp("lm_filter", lm_max_ppl),
            lambda src=cur: perplexity_filter(src, lm_model, lm_max_ppl),
        )
        if want_report:
            funnel["n_after_lm_filter"] = cur.count()

    def _do_split(src=cur):
        out = src.withColumn("quality", quality_expr("text")).filter(
            F.col("quality") >= F.lit(min_quality)
        )
        if languages is not None:
            if "lang" not in out.columns:
                if lang_classifier is not None:
                    # opt-in trained lang-ID: one shuffle-free model
                    # scoring pass (classifier.predict_language)
                    from .classifier import predict_language

                    pred = predict_language(
                        lang_classifier, out.select("doc_id", "text")
                    ).select("doc_id", F.col("pred_lang").alias("lang"))
                else:
                    # raw-crawl input (e.g. warc_documents) carries no
                    # lang — predict it with the heuristic lang-ID
                    # operator (broadcast profile join; 'und' when no
                    # word hits)
                    from .text_analysis import lang_id, language_profiles_df

                    pred = lang_id(
                        out.select("doc_id", "text").withColumn(
                            "lang", F.lit(None).cast("string")
                        ),
                        language_profiles_df(out.sparkSession),
                    ).select("doc_id", F.col("pred_lang").alias("lang"))
                out = out.join(pred, "doc_id")
            out = out.filter(F.col("lang").isin(list(languages)))
        return hash_split(
            out, F.col("doc_id").cast("string"), splits, seed=seed
        )

    split_fp_args = [min_quality, languages, sorted(splits.items()), seed]
    if lang_classifier is not None:
        # a different predictor produces a different split input — the
        # resume fingerprint must not collide with the heuristic arm,
        # NOR with a different/retrained model (the fingerprint hashes
        # the fitted coefficients + label vocabulary, ADVICE r8)
        from .classifier import lang_model_fingerprint

        split_fp_args.append(f"lang-model:{lang_model_fingerprint(lang_classifier)}")
    cur = _ckpt(
        "split",
        _fp("split", *split_fp_args),
        _do_split,
    )
    if want_report:
        funnel["n_after_quality"] = cur.count()

    # persist the SORTED result in BOTH modes: every split's writer
    # consumes it, so without it each per-split write below would
    # re-run the whole funnel + global range sort
    shuffled = deterministic_shuffle(
        cur, F.col("doc_id").cast("string"), seed=seed
    ).persist()
    cached.append(shuffled)
    funnel["splits"] = {}
    for name in splits:
        manifest = write_training_shards(
            shuffled.filter(F.col("split") == name).drop("split"),
            f"{out_path}/{name}",
            rows_per_shard,
        )
        rows = manifest.agg(
            F.coalesce(F.sum("n_rows"), F.lit(0)).alias("n"),
            F.count("*").alias("shards"),
        ).collect()[0]
        funnel["splits"][name] = {"n_rows": rows["n"], "n_shards": rows["shards"]}
    for df in cached:  # all actions are done — release the cache
        df.unpersist()
    if workdir is not None and want_report:
        funnel["resumed_stages"] = resumed
    return funnel
