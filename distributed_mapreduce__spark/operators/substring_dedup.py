"""Exact substring deduplication: find and strip duplicated token
spans (≥ k tokens) that occur more than once ANYWHERE in the corpus —
the ExactSubstr pass of Lee et al., "Deduplicating Training Data Makes
Language Models Better" (arXiv 2107.06499).

Document-level dedup (operators/dedup.py) misses the dominant
real-world case: boilerplate — licenses, navigation chrome, terms-of-
service blocks — pasted into MILLIONS of otherwise-distinct pages.
Lee et al. remove any substring of ≥ 50 BPE tokens appearing more than
once in the corpus; this module is the distributed analog on
whitespace tokens.

Algorithm (vs. the paper's suffix array, which is a single-machine
construction): fixed-k token-gram hashing. For repeats of length
≥ k tokens the two are EQUALLY COMPLETE — a duplicated span of length
L ≥ k contains only duplicated k-grams, and any duplicated k-gram is
itself a duplicated span — so detecting duplicated k-grams and merging
contiguous runs recovers every maximal duplicated region. What fixed-k
gives up is sub-k repeats (invisible, by the same threshold the paper
applies) and separation of DISTINCT overlapping repeats (contiguous
duplicated coverage merges into one span — conservative: never removes
non-duplicated text, may group two abutting boilerplate blocks as one).

Scale shape — every step is linear in corpus tokens:

1. k-gram extraction is pure column algebra (split → transform/slice →
   md5 → posexplode): corpus_tokens rows of (doc_id, pos, 32-char
   hash), no Python.
2. ONE shuffle counts gram occurrences (Catalyst partial aggregation
   does the map-side combine; the md5 key is uniform — no skew).
3. Duplicated grams join back to positions by hash (unhinted
   equi-join, AQE picks the build side — the duplicated set is tiny
   for clean corpora and the join degrades gracefully when it isn't).
4. Span merging is a per-document window (partitionBy doc_id — the
   gaps-and-islands running-max trick), then one aggregation.
5. Stripping groups removal intervals per doc (bounded by doc length)
   and filters tokens with higher-order array functions — no UDFs
   anywhere in the operator.

Span identity for "keep one copy": the md5 of the span TEXT; the
canonical survivor is the (doc_id, start)-minimal occurrence. Spans
whose merged extent differs across documents (same repeat, different
neighbors) get different hashes and each extent keeps its own
canonical — conservative in the same direction as above.

Hash note: gram/span keys are md5 of the actual substring — a
collision would need two distinct substrings with equal md5;
cryptographically negligible and the same trust the exact-dedup path
places in md5(text).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: whitespace tokens — portable to DuckDB's regexp_extract_all
TOKEN_RE = r"\S+"


def _tokens(text_col: str) -> Column:
    return F.regexp_extract_all(F.col(text_col), F.lit(TOKEN_RE), 0)


def duplicated_gram_positions(
    docs: DataFrame, k: int, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, pos): start positions (0-based, token units) of every
    k-gram whose text occurs ≥ 2 times in the corpus (all occurrences
    counted, including same-document repeats)."""
    from ..plans.partitioning import spread

    # materialize the token array BEFORE the gram lambda: an expression
    # referenced inside transform()'s function is re-evaluated per
    # element, so inlining regexp_extract_all here would re-tokenize
    # the whole document for every gram position (measured ~6x slower).
    # spread() first: the fixture parquet arrives as one scan partition
    # and tokenize+md5 per gram is the expensive per-row stage.
    toked = spread(docs).select(F.col(id_col), _tokens(text_col).alias("_toks"))
    toks = F.col("_toks")
    grams = toked.select(
        F.col(id_col),
        F.posexplode(
            F.when(
                F.size(toks) >= k,
                F.transform(
                    F.sequence(F.lit(0), F.size(toks) - k),
                    lambda i: F.md5(F.concat_ws(" ", F.slice(toks, i + 1, k))),
                ),
            ).otherwise(F.array())
        ).alias("pos", "gram"),
    )
    # one shuffle on gram; a window count replaces the aggregate +
    # join-back (which would scan and hash the gram table twice).
    # Per-gram groups are occurrence lists (tiny), so the window
    # buffer is bounded by the hottest gram, not the partition.
    n_occ = F.count("*").over(Window.partitionBy("gram"))
    return (
        grams.withColumn("n", n_occ)
        .filter(F.col("n") >= 2)
        .select(id_col, "pos")
    )


def repeated_spans(
    docs: DataFrame, k: int = 8, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, span_start, span_end, span_text, span_hash): maximal
    contiguous regions covered by duplicated k-grams, per document.
    ``span_end`` is exclusive; both are token indices. Adjacent
    coverage merges (see module docstring)."""
    pos = duplicated_gram_positions(docs, k, text_col, id_col)
    w = (
        Window.partitionBy(id_col)
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # gaps-and-islands: a new island starts where this gram's coverage
    # [pos, pos+k) does not touch the furthest coverage end so far
    islands = (
        pos.withColumn("prev_end", F.max(F.col("pos") + k).over(w))
        .withColumn(
            "new_island",
            (F.col("prev_end").isNull() | (F.col("pos") > F.col("prev_end"))).cast(
                "int"
            ),
        )
        .withColumn(
            "island",
            F.sum("new_island").over(
                Window.partitionBy(id_col)
                .orderBy("pos")
                .rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
    )
    spans = islands.groupBy(id_col, "island").agg(
        F.min("pos").alias("span_start"),
        (F.max("pos") + k).alias("span_end"),
    )
    return (
        spans.join(docs.select(id_col, F.col(text_col).alias("_t")), id_col)
        .select(
            id_col,
            "span_start",
            "span_end",
            F.concat_ws(
                " ",
                F.slice(
                    F.regexp_extract_all(F.col("_t"), F.lit(TOKEN_RE), 0),
                    F.col("span_start") + 1,
                    F.col("span_end") - F.col("span_start"),
                ),
            ).alias("span_text"),
        )
        .withColumn("span_hash", F.md5("span_text"))
    )


def strip_repeated_spans(
    docs: DataFrame, k: int = 8, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """``docs`` with ``text`` rebuilt minus every duplicated span
    EXCEPT its canonical occurrence (the (doc_id, span_start)-minimal
    one per span_hash) — one copy of each boilerplate block survives,
    Lee et al.'s keep-one contract. Adds ``n_stripped_tokens``.

    Token-rejoin note: the cleaned text is the kept tokens joined with
    single spaces — original whitespace flavor inside and around
    removed spans is not preserved (tokens are the dedup unit)."""
    spans = repeated_spans(docs, k, text_col, id_col)
    w_canon = Window.partitionBy("span_hash").orderBy(id_col, "span_start")
    removals = (
        spans.withColumn("rk", F.row_number().over(w_canon))
        .filter(F.col("rk") > 1)
        .groupBy(id_col)
        .agg(
            F.collect_list(F.struct("span_start", "span_end")).alias("cuts")
        )
    )
    from ..plans.partitioning import spread

    cleaned = (
        spread(docs).join(removals, id_col, "left")
        .withColumn(
            "_kept",
            F.when(F.col("cuts").isNull(), _tokens(text_col)).otherwise(
                F.filter(
                    F.transform(
                        _tokens(text_col),
                        lambda t, i: F.struct(t.alias("t"), i.alias("i")),
                    ),
                    lambda s: ~F.exists(
                        F.col("cuts"),
                        lambda c: (s["i"] >= c["span_start"])
                        & (s["i"] < c["span_end"]),
                    ),
                ).getField("t")
            ),
        )
        .withColumn(
            "n_stripped_tokens",
            (F.size(_tokens(text_col)) - F.size("_kept")).cast("long"),
        )
    )
    return cleaned.select(
        *[c for c in docs.columns if c != text_col],
        # NULL text stays NULL (concat_ws would silently coerce to "")
        F.when(
            F.col(text_col).isNull(), F.lit(None).cast("string")
        ).otherwise(F.concat_ws(" ", "_kept")).alias(text_col),
        F.coalesce("n_stripped_tokens", F.lit(0)).alias(
            "n_stripped_tokens"
        ),
    )


def novelty_scores(
    docs: DataFrame, k: int = 8, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, n_grams, n_novel, novelty): fraction of a document's
    k-grams whose text occurs nowhere else in the corpus (count == 1
    globally) — the inverse-boilerplate ranking signal: sort ascending
    and the template-stamped pages surface; weight sampling by it and
    near-copies stop dominating the mixture. Documents with < k tokens
    have no gram support: n_grams = 0, novelty NULL.

    Same single-shuffle gram pipeline as :func:`repeated_spans`
    (shared extraction, window count on the gram hash), then one
    per-document aggregation."""
    toked = docs.select(F.col(id_col), _tokens(text_col).alias("_toks"))
    toks = F.col("_toks")
    from ..plans.partitioning import spread

    grams = spread(toked).select(
        F.col(id_col),
        F.explode(
            F.when(
                F.size(toks) >= k,
                F.transform(
                    F.sequence(F.lit(0), F.size(toks) - k),
                    lambda i: F.md5(F.concat_ws(" ", F.slice(toks, i + 1, k))),
                ),
            ).otherwise(F.array())
        ).alias("gram"),
    )
    n_occ = F.count("*").over(Window.partitionBy("gram"))
    per_doc = (
        grams.withColumn("novel", (n_occ == 1).cast("long"))
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_grams"),
            F.sum("novel").alias("n_novel"),
        )
    )
    return (
        docs.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
            F.coalesce("n_novel", F.lit(0)).alias("n_novel"),
            F.try_divide(
                F.coalesce("n_novel", F.lit(0)).cast("double"),
                F.coalesce("n_grams", F.lit(0)),
            ).alias("novelty"),
        )
    )
