"""Line-level corpus cleaning (C4/CCNet family).

The classic web-corpus cleaning granularity sits BETWEEN whole-document
dedup (operators/dedup.py) and k-gram span dedup
(operators/substring_dedup.py): individual *lines*. Raffel et al. 2020
(C4, arXiv:1910.10683 §2.2) keep only lines that end in terminal
punctuation and have enough words, drop pages containing blocklisted
phrases, and de-duplicate repeated spans corpus-wide; Wenzek et al. 2020
(CCNet, arXiv:1911.00359 §3.1) de-duplicate on hashed *lines* across the
whole crawl, which removes boilerplate headers/footers/cookie banners
that appear on millions of pages. This module implements that family as
pure DataFrame algebra:

- :func:`doc_lines`       — (doc_id, line_no, line) via posexplode.
- :func:`keep_line_expr`  — the C4 per-line heuristic as one Column.
- :func:`dedup_lines`     — corpus-wide keep-first line dedup.
- :func:`clean_lines`     — the full pipeline: doc blocklist → line
                            filters → global line dedup → reassemble →
                            drop docs left with too few lines.
- :func:`strip_html`      — markup removal for raw-crawl text columns.

Scale (100 TB): the only shuffles are (1) the keep-first aggregate,
keyed on md5(line) — 32-byte keys, and hot lines (the boilerplate this
exists to remove, appearing on millions of pages) collapse map-side
because min(struct) partial-aggregates before the exchange; (2) the
join-back of the canonical table, an equi-join on the same 32-byte hash
(AQE skew-join splits any residual hot bucket); (3) the per-doc
reassembly groupBy, keyed on doc_id — at most one output row per doc.
Line text itself never shuffles as a key. Everything else is per-row
column algebra at scan speed.

Semantics order: document blocklist first (C4 drops the whole page),
then per-line filters, then corpus-wide dedup over the SURVIVING lines
(so canonical selection can't resurrect a filtered line), then the
min-lines page filter — each step is oracle-replayed in DuckDB
(tests/test_lines.py) on constructed corpora and the parquet fixtures.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: C4's published defaults (arXiv:1910.10683 §2.2).
C4_MIN_WORDS = 5
C4_MIN_LINES = 3
C4_DOC_BLOCKLIST = ("lorem ipsum", "{")
C4_LINE_BLOCKLIST = ("javascript",)

#: Terminal punctuation accepted by the C4 line filter (a closing quote
#: after the mark also counts, matching the paper's "terminal
#: punctuation mark" reading of quoted dialogue lines).
_TERMINAL_RE = r'[.!?]["”]?\s*$'


def doc_lines(docs: DataFrame, col: str = "text") -> DataFrame:
    """Explode documents into (doc_id, line_no, line); 0-based line_no.

    ``split`` on the literal newline keeps empty segments, so line
    numbering matches DuckDB's ``string_split`` + ``generate_subscripts``
    exactly (the oracle subtracts 1 from its 1-based subscripts)."""
    from ..plans.partitioning import spread

    return spread(docs).select(
        "doc_id",
        F.posexplode(F.split(F.col(col), "\n")).alias("line_no", "line"),
    )


def keep_line_expr(
    line_col: str = "line",
    *,
    min_words: int = C4_MIN_WORDS,
    require_terminal_punct: bool = True,
    line_blocklist: tuple[str, ...] = C4_LINE_BLOCKLIST,
) -> Column:
    """The C4 per-line keep predicate as a single Column.

    A line survives iff it has ≥ ``min_words`` whitespace words, ends in
    terminal punctuation (when required), and contains no blocklisted
    substring (case-insensitive). Pure per-row algebra — no shuffle."""
    ln = F.col(line_col)
    trimmed = F.trim(ln)
    # Word count of the trimmed line; empty → 0 (split of '' yields ['']).
    words = F.when(trimmed == "", F.lit(0)).otherwise(
        F.size(F.split(F.regexp_replace(trimmed, r"\s+", " "), " "))
    )
    keep = words >= F.lit(min_words)
    if require_terminal_punct:
        keep = keep & (F.regexp_count(trimmed, F.lit(_TERMINAL_RE)) > 0)
    low = F.lower(ln)
    for bad in line_blocklist:
        keep = keep & ~low.contains(bad.lower())
    return keep


def dedup_lines(lines: DataFrame) -> DataFrame:
    """Corpus-wide keep-first line dedup over (doc_id, line_no, line).

    An exact line is kept only at its first occurrence in corpus order
    (minimal (doc_id, line_no)); every later occurrence — the CCNet
    boilerplate signature — is dropped. Keyed on md5(line): the
    aggregate's min(struct) partial-aggregates map-side (hot boilerplate
    lines collapse before the exchange) and the join-back ships 32-byte
    hashes, never line text."""
    hashed = lines.withColumn("_lh", F.md5(F.col("line")))
    canon = hashed.groupBy("_lh").agg(
        F.min(F.struct("doc_id", "line_no")).alias("_first")
    )
    return (
        hashed.join(canon, "_lh")
        .where(
            (F.col("doc_id") == F.col("_first.doc_id"))
            & (F.col("line_no") == F.col("_first.line_no"))
        )
        .select("doc_id", "line_no", "line")
    )


def clean_lines(
    docs: DataFrame,
    col: str = "text",
    *,
    min_words: int = C4_MIN_WORDS,
    require_terminal_punct: bool = True,
    line_blocklist: tuple[str, ...] = C4_LINE_BLOCKLIST,
    doc_blocklist: tuple[str, ...] = C4_DOC_BLOCKLIST,
    dedup: bool = True,
    min_lines: int = C4_MIN_LINES,
) -> DataFrame:
    """Full C4/CCNet line-cleaning pipeline → (doc_id, text, n_lines).

    Steps, in the order the papers apply them: drop whole documents
    containing a blocklisted substring (case-insensitive); drop lines
    failing :func:`keep_line_expr`; corpus-wide keep-first dedup of the
    surviving lines (``dedup=False`` skips it); reassemble each
    document's survivors in original line order; drop documents left
    with fewer than ``min_lines`` lines. ``n_lines`` is the surviving
    line count per kept document."""
    base = docs
    if doc_blocklist:
        low = F.lower(F.col(col))
        for bad in doc_blocklist:
            base = base.where(~low.contains(bad.lower()))
    lines = doc_lines(base, col).where(
        keep_line_expr(
            min_words=min_words,
            require_terminal_punct=require_terminal_punct,
            line_blocklist=line_blocklist,
        )
    )
    if dedup:
        lines = dedup_lines(lines)
    return (
        lines.groupBy("doc_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("line_no", "line"))
            ).alias("_parts")
        )
        .select(
            "doc_id",
            F.array_join(F.transform("_parts", lambda p: p["line"]), "\n").alias(
                "text"
            ),
            F.size("_parts").alias("n_lines"),
        )
        .where(F.col("n_lines") >= min_lines)
    )


#: script/style elements swallow their content; all other tags drop but
#: keep inner text. Comments go before tags so `<!-- <b> -->` vanishes.
#: Two separate block patterns instead of a `(script|style)…\1`
#: backreference: DuckDB's RE2 (the oracle engine) has no backrefs.
_HTML_SCRIPT_RE = r"(?is)<script\b[^>]*>.*?</script\s*>"
_HTML_STYLE_RE = r"(?is)<style\b[^>]*>.*?</style\s*>"
_HTML_COMMENT_RE = r"(?s)<!--.*?-->"
_HTML_TAG_RE = r"(?s)</?[a-zA-Z!][^>]*>"


def strip_html(col: str = "text") -> Column:
    """Markup removal for raw-crawl text: one Column, zero shuffle.

    Removes <script>/<style> blocks with their contents, HTML comments,
    then remaining tags; decodes the five XML entities plus &nbsp;;
    collapses the whitespace the removals leave behind. Regex-based by
    design — a streaming-parser fidelity bar needs a real parser
    library, but for corpus curation the regex form is the published
    practice and is engine-portable (the DuckDB oracle replays it
    verbatim with regexp_replace)."""
    c = F.col(col)
    c = F.regexp_replace(c, F.lit(_HTML_SCRIPT_RE), F.lit(" "))
    c = F.regexp_replace(c, F.lit(_HTML_STYLE_RE), F.lit(" "))
    c = F.regexp_replace(c, F.lit(_HTML_COMMENT_RE), F.lit(" "))
    c = F.regexp_replace(c, F.lit(_HTML_TAG_RE), F.lit(" "))
    for ent, ch in (
        ("&lt;", "<"),
        ("&gt;", ">"),
        ("&quot;", '"'),
        ("&#39;", "'"),
        ("&apos;", "'"),
        ("&nbsp;", " "),
        ("&amp;", "&"),  # last, so &amp;lt; decodes to &lt; not <
    ):
        c = F.replace(c, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(c, r"\s+", " "))


def extract_links(
    docs: DataFrame, url_col: str = "url", text_col: str = "text"
) -> DataFrame:
    """(src_url, dst_url): absolute http(s) hrefs per HTML document —
    the edge list that turns a crawl into the link graph
    :func:`.graph.domain_link_ranks` ranks (the WARC → links →
    PageRank curation loop).

    Pure column algebra (regexp_extract_all + explode, no shuffle), so
    the DuckDB oracle replays it with the same RE2-class pattern.
    Deliberately absolute-URL-only: resolving relative hrefs against a
    base needs the per-page <base> rules and is noise for DOMAIN-level
    ranking, where intra-site (relative) links are dropped as
    self-links anyway."""
    href = r'href\s*=\s*["\'](https?://[^"\'<>]+)["\']'
    return (
        docs.select(
            F.col(url_col).alias("src_url"),
            F.explode(
                F.regexp_extract_all(F.col(text_col), F.lit(href), 1)
            ).alias("dst_url"),
        )
    )


def html_link_graph(
    docs: DataFrame, url_col: str = "url", text_col: str = "text"
) -> DataFrame:
    """(domain, rank): registered-domain PageRank straight from raw
    HTML documents — composes :func:`extract_links` with
    :func:`.graph.domain_link_ranks`."""
    from .graph import domain_link_ranks

    return domain_link_ranks(extract_links(docs, url_col, text_col))
