"""Curation-pipeline registered queries: the LLM-training-data
operators promoted into the driver-checked surface (round 4) — PII
scrubbing, domain-mixture resampling, the filter-funnel report, and
token packing. Each oracle replays the ENTIRE pipeline in DuckDB (the
same SQL the dedicated test files prove on planted fixtures), so the
driver's value hash covers the operator end-to-end, not a projection
of it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.funnel import funnel_report
from ..operators.lines import clean_lines
from ..operators.mixture import resample_to_mixture
from ..operators.packing import pack_into_chunks
from ..operators.pii import PII_CLASSES, pii_scrub
from ..operators.repetition import dup_word_frac
from ..registry import register, register_local
from ..sources.tables import load_table


def _pii_oracle() -> str:
    counts = ", ".join(
        f"CAST(len(regexp_extract_all(text, '{p}')) AS INTEGER) AS n_{n}"
        for n, p, _ in PII_CLASSES
    )
    red = "text"
    for _, p, mask in PII_CLASSES:
        red = f"regexp_replace({red}, '{p}', '{mask}', 'g')"
    return f"SELECT doc_id, {counts}, {red} AS redacted FROM documents"


@register("pii_scrub", oracle=_pii_oracle())
def pii_scrub_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Detect + redact pattern-shaped PII (emails, IPv4s, phone-shaped
    digit runs) over the document corpus: per-doc counts on the
    original text, masked text out. Pure Java∩RE2 regexp column
    algebra — per-row, zero shuffle, scan-speed at 100 TB
    (operators/pii.py)."""
    return pii_scrub(load_table(spark, sf_dir, "documents"))


# hash_uniform replayed in SQL: 60-bit md5 digit fold → [0,1) uniform
# (same construction the sampling family's oracles use).
_MD5_LONG = """
  list_reduce(list_transform(generate_series(1, 15),
      i -> CAST(strpos('0123456789abcdef',
                substring(md5('0:' || CAST(doc_id AS VARCHAR)), i, 1)) - 1 AS BIGINT)),
    (a, b) -> a * 16 + b)
"""
_UNIFORM = f"CAST(({_MD5_LONG}) % 1048576 AS DOUBLE) / 1048576.0"

#: Target mixture for the registered query: zh deliberately unlisted →
#: dropped (the "exclude this domain" case); de is the binding group.
_MIX_WEIGHTS = {"en": 0.5, "de": 0.2, "es": 0.2, "fr": 0.1}
_MIX_VALUES = ", ".join(
    f"('{g}', CAST({w / sum(_MIX_WEIGHTS.values())!r} AS DOUBLE))"
    for g, w in _MIX_WEIGHTS.items()
)


@register(
    "mixture_resample",
    oracle=f"""
    WITH w(lang, p) AS (VALUES {_MIX_VALUES}),
    counts AS (
      SELECT lang, count(*) AS n FROM documents GROUP BY lang
    ),
    joined AS (SELECT c.lang, n, p FROM counts c JOIN w USING (lang)),
    t AS (SELECT min(n / p) AS t FROM joined),
    rates AS (
      SELECT lang, (p * t.t) / n AS rate FROM joined CROSS JOIN t
    )
    SELECT doc_id, d.lang AS lang
    FROM documents d JOIN rates USING (lang)
    WHERE {_UNIFORM} < rate
    """,
)
def mixture_resample_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic domain-mixture resampling: downsample each language
    to a 50/20/20/10 en/de/es/fr target (zh excluded), keeping the
    maximum attainable corpus. Acceptance is content-addressed
    (md5-hash uniform per doc_id) so the kept-row SET — not just its
    size — is bit-reproducible cross-engine; the oracle recomputes the
    identical n/p → min → (p·T)/n float chain and hash decisions
    (operators/mixture.py)."""
    docs = load_table(spark, sf_dir, "documents")
    return resample_to_mixture(
        docs, "lang", _MIX_WEIGHTS, F.col("doc_id").cast("string")
    ).select("doc_id", "lang")


def _funnel_rules():
    return [
        ("min_chars", F.length("text") >= 30),
        (
            "min_tokens",
            F.size(
                F.split(F.regexp_replace(F.trim("text"), r"\s+", " "), " ")
            )
            >= 8,
        ),
        ("dup_words", dup_word_frac() <= 0.4),
    ]


@register(
    "funnel_report",
    oracle="""
    WITH scored AS (
      SELECT doc_id,
             length(text) >= 30 AS b1,
             len(string_split(regexp_replace(trim(text), '\\s+', ' ', 'g'), ' ')) >= 8 AS b2,
             (CASE WHEN len(string_split(regexp_replace(trim(text), '\\s+', ' ', 'g'), ' ')) <= 0
                   THEN 0.0
                   ELSE CAST(1 AS DOUBLE)
                        - len(list_distinct(string_split(regexp_replace(trim(text), '\\s+', ' ', 'g'), ' ')))
                          / len(string_split(regexp_replace(trim(text), '\\s+', ' ', 'g'), ' '))
              END) <= 0.4 AS b3
      FROM documents
    ), tagged AS (
      SELECT CASE WHEN NOT b1 THEN 'min_chars'
                  WHEN NOT b2 THEN 'min_tokens'
                  WHEN NOT b3 THEN 'dup_words' END AS reason
      FROM scored
    ), drops AS (
      SELECT
        count(*) AS n_total,
        count(*) FILTER (reason = 'min_chars') AS d1,
        count(*) FILTER (reason = 'min_tokens') AS d2,
        count(*) FILTER (reason = 'dup_words') AS d3
      FROM tagged
    )
    SELECT 1 AS rule_idx, 'min_chars' AS rule, n_total AS n_in,
           d1 AS n_dropped, n_total - d1 AS n_out FROM drops
    UNION ALL
    SELECT 2, 'min_tokens', n_total - d1, d2, n_total - d1 - d2 FROM drops
    UNION ALL
    SELECT 3, 'dup_words', n_total - d1 - d2, d3, n_total - d1 - d2 - d3
    FROM drops
    """,
)
def funnel_report_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter-funnel accounting over a three-rule curation chain
    (length floor, token floor, repetition cap): one corpus pass tags
    each doc with its first failing rule, one rule-cardinality
    aggregation derives per-rule (n_in, n_dropped, n_out). The oracle
    replays the sequential CASE attribution and running subtraction
    (operators/funnel.py)."""
    docs = load_table(spark, sf_dir, "documents")
    return funnel_report(docs, _funnel_rules())


_NTOK = """
  len(list_filter(string_split(regexp_replace(trim(text), '\\s+', ' ', 'g'), ' '),
                  t -> t <> ''))
"""
_PACK_BUDGET = 256


@register(
    "pack_chunks",
    oracle=f"""
    WITH w AS (SELECT doc_id, CAST({_NTOK} AS BIGINT) AS n_tokens FROM documents),
    offs AS (
      SELECT doc_id, n_tokens,
             CAST(coalesce(sum(n_tokens) OVER
                 (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
               0) AS BIGINT) AS "offset"
      FROM w WHERE n_tokens > 0
    )
    SELECT unnest(generate_series("offset" // {_PACK_BUDGET},
                                  ("offset" + n_tokens - 1) // {_PACK_BUDGET})) AS chunk_id,
           doc_id, n_tokens, "offset"
    FROM offs
    """,
)
def pack_chunks_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token packing into fixed 256-token chunks with GLOBAL offsets:
    a two-pass distributed prefix sum (per-partition cumsum + a
    partition-count-sized prefix table broadcast back) assigns every
    document an exact corpus-order token offset without ever running a
    global single-partition window; boundary-spanning docs appear in
    every chunk they overlap. The oracle's single-window cumsum must
    match the distributed offsets exactly (operators/packing.py)."""
    docs = load_table(spark, sf_dir, "documents")
    return pack_into_chunks(docs, _PACK_BUDGET)


_LINE_DEDUP_ORACLE = """
WITH lines AS (
  SELECT doc_id, generate_subscripts(p, 1) - 1 AS line_no, unnest(p) AS line
  FROM (SELECT doc_id, string_split(text, chr(10)) AS p FROM documents)
), kept AS (
  SELECT * FROM lines
  WHERE (CASE WHEN trim(line) = '' THEN 0
         ELSE len(string_split(regexp_replace(trim(line), '\\s+', ' ', 'g'), ' '))
         END) >= 1
), deduped AS (
  SELECT doc_id, line_no, line FROM (
    SELECT *, row_number() OVER (
      PARTITION BY md5(line) ORDER BY doc_id, line_no) AS rn
    FROM kept)
  WHERE rn = 1
)
SELECT doc_id,
       string_agg(line, chr(10) ORDER BY line_no) AS text,
       CAST(count(*) AS BIGINT) AS n_lines
FROM deduped GROUP BY doc_id HAVING count(*) >= 1
"""


@register("line_dedup_docs", oracle=_LINE_DEDUP_ORACLE)
def line_dedup_docs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style corpus-wide line dedup over the document corpus
    (operators/lines.py): explode to lines, keep-first dedup keyed on
    md5(line) with min (doc_id, line_no) canonical, reassemble docs,
    report surviving line counts. Filters relaxed (min_words=1, no
    punctuation/blocklist rules) so the query is meaningful on the
    single-line fixture corpus — there it reduces to keep-first exact
    document dedup, which the oracle replays line-level anyway. The
    full C4 rule set is exercised on multi-line corpora in
    tests/test_lines.py."""
    docs = load_table(spark, sf_dir, "documents")
    return clean_lines(
        docs,
        min_words=1,
        require_terminal_punct=False,
        line_blocklist=(),
        doc_blocklist=(),
        dedup=True,
        min_lines=1,
    )


_ES_U = """
  (CAST((list_reduce(list_transform(generate_series(1, 15),
      i -> CAST(strpos('0123456789abcdef',
                substring(md5('0:' || CAST(doc_id AS VARCHAR)), i, 1)) - 1 AS BIGINT)),
    (a, b) -> a * 16 + b)) % 1048576 + 1 AS DOUBLE) / 1048576.0)
"""

_WEIGHTED_SAMPLE_ORACLE = f"""
SELECT doc_id, lang, n_chars FROM (
  SELECT doc_id, lang, n_chars, row_number() OVER (
    PARTITION BY lang ORDER BY -ln({_ES_U}) / n_chars) AS rn
  FROM documents WHERE n_chars > 0)
WHERE rn <= 20
"""


@register_local("weighted_sample_docs", oracle=_WEIGHTED_SAMPLE_ORACLE)
def weighted_sample_docs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted corpus subsampling (operators/sampling.py
    weighted_sample): 20 documents per language, selected without
    replacement with inclusion pressure ∝ n_chars via the
    Efraimidis-Spirakis exponential rank over a content-addressed
    uniform — deterministic under retries, replayed exactly by the
    oracle. Local tier: the driver's 50 slots are spoken for; the
    operator's full gate set lives in tests/test_sampling.py."""
    from ..operators.sampling import weighted_sample

    docs = load_table(spark, sf_dir, "documents")
    return weighted_sample(
        docs, F.col("doc_id"), "n_chars", 20, group_cols=["lang"]
    ).select("doc_id", "lang", "n_chars")
