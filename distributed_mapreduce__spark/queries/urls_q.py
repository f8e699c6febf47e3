"""URL-curation queries (local tier): the web-corpus scrub pipeline —
canonicalize → dedup by canonical URL → per-domain stats — end-to-end
over a url column synthesized deterministically from the documents
table with ONE SQL expression both engines evaluate identically, so
the oracle replays the whole pipeline (parse, canonicalization edge
cases, registered-domain extraction, min-doc_id dedup) in DuckDB.

Local tier: the driver registry is pinned at its 50-query cap;
tests/test_queries_oracle.py::test_local_oracle_match gates this with
the same value-hash rigor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.urls import canonical_url, registered_domain, url_host
from ..registry import register_local
from ..sources.tables import load_table

#: Deterministic synthetic url per document — engine-portable SQL.
#: Exercises: upper/lower scheme+host, a multi-label suffix (co.uk),
#: tracking params (stripped), a real param (kept), fragments, and
#: path collisions (doc_id % 97) so dedup actually removes rows.
URL_EXPR = (
    "CASE WHEN doc_id % 2 = 0 THEN 'HTTPS://WWW.' ELSE 'https://www.' END"
    " || source ||"
    " CASE WHEN doc_id % 7 = 0 THEN '.Example.CO.UK' ELSE '.Example.COM' END"
    " || '/docs/' || CAST(doc_id % 97 AS STRING) ||"
    " CASE WHEN doc_id % 3 = 0 THEN '?utm_source=feed&page=1'"
    "      WHEN doc_id % 3 = 1 THEN '?page=1' ELSE '' END ||"
    " CASE WHEN doc_id % 5 = 0 THEN '#sec' ELSE '' END"
)


@register_local(
    "url_curation",
    oracle=f"""
    WITH urls AS (
      SELECT doc_id, {URL_EXPR} AS url FROM documents
    ),
    parsed AS (
      SELECT doc_id,
        -- canonical_url replay: fragment, tracking params, separator
        -- cleanup, lower scheme://host, default ports, trailing slash
        regexp_replace(regexp_replace(regexp_replace(
          lower(regexp_extract(c4, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))
            || '://'
            || lower(regexp_extract(c4, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1))
            || regexp_replace(c4, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*', '', 'g'),
          '^(http://[^/:?#]+):80(/|$|\\?)', '\\1\\2', 'g'),
          '^(https://[^/:?#]+):443(/|$|\\?)', '\\1\\2', 'g'),
          '^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]+)/$', '\\1', 'g') AS canonical,
        lower(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]+)', 1)) AS host
      FROM (
        -- tracking-param strip runs on the QUERY part only (split at
        -- the first '?'), mirroring operators/urls.py canonical_url
        SELECT doc_id, url,
          CASE WHEN q3 = '' THEN head ELSE head || '?' || q3 END AS c4
        FROM (
          SELECT doc_id, url,
            regexp_replace(defrag, '\\?.*$', '', 'g') AS head,
            regexp_replace(regexp_replace(regexp_replace(
              regexp_replace(regexp_extract(defrag, '\\?(.*)$', 1),
                '(^|&)(utm_[a-z]+|fbclid|gclid|msclkid|ref)=[^&#]*', '\\1', 'g'),
              '^&+', '', 'g'), '&&+', '&', 'g'), '&+$', '', 'g') AS q3
          FROM (SELECT doc_id, url, regexp_replace(url, '#.*$', '', 'g') AS defrag FROM urls)
        )
      )
    ),
    domained AS (
      SELECT doc_id, canonical,
        CASE WHEN len(string_split(host, '.')) <= 2 THEN host
             WHEN len(string_split(host, '.')) >= 3
                  AND (string_split(host, '.'))[-2] || '.'
                      || (string_split(host, '.'))[-1]
                      IN ('co.uk', 'org.uk', 'ac.uk', 'gov.uk', 'com.au',
                          'net.au', 'org.au', 'co.jp', 'ne.jp', 'or.jp',
                          'com.br', 'com.cn', 'com.mx', 'co.in', 'co.kr',
                          'co.nz', 'co.za')
             THEN (string_split(host, '.'))[-3] || '.'
                  || (string_split(host, '.'))[-2] || '.'
                  || (string_split(host, '.'))[-1]
             ELSE (string_split(host, '.'))[-2] || '.'
                  || (string_split(host, '.'))[-1]
        END AS domain
      FROM parsed
    ),
    deduped AS (
      SELECT domain, canonical, min(doc_id) AS kept_doc
      FROM domained GROUP BY domain, canonical
    )
    SELECT domain,
           count(*) AS n_pages,
           min(kept_doc) AS min_doc,
           max(kept_doc) AS max_doc
    FROM deduped GROUP BY domain
    """,
)
def url_curation_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Web-corpus URL scrub end-to-end: synthesize a url per document,
    canonicalize (fragments, tracking params, case, default ports),
    dedup by canonical URL keeping the min doc_id, then per-registered-
    domain page counts. One projection + two short-key shuffles
    (canonical, domain) — linear at crawl scale (operators/urls.py)."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.expr(URL_EXPR).alias("url")
    )
    host = url_host(F.col("url"))
    parsed = docs.select(
        "doc_id",
        canonical_url(F.col("url")).alias("canonical"),
        registered_domain(host).alias("domain"),
    )
    deduped = parsed.groupBy("domain", "canonical").agg(
        F.min("doc_id").alias("kept_doc")
    )
    return deduped.groupBy("domain").agg(
        F.count("*").alias("n_pages"),
        F.min("kept_doc").alias("min_doc"),
        F.max("kept_doc").alias("max_doc"),
    )
