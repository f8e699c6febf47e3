"""Line-level cleaning (operators/lines.py): full DuckDB replay of the
C4/CCNet pipeline on a constructed multi-line corpus, stated-semantics
assertions for every rule, keep-first line dedup parity on the real
fixture corpus, and strip_html engine parity + contracts."""

from __future__ import annotations

import os

import duckdb
import pytest

from distributed_mapreduce__spark.operators.lines import (
    clean_lines,
    dedup_lines,
    doc_lines,
    strip_html,
)

from .conftest import SF_ORACLE
from .oracle_utils import compare_query

# One corpus exercising every rule. Lines are crafted so the C4
# defaults (min_words=5, terminal punct, 'javascript' line blocklist,
# 'lorem ipsum'/'{' doc blocklist, corpus dedup, min_lines=3) each
# fire at least once.
_BANNER = "We use cookies to improve your browsing experience today."
_DOCS = [
    # doc 0: clean page — banner's first occurrence, survives intact.
    (
        0,
        "\n".join(
            [
                _BANNER,
                "The quick brown fox jumps over the lazy dog.",
                "A second proper sentence keeps this page alive!",
                'He said: "Is this quoted line kept too?"',
            ]
        ),
    ),
    # doc 1: banner repeats (dropped by dedup) but keeps 3 own lines.
    (
        1,
        "\n".join(
            [
                _BANNER,
                "Entirely original first sentence for page one.",
                "short line.",  # < 5 words → filtered
                "no terminal punctuation here at all",  # filtered
                "Please enable JavaScript to view the comments.",  # blocklist
                "Entirely original second sentence for page one.",
                "Entirely original third sentence for page one?",
            ]
        ),
    ),
    # doc 2: banner repeat + only 2 surviving lines → page dropped.
    (
        2,
        "\n".join(
            [
                _BANNER,
                "This page only has two real sentences, sadly.",
                "Here is the second and final real sentence.",
            ]
        ),
    ),
    # doc 3: 'lorem ipsum' page → dropped wholesale.
    (
        3,
        "Lorem ipsum dolor sit amet is placeholder text everywhere.\n"
        "Even a perfectly good sentence cannot save this page.",
    ),
    # doc 4: curly-bracket (code) page → dropped wholesale.
    (4, "function f() { return 1; }\nA sentence that will not matter."),
    # doc 5: duplicate of doc 0's fox line + enough own content.
    (
        5,
        "\n".join(
            [
                "The quick brown fox jumps over the lazy dog.",
                "Completely different content lives on this page.",
                "It even has a third well formed sentence.",
                "And a fourth one for good measure, naturally.",
            ]
        ),
    ),
]

_CLEAN_ORACLE = """
WITH base AS (
  SELECT * FROM docs
  WHERE NOT contains(lower(text), 'lorem ipsum')
    AND NOT contains(lower(text), '{')
), lines AS (
  SELECT doc_id, generate_subscripts(p, 1) - 1 AS line_no, unnest(p) AS line
  FROM (SELECT doc_id, string_split(text, chr(10)) AS p FROM base)
), kept AS (
  SELECT * FROM lines
  WHERE (CASE WHEN trim(line) = '' THEN 0
         ELSE len(string_split(regexp_replace(trim(line), '\\s+', ' ', 'g'), ' '))
         END) >= 5
    AND regexp_matches(trim(line), '[.!?]["”]?\\s*$')
    AND NOT contains(lower(line), 'javascript')
), deduped AS (
  SELECT doc_id, line_no, line FROM (
    SELECT *, row_number() OVER (
      PARTITION BY md5(line) ORDER BY doc_id, line_no) AS rn
    FROM kept)
  WHERE rn = 1
)
SELECT doc_id,
       string_agg(line, chr(10) ORDER BY line_no) AS text,
       count(*) AS n_lines
FROM deduped GROUP BY doc_id HAVING count(*) >= 3
"""


@pytest.fixture(scope="module")
def corpus_path(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("lines") / "docs.parquet")
    spark.createDataFrame(_DOCS, "doc_id long, text string").coalesce(
        1
    ).write.parquet(path)
    return path


def _duck(path: str, sql: str):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW docs AS SELECT * FROM '{path}/*.parquet'")
    res = con.execute(sql)
    cols = [c[0] for c in res.description]
    rows = res.fetchall()
    con.close()
    return cols, rows


def test_clean_lines_full_duckdb_replay(spark, corpus_path):
    got = {
        r["doc_id"]: (r["text"], r["n_lines"])
        for r in clean_lines(spark.read.parquet(corpus_path)).collect()
    }
    cols, rows = _duck(corpus_path, _CLEAN_ORACLE)
    want = {r[0]: (r[1], r[2]) for r in rows}
    assert cols == ["doc_id", "text", "n_lines"]
    assert got == want


def test_clean_lines_stated_semantics(spark, corpus_path):
    out = {
        r["doc_id"]: r["text"]
        for r in clean_lines(spark.read.parquet(corpus_path)).collect()
    }
    # Blocklisted pages and the too-short page are gone.
    assert set(out) == {0, 1, 5}
    # doc 0 keeps all four lines including the quoted one, in order.
    assert out[0].splitlines() == [
        _BANNER,
        "The quick brown fox jumps over the lazy dog.",
        "A second proper sentence keeps this page alive!",
        'He said: "Is this quoted line kept too?"',
    ]
    # The banner survives ONLY at its first occurrence (doc 0).
    assert _BANNER in out[0] and _BANNER not in out[1]
    # doc 1's filtered lines are gone; its three originals remain.
    assert out[1].splitlines() == [
        "Entirely original first sentence for page one.",
        "Entirely original second sentence for page one.",
        "Entirely original third sentence for page one?",
    ]
    # doc 5 lost the fox line to doc 0 but keeps its three own lines.
    assert out[5].splitlines() == [
        "Completely different content lives on this page.",
        "It even has a third well formed sentence.",
        "And a fourth one for good measure, naturally.",
    ]


def test_dedup_lines_fixture_parity(spark):
    """On the real (single-line) fixture corpus, keep-first line dedup
    must equal keep-first document dedup — replayed in DuckDB."""
    docs = spark.read.parquet(os.path.join(SF_ORACLE, "documents.parquet"))
    df = dedup_lines(doc_lines(docs)).select("doc_id", "line")
    compare_query(
        spark,
        SF_ORACLE,
        df,
        """
        WITH lines AS (
          SELECT doc_id, generate_subscripts(p, 1) - 1 AS line_no,
                 unnest(p) AS line
          FROM (SELECT doc_id, string_split(text, chr(10)) AS p
                FROM documents)
        )
        SELECT doc_id, line FROM (
          SELECT *, row_number() OVER (
            PARTITION BY md5(line) ORDER BY doc_id, line_no) AS rn
          FROM lines)
        WHERE rn = 1
        """,
    )


_HTML_DOCS = [
    (0, "<html><body><p>Hello <b>world</b>!</p></body></html>"),
    (1, "<script type='text/js'>var x = '<p>not text</p>';</script>Real text."),
    (2, "<style>p { color: red; }</style>Styled page body here."),
    (3, "<!-- a comment with <b>tags</b> inside -->Visible part."),
    (4, "Entities: a &lt;tag&gt; &amp; &quot;quotes&quot; &amp;lt; stays."),
    (5, "No markup at all, just text."),
    (6, "Multi\nline <div\nclass='x'>content</div> here."),
]


def test_strip_html_contracts(spark):
    df = spark.createDataFrame(_HTML_DOCS, "doc_id long, text string")
    out = {
        r["doc_id"]: r["clean"]
        for r in df.select("doc_id", strip_html().alias("clean")).collect()
    }
    assert out[0] == "Hello world !"
    assert out[1] == "Real text."  # script content swallowed
    assert out[2] == "Styled page body here."  # style content swallowed
    assert out[3] == "Visible part."  # comment (with tags inside) gone
    # &amp;lt; decodes to literal &lt;, not to '<' (single-pass decode).
    assert out[4] == 'Entities: a <tag> & "quotes" &lt; stays.'
    assert out[5] == "No markup at all, just text."
    assert out[6] == "Multi line content here."  # tag spanning a newline


def test_strip_html_duckdb_parity(spark, tmp_path):
    path = str(tmp_path / "html.parquet")
    spark.createDataFrame(_HTML_DOCS, "doc_id long, text string").coalesce(
        1
    ).write.parquet(path)
    got = dict(
        spark.read.parquet(path)
        .select("doc_id", strip_html().alias("clean"))
        .collect()
    )
    _, rows = _duck(
        path,
        r"""
        SELECT doc_id, trim(regexp_replace(
          replace(replace(replace(replace(replace(replace(replace(
            regexp_replace(regexp_replace(regexp_replace(regexp_replace(
              text,
              '(?is)<script\b[^>]*>.*?</script\s*>', ' ', 'g'),
              '(?is)<style\b[^>]*>.*?</style\s*>', ' ', 'g'),
              '(?s)<!--.*?-->', ' ', 'g'),
              '(?s)</?[a-zA-Z!][^>]*>', ' ', 'g'),
            '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', ''''),
            '&apos;', ''''), '&nbsp;', ' '), '&amp;', '&'),
          '\s+', ' ', 'g')) AS clean
        FROM docs
        """,
    )
    assert got == dict(rows)
