"""Exact substring dedup (ExactSubstr): full DuckDB oracle replay of
gram counting → island merge → span extraction → keep-one stripping,
on planted boilerplate shapes AND the real sf0.001 documents (whose
tiny vocabulary makes duplicated grams dense — a merging stress test).
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from distributed_mapreduce__spark.operators.substring_dedup import (
    repeated_spans,
    strip_repeated_spans,
)
from distributed_mapreduce__spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"

BOILER = "all rights reserved no part may be reproduced without permission"
_DOCS = [
    # boilerplate pasted into two otherwise-distinct docs
    (1, f"intro one {BOILER} body alpha beta gamma"),
    (2, f"different opening here {BOILER} closing words now"),
    # intra-doc repeat (the same 8+ tokens twice in ONE doc)
    (3, "x1 x2 x3 x4 x5 x6 x7 x8 filler x1 x2 x3 x4 x5 x6 x7 x8"),
    # overlapping/adjacent duplicated coverage
    (4, f"{BOILER} {BOILER}"),
    # short doc (< k tokens) and clean doc
    (5, "too short"),
    (6, "completely unique sentence with none of the shared phrasing at all"),
]


def _oracle(rows, k):
    """DuckDB replay with identical semantics; returns (spans, cleaned)."""
    con = duckdb.connect()
    con.execute("CREATE TABLE docs (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO docs VALUES (?, ?)", rows)
    con.execute(
        f"""
        CREATE TABLE toks AS
        SELECT d.doc_id, d.t[i.i] AS tok, i.i - 1 AS pos
        FROM (SELECT doc_id, regexp_extract_all(text, '\\S+') AS t FROM docs) d,
             LATERAL (SELECT unnest(generate_series(1, len(d.t))) AS i) i
        """
    )
    con.execute(
        f"""
        CREATE TABLE grams AS
        SELECT d.doc_id, i.i - 1 AS pos,
               md5(array_to_string(list_slice(t, i.i, i.i + {k} - 1), ' ')) AS gram
        FROM (SELECT doc_id, regexp_extract_all(text, '\\S+') AS t FROM docs) d,
             LATERAL (SELECT unnest(generate_series(1, len(d.t) - {k} + 1)) AS i) i
        """
    )
    con.execute(
        f"""
        CREATE TABLE spans AS
        WITH dup AS (
          SELECT gram FROM grams GROUP BY gram HAVING count(*) >= 2
        ),
        pos AS (
          SELECT g.doc_id, g.pos FROM grams g JOIN dup USING (gram)
        ),
        isl AS (
          SELECT doc_id, pos,
                 CASE WHEN max(pos + {k}) OVER (PARTITION BY doc_id ORDER BY pos
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
                      OR pos > max(pos + {k}) OVER (PARTITION BY doc_id ORDER BY pos
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
          SELECT doc_id, min(pos) AS span_start, max(pos) + {k} AS span_end
          FROM num GROUP BY doc_id, island
        )
        SELECT e.doc_id, e.span_start, e.span_end,
               array_to_string(list_slice(regexp_extract_all(d.text, '\\S+'),
                   e.span_start + 1, e.span_end), ' ') AS span_text,
               md5(array_to_string(list_slice(regexp_extract_all(d.text, '\\S+'),
                   e.span_start + 1, e.span_end), ' ')) AS span_hash
        FROM ext e JOIN docs d USING (doc_id)
        """
    )
    spans = con.execute(
        "SELECT doc_id, span_start, span_end, span_text FROM spans "
        "ORDER BY doc_id, span_start"
    ).fetchall()
    cleaned = con.execute(
        """
        WITH cuts AS (
          SELECT doc_id, span_start, span_end,
                 row_number() OVER (PARTITION BY span_hash
                                    ORDER BY doc_id, span_start) AS rk
          FROM spans
        ),
        kept AS (
          SELECT t.doc_id, t.pos, t.tok
          FROM toks t
          WHERE NOT EXISTS (
            SELECT 1 FROM cuts c
            WHERE c.rk > 1 AND c.doc_id = t.doc_id
              AND t.pos >= c.span_start AND t.pos < c.span_end
          )
        )
        SELECT d.doc_id,
               coalesce(string_agg(k.tok, ' ' ORDER BY k.pos), '') AS text
        FROM docs d LEFT JOIN kept k USING (doc_id)
        GROUP BY d.doc_id ORDER BY d.doc_id
        """
    ).fetchall()
    con.close()
    return spans, dict(cleaned)


def _spark_spans(spark, rows, k):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = repeated_spans(df, k=k).collect()
    return sorted((r.doc_id, r.span_start, r.span_end, r.span_text) for r in got)


@pytest.mark.parametrize("k", [3, 8])
def test_planted_shapes_match_oracle(spark, k):
    want_spans, want_clean = _oracle(_DOCS, k)
    assert _spark_spans(spark, _DOCS, k) == want_spans
    df = spark.createDataFrame(_DOCS, "doc_id long, text string")
    got_clean = {
        r.doc_id: r.text for r in strip_repeated_spans(df, k=k).collect()
    }
    assert got_clean == want_clean


def test_planted_semantics(spark):
    # the k=8 behavior a user expects, stated directly (not via oracle)
    df = spark.createDataFrame(_DOCS, "doc_id long, text string")
    spans = repeated_spans(df, k=8)
    by_doc = {
        r.doc_id: (r.span_start, r.span_end, r.span_text)
        for r in spans.collect()
    }
    # boilerplate found in both docs 1 and 2 with exactly its extent
    assert by_doc[1][2] == BOILER and by_doc[2][2] == BOILER
    # intra-doc repeat found twice -> one merged span? positions 0-7 and
    # 9-16 are disjoint (gap at 8) -> doc 3 keeps two spans
    n3 = spans.filter(F.col("doc_id") == 3).count()
    assert n3 == 2
    # short and clean docs produce no spans
    assert 5 not in by_doc and 6 not in by_doc
    # every span is at least k tokens long
    bad = spans.filter(F.col("span_end") - F.col("span_start") < 8)
    assert bad.count() == 0

    stripped = strip_repeated_spans(df, k=8)
    rows = {r.doc_id: r for r in stripped.collect()}
    # doc 1 holds the canonical boilerplate (min doc_id): unchanged
    assert rows[1].text == _DOCS[0][1] and rows[1].n_stripped_tokens == 0
    # doc 2 lost exactly the boilerplate tokens
    assert BOILER not in rows[2].text
    assert rows[2].n_stripped_tokens == len(BOILER.split())
    # untouched docs pass through verbatim
    assert rows[5].text == "too short" and rows[6].n_stripped_tokens == 0


def test_fixture_corpus_matches_oracle(spark):
    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    rows = [(r.doc_id, r.text) for r in docs.collect()]
    want_spans, want_clean = _oracle(rows, 8)
    assert _spark_spans(spark, rows, 8) == want_spans
    got_clean = {
        r.doc_id: r.text for r in strip_repeated_spans(docs, k=8).collect()
    }
    assert got_clean == want_clean
    # sanity: the tiny-vocab corpus really does exercise the operator
    assert len(want_spans) > 0


def test_plan_shape_no_quadratic_join(spark):
    """The scale claims, pinned on the executed plan: no nested-loop
    or sort-merge join anywhere (gram matching is a window count, span
    text and strip cuts attach via hash joins), and the pipeline's
    shuffles stay bounded (gram hash, doc windows, removal group —
    not O(N²) pair expansion)."""
    from distributed_mapreduce__spark.plans.inspect import physical_summary

    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    for fn in (repeated_spans, strip_repeated_spans):
        df = fn(docs, k=8)
        df.write.format("noop").mode("overwrite").save()
        s = physical_summary(df)
        assert s["nested_loop_join"] == 0, (fn.__name__, s)
        assert s["cartesian_product"] == 0, (fn.__name__, s)
        # strip's final docs⋈removals equi-join on doc_id may plan as
        # a sort-merge join — linear, key-partitioned, and the right
        # call at scale where the per-doc cut lists need not fit a
        # broadcast. What must never appear is a non-equi/quadratic
        # join (asserted above); spans itself stays SMJ-free.
        allowed_smj = 1 if fn is strip_repeated_spans else 0
        assert s["sort_merge_join"] <= allowed_smj, (fn.__name__, s)
        assert s["shuffle_exchange"] <= 8, (fn.__name__, s)


def test_null_text_passes_through_as_null(spark):
    df = spark.createDataFrame(
        [(1, None), (2, "some plain words here")], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in strip_repeated_spans(df, k=8).collect()}
    assert rows[1].text is None and rows[1].n_stripped_tokens == 0
    assert rows[2].text == "some plain words here"
    assert repeated_spans(df, k=8).count() == 0


def test_novelty_scores_match_duckdb(spark):
    from distributed_mapreduce__spark.operators.substring_dedup import (
        novelty_scores,
    )

    rows = _DOCS + [(7, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_grams, r.n_novel, r.novelty)
        for r in novelty_scores(df, k=8).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE docs (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO docs VALUES (?, ?)", rows)
    want = dict(
        con.execute(
            """
            WITH g AS (
              SELECT d.doc_id,
                     md5(array_to_string(list_slice(t, i.i, i.i + 7), ' ')) AS gram
              FROM (SELECT doc_id, regexp_extract_all(text, '\\S+') AS t
                    FROM docs WHERE text IS NOT NULL) d,
                   LATERAL (SELECT unnest(generate_series(1, len(d.t) - 7)) AS i) i
            ),
            c AS (SELECT gram, count(*) AS n FROM g GROUP BY gram)
            SELECT d.doc_id,
                   (count(g.gram), count(*) FILTER (WHERE c.n = 1),
                    count(*) FILTER (WHERE c.n = 1)
                      / nullif(count(g.gram), 0)::DOUBLE)
            FROM docs d
            LEFT JOIN g USING (doc_id)
            LEFT JOIN c USING (gram)
            GROUP BY d.doc_id
            """
        ).fetchall()
    )
    con.close()
    for doc_id, (wn, wnov, wratio) in want.items():
        gn, gnov, gratio = got[doc_id]
        assert (gn, gnov) == (wn, wnov), doc_id
        if wratio is None:
            assert gratio is None
        else:
            assert gratio == pytest.approx(wratio, abs=1e-12)
    # semantic spot checks: the unique doc scores 1.0; the doubled-
    # boilerplate doc sits strictly below the unique doc (its in-copy
    # grams are duplicated; only the copy-boundary-crossing grams are
    # novel); short/null docs have no gram support
    assert got[6][2] == 1.0
    assert 0 < got[4][2] < got[6][2]
    assert got[5] == (0, 0, None) and got[7] == (0, 0, None)
