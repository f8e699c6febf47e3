"""Property tests: Spark tokenize/normalize vs a Python port of the Go
semantics (SURVEY.md §5.3).

Go reference (mapreduce/mapreduce.go:33-36):
    for word in strings.Fields(content):
        w = strings.ToLower(strings.Trim(word, ".,!?:;\"'"))
        if w != "": emit(w)

Python port: ``content.split()`` == strings.Fields for ASCII input;
``str.strip(cutset)`` == strings.Trim (both strip any char of the set,
repeatedly, from both ends). Alphabet restricted to ASCII (excluding
\\x0b\\x0c) because Java/RE2 ``\\s`` and Go ``unicode.IsSpace`` diverge
on vertical tab and exotic unicode spaces — not present in fixtures.
"""

from __future__ import annotations

from collections import Counter

from hypothesis import given, settings, strategies as st

from distributed_mapreduce__spark.functions.textnorm import PUNCT_CUTSET


def go_wordcount(texts: list[str]) -> Counter:
    c: Counter = Counter()
    for t in texts:
        for tok in t.split():
            w = tok.strip(PUNCT_CUTSET).lower()
            if w:
                c[w] += 1
    return c


ALPHABET = st.sampled_from(
    list("abcXYZ01 \t\n.,!?:;\"'-_()don't--x--")
)
TEXTS = st.lists(st.text(ALPHABET, max_size=60), min_size=1, max_size=20)


def spark_wordcount(spark, texts: list[str]) -> Counter:
    from distributed_mapreduce__spark.operators.wordcount import word_counts

    df = spark.createDataFrame([(t,) for t in texts], ["value"])
    return Counter({r["word"]: r["cnt"] for r in word_counts(df).collect()})


def test_fixed_adversarial_cases(spark):
    texts = [
        "  leading and trailing  ",
        "don't stop...",
        "--x-- 'quoted' \"double\" !!bang!! ...",
        "'''", "?!.,;:\"'",
        "a.b,c  A.B,C",
        "tab\tsep\nnewline sep",
        "", "   ",
        "word, word. word! WORD? 'word'",
    ]
    assert spark_wordcount(spark, texts) == go_wordcount(texts)


@settings(max_examples=15, deadline=None)
@given(TEXTS)
def test_property_matches_go_semantics(spark, texts):
    assert spark_wordcount(spark, texts) == go_wordcount(texts)
