"""Scalar text-normalization expressions (reference operators O2-O4).

Semantics cite-checked against the reference's map function
(mapreduce/mapreduce.go:33-36):

- tokenize  = ``strings.Fields`` — split on runs of Unicode whitespace,
  never yielding empty tokens (:33).
- normalize = ``strings.ToLower(strings.Trim(word, ".,!?:;\"'"))`` (:35)
  — repeatedly strip any character of the cutset from BOTH ends, then
  lowercase. Internal punctuation survives ("don't" → "don't").
- filter    = drop words empty after trimming (:36).

All three are pure Column expressions → JVM-side, inside whole-stage
codegen; no Python UDF in this hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Exact cutset from mapreduce/mapreduce.go:35 — nothing more, nothing less.
PUNCT_CUTSET = ".,!?:;\"'"
# Same set escaped for a regex character class ('"' needs no escape inside []).
_CUTSET_CLASS = "[.,!?:;\"']"
# Anchored both ends; '+' makes one replace equal to Go's repeated Trim.
TRIM_PATTERN = f"^{_CUTSET_CLASS}+|{_CUTSET_CLASS}+$"


def tokenize(col: Column | str) -> Column:
    """Split on whitespace runs → array<string> (O2, strings.Fields parity).

    ``split`` on ``\\s+`` can emit one leading empty token when the input
    starts with whitespace; downstream empty-filtering (O4) removes it, so
    parity with strings.Fields holds end-to-end.
    """
    return F.split(F.col(col) if isinstance(col, str) else col, r"\s+")


def normalize_word(col: Column | str) -> Column:
    """Trim the punctuation cutset from both ends, then lowercase (O3)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.lower(F.regexp_replace(c, TRIM_PATTERN, ""))
