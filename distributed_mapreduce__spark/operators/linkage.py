"""Approximate string join (record linkage / entity resolution).

"Join customers to suppliers where the name is within 2 edits" is the
classic fuzzy-key join; the naive form is an all-pairs Levenshtein —
quadratic and untenable. The standard scale shape (Gravano et al.
2001, "Approximate string joins in a database (almost) for free") is
the same candidate-restrict pattern as the engine's LSH/Misra–Gries
families:

1. **q-gram blocking** — explode each (padded) key into positional
   q-grams; candidate pairs are keys sharing ≥ 1 gram, counted per
   pair by one equi-join on the gram. COUNT FILTERING then prunes by
   the theorem: ``ed(s,t) ≤ d`` ⇒ the pair shares at least
   ``max(|s|,|t|) + 2(q-1) - q·(1 + d)`` padded grams (each edit
   destroys at most q grams of the ``#``-padded string). The
   threshold is evaluated per pair (never below 1 — sharing zero
   grams never generates a candidate).
2. **exact verify** — ``levenshtein() ≤ d`` on the candidates only.
   Both engines ship the same Levenshtein, so the WHOLE operator
   replays in the DuckDB oracle.

Completeness: exact for every pair whose padded-gram floor stays ≥ 1,
i.e. whenever ``min(|s|,|t|) ≥ q·(1+d) - 2(q-1) + ...`` — in practice
with q=2: every key of length ≥ 2d. Shorter keys (a 1-char name at
d=2) can differ in EVERY gram; they are the documented blind spot —
filter or handle them driver-side (there are at most |Σ|^(q·d) such
degenerate keys). The test gate proves exact equality with the
brute-force all-pairs join on fixture + planted-typo data.

Scale: grams shuffle as (gram, key) pairs — key strings, not rows;
hot grams (e.g. ``"an"`` in names) fan out like hot shingles and AQE's
skew join splits them. The verify join touches candidates only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fuzzy_key_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    max_distance: int = 2,
    q: int = 2,
) -> DataFrame:
    """(left_key, right_key, distance ≤ max_distance): all
    cross-product pairs within the edit-distance budget, via q-gram
    blocking + count filtering + exact Levenshtein verify (module
    docstring). Keys are compared as DISTINCT strings — join the
    result back to recover rows. NULL keys never match."""
    d, qq = int(max_distance), int(q)
    if d < 0 or qq < 1:
        raise ValueError(f"need max_distance >= 0 and q >= 1, got {d}, {qq}")
    pad = "#" * (qq - 1)

    def grams(df: DataFrame, key: str, side: str, pos_name: str) -> DataFrame:
        # (pos, gram) STRUCTS, not packed strings — keys containing the
        # would-be separator must not corrupt the parse
        arr = F.expr(
            f"transform(sequence(1, greatest(length(concat('{pad}', {side}, "
            f"'{pad}')) - {qq - 1}, 1)), "
            f"i -> struct(i AS pos, "
            f"substring(concat('{pad}', {side}, '{pad}'), i, {qq}) AS g))"
        )
        return (
            df.select(F.col(key).cast("string").alias(side))
            .filter(F.col(side).isNotNull())
            .distinct()
            .select(side, F.explode(arr).alias("pg"))
            .select(side, F.col("pg.pos").alias(pos_name), F.col("pg.g").alias("g"))
        )

    lg = grams(left, left_key, "lkey", "lpos")
    rg = grams(right, right_key, "rkey", "rpos")
    # positional grams within a +-d window: an edit shifts positions by
    # at most d, so matching grams with |lpos-rpos|<=d keeps the count
    # bound valid while pruning far-apart accidental matches
    shared = (
        lg.join(rg, "g")
        .filter(F.abs(F.col("lpos") - F.col("rpos")) <= F.lit(d))
        .groupBy("lkey", "rkey")
        .agg(F.count("*").alias("n_shared"))
    )
    # count-filter: ed <= d needs >= padded_len_max - q*(1+d) + ... >= 1
    # shared grams; floor at 1 (sharing zero grams never got here)
    padded_len = lambda c: F.length(c) + F.lit(2 * (qq - 1))  # noqa: E731
    floor = F.greatest(
        F.greatest(padded_len(F.col("lkey")), padded_len(F.col("rkey")))
        - F.lit(qq - 1)
        - F.lit(qq * d),
        F.lit(1),
    )
    return (
        shared.filter(F.col("n_shared") >= floor)
        .withColumn("distance", F.levenshtein(F.col("lkey"), F.col("rkey")))
        .filter(F.col("distance") <= F.lit(d))
        .select(
            F.col("lkey").alias(left_key + "_l"),
            F.col("rkey").alias(right_key + "_r"),
            "distance",
        )
    )
