"""Named-query registry: the engine's public query surface.

Every implemented operator from SURVEY.md §2 is registered here as a
named query ``f(spark, sf_dir) -> DataFrame``, optionally paired with an
ANSI-SQL oracle string that DuckDB runs over the same parquet tables.
``__spark_entry__.py`` (the driver contract) simply re-exports this
registry. Ops whose semantics are not SQL-expressible (streaming state,
ML-pipeline LSH) register without an oracle → driver runs a rows-only
check.

Column-name discipline: the driver's comparator sorts columns by name
and hashes values, so every computed column is aliased identically in
the Spark callable and the oracle SQL.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

#: Local tier: queries oracle-gated by the test suite with the same
#: rigor as QUERIES, but NOT exported through __spark_entry__ — the
#: driver checks at most 50 queries, so redundant demonstrations live
#: here to free slots for distinct operators.
LOCAL_QUERIES: dict[str, QueryFn] = {}
LOCAL_ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register ``fn(spark, sf_dir)`` under ``name``.

    ``oracle`` is the equivalent DuckDB SQL (tables pre-registered as
    views: region nation customer supplier part orders lineitem events
    documents embeddings). None → rows-only check.
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES or name in LOCAL_QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def register_local(
    name: str, oracle: str | None = None
) -> Callable[[QueryFn], QueryFn]:
    """Like :func:`register` but into the local (test-gated) tier."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES or name in LOCAL_QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        LOCAL_QUERIES[name] = fn
        if oracle is not None:
            LOCAL_ORACLES[name] = oracle
        return fn

    return deco


def resolve(name: str) -> QueryFn:
    """Look a query up across BOTH tiers (driver + local).

    Tests, bench, and tooling should use this instead of indexing
    ``QUERIES`` directly: queries rotate between tiers across rounds
    to stay under the driver's 50-slot cap, and a direct ``QUERIES[...]``
    lookup breaks on demotion (round-8 postmortem).
    """
    try:
        return QUERIES[name]
    except KeyError:
        return LOCAL_QUERIES[name]


def resolve_oracle(name: str) -> str:
    """Oracle SQL for ``name`` from either tier (KeyError if none)."""
    try:
        return ORACLES[name]
    except KeyError:
        return LOCAL_ORACLES[name]


def load_all() -> None:
    """Import every query module so registrations run (idempotent)."""
    from .queries import (  # noqa: F401
        wordcount_q,
        relational_q,
        window_q,
        events_q,
        dedup_q,
        similarity_q,
        textstats_q,
        multimodal_q,
        asof_q,
        mapreduce_q,
        sql_q,
        functions_q,
        curation_q,
        urls_q,
        storage_q,
    )
