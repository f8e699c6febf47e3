"""Plan-inspection helpers: programmatic access to the physical plan for
tests and tuning (broadcast-join presence, pushdown checks, codegen
coverage) — the engine's replacement for eyeballing the Spark UI."""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """The explain output as a string (instead of stdout)."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def physical_summary(df: DataFrame) -> dict[str, int]:
    """Counts of scale-relevant physical operators in the executed plan.

    After AQE finalization the plan string carries BOTH '== Final Plan =='
    and '== Initial Plan ==' sections — only the final one is counted."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    return {
        "broadcast_hash_join": plan.count("BroadcastHashJoin"),
        "sort_merge_join": plan.count("SortMergeJoin"),
        # the quadratic shapes — any non-oracle operator asserting
        # scale-safety should pin these to 0
        "nested_loop_join": plan.count("BroadcastNestedLoopJoin"),
        "cartesian_product": plan.count("CartesianProduct"),
        "shuffle_exchange": plan.count("Exchange hashpartitioning")
        + plan.count("Exchange rangepartitioning")
        + plan.count("Exchange RoundRobinPartitioning"),
        # codegen spans print as "WholeStageCodegen (n)" in formatted mode
        # and as "*(n) " stage markers in tree mode
        "wholestage_codegen": plan.count("WholeStageCodegen")
        + len(set(re.findall(r"\*\((\d+)\)", plan))),
        "pushed_filters": plan.count("PushedFilters: ["),
    }
