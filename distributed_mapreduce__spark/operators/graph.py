"""Connected components over similarity pairs (dedup clustering).

Fuzzy dedup emits PAIRS (a~b); deleting duplicates needs CLUSTERS —
the transitive closure (a~b, b~c ⇒ {a,b,c}) — so each group keeps one
canonical survivor. ``connected_components`` is iterative min-label
propagation: every node starts labeled with itself; each round, every
node takes the min label in its neighborhood; fixpoint = components.

Iterative dataflow on Spark needs two disciplines this module
demonstrates (they're what separates a toy loop from one that runs at
scale):

- **Lineage truncation**: each round's labels are ``localCheckpoint``-ed.
  Without it, round N's plan contains all N-1 prior joins — planning
  time and stage graphs grow without bound and long jobs die on
  driver OOM, not data size.
- **Driver-side control only for the convergence test**: the loop's
  data path is joins/aggregations; the driver sees one count per
  round (the number of changed labels), never data.

Rounds needed = graph diameter, and near-dup clusters are
shallow (stars/cliques around a popular document) — a handful of
rounds in practice. Production-hardened variants (large-star/
small-star) reduce rounds on adversarial chains; the propagation loop
here is the same dataflow shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 25,
) -> DataFrame:
    """(node, comp): component id = min node id reachable from ``node``.

    ``pairs`` is an undirected edge list (isolated nodes don't appear —
    callers union them back if every input row needs a component).
    Raises if the fixpoint isn't reached in ``max_iter`` rounds (a
    chain that deep means the input isn't near-dup-shaped — use a
    star-contraction variant instead)."""
    fwd = pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    edges = (
        fwd.unionByName(fwd.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .distinct()
        .localCheckpoint()
    )
    labels = (
        edges.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("comp", F.col("node"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        neigh = edges.join(
            labels, edges["u"] == labels["node"]
        ).select(F.col("v").alias("node"), "comp")
        new_labels = (
            neigh.unionByName(labels)
            .groupBy("node")
            .agg(F.min("comp").alias("comp"))
            .localCheckpoint()  # truncate: next round plans from HERE
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.comp") != F.col("o.comp"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels
    raise RuntimeError(f"no fixpoint after {max_iter} rounds")


def dedup_survivors(
    docs: DataFrame, pairs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Documents minus non-canonical near-duplicates: cluster the pair
    graph, keep the min-id member of each cluster, pass through every
    unpaired document untouched."""
    comp = connected_components(pairs)
    losers = comp.filter(F.col("node") != F.col("comp")).select(
        F.col("node").alias(id_col)
    )
    return docs.join(losers, id_col, "left_anti")
