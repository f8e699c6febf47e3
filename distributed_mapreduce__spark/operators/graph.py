"""Connected components over similarity pairs (dedup clustering).

Fuzzy dedup emits PAIRS (a~b); deleting duplicates needs CLUSTERS —
the transitive closure (a~b, b~c ⇒ {a,b,c}) — so each group keeps one
canonical survivor. Two algorithms, same (node, comp) contract:

- ``algorithm="star"`` (default): alternating large-star / small-star
  contraction (Kiveris et al., "Connected Components in MapReduce and
  Beyond", MR-CC). Each round re-wires edges toward per-neighborhood
  minima; the edge set converges to stars centered at component
  minima in O(log² n) rounds REGARDLESS of graph diameter — a
  million-node path converges in a handful of rounds where label
  propagation needs a million. This is the 100 TB shape.
- ``algorithm="label"``: iterative min-label propagation — every node
  starts labeled with itself, each round takes the min label in its
  neighborhood; fixpoint = components. Rounds = graph diameter: fine
  for shallow near-dup clusters (stars/cliques around a popular
  document), raises on adversarially deep chains.

Iterative dataflow on Spark needs two disciplines this module
demonstrates (they're what separates a toy loop from one that runs at
scale):

- **Lineage truncation**: each round's output is ``localCheckpoint``-ed.
  Without it, round N's plan contains all N-1 prior joins — planning
  time and stage graphs grow without bound and long jobs die on
  driver OOM, not data size.
- **Driver-side control only for the convergence test**: the loop's
  data path is joins/aggregations; the driver sees one count per
  round (labels changed / edges changed), never data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _canonical(edges: DataFrame) -> DataFrame:
    """Undirected edge set as distinct (u, v) with u > v, no loops."""
    return (
        edges.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _large_star(edges: DataFrame) -> DataFrame:
    """Connect every strictly-larger neighbor of u to min(Γ⁺(u)).

    Operates on the bidirected view; output is canonical (the emitted
    (v, m) always has v > u ≥ m)."""
    bidir = edges.unionByName(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    mins = (
        bidir.groupBy("u")
        .agg(F.min("v").alias("mv"))
        .select("u", F.least("u", "mv").alias("m"))
    )
    return (
        bidir.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Re-wire every smaller-or-equal neighborhood member to its min.

    Input must be canonical (u > v): N(u) = smaller neighbors; with
    m = min(N(u)), emit (w, m) for w ∈ N(u) ∪ {u}, w ≠ m."""
    mins = edges.groupBy("u").agg(F.min("v").alias("m"))
    j = edges.join(mins, "u")
    rewired = j.select(F.col("v").alias("u"), F.col("m").alias("v")).unionByName(
        j.select("u", "m").distinct().select("u", F.col("m").alias("v"))
    )
    return rewired.filter(F.col("u") != F.col("v")).distinct()


def connected_components(
    pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 25,
    algorithm: str = "star",
) -> DataFrame:
    """(node, comp): component id = min node id reachable from ``node``.

    ``pairs`` is an undirected edge list (isolated nodes don't appear —
    callers union them back if every input row needs a component).
    Raises if the fixpoint isn't reached in ``max_iter`` rounds — with
    the default star contraction that bound is log²-many rounds and
    effectively unreachable; with ``algorithm="label"`` it means the
    graph is deeper than near-dup-shaped."""
    if algorithm == "star":
        return _components_star(pairs, src, dst, max_iter)
    if algorithm == "label":
        return _components_label(pairs, src, dst, max_iter)
    raise ValueError(f"unknown algorithm {algorithm!r}")


def _components_star(
    pairs: DataFrame, src: str, dst: str, max_iter: int
) -> DataFrame:
    raw = pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    nodes = (
        raw.select("u")
        .unionByName(raw.select(F.col("v").alias("u")))
        .distinct()
        .select(F.col("u").alias("node"))
        .localCheckpoint()
    )
    edges = _canonical(raw).localCheckpoint()
    for _ in range(max_iter):
        nxt = _small_star(_large_star(edges)).localCheckpoint()
        # Convergence: edge-set fixpoint (stars centered at minima).
        changed = (
            nxt.exceptAll(edges).count() + edges.exceptAll(nxt).count()
        )
        edges = nxt
        if changed == 0:
            # Star edges are (member, root); roots label themselves.
            comp = edges.groupBy(F.col("u").alias("node")).agg(
                F.min("v").alias("comp")
            )
            return nodes.join(comp, "node", "left").select(
                "node", F.coalesce("comp", "node").alias("comp")
            )
    raise RuntimeError(f"no fixpoint after {max_iter} star rounds")


def _components_label(
    pairs: DataFrame, src: str, dst: str, max_iter: int
) -> DataFrame:
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


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    max_iter: int = 100,
    tol: float = 1e-6,
) -> DataFrame:
    """(node, rank): PageRank over a directed edge list; ranks sum to 1.

    The web-crawl curation signal: CommonCrawl-derived training sets
    weight / filter pages by link centrality (harmonic or PageRank) of
    their host — the classic "is this domain worth keeping" score that
    complements per-document quality heuristics. This is the standard
    power iteration with uniform teleport and dangling-mass
    redistribution:

        r'(v) = (1-d)/N + d * (Σ_{u→v} r(u)/outdeg(u) + D/N)

    where D = Σ r(u) over dangling nodes (no out-links). Parallel
    (duplicate) edges are collapsed first, so the transition matrix is
    the unweighted out-neighbor uniform distribution.

    Scale shape (the disciplines of this module, see module docstring):

    - Per round: ONE shuffle for the contribution aggregation
      (groupBy dst) plus an equi-join ranks⋈out_deg that reuses the
      node hash partitioning; the dangling total and the L1
      convergence delta ride as 1-row broadcast aggregates /
      driver scalars — the driver never sees data rows.
    - ``localCheckpoint`` truncates lineage every round; without it
      round N replans N-1 prior joins.
    - Rounds are data-independent (fixed-point iteration), so wall
      time is O(max_iter × one-shuffle) regardless of graph diameter.

    Raises if ``tol`` isn't reached in ``max_iter`` rounds (PageRank
    contracts at rate ``damping``, so ``max_iter ≥ log(tol)/log(d)``
    always converges — at d=0.85, tol=1e-6 needs ≤ 86 rounds; the
    default 100 covers it with margin. A tighter ``tol`` needs a
    matching ``max_iter``).
    """
    fwd = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).filter(
        F.col("u").isNotNull() & F.col("v").isNotNull()
    )
    e = fwd.distinct().localCheckpoint()
    nodes = (
        e.select("u")
        .unionByName(e.select(F.col("v").alias("u")))
        .distinct()
        .select(F.col("u").alias("node"))
        .localCheckpoint()
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    out_deg = e.groupBy(F.col("u").alias("node")).agg(
        F.count("*").alias("outdeg")
    )
    # (node, rank, outdeg) — outdeg NULL marks a dangling node. The
    # join is computed once; each round only the rank column changes.
    state = (
        nodes.join(out_deg, "node", "left")
        .withColumn("rank", F.lit(1.0 / n))
        .localCheckpoint()
    )
    delta = float("inf")
    for _ in range(max_iter):
        dangling = state.filter(F.col("outdeg").isNull()).agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dmass")
        )
        contrib = (
            e.join(
                state.select(
                    F.col("node").alias("u"),
                    (F.col("rank") / F.col("outdeg")).alias("share"),
                ),
                "u",
            )
            .groupBy(F.col("v").alias("node"))
            .agg(F.sum("share").alias("inflow"))
        )
        new_state = (
            state.join(contrib, "node", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                "outdeg",
                F.col("rank").alias("old_rank"),
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping)
                    * (
                        F.coalesce("inflow", F.lit(0.0))
                        + F.col("dmass") / F.lit(float(n))
                    )
                ).alias("rank"),
            )
            .localCheckpoint()
        )
        delta = new_state.agg(
            F.sum(F.abs(F.col("rank") - F.col("old_rank")))
        ).first()[0]
        state = new_state.drop("old_rank")
        if delta < tol:
            return state.select("node", "rank")
    raise RuntimeError(
        f"pagerank: L1 delta {delta:.3g} > tol {tol:g} after "
        f"{max_iter} rounds"
    )


def domain_link_ranks(
    links: DataFrame, src_url: str = "src_url", dst_url: str = "dst_url"
) -> DataFrame:
    """(domain, rank): PageRank over the REGISTERED-DOMAIN graph built
    from page-level links — the host-aggregation that makes crawl-graph
    centrality usable as a per-document curation feature (join it back
    on the document's domain).

    Self-links (intra-domain navigation) are dropped before ranking so
    boilerplate nav bars don't inflate a domain's own score."""
    from .urls import registered_domain, url_host

    pairs = links.select(
        registered_domain(url_host(F.col(src_url))).alias("src"),
        registered_domain(url_host(F.col(dst_url))).alias("dst"),
    ).filter(F.col("src") != F.col("dst"))
    return pagerank(pairs).select(
        F.col("node").alias("domain"), "rank"
    )
