"""Connected components over a pair/edge DataFrame — the clustering step
that turns near-duplicate PAIRS (operators/dedup.py) into duplicate
CLUSTERS, so a dedup pipeline can keep exactly one representative per
transitive group instead of greedily dropping pair-members.

The reference has no graph operators (its only join is a key lookup,
`dags/includes/utils.py:27-37`); this is part of the training-data
extension surface (SURVEY.md §7 step 7), where transitive closure over
near-dup pairs is the standard corpus-dedup formulation.

Algorithm: iterative min-label propagation. Every node starts labeled
with itself; each round, each node takes the min label over itself and
its neighbors; at fixpoint, a node's label is the smallest node id in its
connected component (a deterministic, orderable cluster id).

Scale design
------------
* One shuffle per round (the min-label groupBy); the symmetrized edge
  list is cached and re-joined each round. Rounds needed = graph
  diameter — near-dup clusters are almost-cliques (diameter ≤ 2-3), so
  this converges in a handful of rounds. For adversarial long-chain
  graphs, the alternating large-star/small-star algorithm (Kiveris et
  al., "Connected Components in MapReduce and Beyond") halves diameter
  per round (O(log d)); min-label propagation is the right default for
  the dedup workload's graph shape.
* The per-round ``localCheckpoint`` truncates lineage — without it the
  plan doubles every round and Catalyst analysis time dominates beyond
  ~10 rounds. Checkpointed partitions also pin the label table's
  partitioning across rounds, so the propagate join reuses it.
* Convergence is decided by counting changed labels (one small join per
  round over the label table — |nodes| rows, never edges).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(edges: DataFrame, src: str, dst: str,
                         nodes: DataFrame | None = None,
                         max_iter: int = 50) -> DataFrame:
    """Label every node with the min node id reachable from it.

    ``edges`` is undirected input (each pair listed once is enough);
    ``nodes`` optionally supplies the full node universe (single column)
    so isolated nodes appear as singleton clusters — near-dup clustering
    needs this: most documents have no near-duplicate at all.

    Returns (node, label). Unlike the lazy operators in this package this
    runs jobs at call time (an iterative fixpoint cannot be expressed as
    one Catalyst plan); the result is a checkpointed DataFrame.
    """
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
    sym = (e.union(e.select(F.col("d").alias("s"), F.col("s").alias("d")))
           .distinct().cache())
    if nodes is None:
        universe = sym.select(F.col("s").alias("node")).distinct()
    else:
        universe = nodes.toDF("node").distinct()
    labels = universe.select("node", F.col("node").alias("label")) \
        .localCheckpoint()
    for _ in range(max_iter):
        prop = sym.join(labels, sym.s == labels.node) \
            .select(F.col("d").alias("node"), "label")
        new_labels = (prop.union(labels)
                      .groupBy("node").agg(F.min("label").alias("label"))
                      .localCheckpoint())
        changed = (new_labels.alias("n")
                   .join(labels.alias("o"), "node")
                   .filter(F.col("n.label") != F.col("o.label")).count())
        labels = new_labels  # prior checkpoint blocks are freed by the
        # context cleaner once the old DataFrame is unreferenced
        if changed == 0:
            break
    sym.unpersist()
    return labels


def pagerank(edges: DataFrame, src: str, dst: str, iterations: int = 5,
             damping: float = 0.85) -> DataFrame:
    """Fixed-iteration PageRank over an undirected edge list (each pair
    listed once; symmetrized internally). Returns (node, rank) after
    ``iterations`` power steps of r(v) = (1-d) + d·Σ_{u→v} r(u)/deg(u),
    starting from r=1.

    Cross-engine exactness (the q81 oracle replays this in unrolled SQL
    CTEs): each per-edge contribution is QUANTIZED to an integer —
    ``floor(r(u)/deg(u) · 1e9 + 0.5)`` — where every operation is a
    single IEEE double op on identical operands, so both engines
    produce the identical long (no decimal ``round()`` anywhere:
    round-to-N-digits of a double lands on decimal-expansion ties that
    Spark and DuckDB break differently — observed as a 1e-12 flip at
    sf0.1, r6). Integer sums are order-independent; the rank update is
    again pure double ops on identical operands, so the final doubles
    are bit-identical with no output rounding at all.

    Scale: one groupBy shuffle per iteration over the edge list; degree
    is precomputed once and the edge table is persisted (via its local
    checkpoint) across iterations. A fixed small iteration count (not
    convergence detection) bounds the rounds — rank movement past ~5
    rounds is below curation relevance on near-dup graphs.

    Lineage is truncated with a LAZY ``localCheckpoint`` on the edge
    table and on each iteration's rank table (r17 optimization, guide
    §5): without it the returned plan embeds the edge subplan once per
    iteration — over a near-dup pair generator that is a 9,400-operator
    physical plan whose Catalyst analysis/AQE canonicalization alone
    cost ~10 s per run (q81 at sf0.01), all driver-side. With the
    checkpoints each iteration plans against a LogicalRDD (~20 ops).
    The computed work is unchanged; like ``connected_components``, the
    result is no longer a replayable pure plan (the standing trade for
    iterative fixpoints — localCheckpoint also trades executor-loss
    fault tolerance for speed, which a 5-round rank job can afford)."""
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
    sym = (e.union(e.select(F.col("d").alias("s"), F.col("s").alias("d"))))\
        .distinct().cache()
    deg = sym.groupBy("s").agg(F.count(F.lit(1)).alias("deg"))
    adj = sym.join(deg, "s").localCheckpoint(eager=False)
    ranks = deg.select(F.col("s").alias("node"),
                       F.lit(1.0).cast("double").alias("rank"))
    for _ in range(iterations):
        contrib = (
            adj.join(ranks, adj.s == ranks.node)
            .select(F.col("d").alias("node"),
                    F.floor(F.col("rank") / F.col("deg")
                            * F.lit(1000000000.0) + F.lit(0.5))
                    .cast("long").alias("c"))
        )
        ranks = (
            contrib.groupBy("node")
            .agg(F.sum("c").alias("csum"))
            .select("node",
                    (F.lit(1.0 - damping) + F.lit(damping)
                     * (F.col("csum").cast("double")
                        / F.lit(1000000000.0))).alias("rank"))
            .localCheckpoint(eager=False)
        )
    return ranks.select("node", F.col("rank").cast("double").alias("rank"))


def cluster_representatives(edges: DataFrame, src: str, dst: str,
                            nodes: DataFrame) -> DataFrame:
    """Corpus after transitive near-dedup: one keeper (min id) per
    connected component. Equivalent to the min-id-keeper policy of
    ``operators.dedup.drop_near_duplicates`` when clusters are cliques,
    and strictly correct (no over- or under-dropping) when they are not.
    Returns the keeper node ids (single column ``node``)."""
    comps = connected_components(edges, src, dst, nodes)
    return comps.filter(F.col("node") == F.col("label")).select("node")
