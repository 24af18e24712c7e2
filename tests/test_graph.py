"""Connected components (operators/graph.py): fixpoint correctness on
known topologies, singleton handling, and determinism."""

from __future__ import annotations

from airflow_pipelines_from_mongo_to_postgres_spark.operators import graph


def _components(spark, edges, nodes):
    e = spark.createDataFrame(edges, "src long, dst long")
    n = spark.createDataFrame([(x,) for x in nodes], "node long")
    out = graph.connected_components(e, "src", "dst", nodes=n)
    return {(r.node, r.label) for r in out.collect()}


def test_chain_converges_past_diameter_one(spark):
    # 0-1-2-3-4 chain: min label must propagate the full diameter.
    got = _components(spark, [(i, i + 1) for i in range(4)], range(5))
    assert got == {(i, 0) for i in range(5)}


def test_two_components_and_singletons(spark):
    got = _components(spark, [(1, 2), (2, 3), (10, 11)], [1, 2, 3, 10, 11, 99])
    assert got == {(1, 1), (2, 1), (3, 1), (10, 10), (11, 10), (99, 99)}


def test_edge_direction_irrelevant(spark):
    # Edges listed high->low: symmetrization must still pull labels down.
    got = _components(spark, [(5, 4), (4, 3)], [3, 4, 5])
    assert got == {(3, 3), (4, 3), (5, 3)}


def test_representatives_one_per_cluster(spark):
    e = spark.createDataFrame([(1, 2), (2, 3), (10, 11)], "src long, dst long")
    n = spark.createDataFrame([(x,) for x in [1, 2, 3, 10, 11, 99]], "node long")
    keepers = graph.cluster_representatives(e, "src", "dst", n)
    assert {r.node for r in keepers.collect()} == {1, 10, 99}


def test_pagerank_symmetry_and_hub(spark):
    """On a symmetric triangle all ranks are equal; adding a pendant node
    attached to one vertex makes that vertex the top-ranked hub."""
    from airflow_pipelines_from_mongo_to_postgres_spark.operators.graph import pagerank

    tri = spark.createDataFrame([(1, 2), (2, 3), (1, 3)], ["a", "b"])
    r = {row.node: row.rank for row in pagerank(tri, "a", "b").collect()}
    assert len(set(r.values())) == 1        # perfect symmetry

    star = spark.createDataFrame([(1, 2), (2, 3), (1, 3), (3, 4)], ["a", "b"])
    r2 = {row.node: row.rank for row in pagerank(star, "a", "b").collect()}
    assert max(r2, key=r2.get) == 3         # the vertex with the pendant
    assert abs(sum(r2.values()) - len(r2)) < 0.2   # mass approximately conserved
