"""Large-star/small-star connected components vs union-find oracle."""

import random

import pytest

from lexis_minhash_spark.operators.cc import large_star_small_star
from lexis_minhash_spark import oracle as O


def _random_graph(seed: int, n_nodes: int, n_edges: int) -> set[tuple[int, int]]:
    rng = random.Random(seed)
    edges = set()
    nodes = rng.sample(range(n_nodes * 10), n_nodes)
    for _ in range(n_edges):
        a, b = rng.sample(nodes, 2)
        edges.add((min(a, b), max(a, b)))
    return edges


class TestLargeStarSmallStar:
    @pytest.mark.parametrize("seed,n_nodes,n_edges", [(1, 50, 60), (2, 200, 150), (3, 100, 400)])
    def test_matches_union_find(self, spark, seed, n_nodes, n_edges):
        edges = _random_graph(seed, n_nodes, n_edges)
        df = spark.createDataFrame(sorted(edges), "a long, b long")
        got = {r.doc_id: r.cluster_id for r in large_star_small_star(df).collect()}
        exp = O.oracle_connected_components(edges)
        nodes = {x for e in edges for x in e}
        assert set(got) == nodes
        for n in nodes:
            assert got[n] == exp.get(n, n), n

    def test_chain_graph(self, spark):
        # path graph: worst case for naive propagation, fine for LS/SS
        edges = [(i, i + 1) for i in range(0, 60)]
        df = spark.createDataFrame(edges, "a long, b long")
        got = {r.doc_id: r.cluster_id for r in large_star_small_star(df).collect()}
        assert all(v == 0 for v in got.values())
        assert len(got) == 61

    def test_two_components_and_selfloops(self, spark):
        df = spark.createDataFrame(
            [(5, 1), (1, 3), (10, 12), (7, 7)], "a long, b long"
        )
        got = {r.doc_id: r.cluster_id for r in large_star_small_star(df).collect()}
        assert got[1] == got[3] == got[5] == 1
        assert got[10] == got[12] == 10
        assert 7 not in got  # self-loop dropped; caller treats as singleton

    def test_star_graph_hub_no_neighbor_arrays(self, spark):
        # round-3 verdict item #4: a hub node (one giant near-dup cluster)
        # must not funnel its whole neighborhood into one aggregation row.
        # Correctness on a 100k-spoke star + plan assertion that neither
        # star transform materializes a per-node array.
        from lexis_minhash_spark.operators.cc import _large_star, _small_star

        n = 100_000
        hub = spark.range(1, n + 1).selectExpr("CAST(1000000 AS LONG) AS a", "id AS b")
        for stage in (_large_star, _small_star):
            plan = stage(hub)._jdf.queryExecution().executedPlan().toString()
            assert "collect_set" not in plan, plan
            assert "ObjectHashAggregate" not in plan, plan
        got = {r.doc_id: r.cluster_id for r in large_star_small_star(hub).collect()}
        assert len(got) == n + 1
        assert all(v == 1 for v in got.values())
