"""Fixed-iteration PageRank frontier prioritization: hand-checkable graphs
plus the cross-engine exactness property the oracle relies on."""

from __future__ import annotations

import pytest

from openreviewcrawler_spark.operators.rank import link_rank


def _ranks(spark, edges, nodes, **kw):
    e = spark.createDataFrame(edges, "src long, dst long")
    n = spark.createDataFrame([(x,) for x in nodes], "node long")
    return {r["node"]: r["rank"] for r in link_rank(e, n, **kw).collect()}


def test_star_graph_center_dominates(spark):
    # 1..4 all link to 0; 0 links to 1. Center must outrank every leaf, and
    # leaf 1 (the only one receiving 0's mass) outranks leaves 2-4.
    edges = [(1, 0), (2, 0), (3, 0), (4, 0), (0, 1)]
    r = _ranks(spark, edges, range(5))
    assert r[0] > r[1] > r[2]
    assert r[2] == r[3] == r[4]


def test_sink_and_isolated_nodes_keep_rows(spark):
    # 0 -> 1 (1 is a sink); 2 is isolated. Both keep rows: sink accumulates,
    # isolated sits at the teleport floor (1 - damping).
    r = _ranks(spark, [(0, 1)], range(3), n_iter=2)
    assert set(r) == {0, 1, 2}
    assert r[2] == pytest.approx(0.15)
    assert r[1] > r[0] == pytest.approx(0.15)


def test_one_iteration_closed_form(spark):
    # two nodes pointing at each other: after 1 iter from rank 1.0,
    # rank = 0.15 + 0.85 * (1.0 / 1) = 1.0 for both.
    r = _ranks(spark, [(0, 1), (1, 0)], range(2), n_iter=1)
    assert r[0] == r[1] == pytest.approx(1.0)


def test_iterations_are_deterministic_across_reruns(spark):
    edges = [(i % 7, (i * 3 + 1) % 7) for i in range(30) if i % 7 != (i * 3 + 1) % 7]
    a = _ranks(spark, edges, range(7))
    b = _ranks(spark, edges, range(7))
    assert a == b  # bit-identical, not approx: decimal-sum recipe


def test_personalized_rank_concentrates_mass_near_seed(spark):
    from openreviewcrawler_spark.operators.rank import link_rank_personalized

    # chain 0 -> 1 -> 2 -> 3, seed {0}: rank decays along the chain and
    # unreachable-from-seed node 9 gets zero
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (9, 0)], "src int, dst int"
    )
    nodes = spark.createDataFrame([(i,) for i in (0, 1, 2, 3, 9)], "node int")
    seeds = spark.createDataFrame([(0,)], "node int")
    out = {r["node"]: r["rank"]
           for r in link_rank_personalized(edges, nodes, seeds, n_iter=3).collect()}
    # fixed-iteration PPR is a travelling wave, not the converged decay:
    # hand recurrence r(0)=0.15, r(1)=0.85*0.15, r(2)=0.85^2*0.15,
    # r(3)=0.85^3 (the initial unit mass arrives at hop 3 on iteration 3)
    assert out[0] == pytest.approx(0.15, abs=2e-6)
    assert out[1] == pytest.approx(0.85 * 0.15, abs=2e-6)
    assert out[2] == pytest.approx(0.85**2 * 0.15, abs=2e-6)
    assert out[3] == pytest.approx(0.85**3, abs=2e-6)
    assert out[9] == 0.0  # no teleport, no inlinks from seed side
