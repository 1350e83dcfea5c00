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


def test_kcore_clique_survives_tail_peels(spark):
    from openreviewcrawler_spark.operators.rank import kcore

    # 4-clique {0,1,2,3} plus a tail 3-4-5: the tail peels off in two
    # rounds (5 first, then 4), the clique survives a 3-core with
    # in-core degree 3 each.
    edges = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3), (3, 4), (4, 5)]
    e = spark.createDataFrame(edges, "src long, dst long")
    out = {r["node"]: r["core_deg"] for r in kcore(e, k=3, n_rounds=4).collect()}
    assert out == {0: 3, 1: 3, 2: 3, 3: 3}


def test_kcore_spark_matches_unrolled_sql(spark):
    import duckdb

    from openreviewcrawler_spark.operators.rank import kcore, kcore_sql

    edges = [(i % 11, (i * 5 + 2) % 11) for i in range(40)]
    edges = [e for e in edges if e[0] != e[1]]
    e = spark.createDataFrame(edges, "src long, dst long")
    got = sorted(
        (r["node"], r["core_deg"]) for r in kcore(e, k=2, n_rounds=3).collect()
    )
    cte = " union all ".join(
        f"select {a} as src, {b} as dst" for a, b in edges
    )
    want = sorted(duckdb.sql(kcore_sql(cte, k=2, n_rounds=3)).fetchall())
    assert got == want


def test_assortativity_star_is_negative_and_exact(spark):
    import duckdb

    from openreviewcrawler_spark.operators.rank import (
        assortativity,
        assortativity_sql,
    )

    # star: hub degree 5, leaves degree 1 -> perfectly disassortative
    edges = [(0, i) for i in range(1, 6)]
    e = spark.createDataFrame(edges, "src long, dst long")
    row = assortativity(e).collect()[0]
    assert row["n_endpoints"] == 10
    assert row["r_assort"] == -1.0
    cte = " union all ".join(f"select {a} as src, {b} as dst" for a, b in edges)
    want = duckdb.sql(assortativity_sql(cte)).fetchall()[0]
    assert (row["n_endpoints"], row["r_assort"]) == want


def test_assortativity_regular_graph_is_null(spark):
    from openreviewcrawler_spark.operators.rank import assortativity

    # 3-cycle: every degree equal -> zero variance -> NULL (guarded div)
    e = spark.createDataFrame([(0, 1), (1, 2), (2, 0)], "src long, dst long")
    row = assortativity(e).collect()[0]
    assert row["r_assort"] is None


def test_clustering_coeff_triangle_plus_tail(spark):
    import duckdb

    from openreviewcrawler_spark.operators.rank import (
        clustering_coeff,
        clustering_coeff_sql,
    )

    # triangle {0,1,2} + pendant 2-3: nodes 0,1 have coeff 1.0; node 2 has
    # deg 3, one triangle -> 2/(3*2) = 0.333333; node 3 deg 1 -> excluded.
    edges = [(0, 1), (1, 2), (2, 0), (2, 3)]
    e = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: (r["deg"], r["n_tri"], r["coeff"])
           for r in clustering_coeff(e).collect()}
    assert got[0] == (2, 1, 1.0) and got[1] == (2, 1, 1.0)
    assert got[2] == (3, 1, 0.333333)
    assert 3 not in got
    cte = " union all ".join(f"select {a} as src, {b} as dst" for a, b in edges)
    want = {r[0]: (r[1], r[2], r[3])
            for r in duckdb.sql(clustering_coeff_sql(cte)).fetchall()}
    assert got == want
