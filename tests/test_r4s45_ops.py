"""Session-45: diameter estimate, matryoshka energy, winsorized mean."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_diameter_estimate_double_sweep(spark):
    from openreviewcrawler_spark.catalog import (
        q_graph_bfs_depth,
        q_graph_diameter_estimate,
    )

    [row] = q_graph_diameter_estimate(spark, SF).collect()
    s1 = q_graph_bfs_depth(spark, SF).collect()
    far1 = min(
        (r for r in s1 if r["depth"] == max(x["depth"] for x in s1)),
        key=lambda r: r["node"],
    )
    assert (row["far_node_1"], row["depth_1"]) == (far1["node"], far1["depth"])
    # python BFS from far1 over the same edge set
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    import collections

    adj = collections.defaultdict(set)
    for d in docs:
        s, t = d["doc_id"] % 100, (d["doc_id"] * 7 + 3) % 83
        if s != t:
            adj[s].add(t)
    dist = {far1["node"]: 0}
    frontier = [far1["node"]]
    for depth in range(1, 9):
        nxt = []
        for n in frontier:
            for m in adj[n]:
                if m not in dist:
                    dist[m] = depth
                    nxt.append(m)
        frontier = nxt
    dmax = max(dist.values())
    far2 = min(n for n, d2 in dist.items() if d2 == dmax)
    assert (row["far_node_2"], row["diameter_lb"]) == (far2, dmax)
    # the second sweep never shrinks the known eccentricity lower bound
    assert row["diameter_lb"] >= 0


def test_matryoshka_energy_monotone_and_exact(spark):
    import math

    from openreviewcrawler_spark.catalog import (
        _MRL_PREFIXES,
        q_embedding_matryoshka_energy,
    )

    rows = {r["p"]: r for r in q_embedding_matryoshka_energy(spark, SF).collect()}
    assert set(rows) == set(_MRL_PREFIXES)
    vecs = spark.read.parquet(f"{SF}/embeddings.parquet").collect()
    import collections

    agg = collections.defaultdict(list)
    for v in vecs:
        e = [float(x) for x in v["embedding"]]
        tot = 0.0
        for x in e:
            tot += x * x
        for p in _MRL_PREFIXES:
            part = 0.0
            for x in e[:p]:
                part += x * x
            agg[p].append(int(math.floor(part / tot * 1_000_000)))
    for p, ppms in agg.items():
        r = rows[p]
        assert r["n_vectors"] == len(ppms)
        assert r["mean_energy_ppm"] == sum(ppms) // len(ppms)
        assert r["min_energy_ppm"] == min(ppms)
    # energy grows with prefix width and tops out below the whole
    means = [rows[p]["mean_energy_ppm"] for p in sorted(rows)]
    assert means == sorted(means)
    assert means[-1] <= 1_000_000


def test_winsorized_mean_is_robust(spark):
    from openreviewcrawler_spark.catalog import q_event_value_winsorized_mean

    rows = q_event_value_winsorized_mean(spark, SF).collect()
    assert rows
    for r in rows:
        assert r["lo_cents"] <= r["hi_cents"]
        assert r["lo_cents"] <= r["winsorized_mean_cents"] <= r["hi_cents"]
        assert r["n_clipped"] > 0  # p05/p95 clamps always touch the tails
        assert r["n_clipped"] < r["n_events"] // 2
    # winsorization pulls the mean toward the body on a right-skewed
    # value distribution for at least some types
    assert any(
        r["winsorized_mean_cents"] != r["mean_cents"] for r in rows
    )
