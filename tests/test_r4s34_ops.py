"""Session-34 operators: distance histogram, user type diversity,
value/activity correlation, pagination mining."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_distance_histogram_partitions_the_universe(spark):
    from openreviewcrawler_spark.catalog import (
        q_graph_bfs_depth,
        q_graph_distance_histogram,
    )

    rows = {r["depth"]: r for r in q_graph_distance_histogram(spark, SF).collect()}
    reached = q_graph_bfs_depth(spark, SF).collect()
    import collections

    per_depth = collections.Counter(r["depth"] for r in reached)
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    uni = {d["doc_id"] % 100 for d in docs} | {
        (d["doc_id"] * 7 + 3) % 83 for d in docs
    }
    # every depth row matches the BFS rollup, -1 row = universe leftover
    for d, n in per_depth.items():
        assert rows[d]["n_nodes"] == n
    assert rows[-1]["n_nodes"] == len(uni) - len(reached)
    assert rows[-1]["n_nodes"] > 0  # nodes 84-99 are never link targets
    assert sum(r["n_nodes"] for r in rows.values()) == len(uni)
    for r in rows.values():
        assert r["node_share_ppm"] == r["n_nodes"] * 1_000_000 // len(uni)


def test_hhi_bounds_and_recount(spark):
    from openreviewcrawler_spark.catalog import q_event_user_type_diversity

    rows = {r["user_id"]: r for r in q_event_user_type_diversity(spark, SF).collect()}
    assert rows
    ev = spark.read.parquet(f"{SF}/events.parquet").collect()
    import collections

    per = collections.defaultdict(collections.Counter)
    for e in ev:
        per[e["user_id"]][e["event_type"]] += 1
    assert set(rows) == set(per)
    for u, c in per.items():
        r = rows[u]
        n = sum(c.values())
        s2 = sum(v * v for v in c.values())
        assert (r["n_events"], r["n_types"]) == (n, len(c))
        assert r["hhi_ppm"] == s2 * 1_000_000 // (n * n)
        # HHI lives in [1/k, 1] scaled to ppm
        assert 1_000_000 // len(c) <= r["hhi_ppm"] + 1
        assert r["hhi_ppm"] <= 1_000_000


def test_value_activity_corr_matches_numpy(spark):
    import math

    from openreviewcrawler_spark.catalog import q_event_value_vs_activity_corr

    [row] = q_event_value_vs_activity_corr(spark, SF).collect()
    ev = spark.read.parquet(f"{SF}/events.parquet").collect()
    from decimal import ROUND_HALF_UP, Decimal

    import collections

    per = collections.defaultdict(lambda: [0, Decimal(0)])
    for e in ev:
        a = per[e["user_id"]]
        a[0] += 1
        a[1] += Decimal(e["value"]).quantize(
            Decimal("0.0001"), rounding=ROUND_HALF_UP
        )
    xs = [a[0] for a in per.values()]
    ys = [int(math.floor(a[1] * 100)) for a in per.values()]
    assert row["n_users"] == len(xs)
    m = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx, syy = sum(x * x for x in xs), sum(y * y for y in ys)
    num = m * sxy - sx * sy
    den = math.sqrt(m * sxx - sx * sx) * math.sqrt(m * syy - sy * sy)
    ref = math.floor(num / den * 1e6) / 1e6
    assert abs(row["r_corr"] - ref) < 2e-6
    assert -1.0 <= row["r_corr"] <= 1.0


def test_pagination_detect_finds_both_idioms(spark):
    from openreviewcrawler_spark.catalog import q_url_pagination_detect

    rows = q_url_pagination_detect(spark, SF).collect()
    assert rows
    for r in rows:
        # 3 of every 5 synthesized URLs are paginated
        assert 0 < r["n_paginated"] < r["n_urls"]
        assert r["max_page"] <= 39
        assert r["page_cap"] == min(r["max_page"], 10)
    # deep query-pagination exists somewhere, so the cap actually binds
    assert any(r["max_page"] > 10 for r in rows)
