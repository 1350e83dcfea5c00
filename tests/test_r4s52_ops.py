"""Session-52: latency trend slope, in/out degree corr, depth vs
conversion."""

from __future__ import annotations

import math

SF = "/root/testdata/sf0.001"


def test_latency_trend_slope_matches_ols(spark):
    from openreviewcrawler_spark.catalog import q_crawl_latency_trend_slope

    rows = {r["host"]: r for r in q_crawl_latency_trend_slope(spark, SF).collect()}
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    import collections

    pts = collections.defaultdict(list)
    for d in docs:
        i = d["doc_id"]
        tail = (i * 7) % 13 < (i % 20) % 4
        y = 2500 + i % 500 if tail else 50 + (i * 97) % 900
        pts[f"{d['source']}.example"].append((i, y))
    assert set(rows) == set(pts)
    for h, xy in pts.items():
        m = len(xy)
        sx = sum(x for x, _ in xy)
        sy = sum(y for _, y in xy)
        sxy = sum(x * y for x, y in xy)
        sxx = sum(x * x for x, _ in xy)
        slope = (m * sxy - sx * sy) / (m * sxx - sx * sx)
        r = rows[h]
        assert r["n_fetches"] == m
        assert r["slope_micro"] == math.floor(slope * 1e6)
        assert r["degrading"] == (1 if r["slope_micro"] > 0 else 0)
    # the modular latency synthesis has no real global trend — slopes
    # stay small either way
    assert all(abs(r["slope_micro"]) < 5_000_000 for r in rows.values())


def test_in_out_degree_corr(spark):
    from openreviewcrawler_spark.catalog import q_graph_in_out_degree_corr

    [row] = q_graph_in_out_degree_corr(spark, SF).collect()
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    edges = {
        (d["doc_id"] % 100, (d["doc_id"] * 7 + 3) % 83)
        for d in docs
        if d["doc_id"] % 100 != (d["doc_id"] * 7 + 3) % 83
    }
    import collections

    outd = collections.Counter(s for s, _ in edges)
    ind = collections.Counter(t for _, t in edges)
    nodes = set(outd) | set(ind)
    assert row["n_nodes"] == len(nodes)
    xs = [outd.get(n, 0) for n in nodes]
    ys = [ind.get(n, 0) for n in nodes]
    m = len(nodes)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    sxx, syy = sum(a * a for a in xs), sum(b * b for b in ys)
    num = m * sxy - sx * sy
    den = math.sqrt(m * sxx - sx * sx) * math.sqrt(m * syy - sy * sy)
    assert abs(row["r_corr"] - math.floor(num / den * 1e6) / 1e6) < 2e-6
    assert -1.0 <= row["r_corr"] <= 1.0


def test_depth_conversion_totals_match_sessionization(spark):
    from openreviewcrawler_spark.catalog import (
        q_event_depth_vs_conversion,
        q_sessionization,
    )

    rows = q_event_depth_vs_conversion(spark, SF).collect()
    n_sessions = sum(
        r["n_sessions"] for r in q_sessionization(spark, SF).collect()
    )
    assert sum(r["n_sessions"] for r in rows) == n_sessions
    for r in rows:
        assert 0 <= r["n_converted"] <= r["n_sessions"]
        assert r["cvr_ppm"] == r["n_converted"] * 1_000_000 // r["n_sessions"]
    assert len(rows) > 1  # depths actually spread across bands
    # deeper sessions convert at least somewhere
    assert any(r["n_converted"] > 0 for r in rows)
