"""Session-73: cache TTL sweep."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_cache_ttl_sweep(spark):
    from openreviewcrawler_spark.catalog import (
        _CACHE_TTL_GRID,
        q_crawl_cache_ttl_sweep,
    )

    rows = {r["ttl"]: r for r in q_crawl_cache_ttl_sweep(spark, SF).collect()}
    assert set(rows) == set(_CACHE_TTL_GRID)
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    import collections

    per = collections.defaultdict(list)
    for d in docs:
        i = d["doc_id"]
        per[i % 150].append(((i * i) % 500, i))
    gaps = []
    for reqs in per.values():
        reqs.sort()
        for (a, _), (b, _) in zip(reqs, reqs[1:]):
            gaps.append(b - a)
    n_req = sum(len(v) for v in per.values())
    for ttl in _CACHE_TTL_GRID:
        hits = sum(1 for g in gaps if g <= ttl)
        r = rows[ttl]
        assert r["n_requests"] == n_req
        assert r["n_cache_hits"] == hits
        assert r["n_origin_fetches"] == n_req - hits
        assert r["hit_ppm"] == hits * 1_000_000 // n_req
    # hit rate grows with TTL and the grid actually separates
    hit = [rows[t]["hit_ppm"] for t in sorted(rows)]
    assert hit[0] < hit[1] < hit[2]
