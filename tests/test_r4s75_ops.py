"""Session-75: fairness trend."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_fairness_trend(spark):
    from openreviewcrawler_spark.catalog import q_crawl_fairness_trend

    rows = {r["hour_b"]: r for r in q_crawl_fairness_trend(spark, SF).collect()}
    assert len(rows) > 100
    ev = spark.read.parquet(f"{SF}/events.parquet").collect()
    import collections

    cells = collections.Counter()
    for e in ev:
        h = int(e["ts"].timestamp() * 1000) // 3600000
        cells[(h, e["user_id"] % 7)] += 1
    per_hour = collections.defaultdict(list)
    for (h, _), x in cells.items():
        per_hour[h].append(x)
    assert set(rows) == set(per_hour)
    for h, xs in per_hour.items():
        r = rows[h]
        s, ss, n = sum(xs), sum(x * x for x in xs), len(xs)
        assert r["n_hosts_active"] == n
        assert r["n_fetches"] == s
        assert r["jain_ppm"] == s * s * 1_000_000 // (n * ss)
        # Jain lives in [1/n, 1]
        assert 1_000_000 // n <= r["jain_ppm"] <= 1_000_000
    # sparse hours are trivially fair (one host = 1.0); busy hours vary
    assert any(r["jain_ppm"] == 1_000_000 for r in rows.values())
    assert any(r["jain_ppm"] < 1_000_000 for r in rows.values())
