"""Session-63: status class mix, local peak detection."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_status_class_mix(spark):
    from openreviewcrawler_spark.catalog import q_crawl_status_class_mix

    rows = {r["host"]: r for r in q_crawl_status_class_mix(spark, SF).collect()}
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    import collections

    exp = collections.defaultdict(lambda: [0, 0, 0, 0, 0])
    for d in docs:
        r = (d["doc_id"] * 11) % 100
        cls = 2 if r < 70 else 3 if r < 80 else 4 if r < 90 else 5
        a = exp[f"{d['source']}.example"]
        a[0] += 1
        a[cls - 1] += 1
    assert set(rows) == set(exp)
    for h, (n, n2, n3, n4, n5) in exp.items():
        r = rows[h]
        assert (r["n_fetches"], r["n_2xx"], r["n_3xx"], r["n_4xx"], r["n_5xx"]) == (n, n2, n3, n4, n5)
        assert r["healthy_ppm"] == n2 * 1_000_000 // n
        assert r["n_2xx"] + r["n_3xx"] + r["n_4xx"] + r["n_5xx"] == n
    # per-host orbits differ: every host serves 2xx, all four classes
    # occur globally, and at least one host is missing some class
    assert all(r["n_2xx"] for r in rows.values())
    for k in ("n_3xx", "n_4xx", "n_5xx"):
        assert any(r[k] for r in rows.values())
    assert any(
        not (r["n_3xx"] and r["n_5xx"]) for r in rows.values()
    )


def test_local_peaks(spark):
    from openreviewcrawler_spark.catalog import q_event_local_peak_detect

    rows = {r["hour_b"]: r for r in q_event_local_peak_detect(spark, SF).collect()}
    ev = spark.read.parquet(f"{SF}/events.parquet").collect()
    import collections

    hourly = collections.Counter(
        int(e["ts"].timestamp() * 1000) // 3600000 for e in ev
    )
    hours = sorted(hourly)
    exp = {}
    for i, h in enumerate(hours):
        if 0 < i < len(hours) - 1:
            p, nx = hours[i - 1], hours[i + 1]
            if (
                p == h - 1
                and nx == h + 1
                and hourly[h] > hourly[p]
                and hourly[h] > hourly[nx]
            ):
                exp[h] = (hourly[h], hourly[h] - max(hourly[p], hourly[nx]))
    assert set(rows) == set(exp)
    assert exp  # the hourly curve is bumpy enough to have real peaks
    for h, (n, prom) in exp.items():
        assert (rows[h]["n_events"], rows[h]["prominence"]) == (n, prom)
        assert prom >= 1
