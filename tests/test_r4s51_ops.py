"""Session-51: paired t-test, hreflang clusters, singleflight."""

from __future__ import annotations

import math

SF = "/root/testdata/sf0.001"


def test_paired_ttest_matches_python(spark):
    from decimal import ROUND_HALF_UP, Decimal

    from openreviewcrawler_spark.catalog import q_event_paired_ttest

    [row] = q_event_paired_ttest(spark, SF).collect()
    ev = spark.read.parquet(f"{SF}/events.parquet").collect()
    ts = [int(e["ts"].timestamp() * 1000) for e in ev]
    lo, hi = min(ts), max(ts)
    import collections

    halves = collections.defaultdict(lambda: [Decimal(0), Decimal(0)])
    for e, t in zip(ev, ts):
        v = Decimal(e["value"]).quantize(Decimal("0.0001"), rounding=ROUND_HALF_UP)
        halves[e["user_id"]][0 if t * 2 < lo + hi else 1] += v
    ds = [
        int(math.floor(b * 100)) - int(math.floor(a * 100))
        for a, b in halves.values()
    ]
    n = len(ds)
    assert row["n"] == n
    assert row["sum_diff_cents"] == sum(ds)
    sd = sum(ds)
    sdd = sum(d * d for d in ds)
    mean = sd / n
    var = (sdd - sd * sd / n) / (n - 1)
    t_stat = mean / math.sqrt(var / n)
    assert row["t_stat_milli"] == math.floor(t_stat * 1000)


def test_hreflang_completeness_follows_planting(spark):
    from openreviewcrawler_spark.catalog import q_url_hreflang_cluster_audit

    rows = {r["host"]: r for r in q_url_hreflang_cluster_audit(spark, SF).collect()}
    assert rows
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    import collections

    langs = collections.defaultdict(set)
    for d in docs:
        i = d["doc_id"]
        ck = i // 3
        if ck % 4 == 0 and i % 3 == 2:
            continue
        langs[(ck, f"h{ck % 9}.example")].add(["en", "fr", "de"][i % 3])
    per = collections.defaultdict(lambda: [0, 0])
    for (ck, host), ls in langs.items():
        a = per[host]
        a[0] += 1
        a[1] += len(ls) == 3
    assert set(rows) == set(per)
    for h, (nc, ncomp) in per.items():
        r = rows[h]
        assert (r["n_clusters"], r["n_complete"]) == (nc, ncomp)
        assert r["complete_ppm"] == ncomp * 1_000_000 // nc
    # both complete and incomplete clusters exist
    assert any(r["n_complete"] < r["n_clusters"] for r in rows.values())
    assert any(r["n_complete"] > 0 for r in rows.values())


def test_singleflight_islands(spark):
    from openreviewcrawler_spark.catalog import (
        _SINGLEFLIGHT_WINDOW,
        q_crawl_singleflight_coalesce,
    )

    rows = {r["url_key"]: r for r in q_crawl_singleflight_coalesce(spark, SF).collect()}
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    import collections

    per = collections.defaultdict(list)
    for d in docs:
        i = d["doc_id"]
        per[i % 150].append(((i * i) % 500, i))
    assert set(rows) == set(per)
    for k, reqs in per.items():
        reqs.sort()
        groups = 0
        prev = None
        for t, _ in reqs:
            if prev is None or t - prev > _SINGLEFLIGHT_WINDOW:
                groups += 1
            prev = t
        r = rows[k]
        assert r["n_requests"] == len(reqs)
        assert r["n_origin_fetches"] == groups
        assert r["n_saved"] == len(reqs) - groups
        assert r["saved_ppm"] == (len(reqs) - groups) * 1_000_000 // len(reqs)
    # the synthesis produces real collapse somewhere and none elsewhere
    assert any(r["n_saved"] > 0 for r in rows.values())
    assert any(r["n_saved"] == 0 for r in rows.values())
