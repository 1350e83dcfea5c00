"""Session-70: homograph detection, early-value LTV correlation."""

from __future__ import annotations

import math
from decimal import ROUND_HALF_UP, Decimal

SF = "/root/testdata/sf0.001"


def test_homograph_detection(spark):
    from openreviewcrawler_spark.catalog import q_url_homograph_detect

    rows = {r["host"]: r for r in q_url_homograph_detect(spark, SF).collect()}
    assert rows
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    import collections

    hosts = collections.Counter()
    for d in docs:
        i = d["doc_id"]
        if i % 33 == 0:
            hosts[f"d\u0430ta{i % 5}.example"] += 1
        elif i % 41 == 0:
            hosts["s\u0430le.example"] += 1
        elif i % 7 == 1:
            hosts[f"data{i % 5}.example"] += 1
        else:
            hosts[f"{d['source']}.example"] += 1
    confus = {h for h in hosts if "\u0430" in h}
    assert set(rows) == confus
    for h, r in rows.items():
        skel = h.replace("\u0430", "a")
        assert r["skeleton"] == skel
        assert r["n_pages"] == hosts[h]
        if skel in hosts:
            assert r["impersonates_existing"] == 1
            assert r["n_target_pages"] == hosts[skel]
        else:
            assert r["impersonates_existing"] == 0
    # the planted lookalikes shadow real hosts, and the orphan
    # confusable proves the join is a detector, not a rubber stamp
    assert any(r["impersonates_existing"] for r in rows.values())
    assert any(not r["impersonates_existing"] for r in rows.values())


def test_early_value_ltv_corr(spark):
    from openreviewcrawler_spark.catalog import q_event_early_value_ltv_corr

    [row] = q_event_early_value_ltv_corr(spark, SF).collect()
    ev = spark.read.parquet(f"{SF}/events.parquet").collect()
    import collections

    per = collections.defaultdict(lambda: [None, Decimal(0), Decimal(0)])
    for e in ev:
        t = int(e["ts"].timestamp() * 1000)
        a = per[e["user_id"]]
        if a[0] is None or t < a[0]:
            a[0] = t
    q4 = Decimal("0.0001")
    for e in ev:
        t = int(e["ts"].timestamp() * 1000)
        a = per[e["user_id"]]
        v = Decimal(e["value"]).quantize(q4, rounding=ROUND_HALF_UP)
        a[2] += v
        if t < a[0] + 604800000:
            a[1] += v
    xs = [int(math.floor(a[1] * 100)) for a in per.values()]
    ys = [int(math.floor(a[2] * 100)) for a in per.values()]
    m = len(xs)
    assert row["n_users"] == m
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx, syy = sum(x * x for x in xs), sum(y * y for y in ys)
    num = m * sxy - sx * sy
    den = math.sqrt(m * sxx - sx * sx) * math.sqrt(m * syy - sy * sy)
    assert abs(row["r_corr"] - math.floor(num / den * 1e6) / 1e6) < 2e-6
    # week-one spend is a real (positive) early signal on this fixture
    assert row["r_corr"] > 0
