"""Session-43: hypertable continuous rollup, KMV theta sketch."""

from __future__ import annotations

import hashlib

SF = "/root/testdata/sf0.001"


def test_hypertable_levels_are_consistent(spark):
    from openreviewcrawler_spark.catalog import q_event_hypertable_rollup

    rows = q_event_hypertable_rollup(spark, SF).collect()
    levels = {r["level"] for r in rows}
    assert levels == {"1h", "1d", "1w"}
    by = {lv: [r for r in rows if r["level"] == lv] for lv in levels}
    # conservation at every level
    tot = {lv: (sum(r["n_events"] for r in by[lv]), sum(r["value_cents"] for r in by[lv])) for lv in levels}
    assert tot["1h"] == tot["1d"] == tot["1w"]
    assert tot["1h"][0] == spark.read.parquet(f"{SF}/events.parquet").count()
    # each daily cell equals the sum of its hourly children
    import collections

    daily_from_hourly = collections.Counter()
    for r in by["1h"]:
        day_start = (r["bucket_start_ms"] // 86400000) * 86400000
        daily_from_hourly[(r["event_type"], day_start)] += r["n_events"]
    for r in by["1d"]:
        assert daily_from_hourly[(r["event_type"], r["bucket_start_ms"])] == r["n_events"]
    assert len(by["1h"]) > len(by["1d"]) >= len(by["1w"])


def test_kmv_sketch_estimates_and_audit(spark):
    from openreviewcrawler_spark.catalog import _KMV_K, q_url_kmv_set_sketch

    [row] = q_url_kmv_set_sketch(spark, SF).collect()
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    a = {f"https://{d['source']}.example/d/{d['doc_id']}" for d in docs if d["doc_id"] % 3}
    b = {f"https://{d['source']}.example/d/{d['doc_id']}" for d in docs if d["doc_id"] % 2}
    assert (row["exact_a"], row["exact_b"]) == (len(a), len(b))
    assert row["exact_intersection"] == len(a & b)
    # python KMV reference
    ha = sorted(int(hashlib.md5(u.encode()).hexdigest()[:8], 16) for u in a)[:_KMV_K]
    hb = sorted(int(hashlib.md5(u.encode()).hexdigest()[:8], 16) for u in b)[:_KMV_K]
    assert row["est_a"] == (_KMV_K - 1) * (1 << 32) // (ha[-1] + 1)
    assert row["est_b"] == (_KMV_K - 1) * (1 << 32) // (hb[-1] + 1)
    merged = sorted(set(ha) | set(hb))[:_KMV_K]
    theta = merged[-1]
    n_common = sum(1 for h in set(ha) & set(hb) if h <= theta)
    assert row["n_common"] == n_common
    assert row["est_union"] == (_KMV_K - 1) * (1 << 32) // (theta + 1)
    assert row["jaccard_ppm"] == n_common * 1_000_000 // _KMV_K
    # the estimators are actually in the neighborhood of the truth
    for est, exact in [
        (row["est_a"], len(a)),
        (row["est_b"], len(b)),
        (row["est_union"], len(a | b)),
    ]:
        assert 0.5 * exact < est < 2.0 * exact
    true_j = len(a & b) / len(a | b)
    assert abs(row["jaccard_ppm"] / 1e6 - true_j) < 0.25
