"""Session-26 operators: WARC revisit byte savings, per-host error rate."""

from __future__ import annotations

import collections

SF = "/root/testdata/sf0.001"


def test_warc_savings_matches_change_model(spark):
    from openreviewcrawler_spark.catalog import _CHANGE_SNAPS, q_warc_dedup_savings

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "source", "n_chars"
    ).collect()
    agg = collections.defaultdict(lambda: [0, 0, 0, 0])
    for r in docs:
        host = r["source"] + ".example"
        for snap in range(1, _CHANGE_SNAPS + 1):
            changed = (r["doc_id"] * 37 + snap * 13) % 10 < r["doc_id"] % 4
            unchanged = 0 if snap == 1 else (0 if changed else 1)
            a = agg[host]
            a[0] += 1
            a[1] += unchanged
            a[2] += r["n_chars"]
            a[3] += unchanged * r["n_chars"]
    got = {r["host"]: r for r in q_warc_dedup_savings(spark, SF).collect()}
    assert set(got) == set(agg)
    for host, (nc, nr, bf, bs) in agg.items():
        r = got[host]
        assert (r["n_captures"], r["n_revisit"], r["bytes_fetched"],
                r["bytes_saved"]) == (nc, nr, bf, bs)
        assert r["savings_ppm"] == bs * 1_000_000 // bf
        assert 0 < r["savings_ppm"] < 1_000_000


def test_error_rate_matches_attempt_log(spark):
    from openreviewcrawler_spark.catalog import q_crawl_error_rate_by_host

    ids = [r["doc_id"] for r in
           spark.read.parquet(f"{SF}/documents.parquet").select("doc_id").collect()]
    agg = collections.defaultdict(lambda: [0, 0])
    for i in ids:
        for att in range(1, i % 6 + 2):
            ok = (i * 5 + att) % 7 >= 3
            a = agg[f"h{i % 7}"]
            a[0] += 1
            a[1] += not ok
    got = {r["host"]: r for r in q_crawl_error_rate_by_host(spark, SF).collect()}
    assert set(got) == set(agg)
    for host, (na, nf) in agg.items():
        r = got[host]
        assert (r["n_attempts"], r["n_failures"]) == (na, nf)
        assert r["fail_ppm"] == nf * 1_000_000 // na
