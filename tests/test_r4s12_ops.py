"""Session-12 operators: A/B lift readout, URL template mining, per-host
makespan forecast."""

from __future__ import annotations

import collections
import re

SF = "/root/testdata/sf0.001"


# --------------------------------------------------------------- event_ab_test


def test_ab_test_counts_and_lift_consistency(spark):
    from openreviewcrawler_spark.catalog import q_event_ab_test

    ev = spark.read.parquet(f"{SF}/events.parquet").collect()
    n_per = collections.defaultdict(lambda: [0, 0])
    for r in ev:
        k = int(re.search(r"([0-9]+)", r["props"]).group(1))
        n_per[r["event_type"]][k % 2] += 1
    rows = {r["event_type"]: r for r in q_event_ab_test(spark, SF).collect()}
    assert set(rows) == set(n_per)
    for typ, (na, nb) in n_per.items():
        r = rows[typ]
        assert (r["n_a"], r["n_b"]) == (na, nb)
        assert r["mean_a_cents"] > 0 and r["mean_b_cents"] > 0
        assert r["lift_ppm"] == r["mean_b_cents"] * 1_000_000 // r["mean_a_cents"]


# ----------------------------------------------------------- url_template_mine


def test_template_mine_matches_counter(spark):
    from openreviewcrawler_spark.catalog import TEMPLATE_TOP_K, q_url_template_mine

    ids = [r["doc_id"] for r in
           spark.read.parquet(f"{SF}/documents.parquet").select("doc_id").collect()]
    cnt = collections.Counter()
    for i in ids:
        host = f"h{i % 7}.example"
        seg = ["post", "item", "user"][i % 3]
        path = f"/{seg}/{i}" + (f"/page/{i % 13}" if i % 5 == 0 else "")
        cnt[(host, re.sub(r"[0-9]+", "{n}", path))] += 1
    expect = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:TEMPLATE_TOP_K]
    got = sorted(q_url_template_mine(spark, SF).collect(), key=lambda r: r["rank"])
    assert [((r["host"], r["template"]), r["n_urls"]) for r in got] == expect


def test_template_mine_collapses_numeric_segments(spark):
    from openreviewcrawler_spark.catalog import q_url_template_mine

    rows = q_url_template_mine(spark, SF).collect()
    assert all("{n}" in r["template"] for r in rows)
    # the varying doc-id segment must be collapsed: template count far
    # below URL count
    assert max(r["n_urls"] for r in rows) > 10


# --------------------------------------------------------- crawl_host_makespan


def test_makespan_matches_model_and_flags_bottleneck(spark):
    from openreviewcrawler_spark.catalog import q_crawl_host_makespan

    ids = [r["doc_id"] for r in
           spark.read.parquet(f"{SF}/documents.parquet").select("doc_id").collect()]
    n = collections.Counter(i % 7 for i in ids)
    expect = {
        h: (250 * (1 + h), n[h], n[h] * 250 * (1 + h)) for h in n
    }
    mx = max(v[2] for v in expect.values())
    rows = {r["host_id"]: r for r in q_crawl_host_makespan(spark, SF).collect()}
    assert set(rows) == set(expect)
    for h, (d, cnt, mk) in expect.items():
        r = rows[h]
        assert (r["delay_ms"], r["n_urls"], r["makespan_ms"]) == (d, cnt, mk)
        assert r["is_bottleneck"] == (1 if mk == mx else 0)
    assert sum(r["is_bottleneck"] for r in rows.values()) >= 1
