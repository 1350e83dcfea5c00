"""r4d operators: robots Sitemap: discovery, tumbling-rate rollup,
token-budget data selection."""

from __future__ import annotations

from pyspark.sql import functions as F

from openreviewcrawler_spark.operators.packing import token_budget_trim
from openreviewcrawler_spark.operators.robots import sitemap_directives
from openreviewcrawler_spark.operators.stats import rate_timeseries


def test_sitemap_directives_position_independent_and_crlf(spark):
    body_lf = "\n".join(
        [
            "User-agent: googlebot",
            "Sitemap: https://a.example/inside-block.xml",
            "",
            "User-agent: *",
            "Disallow: /x",
            "Sitemap: https://a.example/s1.xml  # trailing comment",
            "sitemap: https://a.example/s2.xml",  # lowercase key
            "Sitemap: https://a.example/s1.xml",  # duplicate collapses
            "Sitemap:",  # empty value ignored
            "# Sitemap: https://a.example/commented-out.xml",
        ]
    )
    bodies = spark.createDataFrame(
        [("a", body_lf), ("b", body_lf.replace("\n", "\r\n"))],
        "host string, body string",
    )
    out = sitemap_directives(bodies).collect()
    per_host = {}
    for r in out:
        per_host.setdefault(r["host"], set()).add(r["sitemap_url"])
    expected = {
        "https://a.example/inside-block.xml",  # position-independent
        "https://a.example/s1.xml",
        "https://a.example/s2.xml",
    }
    assert per_host["a"] == expected
    assert per_host["b"] == expected  # CRLF host parses identically


def test_token_budget_trim_greedy_prefix_and_straddler(spark):
    docs = spark.createDataFrame(
        [
            (1, 90, 40),  # best: fits (prefix 0)
            (2, 80, 50),  # fits (prefix 40)
            (3, 70, 20),  # straddles 100 budget at prefix 90 -> dropped whole
            (4, 60, 10),  # prefix is STILL 110 (greedy order, not knapsack)
        ],
        "doc_id long, score long, n_tokens long",
    )
    kept = {r["doc_id"]: r for r in token_budget_trim(docs, budget=100).collect()}
    assert set(kept) == {1, 2}
    assert kept[1]["tok_prefix"] == 0 and kept[2]["tok_prefix"] == 40


def test_token_budget_trim_score_ties_break_on_id(spark):
    docs = spark.createDataFrame(
        [(2, 50, 60), (1, 50, 60)], "doc_id long, score long, n_tokens long"
    )
    kept = [r["doc_id"] for r in token_budget_trim(docs, budget=60).collect()]
    assert kept == [1]  # same score: smaller id first


def test_rate_timeseries_buckets_and_exact_sums(spark):
    events = spark.sql(
        """select * from values
        (timestamp'2024-01-01 00:00:10', 'fetch', 1.25),
        (timestamp'2024-01-01 00:00:50', 'fetch', 2.50),
        (timestamp'2024-01-01 00:01:10', 'fetch', 4.00),
        (timestamp'2024-01-01 00:00:30', 'error', 0.75)
        as t(ts, event_type, value)"""
    )
    out = {
        (r["bucket"], r["event_type"]): r
        for r in rate_timeseries(events, bucket_s=60).collect()
    }
    base = 1704067200000 // 60000  # 2024-01-01T00:00Z in minute buckets
    assert out[(base, "fetch")]["n_events"] == 2
    assert out[(base, "fetch")]["sum_value"] == 3.75
    assert out[(base + 1, "fetch")]["n_events"] == 1
    assert out[(base, "error")]["sum_value"] == 0.75


def test_minhash_error_profile_exact_dups_land_in_bucket_zero(spark):
    from openreviewcrawler_spark.operators.dedup import minhash_error_profile

    text = "the quick brown fox jumps over the lazy dog again and again"
    corpus = spark.createDataFrame(
        [(1, text), (2, text), (3, "completely different words entirely here")],
        "doc_id long, text string",
    )
    out = {r["err_bucket"]: r["n_pairs"] for r in minhash_error_profile(corpus).collect()}
    # the exact-dup pair (est=1, true=1 -> err 0) is the only candidate pair
    assert out == {0: 1}
