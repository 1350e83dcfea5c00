"""Session-15 operators: discrete length percentiles, slow-start warmup
schedule."""

from __future__ import annotations

import collections
import math

SF = "/root/testdata/sf0.001"


def _p_disc(xs, p):
    """Smallest value with cumulative share >= p (percentile_disc /
    quantile_disc rule)."""
    xs = sorted(xs)
    return xs[max(0, math.ceil(p * len(xs)) - 1)]


def test_length_percentiles_match_order_statistics(spark):
    from openreviewcrawler_spark.catalog import q_text_length_percentiles

    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    by_src = collections.defaultdict(list)
    for r in docs:
        by_src[r["source"]].append(r["n_chars"])
    got = {r["source"]: r for r in q_text_length_percentiles(spark, SF).collect()}
    assert set(got) == set(by_src)
    for src, xs in by_src.items():
        r = got[src]
        assert r["n_docs"] == len(xs)
        assert r["p50_chars"] == _p_disc(xs, 0.5)
        assert r["p90_chars"] == _p_disc(xs, 0.9)
        assert r["p99_chars"] == _p_disc(xs, 0.99)
        assert r["max_chars"] == max(xs)
        assert r["p50_chars"] <= r["p90_chars"] <= r["p99_chars"] <= r["max_chars"]


def test_warmup_schedule_doubles_to_cap(spark):
    from openreviewcrawler_spark.catalog import (
        _WARMUP_CAP,
        _WARMUP_HORIZON,
        q_crawl_warmup_schedule,
    )

    rows = q_crawl_warmup_schedule(spark, SF).collect()
    by_host = collections.defaultdict(dict)
    for r in rows:
        by_host[r["host"]][r["round"]] = r
    for host, sched in by_host.items():
        first = min(sched)
        assert set(sched) == set(range(first, _WARMUP_HORIZON + 1))
        for rnd, r in sched.items():
            assert r["first_seen"] == first
            assert r["budget"] == min(_WARMUP_CAP, 1 << (rnd - first))
        # monotone non-decreasing ramp
        budgets = [sched[i]["budget"] for i in sorted(sched)]
        assert budgets == sorted(budgets)
        assert budgets[0] == 1
