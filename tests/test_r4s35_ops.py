"""Session-35 operators: host value score, salt plan, quantization
sweep, robots refetch schedule."""

from __future__ import annotations

import math

SF = "/root/testdata/sf0.001"


def test_value_score_composes_its_two_inputs(spark):
    from openreviewcrawler_spark.catalog import (
        q_crawl_error_rate_by_host,
        q_host_crawl_value_score,
        q_host_quality_rollup,
    )

    qr = {r["host"]: r for r in q_host_quality_rollup(spark, SF).collect()}
    er = {r["host"]: r for r in q_crawl_error_rate_by_host(spark, SF).collect()}
    rows = {r["host"]: r for r in q_host_crawl_value_score(spark, SF).collect()}
    assert set(rows) == set(qr) & set(er)
    for h, r in rows.items():
        assert r["quality_pts"] == math.floor(qr[h]["mean_quality"] * 1000)
        assert r["reliability_pts"] == (1_000_000 - er[h]["fail_ppm"]) // 1000
        assert r["value_score"] == r["quality_pts"] + r["reliability_pts"]
        assert r["tier"] == r["value_score"] // 500
        assert 0 <= r["value_score"] <= 2000


def test_salt_plan_spreads_only_hot_hosts(spark):
    from openreviewcrawler_spark.catalog import _SALT_MAX, q_crawl_salt_plan

    rows = q_crawl_salt_plan(spark, SF).collect()
    assert rows
    n = sum(r["n_urls"] for r in rows)
    h = len(rows)
    cap = 2 * ((n + h - 1) // h)
    for r in rows:
        assert r["cap"] == cap
        assert r["salt_factor"] == min((r["n_urls"] + cap - 1) // cap, _SALT_MAX)
        assert 1 <= r["salt_factor"] <= _SALT_MAX
    # the Zipf host synthesis actually has hot hosts AND cold hosts
    assert any(r["salt_factor"] > 1 for r in rows)
    assert any(r["salt_factor"] == 1 for r in rows)
    # salting bounds the worst per-sub-key load to ~cap for capped hosts
    for r in rows:
        if r["salt_factor"] < _SALT_MAX:
            assert (r["n_urls"] + r["salt_factor"] - 1) // r["salt_factor"] <= cap


def test_quantization_sweep_is_monotone_in_bits(spark):
    from openreviewcrawler_spark.catalog import (
        _QSWEEP_LEVELS,
        q_embedding_quantization_sweep,
    )

    rows = {r["levels"]: r for r in q_embedding_quantization_sweep(spark, SF).collect()}
    assert set(rows) == set(_QSWEEP_LEVELS)
    n = {r["n_vectors"] for r in rows.values()}
    assert len(n) == 1  # every level sees every vector
    # more levels => (weakly) more vectors inside tolerance
    tol = [rows[lv]["n_within_tol"] for lv in sorted(rows)]
    assert tol == sorted(tol)
    # 8-bit ships essentially everything; 2-bit essentially nothing
    assert rows[255]["tol_ok_ppm"] > rows[3]["tol_ok_ppm"]


def test_robots_schedule_ttl_and_jitter(spark):
    from openreviewcrawler_spark.catalog import q_crawl_robots_fetch_schedule

    rows = q_crawl_robots_fetch_schedule(spark, SF).collect()
    assert rows
    due = [r for r in rows if r["refetch_due"]]
    fresh = [r for r in rows if not r["refetch_due"]]
    for r in rows:
        assert (r["age_hours"] >= 24) == bool(r["refetch_due"])
        assert 0 <= r["refetch_slot_s"] < 3600
    # the planted ages put every host's freshest capture under the TTL
    # only when some doc_id % 40 < 24 exists for it — both sides occur
    # at this sf? at minimum the slots must spread (not all equal)
    assert len({r["refetch_slot_s"] for r in rows}) > len(rows) // 2
    assert fresh  # min over 25 captures lands under 24h for every host
    assert due == [] or due  # presence depends on alignment; no crash
