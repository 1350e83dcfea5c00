"""Session-20 operators: dedup threshold sensitivity, CDN detection."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_threshold_sensitivity_is_monotone_and_consistent(spark):
    from openreviewcrawler_spark.catalog import (
        _vecset,
        q_dedup_threshold_sensitivity,
    )
    from openreviewcrawler_spark.operators import dedup

    r = q_dedup_threshold_sensitivity(spark, SF).collect()[0]
    assert r["n_pairs_90"] >= r["n_pairs_95"] >= r["n_pairs_99"] >= 0
    # the production entry (cos >= 0.95) must agree with the 0.95 bucket
    n95 = dedup.embedding_near_pairs(_vecset(spark, SF), threshold=0.95).count()
    assert r["n_pairs_95"] == n95
    # each pair touches two vectors; distinct vecs bounded by 2*pairs
    assert r["n_vecs_95"] <= 2 * r["n_pairs_95"]
    if r["n_pairs_95"]:
        assert r["n_vecs_95"] >= 2


def test_cdn_detect_flags_planted_hosts(spark):
    from openreviewcrawler_spark.catalog import (
        _CDN_N_REPLICAS,
        q_host_cdn_detect,
    )

    rows = {r["host"]: r for r in q_host_cdn_detect(spark, SF).collect()}
    assert len(rows) == 40
    for host, r in rows.items():
        i = int(host[1:])
        if i % 5 == 0:
            # CDN-fronted: md5-spread replicas land in many /24s
            assert r["n_ips"] <= _CDN_N_REPLICAS
            assert r["is_cdn"] == 1, (host, r)
            assert r["n_subnets"] >= 4
        else:
            assert (r["n_ips"], r["n_subnets"], r["is_cdn"]) == (1, 1, 0)
