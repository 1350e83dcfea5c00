"""Session-39 operators: water-filling fair share, top-k churn,
mojibake detection, redirect hop histogram."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_fair_share_is_max_min(spark):
    from openreviewcrawler_spark.catalog import (
        _FAIRSHARE_NUM,
        _FAIRSHARE_ROUNDS,
        q_crawl_bandwidth_fair_share,
    )

    rows = q_crawl_bandwidth_fair_share(spark, SF).collect()
    assert rows
    total_demand = sum(r["demand"] for r in rows)
    budget = total_demand * _FAIRSHARE_NUM // 10
    granted = sum(r["granted"] for r in rows)
    assert granted <= budget
    # python reference of the same unrolled recurrence
    g = {r["host"]: 0 for r in rows}
    d = {r["host"]: r["demand"] for r in rows}
    for _ in range(_FAIRSHARE_ROUNDS):
        rem = budget - sum(g.values())
        unsat = [h for h in g if g[h] < d[h]]
        if not unsat:
            break
        level = rem // len(unsat)
        for h in unsat:
            g[h] += min(d[h] - g[h], level)
    for r in rows:
        assert r["granted"] == g[r["host"]]
        assert r["granted"] <= r["demand"]
        assert r["satisfied"] == (1 if r["granted"] >= r["demand"] else 0)
        assert r["fill_ppm"] == r["granted"] * 1_000_000 // r["demand"]
    # scarcity binds: someone is unsatisfied, and max-min holds — every
    # unsatisfied host got at least as much as any other host's grant
    # minus rounding (the water level property)
    unsat_grants = [r["granted"] for r in rows if not r["satisfied"]]
    sat_grants = [r["granted"] for r in rows if r["satisfied"]]
    assert unsat_grants
    if sat_grants:
        assert min(unsat_grants) >= max(sat_grants) - len(rows)


def test_topk_churn_recounts(spark):
    from openreviewcrawler_spark.catalog import _CHURN_TOPK, q_host_topk_churn

    rows = {r["host"]: r for r in q_host_topk_churn(spark, SF).collect()}
    assert rows
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    import collections

    cnt = [collections.Counter(), collections.Counter()]
    for d in docs:
        host = f"h{d['doc_id'] % ((d['doc_id'] % 37) + 1)}"
        cnt[d["doc_id"] % 2][host] += 1

    def topk(c):
        return {
            h: (i + 1, n)
            for i, (h, n) in enumerate(
                sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:_CHURN_TOPK]
            )
        }

    ta, tb = topk(cnt[0]), topk(cnt[1])
    assert set(rows) == set(ta) | set(tb)
    for h, r in rows.items():
        if h in ta and h in tb:
            assert r["status"] == "stayed"
            assert (r["rank_a"], r["n_a"]) == (ta[h][0], ta[h][1])
            assert (r["rank_b"], r["n_b"]) == (tb[h][0], tb[h][1])
        elif h in tb:
            assert r["status"] == "entered" and r["rank_a"] == 0
        else:
            assert r["status"] == "dropped" and r["rank_b"] == 0
    assert sum(1 for r in rows.values() if r["status"] == "stayed") > 0


def test_mojibake_counts_follow_residues(spark):
    from openreviewcrawler_spark.catalog import q_text_mojibake_detect

    rows = q_text_mojibake_detect(spark, SF).collect()
    assert rows
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    import collections

    exp = collections.defaultdict(lambda: [0, 0, 0, 0])
    for d in docs:
        a = exp[d["source"]]
        a[0] += 1
        lat = d["doc_id"] % 11 == 0
        pun = d["doc_id"] % 13 == 0
        a[1] += lat
        a[2] += pun
        a[3] += lat or pun
    for r in rows:
        e = exp[r["source"]]
        assert (r["n_docs"], r["n_latin_artifacts"], r["n_punct_artifacts"]) == (
            e[0],
            e[1],
            e[2],
        )
        assert r["moji_ppm"] == e[3] * 1_000_000 // e[0]
    assert any(r["n_latin_artifacts"] for r in rows)
    assert any(r["n_punct_artifacts"] for r in rows)


def test_redirect_hop_histogram_accounts_all_urls(spark):
    from openreviewcrawler_spark.catalog import (
        q_crawl_redirect_resolve,
        q_url_redirect_hop_histogram,
    )

    rows = q_url_redirect_hop_histogram(spark, SF).collect()
    res = q_crawl_redirect_resolve(spark, SF).collect()
    assert sum(r["n_urls"] for r in rows) == len(res)
    import collections

    exp = collections.Counter((r["hops"], 1 if r["resolved"] else 0) for r in res)
    got = {(r["hops"], r["resolved"]): r["n_urls"] for r in rows}
    assert got == dict(exp)
    assert sum(r["url_share_ppm"] for r in rows) <= 1_000_000
