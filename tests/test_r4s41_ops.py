"""Session-41 operators: outage streaks, pareto frontier, https
adoption."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_outage_streaks_match_python_islands(spark):
    from openreviewcrawler_spark.catalog import (
        _OUTAGE_MIN_STREAK,
        q_crawl_host_outage_detect,
    )

    rows = {r["host"]: r for r in q_crawl_host_outage_detect(spark, SF).collect()}
    assert rows
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    import collections

    log = collections.defaultdict(list)
    for d in sorted(docs, key=lambda d: d["doc_id"]):
        for att in range(1, d["doc_id"] % 6 + 2):
            ok = (d["doc_id"] * 5 + att) % 7 >= 3
            log[f"h{d['doc_id'] % 7}"].append(ok)
    for host, seq in log.items():
        streaks, cur = [], 0
        for ok in seq:
            if ok:
                if cur:
                    streaks.append(cur)
                cur = 0
            else:
                cur += 1
        if cur:
            streaks.append(cur)
        r = rows[host]
        assert r["n_failure_streaks"] == len(streaks)
        assert r["max_streak"] == max(streaks)
        n_out = sum(1 for s in streaks if s >= _OUTAGE_MIN_STREAK)
        assert r["n_outages"] == n_out
        assert r["outage_flag"] == (1 if n_out else 0)
    # consecutive runs exist beyond singleton flakes
    assert any(r["max_streak"] >= 3 for r in rows.values())


def test_pareto_frontier_dominance_semantics(spark):
    from openreviewcrawler_spark.catalog import (
        q_host_crawl_value_score,
        q_host_pareto_frontier,
    )

    rows = {r["host"]: r for r in q_host_pareto_frontier(spark, SF).collect()}
    m = {
        r["host"]: (r["quality_pts"], r["reliability_pts"])
        for r in q_host_crawl_value_score(spark, SF).collect()
    }
    assert set(rows) == set(m)
    for h, r in rows.items():
        q, rel = m[h]
        doms = [
            o
            for o, (oq, orl) in m.items()
            if o != h and oq >= q and orl >= rel and (oq > q or orl > rel)
        ]
        assert r["n_dominators"] == len(doms)
        assert r["on_frontier"] == (1 if not doms else 0)
    front = [h for h, r in rows.items() if r["on_frontier"]]
    assert front  # a maximum always exists
    # the global best on either single axis is always on the frontier
    best_q = max(m, key=lambda h: (m[h][0], m[h][1]))
    assert best_q in front


def test_https_adoption_counts_and_both_scheme_paths(spark):
    from openreviewcrawler_spark.catalog import q_host_https_adoption

    rows = q_host_https_adoption(spark, SF).collect()
    assert rows
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    import collections

    per = collections.defaultdict(lambda: collections.defaultdict(lambda: [0, 0]))
    for d in docs:
        host = f"{d['source']}.example"
        path = f"/d/{d['doc_id'] % 50}"
        s = 0 if (d["doc_id"] * 3) % 7 < 3 else 1
        per[host][path][s] += 1
    for r in rows:
        paths = per[r["host"]]
        n_http = sum(v[0] for v in paths.values())
        n_https = sum(v[1] for v in paths.values())
        both = sum(1 for v in paths.values() if v[0] and v[1])
        assert (r["n_http"], r["n_https"]) == (n_http, n_https)
        assert r["n_paths"] == len(paths)
        assert r["n_paths_both"] == both
        assert r["https_ppm"] == n_https * 1_000_000 // (n_http + n_https)
    # the synthesis mixes schemes inside hosts and overlaps path spaces
    assert any(r["n_paths_both"] > 0 for r in rows)
    assert all(r["n_http"] > 0 and r["n_https"] > 0 for r in rows)
