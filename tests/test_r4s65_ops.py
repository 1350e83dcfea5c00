"""Session-65: adaptive timeout, session type pairs."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_adaptive_timeout_plan(spark):
    from openreviewcrawler_spark.catalog import (
        q_crawl_adaptive_timeout_plan,
        q_crawl_latency_mad_outliers,
    )

    rows = {r["host"]: r for r in q_crawl_adaptive_timeout_plan(spark, SF).collect()}
    assert rows
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    import collections

    lats = collections.defaultdict(list)
    for d in docs:
        i = d["doc_id"]
        tail = (i * 7) % 13 < (i % 20) % 4
        lats[f"{d['source']}.example"].append(
            2500 + i % 500 if tail else 50 + (i * 97) % 900
        )
    for h, xs in lats.items():
        r = rows[h]
        assert r["timeout_ms"] == min(r["p95_ms"] + (r["p95_ms"] - r["p50_ms"]), 10000)
        cut = sum(1 for x in xs if x > r["timeout_ms"])
        assert r["n_would_cut"] == cut
        assert r["cut_ppm"] == cut * 1_000_000 // len(xs)
    # tail-free hosts (source % 4 == 0) cut nothing; even small-tail
    # hosts lose at most their tail share to the timeout
    assert any(r["cut_ppm"] == 0 for r in rows.values())
    assert all(r["cut_ppm"] <= 250_000 for r in rows.values())
    # sanity tie to the MAD entry's host set
    assert set(rows) == {
        r["host"] for r in q_crawl_latency_mad_outliers(spark, SF).collect()
    }


def test_session_type_pairs_lift(spark):
    from openreviewcrawler_spark.catalog import q_event_session_type_pairs

    rows = {(r["type_a"], r["type_b"]): r for r in q_event_session_type_pairs(spark, SF).collect()}
    assert rows
    ev = sorted(
        spark.read.parquet(f"{SF}/events.parquet").collect(),
        key=lambda e: (e["user_id"], e["ts"], e["event_id"]),
    )
    sessions = []
    prev_user, prev_ts = None, None
    for e in ev:
        t = int(e["ts"].timestamp() * 1000)
        if e["user_id"] != prev_user or t - prev_ts > 1800000:
            sessions.append(set())
        sessions[-1].add(e["event_type"])
        prev_user, prev_ts = e["user_id"], t
    ns = len(sessions)
    import collections
    import itertools

    n_t = collections.Counter()
    n_both = collections.Counter()
    for s in sessions:
        for t in s:
            n_t[t] += 1
        for a, b in itertools.combinations(sorted(s), 2):
            n_both[(a, b)] += 1
    assert set(rows) == set(n_both)
    for (a, b), nb in n_both.items():
        r = rows[(a, b)]
        assert (r["n_both"], r["n_a"], r["n_b"]) == (nb, n_t[a], n_t[b])
        assert r["lift_ppm"] == nb * ns * 1_000_000 // (n_t[a] * n_t[b])
    # lifts spread around independence (1e6)
    lifts = [r["lift_ppm"] for r in rows.values()]
    assert min(lifts) < 1_000_000 < max(lifts) or len(set(lifts)) > 1
