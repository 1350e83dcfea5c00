"""Session-33 operators: hedged fetch plan, url hygiene, paragraph
lengths, type share drift."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_hedged_plan_gates_on_tail_ratio(spark):
    from openreviewcrawler_spark.catalog import q_crawl_hedged_fetch_plan

    rows = q_crawl_hedged_fetch_plan(spark, SF).collect()
    assert rows
    hedged = [r for r in rows if r["hedge"]]
    calm = [r for r in rows if not r["hedge"]]
    # the host-dependent tail synthesis must split the fleet
    assert hedged and calm
    for r in rows:
        assert (r["p95_ms"] > 2 * r["p50_ms"]) == bool(r["hedge"])
        if r["hedge"]:
            assert r["n_hedged"] == (r["n_fetches"] + 9) // 10
            assert r["est_saved_ms"] == r["n_hedged"] * (r["p95_ms"] - r["p50_ms"])
        else:
            assert r["n_hedged"] == 0 and r["est_saved_ms"] == 0
    # hedged hosts are exactly the heavy-tail ones: p95 in the planted tail
    for r in hedged:
        assert r["p95_ms"] >= 2500


def test_url_hygiene_flags_are_the_planted_quarters(spark):
    from openreviewcrawler_spark.catalog import q_url_hygiene_audit

    rows = q_url_hygiene_audit(spark, SF).collect()
    assert rows
    tot = {"n": 0, "c": 0, "p": 0, "f": 0}
    for r in rows:
        # the three dirty rules are disjoint branches of doc_id % 4
        assert r["n_case"] + r["n_port"] + r["n_frag"] <= r["n_urls"]
        expected_dirty = r["n_case"] + r["n_port"] + r["n_frag"]
        assert r["dirty_ppm"] == expected_dirty * 1_000_000 // r["n_urls"]
        tot["n"] += r["n_urls"]
        tot["c"] += r["n_case"]
        tot["p"] += r["n_port"]
        tot["f"] += r["n_frag"]
    # globally ~1/4 of URLs hit each rule (doc_id % 4 == 1, 2, 3)
    n = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert tot["n"] == n
    for k in ("c", "p", "f"):
        assert abs(tot[k] - n // 4) <= n // 20


def test_paragraph_profile_conserves_tokens(spark):
    from openreviewcrawler_spark.catalog import q_text_paragraph_length_profile
    from openreviewcrawler_spark.operators.dedup import PARA_WORDS

    rows = q_text_paragraph_length_profile(spark, SF).collect()
    assert rows
    assert all(1 <= r["n_tok"] <= PARA_WORDS for r in rows)
    # every corpus token lands in exactly one chunk
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    n_tokens = sum(len(d["text"].split(" ")) for d in docs)
    assert sum(r["n_tokens"] for r in rows) == n_tokens
    # full chunks dominate: the PARA_WORDS row carries the plurality of mass
    full = next(r for r in rows if r["n_tok"] == PARA_WORDS)
    assert full["n_tokens"] == max(r["n_tokens"] for r in rows)
    assert sum(r["token_share_ppm"] for r in rows) <= 1_000_000


def test_type_share_drift_is_share_difference(spark):
    from openreviewcrawler_spark.catalog import q_event_type_share_drift

    rows = q_event_type_share_drift(spark, SF).collect()
    assert rows
    ev = spark.read.parquet(f"{SF}/events.parquet").collect()
    ts = [int(e["ts"].timestamp() * 1000) for e in ev]
    lo, hi = min(ts), max(ts)
    t1 = sum(1 for t in ts if t * 2 < lo + hi)
    t2 = len(ts) - t1
    assert sum(r["n_first"] for r in rows) == t1
    assert sum(r["n_second"] for r in rows) == t2
    for r in rows:
        s1 = r["n_first"] * 1_000_000 // t1
        s2 = r["n_second"] * 1_000_000 // t2
        assert (r["share_first_ppm"], r["share_second_ppm"]) == (s1, s2)
        assert r["drift_ppm"] == s2 - s1
    # shares are a (floor-)partition of the whole in each half
    assert 1_000_000 - len(rows) < sum(r["share_first_ppm"] for r in rows) <= 1_000_000
