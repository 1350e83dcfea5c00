"""Session-9 operators: change-rate recrawl planning, session-param
detection, event-type affinity.

Semantic checks on the deterministic derivations + plan-shape guards.
"""

from __future__ import annotations

BAD_ALWAYS = ("CartesianProduct", "BroadcastNestedLoopJoin", "BatchEvalPython")

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _assert_clean(plan: str, *also_banned: str):
    for op in BAD_ALWAYS + also_banned:
        assert op not in plan, f"{op} in plan:\n{plan}"


# --------------------------------------------------------- crawl_change_rate


def test_change_rate_matches_python_model(spark):
    from openreviewcrawler_spark.catalog import _CHANGE_SNAPS, q_crawl_change_rate

    rows = {r["host"]: r for r in q_crawl_change_rate(spark, SF).collect()}
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    import collections

    obs = collections.Counter()
    chg = collections.Counter()
    for d in docs:
        host = d["source"] + ".example"
        for snap in range(1, _CHANGE_SNAPS + 1):
            obs[host] += 1
            chg[host] += (d["doc_id"] * 37 + snap * 13) % 10 < d["doc_id"] % 4
    assert set(rows) == set(obs)
    for host, r in rows.items():
        assert r["n_obs"] == obs[host]
        assert r["n_changed"] == chg[host]
        ppm = chg[host] * 1_000_000 // obs[host]
        assert r["change_ppm"] == ppm
        expect = 6 if ppm >= 250_000 else 24 if ppm >= 100_000 else 168 if ppm else 720
        assert r["recrawl_hours"] == expect


def test_change_rate_interval_ladder_is_monotone(spark):
    from openreviewcrawler_spark.catalog import q_crawl_change_rate

    rows = q_crawl_change_rate(spark, SF).collect()
    pairs = sorted((r["change_ppm"], r["recrawl_hours"]) for r in rows)
    for (p1, h1), (p2, h2) in zip(pairs, pairs[1:]):
        assert p1 > p2 or h1 >= h2, "faster-changing host got a LONGER interval"


def test_change_rate_plan_single_shuffle_no_join(spark):
    from openreviewcrawler_spark.catalog import q_crawl_change_rate

    df = q_crawl_change_rate(spark, SF)
    plan = _plan(df)
    _assert_clean(plan, "SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin")
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "partial_count" in plan or "partial_sum" in plan, plan


# -------------------------------------------------- url_session_param_detect


def test_session_param_flags_sid_only(spark):
    from openreviewcrawler_spark.catalog import q_url_session_param_detect

    rows = q_url_session_param_detect(spark, SF).collect()
    by_param = {}
    for r in rows:
        by_param.setdefault(r["param"], []).append(r)
    assert set(by_param) == {"sid", "page", "ref"}
    # sid values are doc_id-unique: every host with >=5 rows flags it
    for r in by_param["sid"]:
        assert r["n_values"] == r["n_urls"]
        assert r["card_ppm"] == 1_000_000
        assert r["session_suspect"] == (1 if r["n_urls"] >= 5 else 0)
    # page has 5 possible values -> never near-unique at >=5 occurrences
    for r in by_param["page"]:
        if r["n_urls"] >= 5:
            assert r["session_suspect"] == 0


def test_session_param_cardinality_exact(spark):
    from openreviewcrawler_spark.catalog import q_url_session_param_detect

    rows = q_url_session_param_detect(spark, SF).collect()
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    model = {}
    for d in docs:
        host = d["source"] + ".example"
        m = d["doc_id"] % 3
        param = ("sid", "page", "ref")[m]
        val = str(d["doc_id"] if m == 0 else d["doc_id"] % 5 if m == 1 else d["doc_id"] % 50)
        model.setdefault((host, param), set()).add(val)
    for r in rows:
        assert r["n_values"] == len(model[(r["host"], r["param"])])


def test_session_param_plan_one_scan_no_join(spark):
    from openreviewcrawler_spark.catalog import q_url_session_param_detect

    plan = _plan(q_url_session_param_detect(spark, SF))
    _assert_clean(plan, "SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin")
    assert plan.count("FileScan parquet") == 1, plan


# --------------------------------------------------------- event_type_affinity


def test_affinity_lift_matches_python_model(spark):
    from openreviewcrawler_spark.catalog import q_event_type_affinity

    rows = q_event_type_affinity(spark, SF).collect()
    ev = spark.read.parquet(f"{SF}/events.parquet").collect()
    ut = {(e["user_id"], e["event_type"]) for e in ev}
    users = {u for u, _ in ut}
    by_type = {}
    for u, t in ut:
        by_type.setdefault(t, set()).add(u)
    for r in rows:
        assert r["type_a"] < r["type_b"]
        both = by_type[r["type_a"]] & by_type[r["type_b"]]
        assert r["n_both"] == len(both)
        assert r["n_a"] == len(by_type[r["type_a"]])
        assert r["n_b"] == len(by_type[r["type_b"]])
        lift = len(both) * len(users) * 1_000_000 // (r["n_a"] * r["n_b"])
        assert r["lift_ppm"] == lift


def test_affinity_pair_count_bounded_by_type_vocab(spark):
    from openreviewcrawler_spark.catalog import q_event_type_affinity

    rows = q_event_type_affinity(spark, SF).collect()
    types = {r["type_a"] for r in rows} | {r["type_b"] for r in rows}
    n = len(types)
    assert len(rows) <= n * (n - 1) // 2


def test_affinity_self_join_reads_persisted_table(spark):
    from openreviewcrawler_spark.caching import release_persisted
    from openreviewcrawler_spark.catalog import q_event_type_affinity

    try:
        df = q_event_type_affinity(spark, SF)
        plan = _plan(df)
        # the 1-row n_users totals attach via the accepted single-row
        # broadcast (folds to BroadcastNestedLoopJoin) — ban only the
        # corpus-sized hazards
        assert "CartesianProduct" not in plan, plan
        assert "BatchEvalPython" not in plan, plan
        # both self-join sides (plus the totals derivations) read the cached
        # distinct (user, type) table, not a re-run of the events scan
        # (InMemoryTableScan printouts embed the cached child's FileScan, so
        # count readers, not scans)
        assert plan.count("InMemoryTableScan") >= 2, plan
        df.collect()
    finally:
        release_persisted()
