"""Late-r4 graph/scheduling operators: HITS hub/authority semantics on a
hand-built graph, serpentine LPT packing properties, conditional-GET method
classification, and degree-spectrum accounting (incl. zero-degree nodes)."""

from __future__ import annotations

from pyspark.sql import functions as F

from openreviewcrawler_spark.operators.rank import hits_rank
from openreviewcrawler_spark.operators.scheduler import hostload_binpack


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src int, dst int")


def _nodes(spark, ns):
    return spark.createDataFrame([(n,) for n in ns], "node int")


def test_hits_star_graph_separates_hub_from_authority(spark):
    # 0 -> {1,2,3}: node 0 is the pure hub, 1-3 are equal pure authorities
    out = hits_rank(
        _edges(spark, [(0, 1), (0, 2), (0, 3)]),
        _nodes(spark, [0, 1, 2, 3]),
        n_iter=2,
    ).collect()
    by = {r["node"]: r for r in out}
    assert by[0]["hub"] == 1.0 and by[0]["authority"] == 0.0
    for n in (1, 2, 3):
        assert by[n]["hub"] == 0.0
        assert by[n]["authority"] == 1.0  # ties: all normalized to the max


def test_hits_prefers_hub_pointing_at_strong_authorities(spark):
    # both hubs fan out 2 links, but node 5 is co-cited by an extra page,
    # making it the stronger authority and hub 0 (who cites it) the
    # stronger hub after the second iteration
    edges = [(0, 4), (0, 5), (1, 6), (1, 7), (2, 5)]
    out = hits_rank(
        _edges(spark, edges), _nodes(spark, range(8)), n_iter=2
    ).collect()
    by = {r["node"]: r for r in out}
    assert by[5]["authority"] == 1.0
    assert by[0]["hub"] > by[1]["hub"]
    assert by[5]["authority"] > by[4]["authority"] > 0.0


def test_binpack_assigns_every_host_once_and_balances(spark):
    # 12 hosts with loads 12..1 onto 4 slots: serpentine over the sorted
    # sequence gives per-slot sums within one pass-max of each other
    rows = [(f"h{i:02d}",) for i in range(12) for _ in range(12 - i)]
    frontier = spark.createDataFrame(rows, "host string")
    out = hostload_binpack(frontier, n_slots=4).collect()
    assert len(out) == 12  # one row per host
    assert {r["slot"] for r in out} == {0, 1, 2, 3}
    loads = {}
    for r in out:
        loads[r["slot"]] = loads.get(r["slot"], 0) + r["pending"]
    # total 78; serpentine on a descending run keeps slots within the
    # heaviest single item of a pass (here: exact balance not required,
    # bound is deliberately loose so the test pins the SHAPE, not one sum)
    assert max(loads.values()) - min(loads.values()) <= 12
    # determinism: ranks are the descending-load order with host tiebreak
    ranked = sorted(out, key=lambda r: r["load_rank0"])
    pendings = [r["pending"] for r in ranked]
    assert pendings == sorted(pendings, reverse=True)
    # serpentine: first pass deals 0,1,2,3 — second reverses
    assert [r["slot"] for r in ranked[:8]] == [0, 1, 2, 3, 3, 2, 1, 0]


def test_conditional_get_classifies_and_prices(spark, sf_dir):
    from openreviewcrawler_spark.catalog import q_crawl_conditional_get

    out = q_crawl_conditional_get(spark, sf_dir)
    rows = out.collect()
    methods = {r["method"] for r in rows}
    assert methods == {"if-none-match", "if-modified-since", "full"}
    for r in rows:
        if r["method"] == "full":
            assert r["est_bytes"] > 256 and r["last_mod_round"] == -1
        else:
            assert r["est_bytes"] == 64 and 0 <= r["last_mod_round"] <= 9
    # history coverage: exactly the doc_id % 3 != 0 urls have validators
    n_full = sum(1 for r in rows if r["method"] == "full")
    assert n_full == len(rows) - sum(
        1 for r in rows if r["method"] != "full"
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BatchEvalPython" not in plan


def test_degree_stats_counts_every_node_once(spark, sf_dir):
    from openreviewcrawler_spark.catalog import q_graph_degree_stats

    out = q_graph_degree_stats(spark, sf_dir)
    rows = out.collect()
    assert sum(r["n_nodes"] for r in rows) == 100  # node universe conserved
    # the dst modulus (83) guarantees pure sinks: some spectrum row has
    # in_degree == 0 with out_degree > 0
    assert any(r["in_degree"] == 0 and r["out_degree"] > 0 for r in rows)
    # one-pass shape: a single generator, no Union re-running the scan
    # (AQE's toString repeats the plan under "== Initial Plan ==" — only
    # the final section counts)
    plan = (
        out._jdf.queryExecution()
        .executedPlan()
        .toString()
        .split("== Initial Plan ==")[0]
    )
    assert plan.count("Generate") == 1
    assert "Union" not in plan


def test_hits_catalog_plan_has_no_corpus_broadcast_nested_loop(spark, sf_dir):
    from openreviewcrawler_spark.catalog import q_graph_hits_rank

    plan = q_graph_hits_rank(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    # the ONLY nested-loop join allowed is the final 1-row max broadcast
    assert plan.count("BroadcastNestedLoopJoin") <= 1
    assert "CartesianProduct" not in plan and "BatchEvalPython" not in plan


def test_reciprocity_counts_mutual_edges(spark):
    from openreviewcrawler_spark.operators.rank import reciprocity

    # 1<->2 mutual, 1->3 one-way, 3->4 one-way; duplicates collapse
    edges = _edges(spark, [(1, 2), (2, 1), (1, 3), (3, 4), (1, 2)])
    by = {r["src"]: r for r in reciprocity(edges).collect()}
    assert (by[1]["n_out"], by[1]["n_recip"], by[1]["recip_rate"]) == (2, 1, 0.5)
    assert (by[2]["n_out"], by[2]["n_recip"], by[2]["recip_rate"]) == (1, 1, 1.0)
    assert (by[3]["n_out"], by[3]["n_recip"], by[3]["recip_rate"]) == (1, 0, 0.0)
    assert 4 not in by  # no out-edges -> no row


def test_latency_quantiles_discrete_ranks(spark):
    from openreviewcrawler_spark.operators.scheduler import latency_quantiles

    rows = [("a", v) for v in (10, 20, 30, 40)] + [("b", 7)]
    log = spark.createDataFrame(rows, "host string, latency_ms long")
    by = {r["host"]: r for r in latency_quantiles(log).collect()}
    # n=4: p50 rank = (3*50)//100+1 = 2 -> 20; p95 rank = (3*95)//100+1 = 3 -> 30
    assert (by["a"]["n_fetches"], by["a"]["p50_ms"], by["a"]["p95_ms"],
            by["a"]["max_ms"]) == (4, 20, 30, 40)
    # singleton host: every quantile is the single observation
    assert (by["b"]["n_fetches"], by["b"]["p50_ms"], by["b"]["p95_ms"],
            by["b"]["max_ms"]) == (1, 7, 7, 7)


def test_host_skew_gini_uniform_and_skewed(spark):
    from openreviewcrawler_spark.operators.scheduler import host_skew_gini

    mk = lambda hosts: spark.createDataFrame([(h,) for h in hosts], "host string")
    even = host_skew_gini(mk(["a", "a", "b", "b"])).collect()[0]
    assert (even["n_hosts"], even["total_pending"], even["gini"]) == (2, 4, 0.0)
    # loads {a:3, b:1} -> sorted [1,3]: G = (2*(1*1+2*3) - 3*4) / (2*4) = 0.25
    skew = host_skew_gini(mk(["a", "a", "a", "b"])).collect()[0]
    assert (skew["n_hosts"], skew["total_pending"], skew["gini"]) == (2, 4, 0.25)


def test_retry_backoff_reset_on_success_and_giveup(spark):
    from openreviewcrawler_spark.operators.scheduler import retry_backoff

    log = spark.createDataFrame(
        [("A", 1, True), ("A", 2, False), ("A", 3, False),
         ("B", 1, False), ("B", 2, False), ("B", 3, False),
         ("C", 1, False), ("C", 2, True)],
        "url string, attempt_round long, ok boolean",
    )
    by = {r["url"]: r for r in retry_backoff(log, max_retries=2).collect()}
    # A: 2 consecutive fails after the round-1 success -> retry at 3 + 2^2
    assert (by["A"]["consec_fails"], by["A"]["status"], by["A"]["next_round"]) == (2, "retry", 7)
    # B: 3 consecutive fails > max_retries -> give up, no next round
    assert (by["B"]["consec_fails"], by["B"]["status"], by["B"]["next_round"]) == (3, "give_up", None)
    # C: success resets the counter entirely
    assert (by["C"]["consec_fails"], by["C"]["status"], by["C"]["next_round"]) == (0, "ok", None)


def test_registrable_domain_psl_subset(spark):
    from openreviewcrawler_spark.functions.urls import registrable_domain_col

    cases = [
        ("a.b.co.uk", "b.co.uk"),        # multi-label suffix: 3 labels kept
        ("deep.a.b.co.uk", "b.co.uk"),
        ("a.b.example", "b.example"),    # unknown TLD: plain last-2
        ("www.site.com", "site.com"),
        ("site.com", "site.com"),
        ("co.uk", "co.uk"),              # exactly the suffix: unchanged
        ("localhost", "localhost"),      # single label: unchanged
        ("x.github.io", "x.github.io"),  # user sites are registrable
    ]
    df = spark.createDataFrame([(h,) for h, _ in cases], "host string")
    got = {
        r["host"]: r["d"]
        for r in df.select(
            "host", registrable_domain_col(F.col("host")).alias("d")
        ).collect()
    }
    for host, want in cases:
        assert got[host] == want, (host, got[host], want)


def test_html_link_extract_agrees_with_python_reference_path(spark, sf_dir):
    """The JVM regexp hot path must extract the same links, in the same
    document order, as the Arrow/Python path that holds byte-parity with
    the reference's parse fixtures (functions/htmltext.extract_outlinks) —
    on the double-quoted-href grammar both support."""
    from openreviewcrawler_spark.catalog import q_html_link_extract, _t, _HTML_BODY_EXPR
    from openreviewcrawler_spark.functions.htmltext import extract_outlinks

    jvm = {}
    for r in q_html_link_extract(spark, sf_dir).collect():
        jvm.setdefault(r["doc_id"], []).append((r["pos"], r["href"]))
    bodies = (
        _t(spark, sf_dir, "documents")
        .select("doc_id", F.expr(_HTML_BODY_EXPR).alias("html"))
        .collect()
    )
    assert bodies and jvm
    for row in bodies:
        want = extract_outlinks(row["html"])
        got = [h for _, h in sorted(jvm.get(row["doc_id"], []))]
        assert got == want, (row["doc_id"], got, want)


# --- session-2 r4 batch: BFS depth, triangles, global pop, shard ring ---


def test_bfs_depth_on_path_graph_and_early_stop(spark):
    from openreviewcrawler_spark.operators.rank import bfs_depth

    # path 0->1->2->3 plus a shortcut 0->2 and an unreachable island 8->9
    edges = _edges(spark, [(0, 1), (1, 2), (2, 3), (0, 2), (8, 9)])
    seeds = _nodes(spark, [0])
    out = {r["node"]: r["depth"] for r in bfs_depth(edges, seeds).collect()}
    # shortcut wins: depth(2) == 1, not 2; island never appears
    assert out == {0: 0, 1: 1, 2: 1, 3: 2}


def test_bfs_depth_multi_seed_takes_min_and_respects_cap(spark):
    from openreviewcrawler_spark.operators.rank import bfs_depth

    # chain 0..5; seeds at both ends: interior depths = min from either side
    chain = [(i, i + 1) for i in range(5)]
    out = {
        r["node"]: r["depth"]
        for r in bfs_depth(
            _edges(spark, chain), _nodes(spark, [0, 5]), max_depth=2
        ).collect()
    }
    # 5 is a seed (depth 0) even though it's also reachable at depth 5;
    # max_depth=2 cuts the walk so node 3 (depth 3 from node 0) is absent
    assert out == {0: 0, 1: 1, 2: 2, 5: 0}


def test_triangle_counts_on_k4_and_triangle_free_star(spark):
    from openreviewcrawler_spark.operators.rank import triangle_counts

    # K4: every node participates in C(3,2) = 3 triangles; direction and
    # duplicate edges must not matter (op canonicalizes + dedups)
    k4 = [(a, b) for a in range(4) for b in range(4) if a != b]
    out = {r["node"]: r["n_tri"] for r in triangle_counts(_edges(spark, k4)).collect()}
    assert out == {0: 3, 1: 3, 2: 3, 3: 3}

    # star graph has zero triangles -> empty result
    star = [(0, i) for i in range(1, 6)]
    assert triangle_counts(_edges(spark, star)).count() == 0


def test_triangle_plan_is_equi_join_only(spark, sf_dir):
    from openreviewcrawler_spark.catalog import q_graph_triangle_count

    plan = (
        q_graph_triangle_count(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for op in ("CartesianProduct", "BroadcastNestedLoopJoin", "BatchEvalPython"):
        assert op not in plan, f"{op} in plan:\n{plan}"


def test_priority_admit_equals_naive_topk_and_full_admit(spark):
    from openreviewcrawler_spark.operators.scheduler import priority_admit

    rows = [(i, (i * 13) % 7) for i in range(40)]
    f = spark.createDataFrame(rows, "doc_id long, priority long")
    got = sorted(
        (r["doc_id"], r["priority"])
        for r in priority_admit(f, 15, "priority", "doc_id").collect()
    )
    want = sorted(
        (r["doc_id"], r["priority"])
        for r in f.orderBy(F.desc("priority"), F.asc("doc_id")).limit(15).collect()
    )
    assert got == want and len(got) == 15
    # budget >= frontier => everything admits, no threshold applied
    assert priority_admit(f, 40, "priority", "doc_id").count() == 40
    assert priority_admit(f, 1000, "priority", "doc_id").count() == 40


def test_priority_admit_boundary_tiebreak_is_id_asc(spark):
    from openreviewcrawler_spark.operators.scheduler import priority_admit

    # single priority class: the boundary IS the whole frontier, so the
    # admitted ids must be exactly the budget smallest
    f = spark.createDataFrame([(i, 5) for i in range(20)], "doc_id long, priority long")
    got = sorted(r["doc_id"] for r in priority_admit(f, 7, "priority", "doc_id").collect())
    assert got == list(range(7))


def test_consistent_hash_ring_moves_few_hosts_and_stays_in_range(spark):
    from openreviewcrawler_spark.operators.scheduler import consistent_hash_assign

    hosts = spark.createDataFrame([(f"host{i}.example",) for i in range(200)], "host string")
    out = consistent_hash_assign(hosts, n_shards=8, n_shards_after=9).collect()
    assert len(out) == 200
    assert all(0 <= r["shard_before"] < 8 for r in out)
    assert all(0 <= r["shard_after"] < 9 for r in out)
    moved = sum(r["moved"] for r in out)
    # consistent hashing moves ~1/9 of keys on 8->9; hash-mod would move
    # ~8/9. Allow generous slack over 4 vnodes/shard: must stay far below
    # one-half, the signature property of the ring
    assert moved < 100 == len([r for r in out if True]) // 2
    # every moved host moved TO the new shard's points or within wrap:
    # unmoved hosts dominate and keep identical placement
    same = [r for r in out if not r["moved"]]
    assert all(r["shard_before"] == r["shard_after"] for r in same)


def test_consistent_hash_broadcast_side_is_ring_only(spark, sf_dir):
    from openreviewcrawler_spark.catalog import q_crawl_shard_assign

    # the BNLJ here is DELIBERATE: its build side is the K'*V-row ring
    # (36 rows), never the host table — assert hosts arrive via shuffle
    # (window) and that no corpus-side broadcast hash join exists
    df = q_crawl_shard_assign(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_token_bucket_clamp_recurrence(spark):
    from openreviewcrawler_spark.operators.scheduler import token_bucket_pacing

    rows = [("a", 0, 3), ("a", 1, 4), ("a", 2, 1), ("a", 3, 6), ("b", 0, 9)]
    reqs = spark.createDataFrame(rows, "host string, rnd long, requested long")
    out = {
        (r["host"], r["rnd"]): (r["admitted"], r["denied"], r["tokens_after"])
        for r in token_bucket_pacing(reqs, capacity=5, refill=2).collect()
    }
    # host a: start full(5): adm 3 -> 2 left; refill->4: adm 4 -> 0;
    # refill->2: adm 1 -> 1; refill->3: adm 3 of 6, denied 3
    assert out[("a", 0)] == (3, 0, 2)
    assert out[("a", 1)] == (4, 0, 0)
    assert out[("a", 2)] == (1, 0, 1)
    assert out[("a", 3)] == (3, 3, 0)
    # host b: one round, capacity-capped
    assert out[("b", 0)] == (5, 4, 0)


def test_politeness_schedule_spaces_fetches_by_delay(spark):
    from openreviewcrawler_spark.operators.scheduler import politeness_schedule

    rows = [("u1", "a", 100), ("u2", "a", 100), ("u3", "a", 100), ("u1", "b", 250)]
    f = spark.createDataFrame(rows, "url string, host string, delay_ms long")
    out = {(r["host"], r["url"]): (r["fetch_rank"], r["scheduled_ms"])
           for r in politeness_schedule(f).collect()}
    assert out[("a", "u1")] == (1, 0)
    assert out[("a", "u2")] == (2, 100)
    assert out[("a", "u3")] == (3, 200)
    assert out[("b", "u1")] == (1, 0)


def test_subnet_budget_apportions_and_floors(spark):
    from openreviewcrawler_spark.operators.scheduler import subnet_budget

    # force two hosts into one subnet by checking the real md5 buckets:
    # just assert invariants that hold for ANY hash placement
    rows = [(f"host{i}.example",) for i in range(30) for _ in range(i + 1)]
    out = subnet_budget(
        spark.createDataFrame(rows, "host string"), subnet_cap=10
    ).collect()
    assert len(out) == 30
    for r in out:
        assert r["host_cap"] >= 1
        assert r["subnet_pending"] >= r["pending"]
        assert r["subnet_hosts"] >= 1
        # floor apportionment never exceeds the proportional share + floor-1
        assert r["host_cap"] <= max(1, (10 * r["pending"]) // r["subnet_pending"])
    # per subnet: sum of caps <= cap + n_hosts (floors + min-1 floor)
    by_net = {}
    for r in out:
        by_net.setdefault(r["subnet"], []).append(r)
    for net, hs in by_net.items():
        assert sum(h["host_cap"] for h in hs) <= 10 + len(hs)


def test_label_propagation_two_cliques_converge(spark):
    from openreviewcrawler_spark.operators.rank import label_propagation

    # two triangles bridged by nothing: each converges to its min label
    edges = _edges(
        spark, [(0, 1), (1, 2), (0, 2), (10, 11), (11, 12), (10, 12)]
    )
    nodes = _nodes(spark, [0, 1, 2, 10, 11, 12, 99])  # 99 isolated
    out = {r["node"]: r["label"]
           for r in label_propagation(edges, nodes, n_iter=2).collect()}
    assert out[99] == 99                      # isolated keeps own label
    assert out[0] == out[1] == out[2]
    assert out[10] == out[11] == out[12]
    assert out[0] != out[10]


def test_mirror_detect_full_and_partial_mirror(spark):
    from openreviewcrawler_spark.operators.dedup import mirror_detect

    rows = (
        [("a", f"d{i}") for i in range(4)]
        + [("b", f"d{i}") for i in range(4)]          # full mirror of a
        + [("c", f"d{i}") for i in range(2)]          # half overlap with a
        + [("c", f"x{i}") for i in range(2)]
        + [("solo", "y0"), ("solo", "y1")]
    )
    pages = spark.createDataFrame(rows, "host string, digest string")
    out = {(r["host_a"], r["host_b"]): (r["shared"], r["jaccard"])
           for r in mirror_detect(pages, min_shared=2).collect()}
    assert out[("a", "b")] == (4, 1.0)
    assert out[("a", "c")] == (2, round(2 / 6, 6))
    assert out[("b", "c")] == (2, round(2 / 6, 6))
    assert len(out) == 3                      # solo never pairs


def test_mirror_detect_hot_digest_cap_drops_boilerplate(spark):
    from openreviewcrawler_spark.operators.dedup import (
        MAX_MIRROR_DIGEST_HOSTS,
        mirror_detect,
    )

    # one digest on MANY hosts (a boilerplate page) must produce no pairs
    n = MAX_MIRROR_DIGEST_HOSTS + 5
    rows = [(f"h{i}", "boilerplate") for i in range(n)]
    pages = spark.createDataFrame(rows, "host string, digest string")
    assert mirror_detect(pages, min_shared=1).count() == 0


def test_audio_chunk_plan_windows_and_truncation(spark):
    from openreviewcrawler_spark.operators.multimodal import plan_audio_chunks

    rows = [
        (1, "audio", b"", 150),   # dur 1500 <= win -> one chunk [0, 1500)
        (2, "audio", b"", 500),   # dur 5000 -> chunks at 0,1500,3000 -> 3 of them
        (3, "video", b"", 999),   # not audio -> no rows
    ]
    assets = spark.createDataFrame(
        rows, "asset_id long, kind string, payload binary, src_len long"
    )
    out = sorted(
        (r["asset_id"], r["chunk_idx"], r["start_ms"], r["end_ms"])
        for r in plan_audio_chunks(assets).collect()
    )
    assert out == [
        (1, 0, 0, 1500),
        (2, 0, 0, 2000),
        (2, 1, 1500, 3500),
        (2, 2, 3000, 5000),
    ]
