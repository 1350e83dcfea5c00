"""Session-46: compaction tiering, hub pages, SCC core estimate."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_compaction_tiering_ledger(spark):
    from openreviewcrawler_spark.catalog import (
        _TIER_FANOUT,
        q_checkpoint_compaction_tiering,
    )

    rows = q_checkpoint_compaction_tiering(spark, SF).collect()
    assert rows
    assert sum(r["n_runs"] for r in rows) == 12  # one run per round
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    total = sum(d["n_chars"] for d in docs)
    assert sum(r["tier_bytes"] for r in rows) == total
    for r in rows:
        assert r["merge_now"] == (1 if r["n_runs"] >= _TIER_FANOUT else 0)
        assert r["bytes_rewritten"] == (r["tier_bytes"] if r["merge_now"] else 0)
    # the 12 similar-sized runs cluster: some tier actually merges
    assert any(r["merge_now"] for r in rows)


def test_hub_page_classes_partition_corpus(spark):
    from openreviewcrawler_spark.catalog import q_crawl_hub_page_detect

    rows = q_crawl_hub_page_detect(spark, SF).collect()
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    import collections

    exp = collections.Counter()
    for d in docs:
        links = (d["doc_id"] * 13) % 40
        if links * 10 > d["n_chars"]:
            c = "hub"
        elif links * 100 < d["n_chars"]:
            c = "content"
        else:
            c = "balanced"
        exp[(f"{d['source']}.example", c)] += 1
    got = {(r["host"], r["page_class"]): r["n_pages"] for r in rows}
    assert got == dict(exp)
    classes = {c for _, c in got}
    assert classes == {"hub", "content", "balanced"}


def test_scc_core_is_forward_backward_intersection(spark):
    from openreviewcrawler_spark.catalog import (
        _SCC_DEPTH,
        q_graph_scc_core_estimate,
    )

    [row] = q_graph_scc_core_estimate(spark, SF).collect()
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    import collections

    fwd_adj = collections.defaultdict(set)
    bwd_adj = collections.defaultdict(set)
    deg = collections.Counter()
    for d in docs:
        s, t = d["doc_id"] % 100, (d["doc_id"] * 7 + 3) % 83
        if s != t:
            if t not in fwd_adj[s]:
                fwd_adj[s].add(t)
                bwd_adj[t].add(s)
    for d in docs:
        s, t = d["doc_id"] % 100, (d["doc_id"] * 7 + 3) % 83
        if s != t:
            pass
    deg = {s: len(ts) for s, ts in fwd_adj.items()}
    mx = max(deg.values())
    pivot = min(s for s, dd in deg.items() if dd == mx)
    assert row["pivot"] == pivot

    def bfs(adj, start):
        seen = {start}
        frontier = [start]
        for _ in range(_SCC_DEPTH):
            nxt = []
            for n in frontier:
                for m in adj[n]:
                    if m not in seen:
                        seen.add(m)
                        nxt.append(m)
            frontier = nxt
        return seen

    f = bfs(fwd_adj, pivot)
    b = bfs(bwd_adj, pivot)
    assert (row["n_forward"], row["n_backward"]) == (len(f), len(b))
    assert row["n_core"] == len(f & b)
    # the pivot is in its own core; the core is a real subset
    assert 1 <= row["n_core"] <= min(row["n_forward"], row["n_backward"])
