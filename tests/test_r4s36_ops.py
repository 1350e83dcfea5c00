"""Session-36 operators: WARC range coalescing, winnowing fingerprints,
fetch parallelism plan."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_range_coalesce_covers_requests_within_gap(spark):
    from openreviewcrawler_spark.catalog import _RANGE_GAP, q_warc_range_coalesce
    from openreviewcrawler_spark.sources.warc import cdx_index
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id",
        "text",
        F.concat(
            F.lit("https://h"),
            F.pmod(F.col("doc_id"), F.lit(7)).cast("string"),
            F.lit(".example/p/"),
            F.col("doc_id").cast("string"),
        ).alias("url"),
    )
    req = [
        (r["shard"], r["offset"], r["record_len"])
        for r in cdx_index(docs, n_shards=8).filter(F.col("doc_id") % 7 == 3).collect()
    ]
    rows = q_warc_range_coalesce(spark, SF).collect()
    assert rows
    # conservation: every requested record is inside exactly one range
    assert sum(r["n_records"] for r in rows) == len(req)
    assert sum(r["payload_bytes"] for r in rows) == sum(x[2] for x in req)
    import collections

    per_shard = collections.defaultdict(list)
    for s, off, ln in req:
        per_shard[s].append((off, ln))
    for r in rows:
        assert r["range_end"] > r["range_start"]
        assert r["waste_bytes"] >= 0
        # no two requested records inside one range are farther apart
        # than the gap, and ranges in a shard don't overlap
        inside = [
            (o, ln)
            for o, ln in per_shard[r["shard"]]
            if r["range_start"] <= o < r["range_end"]
        ]
        assert len(inside) == r["n_records"]
        inside.sort()
        for (o1, l1), (o2, _) in zip(inside, inside[1:]):
            assert o2 - (o1 + l1) <= _RANGE_GAP
    # coalescing is non-trivial at this sf: some range holds >1 record
    assert any(r["n_records"] > 1 for r in rows)


def test_winnowing_matches_reference_implementation(spark):
    import hashlib

    from openreviewcrawler_spark.catalog import (
        _WINNOW_K,
        _WINNOW_W,
        q_dedup_winnowing,
    )

    rows = {r["doc_id"]: r for r in q_dedup_winnowing(spark, SF).collect()}
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    k, w = _WINNOW_K, _WINNOW_W

    def h32(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    checked = 0
    for d in docs[:50]:
        toks = d["text"].split(" ")
        if len(toks) < k + w - 1:
            assert d["doc_id"] not in rows
            continue
        grams = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
        hs = [h32(g) for g in grams]
        wins = [min(hs[i : i + w]) for i in range(len(hs) - w + 1)]
        r = rows[d["doc_id"]]
        assert r["n_kgrams"] == len(grams)
        assert r["n_fingerprints"] == len(set(wins))
        assert r["fp_ppm"] == len(set(wins)) * 1_000_000 // len(grams)
        checked += 1
    assert checked > 30
    # winnowing keeps roughly 2/(w+1) of positions — far fewer than all
    assert all(r["n_fingerprints"] < r["n_kgrams"] for r in rows.values())


def test_parallelism_plan_respects_rate_bound(spark):
    from openreviewcrawler_spark.catalog import q_host_fetch_parallelism_plan

    rows = q_host_fetch_parallelism_plan(spark, SF).collect()
    assert rows
    delayed = [r for r in rows if r["delay_ms"] > 0]
    free = [r for r in rows if r["delay_ms"] == 0]
    assert delayed and free  # sources ending in 2 carry the 5 s delay
    for r in delayed:
        assert r["n_connections"] == 1
    for r in free:
        assert r["n_connections"] == min(4, max(1, r["p50_ms"] // 250))
        assert 1 <= r["n_connections"] <= 4
