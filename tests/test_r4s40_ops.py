"""Session-40 operators: CDC chunk dedup, param-order normalization,
channel budget split."""

from __future__ import annotations

import hashlib

SF = "/root/testdata/sf0.001"


def test_cdc_chunks_match_python_reference(spark):
    from openreviewcrawler_spark.catalog import _CDC_MASK, q_dedup_cdc_chunks

    [row] = q_dedup_cdc_chunks(spark, SF).collect()
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    import collections

    occ = collections.Counter()
    widths = {}
    n_chunks = 0
    for d in docs:
        toks = d["text"].split(" ")
        chunk_id = []
        cid = 0
        for i, _t in enumerate(toks):
            if i >= 2:
                gram = " ".join(toks[i - 2 : i + 1])
                h = int(hashlib.md5(gram.encode()).hexdigest()[:8], 16)
                if h % _CDC_MASK == 0:
                    cid += 1
            chunk_id.append(cid)
        for c in sorted(set(chunk_id)):
            txt = " ".join(t for t, ci in zip(toks, chunk_id) if ci == c)
            occ[hashlib.md5(txt.encode()).hexdigest()] += 1
            widths[hashlib.md5(txt.encode()).hexdigest()] = len(txt.split(" "))
            n_chunks += 1
    assert row["n_chunks"] == n_chunks
    assert row["n_unique_chunks"] == len(occ)
    n_tokens = sum(occ[h] * widths[h] for h in occ)
    dup_tokens = sum((occ[h] - 1) * widths[h] for h in occ)
    assert row["n_tokens"] == n_tokens
    assert row["dup_tokens"] == dup_tokens
    assert row["dup_ppm"] == dup_tokens * 1_000_000 // n_tokens
    assert row["mean_chunk_tokens"] == n_tokens // n_chunks
    # content-defined boundaries actually fire (chunks ≈ 16 tokens wide)
    assert 4 <= row["mean_chunk_tokens"] <= 40
    assert row["n_chunks"] > len(docs)


def test_param_order_normalization_halves_aliased_pairs(spark):
    from openreviewcrawler_spark.catalog import q_url_param_order_normalize

    rows = q_url_param_order_normalize(spark, SF).collect()
    assert rows
    for r in rows:
        assert r["n_canonical"] <= r["n_raw_variants"] <= r["n_urls"]
        expect = (
            (r["n_raw_variants"] - r["n_canonical"]) * 1_000_000
            // r["n_raw_variants"]
        )
        assert r["merge_savings_ppm"] == expect
    # the parity-split synthesis plants real order-aliases somewhere
    assert any(r["n_canonical"] < r["n_raw_variants"] for r in rows)


def test_channel_budget_split_conserves_and_floors(spark):
    from openreviewcrawler_spark.catalog import (
        _CHANNEL_BUDGET,
        q_crawl_channel_budget_split,
        q_crawl_discovery_channel_audit,
    )

    rows = q_crawl_channel_budget_split(spark, SF).collect()
    audit = {r["channel"]: r for r in q_crawl_discovery_channel_audit(spark, SF).collect()}
    assert {r["channel"] for r in rows} == set(audit)
    u_tot = sum(a["n_pages"] - a["n_dup"] for a in audit.values())
    k = len(rows)
    for r in rows:
        a = audit[r["channel"]]
        uniq = a["n_pages"] - a["n_dup"]
        assert r["n_unique"] == uniq
        assert r["exploit_budget"] == (_CHANNEL_BUDGET * 90 // 100) * uniq // u_tot
        assert r["explore_budget"] == (_CHANNEL_BUDGET * 10 // 100) // k
        assert r["total_budget"] == r["exploit_budget"] + r["explore_budget"]
        assert r["explore_budget"] > 0  # the bandit floor never starves
    # floors never overshoot the budget
    assert sum(r["total_budget"] for r in rows) <= _CHANNEL_BUDGET
    # exploit share tracks unique yield ordering
    srt = sorted(rows, key=lambda r: r["n_unique"])
    for x, y in zip(srt, srt[1:]):
        assert x["exploit_budget"] <= y["exploit_budget"]
