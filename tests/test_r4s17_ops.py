"""Session-17 operators: grouped HLL cardinality, source signature terms."""

from __future__ import annotations

import collections
import hashlib

SF = "/root/testdata/sf0.001"


def test_grouped_hll_matches_reference_sketch(spark):
    """The grouped sketch must equal a per-group Python HLL with the same
    geometry (m=256, md5-32 hash) — and the exact column is the truth."""
    from openreviewcrawler_spark.catalog import q_host_url_cardinality_hll
    from openreviewcrawler_spark.operators.sketch import (
        HLL_M,
        HLL_RHO_MAX,
    )

    ids = [r["doc_id"] for r in
           spark.read.parquet(f"{SF}/documents.parquet").select("doc_id").collect()]
    regs = collections.defaultdict(dict)
    exact = collections.defaultdict(set)
    for i in ids:
        url = f"u{i % 997}"
        host = f"h{(i % 997) % 5}"
        exact[host].add(url)
        h32 = int(hashlib.md5(url.encode()).hexdigest()[:8], 16)
        bucket, w = h32 % HLL_M, h32 // HLL_M
        if w == 0:
            rho = HLL_RHO_MAX
        else:
            rho = 1
            while w % 2 == 0:
                w //= 2
                rho += 1
        regs[host][bucket] = max(regs[host].get(bucket, 0), rho)
    rows = {r["host"]: r for r in q_host_url_cardinality_hll(spark, SF).collect()}
    assert set(rows) == set(exact)
    for host, r in rows.items():
        m_regs = regs[host]
        harmonic = sum(1 << (HLL_RHO_MAX - rho) for rho in m_regs.values())
        harmonic += (HLL_M - len(m_regs)) * (1 << HLL_RHO_MAX)
        assert r["n_zero"] == HLL_M - len(m_regs)
        assert r["harmonic_scaled"] == harmonic
        assert r["exact_distinct"] == len(exact[host])
        # raw estimator in the low-fill regime undershoots; sanity bound
        assert 0 < r["est_distinct"] < 4 * r["exact_distinct"]


def test_signature_terms_are_overrepresented(spark):
    from openreviewcrawler_spark.catalog import (
        _SIG_MIN_COUNT,
        _SIG_TOP_K,
        q_text_source_signature_terms,
    )

    rows = q_text_source_signature_terms(spark, SF).collect()
    by_src = collections.defaultdict(list)
    for r in rows:
        by_src[r["source"]].append(r)
    n_sources = spark.read.parquet(f"{SF}/documents.parquet").select(
        "source"
    ).distinct().count()
    assert len(by_src) == n_sources
    for src, rs in by_src.items():
        assert len(rs) == _SIG_TOP_K
        assert [r["rank"] for r in sorted(rs, key=lambda r: r["rank"])] == list(
            range(1, _SIG_TOP_K + 1)
        )
        for r in rs:
            assert r["n_t"] >= _SIG_MIN_COUNT
            assert r["n_ts"] <= r["n_t"]
            # a signature term is over-represented: lift > 1x
            assert r["lift_ppm"] > 1_000_000


def test_signature_terms_lift_matches_counts(spark):
    from openreviewcrawler_spark.catalog import q_text_source_signature_terms

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "source", "text"
    ).collect()
    n_ts = collections.Counter()
    n_t = collections.Counter()
    n_s = collections.Counter()
    for r in docs:
        for t in r["text"].split(" "):
            n_ts[(t, r["source"])] += 1
            n_t[t] += 1
            n_s[r["source"]] += 1
    n_all = sum(n_t.values())
    for r in q_text_source_signature_terms(spark, SF).collect():
        key = (r["token"], r["source"])
        assert r["n_ts"] == n_ts[key]
        assert r["n_t"] == n_t[r["token"]]
        expect = (n_ts[key] * n_all * 1_000_000) // (
            n_t[r["token"]] * n_s[r["source"]]
        )
        assert r["lift_ppm"] == expect
