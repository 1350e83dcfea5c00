"""Session-72: redirect cycle census, hapax share."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_redirect_cycle_census(spark):
    from openreviewcrawler_spark.catalog import (
        q_crawl_redirect_cycle_census,
        q_crawl_redirect_resolve,
    )

    rows = {r["loop_anchor"]: r for r in q_crawl_redirect_cycle_census(spark, SF).collect()}
    res = q_crawl_redirect_resolve(spark, SF).collect()
    unresolved = [r for r in res if not r["resolved"]]
    assert unresolved  # the synthesis plants loops
    import collections

    exp = collections.defaultdict(list)
    for r in unresolved:
        exp[r["final_url"]].append(r["hops"])
    assert set(rows) == set(exp)
    for anchor, hops in exp.items():
        r = rows[anchor]
        assert r["n_members"] == len(hops)
        assert r["min_hops"] == min(hops)
        assert r["max_hops"] == max(hops)
    assert sum(r["n_members"] for r in rows.values()) == len(unresolved)


def test_hapax_share(spark):
    from openreviewcrawler_spark.catalog import q_text_hapax_share

    rows = {r["source"]: r for r in q_text_hapax_share(spark, SF).collect()}
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    import collections

    agg = collections.defaultdict(lambda: [0, 0, 0])
    for d in docs:
        c = collections.Counter(d["text"].split(" "))
        a = agg[d["source"]]
        a[0] += sum(c.values())
        a[1] += len(c)
        a[2] += sum(1 for n in c.values() if n == 1)
    assert set(rows) == set(agg)
    for s, (nt, ty, hp) in agg.items():
        r = rows[s]
        assert r["n_tokens"] == nt
        assert r["n_types"] == ty
        assert r["n_hapax"] == hp
        assert r["hapax_ppm"] == hp * 1_000_000 // ty
    # a ~45-token doc over a 30-word vocabulary keeps roughly a third
    # of its types as singletons — non-degenerate on every source
    assert all(100_000 < r["hapax_ppm"] < 700_000 for r in rows.values())
