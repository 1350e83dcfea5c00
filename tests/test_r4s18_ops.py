"""Session-18 operators: discovery-channel yield audit, IDN/punycode
exposure audit."""

from __future__ import annotations

import collections
import hashlib

SF = "/root/testdata/sf0.001"


def test_discovery_channel_audit_matches_model(spark):
    from openreviewcrawler_spark.catalog import q_crawl_discovery_channel_audit

    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    keeper = {}
    for r in docs:
        h = hashlib.md5(r["text"].encode()).hexdigest()
        keeper[h] = min(keeper.get(h, r["doc_id"]), r["doc_id"])
    agg = collections.defaultdict(lambda: [0, 0, 0])
    names = ["seed", "sitemap", "outlink", "recrawl"]
    for r in docs:
        ch = names[r["doc_id"] % 4]
        h = hashlib.md5(r["text"].encode()).hexdigest()
        a = agg[ch]
        a[0] += 1
        a[1] += r["doc_id"] != keeper[h]
        a[2] += r["n_chars"]
    tot = sum(v[2] for v in agg.values())
    got = {r["channel"]: r for r in q_crawl_discovery_channel_audit(spark, SF).collect()}
    assert set(got) == set(agg)
    for ch, (n, nd, b) in agg.items():
        r = got[ch]
        assert (r["n_pages"], r["n_dup"], r["bytes_total"]) == (n, nd, b)
        assert r["dup_ppm"] == nd * 1_000_000 // n
        assert r["mean_bytes"] == b // n
        assert r["byte_share_ppm"] == b * 1_000_000 // tot


def test_idn_audit_matches_model(spark):
    from openreviewcrawler_spark.catalog import q_url_idn_punycode_audit

    ids = [r["doc_id"] for r in
           spark.read.parquet(f"{SF}/documents.parquet").select("doc_id").collect()]
    agg = collections.defaultdict(lambda: [0, 0, set(), set()])
    for i in ids:
        idn = i % 13 == 0
        host = ("xn--frg-" if idn else "") + f"site{i % 9}." + ["com", "org", "net"][i % 3]
        tld = host.split(".")[1]
        a = agg[tld]
        a[0] += 1
        a[1] += idn
        a[2].add(host)
        if idn:
            a[3].add(host)
    got = {r["tld"]: r for r in q_url_idn_punycode_audit(spark, SF).collect()}
    assert set(got) == {"com", "org", "net"}
    for tld, (n, ni, hosts, idn_hosts) in agg.items():
        r = got[tld]
        assert (r["n_urls"], r["n_idn_urls"]) == (n, ni)
        assert r["idn_ppm"] == ni * 1_000_000 // n
        assert (r["n_hosts"], r["n_idn_hosts"]) == (len(hosts), len(idn_hosts))
