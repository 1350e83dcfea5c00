"""Unit tests for the round-4 pipeline operators: PII scrub, CDX index,
boilerplate strip, shard manifest."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from openreviewcrawler_spark.operators.pii import pii_cols
from openreviewcrawler_spark.operators.packing import prefix_sum_scalable
from openreviewcrawler_spark.sources.warc import cdx_index, warc_layout


def test_pii_counts_and_redaction(spark):
    rows = [
        (0, "write to alice.smith@corp.example for help"),
        (1, "server at 10.12.0.7 and backup 192.168.1.200 up"),
        (2, "call 555-867-5309 today"),
        (3, "no pii here at all"),
        # email whose host is a dotted quad: ONE email, zero extra IPs —
        # the IP pass runs on the post-email intermediate
        (4, "root@10.0.0.1.example now"),
        # dotted quad must not double-count as a phone
        (5, "ping 100.200.300.4000 mixed"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    c = pii_cols(F.col("text"))
    out = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            c["n_emails"].alias("e"),
            c["n_ipv4"].alias("i"),
            c["n_phones"].alias("p"),
            c["redacted"].alias("red"),
        ).collect()
    }
    assert (out[0]["e"], out[0]["i"], out[0]["p"]) == (1, 0, 0)
    assert out[0]["red"] == "write to <EMAIL> for help"
    assert (out[1]["e"], out[1]["i"], out[1]["p"]) == (0, 2, 0)
    assert out[1]["red"] == "server at <IP> and backup <IP> up"
    assert (out[2]["e"], out[2]["i"], out[2]["p"]) == (0, 0, 1)
    assert out[2]["red"] == "call <PHONE> today"
    assert (out[3]["e"], out[3]["i"], out[3]["p"]) == (0, 0, 0)
    assert out[3]["red"] == "no pii here at all"
    assert out[4]["e"] == 1 and out[4]["i"] == 0
    # 100.200.300.4000: IPv4 pass consumes a leftmost-greedy prefix, so the
    # phone pass must see no 3-3-4 digit shape afterwards
    assert out[5]["p"] == 0


def test_cdx_index_surt_offsets_digest(spark):
    rows = [
        (0, "aaaa", "https://b.a.example/x/0"),
        (1, "bbbbbb", "https://a.example/y/1"),
        (2, "cc", "https://b.a.example/x/2"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "url"])
    out = {r["doc_id"]: r for r in cdx_index(docs, n_shards=2).collect()}
    assert out[0]["surt"] == "example,a,b)/x/0"
    assert out[1]["surt"] == "example,a)/y/1"
    # md5 digest of the payload, hex
    assert out[0]["digest"] == hashlib.md5(b"aaaa").hexdigest()
    # offsets: doc 0 and 2 share shard 0 (doc_id % 2); 2 starts after 0
    assert out[0]["shard"] == 0 and out[2]["shard"] == 0
    assert out[0]["offset"] == 0
    assert out[2]["offset"] == out[0]["record_len"]
    # layout agrees with warc_layout on the same input
    lay = {r["doc_id"]: r for r in warc_layout(docs, n_shards=2).collect()}
    for d in (0, 1, 2):
        assert out[d]["offset"] == lay[d]["offset"]
        assert out[d]["record_len"] == lay[d]["record_len"]


def test_boilerplate_strip_keeps_content_lines(spark):
    from openreviewcrawler_spark.catalog import q_text_boilerplate_strip

    # drive the catalog entry itself at the fixture sf — every page is
    # framed with 4-5 chrome lines and exactly one content line survives
    out = q_text_boilerplate_strip(spark, "/root/testdata/sf0.001").collect()
    assert len(out) == 500
    for r in out[:50]:
        assert r["n_kept"] == 1
        assert r["n_lines"] in (4, 5)
        assert 0 < r["kept_chars"] < r["page_chars"]
        assert 0.0 < r["content_ratio"] < 1.0


def test_shard_manifest_boundaries(spark):
    # budget below in SQL/manifest is 65536; use prefix_sum_scalable directly
    # with a tiny budget so shard boundaries land mid-fixture
    rows = [(i, 10) for i in range(100)]  # 1000 bytes total
    df = spark.createDataFrame(rows, ["doc_id", "n_chars"])
    with_off = prefix_sum_scalable(df, "n_chars", ["doc_id"], "cum_before")
    got = (
        with_off.select(
            F.expr("cum_before div 100").cast("long").alias("shard_id"), "doc_id"
        )
        .groupBy("shard_id")
        .agg(F.count("*").alias("n"), F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi"))
        .orderBy("shard_id")
        .collect()
    )
    # 100 docs x 10 bytes / 100-byte budget => 10 shards of exactly 10 docs
    assert len(got) == 10
    for k, r in enumerate(got):
        assert (r["n"], r["lo"], r["hi"]) == (10, k * 10, k * 10 + 9)
