"""Oracle-parity test: pure-Python Murmur3 == Spark's F.hash, byte for byte."""

from __future__ import annotations

from pyspark.sql import functions as F

from openreviewcrawler_spark.hashing import murmur3_str


def test_murmur3_matches_spark_hash(spark):
    urls = [
        "https://host0001.example/p/1",
        "https://host0199.example/p/4999",
        "http://a.b/",
        "",
        "x",
        "xy",
        "xyz",
        "xyzw",
        "xyzwv",
        "ünïcödé/ページ",  # multi-byte utf-8 exercises the signed-byte tail
        "a" * 1000,
    ]
    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    got = {r["url"]: r["h"] for r in df.select("url", F.hash("url").alias("h")).collect()}
    for u in urls:
        assert got[u] == murmur3_str(u), u


def test_murmur3_signed_range():
    vals = [murmur3_str(f"https://h{i}.example/p/{i}") for i in range(500)]
    assert all(-(2**31) <= v < 2**31 for v in vals)
    # hashes should be well spread (no accidental constant)
    assert len(set(vals)) == 500
