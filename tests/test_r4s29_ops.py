"""Session-29 operators: conversion-lag histogram, shard checksums."""

from __future__ import annotations

import collections
import hashlib

SF = "/root/testdata/sf0.001"


def test_conversion_lag_matches_model(spark):
    from openreviewcrawler_spark.catalog import (
        _events_ms,
        q_event_conversion_lag_histogram,
    )

    rows = _events_ms(spark, SF).collect()
    fv, fp = {}, {}
    for r in rows:
        if r["event_type"] == "view":
            fv[r["user_id"]] = min(fv.get(r["user_id"], r["ts_ms"]), r["ts_ms"])
        elif r["event_type"] == "purchase":
            fp[r["user_id"]] = min(fp.get(r["user_id"], r["ts_ms"]), r["ts_ms"])

    def bucket(m):
        return 0 if m <= 1 else 1 if m <= 10 else 2 if m <= 60 else 3 if m <= 1440 else 4

    expect = collections.defaultdict(lambda: [0, 0])
    for u in set(fv) & set(fp):
        if fp[u] >= fv[u]:
            lag = (fp[u] - fv[u]) // 60_000
            e = expect[bucket(lag)]
            e[0] += 1
            e[1] = max(e[1], lag)
    tot = sum(v[0] for v in expect.values())
    got = {r["bucket"]: r for r in q_event_conversion_lag_histogram(spark, SF).collect()}
    assert set(got) == set(expect)
    for b, (n, mx) in expect.items():
        r = got[b]
        assert (r["n_users"], r["max_lag_min"]) == (n, mx)
        assert r["share_ppm"] == n * 1_000_000 // tot


def test_shard_checksums_are_order_independent_and_exact(spark):
    from openreviewcrawler_spark.catalog import q_traindata_shard_checksums

    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    expect = collections.defaultdict(lambda: [0, 0, 0])
    for r in docs:
        h = int(hashlib.md5(r["text"].encode()).hexdigest()[:8], 16)
        e = expect[r["doc_id"] % 8]
        e[0] += 1
        e[1] += r["n_chars"]
        e[2] += h
    got = {r["shard"]: r for r in q_traindata_shard_checksums(spark, SF).collect()}
    assert set(got) == set(expect)
    for s, (n, b, c) in expect.items():
        r = got[s]
        assert (r["n_docs"], r["n_bytes"], r["content_checksum"]) == (n, b, c)
    # order independence: a different input partitioning yields identical rows
    from openreviewcrawler_spark.catalog import CATALOG

    a = sorted(map(tuple, CATALOG["traindata_shard_checksums"].build(spark, SF).collect()))
    assert a == sorted(
        (r["shard"], r["n_docs"], r["n_bytes"], r["content_checksum"])
        for r in got.values()
    )
