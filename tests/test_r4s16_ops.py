"""Session-16 operators: per-type value percentiles, context-length
capacity sweep."""

from __future__ import annotations

import collections
import math

SF = "/root/testdata/sf0.001"


def _p_disc(xs, p):
    xs = sorted(xs)
    return xs[max(0, math.ceil(p * len(xs)) - 1)]


def test_value_percentiles_match_order_statistics(spark):
    from openreviewcrawler_spark.catalog import q_event_value_percentiles

    ev = spark.read.parquet(f"{SF}/events.parquet").collect()
    by_type = collections.defaultdict(list)
    for r in ev:
        by_type[r["event_type"]].append(r["value"])
    got = {r["event_type"]: r for r in q_event_value_percentiles(spark, SF).collect()}
    assert set(got) == set(by_type)
    for typ, xs in by_type.items():
        r = got[typ]
        assert r["n"] == len(xs)
        assert r["p50_value"] == _p_disc(xs, 0.5)
        assert r["p90_value"] == _p_disc(xs, 0.9)
        assert r["p99_value"] == _p_disc(xs, 0.99)
        assert r["max_value"] == max(xs)


def test_context_sweep_closed_forms(spark):
    from openreviewcrawler_spark.catalog import (
        _CTX_GRID,
        q_traindata_context_sweep,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet").select("text").collect()
    toks = [len(r["text"].split(" ")) for r in docs]
    got = {r["w"]: r for r in q_traindata_context_sweep(spark, SF).collect()}
    assert set(got) == set(_CTX_GRID)
    for w in _CTX_GRID:
        n_fit = sum(t <= w for t in toks)
        k = [-(-t // w) for t in toks]
        pad = [ki * w - t for ki, t in zip(k, toks)]
        r = got[w]
        assert r["n_docs"] == len(toks)
        assert r["n_fit_whole"] == n_fit
        assert r["n_chunks"] == sum(k)
        assert r["n_tokens"] == sum(toks)
        assert r["pad_tokens"] == sum(pad)
        assert r["pad_ppm"] == sum(pad) * 1_000_000 // (sum(k) * w)
    # a larger context always wastes MORE capacity on this corpus shape
    # (short docs): pad share grows with w
    ppms = [got[w]["pad_ppm"] for w in sorted(_CTX_GRID)]
    assert ppms == sorted(ppms)
