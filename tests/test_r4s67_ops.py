"""Session-67: daily SRM trend, dedup granularity card."""

from __future__ import annotations

import hashlib
import re

SF = "/root/testdata/sf0.001"


def test_srm_daily_trend(spark):
    from openreviewcrawler_spark.catalog import q_event_srm_daily_trend

    rows = {r["day"]: r for r in q_event_srm_daily_trend(spark, SF).collect()}
    assert len(rows) > 10
    ev = spark.read.parquet(f"{SF}/events.parquet").collect()
    import collections

    per = collections.defaultdict(lambda: [0, 0])
    for e in ev:
        day = int(e["ts"].timestamp() * 1000) // 86400000
        v = int(re.search(r"([0-9]+)", e["props"]).group(1)) % 2
        per[day][v] += 1
    assert set(rows) == set(per)
    for d, (a, b) in per.items():
        r = rows[d]
        assert (r["n_a"], r["n_b"]) == (a, b)
        chi2 = (a - b) * (a - b) * 1000 // (a + b)
        assert r["chi2_milli"] == chi2
        assert r["srm_flag"] == (1 if chi2 > 3841 else 0)
    # daily samples are small: flags fire occasionally, never daily
    flags = sum(r["srm_flag"] for r in rows.values())
    assert flags < len(rows) // 2


def test_dedup_granularity_card(spark):
    from openreviewcrawler_spark.catalog import (
        _corpus,
        q_dedup_granularity_card,
    )
    from openreviewcrawler_spark.operators.dedup import PARA_CHUNK_RE

    rows = {r["granularity"]: r for r in q_dedup_granularity_card(spark, SF).collect()}
    assert set(rows) == {"document", "paragraph"}
    corpus = _corpus(spark, SF).collect()
    doc_hashes = [hashlib.md5(c["text"].encode()).hexdigest() for c in corpus]
    # finditer + group(0): findall would return the inner CAPTURE group
    # (the last repeated token), not the whole chunk
    chunks = [
        m.group(0)
        for c in corpus
        for m in re.finditer(PARA_CHUNK_RE, c["text"])
    ]
    d = rows["document"]
    assert d["n_units"] == len(doc_hashes)
    assert d["n_unique"] == len(set(doc_hashes))
    assert d["dup_ppm"] == (d["n_units"] - d["n_unique"]) * 1_000_000 // d["n_units"]
    p = rows["paragraph"]
    assert p["n_units"] == len(chunks)
    chash = {hashlib.md5(ch.encode()).hexdigest() for ch in chunks}
    assert p["n_unique"] == len(chash)
    # paragraph-grain dedup finds AT LEAST the document-grain mass
    assert p["dup_ppm"] >= d["dup_ppm"]
