"""Session-59: egress billing, corruption resync."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_egress_billing_piecewise(spark):
    from openreviewcrawler_spark.catalog import (
        _EGRESS_P1,
        _EGRESS_P2,
        _EGRESS_P3,
        _EGRESS_T1_KB,
        _EGRESS_T2_KB,
        q_crawl_egress_billing,
    )

    rows = {r["host"]: r for r in q_crawl_egress_billing(spark, SF).collect()}
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    import collections

    per = collections.Counter()
    for d in docs:
        per[f"{d['source']}.example"] += 200 + (d["doc_id"] * 131) % 5000
    assert set(rows) == set(per)
    for h, b in per.items():
        kb = b // 1024
        billed = (
            min(kb, _EGRESS_T1_KB) * _EGRESS_P1
            + min(max(kb - _EGRESS_T1_KB, 0), _EGRESS_T2_KB - _EGRESS_T1_KB)
            * _EGRESS_P2
            + max(kb - _EGRESS_T2_KB, 0) * _EGRESS_P3
        )
        r = rows[h]
        assert (r["bytes_total"], r["kb_total"]) == (b, kb)
        assert r["billed_microcents"] == billed
    # the fixture's per-host volume exercises at least two tiers
    assert any(r["kb_total"] > _EGRESS_T1_KB for r in rows.values())


def test_corruption_resync_offsets(spark):
    from openreviewcrawler_spark.catalog import (
        _CORRUPT_AT,
        q_warc_corruption_resync,
        q_warc_cdx_index,
    )

    rows = {r["shard"]: r for r in q_warc_corruption_resync(spark, SF).collect()}
    cdx = q_warc_cdx_index(spark, SF).collect()
    import collections

    per = collections.defaultdict(list)
    for r in cdx:
        per[r["shard"]].append((r["offset"], r["record_len"]))
    assert set(rows) == set(per)
    for s, recs in per.items():
        r = rows[s]
        after = [o for o, _ in recs if o >= _CORRUPT_AT]
        torn = sum(1 for o, ln in recs if o < _CORRUPT_AT < o + ln)
        assert r["n_records"] == len(recs)
        assert r["resync_offset"] == min(after)
        assert r["bytes_skipped"] == min(after) - _CORRUPT_AT
        assert r["n_torn"] == torn
        assert r["n_recoverable"] == len(after)
        assert r["n_torn"] <= 1  # at most one record straddles a point
    assert any(r["n_torn"] == 1 for r in rows.values())
