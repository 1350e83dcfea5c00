"""Session-74: Amdahl speedup model."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_amdahl_model(spark):
    from openreviewcrawler_spark.catalog import (
        _AMDAHL_CORE_GRID,
        _AMDAHL_SERIAL_MS,
        q_crawl_amdahl_speedup_model,
    )

    rows = {r["cores"]: r for r in q_crawl_amdahl_speedup_model(spark, SF).collect()}
    assert set(rows) == set(_AMDAHL_CORE_GRID)
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    w = sum(200 + (d["doc_id"] * 131) % 5000 for d in docs) // 100
    base = _AMDAHL_CORE_GRID[0]
    t_base = _AMDAHL_SERIAL_MS + w // base
    for c in _AMDAHL_CORE_GRID:
        r = rows[c]
        t = _AMDAHL_SERIAL_MS + w // c
        assert r["w_ms"] == w
        assert r["t_ms"] == t
        assert r["speedup_milli"] == t_base * 1000 // t
        assert r["strong_efficiency_ppm"] == t_base * 1_000_000 * base // (t * c)
    # the serial floor caps efficiency: it decays monotonically with
    # cores, and at 32 cores the model says sub-linear loudly
    eff = [rows[c]["strong_efficiency_ppm"] for c in sorted(rows)]
    assert eff[0] == 1_000_000
    assert eff[0] > eff[1] > eff[2]
