"""Session-76: lag-24 autocorrelation."""

from __future__ import annotations

import math

SF = "/root/testdata/sf0.001"


def test_hourly_autocorr_24(spark):
    from openreviewcrawler_spark.catalog import q_event_hourly_autocorr_24

    [row] = q_event_hourly_autocorr_24(spark, SF).collect()
    ev = spark.read.parquet(f"{SF}/events.parquet").collect()
    import collections

    hourly = collections.Counter(
        int(e["ts"].timestamp() * 1000) // 3600000 for e in ev
    )
    lo, hi = min(hourly), max(hourly)
    pairs = [
        (hourly.get(h, 0), hourly.get(h + 24, 0))
        for h in range(lo, hi - 24 + 1)
    ]
    # the engine's dense union only materializes hours where EITHER side
    # is nonzero; (0, 0) rows are absent. Mirror that.
    pairs = [(x, y) for x, y in pairs if x or y]
    m = len(pairs)
    assert row["n_hour_pairs"] == m
    sx = sum(x for x, _ in pairs)
    sy = sum(y for _, y in pairs)
    sxy = sum(x * y for x, y in pairs)
    sxx = sum(x * x for x, _ in pairs)
    syy = sum(y * y for _, y in pairs)
    num = m * sxy - sx * sy
    den = math.sqrt(m * sxx - sx * sx) * math.sqrt(m * syy - sy * sy)
    assert abs(row["r_corr"] - math.floor(num / den * 1e6) / 1e6) < 2e-6
    assert -1.0 <= row["r_corr"] <= 1.0
