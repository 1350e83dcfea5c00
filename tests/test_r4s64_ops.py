"""Session-64: harmonic reach, LTV age curve."""

from __future__ import annotations

import math
from decimal import ROUND_HALF_UP, Decimal

SF = "/root/testdata/sf0.001"


def test_harmonic_reach_from_histogram(spark):
    from openreviewcrawler_spark.catalog import (
        q_graph_distance_histogram,
        q_graph_seed_harmonic_reach,
    )

    [row] = q_graph_seed_harmonic_reach(spark, SF).collect()
    hist = {
        r["depth"]: r["n_nodes"]
        for r in q_graph_distance_histogram(spark, SF).collect()
        if r["depth"] >= 0
    }
    n = sum(hist.values())
    harm = sum(c * (1_000_000 // d) for d, c in hist.items() if d > 0)
    mean_md = sum(c * d for d, c in hist.items()) * 1000 // n
    assert row["n_reached"] == n
    assert row["harmonic_micro"] == harm
    assert row["mean_depth_milli"] == mean_md
    assert row["harmonic_micro"] > 0


def test_ltv_age_curve_cumulative(spark):
    from openreviewcrawler_spark.catalog import q_event_ltv_age_curve

    rows = sorted(q_event_ltv_age_curve(spark, SF).collect(), key=lambda r: r["age_days"])
    assert rows
    assert rows[0]["age_days"] == 0
    ev = spark.read.parquet(f"{SF}/events.parquet").collect()
    import collections

    first = {}
    for e in ev:
        d = int(e["ts"].timestamp() * 1000) // 86400000
        u = e["user_id"]
        if u not in first or d < first[u]:
            first[u] = d
    daily = collections.defaultdict(lambda: [Decimal(0), 0])
    for e in ev:
        d = int(e["ts"].timestamp() * 1000) // 86400000
        a = daily[d - first[e["user_id"]]]
        a[0] += Decimal(e["value"]).quantize(
            Decimal("0.0001"), rounding=ROUND_HALF_UP
        )
        a[1] += 1
    assert len(rows) == len(daily)
    cum = 0
    for r in rows:
        dec, n = daily[r["age_days"]]
        cents = int(math.floor(dec * 100))
        assert (r["n_events"], r["day_cents"]) == (n, cents)
        cum += cents
        assert r["cum_cents"] == cum
    # the curve is non-decreasing and day 0 carries real mass
    assert rows[0]["day_cents"] > 0
    assert rows[-1]["cum_cents"] == cum
