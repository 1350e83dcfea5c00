"""Session-62: CUPED adjustment."""

from __future__ import annotations

import hashlib
import math
from decimal import ROUND_HALF_UP, Decimal

SF = "/root/testdata/sf0.001"


def test_cuped_matches_python_and_reduces_variance(spark):
    from openreviewcrawler_spark.catalog import q_event_ab_cuped_adjust

    [row] = q_event_ab_cuped_adjust(spark, SF).collect()
    ev = spark.read.parquet(f"{SF}/events.parquet").collect()
    ts = [int(e["ts"].timestamp() * 1000) for e in ev]
    lo, hi = min(ts), max(ts)
    import collections

    halves = collections.defaultdict(lambda: [Decimal(0), Decimal(0)])
    for e, t in zip(ev, ts):
        v = Decimal(e["value"]).quantize(Decimal("0.0001"), rounding=ROUND_HALF_UP)
        halves[e["user_id"]][0 if t * 2 < lo + hi else 1] += v
    per = {}
    for u, (a, b) in halves.items():
        var = int(hashlib.md5(str(u).encode()).hexdigest()[:8], 16) % 2
        per[u] = (var, int(math.floor(a * 100)), int(math.floor(b * 100)))
    n = len(per)
    xs = [x for _, x, _ in per.values()]
    ys = [y for _, _, y in per.values()]
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    syy = sum(y * y for y in ys)
    theta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    rho2 = (n * sxy - sx * sy) ** 2 / ((n * sxx - sx * sx) * (n * syy - sy * sy))
    assert row["n_users"] == n
    assert row["theta_micro"] == math.floor(theta * 1e6)
    assert row["var_reduction_ppm"] == math.floor(rho2 * 1e6)
    for v, (na_key, adj_key, raw_key) in [
        (0, ("n_a", "adj_mean_a_cents", "raw_mean_a_cents")),
        (1, ("n_b", "adj_mean_b_cents", "raw_mean_b_cents")),
    ]:
        grp = [(x, y) for var, x, y in per.values() if var == v]
        nv = len(grp)
        sxv = sum(x for x, _ in grp)
        syv = sum(y for _, y in grp)
        assert row[na_key] == nv
        assert row[raw_key] == syv // nv
        adj = syv / nv - theta * (sxv / nv - sx / n)
        assert row[adj_key] == math.floor(adj)
    # rho-squared is a valid fraction (the tiny sf0.001 cohort barely
    # correlates pre/post — the exact-recount asserts above are the
    # real check; at sf0.01 the reduction reads ~7%)
    assert 0 <= row["var_reduction_ppm"] <= 1_000_000
