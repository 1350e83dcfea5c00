"""Session-57: market segment value, part size/demand correlation."""

from __future__ import annotations

import math
from decimal import ROUND_HALF_UP, Decimal

SF = "/root/testdata/sf0.001"
Q4 = Decimal("0.0001")


def test_mktsegment_value_rollup(spark):
    from openreviewcrawler_spark.catalog import q_customer_mktsegment_value

    rows = {r["c_mktsegment"]: r for r in q_customer_mktsegment_value(spark, SF).collect()}
    custs = spark.read.parquet(f"{SF}/customer.parquet").collect()
    orders = spark.read.parquet(f"{SF}/orders.parquet").collect()
    import collections

    per_cust = collections.defaultdict(lambda: [0, 0])
    for o in orders:
        a = per_cust[o["o_custkey"]]
        a[0] += 1
        a[1] += int(
            math.floor(
                Decimal(o["o_totalprice"]).quantize(Q4, rounding=ROUND_HALF_UP)
                * 100
            )
        )
    exp = collections.defaultdict(lambda: [0, 0, 0])
    for c in custs:
        e = exp[c["c_mktsegment"]]
        n, cents = per_cust.get(c["c_custkey"], (0, 0))
        e[0] += 1
        e[1] += n
        e[2] += cents
    assert set(rows) == set(exp)
    for seg, (nc, no, rc) in exp.items():
        r = rows[seg]
        assert (r["n_customers"], r["n_orders"], r["revenue_cents"]) == (nc, no, rc)
        if no:
            assert r["mean_order_cents"] == rc // no
    assert sum(r["n_customers"] for r in rows.values()) == len(custs)


def test_part_size_demand_corr(spark):
    from openreviewcrawler_spark.catalog import q_part_size_demand_corr

    [row] = q_part_size_demand_corr(spark, SF).collect()
    parts = spark.read.parquet(f"{SF}/part.parquet").collect()
    li = spark.read.parquet(f"{SF}/lineitem.parquet").collect()
    import collections

    demand = collections.Counter()
    for l_ in li:
        demand[l_["l_partkey"]] += int(l_["l_quantity"])
    xs = [p["p_size"] for p in parts]
    ys = [demand.get(p["p_partkey"], 0) for p in parts]
    m = len(xs)
    assert row["n_parts"] == m
    sx, sy = sum(xs), sum(ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    sxx, syy = sum(a * a for a in xs), sum(b * b for b in ys)
    num = m * sxy - sx * sy
    den = math.sqrt(m * sxx - sx * sx) * math.sqrt(m * syy - sy * sy)
    assert abs(row["r_corr"] - math.floor(num / den * 1e6) / 1e6) < 2e-6
    # synthetic demand shouldn't correlate strongly with size
    assert abs(row["r_corr"]) < 0.5
