"""Session-56: repeat customers, brand discount exposure."""

from __future__ import annotations

import math
from decimal import ROUND_HALF_UP, Decimal

SF = "/root/testdata/sf0.001"
Q4 = Decimal("0.0001")


def test_repeat_segments_partition_customers(spark):
    from openreviewcrawler_spark.catalog import q_customer_repeat_segments

    rows = {r["segment"]: r for r in q_customer_repeat_segments(spark, SF).collect()}
    orders = spark.read.parquet(f"{SF}/orders.parquet").collect()
    import collections

    per = collections.defaultdict(lambda: [0, 0])
    for o in orders:
        a = per[o["o_custkey"]]
        a[0] += 1
        a[1] += int(
            math.floor(
                Decimal(o["o_totalprice"]).quantize(Q4, rounding=ROUND_HALF_UP)
                * 100
            )
        )
    exp = collections.defaultdict(lambda: [0, 0, 0])
    for n, cents in per.values():
        seg = "one_time" if n == 1 else "casual" if n <= 3 else "loyal"
        e = exp[seg]
        e[0] += 1
        e[1] += n
        e[2] += cents
    assert set(rows) == set(exp)
    for seg, (nc, no, rc) in exp.items():
        r = rows[seg]
        assert (r["n_customers"], r["n_orders"], r["revenue_cents"]) == (nc, no, rc)
    assert sum(r["n_orders"] for r in rows.values()) == len(orders)


def test_brand_discount_exposure(spark):
    from openreviewcrawler_spark.catalog import q_part_brand_discount_exposure

    rows = {r["p_brand"]: r for r in q_part_brand_discount_exposure(spark, SF).collect()}
    assert rows
    parts = {
        p["p_partkey"]: p["p_brand"]
        for p in spark.read.parquet(f"{SF}/part.parquet").collect()
    }
    li = spark.read.parquet(f"{SF}/lineitem.parquet").collect()
    import collections

    agg = collections.defaultdict(lambda: [0, 0, Decimal(0)])
    for l_ in li:
        b = parts.get(l_["l_partkey"])
        if b is None:
            continue
        a = agg[b]
        a[0] += 1
        a[1] += int(l_["l_quantity"])
        a[2] += Decimal(l_["l_extendedprice"]).quantize(
            Q4, rounding=ROUND_HALF_UP
        ) * Decimal(l_["l_discount"]).quantize(Q4, rounding=ROUND_HALF_UP)
    assert set(rows) == set(agg)
    total = sum(int(math.floor(v[2] * 100)) for v in agg.values())
    for b, (n, q, disc) in agg.items():
        r = rows[b]
        cents = int(math.floor(disc * 100))
        assert (r["n_lineitems"], r["quantity"], r["discount_cents"]) == (n, q, cents)
        assert r["discount_share_ppm"] == cents * 1_000_000 // total
