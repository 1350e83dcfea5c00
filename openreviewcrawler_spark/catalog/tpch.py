"""tpch family query builders + DuckDB oracles (mechanically split from the catalog monolith)."""

from __future__ import annotations
from collections.abc import Callable
from dataclasses import dataclass
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from ..functions.urls import canonicalize_col, host_col
from ..operators import dedup, multimodal, similarity
from ..operators.labeling import label_row
from ..operators.comment_tree import reply_forest
from ..operators.ordering import assign_seq_scalable
from ..operators.robots import apply_robots
from ..operators.scheduler import admit
from ..operators.seen import anti_join_seen
from ..operators.stats import (
    attach_notes_with_misses,
    count_histogram,
    note_type_col,
    orphan_metrics,
)
from ..operators.textstats import (
    fingerprint_cols,
    lang_id_col,
    quality_score_cols,
    token_count_cols,
)
from ..plans.crawl import seeds_to_frontier
from ._shared import (
    _CORR_PROJ,
    _t,
)



# ---------------------------------------------------------------------------
# TPC-H-style relational coverage (scan/filter/join/agg/window pushdown)
# ---------------------------------------------------------------------------


def _dec_sum(col: F.Column, scale: int = 2) -> F.Column:
    """Order-independent float aggregation: the per-row double value is
    bit-identical in Spark and DuckDB, the DECIMAL(18,4) cast has no rounding
    ties (no binary double lands exactly on a .00005 boundary), and decimal
    summation is exact/associative — so partial-agg order can't flip the last
    rounded digit (the q3_shipping hash-fail root cause, VERDICT r1)."""
    return F.round(F.sum(col.cast("decimal(18,4)")), scale).cast("double")


_SQL_DEC_SUM = "round(sum(({x})::DECIMAL(18,4)), {s})::DOUBLE"


def q_q1_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("2000-12-01")
    )
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        _dec_sum(F.col("l_quantity")).alias("sum_qty"),
        _dec_sum(F.col("l_extendedprice")).alias("sum_base_price"),
        _dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "sum_disc_price"
        ),
        F.round(
            F.sum(F.col("l_quantity").cast("decimal(18,4)")).cast("double")
            / F.count(F.lit(1)),
            4,
        ).alias("avg_qty"),
        F.count("*").alias("count_order"),
    )


SQL_Q1_PRICING = f"""
select l_returnflag, l_linestatus,
  {_SQL_DEC_SUM.format(x='l_quantity', s=2)} as sum_qty,
  {_SQL_DEC_SUM.format(x='l_extendedprice', s=2)} as sum_base_price,
  {_SQL_DEC_SUM.format(x='l_extendedprice * (1 - l_discount)', s=2)} as sum_disc_price,
  round(sum((l_quantity)::DECIMAL(18,4))::DOUBLE / count(*), 4) as avg_qty,
  count(*)::BIGINT as count_order
from lineitem
where l_shipdate <= timestamp '2000-12-01 00:00:00'
group by 1, 2
"""


def q_q3_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3 shape: selective dim filter -> join -> grouped revenue. No forced
    broadcast on customer: it scales linearly with SF (the same rule that
    removed the per-doc broadcast from ngram_jaccard, r3 verdict #2) — AQE
    still picks a broadcast join when the filtered side is actually small.
    Lineitem never scans non-needed columns."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < F.lit("1999-01-01"))
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > F.lit("1999-01-01"))
    j = li.join(o, li.l_orderkey == o.o_orderkey).join(
        c, o.o_custkey == c.c_custkey
    )
    return j.groupBy("o_orderkey").agg(
        _dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")
    )


SQL_Q3_SHIPPING = f"""
select o_orderkey, {_SQL_DEC_SUM.format(x='l_extendedprice * (1 - l_discount)', s=2)} as revenue
from lineitem join orders on l_orderkey = o_orderkey
join customer on o_custkey = c_custkey
where c_mktsegment = 'BUILDING'
  and o_orderdate < timestamp '1999-01-01 00:00:00'
  and l_shipdate > timestamp '1999-01-01 00:00:00'
group by 1
"""


def q_q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5 shape: snowflake joins, revenue per nation. Broadcast hints ONLY
    on the fixed-cardinality dims (nation=25, region=5 rows at every SF);
    customer and supplier scale linearly with SF so they join by shuffle
    unless AQE decides otherwise (same no-forced-broadcast-of-scaling-
    relations rule as q3/ngram_jaccard)."""
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    j = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    return j.groupBy("n_name").agg(
        _dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")
    )


SQL_Q5_REGION_REVENUE = f"""
select n_name, {_SQL_DEC_SUM.format(x='l_extendedprice * (1 - l_discount)', s=2)} as revenue
from lineitem
join orders on l_orderkey = o_orderkey
join customer on o_custkey = c_custkey
join supplier on l_suppkey = s_suppkey and c_nationkey = s_nationkey
join nation on c_nationkey = n_nationkey
join region on n_regionkey = r_regionkey
where r_name = 'ASIA'
group by 1
"""


def q_orders_ship_delay_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-ship latency by priority class over the TPC-H pair: the
    orders⋈lineitem join (the catalog's one genuinely BIG fact-fact
    join — both sides scale with SF, shuffle on the order key, no
    broadcast) rolled up to per-priority delay statistics: exact
    integer day means and the max straggler. Every date math step is
    epoch arithmetic on NTZ-cast timestamps (the parquet timestamp
    lesson)."""
    o = _t(spark, sf_dir, "orders").selectExpr(
        "o_orderkey",
        "o_orderpriority",
        "cast(unix_millis(cast(o_orderdate as timestamp)) as bigint) as od",
    )
    li = _t(spark, sf_dir, "lineitem").selectExpr(
        "l_orderkey",
        "cast(unix_millis(cast(l_shipdate as timestamp)) as bigint) as sd",
    )
    j = li.join(o, li["l_orderkey"] == o["o_orderkey"]).selectExpr(
        "o_orderpriority",
        "cast((sd - od) div 86400000 as bigint) as delay_days",
    )
    return j.groupBy("o_orderpriority").agg(
        F.count("*").cast("long").alias("n_lineitems"),
        F.sum("delay_days").cast("long").alias("delay_days_total"),
        F.max("delay_days").cast("long").alias("max_delay_days"),
    ).selectExpr(
        "o_orderpriority",
        "n_lineitems",
        "delay_days_total",
        "cast(delay_days_total div n_lineitems as bigint) as mean_delay_days",
        "max_delay_days",
    )


SQL_ORDERS_SHIP_DELAY_BY_PRIORITY = """
with o as (
  select o_orderkey, o_orderpriority, epoch_ms(o_orderdate) as od
  from orders
),
li as (select l_orderkey, epoch_ms(l_shipdate) as sd from lineitem),
j as (
  select o.o_orderpriority, ((sd - od) // 86400000)::BIGINT as delay_days
  from li join o on li.l_orderkey = o.o_orderkey
)
select o_orderpriority, count(*)::BIGINT as n_lineitems,
       sum(delay_days)::BIGINT as delay_days_total,
       (sum(delay_days) // count(*))::BIGINT as mean_delay_days,
       max(delay_days)::BIGINT as max_delay_days
from j group by o_orderpriority
"""


# --- session-55: supplier nation revenue, typosquat detection ---------------


def q_supplier_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier-nation revenue rollup (TPC-H flavor): lineitem revenue
    extendedprice·(1−discount) attributed through supplier → nation,
    with each nation's share — the canonical star-join shape: the FACT
    table shuffles once for the rollup; the constant nation dim rides a
    broadcast HINT while the O(SF) supplier dim is left to AQE (hinting
    an SF-scaled relation is the r3 scale-killer class). Revenue is DECIMAL(18,4)
    arithmetic floored to cents — never a double sum."""
    li = _t(spark, sf_dir, "lineitem").selectExpr(
        "l_suppkey",
        "cast(cast(l_extendedprice as decimal(18,4))"
        " * (cast(1 as decimal(18,4)) - cast(l_discount as decimal(18,4)))"
        " as decimal(28,8)) as rev",
    )
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    # nation (25 rows) broadcasts by hint; supplier is O(SF) — no hint,
    # AQE broadcasts it while it fits and shuffles it when it doesn't
    # (the r3 lesson: a forced broadcast of an SF-scaled relation is the
    # one way this plan dies at 100 TB)
    j = li.join(s, li["l_suppkey"] == s["s_suppkey"]).join(
        F.broadcast(n), s["s_nationkey"] == n["n_nationkey"]
    )
    agg = j.groupBy("n_name").agg(
        F.count("*").cast("long").alias("n_lineitems"),
        F.expr("cast(floor(sum(rev) * 100) as bigint)").alias(
            "revenue_cents"
        ),
    )
    wt = Window.partitionBy()
    return agg.withColumn(
        "__tot", F.sum("revenue_cents").over(wt)
    ).selectExpr(
        "n_name",
        "n_lineitems",
        "revenue_cents",
        "cast((revenue_cents * cast(1000000 as bigint)) div __tot"
        " as bigint) as revenue_share_ppm",
    )


SQL_SUPPLIER_NATION_REVENUE = """
with li as (
  select l_suppkey,
         cast(l_extendedprice::DECIMAL(18,4)
              * (1::DECIMAL(18,4) - l_discount::DECIMAL(18,4))
              as decimal(28,8)) as rev
  from lineitem
),
j as (
  select n.n_name, li.rev
  from li join supplier s on li.l_suppkey = s.s_suppkey
       join nation n on s.s_nationkey = n.n_nationkey
),
agg as (
  select n_name, count(*)::BIGINT as n_lineitems,
         cast(floor(sum(rev) * 100) as bigint) as revenue_cents
  from j group by n_name
)
select n_name, n_lineitems, revenue_cents,
       ((revenue_cents * 1000000) // (sum(revenue_cents) over ()))::BIGINT
         as revenue_share_ppm
from agg
"""


# --- session-56: repeat customers, brand discount exposure ------------------


def q_customer_repeat_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeat-purchase segmentation over the orders fact: customers
    banded by lifetime order count (one-time / 2-3 / 4+), each band's
    customer count, order mass and revenue — the first table any
    retention conversation opens with, and a pure two-rollup shape
    (orders → per-customer → bounded band) with decimal-exact cents.
    Complements event_rfm_segments (event-log tiers) on the ORDER
    fact."""
    o = _t(spark, sf_dir, "orders").selectExpr(
        "o_custkey",
        "cast(floor(cast(o_totalprice as decimal(18,4)) * 100) as bigint)"
        " as cents",
    )
    per = o.groupBy("o_custkey").agg(
        F.count("*").cast("long").alias("n_orders"),
        F.sum("cents").cast("long").alias("cents"),
    )
    b = per.selectExpr(
        "case when n_orders = 1 then 'one_time'"
        " when n_orders <= 3 then 'casual' else 'loyal' end as segment",
        "n_orders",
        "cents",
    )
    return b.groupBy("segment").agg(
        F.count("*").cast("long").alias("n_customers"),
        F.sum("n_orders").cast("long").alias("n_orders"),
        F.sum("cents").cast("long").alias("revenue_cents"),
    )


SQL_CUSTOMER_REPEAT_SEGMENTS = """
with o as (
  select o_custkey,
         cast(floor(o_totalprice::DECIMAL(18,4) * 100) as bigint) as cents
  from orders
),
per as (
  select o_custkey, count(*)::BIGINT as n_orders, sum(cents)::BIGINT as cents
  from o group by o_custkey
),
b as (
  select case when n_orders = 1 then 'one_time'
              when n_orders <= 3 then 'casual' else 'loyal' end as segment,
         n_orders, cents
  from per
)
select segment, count(*)::BIGINT as n_customers,
       sum(n_orders)::BIGINT as n_orders,
       sum(cents)::BIGINT as revenue_cents
from b group by segment
"""


def q_part_brand_discount_exposure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand discount exposure: lineitem quantity and given-away
    discount value rolled up through the part dim (unhinted —
    part is O(SF); AQE broadcasts it while it fits),
    with each brand's share of total discount spend — the procurement
    face of the TPC-H pair that q1_pricing's flag rollup doesn't
    split. Discount cents are DECIMAL-exact per row then floored
    once."""
    li = _t(spark, sf_dir, "lineitem").selectExpr(
        "l_partkey",
        "cast(l_quantity as bigint) as qty",
        "cast(cast(l_extendedprice as decimal(18,4))"
        " * cast(l_discount as decimal(18,4)) as decimal(28,8)) as disc",
    )
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    # part is O(SF): no broadcast hint (AQE decides) — same rationale as
    # supplier_nation_revenue
    j = li.join(p, li["l_partkey"] == p["p_partkey"])
    agg = j.groupBy("p_brand").agg(
        F.count("*").cast("long").alias("n_lineitems"),
        F.sum("qty").cast("long").alias("quantity"),
        F.expr("cast(floor(sum(disc) * 100) as bigint)").alias(
            "discount_cents"
        ),
    )
    wt = Window.partitionBy()
    return agg.withColumn(
        "__tot", F.sum("discount_cents").over(wt)
    ).selectExpr(
        "p_brand",
        "n_lineitems",
        "quantity",
        "discount_cents",
        "cast((discount_cents * cast(1000000 as bigint)) div __tot"
        " as bigint) as discount_share_ppm",
    )


SQL_PART_BRAND_DISCOUNT_EXPOSURE = """
with li as (
  select l_partkey, l_quantity::BIGINT as qty,
         cast(l_extendedprice::DECIMAL(18,4) * l_discount::DECIMAL(18,4)
              as decimal(28,8)) as disc
  from lineitem
),
j as (
  select p.p_brand, li.qty, li.disc
  from li join part p on li.l_partkey = p.p_partkey
),
agg as (
  select p_brand, count(*)::BIGINT as n_lineitems,
         sum(qty)::BIGINT as quantity,
         cast(floor(sum(disc) * 100) as bigint) as discount_cents
  from j group by p_brand
)
select p_brand, n_lineitems, quantity, discount_cents,
       ((discount_cents * 1000000) // (sum(discount_cents) over ()))::BIGINT
         as discount_share_ppm
from agg
"""


# --- session-57: market segment value, size/demand correlation --------------


def q_customer_mktsegment_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-segment value rollup: customers joined to their orders
    (two O(SF) relations — a plain shuffle equi-join on the customer
    key, NO broadcast hint anywhere), per segment the customer count,
    order count, decimal-exact revenue and mean order value — the
    segmentation read every GTM review starts from. Customers with no
    orders still count (left join, zero-filled)."""
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    o = _t(spark, sf_dir, "orders").selectExpr(
        "o_custkey",
        "cast(floor(cast(o_totalprice as decimal(18,4)) * 100) as bigint)"
        " as cents",
    )
    per = o.groupBy("o_custkey").agg(
        F.count("*").cast("long").alias("n_orders"),
        F.sum("cents").cast("long").alias("cents"),
    )
    j = c.join(per, c["c_custkey"] == per["o_custkey"], "left")
    return j.groupBy("c_mktsegment").agg(
        F.count("*").cast("long").alias("n_customers"),
        F.sum(F.coalesce(F.col("n_orders"), F.lit(0))).cast("long").alias(
            "n_orders"
        ),
        F.sum(F.coalesce(F.col("cents"), F.lit(0))).cast("long").alias(
            "revenue_cents"
        ),
    ).selectExpr(
        "c_mktsegment",
        "n_customers",
        "n_orders",
        "revenue_cents",
        "cast(case when n_orders > 0 then revenue_cents div n_orders"
        " else 0 end as bigint) as mean_order_cents",
    )


SQL_CUSTOMER_MKTSEGMENT_VALUE = """
with o as (
  select o_custkey,
         cast(floor(o_totalprice::DECIMAL(18,4) * 100) as bigint) as cents
  from orders
),
per as (
  select o_custkey, count(*)::BIGINT as n_orders, sum(cents)::BIGINT as cents
  from o group by o_custkey
),
j as (
  select c.c_mktsegment, per.n_orders, per.cents
  from customer c left join per on c.c_custkey = per.o_custkey
)
select c_mktsegment, count(*)::BIGINT as n_customers,
       sum(coalesce(n_orders, 0))::BIGINT as n_orders,
       sum(coalesce(cents, 0))::BIGINT as revenue_cents,
       (case when sum(coalesce(n_orders, 0)) > 0
             then sum(coalesce(cents, 0)) // sum(coalesce(n_orders, 0))
             else 0 end)::BIGINT as mean_order_cents
from j group by c_mktsegment
"""


def q_part_size_demand_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Does part size predict demand? ONE row: Pearson correlation of
    (p_size, lifetime quantity sold) over parts — merchandising's
    "are big parts slow movers" check, the shared _CORR_PROJ
    exact-moment projection over a per-part demand rollup joined to
    the part dim on its key (parts with zero sales count at x=size,
    y=0 through the left join)."""
    li = _t(spark, sf_dir, "lineitem").selectExpr(
        "l_partkey", "cast(l_quantity as bigint) as qty"
    ).groupBy("l_partkey").agg(F.sum("qty").cast("long").alias("y"))
    p = _t(spark, sf_dir, "part").selectExpr(
        "p_partkey", "cast(p_size as bigint) as x"
    )
    per = p.join(li, p["p_partkey"] == li["l_partkey"], "left").selectExpr(
        "x", "coalesce(y, 0) as y"
    )
    dec = "cast({e} as decimal(38,0))"
    agg = per.agg(
        F.count("*").alias("m"),
        F.sum(F.expr(dec.format(e="x"))).alias("sx"),
        F.sum(F.expr(dec.format(e="y"))).alias("sy"),
        F.sum(F.expr(dec.format(e="x * y"))).alias("sxy"),
        F.sum(F.expr(dec.format(e="x * x"))).alias("sxx"),
        F.sum(F.expr(dec.format(e="y * y"))).alias("syy"),
    )
    return agg.selectExpr("cast(m as bigint) as n_parts", *_CORR_PROJ)


SQL_PART_SIZE_DEMAND_CORR = f"""
with li as (
  select l_partkey, sum(l_quantity::BIGINT)::BIGINT as y
  from lineitem group by l_partkey
),
per as (
  select p.p_size::BIGINT as x, coalesce(li.y, 0)::BIGINT as y
  from part p left join li on p.p_partkey = li.l_partkey
),
agg as (
  select count(*) as m,
         sum(cast(x as decimal(38,0))) as sx,
         sum(cast(y as decimal(38,0))) as sy,
         sum(cast(x * y as decimal(38,0))) as sxy,
         sum(cast(x * x as decimal(38,0))) as sxx,
         sum(cast(y * y as decimal(38,0))) as syy
  from per
)
select cast(m as bigint) as n_parts, {_CORR_PROJ[0]}
from agg
"""
