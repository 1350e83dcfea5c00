"""Sketch operators (operators/sketch): HyperLogLog cardinality and
count-min heavy hitters — semantic gates (estimator quality on known-truth
input, one-sided CM error) plus the plan-shape discipline (O(m) shuffle for
HLL, sketch-side-only broadcast for CM)."""

from __future__ import annotations

from pyspark.sql import functions as F

from openreviewcrawler_spark.operators.sketch import (
    CM_DEPTH,
    CM_WIDTH,
    HLL_M,
    HLL_RHO_MAX,
    cm_estimates_df,
    hll_estimate_df,
    hll_registers_df,
    rho_case_sql,
)

from test_plans import plan_of


def _keys_df(spark, n: int, mod: int):
    """n rows over a mod-sized key universe (true distinct = min(n, mod))."""
    return spark.range(n).select(
        F.concat(F.lit("k"), (F.col("id") % mod).cast("string")).alias("key")
    )


def test_rho_case_matches_python_trailing_zeros(spark):
    """The generated CASE chain equals tz(w)+1 (rho_max at w=0) for a sweep
    of words covering every branch."""
    words = [0] + [1 << k for k in range(HLL_RHO_MAX - 1)] + list(range(1, 200)) + [
        (1 << 24) - 1,
        (1 << 23) + 4,
    ]

    def py_rho(w: int) -> int:
        if w == 0:
            return HLL_RHO_MAX
        return (w & -w).bit_length()

    df = spark.createDataFrame([(w,) for w in words], "w long").select(
        "w", F.expr(rho_case_sql("w")).cast("int").alias("rho")
    )
    for row in df.collect():
        assert row.rho == py_rho(row.w), row.w


def test_hll_registers_bounded_and_valid(spark):
    regs = hll_registers_df(_keys_df(spark, 5000, 1700), "key").collect()
    assert len(regs) <= HLL_M
    assert all(0 <= r.bucket < HLL_M for r in regs)
    assert all(1 <= r.rho <= HLL_RHO_MAX for r in regs)


def test_hll_estimate_within_error_bounds(spark):
    """m=256 registers -> relative standard error ~1.04/sqrt(256) = 6.5%;
    assert within 4 sigma (26%) on cardinalities in the raw-estimator
    regime (n > 2.5m = 640 — below that, standard HLL switches to linear
    counting, which needs the banned ``ln``; the operator instead emits
    n_zero so callers can correct driver-side on the one-row result).
    Duplicates must not move the estimate."""
    for true_n in (700, 1700, 5000):
        row = hll_estimate_df(_keys_df(spark, 10000, true_n), "key").collect()[0]
        est = row.est_distinct
        assert abs(est - true_n) / true_n < 0.26, (true_n, est)
        # duplicate-insensitivity: double the rows, same key universe
        row2 = hll_estimate_df(_keys_df(spark, 20000, true_n), "key").collect()[0]
        assert row2.est_distinct == est


def test_hll_small_range_emits_correction_signal(spark):
    """In the linear-counting regime the raw estimate is biased high but the
    row carries the exact zero-register count a caller needs to apply
    m*ln(m/V) driver-side: n_zero must be positive and the bias one-sided."""
    row = hll_estimate_df(_keys_df(spark, 10000, 300), "key").collect()[0]
    assert row.n_zero > 0
    assert row.est_distinct >= 300 * 0.9


def test_hll_plan_shuffles_at_most_m_groups(spark):
    """The only wide stage is the register groupBy (<= m groups) + the final
    single-row agg — no join anywhere, so the plan scales with input splits."""
    plan = plan_of(hll_estimate_df(_keys_df(spark, 1000, 400), "key"))
    assert "Join" not in plan
    assert "CartesianProduct" not in plan
    # partial_max on the map side keeps the shuffle at <= m rows/partition
    assert "partial_max" in plan or "HashAggregate" in plan


def test_cm_estimates_one_sided_and_tight(spark):
    """est >= true for every key (count-min never undercounts); with 23
    keys in a 4x64 sketch, the heaviest key's estimate is exact unless all
    4 of its rows collide — require the top key exact and total overcount
    small."""
    skewed = spark.range(2000).select(
        F.concat(
            F.lit("h"), (F.col("id") % ((F.col("id") % 23) + 1)).cast("string")
        ).alias("host")
    )
    rows = cm_estimates_df(skewed, "host").collect()
    assert all(r.overcount >= 0 for r in rows)
    assert all(r.est_cnt >= r.true_cnt for r in rows)
    top = max(rows, key=lambda r: r.true_cnt)
    assert top.host == "h0"
    # the sketch has d*w = 256 cells for <= 23 keys: collisions are rare
    assert sum(r.overcount for r in rows) <= sum(r.true_cnt for r in rows) * 0.2


def test_cm_plan_broadcasts_only_the_sketch(spark):
    """The 256-cell counts relation is the broadcast side (bounded by the
    sketch geometry, not the corpus) — and nothing corpus-sized is
    broadcast: the only BroadcastExchange in the plan must sit under the
    probe join, fed by the (i, bucket) aggregate."""
    skewed = spark.range(2000).select(
        F.concat(F.lit("h"), (F.col("id") % 7).cast("string")).alias("host")
    )
    import re

    plan = plan_of(cm_estimates_df(skewed, "host"))
    n_bcast = len(re.findall(r"^\(\d+\) BroadcastExchange", plan, re.MULTILINE))
    assert n_bcast == 1, plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_cm_geometry_constants():
    assert CM_DEPTH * CM_WIDTH == 256
