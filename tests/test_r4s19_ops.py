"""Session-19 operators: mixture rebalance plan, robots rules diff."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_rebalance_plan_actions_consistent(spark):
    from openreviewcrawler_spark.catalog import q_traindata_mix_rebalance_plan

    rows = q_traindata_mix_rebalance_plan(spark, SF).collect()
    assert rows
    for r in rows:
        if r["action"] == "upsample":
            assert r["target_docs"] > r["n_docs"]
            assert r["factor_ppm"] > 1_000_000
        elif r["action"] == "downsample":
            assert r["target_docs"] < r["n_docs"]
            assert r["factor_ppm"] < 1_000_000
        else:
            assert r["target_docs"] == r["n_docs"]
        assert r["factor_ppm"] == r["target_docs"] * 1_000_000 // r["n_docs"]
        assert r["epochs_needed"] == -(-r["target_docs"] // r["n_docs"])
    # the τ=2 allocation flattens the mix: every source is pulled toward
    # the budget mean, so both actions appear on a skewed corpus OR all
    # factors are finite/positive
    assert all(r["factor_ppm"] > 0 for r in rows)


def test_robots_diff_matches_planted_changes(spark):
    from openreviewcrawler_spark.catalog import q_robots_rules_diff

    rows = q_robots_rules_diff(spark, SF).collect()
    assert len(rows) == 500
    for r in rows:
        i = int(r["host"][1:])
        if i % 3 == 0:  # /a dropped
            assert (r["n_added"], r["n_removed"]) == (0, 1)
            assert r["delay_changed"] == 0
        elif i % 3 == 1:  # /q added
            assert (r["n_added"], r["n_removed"]) == (1, 0)
            assert r["delay_changed"] == 0
        else:  # delay bumped
            assert (r["n_added"], r["n_removed"]) == (0, 0)
            assert r["delay_changed"] == 1
            assert r["delay_new"] == r["delay_old"] + 1
        assert r["n_rules_old"] == 2
