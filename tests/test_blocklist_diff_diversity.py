"""r4c operators: domain-suffix blocklist, snapshot change capture,
Simpson-index word diversity.

Pins the contracts on micro-inputs: label-boundary (not substring) suffix
matching with both the broadcast-literal and anti-join implementations
agreeing; O(churn) diff output with correct status per planted change; and
hand-computed diversity ratios. Plus the plan guard that keeps the
broadcast blocklist a pure projection (no exchange = rides the page scan).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from openreviewcrawler_spark.operators.blocklist import (
    blocklist_verdict,
    filter_blocklist,
    filter_blocklist_join,
)
from openreviewcrawler_spark.operators.textstats import word_diversity
from openreviewcrawler_spark.sources.checkpoint import snapshot_diff

RULES = ["bad.example", "cdn.big.example"]


def _pages(spark):
    return spark.createDataFrame(
        [
            ("bad.example",),        # exact match
            ("a.bad.example",),      # subdomain of a blocked domain
            ("notbad.example",),     # substring trap: must be KEPT
            ("bad.example.org",),    # rule is not a label suffix: KEPT
            ("cdn.big.example",),    # specific subdomain rule
            ("www.big.example",),    # sibling subdomain: KEPT
            ("big.example",),        # parent of a blocked subdomain: KEPT
        ],
        "host string",
    )


def test_blocklist_label_boundary_semantics(spark):
    kept = {r["host"] for r in filter_blocklist(_pages(spark), RULES).collect()}
    assert kept == {"notbad.example", "bad.example.org", "www.big.example", "big.example"}


def test_blocklist_verdict_reports_most_specific_rule(spark):
    out = {r["host"]: r for r in blocklist_verdict(_pages(spark), RULES).collect()}
    assert out["a.bad.example"]["matched_rule"] == "bad.example"
    assert out["cdn.big.example"]["matched_rule"] == "cdn.big.example"
    assert out["notbad.example"]["matched_rule"] == ""
    assert out["notbad.example"]["kept"] is True
    assert out["bad.example"]["kept"] is False


def test_blocklist_join_variant_agrees(spark):
    rules = spark.createDataFrame([(r,) for r in RULES], "rule string")
    a = sorted(r["host"] for r in filter_blocklist(_pages(spark), RULES).collect())
    b = sorted(r["host"] for r in filter_blocklist_join(_pages(spark), rules).collect())
    assert a == b


def test_blocklist_literal_is_pure_projection(spark):
    plan = (
        filter_blocklist(_pages(spark), RULES)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan
    assert "BatchEvalPython" not in plan, plan


def test_snapshot_diff_statuses(spark):
    v1 = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "doc_id long, text string"
    )
    v2 = spark.createDataFrame(
        [(1, "a"), (2, "B2"), (4, "d")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r["status"] for r in snapshot_diff(v1, v2).collect()}
    assert out == {2: "changed", 3: "removed", 4: "added"}  # 1 (unchanged) excluded
    full = {
        r["doc_id"]: r["status"]
        for r in snapshot_diff(v1, v2, include_unchanged=True).collect()
    }
    assert full[1] == "unchanged" and len(full) == 4


def test_snapshot_diff_digest_columns_empty_on_absent_side(spark):
    v1 = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    v2 = spark.createDataFrame([(2, "y")], "doc_id long, text string")
    rows = {r["doc_id"]: r for r in snapshot_diff(v1, v2).collect()}
    assert rows[1]["new_digest"] == "" and rows[1]["old_digest"] != ""
    assert rows[2]["old_digest"] == "" and rows[2]["new_digest"] != ""


def test_word_diversity_hand_computed(spark):
    docs = spark.createDataFrame(
        [(1, "a a a a"), (2, "a b c d"), (3, "a a b b")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in word_diversity(docs).collect()}
    # doc 1: one token 4x -> simpson 1.0, effective vocab 1.0
    assert out[1]["simpson"] == 1.0 and out[1]["inv_simpson"] == 1.0
    # doc 2: all distinct -> simpson 4/16, inv = 4
    assert out[2]["simpson"] == 0.25 and out[2]["inv_simpson"] == 4.0
    # doc 3: 2+2 -> sum_sq 8, n 4 -> 0.5 / 2.0
    assert out[3]["simpson"] == 0.5 and out[3]["inv_simpson"] == 2.0
    assert out[3]["n_distinct"] == 2 and out[3]["n_tokens"] == 4
