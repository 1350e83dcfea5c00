"""Semantic gates for the substring-dup statistics, vocab induction, and
the hashed-n-gram quality classifier (the cross-engine value gate lives in
scripts/check_oracle.py; these pin the OPERATOR semantics and plan shapes)."""

from __future__ import annotations

from pyspark.sql import functions as F

from openreviewcrawler_spark.operators.classifier import (
    N_BUCKETS,
    W_SCALE,
    hashgram_scores,
    hashgram_weights,
)
from openreviewcrawler_spark.operators.dedup import substring_dup_stats

from test_plans import plan_of


def test_substring_dup_planted_copy_is_fully_duplicated(spark):
    """A verbatim copy shares every 8-token window with its original: both
    rows must report dup_fraction 1.0, while a unique doc reports 0.0."""
    base = " ".join(f"w{i}" for i in range(20))
    other = " ".join(f"x{i}" for i in range(20))
    df = spark.createDataFrame(
        [(1, base), (2, base), (3, other)], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in substring_dup_stats(df).collect()}
    assert rows[1].dup_fraction == 1.0
    assert rows[2].dup_fraction == 1.0
    assert rows[3].dup_fraction == 0.0
    assert rows[1].n_windows == 13  # 20 - 8 + 1 distinct windows


def test_substring_dup_partial_overlap(spark):
    """A doc sharing only a suffix has an intermediate dup fraction, and
    the short-doc rule matches shingles_df (docs under k tokens drop)."""
    a = " ".join(f"w{i}" for i in range(30))
    b = " ".join(f"y{i}" for i in range(15)) + " " + " ".join(
        f"w{i}" for i in range(22, 30)
    )
    short = "a b c"
    df = spark.createDataFrame(
        [(1, a), (2, b), (3, short)], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in substring_dup_stats(df).collect()}
    assert 3 not in rows  # under k tokens: no windows
    assert rows[2].n_dup == 1  # exactly the w22..w29 window
    assert 0.0 < rows[2].dup_fraction < 1.0
    assert rows[1].n_dup == 1


def test_hashgram_classifier_separates_domains(spark):
    """Docs drawn from the target vocabulary must outscore docs from a
    disjoint vocabulary; mixed docs land in between."""
    tgt = " ".join(f"good{i}" for i in range(30))
    bad = " ".join(f"junk{i}" for i in range(30))
    mixed = " ".join(
        f"good{i}" if i % 2 == 0 else f"junk{i}" for i in range(30)
    )
    df = spark.createDataFrame(
        [(1, tgt, True), (2, bad, False), (3, mixed, False), (4, tgt, True)],
        "doc_id long, text string, is_t boolean",
    )
    weights = hashgram_weights(df, "is_t")
    rows = {r.doc_id: r for r in hashgram_scores(df, weights).collect()}
    # good tokens reused by the non-target mixed doc dilute their buckets'
    # target share (2/3 for the even ones), so the pure-target doc sits
    # high but below W_SCALE; junk tokens never occur in a target doc.
    assert rows[2].mean_w == 0.0  # disjoint vocab: no target mass
    assert rows[1].mean_w > rows[3].mean_w > rows[2].mean_w
    assert rows[1].mean_w > 0.8 * W_SCALE
    # weights are integers in [0, W_SCALE]
    for w in weights.collect():
        assert 0 <= w.w <= W_SCALE
        assert 0 <= w.bucket < N_BUCKETS


def test_hashgram_plan_broadcasts_only_the_weight_table(spark):
    """The model relation (<= N_BUCKETS rows by construction) is the one
    broadcast; the corpus side never is."""
    import re

    df = spark.createDataFrame(
        [(1, "a b c", True), (2, "c d e", False)],
        "doc_id long, text string, is_t boolean",
    )
    plan = plan_of(hashgram_scores(df, hashgram_weights(df, "is_t")))
    n_bcast = len(re.findall(r"^\(\d+\) BroadcastExchange", plan, re.MULTILINE))
    assert n_bcast == 1, plan
    assert "CartesianProduct" not in plan


def test_vocab_topk_ordering_and_coverage(spark, sf_dir):
    """rank is dense over (cnt desc, token asc); coverage is monotone
    nondecreasing and ends at the top-K corpus share (= 1.0 when the whole
    vocabulary fits inside K)."""
    from openreviewcrawler_spark.catalog import q_vocab_induct_topk

    rows = q_vocab_induct_topk(spark, sf_dir).orderBy("rank").collect()
    assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
    cnts = [r.cnt for r in rows]
    assert cnts == sorted(cnts, reverse=True)
    covs = [r.coverage for r in rows]
    assert all(b >= a for a, b in zip(covs, covs[1:]))
    if len(rows) < 100:  # whole vocab captured
        assert covs[-1] == 1.0


def test_vocab_topk_plan_has_no_global_sort_funnel(spark, sf_dir):
    """The top-K must be TakeOrderedAndProject (partial per-partition
    top-K), not a global Sort over the full distinct-token relation."""
    from openreviewcrawler_spark.catalog import q_vocab_induct_topk

    plan = plan_of(q_vocab_induct_topk(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan, plan
