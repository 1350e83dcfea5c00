"""Session-8 operators: DGA-suspect hostnames, outlink spam score,
churned-user detection.

Semantic checks on the deterministic derivations + plan-shape guards.
"""

from __future__ import annotations

BAD_ALWAYS = ("CartesianProduct", "BroadcastNestedLoopJoin", "BatchEvalPython")

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _assert_clean(plan: str, *also_banned: str):
    for op in BAD_ALWAYS + also_banned:
        assert op not in plan, f"{op} in plan:\n{plan}"


# ---------------------------------------------------------- url_dga_suspect


def test_dga_predicate_matches_row_fields(spark):
    from openreviewcrawler_spark.catalog import q_url_dga_suspect

    rows = q_url_dga_suspect(spark, SF).collect()
    assert rows, "expected distinct hosts"
    for r in rows:
        name = r["host"].split(".", 1)[0]
        assert r["host"].endswith(".example")
        assert r["name_len"] == len(name)
        assert r["n_digits"] == sum(c.isdigit() for c in name)
        vowel_ppm = sum(c in "aeiou" for c in name) * 1_000_000 // len(name)
        assert r["vowel_ppm"] == vowel_ppm
        expect = (
            r["name_len"] >= 10 and r["n_digits"] >= 3
            and r["vowel_ppm"] < 300_000
        )
        assert r["is_suspect"] == expect


def test_dga_flags_md5_hosts_not_clean_sources(spark):
    from openreviewcrawler_spark.catalog import q_url_dga_suspect

    rows = q_url_dga_suspect(spark, SF).collect()
    # md5-derived names are 12 hex chars; source names are short words.
    md5ish = [r for r in rows if r["name_len"] == 12 and r["n_digits"] >= 3]
    assert md5ish, "planted DGA hosts should exist"
    n_suspect = sum(r["is_suspect"] for r in rows)
    assert 0 < n_suspect < len(rows)


def test_dga_runs_on_distinct_hosts_plan_clean(spark):
    from openreviewcrawler_spark.catalog import q_url_dga_suspect

    df = q_url_dga_suspect(spark, SF)
    plan = _plan(df)
    _assert_clean(plan)
    # the detector must aggregate to the distinct host table first
    assert "HashAggregate" in plan


# ---------------------------------------------------------- link_spam_score


def test_spam_docs_concentrate_on_one_host(spark):
    from openreviewcrawler_spark.catalog import q_link_spam_score

    rows = {r["doc_id"]: r for r in q_link_spam_score(spark, SF).collect()}
    assert rows
    for doc_id, r in rows.items():
        assert r["n_links"] == 6
        if doc_id % 7 == 3:
            # all six links land on the single spam<doc_id%3> host
            assert r["n_hosts"] == 1
            assert r["is_spam"] is True
            assert r["diversity_ppm"] == 1_000_000 // 6
        else:
            # six consecutive residues mod 50 are distinct
            assert r["n_hosts"] == 6
            assert r["is_spam"] is False
            assert r["diversity_ppm"] == 1_000_000


def test_spam_score_single_explode_plan(spark):
    from openreviewcrawler_spark.catalog import q_link_spam_score

    df = q_link_spam_score(spark, SF)
    plan = _plan(df)
    _assert_clean(plan)
    # ONE explode emits all outlinks (union-embeds lesson): no Union node
    assert "Union" not in plan
    assert plan.count("Generate") == 1


# ------------------------------------------------------- event_churn_detect


def test_churn_rows_exceed_threshold_and_are_unique(spark):
    from openreviewcrawler_spark.catalog import q_event_churn_detect

    rows = q_event_churn_detect(spark, SF).collect()
    assert rows, "sf0.001 plants churned users"
    ids = [r["user_id"] for r in rows]
    assert len(ids) == len(set(ids))
    assert all(r["hours_inactive"] > 12 for r in rows)


def test_churn_matches_manual_horizon(spark):
    from pyspark.sql import functions as F

    from openreviewcrawler_spark.catalog import q_event_churn_detect

    ev = spark.read.parquet(f"{SF}/events.parquet").select(
        "user_id", F.unix_millis(F.col("ts").cast("timestamp")).alias("ms")
    )
    h = ev.agg(F.max("ms")).collect()[0][0]
    last = {
        r["user_id"]: r["m"]
        for r in ev.groupBy("user_id").agg(F.max("ms").alias("m")).collect()
    }
    expect = {
        u: (h - m) // 3_600_000
        for u, m in last.items()
        if (h - m) // 3_600_000 > 12
    }
    got = {
        r["user_id"]: r["hours_inactive"]
        for r in q_event_churn_detect(spark, SF).collect()
    }
    assert got == expect


def test_churn_plan_no_python_no_cartesian(spark):
    from openreviewcrawler_spark.catalog import q_event_churn_detect

    # the 1-row horizon attach folds to BroadcastNestedLoopJoin by design
    # (accepted single-row cross join) — ban only the real scale killers.
    plan = _plan(q_event_churn_detect(spark, SF))
    for op in ("CartesianProduct", "BatchEvalPython"):
        assert op not in plan, f"{op} in plan:\n{plan}"
