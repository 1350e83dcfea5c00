"""r4c operators: DUST rule mining, adaptive delay, quota apportionment,
WARC revisit-record dedup.

Semantic checks on hand-built micro-inputs (the catalog oracle covers the
derived-table parity; here the contract itself is pinned), plus the
invariants that make each operator safe at scale: exact budget
conservation for the apportionment, no-evidence-means-no-rule for DUST,
and digest-cluster-local windows for the revisit records.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from openreviewcrawler_spark.operators.dust import mine_dust_rules
from openreviewcrawler_spark.operators.scheduler import adaptive_delay, allocate_quota
from openreviewcrawler_spark.sources.warc import revisit_records


def _dust_pages(spark):
    rows = []
    # host a: sid never changes content (fp keyed on id), id does
    for id_ in (1, 2):
        for sid in (10, 11):
            rows.append((f"https://a.example/p?id={id_}&sid={sid}", f"fp{id_}"))
    # host b: param q changes content -> keep
    rows.append(("https://b.example/p?q=x&u=1", "fpx"))
    rows.append(("https://b.example/p?q=y&u=1", "fpy"))
    rows.append(("https://b.example/p?q=x&u=2", "fpx"))
    rows.append(("https://b.example/p?q=y&u=2", "fpy"))
    # host c: no query at all
    rows.append(("https://c.example/p", "fpc"))
    return spark.createDataFrame(rows, "url string, fingerprint string")


def test_dust_strip_keep_and_no_evidence(spark):
    out = {
        (r["host"], r["param_key"]): r
        for r in mine_dust_rules(_dust_pages(spark), min_groups=2).collect()
    }
    assert out[("a.example", "sid")]["rule"] == "strip"
    assert out[("a.example", "sid")]["n_irrelevant"] == out[("a.example", "sid")]["n_groups"] == 2
    assert out[("a.example", "id")]["rule"] == "keep"  # fps differ across id
    assert out[("b.example", "q")]["rule"] == "keep"
    # u on host b is irrelevant but has only... 2 residual groups (q=x / q=y),
    # both tested with 2 u-values and 1 fp each -> strip
    assert out[("b.example", "u")]["rule"] == "strip"
    # host c emitted nothing (no params), and no spurious keys exist
    assert set(out) == {("a.example", "sid"), ("a.example", "id"),
                        ("b.example", "q"), ("b.example", "u")}


def test_dust_single_group_is_not_enough_evidence(spark):
    pages = spark.createDataFrame(
        [("https://a.example/p?s=1", "f"), ("https://a.example/p?s=2", "f")],
        "url string, fingerprint string",
    )
    (row,) = mine_dust_rules(pages, min_groups=2).collect()
    # one irrelevant group < min_groups -> keep (don't strip on thin evidence)
    assert (row["n_groups"], row["rule"]) == (1, "keep")


def test_adaptive_delay_rules(spark):
    log = spark.createDataFrame(
        # fast.example: mean 100 -> 2x = 200 = floor; slow.example: mean 1000 -> 2000
        # err.example: mean 400 -> 800, 2/5 errors > 20% -> 1600
        # huge.example: mean 40000 -> clamped to 5000
        [("fast.example", 100, False)] * 4
        + [("slow.example", 1000, False)] * 3
        + [("err.example", 400, True), ("err.example", 400, True),
           ("err.example", 400, False), ("err.example", 400, False),
           ("err.example", 400, False)]
        + [("huge.example", 40000, False)],
        "host string, latency_ms long, is_err boolean",
    )
    out = {r["host"]: r["delay_ms"] for r in adaptive_delay(log).collect()}
    assert out == {
        "fast.example": 200,
        "slow.example": 2000,
        "err.example": 1600,
        "huge.example": 5000,
    }


def test_allocate_quota_conserves_budget_exactly(spark):
    scores = spark.createDataFrame(
        [("h%02d" % i, 7 * i + 1) for i in range(9)], "host string, score long"
    )
    for budget in (10, 97, 1000):
        out = allocate_quota(scores, budget=budget).collect()
        assert sum(r["quota"] for r in out) == budget
        # proportionality: quota within 1 of the exact share
        total = sum(7 * i + 1 for i in range(9))
        for r in out:
            exact = budget * r["score"] / total
            assert abs(r["quota"] - exact) < 1.0 + 1e-9


def test_allocate_quota_largest_remainder_tiebreak(spark):
    # equal scores, budget not divisible: the leftover goes to the
    # lexicographically-smallest hosts (deterministic tie-break)
    scores = spark.createDataFrame(
        [("b", 1), ("a", 1), ("c", 1)], "host string, score long"
    )
    out = {r["host"]: r["quota"] for r in allocate_quota(scores, budget=5).collect()}
    assert out == {"a": 2, "b": 2, "c": 1}


def test_revisit_records_dedup_and_pointers(spark):
    caps = spark.createDataFrame(
        [
            ("u1", 1, "same-bytes"),
            ("u2", 2, "same-bytes"),
            ("u3", 3, "same-bytes"),
            ("u4", 2, "unique"),
        ],
        "url string, capture_ts long, text string",
    )
    out = {r["url"]: r for r in revisit_records(caps).collect()}
    assert out["u1"]["record_type"] == "response"
    assert out["u4"]["record_type"] == "response"
    for u in ("u2", "u3"):
        assert out[u]["record_type"] == "revisit"
        assert out[u]["original_url"] == "u1"
        assert out[u]["original_ts"] == 1
        assert out[u]["stored_len"] == 0
    assert out["u1"]["stored_len"] == len("same-bytes")
    # archive win: bytes stored once per distinct payload
    assert sum(r["stored_len"] for r in out.values()) == len("same-bytes") + len("unique")


def test_revisit_ts_tie_breaks_on_url(spark):
    caps = spark.createDataFrame(
        [("z", 5, "x"), ("a", 5, "x")], "url string, capture_ts long, text string"
    )
    out = {r["url"]: r["record_type"] for r in revisit_records(caps).collect()}
    assert out == {"a": "response", "z": "revisit"}


def test_quota_plan_has_no_global_one_task_window(spark):
    # the remainder rank must come from the scalable seq stamp, not a
    # partition-less Window.orderBy (single-task funnel over all hosts)
    scores = spark.createDataFrame(
        [("h%d" % i, i + 1) for i in range(20)], "host string, score long"
    )
    plan = allocate_quota(scores, budget=100)._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, plan
