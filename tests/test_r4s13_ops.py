"""Session-13 operators: host-hash partition plan, politeness-violation
audit, session-duration histogram."""

from __future__ import annotations

import collections

SF = "/root/testdata/sf0.001"


# ------------------------------------------------ crawl_frontier_partition_plan


def test_partition_plan_covers_frontier(spark):
    from openreviewcrawler_spark.catalog import (
        _FRONTIER_PARTS,
        q_crawl_frontier_partition_plan,
    )

    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    rows = q_crawl_frontier_partition_plan(spark, SF).collect()
    assert sum(r["n_urls"] for r in rows) == n_docs
    assert all(0 <= r["partition_id"] < _FRONTIER_PARTS for r in rows)
    assert all(1 <= r["n_hosts"] <= r["n_urls"] for r in rows)
    total_ppm = sum(r["share_ppm"] for r in rows)
    assert 1_000_000 - len(rows) <= total_ppm <= 1_000_000


def test_partition_plan_is_host_consistent(spark):
    """Same host must land in the same partition (politeness invariant)."""
    from openreviewcrawler_spark.catalog import q_crawl_frontier_partition_plan

    rows = q_crawl_frontier_partition_plan(spark, SF).collect()
    # distinct hosts summed over partitions == global distinct hosts: no
    # host straddles two partitions
    from openreviewcrawler_spark.catalog import _DOMAIN_HOST_EXPR
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    n_hosts = docs.select(F.expr(_DOMAIN_HOST_EXPR).alias("h")).distinct().count()
    assert sum(r["n_hosts"] for r in rows) == n_hosts


# -------------------------------------------- crawl_politeness_violation_audit


def test_violation_audit_detects_broken_sharding(spark):
    from openreviewcrawler_spark.catalog import q_crawl_politeness_violation_audit

    rows = q_crawl_politeness_violation_audit(spark, SF).collect()
    assert len(rows) == 7
    for r in rows:
        # two independent shards per host => roughly every other fetch
        # violates the delay; min merged gap is below the delay
        assert r["n_violations"] > 0
        assert r["min_gap_ms"] < r["delay_ms"]
        assert r["n_violations"] < r["n_fetches"]


def test_violation_audit_zero_on_pinned_schedule(spark):
    """The same audit applied to a single-shard (pinned) schedule reports
    zero violations — the machinery is sound, the sharding was the bug."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    f = docs.selectExpr(
        "'u' || cast(doc_id as string) as url",
        "'h' || cast(doc_id % 7 as string) as host",
        "((doc_id % 7) + 1) * 100 as delay_ms",
    )
    ws = Window.partitionBy("host").orderBy(F.asc("url"))
    sched = f.withColumn(
        "scheduled_ms",
        ((F.row_number().over(ws) - 1).cast("long") * F.col("delay_ms")),
    )
    wm = Window.partitionBy("host").orderBy(F.asc("scheduled_ms"), F.asc("url"))
    merged = sched.withColumn(
        "gap", F.col("scheduled_ms") - F.lag("scheduled_ms").over(wm)
    )
    viol = merged.filter(
        F.col("gap").isNotNull() & (F.col("gap") < F.col("delay_ms"))
    ).count()
    assert viol == 0


# -------------------------------------------- event_session_duration_histogram


def test_session_duration_histogram_matches_model(spark):
    from openreviewcrawler_spark.catalog import (
        _events_ms,
        q_event_session_duration_histogram,
    )

    rows = _events_ms(spark, SF).collect()
    by_user = collections.defaultdict(list)
    for r in rows:
        by_user[r["user_id"]].append((r["ts_ms"], r["event_id"]))
    durs = []
    for evs in by_user.values():
        evs.sort()
        start = prev = None
        n = 0
        for ts, _e in evs:
            if prev is None or ts - prev > 1_800_000:
                if start is not None:
                    durs.append((prev - start, n))
                start, n = ts, 0
            prev = ts
            n += 1
        durs.append((prev - start, n))

    def bucket(d):
        for b, hi in ((0, 0), (1, 60000), (2, 300000), (3, 900000), (4, 3600000)):
            if d <= hi:
                return b
        return 5

    expect = collections.defaultdict(lambda: [0, 0, 0])
    for d, n in durs:
        e = expect[bucket(d)]
        e[0] += 1
        e[1] += n
        e[2] = max(e[2], d)
    total = sum(v[0] for v in expect.values())
    got = {r["bucket"]: r for r in q_event_session_duration_histogram(spark, SF).collect()}
    assert set(got) == set(expect)
    for b, (ns, ne, mx) in expect.items():
        r = got[b]
        assert (r["n_sessions"], r["n_events"], r["max_dur_ms"]) == (ns, ne, mx)
        assert r["share_ppm"] == ns * 1_000_000 // total
