"""Session-49: label ANOVA, queue wait, nearest snapshot."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_label_anova_matches_python(spark):
    import math

    from openreviewcrawler_spark.catalog import q_embedding_label_anova

    [row] = q_embedding_label_anova(spark, SF).collect()
    vecs = spark.read.parquet(f"{SF}/embeddings.parquet").collect()
    import collections

    groups = collections.defaultdict(list)
    for v in vecs:
        x = 0.0
        for c in v["embedding"]:
            x += float(c) * float(c)
        groups[v["label"]].append(x)
    k = len(groups)
    n = sum(len(g) for g in groups.values())
    assert (row["k"], row["n"]) == (k, n)
    # mirror the engine's DECIMAL(28,12) accumulation exactly — a float
    # recount diverges because SSB is a catastrophic cancellation
    # (sb_raw ≈ s²/n) that amplifies last-ulp summation differences
    from decimal import Decimal

    q = Decimal("0.000000000001")

    def dsum(xs):
        return sum(Decimal(x).quantize(q) for x in xs)

    s = float(dsum(x for g in groups.values() for x in g))
    ss = float(dsum(x * x for g in groups.values() for x in g))
    sb_raw = float(
        dsum(
            float(dsum(g)) * float(dsum(g)) / len(g)
            for g in groups.values()
        )
    )
    ssb = sb_raw - s * s / n
    ssw = ss - sb_raw
    f = (ssb / (k - 1)) / (ssw / (n - k))
    assert row["f_stat_milli"] == math.floor(f * 1000)
    assert row["f_stat_milli"] >= 0


def test_queue_wait_mm1(spark):
    from openreviewcrawler_spark.catalog import (
        q_crawl_latency_quantiles,
        q_crawl_queue_wait_estimate,
    )

    rows = {r["host"]: r for r in q_crawl_queue_wait_estimate(spark, SF).collect()}
    qs = {r["host"]: r for r in q_crawl_latency_quantiles(spark, SF).collect()}
    assert set(rows) == set(qs)
    span = 3600000
    for h, r in rows.items():
        n, p50 = r["n_fetches"], r["p50_ms"]
        assert (n, p50) == (qs[h]["n_fetches"], qs[h]["p50_ms"])
        assert r["rho_ppm"] == n * p50 * 1_000_000 // span
        if n * p50 < span:
            assert r["wait_ms"] == n * p50 * p50 // (span - n * p50)
            assert r["overloaded"] == 0
        else:
            assert r["wait_ms"] == -1 and r["overloaded"] == 1
    # the fixture load is light: nobody saturates a 1-hour window
    assert all(r["overloaded"] == 0 for r in rows.values())
    assert all(r["wait_ms"] >= 0 for r in rows.values())


def test_nearest_snapshot_argmin_with_tie_rule(spark):
    from openreviewcrawler_spark.catalog import (
        _SNAP_TARGET_TS,
        q_warc_nearest_snapshot_select,
    )

    rows = {r["url_key"]: r for r in q_warc_nearest_snapshot_select(spark, SF).collect()}
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    import collections

    caps = collections.defaultdict(list)
    for d in docs:
        i = d["doc_id"]
        caps[i % 120].append((1000000 + (i * 37) % 50000, i))
    assert set(rows) == set(caps)
    for k, cc in caps.items():
        best = min(cc, key=lambda c: (abs(c[0] - _SNAP_TARGET_TS), c[0], c[1]))
        r = rows[k]
        assert r["n_captures"] == len(cc)
        assert r["best_dist"] == abs(best[0] - _SNAP_TARGET_TS)
        assert r["best_ts"] == best[0]
        assert r["best_doc"] == best[1]
    # the selection is non-degenerate: distances vary across urls and
    # nobody is handed a capture from the far edge of the archive
    dists = {r["best_dist"] for r in rows.values()}
    assert len(dists) > 10
    assert max(dists) < 25000
