"""Session-4 operators: n-gram novelty, image tile planning, k-fold audit.

Semantic checks on planted fixtures + the plan-shape guards that pin each
operator's at-scale safety property (no nested-loop joins, no Python row
UDFs, no corpus-sized broadcasts).
"""

from __future__ import annotations

from pyspark.sql import functions as F

BAD_ALWAYS = ("CartesianProduct", "BroadcastNestedLoopJoin", "BatchEvalPython")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _assert_clean(plan: str, *also_banned: str):
    for op in BAD_ALWAYS + also_banned:
        assert op not in plan, f"{op} in plan:\n{plan}"


def test_ngram_novelty_planted_copy_scores_zero(spark):
    from openreviewcrawler_spark.operators.textstats import ngram_novelty

    rows = [
        (1, "alpha beta gamma delta epsilon"),
        (2, "zeta eta theta iota kappa"),
        # exact copy of doc 1: every shingle first occurred at doc 1
        (3, "alpha beta gamma delta epsilon"),
        # half-overlap: shares the 3 shingles of doc 2's tail, adds 2 new
        (4, "theta iota kappa lam mu nu"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in ngram_novelty(df).collect()}
    assert out[1]["novelty"] == 1.0
    assert out[2]["novelty"] == 1.0
    assert out[3]["novelty"] == 0.0 and out[3]["n_novel"] == 0
    # doc 4: shingles = theta-iota-kappa (seen, doc 2), iota-kappa-lam,
    # kappa-lam-mu, lam-mu-nu (3 novel of 4)
    assert out[4]["n_shingles"] == 4 and out[4]["n_novel"] == 3
    assert out[4]["novelty"] == 0.75


def test_ngram_novelty_plan_no_corpus_broadcast(spark, sf_dir):
    from openreviewcrawler_spark.catalog import q_text_ngram_novelty

    df = q_text_ngram_novelty(spark, sf_dir)
    plan = _plan(df)
    # no nested loops, no Python, no global window funnel; AQE may still
    # broadcast at tiny SF from its own estimates (that backs off at scale)
    _assert_clean(plan, "Window")
    # but the corpus-sized first-occurrence table must never carry a
    # literal broadcast hint (house rule, test_plans.py r3 verdict #2)
    assert "ResolvedHint" not in df._jdf.queryExecution().analyzed().toString()


def test_image_tiles_cover_exactly(spark):
    from openreviewcrawler_spark.operators.multimodal import plan_image_tiles

    # src_len 100 -> w=132, h=700%487+32=245 -> nx=3, ny=4 -> 12 tiles
    assets = spark.createDataFrame(
        [(7, "image", bytearray(b"x"), 100), (8, "audio", bytearray(b"x"), 100)],
        "asset_id long, kind string, payload binary, src_len long",
    )
    tiles = plan_image_tiles(assets).collect()
    assert {t["asset_id"] for t in tiles} == {7}
    assert len(tiles) == 12
    area = sum((t["x1"] - t["x0"]) * (t["y1"] - t["y0"]) for t in tiles)
    assert area == 132 * 245
    assert all(0 <= t["x0"] < t["x1"] <= 132 for t in tiles)
    assert all(0 <= t["y0"] < t["y1"] <= 245 for t in tiles)
    # row-major: tile_idx 0..11 each exactly once
    assert sorted(t["tile_idx"] for t in tiles) == list(range(12))


def test_image_tiles_plan_pure_jvm(spark, sf_dir):
    from openreviewcrawler_spark.catalog import q_mm_image_tiles

    plan = _plan(q_mm_image_tiles(spark, sf_dir))
    _assert_clean(plan, "ArrowEvalPython", "Exchange")  # zero shuffles


def test_kfold_assign_partitions_and_balance(spark):
    from openreviewcrawler_spark.operators.textstats import kfold_assign

    docs = spark.range(0, 1000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 4).cast("string").alias("source")
    )
    out = kfold_assign(docs, k=5).collect()
    # every (stratum) sums back to its total; folds partition the stratum
    by_stratum: dict[str, int] = {}
    for r in out:
        by_stratum[r["stratum"]] = by_stratum.get(r["stratum"], 0) + r["n_docs"]
        assert r["stratum_total"] == 250
        # dev_ppm = (n*k - total)*1e6/(total*k), exact integer check
        assert r["dev_ppm"] == (r["n_docs"] * 5 - 250) * 1000000 // (250 * 5)
    assert all(v == 250 for v in by_stratum.values())
    assert len(out) == 20  # 5 folds x 4 strata all non-empty at n=1000

    # determinism across parallelism: same rollup at 1 and 8 partitions
    a = sorted(map(tuple, kfold_assign(docs.repartition(1), k=5).collect()))
    b = sorted(map(tuple, kfold_assign(docs.repartition(8), k=5).collect()))
    assert a == b


def test_circuit_breaker_trip_cooldown_probe_recover(spark):
    from openreviewcrawler_spark.operators.scheduler import circuit_breaker

    # one host, 9 dense rounds: 3 fails trip at r2; open r3-r4; half-open
    # probe at r5 succeeds -> closed from r6 on; late fail at r7 resets
    # nothing (streak 1)
    rows = [
        ("h", 0, 10, 8),   # fail 1 (closed, all allowed)
        ("h", 1, 10, 10),  # fail 2
        ("h", 2, 10, 5),   # 2*5>=10 -> fail 3: trips AFTER this round
        ("h", 3, 10, 0),   # open: denied
        ("h", 4, 10, 0),   # open: denied, cooldown ends
        ("h", 5, 10, 0),   # half_open: 1 probe, success -> closed
        ("h", 6, 10, 4),   # closed again (2*4 < 10: not a fail)
        ("h", 7, 10, 9),   # fail, streak 1 only
        ("h", 8, 10, 0),   # closed
    ]
    df = spark.createDataFrame(rows, "host string, rnd long, n_req long, n_err long")
    out = {r["rnd"]: r for r in circuit_breaker(df).collect()}
    expect = {
        0: ("closed", 10), 1: ("closed", 10), 2: ("closed", 10),
        3: ("open", 0), 4: ("open", 0), 5: ("half_open", 1),
        6: ("closed", 10), 7: ("closed", 10), 8: ("closed", 10),
    }
    for rnd, (state, allowed) in expect.items():
        assert (out[rnd]["state"], out[rnd]["allowed"]) == (state, allowed), rnd
        assert out[rnd]["denied"] == out[rnd]["n_req"] - allowed


def test_circuit_breaker_half_open_refail_reopens(spark):
    from openreviewcrawler_spark.operators.scheduler import circuit_breaker

    rows = [
        ("h", 0, 4, 4), ("h", 1, 4, 4), ("h", 2, 4, 4),  # trip
        ("h", 3, 4, 4), ("h", 4, 4, 4),                  # open (errs ignored)
        ("h", 5, 4, 4),                                  # probe fails -> open
        ("h", 6, 4, 0), ("h", 7, 4, 0),                  # open cooldown again
        ("h", 8, 4, 0),                                  # probe succeeds
        ("h", 9, 4, 0),                                  # closed
    ]
    df = spark.createDataFrame(rows, "host string, rnd long, n_req long, n_err long")
    states = [r["state"] for r in sorted(circuit_breaker(df).collect(),
                                         key=lambda r: r["rnd"])]
    assert states == ["closed", "closed", "closed", "open", "open",
                      "half_open", "open", "open", "half_open", "closed"]


def test_cdx_gap_audit_detects_planted_defects(spark):
    from openreviewcrawler_spark.sources.warc import cdx_gap_audit

    rows = [
        # shard 0: contiguous
        (0, 0, 10), (0, 10, 5), (0, 15, 20),
        # shard 1: one 7-byte gap between 10 and the record at 22
        (1, 0, 10), (1, 10, 5), (1, 22, 8),
        # shard 2: overlap (record at 8 starts inside [0, 10))
        (2, 0, 10), (2, 8, 5),
    ]
    cdx = spark.createDataFrame(rows, "shard int, offset long, record_len long")
    out = {r["shard"]: r for r in cdx_gap_audit(cdx).collect()}
    assert out[0]["contiguous"] and out[0]["n_gaps"] == 0 and out[0]["lost_bytes"] == 0
    assert not out[1]["contiguous"] and out[1]["n_gaps"] == 1
    assert out[1]["lost_bytes"] == 7 and out[1]["n_overlaps"] == 0
    assert not out[2]["contiguous"] and out[2]["n_overlaps"] == 1
    assert out[2]["n_gaps"] == 0 and out[2]["lost_bytes"] == 0


def test_ann_recall_eval_bounds_and_truncation(spark, sf_dir):
    from openreviewcrawler_spark.catalog import q_ann_recall_eval

    rows = q_ann_recall_eval(spark, sf_dir).collect()
    assert len(rows) == 16
    import math
    for r in rows:
        assert 0 <= r["n_hit"] <= min(r["n_brute"], r["n_lsh"] or 0) or r["n_lsh"] == 0
        assert r["recall"] == math.floor(r["n_hit"] / r["n_brute"] * 1e6) / 1e6


def test_ann_recall_eval_detects_good_recall_on_near_dups(spark, sf_dir):
    """The harness must read HIGH when neighbors exist: same planted
    ~0.99-cos corpus as the r2 LSH gate, evaluated through recall_eval
    at k=1. (On raw random embeddings recall@5 ~ 0.05 — an honest ANN
    answer, which is exactly what the catalog entry records.)"""
    from openreviewcrawler_spark.operators import similarity

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    near = emb.filter(F.col("vec_id") < 16).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform(
            F.col("embedding"),
            lambda x, i: x * (F.lit(1.0) + F.lit(0.15) * (i == 0).cast("double")),
        ).cast("array<float>").alias("embedding"),
        "label",
    )
    rows = similarity.recall_eval(emb.unionByName(near), n_queries=16, k=1).collect()
    mean_recall = sum(r["recall"] for r in rows) / len(rows)
    assert mean_recall >= 0.8, f"recall_eval mean {mean_recall:.2f}"


def test_host_lang_mix_shares_partition(spark, sf_dir):
    from openreviewcrawler_spark.catalog import q_host_lang_mix

    rows = q_host_lang_mix(spark, sf_dir).collect()
    by_host: dict[str, list] = {}
    for r in rows:
        by_host.setdefault(r["host"], []).append(r)
    for host, rs in by_host.items():
        assert sum(1 for r in rs if r["is_dominant"]) == 1, host
        assert sum(r["n_docs"] for r in rs) == rs[0]["host_total"]
        # floor'd ppm shares under-count by < 1 ppm per language
        total_ppm = sum(r["share_ppm"] for r in rs)
        assert 1000000 - len(rs) < total_ppm <= 1000000, host


def test_pca_power_recovers_planted_direction(spark):
    from openreviewcrawler_spark.operators.similarity import pca_power

    # all rows equal x = (3, 0, 4, 0): Gram = n * x x^T, one iteration
    # already lands exactly on x/|x| = (0.6, 0, 0.8, 0)
    df = spark.createDataFrame(
        [(i, [3.0, 0.0, 4.0, 0.0]) for i in range(50)],
        "vec_id long, embedding array<double>",
    )
    out = {r["pos"]: r for r in pca_power(df, n_iter=2, dim=4).collect()}
    assert [out[p]["loading"] for p in range(4)] == [0.6, 0.0, 0.8, 0.0]
    # eigenvalue of n * x x^T is n * |x|^2 = 50 * 25 = 1250
    assert out[0]["eigenvalue"] == 1250.0


def test_pca_power_dominant_axis_on_anisotropic_noise(spark):
    from openreviewcrawler_spark.operators.similarity import pca_power

    # deterministic anisotropic cloud: dim 1 has 10x the spread of the
    # others -> the dominant loading concentrates there
    rows = [
        (i, [((i * 7) % 5 - 2.0) / 10.0,
             float((i * 13) % 11 - 5),
             ((i * 3) % 7 - 3.0) / 10.0])
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r["pos"]: r for r in pca_power(df, n_iter=2, dim=3).collect()}
    assert abs(out[1]["loading"]) > 0.99
    assert abs(out[0]["loading"]) < 0.1 and abs(out[2]["loading"]) < 0.1
    assert out[1]["eigenvalue"] > 0


def test_keeper_quality_prefers_best_copy(spark, sf_dir):
    """The tail-cut near-dups (_corpus plants substr(text, ...) copies)
    are usually LOWER quality than their originals; the quality-argmax
    keeper must never lose quality vs the min-id keeper, and must gain
    on at least one cluster in the planted fixture."""
    from openreviewcrawler_spark.catalog import q_dedup_keeper_quality

    rows = q_dedup_keeper_quality(spark, sf_dir).collect()
    assert rows
    assert all(r["q_gain"] >= 0 for r in rows)
    assert all(r["keeper_q10"] >= r["minid_q10"] for r in rows)
    assert all(r["cluster_size"] >= 2 for r in rows)


def test_quality_keeper_selection_semantics(spark):
    from openreviewcrawler_spark.operators.dedup import quality_keeper

    comp = spark.createDataFrame(
        # cluster 1: {1, 5, 9}; cluster 2: {2, 7}; singleton 3 (excluded)
        [(1, 1), (5, 1), (9, 1), (2, 2), (7, 2), (3, 3)],
        "doc_id long, component long",
    )
    q = spark.createDataFrame(
        # best in cluster 1 is doc 5 (q 9 > min-id doc 1's q 4); tie in
        # cluster 2 -> smaller doc_id (the min-id keeper itself) wins
        [(1, 4), (5, 9), (9, 9), (2, 7), (7, 7), (3, 10)],
        "doc_id long, q10 long",
    )
    out = {r["component"]: r for r in quality_keeper(comp, q).collect()}
    assert set(out) == {1, 2}
    assert out[1]["keeper_doc"] == 5 and out[1]["q_gain"] == 5
    assert out[1]["cluster_size"] == 3 and out[1]["minid_q10"] == 4
    assert out[2]["keeper_doc"] == 2 and out[2]["q_gain"] == 0


def test_frontier_age_shares_and_cap(spark, sf_dir):
    from openreviewcrawler_spark.catalog import q_crawl_frontier_age

    rows = q_crawl_frontier_age(spark, sf_dir).collect()
    assert all(0 <= r["age_h"] <= 48 for r in rows)
    total_ppm = sum(r["share_ppm"] for r in rows)
    assert 1000000 - len(rows) < total_ppm <= 1000000
