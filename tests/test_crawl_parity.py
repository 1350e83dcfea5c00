"""Core parity gate: the distributed engine must equal the single-node oracle
— fetch_seq sequence, seen-set, byte-identical text per url (north rule)."""

from __future__ import annotations

import pytest

from openreviewcrawler_spark.oracle.crawl_oracle import crawl_oracle
from openreviewcrawler_spark.plans.crawl import CrawlConfig, run_crawl
from openreviewcrawler_spark.sources.checkpoint import SnapshotStore
from openreviewcrawler_spark.sources.fixtures import build_fixture, fixture_to_spark

CFG = dict(max_rounds=3, default_budget=6, round_seconds=60.0, max_depth=2)


@pytest.fixture(scope="module")
def fixture():
    return build_fixture(n_pages=600, n_hosts=60, n_seeds=25)


@pytest.fixture(scope="module")
def oracle_result(fixture):
    return crawl_oracle(
        fixture.pages.to_dict("records"),
        fixture.seeds.to_dict("records"),
        fixture.robots.to_dict("records"),
        **CFG,
    )


def _engine_outputs(spark, fixture, cfg: CrawlConfig, tmpdir=None):
    pages, seeds, robots = fixture_to_spark(spark, fixture)
    store = SnapshotStore(tmpdir) if tmpdir else None
    state = run_crawl(spark, pages, seeds, robots, cfg, store=store)
    fetched = (
        state.store.read(spark, "fetched")
        .orderBy("fetch_seq")
        .select("url", "fetch_seq", "round", "host", "text", "lang")
        .collect()
    )
    seen = {
        (r["url"], r["round"])
        for r in state.store.read(spark, "seen").select("url", "round").collect()
    }
    metrics = {
        (r["round"], r["host_bucket"]): (r["n_scheduled"], r["n_fetched"])
        for r in state.store.read(spark, "metrics").collect()
    }
    return state, fetched, seen, metrics


def _assert_matches_oracle(fetched, seen, metrics, oracle_result, fixture):
    o_fetched = oracle_result.fetched
    assert len(fetched) == len(o_fetched) > 0
    expected_text = dict(zip(fixture.pages["url"], fixture.pages["text"]))
    for got, want in zip(fetched, o_fetched):
        assert got["url"] == want["url"]
        assert got["fetch_seq"] == want["fetch_seq"]
        assert got["round"] == want["round"]
        assert got["text"] == want["text"], got["url"]  # byte-identical (oracle)
        assert got["text"] == expected_text[got["url"]]  # independent fixture expectation
        assert got["lang"] == want["lang"]
    assert seen == {(u, r) for u, r in oracle_result.seen.items()}
    o_metrics = {
        (m["round"], m["host_bucket"]): (m["n_scheduled"], m["n_fetched"])
        for m in oracle_result.metrics
    }
    engine_nonzero = {k: v for k, v in metrics.items() if v[0] or v[1]}
    assert engine_nonzero == o_metrics


def test_engine_matches_oracle(spark, fixture, oracle_result, tmp_path):
    cfg = CrawlConfig(**CFG)
    _, fetched, seen, metrics = _engine_outputs(spark, fixture, cfg, str(tmp_path / "s1"))
    _assert_matches_oracle(fetched, seen, metrics, oracle_result, fixture)


def test_bloom_and_salting_same_result(spark, fixture, oracle_result, tmp_path):
    cfg = CrawlConfig(use_bloom=True, n_salts=4, **CFG)
    _, fetched, seen, metrics = _engine_outputs(spark, fixture, cfg, str(tmp_path / "s2"))
    _assert_matches_oracle(fetched, seen, metrics, oracle_result, fixture)


def test_arrow_admission_same_result(spark, fixture, oracle_result, tmp_path):
    cfg = CrawlConfig(admit_impl="arrow", **CFG)
    _, fetched, seen, metrics = _engine_outputs(spark, fixture, cfg, str(tmp_path / "s3"))
    _assert_matches_oracle(fetched, seen, metrics, oracle_result, fixture)


def test_resume_equals_uninterrupted(spark, fixture, oracle_result, tmp_path):
    """Kill after round 1, resume from the snapshot — final state must equal
    the uninterrupted run (reference resume semantics, crawler.py:29-60)."""
    half = CrawlConfig(**{**CFG, "max_rounds": 1})
    store = SnapshotStore(str(tmp_path / "resume"))
    pages, seeds, robots = fixture_to_spark(spark, fixture)
    run_crawl(spark, pages, seeds, robots, half, store=store)
    assert store.latest_round() == 1

    full = CrawlConfig(**CFG)
    state = run_crawl(spark, pages, seeds, robots, full, store=store, resume=True)
    fetched = (
        state.store.read(spark, "fetched")
        .orderBy("fetch_seq")
        .select("url", "fetch_seq", "round", "host", "text", "lang")
        .collect()
    )
    seen = {
        (r["url"], r["round"])
        for r in state.store.read(spark, "seen").select("url", "round").collect()
    }
    metrics = {
        (r["round"], r["host_bucket"]): (r["n_scheduled"], r["n_fetched"])
        for r in state.store.read(spark, "metrics").collect()
    }
    _assert_matches_oracle(fetched, seen, metrics, oracle_result, fixture)


def test_compaction_preserves_state_and_resume(spark, fixture, oracle_result, tmp_path):
    """Compacting the seen table mid-crawl must be invisible: same rows after
    the rewrite, single segment in the manifest, append-after-compact and
    resume both still correct, and time-travel manifests untouched."""
    half = CrawlConfig(**{**CFG, "max_rounds": 2})
    store = SnapshotStore(str(tmp_path / "compact"))
    pages, seeds, robots = fixture_to_spark(spark, fixture)
    run_crawl(spark, pages, seeds, robots, half, store=store)
    assert len(store.manifest()["tables"]["seen"]) == 2  # one segment/round

    before = sorted(
        (r["url"], r["round"]) for r in store.read(spark, "seen").collect()
    )
    assert store.compact(spark, "seen", min_segments=2) is True
    after = sorted(
        (r["url"], r["round"]) for r in store.read(spark, "seen").collect()
    )
    assert after == before
    assert len(store.manifest()["tables"]["seen"]) == 1
    # a second compact with nothing to merge is a no-op
    assert store.compact(spark, "seen", min_segments=2) is False
    # time-travel manifest for round 1 still lists the original segments
    assert store.manifest(1)["tables"]["seen"][0].startswith("seen/r")

    # resume on top of the compacted store must equal the uninterrupted run
    full = CrawlConfig(**CFG)
    state = run_crawl(spark, pages, seeds, robots, full, store=store, resume=True)
    fetched = (
        state.store.read(spark, "fetched")
        .orderBy("fetch_seq")
        .select("url", "fetch_seq", "round", "host", "text", "lang")
        .collect()
    )
    seen = {
        (r["url"], r["round"])
        for r in state.store.read(spark, "seen").select("url", "round").collect()
    }
    metrics = {
        (r["round"], r["host_bucket"]): (r["n_scheduled"], r["n_fetched"])
        for r in state.store.read(spark, "metrics").collect()
    }
    _assert_matches_oracle(fetched, seen, metrics, oracle_result, fixture)


def test_expire_snapshots_gc_keeps_readers_correct(spark, tmp_path):
    """Expiry must drop old time-travel manifests and ONLY the data dirs no
    surviving snapshot references; the live read, append-after-expire, and
    kept time-travel reads all stay intact."""
    import os

    store = SnapshotStore(str(tmp_path / "gc"))
    for rnd in range(5):
        df = spark.createDataFrame([(f"u{rnd}", rnd)], "url string, round long")
        store.stage_append(df, "seen", rnd)
        store.stage_replace(df, "frontier", rnd)
        store.commit(rnd)
    before = sorted(r["url"] for r in store.read(spark, "seen").collect())
    assert len(before) == 5

    n_manifests, n_dirs = store.expire_snapshots(keep_last=2)
    assert n_manifests == 3
    # frontier is copy-on-write: rounds 0-2 replaced dirs are unreferenced
    # by the surviving manifests (r3, r4 + live); seen appends stay pinned
    assert n_dirs == 3
    assert sorted(r["url"] for r in store.read(spark, "seen").collect()) == before
    assert store.manifest(4) is not None and store.manifest(1) is None
    # time-travel to a KEPT snapshot still reads its frontier
    assert store.read(spark, "frontier", round_no=3).collect()[0]["url"] == "u3"
    # append + commit after expiry keeps working
    df = spark.createDataFrame([("u5", 5)], "url string, round long")
    store.stage_append(df, "seen", 5)
    store.commit(5)
    assert len(store.read(spark, "seen").collect()) == 6
    # idempotent second run removes nothing new except the now-expired r2
    n_manifests2, n_dirs2 = store.expire_snapshots(keep_last=2)
    assert (n_manifests2, n_dirs2) == (1, 1)
    assert os.path.isdir(str(tmp_path / "gc" / "seen"))
