"""Structured Streaming ingest: exactly-once file processing, byte-identical
parse vs the batch path, watermarked windowed metrics."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from openreviewcrawler_spark.sources.bench_data import synth_pages
from openreviewcrawler_spark.streaming.ingest import run_ingest


@pytest.fixture()
def stream_dirs(spark):
    base = tempfile.mkdtemp(prefix="orc_stream_")
    src, out, ckpt = (os.path.join(base, d) for d in ("src", "out", "ckpt"))
    os.makedirs(src)
    return src, out, ckpt


def _write_batch(spark, src, lo, hi, n, hosts):
    """Append one parquet file covering page ids [lo, hi)."""
    pages = synth_pages(spark, n, hosts)
    batch = pages.join(
        spark.range(lo, hi).select(
            F.concat(
                F.lit("https://host"),
                F.lpad((F.col("id") % hosts).cast("string"), 5, "0"),
                F.lit(".example/p/"),
                F.col("id").cast("string"),
            ).alias("url")
        ),
        "url",
        "left_semi",
    )
    batch.coalesce(1).write.mode("append").parquet(src)


def test_stream_matches_batch_parse_and_windows(spark, stream_dirs):
    src, out, ckpt = stream_dirs
    N, H = 200, 10
    _write_batch(spark, src, 0, 120, N, H)

    text_q, metrics_q = run_ingest(spark, src, out, ckpt, max_files_per_trigger=2)
    try:
        text_q.processAllAvailable()
        metrics_q.processAllAvailable()

        # second file arrives late -> picked up incrementally, no reprocessing
        _write_batch(spark, src, 120, 200, N, H)
        text_q.processAllAvailable()
        metrics_q.processAllAvailable()

        got = spark.read.parquet(f"{out}/fetched_text")
        assert got.count() == N
        # exactly-once: no duplicate urls despite two triggers
        assert got.select("url").distinct().count() == N

        # byte-identical text vs the batch-side expectation column
        expected = synth_pages(spark, N, H).select("url", F.col("text").alias("exp"))
        joined = got.join(expected, "url")
        assert joined.filter(F.col("extracted_text") != F.col("exp")).count() == 0

        m = spark.sql("select * from host_metrics")
        rows = m.collect()
        assert sum(r["n_fetched"] for r in rows) == N
        assert {r["host"] for r in rows} == {f"host{h:05d}.example" for h in range(H)}
        # windowed: warc_ts spreads over >1 minute -> multiple windows exist
        assert m.select("window_start").distinct().count() > 1
    finally:
        text_q.stop()
        metrics_q.stop()


def test_finalized_metrics_watermark_semantics(spark, stream_dirs):
    """Append-mode metrics: a window is emitted exactly once, only after the
    watermark (2 min) passes its end — bounded state, late rows dropped."""
    from openreviewcrawler_spark.streaming.ingest import run_finalized_metrics

    src, out, ckpt = stream_dirs
    N, H = 200, 10
    q = run_finalized_metrics(spark, src, out, ckpt, max_files_per_trigger=2)
    try:
        # batch 1: events in [0s, 120s) -> nothing finalized yet
        _write_batch(spark, src, 0, 120, N, H)
        q.processAllAvailable()
        # batch 2: events to 199s -> watermark 199s-120s=79s -> the [0,60s)
        # window is finalized and emitted exactly once
        _write_batch(spark, src, 120, 200, N, H)
        q.processAllAvailable()
        got = spark.read.parquet(f"{out}/host_metrics_final")
        rows = got.collect()
        assert rows, "no finalized windows emitted"
        # only fully-watermarked windows appear, one row per (host, window)
        assert all(r["window_end"].second <= 60 for r in rows)
        keys = [(r["host"], r["window_start"]) for r in rows]
        assert len(keys) == len(set(keys))
        # every emitted row covers the [0,60s) window across all hosts
        assert {r["host"] for r in rows} == {f"host{h:05d}.example" for h in range(H)}
        # counts: ids 0..59 land in the finalized window (one per id)
        assert sum(r["n_fetched"] for r in rows) == 60
    finally:
        q.stop()


def test_stateful_politeness_budget_across_batches(spark, stream_dirs):
    """applyInPandasWithState per-host budget: at most `budget` URLs ever
    admitted per host, admit_seq contiguous across micro-batches, state
    remembered between triggers (an exhausted host admits nothing later)."""
    import pyspark.sql.functions as F

    from openreviewcrawler_spark.streaming.politeness import admit_stream

    src, out, ckpt = stream_dirs

    def write_cand(lo, hi):
        df = spark.range(lo, hi).select(
            F.concat(F.lit("h"), (F.col("id") % 3).cast("string")).alias("host"),
            F.concat(F.lit("https://h"), (F.col("id") % 3).cast("string"),
                     F.lit(".example/p/"), F.col("id").cast("string")).alias("url"),
            (F.col("id") % 7).cast("long").alias("priority"),
        )
        df.coalesce(1).write.mode("append").parquet(src)

    write_cand(0, 30)  # 10 candidates per host, budget 4 -> 4 admitted each
    cand = (
        spark.readStream.schema("host string, url string, priority long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        admit_stream(cand, budget=4)
        .writeStream.format("parquet")
        .option("path", f"{out}/admitted")
        .option("checkpointLocation", f"{ckpt}/admit")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        got1 = spark.read.parquet(f"{out}/admitted").collect()
        by_host = {}
        for r in got1:
            by_host.setdefault(r["host"], []).append(r)
        assert set(by_host) == {"h0", "h1", "h2"}
        for h, rows in by_host.items():
            assert len(rows) == 4  # budget enforced
            assert sorted(r["admit_seq"] for r in rows) == [1, 2, 3, 4]
            # deterministic choice: lowest (priority, url) first
            best = min(rows, key=lambda r: r["admit_seq"])
            assert best["priority"] == min(r["priority"] for r in rows)
        # batch 2: every host already exhausted -> nothing new admitted
        write_cand(30, 60)
        q.processAllAvailable()
        got2 = spark.read.parquet(f"{out}/admitted").collect()
        assert len(got2) == len(got1)
    finally:
        q.stop()


def test_stateful_politeness_ttl_evicts_idle_hosts(spark, stream_dirs):
    """state_ttl_ms bounds the state store: a host idle past the TTL in
    EVENT time is evicted when the watermark passes its timer, and if it
    reappears later it gets a FRESH budget with admit_seq restarting at 1 —
    the documented rate-per-politeness-window semantics. Without eviction,
    the r2 NoTimeout state grew with every host ever seen.

    Event-time eviction is fully deterministic: no sleeps — phases advance
    the watermark by writing candidates with later discovery timestamps, and
    every replay evicts the same hosts at the same stream positions.
    Sequential ``availableNow`` runs share one checkpoint (state AND timers
    persist across restarts); ProcessingTimeTimeout is unusable here — the
    engine re-runs no-data batches unconditionally while any wall-clock
    timer exists, so such a query never terminates (see politeness.py)."""
    import pyspark.sql.functions as F

    from openreviewcrawler_spark.streaming.politeness import admit_stream

    src, out, ckpt = stream_dirs

    def write_host(host, lo, hi, ts_s):
        spark.range(lo, hi).select(
            F.lit(host).alias("host"),
            F.concat(F.lit(f"https://{host}.example/p/"),
                     F.col("id").cast("string")).alias("url"),
            F.col("id").cast("long").alias("priority"),
            F.timestamp_seconds(F.lit(ts_s)).alias("ts"),
        ).coalesce(1).write.mode("append").parquet(src)

    def run_once():
        cand = spark.readStream.schema(
            "host string, url string, priority long, ts timestamp"
        ).parquet(src)
        q = (
            admit_stream(cand, budget=2, state_ttl_ms=5_000)
            .writeStream.format("parquet")
            .option("path", f"{out}/admitted")
            .option("checkpointLocation", f"{ckpt}/admit")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120), "availableNow run did not finish"

    t0 = 1_000_000  # arbitrary event-time epoch base (seconds)
    write_host("h0", 0, 5, t0)  # budget 2 -> admits p/0, p/1 (seq 1, 2)
    run_once()
    assert spark.read.parquet(f"{out}/admitted").filter("host='h0'").count() == 2
    # h1 discovery 10 s later pushes the watermark past h0's t0+5s timer ->
    # h0 evicted in that run's timeout sweep
    write_host("h1", 0, 1, t0 + 10)
    run_once()
    # h0 returns after eviction: fresh budget, admit_seq restarts at 1
    write_host("h0", 10, 15, t0 + 20)
    run_once()
    h0 = spark.read.parquet(f"{out}/admitted").filter("host='h0'").collect()
    assert len(h0) == 4  # 2 before eviction + 2 after
    assert sorted(r["admit_seq"] for r in h0) == [1, 1, 2, 2]
    late = {r["url"]: r["admit_seq"] for r in h0 if r["url"].endswith(("/10", "/11"))}
    assert sorted(late.values()) == [1, 2]
