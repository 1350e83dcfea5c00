"""Streaming in-horizon URL dedup (streaming/dedup.dedup_discoveries):
canonical-spelling collapse, cross-batch state via a shared checkpoint, and
watermark-horizon eviction (the two-tier contract: re-appearance AFTER the
horizon is the history tier's job, so the stream re-emits it)."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from openreviewcrawler_spark.streaming.dedup import dedup_discoveries

SCHEMA = "raw_url string, discovered_ts timestamp"


@pytest.fixture()
def dirs():
    base = tempfile.mkdtemp(prefix="orc_sdedup_")
    src, out, ckpt = (os.path.join(base, d) for d in ("src", "out", "ckpt"))
    os.makedirs(src)
    return src, out, ckpt


def _append(spark, src, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(src)


def _run_once(spark, src, out, ckpt):
    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = (
        dedup_discoveries(stream, watermark="10 minutes")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "availableNow run did not finish"


def _urls(spark, out):
    return [r["url"] for r in spark.read.parquet(out).collect()]


def test_streaming_dedup_two_tier_contract(spark, dirs):
    import datetime as dt

    src, out, ckpt = dirs
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    # phase 1: two raw spellings of the same target + one other url
    _append(spark, src, [
        ("https://a.example/p/1", t0),
        ("HTTPS://A.EXAMPLE/p/1", t0),          # spelling dup -> one state key
        ("https://b.example/p/2", t0),
    ])
    _run_once(spark, src, out, ckpt)
    urls = _urls(spark, out)
    assert sorted(urls) == ["https://a.example/p/1", "https://b.example/p/2"]

    # phase 2: in-horizon re-discovery dropped, genuinely new url kept
    _append(spark, src, [
        ("https://a.example/p/1", t0 + dt.timedelta(minutes=1)),
        ("https://c.example/p/3", t0 + dt.timedelta(minutes=1)),
    ])
    _run_once(spark, src, out, ckpt)
    urls = _urls(spark, out)
    assert sorted(urls) == [
        "https://a.example/p/1",
        "https://b.example/p/2",
        "https://c.example/p/3",
    ]

    # phase 3a: advance EVENT time far past the horizon first — a batch is
    # evaluated under the watermark committed by the PREVIOUS batch, so the
    # eviction only becomes observable one batch later
    _append(spark, src, [
        ("https://d.example/p/4", t0 + dt.timedelta(hours=1)),
    ])
    _run_once(spark, src, out, ckpt)

    # phase 3b: the horizon evicted phase-1 state, so the same url is
    # re-emitted (the full-history seen tier downstream owns it now)
    _append(spark, src, [
        ("https://a.example/p/1", t0 + dt.timedelta(hours=2)),
    ])
    _run_once(spark, src, out, ckpt)
    urls = _urls(spark, out)
    assert urls.count("https://a.example/p/1") == 2
    assert len(urls) == 5
